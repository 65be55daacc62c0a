package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality CONSTRAINT audit — the deequ/Great-Expectations shape:
  * declared constraints (primary-key uniqueness, referential
  * integrity, NOT NULL, value ranges) evaluated over a table into one
  * small (constraint, violations) report, the artifact an ingest
  * pipeline gates a publish on (q82's WAP audits that a write landed
  * faithfully; this audits that the DATA ITSELF honors its contract).
  *
  * The gate runs it over a deliberately POLLUTED fixture — the source
  * table plus a duplicated PK row, a NULL-key row, and an orphan-FK /
  * out-of-range row, minted with negative keys so the pollution is
  * SF-collision-free (the CDC fixture discipline) and defined by ONE
  * SQL string shared verbatim with the DuckDB oracle — so every
  * constraint shows a known non-zero count and the audit provably
  * DETECTS, rather than trivially reporting zeros on clean data.
  *
  * Scale shape: the scalar constraints (null / range) fuse into ONE
  * conditional-aggregation pass over the scan; PK uniqueness is a
  * partial-agg'd group-count; referential integrity is one LEFT ANTI
  * join on the key. Nothing driver-side; the report is
  * constraint-count-sized.
  */
object AuditOps {

  /** The polluted audit fixture — shared VERBATIM with the oracle
    * (the changesetSql discipline): the orders table (whose declared
    * constraints really hold in the testdata, unlike lineitem's
    * nominal (orderkey, linenumber) key, which the synthetic
    * generator does not honor) plus one duplicated PK row, a
    * NULL-custkey row, and an orphan-FK negative-price row. */
  val fixtureSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
       UNION ALL
       SELECT o_orderkey, o_custkey, o_totalprice FROM
         (SELECT o_orderkey, o_custkey, o_totalprice
          FROM orders ORDER BY o_orderkey LIMIT 1) dup
       UNION ALL
       SELECT CAST(-1 AS BIGINT), CAST(NULL AS BIGINT),
              CAST(10 AS DOUBLE)
       UNION ALL
       SELECT CAST(-999999 AS BIGINT), CAST(-7 AS BIGINT),
              CAST(-5 AS DOUBLE)"""

  /** q94: the audit report over the polluted fixture. Expected at
    * every SF: pk_duplicate_groups=1, fk_orphan_rows=2 (the NULL key
    * never equi-matches, the -7 key does not exist),
    * null_custkey_rows=1, price_range_rows=1. */
  def dqAudit(spark: SparkSession, sfDir: String): DataFrame = {
    graft.sources.Tables.registerAll(spark, sfDir)
    val base = Persists.barrier(spark.sql(fixtureSql))
    // null + range checks fused into one conditional-agg scan, then
    // unpivoted to report rows
    val scalars = base.agg(
        coalesce(sum(when(col("o_custkey").isNull, 1L)), lit(0L))
          .as("nulls"),
        coalesce(sum(when(col("o_totalprice") <= 0, 1L)), lit(0L))
          .as("range"))
      .select(expr("stack(2, 'null_custkey_rows', nulls, " +
        "'price_range_rows', range) AS (constraint_name, violations)"))
    val pk = base.groupBy("o_orderkey")
      .agg(count(lit(1)).as("n")).filter(col("n") > 1)
      .agg(count(lit(1)).as("violations"))
      .select(lit("pk_duplicate_groups").as("constraint_name"),
        col("violations"))
    val customer = graft.sources.Tables.load(spark, sfDir, "customer")
      .select(col("c_custkey"))
    val fk = base.join(customer,
        base("o_custkey") === customer("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit("fk_orphan_rows").as("constraint_name"),
        col("violations"))
    scalars.unionByName(pk).unionByName(fk)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q94_dq_audit" -> (dqAudit _)
  )

  def oracleSql: Map[String, String] = Map(
    "q94_dq_audit" ->
      s"""WITH base AS ($fixtureSql)
        SELECT 'pk_duplicate_groups' AS constraint_name,
               CAST(count(*) AS BIGINT) AS violations
        FROM (SELECT o_orderkey FROM base
              GROUP BY 1 HAVING count(*) > 1) g
        UNION ALL
        SELECT 'fk_orphan_rows', CAST(count(*) AS BIGINT) FROM base b
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = b.o_custkey)
        UNION ALL
        SELECT 'null_custkey_rows', CAST(count(*) AS BIGINT)
        FROM base WHERE o_custkey IS NULL
        UNION ALL
        SELECT 'price_range_rows', CAST(count(*) AS BIGINT)
        FROM base WHERE o_totalprice <= 0"""
  )
}
