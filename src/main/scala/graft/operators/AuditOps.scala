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

  /** q139: BENFORD FIRST-DIGIT AUDIT (Newcomb 1881 / Benford 1938 —
    * the fraud-detection screen auditors run on monetary columns):
    * the distribution of leading significant digits of o_totalprice
    * against the Benford expectation P(d) = log10(1 + 1/d), with the
    * per-digit deviation and the χ² contribution n·(share−exp)²/exp.
    * TPC-H-ish prices are uniform-ish within a band, so the audit
    * correctly reports a LARGE deviation — the gate checks the
    * computation, not conformance.
    *
    * The leading digit deliberately avoids log10: a price sitting on
    * a power of ten rounds to 2.9999… in one engine and 3.0 in the
    * other, flipping `floor`. Both engines instead take the first
    * character of the C-format '%.2f' rendering — identical strings
    * for identical doubles, no float boundary anywhere. Positive
    * prices only (first char of a negative is '-').
    *
    * Scale shape: one map-side digit projection into a 9-row
    * partial-agg'd count; the expectation join is against a 9-row
    * literal frame. */
  def benfordAudit(spark: SparkSession, sfDir: String): DataFrame = {
    val digits = graft.sources.Tables.load(spark, sfDir, "orders")
      .filter(col("o_totalprice") > 0)
      .select(expr("CAST(substring(format_string('%.2f', o_totalprice)," +
        " 1, 1) AS INT)").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val total = digits.agg(sum("n").cast("double").as("total"))
    digits.crossJoin(broadcast(total))
      .withColumn("share", round(col("n") / col("total"), 6))
      .withColumn("expected",
        round(log(10.0, lit(1.0) + lit(1.0) / col("digit")), 6))
      .select(col("digit"), col("n"), col("share"), col("expected"),
        round(col("share") - col("expected"), 6).as("dev"),
        round(col("total") * pow(col("share") - col("expected"), 2)
          / col("expected"), 4).as("chi2"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q94_dq_audit" -> (dqAudit _),
    "q139_benford_audit" -> (benfordAudit _)
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
        FROM base WHERE o_totalprice <= 0""",
    // q139: same %.2f-string leading digit (C-format in both engines;
    // exact .xx5 ties are unrepresentable doubles, so the renderings
    // agree), same 6-dp share/expected grid feeding dev and χ²
    "q139_benford_audit" ->
      """WITH d AS (
           SELECT CAST(substr(printf('%.2f', o_totalprice), 1, 1)
                    AS INTEGER) AS digit
           FROM orders WHERE o_totalprice > 0),
         c AS (SELECT digit, count(*) AS n FROM d GROUP BY 1),
         t AS (SELECT CAST(sum(n) AS DOUBLE) AS total FROM c),
         s AS (SELECT c.digit, c.n, t.total,
                      round(c.n / t.total, 6) AS share,
                      round(log10(1 + 1.0 / c.digit), 6) AS expected
               FROM c, t)
       SELECT digit, n, share, expected,
              round(share - expected, 6) AS dev,
              round(total * pow(share - expected, 2) / expected, 4)
                AS chi2
       FROM s"""
  )
}
