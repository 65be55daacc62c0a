package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables

/** ANALYZE-style table profiling: per-column row count, null count,
  * exact NDV, and min/max — the statistics a cost-based planner runs
  * on, collected in ONE distributed pass over the table.
  *
  * This is the production counterpart of the reference's injected
  * cardinality dictionary (MyMetadataQuery.java:81-162): the reference
  * studies what happens when these numbers are wrong by substituting
  * them wholesale; a deployed engine has to MEASURE them first. q80
  * gates the collection; [[StatsEstimator]] feeds the measured numbers
  * into the same `Cardinality` interface the enumerators consume
  * (p10), closing the stats → estimate → plan loop.
  *
  * Shape: a single aggregation emitting every column's stats in one
  * row, exploded to (col_name, stats) rows afterward — one scan, no
  * joins. The multi-column exact `countDistinct` plans as Spark's
  * Expand (one duplicated input row per distinct aggregate): exact
  * ANALYZE is an offline maintenance pass, and at 100 TB the same
  * collection runs with `approx_count_distinct` instead (HLL, one
  * non-expanded pass) — the estimator contract doesn't change, q28
  * already gates the approx-NDV surface. Numeric and timestamp min/max
  * land in DOUBLE columns (timestamps as epoch micros), strings in
  * VARCHAR columns — casting every type to string would put
  * double-formatting divergence between the engines in the hash. */
object TableStats {

  /** One profile row per column of `table`. */
  def profile(spark: SparkSession, sfDir: String, table: String): DataFrame = {
    val df = Tables.load(spark, sfDir, table)
    profileOf(df)
  }

  /** The 100 TB collection shape: identical profile with
    * `approx_count_distinct` in the ndv column — no Expand, one
    * non-multiplied pass. This is what [[StatsEstimator.profileTable]]
    * deploys by default (p10 and the regret experiment plan from it);
    * the HLL estimate is engine-specific, so the GATE keeps the exact
    * form (q80's oracle) and q28 already gates the approx-NDV
    * surface. Bench times it as q80i. */
  def profileApprox(
      spark: SparkSession, sfDir: String, table: String): DataFrame =
    profileOf(Tables.load(spark, sfDir, table), approxNdv = true)

  def profileOf(df: DataFrame, approxNdv: Boolean = false): DataFrame = {
    val cols = df.schema.fields.toSeq
    def isNum(f: StructField) = f.dataType match {
      case _: NumericType | _: TimestampType | TimestampNTZType => true
      case _ => false
    }
    def numExpr(f: StructField): org.apache.spark.sql.Column = f.dataType match {
      case TimestampType | TimestampNTZType =>
        unix_micros(col(f.name).cast("timestamp")).cast("double")
      case _ => col(f.name).cast("double")
    }
    val aggs = cols.flatMap { f =>
      Seq(
        count(col(f.name)).as(s"nn__${f.name}"),
        (if (approxNdv) approx_count_distinct(col(f.name))
         else countDistinct(col(f.name))).as(s"ndv__${f.name}")) ++
        (if (isNum(f)) Seq(
          min(numExpr(f)).as(s"minn__${f.name}"),
          max(numExpr(f)).as(s"maxn__${f.name}"))
        else Seq(
          min(col(f.name).cast("string")).as(s"mins__${f.name}"),
          max(col(f.name).cast("string")).as(s"maxs__${f.name}")))
    }
    val one = df.agg(count(lit(1)).as("n__total"), aggs: _*)
    val structs = cols.map { f =>
      struct(
        lit(f.name).as("col_name"),
        col("n__total").as("n_rows"),
        (col("n__total") - col(s"nn__${f.name}")).as("n_nulls"),
        col(s"ndv__${f.name}").as("ndv"),
        (if (isNum(f)) col(s"minn__${f.name}")
         else lit(null).cast("double")).as("min_num"),
        (if (isNum(f)) col(s"maxn__${f.name}")
         else lit(null).cast("double")).as("max_num"),
        (if (isNum(f)) lit(null).cast("string")
         else col(s"mins__${f.name}")).as("min_str"),
        (if (isNum(f)) lit(null).cast("string")
         else col(s"maxs__${f.name}")).as("max_str"))
    }
    one.select(explode(array(structs: _*)).as("s")).select("s.*")
  }

  /** Equi-depth histogram boundaries for every numeric/timestamp
    * column of `table`, collected in ONE additional pass:
    * `approx_percentile` at k/B for k = 1..B-1 (the KLL/GK sketch —
    * one non-multiplied scan regardless of column count, the same
    * deployed-approx discipline as [[profileApprox]]'s HLL NDVs).
    * Returns B-1 interior cut points per column; together with the
    * profile's min/max they bound B equal-mass buckets. The planner
    * consumes these through [[StatsEstimator]]'s range selectivity —
    * the uniform min-max span interpolation is the single biggest
    * estimation error left after measured NDVs (EXPERIMENT_r12 §2:
    * tree9_sel's far-tail `o_totalprice > 450000` filter), and an
    * equi-depth histogram is the textbook fix (Selinger's successors;
    * Piatetsky-Shapiro & Connell 1984). */
  def equiDepthBounds(spark: SparkSession, sfDir: String, table: String,
      buckets: Int = 32): Map[String, Vector[Double]] = {
    require(buckets >= 2, s"buckets $buckets")
    val df = Tables.load(spark, sfDir, table)
    val numCols = df.schema.fields.filter(f => f.dataType match {
      case _: NumericType | _: TimestampType | TimestampNTZType => true
      case _ => false
    }).toSeq
    if (numCols.isEmpty) return Map.empty
    val ps = (1 until buckets).map(_.toDouble / buckets)
    def numExpr(f: StructField) = f.dataType match {
      case TimestampType | TimestampNTZType =>
        unix_micros(col(f.name).cast("timestamp")).cast("double")
      case _ => col(f.name).cast("double")
    }
    val aggs = numCols.map(f =>
      percentile_approx(numExpr(f),
        array(ps.map(lit): _*), lit(10000)).as(s"q__${f.name}"))
    val row = df.agg(aggs.head, aggs.tail: _*).collect().head
    numCols.zipWithIndex.flatMap { case (f, i) =>
      Option(row.get(i)).map { v =>
        f.name -> v.asInstanceOf[scala.collection.Seq[Any]].collect {
          case d: java.lang.Double => d.doubleValue
        }.toVector
      }.filter(_._2.size == buckets - 1) // all-null columns carry no hist
    }.toMap
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q80_table_stats" -> ((s: SparkSession, d: String) => profile(s, d, "orders"))
  )

  /** One UNION ALL branch per column — DuckDB's planner runs them as
    * grouped aggregates over one scan each; the CONTENT is what the
    * gate checks. */
  def oracleSql: Map[String, String] = Map(
    "q80_table_stats" -> {
      def num(c: String, ts: Boolean = false) = {
        val mn = if (ts) s"CAST(epoch_us(min($c)) AS DOUBLE)"
          else s"CAST(min($c) AS DOUBLE)"
        val mx = if (ts) s"CAST(epoch_us(max($c)) AS DOUBLE)"
          else s"CAST(max($c) AS DOUBLE)"
        s"""SELECT '$c' AS col_name, count(*) AS n_rows,
                   count(*) - count($c) AS n_nulls,
                   count(DISTINCT $c) AS ndv,
                   $mn AS min_num, $mx AS max_num,
                   CAST(NULL AS VARCHAR) AS min_str,
                   CAST(NULL AS VARCHAR) AS max_str
            FROM orders"""
      }
      def str(c: String) =
        s"""SELECT '$c' AS col_name, count(*) AS n_rows,
                   count(*) - count($c) AS n_nulls,
                   count(DISTINCT $c) AS ndv,
                   CAST(NULL AS DOUBLE) AS min_num,
                   CAST(NULL AS DOUBLE) AS max_num,
                   min($c) AS min_str, max($c) AS max_str
            FROM orders"""
      Seq(num("o_orderkey"), num("o_custkey"), str("o_orderstatus"),
        num("o_totalprice"), num("o_orderdate", ts = true),
        str("o_orderpriority")).mkString("\n UNION ALL \n")
    }
  )
}
