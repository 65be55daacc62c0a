package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Skyline (Pareto-frontier) queries — multi-criteria dominance
  * filtering, the "best tradeoffs" operator (Börzsönyi et al., ICDE
  * 2001: SKYLINE OF). The q113 instance: parts where no other part is
  * both cheaper-or-equal and larger-or-equal with one strict — the
  * price/size frontier.
  *
  * The naive form is the O(n²) NOT EXISTS self-join (that IS the
  * DuckDB oracle — exact and fine at 2k rows, unrunnable at 100 TB).
  * The Spark side is the distributed two-phase form, all built-in
  * relational ops, no all-pairs stage anywhere:
  *
  *  1. collapse to DISTINCT PRICES with the per-price max size (one
  *     partial-aggregating groupBy — the only pass over the full
  *     table until the final semi-join);
  *  2. range-bucket the distinct prices (bounds from one scalar agg,
  *     broadcast); per-bucket max size is another tiny agg, and the
  *     running max over STRICTLY LOWER buckets is a window over the
  *     B-row bucket frame — B is a constant (64), so this window is
  *     driver-trivial no matter the data volume;
  *  3. within each bucket, the running max over strictly-lower prices
  *     rides a window PARTITIONED BY BUCKET (distributed; a bucket
  *     holds ~|prices|/B rows). `strictmax(p)` = max(lower-bucket
  *     cummax, in-bucket prefix max) — the best size among all
  *     strictly cheaper points, exactly (points in a strictly lower
  *     bucket have strictly lower price; equal prices share a bucket
  *     row by construction of step 1).
  *  4. a price survives iff its max size beats every strictly cheaper
  *     point (`strictmax < eqmax` or no cheaper point exists); a ROW
  *     survives iff its price survives and it ACHIEVES the per-price
  *     max (an equal-priced larger row dominates it). Ties on both
  *     dims survive together — dominance requires one strict
  *     inequality, matching the oracle's NOT EXISTS exactly.
  *
  * Scale: one full-table groupBy, one full-table join at the end
  * (broadcast when the frontier-price frame is small — it always is:
  * |distinct prices| rows at most, frontier far fewer), and windows
  * that are either constant-size (bucket frame) or partitioned
  * (in-bucket). Nothing quadratic, no global sort, no driver
  * collect. Determinism: dominance is pure comparison — no float
  * arithmetic is created, so engines agree bit-for-bit on the same
  * parquet doubles. */
object SkylineOps {

  private val Buckets = 64

  /** The 2-D skyline of `df` minimizing `minCol`, maximizing
    * `maxCol`. Returns the input rows (all columns) that no other row
    * dominates. */
  def skyline2D(df: DataFrame, minCol: String, maxCol: String): DataFrame = {
    // barriered: the collapsed price frame feeds the bounds scalar AND
    // the bucketing — unbarriered, the base table scanned three times
    val prices = Persists.barrier(df.groupBy(col(minCol).as("p"))
      .agg(max(col(maxCol)).as("eqmax")))
    val bounds = prices.agg(min("p").as("lo"), max("p").as("hi"))
    // degenerate single-price input: everything lands in bucket 0
    val width = (col("hi") - col("lo")) / lit(Buckets.toDouble)
    val bkt = when(col("hi") === col("lo"), lit(0L))
      .otherwise(least(floor((col("p") - col("lo")) / width),
        lit(Buckets - 1L)))
    val bucketed = Persists.barrier(prices.crossJoin(broadcast(bounds))
      .select(col("p"), col("eqmax"), bkt.as("bkt")))
    val lowerW = Window.orderBy("bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val cumLower = bucketed.groupBy("bkt")
      .agg(max("eqmax").as("bmax"))
      .select(col("bkt"), max("bmax").over(lowerW).as("cum_lower"))
    val inBucketW = Window.partitionBy("bkt").orderBy("p")
      .rowsBetween(Window.unboundedPreceding, -1)
    val strictmax = when(col("inb").isNull, col("cum_lower"))
      .when(col("cum_lower").isNull, col("inb"))
      .otherwise(greatest(col("inb"), col("cum_lower")))
    val frontier = bucketed
      .join(broadcast(cumLower), Seq("bkt"))
      .withColumn("inb", max("eqmax").over(inBucketW))
      .withColumn("strictmax", strictmax)
      .filter(col("strictmax").isNull || col("strictmax") < col("eqmax"))
      .select(col("p"), col("eqmax"))
    df.join(broadcast(frontier),
        df(minCol) === col("p") && df(maxCol) === col("eqmax"))
      .select(df.columns.map(df(_)): _*)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // q113: the price/size Pareto frontier of the part catalog —
    // cheapest-for-their-size parts no other part strictly beats
    "q113_skyline" -> ((spark: SparkSession, sfDir: String) =>
      skyline2D(
        Tables.load(spark, sfDir, "part")
          .select(col("p_partkey"), col("p_retailprice"), col("p_size")),
        "p_retailprice", "p_size"))
  )

  def oracleSql: Map[String, String] = Map(
    // the literal dominance definition — b dominates a iff b is
    // ≤-price, ≥-size, and strictly better on at least one
    "q113_skyline" ->
      """SELECT a.p_partkey, a.p_retailprice, a.p_size
        FROM part a
        WHERE NOT EXISTS (
          SELECT 1 FROM part b
          WHERE b.p_retailprice <= a.p_retailprice
            AND b.p_size >= a.p_size
            AND (b.p_retailprice < a.p_retailprice
                 OR b.p_size > a.p_size))"""
  )
}
