package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Skew-safe join: the salting pattern for hot keys at 100 TB.
  *
  * A shuffled equi-join puts every row of one key into one task; a hot
  * key (a celebrity user, a default value, an empty string) turns that
  * task into the straggler that dominates the stage. AQE's skew-join
  * split handles sort-merge joins after the fact; SALTING is the
  * planner-independent form: append a salt in [0, buckets) to the
  * probe side's key, replicate the build side once per salt value, and
  * join on (key, salt) — the hot key's rows now spread across `buckets`
  * tasks. Result-identical to the plain join (every probe row still
  * meets every matching build row exactly once, in exactly one salt
  * bucket).
  *
  * Cost model: build side is replicated `buckets`× through the shuffle
  * — use for a small-ish build side against a skewed probe side, with
  * `buckets` ≈ the skew factor to flatten, not more.
  */
object SkewOps {

  /** Inner equi-join of `probe` (skewed side) with `build` on
    * `probeKey == buildKey`, salted across `buckets` tasks per key.
    * Salt is derived deterministically from the probe row content
    * (xxhash64 over all columns), so repeated runs shuffle identically;
    * ANY salt assignment yields the same join result. */
  def saltedJoin(
      probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String,
      buckets: Int = 8): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val salted = probe.withColumn("_salt",
      pmod(xxhash64(struct(probe.columns.map(col).toSeq: _*)), lit(buckets))
        .cast("int"))
    val replicated = build.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated,
        salted(probeKey) === replicated(buildKey) &&
          salted("_salt") === replicated("_salt"),
        "inner")
      .drop("_salt")
  }

  /** The salted join as a harness query: orders (probe) ⋈ customer
    * (build) — hash-identical to the plain-join oracle, proving salting
    * is result-neutral end-to-end through the real shuffle machinery. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q46_salted_join" -> ((spark: SparkSession, sfDir: String) => {
      val orders = Tables.load(spark, sfDir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
      val customer = Tables.load(spark, sfDir, "customer")
        .select("c_custkey", "c_mktsegment")
      saltedJoin(orders, customer, "o_custkey", "c_custkey")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("cnt"), round(sum("o_totalprice"), 2).as("total"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q46_salted_join" ->
      """SELECT c_mktsegment, count(*) AS cnt,
                round(sum(o_totalprice), 2) AS total
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment"""
  )
}
