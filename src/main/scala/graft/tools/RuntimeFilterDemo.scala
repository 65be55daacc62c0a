// Runtime Bloom-filter join pruning: when a selective dimension-side
// filter can't broadcast (big-big join), Spark can still build a Bloom
// filter over the creation side's join keys at runtime and inject a
// `bloom_filter_might_contain` predicate into the fact side BEFORE its
// shuffle — at 100 TB that turns "shuffle every fact row, drop most in
// the join" into "drop most fact rows at the scan".
//
// This demo proves the engine's configuration path exercises that
// machinery: same join planned with and without runtime filtering,
// asserts the injected predicate appears and that the fact side's
// pre-shuffle row count collapses to the matching fraction.
//
// Usage: runMain graft.tools.RuntimeFilterDemo [sfDir]
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object RuntimeFilterDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      // big-big join shape: no broadcast, so the Bloom path is the only
      // way the dim filter reaches the fact scan
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      // plain (non-adaptive) plans so the fact scan leaf and its metrics
      // are directly addressable; InjectRuntimeFilter is a logical-
      // optimizer rule and fires either way
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // local-scale testdata sits far below the production-tuned size
      // gates; drop them so the optimizer treats the 60 MB table like
      // the 100 TB one it stands in for
      .config("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "500MB")
      .config("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // selective creation side: one order priority (~20% of orders)
    def join(bloom: Boolean) = {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled",
        bloom.toString)
      graft.sources.Tables.load(spark, sfDir, "lineitem")
        .join(graft.sources.Tables.load(spark, sfDir, "orders")
          .filter(col("o_orderpriority") === "1-URGENT"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("items"))
    }

    val withBloom = join(bloom = true)
    withBloom.collect()
    // the injected predicate prints as might_contain(scalar-subquery...)
    // over a bloom_filter_agg build — check the optimized plan (the
    // physical text compacts subqueries)
    val opt = withBloom.queryExecution.optimizedPlan.toString
    val injected = opt.contains("might_contain") &&
      opt.contains("bloom_filter_agg")
    println(s"bloom filter injected: $injected")
    require(injected, "runtime bloom filter did not inject:\n" + opt)

    // pre-shuffle fact rows: the might_contain predicate is a scalar-
    // subquery filter (not pushable into the parquet scan), so the
    // reduction shows at the fact-side FilterExec's output — exactly
    // the rows that pay for serialization into the join shuffle
    def factScanRows(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FilterExec
            if f.child.toString.contains("lineitem") =>
          f.metrics("numOutputRows").value
      }.sum
    val prunedRows = factScanRows(withBloom)

    val noBloom = join(bloom = false)
    noBloom.collect()
    val fullRows = factScanRows(noBloom)

    println(f"fact rows reaching the shuffle: $fullRows%d without bloom, " +
      f"$prunedRows%d with (${100.0 * prunedRows / fullRows}%.1f%%)")
    // both metrics must have been FOUND — a plan-shape drift that makes
    // the collect{} match nothing would otherwise read as a perfect
    // (vacuous) reduction in a committed-evidence tool
    require(fullRows > 0 && prunedRows > 0,
      "fact-side FilterExec metric not found — plan shape changed?")
    require(prunedRows < fullRows,
      "bloom filter should cut the fact side's pre-shuffle rows")
    spark.stop()
  }
}
