// Bucketed co-located join demo: write orders + lineitem bucketed on
// the join key, then join the bucketed tables and PROVE the plan has no
// shuffle exchange on either side — the pre-partitioning strategy that
// turns every repeated fact-fact join at 100 TB into a zero-shuffle
// merge (pay the shuffle once at write time, never again at read).
//
// Usage: runMain graft.tools.BucketingDemo [sfDir]
// (bucketed data lands at Bucketing's external-table path,
//  target/tmp/bucketed/)
package graft.tools

import org.apache.spark.sql.SparkSession

object BucketingDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force the issue
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // pay the shuffle once, at write time (the q57 operator's own
    // write+join path — the demo adds the plain-parquet contrast)
    val joined = graft.sources.Bucketing.colocatedJoin(spark, sfDir)
    val plan = joined.queryExecution.executedPlan.toString
    println(plan.linesIterator.take(25).mkString("\n"))
    val exchanges = "Exchange".r.findAllIn(plan).size
    val cnt = joined.count()
    println(s"bucketed join: $cnt rows, $exchanges exchanges in plan")
    require(exchanges == 0,
      s"bucketed join should be exchange-free, found $exchanges")

    // the same join over plain parquet shuffles both sides
    val plainPlan = graft.sources.Tables.load(spark, sfDir, "orders")
      .join(graft.sources.Tables.load(spark, sfDir, "lineitem"),
        org.apache.spark.sql.functions.col("o_orderkey") ===
          org.apache.spark.sql.functions.col("l_orderkey"))
      .queryExecution.executedPlan.toString
    val plainExchanges = "Exchange".r.findAllIn(plainPlan).size
    println(s"plain-parquet join: $plainExchanges exchanges in plan")
    require(plainExchanges >= 2, "plain join should shuffle both sides")
    println("BUCKETED CO-LOCATED JOIN OK (0 exchanges vs " +
      s"$plainExchanges shuffled)")
    spark.stop()
  }
}
