// Scale shape of the join-sample synopsis estimator (SampleEstimator):
// collection is one filtered scan per (table, filter) capped at `cap`
// driver rows; estimation is in-memory subset joins. This probe times
// both at increasing SF on tree9_sel's graph — the claim to verify is
// that ESTIMATION cost is SF-INDEPENDENT (the synopsis is capped) while
// collection grows only with scan time, i.e. the tier deploys at 100 TB
// as ANALYZE-time work plus microsecond-scale planning lookups.
//
// Usage: runMain graft.tools.SampleSynopsisProbe [sfDir ...]
package graft.tools

import org.apache.spark.sql.SparkSession
import graft.plans._

object SampleSynopsisProbe {
  def main(args: Array[String]): Unit = {
    val sfDirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val cq = JobCorpus.all.find(_.name == "tree9_sel").get
    val g = cq.graph
    val subsets = (1L to g.full).filter(g.connected)
    sfDirs.foreach { sfDir =>
      val profiles = g.relations.map(n =>
        AliasedRels.profile(spark, sfDir, n)).toVector
      val t0 = System.nanoTime()
      val card = SampleEstimator.cardinality(
        spark, sfDir, g, cq.filters, profiles)
      // force collection by estimating one singleton
      card(1L)
      val collectMs = (System.nanoTime() - t0) / 1e6
      val t1 = System.nanoTime()
      subsets.foreach(card(_))
      val estimateMs = (System.nanoTime() - t1) / 1e6
      // second pass: memoized lookups (what a DP enumerator re-pays)
      val t2 = System.nanoTime()
      subsets.foreach(card(_))
      val memoMs = (System.nanoTime() - t2) / 1e6
      println(f"$sfDir%-28s collect=${collectMs}%8.1f ms  " +
        f"estimate(${subsets.size} subsets)=${estimateMs}%8.1f ms  " +
        f"memoized=${memoMs}%6.2f ms")
    }
    spark.stop()
  }
}
