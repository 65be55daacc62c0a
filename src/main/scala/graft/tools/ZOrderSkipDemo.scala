// Measured Z-order data-skipping evidence: write lineitem twice — natural
// (orderkey) order vs z-order on (l_partkey, l_suppkey) — with small parquet
// row groups, then run the same 2-D box predicate against both layouts and
// report the scan's numOutputRows metric (rows surviving parquet row-group
// min/max pruning; the pushed predicate skips whole row groups whose
// column stats miss the box).
//
// The z-ordered layout should read a small fraction of the corpus for a
// box that touches both keys; the natural layout reads ~everything,
// because every row group spans the full (partkey, suppkey) range. This
// is the 100 TB story for q58 made measurable at sf0.1.
//
// Usage: runMain graft.tools.ZOrderSkipDemo [sfDir]
package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object ZOrderSkipDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      // plain (non-adaptive) plans so the scan leaf and its metrics are
      // directly addressable after execution
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)

    val li = graft.sources.Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_extendedprice"))
    val total = li.count()

    def writeSorted(d: DataFrame, sortCol: String, dir: String): Unit =
      d.repartitionByRange(8, col(sortCol)).sortWithinPartitions(sortCol)
        .write.mode("overwrite")
        // small row groups -> many min/max pruning units, the local-mode
        // stand-in for a 100 TB table's many-row-groups-per-file reality
        .option("parquet.block.size", (256 * 1024).toString)
        .parquet(dir)

    val base = java.nio.file.Files.createTempDirectory("graft-zskip").toString
    writeSorted(li, "l_orderkey", s"$base/natural")
    writeSorted(
      li.withColumn("z",
        expr("graft_zvalue(l_partkey % 65536, l_suppkey % 65536)")),
      "z", s"$base/zorder")

    // a 2-D box: 256 part keys x 64 supp keys
    def boxScan(dir: String): (Long, Long) = {
      val df = spark.read.parquet(dir)
        .filter(col("l_partkey").between(1024, 1279) &&
          col("l_suppkey").between(32, 95))
      // collect() (not count()) so THIS QueryExecution runs and its
      // scan's metrics fill in — count() plans a separate execution
      val hits = df.collect().length.toLong
      val scan = df.queryExecution.executedPlan.collectLeaves().head
      (scan.metrics("numOutputRows").value, hits)
    }

    val (naturalRead, naturalHits) = boxScan(s"$base/natural")
    val (zorderRead, zorderHits) = boxScan(s"$base/zorder")
    require(naturalHits == zorderHits,
      s"layouts disagree on the answer: $naturalHits vs $zorderHits")

    println(f"rows total=$total%d boxHits=$naturalHits%d")
    println(f"natural layout: scan emitted $naturalRead%d rows " +
      f"(${100.0 * naturalRead / total}%.1f%% of the table)")
    println(f"z-order layout: scan emitted $zorderRead%d rows " +
      f"(${100.0 * zorderRead / total}%.1f%% of the table)")
    println(f"skipping factor: ${naturalRead.toDouble / zorderRead.max(1)}%.1fx")
    require(zorderRead < naturalRead,
      "z-order should prune more row groups than the natural layout")
    spark.stop()
  }
}
