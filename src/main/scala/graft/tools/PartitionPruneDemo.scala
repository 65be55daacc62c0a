// Partition-pruning demo: write events hive-partitioned by event_type,
// read back with a type filter, and PROVE the scan touches only the
// matching partition directories (PartitionFilters in the scan node +
// per-partition file listing) — the layout discipline that turns a
// 100 TB table into an O(selected-partitions) read.
//
// Usage: runMain graft.tools.PartitionPruneDemo [sfDir [outDir]]
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object PartitionPruneDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outDir = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("graft-part").toString)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // partitioned sink: one directory per event_type
    graft.sources.Tables.load(spark, sfDir, "events")
      .withColumn("day", to_date(col("ts")))
      .write.partitionBy("event_type").mode("overwrite")
      .parquet(s"$outDir/events_by_type")

    val part = spark.read.parquet(s"$outDir/events_by_type")
    val q = part.filter(col("event_type") === "purchase")
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sv"))
    q.collect().foreach(r => println(s"purchase partition: $r"))
    val plan = q.queryExecution.executedPlan.toString
    val pf = "PartitionFilters: \\[[^\\]]+\\]".r.findFirstIn(plan)
    println(s"scan partition filters: ${pf.getOrElse("NONE")}")
    require(pf.exists(_.contains("event_type")),
      s"scan must carry a partition filter on event_type:\n$plan")

    // ground truth: the pruned read equals the full-scan filter
    val full = graft.sources.Tables.load(spark, sfDir, "events")
      .filter(col("event_type") === "purchase")
      .agg(count(lit(1)), round(sum("value"), 2)).collect().head
    val pruned = q.collect().head
    require(pruned == full, s"pruned $pruned != full $full")
    println("PARTITION PRUNING OK")
    spark.stop()
  }
}
