// Measured file-level skipping through the ZoneMap manifest: the same
// 2-D box predicate ZOrderSkipDemo uses for row-group evidence, now
// answered by consulting the per-file min/max manifest BEFORE the scan
// — whole files never enter the plan. Reports files and rows admitted
// by the manifest vs the full table, and verifies the pruned answer
// equals the naive full-scan filter. Results committed in SCALE_r6.md.
//
// Usage: runMain graft.tools.ZoneMapSkipDemo [sfDir]
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ZoneMapSkipDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.sources.ZoneMap

    val dir = ZoneMap.writeZPartitioned(spark, sfDir)
    val manifest =
      ZoneMap.buildManifest(spark, dir, Seq("l_partkey", "l_suppkey")).cache()
    val (files, rows) = {
      val r = manifest.agg(count(lit(1)), sum("n_rows")).collect()(0)
      (r.getLong(0), r.getLong(1))
    }

    // the ZOrderSkipDemo box: 256 part keys x 64 supp keys
    val box = Seq(("l_partkey", 1024L, 1279L), ("l_suppkey", 32L, 95L))
    val keep = manifest.filter(
      col("l_partkey_min") <= 1279 && col("l_partkey_max") >= 1024 &&
        col("l_suppkey_min") <= 95 && col("l_suppkey_max") >= 32)
    val (keptFiles, keptRows) = {
      val r = keep.agg(count(lit(1)), coalesce(sum("n_rows"), lit(0L)))
        .collect()(0)
      (r.getLong(0), r.getLong(1))
    }

    val hits = ZoneMap.prunedRead(spark, manifest, box).count()
    val truth = spark.read.parquet(dir)
      .filter(col("l_partkey").between(1024, 1279) &&
        col("l_suppkey").between(32, 95)).count()
    require(hits == truth, s"pruned read disagrees: $hits vs $truth")

    println(f"gate layout (z div W blocks): $files%d files, $rows%d rows")
    println(f"  manifest admits $keptFiles%d files / $keptRows%d rows " +
      f"(boxHits=$hits%d): ${100.0 * (files - keptFiles) / files}%.1f%% of " +
      f"files skipped, ${rows.toDouble / math.max(keptRows, 1)}%.1fx row skip")

    // the production layout: RANGE-partitioned on z (equal-sized files,
    // what an ingest writer would produce); boundaries are sampled so
    // this can't be oracle-gated, but the manifest consult is identical
    graft.functions.GraftFunctions.register(spark)
    val balDir = java.nio.file.Files
      .createTempDirectory("graft-zonemap-bal").toString
    graft.sources.Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_extendedprice"),
        expr("graft_zvalue(l_partkey, l_suppkey)").as("z"))
      .repartitionByRange(64, col("z")).drop("z")
      .write.mode("overwrite").parquet(balDir)
    val balManifest = ZoneMap
      .buildManifest(spark, balDir, Seq("l_partkey", "l_suppkey")).cache()
    val balFiles = balManifest.count()
    val balKeep = balManifest.filter(
      col("l_partkey_min") <= 1279 && col("l_partkey_max") >= 1024 &&
        col("l_suppkey_min") <= 95 && col("l_suppkey_max") >= 32)
    val (balKeptFiles, balKeptRows) = {
      val r = balKeep.agg(count(lit(1)), coalesce(sum("n_rows"), lit(0L)))
        .collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    val balHits = ZoneMap.prunedRead(spark, balManifest, box).count()
    require(balHits == truth, s"balanced layout disagrees: $balHits vs $truth")
    println(f"balanced layout (repartitionByRange(64, z)): $balFiles%d files")
    println(f"  manifest admits $balKeptFiles%d files / $balKeptRows%d rows: " +
      f"${100.0 * (balFiles - balKeptFiles) / balFiles}%.1f%% of files " +
      f"skipped, ${rows.toDouble / math.max(balKeptRows, 1)}%.1fx row skip")
    spark.stop()
  }
}
