// Bloom-surface evidence generator (SCALE_r8.md §4): measures (1) the
// q90 file-skipping rate — bloom-admitted vs min/max-admitted vs total
// files for the four probe keys on the hash-scattered layout — and
// (2) the c12 prefilter selectivity — the fraction of train-side
// shingle rows that survive the row-local bloom probe and therefore
// ever reach the decontamination join's shuffle.
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object BloomProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)

    import graft.sources.{BloomSkip, ZoneMap}
    val dir = BloomSkip.writeScattered(spark, sfDir)
    val manifest = spark.read.parquet(BloomSkip.manifestPath(spark, sfDir))
      .cache()
    val keys = BloomSkip.probeKeys(spark, sfDir)
    val total = manifest.count()
    val totalRows = manifest.agg(sum("n_rows")).head().getLong(0)
    val bloomFiles = BloomSkip.candidateFiles(manifest, keys)
    val bloomRows = manifest
      .filter(col("file").isin(bloomFiles: _*))
      .agg(sum("n_rows")).head().getLong(0)
    val zm = ZoneMap.buildManifest(spark, dir, Seq("l_orderkey"))
    val rangeFiles = keys.map(k =>
        zm.filter(col("l_orderkey_min") <= k && col("l_orderkey_max") >= k)
          .select("file"))
      .reduce(_ union _).distinct().count()
    val matchRows = spark.read.parquet(dir)
      .filter(col("l_orderkey").isin(keys: _*)).count()
    println(f"[q90] files: total=$total bloom=${bloomFiles.size} " +
      f"minmax=$rangeFiles | rows: total=$totalRows " +
      f"scanned=$bloomRows (${100.0 * bloomRows / totalRows}%.1f%%) " +
      f"matching=$matchRows")

    // c12: how much of the train side the row-local prefilter removes
    // before any shuffle (bloom sized like decontaminateBloom's default)
    val (evalSh, trainSh) = graft.operators.CurationOps
      .shingleSides(spark, sfDir, "src0", 8)
    val nEval = math.max(1L, evalSh.count())
    val bf = evalSh.agg(
      expr(s"graft_bloom_agg(key, ${nEval}L, CAST(0.01 AS DOUBLE))").as("bf"))
    val nTrain = trainSh.count()
    val nPass = trainSh.crossJoin(broadcast(bf))
      .filter(expr("graft_bloom_contains(bf, key)")).count()
    val nTrue = trainSh.join(evalSh.select("key").distinct(), "key").count()
    println(f"[c12] train shingle rows=$nTrain pass_prefilter=$nPass " +
      f"(${100.0 * nPass / nTrain}%.2f%%) true_matches=$nTrue " +
      f"(fp rows=${nPass - nTrue})")
    spark.stop()
  }
}
