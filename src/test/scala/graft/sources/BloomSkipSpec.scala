package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The bloom-skip contract: the consult admits a STRICT subset of
  * files (pruning is real), the pruned read is EXACT (no false
  * negatives — every matching row survives), and on the same
  * hash-scattered layout a min/max manifest admits (almost) every
  * file — the measurement that motivates Bloom manifests at all. */
class BloomSkipSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.getDefaultSession.foreach(_.stop())
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private lazy val dir = BloomSkip.writeScattered(spark, sfDir)
  private lazy val manifest =
    spark.read.parquet(BloomSkip.manifestPath(spark, sfDir)).cache()
  private lazy val keys = BloomSkip.probeKeys(spark, sfDir)

  // empty hash partitions write no file, so the layout can land under
  // the [[BloomSkip.Files]] target at small scale factors
  private lazy val nFiles = manifest.count()

  test("manifest has one row per file and reproduces the row count") {
    assert(nFiles > BloomSkip.Files / 2 && nFiles <= BloomSkip.Files,
      s"expected ≤${BloomSkip.Files} files, manifest has $nFiles")
    val total = Tables.load(spark, sfDir, "lineitem").count()
    assert(manifest.agg(sum("n_rows")).head().getLong(0) == total)
  }

  test("consult admits a strict subset of files") {
    val cand = BloomSkip.candidateFiles(manifest, keys)
    assert(cand.nonEmpty)
    // 4 probe keys × ~4 lineitems each land in ≤16 files; fpp=1% adds
    // well under one expected extra of 64 — anything near the full
    // file set means no pruning
    assert(cand.size < nFiles / 2,
      s"bloom admitted ${cand.size} of $nFiles files")
  }

  test("pruned read is exact: identical rows to the full-scan filter") {
    val pruned = BloomSkip.prunedKeyRead(spark, manifest, "l_orderkey", keys)
    val full = spark.read.parquet(dir)
      .filter(col("l_orderkey").isin(keys: _*))
    assert(pruned.exceptAll(full).isEmpty && full.exceptAll(pruned).isEmpty)
    assert(pruned.count() > 0)
  }

  test("min/max manifest cannot prune the scattered layout") {
    val zm = ZoneMap.buildManifest(spark, dir, Seq("l_orderkey"))
    // files whose [min, max] extent covers ANY probe key — the best a
    // min/max consult can do for a point lookup
    val admitted = keys.map(k =>
        zm.filter(col("l_orderkey_min") <= k && col("l_orderkey_max") >= k)
          .select("file"))
      .reduce(_ union _).distinct().count()
    val bloomAdmitted = BloomSkip.candidateFiles(manifest, keys).size
    assert(admitted > nFiles / 2,
      s"layout unexpectedly clustered: min/max admitted only $admitted files")
    assert(bloomAdmitted < admitted,
      s"bloom ($bloomAdmitted files) should beat min/max ($admitted)")
  }
}
