package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The zone-map contract: the manifest is a correct per-file summary
  * (its totals reproduce the table), consulting it prunes files a box
  * predicate cannot match, and the pruned read is EXACT — same rows as
  * the full scan, for any box, including one matching nothing. */
class ZoneMapSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private lazy val dir = ZoneMap.writeZPartitioned(spark, sfDir)
  private lazy val manifest =
    ZoneMap.buildManifest(spark, dir, Seq("l_partkey", "l_suppkey")).cache()

  test("manifest totals reproduce the table") {
    val total = Tables.load(spark, sfDir, "lineitem").count()
    val agg = manifest.agg(
      sum("n_rows"), min("l_partkey_min"), max("l_partkey_max")).collect()(0)
    assert(agg.getLong(0) == total)
    val truth = Tables.load(spark, sfDir, "lineitem")
      .agg(min("l_partkey"), max("l_partkey")).collect()(0)
    assert((agg.getLong(1), agg.getLong(2)) ==
      (truth.getLong(0), truth.getLong(1)))
  }

  test("pruned read is exact and skips non-overlapping files") {
    val box = Seq(("l_partkey", 40L, 80L), ("l_suppkey", 2L, 5L))
    val got = ZoneMap.prunedRead(spark, manifest, box)
      .select("l_orderkey", "l_partkey", "l_suppkey")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val want = spark.read.parquet(dir)
      .filter(col("l_partkey").between(40, 80) &&
        col("l_suppkey").between(2, 5))
      .select("l_orderkey", "l_partkey", "l_suppkey")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(got.nonEmpty && (got sameElements want))
    val totalFiles = manifest.count()
    val readFiles = ZoneMap.overlappingFiles(manifest, "l_partkey", 40L, 80L)
    assert(readFiles.size < totalFiles,
      s"partkey extent [40,80] should prune some of $totalFiles z-files")
  }

  test("q69 gate box prunes a strict file subset and matches the direct scan") {
    // the file set actually read by the gated entry must be a STRICT
    // subset — q69 must not pass by degenerating into a full scan
    val keep = ZoneMap.PrunedBox.foldLeft(lit(true)) { case (acc, (c, lo, hi)) =>
      acc && col(s"${c}_min") <= hi && col(s"${c}_max") >= lo
    }
    val admitted = manifest.filter(keep).count()
    assert(admitted > 0 && admitted < manifest.count(),
      s"gate box admits $admitted of ${manifest.count()} files")
    val got = ZoneMap.zonemapPrunedScan(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val (Seq((_, pLo, pHi), (_, sLo, sHi))) = ZoneMap.PrunedBox
    val want = Tables.load(spark, sfDir, "lineitem")
      .filter(col("l_partkey").between(pLo, pHi) &&
        col("l_suppkey").between(sLo, sHi))
      .select("l_orderkey", "l_partkey", "l_suppkey")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(got.nonEmpty && (got sameElements want))
  }

  test("basePath reconstructs the hive partition column on a pruned read") {
    val out = ZoneMap.prunedRead(spark, manifest,
      ZoneMap.PrunedBox, basePath = Some(dir))
    assert(out.columns.contains("zfile"),
      s"partition column lost: ${out.columns.mkString(",")}")
    // without basePath the subset read has only data columns
    val bare = ZoneMap.prunedRead(spark, manifest, ZoneMap.PrunedBox)
    assert(!bare.columns.contains("zfile"))
  }

  test("a box matching nothing reads zero rows with the data schema") {
    val out = ZoneMap.prunedRead(spark, manifest,
      Seq(("l_partkey", -100L, -1L)))
    assert(out.count() == 0)
    assert(out.columns.contains("l_partkey"))
  }
}
