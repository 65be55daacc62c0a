package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The time-travel contract: the v1 read is ISOLATED from the later
  * append (identical rows to the pre-append table, while the naive
  * directory read sees more), v2 reads the full table, and vacuum
  * against the latest manifest deletes nothing (cumulative manifests
  * keep every retained version live). */
class SnapshotsSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("v1 read is isolated from the append; v2 is the full table") {
    val dir = Snapshots.writeVersions(spark, sfDir)
    val base = Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice")
    val v1Truth = base.filter(col("l_quantity") <= Snapshots.SplitQty)
    val v1 = Snapshots.readAt(spark, dir, 1)
    assert(v1.exceptAll(v1Truth).isEmpty && v1Truth.exceptAll(v1).isEmpty)
    assert(v1.count() > 0 && v1.count() < base.count(),
      "fixture must split the table across versions")
    // the naive directory read is NOT isolated — it sees the append
    assert(spark.read.parquet(dir).count() == base.count())
    val v2 = Snapshots.readAt(spark, dir, 2)
    assert(v2.exceptAll(base).isEmpty && base.exceptAll(v2).isEmpty)
  }

  test("incremental stats manifest equals a full rebuild and reads " +
      "only the appended files") {
    val dir = Snapshots.writeVersions(spark, sfDir)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0).split("/").last, r.getLong(1),
        r.getDouble(2), r.getDouble(3))).toSet
    val inc = Snapshots.statsManifestAt(spark, sfDir, 2)
    val full = ZoneMap.buildManifest(spark, dir, Seq("l_quantity"))
    assert(rows(inc) == rows(full),
      "incremental maintenance must reproduce the full rebuild")
    // the refresh's build scans ONLY the appended files
    val v1 = Snapshots.filesOf(spark, dir, 1).map(_.split("/").last).toSet
    val v2 = Snapshots.filesOf(spark, dir, 2).map(_.split("/").last).toSet
    val newNames = v2 -- v1
    assert(newNames.nonEmpty)
    val increment = ZoneMap.buildManifestFiles(spark,
      newNames.toSeq.map(dir + "/" + _), Seq("l_quantity"))
    val scanned = increment.inputFiles.map(_.split("/").last).toSet
    assert(scanned.subsetOf(newNames),
      s"refresh scanned non-delta files: ${scanned -- newNames}")
    // the q96 box admits only v1 files: the appended half is pruned
    val admitted = inc.filter(
        org.apache.spark.sql.functions.col("l_quantity_min") <= 20.0 &&
        org.apache.spark.sql.functions.col("l_quantity_max") >= 0.0)
      .select("file").collect().map(_.getString(0).split("/").last).toSet
    assert(admitted.nonEmpty && admitted.subsetOf(v1),
      s"box admitted appended files: ${admitted -- v1}")
  }

  test("vacuum at the latest manifest preserves every version's files") {
    val dir = Snapshots.writeVersions(spark, sfDir)
    val deleted = Vacuum.vacuum(spark, dir, Snapshots.manifestPath(dir, 2))
    assert(deleted.isEmpty,
      s"cumulative v2 manifest must keep all files live, deleted $deleted")
    // and the v1 read still works afterwards
    assert(Snapshots.readAt(spark, dir, 1).count() > 0)
  }
}
