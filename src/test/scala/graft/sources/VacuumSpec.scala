package graft.sources

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The vacuum contract: an orphan data file REALLY corrupts a naive
  * directory read (duplicated rows — the hazard vacuum exists for),
  * vacuum deletes exactly the orphans (live files and _SUCCESS
  * untouched), and a second vacuum is a no-op. */
class VacuumSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("orphan corrupts the naive read; vacuum restores it exactly") {
    val (dir, mpath) = Vacuum.writeTracked(spark, sfDir)
    val truth = Tables.load(spark, sfDir, "lineitem").count()
    val orphan = Vacuum.plantOrphan(spark, dir)
    val polluted = spark.read.parquet(dir).count()
    assert(polluted > truth,
      s"orphan must inflate the naive read ($polluted vs $truth)")
    val deleted = Vacuum.vacuum(spark, dir, mpath)
    assert(deleted == Seq(orphan),
      s"vacuum must delete exactly the orphan, got $deleted")
    assert(spark.read.parquet(dir).count() == truth)
    // _SUCCESS survives; a second vacuum finds nothing
    assert(FsUtil.exists(spark, dir + "/_SUCCESS"))
    assert(Vacuum.vacuum(spark, dir, mpath).isEmpty)
    // live files all survive: manifest and directory agree again
    val live = spark.read.parquet(mpath).count()
    assert(spark.read.parquet(dir).inputFiles.length.toLong == live)
  }
}
