package graft.streaming

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The streamed CDC fold must land on byte-identical state to the
  * batch merge — across micro-batch boundaries (the fixture replays
  * one file per trigger), which is where an order-sensitive fold
  * would diverge. */
class StreamCdcSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("streamed merge equals the batch merge row-for-row") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getString(2), r.getDouble(3))).toSet
    val batch = rows(graft.operators.CdcOps.mergeOrders(spark, sfDir))
    val streamed = rows(StreamCdc.cdcMerge(spark, sfDir))
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("the change-feed fixture really replays as multiple files") {
    val dir = StreamCdc.changesPath(spark, sfDir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .count(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    assert(parts == 4, s"expected 4 change files, got $parts")
  }
}
