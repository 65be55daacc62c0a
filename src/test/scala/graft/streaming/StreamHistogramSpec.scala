package graft.streaming

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q118: the stream-built mergeable histogram must reproduce the q108
  * batch grid exactly — integer bin adds are arrival-order-free, so
  * micro-batch boundaries cannot show. */
class StreamHistogramSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.getDefaultSession.foreach(_.stop())
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("stream histogram equals the batch build->merge->serve grid") {
    val stream = EventStream.histogramStream(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2))
      .toMap
    val batch = graft.operators.RelationalQueries
      .dfQueries("q108_histogram_sketch")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2))
      .toMap
    assert(stream.nonEmpty && stream == batch)
    // the zero-grid serve: every observed type carries all 20 bins
    assert(stream.keys.groupBy(_._1).values.forall(_.size == 20))
  }
}
