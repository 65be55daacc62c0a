package graft.streaming

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q106 contract: the stream-built HLL sketches serve the SAME
  * estimates as the batch q105 build — HLL union keeps the max
  * register per bucket, so arrival order and micro-batch boundaries
  * cannot change the sketch, making stream ≡ batch exact (the
  * StreamCmsSpec discipline applied to NDV). */
class StreamHllSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("stream-built sketches serve the batch estimates exactly") {
    val stream = EventStream.hllStream(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = graft.operators.RelationalQueries
      .noOracleQueries("q105_hll_sketch_column")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stream.nonEmpty && stream == batch)
    assert(stream.contains("__all__"))
  }
}
