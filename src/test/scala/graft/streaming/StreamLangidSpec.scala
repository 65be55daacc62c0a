package graft.streaming

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q121's contract: the streaming langid (t18's gram/model/score
  * stages on the document stream, argmax on the completed sink) must
  * equal the batch t18 answer row for row — integer scores and a
  * commutative sum make the aggregation arrival-order-free, so
  * micro-batch boundaries are invisible. */
class StreamLangidSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.getDefaultSession.foreach(_.stop())
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.streaming.checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-slid-ckpt").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = {
    graft.operators.Persists.releaseAll()
    if (spark != null) spark.stop()
  }

  test("streamed langid equals the batch t18 answer exactly") {
    val streamed = StreamCuration.langIdStream(spark, sfDir)
      .collect().map(_.toSeq).toSet
    val batch = graft.operators.TextOps
      .queries("t18_langid_model")(spark, sfDir)
      .collect().map(_.toSeq).toSet
    assert(streamed.nonEmpty && streamed === batch)
    // the detection is non-degenerate on this corpus: >1 language and
    // at least one 'und' spine-fallback row
    val langs = streamed.map(_(1).asInstanceOf[String])
    assert(langs.size > 1 && langs.contains("und"))
  }
}
