package graft.streaming

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q89's contract: the count-min sketch built BY the streaming
  * aggregate must reproduce the batch-built sketch's estimates
  * exactly. CMS construction is arrival-order-free (counter
  * increments commute, and the builder fixes ε/δ/seed), so however
  * the micro-batches carve up the corpus, the completed stream's
  * sketch is the batch sketch — which makes t14's served frame the
  * strongest available oracle for the streaming form. */
class StreamCmsSpec extends AnyFunSuite with BeforeAndAfterAll {

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
        java.nio.file.Files.createTempDirectory("graft-scms-ckpt").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = {
    graft.operators.Persists.releaseAll()
    if (spark != null) spark.stop()
  }

  test("stream-built sketch serves identically to the batch sketch") {
    val streamed = StreamCuration.cmsStream(spark, sfDir)
      .orderBy("rk").collect().toSeq
    val batch = graft.operators.TextOps.cmsServe(spark, sfDir)
      .orderBy("rk").collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch,
      "stream CMS must reproduce the batch sketch bit-for-bit")
  }
}
