package graft.streaming

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The streamed WAP ingest must assemble the staged table across
  * MULTIPLE foreachBatch invocations (otherwise the entry gates a
  * single-batch copy, not streaming ingest) and publish an audit
  * identical to the source's. */
class StreamWapSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("ingest runs as multiple micro-batches and the published audit " +
      "equals the source audit") {
    val staging = graft.sources.FsUtil.qualified(
      "target/tmp/wap_stream/spec_staging")
    val fs = new org.apache.hadoop.fs.Path(staging)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(staging), true)
    val batches = StreamWap.streamToStaging(
      spark, StreamWap.sourcePath(spark, sfDir), staging)
    assert(batches >= 2, s"expected a multi-batch replay, got $batches")

    val audit = StreamWap.wapStream(spark, sfDir)
    val direct = graft.sources.SourceFormats.langAudit(
      graft.sources.Tables.load(spark, sfDir, "documents"))
    assert(audit.collect().toSet == direct.collect().toSet)
  }

  test("a duplicated batch is caught at publish, not silently published") {
    val staging = graft.sources.FsUtil.qualified(
      "target/tmp/wap_stream/spec_dup_staging")
    val published = graft.sources.FsUtil.qualified(
      "target/tmp/wap_stream/spec_dup_pub")
    val fs = new org.apache.hadoop.fs.Path(staging)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(staging), true)
    fs.delete(new org.apache.hadoop.fs.Path(published), true)
    val src = graft.sources.Tables.load(spark, sfDir, "documents")
    src.write.mode("append").parquet(staging)
    // the at-least-once failure mode: one batch delivered twice
    src.limit(7).write.mode("append").parquet(staging)
    val e = intercept[IllegalStateException] {
      graft.sources.SourceFormats.publishAudited(
        spark, src, staging, published)
    }
    assert(e.getMessage.contains("refusing to publish"))
  }
}
