package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import graft.sources.{FsUtil, SourceFormats, Tables}

/** q84: STREAMING ingest through `foreachBatch` into the q82
  * write-audit-publish cycle — the one Structured Streaming surface
  * the other gates don't touch: the production SINK pattern. Each
  * micro-batch appends parquet to a STAGING directory readers never
  * see; when the feed drains, the staged table is audited against the
  * source (per-lang counts + volume + order-insensitive checksum —
  * [[SourceFormats.langAudit]]) and atomically renamed into the
  * published location. foreachBatch is only at-least-once under
  * retries — duplicated batches are exactly what the audit catches,
  * so the PUBLISH is where exactly-once is enforced, not the write
  * path. Gated by q82's oracle verbatim: the published table's audit
  * must equal the source-side audit however many batches carried it.
  *
  * The fixture splits documents into 4 files replayed one per
  * trigger, so the staged table really is assembled across multiple
  * foreachBatch invocations (StreamWapSpec pins batches >= 2). */
object StreamWap {

  /** documents as a 4-file stream-source fixture (idempotent,
    * _SUCCESS-checked; source data is immutable so no content
    * fingerprint is needed). */
  def sourcePath(spark: SparkSession, sfDir: String): String = {
    val dir = FsUtil.qualified(
      "target/tmp/wap_stream/src_" + FsUtil.sanitize(sfDir))
    if (!FsUtil.exists(spark, dir + "/_SUCCESS"))
      Tables.load(spark, sfDir, "documents").repartition(4)
        .write.mode("overwrite").parquet(dir)
    dir
  }

  /** Drain the document stream into `staging` via foreachBatch;
    * returns the number of micro-batches that ran. */
  def streamToStaging(
      spark: SparkSession, srcDir: String, staging: String): Int = {
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    val q = spark.readStream
      .schema(StreamDedup.docSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batches.incrementAndGet()
        batch.write.mode("append").parquet(staging)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    if (!q.awaitTermination(300000)) {
      q.stop()
      throw new IllegalStateException("WAP ingest stream did not finish")
    }
    q.stop()
    batches.get()
  }

  def wapStream(spark: SparkSession, sfDir: String): DataFrame = {
    val staging = FsUtil.qualified(
      "target/tmp/wap_stream/staging_" + FsUtil.sanitize(sfDir))
    val published = FsUtil.qualified(
      "target/tmp/wap_stream/published_" + FsUtil.sanitize(sfDir))
    // a fresh staging per run: leftover staged rows from an aborted
    // run would (correctly) fail the audit, but the gate should
    // exercise the clean path
    val conf = spark.sessionState.newHadoopConf()
    val stPath = new org.apache.hadoop.fs.Path(staging)
    val fs = stPath.getFileSystem(conf)
    if (fs.exists(stPath)) fs.delete(stPath, true)
    streamToStaging(spark, sourcePath(spark, sfDir), staging)
    val src = Tables.load(spark, sfDir, "documents")
    SourceFormats.publishAudited(spark, src, staging, published)
    SourceFormats.langAudit(spark.read.parquet(published))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q84_stream_wap" -> (wapStream _)
  )

  def oracleSql: Map[String, String] = Map(
    // q82's oracle verbatim: the streamed, batch-assembled publish
    // must carry the identical audit
    "q84_stream_wap" -> SourceFormats.oracleSql("q82_write_audit_publish")
  )
}
