package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Streaming curation: the stateless selection stages run on a document
  * STREAM with the batch operators' exact predicates.
  *
  * A stateless stage (filter/projection) is trivially exactly-once under
  * Structured Streaming — no state store, no watermark, every micro-batch is
  * independent — so the batch DuckDB oracle applies verbatim; what the
  * gate buys here is proof that the predicate strings really are shared
  * (one definition in CurationOps) and that the streaming plumbing
  * (file source → filter → sink) preserves them. In production this is
  * the ingest-time shape: score-and-sample documents as they land,
  * rather than re-scanning the corpus. */
object StreamCuration {

  /** q55: the c07 stratified sampler over a documents file stream. */
  def sampleStream(spark: SparkSession, sfDir: String): DataFrame = {
    val docsStream = spark.readStream
      .schema(StreamDedup.docSchema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(sfDir)
    StreamRun.toCompletion(
      docsStream.filter(expr(graft.operators.CurationOps.stratFilterSql))
        .select("doc_id", "lang", "source"),
      "graft_stream_sample")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q55_stream_sample" -> (sampleStream _)
  )

  def oracleSql: Map[String, String] = Map(
    // the BATCH c07 oracle verbatim: stateless stream == batch
    "q55_stream_sample" -> graft.operators.CurationOps.stratOracle
  )
}
