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

  private def docsStream(spark: SparkSession, sfDir: String) =
    spark.readStream
      .schema(StreamDedup.docSchema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(sfDir)

  /** q55: the c07 stratified sampler over a documents file stream. */
  def sampleStream(spark: SparkSession, sfDir: String): DataFrame =
    StreamRun.toCompletion(
      docsStream(spark, sfDir)
        .filter(expr(graft.operators.CurationOps.stratFilterSql))
        .select("doc_id", "lang", "source"),
      "graft_stream_sample")

  /** q56: the c08 mix-composition report as a COMPLETE-mode streaming
    * aggregation — running (source, lang) counts maintained in the state
    * store, full table re-emitted per micro-batch, final emission ==
    * the batch answer. The share columns are batch post-processing on
    * the completed sink (window functions can't run inside a streaming
    * aggregation), which is how a live mix dashboard consumes this:
    * bounded state (sources × langs cells), shares computed at read
    * time. */
  def mixStream(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val cells = StreamRun.toCompletion(
      docsStream(spark, sfDir).groupBy("source", "lang")
        .agg(count(lit(1)).as("docs"), sum("n_chars").as("chars")),
      "graft_stream_mix", outputMode = "complete")
    graft.operators.CurationOps.withMixShares(cells)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q55_stream_sample" -> (sampleStream _),
    "q56_stream_mix" -> (mixStream _)
  )

  def oracleSql: Map[String, String] = Map(
    // the BATCH oracles verbatim: stateless filter / complete-mode agg
    // streams must equal their batch answers
    "q55_stream_sample" -> graft.operators.CurationOps.stratOracle,
    "q56_stream_mix" ->
      graft.operators.CurationOps.oracleSql("c08_mix_report")
  )
}
