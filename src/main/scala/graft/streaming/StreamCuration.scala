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

  /** q71: STREAMING decontamination — the c04 benchmark-leakage check
    * as documents land, via the one streaming surface the other gates
    * don't exercise: a STREAM-STATIC join. The eval set is static by
    * nature (benchmarks change rarely; corpus streams daily), so the
    * eval shingles are a batch frame broadcast under the stream —
    * stateless on the stream side, no watermark, no state store:
    * every matched (train, eval, shingle) triple is emitted exactly
    * once as its document arrives. The per-pair distinct-shingle count
    * is batch post-processing on the completed sink (the q56/q64
    * pattern: stream the heavy join, batch the bounded aggregate —
    * countDistinct isn't a streaming aggregate, and a live pipeline
    * reads contamination pairs off the sink anyway). Gated by c04's
    * DuckDB oracle verbatim. */
  def decontamStream(
      spark: SparkSession, sfDir: String,
      evalSource: String = "src0", shingleK: Int = 8,
      minShared: Int = 1): DataFrame = {
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.register(spark)
    val evalSh = graft.sources.Tables.load(spark, sfDir, "documents")
      .filter(col("source") === evalSource)
      .select(col("doc_id").as("eval_id"),
        explode(graft.operators.Shingles.wordShingles("text", shingleK))
          .as("key"))
    val matches = StreamRun.toCompletion(
      docsStream(spark, sfDir)
        .filter(col("source") =!= evalSource)
        .select(col("doc_id").as("train_id"),
          explode(graft.operators.Shingles.wordShingles("text", shingleK))
            .as("key"))
        .join(broadcast(evalSh), "key")
        .select("train_id", "eval_id", "key"),
      "graft_stream_decontam")
    matches.groupBy("train_id", "eval_id")
      .agg(countDistinct("key").as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** q83: STREAMING heavy hitters — the t12 vocabulary counts as a
    * complete-mode streaming aggregation (state = one row per distinct
    * token: VOCABULARY-bounded, not stream-bounded — token counts are
    * the rare unbounded-stream aggregate whose state genuinely stays
    * small), with t12's shared top-k tail ranked over the completed
    * sink. Gated by t12's oracle verbatim; this pairing is the classic
    * two-pass alternative's streaming half — the CMS contract in
    * HeavyHittersSpec covers the case where even the vocabulary is
    * memory-bound. */
  def heavyHittersStream(spark: SparkSession, sfDir: String): DataFrame = {
    val counts = StreamRun.toCompletion(
      graft.operators.TextOps.heavyHitterCounts(docsStream(spark, sfDir)),
      "graft_stream_hh", outputMode = "complete")
    graft.operators.TextOps.heavyHittersTail(counts)
  }

  /** q89: the count-min sketch built ON the stream — q83's memory-bound
    * sibling. q83's complete-mode token counts hold VOCABULARY-sized
    * state; here the streaming aggregate's state is the ~100 KB sketch
    * itself, CONSTANT no matter how many distinct tokens the stream
    * ever carries — the shape that survives when even the vocabulary
    * is memory-bound (HeavyHittersSpec's premise, now a live surface).
    * Same builder aggregate as t14 (builtin `count_min_sketch`,
    * TypedImperativeAggregate state in the state store, complete
    * mode); the completed sink's one sketch row then serves t12's
    * candidates exactly like t14 — whose estimates it must REPRODUCE:
    * CMS construction is arrival-order-free (counter increments
    * commute), so stream == batch bit-for-bit (StreamCmsSpec).
    * Rows-only gate like t14 (estimates are sketch-internal). */
  def cmsStream(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.register(spark)
    val sketch = StreamRun.toCompletion(
      graft.operators.TextOps.tokensOf(docsStream(spark, sfDir))
        .agg(expr("count_min_sketch(tok, CAST(0.001 AS DOUBLE), " +
          "CAST(0.99 AS DOUBLE), 42)").as("sk")),
      "graft_stream_cms", outputMode = "complete")
    graft.operators.TextOps.heavyHitters(spark, sfDir)
      .crossJoin(broadcast(sketch)) // 1-row scalar attach
      .select(col("rk"), col("tok"), col("cnt"),
        expr("graft_cms_query(sk, tok)").as("est"))
  }

  /** q91: c13's document chunking on the stream — the ingest-time
    * shape for training-data prep: long documents become strided
    * windows AS THEY LAND, not in a nightly re-scan. Stateless
    * (projection + explode only: no state store, no watermark), so
    * the batch window algebra and its DuckDB oracle apply verbatim —
    * the gate proves the one shared [[graft.operators.CurationOps
    * .chunkFrame]] definition survives the streaming plumbing. */
  def chunkStream(spark: SparkSession, sfDir: String): DataFrame =
    StreamRun.toCompletion(
      graft.operators.CurationOps.chunkFrame(
        docsStream(spark, sfDir), width = 64, stride = 48),
      "graft_stream_chunk")

  /** q121: t18's model-table LANGUAGE ID as documents land — the first
    * filter of every multilingual ingest, run at ingest time instead
    * of a nightly re-scan. The stream half is t18's heavy half
    * verbatim (ONE definition, `TextOps.langGramScores`): gram
    * explode → 30-row broadcast model join → (doc, lang) integer
    * score agg in complete mode — per-doc state is ≤ |langs| rows
    * and, in the production watermarked-append form, evicted once a
    * doc's file is past the horizon; the finite-replay gate runs
    * complete mode like q56/q83. The (score desc, lang) argmax and
    * 'und' spine fallback are batch post-processing on the completed
    * sink (`TextOps.langIdFinish` — window functions can't run inside
    * a streaming agg; the q56/q64 pattern), so the result must equal
    * t18's batch answer EXACTLY — gated by t18's DuckDB oracle
    * verbatim. */
  def langIdStream(spark: SparkSession, sfDir: String): DataFrame = {
    val scores = StreamRun.toCompletion(
      graft.operators.TextOps.langGramScores(docsStream(spark, sfDir)),
      "graft_stream_langid", outputMode = "complete")
    graft.operators.TextOps.langIdFinish(
      graft.sources.Tables.load(spark, sfDir, "documents"), scores)
  }

  /** q151: t35's HTML/boilerplate extraction as documents land — the
    * markup-strip ingest stage every web-corpus pipeline runs FIRST,
    * at ingest time instead of a nightly re-scan. Stateless map (the
    * q55 class: no state store, no watermark, exactly-once per
    * micro-batch), the t35 regex chain VERBATIM (one definition,
    * `TextOps.htmlExtractOn`), gated by t35's batch oracle. */
  def htmlExtractStream(spark: SparkSession, sfDir: String): DataFrame =
    StreamRun.toCompletion(
      graft.operators.TextOps.htmlExtractOn(
        graft.operators.TextOps.htmlPlanted(docsStream(spark, sfDir))),
      "graft_stream_html")

  /** q152: INGEST-TIME TAKEDOWN — the q149 equality-delete keys
    * applied as documents land, via a stream-static LEFT ANTI join
    * (the takedown list is static by nature; the corpus streams):
    * stateless on the stream side, no state store — a taken-down
    * doc_id is dropped in the micro-batch it arrives in and can never
    * reach the sink. Gated by q149's batch oracle: ingest-time
    * filtering and read-time merge-on-read must agree exactly. */
  def takedownStream(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val keys = graft.sources.Tables.load(spark, sfDir, "documents")
      .filter(col("doc_id") %
        graft.sources.Deletes.TakedownMod === 0)
      .select("doc_id")
    StreamRun.toCompletion(
      docsStream(spark, sfDir).join(keys, Seq("doc_id"), "left_anti")
        .select("doc_id", "source", "lang", "n_chars"),
      "graft_stream_takedown")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q151_stream_html_extract" -> (htmlExtractStream _),
    "q152_stream_takedown" -> (takedownStream _),
    "q121_stream_langid" -> (langIdStream _),
    "q91_stream_chunking" -> (chunkStream _),
    "q55_stream_sample" -> (sampleStream _),
    "q56_stream_mix" -> (mixStream _),
    "q71_stream_decontam" -> ((s: SparkSession, d: String) => decontamStream(s, d)),
    "q83_stream_heavy_hitters" -> (heavyHittersStream _),
    // rows-only (no oracleSql entry): estimates are sketch-internal;
    // StreamCmsSpec pins stream == batch sketch estimates exactly
    "q89_stream_cms" -> (cmsStream _)
  )

  def oracleSql: Map[String, String] = Map(
    // the BATCH oracles verbatim: stateless filter / complete-mode agg
    // streams must equal their batch answers
    "q151_stream_html_extract" ->
      graft.operators.TextOps.oracleSql("t35_html_extract"),
    "q152_stream_takedown" ->
      graft.sources.Deletes.oracleSql("q149_takedown_read"),
    "q121_stream_langid" ->
      graft.operators.TextOps.oracleSql("t18_langid_model"),
    "q91_stream_chunking" ->
      graft.operators.CurationOps.oracleSql("c13_chunking"),
    "q55_stream_sample" -> graft.operators.CurationOps.stratOracle,
    "q56_stream_mix" ->
      graft.operators.CurationOps.oracleSql("c08_mix_report"),
    "q71_stream_decontam" ->
      graft.operators.CurationOps.oracleSql("c04_decontaminate"),
    "q83_stream_heavy_hitters" ->
      graft.operators.TextOps.oracleSql("t12_heavy_hitters")
  )
}
