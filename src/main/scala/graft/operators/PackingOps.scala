package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Sequence packing for training-data pipelines: assign documents to
  * fixed-token-budget training chunks ("pack until the budget is
  * crossed, then start the next chunk") — the step that turns a curated
  * corpus into context-window-sized examples. Deterministic: documents
  * are packed per source in doc_id order, so a re-run — or another
  * engine — builds the SAME chunks, which is what makes training-data
  * manifests reproducible and the DuckDB oracle exact.
  *
  * Scale shape: packing is inherently sequential WITHIN a pack stream,
  * so the parallel unit is the stream, not the row — one window
  * partition per source (at 100 TB: per source × date-shard, thousands
  * of streams). Token counts ride a narrow codegen'd map; the single
  * window does one shuffle on the stream key and a running sum per
  * partition. No driver-side loop, no collect.
  *
  * Chunking rule — FIXED TOKEN-OFFSET buckets, not greedy-reset: a
  * document's chunk is `floor(preceding_token_total / budget)`, i.e.
  * the budget-sized slot its stream offset falls in. A document that
  * crosses a slot line still belongs to the slot it started in, and a
  * document longer than the whole budget spans slots by offset (so
  * chunk ids can skip after it). This differs from the greedy-reset
  * rule (restart the count at zero after every overflow): greedy-reset
  * makes each boundary depend on the previous boundary — an inherently
  * sequential recurrence that neither a window function nor plain SQL
  * expresses, while the offset rule is one running sum, keeps chunks
  * within ±1 document of the same fill, and stays exactly
  * oracle-checkable. The [[PackingOpsSpec]] fixture pins these
  * semantics (including the skipped-id case).
  */
object PackingOps {

  /** c09: per-document chunk assignment over `documents` — which
    * training chunk each document lands in, its token count, and its
    * token offset within the source's stream. */
  def packSequences(
      spark: SparkSession, sfDir: String, budget: Int = 2048): DataFrame =
    packSequencesOn(
      Tables.load(spark, sfDir, "documents")
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("tokens")),
      budget)

  /** [[packSequences]] over any (doc_id, source, tokens) frame —
    * fixture-injectable (the CurationOps `*On` pattern).
    *
    * `streamCols` is the pack-stream key — the unit of sequential
    * packing AND of parallelism. The default (source) matches the
    * oracle's gate-corpus semantics; a 100 TB run passes source plus a
    * shard column (e.g. a date or a doc_id div N) so the window has
    * thousands of independent partitions instead of one per source. */
  def packSequencesOn(
      d: DataFrame, budget: Int,
      streamCols: Seq[String] = Seq("source")): DataFrame = {
    require(streamCols.nonEmpty, "packing needs at least one stream column")
    val w = Window.partitionBy(streamCols.map(col): _*).orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    // the FULL stream key stays in the output — chunk ids are only
    // unique within one stream, so dropping a key column would alias
    // chunks from different shards into one over-budget chunk
    d.withColumn("tok_before", coalesce(sum("tokens").over(w), lit(0L)))
      .select(col("doc_id") +: streamCols.map(col) :+ col("tokens") :+
        col("tok_before") :+
        floor(col("tok_before") / budget.toLong).as("chunk"): _*)
  }

  /** c10: the full selection-to-training-chunks pipeline — c03's
    * curation stages (near-dup cluster resolution → 50% content-hash
    * split → per-source quota) feeding the packer, under ONE DuckDB
    * oracle, so the curation/packing interface can't drift. The packer
    * sees only quota survivors; budget 512 makes multi-doc chunks at
    * the gate corpus. */
  def pipelinePack(
      spark: SparkSession, sfDir: String,
      k: Int = 10, budget: Int = 512): DataFrame = {
    val kept = CurationOps.pipeline(spark, sfDir, k)
      .select(col("doc_id"), col("source"))
    val toks = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("tokens"))
    packSequencesOn(kept.join(toks, "doc_id"), budget)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c09_pack_sequences" -> ((s: SparkSession, d: String) => packSequences(s, d)),
    "c10_pipeline_pack" -> ((s: SparkSession, d: String) => pipelinePack(s, d))
  )

  def oracleSql: Map[String, String] = Map(
    "c09_pack_sequences" ->
      """WITH t AS (
           SELECT doc_id, source,
                  CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
           FROM documents),
         c AS (
           SELECT doc_id, source, tokens,
                  COALESCE(CAST(sum(tokens) OVER (
                    PARTITION BY source ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    AS BIGINT), 0) AS tok_before
           FROM t)
       SELECT doc_id, source, tokens, tok_before,
              CAST(floor(tok_before / 2048) AS BIGINT) AS chunk
       FROM c""",
    "c10_pipeline_pack" ->
      s"""WITH RECURSIVE ${DedupOps.clusterCtes},
          comp AS (SELECT v, min(lbl) AS lbl FROM cc GROUP BY v),
          survivors AS (
            SELECT doc_id, text, source FROM documents
            WHERE doc_id NOT IN (SELECT v FROM comp WHERE v <> lbl)
              AND substr(md5(text), 1, 1) IN
                  ('0','1','2','3','4','5','6','7')),
          ranked AS (
            SELECT doc_id, source,
                   row_number() OVER (PARTITION BY source
                          ORDER BY md5(text), doc_id) AS rk
            FROM survivors),
          t AS (
            SELECT r.doc_id, r.source,
                   CAST(len(string_split(d.text, ' ')) AS BIGINT) AS tokens
            FROM ranked r JOIN documents d ON r.doc_id = d.doc_id
            WHERE r.rk <= 10),
          c AS (
            SELECT doc_id, source, tokens,
                   COALESCE(CAST(sum(tokens) OVER (
                     PARTITION BY source ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                     AS BIGINT), 0) AS tok_before
            FROM t)
        SELECT doc_id, source, tokens, tok_before,
               CAST(floor(tok_before / 512) AS BIGINT) AS chunk
        FROM c"""
  )
}
