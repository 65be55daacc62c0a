package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Full-text relevance search over the document corpus: BM25 top-k —
  * the retrieval primitive behind corpus exploration, quality-probe
  * queries, and RAG-style "which training docs match this prompt"
  * audits.
  *
  * Scale shape (the part that matters at 100 TB): the per-document
  * length dl rides a narrow map (`size(split(...))` — no explode), and
  * the token stream is restricted to the QUERY VOCABULARY with an
  * array `filter(...)` BEFORE the explode, so the generate fan-out and
  * the term-frequency aggregation carry |terms| rows per doc at most —
  * not the corpus's token count. Document frequencies for the handful
  * of query terms are a tiny aggregate that broadcasts back onto the
  * per-doc scores; the only wide operations key on doc_id. (A serving
  * system would precompute the inverted index; this is the scan-side
  * form that builds it on the fly.)
  */
object SearchOps {

  val K1 = 1.2
  val B = 0.75

  /** t10: BM25 top-k documents for a fixed 3-term query. Scores are
    * rounded to 3 decimals before ranking so the (score desc, doc_id)
    * tie-break is identical across engines — the same float-oracle
    * discipline as t07's TF-IDF. Three decimals (not four) keeps the
    * rounding boundaries ~5e-4 away from the ~1e-12 jitter that
    * nondeterministic double-accumulation order (sum(s), avgdl
    * partials) can introduce; a score landing exactly on a boundary
    * could still round differently per engine and flip the exact-
    * compared rk — the same accepted residual-risk class as t07's
    * float oracle, now two orders of magnitude less likely. */
  def bm25TopK(
      spark: SparkSession, sfDir: String,
      terms: Seq[String] = Seq("vector", "stream", "merge"),
      k: Int = 20): DataFrame =
    bm25TopKOn(Tables.load(spark, sfDir, "documents"),
      Tables.rowCount(spark, sfDir, "documents"), terms, k)

  /** [[bm25TopK]] over any (doc_id, text) frame with a known row count —
    * fixture-injectable (the CurationOps `*On` pattern). */
  def bm25TopKOn(
      docsDf: DataFrame, corpusRows: Long,
      terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty, "bm25TopK needs at least one query term")
    val n = corpusRows.toDouble

    // dl without exploding; query-term hits via array filter BEFORE the
    // explode — the generate emits ≤ |terms| distinct values per doc.
    // Column-API lambda (no SQL-string term interpolation: quoted or
    // otherwise hostile terms stay plain data). Barrier: base feeds
    // avgdl AND tf — without it the text column is tokenized and
    // scanned once per consumer (PlanAudit showed 3 scans)
    val base = Persists.barrier(docsDf.select(col("doc_id"),
      split(col("text"), " ").as("toks"))
      .select(col("doc_id"),
        size(col("toks")).cast("double").as("dl"),
        filter(col("toks"), t => t.isInCollection(terms)).as("hits")))
    val avgdl = base.agg(avg("dl").as("avgdl"))
    val tf = base.select(col("doc_id"), col("dl"),
        explode(col("hits")).as("term"))
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).cast("double").as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).cast("double").as("df"))

    val scored = tf.join(broadcast(dfreq), "term").crossJoin(broadcast(avgdl))
      .select(col("doc_id"),
        (log(lit(1.0) + (lit(n) - col("df") + 0.5) / (col("df") + 0.5)) *
          (col("tf") * (K1 + 1)) /
          (col("tf") + lit(K1) * (lit(1 - B) + lit(B) * col("dl") / col("avgdl"))))
          .as("s"))
      .groupBy("doc_id").agg(round(sum("s"), 3).as("score"))
    Ranks.topKRanked(scored, k, col("score").desc, col("doc_id"))
      .select(col("doc_id"), col("rk"), col("score"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t10_bm25" -> ((s: SparkSession, d: String) => bm25TopK(s, d))
  )

  def oracleSql: Map[String, String] = Map(
    "t10_bm25" ->
      s"""WITH base AS (
            SELECT doc_id,
                   CAST(len(string_split(text, ' ')) AS DOUBLE) AS dl,
                   list_filter(string_split(text, ' '),
                               t -> t IN ('vector', 'stream', 'merge')) AS hits
            FROM documents),
          n AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                       avg(dl) AS avgdl FROM base),
          tf AS (SELECT doc_id, dl, unnest(hits) AS term FROM base),
          tfc AS (SELECT doc_id, dl, term,
                         CAST(count(*) AS DOUBLE) AS tf
                  FROM tf GROUP BY 1, 2, 3),
          dfreq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df
                    FROM tfc GROUP BY 1),
          scored AS (
            SELECT tfc.doc_id,
                   ln(1.0 + (n.n - dfreq.df + 0.5) / (dfreq.df + 0.5)) *
                     (tfc.tf * (${K1} + 1)) /
                     (tfc.tf + ${K1} * (1 - ${B} + ${B} * tfc.dl / n.avgdl))
                     AS s
            FROM tfc JOIN dfreq ON tfc.term = dfreq.term CROSS JOIN n),
          agg AS (SELECT doc_id, round(sum(s), 3) AS score
                  FROM scored GROUP BY 1),
          ranked AS (
            SELECT doc_id,
                   CAST(row_number() OVER (ORDER BY score DESC, doc_id)
                        AS INTEGER) AS rk,
                   score
            FROM agg)
        SELECT doc_id, rk, score FROM ranked WHERE rk <= 20"""
  )
}
