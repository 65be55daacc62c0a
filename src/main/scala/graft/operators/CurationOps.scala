package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Dataset-curation operators for training-data pipelines: reproducible
  * splits and per-source quotas — the selection steps that sit between
  * dedup/quality-scoring and the final training mix.
  *
  * Both are hash-deterministic (md5 of content, not rand()), so a
  * 100 TB re-run — or a different engine — selects the SAME rows: the
  * property that makes held-out splits trustworthy, and what makes the
  * DuckDB oracles exact. */
object CurationOps {

  private def docs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "documents")

  /** Deterministic content-hash split: keep documents whose md5(text)
    * leads with hex digit 0 or 1 (2/16 = 12.5% expected). One narrow
    * codegen'd filter — no shuffle, no state, reproducible across
    * engines/runs/partitionings; the complement is the training side.
    * (Splitting on CONTENT hash also keeps exact duplicates on one side
    * of the split — id- or rand()-based splits leak them across.) */
  def hashSplit(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .filter(substring(md5(col("text")), 1, 1).isin("0", "1"))
      .select("doc_id", "lang", "source", "n_chars")

  /** Per-source quota: keep at most `k` documents per source, chosen by
    * content-hash rank (a reproducible uniform subsample per source, not
    * first-k arrival order).
    *
    * TWO-PHASE for skew safety: phase 1 ranks within (source,
    * input-partition) — the partition id acts as a deterministic salt,
    * so a mega-source's rows are thinned in parallel across whatever
    * partitions hold them and at most k·P rows per source survive;
    * phase 2 ranks the thinned set on source alone, now bounded. The
    * global top-k by a per-row score equals the top-k of the union of
    * per-partition top-ks, so the result is IDENTICAL to the one-window
    * form — which is exactly what the plain-SQL DuckDB oracle asserts. */
  def sourceQuota(
      spark: SparkSession, sfDir: String, k: Int = 50): DataFrame =
    sourceQuotaOn(docs(spark, sfDir), k)

  /** [[sourceQuota]] over any (doc_id, text, source) frame —
    * fixture-injectable; [[quotaCandidates]] is its phase-1 output.
    *
    * The text column is hashed ONCE and dropped before the first
    * exchange (the d01 exact-dedup pattern: a fixed 16-byte shuffle key
    * instead of the full document), so neither window shuffles document
    * bodies. `asc_nulls_last` pins NULL ordering to DuckDB's ASC
    * default — Spark's is NULLS FIRST, which would diverge on a NULL
    * text. */
  def sourceQuotaOn(d: DataFrame, k: Int): DataFrame = {
    val w2 = Window.partitionBy("source")
      .orderBy(col("h").asc_nulls_last, col("doc_id"))
    quotaCandidates(d, k)
      .withColumn("rk", row_number().over(w2))
      .filter(col("rk") <= k)
      .select(col("doc_id"), col("source"), col("rk"))
  }

  /** Phase 1: local top-k per (source, input partition) — ≤ k·P rows
    * per source reach the global ranking, each as (doc_id, source, h). */
  private[operators] def quotaCandidates(d: DataFrame, k: Int): DataFrame = {
    val w1 = Window.partitionBy("source", "pid")
      .orderBy(col("h").asc_nulls_last, col("doc_id"))
    d.select(col("doc_id"), col("source"), md5(col("text")).as("h"),
        spark_partition_id().as("pid"))
      .withColumn("lrk", row_number().over(w1))
      .filter(col("lrk") <= k)
      .drop("lrk", "pid")
  }

  /** The COMPOSED curation pipeline in one query — the order a real
    * pipeline runs its selection stages: near-dup cluster resolution
    * (drop every losing cluster member), a deterministic 50%
    * content-hash split, then the per-source quota on the survivors.
    * Each stage is the already-oracled operator; the composition is
    * hash-checked end-to-end against one DuckDB query, so stage
    * interfaces can't drift either. */
  def pipeline(spark: SparkSession, sfDir: String, k: Int = 20): DataFrame = {
    val survivors = docs(spark, sfDir)
      .join(DedupOps.clusterLosers(spark, sfDir), Seq("doc_id"), "left_anti")
      .filter(substring(md5(col("text")), 1, 1)
        .isin("0", "1", "2", "3", "4", "5", "6", "7"))
    sourceQuotaOn(survivors, k)
  }

  /** Decontamination: flag TRAINING documents that share ≥ `minShared`
    * distinct `shingleK`-word shingles with any EVAL document — the
    * benchmark-leakage check every pretraining pipeline runs before
    * training. Output: (train_id, eval_id, n_shared) per contaminated
    * pair.
    *
    * Scale shape: both sides explode to (shingle, doc) rows and meet on
    * the shingle key. The EVAL side is small by nature (benchmarks are
    * thousands of docs, the corpus is billions), so it broadcasts —
    * per-key work is train-key-frequency × eval-key-frequency, linear
    * in the corpus even for boilerplate shingles because the eval
    * factor is bounded. */
  def decontaminate(
      spark: SparkSession, sfDir: String,
      evalSource: String = "src0", shingleK: Int = 8,
      minShared: Int = 1): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val d = docs(spark, sfDir).select(col("doc_id"), col("source"),
      Shingles.wordShingles("text", shingleK).as("sh"))
    val evalSh = d.filter(col("source") === evalSource)
      .select(col("doc_id").as("eval_id"), explode(col("sh")).as("key"))
    val trainSh = d.filter(col("source") =!= evalSource)
      .select(col("doc_id").as("train_id"), explode(col("sh")).as("key"))
    trainSh.join(broadcast(evalSh), "key")
      .groupBy("train_id", "eval_id")
      .agg(countDistinct("key").as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c01_hash_split" -> (hashSplit _),
    "c02_source_quota" -> ((s: SparkSession, d: String) => sourceQuota(s, d)),
    "c03_pipeline" -> ((s: SparkSession, d: String) => pipeline(s, d)),
    "c04_decontaminate" -> ((s: SparkSession, d: String) => decontaminate(s, d))
  )

  /** Both engines compute the same lowercase-hex md5, so the selections
    * are byte-identical; rk is CAST to INTEGER (Spark row_number is
    * int32, DuckDB int64). */
  def oracleSql: Map[String, String] = Map(
    "c01_hash_split" ->
      """SELECT doc_id, lang, source, n_chars FROM documents
         WHERE substr(md5(text), 1, 1) IN ('0', '1')""",
    "c02_source_quota" ->
      """SELECT doc_id, source, rk FROM (
           SELECT doc_id, source,
                  CAST(row_number() OVER (PARTITION BY source
                         ORDER BY md5(text), doc_id) AS INTEGER) AS rk
           FROM documents)
         WHERE rk <= 50""",
    "c03_pipeline" ->
      s"""WITH RECURSIVE ${DedupOps.clusterCtes},
          comp AS (SELECT v, min(lbl) AS lbl FROM cc GROUP BY v),
          survivors AS (
            SELECT doc_id, text, source FROM documents
            WHERE doc_id NOT IN (SELECT v FROM comp WHERE v <> lbl)
              AND substr(md5(text), 1, 1) IN
                  ('0','1','2','3','4','5','6','7')),
          ranked AS (
            SELECT doc_id, source,
                   CAST(row_number() OVER (PARTITION BY source
                          ORDER BY md5(text), doc_id) AS INTEGER) AS rk
            FROM survivors)
        SELECT doc_id, source, rk FROM ranked WHERE rk <= 20""",
    // the shingle CTE is the WordShingles contract: sliding distinct
    // 8-word windows, whole text when shorter (see d04's oracle)
    "c04_decontaminate" ->
      """WITH d AS (
           SELECT doc_id, source,
                  CASE WHEN len(string_split(text, ' ')) < 8 THEN [text]
                       ELSE list_distinct(list_transform(
                              range(1, len(string_split(text, ' ')) - 6),
                              i -> array_to_string(
                                     string_split(text, ' ')[i:i+7], ' ')))
                  END AS shl
           FROM documents),
         e AS (SELECT doc_id AS eval_id, unnest(shl) AS key FROM d
               WHERE source = 'src0'),
         t AS (SELECT doc_id AS train_id, unnest(shl) AS key FROM d
               WHERE source <> 'src0')
       SELECT train_id, eval_id, count(DISTINCT key) AS n_shared
       FROM t JOIN e USING (key)
       GROUP BY 1, 2 HAVING count(DISTINCT key) >= 1"""
  )
}
