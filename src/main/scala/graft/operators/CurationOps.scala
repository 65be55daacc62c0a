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
    * first-k arrival order). One shuffle on source + in-partition sort.
    * Skew note: a mega-source sorts its whole partition to rank k — at
    * extreme skew, pre-thin with a per-input-partition local top-k
    * before the window (same technique as SkewOps salting); the testdata
    * sources are balanced so the plain window is the right plan here. */
  def sourceQuota(
      spark: SparkSession, sfDir: String, k: Int = 50): DataFrame = {
    val w = Window.partitionBy("source")
      .orderBy(md5(col("text")), col("doc_id"))
    docs(spark, sfDir)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("doc_id"), col("source"), col("rk"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c01_hash_split" -> (hashSplit _),
    "c02_source_quota" -> ((s: SparkSession, d: String) => sourceQuota(s, d))
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
         WHERE rk <= 50"""
  )
}
