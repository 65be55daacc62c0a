package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Tokenizer-training primitives: the corpus-wide statistics a BPE /
  * subword tokenizer build pass computes over the training data —
  * the step between curation and tokenization in an LLM data pipeline.
  */
object TokenizerOps {

  /** t11: the first BPE merge iteration — corpus-wide counts of
    * adjacent character pairs within words, top-k by frequency. Real
    * BPE training repeats this count-and-merge loop; iteration one is
    * the pure-data-engine part (the loop carries a driver-side
    * vocabulary, the COUNT is the distributed work and its shape never
    * changes across iterations: explode word → adjacent pairs, one
    * map-side-combinable aggregation on a bounded key space — pair
    * cardinality ≤ alphabet², no hot single key, no window until the
    * tiny top-k). */
  def bpePairCounts(
      spark: SparkSession, sfDir: String, k: Int = 20): DataFrame = {
    val pairs = Tables.load(spark, sfDir, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
        .as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("cnt"))
    Ranks.topKRanked(pairs, k, col("cnt").desc, col("pair"))
      .select(col("rk"), col("pair"), col("cnt"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t11_bpe_pairs" -> ((s: SparkSession, d: String) => bpePairCounts(s, d))
  )

  def oracleSql: Map[String, String] = Map(
    "t11_bpe_pairs" ->
      """WITH w AS (SELECT unnest(string_split(text, ' ')) AS w
                    FROM documents),
          pairs AS (
            SELECT unnest(list_transform(generate_series(1, len(w) - 1),
                                         i -> substr(w, i, 2))) AS pair
            FROM w WHERE len(w) >= 2),
          cnts AS (SELECT pair, count(*) AS cnt FROM pairs GROUP BY 1),
          ranked AS (
            SELECT CAST(row_number() OVER (ORDER BY cnt DESC, pair)
                        AS INTEGER) AS rk, pair, cnt
            FROM cnts)
        SELECT rk, pair, cnt FROM ranked WHERE rk <= 20"""
  )
}
