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
    graft.functions.GraftFunctions.register(spark)
    val pairs = Tables.load(spark, sfDir, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .select(explode(expr("graft_char_grams(w, 2)")).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("cnt"))
    Ranks.topKRanked(pairs, k, col("cnt").desc, col("pair"))
      .select(col("rk"), col("pair"), col("cnt"))
  }

  /** Fixed merge count for the gated multi-merge loop (t19). */
  val BpeMerges = 5

  /** t19: BPE TRAINING run `merges` rounds as a gated operator — t11's
    * count-the-pairs step closed into the real count→argmax→merge loop
    * (Sennrich et al., ACL 2016). State is the VOCABULARY's symbol
    * sequences weighted by word frequency — (word, wcnt, pos, sym) —
    * never the corpus: after the one corpus-wide word count, every
    * round's cost is vocabulary-sized and FLAT across rounds. Per
    * round: adjacent-pair counts (co-partitioned self-join on word,
    * one bounded-key agg), the argmax pair with the
    * (cnt desc, s1, s2) tie-break (1-row broadcast), then the merge
    * applied with LEFTMOST-NON-OVERLAPPING semantics spelled as
    * gaps-and-islands SQL — consecutive candidate positions form an
    * island, the odd-ranked ones apply (exactly greedy left-to-right
    * for same-pair chains like "a a a"), consumed successors drop,
    * positions renumber. Both engines run the identical relational
    * algebra — no string `replace`, whose resume-after-replacement
    * semantics differ subtly across engines. Output: one row per
    * round, (merge_round, s1, s2, cnt) — the trained merge list. */
  def bpeTrain(
      spark: SparkSession, sfDir: String,
      merges: Int = BpeMerges): DataFrame =
    bpeTrainOn(Tables.load(spark, sfDir, "documents"), merges)

  /** [[bpeTrain]] over any frame with a `text` column. */
  private[graft] def bpeTrainOn(d: DataFrame, merges: Int): DataFrame =
    bpeLoop(d, merges)._1

  /** The count→argmax→merge loop, returning BOTH the merge log and
    * the final per-word symbol table — one definition shared by t19
    * (the log) and t20 (the encode). */
  private def bpeLoop(d: DataFrame, merges: Int): (DataFrame, DataFrame) = {
    require(merges >= 1, s"bpeTrain needs merges >= 1, got $merges")
    graft.functions.GraftFunctions.register(d.sparkSession)
    val W = org.apache.spark.sql.expressions.Window
    val words = d.select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("wcnt"))
    // localCheckpoint, not persist: round r's plan references round
    // r-1's syms FIVE times (pair self-join, merge rebuild's three
    // joins), so the un-truncated LOGICAL plan grows ~5^r and the
    // analyzer's DeduplicateRelations goes quadratic on it (observed:
    // analysis alone ran minutes at merges=5). Checkpointing cuts the
    // lineage each round — the g12 star-contraction discipline.
    var syms = words.select(col("word"), col("wcnt"),
      posexplode(expr("graft_char_grams(word, 1)"))
        .as(Seq("p0", "sym")))
      .select(col("word"), col("wcnt"), (col("p0") + 1).as("pos"),
        col("sym"))
      .localCheckpoint(false)
    var out: DataFrame = null
    for (r <- 1 to merges) {
      val adj = Persists.barrier(syms.as("a").join(syms.as("b"),
          col("a.word") === col("b.word") &&
            col("b.pos") === col("a.pos") + 1)
        .select(col("a.word").as("word"), col("a.wcnt").as("wcnt"),
          col("a.pos").as("pos"), col("a.sym").as("s1"),
          col("b.sym").as("s2")))
      val top = Persists.barrier(adj.groupBy("s1", "s2")
        .agg(sum("wcnt").as("cnt"))
        .orderBy(col("cnt").desc, col("s1"), col("s2")).limit(1))
      val cand = adj.join(broadcast(top.select("s1", "s2")), Seq("s1", "s2"))
        .select("word", "pos")
      val applied = Persists.barrier(cand
        .withColumn("g", col("pos") -
          row_number().over(W.partitionBy("word").orderBy("pos")))
        .withColumn("rn",
          row_number().over(W.partitionBy("word", "g").orderBy("pos")))
        .filter(col("rn") % 2 === 1).select("word", "pos"))
      syms = syms.as("s")
        .join(applied.as("ap"), col("s.word") === col("ap.word") &&
          col("s.pos") === col("ap.pos"), "left")
        .join(applied.as("dp"), col("s.word") === col("dp.word") &&
          col("s.pos") === col("dp.pos") + 1, "left")
        .join(syms.as("n"), col("s.word") === col("n.word") &&
          col("n.pos") === col("s.pos") + 1, "left")
        .filter(col("dp.pos").isNull)
        .select(col("s.word").as("word"), col("s.wcnt").as("wcnt"),
          col("s.pos").as("opos"),
          when(col("ap.pos").isNotNull,
            concat(col("s.sym"), col("n.sym")))
            .otherwise(col("s.sym")).as("sym"))
        .withColumn("pos",
          row_number().over(W.partitionBy("word").orderBy("opos")))
        .select("word", "wcnt", "pos", "sym")
        .localCheckpoint(false)
      val row = top.select(lit(r).as("merge_round"), col("s1"),
        col("s2"), col("cnt"))
      out = if (out == null) row else out.unionByName(row)
    }
    (out, syms)
  }

  /** t20: ENCODE the corpus with the trained merges — the apply step
    * that closes t19's train loop (train once on the vocabulary,
    * tokenize everything). The final per-word symbol table from the
    * SAME loop tokenizes each distinct word once; the corpus is then
    * one word-explode joined against that vocabulary-sized table.
    * Output per doc: (doc_id, n_words, n_chars = pre-merge character
    * tokens, n_tokens_bpe = symbols under the trained vocab) — the
    * compression accounting a tokenizer owner reads (bpe < chars by
    * exactly the merge applications landing in that doc's words).
    * Integer-only, hash-anchored; the oracle reuses t19's unrolled
    * CTEs and reads the final symbol table instead of the tops. */
  def bpeEncode(
      spark: SparkSession, sfDir: String,
      merges: Int = BpeMerges): DataFrame =
    bpeEncodeOn(Tables.load(spark, sfDir, "documents"), merges)

  /** [[bpeEncode]] over any (doc_id, text) frame. */
  private[graft] def bpeEncodeOn(d: DataFrame, merges: Int): DataFrame = {
    val syms = bpeLoop(d, merges)._2
    val wordTok = syms.groupBy("word").agg(count(lit(1)).as("n_sym"))
    d.select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .join(wordTok, "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(length(col("word"))).as("n_chars"),
        sum("n_sym").as("n_tokens_bpe"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t11_bpe_pairs" -> ((s: SparkSession, d: String) => bpePairCounts(s, d)),
    "t19_bpe_merges" -> ((s: SparkSession, d: String) => bpeTrain(s, d)),
    "t20_bpe_encode" -> ((s: SparkSession, d: String) => bpeEncode(s, d))
  )

  /** t19's DuckDB twin: the count→argmax→merge loop unrolled
    * [[BpeMerges]] times — identical relational algebra per round
    * (adjacent self-join, (cnt DESC, s1, s2) LIMIT 1, island-parity
    * merge application, renumber); every re-read CTE MATERIALIZED
    * (the g16 lesson — s_r feeds the next round three times). */
  /** The shared WITH-body of the t19/t20 oracles: word counts, the
    * initial symbol table, and the [[BpeMerges]] unrolled rounds. */
  private def bpeCtes: String = {
    val rounds = (1 to BpeMerges).map { r =>
      val p = r - 1
      s"""adj$r AS MATERIALIZED (
           SELECT a.word, a.wcnt, a.pos, a.sym AS s1, b.sym AS s2
           FROM s$p a JOIN s$p b
             ON a.word = b.word AND b.pos = a.pos + 1),
         top$r AS MATERIALIZED (
           SELECT s1, s2, sum(wcnt) AS cnt FROM adj$r
           GROUP BY s1, s2 ORDER BY cnt DESC, s1, s2 LIMIT 1),
         cand$r AS (
           SELECT a.word, a.pos FROM adj$r a
           JOIN top$r t ON a.s1 = t.s1 AND a.s2 = t.s2),
         app$r AS MATERIALIZED (
           SELECT word, pos FROM (
             SELECT word, pos, row_number() OVER
               (PARTITION BY word, g ORDER BY pos) AS rn
             FROM (SELECT word, pos, pos - row_number() OVER
                     (PARTITION BY word ORDER BY pos) AS g
                   FROM cand$r))
           WHERE rn % 2 = 1),
         s$r AS MATERIALIZED (
           SELECT word, wcnt,
                  CAST(row_number() OVER
                    (PARTITION BY word ORDER BY opos) AS INTEGER) AS pos,
                  sym
           FROM (
             SELECT s.word, s.wcnt, s.pos AS opos,
                    CASE WHEN ap.pos IS NOT NULL THEN s.sym || n.sym
                         ELSE s.sym END AS sym
             FROM s$p s
             LEFT JOIN app$r ap
               ON ap.word = s.word AND ap.pos = s.pos
             LEFT JOIN app$r dp
               ON dp.word = s.word AND dp.pos = s.pos - 1
             LEFT JOIN s$p n
               ON n.word = s.word AND n.pos = s.pos + 1
             WHERE dp.pos IS NULL))"""
    }.mkString(",\n")
    s"""words AS MATERIALIZED (
         SELECT w AS word, count(*) AS wcnt
         FROM (SELECT unnest(string_split(text, ' ')) AS w
               FROM documents)
         WHERE w <> '' GROUP BY w),
       s0 AS MATERIALIZED (
         SELECT word, wcnt, CAST(u.i AS INTEGER) AS pos,
                substring(word, u.i, 1) AS sym
         FROM words, unnest(generate_series(1, length(word))) AS u(i)),
       $rounds"""
  }

  private val bpeTrainOracle: String = {
    val unions = (1 to BpeMerges).map(r =>
      s"""SELECT $r AS merge_round, s1, s2,
            CAST(cnt AS BIGINT) AS cnt FROM top$r""")
      .mkString("\n UNION ALL ")
    s"WITH $bpeCtes\n $unions"
  }

  /** t20's twin: the t19 CTEs, read at the FINAL symbol table. */
  private val bpeEncodeOracle: String =
    s"""WITH $bpeCtes,
       wt AS (SELECT word, count(*) AS n_sym
              FROM s$BpeMerges GROUP BY word),
       dw AS (SELECT doc_id, w AS word FROM (
                SELECT doc_id, unnest(string_split(text, ' ')) AS w
                FROM documents)
              WHERE w <> '')
     SELECT doc_id, count(*) AS n_words,
            CAST(sum(length(word)) AS BIGINT) AS n_chars,
            CAST(sum(n_sym) AS BIGINT) AS n_tokens_bpe
     FROM dw JOIN wt USING (word)
     GROUP BY doc_id"""

  def oracleSql: Map[String, String] = Map(
    "t19_bpe_merges" -> bpeTrainOracle,
    "t20_bpe_encode" -> bpeEncodeOracle,
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
