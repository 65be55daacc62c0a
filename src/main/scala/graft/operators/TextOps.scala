package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Text-analysis operators for a large-scale training-data pipeline:
  * quality scoring, token counting, fingerprinting, language-ID.
  *
  * Everything here is built from codegen'd Catalyst functions (split /
  * higher-order array functions / hash functions) — no UDFs — so at
  * 100 TB each operator is a single narrow map stage over the documents
  * table: no shuffle, no driver round-trips, whole-stage codegen keeps
  * it in one generated loop per partition.
  */
object TextOps {

  private val stopwords =
    Seq("the", "a", "of", "to", "and", "in", "is", "on", "for", "with")

  /** whitespace tokens; documents.text is single-space-joined words */
  private def toks(c: Column): Column = split(c, " ")

  /** The exploded token stream over any frame with a `text` column —
    * ONE definition shared by the exact vocabulary aggregate, the
    * batch sketch builders (t14/t15), and the streaming sketch (q89),
    * so every token-consuming surface sees the identical tokenizer. */
  def tokensOf(d: DataFrame): DataFrame =
    d.select(explode(toks(col("text"))).as("tok"))

  def docs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "documents")

  // ---------------------------------------------------------------- quality
  /** Per-document quality stats: char/word counts, average word length,
    * stopword ratio — the usual "keep or drop" features for corpus
    * filtering. */
  def qualityStats(spark: SparkSession, sfDir: String): DataFrame =
    qualityStatsOn(docs(spark, sfDir))

  /** [[qualityStats]] over any (doc_id, text) frame. */
  private[graft] def qualityStatsOn(d: DataFrame): DataFrame = {
    val inList = stopwords.map(s => s"'$s'").mkString(", ")
    d.select(
      col("doc_id"),
      length(col("text")).as("chars"),
      size(toks(col("text"))).as("words"),
      round(length(regexp_replace(col("text"), " ", "")).cast("double") /
        size(toks(col("text"))), 4).as("avg_word_len"),
      round(expr(
        s"size(filter(split(text, ' '), w -> w IN ($inList)))").cast("double") /
        size(toks(col("text"))), 4).as("stopword_ratio"))
  }

  val qualityOracle: String = {
    val ors = stopwords.map(s => s"w = '$s'").mkString(" OR ")
    s"""SELECT doc_id, CAST(length(text) AS INTEGER) AS chars,
               CAST(len(string_split(text, ' ')) AS INTEGER) AS words,
               round(CAST(length(replace(text, ' ', '')) AS DOUBLE) /
                     len(string_split(text, ' ')), 4) AS avg_word_len,
               round(CAST(len(list_filter(string_split(text, ' '),
                                          w -> $ors)) AS DOUBLE) /
                     len(string_split(text, ' ')), 4) AS stopword_ratio
        FROM documents"""
  }

  // ----------------------------------------------------------------- tokens
  /** Token counting: total + distinct tokens per document (BPE-ish regex
    * variant of tokenization is the rows-only query below). */
  def tokenCounts(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir).select(
      col("doc_id"),
      size(toks(col("text"))).as("n_tokens"),
      size(array_distinct(toks(col("text")))).as("n_distinct"))

  val tokenOracle: String =
    """SELECT doc_id,
              CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
              CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER)
                AS n_distinct
       FROM documents"""

  /** BPE-ish subword count: tokens further split into ≤4-char chunks via a
    * regex — a stand-in for a real BPE vocab (engine-side shape is
    * identical: one generator expression, no state). Rows-only check. */
  def subwordCounts(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir).select(
      col("doc_id"),
      size(expr("""flatten(transform(split(text, ' '),
                     w -> regexp_extract_all(w, '.{1,4}', 0)))""")).as("n_subwords"))

  // ------------------------------------------------------------ fingerprint
  /** Content fingerprint via md5 — exact-dup key; identical function on
    * both engines so it doubles as an oracle-checked query. */
  def fingerprintMd5Sql: String =
    "SELECT doc_id, md5(text) AS fp FROM documents"

  /** Rolling 64-bit fingerprint over word 4-grams (Rabin-style document
    * sketch): min/max/xor of shingle hashes. xxhash64 is Spark-native and
    * deterministic; rows-only check. */
  /** Rolling 4-word-shingle fingerprints (min / max / xor over the
    * shingle-hash set — winnowing's building blocks). Hash is
    * [[PortableHash]] (md5-derived) rather than xxhash64 so the whole
    * operator oracle-checks against DuckDB; the fingerprint semantics
    * (content-derived, order-insensitive xor, min-sketch min) are
    * unchanged. */
  def fingerprintRolling(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val h = PortableHash.packed("s")
    docs(spark, sfDir)
      .withColumn("sh", Shingles.wordShingles("text", 4))
      .select(
        col("doc_id"),
        expr(s"array_min(transform(sh, s -> $h))").as("fp_min"),
        expr(s"array_max(transform(sh, s -> $h))").as("fp_max"),
        expr(s"aggregate(transform(sh, s -> $h), 0L, (a, x) -> a ^ x)")
          .as("fp_xor"))
  }

  /** DuckDB twin of [[fingerprintRolling]]: same sliding-window distinct
    * shingles (see d04's oracle for the pattern), same portable hash,
    * min/max/bit_xor as grouped aggregates. */
  val fingerprintRollingOracle: String = {
    val h = PortableHash.packed("s")
    s"""WITH w AS (SELECT doc_id, text, string_split(text, ' ') AS ws
                   FROM documents),
        sh AS (SELECT doc_id,
                      unnest(CASE WHEN len(ws) < 4 THEN [text]
                             ELSE list_distinct(list_transform(
                                    range(1, len(ws) - 2),
                                    i -> array_to_string(ws[i:i+3], ' ')))
                             END) AS s
               FROM w),
        h AS (SELECT doc_id, $h AS hv FROM sh)
      SELECT doc_id, min(hv) AS fp_min, max(hv) AS fp_max,
             bit_xor(hv) AS fp_xor
      FROM h GROUP BY doc_id"""
  }

  // ---------------------------------------------------------------- langid
  /** Character-n-gram language-ID heuristic: score each language by its
    * profile trigrams' hit count in the document, pick the argmax
    * (deterministic tie-break by language code). The profiles are tiny
    * hand-rolled trigram sets — the engine shape (map-side scoring against
    * broadcast profiles, no shuffle) is what matters at scale. */
  private val langProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", " th", "ing", " of", "ion"),
    "de" -> Seq("der", "ein", "sch", "ung", " de", "ich"),
    "es" -> Seq(" de", "que", "ión", " la", "los", " es"),
    "fr" -> Seq(" le", " de", "les", "ent", "que", " la"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有"))

  /** Per-language hit score as SQL shared verbatim by Spark and DuckDB:
    * Σ_grams (length(text) - length(text with gram removed)) — i.e.
    * occurrences × gram length, from functions both engines define
    * identically. */
  private def langScoreSql(grams: Seq[String]): String =
    grams.map(g =>
      s"(length(text) - length(replace(text, '${g.replace("'", "''")}', '')))")
      .mkString(" + ")

  def langId(spark: SparkSession, sfDir: String): DataFrame = {
    val scores = langProfiles.toSeq.sortBy(_._1).map { case (lang, grams) =>
      struct(expr(langScoreSql(grams)).as("score"), lit(lang).as("lang"))
    }
    docs(spark, sfDir).select(
      col("doc_id"),
      expr("lang").as("lang_actual"),
      element_at(
        reverse(array_sort(array(scores: _*))), 1).getField("lang")
        .as("lang_pred"))
  }

  /** DuckDB twin of [[langId]]: same score expressions, argmax spelled as
    * a CASE over languages in DESCENDING code order with `>=` — picks the
    * max score and, on ties, the lexicographically largest language,
    * exactly what reverse(array_sort(struct(score, lang)))[1] picks. */
  val langIdOracle: String = {
    val langs = langProfiles.keys.toSeq.sorted
    val desc = langs.reverse
    val scoreDefs = langs
      .map(l => s"${langScoreSql(langProfiles(l))} AS s_$l").mkString(", ")
    val cases = desc.init.zipWithIndex.map { case (l, i) =>
      val rest = desc.drop(i + 1)
      s"WHEN ${rest.map(r => s"s_$l >= s_$r").mkString(" AND ")} THEN '$l'"
    }.mkString(" ")
    s"""SELECT doc_id, lang_actual,
               CASE $cases ELSE '${desc.last}' END AS lang_pred
        FROM (SELECT doc_id, lang AS lang_actual, $scoreDefs FROM documents)"""
  }

  /** t18's frozen language-profile model — (lang, gram, weight) rows,
    * integer weights, the fastText-style model-as-data shape (t09
    * discipline): scoring is a broadcast join against this table, so
    * swapping in a real trained profile set changes DATA, not the
    * plan. Latin-script languages carry character TRIGRAMS (shared
    * Romance grams like 'que' at weight 1, distinctive ones at 2);
    * zh carries single-character grams (charset evidence — the
    * standard CJK shortcut), which only unigram tokens can match. */
  private[graft] val langModelRows: Seq[(String, String, Int)] = Seq(
    ("en", "the", 2), ("en", " th", 1), ("en", "he ", 1),
    ("en", "and", 2), ("en", "ing", 2), ("en", " of", 2),
    ("de", "der", 2), ("de", "die", 1), ("de", "und", 2),
    ("de", "sch", 2), ("de", "ich", 2), ("de", "ein", 1),
    ("es", "que", 1), ("es", " el", 2), ("es", "los", 2),
    ("es", "ión", 2), ("es", "ado", 2), ("es", "nte", 1),
    ("fr", " le", 2), ("fr", "les", 1), ("fr", "ent", 1),
    ("fr", "que", 1), ("fr", "eur", 2), ("fr", "ait", 2),
    ("zh", "的", 2), ("zh", "是", 2), ("zh", "了", 2),
    ("zh", "在", 2), ("zh", "我", 2), ("zh", "有", 2))

  /** t18: language ID against the FROZEN model table — t05's heuristic
    * re-expressed as the production shape: explode each doc into its
    * character trigrams AND unigrams (one narrow map, 2× chars rows),
    * broadcast-join the 30-row model, sum integer weights per
    * (doc, lang), argmax with the (score desc, lang) tie-break. Docs
    * matching no profile gram land on 'und' with score 0 (the spine
    * left-join). Emits (doc_id, lang, score) — the derived column
    * c24 feeds into the temperature mix. Integer scoring end-to-end,
    * so the gate is hash-anchored; LangIdModelSpec recovers true
    * languages on a hand multilingual fixture (the synthetic gate
    * corpus is English-vocabulary at every `lang` value, so there the
    * model's output is uniform — and still hash-checked). */
  def langIdModel(spark: SparkSession, sfDir: String): DataFrame =
    langIdModelOn(docs(spark, sfDir))

  /** [[langIdModel]] over any (doc_id, text) frame. */
  private[graft] def langIdModelOn(d: DataFrame): DataFrame =
    langIdFinish(d, langGramScores(d))

  /** t18's heavy half — gram explode, broadcast model join,
    * (doc, lang) integer score agg — factored out so the STREAMING
    * form (q121) runs the identical stages on a document stream:
    * one definition, no drift. */
  private[graft] def langGramScores(d: DataFrame): DataFrame = {
    val s = d.sparkSession
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    val m = langModelRows.toDF("lang", "g", "w")
    // graft_char_grams(text, n) ≡ transform(sequence(1, length - n + 1),
    // i -> substring(text, i, n)) (empty below n chars, so the old
    // CASE WHEN length >= 3 guard is built in) in ONE byte walk — the
    // substring form re-walked the string per position, O(len²)
    // interpreted per document
    val grams = d.filter(length(col("text")) >= 1)
      .select(col("doc_id"), explode(expr(
        """concat(graft_char_grams(text, 3),
                  graft_char_grams(text, 1))""")).as("g"))
    grams.join(broadcast(m), "g")
      .groupBy("doc_id", "lang").agg(sum("w").as("score"))
  }

  /** t18's tail — the (score desc, lang) argmax plus the 'und'
    * spine-fallback over `spine` (any frame with doc_id). */
  private[graft] def langIdFinish(
      spine: DataFrame, scores: DataFrame): DataFrame = {
    val best = scores.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
          .orderBy(col("score").desc, col("lang"))))
      .filter(col("rn") === 1).select("doc_id", "lang", "score")
    spine.select("doc_id").join(best, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("lang"), lit("und")).as("lang"),
        coalesce(col("score"), lit(0L)).as("score"))
  }

  /** t18's DuckDB twin: same gram explode (trigrams ∪ unigrams), same
    * VALUES model, same integer sum and (score desc, lang) argmax,
    * same 'und' spine fallback. */
  /** The t18 model/gram/score CTE chain — ONE string shared by the
    * t18 argmax oracle and t25's margin oracle so the scoring algebra
    * can never drift between them. */
  private[graft] val langIdScoreCtes: String = {
    val values = langModelRows.map { case (l, g, w) =>
      s"('$l', '${g.replace("'", "''")}', $w)"
    }.mkString(", ")
    s"""model(lang, g, w) AS (VALUES $values),
       grams AS MATERIALIZED (
         SELECT doc_id, u.g FROM documents,
           unnest(list_concat(
             CASE WHEN length(text) >= 3
               THEN list_transform(generate_series(1, length(text) - 2),
                                   i -> substring(text, i, 3))
               ELSE [] END,
             list_transform(generate_series(1, length(text)),
                            i -> substring(text, i, 1)))) AS u(g)
         WHERE length(text) >= 1),
       scores AS (
         SELECT doc_id, lang, sum(w) AS score
         FROM grams JOIN model USING (g) GROUP BY doc_id, lang)"""
  }

  val langIdModelOracle: String = {
    s"""WITH $langIdScoreCtes,
       best AS (
         SELECT doc_id, lang, score FROM (
           SELECT doc_id, lang, score, row_number() OVER
             (PARTITION BY doc_id ORDER BY score DESC, lang) AS rn
           FROM scores) WHERE rn = 1)
       SELECT d.doc_id, coalesce(b.lang, 'und') AS lang,
              CAST(coalesce(b.score, 0) AS BIGINT) AS score
       FROM documents d LEFT JOIN best b ON d.doc_id = b.doc_id"""
  }

  /** TF-IDF keyword extraction: per-document top-`k` terms by
    * tf · ln(N/df). Three distributed stages: term frequencies (one
    * shuffle on (doc, token)), document frequencies (an aggregate over
    * the tf table — vocabulary-sized, broadcast back), and a per-doc
    * top-k window. Ranking orders by the ROUNDED score (then token) so
    * the tie-break is identical across engines — the only cross-engine
    * float risk is ln() differing in the last ulp exactly at a 4th-
    * decimal rounding boundary, the same negligible-probability class as
    * the other float oracles (see bruteOracle). */
  def tfidfTopTerms(
      spark: SparkSession, sfDir: String, k: Int = 5): DataFrame = {
    val docsDf = Tables.load(spark, sfDir, "documents")
    val n = Tables.rowCount(spark, sfDir, "documents").toDouble
    val tf = docsDf
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val scored = tf.join(dfreq, "tok")
      .select(col("doc_id"), col("tok"),
        round(col("tf") * log(lit(n) / col("df")), 4).as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("score").desc, col("tok"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("doc_id"), col("rk").cast("int").as("rk"),
        col("tok"), col("score"))
  }

  val tfidfOracle: String =
    """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                     FROM documents),
       tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
       dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
       n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
       scored AS (
         SELECT tf.doc_id, tf.tok,
                round(tf.tf * ln(n.n / dfreq.df), 4) AS score
         FROM tf JOIN dfreq ON tf.tok = dfreq.tok CROSS JOIN n),
       ranked AS (
         SELECT doc_id,
                CAST(row_number() OVER (PARTITION BY doc_id
                       ORDER BY score DESC, tok) AS INTEGER) AS rk,
                tok, score
         FROM scored)
     SELECT doc_id, rk, tok, score FROM ranked WHERE rk <= 5"""

  // ------------------------------------------------------- repetition
  /** Gopher-style repetition signals: per document, the fraction of
    * duplicate words (1 − distinct/total) and the share of the single
    * most frequent word, plus the resulting keep/drop verdict — the
    * filters that catch boilerplate and degenerate generations that
    * length/stopword stats (t01) miss.
    *
    * Scale shape: explode → two-stage hash aggregation. The first
    * groupBy keys on (doc_id, word), so partial map-side combine runs
    * before the only shuffle and no global hot-word key exists — the
    * hottest possible key is one word within one document. The second
    * aggregation is per-doc and tiny. No UDFs, no windows. */
  def repetition(spark: SparkSession, sfDir: String): DataFrame =
    repetitionOn(docs(spark, sfDir))

  /** [[repetition]] over any (doc_id, text) frame. */
  private[graft] def repetitionOn(d: DataFrame): DataFrame =
    d.select(col("doc_id"), explode(toks(col("text"))).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(
        sum("c").as("words"),
        count(lit(1)).as("distinct_words"),
        max("c").as("top_word_n"))
      .select(col("doc_id"), col("words"), col("distinct_words"),
        col("top_word_n"),
        round(lit(1.0) - col("distinct_words") / col("words"), 4)
          .as("rep_ratio"),
        round(col("top_word_n") / col("words"), 4).as("top_word_frac"))
      .withColumn("keep",
        col("rep_ratio") <= 0.8 && col("top_word_frac") <= 0.2)

  val repetitionOracle: String =
    """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                  FROM documents),
        pw AS (SELECT doc_id, w, count(*) AS c FROM w GROUP BY 1, 2),
        ag AS (SELECT doc_id,
                      CAST(sum(c) AS BIGINT) AS words,
                      count(*) AS distinct_words,
                      max(c) AS top_word_n
               FROM pw GROUP BY 1)
      SELECT doc_id, words, distinct_words, top_word_n,
             round(1.0 - distinct_words / CAST(words AS DOUBLE), 4)
               AS rep_ratio,
             round(top_word_n / CAST(words AS DOUBLE), 4) AS top_word_frac,
             (round(1.0 - distinct_words / CAST(words AS DOUBLE), 4) <= 0.8
              AND round(top_word_n / CAST(words AS DOUBLE), 4) <= 0.2)
               AS keep
      FROM ag"""

  // --------------------------------------------- unigram LM log-prob
  /** CCNet-style language-model quality proxy: score each document by
    * the mean log-probability of its words under the CORPUS unigram
    * distribution — wikipedia-like text scores high, gibberish and
    * boilerplate tails score low; real pipelines bucket documents into
    * quality tiers on exactly this statistic (CCNet does it with a
    * 5-gram KenLM; the unigram form is the same plumbing with an
    * in-corpus model).
    *
    * Scale shape: the model IS a DataFrame (word → count), built by one
    * corpus aggregation and joined back — at 100 TB the unigram table is
    * ~millions of rows (vocabulary, not corpus, sized), a plain shuffle
    * join against the exploded words, partial-agg'd per doc. No
    * driver-side model, no UDF; ln() is a codegen'd builtin. */
  def unigramLogprob(spark: SparkSession, sfDir: String): DataFrame = {
    // barrier: the exploded words feed BOTH the model aggregation and
    // the probe side of the join — without it Spark re-tokenizes the
    // corpus once per reference (no common-subplan dedup)
    val words = Persists.barrier(docs(spark, sfDir)
      .select(col("doc_id"), explode(toks(col("text"))).as("w")))
    val model = words.groupBy("w").agg(count(lit(1)).as("cnt"))
    // total token count off the VOCABULARY-sized model, not a third
    // corpus-wide pass
    val total = model.select(sum("cnt").as("total"))
    words.join(model, "w").crossJoin(total)
      .groupBy("doc_id")
      .agg(round(avg(log(col("cnt") / col("total"))), 4).as("logprob"))
  }

  val unigramOracle: String =
    """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                  FROM documents),
        model AS (SELECT w, count(*) AS cnt FROM w GROUP BY w),
        t AS (SELECT count(*) AS total FROM w)
      SELECT doc_id,
             round(avg(ln(cnt / CAST(total AS DOUBLE))), 4) AS logprob
      FROM w JOIN model USING (w) CROSS JOIN t
      GROUP BY doc_id"""

  /** t23: CCNet QUALITY TIERS — the head/middle/tail bucketing CCNet
    * applies to its LM-perplexity scores (Wenzek et al. 2020 §4.3):
    * t09's unigram logprob (the already-gated operator VERBATIM)
    * banded into equi-depth terciles with the c26 left-edge
    * convention — the cumulative window runs over the
    * DISTINCT-logprob frame (value-bounded however large the corpus),
    * band = ((cum − cnt)·3) div total + 1 in pure int64, broadcast
    * back. Ascending logprob ⇒ band 1 = tail (least fluent),
    * 3 = head. Output (doc_id, logprob, tier).
    *
    * Scale shape: t09's two linear passes + a value-bounded window +
    * a broadcast band-map join — the c26 banding argument verbatim. */
  def qualityTiers(spark: SparkSession, sfDir: String): DataFrame =
    qualityTiersOn(unigramLogprob(spark, sfDir))

  /** [[qualityTiers]] over any (doc_id, logprob) frame. */
  private[graft] def qualityTiersOn(lp0: DataFrame): DataFrame = {
    val lp = Persists.barrier(lp0)
    val wCum = org.apache.spark.sql.expressions.Window
      .orderBy("logprob")
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, org.apache.spark.sql.expressions.Window
        .currentRow)
    val bandMap = lp.groupBy("logprob").agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum("cnt").over(wCum))
      .withColumn("total", sum("cnt").over(
        org.apache.spark.sql.expressions.Window.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.unboundedFollowing)))
      .select(col("logprob"),
        expr("((cum - cnt) * 3) div total + 1").cast("int").as("band"))
    lp.join(broadcast(bandMap), "logprob")
      .select(col("doc_id"), col("logprob"),
        when(col("band") === 1, "tail").when(col("band") === 2, "middle")
          .otherwise("head").as("tier"))
  }

  /** t23's DuckDB twin: the t09 oracle as a CTE + the c26 banding
    * algebra on the distinct-logprob frame. */
  def qualityTiersOracle: String =
    s"""WITH lp AS MATERIALIZED ($unigramOracle),
       g AS (SELECT logprob, count(*) AS cnt FROM lp GROUP BY logprob),
       b AS (SELECT logprob,
                    ((sum(cnt) OVER (ORDER BY logprob
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) - cnt) * 3)
                      // (sum(cnt) OVER ()) + 1 AS band
             FROM g)
       SELECT lp.doc_id, lp.logprob,
              CASE b.band WHEN 1 THEN 'tail' WHEN 2 THEN 'middle'
                   ELSE 'head' END AS tier
       FROM lp JOIN b USING (logprob)"""

  // --------------------------------------------- bigram LM log-prob
  /** Bigram conditional log-probability scoring: mean ln P(wᵢ | wᵢ₋₁)
    * under the corpus bigram model — t09's unigram proxy upgraded one
    * order: repetitive boilerplate scores HIGH conditional probability
    * (its transitions are predictable) while word salad that sneaks
    * past unigram stats (common words, nonsense order) scores low —
    * the signal CCNet's 5-gram KenLM actually uses, with the same
    * model-is-a-DataFrame plumbing as t09.
    *
    * Scale shape: the pair frame is built in the scan projection
    * (slice + zip_with + explode, no UDF), barriered once, and feeds
    * the bigram model, the first-word marginal, and the probe join —
    * models are observed-bigram-sized (vocabulary², sparse), joins
    * carry partial-agg'd counts, hottest key = one bigram. */
  def bigramLogprob(spark: SparkSession, sfDir: String): DataFrame = {
    val ws = docs(spark, sfDir)
      .select(col("doc_id"), toks(col("text")).as("ws"))
      .filter(size(col("ws")) >= 2)
    val pairs = Persists.barrier(ws
      .select(col("doc_id"), explode(zip_with(
        slice(col("ws"), lit(1), size(col("ws")) - 1),
        slice(col("ws"), lit(2), size(col("ws")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .select(col("doc_id"), col("p.w1"), col("p.w2")))
    val bg = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val u1 = pairs.groupBy("w1").agg(count(lit(1)).as("c1"))
    pairs.join(bg, Seq("w1", "w2")).join(u1, Seq("w1"))
      .groupBy("doc_id")
      .agg(round(avg(log(col("c2") / col("c1"))), 4).as("logprob"))
  }

  val bigramOracle: String =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
                  FROM documents),
        p AS (SELECT doc_id, unnest(list_transform(range(1, len(ws)),
                     i -> {'w1': ws[i], 'w2': ws[i+1]}),
                     recursive := true)
              FROM w WHERE len(ws) >= 2),
        bg AS (SELECT w1, w2, count(*) AS c2 FROM p GROUP BY 1, 2),
        u1 AS (SELECT w1, count(*) AS c1 FROM p GROUP BY 1)
      SELECT doc_id, round(avg(ln(c2 / CAST(c1 AS DOUBLE))), 4) AS logprob
      FROM p JOIN bg USING (w1, w2) JOIN u1 USING (w1)
      GROUP BY doc_id"""

  // ------------------------------------------------------ heavy hitters
  /** Corpus heavy hitters: the `k` most frequent tokens with their
    * exact counts — the vocabulary head every tokenizer build, stopword
    * list, and boilerplate screen starts from.
    *
    * Scale shape: explode → ONE hash aggregation keyed on the token.
    * Hot tokens ('the') are exactly what partial map-side combine
    * eats: each task emits one partial count per distinct token, so
    * the shuffle carries vocabulary-sized traffic regardless of skew.
    * The top-k tail is sort+limit (TakeOrderedAndProject) over the
    * vocabulary-sized aggregate, then a rank window over k survivors
    * (the t10/Ranks pattern — no corpus-wide window). For a
    * memory-bounded sketch alternative see the count-min-sketch
    * contract in HeavyHittersSpec: CMS + this exact form's candidates
    * is the classic two-pass at 100 TB; the exact form alone is
    * already linear + vocabulary-bounded. */
  def heavyHitters(spark: SparkSession, sfDir: String, k: Int = 25): DataFrame =
    heavyHittersTail(heavyHitterCounts(docs(spark, sfDir)), k)

  /** The (tok, cnt) vocabulary aggregation over any frame with a
    * `text` column — shared by the batch operator and the streaming
    * form (q83 applies it to the document STREAM; it is
    * streaming-legal: one stateless generator + one aggregation), so
    * BOTH halves of the t12 contract — tokenization and ranking —
    * have exactly one definition under the shared oracle. */
  def heavyHitterCounts(d: DataFrame): DataFrame =
    tokensOf(d).groupBy("tok").agg(count(lit(1)).as("cnt"))

  /** The top-k tail over an already-aggregated (tok, cnt) frame — ONE
    * definition shared by the batch operator and the streaming form
    * (q83 ranks its completed complete-mode sink with this), so the
    * rank/tie-break contract can't drift from the shared oracle. */
  def heavyHittersTail(counts: DataFrame, k: Int = 25): DataFrame =
    Ranks.topKRanked(counts, k, col("cnt").desc, col("tok"))
      .select(col("rk"), col("tok"), col("cnt"))

  /** t14: the count-min sketch SERVED — the memory-bounded two-pass
    * heavy-hitter plan HeavyHittersSpec's contract describes, now run
    * as one distributed query. Pass 1 builds the sketch with Spark's
    * builtin `count_min_sketch` TypedImperativeAggregate (codegen'd,
    * partial-merged per executor — re-implementing it would violate
    * the builtins-first rule); pass 2 broadcast-attaches the one-row
    * sketch to t12's exact top-k candidates and reads each estimate
    * row-locally via the native `graft_cms_query` expression (the half
    * Spark LACKS — without it the estimates happen on the driver).
    *
    * Scale shape: the sketch is ε=0.001/δ=0.99 ≈ 100 KB FIXED
    * regardless of corpus size — the aggregation shuffles one sketch
    * per partition instead of a vocabulary; candidates are k rows. At
    * 100 TB this is the plan when even the vocabulary is memory-bound
    * (the exact t12 aggregate is vocabulary-sized, this is
    * constant-sized). Rows-only gate: the estimate column is
    * sketch-internal (seeded hashing), and CmsServeSpec pins the CMS
    * contract — est ≥ exact, est − exact ≤ ε·N — against t12's exact
    * oracle-checked counts. */
  def cmsServe(spark: SparkSession, sfDir: String, k: Int = 25): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val tokens = tokensOf(docs(spark, sfDir))
    val sketch = tokens.agg(
      expr("count_min_sketch(tok, CAST(0.001 AS DOUBLE), " +
        "CAST(0.99 AS DOUBLE), 42)").as("sk"))
    heavyHitters(spark, sfDir, k)
      .crossJoin(broadcast(sketch)) // 1-row scalar attach
      .select(col("rk"), col("tok"), col("cnt"),
        expr("graft_cms_query(sk, tok)").as("est"))
  }

  /** t15: INCREMENTAL sketch maintenance — per-shard sketches (the
    * per-ingest-batch artifact shape) merged into the corpus sketch
    * with `graft_cms_merge`, then served through the same candidates
    * as t14. CMS merge is EXACT (same ε/δ/seed ⇒ element-wise counter
    * sum), so the merged sketch's estimates are IDENTICAL to t14's
    * single-pass sketch — CmsServeSpec asserts equality row-for-row,
    * which is the strongest possible gate for a merge operator. At
    * 100 TB this is the nightly-refresh shape: re-sketching the corpus
    * re-scans 100 TB; merging the stored per-batch sketches moves
    * O(batches × 100 KB). Rows-only entry (estimates are
    * sketch-internal), candidates oracle-backed via t12. */
  def cmsIncremental(spark: SparkSession, sfDir: String, k: Int = 25,
      shards: Int = 4): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val perShard = docs(spark, sfDir)
      .select(pmod(col("doc_id"), lit(shards)).as("shard"),
        explode(toks(col("text"))).as("tok"))
      .groupBy("shard")
      .agg(expr("count_min_sketch(tok, CAST(0.001 AS DOUBLE), " +
        "CAST(0.99 AS DOUBLE), 42)").as("sk"))
    val merged = perShard.agg(expr("graft_cms_merge(sk)").as("sk"))
    heavyHitters(spark, sfDir, k)
      .crossJoin(broadcast(merged)) // 1-row scalar attach
      .select(col("rk"), col("tok"), col("cnt"),
        expr("graft_cms_query(sk, tok)").as("est"))
  }

  val heavyHittersOracle: String =
    """WITH t AS (SELECT unnest(string_split(text, ' ')) AS tok
                  FROM documents),
        c AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM t
              GROUP BY tok),
        ranked AS (
          SELECT CAST(row_number() OVER (ORDER BY cnt DESC, tok)
                   AS INTEGER) AS rk, tok, cnt
          FROM c)
      SELECT rk, tok, cnt FROM ranked WHERE rk <= 25"""

  /** t16: corpus-shard divergence — per-token Jensen-Shannon
    * contributions between two shards of the corpus (doc_id-parity
    * here; train-vs-holdout or source-vs-source in production). The
    * distribution-drift detector every data pipeline runs before
    * mixing corpora: JSD(P‖Q) = Σ_tok ½·p·ln(p/m) + ½·q·ln(q/m) with
    * m = (p+q)/2, and the per-token terms ARE the drift explanation
    * (which tokens moved). Pipeline: one exploded token count per
    * (shard, token) — partial-aggregates map-side — a 1-row shard
    * total broadcast, a full-outer token join (a token present in one
    * shard contributes from the other side's zero), and pure scalar
    * arithmetic per token. Nothing here ever sums doubles across rows
    * (the probabilities divide exact longs), so every output value is
    * deterministic without any re-entry rounding discipline; the
    * caller sums `jsd` for the scalar divergence. */
  def shardDivergence(spark: SparkSession, sfDir: String): DataFrame =
    shardDivergenceOn(docs(spark, sfDir)
      .select((col("doc_id") % 2).cast("int").as("shard"), col("text")))

  /** [[shardDivergence]] over any (shard ∈ {0,1}, text) frame. */
  def shardDivergenceOn(d: DataFrame): DataFrame = {
    val counts = d.select(col("shard"), explode(toks(col("text"))).as("tok"))
      .groupBy("shard", "tok").agg(count(lit(1)).as("c"))
    val tot = counts.agg(
      sum(when(col("shard") === 0, col("c"))).as("t0"),
      sum(when(col("shard") === 1, col("c"))).as("t1"))
    val a = counts.filter(col("shard") === 0)
      .select(col("tok"), col("c").as("c0"))
    val b = counts.filter(col("shard") === 1)
      .select(col("tok"), col("c").as("c1"))
    a.join(b, Seq("tok"), "full_outer")
      .crossJoin(broadcast(tot))
      .withColumn("p0", coalesce(col("c0"), lit(0L)) / col("t0"))
      .withColumn("p1", coalesce(col("c1"), lit(0L)) / col("t1"))
      .withColumn("m", (col("p0") + col("p1")) / lit(2))
      .select(col("tok"),
        round(col("p0"), 9).as("p0"),
        round(col("p1"), 9).as("p1"),
        round(
          lit(0.5) * when(col("p0") > 0,
            col("p0") * log(col("p0") / col("m"))).otherwise(lit(0.0)) +
          lit(0.5) * when(col("p1") > 0,
            col("p1") * log(col("p1") / col("m"))).otherwise(lit(0.0)),
          9).as("jsd"))
  }

  val shardDivergenceOracle: String =
    """WITH tk AS (SELECT doc_id % 2 AS shard,
                          unnest(string_split(text, ' ')) AS tok
                   FROM documents),
        c AS (SELECT shard, tok, count(*) AS c FROM tk GROUP BY 1, 2),
        tt AS (SELECT sum(CASE WHEN shard = 0 THEN c END) AS t0,
                      sum(CASE WHEN shard = 1 THEN c END) AS t1
               FROM c),
        a AS (SELECT tok, c AS c0 FROM c WHERE shard = 0),
        b AS (SELECT tok, c AS c1 FROM c WHERE shard = 1),
        j AS (SELECT coalesce(a.tok, b.tok) AS tok, c0, c1
              FROM a FULL OUTER JOIN b ON a.tok = b.tok),
        p AS (SELECT tok, coalesce(c0, 0) / t0 AS p0,
                     coalesce(c1, 0) / t1 AS p1
              FROM j, tt),
        q AS (SELECT tok, p0, p1, (p0 + p1) / 2 AS m FROM p)
      SELECT tok, round(p0, 9) AS p0, round(p1, 9) AS p1,
             round(0.5 * (CASE WHEN p0 > 0 THEN p0 * ln(p0 / m)
                               ELSE 0.0 END) +
                   0.5 * (CASE WHEN p1 > 0 THEN p1 * ln(p1 / m)
                               ELSE 0.0 END), 9) AS jsd
      FROM q"""

  /** t17: n-gram NOVELTY — per document, the share of its distinct
    * 5-char grams (d04's exact gram definition: non-overlapping
    * `regexp_extract_all(text, '.{5}', 0)`) that appear NOWHERE else
    * in the corpus. The memorization/boilerplate dial for curation:
    * novelty → 0 flags template/boilerplate documents whose every
    * gram recurs elsewhere, novelty → 1 flags unique content worth
    * keeping (or PII-risky one-off strings worth auditing). One
    * exploded distinct-gram frame (barriered: feeds both the global
    * document-frequency agg and the per-doc rollup), one gram-keyed
    * shuffle for df, one join back, one per-doc agg — linear in
    * corpus chars at any scale, and the df frame is the vocabulary,
    * not the corpus. Exact integer counts; one deterministic
    * division, served at 4 dp. Documents shorter than one gram have
    * no grams and no row (both engines). */
  def ngramNovelty(spark: SparkSession, sfDir: String): DataFrame =
    ngramNoveltyOn(docs(spark, sfDir))

  /** [[ngramNovelty]] over any (doc_id, text) frame. */
  def ngramNoveltyOn(d: DataFrame): DataFrame = {
    val grams = graft.operators.Persists.barrier(
      d.select(col("doc_id"), explode(array_distinct(
        expr("regexp_extract_all(text, '.{5}', 0)"))).as("gram")))
    val dfreq = grams.groupBy("gram").agg(count(lit(1)).as("df"))
    grams.join(dfreq, "gram")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_unique"))
      .withColumn("novelty",
        round(col("n_unique") / col("n_grams"), 4))
  }

  val ngramNoveltyOracle: String =
    """WITH g AS (SELECT doc_id,
                         unnest(list_distinct(
                           regexp_extract_all(text, '.{5}', 0))) AS gram
                  FROM documents),
        df AS (SELECT gram, count(*) AS df FROM g GROUP BY gram)
      SELECT doc_id, count(*) AS n_grams,
             CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_unique,
             round(CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   / count(*), 4) AS novelty
      FROM g JOIN df USING (gram)
      GROUP BY doc_id"""

  /** t21: EXACT PHRASE SEARCH over a positional inverted index — the
    * search primitive BM25 (t10) cannot express: t10 ranks bags of
    * words; "these words, adjacent, in this order" needs positions.
    * The phrase is DERIVED from the corpus (its most frequent
    * trigram, ties lexicographic — self-contained and stable across
    * testdata regenerations), then every occurrence is found by the
    * classic positional-index AND *without an L-way self-join*: each
    * posting matching term i votes for anchor = pos − i, and an
    * anchor with all L distinct term-offsets matched is an
    * occurrence. One (doc, anchor)-keyed agg over the
    * phrase-filtered postings — the filter is a broadcast join
    * against the L-row term list, so at 100 TB the shuffle carries
    * only postings of the L phrase tokens, never the index. Trigram
    * derivation is row-local array work (no join), one
    * vocabulary³-bounded partial agg. Handles repeated-token phrases
    * and overlapping occurrences exactly (PhraseSearchSpec's
    * "b b b b" law). Output: (doc_id, pos, phrase) per occurrence —
    * integer-exact, hash-anchored. */
  def phraseSearch(spark: SparkSession, sfDir: String): DataFrame =
    phraseSearchOn(docs(spark, sfDir))

  /** [[phraseSearch]] over any (doc_id, text) frame. */
  def phraseSearchOn(d: DataFrame): DataFrame = {
    // barriered: feeds the trigram derivation AND the postings scan
    val dd = graft.operators.Persists.barrier(
      d.select(col("doc_id"), toks(col("text")).as("tk")))
    // the size >= 3 guard matters: sequence(0, n) with n < 0 is a
    // DESCENDING sequence in Spark, not empty
    val top = graft.operators.Persists.barrier(dd
      .filter(size(col("tk")) >= 3)
      .select(explode(expr(
        "transform(sequence(0, size(tk) - 3), " +
          "i -> concat(tk[i], ' ', tk[i+1], ' ', tk[i+2]))")).as("phrase"))
      .groupBy("phrase").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("phrase")).limit(1))
    val terms = top
      .select(posexplode(split(col("phrase"), " ")).as(Seq("i", "tok")))
    val postings = dd
      .select(col("doc_id"), posexplode(col("tk")).as(Seq("pos", "token")))
    postings.join(broadcast(terms), col("token") === col("tok"))
      .select(col("doc_id"), (col("pos") - col("i")).as("pos"), col("i"))
      .groupBy("doc_id", "pos")
      .agg(countDistinct("i").as("nmatch"))
      .filter(col("nmatch") === 3)
      .crossJoin(broadcast(top.select("phrase")))
      .select(col("doc_id"), col("pos"), col("phrase"))
  }

  val phraseSearchOracle: String =
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS tk
                  FROM documents),
        tri AS (SELECT tk[CAST(u.i + 1 AS INTEGER)] || ' ' ||
                       tk[CAST(u.i + 2 AS INTEGER)] || ' ' ||
                       tk[CAST(u.i + 3 AS INTEGER)] AS phrase
                FROM d, UNNEST(range(0, len(tk) - 2)) AS u(i)),
        top1 AS MATERIALIZED (
          SELECT phrase, count(*) AS cnt FROM tri GROUP BY phrase
          ORDER BY cnt DESC, phrase LIMIT 1),
        terms AS (SELECT CAST(u.i - 1 AS INTEGER) AS i, t.ts[u.i] AS tok
                  FROM (SELECT string_split(phrase, ' ') AS ts
                        FROM top1) t,
                  UNNEST(range(1, len(t.ts) + 1)) AS u(i)),
        p AS (SELECT doc_id, CAST(u.i - 1 AS INTEGER) AS pos,
                     tk[u.i] AS token
              FROM d, UNNEST(range(1, len(tk) + 1)) AS u(i)),
        hits AS (SELECT p.doc_id, p.pos - terms.i AS pos
                 FROM p JOIN terms ON p.token = terms.tok
                 GROUP BY 1, 2 HAVING count(DISTINCT terms.i) = 3)
       SELECT h.doc_id, h.pos, t.phrase FROM hits h, top1 t"""

  /** t25: LANGID CONFIDENCE MARGIN — the decision signal a langid
    * filter actually thresholds on (CLD/fastText pipelines route on
    * top1−top2, not the raw score: a doc matching two languages'
    * profiles equally is UNDECIDED however high its top score): t18's
    * gram scores (the shared `langGramScores`, one definition with
    * t18/q121), the (score desc, lang) top-2 per doc, margin =
    * top1 − top2 (top2 = 0 when only one language matched; spine
    * docs matching nothing land on ('und', 0, 0)). Integer
    * end-to-end. Output (doc_id, lang, score, margin).
    *
    * Scale shape: t18's broadcast-model pass plus one per-doc
    * bounded window over ≤ |langs| rows per doc. */
  def langIdMargin(spark: SparkSession, sfDir: String): DataFrame =
    langIdMarginOn(docs(spark, sfDir))

  /** [[langIdMargin]] over any (doc_id, text) frame. */
  private[graft] def langIdMarginOn(d: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("score").desc, col("lang"))
    val top = langGramScores(d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .groupBy("doc_id").agg(
        max(when(col("rn") === 1, col("lang"))).as("lang"),
        max(when(col("rn") === 1, col("score"))).as("score"),
        coalesce(max(when(col("rn") === 2, col("score"))), lit(0L))
          .as("s2"))
    d.select("doc_id").join(top, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("lang"), lit("und")).as("lang"),
        coalesce(col("score"), lit(0L)).as("score"),
        coalesce(col("score") - col("s2"), lit(0L)).as("margin"))
  }

  /** t25's DuckDB twin: the shared t18 score CTEs + the top-2 window
    * and margin. */
  def langIdMarginOracle: String =
    s"""WITH $langIdScoreCtes,
       ranked AS (
         SELECT doc_id, lang, score, row_number() OVER
           (PARTITION BY doc_id ORDER BY score DESC, lang) AS rn
         FROM scores),
       top AS (
         SELECT doc_id,
                max(CASE WHEN rn = 1 THEN lang END) AS lang,
                max(CASE WHEN rn = 1 THEN score END) AS score,
                coalesce(max(CASE WHEN rn = 2 THEN score END), 0) AS s2
         FROM ranked WHERE rn <= 2 GROUP BY doc_id)
       SELECT d.doc_id,
              coalesce(t.lang, 'und') AS lang,
              CAST(coalesce(t.score, 0) AS BIGINT) AS score,
              CAST(coalesce(t.score - t.s2, 0) AS BIGINT) AS margin
       FROM documents d LEFT JOIN top t ON d.doc_id = t.doc_id"""

  /** t24: TOKENIZER FERTILITY BY LANGUAGE — the per-language
    * subwords-per-word ratio every multilingual tokenizer evaluation
    * reports (fertility ≫ 1 on a language means the vocabulary
    * under-serves it — the signal that drives vocab re-budgeting):
    * t18's model-table langid derives the language (the gated
    * operator verbatim), t02's whitespace tokens and t06's fixed-4
    * subword segmentation supply the counts, and the roll-up is one
    * |langs|-row aggregate. Output (lang, n_docs, n_tokens,
    * n_subwords, fertility).
    *
    * Scale shape: the langid broadcast-model pass + one linear
    * feature projection + a languages-sized agg (partial map-side) —
    * all corpus-linear, nothing keyed hotter than a language. */
  def fertilityByLang(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Persists.barrier(docs(spark, sfDir))
    val lang = langIdModelOn(d).select("doc_id", "lang")
    val feat = d.select(col("doc_id"),
      size(toks(col("text"))).cast("long").as("nt"),
      size(expr("""flatten(transform(split(text, ' '),
            w -> regexp_extract_all(w, '.{1,4}', 0)))"""))
        .cast("long").as("ns"))
    lang.join(feat, "doc_id").groupBy("lang").agg(
      count(lit(1)).as("n_docs"),
      sum("nt").as("n_tokens"),
      sum("ns").as("n_subwords"),
      round(sum("ns").cast("double") / sum("nt"), 4).as("fertility"))
  }

  /** t24's DuckDB twin: the t18 oracle as a CTE, the t02/t06 count
    * expressions, the same per-language roll-up. */
  def fertilityOracle: String =
    s"""WITH langid AS MATERIALIZED (
         SELECT * FROM ($langIdModelOracle) q),
       feat AS (
         SELECT doc_id,
                CAST(len(string_split(text, ' ')) AS BIGINT) AS nt,
                CAST(len(flatten(list_transform(string_split(text, ' '),
                       w -> regexp_extract_all(w, '.{1,4}', 0))))
                     AS BIGINT) AS ns
         FROM documents)
       SELECT lang, count(*) AS n_docs,
              CAST(sum(nt) AS BIGINT) AS n_tokens,
              CAST(sum(ns) AS BIGINT) AS n_subwords,
              round(sum(ns) / CAST(sum(nt) AS DOUBLE), 4) AS fertility
       FROM langid JOIN feat USING (doc_id)
       GROUP BY lang"""

  // ------------------------------------------- model-based quality filter
  /** Frozen logistic-regression weights for t22, (feature, weight) as a
    * MODEL TABLE (the t09/t18 model-as-DataFrame discipline): natural
    * text is stopword-dense and repetition-light, so repetition signals
    * weigh negative and stopword density positive. Clean one-decimal
    * stand-in weights — any real trained vector drops into the same
    * table without touching the plan. */
  private[graft] val qualityLrModel: Seq[(String, Double)] = Seq(
    ("rep_ratio", -4.0), ("top_word_frac", -6.0),
    ("stopword_ratio", 3.0), ("avg_word_len", -0.5))
  private val QualityLrBias = 2.0

  /** t22: MODEL-BASED QUALITY FILTER — the classifier gate real
    * pipelines run after the heuristic filters (FineWeb-Edu's
    * classifier scoring, Llama-class "quality model" filtering): the
    * four already-gated quality signals (t01's stopword_ratio /
    * avg_word_len, t08's rep_ratio / top_word_frac — the SAME code
    * paths, factored to On forms) unpivoted to (doc_id, feature,
    * value), broadcast-joined to the frozen 4-row weight table, dot
    * product + bias through the logistic link. The score is rounded
    * to 4 dp (the t13 float discipline) and `kept` thresholds the
    * ROUNDED score at 0.5, so the boundary decision is
    * engine-identical. Output (doc_id, score, kept).
    *
    * Scale shape: two linear per-doc feature passes, a 4n-row
    * unpivot, a 4-row broadcast join, one per-doc hash agg — no
    * window, no self-join, no UDF; the model table swaps for a
    * trained one of any width without changing the plan. */
  def qualityClassifier(spark: SparkSession, sfDir: String): DataFrame =
    qualityClassifierOn(docs(spark, sfDir))

  /** [[qualityClassifier]] over any (doc_id, text) frame. */
  private[graft] def qualityClassifierOn(d: DataFrame): DataFrame = {
    val s = d.sparkSession
    import s.implicits._
    val m = qualityLrModel.toDF("feature", "w")
    val feats = qualityStatsOn(d).join(repetitionOn(d), "doc_id")
      .select(col("doc_id"), expr(
        """stack(4, 'rep_ratio', rep_ratio,
                    'top_word_frac', top_word_frac,
                    'stopword_ratio', stopword_ratio,
                    'avg_word_len', avg_word_len)""")
        .as(Seq("feature", "value")))
    feats.join(broadcast(m), "feature")
      .groupBy("doc_id")
      .agg(round(lit(1.0) / (lit(1.0) +
        exp(-(lit(QualityLrBias) + sum(col("value") * col("w"))))), 4)
        .as("score"))
      .withColumn("kept", col("score") >= 0.5)
  }

  /** t22's DuckDB twin: the t01 and t08 oracles as CTEs, the same
    * VALUES model table, same dot product + logistic link, same 4-dp
    * rounding BEFORE the 0.5 threshold. */
  val qualityClassifierOracle: String = {
    val values = qualityLrModel.map { case (f, w) => s"('$f', $w)" }
      .mkString(", ")
    s"""WITH q AS ($qualityOracle),
       r AS ($repetitionOracle),
       j AS MATERIALIZED (
         SELECT q.doc_id, rep_ratio, top_word_frac, stopword_ratio,
                avg_word_len
         FROM q JOIN r ON q.doc_id = r.doc_id),
       f AS (
         SELECT doc_id, 'rep_ratio' AS feature, rep_ratio AS value FROM j
         UNION ALL
         SELECT doc_id, 'top_word_frac', top_word_frac FROM j
         UNION ALL
         SELECT doc_id, 'stopword_ratio', stopword_ratio FROM j
         UNION ALL
         SELECT doc_id, 'avg_word_len', avg_word_len FROM j),
       model(feature, w) AS (VALUES $values),
       z AS (SELECT doc_id, $QualityLrBias + sum(value * w) AS z
             FROM f JOIN model USING (feature) GROUP BY doc_id)
       SELECT doc_id, round(1.0 / (1.0 + exp(-z)), 4) AS score,
              round(1.0 / (1.0 + exp(-z)), 4) >= 0.5 AS kept
       FROM z"""
  }

  // ------------------------------------------- Gopher n-gram repetition
  /** t26: GOPHER-STYLE N-GRAM REPETITION SIGNALS (Rae et al. 2021 §A1.1,
    * the repetition block of the Gopher/MassiveText quality rules; the
    * same family ships in every public corpus-cleaning stack since).
    * t08 measures WORD-level repetition; this measures PHRASE-level
    * repetition, the signal that actually catches boilerplate: per
    * document,
    *   - `top2_frac` / `top3_frac` — fraction of the document's
    *     characters covered by occurrences of its single most frequent
    *     word 2-gram / 3-gram (count · gram length / n_chars; ties on
    *     count break to the lexicographically smallest gram),
    *   - `dup5_frac` — fraction of characters in DUPLICATED 5-grams
    *     (all occurrences of every 5-gram appearing ≥ 2×; overlapping
    *     occurrences each count, so the score may exceed 1 on
    *     pathological loops — it is a screening score, not a measure),
    *   - `keep` — the Gopher-shaped AND of the three thresholds. The
    *     0.20 top-2-gram cut BINDS on the gate corpus (observed range
    *     0.007–0.33 at both gate SFs, so both keep values appear); the
    *     3-gram and duplicate-5-gram cuts bind on the crafted
    *     boilerplate fixture in GopherRepetitionSpec and are mirrored
    *     verbatim in the oracle (the g17 threshold discipline).
    *
    * Scale shape: n-grams are assembled MAP-SIDE from the token array
    * (`transform(sequence(...))` + one explode per n — no self-join,
    * no window over the token stream), then hash-aggregated on
    * (doc_id, gram) where partial map-side combine collapses each
    * document's repeats before the only shuffle; the hottest possible
    * key is one gram within one document. The top-1 pick runs over the
    * already-aggregated per-doc distinct-gram rows (row_number per
    * doc_id — bounded by document length, no global hot key). Three
    * linear passes over the corpus, all inside whole-stage codegen. */
  def gopherRepetition(spark: SparkSession, sfDir: String): DataFrame =
    gopherRepetitionOn(docs(spark, sfDir))

  /** [[gopherRepetition]] over any (doc_id, text, n_chars) frame. */
  private[graft] def gopherRepetitionOn(d: DataFrame): DataFrame = {
    // token array referenced by all three gram passes — barrier so the
    // split runs once, not once per explode (the loop-body rule)
    val a = Persists.barrier(
      d.select(col("doc_id"), col("n_chars"), toks(col("text")).as("a")))
    def grams(n: Int): DataFrame = a.filter(size(col("a")) >= n)
      .select(col("doc_id"), col("n_chars"),
        explode(expr(s"transform(sequence(1, size(a) - ${n - 1}), " +
          s"i -> concat_ws(' ', slice(a, i, $n)))")).as("g"))
      .groupBy("doc_id", "n_chars", "g").agg(count(lit(1)).as("c"))
    def topFrac(n: Int, frac: String, gram: String): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy(col("c").desc, col("g"))
      grams(n).withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("doc_id"), col("g").as(gram),
          round(col("c") * length(col("g")) / col("n_chars").cast("double"),
            4).as(frac))
    }
    val dup5 = grams(5).groupBy("doc_id").agg(
      round(coalesce(sum(when(col("c") >= 2, col("c") * length(col("g")))),
        lit(0L)) / first(col("n_chars")).cast("double"), 4).as("dup5_frac"))
    a.select("doc_id").join(topFrac(2, "top2_frac", "top2_gram"), Seq("doc_id"), "left")
      .join(topFrac(3, "top3_frac", "top3_gram"), Seq("doc_id"), "left")
      .join(dup5, Seq("doc_id"), "left")
      .select(col("doc_id"), col("top2_gram"),
        coalesce(col("top2_frac"), lit(0.0)).as("top2_frac"),
        col("top3_gram"),
        coalesce(col("top3_frac"), lit(0.0)).as("top3_frac"),
        coalesce(col("dup5_frac"), lit(0.0)).as("dup5_frac"))
      .withColumn("keep",
        col("top2_frac") <= 0.20 && col("top3_frac") <= 0.18 &&
          col("dup5_frac") <= 0.15)
  }

  /** t26's DuckDB twin: identical gram assembly (list_transform over
    * range — DuckDB range() excludes its end, Spark sequence() includes
    * it, hence the differing end arithmetic), identical (count desc,
    * gram) tie-break, identical 4-dp grid and thresholds. */
  val gopherRepetitionOracle: String =
    """WITH a AS (SELECT doc_id, n_chars, string_split(text, ' ') AS a
                  FROM documents),
        g2 AS (SELECT doc_id, n_chars,
                      unnest(list_transform(range(1, len(a)),
                        i -> a[i] || ' ' || a[i+1])) AS g
               FROM a WHERE len(a) >= 2),
        c2 AS (SELECT doc_id, n_chars, g, count(*) AS c
               FROM g2 GROUP BY 1, 2, 3),
        t2 AS (SELECT doc_id, g AS top2_gram,
                      round(c * length(g) / CAST(n_chars AS DOUBLE), 4)
                        AS top2_frac
               FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                       ORDER BY c DESC, g) AS rn FROM c2) WHERE rn = 1),
        g3 AS (SELECT doc_id, n_chars,
                      unnest(list_transform(range(1, len(a) - 1),
                        i -> a[i] || ' ' || a[i+1] || ' ' || a[i+2])) AS g
               FROM a WHERE len(a) >= 3),
        c3 AS (SELECT doc_id, n_chars, g, count(*) AS c
               FROM g3 GROUP BY 1, 2, 3),
        t3 AS (SELECT doc_id, g AS top3_gram,
                      round(c * length(g) / CAST(n_chars AS DOUBLE), 4)
                        AS top3_frac
               FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                       ORDER BY c DESC, g) AS rn FROM c3) WHERE rn = 1),
        g5 AS (SELECT doc_id, n_chars,
                      unnest(list_transform(range(1, len(a) - 3),
                        i -> a[i] || ' ' || a[i+1] || ' ' || a[i+2] || ' '
                             || a[i+3] || ' ' || a[i+4])) AS g
               FROM a WHERE len(a) >= 5),
        c5 AS (SELECT doc_id, n_chars, g, count(*) AS c
               FROM g5 GROUP BY 1, 2, 3),
        d5 AS (SELECT doc_id,
                      round(coalesce(sum(CASE WHEN c >= 2
                          THEN c * length(g) END), 0)
                        / CAST(any_value(n_chars) AS DOUBLE), 4)
                        AS dup5_frac
               FROM c5 GROUP BY 1)
      SELECT a.doc_id, top2_gram,
             coalesce(top2_frac, 0.0) AS top2_frac,
             top3_gram,
             coalesce(top3_frac, 0.0) AS top3_frac,
             coalesce(dup5_frac, 0.0) AS dup5_frac,
             (coalesce(top2_frac, 0.0) <= 0.20
              AND coalesce(top3_frac, 0.0) <= 0.18
              AND coalesce(dup5_frac, 0.0) <= 0.15) AS keep
      FROM a LEFT JOIN t2 ON a.doc_id = t2.doc_id
             LEFT JOIN t3 ON a.doc_id = t3.doc_id
             LEFT JOIN d5 ON a.doc_id = d5.doc_id"""

  // ---------------------------------------------------- Zipf slope
  /** t27: ZIPF SLOPE PER SOURCE — log-log OLS of word frequency
    * against frequency rank, the corpus-statistics fingerprint every
    * data-quality report carries: natural language runs slope ≈ −1
    * (Zipf's law); machine-generated or template text flattens toward
    * 0 (near-uniform frequencies) and a slope drift between shards or
    * snapshots is a cheap distribution-shift alarm beside t16's
    * divergence test. Per source: word counts, rank by (count desc,
    * word) — the deterministic t26 tie-break — then the q119
    * closed-form OLS over (ln rank, ln count), slope/intercept on the
    * 4-dp grid with the fit size n_vocab. Single-word vocabularies
    * have a zero OLS denominator and emit NULL slope (both engines).
    *
    * Scale shape: one token explode into a (source, word) partial-
    * agg'd count — vocabulary-sized output however big the corpus —
    * then a source-partitioned rank window and a 5-double closed-form
    * aggregate, both on the vocabulary frame. No corpus-sized window,
    * no collect. */
  def zipfSlope(spark: SparkSession, sfDir: String): DataFrame =
    zipfSlopeOn(docs(spark, sfDir))

  /** [[zipfSlope]] over any (source, text) frame. */
  private[graft] def zipfSlopeOn(d: DataFrame): DataFrame = {
    val counts = d.select(col("source"), explode(toks(col("text"))).as("w"))
      .groupBy("source", "w").agg(count(lit(1)).as("c"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("c").desc, col("w"))
    val xy = counts.withColumn("rank", row_number().over(win))
      .select(col("source"),
        log(col("rank").cast("double")).as("x"),
        log(col("c").cast("double")).as("y"))
    xy.groupBy("source").agg(
      count(lit(1)).as("n_vocab"),
      sum("x").as("sx"), sum("y").as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"))
      // nullif on the OLS denominator: a single-word vocabulary has
      // den = 0, where Spark's IEEE double division would yield
      // Infinity but DuckDB's would not — NULL/NULL in both instead
      .withColumn("num",
        col("n_vocab") * col("sxy") - col("sx") * col("sy"))
      .withColumn("den", expr(
        "nullif(n_vocab * sxx - sx * sx, 0.0D)"))
      .select(col("source"), col("n_vocab"),
        round(col("num") / col("den"), 4).as("slope"),
        round((col("sy") - col("num") / col("den") * col("sx")) /
          col("n_vocab"), 4).as("intercept"))
  }

  /** t27's DuckDB twin: same counts, same (count desc, word) rank,
    * same closed-form OLS, same nullif'd denominator and 4-dp grid. */
  val zipfSlopeOracle: String =
    """WITH w AS (SELECT source, unnest(string_split(text, ' ')) AS w
                  FROM documents),
        c AS (SELECT source, w, count(*) AS c FROM w GROUP BY 1, 2),
        r AS (SELECT source,
                     ln(CAST(row_number() OVER (PARTITION BY source
                          ORDER BY c DESC, w) AS DOUBLE)) AS x,
                     ln(CAST(c AS DOUBLE)) AS y
              FROM c),
        s AS (SELECT source, count(*) AS n_vocab,
                     sum(x) AS sx, sum(y) AS sy,
                     sum(x * y) AS sxy, sum(x * x) AS sxx
              FROM r GROUP BY 1),
        f AS (SELECT source, n_vocab,
                     n_vocab * sxy - sx * sy AS num,
                     nullif(n_vocab * sxx - sx * sx, 0.0) AS den,
                     sx, sy
              FROM s)
      SELECT source, n_vocab,
             round(num / den, 4) AS slope,
             round((sy - num / den * sx) / n_vocab, 4) AS intercept
      FROM f"""

  // ------------------------------------------ trigram stupid backoff
  /** t28: TRIGRAM STUPID-BACKOFF SCORING (Brants et al. 2007 — the
    * web-scale LM scoring rule: no discounting to fit, just
    * count-ratio with a fixed 0.4 penalty per backoff level) — the
    * held-out sibling of t09/t13's in-corpus scorers: the model
    * (trigram/bigram/unigram count tables + total) is built from the
    * TRAIN sources (source ≠ 'src0') and SCORES the held-out src0
    * docs, so unseen grams actually occur and the backoff chain
    * genuinely fires (an in-corpus model scores its own trigrams —
    * every branch but the first is dead; the split is what makes
    * this the CCNet "score the new shard against the reference
    * corpus" shape). Per position: c3/c2p if the trigram is known,
    * else 0.4·c2/c1m, else 0.16·c1/T, else the 0.16/T OOV floor;
    * per doc the mean ln score and the backed-off fraction, both
    * 4 dp. Output (doc_id, logprob_bo, n_trigrams, bo_frac).
    *
    * Scale shape: counts are vocabulary-sized aggregates (the t09
    * argument); scoring is one struct-transform explode (map-side)
    * into five gram-keyed shuffle joins against those tables + one
    * per-doc agg. Model width is a data property, never a plan
    * change. */
  def trigramBackoff(spark: SparkSession, sfDir: String,
      heldOut: String = "src0"): DataFrame =
    trigramBackoffOn(docs(spark, sfDir), heldOut)

  /** [[trigramBackoff]] over any (doc_id, source, text) frame. */
  private[graft] def trigramBackoffOn(
      d0: DataFrame, heldOut: String): DataFrame = {
    val d = Persists.barrier(
      d0.select(col("doc_id"), col("source"), toks(col("text")).as("a")))
    val train = d.filter(col("source") =!= heldOut)
    def gramCounts(n: Int): DataFrame = train
      .filter(size(col("a")) >= n)
      .select(explode(expr(s"transform(sequence(1, size(a) - ${n - 1}), " +
        s"i -> concat_ws(' ', slice(a, i, $n)))")).as("g"))
      .groupBy("g").agg(count(lit(1)).as("c"))
    val t3 = gramCounts(3)
    val t2 = gramCounts(2)
    val t1 = gramCounts(1)
    val tot = t1.select(sum("c").as("t"))
    val pos = d.filter(col("source") === heldOut)
      .filter(size(col("a")) >= 3)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(a) - 2), i -> struct(
             concat_ws(' ', slice(a, i, 3)) AS k3,
             concat_ws(' ', slice(a, i, 2)) AS k2p,
             concat_ws(' ', slice(a, i + 1, 2)) AS k2,
             element_at(a, i + 1) AS k1m,
             element_at(a, i + 2) AS k1))""")).as("p"))
      .select(col("doc_id"), col("p.k3"), col("p.k2p"), col("p.k2"),
        col("p.k1m"), col("p.k1"))
    val scored = pos
      .join(t3.select(col("g").as("k3"), col("c").as("c3")), Seq("k3"), "left")
      .join(t2.select(col("g").as("k2p"), col("c").as("c2p")), Seq("k2p"), "left")
      .join(t2.select(col("g").as("k2"), col("c").as("c2")), Seq("k2"), "left")
      .join(t1.select(col("g").as("k1m"), col("c").as("c1m")), Seq("k1m"), "left")
      .join(t1.select(col("g").as("k1"), col("c").as("c1")), Seq("k1"), "left")
      .crossJoin(tot)
      .select(col("doc_id"),
        expr("""CASE WHEN coalesce(c3, 0) > 0
                     THEN ln(c3 / CAST(c2p AS DOUBLE))
                     WHEN coalesce(c2, 0) > 0
                     THEN ln(0.4 * (c2 / CAST(c1m AS DOUBLE)))
                     WHEN coalesce(c1, 0) > 0
                     THEN ln(0.16 * (c1 / CAST(t AS DOUBLE)))
                     ELSE ln(0.16 * (1.0 / CAST(t AS DOUBLE))) END""")
          .as("s"),
        expr("CASE WHEN coalesce(c3, 0) > 0 THEN 0 ELSE 1 END").as("bo"))
    scored.groupBy("doc_id").agg(
      round(avg("s"), 4).as("logprob_bo"),
      count(lit(1)).as("n_trigrams"),
      round(avg("bo"), 4).as("bo_frac"))
  }

  /** t28's DuckDB twin: the same train/held-out split, gram tables,
    * backoff CASE (0.4 / 0.16 constants verbatim), and 4-dp grids;
    * position keys come from five range-indexed CTEs joined on
    * (doc_id, pos) where Spark uses one struct explode. */
  val trigramBackoffOracle: String =
    """WITH d AS (SELECT doc_id, source, string_split(text, ' ') AS a
                  FROM documents),
        t3 AS (SELECT g, count(*) AS c FROM (
                 SELECT unnest(list_transform(range(1, len(a) - 1),
                   i -> array_to_string(a[i:i+2], ' '))) AS g
                 FROM d WHERE source <> 'src0' AND len(a) >= 3)
               GROUP BY g),
        t2 AS (SELECT g, count(*) AS c FROM (
                 SELECT unnest(list_transform(range(1, len(a)),
                   i -> array_to_string(a[i:i+1], ' '))) AS g
                 FROM d WHERE source <> 'src0' AND len(a) >= 2)
               GROUP BY g),
        t1 AS (SELECT g, count(*) AS c FROM (
                 SELECT unnest(a) AS g
                 FROM d WHERE source <> 'src0')
               GROUP BY g),
        tot AS (SELECT sum(c) AS t FROM t1),
        pos AS (SELECT doc_id, unnest(range(1, len(a) - 1)) AS i, a
                FROM d WHERE source = 'src0' AND len(a) >= 3),
        keys AS (SELECT doc_id, i,
                        array_to_string(a[i:i+2], ' ') AS k3,
                        array_to_string(a[i:i+1], ' ') AS k2p,
                        array_to_string(a[i+1:i+2], ' ') AS k2,
                        a[i+1] AS k1m, a[i+2] AS k1
                 FROM pos),
        scored AS (
          SELECT doc_id,
                 CASE WHEN coalesce(c3.c, 0) > 0
                      THEN ln(c3.c / CAST(c2p.c AS DOUBLE))
                      WHEN coalesce(c2.c, 0) > 0
                      THEN ln(0.4 * (c2.c / CAST(c1m.c AS DOUBLE)))
                      WHEN coalesce(c1.c, 0) > 0
                      THEN ln(0.16 * (c1.c / CAST(tot.t AS DOUBLE)))
                      ELSE ln(0.16 * (1.0 / CAST(tot.t AS DOUBLE))) END
                   AS s,
                 CASE WHEN coalesce(c3.c, 0) > 0 THEN 0 ELSE 1 END AS bo
          FROM keys
          LEFT JOIN t3 c3 ON c3.g = keys.k3
          LEFT JOIN t2 c2p ON c2p.g = keys.k2p
          LEFT JOIN t2 c2 ON c2.g = keys.k2
          LEFT JOIN t1 c1m ON c1m.g = keys.k1m
          LEFT JOIN t1 c1 ON c1.g = keys.k1
          CROSS JOIN tot)
      SELECT doc_id, round(avg(s), 4) AS logprob_bo,
             count(*) AS n_trigrams, round(avg(bo), 4) AS bo_frac
      FROM scored GROUP BY doc_id"""

  /** t29: TOKEN-MASS CONCENTRATION per source — the dataset-card
    * inequality telemetry (who owns the tokens?): per source, the
    * Gini coefficient of per-doc token counts (0 = every doc equal,
    * → 1 = a few docs hold all mass) from the classic sorted-rank
    * identity G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n, plus the token share
    * of the top decile of docs (⌈n/10⌉ by count, id tie-break). A
    * mix schedule (c16/c31) that balances DOC counts across sources
    * still under-trains a source whose tokens sit in its tail — this
    * is the report that catches it.
    *
    * All-integer until the two final divisions (rank·count products
    * are exact bigints), so both engines divide identical integers —
    * no float-sum jitter anywhere. Scale shape: one per-source
    * window sort of the doc-count frame (docs, not tokens), then a
    * partial-agg'd rollup to |sources| rows. */
  def giniConcentration(spark: SparkSession, sfDir: String): DataFrame =
    giniConcentrationOn(Tables.load(spark, sfDir, "documents")
      .select(col("source"), col("doc_id"),
        size(toks(col("text"))).cast("long").as("x")))

  /** [[giniConcentration]] over any (source, doc_id, x) count frame. */
  private[graft] def giniConcentrationOn(d: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bySrc = Window.partitionBy("source")
    val ranked = d
      .withColumn("i", row_number().over(
        bySrc.orderBy(col("x").asc, col("doc_id").asc)).cast("long"))
      .withColumn("rd", row_number().over(
        bySrc.orderBy(col("x").desc, col("doc_id").asc)).cast("long"))
      .withColumn("n", count(lit(1)).over(bySrc))
    ranked.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("x").as("total_tokens"),
        sum(col("i") * col("x")).as("ix"),
        sum(when(col("rd") <= expr("(n + 9) div 10"), col("x"))
          .otherwise(lit(0L))).as("top_x"))
      .select(col("source"), col("n_docs"), col("total_tokens"),
        round(lit(2.0) * col("ix") / (col("n_docs") * col("total_tokens"))
          - (col("n_docs") + lit(1.0)) / col("n_docs"), 6).as("gini"),
        round(col("top_x").cast("double") / col("total_tokens"), 6)
          .as("top_decile_share"))
  }

  /** t29's DuckDB twin: same rank windows, same integer top-decile
    * cutoff, same two divisions on the 6-dp grid. */
  private val giniOracle: String =
    """WITH d AS (
         SELECT source, doc_id,
                CAST(len(string_split(text, ' ')) AS BIGINT) AS x
         FROM documents),
       r AS (SELECT source, x,
                    row_number() OVER (PARTITION BY source
                                       ORDER BY x, doc_id) AS i,
                    row_number() OVER (PARTITION BY source
                                       ORDER BY x DESC, doc_id) AS rd,
                    count(*) OVER (PARTITION BY source) AS n
             FROM d)
      SELECT source, count(*) AS n_docs,
             CAST(sum(x) AS BIGINT) AS total_tokens,
             round(2.0 * CAST(sum(i * x) AS DOUBLE)
                     / (count(*) * CAST(sum(x) AS DOUBLE))
                   - (count(*) + 1.0) / CAST(count(*) AS DOUBLE), 6)
               AS gini,
             round(CAST(sum(CASE WHEN rd <= (n + 9) // 10
                                 THEN x ELSE 0 END) AS DOUBLE)
                   / CAST(sum(x) AS DOUBLE), 6) AS top_decile_share
      FROM r GROUP BY source"""

  /** t34: SOURCE VOCABULARY-OVERLAP MATRIX — the pairwise top-100
    * vocabulary Jaccard between sources: the dataset-similarity
    * input a mix designer reads BEFORE setting c16/c31 weights (two
    * near-identical sources shouldn't both get full weight), and the
    * cross-SOURCE companion of t16's cross-shard divergence. Top-k
    * per source by (count desc, word) — a total order — then one
    * word-keyed self-join over the k·|sources| frame;
    * |∪| = 2k − |∩| exactly because both sides are size-k sets, so
    * the quotient is all-integer until the 6-dp division.
    *
    * Scale shape: the corpus pays one token count; everything after
    * runs on the bounded top-k frame (never a corpus self-join). */
  def vocabOverlap(spark: SparkSession, sfDir: String,
      k: Int = 100): DataFrame =
    vocabOverlapOn(Tables.load(spark, sfDir, "documents"), k)

  /** [[vocabOverlap]] over any (source, text) frame. */
  private[graft] def vocabOverlapOn(docs: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = docs
      .select(col("source"), explode(toks(col("text"))).as("w"))
      .groupBy("source", "w").agg(count(lit(1)).as("c"))
    val win = Window.partitionBy("source")
      .orderBy(col("c").desc, col("w"))
    val top = Persists.barrier(counts
      .withColumn("rk", row_number().over(win))
      .filter(col("rk") <= k).select("source", "w"))
    top.as("a").join(top.as("b"),
        col("a.w") === col("b.w") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("n_common"))
      .select(col("src_a"), col("src_b"), col("n_common"),
        round(col("n_common") /
          (lit(2.0 * k) - col("n_common")), 6).as("jaccard"))
  }

  /** t34's DuckDB twin: same (count desc, word) top-k, same
    * intersect join, same 2k − n union algebra. */
  private def vocabOverlapOracle(k: Int): String =
    s"""WITH c AS (
          SELECT source, unnest(string_split(text, ' ')) AS w
          FROM documents),
        n AS (SELECT source, w, count(*) AS c FROM c GROUP BY 1, 2),
        t AS (SELECT source, w FROM (
                SELECT source, w,
                       row_number() OVER (PARTITION BY source
                         ORDER BY c DESC, w) AS rk
                FROM n) WHERE rk <= $k)
      SELECT a.source AS src_a, b.source AS src_b,
             count(*) AS n_common,
             round(count(*) / (${2.0 * k} - count(*)), 6) AS jaccard
      FROM t a JOIN t b ON a.w = b.w AND a.source < b.source
      GROUP BY 1, 2"""

  /** t33: TEXT CANONICALIZATION — the normalization layer exact
    * dedup should key on (raw-byte equality misses trivial variants):
    * lowercase, strip everything outside `[a-z0-9 ]`, collapse
    * whitespace runs, trim; emit the canonical md5 plus a `changed`
    * flag marking docs the normalization actually moved. d01 keyed on
    * this hash collapses case/punctuation variants the raw-md5 key
    * treats as distinct. The gate plants three variant classes by
    * doc-id (uppercase, trailing punctuation, leading whitespace —
    * the q94/m14 pollution discipline: this corpus is already
    * canonical, and the planted classes must land on the SAME hash
    * as their clean text, provably collapsing). Pure shared-regex
    * string algebra — one narrow codegen'd map, no shuffle. */
  def canonicalize(spark: SparkSession, sfDir: String): DataFrame =
    canonicalizeOn(Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), expr(
        """CASE WHEN doc_id % 6 = 0 THEN upper(text)
                WHEN doc_id % 6 = 1 THEN concat(text, '!!')
                WHEN doc_id % 6 = 2 THEN concat('  ', text)
                ELSE text END""").as("text")))

  /** The t33 normalize+hash stage over any (doc_id, text) frame. */
  private[graft] def canonicalizeOn(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("text"),
        expr("""trim(regexp_replace(
                  regexp_replace(lower(text), '[^a-z0-9 ]', ' '),
                  ' +', ' '))""").as("canonical"))
      .select(col("doc_id"), md5(col("canonical")).as("canonical_hash"),
        (col("canonical") =!= col("text")).as("changed"),
        length(col("canonical")).cast("long").as("canonical_len"))

  /** t33's DuckDB twin: same planted classes, same two regex passes,
    * same trim, same md5 and changed flag. */
  private[graft] val canonicalizeOracle: String =
    """WITH p AS (
         SELECT doc_id,
                CASE WHEN doc_id % 6 = 0 THEN upper(text)
                     WHEN doc_id % 6 = 1 THEN text || '!!'
                     WHEN doc_id % 6 = 2 THEN '  ' || text
                     ELSE text END AS text
         FROM documents),
       c AS (
         SELECT doc_id, text,
                trim(regexp_replace(
                  regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                  ' +', ' ', 'g')) AS canonical
         FROM p)
      SELECT doc_id, md5(canonical) AS canonical_hash,
             (canonical <> text) AS changed,
             CAST(length(canonical) AS BIGINT) AS canonical_len
      FROM c"""

  /** The t35 HTML fixture plant — ONE SQL string both engines run
    * over `documents` (the t33/c35 plant discipline): every doc
    * wrapped in a realistic page shell with the four boilerplate
    * classes a web-corpus extractor must drop (head/title + CSS,
    * a nav menu, inline script, a footer) and an entity in the
    * heading so decode is exercised. */
  private val HtmlPlant: String =
    """'<html><head><title>Doc ' || doc_id || '</title>' ||
       '<style>body{margin:0;color:#333}</style></head><body>' ||
       '<nav><a href="/">Home</a> | <a href="/about">About</a></nav>' ||
       '<h1>Doc ' || doc_id || ' &amp; notes</h1><p>' || text ||
       '</p><script>var t=1;</script>' ||
       '<footer>(c) Example Corp</footer></body></html>'"""

  /** t35: HTML / BOILERPLATE TEXT EXTRACTION — the markup-strip +
    * boilerplate-removal pass every web-corpus pipeline runs BEFORE
    * any text analysis (the trafilatura/WET step; VERDICT r11
    * "what's missing" #3): drop non-content containers wholesale
    * (head, script, style, nav, footer — navigation chrome and code
    * are not training text), strip the remaining tags, decode the
    * common entities, collapse whitespace. Output (doc_id, clean,
    * n_raw, n_clean) over the planted page shell — hash-gated, so
    * the extraction algebra is engine-exact, and HtmlExtractSpec
    * pins that extraction moves the downstream quality signals
    * (t01/t08) that raw markup poisons.
    *
    * Scale shape: one narrow codegen'd regex map over the corpus —
    * no shuffle, no UDF; exactly the t33 canonicalization shape. */
  def htmlExtract(spark: SparkSession, sfDir: String): DataFrame =
    htmlExtractOn(htmlPlanted(Tables.load(spark, sfDir, "documents")))

  /** The t35 page-shell plant over any (doc_id, text) frame — shared
    * by the batch gate form and the q151 streaming ingest twin. */
  private[graft] def htmlPlanted(d: DataFrame): DataFrame =
    d.select(col("doc_id"), expr(HtmlPlant).as("html"))

  /** The t35 extraction stage over any (doc_id, html) frame: five
    * sequential container drops (RE2 lacks backreferences, so the
    * chain is spelled per-container IDENTICALLY in both engines —
    * never an alternation-with-\1 on one side), tag strip, entity
    * decode, whitespace collapse (' +': every removal inserts a
    * plain space and the corpus text is single-space-joined, the
    * t33 discipline that keeps the collapse regex escape-free). */
  private[graft] def htmlExtractOn(d: DataFrame): DataFrame =
    d.select(col("doc_id"), col("html"),
        expr("""trim(regexp_replace(
            replace(replace(replace(replace(replace(
              regexp_replace(
              regexp_replace(
              regexp_replace(
              regexp_replace(
              regexp_replace(
              regexp_replace(html,
                '(?s)<head[^>]*>.*?</head>', ' '),
                '(?s)<script[^>]*>.*?</script>', ' '),
                '(?s)<style[^>]*>.*?</style>', ' '),
                '(?s)<nav[^>]*>.*?</nav>', ' '),
                '(?s)<footer[^>]*>.*?</footer>', ' '),
              '<[^>]*>', ' '),
              '&amp;', '&'), '&lt;', '<'), '&gt;', '>'),
              '&quot;', '"'), '&nbsp;', ' '),
            ' +', ' '))""").as("clean"))
      .select(col("doc_id"), col("clean"),
        length(col("html")).cast("long").as("n_raw"),
        length(col("clean")).cast("long").as("n_clean"))

  /** t35's DuckDB twin: same plant, same per-container drop chain,
    * same tag-strip / entity-decode / collapse. */
  private[graft] val htmlExtractOracle: String =
    s"""WITH p AS (SELECT doc_id, $HtmlPlant AS html FROM documents),
       c AS (
         SELECT doc_id, html,
                trim(regexp_replace(
                  replace(replace(replace(replace(replace(
                    regexp_replace(
                    regexp_replace(
                    regexp_replace(
                    regexp_replace(
                    regexp_replace(
                    regexp_replace(html,
                      '(?s)<head[^>]*>.*?</head>', ' ', 'g'),
                      '(?s)<script[^>]*>.*?</script>', ' ', 'g'),
                      '(?s)<style[^>]*>.*?</style>', ' ', 'g'),
                      '(?s)<nav[^>]*>.*?</nav>', ' ', 'g'),
                      '(?s)<footer[^>]*>.*?</footer>', ' ', 'g'),
                    '<[^>]*>', ' ', 'g'),
                  '&amp;', '&'), '&lt;', '<'), '&gt;', '>'),
                  '&quot;', '"'), '&nbsp;', ' '),
                ' +', ' ', 'g')) AS clean
         FROM p)
      SELECT doc_id, clean,
             CAST(length(html) AS BIGINT) AS n_raw,
             CAST(length(clean) AS BIGINT) AS n_clean
      FROM c"""

  /** t32: RAKE KEYWORD EXTRACTION (Rose et al. 2010) — the
    * dictionary-free keyphrase miner: candidate phrases are the
    * maximal stopword-free runs (split on the shared stopword list
    * with word boundaries), each word scores deg/freq over the doc's
    * phrase set (deg = Σ lengths of phrases containing it, freq =
    * its phrase occurrences — long words embedded in long phrases
    * win), and a phrase scores the sum of its word scores; top-3
    * distinct phrases per doc by (score desc, phrase). Word scores
    * are exact-integer quotients on the 4-dp grid; the phrase sum
    * re-rounds values whose TRUE total is already a grid multiple,
    * so summation order cannot move it.
    *
    * Scale shape: explode to (doc, phrase, word), two doc-keyed aggs
    * and one top-k window — all partial-agg'd, corpus-linear. */
  def rakeKeywords(spark: SparkSession, sfDir: String, k: Int = 3): DataFrame =
    rakeKeywordsOn(Tables.load(spark, sfDir, "documents"), k)

  /** [[rakeKeywords]] over any (doc_id, text) frame. */
  private[graft] def rakeKeywordsOn(docs: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val stopAlt = stopwords.mkString("|")
    val phrases = docs
      .select(col("doc_id"), explode(expr(
        s"""filter(transform(
              split(regexp_replace(text, '\\\\b($stopAlt)\\\\b', '|'),
                    '[|]'),
              p -> trim(p)), p -> p <> '')""")).as("phrase"))
      .distinct()
    val pw = Persists.barrier(phrases
      .withColumn("ws", split(col("phrase"), " +"))
      .select(col("doc_id"), col("phrase"),
        size(col("ws")).cast("long").as("plen"),
        explode(col("ws")).as("word")))
    val wordScore = pw.groupBy("doc_id", "word")
      .agg(round(sum("plen").cast("double") / count(lit(1)), 4)
        .as("wscore"))
    val phraseScore = pw.join(wordScore, Seq("doc_id", "word"))
      .groupBy("doc_id", "phrase")
      .agg(round(sum("wscore"), 4).as("score"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("phrase").asc)
    phraseScore.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("doc_id", "rank", "phrase", "score")
  }

  /** t32's DuckDB twin: same boundary-split phrases, same deg/freq
    * quotients and grid sums, same (score desc, phrase) top-3. */
  private def rakeOracle: String = {
    val stopAlt = stopwords.mkString("|")
    s"""WITH ph AS (
          SELECT DISTINCT doc_id, p AS phrase
          FROM (SELECT doc_id,
                       trim(unnest(string_split_regex(
                         regexp_replace(text, '\\b($stopAlt)\\b', '|',
                                        'g'),
                         '[|]'))) AS p
                FROM documents)
          WHERE p <> ''),
        pw AS (
          SELECT doc_id, phrase,
                 CAST(len(string_split_regex(phrase, ' +')) AS BIGINT)
                   AS plen,
                 unnest(string_split_regex(phrase, ' +')) AS word
          FROM ph),
        ws AS (
          SELECT doc_id, word,
                 round(CAST(sum(plen) AS DOUBLE) / count(*), 4) AS wscore
          FROM pw GROUP BY 1, 2),
        ps AS (
          SELECT pw.doc_id, pw.phrase, round(sum(ws.wscore), 4) AS score
          FROM pw JOIN ws ON ws.doc_id = pw.doc_id AND ws.word = pw.word
          GROUP BY 1, 2),
        r AS (
          SELECT doc_id, phrase, score,
                 CAST(row_number() OVER (PARTITION BY doc_id
                   ORDER BY score DESC, phrase) AS INTEGER) AS rank
          FROM ps)
      SELECT doc_id, rank, phrase, score FROM r WHERE rank <= 3"""
  }

  /** t31: ENCODING-CLEANLINESS AUDIT — the first cleaning pass every
    * ingest runs: per doc, counts of CONTROL characters (C0/DEL minus
    * tab/LF/CR), U+FFFD replacement characters (the mojibake
    * tombstone a lossy transcode leaves), the non-ASCII character
    * ratio, and a clean flag (no control, no tombstone, ratio ≤ 0.3).
    * The gate plants both pollution classes by doc-id (the q94/m14
    * discipline: the corpus is clean ASCII, so an un-planted audit
    * would rubber-stamp zeros instead of provably DETECTING).
    * Character classes are shared `[\\x..]` ranges with identical
    * Java-regex/RE2 semantics; counts are characters, not bytes, in
    * both engines.
    *
    * Scale shape: one narrow codegen'd map over text into a doc-sized
    * report — no shuffle. */
  def encodingAudit(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), expr(
        s"""CASE WHEN doc_id % 7 = 0 THEN concat(text, chr(7))
                 WHEN doc_id % 7 = 1 THEN concat(text, '$Tombstone')
                 ELSE text END""").as("t"))
      .select(col("doc_id"),
        size(expr(s"regexp_extract_all(t, '$ControlClass', 0)"))
          .cast("long").as("n_control"),
        size(expr(s"regexp_extract_all(t, '$Tombstone', 0)"))
          .cast("long").as("n_replacement"),
        round(size(expr("regexp_extract_all(t, '[^\\\\x00-\\\\x7F]', 0)"))
          .cast("double") / length(col("t")), 6).as("non_ascii_ratio"))
      .withColumn("clean",
        col("n_control") === 0 && col("n_replacement") === 0 &&
          col("non_ascii_ratio") <= 0.3)

  /** C0 controls + DEL, excluding tab/LF/CR (legitimate whitespace). */
  private val ControlClass =
    "[\\\\x00-\\\\x08\\\\x0B\\\\x0C\\\\x0E-\\\\x1F\\\\x7F]"

  /** U+FFFD, embedded literally so both engines see the same char. */
  private val Tombstone = "�"

  /** t31's DuckDB twin: same planted classes, same character-class
    * regexes, same character-counted ratio and clean predicate. */
  private val encodingAuditOracle: String =
    s"""WITH p AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 7 = 0 THEN text || chr(7)
                      WHEN doc_id % 7 = 1 THEN text || '$Tombstone'
                      ELSE text END AS t
          FROM documents),
        c AS (
          SELECT doc_id,
                 CAST(len(regexp_extract_all(t,
                   '${ControlClass.replace("\\\\", "\\")}')) AS BIGINT)
                   AS n_control,
                 CAST(len(regexp_extract_all(t, '$Tombstone')) AS BIGINT)
                   AS n_replacement,
                 round(CAST(len(regexp_extract_all(t, '[^\\x00-\\x7F]'))
                         AS DOUBLE) / length(t), 6) AS non_ascii_ratio
          FROM p)
      SELECT doc_id, n_control, n_replacement, non_ascii_ratio,
             (n_control = 0 AND n_replacement = 0
              AND non_ascii_ratio <= 0.3) AS clean
      FROM c"""

  /** t30: FLESCH-KINCAID READABILITY (Kincaid et al. 1975) — the
    * grade-level quality feature CCNet-style filters bin on:
    * 0.39·(words/sentences) + 11.8·(syllables/word) − 15.59, with
    * syllables approximated as VOWEL GROUPS (`[aeiouy]+` runs — the
    * standard dictionary-free heuristic) and sentences as
    * `[.!?]` terminators floored at 1 (the synthetic corpus is
    * unpunctuated, so every doc reads as one sentence — the floor is
    * explicit in both engines, not an accident of the data). Both
    * regexes are shared character classes with identical semantics
    * under Java regex and RE2. Output (doc_id, n_words, n_sentences,
    * n_syllables, fk_grade), grade on the 4-dp grid.
    *
    * Scale shape: one narrow codegen'd map over the text column into
    * a doc-sized frame — no shuffle at all. */
  def fleschKincaid(spark: SparkSession, sfDir: String): DataFrame =
    fleschKincaidOn(Tables.load(spark, sfDir, "documents"))

  /** [[fleschKincaid]] over any (doc_id, text) frame. */
  private[graft] def fleschKincaidOn(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        size(toks(col("text"))).cast("long").as("n_words"),
        greatest(size(expr("regexp_extract_all(text, '[.!?]', 0)"))
          .cast("long"), lit(1L)).as("n_sentences"),
        size(expr("regexp_extract_all(lower(text), '[aeiouy]+', 0)"))
          .cast("long").as("n_syllables"))
      .withColumn("fk_grade", round(
        lit(0.39) * col("n_words") / col("n_sentences") +
          lit(11.8) * col("n_syllables") / col("n_words") - lit(15.59), 4))

  /** t30's DuckDB twin: same token/terminator/vowel-group counts,
    * same floored sentence divisor, same 4-dp grade. */
  private val fleschKincaidOracle: String =
    """SELECT doc_id,
              CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
              greatest(CAST(len(regexp_extract_all(text, '[.!?]'))
                         AS BIGINT), 1) AS n_sentences,
              CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                AS BIGINT) AS n_syllables,
              round(0.39 * len(string_split(text, ' '))
                      / greatest(len(regexp_extract_all(text, '[.!?]')), 1)
                    + 11.8 * len(regexp_extract_all(lower(text),
                                                    '[aeiouy]+'))
                      / len(string_split(text, ' '))
                    - 15.59, 4) AS fk_grade
       FROM documents"""

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t31_encoding_audit" -> (encodingAudit _),
    "t32_rake_keywords" -> ((s: SparkSession, d: String) =>
      rakeKeywords(s, d)),
    "t33_canonicalize" -> (canonicalize _),
    "t34_vocab_overlap" -> ((s: SparkSession, d: String) =>
      vocabOverlap(s, d)),
    "t35_html_extract" -> (htmlExtract _),
    "t30_flesch_kincaid" -> (fleschKincaid _),
    "t29_gini_concentration" -> (giniConcentration _),
    "t28_trigram_backoff" -> ((s: SparkSession, d: String) =>
      trigramBackoff(s, d)),
    "t27_zipf_slope" -> (zipfSlope _),
    "t26_gopher_repetition" -> (gopherRepetition _),
    "t25_langid_margin" -> (langIdMargin _),
    "t24_fertility_by_lang" -> (fertilityByLang _),
    "t23_quality_tiers" -> (qualityTiers _),
    "t22_quality_classifier" -> (qualityClassifier _),
    "t21_phrase_search" -> (phraseSearch _),
    "t17_ngram_novelty" -> (ngramNovelty _),
    "t16_shard_divergence" -> (shardDivergence _),
    "t12_heavy_hitters" -> ((s: SparkSession, d: String) => heavyHitters(s, d)),
    // rows-only (no oracleSql entry): est is sketch-internal; the CMS
    // bound vs t12's exact counts is CmsServeSpec's contract
    "t14_cms_serve" -> ((s: SparkSession, d: String) => cmsServe(s, d)),
    // rows-only like t14; CmsServeSpec asserts t15 == t14 exactly
    "t15_cms_incremental" -> ((s: SparkSession, d: String) => cmsIncremental(s, d)),
    "t13_bigram_logprob" -> (bigramLogprob _),
    "t09_unigram_logprob" -> (unigramLogprob _),
    "t18_langid_model" -> (langIdModel _),
    "t08_repetition" -> (repetition _),
    "t07_tfidf" -> ((s: SparkSession, d: String) => tfidfTopTerms(s, d)),
    "t01_quality" -> qualityStats _,
    "t02_tokens" -> tokenCounts _,
    "t03_fingerprint_md5" -> ((spark: SparkSession, sfDir: String) => {
      Tables.registerAll(spark, sfDir); spark.sql(fingerprintMd5Sql)
    }),
    "t04_fingerprint_rolling" -> fingerprintRolling _,
    "t05_langid" -> langId _,
    "t06_subwords" -> subwordCounts _
  )

  val subwordOracle: String =
    """SELECT doc_id,
              CAST(len(flatten(list_transform(string_split(text, ' '),
                     w -> regexp_extract_all(w, '.{1,4}', 0)))) AS INTEGER)
                AS n_subwords
       FROM documents"""

  def oracleSql: Map[String, String] = Map(
    "t31_encoding_audit" -> encodingAuditOracle,
    "t32_rake_keywords" -> rakeOracle,
    "t33_canonicalize" -> canonicalizeOracle,
    "t34_vocab_overlap" -> vocabOverlapOracle(100),
    "t35_html_extract" -> htmlExtractOracle,
    "t30_flesch_kincaid" -> fleschKincaidOracle,
    "t29_gini_concentration" -> giniOracle,
    "t28_trigram_backoff" -> trigramBackoffOracle,
    "t27_zipf_slope" -> zipfSlopeOracle,
    "t26_gopher_repetition" -> gopherRepetitionOracle,
    "t25_langid_margin" -> langIdMarginOracle,
    "t24_fertility_by_lang" -> fertilityOracle,
    "t23_quality_tiers" -> qualityTiersOracle,
    "t22_quality_classifier" -> qualityClassifierOracle,
    "t21_phrase_search" -> phraseSearchOracle,
    "t17_ngram_novelty" -> ngramNoveltyOracle,
    "t16_shard_divergence" -> shardDivergenceOracle,
    "t12_heavy_hitters" -> heavyHittersOracle,
    "t13_bigram_logprob" -> bigramOracle,
    "t09_unigram_logprob" -> unigramOracle,
    "t18_langid_model" -> langIdModelOracle,
    "t08_repetition" -> repetitionOracle,
    "t01_quality" -> qualityOracle,
    "t02_tokens" -> tokenOracle,
    "t03_fingerprint_md5" -> fingerprintMd5Sql,
    "t04_fingerprint_rolling" -> fingerprintRollingOracle,
    "t05_langid" -> langIdOracle,
    "t06_subwords" -> subwordOracle,
    "t07_tfidf" -> tfidfOracle
  )
}

/** Shingling helpers shared by text fingerprinting and MinHash dedup.
  * Backed by the native [[graft.functions.WordShingles]] expression;
  * callers must have run GraftFunctions.register on the session. */
/** Engine-PORTABLE content hash: the first `chars` hex characters of
  * md5, packed into an integer by ascii codes. The generated SQL uses
  * only `ascii` / `substr` / `md5` — identical text evaluates
  * identically in Spark and DuckDB, so operators built on it are
  * oracle-checkable end-to-end (each engine's native 64-bit hash —
  * xxhash64 / hash — is absent from the other). chars = 8 packs into a
  * 56-bit-weighted long (max Σ ascii·256^i ≈ 7.4e18 < 2^63, ANSI-safe). */
object PortableHash {
  def packed(sqlExpr: String, chars: Int = 8): String = {
    require(chars >= 1 && chars <= 8, s"chars must be 1..8, got $chars")
    (0 until chars).map { i =>
      val w = 1L << (8 * (chars - 1 - i))
      s"ascii(substr(md5($sqlExpr), ${i + 1}, 1)) * $w"
    }.mkString("(", " + ", ")")
  }
}

object Shingles {
  /** Array of DISTINCT `k`-word shingles (space-rejoined) over column
    * `colName`; docs shorter than k words yield the whole text as one
    * shingle. */
  def wordShingles(colName: String, k: Int): Column =
    expr(s"graft_shingles($colName, $k)")
}
