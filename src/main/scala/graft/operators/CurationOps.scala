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
    * form — which is exactly what the plain-SQL DuckDB oracle asserts.
    *
    * The default k = 15 sits below the smallest gate corpus's 25 docs
    * per source (20 sources at sf0.01), so the quota actually PRUNES at
    * every verification SF — a default that keeps everything verifies
    * only the no-op path. */
  def sourceQuota(
      spark: SparkSession, sfDir: String, k: Int = 15): DataFrame =
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
  def pipeline(spark: SparkSession, sfDir: String, k: Int = 10): DataFrame = {
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
      minShared: Int = 1): DataFrame =
    decontaminateOn(docs(spark, sfDir), evalSource, shingleK, minShared)

  /** [[decontaminate]] over any (doc_id, source, text) frame. */
  private[graft] def decontaminateOn(
      d: DataFrame, evalSource: String, shingleK: Int = 8,
      minShared: Int = 1): DataFrame = {
    val (evalSh, trainSh) = shingleSidesOn(d, evalSource, shingleK)
    trainSh.join(broadcast(evalSh), "key")
      .groupBy("train_id", "eval_id")
      .agg(countDistinct("key").as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** The exploded (doc, shingle) sides of the decontamination join —
    * ONE definition of the tokenization shared by [[decontaminate]]
    * and [[decontaminateBloom]], so both forms answer under the same
    * c04 oracle. */
  private[graft] def shingleSides(
      spark: SparkSession, sfDir: String,
      evalSource: String, shingleK: Int): (DataFrame, DataFrame) =
    shingleSidesOn(docs(spark, sfDir), evalSource, shingleK)

  private[graft] def shingleSidesOn(
      d0: DataFrame, evalSource: String,
      shingleK: Int): (DataFrame, DataFrame) = {
    graft.functions.GraftFunctions.register(d0.sparkSession)
    val d = d0.select(col("doc_id"), col("source"),
      Shingles.wordShingles("text", shingleK).as("sh"))
    val evalSh = d.filter(col("source") === evalSource)
      .select(col("doc_id").as("eval_id"), explode(col("sh")).as("key"))
    val trainSh = d.filter(col("source") =!= evalSource)
      .select(col("doc_id").as("train_id"), explode(col("sh")).as("key"))
    (evalSh, trainSh)
  }

  /** c12: [[decontaminate]] for the regime where the eval side has
    * outgrown the broadcast-HASH-join budget (c04 broadcasts it
    * whole). A multi-benchmark eval suite's exploded shingle set can
    * run to billions of keys — tens of GB as a hash relation, but
    * ~1.2 MB per million keys as a Bloom filter at 1% FP. So: build
    * `graft_bloom_agg` over the eval keys (partial-agg, one sketch
    * per partition crosses the shuffle), attach the 1-row sketch to
    * the train side (broadcast scalar attach), and prefilter
    * row-locally INSIDE the scan's codegen span — only true matches
    * plus ≤fpp of the rest ever reach the exact join, which here is
    * deliberately hint-free (sort-merge under the degraded regime):
    * the shuffle carries the candidate sliver, not the corpus's
    * exploded shingle stream. Bloom false positives are dropped by
    * the exact join; false negatives are impossible — so the result
    * is hash-identical to c04 and the gate runs c04's oracle
    * VERBATIM (BloomPrefilterSpec measures the pruning itself). */
  def decontaminateBloom(
      spark: SparkSession, sfDir: String,
      evalSource: String = "src0", shingleK: Int = 8,
      minShared: Int = 1, fpp: Double = 0.01): DataFrame = {
    val (evalShRaw, trainSh) = shingleSides(spark, sfDir, evalSource, shingleK)
    // the eval-side explode has THREE consumers (the sizing count, the
    // sketch build, and the final exact join) — barrier it so all
    // three share one materialization instead of re-tokenizing the
    // eval corpus per consumer
    val evalSh = Persists.barrier(evalShRaw)
    // sizing pass on the SMALL side only (pre-distinct row count is a
    // safe upper bound for distinct keys)
    val nEval = math.max(1L, evalSh.count())
    val bf = evalSh.agg(
      expr(s"graft_bloom_agg(key, ${nEval}L, CAST($fpp AS DOUBLE))").as("bf"))
    val candidates = trainSh
      .crossJoin(broadcast(bf)) // 1-row scalar attach
      .filter(expr("graft_bloom_contains(bf, key)"))
      .drop("bf")
    candidates.join(evalSh, "key")
      .groupBy("train_id", "eval_id")
      .agg(countDistinct("key").as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  // ------------------------------------------------------ PII redaction
  /** Regex families shared VERBATIM between Spark (Java regex) and the
    * DuckDB oracle (RE2) — restricted to the common dialect (character
    * classes, bounded repeats; no lookarounds, no \d shorthand). */
  val emailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
  val ipPat = "([0-9]{1,3}[.]){3}[0-9]{1,3}"
  val phonePat = "[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** A deterministic PII-bearing text derived from (doc_id, text) —
    * engine-neutral SQL (|| concat, lpad, CASE), so both engines build
    * byte-identical inputs: the corpus text itself is digit-free, which
    * would make a redaction pass a no-op and verify nothing. Docs get
    * an email unless doc_id%3=0, an IP when doc_id%2=0, and a phone
    * unless doc_id%5=0 — so the per-doc match counts actually vary. */
  private val piiTextSql =
    """text
       || CASE WHEN doc_id % 3 = 0 THEN ''
               ELSE ' mail u' || doc_id || '@ex' || (doc_id % 7) || '.org' END
       || CASE WHEN doc_id % 2 = 0
               THEN ' host 10.' || (doc_id % 256) || '.0.' || (doc_id % 100)
               ELSE '' END
       || CASE WHEN doc_id % 5 = 0 THEN ''
               ELSE ' tel 555-' || lpad('' || (doc_id % 1000), 3, '0')
                    || '-' || lpad('' || (doc_id % 10000), 4, '0') END"""

  /** PII redaction: scrub emails → <EMAIL>, IPv4 → <IP>, phone numbers
    * → <PHONE> (that order: the IP pass must not see digits an email
    * consumed), and count each family. One narrow codegen'd projection
    * — regexp_replace/regexp_extract_all are native Catalyst
    * expressions, no UDF, no shuffle; at 100 TB this is a pure map
    * stage bounded by scan throughput. */
  def piiRedact(spark: SparkSession, sfDir: String): DataFrame = {
    // counts are taken on the SAME intermediate text each sequential
    // pass redacts (email on the original, IP after email redaction,
    // phone after both) — counting every family on the original would
    // report matches a prior pass already consumed (e.g. the IP-shaped
    // tail of 'user@10.1.2.3.com'), disagreeing with `clean`
    val afterEmail = s"regexp_replace(($piiTextSql), '$emailPat', '<EMAIL>')"
    val afterIp = s"regexp_replace($afterEmail, '$ipPat', '<IP>')"
    docs(spark, sfDir).selectExpr(
      "doc_id",
      s"regexp_replace($afterIp, '$phonePat', '<PHONE>') AS clean",
      s"size(regexp_extract_all(($piiTextSql), '$emailPat', 0)) AS n_email",
      s"size(regexp_extract_all($afterEmail, '$ipPat', 0)) AS n_ip",
      s"size(regexp_extract_all($afterIp, '$phonePat', 0)) AS n_phone")
  }

  // ------------------------------------------- stratified hash sampling
  /** Per-stratum sampling rates as HEX-PREFIX thresholds: lowercase hex
    * compares lexically in digit order, so `substr(md5(text),1,2) <
    * '80'` keeps exactly the 128/256 half of content-hash space — the
    * deterministic analog of bernoulli sampling, portable to any engine
    * with md5. 'zz' sorts above every hex digit = keep-all. */
  val langRates: Seq[(String, String)] =
    Seq("en" -> "80", "es" -> "zz", "de" -> "zz", "fr" -> "zz", "zh" -> "c0")

  /** Deterministic stratified sampling — the training-mix step that
    * downsamples over-represented strata (here: keep 50% of 'en', 75%
    * of 'zh', all of the rest). Content-hash thresholds, not rand():
    * re-runs, engines, and partitionings all select the SAME rows, and
    * exact duplicates sample identically (they share a hash), so the
    * mix can't silently diverge between pipeline runs. A codegen'd
    * filter, no shuffle. */
  /** The c07 keep-predicate as ONE engine-neutral SQL string — shared
    * by the batch operator, the DuckDB oracle, and the streaming form
    * (q55), so the three can never drift. */
  val stratFilterSql: String = {
    // ELSE 'zz' = keep-all: a stratum OUTSIDE the configured rate list
    // passes through untouched — dropping unlisted strata ('00') would
    // silently delete a sixth language from the training mix the day
    // the corpus gains one, with every shared-predicate check green
    val thr = langRates.map { case (l, t) => s"WHEN '$l' THEN '$t'" }
      .mkString("CASE lang ", " ", " ELSE 'zz' END")
    s"substring(md5(text), 1, 2) < $thr"
  }

  def sampleStratified(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .filter(expr(stratFilterSql))
      .select("doc_id", "lang", "source")

  // ------------------------------------------------- dedup-aware split
  /** c18: NEAR-DUP-AWARE train/eval split — the leakage guard c01's
    * content-hash split cannot give on its own: c01 keeps EXACT
    * duplicates together (same text ⇒ same md5), but a near-duplicate
    * pair hashes to opposite sides and the eval answer leaks into
    * training. Here the split key is the near-dup CLUSTER
    * representative ([[DedupOps.dedupClusters]] — the d08 components),
    * so every member of a cluster lands on the SAME side; singletons
    * split on themselves. Composition of two gated operators: one left
    * join of the corpus against the (pair-covered-docs)-sized label
    * frame, then the same first-hex-digit rule as c01 — no new
    * machinery, no extra shuffle beyond the label join. At 100 TB the
    * label frame is the incremental-dedup artifact the ingest already
    * maintains (d12's delta discipline), not a per-split recompute. */
  def dedupAwareSplit(spark: SparkSession, sfDir: String): DataFrame = {
    val reps = DedupOps.dedupClusters(spark, sfDir)
    docs(spark, sfDir).join(reps, Seq("doc_id"), "left")
      .withColumn("rep", coalesce(col("cluster_id"), col("doc_id")))
      .withColumn("split",
        when(substring(md5(col("rep").cast("string")), 1, 1)
          .isin("0", "1"), "eval").otherwise("train"))
      .select("doc_id", "rep", "split")
  }

  /** c18's oracle: the shared d08 component CTEs, then the same
    * representative election + first-hex-digit rule. */
  private def dedupAwareSplitOracle: String =
    s"""WITH RECURSIVE ${DedupOps.clusterCtes},
        comp AS (SELECT v, min(lbl) AS lbl FROM cc GROUP BY v)
      SELECT d.doc_id, coalesce(c.lbl, d.doc_id) AS rep,
             CASE WHEN substr(md5(CAST(coalesce(c.lbl, d.doc_id)
                                       AS VARCHAR)), 1, 1) IN ('0', '1')
                  THEN 'eval' ELSE 'train' END AS split
      FROM documents d LEFT JOIN comp c ON c.v = d.doc_id"""

  // ------------------------------------------------------ reservoir
  /** c17: deterministic EXACT-k-per-group sampling — the fixed-budget
    * complement of c07's rate sampling (rate × group size drifts;
    * an eval-set builder wants exactly k per stratum). The classic
    * streaming form is reservoir sampling; the distributed-and-
    * reproducible equivalent is top-k by a seeded content hash: rank
    * rows within each group by md5(seed ':' doc_id) and keep rank ≤ k.
    * Same k rows on every run, any partitioning, either engine.
    *
    * Scale shape: one shuffle on the group key, per-group rank window
    * (never global). A pathologically hot group serializes only its
    * own partition; the two-phase quota trick (c02) pre-thins such a
    * group with a hash-threshold filter to ~k·ε candidates before the
    * exact rank — same final rows, bounded partition. */
  def reservoirSample(
      spark: SparkSession, sfDir: String, k: Int = 20,
      seed: String = "42"): DataFrame = {
    val w = Window.partitionBy("source")
      .orderBy(col("rk_hash"), col("doc_id"))
    docs(spark, sfDir)
      .select(col("doc_id"), col("source"),
        md5(concat(lit(seed + ":"), col("doc_id"))).as("rk_hash"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("doc_id"), col("source"), col("rk"))
  }

  // ------------------------------------------------------ epoch shuffle
  /** Deterministic training-epoch shuffle: a seeded pseudo-random
    * permutation of the corpus, materialized as (shard, position)
    * coordinates — the order a data loader streams one epoch in, with
    * a DIFFERENT order per seed and the same order on every re-run of
    * the same seed (job restarts and engine swaps resume mid-epoch at
    * the exact same document).
    *
    * Scale shape: the sort key is a content-independent
    * [[PortableHash]] of (seed, doc_id), the shard is that hash mod
    * `numShards` — hash-uniform, so shards are balanced by
    * construction — and the only non-map stage is one row_number
    * window PARTITIONED BY shard: per-shard parallel rank, never a
    * global single-partition sort. At 100 TB, numShards scales with
    * the loader's reader count; each shard is an independently
    * streamable file. */
  /** c13: document CHUNKING — fixed-width token windows with stride,
    * the step between raw documents and sequence packing (c09) when
    * documents exceed the training context: long docs become
    * overlapping `width`-token chunks (overlap = width − stride keeps
    * boundary context), short docs one chunk. Runs entirely in the
    * scan projection (split + generated starts + explode) — no
    * shuffle, no state, perfectly parallel over the corpus; chunk_id
    * is position-derived so re-runs are byte-identical. Whitespace
    * tokens stand in for a real tokenizer (t02's convention); the
    * window algebra is tokenizer-agnostic. */
  def chunkDocs(spark: SparkSession, sfDir: String,
      width: Int = 64, stride: Int = 48): DataFrame =
    chunkFrame(docs(spark, sfDir), width, stride)

  /** The chunking projection over any (doc_id, text, ...) frame —
    * shared by batch c13 and the streaming twin (stateless, so the
    * same definition runs unchanged on a stream). */
  private[graft] def chunkFrame(d: DataFrame,
      width: Int, stride: Int): DataFrame = {
    require(stride > 0 && width >= stride,
      s"need width >= stride > 0, got width=$width stride=$stride")
    d.select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), col("ws"),
        explode(sequence(lit(0), size(col("ws")) - 1, lit(stride)))
          .as("start"))
      .select(col("doc_id"),
        (col("start") / stride).cast("long").as("chunk_id"),
        size(slice(col("ws"), col("start") + 1, lit(width)))
          .cast("long").as("n_tokens"),
        array_join(slice(col("ws"), col("start") + 1, lit(width)), " ")
          .as("chunk_text"))
  }

  /** c14: seeded NEGATIVE sampling — the contrastive-training step
    * that pairs every anchor document with `k` pseudo-random
    * non-matching documents. "Random" is a portable seeded hash over
    * (seed, anchor, slot) mod corpus size — deterministic, reshuffled
    * by seed like [[epochShuffle]], identical in both engines, and
    * hash-uniform so every document serves as a negative equally
    * often; a collision with the anchor itself shifts one slot over.
    * The fetch of negative-side attributes is one equi join on the
    * derived id (k·N rows against N — broadcast or shuffle as the
    * planner sizes it); nothing driver-side, no RNG state to
    * coordinate across executors — the property that makes SEEDED
    * derivation, not sampled randomness, the scalable form (c11's
    * argument applied to pair construction). Requires the dense
    * 0..N−1 doc_id domain the corpus tables guarantee. */
  def negativeSamples(spark: SparkSession, sfDir: String,
      k: Int = 3, seed: Int = 7): DataFrame = {
    val n = Tables.rowCount(spark, sfDir, "documents")
    val h = graft.operators.PortableHash.packed(
      s"'neg' || $seed || ':' || anchor_id || ':' || j")
    val negSide = docs(spark, sfDir)
      .select(col("doc_id").as("neg_id"), col("source").as("neg_source"))
    docs(spark, sfDir)
      .select(col("doc_id").as("anchor_id"),
        explode(expr(s"sequence(0, ${k - 1})")).as("j"))
      .withColumn("j", col("j").cast("long"))
      .withColumn("raw", expr(h) % n)
      .withColumn("neg_id",
        when(col("raw") === col("anchor_id"), (col("raw") + 1) % n)
          .otherwise(col("raw")))
      .drop("raw")
      .join(negSide, "neg_id")
      .select("anchor_id", "j", "neg_id", "neg_source")
  }

  /** c15: IMPORTANCE (weight-proportional) sampling — each document
    * kept with probability equal to its own weight, the primitive
    * behind quality-weighted training mixtures (upsample good text,
    * downsample boilerplate) where c07's stratified sampler keeps a
    * FIXED rate per stratum. The uniform draw is the seeded portable
    * hash mod M compared against weight·M — deterministic,
    * executor-stateless, reshuffled by seed (the c11/c14 argument).
    * Weight here is min(1, n_chars/2000) — longer docs kept
    * proportionally more often; any row-level weight expression slots
    * into the same comparison. */
  def weightedSample(spark: SparkSession, sfDir: String,
      seed: Int = 7): DataFrame = {
    val M = 1000000L
    val h = graft.operators.PortableHash.packed(
      s"'wsamp' || $seed || ':' || doc_id")
    docs(spark, sfDir)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .filter(expr(h) % M < least(lit(M), col("n_chars") * lit(M / 2000)))
  }

  /** c16: TEMPERATURE resampling across sources — the mixture
    * flattener multilingual/multi-domain training uses: a source with
    * corpus share p is kept at a rate ∝ p^(α−1) (α = 1/2 here), so
    * effective shares become ∝ p^α — big sources damped, small ones
    * relatively boosted — normalized so the rarest source keeps
    * everything. Rates come from one source-count aggregate
    * (sources-sized, broadcast back); the keep decision is the seeded
    * hash-as-uniform-draw against rate·M, row-local like c15. Both
    * engines compute the rate with the same IEEE sqrt/divide, so the
    * gate is hash-exact. */
  def temperatureMix(spark: SparkSession, sfDir: String,
      seed: Int = 7): DataFrame =
    temperatureMixOn(
      docs(spark, sfDir).select(col("doc_id"), col("source")), seed)

  /** [[temperatureMix]] over any (doc_id, source) frame — the gate
    * corpus's sources are near-uniform (so flattening is ~identity
    * there, which the oracle still hash-checks); CurationOpsSpec
    * proves the DAMPING on a 9:1 skewed corpus. */
  private[graft] def temperatureMixOn(
      d: DataFrame, seed: Int = 7): DataFrame = {
    val M = 1000000L
    val h = graft.operators.PortableHash.packed(
      s"'tmix' || $seed || ':' || doc_id")
    // keep_rate(s) = (p_s)^(α-1) / max_s (p_s)^(α-1)  with α = 1/2
    //             = sqrt(min_share / p_s)   — rarest source rate 1.0
    val rates = d.groupBy("source").agg(count(lit(1)).as("cnt"))
      .withColumn("min_cnt", min("cnt").over())
      .select(col("source"),
        sqrt(col("min_cnt").cast("double") / col("cnt")).as("rate"))
    // floor on BOTH engines: DuckDB's double→BIGINT cast rounds where
    // Spark's truncates, so the threshold must be floored explicitly
    d.join(broadcast(rates), "source")
      .filter(expr(h) % M < floor(col("rate") * M))
      .select("doc_id", "source")
  }

  private val CurriculumBands = 3
  private val CurriculumShards = 8

  /** c26: CURRICULUM ORDERING — the baby-steps schedule (Bengio et
    * al. 2009 "Curriculum learning"; Spitkovsky et al. 2010, "From
    * baby steps to leapfrog"): band the corpus into `bands`
    * difficulty tiers and let epoch e train on tiers 1..e — easy
    * first, full corpus last. Difficulty here is the token count
    * (longer docs are harder; any derived score — t01 quality, t13
    * LM logprob — drops into the same banding). Tiers are EQUI-DEPTH
    * via the q100 discipline: the cumulative window runs over the
    * DISTINCT-difficulty frame (a few hundred rows however large the
    * corpus), band = ((cum − cnt)·bands) div total + 1 in pure int64
    * (left-edge convention — lands exact terciles on uniform
    * difficulty, never needs a cap), and the per-value band map
    * broadcasts back. Within an epoch the order is the c11 portable
    * epoch shuffle, seeded BY epoch (each pass sees a fresh order):
    * shard = hash % shards, pos within (epoch, shard) — the trainer
    * streams shards independently, so no stage ever sorts a whole
    * epoch on one partition. Output (epoch, shard, pos, doc_id,
    * band) — integer-exact, hash-anchored. */
  def curriculum(spark: SparkSession, sfDir: String): DataFrame =
    curriculumOn(docs(spark, sfDir))

  /** [[curriculum]] over any (doc_id, text) frame. */
  def curriculumOn(d: DataFrame,
      bands: Int = CurriculumBands,
      shards: Int = CurriculumShards): DataFrame = {
    val scored = Persists.barrier(d.select(col("doc_id"),
      size(split(col("text"), " ")).as("difficulty")))
    val wCum = Window.orderBy("difficulty")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bandMap = scored.groupBy("difficulty")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum("cnt").over(wCum))
      .withColumn("total", sum("cnt").over(
        Window.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .select(col("difficulty"),
        expr(s"((cum - cnt) * $bands) div total + 1")
          .cast("int").as("band"))
    val banded = scored.join(broadcast(bandMap), "difficulty")
    val epochs = (1 to bands).map(e => banded
        .filter(col("band") <= e)
        .select(col("doc_id"), col("band"), lit(e).as("epoch")))
      .reduce(_ unionByName _)
    val w = Window.partitionBy("epoch", "shard")
      .orderBy(col("h"), col("doc_id"))
    epochs
      .withColumn("h", expr(graft.operators.PortableHash.packed(
        "'cur' || epoch || ':' || doc_id")))
      .withColumn("shard", (col("h") % shards).cast("int"))
      .withColumn("pos", row_number().over(w).cast("int"))
      .select("epoch", "shard", "pos", "doc_id", "band")
  }

  private[graft] val curriculumOracle: String = {
    val h = graft.operators.PortableHash.packed(
      "'cur' || epoch || ':' || doc_id")
    s"""WITH s AS (
         SELECT doc_id,
                CAST(len(string_split(text, ' ')) AS INTEGER)
                  AS difficulty
         FROM documents),
       g AS (SELECT difficulty, count(*) AS cnt
             FROM s GROUP BY difficulty),
       b AS (SELECT difficulty,
                    CAST(((sum(cnt) OVER (ORDER BY difficulty
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) - cnt) * $CurriculumBands)
                      // (sum(cnt) OVER ()) + 1 AS INTEGER) AS band
             FROM g),
       bd AS (SELECT s.doc_id, b.band FROM s JOIN b USING (difficulty)),
       e AS (SELECT doc_id, band, ep.epoch
             FROM bd, (VALUES (1), (2), (3)) AS ep(epoch)
             WHERE band <= ep.epoch),
       hh AS (SELECT doc_id, band, epoch, $h AS h FROM e)
       SELECT epoch, CAST(h % $CurriculumShards AS INTEGER) AS shard,
              CAST(row_number() OVER (
                PARTITION BY epoch, h % $CurriculumShards
                ORDER BY h, doc_id) AS INTEGER) AS pos,
              doc_id, band
       FROM hh"""
  }

  def epochShuffle(spark: SparkSession, sfDir: String, seed: Int = 7,
      numShards: Int = 8): DataFrame = {
    val h = expr(graft.operators.PortableHash.packed(
      s"'epoch' || $seed || ':' || doc_id"))
    val w = Window.partitionBy("shard").orderBy(col("h"), col("doc_id"))
    docs(spark, sfDir)
      .select(col("doc_id"), h.as("h"))
      .withColumn("shard", (col("h") % numShards).cast("int"))
      .withColumn("pos", row_number().over(w).cast("int"))
      .select("doc_id", "shard", "pos")
  }

  // ----------------------------------------------------- mix reporting
  /** Training-mix composition report: per (source, lang) document and
    * character counts plus each cell's share of the corpus — the
    * accounting table every mix decision (quotas, sampling rates,
    * upweighting) is read off of. One two-key aggregation (tiny output:
    * sources × langs cells) + an unpartitioned window over those cells
    * for the shares; the window runs on the AGGREGATED frame, so the
    * single-partition stage sees hundreds of rows, not the corpus. */
  def mixReport(spark: SparkSession, sfDir: String): DataFrame =
    withMixShares(docs(spark, sfDir)
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("docs"), sum("n_chars").as("chars")))

  /** The share columns over an aggregated (source, lang, docs, chars)
    * cell frame — ONE definition shared by the batch report and the
    * streaming form (q56 computes it on the completed sink), so the
    * rounding/column contract can't drift from the shared oracle. */
  def withMixShares(cells: DataFrame): DataFrame = {
    val all = Window.partitionBy()
    cells.withColumn("doc_share",
        round(col("docs") / sum("docs").over(all), 4))
      .withColumn("char_share",
        round(col("chars") / sum("chars").over(all), 4))
  }

  /** c19: leakage-safe TEMPORAL split — train on the first `trainPct`
    * percent of the observed day span, hold out everything after an
    * `embargoDays` quarantine, drop the quarantine itself (the split
    * every time-series / behavioral model needs: a random hash split
    * (c01) leaks future context into training whenever rows are
    * temporally correlated; the embargo kills boundary leakage from
    * lagged features that straddle the cutoff). Cutoff arithmetic is
    * exact integer math on epoch-days from ONE scalar min/max agg
    * (broadcast) — no percentile estimate, no float. Output: per-split
    * event and distinct-user counts (the report a pipeline logs before
    * training; the row-level assignment is the same `when` chain). */
  def temporalSplit(spark: SparkSession, sfDir: String): DataFrame =
    temporalSplitOn(graft.sources.Tables.load(spark, sfDir, "events")
      .select(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day")))

  /** [[temporalSplit]] over any (user_id, day) frame. */
  def temporalSplitOn(e: DataFrame, trainPct: Int = 70,
      embargoDays: Int = 2): DataFrame = {
    require(trainPct > 0 && trainPct < 100,
      s"temporalSplit: trainPct must be in (0,100), got $trainPct")
    val bounds = e.agg(min("day").as("lo"), max("day").as("hi"))
    e.crossJoin(broadcast(bounds))
      .withColumn("cutoff",
        expr(s"lo + (hi - lo) * $trainPct div 100"))
      .withColumn("split",
        when(col("day") <= col("cutoff"), "train")
          .when(col("day") > col("cutoff") + embargoDays, "test")
          .otherwise("embargo"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_events"),
        countDistinct("user_id").as("n_users"))
  }

  /** c20: NEAR-DUP decontamination — c04/c12 catch verbatim eval
    * leakage (shared exact shingles); this catches the paraphrased /
    * lightly-edited leak class, flagging train documents whose shingle
    * JACCARD with any eval document clears `threshold`. Candidate
    * generation is the d06 portable MinHash banding restricted to
    * CROSS-SET pairs only: the band join's left side is train
    * signatures, the right side eval signatures, so per-bucket work is
    * train_in_bucket × eval_in_bucket — the eval suite is tiny next to
    * a 100 TB corpus, which makes the candidate stage effectively
    * linear in the corpus (the d12 delta-join asymmetry, applied to
    * decontamination). Signature/banding/jaccard algebra is shared
    * verbatim with [[DedupOps]] (`portableSigSql`/`portableBandSql`),
    * so the oracle is the d06 CTE discipline with a source split.
    * Output: (train_id, eval_id, jaccard) flags — the audit trail a
    * pipeline stores before dropping the train side. */
  def neardupDecontam(
      spark: SparkSession, sfDir: String,
      evalSource: String = "src0", threshold: Double = 0.4): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    neardupDecontamOn(docs(spark, sfDir), evalSource, threshold)
  }

  /** [[neardupDecontam]] over any (doc_id, source, text) frame. */
  private[graft] def neardupDecontamOn(
      d: DataFrame, evalSource: String, threshold: Double): DataFrame = {
    graft.functions.GraftFunctions.register(d.sparkSession)
    // persist: the signature frame feeds both band sides AND the
    // jaccard verify (the d06 CollapseProject hazard)
    val sigs = graft.operators.Persists.barrier(d
      .withColumn("sh", Shingles.wordShingles("text", 4))
      .withColumn("sig", expr(DedupOps.portableSigFastSql))
      .select(col("doc_id"), col("source"), col("sh"), col("sig")))
    val banded = sigs.select(col("doc_id"), col("source"),
      posexplode(expr(DedupOps.portableBandSql)).as(Seq("band", "bsig")))
    val trainB = banded.filter(col("source") =!= evalSource)
      .select(col("doc_id").as("train_id"), col("band"), col("bsig"))
    val evalB = banded.filter(col("source") === evalSource)
      .select(col("doc_id").as("eval_id"), col("band"), col("bsig"))
    val cand = trainB.join(evalB, Seq("band", "bsig"))
      .select("train_id", "eval_id").distinct()
    val sh = sigs.select(col("doc_id"), col("sh"))
    cand
      .join(sh.as("sa"), col("train_id") === col("sa.doc_id"))
      .join(sh.as("sb"), col("eval_id") === col("sb.doc_id"))
      .select(col("train_id"), col("eval_id"),
        round(size(array_intersect(col("sa.sh"), col("sb.sh")))
            .cast("double") /
          size(array_union(col("sa.sh"), col("sb.sh"))), 4).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** c21: per-eval-doc CONTAMINATION REPORT — the two leak signals
    * (c04's exact shared-shingle hits, c20's MinHash near-dup flags)
    * rolled up to the eval suite's grain: how many train documents
    * leak into each eval document, verbatim and paraphrased. This is
    * the table an eval owner actually reads (and the one that decides
    * whether a benchmark is burned); the row-level pair audits stay in
    * c04/c20. Full-outer merge of the two |eval|-bounded rollups —
    * every stage after the base signals is eval-suite-sized. */
  def contaminationReport(
      spark: SparkSession, sfDir: String,
      evalSource: String = "src0"): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    contaminationReportOn(docs(spark, sfDir), evalSource)
  }

  /** [[contaminationReport]] over any (doc_id, source, text) frame. */
  private[graft] def contaminationReportOn(
      d: DataFrame, evalSource: String): DataFrame = {
    val exact = decontaminateOn(d, evalSource)
      .groupBy("eval_id")
      .agg(countDistinct("train_id").as("n_exact_train"))
    val near = neardupDecontamOn(d, evalSource, threshold = 0.4)
      .groupBy("eval_id")
      .agg(countDistinct("train_id").as("n_neardup_train"))
    exact.join(near, Seq("eval_id"), "full_outer")
      .select(col("eval_id"),
        coalesce(col("n_exact_train"), lit(0L)).as("n_exact_train"),
        coalesce(col("n_neardup_train"), lit(0L)).as("n_neardup_train"))
  }

  /** c22: TOKEN-budget source quotas — c02's per-source cap measured
    * in the unit a training mixture is actually specified in (tokens,
    * not documents): per source, documents accumulate in ingest order
    * (doc_id — the deterministic arrival proxy) until the running
    * token total would exceed `budgetTokens`; the straddling document
    * is excluded (a budget is a ceiling, not a target). One
    * source-keyed window sort, exact integer arithmetic; at 100 TB
    * the partition key is the source — hundreds of small partitions,
    * no global sort anywhere. Output keeps the running total so the
    * mixture report downstream needs no re-scan. */
  def tokenBudgetMix(
      spark: SparkSession, sfDir: String,
      budgetTokens: Long = 800L): DataFrame =
    tokenBudgetMixOn(docs(spark, sfDir), budgetTokens)

  /** [[tokenBudgetMix]] over any (doc_id, source, text) frame. */
  private[graft] def tokenBudgetMixOn(
      d: DataFrame, budgetTokens: Long): DataFrame = {
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    d.withColumn("tokens",
        size(split(col("text"), " ")).cast("long"))
      .withColumn("cum_tokens", sum("tokens").over(w))
      .filter(col("cum_tokens") <= budgetTokens)
      .select("doc_id", "source", "tokens", "cum_tokens")
  }

  /** c23: EXACT-SUBSTRING decontamination — for every (train, eval)
    * pair sharing a run of ≥ N consecutive identical tokens, the
    * longest such run. The "≥N-token exact overlap" removal standard
    * (the modality between c04's fixed-width shingle hits and c20's
    * MinHash near-dup): it flags an eval answer pasted inside an
    * otherwise-original train doc, reports the overlap LENGTH the
    * removal policy thresholds on, and catches runs shorter than
    * c04's 8-token shingle (gate N = 6). Candidates meet only ACROSS
    * the split per window value — |eval|-bounded per window, linear
    * in the corpus (the c20 asymmetry); hot boilerplate windows are
    * capped on both sides, mirrored in the oracle. Machinery shared
    * verbatim with d16 ([[DedupOps.substringCrossOverlapOn]]). */
  def substringDecontam(
      spark: SparkSession, sfDir: String,
      evalSource: String = "src0"): DataFrame =
    DedupOps.substringCrossOverlapOn(docs(spark, sfDir), evalSource)

  /** c24: c16's temperature mix keyed on the DERIVED language — t18's
    * model-as-DataFrame langid feeds the mixer instead of a
    * pre-existing metadata column, closing the loop a real
    * multilingual pipeline runs (langid → per-language flattening).
    * Same √-flattening, same seeded portable hash; the grouping key is
    * t18's lang_pred, so a high-resource language is downsampled
    * toward the rarest DETECTED one. Output (doc_id, lang). */
  def temperatureMixLangid(
      spark: SparkSession, sfDir: String, seed: Int = 7): DataFrame =
    temperatureMixOn(
      TextOps.langIdModelOn(docs(spark, sfDir))
        .select(col("doc_id"), col("lang").as("source")), seed)
      .select(col("doc_id"), col("source").as("lang"))

  /** c25: the MULTILINGUAL CURATION PIPELINE — the three round-11
    * primitives composed the way a real corpus build runs them:
    * (1) t18's model-table langid derives each doc's language,
    * (2) c16's √-temperature mix flattens across the DETECTED
    * languages, (3) c23's exact-substring decontamination drops every
    * surviving train doc sharing a ≥6-token run with the eval suite.
    * One gated entry proves the composition (not just the parts)
    * hash-reproduces — the c03/c10 pipeline discipline. Output:
    * (doc_id, lang), the curated train set. Each stage is the already
    * -gated operator verbatim, so the pipeline inherits their scale
    * shapes (broadcast model scan; per-lang hash filter; window-value
    * banded candidates). */
  def multilingualPipeline(
      spark: SparkSession, sfDir: String,
      evalSource: String = "src0", seed: Int = 7): DataFrame = {
    val d = docs(spark, sfDir)
    val kept = temperatureMixOn(
      TextOps.langIdModelOn(d)
        .select(col("doc_id"), col("lang").as("source")), seed)
      .select(col("doc_id"), col("source").as("lang"))
    val contaminated = DedupOps.substringCrossOverlapOn(d, evalSource)
      .select(col("train_id").as("doc_id")).distinct()
    kept.join(contaminated, Seq("doc_id"), "left_anti")
  }

  private val DsirBuckets = 4096
  private val DsirTopN = 100

  /** c27: DSIR DATA SELECTION — hashed-n-gram importance resampling
    * (Xie et al. 2023, "Data selection for language models via
    * importance resampling"): score every raw-pool document by how
    * much more likely its hashed bigram features are under the TARGET
    * distribution (here the `src0` docs — the high-quality domain)
    * than under the raw pool, and keep the top-N. Features are word
    * bigrams hashed into `DsirBuckets` buckets with the portable
    * md5-packed hash (identical SQL text both engines — the d06
    * discipline); per-bucket add-1-smoothed log-probability ratios
    * ln p̂_target(b) − ln p̂_raw(b) come from ONE 4096-row census, and
    * a doc's weight is the sum of the ratio over its bigram
    * OCCURRENCES (repeats count — the unigram-LM view), rounded to
    * 4 dp (the t13 float discipline) before the (weight desc, doc_id)
    * top-N cut so the boundary tie-break is engine-identical.
    *
    * Scale shape: one explode linear in corpus tokens, a 4096-bucket
    * partial-agg census, the ratio table BROADCAST back onto the
    * feature stream, a per-doc hash agg, and a TakeOrdered top-N — no
    * self-join, no global sort, nothing grows with the corpus except
    * the two linear passes. Output (doc_id, weight), the selected
    * training subset. */
  def dsirSelect(spark: SparkSession, sfDir: String,
      target: String = "src0"): DataFrame =
    dsirSelectOn(docs(spark, sfDir).select("doc_id", "source", "text"),
      target)

  /** [[dsirSelect]] over any (doc_id, source, text) frame. */
  private[graft] def dsirSelectOn(d: DataFrame, target: String,
      buckets: Int = DsirBuckets, topN: Int = DsirTopN): DataFrame = {
    // barriered: the feature stream feeds the bucket census AND the
    // per-doc weight join
    val feats = Persists.barrier(d
      .filter(size(split(col("text"), " ")) >= 2)
      .select(col("doc_id"), col("source"),
        explode(expr(
          """transform(sequence(1, size(split(text, ' ')) - 1),
               i -> concat(element_at(split(text, ' '), i), ' ',
                           element_at(split(text, ' '), i + 1)))"""))
          .as("feat"))
      .select(col("doc_id"), col("source"),
        expr(s"${graft.operators.PortableHash.packed("feat", 6)}"
          + s" % $buckets").as("b")))
    val cnt = feats.groupBy("b").agg(
      sum(when(col("source") === target, 1L).otherwise(0L)).as("ct"),
      sum(when(col("source") =!= target, 1L).otherwise(0L)).as("cr"))
    val tot = cnt.agg(sum("ct").as("tt"), sum("cr").as("tr"))
    val lr = cnt.crossJoin(broadcast(tot))
      .select(col("b"), expr(
        s"ln((ct + 1) / (tt + $buckets.0)) -"
          + s" ln((cr + 1) / (tr + $buckets.0))").as("lr"))
    feats.filter(col("source") =!= target)
      .join(broadcast(lr), "b")
      .groupBy("doc_id").agg(round(sum("lr"), 4).as("weight"))
      .orderBy(col("weight").desc, col("doc_id"))
      .limit(topN)
  }

  /** c29: DATASET CARD — the per-source release manifest every corpus
    * ships (the "data card" of Gebru et al.'s datasheets, reduced to
    * the measurable rows): per source, document and token counts, the
    * d19 duplication telemetry, the dominant DETECTED language (t18's
    * langid, (count desc, lang) argmax), and the mean t22 classifier
    * quality. One gated entry proving the four already-gated signal
    * pipelines COMPOSE into the report hash-reproducibly — the
    * c03/c25 composition discipline.
    *
    * Scale shape: each input is its gated operator verbatim (all
    * corpus-linear); the joins are per-doc equi joins and the report
    * is sources-sized. */
  def datasetCard(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Persists.barrier(docs(spark, sfDir))
    val rep = DedupOps.dedupReportOn(
      d.select(col("doc_id"), col("source"), col("text")))
    val toks = d.groupBy("source")
      .agg(sum(size(split(col("text"), " ")).cast("long"))
        .as("n_tokens"))
    val lm = d.select(col("doc_id"), col("source"))
      .join(TextOps.langIdModelOn(d).select("doc_id", "lang"), "doc_id")
      .groupBy("source", "lang").agg(count(lit(1)).as("c"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("source")
          .orderBy(col("c").desc, col("lang"))))
      .filter(col("rn") === 1)
      .select(col("source"), col("lang").as("top_lang"))
    val mq = d.select(col("doc_id"), col("source"))
      .join(TextOps.qualityClassifierOn(d).select("doc_id", "score"),
        "doc_id")
      .groupBy("source").agg(round(avg("score"), 4).as("mean_quality"))
    rep.join(toks, "source").join(lm, "source").join(mq, "source")
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("n_exact_dups"), col("n_cross_source"), col("top_lang"),
        col("mean_quality"))
  }

  /** c29's DuckDB twin: the d19, t18, and t22 oracles embedded
    * verbatim, plus the token roll-up and the per-source argmax. */
  private[graft] def datasetCardOracle: String =
    s"""WITH rep AS (SELECT * FROM (${DedupOps.dedupReportOracle}) r),
       toks AS (SELECT source,
                       CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                         AS n_tokens
                FROM documents GROUP BY source),
       langid AS MATERIALIZED (
         SELECT * FROM (${TextOps.langIdModelOracle}) q1),
       lm AS (SELECT source, lang AS top_lang FROM (
                SELECT d.source, l.lang,
                       row_number() OVER (PARTITION BY d.source
                         ORDER BY count(*) DESC, l.lang) AS rn
                FROM documents d JOIN langid l ON d.doc_id = l.doc_id
                GROUP BY d.source, l.lang) z
              WHERE rn = 1),
       qs AS MATERIALIZED (
         SELECT * FROM (${TextOps.qualityClassifierOracle}) q2),
       mq AS (SELECT d.source, round(avg(qs.score), 4) AS mean_quality
              FROM documents d JOIN qs ON d.doc_id = qs.doc_id
              GROUP BY d.source)
       SELECT rep.source, n_docs, n_tokens, n_exact_dups,
              n_cross_source, top_lang, mean_quality
       FROM rep JOIN toks USING (source) JOIN lm USING (source)
       JOIN mq USING (source)"""

  /** c30: WATER-FILLING TOKEN BUDGET — the fair-share allocator for
    * "fit these sources into a B-token budget": small sources keep
    * everything they have, large sources are clipped to one common
    * level chosen so the budget is exactly exhausted (max-min
    * fairness — the classic water-filling solution, closed-form).
    * All integer: the budget here is half the corpus tokens
    * (data-derived so it BINDS at any SF — the d17/s20 discipline),
    * the full/clipped test is the cross-multiply
    * a_k·(n−k+1) ≤ B − cum_{k−1} over the avail-ascending order
    * (full-funding is a prefix property of that order), and the clip
    * level is an integer floor div (≤ n−1 tokens go unallocated —
    * documented, deterministic). Output (source, avail_tokens,
    * alloc_tokens, funded_fully).
    *
    * Scale shape: one corpus-linear token count, then every window
    * runs on the SOURCES-sized frame (the q100/c26 value-bounded
    * window argument — sources, not documents). */
  def waterfillBudget(spark: SparkSession, sfDir: String): DataFrame =
    waterfillOn(docs(spark, sfDir).groupBy("source")
      .agg(sum(size(split(col("text"), " ")).cast("long"))
        .as("avail")))

  /** [[waterfillBudget]] over any (source, avail) frame; budget =
    * Σavail div 2. */
  private[graft] def waterfillOn(avail: DataFrame): DataFrame = {
    val wCum = Window.orderBy(col("avail"), col("source"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    avail
      .withColumn("k", row_number().over(
        Window.orderBy(col("avail"), col("source"))))
      .withColumn("cum", sum("avail").over(wCum))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("b", (sum("avail").over(wAll) / 2).cast("long"))
      .withColumn("full",
        col("avail") * (col("n") - col("k") + 1) <=
          col("b") - (col("cum") - col("avail")))
      .withColumn("kstar",
        max(when(col("full"), col("k")).otherwise(0)).over(wAll))
      .withColumn("cumfull",
        max(when(col("full"), col("cum")).otherwise(0L)).over(wAll))
      .withColumn("level", when(col("kstar") < col("n"),
        expr("(b - cumfull) div (n - kstar)")).otherwise(lit(0L)))
      .select(col("source"), col("avail").as("avail_tokens"),
        when(col("full"), col("avail")).otherwise(col("level"))
          .as("alloc_tokens"),
        col("full").cast("int").as("funded_fully"))
  }

  /** c30's DuckDB twin: same avail-ascending order, same integer
    * cross-multiply prefix test, same floor-div clip level. */
  private[graft] val waterfillOracle: String =
    """WITH avail AS (
         SELECT source,
                CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                  AS avail
         FROM documents GROUP BY source),
       r AS (SELECT source, avail,
                    row_number() OVER (ORDER BY avail, source) AS k,
                    sum(avail) OVER (ORDER BY avail, source
                      ROWS UNBOUNDED PRECEDING) AS cum,
                    count(*) OVER () AS n,
                    (sum(avail) OVER ()) // 2 AS b
             FROM avail),
       f AS (SELECT *,
                    (avail * (n - k + 1) <= b - (cum - avail)) AS fl
             FROM r),
       s AS (SELECT *,
                    max(CASE WHEN fl THEN k ELSE 0 END) OVER () AS kstar,
                    max(CASE WHEN fl THEN cum ELSE 0 END) OVER ()
                      AS cumfull
             FROM f)
       SELECT source, CAST(avail AS BIGINT) AS avail_tokens,
              CAST(CASE WHEN fl THEN avail
                   WHEN kstar < n THEN (b - cumfull) // (n - kstar)
                   ELSE 0 END AS BIGINT) AS alloc_tokens,
              CAST(CASE WHEN fl THEN 1 ELSE 0 END AS INTEGER)
                AS funded_fully
       FROM s"""

  // ------------------------------------------------ c31 DoReMi step
  /** c31: DOREMI DOMAIN-WEIGHT STEP (Xie et al. 2023) — one
    * exponentiated-gradient update of the training-mix domain weights
    * from per-domain excess loss, the reweighting loop that produced
    * the Pile/GLaM mixture revisions: domains whose documents score
    * WORSE than the corpus under the reference model get upweighted.
    * The reference model here is t09's corpus unigram LM (the
    * already-gated operator verbatim — a real run swaps in trained
    * proxy-model losses without changing the plan): per domain,
    *   loss_d   = mean over the domain's docs of −logprob  (6 dp)
    *   baseline = the same mean over ALL docs              (6 dp)
    *   excess_d = max(0, loss_d − baseline)
    *   weight_d = (1−s) · softmax_d(η · excess) + s/D
    * with η = 1, smoothing s = 0.1 — uniform-prior EG with the
    * DoReMi smoothing mix. The max(0,·) clamp BINDS on the gate
    * corpus: domain means straddle the doc-weighted baseline, so
    * both zero and positive excesses appear. Output (source, loss,
    * excess, weight), Σ weight = 1 on the 6-dp grid.
    *
    * Scale shape: t09's two linear passes + a doc_id join to carry
    * source, then everything runs on DOMAIN-sized frames (D rows):
    * one partial-agg'd per-source mean, a 1-row baseline broadcast,
    * a 1-row softmax-normalizer broadcast. No window, no driver
    * collect; the heavy stage is exactly t09's, already probed. */
  def doremiStep(spark: SparkSession, sfDir: String,
      eta: Double = 1.0, smooth: Double = 0.1): DataFrame =
    doremiStepOn(TextOps.unigramLogprob(spark, sfDir)
      .join(Tables.load(spark, sfDir, "documents")
        .select("doc_id", "source"), "doc_id")
      .select(col("source"), (-col("logprob")).as("nll")), eta, smooth)

  /** [[doremiStep]] over any per-doc (source, nll) frame — the seam a
    * trained proxy model's losses plug into. */
  private[graft] def doremiStepOn(nll0: DataFrame,
      eta: Double = 1.0, smooth: Double = 0.1): DataFrame = {
    val nll = Persists.barrier(nll0)
    val dom = nll.groupBy("source").agg(round(avg("nll"), 6).as("loss"))
    val base = nll.select(round(avg("nll"), 6).as("baseline"))
    val ex = dom.crossJoin(base)
      .select(col("source"), col("loss"),
        round(greatest(lit(0.0), col("loss") - col("baseline")), 6)
          .as("excess"))
    val ew = ex.withColumn("ew", exp(lit(eta) * col("excess")))
    val tot = ew.select(sum("ew").as("z"),
      count(lit(1)).cast("double").as("d"))
    ew.crossJoin(tot)
      .select(col("source"), col("loss"), col("excess"),
        round(lit(1.0 - smooth) * col("ew") / col("z") +
          lit(smooth) / col("d"), 6).as("weight"))
  }

  /** c31's DuckDB twin: t09's oracle as the per-doc scorer CTE, same
    * 6-dp loss/baseline grids, same clamp, same EG + smoothing
    * arithmetic. */
  private val doremiOracle: String =
    s"""WITH lp AS (${TextOps.unigramOracle}),
       nll AS (SELECT d.source, -lp.logprob AS nll
               FROM lp JOIN documents d USING (doc_id)),
       dom AS (SELECT source, round(avg(nll), 6) AS loss
               FROM nll GROUP BY 1),
       base AS (SELECT round(avg(nll), 6) AS baseline FROM nll),
       ex AS (SELECT source, loss,
                     round(greatest(0.0, loss - baseline), 6) AS excess
              FROM dom CROSS JOIN base),
       ew AS (SELECT source, loss, excess,
                     exp(1.0 * excess) AS ew FROM ex),
       tot AS (SELECT sum(ew) AS z, CAST(count(*) AS DOUBLE) AS d
               FROM ew)
     SELECT source, loss, excess,
            round(0.9 * ew / z + 0.1 / d, 6) AS weight
     FROM ew CROSS JOIN tot"""

  // -------------------------------------- c32 weighted water-filling
  /** c32: DOREMI-WEIGHTED WATER-FILLING — c31's optimized mix applied
    * under real supply constraints, the composition a pipeline
    * actually runs: give each domain its DoReMi share w_d of the
    * token budget, except that a domain cannot contribute more than
    * it HAS (avail_d); surplus from supply-capped domains
    * redistributes to the rest in proportion to their weights
    * (progressive filling — the weighted generalization of c30's
    * max-min allocator, which this reduces to at uniform weights).
    * Closed form on the avail/weight-ascending order: domain k is
    * capped iff avail_k·W_rem ≤ B_rem·w_k with the remaining budget/
    * weight computed over the prefix (cappedness is a prefix property
    * of the ratio order), uncapped domains get ⌊λ·w_d⌋ tokens at the
    * common rate λ = B_rem / W_rem. Budget = Σavail div 2 (the c30
    * data-derived binding). Output (source, avail_tokens, weight,
    * alloc_tokens, supply_capped).
    *
    * Scale shape: one corpus-linear token count + c31's scorer; the
    * allocation itself runs entirely on the SOURCES-sized frame
    * (value-bounded windows, the c30 argument). */
  def doremiWaterfill(spark: SparkSession, sfDir: String): DataFrame = {
    val avail = docs(spark, sfDir).groupBy("source")
      .agg(sum(size(split(col("text"), " ")).cast("long")).as("avail"))
    weightedWaterfillOn(avail,
      doremiStep(spark, sfDir).select("source", "weight"))
  }

  /** [[doremiWaterfill]] over any (source, avail) + (source, weight)
    * frames. */
  private[graft] def weightedWaterfillOn(
      avail: DataFrame, weights: DataFrame): DataFrame = {
    val ord = Window.orderBy(col("avail") / col("weight"), col("source"))
    val wCum = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    avail.join(weights, "source")
      .withColumn("cum", sum("avail").over(wCum))
      .withColumn("cw", sum("weight").over(wCum))
      .withColumn("wsum", sum("weight").over(wAll))
      .withColumn("b", (sum("avail").over(wAll) / 2).cast("long"))
      .withColumn("capped",
        col("avail") * (col("wsum") - (col("cw") - col("weight"))) <=
          (col("b") - (col("cum") - col("avail"))) * col("weight"))
      .withColumn("cumcap",
        max(when(col("capped"), col("cum")).otherwise(0L)).over(wAll))
      .withColumn("cwcap",
        max(when(col("capped"), col("cw")).otherwise(0.0)).over(wAll))
      .select(col("source"), col("avail").as("avail_tokens"),
        col("weight"),
        when(col("capped"), col("avail")).otherwise(
          floor((col("b") - col("cumcap")) /
            (col("wsum") - col("cwcap")) * col("weight")))
          .as("alloc_tokens"),
        col("capped").cast("int").as("supply_capped"))
  }

  /** c32's DuckDB twin: c31's oracle as the weight CTE, the same
    * ratio order, prefix test, and floor'd common rate. */
  private val doremiWaterfillOracle: String =
    s"""WITH dw AS ($doremiOracle),
       avail AS (
         SELECT source,
                CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                  AS avail
         FROM documents GROUP BY source),
       j AS (SELECT a.source, a.avail, dw.weight
             FROM avail a JOIN dw ON a.source = dw.source),
       r AS (SELECT source, avail, weight,
                    sum(avail) OVER (ORDER BY avail / weight, source
                      ROWS UNBOUNDED PRECEDING) AS cum,
                    sum(weight) OVER (ORDER BY avail / weight, source
                      ROWS UNBOUNDED PRECEDING) AS cw,
                    sum(weight) OVER () AS wsum,
                    (sum(avail) OVER ()) // 2 AS b
             FROM j),
       f AS (SELECT *,
                    (avail * (wsum - (cw - weight))
                     <= (b - (cum - avail)) * weight) AS capped
             FROM r),
       s AS (SELECT *,
                    max(CASE WHEN capped THEN cum ELSE 0 END) OVER ()
                      AS cumcap,
                    max(CASE WHEN capped THEN cw ELSE 0 END) OVER ()
                      AS cwcap
             FROM f)
     SELECT source, avail AS avail_tokens, weight,
            CAST(CASE WHEN capped THEN avail
                 ELSE floor((b - cumcap) / (wsum - cwcap) * weight)
                 END AS BIGINT) AS alloc_tokens,
            CAST(CASE WHEN capped THEN 1 ELSE 0 END AS INTEGER)
              AS supply_capped
     FROM s"""

  // --------------------------------------------- c33 mix annealing
  /** c33: MIXTURE-ANNEALING SCHEDULE — the per-epoch domain-weight
    * plan that turns c31's single optimized mix into a TRAINING
    * CURRICULUM (the data-scheduling practice behind staged mixes:
    * open at the reweighted distribution, anneal linearly to uniform
    * by the final epoch so late training sees every domain evenly —
    * the mirror-image schedule is one sign flip): for epoch e of E,
    * t = e/(E−1) and weight_{e,d} = (1−t)·w_d + t/D on the 6-dp
    * grid. Σ_d weight = 1 at every epoch (each epoch is a convex
    * combination of two unit simplices — MixAnnealSpec asserts it on
    * the grid). Output (epoch, source, weight).
    *
    * Scale shape: c31's scorer plus a D×E literal-range cross join —
    * the schedule frame is domains × epochs however big the corpus. */
  def mixAnneal(spark: SparkSession, sfDir: String,
      epochs: Int = 4): DataFrame =
    mixAnnealOn(doremiStep(spark, sfDir).select("source", "weight"),
      epochs)

  /** [[mixAnneal]] over any (source, weight) mix frame. */
  private[graft] def mixAnnealOn(
      weights: DataFrame, epochs: Int): DataFrame = {
    require(epochs >= 2, s"a schedule needs >= 2 epochs, got $epochs")
    val w = Persists.barrier(weights)
    val d = w.select(count(lit(1)).cast("double").as("nd"))
    w.crossJoin(d)
      .select(col("source"), col("weight"), col("nd"),
        explode(expr(s"sequence(0, ${epochs - 1})")).as("epoch"))
      .select(col("epoch").cast("int").as("epoch"), col("source"),
        round((lit(1.0) - col("epoch") / lit((epochs - 1).toDouble)) *
          col("weight") +
          (col("epoch") / lit((epochs - 1).toDouble)) / col("nd"), 6)
          .as("weight"))
  }

  /** c33's DuckDB twin: c31's oracle as the weight CTE, the same
    * linear interpolation on the same 6-dp grid. */
  private def mixAnnealOracle(epochs: Int): String =
    s"""WITH dw AS ($doremiOracle),
       d AS (SELECT CAST(count(*) AS DOUBLE) AS nd FROM dw),
       e AS (SELECT unnest(range(0, $epochs)) AS epoch)
     SELECT CAST(e.epoch AS INTEGER) AS epoch, dw.source,
            round((1.0 - e.epoch / ${(epochs - 1).toDouble}) * dw.weight
                  + (e.epoch / ${(epochs - 1).toDouble}) / d.nd, 6)
              AS weight
     FROM dw CROSS JOIN d CROSS JOIN e"""

  /** The two planted canary GUIDs — one string pair, both engines. */
  private val CanaryA = "canary:eval-alpha-3f9c"
  private val CanaryB = "canary:eval-beta-77d2"

  /** The c36 anonymity threshold and quasi-identifier bucket width —
    * shared with the oracle. */
  val KAnonThreshold = 5
  val KAnonBucket = 200

  /** c36: K-ANONYMITY AUDIT + SUPPRESSION — the privacy screen a
    * corpus release runs beside c05's PII redaction: treat
    * (source, lang, ⌊n_chars/bucket⌋) as the quasi-identifier tuple
    * (the columns an adversary could link on), count each
    * equivalence class, and SUPPRESS classes smaller than k — a
    * document that is one of < k with its attribute combination is
    * re-identifiable even with the text redacted (Sweeney 2002).
    * Output per class: the QI tuple, its size, and `released`
    * (class size ≥ k); the release set is the released classes'
    * docs. All-integer, hash-anchored.
    *
    * Scale shape: one partial-agg'd groupBy on the QI tuple
    * (classes ≤ sources × langs × buckets — bounded), then a
    * broadcast-back semi filter for the release; no window, no
    * self-join. */
  def kAnonymity(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .groupBy(col("source"), col("lang"),
        // integer division (`div` truncates, DuckDB `//` floors —
        // they agree on the non-negative n_chars domain)
        expr(s"n_chars div $KAnonBucket").cast("long").as("chars_bucket"))
      .agg(count(lit(1)).as("class_n"))
      .select(col("source"), col("lang"), col("chars_bucket"),
        col("class_n"),
        (col("class_n") >= KAnonThreshold).as("released"))

  /** c36's DuckDB twin: same QI tuple, same integer bucket, same k. */
  private val kAnonymityOracle: String =
    s"""SELECT source, lang,
               CAST(n_chars // $KAnonBucket AS BIGINT) AS chars_bucket,
               count(*) AS class_n,
               (count(*) >= $KAnonThreshold) AS released
        FROM documents GROUP BY 1, 2, 3"""

  /** c35: CANARY-GUID SCAN — the BIG-bench-style contamination
    * tripwire: benchmark suites embed a unique canary string in every
    * document, and a training corpus is audited by SCANNING for the
    * GUIDs — any hit means eval data leaked into training wholesale
    * (the cheap exact complement to c21's n-gram overlap report,
    * which catches PARTIAL leaks). The gate plants two suite canaries
    * on every 97th doc by parity (the q94 pollution discipline), and
    * the scan must recover exactly those rows per canary. Output
    * (canary, n_docs, first_doc, last_doc).
    *
    * Scale shape: the canary list is a tiny broadcast frame; the scan
    * is one narrow `contains` map over text (a substring screen
    * whole-stage-codegen'd into the scan) with a canary-keyed partial
    * agg — no shuffle wider than canaries × partitions. */
  def canaryScan(spark: SparkSession, sfDir: String): DataFrame = {
    val planted = docs(spark, sfDir).select(col("doc_id"), expr(
      s"""CASE WHEN doc_id % 97 = 0 AND doc_id % 2 = 0
               THEN concat(text, ' $CanaryA')
               WHEN doc_id % 97 = 0
               THEN concat(text, ' $CanaryB')
               ELSE text END""").as("text"))
    val canaries = spark.range(2).select(
      when(col("id") === 0, lit(CanaryA)).otherwise(lit(CanaryB))
        .as("canary"))
    planted.crossJoin(broadcast(canaries))
      .filter(expr("contains(text, canary)"))
      .groupBy("canary")
      .agg(count(lit(1)).as("n_docs"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
  }

  /** c35's DuckDB twin: same plants, same contains screen, same
    * roll-up. */
  private val canaryOracle: String =
    s"""WITH p AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 97 = 0 AND doc_id % 2 = 0
                      THEN text || ' $CanaryA'
                      WHEN doc_id % 97 = 0
                      THEN text || ' $CanaryB'
                      ELSE text END AS text
          FROM documents),
        c AS (SELECT '$CanaryA' AS canary
              UNION ALL SELECT '$CanaryB')
      SELECT c.canary, count(*) AS n_docs,
             min(p.doc_id) AS first_doc, max(p.doc_id) AS last_doc
      FROM p JOIN c ON contains(p.text, c.canary)
      GROUP BY c.canary"""

  /** The c34 selection hash — one string, both engines. */
  private val NeymanHash =
    graft.operators.PortableHash.packed("'ney7:' || doc_id")

  /** c34: NEYMAN-ALLOCATED STRATIFIED SAMPLE (Neyman 1934) — the
    * statistically optimal audit-sample allocator: where c07 keeps a
    * fixed RATE per stratum, Neyman allocation sizes each stratum's
    * sample ∝ N_h·S_h (size × spread), so a fixed labeling budget
    * buys the minimum-variance estimate of corpus quality — the
    * allocator behind every "manually audit 100 docs" QA pass.
    * Strata = source, measurement = n_chars; allocation is EXACT
    * integer arithmetic (weights land on a 1e-4 grid as longs, the
    * budget share is one integer division — the g34 lesson: never
    * let a float sum feed a floor), capped at the stratum
    * population; selection inside a stratum is the seeded portable
    * hash order with doc-id tie-break (the c11/c14 discipline).
    * Output: the selected rows with their stratum's allocation. */
  def neymanSample(spark: SparkSession, sfDir: String,
      budget: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = Persists.barrier(
      docs(spark, sfDir).select("doc_id", "source", "n_chars"))
    val st = d.groupBy("source").agg(count(lit(1)).as("nh"),
      round(coalesce(nanvl(stddev_samp(col("n_chars")), lit(0.0)),
        lit(0.0)), 6).as("sh"))
      .withColumn("wi",
        expr("CAST(round(nh * sh * 10000, 0) AS BIGINT)"))
    val tot = st.agg(sum("wi").as("tw"))
    val alloc = st.crossJoin(broadcast(tot))
      .select(col("source"),
        least(col("nh"), expr(s"($budget * wi) div tw")).as("alloc"))
    val w = Window.partitionBy("source")
      .orderBy(expr(NeymanHash).asc, col("doc_id").asc)
    d.join(broadcast(alloc), "source")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= col("alloc"))
      .select("doc_id", "source", "n_chars", "alloc")
  }

  /** c34's DuckDB twin: same 6-dp stddev, same 1e-4 integer weight
    * grid and integer budget share, same hash-ordered pick. */
  private val neymanOracle: String =
    s"""WITH d AS (SELECT doc_id, source, n_chars FROM documents),
        st AS (SELECT source, count(*) AS nh,
                      round(coalesce(stddev_samp(n_chars), 0.0), 6)
                        AS sh
               FROM d GROUP BY 1),
        w AS (SELECT source, nh,
                     CAST(round(nh * sh * 10000, 0) AS BIGINT) AS wi
              FROM st),
        t AS (SELECT CAST(sum(wi) AS BIGINT) AS tw FROM w),
        a AS (SELECT w.source,
                     least(w.nh, (100 * w.wi) // t.tw) AS alloc
              FROM w, t),
        r AS (SELECT d.doc_id, d.source, d.n_chars, a.alloc,
                     row_number() OVER (PARTITION BY d.source
                       ORDER BY $NeymanHash, d.doc_id) AS rk
              FROM d JOIN a USING (source))
      SELECT doc_id, source, n_chars, alloc FROM r WHERE rk <= alloc"""

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c36_k_anonymity" -> (kAnonymity _),
    "c34_neyman_sample" ->
      ((s: SparkSession, d: String) => neymanSample(s, d)),
    "c35_canary_scan" -> (canaryScan _),
    "c33_mix_anneal" ->
      ((s: SparkSession, d: String) => mixAnneal(s, d)),
    "c32_doremi_waterfill" ->
      ((s: SparkSession, d: String) => doremiWaterfill(s, d)),
    "c31_doremi_weights" ->
      ((s: SparkSession, d: String) => doremiStep(s, d)),
    "c30_waterfill_budget" ->
      ((s: SparkSession, d: String) => waterfillBudget(s, d)),
    "c29_dataset_card" ->
      ((s: SparkSession, d: String) => datasetCard(s, d)),
    "c27_dsir_select" ->
      ((s: SparkSession, d: String) => dsirSelect(s, d)),
    "c25_multilingual_pipeline" ->
      ((s: SparkSession, d: String) => multilingualPipeline(s, d)),
    "c24_temperature_mix_langid" ->
      ((s: SparkSession, d: String) => temperatureMixLangid(s, d)),
    "c23_substring_decontam" ->
      ((s: SparkSession, d: String) => substringDecontam(s, d)),
    "c22_token_budget_mix" ->
      ((s: SparkSession, d: String) => tokenBudgetMix(s, d)),
    "c21_contamination_report" ->
      ((s: SparkSession, d: String) => contaminationReport(s, d)),
    "c20_neardup_decontam" ->
      ((s: SparkSession, d: String) => neardupDecontam(s, d)),
    "c19_temporal_split" -> (temporalSplit _),
    "c08_mix_report" -> (mixReport _),
    "c01_hash_split" -> (hashSplit _),
    "c02_source_quota" -> ((s: SparkSession, d: String) => sourceQuota(s, d)),
    "c03_pipeline" -> ((s: SparkSession, d: String) => pipeline(s, d)),
    "c04_decontaminate" -> ((s: SparkSession, d: String) => decontaminate(s, d)),
    "c12_decontam_bloom" -> ((s: SparkSession, d: String) => decontaminateBloom(s, d)),
    "c05_pii_redact" -> (piiRedact _),
    "c07_sample_stratified" -> (sampleStratified _),
    "c17_reservoir_sample" ->
      ((s: SparkSession, d: String) => reservoirSample(s, d)),
    "c18_dedup_aware_split" ->
      ((s: SparkSession, d: String) => dedupAwareSplit(s, d)),
    "c26_curriculum" -> ((s: SparkSession, d: String) => curriculum(s, d)),
    "c11_epoch_shuffle" -> ((s: SparkSession, d: String) => epochShuffle(s, d)),
    "c13_chunking" -> ((s: SparkSession, d: String) => chunkDocs(s, d)),
    "c14_negative_samples" ->
      ((s: SparkSession, d: String) => negativeSamples(s, d)),
    "c15_weighted_sample" ->
      ((s: SparkSession, d: String) => weightedSample(s, d)),
    "c16_temperature_mix" ->
      ((s: SparkSession, d: String) => temperatureMix(s, d))
  )

  /** Both engines compute the same lowercase-hex md5, so the selections
    * are byte-identical; rk is CAST to INTEGER (Spark row_number is
    * int32, DuckDB int64). */
  /** c05's DuckDB twin: same fixture construction (the shared
    * engine-neutral [[piiTextSql]]), same patterns, same replace order;
    * DuckDB's regexp_replace is first-match-only without the 'g' flag,
    * and its len() is int64 where Spark's size() is int32. */
  private val piiOracle: String = {
    def rr(inner: String, pat: String, tag: String) =
      s"regexp_replace($inner, '$pat', '<$tag>', 'g')"
    val afterEmail = rr("pt", emailPat, "EMAIL")
    val afterIp = rr(afterEmail, ipPat, "IP")
    def cnt(src: String, pat: String, as: String) =
      s"CAST(len(regexp_extract_all($src, '$pat')) AS INTEGER) AS $as"
    s"""WITH p AS (SELECT doc_id, ($piiTextSql) AS pt FROM documents)
        SELECT doc_id, ${rr(afterIp, phonePat, "PHONE")} AS clean,
               ${cnt("pt", emailPat, "n_email")},
               ${cnt(afterEmail, ipPat, "n_ip")},
               ${cnt(afterIp, phonePat, "n_phone")}
        FROM p"""
  }

  private[graft] val stratOracle: String =
    s"""SELECT doc_id, lang, source FROM documents
        WHERE $stratFilterSql"""

  /** Same hash, same tie-break; rk CAST to INTEGER (the c01 note:
    * Spark row_number is int32, DuckDB's is int64). */
  private val reservoirOracle: String =
    """SELECT doc_id, source, CAST(rk AS INTEGER) AS rk FROM (
         SELECT doc_id, source,
                row_number() OVER (
                  PARTITION BY source
                  ORDER BY md5(concat('42:', CAST(doc_id AS VARCHAR))),
                           doc_id) AS rk
         FROM documents)
       WHERE rk <= 20"""

  /** c20's DuckDB twin: the d06 signature/banding/jaccard CTE algebra
    * (same md5-slice slot minima via [[DedupOps.portableSlot]], same
    * band packing, same jaccard) with the candidate join restricted to
    * train × eval. */
  private val neardupDecontamOracle: String = {
    val mins = (0 until 8).map(i =>
      s"min(${DedupOps.portableSlot(i)}) AS m$i").mkString(", ")
    s"""WITH w AS (SELECT doc_id, source, text,
                          string_split(text, ' ') AS ws
                   FROM documents),
        doc_sh AS (SELECT doc_id, source,
                          CASE WHEN len(ws) < 4 THEN [text]
                               ELSE list_distinct(list_transform(
                                      range(1, len(ws) - 2),
                                      i -> array_to_string(ws[i:i+3], ' ')))
                          END AS shl
                   FROM w),
        sh AS (SELECT doc_id, unnest(shl) AS s FROM doc_sh),
        sig AS (SELECT doc_id, $mins FROM sh GROUP BY doc_id),
        bands AS (
          SELECT doc_id, 0 AS band, m0 * 2147483648 + m1 AS bsig FROM sig
          UNION ALL SELECT doc_id, 1, m2 * 2147483648 + m3 FROM sig
          UNION ALL SELECT doc_id, 2, m4 * 2147483648 + m5 FROM sig
          UNION ALL SELECT doc_id, 3, m6 * 2147483648 + m7 FROM sig),
        bsrc AS (SELECT b.doc_id, b.band, b.bsig, d.source
                 FROM bands b JOIN doc_sh d USING (doc_id)),
        cand AS (SELECT DISTINCT t.doc_id AS train_id, e.doc_id AS eval_id
                 FROM bsrc t JOIN bsrc e
                   ON t.band = e.band AND t.bsig = e.bsig
                 WHERE t.source <> 'src0' AND e.source = 'src0'),
        j AS (SELECT train_id, eval_id,
                     round(CAST(len(list_intersect(a.shl, b.shl)) AS DOUBLE) /
                           len(list_distinct(list_concat(a.shl, b.shl))),
                           4) AS jaccard
              FROM cand
              JOIN doc_sh a ON a.doc_id = cand.train_id
              JOIN doc_sh b ON b.doc_id = cand.eval_id)
      SELECT train_id, eval_id, jaccard FROM j WHERE jaccard >= 0.4"""
  }

  /** c21's DuckDB twin: the c04 CTE family (8-word shingles, renamed
    * d8/e8/t8) and the c20 family side by side, each rolled up to
    * eval grain, full-outer merged. */
  private val contaminationReportOracle: String = {
    val mins = (0 until 8).map(i =>
      s"min(${DedupOps.portableSlot(i)}) AS m$i").mkString(", ")
    s"""WITH d8 AS (
         SELECT doc_id, source,
                CASE WHEN len(string_split(text, ' ')) < 8 THEN [text]
                     ELSE list_distinct(list_transform(
                            range(1, len(string_split(text, ' ')) - 6),
                            i -> array_to_string(
                                   string_split(text, ' ')[i:i+7], ' ')))
                END AS shl
         FROM documents),
       e8 AS (SELECT doc_id AS eval_id, unnest(shl) AS key FROM d8
              WHERE source = 'src0'),
       t8 AS (SELECT doc_id AS train_id, unnest(shl) AS key FROM d8
              WHERE source <> 'src0'),
       exact AS (SELECT eval_id,
                        count(DISTINCT train_id) AS n_exact
                 FROM t8 JOIN e8 USING (key) GROUP BY eval_id),
       w AS (SELECT doc_id, source, text,
                    string_split(text, ' ') AS ws
             FROM documents),
       doc_sh AS (SELECT doc_id, source,
                         CASE WHEN len(ws) < 4 THEN [text]
                              ELSE list_distinct(list_transform(
                                     range(1, len(ws) - 2),
                                     i -> array_to_string(ws[i:i+3], ' ')))
                         END AS shl
                  FROM w),
       sh AS (SELECT doc_id, unnest(shl) AS s FROM doc_sh),
       sig AS (SELECT doc_id, $mins FROM sh GROUP BY doc_id),
       bands AS (
         SELECT doc_id, 0 AS band, m0 * 2147483648 + m1 AS bsig FROM sig
         UNION ALL SELECT doc_id, 1, m2 * 2147483648 + m3 FROM sig
         UNION ALL SELECT doc_id, 2, m4 * 2147483648 + m5 FROM sig
         UNION ALL SELECT doc_id, 3, m6 * 2147483648 + m7 FROM sig),
       bsrc AS (SELECT b.doc_id, b.band, b.bsig, d.source
                FROM bands b JOIN doc_sh d USING (doc_id)),
       cand AS (SELECT DISTINCT t.doc_id AS train_id, e.doc_id AS eval_id
                FROM bsrc t JOIN bsrc e
                  ON t.band = e.band AND t.bsig = e.bsig
                WHERE t.source <> 'src0' AND e.source = 'src0'),
       j AS (SELECT train_id, eval_id,
                    round(CAST(len(list_intersect(a.shl, b.shl)) AS DOUBLE) /
                          len(list_distinct(list_concat(a.shl, b.shl))),
                          4) AS jaccard
             FROM cand
             JOIN doc_sh a ON a.doc_id = cand.train_id
             JOIN doc_sh b ON b.doc_id = cand.eval_id),
       near AS (SELECT eval_id,
                       count(DISTINCT train_id) AS n_near
                FROM j WHERE jaccard >= 0.4 GROUP BY eval_id)
      SELECT coalesce(exact.eval_id, near.eval_id) AS eval_id,
             coalesce(n_exact, 0) AS n_exact_train,
             coalesce(n_near, 0) AS n_neardup_train
      FROM exact FULL OUTER JOIN near ON exact.eval_id = near.eval_id"""
  }

  def oracleSql: Map[String, String] = Map(
    "c34_neyman_sample" -> neymanOracle,
    "c35_canary_scan" -> canaryOracle,
    "c36_k_anonymity" -> kAnonymityOracle,
    "c33_mix_anneal" -> mixAnnealOracle(4),
    "c32_doremi_waterfill" -> doremiWaterfillOracle,
    "c31_doremi_weights" -> doremiOracle,
    "c30_waterfill_budget" -> waterfillOracle,
    "c29_dataset_card" -> datasetCardOracle,
    // c27: same bigram explode, same md5-packed bucket hash (shared
    // SQL text), same add-1 log-ratio census, same 4-dp rounding
    // before the (weight desc, doc_id) top-N cut
    "c27_dsir_select" -> {
      val b = graft.operators.PortableHash.packed("feat", 6)
      s"""WITH toks AS (
           SELECT doc_id, source, string_split(text, ' ') AS t
           FROM documents),
         f AS (SELECT doc_id, source,
                      unnest(list_transform(range(1, len(t)),
                        i -> t[i] || ' ' || t[i + 1])) AS feat
               FROM toks WHERE len(t) >= 2),
         fb AS (SELECT doc_id, source, $b % $DsirBuckets AS b FROM f),
         cnt AS (SELECT b,
                        sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END)
                          AS ct,
                        sum(CASE WHEN source <> 'src0' THEN 1 ELSE 0 END)
                          AS cr
                 FROM fb GROUP BY b),
         tot AS (SELECT sum(ct) AS tt, sum(cr) AS tr FROM cnt),
         lr AS (SELECT b, ln((ct + 1) / (tt + $DsirBuckets.0)) -
                          ln((cr + 1) / (tr + $DsirBuckets.0)) AS lr
                FROM cnt, tot),
         w AS (SELECT doc_id, round(sum(lr), 4) AS weight
               FROM fb JOIN lr USING (b)
               WHERE source <> 'src0'
               GROUP BY doc_id)
         SELECT doc_id, weight FROM w
         ORDER BY weight DESC, doc_id LIMIT $DsirTopN"""
    },
    // c25: the c24 oracle (langid → mix) anti-joined against c23's
    // contaminated train ids — stage oracles composed verbatim
    "c25_multilingual_pipeline" -> {
      val h = graft.operators.PortableHash.packed(
        "'tmix' || 7 || ':' || doc_id")
      val contamSql = DedupOps.substringOracle(
        """SELECT a.doc_id AS ka, b.doc_id AS kb, a.pos AS pa, b.pos AS pb
           FROM cold a JOIN cold b
             ON a.w = b.w AND a.source <> 'src0' AND b.source = 'src0'""",
        "train_id", "eval_id")
      s"""WITH langid AS MATERIALIZED (
           SELECT * FROM (${TextOps.langIdModelOracle}) q),
         c AS (SELECT lang, count(*) AS cnt FROM langid GROUP BY lang),
         r AS (SELECT lang,
                      sqrt((SELECT min(cnt) FROM c) * 1.0 / cnt) AS rate
               FROM c),
         kept AS (
           SELECT l.doc_id, l.lang
           FROM langid l JOIN r ON r.lang = l.lang
           WHERE $h % 1000000 < CAST(floor(rate * 1000000) AS BIGINT)),
         contam AS (SELECT DISTINCT train_id FROM ($contamSql))
       SELECT doc_id, lang FROM kept
       WHERE doc_id NOT IN (SELECT train_id FROM contam)"""
    },
    // c24: t18's langid oracle embedded as the source of the c16 mix —
    // same √-flattening, same seeded portable hash, keyed on lang_pred
    "c24_temperature_mix_langid" -> {
      val h = graft.operators.PortableHash.packed(
        "'tmix' || 7 || ':' || doc_id")
      s"""WITH langid AS MATERIALIZED (
           SELECT * FROM (${TextOps.langIdModelOracle}) q),
         c AS (SELECT lang, count(*) AS cnt FROM langid GROUP BY lang),
         r AS (SELECT lang,
                      sqrt((SELECT min(cnt) FROM c) * 1.0 / cnt) AS rate
               FROM c)
       SELECT l.doc_id, l.lang
       FROM langid l JOIN r ON r.lang = l.lang
       WHERE $h % 1000000 < CAST(floor(rate * 1000000) AS BIGINT)"""
    },
    // c23: d16's window/island oracle with the candidate join split
    // across the train/eval boundary (src0 = eval, the c04 convention)
    "c23_substring_decontam" -> DedupOps.substringOracle(
      """SELECT a.doc_id AS ka, b.doc_id AS kb, a.pos AS pa, b.pos AS pb
         FROM cold a JOIN cold b
           ON a.w = b.w AND a.source <> 'src0' AND b.source = 'src0'""",
      "train_id", "eval_id"),
    // c22: same token count (space split), same inclusive running sum
    // on the same (source, doc_id) order, same ceiling semantics
    "c22_token_budget_mix" ->
      """SELECT doc_id, source, tokens, cum_tokens
         FROM (SELECT doc_id, source,
                      CAST(len(string_split(text, ' ')) AS BIGINT)
                        AS tokens,
                      CAST(sum(len(string_split(text, ' ')))
                             OVER (PARTITION BY source ORDER BY doc_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                            AND CURRENT ROW) AS BIGINT)
                        AS cum_tokens
               FROM documents)
         WHERE cum_tokens <= 800""",
    "c21_contamination_report" -> contaminationReportOracle,
    "c20_neardup_decontam" -> neardupDecontamOracle,
    // c19: the same exact-integer cutoff arithmetic (epoch-day grid,
    // integer division) and the same three-way CASE
    "c19_temporal_split" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day
                    FROM events),
          b AS (SELECT min(day) AS lo, max(day) AS hi FROM e),
          s AS (SELECT user_id,
                       CASE WHEN day <= lo + (hi - lo) * 70 // 100
                            THEN 'train'
                            WHEN day > lo + (hi - lo) * 70 // 100 + 2
                            THEN 'test'
                            ELSE 'embargo' END AS split
                FROM e, b)
        SELECT split, count(*) AS n_events,
               count(DISTINCT user_id) AS n_users
        FROM s GROUP BY split""",
    "c17_reservoir_sample" -> reservoirOracle,
    "c18_dedup_aware_split" -> dedupAwareSplitOracle,
    "c16_temperature_mix" -> {
      val h = graft.operators.PortableHash.packed(
        "'tmix' || 7 || ':' || doc_id")
      s"""WITH c AS (SELECT source, count(*) AS cnt
                     FROM documents GROUP BY source),
          r AS (SELECT source,
                       sqrt((SELECT min(cnt) FROM c) * 1.0 / cnt) AS rate
                FROM c)
        SELECT doc_id, d.source
        FROM documents d JOIN r ON r.source = d.source
        WHERE $h % 1000000 < CAST(floor(rate * 1000000) AS BIGINT)"""
    },
    "c15_weighted_sample" -> {
      val h = graft.operators.PortableHash.packed(
        "'wsamp' || 7 || ':' || doc_id")
      s"""SELECT doc_id, source, n_chars FROM documents
          WHERE $h % 1000000 < least(1000000, n_chars * 500)"""
    },
    // same seeded-hash derivation in DuckDB (the PortableHash string is
    // engine-shared; || stringifies ints identically)
    "c14_negative_samples" -> {
      val h = graft.operators.PortableHash.packed(
        "'neg' || 7 || ':' || anchor_id || ':' || j")
      s"""WITH nrow AS (SELECT count(*) AS n FROM documents),
          a AS (SELECT doc_id AS anchor_id, unnest(range(0, 3)) AS j
                FROM documents),
          m AS (SELECT anchor_id, j,
                       CASE WHEN $h % n = anchor_id
                            THEN ($h % n + 1) % n
                            ELSE $h % n END AS neg_id
                FROM a, nrow)
        SELECT anchor_id, j, neg_id, d.source AS neg_source
        FROM m JOIN documents d ON d.doc_id = m.neg_id"""
    },
    // same window algebra in DuckDB list math: range() excludes the
    // upper bound like sequence(0, len-1, s) includes it — identical
    // start sets for len ≥ 1; ws[a : a+w-1] is the 1-based inclusive
    // slice matching Spark's slice(ws, a, w)
    "c13_chunking" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
                    FROM documents),
          s AS (SELECT doc_id, ws, unnest(range(0, len(ws), 48)) AS start
                FROM w)
        SELECT doc_id, start // 48 AS chunk_id,
               CAST(len(ws[start + 1 : start + 64]) AS BIGINT) AS n_tokens,
               array_to_string(ws[start + 1 : start + 64], ' ') AS chunk_text
        FROM s""",
    "c26_curriculum" -> curriculumOracle,
    "c11_epoch_shuffle" -> {
      val h = graft.operators.PortableHash.packed("'epoch' || 7 || ':' || doc_id")
      s"""SELECT doc_id, CAST(h % 8 AS INTEGER) AS shard,
                 CAST(row_number() OVER (PARTITION BY h % 8
                        ORDER BY h, doc_id) AS INTEGER) AS pos
          FROM (SELECT doc_id, $h AS h FROM documents)"""
    },
    "c08_mix_report" ->
      """WITH cells AS (
           SELECT source, lang, count(*) AS docs,
                  CAST(sum(n_chars) AS BIGINT) AS chars
           FROM documents GROUP BY source, lang)
         SELECT source, lang, docs, chars,
                round(docs / CAST(sum(docs) OVER () AS DOUBLE), 4)
                  AS doc_share,
                round(chars / CAST(sum(chars) OVER () AS DOUBLE), 4)
                  AS char_share
         FROM cells""",
    "c05_pii_redact" -> piiOracle,
    "c07_sample_stratified" -> stratOracle,
    "c01_hash_split" ->
      """SELECT doc_id, lang, source, n_chars FROM documents
         WHERE substr(md5(text), 1, 1) IN ('0', '1')""",
    "c02_source_quota" ->
      """SELECT doc_id, source, rk FROM (
           SELECT doc_id, source,
                  CAST(row_number() OVER (PARTITION BY source
                         ORDER BY md5(text), doc_id) AS INTEGER) AS rk
           FROM documents)
         WHERE rk <= 15""",
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
        SELECT doc_id, source, rk FROM ranked WHERE rk <= 10""",
    // the shingle CTE is the WordShingles contract: sliding distinct
    // 8-word windows, whole text when shorter (see d04's oracle)
    "c04_decontaminate" -> decontamOracle,
    // c12 is c04 under a lossless prefilter, so the SAME oracle gates
    // it: bloom false positives die in the exact join, false negatives
    // cannot exist
    "c12_decontam_bloom" -> decontamOracle
  )

  private val decontamOracle: String =
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
}
