package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Deduplication operators for training-data pipelines: exact,
  * MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.
  *
  * Scale design (100 TB): every variant is
  *   map (signature, narrow) → explode small constant factor →
  *   shuffle on bucket key → within-bucket pair join → verify.
  * No O(n²) stage anywhere: candidate generation is banded LSH (pairs
  * only meet if they collide in a band), and verification only touches
  * candidate pairs. All signatures are built from codegen'd higher-order
  * array functions + xxhash64 — no UDFs, fully whole-stage-codegen.
  */
object DedupOps {

  private def docs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "documents")

  // ------------------------------------------------------------------ exact
  /** Exact dedup: hash-groupBy on content. At 100 TB you'd group on
    * md5(text) (fixed 16-byte shuffle key) rather than the full text —
    * same result, cheaper shuffle; both forms below hash-match. */
  val exactSql: String =
    """SELECT min(doc_id) AS keep_id, count(*) AS copies
       FROM documents GROUP BY md5(text)"""

  // -------------------------------------------------------------- MinHash
  /** MinHash signature via the native codegen expression
    * [[graft.functions.MinHashSig]] — one fused pass over the shingles
    * (see MinHashSigSpec for equivalence with the HOF formulation). */
  private def withMinhash(df: DataFrame, k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.withColumn("sh", Shingles.wordShingles("text", 4))
      .withColumn("mh", expr(s"graft_minhash(sh, $k)"))
  }

  /** MinHash + LSH banded dedup: b bands of r rows; docs collide in a
    * band iff their signature slice matches, then candidates are verified
    * with exact shingle-set Jaccard. Returns pairs (a < b) with
    * jaccard ≥ threshold. */
  def minhashLsh(
      spark: SparkSession, sfDir: String,
      bands: Int = 8, rows: Int = 4, threshold: Double = 0.4,
      maxBucketFreq: Long = 5000): DataFrame =
    minhashLshOn(docs(spark, sfDir), bands, rows, threshold, maxBucketFreq,
      corpusRows = Some(Tables.rowCount(spark, sfDir, "documents")))

  /** [[minhashLsh]] over any (doc_id, text) frame — fixture-injectable.
    *
    * `maxBucketFreq` is the hot-bucket cutoff (the d05 pattern applied
    * to minhash bands): a (band, signature) bucket hotter than the cap —
    * boilerplate-heavy corpora collapse most of a band's population onto
    * one signature — is dropped from BOTH sides of the candidate join,
    * bounding per-bucket pair work at cap²/2 instead of going quadratic
    * in the duplicate-cluster size. A dropped cluster's pairs are the
    * documented recall loss (exact dedup, d01, is the upstream pass that
    * owns identical-text removal); pairs that also collide in a colder
    * band still surface. Skipped outright when the corpus row count is
    * KNOWN and ≤ the cap (dominance short-circuit — see
    * [[embeddingNearDupOn]]), which keeps every test-SF output
    * byte-identical. */
  def minhashLshOn(
      input: DataFrame,
      bands: Int = 8, rows: Int = 4, threshold: Double = 0.4,
      maxBucketFreq: Long = 5000,
      corpusRows: Option[Long] = None): DataFrame = {
    // Persist the signatures: the banding below references `mh` once per
    // band and the self-join reads it twice — without a materialization
    // barrier CollapseProject inlines the whole minhash computation into
    // every reference (observed 8-16x recompute). At cluster scale this
    // is a checkpoint of the signature table; locally persist() is the
    // same barrier.
    val d = Persists.barrier(withMinhash(input, bands * rows)
      .select(col("doc_id"), col("sh"), col("mh")))
    val banded = d.select(
      col("doc_id"),
      posexplode(expr(
        s"""transform(sequence(0, ${bands - 1}),
              b -> xxhash64(slice(mh, b * $rows + 1, $rows)))"""))
        .as(Seq("band", "sig")))
    val cold = dropHotBuckets(banded, Seq("band", "sig"), maxBucketFreq,
      corpusRows)
    val cand = cold.as("x").join(cold.as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .distinct()
    val sh = d.select(col("doc_id"), col("sh"))
    cand
      .join(sh.as("sa"), col("id_a") === col("sa.doc_id"))
      .join(sh.as("sb"), col("id_b") === col("sb.doc_id"))
      .select(col("id_a"), col("id_b"),
        round(size(array_intersect(col("sa.sh"), col("sb.sh"))).cast("double") /
          size(array_union(col("sa.sh"), col("sb.sh"))), 4).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** The hot-bucket guard shared by every banded candidate generator:
    * drop rows of buckets (grouped by `keys`) hotter than `cap` from the
    * frame, or the frame untouched when the corpus row count is KNOWN
    * and ≤ cap (no bucket can then exceed it — provably a no-op, so the
    * guard pass is skipped). */
  private[operators] def dropHotBuckets(
      df: DataFrame, keys: Seq[String], cap: Long,
      corpusRows: Option[Long]): DataFrame =
    if (corpusRows.exists(_ <= cap)) df
    else {
      val hot = df.groupBy(keys.map(col): _*).count()
        .filter(col("count") > cap).select(keys.map(col): _*)
      df.join(broadcast(hot), keys, "left_anti")
    }

  /** [[minhashLsh]] with the PORTABLE hash family: one md5 per shingle,
    * its 32 hex chars sliced into 8 disjoint 4-char (packed < 2^31)
    * slots — 8 independent hash functions from one digest. Slot minima
    * over the shingle set form the signature; bands of 2 slots bucket
    * candidates; exact jaccard verifies. Not the hot path (d02's native
    * xxhash64 kernel stays the benched implementation) — this twin
    * exists because every step is DuckDB-expressible, so the BANDING
    * ALGEBRA (signature slicing, candidate generation, verification)
    * gets a hash-exact oracle that the xxhash64 form cannot have. */
  /** chars 4i+1..4i+4 of md5(s), ascii-packed — ONE string shared by the
    * Spark implementation and the DuckDB oracle (identical SQL text, so
    * the two can never drift). */
  private[graft] def portableSlot(i: Int): String =
    (0 until 4).map { c =>
      s"ascii(substr(md5(s), ${4 * i + c + 1}, 1)) * ${1L << (8 * (3 - c))}"
    }.mkString("(", " + ", ")")

  /** The 8-slot portable signature over a `sh` shingle column, and the
    * 4-band packing over the resulting `sig` — shared with the
    * STREAMING near-dup operator so both compute the identical
    * candidate algebra the d06 DuckDB oracle checks. */
  private[graft] val portableSigSql: String = (0 until 8).map(i =>
    s"array_min(transform(sh, s -> ${portableSlot(i)}))")
    .mkString("array(", ", ", ")")

  /** [[portableSigSql]] computed in ONE pass over the shingle set —
    * the ENGINE-side twin of the shared text. The shared form
    * re-evaluates md5(s) 32× per shingle (4 chars × 8 slots; lambda
    * bodies run interpreted with no common-subexpression elimination),
    * which the r16 optimization round measured as the dominant cost of
    * the c20/c21 decontamination entries. Here each shingle is hashed
    * once and the 8 running minima fold in a single aggregate:
    * IDENTICAL values and the IDENTICAL array&lt;int&gt; type (md5 is
    * pure; min over a set = fold of least; 2147483647 > any packed
    * slot, and an empty shingle set yields the same all-NULL
    * signature), so every d06-family oracle hash — checked against
    * the DuckDB twin, which keeps the shared text — is unchanged. */
  private[graft] val portableSigFastSql: String = {
    def slotH(i: Int): String = (0 until 4).map { c =>
      s"ascii(substr(h, ${4 * i + c + 1}, 1)) * ${1L << (8 * (3 - c))}"
    }.mkString("(", " + ", ")")
    val slots = (0 until 8).map(slotH).mkString("array(", ", ", ")")
    s"""CASE WHEN size(sh) = 0 THEN
          array(${Seq.fill(8)("CAST(NULL AS INT)").mkString(", ")})
        ELSE aggregate(
          transform(sh, s -> md5(s)),
          array_repeat(2147483647, 8),
          (acc, h) -> zip_with(acc, $slots, (a, b) -> least(a, b)))
        END"""
  }

  /** 2^31 multiplier: a slot packs 4 ascii codes ≤ ~1.7e9 < 2^31, so
    * the two slot values occupy disjoint ranges of the band signature. */
  private[graft] val portableBandSql: String =
    """transform(sequence(0, 3),
         b -> element_at(sig, b * 2 + 1) * 2147483648L +
              element_at(sig, b * 2 + 2))"""

  /** The 4 band signatures DIRECTLY over `sh`, each slot expression
    * appearing exactly once — for plans that cannot take a persist
    * barrier between signature and banding (streams): referencing an
    * intermediate `sig` column twice per band would let CollapseProject
    * inline the full 8-slot computation into every reference (~8×
    * recompute; the batch path persists instead). */
  private[graft] val portableBandsDirectSql: String = {
    def slot(i: Int) =
      s"array_min(transform(sh, s -> ${portableSlot(i)}))"
    (0 until 4).map(b =>
      s"${slot(2 * b)} * 2147483648L + ${slot(2 * b + 1)}")
      .mkString("array(", ", ", ")")
  }

  /** The (doc_id, sh, sig) portable-signature computation shared by
    * [[minhashPortable]], [[incrementalDedup]] and the materialized
    * ingest table — one definition of the signature algebra. */
  private def portableSigCompute(
      spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    docs(spark, sfDir)
      .withColumn("sh", Shingles.wordShingles("text", 4))
      .withColumn("sig", expr(portableSigFastSql))
      .select(col("doc_id"), col("sh"), col("sig"))
  }

  /** [[portableSigCompute]] behind a persist barrier — the in-flight
    * form (the signature feeds both sides of the candidate join;
    * without the barrier CollapseProject recomputes the md5 slots per
    * reference). */
  private def portableSigFrame(spark: SparkSession, sfDir: String): DataFrame =
    Persists.barrier(portableSigCompute(spark, sfDir))

  /** The signature table MATERIALIZED to parquet, idempotent per
    * (sfDir, corpus row count) — the production ingest shape: at
    * 100 TB signatures are computed once when a batch lands and every
    * downstream dedup reads the stored table, so the benched
    * incremental-dedup cost is the candidate join, not a
    * re-fingerprint of the whole corpus per run. The row count in the
    * key catches the common staleness hazard (testdata regenerated at
    * a different size under the same path); a same-size regeneration
    * still requires clearing target/tmp — the limit of any
    * path-keyed artifact without a full content hash. */
  def signatureTablePath(spark: SparkSession, sfDir: String): String = {
    val n = Tables.rowCount(spark, sfDir, "documents")
    val dir = graft.sources.FsUtil.qualified("target/tmp/dedup_sigs/" +
      graft.sources.FsUtil.sanitize(sfDir) + s"_n$n")
    if (!graft.sources.FsUtil.exists(spark, dir + "/_SUCCESS"))
      portableSigCompute(spark, sfDir).write.mode("overwrite").parquet(dir)
    dir
  }

  /** [[incrementalDedup]] reading the pre-materialized signature table
    * instead of recomputing signatures inline — result-identical
    * (DedupOpsSpec), benched as `d12i` so the round-5 series isn't
    * 65% one query's ingest-side md5 work (BASELINE.md documents the
    * r6→r7 series change). No persist barrier: the stored table is
    * scanned per use, the normal shape for an ingest artifact. */
  def incrementalDedupFromSigs(
      spark: SparkSession, sfDir: String,
      threshold: Double = 0.4): DataFrame = {
    val path = signatureTablePath(spark, sfDir)
    val cut = Tables.rowCount(spark, sfDir, "documents") * 9 / 10
    portablePairs(spark.read.parquet(path), threshold, col("doc_id") >= cut)
  }

  /** d13: LSH candidates verified by EDIT DISTANCE instead of shingle
    * jaccard — the other standard verify stage of a near-dup pipeline
    * (candidates are cheap and approximate; the verifier is exact and
    * runs only on candidate pairs). Levenshtein over a `prefixLen`-char
    * prefix bounds the verifier at O(prefixLen²) per PAIR — constant
    * work independent of document length, the property that keeps the
    * stage linear in candidates at 100 TB (full-text edit distance is
    * quadratic in document size and never worth it when a prefix
    * decides). Spark's `levenshtein` is codegen'd, so the verify runs
    * inside the join's codegen span; production can pass the 3-arg
    * threshold form (early-abandons above the cutoff) — the gate uses
    * the 2-arg form for DuckDB parity. */
  def editDistDedup(
      spark: SparkSession, sfDir: String,
      prefixLen: Int = 96, maxDist: Int = 24): DataFrame =
    editDistVerify(spark, sfDir, portableSigFrame(spark, sfDir),
      prefixLen, maxDist)

  /** [[editDistDedup]] over the PRE-MATERIALIZED signature table — the
    * production ingest shape (the d12i discipline: signatures are
    * computed once when a batch lands, every verify pass reads the
    * stored table). Result-identical to the inline form
    * (DedupOpsSpec); benched as `d13i` so the round-8 series times the
    * candidate join + levenshtein verify, not a corpus re-fingerprint
    * per run. */
  def editDistDedupFromSigs(
      spark: SparkSession, sfDir: String,
      prefixLen: Int = 96, maxDist: Int = 24): DataFrame = {
    val path = signatureTablePath(spark, sfDir)
    editDistVerify(spark, sfDir, spark.read.parquet(path),
      prefixLen, maxDist)
  }

  private def editDistVerify(
      spark: SparkSession, sfDir: String, sigs: DataFrame,
      prefixLen: Int, maxDist: Int): DataFrame =
    editDistVerifyFrames(docs(spark, sfDir), sigs, prefixLen, maxDist)

  private def editDistVerifyFrames(
      d: DataFrame, sigs: DataFrame,
      prefixLen: Int, maxDist: Int): DataFrame = {
    val cand = bandCandidates(sigs, lit(true))
    val pre = d
      .select(col("doc_id"), substring(col("text"), 1, prefixLen).as("pre"))
    cand
      .join(pre.as("ta"), col("id_a") === col("ta.doc_id"))
      .join(pre.as("tb"), col("id_b") === col("tb.doc_id"))
      .select(col("id_a"), col("id_b"),
        levenshtein(col("ta.pre"), col("tb.pre")).as("edit_dist"))
      .filter(col("edit_dist") <= maxDist)
  }

  /** [[editDistDedup]] over an arbitrary (doc_id, text) frame — the
    * ScaleProbe surface: signatures computed inline behind a barrier,
    * then the same candidate + verify pipeline. */
  private[graft] def editDistDedupOn(
      d: DataFrame, prefixLen: Int = 96, maxDist: Int = 24): DataFrame = {
    graft.functions.GraftFunctions.register(d.sparkSession)
    val sigs = Persists.barrier(d
      .withColumn("sh", Shingles.wordShingles("text", 4))
      .withColumn("sig", expr(portableSigFastSql))
      .select(col("doc_id"), col("sh"), col("sig")))
    editDistVerifyFrames(d, sigs, prefixLen, maxDist)
  }

  // ------------------------------------- content-defined chunking (CDC)
  /** d15: CONTENT-DEFINED CHUNKING dedup census — the storage-dedup /
    * partial-overlap primitive the document-level forms (d01 exact,
    * d04/d06 near-dup) can't express: two documents that share a long
    * PASSAGE but differ elsewhere share the CHUNKS covering it.
    * Boundaries are content-defined (after token i iff the portable
    * token hash ≡ 0 mod 8 — expected ~8-token chunks), so an
    * insertion near the front only perturbs its own chunk: the
    * classic rolling-boundary property fixed-width chunking (c13)
    * lacks. Chunking is map-only (per-doc list algebra, no shuffle);
    * the census is ONE chunk-hash-keyed aggregation — linear in
    * corpus tokens at any scale. Output: (chunk_hash, n_docs, n_occ)
    * for chunks of ≥ `minChunkChars` chars occurring ≥ 2 times — the
    * audit table a pipeline joins back to strip boilerplate passages.
    * Exact integers; the boundary hash is [[PortableHash]] so the
    * oracle mirrors the algebra verbatim. */
  def cdcChunkCensus(
      spark: SparkSession, sfDir: String,
      minChunkChars: Int = 20): DataFrame =
    cdcChunkCensusOn(docs(spark, sfDir), minChunkChars)

  /** [[cdcChunkCensus]] over any (doc_id, text) frame. */
  private[graft] def cdcChunkCensusOn(
      d: DataFrame, minChunkChars: Int = 20): DataFrame = {
    val h = PortableHash.packed("element_at(ws, CAST(i AS INT))")
    // barrier: `bounds` references ws per token and `chunks` references
    // bounds twice per chunk — unbarriered, CollapseProject inlines the
    // full re-tokenization into every reference
    val bounded = Persists.barrier(d
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .withColumn("bounds", expr(
        s"""concat(array(0L),
              CASE WHEN size(ws) <= 1 THEN array()
                   ELSE filter(sequence(1L, CAST(size(ws) - 1 AS BIGINT)),
                               i -> $h % 8 = 0) END,
              array(CAST(size(ws) AS BIGINT)))""")))
    bounded
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(bounds) - 1), c ->
             array_join(slice(ws,
               CAST(element_at(bounds, c) + 1 AS INT),
               CAST(element_at(bounds, c + 1) - element_at(bounds, c)
                    AS INT)), ' '))""")).as("chunk"))
      .filter(length(col("chunk")) >= minChunkChars)
      .select(col("doc_id"), md5(col("chunk")).as("chunk_hash"))
      .groupBy("chunk_hash")
      .agg(countDistinct("doc_id").as("n_docs"),
        count(lit(1)).as("n_occ"))
      .filter(col("n_occ") >= 2)
  }

  /** The banded candidate join alone — `(id_a, id_b)` pairs sharing
    * any LSH band, the half every portable dedup form starts from. */
  private def bandCandidates(
      d: DataFrame,
      rightFilter: org.apache.spark.sql.Column): DataFrame = {
    val banded = d.select(
      col("doc_id"),
      posexplode(expr(portableBandSql)).as(Seq("band", "bsig")))
    banded.as("x").join(banded.filter(rightFilter).as("y"),
        col("x.band") === col("y.band") && col("x.bsig") === col("y.bsig") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .distinct()
  }

  /** Banded candidate pairs → jaccard-verified near-dups, with the RIGHT
    * (larger-id) side of the candidate join restricted by `rightFilter`
    * — `lit(true)` pairs the whole corpus (d06); a delta predicate
    * gives the incremental form (d12). */
  private def portablePairs(
      d: DataFrame, threshold: Double,
      rightFilter: org.apache.spark.sql.Column): DataFrame = {
    val cand = bandCandidates(d, rightFilter)
    val sh = d.select(col("doc_id"), col("sh"))
    cand
      .join(sh.as("sa"), col("id_a") === col("sa.doc_id"))
      .join(sh.as("sb"), col("id_b") === col("sb.doc_id"))
      .select(col("id_a"), col("id_b"),
        round(size(array_intersect(col("sa.sh"), col("sb.sh"))).cast("double") /
          size(array_union(col("sa.sh"), col("sb.sh"))), 4).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  def minhashPortable(
      spark: SparkSession, sfDir: String, threshold: Double = 0.4): DataFrame =
    portablePairs(portableSigFrame(spark, sfDir), threshold, lit(true))

  /** Incremental (delta-vs-corpus) near-dup: the last 10% of doc_ids
    * play the freshly-ingested batch, and ONLY pairs touching the delta
    * are generated — the candidate join's right side is the delta, so
    * per-bucket work is bucket_size × delta_in_bucket instead of
    * bucket_size²/2. That asymmetry is the whole point at 100 TB: daily
    * ingest dedups against an existing corpus without ever re-pairing
    * the corpus with itself, and since every pair's LARGER id is
    * delta-side whenever any side is (ids are ingest-ordered), delta ×
    * everything captures exactly the pairs involving new documents. */
  def incrementalDedup(
      spark: SparkSession, sfDir: String,
      threshold: Double = 0.4): DataFrame = {
    val cut = Tables.rowCount(spark, sfDir, "documents") * 9 / 10
    portablePairs(portableSigFrame(spark, sfDir), threshold,
      col("doc_id") >= cut)
  }

  // --------------------------------------------------------------- SimHash
  /** 64-bit SimHash over word tokens: bit j of the signature is the sign
    * of Σ_tokens (±1 by bit j of xxhash64(token)). Near-dups share most
    * bits; banding the signature into 4×16-bit chunks guarantees any pair
    * within Hamming distance 3 collides in ≥1 chunk (pigeonhole). */
  private def withSimhash(df: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.withColumn("toks", array_distinct(split(col("text"), " ")))
      .withColumn("simhash", expr("graft_simhash(toks)"))
  }

  def simhashPairs(
      spark: SparkSession, sfDir: String, maxHamming: Int = 3): DataFrame =
    simhashPairsOn(docs(spark, sfDir), maxHamming,
      corpusRows = Some(Tables.rowCount(spark, sfDir, "documents")))

  /** [[simhashPairs]] over any (doc_id, text) frame — fixture-injectable,
    * with the shared hot-bucket guard on the 16-bit chunks (a
    * boilerplate-heavy corpus collapses most simhashes onto one value,
    * making every chunk bucket quadratic; see [[minhashLshOn]]). */
  def simhashPairsOn(
      input: DataFrame, maxHamming: Int = 3,
      maxBucketFreq: Long = 5000,
      corpusRows: Option[Long] = None): DataFrame = {
    // persist: the self-join below reads the signature twice (see
    // minhashLsh for the CollapseProject inlining hazard)
    val d = Persists.barrier(withSimhash(input)
      .select(col("doc_id"), col("simhash")))
    val banded = d.select(
      col("doc_id"), col("simhash"),
      posexplode(expr(
        """transform(sequence(0, 3),
             b -> shiftright(simhash, b * 16) & 65535)""")).as(Seq("band", "chunk")))
    val cold = dropHotBuckets(banded, Seq("band", "chunk"), maxBucketFreq,
      corpusRows)
    cold.as("x").join(cold.as("y"),
        col("x.band") === col("y.band") && col("x.chunk") === col("y.chunk") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
        expr("bit_count(x.simhash ^ y.simhash)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Hex char `c` (1-based) of md5(tok) as its nibble value 0..15 —
    * shared text between the Spark implementation and the DuckDB twin.
    * Unlike [[portableSlot]]'s ascii packing (fine for min-hashing,
    * biased per BIT), nibbles give uniform bits, which sign-sum simhash
    * needs. */
  private def tokNibble(c: Int): String =
    s"(CASE WHEN ascii(substr(md5(tok), $c, 1)) >= 97 " +
      s"THEN ascii(substr(md5(tok), $c, 1)) - 87 " +
      s"ELSE ascii(substr(md5(tok), $c, 1)) - 48 END)"

  private val tokHash32: String =
    (0 until 8).map(c =>
      s"${tokNibble(c + 1)} * CAST(${1L << (4 * (7 - c))} AS BIGINT)")
      .mkString("(", " + ", ")")

  /** [[simhashPairs]] with a PORTABLE 32-bit signature (nibble-packed
    * md5 prefix per token; bit j set iff Σ_tokens ±1 ≥ 0), banded into
    * 4×8-bit chunks — pigeonhole still guarantees any pair within
    * Hamming distance 3 collides in ≥1 chunk. Not the hot path (d03's
    * native 64-bit kernel stays); exists so the SIGN-SUM AND BANDING
    * ALGEBRA gets a hash-exact DuckDB oracle. */
  def simhashPortable(
      spark: SparkSession, sfDir: String, maxHamming: Int = 3): DataFrame = {
    val sums = docs(spark, sfDir)
      .select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("tok"))
      .withColumn("h", expr(tokHash32))
      .withColumn("b", explode(expr("sequence(0, 31)")))
      .withColumn("s",
        when(expr("(h div shiftleft(cast(1 AS BIGINT), b)) % 2") === 1, 1)
          .otherwise(-1))
      .groupBy("doc_id", "b").agg(sum("s").as("bitsum"))
    val sigs = Persists.barrier(sums.groupBy("doc_id")
      .agg(sum(when(col("bitsum") >= 0,
        expr("shiftleft(cast(1 AS BIGINT), b)")).otherwise(0L)).as("sig")))
    val banded = sigs.select(
      col("doc_id"), col("sig"),
      posexplode(expr(
        """transform(sequence(0, 3),
             c -> shiftright(sig, c * 8) & 255)""")).as(Seq("chunk_no", "chunk")))
    banded.as("x").join(banded.as("y"),
        col("x.chunk_no") === col("y.chunk_no") &&
          col("x.chunk") === col("y.chunk") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
        expr("bit_count(x.sig ^ y.sig)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** DuckDB twin of [[simhashPortable]]: same per-token nibble hash,
    * same sign-sum signature, same 4-bit chunk banding. */
  private val simhashPortableOracle: String =
    s"""WITH toks AS (
          SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
          FROM documents),
        h AS (SELECT doc_id, $tokHash32 AS h FROM toks),
        bitsums AS (
          SELECT doc_id, b,
                 sum(CASE WHEN (h // (CAST(1 AS BIGINT) << b)) % 2 = 1
                          THEN 1 ELSE -1 END) AS bitsum
          FROM h, (SELECT unnest(range(0, 32)) AS b)
          GROUP BY doc_id, b),
        sigs AS (
          SELECT doc_id,
                 CAST(sum(CASE WHEN bitsum >= 0
                               THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)
                      AS BIGINT) AS sig
          FROM bitsums GROUP BY doc_id),
        banded AS (
          SELECT doc_id, sig, c AS chunk_no,
                 (sig // (CAST(1 AS BIGINT) << (c * 8))) % 256 AS chunk
          FROM sigs, (SELECT unnest(range(0, 4)) AS c)),
        pairs AS (
          SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
                 bit_count(xor(x.sig, y.sig)) AS hamming
          FROM banded x JOIN banded y
            ON x.chunk_no = y.chunk_no AND x.chunk = y.chunk
           AND x.doc_id < y.doc_id)
      SELECT id_a, id_b, CAST(hamming AS INTEGER) AS hamming
      FROM pairs WHERE hamming <= 3"""

  // -------------------------------------------------------- n-gram Jaccard
  /** Character-n-gram Jaccard dedup: candidates = pairs sharing ≥1 word
    * 8-gram (a high-precision canopy — true near-dups almost surely share
    * one), verified by 5-char-gram Jaccard.
    *
    * Canopy keys more frequent than `maxCanopyFreq` are dropped BEFORE
    * the self-join: a corpus-common 8-gram (boilerplate header, license
    * blurb) would otherwise make one bucket quadratic — the classic
    * stop-shingle cutoff. Hot keys are by definition few distinct values,
    * so the exclusion set broadcasts; per-key candidate work is bounded
    * at maxCanopyFreq²/2 regardless of corpus size. True near-dups share
    * MANY 8-grams, so losing the boilerplate ones doesn't lose the pair
    * unless the docs agree ONLY on boilerplate — exactly the pairs a
    * dedup pipeline wants to ignore. */
  def ngramJaccard(
      spark: SparkSession, sfDir: String, threshold: Double = 0.5,
      maxCanopyFreq: Long = 100): DataFrame =
    ngramJaccardOn(docs(spark, sfDir), threshold, maxCanopyFreq)

  /** [[ngramJaccard]] over any (doc_id, text) frame — fixture-injectable. */
  def ngramJaccardOn(
      input: DataFrame, threshold: Double, maxCanopyFreq: Long): DataFrame = {
    graft.functions.GraftFunctions.register(input.sparkSession)
    val d = input
      .withColumn("grams", array_distinct(expr(
        "regexp_extract_all(text, '.{5}', 0)"))) // non-overlapping 5-char grams
      .withColumn("canopy", Shingles.wordShingles("text", 8))
      .select(col("doc_id"), col("grams"), col("canopy"))
      .transform(Persists.barrier) // read 3x below (canopy explode + both gram joins)
    val keys = d.select(col("doc_id"), explode(col("canopy")).as("key"))
    val hotKeys = keys.groupBy("key").count()
      .filter(col("count") > maxCanopyFreq).select("key")
    val coldKeys = keys.join(broadcast(hotKeys), Seq("key"), "left_anti")
    val cand = coldKeys.as("x").join(coldKeys.as("y"),
        col("x.key") === col("y.key") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .distinct()
    val g = d.select(col("doc_id"), col("grams"))
    cand
      .join(g.as("ga"), col("id_a") === col("ga.doc_id"))
      .join(g.as("gb"), col("id_b") === col("gb.doc_id"))
      .select(col("id_a"), col("id_b"),
        round(size(array_intersect(col("ga.grams"), col("gb.grams"))).cast("double") /
          size(array_union(col("ga.grams"), col("gb.grams"))), 4).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  // --------------------------------------------------- embedding near-dup
  /** Embedding-cosine near-dup: pairs with cosine ≥ threshold, blocked by
    * hyperplane-LSH buckets (graft_lsh_sigs) — candidates meet only when
    * they collide in ≥1 of `tables` signature buckets, then every
    * candidate is verified with exact cosine. No label column, no
    * unbounded per-label all-pairs block (the round-1 formulation).
    *
    * Recall is governed by (tables, planes) against the threshold: a
    * pair at cosine c collides per plane w.p. 1 − acos(c)/π, so miss
    * probability is (1 − p^planes)^tables. The defaults (32 tables × 2
    * planes) give per-pair miss ≈ 7e-7 at c = 0.3 — measured 100% recall
    * of all true pairs at sf0.01 AND sf0.1 (16 tables missed 4 of 14933
    * sf0.1 pairs at the expected ~1e-3 rate; DedupOpsSpec checks exact
    * agreement with brute force). The testdata's τ=0.3 sits at the
    * noise floor of its random embeddings, which forces coarse buckets
    * (expected size n/2^planes); production near-dup thresholds
    * (τ ≥ 0.85) support planes = 8–16 where buckets shrink to n/256 and
    * below — same code, one knob. */
  def embeddingNearDup(
      spark: SparkSession, sfDir: String, threshold: Double = 0.3,
      tables: Int = 32, planes: Int = 2,
      maxBucketFreq: Long = 5000): DataFrame = {
    val rows = Tables.rowCount(spark, sfDir, "embeddings")
    embeddingNearDupOn(Tables.load(spark, sfDir, "embeddings"),
      threshold, tables, planes, scaledEmbeddingCap(rows, planes, maxBucketFreq),
      corpusRows = Some(rows))
  }

  /** The d05 hot-bucket cap as a function of corpus size.
    *
    * The cutoff exists to drop DEGENERATE buckets (≫ expected size),
    * not ordinary ones: with coarse planes the expected bucket is
    * n/2^planes, so a fixed cap starts dropping ordinary buckets —
    * and silently collapsing recall — once n > cap·2^planes (~20k at
    * planes=2). Scale the cap to 4× the expected bucket size so
    * ordinary buckets always clear it while anything 4×-over-expected
    * is still treated as signal-free — but BOUND the scaled term at
    * n/2: at planes = 2 the raw 4n/2^planes equals n, the maximum any
    * bucket can hold, which would make the backstop vacuous exactly at
    * the shipped default. n/2 is still 2× the planes=2 expected bucket
    * (ordinary buckets concentrate tightly around n/4 for any
    * non-adversarial corpus), while an all-boilerplate bucket — the
    * degenerate case the cap exists for — blows past it. At production
    * thresholds (planes 8–16) the expected-size term stays below the
    * configured floor until n ≈ cap·2^planes/4, and the floor governs. */
  def scaledEmbeddingCap(rows: Long, planes: Int, floor: Long = 5000): Long =
    floor.max((4L * rows >> planes).min(rows / 2))

  /** [[embeddingNearDup]] over any (vec_id, embedding) frame —
    * fixture-injectable.
    *
    * `maxBucketFreq` is the hot-bucket cutoff (d04's stop-shingle
    * pattern applied to LSH buckets): a (table, signature) bucket hotter
    * than the cap is dropped from candidate generation BEFORE the
    * self-join, so per-bucket pair work is bounded at maxBucketFreq²/2
    * regardless of corpus size — the backstop that turns a degenerate
    * key distribution (near-duplicate-everything corpora, vectors on a
    * hyperplane boundary, adversarial inputs) into dropped buckets
    * instead of a quadratic stage. A pair losing one hot bucket still
    * meets in any of the other `tables−1` tables; at production
    * thresholds (τ ≥ 0.85, planes 8–16) buckets sit orders of magnitude
    * below the cap and the cutoff never fires.
    *
    * When the corpus row count is KNOWN and ≤ the cap, the guard pass is
    * skipped outright — no bucket can hold more members than the corpus
    * has rows, so the cutoff is provably a no-op (a dominance
    * short-circuit, not an expectation heuristic: adversarial inputs are
    * still guarded whenever they could matter). */
  def embeddingNearDupOn(
      input: DataFrame, threshold: Double,
      tables: Int, planes: Int, maxBucketFreq: Long,
      corpusRows: Option[Long] = None): DataFrame = {
    graft.functions.GraftFunctions.register(input.sparkSession)
    val e = input
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x AS DOUBLE))").as("v"))
    // persist barrier: the banding explode + both sides of the candidate
    // join reference the signatures (see minhashLsh)
    val bucketed = Persists.barrier(e
      .withColumn("sigs", expr(s"graft_lsh_sigs(v, $tables, $planes)"))
      .select(col("vec_id"), col("v"),
        posexplode(col("sigs")).as(Seq("t", "sig"))))
    val cold = dropHotBuckets(bucketed, Seq("t", "sig"), maxBucketFreq,
      corpusRows)
    cold.as("x").join(cold.as("y"),
        col("x.t") === col("y.t") && col("x.sig") === col("y.sig") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("id_a"), col("y.vec_id").as("id_b"),
        round(expr("graft_cosine(x.v, y.v)"), 4).as("cosine"))
      .distinct()
      .filter(col("cosine") >= threshold)
  }

  /** The [[minhashPortable]] pipeline as a DuckDB CTE list ending in
    * `j (id_a, id_b, jaccard)` — shared by the d06 pair oracle and the
    * d08 cluster oracle so the two can never drift. */
  private val minhashPortableCtes: String = {
    val mins = (0 until 8).map(i =>
      s"min(${portableSlot(i)}) AS m$i").mkString(", ")
    s"""w AS (SELECT doc_id, text, string_split(text, ' ') AS ws
                   FROM documents),
        doc_sh AS (SELECT doc_id,
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
        cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
                 FROM bands x JOIN bands y
                   ON x.band = y.band AND x.bsig = y.bsig
                  AND x.doc_id < y.doc_id),
        j AS (SELECT id_a, id_b,
                     round(CAST(len(list_intersect(a.shl, b.shl)) AS DOUBLE) /
                           len(list_distinct(list_concat(a.shl, b.shl))),
                           4) AS jaccard
              FROM cand
              JOIN doc_sh a ON a.doc_id = cand.id_a
              JOIN doc_sh b ON b.doc_id = cand.id_b)"""
  }

  /** d13's oracle: the d06 candidate CTEs (the `j` jaccard CTE goes
    * unused — DuckDB CTEs are lazy), then levenshtein over the same
    * 96-char prefixes with the same cutoff. */
  private val editDistOracle: String =
    s"""WITH $minhashPortableCtes,
        pre AS (SELECT doc_id, substr(text, 1, 96) AS pre FROM documents)
      SELECT id_a, id_b, levenshtein(a.pre, b.pre) AS edit_dist
      FROM cand
      JOIN pre a ON a.doc_id = cand.id_a
      JOIN pre b ON b.doc_id = cand.id_b
      WHERE levenshtein(a.pre, b.pre) <= 24"""

  /** DuckDB twin of [[minhashPortable]] — the banding algebra verified
    * hash-exactly: same shingles, same md5-slice slot minima, same band
    * packing, same candidate join, same jaccard threshold. */
  private val minhashPortableOracle: String =
    s"""WITH $minhashPortableCtes
      SELECT id_a, id_b, jaccard FROM j WHERE jaccard >= 0.4"""

  /** d12's oracle: the d06 pair algebra restricted to pairs whose
    * larger id falls in the last-10% delta — id_b is the pair max, so
    * this is exactly "at least one side is new". */
  private val incrementalOracle: String =
    s"""WITH $minhashPortableCtes
      SELECT id_a, id_b, jaccard FROM j
      WHERE jaccard >= 0.4
        AND id_b >= (SELECT (count(*) * 9) // 10 FROM documents)"""

  // ------------------------------------------------- duplicate clusters
  /** Duplicate-CLUSTER resolution: near-duplication is transitive in
    * practice (A≈B, B≈C ⇒ one boilerplate family), so real pipelines
    * keep one document per connected component of the near-dup pair
    * graph, not per pair. Computes components of the [[minhashPortable]]
    * pair graph by iterative min-label propagation (the Pregel/GraphX
    * connected-components kernel): every vertex starts as its own label
    * and repeatedly takes the min over its neighborhood until a sweep
    * changes nothing — converges in O(component diameter) rounds, and
    * near-dup components are shallow (pairs/stars), so 2–3 rounds in
    * practice. Each round is one shuffle join + one aggregation, fully
    * distributed; the driver only checks the converged-yet count (at
    * extreme scale the two-phase large-star/small-star variant halves
    * round counts — same per-round plan shape). Output: (doc_id,
    * cluster_id = min doc_id of the component) for every doc in ≥1
    * pair. */
  def dedupClusters(
      spark: SparkSession, sfDir: String,
      threshold: Double = 0.4): DataFrame =
    connectedComponents(
      minhashPortable(spark, sfDir, threshold).select("id_a", "id_b"))

  /** Min-label-propagation connected components over an (id_a, id_b)
    * undirected pair set — the distributed kernel behind
    * [[dedupClusters]], fixture-injectable. Output: (doc_id,
    * cluster_id = min vertex of the component) per vertex.
    *
    * Each round LOCALCHECKPOINTS the label table: iterative DataFrame
    * algorithms must truncate lineage per round — persist alone caches
    * the data but the logical plan still nests (union-join-agg over the
    * previous round's plan), doubling per round until driver planning
    * blows up on long chains (caught by the union-find property spec).
    * localCheckpoint cuts the plan at a materialized RDD; a cluster job
    * with a fault-tolerance requirement would use reliable
    * `checkpoint()` to HDFS instead — same shape, durable storage. */
  def connectedComponents(pairs0: DataFrame): DataFrame =
    connectedComponentsCounted(pairs0)._1

  /** [[connectedComponents]] plus the propagation-round count — the
    * measured quantity the g12 star-contraction contrast reports
    * (label-prop rounds track the component DIAMETER; star contraction
    * tracks log n). */
  private[graft] def connectedComponentsCounted(
      pairs0: DataFrame): (DataFrame, Int) = {
    val edges = symmetrized(pairs0)
    ccLoop(edges, edges.select(col("id_a").as("doc_id")).distinct()
      .withColumn("cluster_id", col("doc_id")))
  }

  /** WARM-STARTED components — the g08 incremental discipline applied
    * to the CC kernel: propagation initialized from a PRIOR labeling
    * (e.g. the stored labels of the pre-delta graph) instead of
    * node = own label. Min-label propagation is monotone, so any
    * initialization where each node's label is SOME member id of its
    * (old) component converges to the identical fixed point as the
    * cold run — per-merged-component min — which is why g15 shares
    * g03/g12's oracle verbatim. The payoff is round count: warm labels
    * already agree within unmerged components, so only the
    * delta-induced merges propagate (≤ merge diameter rounds, vs the
    * full component diameter cold). Nodes absent from `labels0` (the
    * newly-arrived vertices) start as their own label. */
  def connectedComponentsWarm(
      pairs0: DataFrame, labels0: DataFrame): DataFrame =
    connectedComponentsWarmCounted(pairs0, labels0)._1

  private[graft] def connectedComponentsWarmCounted(
      pairs0: DataFrame, labels0: DataFrame): (DataFrame, Int) = {
    val edges = symmetrized(pairs0)
    val init = edges.select(col("id_a").as("doc_id")).distinct()
      .join(labels0.select(col("doc_id"),
        col("cluster_id").as("warm_id")), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("warm_id"), col("doc_id")).as("cluster_id"))
    ccLoop(edges, init)
  }

  /** Both directions of an undirected pair set, barriered (every loop
    * round joins it). */
  private def symmetrized(pairs0: DataFrame): DataFrame = {
    val pairs = Persists.barrier(pairs0)
    // pre-partitioned on the per-round join key: every ccLoop round
    // joins these edges on id_b, so paying ONE exchange at
    // materialization lets each round reuse the cached partitioning
    // instead of re-shuffling the edge frame per round (guide §2.4 —
    // two operations keyed the same way share one exchange)
    Persists.barrier(pairs.union(
      pairs.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
      .repartition(col("id_b")))
  }

  /** The min-label propagation loop shared by the cold and warm forms:
    * one join + one min-agg per round, localCheckpoint per round
    * (lineage truncation), exit when no label strictly decreases. */
  private def ccLoop(
      edges: DataFrame, init: DataFrame): (DataFrame, Int) = {
    var rounds = 0
    var labels = init.localCheckpoint(false)
    var changed = 1L
    while (changed > 0) {
      rounds += 1
      // labels is the hinted SHUFFLE_HASH build side: the cached edge
      // frame streams with its stored id_b partitioning (no per-round
      // edge exchange, no sort-merge sorts — guide §3.1), and only the
      // node-sized label table moves. nbr_min ≡ the min label any
      // neighbor proposes; the old union-then-groupBy shape carried
      // every label row through the aggregation as well.
      val nbrMin = edges.join(labels.hint("shuffle_hash"),
          edges("id_b") === labels("doc_id"))
        .select(edges("id_a").as("doc_id"), col("cluster_id"))
        .groupBy("doc_id").agg(min("cluster_id").as("nbr_min"))
      // the changed flag rides INSIDE the checkpointed frame, so the
      // convergence check is a count over already-materialized rows —
      // the old shape re-joined the two label tables in a second
      // full job every round
      val next = labels.join(nbrMin.hint("shuffle_hash"),
          Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("cluster_id"),
            coalesce(col("nbr_min"), col("cluster_id")))
            .as("cluster_id"),
          (coalesce(col("nbr_min"), col("cluster_id")) <
            col("cluster_id")).as("chg"))
        .localCheckpoint(false)
      changed = next.filter(col("chg")).count()
      // superseded checkpointed RDDs are dereferenced here and reclaimed
      // by the context cleaner — O(1) live label tables regardless of
      // the component diameter
      labels = next.select("doc_id", "cluster_id")
    }
    (labels.select("doc_id", "cluster_id"), rounds)
  }

  /** Cluster members that lost the min-id representative election —
    * the drop set shared by [[dedupKeep]] and the composed curation
    * pipeline (one definition, so the keep-election semantics cannot
    * drift between them). */
  def clusterLosers(spark: SparkSession, sfDir: String): DataFrame =
    dedupClusters(spark, sfDir)
      .filter(col("doc_id") =!= col("cluster_id")).select("doc_id")

  /** The end-to-end dedup PRODUCT: the corpus minus every
    * non-representative member of a near-dup cluster — what a pipeline
    * actually feeds downstream. One left-anti join of the corpus against
    * the cluster members that lost the min-id election; docs in no pair
    * pass through untouched. */
  def dedupKeep(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .join(clusterLosers(spark, sfDir), Seq("doc_id"), "left_anti")
      .select("doc_id", "lang", "source", "n_chars")

  /** Quality-aware representative election: within each near-dup
    * cluster keep the member with the MOST content (n_chars desc,
    * doc_id asc tie-break) instead of d09's min-id pick — what
    * production pipelines actually do, since near-dup clusters often
    * contain one full document and several truncated copies, and min-id
    * keeps a truncation whenever it sorts first.
    *
    * Scale shape: the window partitions by cluster_id, and clusters are
    * near-dup components — small by construction (the pair generators
    * are banded + capped), so no window partition can be a scale hazard
    * the pair stage didn't already cap. */
  def dedupKeepQuality(spark: SparkSession, sfDir: String): DataFrame = {
    val d = docs(spark, sfDir)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cluster_id")
      .orderBy(col("n_chars").desc, col("doc_id"))
    val losers = d.select("doc_id", "n_chars")
      .join(dedupClusters(spark, sfDir), "doc_id")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") > 1).select("doc_id")
    d.join(losers, Seq("doc_id"), "left_anti")
      .select("doc_id", "lang", "source", "n_chars")
  }

  /** The d24 pollution fixture, shared VERBATIM with its oracle (the
    * q94 fixtureSql discipline): the corpus plus an UPPERCASED and a
    * punctuated variant of every 50th doc, minted at collision-free
    * id offsets — known 3-member canonical families whose raw md5
    * keys are all distinct. */
  private[graft] val canonicalFixtureSql: String =
    """SELECT doc_id, text FROM documents
       UNION ALL
       SELECT doc_id + 10000000, upper(text) FROM documents
       WHERE doc_id % 50 = 0
       UNION ALL
       SELECT doc_id + 20000000, text || '!!' FROM documents
       WHERE doc_id % 50 = 0"""

  /** d24: CANONICAL-HASH DEDUP CENSUS — d01's exact dedup keyed on
    * t33's normalized text instead of raw bytes: case, punctuation,
    * and whitespace variants (which raw md5 scatters into distinct
    * keys) collapse into one group. Runs over the planted fixture, so
    * the census provably CATCHES the variant families the d01 key
    * misses — every 50th doc forms a known 3-member group with the
    * min-id keeper (the d08/d09 convention). The normalize+hash stage
    * is t33's narrow map; the census is one hash-keyed partial agg —
    * the d01 scale shape unchanged. */
  def canonicalDedup(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.registerAll(spark, sfDir)
    TextOps.canonicalizeOn(spark.sql(canonicalFixtureSql))
      .groupBy("canonical_hash")
      .agg(count(lit(1)).as("n_docs"), min("doc_id").as("keeper"))
      .filter(col("n_docs") >= 2)
  }

  /** d23: LSH BAND PLANNER — the design-time half of d20's measured
    * calibration: for a signature of `sigLen` MinHashes, enumerate
    * every (bands, rows) factorization, score each with the
    * closed-form S-curve — collision threshold t ≈ (1/b)^(1/r) and
    * P(candidate | j) = 1 − (1 − j^r)^b at three reference jaccards
    * bracketing the target — and flag the factorization whose
    * threshold sits closest to θ (ties to fewer bands = cheaper).
    * This is the table every LSH deployment derives by hand from
    * Leskovec/Rajaraman/Ullman ch. 3; shipping it as an operator
    * makes the (8, 4) choice d02/d06 hard-code an AUDITABLE output.
    * Pure closed-form arithmetic on a divisor-count-sized frame; the
    * global rank window is over those ≤ d(sigLen) rows, not data. */
  def bandPlanner(spark: SparkSession, sfDir: String,
      sigLen: Int = 32, theta: Double = 0.4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cand = spark.range(1, sigLen + 1L)
      .withColumnRenamed("id", "b")
      .filter(lit(sigLen) % col("b") === 0)
      .withColumn("r", expr(s"$sigLen div b"))
      .withColumn("threshold",
        round(pow(lit(1.0) / col("b"), lit(1.0) / col("r")), 6))
      .withColumn("p_03",
        round(lit(1.0) - pow(lit(1.0) - pow(lit(0.3), col("r")), col("b")), 6))
      .withColumn("p_04",
        round(lit(1.0) - pow(lit(1.0) - pow(lit(0.4), col("r")), col("b")), 6))
      .withColumn("p_05",
        round(lit(1.0) - pow(lit(1.0) - pow(lit(0.5), col("r")), col("b")), 6))
    val w = Window.orderBy(abs(col("threshold") - lit(theta)), col("b"))
    cand.withColumn("chosen", row_number().over(w) === 1)
  }

  /** d23's DuckDB twin: same divisor enumeration, same S-curve
    * algebra on the 6-dp grid, same argmin flag. */
  private val bandPlannerOracle: String =
    """WITH c AS (
         SELECT b, 32 // b AS r
         FROM (SELECT unnest(range(1, 33)) AS b) WHERE 32 % b = 0),
       s AS (
         SELECT b, r,
                round(pow(1.0 / b, 1.0 / r), 6) AS threshold,
                round(1.0 - pow(1.0 - pow(0.3, r), b), 6) AS p_03,
                round(1.0 - pow(1.0 - pow(0.4, r), b), 6) AS p_04,
                round(1.0 - pow(1.0 - pow(0.5, r), b), 6) AS p_05
         FROM c)
      SELECT b, r, threshold, p_03, p_04, p_05,
             (row_number() OVER (ORDER BY abs(threshold - 0.4), b) = 1)
               AS chosen
      FROM s"""

  /** d22: SOFT DEDUP — duplicate-count REWEIGHTING instead of
    * removal (the SlimPajama/"soft dedup" alternative: d09/d11 DROP
    * losers, which discards paraphrase diversity; here every doc
    * stays, downweighted so each near-dup cluster contributes total
    * training mass 1). Per document: its d08 cluster (MinHash ≥ 0.4
    * components; singletons = docs outside every pair are their own
    * cluster), the cluster size, and weight = 1/size on the 6-dp
    * grid — the column a loss-weighted training loader consumes.
    *
    * Scale shape: the d08 component labels plus one cluster-size agg
    * and one size join — all keyed aggs over the doc-id frame; the
    * corpus text is only touched by the signature stage d08 already
    * owns. */
  def softDedupWeights(spark: SparkSession, sfDir: String): DataFrame =
    softDedupWeightsFrom(spark, sfDir, dedupClusters(spark, sfDir))

  /** [[softDedupWeights]] over the PRE-MATERIALIZED signature table
    * (the d12i serve discipline; benched d22i). */
  def softDedupWeightsFromSigs(
      spark: SparkSession, sfDir: String): DataFrame =
    softDedupWeightsFrom(spark, sfDir, connectedComponents(
      portablePairs(spark.read.parquet(signatureTablePath(spark, sfDir)),
        0.4, lit(true)).select("id_a", "id_b")))

  private def softDedupWeightsFrom(
      spark: SparkSession, sfDir: String, comp: DataFrame): DataFrame = {
    val d = docs(spark, sfDir).select("doc_id")
    val labeled = Persists.barrier(
      d.join(comp, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("cluster_id"), col("doc_id")).as("cluster_id")))
    val sizes = labeled.groupBy("cluster_id")
      .agg(count(lit(1)).as("cluster_size"))
    labeled.join(sizes, "cluster_id")
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"),
        round(lit(1.0) / col("cluster_size"), 6).as("weight"))
  }

  /** d14: EXACT Jaccard threshold join via PREFIX FILTERING — the
    * AllPairs/PPJoin family's lossless alternative to d04's canopy
    * blocking. Tokens (the same non-overlapping 5-char grams as d04)
    * get a global order by (document frequency asc, gram asc); each
    * document keeps only its PREFIX — the first |G| − ⌈θ·|G|⌉ + 1
    * tokens in that order — and candidates are pairs sharing ≥1 prefix
    * token. The prefix-filter theorem (any pair with |A∩B| ≥ α shares
    * a token in both length-(|x|−α+1) prefixes, with α = ⌈θ·max⌉ ≥
    * ⌈θ·|x|⌉) makes the candidate set a SUPERSET of the true pairs,
    * so after exact verification the output is the complete θ-join —
    * unlike d02/d03's probabilistic recall or d04's canopy cutoff,
    * nothing is lost, which is why the oracle is plain brute force.
    *
    * Scale shape: the join is an inverted index over PREFIX tokens
    * only, and the df-ascending order puts the RAREST grams in the
    * prefixes — candidate fan-out per token tracks the rare-token df
    * distribution, not corpus size; the frequent grams that would
    * quadratize an inverted-index join sort to the suffixes and never
    * join. θ defaults to 0.5 (exact in binary fp, so ⌈θ·|G|⌉ has no
    * float boundary; d04's threshold, letting the spec compare the
    * lossless result against the canopy-blocked one). */
  def prefixJaccard(spark: SparkSession, sfDir: String,
      threshold: Double = 0.5): DataFrame =
    prefixJaccardOn(docs(spark, sfDir), threshold)

  /** [[prefixJaccard]] over any (doc_id, text) frame. */
  def prefixJaccardOn(input: DataFrame, threshold: Double): DataFrame = {
    val d = Persists.barrier(input
      .withColumn("grams", array_distinct(expr(
        "regexp_extract_all(text, '.{5}', 0)")))
      .filter(size(col("grams")) > 0)
      .select(col("doc_id"), col("grams")))
    val tok = d.select(col("doc_id"), explode(col("grams")).as("gram"))
    val dfreq = tok.groupBy("gram").agg(count(lit(1)).as("df"))
    val sorted = tok.join(dfreq, "gram")
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("df"), col("gram"))))
        .as("toks"))
    // barriered: the candidate self-join reads the prefix frame TWICE,
    // and everything above it (df agg + per-doc sort-collect) is the
    // expensive half of the operator — unbarriered it all ran twice
    // (the r10 bench measured d14 at 95 s before this)
    val pre = Persists.barrier(sorted
      .withColumn("sz", size(col("toks")))
      .withColumn("plen",
        (col("sz") - ceil(lit(threshold) * col("sz")) + 1).cast("int"))
      .select(col("doc_id"), col("sz"),
        posexplode(expr("slice(toks, 1, plen)")).as(Seq("p0", "t")))
      .select(col("doc_id"), col("sz"), (col("p0") + 1).as("pos"),
        col("t.gram").as("gram")))
    // ppjoin POSITIONAL prefix filter (Xiao et al., WWW'08) on top of
    // the prefix candidate join: jaccard ≥ t ⟺ |x∩y| ≥ t/(1+t)·(|x|+|y|),
    // and with both gram lists sorted by the SAME global (df, gram)
    // order, the first common gram at positions (pa, pb) bounds the
    // overlap by 1 + min(|x|−pa, |y|−pb). min(pos) per side is exactly
    // that first common gram (common grams appear in the same relative
    // order in both lists), so pairs failing the bound are PROVABLY
    // below threshold and would be dropped by the final jaccard filter
    // anyway — the candidate set shrinks, the verified output is
    // byte-identical (sf0.1 measured 6.25M raw candidate pairs feeding
    // the array_intersect verify before this; guide §3.2 — reduce the
    // join input before the expensive stage). The 1e-9 slack keeps the
    // double-arithmetic prune strictly conservative at the boundary.
    val cand = pre.as("x").join(pre.as("y"),
        col("x.gram") === col("y.gram") &&
          col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .agg(first(col("x.sz")).as("sza"), first(col("y.sz")).as("szb"),
        min(col("x.pos")).as("pa"), min(col("y.pos")).as("pb"))
      .filter((lit(1) + least(col("sza") - col("pa"),
          col("szb") - col("pb"))).cast("double") * (lit(1.0) + lit(threshold))
        >= lit(threshold) * (col("sza") + col("szb")).cast("double") - lit(1e-9))
      .select("id_a", "id_b")
    val g = d.select(col("doc_id"), col("grams"))
    cand.join(g.as("ga"), col("id_a") === col("ga.doc_id"))
      .join(g.as("gb"), col("id_b") === col("gb.doc_id"))
      .select(col("id_a"), col("id_b"),
        round(size(array_intersect(col("ga.grams"), col("gb.grams")))
            .cast("double") /
          size(array_union(col("ga.grams"), col("gb.grams"))), 4)
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Multi-signal near-dup: the union of the text-similarity pairs
    * (portable minhash banding, jaccard-verified) and the
    * embedding-similarity pairs (LSH-blocked, cosine-verified), tagged
    * by signal — production pipelines dedup on several signals and
    * union (or vote over) the pair sets. Follows the testdata
    * convention that vec_id indexes the same corpus as doc_id (one
    * embedding per document). */
  def multiSignal(spark: SparkSession, sfDir: String): DataFrame = {
    val text = minhashPortable(spark, sfDir)
      .select(col("id_a"), col("id_b"),
        lit("text").as("signal"), col("jaccard").as("score"))
    val emb = embeddingNearDup(spark, sfDir)
      .select(col("id_a"), col("id_b"),
        lit("embedding").as("signal"), col("cosine").as("score"))
    text.unionByName(emb)
  }

  // ------------------------------------------- exact-substring overlap
  /** Gate window width: a 6-token run is BELOW c04's 8-token shingle
    * (so d16 provably catches overlaps the shingle set cannot — see
    * SubstringOverlapSpec) while long enough that the fixture's
    * ~30-word vocabulary makes cross-doc window collisions dominated
    * by real duplication (30⁶ ≈ 7·10⁸ possible windows vs ~4·10⁵
    * windows in the corpus). Production corpora run this at ~50. */
  val SubstringWindowTokens = 6

  /** Hot-window cap (the [[dropHotBuckets]] discipline): a window
    * shared by more than this many positions — boilerplate headers,
    * license blocks — is dropped from BOTH sides of the candidate
    * join, bounding per-window pair work at cap². Mirrored VERBATIM in
    * the oracle's HAVING clause, so the gate equivalence does not
    * depend on the fixture staying under the cap (the g17 ADVICE-r10
    * lesson); fixture max window frequency is 4. */
  val SubstringMaxWindowFreq = 5000L

  /** The rolling `n`-token windows of each doc WITH their positions:
    * (doc_id, extra…, pos, w), pos 1-based, docs shorter than n words
    * yield no windows. One narrow map (split → transform → explode) —
    * no shuffle; window count = token count, so the frame is
    * corpus-token-sized. */
  private[graft] def windowPositions(
      d: DataFrame, n: Int, extra: Seq[String] = Nil): DataFrame = {
    val keep = (Seq("doc_id") ++ extra).map(col)
    d.select(keep :+ split(col("text"), " ").as("toks"): _*)
      .filter(size(col("toks")) >= n)
      .select(keep :+ explode(expr(
        s"transform(sequence(1, size(toks) - ${n - 1}), " +
          s"i -> struct(i AS pos, array_join(slice(toks, i, $n), ' ') AS w))"))
        .as("pw"): _*)
      .select(keep ++ Seq(col("pw.pos").as("pos"), col("pw.w").as("w")): _*)
  }

  /** Windows minus the hot ones (> `cap` occurrences corpus-wide). */
  private[graft] def coldWindows(win: DataFrame, cap: Long): DataFrame =
    win.join(broadcast(win.groupBy("w").agg(count(lit(1)).as("c"))
      .filter(col("c") > cap).select("w")), Seq("w"), "left_anti")

  /** MAXIMAL exact run length per doc pair from matched window
    * positions (aKey, bKey, pa, pb): windows matching at a constant
    * offset pa−pb in CONSECUTIVE positions belong to one shared token
    * run of length (#consecutive windows + n − 1) — the classic
    * gaps-and-islands grouping (island id = pa − row_number within
    * (pair, offset) ordered by pa). Output: (aKey, bKey,
    * max_overlap_tokens ≥ n). */
  private def maxRunFromMatches(
      m: DataFrame, n: Int, aKey: String, bKey: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(aKey), col(bKey), col("off")).orderBy(col("pa"))
    m.withColumn("off", col("pa") - col("pb"))
      .withColumn("g", col("pa") - row_number().over(w))
      .groupBy(col(aKey), col(bKey), col("off"), col("g"))
      .agg((count(lit(1)) + (n - 1)).as("run_len"))
      .groupBy(col(aKey), col(bKey))
      .agg(max("run_len").as("max_overlap_tokens"))
  }

  /** d17: SEMANTIC dedup with CLUSTER blocking (the SemDeDup shape,
    * Abbas et al. 2023 §2: k-means cells as the candidate blocks,
    * pairwise cosine inside each cell): every embedding assigns to
    * its nearest coarse centroid (the deterministic modular model —
    * the s04 quantizer, so the gate is fully oracle-able where d05's
    * LSH banding needs a portable-hash twin), and only same-cell
    * pairs are scored; pairs at rounded cosine ≥ `threshold` flag as
    * semantic duplicates (id_a < id_b — d05's output contract; the
    * gate threshold 0.3 is d05's, the band that BINDS on the
    * structureless synthetic corpus — 201 flagged pairs at both gate
    * SFs — where a real-corpus run uses ~0.95). At
    * scale the blocking IS the point: candidate work is Σ_cells
    * |cell|²/2 ≈ n²/C instead of n², with C ≈ √n making it n^1.5,
    * and cells are embarrassingly partition-parallel (each cell's
    * pairs co-locate under one shuffle key). A same-threshold near-
    * dup that straddles a Voronoi boundary is the documented recall
    * loss vs brute (SemDeDup's own trade); d05's LSH path catches it
    * with independent hash tables. */
  def semdedupCells(
      spark: SparkSession, sfDir: String,
      threshold: Double = 0.3, centroidMod: Int = 23): DataFrame =
    semdedupCellsOn(graft.operators.SimilarityOps.vecs(spark, sfDir),
      Tables.rowCount(spark, sfDir, "embeddings"), threshold, centroidMod)

  /** [[semdedupCells]] over any (vec_id, v) frame with a known row
    * count — fixture-injectable (ScaleProbe). */
  private[graft] def semdedupCellsOn(
      all: DataFrame, rows: Long,
      threshold: Double, centroidMod: Int = 23): DataFrame = {
    val spark = all.sparkSession
    graft.functions.GraftFunctions.register(spark)
    val (centIds, centVecs) =
      graft.operators.SimilarityOps.centroidModel(all, rows, centroidMod)
    val idsLit =
      org.apache.spark.sql.functions.typedlit(centIds)
    // barriered: the assigned frame feeds both sides of the
    // within-cell pair join
    val assigned = Persists.barrier(all
      .withColumn("nc", graft.operators.SimilarityOps.nearestCents(
        spark, col("v"), centVecs, 1))
      .select(col("vec_id"), col("v"),
        element_at(idsLit, col("nc").getItem(0) + 1).as("cell")))
    assigned.as("a").join(assigned.as("b"),
        col("a.cell") === col("b.cell") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        round(expr("graft_cosine(a.v, b.v)"), 4).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** d16: EXACT-SUBSTRING overlap dedup — for every doc pair sharing
    * at least one run of `n` consecutive identical tokens, the length
    * of the LONGEST shared run. The standard "remove any ≥N-token
    * exact overlap" primitive beside MinHash (d06) and whole-doc
    * jaccard (d14): it catches a copied paragraph embedded in an
    * otherwise-unrelated document (jaccard ≈ 0) and overlaps shorter
    * than c04's fixed shingle width, and — unlike any shingle-SET
    * operator — reports the actual maximal overlap length, the number
    * an exact-substring policy thresholds on (suffix-array dedup's
    * answer, computed as a rolling-window equi-join).
    *
    * Scale shape: windows are bucketed BY VALUE (an equi-join key, the
    * LSH-band discipline with windows as the bands) with the hot-window
    * cap bounding boilerplate fan-out — never all-pairs; the island
    * agg is one shuffle on (pair, offset), output-pair-sized. */
  def substringOverlap(
      spark: SparkSession, sfDir: String,
      n: Int = SubstringWindowTokens,
      maxWindowFreq: Long = SubstringMaxWindowFreq): DataFrame =
    substringOverlapOn(docs(spark, sfDir), n, maxWindowFreq)

  /** [[substringOverlap]] over any (doc_id, text) frame. */
  private[graft] def substringOverlapOn(
      d: DataFrame, n: Int = SubstringWindowTokens,
      maxWindowFreq: Long = SubstringMaxWindowFreq): DataFrame = {
    // barriered: the cold frame feeds the hot-count anti-join build
    // AND both sides of the candidate self-join
    val cold = Persists.barrier(
      coldWindows(windowPositions(d, n), maxWindowFreq))
    val m = cold.as("a").join(cold.as("b"),
        col("a.w") === col("b.w") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.pos").as("pa"), col("b.pos").as("pb"))
    maxRunFromMatches(m, n, "doc_a", "doc_b")
  }

  /** c23's core (cross-set form of [[substringOverlapOn]]): maximal
    * exact train↔eval run per pair — candidates only meet ACROSS the
    * split, so candidate work is |eval|-bounded per window (the c20
    * asymmetry applied to exact-substring decontamination). */
  private[graft] def substringCrossOverlapOn(
      d: DataFrame, evalSource: String,
      n: Int = SubstringWindowTokens,
      maxWindowFreq: Long = SubstringMaxWindowFreq): DataFrame = {
    val cold = Persists.barrier(coldWindows(
      windowPositions(d, n, Seq("source")), maxWindowFreq))
    val train = cold.filter(col("source") =!= evalSource)
      .select(col("doc_id").as("train_id"), col("pos").as("pa"), col("w"))
    val ev = cold.filter(col("source") === evalSource)
      .select(col("doc_id").as("eval_id"), col("pos").as("pb"), col("w"))
    maxRunFromMatches(train.join(ev, "w")
        .select(col("train_id"), col("eval_id"), col("pa"), col("pb")),
      n, "train_id", "eval_id")
  }

  // ------------------------------------------------- intra-document dedup
  private val IntraChunkTokens = 8

  /** d18: INTRA-DOCUMENT DEDUP — the Gopher-class repetition-removal
    * filter (Rae et al. 2021 §A1.2) that trims duplicated SPANS inside
    * one document (boilerplate headers, templated repeats, generation
    * loops) rather than dropping whole docs: the doc splits into
    * fixed-`k`-token chunks, only the FIRST occurrence of each
    * distinct chunk survives (row_number over (doc, chunk) by
    * position — per-doc keys, no global hot key), and the kept chunks
    * re-join in original order. Emits (doc_id, clean_text, n_chunks,
    * n_dropped). The synthetic gate corpus is random-word text, so
    * 8-token repeats are absent there and the gate checks the
    * identity path (engine equivalence — the t18 uniform-corpus
    * precedent); DedupOpsSpec proves the trimming on repeat-dense
    * fixtures.
    *
    * Scale shape: one explode linear in corpus tokens, a per-doc
    * window (partition key = (doc_id, chunk) — bounded by the doc),
    * one per-doc agg rebuilding the text. Nothing crosses documents:
    * embarrassingly parallel at any corpus size. */
  def intraDocDedup(spark: SparkSession, sfDir: String): DataFrame =
    intraDocDedupOn(docs(spark, sfDir))

  /** [[intraDocDedup]] over any (doc_id, text) frame. */
  private[graft] def intraDocDedupOn(
      d: DataFrame, k: Int = IntraChunkTokens): DataFrame = {
    val chunks = d
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"), posexplode(expr(
        s"""transform(sequence(0, (size(t) + ${k - 1}) div $k - 1),
              i -> array_join(slice(t, i * $k + 1, $k), ' '))"""))
        .as(Seq("ci", "chunk")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id", "chunk").orderBy("ci")
    chunks.withColumn("rn", row_number().over(w))
      .groupBy("doc_id").agg(
        expr("""array_join(transform(
                  array_sort(collect_list(
                    CASE WHEN rn = 1 THEN struct(ci, chunk) END)),
                  s -> s.chunk), ' ')""").as("clean_text"),
        count(lit(1)).as("n_chunks"),
        sum(when(col("rn") > 1, 1L).otherwise(0L)).as("n_dropped"))
  }

  /** d18's DuckDB twin: same k-token chunking, same first-occurrence
    * rule, same in-order re-join (string_agg skips the non-first
    * occurrences' NULLs). */
  private[graft] val intraDocOracle: String =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS t
                   FROM documents),
       ch AS (SELECT doc_id, i AS ci,
                     array_to_string(
                       list_slice(t, i * $IntraChunkTokens + 1,
                                  i * $IntraChunkTokens
                                    + $IntraChunkTokens), ' ') AS chunk
              FROM t, unnest(range(0, (len(t) + ${IntraChunkTokens - 1})
                                      // $IntraChunkTokens)) AS u(i)),
       rn AS (SELECT doc_id, ci, chunk,
                     row_number() OVER (PARTITION BY doc_id, chunk
                                        ORDER BY ci) AS rn
              FROM ch)
       SELECT doc_id,
              string_agg(CASE WHEN rn = 1 THEN chunk END, ' '
                         ORDER BY ci) AS clean_text,
              count(*) AS n_chunks,
              CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_dropped
       FROM rn GROUP BY doc_id"""

  /** d20: MINHASH CALIBRATION REPORT — the "is my signature length
    * enough" telemetry a MinHash deployment checks before trusting
    * signature-estimated similarity (E[matching/slots] = true
    * jaccard; with only 8 slots the estimator is coarse, and THIS
    * report shows exactly how coarse on the live corpus): for every
    * d06 band candidate pair, the matching-slot count of the two
    * 8-slot portable signatures next to the EXACT shingle jaccard,
    * rolled up per matching-slot count — (matching_slots, n_pairs,
    * mean_jaccard, est_jaccard = slots/8). Per-pair jaccard is
    * rounded 4 dp BEFORE the mean (mirroring the d06 `j` algebra
    * verbatim), mean rounded 4 dp.
    *
    * Scale shape: the d06 banded candidate join (never all-pairs) +
    * a 9-row roll-up. */
  def minhashCalibration(spark: SparkSession, sfDir: String): DataFrame =
    minhashCalibrationOn(portableSigFrame(spark, sfDir))

  /** [[minhashCalibration]] reading the pre-materialized signature
    * table (benched d20i — the d12i serve discipline; DedupOpsSpec
    * pins served ≡ inline). */
  def minhashCalibrationFromSigs(
      spark: SparkSession, sfDir: String): DataFrame =
    minhashCalibrationOn(
      spark.read.parquet(signatureTablePath(spark, sfDir)))

  /** [[minhashCalibration]] over any (doc_id, sh, sig) frame. */
  private[graft] def minhashCalibrationOn(d: DataFrame): DataFrame =
    bandCandidates(d, lit(true))
      .join(d.select(col("doc_id"), col("sh"), col("sig")).as("a"),
        col("id_a") === col("a.doc_id"))
      .join(d.select(col("doc_id"), col("sh"), col("sig")).as("b"),
        col("id_b") === col("b.doc_id"))
      .select(
        expr("size(filter(zip_with(a.sig, b.sig, (x, y) -> x = y)," +
          " v -> v))").as("matching_slots"),
        round(size(array_intersect(col("a.sh"), col("b.sh")))
          .cast("double") /
          size(array_union(col("a.sh"), col("b.sh"))), 4).as("jacc"))
      .groupBy("matching_slots").agg(
        count(lit(1)).as("n_pairs"),
        round(avg("jacc"), 4).as("mean_jaccard"))
      .withColumn("est_jaccard",
        round(col("matching_slots") / 8.0, 4))

  /** d20's DuckDB twin: the d06 CTEs verbatim (cand for the pair set,
    * sig for the slots, j for the exact per-pair jaccard), the same
    * slot-equality count and roll-up. */
  private def minhashCalibrationOracle: String = {
    val slotEq = (0 until 8).map(i =>
      s"CASE WHEN a.m$i = b.m$i THEN 1 ELSE 0 END").mkString(" + ")
    s"""WITH $minhashPortableCtes,
       ms AS (SELECT cand.id_a, cand.id_b, ($slotEq) AS matching_slots
              FROM cand
              JOIN sig a ON a.doc_id = cand.id_a
              JOIN sig b ON b.doc_id = cand.id_b)
       SELECT matching_slots,
              count(*) AS n_pairs,
              round(avg(jaccard), 4) AS mean_jaccard,
              round(matching_slots / 8.0, 4) AS est_jaccard
       FROM ms JOIN j ON ms.id_a = j.id_a AND ms.id_b = j.id_b
       GROUP BY matching_slots"""
  }

  /** d19: DEDUP TELEMETRY BY SOURCE — the per-source duplication
    * report corpus operations actually watch (which crawl/source is
    * flooding the mix with copies, and whose content leaks across
    * sources): per source, total docs, within-source exact-dup count
    * (docs beyond the first per fingerprint), and the count of docs
    * whose content also appears in ANOTHER source. Fingerprint is
    * md5(text) — the d01 key — so the report is exact and
    * hash-anchored.
    *
    * Scale shape: one fingerprint projection, two fingerprint-keyed
    * aggs (16-byte shuffle keys, partial map-side), a semi join
    * against the cross-source fingerprint set, and a sources-sized
    * roll-up. No self-join, no windows over the corpus. */
  def dedupReport(spark: SparkSession, sfDir: String): DataFrame =
    dedupReportOn(docs(spark, sfDir)
      .select(col("doc_id"), col("source"), col("text")))

  /** [[dedupReport]] over any (doc_id, source, text) frame. */
  private[graft] def dedupReportOn(d: DataFrame): DataFrame = {
    val h = Persists.barrier(
      d.select(col("source"), md5(col("text")).as("fp")))
    val cross = h.groupBy("fp")
      .agg(countDistinct("source").as("ns"))
      .filter(col("ns") >= 2).select("fp")
    val base = h.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      countDistinct("fp").as("n_distinct"))
    val leak = h.join(cross, Seq("fp"), "left_semi")
      .groupBy("source").agg(count(lit(1)).as("n_cross_source"))
    base.join(leak, Seq("source"), "left")
      .select(col("source"), col("n_docs"),
        (col("n_docs") - col("n_distinct")).as("n_exact_dups"),
        coalesce(col("n_cross_source"), lit(0L)).as("n_cross_source"))
  }

  /** d19's DuckDB twin: same md5 key, same three aggregations. */
  private[graft] val dedupReportOracle: String =
    """WITH h AS (SELECT source, md5(text) AS fp FROM documents),
       cross_fp AS (SELECT fp FROM h GROUP BY fp
                    HAVING count(DISTINCT source) >= 2),
       base AS (SELECT source, count(*) AS n_docs,
                       count(DISTINCT fp) AS n_distinct
                FROM h GROUP BY source),
       leak AS (SELECT source, count(*) AS n_cross_source
                FROM h SEMI JOIN cross_fp USING (fp)
                GROUP BY source)
       SELECT base.source, n_docs,
              n_docs - n_distinct AS n_exact_dups,
              coalesce(n_cross_source, 0) AS n_cross_source
       FROM base LEFT JOIN leak ON base.source = leak.source"""

  // ------------------------------------------------ d21 containment
  /** d21: SHINGLE CONTAINMENT DEDUP (Broder 1997's containment
    * coefficient beside his resemblance/jaccard) — the asymmetric
    * near-dup modality the jaccard family structurally misses: a
    * document EMBEDDED in a much larger one (quoted article, page +
    * boilerplate wrapper, excerpt) has tiny jaccard (∩ / big ∪) but
    * containment |A∩B| / |A| ≈ 1 from the small side. Per candidate
    * pair (inverted-index join on shared distinct 5-word shingles,
    * hot-shingle cap mirrored in the oracle — the d04 canopy
    * discipline), both directional coefficients on the 4-dp grid;
    * pairs where the MAX direction ≥ 0.9 emit with `contained_id` =
    * the more-contained side (ties → the lower id, matching the
    * c_a ≥ c_b branch). The 0.9 cut BINDS on the gate corpus (28/8
    * and 25/12 above/below at the two SFs). ContainmentSpec proves
    * the asymmetric case: an excerpt inside a 10× doc flags here
    * with jaccard ≈ 0.1 — invisible to d04 at any useful threshold.
    *
    * Scale shape: candidates only through shared-shingle buckets
    * (per-key work capped at maxShingleFreq²/2, boilerplate keys
    * dropped on both sides); the verify join touches candidate
    * pairs, never all pairs — the d04 argument verbatim. */
  def containmentDedup(spark: SparkSession, sfDir: String): DataFrame =
    containmentDedupOn(docs(spark, sfDir))

  /** [[containmentDedup]] over any (doc_id, text) frame. */
  private[graft] def containmentDedupOn(
      input: DataFrame, threshold: Double = 0.9,
      maxShingleFreq: Long = 100): DataFrame = {
    graft.functions.GraftFunctions.register(input.sparkSession)
    val d = Persists.barrier(input
      .select(col("doc_id"), Shingles.wordShingles("text", 5).as("sh")))
    val keys = d.select(col("doc_id"), explode(col("sh")).as("key"))
    val hot = keys.groupBy("key").count()
      .filter(col("count") > maxShingleFreq).select("key")
    val cold = keys.join(broadcast(hot), Seq("key"), "left_anti")
    val cand = cold.as("x").join(cold.as("y"),
        col("x.key") === col("y.key") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .distinct()
    cand
      .join(d.as("a"), col("id_a") === col("a.doc_id"))
      .join(d.as("b"), col("id_b") === col("b.doc_id"))
      .select(col("id_a"), col("id_b"),
        round(size(array_intersect(col("a.sh"), col("b.sh")))
          .cast("double") / size(col("a.sh")), 4).as("cont_a"),
        round(size(array_intersect(col("a.sh"), col("b.sh")))
          .cast("double") / size(col("b.sh")), 4).as("cont_b"))
      .filter(greatest(col("cont_a"), col("cont_b")) >= threshold)
      .withColumn("contained_id",
        when(col("cont_a") >= col("cont_b"), col("id_a"))
          .otherwise(col("id_b")))
  }

  /** d21's DuckDB twin: the graft_shingles expansion (with its <k
    * whole-text fallback), the same hot-key cut, both directional
    * coefficients on the same grid. */
  private val containmentOracle: String =
    """WITH d AS (
         SELECT doc_id,
                CASE WHEN len(string_split(text, ' ')) < 5 THEN [text]
                     ELSE list_distinct(list_transform(
                            range(1, len(string_split(text, ' ')) - 3),
                            i -> array_to_string(
                                   string_split(text, ' ')[i:i+4], ' ')))
                END AS sh
         FROM documents),
       keys AS (SELECT doc_id, unnest(sh) AS key FROM d),
       hot AS (SELECT key FROM keys GROUP BY key HAVING count(*) > 100),
       cold AS (SELECT doc_id, key FROM keys
                WHERE key NOT IN (SELECT key FROM hot)),
       cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
                FROM cold x JOIN cold y
                  ON x.key = y.key AND x.doc_id < y.doc_id),
       j AS (SELECT id_a, id_b,
                    round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                          / len(a.sh), 4) AS cont_a,
                    round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                          / len(b.sh), 4) AS cont_b
             FROM cand
             JOIN d a ON a.doc_id = cand.id_a
             JOIN d b ON b.doc_id = cand.id_b)
     SELECT id_a, id_b, cont_a, cont_b,
            CASE WHEN cont_a >= cont_b THEN id_a ELSE id_b END
              AS contained_id
     FROM j WHERE greatest(cont_a, cont_b) >= 0.9"""

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d21_dedup_containment" ->
      ((s: SparkSession, d: String) => containmentDedup(s, d)),
    "d20_minhash_calibration" ->
      ((s: SparkSession, d: String) => minhashCalibration(s, d)),
    "d19_dedup_report" ->
      ((s: SparkSession, d: String) => dedupReport(s, d)),
    "d18_intradoc_dedup" ->
      ((s: SparkSession, d: String) => intraDocDedup(s, d)),
    "d16_substring_overlap" ->
      ((s: SparkSession, d: String) => substringOverlap(s, d)),
    "d17_semdedup_cells" ->
      ((s: SparkSession, d: String) => semdedupCells(s, d)),
    "d22_soft_dedup_weights" -> (softDedupWeights _),
    "d23_band_planner" -> ((s: SparkSession, d: String) =>
      bandPlanner(s, d)),
    "d24_dedup_canonical" -> (canonicalDedup _),
    "d01_dedup_exact" -> ((spark: SparkSession, sfDir: String) => {
      Tables.registerAll(spark, sfDir); spark.sql(exactSql)
    }),
    "d10_dedup_multisignal" -> (multiSignal _),
    "d08_dedup_clusters" ->
      ((s: SparkSession, d: String) => dedupClusters(s, d)),
    "d09_dedup_keep" -> (dedupKeep _),
    "d11_dedup_keep_quality" -> (dedupKeepQuality _),
    "d12_dedup_incremental" ->
      ((s: SparkSession, d: String) => incrementalDedup(s, d)),
    "d02_dedup_minhash" ->
      ((s: SparkSession, d: String) => minhashLsh(s, d)),
    "d06_dedup_minhash_portable" ->
      ((s: SparkSession, d: String) => minhashPortable(s, d)),
    "d13_dedup_editdist" ->
      ((s: SparkSession, d: String) => editDistDedup(s, d)),
    "d07_dedup_simhash_portable" ->
      ((s: SparkSession, d: String) => simhashPortable(s, d)),
    "d03_dedup_simhash" ->
      ((s: SparkSession, d: String) => simhashPairs(s, d)),
    "d04_dedup_ngram" ->
      ((s: SparkSession, d: String) => ngramJaccard(s, d)),
    "d14_dedup_prefix_jaccard" ->
      ((s: SparkSession, d: String) => prefixJaccard(s, d)),
    "d05_dedup_embedding" ->
      ((s: SparkSession, d: String) => embeddingNearDup(s, d)),
    "d15_cdc_chunks" ->
      ((s: SparkSession, d: String) => cdcChunkCensus(s, d))
  )

  /** d04 is deterministic end-to-end (no hash-dependent recall): the
    * DuckDB twin rebuilds the same 5-char grams (non-overlapping regex
    * chunks), the same sliding-window distinct 8-word canopy shingles
    * (WordShingles semantics: step 1, distinct, whole text when < k
    * words), the same >maxCanopyFreq hot-key cutoff, and the same
    * round-then-threshold jaccard. */
  /** d14's oracle is BRUTE FORCE — the prefix filter is lossless, so
    * the exact all-pairs θ-join is precisely what the filtered join
    * must produce (the round-then-threshold jaccard spelled like d04's;
    * |union| = |A| + |B| − |A∩B| on already-distinct gram lists). */
  private val prefixJaccardOracle: String =
    """WITH d0 AS (
         SELECT doc_id,
                list_distinct(regexp_extract_all(text, '.{5}')) AS grams
         FROM documents),
       d AS (SELECT * FROM d0 WHERE len(grams) > 0),
       p AS (
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                round(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) /
                      (len(a.grams) + len(b.grams) -
                       len(list_intersect(a.grams, b.grams))), 4) AS jaccard
         FROM d a JOIN d b ON a.doc_id < b.doc_id)
       SELECT id_a, id_b, jaccard FROM p WHERE jaccard >= 0.5"""

  private val ngramOracle: String =
    """WITH d AS (
         SELECT doc_id,
                list_distinct(regexp_extract_all(text, '.{5}')) AS grams,
                CASE WHEN len(string_split(text, ' ')) < 8 THEN [text]
                     ELSE list_distinct(list_transform(
                            range(1, len(string_split(text, ' ')) - 6),
                            i -> array_to_string(
                                   string_split(text, ' ')[i:i+7], ' ')))
                END AS canopy
         FROM documents),
       keys AS (SELECT doc_id, unnest(canopy) AS key FROM d),
       hot AS (SELECT key FROM keys GROUP BY key HAVING count(*) > 100),
       cold AS (SELECT doc_id, key FROM keys
                WHERE key NOT IN (SELECT key FROM hot)),
       cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
                FROM cold x JOIN cold y
                  ON x.key = y.key AND x.doc_id < y.doc_id),
       j AS (SELECT id_a, id_b,
                    round(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) /
                          len(list_distinct(list_concat(a.grams, b.grams))),
                          4) AS jaccard
             FROM cand
             JOIN d a ON a.doc_id = cand.id_a
             JOIN d b ON b.doc_id = cand.id_b)
     SELECT id_a, id_b, jaccard FROM j WHERE jaccard >= 0.5"""

  /** d05's oracle is the BRUTE-FORCE pair scan: LSH candidate generation
    * never invents pairs (every candidate is verified with exact cosine),
    * so the outputs match iff recall is 100% — which the (tables=16,
    * planes=2) defaults guarantee on this data (DedupOpsSpec proves exact
    * agreement with brute force at sf0.01). The cosine spelling is
    * term-for-term the graft_cosine kernel (see s01's oracle). */
  private val embeddingOracle: String =
    """WITH v AS (
         SELECT vec_id,
                list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         FROM embeddings),
       pairs AS (
         SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                round(list_dot_product(a.v, b.v) /
                      sqrt(list_sum(list_transform(a.v, x -> x * x)) *
                           list_sum(list_transform(b.v, x -> x * x))),
                      4) AS cosine
         FROM v a, v b WHERE a.vec_id < b.vec_id)
     SELECT id_a, id_b, cosine FROM pairs WHERE cosine >= 0.3"""

  /** The connected-components CTE block shared by the d08 and d09
    * oracles (pairs → symmetric edges → recursive reachable-label
    * accumulation; UNION dedups, so it terminates): one definition so
    * the two can never assert different cluster semantics. */
  private[operators] val clusterCtes: String =
    s"""$minhashPortableCtes,
        pairs AS (SELECT id_a, id_b FROM j WHERE jaccard >= 0.4),
        edges AS (SELECT id_a AS v, id_b AS u FROM pairs
                  UNION ALL SELECT id_b, id_a FROM pairs),
        cc(v, lbl) AS (
          SELECT v, v FROM (SELECT DISTINCT v FROM edges)
          UNION
          SELECT e.v, cc.lbl FROM edges e JOIN cc ON cc.v = e.u)"""

  /** d08's oracle: the SAME pair CTEs as d06, then connected components
    * — min reachable label per vertex is the component representative. */
  private val clustersOracle: String =
    s"""WITH RECURSIVE $clusterCtes
      SELECT v AS doc_id, min(lbl) AS cluster_id FROM cc GROUP BY v"""

  /** d09's oracle: the same components, then keep every doc that is not
    * a losing cluster member. */
  private val keepOracle: String =
    s"""WITH RECURSIVE $clusterCtes,
        comp AS (SELECT v, min(lbl) AS lbl FROM cc GROUP BY v)
      SELECT doc_id, lang, source, n_chars FROM documents
      WHERE doc_id NOT IN (SELECT v FROM comp WHERE v <> lbl)"""

  /** d11's oracle: the same components, then a per-cluster qualifying
    * window on (n_chars DESC, doc_id) — rank 1 is the keeper. */
  private val keepQualityOracle: String =
    s"""WITH RECURSIVE $clusterCtes,
        comp AS (SELECT v, min(lbl) AS lbl FROM cc GROUP BY v),
        ranked AS (
          SELECT d.doc_id,
                 row_number() OVER (PARTITION BY c.lbl
                   ORDER BY d.n_chars DESC, d.doc_id) AS rk
          FROM documents d JOIN comp c ON d.doc_id = c.v)
      SELECT doc_id, lang, source, n_chars FROM documents
      WHERE doc_id NOT IN (SELECT doc_id FROM ranked WHERE rk > 1)"""

  /** d22's oracle: the same components, every document labeled (its
    * component min or itself), one size roll-up, 6-dp weights. */
  private val softDedupOracle: String =
    s"""WITH RECURSIVE $clusterCtes,
        comp AS (SELECT v, min(lbl) AS lbl FROM cc GROUP BY v),
        lab AS (SELECT d.doc_id, coalesce(c.lbl, d.doc_id) AS cluster_id
                FROM documents d LEFT JOIN comp c ON c.v = d.doc_id),
        sz AS (SELECT cluster_id, count(*) AS cluster_size
               FROM lab GROUP BY 1)
      SELECT lab.doc_id, lab.cluster_id, sz.cluster_size,
             round(1.0 / sz.cluster_size, 6) AS weight
      FROM lab JOIN sz USING (cluster_id)"""

  /** d15's DuckDB twin: same tokenization, same portable boundary hash
    * mod 8, same [0]+boundaries+[n] bounds algebra, same chunk join,
    * same min-length gate and ≥2 census. */
  private val cdcChunkOracle: String = {
    val h = PortableHash.packed("ws[CAST(i AS INTEGER)]")
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
                   FROM documents),
        b AS (SELECT doc_id, ws,
                list_concat(list_concat([CAST(0 AS BIGINT)],
                  list_filter(range(1, len(ws)), i -> $h % 8 = 0)),
                  [CAST(len(ws) AS BIGINT)]) AS bounds
              FROM w),
        ch AS (SELECT doc_id,
                 unnest(list_transform(range(1, len(bounds)),
                   c -> array_to_string(ws[
                          CAST(bounds[CAST(c AS INTEGER)] + 1 AS INTEGER):
                          CAST(bounds[CAST(c + 1 AS INTEGER)] AS INTEGER)],
                        ' '))) AS chunk
               FROM b),
        f AS (SELECT doc_id, md5(chunk) AS chunk_hash FROM ch
              WHERE length(chunk) >= 20)
      SELECT chunk_hash, count(DISTINCT doc_id) AS n_docs,
             count(*) AS n_occ
      FROM f GROUP BY chunk_hash HAVING count(*) >= 2"""
  }

  /** d16's DuckDB twin: same windows (list_slice ≡ Spark slice, both
    * 1-based inclusive-length), same ≤cap HAVING mirror of the hot
    * filter, same island grouping. Shared by c23 (source-split join)
    * via [[substringOracle]]. */
  private[graft] def substringOracle(
      joinSides: String, outA: String, outB: String): String = {
    val n = SubstringWindowTokens
    s"""WITH tok AS MATERIALIZED (
         SELECT doc_id, source, string_split(text, ' ') AS toks
         FROM documents),
       win AS MATERIALIZED (
         SELECT doc_id, source, u.i AS pos,
                array_to_string(list_slice(toks, u.i, u.i + ${n - 1}), ' ')
                  AS w
         FROM tok, unnest(generate_series(1, len(toks) - ${n - 1}))
           AS u(i)
         WHERE len(toks) >= $n),
       cold AS MATERIALIZED (
         SELECT * FROM win WHERE w IN (
           SELECT w FROM win GROUP BY w
           HAVING count(*) <= $SubstringMaxWindowFreq)),
       m AS MATERIALIZED ($joinSides),
       isl AS (
         SELECT ka, kb, pa - pb AS off, pa,
                pa - row_number() OVER
                  (PARTITION BY ka, kb, pa - pb ORDER BY pa) AS g
         FROM m),
       runs AS (
         SELECT ka, kb, count(*) + ${n - 1} AS run_len
         FROM isl GROUP BY ka, kb, off, g)
       SELECT ka AS $outA, kb AS $outB,
              max(run_len) AS max_overlap_tokens
       FROM runs GROUP BY ka, kb"""
  }

  private val substringOverlapOracle: String = substringOracle(
    """SELECT a.doc_id AS ka, b.doc_id AS kb, a.pos AS pa, b.pos AS pb
       FROM cold a JOIN cold b
         ON a.w = b.w AND a.doc_id < b.doc_id""",
    "doc_a", "doc_b")

  /** d17's DuckDB twin: the s04 oracle's Voronoi assignment (argmax
    * unrounded cosine, ties to the lower cent_id) feeding a same-cell
    * pair join and the rounded-cosine threshold. */
  private val semdedupOracle: String =
    """WITH v AS (
         SELECT vec_id,
                list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         FROM embeddings),
       cents AS (SELECT vec_id AS cent_id, v FROM v WHERE vec_id % 23 = 0),
       sim AS (
         SELECT a.vec_id, c.cent_id,
                list_dot_product(a.v, c.v) /
                  sqrt(list_sum(list_transform(a.v, x -> x * x)) *
                       list_sum(list_transform(c.v, x -> x * x))) AS s
         FROM v a, cents c),
       assign AS (
         SELECT vec_id, cent_id FROM (
           SELECT vec_id, cent_id,
                  row_number() OVER (PARTITION BY vec_id
                                     ORDER BY s DESC, cent_id) AS rn
           FROM sim) WHERE rn = 1),
       scored AS (
         SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                round(list_dot_product(x.v, y.v) /
                      sqrt(list_sum(list_transform(x.v, t -> t * t)) *
                           list_sum(list_transform(y.v, t -> t * t))),
                      4) AS cosine
         FROM assign a JOIN assign b
           ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id
         JOIN v x ON x.vec_id = a.vec_id
         JOIN v y ON y.vec_id = b.vec_id)
     SELECT id_a, id_b, cosine FROM scored WHERE cosine >= 0.3"""

  def oracleSql: Map[String, String] = Map(
    "d22_soft_dedup_weights" -> softDedupOracle,
    "d23_band_planner" -> bandPlannerOracle,
    // d24: the shared fixture, t33's normalize algebra, the d01 census
    "d24_dedup_canonical" ->
      s"""WITH p AS ($canonicalFixtureSql),
          c AS (SELECT doc_id,
                       md5(trim(regexp_replace(
                         regexp_replace(lower(text), '[^a-z0-9 ]', ' ',
                                        'g'),
                         ' +', ' ', 'g'))) AS canonical_hash
                FROM p)
        SELECT canonical_hash, count(*) AS n_docs, min(doc_id) AS keeper
        FROM c GROUP BY 1 HAVING count(*) >= 2""",
    "d20_minhash_calibration" -> minhashCalibrationOracle,
    "d19_dedup_report" -> dedupReportOracle,
    "d18_intradoc_dedup" -> intraDocOracle,
    "d16_substring_overlap" -> substringOverlapOracle,
    "d17_semdedup_cells" -> semdedupOracle,
    "d15_cdc_chunks" -> cdcChunkOracle,
    "d01_dedup_exact" -> exactSql,
    "d11_dedup_keep_quality" -> keepQualityOracle,
    "d12_dedup_incremental" -> incrementalOracle,
    "d04_dedup_ngram" -> ngramOracle,
    "d21_dedup_containment" -> containmentOracle,
    "d14_dedup_prefix_jaccard" -> prefixJaccardOracle,
    "d05_dedup_embedding" -> embeddingOracle,
    "d06_dedup_minhash_portable" -> minhashPortableOracle,
    "d13_dedup_editdist" -> editDistOracle,
    "d07_dedup_simhash_portable" -> simhashPortableOracle,
    "d08_dedup_clusters" -> clustersOracle,
    "d09_dedup_keep" -> keepOracle,
    "d10_dedup_multisignal" -> multiSignalOracle
  )

  /** d10's oracle: the d06 text pairs and the d05 brute-force embedding
    * pairs union'd under their signal tags (cosine spelling is
    * term-for-term the shared kernel — see embeddingOracle). */
  private val multiSignalOracle: String =
    s"""WITH $minhashPortableCtes,
        ev AS (SELECT vec_id,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
        epairs AS (
          SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                 round(list_dot_product(a.v, b.v) /
                       sqrt(list_sum(list_transform(a.v, x -> x * x)) *
                            list_sum(list_transform(b.v, x -> x * x))),
                       4) AS cosine
          FROM ev a, ev b WHERE a.vec_id < b.vec_id)
      SELECT id_a, id_b, 'text' AS signal, jaccard AS score
      FROM j WHERE jaccard >= 0.4
      UNION ALL
      SELECT id_a, id_b, 'embedding' AS signal, cosine AS score
      FROM epairs WHERE cosine >= 0.3"""
}
