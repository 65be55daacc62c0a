package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Approximate-nearest-neighbor search over the embeddings table
  * (`embedding: Array[Float]`, 64-dim).
  *
  * Two paths, same output shape (query_id, rank, neighbor_id, cosine):
  *  - [[bruteForceTopK]] — exact baseline: broadcast the (small) query
  *    set against every vector; one narrow pass + a per-query top-k.
  *    At 100 TB this is the correct plan when |queries| is small: the
  *    big side streams, nothing shuffles but the top-k (bounded k·|Q|).
  *  - [[lshTopK]] — scale path when |queries| is large: random-hyperplane
  *    LSH signatures bucket the vectors; only same-bucket pairs meet.
  *    Hyperplane components are hash-derived pseudo-gaussians
  *    ([[graft.functions.HyperplaneSigs]]) so the whole index is
  *    deterministic and needs no fitted model or stored state —
  *    recompute-on-read, which is exactly what you want for a 100 TB
  *    immutable corpus.
  *
  * All vector math is higher-order array functions (zip_with/aggregate)
  * — codegen'd, no UDFs.
  */
object SimilarityOps {

  /** (vec_id, v) only — `label` stays OUT of the shared projection so
    * every ANN scan that doesn't filter on it prunes the column at the
    * parquet reader (PlanAudit ReadSchema); s07 adds it explicitly.
    * Shared across the s- and g-families and the probe tools (one
    * definition of the double-cast projection, so cosines can never
    * drift between them). */
  private[graft] def vecs(
      spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x AS DOUBLE))").as("v"))
  }

  /** [[vecs]] + the metadata column the filtered-search entry needs. */
  private def vecsWithLabel(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> cast(x AS DOUBLE))").as("v"))
  }

  /** One fused codegen pass: dot + both norms (graft.functions.CosineSim). */
  private val cosineExpr = expr("graft_cosine(q.v, c.v)")

  /** The exact broadcast-queries score-and-rank pipeline shared by s01
    * and s07 (one definition of the join shape, rounding, and
    * tie-break); `extra` carries corpus-side columns through to the
    * output. */
  private def exactTopK(
      corpus: DataFrame, q: DataFrame, k: Int,
      extra: Seq[String] = Nil): DataFrame = {
    val scored = corpus.as("c").join(
        broadcast(q.as("q")), col("q.vec_id") =!= col("c.vec_id"))
      .select(Seq(col("q.vec_id").as("query_id"),
        col("c.vec_id").as("neighbor_id")) ++
        extra.map(e => col(s"c.$e").as(e)) :+
        round(cosineExpr, 4).as("cosine"): _*)
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select((Seq("query_id", "rank", "neighbor_id") ++ extra :+ "cosine")
        .map(col): _*)
  }

  /** Exact top-k by cosine for query vectors `vec_id < nQueries`. */
  def bruteForceTopK(
      spark: SparkSession, sfDir: String,
      nQueries: Int = 5, k: Int = 10): DataFrame = {
    val all = vecs(spark, sfDir)
    exactTopK(all, all.filter(col("vec_id") < nQueries), k)
  }

  /** s31: ROCCHIO PSEUDO-RELEVANCE FEEDBACK (Rocchio 1971, the
    * classic query-expansion loop): round 1 retrieves the top-`fb`
    * neighbors exactly (s01's kernel), the query moves toward their
    * centroid — q' = α·q + β·mean(top-fb vectors), α = 1, β = 0.75,
    * γ = 0 (no negative feedback) — and round 2 re-retrieves top-`k`
    * with the moved query. The two-round embedding-space analog of
    * the BM25 expansion every IR stack ships; on an embedding corpus
    * it pulls the query into its local cluster before the final
    * ranking.
    *
    * Determinism: the feedback mean is an EXPLICIT 5-term elementwise
    * sum in rank order (no aggregate-order jitter), re-entering round
    * 2 on an 8-dp grid; both rounds rank on 4-dp cosines with id
    * tie-breaks. Scale shape: two broadcast-query scans plus a
    * k-vector centroid per query — the corpus is read twice and
    * shuffled never. */
  def rocchioTopK(
      spark: SparkSession, sfDir: String,
      nQueries: Int = 5, fb: Int = 5, k: Int = 10,
      alpha: Double = 1.0, beta: Double = 0.75): DataFrame = {
    require(fb == 5, "the explicit 5-term feedback sum is fb=5-specific")
    val all = Persists.barrier(vecs(spark, sfDir))
    val q0 = all.filter(col("vec_id") < nQueries)
    val r1 = exactTopK(all, q0, fb)
    val nb = r1
      .join(all.select(col("vec_id").as("neighbor_id"), col("v").as("nv")),
        "neighbor_id")
      .groupBy("query_id")
      .agg(sort_array(collect_list(struct(col("rank"), col("nv"))))
        .as("nvs"))
    val expanded = q0.select(col("vec_id").as("query_id"), col("v"))
      .join(nb, "query_id")
      .select(col("query_id").as("vec_id"), expr(
        s"""transform(sequence(1, size(v)), i -> round(
              $alpha * element_at(v, i) + $beta * (
                (element_at(nvs[0].nv, i) + element_at(nvs[1].nv, i) +
                 element_at(nvs[2].nv, i) + element_at(nvs[3].nv, i) +
                 element_at(nvs[4].nv, i)) / 5.0D), 8))""").as("v"))
    exactTopK(all, expanded, k)
  }

  /** s20: HARD-NEGATIVE mining for contrastive training — per anchor,
    * the top-`k` most-similar corpus vectors that are NOT near-
    * duplicates (cosine < `dupThreshold`): the highest-value negatives
    * a contrastive objective can see, with the positives/duplicates
    * (≥ threshold — d05/d17's flag band) excluded so a training pair
    * never contrasts a document against its own copy. c14's seeded
    * RANDOM negatives are the baseline; this is the ANN-powered
    * upgrade every embedding-model pipeline runs. Same brute scoring
    * kernel and (cosine desc, id) rank as s01 — the dup filter sits
    * between scoring and ranking, so rank 1 is the hardest VALID
    * negative. The gate threshold 0.33 is the band that BINDS on the
    * structureless corpus (it excludes the raw top-1 of 4-5 of the 5
    * anchors at both gate SFs, so the gated output provably differs
    * from s01); a real-corpus run sets the d17/d05 dup threshold
    * (~0.95). */
  def hardNegatives(
      spark: SparkSession, sfDir: String,
      nQueries: Int = 5, k: Int = 10,
      dupThreshold: Double = 0.33): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val all = vecs(spark, sfDir)
    val scored = all.as("c").join(
        broadcast(all.filter(col("vec_id") < nQueries).as("q")),
        col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("query_id"),
        col("c.vec_id").as("neighbor_id"),
        round(cosineExpr, 4).as("cosine"))
      .filter(col("cosine") < dupThreshold)
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }

  /** LSH-bucketed ANN: `tables` independent hash tables of `planes`-bit
    * signatures; a candidate appears if it collides with the query in ANY
    * table. Approximate — recall grows with `tables`. */
  def lshTopK(
      spark: SparkSession, sfDir: String,
      nQueries: Int = 5, k: Int = 10,
      tables: Int = 8, planes: Int = 8,
      maxBucketFreq: Long = 5000): DataFrame =
    lshTopKOn(vecs(spark, sfDir),
      Tables.rowCount(spark, sfDir, "embeddings"),
      nQueries, k, tables, planes, maxBucketFreq)

  /** [[lshTopK]] over any (vec_id, v) frame — fixture-injectable. */
  def lshTopKOn(
      all: DataFrame, corpusRows: Long,
      nQueries: Int, k: Int,
      tables: Int, planes: Int,
      maxBucketFreq: Long): DataFrame = {
    graft.functions.GraftFunctions.register(all.sparkSession)
    // all table signatures in one compiled pass (graft_lsh_sigs), then
    // persist: referenced by both sides of the candidate join — without
    // the barrier the signature computation is inlined and re-run per use
    val bucketed = Persists.barrier(all
      .withColumn("sigs", expr(s"graft_lsh_sigs(v, $tables, $planes)"))
      .select(col("vec_id"), col("v"),
        posexplode(col("sigs")).as(Seq("t", "sig"))))
    // hot-bucket cutoff: a bucket hotter than the cap carries no
    // discriminating signal and would make candidate generation
    // quadratic in the bucket size — drop it from BOTH sides (a pair
    // still meets in any colder table); shared guard, see
    // DedupOps.dropHotBuckets for the dominance short-circuit
    val cold = DedupOps.dropHotBuckets(bucketed, Seq("t", "sig"),
      maxBucketFreq, Some(corpusRows))
    val q = cold.filter(col("vec_id") < nQueries)
    val cand = cold.as("c").join(broadcast(q.as("q")),
        col("q.t") === col("c.t") && col("q.sig") === col("c.sig") &&
          col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
        round(cosineExpr, 4).as("cosine"))
      .distinct()
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    cand.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }

  // ----------------------------------------------- portable LSH twin
  /** Integer hyperplane coefficient for (table `t`, plane `p`,
    * dimension j) — pure integer arithmetic expressible identically in
    * Spark SQL and DuckDB, symmetric around 0 (range −9..9), so the
    * sign-random-projection family needs no gaussian draws and no
    * stored model. ONE string shared by both engines. */
  private def coefSql(t: Int, p: Int): String =
    s"CAST(((($t * 131) + ($p * 37) + j * 17) % 19) - 9 AS DOUBLE)"

  private val portTables = 4
  private val portPlanes = 8

  /** The engine-side portable signatures: the native codegen'd
    * expression ([[graft.functions.PortableSigs]]) — bit-identical to
    * the SQL fold the oracle runs (left-to-right accumulation, `>= 0`
    * sign, `1 << p` packing; PortableSigsSpec pins equality on the
    * real table). The interpreted 32-HOF SQL form cost ~9 s at sf0.1
    * purely in lambda interpretation (round-12 bench finding). */
  private def portableSigsCol: Column =
    call_function("graft_portable_sigs",
      col("v"), lit(portTables), lit(portPlanes))

  /** The SQL-text twin of [[portableSigsCol]] — kept ONLY as the
    * spec's equivalence anchor (it is the algebra the DuckDB oracle
    * mirrors). */
  private[graft] def portableSigsSqlExpr: String =
    (0 until portTables).map { t =>
      (0 until portPlanes).map { p =>
        s"""CASE WHEN aggregate(sequence(0, 63), 0D,
              (acc, j) -> acc + element_at(v, j + 1) * ${coefSql(t, p)})
              >= 0 THEN ${1 << p} ELSE 0 END"""
      }.mkString("(", " + ", ")")
    }.mkString("array(", ", ", ")")

  /** [[lshTopK]] with the PORTABLE hyperplane family: per (table,
    * plane), the projection is Σ_j v[j]·coef(t,p,j) folded
    * left-to-right (bit-parity across engines — see s03), the per-table
    * bucket signature packs the 8 sign bits, and candidates are
    * vectors sharing a bucket with a query in ANY table — fully
    * deterministic, so unlike s02 (whose xxhash64-derived planes DuckDB
    * cannot compute) the ENTIRE result including recall is hash-exact
    * against the oracle. Not the hot path (s02's native codegen kernel
    * stays the benched implementation); this twin exists so the
    * random-projection ANN ALGEBRA (projection, sign-packing,
    * bucketing, candidate join, rounded-cosine top-k) carries a DuckDB
    * oracle, the d06/d07 pattern applied to ANN. */
  def lshTopKPortable(
      spark: SparkSession, sfDir: String,
      nQueries: Int = 5, k: Int = 10): DataFrame = {
    val all = vecs(spark, sfDir)
    val bucketed = Persists.barrier(all
      .withColumn("sigs", portableSigsCol)
      .select(col("vec_id"), col("v"),
        posexplode(col("sigs")).as(Seq("t", "sig"))))
    val q = bucketed.filter(col("vec_id") < nQueries)
    val cand = bucketed.as("c").join(broadcast(q.as("q")),
        col("q.t") === col("c.t") && col("q.sig") === col("c.sig") &&
          col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
        round(cosineExpr, 4).as("cosine"))
      .distinct()
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    cand.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }

  /** DuckDB twin of [[lshTopKPortable]]: same coefficients (shared
    * string), same left-to-right projection fold, same sign-packing and
    * bucket join, same rounded-cosine ranking. */
  private val lshPortableOracle: String = {
    val sigCase = (p: Int, t: Int) =>
      s"""(CASE WHEN list_sum(list_transform(range(0, 64),
            j -> v[j + 1] * ${coefSql(t, p)})) >= 0 THEN ${1 << p} ELSE 0 END)"""
    val perTable = (0 until portTables).map { t =>
      val sig = (0 until portPlanes).map(p => sigCase(p, t)).mkString(" + ")
      s"SELECT vec_id, $t AS t, $sig AS sig FROM v"
    }.mkString("\n UNION ALL ")
    s"""WITH v AS (
         SELECT vec_id,
                list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         FROM embeddings),
       sigs AS ($perTable),
       cand AS (
         SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
         FROM sigs q JOIN sigs c
           ON q.t = c.t AND q.sig = c.sig
          AND q.vec_id < 5 AND q.vec_id <> c.vec_id),
       scored AS (
         SELECT cand.query_id, cand.neighbor_id,
                round(list_dot_product(a.v, b.v) /
                      sqrt(list_sum(list_transform(a.v, x -> x * x)) *
                           list_sum(list_transform(b.v, x -> x * x))),
                      4) AS cosine
         FROM cand
         JOIN v a ON a.vec_id = cand.query_id
         JOIN v b ON b.vec_id = cand.neighbor_id),
       ranked AS (
         SELECT query_id,
                CAST(row_number() OVER (PARTITION BY query_id
                       ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rank,
                neighbor_id, cosine
         FROM scored)
     SELECT query_id, rank, neighbor_id, cosine FROM ranked WHERE rank <= 10"""
  }

  /** IVF (inverted-file) ANN: partition vectors into Voronoi cells of a
    * deterministic centroid sample (every `centroidMod`-th vector — a
    * fitted k-means would slot in identically), assign each vector to
    * its nearest centroid, and answer queries by probing only the
    * `nprobe` nearest cells.
    *
    * Scale shape: the centroid set IS the model — tiny by construction
    * (a real IVF index fixes C ≈ √n or 2^16 regardless of corpus size;
    * here the sampling knob stands in for k-means) — so it is collected
    * once at plan time and rides to every task inside the
    * `graft_nearest_cents` expression as an array literal. Cell
    * assignment of the whole corpus is then ONE narrow codegen'd map:
    * no shuffle, no window, no exchange between scoring and assignment
    * (round-1 ranked the corpus×centroids cross product through a
    * window argmax — C× the corpus through a shuffle). The candidate
    * join still shuffles only probed cell ids; probed cells bound the
    * search to ~nprobe/C of the data. */
  /** Nearest-centroid column over model `centVecs`: plan literal for a
    * tiny model, broadcast variable past `broadcastAboveC` centroids — a
    * real IVF's C ≈ 2^16 × 64-dim model is ~33 MB, far too big to embed
    * in the plan/codegen as a constant; the broadcast ships once per
    * executor and the expression carries only the handle. */
  def nearestCents(
      spark: SparkSession, v: Column, centVecs: Seq[Seq[Double]], n: Int,
      broadcastAboveC: Int = 64): Column =
    if (centVecs.size <= broadcastAboveC)
      call_function("graft_nearest_cents", v, typedlit(centVecs), lit(n))
    else {
      val bc = spark.sparkContext.broadcast(centVecs.map(_.toArray).toArray)
      org.apache.spark.sql.GraftColumnBridge.column(
        graft.functions.NearestCentroidsBroadcast(
          org.apache.spark.sql.GraftColumnBridge.expression(v), bc, n))
    }

  /** Hard ceiling on the centroid-model size. Real IVF indexes fix
    * C ≈ √n up to ~2^16 regardless of corpus size; 4096 ≈ √(16.7M) keeps
    * the plan-time model fetch ≤ ~2 MB (4096 × 64 doubles) — a bounded
    * driver collect at ANY corpus size, where the round-3 fixed sampling
    * mod made C = n/23 grow linearly (≈4% of the corpus to the driver —
    * a scale-killer at 100×). */
  val DefaultMaxCentroids: Int = 4096

  /** The gated multi-probe setting (s08). Probing the 4 nearest cells
    * roughly doubles s04's candidate set; the measured recall/latency
    * sweep across nprobe = 1..8 is in SCALE_r6.md (tools/IvfProbeSweep). */
  val MultiProbe: Int = 4

  /** Sampling mod that bounds the centroid count: the fixed `baseMod`
    * while C = n/baseMod stays under `maxCentroids` (so the sf0.001/0.01/
    * 0.1 oracles — which hard-code `vec_id % 23` — are byte-identical),
    * else the smallest mod keeping C ≤ maxCentroids. */
  def centroidModFor(
      rows: Long, baseMod: Int = 23,
      maxCentroids: Int = DefaultMaxCentroids): Int =
    if (rows <= baseMod.toLong * maxCentroids) baseMod
    else math.ceil(rows.toDouble / maxCentroids).toInt

  /** Plan-time centroid model over any (vec_id, v) frame: every
    * effective-mod'th vector, sorted by cent_id so kernel index order is
    * deterministic. The collect is bounded at `maxCentroids` rows by
    * [[centroidModFor]] (spec: SimilarityOpsSpec proves the bound on a
    * synthetic 10⁶-row corpus). */
  def centroidModel(
      all: DataFrame, rows: Long, baseMod: Int,
      maxCentroids: Int = DefaultMaxCentroids): (Seq[Long], Seq[Seq[Double]]) = {
    val mod = centroidModFor(rows, baseMod, maxCentroids)
    val centRows = all.filter(pmod(col("vec_id"), lit(mod)) === 0)
      .select(col("vec_id").as("cent_id"), col("v"))
      .orderBy("cent_id").collect()
    (centRows.map(_.getLong(0)).toSeq,
      centRows.map(_.getSeq[Double](1).toSeq).toSeq)
  }

  def ivfTopK(
      spark: SparkSession, sfDir: String,
      nQueries: Int = 5, k: Int = 10,
      centroidMod: Int = 23, nprobe: Int = 2): DataFrame =
    ivfTopKOn(spark, vecs(spark, sfDir),
      Tables.rowCount(spark, sfDir, "embeddings"),
      nQueries, k, centroidMod, nprobe)

  /** [[ivfTopK]] over any (vec_id, v) frame with a known row count —
    * fixture-injectable (ScaleProbe, the probe-sweep tool). `nprobe`
    * is the recall/latency dial: probing the p nearest cells multiplies
    * candidate work by ~p/C of the corpus and monotonically raises
    * recall toward brute force (measured sweep: SCALE_r6.md). */
  def ivfTopKOn(
      spark: SparkSession, all: DataFrame, rows: Long,
      nQueries: Int = 5, k: Int = 10,
      centroidMod: Int = 23, nprobe: Int = 2): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    // plan-time model fetch: C = n/mod vectors (217 at sf0.1), capped at
    // DefaultMaxCentroids past n = 23·4096 ≈ 94k rows
    val (centIds, centVecs) = centroidModel(all, rows, centroidMod)
    ivfSearch(spark, all, centIds, centVecs, nQueries, k, nprobe)
  }

  /** s34: GRAPH-BASED ANN — beam search over the mutual-kNN graph,
    * the navigable-small-world serving pattern behind HNSW/NSG (the
    * modern in-memory ANN default), re-expressed as supersteps: all
    * queries start at ONE deterministic entry vertex (the min node
    * id), and each step expands the beam's out-neighbors, scores
    * them against the query (4-dp cosine), and keeps the top-`beam`
    * — greedy navigation climbs the similarity surface toward the
    * query's neighborhood. Fixed `steps` (the dial: more steps =
    * deeper navigation; HNSW's layer hierarchy is the production
    * accelerant of exactly this walk) keeps the operator
    * deterministic end-to-end, so unlike s02's LSH it HASH-checks
    * against an unrolled oracle. The beam can only improve
    * monotonically (the incumbent set is always a candidate), pinned
    * in GraphBeamSpec; on a disconnected kNN graph the walk is
    * confined to the entry's component — the documented limit of
    * single-entry NSW, which production builds address with multiple
    * entries.
    *
    * Scale shape: per step one frontier⋈edges join (frontier is
    * queries×beam rows — TINY) plus a broadcast-queries score; the
    * corpus is touched only through the stored kNN edges and the
    * candidate-id vector fetch, never scanned whole. */
  def graphBeamAnn(
      spark: SparkSession, sfDir: String,
      nQueries: Int = 5, beam: Int = 8, steps: Int = 6,
      k: Int = 5): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val all = Persists.barrier(vecs(spark, sfDir))
    val e = beamEdges(all)
    beamWalk(all, e, e.agg(min(col("src")).as("node")),
      nQueries, beam, steps, k)
  }

  /** s36: MULTI-ENTRY GRAPH-BEAM ANN — s34 with the documented
    * single-entry fix: the walk starts from s34's entry vertex (the
    * min graph node) AUGMENTED with `entries` deterministic
    * farthest-first seeds (s30's maxmin traversal — provably spread,
    * so a disconnected kNN graph's components each get a chance of
    * holding an entry), which is how production NSW/HNSW builds lift
    * the component-confinement ceiling. The seed set is a SUPERSET of
    * the single-entry start, and everything downstream is s34
    * verbatim (same beam, steps, scoring grid), so the entry still
    * HASH-checks: the oracle prefixes s34's unrolled walk with s30's
    * unrolled maxmin rounds. GraphBeamSpec pins multi-entry recall
    * ≥ single-entry recall against the brute truth — the measured
    * payoff the single-entry doc promised.
    *
    * Scale shape: s34's exactly — the only addition is the s30 seed
    * computation, O(entries·n) distance work with no corpus
    * shuffle, and a frontier that starts entries-wide then is
    * beam-trimmed on the first step. */
  def graphBeamAnnMulti(
      spark: SparkSession, sfDir: String,
      nQueries: Int = 5, beam: Int = 8, steps: Int = 6,
      k: Int = 5, entries: Int = 4): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val all = Persists.barrier(vecs(spark, sfDir))
    val e = beamEdges(all)
    // AUGMENT s34's entry (the min graph node), don't replace it:
    // the seed set is a superset of the single-entry start, so the
    // walk keeps every region the single entry reaches and adds the
    // maxmin-spread ones
    val ent = e.agg(min(col("src")).as("node"))
      .unionAll(farthestFirstOn(spark, all, entries)
        .select(col("vec_id").as("node")))
      .distinct()
    beamWalk(all, e, ent, nQueries, beam, steps, k)
  }

  /** BARRIER-BATCHED multi-entry beam walk (the r15 experiment,
    * VERDICT r14 item 6): the graph-beam family's cost at sf0.1 is
    * pure per-superstep JOB LATENCY — barriered joins on tiny frames
    * — so halving the superstep count should roughly halve wall
    * time. One batched round expands TWO hops at once against a
    * precomputed 1∪2-hop edge frame (e ∪ e⋈e), then scores and
    * beam-trims exactly like two classic steps compressed. The
    * classic round's candidates after 2 steps (beam(f∪N(f)) ∪
    * N(beam(...))) are a SUBSET of the batched round's
    * (f∪N(f)∪N²(f)), so each batched round keeps the top-beam of a
    * superset — same navigation depth in half the barriers, at the
    * price of a deg×-bigger edge frame and ~deg× more cosine work per
    * round (both data-parallel, neither a barrier). BeamBatchProbe
    * measures recall vs brute truth and min-of-3 wall time against
    * the classic walk; the s34/s36/s37 gate entries keep the classic
    * form (their hashes/contracts are pinned to it). */
  def graphBeamAnnMultiBatched(
      spark: SparkSession, sfDir: String,
      nQueries: Int = 5, beam: Int = 8, steps: Int = 6,
      k: Int = 5, entries: Int = 4): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val all = Persists.barrier(vecs(spark, sfDir))
    val e = beamEdges(all)
    // 1∪2-hop reach, built ONCE (a barrier paid per index build, not
    // per round); self-loops dropped — a node re-enters a candidate
    // set via the frontier union anyway
    val eh = Persists.barrier(
      e.unionAll(
        e.select(col("src"), col("dst").as("mid"))
          .join(e.select(col("src").as("mid"), col("dst")), "mid")
          .select("src", "dst"))
        .filter(col("src") =!= col("dst")).distinct())
    val ent = e.agg(min(col("src")).as("node"))
      .unionAll(farthestFirstOn(spark, all, entries)
        .select(col("vec_id").as("node")))
      .distinct()
    beamWalk(all, eh, ent, nQueries, beam, (steps + 1) / 2, k)
  }

  /** The stored 1∪2-hop beam-edge artifact — the INDEX-LAYOUT answer
    * to the r15 batching experiment (EXPERIMENT_r15 §6, VERDICT r15
    * next #1): batched 2-hop rounds DOMINATED on recall (0.2 → 0.6 on
    * the sf0.1 plateau query) but lost inline wall time because the
    * e ∪ e⋈e frame was rebuilt inside every timed run. Here it is
    * built ONCE at ingest — derived from the stored full-corpus
    * mutual-kNN artifact ([[GraphOps.knnEdgesAllPath]]), so the
    * all-pairs kNN pass is shared, the self-join is the only added
    * build cost — and fingerprint-keyed like [[beamBaseEdgesPath]]
    * so a regenerated corpus rebuilds it. Serving then pays HALF the
    * per-superstep barriers of the classic walk (the family's
    * dominant cost at sf0.1: tiny frames, pure job latency).
    *
    * Scale shape: the artifact is O(|e| · avg-degree) rows — index-
    * sized, not corpus-sized (degree is capped by the kNN k), and the
    * one e⋈e shuffle is paid per INGEST, amortized across every
    * query until the corpus fingerprint rotates. */
  def beamHop2EdgesPath(spark: SparkSession, sfDir: String): String = {
    val n = Tables.rowCount(spark, sfDir, "embeddings")
    val fp = java.lang.Long.toHexString(Tables.fingerprint(
      spark, sfDir, "embeddings", Seq("vec_id", "embedding")))
    val dir = graft.sources.FsUtil.qualified("target/tmp/graph/beamhop2_" +
      graft.sources.FsUtil.sanitize(sfDir) + s"_n${n}_$fp")
    if (!graft.sources.FsUtil.exists(spark, dir + "/_SUCCESS")) {
      val e = Persists.barrier(symmetrized(
        spark.read.parquet(GraphOps.knnEdgesAllPath(spark, sfDir))
          .select("a", "b")))
      e.unionAll(
          e.select(col("src"), col("dst").as("mid"))
            .join(e.select(col("src").as("mid"), col("dst")), "mid")
            .select("src", "dst"))
        .filter(col("src") =!= col("dst")).distinct()
        .write.mode("overwrite").parquet(dir)
    }
    dir
  }

  /** s38: the batched 2-hop walk SERVED from the stored
    * [[beamHop2EdgesPath]] artifact — the production twin of
    * [[graphBeamAnnMultiBatched]] (identical navigation: same entry
    * policy, same beam/round dials, same scoring grid, so the two
    * return the SAME frame — GraphBeamSpec pins served ≡ inline) at
    * half the classic walk's barriers and NONE of the inline run's
    * index-build cost. Rows-only by design at the gate, carrying the
    * family's recall contract: aggregate recall@5 vs brute truth
    * holds within one hit of the classic walk (and at sf0.1 the
    * 2-hop frame BRIDGES reciprocity-pruned gaps the classic walk
    * parks on — measured 0.2 → 0.6 on query 3, EXPERIMENT_r15 §6). */
  def graphBeamAnnBatchedServed(
      spark: SparkSession, sfDir: String,
      nQueries: Int = 5, beam: Int = 8, steps: Int = 6,
      k: Int = 5, entries: Int = 4): DataFrame =
    batchedServedWalk(spark, sfDir, nQueries, beam, steps, k, entries,
      exclude = None)

  /** s44: s38's stored-artifact batched serve UNDER the s39 tombstone
    * manifest — the production combination (a deployment that stores
    * the 2-hop frame still has takedowns to honor): deleted nodes
    * route through the stored frame, never surface. Rows-only with
    * the compose contract pinned in AnnTombstoneSpec: results ≡ s38's
    * surviving rows re-ranked, and never a tombstoned id. */
  def graphBeamAnnBatchedTombstoned(
      spark: SparkSession, sfDir: String,
      nQueries: Int = 5, beam: Int = 8, steps: Int = 6,
      k: Int = 5, entries: Int = 4): DataFrame =
    batchedServedWalk(spark, sfDir, nQueries, beam, steps, k, entries,
      exclude = Some(tombstoneNodes(spark, sfDir)))

  private def batchedServedWalk(
      spark: SparkSession, sfDir: String,
      nQueries: Int, beam: Int, steps: Int,
      k: Int, entries: Int, exclude: Option[DataFrame]): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val all = Persists.barrier(vecs(spark, sfDir))
    val eh = Persists.barrier(
      spark.read.parquet(beamHop2EdgesPath(spark, sfDir))
        .select("src", "dst"))
    // same entry policy as the inline batched walk: eh ⊇ e shares e's
    // min src (a 1-hop edge exists for every source node), so min
    // over the stored frame IS s36's entry vertex
    val ent = eh.agg(min(col("src")).as("node"))
      .unionAll(farthestFirstOn(spark, all, entries)
        .select(col("vec_id").as("node")))
      .distinct()
    beamWalk(all, eh, ent, nQueries, beam, (steps + 1) / 2, k, exclude)
  }

  /** DELTA MAINTENANCE for a stored 1∪2-hop frame: given
    * H = 2hop(e) = e ∪ e⋈e and a batch of new symmetrized edges Δ,
    * the updated frame is exactly
    * 2hop(e ∪ Δ) = H ∪ Δ ∪ e⋈Δ ∪ Δ⋈e ∪ Δ⋈Δ
    * (self-loops dropped, distinct) — |Δ|·degree-sized work against
    * the stored frames, NEVER an e⋈e rebuild. The algebra is an
    * identity, not an approximation, and GraphBeamSpec pins frame
    * equality against the from-scratch 2-hop build. This is the
    * missing ingest-side piece of s38: without it every s37-style
    * insert batch would force the quadratic rebuild the artifact was
    * built to amortize. */
  def hop2DeltaUpdate(
      h: DataFrame, e: DataFrame, delta: DataFrame): DataFrame = {
    def hop(a: DataFrame, b: DataFrame): DataFrame =
      a.select(col("src"), col("dst").as("mid"))
        .join(b.select(col("src").as("mid"), col("dst")), "mid")
        .select("src", "dst")
    h.unionAll(delta)
      .unionAll(hop(delta, e)).unionAll(hop(e, delta))
      .unionAll(hop(delta, delta))
      .filter(col("src") =!= col("dst")).distinct()
  }

  /** DEGREE-CAPPED 2-hop maintenance (EXPERIMENT_r16 §2d's named
    * door): [[hop2DeltaUpdate]]'s uncapped fold inflates the
    * maintained frame to 8× its 1-hop substrate (searched-in links
    * compound quadratically through the delta terms), which §2d
    * measured costing the halved-round serve its latency win. This
    * variant treats the 2-hop SHORTCUTS as a budgeted acceleration
    * structure over the EXACT 1-hop graph: the updated frame is
    * (e ∪ Δ) ∪ top-`cap`-per-src shortcuts ranked by cosine(src,dst)
    * — the 1-hop substrate is never dropped (reachability can't
    * degrade below the classic walk's), only shortcuts compete for
    * the budget, the HNSW M-parameter discipline applied to the
    * 2-hop layer. Scoring is one codegen'd cosine pass over the
    * shortcut candidates (capped-frame ∪ delta-additions — index-
    * sized, never corpus²). Capping is deliberately LOSSY across
    * batches (a dropped shortcut is not resurrected; the rebuild
    * re-derives the optimum) — the spec pins the budget and
    * substrate invariants, not cross-batch composition. */
  def cappedHop2DeltaUpdate(
      h: DataFrame, e: DataFrame, delta: DataFrame,
      all: DataFrame, cap: Int = 16): DataFrame = {
    val e1 = e.unionAll(delta).distinct()
    val uncapped = hop2DeltaUpdate(h, e, delta)
    val shortcuts = uncapped
      .join(e1, Seq("src", "dst"), "left_anti")
    val scored = shortcuts
      .join(all.select(col("vec_id").as("src"), col("v").as("vs")), "src")
      .join(all.select(col("vec_id").as("dst"), col("v").as("vd")), "dst")
      .select(col("src"), col("dst"),
        round(expr("graft_cosine(vs, vd)"), 4).as("cosine"))
    val w = Window.partitionBy("src")
      .orderBy(col("cosine").desc, col("dst"))
    val kept = scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= cap)
      .select("src", "dst")
    // one maintenance-side shuffle so the serving frame is hash-laid
    // on src — the walk's per-round join key — instead of the union's
    // doubled partition count (measured: a 64-partition frame costs
    // ~1 s/round in task overhead at sf0.1 against 32-partition peers)
    e1.unionAll(kept).repartition(col("src"))
  }

  /** s50: s45's delta-maintained batched serve over the CAPPED frame
    * — same ingest work plus one index-sized cosine pass, a serving
    * frame back near the static artifact's density. MEASURED
    * positioning (BeamCapProbe, EXPERIMENT_r16 §2e): at sf0.1 the cap
    * is a BYTES/RECALL dial — cap=16 holds recall above the classic
    * serve (4.2 vs 4.0 of 5) with 2.5× fewer maintained edges than
    * the uncapped fold — while serve LATENCY is overhead-bound there
    * and indistinguishable across frames; the density→latency payoff
    * binds only where round joins are data-dominated (the 100 TB
    * regime), and is claimed only as that. Rows-only; CappedHop2Spec
    * pins the budget/substrate invariants. */
  def graphBeamDeltaCappedServed(
      spark: SparkSession, sfDir: String,
      nQueries: Int = 5, beam: Int = 8, steps: Int = 6,
      k: Int = 5, entries: Int = 4, insertDegree: Int = 10,
      cap: Int = 16): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val all = Persists.barrier(vecs(spark, sfDir))
    val eh = Persists.barrier(
      cappedMaintainedFrame(spark, sfDir, beam, steps, entries,
        insertDegree, cap))
    val ent = eh.agg(min(col("src")).as("node"))
      .unionAll(farthestFirstOn(spark, all, entries)
        .select(col("vec_id").as("node")))
      .distinct()
    beamWalk(all, eh, ent, nQueries, beam, (steps + 1) / 2, k)
  }

  /** [[deltaMaintainedHop2Frame]]'s capped twin (probe/spec access). */
  private[graft] def cappedMaintainedFrame(
      spark: SparkSession, sfDir: String,
      beam: Int = 8, steps: Int = 6, entries: Int = 4,
      insertDegree: Int = 10, cap: Int = 16): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val all = Persists.barrier(vecs(spark, sfDir))
    val base = Persists.barrier(all.filter(
      pmod(col("vec_id"), lit(DeltaIngestMod)) =!= DeltaIngestRem))
    val storedE = Persists.barrier(
      spark.read.parquet(beamBaseEdgesPath(spark, sfDir))
        .select("src", "dst"))
    val storedH = Persists.barrier(
      spark.read.parquet(beamBaseHop2Path(spark, sfDir))
        .select("src", "dst"))
    val delta = Persists.barrier(
      deltaInsertEdges(spark, all, base, storedE, beam, steps,
        entries, insertDegree))
    cappedHop2DeltaUpdate(storedH, storedE, delta, all, cap)
  }

  /** The stored BASE-corpus 1∪2-hop artifact (s45's serving
    * substrate — [[beamBaseEdgesPath]]'s 2-hop twin, derived from it
    * so the mutual-kNN pass is shared; same fingerprint key). */
  def beamBaseHop2Path(spark: SparkSession, sfDir: String): String = {
    val n = Tables.rowCount(spark, sfDir, "embeddings")
    val fp = java.lang.Long.toHexString(Tables.fingerprint(
      spark, sfDir, "embeddings", Seq("vec_id", "embedding")))
    val dir = graft.sources.FsUtil.qualified(
      "target/tmp/graph/beambasehop2_" +
        graft.sources.FsUtil.sanitize(sfDir) + s"_n${n}_$fp")
    if (!graft.sources.FsUtil.exists(spark, dir + "/_SUCCESS")) {
      val e = Persists.barrier(
        spark.read.parquet(beamBaseEdgesPath(spark, sfDir))
          .select("src", "dst"))
      e.unionAll(
          e.select(col("src"), col("dst").as("mid"))
            .join(e.select(col("src").as("mid"), col("dst")), "mid")
            .select("src", "dst"))
        .filter(col("src") =!= col("dst")).distinct()
        .write.mode("overwrite").parquet(dir)
    }
    dir
  }

  /** s45: the s37 ingest batch SERVED BATCHED — delta-insert the new
    * vectors into the stored base graph (s37's walk-and-link, the
    * stored-artifact s37i form), maintain the 2-hop frame by
    * [[hop2DeltaUpdate]] (delta-sized, no rebuild), and serve the
    * halved-barrier batched walk over it. The full production loop:
    * stored artifacts in, delta work per batch, batched serving out.
    * Rows-only with contracts: the maintained 2-hop frame is
    * IDENTICAL to a from-scratch build over the updated graph
    * (spec-pinned identity), and serving equals the inline batched
    * walk over that updated graph. MEASURED positioning
    * (BeamAmortizeProbe, EXPERIMENT_r16 §2d): delta maintenance
    * inflates the 2-hop frame 8× its 1-hop (vs 4× for the static
    * artifact), so the 3-round walk is a RECALL upgrade (4.0→4.6/5
    * aggregate at sf0.1), not a latency one — the s38 serve win is
    * static-artifact-only, and no serve count amortizes the
    * maintenance at these dials. */
  def graphBeamDeltaBatchedServed(
      spark: SparkSession, sfDir: String,
      nQueries: Int = 5, beam: Int = 8, steps: Int = 6,
      k: Int = 5, entries: Int = 4, insertDegree: Int = 10): DataFrame =
    deltaBatchedWalk(spark, sfDir, nQueries, beam, steps, k, entries,
      insertDegree, exclude = None)

  /** s47: the FULL-LIFECYCLE merge serve — s45's delta-maintained
    * batched serve under the s39 tombstone manifest. Every mutation
    * discipline the family ships, composed in one serving path:
    * stored base artifacts in ([[beamBaseEdgesPath]] +
    * [[beamBaseHop2Path]]), delta-sized insert + 2-hop maintenance
    * per batch ([[deltaInsertEdges]] + [[hop2DeltaUpdate]]), and
    * takedowns honored merge-on-read at the result stage. The
    * insert/takedown INTERACTION is real and pinned
    * (AnnLifecycleSpec): vec_ids ≡ [[DeltaIngestRem]] mod
    * [[DeltaIngestMod]] AND ≡ 0 mod [[TombstoneMod]] (164, 451, … by
    * CRT) are inserted THIS batch and already taken down — their
    * searched-in edges become live routing infrastructure
    * (EXPERIMENT_r16 §2c measured why that matters below the
    * compaction crossover) but the ids never surface. */
  def graphBeamLifecycleServed(
      spark: SparkSession, sfDir: String,
      nQueries: Int = 5, beam: Int = 8, steps: Int = 6,
      k: Int = 5, entries: Int = 4, insertDegree: Int = 10): DataFrame =
    deltaBatchedWalk(spark, sfDir, nQueries, beam, steps, k, entries,
      insertDegree, exclude = Some(tombstoneNodes(spark, sfDir)))

  /** The delta-MAINTAINED 1∪2-hop frame s45/s47 serve over:
    * 2hop(base ∪ Δ) via [[hop2DeltaUpdate]] against the stored
    * artifacts. Package-visible so AnnLifecycleSpec can assert the
    * routing half of the insert∩takedown contract (an inserted-then-
    * taken-down vertex must still carry out-edges here). */
  private[graft] def deltaMaintainedHop2Frame(
      spark: SparkSession, sfDir: String,
      beam: Int = 8, steps: Int = 6, entries: Int = 4,
      insertDegree: Int = 10): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val all = Persists.barrier(vecs(spark, sfDir))
    val base = Persists.barrier(all.filter(
      pmod(col("vec_id"), lit(DeltaIngestMod)) =!= DeltaIngestRem))
    val storedE = Persists.barrier(
      spark.read.parquet(beamBaseEdgesPath(spark, sfDir))
        .select("src", "dst"))
    val storedH = Persists.barrier(
      spark.read.parquet(beamBaseHop2Path(spark, sfDir))
        .select("src", "dst"))
    val delta = Persists.barrier(
      deltaInsertEdges(spark, all, base, storedE, beam, steps,
        entries, insertDegree))
    Persists.barrier(hop2DeltaUpdate(storedH, storedE, delta))
  }

  /** Probe access (BeamAmortizeProbe): the per-batch delta edge frame
    * BOTH serving disciplines pay for — walk-and-link inserts +
    * delta-internal mutual-kNN — so the probe can time the
    * maintenance and serve phases separately. */
  private[graft] def probeDeltaEdges(
      spark: SparkSession, sfDir: String,
      beam: Int = 8, steps: Int = 6, entries: Int = 4,
      insertDegree: Int = 10): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val all = Persists.barrier(vecs(spark, sfDir))
    val base = Persists.barrier(all.filter(
      pmod(col("vec_id"), lit(DeltaIngestMod)) =!= DeltaIngestRem))
    val storedE = Persists.barrier(
      spark.read.parquet(beamBaseEdgesPath(spark, sfDir))
        .select("src", "dst"))
    deltaInsertEdges(spark, all, base, storedE, beam, steps,
      entries, insertDegree)
  }

  /** Probe access (BeamAmortizeProbe): one SERVE over a caller-cached
    * edge frame — the per-query phase isolated from the per-batch
    * maintenance the public s37i/s45 entries bundle in. `rounds` is
    * the superstep count (classic 1-hop = steps, batched 1∪2-hop =
    * (steps+1)/2 — the caller picks to match the frame it passes). */
  private[graft] def serveWalkOver(
      spark: SparkSession, sfDir: String, frame: DataFrame,
      rounds: Int, nQueries: Int = 5, beam: Int = 8, k: Int = 5,
      entries: Int = 4, exclude: Option[DataFrame] = None): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val all = Persists.barrier(vecs(spark, sfDir))
    val ent = frame.agg(min(col("src")).as("node"))
      .unionAll(farthestFirstOn(spark, all, entries)
        .select(col("vec_id").as("node")))
      .distinct()
    beamWalk(all, frame, ent, nQueries, beam, rounds, k, exclude)
  }

  /** The stored delta-MAINTAINED 1∪2-hop artifact: the s45 fold
    * (base artifacts + one ingest batch's insert edges, 2-hop
    * maintained by [[hop2DeltaUpdate]]) materialized ONCE at ingest —
    * what the serving tier actually reads between batches, the
    * d12i/s35i/s37i stored-artifact discipline applied to the
    * maintained frame. Fingerprint-keyed like every index artifact. */
  def beamMaintainedHop2Path(spark: SparkSession, sfDir: String): String = {
    val n = Tables.rowCount(spark, sfDir, "embeddings")
    val fp = java.lang.Long.toHexString(Tables.fingerprint(
      spark, sfDir, "embeddings", Seq("vec_id", "embedding")))
    val dir = graft.sources.FsUtil.qualified(
      "target/tmp/graph/beammainthop2_" +
        graft.sources.FsUtil.sanitize(sfDir) + s"_n${n}_$fp")
    if (!graft.sources.FsUtil.exists(spark, dir + "/_SUCCESS"))
      deltaMaintainedHop2Frame(spark, sfDir)
        .write.mode("overwrite").parquet(dir)
    dir
  }

  /** s53: the SERVE-ONLY twin of s45 — the batched walk over the
    * stored maintained artifact, paying none of the per-run ingest
    * work the inline entry bundles (s45's QueryTimer steady is
    * ~12 s of which ~8 s is the insert walk — BASELINE.md round-16
    * note). Identical output to [[graphBeamDeltaBatchedServed]]
    * (same frame, same entry policy, same dials — spec-pinned). */
  def graphBeamDeltaMaintainedServed(
      spark: SparkSession, sfDir: String,
      nQueries: Int = 5, beam: Int = 8, steps: Int = 6,
      k: Int = 5, entries: Int = 4): DataFrame = {
    val h = Persists.barrier(
      spark.read.parquet(beamMaintainedHop2Path(spark, sfDir))
        .select("src", "dst"))
    serveWalkOver(spark, sfDir, h, (steps + 1) / 2, nQueries, beam, k,
      entries)
  }

  /** s47's SERVE-ONLY twin (benched s47i — VERDICT r16 item 3, the
    * s53 ingest/serve split applied to the lifecycle serve): the
    * batched walk over the STORED maintained artifact under the
    * tombstone manifest — pays none of the per-run insert walk the
    * inline s47 bundles. Identical output to
    * [[graphBeamLifecycleServed]] (ServeTwinsSpec pins it). */
  def graphBeamLifecycleMaintServed(
      spark: SparkSession, sfDir: String,
      nQueries: Int = 5, beam: Int = 8, steps: Int = 6,
      k: Int = 5, entries: Int = 4): DataFrame = {
    val h = Persists.barrier(
      spark.read.parquet(beamMaintainedHop2Path(spark, sfDir))
        .select("src", "dst"))
    serveWalkOver(spark, sfDir, h, (steps + 1) / 2, nQueries, beam, k,
      entries, exclude = Some(tombstoneNodes(spark, sfDir)))
  }

  /** s48's SERVE-ONLY twin (benched s48i): the same maintenance
    * dispatch, with EVERY branch serving stored artifacts — the
    * decision row stays the timed trigger read, the s47 branch serves
    * [[beamMaintainedHop2Path]] instead of re-running the insert walk.
    * Identical output to [[graphBeamAnnLifecycleAuto]]. */
  def graphBeamLifecycleAutoServed(
      spark: SparkSession, sfDir: String,
      nQueries: Int = 5, beam: Int = 8, steps: Int = 6,
      k: Int = 5, entries: Int = 4,
      rebuildThreshold: Double = 0.2,
      compactThreshold: Double = 0.1): DataFrame = {
    val decide = annMaintenanceNeeded(spark, sfDir,
      rebuildThreshold, compactThreshold).head()
    decide.getAs[String]("action") match {
      case "serve" => graphBeamLifecycleMaintServed(spark, sfDir,
        nQueries, beam, steps, k, entries)
      case _ => graphBeamAnnCompactedServed(spark, sfDir,
        nQueries, beam, steps, k, entries)
    }
  }

  /** The stored CAPPED maintained 1∪2-hop artifact — s50's serve
    * frame, materialized once at ingest (the
    * [[beamMaintainedHop2Path]] discipline with the degree cap in the
    * key). */
  def beamCappedHop2Path(spark: SparkSession, sfDir: String,
      cap: Int = 16): String = {
    val n = Tables.rowCount(spark, sfDir, "embeddings")
    val fp = java.lang.Long.toHexString(Tables.fingerprint(
      spark, sfDir, "embeddings", Seq("vec_id", "embedding")))
    val dir = graft.sources.FsUtil.qualified(
      "target/tmp/graph/beamcaphop2_" +
        graft.sources.FsUtil.sanitize(sfDir) + s"_n${n}_c${cap}_$fp")
    if (!graft.sources.FsUtil.exists(spark, dir + "/_SUCCESS"))
      cappedMaintainedFrame(spark, sfDir, cap = cap)
        .write.mode("overwrite").parquet(dir)
    dir
  }

  /** s50's SERVE-ONLY twin (benched s50i): the batched walk over the
    * stored capped artifact. Identical output to
    * [[graphBeamDeltaCappedServed]] — same frame (spec-pinned), same
    * entry policy, same dials. */
  def graphBeamCappedServed(
      spark: SparkSession, sfDir: String,
      nQueries: Int = 5, beam: Int = 8, steps: Int = 6,
      k: Int = 5, entries: Int = 4, cap: Int = 16): DataFrame = {
    val h = Persists.barrier(
      spark.read.parquet(beamCappedHop2Path(spark, sfDir, cap))
        .select("src", "dst"))
    serveWalkOver(spark, sfDir, h, (steps + 1) / 2, nQueries, beam, k,
      entries)
  }

  private def deltaBatchedWalk(
      spark: SparkSession, sfDir: String,
      nQueries: Int, beam: Int, steps: Int,
      k: Int, entries: Int, insertDegree: Int,
      exclude: Option[DataFrame]): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val all = Persists.barrier(vecs(spark, sfDir))
    val eh = deltaMaintainedHop2Frame(spark, sfDir, beam, steps,
      entries, insertDegree)
    val ent = eh.agg(min(col("src")).as("node"))
      .unionAll(farthestFirstOn(spark, all, entries)
        .select(col("vec_id").as("node")))
      .distinct()
    beamWalk(all, eh, ent, nQueries, beam, (steps + 1) / 2, k, exclude)
  }

  /** The CLASSIC walk served from the stored 1-hop artifact — s38's
    * like-for-like comparator (both exclude index build; the delta is
    * purely supersteps: 6 barriers over e vs 3 over e∪e²). Identical
    * output to [[graphBeamAnnMulti]]; BeamServeProbe measures the
    * min-of-3 serving gap at sf0.1. */
  def graphBeamAnnMultiServed(
      spark: SparkSession, sfDir: String,
      nQueries: Int = 5, beam: Int = 8, steps: Int = 6,
      k: Int = 5, entries: Int = 4): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val all = Persists.barrier(vecs(spark, sfDir))
    val e = Persists.barrier(symmetrized(
      spark.read.parquet(GraphOps.knnEdgesAllPath(spark, sfDir))
        .select("a", "b")))
    val ent = e.agg(min(col("src")).as("node"))
      .unionAll(farthestFirstOn(spark, all, entries)
        .select(col("vec_id").as("node")))
      .distinct()
    beamWalk(all, e, ent, nQueries, beam, steps, k)
  }

  /** (a, b) undirected mutual-kNN rows → the (src, dst) symmetrized
    * frame the beam walk navigates. */
  private def symmetrized(undirected: DataFrame): DataFrame =
    undirected.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(undirected.select(col("b").as("src"), col("a").as("dst")))

  /** The ANN takedown predicate (`vec_id % TombstoneMod = 0`) shared
    * by the tombstone gate entries and their DuckDB oracles — the
    * embeddings-side analog of [[graft.sources.Deletes.TakedownMod]]. */
  val TombstoneMod = 41

  /** The stored ANN TOMBSTONE manifest: vec_ids removed by takedown
    * but still PRESENT in the serving artifacts (beam graph, IVF
    * assignment) — VERDICT r15 missing #2: table-level takedown is
    * O(|list|) ([[graft.sources.Deletes]]) and index INSERT
    * maintenance is delta-sized (s35/s37), but a takedown'd vector
    * was served until the fingerprint-triggered FULL rebuild. The
    * manifest is the delta-sized DELETE analog: takedown-sized,
    * consulted at serve as one broadcast anti-join, compacted away
    * when [[annCompactionNeeded]] trips. Fingerprint-keyed like every
    * index artifact so a regenerated corpus re-derives it. */
  def annTombstonesPath(spark: SparkSession, sfDir: String,
      mod: Int = TombstoneMod): String = {
    val n = Tables.rowCount(spark, sfDir, "embeddings")
    val fp = java.lang.Long.toHexString(Tables.fingerprint(
      spark, sfDir, "embeddings", Seq("vec_id", "embedding")))
    val dir = graft.sources.FsUtil.qualified("target/tmp/graph/anntomb_" +
      graft.sources.FsUtil.sanitize(sfDir) + s"_n${n}_m${mod}_$fp")
    if (!graft.sources.FsUtil.exists(spark, dir + "/_SUCCESS"))
      vecs(spark, sfDir)
        .filter(pmod(col("vec_id"), lit(mod)) === 0)
        .select("vec_id").coalesce(1)
        .write.mode("overwrite").parquet(dir)
    dir
  }

  private[graft] def tombstoneNodes(spark: SparkSession, sfDir: String,
      mod: Int = TombstoneMod): DataFrame =
    spark.read.parquet(annTombstonesPath(spark, sfDir, mod))
      .select(col("vec_id").as("node"))

  /** s39: MERGE-ON-READ tombstoned beam serve — s36's classic walk
    * over the stored full-corpus edges with the tombstone manifest
    * anti-joined out of the RESULTS only: deleted vectors keep
    * routing (their edges are live navigation infrastructure — the
    * HNSW deleted-node discipline) but never surface; per-query work
    * added is one takedown-sized broadcast anti-join. Hash-green: the
    * oracle is s36's unrolled walk with the same exclusion applied
    * between the final DISTINCT and the rank. */
  def graphBeamAnnTombstonedServed(
      spark: SparkSession, sfDir: String,
      nQueries: Int = 5, beam: Int = 8, steps: Int = 6,
      k: Int = 5, entries: Int = 4,
      mod: Int = TombstoneMod): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val all = Persists.barrier(vecs(spark, sfDir))
    val e = Persists.barrier(symmetrized(
      spark.read.parquet(GraphOps.knnEdgesAllPath(spark, sfDir))
        .select("a", "b")))
    val ent = e.agg(min(col("src")).as("node"))
      .unionAll(farthestFirstOn(spark, all, entries)
        .select(col("vec_id").as("node")))
      .distinct()
    beamWalk(all, e, ent, nQueries, beam, steps, k,
      exclude = Some(tombstoneNodes(spark, sfDir, mod)))
  }

  /** The COMPACTED beam-edge artifact: the mutual-kNN graph rebuilt
    * over takedown SURVIVORS only — what lands when the tombstone
    * fraction trips [[annCompactionNeeded]] (the equality-delete
    * chain's copy-on-write commit, applied to the index). Keyed by
    * corpus fingerprint + tombstone predicate so it coexists with
    * the uncompacted artifact and re-derives on regeneration. */
  def beamCompactedEdgesPath(spark: SparkSession, sfDir: String,
      mod: Int = TombstoneMod): String = {
    val n = Tables.rowCount(spark, sfDir, "embeddings")
    val fp = java.lang.Long.toHexString(Tables.fingerprint(
      spark, sfDir, "embeddings", Seq("vec_id", "embedding")))
    val dir = graft.sources.FsUtil.qualified("target/tmp/graph/beamcomp_" +
      graft.sources.FsUtil.sanitize(sfDir) + s"_n${n}_m${mod}_$fp")
    if (!graft.sources.FsUtil.exists(spark, dir + "/_SUCCESS"))
      beamEdges(vecs(spark, sfDir)
          .filter(pmod(col("vec_id"), lit(mod)) =!= 0))
        .write.mode("overwrite").parquet(dir)
    dir
  }

  /** s40: POST-COMPACTION beam serve — the walk over the
    * [[beamCompactedEdgesPath]] rebuild: no merge work left at serve
    * (the q150 copy-on-write read, applied to the index), tombstoned
    * vectors exist NOWHERE in the artifact — not as results, not as
    * routes. Queries stay the external full-corpus set (a deleted
    * corpus vector can still arrive as a query); entry seeds and
    * candidate fetches come from survivors only. Hash-green: the
    * oracle rebuilds the kNN CTEs over the survivor corpus. */
  def graphBeamAnnCompactedServed(
      spark: SparkSession, sfDir: String,
      nQueries: Int = 5, beam: Int = 8, steps: Int = 6,
      k: Int = 5, entries: Int = 4,
      mod: Int = TombstoneMod): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val all = Persists.barrier(vecs(spark, sfDir))
    val surv = Persists.barrier(all.filter(
      pmod(col("vec_id"), lit(mod)) =!= 0))
    val e = Persists.barrier(
      spark.read.parquet(beamCompactedEdgesPath(spark, sfDir, mod))
        .select("src", "dst"))
    val ent = e.agg(min(col("src")).as("node"))
      .unionAll(farthestFirstOn(spark, surv, entries)
        .select(col("vec_id").as("node")))
      .distinct()
    val q = Persists.barrier(all.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv")))
    beamWalkOn(surv, e, ent, q, beam, steps, k)
  }

  /** s41: tombstoned IVF serve — s04's search over the FROZEN
    * centroid model (takedown never retrains; that is
    * [[ivfRetrainNeeded]]'s job) with tombstoned vectors dropped
    * from the candidate set before ranking. For IVF the drop point
    * is equivalence-free (candidates have no routing role), so
    * filter-before-score is both the cheap and the correct place. */
  def ivfTopKTombstoned(
      spark: SparkSession, sfDir: String,
      nQueries: Int = 5, k: Int = 10,
      centroidMod: Int = 23, nprobe: Int = 2): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val all = Persists.barrier(vecs(spark, sfDir))
    val (centIds, centVecs) = centroidModel(all,
      Tables.rowCount(spark, sfDir, "embeddings"), centroidMod)
    ivfSearch(spark, all, centIds, centVecs, nQueries, k, nprobe,
      corpusFilter = pmod(col("vec_id"), lit(TombstoneMod)) =!= 0)
  }

  /** s43: the serving-layer DISPATCH that closes the takedown loop —
    * consult [[annCompactionNeeded]] once (one metadata-sized
    * aggregate) and serve merge-on-read (s39) below the threshold or
    * the compacted rebuild (s40) above it. At the gate's 1/41
    * fraction the default 10% threshold routes to merge-on-read, so
    * the entry hash-checks against s39's oracle; AnnTombstoneSpec
    * pins the OTHER branch by lowering the threshold. This is the
    * function a serving deployment actually calls per batch: the
    * decision is data-derived, not a config constant someone forgets
    * to flip. */
  def graphBeamAnnServed(
      spark: SparkSession, sfDir: String,
      nQueries: Int = 5, beam: Int = 8, steps: Int = 6,
      k: Int = 5, entries: Int = 4,
      compactThreshold: Double = 0.1): DataFrame = {
    val decide = annCompactionNeeded(spark, sfDir, compactThreshold).head()
    if (decide.getBoolean(3))
      graphBeamAnnCompactedServed(spark, sfDir, nQueries, beam, steps,
        k, entries)
    else
      graphBeamAnnTombstonedServed(spark, sfDir, nQueries, beam, steps,
        k, entries)
  }

  /** s42: the tombstone→compaction DECISION ([[graphRebuildNeeded]]'s
    * takedown analog, VERDICT r15 next #2): past `threshold`, rebuild
    * over survivors ([[beamCompactedEdgesPath]]) and reset the
    * manifest. One row: (n_vectors, n_tombstoned, tombstone_frac,
    * compact). MEASURED basis for the threshold (TombstoneDecayProbe,
    * EXPERIMENT_r16 §2c): at low fractions merge-on-read recall is
    * AT OR ABOVE the compacted rebuild's (tombstoned nodes are live
    * routing infrastructure; the survivor rebuild's reciprocity
    * pruning loses paths — the s37 effect): at sf0.001 the curves
    * cross only around 20–33% tombstoned, and at sf0.1 (4× corpus)
    * they never cross through 33% — merge-on-read dominates at every
    * tested fraction. So compaction is a COST/STORAGE/COMPLIANCE
    * action (dead route work, index bytes, physical removal), not a
    * recall upgrade, at both measured scales — the conservative 10%
    * default buys hygiene well before recall is at stake. */
  def annCompactionNeeded(
      spark: SparkSession, sfDir: String,
      threshold: Double = 0.1): DataFrame = {
    val tomb = spark.read.parquet(annTombstonesPath(spark, sfDir))
    vecs(spark, sfDir)
      .join(broadcast(tomb.withColumn("t", lit(1))), Seq("vec_id"), "left")
      .agg(count(lit(1)).as("n_vectors"),
        sum(when(col("t").isNotNull, 1L).otherwise(0L)).as("n_tombstoned"))
      .select(col("n_vectors"), col("n_tombstoned"),
        round(col("n_tombstoned") / col("n_vectors"), 4)
          .as("tombstone_frac"),
        (col("n_tombstoned") / col("n_vectors") > threshold).as("compact"))
  }

  /** s46: the UNIFIED index-lifecycle decision — one maintenance
    * planner row combining the family's two measured triggers, the
    * insert-delta share ([[graphRebuildNeeded]]'s signal: searched-in
    * vertices carry non-mutual edges, navigation decays as their
    * share grows) and the tombstone share ([[annCompactionNeeded]]'s
    * signal: dead routing work + index bytes + compliance bytes),
    * with an explicit precedence: a tripped REBUILD subsumes
    * compaction, because the survivor rebuild both re-derives every
    * searched-in insert as a true mutual-kNN vertex AND physically
    * drops tombstones — so `action` = rebuild > compact > serve.
    * One row: (n_vectors, n_delta, delta_frac, n_tombstoned,
    * tombstone_frac, action). Fully SQL-expressible: the gate pins
    * exact semantics against DuckDB. */
  def annMaintenanceNeeded(
      spark: SparkSession, sfDir: String,
      rebuildThreshold: Double = 0.2,
      compactThreshold: Double = 0.1): DataFrame = {
    val tomb = spark.read.parquet(annTombstonesPath(spark, sfDir))
    vecs(spark, sfDir)
      .join(broadcast(tomb.withColumn("t", lit(1))), Seq("vec_id"), "left")
      .agg(count(lit(1)).as("n_vectors"),
        sum(when(pmod(col("vec_id"), lit(DeltaIngestMod)) ===
          DeltaIngestRem, 1L).otherwise(0L)).as("n_delta"),
        sum(when(col("t").isNotNull, 1L).otherwise(0L)).as("n_tombstoned"))
      .select(col("n_vectors"), col("n_delta"),
        round(col("n_delta") / col("n_vectors"), 4).as("delta_frac"),
        col("n_tombstoned"),
        round(col("n_tombstoned") / col("n_vectors"), 4)
          .as("tombstone_frac"),
        when(col("n_delta") / col("n_vectors") > rebuildThreshold,
            "rebuild")
          .when(col("n_tombstoned") / col("n_vectors") > compactThreshold,
            "compact")
          .otherwise("serve").as("action"))
  }

  /** s48: the LIFECYCLE dispatch — [[graphBeamAnnServed]]'s (s43)
    * generalization to the full decision surface: route the serve on
    * [[annMaintenanceNeeded]]'s action row. `serve` → the
    * delta-maintained merge-on-read path ([[graphBeamLifecycleServed]],
    * s47); `rebuild` and `compact` → the survivor rebuild
    * ([[graphBeamAnnCompactedServed]]) — in this batch-static testbed
    * both actions land on the same artifact (a full rebuild over
    * non-tombstoned vectors incorporates the delta AND drops
    * takedowns; in a multi-segment deployment compaction could stay
    * segment-local), so the distinction the decision row carries is
    * WHICH share tripped, not which artifact results. At gate dials
    * (delta 1/7 ≈ 14.3% < 20%, tombstoned 1/41 ≈ 2.4% < 10%) the
    * dispatch pins the s47 branch; AnnLifecycleSpec forces each
    * threshold to pin the others. */
  def graphBeamAnnLifecycleAuto(
      spark: SparkSession, sfDir: String,
      nQueries: Int = 5, beam: Int = 8, steps: Int = 6,
      k: Int = 5, entries: Int = 4, insertDegree: Int = 10,
      rebuildThreshold: Double = 0.2,
      compactThreshold: Double = 0.1): DataFrame = {
    val decide = annMaintenanceNeeded(spark, sfDir,
      rebuildThreshold, compactThreshold).head()
    decide.getAs[String]("action") match {
      case "serve" => graphBeamLifecycleServed(spark, sfDir,
        nQueries, beam, steps, k, entries, insertDegree)
      case _ => graphBeamAnnCompactedServed(spark, sfDir,
        nQueries, beam, steps, k, entries)
    }
  }

  /** The symmetrized mutual-kNN edge frame shared by s34/s36. */
  private def beamEdges(all: DataFrame): DataFrame = {
    val edges0 = GraphOps.mutualKnnEdgesOn(all)
    Persists.barrier(
      edges0.select(col("a").as("src"), col("b").as("dst"))
        .unionAll(edges0.select(col("b").as("src"), col("a").as("dst"))))
  }

  /** The beam walk itself — entry-set-agnostic; s34 passes the min
    * graph node, s36 the farthest-first seeds. Each entry runs an
    * INDEPENDENT walk (beam partitioned by (query, entry)) and the
    * final top-k merges the branch beams: with a shared beam, extra
    * seeds can evict the stepping stones another entry's path needs
    * (measured: query 2's only truth hit lost, recall 0.2 → 0.0);
    * with independent branches the single-entry walk is literally
    * one branch of the multi-entry run, and any node displacing a
    * truth member in the merged top-k has strictly higher cosine —
    * i.e. is itself a truth member — so per-query recall dominance
    * is a theorem, not an observation. */
  private def beamWalk(
      all: DataFrame, e: DataFrame, entryNodes: DataFrame,
      nQueries: Int, beam: Int, steps: Int, k: Int,
      exclude: Option[DataFrame] = None): DataFrame =
    beamWalkOn(all, e, entryNodes,
      Persists.barrier(all.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("query_id"), col("v").as("qv"))),
      beam, steps, k, exclude)

  /** [[beamWalk]] with the QUERY frame supplied by the caller —
    * s34/s36 pass the first `nQueries` corpus vectors; s37's
    * delta-insert passes the NEW vectors themselves (searching the
    * base graph for their connection points). */
  private def beamWalkOn(
      all: DataFrame, e: DataFrame, entryNodes: DataFrame,
      q: DataFrame, beam: Int, steps: Int, k: Int,
      exclude: Option[DataFrame] = None): DataFrame = {
    var f: DataFrame = q.crossJoin(broadcast(entryNodes.select("node")))
      .select(col("query_id"), col("node").as("entry"), col("node"))
      .localCheckpoint(false)
    // Per-round beam trim via the native DISTINCT top-k aggregate
    // instead of distinct() + row_number window: a candidate node's
    // cosine is a function of (query, node), so duplicate candidates
    // carry identical scores and graft_topk_distinct keeps exactly the
    // rows the old dedup-then-rank pipeline kept — same total order
    // (cosine desc, node asc), same beam. One partial-aggregated
    // exchange per round replaces the distinct exchange AND the window
    // exchange+sort (guide §2.3/§2.4: fewer, smaller shuffles per
    // superstep).
    for (_ <- 1 to steps) {
      val cand = f.select("query_id", "entry", "node")
        .unionAll(f.join(e, f("node") === e("src"))
          .select(col("query_id"), col("entry"), col("dst").as("node")))
      f = cand
        .join(all.select(col("vec_id").as("node"), col("v")), "node")
        .join(broadcast(q), "query_id")
        .select(col("query_id"), col("entry"), col("node"),
          round(expr("graft_cosine(qv, v)"), 4).as("cosine"))
        .groupBy("query_id", "entry")
        .agg(expr(s"graft_topk_distinct(cosine, node, $beam)").as("tk"))
        .select(col("query_id"), col("entry"), explode(col("tk")).as("e"))
        .select(col("query_id"), col("entry"),
          col("e.payload").as("node"), col("e.score").as("cosine"))
        .localCheckpoint(false)
    }
    val base = f.filter(col("node") =!= col("query_id"))
      .select("query_id", "node", "cosine")
    // merge-on-read tombstones: deleted nodes ROUTE (they stayed in
    // the beams above — the HNSW serving discipline) but never
    // SURFACE; the manifest is takedown-sized, so the anti-join
    // broadcasts (the sources/Deletes.readAt shape applied to the
    // index family)
    val kept = exclude.fold(base)(ex =>
      base.join(broadcast(ex.select("node")), Seq("node"), "left_anti"))
    // cross-entry merge + final top-k: graft_topk_distinct absorbs the
    // old distinct() (same node from two entry branches scores
    // identically) and posexplode's array position IS the old
    // row_number rank (the aggregate emits strongest-first under the
    // identical total order)
    kept.groupBy("query_id")
      .agg(expr(s"graft_topk_distinct(cosine, node, $k)").as("tk"))
      .select(col("query_id"), posexplode(col("tk")).as(Seq("p", "e")))
      .select(col("query_id"), (col("p") + 1).cast("int").as("rank"),
        col("e.payload").as("neighbor_id"), col("e.score").as("cosine"))
  }

  /** s37: INCREMENTAL GRAPH-BEAM INDEX MAINTENANCE — the delta-insert
    * step a serving NSW deployment runs per ingest batch (s35's
    * incremental-assignment discipline applied to the GRAPH index,
    * which until now forced a full rebuild per batch): the kNN-edge
    * artifact is built from the BASE corpus only (`vec_id % 7 <> 3`,
    * the shared delta split); each NEW vector finds its connection
    * points by BEAM-SEARCHING the existing graph — delta-sized work
    * over the stored edges, never a corpus rescan, exactly how
    * HNSW/NSW inserts — then links to its top-`insertDegree` hits,
    * symmetrized so the new vertex is both reachable and a stepping
    * stone. Serving runs s36's multi-entry walk over the UPDATED
    * graph. Rows-only by design with the recall CONTRACT pinned in
    * GraphBeamSpec: at gate dials the delta-inserted graph's
    * per-query recall@5 against the full brute truth is ≥ the
    * full-rebuild graph's (insertion search sees every base vertex
    * the rebuild's mutual-reciprocity filter may drop, so
    * well-connected inserts can even improve navigation).
    * [[graphRebuildNeeded]] is the staleness trigger —
    * [[ivfRetrainNeeded]]'s graph analog.
    *
    * Scale shape: insertion = |delta| × beam supersteps over the edge
    * artifact (corpus touched only via candidate-id vector fetches);
    * the artifact grows by O(|delta| × insertDegree) edges. Rebuild
    * is the TRIGGERED exception, not the per-batch rule. */
  def graphBeamDeltaInsert(
      spark: SparkSession, sfDir: String,
      nQueries: Int = 5, beam: Int = 8, steps: Int = 6,
      k: Int = 5, entries: Int = 4, insertDegree: Int = 10): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val all = Persists.barrier(vecs(spark, sfDir))
    val base = Persists.barrier(all.filter(
      pmod(col("vec_id"), lit(DeltaIngestMod)) =!= DeltaIngestRem))
    graphBeamDeltaInsertOn(spark, all, base, beamEdges(base),
      nQueries, beam, steps, k, entries, insertDegree)
  }

  /** The stored BASE-graph edge artifact (src, dst — the symmetrized
    * mutual-kNN frame over the `vec_id % 7 <> 3` corpus): what a
    * serving NSW deployment keeps on disk between ingest batches.
    * Fingerprint-keyed like [[graft.operators.GraphOps.knnEdgesAllPath]]
    * so a regenerated corpus rebuilds it. */
  def beamBaseEdgesPath(spark: SparkSession, sfDir: String): String = {
    val n = Tables.rowCount(spark, sfDir, "embeddings")
    val fp = java.lang.Long.toHexString(Tables.fingerprint(
      spark, sfDir, "embeddings", Seq("vec_id", "embedding")))
    val dir = graft.sources.FsUtil.qualified("target/tmp/graph/beambase_" +
      graft.sources.FsUtil.sanitize(sfDir) + s"_n${n}_$fp")
    if (!graft.sources.FsUtil.exists(spark, dir + "/_SUCCESS"))
      beamEdges(vecs(spark, sfDir).filter(
        pmod(col("vec_id"), lit(DeltaIngestMod)) =!= DeltaIngestRem))
        .write.mode("overwrite").parquet(dir)
    dir
  }

  /** s37's production twin (benched s37i): the SAME delta insert +
    * serve against the STORED base-edge artifact — the per-batch
    * maintenance cost without the in-entry graph (re)build, exactly
    * the d12i/s35i serve discipline. GraphBeamSpec pins served ≡
    * inline. */
  def graphBeamDeltaServed(
      spark: SparkSession, sfDir: String,
      nQueries: Int = 5, beam: Int = 8, steps: Int = 6,
      k: Int = 5, entries: Int = 4, insertDegree: Int = 10): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val all = Persists.barrier(vecs(spark, sfDir))
    val base = Persists.barrier(all.filter(
      pmod(col("vec_id"), lit(DeltaIngestMod)) =!= DeltaIngestRem))
    val stored = Persists.barrier(
      spark.read.parquet(beamBaseEdgesPath(spark, sfDir))
        .select("src", "dst"))
    graphBeamDeltaInsertOn(spark, all, base, stored,
      nQueries, beam, steps, k, entries, insertDegree)
  }

  private def graphBeamDeltaInsertOn(
      spark: SparkSession, all: DataFrame, base: DataFrame,
      baseEdges: DataFrame, nQueries: Int, beam: Int, steps: Int,
      k: Int, entries: Int, insertDegree: Int): DataFrame = {
    val updated = Persists.barrier(baseEdges.unionAll(
      deltaInsertEdges(spark, all, base, baseEdges, beam, steps,
        entries, insertDegree)))
    val ent = updated.agg(min(col("src")).as("node"))
      .unionAll(farthestFirstOn(spark, all, entries)
        .select(col("vec_id").as("node")))
      .distinct()
    beamWalk(all, updated, ent, nQueries, beam, steps, k)
  }

  /** The NEW symmetrized edges one s37 ingest batch contributes
    * (insert links + delta-internal mutual-kNN) — factored out so
    * the 1-hop path (s37/s37i: base ∪ these) and the 2-hop path
    * (s45: [[hop2DeltaUpdate]] with these as Δ) maintain their
    * artifacts from ONE definition of the batch's edge delta. */
  private def deltaInsertEdges(
      spark: SparkSession, all: DataFrame, base: DataFrame,
      baseEdges: DataFrame, beam: Int, steps: Int,
      entries: Int, insertDegree: Int): DataFrame =
    deltaInsertEdgesFor(spark,
      all.filter(pmod(col("vec_id"), lit(DeltaIngestMod)) ===
        DeltaIngestRem),
      base, baseEdges, beam, steps, entries, insertDegree)

  /** [[deltaInsertEdges]] with the ingest batch supplied EXPLICITLY as
    * a (vec_id, v) frame instead of carved out of the corpus by the
    * gate's modulo split — the form a STREAMING maintenance loop
    * calls per micro-batch (graft.streaming.StreamAnnMaintain), where
    * batch N's inserts must search the graph that already contains
    * batches 1..N-1. */
  private[graft] def deltaInsertEdgesFor(
      spark: SparkSession, deltaVecs: DataFrame, base: DataFrame,
      baseEdges: DataFrame, beam: Int, steps: Int,
      entries: Int, insertDegree: Int): DataFrame = {
    // NSW insert: each delta vector beam-searches the BASE graph from
    // the same entry policy serving uses (min node + maxmin seeds)
    val baseEntries = baseEdges.agg(min(col("src")).as("node"))
      .unionAll(farthestFirstOn(spark, base, entries)
        .select(col("vec_id").as("node")))
      .distinct()
    val deltaQ = Persists.barrier(deltaVecs
      .select(col("vec_id").as("query_id"), col("v").as("qv")))
    // insertion walks WIDER and DEEPER than serving (2×beam,
    // steps+2): insertion is ingest-time offline work, and the base
    // graph's reciprocity-pruned paths need the extra reach — the
    // exact trade HNSW makes with efConstruction > efSearch
    val walkFound = beamWalkOn(base, baseEdges, baseEntries, deltaQ,
      2 * beam, steps + 2, insertDegree)
      .select(col("query_id"), col("neighbor_id").as("node"),
        col("cosine"))
    // mutual-reciprocity can leave base vertices ISOLATED (zero
    // edges) — unreachable by ANY walk, where a real NSW build never
    // leaves them (every insert connects). Walking FROM them is
    // pointless (no out-edges), so score them DIRECTLY against each
    // delta query — |Δ|×|isolated| cosines, one codegen'd pass, no
    // per-branch walk state (the first cut used walk entries and
    // paid |Δ|×|isolated| BRANCHES per superstep — 32 s at sf0.1) —
    // and a competitive stranded vertex wins its edges back the
    // moment a nearby delta arrives (at sf0.001, query 3's top-1
    // truth neighbor 223 is exactly this case: the rebuilt graph
    // reaches it only through delta vertex 3)
    val isolatedScored = deltaQ.crossJoin(
        base.select(col("vec_id").as("node"), col("v"))
          .join(baseEdges.select(col("src").as("node")).distinct(),
            Seq("node"), "left_anti"))
      .select(col("query_id"), col("node"),
        round(expr("graft_cosine(qv, v)"), 4).as("cosine"))
    // merge walk hits + isolated scores, keep top-insertDegree
    val wIns = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("node"))
    val found = walkFound.unionAll(isolatedScored)
      .groupBy("query_id", "node").agg(max("cosine").as("cosine"))
      .withColumn("rk", row_number().over(wIns))
      .filter(col("rk") <= insertDegree)
    val inserted = Persists.barrier(
      found.select(col("query_id").as("src"), col("node").as("dst"))
        .unionAll(found.select(col("node").as("src"),
          col("query_id").as("dst"))))
    // delta-INTERNAL mutual-kNN edges: the batch's own near pairs
    // can't be found by searching the base graph (delta vertices
    // aren't in it) — |Δ|² scoring is batch-sized work, the standard
    // small-batch cost (LSH-bucketed like d-family blocking when a
    // batch is ever corpus-scale)
    val intra = beamEdges(deltaVecs)
    inserted.unionAll(intra)
  }

  /** The staleness-triggered graph-rebuild decision
    * ([[ivfRetrainNeeded]]'s analog for the kNN-edge artifact):
    * search-inserted vertices carry searched — not mutual-kNN —
    * edges, so navigation quality decays as their share grows.
    * Input: a vertex frame with an `is_delta` flag (the serving
    * layer's ingest bookkeeping). One row:
    * (n_vertices, n_delta, delta_frac, rebuild). */
  def graphRebuildNeeded(
      vertices: DataFrame, threshold: Double = 0.2): DataFrame =
    vertices.agg(count(lit(1)).as("n_vertices"),
        sum(when(col("is_delta"), 1L).otherwise(0L)).as("n_delta"))
      .select(col("n_vertices"), col("n_delta"),
        round(col("n_delta") / col("n_vertices"), 4).as("delta_frac"),
        (col("n_delta") / col("n_vertices") > threshold).as("rebuild"))

  /** s33: kNN-CLASSIFIER EMBEDDING EVAL — the standard intrinsic
    * probe of embedding quality (better spaces put same-label points
    * closer): the first `nQueries` vectors are classified by the
    * MAJORITY label of their exact top-`k` neighbors (ties to the
    * smaller label — a total order both engines share), compared to
    * their own label, and rolled into one accuracy row plus the
    * per-query detail. On structureless synthetic labels the accuracy
    * is its ~1/nlabels base rate — the gate checks the computation;
    * on a real corpus this number moving is what re-embedding buys.
    * Output (query_id, true_label, pred_label, correct).
    *
    * Scale shape: s01's broadcast-query scan, a (query, label)
    * partial agg, one argmax window over queries×labels. */
  def knnClassifierEval(
      spark: SparkSession, sfDir: String,
      nQueries: Int = 50, k: Int = 5): DataFrame = {
    val all = Persists.barrier(vecsWithLabel(spark, sfDir))
    val ranked = exactTopK(all.select(col("vec_id"), col("v")),
      all.select(col("vec_id"), col("v")).filter(col("vec_id") < nQueries),
      k)
    val votes = ranked
      .join(all.select(col("vec_id").as("neighbor_id"),
        col("label").as("nb_label")), "neighbor_id")
      .groupBy(col("query_id"), col("nb_label"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("n").desc, col("nb_label").asc)
    val pred = votes.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("query_id"), col("nb_label").as("pred_label"))
    pred.join(all.select(col("vec_id").as("query_id"),
        col("label").as("true_label")), "query_id")
      .select(col("query_id"), col("true_label"), col("pred_label"),
        (col("pred_label") === col("true_label")).as("correct"))
  }

  /** s32: FILTERED ANN — IVF probing with a metadata predicate pushed
    * into the CANDIDATE side (the "filtered vector search" every
    * retrieval stack now exposes): the index (cells, probes) is built
    * on the FULL corpus, and only the label-matching members of the
    * probed cells are scored — pre-filtering at the cell-member scan,
    * so a 10%-selective filter cuts candidate work ~10× instead of
    * post-filtering a mostly-wrong top-k (s07 is the exact
    * brute-force twin of this semantics). Queries are NOT filtered —
    * any query may search any label slice. Deterministic end-to-end
    * (modular-sample quantizer), so it hash-checks like s04/s08. */
  def ivfTopKFiltered(
      spark: SparkSession, sfDir: String, label: Int = 1,
      nQueries: Int = 5, k: Int = 10, nprobe: Int = 4): DataFrame = {
    val all = vecsWithLabel(spark, sfDir)
    val rows = Tables.rowCount(spark, sfDir, "embeddings")
    val (centIds, centVecs) =
      centroidModel(all.select(col("vec_id"), col("v")), rows, 23)
    ivfSearch(spark, all, centIds, centVecs, nQueries, k, nprobe,
      corpusFilter = col("label") === label)
  }

  /** The IVF probe/search half, shared by the modular-sample gate path
    * (s04/s08), the trained path (s09), and the label-filtered path
    * (s32 — `corpusFilter` prunes the candidate side before
    * assignment; the quantizer itself stays full-corpus). Assign the
    * corpus to its nearest cell, probe each query's `nprobe` nearest
    * cells, score the probed candidates. Model-agnostic —
    * `centIds`/`centVecs` are whatever coarse quantizer the caller
    * built. */
  private[graft] def ivfSearch(
      spark: SparkSession, all: DataFrame,
      centIds: Seq[Long], centVecs: Seq[Seq[Double]],
      nQueries: Int, k: Int, nprobe: Int,
      corpusFilter: Column = lit(true)): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val idsLit = typedlit(centIds) // C longs — tiny either way

    val assignment = all.filter(corpusFilter)
      .withColumn("nc", nearestCents(spark, col("v"), centVecs, 1))
      .select(col("vec_id"), col("v"),
        element_at(idsLit, col("nc").getItem(0) + 1).as("cent_id"))
    val probes = all.filter(col("vec_id") < nQueries)
      .withColumn("nc", nearestCents(spark, col("v"), centVecs, nprobe))
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        explode(col("nc")).as("ci"))
      .select(col("query_id"), col("qv"),
        element_at(idsLit, col("ci") + 1).as("cent_id"))
    val cand = assignment.as("a").join(broadcast(probes.as("p")),
        col("a.cent_id") === col("p.cent_id") &&
          col("a.vec_id") =!= col("p.query_id"))
      .select(col("p.query_id").as("query_id"), col("a.vec_id").as("neighbor_id"),
        round(expr("graft_cosine(p.qv, a.v)"), 4).as("cosine"))
      .distinct()
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    cand.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }

  /** Spherical k-means (Lloyd) over a (vec_id, v) frame — the TRAINED
    * coarse quantizer the IVF literature assumes (the modular sample
    * s04/s08 gate is the deterministic stand-in; see the docstring at
    * [[ivfTopKOn]]). Mean-per-cell maximizes the summed cosine to the
    * cell centroid, and the un-normalized mean is argmax-equivalent to
    * the normalized one, so plain `avg` is the whole M-step.
    *
    * Scale shape per iteration: assignment is the same narrow
    * codegen'd map as serving ([[nearestCents]] over the ≤
    * `maxCentroids` broadcast model — zero shuffle), and the M-step
    * shuffles (cell, dim) PARTIAL sums — k·dim distinct keys, so the
    * map-side combine collapses each task's contribution to at most
    * k·dim rows regardless of corpus size; the driver then collects k
    * mean vectors (the same bounded fetch the model already takes at
    * plan time). Total: `iters` linear passes, nothing
    * corpus-quadratic, model never exceeds the s04 cap. Empty cells
    * keep their previous centroid (the deterministic fallback; k-means++
    * reseeding would trade determinism for marginal balance).
    *
    * Training is deterministic up to float summation order inside
    * `avg` (partition-order dependent), which is why the trained path
    * is a rows-only gate entry: the RECALL spec (recall@10 ≥ 0.8 vs
    * [[bruteForceTopK]] at sf0.1, IvfTrainedRecallSpec) is the
    * correctness contract, and the algebra itself is hash-gated via
    * s04/s08's modular oracles over the identical search half. */
  def trainCentroids(
      all: DataFrame, rows: Long, k: Int, iters: Int,
      maxCentroids: Int = DefaultMaxCentroids): Seq[Seq[Double]] = {
    require(k > 0 && k <= maxCentroids, s"k=$k must be in 1..$maxCentroids")
    val spark = all.sparkSession
    val mod = math.max(1L, rows / k)
    var cents: Seq[Seq[Double]] = all
      .filter(pmod(col("vec_id"), lit(mod)) === 0)
      .orderBy("vec_id").limit(k)
      .select("v").collect().map(_.getSeq[Double](0).toSeq).toSeq
    // a sparse / non-dense vec_id domain can seed fewer than k cells;
    // fail loudly rather than silently training a smaller model whose
    // cell count diverges from the caller's TrainedCells
    require(cents.size == k,
      s"centroid seeding found ${cents.size} of k=$k seeds " +
        s"(rows=$rows, mod=$mod) — vec_id domain too sparse for k")
    for (_ <- 0 until iters) {
      val means = all
        .withColumn("cell",
          nearestCents(spark, col("v"), cents, 1).getItem(0))
        .select(col("cell"), posexplode(col("v")).as(Seq("j", "x")))
        .groupBy("cell", "j").agg(avg("x").as("m")) // k·dim keys
        .groupBy("cell").agg(expr(
          "transform(array_sort(collect_list(struct(j, m))), s -> s.m)")
          .as("mv"))
        .collect() // ≤ k rows — the bounded model fetch
        .map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq).toMap
      cents = cents.indices.map(i => means.getOrElse(i, cents(i)))
    }
    cents
  }

  /** The default trained-IVF serving dials, tuned on the gate corpus
    * (sweep: SCALE_r7.md). The synthetic embeddings are
    * STRUCTURELESS — within-label cosine ≈ cross-label ≈ 0 — so recall
    * tracks the probed fraction almost linearly (no free lunch without
    * cluster structure); 16 cells × 10 probes ≈ 62% of the corpus
    * scanned buys recall@10 ≈ 0.88. On a real corpus with cluster
    * structure the same dials scan far less for the same recall —
    * these constants are corpus-tuned, the SHAPE (bounded model,
    * narrow assignment, probe-restricted candidate join) is what
    * scales. */
  val TrainedCells: Int = 16
  val TrainedIters: Int = 4
  val TrainedProbe: Int = 10

  /** The trained model as an INGEST ARTIFACT: centroids stored per
    * (sfDir, corpus row count, cells, iters) and reloaded on every
    * later serve — training is paid once, like the d12i signature
    * table (the shape a real index pipeline has: train at ingest,
    * serve forever). Idempotent via the Hadoop FileSystem; the row
    * count in the key catches size-changing testdata regeneration
    * (same-size regeneration needs target/tmp cleared — the
    * path-keyed-artifact limit, same as signatureTablePath). The
    * stored model also FREEZES the one nondeterministic step
    * (float-sum order inside the M-step's avg), so repeated serves
    * are bit-identical. */
  def trainedModelPath(
      spark: SparkSession, sfDir: String,
      cells: Int = TrainedCells, iters: Int = TrainedIters): String = {
    val n = Tables.rowCount(spark, sfDir, "embeddings")
    val dir = graft.sources.FsUtil.qualified("target/tmp/ivf_model/" +
      graft.sources.FsUtil.sanitize(sfDir) + s"_n${n}_c${cells}_i$iters")
    if (!graft.sources.FsUtil.exists(spark, dir + "/_SUCCESS")) {
      val cached = Persists.barrier(vecs(spark, sfDir))
      val cents = trainCentroids(cached, n, cells, iters)
      import spark.implicits._
      cents.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("cent_id", "v")
        .coalesce(1).write.mode("overwrite").parquet(dir)
    }
    dir
  }

  /** s09: IVF over a spherical-k-means-trained centroid model — the
    * PRODUCTION quality path (s04/s08's modular sample is the
    * deterministic oracle stand-in; its recall@10 tops out at 0.38 on
    * this corpus, the trained model at the same probed fraction
    * clears 0.8 — IvfTrainedRecallSpec). Same bounded-model plumbing,
    * same [[ivfSearch]] half as the gated entries; the model comes
    * from [[trainedModelPath]] (train-once, serve-many), and the
    * model fetch is a ≤`cells`-row collect. */
  def ivfTopKTrained(
      spark: SparkSession, sfDir: String,
      nQueries: Int = 5, k: Int = 10,
      cells: Int = TrainedCells, iters: Int = TrainedIters,
      nprobe: Int = TrainedProbe): DataFrame = {
    val centVecs = trainedCentroids(spark, sfDir, cells, iters)
    ivfSearch(spark, vecs(spark, sfDir), 0L until centVecs.size.toLong,
      centVecs, nQueries, k, nprobe)
  }

  /** The trained coarse model as plan-time vectors — ≤`cells` rows,
    * the bounded model fetch shared by s09 and the s19 composition. */
  private def trainedCentroids(
      spark: SparkSession, sfDir: String,
      cells: Int = TrainedCells, iters: Int = TrainedIters)
      : Seq[Seq[Double]] =
    spark.read.parquet(trainedModelPath(spark, sfDir, cells, iters))
      .select("cent_id", "v").orderBy("cent_id")
      .collect().map(_.getSeq[Double](1).toSeq).toSeq

  /** The corpus as a CELL-PARTITIONED serving layout: every embedding
    * written under its assigned coarse cell's partition directory
    * (`cell=<cent_id>/…`), the ingest artifact an IVF index IS at file
    * level. Probe restriction then prunes I/O, not rows: a query that
    * probes `nprobe` of C cells lists and reads only those partition
    * directories — at 100 TB the difference between "scan 62 TB and
    * filter" and "read the probed nprobe/C of the files". Idempotent
    * per (sfDir, rows, mod), same artifact discipline as
    * [[trainedModelPath]] / d12i's signature table. Assignment uses
    * the deterministic modular quantizer ([[centroidModel]]) so the
    * layout — and s11's gate — stay oracle-reproducible; a trained
    * model partitions identically (swap the quantizer at ingest). */
  def cellPartitionedPath(
      spark: SparkSession, sfDir: String, centroidMod: Int = 23): String = {
    val n = Tables.rowCount(spark, sfDir, "embeddings")
    val dir = graft.sources.FsUtil.qualified("target/tmp/ivf_cells/" +
      graft.sources.FsUtil.sanitize(sfDir) + s"_n${n}_m$centroidMod")
    if (!graft.sources.FsUtil.exists(spark, dir + "/_SUCCESS")) {
      val all = vecs(spark, sfDir)
      val (centIds, centVecs) = centroidModel(all, n, centroidMod)
      all
        .withColumn("nc", nearestCents(spark, col("v"), centVecs, 1))
        .select(col("vec_id"), col("v"),
          element_at(typedlit(centIds), col("nc").getItem(0) + 1).as("cell"))
        .write.mode("overwrite").partitionBy("cell").parquet(dir)
    }
    dir
  }

  /** s11: s08's multi-probe IVF search served FROM the cell-partitioned
    * layout — the probed cells become a partition filter on the read,
    * so the scan touches only nprobe-probed directories
    * (IvfPartitionedSpec asserts `selectedPartitions` == the probed
    * cell count, a strict subset of C). The probed-cell fetch is a
    * ≤ nQueries·nprobe-row collect (the bounded-model pattern). Must
    * hash-match s08's oracle verbatim: serving layout may never change
    * the answer. */
  def ivfTopKPartitioned(
      spark: SparkSession, sfDir: String,
      nQueries: Int = 5, k: Int = 10,
      centroidMod: Int = 23, nprobe: Int = MultiProbe): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val all = vecs(spark, sfDir)
    val n = Tables.rowCount(spark, sfDir, "embeddings")
    val dir = cellPartitionedPath(spark, sfDir, centroidMod)
    val (centIds, centVecs) = centroidModel(all, n, centroidMod)
    val idsLit = typedlit(centIds)
    val probes = all.filter(col("vec_id") < nQueries)
      .withColumn("nc", nearestCents(spark, col("v"), centVecs, nprobe))
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        explode(col("nc")).as("ci"))
      .select(col("query_id"), col("qv"),
        element_at(idsLit, col("ci") + 1).as("cell"))
    probedScan(spark, dir, probes, k)
  }

  /** The partition-pruned candidate scan + score + top-k half of s11,
    * split out so the spec can aim it at a known probe set. `probes` is
    * (query_id, qv, cell); the returned frame mirrors [[ivfSearch]]'s
    * output shape exactly. */
  private[operators] def probedScan(
      spark: SparkSession, dir: String, probes: DataFrame,
      k: Int): DataFrame = {
    // bounded collect: ≤ nQueries·nprobe longs — the partition filter
    // must be a plan-time literal for pruning to happen at LISTING time
    val probedCells = probes.select("cell").distinct()
      .collect().map(_.getLong(0)).sorted
    val raw = spark.read.parquet(dir)
    // match the inferred partition-column type exactly: a literal of a
    // WIDER type would put a cast on the column and defeat pruning
    val lits: Seq[Any] = raw.schema("cell").dataType match {
      case org.apache.spark.sql.types.LongType => probedCells.toSeq
      case _ => probedCells.map(_.toInt).toSeq
    }
    val corpus = raw.filter(col("cell").isin(lits: _*))
    val cand = corpus.as("a").join(broadcast(probes.as("p")),
        col("a.cell") === col("p.cell") &&
          col("a.vec_id") =!= col("p.query_id"))
      .select(col("p.query_id").as("query_id"),
        col("a.vec_id").as("neighbor_id"),
        round(expr("graft_cosine(p.qv, a.v)"), 4).as("cosine"))
      .distinct()
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    cand.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }

  /** s19: the COMPOSED IVF-PQ index artifact — the production serving
    * structure both halves have been building toward: the TRAINED
    * coarse quantizer (s09's model) assigns each vector a cell, PQ
    * codes the RESIDUAL v − centroid(cell) (residuals are what PQ
    * codebooks are trained on in production — they're smaller and
    * better-centered than raw vectors), and the layout is
    * cell-PARTITIONED parquet of (vec_id, codes, rn2) — m ints + one
    * precomputed reconstruction norm per row, NO raw vectors: probe
    * restriction prunes I/O at listing time (s11's layout) and
    * everything that moves afterwards is codes (s10's compression).
    * The residual codebook (deterministic modular sample of
    * residuals, the s06 discipline) is stored beside the data so the
    * serve path scores with byte-identical centroids. Idempotent per
    * (sfDir, rows, m, content fingerprint). */
  def ivfPqPath(
      spark: SparkSession, sfDir: String, m: Int = 8): String = {
    graft.functions.GraftFunctions.register(spark)
    val n = Tables.rowCount(spark, sfDir, "embeddings")
    val fp = java.lang.Long.toHexString(Tables.fingerprint(
      spark, sfDir, "embeddings", Seq("vec_id", "embedding")))
    val dir = graft.sources.FsUtil.qualified("target/tmp/ivfpq/" +
      graft.sources.FsUtil.sanitize(sfDir) + s"_n${n}_m${m}_$fp")
    if (!graft.sources.FsUtil.exists(spark, dir + "/data/_SUCCESS")) {
      val coarse = trainedCentroids(spark, sfDir)
      val coarseLit = typedlit(coarse)
      val dim = coarse.head.size
      require(dim % m == 0, s"dim $dim must split into $m subspaces")
      val sub = dim / m
      // barriered: the residual frame feeds the codebook sample AND
      // the encode pass
      val assigned = Persists.barrier(vecs(spark, sfDir)
        .withColumn("cell",
          nearestCents(spark, col("v"), coarse, 1).getItem(0))
        .withColumn("cc", element_at(coarseLit, col("cell") + 1))
        .withColumn("resid", zip_with(col("v"), col("cc"),
          (x, y) => x - y)))
      val (_, rcents) = centroidModel(
        assigned.select(col("vec_id"), col("resid").as("v")), n, 29)
      val rLit = typedlit(rcents)
      val recon = flatten(transform(col("codes"),
        (c: Column, s: Column) =>
          slice(element_at(rLit, c + 1), s * sub + 1, lit(sub))))
      assigned
        .withColumn("codes",
          call_function("graft_pq_codes", col("resid"), rLit, lit(m)))
        .withColumn("vhat", zip_with(col("cc"), recon, (a, b) => a + b))
        .withColumn("rn2", aggregate(col("vhat"), lit(0.0d),
          (acc, x) => acc + x * x))
        .select("vec_id", "codes", "rn2", "cell")
        .write.mode("overwrite").partitionBy("cell")
        .parquet(dir + "/data")
      import spark.implicits._
      rcents.zipWithIndex.map { case (v, i) => (i, v) }
        .toDF("rc_id", "rv")
        .coalesce(1).write.mode("overwrite").parquet(dir + "/codebook")
    }
    dir
  }

  /** s19's serve path: probe the `nprobe` nearest TRAINED cells, read
    * ONLY those partitions of the [[ivfPqPath]] layout, and score by
    * residual-ADC — per (query, cell) one coarse dot scalar, per query
    * one m × C residual lookup table; each candidate row costs m table
    * lookups + the stored norm. dot(q, v̂) = dot(q, cc) + Σ_s
    * tbl[s][code_s] because the reconstruction is cc + residual-recon
    * and both dots decompose per subspace (s10's algebra over
    * residuals). Rows-only gate entry (float decomposition ≠ any
    * full-fold oracle bit-for-bit); IvfPqRecallSpec pins the recall@10
    * floor vs brute s01 and the partition-pruned, codes-only plan. */
  def ivfPqTopK(
      spark: SparkSession, sfDir: String,
      nQueries: Int = 5, k: Int = 10, m: Int = 8,
      nprobe: Int = TrainedProbe): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val dir = ivfPqPath(spark, sfDir, m)
    val coarse = trainedCentroids(spark, sfDir)
    val coarseLit = typedlit(coarse)
    val rcents = spark.read.parquet(dir + "/codebook").orderBy("rc_id")
      .collect().map(_.getSeq[Double](1).toSeq).toSeq
    val rLit = typedlit(rcents)
    val dim = coarse.head.size
    val sub = dim / m
    val subsIdx = sequence(lit(0), lit(m - 1))
    def fold(c: Column): Column =
      aggregate(c, lit(0.0d), (acc, x) => acc + x)
    def sliceDot(a: Column, b: Column, s: Column): Column =
      fold(zip_with(slice(a, s * sub + 1, lit(sub)),
        slice(b, s * sub + 1, lit(sub)), (x, y) => x * y))
    // barriered: the probe frame feeds the bounded probed-cell collect
    // AND the broadcast join
    val probes = Persists.barrier(vecs(spark, sfDir)
      .filter(col("vec_id") < nQueries)
      .withColumn("nc", nearestCents(spark, col("v"), coarse, nprobe))
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        explode(col("nc")).as("cell"))
      .withColumn("ccdot", fold(zip_with(col("qv"),
        element_at(coarseLit, col("cell") + 1), (x, y) => x * y)))
      .withColumn("tbl", transform(subsIdx,
        s => transform(rLit, c => sliceDot(col("qv"), c, s))))
      .withColumn("qn2", fold(transform(col("qv"), x => x * x))))
    // bounded collect: ≤ nQueries·nprobe ints — the partition filter
    // must be a plan-time literal for LISTING-time pruning (s11)
    val probedCells = probes.select("cell").distinct()
      .collect().map(_.getInt(0)).sorted.toSeq
    val corpus = spark.read.parquet(dir + "/data")
      .filter(col("cell").isin(probedCells: _*))
    val scored = corpus.as("a").join(broadcast(probes.as("p")),
        col("a.cell") === col("p.cell") &&
          col("a.vec_id") =!= col("p.query_id"))
      .select(col("p.query_id").as("query_id"),
        col("a.vec_id").as("neighbor_id"),
        round((col("p.ccdot") + fold(zip_with(col("a.codes"),
            col("p.tbl"), (c, t) => element_at(t, c + 1)))) /
          sqrt(col("p.qn2") * col("a.rn2")), 4).as("cosine"))
      .distinct()
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }

  /** Product-quantization ANN (Jégou et al., TPAMI 2011): encode every
    * corpus vector as `m` small codebook indices (the
    * `graft_pq_codes` fused expression — subspace-wise L2 argmin over a
    * deterministic sampled codebook), then answer queries
    * asymmetrically: the EXACT query vector is scored against each
    * corpus vector's RECONSTRUCTION (concatenated codebook slices).
    *
    * Scale shape: encoding is a narrow codegen'd map with the codebook
    * as a plan literal/broadcast (the s04 model pattern — zero shuffle,
    * bounded plan-time collect via [[centroidModel]]'s cap), and the
    * scored table is the CODES — m ints instead of 64 floats per
    * vector, the 16-32× compression that lets billion-vector indexes
    * sit in memory. Scoring here materializes the reconstruction per
    * row (codegen'd `transform`/`flatten` over the literal codebook);
    * a production ADC would precompute the m × C distance table per
    * query, which is the same plan with a smaller constant. Queries
    * broadcast (5 rows), so the non-equi pair join is the intentional
    * tiny-broadcast BNLJ, exactly s01's audited shape. */
  def pqTopK(
      spark: SparkSession, sfDir: String,
      nQueries: Int = 5, k: Int = 10,
      codebookMod: Int = 29, m: Int = 8): DataFrame =
    pqTopKOn(vecs(spark, sfDir),
      Tables.rowCount(spark, sfDir, "embeddings"), nQueries, k,
      codebookMod, m)

  /** [[pqTopK]] over any (vec_id, v) frame — fixture-injectable
    * (ScaleProbe's serving-cost rows). */
  def pqTopKOn(
      all: DataFrame, rows: Long,
      nQueries: Int, k: Int,
      codebookMod: Int, m: Int): DataFrame = {
    val (_, centVecs) = centroidModel(all, rows, codebookMod)
    val dim = centVecs.head.size
    require(dim % m == 0, s"dim $dim must split into $m equal subspaces")
    val sub = dim / m
    val centsLit = typedlit(centVecs)
    val recon = flatten(transform(col("codes"),
      (c: Column, s: Column) =>
        slice(element_at(centsLit, c + 1), s * sub + 1, lit(sub))))
    val corpus = all
      .withColumn("codes",
        call_function("graft_pq_codes", col("v"), centsLit, lit(m)))
      .select(col("vec_id").as("neighbor_id"), recon.as("rv"))
    val q = all.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val scored = corpus.join(broadcast(q),
        col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(expr("graft_cosine(qv, rv)"), 4).as("cosine"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }

  /** s10: PQ serving by ASYMMETRIC DISTANCE COMPUTATION — the
    * production form s06's docstring promises (Jégou et al., TPAMI
    * 2011 §IV). The scored table is the CODES ONLY: per query, an
    * m × C lookup table `tbl[s][c] = dot(q_s, cent_c_s)` is built in
    * one narrow map over the (tiny, broadcast) query set, and each
    * corpus row's score is m table lookups — never touching the
    * reconstruction, because BOTH halves of the cosine decompose per
    * subspace: dot(q, r) = Σ_s dot(q_s, slice_s) and |r|² = Σ_s
    * |slice_s|² (the norm table is codebook-only, a constant-folded
    * literal on the corpus side). At 100 TB that's the difference
    * between streaming m ints + 2 folds per row and materializing a
    * dim-length reconstruction per row.
    *
    * Same codebook, same assignment, same ranking as s06 — but NOT
    * bit-identical to it: the subspace-decomposed sums fold doubles in
    * a different order than graft_cosine's full-vector fold, so s10
    * carries its OWN DuckDB twin replicating the decomposition
    * (list(partial ORDER BY s) pins the outer order), and
    * PqAdcSpec bounds |cosine_s10 − cosine_s06| pairwise instead of
    * pretending the folds commute. */
  def pqAdcTopK(
      spark: SparkSession, sfDir: String,
      nQueries: Int = 5, k: Int = 10,
      codebookMod: Int = 29, m: Int = 8): DataFrame =
    pqAdcTopKOn(vecs(spark, sfDir),
      Tables.rowCount(spark, sfDir, "embeddings"), nQueries, k,
      codebookMod, m)

  /** [[pqAdcTopK]] over any (vec_id, v) frame — fixture-injectable
    * (ScaleProbe's serving-cost rows). */
  def pqAdcTopKOn(
      all: DataFrame, rows: Long,
      nQueries: Int, k: Int,
      codebookMod: Int, m: Int): DataFrame = {
    val (_, centVecs) = centroidModel(all, rows, codebookMod)
    val dim = centVecs.head.size
    require(dim % m == 0, s"dim $dim must split into $m equal subspaces")
    val sub = dim / m
    val centsLit = typedlit(centVecs)
    val subsIdx = sequence(lit(0), lit(m - 1))
    // left-to-right fold of a subspace dot — the same op order as the
    // oracle's list_sum over ascending j
    def sliceDot(a: Column, b: Column, s: Column): Column =
      aggregate(
        zip_with(slice(a, s * sub + 1, lit(sub)),
          slice(b, s * sub + 1, lit(sub)), (x, y) => x * y),
        lit(0.0d), (acc, x) => acc + x)
    // codebook-only norm table, computed ONCE driver-side and embedded
    // as a literal (Catalyst does not constant-fold lambda-bearing
    // higher-order functions, so the expression form would re-derive
    // all m×C partial norms per corpus row). foldLeft ascending = the
    // same op order as sliceDot(c, c, s), so the values are
    // bit-identical to the expression form and to the oracle's
    // list_sum.
    val n2Tbl = typedlit((0 until m).map(s =>
      centVecs.map(c => c.slice(s * sub, (s + 1) * sub)
        .foldLeft(0.0d)((acc, x) => acc + x * x))))
    val corpus = all
      .withColumn("codes",
        call_function("graft_pq_codes", col("v"), centsLit, lit(m)))
      .select(col("vec_id").as("neighbor_id"), col("codes"),
        aggregate(zip_with(col("codes"), n2Tbl,
          (c, t) => element_at(t, c + 1)), lit(0.0d), (acc, x) => acc + x)
          .as("rn2"))
    val q = all.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"),
        transform(subsIdx, s =>
          transform(centsLit, c => sliceDot(col("v"), c, s))).as("tbl"),
        aggregate(col("v"), lit(0.0d), (acc, x) => acc + x * x).as("qn2"))
    val scored = corpus.join(broadcast(q),
        col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(
          aggregate(zip_with(col("codes"), col("tbl"),
            (c, t) => element_at(t, c + 1)), lit(0.0d), (acc, x) => acc + x) /
            sqrt(col("qn2") * col("rn2")), 4).as("cosine"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }

  /** s10's DuckDB twin: pqOracle's codebook + assignment, but the score
    * is the ADC decomposition — per-subspace partial dot/norm sums,
    * outer sum over `list(partial ORDER BY s)` so the fold order
    * matches the Spark side's ascending-subspace aggregate exactly. */
  val pqAdcOracle: String =
    """WITH v AS (
         SELECT vec_id,
                list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         FROM embeddings),
       cents AS (
         SELECT row_number() OVER (ORDER BY vec_id) - 1 AS ci, v
         FROM v WHERE vec_id % 29 = 0),
       ss AS (SELECT unnest(range(0, 8)) AS s),
       d2 AS (
         SELECT a.vec_id, ss.s, c.ci,
                list_sum(list_transform(range(ss.s * 8 + 1, ss.s * 8 + 9),
                  j -> (a.v[j] - c.v[j]) * (a.v[j] - c.v[j]))) AS d2
         FROM v a CROSS JOIN ss CROSS JOIN cents c),
       assign AS (
         SELECT vec_id, s, ci FROM (
           SELECT vec_id, s, ci,
                  row_number() OVER (PARTITION BY vec_id, s
                                     ORDER BY d2 ASC, ci ASC) AS rn
           FROM d2) WHERE rn = 1),
       qn AS (
         SELECT vec_id,
                list_sum(list_transform(v, x -> x * x)) AS qn2
         FROM v),
       parts AS (
         SELECT q.vec_id AS query_id, a.vec_id AS neighbor_id, a.s,
                list_sum(list_transform(range(1, 9),
                  j -> q.v[a.s * 8 + j] * c.v[a.s * 8 + j])) AS pdot,
                list_sum(list_transform(range(1, 9),
                  j -> c.v[a.s * 8 + j] * c.v[a.s * 8 + j])) AS pn2
         FROM v q
         JOIN assign a ON a.vec_id <> q.vec_id
         JOIN cents c ON c.ci = a.ci
         WHERE q.vec_id < 5),
       scored AS (
         SELECT p.query_id, p.neighbor_id,
                round(list_sum(list(p.pdot ORDER BY p.s)) /
                      sqrt(qn.qn2 * list_sum(list(p.pn2 ORDER BY p.s))),
                      4) AS cosine
         FROM parts p JOIN qn ON qn.vec_id = p.query_id
         GROUP BY p.query_id, p.neighbor_id, qn.qn2),
       ranked AS (
         SELECT query_id,
                CAST(row_number() OVER (PARTITION BY query_id
                       ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rank,
                neighbor_id, cosine
         FROM scored)
     SELECT query_id, rank, neighbor_id, cosine FROM ranked WHERE rank <= 10"""

  /** s06's DuckDB twin: same codebook sample (vec_id % 29, indexed in
    * cent_id order), same subspace L2 argmin (list_sum over ascending
    * j — the kernel's accumulation order), same reconstruction, same
    * asymmetric rounded-cosine ranking.
    *
    * The `% 29` here is HARDCODED (like s04's ivfOracle `% 23`): it
    * matches [[pqTopK]] exactly while n ≤ 29·4096 ≈ 119k rows — every
    * gate SF — because [[centroidModFor]] only switches to a larger
    * capped mod past that, where the twin would diverge. The exactness
    * claim is scoped to the uncapped regime; past it the bounded
    * plan-time collect is the property that matters and the oracle
    * would need the same capped mod inlined. */
  val pqOracle: String =
    """WITH v AS (
         SELECT vec_id,
                list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         FROM embeddings),
       cents AS (
         SELECT row_number() OVER (ORDER BY vec_id) - 1 AS ci, v
         FROM v WHERE vec_id % 29 = 0),
       ss AS (SELECT unnest(range(0, 8)) AS s),
       d2 AS (
         SELECT a.vec_id, ss.s, c.ci,
                list_sum(list_transform(range(ss.s * 8 + 1, ss.s * 8 + 9),
                  j -> (a.v[j] - c.v[j]) * (a.v[j] - c.v[j]))) AS d2
         FROM v a CROSS JOIN ss CROSS JOIN cents c),
       assign AS (
         SELECT vec_id, s, ci FROM (
           SELECT vec_id, s, ci,
                  row_number() OVER (PARTITION BY vec_id, s
                                     ORDER BY d2 ASC, ci ASC) AS rn
           FROM d2) WHERE rn = 1),
       recon AS (
         SELECT a.vec_id,
                flatten(list(c.v[a.s * 8 + 1 : a.s * 8 + 8] ORDER BY a.s))
                  AS rv
         FROM assign a JOIN cents c ON c.ci = a.ci
         GROUP BY a.vec_id),
       scored AS (
         SELECT q.vec_id AS query_id, r.vec_id AS neighbor_id,
                round(list_dot_product(q.v, r.rv) /
                      sqrt(list_sum(list_transform(q.v, x -> x * x)) *
                           list_sum(list_transform(r.rv, x -> x * x))),
                      4) AS cosine
         FROM v q JOIN recon r ON r.vec_id <> q.vec_id
         WHERE q.vec_id < 5),
       ranked AS (
         SELECT query_id,
                CAST(row_number() OVER (PARTITION BY query_id
                       ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rank,
                neighbor_id, cosine
         FROM scored)
     SELECT query_id, rank, neighbor_id, cosine FROM ranked WHERE rank <= 10"""

  /** Filtered vector search: exact top-k among corpus vectors whose
    * `label` satisfies the predicate — the retrieval shape every
    * production vector store serves ("nearest docs WHERE lang='en' AND
    * license='ok'"). Pre-filtering is the CORRECT plan on Spark: the
    * predicate pushes into the parquet scan (PushedFilters), the
    * scored set shrinks BEFORE any vector math runs, and top-k can
    * never under-fill the way post-filtering an ANN candidate list
    * does. The bucketed paths (s02/s04) compose the same way — filter
    * the corpus side before bucketing — at the cost of re-bucketing per
    * predicate; a store serving many predicates over-fetches instead
    * (k' > k then post-filter), trading recall for index reuse. */
  def filteredTopK(
      spark: SparkSession, sfDir: String,
      nQueries: Int = 5, k: Int = 10, labels: Seq[Int] = Seq(3, 7)): DataFrame = {
    val all = vecsWithLabel(spark, sfDir)
    exactTopK(all.filter(col("label").isin(labels: _*)),
      all.filter(col("vec_id") < nQueries), k, extra = Seq("label"))
  }

  val filteredOracle: String =
    """WITH v AS (
         SELECT vec_id, label,
                list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         FROM embeddings),
       scored AS (
         SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.label,
                round(list_dot_product(q.v, c.v) /
                      sqrt(list_sum(list_transform(q.v, x -> x * x)) *
                           list_sum(list_transform(c.v, x -> x * x))),
                      4) AS cosine
         FROM v q JOIN v c ON q.vec_id <> c.vec_id
         WHERE q.vec_id < 5 AND c.label IN (3, 7)),
       ranked AS (
         SELECT query_id,
                CAST(row_number() OVER (PARTITION BY query_id
                       ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rank,
                neighbor_id, label, cosine
         FROM scored)
     SELECT query_id, rank, neighbor_id, label, cosine
     FROM ranked WHERE rank <= 10"""

  /** Per-vector L2 norm — oracle-checkable vector math. */
  def norms(spark: SparkSession, sfDir: String): DataFrame =
    vecs(spark, sfDir).select(col("vec_id"),
      round(expr("sqrt(aggregate(v, 0D, (a, x) -> a + x * x))"), 3).as("l2"))

  val normsOracle: String =
    """SELECT vec_id,
              round(sqrt(list_sum(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 3) AS l2
       FROM embeddings"""

  /** s12: the d×d covariance matrix of the embedding corpus — the
    * aggregation PCA / whitening / ZCA all start from. ONE distributed
    * pass, no self-join: each row's 64×64 outer product is generated in
    * the scan projection by a double `posexplode` (row-local, no
    * shuffle), then a single partial-agg-combinable groupBy(i, j) over
    * a key space bounded by d² = 4096 — at 100 TB the shuffle carries
    * at most d² partial sums per task regardless of corpus size. Per-
    * dim means are a second d-sized agg joined back by broadcast. The
    * eigen-solve on the resulting 4096-row frame is model-sized driver
    * math by design (the [[ivfTopKTrained]] centroid-model
    * discipline). cov = E[xᵢxⱼ] − E[xᵢ]E[xⱼ], rounded 6dp AFTER the
    * identically-ordered double arithmetic in both engines (the
    * [[bruteOracle]] convention; sum-order noise ~1e-16 only). */
  def covariance(spark: SparkSession, sfDir: String): DataFrame =
    covarianceOn(vecs(spark, sfDir),
      graft.sources.Tables.rowCount(spark, sfDir, "embeddings").toDouble)

  /** [[covariance]] over any (vec_id, v: array&lt;double&gt;) frame with
    * `n` rows — fixture-injectable (spec + ScaleProbe share this exact
    * pipeline with the gate). */
  def covarianceOn(all: DataFrame, n: Double): DataFrame = {
    // barriered: sums and means both consume the first explode — one
    // scan + posexplode pass, not one per aggregate
    val e1 = Persists.barrier(all
      .select(col("v"), posexplode(col("v")).as(Seq("i", "xi"))))
    val pairs = e1.select(col("i"), col("xi"),
      posexplode(col("v")).as(Seq("j", "xj")))
    val sums = pairs.groupBy("i", "j")
      .agg(sum(col("xi") * col("xj")).as("sp"))
    val means = e1.groupBy("i").agg(sum(col("xi")).as("si"))
    sums
      .join(broadcast(means.select(col("i"), col("si"))), "i")
      .join(broadcast(means.select(col("i").as("j"), col("si").as("sj"))),
        "j")
      .select(col("i"), col("j"),
        // + 0.0 canonicalizes the zero: a tiny negative that rounds to
        // zero is -0.0 in DuckDB but +0.0 through Java's BigDecimal
        // HALF_UP, and the gate hashes the sign bit
        (round(col("sp") / n - (col("si") / n) * (col("sj") / n), 6)
          + lit(0.0)).as("cov"))
  }

  val covarianceOracle: String =
    """WITH v AS (
         SELECT vec_id,
                list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         FROM embeddings),
       nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM v),
       x AS (
         SELECT vec_id, CAST(i AS INTEGER) AS i, v.v[i + 1] AS xi
         FROM v, UNNEST(range(len(v.v))) AS u(i)),
       sums AS (
         SELECT a.i, b.i AS j, sum(a.xi * b.xi) AS sp
         FROM x a JOIN x b USING (vec_id) GROUP BY 1, 2),
       means AS (SELECT i, sum(xi) AS si FROM x GROUP BY i)
       SELECT s.i, s.j,
              round(s.sp / nn.n - (ma.si / nn.n) * (mb.si / nn.n), 6)
                + 0.0 AS cov
       FROM sums s
       JOIN means ma ON ma.i = s.i
       JOIN means mb ON mb.i = s.j, nn"""

  /** s13: Maximal-Marginal-Relevance re-rank — the serving-side
    * diversification step between ANN retrieval and the consumer:
    * greedily pick the candidate maximizing
    * `λ·sim(q,d) − (1−λ)·max_{s∈selected} sim(d,s)` so the k results
    * cover the query's neighborhood instead of k copies of its densest
    * cluster. Greedy selection is inherently sequential PER QUERY but
    * embarrassingly parallel ACROSS queries, and the candidate set is
    * the retrieval stage's bounded top-`fetchN` — so the distributed
    * shape is: one ANN/exact retrieval (any s-series entry), vectors
    * carried, then `groupByKey(query).mapGroups` doing k·fetchN·dim
    * scalar work per query. No cross-query state, no shuffle beyond
    * the retrieval's own. Deterministic (fixed iteration order, ties
    * by candidate id) but engine-specific float accumulation → rows-
    * only gate entry; MmrRerankSpec pins λ=1 ≡ plain top-k, the
    * diversification contract, and determinism. */
  def mmrRerank(spark: SparkSession, sfDir: String,
      nQueries: Int = 5, fetchN: Int = 50, k: Int = 10,
      lambda: Double = 0.7): DataFrame =
    mmrRerankOn(mmrCandidates(spark, sfDir, nQueries, fetchN), k, lambda)

  /** The λ-independent retrieval stage of [[mmrRerank]] — exposed so a
    * λ sweep ([[graft.tools.MmrSweep]]) fetches once and re-ranks
    * many times. */
  private[graft] def mmrCandidates(spark: SparkSession, sfDir: String,
      nQueries: Int = 5, fetchN: Int = 50): DataFrame = {
    val all = vecs(spark, sfDir)
    exactTopK(all, all.filter(col("vec_id") < nQueries),
      fetchN, extra = Seq("v"))
  }

  /** [[mmrRerank]]'s re-rank stage over any (query_id, neighbor_id,
    * cosine, v) candidate frame — fixture-injectable. */
  def mmrRerankOn(cands: DataFrame, k: Int, lambda: Double): DataFrame = {
    val spark = cands.sparkSession
    import spark.implicits._
    val typed = cands
      .select(col("query_id"), col("neighbor_id"), col("cosine"),
        col("v"))
      .as[(Long, Long, Double, Seq[Double])]
    typed.groupByKey(_._1).flatMapGroups { (q, it) =>
      // candidates arrive in retrieval-rank order per group; sort by
      // (cosine desc, id) anyway so the selection never depends on
      // upstream partitioning
      val cs = it.toArray.sortBy(c => (-c._3, c._2))
      def dot(a: Seq[Double], b: Seq[Double]): Double = {
        var s = 0.0; var i = 0
        while (i < a.length) { s += a(i) * b(i); i += 1 }; s
      }
      // zero-norm guard: a degenerate (all-zero) vector scores 0
      // redundancy instead of NaN — NaN would compare false against
      // every candidate and push the selection index to -1
      def cos(a: Seq[Double], b: Seq[Double]): Double = {
        val nn = dot(a, a) * dot(b, b)
        if (nn == 0.0) 0.0 else dot(a, b) / math.sqrt(nn)
      }
      // standard incremental MMR: maxRed(i) = max cosine of candidate
      // i against the selected set so far, refreshed only against the
      // newest pick — O(k·fetchN·dim), not O(k²·fetchN·dim)
      val taken = new Array[Boolean](cs.length)
      val maxRed = new Array[Double](cs.length)
      val sel = scala.collection.mutable.ArrayBuffer.empty[Int]
      while (sel.size < math.min(k, cs.length)) {
        var best = -1; var bestScore = Double.NegativeInfinity
        var i = 0
        while (i < cs.length) {
          if (!taken(i)) {
            val score = lambda * cs(i)._3 - (1.0 - lambda) * maxRed(i)
            // strict > with ascending scan = ties to the (cosine, id)-
            // first candidate: deterministic
            if (score > bestScore) { bestScore = score; best = i }
          }
          i += 1
        }
        taken(best) = true
        sel += best
        var j = 0
        while (j < cs.length) {
          if (!taken(j)) maxRed(j) =
            math.max(maxRed(j), cos(cs(j)._4, cs(best)._4))
          j += 1
        }
      }
      // cosine arrives already 4dp-rounded from the retrieval stage
      sel.iterator.zipWithIndex.map { case (i, rank) =>
        (q, rank + 1, cs(i)._2, cs(i)._3)
      }
    }.toDF("query_id", "rank", "neighbor_id", "cosine")
  }

  /** s14: one exact LLOYD ITERATION of k-means over the embedding
    * corpus — the building block of IVF training (s09 runs this loop
    * with sampled init; here the step itself is gated exactly).
    * Centroids are the k lowest-`vec_id` vectors (deterministic
    * seeding — a production k-means‖ would replace the SEED choice,
    * not the step shape). Assignment: corpus ⋈ broadcast(k centroid
    * rows) — k·n scored pairs but only k rows move to every executor,
    * never a second corpus copy; squared-L2 is one sequential
    * `aggregate(zip_with(...))` fold (codegen'd, same term order as
    * the oracle's `list_sum`), 9-dp-rounded before the argmin so both
    * engines rank the same grid; argmin via `min(struct(d, cent_id))`
    * — ties (equal 9-dp distance) break to the smaller centroid id in
    * both engines. Update: posexplode to (cent_id, dim) cells — the
    * partial agg is k·d-bounded, so the recompute never shuffles
    * vectors, only cell partials (the s12 outer-product discipline).
    * Output: (cent_id, dim, n, mean) — the new centroid matrix plus
    * cluster sizes; empty clusters vanish in both engines. */
  def kmeansStep(spark: SparkSession, sfDir: String): DataFrame =
    kmeansStepOn(vecs(spark, sfDir))

  /** [[kmeansStep]] over any (vec_id, v) frame. */
  def kmeansStepOn(corpus: DataFrame, k: Int = 8): DataFrame = {
    val c = Persists.barrier(corpus.select("vec_id", "v"))
    // the centroid artifact: k rows, broadcast — never collected
    val cents = c.orderBy("vec_id").limit(k)
      .select(col("vec_id").as("cent_id"), col("v").as("cv"))
    c.crossJoin(broadcast(cents))
      .withColumn("d", round(expr(
        "aggregate(zip_with(v, cv, (x, y) -> (x - y) * (x - y)), " +
          "0D, (acc, x) -> acc + x)"), 9))
      .groupBy("vec_id")
      .agg(min(struct(col("d"), col("cent_id"), col("v"))).as("m"))
      .select(col("m.cent_id").as("cent_id"),
        posexplode(col("m.v")).as(Seq("dim", "x")))
      .groupBy("cent_id", "dim")
      .agg(count(lit(1)).as("n"), round(avg("x"), 6).as("mean"))
  }

  /** Fixed Lloyd round count for the gated training loop — enough for
    * the movement contract to show convergence on clustered data
    * (KmeansTrainSpec) while keeping the unrolled oracle bounded. */
  val KmeansTrainRounds = 3

  /** s18: the s14 Lloyd step ITERATED to a fixed round count — the
    * training loop run as a gated operator (replacing the ungated
    * [[trainCentroids]] driver loop as the oracle-checkable form).
    * Every round re-enters from the 6-dp-rounded means exactly as
    * serialized (the hitsOn re-entry discipline: both engines compute
    * round r+1 from identical doubles), distances are 9-dp-rounded
    * pre-argmin with the (d, cent_id) tie-break, and a cell that
    * empties simply vanishes for later rounds in both engines. The
    * model never leaves the cluster: each round is one broadcast
    * cross-join against the ≤k-row centroid frame + one k·dim-bounded
    * cell partial agg — per-round cost is corpus-linear and FLAT
    * across rounds (state is k·dim, independent of r). Output after
    * round `rounds`: (cent_id, dim, n, mean) — s14's contract. */
  def kmeansTrain(spark: SparkSession, sfDir: String): DataFrame =
    kmeansTrainOn(vecs(spark, sfDir))

  /** [[kmeansTrain]] over any (vec_id, v) frame. */
  def kmeansTrainOn(corpus: DataFrame, k: Int = 8,
      rounds: Int = KmeansTrainRounds): DataFrame = {
    require(rounds >= 1, s"kmeansTrain needs rounds >= 1, got $rounds")
    val c = Persists.barrier(corpus.select("vec_id", "v"))
    var cents = c.orderBy("vec_id").limit(k)
      .select(col("vec_id").as("cent_id"), col("v").as("cv"))
    var means: DataFrame = null
    for (_ <- 1 to rounds) {
      val assigned = c.crossJoin(broadcast(cents))
        .withColumn("d", round(expr(
          "aggregate(zip_with(v, cv, (x, y) -> (x - y) * (x - y)), " +
            "0D, (acc, x) -> acc + x)"), 9))
        .groupBy("vec_id")
        .agg(min(struct(col("d"), col("cent_id"), col("v"))).as("m"))
      // barriered per round: the means feed the next round's centroid
      // rebuild AND (final round) the output — and the per-round
      // lineage nests (the loop-body rule)
      means = Persists.barrier(assigned
        .select(col("m.cent_id").as("cent_id"),
          posexplode(col("m.v")).as(Seq("dim", "x")))
        .groupBy("cent_id", "dim")
        .agg(count(lit(1)).as("n"), round(avg("x"), 6).as("mean")))
      cents = means.groupBy("cent_id").agg(
        expr("transform(array_sort(collect_list(struct(dim, mean))), " +
          "s -> s.mean)").as("cv"))
    }
    means
  }

  /** s16: one PQ CODEBOOK-TRAINING step — the s14 Lloyd iteration run
    * independently in each of `m` subspaces (the training loop behind
    * the s06/s10 codebooks, whose gate forms use a hash codebook
    * precisely because training was not yet a gated operator). The
    * vector explode to (vec_id, subspace, sub-vector) rows is one
    * narrow map; seeds are the k lowest-id vectors' sub-vectors (m·k
    * broadcast rows); assignment and update are the s14 discipline per
    * subspace — 9-dp pre-argmin grid, (d, cent_id) tie-break, m·k·(d/m)
    * bounded cell partial agg. Output: (subspace, cent_id, dim, n,
    * mean) — the new codebook matrix with per-cell occupancy. */
  def pqTrainStep(spark: SparkSession, sfDir: String): DataFrame =
    pqTrainStepOn(vecs(spark, sfDir))

  /** [[pqTrainStep]] over any (vec_id, v) frame; `dim` must divide
    * evenly into `m` subspaces. */
  def pqTrainStepOn(
      corpus: DataFrame, m: Int = 8, k: Int = 4,
      dim: Int = 64): DataFrame = {
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val w = dim / m
    val subExpr =
      s"transform(sequence(0, ${m - 1}), s -> slice(v, s * $w + 1, $w))"
    val c = Persists.barrier(corpus.select("vec_id", "v"))
    val sub = Persists.barrier(c.select(col("vec_id"),
      posexplode(expr(subExpr)).as(Seq("subspace", "sv"))))
    val seeds = c.orderBy("vec_id").limit(k)
      .select(col("vec_id").as("cent_id"),
        posexplode(expr(subExpr)).as(Seq("subspace", "cv")))
    sub.join(broadcast(seeds), "subspace")
      .withColumn("d", round(expr(
        "aggregate(zip_with(sv, cv, (x, y) -> (x - y) * (x - y)), " +
          "0D, (acc, x) -> acc + x)"), 9))
      .groupBy("vec_id", "subspace")
      .agg(min(struct(col("d"), col("cent_id"), col("sv"))).as("mm"))
      .select(col("subspace"), col("mm.cent_id").as("cent_id"),
        posexplode(col("mm.sv")).as(Seq("dim", "x")))
      .groupBy("subspace", "cent_id", "dim")
      .agg(count(lit(1)).as("n"), round(avg("x"), 6).as("mean"))
  }

  /** Fixed round count for the gated PQ-codebook training loop. */
  val PqTrainRounds = 3

  /** s21: the s16 per-subspace Lloyd step ITERATED to a fixed round
    * count — the PQ codebook trained to completion as a gated
    * operator (s18's discipline applied in each of the m subspaces):
    * every round re-enters from the 6-dp-serialized sub-centroid
    * means, 9-dp distances with the (d, cent_id) tie-break, emptied
    * cells vanish identically; the sub-vector explode happens ONCE
    * (barriered) and every round is a broadcast join against the
    * ≤ m·k-row codebook + an m·k·(d/m)-bounded cell agg — per-round
    * cost corpus-linear and flat. Output after round `rounds`:
    * (subspace, cent_id, dim, n, mean) — s16's contract. */
  def pqTrainFull(spark: SparkSession, sfDir: String): DataFrame =
    pqTrainFullOn(vecs(spark, sfDir))

  /** [[pqTrainFull]] over any (vec_id, v) frame; `dim` must divide
    * evenly into `m` subspaces. */
  def pqTrainFullOn(
      corpus: DataFrame, m: Int = 8, k: Int = 4, dim: Int = 64,
      rounds: Int = PqTrainRounds): DataFrame = {
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    require(rounds >= 1, s"pqTrainFull needs rounds >= 1, got $rounds")
    val w = dim / m
    val subExpr =
      s"transform(sequence(0, ${m - 1}), s -> slice(v, s * $w + 1, $w))"
    val c = Persists.barrier(corpus.select("vec_id", "v"))
    val sub = Persists.barrier(c.select(col("vec_id"),
      posexplode(expr(subExpr)).as(Seq("subspace", "sv"))))
    var cents = c.orderBy("vec_id").limit(k)
      .select(col("vec_id").as("cent_id"),
        posexplode(expr(subExpr)).as(Seq("subspace", "cv")))
    var means: DataFrame = null
    for (_ <- 1 to rounds) {
      val assigned = sub.join(broadcast(cents), "subspace")
        .withColumn("d", round(expr(
          "aggregate(zip_with(sv, cv, (x, y) -> (x - y) * (x - y)), " +
            "0D, (acc, x) -> acc + x)"), 9))
        .groupBy("vec_id", "subspace")
        .agg(min(struct(col("d"), col("cent_id"), col("sv"))).as("mm"))
      // barriered per round (the s18 loop-body rule)
      means = Persists.barrier(assigned
        .select(col("subspace"), col("mm.cent_id").as("cent_id"),
          posexplode(col("mm.sv")).as(Seq("dim", "x")))
        .groupBy("subspace", "cent_id", "dim")
        .agg(count(lit(1)).as("n"), round(avg("x"), 6).as("mean")))
      cents = means.groupBy("subspace", "cent_id").agg(
        expr("transform(array_sort(collect_list(struct(dim, mean))), " +
          "s -> s.mean)").as("cv"))
    }
    means
  }

  /** s22 output dimensionality (k) and the corpus dim it projects
    * from. k = 8 keeps the ±1/√k sign matrix at 512 frozen entries —
    * broadcast-sized at any corpus scale. */
  val JlOutDims = 8
  private val JlInDims = 64

  /** The frozen ±1 sign for projection cell (j, i) — ONE SQL string
    * shared verbatim by the Spark build and the DuckDB oracle (the
    * d06 portable-md5 discipline: identical text, identical hex,
    * identical signs — the model can never drift cross-engine). */
  private val jlSignSql: String =
    "CASE WHEN ascii(substr(md5(concat(j, '_', i)), 1, 1)) % 2 = 0 " +
      "THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END"

  /** s22: JOHNSON-LINDENSTRAUSS SIGN RANDOM PROJECTION — compress the
    * embedding corpus 64 → 8 dims with the ±1/√k sign matrix
    * (Achlioptas 2003: database-friendly random projections — sign
    * entries preserve pairwise distances in expectation exactly like
    * Gaussian ones, with integer-friendly arithmetic). The matrix is
    * FROZEN DATA, not code: a 512-row (j, i, sgn) DataFrame derived
    * from portable md5 parity (the t09/t18 model-as-DataFrame
    * discipline), so the gate hash-checks the projection end to end.
    * Pipeline shape: one posexplode + a broadcast join against the
    * k·d-row matrix + a (vec, j)-keyed partial agg — map-side combine
    * collapses to n·k rows before the shuffle, so at 100 TB the
    * shuffle is k/d = 1/8th of the corpus and the matrix never
    * leaves broadcast. The reduction feeds any downstream s-family
    * consumer (brute/IVF/k-means) at 8× less I/O; JlProjectionSpec
    * pins the distance-preservation contract (mean pairwise distance
    * ratio ≈ 1) plus the frozen matrix's exact +1 population.
    * Output: (vec_id, out_dim, y) at the 6-dp grid. */
  def randomProjection(spark: SparkSession, sfDir: String): DataFrame =
    randomProjectionOn(spark, vecs(spark, sfDir))

  /** [[randomProjection]] over any (vec_id, v) frame. */
  def randomProjectionOn(spark: SparkSession, corpus: DataFrame): DataFrame = {
    val r = jlMatrix(spark)
    corpus.select(col("vec_id"), posexplode(col("v")).as(Seq("i", "xi")))
      .join(broadcast(r), "i")
      .groupBy("vec_id", "j")
      .agg((round(sum(col("sgn") * col("xi")) / math.sqrt(JlOutDims), 6)
        + lit(0.0)).as("y"))
      .select(col("vec_id"), col("j").as("out_dim"), col("y"))
  }

  /** The frozen (j, i, sgn) projection matrix. */
  private[graft] def jlMatrix(spark: SparkSession): DataFrame =
    spark.range(JlOutDims).selectExpr("CAST(id AS INT) AS j")
      .crossJoin(spark.range(JlInDims).selectExpr("CAST(id AS INT) AS i"))
      .selectExpr("j", "i", s"$jlSignSql AS sgn")

  private def randomProjectionOracle: String =
    s"""WITH v AS (
         SELECT vec_id,
                list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         FROM embeddings),
       x AS (
         SELECT vec_id, CAST(u.i AS INTEGER) AS i, v.v[u.i + 1] AS xi
         FROM v, UNNEST(range(len(v.v))) AS u(i)),
       r AS (
         SELECT CAST(a.j AS INTEGER) AS j, CAST(b.i AS INTEGER) AS i,
                $jlSignSql AS sgn
         FROM UNNEST(range($JlOutDims)) AS a(j),
              UNNEST(range($JlInDims)) AS b(i))
       SELECT x.vec_id, r.j AS out_dim,
              round(sum(r.sgn * x.xi) / sqrt(CAST($JlOutDims AS DOUBLE)),
                    6) + 0.0 AS y
       FROM x JOIN r USING (i)
       GROUP BY x.vec_id, r.j"""

  /** s24: COMPRESSED-RETRIEVAL ANN SERVE — the two-stage pattern that
    * makes s22's projection a serving component: stage 1 generates
    * `fetchN` candidates per query by squared-L2 in the 8-dim
    * PROJECTED space (8× less I/O and arithmetic than s01's 64-dim
    * brute — and at full scale the projected corpus is what an IVF
    * layout like s11's would partition), stage 2 re-ranks ONLY those
    * candidates by exact cosine in the original space — s01's 4-dp
    * grid and (cosine desc, id) tie-break, so the output is directly
    * comparable to brute. The re-rank join touches nq·fetchN rows,
    * never the corpus. Fully deterministic end to end (6-dp projected
    * grid, 9-dp distance grid, exact re-rank) → hash-anchored, with
    * the oracle composing s22's projection CTEs into the two ranking
    * stages. JlProjectionSpec pins the identity contract (fetchN ≥
    * corpus ⇒ output ≡ s01 exactly) and the measured recall@10 floor
    * of the compressed first pass. */
  def projectedTopK(spark: SparkSession, sfDir: String,
      nQueries: Int = 5, fetchN: Int = 50, k: Int = 10): DataFrame =
    projectedTopKOn(spark, vecs(spark, sfDir), nQueries, fetchN, k)

  /** [[projectedTopK]] over any (vec_id, v) frame. */
  def projectedTopKOn(spark: SparkSession, corpus: DataFrame,
      nQueries: Int = 5, fetchN: Int = 50, k: Int = 10): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val all = Persists.barrier(corpus.select("vec_id", "v"))
    // projected corpus re-assembled to arrays (the s18 sorted-struct
    // transform over the s22 kernel)
    val proj = Persists.barrier(randomProjectionOn(spark, all)
      .groupBy("vec_id")
      .agg(expr("transform(array_sort(collect_list(struct(out_dim, y)))" +
        ", s -> s.y)").as("pv")))
    val q = proj.filter(col("vec_id") < nQueries)
    val cand = proj.as("c").join(broadcast(q.as("q")),
        col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("query_id"),
        col("c.vec_id").as("neighbor_id"),
        round(expr("aggregate(zip_with(q.pv, c.pv, " +
          "(x, y) -> (x - y) * (x - y)), 0D, (acc, x) -> acc + x)"), 9)
          .as("pd2"))
    val w1 = Window.partitionBy("query_id")
      .orderBy(col("pd2"), col("neighbor_id"))
    val short = cand.withColumn("rn", row_number().over(w1))
      .filter(col("rn") <= fetchN).select("query_id", "neighbor_id")
    val scored = short
      .join(all.select(col("vec_id").as("query_id"), col("v").as("qv")),
        "query_id")
      .join(all.select(col("vec_id").as("neighbor_id"),
        col("v").as("cv")), "neighbor_id")
      .select(col("query_id"), col("neighbor_id"),
        round(expr("graft_cosine(qv, cv)"), 4).as("cosine"))
    val w2 = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w2))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }

  private def projectedTopKOracle: String =
    s"""WITH v AS (
         SELECT vec_id,
                list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         FROM embeddings),
       x AS (
         SELECT vec_id, CAST(u.i AS INTEGER) AS i, v.v[u.i + 1] AS xi
         FROM v, UNNEST(range(len(v.v))) AS u(i)),
       r AS (
         SELECT CAST(a.j AS INTEGER) AS j, CAST(b.i AS INTEGER) AS i,
                $jlSignSql AS sgn
         FROM UNNEST(range($JlOutDims)) AS a(j),
              UNNEST(range($JlInDims)) AS b(i)),
       p AS (
         SELECT x.vec_id, r.j AS out_dim,
                round(sum(r.sgn * x.xi) /
                      sqrt(CAST($JlOutDims AS DOUBLE)), 6) + 0.0 AS y
         FROM x JOIN r USING (i) GROUP BY x.vec_id, r.j),
       pv AS MATERIALIZED (
         SELECT vec_id, list(y ORDER BY out_dim) AS pv
         FROM p GROUP BY vec_id),
       cand AS (
         SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                round(list_sum(list_transform(range(1, 9),
                  i -> (q.pv[i] - c.pv[i]) * (q.pv[i] - c.pv[i]))), 9)
                  AS pd2
         FROM pv q JOIN pv c ON q.vec_id < 5 AND q.vec_id <> c.vec_id),
       short AS (
         SELECT query_id, neighbor_id FROM (
           SELECT query_id, neighbor_id,
                  row_number() OVER (PARTITION BY query_id
                    ORDER BY pd2, neighbor_id) AS rn
           FROM cand) WHERE rn <= 50),
       scored AS (
         SELECT s.query_id, s.neighbor_id,
                round(list_dot_product(q.v, c.v) /
                      sqrt(list_sum(list_transform(q.v, x -> x * x)) *
                           list_sum(list_transform(c.v, x -> x * x))),
                      4) AS cosine
         FROM short s
         JOIN v q ON q.vec_id = s.query_id
         JOIN v c ON c.vec_id = s.neighbor_id),
       ranked AS (
         SELECT query_id,
                CAST(row_number() OVER (PARTITION BY query_id
                  ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rank,
                neighbor_id, cosine
         FROM scored)
       SELECT query_id, rank, neighbor_id, cosine
       FROM ranked WHERE rank <= 10"""

  /** Fixed round count for the gated power-iteration loop — on real
    * covariance spectra the Rayleigh quotient stabilizes at 6-dp well
    * within 5 rounds (PcaPowerSpec pins an exact 1-round fixpoint on
    * its rank-1 fixture). */
  val PcaPowerRounds = 5

  /** s23: TOP PRINCIPAL COMPONENT by POWER ITERATION — the eigen-step
    * PCA/whitening needs after s12's covariance, run as the fourth
    * gated training loop (s18 coarse k-means, s21 PQ codebook, t19
    * BPE; this one trains the projection): v_{r+1} =
    * normalize(C·v_r) for a fixed `rounds` from the deterministic
    * uniform unit start 1/√d. The corpus is touched ONCE (s12's
    * covariance build, barriered); every round after that is a join
    * over the d²-row covariance frame against the d-row vector — at
    * 100 TB the iteration cost does not see the corpus at all, the
    * property that makes driver-free distributed PCA viable. The
    * cross-engine float discipline is s18's re-entry rule end to end:
    * covariance enters at its 6-dp serialization, the norm scalar is
    * 9-dp-rounded (the hitsOn norm discipline), each round's vector
    * re-enters from its 6-dp grid, so both engines compute round r+1
    * from identical doubles and the gate is hash-anchored. Output:
    * (dim, component, eigenvalue) — the unit component plus its
    * 6-dp Rayleigh quotient vᵀCv. */
  def pcaPower(spark: SparkSession, sfDir: String): DataFrame =
    pcaPowerOn(vecs(spark, sfDir),
      graft.sources.Tables.rowCount(spark, sfDir, "embeddings").toDouble)

  /** [[pcaPower]] over any (vec_id, v) frame with `n` rows. */
  def pcaPowerOn(corpus: DataFrame, n: Double,
      rounds: Int = PcaPowerRounds): DataFrame = {
    require(rounds >= 1, s"pcaPower needs rounds >= 1, got $rounds")
    // localCheckpoint, not persist: each round references w TWICE
    // (norm + normalize), so an un-truncated LOGICAL plan doubles per
    // round on top of the covariance subtree and planning time
    // explodes data-size-independently (the t19/hitsOn analyzer
    // lesson — measured 44 s/run before the cut, 2 s after)
    val cov = covarianceOn(corpus, n).localCheckpoint(false)
    val dd = cov.agg(countDistinct("i").cast("double").as("d"))
    var vcur = cov.select(col("i").as("dim")).distinct()
      .crossJoin(broadcast(dd))
      .select(col("dim"),
        (round(lit(1.0) / sqrt(col("d")), 6) + lit(0.0)).as("x"))
      .localCheckpoint(false)
    for (_ <- 1 to rounds) {
      val w = cov.join(vcur.select(col("dim").as("j"), col("x")), "j")
        .groupBy("i").agg(sum(col("cov") * col("x")).as("w"))
      val nrm = w.agg(round(sqrt(sum(col("w") * col("w"))), 9).as("nrm"))
      vcur = w.crossJoin(broadcast(nrm))
        .select(col("i").as("dim"),
          (round(col("w") / col("nrm"), 6) + lit(0.0)).as("x"))
        .localCheckpoint(false)
    }
    val lam = cov
      .join(vcur.select(col("dim").as("i"), col("x").as("xi")), "i")
      .join(vcur.select(col("dim").as("j"), col("x").as("xj")), "j")
      .agg((round(sum(col("cov") * col("xi") * col("xj")), 6) + lit(0.0))
        .as("eigenvalue"))
    vcur.crossJoin(broadcast(lam))
      .select(col("dim"), col("x").as("component"), col("eigenvalue"))
  }

  private def pcaPowerOracle: String = {
    val rounds = (1 to PcaPowerRounds).map { r =>
      val p = r - 1
      s"""w$r AS (
           SELECT c.i, sum(c.cov * p.x) AS w
           FROM cov c JOIN v$p p ON p.dim = c.j GROUP BY c.i),
         nm$r AS (SELECT round(sqrt(sum(w * w)), 9) AS nrm FROM w$r),
         v$r AS MATERIALIZED (
           SELECT i AS dim, round(w / nrm, 6) + 0.0 AS x
           FROM w$r, nm$r)"""
    }.mkString(",\n")
    s"""WITH v AS (
         SELECT vec_id,
                list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         FROM embeddings),
       nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM v),
       x AS (
         SELECT vec_id, CAST(i AS INTEGER) AS i, v.v[i + 1] AS xi
         FROM v, UNNEST(range(len(v.v))) AS u(i)),
       sums AS (
         SELECT a.i, b.i AS j, sum(a.xi * b.xi) AS sp
         FROM x a JOIN x b USING (vec_id) GROUP BY 1, 2),
       means AS (SELECT i, sum(xi) AS si FROM x GROUP BY i),
       cov AS MATERIALIZED (
         SELECT s.i, s.j,
                round(s.sp / nn.n - (ma.si / nn.n) * (mb.si / nn.n), 6)
                  + 0.0 AS cov
         FROM sums s
         JOIN means ma ON ma.i = s.i
         JOIN means mb ON mb.i = s.j, nn),
       dd AS (SELECT CAST(count(DISTINCT i) AS DOUBLE) AS d FROM cov),
       v0 AS MATERIALIZED (
         SELECT DISTINCT i AS dim, round(1.0 / sqrt(dd.d), 6) + 0.0 AS x
         FROM cov, dd),
       $rounds,
       lam AS (
         SELECT round(sum(c.cov * a.x * b.x), 6) + 0.0 AS eigenvalue
         FROM cov c
         JOIN v$PcaPowerRounds a ON a.dim = c.i
         JOIN v$PcaPowerRounds b ON b.dim = c.j)
       SELECT v.dim, v.x AS component, lam.eigenvalue
       FROM v$PcaPowerRounds v, lam"""
  }

  /** s17: INT8 scalar quantization with a per-dimension reconstruction
    * -error report — the serving-compression primitive beside PQ
    * (4× smaller vectors, table-free decode): per dim, an affine
    * [min, max] → [0, 255] code grid from ONE grouped min/max pass
    * (exact SELECTIONS, no float accumulation — both engines pick
    * identical doubles), then codes and reconstructions per cell and
    * the per-dim max/mean absolute error the serving layer publishes
    * as its quality contract. All scalar arithmetic after the min/max
    * is single-rounded IEEE on identical inputs, so max_abs_err is
    * bit-identical cross-engine (9-dp serve); mean is a float sum
    * (6-dp serve). Degenerate constant dims code to 0 with error 0.
    * The exploded cell frame is d·n rows into a d-bounded stats agg
    * and a d-row broadcast back — the s12 shuffle discipline. */
  def sq8Report(spark: SparkSession, sfDir: String): DataFrame =
    sq8ReportOn(vecs(spark, sfDir))

  /** [[sq8Report]] over any (vec_id, v) frame. */
  def sq8ReportOn(corpus: DataFrame): DataFrame = {
    val ex = Persists.barrier(corpus.select(col("vec_id"),
      posexplode(col("v")).as(Seq("dim", "x"))))
    val stats = ex.groupBy("dim").agg(min("x").as("mn"), max("x").as("mx"))
    ex.join(broadcast(stats), "dim")
      .withColumn("code", when(col("mx") > col("mn"),
        least(lit(255L), floor((col("x") - col("mn")) * 255.0 /
          (col("mx") - col("mn"))))).otherwise(lit(0L)))
      .withColumn("rec",
        col("mn") + col("code") * (col("mx") - col("mn")) / 255.0)
      .groupBy("dim", "mn", "mx")
      .agg(round(max(abs(col("x") - col("rec"))), 9).as("max_abs_err"),
        round(avg(abs(col("x") - col("rec"))), 6).as("mean_abs_err"))
      .select("dim", "mn", "mx", "max_abs_err", "mean_abs_err")
  }

  // ------------------------------------------------- index evaluation
  /** s25: ANN RECALL@K EVALUATION — the measurement every serving
    * pipeline runs before swapping an index in: the approximate
    * retriever (s05's portable-LSH top-k — the deterministic twin, so
    * the WHOLE evaluation carries a DuckDB oracle) joined against the
    * exact brute truth (s01) per query, emitting (query_id, hits,
    * recall). Both sides are the already-gated operators VERBATIM, so
    * the metric can never drift from what the gates check; the
    * rows-only s02/s09/s13 entries get their recall from contract
    * specs, and this entry makes the evaluation ITSELF a gated,
    * engine-exact operator.
    *
    * Scale shape: truth is nQueries·k rows, approx is nQueries·k rows
    * — the join and agg are query-set-sized, trivially broadcastable;
    * cost is the two retrievals it measures. */
  def annRecallEval(spark: SparkSession, sfDir: String): DataFrame =
    annRecallOn(bruteForceTopK(spark, sfDir), lshTopKPortable(spark, sfDir))

  /** The recall join itself, over any (query_id, neighbor_id) truth
    * and approx frames — one definition shared by the inline gate
    * form and the artifact-served bench twin. */
  private[graft] def annRecallOn(
      truth0: DataFrame, approx0: DataFrame): DataFrame = {
    val truth = truth0.select(col("query_id"), col("neighbor_id"))
    val approx = approx0
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit"))
    truth.join(approx, Seq("query_id", "neighbor_id"), "left")
      .groupBy("query_id").agg(
        count(lit(1)).as("k"),
        sum(coalesce(col("hit"), lit(0L))).as("hits"))
      .select(col("query_id"), col("hits"),
        round(col("hits") / col("k"), 4).as("recall"))
  }

  /** The s01 exact brute truth as a stored artifact, keyed on the
    * embedding content fingerprint (the knnEdgesAllPath discipline):
    * recall evals re-run per candidate index, but the TRUTH side
    * changes only when the corpus does — at 100 TB the exact truth is
    * computed once per corpus version, never per eval. */
  def bruteTruthPath(spark: SparkSession, sfDir: String): String = {
    val n = Tables.rowCount(spark, sfDir, "embeddings")
    val fp = java.lang.Long.toHexString(Tables.fingerprint(
      spark, sfDir, "embeddings", Seq("vec_id", "embedding")))
    val dir = graft.sources.FsUtil.qualified("target/tmp/sim/brutetruth_" +
      graft.sources.FsUtil.sanitize(sfDir) + s"_n${n}_$fp")
    if (!graft.sources.FsUtil.exists(spark, dir + "/_SUCCESS"))
      bruteForceTopK(spark, sfDir).write.mode("overwrite").parquet(dir)
    dir
  }

  /** s25's eval with the truth side served from [[bruteTruthPath]]
    * (benched s25i) — the gate form runs the s01 brute join inline as
    * its oracle anchor (14.9 s of every timed run, VERDICT r11); the
    * LSH retrieval being measured is what remains. SimilarityOpsSpec
    * pins served ≡ inline. */
  def annRecallEvalFromTruth(
      spark: SparkSession, sfDir: String): DataFrame =
    annRecallOn(spark.read.parquet(bruteTruthPath(spark, sfDir)),
      lshTopKPortable(spark, sfDir))

  /** s25's DuckDB twin: the s01 and s05 oracles embedded verbatim as
    * derived tables, same left join + per-query hit count. (A `def`:
    * bruteOracle is declared later in the object, so a val here would
    * capture null at initialization.) */
  private def annRecallOracle: String =
    s"""WITH truth AS (SELECT query_id, neighbor_id
                       FROM ($bruteOracle) b),
       approx AS (SELECT query_id, neighbor_id, 1 AS hit
                  FROM ($lshPortableOracle) a)
       SELECT t.query_id,
              CAST(sum(coalesce(hit, 0)) AS BIGINT) AS hits,
              round(sum(coalesce(hit, 0)) / CAST(count(*) AS DOUBLE), 4)
                AS recall
       FROM truth t LEFT JOIN approx x
         ON t.query_id = x.query_id AND t.neighbor_id = x.neighbor_id
       GROUP BY t.query_id"""

  /** s26: EMBEDDING SHARD DRIFT — the per-dimension distribution
    * check an embedding pipeline runs between two batches (encoder
    * version bump, corpus shift) before mixing them into one index:
    * the corpus split into two shards (here by vec_id parity — a
    * production run compares batch N vs N+1), per-dimension means of
    * each shard, and the per-dim delta. A drifted encoder shows up as
    * a structured delta vector; healthy re-ingestion shows noise
    * around 0. Output (dim, mean_a, mean_b, diff), the diff computed
    * FROM the 6-dp rounded means so both engines subtract identical
    * doubles.
    *
    * Scale shape: one posexplode (corpus × dims rows, map-only) into
    * a dims-sized partial-agg'd groupBy — the s12 covariance shape
    * without the d² blow-up. */
  def embeddingDrift(spark: SparkSession, sfDir: String): DataFrame =
    embeddingDriftOn(vecs(spark, sfDir))

  /** [[embeddingDrift]] over any (vec_id, v) frame. */
  private[graft] def embeddingDriftOn(v: DataFrame): DataFrame =
    v.select((col("vec_id") % 2).as("shard"),
        posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy("dim").agg(
        round(avg(when(col("shard") === 0, col("x"))), 6).as("mean_a"),
        round(avg(when(col("shard") === 1, col("x"))), 6).as("mean_b"))
      .select(col("dim"), col("mean_a"), col("mean_b"),
        round(col("mean_a") - col("mean_b"), 6).as("diff"))

  /** s26's DuckDB twin: same parity split, same indexed explode, same
    * 6-dp means and rounded-operand delta. */
  private val embeddingDriftOracle: String =
    """WITH x AS (
         SELECT vec_id % 2 AS shard, CAST(i AS INTEGER) AS dim,
                CAST(embedding[CAST(i + 1 AS INTEGER)] AS DOUBLE) AS x
         FROM embeddings, unnest(range(0, len(embedding))) AS u(i)),
       m AS (SELECT dim,
                    round(avg(CASE WHEN shard = 0 THEN x END), 6)
                      AS mean_a,
                    round(avg(CASE WHEN shard = 1 THEN x END), 6)
                      AS mean_b
             FROM x GROUP BY dim)
       SELECT dim, mean_a, mean_b,
              round(mean_a - mean_b, 6) AS diff
       FROM m"""

  /** s27: RECIPROCAL-RANK FUSION — the standard ensemble rule for
    * combining retrievers (Cormack et al. 2009; the hybrid-search
    * fusion every production retrieval stack runs): each candidate
    * scores Σ 1/(60 + rank) over the retrievers that returned it,
    * re-ranked by (rrf desc, id). Fused here: s01's exact brute
    * retriever and s24's projected-space serve (both gated operators
    * verbatim, both oracles embedded verbatim — the s25 discipline,
    * so the FUSION algebra itself is engine-exact; a dense+sparse
    * production pair drops into the same shape). The 1/(60+r) terms
    * are exact small-rational doubles, summed pairwise and rounded
    * 6 dp before the rank so the tie-break is engine-identical.
    *
    * Scale shape: both inputs are nQueries·k-row frames; the fusion
    * join, window, and cut are query-set-sized. */
  def rrfFusion(spark: SparkSession, sfDir: String,
      kRrf: Int = 60, topK: Int = 10): DataFrame = {
    val a = bruteForceTopK(spark, sfDir)
      .select(col("query_id"), col("neighbor_id"), col("rank").as("ra"))
    val b = projectedTopK(spark, sfDir)
      .select(col("query_id"), col("neighbor_id"), col("rank").as("rb"))
    val fused = a.join(b, Seq("query_id", "neighbor_id"), "full_outer")
      .select(col("query_id"), col("neighbor_id"),
        round(
          coalesce(lit(1.0) / (lit(kRrf) + col("ra")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(kRrf) + col("rb")), lit(0.0)), 6)
          .as("rrf"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("rrf").desc, col("neighbor_id"))
    fused.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select("query_id", "rank", "neighbor_id", "rrf")
  }

  /** s27's DuckDB twin: the s01 and s24 oracles embedded verbatim,
    * same full-outer fusion, same rounded 1/(60+r) sum and rank. */
  private def rrfFusionOracle: String =
    s"""WITH a AS (SELECT query_id, neighbor_id, rank AS ra
                   FROM ($bruteOracle) x),
       b AS (SELECT query_id, neighbor_id, rank AS rb
             FROM ($projectedTopKOracle) y),
       f AS (SELECT coalesce(a.query_id, b.query_id) AS query_id,
                    coalesce(a.neighbor_id, b.neighbor_id)
                      AS neighbor_id,
                    round(coalesce(CAST(1 AS DOUBLE) / (60 + ra), 0) +
                          coalesce(CAST(1 AS DOUBLE) / (60 + rb), 0), 6)
                      AS rrf
             FROM a FULL OUTER JOIN b
               ON a.query_id = b.query_id
              AND a.neighbor_id = b.neighbor_id),
       r AS (SELECT query_id,
                    CAST(row_number() OVER (PARTITION BY query_id
                      ORDER BY rrf DESC, neighbor_id) AS INTEGER)
                      AS rank,
                    neighbor_id, rrf
             FROM f)
       SELECT query_id, rank, neighbor_id, rrf FROM r
       WHERE rank <= 10"""

  /** s28: IVF CELL-BALANCE TELEMETRY — the index-health report an
    * IVF deployment watches (cell skew is what breaks IVF latency at
    * scale: a hot cell makes every probe that hits it scan it): the
    * s04 coarse assignment (same centroid model, same argmax
    * tie-break the s04 oracle pins), per-cell population, and
    * load_factor = n·C / total (1.0 = perfectly balanced), rounded
    * 4 dp. Output (cent_id, n_vectors, load_factor) — cells-sized.
    *
    * Scale shape: one broadcast-model assignment pass + a
    * cells-sized census + a 1-row broadcast for the normalizer. */
  def ivfBalance(spark: SparkSession, sfDir: String,
      centroidMod: Int = 23): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val all = vecs(spark, sfDir)
    val rows = Tables.rowCount(spark, sfDir, "embeddings")
    val (centIds, centVecs) = centroidModel(all, rows, centroidMod)
    val idsLit = typedlit(centIds)
    val cells = Persists.barrier(all
      .withColumn("nc", nearestCents(spark, col("v"), centVecs, 1))
      .select(col("vec_id"),
        element_at(idsLit, col("nc").getItem(0) + 1).as("cent_id"))
      .groupBy("cent_id").agg(count(lit(1)).as("n_vectors")))
    val stats = cells.agg(count(lit(1)).as("ncells"),
      sum("n_vectors").as("total"))
    cells.crossJoin(broadcast(stats))
      .select(col("cent_id"), col("n_vectors"),
        round(col("n_vectors") * col("ncells") /
          col("total").cast("double"), 4).as("load_factor"))
  }

  /** s28's DuckDB twin: the s04 oracle's assignment CTEs verbatim,
    * then the census and normalizer. */
  private def ivfBalanceOracle: String =
    """WITH v AS (
         SELECT vec_id,
                list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         FROM embeddings),
       cents AS (SELECT vec_id AS cent_id, v FROM v
                 WHERE vec_id % 23 = 0),
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
       cells AS (SELECT cent_id, count(*) AS n_vectors
                 FROM assign GROUP BY cent_id),
       t AS (SELECT count(*) AS ncells, sum(n_vectors) AS total
             FROM cells)
       SELECT cent_id, n_vectors,
              round(n_vectors * ncells / CAST(total AS DOUBLE), 4)
                AS load_factor
       FROM cells, t"""

  /** The s35 delta-batch split — shared with the oracle. */
  val DeltaIngestMod = 7
  val DeltaIngestRem = 3

  /** The assignment kernel over any (vec_id, v) batch and a fixed
    * cell model — ONE definition shared by the s35 gate form, the
    * trained-model production twin, and the incremental≡full spec
    * pin. One broadcast-model codegen'd map, no shuffle. */
  private[graft] def assignBatchOn(
      spark: SparkSession, batch: DataFrame,
      centIds: Seq[Long], centVecs: Seq[Seq[Double]]): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    batch.withColumn("nc", nearestCents(spark, col("v"), centVecs, 1))
      .select(col("vec_id"),
        element_at(typedlit(centIds), col("nc").getItem(0) + 1)
          .as("cent_id"))
  }

  /** s35: INCREMENTAL IVF ASSIGNMENT — the index-maintenance step a
    * serving deployment runs per ingest batch (VERDICT r11 "what's
    * missing" #4): the NEW batch (here the `vec_id % 7 = 3` slice —
    * the d12 delta-vs-corpus discipline) is assigned into the
    * EXISTING index's cells without retraining — the model is built
    * from the BASE corpus only, so a delta vector lands where the
    * running index would route it, never where a fresh train would.
    * Gate form uses the deterministic modular model (the s04/s08
    * oracle stand-in) so the whole assignment hash-checks; the
    * trained-model twin ([[ivfAssignDeltaTrained]]) is the
    * production path, pinned incremental ≡ full by
    * IncrementalIvfSpec. Retrain is TRIGGERED, not scheduled: s28's
    * balance report feeds [[ivfRetrainNeeded]].
    *
    * Scale shape: delta-sized work — one broadcast-model map over
    * the batch; the corpus and the stored index are never rescanned
    * (the difference between per-batch maintenance being free and
    * being a full rebuild at 100 TB). */
  def ivfAssignDelta(spark: SparkSession, sfDir: String): DataFrame = {
    val all = Persists.barrier(vecs(spark, sfDir))
    val isDelta = pmod(col("vec_id"), lit(DeltaIngestMod)) ===
      DeltaIngestRem
    val rows = Tables.rowCount(spark, sfDir, "embeddings")
    val (centIds, centVecs) = centroidModel(all.filter(!isDelta), rows, 23)
    assignBatchOn(spark, all.filter(isDelta), centIds, centVecs)
  }

  /** s35's production twin (benched s35i): the delta batch assigned
    * into the STORED trained cells ([[trainedModelPath]] — the
    * artifact the serving index actually runs on), no retrain. */
  def ivfAssignDeltaTrained(spark: SparkSession, sfDir: String): DataFrame = {
    val cents = trainedCentroids(spark, sfDir)
    assignBatchOn(spark,
      vecs(spark, sfDir).filter(
        pmod(col("vec_id"), lit(DeltaIngestMod)) === DeltaIngestRem),
      0L until cents.size.toLong, cents)
  }

  /** The drift-triggered retrain decision over an s28-shaped balance
    * report (cent_id, n_vectors, load_factor): retrain when some cell
    * runs hotter than `threshold`× balanced or starves below
    * 1/threshold — the rule that turns s28 from telemetry into the
    * maintenance loop's actuator. One row:
    * (ncells, max_load, min_load, retrain). */
  def ivfRetrainNeeded(
      report: DataFrame, threshold: Double = 2.0): DataFrame =
    report.agg(count(lit(1)).as("ncells"),
        max("load_factor").as("max_load"),
        min("load_factor").as("min_load"))
      .select(col("ncells"), col("max_load"), col("min_load"),
        (col("max_load") > threshold ||
          col("min_load") < 1.0 / threshold).as("retrain"))

  /** s35's DuckDB twin: base-only modular centroids, delta-only
    * assignment, the s04 oracle's cosine-argmax tie-break verbatim.
    * `extraWhere` appends to the final filter — s52's streaming fold
    * reuses the oracle with the tombstone exclusion appended. */
  private[graft] def ivfAssignDeltaOracle(extraWhere: String = ""): String =
    s"""WITH v AS (
         SELECT vec_id,
                list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         FROM embeddings),
       cents AS (SELECT vec_id AS cent_id, v FROM v
                 WHERE vec_id % 23 = 0
                   AND vec_id % $DeltaIngestMod <> $DeltaIngestRem),
       delta AS (SELECT vec_id, v FROM v
                 WHERE vec_id % $DeltaIngestMod = $DeltaIngestRem),
       sim AS (
         SELECT d.vec_id, c.cent_id,
                list_dot_product(d.v, c.v) /
                  sqrt(list_sum(list_transform(d.v, x -> x * x)) *
                       list_sum(list_transform(c.v, x -> x * x))) AS s
         FROM delta d, cents c)
       SELECT vec_id, cent_id FROM (
         SELECT vec_id, cent_id,
                row_number() OVER (PARTITION BY vec_id
                                   ORDER BY s DESC, cent_id) AS rn
         FROM sim) WHERE rn = 1$extraWhere"""

  /** s29: MATRYOSHKA PREFIX-DIM ANN SERVE (Kusupati et al. 2022's MRL
    * serving trick, the funnel retrieval every MRL-trained embedding
    * stack runs): stage 1 scores the corpus by cosine over only the
    * FIRST `prefixDims` coordinates of the stored vector — MRL
    * embeddings front-load information, so the 16-dim prefix is a
    * usable coarse score at 25% of the flops and (with a column layout
    * storing the prefix separately) 25% of the scan bytes — and keeps
    * the top `fetchN` per query; stage 2 re-ranks ONLY those
    * candidates by full-dim exact cosine on s01's 4-dp grid and
    * (cosine desc, id) tie-break. Differs from s24 in the coarse
    * representation: NO projection model, the prefix IS the vector's
    * own leading slice, so serving needs zero extra artifacts. Coarse
    * scores rank on a 9-dp grid (s24's pd2 discipline) so the
    * candidate cut is engine-identical; fully deterministic end to
    * end → hash-anchored. MatryoshkaSpec pins the identity contract
    * (fetchN ≥ corpus ⇒ output ≡ s01) and the measured prefix-pass
    * recall@10 floor.
    *
    * Scale shape: stage 1 is the same broadcast-queries corpus scan as
    * s01 at a quarter of the arithmetic; the re-rank join touches
    * nq·fetchN rows, never the corpus — candidate frame is broadcast
    * into the corpus lookup, so no corpus shuffle anywhere. */
  def matryoshkaTopK(spark: SparkSession, sfDir: String,
      nQueries: Int = 5, prefixDims: Int = 16, fetchN: Int = 50,
      k: Int = 10): DataFrame =
    matryoshkaTopKOn(spark, vecs(spark, sfDir), nQueries, prefixDims,
      fetchN, k)

  /** [[matryoshkaTopK]] over any (vec_id, v) frame. */
  def matryoshkaTopKOn(spark: SparkSession, corpus: DataFrame,
      nQueries: Int, prefixDims: Int, fetchN: Int, k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    // referenced by the coarse pass AND both sides of the re-rank lookup
    val all = Persists.barrier(corpus.select("vec_id", "v"))
    val q = all.filter(col("vec_id") < nQueries)
    val coarse = all.as("c").join(broadcast(q.as("q")),
        col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("query_id"),
        col("c.vec_id").as("neighbor_id"),
        round(expr(s"graft_cosine(slice(q.v, 1, $prefixDims), " +
          s"slice(c.v, 1, $prefixDims))"), 9).as("pc"))
    val w1 = Window.partitionBy("query_id")
      .orderBy(col("pc").desc, col("neighbor_id"))
    val short = coarse.withColumn("rn", row_number().over(w1))
      .filter(col("rn") <= fetchN).select("query_id", "neighbor_id")
    val scored = short
      .join(all.select(col("vec_id").as("query_id"), col("v").as("qv")),
        "query_id")
      .join(all.select(col("vec_id").as("neighbor_id"),
        col("v").as("cv")), "neighbor_id")
      .select(col("query_id"), col("neighbor_id"),
        round(expr("graft_cosine(qv, cv)"), 4).as("cosine"))
    val w2 = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w2))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }

  /** s29's DuckDB twin: list_slice for the prefix, the shared cosine
    * kernel in both stages, same 9-dp coarse grid / 4-dp final grid /
    * tie-breaks. */
  private def matryoshkaOracle(nQueries: Int, prefixDims: Int,
      fetchN: Int, k: Int): String =
    s"""WITH v AS (
         SELECT vec_id,
                list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         FROM embeddings),
       coarse AS (
         SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                round(list_dot_product(list_slice(q.v, 1, $prefixDims),
                                       list_slice(c.v, 1, $prefixDims)) /
                      sqrt(list_sum(list_transform(
                             list_slice(q.v, 1, $prefixDims), x -> x * x)) *
                           list_sum(list_transform(
                             list_slice(c.v, 1, $prefixDims), x -> x * x))),
                      9) AS pc
         FROM v q, v c
         WHERE q.vec_id < $nQueries AND q.vec_id <> c.vec_id),
       short AS (
         SELECT query_id, neighbor_id FROM (
           SELECT query_id, neighbor_id,
                  row_number() OVER (PARTITION BY query_id
                    ORDER BY pc DESC, neighbor_id) AS rn
           FROM coarse) WHERE rn <= $fetchN),
       scored AS (
         SELECT s.query_id, s.neighbor_id,
                round(list_dot_product(q.v, c.v) /
                      sqrt(list_sum(list_transform(q.v, x -> x * x)) *
                           list_sum(list_transform(c.v, x -> x * x))),
                      4) AS cosine
         FROM short s
         JOIN v q ON q.vec_id = s.query_id
         JOIN v c ON c.vec_id = s.neighbor_id)
     SELECT query_id,
            CAST(row_number() OVER (PARTITION BY query_id
                   ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rank,
            neighbor_id, cosine
     FROM scored
     QUALIFY rank <= $k"""

  /** s30: FARTHEST-FIRST CENTER SEEDING (Gonzalez 1985 maxmin
    * traversal — the deterministic sibling of k-means++ D² sampling,
    * and a 2-approximation for k-center in its own right): seed with
    * the min-id vector, then k−1 rounds of "add the point farthest
    * from its nearest chosen center" (squared L2 on the s24 9-dp
    * grid; ties to the lower vec_id). This is the principled
    * initializer for s18's Lloyd iterations — s14/s18 currently seed
    * from a modular sample, which on a clustered corpus can start two
    * centers inside one cluster; maxmin provably spreads them.
    * Deterministic end to end → hash-anchored against a k-round
    * unrolled MATERIALIZED-CTE oracle (the g16 discipline). Output
    * (seq, vec_id, dist2): the selection order and each center's
    * coverage radius at selection time — the radii are the k-center
    * quality certificate (dist2 is non-increasing in seq, pinned in
    * FarthestFirstSpec).
    *
    * Scale shape: k−1 rounds, each one broadcast of the ≤k-row
    * center frame against the corpus (narrow map, no corpus
    * shuffle), a per-point min, and a 1-row TakeOrdered argmax —
    * O(k·n) distance work, the textbook bound; center frames are
    * barriered per round (the loop-body rule). Already-chosen
    * centers are anti-joined out so a degenerate all-identical
    * corpus cannot re-pick the seed. */
  def farthestFirst(spark: SparkSession, sfDir: String,
      k: Int = 8): DataFrame =
    farthestFirstOn(spark, vecs(spark, sfDir), k)

  /** [[farthestFirst]] over any (vec_id, v) frame. */
  def farthestFirstOn(spark: SparkSession, corpus: DataFrame,
      k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val all = Persists.barrier(corpus.select("vec_id", "v"))
    // Running-min maxmin traversal: the classic k-center state carry —
    // each point keeps its min distance² to the chosen set, and round
    // r only scores the ONE newest center (the old form re-scored all
    // r centers per point per round, plus a groupBy-min exchange and
    // an anti-join; min over per-center ROUNDED distances is the same
    // running least, so every pick — and the gate hash — is
    // unchanged). Per round: one narrow broadcast-map over the corpus
    // + one TakeOrdered — no shuffle at all.
    // localCheckpoint, not barrier: round r's plan references round
    // r-1's state on both sides — persist-only barriers leave the
    // logical plan nesting geometrically and analysis goes quadratic
    // (the s23/g12 lesson; measured 38 s at n=10k before the cut)
    val d2new = "round(graft_dist2(v, cv), 9)"
    val c0 = all.orderBy("vec_id").limit(1)
      .select(lit(0).as("seq"), col("vec_id"), col("v"),
        lit(0.0).as("dist2"))
      .localCheckpoint(false)
    var cents = c0
    if (k > 1) {
      var state = all
        .crossJoin(broadcast(
          c0.select(col("v").as("cv"), col("vec_id").as("cid"))))
        .select(col("vec_id"), col("v"), expr(d2new).as("best"),
          (col("vec_id") === col("cid")).as("taken"))
        .localCheckpoint(false)
      for (r <- 1 until k) {
        val next = state.filter(!col("taken"))
          .orderBy(col("best").desc, col("vec_id")).limit(1)
          .select(lit(r).as("seq"), col("vec_id"), col("v"),
            col("best").as("dist2"))
          .localCheckpoint(false)
        cents = cents.unionByName(next)
        if (r < k - 1)
          state = state
            .crossJoin(broadcast(
              next.select(col("v").as("cv"), col("vec_id").as("cid"))))
            .select(col("vec_id"), col("v"),
              least(col("best"), expr(d2new)).as("best"),
              (col("taken") || col("vec_id") === col("cid")).as("taken"))
            .localCheckpoint(false)
      }
    }
    cents.select("seq", "vec_id", "dist2")
  }

  /** s30's DuckDB twin: the same k rounds unrolled as MATERIALIZED
    * CTEs — same 9-dp distance grid, same (dist2 desc, vec_id)
    * argmax, same anti-join exclusion. */
  private def farthestFirstOracle(k: Int, dim: Int): String = {
    def centsUnion(r: Int): String =
      (0 until r).map(i => s"SELECT vec_id, v FROM c$i")
        .mkString(" UNION ALL ")
    def idsUnion(r: Int): String =
      (0 until r).map(i => s"SELECT vec_id FROM c$i")
        .mkString(" UNION ALL ")
    val rounds = (1 until k).map { r =>
      s"""m$r AS MATERIALIZED (
           SELECT p.vec_id,
                  min(round(list_sum(list_transform(range(1, ${dim + 1}),
                    i -> (p.v[i] - c.v[i]) * (p.v[i] - c.v[i]))), 9))
                    AS dist2
           FROM v p, (${centsUnion(r)}) c
           WHERE p.vec_id NOT IN (${idsUnion(r)})
           GROUP BY p.vec_id),
         c$r AS MATERIALIZED (
           SELECT $r AS seq, m.vec_id, v.v, m.dist2
           FROM (SELECT vec_id, dist2 FROM m$r
                 ORDER BY dist2 DESC, vec_id LIMIT 1) m
           JOIN v USING (vec_id))"""
    }.mkString(",\n")
    val out = (0 until k)
      .map(i => s"SELECT seq, vec_id, dist2 FROM c$i")
      .mkString(" UNION ALL ")
    s"""WITH v AS (
         SELECT vec_id,
                list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         FROM embeddings),
       c0 AS MATERIALIZED (
         SELECT 0 AS seq, vec_id, v, 0.0 AS dist2 FROM v
         WHERE vec_id = (SELECT min(vec_id) FROM v)),
       $rounds
     $out"""
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s35_ivf_assign_delta" ->
      ((s: SparkSession, d: String) => ivfAssignDelta(s, d)),
    "s30_farthest_first" ->
      ((s: SparkSession, d: String) => farthestFirst(s, d)),
    "s29_ann_matryoshka" ->
      ((s: SparkSession, d: String) => matryoshkaTopK(s, d)),
    "s27_rrf_fusion" ->
      ((s: SparkSession, d: String) => rrfFusion(s, d)),
    "s28_ivf_balance" ->
      ((s: SparkSession, d: String) => ivfBalance(s, d)),
    "s26_embedding_drift" ->
      ((s: SparkSession, d: String) => embeddingDrift(s, d)),
    "s25_ann_recall" ->
      ((s: SparkSession, d: String) => annRecallEval(s, d)),
    "s17_sq8_report" ->
      ((s: SparkSession, d: String) => sq8Report(s, d)),
    "s18_kmeans_train" ->
      ((s: SparkSession, d: String) => kmeansTrain(s, d)),
    // rows-only by design: the residual-ADC decomposition is float
    // algebra no full-fold DuckDB twin reproduces bit-for-bit;
    // IvfPqRecallSpec is the contract (recall floor + pruned plan)
    "s19_ann_ivfpq" ->
      ((s: SparkSession, d: String) => ivfPqTopK(s, d)),
    "s20_hard_negatives" ->
      ((s: SparkSession, d: String) => hardNegatives(s, d)),
    "s21_pq_train_full" ->
      ((s: SparkSession, d: String) => pqTrainFull(s, d)),
    // s23: the eigen-step after s12 — 5 power-iteration rounds on the
    // d²-row covariance, corpus touched once, 6-dp re-entry per round
    "s23_pca_power" ->
      ((s: SparkSession, d: String) => pcaPower(s, d)),
    // s22: 64→8 JL sign projection off the frozen portable-md5 matrix
    "s22_random_projection" ->
      ((s: SparkSession, d: String) => randomProjection(s, d)),
    // s24: projected-space candidates + exact re-rank — s22 serving
    "s24_ann_projected" ->
      ((s: SparkSession, d: String) => projectedTopK(s, d)),
    "s16_pq_train" ->
      ((s: SparkSession, d: String) => pqTrainStep(s, d)),
    "s14_kmeans_step" ->
      ((s: SparkSession, d: String) => kmeansStep(s, d)),
    "s13_mmr_rerank" ->
      ((s: SparkSession, d: String) => mmrRerank(s, d)),
    "s12_embedding_covariance" ->
      ((s: SparkSession, d: String) => covariance(s, d)),
    "s01_ann_brute" -> ((s: SparkSession, d: String) => bruteForceTopK(s, d)),
    "s31_rocchio_feedback" -> ((s: SparkSession, d: String) =>
      rocchioTopK(s, d)),
    "s02_ann_lsh" -> ((s: SparkSession, d: String) => lshTopK(s, d)),
    "s03_vector_norms" -> (norms _),
    "s04_ann_ivf" -> ((s: SparkSession, d: String) => ivfTopK(s, d)),
    "s32_ann_ivf_filtered" -> ((s: SparkSession, d: String) =>
      ivfTopKFiltered(s, d)),
    "s33_knn_classifier" -> ((s: SparkSession, d: String) =>
      knnClassifierEval(s, d)),
    "s34_ann_graph_beam" -> ((s: SparkSession, d: String) =>
      graphBeamAnn(s, d)),
    "s36_ann_graph_beam_multi" -> ((s: SparkSession, d: String) =>
      graphBeamAnnMulti(s, d)),
    "s37_ann_graph_beam_delta" -> ((s: SparkSession, d: String) =>
      graphBeamDeltaInsert(s, d)),
    // rows-only by design: the batched 2-hop walk over the STORED
    // 1∪2-hop artifact — no SQL twin unrolls 3 rounds over e∪e²;
    // GraphBeamSpec pins served ≡ inline batched AND the aggregate
    // recall contract vs the classic walk (EXPERIMENT_r15 §6)
    "s38_ann_graph_beam_stored" -> ((s: SparkSession, d: String) =>
      graphBeamAnnBatchedServed(s, d)),
    "s39_ann_beam_tombstoned" -> ((s: SparkSession, d: String) =>
      graphBeamAnnTombstonedServed(s, d)),
    "s40_ann_beam_compacted" -> ((s: SparkSession, d: String) =>
      graphBeamAnnCompactedServed(s, d)),
    "s41_ann_ivf_tombstoned" -> ((s: SparkSession, d: String) =>
      ivfTopKTombstoned(s, d)),
    "s42_ann_compaction_trigger" -> ((s: SparkSession, d: String) =>
      annCompactionNeeded(s, d)),
    "s43_ann_beam_served_auto" -> ((s: SparkSession, d: String) =>
      graphBeamAnnServed(s, d)),
    // rows-only by design (the batched walk has no SQL twin); the
    // compose/identity contracts live in AnnTombstoneSpec and
    // GraphBeamSpec — s44 = s38's surviving rows re-ranked exactly,
    // s45's maintained 2-hop frame = the from-scratch rebuild exactly
    "s44_ann_beam_batched_tomb" -> ((s: SparkSession, d: String) =>
      graphBeamAnnBatchedTombstoned(s, d)),
    "s45_ann_beam_delta_batched" -> ((s: SparkSession, d: String) =>
      graphBeamDeltaBatchedServed(s, d)),
    "s46_ann_maintenance_trigger" -> ((s: SparkSession, d: String) =>
      annMaintenanceNeeded(s, d)),
    // rows-only by design (the batched walk has no SQL twin); the
    // lifecycle contracts live in AnnLifecycleSpec — s47 = s45's
    // surviving rows exactly (result-stage exclusion, routing
    // untouched) and the insert∩takedown ids never surface; s48's
    // dispatch pins the s47 branch at gate dials and the rebuild
    // branch under a forced threshold
    "s47_ann_beam_lifecycle" -> ((s: SparkSession, d: String) =>
      graphBeamLifecycleServed(s, d)),
    "s48_ann_beam_lifecycle_auto" -> ((s: SparkSession, d: String) =>
      graphBeamAnnLifecycleAuto(s, d)),
    "s50_ann_beam_delta_capped" -> ((s: SparkSession, d: String) =>
      graphBeamDeltaCappedServed(s, d)),
    "s53_ann_beam_maint_served" -> ((s: SparkSession, d: String) =>
      graphBeamDeltaMaintainedServed(s, d)),
    // rows-only by design (the report reads filesystem state DuckDB
    // cannot see); IndexVacuumSpec pins supersession, safety, and
    // idempotence. The artifact build guarantees ≥1 row.
    "s54_index_vacuum_report" -> ((s: SparkSession, d: String) => {
      beamBaseEdgesPath(s, d)
      graft.sources.IndexVacuum.report(s)
    }),
    "s08_ann_ivf_multiprobe" ->
      ((s: SparkSession, d: String) => ivfTopK(s, d, nprobe = MultiProbe)),
    "s09_ann_ivf_trained" ->
      ((s: SparkSession, d: String) => ivfTopKTrained(s, d)),
    "s05_ann_lsh_portable" ->
      ((s: SparkSession, d: String) => lshTopKPortable(s, d)),
    "s06_ann_pq" -> ((s: SparkSession, d: String) => pqTopK(s, d)),
    "s07_ann_filtered" -> ((s: SparkSession, d: String) => filteredTopK(s, d)),
    "s10_ann_pq_adc" -> ((s: SparkSession, d: String) => pqAdcTopK(s, d)),
    "s11_ann_ivf_partitioned" ->
      ((s: SparkSession, d: String) => ivfTopKPartitioned(s, d))
  )

  /** Brute-force top-k is fully deterministic, so it oracle-checks: the
    * cosine formula below is term-for-term the graft_cosine kernel
    * (sequential dot / sqrt(nx*ny), float→double casts first) and the
    * rank is assigned over the ROUNDED cosine with the same neighbor_id
    * tie-break — both engines fold arrays left-to-right, so the doubles
    * agree bit-for-bit before round(,4). */
  val bruteOracle: String =
    """WITH v AS (
         SELECT vec_id,
                list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         FROM embeddings),
       scored AS (
         SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                round(list_dot_product(q.v, c.v) /
                      sqrt(list_sum(list_transform(q.v, x -> x * x)) *
                           list_sum(list_transform(c.v, x -> x * x))),
                      4) AS cosine
         FROM v q, v c
         WHERE q.vec_id < 5 AND q.vec_id <> c.vec_id),
       ranked AS (
         SELECT query_id,
                CAST(row_number() OVER (PARTITION BY query_id
                       ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rank,
                neighbor_id, cosine
         FROM scored)
     SELECT query_id, rank, neighbor_id, cosine FROM ranked WHERE rank <= 10"""

  /** s04/s08 are deterministic end-to-end (centroids are a modular
    * sample, no fitted model), so they oracle-check: the DuckDB twin
    * rebuilds the same Voronoi assignment (argmax UNROUNDED cosine,
    * ties to the lower cent_id — the graft_nearest_cents tie-break,
    * since the centroid array is sorted by cent_id), the same `nprobe`
    * probe cells (generated from the SAME parameter the Spark side
    * runs at), and the same rounded-cosine candidate ranking. Cosine
    * is term-for-term the shared kernel (see bruteOracle), so the
    * unrounded assignment comparison agrees bit-for-bit across
    * engines. */
  def ivfOracle(nprobe: Int, labelFilter: Option[Int] = None,
      excludeMod: Option[Int] = None): String = {
    val extraJoin = labelFilter.map(l =>
      s"JOIN embeddings e ON e.vec_id = a.vec_id AND e.label = $l")
      .getOrElse("") +
      // tombstoned candidates drop before ranking; the centroid
      // model (the % 23 sample) stays frozen — takedown never retrains
      excludeMod.map(m => s" WHERE a.vec_id % $m <> 0").getOrElse("")
    s"""WITH v AS (
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
       probes AS (
         SELECT vec_id AS query_id, cent_id FROM (
           SELECT vec_id, cent_id,
                  row_number() OVER (PARTITION BY vec_id
                                     ORDER BY s DESC, cent_id) AS rn
           FROM sim WHERE vec_id < 5) WHERE rn <= $nprobe),
       cand AS (
         SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id
         FROM probes p JOIN assign a
           ON a.cent_id = p.cent_id AND a.vec_id <> p.query_id
         $extraJoin),
       scored AS (
         SELECT c.query_id, c.neighbor_id,
                round(list_dot_product(q.v, n.v) /
                      sqrt(list_sum(list_transform(q.v, x -> x * x)) *
                           list_sum(list_transform(n.v, x -> x * x))),
                      4) AS cosine
         FROM cand c
         JOIN v q ON q.vec_id = c.query_id
         JOIN v n ON n.vec_id = c.neighbor_id),
       ranked AS (
         SELECT query_id,
                CAST(row_number() OVER (PARTITION BY query_id
                       ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rank,
                neighbor_id, cosine
         FROM scored)
     SELECT query_id, rank, neighbor_id, cosine FROM ranked WHERE rank <= 10"""
  }

  /** The s34/s36 unrolled beam-walk CTE chain: `steps` rounds of
    * candidates (frontier ∪ out-neighbors), 4-dp cosine scores, and
    * the per-(query, entry) top-`beam` trim — entry-set-agnostic
    * (each entry is an independent branch, mirroring [[beamWalk]]),
    * expects `e2`, `q`, and `f0 (query_id, entry, node)` upstream. */
  private def beamStepBlocks(steps: Int, beam: Int): String =
    (1 to steps).map { i =>
      s"""c$i AS MATERIALIZED (
           SELECT DISTINCT query_id, entry, node FROM (
             SELECT query_id, entry, node FROM f${i - 1}
             UNION ALL
             SELECT f.query_id, f.entry, e.dst AS node
             FROM f${i - 1} f JOIN e2 e ON e.src = f.node)),
         s$i AS MATERIALIZED (
           SELECT c.query_id, c.entry, c.node,
                  round(list_dot_product(q.qv, n.v) /
                        sqrt(list_sum(list_transform(q.qv, x -> x * x)) *
                             list_sum(list_transform(n.v, x -> x * x))),
                        4) AS cosine
           FROM c$i c
           JOIN q ON q.query_id = c.query_id
           JOIN v n ON n.vec_id = c.node),
         f$i AS MATERIALIZED (
           SELECT query_id, entry, node, cosine FROM (
             SELECT *, row_number() OVER (PARTITION BY query_id, entry
               ORDER BY cosine DESC, node) AS rk
             FROM s$i) WHERE rk <= $beam)"""
    }.mkString(",\n")

  /** The s36 multi-entry beam-walk oracle, parameterized for the
    * tombstone family: `vWhere` filters the CORPUS the kNN graph,
    * maxmin seeds, and candidate fetches are built over (the s40
    * compaction rebuild over takedown survivors); `finalExclude`
    * filters only the final result rows (s39 merge-on-read: deleted
    * nodes still route, never surface). Queries always come from the
    * FULL corpus (`vall`) — they are external input, and a deleted
    * vector can still arrive as a query. s36 is the
    * (no-filter, no-exclude) instance. */
  private def multiBeamOracle(vWhere: String, finalExclude: String): String = {
    val ents = 4
    val ffRounds = (1 until ents).map { r =>
      val centsUnion = (0 until r)
        .map(i => s"SELECT vec_id, v FROM ec$i").mkString(" UNION ALL ")
      val idsUnion = (0 until r)
        .map(i => s"SELECT vec_id FROM ec$i").mkString(" UNION ALL ")
      s"""em$r AS MATERIALIZED (
           SELECT p.vec_id,
                  min(round(list_sum(list_transform(range(1, 65),
                    i -> (p.v[i] - c.v[i]) * (p.v[i] - c.v[i]))), 9))
                    AS dist2
           FROM v p, ($centsUnion) c
           WHERE p.vec_id NOT IN ($idsUnion)
           GROUP BY p.vec_id),
         ec$r AS MATERIALIZED (
           SELECT m.vec_id, v.v
           FROM (SELECT vec_id FROM em$r
                 ORDER BY dist2 DESC, vec_id LIMIT 1) m
           JOIN v ON v.vec_id = m.vec_id)"""
    }.mkString(",\n")
    val entUnion = "SELECT DISTINCT node FROM (" +
      ("SELECT min(src) AS node FROM e2" +: (0 until ents)
        .map(i => s"SELECT vec_id AS node FROM ec$i"))
        .mkString(" UNION ALL ") + ")"
    s"""WITH ${GraphOps.knnEdgeCtes(None, vWhere)},
         vall AS (
           SELECT vec_id,
                  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         e2 AS (SELECT a AS src, b AS dst FROM mutual
                UNION ALL SELECT b, a FROM mutual),
         ec0 AS MATERIALIZED (
           SELECT vec_id, v FROM v ORDER BY vec_id LIMIT 1),
         $ffRounds,
         ent AS ($entUnion),
         q AS (SELECT vec_id AS query_id, v AS qv
               FROM vall WHERE vec_id < 5),
         f0 AS (SELECT q.query_id, ent.node AS entry, ent.node
                FROM q, ent),
         ${beamStepBlocks(6, 8)}
       SELECT query_id,
              CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY cosine DESC, node) AS INTEGER) AS rank,
              node AS neighbor_id, cosine
       FROM (SELECT DISTINCT query_id, node, cosine FROM f6
             WHERE node <> query_id$finalExclude)
       QUALIFY rank <= 5"""
  }

  def oracleSql: Map[String, String] = Map(
    "s35_ivf_assign_delta" -> ivfAssignDeltaOracle(),
    "s30_farthest_first" -> farthestFirstOracle(8, 64),
    "s29_ann_matryoshka" -> matryoshkaOracle(5, 16, 50, 10),
    "s27_rrf_fusion" -> rrfFusionOracle,
    "s28_ivf_balance" -> ivfBalanceOracle,
    "s26_embedding_drift" -> embeddingDriftOracle,
    "s25_ann_recall" -> annRecallOracle,
    "s12_embedding_covariance" -> covarianceOracle,
    "s01_ann_brute" -> bruteOracle,
    // s31: round-1 brute ranks, the same rank-ordered explicit 5-term
    // feedback mean on the 8-dp grid, round-2 brute ranks with the
    // moved query — term-for-term the Spark expression order
    "s31_rocchio_feedback" ->
      """WITH v AS (
           SELECT vec_id,
                  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         scored1 AS (
           SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                  round(list_dot_product(q.v, c.v) /
                        sqrt(list_sum(list_transform(q.v, x -> x * x)) *
                             list_sum(list_transform(c.v, x -> x * x))),
                        4) AS cosine
           FROM v q, v c
           WHERE q.vec_id < 5 AND q.vec_id <> c.vec_id),
         r1 AS (
           SELECT query_id, neighbor_id,
                  row_number() OVER (PARTITION BY query_id
                    ORDER BY cosine DESC, neighbor_id) AS rank
           FROM scored1),
         fbv AS (
           SELECT r.query_id, list(c.v ORDER BY r.rank) AS lvs
           FROM r1 r JOIN v c ON c.vec_id = r.neighbor_id
           WHERE r.rank <= 5 GROUP BY r.query_id),
         e AS (
           SELECT q.vec_id AS query_id,
                  list_transform(range(1, len(q.v) + 1), i -> round(
                    1.0 * q.v[i] + 0.75 * (
                      (f.lvs[1][i] + f.lvs[2][i] + f.lvs[3][i] +
                       f.lvs[4][i] + f.lvs[5][i]) / 5.0), 8)) AS v
           FROM v q JOIN fbv f ON f.query_id = q.vec_id),
         scored2 AS (
           SELECT e.query_id, c.vec_id AS neighbor_id,
                  round(list_dot_product(e.v, c.v) /
                        sqrt(list_sum(list_transform(e.v, x -> x * x)) *
                             list_sum(list_transform(c.v, x -> x * x))),
                        4) AS cosine
           FROM e, v c WHERE e.query_id <> c.vec_id),
         ranked AS (
           SELECT query_id,
                  CAST(row_number() OVER (PARTITION BY query_id
                    ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rank,
                  neighbor_id, cosine
           FROM scored2)
       SELECT query_id, rank, neighbor_id, cosine
       FROM ranked WHERE rank <= 10""",
    // s20: s01's oracle with the duplicate band excluded BETWEEN
    // scoring and ranking (rank 1 = hardest valid negative)
    "s20_hard_negatives" ->
      """WITH v AS (
           SELECT vec_id,
                  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         scored AS (
           SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                  round(list_dot_product(q.v, c.v) /
                        sqrt(list_sum(list_transform(q.v, x -> x * x)) *
                             list_sum(list_transform(c.v, x -> x * x))),
                        4) AS cosine
           FROM v q, v c
           WHERE q.vec_id < 5 AND q.vec_id <> c.vec_id),
         ranked AS (
           SELECT query_id,
                  CAST(row_number() OVER (PARTITION BY query_id
                         ORDER BY cosine DESC, neighbor_id) AS INTEGER)
                    AS rank,
                  neighbor_id, cosine
           FROM scored WHERE cosine < 0.33)
       SELECT query_id, rank, neighbor_id, cosine
       FROM ranked WHERE rank <= 10""",
    // s17: the same exact min/max selections, the same single-rounded
    // affine code/reconstruct arithmetic, 9-dp max / 6-dp mean serve
    "s17_sq8_report" ->
      """WITH v AS (SELECT vec_id,
                           list_transform(embedding,
                             x -> CAST(x AS DOUBLE)) AS v
                    FROM embeddings),
          ex AS (SELECT vec_id, CAST(d.dim AS INTEGER) AS dim,
                        v.v[CAST(d.dim + 1 AS INTEGER)] AS x
                 FROM v CROSS JOIN
                   (SELECT unnest(range(0, 64)) AS dim) d),
          st AS (SELECT dim, min(x) AS mn, max(x) AS mx
                 FROM ex GROUP BY dim),
          c AS (SELECT ex.dim, ex.x, st.mn, st.mx,
                       CASE WHEN st.mx > st.mn
                            THEN least(255, CAST(floor((ex.x - st.mn) *
                                   255.0 / (st.mx - st.mn)) AS BIGINT))
                            ELSE 0 END AS code
                FROM ex JOIN st USING (dim)),
          r AS (SELECT dim, mn, mx, x,
                       mn + code * (mx - mn) / 255.0 AS rec
                FROM c)
        SELECT dim, mn, mx,
               round(max(abs(x - rec)), 9) AS max_abs_err,
               round(avg(abs(x - rec)), 6) AS mean_abs_err
        FROM r GROUP BY dim, mn, mx""",
    // s16: the s14 mirror per subspace — 1-based slices sv = v[8s+1 ..
    // 8s+8], seeds from the 4 lowest ids, same 9-dp grid/tie-break,
    // subspace and dim cast to INTEGER (Spark posexplode emits int)
    // s21: s16's round unrolled PqTrainRounds times — the s18 oracle
    // pattern per subspace; round-r sub-centroids rebuilt from the
    // 6-dp means via list(mean ORDER BY dim)
    "s21_pq_train_full" -> {
      val rounds = (1 to PqTrainRounds).map { r =>
        s"""d$r AS (SELECT sub.vec_id, sub.subspace, c.cent_id, sub.sv,
                 round(list_sum(list_transform(range(1, 9),
                   i -> (sub.sv[i] - c.cv[i]) *
                        (sub.sv[i] - c.cv[i]))), 9) AS d
               FROM sub JOIN c${r - 1} c USING (subspace)),
           a$r AS (SELECT vec_id, subspace, cent_id, sv,
                 row_number() OVER (PARTITION BY vec_id, subspace
                                    ORDER BY d, cent_id) AS rn
               FROM d$r),
           m$r AS MATERIALIZED (
             SELECT subspace, cent_id, CAST(dims.dim AS INTEGER) AS dim,
                    count(*) AS n, round(avg(a.sv[dims.dim + 1]), 6)
                      AS mean
             FROM (SELECT subspace, cent_id, sv FROM a$r WHERE rn = 1) a
             CROSS JOIN (SELECT unnest(range(0, 8)) AS dim) dims
             GROUP BY subspace, cent_id, dims.dim),
           c$r AS MATERIALIZED (
             SELECT subspace, cent_id, list(mean ORDER BY dim) AS cv
             FROM m$r GROUP BY subspace, cent_id)"""
      }.mkString(",\n")
      s"""WITH v AS MATERIALIZED (
           SELECT vec_id,
                  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         sub AS MATERIALIZED (
           SELECT vec_id, CAST(s.s AS INTEGER) AS subspace,
                  v.v[CAST(s.s * 8 + 1 AS INTEGER):
                      CAST(s.s * 8 + 8 AS INTEGER)] AS sv
           FROM v CROSS JOIN (SELECT unnest(range(0, 8)) AS s) s),
         c0 AS MATERIALIZED (
           SELECT vec_id AS cent_id, subspace, sv AS cv
           FROM sub
           WHERE vec_id IN (SELECT vec_id FROM v
                            ORDER BY vec_id LIMIT 4)),
         $rounds
         SELECT subspace, cent_id, dim, n, mean
         FROM m$PqTrainRounds"""
    },
    // s23: the s12 covariance CTEs feeding PcaPowerRounds unrolled
    // matvec+normalize rounds — 9-dp norm scalar, 6-dp vector
    // re-entry per round, Rayleigh quotient off the final vector
    "s23_pca_power" -> pcaPowerOracle,
    // s22: the sign matrix rebuilt from the SAME md5-parity SQL text
    "s22_random_projection" -> randomProjectionOracle,
    // s24: the s22 CTEs composed into candidate-gen + exact re-rank
    "s24_ann_projected" -> projectedTopKOracle,
    "s16_pq_train" ->
      """WITH v AS (SELECT vec_id,
                           list_transform(embedding,
                             x -> CAST(x AS DOUBLE)) AS v
                    FROM embeddings),
          sub AS (SELECT vec_id, CAST(s.s AS INTEGER) AS subspace,
                         v.v[CAST(s.s * 8 + 1 AS INTEGER):
                             CAST(s.s * 8 + 8 AS INTEGER)] AS sv
                  FROM v CROSS JOIN
                    (SELECT unnest(range(0, 8)) AS s) s),
          seeds AS (SELECT vec_id AS cent_id, subspace, sv AS cv
                    FROM sub
                    WHERE vec_id IN (SELECT vec_id FROM v
                                     ORDER BY vec_id LIMIT 4)),
          d AS (SELECT sub.vec_id, sub.subspace, seeds.cent_id, sub.sv,
                       round(list_sum(list_transform(range(1, 9),
                         i -> (sub.sv[i] - seeds.cv[i]) *
                              (sub.sv[i] - seeds.cv[i]))), 9) AS d
                FROM sub JOIN seeds USING (subspace)),
          a AS (SELECT vec_id, subspace, cent_id, sv,
                       row_number() OVER (PARTITION BY vec_id, subspace
                                          ORDER BY d, cent_id) AS rn
                FROM d),
          ex AS (SELECT subspace, cent_id,
                        CAST(dims.dim AS INTEGER) AS dim,
                        a.sv[dims.dim + 1] AS x
                 FROM (SELECT subspace, cent_id, sv FROM a
                       WHERE rn = 1) a
                 CROSS JOIN (SELECT unnest(range(0, 8)) AS dim) dims)
        SELECT subspace, cent_id, dim, count(*) AS n,
               round(avg(x), 6) AS mean
        FROM ex GROUP BY subspace, cent_id, dim""",
    // s14: the same double-cast vectors, the same ordered squared-L2
    // fold (list_sum over ascending dims ≡ the sequential aggregate
    // fold), the same 9-dp pre-argmin grid and (d, cent_id) tie-break,
    // the same 6-dp mean serve; dim is 0-based in both engines
    // s18: s14's round unrolled KmeansTrainRounds times — every CTE
    // that later rounds re-read is MATERIALIZED (the g16 lesson);
    // round r's cent table is rebuilt from round r-1's 6-dp means
    // (list(mean ORDER BY dim) ≡ Spark's sorted-struct transform), so
    // both engines re-enter each round from identical doubles
    "s18_kmeans_train" -> {
      val rounds = (1 to KmeansTrainRounds).map { r =>
        s"""d$r AS (SELECT v.vec_id, c.cent_id, v.v,
                 round(list_sum(list_transform(range(1, 65),
                   i -> (v.v[i] - c.cv[i]) * (v.v[i] - c.cv[i]))), 9) AS d
               FROM v CROSS JOIN c${r - 1} c),
           a$r AS (SELECT vec_id, cent_id, v,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY d, cent_id) AS rn
               FROM d$r),
           m$r AS MATERIALIZED (
             SELECT cent_id, CAST(dims.dim AS INTEGER) AS dim,
                    count(*) AS n, round(avg(a.v[dims.dim + 1]), 6) AS mean
             FROM (SELECT cent_id, v FROM a$r WHERE rn = 1) a
             CROSS JOIN (SELECT unnest(range(0, 64)) AS dim) dims
             GROUP BY cent_id, dims.dim),
           c$r AS MATERIALIZED (
             SELECT cent_id, list(mean ORDER BY dim) AS cv
             FROM m$r GROUP BY cent_id)"""
      }.mkString(",\n")
      s"""WITH v AS MATERIALIZED (
           SELECT vec_id,
                  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         c0 AS MATERIALIZED (
           SELECT vec_id AS cent_id, v AS cv
           FROM v ORDER BY vec_id LIMIT 8),
         $rounds
         SELECT cent_id, dim, n, mean FROM m$KmeansTrainRounds"""
    },
    "s14_kmeans_step" ->
      """WITH v AS (SELECT vec_id,
                           list_transform(embedding,
                             x -> CAST(x AS DOUBLE)) AS v
                    FROM embeddings),
          cent AS (SELECT vec_id AS cent_id, v AS cv
                   FROM v ORDER BY vec_id LIMIT 8),
          d AS (SELECT v.vec_id, cent.cent_id, v.v,
                       round(list_sum(list_transform(range(1, 65),
                         i -> (v.v[i] - cent.cv[i]) *
                              (v.v[i] - cent.cv[i]))), 9) AS d
                FROM v CROSS JOIN cent),
          a AS (SELECT vec_id, cent_id, v,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY d, cent_id) AS rn
                FROM d),
          ex AS (SELECT cent_id, CAST(dims.dim AS INTEGER) AS dim,
                        a.v[dims.dim + 1] AS x
                 FROM (SELECT cent_id, v FROM a WHERE rn = 1) a
                 CROSS JOIN (SELECT unnest(range(0, 64)) AS dim) dims)
        SELECT cent_id, dim, count(*) AS n, round(avg(x), 6) AS mean
        FROM ex GROUP BY cent_id, dim""",
    "s03_vector_norms" -> normsOracle,
    "s04_ann_ivf" -> ivfOracle(2),
    // s32: the s04 oracle with the label predicate joined into the
    // probed-candidate set — filter-before-score, queries unfiltered
    "s32_ann_ivf_filtered" -> ivfOracle(4, labelFilter = Some(1)),
    // s34: the shared kNN CTEs, the same single entry vertex, and the
    // 6 unrolled beam steps — candidates, 4-dp scores, top-8 — then
    // the self-excluded top-5
    "s34_ann_graph_beam" ->
      s"""WITH ${GraphOps.knnEdgeCtes(None)},
           e2 AS (SELECT a AS src, b AS dst FROM mutual
                  UNION ALL SELECT b, a FROM mutual),
           ent AS (SELECT min(src) AS node FROM e2),
           q AS (SELECT vec_id AS query_id, v AS qv
                 FROM v WHERE vec_id < 5),
           f0 AS (SELECT q.query_id, ent.node AS entry, ent.node
                  FROM q, ent),
           ${beamStepBlocks(6, 8)}
         SELECT query_id,
                CAST(row_number() OVER (PARTITION BY query_id
                  ORDER BY cosine DESC, node) AS INTEGER) AS rank,
                node AS neighbor_id, cosine
         FROM (SELECT DISTINCT query_id, node, cosine FROM f6
               WHERE node <> query_id)
         QUALIFY rank <= 5""",
    // s36: s34's unrolled walk prefixed with s30's unrolled maxmin
    // rounds — the entry set is the only change
    "s36_ann_graph_beam_multi" -> multiBeamOracle("", ""),
    // s39: the s36 walk with tombstoned nodes excluded between the
    // final DISTINCT and the rank — deleted nodes route, never
    // surface (the Spark side's anti-join lands at the same point)
    "s39_ann_beam_tombstoned" ->
      multiBeamOracle("", s" AND node % $TombstoneMod <> 0"),
    // s40: the s36 walk with the kNN CTEs REBUILT over takedown
    // survivors (queries stay full-corpus — they are external input)
    "s40_ann_beam_compacted" ->
      multiBeamOracle(s" WHERE vec_id % $TombstoneMod <> 0", ""),
    // s41: the s04 oracle with tombstoned candidates dropped (the
    // frozen centroid model keeps its vec_id % 23 sample — takedown
    // never retrains)
    "s41_ann_ivf_tombstoned" -> ivfOracle(2, excludeMod = Some(TombstoneMod)),
    // s43: at 1/41 tombstoned the 10% default routes to merge-on-read
    // — s39's oracle verbatim (the dispatch itself is the operator)
    "s43_ann_beam_served_auto" ->
      multiBeamOracle("", s" AND node % $TombstoneMod <> 0"),
    "s42_ann_compaction_trigger" ->
      s"""SELECT CAST(count(*) AS BIGINT) AS n_vectors,
                 CAST(sum(CASE WHEN vec_id % $TombstoneMod = 0
                               THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_tombstoned,
                 round(sum(CASE WHEN vec_id % $TombstoneMod = 0
                               THEN 1 ELSE 0 END) * 1.0 / count(*), 4)
                   AS tombstone_frac,
                 (sum(CASE WHEN vec_id % $TombstoneMod = 0
                           THEN 1 ELSE 0 END) * 1.0 / count(*)) > 0.1
                   AS compact
          FROM embeddings""",
    // s46: both shares from their predicates, the rebuild > compact >
    // serve precedence as one CASE — the decision row is pure
    // relational algebra, so the gate pins it exactly
    "s46_ann_maintenance_trigger" ->
      s"""SELECT CAST(count(*) AS BIGINT) AS n_vectors,
                 CAST(sum(CASE WHEN vec_id % $DeltaIngestMod =
                                    $DeltaIngestRem
                               THEN 1 ELSE 0 END) AS BIGINT) AS n_delta,
                 round(sum(CASE WHEN vec_id % $DeltaIngestMod =
                                     $DeltaIngestRem
                               THEN 1 ELSE 0 END) * 1.0 / count(*), 4)
                   AS delta_frac,
                 CAST(sum(CASE WHEN vec_id % $TombstoneMod = 0
                               THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_tombstoned,
                 round(sum(CASE WHEN vec_id % $TombstoneMod = 0
                               THEN 1 ELSE 0 END) * 1.0 / count(*), 4)
                   AS tombstone_frac,
                 CASE WHEN sum(CASE WHEN vec_id % $DeltaIngestMod =
                                         $DeltaIngestRem
                                    THEN 1 ELSE 0 END) * 1.0 / count(*)
                             > 0.2 THEN 'rebuild'
                      WHEN sum(CASE WHEN vec_id % $TombstoneMod = 0
                                    THEN 1 ELSE 0 END) * 1.0 / count(*)
                             > 0.1 THEN 'compact'
                      ELSE 'serve' END AS action
          FROM embeddings""",
    // s33: the brute ranks, a (query, label) vote count, the same
    // (n desc, label asc) argmax, the self-label compare
    "s33_knn_classifier" ->
      """WITH v AS (
           SELECT vec_id, label,
                  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         scored AS (
           SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                  c.label AS nb_label,
                  round(list_dot_product(q.v, c.v) /
                        sqrt(list_sum(list_transform(q.v, x -> x * x)) *
                             list_sum(list_transform(c.v, x -> x * x))),
                        4) AS cosine
           FROM v q, v c
           WHERE q.vec_id < 50 AND q.vec_id <> c.vec_id),
         ranked AS (
           SELECT query_id, nb_label,
                  row_number() OVER (PARTITION BY query_id
                    ORDER BY cosine DESC, neighbor_id) AS rank
           FROM scored),
         votes AS (
           SELECT query_id, nb_label, count(*) AS n
           FROM ranked WHERE rank <= 5 GROUP BY 1, 2),
         pred AS (
           SELECT query_id, nb_label AS pred_label FROM (
             SELECT query_id, nb_label,
                    row_number() OVER (PARTITION BY query_id
                      ORDER BY n DESC, nb_label) AS rk
             FROM votes) WHERE rk = 1)
       SELECT p.query_id, q.label AS true_label, p.pred_label,
              (p.pred_label = q.label) AS correct
       FROM pred p JOIN v q ON q.vec_id = p.query_id""",
    "s08_ann_ivf_multiprobe" -> ivfOracle(MultiProbe),
    // s11 reads the cell-partitioned COPY of the corpus and must land
    // on s08's exact bytes — serving layout never changes the answer
    "s11_ann_ivf_partitioned" -> ivfOracle(MultiProbe),
    "s05_ann_lsh_portable" -> lshPortableOracle,
    "s06_ann_pq" -> pqOracle,
    "s07_ann_filtered" -> filteredOracle,
    "s10_ann_pq_adc" -> pqAdcOracle
  )
}
