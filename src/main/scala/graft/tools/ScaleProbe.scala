// Measured-scaling probe: run the banded/bucketed pipeline operators on
// synthetic corpora at 1x and 4x size and report wall-clock ratios plus
// output sizes. A linear-shaped operator lands near 4x (± fixed
// overheads amortizing — often below); a quadratic candidate stage
// would land near 16x. This is the committed evidence for the
// "would it hold at 100x" design claims the operator docstrings make.
package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

object ScaleProbe {

  /** Word-salad docs over a 500-token vocabulary (shared shingles →
    * realistic near-dup density) + a 5% identical boilerplate cluster
    * (exercises the hot-bucket caps at the bigger size). */
  private def docsN(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).selectExpr("id AS doc_id",
      """CASE WHEN id % 20 = 0
              THEN 'the shared boilerplate header line every mirror copies'
              ELSE concat_ws(' ', transform(sequence(0, 9),
                     j -> concat('w', pmod(xxhash64(id * 11 + j), 500)))) END
         AS text""",
      "concat('src', pmod(xxhash64(id), 20)) AS source")

  private def vecsN(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).selectExpr("id AS vec_id",
      """transform(sequence(0, 15),
           j -> pmod(xxhash64(id, j), 1000) / 500.0d - 1.0d) AS embedding""")

  /** Clustered 16-dim vectors: 8-doc near-dup groups (cluster center
    * from the group id, small per-doc noise), so intra-group cosine is
    * high and the group COUNT grows with n — the corpus shape where a
    * near-dup graph is meaningful and LSH candidates are local. */
  private def clusteredVecsN(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).selectExpr("id AS vec_id",
      """transform(sequence(0, 15),
           j -> pmod(xxhash64(id div 8, j), 1000) / 500.0d - 1.0d
                + pmod(xxhash64(id, j), 100) / 1000.0d) AS v""")

  /** 4-doc near-dup groups (10 shared words from the group id + one
    * doc-unique tail word): intra-group char-gram jaccard clears 0.5,
    * cross-group overlap is hash noise — duplicate-cluster COUNT grows
    * with n while cluster SIZE stays fixed, the d14/gx probe shape. */
  private def dupDocsN(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).selectExpr("id AS doc_id",
      """concat(concat_ws(' ', transform(sequence(0, 9),
           j -> concat('w', pmod(xxhash64((id div 4) * 11 + j, 1), 500)))),
         ' u', id % 4) AS text""")

  private def timed(f: => DataFrame): (Double, Long) = {
    val t0 = System.nanoTime()
    var rows = 0L
    graft.operators.Persists.scoped { rows = f.count() }
    ((System.nanoTime() - t0) / 1e9, rows)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators._

    val probes: Seq[(String, Long => DataFrame)] = Seq(
      ("d02_minhash_lsh", n => DedupOps.minhashLshOn(
        docsN(spark, n), corpusRows = Some(n))),
      ("d04_ngram_jaccard", n => DedupOps.ngramJaccardOn(
        docsN(spark, n), threshold = 0.5, maxCanopyFreq = 2000)),
      ("d05_embedding_neardup", n => DedupOps.embeddingNearDupOn(
        vecsN(spark, n), threshold = 0.95, tables = 4, planes = 8,
        maxBucketFreq = DedupOps.scaledEmbeddingCap(n, 8, 2000),
        corpusRows = Some(n))),
      // same operator, planes raised with the corpus (2^planes ∝ n):
      // the knob the d05 docstring prescribes — bucket population stays
      // constant, so candidate work returns to linear
      ("d05_planes_scaled", n => DedupOps.embeddingNearDupOn(
        vecsN(spark, n), threshold = 0.95, tables = 4,
        planes = if (n >= 100000) 10 else 8,
        maxBucketFreq = 2000, corpusRows = Some(n))),
      ("s02_ann_lsh", n => SimilarityOps.lshTopKOn(
        vecsN(spark, n).selectExpr("vec_id",
          "transform(embedding, x -> cast(x AS DOUBLE)) AS v"),
        corpusRows = n, nQueries = 5, k = 10, tables = 4, planes = 8,
        maxBucketFreq = 2000)),
      ("c02_source_quota", n => CurationOps.sourceQuotaOn(
        docsN(spark, n), k = 100)),
      // round-12 operators: each must scale ~linearly —
      // t35 is one narrow regex map; s35 is a delta-sized
      // broadcast-model map (the batch is n/7 of the corpus at a
      // fixed C=n/23-capped model); m15 is one mapPartitions of
      // two codec round-trips per row
      ("t35_html_extract", n => TextOps.htmlExtractOn(
        docsN(spark, n).selectExpr("doc_id",
          """'<html><head><title>Doc ' || doc_id ||
             '</title><style>b{c:d}</style></head><body>' ||
             '<nav>Home | About</nav><h1>Doc ' || doc_id ||
             ' &amp; notes</h1><p>' || text ||
             '</p><script>var t=1;</script>' ||
             '<footer>(c) x</footer></body></html>' AS html"""))),
      ("s35_ivf_assign", n => {
        val v = vecsN(spark, n).selectExpr("vec_id",
          "transform(embedding, x -> cast(x AS DOUBLE)) AS v")
        val (ids, cents) = SimilarityOps.centroidModel(
          v.filter("vec_id % 7 <> 3"), n, 23)
        SimilarityOps.assignBatchOn(
          spark, v.filter("vec_id % 7 = 3"), ids, cents)
      }),
      ("m15_imageio_decode", n => MultimodalOps.imageioDecodeOn(
        spark, spark.range(n).selectExpr("id AS media_id"))),
      ("t10_bm25", n => SearchOps.bm25TopKOn(
        docsN(spark, n), corpusRows = n,
        terms = Seq("w1", "w2", "w3"), k = 20)),
      ("c09_pack_sequences", n => PackingOps.packSequencesOn(
        docsN(spark, n).selectExpr("doc_id", "source",
          "CAST(size(split(text, ' ')) AS BIGINT) AS tokens"),
        budget = 2048)),
      // IVF probe scaling: candidate work should scale ~linearly in the
      // corpus at fixed C (cells grow, cell POPULATION grows with n/C),
      // and nprobe=4 should cost ~2x nprobe=2's candidates, not 2x the
      // corpus
      ("s04_ivf_nprobe2", n => SimilarityOps.ivfTopKOn(spark,
        vecsN(spark, n).selectExpr("vec_id",
          "transform(embedding, x -> cast(x AS DOUBLE)) AS v"),
        rows = n, nprobe = 2)),
      ("s08_ivf_nprobe4", n => SimilarityOps.ivfTopKOn(spark,
        vecsN(spark, n).selectExpr("vec_id",
          "transform(embedding, x -> cast(x AS DOUBLE)) AS v"),
        rows = n, nprobe = 4)),
      // PQ serving cost: reconstruction scoring materializes a
      // dim-length vector per (row, query) pair; ADC scores the same
      // quantity from m table lookups. Both are linear in the corpus;
      // WHICH constant is smaller depends on dim — at this fixture's
      // 16 dims the reconstruction is so short that ADC's table
      // machinery costs more, at the corpus's 64 dims ADC wins
      // (measured both ways, SCALE_r7.md §2)
      ("s06_pq_recon", n => SimilarityOps.pqTopKOn(
        vecsN(spark, n).selectExpr("vec_id",
          "transform(embedding, x -> cast(x AS DOUBLE)) AS v"),
        rows = n, nQueries = 5, k = 10, codebookMod = 29, m = 8)),
      ("s10_pq_adc", n => SimilarityOps.pqAdcTopKOn(
        vecsN(spark, n).selectExpr("vec_id",
          "transform(embedding, x -> cast(x AS DOUBLE)) AS v"),
        rows = n, nQueries = 5, k = 10, codebookMod = 29, m = 8)),
      // CDC: merge folds a 20% delta into the base (broadcast anti +
      // union — the base side is scan-only, so ~linear in base), and
      // diff full-outer-joins two snapshots (one key shuffle, linear)
      ("q74_cdc_merge", n => {
        val base = spark.range(n).selectExpr(
          "id AS k", "concat('v', id) AS v")
        val changes = spark.range(n / 5).selectExpr(
          "id * 5 AS key", "CAST(1 AS INT) AS seq",
          "CASE WHEN id % 3 = 0 THEN 'D' ELSE 'U' END AS op",
          "concat('u', id) AS v")
        CdcOps.merge(base, changes, "k", Seq("v" -> "v"))
      }),
      ("q79_snapshot_diff", n => {
        val a = spark.range(n).selectExpr(
          "id AS k", "pmod(xxhash64(id), 100) AS v")
        val b = spark.range(n + n / 10).selectExpr("id AS k",
          "pmod(xxhash64(id + CASE WHEN id % 7 = 0 THEN 1 ELSE 0 END), 100) AS v")
        CdcOps.snapshotDiff(a, b, "k", Seq("v"))
      }),
      // d13: banding bounds candidates (linear in docs at fixed dup
      // density) and the levenshtein verify is O(prefix²) per PAIR —
      // constant — so the whole verify stage should track candidate
      // count, not the corpus square
      ("d13_editdist_verify", n => DedupOps.editDistDedupOn(
        docsN(spark, n))),
      // c13: pure scan-projection chunking over ~200-token docs
      // (docsN's 10-token rows would chunk 1:1) — linear by shape,
      // probed to prove the explode does not misbehave
      ("c13_chunking", n => CurationOps.chunkFrame(
        spark.range(n).selectExpr("id AS doc_id",
          """concat_ws(' ', transform(sequence(0, 199),
               j -> concat('w', pmod(xxhash64(id * 13 + j), 500))))
             AS text"""),
        width = 64, stride = 48)),
      // g01: bounded-degree random digraph (8 out-edges/node) — each
      // iteration is one edges⋈ranks join + groupBy, so the whole run
      // should scale with |edges| (linear in n at fixed degree)
      ("g01_pagerank", n => GraphOps.pagerankOn(
        spark.range(n).selectExpr("id AS src",
          s"explode(transform(sequence(0, 7), " +
            s"j -> pmod(xxhash64(id, j), ${n}L))) AS dst"))),
      // g02's triangle stage: oriented bounded-degree edges (8 forward
      // neighbors per node) — the two-hop join fans out ≤deg² per
      // node, so cost is linear in n at fixed degree
      ("g02_triangles", n => GraphOps.trianglesOn(
        spark.range(n).selectExpr("id AS a",
          "explode(transform(sequence(1, 8), j -> id + j)) AS b"))),
      // g03's component stage: 8-node star clusters — label propagation
      // converges in O(cluster diameter) rounds independent of n, so
      // the total is rounds × (one join + one agg), linear in n
      ("g03_components", n => DedupOps.connectedComponents(
        spark.range(n).selectExpr("id AS id_a", "id - id % 8 AS id_b")
          .where("id_a <> id_b"))),
      // the graph-builder CONTRAST (small base — the exact form is
      // O(n²) by design): exact all-pairs lands near 16× at 4× the
      // corpus; the LSH candidate form, WITH the d05 knob (2^planes ∝
      // n so bucket population stays constant), tracks the corpus.
      // Clustered vectors (8-doc near-dup groups, cluster COUNT grows
      // with n) — the realistic corpus shape; on hash-uniform vectors
      // strong edges are locality-free accidents and no sublinear
      // candidate generator can find them (first probe of this pair
      // measured exactly that: fixed-planes LSH = 15.7×, quadratic)
      ("gx_exact_graph", n => GraphOps.mutualKnnEdgesOn(
        clusteredVecsN(spark, n), minCosine = 0.4)),
      ("gx_lsh_scaled", n => GraphOps.mutualKnnEdgesApproxOn(
        clusteredVecsN(spark, n),
        corpusRows = n, minCosine = 0.4, tables = 16,
        planes = if (n >= 10000) 6 else 4,
        maxBucketFreq = 2000)),
      // s12: the covariance outer-product explode is d² rows per input
      // row into a d²-bounded partial agg — linear in n at fixed d
      // (the gate's own pipeline via the fixture-injectable form)
      ("s12_covariance", n => SimilarityOps.covarianceOn(
        vecsN(spark, n).selectExpr("vec_id",
          "transform(embedding, x -> cast(x AS DOUBLE)) AS v"),
        n.toDouble)),
      // g06: the dangling-mass variant adds one node-sized anti-join +
      // scalar agg per superstep to g01's join+agg — still linear in
      // |edges| at fixed degree. Sources are the first 2/3 of nodes,
      // targets the last 2/3 — the final third is dst-only (genuine
      // sinks), so the sink path is actually exercised
      ("g06_pr_dangling", n => GraphOps.pagerankDanglingOn(
        spark.range(n * 2 / 3).selectExpr("id AS src",
          s"explode(transform(sequence(0, 7), " +
            s"j -> ${n}L div 3 + pmod(xxhash64(id, j), " +
            s"${n}L - ${n}L div 3))) AS dst"))),
      // g09: two superstep passes + two scalar norms per iteration —
      // linear in |edges| at fixed degree, like g01 (same edge shape)
      ("g09_hits", n => GraphOps.hitsOn(
        spark.range(n).selectExpr("id AS src",
          s"explode(transform(sequence(0, 7), " +
            s"j -> pmod(xxhash64(id, j), ${n}L))) AS dst"))),
      // q107: the grid is bounded by CALENDAR DAYS (fixed 100-day span,
      // 50 series), so 4x the events only grows the stage-1 partial
      // agg — the window stage runs over a CONSTANT 5000-cell frame
      ("q107_gapfill", n => EventOps.gapfillInterpolateOn(
        spark.range(n).selectExpr(
          "concat('t', id % 50) AS event_type",
          "pmod(xxhash64(id), 100) AS day",
          "pmod(xxhash64(id, 3), 1000) / 10.0d AS value"))),
      // q108: one partial-agg build pass + a |shards|·nbins merge —
      // linear in n, and the merge cost is independent of n entirely
      ("q108_histogram", n => RelationalQueries.histogramMergeServe(
        RelationalQueries.histogramSketch(
          spark.range(n).selectExpr(
            "concat('t', id % 5) AS event_type",
            "pmod(xxhash64(id), 30) AS day",
            "pmod(xxhash64(id, 7), 1200) / 10.0d - 10.0d AS value"),
          20, 5.0), 20)),
      // d14: 4-doc duplicate groups (group COUNT grows with n — the
      // d04-probe corpus shape): true pairs are ∝ n and the prefix
      // inverted-index join touches rare grams only, so the lossless
      // θ-join stays near-linear where brute all-pairs is 16× at 4×
      // (the dx_brute contrast below measures exactly that)
      ("d14_prefix_jaccard", n => DedupOps.prefixJaccardOn(
        dupDocsN(spark, n), threshold = 0.5)),
      // g10: frontier BFS on the bounded-degree digraph — total work
      // is O(sum of frontier-adjacent edges) ≤ O(|E|) across ALL hops,
      // so 4x the nodes (at fixed degree) should land near 4x
      ("g10_bfs", n => GraphOps.bfsHopsOn(
        spark.range(n).selectExpr("id AS src",
          s"explode(transform(sequence(0, 7), " +
            s"j -> pmod(xxhash64(id, j), ${n}L))) AS dst"),
        spark.range(100).selectExpr("id AS node"), maxHops = 4)),
      // g11: identical superstep shape to g01 with w/wdeg in place of
      // 1/deg — the weight column rides the persisted edges, so the
      // scaling story must match g01's (linear in |edges|)
      ("g11_pr_weighted", n => GraphOps.pagerankWeightedOn(
        spark.range(n).selectExpr("id AS src",
          s"explode(transform(sequence(0, 7), " +
            s"j -> pmod(xxhash64(id, j), ${n}L))) AS dst")
          .selectExpr("src", "dst",
            "1L + pmod(xxhash64(src, dst), 5) AS w"))),
      // q111: three window columns on ONE series-keyed sort, frames
      // capped at 20 rows — linear in events at fixed series count
      ("q111_zscore", n => EventOps.rollingZscoreOn(
        spark.range(n).selectExpr("id AS event_id",
          "concat('t', id % 50) AS event_type", "id AS us",
          "pmod(xxhash64(id, 3), 1000) / 10.0d AS value"))),
      // q112: one user-keyed lag + a partial-agg bigram count; the
      // probability window runs over the |types|² matrix (constant)
      ("q112_transitions", n => EventOps.eventTransitionsOn(
        spark.range(n).selectExpr("id AS event_id",
          "pmod(xxhash64(id), 1000) AS user_id",
          "concat('t', pmod(xxhash64(id, 5), 8)) AS event_type",
          "id AS us"))),
      // q113: per-price collapse + constant bucket frame + in-bucket
      // windows + one final semi-join — every stage linear in n, the
      // O(n²) dominance join exists only in the oracle
      ("q113_skyline", n => SkylineOps.skyline2D(
        spark.range(n).selectExpr("id",
          "pmod(xxhash64(id), 100000) / 7.0d AS price",
          "CAST(pmod(xxhash64(id, 2), 10000) AS INT) AS size"),
        "price", "size")),
      // t16: one exploded token count per shard + a vocabulary-sized
      // outer join — linear in tokens at fixed vocabulary
      ("t16_divergence", n => TextOps.shardDivergenceOn(
        docsN(spark, n).selectExpr(
          "CAST(doc_id % 2 AS INT) AS shard", "text"))),
      // g13: one symmetric degree agg + the g02 triangle stage over the
      // same bounded-degree oriented edges — linear in n at fixed degree
      ("g13_clustering", n => GraphOps.clusteringCoefficientOn(
        spark.range(n).selectExpr("id AS a",
          "explode(transform(sequence(1, 8), j -> id + j)) AS b"))),
      // g14: degree agg + two node-keyed joins + one scalar corr over
      // the same edges — linear in |E|, output is ONE row at any n
      ("g14_assortativity", n => GraphOps.degreeAssortativityOn(
        spark.range(n).selectExpr("id AS a",
          "explode(transform(sequence(1, 8), j -> id + j)) AS b"))),
      // t17: one exploded distinct-gram frame + a gram-keyed df agg +
      // one join back — linear in corpus chars; dup-group corpus so
      // novelty has real structure (intra-group grams recur)
      ("t17_novelty", n => TextOps.ngramNoveltyOn(dupDocsN(spark, n))),
      // q116: one t-keyed agg + day-partitioned windows; the only
      // unpartitioned window is the |days| rollup (constant 100 days)
      ("q116_concurrency", n => EventOps.concurrencyOn(
        spark.range(n).selectExpr(
          "pmod(xxhash64(id), 8640000000000) AS lo",
          "pmod(xxhash64(id), 8640000000000) + 3600000000 AS hi"))),
      // s14: k broadcast centroid rows against the corpus, then a
      // k·d-bounded cell partial agg — linear in n at fixed (k, d)
      ("s14_kmeans_step", n => SimilarityOps.kmeansStepOn(
        vecsN(spark, n).selectExpr("vec_id",
          "transform(embedding, x -> cast(x AS DOUBLE)) AS v"))),
      // c20: cross-set banded candidates — per bucket train×eval with a
      // FIXED eval fraction, so candidates track the corpus linearly
      ("c20_neardup_decontam", n => CurationOps.neardupDecontamOn(
        dupDocsN(spark, n).selectExpr("doc_id",
          "CASE WHEN doc_id % 16 = 0 THEN 'eval' " +
            "ELSE concat('s', doc_id % 3) END AS source", "text"),
        evalSource = "eval", threshold = 0.5)),
      // m06: one narrow map per item (64 block aggregates over the
      // barriered code expansion) — linear in total payload bytes
      ("m06_ahash", n => MultimodalOps.ahashOn(
        spark.range(n).selectExpr("id AS media_id",
          """concat_ws(' ', transform(sequence(0, 39),
               j -> concat('w', pmod(xxhash64(id * 7 + j), 500))))
             AS txt"""))),
      // m08: m07's band pairs (16-bit-chunk-bounded buckets) + the
      // min-label CC over the in-band edges — linear in payload bytes
      // plus CC rounds on the (bounded) near-dup subgraph; dup-group
      // payloads so in-band pairs exist at any n
      ("m08_ahash_clusters", n => MultimodalOps.ahashClustersOn(
        spark.range(n).selectExpr("id AS media_id",
          """concat_ws(' ', transform(sequence(0, 39),
               j -> concat('w', pmod(xxhash64((id div 4) * 7 + j), 500))))
             AS txt"""))),
      // m08x: DIAGNOSTIC ONLY (not a gate entry) — the same dup-dense
      // corpus with the hot-bucket cap lifted, the measured basis for
      // the 64-cap: buckets grow with n, pairs grow bucket²
      ("m08x_uncapped_diag", n => MultimodalOps.ahashCandidatesOn(
        spark.range(n).selectExpr("id AS media_id",
          """concat_ws(' ', transform(sequence(0, 39),
               j -> concat('w', pmod(xxhash64((id div 4) * 7 + j), 500))))
             AS txt"""), maxBucket = Long.MaxValue)),
      // c27: one bigram explode (linear in tokens), a 4096-bucket
      // census, broadcast ratio join, per-doc agg, TakeOrdered —
      // linear end to end; 10% of docs form the target pool
      ("c27_dsir_select", n => CurationOps.dsirSelectOn(
        spark.range(n).selectExpr("id AS doc_id",
          "CASE WHEN id % 10 = 0 THEN 'tgt' ELSE 'raw' END AS source",
          """concat_ws(' ', transform(sequence(0, 39),
               j -> concat('w', pmod(xxhash64(id * 11 + j), 300))))
             AS text"""), target = "tgt")),
      // t22: two linear per-doc feature passes + 4-row broadcast model
      // join + per-doc agg — linear in corpus tokens
      ("t22_quality_classifier", n => TextOps.qualityClassifierOn(
        spark.range(n).selectExpr("id AS doc_id",
          """concat_ws(' ', transform(sequence(0, 39),
               j -> concat('w', pmod(xxhash64(id * 13 + j), 400))))
             AS text"""))),
      // d18: explode linear in tokens, per-doc window + per-doc agg —
      // nothing crosses documents; dup-dense payloads so trims happen
      ("d18_intradoc_dedup", n => DedupOps.intraDocDedupOn(
        spark.range(n).selectExpr("id AS doc_id",
          """concat_ws(' ', transform(sequence(0, 39),
               j -> concat('w', pmod(xxhash64(id * 3 + j div 8), 50))))
             AS text"""))),
      // q122: the event-volume stage is the q26 partial-agg'd daily
      // groupBy; the window runs on the series frame (days × types)
      ("q122_ewma_daily", n => EventOps.ewmaOn(
        spark.range(n).selectExpr(
          "concat('t', id % 5) AS event_type",
          "date_add(date'2024-01-01', cast(id div 5 as int)) AS day",
          "cast(pmod(xxhash64(id), 100) as double) AS v"))),
      // t23: the t09 passes + a value-bounded banding window + a
      // broadcast band-map join — linear in docs
      ("t23_quality_tiers", n => TextOps.qualityTiersOn(
        spark.range(n).selectExpr("id AS doc_id",
          "round(cast(pmod(xxhash64(id), 997) as double) / -100, 4)"
            + " AS logprob"))),
      // g24: k landmark BFS sweeps in ONE labeled frontier — state
      // |landmarks|·|nodes| bounded; ladder graph keeps frontiers live
      ("g24_harmonic_landmarks", n => GraphOps.harmonicCentralityOn(
        spark.range(n).selectExpr("id AS src", "id + 1 AS dst")
          .unionAll(spark.range(n).selectExpr("id + 1 AS src",
            "id AS dst")), nLandmarks = 4, maxHops = 4)),
      // d19: fingerprint projection + two 16-byte-keyed aggs + a
      // sources-sized roll-up — linear; 10 sources, 25% dup corpus
      ("d19_dedup_report", n => DedupOps.dedupReportOn(
        spark.range(n).selectExpr("id AS doc_id",
          "concat('s', id % 10) AS source",
          """concat_ws(' ', transform(sequence(0, 19),
               j -> concat('w', pmod(xxhash64((id div 4) * 5 + j), 200))))
             AS text"""))),
      // s26: one posexplode into a dims-sized partial agg — linear
      ("s26_embedding_drift", n => SimilarityOps.embeddingDriftOn(
        spark.range(n).selectExpr("id AS vec_id",
          """transform(sequence(0, 63),
               j -> cast(pmod(xxhash64(id * 67 + j), 100) as double))
             AS v"""))),
      // q123: one user-keyed sort carries both windows — linear;
      // 100 users, state flips every ~3 events
      ("q123_scd2_intervals", n => EventOps.scd2IntervalsOn(
        spark.range(n).selectExpr("id AS event_id", "id % 100 AS user_id",
          "concat('s', pmod(xxhash64(id div 3), 4)) AS event_type",
          "id AS us"))),
      // m09: per media exactly 64→512→64 rows through two broadcast
      // coefficient joins + one bounded median list — corpus-linear
      ("m09_dct_phash", n => MultimodalOps.dctPhashOn(
        spark.range(n).selectExpr("id AS media_id",
          """concat_ws('', transform(sequence(0, 99),
               j -> chr(97 + cast(pmod(xxhash64(id * 7 + j), 26) as int))))
             AS txt"""))),
      // m10: m09's linear hash + the bucket-bounded band pair join
      // (dup-grouped payloads so collisions exist at any n)
      ("m10_phash_candidates", n => MultimodalOps.chunkCandidates(
        MultimodalOps.dctPhashOn(spark.range(n).selectExpr(
          "id AS media_id",
          """concat_ws('', transform(sequence(0, 99),
               j -> chr(97 + cast(pmod(xxhash64((id div 4) * 7 + j), 26)
                                  as int)))) AS txt"""))
          .selectExpr("media_id", "p0 AS c0", "p1 AS c1", "p2 AS c2",
            "p3 AS c3"))),
      // g25: per-round oriented triangle join, Σ deg² bounded — the
      // probe graph is disjoint 4-cliques (degree constant at any n),
      // so rounds cost O(|E|)
      ("g25_ktruss", n => GraphOps.ktrussOn(
        spark.range(n / 4).selectExpr("id AS g",
          """explode(array(struct(0L, 1L), struct(0L, 2L),
               struct(0L, 3L), struct(1L, 2L), struct(1L, 3L),
               struct(2L, 3L))) AS p""")
          .selectExpr("g * 4 + p.col1 AS a", "g * 4 + p.col2 AS b"))),
      // q124: two user-keyed partial aggs + a 2-row report — linear
      ("q124_ab_report", n => EventOps.abReportOn(
        spark.range(n).selectExpr("id % 1000 AS user_id",
          "CASE WHEN id % 3 = 0 THEN 'view' WHEN id % 3 = 1 " +
            "THEN 'click' ELSE 'purchase' END AS event_type",
          "id AS us"))),
      // d15: map-only chunking + ONE chunk-hash-keyed census shuffle —
      // linear in corpus tokens; dup-group corpus so shared chunks exist
      ("d15_cdc_chunks", n => DedupOps.cdcChunkCensusOn(
        dupDocsN(spark, n))),
      // q117: two grouped exact percentiles + two |types|-row broadcast
      // joins — n log n in the per-type sort, linear shuffle volume
      ("q117_mad_outliers", n => EventOps.madOutliersOn(
        spark.range(n).selectExpr("id AS event_id",
          "concat('t', id % 50) AS event_type",
          "round(pmod(xxhash64(id, 3), 1000) / 10.0d, 6) AS v"))),
      // s16: m broadcast seed groups against the sub-vector explode —
      // m·n scored sub-pairs, m·k·(d/m)-bounded update agg
      ("s16_pq_train", n => SimilarityOps.pqTrainStepOn(
        vecsN(spark, n).selectExpr("vec_id",
          "transform(embedding, x -> cast(x AS DOUBLE)) AS v"),
        m = 2, k = 4, dim = 16)),
      // d17: same-cell pair join — candidate work Σ|cell|²/2 ≈ n²/C
      // with C = n/mod growing WITH the corpus, so per-cell population
      // is ~constant and total work stays ~linear (the clustered-vec
      // corpus keeps dup groups cell-local)
      ("d17_semdedup_cells", n => DedupOps.semdedupCellsOn(
        clusteredVecsN(spark, n), n, threshold = 0.9)),
      // g22: 5 merge rounds, each a community-pair agg over the edge
      // list + a 1-row argmax + a broadcast relabel — O(|E|) per
      // round, community-bounded state
      ("g22_community_merge", n => GraphOps.communityMergeOn(
        spark.range(n).selectExpr("id AS a",
          "explode(array(id + 1, id + 2)) AS b"))),
      // g23: 3 parity-alternating move rounds, each one
      // incidence⋈labels join + (v, c) candidate agg + per-node argmax
      // window — O(|E|) per round, no community-count dependence
      ("g23_louvain_move", n => GraphOps.louvainMoveOn(
        spark.range(n).selectExpr("id AS a",
          "explode(array(id + 1, id + 2)) AS b"))),
      // g19: superstep fixpoints over a bounded-SCC digraph (8-cycles
      // with backward one-way bridges) — inner rounds track the SCC
      // diameter (8), peels stay at 1, so cost is O(|E|) per doubling
      ("g19_scc", n => GraphOps.sccOn(
        spark.range(n).selectExpr("id AS src",
            "CASE WHEN (id + 1) % 8 = 0 THEN id - 7 ELSE id + 1 END AS dst")
          .unionAll(spark.range(n / 8).filter("id > 0")
            .selectExpr("id * 8 AS src", "(id - 1) * 8 AS dst")))),
      // s21: 3 per-subspace Lloyd rounds over the once-exploded
      // sub-vector frame — linear in n at fixed (m, k, d, rounds)
      ("s21_pq_train_full", n => SimilarityOps.pqTrainFullOn(
        vecsN(spark, n).selectExpr("vec_id",
          "transform(embedding, x -> cast(x AS DOUBLE)) AS v"),
        m = 2, k = 4, dim = 16)),
      // s18: 3 Lloyd rounds, each one broadcast cross-join + k·d-
      // bounded cell agg — linear in n at fixed (k, d, rounds); round
      // cost is flat (state is k·d, independent of round index)
      ("s18_kmeans_train", n => SimilarityOps.kmeansTrainOn(
        vecsN(spark, n).selectExpr("vec_id",
          "transform(embedding, x -> cast(x AS DOUBLE)) AS v"))),
      // s24: projected 8-dim brute over n (8× cheaper arithmetic than
      // 64-dim s01) + an nq·fetchN-bounded exact re-rank — linear in
      // n at fixed (nq, fetchN, k)
      ("s24_ann_projected", n => SimilarityOps.projectedTopKOn(
        spark, vecsN(spark, n).selectExpr("vec_id",
          "transform(embedding, x -> cast(x AS DOUBLE)) AS v"))),
      // s22: one posexplode + 512-row broadcast join + (vec, j)
      // partial agg — map-side combine shrinks the shuffle to n·k
      ("s22_random_projection", n => SimilarityOps.randomProjectionOn(
        spark, vecsN(spark, n).selectExpr("vec_id",
          "transform(embedding, x -> cast(x AS DOUBLE)) AS v"))),
      // s23: the corpus pays ONE covariance pass (d²-bounded partial
      // agg); the 5 matvec rounds run on the d²-row frame and never
      // see the corpus — linear in n at fixed (d, rounds)
      ("s23_pca_power", n => SimilarityOps.pcaPowerOn(
        vecsN(spark, n).selectExpr("vec_id",
          "transform(embedding, x -> cast(x AS DOUBLE)) AS v"),
        n.toDouble)),
      // t19: corpus cost is ONE word-count agg; the 5 merge rounds run
      // on vocabulary-sized state, so doubling the corpus roughly
      // doubles only the count stage
      ("t19_bpe_merges", n => TokenizerOps.bpeTrainOn(
        docsN(spark, n), merges = 5)),
      // t20: train on the vocabulary, then one corpus word-explode
      // joined against the vocabulary-sized tokenization — linear in
      // corpus words on top of t19's cost
      ("t20_bpe_encode", n => TokenizerOps.bpeEncodeOn(
        docsN(spark, n), merges = 5)),
      // c26: one distinct-difficulty window (value-bounded) broadcast
      // back + bands unions + sharded rank windows — linear in docs,
      // output = Σ_e |bands ≤ e| rows
      ("c26_curriculum", n => CurationOps.curriculumOn(docsN(spark, n))),
      // t21: row-local trigram derive + a broadcast term filter over
      // the postings — the shuffle carries only the 3 phrase tokens'
      // postings; linear in corpus tokens
      ("t21_phrase_search", n => TextOps.phraseSearchOn(docsN(spark, n))),
      // t18: 2×-chars gram explode into a 30-row broadcast join and a
      // (doc, lang)-keyed partial agg — linear in corpus chars
      ("t18_langid_model", n => TextOps.langIdModelOn(docsN(spark, n))),
      // d16: window equi-join candidates — pair work tracks window-
      // value bucket populations (dup-group-bounded on this corpus),
      // never all-pairs; island agg is output-pair-sized
      ("d16_substring_overlap", n => DedupOps.substringOverlapOn(
        dupDocsN(spark, n))),
      // c21: the c04 + c20 signals (both ~linear) plus eval-bounded
      // rollups — dominated by the underlying decontamination joins
      ("c21_contamination_report", n => CurationOps.contaminationReportOn(
        dupDocsN(spark, n).selectExpr("doc_id",
          "CASE WHEN doc_id % 16 = 0 THEN 'eval' " +
            "ELSE concat('s', doc_id % 3) END AS source", "text"),
        evalSource = "eval")),
      // c22: one source-keyed window sort with a cumulative-sum cut —
      // linear shuffle volume, per-source partitions stay small
      ("c22_token_budget", n => CurationOps.tokenBudgetMixOn(
        docsN(spark, n), budgetTokens = 200L)),
      // g16: `rounds` sweeps of one degree agg + two semi-joins over a
      // shrinking edge set — O(rounds·|E|) worst case, linear at fixed
      // degree; bounded-degree graph so most nodes survive every sweep
      ("g16_kcore_peel", n => GraphOps.kcorePeelOn(
        spark.range(n).selectExpr("id AS a",
          "explode(transform(sequence(1, 8), j -> id + j)) AS b"),
        k = 3)),
      // q119: one grouped partial agg of five doubles per series —
      // pure map-side-combine shape, linear by construction
      ("q119_trend_ols", n => EventOps.trendOlsOn(
        spark.range(n).selectExpr(
          "concat('t', id % 50) AS event_type",
          "pmod(xxhash64(id), 100) AS day",
          "round(pmod(xxhash64(id, 3), 1000) / 10.0d, 6) AS v"))),
      // s17: d·n exploded cells into a d-bounded stats agg + d-row
      // broadcast back — linear in n at fixed d (the s12 shape)
      ("s17_sq8_report", n => SimilarityOps.sq8ReportOn(
        vecsN(spark, n).selectExpr("vec_id",
          "transform(embedding, x -> cast(x AS DOUBLE)) AS v"))),
      // q120: one user-keyed window sort + bounded per-session reduce
      // + a path-keyed count — linear in events
      ("q120_session_paths", n => EventOps.sessionPathsOn(
        spark.range(n).selectExpr("id AS event_id",
          "pmod(xxhash64(id), 2000) AS user_id",
          "concat('t', pmod(xxhash64(id, 5), 6)) AS event_type",
          "id * 60000000 AS us"))),
      // g17: bounded left-degree incidence (each left node hits 8
      // rights) — the self-join fans out deg² per left node, linear
      // in n at fixed degree
      ("g17_bipartite_proj", n => GraphOps.bipartiteProjectOn(
        spark.range(n).selectExpr("id AS l",
          "explode(transform(sequence(0, 7), " +
            s"j -> pmod(xxhash64(id, j), ${math.max(n / 50, 2)}L))) AS r"))),
      // g18: three rounds of one neighbor join + count agg + window
      // argmax over the labeled frontier — linear in |E| per round
      ("g18_label_spread", n => GraphOps.labelSpreadOn(
        spark.range(n).selectExpr("id AS a",
          "explode(transform(sequence(1, 8), j -> id + j)) AS b"),
        spark.range(n / 5).selectExpr("id * 5 AS node",
          "CAST(pmod(xxhash64(id), 10) AS INT) AS label"))),
      // g26: two capped BFS sweeps + two 1-row argmaxes — linear in
      // |E|; ladder graph (the g24 shape) keeps every frontier live
      ("g26_diameter_sweep", n => GraphOps.diameterEstimateOn(
        spark.range(n).selectExpr("id AS src", "id + 1 AS dst")
          .unionAll(spark.range(n).selectExpr("id + 1 AS src",
            "id AS dst")), maxHops = 4)),
      // q126: one user-keyed sort window + a types²-sized agg +
      // types-sized normalization window — linear in events
      ("q126_markov_transitions", n => EventOps.markovTransitionsOn(
        spark.range(n).selectExpr("id AS event_id",
          "pmod(xxhash64(id), 2000) AS user_id",
          "concat('t', pmod(xxhash64(id, 5), 6)) AS event_type",
          "id * 60000000 AS us"))),
      // g28: per step one walker⋈edges join + walker-keyed argmin —
      // O(steps · |E|) candidates at constant degree, linear in n
      ("g28_random_walks", n => GraphOps.randomWalksOn(
        spark.range(n).selectExpr("id AS a",
          "explode(transform(sequence(1, 8), j -> id + j)) AS b")
          .selectExpr("a AS src", "b AS dst")
          .unionAll(spark.range(n).selectExpr("id AS a",
            "explode(transform(sequence(1, 8), j -> id + j)) AS b")
            .selectExpr("b AS src", "a AS dst")), steps = 3)),
      // g29: walk_id-keyed self-join with constant (steps+1)·2·window
      // fan-out per walk — linear in walks (synthetic 4-row walks)
      ("g29_skipgram_pairs", n => GraphOps.skipGramPairsOn(
        spark.range(n).selectExpr("id AS walk_id",
          "explode(sequence(0, 3)) AS step")
          .selectExpr("walk_id", "CAST(step AS INT) AS step",
            "pmod(xxhash64(walk_id, step), 5000) AS node"),
        window = 2)),
      // g30: two key-partitioned window sums + one broadcast total
      // over the pair table — linear in pairs
      ("g30_ppmi_scores", n => GraphOps.ppmiScoresOn(
        spark.range(n).selectExpr(
          "pmod(xxhash64(id), 3000) AS center",
          "pmod(xxhash64(id, 2), 3000) AS context",
          "1 + pmod(xxhash64(id, 3), 5) AS n"))),
      // g27: wedge fan-out is deg² per center — constant-degree graph
      // (8 neighbors each way) keeps it linear in n; cap never binds
      ("g27_link_prediction", n => GraphOps.linkPredictionOn(
        spark.range(n).selectExpr("id AS a",
          "explode(transform(sequence(1, 8), j -> id + j)) AS b")
          .selectExpr("a AS src", "b AS dst")
          .unionAll(spark.range(n).selectExpr("id AS a",
            "explode(transform(sequence(1, 8), j -> id + j)) AS b")
            .selectExpr("b AS src", "a AS dst")),
        maxDeg = 300, k = 100)),
      // t26: three map-side gram explodes, each into a (doc, gram)
      // partial-agg'd groupBy + a doc-bounded top-1 window — linear in
      // corpus tokens, hottest key = one gram within one doc
      ("t26_gopher_repetition", n => TextOps.gopherRepetitionOn(
        docsN(spark, n).selectExpr("doc_id", "text",
          "CAST(length(text) AS BIGINT) AS n_chars"))),
      // s29: prefix-dim coarse scan (quarter arithmetic of full-dim
      // brute) + an nq·fetchN-bounded exact re-rank — the s24 shape
      // with the vector's own leading slice as the coarse code
      ("s29_ann_matryoshka", n => SimilarityOps.matryoshkaTopKOn(
        spark, vecsN(spark, n).selectExpr("vec_id",
          "transform(embedding, x -> cast(x AS DOUBLE)) AS v"),
        nQueries = 5, prefixDims = 4, fetchN = 50, k = 10)),
      // c31: the t09 passes carry source through; every post-scoring
      // stage runs on the D-row domain frame — corpus-linear
      ("c31_doremi_weights", n => CurationOps.doremiStepOn(
        docsN(spark, n).selectExpr("source",
          "round(cast(pmod(xxhash64(doc_id), 997) as double) / 100, 4)"
            + " AS nll"))),
      // q128: the daily groupBy is the event-volume stage; the fold
      // runs once per type on the bounded series frame
      ("q128_holt_trend", n => EventOps.holtOn(
        spark.range(n).selectExpr(
          "concat('t', id % 5) AS event_type",
          "date_add(date'2024-01-01', cast(pmod(id div 5, 365) as int))"
            + " AS day",
          "cast(pmod(xxhash64(id), 100) as double) AS v")
          .groupBy("event_type", "day")
          .agg(org.apache.spark.sql.functions.round(
            org.apache.spark.sql.functions.sum("v"), 2)
            .as("v")))),
      // m11: one narrow barriered map per item (130 adjacent block
      // aggregates over the code expansion) — linear in payload bytes
      ("m11_dhash", n => MultimodalOps.dhashOn(
        spark.range(n).selectExpr("id AS media_id",
          """concat_ws(' ', transform(sequence(0, 39),
               j -> concat('w', pmod(xxhash64(id * 7 + j), 500))))
             AS txt"""))),
      // t27: one token explode into a vocabulary-sized (source, word)
      // partial agg; rank window + OLS run on the vocabulary frame
      ("t27_zipf_slope", n => TextOps.zipfSlopeOn(
        docsN(spark, n))),
      // s30: k-1 rounds of a <=k-row broadcast against the corpus +
      // a 1-row argmax — O(k*n) distance work, linear at fixed k
      ("s30_farthest_first", n => SimilarityOps.farthestFirstOn(
        spark, vecsN(spark, n).selectExpr("vec_id",
          "transform(embedding, x -> cast(x AS DOUBLE)) AS v"),
        k = 8)),
      // c32: one corpus-linear token count; the ratio sort, prefix
      // test, and rate fill all run on the sources-sized frame
      ("c32_doremi_waterfill", n => CurationOps.weightedWaterfillOn(
        docsN(spark, n).groupBy("source")
          .agg(org.apache.spark.sql.functions.sum(
            org.apache.spark.sql.functions.expr(
              "CAST(size(split(text, ' ')) AS BIGINT)")).as("avail")),
        docsN(spark, n).select("source").distinct()
          .selectExpr("source", "0.05 AS weight"))),
      // d21: candidates only via shared-shingle buckets (dup-group
      // corpus so shared keys exist); verify join is pair-bounded —
      // the d04 shape with the asymmetric coefficient
      ("d21_dedup_containment", n => DedupOps.containmentDedupOn(
        dupDocsN(spark, n), threshold = 0.5, maxShingleFreq = 2000)),
      // m12: map-side frame explode + per-frame local hash + ONE
      // media-keyed window bounded by that item's frame count
      ("m12_shot_boundaries", n => MultimodalOps.shotBoundariesOn(
        spark.range(n).selectExpr("id AS media_id",
          """concat_ws('', transform(sequence(0, 199),
               j -> chr(97 + cast(pmod(xxhash64(id * 7 + j), 26) as int))))
             AS txt"""))),
      // t28: vocabulary-sized gram tables + one struct explode into
      // five gram-keyed joins — linear in held-out tokens; 10% of
      // docs are the held-out shard
      ("t28_trigram_backoff", n => TextOps.trigramBackoffOn(
        spark.range(n).selectExpr("id AS doc_id",
          "CASE WHEN id % 10 = 0 THEN 'held' ELSE 's' END AS source",
          """concat_ws(' ', transform(sequence(0, 39),
               j -> concat('w', pmod(xxhash64(id * 11 + j), 300))))
             AS text"""), heldOut = "held")),
      // q131: q60's one user-keyed shuffle, then users-sized lag
      // union into a 2-row percentile agg
      ("q131_funnel_lag", n => EventOps.funnelLagOn(
        EventOps.funnelOn(spark.range(n).selectExpr(
          "pmod(xxhash64(id), 2000) AS user_id",
          "CASE WHEN id % 3 = 0 THEN 'view' WHEN id % 3 = 1 " +
            "THEN 'click' ELSE 'purchase' END AS event_type",
          "id * 60000000 AS us")))),
      // g31: g27's capped wedge kernel on the train split + a
      // VALUE-bounded distinct-score AUC window (never a global
      // candidate sort) — constant-degree ladder keeps wedges linear
      ("g31_linkpred_auc", n => GraphOps.linkPredAucOn(
        spark.range(n).selectExpr("id AS a",
          "explode(array(id + 1, id + 2)) AS b"))),
      // m13: map-side frame-energy explode + one media-keyed window
      // + (media, island) agg — nothing crosses media items
      ("m13_silence_trim", n => MultimodalOps.silenceTrimOn(
        spark.range(n).selectExpr("id AS media_id",
          """concat_ws('', transform(sequence(0, 199),
               j -> chr(97 + cast(pmod(xxhash64(id * 7 + j), 26) as int))))
             AS txt"""))),
      // q133: the q26 daily partial agg; index math on the 7×types
      // frame — linear in events by construction
      ("q133_seasonality_index", n => EventOps.seasonalityIndexOn(
        spark.range(n).selectExpr(
          "concat('t', id % 5) AS event_type",
          "date_add(date'2024-01-01', cast(pmod(id div 5, 365) as int))"
            + " AS day",
          "cast(pmod(xxhash64(id), 100) as double) AS v")
          .groupBy("event_type", "day")
          .agg(org.apache.spark.sql.functions.round(
            org.apache.spark.sql.functions.sum("v"), 2).as("v")))),
      // q132: one user-keyed session sort + a types²-bounded count
      // agg; the Jacobi solve reads <=42 collected numbers per
      // channel — corpus volume pays only the sessionization
      ("q132_markov_attribution", n => EventOps.markovAttributionOn(
        spark.range(n).selectExpr("id AS event_id",
          "pmod(xxhash64(id), 2000) AS user_id",
          "CASE pmod(xxhash64(id, 5), 5) WHEN 0 THEN 'view' " +
            "WHEN 1 THEN 'click' WHEN 2 THEN 'signup' " +
            "WHEN 3 THEN 'error' ELSE 'purchase' END AS event_type",
          "id * 60000000 AS us"))),
      // g33: 4 forward σ levels + 3 backward δ levels, each one
      // superstep join keyed (pivot, node) — O(pivots·|E|) per level
      // with the pivot COUNT (not the graph) as the state multiplier;
      // ladder graph (the g24 shape) keeps every frontier live
      ("g33_betweenness", n => GraphOps.betweennessOn(
        spark.range(n).selectExpr("id AS src", "id + 1 AS dst")
          .unionAll(spark.range(n).selectExpr("id + 1 AS src",
            "id AS dst")), nPivots = 4, maxHops = 4)),
      // g32: one symmetric degree agg + the constant-maxK bounded
      // explode (a row multiplier, never a join) — linear in |E|
      ("g32_rich_club", n => GraphOps.richClubOn(
        spark.range(n).selectExpr("id AS a", "id + 1 AS b"))),
      // q136: pair generation is the per-basket self-join — baskets
      // of fixed size 4 (id div 4 grouping), so candidate pairs track
      // the ORDER count linearly; dimension joins broadcast
      ("q136_basket_rules", n => RelationalQueries.basketRulesOn(
        spark.range(n).selectExpr("id div 4 AS ok",
          "pmod(xxhash64(id), 500) AS pk").distinct())),
      // q137: q26's daily partial-agg then one stats agg + one fold
      // per type on the bounded SERIES frame — event volume pays only
      // the daily rollup (the q128 shape)
      ("q137_cusum", n => EventOps.cusumOn(
        spark.range(n).selectExpr(
          "concat('t', id % 5) AS event_type",
          "date_add(date'2024-01-01', cast(pmod(id div 5, 365) as int))"
            + " AS day",
          "cast(pmod(xxhash64(id), 100) as double) AS v")
          .groupBy("event_type", "day")
          .agg(org.apache.spark.sql.functions.round(
            org.apache.spark.sql.functions.sum("v"), 2).as("v")))),
      // t29: one per-source window sort of the doc-COUNT frame plus a
      // sources-sized rollup — linear in docs, never touches tokens
      ("t29_gini", n => TextOps.giniConcentrationOn(
        spark.range(n).selectExpr("concat('s', id % 20) AS source",
          "id AS doc_id", "pmod(xxhash64(id), 1000) AS x"))),
      // q144: the PIT join is keyed on user_id with the interval
      // predicate residual — per-user intervals bounded by state
      // changes, so the shuffle is fact-sized; 100 users, ~n/5
      // purchases
      ("q144_scd2_pit", n => {
        val e = spark.range(n).selectExpr("id AS event_id",
          "id % 100 AS user_id",
          "CASE pmod(xxhash64(id, 3), 5) WHEN 0 THEN 'purchase' " +
            "WHEN 1 THEN 'view' WHEN 2 THEN 'click' " +
            "WHEN 3 THEN 'signup' ELSE 'error' END AS event_type",
          "id * 60000000 AS us")
        val dim = EventOps.scd2IntervalsOn(e)
        val facts = e.filter(org.apache.spark.sql.functions
          .col("event_type") === "purchase")
          .select(org.apache.spark.sql.functions.col("event_id"),
            org.apache.spark.sql.functions.col("user_id"),
            org.apache.spark.sql.functions.col("us"))
        facts.join(dim,
          facts("user_id") === dim("user_id") &&
            facts("us") >= dim("valid_from") &&
            (dim("valid_to").isNull || facts("us") < dim("valid_to")))
          .select(facts("event_id"),
            org.apache.spark.sql.functions.col("state"))
      }),
      // t34: the corpus pays one token count; the pairwise join runs
      // on the bounded top-k frame (sources × k rows) — corpus growth
      // re-prices only the count stage
      ("t34_vocab_overlap", n => TextOps.vocabOverlapOn(
        docsN(spark, n), k = 100)),
      // g37: one degree agg + the oriented triangle join — the g02
      // shape with a scalar fold on top; ladder graph
      ("g37_transitivity", n => GraphOps.transitivityOn(
        spark.range(n).selectExpr("id AS a", "id + 1 AS b"))),
      // c35: a narrow contains screen (canaries broadcast) + a
      // 2-row roll-up — pure scan-linear (the gate shape inlined over
      // the synthetic corpus with the same plant rule)
      ("c35_canary_scan", n => docsN(spark, n).selectExpr("doc_id",
          """CASE WHEN doc_id % 97 = 0 THEN
               concat(text, ' canary:eval-alpha-3f9c')
             ELSE text END AS text""")
        .filter("contains(text, 'canary:eval-alpha-3f9c')")
        .selectExpr("count(*) AS n_docs", "min(doc_id) AS first_doc")),
      // q130: q128's series fold + two grouped percentiles on the
      // days×types frame — event volume pays only the daily agg
      ("q130_holt_anomalies", n => EventOps.holtAnomaliesOn(
        EventOps.holtOn(
          spark.range(n).selectExpr(
            "concat('t', id % 5) AS event_type",
            "date_add(date'2024-01-01', cast(pmod(id div 5, 365) as int))"
              + " AS day",
            "cast(pmod(xxhash64(id), 100) as double) AS v")
            .groupBy("event_type", "day")
            .agg(org.apache.spark.sql.functions.round(
              org.apache.spark.sql.functions.sum("v"), 2).as("v"))))))

    // optional args: probe names to run (default all) — fast local
    // iteration on a newly-added probe without the full sweep
    val selected =
      if (args.isEmpty) probes
      else probes.filter { case (name, _) => args.contains(name) }

    println(f"${"operator"}%-24s ${"n1"}%8s ${"t1(s)"}%8s ${"rows1"}%9s " +
      f"${"n4"}%8s ${"t4(s)"}%8s ${"rows4"}%9s ${"ratio"}%6s")
    selected.foreach { case (name, build) =>
      val vectorOp = name.startsWith("d05") || name.startsWith("s02") ||
        name.startsWith("s04") || name.startsWith("s08")
      // the gx contrast pair includes a deliberately-quadratic exact
      // form — probe it at a base where 16x is affordable
      val base = if (name.startsWith("gx")) 2500L
        else if (vectorOp) 25000L else 10000L
      // warm-up at EACH measured size: a probe whose 4x run compiles a
      // different plan (d05_planes_scaled switches planes at n=100k)
      // would otherwise fold fresh codegen cost into t4 and inflate the
      // ratio the committed artifact interprets
      timed(build(base))
      val (t1, r1) = timed(build(base))
      timed(build(base * 4))
      val (t4, r4) = timed(build(base * 4))
      println(f"$name%-24s $base%8d $t1%8.2f $r1%9d ${base * 4}%8d " +
        f"$t4%8.2f $r4%9d ${t4 / t1}%6.2f")
    }

    // ITERATION scaling (time vs supersteps at fixed data): with the
    // checkpointEvery cadence the per-superstep cost must stay flat —
    // iters=25 ≈ 5× iters=5, not superlinear from an unbounded 25-deep
    // plan. (The probes above scale DATA at fixed iters; this block
    // scales ITERS at fixed data — the claim the cadence parameter
    // exists for.)
    if (args.isEmpty) {
      val n = 20000L
      def edges = spark.range(n).selectExpr("id AS src",
        s"explode(transform(sequence(0, 7), " +
          s"j -> pmod(xxhash64(id, j), ${n}L))) AS dst")
      def run(iters: Int): Double = {
        val t0 = System.nanoTime()
        graft.operators.Persists.scoped {
          GraphOps.pagerankOn(edges, iters = iters, checkpointEvery = 5)
            .count()
        }
        (System.nanoTime() - t0) / 1e9
      }
      run(5) // warm-up
      val t5 = run(5)
      val t25 = run(25)
      println(f"pr_iters_ckpt5           n=$n iters5=$t5%6.2f s " +
        f"iters25=$t25%6.2f s per-iter ratio=${t25 / t5 / 5.0}%5.2f " +
        "(1.0 = perfectly flat)")
    }

    // ORIENTATION skew contrast (the g07 claim): 8 fixed hubs at the
    // LOW ids, hub degree ∝ n — id-orientation keeps every hub edge
    // forward, so the two-hop join fans deg(hub)² ∝ n² per hub and the
    // 4× ratio lands near 16×; degree-orientation points edges INTO
    // hubs (leaf forward degree ≤ a constant) and stays near 4×. Same
    // triangle counts either way (GraphOpsSpec pins equality).
    if (args.isEmpty) locally {
      def skewEdges(n: Long) = spark.range(8, n).selectExpr(
        """explode(array(
             pmod(xxhash64(id, 1), 8),
             pmod(xxhash64(id, 2), 8),
             8 + pmod(xxhash64(id, 3), id - 8 + 1))) AS a""",
        "id AS b").where("a < b").distinct()
      def run(build: Long => org.apache.spark.sql.DataFrame,
          n: Long): Double = {
        val t0 = System.nanoTime()
        graft.operators.Persists.scoped { build(n).count() }
        (System.nanoTime() - t0) / 1e9
      }
      val base = 1500L
      def byId(n: Long) = GraphOps.trianglesOn(skewEdges(n))
      def byDeg(n: Long) =
        GraphOps.trianglesOn(GraphOps.orientByDegree(skewEdges(n)))
      run(byId, base); run(byDeg, base) // warm-up
      val (i1, i4) = (run(byId, base), run(byId, base * 4))
      val (d1, d4) = (run(byDeg, base), run(byDeg, base * 4))
      println(f"tri_id_orient_skew       $base%8d $i1%8.2f ${base * 4}%8d " +
        f"$i4%8.2f ratio=${i4 / i1}%6.2f (quadratic hub fan-out)")
      println(f"tri_deg_orient_skew      $base%8d $d1%8.2f ${base * 4}%8d " +
        f"$d4%8.2f ratio=${d4 / d1}%6.2f (bounded forward degree)")
    }

    // PREFIX-FILTER vs BRUTE contrast (the d14 claim): same exact
    // θ-join answer, but brute scores all n²/2 pairs (16× at 4×) while
    // the prefix inverted index touches candidates sharing a rare-gram
    // prefix token (near-linear on the fixed-cluster-size corpus).
    if (args.isEmpty) locally {
      import org.apache.spark.sql.functions._
      def brute(n: Long) = {
        val g = dupDocsN(spark, n)
          .withColumn("grams", array_distinct(expr(
            "regexp_extract_all(text, '.{5}', 0)")))
          .filter(size(col("grams")) > 0).select("doc_id", "grams")
        g.as("a").join(g.as("b"), col("a.doc_id") < col("b.doc_id"))
          .select(round(size(array_intersect(col("a.grams"), col("b.grams")))
              .cast("double") /
            size(array_union(col("a.grams"), col("b.grams"))), 4)
            .as("jaccard"))
          .filter(col("jaccard") >= 0.5)
      }
      def prefix(n: Long) =
        graft.operators.DedupOps.prefixJaccardOn(dupDocsN(spark, n), 0.5)
      def run(f: => DataFrame): Double = {
        val t0 = System.nanoTime()
        graft.operators.Persists.scoped { f.count() }
        (System.nanoTime() - t0) / 1e9
      }
      val base = 2500L
      run(brute(base)); run(prefix(base)) // warm-up
      val (b1, b4) = (run(brute(base)), run(brute(base * 4)))
      val (p1, p4) = (run(prefix(base)), run(prefix(base * 4)))
      println(f"dx_brute_jaccard         $base%8d $b1%8.2f ${base * 4}%8d " +
        f"$b4%8.2f ratio=${b4 / b1}%6.2f (all-pairs)")
      println(f"dx_prefix_jaccard        $base%8d $p1%8.2f ${base * 4}%8d " +
        f"$p4%8.2f ratio=${p4 / p1}%6.2f (prefix inverted index)")
    }

    // TOP-K: native bounded aggregate vs the window sort (the q109
    // claim) — same answer (TopKAggSpec pins it), but the window form
    // shuffles and sorts every row of every group while the aggregate
    // moves k·|groups| partial rows. Both are linear in n; the probe
    // commits the CONSTANT gap at a realistic rows-per-group ratio.
    if (args.isEmpty) locally {
      import org.apache.spark.sql.functions._
      graft.functions.GraftFunctions.register(spark)
      def frame(n: Long) = spark.range(n).selectExpr(
        "concat('g', id % 100) AS g",
        "pmod(xxhash64(id), 100000) / 7.0d AS score", "id")
      def viaAgg(n: Long) = frame(n).groupBy("g")
        .agg(expr("graft_topk(score, id, 5)").as("tk"))
        .select(explode(col("tk")))
      def viaWindow(n: Long) = frame(n)
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("g")
            .orderBy(col("score").desc, col("id"))))
        .filter(col("rn") <= 5)
      def run(f: => DataFrame): Double = {
        val t0 = System.nanoTime()
        graft.operators.Persists.scoped { f.count() }
        (System.nanoTime() - t0) / 1e9
      }
      val n = 2000000L
      run(viaAgg(n)); run(viaWindow(n)) // warm-up
      val (ta, tw) = (run(viaAgg(n)), run(viaWindow(n)))
      println(f"topk_agg_vs_window       n=$n agg=$ta%6.2f s " +
        f"window=$tw%6.2f s speedup=${tw / ta}%5.2f x")
    }

    // q111 follow-up (VERDICT r10 watch item): one more doubling. The
    // recorded 4x ratio of 2.98 was read as fixed-cost amortization of
    // the 20-row trailing frame; if the 4x→16x LEG lands ≈4x the frame
    // is linear and the question closes, superlinear means restaging.
    if (args.isEmpty) locally {
      def mk(n: Long) = EventOps.rollingZscoreOn(
        spark.range(n).selectExpr("id AS event_id",
          "concat('t', id % 50) AS event_type", "id AS us",
          "pmod(xxhash64(id, 3), 1000) / 10.0d AS value"))
      timed(mk(10000)); val (t1, _) = timed(mk(10000))
      timed(mk(40000)); val (t4, _) = timed(mk(40000))
      timed(mk(160000)); val (t16, _) = timed(mk(160000))
      println(f"q111_zscore_16x          t1=$t1%6.2f t4=$t4%6.2f " +
        f"t16=$t16%6.2f leg1=${t4 / t1}%5.2f leg2=${t16 / t4}%5.2f")
    }

    // g09 per-iteration cost (replaces the load-corrupted r10 sweep
    // row): HITS on a fixed synthetic digraph at 3 vs 6 iterations —
    // with barriered loop bodies per-iteration cost is flat, so the
    // 6-iter run must land ≈2x the 3-iter run, not superlinear.
    if (args.isEmpty) locally {
      def edges = spark.range(100000).selectExpr("id AS src",
        "explode(array(id + 1, pmod(id * 37, 100000))) AS dst")
      timed(GraphOps.hitsOn(edges, 3))
      val (t3, _) = timed(GraphOps.hitsOn(edges, 3))
      val (t6, _) = timed(GraphOps.hitsOn(edges, 6))
      println(f"g09_hits_iters           n=100000 iters3=$t3%6.2f s " +
        f"iters6=$t6%6.2f s ratio=${t6 / t3}%5.2f (flat ≈ 2.0)")
    }

    // s18/t19 round-cost flatness: the training loops at doubled round
    // counts on FIXED data — state is model/vocabulary-sized, so the
    // extra rounds must cost ≈ linearly in the round count.
    if (args.isEmpty) locally {
      def vecs = vecsN(spark, 25000).selectExpr("vec_id",
        "transform(embedding, x -> cast(x AS DOUBLE)) AS v")
      timed(SimilarityOps.kmeansTrainOn(vecs, rounds = 1))
      val (k1, _) = timed(SimilarityOps.kmeansTrainOn(vecs, rounds = 1))
      val (k3, _) = timed(SimilarityOps.kmeansTrainOn(vecs, rounds = 3))
      println(f"s18_kmeans_rounds        n=25000 r1=$k1%6.2f s " +
        f"r3=$k3%6.2f s ratio=${k3 / k1}%5.2f (flat ≈ 3.0)")
      def docs = docsN(spark, 25000)
      timed(TokenizerOps.bpeTrainOn(docs, merges = 1))
      val (b1, _) = timed(TokenizerOps.bpeTrainOn(docs, merges = 1))
      val (b5, _) = timed(TokenizerOps.bpeTrainOn(docs, merges = 5))
      println(f"t19_bpe_merges_rounds    n=25000 m1=$b1%6.2f s " +
        f"m5=$b5%6.2f s ratio=${b5 / b1}%5.2f (vocab-sized rounds)")
    }
    spark.stop()
  }
}
