package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":...,"queries":{...}}.
  *
  * Execution is forced through the noop datasource (full computation of
  * every output row, zero write cost) — `count()` would let Spark prune
  * the project/compute away and fake the numbers.
  */
object Bench {

  /** Headline set: flagship join, heavy agg, window, planner-built join,
    * and one of each pipeline family. Frozen since round 2 — the r2..rN
    * totals are a like-for-like trajectory; do NOT add queries here. */
  val headline: Seq[String] = Seq(
    "q03_flagship", "q08_agg_tpch_q1", "q04_join_inner", "q13_window_rank",
    "q14_window_frame", "q21_in_subquery", "q26_events_daily",
    "p01_planner_dpccp", "d01_dedup_exact", "d02_dedup_minhash",
    "t01_quality", "t03_fingerprint_md5", "s01_ann_brute", "s02_ann_lsh",
    "s04_ann_ivf")

  /** Second series guarding the round-5 operators (bucketed join, z-order,
    * event analytics, packing, BM25, incremental dedup, PQ ANN). Kept
    * separate from [[headline]] so the legacy trajectory stays comparable;
    * this series baselines at round 6. */
  val headlineR5: Seq[String] = Seq(
    "q57_bucketed_join", "q58_zorder_cluster", "q60_funnel",
    "q61_sessionize", "q62_retention", "c09_pack_sequences", "t10_bm25",
    "d12i_dedup_incremental", "s06_ann_pq")

  /** Third series guarding the round-6/7 operators (zone-map manifest +
    * pruned read, pattern funnel, multi-probe and trained IVF, approx
    * percentile, CDC merge + incremental view, heavy hitters, epoch
    * shuffle). Baselines at round 7; like the r5 series it never
    * touches [[headline]], so the legacy trajectory stays comparable.
    * Streaming entries (q75/q78) are excluded like every other series:
    * stream-scaffold startup would dominate the number. */
  val headlineR7: Seq[String] = Seq(
    "q66_zonemap", "q69_zonemap_pruned", "q67_funnel_pattern",
    "s08_ann_ivf_multiprobe", "s09_ann_ivf_trained",
    "q70_approx_percentile", "s10_ann_pq_adc",
    "q74_cdc_merge", "q77_incremental_view", "q79_snapshot_diff",
    "t12_heavy_hitters", "c11_epoch_shuffle", "q80i_table_stats_approx",
    "p10_planner_statsest", "q81_unpivot", "t13_bigram_logprob")

  /** Fourth series guarding the round-8 operators (bucketed-base CDC
    * merge, cell-partitioned IVF serving, served count-min sketch,
    * bloom-prefiltered decontamination, bloom-skip point lookup,
    * edit-distance candidate verification).
    * Baselines at round 8; never touches the earlier series, so their
    * trajectories stay comparable. Streaming entries (q85-q87) are
    * excluded like every series: stream-scaffold startup would
    * dominate. */
  val headlineR8: Seq[String] = Seq(
    "q88_cdc_merge_bucketed", "s11_ann_ivf_partitioned", "t14_cms_serve",
    "c12_decontam_bloom", "q90_bloom_skip", "d13i_dedup_editdist",
    "q93_time_travel", "q94_dq_audit", "q95_lateral_topk",
    "q96_manifest_incremental", "c13_chunking", "c14_negative_samples")

  /** Fifth series guarding the round-9 operators (PageRank and
    * triangle counting over relation-derived graphs, the embedding
    * covariance matrix, exact-k reservoir sampling, equi-depth
    * binning, recursive CTE, tolerance/forward as-of). Baselines at
    * round 9; never touches the earlier series. (Round 11 restores
    * g02_knn_triangles here: round 10 had silently swapped in the
    * served g02i form (~0.4 s vs ~3.5 s inline), breaking
    * comparability with BENCH_r09's recording — ADVICE r10. The served
    * form is benched in the r11 series instead.) */
  val headlineR9: Seq[String] = Seq(
    "g01i_pagerank", "g02_knn_triangles", "g03i_knn_components",
    "g05i_personalized_pagerank", "s12_embedding_covariance",
    "c17_reservoir_sample", "q100_equidepth_bins", "q101_recursive_cte",
    "q102_asof_tolerance", "q103_asof_forward", "q104_interval_overlap",
    "q105_hll_sketch_column")

  /** Sixth series guarding the round-10 operators (dangling-mass
    * PageRank, degree-oriented triangles, incremental warm-started
    * PageRank re-convergence, stats-derived interval binning, HITS,
    * gap-fill interpolation, the mergeable histogram column, the
    * native bounded top-k aggregate, and the lossless prefix-filtered
    * jaccard join). Baselines at round 10; never touches the earlier
    * series. Streaming q110 is excluded like every stream entry. */
  val headlineR10: Seq[String] = Seq(
    "g06i_pagerank_dangling", "g07i_triangles_degree",
    "g08i_pagerank_incremental", "q104a_interval_overlap_auto",
    "g09i_hits", "q107_gapfill_interpolate", "q108_histogram_sketch",
    "q109_topk_agg", "d14_dedup_prefix_jaccard",
    "g10i_khop_bfs", "g11_pagerank_weighted", "q111_rolling_zscore",
    "q112_event_transitions", "q113_skyline", "t16_shard_divergence",
    "g12i_components_star", "q115_attribution", "c19_temporal_split",
    "g13i_clustering_coeff", "t17_ngram_novelty",
    "g14i_assortativity", "q116_concurrency", "s14_kmeans_step",
    "c20_neardup_decontam", "m06_ahash", "d15_cdc_chunks",
    "q117_mad_outliers", "g15i_components_incremental",
    "s16_pq_train", "m07_ahash_candidates", "c21_contamination_report",
    "c22_token_budget_mix", "g16i_kcore", "q119_trend_ols",
    "s17_sq8_report", "q120_session_paths", "g17_copart_projection",
    "g18i_label_spread")

  /** Seventh series guarding the round-11 operators. Baselines at
    * round 11; never touches the earlier series. Also hosts
    * g02i_knn_triangles (the served triangle form round 10 had
    * wrongly swapped into the frozen r9 series — see [[headlineR9]]).
    * NOTE: the r10-series totals recorded in BENCH_r10.json were
    * load-corrupted (VERDICT r10) — BENCH_r11's r10-series totals,
    * produced under the blocking-drain discipline in `once()`, are
    * the enforceable r10 baseline (BASELINE.md round-11 note). */
  val headlineR11: Seq[String] = Seq(
    "g02i_knn_triangles", "d16_substring_overlap",
    "c23_substring_decontam", "t18_langid_model",
    "c24_temperature_mix_langid", "s18_kmeans_train",
    "t19_bpe_merges", "s19_ann_ivfpq", "g19i_scc_knn",
    "g20i_components_scc", "g21i_modularity", "g22i_community_merge",
    "t20_bpe_encode", "d17_semdedup_cells", "s20_hard_negatives",
    "c25_multilingual_pipeline", "s21_pq_train_full",
    "g23i_louvain_move", "s23_pca_power", "t21_phrase_search",
    "s22_random_projection", "s24_ann_projected", "c26_curriculum",
    "m08_ahash_clusters", "c27_dsir_select", "t22_quality_classifier",
    "d18_intradoc_dedup", "s25_ann_recall", "q122_ewma_daily",
    "t23_quality_tiers", "g24i_harmonic_landmarks",
    "t24_fertility_by_lang", "d19_dedup_report", "s26_embedding_drift",
    "q123_scd2_intervals", "m09_dct_phash", "m10_phash_candidates",
    "c29_dataset_card", "q124_ab_report", "g25i_ktruss",
    "c30_waterfill_budget", "s27_rrf_fusion", "s28_ivf_balance",
    "t25_langid_margin", "d20i_minhash_calibration",
    "g26i_diameter_sweep", "g27i_link_prediction",
    "q126_markov_transitions", "g28i_random_walks",
    "g29i_skipgram_pairs", "g30i_ppmi_scores",
    "t26_gopher_repetition", "s29_ann_matryoshka",
    "c31_doremi_weights", "q128_holt_trend",
    "m11_dhash", "t27_zipf_slope", "s30_farthest_first",
    "c32_doremi_waterfill", "q130_holt_anomalies",
    "d21_dedup_containment", "m12_shot_boundaries",
    "t28_trigram_backoff", "q131_funnel_lag",
    "q132_markov_attribution", "g31_linkpred_auc",
    "p11_planner_anneal", "q133_seasonality_index",
    "c33_mix_anneal", "m13_silence_trim",
    "p12_planner_ikkbz", "q135_rfm_segments", "q136_basket_rules",
    "q137_cusum_changepoints", "q138_acf_daily", "q139_benford_audit",
    "g32i_rich_club", "t29_gini_concentration", "g33i_betweenness",
    "d22i_soft_dedup_weights", "m14_mime_sniff",
    "s31_rocchio_feedback", "t30_flesch_kincaid",
    "q141_rolling_median", "g34i_feature_propagation",
    "c34_neyman_sample", "d23_band_planner",
    "g35_weighted_sssp", "t32_rake_keywords",
    "q142_time_weighted_avg", "t33_canonicalize",
    "d24_dedup_canonical", "s32_ann_ivf_filtered",
    "q143_csv_malformed", "g36i_degree_slope",
    "g37_transitivity", "q144_scd2_pit_join", "c35_canary_scan",
    "q145_wilson_conversion", "s33_knn_classifier", "p14_planner_2po",
    "t34_vocab_overlap", "s34_ann_graph_beam",
    "g38_katz_centrality", "q146_cumulative_users",
    "q148_psi_drift",
    "t31_encoding_audit", "p13_planner_auto")

  /** Eighth series guarding the round-12 operators; baselines at
    * round 12, never touches the earlier series. Hosts the VERDICT
    * r11 perf items: g31i/s25i serve their expensive inline halves
    * from stored artifacts (specs pin served ≡ inline), and
    * m08i times m08's CAPPED production band beside the
    * deliberately-wide gate contrast entry. */
  val headlineR12: Seq[String] = Seq(
    "g31i_linkpred_auc", "s25i_ann_recall", "m08i_ahash_production",
    "t35_html_extract", "q149_takedown_read", "q150_takedown_compact",
    "s35_ivf_assign_delta", "s35i_ivf_assign_trained",
    "m15_imageio_decode", "p15_planner_job_exact", "p16_planner_job_ikkbz",
    "q151_stream_html_extract", "q152_stream_takedown",
    "q153_stats_after_takedown", "p17_planner_job_insql",
    "c36_k_anonymity", "q154_kaplan_meier", "p18_planner_histstats",
    "p19_planner_samplest", "p20_planner_insql_sample")

  /** Ninth series guarding the round-13 operators; baselines at
    * round 13, never touches the earlier series. The planner gates
    * time the deployed in-SQL estimator tiers (synopsis/profile
    * collection is fingerprint-cached, so cold includes it once and
    * warm measures the plan-execute path); p23 times the full LEO
    * loop (execute under hist + harvest + re-plan under feedback). */
  val headlineR13: Seq[String] = Seq(
    "p21_planner_insql_repeat", "p22_planner_insql_auto",
    "p23_planner_insql_feedback", "q155_takedown_positional",
    "q156_takedown_pos_compact", "s36_ann_graph_beam_multi",
    "q157_eager_agg")

  /** Tenth series guarding the round-14 operators; baselines at
    * round 14, never touches the earlier series. p24 times the full
    * hands-free LEO loop (execute under hist + listener harvest +
    * re-plan under feedback); s37 times the whole incremental path
    * (base-graph build + delta beam-insert + serve) — the rebuild it
    * replaces is s36's shape on every batch. */
  val headlineR14: Seq[String] = Seq(
    "p24_planner_feedback_auto", "p25_planner_insql_like",
    "p26_planner_insql_outer", "q158_eager_agg_chain",
    "s37_ann_graph_beam_delta", "s37i_ann_beam_delta_served")

  /** Eleventh series guarding the round-15 operators; baselines at
    * round 15, never touches the earlier series. p27 times the
    * synopsis-priced IN planning path (first run pays the amortized
    * full-synopsis collection, warm reads the memo); p28 times the
    * 17-relation width-ceiling plan+execute; q159 the outer-join
    * eager-aggregation rewrite. */
  val headlineR15: Seq[String] = Seq(
    "p27_planner_insql_in", "p28_planner_job_ceiling",
    "q159_eager_agg_outer")

  /** Twelfth series guarding the round-16 operators; baselines at
    * round 16, never touches the earlier series. s38 serves the
    * batched 2-hop walk from the stored 1∪2-hop artifact (half the
    * classic serve's barriers — the r15 negative turned into an
    * index-layout win); s39–s41 are the ANN takedown serves
    * (merge-on-read beam, compacted beam, tombstoned IVF); s42 is
    * the compaction decision row. First run per entry pays any
    * artifact build; warm serves are the measured steady. */
  val headlineR16: Seq[String] = Seq(
    "s38_ann_graph_beam_stored", "s39_ann_beam_tombstoned",
    "s40_ann_beam_compacted", "s41_ann_ivf_tombstoned",
    "s42_ann_compaction_trigger", "s43_ann_beam_served_auto")

  /** Thirteenth series: the s44–s51 lifecycle/stream family joins the
    * bench with the s53 ingest/serve split applied FIRST (VERDICT r16
    * item 3) — serve-only forms only, so the series baselines on
    * serve numbers, never on the ingest work the whole-loop gate
    * entries bundle (s45 whole-loop ≈ 12 s of which ~8 s is the
    * insert walk; s53 serve-only ≈ 1.8 s — BASELINE.md round-16
    * note). s44/s46/s53 are already serve-only declared entries; the
    * s47i–s51i twins serve the same stored artifacts their inline
    * forms maintain (ServeTwinsSpec pins served ≡ inline for each).
    * First run per entry pays any artifact build (the r16-series
    * convention); warm serves are the measured steady. Whole-loop
    * forms (s45/s47/s48/s49/s50/s51) stay gated, unbenched. */
  val headlineR17: Seq[String] = Seq(
    "s44_ann_beam_batched_tomb", "s46_ann_maintenance_trigger",
    "s53_ann_beam_maint_served", "s47i_ann_lifecycle_served",
    "s48i_ann_lifecycle_auto_served", "s50i_ann_beam_capped_served",
    "s49i_stream_maint_served", "s51i_stream_lifecycle_served")

  /** Bench-only variants (not gate entries — the gate form stays the
    * self-contained computation its oracle checks). d12i times the
    * incremental candidate join against the PRE-MATERIALIZED signature
    * table — the production ingest shape; the r6 series' d12 recomputed
    * the whole corpus' md5 signature frame inside every timed run and
    * was 65% of total_r5, masking regressions in the other 8 queries
    * (BASELINE.md: "round-7 series change"). */
  val benchOnly: Map[String, (org.apache.spark.sql.SparkSession, String) =>
      org.apache.spark.sql.DataFrame] = Map(
    "d12i_dedup_incremental" ->
      ((s, d) => graft.operators.DedupOps.incrementalDedupFromSigs(s, d)),
    // d13's inline form re-fingerprints the corpus per run (the same
    // d12-at-r6 pattern); the series times the candidate join +
    // levenshtein verify over the stored signature table
    "d13i_dedup_editdist" ->
      ((s, d) => graft.operators.DedupOps.editDistDedupFromSigs(s, d)),
    // d20's calibration roll-up over the stored signature table
    "d20i_minhash_calibration" ->
      ((s, d) => graft.operators.DedupOps.minhashCalibrationFromSigs(s, d)),
    // d22's weighting over the stored signature table (the d12i serve
    // discipline; SoftDedupMimeSpec pins served = inline)
    "d22i_soft_dedup_weights" ->
      ((s, d) => graft.operators.DedupOps.softDedupWeightsFromSigs(s, d)),
    // q80's exact multi-column countDistinct plans as an Expand (7x the
    // input) and was 34% of total_r7 — masking the other queries, the
    // d12-at-r6 pattern. The series times the approx-NDV production
    // shape instead; the gate entry q80 stays the exact ANALYZE whose
    // oracle hash-checks
    "q80i_table_stats_approx" ->
      ((s, d) => graft.plans.TableStats.profileApprox(s, d, "orders")),
    // g03's gate form rebuilds the whole mutual-kNN graph inline (the
    // oracle-checked self-contained computation); the production shape
    // serves components from the edge artifact the ingest built once
    "g03i_knn_components" ->
      ((s, d) => graft.operators.GraphOps.componentsFromEdges(s, d)),
    // g01/g05's gate forms re-derive the orders⋈lineitem co-purchase
    // edges inside every run — 62% of the r9 series was edge
    // derivation, not PageRank (VERDICT r9). The series times the
    // supersteps over the pre-materialized edge artifact instead (the
    // same d12i/g03i discipline, third application — BASELINE.md
    // documents the r10 series change); GraphOpsSpec pins that served
    // results equal the inline gate forms
    "g01i_pagerank" ->
      ((s, d) => graft.operators.GraphOps.pagerankFromEdges(s, d)),
    "g05i_personalized_pagerank" ->
      ((s, d) => graft.operators.GraphOps.personalizedPagerankFromEdges(s, d)),
    // g08's warm re-convergence served fully from stored state (edge
    // artifact + base rank artifact — both ingest-time)
    "g08i_pagerank_incremental" ->
      ((s, d) => graft.operators.GraphOps.incrementalPagerankFromArtifacts(s, d)),
    // g15's warm re-convergence served fully from stored state (edge
    // artifact + base component labels — both ingest-time)
    "g15i_components_incremental" ->
      ((s, d) => graft.operators.GraphOps.incrementalComponentsFromArtifacts(s, d)),
    // g06/g09 over the stored one-way supplier→customer edge artifact
    // (the g01i discipline, fourth application — the r10 series was
    // re-deriving the orders⋈lineitem join inside both timed runs)
    "g06i_pagerank_dangling" ->
      ((s, d) => graft.operators.GraphOps.pagerankDanglingFromEdges(s, d)),
    "g09i_hits" ->
      ((s, d) => graft.operators.GraphOps.hitsFromEdges(s, d)),
    // g24's labeled landmark BFS over the same stored edge artifact
    // (the g10i discipline; GraphOpsSpec pins served ≡ inline)
    "g24i_harmonic_landmarks" ->
      ((s, d) => graft.operators.GraphOps.harmonicFromEdges(s, d)),
    // g33's σ/δ sweeps over the same stored edge artifact
    "g33i_betweenness" ->
      ((s, d) => graft.operators.GraphOps.betweennessFromEdges(s, d)),
    // g32/g34/g36 over their stored edge artifacts (the g02i/g03i
    // serve discipline; GraphOpsSpec pins served = inline)
    "g32i_rich_club" ->
      ((s, d) => graft.operators.GraphOps.richClubFromEdges(s, d)),
    "g34i_feature_propagation" ->
      ((s, d) => graft.operators.GraphOps.featurePropagationFromEdges(s, d)),
    "g36i_degree_slope" ->
      ((s, d) => graft.operators.GraphOps.degreeSlopeFromEdges(s, d)),
    // g25's truss sweeps over the stored unfloored-kNN edges
    "g25i_ktruss" ->
      ((s, d) => graft.operators.GraphOps.ktrussFromEdges(s, d)),
    // g26's double sweep over the stored co-purchase edges
    "g26i_diameter_sweep" ->
      ((s, d) => graft.operators.GraphOps.diameterFromEdges(s, d)),
    // g27's wedge scoring over the stored co-purchase edges
    "g27i_link_prediction" ->
      ((s, d) => graft.operators.GraphOps.linkPredictionFromEdges(s, d)),
    // g28's walk supersteps over the stored co-purchase edges
    "g28i_random_walks" ->
      ((s, d) => graft.operators.GraphOps.randomWalksFromEdges(s, d)),
    // g29's windowed pair counts over the stored walk corpus
    "g29i_skipgram_pairs" ->
      ((s, d) => graft.operators.GraphOps.skipGramFromWalks(s, d)),
    // g30's PPMI over pairs from the stored walk corpus
    "g30i_ppmi_scores" ->
      ((s, d) => graft.operators.GraphOps.ppmiFromWalks(s, d)),
    "g10i_khop_bfs" ->
      ((s, d) => graft.operators.GraphOps.bfsFromEdges(s, d)),
    "g12i_components_star" ->
      ((s, d) => graft.operators.GraphOps.starComponentsFromEdges(s, d)),
    // the unfloored-kNN analytics over the shared stored edge artifact
    // (knnEdgesAllPath) — their gate forms rebuild the quadratic exact
    // graph inline as the oracle anchor, which was ~4.5 s of every
    // timed run × six entries; GraphOpsSpec pins served ≡ inline
    "g02i_knn_triangles" ->
      ((s, d) => graft.operators.GraphOps.trianglesFromEdges(s, d)),
    "g07i_triangles_degree" ->
      ((s, d) => graft.operators.GraphOps.trianglesDegreeFromEdges(s, d)),
    "g13i_clustering_coeff" ->
      ((s, d) => graft.operators.GraphOps.clusteringFromEdges(s, d)),
    "g14i_assortativity" ->
      ((s, d) => graft.operators.GraphOps.assortativityFromEdges(s, d)),
    "g16i_kcore" ->
      ((s, d) => graft.operators.GraphOps.kcoreFromEdges(s, d)),
    "g18i_label_spread" ->
      ((s, d) => graft.operators.GraphOps.labelSpreadFromEdges(s, d)),
    // g19/g20 over stored edge artifacts (their gate forms rebuild the
    // quadratic kNN graph inline as the oracle anchor; GraphOpsSpec's
    // served≡inline pins cover the same artifacts)
    "g19i_scc_knn" ->
      ((s, d) => graft.operators.GraphOps.sccFromEdges(s, d)),
    "g20i_components_scc" ->
      ((s, d) => graft.operators.GraphOps.componentsSccFromEdges(s, d)),
    "g21i_modularity" ->
      ((s, d) => graft.operators.GraphOps.modularityFromEdges(s, d)),
    "g22i_community_merge" ->
      ((s, d) => graft.operators.GraphOps.communityMergeFromEdges(s, d)),
    "g23i_louvain_move" ->
      ((s, d) => graft.operators.GraphOps.louvainFromEdges(s, d)),
    // g31's AUC eval over the stored unfloored-kNN pair artifact (the
    // gate form rebuilds the exact kNN graph inline as its oracle
    // anchor — 13.2 s of every timed run, VERDICT r11 defect #4)
    "g31i_linkpred_auc" ->
      ((s, d) => graft.operators.GraphOps.linkPredAucFromEdges(s, d)),
    // s25's recall eval with the exact brute TRUTH served from its
    // stored artifact — the timed work is the LSH retrieval under
    // evaluation, not the truth rebuild
    "s25i_ann_recall" ->
      ((s, d) => graft.operators.SimilarityOps.annRecallEvalFromTruth(s, d)),
    // m08's capped production band (hamming ≤ 3); the gate entry
    // keeps the deliberately-wide hamming ≤ 16 contrast band
    "m08i_ahash_production" ->
      ((s, d) => graft.operators.MultimodalOps.ahashClustersProduction(s, d)),
    // s35's production twin: the delta batch assigned into the STORED
    // trained cells (no retrain; IncrementalIvfSpec pins determinism)
    "s35i_ivf_assign_trained" ->
      ((s, d) => graft.operators.SimilarityOps.ivfAssignDeltaTrained(s, d)),
    // s37's production twin: delta insert + serve against the STORED
    // base-edge artifact — per-batch maintenance without the gate
    // form's in-entry graph rebuild (d12i/s35i discipline; spec pins
    // served ≡ inline)
    "s37i_ann_beam_delta_served" ->
      ((s, d) => graft.operators.SimilarityOps.graphBeamDeltaServed(s, d)),
    // the r17 serve-only twins (VERDICT r16 item 3): each serves the
    // stored artifact its inline gate form maintains per run;
    // ServeTwinsSpec pins served ≡ inline for every pair
    "s47i_ann_lifecycle_served" ->
      ((s, d) =>
        graft.operators.SimilarityOps.graphBeamLifecycleMaintServed(s, d)),
    "s48i_ann_lifecycle_auto_served" ->
      ((s, d) =>
        graft.operators.SimilarityOps.graphBeamLifecycleAutoServed(s, d)),
    "s50i_ann_beam_capped_served" ->
      ((s, d) => graft.operators.SimilarityOps.graphBeamCappedServed(s, d)),
    "s49i_stream_maint_served" ->
      ((s, d) =>
        graft.streaming.StreamAnnMaintain.beamMaintainStreamServed(s, d)),
    "s51i_stream_lifecycle_served" ->
      ((s, d) =>
        graft.streaming.StreamAnnMaintain.beamLifecycleStreamServed(s, d)))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // same extensions as Verify: benchmark the engine WITH its injected
    // optimizer rules — that is the deployed configuration
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val all = SparkEntry.queries ++ benchOnly
    // one warm-up action so JVM/codegen/FS-cache startup isn't billed to
    // the first query
    all("q01_scan_project")(spark, sfDir).write
      .format("noop").mode("overwrite").save()
    // d12i's signature table and s09's trained centroid model are
    // ingest-time artifacts: materialize them OUTSIDE the timed region
    // (idempotent — subsequent bench runs just hit the FS existence
    // check), so the timed queries measure the serve path
    graft.operators.DedupOps.signatureTablePath(spark, sfDir)
    graft.operators.SimilarityOps.trainedModelPath(spark, sfDir)
    graft.operators.SimilarityOps.cellPartitionedPath(spark, sfDir)
    graft.operators.SimilarityOps.ivfPqPath(spark, sfDir)
    graft.operators.GraphOps.knnEdgesPath(spark, sfDir)
    graft.operators.GraphOps.knnEdgesAllPath(spark, sfDir)
    graft.operators.GraphOps.knnDirectedEdgesPath(spark, sfDir)
    graft.operators.SimilarityOps.bruteTruthPath(spark, sfDir)
    graft.operators.SimilarityOps.beamBaseEdgesPath(spark, sfDir)
    graft.operators.GraphOps.coPurchaseEdgesPath(spark, sfDir)
    graft.operators.GraphOps.walkCorpusPath(spark, sfDir)
    graft.operators.GraphOps.pagerankRanksPath(spark, sfDir)
    graft.sources.Bucketing.writeBucketed(
      spark, sfDir, "orders", "o_orderkey", "g_orders_b")

    // Cache discipline (reference: MyUtils.clearCache drops the OS page
    // cache between timed runs, drop_cache.sh): with
    // SPARK_GRAFT_DROP_CACHE set, sync + drop the page cache before each
    // query's FIRST run so "cold" means cold I/O too. Default OFF: the
    // default "cold" number is a WARM-FS first run — it measures
    // per-query codegen/planning, not disk, and the JSON says so via
    // "cache" so totals are interpretable round-over-round.
    val dropCache = sys.env.get("SPARK_GRAFT_DROP_CACHE").exists(_.nonEmpty)
    def tryDropCache(): Boolean =
      try {
        new ProcessBuilder("sync").start().waitFor()
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get("/proc/sys/vm/drop_caches"), "3\n")
        true
      } catch { case _: Exception => false }
    var dropsFailed = false

    // Timed runs per query (default 2 — the reference's execution loop,
    // QueryOptExperiment.java:596-613, times each query twice). The
    // reported per-query number is the MIN of the warm runs (run 2..N —
    // with the default 2 runs that is exactly the second run, keeping
    // the series comparable with round 3): the first run is dominated by
    // one-time codegen compilation + plan costs that amortize away on a
    // long-running cluster; it is emitted separately as the cold cost.
    // SPARK_GRAFT_RUNS=1 = single-shot (pre-round-3 semantics, value ==
    // cold); anything unparseable is a loud error, not a silent default.
    val runsPerQuery = sys.env.get("SPARK_GRAFT_RUNS") match {
      case None => 2
      case Some(v) => v.toIntOption.filter(_ >= 1).getOrElse(
        sys.error(s"SPARK_GRAFT_RUNS must be a positive integer, got '$v'"))
    }
    def runSeries(names: Seq[String]): Seq[(String, Double, Double, Seq[Double])] =
      names.map { name =>
        // a name missing from the query maps must FAIL the bench, not
        // silently shrink the series total (a wiring typo would read
        // as a speedup)
        val fn = all.getOrElse(name,
          sys.error(s"bench series names unknown query '$name'"))
        locally {
          def once(): Double = {
            // Timing sits INSIDE the barrier scope and the drain is
            // BLOCKING: the r10 record showed what the old shape costs —
            // ~90 queries of async-unpersist backlog starved the
            // barrier-dense graph kernels' storage pool (g09i recorded
            // 133.6 s vs 7.7 s standalone, VERDICT r10), and a blocking
            // drain timed AROUND the scope would bill cleanup to the
            // query instead.
            var dt = 0.0
            graft.operators.Persists.scopedBlocking {
              val t0 = System.nanoTime()
              fn(spark, sfDir).write.format("noop").mode("overwrite").save()
              dt = (System.nanoTime() - t0) / 1e9
            }
            // Residual state the scope can't see, dropped outside the
            // timed region: catalog-cached frames persisted outside the
            // barrier discipline, and the iterative kernels'
            // localCheckpoint blocks (freed by ContextCleaner only after
            // the RDD references are collected — hence the gc nudge).
            spark.catalog.clearCache()
            System.gc()
            dt
          }
          try {
            if (dropCache && !tryDropCache()) dropsFailed = true
            val cold = once()
            // ALL warm runtimes are kept and emitted (queries_warm) so a
            // cross-round reader can re-aggregate; the headline per-query
            // number is their MIN, declared via "steady_agg" in the JSON —
            // with SPARK_GRAFT_RUNS>2, min-of-warm is biased low relative
            // to a single second run, and the field makes that visible
            // instead of silently changing the series' meaning.
            // runs=1 means NO warm run happened: queries_warm stays empty
            // (emitting the cold time there would feed codegen-dominated
            // numbers into a reader's warm series) and steady == cold,
            // the pre-round-3 single-shot semantics
            val warm =
              if (runsPerQuery == 1) Seq.empty[Double]
              else Seq.fill(runsPerQuery - 1)(once())
            (name, if (warm.isEmpty) cold else warm.min, cold, warm)
          }
          catch {
            case e: Throwable =>
              System.err.println(s"[bench] $name failed: ${e.getMessage}")
              (name, -1.0, -1.0, Seq.empty[Double])
          }
        }
      }
    val results = runSeries(headline)
    val resultsR5 = runSeries(headlineR5)
    val resultsR7 = runSeries(headlineR7)
    val resultsR8 = runSeries(headlineR8)
    val resultsR9 = runSeries(headlineR9)
    val resultsR10 = runSeries(headlineR10)
    val resultsR11 = runSeries(headlineR11)
    val resultsR12 = runSeries(headlineR12)
    val resultsR13 = runSeries(headlineR13)
    val resultsR14 = runSeries(headlineR14)
    val resultsR15 = runSeries(headlineR15)
    val resultsR16 = runSeries(headlineR16)
    val resultsR17 = runSeries(headlineR17)
    val cacheState =
      if (dropCache && !dropsFailed) "dropped-before-cold-runs"
      else if (dropCache) "drop-requested-but-failed"
      else "warm-fs"
    def steadyJson(rs: Seq[(String, Double, Double, Seq[Double])]): String =
      rs.map { case (k, v, _, _) => f""""$k":$v%.3f""" }
        .mkString("{", ",", "}")
    def coldJson(rs: Seq[(String, Double, Double, Seq[Double])]): String =
      rs.map { case (k, _, c, _) => f""""$k":$c%.3f""" }
        .mkString("{", ",", "}")
    def warmJson(rs: Seq[(String, Double, Double, Seq[Double])]): String =
      rs.map { case (k, _, _, w) =>
        s""""$k":${w.map(t => f"$t%.3f").mkString("[", ",", "]")}"""
      }.mkString("{", ",", "}")
    val qs = steadyJson(results)
    // EVERY series participates in the failure check — r16 was missing
    // here, so a failing r16 query would have silently read as a
    // faster series total (measurement-bug fix, OPTIMIZATION_r16.md)
    val failed = (results ++ resultsR5 ++ resultsR7 ++ resultsR8 ++
      resultsR9 ++ resultsR10 ++ resultsR11 ++ resultsR12 ++ resultsR13 ++
      resultsR14 ++ resultsR15 ++ resultsR16 ++ resultsR17)
      .collect { case (k, v, _, _) if v < 0 => s""""$k"""" }
    if (failed.nonEmpty) {
      // a failing query must read as a FAILURE, not as a faster total —
      // report value:-1 + the failed list and exit nonzero
      println(s"""{"metric":"total","value":-1,"unit":"sec","queries":$qs,""" +
        s""""failed":${failed.mkString("[", ",", "]")},"sf":"$sfDir"}""")
      spark.stop()
      sys.exit(1)
    }
    // "value"/"queries"/"total_cold" stay the LEGACY series only — the
    // r2..rN trajectory must remain like-for-like; the round-5 operator
    // series is emitted alongside under *_r5 keys and baselines at r6.
    val total = results.map(_._2).sum
    val totalCold = results.map(_._3).sum
    val totalR5 = resultsR5.map(_._2).sum
    val totalR5Cold = resultsR5.map(_._3).sum
    val totalR7 = resultsR7.map(_._2).sum
    val totalR7Cold = resultsR7.map(_._3).sum
    val totalR8 = resultsR8.map(_._2).sum
    val totalR8Cold = resultsR8.map(_._3).sum
    val totalR9 = resultsR9.map(_._2).sum
    val totalR9Cold = resultsR9.map(_._3).sum
    val totalR10 = resultsR10.map(_._2).sum
    val totalR10Cold = resultsR10.map(_._3).sum
    val totalR11 = resultsR11.map(_._2).sum
    val totalR11Cold = resultsR11.map(_._3).sum
    val totalR12 = resultsR12.map(_._2).sum
    val totalR12Cold = resultsR12.map(_._3).sum
    val totalR13 = resultsR13.map(_._2).sum
    val totalR13Cold = resultsR13.map(_._3).sum
    val totalR14 = resultsR14.map(_._2).sum
    val totalR14Cold = resultsR14.map(_._3).sum
    val totalR15 = resultsR15.map(_._2).sum
    val totalR15Cold = resultsR15.map(_._3).sum
    val totalR16 = resultsR16.map(_._2).sum
    val totalR16Cold = resultsR16.map(_._3).sum
    val totalR17 = resultsR17.map(_._2).sum
    val totalR17Cold = resultsR17.map(_._3).sum
    // compact totals object, duplicated in BOTH output lines: the
    // driver archives only the last 2000 chars of stdout, so the
    // per-query detail line alone is truncation-prone as series
    // accumulate (the r7 lesson, re-flagged r9).
    val totalsJson =
      f""""totals":{"legacy":$total%.3f,"legacy_cold":$totalCold%.3f,""" +
        f""""r5":$totalR5%.3f,"r5_cold":$totalR5Cold%.3f,""" +
        f""""r7":$totalR7%.3f,"r7_cold":$totalR7Cold%.3f,""" +
        f""""r8":$totalR8%.3f,"r8_cold":$totalR8Cold%.3f,""" +
        f""""r9":$totalR9%.3f,"r9_cold":$totalR9Cold%.3f,""" +
        f""""r10":$totalR10%.3f,"r10_cold":$totalR10Cold%.3f,""" +
        f""""r11":$totalR11%.3f,"r11_cold":$totalR11Cold%.3f,""" +
        f""""r12":$totalR12%.3f,"r12_cold":$totalR12Cold%.3f,""" +
        f""""r13":$totalR13%.3f,"r13_cold":$totalR13Cold%.3f,""" +
        f""""r14":$totalR14%.3f,"r14_cold":$totalR14Cold%.3f,""" +
        f""""r15":$totalR15%.3f,"r15_cold":$totalR15Cold%.3f,""" +
        f""""r16":$totalR16%.3f,"r16_cold":$totalR16Cold%.3f,""" +
        f""""r17":$totalR17%.3f,"r17_cold":$totalR17Cold%.3f,"failed":0}"""
    // Per-query recorded baselines (fixtures/bench_baselines.json, a
    // flat {"name": seconds} map regenerated at each round's close by
    // tools/bench_baselines.py from the closing run's line-1 detail):
    // the driver archives only the final ~2000 chars of stdout, so the
    // totals line itself must carry each series' WORST movers for a
    // drift to be attributable from the artifact alone (VERDICT r13
    // item 5 — the r11-series 177→218 s swing was unattributable).
    val baselines: Map[String, Double] =
      try {
        val txt = java.nio.file.Files.readString(
          java.nio.file.Paths.get("fixtures/bench_baselines.json"))
        """"([^"]+)"\s*:\s*([0-9.eE+-]+)""".r.findAllMatchIn(txt)
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
      } catch { case scala.util.control.NonFatal(_) => Map.empty }
    // top-3 [name, baseline, now] by now/baseline ratio, emitted ONLY
    // for series whose worst entry moved ≥1.25× (quiet series stay
    // silent — the archived tail's byte budget goes to the drifters)
    def movers(rs: Seq[(String, Double, Double, Seq[Double])]): Option[String] = {
      val scored = rs.flatMap { case (k, v, _, _) =>
        baselines.get(k).filter(_ > 0).map(b => (k, b, v, v / b)) }
      if (!scored.exists(_._4 >= 1.25)) None
      else Some(scored.sortBy(-_._4).take(3).map {
        case (k, b, v, _) => f"""["$k",$b%.3f,$v%.3f]"""
      }.mkString("[", ",", "]"))
    }
    val moversJson = {
      val parts = Seq(
        "legacy" -> results, "r5" -> resultsR5, "r7" -> resultsR7,
        "r8" -> resultsR8, "r9" -> resultsR9, "r10" -> resultsR10,
        "r11" -> resultsR11, "r12" -> resultsR12, "r13" -> resultsR13,
        "r14" -> resultsR14, "r15" -> resultsR15, "r16" -> resultsR16,
        "r17" -> resultsR17)
        .flatMap { case (t, rs) => movers(rs).map(j => s""""$t":$j""") }
      if (parts.isEmpty) "" else s""","movers":{${parts.mkString(",")}}"""
    }
    // line 1: full per-query detail (head of stdout — complete in the
    // build log even when the archived tail cuts it)
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,""" +
        f""""queries_cold":${coldJson(results)},"total_cold":$totalCold%.3f,""" +
        f""""queries_warm":${warmJson(results)},"steady_agg":"min",""" +
        f""""queries_r5":${steadyJson(resultsR5)},"total_r5":$totalR5%.3f,""" +
        f""""queries_r5_cold":${coldJson(resultsR5)},"total_r5_cold":$totalR5Cold%.3f,""" +
        f""""queries_r5_warm":${warmJson(resultsR5)},""" +
        f""""queries_r7":${steadyJson(resultsR7)},"total_r7":$totalR7%.3f,""" +
        f""""queries_r7_cold":${coldJson(resultsR7)},"total_r7_cold":$totalR7Cold%.3f,""" +
        f""""queries_r7_warm":${warmJson(resultsR7)},""" +
        f""""queries_r8":${steadyJson(resultsR8)},"total_r8":$totalR8%.3f,""" +
        f""""queries_r8_cold":${coldJson(resultsR8)},"total_r8_cold":$totalR8Cold%.3f,""" +
        f""""queries_r8_warm":${warmJson(resultsR8)},""" +
        f""""queries_r9":${steadyJson(resultsR9)},"total_r9":$totalR9%.3f,""" +
        f""""queries_r9_cold":${coldJson(resultsR9)},"total_r9_cold":$totalR9Cold%.3f,""" +
        f""""queries_r9_warm":${warmJson(resultsR9)},""" +
        f""""queries_r10":${steadyJson(resultsR10)},"total_r10":$totalR10%.3f,""" +
        f""""queries_r10_cold":${coldJson(resultsR10)},"total_r10_cold":$totalR10Cold%.3f,""" +
        f""""queries_r10_warm":${warmJson(resultsR10)},""" +
        f""""queries_r11":${steadyJson(resultsR11)},"total_r11":$totalR11%.3f,""" +
        f""""queries_r11_cold":${coldJson(resultsR11)},"total_r11_cold":$totalR11Cold%.3f,""" +
        f""""queries_r11_warm":${warmJson(resultsR11)},""" +
        f""""queries_r12":${steadyJson(resultsR12)},"total_r12":$totalR12%.3f,""" +
        f""""queries_r12_cold":${coldJson(resultsR12)},"total_r12_cold":$totalR12Cold%.3f,""" +
        f""""queries_r12_warm":${warmJson(resultsR12)},""" +
        f""""queries_r13":${steadyJson(resultsR13)},"total_r13":$totalR13%.3f,""" +
        f""""queries_r13_cold":${coldJson(resultsR13)},"total_r13_cold":$totalR13Cold%.3f,""" +
        f""""queries_r13_warm":${warmJson(resultsR13)},""" +
        f""""queries_r14":${steadyJson(resultsR14)},"total_r14":$totalR14%.3f,""" +
        f""""queries_r14_cold":${coldJson(resultsR14)},"total_r14_cold":$totalR14Cold%.3f,""" +
        f""""queries_r14_warm":${warmJson(resultsR14)},""" +
        f""""queries_r15":${steadyJson(resultsR15)},"total_r15":$totalR15%.3f,""" +
        f""""queries_r15_cold":${coldJson(resultsR15)},"total_r15_cold":$totalR15Cold%.3f,""" +
        f""""queries_r15_warm":${warmJson(resultsR15)},""" +
        f""""queries_r16":${steadyJson(resultsR16)},"total_r16":$totalR16%.3f,""" +
        f""""queries_r16_cold":${coldJson(resultsR16)},"total_r16_cold":$totalR16Cold%.3f,""" +
        f""""queries_r16_warm":${warmJson(resultsR16)},""" +
        f""""queries_r17":${steadyJson(resultsR17)},"total_r17":$totalR17%.3f,""" +
        f""""queries_r17_cold":${coldJson(resultsR17)},"total_r17_cold":$totalR17Cold%.3f,""" +
        f""""queries_r17_warm":${warmJson(resultsR17)},""" +
        f""""runs_per_query":$runsPerQuery,"cache":"$cacheState","sf":"$sfDir",""" +
        totalsJson + "}")
    // line 2: newest-series per-query detail (secondary visibility —
    // may truncate in the archived tail; the totals do NOT live here)
    println(
      f"""{"metric":"detail_recent","unit":"sec",""" +
        f""""queries_r11":${steadyJson(resultsR11)},""" +
        f""""queries_r12":${steadyJson(resultsR12)},""" +
        f""""queries_r13":${steadyJson(resultsR13)},""" +
        f""""queries_r14":${steadyJson(resultsR14)},""" +
        f""""queries_r15":${steadyJson(resultsR15)},""" +
        f""""queries_r16":${steadyJson(resultsR16)},""" +
        f""""queries_r17":${steadyJson(resultsR17)},""" +
        f""""runs_per_query":$runsPerQuery,"cache":"$cacheState","sf":"$sfDir"}""")
    // line 3 — LAST line, the full driver contract (VERDICT r16 item
    // 2): ONE JSON with a per-query "queries" map covering EVERY
    // series (the driver's PERF comparison needs per-query steadies;
    // `parsed` had been null since r01 because the [info] prefix — now
    // stripped via build.sbt's StdoutOutput — broke a bare json.loads,
    // and this line carried totals only). Key order keeps the totals
    // and movers at the END so the archived 2000-char tail still shows
    // them even though the per-query map makes the line long. The same
    // JSON is also written to target/bench_last.json as a sidecar.
    val allResults = Seq(results, resultsR5, resultsR7, resultsR8,
      resultsR9, resultsR10, resultsR11, resultsR12, resultsR13,
      resultsR14, resultsR15, resultsR16, resultsR17).flatten
    val lastLine =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec",""" +
        f""""queries":${steadyJson(allResults)},""" +
        f""""runs_per_query":$runsPerQuery,"cache":"$cacheState","sf":"$sfDir",""" +
        totalsJson + moversJson + "}"
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("target/bench_last.json"), lastLine + "\n")
    catch { case scala.util.control.NonFatal(_) => () }
    println(lastLine)
    spark.stop()
  }
}
