// Plan-quality audit over EVERY gate entry (VERDICT r11 item 10):
// prints the physical-plan properties that matter at scale — filter
// pushdown into the parquet scan, column pruning (ReadSchema),
// broadcast vs shuffle joins, codegen spans — and ASSERTS two
// contracts per plan:
//   1. no-unexpected-NLJ: a BroadcastNestedLoopJoin may appear only in
//      the documented quadratic oracle anchors / bounded-broadcast
//      shapes listed in `nljAllowed` (each with the reason inline);
//      anywhere else it fails the audit (exit 1).
//   2. pushdown-where-filterable: entries listed in `mustPush` declare
//      a base-table predicate that MUST reach the scan
//      (PushedFilters non-empty) — the canary set that catches a
//      pushdown regression; a blanket non-empty rule would be wrong
//      (many entries legitimately scan whole tables).
// Streaming entries are audited through the batch plan over their
// completed sink, as before.
package graft.tools

import org.apache.spark.sql.SparkSession

object PlanAudit {
  /** Entries whose plans legitimately contain a BroadcastNestedLoopJoin,
    * with why. Two classes: (a) the self-contained quadratic ORACLE
    * ANCHORS — exact kNN / brute-cosine built inline so the DuckDB twin
    * can hash-check them; their production twins serve from stored
    * artifacts and never NLJ (g02i/g31i/s25i…); (b) tiny-broadcast
    * crossJoins — a ≤cells/1-row model or scalar frame broadcast
    * against the corpus (bounded by construction). */
  private val nljAllowed: Set[String] = Set(
    // (a) inline exact-kNN / brute-cosine oracle anchors
    "s01_ann_brute", "s02_ann_lsh", "s03_knn_join", "s05_ann_lsh_portable",
    "s07_ann_filtered",
    "s13_mmr_rerank", "s20_hard_negatives", "s22_random_projection",
    "s24_ann_projected", "s25_ann_recall", "s29_ann_matryoshka",
    "s30_farthest_first", "s31_rocchio_feedback", "s33_knn_classifier",
    "g02_knn_triangles", "g03_knn_components", "g04_knn_graph_lsh",
    "g07_triangles_degree", "g13_clustering_coeff", "g14_assortativity",
    "g16_kcore", "g18_label_spread", "g19_scc_knn", "g20_components_scc",
    "g21_modularity", "g22_community_merge", "g23_louvain_move",
    "g25_ktruss", "g31_linkpred_auc", "g36_degree_slope",
    "g37_transitivity", "d17_semdedup_cells", "s23_pca_power",
    "s26_embedding_drift", "s12_embedding_covariance",
    "s32_ann_ivf_filtered", "s34_ann_graph_beam",
    // s36 reuses s34's walk plus s30's broadcast-centers maxmin kernel
    "s36_ann_graph_beam_multi",
    // s38-s40 serve the same walk (entry-nodes crossJoin + maxmin
    // seeds) from stored edge artifacts; the broadcast frames stay
    // queries×entries-bounded and the tombstone manifest anti-join is
    // takedown-sized
    "s38_ann_graph_beam_stored", "s39_ann_beam_tombstoned",
    "s40_ann_beam_compacted", "s43_ann_beam_served_auto",
    "s44_ann_beam_batched_tomb", "s45_ann_beam_delta_batched",
    "s47_ann_beam_lifecycle", "s48_ann_beam_lifecycle_auto",
    "s50_ann_beam_delta_capped", "s53_ann_beam_maint_served",
    "s35_ivf_assign_delta",
    // (b) bounded-broadcast crossJoins (1-row scalars / ≤k models /
    // value-bounded grids, each documented at the call site)
    "q100_equidepth_bins", "q108_histogram_sketch", "q111_rolling_zscore",
    "q117_mad_outliers", "q118_stream_histogram", "q124_ab_report",
    "q126_markov_transitions", "q128_holt_trend", "q130_holt_anomalies",
    "q132_markov_attribution", "q133_seasonality_index",
    "q134_stream_seasonality", "q137_cusum_changepoints",
    "q138_acf_daily", "q139_benford_audit", "q141_rolling_median",
    "q148_psi_drift", "q154_kaplan_meier", "q28_approx_ndv",
    "q70_approx_percentile",
    "t16_shard_divergence", "t27_zipf_slope", "t28_trigram_backoff",
    "t30_flesch_kincaid", "c16_temperature_mix", "c21_contamination_report",
    "c22_token_budget_mix", "c24_temperature_mix_langid",
    "c26_curriculum", "c29_dataset_card", "c30_waterfill_budget",
    "c31_doremi_weights", "c32_doremi_waterfill", "c33_mix_anneal",
    "c35_canary_scan", "c02_source_quota", "c07_sample_stratified",
    "c17_reservoir_sample", "c34_neyman_sample",
    "d19_dedup_report", "d20_minhash_calibration", "d23_band_planner",
    "m12_shot_boundaries", "s16_pq_train", "s17_sq8_report",
    "s21_pq_train_full", "s27_rrf_fusion", "s28_ivf_balance",
    "s14_kmeans_step", "s18_kmeans_train", "s19_ann_ivfpq",
    "s06_ann_pq", "s10_ann_pq_adc", "t24_fertility_by_lang",
    "q16_intersect", "q113_skyline", "q119_trend_ols",
    "q122_ewma_daily", "q123_scd2_intervals", "q131_funnel_lag",
    "q142_time_weighted_avg", "q145_wilson_conversion",
    "q146_cumulative_users", "q147_stream_cumulative_users",
    "t17_ngram_novelty", "t22_quality_classifier", "t23_quality_tiers",
    "t29_gini_concentration", "t34_vocab_overlap", "t35_html_extract",
    "g17_copart_projection", "g24_harmonic_landmarks",
    "g26_diameter_sweep", "g27_link_prediction", "g33_betweenness",
    "g34_feature_propagation", "q104_interval_overlap",
    "q104a_interval_overlap_auto", "q48_range_join",
    // (b) continued — calibrated from the first full-corpus audit
    // (each verified a 1-row/scalar or ≤model-size broadcast side):
    // q23 IS the cross-join operator; c12's bloom bits, c19's split
    // point, c27's importance normalizer, g06/g09's per-serve mass/
    // norm scalars, g30's total-count scalar, g32's k-grid sweep,
    // q125/q135/q136's quantile+total scalars, the CMS sketch-row
    // serves (q89/t14/t15), t09/t10's corpus-total scalars, t21's
    // phrase-model broadcast
    "q23_cross_join", "c12_decontam_bloom", "c19_temporal_split",
    "c27_dsir_select", "g06_pagerank_dangling", "g09_hits",
    "g30_ppmi_scores", "g32_rich_club", "q125_stream_ab",
    "q135_rfm_segments", "q136_basket_rules", "q89_stream_cms",
    "t09_unigram_logprob", "t10_bm25", "t14_cms_serve",
    "t15_cms_incremental", "t21_phrase_search")

  /** Pushdown canaries: each declares a base-table predicate that must
    * appear in PushedFilters — a regression here means the scan reads
    * the whole table for a filtered query. */
  private val mustPush: Set[String] = Set(
    "q02_filter_pred", "q03_flagship", "q21_in_subquery",
    "p01_planner_dpccp", "p15_planner_job_exact", "p16_planner_job_ikkbz",
    "q69_zonemap_pruned", "q90_bloom_skip",
    // q157/q158: the l_quantity predicate must reach the scan BELOW
    // the pushed partial aggregate (q158: below it AND the chain)
    "q157_eager_agg", "q158_eager_agg_chain")
    // NOT canaries (first-audit calibration): q60/q115/c19 evaluate
    // their event_type predicates as conditional aggregation over the
    // full stream — there is no scan-level filter to push

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .withExtensions(new graft.functions.GraftExtensions) // deployed config
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val all = graft.SparkEntry.queries
    val names = args.drop(1) match {
      case more if more.nonEmpty => more.toSeq
      case _ => all.keys.toSeq.sorted
    }
    var violations = List.empty[String]
    var audited = 0
    names.foreach { name =>
      // build INSIDE the scope: construction-time barriers (signature
      // frames, d09's CC labels) must drain per query, as Verify does —
      // built outside, they'd land in the global queue and pin cache
      // for the rest of the audit
      try graft.operators.Persists.scoped {
        val df = all(name)(spark, sfDir)
        // execute THIS QueryExecution: with AQE the codegen'd FINAL plan
        // only exists once the adaptive plan finishes (a .write would
        // plan a separate QueryExecution and leave this one unfinalized)
        df.collect()
        // the finalized adaptive plan prints "final +- == Initial Plan =="
        // — audit only the final section
        val plan = df.queryExecution.executedPlan.toString
          .split("== Initial Plan ==").head
        def count(p: String) = p.r.findAllIn(plan).size
        val nlj = count("BroadcastNestedLoopJoin")
        val pushed = count("PushedFilters: \\[[^\\]]")
        println(s"== $name")
        println(s"   scans=${count("FileScan parquet")} " +
          s"pushedFilters=$pushed " +
          s"bhj=${count("BroadcastHashJoin")} smj=${count("SortMergeJoin")} " +
          s"shj=${count("ShuffledHashJoin")} nlj=$nlj " +
          s"exchanges=${count("Exchange")} " +
          // codegen spans render as "*(n)" prefixes; count distinct span ids
          s"wscg=${"\\*\\(\\d+\\)".r.findAllIn(plan).toSeq.distinct.size}")
        // ReadSchema lines: show pruning
        "ReadSchema: [^\n]+".r.findAllIn(plan).toSeq.distinct.take(6)
          .foreach(s => println("   " + s.take(150)))
        // hive-partitioned reads: a non-empty PartitionFilters proves
        // directory-level pruning (q54)
        "PartitionFilters: \\[[^\\]]+\\]".r.findAllIn(plan).toSeq.distinct
          .foreach(s => println("   " + s.take(150)))
        if (nlj > 0 && !nljAllowed(name))
          violations ::= s"$name: $nlj unexpected BroadcastNestedLoopJoin"
        if (pushed == 0 && mustPush(name))
          violations ::= s"$name: pushdown canary has no PushedFilters"
        audited += 1
      } catch {
        case e: Throwable =>
          violations ::= s"$name: audit failed (${e.getMessage})"
      }
    }
    println(s"\nAUDITED $audited/${names.size} plans; " +
      s"${violations.size} violations")
    violations.reverse.foreach(v => println(s"VIOLATION $v"))
    spark.stop()
    if (violations.nonEmpty) sys.exit(1)
  }
}
