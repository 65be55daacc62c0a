// Plan-quality audit: prints the physical-plan properties that matter at
// scale for the headline queries — filter pushdown into the parquet scan,
// column pruning (ReadSchema), broadcast vs shuffle joins, codegen spans.
package graft.tools

import org.apache.spark.sql.SparkSession

object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .withExtensions(new graft.functions.GraftExtensions) // deployed config
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val interesting = Seq(
      "q02_filter_pred", "q03_flagship", "q04_join_inner", "q08_agg_tpch_q1",
      "q21_in_subquery", "p01_planner_dpccp", "d02_dedup_minhash",
      "s01_ann_brute", "s04_ann_ivf", "t01_quality",
      "q46_salted_join", "q47_asof_join", "q48_range_join",
      "c01_hash_split", "c02_source_quota", "d09_dedup_keep",
      "c05_pii_redact", "c07_sample_stratified", "t08_repetition",
      "d11_dedup_keep_quality", "q54_partitioned_sink",
      "t09_unigram_logprob", "d12_dedup_incremental",
      "s06_ann_pq", "s07_ann_filtered",
      "q57_bucketed_join", "q58_zorder_cluster",
      "c09_pack_sequences", "t10_bm25",
      "q60_funnel", "q61_sessionize", "q62_retention", "t11_bpe_pairs",
      "q67_funnel_pattern", "q69_zonemap_pruned", "s09_ann_ivf_trained",
      "s10_ann_pq_adc",
      "q74_cdc_merge", "q77_incremental_view", "q79_snapshot_diff",
      "t12_heavy_hitters", "c11_epoch_shuffle", "q80_table_stats",
      "q81_unpivot", "t13_bigram_logprob",
      // round-8 additions: the measured-stats planner, the source-layout
      // round trips, the bucketed CDC degraded path, partition-pruned
      // IVF, the served CMS. Streaming entries are audited through the
      // batch plan over their completed sink (the stateful half's plan
      // properties are spec'd in StreamFunnel/StreamCdc specs).
      "p10_planner_statsest", "q76_schema_evolution",
      "q82_write_audit_publish", "q88_cdc_merge_bucketed",
      "s11_ann_ivf_partitioned", "t14_cms_serve",
      "c12_decontam_bloom", "q90_bloom_skip", "d13_dedup_editdist",
      "c13_chunking", "q92_vacuum", "q93_time_travel", "q94_dq_audit",
      "q95_lateral_topk", "q96_manifest_incremental", "q97_orc_source",
      // round-9 additions: the graph family, the covariance single
      // pass, the scale-shaped binning/sampling, the as-of variants
      "g01_pagerank", "g02_knn_triangles", "g03_knn_components",
      "g04_knn_graph_lsh", "g05_personalized_pagerank",
      "s12_embedding_covariance", "s13_mmr_rerank",
      "c17_reservoir_sample", "c18_dedup_aware_split",
      "q100_equidepth_bins", "q101_recursive_cte",
      "q102_asof_tolerance", "q103_asof_forward",
      // round-9 post-audit landings (VERDICT r9 §wrong item 3) + the
      // round-10 additions: interval joins (manual + stats-derived
      // bin), sketch columns, the graph family's new members, the
      // resample/interpolate pass, the exact histogram column, the
      // native bounded top-k aggregate, the lossless prefix join
      "q104_interval_overlap", "q104a_interval_overlap_auto",
      "q105_hll_sketch_column",
      // the streaming sketch/topk twins audit their SERVE plan (the
      // batch query over the completed sink — the stateful half's
      // properties live in StreamHllSpec / the q110 oracle hash)
      "q106_stream_hll", "q110_stream_topk",
      "g06_pagerank_dangling", "g07_triangles_degree", "g09_hits",
      "q107_gapfill_interpolate", "q108_histogram_sketch",
      "q109_topk_agg", "d14_dedup_prefix_jaccard",
      // round-10 second batch: BFS proximity, weighted PR, rolling
      // anomaly scoring, the transition matrix, the two-phase skyline,
      // the shard-divergence drift detector
      "g10_khop_bfs", "g11_pagerank_weighted", "q111_rolling_zscore",
      "q112_event_transitions", "q113_skyline", "t16_shard_divergence",
      "g12_components_star", "q115_attribution", "c19_temporal_split",
      "g13_clustering_coeff", "t17_ngram_novelty",
      "g14_assortativity", "q116_concurrency", "s14_kmeans_step",
      "c20_neardup_decontam", "m06_ahash", "d15_cdc_chunks",
      "q117_mad_outliers", "g15_components_incremental",
      "s16_pq_train", "m07_ahash_candidates", "c21_contamination_report",
      "c22_token_budget_mix", "g16_kcore", "q119_trend_ols",
      "s17_sq8_report", "q120_session_paths", "g17_copart_projection",
      "g18_label_spread",
      // round-11 additions: exact-substring overlap/decontamination,
      // the model-table langid + derived-lang mix, the two training
      // loops run to completion, the composed IVF-PQ serve, and the
      // directed/symmetrized SCC kernels
      "d16_substring_overlap", "c23_substring_decontam",
      "t18_langid_model", "c24_temperature_mix_langid",
      "s18_kmeans_train", "t19_bpe_merges", "s19_ann_ivfpq",
      "g19_scc_knn", "g20_components_scc", "g21_modularity",
      "g22_community_merge", "t20_bpe_encode", "d17_semdedup_cells",
      "s20_hard_negatives", "c25_multilingual_pipeline",
      "s21_pq_train_full", "g23_louvain_move", "s23_pca_power",
      "t21_phrase_search", "s22_random_projection",
      "s24_ann_projected", "c26_curriculum", "m08_ahash_clusters",
      "c27_dsir_select", "t22_quality_classifier",
      "d18_intradoc_dedup", "s25_ann_recall", "q122_ewma_daily",
      "t23_quality_tiers", "g24_harmonic_landmarks",
      "t24_fertility_by_lang", "d19_dedup_report", "s26_embedding_drift",
      "q123_scd2_intervals", "m09_dct_phash", "m10_phash_candidates",
      "c29_dataset_card", "q124_ab_report", "g25_ktruss",
      "c30_waterfill_budget", "s27_rrf_fusion", "s28_ivf_balance",
      "t25_langid_margin", "d20_minhash_calibration",
      "g26_diameter_sweep", "g27_link_prediction",
      "q126_markov_transitions", "g28_random_walks",
      "g29_skipgram_pairs", "g30_ppmi_scores",
      "t26_gopher_repetition", "s29_ann_matryoshka",
      "c31_doremi_weights", "q128_holt_trend",
      "m11_dhash", "t27_zipf_slope", "s30_farthest_first",
      "c32_doremi_waterfill", "q130_holt_anomalies",
      "d21_dedup_containment", "m12_shot_boundaries",
      "t28_trigram_backoff", "q131_funnel_lag",
      "q132_markov_attribution", "g31_linkpred_auc",
      "p11_planner_anneal", "q133_seasonality_index",
      "c33_mix_anneal", "m13_silence_trim",
      // session-two additions: the new planner members, the customer/
      // basket mining pair, the forecasting-family extensions, the
      // centrality/propagation graph members, the text-quality and
      // audit passes, the dedup/sampling additions
      "p12_planner_ikkbz", "p13_planner_auto",
      "q135_rfm_segments", "q136_basket_rules",
      "q137_cusum_changepoints", "q138_acf_daily",
      "q139_benford_audit", "q141_rolling_median",
      "q142_time_weighted_avg",
      "g32_rich_club", "g33_betweenness", "g34_feature_propagation",
      "g35_weighted_sssp",
      "t29_gini_concentration", "t30_flesch_kincaid",
      "t31_encoding_audit", "t32_rake_keywords", "t33_canonicalize",
      "d22_soft_dedup_weights", "d23_band_planner",
      "d24_dedup_canonical",
      "c34_neyman_sample", "m14_mime_sniff", "s31_rocchio_feedback",
      "g37_transitivity", "q144_scd2_pit_join", "c35_canary_scan",
      "q145_wilson_conversion", "s33_knn_classifier",
      "p14_planner_2po", "t34_vocab_overlap", "s32_ann_ivf_filtered",
      "q143_csv_malformed", "g36_degree_slope", "s34_ann_graph_beam",
      "g38_katz_centrality", "q146_cumulative_users")
    val all = graft.SparkEntry.queries
    interesting.foreach { name =>
      // build INSIDE the scope: construction-time barriers (signature
      // frames, d09's CC labels) must drain per query, as Verify does —
      // built outside, they'd land in the global queue and pin cache
      // for the rest of the audit
      graft.operators.Persists.scoped {
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
        println(s"== $name")
        println(s"   scans=${count("FileScan parquet")} " +
          s"pushedFilters=${count("PushedFilters: \\[[^\\]]")} " +
          s"bhj=${count("BroadcastHashJoin")} smj=${count("SortMergeJoin")} " +
          s"shj=${count("ShuffledHashJoin")} nlj=${count("BroadcastNestedLoopJoin")} " +
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
      }
    }
    spark.stop()
  }
}
