package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (plus the training-data
  * pipeline extensions) is exposed as a named query over the driver's
  * testdata, with an equivalent DuckDB oracle SQL where SQL-expressible.
  */
object SparkEntry {

  /** Flagship query (reference example-simple sliding-window aggregation)
    * on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q01SlidingWindowAgg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_sliding_window_agg"  -> (Relational.q01SlidingWindowAgg _),
    "q02_tumbling_window_agg" -> (Relational.q02TumblingWindowAgg _),
    "q03_filter_project"      -> (Relational.q03FilterProject _),
    "q04_keyby_reduce"        -> (Relational.q04KeyByReduce _),
    "q05_range_window_filter" -> (Relational.q05RangeWindowFilter _),
    "q06_broadcast_enrich"    -> (Relational.q06BroadcastEnrich _),
    "q07_pct_histogram"       -> (Percentiles.q07PctHistogram _),
    "q08_session_window"      -> (Relational.q08SessionWindow _),
    "q09_shuffle_join_agg"    -> (Relational.q09ShuffleJoinAgg _),
    "q10_topk"                -> (Relational.q10TopK _),
    "q11_set_ops"             -> (Relational.q11SetOps _),
    "q12_distinct_agg"        -> (Relational.q12DistinctAgg _),
    "q13_rollup"              -> (Relational.q13Rollup _),
    "q14_analytic_window"     -> (Relational.q14AnalyticWindow _),
    "q15_dedup_exact"         -> (TextAnalysis.q15DedupExact _),
    "q16_token_stats"         -> (TextAnalysis.q16TokenStats _),
    "q17_quality_score"       -> (TextAnalysis.q17QualityScore _),
    "q18_langid"              -> (TextAnalysis.q18LangId _),
    "q19_fingerprint"         -> (TextAnalysis.q19Fingerprint _),
    "q20_minhash_dedup"       -> (Dedup.q20MinHashDedup _),
    "q21_simhash_dedup"       -> (Dedup.q21SimHashDedup _),
    "q22_ann_brute_force"     -> (Similarity.q22AnnBruteForce _),
    "q23_ann_lsh"             -> (Similarity.q23AnnLsh _),
    "q24_multimodal_stub"     -> (Multimodal.q24MultimodalStub _),
    "q25_stream_batch_parity" -> (graft.streaming.StreamParity.q25StreamBatchParity _),
    "q26_embedding_dedup"     -> (Similarity.q26EmbeddingDedup _),
    "q27_token_explode"       -> (TextAnalysis.q27TokenExplode _),
    "q28_asof_join"           -> (TemporalJoins.q28AsofJoin _),
    "q29_range_join"          -> (TemporalJoins.q29RangeJoin _),
    "q30_ann_ivf"             -> (Similarity.q30AnnIvf _),
    "q31_salted_join"         -> (Skew.q31SaltedJoin _),
    "q32_bpe_tokens"          -> (TextAnalysis.q32BpeTokens _),
    "q33_rolling_hash"        -> (TextAnalysis.q33RollingHash _),
    "q34_approx_distinct"     -> (Relational.q34ApproxDistinct _),
    "q35_bucketed_join"       -> (Bucketing.q35BucketedJoin _),
    "q36_hash_split"          -> (TextAnalysis.q36HashSplit _),
    "q37_tfidf"               -> (TextAnalysis.q37TfIdf _),
    "q38_repetition"          -> (TextAnalysis.q38Repetition _),
    "q39_frame_sample"        -> (Multimodal.q39FrameSample _),
    "q40_ngram_jaccard"       -> (Dedup.q40NgramJaccard _),
    "q41_decontamination"     -> (Curation.q41Decontamination _),
    "q42_stratified_mix"      -> (Curation.q42StratifiedMix _),
    "q43_sequence_pack"       -> (Curation.q43SequencePack _),
    "q44_scrub"               -> (Curation.q44Scrub _),
    "q45_quality_curate"      -> (Curation.q45QualityCurate _),
    "q46_dedup_components"    -> (Clustering.q46DedupComponents _),
    "q47_kmeans_cluster"      -> (Clustering.q47KmeansCluster _),
    "q48_quantize_stats"      -> (Similarity.q48QuantizeStats _),
    "q49_stream_dedup"        -> (graft.streaming.StreamParity.q49StreamDedup _),
    "q50_semdedup"            -> (Clustering.q50SemDedup _),
    "q51_dup_ngram_stats"     -> (Dedup.q51DupNgramStats _),
    "q52_incremental_dedup"   -> (Dedup.q52IncrementalDedup _),
    "q53_ann_ivf_pq"          -> (Similarity.q53AnnIvfPq _),
    "q54_substring_runs"      -> (Dedup.q54SubstringRuns _),
    "q55_bigram_lm"           -> (TextAnalysis.q55BigramLm _),
    "q56_partition_pruning"   -> (Bucketing.q56PartitionPruning _),
    "q57_approx_quantiles"    -> (Relational.q57ApproxQuantiles _),
    "q58_stream_admission"    -> (graft.streaming.StreamParity.q58StreamAdmission _),
    "q59_audio_chunks"        -> (Multimodal.q59AudioChunks _),
    "q60_hard_negatives"      -> (Similarity.q60HardNegatives _),
    "q61_heavy_hitters"       -> (TextAnalysis.q61HeavyHitters _),
    "q62_gopher_filter"       -> (Curation.q62GopherFilter _),
    "q63_cdc_merge"           -> (Relational.q63CdcMerge _),
    "q64_source_overlap"      -> (Curation.q64SourceOverlap _),
    "q65_diversity_stats"     -> (Similarity.q65DiversityStats _),
    "q66_stream_heavy_hitters" -> (graft.streaming.StreamParity.q66StreamHeavyHitters _),
    "q67_upsample_mix"        -> (Curation.q67UpsampleMix _),
    "q68_block_dedup"         -> (Dedup.q68BlockDedup _),
    "q69_knn_classify"        -> (Similarity.q69KnnClassify _),
    "q70_vocab_stats"         -> (TextAnalysis.q70VocabStats _),
    "q71_stream_sessions"     -> (graft.streaming.StreamParity.q71StreamSessions _),
    "q72_unigram_drift"       -> (TextAnalysis.q72UnigramDrift _),
    "q73_chunk_plan"          -> (Curation.q73ChunkPlan _),
    "q74_dim_stats"           -> (Similarity.q74DimStats _),
    "q75_gap_fill"            -> (Relational.q75GapFill _),
    "q76_boilerplate_scrub"   -> (Dedup.q76BoilerplateScrub _),
    "q77_stratified_sample"   -> (Curation.q77StratifiedSample _),
    "q78_timeline_anomaly"    -> (Relational.q78TimelineAnomaly _),
    "q79_filtered_ann"        -> (Similarity.q79FilteredAnn _),
    "q80_stream_cdc_merge"    -> (graft.streaming.StreamParity.q80StreamCdcMerge _),
    "q81_stream_anomaly"      -> (graft.streaming.StreamParity.q81StreamAnomaly _),
    "q82_stream_interval_join" -> (graft.streaming.StreamParity.q82StreamIntervalJoin _),
    "q83_stream_left_join"    -> (graft.streaming.StreamParity.q83StreamLeftJoin _),
    "q84_bloom_semijoin"      -> (RuntimeFilters.q84BloomSemiJoin _),
    "q85_cube_summary"        -> (Relational.q85CubeSummary _),
    "q86_cluster_canonical"   -> (Clustering.q86ClusterCanonical _),
    "q87_cross_split_neardup" -> (Dedup.q87CrossSplitNearDup _),
    "q88_length_buckets"      -> (Curation.q88LengthBuckets _),
    "q89_pivot"               -> (Relational.q89Pivot _),
    "q90_unpivot"             -> (Relational.q90Unpivot _),
    "q91_json_extract"        -> (Relational.q91JsonExtract _),
    "q92_funnel_lag"          -> (Relational.q92FunnelLag _),
    "q93_typed_sessions"      -> (TypedOps.q93TypedSessions _),
    "q94_stream_funnel"       -> (graft.streaming.StreamParity.q94StreamFunnel _),
    "q95_contiguous_ids"      -> (Curation.q95ContiguousIds _),
    "q96_scd2"                -> (Relational.q96Scd2 _),
    "q97_fuzzy_vocab_join"    -> (Dedup.q97FuzzyVocabJoin _),
    "q98_star_flagship"       -> (Relational.q98StarFlagship _),
    "q99_temperature_mix"     -> (Curation.q99TemperatureMix _),
    "q100_table_stats"        -> (Profiling.q100TableStats _),
    "q101_zorder_layout"      -> (Bucketing.q101ZorderLayout _),
    "q102_decay_features"     -> (Relational.q102DecayFeatures _),
    "q103_skyline"            -> (Relational.q103Skyline _),
    "q104_regr_trend"         -> (Relational.q104RegrTrend _),
    "q105_observe_quality"    -> (Observability.q105ObserveQuality _),
    "q106_stream_observe"     -> (graft.streaming.StreamParity.q106StreamObserveQuality _),
    "q107_grouped_topk"       -> (Relational.q107GroupedTopK _),
    "q108_equal_freq_bins"    -> (Relational.q108EqualFreqBins _),
    "q109_skew_profile"       -> (Profiling.q109SkewProfile _),
    "q110_sliding_distinct"   -> (Relational.q110SlidingDistinct _),
    "q111_cohort_retention"   -> (Relational.q111CohortRetention _),
    "q112_snapshot_diff"      -> (Relational.q112SnapshotDiff _),
    "q113_weighted_sample"    -> (Curation.q113WeightedSample _),
    "q114_top_grams_per_lang" -> (TextAnalysis.q114TopGramsPerLang _),
    "q115_quality_rank"       -> (TextAnalysis.q115QualityRank _),
    "q116_stream_distinct"    -> (graft.streaming.StreamParity.q116StreamSlidingDistinct _),
    "q117_asof_tolerance"     -> (TemporalJoins.q117AsofTolerance _),
    "q118_pareto_share"       -> (Relational.q118ParetoShare _),
    "q119_transition_matrix"  -> (Relational.q119TransitionMatrix _),
    "q120_grouped_median"     -> (TextAnalysis.q120GroupedMedian _),
    "q121_session_concurrency" -> (Relational.q121SessionConcurrency _),
    "q122_bottomk_sample"     -> (Curation.q122BottomkSample _),
    "q123_stream_dedup_wm"    -> (graft.streaming.StreamParity.q123StreamDedupWatermark _),
    "q124_embedding_cov"      -> (Similarity.q124EmbeddingCovariance _),
    "q125_pca_project"        -> (Similarity.q125PcaProject _),
    "q126_transform_state"    -> (graft.streaming.StreamParity.q126TransformWithState _),
    "q127_inverted_index"     -> (TextAnalysis.q127InvertedIndex _),
    "q128_robust_stats"       -> (TextAnalysis.q128RobustStats _),
    "q129_pmi_collocations"   -> (TextAnalysis.q129PmiCollocations _),
    "q130_stream_history"     -> (graft.streaming.StreamParity.q130StreamRecentHistory _),
    "q131_incremental_agg"    -> (Relational.q131IncrementalAgg _),
    "q132_table_checksum"     -> (Relational.q132TableChecksum _),
    "q133_bpe_merge_step"     -> (TextAnalysis.q133BpeMergeStep _),
    "q134_packing_sweep"      -> (Curation.q134PackingSweep _),
    "q135_epoch_shards"       -> (Curation.q135EpochShards _),
    "q136_curriculum"         -> (Curation.q136CurriculumInterleave _),
    "q137_stream_quota"       -> (graft.streaming.StreamParity.q137StreamQuotaGate _),
    "q138_itemset_pairs"      -> (Relational.q138ItemsetPairs _),
    "q139_fk_profile"         -> (Profiling.q139FkProfile _),
    "q140_stream_type_seq"    -> (graft.streaming.StreamParity.q140StreamTypeSeq _),
    "q141_stream_timer_sessions" -> (graft.streaming.StreamParity.q141StreamTimerSessions _),
    "q142_forget_cascade"     -> (Curation.q142ForgetCascade _),
    "q143_data_manifest"      -> (Curation.q143DataManifest _),
    "q144_mean_pool"          -> (Similarity.q144MeanPool _),
    "q145_stratified_split"   -> (Curation.q145StratifiedSplit _),
    "q146_source_dup_matrix"  -> (Dedup.q146SourceDupMatrix _),
    "q147_vocab_growth"       -> (TextAnalysis.q147VocabGrowth _),
    "q148_stream_dlq"         -> (graft.streaming.StreamParity.q148StreamDlqSplit _),
    "q149_bm25"               -> (TextAnalysis.q149Bm25 _),
    "q150_asof_nearest"       -> (TemporalJoins.q150AsofNearest _),
    "q151_quantile_norm"      -> (Curation.q151QuantileNorm _),
    "q152_series_corr"        -> (Relational.q152SeriesCorr _),
    "q153_interp_resample"    -> (Relational.q153InterpResample _),
    "q154_weighted_median"    -> (Relational.q154WeightedMedian _),
    "q155_interevent_stats"   -> (Relational.q155InterEventStats _),
    "q156_label_balance"      -> (Similarity.q156LabelBalance _),
    "q157_compaction_plan"    -> (Curation.q157CompactionPlan _),
    "q158_path_mining"        -> (Relational.q158PathMining _),
    "q159_funnel_ci"          -> (Relational.q159FunnelCi _),
    "q160_fertility"          -> (TextAnalysis.q160Fertility _),
    "q161_zipf_slope"         -> (TextAnalysis.q161ZipfSlope _),
    "q162_para_dedup"         -> (Dedup.q162ParaDedup _),
    "q163_novelty"            -> (TextAnalysis.q163Novelty _),
    "q164_quality_roc"        -> (TextAnalysis.q164QualityRoc _),
    "q165_oov_rate"           -> (TextAnalysis.q165OovRate _),
    "q166_token_entropy"      -> (TextAnalysis.q166TokenEntropy _),
    "q167_bigram_xent"        -> (TextAnalysis.q167BigramXent _),
    "q168_chunk_dedup_sweep"  -> (TextAnalysis.q168ChunkDedupSweep _),
    "q169_quant_audit"        -> (Similarity.q169QuantAudit _),
    "q170_source_jsd"         -> (TextAnalysis.q170SourceJsd _),
    "q171_winnow_fp"          -> (Dedup.q171Winnow _),
    "q172_curation_funnel"    -> (Curation.q172CurationFunnel _),
    "q173_k_anonymity"        -> (Profiling.q173KAnonymity _),
    "q174_containment"        -> (Dedup.q174Containment _),
    "q175_exact_quantile"     -> (Profiling.q175ExactQuantile _),
    "q176_benford"            -> (Profiling.q176Benford _),
    "q177_ks_drift"           -> (Profiling.q177KsDrift _),
    "q178_gini_token_mass"    -> (TextAnalysis.q178GiniTokenMass _),
    "q179_rrf_fusion"         -> (TextAnalysis.q179RrfFusion _),
    "q180_mi_audit"           -> (Relational.q180MiAudit _),
    "q181_assoc_rules"        -> (Relational.q181AssocRules _),
    "q182_spearman_drift"     -> (Relational.q182SpearmanDrift _),
    "q183_shuffle_quality"    -> (Curation.q183ShuffleQuality _),
    "q184_agreement_kappa"    -> (TextAnalysis.q184AgreementKappa _),
    "q185_classifier_metrics" -> (Similarity.q185ClassifierMetrics _),
    "q186_ppl_buckets"        -> (TextAnalysis.q186PerplexityBuckets _),
    "q187_token_waterfill"    -> (Curation.q187TokenWaterfill _),
    "q188_dedup_sweep"        -> (Dedup.q188DedupSweep _),
    "q189_snm_dedup"          -> (Dedup.q189SnmDedup _),
    "q190_contam_spans"       -> (Curation.q190ContamSpans _),
    "q191_dsir_select"        -> (Curation.q191DsirSelect _),
    "q192_fp_neardup"         -> (Dedup.q192FingerprintNeardup _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q01_sliding_window_agg"  -> Relational.q01Sql,
    "q02_tumbling_window_agg" -> Relational.q02Sql,
    "q03_filter_project"      -> Relational.q03Sql,
    "q04_keyby_reduce"        -> Relational.q04Sql,
    "q05_range_window_filter" -> Relational.q05Sql,
    "q06_broadcast_enrich"    -> Relational.q06Sql,
    "q07_pct_histogram"       -> Percentiles.q07Sql,
    "q08_session_window"      -> Relational.q08Sql,
    "q09_shuffle_join_agg"    -> Relational.q09Sql,
    "q10_topk"                -> Relational.q10Sql,
    "q11_set_ops"             -> Relational.q11Sql,
    "q12_distinct_agg"        -> Relational.q12Sql,
    "q13_rollup"              -> Relational.q13Sql,
    "q14_analytic_window"     -> Relational.q14Sql,
    "q15_dedup_exact"         -> TextAnalysis.q15Sql,
    "q16_token_stats"         -> TextAnalysis.q16Sql,
    "q17_quality_score"       -> TextAnalysis.q17Sql,
    "q18_langid"              -> TextAnalysis.q18Sql,
    "q19_fingerprint"         -> TextAnalysis.q19Sql,
    "q20_minhash_dedup"       -> Dedup.q20Sql,
    // q21_simhash_dedup: no oracle — xxhash64 has no DuckDB equivalent;
    // covered by TrainingDataSpec (rows-only check driver-side).
    "q22_ann_brute_force"     -> Similarity.q22Sql,
    // q23_ann_lsh: no oracle — recall vs q22 covered by TrainingDataSpec.
    "q24_multimodal_stub"     -> Multimodal.q24Sql,
    // q25 runs the SAME aggregation through the real streaming engine —
    // its oracle is the batch flagship's oracle.
    "q25_stream_batch_parity" -> Relational.q01Sql,
    "q26_embedding_dedup"     -> Similarity.q26Sql,
    "q27_token_explode"       -> TextAnalysis.q27Sql,
    "q28_asof_join"           -> TemporalJoins.q28Sql,
    "q29_range_join"          -> TemporalJoins.q29Sql,
    // q30_ann_ivf: no oracle — approximate by design; recall@10 vs the
    // exact q22 is asserted in SimilaritySpec (rows-only check driver-side).
    "q31_salted_join"         -> Skew.q31Sql,
    "q32_bpe_tokens"          -> TextAnalysis.q32Sql,
    "q33_rolling_hash"        -> TextAnalysis.q33Sql,
    // q34_approx_distinct: no oracle — HLL++ is approximate by design;
    // RelationalSpec bounds the error vs exact countDistinct.
    "q35_bucketed_join"       -> Bucketing.q35Sql,
    "q36_hash_split"          -> TextAnalysis.q36Sql,
    "q37_tfidf"               -> TextAnalysis.q37Sql,
    "q38_repetition"          -> TextAnalysis.q38Sql,
    "q39_frame_sample"        -> Multimodal.q39Sql,
    "q40_ngram_jaccard"       -> Dedup.q40Sql,
    "q41_decontamination"     -> Curation.q41Sql,
    "q42_stratified_mix"      -> Curation.q42Sql,
    "q43_sequence_pack"       -> Curation.q43Sql,
    "q44_scrub"               -> Curation.q44Sql,
    "q45_quality_curate"      -> Curation.q45Sql,
    "q46_dedup_components"    -> Clustering.q46Sql,
    // q47_kmeans_cluster: no oracle — iterative float training is not
    // SQL-expressible; ClusteringSpec asserts the objective is
    // non-decreasing and the output partitions the corpus (driver
    // records a rows-only check).
    "q48_quantize_stats"      -> Similarity.q48Sql,
    // q49 runs the q15 dedup aggregation through the real streaming
    // engine (state across micro-batches) — its oracle is q15's.
    "q49_stream_dedup"        -> TextAnalysis.q15Sql,
    // q50_semdedup: no oracle — the k-means partition is iterative float
    // training; ClusteringSpec asserts precision 1.0 vs brute-force
    // pairs and recall >= 0.85 (driver records a rows-only check).
    "q51_dup_ngram_stats"     -> Dedup.q51Sql,
    "q52_incremental_dedup"   -> Dedup.q52Sql,
    // q53_ann_ivf_pq: no oracle — two stages of iterative float training
    // (coarse k-means + per-subspace PQ codebooks); SimilaritySpec
    // asserts recall@10 vs the exact q22 (driver records a rows-only
    // check, like q23/q30).
    "q54_substring_runs"      -> Dedup.q54Sql,
    "q55_bigram_lm"           -> TextAnalysis.q55Sql,
    "q56_partition_pruning"   -> Bucketing.q56Sql,
    // q57_approx_quantiles: no oracle — GK sketch is approximate by
    // design (and merge-order-sensitive); RelationalSpec bounds the
    // rank error vs the exact percentile per group.
    // q58 runs the q52 admission gate through the real streaming engine
    // (foreachBatch + seen-hash state) — its oracle is q52's.
    "q58_stream_admission"    -> Dedup.q52Sql,
    "q59_audio_chunks"        -> Multimodal.q59Sql,
    "q60_hard_negatives"      -> Similarity.q60Sql,
    "q61_heavy_hitters"       -> TextAnalysis.q61Sql,
    "q62_gopher_filter"       -> Curation.q62Sql,
    "q63_cdc_merge"           -> Relational.q63Sql,
    "q64_source_overlap"      -> Curation.q64Sql,
    "q65_diversity_stats"     -> Similarity.q65Sql,
    // q66 runs the q61 sketch-then-verify gate through the real streaming
    // engine (per-trigger MG sketches folded by the mergeable-summaries
    // rule) — its oracle is q61's.
    "q66_stream_heavy_hitters" -> TextAnalysis.q61Sql,
    "q67_upsample_mix"        -> Curation.q67Sql,
    "q68_block_dedup"         -> Dedup.q68Sql,
    "q69_knn_classify"        -> Similarity.q69Sql,
    "q70_vocab_stats"         -> TextAnalysis.q70Sql,
    // q71 runs the q08 session aggregation through the real streaming
    // engine (merging session state across micro-batches) — its oracle
    // is the batch q08's.
    "q71_stream_sessions"     -> Relational.q08Sql,
    "q72_unigram_drift"       -> TextAnalysis.q72Sql,
    "q73_chunk_plan"          -> Curation.q73Sql,
    "q74_dim_stats"           -> Similarity.q74Sql,
    "q75_gap_fill"            -> Relational.q75Sql,
    "q76_boilerplate_scrub"   -> Dedup.q76Sql,
    "q77_stratified_sample"   -> Curation.q77Sql,
    "q78_timeline_anomaly"    -> Relational.q78Sql,
    "q79_filtered_ann"        -> Similarity.q79Sql,
    // q80 runs the q63 latest-wins MERGE through the real streaming
    // engine (foreachBatch upsert compaction, base + change feed as
    // ordered micro-batches) — its oracle is the batch q63's.
    "q80_stream_cdc_merge"    -> Relational.q63Sql,
    // q81 maintains the q78 anomaly monitor incrementally (per-trigger
    // count folds into a grid-sized snapshot) — its oracle is q78's.
    "q81_stream_anomaly"      -> Relational.q78Sql,
    "q82_stream_interval_join" -> graft.streaming.StreamParity.q82Sql,
    "q83_stream_left_join"    -> graft.streaming.StreamParity.q83Sql,
    "q84_bloom_semijoin"      -> RuntimeFilters.q84Sql,
    "q85_cube_summary"        -> Relational.q85Sql,
    "q86_cluster_canonical"   -> Clustering.q86Sql,
    "q87_cross_split_neardup" -> Dedup.q87Sql,
    "q88_length_buckets"      -> Curation.q88Sql,
    "q89_pivot"               -> Relational.q89Sql,
    "q90_unpivot"             -> Relational.q90Sql,
    "q91_json_extract"        -> Relational.q91Sql,
    "q92_funnel_lag"          -> Relational.q92Sql,
    "q93_typed_sessions"      -> TypedOps.q93Sql,
    // q94 runs the q92 funnel through the real streaming engine
    // (flatMapGroupsWithState + event-time timeout) — oracle is q92's.
    "q94_stream_funnel"       -> Relational.q92Sql,
    "q95_contiguous_ids"      -> Curation.q95Sql,
    "q96_scd2"                -> Relational.q96Sql,
    "q97_fuzzy_vocab_join"    -> Dedup.q97Sql,
    "q98_star_flagship"       -> Relational.q98Sql,
    "q99_temperature_mix"     -> Curation.q99Sql,
    "q100_table_stats"        -> Profiling.q100Sql,
    "q101_zorder_layout"      -> Bucketing.q101Sql,
    "q102_decay_features"     -> Relational.q102Sql,
    "q103_skyline"            -> Relational.q103Sql,
    "q104_regr_trend"         -> Relational.q104Sql,
    "q105_observe_quality"    -> Observability.q105Sql,
    // q106 replays the q105 gate through the streaming engine; its
    // complete-mode counters must equal the batch oracle exactly.
    "q106_stream_observe"     -> Observability.q105Sql,
    "q107_grouped_topk"       -> Relational.q107Sql,
    "q108_equal_freq_bins"    -> Relational.q108Sql,
    "q109_skew_profile"       -> Profiling.q109Sql,
    "q110_sliding_distinct"   -> Relational.q110Sql,
    "q111_cohort_retention"   -> Relational.q111Sql,
    "q112_snapshot_diff"      -> Relational.q112Sql,
    "q113_weighted_sample"    -> Curation.q113Sql,
    "q114_top_grams_per_lang" -> TextAnalysis.q114Sql,
    "q115_quality_rank"       -> TextAnalysis.q115Sql,
    // q116 replays q110 through two CHAINED stateful streaming
    // aggregations; same oracle as the batch sliding distinct.
    "q116_stream_distinct"    -> Relational.q110Sql,
    "q117_asof_tolerance"     -> TemporalJoins.q117Sql,
    "q118_pareto_share"       -> Relational.q118Sql,
    "q119_transition_matrix"  -> Relational.q119Sql,
    "q120_grouped_median"     -> TextAnalysis.q120Sql,
    "q121_session_concurrency" -> Relational.q121Sql,
    "q122_bottomk_sample"     -> Curation.q122Sql,
    // q123 runs the dedup through streaming state; its oracle is the
    // batch DISTINCT the bounded-state operator must reproduce exactly.
    "q123_stream_dedup_wm"    -> graft.streaming.StreamParity.q123Sql,
    "q124_embedding_cov"      -> Similarity.q124Sql,
    // q125 is an iterative eigensolve (no SQL oracle, same class as
    // q47): SimilaritySpec asserts the linear-algebra invariants and
    // Quality publishes the measured explained-variance share.
    // q126 folds per-user state through transformWithState; the oracle
    // is the equivalent batch analytic-window pair.
    "q126_transform_state"    -> graft.streaming.StreamParity.q126Sql,
    "q127_inverted_index"     -> TextAnalysis.q127Sql,
    "q128_robust_stats"       -> TextAnalysis.q128Sql,
    "q129_pmi_collocations"   -> TextAnalysis.q129Sql,
    // q130 folds per-user ListState through transformWithState; the
    // oracle is the batch sliding history frame.
    "q130_stream_history"     -> graft.streaming.StreamParity.q130Sql,
    // q131 merges base+delta PARTIAL aggregate states; the oracle is the
    // full recompute the incremental refresh must equal bit-for-bit.
    "q131_incremental_agg"    -> Relational.q131Sql,
    "q132_table_checksum"     -> Relational.q132Sql,
    "q133_bpe_merge_step"     -> TextAnalysis.q133Sql,
    "q134_packing_sweep"      -> Curation.q134Sql,
    "q135_epoch_shards"       -> Curation.q135Sql,
    "q136_curriculum"         -> Curation.q136Sql,
    // q137 gates per-(user, day) quotas through transformWithState; the
    // oracle is the batch ROW_NUMBER threshold.
    "q137_stream_quota"       -> graft.streaming.StreamParity.q137Sql,
    "q138_itemset_pairs"      -> Relational.q138Sql,
    "q139_fk_profile"         -> Profiling.q139Sql,
    // q140 folds per-(user, type) MapState through transformWithState;
    // the oracle is the batch per-type ROW_NUMBER.
    "q140_stream_type_seq"    -> graft.streaming.StreamParity.q140Sql,
    // q141 closes sessions on event-time TIMERS; the oracle is the batch
    // gaps-and-islands sessionization.
    "q141_stream_timer_sessions" -> graft.streaming.StreamParity.q141Sql,
    "q142_forget_cascade"     -> Curation.q142Sql,
    "q143_data_manifest"      -> Curation.q143Sql,
    "q144_mean_pool"          -> Similarity.q144Sql,
    "q145_stratified_split"   -> Curation.q145Sql,
    // q146's pairs come from q20's complete LSH+verify; the oracle
    // re-derives them brute-force, exactly like q20's own gate.
    "q146_source_dup_matrix"  -> Dedup.q146Sql,
    "q147_vocab_growth"       -> TextAnalysis.q147Sql,
    // q148 routes each micro-batch to main/DLQ sinks in one pass; the
    // oracle is the batch CASE verdict over the union of both sinks.
    "q148_stream_dlq"         -> graft.streaming.StreamParity.q148Sql,
    "q149_bm25"               -> TextAnalysis.q149Sql,
    "q150_asof_nearest"       -> TemporalJoins.q150Sql,
    "q151_quantile_norm"      -> Curation.q151Sql,
    "q152_series_corr"        -> Relational.q152Sql,
    "q153_interp_resample"    -> Relational.q153Sql,
    "q154_weighted_median"    -> Relational.q154Sql,
    "q155_interevent_stats"   -> Relational.q155Sql,
    "q156_label_balance"      -> Similarity.q156Sql,
    "q157_compaction_plan"    -> Curation.q157Sql,
    "q158_path_mining"        -> Relational.q158Sql,
    "q159_funnel_ci"          -> Relational.q159Sql,
    "q160_fertility"          -> TextAnalysis.q160Sql,
    "q161_zipf_slope"         -> TextAnalysis.q161Sql,
    "q162_para_dedup"         -> Dedup.q162Sql,
    "q163_novelty"            -> TextAnalysis.q163Sql,
    "q164_quality_roc"        -> TextAnalysis.q164Sql,
    "q165_oov_rate"           -> TextAnalysis.q165Sql,
    "q166_token_entropy"      -> TextAnalysis.q166Sql,
    "q167_bigram_xent"        -> TextAnalysis.q167Sql,
    "q168_chunk_dedup_sweep"  -> TextAnalysis.q168Sql,
    "q169_quant_audit"        -> Similarity.q169Sql,
    "q170_source_jsd"         -> TextAnalysis.q170Sql,
    "q171_winnow_fp"          -> Dedup.q171Sql,
    "q172_curation_funnel"    -> Curation.q172Sql,
    "q173_k_anonymity"        -> Profiling.q173Sql,
    "q174_containment"        -> Dedup.q174Sql,
    "q175_exact_quantile"     -> Profiling.q175Sql,
    "q176_benford"            -> Profiling.q176Sql,
    "q177_ks_drift"           -> Profiling.q177Sql,
    "q178_gini_token_mass"    -> TextAnalysis.q178Sql,
    "q179_rrf_fusion"         -> TextAnalysis.q179Sql,
    "q180_mi_audit"           -> Relational.q180Sql,
    "q181_assoc_rules"        -> Relational.q181Sql,
    "q182_spearman_drift"     -> Relational.q182Sql,
    "q183_shuffle_quality"    -> Curation.q183Sql,
    "q184_agreement_kappa"    -> TextAnalysis.q184Sql,
    "q185_classifier_metrics" -> Similarity.q185Sql,
    "q186_ppl_buckets"        -> TextAnalysis.q186Sql,
    "q187_token_waterfill"    -> Curation.q187Sql,
    "q188_dedup_sweep"        -> Dedup.q188Sql,
    "q189_snm_dedup"          -> Dedup.q189Sql,
    "q190_contam_spans"       -> Curation.q190Sql,
    "q191_dsir_select"        -> Curation.q191Sql,
    "q192_fp_neardup"         -> Dedup.q192Sql,
  )
}
