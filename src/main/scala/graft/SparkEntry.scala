package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: EPFP-style FP-Growth over order->brand baskets at sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    FpmQueries.freqItemsets(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_baskets" -> ((s, d) => FpmQueries.baskets(s, d)),
    "q02_l1_freq_items" -> ((s, d) => FpmQueries.l1FreqItems(s, d)),
    "q03_freq_itemsets" -> ((s, d) => FpmQueries.freqItemsets(s, d)),
    "q04_assoc_rules" -> ((s, d) => FpmQueries.assocRules(s, d)),
    "q05_predict" -> ((s, d) => FpmQueries.predict(s, d)),
    "q05b_predict_relational" -> ((s, d) => FpmQueries.predictRelational(s, d)),
    "q06_pricing_summary" -> ((s, d) => RelQueries.pricingSummary(s, d)),
    "q07_nation_revenue" -> ((s, d) => RelQueries.nationRevenue(s, d)),
    "q08_top_orders" -> ((s, d) => RelQueries.topOrders(s, d)),
    "q09_distinct_status" -> ((s, d) => RelQueries.distinctStatus(s, d)),
    "q10_word_count" -> ((s, d) => RelQueries.wordCount(s, d)),
    "q11_event_stats" -> ((s, d) => RelQueries.eventStats(s, d)),
    "q12_dedup_exact" -> ((s, d) => PipelineQueries.dedupExact(s, d)),
    "q13_ngram_jaccard" -> ((s, d) => PipelineQueries.ngramJaccard(s, d)),
    "q14_minhash_lsh" -> ((s, d) => PipelineQueries.minHashLsh(s, d)),
    "q15_simhash_pairs" -> ((s, d) => PipelineQueries.simHashPairs(s, d)),
    "q16_text_quality" -> ((s, d) => PipelineQueries.quality(s, d)),
    "q17_lang_id" -> ((s, d) => PipelineQueries.langId(s, d)),
    "q18_token_counts" -> ((s, d) => PipelineQueries.tokenCounts(s, d)),
    "q19_fingerprint_md5" -> ((s, d) => PipelineQueries.fingerprintMd5(s, d)),
    "q20_fingerprint_rolling" -> ((s, d) => PipelineQueries.fingerprintRolling(s, d)),
    "q21_embedding_stats" -> ((s, d) => PipelineQueries.embeddingStats(s, d)),
    "q22_cosine_topk" -> ((s, d) => PipelineQueries.cosineTopK(s, d)),
    "q23_ann_lsh" -> ((s, d) => PipelineQueries.annLsh(s, d)),
    "q24_frame_samples" -> ((s, d) => PipelineQueries.frameSamples(s, d)),
    "q25_media_features" -> ((s, d) => PipelineQueries.mediaFeatures(s, d)),
    "q26_event_hourly" -> ((s, d) => RelQueries.eventHourly(s, d)),
    "q27_event_sessions" -> ((s, d) => RelQueries.eventSessions(s, d)),
    "q28_json_props" -> ((s, d) => RelQueries.jsonProps(s, d)),
    "q29_rules_by_antecedent" -> ((s, d) => FpmQueries.rulesByAntecedent(s, d)),
    "q30_supplier_itemsets" -> ((s, d) => FpmQueries.supplierItemsets(s, d)),
    "q31_running_revenue" -> ((s, d) => RelQueries.runningRevenue(s, d)),
    "q32_order_presence" -> ((s, d) => RelQueries.customerOrderPresence(s, d)),
    "q33_embedding_neardup" -> ((s, d) => PipelineQueries.embeddingNearDup(s, d)),
    "q33b_neardup_grid" -> ((s, d) => PipelineQueries.embeddingNearDupGrid(s, d)),
    "q34_ann_ivf" -> ((s, d) => PipelineQueries.annIvf(s, d)),
    "q35_tfidf" -> ((s, d) => PipelineQueries.tfIdf(s, d)),
    "q36_sketches" -> ((s, d) => PipelineQueries.sketches(s, d)),
    "q37_rollup" -> ((s, d) => RelQueries.rollupCounts(s, d)),
    "q38_event_pivot" -> ((s, d) => RelQueries.eventPivot(s, d)),
    "q39_heavy_hitters" -> ((s, d) => PipelineQueries.heavyHitters(s, d)),
    "q40_dup_clusters" -> ((s, d) => PipelineQueries.dupClusters(s, d)),
    "q40b_dup_clusters_logn" -> ((s, d) => PipelineQueries.dupClustersLogN(s, d)),
    "q41_quality_band" -> ((s, d) => PipelineQueries.qualityBand(s, d)),
    "q42_stratified_sample" -> ((s, d) => PipelineQueries.stratifiedSample(s, d)),
    "q43_seq_packing" -> ((s, d) => PipelineQueries.packSequences(s, d)),
    "q44_asof_attribution" -> ((s, d) => RelQueries.eventAttribution(s, d)),
    "q45_interval_join" -> ((s, d) => RelQueries.signupFollowups(s, d)),
    "q46_repetition" -> ((s, d) => PipelineQueries.repetition(s, d)),
    "q47_oov_rate" -> ((s, d) => PipelineQueries.oovRate(s, d)),
    "q48_contamination" -> ((s, d) => PipelineQueries.contamination(s, d)),
    "q48b_contamination_bloom" -> ((s, d) => PipelineQueries.contaminationBloom(s, d)),
    "q49_incremental_dedup" -> ((s, d) => PipelineQueries.incrementalDedup(s, d)),
    "q50_mixture_sample" -> ((s, d) => PipelineQueries.mixtureSample(s, d)),
    "q51_top_per_nation" -> ((s, d) => RelQueries.topCustomersPerNation(s, d)),
    "q52_lang_percentiles" -> ((s, d) => PipelineQueries.langTokenPercentiles(s, d)),
    "q53_bigram_model" -> ((s, d) => PipelineQueries.bigramModel(s, d)),
    "q54_repeated_spans" -> ((s, d) => PipelineQueries.repeatedSpans(s, d)),
    "q55_token_ids" -> ((s, d) => PipelineQueries.tokenIds(s, d)),
    "q56_zorder_keys" -> ((s, d) => RelQueries.zorderKeys(s, d)),
    "q57_latest_events" -> ((s, d) => RelQueries.latestEvents(s, d)),
    "q58_retention_cohorts" -> ((s, d) => RelQueries.retentionCohorts(s, d)),
    "q59_curation_pipeline" -> ((s, d) => PipelineQueries.curationPipeline(s, d)),
    "q60_event_hopping" -> ((s, d) => RelQueries.eventHopping(s, d)),
    "q61_status_cube" -> ((s, d) => RelQueries.statusCube(s, d)),
    "q62_event_paths" -> ((s, d) => RelQueries.eventPaths(s, d)),
    "q63_apriori_itemsets" -> ((s, d) => FpmQueries.aprioriItemsets(s, d)),
    "q64_zorder_layout" -> ((s, d) => RelQueries.zorderLayout(s, d)),
    "q65_salted_segments" -> ((s, d) => RelQueries.saltedSegments(s, d)),
    "q66_lm_doc_score" -> ((s, d) => PipelineQueries.lmDocScore(s, d)),
    "q67_pii_redaction" -> ((s, d) => PipelineQueries.piiRedaction(s, d)),
    "q68_embedding_quantize" -> ((s, d) => PipelineQueries.embeddingQuantize(s, d)),
    "q69_dataset_split" -> ((s, d) => PipelineQueries.datasetSplit(s, d)),
    "q70_event_anomalies" -> ((s, d) => RelQueries.eventAnomalies(s, d)),
    "q71_doc_chunks" -> ((s, d) => PipelineQueries.docChunks(s, d)),
    "q72_semantic_dedup" -> ((s, d) => PipelineQueries.semanticDedup(s, d)),
    "q73_winnow_fingerprints" -> ((s, d) => PipelineQueries.winnowFingerprints(s, d)),
    "q74_winnow_neardup" -> ((s, d) => PipelineQueries.winnowNeardup(s, d)),
    "q75_asof_native" -> ((s, d) => RelQueries.eventAttributionNative(s, d)),
    "q76_source_leakage" -> ((s, d) => PipelineQueries.sourceLeakage(s, d)),
    "q77_corpus_card" -> ((s, d) => PipelineQueries.corpusCard(s, d)),
    "q78_v2_item_freq" -> ((s, d) => FpmQueries.v2ItemFreq(s, d)),
    "q79_bpe_merges" -> ((s, d) => PipelineQueries.bpeMerges(s, d)),
    "q80_bpe_encode" -> ((s, d) => PipelineQueries.bpeEncode(s, d)),
    "q81_v2_write_roundtrip" -> ((s, d) => FpmQueries.v2WriteRoundtrip(s, d)),
    "q82_asof_lookback" -> ((s, d) => RelQueries.eventAttributionLookback(s, d)),
    "q83_bpe_artifact" -> ((s, d) => PipelineQueries.bpeEncodeArtifact(s, d)),
    "q84_asof_stream" -> ((s, d) => RelQueries.eventAttributionStreamed(s, d)),
    "q85_v2_stream_freq" -> ((s, d) => FpmQueries.v2StreamItemFreq(s, d)),
    "q86_ann_pq" -> ((s, d) => PipelineQueries.annPq(s, d)),
    "q87_ann_ivfpq" -> ((s, d) => PipelineQueries.annIvfPq(s, d)),
    "q88_mixture_sample" -> ((s, d) => PipelineQueries.mixtureSampleReport(s, d)),
    "q89_leakage_safe_split" -> ((s, d) => PipelineQueries.leakageSafeSplit(s, d)),
    "q90_ann_ivfpq_indexed" -> ((s, d) => PipelineQueries.annIvfPqIndexed(s, d)),
    "q91_sessions_stream" -> ((s, d) => RelQueries.eventSessionsStreamed(s, d)),
    "q92_hourly_stream" -> ((s, d) => RelQueries.eventHourlyStreamed(s, d)),
    "q93_ann_ivf_indexed" -> ((s, d) => PipelineQueries.annIvfIndexed(s, d)),
    "q94_hopping_stream" -> ((s, d) => RelQueries.eventHoppingStreamed(s, d)),
    "q95_followups_stream" -> ((s, d) => RelQueries.signupFollowupsStreamed(s, d)),
    "q96_dedup_stream" -> ((s, d) => PipelineQueries.dedupStreamFingerprints(s, d)),
    "q97_contam_gate_stream" -> ((s, d) => PipelineQueries.contaminationGateStreamed(s, d)),
    "q98_neardup_gate_stream" -> ((s, d) => PipelineQueries.nearDupGateStreamed(s, d)),
    "q99_span_dedup" -> ((s, d) => PipelineQueries.spanDedup(s, d)),
    "q100_media_phash" -> ((s, d) => PipelineQueries.mediaPhash(s, d)),
    "q101_media_phash_pairs" -> ((s, d) => PipelineQueries.mediaPhashPairs(s, d)),
    "q102_unigram_model" -> ((s, d) => PipelineQueries.unigramModel(s, d)),
    "q103_unigram_encode" -> ((s, d) => PipelineQueries.unigramEncodeArtifact(s, d)),
    "q104_ann_drift" -> ((s, d) => PipelineQueries.annDriftProbe(s, d)),
    "q105_crossmodal_dedup" -> ((s, d) => PipelineQueries.crossModalDup(s, d)),
    "q106_wordpiece_encode" -> ((s, d) => PipelineQueries.wordpieceEncodeArtifact(s, d)),
    "q107_centroid_classifier" -> ((s, d) => PipelineQueries.centroidClassifier(s, d)),
    "q108_knn_label_vote" -> ((s, d) => PipelineQueries.knnLabelVote(s, d)),
    "q109_hard_negatives" -> ((s, d) => PipelineQueries.hardNegatives(s, d)),
    "q110_cluster_reps" -> ((s, d) => PipelineQueries.clusterRepresentatives(s, d)),
    "q111_media_clusters" -> ((s, d) => PipelineQueries.mediaClusters(s, d)),
    "q112_snapshot_diff" -> ((s, d) => PipelineQueries.snapshotDiff(s, d)),
    "q113_media_gate_stream" -> ((s, d) => PipelineQueries.mediaGateStreamed(s, d)),
    "q114_tokenizer_report" -> ((s, d) => PipelineQueries.tokenizerReport(s, d)),
    "q115_event_funnel" -> ((s, d) => RelQueries.eventFunnel(s, d)),
    "q116_incremental_wordcount" -> ((s, d) => PipelineQueries.incrementalWordCountRefresh(s, d)),
    "q117_random_projection" -> ((s, d) => PipelineQueries.randomProjection(s, d)),
    "q118_projected_ann" -> ((s, d) => PipelineQueries.projectedAnnRecall(s, d)),
    "q119_textrank" -> ((s, d) => PipelineQueries.textRank(s, d)),
    "q120_hll_cardinality" -> ((s, d) => PipelineQueries.shingleCardinalitySketch(s, d)),
    "q121_sequential_patterns" -> ((s, d) => RelQueries.sequentialPatterns(s, d)),
    "q122_scd2_history" -> ((s, d) => RelQueries.userStateHistory(s, d)),
    "q123_triangle_census" -> ((s, d) => PipelineQueries.graphTriangleCensus(s, d)),
    "q124_exact_k_sample" -> ((s, d) => PipelineQueries.exactKPerSource(s, d)),
    "q125_snapshot_drift" -> ((s, d) => PipelineQueries.snapshotDrift(s, d)),
    "q126_scd2_stream" -> ((s, d) => RelQueries.userStateHistoryStreamed(s, d)),
    "q127_co_engagement" -> ((s, d) => RelQueries.itemCoEngagement(s, d)),
    "q128_cms_frequency" -> ((s, d) => PipelineQueries.cmsWordFrequency(s, d)),
    "q129_hll_refresh" -> ((s, d) => PipelineQueries.hllIncrementalRefresh(s, d)),
    "q130_typo_variants" -> ((s, d) => PipelineQueries.typoVariantPairs(s, d)),
    "q131_funnel_stream" -> ((s, d) => RelQueries.eventFunnelStreamed(s, d)),
    "q132_column_profile" -> ((s, d) => RelQueries.ordersProfile(s, d)),
    "q133_ivm_join_agg" -> ((s, d) => RelQueries.incrementalJoinAggRefresh(s, d)),
    "q134_quality_checks" -> ((s, d) => RelQueries.qualityCheckSuite(s, d)),
    "q135_hll_stream" -> ((s, d) => PipelineQueries.hllStreamMaintained(s, d)),
    "q136_coreset_select" -> ((s, d) => PipelineQueries.coresetSelect(s, d)),
    "q137_cms_join_size" -> ((s, d) => PipelineQueries.cmsJoinCardinality(s, d)),
    "q138_volume_trend" -> ((s, d) => RelQueries.volumeTrend(s, d)),
    "q139_length_winsorize" -> ((s, d) => PipelineQueries.lengthWinsorize(s, d)),
    "q140_multitouch_attribution" -> ((s, d) => RelQueries.multiTouchAttribution(s, d)),
    "q141_dedup_savings" -> ((s, d) => PipelineQueries.dedupSavingsCard(s, d)),
    "q142_robust_anomalies" -> ((s, d) => RelQueries.robustVolumeAnomalies(s, d)),
    "q143_shard_routing" -> ((s, d) => PipelineQueries.shardRouting(s, d)),
    "q144_decayed_popularity" -> ((s, d) => RelQueries.decayedPopularity(s, d)),
    "q145_interarrival_gaps" -> ((s, d) => RelQueries.interArrivalGaps(s, d)),
    "q146_derived_sessions" -> ((s, d) => RelQueries.derivedSessions(s, d)),
    "q147_quantile_sketch" -> ((s, d) => PipelineQueries.quantileSketch(s, d)),
    "q148_qsketch_refresh" -> ((s, d) => PipelineQueries.qsketchIncrementalRefresh(s, d)),
    "q149_canonical_dedup" -> ((s, d) => PipelineQueries.canonicalDedup(s, d)),
    "q150_dup_clusters_refresh" -> ((s, d) => PipelineQueries.dupClustersRefresh(s, d)),
    "q151_sample_stream" -> ((s, d) => PipelineQueries.sampleStreamMaintained(s, d)),
    "q152_ann_auto_rebuild" -> ((s, d) => PipelineQueries.annAutoRebuild(s, d)),
    "q153_bucketed_join" -> ((s, d) => RelQueries.bucketedJoin(s, d)),
    "q154_qsketch_stream" -> ((s, d) => PipelineQueries.qsketchStreamMaintained(s, d)),
    "q155_canonical_dedup_stream" -> ((s, d) => PipelineQueries.canonicalDedupStream(s, d)),
    "q156_price_quantile_sketch" -> ((s, d) => PipelineQueries.priceQuantileSketch(s, d)),
    "q157_cms_refresh" -> ((s, d) => PipelineQueries.cmsIncrementalRefresh(s, d)),
    "q158_bucketed_rollup" -> ((s, d) => RelQueries.bucketedRollup(s, d)),
    "q159_windowed_qsketch_stream" -> ((s, d) => RelQueries.windowedQsketchStreamed(s, d)),
    "q160_session_window_stream" -> ((s, d) => RelQueries.sessionWindowStreamed(s, d)),
    "q161_boilerplate_strip" -> ((s, d) => PipelineQueries.boilerplateStrip(s, d)),
    "q162_poisson_bootstrap" -> ((s, d) => PipelineQueries.poissonBootstrap(s, d)),
    "q163_boilerplate_refresh" -> ((s, d) => PipelineQueries.boilerplateStripRefresh(s, d)),
    "q164_epoch_order" -> ((s, d) => PipelineQueries.epochOrder(s, d)),
    "q165_adc_rank_eval" -> ((s, d) => PipelineQueries.adcRankEval(s, d)),
    "q166_classifier_eval" -> ((s, d) => PipelineQueries.classifierEvalReport(s, d)),
    "q167_length_batching" -> ((s, d) => PipelineQueries.lengthBatching(s, d)),
    "q168_closed_itemsets" -> ((s, d) => FpmQueries.closedMaximalItemsets(s, d)),
    "q169_boilerplate_gate_stream" -> ((s, d) => PipelineQueries.boilerplateGateStreamed(s, d)),
    "q170_itemset_refresh" -> ((s, d) => FpmQueries.itemsetRefresh(s, d)),
    "q171_rule_interest" -> ((s, d) => FpmQueries.ruleInterest(s, d)),
    "q172_lm_backoff_score" -> ((s, d) => PipelineQueries.lmDocScoreBackoff(s, d)),
    "q173_kmv_setops" -> ((s, d) => PipelineQueries.kmvSourceSetOps(s, d)),
    "q174_kmv_refresh" -> ((s, d) => PipelineQueries.kmvIncrementalRefresh(s, d)),
    "q175_priority_sample" -> ((s, d) => PipelineQueries.prioritySampleQuery(s, d)),
    "q176_lm_gate_stream" -> ((s, d) => PipelineQueries.lmGateStreamed(s, d)),
    "q177_kmv_stream" -> ((s, d) => PipelineQueries.kmvStreamMaintained(s, d)),
    "q178_rule_basis" -> ((s, d) => FpmQueries.ruleNonRedundant(s, d)),
    "q179_sketch_winsorize" -> ((s, d) => PipelineQueries.winsorizeFromSketch(s, d)),
    "q180_priority_sample_stream" -> ((s, d) => PipelineQueries.prioritySampleStreamMaintained(s, d)),
    "q181_mixture_interleave" -> ((s, d) => PipelineQueries.mixtureInterleaveQuery(s, d)),
    "q182_containment_neardup" -> ((s, d) => PipelineQueries.containmentNearDup(s, d)),
    "q183_key_skew" -> ((s, d) => RelQueries.keySkewReport(s, d)),
    "q184_quality_fusion" -> ((s, d) => PipelineQueries.qualityFusion(s, d)),
    "q185_token_budget" -> ((s, d) => PipelineQueries.tokenBudgetAllocation(s, d)),
    "q186_sequential_rules" -> ((s, d) => RelQueries.sequentialRules(s, d)),
    "q187_rules_from_artifact" -> ((s, d) => FpmQueries.rulesFromRefreshedArtifact(s, d)),
    "q188_itemset_stream" -> ((s, d) => FpmQueries.itemsetStreamMaintained(s, d)),
    "q189_seqpattern_refresh" -> ((s, d) => RelQueries.sequentialPatternRefresh(s, d)),
    "q190_seqpattern_stream" -> ((s, d) => RelQueries.sequentialPatternStreamMaintained(s, d)),
    "q191_seqrules_from_artifact" -> ((s, d) => RelQueries.sequentialRulesFromArtifact(s, d)),
    "q192_seqpattern_touch_refresh" -> ((s, d) => RelQueries.sequentialPatternTouchRefresh(s, d)),
    "q193_itemset_cdc_refresh" -> ((s, d) => FpmQueries.itemsetCdcRefresh(s, d)),
    "q194_itemset_cdc_stream" -> ((s, d) => FpmQueries.itemsetCdcStreamMaintained(s, d)),
    "q195_seqpattern_erase" -> ((s, d) => RelQueries.sequentialPatternErase(s, d)),
    "q196_seqpattern_touch_stream" -> ((s, d) => RelQueries.sequentialPatternTouchStream(s, d)),
    "q197_seqpattern_erase_stream" -> ((s, d) => RelQueries.sequentialPatternEraseStream(s, d)),
    "q198_predict_from_artifact" -> ((s, d) => FpmQueries.predictFromRefreshedArtifact(s, d)),
    "q199_itemset_auto_resnapshot" -> ((s, d) => FpmQueries.itemsetAutoResnapshot(s, d)),
    "q200_seqpattern_auto_resnapshot" -> ((s, d) => RelQueries.sequentialPatternAutoResnapshot(s, d)),
    "q201_next_event_predict" -> ((s, d) => RelQueries.sequentialPredict(s, d)),
    "q202_seq_predict_from_artifact" -> ((s, d) => RelQueries.sequentialPredictFromArtifact(s, d)),
    "q203_seqpattern_touch_auto_resnapshot" -> ((s, d) => RelQueries.sequentialPatternTouchAutoResnapshot(s, d)),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q01_baskets" -> FpmQueries.BasketsSql,
    "q02_l1_freq_items" -> FpmQueries.l1Sql(),
    "q03_freq_itemsets" -> FpmQueries.FreqItemsetsSql,
    "q04_assoc_rules" -> FpmQueries.AssocRulesSql,
    "q05_predict" -> FpmQueries.PredictSql,
    // q05b: relational twin of q05 — identical rows, identical oracle
    "q05b_predict_relational" -> FpmQueries.PredictSql,
    "q06_pricing_summary" -> RelQueries.PricingSummarySql,
    "q07_nation_revenue" -> RelQueries.NationRevenueSql,
    "q08_top_orders" -> RelQueries.TopOrdersSql,
    "q09_distinct_status" -> RelQueries.DistinctStatusSql,
    "q10_word_count" -> RelQueries.WordCountSql,
    "q11_event_stats" -> RelQueries.EventStatsSql,
    "q12_dedup_exact" -> PipelineQueries.DedupExactSql,
    // q13 ships stop-gram-pruned (maxShingleDF=2) — the scale-safe config;
    // the oracle applies the identical pruning
    "q13_ngram_jaccard" -> PipelineQueries.NgramJaccardSql,
    "q14_minhash_lsh" -> PipelineQueries.MinHashLshSql,
    // q15: the full simhash IS DuckDB-expressible — token Karp-Rabin in
    // HUGEINT mod-2^64, bit votes, brute-force hamming (banding is
    // pigeonhole-exact for hamming <= 3, so the pair sets are equal)
    "q15_simhash_pairs" -> PipelineQueries.SimHashPairsSql,
    "q16_text_quality" -> PipelineQueries.QualitySql,
    "q17_lang_id" -> PipelineQueries.LangIdSql,
    "q18_token_counts" -> PipelineQueries.TokenCountsSql,
    "q19_fingerprint_md5" -> PipelineQueries.FingerprintMd5Sql,
    "q20_fingerprint_rolling" -> PipelineQueries.FingerprintRollingSql,
    "q21_embedding_stats" -> PipelineQueries.EmbeddingStatsSql,
    "q22_cosine_topk" -> PipelineQueries.CosineTopKSql,
    // q23: LSH is approximate by design, so the declared row is its
    // accuracy contract — recall vs the in-Spark exact top-k as a
    // boolean the oracle pins true (the q64 pattern)
    "q23_ann_lsh" -> PipelineQueries.AnnLshSql,
    "q24_frame_samples" -> PipelineQueries.FrameSamplesSql,
    "q25_media_features" -> PipelineQueries.MediaFeaturesSql,
    "q26_event_hourly" -> RelQueries.EventHourlySql,
    "q27_event_sessions" -> RelQueries.EventSessionsSql,
    "q28_json_props" -> RelQueries.JsonPropsSql,
    "q29_rules_by_antecedent" -> FpmQueries.RulesByAntecedentSql,
    "q30_supplier_itemsets" -> FpmQueries.SupplierItemsetsSql,
    "q31_running_revenue" -> RelQueries.RunningRevenueSql,
    "q32_order_presence" -> RelQueries.CustomerOrderPresenceSql,
    "q33_embedding_neardup" -> PipelineQueries.EmbeddingNearDupSql,
    // q33b: exact grid-join path — identical pair set, identical oracle
    "q33b_neardup_grid" -> PipelineQueries.EmbeddingNearDupSql,
    // q34: declared at nProbe = numCentroids — provably brute force
    // (PipelineSpec full-probe equivalence), so the q22 oracle is exact;
    // the approximate nProbe < numCentroids regime stays spec-covered
    "q34_ann_ivf" -> PipelineQueries.CosineTopKSql,
    "q35_tfidf" -> PipelineQueries.TfIdfSql,
    // q36: estimates are engine-specific, so the row carries the exact
    // distinct count (cross-checked) plus within-tolerance booleans the
    // oracle pins true
    "q36_sketches" -> PipelineQueries.SketchesSql,
    "q37_rollup" -> RelQueries.RollupCountsSql,
    "q38_event_pivot" -> RelQueries.EventPivotSql,
    "q39_heavy_hitters" -> PipelineQueries.HeavyHittersSql,
    "q40_dup_clusters" -> PipelineQueries.DupClustersSql,
    // q40b: alternating-star CC — identical labels, identical oracle
    "q40b_dup_clusters_logn" -> PipelineQueries.DupClustersSql,
    "q41_quality_band" -> PipelineQueries.QualityBandSql,
    "q42_stratified_sample" -> PipelineQueries.StratifiedSampleSql,
    "q43_seq_packing" -> PipelineQueries.PackSequencesSql,
    "q44_asof_attribution" -> RelQueries.EventAttributionSql,
    "q45_interval_join" -> RelQueries.SignupFollowupsSql,
    "q46_repetition" -> PipelineQueries.RepetitionSql,
    "q47_oov_rate" -> PipelineQueries.OovRateSql,
    "q48_contamination" -> PipelineQueries.ContaminationSql,
    // q48b: Bloom-prefiltered + exact-verified — identical rows, identical oracle
    "q48b_contamination_bloom" -> PipelineQueries.ContaminationSql,
    "q49_incremental_dedup" -> PipelineQueries.IncrementalDedupSql,
    "q50_mixture_sample" -> PipelineQueries.MixtureSampleSql,
    "q51_top_per_nation" -> RelQueries.TopCustomersPerNationSql,
    "q52_lang_percentiles" -> PipelineQueries.LangTokenPercentilesSql,
    "q53_bigram_model" -> PipelineQueries.BigramModelSql,
    "q54_repeated_spans" -> PipelineQueries.RepeatedSpansSql,
    "q55_token_ids" -> PipelineQueries.TokenIdsSql,
    "q56_zorder_keys" -> RelQueries.ZorderKeysSql,
    "q57_latest_events" -> RelQueries.LatestEventsSql,
    "q58_retention_cohorts" -> RelQueries.RetentionCohortsSql,
    "q59_curation_pipeline" -> PipelineQueries.CurationPipelineSql,
    "q60_event_hopping" -> RelQueries.EventHoppingSql,
    "q61_status_cube" -> RelQueries.StatusCubeSql,
    "q62_event_paths" -> RelQueries.EventPathsSql,
    // q63: Apriori — same itemsets as q03 from a different algorithm
    // (cross-algorithm differential under the same oracle)
    "q63_apriori_itemsets" -> FpmQueries.FreqItemsetsSql,
    // q64: layout contract booleans computed from real file envelopes on
    // the Spark side; the oracle pins row preservation + properties true
    "q64_zorder_layout" -> RelQueries.ZorderLayoutSql,
    // q65: the salted-join path — equal to the plain join by construction,
    // so the oracle is the plain SQL join
    "q65_salted_segments" -> RelQueries.SaltedSegmentsSql,
    // q66: LM doc scoring in cross-engine-exact arithmetic (counts, a
    // count ratio, and a floor-fixed-point BIGINT sum — no libm logs)
    "q66_lm_doc_score" -> PipelineQueries.LmDocScoreSql,
    // q67: full redacted text hash-checked — Java regex and RE2 agree on
    // the shared pattern subset (char classes + repeats only)
    "q67_pii_redaction" -> PipelineQueries.PiiRedactionSql,
    // q68: every quantized element hash-checked (floor-half-up has no
    // rounding-tie ambiguity; divisions are IEEE-deterministic)
    "q68_embedding_quantize" -> PipelineQueries.EmbeddingQuantizeSql,
    // q69: md5-bucket split — the same cross-engine-exact gate as q42/q50
    "q69_dataset_split" -> PipelineQueries.DatasetSplitSql,
    // q70: z-scores hash-exactly cross-engine — integer window sums,
    // IEEE divisions, and sqrt (correctly rounded by IEEE 754, unlike log)
    "q70_event_anomalies" -> RelQueries.EventAnomaliesSql,
    // q71: every chunk's full text hash-checked — slice boundaries and
    // tokenization must agree token-for-token across engines
    "q71_doc_chunks" -> PipelineQueries.DocChunksSql,
    // q72: int8 codes are floor-half-up exact (q68), md5 hex agrees
    // cross-engine (q12/q19), so bucket membership is hash-exact
    "q72_semantic_dedup" -> PipelineQueries.SemanticDedupSql,
    // q73: winnowing selection is deterministic given the gram hashes;
    // both engines order mins over SIGNED 64-bit values (DuckDB converts
    // the HUGEINT fold to BIGINT before comparing) with rightmost ties
    "q73_winnow_fingerprints" -> PipelineQueries.WinnowFingerprintsSql,
    // q74: shared-fingerprint counts are exact integers over the same
    // sketch both engines select identically (q73)
    "q74_winnow_neardup" -> PipelineQueries.WinnowNeardupSql,
    // q75: q44 through the native AsOfJoinExec — same rows, same oracle
    // (cross-implementation differential, like q63 vs q03)
    "q75_asof_native" -> RelQueries.EventAttributionSql,
    // q76: integer rollup of q74's pair set through two doc->source
    // lookups — exact wherever q74 is
    "q76_source_leakage" -> PipelineQueries.SourceLeakageSql,
    // q77: all-integer aggregates (counts, exact distinct counts, token
    // sums) — engine-order-independent, hash-exact
    "q77_corpus_card" -> PipelineQueries.CorpusCardSql,
    // q78: baskets round-tripped through the DSv2 connector's text format
    // and split planner (64 KiB ranges), reduced to item frequencies —
    // lossless round trip, so the oracle counts straight from parquet
    "q78_v2_item_freq" -> FpmQueries.V2ItemFreqSql,
    // q79: BPE tokenizer training — 20 unrolled merge rounds in DuckDB
    // list/string algebra; the total-ordered argmax (count desc, then
    // lexicographic pair) makes the merge sequence engine-independent
    "q79_bpe_merges" -> PipelineQueries.bpeMergesSql(),
    // q80: inference half of q79 — doc words joined against the FINAL
    // unrolled dictionary state; the whole encoded string hash-checked
    "q80_bpe_encode" -> PipelineQueries.bpeEncodeSql(),
    // q81: the connector WRITE path's contract row — staged-rename commit
    // + read-back multiset equality computed from the real written files;
    // the oracle pins the round trip true (the q64 write-path pattern)
    "q81_v2_write_roundtrip" -> FpmQueries.V2WriteRoundtripSql,
    // q82: one-day-lookback attribution — the batch twin of the evicting
    // stream; integer-microsecond ages make the horizon cut hash-exact
    "q82_asof_lookback" -> RelQueries.EventAttributionLookbackSql,
    // q83: the shipped-artifact tokenizer path — same output as q80 by
    // construction (train -> save -> load -> encode inside the declared
    // query), so it shares q80's oracle; the row it adds is the artifact
    // round trip itself
    "q83_bpe_artifact" -> PipelineQueries.bpeEncodeSql(),
    // q84: the attribution STREAM executed under availableNow into a
    // parquet sink and read back — q44's oracle verbatim: the streaming
    // state machine must reproduce the ASOF join row-for-row
    "q84_asof_stream" -> RelQueries.EventAttributionSql,
    // q85: q78's item frequencies with the connector's manifest commit
    // and MICRO_BATCH_READ in the executed path — same lossless text
    // round trip, so q78's oracle applies verbatim
    "q85_v2_stream_freq" -> FpmQueries.V2ItemFreqSql,
    // q86: PQ is approximate by construction, so the declared row is a
    // recall CONTRACT (the q23 pattern): the oracle re-derives the query
    // count and pins recall_ok true; the exact regime is spec-pinned
    // (PqSpec lossless-quantization == brute force)
    "q86_ann_pq" -> PipelineQueries.AnnPqSql,
    // q87: IVFADC composes the q34 (IVF) and q86 (PQ) artifacts; same
    // recall-contract adjudication as q23/q86 — approximate by
    // construction, exactness spec-pinned in the provable regimes
    // (PqSpec: lossless codebook + full probe == brute force)
    "q87_ann_ivfpq" -> PipelineQueries.AnnIvfPqSql,
    "q88_mixture_sample" -> PipelineQueries.MixtureSampleReportSql,
    // q89: q69's md5 split gate keyed by q40's recursive-CTE cluster id
    "q89_leakage_safe_split" -> PipelineQueries.LeakageSafeSplitSql,
    // q90: q87's PERSISTED (id, cell, code) inverted file INCREMENTALLY
    // maintained — base encode, delta append under the frozen quantizer,
    // search from the unioned codes; same recall-contract oracle
    // (per-row encoding means base+delta == one-pass union, spec-pinned)
    "q90_ann_ivfpq_indexed" -> PipelineQueries.AnnIvfPqIndexedSql,
    // q91: the session stream EXECUTED under availableNow into a parquet
    // sink (the q84 graduation pattern) — the oracle is q27's session
    // algebra restricted to sessions that CLOSE under streaming
    // semantics, including the operator's exact timer arithmetic
    "q91_sessions_stream" -> RelQueries.EventSessionsStreamedSql,
    // q92: the watermarked hourly windowed aggregation EXECUTED under
    // availableNow (append mode) — q26's algebra restricted to windows
    // the final watermark closed, pinning the eviction arithmetic
    "q92_hourly_stream" -> RelQueries.EventHourlyStreamedSql,
    // q93: q34's IVF search served from the persisted cell-partitioned
    // inverted LIST (assign once -> save -> load -> probe); declared at
    // full probe, so the exact q22 oracle hash-checks the whole path
    "q93_ann_ivf_indexed" -> PipelineQueries.CosineTopKSql,
    // q94: the hopping-window stream EXECUTED under availableNow — q60's
    // algebra restricted to watermark-closed windows (q92's eviction
    // arithmetic at 30-minute window length, three live windows a row)
    "q94_hopping_stream" -> RelQueries.EventHoppingStreamedSql,
    // q95: the stream-stream interval join EXECUTED — inner joins emit
    // on match (no watermark wait), so the oracle is q45's interval
    // predicate at pair granularity with no eviction clause
    "q95_followups_stream" -> RelQueries.SignupFollowupsStreamedSql,
    // q96: streaming dedup EXECUTED — the emitted fingerprint SET is
    // deterministic (which survivor the state keeps is not, and is
    // deliberately not declared); q12's fingerprint algebra distinct
    "q96_dedup_stream" -> PipelineQueries.DedupStreamSql,
    // q97: the streaming bloom gate as a CONTRACT row — the oracle pins
    // the one-sided-error boolean (no false negatives vs the exact q48
    // truth) and re-derives the train-doc count
    "q97_contam_gate_stream" -> PipelineQueries.ContaminationGateStreamedSql,
    // q98: the streaming MinHash near-dup gate as a CONTRACT row — every
    // odd doc with an exact cross-split jaccard-0.7 near-dup (q49's
    // operator as truth) must be flagged; q14's recall adjudication
    "q98_neardup_gate_stream" -> PipelineQueries.NearDupGateStreamedSql,
    // q99: ExactSubstr-style span REMOVAL (the cleaning half of q54's
    // signal) — full cleaned_text hash-checked against the identical
    // span algebra replayed in DuckDB
    "q99_span_dedup" -> PipelineQueries.SpanDedupSql,
    // q100: per-media 64-bit perceptual fingerprint (b-bit minwise over
    // byte-shingle features), full packed value replayed in DuckDB via
    // the q15 Karp-Rabin CTEs — pure integer algebra, hash-exact
    "q100_media_phash" -> PipelineQueries.MediaPhashSql,
    // q101: perceptual near-dup pairs at hamming <= 6 — 8x8-bit banding
    // is pigeonhole-complete to 7, so the banded pair set EQUALS the
    // oracle's brute-force pair hamming over the replayed fingerprints
    "q101_media_phash_pairs" -> PipelineQueries.MediaPhashPairsSql,
    // q102: unigram-LM tokenizer training (seed -> EM -> prune -> EM),
    // the final (piece, e, p) model hash-checked: expected counts are
    // 1e-12 fixed-point integers and probabilities exact IEEE-double
    // ratios in a pinned evaluation order, so the oracle's unrolled
    // recursive-CTE forward-backward passes reproduce them bit-for-bit
    "q102_unigram_model" -> PipelineQueries.unigramModelSql(),
    // q103: the artifact half — save/load the q102 model through
    // parquet, Viterbi-encode under the frozen model; the oracle runs
    // the same lattice DP as a recursive CTE (ties to the longest
    // piece) and hash-checks every encoded string
    "q103_unigram_encode" -> PipelineQueries.unigramEncodeSql(),
    // q104: quantizer-drift measurement — a deliberately STALE index
    // (quantizer trained on the even half, inverted file over the odd
    // half) scored by recallProbe against exact truth; the oracle pins
    // the measurement arithmetic (query and exact-pair counts) and the
    // monitoring verdict, the q86 contract-row adjudication
    "q104_ann_drift" -> PipelineQueries.AnnDriftSql,
    // q105: the cross-modal (caption<->media) join contract — q101's
    // media near-dup pairs annotated with caption-fingerprint equality;
    // same_caption=false rows are "same media, re-captioned", the dup
    // class a text-only pass cannot see. Full table hash-checked
    "q105_crossmodal_dedup" -> PipelineQueries.CrossModalDupSql,
    // q106: WordPiece-style greedy longest-match encode under the q102
    // vocab artifact — the third tokenizer inference regime (BPE
    // merge-replay, unigram Viterbi, greedy maximum munch); the oracle
    // replays the scan float-free as a single-successor recursive CTE
    "q106_wordpiece_encode" -> PipelineQueries.wordpieceEncodeSql(),
    // q107: nearest-centroid embedding classifier (the curation-filter
    // gate) — centroids are exact fixed-point ratios, scores
    // left-to-right double dots, so per-row preds AND margins
    // hash-match the oracle's list_reduce replay bit-for-bit
    "q107_centroid_classifier" -> PipelineQueries.CentroidClassifierSql,
    // q108: kNN label vote (label propagation) served from the q93
    // IVF-FLAT artifact at FULL probe — provably exact, equi-join
    // shaped, so the oracle brute-forces the identical neighborhoods
    // and the per-row vote table hash-matches (rank-boundary margins
    // 1.9e-5/1.6e-6 at sf0.01/sf0.1, far above double noise)
    "q108_knn_label_vote" -> PipelineQueries.KnnLabelVoteSql,
    // q109: hard-negative mining (contrastive-training prep) — q22's
    // exact broadcast shape with the label anti-filter applied BEFORE
    // ranking; ids/ranks only, margins measured far above float noise
    "q109_hard_negatives" -> PipelineQueries.HardNegativesSql,
    // q110: quality-aware dup-cluster representative — per q40 cluster
    // keep the doc with the most content ("longest copy" policy), the
    // curation decision the clusters exist to serve; shares q40's CC
    // cache and oracle CTEs
    "q110_cluster_reps" -> PipelineQueries.ClusterRepresentativesSql,
    // q111: media dup clusters + canonical copy — q40/q110's contract on
    // the image side (transitive closure over the q101 perceptual pairs,
    // largest payload kept per cluster); oracle = fingerprint replay +
    // recursive CC + payload-ranked representative
    "q111_media_clusters" -> PipelineQueries.MediaClustersSql,
    // q112: corpus snapshot diff (incremental-crawl manifest) — presence
    // + normalized-fingerprint compare across two deterministic corpus
    // versions; one full-outer join on id, fingerprints only on the wire
    "q112_snapshot_diff" -> PipelineQueries.SnapshotDiffSql,
    // q113: streaming media near-dup gate, EXECUTED — exact (pigeonhole
    // banding + in-probe exact hamming), so the FULL per-payload flag
    // table is declared, not a recall contract; oracle brute-forces the
    // cross-split exists-within-hamming-6 predicate on replayed
    // fingerprints
    "q113_media_gate_stream" -> PipelineQueries.MediaGateStreamedSql,
    // q114: tokenizer selection report — all three encode regimes (BPE,
    // unigram Viterbi, WordPiece greedy) aggregated to fertility +
    // compression; integer sums then single IEEE divisions, hash-exact;
    // training shared with q80/q103/q106 via the keyed model caches
    "q114_tokenizer_report" -> PipelineQueries.tokenizerReportSql(),
    // q115: ordered conversion funnel (view -> click -> purchase) —
    // strict event-time ordering per user, one filtered aggregation per
    // step plus user-keyed joins; no window over the event log
    "q115_event_funnel" -> RelQueries.EventFunnelSql,
    // q116: incremental aggregate refresh from the q112 manifest —
    // retract removed/changed old contributions, add added/changed new
    // ones; the oracle recomputes DIRECTLY over the new snapshot, so
    // the hash match proves delta == full recompute
    "q116_incremental_wordcount" -> PipelineQueries.IncrementalWordCountSql,
    // q117: seeded Rademacher (JL) random projection 64 -> 16 — md5-derived
    // sign matrix identical on both engines, left-to-right double dots
    // (array_dot fold == list_reduce fold), full projected vectors
    // hash-matched; pure projection, no shuffle
    "q117_random_projection" -> PipelineQueries.RandomProjectionSql,
    // q118: two-stage retrieval under the q117 projection — shortlist by
    // projected dot, exact-cosine re-rank; recall contract >= 0.7 vs
    // brute force (measured 0.942/0.912 at sf0.01/sf0.1)
    "q118_projected_ann" -> PipelineQueries.ProjectedAnnRecallSql,
    // q119: TextRank keywords — exact fixed-point PageRank (1e-6 units,
    // floor division) over the word co-occurrence graph; ten damped
    // rounds unrolled as chained CTEs, full node table hash-matched
    "q119_textrank" -> PipelineQueries.TextRankSql,
    // q120: deterministic 256-register HyperLogLog over the rolling hash
    // — distinct shingles per source; exact integer registers + pinned
    // IEEE estimate, in-row exact adjudication, bound 0.25
    "q120_hll_cardinality" -> PipelineQueries.ShingleCardinalitySketchSql,
    // q121: GSP/PrefixSpan-family sequential patterns over per-user
    // event histories — candidate growth with the lossless prune; the
    // oracle counts ordered-position containment joins directly
    "q121_sequential_patterns" -> RelQueries.SequentialPatternsSql,
    // q122: SCD2 history build — change detection + validity intervals,
    // two windows over one (user) exchange; strict (time, id) order
    "q122_scd2_history" -> RelQueries.UserStateHistorySql,
    // q123: triangle census of the co-occurrence graph — node-ordered
    // two-join triangle count, exact integer wedges, one IEEE division
    "q123_triangle_census" -> PipelineQueries.GraphTriangleCensusSql,
    // q124: deterministic exact-k per-source sample — fixed quota via
    // salted-md5 rank, WindowGroupLimit pre-prunes map-side
    "q124_exact_k_sample" -> PipelineQueries.ExactKPerSourceSql,
    // q125: length-distribution drift between the q112 snapshot versions
    // — exact per-bucket counts, pinned IEEE shares, 2% per-bucket flag
    "q125_snapshot_drift" -> PipelineQueries.SnapshotDriftSql,
    // q126: q122's SCD2 build EXECUTED as a stream (flatMapGroupsWithState,
    // one open version of state per key, availableNow -> parquet sink);
    // the oracle restricts q122's algebra to versions closed by an event
    "q126_scd2_stream" -> RelQueries.UserStateHistoryClosedSql,
    // q127: item-item co-engagement (collaborative-filtering prep) —
    // distinct (user, item) reduction first bounds the self-join fan-out;
    // Jaccard over user sets as a ratio of exact counts
    "q127_co_engagement" -> RelQueries.ItemCoEngagementSql,
    // q128: count-min frequency sketch (4x256 exact integer counters,
    // +-mergeable) probed at the exact top-20 words; the CMS
    // never-underestimates contract pinned true per probe
    "q128_cms_frequency" -> PipelineQueries.CmsWordFrequencySql,
    // q129: incremental HLL refresh — persisted base registers + delta
    // shard merged register-wise; the oracle sketches the union corpus
    // directly, so the hash match proves delta-refresh == full recompute
    "q129_hll_refresh" -> PipelineQueries.HllIncrementalRefreshSql,
    // q130: FastSS typo-variant pairs — deletion-neighborhood blocking
    // + exact Levenshtein verify; the oracle brute-forces the cross
    // join, so the hash match is a cross-algorithm differential
    "q130_typo_variants" -> PipelineQueries.TypoVariantPairsSql,
    // q131: q115's funnel EXECUTED as a stream — per-key stage machine
    // in flatMapGroupsWithState emits one conversion row on completion;
    // oracle = the batch funnel joined down to completed users
    "q131_funnel_stream" -> RelQueries.EventFunnelCompletedSql,
    // q132: per-column profiler card over orders — in-scan unpivot,
    // value-vocabulary reduction, exact distincts and canonical bounds
    "q132_column_profile" -> RelQueries.OrdersProfileSql,
    // q133: join-aggregate materialized view refreshed from a delta —
    // exact decimal sums make merge == direct recompute; the oracle
    // recomputes over the full fact table, proving it
    "q133_ivm_join_agg" -> RelQueries.IncrementalJoinAggSql,
    // q134: declarative data-quality suite — null/range/set checks as
    // conditional aggregates (one scan per table) plus FK-orphan checks
    // as left joins; (check, n_rows, n_violations, passed) per check
    "q134_quality_checks" -> RelQueries.QualityCheckSuiteSql,
    // q135: streaming sketch maintenance — per-batch registers merged
    // into the persisted artifact via foreachBatch; max-merge is
    // associative+commutative, so the oracle's one-pass whole-corpus
    // sketch proves batch boundaries don't matter
    "q135_hll_stream" -> PipelineQueries.HllStreamMaintainedSql,
    // q136: greedy k-center coreset (farthest-first) — five unrolled
    // oracle rounds, identical fold order; distances hash-match exactly
    "q136_coreset_select" -> PipelineQueries.CoresetSelectSql,
    // q137: CMS join-cardinality estimate — counter inner product,
    // min over depth rows; never-under contract + true size in-row
    "q137_cms_join_size" -> PipelineQueries.CmsJoinCardinalitySql,
    // q138: per-type OLS volume trend — exact decimal moment sums, a
    // pinned handful of IEEE ops for slope/intercept; no iteration
    "q138_volume_trend" -> RelQueries.VolumeTrendSql,
    // q139: per-source length winsorization — exact [p05, p95] order
    // statistics from the q52 histogram machinery, broadcast clip
    "q139_length_winsorize" -> PipelineQueries.LengthWinsorizeSql,
    // q140: multi-touch linear attribution — q45's interval join +
    // one per-purchase window; credit = one IEEE division
    "q140_multitouch_attribution" -> RelQueries.MultiTouchAttributionSql,
    // q141: dedup savings card — one row from the shared CC labels:
    // clusters, redundant copies, characters a rep-only corpus saves
    "q141_dedup_savings" -> PipelineQueries.DedupSavingsCardSql,
    // q142: robust (median/MAD) volume anomalies — two exact
    // order-statistic passes, 50% breakdown point vs q70's mean/sigma
    "q142_robust_anomalies" -> RelQueries.RobustVolumeAnomaliesSql,
    // q143: rendezvous (HRW) shard routing at 8 vs 9 shards — pure
    // projection, unsigned argmax; only keys the new shard wins move
    "q143_shard_routing" -> PipelineQueries.ShardRoutingSql,
    // q144: half-life popularity — exact shifted-integer decay weights
    // (no libm pow), one grouped sum, one final division
    "q144_decayed_popularity" -> RelQueries.DecayedPopularitySql,
    // q145: inter-arrival gap distribution — exact p50/p90/p99 order
    // statistics; the empirical basis for the session-gap choice
    "q145_interarrival_gaps" -> RelQueries.InterArrivalGapsSql,
    // q146: sessionization under the DERIVED p99-gap timeout — q145's
    // distribution put to work; timeout pinned as a column
    "q146_derived_sessions" -> RelQueries.DerivedSessionsSql,
    // q147: log-bucketed mergeable quantile sketch vs exact order
    // statistics — all-integer one-sided tolerance (est-exact)*64 <= exact
    "q147_quantile_sketch" -> PipelineQueries.QuantileSketchSql,
    // q148: quantile-sketch artifact save/load + delta merge — cell-wise
    // count sum, so delta-refresh == full recompute bit for bit
    "q148_qsketch_refresh" -> PipelineQueries.QsketchIncrementalRefreshSql,
    // q149: exact dedup keyed by the NFC + punct/case/space canonical
    // fingerprint — the documented first dedup stage; NFKC strength is
    // spec-pinned (no DuckDB twin)
    "q149_canonical_dedup" -> PipelineQueries.CanonicalDedupSql,
    // q150: dup-cluster artifact + delta union-find fold — CC is edge-
    // partition-insensitive, so delta refresh == full recompute
    "q150_dup_clusters_refresh" -> PipelineQueries.DupClustersRefreshSql,
    // q151: stream-maintained exact-k sample — hash-ranked top-k is
    // associative, so the oracle is q124's whole-corpus SQL verbatim
    "q151_sample_stream" -> PipelineQueries.ExactKPerSourceSql,
    // q152: the q104 drift measurement driving its rebuild: stale index
    // misses the unindexed half -> trigger fires; rebuilt index pinned
    // back above the recall floor
    "q152_ann_auto_rebuild" -> PipelineQueries.AnnAutoRebuildSql,
    // q153: co-located bucketed fact-fact join — layout pre-pays the
    // join shuffle; oracle joins the raw parquet (layout never changes
    // results)
    "q153_bucketed_join" -> RelQueries.BucketedJoinSql,
    // q154: quantile-sketch artifact maintained by a stream — count-sum
    // merge is associative+commutative, so the oracle's one-pass sketch
    // proves boundary and order independence
    "q154_qsketch_stream" -> PipelineQueries.QsketchStreamMaintainedSql,
    // q155: streaming dedup under the q149 canonical key — ingest-time
    // canonicalization; oracle = canonical fingerprints deduplicated
    "q155_canonical_dedup_stream" -> PipelineQueries.CanonicalDedupStreamSql,
    // q156: the quantile sketch on q36's actual caveat domain (price
    // cents — corpus-growing distinct values); bounded cells pinned as
    // data, same all-integer one-sided contract
    "q156_price_quantile_sketch" -> PipelineQueries.PriceQuantileSketchSql,
    // q157: count-min artifact save/load + delta sum-merge — the FULL
    // 1024-cell counter table hash-checked vs one-pass union counters
    "q157_cms_refresh" -> PipelineQueries.CmsIncrementalRefreshSql,
    // q158: bucket-local rollup on the bucket key — zero exchanges in
    // the whole plan; layout must never change results
    "q158_bucketed_rollup" -> RelQueries.BucketedRollupSql,
    // q159: watermarked windowed quantile sketch — the sketch cell IS
    // the streaming aggregation key; oracle = per-hour sketch over
    // watermark-closed windows (q92's eviction arithmetic)
    "q159_windowed_qsketch_stream" -> RelQueries.WindowedQsketchStreamedSql,
    // q160: native session_window sessionization — built-in semantics
    // (strict > gap splits; gap-equal merges) replayed exactly,
    // watermark-closed sessions only
    "q160_session_window_stream" -> RelQueries.SessionWindowStreamedSql,
    // q161: C4-style corpus-frequent chunk removal + in-order document
    // reassembly — the cleaned text is hash-checked chunk-for-chunk
    "q161_boilerplate_strip" -> PipelineQueries.BoilerplateStripSql,
    // q162: Poisson bootstrap — frozen ppm inverse-CDF multiplicities,
    // every replica mean one IEEE division of exact integer sums
    "q162_poisson_bootstrap" -> PipelineQueries.PoissonBootstrapSql,
    // q163: the q161 strip served from a saved -> loaded -> delta-folded
    // chunk-count artifact; shares q161's oracle, so the hash match IS
    // the delta == full-recompute proof
    "q163_boilerplate_refresh" -> PipelineQueries.BoilerplateStripSql,
    // q164: per-epoch deterministic shuffle order — shard + intra-shard
    // position for every (doc, epoch), the data-loader order contract
    "q164_epoch_order" -> PipelineQueries.EpochOrderSql,
    // q165: ADC rank eval — the true NN's rank under int8 asymmetric
    // scoring, both rankings replayed bit-exactly (MRR = mean of the
    // reciprocal-rank column)
    "q165_adc_rank_eval" -> PipelineQueries.AdcRankEvalSql,
    // q166: per-class precision/recall/F1 over the q107 predictions —
    // undefined ratios stay NULL, F1 pinned as (2*p*r)/(p+r) per row
    "q166_classifier_eval" -> PipelineQueries.ClassifierEvalSql,
    // q167: length-bucketed batching — batch boundaries and per-batch
    // padding waste (n * max_len - sum_len) as exact integers
    "q167_length_batching" -> PipelineQueries.LengthBatchingSql,
    // q168: closed/maximal itemset flags within the q03 arity cap —
    // subset-bitmask equi-join, oracle replays the same enumeration
    "q168_closed_itemsets" -> FpmQueries.ClosedMaximalSql,
    // q169: streaming boilerplate gate served from the persisted q163
    // artifact — per-doc output exact-replayed, not a contract boolean
    "q169_boilerplate_gate_stream" -> PipelineQueries.BoilerplateGateStreamedSql,
    // q170: incremental FP-growth itemset artifact (FUP candidate
    // refresh at a reduced probe threshold) — oracle is q03's statement
    // verbatim: delta-refresh == full re-mine, bit for bit
    "q170_itemset_refresh" -> FpmQueries.ItemsetRefreshSql,
    // q171: leverage + conviction beside q04's columns — exact decimal
    // count products, one pinned IEEE finish per measure
    "q171_rule_interest" -> FpmQueries.RuleInterestSql,
    // q172: stupid-backoff LM score — unseen bigrams fall back to
    // 0.4 * unigram/T; every e12 term a pinned IEEE chain, replayed
    "q172_lm_backoff_score" -> PipelineQueries.LmDocScoreBackoffSql,
    // q173: KMV set-operation sketch — pairwise union/Jaccard/intersection
    // estimates from k-min synopses, exact references + bound flags beside
    "q173_kmv_setops" -> PipelineQueries.KmvSourceSetOpsSql,
    // q174: stored synopsis + delta fold == union-corpus sketch — the
    // oracle recomputes the whole pair report from the union in one pass
    "q174_kmv_refresh" -> PipelineQueries.KmvIncrementalRefreshSql,
    // q175: weighted priority sample — sample, ranks, tau, and the
    // max(w, tau) estimator all replayed from the same md5 priorities
    "q175_priority_sample" -> PipelineQueries.PrioritySampleSql,
    // q176: streaming LM gate from the persisted artifact — per-doc
    // scores + gate flag exact-replayed (the q169 full-hash class)
    "q176_lm_gate_stream" -> PipelineQueries.LmGateStreamedSql,
    // q177: stream-maintained KMV synopsis — k-min merge is associative
    // and commutative, so the oracle is q173's one-pass statement verbatim
    "q177_kmv_stream" -> PipelineQueries.KmvSourceSetOpsSql,
    // q178: non-redundant rule basis — redundancy witnessed by
    // more-general same-consequent rules in the declared table
    "q178_rule_basis" -> FpmQueries.RuleNonRedundantSql,
    // q179: winsorize from the qsketch artifact — both clips + the
    // one-sided 1/64 threshold contract adjudicated in-row
    "q179_sketch_winsorize" -> PipelineQueries.WinsorizeFromSketchSql,
    // q180: stream-maintained weighted sample — top-m associativity +
    // pure per-row priorities make the oracle q175's SQL verbatim
    "q180_priority_sample_stream" -> PipelineQueries.PrioritySampleSql,
    // q181: stride-scheduled mixture interleave — exact integer virtual
    // times, per-shard order, full table hash-checked
    "q181_mixture_interleave" -> PipelineQueries.MixtureInterleaveSql,
    // q182: asymmetric containment pairs — both directions + jaccard,
    // threshold on the larger direction
    "q182_containment_neardup" -> PipelineQueries.ContainmentNearDupSql,
    // q183: key-skew profile + integer salt recommendation per hot key
    "q183_key_skew" -> RelQueries.KeySkewReportSql,
    // q184: RRF multi-signal quality selection — three per-source
    // rankings fused by sum 1/(60+rank), top-5 per source
    "q184_quality_fusion" -> PipelineQueries.QualityFusionSql,
    // q185: water-filling token budget — integer waterline, exact
    // closed form, whole allocation hash-checked
    "q185_token_budget" -> PipelineQueries.TokenBudgetAllocationSql,
    // q186: sequence rules prefix->last — confidence/lift from the q121
    // pattern table, the q04 surface for the sequential half
    "q186_sequential_rules" -> RelQueries.SequentialRulesSql,
    // q187: rules derived from the q170-refreshed itemset artifact —
    // refresh-then-derive == mine-then-derive; oracle is q04 verbatim
    "q187_rules_from_artifact" -> FpmQueries.RulesFromArtifactSql,
    // q188: stream-maintained itemset artifact — un-thresholded FUP fold
    // per batch, threshold once at read; oracle is q03 verbatim
    "q188_itemset_stream" -> FpmQueries.ItemsetStreamSql,
    // q189: sequence-pattern refresh for a key-disjoint delta — support
    // additive over keys, FUP bound transfers; oracle is q121 verbatim
    "q189_seqpattern_refresh" -> RelQueries.SequentialPatternsSql,
    // q190: stream-maintained sequence-pattern artifact — whole-new-user
    // batches, un-thresholded additive fold + applied-marker idempotence,
    // threshold once at read; oracle is q121 verbatim
    "q190_seqpattern_stream" -> RelQueries.SequentialPatternsSql,
    // q191: sequence rules from the q189-refreshed artifact —
    // refresh-then-derive == mine-then-derive; oracle is q186 verbatim
    "q191_seqrules_from_artifact" -> RelQueries.SequentialRulesSql,
    // q192: changed-keys recount refresh — same-key-extending ingest,
    // touched keys' terms replaced exactly; oracle is q121 verbatim
    "q192_seqpattern_touch_refresh" -> RelQueries.SequentialPatternsSql,
    // q193: deletion-aware (FUP2) itemset refresh — signed fold over
    // added+removed orders; oracle is q03's statement over the
    // retained baskets with the threshold re-derived from their count
    "q193_itemset_cdc_refresh" -> FpmQueries.ItemsetCdcSql,
    // q194: CDC stream twin of q193 — signed fold per mixed add/delete
    // micro-batch, replay-guarded; same post-churn oracle
    "q194_itemset_cdc_stream" -> FpmQueries.ItemsetCdcSql,
    // q195: key-erasure sequence refresh — deletions are free in the
    // candidate bound; oracle is q121's statement over retained users
    "q195_seqpattern_erase" -> RelQueries.SequentialPatternEraseSql,
    // q196: touched-key CDC stream for the sequence artifact — per
    // key-disjoint batch foldTouched, replay-guarded; oracle is q121
    "q196_seqpattern_touch_stream" -> RelQueries.SequentialPatternsSql,
    // q197: erasure-request stream — subtraction fold per key-disjoint
    // batch, replay-guarded; oracle is q195's retained-users statement
    "q197_seqpattern_erase_stream" -> RelQueries.SequentialPatternEraseSql,
    // q198: predict from the refresh-derived rule artifact — transform
    // is artifact-stable, so q05's statement holds verbatim
    "q198_predict_from_artifact" -> FpmQueries.PredictFromArtifactSql,
    // q199: headroom-triggered auto re-snapshot mid-stream — folds
    // before + re-mine at trigger + folds after == the union re-mine
    "q199_itemset_auto_resnapshot" -> FpmQueries.ItemsetAutoResnapshotSql,
    // q200: the same auto re-snapshot on the sequence artifact —
    // q121's statement verbatim over the union corpus
    "q200_seqpattern_auto_resnapshot" -> RelQueries.SequentialPatternsSql,
    // q201: next-event prediction from the q186 rules — per-user rule
    // firing by subsequence containment, max-lift dedup per consequent
    "q201_next_event_predict" -> RelQueries.SequentialPredictSql,
    // q202: the same prediction from refresh-derived rules — transform
    // is artifact-stable, so q201's statement holds verbatim
    "q202_seq_predict_from_artifact" -> RelQueries.SequentialPredictSql,
    // q203: touched-key auto re-snapshot — the |touchedKeys| FUP bound's
    // recovery path; folds before + re-snapshot (with re-base) + folds
    // after == the union re-mine, q121's statement verbatim
    "q203_seqpattern_touch_auto_resnapshot" -> RelQueries.SequentialPatternsSql,
  )
}
