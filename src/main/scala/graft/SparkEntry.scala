package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is one operator from SURVEY.md §2 (or a scale
  * extension), with a matching DuckDB oracle in [[oracleSql]] where the
  * semantics are ANSI-SQL-expressible. Column names/aliases are identical on
  * both sides (the driver sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Ctr.fixedWindow(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Windowed CTR calculators (W1/W2/W5 + A1/A2)
    "ctr_fixed_window"   -> ((s, d) => Ctr.fixedWindow(s, d)),
    "ctr_sliding_window" -> ((s, d) => Ctr.slidingWindow(s, d)),
    "ctr_session_window" -> ((s, d) => Ctr.sessionWindow(s, d)),
    // Enrichment joins (J1/J2/J4 + K5)
    "broadcast_enrich_latest" -> ((s, d) => Enrich.broadcastEnrichLatest(s, d)),
    "enrich_dlq"              -> ((s, d) => Enrich.enrichDlq(s, d)),
    "interval_join_latest"    -> ((s, d) => Enrich.intervalJoinLatest(s, d)),
    "cogroup_stats"           -> ((s, d) => Enrich.cogroupStats(s, d)),
    // Batch analogs of the stateful streaming ops (T1/T2) + record construction (S1/P10)
    "asof_lookup_join"    -> ((s, d) => StatefulBatch.asofLookupJoin(s, d)),
    "repeat_ticks"        -> ((s, d) => StatefulBatch.repeatTicks(s, d)),
    "record_construction" -> ((s, d) => Records.recordConstruction(s, d)),
    // Relational family (S3-S5 capability: scan + pushdown + joins + windows)
    "q1_pricing_summary"     -> ((s, d) => Relational.q1PricingSummary(s, d)),
    "q3_top_orders"          -> ((s, d) => Relational.q3TopOrders(s, d)),
    "q5_nation_revenue"      -> ((s, d) => Relational.q5NationRevenue(s, d)),
    "top_parts_per_brand"    -> ((s, d) => Relational.topPartsPerBrand(s, d)),
    "order_priority_shipped" -> ((s, d) => Relational.orderPriorityShipped(s, d)),
    "events_user_stats"      -> ((s, d) => Relational.eventsUserStats(s, d)),
    "user_sessions"          -> ((s, d) => Relational.userSessions(s, d)),
    "conversion_funnel"      -> ((s, d) => Relational.conversionFunnel(s, d)),
    "salted_event_counts"    -> ((s, d) => Scale.saltedEventCounts(s, d)),
    "bucketed_join_revenue"  -> ((s, d) => Scale.bucketedJoinRevenue(s, d)),
    "q6_forecast_revenue"    -> ((s, d) => Relational.q6ForecastRevenue(s, d)),
    "q12_late_shipments"     -> ((s, d) => Relational.q12LateShipments(s, d)),
    "q10_returned_items"     -> ((s, d) => Relational.q10ReturnedItems(s, d)),
    "q13_customer_distribution" -> ((s, d) => Relational.q13CustomerDistribution(s, d)),
    "q14_promo_revenue"         -> ((s, d) => Relational.q14PromoRevenue(s, d)),
    "q15_top_supplier"          -> ((s, d) => Relational.q15TopSupplier(s, d)),
    "q18_big_orders"            -> ((s, d) => Relational.q18BigOrders(s, d)),
    "q22_idle_customers"        -> ((s, d) => Relational.q22IdleCustomers(s, d)),
    "sales_rollup"              -> ((s, d) => Relational.salesRollup(s, d)),
    "event_gaps"                -> ((s, d) => Relational.eventGaps(s, d)),
    // Text analysis (scale extensions)
    "text_stats"      -> ((s, d) => TextAnalysis.textStats(s, d)),
    "quality_score"   -> ((s, d) => TextAnalysis.qualityScore(s, d)),
    "lang_id"         -> ((s, d) => TextAnalysis.langId(s, d)),
    "doc_fingerprint" -> ((s, d) => TextAnalysis.docFingerprint(s, d)),
    "winnow_fingerprints" -> ((s, d) => TextAnalysis.winnowFingerprints(s, d)),
    "winnow_pairs"        -> ((s, d) => TextAnalysis.winnowPairs(s, d)),
    "repetition_stats"    -> ((s, d) => TextAnalysis.repetitionStats(s, d)),
    "unigram_logprob"     -> ((s, d) => TextAnalysis.unigramLogprob(s, d)),
    "context_windows"     -> ((s, d) => TextAnalysis.contextWindows(s, d)),
    "bigram_logprob"      -> ((s, d) => TextAnalysis.bigramLogprob(s, d)),
    "bpe_merges"          -> ((s, d) => TextAnalysis.bpeMerges(s, d)),
    "bpe_vocab"           -> ((s, d) => TextAnalysis.bpeVocab(s, d)),
    "bpe_encode"          -> ((s, d) => TextAnalysis.bpeEncode(s, d)),
    "bm25_topk"           -> ((s, d) => Retrieval.bm25Topk(s, d)),
    // Deduplication (scale extensions)
    "dedup_exact"        -> ((s, d) => Dedup.dedupExact(s, d)),
    "minhash_signatures" -> ((s, d) => Dedup.minhashSignatures(s, d)),
    "minhash_lsh_pairs"  -> ((s, d) => Dedup.minhashLshPairs(s, d)),
    "dedup_clusters"     -> ((s, d) => Dedup.dedupClusters(s, d)),
    "contamination"      -> ((s, d) => Dedup.contamination(s, d)),
    "contamination_hashed" -> ((s, d) => Dedup.contaminationHashed(s, d)),
    "contamination_bloom"  -> ((s, d) => Dedup.contaminationBloom(s, d)),
    "dup_gram_fraction"    -> ((s, d) => Dedup.dupGramFraction(s, d)),
    "simhash_signatures" -> ((s, d) => Dedup.simhashSignatures(s, d)),
    "simhash_pairs"      -> ((s, d) => Dedup.simhashPairs(s, d)),
    "ngram_jaccard_topk" -> ((s, d) => Dedup.ngramJaccardTopk(s, d)),
    // Sketches + corpus statistics (scale extensions)
    "hll_distinct_users" -> ((s, d) => Sketches.hllDistinctUsers(s, d)),
    "tfidf_top_terms"    -> ((s, d) => Sketches.tfidfTopTerms(s, d)),
    "token_quantiles"    -> ((s, d) => Sketches.tokenQuantiles(s, d)),
    "token_quantiles_sketch" -> ((s, d) => Sketches.tokenQuantilesSketch(s, d)),
    "heavy_hitters"          -> ((s, d) => Sketches.heavyHitters(s, d)),
    // Multimodal columns (scale extensions; decode itself is stubbed)
    "media_meta"     -> ((s, d) => Multimodal.mediaMeta(s, d)),
    "media_frames"   -> ((s, d) => Multimodal.mediaFrames(s, d)),
    "media_features" -> ((s, d) => Multimodal.mediaFeatures(s, d)),
    "media_resize"   -> ((s, d) => Multimodal.mediaResize(s, d)),
    // Sequence packing + curation (scale extensions)
    "pack_chunks"       -> ((s, d) => Packing.packChunks(s, d)),
    "pack_shards"       -> ((s, d) => Packing.packShards(s, d)),
    "sample_stratified" -> ((s, d) => Curation.sampleStratified(s, d)),
    "mix_weights"       -> ((s, d) => Curation.mixWeights(s, d)),
    "corpus_retention"  -> ((s, d) => Curation.corpusRetention(s, d)),
    "source_kl"         -> ((s, d) => Curation.sourceKl(s, d)),
    // Similarity search (scale extensions)
    "ann_brute_force"     -> ((s, d) => Similarity.annBruteForce(s, d)),
    "ann_lsh_bucketed"    -> ((s, d) => Similarity.annLshBucketed(s, d)),
    "ann_ivf"             -> ((s, d) => Similarity.annIvf(s, d)),
    "ann_pq"              -> ((s, d) => Similarity.annPq(s, d)),
    "ann_recall"          -> ((s, d) => Similarity.annRecall(s, d)),
    "embedding_near_dups" -> ((s, d) => Similarity.embeddingNearDups(s, d)),
    "embedding_outliers"  -> ((s, d) => Similarity.embeddingOutliers(s, d)),
    "kmeans_assign"       -> ((s, d) => Similarity.kmeansAssign(s, d)),
    "semdedup"            -> ((s, d) => Similarity.semDedup(s, d)),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "ctr_fixed_window"   -> Ctr.fixedWindowSql,
    "ctr_sliding_window" -> Ctr.slidingWindowSql,
    "ctr_session_window" -> Ctr.sessionWindowSql,
    "broadcast_enrich_latest" -> Enrich.broadcastEnrichLatestSql,
    "enrich_dlq"              -> Enrich.enrichDlqSql,
    "interval_join_latest"    -> Enrich.intervalJoinLatestSql,
    "cogroup_stats"           -> Enrich.cogroupStatsSql,
    "asof_lookup_join"    -> StatefulBatch.asofLookupJoinSql,
    "repeat_ticks"        -> StatefulBatch.repeatTicksSql,
    "record_construction" -> Records.recordConstructionSql,
    "q1_pricing_summary"     -> Relational.q1PricingSummarySql,
    "q3_top_orders"          -> Relational.q3TopOrdersSql,
    "q5_nation_revenue"      -> Relational.q5NationRevenueSql,
    "top_parts_per_brand"    -> Relational.topPartsPerBrandSql,
    "order_priority_shipped" -> Relational.orderPriorityShippedSql,
    "events_user_stats"      -> Relational.eventsUserStatsSql,
    "user_sessions"          -> Relational.userSessionsSql,
    "conversion_funnel"      -> Relational.conversionFunnelSql,
    "salted_event_counts"    -> Scale.saltedEventCountsSql,
    "bucketed_join_revenue"  -> Scale.bucketedJoinRevenueSql,
    "q6_forecast_revenue"    -> Relational.q6ForecastRevenueSql,
    "q12_late_shipments"     -> Relational.q12LateShipmentsSql,
    "q10_returned_items"     -> Relational.q10ReturnedItemsSql,
    "q13_customer_distribution" -> Relational.q13CustomerDistributionSql,
    "q14_promo_revenue"         -> Relational.q14PromoRevenueSql,
    "q15_top_supplier"          -> Relational.q15TopSupplierSql,
    "q18_big_orders"            -> Relational.q18BigOrdersSql,
    "q22_idle_customers"        -> Relational.q22IdleCustomersSql,
    "sales_rollup"              -> Relational.salesRollupSql,
    "event_gaps"                -> Relational.eventGapsSql,
    "text_stats"      -> TextAnalysis.textStatsSql,
    "quality_score"   -> TextAnalysis.qualityScoreSql,
    "lang_id"         -> TextAnalysis.langIdSql,
    "doc_fingerprint" -> TextAnalysis.docFingerprintSql,
    "winnow_fingerprints" -> TextAnalysis.winnowFingerprintsSql,
    "winnow_pairs"        -> TextAnalysis.winnowPairsSql,
    "repetition_stats"    -> TextAnalysis.repetitionStatsSql,
    "unigram_logprob"     -> TextAnalysis.unigramLogprobSql,
    "context_windows"     -> TextAnalysis.contextWindowsSql,
    "bigram_logprob"      -> TextAnalysis.bigramLogprobSql,
    "bpe_merges"          -> TextAnalysis.bpeMergesSql,
    "bpe_vocab"           -> TextAnalysis.bpeVocabSql,
    "bpe_encode"          -> TextAnalysis.bpeEncodeSql,
    "bm25_topk"           -> Retrieval.bm25TopkSql,
    "dedup_exact"        -> Dedup.dedupExactSql,
    "minhash_signatures" -> Dedup.minhashSignaturesSql,
    "minhash_lsh_pairs"  -> Dedup.minhashLshPairsSql,
    "dedup_clusters"     -> Dedup.dedupClustersSql,
    "contamination"      -> Dedup.contaminationSql,
    "contamination_hashed" -> Dedup.contaminationHashedSql,
    // bloom prefilter + exact confirm returns exactly the broadcast-join answer
    "contamination_bloom"  -> Dedup.contaminationSql,
    "dup_gram_fraction"    -> Dedup.dupGramFractionSql,
    "simhash_signatures" -> Dedup.simhashSignaturesSql,
    "simhash_pairs"      -> Dedup.simhashPairsSql,
    "ngram_jaccard_topk" -> Dedup.ngramJaccardTopkSql,
    "hll_distinct_users" -> Sketches.hllDistinctUsersSql,
    "tfidf_top_terms"    -> Sketches.tfidfTopTermsSql,
    "token_quantiles"    -> Sketches.tokenQuantilesSql,
    "token_quantiles_sketch" -> Sketches.tokenQuantilesSketchSql,
    "heavy_hitters"          -> Sketches.heavyHittersSql,
    "media_meta"     -> Multimodal.mediaMetaSql,
    "media_frames"   -> Multimodal.mediaFramesSql,
    "media_features" -> Multimodal.mediaFeaturesSql,
    "media_resize"   -> Multimodal.mediaResizeSql,
    "pack_chunks"       -> Packing.packChunksSql,
    "pack_shards"       -> Packing.packShardsSql,
    "sample_stratified" -> Curation.sampleStratifiedSql,
    "mix_weights"       -> Curation.mixWeightsSql,
    "corpus_retention"  -> Curation.corpusRetentionSql,
    "source_kl"         -> Curation.sourceKlSql,
    "ann_brute_force"     -> Similarity.annBruteForceSql,
    "ann_lsh_bucketed"    -> Similarity.annLshBucketedSql,
    "ann_ivf"             -> Similarity.annIvfSql,
    "ann_pq"              -> Similarity.annPqSql,
    "ann_recall"          -> Similarity.annRecallSql,
    "embedding_near_dups" -> Similarity.embeddingNearDupsSql,
    "embedding_outliers"  -> Similarity.embeddingOutliersSql,
    "kmeans_assign"       -> Similarity.kmeansAssignSql,
    "semdedup"            -> Similarity.semDedupSql,
  )
}
