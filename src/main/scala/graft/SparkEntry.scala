package graft

import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("vec_id").as("id"), col("embedding").as("vec"),
        col("label"))

  /** Query batch = first 5 vectors, mirroring the reference's /search
    * request carrying a query vector (test/filter_upsert/search_*.json).
    */
  private def qset(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir).where(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

  private def batchQset(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir).where(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

  private def simQset(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir).where(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    Knn.topK(emb(spark, dir), qset(spark, dir), 10, Knn.Metric.L2)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "vdb_knn_flat_l2" -> ((s, d) =>
      Knn.topK(emb(s, d), qset(s, d), 10, Knn.Metric.L2)),
    "vdb_knn_flat_ip" -> ((s, d) =>
      Knn.topK(emb(s, d), qset(s, d), 10, Knn.Metric.IP)),
    "vdb_knn_flat_l1" -> ((s, d) =>
      Knn.topK(emb(s, d), qset(s, d), 10, Knn.Metric.L1)),
    "vdb_knn_flat_linf" -> ((s, d) =>
      Knn.topK(emb(s, d), qset(s, d), 10, Knn.Metric.Linf)),
    "vdb_knn_recency_boost" -> ((s, d) =>
      Knn.topKRecencyBoosted(emb(s, d), qset(s, d), 10,
        pmod(col("id"), lit(4L)))),
    "vdb_knn_cosine" -> ((s, d) =>
      Knn.topK(emb(s, d), qset(s, d), 10, Knn.Metric.Cosine)),
    "vdb_scroll_page2" -> ((s, d) =>
      Knn.scrollPage2(emb(s, d), qset(s, d), 10)),
    "vdb_knn_groupby" -> ((s, d) =>
      Knn.topKGrouped(emb(s, d), qset(s, d), 3, 2)),
    "vdb_recommend" -> ((s, d) => {
      import s.implicits._
      val e = Tables.embeddings(s, d).select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
      val reqs = Seq((0L, 0L, 1L, 6L), (1L, 2L, 3L, 7L),
        (2L, 4L, 5L, 8L)).toDF("qid", "pa", "pb", "ng")
      val withVecs = reqs
        .join(e.select(col("vec_id").as("pa"), col("v").as("va")), "pa")
        .join(e.select(col("vec_id").as("pb"), col("v").as("vb")), "pb")
        .join(e.select(col("vec_id").as("ng"), col("v").as("vn")), "ng")
        .select(col("qid"),
          expr("zip_with(zip_with(va, vb, (x, y) -> (x + y) / 2D), " +
            "vn, (p, n) -> 2D * p - n)").as("qvec"),
          col("pa").as("ex1"), col("pb").as("ex2"), col("ng").as("ex3"))
      Knn.recommend(emb(s, d), withVecs, 10)
    }),
    "vdb_knn_multiquery" -> ((s, d) => {
      val qa = Tables.embeddings(s, d).where(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("q1"))
      val qb = Tables.embeddings(s, d)
        .where(col("vec_id") >= 5 && col("vec_id") < 10)
        .select((col("vec_id") - 5).as("qid"), col("embedding").as("q2"))
      Knn.topKMultiQuery(emb(s, d), qa.join(qb, "qid"), 10)
    }),
    "vdb_knn_filtered_eq" -> ((s, d) =>
      Knn.topKFiltered(emb(s, d), qset(s, d), 10, Knn.Metric.L2,
        col("label") === 5)),
    "vdb_knn_filtered_ne" -> ((s, d) =>
      Knn.topKFiltered(emb(s, d), qset(s, d), 10, Knn.Metric.L2,
        col("label") =!= 5)),
    "vdb_search_requests" -> (SearchApi.searchRequestsQuery _),
    "vdb_search_routed" -> (SearchApi.searchRoutedQuery _),
    "vdb_search_routed_ef" -> (SearchApi.searchRoutedEfQuery _),
    "vdb_batch_knn" -> ((s, d) =>
      Knn.topK(emb(s, d), batchQset(s, d), 5, Knn.Metric.Cosine)),
    "vdb_query_by_id" -> ((s, d) =>
      ScalarOps.pointLookup(Tables.embeddings(s, d), "vec_id", Seq(3L, 17L, 42L))
        .select(col("vec_id"),
          col("label").cast("long").as("label"),
          size(col("embedding")).cast("long").as("dim"),
          round(graft.functions.VectorFunctions.l2Norm(
            graft.functions.VectorFunctions.vecD(col("embedding"))), 4).as("norm"))
        .orderBy("vec_id")),
    "vdb_upsert" -> ((s, d) => {
      val e = emb(s, d)
      val base = e.select(col("id"), col("label").cast("long").as("label"),
        lit(1L).as("version"))
      val upd = e.where(col("id") % 7 === 0)
        .select(col("id"), (col("label") + 100).cast("long").as("label"),
          lit(2L).as("version"))
      Upsert.lastWriterWins(base.unionByName(upd), "id", "version")
        .orderBy("id")
    }),
    "vdb_upsert_cas" -> (Upsert.casQuery _),
    "scd2_intervals" -> (Upsert.scd2Query _),
    "vdb_delete" -> (Upsert.deleteQuery _),
    "vdb_snapshot_diff" -> (Upsert.snapshotDiffQuery _),
    "scd2_tombstones" -> (Upsert.scd2TombstoneQuery _),
    "scd2_retention" -> (Upsert.scd2RetentionQuery _),
    "wal_delete_replay" -> (graft.sources.WalSource.deleteReplayQuery _),
    "wal_compact_replay" -> (graft.sources.WalBinary.compactReplayQuery _),
    "vdb_remove" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val removed = e.where(col("vec_id") % 10 === 0).select("vec_id")
      ScalarOps.removeByIds(e, "vec_id", removed, "vec_id")
        .groupBy(col("label").cast("long").as("label"))
        .agg(count(lit(1)).as("n"), min("vec_id").as("min_id"),
          max("vec_id").as("max_id"))
        .orderBy("label")
    }),
    "vdb_filter_index_build" -> ((s, d) =>
      ScalarOps.filterIndexBuild(
        Tables.embeddings(s, d)
          .select(col("label").cast("long").as("label"), col("vec_id")),
        "label", "vec_id")),
    "vdb_snapshot_replay" -> ((s, d) =>
      WalReplay.replayComposed(Tables.events(s, d), 500L)),
    "wal_json_replay" -> (graft.sources.WalSource.replayQuery _),
    "wal_binary_replay" -> (graft.sources.WalBinary.binaryReplayQuery _),
    "wal_dsv2_replay" -> (graft.sources.WalBinary.dsv2ReplayQuery _),
    "wal_file_replay" -> (graft.sources.WalSource.fileReplayQuery _),
    "stream_wal_state" -> (graft.streaming.BatchTwins.walStateQuery _),
    "stream_dedup_state" -> (graft.streaming.DedupStream.dedupStateQuery _),
    "stream_window_daily" -> (graft.streaming.BatchTwins.windowDailyQuery _),
    "stream_session_window" -> (graft.streaming.BatchTwins.sessionWindowQuery _),
    "stream_interval_join" -> (graft.streaming.BatchTwins.intervalJoinQuery _),
    "ann_ivf" -> (Ann.ivfQuery _),
    "ann_ivf_spill" -> (Ann.ivfSpillQuery _),
    "ann_spill_recall" -> (Ann.spillRecallReport _),
    "knn_graph" -> ((s, d) => Ann.knnGraph(s, d)),
    "mutual_knn_pairs" -> ((s, d) => Ann.mutualKnnPairs(s, d)),
    "graph_centrality" -> ((s, d) => Ann.graphCentrality(s, d)),
    "graph_triangles" -> ((s, d) => Ann.graphTriangles(s, d)),
    "graph_adamic_adar" -> ((s, d) => Ann.adamicAdar(s, d)),
    "graph_hits" -> (Ann.graphHits _),
    "knn_hubness" -> (Ann.knnHubness _),
    "embed_lof" -> (Ann.lofReport _),
    "embed_knn_purity" -> (Ann.knnLabelPurity _),
    "graph_jaccard_lp" -> ((s, d) => Ann.graphJaccardLp(s, d)),
    "graph_kcore" -> ((s, d) => Ann.graphKCore(s, d)),
    "graph_bfs_hist" -> ((s, d) => Ann.graphBfsHist(s, d)),
    "graph_modularity" -> ((s, d) => Ann.graphModularity(s, d)),
    "graph_conductance" -> ((s, d) => Ann.graphConductance(s, d)),
    "knn_graph_recall" -> ((s, d) => Ann.knnGraphRecall(s, d)),
    "events_bot_score" -> ((s, d) => Sequence.botScore(s, d)),
    "embed_knn_clusters" -> ((s, d) => Ann.embedKnnClusters(s, d)),
    "ann_nsw" -> (Ann.nswQuery _),
    "ann_nsw_filtered" -> (Ann.nswFilteredQuery _),
    "ann_hnsw" -> (Ann.hnswQuery _),
    "ann_hnsw_filtered" -> (Ann.hnswFilteredQuery _),
    "ann_hnsw_indexed" -> (Ann.hnswIndexedQuery _),
    "embed_cluster_stats" -> (Ann.clusterStats _),
    "knn_silhouette" -> (Ann.knnSilhouette _),
    "embed_outliers" -> ((s, d) => Ann.embedOutliers(s, d)),
    "embed_pca_project" -> (Pca.pcaProject _),
    "embed_pca_project2" -> (Pca.pcaProject2 _),
    "embed_pca_var" -> (Pca.pcaVariance _),
    "events_forecast_naive" -> ((s, d) => Analytics.eventsForecastNaive(s, d)),
    "events_autocorr7" -> ((s, d) => Analytics.eventsAutocorr(s, d)),
    "events_series_corr" -> (Analytics.eventsSeriesCorr _),
    "events_benford" -> (Analytics.eventsBenford _),
    "supplier_hhi" -> (Analytics.supplierHhi _),
    "text_readability" -> (TextOps.readability _),
    "ann_recall_report" -> ((s, d) => Ann.ivfRecallReport(s, d)),
    "mrl_recall_curve" -> ((s, d) => Ann.mrlRecallCurve(s, d)),
    "embed_drift_psi" -> ((s, d) => Ann.embedDriftPsi(s, d)),
    "ann_recall_curve" -> ((s, d) => Ann.ivfRecallCurve(s, d)),
    "ann_recall_at_k" -> ((s, d) => Ann.ivfRecallAtK(s, d)),
    "ann_pareto_tuning" -> ((s, d) => Ann.ivfParetoTuning(s, d)),
    "lsh_recall_report" -> ((s, d) => Ann.lshRecallReport(s, d)),
    "hnsw_recall_report" -> ((s, d) => Ann.hnswRecallReport(s, d)),
    "search_ndcg" -> (Ann.ndcgReport _),
    "search_mrr" -> (Ann.mrrReport _),
    "embed_rp_knn" -> (Ann.rpKnnQuery _),
    "vdb_knn_mrl" -> ((s, d) => Knn.mrlSearch(emb(s, d), qset(s, d), 10)),
    "ann_ivf_mrl" -> (Ann.ivfMrlQuery _),
    "events_json_props" -> (Analytics.eventsJsonProps _),
    "events_transitions" -> (Analytics.eventsTransitions _),
    "ann_ivf_indexed" -> (Ann.ivfIndexedQuery _),
    "ann_ivf_filtered" -> (Ann.ivfIndexedFilteredQuery _),
    "ann_adaptive_filter" -> (Ann.adaptiveFilterQuery _),
    "vdb_range_search" -> ((s, d) =>
      Knn.radius(emb(s, d), qset(s, d), Knn.Metric.Cosine, 0.25)),
    "ann_ivf_range" -> (Ann.ivfRangeQuery _),
    "ann_ivf_sq8" -> (Ann.ivfSq8Query _),
    "ann_ivf_bq" -> (Ann.ivfBqQuery _),
    "ann_lsh" -> (Ann.lshQuery _),
    "ann_lsh_multiprobe" -> (Ann.lshMultiprobeQuery _),
    "vdb_knn_sq8" -> (Quant.sq8Query _),
    "vdb_knn_bq" -> (BinQuant.bqQuery _),
    "vdb_knn_pq" -> (Pq.pqQuery _),
    "ann_ivf_pq" -> (Pq.ivfPqQuery _),
    "ann_ivf_pq_res" -> (Pq.ivfPqResQuery _),
    "mm_decode" -> (Multimodal.decodeQuery _),
    "mm_features" -> (Multimodal.featuresQuery _),
    "mm_frame_sample" -> ((s, d) => Multimodal.frameSampleQuery(s, d)),
    "mm_audio_energy" -> ((s, d) => Multimodal.audioEnergyQuery(s, d)),
    "mm_audio_silence" -> ((s, d) => Multimodal.audioSilenceQuery(s, d)),
    "mm_shot_detect" -> ((s, d) => Multimodal.shotDetectQuery(s, d)),
    "mm_byte_entropy" -> (Multimodal.byteEntropyQuery _),
    "mm_phash" -> (Multimodal.phashQuery _),
    "mm_channel_stats" -> (Multimodal.channelStatsQuery _),
    "mm_resize" -> (Multimodal.resizeQuery _),
    "dedup_phash_hamming" -> ((s, d) => Multimodal.phashHammingQuery(s, d)),
    "mm_phash_dup" -> (Multimodal.phashDupQuery _),
    "dedup_exact" -> ((s, d) => Dedup.exact(Dedup.corpusWithExactDups(s, d))),
    "dedup_minhash_sig" -> (Dedup.minhashSignatures _),
    "dedup_minhash_pairs" -> ((s, d) => Dedup.minhashPairs(s, d)),
    "dedup_incremental" -> (Dedup.incrementalQuery _),
    "dedup_simhash" -> (Dedup.simhash _),
    "dedup_simhash_pairs" -> ((s, d) => Dedup.simhashPairs(s, d)),
    "dedup_simhash60_pairs" -> ((s, d) => Dedup.simhashPairsWide(s, d)),
    "dedup_ngram_jaccard" -> ((s, d) => Dedup.ngramJaccardPairs(s, d)),
    "dedup_clusters" -> ((s, d) => Dedup.nearDupClusters(s, d)),
    "dedup_canonical" -> ((s, d) => Dedup.canonicalMap(s, d)),
    "dedup_jaccard_hist" -> ((s, d) => Dedup.jaccardHistogram(s, d)),
    "dedup_band_recall" -> ((s, d) => Dedup.bandRecallReport(s, d)),
    "dedup_lsh_scurve" -> ((s, d) => Dedup.lshScurve(s, d)),
    "corpus_vocab_growth" -> ((s, d) => TextOps.vocabGrowth(s, d)),
    "dedup_cluster_sizes" -> ((s, d) => Dedup.clusterSizeHistogram(s, d)),
    "dedup_source_overlap" -> ((s, d) => Dedup.sourceOverlap(s, d)),
    "dedup_substring" -> (Dedup.duplicatedSpansQuery _),
    "dedup_containment" -> ((s, d) => Dedup.containmentPairs(s, d)),
    "dedup_winnowing" -> ((s, d) => Dedup.winnowingPairs(s, d)),
    "dedup_winnow_incremental" -> ((s, d) => Dedup.winnowIncrementalQuery(s, d)),
    "dedup_embedding_cos" -> ((s, d) => Dedup.embeddingCosinePairs(s, d)),
    "sim_brute_topk" -> ((s, d) =>
      Knn.topKExcludingSelf(emb(s, d), simQset(s, d), 10, Knn.Metric.Cosine)),
    "text_langid" -> (TextOps.langId _),
    "langid_confusion" -> (TextOps.langIdConfusion _),
    "text_quality" -> (TextOps.quality _),
    "quality_deciles" -> (TextOps.qualityDeciles _),
    "corpus_budget_select" -> ((s, d) => TextOps.budgetSelect(s, d)),
    "embed_norm_audit" -> ((s, d) => Ann.embedNormAudit(s, d)),
    "embed_dim_variance" -> (Ann.dimVariance _),
    "text_tokens" -> (TextOps.tokenCounts _),
    "text_fingerprint" -> (TextOps.fingerprint _),
    "text_normalize" -> (TextOps.normalizeQuery _),
    "text_ttr" -> (TextOps.lexicalDiversity _),
    "text_hapax" -> (TextOps.hapaxProfile _),
    "text_rake_keywords" -> ((s, d) => TextOps.rakeKeywords(s, d)),
    "corpus_ngram_coverage" -> ((s, d) => TextOps.ngramCoverage(s, d)),
    "text_token_entropy" -> (TextOps.tokenEntropy _),
    "corpus_source_diversity" -> (TextOps.sourceDiversity _),
    "events_anova" -> (Analytics.eventsAnova _),
    "customer_gini" -> ((s, d) => Analytics.customerGini(s, d)),
    "part_price_elasticity" -> ((s, d) => Analytics.priceElasticity(s, d)),
    "part_xyz_class" -> (Analytics.partXyz _),
    "part_abc_xyz_matrix" -> (Analytics.partAbcXyzMatrix _),
    "orders_interarrival" -> (Analytics.ordersInterarrival _),
    "priority_returns_chi2" -> (Analytics.priorityReturnsChi2 _),
    "corpus_stats" -> (TextOps.corpusStats _),
    "text_chunk" -> (TextOps.chunkQuery _),
    "chunk_pack" -> (TextOps.chunkPackQuery _),
    "train_length_buckets" -> ((s, d) => TextOps.lengthBuckets(s, d)),
    "text_pii_redact" -> (TextOps.piiQuery _),
    "text_repetition" -> (TextOps.repetition _),
    "corpus_sample_split" -> (Sampling.sampleSplitQuery _),
    "hash_uniformity_audit" -> (Sampling.hashUniformityAudit _),
    "corpus_reservoir" -> ((s, d) => Sampling.reservoirQuery(s, d)),
    "dsir_select" -> ((s, d) => Sampling.dsirSelect(s, d)),
    "export_shards" -> (Sampling.exportShardsQuery _),
    "corpus_weighted_sample" -> (Sampling.weightedSampleQuery _),
    "export_shard_manifest" -> (Sampling.exportShardManifest _),
    "dedup_impact_report" -> (Dedup.dedupImpactReport _),
    "sketch_kmv_distinct" -> (Sketch.kmvQuery _),
    "sketch_kmv_rollup" -> (Sketch.kmvRollupQuery _),
    "sketch_hll_distinct" -> (Sketch.hllQuery _),
    "sketch_error_report" -> (Sketch.sketchErrorReport _),
    "sketch_hll_rollup" -> (Sketch.hllRollupQuery _),
    "sketch_kmv_setops" -> (Sketch.kmvSetOpsQuery _),
    "sketch_hist_quantile" -> (Sketch.histQuantileQuery _),
    "sketch_cms_topk" -> (Sketch.cmsTopTermsQuery _),
    "sketch_cms_grouped" -> (Sketch.cmsByLangQuery _),
    "knn_classify" -> ((s, d) => Classify.knnClassify(s, d)),
    "knn_regression" -> ((s, d) => Classify.knnRegression(s, d)),
    "centroid_confusion" -> (Classify.nearestCentroid _),
    "corpus_health" -> (Sketch.corpusHealth _),
    "corpus_drift_psi" -> ((s, d) => Sketch.driftPsi(s, d)),
    "corpus_mixture" -> (Sketch.corpusMixture _),
    "corpus_temperature_mix" -> (Sketch.temperatureMix _),
    "train_triplets" -> (Triplets.tripletsQuery _),
    "train_span_corrupt" -> (TextOps.spanCorrupt _),
    "train_mlm_mask" -> (TextOps.mlmMask _),
    "train_triplets_hard" -> (Triplets.tripletsHardQuery _),
    "decontam_overlap" -> (Decontam.contaminationQuery _),
    "decontam_semantic" -> ((s, d) => Decontam.semantic(s, d)),
    "events_funnel" -> (Analytics.eventsFunnel _),
    "events_attribution" -> (Analytics.eventsAttribution _),
    "events_funnel_timing" -> (Analytics.eventsFunnelTiming _),
    "events_rolling_p95" -> ((s, d) => Analytics.eventsRollingP95(s, d)),
    "events_power_analysis" -> (Analytics.eventsPowerAnalysis _),
    "orders_backlog" -> (Analytics.ordersBacklog _),
    "part_abc_analysis" -> (Analytics.partAbcAnalysis _),
    "customer_cohort_ltv" -> (Analytics.customerCohortLtv _),
    "events_dow_seasonality" -> (Analytics.eventsDowSeasonality _),
    "events_pattern_match" -> (Sequence.patternMatch _),
    "events_ab_test" -> (Analytics.eventsAbTest _),
    "events_mann_whitney" -> (Analytics.eventsMannWhitney _),
    "events_page_hinkley" -> ((s, d) => Analytics.eventsPageHinkley(s, d)),
    "events_fano" -> (Analytics.eventsFano _),
    "events_forecast_holt" -> (Analytics.eventsForecastHolt _),
    "events_forecast_eval" -> (Analytics.eventsForecastEval _),
    "events_next_pred" -> (Analytics.eventsNextPred _),
    "events_health_dashboard" -> (Analytics.eventsHealthDashboard _),
    "events_rolling_active" -> (Analytics.eventsRollingActive _),
    "supplier_return_shrinkage" -> ((s, d) =>
      Analytics.supplierReturnShrinkage(s, d)),
    "events_share_trend" -> (Analytics.eventsShareTrend _),
    "events_reactivation" -> ((s, d) => Analytics.eventsReactivation(s, d)),
    "dedup_shingle_df_hist" -> (Dedup.shingleDfHist _),
    "events_value_boxplot" -> (Analytics.eventsValueBoxplot _),
    "part_seasonal_index" -> (Analytics.partSeasonalIndex _),
    "events_peak_concurrency" -> ((s, d) =>
      Analytics.eventsPeakConcurrency(s, d)),
    "embed_twonn_dim" -> (Ann.twoNnDim _),
    "events_ks_test" -> (Analytics.eventsKsTest _),
    "events_moments" -> (Analytics.eventsMoments _),
    "customer_churn_hazard" -> (Analytics.customerChurnHazard _),
    "events_ab_sequential" -> ((s, d) => Analytics.eventsAbSequential(s, d)),
    "events_funnel_ab" -> (Analytics.eventsFunnelAb _),
    "events_ab_cuped" -> ((s, d) => Analytics.eventsAbCuped(s, d)),
    "events_ab_srm" -> (Analytics.eventsAbSrm _),
    "events_aa_test" -> (Analytics.eventsAaTest _),
    "events_did" -> (Analytics.eventsDid _),
    "events_winsorized" -> (Analytics.eventsWinsorized _),
    "events_stl_decompose" -> (Analytics.eventsStlDecompose _),
    "events_next_pred2" -> (Analytics.eventsNextPred2 _),
    "orders_revenue_bridge" -> (Analytics.ordersRevenueBridge _),
    "part_abc_migration" -> (Analytics.partAbcMigration _),
    "part_sourcing_risk" -> (Analytics.partSourcingRisk _),
    "events_absence_alert" -> (Analytics.eventsAbsenceAlert _),
    "dedup_cos_sweep" -> ((s, d) => Dedup.cosineSweep(s, d)),
    "dedup_text_vs_embed" -> ((s, d) => Dedup.textVsEmbed(s, d)),
    "graph_assortativity" -> ((s, d) => Ann.graphAssortativity(s, d)),
    "text_collocations" -> ((s, d) => TextOps.collocations(s, d)),
    "events_cooccurrence" -> ((s, d) => Sequence.cooccurrence(s, d)),
    "part_pareto" -> ((s, d) => Sequence.partPareto(s, d)),
    "vdb_knn_filtered_in" -> ((s, d) =>
      Knn.topKFiltered(emb(s, d), qset(s, d), 10, Knn.Metric.L2,
        col("label").isin(2, 4, 6))),
    "vdb_knn_filtered_range" -> ((s, d) =>
      Knn.topKFiltered(emb(s, d), qset(s, d), 10, Knn.Metric.L2,
        col("label").between(3, 6))),
    // two-field predicate: FilterIndex keys bitmaps per fieldname
    // (reference filter_index.cc:9) — Spark predicates compose for
    // free; this query pins the multi-field claim
    "vdb_knn_filtered_2field" -> ((s, d) =>
      Knn.topKFiltered(emb(s, d), qset(s, d), 10, Knn.Metric.L2,
        col("label").between(2, 6) && col("id") % 2 === 0)),
    "vdb_insert" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val base = e.select(col("vec_id").as("id"),
        col("label").cast("long").as("label"))
      val ins = e.where(col("vec_id") % 7 === 0)
        .select(col("vec_id").as("id"),
          (col("label") + 100).cast("long").as("label"))
      // append semantics: re-inserted ids keep BOTH rows (contrast
      // vdb_upsert's LWW) — surfaced per id for a stable oracle
      Upsert.append(base, ins)
        .groupBy("id")
        .agg(count(lit(1)).as("n_rows"),
          min("label").as("min_label"), max("label").as("max_label"))
        .orderBy("id")
    }),
    "doc_semantic_search" -> ((s, d) => {
      val nn = Knn.topKExcludingSelf(
        emb(s, d),
        Tables.embeddings(s, d).where(col("vec_id") % 100 === 0)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec")),
        5, Knn.Metric.Cosine)
      nn.join(Tables.documents(s, d)
          .select(col("doc_id").as("nn_id"), col("lang"), col("source")),
          "nn_id")
        .select(col("qid"), col("rk"), col("nn_id"), col("score"),
          col("lang"), col("source"))
        .orderBy("qid", "rk")
    }),
    "q1_agg" -> Analytics.q1PricingSummary _,
    "q4_semi" -> (Analytics.q4OrderPriority _),
    "bloom_prefilter_join" -> (BloomJoin.bloomQuery _),
    "bloom_fpr_report" -> ((s, d) => BloomJoin.bloomFprReport(s, d)),
    "q6_filter_agg" -> (Analytics.q6ForecastRevenue _),
    "q3_join" -> Analytics.q3ShippingPriority _,
    "q5_join" -> Analytics.q5LocalSupplierVolume _,
    "q7_volume" -> ((s, d) => Analytics.q7VolumeShipping(s, d)),
    "q8_market_share" -> ((s, d) => Analytics.q8MarketShare(s, d)),
    "q13_order_dist" -> (Analytics.q13OrderDistribution _),
    "q15_top_supplier" -> (Analytics.q15TopSupplier _),
    "q17_small_qty" -> (Analytics.q17SmallQty _),
    "events_retention" -> (Analytics.eventsRetention _),
    "events_rollup_cube" -> (Analytics.eventsRollup _),
    "events_gap_fill" -> (Analytics.eventsGapFill(_, _)),
    "events_user_features" -> (Analytics.eventsUserFeatures _),
    "events_ewma" -> (Analytics.eventsEwma _),
    "events_pivot" -> (Analytics.eventsPivot _),
    "events_top_paths" -> (Analytics.eventsTopPaths(_, _)),
    "q18_large_orders" -> ((s, d) => Analytics.q18LargeOrders(s, d)),
    "q14_promo" -> (Analytics.q14PromoEffect _),
    "q10_returned" -> (Analytics.q10ReturnedItems _),
    "q19_disc_rev" -> (Analytics.q19DiscountedRevenue _),
    "q21_sole_blame" -> (Analytics.q21SoleBlame _),
    "q16_supplier_cnt" -> (Analytics.q16SupplierCount _),
    "q20_excess_supply" -> (Analytics.q20ExcessSupply _),
    "events_stickiness" -> (Analytics.eventsStickiness _),
    "q9_profit" -> (Analytics.q9ProductProfit _),
    "q11_important_parts" -> (Analytics.q11ImportantParts _),
    "q12_late_priority" -> (Analytics.q12LatePriority _),
    "basket_pairs" -> ((s, d) => Analytics.basketPairs(s, d)),
    "part_item_cf" -> ((s, d) => Analytics.partItemCf(s, d)),
    "part_trend_slope" -> ((s, d) => Analytics.partTrendSlope(s, d)),
    "supplier_wilson" -> ((s, d) => Analytics.supplierWilson(s, d)),
    "customer_rfm" -> ((s, d) => Analytics.customerRfm(s, d)),
    "supplier_lead_time" -> ((s, d) => Analytics.supplierLeadTime(s, d)),
    "text_boilerplate" -> ((s, d) => TextOps.boilerplate(s, d)),
    "events_heatmap" -> ((s, d) => Analytics.eventsHeatmap(s, d)),
    "embed_quant_error" -> ((s, d) => Quant.quantErrorReport(s, d)),
    "corpus_zipf_fit" -> ((s, d) => TextOps.zipfFit(s, d)),
    "part_fuzzy_terms" -> ((s, d) => Analytics.fuzzyTerms(s, d)),
    "q2_min_cost" -> (Analytics.q2MinCostSupplier _),
    "bucketed_join_agg" -> (Layout.bucketedJoinQuery _),
    "events_zorder_skip" -> (ZOrder.zorderSkipQuery _),
    "q22_global_sales" -> (Analytics.q22GlobalSales _),
    "q_window_topn" -> ((s, d) => Analytics.windowTopOrders(s, d)),
    "events_tumbling" -> Analytics.eventsTumbling _,
    "events_daily_agg" -> (AggTable.dailyAggQuery _),
    "events_hopping" -> (Analytics.eventsHopping _),
    "events_anomaly" -> ((s, d) => Analytics.eventsAnomaly(s, d)),
    "events_anomaly_consensus" ->
      (Analytics.eventsAnomalyConsensus _),
    "events_anomaly_online" -> ((s, d) => Analytics.eventsAnomalyOnline(s, d)),
    "events_anomaly_mad" -> ((s, d) => Analytics.eventsAnomalyMad(s, d)),
    "events_changepoint" -> (Analytics.eventsChangepoint _),
    "text_top_terms" -> ((s, d) => TextOps.topTerms(s, d)),
    "text_ngram_novelty" -> (TextOps.ngramNovelty _),
    "text_tfidf_keywords" -> ((s, d) => TextOps.tfidfKeywords(s, d)),
    "text_surprisal" -> (TextOps.surprisal _),
    "text_bigram_surprisal" -> (TextOps.bigramSurprisal _),
    "text_xent_score" -> (TextOps.xentScore _),
    "corpus_ccnet_buckets" -> (TextOps.ccnetBuckets _),
    "langid_ngram" -> ((s, d) => TextOps.langIdNgram(s, d)),
    "bpe_learn" -> ((s, d) => Bpe.bpeLearn(s, d)),
    "bpe_learn_batched" -> ((s, d) => Bpe.bpeLearnBatched(s, d)),
    "bpe_tokenize" -> ((s, d) => Bpe.bpeTokenize(s, d)),
    "quality_classifier" -> ((s, d) => TextOps.qualityClassifier(s, d)),
    "quality_kappa" -> ((s, d) => TextOps.qualityKappa(s, d)),
    "corpus_dataset_card" -> (Pipeline.datasetCard _),
    "events_sessionize" -> ((s, d) => Analytics.eventsSessionize(s, d)),
    "events_salted_enrich" -> ((s, d) => Skew.saltedEnrichQuery(s, d)),
    "key_skew_report" -> (Skew.keySkewQuery _),
    "events_asof_join" -> (AsOf.eventsAsofQuery _),
    "events_session_attr" -> (RangeJoin.sessionAttributionQuery _),
    "text_bm25_topk" -> (Search.bm25Query _),
    "search_bm25f" -> (Search.bm25fQuery _),
    "text_bm25_filtered" -> (Search.bm25FilteredQuery _),
    "text_bm25_indexed" -> (Search.bm25IndexedQuery _),
    "hybrid_search_rrf" -> (Search.hybridRrfQuery _),
    "hybrid_search_linear" -> ((s, d) => Search.hybridLinearQuery(s, d)),
    "vdb_knn_sparse" -> (Search.sparseDotQuery _),
    "vdb_knn_sparse_indexed" -> (Search.sparseIndexedQuery _),
    "search_mmr_rerank" -> (Search.mmrQuery _),
    "search_ltr_rerank" -> ((s, d) => Search.ltrQuery(s, d)),
    "search_prf_expand" -> ((s, d) => Search.prfQuery(s, d)),
    "search_spell_correct" -> ((s, d) => Search.spellCorrectQuery(s, d)),
    "search_query_suggest" -> ((s, d) => Search.querySuggest(s, d)),
    "search_prefix" -> ((s, d) => Search.prefixSearch(s, d)),
    "search_prefix_indexed" -> ((s, d) => Search.prefixSearchIndexed(s, d)),
    "search_boolean" -> ((s, d) => Search.booleanSearch(s, d)),
    "search_facets" -> ((s, d) => Search.searchFacets(s, d)),
    "search_spell_indexed" -> ((s, d) => Search.spellCorrectIndexed(s, d)),
    "search_maxsim" -> (MaxSim.maxsimQuery _),
    "text_phrase_search" -> (Search.phraseSearchQuery _),
    "text_phrase_near" -> (Search.phraseNearQuery _),
    "search_snippets" -> ((s, d) => Search.snippetQuery(s, d)),
    "embed_mean_pool" -> (MaxSim.meanPoolQuery _),
    "vdb_time_travel" -> (Upsert.timeTravelQuery _),
    "pipeline_clean_corpus" -> ((s, d) => Pipeline.cleanCorpus(s, d)),
    "pipeline_train_eval" -> ((s, d) => Pipeline.trainEvalSplit(s, d)),
  )

  private val knnOracle: String => String = metric => {
    // metric: expr over (e.embedding::DOUBLE[], q.qv) + sort direction
    val (expr, ord) = metric match {
      case "l2" => ("list_distance(e.embedding::DOUBLE[], q.qv)", "ASC")
      // DuckDB has no native L1 — fold |a[i]−b[i]| over the index
      // range in list order, matching VecL1's left-to-right loop
      case "l1" => ("list_sum(list_transform(range(1, len(q.qv) + 1), " +
        "i -> abs((e.embedding::DOUBLE[])[i] - q.qv[i])))", "ASC")
      // list_max over the per-dim absolute gaps — max is order-free,
      // so this mirror is exact with no fold-order contract at all
      case "linf" => ("list_max(list_transform(range(1, len(q.qv) + 1), " +
        "i -> abs((e.embedding::DOUBLE[])[i] - q.qv[i])))", "ASC")
      case "ip" => ("list_inner_product(e.embedding::DOUBLE[], q.qv)", "DESC")
      case "cos" => ("list_cosine_similarity(e.embedding::DOUBLE[], q.qv)", "DESC")
    }
    s"""WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
       |           FROM embeddings WHERE vec_id < 5),
       |d AS (SELECT q.qid, e.vec_id AS nn_id, $expr AS s
       |      FROM embeddings e CROSS JOIN q),
       |r AS (SELECT qid, nn_id, s,
       |             row_number() OVER (PARTITION BY qid ORDER BY s $ord, nn_id) AS rk
       |      FROM d)
       |SELECT qid, rk, nn_id, round(s, 4) AS score
       |FROM r WHERE rk <= 10 ORDER BY qid, rk""".stripMargin
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  /** Shared oracle CTE: distinct word-3-gram shingle sets (DuckDB
    * lists are 1-based; mirrors Dedup.withShingles exactly).
    */
  /** `sfx` de-collides the CTE names when a query needs shingles of
    * TWO different doc sets (the capstone train/eval oracle shingles
    * the cleaned corpus while its victims chain already shingled the
    * raw one).
    */
  private def shingleCteFrom(src: String, sfx: String = ""): String =
    s"""w$sfx AS (SELECT doc_id, text, string_split(text, ' ') AS ws FROM $src),
       |sh$sfx AS (SELECT doc_id, list_distinct(CASE WHEN len(ws) >= 3
       |         THEN list_transform(range(1, len(ws)-1),
       |                i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
       |         ELSE [text] END) AS shingles FROM w$sfx)""".stripMargin

  private val shingleCte = shingleCteFrom("documents")

  /** Winnowing fingerprint CTE chain (k=5, w=4) ending in `fps$sfx`
    * — shared by the batch pair oracle and the incremental-index
    * mirror so the selection geometry cannot drift. Interpolated into
    * outer stripMargin strings: no continuation line starts with '|'.
    */
  private def winnowCtes(src: String, sfx: String): String =
    s"""t0$sfx AS (SELECT doc_id, lower(text) AS t FROM $src
       |            WHERE length(text) >= 5),
       |tm$sfx AS (SELECT doc_id, t,
       |         CAST(length(t) - 4 AS BIGINT) AS m FROM t0$sfx),
       |hx$sfx AS (SELECT doc_id, t, m,
       |         unnest(generate_series(1, m)) AS p FROM tm$sfx),
       |h$sfx AS (SELECT doc_id, m, p,
       |        CAST('0x' || substr(md5(substr(t, CAST(p AS INT), 5)),
       |          1, 15) AS BIGINT) AS h
       |      FROM hx$sfx),
       |wx$sfx AS (SELECT doc_id, h,
       |         unnest(generate_series(greatest(p - 3, 1),
       |           least(p, greatest(m - 3, 1)))) AS wi
       |       FROM h$sfx),
       |fw$sfx AS (SELECT doc_id, wi, min(h) AS fp
       |       FROM wx$sfx GROUP BY 1, 2),
       |fps$sfx AS (SELECT DISTINCT doc_id, fp FROM fw$sfx)""".stripMargin

  // NOTE: these shared CTE fragments are interpolated into outer
  // strings that call .stripMargin AGAIN — no continuation line here
  // may start with '|' (e.g. a leading '||'), or the second strip
  // eats one pipe and turns concatenation into bitwise OR.
  private def bandCteFrom(src: String): String =
    s"""${shingleCteFrom(src)},
       |mh AS (SELECT doc_id, list_transform(range(0, 12),
       |         j -> list_min(list_transform(shingles,
       |                s -> CAST('0x' || substr(md5(CAST(j AS VARCHAR) ||
       |                       '|' || s), 1, 15) AS BIGINT)))) AS mh
       |       FROM sh),
       |bands AS (SELECT doc_id, unnest(range(0, 4)) AS band, mh FROM mh),
       |bk AS (SELECT doc_id, band,
       |         md5(CAST(mh[3*band+1] AS VARCHAR) || '|' ||
       |             CAST(mh[3*band+2] AS VARCHAR) || '|' ||
       |             CAST(mh[3*band+3] AS VARCHAR)) AS band_key
       |       FROM bands)""".stripMargin

  private val bandCte = bandCteFrom("documents")

  /** Verified near-dup pairs (jaccard ≥ 0.5) from the banded
    * candidates, as a CTE chain ending in `pairs` — shared by the
    * clusters and pipeline oracles. No continuation line here may
    * start with '|' (double-stripMargin hazard).
    */
  private val verifiedPairsCte =
    """cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
      |         FROM bk a JOIN bk b ON a.band = b.band
      |           AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
      |shx AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
      |card AS (SELECT doc_id, count(*) AS c FROM shx GROUP BY 1),
      |inter AS (SELECT x.doc_id AS id1, y.doc_id AS id2, count(*) AS n
      |          FROM shx x JOIN shx y ON x.s = y.s AND x.doc_id < y.doc_id
      |          GROUP BY 1, 2),
      |pairs AS (SELECT c.id1 AS id1, c.id2 AS id2
      |          FROM cand c JOIN inter i ON c.id1 = i.id1 AND c.id2 = i.id2
      |          JOIN card c1 ON c.id1 = c1.doc_id
      |          JOIN card c2 ON c.id2 = c2.doc_id
      |          WHERE n*1.0/(c1.c + c2.c - n) >= 0.5)""".stripMargin

  /** Undirected transitive closure over `pairs` (linear recursion —
    * paths extend one edge per step, UNION dedups to the fixpoint).
    */
  private val closureCte =
    """edges AS (SELECT id1 AS src, id2 AS dst FROM pairs
      |          UNION SELECT id2, id1 FROM pairs),
      |reach AS (
      |  SELECT src AS id, dst AS r FROM edges
      |  UNION
      |  SELECT rc.id, e.dst FROM reach rc JOIN edges e ON rc.r = e.src)"""
      .stripMargin

  /** Exploded-form jaccard for a candidate-pair CTE named `cand`
    * (id1, id2); yields pairs (id1, id2, jaccard) ≥ 0.5.
    */
  private val jaccardVerify =
    """shx AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
      |card AS (SELECT doc_id, count(*) AS c FROM shx GROUP BY 1),
      |inter AS (SELECT x.doc_id AS id1, y.doc_id AS id2, count(*) AS n
      |          FROM shx x JOIN shx y ON x.s = y.s AND x.doc_id < y.doc_id
      |          GROUP BY 1, 2)
      |SELECT c.id1 AS id1, c.id2 AS id2,
      |       round(n*1.0/(c1.c + c2.c - n), 4) AS jaccard
      |FROM cand c JOIN inter i ON c.id1 = i.id1 AND c.id2 = i.id2
      |JOIN card c1 ON c.id1 = c1.doc_id JOIN card c2 ON c.id2 = c2.doc_id
      |WHERE n*1.0/(c1.c + c2.c - n) >= 0.5 ORDER BY c.id1, c.id2""".stripMargin

  /** LWW state after replaying the synthetic WAL — shared by the text
    * and binary-framed readers (same log, different physical format).
    */
  private val walReplayOracle =
    """WITH logs AS (
        |  SELECT vec_id AS log_id, 1 AS version, 'upsert' AS op,
        |         to_json(struct_pack(id := vec_id, vectors := embedding,
        |           int_field := CAST(label AS BIGINT),
        |           indexType := 'FLAT')) AS j
        |  FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 100000, 2, 'upsert',
        |         to_json(struct_pack(id := vec_id, vectors := embedding,
        |           int_field := CAST(label + 100 AS BIGINT),
        |           indexType := 'FLAT'))
        |  FROM embeddings WHERE vec_id % 7 = 0),
        |lines AS (SELECT CAST(log_id AS VARCHAR) || '|' ||
        |                 CAST(version AS VARCHAR) || '|' || op || '|' || j
        |                   AS line FROM logs),
        |parsed AS (SELECT
        |  CAST(string_split(line, '|')[1] AS BIGINT) AS log_id,
        |  CAST(string_split(line, '|')[2] AS BIGINT) AS version,
        |  string_split(line, '|')[3] AS op,
        |  CAST(json_extract(string_split(line, '|')[4], '$.id') AS BIGINT)
        |    AS id,
        |  CAST(json_extract(string_split(line, '|')[4], '$.int_field')
        |    AS BIGINT) AS int_field
        |  FROM lines),
        |r AS (SELECT id, int_field, version, log_id,
        |        row_number() OVER (PARTITION BY id
        |                           ORDER BY version DESC, log_id DESC) AS rk,
        |        count(*) OVER (PARTITION BY id) AS n_log_entries
        |      FROM parsed WHERE op = 'upsert')
        |SELECT id, int_field, version, CAST(n_log_entries AS BIGINT)
        |  AS n_log_entries
        |FROM r WHERE rk = 1 ORDER BY id""".stripMargin

  /** [[walReplayOracle]]'s tombstone twin: the same line-format
    * round-trip with a v3 delete wave (%5) and a v4 resurrection
    * wave (%15); ONE LWW pass over both optypes, tombstone winners
    * erased, n_log_entries counting every record that mentioned the
    * id (deletes included).
    */
  /** Parse + LWW-rank CTE chain over the tombstone-wave synthetic
    * log (through `r`), shared by the delete-replay and compaction
    * oracles. Pre-stripped: interpolate with plain concatenation.
    */
  private val walDeleteParsedCtes =
    """logs AS (
        |  SELECT vec_id AS log_id, 1 AS version, 'upsert' AS op,
        |         to_json(struct_pack(id := vec_id, vectors := embedding,
        |           int_field := CAST(label AS BIGINT),
        |           indexType := 'FLAT')) AS j
        |  FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 100000, 2, 'upsert',
        |         to_json(struct_pack(id := vec_id, vectors := embedding,
        |           int_field := CAST(label + 100 AS BIGINT),
        |           indexType := 'FLAT'))
        |  FROM embeddings WHERE vec_id % 7 = 0
        |  UNION ALL
        |  SELECT vec_id + 200000, 3, 'delete',
        |         to_json(struct_pack(id := vec_id))
        |  FROM embeddings WHERE vec_id % 5 = 0
        |  UNION ALL
        |  SELECT vec_id + 300000, 4, 'upsert',
        |         to_json(struct_pack(id := vec_id, vectors := embedding,
        |           int_field := CAST(label + 500 AS BIGINT),
        |           indexType := 'FLAT'))
        |  FROM embeddings WHERE vec_id % 15 = 0),
        |lines AS (SELECT CAST(log_id AS VARCHAR) || '|' ||
        |                 CAST(version AS VARCHAR) || '|' || op || '|' || j
        |                   AS line FROM logs),
        |parsed AS (SELECT
        |  CAST(string_split(line, '|')[1] AS BIGINT) AS log_id,
        |  CAST(string_split(line, '|')[2] AS BIGINT) AS version,
        |  string_split(line, '|')[3] AS op,
        |  CAST(json_extract(string_split(line, '|')[4], '$.id') AS BIGINT)
        |    AS id,
        |  CAST(json_extract(string_split(line, '|')[4], '$.int_field')
        |    AS BIGINT) AS int_field
        |  FROM lines),
        |r AS (SELECT id, int_field, version, log_id, op,
        |        row_number() OVER (PARTITION BY id
        |                           ORDER BY version DESC, log_id DESC) AS rk,
        |        count(*) OVER (PARTITION BY id) AS n_log_entries
        |      FROM parsed WHERE op IN ('upsert', 'delete'))""".stripMargin

  private val walDeleteReplayOracle =
    "WITH " + walDeleteParsedCtes +
      """
        |SELECT id, int_field, version, CAST(n_log_entries AS BIGINT)
        |  AS n_log_entries
        |FROM r WHERE rk = 1 AND op <> 'delete' ORDER BY id""".stripMargin

  /** Live LWW state only — compaction collapses n_log_entries to 1
    * by construction, so the compacted replay drops the column.
    */
  private val walCompactReplayOracle =
    "WITH " + walDeleteParsedCtes +
      """
        |SELECT id, int_field, version
        |FROM r WHERE rk = 1 AND op <> 'delete' ORDER BY id""".stripMargin

  /** Parse + change-collapse + interval CTE chain of the tombstone
    * log's SCD2 history (through `scd`), shared by the history and
    * retention oracles. Pre-stripped: concatenate, do not re-strip.
    */
  private val scd2TombCtes =
    """WITH log AS (
        |  SELECT vec_id AS id, CAST(label AS BIGINT) AS label,
        |         CAST(1 AS BIGINT) AS version, 'upsert' AS op
        |  FROM embeddings
        |  UNION ALL
        |  SELECT vec_id, CAST(label + 100 AS BIGINT), 2, 'upsert'
        |  FROM embeddings WHERE vec_id % 7 = 0
        |  UNION ALL
        |  SELECT vec_id, CAST(label + 100 AS BIGINT), 3, 'upsert'
        |  FROM embeddings WHERE vec_id % 14 = 0
        |  UNION ALL
        |  SELECT vec_id, CAST(label + 300 AS BIGINT), 4, 'upsert'
        |  FROM embeddings WHERE vec_id % 21 = 0
        |  UNION ALL
        |  SELECT vec_id, CAST(NULL AS BIGINT), 5, 'delete'
        |  FROM embeddings WHERE vec_id % 5 = 0
        |  UNION ALL
        |  SELECT vec_id, CAST(label + 500 AS BIGINT), 6, 'upsert'
        |  FROM embeddings WHERE vec_id % 15 = 0),
        |chg AS (SELECT id, label, version, op,
        |          lag(label) OVER w AS pl, lag(op) OVER w AS po
        |        FROM log
        |        WINDOW w AS (PARTITION BY id ORDER BY version)),
        |keep AS (SELECT id, label, version, op FROM chg
        |         WHERE NOT (label IS NOT DISTINCT FROM pl
        |                AND op IS NOT DISTINCT FROM po)),
        |scd AS (SELECT id, label, op, version AS valid_from,
        |          lead(version) OVER (PARTITION BY id ORDER BY version)
        |            AS valid_to
        |        FROM keep)"""
      .stripMargin


  /** Shared BM25 CTE chain (through ranked results `r`) mirroring
    * Search.bm25TopK exactly: same whitespace tokenization, same
    * integer-derived tf/df/dl/N doubles, same Lucene idf, ranks on
    * the 4dp-ROUNDED score with doc_id tiebreak (raw-double ranking
    * would be sensitive to ln() ulp and summation-order differences
    * between engines). Constants are cast to DOUBLE: bare DuckDB
    * decimal literals would switch the arithmetic to DECIMAL.
    */
  private val bm25Ctes: String = bm25CtesWhere("")

  /** The registry's fixed query batch as a q-CTE body (a def:
    * bm25Ctes initializes before this point in the object, and a val
    * here would still be null then).
    */
  private def bm25QValues: String =
    """SELECT CAST(qid AS BIGINT) AS qid, qtext FROM (VALUES
      |        (0, 'spark join hash'), (1, 'stream window batch'),
      |        (2, 'dup vector scan'), (3, 'customer order value'),
      |        (4, 'filter sort merge')) v(qid, qtext)""".stripMargin

  /** BM25 CTE chain with an optional candidate restriction appended
    * to the scoring CTE — global statistics (st/idf from all
    * documents) with filtered candidates, the Lucene filter-query
    * semantics Search.bm25TopKFiltered implements.
    */
  private def bm25CtesWhere(candWhere: String): String =
    bm25CtesQ(candWhere, bm25QValues, "")

  /** The same chain with a CUSTOM query source (`qSql` becomes the
    * q CTE body) and optional PREFIX CTEs (`pre`, emitted first —
    * e.g. a spell-correction chain q derives from).
    */
  private def bm25CtesQ(candWhere: String, qSql: String,
                        pre: String): String =
    s"""${pre}d AS (SELECT doc_id, string_split(text, ' ') AS toks,
      |             CAST(len(string_split(text, ' ')) AS DOUBLE) AS dl
      |      FROM documents),
      |st AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl
      |       FROM d),
      |q AS ($qSql),
      |qt AS (SELECT DISTINCT qid, term FROM
      |        (SELECT qid, unnest(string_split(qtext, ' ')) AS term FROM q)),
      |terms AS (SELECT DISTINCT term FROM qt),
      |ex AS (SELECT doc_id, dl, unnest(toks) AS term FROM d),
      |p AS (SELECT term, doc_id, dl, CAST(count(*) AS DOUBLE) AS tf
      |      FROM ex JOIN terms USING (term) GROUP BY 1, 2, 3),
      |idf AS (SELECT term,
      |               ln((st.n_docs - dfreq + CAST(0.5 AS DOUBLE))
      |                  / (dfreq + CAST(0.5 AS DOUBLE))
      |                  + CAST(1.0 AS DOUBLE)) AS idf,
      |               st.avgdl
      |        FROM (SELECT term, CAST(count(*) AS DOUBLE) AS dfreq
      |              FROM p GROUP BY 1), st),
      |c AS (SELECT qt.qid, p.doc_id,
      |             idf.idf * p.tf * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE))
      |             / (p.tf + CAST(1.2 AS DOUBLE)
      |                * (CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE)
      |                   + CAST(0.75 AS DOUBLE) * p.dl / idf.avgdl)) AS contrib
      |      FROM p JOIN idf USING (term) JOIN qt USING (term)$candWhere),
      |sc AS (SELECT qid, doc_id, round(sum(contrib), 4) AS score
      |       FROM c GROUP BY 1, 2),
      |r AS (SELECT qid, doc_id, score,
      |             row_number() OVER (PARTITION BY qid
      |                                ORDER BY score DESC, doc_id) AS rk
      |      FROM sc)""".stripMargin

  // ---------------------------------------------------------------- ANN
  // DuckDB mirrors of the deterministic ANN pipelines (Ann.scala).
  // Every stage is a pure function: stride-sampled init, Lloyd means
  // ROUNDED to 6dp then cast through FLOAT (independent of summation
  // order on both engines), argmin with (cd, cell) tiebreak, probe
  // slice, exact cosine rerank on (score, id). list_inner_product's
  // strict left-to-right summation matches VecDot (the same reason
  // dedup_embedding_cos's sign-of-dot bucket decisions hash-match).
  // Fragments are single-line to dodge the double-stripMargin hazard.

  /** Negated-cosine centroid distance with NULL→2.0 coalesce —
    * mirrors Ann.centroidDists: rowNorm * centNorm product order,
    * zero denom → 2.0 (worse than any real negated cosine).
    */
  private def ivfCd(v: String, cv: String): String =
    s"coalesce(CASE WHEN sqrt(list_inner_product($v, $v)) * " +
      s"sqrt(list_inner_product($cv, $cv)) = 0 THEN NULL " +
      s"ELSE -(list_inner_product($v, $cv) / (sqrt(list_inner_product($v, $v)) * " +
      s"sqrt(list_inner_product($cv, $cv)))) END, CAST(2.0 AS DOUBLE))"

  /** One argmin assignment round (Ann.assignTo): nearest centroid by
    * (cd, cell) over the current centroid set `cents`.
    */
  private def ivfAssignCte(a: String, cents: String): String =
    s"$a AS (SELECT id, v, cell FROM (SELECT e.id, e.v, c.cell, " +
      s"row_number() OVER (PARTITION BY e.id ORDER BY ${ivfCd("e.v", "c.cv")}, c.cell) AS rn " +
      s"FROM e CROSS JOIN $cents c) WHERE rn = 1)"

  /** One Lloyd mean round (Ann.kmeansCentroids): per-(cell, dim) mean
    * rounded to 6dp and cast through FLOAT — the float round-trip is
    * what the Spark side stores, so the next round's doubles agree.
    */
  private def ivfMeanCte(c: String, a: String): String =
    s"$c AS (SELECT cell, list(m ORDER BY dim) AS cv FROM (" +
      s"SELECT cell, dim, CAST(CAST(round(avg(x), 6) AS FLOAT) AS DOUBLE) AS m " +
      s"FROM (SELECT t.cell, i.i AS dim, t.v[i.i] AS x FROM $a t CROSS JOIN " +
      s"(SELECT unnest(range(1, 65)) AS i) i) GROUP BY cell, dim) GROUP BY cell)"

  /** Shared IVF chain (stride=200, 2 Lloyd iters, nprobe=2): final
    * assignment `af`, probe set `pr` (2 nearest cells per query).
    */
  private val ivfCtes: String = Seq(
    "e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings)",
    "q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 5)",
    "c0 AS (SELECT vec_id AS cell, embedding::DOUBLE[] AS cv FROM embeddings WHERE vec_id % 200 = 0)",
    ivfAssignCte("a1", "c0"),
    ivfMeanCte("c1", "a1"),
    ivfAssignCte("a2", "c1"),
    ivfMeanCte("c2", "a2"),
    ivfAssignCte("af", "c2"),
    s"pr AS (SELECT qid, cell FROM (SELECT q.qid, c.cell, " +
      s"row_number() OVER (PARTITION BY q.qid ORDER BY ${ivfCd("q.qv", "c.cv")}, c.cell) AS rn " +
      s"FROM q CROSS JOIN c2 c) WHERE rn <= 2)"
  ).mkString(",\n")

  /** [[ivfCtes]] with EVERY vector as a query (the corpus-wide kNN
    * graph) and the self-edge excluded at scoring: same training
    * chain, graph edges provably agree with single-query ivf answers.
    */
  private val ivfGraphCtes: String = Seq(
    "e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings)",
    "q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv FROM embeddings)",
    "c0 AS (SELECT vec_id AS cell, embedding::DOUBLE[] AS cv FROM embeddings WHERE vec_id % 200 = 0)",
    ivfAssignCte("a1", "c0"),
    ivfMeanCte("c1", "a1"),
    ivfAssignCte("a2", "c1"),
    ivfMeanCte("c2", "a2"),
    ivfAssignCte("af", "c2"),
    s"pr AS (SELECT qid, cell FROM (SELECT q.qid, c.cell, " +
      s"row_number() OVER (PARTITION BY q.qid ORDER BY ${ivfCd("q.qv", "c.cv")}, c.cell) AS rn " +
      s"FROM q CROSS JOIN c2 c) WHERE rn <= 2)",
    """gr AS (SELECT qid, id, s, row_number() OVER (PARTITION BY qid
      |    ORDER BY s DESC, id) AS rk FROM (
      |  SELECT pr.qid, a.id, list_cosine_similarity(a.v, q.qv) AS s
      |  FROM af a JOIN pr ON a.cell = pr.cell JOIN q ON pr.qid = q.qid
      |  WHERE a.id <> pr.qid) WHERE s IS NOT NULL)""".stripMargin
  ).mkString(",\n")

  /** NSW beam-round CTE chain (beam=16, graphK=8) over the knn-graph
    * CTE `gr`, for the query set selected by `qqWhere` on embeddings
    * — shared by the standalone ann_nsw oracle and the routed batch
    * API's HNSW leg, so the two cannot drift.
    *
    * @param pfx prefix for every emitted CTE name — lets one oracle
    *            instantiate the chain per EFFORT CLASS (the
    *            heterogeneous-ef routed batch: a 1-round chain and a
    *            3-round chain side by side; per-query trajectories
    *            are qid-partitioned, so per-class chains ≡ the Spark
    *            side's single gated loop)
    * @param rounds beam rounds to unroll (the per-request budget
    *               ⌈ef/beam⌉, capped)
    * @param emitBase emit the shared g8/ed edge CTEs (false when a
    *                 previous instantiation already defined them)
    */
  private def nswBeamCtes(qqWhere: String, pfx: String = "",
                          rounds: Int = 3,
                          emitBase: Boolean = true): String = {
    val beam = 16
    val sb = new StringBuilder
    if (emitBase) sb.append(
      s"""g8 AS (SELECT qid, id FROM gr WHERE rk <= 8),
         |ed AS (SELECT qid AS src, id AS dst FROM g8
         |       UNION SELECT id, qid FROM g8),
         |""".stripMargin)
    sb.append(
      s"""${pfx}qq AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
         |       FROM embeddings WHERE $qqWhere),
         |${pfx}prq AS (SELECT qid, cell FROM (SELECT ${pfx}qq.qid, c.cell,
         |         row_number() OVER (PARTITION BY ${pfx}qq.qid
         |           ORDER BY ${ivfCd(s"${pfx}qq.qv", "c.cv")}, c.cell) AS rn
         |       FROM ${pfx}qq CROSS JOIN c2 c) WHERE rn <= 2),
         |${pfx}bs0 AS (SELECT ${pfx}prq.qid, a.id,
         |         list_cosine_similarity(a.v, ${pfx}qq.qv) AS s
         |       FROM af a JOIN ${pfx}prq ON a.cell = ${pfx}prq.cell
         |       JOIN ${pfx}qq ON ${pfx}prq.qid = ${pfx}qq.qid),
         |${pfx}bf0 AS (SELECT qid, id, s FROM (SELECT *, row_number() OVER (
         |         PARTITION BY qid ORDER BY s DESC, id) AS rk
         |       FROM ${pfx}bs0 WHERE s IS NOT NULL) WHERE rk <= $beam)""".stripMargin)
    for (r <- 1 to rounds) {
      val p = r - 1
      sb.append(s""",
        |${pfx}bc$r AS (SELECT f.qid, ed.dst AS id FROM ${pfx}bf$p f
        |         JOIN ed ON f.id = ed.src
        |       UNION SELECT qid, id FROM ${pfx}bf$p),
        |${pfx}bs$r AS (SELECT c.qid, c.id,
        |         list_cosine_similarity(e.v, ${pfx}qq.qv) AS s
        |       FROM ${pfx}bc$r c JOIN e ON c.id = e.id
        |       JOIN ${pfx}qq ON c.qid = ${pfx}qq.qid),
        |${pfx}bf$r AS (SELECT qid, id, s FROM (SELECT *, row_number() OVER (
        |         PARTITION BY qid ORDER BY s DESC, id) AS rk
        |       FROM ${pfx}bs$r WHERE s IS NOT NULL) WHERE rk <= $beam)""".stripMargin)
    }
    sb.toString
  }

  /** Hierarchical-NSW mirror (Ann.hnswSearch): md5-derived geometric
    * levels (P[lvl ≥ l] = 8^-l, nested, capped at 4), per-layer kNN
    * edge CTEs blocked by the shared IVF cells with
    * density-compensated probe widths (2·8^l cells ⇒ ≈ 2·stride
    * candidates per node at every layer), single-entry descent
    * (max lvl, min id) through layers 4→1 at beam 8, then the base
    * 3-round beam-16 loop over the `gr` graph. Empty layers (no
    * nodes at that level in a small corpus) expand to nothing and
    * the UNION carry keeps the frontier — the same identity step the
    * Spark loop takes.
    */
  /** @param emitBase emit the shared g8/ed base-edge CTEs (false
    *                  when composing after [[nswBeamCtes]], which
    *                  already defined them identically)
    *  @param qq name for the query CTE (rename when the default
    *            clashes in a composed oracle)
    */
  private def hnswBeamCtes(qqWhere: String, emitBase: Boolean = true,
                           qq: String = "qq"): String = {
    val beamU = 8
    val beam = 16
    val sb = new StringBuilder
    if (emitBase) sb.append(
      s"""g8 AS (SELECT qid, id FROM gr WHERE rk <= 8),
         |ed AS (SELECT qid AS src, id AS dst FROM g8
         |       UNION SELECT id, qid FROM g8),
         |""".stripMargin)
    sb.append(
      s"""lv AS (SELECT id, CASE WHEN h % 4096 = 0 THEN 4
         |         WHEN h % 512 = 0 THEN 3 WHEN h % 64 = 0 THEN 2
         |         WHEN h % 8 = 0 THEN 1 ELSE 0 END AS lvl
         |       FROM (SELECT id, CAST('0x' || substr(md5(CAST(id AS VARCHAR)),
         |         1, 15) AS BIGINT) AS h FROM e)),
         |ent AS (SELECT e.id FROM e JOIN lv ON e.id = lv.id
         |        ORDER BY lv.lvl DESC, e.id LIMIT 1),
         |$qq AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
         |       FROM embeddings WHERE $qqWhere)""".stripMargin)
    for (l <- 1 to 4) {
      val np = 2 * math.pow(8, l).toInt
      sb.append(s""",
        |nl$l AS (SELECT e.id, e.v FROM e JOIN lv ON e.id = lv.id
        |       WHERE lv.lvl >= $l),
        |pl$l AS (SELECT qid, qv, cell FROM (SELECT n.id AS qid, n.v AS qv,
        |         c.cell, row_number() OVER (PARTITION BY n.id
        |           ORDER BY ${ivfCd("n.v", "c.cv")}, c.cell) AS rn
        |       FROM nl$l n CROSS JOIN c2 c) WHERE rn <= $np),
        |gl$l AS (SELECT src, dst FROM (SELECT qid AS src, id AS dst,
        |         row_number() OVER (PARTITION BY qid ORDER BY s DESC, id) AS rk
        |       FROM (SELECT p.qid, a.id, list_cosine_similarity(a.v, p.qv) AS s
        |             FROM pl$l p JOIN af a ON a.cell = p.cell
        |             JOIN nl$l m ON a.id = m.id
        |             WHERE a.id <> p.qid) WHERE s IS NOT NULL) WHERE rk <= 8),
        |el$l AS (SELECT src, dst FROM gl$l
        |       UNION SELECT dst, src FROM gl$l)""".stripMargin)
    }
    sb.append(s""",
      |hs5 AS (SELECT $qq.qid, ent.id, list_cosine_similarity(e.v, $qq.qv)
      |         AS s
      |       FROM $qq CROSS JOIN ent JOIN e ON e.id = ent.id),
      |hf5 AS (SELECT qid, id, s FROM (SELECT *, row_number() OVER (
      |         PARTITION BY qid ORDER BY s DESC, id) AS rk
      |       FROM hs5 WHERE s IS NOT NULL) WHERE rk <= $beamU)""".stripMargin)
    for (l <- 4 to 1 by -1) {
      val p = l + 1
      sb.append(s""",
        |hc$l AS (SELECT f.qid, el.dst AS id FROM hf$p f
        |         JOIN el$l el ON f.id = el.src
        |       UNION SELECT qid, id FROM hf$p),
        |hs$l AS (SELECT c.qid, c.id, list_cosine_similarity(e.v, $qq.qv)
        |         AS s
        |       FROM hc$l c JOIN e ON c.id = e.id
        |       JOIN $qq ON c.qid = $qq.qid),
        |hf$l AS (SELECT qid, id, s FROM (SELECT *, row_number() OVER (
        |         PARTITION BY qid ORDER BY s DESC, id) AS rk
        |       FROM hs$l WHERE s IS NOT NULL) WHERE rk <= $beamU)""".stripMargin)
    }
    for (r <- 1 to 3) {
      val prev = if (r == 1) "hf1" else s"hbf${r - 1}"
      sb.append(s""",
        |hbc$r AS (SELECT f.qid, ed.dst AS id FROM $prev f
        |         JOIN ed ON f.id = ed.src
        |       UNION SELECT qid, id FROM $prev),
        |hbs$r AS (SELECT c.qid, c.id, list_cosine_similarity(e.v, $qq.qv)
        |         AS s
        |       FROM hbc$r c JOIN e ON c.id = e.id
        |       JOIN $qq ON c.qid = $qq.qid),
        |hbf$r AS (SELECT qid, id, s FROM (SELECT *, row_number() OVER (
        |         PARTITION BY qid ORDER BY s DESC, id) AS rk
        |       FROM hbs$r WHERE s IS NOT NULL) WHERE rk <= $beam)""".stripMargin)
    }
    sb.toString
  }

  private val hnswOracle: String =
    s"""WITH $ivfGraphCtes,
       |${hnswBeamCtes("vec_id < 5")}
       |SELECT qid, rk, id AS nn_id, round(s, 4) AS score
       |FROM (SELECT *, row_number() OVER (PARTITION BY qid
       |        ORDER BY s DESC, id) AS rk FROM hbf3)
       |WHERE rk <= 10 ORDER BY qid, rk""".stripMargin

  /** NSW beam-search mirror (Ann.nswSearch k=10 beam=16 rounds=3
    * graphK=8): the knn-graph CTEs provide `gr`; each beam round is
    * an unrolled expand-union-rescore-cut CTE block, exactly the
    * fixed-depth iteration the Spark side runs.
    */
  private val nswOracle: String =
    s"""WITH $ivfGraphCtes,
       |${nswBeamCtes("vec_id < 5")}
       |SELECT qid, rk, id AS nn_id, round(s, 4) AS score
       |FROM (SELECT *, row_number() OVER (PARTITION BY qid
       |        ORDER BY s DESC, id) AS rk FROM bf3)
       |WHERE rk <= 10 ORDER BY qid, rk""".stripMargin

  /** IVF search result: probed cells' members, exact cosine, top-10
    * per query on (score DESC, id) — Ann.ivfSearch / ivfSearchIndexed
    * produce identical results by construction (same centroids), so
    * both share this oracle.
    */
  /** MMR rerank mirror (Search.mmrRerank, λ=1/2 ⇒ argmax(rel − pen),
    * k=5 over the cosine top-20): recursive CTE terms cannot
    * aggregate, so the k greedy steps unroll as chained CTEs — step n
    * anti-joins the selected set, takes each survivor's max 4dp sim
    * to it as the penalty, and picks argmax (rel − pen, id asc).
    */
  private val mmrOracle: String = {
    val base =
      """q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
        |      FROM embeddings WHERE vec_id < 5),
        |e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v
        |      FROM embeddings),
        |d AS (SELECT q.qid, e.id, list_cosine_similarity(e.v, q.qv) AS s
        |      FROM e CROSS JOIN q),
        |r AS (SELECT qid, id, s, row_number() OVER (PARTITION BY qid
        |        ORDER BY s DESC, id) AS rk
        |      FROM d WHERE s IS NOT NULL),
        |c AS (SELECT qid, id, round(s, 4) AS rel FROM r WHERE rk <= 20),
        |p AS (SELECT a.qid, a.id AS id1, b.id AS id2,
        |             round(list_cosine_similarity(ea.v, eb.v), 4) AS sim
        |      FROM c a JOIN c b ON a.qid = b.qid AND a.id <> b.id
        |      JOIN e ea ON ea.id = a.id JOIN e eb ON eb.id = b.id),
        |s1 AS (SELECT qid, id, rel AS mmr FROM (
        |         SELECT qid, id, rel, row_number() OVER (
        |           PARTITION BY qid ORDER BY rel DESC, id) AS rn
        |         FROM c) WHERE rn = 1)""".stripMargin
    val steps = (2 to 5).map { n =>
      val prevSel = (1 until n)
        .map(i => s"SELECT qid, id FROM s$i").mkString(" UNION ALL ")
      s"""sel$n AS ($prevSel),
         |s$n AS (SELECT qid, id, mmr FROM (
         |  SELECT g.qid, g.id, g.mmr, row_number() OVER (
         |    PARTITION BY g.qid ORDER BY g.mmr DESC, g.id) AS rn
         |  FROM (SELECT cc.qid, cc.id, cc.rel - max(pp.sim) AS mmr
         |        FROM c cc
         |        JOIN p pp ON pp.qid = cc.qid AND pp.id1 = cc.id
         |        JOIN sel$n sl ON sl.qid = pp.qid AND sl.id = pp.id2
         |        WHERE NOT EXISTS (SELECT 1 FROM sel$n x
         |                          WHERE x.qid = cc.qid AND x.id = cc.id)
         |        GROUP BY cc.qid, cc.id, cc.rel) g) WHERE rn = 1)"""
        .stripMargin
    }
    val finals = (1 to 5).map(i =>
      s"SELECT qid, CAST($i AS BIGINT) AS rk, id AS doc_id, " +
        s"round(mmr, 4) AS mmr_score FROM s$i").mkString("\nUNION ALL\n")
    s"WITH $base,\n${steps.mkString(",\n")}\n$finals\nORDER BY qid, rk"
  }

  /** Sparse tf·idf² dot over the bm25 chain's p/idf/qt — shared by
    * the on-the-fly and persisted-index forms (equal by construction,
    * the text_bm25_indexed precedent). A def: the bm25 CTE builders
    * below it are defs too, and a val here would initialize first.
    */
  private def sparseOracle: String =
    s"""WITH $bm25Ctes,
       |sp AS (SELECT qt.qid, p.doc_id,
       |         p.tf * (idf.idf * idf.idf) AS contrib
       |       FROM p JOIN idf USING (term) JOIN qt USING (term)),
       |ssc AS (SELECT qid, doc_id, round(sum(contrib), 4) AS score
       |        FROM sp GROUP BY 1, 2),
       |ssr AS (SELECT qid, doc_id, score,
       |          row_number() OVER (PARTITION BY qid
       |            ORDER BY score DESC, doc_id) AS rk
       |        FROM ssc)
       |SELECT qid, rk, doc_id, score FROM ssr WHERE rk <= 10
       |ORDER BY qid, rk""".stripMargin

  private val ivfOracle: String =
    s"""WITH $ivfCtes,
       |sc AS (SELECT pr.qid, a.id, list_cosine_similarity(a.v, q.qv) AS s
       |       FROM af a JOIN pr ON a.cell = pr.cell JOIN q ON pr.qid = q.qid),
       |r AS (SELECT qid, id, s,
       |             row_number() OVER (PARTITION BY qid ORDER BY s DESC, id) AS rk
       |      FROM sc WHERE s IS NOT NULL)
       |SELECT qid, rk, id AS nn_id, round(s, 4) AS score
       |FROM r WHERE rk <= 10 ORDER BY qid, rk""".stripMargin

  // ---------------------------------------------------------------- PQ
  // DuckDB mirrors of the deterministic product-quantization pipeline
  // (Pq.scala): per-subspace codebooks from lowest-16 stride-sampled
  // init + 2 Lloyd rounds (6dp float-round-tripped means), argmin
  // encode with (dist, cid) tiebreak, ADC distance against the
  // flattened reconstruction, exact rerank. Squared distances are
  // list_inner_product(d, d) over the diff list — the same strict
  // left-to-right fold the codegen accumulator runs.

  private def pqSqDist(a: String, b: String, n: Int): String =
    s"list_inner_product(list_transform(range(1, $n), j -> $a[j] - $b[j]), " +
      s"list_transform(range(1, $n), j -> $a[j] - $b[j]))"

  /** `src` is the training/encoding vector table — `e` for the raw
    * family, `er` (cell residuals) for by_residual=true.
    */
  private def pqBaseSrc(src: String): Seq[String] = Seq(
    "psub AS (SELECT unnest(range(8)) AS sub)",
    "psamp AS (SELECT v, cid FROM (SELECT v, row_number() OVER (ORDER BY id) - 1 AS cid " +
      s"FROM $src WHERE id % 25 = 0) WHERE cid <= 15)",
    "pcb0 AS (SELECT sub, cid, list_transform(range(1, 9), j -> v[sub*8 + j]) AS cw " +
      "FROM psamp CROSS JOIN psub)",
    "pev AS (SELECT id, sub, list_transform(range(1, 9), j -> v[sub*8 + j]) AS sv " +
      s"FROM $src CROSS JOIN psub)")

  /** One encode round (PqUtils.encode): nearest codeword per
    * (id, sub) by squared L2 with (dist, cid) tiebreak.
    */
  private def pqAssignCte(a: String, cb: String): String =
    s"$a AS (SELECT id, sub, cid FROM (SELECT pev.id, pev.sub, cb.cid, " +
      s"row_number() OVER (PARTITION BY pev.id, pev.sub ORDER BY " +
      s"${pqSqDist("pev.sv", "cb.cw", 9)}, cb.cid) AS rn " +
      s"FROM pev JOIN $cb cb ON pev.sub = cb.sub) WHERE rn = 1)"

  /** One Lloyd mean round (Pq.trainCodebook): per-(sub, cid, j) mean
    * rounded to 6dp and cast through FLOAT.
    */
  private def pqMeanCte(mName: String, a: String): String =
    s"$mName AS (SELECT sub, cid, list(mm ORDER BY j) AS cw FROM (" +
      s"SELECT a.sub, a.cid, jj.j, " +
      s"CAST(CAST(round(avg(pev.sv[jj.j]), 6) AS FLOAT) AS DOUBLE) AS mm " +
      s"FROM $a a JOIN pev ON a.id = pev.id AND a.sub = pev.sub " +
      s"CROSS JOIN (SELECT unnest(range(1, 9)) AS j) jj " +
      s"GROUP BY a.sub, a.cid, jj.j) GROUP BY sub, cid)"

  /** Codewords with no members keep their previous value. */
  private def pqStepCte(cbN: String, mN: String, prev: String): String =
    s"$cbN AS (SELECT p.sub, p.cid, coalesce(n.cw, p.cw) AS cw " +
      s"FROM $prev p LEFT JOIN $mN n ON p.sub = n.sub AND p.cid = n.cid)"

  /** Shared PQ chain (stride=25, ksub=16, 2 Lloyd iters): trained
    * codebook `pcb2`, final codes `paf`, flattened per-id
    * reconstruction `prec`. Expects an `e(id, v)` CTE in scope.
    */
  private def pqCtesSrc(src: String): String = (pqBaseSrc(src) ++ Seq(
    pqAssignCte("pa1", "pcb0"), pqMeanCte("pm1", "pa1"),
    pqStepCte("pcb1", "pm1", "pcb0"),
    pqAssignCte("pa2", "pcb1"), pqMeanCte("pm2", "pa2"),
    pqStepCte("pcb2", "pm2", "pcb1"),
    pqAssignCte("paf", "pcb2"),
    "prec AS (SELECT paf.id, flatten(list(c.cw ORDER BY paf.sub)) AS rv " +
      "FROM paf JOIN pcb2 c ON paf.sub = c.sub AND paf.cid = c.cid " +
      "GROUP BY paf.id)"
  )).mkString(",\n")

  private def pqCtes: String = pqCtesSrc("e")

  /** Sign-LSH search mirror; `multiprobe` adds the Hamming-1 probe
    * expansion on the query side (xor one bit per probe).
    */
  private def lshOracle(multiprobe: Boolean): String =
    s"""WITH ${lshCtes(multiprobe)}
       |SELECT qid, rk, id AS nn_id, round(s, 4) AS score
       |FROM r WHERE rk <= 10 ORDER BY qid, rk""".stripMargin

  /** The LSH chain up to the ranked candidates `r` — shared by the
    * search oracle and the recall report.
    */
  private def lshCtes(multiprobe: Boolean): String = {
    val probeSrc = if (multiprobe) "qp" else "qs"
    val qpCte = if (multiprobe)
      """qp AS (SELECT qid, t,
        |  unnest([xor(sig, 1), xor(sig, 2), xor(sig, 4), xor(sig, 8),
        |          sig]) AS sig FROM qs),
        |""".stripMargin
    else ""
    s"""hpw AS (
       |  SELECT t, p, d,
       |    ((CAST('0x' || substr(md5(CAST(t AS VARCHAR) || '|' ||
       |        CAST(p AS VARCHAR) || '|' || CAST(d AS VARCHAR)), 1, 8)
       |        AS BIGINT) & 2147483647) / 2147483647.0 * 2.0 - 1.0) AS w
       |  FROM range(4) r1(t) CROSS JOIN range(4) r2(p)
       |       CROSS JOIN range(64) r3(d)),
       |hp AS (SELECT t, p, list(w ORDER BY d) AS wv FROM hpw GROUP BY t, p),
       |e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
       |q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
       |      FROM embeddings WHERE vec_id < 5),
       |ds AS (SELECT e.id, hp.t,
       |         sum(CASE WHEN list_inner_product(e.v, hp.wv) > 0
       |               THEN 1 << p ELSE 0 END) AS sig
       |       FROM e CROSS JOIN hp GROUP BY e.id, hp.t),
       |qs AS (SELECT q.qid, hp.t,
       |         sum(CASE WHEN list_inner_product(q.qv, hp.wv) > 0
       |               THEN 1 << p ELSE 0 END) AS sig
       |       FROM q CROSS JOIN hp GROUP BY q.qid, hp.t),
       |${qpCte}cand AS (SELECT DISTINCT pr.qid, ds.id
       |         FROM ds JOIN $probeSrc pr ON ds.t = pr.t AND ds.sig = pr.sig),
       |sc AS (SELECT c.qid, c.id, list_cosine_similarity(e.v, q.qv) AS s
       |       FROM cand c JOIN e ON c.id = e.id JOIN q ON c.qid = q.qid),
       |r AS (SELECT qid, id, s,
       |             row_number() OVER (PARTITION BY qid ORDER BY s DESC, id)
       |               AS rk
       |      FROM sc WHERE s IS NOT NULL)""".stripMargin
  }

  /** Spell-correction mirror (naive levenshtein join on the tiny
    * query side; the Spark paths use SymSpell deletion blocking) —
    * shared by the on-the-fly and persisted-index forms, which are
    * equal by construction (SearchSpec pins it).
    */
  /** Truncated-Holt recursive chain ending in `f` (event_type, d,
    * l, b) with `dense` (the zero-filled daily grid) alive — shared
    * by the forecast surface and the head-to-head backtest so the
    * recursion cannot drift. Interpolated into outer stripMargin
    * strings: no continuation line starts with '|'.
    */
  private val holtCtes: String = Seq(
    "ev AS (SELECT event_type, CAST(ts AS DATE) - DATE '1970-01-01' " +
      "AS d FROM events)",
    "b AS (SELECT min(d) AS lo, max(d) AS hi FROM ev)",
    "cal AS (SELECT unnest(range(lo, hi + 1)) AS d FROM b)",
    "ty AS (SELECT DISTINCT event_type FROM ev)",
    "daily AS (SELECT event_type, d, CAST(count(*) AS BIGINT) AS n " +
      "FROM ev GROUP BY 1, 2)",
    "dense AS (SELECT ty.event_type, cal.d, coalesce(daily.n, 0) AS n " +
      "FROM ty CROSS JOIN cal LEFT JOIN daily " +
      "ON daily.event_type = ty.event_type AND daily.d = cal.d)",
    "w AS (SELECT a.event_type, a.d, list(r.n ORDER BY r.d) AS ws " +
      "FROM dense a JOIN dense r ON a.event_type = r.event_type " +
      "AND r.d BETWEEN a.d - 13 AND a.d GROUP BY 1, 2)",
    "rec AS (SELECT event_type, d, ws, 2 AS step, " +
      "ws[1] * 1000000 AS l, CAST(0 AS BIGINT) AS b FROM w " +
      "UNION ALL SELECT event_type, d, ws, step + 1, " +
      "(ws[step] * 1000000 + l + b + 1) // 2, " +
      "(((ws[step] * 1000000 + l + b + 1) // 2) - l + 3 * b + 2) // 4 " +
      "FROM rec WHERE step <= len(ws))",
    "f AS (SELECT event_type, d, l, b FROM rec WHERE step = len(ws) + 1)"
  ).mkString(",\n")

  /** Wildcard/prefix retrieval — shared by the on-the-fly and the
    * persisted-dictionary twins so the two cannot drift.
    */
  private val prefixOracle: String =
    """WITH p AS (SELECT * FROM (VALUES (0, 'sc'), (1, 'st'),
      |             (2, 'co'), (3, 'fas'), (4, 'sor'))
      |           AS t(qid, prefix)),
      |tf AS (SELECT doc_id, tok AS term, CAST(count(*) AS BIGINT)
      |         AS tf
      |       FROM (SELECT doc_id, unnest(string_split(text, ' '))
      |               AS tok FROM documents)
      |       GROUP BY 1, 2),
      |m AS (SELECT p.qid, p.prefix, tf.doc_id, tf.tf
      |      FROM tf JOIN p
      |        ON substr(tf.term, 1, 2) = substr(p.prefix, 1, 2)
      |       AND starts_with(tf.term, p.prefix)),
      |d AS (SELECT qid, prefix, doc_id,
      |        CAST(sum(tf) AS BIGINT) AS score,
      |        CAST(count(*) AS BIGINT) AS n_terms
      |      FROM m GROUP BY 1, 2, 3),
      |r AS (SELECT qid, prefix, doc_id, score, n_terms,
      |        CAST(row_number() OVER (PARTITION BY qid
      |          ORDER BY score DESC, doc_id) AS BIGINT) AS rk
      |      FROM d)
      |SELECT qid, prefix, rk, doc_id, score, n_terms
      |FROM r WHERE rk <= 10 ORDER BY qid, rk""".stripMargin

  private def spellOracle: String = {
    val pre =
      """tq(qid, pos, term) AS (SELECT * FROM (VALUES
        |    (0, 0, 'spark'), (0, 1, 'joim'), (0, 2, 'hash'),
        |    (1, 0, 'strean'), (1, 1, 'window'), (1, 2, 'batch'),
        |    (2, 0, 'dup'), (2, 1, 'vectar'), (2, 2, 'scan'),
        |    (3, 0, 'customer'), (3, 1, 'ordr'), (3, 2, 'value'),
        |    (4, 0, 'filtes'), (4, 1, 'sort'), (4, 2, 'merge'))),
        |vocab AS (SELECT t, CAST(count(*) AS BIGINT) AS dfreq FROM
        |    (SELECT DISTINCT doc_id, t FROM (SELECT doc_id,
        |       unnest(string_split(text, ' ')) AS t FROM documents))
        |    GROUP BY t),
        |fcand AS (SELECT q.qid, q.pos, v.t, v.dfreq
        |          FROM tq q JOIN vocab v
        |            ON levenshtein(v.t, q.term) = 1),
        |fbest AS (SELECT qid, pos, t FROM (SELECT qid, pos, t,
        |            row_number() OVER (PARTITION BY qid, pos
        |              ORDER BY dfreq DESC, t) AS rn FROM fcand)
        |          WHERE rn = 1),
        |corr0 AS (SELECT q.qid, q.pos,
        |            CASE WHEN v0.t IS NOT NULL THEN q.term
        |                 ELSE coalesce(b.t, q.term) END AS corr
        |          FROM tq q
        |          LEFT JOIN (SELECT DISTINCT t FROM vocab) v0
        |            ON v0.t = q.term
        |          LEFT JOIN fbest b
        |            ON b.qid = q.qid AND b.pos = q.pos),
        |qc AS (SELECT CAST(qid AS BIGINT) AS qid,
        |         string_agg(corr, ' ' ORDER BY pos) AS qtext
        |       FROM corr0 GROUP BY qid),
        |""".stripMargin
    s"""WITH ${bm25CtesQ("", "SELECT qid, qtext FROM qc", pre)}
       |SELECT qid, rk, doc_id, score FROM r WHERE rk <= 10
       |ORDER BY qid, rk""".stripMargin
  }

  /** The health-dashboard capstone composes five member oracles as
    * subqueries of the SAME strings the members register — the
    * composition cannot drift from its parts by construction.
    */
  def oracleSql: Map[String, String] = {
    val base = oracleSqlBase
    def sub(n: String) = s"(${base(n)})"
    base + ("sketch_error_report" ->
      s"""WITH ex AS (SELECT event_type,
         |        CAST(count(DISTINCT user_id) AS BIGINT)
         |          AS exact_distinct
         |      FROM events GROUP BY 1)
         |SELECT ex.event_type, ex.exact_distinct,
         |       k.est_distinct AS kmv_est,
         |       round((k.est_distinct - ex.exact_distinct)
         |         / ex.exact_distinct, 6) AS kmv_rel_err,
         |       h.est_distinct AS hll_est,
         |       round((h.est_distinct - ex.exact_distinct)
         |         / ex.exact_distinct, 6) AS hll_rel_err
         |FROM ex
         |JOIN (${base("sketch_kmv_distinct")}) k
         |  ON ex.event_type = k.event_type
         |JOIN (${base("sketch_hll_distinct")}) h
         |  ON ex.event_type = h.event_type
         |ORDER BY ex.event_type""".stripMargin) +
    ("events_health_dashboard" ->
      s"""SELECT f.event_type, f.n_days, m.n AS n_events, f.mean_daily,
         |       f.fano, m.skewness, m.kurtosis, p.max_ph, p.n_alarms,
         |       k.ks_stat, w.z AS mw_z
         |FROM ${sub("events_fano")} f
         |JOIN ${sub("events_moments")} m ON f.event_type = m.event_type
         |JOIN ${sub("events_page_hinkley")} p
         |  ON f.event_type = p.event_type
         |JOIN ${sub("events_ks_test")} k ON f.event_type = k.event_type
         |JOIN ${sub("events_mann_whitney")} w
         |  ON f.event_type = w.event_type
         |ORDER BY f.event_type""".stripMargin) +
    // anomaly consensus: the three detectors' SHIPPED result sets
    // full-outer voted — cannot disagree with its members
    ("events_anomaly_consensus" ->
      s"""SELECT event_type, day, votes FROM (
         |  SELECT event_type, day,
         |    CAST((CASE WHEN z.zscore IS NOT NULL THEN 1 ELSE 0 END)
         |      + (CASE WHEN m.robust_z IS NOT NULL THEN 1 ELSE 0 END)
         |      + (CASE WHEN o.zscore IS NOT NULL THEN 1 ELSE 0 END)
         |      AS BIGINT) AS votes
         |  FROM ${sub("events_anomaly")} z
         |  FULL OUTER JOIN ${sub("events_anomaly_mad")} m
         |    USING (event_type, day)
         |  FULL OUTER JOIN ${sub("events_anomaly_online")} o
         |    USING (event_type, day))
         |WHERE votes >= 2 ORDER BY event_type, day""".stripMargin)
  }

  private def oracleSqlBase: Map[String, String] = Map(
    // flat PQ (Pq.pqSearchWith, k=10 rerank=4): LUT-ADC shortlist of
    // 40 per query (per-(sub, codeword) squared partials, summed
    // across subspaces in sub order — the VecL2PqLut fold), exact
    // float L2 rerank
    "vdb_knn_pq" ->
      s"""WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
         |q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 5),
         |$pqCtes,
         |plut AS (SELECT q.qid, cb.sub, cb.cid,
         |           list_inner_product(
         |             list_transform(range(1, 9), j -> q.qv[cb.sub*8 + j] - cb.cw[j]),
         |             list_transform(range(1, 9), j -> q.qv[cb.sub*8 + j] - cb.cw[j]))
         |             AS lv
         |         FROM pcb2 cb CROSS JOIN q),
         |ad AS (SELECT p.qid, a.id,
         |              sqrt(list_sum(list(p.lv ORDER BY p.sub))) AS ad
         |       FROM paf a JOIN plut p ON a.sub = p.sub AND a.cid = p.cid
         |       GROUP BY p.qid, a.id),
         |sl AS (SELECT qid, id FROM (SELECT qid, id,
         |         row_number() OVER (PARTITION BY qid ORDER BY ad, id) AS r
         |       FROM ad) WHERE r <= 40),
         |rr AS (SELECT sl.qid, sl.id, list_distance(e.v, q.qv) AS s
         |       FROM sl JOIN e ON sl.id = e.id JOIN q ON sl.qid = q.qid),
         |rk AS (SELECT qid, id, s,
         |              row_number() OVER (PARTITION BY qid ORDER BY s, id) AS rk
         |       FROM rr WHERE s IS NOT NULL)
         |SELECT qid, rk, id AS nn_id, round(s, 4) AS score
         |FROM rk WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,
    // IVFPQ (Pq.ivfPqSearch, k=10 nprobe=2 rerank=4, by_residual=false):
    // the IVF probe set over cells, an ADC-COSINE shortlist of 40 per
    // query within probed cells (VecCosinePqAdc's dot/norm fold), then
    // the exact cosine rerank.
    "ann_ivf_pq" ->
      s"""WITH $ivfCtes,
         |$pqCtes,
         |pd AS (SELECT pr.qid, a.id,
         |         list_inner_product(q.qv, r.rv)
         |           / (sqrt(list_inner_product(q.qv, q.qv))
         |              * sqrt(list_inner_product(r.rv, r.rv))) AS pcos
         |       FROM af a JOIN pr ON a.cell = pr.cell
         |            JOIN q ON pr.qid = q.qid JOIN prec r ON a.id = r.id),
         |sl AS (SELECT qid, id FROM (SELECT qid, id,
         |         row_number() OVER (PARTITION BY qid ORDER BY pcos DESC, id) AS rn
         |       FROM pd WHERE pcos IS NOT NULL) WHERE rn <= 40),
         |rr AS (SELECT sl.qid, sl.id, list_cosine_similarity(e.v, q.qv) AS s
         |       FROM sl JOIN e ON sl.id = e.id JOIN q ON sl.qid = q.qid),
         |rk AS (SELECT qid, id, s,
         |              row_number() OVER (PARTITION BY qid ORDER BY s DESC, id) AS rk
         |       FROM rr WHERE s IS NOT NULL)
         |SELECT qid, rk, id AS nn_id, round(s, 4) AS score
         |FROM rk WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,
    // residual IVFPQ (Pq.ivfPqResSearch, by_residual=true — the FAISS
    // default): PQ trained on float-round-tripped cell residuals,
    // per-(query, probed cell) query residual into the flat-fold L2
    // ADC, exact float L2 rerank
    "ann_ivf_pq_res" ->
      s"""WITH $ivfCtes,
         |er AS (SELECT af.id, list_transform(range(1, 65),
         |         j -> CAST(CAST(af.v[j] - cv.cv[j] AS FLOAT) AS DOUBLE))
         |         AS v
         |       FROM af JOIN c2 cv ON af.cell = cv.cell),
         |${pqCtesSrc("er")},
         |qr AS (SELECT pr.qid, pr.cell, list_transform(range(1, 65),
         |         j -> q.qv[j] - cv.cv[j]) AS qres
         |       FROM pr JOIN q ON pr.qid = q.qid
         |            JOIN c2 cv ON pr.cell = cv.cell),
         |ad AS (SELECT qr.qid, a.id,
         |         sqrt(${pqSqDist("qr.qres", "r.rv", 65)}) AS ad
         |       FROM af a JOIN qr ON a.cell = qr.cell
         |            JOIN prec r ON a.id = r.id),
         |sl AS (SELECT qid, id FROM (SELECT qid, id,
         |         row_number() OVER (PARTITION BY qid ORDER BY ad, id) AS rn
         |       FROM ad WHERE ad IS NOT NULL) WHERE rn <= 40),
         |rr AS (SELECT sl.qid, sl.id, list_distance(e.v, q.qv) AS s
         |       FROM sl JOIN e ON sl.id = e.id JOIN q ON sl.qid = q.qid),
         |rk AS (SELECT qid, id, s,
         |              row_number() OVER (PARTITION BY qid ORDER BY s, id) AS rk
         |       FROM rr WHERE s IS NOT NULL)
         |SELECT qid, rk, id AS nn_id, round(s, 4) AS score
         |FROM rk WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,
    "ann_ivf" -> ivfOracle,
    // spilled 2-cell assignment, single-cell probe (SOAR trade)
    "ann_ivf_spill" ->
      s"""WITH $ivfCtes,
         |asp AS (SELECT id, v, cell FROM (SELECT e.id, e.v, c.cell,
         |    row_number() OVER (PARTITION BY e.id
         |      ORDER BY ${ivfCd("e.v", "c.cv")}, c.cell) AS rn
         |  FROM e CROSS JOIN c2 c) WHERE rn <= 2),
         |p1 AS (SELECT qid, cell FROM (SELECT q.qid, c.cell,
         |    row_number() OVER (PARTITION BY q.qid
         |      ORDER BY ${ivfCd("q.qv", "c.cv")}, c.cell) AS rn
         |  FROM q CROSS JOIN c2 c) WHERE rn = 1),
         |spsc AS (SELECT p1.qid, a.id,
         |    list_cosine_similarity(a.v, q.qv) AS s
         |  FROM asp a JOIN p1 ON a.cell = p1.cell
         |  JOIN q ON p1.qid = q.qid),
         |spr AS (SELECT qid, id, s, row_number() OVER (PARTITION BY qid
         |    ORDER BY s DESC, id) AS rk
         |  FROM spsc WHERE s IS NOT NULL)
         |SELECT qid, rk, id AS nn_id, round(s, 4) AS score
         |FROM spr WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,
    // range search through the index: probed cells' members at
    // cosine >= 0.25 — no rank, no heap; subset-of-flat pinned in spec
    "ann_ivf_range" ->
      s"""WITH $ivfCtes,
         |sc AS (SELECT pr.qid, a.id, list_cosine_similarity(a.v, q.qv) AS s
         |       FROM af a JOIN pr ON a.cell = pr.cell JOIN q ON pr.qid = q.qid)
         |SELECT qid, id AS nn_id, round(s, 4) AS score
         |FROM sc WHERE s IS NOT NULL AND s >= 0.25
         |ORDER BY qid, nn_id""".stripMargin,
    "ann_nsw" -> nswOracle,
    // filtered graph search: rank the filter-passing VISITED set
    // (bf0 ∪ bc1..3 — every id any beam round scored)
    "ann_nsw_filtered" ->
      s"""WITH $ivfGraphCtes,
         |${nswBeamCtes("vec_id < 5")},
         |vis AS (SELECT DISTINCT qid, id FROM (
         |    SELECT qid, id FROM bf0 UNION ALL SELECT qid, id FROM bc1
         |    UNION ALL SELECT qid, id FROM bc2
         |    UNION ALL SELECT qid, id FROM bc3)),
         |alw AS (SELECT vec_id AS id FROM embeddings WHERE label = 5),
         |fsc AS (SELECT v.qid, v.id,
         |          list_cosine_similarity(e.v, qq.qv) AS s
         |        FROM vis v JOIN alw ON v.id = alw.id
         |             JOIN e ON v.id = e.id JOIN qq ON v.qid = qq.qid)
         |SELECT qid, rk, id AS nn_id, round(s, 4) AS score
         |FROM (SELECT *, row_number() OVER (PARTITION BY qid
         |        ORDER BY s DESC, id) AS rk
         |      FROM fsc WHERE s IS NOT NULL)
         |WHERE rk <= 5 ORDER BY qid, rk""".stripMargin,
    "ann_hnsw" -> hnswOracle,
    // recall trio completion: hierarchical path vs the brute scan
    "hnsw_recall_report" ->
      s"""WITH $ivfGraphCtes,
         |${hnswBeamCtes("vec_id < 5")},
         |hv AS (SELECT qid, id FROM (SELECT *, row_number() OVER (
         |         PARTITION BY qid ORDER BY s DESC, id) AS rk
         |       FROM hbf3) WHERE rk <= 10),
         |bd AS (SELECT qq.qid, e2.id,
         |         list_cosine_similarity(e2.v, qq.qv) AS s
         |       FROM e e2 CROSS JOIN qq),
         |br AS (SELECT qid, id, s, row_number() OVER (PARTITION BY qid
         |         ORDER BY s DESC, id) AS rk
         |       FROM bd WHERE s IS NOT NULL),
         |bff AS (SELECT qid, id FROM br WHERE rk <= 10),
         |h AS (SELECT hv.qid, CAST(count(*) AS BIGINT) AS hits
         |      FROM hv JOIN bff ON hv.qid = bff.qid AND hv.id = bff.id
         |      GROUP BY 1)
         |SELECT qid, hits, round(hits / 10.0, 4) AS recall
         |FROM h ORDER BY qid""".stripMargin,
    // persisted hierarchy: same centroids, same edge rule, searched
    // partition-pruned — shares the in-memory descent's mirror
    // (HnswIndexSpec pins the path equality)
    "ann_hnsw_indexed" -> hnswOracle,
    // filtered hierarchical search: rank the filter-passing VISITED
    // set of the whole descent (entry ∪ layer expands ∪ base expands)
    "ann_hnsw_filtered" ->
      s"""WITH $ivfGraphCtes,
         |${hnswBeamCtes("vec_id < 5")},
         |vis AS (SELECT DISTINCT qid, id FROM (
         |    SELECT qid, id FROM hf5 UNION ALL SELECT qid, id FROM hc4
         |    UNION ALL SELECT qid, id FROM hc3
         |    UNION ALL SELECT qid, id FROM hc2
         |    UNION ALL SELECT qid, id FROM hc1
         |    UNION ALL SELECT qid, id FROM hbc1
         |    UNION ALL SELECT qid, id FROM hbc2
         |    UNION ALL SELECT qid, id FROM hbc3)),
         |alw AS (SELECT vec_id AS id FROM embeddings WHERE label = 5),
         |fsc AS (SELECT v.qid, v.id,
         |          list_cosine_similarity(e.v, qq.qv) AS s
         |        FROM vis v JOIN alw ON v.id = alw.id
         |             JOIN e ON v.id = e.id JOIN qq ON v.qid = qq.qid)
         |SELECT qid, rk, id AS nn_id, round(s, 4) AS score
         |FROM (SELECT *, row_number() OVER (PARTITION BY qid
         |        ORDER BY s DESC, id) AS rk
         |      FROM fsc WHERE s IS NOT NULL)
         |WHERE rk <= 5 ORDER BY qid, rk""".stripMargin,
    // corpus-wide kNN graph over the shared IVF chain, self excluded
    "knn_graph" ->
      s"""WITH $ivfGraphCtes
         |SELECT qid, rk, id AS nn_id, round(s, 4) AS score
         |FROM gr WHERE rk <= 5 ORDER BY qid, rk""".stripMargin,
    // TwoNN: μ = d₂/d₁ off the graph's 4dp-pinned cosine scores
    // (d = √(2·(1−s))); exact-dup anchors (s1 = 1) filtered on the
    // rounded score; quartiles only — no libm ln transform
    "embed_twonn_dim" ->
      s"""WITH $ivfGraphCtes,
         |e2 AS (SELECT qid,
         |         max(CASE WHEN rk = 1 THEN round(s, 4) END) AS s1,
         |         max(CASE WHEN rk = 2 THEN round(s, 4) END) AS s2
         |       FROM gr WHERE rk <= 2 GROUP BY 1),
         |m AS (SELECT round(sqrt((2.0 * (1.0 - s2))
         |          / (2.0 * (1.0 - s1))), 4) AS mu
         |      FROM e2 WHERE s1 < 1.0 AND s2 IS NOT NULL)
         |SELECT CAST(count(*) AS BIGINT) AS n_points,
         |       round(quantile_cont(mu, 0.25), 4) AS mu_p25,
         |       round(quantile_cont(mu, 0.5), 4) AS mu_med,
         |       round(quantile_cont(mu, 0.75), 4) AS mu_p75
         |FROM m""".stripMargin,
    // PageRank centrality over the kNN graph: 3 unrolled
    // integer-exact power iterations (S_{t+1} = 180·1200^t +
    // Σ S_t·(1020//deg)), one float division at the end — the
    // integer scaling is what makes the iteration oracle-matchable
    "graph_centrality" ->
      s"""WITH $ivfGraphCtes,
         |g AS (SELECT qid, id FROM gr WHERE rk <= 5),
         |dg AS (SELECT qid, CAST(count(*) AS BIGINT) AS d
         |       FROM g GROUP BY 1),
         |ew AS (SELECT g.qid, g.id, CAST(1020 // dg.d AS BIGINT) AS w
         |       FROM g JOIN dg USING (qid)),
         |nd AS (SELECT vec_id AS id FROM embeddings),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nd),
         |st0 AS (SELECT id, CAST(1 AS BIGINT) AS s FROM nd),
         |ct1 AS (SELECT ew.id, CAST(sum(st0.s * ew.w) AS BIGINT) AS c
         |       FROM ew JOIN st0 ON st0.id = ew.qid GROUP BY 1),
         |st1 AS (SELECT nd.id, 180 + COALESCE(ct1.c, 0) AS s
         |       FROM nd LEFT JOIN ct1 USING (id)),
         |ct2 AS (SELECT ew.id, CAST(sum(st1.s * ew.w) AS BIGINT) AS c
         |       FROM ew JOIN st1 ON st1.id = ew.qid GROUP BY 1),
         |st2 AS (SELECT nd.id, 216000 + COALESCE(ct2.c, 0) AS s
         |       FROM nd LEFT JOIN ct2 USING (id)),
         |ct3 AS (SELECT ew.id, CAST(sum(st2.s * ew.w) AS BIGINT) AS c
         |       FROM ew JOIN st2 ON st2.id = ew.qid GROUP BY 1),
         |st3 AS (SELECT nd.id, 259200000 + COALESCE(ct3.c, 0) AS s
         |       FROM nd LEFT JOIN ct3 USING (id))
         |SELECT st3.id AS vec_id,
         |       round(CAST(st3.s AS DOUBLE)
         |             / (CAST(nn.n AS DOUBLE) * 1728000000), 6)
         |         AS centrality
         |FROM st3, nn ORDER BY vec_id""".stripMargin,
    // components of the mutual-kNN graph (embedding-space dedup
    // clusters): the same recursive closure the minhash clusters use
    "embed_knn_clusters" ->
      s"""WITH RECURSIVE $ivfGraphCtes,
         |g AS (SELECT qid, id FROM gr WHERE rk <= 5),
         |pairs AS (SELECT g1.qid AS id1, g1.id AS id2
         |          FROM g g1 JOIN g g2 ON g1.qid = g2.id AND g1.id = g2.qid
         |          WHERE g1.qid < g1.id),
         |$closureCte
         |SELECT id AS vec_id, min(r) AS cluster_id
         |FROM reach GROUP BY id ORDER BY vec_id""".stripMargin,
    // mutual edges of that graph, canonical a < b orientation
    "mutual_knn_pairs" ->
      s"""WITH $ivfGraphCtes,
         |g AS (SELECT qid, id, round(s, 4) AS score FROM gr WHERE rk <= 5)
         |SELECT g1.qid AS id_a, g1.id AS id_b, g1.score
         |FROM g g1 JOIN g g2 ON g1.qid = g2.id AND g1.id = g2.qid
         |WHERE g1.qid < g1.id ORDER BY id_a, id_b""".stripMargin,
    // triangles as ordered triples a<b<c over the canonical mutual
    // edges; coefficient from integer (triangles, degree)
    // Adamic-Adar link prediction: wedges over the symmetric mutual
    // edge list, existing edges anti-joined away, 1/ln(degree)
    // summed per common neighbor
    // Newman modularity per dup-cluster community: exact integer
    // moments (m, internal edges, degree sums) over the mutual graph
    "graph_modularity" ->
      s"""WITH RECURSIVE $ivfGraphCtes,
         |g AS (SELECT qid, id FROM gr WHERE rk <= 5),
         |pairs AS (SELECT g1.qid AS id1, g1.id AS id2
         |          FROM g g1 JOIN g g2 ON g1.qid = g2.id AND g1.id = g2.qid
         |          WHERE g1.qid < g1.id),
         |$closureCte,
         |cl AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id),
         |m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM pairs),
         |wc AS (SELECT p.id1, p.id2, c1.cluster_id AS ca,
         |         c2.cluster_id AS cb
         |       FROM pairs p JOIN cl c1 ON p.id1 = c1.id
         |       JOIN cl c2 ON p.id2 = c2.id),
         |mi AS (SELECT ca AS cluster_id, CAST(count(*) AS BIGINT) AS m_in
         |       FROM wc WHERE ca = cb GROUP BY 1),
         |sym AS (SELECT id1 AS a FROM pairs
         |        UNION ALL SELECT id2 FROM pairs),
         |dg AS (SELECT a AS id, CAST(count(*) AS BIGINT) AS d
         |       FROM sym GROUP BY 1),
         |dc AS (SELECT cl.cluster_id, CAST(count(*) AS BIGINT) AS n_nodes,
         |         CAST(sum(dg.d) AS BIGINT) AS d_sum
         |       FROM cl JOIN dg ON cl.id = dg.id GROUP BY 1)
         |SELECT dc.cluster_id, dc.n_nodes,
         |       CAST(coalesce(mi.m_in, 0) AS BIGINT) AS m_in, dc.d_sum,
         |       round(CAST(coalesce(mi.m_in, 0) AS DOUBLE) / m.m
         |         - (CAST(dc.d_sum AS DOUBLE) / (2 * m.m))
         |           * (CAST(dc.d_sum AS DOUBLE) / (2 * m.m)), 4) AS q_c
         |FROM dc LEFT JOIN mi USING (cluster_id) CROSS JOIN m
         |ORDER BY cluster_id""".stripMargin,
    // conductance: crossing edges counted once per SIDE, guarded
    // min-volume division (whole-graph cluster -> NULL)
    "graph_conductance" ->
      s"""WITH RECURSIVE $ivfGraphCtes,
         |g AS (SELECT qid, id FROM gr WHERE rk <= 5),
         |pairs AS (SELECT g1.qid AS id1, g1.id AS id2
         |          FROM g g1 JOIN g g2 ON g1.qid = g2.id AND g1.id = g2.qid
         |          WHERE g1.qid < g1.id),
         |$closureCte,
         |cl AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id),
         |m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM pairs),
         |wc AS (SELECT p.id1, p.id2, c1.cluster_id AS ca,
         |         c2.cluster_id AS cb
         |       FROM pairs p JOIN cl c1 ON p.id1 = c1.id
         |       JOIN cl c2 ON p.id2 = c2.id),
         |cut AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cut_edges
         |        FROM (SELECT ca AS cluster_id FROM wc WHERE ca <> cb
         |              UNION ALL SELECT cb FROM wc WHERE ca <> cb)
         |        GROUP BY 1),
         |sym AS (SELECT id1 AS a FROM pairs
         |        UNION ALL SELECT id2 FROM pairs),
         |dg AS (SELECT a AS id, CAST(count(*) AS BIGINT) AS d
         |       FROM sym GROUP BY 1),
         |dc AS (SELECT cl.cluster_id, CAST(count(*) AS BIGINT) AS n_nodes,
         |         CAST(sum(dg.d) AS BIGINT) AS vol
         |       FROM cl JOIN dg ON cl.id = dg.id GROUP BY 1)
         |SELECT dc.cluster_id, dc.n_nodes, dc.vol,
         |       CAST(coalesce(cut.cut_edges, 0) AS BIGINT) AS cut_edges,
         |       CASE WHEN least(dc.vol, 2 * m.m - dc.vol) > 0
         |         THEN round(CAST(coalesce(cut.cut_edges, 0) AS DOUBLE)
         |           / least(dc.vol, 2 * m.m - dc.vol), 4)
         |         ELSE NULL END AS conductance
         |FROM dc LEFT JOIN cut USING (cluster_id) CROSS JOIN m
         |ORDER BY cluster_id""".stripMargin,
    // graph quality: measured recall of the IVF-blocked kNN graph
    // vs the exact kNN on the vec_id < 50 sample
    "knn_graph_recall" ->
      s"""WITH $ivfGraphCtes,
         |ap AS (SELECT qid, id FROM gr WHERE rk <= 5 AND qid < 50),
         |qs AS (SELECT qid, qv FROM q WHERE qid < 50),
         |bd AS (SELECT qs.qid, e2.id,
         |         list_cosine_similarity(e2.v, qs.qv) AS s
         |       FROM e e2 CROSS JOIN qs WHERE e2.id <> qs.qid),
         |br AS (SELECT qid, id, s, row_number() OVER (PARTITION BY qid
         |         ORDER BY s DESC, id) AS rk
         |       FROM bd WHERE s IS NOT NULL),
         |ex AS (SELECT qid, id FROM br WHERE rk <= 5),
         |h AS (SELECT CAST(count(*) AS BIGINT) AS n_hits
         |      FROM ap JOIN ex ON ap.qid = ex.qid AND ap.id = ex.id),
         |ne AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM ap),
         |nx AS (SELECT CAST(count(*) AS BIGINT) AS n_exact FROM ex)
         |SELECT CAST(50 AS BIGINT) AS n_queries, ne.n_edges, nx.n_exact,
         |       h.n_hits,
         |       round(CAST(h.n_hits AS DOUBLE) / nx.n_exact, 4) AS recall
         |FROM h CROSS JOIN ne CROSS JOIN nx""".stripMargin,
    "graph_adamic_adar" ->
      s"""WITH $ivfGraphCtes,
         |g AS (SELECT qid, id FROM gr WHERE rk <= 5),
         |mu AS (SELECT g1.qid AS id_a, g1.id AS id_b
         |       FROM g g1 JOIN g g2 ON g1.qid = g2.id AND g1.id = g2.qid
         |       WHERE g1.qid < g1.id),
         |sym AS (SELECT id_a AS a, id_b AS b FROM mu
         |        UNION ALL SELECT id_b, id_a FROM mu),
         |dg AS (SELECT a AS id, CAST(count(*) AS BIGINT) AS d
         |       FROM sym GROUP BY 1),
         |wedge AS (SELECT e1.a AS a, e1.b AS b, e2.b AS c
         |          FROM sym e1 JOIN sym e2 ON e1.b = e2.a
         |          WHERE e1.a < e2.b),
         |cand AS (SELECT w.a, w.b, w.c FROM wedge w
         |         WHERE NOT EXISTS (SELECT 1 FROM mu
         |           WHERE mu.id_a = w.a AND mu.id_b = w.c))
         |SELECT cand.a AS id_a, cand.c AS id_b,
         |       CAST(count(*) AS BIGINT) AS n_common,
         |       round(sum(CAST(1 AS DOUBLE) / ln(dg.d)), 4) AS aa_score
         |FROM cand JOIN dg ON dg.id = cand.b
         |GROUP BY 1, 2 ORDER BY id_a, id_b""".stripMargin,
    // kNN label purity: neighborhood coherence per label
    "embed_knn_purity" ->
      s"""WITH $ivfGraphCtes,
         |g AS (SELECT qid, id FROM gr WHERE rk <= 5),
         |lb AS (SELECT vec_id, label FROM embeddings),
         |j AS (SELECT la.label AS ql, lb2.label AS nl
         |      FROM g JOIN lb la ON g.qid = la.vec_id
         |      JOIN lb lb2 ON g.id = lb2.vec_id)
         |SELECT ql AS label, CAST(count(*) AS BIGINT) AS n_edges,
         |       CAST(sum(CASE WHEN nl = ql THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_same,
         |       round(CAST(sum(CASE WHEN nl = ql THEN 1 ELSE 0 END)
         |           AS DOUBLE) / count(*), 4) AS purity
         |FROM j GROUP BY 1 ORDER BY label""".stripMargin,
    // LOF: micro-quantized reach distances, integer k-dist max,
    // ppm-quantized lrd ratios — no order-dependent float aggregate
    "embed_lof" ->
      s"""WITH $ivfGraphCtes,
         |g AS (SELECT qid, id,
         |        CAST(round((1 - round(s, 4)) * 1000000) AS BIGINT)
         |          AS dm
         |      FROM gr WHERE rk <= 5),
         |kd AS (SELECT qid AS id, CAST(max(dm) AS BIGINT) AS kdist
         |       FROM g GROUP BY 1),
         |sr AS (SELECT g.qid,
         |         CAST(sum(greatest(kd.kdist, g.dm)) AS BIGINT)
         |           AS sum_reach
         |       FROM g JOIN kd ON g.id = kd.id GROUP BY 1),
         |rat AS (SELECT g.qid,
         |          (sa.sum_reach * 1000000) // sb.sum_reach AS r
         |        FROM g JOIN sr sa ON g.qid = sa.qid
         |        JOIN sr sb ON g.id = sb.qid
         |        WHERE sb.sum_reach > 0)
         |SELECT qid AS vec_id,
         |       round(CAST(sum(r) AS DOUBLE)
         |         / CAST(count(*) * 1000000 AS DOUBLE), 4) AS lof
         |FROM rat GROUP BY 1 ORDER BY vec_id""".stripMargin,
    // k-occurrence histogram with the antihub zero bucket anchored
    "knn_hubness" ->
      s"""WITH $ivfGraphCtes,
         |g AS (SELECT qid, id FROM gr WHERE rk <= 5),
         |ind AS (SELECT id, CAST(count(*) AS BIGINT) AS indeg
         |        FROM g GROUP BY 1),
         |nd AS (SELECT vec_id AS id FROM embeddings),
         |pt AS (SELECT coalesce(ind.indeg, 0) AS indeg
         |       FROM nd LEFT JOIN ind ON nd.id = ind.id)
         |SELECT indeg, CAST(count(*) AS BIGINT) AS n_points
         |FROM pt GROUP BY 1 ORDER BY indeg""".stripMargin,
    // HITS: two integer mutual-recursion rounds, one max-division
    "graph_hits" ->
      s"""WITH $ivfGraphCtes,
         |g AS (SELECT qid, id FROM gr WHERE rk <= 5),
         |ha1 AS (SELECT id, CAST(count(*) AS BIGINT) AS a1
         |        FROM g GROUP BY 1),
         |hh1 AS (SELECT g.qid, CAST(sum(ha1.a1) AS BIGINT) AS h1
         |        FROM g JOIN ha1 ON g.id = ha1.id GROUP BY 1),
         |ha2 AS (SELECT g.id, CAST(sum(hh1.h1) AS BIGINT) AS a2
         |        FROM g JOIN hh1 ON g.qid = hh1.qid GROUP BY 1),
         |hh2 AS (SELECT g.qid, CAST(sum(ha2.a2) AS BIGINT) AS h2
         |        FROM g JOIN ha2 ON g.id = ha2.id GROUP BY 1),
         |hmx AS (SELECT (SELECT max(a2) FROM ha2) AS ma,
         |               (SELECT max(h2) FROM hh2) AS mh),
         |nd AS (SELECT vec_id AS id FROM embeddings)
         |SELECT nd.id AS vec_id,
         |       round(CAST(coalesce(ha2.a2, 0) AS DOUBLE) / hmx.ma, 6)
         |         AS authority,
         |       round(CAST(coalesce(hh2.h2, 0) AS DOUBLE) / hmx.mh, 6)
         |         AS hub
         |FROM nd LEFT JOIN ha2 ON nd.id = ha2.id
         |LEFT JOIN hh2 ON nd.id = hh2.qid
         |CROSS JOIN hmx ORDER BY vec_id""".stripMargin,
    // SOAR trade: recall@10 + scan cost for ivf@p1 / ivf@p2 /
    // spill@p1 over the shared chain; hit counts vs brute top-10
    "ann_spill_recall" ->
      s"""WITH $ivfCtes,
         |p1 AS (SELECT qid, cell FROM (SELECT q.qid, c.cell,
         |    row_number() OVER (PARTITION BY q.qid
         |      ORDER BY ${ivfCd("q.qv", "c.cv")}, c.cell) AS rn
         |  FROM q CROSS JOIN c2 c) WHERE rn = 1),
         |asp AS (SELECT id, v, cell FROM (SELECT e.id, e.v, c.cell,
         |    row_number() OVER (PARTITION BY e.id
         |      ORDER BY ${ivfCd("e.v", "c.cv")}, c.cell) AS rn
         |  FROM e CROSS JOIN c2 c) WHERE rn <= 2),
         |nqx AS (SELECT CAST(count(*) AS BIGINT) AS nq FROM q),
         |xr AS (SELECT qid, id FROM (SELECT q.qid, e.id,
         |    row_number() OVER (PARTITION BY q.qid
         |      ORDER BY list_cosine_similarity(e.v, q.qv) DESC, e.id)
         |      AS rk
         |  FROM e CROSS JOIN q) WHERE rk <= 10),
         |r1 AS (SELECT qid, id FROM (SELECT p1.qid, a.id,
         |    row_number() OVER (PARTITION BY p1.qid
         |      ORDER BY list_cosine_similarity(a.v, q.qv) DESC, a.id)
         |      AS rk
         |  FROM af a JOIN p1 ON a.cell = p1.cell
         |  JOIN q ON p1.qid = q.qid
         |  WHERE list_cosine_similarity(a.v, q.qv) IS NOT NULL)
         |  WHERE rk <= 10),
         |r2 AS (SELECT qid, id FROM (SELECT pr.qid, a.id,
         |    row_number() OVER (PARTITION BY pr.qid
         |      ORDER BY list_cosine_similarity(a.v, q.qv) DESC, a.id)
         |      AS rk
         |  FROM af a JOIN pr ON a.cell = pr.cell
         |  JOIN q ON pr.qid = q.qid
         |  WHERE list_cosine_similarity(a.v, q.qv) IS NOT NULL)
         |  WHERE rk <= 10),
         |r3 AS (SELECT qid, id FROM (SELECT p1.qid, a.id,
         |    row_number() OVER (PARTITION BY p1.qid
         |      ORDER BY list_cosine_similarity(a.v, q.qv) DESC, a.id)
         |      AS rk
         |  FROM asp a JOIN p1 ON a.cell = p1.cell
         |  JOIN q ON p1.qid = q.qid
         |  WHERE list_cosine_similarity(a.v, q.qv) IS NOT NULL)
         |  WHERE rk <= 10),
         |h1 AS (SELECT CAST(count(*) AS BIGINT) AS h
         |       FROM r1 JOIN xr USING (qid, id)),
         |h2 AS (SELECT CAST(count(*) AS BIGINT) AS h
         |       FROM r2 JOIN xr USING (qid, id)),
         |h3 AS (SELECT CAST(count(*) AS BIGINT) AS h
         |       FROM r3 JOIN xr USING (qid, id)),
         |cs AS (SELECT cell, CAST(count(*) AS BIGINT) AS cn
         |       FROM af GROUP BY 1),
         |css AS (SELECT cell, CAST(count(*) AS BIGINT) AS cn
         |        FROM asp GROUP BY 1),
         |s1 AS (SELECT CAST(sum(cn) AS BIGINT) AS sr
         |       FROM p1 JOIN cs USING (cell)),
         |s2 AS (SELECT CAST(sum(cn) AS BIGINT) AS sr
         |       FROM pr JOIN cs USING (cell)),
         |s3 AS (SELECT CAST(sum(cn) AS BIGINT) AS sr
         |       FROM p1 JOIN css USING (cell))
         |SELECT variant, n_queries, mean_recall, scanned_rows FROM (
         |  SELECT 'ivf_p1' AS variant, nq AS n_queries,
         |         round(CAST(h AS DOUBLE) / (10 * nq), 4) AS mean_recall,
         |         sr AS scanned_rows
         |  FROM h1, s1, nqx
         |  UNION ALL
         |  SELECT 'ivf_p2', nq, round(CAST(h AS DOUBLE) / (10 * nq), 4),
         |         sr
         |  FROM h2, s2, nqx
         |  UNION ALL
         |  SELECT 'spill_p1', nq, round(CAST(h AS DOUBLE) / (10 * nq), 4),
         |         sr
         |  FROM h3, s3, nqx)
         |ORDER BY variant""".stripMargin,
    // 2-core by unrolled peeling (8 rounds): the Spark side's exact
    // convergence stop makes extra mirror rounds the identity
    "graph_kcore" -> {
      // peel CTEs prefixed `k` — the shared IVF chain already owns
      // a1/a2 for its k-means assignment rounds
      val rounds = (1 to 8).map { i =>
        val p = s"ka${i - 1}"
        s"""ke$i AS (SELECT e.a, e.b FROM sym e
           |       JOIN $p x ON e.a = x.id JOIN $p y ON e.b = y.id),
           |ka$i AS (SELECT a AS id FROM ke$i GROUP BY a
           |       HAVING count(*) >= 2)""".stripMargin
      }.mkString(",\n")
      s"""WITH $ivfGraphCtes,
         |g AS (SELECT qid, id FROM gr WHERE rk <= 5),
         |mu AS (SELECT g1.qid AS id_a, g1.id AS id_b
         |       FROM g g1 JOIN g g2 ON g1.qid = g2.id AND g1.id = g2.qid
         |       WHERE g1.qid < g1.id),
         |sym AS (SELECT id_a AS a, id_b AS b FROM mu
         |        UNION ALL SELECT id_b, id_a FROM mu),
         |ka0 AS (SELECT DISTINCT a AS id FROM sym),
         |$rounds,
         |fin AS (SELECT e.a FROM sym e
         |        JOIN ka8 x ON e.a = x.id JOIN ka8 y ON e.b = y.id)
         |SELECT a AS vec_id, CAST(count(*) AS BIGINT) AS core_degree
         |FROM fin GROUP BY 1 ORDER BY vec_id""".stripMargin
    },
    // bounded BFS: unrolled frontier⋈edges rounds with a min-dist
    // collapse per round; sources = graph nodes with id < 20
    "graph_bfs_hist" -> {
      val rounds = (1 to 4).map { i =>
        s"""bn$i AS (SELECT v.src, e.b AS node, $i AS dist
           |       FROM bv${i - 1} v JOIN sym e ON v.node = e.a
           |       WHERE v.dist = ${i - 1}),
           |bv$i AS (SELECT src, node, CAST(min(dist) AS BIGINT) AS dist
           |       FROM (SELECT src, node, dist FROM bv${i - 1}
           |             UNION ALL SELECT src, node, dist FROM bn$i)
           |       GROUP BY 1, 2)""".stripMargin
      }.mkString(",\n")
      s"""WITH $ivfGraphCtes,
         |g AS (SELECT qid, id FROM gr WHERE rk <= 5),
         |mu AS (SELECT g1.qid AS id_a, g1.id AS id_b
         |       FROM g g1 JOIN g g2 ON g1.qid = g2.id AND g1.id = g2.qid
         |       WHERE g1.qid < g1.id),
         |sym AS (SELECT id_a AS a, id_b AS b FROM mu
         |        UNION ALL SELECT id_b, id_a FROM mu),
         |bv0 AS (SELECT DISTINCT a AS src, a AS node,
         |          CAST(0 AS BIGINT) AS dist
         |        FROM sym WHERE a < 20),
         |$rounds
         |SELECT dist, CAST(count(*) AS BIGINT) AS n_pairs
         |FROM bv4 WHERE dist > 0 GROUP BY 1 ORDER BY dist""".stripMargin
    },
    // neighbor-Jaccard link prediction: the AA wedge chain with both
    // endpoints' degrees in the denominator
    "graph_jaccard_lp" ->
      s"""WITH $ivfGraphCtes,
         |g AS (SELECT qid, id FROM gr WHERE rk <= 5),
         |mu AS (SELECT g1.qid AS id_a, g1.id AS id_b
         |       FROM g g1 JOIN g g2 ON g1.qid = g2.id AND g1.id = g2.qid
         |       WHERE g1.qid < g1.id),
         |sym AS (SELECT id_a AS a, id_b AS b FROM mu
         |        UNION ALL SELECT id_b, id_a FROM mu),
         |dg AS (SELECT a AS id, CAST(count(*) AS BIGINT) AS d
         |       FROM sym GROUP BY 1),
         |wedge AS (SELECT e1.a AS a, e1.b AS b, e2.b AS c
         |          FROM sym e1 JOIN sym e2 ON e1.b = e2.a
         |          WHERE e1.a < e2.b),
         |cand AS (SELECT w.a, w.b, w.c FROM wedge w
         |         WHERE NOT EXISTS (SELECT 1 FROM mu
         |           WHERE mu.id_a = w.a AND mu.id_b = w.c)),
         |cc AS (SELECT a, c, CAST(count(*) AS BIGINT) AS n_common
         |       FROM cand GROUP BY 1, 2)
         |SELECT cc.a AS id_a, cc.c AS id_b, cc.n_common,
         |       round(CAST(cc.n_common AS DOUBLE)
         |         / (da.d + db.d - cc.n_common), 4) AS jaccard
         |FROM cc JOIN dg da ON cc.a = da.id
         |JOIN dg db ON cc.c = db.id
         |ORDER BY id_a, id_b""".stripMargin,
    "graph_triangles" ->
      s"""WITH $ivfGraphCtes,
         |g AS (SELECT qid, id FROM gr WHERE rk <= 5),
         |mu AS (SELECT g1.qid AS id_a, g1.id AS id_b
         |       FROM g g1 JOIN g g2 ON g1.qid = g2.id AND g1.id = g2.qid
         |       WHERE g1.qid < g1.id),
         |sym AS (SELECT id_a AS a, id_b AS b FROM mu
         |        UNION ALL SELECT id_b, id_a FROM mu),
         |tri AS (SELECT e1.id_a AS a, e1.id_b AS b, e2.id_b AS c
         |        FROM mu e1 JOIN mu e2 ON e1.id_b = e2.id_a
         |        JOIN mu e3 ON e1.id_a = e3.id_a AND e2.id_b = e3.id_b),
         |tn AS (SELECT id, CAST(count(*) AS BIGINT) AS triangles FROM (
         |         SELECT a AS id FROM tri UNION ALL SELECT b AS id FROM tri
         |         UNION ALL SELECT c AS id FROM tri) GROUP BY 1),
         |dg AS (SELECT a AS id, CAST(count(*) AS BIGINT) AS degree
         |       FROM sym GROUP BY 1)
         |SELECT dg.id AS vec_id, dg.degree,
         |       CAST(coalesce(tn.triangles, 0) AS BIGINT) AS triangles,
         |       CASE WHEN dg.degree >= 2
         |         THEN round(coalesce(tn.triangles, 0) * 2.0
         |           / (dg.degree * (dg.degree - 1)), 4)
         |         ELSE 0.0 END AS clustering
         |FROM dg LEFT JOIN tn ON dg.id = tn.id
         |ORDER BY vec_id""".stripMargin,
    // gap regularity from exact integer moments (n, Σg, Σg²); the
    // (sec, event_id) lead order pins equal-timestamp runs
    "events_bot_score" ->
      """WITH e AS (SELECT user_id, event_id,
        |             CAST(floor(epoch(ts)) AS BIGINT) AS sec
        |           FROM events),
        |g AS (SELECT user_id, lead(sec) OVER (PARTITION BY user_id
        |        ORDER BY sec, event_id) - sec AS gap FROM e),
        |m AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
        |        sum(gap) AS sg, sum(gap * gap) AS sg2
        |      FROM g WHERE gap IS NOT NULL
        |      GROUP BY 1 HAVING count(*) >= 2),
        |r AS (SELECT user_id, n_gaps, sg * 1.0 / n_gaps AS mean_gap,
        |        CASE WHEN sg > 0
        |          THEN round(sqrt((sg2 * 1.0 * n_gaps - sg * 1.0 * sg)
        |            / (n_gaps * 1.0 * (n_gaps - 1)))
        |            / (sg * 1.0 / n_gaps), 4)
        |          ELSE 0.0 END AS cvr
        |      FROM m)
        |SELECT user_id, n_gaps, round(mean_gap, 2) AS mean_gap_s,
        |       cvr AS cv_gap, cvr < 0.5 AS is_regular
        |FROM r ORDER BY user_id""".stripMargin,
    "ann_ivf_indexed" -> ivfOracle,
    // cluster dashboard over the SAME trained centroids: per-row
    // cosine 4dp-quantized to integer micro-units before the sums,
    // dominant label by (count DESC, label) argmax
    "embed_cluster_stats" ->
      s"""WITH $ivfCtes,
         |lab AS (SELECT vec_id AS id, CAST(label AS BIGINT) AS label
         |        FROM embeddings),
         |b AS (SELECT af.cell, l.label,
         |        CAST(round(list_cosine_similarity(af.v, c.cv) * 10000)
         |          AS BIGINT) AS micro
         |      FROM af JOIN c2 c USING (cell) JOIN lab l ON l.id = af.id),
         |gl AS (SELECT cell, label, CAST(count(*) AS BIGINT) AS n,
         |         CAST(sum(micro) AS BIGINT) AS sm
         |       FROM b GROUP BY 1, 2),
         |dom AS (SELECT cell, label AS dom_label, n AS n_dom FROM
         |        (SELECT cell, label, n, row_number() OVER (
         |           PARTITION BY cell ORDER BY n DESC, label) AS rn
         |         FROM gl) WHERE rn = 1),
         |tot AS (SELECT cell, CAST(sum(n) AS BIGINT) AS size,
         |          CAST(sum(sm) AS BIGINT) AS smm
         |        FROM gl GROUP BY 1)
         |SELECT t.cell, t.size, d.dom_label,
         |       round(d.n_dom * 1.0 / t.size, 4) AS purity,
         |       round(t.smm * 1.0 / t.size / 10000.0, 4) AS mean_cos
         |FROM tot t JOIN dom d USING (cell) ORDER BY cell""".stripMargin,
    // cell-level simplified silhouette: micro-integer intra sums,
    // deterministic min over the metadata-sized centroid grid,
    // silhouette from the UNROUNDED a and b (display rounds only)
    "knn_silhouette" ->
      s"""WITH $ivfCtes,
         |mem AS (SELECT af.cell,
         |          CAST(round((1 - list_cosine_similarity(af.v, c.cv))
         |            * 1000000) AS BIGINT) AS micro
         |        FROM af JOIN c2 c USING (cell)),
         |ag AS (SELECT cell, CAST(count(*) AS BIGINT) AS n,
         |         CAST(sum(micro) AS BIGINT) AS sm
         |       FROM mem GROUP BY 1),
         |sep AS (SELECT a.cell,
         |          min(1 - list_cosine_similarity(a.cv, b.cv)) AS b
         |        FROM c2 a JOIN c2 b ON a.cell <> b.cell GROUP BY 1)
         |SELECT ag.cell AS cell, ag.n AS n_members,
         |       round(CAST(ag.sm AS DOUBLE) / ag.n / 1000000.0, 6)
         |         AS a_intra,
         |       round(sep.b, 6) AS b_sep,
         |       round((sep.b - CAST(ag.sm AS DOUBLE) / ag.n / 1000000.0)
         |         / greatest(sep.b,
         |             CAST(ag.sm AS DOUBLE) / ag.n / 1000000.0), 4)
         |         AS silhouette
         |FROM ag JOIN sep ON ag.cell = sep.cell
         |WHERE greatest(sep.b,
         |    CAST(ag.sm AS DOUBLE) / ag.n / 1000000.0) > 0
         |ORDER BY cell""".stripMargin,
    // embedding outliers: integer micro-cosines, exact per-cell
    // (n, Σx, Σx²), z = (x·n−S)/sqrt(n·Q−S²) on those integers —
    // identical doubles both engines, so the global top-20 is stable
    "embed_outliers" ->
      s"""WITH $ivfCtes,
         |b AS (SELECT af.id, af.cell,
         |        CAST(round(list_cosine_similarity(af.v, c.cv) * 10000)
         |          AS BIGINT) AS micro
         |      FROM af JOIN c2 c USING (cell)),
         |st AS (SELECT cell, CAST(count(*) AS BIGINT) AS n,
         |         CAST(sum(micro) AS BIGINT) AS s,
         |         CAST(sum(micro * micro) AS BIGINT) AS q
         |       FROM b GROUP BY 1),
         |z AS (SELECT b.id, b.cell, b.micro,
         |        (b.micro * st.n - st.s)
         |          / sqrt(CAST(st.n * st.q - st.s * st.s AS DOUBLE)) AS z
         |      FROM b JOIN st USING (cell)
         |      WHERE st.n > 1 AND st.n * st.q - st.s * st.s > 0)
         |SELECT id, cell, round(micro / 10000.0, 4) AS cos,
         |       round(z, 4) AS z
         |FROM z ORDER BY z, id LIMIT 20""".stripMargin,
    // PCA top-component projection: exact-integer micro moments
    // (S_j, Gram M_jk), covariance + 3 unrolled power iterations in
    // the same left-to-right fold order as the driver loop
    // (list_inner_product ≡ the VecDot accumulator), projection per
    // row against the converged axis
    "embed_pca_project" ->
      """WITH em AS (SELECT vec_id AS id,
        |       list_transform(embedding::DOUBLE[],
        |         e -> CAST(round(e * 10000) AS BIGINT)) AS m
        |     FROM embeddings),
        |ex AS (SELECT id, j.j AS j, m[j.j + 1] AS v
        |       FROM em CROSS JOIN (SELECT unnest(range(64)) AS j) j),
        |nn AS (SELECT count(*) AS n FROM em),
        |sv AS (SELECT j, CAST(sum(v) AS BIGINT) AS s FROM ex GROUP BY 1),
        |mm AS (SELECT a.j AS j, b.j AS k, CAST(sum(a.v * b.v) AS BIGINT)
        |         AS m
        |       FROM ex a JOIN ex b ON a.id = b.id GROUP BY 1, 2),
        |cv AS (SELECT mm.j, mm.k,
        |         mm.m * 1.0 - sa.s * 1.0 * sb.s / nn.n AS c
        |       FROM mm JOIN sv sa ON mm.j = sa.j
        |       JOIN sv sb ON mm.k = sb.j CROSS JOIN nn),
        |cr AS (SELECT j, list(c ORDER BY k) AS crow FROM cv GROUP BY 1),
        |v0 AS (SELECT list_transform(range(64), x -> 0.125) AS v),
        |w1 AS (SELECT cr.j, list_inner_product(cr.crow, v0.v) AS w
        |       FROM cr CROSS JOIN v0),
        |l1 AS (SELECT list(w ORDER BY j) AS wl FROM w1),
        |n1 AS (SELECT list_transform(wl,
        |         e -> e / sqrt(list_inner_product(wl, wl))) AS v FROM l1),
        |w2 AS (SELECT cr.j, list_inner_product(cr.crow, n1.v) AS w
        |       FROM cr CROSS JOIN n1),
        |l2 AS (SELECT list(w ORDER BY j) AS wl FROM w2),
        |n2 AS (SELECT list_transform(wl,
        |         e -> e / sqrt(list_inner_product(wl, wl))) AS v FROM l2),
        |w3 AS (SELECT cr.j, list_inner_product(cr.crow, n2.v) AS w
        |       FROM cr CROSS JOIN n2),
        |l3 AS (SELECT list(w ORDER BY j) AS wl FROM w3),
        |n3 AS (SELECT list_transform(wl,
        |         e -> e / sqrt(list_inner_product(wl, wl))) AS v FROM l3),
        |mu AS (SELECT list(s * 1.0 / nn.n ORDER BY j) AS mul
        |       FROM sv CROSS JOIN nn GROUP BY nn.n),
        |md AS (SELECT list_inner_product(mu.mul, n3.v) AS mudot
        |       FROM mu CROSS JOIN n3)
        |SELECT em.id AS vec_id,
        |       round(list_inner_product(list_transform(em.m,
        |         e -> CAST(e AS DOUBLE)), n3.v) - md.mudot, 4) AS pc1
        |FROM em CROSS JOIN n3 CROSS JOIN md ORDER BY vec_id""".stripMargin,
    // 2-D PCA map: the shared chain to v₁ (n3), λ₁ via the two
    // ordered folds, then 3 DEFLATED iterations — each matvec is
    // lip(crow, x) − λ·v₁_j·lip(v₁, x), term-for-term the driver's
    // fold — and two per-row projections
    "embed_pca_project2" ->
      """WITH em AS (SELECT vec_id AS id,
        |       list_transform(embedding::DOUBLE[],
        |         e -> CAST(round(e * 10000) AS BIGINT)) AS m
        |     FROM embeddings),
        |ex AS (SELECT id, j.j AS j, m[j.j + 1] AS v
        |       FROM em CROSS JOIN (SELECT unnest(range(64)) AS j) j),
        |nn AS (SELECT count(*) AS n FROM em),
        |sv AS (SELECT j, CAST(sum(v) AS BIGINT) AS s FROM ex GROUP BY 1),
        |mm AS (SELECT a.j AS j, b.j AS k, CAST(sum(a.v * b.v) AS BIGINT)
        |         AS m
        |       FROM ex a JOIN ex b ON a.id = b.id GROUP BY 1, 2),
        |cv AS (SELECT mm.j, mm.k,
        |         mm.m * 1.0 - sa.s * 1.0 * sb.s / nn.n AS c
        |       FROM mm JOIN sv sa ON mm.j = sa.j
        |       JOIN sv sb ON mm.k = sb.j CROSS JOIN nn),
        |cr AS (SELECT j, list(c ORDER BY k) AS crow FROM cv GROUP BY 1),
        |v0 AS (SELECT list_transform(range(64), x -> 0.125) AS v),
        |w1 AS (SELECT cr.j, list_inner_product(cr.crow, v0.v) AS w
        |       FROM cr CROSS JOIN v0),
        |l1 AS (SELECT list(w ORDER BY j) AS wl FROM w1),
        |n1 AS (SELECT list_transform(wl,
        |         e -> e / sqrt(list_inner_product(wl, wl))) AS v FROM l1),
        |w2 AS (SELECT cr.j, list_inner_product(cr.crow, n1.v) AS w
        |       FROM cr CROSS JOIN n1),
        |l2 AS (SELECT list(w ORDER BY j) AS wl FROM w2),
        |n2 AS (SELECT list_transform(wl,
        |         e -> e / sqrt(list_inner_product(wl, wl))) AS v FROM l2),
        |w3 AS (SELECT cr.j, list_inner_product(cr.crow, n2.v) AS w
        |       FROM cr CROSS JOIN n2),
        |l3 AS (SELECT list(w ORDER BY j) AS wl FROM w3),
        |n3 AS (SELECT list_transform(wl,
        |         e -> e / sqrt(list_inner_product(wl, wl))) AS v FROM l3),
        |mv AS (SELECT cr.j, list_inner_product(cr.crow, n3.v) AS w
        |       FROM cr CROSS JOIN n3),
        |mvl AS (SELECT list(w ORDER BY j) AS wl FROM mv),
        |lam AS (SELECT list_inner_product(n3.v, mvl.wl) AS l
        |        FROM n3 CROSS JOIN mvl),
        |d1 AS (SELECT list_inner_product(n3.v, v0.v) AS vx
        |       FROM n3 CROSS JOIN v0),
        |u1 AS (SELECT cr.j, list_inner_product(cr.crow, v0.v)
        |         - lam.l * n3.v[cr.j + 1] * d1.vx AS w
        |       FROM cr CROSS JOIN v0 CROSS JOIN n3
        |            CROSS JOIN lam CROSS JOIN d1),
        |ul1 AS (SELECT list(w ORDER BY j) AS wl FROM u1),
        |q1 AS (SELECT list_transform(wl,
        |         e -> e / sqrt(list_inner_product(wl, wl))) AS v FROM ul1),
        |d2 AS (SELECT list_inner_product(n3.v, q1.v) AS vx
        |       FROM n3 CROSS JOIN q1),
        |u2 AS (SELECT cr.j, list_inner_product(cr.crow, q1.v)
        |         - lam.l * n3.v[cr.j + 1] * d2.vx AS w
        |       FROM cr CROSS JOIN q1 CROSS JOIN n3
        |            CROSS JOIN lam CROSS JOIN d2),
        |ul2 AS (SELECT list(w ORDER BY j) AS wl FROM u2),
        |q2 AS (SELECT list_transform(wl,
        |         e -> e / sqrt(list_inner_product(wl, wl))) AS v FROM ul2),
        |d3 AS (SELECT list_inner_product(n3.v, q2.v) AS vx
        |       FROM n3 CROSS JOIN q2),
        |u3 AS (SELECT cr.j, list_inner_product(cr.crow, q2.v)
        |         - lam.l * n3.v[cr.j + 1] * d3.vx AS w
        |       FROM cr CROSS JOIN q2 CROSS JOIN n3
        |            CROSS JOIN lam CROSS JOIN d3),
        |ul3 AS (SELECT list(w ORDER BY j) AS wl FROM u3),
        |q3 AS (SELECT list_transform(wl,
        |         e -> e / sqrt(list_inner_product(wl, wl))) AS v FROM ul3),
        |mu AS (SELECT list(s * 1.0 / nn.n ORDER BY j) AS mul
        |       FROM sv CROSS JOIN nn GROUP BY nn.n),
        |md1 AS (SELECT list_inner_product(mu.mul, n3.v) AS mudot
        |        FROM mu CROSS JOIN n3),
        |md2 AS (SELECT list_inner_product(mu.mul, q3.v) AS mudot
        |        FROM mu CROSS JOIN q3)
        |SELECT em.id AS vec_id,
        |       round(list_inner_product(list_transform(em.m,
        |         e -> CAST(e AS DOUBLE)), n3.v) - md1.mudot, 4) AS pc1,
        |       round(list_inner_product(list_transform(em.m,
        |         e -> CAST(e AS DOUBLE)), q3.v) - md2.mudot, 4) AS pc2
        |FROM em CROSS JOIN n3 CROSS JOIN q3 CROSS JOIN md1 CROSS JOIN md2
        |ORDER BY vec_id""".stripMargin,
    // explained-variance report: λ₁ = vᵀCv via the same two ordered
    // folds as the driver (per-j list_inner_product over k, then the
    // j fold), trace via ordered list_sum; report in original units
    // ((λ/n)/1e8 — C is the SUM covariance in micro² units)
    "embed_pca_var" ->
      """WITH em AS (SELECT vec_id AS id,
        |       list_transform(embedding::DOUBLE[],
        |         e -> CAST(round(e * 10000) AS BIGINT)) AS m
        |     FROM embeddings),
        |ex AS (SELECT id, j.j AS j, m[j.j + 1] AS v
        |       FROM em CROSS JOIN (SELECT unnest(range(64)) AS j) j),
        |nn AS (SELECT count(*) AS n FROM em),
        |sv AS (SELECT j, CAST(sum(v) AS BIGINT) AS s FROM ex GROUP BY 1),
        |mm AS (SELECT a.j AS j, b.j AS k, CAST(sum(a.v * b.v) AS BIGINT)
        |         AS m
        |       FROM ex a JOIN ex b ON a.id = b.id GROUP BY 1, 2),
        |cv AS (SELECT mm.j, mm.k,
        |         mm.m * 1.0 - sa.s * 1.0 * sb.s / nn.n AS c
        |       FROM mm JOIN sv sa ON mm.j = sa.j
        |       JOIN sv sb ON mm.k = sb.j CROSS JOIN nn),
        |cr AS (SELECT j, list(c ORDER BY k) AS crow FROM cv GROUP BY 1),
        |v0 AS (SELECT list_transform(range(64), x -> 0.125) AS v),
        |w1 AS (SELECT cr.j, list_inner_product(cr.crow, v0.v) AS w
        |       FROM cr CROSS JOIN v0),
        |l1 AS (SELECT list(w ORDER BY j) AS wl FROM w1),
        |n1 AS (SELECT list_transform(wl,
        |         e -> e / sqrt(list_inner_product(wl, wl))) AS v FROM l1),
        |w2 AS (SELECT cr.j, list_inner_product(cr.crow, n1.v) AS w
        |       FROM cr CROSS JOIN n1),
        |l2 AS (SELECT list(w ORDER BY j) AS wl FROM w2),
        |n2 AS (SELECT list_transform(wl,
        |         e -> e / sqrt(list_inner_product(wl, wl))) AS v FROM l2),
        |w3 AS (SELECT cr.j, list_inner_product(cr.crow, n2.v) AS w
        |       FROM cr CROSS JOIN n2),
        |l3 AS (SELECT list(w ORDER BY j) AS wl FROM w3),
        |n3 AS (SELECT list_transform(wl,
        |         e -> e / sqrt(list_inner_product(wl, wl))) AS v FROM l3),
        |w4 AS (SELECT cr.j, list_inner_product(cr.crow, n3.v) AS w
        |       FROM cr CROSS JOIN n3),
        |l4 AS (SELECT list(w ORDER BY j) AS wl FROM w4),
        |lam AS (SELECT list_inner_product(n3.v, l4.wl) AS lam
        |        FROM n3 CROSS JOIN l4),
        |tr AS (SELECT list_sum(list(c ORDER BY j)) AS t
        |       FROM cv WHERE j = k)
        |SELECT round(lam.lam / nn.n / 100000000.0, 6) AS lambda1,
        |       round(tr.t / nn.n / 100000000.0, 6) AS total_var,
        |       round(lam.lam / tr.t, 6) AS var_ratio
        |FROM lam CROSS JOIN tr CROSS JOIN nn""".stripMargin,
    // seasonal-naive backtest: dense zero-filled grid from DATA
    // bounds, lag-7 prediction, integer-exact absolute errors
    "events_forecast_naive" ->
      """WITH ev AS (SELECT event_type,
        |              date_diff('day', DATE '1970-01-01',
        |                CAST(ts AS DATE)) AS d
        |            FROM events),
        |daily AS (SELECT event_type, d, CAST(count(*) AS BIGINT) AS n
        |          FROM ev GROUP BY 1, 2),
        |b AS (SELECT min(d) AS lo, max(d) AS hi FROM ev),
        |ty AS (SELECT DISTINCT event_type FROM ev),
        |grid AS (SELECT ty.event_type, g.d
        |         FROM ty CROSS JOIN
        |           (SELECT unnest(generate_series(b.lo, b.hi)) AS d
        |            FROM b) g),
        |dense AS (SELECT g.event_type, g.d, coalesce(daily.n, 0) AS n
        |          FROM grid g LEFT JOIN daily
        |            ON g.event_type = daily.event_type
        |            AND g.d = daily.d),
        |lagd AS (SELECT event_type, d, n,
        |           lag(n, 7) OVER (PARTITION BY event_type ORDER BY d)
        |             AS pred
        |         FROM dense)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |       CAST(sum(abs(n - pred)) AS BIGINT) AS total_abs_err,
        |       round(sum(abs(n - pred)) * 1.0 / count(*), 4) AS mae
        |FROM lagd WHERE pred IS NOT NULL
        |GROUP BY 1 ORDER BY event_type""".stripMargin,
    // lag-7 Pearson autocorrelation over the same dense grid — exact
    // integer moments, DOUBLE numerators multiplied inside the sqrt
    "events_autocorr7" ->
      """WITH ev AS (SELECT event_type,
        |              date_diff('day', DATE '1970-01-01',
        |                CAST(ts AS DATE)) AS d
        |            FROM events),
        |daily AS (SELECT event_type, d, CAST(count(*) AS BIGINT) AS n
        |          FROM ev GROUP BY 1, 2),
        |b AS (SELECT min(d) AS lo, max(d) AS hi FROM ev),
        |ty AS (SELECT DISTINCT event_type FROM ev),
        |grid AS (SELECT ty.event_type, g.d
        |         FROM ty CROSS JOIN
        |           (SELECT unnest(generate_series(b.lo, b.hi)) AS d
        |            FROM b) g),
        |dense AS (SELECT g.event_type, g.d, coalesce(daily.n, 0) AS y
        |          FROM grid g LEFT JOIN daily
        |            ON g.event_type = daily.event_type
        |            AND g.d = daily.d),
        |lagd AS (SELECT event_type, y,
        |           lag(y, 7) OVER (PARTITION BY event_type ORDER BY d)
        |             AS x
        |         FROM dense),
        |mo AS (SELECT event_type, CAST(count(*) AS BIGINT) AS k,
        |         CAST(sum(x) AS BIGINT) AS sx,
        |         CAST(sum(y) AS BIGINT) AS sy,
        |         CAST(sum(x * y) AS BIGINT) AS sxy,
        |         CAST(sum(x * x) AS BIGINT) AS sxx,
        |         CAST(sum(y * y) AS BIGINT) AS syy
        |       FROM lagd WHERE x IS NOT NULL GROUP BY 1)
        |SELECT event_type, k AS n_days,
        |       round(CAST(CAST(k AS HUGEINT) * sxy
        |           - CAST(sx AS HUGEINT) * sy AS DOUBLE)
        |         / sqrt(CAST(CAST(k AS HUGEINT) * sxx
        |             - CAST(sx AS HUGEINT) * sx AS DOUBLE)
        |           * CAST(CAST(k AS HUGEINT) * syy
        |             - CAST(sy AS HUGEINT) * sy AS DOUBLE)), 4) AS r_lag
        |FROM mo
        |WHERE CAST(k AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx > 0
        |  AND CAST(k AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy > 0
        |ORDER BY event_type""".stripMargin,
    // cross-series Pearson: dense-grid pair join, autocorr moments
    "events_series_corr" ->
      """WITH ev AS (SELECT event_type,
        |              date_diff('day', DATE '1970-01-01',
        |                CAST(ts AS DATE)) AS d
        |            FROM events),
        |daily AS (SELECT event_type, d, CAST(count(*) AS BIGINT) AS n
        |          FROM ev GROUP BY 1, 2),
        |b AS (SELECT min(d) AS lo, max(d) AS hi FROM ev),
        |ty AS (SELECT DISTINCT event_type FROM ev),
        |grid AS (SELECT ty.event_type, g.d
        |         FROM ty CROSS JOIN
        |           (SELECT unnest(generate_series(b.lo, b.hi)) AS d
        |            FROM b) g),
        |dense AS (SELECT g.event_type, g.d, coalesce(daily.n, 0) AS v
        |          FROM grid g LEFT JOIN daily
        |            ON g.event_type = daily.event_type
        |            AND g.d = daily.d),
        |prs AS (SELECT a.event_type AS type_a, bb.event_type AS type_b,
        |          a.v AS x, bb.v AS y
        |        FROM dense a JOIN dense bb ON a.d = bb.d
        |          AND a.event_type < bb.event_type),
        |mo AS (SELECT type_a, type_b, CAST(count(*) AS BIGINT) AS k,
        |         CAST(sum(x) AS BIGINT) AS sx,
        |         CAST(sum(y) AS BIGINT) AS sy,
        |         CAST(sum(x * y) AS BIGINT) AS sxy,
        |         CAST(sum(x * x) AS BIGINT) AS sxx,
        |         CAST(sum(y * y) AS BIGINT) AS syy
        |       FROM prs GROUP BY 1, 2)
        |SELECT type_a, type_b, k AS n_days,
        |       round(CAST(CAST(k AS HUGEINT) * sxy
        |           - CAST(sx AS HUGEINT) * sy AS DOUBLE)
        |         / sqrt(CAST(CAST(k AS HUGEINT) * sxx
        |             - CAST(sx AS HUGEINT) * sx AS DOUBLE)
        |           * CAST(CAST(k AS HUGEINT) * syy
        |             - CAST(sy AS HUGEINT) * sy AS DOUBLE)), 4) AS r
        |FROM mo
        |WHERE CAST(k AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx > 0
        |  AND CAST(k AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy > 0
        |ORDER BY type_a, type_b""".stripMargin,
    // Benford first-digit audit: exact counts, 6dp literal
    // expectations interpolated from the SAME Scala seq the Spark
    // when-chain uses
    "events_benford" -> {
      val lits = graft.operators.Analytics.benfordP
        .map { case (d, p) => f"($d, CAST($p%.6f AS DOUBLE))" }
        .mkString(", ")
      s"""WITH m AS (SELECT CAST(round(value * 100) AS BIGINT) AS mc
         |           FROM events),
         |dg AS (SELECT CAST(substr(CAST(mc AS VARCHAR), 1, 1) AS BIGINT)
         |         AS digit
         |       FROM m WHERE mc > 0),
         |cnt AS (SELECT digit, CAST(count(*) AS BIGINT) AS n_obs
         |        FROM dg GROUP BY 1),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS total FROM dg),
         |bp(digit, p) AS (VALUES $lits)
         |SELECT cnt.digit AS digit, cnt.n_obs,
         |       round(CAST(cnt.n_obs AS DOUBLE) / tot.total, 4) AS share,
         |       bp.p AS benford_p,
         |       round(CAST(cnt.n_obs AS DOUBLE) / tot.total - bp.p, 4)
         |         AS excess
         |FROM cnt JOIN bp ON cnt.digit = bp.digit CROSS JOIN tot
         |ORDER BY digit""".stripMargin
    },
    // supplier-revenue HHI per nation: Σc² and T² through HUGEINT
    // (the Spark side's DECIMAL(38,0)), one double division
    "supplier_hhi" ->
      """WITH rev AS (SELECT l_suppkey,
        |         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
        |           * 100) AS BIGINT)) AS BIGINT) AS c
        |       FROM lineitem GROUP BY 1),
        |bysup AS (SELECT n.n_name, rev.c
        |          FROM rev JOIN supplier s ON rev.l_suppkey = s.s_suppkey
        |          JOIN nation n ON s.s_nationkey = n.n_nationkey)
        |SELECT n_name, CAST(count(*) AS BIGINT) AS n_suppliers,
        |       CAST(sum(c) AS BIGINT) AS total_cents,
        |       round(CAST(sum(CAST(c AS HUGEINT) * c) AS DOUBLE)
        |         / CAST(CAST(sum(c) AS HUGEINT) * sum(c) AS DOUBLE), 6)
        |         AS hhi
        |FROM bysup GROUP BY 1 ORDER BY n_name""".stripMargin,
    // Flesch reading ease: RE2-class regex counts, double literals
    "text_readability" ->
      """WITH t AS (SELECT doc_id, lower(text) AS t FROM documents),
        |c AS (SELECT doc_id,
        |        CAST(len(string_split(t, ' ')) AS BIGINT) AS n_words,
        |        CAST(len(regexp_extract_all(t, '[aeiouy]+')) AS BIGINT)
        |          AS n_syllables,
        |        CAST(greatest(len(regexp_extract_all(t, '[.!?]+')), 1)
        |          AS BIGINT) AS n_sentences
        |      FROM t)
        |SELECT doc_id, n_words, n_syllables, n_sentences,
        |       round(CAST(206.835 AS DOUBLE)
        |         - CAST(1.015 AS DOUBLE)
        |           * (CAST(n_words AS DOUBLE) / n_sentences)
        |         - CAST(84.6 AS DOUBLE)
        |           * (CAST(n_syllables AS DOUBLE) / n_words), 4)
        |         AS flesch
        |FROM c ORDER BY doc_id""".stripMargin,
    // recall@10 of the IVF path against brute force: both legs are
    // the existing deterministic mirrors, composed
    // recall-vs-nprobe curve: four probe widths over the SAME
    // trained chain, overall recall@10 against the brute scan
    // cost/recall frontier: the recall-curve blocks + probed-cell
    // size sums (the probe's scan cost) per width
    "ann_pareto_tuning" -> {
      val blocks = Seq(1, 2, 3, 4).map { np =>
        s"""pp$np AS (SELECT qid, cell FROM (SELECT q.qid, c.cell,
           |  row_number() OVER (PARTITION BY q.qid
           |    ORDER BY ${ivfCd("q.qv", "c.cv")}, c.cell) AS rn
           |  FROM q CROSS JOIN c2 c) WHERE rn <= $np),
           |ss$np AS (SELECT pp$np.qid, a.id,
           |    list_cosine_similarity(a.v, q.qv) AS s
           |  FROM af a JOIN pp$np ON a.cell = pp$np.cell
           |  JOIN q ON pp$np.qid = q.qid),
           |rr$np AS (SELECT qid, id FROM (SELECT qid, id,
           |    row_number() OVER (PARTITION BY qid
           |      ORDER BY s DESC, id) AS rk
           |  FROM ss$np WHERE s IS NOT NULL) WHERE rk <= 10)""".stripMargin
      }.mkString(",\n")
      val unions = Seq(1, 2, 3, 4).map { np =>
        s"SELECT CAST($np AS BIGINT) AS nprobe, " +
          s"CAST((SELECT count(*) FROM rr$np JOIN bf " +
          s"ON rr$np.qid = bf.qid AND rr$np.id = bf.id) AS BIGINT) " +
          s"AS n_hits, " +
          s"CAST((SELECT sum(cs.csz) FROM pp$np " +
          s"JOIN cs ON pp$np.cell = cs.cell) AS BIGINT) AS nc"
      }.mkString("\nUNION ALL\n")
      s"""WITH $ivfCtes,
         |$blocks,
         |cs AS (SELECT cell, CAST(count(*) AS BIGINT) AS csz
         |       FROM af GROUP BY 1),
         |bd AS (SELECT q.qid, e2.id, list_cosine_similarity(e2.v, q.qv)
         |         AS s
         |       FROM e e2 CROSS JOIN q),
         |br AS (SELECT qid, id, s, row_number() OVER (PARTITION BY qid
         |         ORDER BY s DESC, id) AS rk
         |       FROM bd WHERE s IS NOT NULL),
         |bf AS (SELECT qid, id FROM br WHERE rk <= 10),
         |u AS ($unions)
         |SELECT nprobe, n_hits, round(n_hits / 50.0, 4) AS recall,
         |  nc AS n_candidates, round(nc / 5.0, 4) AS cand_per_query
         |FROM u ORDER BY nprobe""".stripMargin
    },
    // MRL curve: pure-prefix ranking per width vs the full-dim exact
    // scan; zero-hit widths kept by the left join
    "mrl_recall_curve" ->
      """WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v
        |           FROM embeddings),
        |q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
        |      FROM embeddings WHERE vec_id < 5),
        |bd AS (SELECT q.qid, e2.id, list_cosine_similarity(e2.v, q.qv)
        |         AS s
        |       FROM e e2 CROSS JOIN q),
        |br AS (SELECT qid, id, s, row_number() OVER (PARTITION BY qid
        |         ORDER BY s DESC, id) AS rk
        |       FROM bd WHERE s IS NOT NULL),
        |ex AS (SELECT qid, id FROM br WHERE rk <= 10),
        |dims AS (SELECT unnest([4, 8, 16, 32]) AS pd),
        |pl AS (SELECT dims.pd, q.qid, e2.id,
        |         list_cosine_similarity(e2.v[1:dims.pd],
        |           q.qv[1:dims.pd]) AS s
        |       FROM e e2 CROSS JOIN q CROSS JOIN dims),
        |pp AS (SELECT pd, qid, id, s,
        |         row_number() OVER (PARTITION BY pd, qid
        |                            ORDER BY s DESC, id) AS rk
        |       FROM pl WHERE s IS NOT NULL),
        |sys AS (SELECT pd, qid, id FROM pp WHERE rk <= 10),
        |hits AS (SELECT pd, CAST(count(*) AS BIGINT) AS n_hits
        |         FROM sys JOIN ex ON sys.qid = ex.qid AND sys.id = ex.id
        |         GROUP BY 1),
        |den AS (SELECT CAST(count(*) AS BIGINT) AS denom FROM ex)
        |SELECT CAST(dims.pd AS BIGINT) AS prefix_dims,
        |       CAST(coalesce(hits.n_hits, 0) AS BIGINT) AS n_hits,
        |       round(CAST(coalesce(hits.n_hits, 0) AS DOUBLE)
        |         / den.denom, 4) AS recall
        |FROM dims LEFT JOIN hits ON dims.pd = hits.pd CROSS JOIN den
        |ORDER BY prefix_dims""".stripMargin,
    // vector-space PSI between ingest waves over the shared IVF
    // cells; per-cell terms micro-rounded BIGINTs (order-free sum)
    "embed_drift_psi" ->
      s"""WITH $ivfCtes,
         |wv AS (SELECT cell, id % 2 = 0 AS ha FROM af),
         |cl AS (SELECT cell,
         |         CAST(sum(CASE WHEN ha THEN 1 ELSE 0 END) AS BIGINT)
         |           AS ca,
         |         CAST(sum(CASE WHEN NOT ha THEN 1 ELSE 0 END)
         |           AS BIGINT) AS cb
         |       FROM wv GROUP BY 1),
         |tot AS (SELECT CAST(sum(ca) AS BIGINT) AS ta,
         |          CAST(sum(cb) AS BIGINT) AS tb,
         |          CAST(count(*) AS BIGINT) AS nc
         |        FROM cl),
         |tm AS (SELECT tot.ta, tot.tb, tot.nc,
         |         CAST(round(((ca + 1) * 1.0 / (ta + nc)
         |           - (cb + 1) * 1.0 / (tb + nc))
         |           * ln(((ca + 1) * 1.0 / (ta + nc))
         |           / ((cb + 1) * 1.0 / (tb + nc))) * 1000000) AS BIGINT)
         |           AS tm
         |        FROM cl CROSS JOIN tot)
         |SELECT max(ta) AS n_a, max(tb) AS n_b, max(nc) AS n_cells,
         |       round(CAST(sum(tm) AS DOUBLE) / 1000000.0, 4) AS psi
         |FROM tm""".stripMargin,
    "ann_recall_curve" -> {
      val blocks = Seq(1, 2, 3, 4).map { np =>
        s"""pp$np AS (SELECT qid, cell FROM (SELECT q.qid, c.cell,
           |  row_number() OVER (PARTITION BY q.qid
           |    ORDER BY ${ivfCd("q.qv", "c.cv")}, c.cell) AS rn
           |  FROM q CROSS JOIN c2 c) WHERE rn <= $np),
           |ss$np AS (SELECT pp$np.qid, a.id,
           |    list_cosine_similarity(a.v, q.qv) AS s
           |  FROM af a JOIN pp$np ON a.cell = pp$np.cell
           |  JOIN q ON pp$np.qid = q.qid),
           |rr$np AS (SELECT qid, id FROM (SELECT qid, id,
           |    row_number() OVER (PARTITION BY qid
           |      ORDER BY s DESC, id) AS rk
           |  FROM ss$np WHERE s IS NOT NULL) WHERE rk <= 10)""".stripMargin
      }.mkString(",\n")
      val unions = Seq(1, 2, 3, 4).map { np =>
        s"SELECT CAST($np AS BIGINT) AS nprobe, " +
          s"CAST(count(*) AS BIGINT) AS n_hits " +
          s"FROM rr$np JOIN bf ON rr$np.qid = bf.qid AND rr$np.id = bf.id"
      }.mkString("\nUNION ALL\n")
      s"""WITH $ivfCtes,
         |$blocks,
         |bd AS (SELECT q.qid, e2.id, list_cosine_similarity(e2.v, q.qv)
         |         AS s
         |       FROM e e2 CROSS JOIN q),
         |br AS (SELECT qid, id, s, row_number() OVER (PARTITION BY qid
         |         ORDER BY s DESC, id) AS rk
         |       FROM bd WHERE s IS NOT NULL),
         |bf AS (SELECT qid, id FROM br WHERE rk <= 10),
         |u AS ($unions)
         |SELECT nprobe, n_hits, round(n_hits / 50.0, 4) AS recall
         |FROM u ORDER BY nprobe""".stripMargin
    },
    // recall@k curve: both ranked lists once at k=10, per-k
    // rank-filtered joins; denominators k·|Q|
    "ann_recall_at_k" ->
      s"""WITH $ivfCtes,
         |sc AS (SELECT pr.qid, a.id, list_cosine_similarity(a.v, q.qv) AS s
         |       FROM af a JOIN pr ON a.cell = pr.cell JOIN q ON pr.qid = q.qid),
         |ir AS (SELECT qid, id, row_number() OVER (PARTITION BY qid
         |         ORDER BY s DESC, id) AS rk
         |       FROM sc WHERE s IS NOT NULL),
         |bd AS (SELECT q.qid, e2.id, list_cosine_similarity(e2.v, q.qv)
         |         AS s
         |       FROM e e2 CROSS JOIN q),
         |br AS (SELECT qid, id, row_number() OVER (PARTITION BY qid
         |         ORDER BY s DESC, id) AS rk
         |       FROM bd WHERE s IS NOT NULL),
         |u AS (
         |  SELECT CAST(1 AS BIGINT) AS k, CAST(count(*) AS BIGINT)
         |    AS n_hits
         |  FROM (SELECT qid, id FROM ir WHERE rk <= 1) a1
         |  JOIN (SELECT qid, id FROM br WHERE rk <= 1) b1 USING (qid, id)
         |  UNION ALL
         |  SELECT CAST(5 AS BIGINT), CAST(count(*) AS BIGINT)
         |  FROM (SELECT qid, id FROM ir WHERE rk <= 5) a5
         |  JOIN (SELECT qid, id FROM br WHERE rk <= 5) b5 USING (qid, id)
         |  UNION ALL
         |  SELECT CAST(10 AS BIGINT), CAST(count(*) AS BIGINT)
         |  FROM (SELECT qid, id FROM ir WHERE rk <= 10) a10
         |  JOIN (SELECT qid, id FROM br WHERE rk <= 10) b10 USING (qid, id))
         |SELECT k, n_hits, round(n_hits / (k * 5.0), 4) AS recall
         |FROM u ORDER BY k""".stripMargin,
    "ann_recall_report" ->
      s"""WITH $ivfCtes,
         |sc AS (SELECT pr.qid, a.id, list_cosine_similarity(a.v, q.qv)
         |         AS s
         |       FROM af a JOIN pr ON a.cell = pr.cell
         |       JOIN q ON pr.qid = q.qid),
         |r AS (SELECT qid, id, s, row_number() OVER (PARTITION BY qid
         |        ORDER BY s DESC, id) AS rk
         |      FROM sc WHERE s IS NOT NULL),
         |iv AS (SELECT qid, id FROM r WHERE rk <= 10),
         |bd AS (SELECT q.qid, e2.id, list_cosine_similarity(e2.v, q.qv)
         |         AS s
         |       FROM e e2 CROSS JOIN q),
         |br AS (SELECT qid, id, s, row_number() OVER (PARTITION BY qid
         |         ORDER BY s DESC, id) AS rk
         |       FROM bd WHERE s IS NOT NULL),
         |bf AS (SELECT qid, id FROM br WHERE rk <= 10),
         |h AS (SELECT iv.qid, CAST(count(*) AS BIGINT) AS hits
         |      FROM iv JOIN bf ON iv.qid = bf.qid AND iv.id = bf.id
         |      GROUP BY 1)
         |SELECT qid, hits, round(hits / 10.0, 4) AS recall
         |FROM h ORDER BY qid""".stripMargin,
    // nDCG@10 of the IVF path: graded relevance 11−rank from the
    // exact cosine top-10, discounted by log2(rank+1) over the
    // system's own ordering; idcg from the exact list's own ranks
    // MRR legs share the ndcg oracle's system/exact scans; rr_top1
    // tracks the exact rank-1 item, rr_first_rel any exact-top-10
    "search_mrr" ->
      s"""WITH $ivfCtes,
         |sc AS (SELECT pr.qid, a.id, list_cosine_similarity(a.v, q.qv)
         |         AS s
         |       FROM af a JOIN pr ON a.cell = pr.cell
         |       JOIN q ON pr.qid = q.qid),
         |r AS (SELECT qid, id, s, row_number() OVER (PARTITION BY qid
         |        ORDER BY s DESC, id) AS rk
         |      FROM sc WHERE s IS NOT NULL),
         |sys AS (SELECT qid, id, rk FROM r WHERE rk <= 10),
         |bd AS (SELECT q.qid, e2.id, list_cosine_similarity(e2.v, q.qv)
         |         AS s
         |       FROM e e2 CROSS JOIN q),
         |br AS (SELECT qid, id, s, row_number() OVER (PARTITION BY qid
         |         ORDER BY s DESC, id) AS rk
         |       FROM bd WHERE s IS NOT NULL),
         |ex AS (SELECT qid, id, rk AS erk FROM br WHERE rk <= 10),
         |h AS (SELECT s.qid, s.rk, ex.erk FROM sys s
         |      JOIN ex ON s.qid = ex.qid AND s.id = ex.id),
         |t1 AS (SELECT qid, min(rk) AS r1 FROM h WHERE erk = 1
         |       GROUP BY 1),
         |ta AS (SELECT qid, min(rk) AS ra,
         |         CAST(count(*) AS BIGINT) AS n_rel_found
         |       FROM h GROUP BY 1)
         |SELECT q.qid,
         |       round(coalesce(CAST(1 AS DOUBLE) / t1.r1, 0), 4)
         |         AS rr_top1,
         |       round(coalesce(CAST(1 AS DOUBLE) / ta.ra, 0), 4)
         |         AS rr_first_rel,
         |       CAST(coalesce(ta.n_rel_found, 0) AS BIGINT)
         |         AS n_rel_found
         |FROM q LEFT JOIN t1 ON q.qid = t1.qid
         |LEFT JOIN ta ON q.qid = ta.qid ORDER BY q.qid""".stripMargin,
    "search_ndcg" ->
      s"""WITH $ivfCtes,
         |sc AS (SELECT pr.qid, a.id, list_cosine_similarity(a.v, q.qv)
         |         AS s
         |       FROM af a JOIN pr ON a.cell = pr.cell
         |       JOIN q ON pr.qid = q.qid),
         |r AS (SELECT qid, id, s, row_number() OVER (PARTITION BY qid
         |        ORDER BY s DESC, id) AS rk
         |      FROM sc WHERE s IS NOT NULL),
         |sys AS (SELECT qid, id, rk FROM r WHERE rk <= 10),
         |bd AS (SELECT q.qid, e2.id, list_cosine_similarity(e2.v, q.qv)
         |         AS s
         |       FROM e e2 CROSS JOIN q),
         |br AS (SELECT qid, id, s, row_number() OVER (PARTITION BY qid
         |         ORDER BY s DESC, id) AS rk
         |       FROM bd WHERE s IS NOT NULL),
         |ex AS (SELECT qid, id, rk, 11 - rk AS rel FROM br WHERE rk <= 10),
         |d AS (SELECT s.qid,
         |        sum(coalesce(ex.rel, 0) * 1.0 / log2(s.rk + 1)) AS dcg
         |      FROM sys s LEFT JOIN ex ON s.qid = ex.qid AND s.id = ex.id
         |      GROUP BY 1),
         |i AS (SELECT qid, sum(rel * 1.0 / log2(rk + 1)) AS idcg
         |      FROM ex GROUP BY 1)
         |SELECT d.qid, round(d.dcg, 4) AS dcg, round(i.idcg, 4) AS idcg,
         |       round(d.dcg / i.idcg, 4) AS ndcg
         |FROM d JOIN i ON d.qid = i.qid ORDER BY d.qid""".stripMargin,
    // random-projection kNN: fixed ±1 matrix from md5("j|i") (the
    // sign-LSH weight discipline), top-50 by projected L2, exact
    // cosine rerank to 10
    "embed_rp_knn" ->
      """WITH sg AS (SELECT j, i,
        |       CASE WHEN CAST('0x' || substr(md5(CAST(j AS VARCHAR) ||
        |              '|' || CAST(i AS VARCHAR)), 1, 15) AS BIGINT)
        |              % 2 = 0
        |            THEN 1.0 ELSE -1.0 END AS w
        |     FROM range(16) a(j) CROSS JOIN range(64) b(i)),
        |sm AS (SELECT j, list(w ORDER BY i) AS wv FROM sg GROUP BY j),
        |e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v
        |      FROM embeddings),
        |q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
        |      FROM embeddings WHERE vec_id < 5),
        |ep AS (SELECT id, list(list_inner_product(v, wv) ORDER BY j)
        |         AS pv
        |       FROM e CROSS JOIN sm GROUP BY id, v),
        |qp AS (SELECT qid, list(list_inner_product(qv, wv) ORDER BY j)
        |         AS pv
        |       FROM q CROSS JOIN sm GROUP BY qid, qv),
        |cand AS (SELECT qid, id FROM (
        |    SELECT qp.qid, ep.id, row_number() OVER (PARTITION BY qp.qid
        |      ORDER BY list_distance(ep.pv, qp.pv), ep.id) AS rn
        |    FROM ep CROSS JOIN qp) WHERE rn <= 100),
        |rr AS (SELECT c.qid, c.id, list_cosine_similarity(e.v, q.qv) AS s
        |       FROM cand c JOIN e ON c.id = e.id JOIN q ON c.qid = q.qid),
        |rk AS (SELECT qid, id, s, row_number() OVER (PARTITION BY qid
        |         ORDER BY s DESC, id) AS rk
        |       FROM rr WHERE s IS NOT NULL)
        |SELECT qid, rk, id AS nn_id, round(s, 4) AS score
        |FROM rk WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,
    // MRL prefix-dim search: cosine over the first 16 dims shortlists
    // 40, exact full-dim cosine reranks to 10 (DuckDB list slice
    // v[1:16] = Spark slice(vec, 1, 16))
    "vdb_knn_mrl" ->
      """WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v
        |           FROM embeddings),
        |q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
        |      FROM embeddings WHERE vec_id < 5),
        |ps AS (SELECT q.qid, e.id,
        |              list_cosine_similarity(e.v[1:16], q.qv[1:16]) AS s
        |       FROM e CROSS JOIN q),
        |sr AS (SELECT qid, id, row_number() OVER (PARTITION BY qid
        |         ORDER BY s DESC, id) AS rk
        |       FROM ps WHERE s IS NOT NULL),
        |sl AS (SELECT qid, id FROM sr WHERE rk <= 40),
        |re AS (SELECT sl.qid, sl.id,
        |              list_cosine_similarity(e.v, q.qv) AS s
        |       FROM sl JOIN e ON sl.id = e.id JOIN q ON sl.qid = q.qid),
        |r AS (SELECT qid, id, s, row_number() OVER (PARTITION BY qid
        |        ORDER BY s DESC, id) AS rk
        |      FROM re WHERE s IS NOT NULL)
        |SELECT qid, rk, id AS nn_id, round(s, 4) AS score
        |FROM r WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,
    // IVF+MRL: prefix-cosine shortlist of 40 over probed cells, exact
    // full-dim rerank (the vdb_knn_mrl mirror under the IVF probe set)
    "ann_ivf_mrl" ->
      s"""WITH $ivfCtes,
         |ps AS (SELECT pr.qid, a.id,
         |         list_cosine_similarity(a.v[1:16], q.qv[1:16]) AS s
         |       FROM af a JOIN pr ON a.cell = pr.cell
         |       JOIN q ON pr.qid = q.qid),
         |sr AS (SELECT qid, id, row_number() OVER (PARTITION BY qid
         |         ORDER BY s DESC, id) AS rk
         |       FROM ps WHERE s IS NOT NULL),
         |sl AS (SELECT qid, id FROM sr WHERE rk <= 40),
         |re AS (SELECT sl.qid, sl.id,
         |         list_cosine_similarity(e2.v, q.qv) AS s
         |       FROM sl JOIN e e2 ON sl.id = e2.id
         |       JOIN q ON sl.qid = q.qid),
         |r AS (SELECT qid, id, s, row_number() OVER (PARTITION BY qid
         |        ORDER BY s DESC, id) AS rk
         |      FROM re WHERE s IS NOT NULL)
         |SELECT qid, rk, id AS nn_id, round(s, 4) AS score
         |FROM r WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,
    // recall@10 of plain sign-LSH vs brute force — the bucket-overlap
    // eval beside the IVF probe eval; same composed-mirror pattern
    "lsh_recall_report" ->
      s"""WITH ${lshCtes(multiprobe = false)},
         |iv AS (SELECT qid, id FROM r WHERE rk <= 10),
         |bd AS (SELECT q.qid, e2.id, list_cosine_similarity(e2.v, q.qv)
         |         AS s
         |       FROM e e2 CROSS JOIN q),
         |br AS (SELECT qid, id, s, row_number() OVER (PARTITION BY qid
         |         ORDER BY s DESC, id) AS rk
         |       FROM bd WHERE s IS NOT NULL),
         |bf AS (SELECT qid, id FROM br WHERE rk <= 10),
         |h AS (SELECT iv.qid, CAST(count(*) AS BIGINT) AS hits
         |      FROM iv JOIN bf ON iv.qid = bf.qid AND iv.id = bf.id
         |      GROUP BY 1)
         |SELECT qid, hits, round(hits / 10.0, 4) AS recall
         |FROM h ORDER BY qid""".stripMargin,
    // event-transition matrix: per-user lag pairs, row-normalized
    // top paths: trigram sequences per user, counted then ranked over
    // the states³-sized path table
    "events_top_paths" ->
      """WITH p AS (SELECT user_id, event_type AS t1,
        |             lead(event_type, 1) OVER (PARTITION BY user_id
        |               ORDER BY ts, event_id) AS t2,
        |             lead(event_type, 2) OVER (PARTITION BY user_id
        |               ORDER BY ts, event_id) AS t3
        |           FROM events),
        |g AS (SELECT t1 || ' > ' || t2 || ' > ' || t3 AS path,
        |             CAST(count(*) AS BIGINT) AS n
        |      FROM p WHERE t3 IS NOT NULL GROUP BY 1),
        |r AS (SELECT path, n, row_number() OVER (ORDER BY n DESC, path)
        |        AS rank FROM g)
        |SELECT rank, path, n FROM r WHERE rank <= 10
        |ORDER BY rank""".stripMargin,
    "events_transitions" ->
      """WITH p AS (SELECT user_id, event_type,
        |             lag(event_type) OVER (PARTITION BY user_id
        |               ORDER BY ts, event_id) AS from_type
        |           FROM events),
        |g AS (SELECT from_type, event_type AS to_type,
        |             CAST(count(*) AS BIGINT) AS n
        |      FROM p WHERE from_type IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS row_n
        |      FROM g GROUP BY 1)
        |SELECT g.from_type, g.to_type, g.n,
        |       round(CAST(g.n AS DOUBLE) / t.row_n, 4) AS p
        |FROM g JOIN t ON g.from_type = t.from_type
        |ORDER BY g.from_type, g.to_type""".stripMargin,
    // schema-on-read: props JSON parsed inside the scan projection
    "events_json_props" ->
      """SELECT event_type,
        |       CAST(CAST(json_extract_string(props, '$.k') AS BIGINT)
        |         // 25 AS BIGINT) AS k_band,
        |       CAST(count(*) AS BIGINT) AS n,
        |       round(sum(value), 4) AS sum_value
        |FROM events GROUP BY 1, 2
        |ORDER BY event_type, k_band""".stripMargin,
    // filtered indexed search: the same probe set, members restricted
    // by the metadata predicate BEFORE scoring (reference
    // filter_index.cc bitmaps under the approximate path)
    // adaptive filtered search: the PLANNER is mirrored too — the
    // oracle computes the same STATS-DRIVEN estimate (exact total +
    // md5-hash-sample match count scaled by 8, floored at 1 — the
    // planner sidecar's semantics) and gates the same two branch
    // CTEs on est·10 < total, so a branch-choice divergence is a
    // hash mismatch, not a silent plan difference
    "ann_adaptive_filter" ->
      s"""WITH $ivfCtes,
         |tt AS (SELECT CAST(count(*) AS BIGINT) AS t FROM embeddings),
         |sm AS (SELECT vec_id, label FROM embeddings
         |       WHERE CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)),
         |         1, 15) AS BIGINT) % 8 = 0),
         |nc AS (SELECT greatest(CAST(count(*) * 8 AS BIGINT), 1) AS c
         |       FROM sm WHERE label = 5 AND vec_id % 4 = 0),
         |bc AS (SELECT greatest(CAST(count(*) * 8 AS BIGINT), 1) AS c
         |       FROM sm WHERE label BETWEEN 2 AND 6),
         |nbd AS (SELECT q.qid, e2.vec_id AS nn_id,
         |          list_cosine_similarity(e2.embedding::DOUBLE[], q.qv) AS s
         |        FROM embeddings e2 CROSS JOIN q
         |        WHERE e2.label = 5 AND e2.vec_id % 4 = 0),
         |nbr AS (SELECT qid, nn_id, s, row_number() OVER (
         |          PARTITION BY qid ORDER BY s DESC, nn_id) AS rk
         |        FROM nbd WHERE s IS NOT NULL),
         |nfl AS (SELECT a.id, a.v, a.cell FROM af a
         |        JOIN embeddings em ON a.id = em.vec_id
         |        WHERE em.label = 5 AND em.vec_id % 4 = 0),
         |nsc AS (SELECT pr.qid, f.id, list_cosine_similarity(f.v, q.qv) AS s
         |        FROM nfl f JOIN pr ON f.cell = pr.cell
         |        JOIN q ON pr.qid = q.qid),
         |nir AS (SELECT qid, id, s, row_number() OVER (
         |          PARTITION BY qid ORDER BY s DESC, id) AS rk
         |        FROM nsc WHERE s IS NOT NULL),
         |bbd AS (SELECT q.qid, e2.vec_id AS nn_id,
         |          list_cosine_similarity(e2.embedding::DOUBLE[], q.qv) AS s
         |        FROM embeddings e2 CROSS JOIN q
         |        WHERE e2.label BETWEEN 2 AND 6),
         |bbr AS (SELECT qid, nn_id, s, row_number() OVER (
         |          PARTITION BY qid ORDER BY s DESC, nn_id) AS rk
         |        FROM bbd WHERE s IS NOT NULL),
         |bfl AS (SELECT a.id, a.v, a.cell FROM af a
         |        JOIN embeddings em ON a.id = em.vec_id
         |        WHERE em.label BETWEEN 2 AND 6),
         |bsc AS (SELECT pr.qid, f.id, list_cosine_similarity(f.v, q.qv) AS s
         |        FROM bfl f JOIN pr ON f.cell = pr.cell
         |        JOIN q ON pr.qid = q.qid),
         |bir AS (SELECT qid, id, s, row_number() OVER (
         |          PARTITION BY qid ORDER BY s DESC, id) AS rk
         |        FROM bsc WHERE s IS NOT NULL)
         |SELECT 'narrow' AS pred, 'prefilter_exact' AS strategy,
         |       qid, rk, nn_id, round(s, 4) AS score
         |FROM nbr CROSS JOIN nc CROSS JOIN tt
         |WHERE rk <= 10 AND c * 10 < t
         |UNION ALL
         |SELECT 'narrow', 'ivf_filtered', qid, rk, id, round(s, 4)
         |FROM nir CROSS JOIN nc CROSS JOIN tt
         |WHERE rk <= 10 AND c * 10 >= t
         |UNION ALL
         |SELECT 'broad', 'prefilter_exact', qid, rk, nn_id, round(s, 4)
         |FROM bbr CROSS JOIN bc CROSS JOIN tt
         |WHERE rk <= 10 AND c * 10 < t
         |UNION ALL
         |SELECT 'broad', 'ivf_filtered', qid, rk, id, round(s, 4)
         |FROM bir CROSS JOIN bc CROSS JOIN tt
         |WHERE rk <= 10 AND c * 10 >= t
         |ORDER BY pred, qid, rk""".stripMargin,
    "ann_ivf_filtered" ->
      s"""WITH $ivfCtes,
         |fl AS (SELECT a.id, a.v, a.cell FROM af a
         |       JOIN embeddings em ON a.id = em.vec_id
         |       WHERE em.label BETWEEN 2 AND 6),
         |sc AS (SELECT pr.qid, f.id, list_cosine_similarity(f.v, q.qv) AS s
         |       FROM fl f JOIN pr ON f.cell = pr.cell
         |            JOIN q ON pr.qid = q.qid),
         |r AS (SELECT qid, id, s,
         |             row_number() OVER (PARTITION BY qid ORDER BY s DESC, id)
         |               AS rk
         |      FROM sc WHERE s IS NOT NULL)
         |SELECT qid, rk, id AS nn_id, round(s, 4) AS score
         |FROM r WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,
    // radius search (Knn.radius, cosine >= 0.25): plain filter over
    // the scored pairs, no top-k
    "vdb_range_search" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
        |           FROM embeddings WHERE vec_id < 5),
        |d AS (SELECT q.qid, e.vec_id AS nn_id,
        |             list_cosine_similarity(e.embedding::DOUBLE[], q.qv) AS s
        |      FROM embeddings e CROSS JOIN q)
        |SELECT qid, nn_id, round(s, 4) AS score
        |FROM d WHERE s IS NOT NULL AND s >= 0.25
        |ORDER BY qid, nn_id""".stripMargin,
    // IVF+SQ8 (Ann.ivfSq8Search, k=10 nprobe=2 rerank=4): the same
    // probe set, a code-space COSINE shortlist of 40 per query over
    // probed cells (codes decoded x = mn + c·(mx-mn)/255, the
    // VecCosineQ8 arithmetic), then the exact float rerank. The
    // encode grid mirrors vdb_knn_sq8's (round clamp 0..255).
    "ann_ivf_sq8" ->
      s"""WITH $ivfCtes,
         |dims AS (SELECT i, min(v[i]) AS mn, max(v[i]) AS mx
         |         FROM e, (SELECT unnest(range(1, 65)) AS i) GROUP BY i),
         |mm AS (SELECT list(mn ORDER BY i) AS mns,
         |              list(mx ORDER BY i) AS mxs FROM dims),
         |codes AS (SELECT id, cell, list_transform(range(1, 65), i ->
         |            CASE WHEN mm.mxs[i] - mm.mns[i] <= 0 THEN 0
         |                 ELSE least(255, greatest(0,
         |                   round((t.v[i] - mm.mns[i])
         |                     / (mm.mxs[i] - mm.mns[i]) * 255))) END) AS c
         |          FROM af t, mm),
         |qcodes AS (SELECT qid, list_transform(range(1, 65), i ->
         |            CASE WHEN mm.mxs[i] - mm.mns[i] <= 0 THEN 0
         |                 ELSE least(255, greatest(0,
         |                   round((qv[i] - mm.mns[i])
         |                     / (mm.mxs[i] - mm.mns[i]) * 255))) END) AS qc
         |           FROM q, mm),
         |dq AS (SELECT pr.qid, co.id,
         |         list_transform(range(1, 65), i ->
         |           mm.mns[i] + co.c[i] * ((mm.mxs[i] - mm.mns[i]) / 255)) AS xs,
         |         list_transform(range(1, 65), i ->
         |           mm.mns[i] + qc.qc[i] * ((mm.mxs[i] - mm.mns[i]) / 255)) AS ys
         |       FROM codes co JOIN pr ON co.cell = pr.cell
         |            JOIN qcodes qc ON pr.qid = qc.qid, mm),
         |q8 AS (SELECT qid, id,
         |         list_inner_product(xs, ys)
         |           / (sqrt(list_inner_product(xs, xs))
         |              * sqrt(list_inner_product(ys, ys))) AS qcos
         |       FROM dq),
         |sl AS (SELECT qid, id FROM (
         |         SELECT qid, id,
         |                row_number() OVER (PARTITION BY qid
         |                                   ORDER BY qcos DESC, id) AS r
         |         FROM q8 WHERE qcos IS NOT NULL) WHERE r <= 40),
         |rr AS (SELECT sl.qid, sl.id, list_cosine_similarity(e.v, q.qv) AS s
         |       FROM sl JOIN e ON sl.id = e.id JOIN q ON sl.qid = q.qid),
         |rk AS (SELECT qid, id, s,
         |              row_number() OVER (PARTITION BY qid
         |                                 ORDER BY s DESC, id) AS rk
         |       FROM rr WHERE s IS NOT NULL)
         |SELECT qid, rk, id AS nn_id, round(s, 4) AS score
         |FROM rk WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,
    // binary codes under IVF: the vdb_knn_bq pack/Hamming mirror
    // composed with the IVF train+assign+probe mirror; means trained
    // on the whole corpus, codes carried per assigned row
    "ann_ivf_bq" ->
      s"""WITH $ivfCtes,
         |dims AS (SELECT i, round(avg(v[i]), 6) AS mu
         |         FROM e, (SELECT unnest(range(1, 65)) AS i) GROUP BY i),
         |mus AS (SELECT list(mu ORDER BY i) AS m FROM dims),
         |codes AS (SELECT id, cell, list_transform(range(0, 2), w ->
         |            CAST(list_sum(list_transform(range(1, 33), j ->
         |              CASE WHEN t.v[CAST(w * 32 + j AS INT)]
         |                        > mus.m[CAST(w * 32 + j AS INT)]
         |                   THEN CAST(1 AS BIGINT) << CAST(j - 1 AS INT)
         |                   ELSE CAST(0 AS BIGINT) END)) AS BIGINT)) AS c
         |          FROM af t, mus),
         |qcodes AS (SELECT qid, list_transform(range(0, 2), w ->
         |            CAST(list_sum(list_transform(range(1, 33), j ->
         |              CASE WHEN qv[CAST(w * 32 + j AS INT)]
         |                        > mus.m[CAST(w * 32 + j AS INT)]
         |                   THEN CAST(1 AS BIGINT) << CAST(j - 1 AS INT)
         |                   ELSE CAST(0 AS BIGINT) END)) AS BIGINT)) AS qc
         |           FROM q, mus),
         |h AS (SELECT pr.qid, co.id,
         |        CAST(bit_count(xor(co.c[1], qc.qc[1])) AS BIGINT)
         |      + CAST(bit_count(xor(co.c[2], qc.qc[2])) AS BIGINT) AS hd
         |      FROM codes co JOIN pr ON co.cell = pr.cell
         |           JOIN qcodes qc ON pr.qid = qc.qid),
         |sl AS (SELECT qid, id FROM (
         |         SELECT qid, id,
         |                row_number() OVER (PARTITION BY qid
         |                                   ORDER BY hd, id) AS r
         |         FROM h) WHERE r <= 40),
         |rr AS (SELECT sl.qid, sl.id, list_cosine_similarity(e.v, q.qv) AS s
         |       FROM sl JOIN e ON sl.id = e.id JOIN q ON sl.qid = q.qid),
         |rk AS (SELECT qid, id, s,
         |              row_number() OVER (PARTITION BY qid
         |                                 ORDER BY s DESC, id) AS rk
         |       FROM rr WHERE s IS NOT NULL)
         |SELECT qid, rk, id AS nn_id, round(s, 4) AS score
         |FROM rk WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,
    // sign-LSH (Ann.lshSearch, 4 tables × 4 bits): hyperplane
    // components from md5("t|p|d") exactly as dedup_embedding_cos's
    // oracle; candidates share any (table, sig) bucket with the
    // query; exact cosine rerank top-10.
    "ann_lsh" -> lshOracle(multiprobe = false),
    // multi-probe: the query's own bucket PLUS the 4 buckets one
    // sign-flip away in each table (Ann.lshSearchMultiprobe)
    "ann_lsh_multiprobe" -> lshOracle(multiprobe = true),
    "text_bm25_topk" ->
      s"""WITH $bm25Ctes
         |SELECT qid, rk, doc_id, score FROM r WHERE rk <= 10
         |ORDER BY qid, rk""".stripMargin,
    // BM25F: title = first 8 tokens (weight 2), body = rest (weight
    // 1); per-field normalization inside the weighted tf̃, doc-level
    // idf; field legs pivot to COLUMNS so the weighted sum is one
    // fixed-order double expression
    "search_bm25f" ->
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks,
         |        CAST(least(len(string_split(text, ' ')), 8) AS DOUBLE)
         |          AS dl_t,
         |        CAST(greatest(len(string_split(text, ' ')) - 8, 0)
         |          AS DOUBLE) AS dl_b
         |      FROM documents),
         |st AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
         |         avg(dl_t) AS avg_t, avg(dl_b) AS avg_b FROM d),
         |q AS ($bm25QValues),
         |qt AS (SELECT DISTINCT qid, term FROM
         |        (SELECT qid, unnest(string_split(qtext, ' ')) AS term
         |         FROM q)),
         |terms AS (SELECT DISTINCT term FROM qt),
         |ex AS (SELECT doc_id, dl_t, dl_b,
         |         toks[CAST(i AS INTEGER)] AS term, i - 1 AS pos
         |       FROM d, unnest(range(1, len(toks) + 1)) AS t(i)),
         |p AS (SELECT doc_id, term, dl_t, dl_b,
         |        CAST(sum(CASE WHEN pos < 8 THEN 1 ELSE 0 END)
         |          AS DOUBLE) AS tf_t,
         |        CAST(sum(CASE WHEN pos >= 8 THEN 1 ELSE 0 END)
         |          AS DOUBLE) AS tf_b
         |      FROM ex JOIN terms USING (term) GROUP BY 1, 2, 3, 4),
         |idf AS (SELECT term,
         |          ln((st.n_docs - dfreq + CAST(0.5 AS DOUBLE))
         |             / (dfreq + CAST(0.5 AS DOUBLE))
         |             + CAST(1.0 AS DOUBLE)) AS idf,
         |          st.avg_t, st.avg_b
         |        FROM (SELECT term, CAST(count(*) AS DOUBLE) AS dfreq
         |              FROM p GROUP BY 1), st),
         |tc AS (SELECT qt.qid, p.doc_id, idf.idf,
         |         CAST(2.0 AS DOUBLE) * p.tf_t
         |           / (CAST(0.25 AS DOUBLE)
         |              + CAST(0.75 AS DOUBLE) * p.dl_t / idf.avg_t)
         |         + CAST(1.0 AS DOUBLE) * p.tf_b
         |           / (CAST(0.25 AS DOUBLE)
         |              + CAST(0.75 AS DOUBLE) * p.dl_b / idf.avg_b)
         |           AS tfn
         |       FROM p JOIN idf USING (term) JOIN qt USING (term)),
         |c AS (SELECT qid, doc_id,
         |        idf * tfn / (CAST(1.2 AS DOUBLE) + tfn) AS contrib
         |      FROM tc),
         |fsc AS (SELECT qid, doc_id, round(sum(contrib), 4) AS score
         |        FROM c GROUP BY 1, 2),
         |fr2 AS (SELECT qid, doc_id, score,
         |          row_number() OVER (PARTITION BY qid
         |            ORDER BY score DESC, doc_id) AS rk
         |        FROM fsc)
         |SELECT qid, rk, doc_id, score FROM fr2 WHERE rk <= 10
         |ORDER BY qid, rk""".stripMargin,
    // filter-query semantics: global idf/avgdl, candidates restricted
    "text_bm25_filtered" ->
      s"""WITH ${bm25CtesWhere(" WHERE p.doc_id IN (SELECT doc_id " +
           "FROM documents WHERE lang IN ('en', 'de'))")}
         |SELECT qid, rk, doc_id, score FROM r WHERE rk <= 10
         |ORDER BY qid, rk""".stripMargin,
    // persisted-postings twin: same integers (tf, df, N, dl) into the
    // same formula → equal to the on-the-fly path by construction
    // (SearchSpec pins it), so it shares the oracle
    "text_bm25_indexed" ->
      s"""WITH $bm25Ctes
         |SELECT qid, rk, doc_id, score FROM r WHERE rk <= 10
         |ORDER BY qid, rk""".stripMargin,
    // facets from the RESULT SET: lang/source distributions of the
    // bm25 top-10, stacked facet dims
    "search_facets" ->
      s"""WITH $bm25Ctes,
         |h AS (SELECT r.qid, d.lang, d.source
         |      FROM r JOIN documents d USING (doc_id) WHERE r.rk <= 10),
         |u AS (SELECT qid, 'lang' AS facet, lang AS value FROM h
         |      UNION ALL SELECT qid, 'source', source FROM h)
         |SELECT qid, facet, value, CAST(count(*) AS BIGINT) AS n
         |FROM u GROUP BY 1, 2, 3 ORDER BY qid, facet, value""".stripMargin,
    "search_mmr_rerank" -> mmrOracle,
    // spell correction: OOV query terms replaced by their ED-1 vocab
    // neighbor (df DESC, term tiebreak; naive levenshtein join here
    // — the Spark side uses SymSpell deletion blocking), corrected
    // queries feed the SAME bm25 chain via the custom q source
    "search_spell_correct" -> spellOracle,
    // autocomplete: top-3 completions per 2-char vocabulary prefix
    // by document frequency (same distinct-per-doc tokenization)
    "search_query_suggest" ->
      """WITH toks AS (SELECT DISTINCT doc_id, t.term FROM documents,
        |                unnest(string_split(text, ' ')) AS t(term)
        |              WHERE len(t.term) >= 3),
        |v AS (SELECT term, CAST(count(*) AS BIGINT) AS df
        |      FROM toks GROUP BY 1 HAVING count(*) >= 5),
        |p AS (SELECT substr(term, 1, 2) AS prefix, term, df,
        |        row_number() OVER (PARTITION BY substr(term, 1, 2)
        |                           ORDER BY df DESC, term) AS rk
        |      FROM v)
        |SELECT prefix, rk, term, df FROM p WHERE rk <= 3
        |ORDER BY prefix, rk""".stripMargin,
    // persisted-dictionary twin: identical correction semantics
    // (SearchSpec pins equality + bucket pruning), shares the oracle
    "search_spell_indexed" -> spellOracle,
    // boolean retrieval: conjunction = counting over the distinct
    // postings, NOT leg as an anti-join (NOT EXISTS)
    "search_boolean" ->
      """WITH must AS (SELECT * FROM (VALUES (0, 'spark'), (0, 'join'),
        |                (1, 'vector'), (1, 'scan'), (2, 'customer'),
        |                (2, 'order')) AS t(qid, term)),
        |nm AS (SELECT qid, CAST(count(*) AS BIGINT) AS n_must
        |       FROM must GROUP BY 1),
        |nt AS (SELECT * FROM (VALUES (0, 'slow'), (1, 'dup'),
        |         (2, 'big')) AS t(qid, term)),
        |toks AS (SELECT DISTINCT doc_id, t.term FROM documents,
        |           unnest(string_split(text, ' ')) AS t(term)),
        |conj AS (SELECT m.qid, toks.doc_id,
        |           CAST(count(*) AS BIGINT) AS n_hit
        |         FROM toks JOIN must m USING (term) GROUP BY 1, 2),
        |hits AS (SELECT c.qid, c.doc_id FROM conj c JOIN nm USING (qid)
        |         WHERE c.n_hit = nm.n_must),
        |ex AS (SELECT n.qid, toks.doc_id
        |       FROM toks JOIN nt n USING (term))
        |SELECT qid, doc_id FROM hits
        |WHERE NOT EXISTS (SELECT 1 FROM ex
        |  WHERE ex.qid = hits.qid AND ex.doc_id = hits.doc_id)
        |ORDER BY qid, doc_id""".stripMargin,
    // wildcard: dictionary probe on the 2-char prefix bucket +
    // residual starts_with, docs ranked by total matching-term tf
    "search_prefix" -> prefixOracle,
    // persisted-dictionary twin: identical semantics off the
    // pfx-partitioned dictionary + pruned postings (SearchSpec pins
    // equality + both prunings), shares the oracle
    "search_prefix_indexed" -> prefixOracle,
    // pseudo-relevance feedback: round-1 bm25 (shared CTEs) → top-5
    // feedback docs → tf·idf-ranked expansion terms (NOT EXISTS
    // drops original query terms, sorted-list append keeps the
    // expanded string deterministic) → round-2 bm25 with y-prefixed
    // CTE copies over the SAME d/st/ex corpus CTEs
    "search_prf_expand" ->
      s"""WITH $bm25Ctes,
         |t5 AS (SELECT qid, doc_id FROM r WHERE rk <= 5),
         |fb AS (SELECT t5.qid, ex.term, CAST(count(*) AS BIGINT) AS tf
         |       FROM t5 JOIN ex ON t5.doc_id = ex.doc_id
         |       GROUP BY 1, 2),
         |cand AS (SELECT fb.qid, fb.term, fb.tf FROM fb
         |         WHERE NOT EXISTS (SELECT 1 FROM qt
         |           WHERE qt.qid = fb.qid AND qt.term = fb.term)),
         |cdf AS (SELECT ex.term,
         |          CAST(count(DISTINCT ex.doc_id) AS DOUBLE) AS dfreq
         |        FROM ex JOIN (SELECT DISTINCT term FROM cand) ct
         |          ON ex.term = ct.term
         |        GROUP BY 1),
         |ws AS (SELECT cand.qid, cand.term,
         |         cand.tf * ln((SELECT n_docs FROM st) / cdf.dfreq) AS w
         |       FROM cand JOIN cdf ON cand.term = cdf.term),
         |exp3 AS (SELECT qid, term FROM (SELECT qid, term,
         |           row_number() OVER (PARTITION BY qid
         |             ORDER BY w DESC, term) AS xrk
         |         FROM ws) WHERE xrk <= 3),
         |q2 AS (SELECT q.qid, CASE WHEN e.ext IS NOT NULL
         |           THEN concat(q.qtext, ' ', e.ext) ELSE q.qtext END
         |           AS qtext
         |       FROM q LEFT JOIN (SELECT qid,
         |           array_to_string(list_sort(list(term)), ' ') AS ext
         |         FROM exp3 GROUP BY qid) e ON q.qid = e.qid),
         |yqt AS (SELECT DISTINCT qid, term FROM
         |        (SELECT qid, unnest(string_split(qtext, ' ')) AS term
         |         FROM q2)),
         |yterms AS (SELECT DISTINCT term FROM yqt),
         |yp AS (SELECT term, doc_id, dl, CAST(count(*) AS DOUBLE) AS tf
         |      FROM ex JOIN yterms USING (term) GROUP BY 1, 2, 3),
         |yidf AS (SELECT term,
         |               ln((st.n_docs - dfreq + CAST(0.5 AS DOUBLE))
         |                  / (dfreq + CAST(0.5 AS DOUBLE))
         |                  + CAST(1.0 AS DOUBLE)) AS idf,
         |               st.avgdl
         |        FROM (SELECT term, CAST(count(*) AS DOUBLE) AS dfreq
         |              FROM yp GROUP BY 1), st),
         |yc AS (SELECT yqt.qid, yp.doc_id,
         |             yidf.idf * yp.tf
         |             * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE))
         |             / (yp.tf + CAST(1.2 AS DOUBLE)
         |                * (CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE)
         |                   + CAST(0.75 AS DOUBLE) * yp.dl / yidf.avgdl))
         |               AS contrib
         |      FROM yp JOIN yidf USING (term) JOIN yqt USING (term)),
         |ysc AS (SELECT qid, doc_id, round(sum(contrib), 4) AS score
         |       FROM yc GROUP BY 1, 2),
         |yr AS (SELECT qid, doc_id, score,
         |             row_number() OVER (PARTITION BY qid
         |                                ORDER BY score DESC, doc_id) AS rk
         |      FROM ysc)
         |SELECT qid, rk, doc_id, score FROM yr WHERE rk <= 10
         |ORDER BY qid, rk""".stripMargin,
    // RRF fusion of the BM25 top-20 with the cosine top-20 (self
    // match included — Knn.topK does not exclude it). rrf arithmetic
    // is integer-derived → bit-identical across engines; ranked on
    // the rounded rrf with doc_id tiebreak anyway for safety.
    "hybrid_search_rrf" ->
      s"""WITH $bm25Ctes,
         |b AS (SELECT qid, doc_id, rk FROM r WHERE rk <= 20),
         |qe AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
         |       FROM embeddings WHERE vec_id < 5),
         |cd AS (SELECT qe.qid, e.vec_id AS doc_id,
         |              list_cosine_similarity(e.embedding::DOUBLE[], qe.qv)
         |                AS s
         |       FROM embeddings e CROSS JOIN qe),
         |cr AS (SELECT qid, doc_id,
         |              row_number() OVER (PARTITION BY qid
         |                                 ORDER BY s DESC, doc_id) AS rk
         |       FROM cd),
         |c20 AS (SELECT qid, doc_id, rk FROM cr WHERE rk <= 20),
         |f AS (SELECT coalesce(b.qid, c20.qid) AS qid,
         |             coalesce(b.doc_id, c20.doc_id) AS doc_id,
         |             b.rk AS brk, c20.rk AS crk
         |      FROM b FULL OUTER JOIN c20
         |        ON b.qid = c20.qid AND b.doc_id = c20.doc_id),
         |g AS (SELECT qid, doc_id,
         |             round(coalesce(CAST(1.0 AS DOUBLE)
         |                              / (CAST(60.0 AS DOUBLE) + brk),
         |                            CAST(0.0 AS DOUBLE))
         |                 + coalesce(CAST(1.0 AS DOUBLE)
         |                              / (CAST(60.0 AS DOUBLE) + crk),
         |                            CAST(0.0 AS DOUBLE)), 6) AS rrf_score,
         |             coalesce(brk, 0) AS bm25_rk,
         |             coalesce(crk, 0) AS cos_rk
         |      FROM f),
         |h AS (SELECT *, row_number() OVER (PARTITION BY qid
         |                                   ORDER BY rrf_score DESC, doc_id)
         |                  AS rk FROM g)
         |SELECT qid, rk, doc_id, rrf_score, bm25_rk, cos_rk FROM h
         |WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,
    // sparse tf-idf dot: reuses the bm25 chain's p/idf/qt, different
    // scoring — tf·idf², no normalization/saturation by design
    "vdb_knn_sparse" -> sparseOracle,
    // persisted-postings twin: same integers into the same formula,
    // equal to the on-the-fly path by construction — shares the oracle
    "vdb_knn_sparse_indexed" -> sparseOracle,
    // alpha-weighted linear hybrid: per-query min-max normalized leg
    // scores (degenerate leg -> 1.0), fused rounded before ranking
    "hybrid_search_linear" ->
      s"""WITH $bm25Ctes,
         |b AS (SELECT qid, doc_id, score AS bs FROM r WHERE rk <= 20),
         |qe AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
         |       FROM embeddings WHERE vec_id < 5),
         |cd AS (SELECT qe.qid, e.vec_id AS doc_id,
         |              list_cosine_similarity(e.embedding::DOUBLE[], qe.qv)
         |                AS s
         |       FROM embeddings e CROSS JOIN qe),
         |cr AS (SELECT qid, doc_id, round(s, 4) AS cs,
         |              row_number() OVER (PARTITION BY qid
         |                                 ORDER BY s DESC, doc_id) AS rk
         |       FROM cd),
         |c20 AS (SELECT qid, doc_id, cs FROM cr WHERE rk <= 20),
         |bmm AS (SELECT qid, min(bs) AS mn, max(bs) AS mx
         |        FROM b GROUP BY 1),
         |bn AS (SELECT b.qid, b.doc_id,
         |         CASE WHEN bmm.mx = bmm.mn THEN CAST(1.0 AS DOUBLE)
         |           ELSE (b.bs - bmm.mn) / (bmm.mx - bmm.mn) END AS nb
         |       FROM b JOIN bmm USING (qid)),
         |cmm AS (SELECT qid, min(cs) AS mn, max(cs) AS mx
         |        FROM c20 GROUP BY 1),
         |cn AS (SELECT c20.qid, c20.doc_id,
         |         CASE WHEN cmm.mx = cmm.mn THEN CAST(1.0 AS DOUBLE)
         |           ELSE (c20.cs - cmm.mn) / (cmm.mx - cmm.mn) END AS nc
         |       FROM c20 JOIN cmm USING (qid)),
         |fu AS (SELECT coalesce(bn.qid, cn.qid) AS qid,
         |         coalesce(bn.doc_id, cn.doc_id) AS doc_id,
         |         bn.nb AS nb, cn.nc AS nc
         |       FROM bn FULL OUTER JOIN cn
         |         ON bn.qid = cn.qid AND bn.doc_id = cn.doc_id),
         |fg AS (SELECT qid, doc_id,
         |         round(CAST(0.5 AS DOUBLE)
         |             * coalesce(nc, CAST(0.0 AS DOUBLE))
         |           + CAST(0.5 AS DOUBLE)
         |             * coalesce(nb, CAST(0.0 AS DOUBLE)), 6) AS hybrid,
         |         round(coalesce(nb, CAST(0.0 AS DOUBLE)), 6) AS bm25_norm,
         |         round(coalesce(nc, CAST(0.0 AS DOUBLE)), 6) AS cos_norm
         |       FROM fu),
         |fh AS (SELECT *, row_number() OVER (PARTITION BY qid
         |         ORDER BY hybrid DESC, doc_id) AS rk FROM fg)
         |SELECT qid, rk, doc_id, hybrid AS hybrid_score, bm25_norm,
         |       cos_norm
         |FROM fh WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,
    // LTR fusion: integer-basis-point linear model over leg ranks +
    // quality prior; score is exact BIGINT so the ordering is
    // bit-deterministic (quality_bp = 4dp score ×10⁴, integral to
    // one ulp before the round-then-cast)
    "search_ltr_rerank" ->
      s"""WITH $bm25Ctes,
         |b AS (SELECT qid, doc_id, rk FROM r WHERE rk <= 20),
         |qe AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
         |       FROM embeddings WHERE vec_id < 5),
         |cd AS (SELECT qe.qid, e.vec_id AS doc_id,
         |              list_cosine_similarity(e.embedding::DOUBLE[], qe.qv)
         |                AS s
         |       FROM embeddings e CROSS JOIN qe),
         |cr AS (SELECT qid, doc_id,
         |              row_number() OVER (PARTITION BY qid
         |                                 ORDER BY s DESC, doc_id) AS rk
         |       FROM cd),
         |c20 AS (SELECT qid, doc_id, rk FROM cr WHERE rk <= 20),
         |qs AS (SELECT doc_id, len(toks) AS n_tokens,
         |         len(list_filter(toks,
         |           t -> t IN ('the','a','and','of','to','in','is')))
         |           *1.0/len(toks) AS sw,
         |         1.0 - len(list_distinct(toks))*1.0/len(toks) AS rep
         |       FROM d),
         |qb AS (SELECT doc_id, CAST(round(round((least(n_tokens/50.0, 1.0)
         |         + CASE WHEN sw BETWEEN 0.01 AND 0.6 THEN 1.0 ELSE 0.0 END
         |         + (1.0 - least(rep/0.9, 1.0))) / 3.0, 4) * 10000)
         |         AS BIGINT) AS q_bp
         |       FROM qs),
         |f AS (SELECT coalesce(b.qid, c20.qid) AS qid,
         |             coalesce(b.doc_id, c20.doc_id) AS doc_id,
         |             b.rk AS brk, c20.rk AS crk
         |      FROM b FULL OUTER JOIN c20
         |        ON b.qid = c20.qid AND b.doc_id = c20.doc_id),
         |g AS (SELECT f.qid, f.doc_id,
         |             300*(21 - coalesce(brk, 21))
         |               + 300*(21 - coalesce(crk, 21))
         |               + coalesce(q_bp, 0) AS score_bp,
         |             coalesce(brk, 0) AS bm25_rk,
         |             coalesce(crk, 0) AS cos_rk,
         |             coalesce(q_bp, 0) AS quality_bp
         |      FROM f LEFT JOIN qb ON f.doc_id = qb.doc_id),
         |h AS (SELECT *, row_number() OVER (PARTITION BY qid
         |                                   ORDER BY score_bp DESC, doc_id)
         |                  AS rk FROM g)
         |SELECT qid, rk, doc_id, CAST(score_bp AS BIGINT) AS score_bp,
         |       bm25_rk, cos_rk, CAST(quality_bp AS BIGINT) AS quality_bp
         |FROM h WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,
    // phrase search: anchor = pos − i collapses the m-way positional
    // self-join into one join + one (doc, anchor) aggregate
    "text_phrase_search" ->
      """WITH p(phrase, i, tok) AS (VALUES
        |    ('table hash', 0, 'table'), ('table hash', 1, 'hash'),
        |    ('customer join', 0, 'customer'), ('customer join', 1, 'join'),
        |    ('table hash value', 0, 'table'),
        |    ('table hash value', 1, 'hash'),
        |    ('table hash value', 2, 'value')),
        |m AS (SELECT phrase, CAST(count(*) AS BIGINT) AS m
        |      FROM p GROUP BY 1),
        |dt AS (SELECT doc_id, string_split(text, ' ') AS ts
        |       FROM documents),
        |t AS (SELECT doc_id, g.i - 1 AS pos, ts[g.i] AS tok
        |      FROM dt CROSS JOIN generate_series(1, 128) AS g(i)
        |      WHERE g.i <= len(ts)),
        |occ AS (SELECT p.phrase, t.doc_id, t.pos - p.i AS anchor,
        |               count(DISTINCT p.i) AS hits
        |        FROM t JOIN p ON t.tok = p.tok
        |        GROUP BY 1, 2, 3),
        |fo AS (SELECT o.phrase, o.doc_id, CAST(count(*) AS BIGINT) AS n_occ
        |       FROM occ o JOIN m USING (phrase)
        |       WHERE o.hits = m.m GROUP BY 1, 2),
        |r AS (SELECT phrase, doc_id, n_occ, row_number() OVER (
        |        PARTITION BY phrase ORDER BY n_occ DESC, doc_id) AS rk
        |      FROM fo)
        |SELECT phrase, rk, doc_id, n_occ
        |FROM r WHERE rk <= 10 ORDER BY phrase, rk""".stripMargin,
    // KWIC snippets on the shared BM25 chain: hit docs only
    // re-tokenize with positions, first query-term match anchors a
    // ±3-token slice
    "search_snippets" ->
      s"""WITH $bm25Ctes,
         |hits AS (SELECT qid, rk, doc_id FROM r WHERE rk <= 5),
         |tp AS (SELECT d.doc_id, g.i - 1 AS pos, d.toks[g.i] AS tok
         |       FROM d JOIN (SELECT DISTINCT doc_id FROM hits) hd
         |         USING (doc_id)
         |       CROSS JOIN generate_series(1, 128) AS g(i)
         |       WHERE g.i <= len(d.toks)),
         |an AS (SELECT h.qid, h.rk, h.doc_id, min(tp.pos) AS p
         |       FROM hits h JOIN qt ON h.qid = qt.qid
         |       JOIN tp ON tp.doc_id = h.doc_id AND tp.tok = qt.term
         |       GROUP BY 1, 2, 3)
         |SELECT an.qid, an.rk, an.doc_id,
         |       array_to_string(
         |         d.toks[greatest(p + 1 - 3, 1):(p + 1 + 3)], ' ')
         |         AS snippet
         |FROM an JOIN d USING (doc_id)
         |ORDER BY qid, rk""".stripMargin,
    // proximity phrase: all m distinct tokens inside an (m+slop)-
    // position window, matches counted by window start — the same
    // offset explode as the Spark plan
    "text_phrase_near" ->
      """WITH p(phrase, tok, m) AS (VALUES
        |    ('table hash', 'table', 2), ('table hash', 'hash', 2),
        |    ('customer join', 'customer', 2),
        |    ('customer join', 'join', 2),
        |    ('table hash value', 'table', 3),
        |    ('table hash value', 'hash', 3),
        |    ('table hash value', 'value', 3)),
        |dt AS (SELECT doc_id, string_split(text, ' ') AS ts
        |       FROM documents),
        |t AS (SELECT doc_id, g.i - 1 AS pos, ts[g.i] AS tok
        |      FROM dt CROSS JOIN generate_series(1, 128) AS g(i)
        |      WHERE g.i <= len(ts)),
        |wx AS (SELECT p.phrase, p.m, t.doc_id, t.tok,
        |         unnest(generate_series(greatest(t.pos - (p.m + 2) + 1,
        |           0), t.pos)) AS w
        |       FROM t JOIN p ON t.tok = p.tok),
        |mt AS (SELECT phrase, m, doc_id, w,
        |         count(DISTINCT tok) AS hits
        |       FROM wx GROUP BY 1, 2, 3, 4),
        |fo AS (SELECT phrase, doc_id, CAST(count(*) AS BIGINT) AS n_win
        |       FROM mt WHERE hits = m GROUP BY 1, 2),
        |r AS (SELECT phrase, doc_id, n_win, row_number() OVER (
        |        PARTITION BY phrase ORDER BY n_win DESC, doc_id) AS rk
        |      FROM fo)
        |SELECT phrase, rk, doc_id, n_win
        |FROM r WHERE rk <= 10 ORDER BY phrase, rk""".stripMargin,
    // MaxSim late interaction: per-(qtok, doc) max cosine quantized
    // to integer micro-units BEFORE the sum (round is monotone, so
    // quantize-then-max ≡ max-then-quantize; the fused score is then
    // exact BIGINT arithmetic on both engines)
    "search_maxsim" ->
      """WITH dt AS (SELECT CAST(vec_id AS BIGINT) // 8 AS doc_id,
        |                   embedding::DOUBLE[] AS v FROM embeddings),
        |qt AS (SELECT CAST(vec_id AS BIGINT) // 4 AS qid, vec_id AS qtok,
        |              embedding::DOUBLE[] AS qv
        |       FROM embeddings WHERE vec_id < 12),
        |m AS (SELECT qt.qid, qt.qtok, dt.doc_id,
        |             max(CAST(round(list_cosine_similarity(dt.v, qt.qv)
        |                            * 10000) AS BIGINT)) AS mu
        |      FROM dt CROSS JOIN qt GROUP BY 1, 2, 3),
        |sc AS (SELECT qid, doc_id, CAST(sum(mu) AS BIGINT) AS su
        |       FROM m GROUP BY 1, 2),
        |r AS (SELECT qid, doc_id, su,
        |             row_number() OVER (PARTITION BY qid
        |                                ORDER BY su DESC, doc_id) AS rk
        |      FROM sc)
        |SELECT qid, rk, doc_id, su / 10000.0 AS score
        |FROM r WHERE rk <= 5 ORDER BY qid, rk""".stripMargin,
    // mean pooling: per-element 6dp micro-units before the sum (exact
    // BIGINT totals), mean = one division of two exact integers
    "embed_mean_pool" ->
      """WITH dt AS (SELECT CAST(vec_id AS BIGINT) // 8 AS doc_id,
        |                   embedding::DOUBLE[] AS v FROM embeddings
        |            WHERE CAST(vec_id AS BIGINT) // 8 < 16),
        |x AS (SELECT doc_id, g.pos,
        |             CAST(round(v[g.pos] * 1000000) AS BIGINT) AS micro
        |      FROM dt CROSS JOIN generate_series(1, 64) AS g(pos)
        |      WHERE g.pos <= len(v)),
        |a AS (SELECT doc_id, pos, CAST(count(*) AS BIGINT) AS n_vecs,
        |             CAST(sum(micro) AS BIGINT) AS sm
        |      FROM x GROUP BY 1, 2)
        |SELECT doc_id, pos, n_vecs,
        |       round(CAST(sm AS DOUBLE)
        |             / CAST(n_vecs * 1000000 AS DOUBLE), 4) AS pooled
        |FROM a ORDER BY doc_id, pos""".stripMargin,
    // time travel through the SCD2 intervals: a past state is a
    // filter on the history, not a replay — both slices from one
    // interval build
    "vdb_time_travel" ->
      """WITH log AS (
        |  SELECT vec_id AS id, CAST(label AS BIGINT) AS label,
        |         CAST(1 AS BIGINT) AS version FROM embeddings
        |  UNION ALL
        |  SELECT vec_id, CAST(label + 100 AS BIGINT), CAST(2 AS BIGINT)
        |  FROM embeddings WHERE vec_id % 7 = 0
        |  UNION ALL
        |  SELECT vec_id, CAST(label + 100 AS BIGINT), CAST(3 AS BIGINT)
        |  FROM embeddings WHERE vec_id % 14 = 0
        |  UNION ALL
        |  SELECT vec_id, CAST(label + 300 AS BIGINT), CAST(4 AS BIGINT)
        |  FROM embeddings WHERE vec_id % 21 = 0),
        |chg AS (SELECT id, label, version,
        |          lag(label) OVER (PARTITION BY id ORDER BY version) AS prev
        |        FROM log),
        |scd AS (SELECT id, label, version AS valid_from,
        |          lead(version) OVER (PARTITION BY id ORDER BY version)
        |            AS valid_to
        |        FROM chg WHERE prev IS NULL OR prev <> label)
        |SELECT CAST(2 AS BIGINT) AS asof_v, id, label FROM scd
        |WHERE valid_from <= 2 AND (valid_to IS NULL OR valid_to > 2)
        |UNION ALL
        |SELECT CAST(3 AS BIGINT) AS asof_v, id, label FROM scd
        |WHERE valid_from <= 3 AND (valid_to IS NULL OR valid_to > 3)
        |ORDER BY asof_v, id""".stripMargin,
    // vdb_knn_sq8 is oracled despite being "approximate": the
    // quantization grid, the shortlist rule (top-40 by code-space L2,
    // ties by id), and the exact rerank are all deterministic pure
    // functions DuckDB replicates bit-for-bit — integer-literal
    // arithmetic only (DuckDB decimal literals would silently switch
    // the math to DECIMAL), same operation order, same sequential
    // list_sum fold as the codegen loop's accumulator.
    "vdb_knn_sq8" ->
      """WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v
        |           FROM embeddings),
        |q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
        |      FROM embeddings WHERE vec_id < 5),
        |dims AS (SELECT i, min(v[i]) AS mn, max(v[i]) AS mx
        |         FROM e, (SELECT unnest(range(1, 65)) AS i) GROUP BY i),
        |mm AS (SELECT list(mn ORDER BY i) AS mns,
        |              list(mx ORDER BY i) AS mxs FROM dims),
        |codes AS (SELECT id, list_transform(range(1, 65), i ->
        |            CASE WHEN mm.mxs[i] - mm.mns[i] <= 0 THEN 0
        |                 ELSE least(255, greatest(0,
        |                   round((v[i] - mm.mns[i])
        |                     / (mm.mxs[i] - mm.mns[i]) * 255))) END) AS c
        |          FROM e, mm),
        |qcodes AS (SELECT qid, list_transform(range(1, 65), i ->
        |            CASE WHEN mm.mxs[i] - mm.mns[i] <= 0 THEN 0
        |                 ELSE least(255, greatest(0,
        |                   round((qv[i] - mm.mns[i])
        |                     / (mm.mxs[i] - mm.mns[i]) * 255))) END) AS qc
        |           FROM q, mm),
        |q8 AS (SELECT qc.qid, c.id,
        |         sqrt(list_sum(list_transform(
        |           list_transform(range(1, 65), i ->
        |             (qc.qc[i] - c.c[i])
        |               * ((mm.mxs[i] - mm.mns[i]) / 255)),
        |           d -> d * d))) AS qd
        |       FROM codes c, qcodes qc, mm),
        |sl AS (SELECT qid, id FROM (
        |         SELECT qid, id,
        |                row_number() OVER (PARTITION BY qid
        |                                   ORDER BY qd, id) AS r
        |         FROM q8) WHERE r <= 40),
        |rr AS (SELECT sl.qid, sl.id AS nn_id,
        |              list_distance(e.embedding::DOUBLE[], q.qv) AS s
        |       FROM sl JOIN embeddings e ON sl.id = e.vec_id
        |               JOIN q ON sl.qid = q.qid),
        |rk AS (SELECT qid, nn_id, s,
        |              row_number() OVER (PARTITION BY qid
        |                                 ORDER BY s, nn_id) AS rk
        |       FROM rr)
        |SELECT qid, rk, nn_id, round(s, 4) AS score
        |FROM rk WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,
    // vdb_knn_bq mirrors the same shortlist-then-rerank recipe with
    // integer code space: the pack is a sum of 1::BIGINT << j terms
    // over 32-bit words (bit 63 would overflow signed 64-bit — the
    // Spark side packs 32 bits/word for exactly this mirror), the
    // 6dp-rounded per-dim means match the Spark training, and the
    // Hamming shortlist compares exact integers, so the only float
    // arithmetic the hash sees is the exact cosine rerank.
    "vdb_knn_bq" ->
      """WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v
        |           FROM embeddings),
        |q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
        |      FROM embeddings WHERE vec_id < 5),
        |dims AS (SELECT i, round(avg(v[i]), 6) AS mu
        |         FROM e, (SELECT unnest(range(1, 65)) AS i) GROUP BY i),
        |mus AS (SELECT list(mu ORDER BY i) AS m FROM dims),
        |codes AS (SELECT id, list_transform(range(0, 2), w ->
        |            CAST(list_sum(list_transform(range(1, 33), j ->
        |              CASE WHEN v[CAST(w * 32 + j AS INT)]
        |                        > mus.m[CAST(w * 32 + j AS INT)]
        |                   THEN CAST(1 AS BIGINT) << CAST(j - 1 AS INT)
        |                   ELSE CAST(0 AS BIGINT) END)) AS BIGINT)) AS c
        |          FROM e, mus),
        |qcodes AS (SELECT qid, list_transform(range(0, 2), w ->
        |            CAST(list_sum(list_transform(range(1, 33), j ->
        |              CASE WHEN qv[CAST(w * 32 + j AS INT)]
        |                        > mus.m[CAST(w * 32 + j AS INT)]
        |                   THEN CAST(1 AS BIGINT) << CAST(j - 1 AS INT)
        |                   ELSE CAST(0 AS BIGINT) END)) AS BIGINT)) AS qc
        |           FROM q, mus),
        |h AS (SELECT qc.qid, c.id,
        |        CAST(bit_count(xor(c.c[1], qc.qc[1])) AS BIGINT)
        |      + CAST(bit_count(xor(c.c[2], qc.qc[2])) AS BIGINT) AS hd
        |      FROM codes c, qcodes qc),
        |sl AS (SELECT qid, id FROM (
        |         SELECT qid, id,
        |                row_number() OVER (PARTITION BY qid
        |                                   ORDER BY hd, id) AS r
        |         FROM h) WHERE r <= 40),
        |rr AS (SELECT sl.qid, sl.id AS nn_id,
        |              list_cosine_similarity(e.embedding::DOUBLE[], q.qv) AS s
        |       FROM sl JOIN embeddings e ON sl.id = e.vec_id
        |               JOIN q ON sl.qid = q.qid),
        |rk AS (SELECT qid, nn_id, s,
        |              row_number() OVER (PARTITION BY qid
        |                                 ORDER BY s DESC, nn_id) AS rk
        |       FROM rr)
        |SELECT qid, rk, nn_id, round(s, 4) AS score
        |FROM rk WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,
    "wal_json_replay" -> walReplayOracle,
    "wal_delete_replay" -> walDeleteReplayOracle,
    "wal_compact_replay" -> walCompactReplayOracle,
    "wal_binary_replay" -> walReplayOracle,
    "wal_dsv2_replay" -> walReplayOracle,
    "wal_file_replay" -> walReplayOracle,
    // the state the streaming exact-dedup converges to (first copy
    // per fingerprint wins; n_copies = suppressed + 1) on the
    // planted-duplicate corpus — DedupStreamSpec proves the stream
    // reaches exactly this state
    "stream_dedup_state" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000, text FROM documents WHERE doc_id % 10 = 0)
        |SELECT md5(text) AS fp, min(doc_id) AS first_id,
        |       CAST(count(*) AS BIGINT) AS n_copies
        |FROM corpus GROUP BY 1 ORDER BY fp""".stripMargin,
    "stream_wal_state" ->
      """WITH agg AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |         round(sum(value), 4) AS sum_value
        |  FROM events GROUP BY user_id),
        |l AS (
        |  SELECT user_id, value, ts, event_id FROM (
        |    SELECT user_id, value, ts, event_id,
        |           row_number() OVER (PARTITION BY user_id
        |                              ORDER BY ts DESC, event_id DESC) AS rk
        |    FROM events) WHERE rk = 1)
        |SELECT agg.user_id, agg.n_events, agg.sum_value,
        |       round(l.value, 4) AS last_value,
        |       CAST(epoch_ns(l.ts) // 1000000 AS BIGINT) AS last_ts,
        |       l.event_id AS last_event_id
        |FROM agg JOIN l USING (user_id) ORDER BY user_id""".stripMargin,
    "stream_window_daily" ->
      """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |       CAST(count(*) AS BIGINT) AS n, round(sum(value), 4) AS sv
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin,
    "stream_interval_join" ->
      """WITH p AS (SELECT user_id, event_id AS p_id, ts AS p_ts
        |           FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, event_id AS c_id, ts AS c_ts
        |      FROM events WHERE event_type = 'click')
        |SELECT p.user_id, p_id, c_id,
        |       epoch_us(p_ts) - epoch_us(c_ts) AS micros_before
        |FROM p JOIN c ON p.user_id = c.user_id
        |WHERE c_ts >= p_ts - INTERVAL 6 HOUR AND c_ts <= p_ts
        |ORDER BY p_id, c_id""".stripMargin,
    // session_window semantics: merge while gap < 30 min (so a new
    // session starts at gap >= 1800 — note events_sessionize's lag
    // formulation uses gap > 1800; window END = last event + gap
    "stream_session_window" ->
      """WITH o AS (SELECT user_id, ts, value, event_id,
        |             lag(ts) OVER (PARTITION BY user_id
        |                           ORDER BY ts, event_id) AS pts
        |           FROM events),
        |f AS (SELECT user_id, ts, value, event_id,
        |        CASE WHEN pts IS NULL OR epoch(ts) - epoch(pts) >= 1800
        |             THEN 1 ELSE 0 END AS ns
        |      FROM o),
        |g AS (SELECT user_id, ts, value,
        |        sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                      ROWS UNBOUNDED PRECEDING) AS sid
        |      FROM f)
        |SELECT user_id,
        |       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |       strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S')
        |         AS session_end,
        |       CAST(count(*) AS BIGINT) AS n_events,
        |       round(sum(value), 4) AS sum_value
        |FROM g GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
    "vdb_insert" ->
      """WITH log AS (
        |  SELECT vec_id AS id, CAST(label AS BIGINT) AS label FROM embeddings
        |  UNION ALL
        |  SELECT vec_id, CAST(label + 100 AS BIGINT)
        |  FROM embeddings WHERE vec_id % 7 = 0)
        |SELECT id, CAST(count(*) AS BIGINT) AS n_rows,
        |       min(label) AS min_label, max(label) AS max_label
        |FROM log GROUP BY id ORDER BY id""".stripMargin,
    "vdb_knn_filtered_2field" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
        |           FROM embeddings WHERE vec_id < 5),
        |d AS (SELECT q.qid, e.vec_id AS nn_id,
        |             list_distance(e.embedding::DOUBLE[], q.qv) AS s
        |      FROM embeddings e CROSS JOIN q
        |      WHERE e.label BETWEEN 2 AND 6 AND e.vec_id % 2 = 0),
        |r AS (SELECT qid, nn_id, s,
        |             row_number() OVER (PARTITION BY qid ORDER BY s ASC, nn_id)
        |               AS rk
        |      FROM d)
        |SELECT qid, rk, nn_id, round(s, 4) AS score
        |FROM r WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,
    // the decode is a REAL ImageIO PNG round-trip; the oracle
    // rebuilds the expected raster (flat fill, dims and color
    // derived from doc_id + byte length — Multimodal.fixtureDims)
    // and predicts its md5, so a checksum match proves the pixels
    // actually went through the codec and came back exact
    "mm_decode" ->
      """SELECT doc_id,
        |  CAST((8 + octet_length(encode(text)) % 13)
        |     * (8 + octet_length(encode(text)) % 7) * 3 AS BIGINT)
        |    AS n_bytes,
        |  CAST(8 + octet_length(encode(text)) % 13 AS BIGINT) AS width,
        |  CAST(8 + octet_length(encode(text)) % 7 AS BIGINT) AS height,
        |  CAST(3 AS BIGINT) AS channels,
        |  md5(repeat(chr(CAST(32 + doc_id % 64 AS INTEGER))
        |             || chr(CAST(32 + octet_length(encode(text)) % 64
        |                    AS INTEGER))
        |             || chr(65),
        |             (8 + octet_length(encode(text)) % 13)
        |           * (8 + octet_length(encode(text)) % 7))) AS checksum
        |FROM documents ORDER BY doc_id""".stripMargin,
    // channel stats: the oracle REBUILDS the RGB gradient from the
    // pattern formula over a generate_series grid — a sum match per
    // channel proves the pixels round-tripped the codec exactly
    "mm_channel_stats" ->
      """WITH px AS (SELECT d.doc_id, ((d.doc_id % 50) * 7 + tx.x * 13
        |         + ty.y * 31) % 256 AS v
        |      FROM documents d,
        |           unnest(generate_series(0, 15)) AS tx(x),
        |           unnest(generate_series(0, 15)) AS ty(y)),
        |g AS (SELECT doc_id, CAST(sum(v) AS BIGINT) AS sum_r,
        |        CAST(sum((v + 85) % 256) AS BIGINT) AS sum_g,
        |        CAST(sum((v + 170) % 256) AS BIGINT) AS sum_b
        |      FROM px GROUP BY 1)
        |SELECT doc_id, sum_r, sum_g, sum_b,
        |       round(CAST(sum_r AS DOUBLE) / 256.0, 4) AS mean_r,
        |       round(CAST(sum_g AS DOUBLE) / 256.0, 4) AS mean_g,
        |       round(CAST(sum_b AS DOUBLE) / 256.0, 4) AS mean_b
        |FROM g ORDER BY doc_id""".stripMargin,
    // mm_features / mm_frame_sample oracles are CHAR-based mirrors of
    // the byte kernels — equivalent on the driver's ASCII fixture
    // (verified: n_chars == n_bytes throughout). A real media payload
    // is opaque bytes with no char reading at all; the byte semantics
    // are the contract, the char SQL is just DuckDB's closest mirror.
    "mm_features" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  CAST(len(list_distinct(string_split(text, ''))) AS BIGINT)
        |    AS n_distinct_chars,
        |  round(list_aggregate(list_transform(string_split(text, ''),
        |          c -> ascii(c)), 'sum') * 1.0 / length(text), 4)
        |    AS mean_byte
        |FROM documents ORDER BY doc_id""".stripMargin,
    // audio leg: payload as 8-bit PCM centered at 96, 64-sample
    // windows — integer-exact energy until the final sqrt/divisions
    // gaps-and-islands over silent windows: w − rank is constant
    // within a maximal run — pure integer run-length, no iteration
    "mm_audio_silence" ->
      """WITH sm AS (SELECT doc_id, i - 1 AS pos,
        |              ord(substr(text, CAST(i AS INTEGER), 1)) - 96 AS x
        |            FROM documents,
        |              unnest(range(1, len(text) + 1)) AS t(i)),
        |wnd AS (SELECT doc_id, pos // 64 AS w,
        |          CAST(count(*) AS BIGINT) AS wn,
        |          CAST(sum(x * x) AS BIGINT) AS ss
        |        FROM sm GROUP BY 1, 2 HAVING count(*) = 64),
        |runs AS (SELECT doc_id, grp, CAST(count(*) AS BIGINT) AS len
        |         FROM (SELECT doc_id, w,
        |                 w - row_number() OVER (PARTITION BY doc_id
        |                   ORDER BY w) AS grp
        |               FROM wnd WHERE ss <= 6400)
        |         GROUP BY 1, 2),
        |pd AS (SELECT doc_id, CAST(sum(len) AS BIGINT) AS n_silent,
        |         CAST(count(*) AS BIGINT) AS n_segments,
        |         CAST(max(len) AS BIGINT) AS longest_run
        |       FROM runs GROUP BY 1),
        |nw AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_windows
        |       FROM wnd GROUP BY 1)
        |SELECT nw.doc_id, nw.n_windows,
        |       coalesce(pd.n_silent, 0) AS n_silent,
        |       coalesce(pd.n_segments, 0) AS n_segments,
        |       coalesce(pd.longest_run, 0) AS longest_run
        |FROM nw LEFT JOIN pd ON nw.doc_id = pd.doc_id
        |ORDER BY nw.doc_id""".stripMargin,
    // byte entropy: floor-log2 bits over the byte histogram
    "mm_byte_entropy" ->
      """WITH bf AS (SELECT doc_id, substr(text, CAST(i AS INTEGER), 1)
        |             AS ch, count(*) AS c
        |           FROM documents,
        |             unnest(range(1, len(text) + 1)) AS t(i)
        |           GROUP BY 1, 2),
        |wn AS (SELECT doc_id, ch, c,
        |         CAST(sum(c) OVER (PARTITION BY doc_id) AS BIGINT) AS n
        |       FROM bf),
        |wb AS (SELECT doc_id, c, n,
        |         length(bin(n // c)) - 1 AS bits
        |       FROM wn)
        |SELECT doc_id, CAST(max(n) AS BIGINT) AS n_bytes,
        |       CAST(count(*) AS BIGINT) AS n_distinct_bytes,
        |       round(CAST(sum(c * bits) AS DOUBLE) / max(n), 4)
        |         AS bits_per_byte
        |FROM wb GROUP BY 1 ORDER BY doc_id""".stripMargin,
    // shot boundaries: |Δ frame-sum| > 150 cuts, runs between cuts
    "mm_shot_detect" ->
      """WITH sm AS (SELECT doc_id, i - 1 AS pos,
        |              ord(substr(text, CAST(i AS INTEGER), 1)) - 96 AS x
        |            FROM documents,
        |              unnest(range(1, len(text) + 1)) AS t(i)),
        |fr AS (SELECT doc_id, pos // 64 AS f,
        |         CAST(count(*) AS BIGINT) AS fn,
        |         CAST(sum(x) AS BIGINT) AS fsum
        |       FROM sm GROUP BY 1, 2 HAVING count(*) = 64),
        |ct AS (SELECT doc_id, f,
        |         CASE WHEN abs(fsum - lag(fsum) OVER (PARTITION BY doc_id
        |             ORDER BY f)) > 150 THEN 1 ELSE 0 END AS cut
        |       FROM fr),
        |sh AS (SELECT doc_id, f,
        |         sum(cut) OVER (PARTITION BY doc_id ORDER BY f
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS shot
        |       FROM ct),
        |runs AS (SELECT doc_id, shot, CAST(count(*) AS BIGINT) AS len
        |         FROM sh GROUP BY 1, 2)
        |SELECT doc_id, CAST(sum(len) AS BIGINT) AS n_frames,
        |       CAST(count(*) AS BIGINT) AS n_shots,
        |       CAST(max(len) AS BIGINT) AS longest_shot,
        |       round(sum(len) * 1.0 / count(*), 4) AS mean_shot_len
        |FROM runs GROUP BY 1 ORDER BY doc_id""".stripMargin,
    "mm_audio_energy" ->
      """WITH sm AS (SELECT doc_id, i - 1 AS pos,
        |              ord(substr(text, CAST(i AS INTEGER), 1)) - 96 AS x
        |            FROM documents,
        |              unnest(range(1, len(text) + 1)) AS t(i)),
        |zc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_samples,
        |         CAST(sum(CASE WHEN px IS NOT NULL AND x * px < 0
        |                       THEN 1 ELSE 0 END) AS BIGINT) AS crossings
        |       FROM (SELECT doc_id, x,
        |               lag(x, 1) OVER (PARTITION BY doc_id
        |                               ORDER BY pos) AS px
        |             FROM sm)
        |       GROUP BY 1),
        |wd AS (SELECT doc_id, pos // 64 AS w,
        |         CAST(count(*) AS BIGINT) AS wn,
        |         CAST(sum(x * x) AS BIGINT) AS ss
        |       FROM sm GROUP BY 1, 2 HAVING count(*) = 64),
        |pd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_windows,
        |         max(ss) AS peak_ss, CAST(sum(ss) AS BIGINT) AS sum_ss
        |       FROM wd GROUP BY 1)
        |SELECT zc.doc_id, zc.n_samples,
        |       CAST(coalesce(pd.n_windows, 0) AS BIGINT) AS n_windows,
        |       round(sqrt(CAST(coalesce(pd.peak_ss, 0) AS DOUBLE) / 64), 4)
        |         AS peak_rms,
        |       round(CAST(coalesce(pd.sum_ss, 0) AS DOUBLE)
        |         / (coalesce(pd.n_windows, 1) * 64), 4) AS mean_energy,
        |       round(CAST(zc.crossings AS DOUBLE)
        |         / (zc.n_samples - 1), 4) AS zcr
        |FROM zc LEFT JOIN pd ON zc.doc_id = pd.doc_id
        |ORDER BY zc.doc_id""".stripMargin,
    "mm_frame_sample" ->
      """WITH f AS (SELECT doc_id,
        |  list_transform(range(0, (length(text)-1)//16 + 1),
        |    i -> substr(text, CAST(i*16+1 AS INT), 1)) AS frames
        |  FROM documents)
        |SELECT doc_id, CAST(len(frames) AS BIGINT) AS n_frames,
        |       md5(array_to_string(frames, '')) AS sample_md5
        |FROM f ORDER BY doc_id""".stripMargin,
    // perceptual hash over the REAL PNG encode→decode round trip: the
    // mirror predicts every bit from the pattern formula
    // v(x,y) = ((doc_id%50)·7 + 13x + 31y) mod 256 without touching a
    // codec; bit = blockSum·64 > totalSum is exact integer arithmetic
    // near-dup images: formula-predicted hashes, 16-bit pigeonhole
    // bands (complete for hamming <= 3), per-position bit compare
    "dedup_phash_hamming" ->
      """WITH px AS (SELECT d.doc_id, x.x AS x, y.y AS y,
        |        ((d.doc_id % 50) * 7 + x.x * 13 + y.y * 31) % 256 AS v
        |       FROM documents d CROSS JOIN range(16) x(x)
        |            CROSS JOIN range(16) y(y)),
        |tt AS (SELECT doc_id, CAST(sum(v) AS BIGINT) AS total
        |       FROM px GROUP BY 1),
        |bb AS (SELECT doc_id, (y // 2) * 8 + (x // 2) AS idx,
        |        CAST(sum(v) AS BIGINT) AS bsum
        |       FROM px GROUP BY 1, 2),
        |bits AS (SELECT bb.doc_id, bb.idx,
        |          CASE WHEN bb.bsum * 64 > tt.total THEN 1 ELSE 0 END
        |            AS bit
        |         FROM bb JOIN tt USING (doc_id)),
        |hw AS (SELECT doc_id,
        |        CAST(sum(CASE WHEN idx < 32 THEN
        |          bit * (CAST(1 AS BIGINT) << (31 - idx))
        |          ELSE 0 END) AS BIGINT) AS h1,
        |        CAST(sum(CASE WHEN idx >= 32 THEN
        |          bit * (CAST(1 AS BIGINT) << (63 - idx))
        |          ELSE 0 END) AS BIGINT) AS h2
        |       FROM bits GROUP BY 1),
        |bv AS (SELECT doc_id, idx // 16 AS band,
        |        CAST(sum(bit * (CAST(1 AS BIGINT) << (15 - (idx % 16))))
        |          AS BIGINT) AS bv
        |       FROM bits GROUP BY 1, 2),
        |bd AS (SELECT bv.doc_id, bv.band, bv.bv, hw.h1, hw.h2
        |       FROM bv JOIN hw USING (doc_id)),
        |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
        |          a.h1 AS h1a, a.h2 AS h2a, b.h1 AS h1b, b.h2 AS h2b
        |         FROM bd a JOIN bd b
        |           ON a.band = b.band AND a.bv = b.bv
        |           AND a.doc_id < b.doc_id
        |           AND (a.h1 <> b.h1 OR a.h2 <> b.h2))
        |SELECT id_a, id_b,
        |  CAST(bit_count(xor(h1a, h1b)) + bit_count(xor(h2a, h2b))
        |    AS BIGINT) AS hamming
        |FROM cand
        |WHERE bit_count(xor(h1a, h1b)) + bit_count(xor(h2a, h2b)) <= 3
        |ORDER BY id_a, id_b""".stripMargin,
    // nearest-neighbor resize over the real decode: dst (x,y) <-
    // src (2x, 2y); both checksums predicted from the pattern
    // formula, so a match proves decode AND resize pixel-exact
    "mm_resize" ->
      """WITH g AS (SELECT x.x AS x, y.y AS y
        |           FROM range(8) x(x) CROSS JOIN range(8) y(y)),
        |px AS (SELECT d.doc_id, g.x, g.y,
        |        ((d.doc_id % 50) * 7 + (2 * g.x) * 13
        |          + (2 * g.y) * 31) % 256 AS v
        |       FROM documents d CROSS JOIN g)
        |SELECT doc_id, CAST(8 AS BIGINT) AS out_w,
        |  CAST(8 AS BIGINT) AS out_h,
        |  CAST(sum(v) AS BIGINT) AS px_sum,
        |  CAST(sum(v * (y * 8 + x + 1)) AS BIGINT) AS px_wsum
        |FROM px GROUP BY 1 ORDER BY doc_id""".stripMargin,
    "mm_phash" ->
      """WITH px AS (SELECT d.doc_id, a.x, b.y,
        |    CAST(((d.doc_id % 50) * 7 + a.x * 13 + b.y * 31) % 256
        |      AS BIGINT) AS v
        |  FROM documents d CROSS JOIN range(16) a(x)
        |  CROSS JOIN range(16) b(y)),
        |bs AS (SELECT doc_id, (y // 2) * 8 + (x // 2) AS idx,
        |         sum(v) AS s
        |       FROM px GROUP BY 1, 2),
        |tot AS (SELECT doc_id, sum(v) AS t FROM px GROUP BY 1),
        |ph AS (SELECT b.doc_id,
        |         string_agg(CASE WHEN b.s * 64 > t.t THEN '1' ELSE '0'
        |           END, '' ORDER BY b.idx) AS phash
        |       FROM bs b JOIN tot t ON b.doc_id = t.doc_id GROUP BY 1)
        |SELECT doc_id, phash,
        |       CAST(length(replace(phash, '0', '')) AS BIGINT)
        |         AS n_set_bits
        |FROM ph ORDER BY doc_id""".stripMargin,
    // image dedup on the hash: identical-content groups across
    // independent PNG encodes (docs sharing a pattern seed)
    "mm_phash_dup" ->
      """WITH px AS (SELECT d.doc_id, a.x, b.y,
        |    CAST(((d.doc_id % 50) * 7 + a.x * 13 + b.y * 31) % 256
        |      AS BIGINT) AS v
        |  FROM documents d CROSS JOIN range(16) a(x)
        |  CROSS JOIN range(16) b(y)),
        |bs AS (SELECT doc_id, (y // 2) * 8 + (x // 2) AS idx,
        |         sum(v) AS s
        |       FROM px GROUP BY 1, 2),
        |tot AS (SELECT doc_id, sum(v) AS t FROM px GROUP BY 1),
        |ph AS (SELECT b.doc_id,
        |         string_agg(CASE WHEN b.s * 64 > t.t THEN '1' ELSE '0'
        |           END, '' ORDER BY b.idx) AS phash
        |       FROM bs b JOIN tot t ON b.doc_id = t.doc_id GROUP BY 1)
        |SELECT phash, CAST(count(*) AS BIGINT) AS n_docs,
        |       min(doc_id) AS canonical_id
        |FROM ph GROUP BY 1 HAVING count(*) > 1
        |ORDER BY canonical_id""".stripMargin,
    "dedup_exact" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000, text FROM documents WHERE doc_id % 10 = 0)
        |SELECT md5(text) AS fp, CAST(count(*) AS BIGINT) AS n_copies,
        |       min(doc_id) AS canonical_id
        |FROM corpus GROUP BY 1 HAVING count(*) > 1
        |ORDER BY canonical_id""".stripMargin,
    "dedup_minhash_sig" ->
      s"""WITH $bandCte
         |SELECT doc_id, band, band_key FROM bk ORDER BY doc_id, band"""
        .stripMargin,
    "dedup_minhash_pairs" ->
      s"""WITH $bandCte,
         |cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
         |         FROM bk a JOIN bk b ON a.band = b.band
         |           AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
         |$jaccardVerify""".stripMargin,
    // cross-modal audit: minhash pairs -> embedding cosine, means
    // over micro-quantized ints, one-row agreement report
    "dedup_text_vs_embed" ->
      s"""WITH $bandCte,
         |cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
         |         FROM bk a JOIN bk b ON a.band = b.band
         |           AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
         |shx AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
         |card AS (SELECT doc_id, count(*) AS c FROM shx GROUP BY 1),
         |inter AS (SELECT x.doc_id AS id1, y.doc_id AS id2,
         |            count(*) AS n
         |          FROM shx x JOIN shx y ON x.s = y.s
         |            AND x.doc_id < y.doc_id
         |          GROUP BY 1, 2),
         |prs AS (SELECT c.id1, c.id2,
         |          round(n*1.0/(c1.c + c2.c - n), 4) AS jaccard
         |        FROM cand c JOIN inter i ON c.id1 = i.id1
         |          AND c.id2 = i.id2
         |        JOIN card c1 ON c.id1 = c1.doc_id
         |        JOIN card c2 ON c.id2 = c2.doc_id
         |        WHERE n*1.0/(c1.c + c2.c - n) >= 0.5),
         |wcx AS (SELECT prs.jaccard,
         |          round(list_cosine_similarity(ea.embedding::DOUBLE[],
         |            eb.embedding::DOUBLE[]), 4) AS cos
         |        FROM prs JOIN embeddings ea ON prs.id1 = ea.vec_id
         |        JOIN embeddings eb ON prs.id2 = eb.vec_id
         |        WHERE list_cosine_similarity(ea.embedding::DOUBLE[],
         |          eb.embedding::DOUBLE[]) IS NOT NULL)
         |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
         |       round(CAST(sum(CAST(round(jaccard * 10000) AS BIGINT))
         |           AS DOUBLE) / count(*) / 10000.0, 4) AS mean_jaccard,
         |       round(CAST(sum(CAST(round(cos * 10000) AS BIGINT))
         |           AS DOUBLE) / count(*) / 10000.0, 4) AS mean_cos,
         |       CAST(sum(CASE WHEN cos >= 0.8 THEN 1 ELSE 0 END)
         |         AS BIGINT) AS n_cos80,
         |       round(CAST(sum(CASE WHEN cos >= 0.8 THEN 1 ELSE 0 END)
         |           AS DOUBLE) / count(*), 4) AS agree80_rate
         |FROM wcx""".stripMargin,
    // winnowing (MOSS): char-5-gram 60-bit hashes, window-of-4 min
    // selection via the offset explode, pairs on df-in-[2,8]
    // fingerprints — every stage integer-exact
    "dedup_winnowing" ->
      s"""WITH ${winnowCtes("documents", "")},
        |dfc AS (SELECT fp FROM fps GROUP BY fp
        |        HAVING count(*) BETWEEN 2 AND 8),
        |bl AS (SELECT f.doc_id, f.fp FROM fps f JOIN dfc USING (fp))
        |SELECT a.doc_id AS id1, b.doc_id AS id2,
        |       CAST(count(*) AS BIGINT) AS n_shared
        |FROM bl a JOIN bl b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 HAVING count(*) >= 2
        |ORDER BY id1, id2""".stripMargin,
    // incremental winnowing vs the persisted fingerprint index: the
    // definitional mirror recomputes both fingerprint sets; the df
    // guard counts CORPUS fingerprints among the batch's collisions
    "dedup_winnow_incremental" ->
      s"""WITH ${winnowCtes("documents", "")},
        |${winnowCtes("(SELECT doc_id + 200000 AS doc_id, " +
           "text || ' zzyzx' AS text FROM documents " +
           "WHERE doc_id % 9 = 0)", "b")},
        |mfp AS (SELECT c.fp FROM fps c
        |        WHERE c.fp IN (SELECT fp FROM fpsb)
        |        GROUP BY c.fp HAVING count(*) <= 8)
        |SELECT b.doc_id AS id1, c.doc_id AS id2,
        |       CAST(count(*) AS BIGINT) AS n_shared
        |FROM fpsb b JOIN fps c ON b.fp = c.fp
        |JOIN mfp ON b.fp = mfp.fp
        |GROUP BY 1, 2 HAVING count(*) >= 2
        |ORDER BY id1, id2""".stripMargin,
    // containment: candidates block on shared RARE shingles (df in
    // [2, 8]); n/least and n/(c1+c2-n) are BIGINT-derived doubles,
    // identical IEEE on both engines; threshold compares unrounded
    "dedup_containment" ->
      s"""WITH $shingleCte,
         |shx AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
         |card AS (SELECT doc_id, count(*) AS c FROM shx GROUP BY 1),
         |rare AS (SELECT s FROM shx GROUP BY s
         |         HAVING count(*) BETWEEN 2 AND 8),
         |cand AS (SELECT DISTINCT x.doc_id AS id1, y.doc_id AS id2
         |         FROM shx x JOIN shx y USING (s) JOIN rare USING (s)
         |         WHERE x.doc_id < y.doc_id),
         |inter AS (SELECT x.doc_id AS id1, y.doc_id AS id2,
         |            CAST(count(*) AS BIGINT) AS n
         |          FROM shx x JOIN shx y
         |            ON x.s = y.s AND x.doc_id < y.doc_id
         |          GROUP BY 1, 2)
         |SELECT c.id1 AS id1, c.id2 AS id2, i.n AS n_shared,
         |       round(i.n * 1.0 / least(c1.c, c2.c), 4) AS containment,
         |       round(i.n * 1.0 / (c1.c + c2.c - i.n), 4) AS jaccard
         |FROM cand c JOIN inter i ON c.id1 = i.id1 AND c.id2 = i.id2
         |JOIN card c1 ON c.id1 = c1.doc_id
         |JOIN card c2 ON c.id2 = c2.doc_id
         |WHERE i.n * 1.0 / least(c1.c, c2.c) >= 0.8
         |ORDER BY c.id1, c.id2""".stripMargin,
    // decontamination: split by the same md5 bucket rule as
    // corpus_sample_split (train < 'cccd' = 0.8), shared-shingle
    // counts against the EVAL side's shingle cardinality; n/c is
    // BIGINT/BIGINT → DOUBLE in both engines, identical IEEE result
    "decontam_overlap" ->
      s"""WITH corpus AS (SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 100000, text FROM documents WHERE doc_id % 10 = 0),
         |${shingleCteFrom("corpus")},
         |sp AS (SELECT doc_id,
         |         CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
         |                   < 'cccd'
         |              THEN 'train' ELSE 'eval' END AS split
         |       FROM corpus),
         |shx AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
         |ts AS (SELECT shx.doc_id AS train_id, s
         |       FROM shx JOIN sp USING (doc_id) WHERE split = 'train'),
         |es AS (SELECT shx.doc_id AS eval_id, s
         |       FROM shx JOIN sp USING (doc_id) WHERE split = 'eval'),
         |ec AS (SELECT eval_id, CAST(count(*) AS BIGINT) AS c
         |       FROM es GROUP BY 1),
         |inter AS (SELECT train_id, eval_id, CAST(count(*) AS BIGINT) AS n
         |          FROM ts JOIN es USING (s) GROUP BY 1, 2)
         |SELECT eval_id, train_id, n AS n_shared, round(n / c, 4) AS overlap
         |FROM inter JOIN ec USING (eval_id)
         |WHERE n / c >= 0.2 ORDER BY eval_id, train_id""".stripMargin,
    // hard-negative triplets: the near-miss pool = 16-bit simhash
    // band collisions with hamming > 1 (the dedup_simhash_pairs
    // pipeline with the bar inverted), minus the anchor's verified
    // minhash pairs; pick = same arg-min md5(anchor|cand)
    "train_triplets_hard" ->
      s"""WITH $bandCte,
         |$verifiedPairsCte,
         |ancs AS (SELECT id1 AS anchor_id, id2 AS pos_id FROM pairs
         |         UNION ALL SELECT id2, id1 FROM pairs),
         |st AS (SELECT doc_id, string_split(text, ' ') AS toks
         |       FROM documents),
         |su AS (SELECT doc_id,
         |         CAST('0x' || substr(md5(tok), 1, 4) AS BIGINT) AS h
         |       FROM (SELECT doc_id, unnest(toks) AS tok FROM st)),
         |sv AS (SELECT doc_id, bit,
         |         sum(CASE WHEN (h // (1 << bit)) % 2 = 1
         |               THEN 1 ELSE -1 END) AS vote
         |       FROM su CROSS JOIN (SELECT unnest(range(16)) AS bit)
         |       GROUP BY 1, 2),
         |ssg AS (SELECT doc_id,
         |          CAST(sum(CASE WHEN vote > 0 THEN 1 << bit ELSE 0 END)
         |            AS BIGINT) AS sh2
         |        FROM sv GROUP BY doc_id),
         |sbands AS (SELECT doc_id, sh2, 0 AS band, sh2 % 256 AS key
         |           FROM ssg
         |           UNION ALL
         |           SELECT doc_id, sh2, 1, sh2 // 256 FROM ssg),
         |scand AS (SELECT DISTINCT
         |            least(a.doc_id, b.doc_id) AS id1,
         |            greatest(a.doc_id, b.doc_id) AS id2,
         |            CASE WHEN a.doc_id < b.doc_id THEN a.sh2
         |                 ELSE b.sh2 END AS h1,
         |            CASE WHEN a.doc_id < b.doc_id THEN b.sh2
         |                 ELSE a.sh2 END AS h2
         |          FROM sbands a JOIN sbands b
         |            ON a.band = b.band AND a.key = b.key
         |              AND a.doc_id < b.doc_id),
         |miss AS (SELECT id1, id2 FROM scand
         |         WHERE bit_count(xor(h1, h2)) > 1),
         |cboth AS (SELECT id1 AS anchor_id, id2 AS cand_id FROM miss
         |          UNION ALL SELECT id2, id1 FROM miss),
         |hard AS (SELECT c.anchor_id, c.cand_id,
         |           CAST('0x' || substr(md5(CAST(c.anchor_id AS VARCHAR)
         |             || '|' || CAST(c.cand_id AS VARCHAR)), 1, 15)
         |             AS BIGINT) AS r
         |         FROM cboth c
         |         WHERE NOT EXISTS (SELECT 1 FROM ancs v
         |           WHERE v.anchor_id = c.anchor_id
         |             AND v.pos_id = c.cand_id)),
         |hsel AS (SELECT a.anchor_id, a.pos_id, h.cand_id,
         |           row_number() OVER (PARTITION BY a.anchor_id, a.pos_id
         |                              ORDER BY h.r, h.cand_id) AS rn
         |         FROM ancs a JOIN hard h ON a.anchor_id = h.anchor_id)
         |SELECT anchor_id, pos_id, cand_id AS neg_id
         |FROM hsel WHERE rn = 1 ORDER BY anchor_id, pos_id""".stripMargin,
    // funnel: stage k = first qualifying event at/after stage k-1's
    // time, per user; counts integer-exact, monotone by construction
    // multi-touch attribution: user-keyed 7-day band join, last
    // touch by (ts, event_id), linear credit summed per distinct
    // touch count (integer counts first, bounded float reduction)
    "events_attribution" ->
      """WITH p AS (SELECT event_id AS p_id, user_id, ts AS p_ts
        |           FROM events WHERE event_type = 'purchase'),
        |t AS (SELECT event_id AS t_id, user_id, ts AS t_ts,
        |             event_type AS t_type
        |      FROM events
        |      WHERE event_type IN ('view', 'click', 'signup')),
        |pt AS (SELECT p.p_id, t.t_id, t.t_type, t.t_ts
        |       FROM p JOIN t ON p.user_id = t.user_id
        |         AND t.t_ts < p.p_ts
        |         AND t.t_ts >= p.p_ts - INTERVAL 7 DAY),
        |per AS (SELECT p_id, CAST(count(*) AS BIGINT) AS n_touch
        |        FROM pt GROUP BY 1),
        |lastt AS (SELECT p_id, t_type FROM (
        |            SELECT p_id, t_type,
        |              row_number() OVER (PARTITION BY p_id
        |                ORDER BY t_ts DESC, t_id DESC) AS rn
        |            FROM pt) WHERE rn = 1),
        |ln0 AS (SELECT pt.t_type, per.n_touch,
        |          CAST(count(*) AS BIGINT) AS c
        |        FROM pt JOIN per USING (p_id) GROUP BY 1, 2),
        |lin AS (SELECT t_type AS event_type,
        |          CAST(sum(c) AS BIGINT) AS touches,
        |          sum(c * 1.0 / n_touch) AS lc
        |        FROM ln0 GROUP BY 1),
        |la AS (SELECT t_type AS event_type,
        |         CAST(count(*) AS BIGINT) AS last_touch
        |       FROM lastt GROUP BY 1),
        |d AS (SELECT CAST(count(*) AS BIGINT) AS n FROM p
        |      WHERE NOT EXISTS (SELECT 1 FROM per
        |                        WHERE per.p_id = p.p_id))
        |SELECT coalesce(lin.event_type, la.event_type) AS event_type,
        |       CAST(coalesce(lin.touches, 0) AS BIGINT) AS touches,
        |       CAST(coalesce(la.last_touch, 0) AS BIGINT)
        |         AS last_touch,
        |       round(coalesce(lin.lc, 0), 4) AS linear_credit
        |FROM lin FULL JOIN la ON lin.event_type = la.event_type
        |UNION ALL
        |SELECT 'direct', CAST(0 AS BIGINT), n, round(n * 1.0, 4)
        |FROM d
        |ORDER BY event_type""".stripMargin,
    // funnel x experiment: two-proportion z per transition on the
    // shared staged-funnel definition, pooled p-hat
    "events_funnel_ab" ->
      """WITH v AS (SELECT user_id, min(ts) AS v_ts FROM events
        |           WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.ts) AS c_ts
        |      FROM events e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts >= v.v_ts GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ts) AS p_ts
        |      FROM events e JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts >= c.c_ts
        |      GROUP BY 1),
        |g AS (SELECT v.user_id % 2 AS variant,
        |        CAST(count(*) AS BIGINT) AS nv,
        |        CAST(count(c.user_id) AS BIGINT) AS nc,
        |        CAST(count(p.user_id) AS BIGINT) AS np
        |      FROM v LEFT JOIN c ON v.user_id = c.user_id
        |      LEFT JOIN p ON v.user_id = p.user_id GROUP BY 1),
        |tr AS (SELECT variant, 'view_to_click' AS transition,
        |         nv AS n, nc AS conv FROM g
        |       UNION ALL
        |       SELECT variant, 'click_to_purchase', nc, np FROM g),
        |j AS (SELECT a.transition, a.n AS n_a, a.conv AS conv_a,
        |        b.n AS n_b, b.conv AS conv_b,
        |        CAST(a.conv + b.conv AS DOUBLE) / (a.n + b.n) AS ph
        |      FROM tr a JOIN tr b ON a.transition = b.transition
        |        AND a.variant = 0 AND b.variant = 1)
        |SELECT transition, n_a, conv_a, n_b, conv_b,
        |       round(CAST(conv_a AS DOUBLE) / n_a, 4) AS rate_a,
        |       round(CAST(conv_b AS DOUBLE) / n_b, 4) AS rate_b,
        |       CASE WHEN conv_a + conv_b > 0
        |             AND conv_a + conv_b < n_a + n_b
        |         THEN round((CAST(conv_a AS DOUBLE) / n_a
        |             - CAST(conv_b AS DOUBLE) / n_b)
        |           / sqrt(ph * (1.0 - ph)
        |             * (CAST(1 AS DOUBLE) / n_a
        |               + CAST(1 AS DOUBLE) / n_b)), 4)
        |         ELSE 0.0 END AS z
        |FROM j ORDER BY transition""".stripMargin,
    "events_funnel" ->
      """WITH v AS (SELECT user_id, min(ts) AS v_ts FROM events
        |           WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.ts) AS c_ts
        |      FROM events e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts >= v.v_ts GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ts) AS p_ts
        |      FROM events e JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts >= c.c_ts
        |      GROUP BY 1),
        |u AS (SELECT 1 AS stage, 'view' AS name, user_id FROM v
        |      UNION ALL SELECT 2, 'view_click', user_id FROM c
        |      UNION ALL SELECT 3, 'view_click_purchase', user_id FROM p)
        |SELECT CAST(stage AS BIGINT) AS stage, name,
        |       CAST(count(*) AS BIGINT) AS users
        |FROM u GROUP BY 1, 2 ORDER BY stage""".stripMargin,
    // dow seasonality index over the dense zero-filled grid; ISO
    // weekday from epoch-day arithmetic ((d + 3) % 7 + 1)
    "events_dow_seasonality" ->
      """WITH ev AS (SELECT event_type,
        |        date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |          AS d
        |      FROM events),
        |daily AS (SELECT event_type, d, CAST(count(*) AS BIGINT) AS n
        |       FROM ev GROUP BY 1, 2),
        |b AS (SELECT min(d) AS lo, max(d) AS hi FROM ev),
        |ty AS (SELECT DISTINCT event_type FROM ev),
        |g AS (SELECT ty.event_type, gs.d
        |      FROM ty CROSS JOIN
        |        (SELECT unnest(range(b.lo, b.hi + 1)) AS d FROM b) gs),
        |dense AS (SELECT g.event_type, g.d,
        |        coalesce(daily.n, 0) AS n,
        |        (g.d + 3) % 7 + 1 AS dow
        |       FROM g LEFT JOIN daily
        |         ON g.event_type = daily.event_type AND g.d = daily.d),
        |tot AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS st,
        |        CAST(count(*) AS BIGINT) AS nd
        |       FROM dense GROUP BY 1),
        |dw AS (SELECT event_type, dow, CAST(sum(n) AS BIGINT) AS sd,
        |        CAST(count(*) AS BIGINT) AS ndw
        |       FROM dense GROUP BY 1, 2)
        |SELECT dw.event_type, CAST(dw.dow AS BIGINT) AS dow,
        |  round(CAST(dw.sd AS DOUBLE) / dw.ndw, 4) AS dow_mean,
        |  round((CAST(dw.sd AS DOUBLE) / dw.ndw)
        |    / (CAST(tot.st AS DOUBLE) / tot.nd), 4) AS seasonal_index
        |FROM dw JOIN tot USING (event_type)
        |ORDER BY event_type, dow""".stripMargin,
    // cohort LTV triangle: exact-cents cells, cumulative window over
    // each cohort's months-span frame
    "customer_cohort_ltv" ->
      """WITH fe AS (SELECT user_id,
        |        CAST(min(date_diff('day', DATE '1970-01-01',
        |          CAST(ts AS DATE)) // 7) AS BIGINT) AS cohort
        |      FROM events GROUP BY 1),
        |sp AS (SELECT e.user_id,
        |        CAST(date_diff('day', DATE '1970-01-01',
        |          CAST(e.ts AS DATE)) // 7 AS BIGINT) AS m,
        |        CAST(round(e.value * 100) AS BIGINT) AS cents
        |       FROM events e WHERE e.event_type = 'purchase'),
        |cell AS (SELECT fe.cohort, sp.m - fe.cohort AS k,
        |        CAST(sum(sp.cents) AS BIGINT) AS sc,
        |        CAST(count(*) AS BIGINT) AS n_purchases
        |       FROM sp JOIN fe ON sp.user_id = fe.user_id
        |       GROUP BY 1, 2),
        |sz AS (SELECT cohort, CAST(count(*) AS BIGINT) AS n_users
        |       FROM fe GROUP BY 1),
        |cm AS (SELECT cell.cohort, cell.k, sz.n_users,
        |        cell.n_purchases, cell.sc,
        |        CAST(sum(cell.sc) OVER (PARTITION BY cell.cohort
        |          ORDER BY cell.k) AS BIGINT) AS cum
        |       FROM cell JOIN sz USING (cohort))
        |SELECT cohort, k, n_users, n_purchases,
        |  round(CAST(sc AS DOUBLE) / n_users / 100.0, 4) AS avg_spend,
        |  round(CAST(cum AS DOUBLE) / n_users / 100.0, 4) AS cum_ltv
        |FROM cm ORDER BY cohort, k""".stripMargin,
    // ABC classification: exact-cents revenue, one global window in
    // the mirror (the Spark side decomposes two-level), integer cuts
    "part_abc_analysis" ->
      """WITH rev AS (SELECT l_partkey AS partkey,
        |        CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
        |          * 100) AS BIGINT)) AS BIGINT) AS cents
        |      FROM lineitem GROUP BY 1 HAVING cents > 0),
        |t AS (SELECT CAST(sum(cents) AS BIGINT) AS total FROM rev),
        |c AS (SELECT partkey, cents,
        |        CAST(sum(cents) OVER (ORDER BY cents DESC, partkey)
        |          AS BIGINT) AS cum
        |      FROM rev),
        |k AS (SELECT c.cents,
        |        CASE WHEN c.cum * 5 <= t.total * 4 THEN 'A'
        |             WHEN c.cum * 20 <= t.total * 19 THEN 'B'
        |             ELSE 'C' END AS abc,
        |        t.total
        |       FROM c, t)
        |SELECT abc, CAST(count(*) AS BIGINT) AS n_parts,
        |  round(CAST(sum(cents) AS DOUBLE) / 100.0, 2) AS revenue,
        |  round(CAST(sum(cents) AS DOUBLE) / CAST(max(total) AS DOUBLE),
        |    4) AS rev_share
        |FROM k GROUP BY 1 ORDER BY abc""".stripMargin,
    // absence alert: trailing zero-run vs longest internal silence,
    // gaps-and-islands over the dense grid
    "events_absence_alert" ->
      """WITH ev AS (SELECT event_type,
        |             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |               AS d
        |           FROM events),
        |daily AS (SELECT event_type, d, CAST(count(*) AS BIGINT) AS n
        |          FROM ev GROUP BY 1, 2),
        |meta AS (SELECT min(d) AS lo, max(d) AS hi FROM ev),
        |tys AS (SELECT DISTINCT event_type FROM ev),
        |grid AS (SELECT t.event_type, g.d, m.hi
        |         FROM tys t CROSS JOIN meta m CROSS JOIN
        |           (SELECT unnest(range(lo, hi + 1)) AS d FROM meta) g),
        |dense AS (SELECT grid.event_type, grid.d, grid.hi,
        |            coalesce(daily.n, 0) AS n
        |          FROM grid LEFT JOIN daily USING (event_type, d)),
        |zr AS (SELECT event_type, d, hi,
        |         d - row_number() OVER (PARTITION BY event_type
        |           ORDER BY d) AS grp
        |       FROM dense WHERE n = 0),
        |runs AS (SELECT event_type, grp, CAST(count(*) AS BIGINT)
        |           AS len,
        |           max(d) AS run_end, max(hi) AS hi
        |         FROM zr GROUP BY 1, 2),
        |pt AS (SELECT event_type,
        |         CAST(sum(CASE WHEN run_end = hi THEN len ELSE 0 END)
        |           AS BIGINT) AS trailing_silent,
        |         CAST(max(CASE WHEN run_end < hi THEN len ELSE 0 END)
        |           AS BIGINT) AS max_internal_gap
        |       FROM runs GROUP BY 1)
        |SELECT t.event_type,
        |       coalesce(pt.trailing_silent, 0) AS trailing_silent,
        |       coalesce(pt.max_internal_gap, 0) AS max_internal_gap,
        |       (coalesce(pt.trailing_silent, 0) >
        |         coalesce(pt.max_internal_gap, 0)) AS alert
        |FROM tys t LEFT JOIN pt USING (event_type)
        |ORDER BY t.event_type""".stripMargin,
    // sourcing breadth: supplier-count buckets, revenue share per
    "part_sourcing_risk" ->
      """WITH per AS (SELECT l_partkey,
        |        CAST(count(DISTINCT l_suppkey) AS BIGINT) AS ns,
        |        CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
        |          * 100) AS BIGINT)) AS BIGINT) AS cents
        |      FROM lineitem GROUP BY 1),
        |t AS (SELECT CAST(sum(cents) AS BIGINT) AS total FROM per),
        |bk AS (SELECT CASE WHEN ns < 20 THEN '1_thin'
        |              WHEN ns < 30 THEN '2_moderate'
        |              ELSE '3_broad' END AS bucket, cents
        |       FROM per)
        |SELECT bucket, CAST(count(*) AS BIGINT) AS n_parts,
        |       round(CAST(sum(cents) AS DOUBLE) / 100.0, 2) AS revenue,
        |       round(CAST(sum(cents) AS DOUBLE)
        |         / CAST(max(t.total) AS DOUBLE), 4) AS rev_share
        |FROM bk CROSS JOIN t GROUP BY 1 ORDER BY bucket""".stripMargin,
    // ABC migration: per-period classes via the same cum/total cuts,
    // full-outer on partkey, '-' for one-period parts
    "part_abc_migration" ->
      """WITH li AS (SELECT l.l_partkey AS partkey,
        |             CAST(round(l.l_extendedprice * (1 - l.l_discount)
        |               * 100) AS BIGINT) AS cents,
        |             date_diff('day', DATE '1970-01-01',
        |               CAST(o.o_orderdate AS DATE)) AS d
        |           FROM lineitem l JOIN orders o
        |             ON l.l_orderkey = o.o_orderkey),
        |b AS (SELECT (min(d) + max(d)) // 2 AS mid FROM li),
        |r0 AS (SELECT partkey, CAST(sum(cents) AS BIGINT) AS cents
        |       FROM li CROSS JOIN b WHERE d < mid GROUP BY 1
        |       HAVING sum(cents) > 0),
        |t0 AS (SELECT CAST(sum(cents) AS BIGINT) AS total FROM r0),
        |c0 AS (SELECT partkey, CAST(sum(cents) OVER (ORDER BY cents
        |         DESC, partkey) AS BIGINT) AS cum FROM r0),
        |k0 AS (SELECT c0.partkey,
        |         CASE WHEN c0.cum * 5 <= t0.total * 4 THEN 'A'
        |              WHEN c0.cum * 20 <= t0.total * 19 THEN 'B'
        |              ELSE 'C' END AS a0
        |       FROM c0, t0),
        |r1 AS (SELECT partkey, CAST(sum(cents) AS BIGINT) AS cents
        |       FROM li CROSS JOIN b WHERE d >= mid GROUP BY 1
        |       HAVING sum(cents) > 0),
        |t1 AS (SELECT CAST(sum(cents) AS BIGINT) AS total FROM r1),
        |c1 AS (SELECT partkey, CAST(sum(cents) OVER (ORDER BY cents
        |         DESC, partkey) AS BIGINT) AS cum FROM r1),
        |k1 AS (SELECT c1.partkey,
        |         CASE WHEN c1.cum * 5 <= t1.total * 4 THEN 'A'
        |              WHEN c1.cum * 20 <= t1.total * 19 THEN 'B'
        |              ELSE 'C' END AS a1
        |       FROM c1, t1)
        |SELECT coalesce(k0.a0, '-') AS class_from,
        |       coalesce(k1.a1, '-') AS class_to,
        |       CAST(count(*) AS BIGINT) AS n_parts
        |FROM k0 FULL OUTER JOIN k1 ON k0.partkey = k1.partkey
        |GROUP BY 1, 2 ORDER BY class_from, class_to""".stripMargin,
    // open-order backlog: dense day grid, two global cumsums in the
    // mirror (the Spark side decomposes them two-level)
    "orders_backlog" ->
      """WITH p AS (SELECT date_diff('day', DATE '1970-01-01',
        |          CAST(o_orderdate AS DATE)) AS d,
        |        CAST(count(*) AS BIGINT) AS np
        |      FROM orders GROUP BY 1),
        |sh AS (SELECT date_diff('day', DATE '1970-01-01', sd) AS d,
        |        CAST(count(*) AS BIGINT) AS ns
        |       FROM (SELECT l_orderkey,
        |               max(CAST(l_shipdate AS DATE)) AS sd
        |             FROM lineitem GROUP BY 1) GROUP BY 1),
        |b AS (SELECT min(d) AS lo, max(d) AS hi FROM
        |      (SELECT d FROM p UNION ALL SELECT d FROM sh)),
        |g AS (SELECT unnest(range(b.lo, b.hi + 1)) AS d FROM b),
        |dd AS (SELECT g.d, coalesce(p.np, 0) AS np,
        |        coalesce(sh.ns, 0) AS ns
        |       FROM g LEFT JOIN p ON g.d = p.d
        |       LEFT JOIN sh ON g.d = sh.d)
        |SELECT d AS day, np AS n_placed, ns AS n_shipped,
        |  CAST(sum(np) OVER (ORDER BY d)
        |    - sum(ns) OVER (ORDER BY d) AS BIGINT) AS backlog
        |FROM dd ORDER BY day""".stripMargin,
    // sample-size calculator from exact cents moments; z constants
    // as DOUBLE on both engines, ceil of bit-identical doubles
    "events_power_analysis" ->
      """WITH g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(m) AS BIGINT) AS sx,
        |        CAST(sum(m * m) AS BIGINT) AS qx
        |      FROM (SELECT event_type,
        |              CAST(round(value * 100) AS BIGINT) AS m
        |            FROM events) GROUP BY 1),
        |d AS (SELECT event_type, n,
        |        CAST(sx AS DOUBLE) / n / CAST(100.0 AS DOUBLE) AS mean,
        |        CAST(n * qx - sx * sx AS DOUBLE)
        |          / CAST(n * (n - 1) AS DOUBLE)
        |          / CAST(10000.0 AS DOUBLE) AS vr
        |      FROM g WHERE n > 1)
        |SELECT event_type, n AS n_obs, round(mean, 4) AS mean_value,
        |  round(vr, 4) AS variance,
        |  round(mean * CAST(0.05 AS DOUBLE), 4) AS mde,
        |  CAST(ceil(CAST(2.0 AS DOUBLE) * vr
        |    * (CAST(1.96 AS DOUBLE) + CAST(0.8416 AS DOUBLE))
        |    * (CAST(1.96 AS DOUBLE) + CAST(0.8416 AS DOUBLE))
        |    / ((mean * CAST(0.05 AS DOUBLE))
        |       * (mean * CAST(0.05 AS DOUBLE)))) AS BIGINT) AS n_per_arm
        |FROM d ORDER BY event_type""".stripMargin,
    // rolling 7-day p95 via additive histograms: each day's bin
    // counts explode into the trailing windows they serve, ceil-rank
    // + in-bin interpolation per (type, day) — integer ranks, one
    // float division
    "events_rolling_p95" ->
      """WITH ev AS (SELECT event_type,
        |        date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |          AS d,
        |        CAST(round(value * 100) AS BIGINT) AS cents
        |      FROM events),
        |bx AS (SELECT max(d) AS hi FROM ev),
        |db AS (SELECT event_type, d, cents // 800 AS bin,
        |        CAST(count(*) AS BIGINT) AS cnt
        |      FROM ev GROUP BY 1, 2, 3),
        |co AS (SELECT db.event_type, db.bin, db.d + o.o AS td, db.cnt
        |       FROM db CROSS JOIN (SELECT unnest(range(7)) AS o) o),
        |wc AS (SELECT event_type, td, bin, CAST(sum(cnt) AS BIGINT)
        |         AS wcnt
        |       FROM co, bx WHERE td <= bx.hi GROUP BY 1, 2, 3),
        |cm AS (SELECT event_type, td, bin, wcnt,
        |        CAST(sum(wcnt) OVER (PARTITION BY event_type, td
        |          ORDER BY bin) AS BIGINT) AS cum,
        |        CAST(sum(wcnt) OVER (PARTITION BY event_type, td)
        |          AS BIGINT) AS n
        |      FROM wc),
        |es AS (SELECT *, (19 * n + 19) // 20 AS t FROM cm),
        |sel AS (SELECT event_type, td, n, bin, wcnt, cum, t,
        |         row_number() OVER (PARTITION BY event_type, td
        |           ORDER BY bin) AS rn
        |       FROM es WHERE cum >= t)
        |SELECT event_type, CAST(td AS BIGINT) AS day, n,
        |  round((800.0 * bin + 800.0 * (t - (cum - wcnt)) / wcnt)
        |    / 100.0, 4) AS p95_value
        |FROM sel WHERE rn = 1 ORDER BY event_type, day""".stripMargin,
    // time-to-convert per funnel transition: integer-second stage
    // gaps from the funnel's own per-user timestamps; exact mean
    // (one division of exact sums), quantile_cont p50/p95, max
    "events_funnel_timing" ->
      """WITH v AS (SELECT user_id, min(ts) AS v_ts FROM events
        |           WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.ts) AS c_ts
        |      FROM events e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts >= v.v_ts GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ts) AS p_ts
        |      FROM events e JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts >= c.c_ts
        |      GROUP BY 1),
        |g AS (SELECT 'view_to_click' AS transition,
        |        CAST(floor(epoch(c.c_ts)) AS BIGINT)
        |          - CAST(floor(epoch(v.v_ts)) AS BIGINT) AS gap_s
        |      FROM c JOIN v ON c.user_id = v.user_id
        |      UNION ALL
        |      SELECT 'click_to_purchase',
        |        CAST(floor(epoch(p.p_ts)) AS BIGINT)
        |          - CAST(floor(epoch(c.c_ts)) AS BIGINT)
        |      FROM p JOIN c ON p.user_id = c.user_id)
        |SELECT transition, CAST(count(*) AS BIGINT) AS n_users,
        |  round(sum(gap_s) * 1.0 / count(*), 4) AS mean_gap_s,
        |  round(quantile_cont(gap_s, 0.5), 4) AS p50_gap_s,
        |  round(quantile_cont(gap_s, 0.95), 4) AS p95_gap_s,
        |  CAST(max(gap_s) AS BIGINT) AS max_gap_s
        |FROM g GROUP BY 1 ORDER BY transition""".stripMargin,
    // ordered-sequence pattern (view → click → purchase, each stage
    // within 86400s of its predecessor): running RANGE-window maxima
    // mirror the Spark formulation stage for stage; timestamp
    // comparisons are exact (interval arithmetic, no epoch
    // truncation), and RANGE frames keep same-ts ties order-blind
    "events_pattern_match" ->
      """WITH ev AS (SELECT user_id, event_type, ts FROM events
        |            WHERE event_type IN ('view', 'click', 'purchase')),
        |m AS (SELECT user_id, event_type, ts,
        |        max(CASE WHEN event_type = 'view' THEN ts END)
        |          OVER (PARTITION BY user_id ORDER BY ts
        |                RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |          AS v_run
        |      FROM ev),
        |c AS (SELECT user_id, event_type, ts,
        |        max(CASE WHEN event_type = 'click' AND v_run IS NOT NULL
        |              AND ts <= v_run + INTERVAL 86400 SECOND THEN ts END)
        |          OVER (PARTITION BY user_id ORDER BY ts
        |                RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |          AS c_run
        |      FROM m),
        |h AS (SELECT user_id, ts,
        |        (event_type = 'purchase' AND c_run IS NOT NULL
        |         AND ts <= c_run + INTERVAL 86400 SECOND) AS hit
        |      FROM c)
        |SELECT user_id,
        |       CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_matches,
        |       min(CASE WHEN hit THEN ts END) AS first_match_ts,
        |       max(CASE WHEN hit THEN ts END) AS last_match_ts
        |FROM h GROUP BY 1
        |HAVING sum(CASE WHEN hit THEN 1 ELSE 0 END) > 0
        |ORDER BY user_id""".stripMargin,
    // Welch z on 2dp values via exact integer micro sums: mean,
    // variance, and z evaluate identical doubles from identical
    // BIGINTs on both engines (z is scale-invariant — micro units
    // throughout, no /100 to disagree on)
    // sequential peeking curve: cumulative Welch z per day on exact
    // integer running moments, constant 2.797 boundary
    "events_ab_sequential" ->
      """WITH e AS (SELECT user_id % 2 AS variant,
        |             CAST(ts AS DATE) - DATE '1970-01-01' AS d,
        |             CAST(round(value * 100) AS BIGINT) AS micro
        |           FROM events),
        |g AS (SELECT variant, d, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(micro) AS BIGINT) AS sx,
        |        CAST(sum(micro * micro) AS BIGINT) AS qx
        |      FROM e GROUP BY 1, 2),
        |days AS (SELECT DISTINCT d FROM e),
        |vs AS (SELECT unnest(range(0, 2)) AS variant),
        |z AS (SELECT vs.variant, days.d,
        |        coalesce(g.n, 0) AS n, coalesce(g.sx, 0) AS sx,
        |        coalesce(g.qx, 0) AS qx
        |      FROM days CROSS JOIN vs
        |      LEFT JOIN g ON g.variant = vs.variant AND g.d = days.d),
        |c AS (SELECT variant, d,
        |        CAST(sum(n) OVER pw AS BIGINT) AS cn,
        |        CAST(sum(sx) OVER pw AS BIGINT) AS cs,
        |        CAST(sum(qx) OVER pw AS BIGINT) AS cq
        |      FROM z WINDOW pw AS (PARTITION BY variant ORDER BY d
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |j AS (SELECT a.d, a.cn AS n_a, b.cn AS n_b,
        |        (CAST(a.cs AS DOUBLE) / a.cn - CAST(b.cs AS DOUBLE) / b.cn)
        |          / sqrt(CAST(a.cn * a.cq - a.cs * a.cs AS DOUBLE)
        |              / CAST(a.cn * (a.cn - 1) AS DOUBLE) / a.cn
        |            + CAST(b.cn * b.cq - b.cs * b.cs AS DOUBLE)
        |              / CAST(b.cn * (b.cn - 1) AS DOUBLE) / b.cn) AS z
        |      FROM c a JOIN c b ON a.d = b.d
        |        AND a.variant = 0 AND b.variant = 1
        |      WHERE a.cn > 1 AND b.cn > 1)
        |SELECT CAST(DATE '1970-01-01' + CAST(d AS INTEGER) AS VARCHAR)
        |         AS day,
        |       n_a, n_b, round(z, 4) AS z,
        |       CAST(CASE WHEN abs(z) >= 2.797 THEN 1 ELSE 0 END
        |         AS BIGINT) AS signif
        |FROM j ORDER BY day""".stripMargin,
    "events_ab_test" ->
      """WITH m AS (SELECT event_type, user_id % 2 AS variant,
        |             CAST(round(value * 100) AS BIGINT) AS micro
        |           FROM events),
        |g AS (SELECT event_type, variant, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(micro) AS BIGINT) AS sx,
        |        CAST(sum(micro * micro) AS BIGINT) AS qx
        |      FROM m GROUP BY 1, 2),
        |a AS (SELECT event_type, n AS n_a, sx AS s_a, qx AS q_a
        |      FROM g WHERE variant = 0),
        |b AS (SELECT event_type, n AS n_b, sx AS s_b, qx AS q_b
        |      FROM g WHERE variant = 1)
        |SELECT a.event_type, n_a, n_b,
        |       round(s_a * 1.0 / n_a / 100.0, 4) AS mean_a,
        |       round(s_b * 1.0 / n_b / 100.0, 4) AS mean_b,
        |       round((s_a * 1.0 / n_a - s_b * 1.0 / n_b)
        |         / sqrt(((n_a * q_a - s_a * s_a) * 1.0
        |                  / (n_a * (n_a - 1))) / n_a
        |              + ((n_b * q_b - s_b * s_b) * 1.0
        |                  / (n_b * (n_b - 1))) / n_b), 4) AS z
        |FROM a JOIN b USING (event_type)
        |WHERE n_a > 1 AND n_b > 1
        |ORDER BY event_type""".stripMargin,
    // revenue bridge: part-grain vol = r0·Δq/q0 micro-cents via
    // truncating div, price+mix = exact remainder; brand rollups are
    // integer sums
    "orders_revenue_bridge" ->
      """WITH li AS (SELECT l.l_partkey,
        |             CAST(l.l_quantity AS BIGINT) AS qty,
        |             CAST(round(l.l_extendedprice * (1 - l.l_discount)
        |               * 100) AS BIGINT) AS cents,
        |             date_diff('day', DATE '1970-01-01',
        |               CAST(o.o_orderdate AS DATE)) AS d
        |           FROM lineitem l JOIN orders o
        |             ON l.l_orderkey = o.o_orderkey),
        |b AS (SELECT (min(d) + max(d)) // 2 AS mid FROM li),
        |per AS (SELECT l_partkey,
        |          CAST(sum(CASE WHEN d < mid THEN qty ELSE 0 END)
        |            AS BIGINT) AS q0,
        |          CAST(sum(CASE WHEN d >= mid THEN qty ELSE 0 END)
        |            AS BIGINT) AS q1,
        |          CAST(sum(CASE WHEN d < mid THEN cents ELSE 0 END)
        |            AS BIGINT) AS r0,
        |          CAST(sum(CASE WHEN d >= mid THEN cents ELSE 0 END)
        |            AS BIGINT) AS r1
        |        FROM li CROSS JOIN b GROUP BY 1),
        |eff AS (SELECT l_partkey, r0, r1,
        |          CASE WHEN q0 > 0
        |            THEN CAST((CAST(r0 AS HUGEINT) * (q1 - q0)
        |              * 1000000) // q0 AS BIGINT)
        |            ELSE 0 END AS vol_micro
        |        FROM per),
        |ef2 AS (SELECT l_partkey, r0, r1, vol_micro,
        |          (r1 - r0) * 1000000 - vol_micro AS pm_micro
        |        FROM eff)
        |SELECT p.p_brand,
        |       round(CAST(sum(e.r1 - e.r0) AS DOUBLE) / 100.0, 2)
        |         AS delta_rev,
        |       round(CAST(sum(e.vol_micro) AS DOUBLE) / 1e8, 2)
        |         AS volume_effect,
        |       round(CAST(sum(e.pm_micro) AS DOUBLE) / 1e8, 2)
        |         AS price_mix_effect
        |FROM ef2 e JOIN part p ON e.l_partkey = p.p_partkey
        |GROUP BY 1 ORDER BY p.p_brand""".stripMargin,
    // order-1 vs order-2 Markov: same calendar split, accuracy ON
    // covered contexts + coverage reported separately
    "events_next_pred2" ->
      """WITH ev AS (SELECT user_id, event_id, ts, event_type,
        |             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |               AS d
        |           FROM events),
        |b AS (SELECT (min(d) + max(d)) // 2 AS mid FROM ev),
        |tg AS (SELECT user_id, event_id, ts, event_type,
        |         CASE WHEN d < mid THEN 'train' ELSE 'eval' END AS split
        |       FROM ev CROSS JOIN b),
        |lg AS (SELECT split, event_type,
        |         lag(event_type, 1) OVER w AS p1,
        |         lag(event_type, 2) OVER w AS p2
        |       FROM tg
        |       WINDOW w AS (PARTITION BY user_id, split
        |         ORDER BY ts, event_id)),
        |r1 AS (SELECT split, p1, event_type FROM lg
        |       WHERE p1 IS NOT NULL),
        |t1 AS (SELECT p1, event_type, CAST(count(*) AS BIGINT) AS cnt
        |       FROM r1 WHERE split = 'train' GROUP BY 1, 2),
        |m1 AS (SELECT p1, event_type AS pred FROM
        |        (SELECT *, row_number() OVER (PARTITION BY p1
        |           ORDER BY cnt DESC, event_type) AS rn FROM t1)
        |       WHERE rn = 1),
        |e1 AS (SELECT p1, event_type FROM r1 WHERE split = 'eval'),
        |s1 AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM m1)
        |           AS n_contexts,
        |         (SELECT CAST(count(*) AS BIGINT) FROM e1)
        |           AS n_eval_total,
        |         CAST(count(*) AS BIGINT) AS n_covered,
        |         CAST(sum(CASE WHEN e1.event_type = m1.pred
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
        |       FROM e1 JOIN m1 USING (p1)),
        |r2 AS (SELECT split, p2, p1, event_type FROM lg
        |       WHERE p1 IS NOT NULL AND p2 IS NOT NULL),
        |t2 AS (SELECT p2, p1, event_type, CAST(count(*) AS BIGINT)
        |           AS cnt
        |       FROM r2 WHERE split = 'train' GROUP BY 1, 2, 3),
        |m2 AS (SELECT p2, p1, event_type AS pred FROM
        |        (SELECT *, row_number() OVER (PARTITION BY p2, p1
        |           ORDER BY cnt DESC, event_type) AS rn FROM t2)
        |       WHERE rn = 1),
        |e2 AS (SELECT p2, p1, event_type FROM r2 WHERE split = 'eval'),
        |s2 AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM m2)
        |           AS n_contexts,
        |         (SELECT CAST(count(*) AS BIGINT) FROM e2)
        |           AS n_eval_total,
        |         CAST(count(*) AS BIGINT) AS n_covered,
        |         CAST(sum(CASE WHEN e2.event_type = m2.pred
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
        |       FROM e2 JOIN m2 USING (p2, p1))
        |SELECT model_order, n_contexts, n_eval_total, n_covered,
        |       n_correct,
        |       round(CAST(n_correct AS DOUBLE) / n_covered, 4)
        |         AS acc_on_covered,
        |       round(CAST(n_covered AS DOUBLE) / n_eval_total, 4)
        |         AS coverage
        |FROM (SELECT CAST(1 AS BIGINT) AS model_order, * FROM s1
        |      UNION ALL SELECT CAST(2 AS BIGINT), * FROM s2)
        |ORDER BY model_order""".stripMargin,
    // STL-lite: micro-int trend via div 7 (both engines truncate
    // toward zero), integer seasonal/resid, decimal squared sums
    "events_stl_decompose" ->
      """WITH ev AS (SELECT event_type,
        |             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |               AS d
        |           FROM events),
        |daily AS (SELECT event_type, d, CAST(count(*) AS BIGINT) AS n
        |          FROM ev GROUP BY 1, 2),
        |meta AS (SELECT min(d) AS lo, max(d) AS hi FROM ev),
        |tys AS (SELECT DISTINCT event_type FROM ev),
        |grid AS (SELECT t.event_type, g.d
        |         FROM tys t CROSS JOIN
        |           (SELECT unnest(range(lo, hi + 1)) AS d FROM meta) g),
        |dense AS (SELECT grid.event_type, grid.d,
        |            coalesce(daily.n, 0) AS n
        |          FROM grid LEFT JOIN daily USING (event_type, d)),
        |ww AS (SELECT event_type, d, n,
        |         count(*) OVER w AS c7,
        |         CAST(sum(n) OVER w AS BIGINT) AS s7
        |       FROM dense
        |       WINDOW w AS (PARTITION BY event_type ORDER BY d
        |         ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |inter AS (SELECT event_type, d, n,
        |            n * 1000000 - ((s7 * 1000000) // 7) AS detr,
        |            d % 7 AS dow
        |          FROM ww WHERE c7 = 7),
        |seas AS (SELECT event_type, dow,
        |           CAST(sum(detr) // count(*) AS BIGINT) AS sdow
        |         FROM inter GROUP BY 1, 2),
        |parts AS (SELECT i.event_type, i.n, i.detr - s.sdow AS resid,
        |            s.sdow
        |          FROM inter i JOIN seas s
        |            ON i.event_type = s.event_type AND i.dow = s.dow),
        |st AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |         CAST(sum(n * 1000000) AS BIGINT) AS sx,
        |         sum(CAST(resid AS HUGEINT) * CAST(resid AS HUGEINT))
        |           AS sr2,
        |         CAST(max(sdow) AS BIGINT) AS smax,
        |         CAST(min(sdow) AS BIGINT) AS smin
        |       FROM parts GROUP BY 1),
        |ce AS (SELECT p.event_type,
        |         sum(CAST(p.n * 1000000 - (st.sx // st.n_days) AS HUGEINT)
        |           * CAST(p.n * 1000000 - (st.sx // st.n_days)
        |             AS HUGEINT)) AS sc2
        |       FROM parts p JOIN st USING (event_type)
        |       GROUP BY 1)
        |SELECT st.event_type, st.n_days,
        |       round(CAST(st.smax - st.smin AS DOUBLE) / 1e6, 4)
        |         AS seasonal_amplitude,
        |       CASE WHEN ce.sc2 > 0
        |         THEN round(CAST(st.sr2 AS DOUBLE) / CAST(ce.sc2 AS DOUBLE),
        |           4)
        |         ELSE NULL END AS resid_var_share
        |FROM st JOIN ce USING (event_type)
        |WHERE st.n_days > 7
        |ORDER BY st.event_type""".stripMargin,
    // winsorized mean: ceil-rank order-statistic bounds off the value
    // histogram (integer clip, exact sums)
    "events_winsorized" ->
      """WITH m AS (SELECT event_type,
        |             CAST(round(value * 100) AS BIGINT) AS micro
        |           FROM events),
        |h AS (SELECT event_type, micro, CAST(count(*) AS BIGINT) AS c
        |      FROM m GROUP BY 1, 2),
        |t AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n
        |      FROM h GROUP BY 1),
        |cu AS (SELECT h.event_type, h.micro, t.n,
        |         sum(h.c) OVER (PARTITION BY h.event_type ORDER BY h.micro
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS cum
        |       FROM h JOIN t USING (event_type)),
        |b AS (SELECT event_type,
        |        min(CASE WHEN cum >= (n * 5 + 99) // 100
        |          THEN micro END) AS lo,
        |        min(CASE WHEN cum >= (n * 95 + 99) // 100
        |          THEN micro END) AS hi
        |      FROM cu GROUP BY 1),
        |cl AS (SELECT m.event_type, m.micro, b.lo, b.hi,
        |         least(greatest(m.micro, b.lo), b.hi) AS clip
        |       FROM m JOIN b USING (event_type))
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |       round(CAST(max(lo) AS DOUBLE) / 100.0, 4) AS p05,
        |       round(CAST(max(hi) AS DOUBLE) / 100.0, 4) AS p95,
        |       round(CAST(sum(micro) AS DOUBLE) / count(*) / 100.0, 4)
        |         AS mean_raw,
        |       round(CAST(sum(clip) AS DOUBLE) / count(*) / 100.0, 4)
        |         AS mean_winsorized
        |FROM cl GROUP BY 1 ORDER BY event_type""".stripMargin,
    // A/A null test: arm-A users re-split by an independent md5 coin
    "events_aa_test" ->
      """WITH m AS (SELECT event_type,
        |             CAST('0x' || substr(md5('aa|' ||
        |               CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) % 2
        |               AS variant,
        |             CAST(round(value * 100) AS BIGINT) AS micro
        |           FROM events WHERE user_id % 2 = 0),
        |g AS (SELECT event_type, variant, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(micro) AS BIGINT) AS sx,
        |        CAST(sum(micro * micro) AS BIGINT) AS qx
        |      FROM m GROUP BY 1, 2),
        |a AS (SELECT event_type, n AS n_a, sx AS s_a, qx AS q_a
        |      FROM g WHERE variant = 0),
        |b AS (SELECT event_type, n AS n_b, sx AS s_b, qx AS q_b
        |      FROM g WHERE variant = 1),
        |zc AS (SELECT a.event_type, n_a, n_b,
        |         (s_a * 1.0 / n_a - s_b * 1.0 / n_b)
        |           / sqrt((CAST(CAST(n_a AS HUGEINT) * q_a
        |                 - CAST(s_a AS HUGEINT) * s_a AS DOUBLE)
        |               / (n_a * (n_a - 1))) / n_a
        |             + (CAST(CAST(n_b AS HUGEINT) * q_b
        |                 - CAST(s_b AS HUGEINT) * s_b AS DOUBLE)
        |               / (n_b * (n_b - 1))) / n_b) AS z
        |       FROM a JOIN b USING (event_type)
        |       WHERE n_a > 1 AND n_b > 1)
        |SELECT event_type, n_a, n_b, round(z, 4) AS z,
        |       (abs(z) > 1.96) AS sig
        |FROM zc ORDER BY event_type""".stripMargin,
    // SRM guardrail: two-cell equal-prob chi2 on distinct users/arm
    "events_ab_srm" ->
      """WITH u AS (SELECT DISTINCT event_type, user_id,
        |             user_id % 2 AS variant
        |           FROM events),
        |g AS (SELECT event_type,
        |        CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END)
        |          AS BIGINT) AS n_a,
        |        CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END)
        |          AS BIGINT) AS n_b
        |      FROM u GROUP BY 1)
        |SELECT event_type, n_a, n_b,
        |       round(CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE)
        |         / (n_a + n_b), 4) AS chi2,
        |       (CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE)
        |         / (n_a + n_b) > 3.841) AS srm
        |FROM g ORDER BY event_type""".stripMargin,
    // DiD 2x2: cell means from integer micro sums, midpoint from data
    "events_did" ->
      """WITH m AS (SELECT event_type, user_id % 2 AS treat,
        |             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |               AS d,
        |             CAST(round(value * 100) AS BIGINT) AS micro
        |           FROM events),
        |b AS (SELECT (min(d) + max(d)) // 2 AS mid FROM m),
        |g AS (SELECT event_type,
        |        CAST(sum(CASE WHEN treat = 1 AND d < mid
        |          THEN micro ELSE 0 END) AS BIGINT) AS s_pre_t,
        |        CAST(sum(CASE WHEN treat = 1 AND d < mid
        |          THEN 1 ELSE 0 END) AS BIGINT) AS n_pre_t,
        |        CAST(sum(CASE WHEN treat = 1 AND d >= mid
        |          THEN micro ELSE 0 END) AS BIGINT) AS s_post_t,
        |        CAST(sum(CASE WHEN treat = 1 AND d >= mid
        |          THEN 1 ELSE 0 END) AS BIGINT) AS n_post_t,
        |        CAST(sum(CASE WHEN treat = 0 AND d < mid
        |          THEN micro ELSE 0 END) AS BIGINT) AS s_pre_c,
        |        CAST(sum(CASE WHEN treat = 0 AND d < mid
        |          THEN 1 ELSE 0 END) AS BIGINT) AS n_pre_c,
        |        CAST(sum(CASE WHEN treat = 0 AND d >= mid
        |          THEN micro ELSE 0 END) AS BIGINT) AS s_post_c,
        |        CAST(sum(CASE WHEN treat = 0 AND d >= mid
        |          THEN 1 ELSE 0 END) AS BIGINT) AS n_post_c
        |      FROM m CROSS JOIN b GROUP BY 1)
        |SELECT event_type,
        |       round(s_pre_t * 1.0 / n_pre_t / 100.0, 4) AS pre_t,
        |       round(s_post_t * 1.0 / n_post_t / 100.0, 4) AS post_t,
        |       round(s_pre_c * 1.0 / n_pre_c / 100.0, 4) AS pre_c,
        |       round(s_post_c * 1.0 / n_post_c / 100.0, 4) AS post_c,
        |       round((s_post_t * 1.0 / n_post_t / 100.0
        |           - s_pre_t * 1.0 / n_pre_t / 100.0)
        |         - (s_post_c * 1.0 / n_post_c / 100.0
        |           - s_pre_c * 1.0 / n_pre_c / 100.0), 4) AS did
        |FROM g
        |WHERE n_pre_t > 0 AND n_post_t > 0 AND n_pre_c > 0
        |  AND n_post_c > 0
        |ORDER BY event_type""".stripMargin,
    // win-back: gap over the (user, day) distinct set, month rollup
    "events_reactivation" ->
      """WITH ud AS (SELECT DISTINCT user_id,
        |        date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |          AS d
        |      FROM events),
        |g AS (SELECT user_id, d,
        |        d - lag(d) OVER (PARTITION BY user_id ORDER BY d)
        |          AS gap
        |      FROM ud),
        |m AS (SELECT user_id, d // 30 AS mon,
        |        (gap IS NOT NULL AND gap > 60) AS rea
        |      FROM g)
        |SELECT mon, CAST(count(DISTINCT user_id) AS BIGINT) AS n_active,
        |       CAST(count(DISTINCT CASE WHEN rea THEN user_id END)
        |         AS BIGINT) AS n_reactivated,
        |       round(CAST(count(DISTINCT CASE WHEN rea THEN user_id END)
        |           AS DOUBLE)
        |         / count(DISTINCT user_id), 6) AS reactivation_rate
        |FROM m GROUP BY 1 ORDER BY mon""".stripMargin,
    // shingle df histogram: integer CASE cuts; the 2-8 band is the
    // containment path's blocking-key supply
    "dedup_shingle_df_hist" ->
      s"""WITH $shingleCte,
         |ex AS (SELECT doc_id, unnest(shingles) AS sh FROM sh),
         |df AS (SELECT sh AS shingle,
         |         CAST(count(DISTINCT doc_id) AS BIGINT) AS df
         |       FROM ex GROUP BY 1)
         |SELECT CASE WHEN df = 1 THEN '1_hapax'
         |            WHEN df <= 8 THEN '2-8_blocking_band'
         |            WHEN df <= 64 THEN '9-64_common'
         |            ELSE '65+_boilerplate' END AS df_bucket,
         |       CAST(count(*) AS BIGINT) AS n_shingles
         |FROM df GROUP BY 1 ORDER BY df_bucket""".stripMargin,
    // per-day share HALF-UP micro-quantized, then integer-moment OLS
    "events_share_trend" ->
      """WITH daily AS (SELECT event_type,
        |        date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |          AS d,
        |        CAST(count(*) AS BIGINT) AS n
        |      FROM events GROUP BY 1, 2),
        |tot AS (SELECT d, CAST(sum(n) AS BIGINT) AS tot
        |        FROM daily GROUP BY 1),
        |sh AS (SELECT daily.event_type, daily.d,
        |         (2 * daily.n * 1000000 + tot.tot) // (2 * tot.tot)
        |           AS sh
        |       FROM daily JOIN tot ON daily.d = tot.d),
        |b AS (SELECT min(d) AS d0 FROM sh),
        |st AS (SELECT event_type, CAST(count(*) AS BIGINT) AS nd,
        |         CAST(sum(d - b.d0) AS BIGINT) AS sx,
        |         CAST(sum(sh) AS BIGINT) AS sy,
        |         sum(CAST(d - b.d0 AS HUGEINT) * (d - b.d0)) AS sxx,
        |         sum(CAST(d - b.d0 AS HUGEINT) * sh) AS sxy
        |       FROM sh, b GROUP BY 1)
        |SELECT event_type, nd AS n_days,
        |       round(CAST(CAST(nd AS HUGEINT) * sxy
        |           - CAST(sx AS HUGEINT) * sy AS DOUBLE)
        |         / CAST(CAST(nd AS HUGEINT) * sxx
        |           - CAST(sx AS HUGEINT) * sx AS DOUBLE), 4)
        |         AS slope_ppm_per_day
        |FROM st WHERE nd > 1 ORDER BY event_type""".stripMargin,
    // quartiles exact interpolation on the 2dp micro grid; Tukey
    // fences; outlier count one integer-vs-fence comparison per row
    "events_value_boxplot" ->
      """WITH ev AS (SELECT event_type,
        |              CAST(round(value * 100) AS BIGINT) AS micro
        |            FROM events),
        |q AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |        quantile_cont(micro, 0.25) AS q1,
        |        quantile_cont(micro, 0.5) AS q2,
        |        quantile_cont(micro, 0.75) AS q3
        |      FROM ev GROUP BY 1),
        |f AS (SELECT event_type, n, q1, q2, q3, q3 - q1 AS iqr,
        |        q1 - 1.5 * (q3 - q1) AS lo_fence,
        |        q3 + 1.5 * (q3 - q1) AS hi_fence
        |      FROM q),
        |o AS (SELECT ev.event_type, CAST(count(*) AS BIGINT)
        |          AS n_outliers
        |      FROM ev JOIN f ON ev.event_type = f.event_type
        |      WHERE ev.micro < f.lo_fence OR ev.micro > f.hi_fence
        |      GROUP BY 1)
        |SELECT f.event_type, f.n,
        |       round(f.q1 / 100.0, 4) AS q1,
        |       round(f.q2 / 100.0, 4) AS median,
        |       round(f.q3 / 100.0, 4) AS q3,
        |       round(f.iqr / 100.0, 4) AS iqr,
        |       coalesce(o.n_outliers, 0) AS n_outliers
        |FROM f LEFT JOIN o ON f.event_type = o.event_type
        |ORDER BY f.event_type""".stripMargin,
    // Beta(20,80) pseudo-count shrinkage: one exact-integer division
    "supplier_return_shrinkage" ->
      """WITH g AS (SELECT l_suppkey AS s_suppkey,
        |             CAST(count(*) AS BIGINT) AS n,
        |             CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1
        |               ELSE 0 END) AS BIGINT) AS returned
        |           FROM lineitem GROUP BY 1)
        |SELECT s_suppkey, n, returned,
        |       round(CAST(returned AS DOUBLE) / n, 6) AS raw_rate,
        |       round(CAST(returned + 20 AS DOUBLE) / (n + 100), 6)
        |         AS shrunk_rate
        |FROM g ORDER BY shrunk_rate DESC, s_suppkey LIMIT 20""".stripMargin,
    // 12*q_month/q_annual per brand: exact integer quantities
    "part_seasonal_index" ->
      """WITH g AS (SELECT p.p_brand,
        |        CAST(month(CAST(l.l_shipdate AS DATE)) AS BIGINT) AS m,
        |        CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT)
        |          AS qty
        |      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |      GROUP BY 1, 2),
        |t AS (SELECT p_brand, CAST(sum(qty) AS BIGINT) AS q_total
        |      FROM g GROUP BY 1)
        |SELECT g.p_brand, g.m, g.qty,
        |       round(CAST(g.qty AS DOUBLE) * 12.0
        |         / CAST(t.q_total AS DOUBLE), 4) AS seasonal_index
        |FROM g JOIN t ON g.p_brand = t.p_brand
        |ORDER BY g.p_brand, g.m""".stripMargin,
    // rolling distinct actives: each (user, day) covers window-ends
    // [day, min(day+W-1, next-1)] (clipped at the user's next
    // activity so overlaps never double-count); rolling distinct =
    // covering-interval count via the ±1 sweep
    "events_rolling_active" ->
      """WITH ud AS (SELECT DISTINCT user_id,
        |        date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |          AS d
        |      FROM events),
        |iv AS (SELECT user_id, d,
        |         lead(d) OVER (PARTITION BY user_id ORDER BY d) AS nxt
        |       FROM ud),
        |b AS (SELECT min(d) AS lo, max(d) AS hi FROM ud),
        |cal AS (SELECT unnest(generate_series(b.lo, b.hi)) AS d FROM b),
        |w7 AS (SELECT t, CAST(sum(delta) AS BIGINT) AS dd FROM (
        |         SELECT d AS t, 1 AS delta FROM iv
        |         UNION ALL
        |         SELECT least(d + 6, coalesce(nxt - 1, d + 6)) + 1, -1
        |         FROM iv) GROUP BY 1),
        |w30 AS (SELECT t, CAST(sum(delta) AS BIGINT) AS dd FROM (
        |          SELECT d AS t, 1 AS delta FROM iv
        |          UNION ALL
        |          SELECT least(d + 29, coalesce(nxt - 1, d + 29)) + 1, -1
        |          FROM iv) GROUP BY 1),
        |r7 AS (SELECT cal.d, CAST(sum(coalesce(w7.dd, 0))
        |         OVER (ORDER BY cal.d ROWS UNBOUNDED PRECEDING)
        |         AS BIGINT) AS wau7
        |       FROM cal LEFT JOIN w7 ON cal.d = w7.t),
        |r30 AS (SELECT cal.d, CAST(sum(coalesce(w30.dd, 0))
        |          OVER (ORDER BY cal.d ROWS UNBOUNDED PRECEDING)
        |          AS BIGINT) AS mau30
        |        FROM cal LEFT JOIN w30 ON cal.d = w30.t),
        |da AS (SELECT d, CAST(count(*) AS BIGINT) AS dau
        |       FROM ud GROUP BY 1)
        |SELECT CAST(DATE '1970-01-01' + CAST(cal.d AS INTEGER)
        |         AS VARCHAR) AS day,
        |       coalesce(da.dau, 0) AS dau, r7.wau7, r30.mau30,
        |       CASE WHEN r30.mau30 > 0
        |            THEN round(CAST(coalesce(da.dau, 0) AS DOUBLE)
        |              / r30.mau30, 4) END AS stickiness
        |FROM cal LEFT JOIN da ON cal.d = da.d
        |JOIN r7 ON cal.d = r7.d JOIN r30 ON cal.d = r30.d
        |ORDER BY day""".stripMargin,
    // first-order Markov next-event baseline: transitions learned on
    // the first calendar half, graded on pairs wholly inside the
    // second (lag partitioned by (user, split) — no straddling pair)
    "events_next_pred" ->
      """WITH ev AS (SELECT user_id, event_id, ts, event_type,
        |        date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |          AS d
        |      FROM events),
        |bn AS (SELECT (min(d) + max(d)) // 2 AS mid FROM ev),
        |tg AS (SELECT user_id, event_id, ts, event_type,
        |         CASE WHEN d < bn.mid THEN 'train' ELSE 'eval' END
        |           AS split
        |       FROM ev, bn),
        |p AS (SELECT split, event_type,
        |        lag(event_type) OVER (PARTITION BY user_id, split
        |          ORDER BY ts, event_id) AS prev
        |      FROM tg),
        |pr AS (SELECT split, prev, event_type FROM p
        |       WHERE prev IS NOT NULL),
        |tr AS (SELECT prev, event_type, CAST(count(*) AS BIGINT) AS cnt
        |       FROM pr WHERE split = 'train' GROUP BY 1, 2),
        |md AS (SELECT prev, event_type AS predicted_next, cnt FROM (
        |         SELECT prev, event_type, cnt,
        |           row_number() OVER (PARTITION BY prev
        |             ORDER BY cnt DESC, event_type) AS rn
        |         FROM tr) WHERE rn = 1),
        |nt AS (SELECT prev, CAST(sum(cnt) AS BIGINT) AS n_train
        |       FROM tr GROUP BY 1),
        |ea AS (SELECT pr.prev, CAST(count(*) AS BIGINT) AS n_eval,
        |         CAST(sum(CASE WHEN pr.event_type = md.predicted_next
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
        |       FROM pr JOIN md ON pr.prev = md.prev
        |       WHERE pr.split = 'eval' GROUP BY 1)
        |SELECT md.prev, nt.n_train, md.predicted_next,
        |       ea.n_eval, ea.n_correct,
        |       round(CAST(ea.n_correct AS DOUBLE) / ea.n_eval, 4)
        |         AS accuracy
        |FROM md JOIN nt ON md.prev = nt.prev
        |JOIN ea ON md.prev = ea.prev
        |ORDER BY md.prev""".stripMargin,
    // truncated Holt: the per-day window fold unrolls as a recursive
    // CTE stepping through the ≤14-element window list; micro-unit
    // integer recursion with truncating // ≡ Spark div ≡ Scala Long./
    "events_forecast_holt" ->
      s"""WITH RECURSIVE $holtCtes
         |SELECT event_type,
         |       CAST(DATE '1970-01-01' + CAST(d AS INTEGER) AS VARCHAR)
         |         AS day,
         |       round(CAST(l AS DOUBLE) / 1000000.0, 4) AS level,
         |       round(CAST(b AS DOUBLE) / 1000000.0, 4) AS trend,
         |       round(CAST(l + b AS DOUBLE) / 1000000.0, 4) AS forecast1
         |FROM f ORDER BY event_type, day""".stripMargin,
    // head-to-head backtest over the SAME Holt chain: one-step-ahead
    // = previous day's l+b (lag), naive = n seven days back; errors
    // exact micro-unit integers, winner an integer comparison
    "events_forecast_eval" ->
      s"""WITH RECURSIVE $holtCtes,
         |g AS (SELECT f.event_type, f.d, dense.n, f.l + f.b AS fc
         |      FROM f JOIN dense ON f.event_type = dense.event_type
         |                       AND f.d = dense.d),
         |h AS (SELECT event_type, d, n,
         |        lag(fc) OVER (PARTITION BY event_type ORDER BY d)
         |          AS holt_pred,
         |        lag(n, 7) OVER (PARTITION BY event_type ORDER BY d)
         |          AS naive_pred
         |      FROM g),
         |e AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
         |        CAST(sum(abs(n * 1000000 - holt_pred)) AS BIGINT)
         |          AS holt_err,
         |        CAST(sum(abs(n - naive_pred) * 1000000) AS BIGINT)
         |          AS naive_err,
         |        CAST(sum(n * 1000000) AS BIGINT) AS actual
         |      FROM h
         |      WHERE holt_pred IS NOT NULL AND naive_pred IS NOT NULL
         |      GROUP BY 1)
         |SELECT event_type, n_days,
         |       round(CAST(naive_err AS DOUBLE) / actual, 6)
         |         AS wape_naive,
         |       round(CAST(holt_err AS DOUBLE) / actual, 6)
         |         AS wape_holt,
         |       CASE WHEN holt_err < naive_err THEN 'holt'
         |            WHEN holt_err > naive_err THEN 'naive'
         |            ELSE 'tie' END AS winner
         |FROM e WHERE actual > 0 ORDER BY event_type""".stripMargin,
    // boundary sweep over sessionized intervals (+1 start, -1 end+1);
    // the oracle affords the single global running sum the Spark
    // plan decomposes through day bands
    "events_peak_concurrency" ->
      """WITH x AS (
        |  SELECT user_id, event_id, ts,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |                OR CAST(floor(epoch(ts)) AS BIGINT)
        |                   - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT)
        |                  > 1800
        |              THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |y AS (
        |  SELECT user_id, ts,
        |         sum(new_session) OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
        |           AS session_id
        |  FROM x),
        |sess AS (SELECT user_id, session_id,
        |           min(CAST(floor(epoch(ts)) AS BIGINT)) AS st,
        |           max(CAST(floor(epoch(ts)) AS BIGINT)) AS en
        |         FROM y GROUP BY 1, 2),
        |bounds AS (SELECT st AS t, 1 AS delta FROM sess
        |           UNION ALL SELECT en + 1, -1 FROM sess),
        |byt AS (SELECT t, CAST(sum(delta) AS BIGINT) AS d,
        |          CAST(sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END)
        |            AS BIGINT) AS starts
        |        FROM bounds GROUP BY 1),
        |run AS (SELECT t, starts,
        |          sum(d) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
        |            AS c
        |        FROM byt)
        |SELECT t // 86400 AS day_n, CAST(sum(starts) AS BIGINT)
        |         AS n_starts,
        |       CAST(max(c) AS BIGINT) AS peak_concurrent
        |FROM run GROUP BY 1 ORDER BY day_n""".stripMargin,
    // Fano factor over the same dense grid: exact integer moments
    // (squares in HUGEINT ≡ DECIMAL(38,0)), all-double k-row tail
    "events_fano" ->
      """WITH ev AS (SELECT event_type,
        |        date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |          AS d
        |      FROM events),
        |daily AS (SELECT event_type, d, CAST(count(*) AS BIGINT) AS n
        |          FROM ev GROUP BY 1, 2),
        |b AS (SELECT min(d) AS lo, max(d) AS hi FROM ev),
        |cal AS (SELECT unnest(generate_series(b.lo, b.hi)) AS d FROM b),
        |tys AS (SELECT DISTINCT event_type FROM ev),
        |grid AS (SELECT tys.event_type, cal.d FROM tys CROSS JOIN cal),
        |s AS (SELECT g.event_type, g.d, coalesce(daily.n, 0) AS n
        |      FROM grid g LEFT JOIN daily
        |        ON g.event_type = daily.event_type AND g.d = daily.d),
        |g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |        CAST(sum(n) AS BIGINT) AS s1,
        |        sum(CAST(n AS HUGEINT) * n) AS s2
        |      FROM s GROUP BY 1)
        |SELECT event_type, n_days,
        |       round(CAST(s1 AS DOUBLE) / n_days, 4) AS mean_daily,
        |       round((CAST(CAST(n_days AS HUGEINT) * s2
        |           - CAST(s1 AS HUGEINT) * s1 AS DOUBLE)
        |         / (CAST(n_days AS DOUBLE)
        |           * (CAST(n_days AS DOUBLE) - 1.0)))
        |         / (CAST(s1 AS DOUBLE) / n_days), 4) AS fano
        |FROM g WHERE n_days > 1 AND s1 > 0
        |ORDER BY event_type""".stripMargin,
    // Page–Hinkley replay: running mean HALF-UP quantized to exact
    // micro-units via (2·cum·10⁶ + t) // (2·t), so U / prefix-min /
    // PH / alarms are all integer comparisons on both engines
    "events_page_hinkley" ->
      """WITH ev AS (SELECT event_type,
        |        date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |          AS d
        |      FROM events),
        |daily AS (SELECT event_type, d, CAST(count(*) AS BIGINT) AS n
        |          FROM ev GROUP BY 1, 2),
        |b AS (SELECT min(d) AS lo, max(d) AS hi FROM ev),
        |cal AS (SELECT unnest(generate_series(b.lo, b.hi)) AS d FROM b),
        |tys AS (SELECT DISTINCT event_type FROM ev),
        |grid AS (SELECT tys.event_type, cal.d FROM tys CROSS JOIN cal),
        |s AS (SELECT g.event_type, g.d, coalesce(daily.n, 0) AS n
        |      FROM grid g LEFT JOIN daily
        |        ON g.event_type = daily.event_type AND g.d = daily.d),
        |w AS (SELECT event_type, d, n,
        |        row_number() OVER (PARTITION BY event_type ORDER BY d)
        |          AS t,
        |        sum(n) OVER (PARTITION BY event_type ORDER BY d
        |          ROWS UNBOUNDED PRECEDING) AS cum
        |      FROM s),
        |x AS (SELECT event_type, d,
        |        n * 1000000 - ((2 * cum * 1000000 + t) // (2 * t))
        |          - 2000000 AS dev
        |      FROM w),
        |y AS (SELECT event_type, d,
        |        sum(dev) OVER (PARTITION BY event_type ORDER BY d
        |          ROWS UNBOUNDED PRECEDING) AS u
        |      FROM x),
        |z AS (SELECT event_type, d, u,
        |        min(u) OVER (PARTITION BY event_type ORDER BY d
        |          ROWS UNBOUNDED PRECEDING) AS minu
        |      FROM y)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |       round(CAST(max(u - minu) AS DOUBLE) / 1000000.0, 4)
        |         AS max_ph,
        |       CAST(sum(CASE WHEN u - minu > 50000000 THEN 1 ELSE 0 END)
        |         AS BIGINT) AS n_alarms,
        |       CAST(min(CASE WHEN u - minu > 50000000 THEN d END)
        |         AS BIGINT) AS first_alarm_d
        |FROM z GROUP BY 1 ORDER BY event_type""".stripMargin,
    // rank-sum from the value HISTOGRAM: tie-averaged doubled rank
    // 2·cum−ct+1 is an exact integer; HUGEINT ≡ Spark DECIMAL(38,0)
    // for the doubled rank-sum + tie correction; z all-double tail
    "events_mann_whitney" ->
      """WITH m AS (SELECT event_type, user_id % 2 AS variant,
        |             CAST(round(value * 100) AS BIGINT) AS micro
        |           FROM events),
        |g AS (SELECT event_type, micro, CAST(count(*) AS BIGINT) AS ct,
        |        CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END)
        |          AS BIGINT) AS ca
        |      FROM m GROUP BY 1, 2),
        |r AS (SELECT event_type, ct, ca,
        |        sum(ct) OVER (PARTITION BY event_type ORDER BY micro
        |                      ROWS UNBOUNDED PRECEDING) AS cum
        |      FROM g),
        |s AS (SELECT event_type,
        |        sum(CAST(ca AS HUGEINT) * (2 * cum - ct + 1)) AS r1x2,
        |        CAST(sum(ca) AS BIGINT) AS n1,
        |        CAST(sum(ct) AS BIGINT) AS n,
        |        sum(CAST(ct AS HUGEINT) * ct * ct - ct) AS tiesum
        |      FROM r GROUP BY 1),
        |f AS (SELECT event_type, n1, n - n1 AS n2,
        |        CAST(r1x2 AS DOUBLE) / 2.0
        |          - CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1.0)
        |            / 2.0 AS u1,
        |        CAST(n1 AS DOUBLE) * CAST(n - n1 AS DOUBLE) / 12.0
        |          * (CAST(n AS DOUBLE) + 1.0
        |             - CAST(tiesum AS DOUBLE)
        |               / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
        |          AS sigma2,
        |        CAST(n1 AS DOUBLE) * CAST(n - n1 AS DOUBLE) / 2.0 AS mu
        |      FROM s WHERE n1 > 0 AND n - n1 > 0)
        |SELECT event_type, n1 AS n_a, n2 AS n_b,
        |       round(u1, 1) AS u,
        |       round((u1 - mu) / sqrt(sigma2), 4) AS z
        |FROM f ORDER BY event_type""".stripMargin,
    // ECDF gap as exact integer cross-product |cumA·nB − cumB·nA|;
    // one division on the fold; scaled stat uses √/÷ only (no libm)
    "events_ks_test" ->
      """WITH m AS (SELECT event_type, user_id % 2 AS variant,
        |             CAST(round(value * 100) AS BIGINT) AS micro
        |           FROM events),
        |g AS (SELECT event_type, micro,
        |        CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END)
        |          AS BIGINT) AS ca,
        |        CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END)
        |          AS BIGINT) AS cb
        |      FROM m GROUP BY 1, 2),
        |c AS (SELECT event_type,
        |        sum(ca) OVER (PARTITION BY event_type ORDER BY micro
        |                      ROWS UNBOUNDED PRECEDING) AS cum_a,
        |        sum(cb) OVER (PARTITION BY event_type ORDER BY micro
        |                      ROWS UNBOUNDED PRECEDING) AS cum_b
        |      FROM g),
        |t AS (SELECT event_type, cum_a, cum_b,
        |        max(cum_a) OVER (PARTITION BY event_type) AS na,
        |        max(cum_b) OVER (PARTITION BY event_type) AS nb
        |      FROM c),
        |s AS (SELECT event_type, CAST(max(na) AS BIGINT) AS n_a,
        |        CAST(max(nb) AS BIGINT) AS n_b,
        |        max(abs(CAST(cum_a AS HUGEINT) * nb
        |                - CAST(cum_b AS HUGEINT) * na)) AS dnum
        |      FROM t GROUP BY 1),
        |f AS (SELECT event_type, n_a, n_b,
        |        CAST(dnum AS DOUBLE)
        |          / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) AS d
        |      FROM s WHERE n_a > 0 AND n_b > 0)
        |SELECT event_type, n_a, n_b, round(d, 6) AS ks_d,
        |       round(d * sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
        |         / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))), 4)
        |         AS ks_stat
        |FROM f ORDER BY event_type""".stripMargin,
    // power sums exact in HUGEINT ≡ DECIMAL(38,0); central-moment
    // assembly all-double on the k-row fold; m2^1.5 spelled m2·√m2
    "events_moments" ->
      """WITH m AS (SELECT event_type,
        |             CAST(round(value * 100) AS BIGINT) AS micro
        |           FROM events),
        |g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(micro) AS BIGINT) AS s1,
        |        sum(CAST(micro AS HUGEINT) * micro) AS s2,
        |        sum(CAST(micro AS HUGEINT) * micro * micro) AS s3,
        |        sum(CAST(micro AS HUGEINT) * micro * micro * micro) AS s4
        |      FROM m GROUP BY 1),
        |f AS (SELECT event_type, n,
        |        CAST(s1 AS DOUBLE) / n AS mean,
        |        CAST(s2 AS DOUBLE) / n AS e2,
        |        CAST(s3 AS DOUBLE) / n AS e3,
        |        CAST(s4 AS DOUBLE) / n AS e4
        |      FROM g WHERE n > 1),
        |c AS (SELECT event_type, n, mean,
        |        e2 - mean * mean AS m2,
        |        e3 - 3.0 * mean * e2 + 2.0 * mean * mean * mean AS m3,
        |        e4 - 4.0 * mean * e3 + 6.0 * mean * mean * e2
        |          - 3.0 * mean * mean * mean * mean AS m4
        |      FROM f)
        |SELECT event_type, n, round(mean / 100.0, 4) AS mean_val,
        |       round(m3 / (m2 * sqrt(m2)), 4) AS skewness,
        |       round(m4 / (m2 * m2) - 3.0, 4) AS kurtosis
        |FROM c ORDER BY event_type""".stripMargin,
    // discrete KM hazard: span div 90 via floor division on both
    // engines (a double / + CAST would truncate vs round-half-even);
    // survival products deliberately not emitted (float fold order)
    "customer_churn_hazard" ->
      """WITH o AS (SELECT o_custkey AS cust,
        |        date_diff('day', DATE '1970-01-01',
        |          CAST(o_orderdate AS DATE)) AS d
        |      FROM orders),
        |h AS (SELECT max(d) AS hz FROM o),
        |per AS (SELECT (max(d) - min(d)) // 90 AS iv,
        |          CASE WHEN h.hz - max(d) > 90 THEN 1 ELSE 0 END
        |            AS churned
        |        FROM o, h GROUP BY cust, h.hz),
        |b AS (SELECT iv, CAST(count(*) AS BIGINT) AS leaving,
        |        CAST(sum(churned) AS BIGINT) AS d_churn
        |      FROM per GROUP BY 1),
        |r AS (SELECT iv, leaving, d_churn,
        |        CAST(sum(leaving) OVER (ORDER BY iv DESC
        |          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_risk
        |      FROM b)
        |SELECT iv, n_risk, d_churn,
        |       round(CAST(d_churn AS DOUBLE) / CAST(n_risk AS DOUBLE), 6)
        |         AS hazard
        |FROM r ORDER BY iv""".stripMargin,
    // CUPED: θ from pooled exact moments; every reported statistic
    // closes over integer moments (Y_adj is affine in x, y — no
    // per-user float aggregate anywhere)
    "events_ab_cuped" -> {
      val theta = "(n * sxy - sx * sy) * 1.0 / (n * sxx - sx * sx)"
      val vary = "(nv * vsyy - vsy * vsy) * 1.0 / (nv * (nv - 1))"
      val covv = "(nv * vsxy - vsx * vsy) * 1.0 / (nv * (nv - 1))"
      val varx = "(nv * vsxx - vsx * vsx) * 1.0 / (nv * (nv - 1))"
      s"""WITH ev AS (SELECT user_id,
         |        date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
         |          AS d,
         |        CAST(round(value * 100) AS BIGINT) AS micro
         |      FROM events),
         |bn AS (SELECT (min(d) + max(d)) // 2 AS mid FROM ev),
         |per AS (SELECT user_id,
         |        sum(CASE WHEN d < bn.mid THEN micro ELSE 0 END) AS x,
         |        sum(CASE WHEN d >= bn.mid THEN micro ELSE 0 END) AS y,
         |        user_id % 2 AS variant
         |      FROM ev, bn GROUP BY user_id, bn.mid),
         |p AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS sx,
         |        sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx
         |      FROM per),
         |v AS (SELECT variant, CAST(count(*) AS BIGINT) AS nv,
         |        sum(x) AS vsx, sum(y) AS vsy, sum(x * y) AS vsxy,
         |        sum(x * x) AS vsxx, sum(y * y) AS vsyy
         |      FROM per GROUP BY 1)
         |SELECT CAST(variant AS BIGINT) AS variant, nv AS n_users,
         |  round($theta, 6) AS theta,
         |  round(vsy * 1.0 / nv / 100.0, 4) AS mean_y,
         |  round((vsy * 1.0 / nv - ($theta) *
         |    (vsx * 1.0 / nv - sx * 1.0 / n)) / 100.0, 4) AS mean_y_adj,
         |  round((($vary) - 2 * ($theta) * ($covv) +
         |    ($theta) * ($theta) * ($varx)) / ($vary), 4)
         |    AS var_ratio
         |FROM v, p WHERE nv >= 2 AND ($vary) > 0
         |ORDER BY variant""".stripMargin
    },
    // degree assortativity: exact integer moments over the symmetric
    // mutual edge list, degrees bounded by k
    "graph_assortativity" ->
      s"""WITH $ivfGraphCtes,
         |g AS (SELECT qid, id FROM gr WHERE rk <= 5),
         |mu AS (SELECT g1.qid AS id_a, g1.id AS id_b
         |       FROM g g1 JOIN g g2 ON g1.qid = g2.id AND g1.id = g2.qid
         |       WHERE g1.qid < g1.id),
         |sym AS (SELECT id_a AS a, id_b AS b FROM mu
         |        UNION ALL SELECT id_b, id_a FROM mu),
         |dgr AS (SELECT a AS id, CAST(count(*) AS BIGINT) AS dg
         |       FROM sym GROUP BY 1),
         |pe AS (SELECT da.dg AS da, db.dg AS db
         |       FROM sym JOIN dgr da ON sym.a = da.id
         |       JOIN dgr db ON sym.b = db.id),
         |ag AS (SELECT CAST(count(*) AS BIGINT) AS m, sum(da) AS sa,
         |        sum(db) AS sb, sum(da * db) AS sab,
         |        sum(da * da) AS saa, sum(db * db) AS sbb FROM pe)
         |SELECT m AS n_edges,
         |  round((m * sab - sa * sb) * 1.0 /
         |    (sqrt((m * saa - sa * sa) * 1.0 * (m * sbb - sb * sb))), 4)
         |    AS assortativity
         |FROM ag""".stripMargin,
    // adjacent-token PMI: exact integer counts, corpus-total bigram
    // space (the support filter prunes candidates only)
    "text_collocations" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM documents),
        |uni AS (SELECT u.t, CAST(count(*) AS BIGINT) AS n
        |        FROM (SELECT unnest(toks) AS t FROM t) u GROUP BY 1),
        |ut AS (SELECT CAST(sum(n) AS BIGINT) AS tt FROM uni),
        |bg0 AS (SELECT toks[i.i + 1] AS t1, toks[i.i + 2] AS t2
        |        FROM t CROSS JOIN (SELECT unnest(range(256)) AS i) i
        |        WHERE i.i <= len(toks) - 2),
        |bgc AS (SELECT t1, t2, CAST(count(*) AS BIGINT) AS n_ab
        |        FROM bg0 GROUP BY 1, 2),
        |bt AS (SELECT CAST(sum(n_ab) AS BIGINT) AS bt FROM bgc),
        |sc AS (SELECT b.t1, b.t2, b.n_ab,
        |         round(log2((b.n_ab * 1.0 / bt.bt)
        |           / ((u1.n * 1.0 / ut.tt) * (u2.n * 1.0 / ut.tt))), 4)
        |           AS pmi
        |       FROM bgc b JOIN uni u1 ON b.t1 = u1.t
        |       JOIN uni u2 ON b.t2 = u2.t
        |       CROSS JOIN ut CROSS JOIN bt
        |       WHERE b.n_ab >= 5)
        |SELECT t1, t2, n_ab, pmi FROM sc
        |ORDER BY pmi DESC, t1, t2 LIMIT 20""".stripMargin,
    // event-type co-occurrence PMI over user-day incidence: pairs
    // expand only within a user-day; marginals and the total are
    // aggregate-sized
    "events_cooccurrence" ->
      """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day,
        |              event_type
        |            FROM events),
        |tot AS (SELECT count(*) AS n_days FROM
        |          (SELECT DISTINCT user_id, day FROM ud)),
        |mg AS (SELECT event_type, count(*) AS n_type FROM ud GROUP BY 1),
        |p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
        |        count(*) AS n_both
        |      FROM ud a JOIN ud b ON a.user_id = b.user_id
        |        AND a.day = b.day AND a.event_type < b.event_type
        |      GROUP BY 1, 2 HAVING count(*) >= 5)
        |SELECT p.type_a, p.type_b, CAST(p.n_both AS BIGINT) AS n_both,
        |       round(log2(p.n_both * 1.0 * t.n_days
        |         / (ma.n_type * 1.0 * mb.n_type)), 4) AS pmi
        |FROM p JOIN mg ma ON p.type_a = ma.event_type
        |JOIN mg mb ON p.type_b = mb.event_type
        |CROSS JOIN tot t ORDER BY type_a, type_b""".stripMargin,
    // 2-D Pareto frontier: the NOT EXISTS dominance definition — the
    // Spark side's banded order-statistics formulation must agree
    // with the quadratic ground truth exactly
    "part_pareto" ->
      """SELECT p.p_partkey, p.p_retailprice,
        |       CAST(p.p_size AS BIGINT) AS p_size
        |FROM part p
        |WHERE NOT EXISTS (SELECT 1 FROM part q
        |  WHERE q.p_retailprice <= p.p_retailprice
        |    AND q.p_size >= p.p_size
        |    AND (q.p_retailprice < p.p_retailprice
        |         OR q.p_size > p.p_size))
        |ORDER BY p_retailprice, p_partkey""".stripMargin,
    // triplets: positives = the verified near-dup pairs (both
    // orientations); negative = arg-min md5(anchor|cand) over the
    // anchor's md5-batch mates, minus itself and its direct pairs —
    // every choice a pure function of ids, like the Spark side
    "train_triplets" ->
      s"""WITH $bandCte,
         |$verifiedPairsCte,
         |ancs AS (SELECT id1 AS anchor_id, id2 AS pos_id FROM pairs
         |         UNION ALL SELECT id2, id1 FROM pairs),
         |dbb AS (SELECT doc_id,
         |          CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
         |            AS BIGINT) % 8 AS b
         |        FROM documents),
         |negc AS (SELECT a.anchor_id, a.pos_id, d2.doc_id AS cand_id,
         |           CAST('0x' || substr(md5(CAST(a.anchor_id AS VARCHAR)
         |             || '|' || CAST(d2.doc_id AS VARCHAR)), 1, 15)
         |             AS BIGINT) AS r
         |         FROM ancs a
         |         JOIN dbb d1 ON a.anchor_id = d1.doc_id
         |         JOIN dbb d2 ON d1.b = d2.b AND d2.doc_id <> a.anchor_id
         |         WHERE NOT EXISTS (SELECT 1 FROM ancs x
         |           WHERE x.anchor_id = a.anchor_id
         |             AND x.pos_id = d2.doc_id)),
         |sel AS (SELECT anchor_id, pos_id, cand_id,
         |          row_number() OVER (PARTITION BY anchor_id, pos_id
         |                             ORDER BY r, cand_id) AS rn
         |        FROM negc)
         |SELECT anchor_id, pos_id, cand_id AS neg_id
         |FROM sel WHERE rn = 1 ORDER BY anchor_id, pos_id""".stripMargin,
    "dedup_simhash" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks,
        |             len(string_split(text, ' ')) AS nt FROM documents),
        |u AS (SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 4) AS BIGINT) AS h
        |      FROM (SELECT doc_id, unnest(toks) AS tok FROM t)),
        |v AS (SELECT doc_id, bit,
        |        sum(CASE WHEN (h // (1 << bit)) % 2 = 1 THEN 1 ELSE -1 END) AS vote
        |      FROM u CROSS JOIN (SELECT unnest(range(16)) AS bit) GROUP BY 1, 2)
        |SELECT v.doc_id AS doc_id, CAST(nt AS BIGINT) AS n_tokens,
        |       CAST(sum(CASE WHEN vote > 0 THEN 1 << bit ELSE 0 END) AS BIGINT)
        |         AS simhash16
        |FROM v JOIN t ON v.doc_id = t.doc_id GROUP BY v.doc_id, nt
        |ORDER BY doc_id""".stripMargin,
    "dedup_simhash_pairs" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |u AS (SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 4) AS BIGINT) AS h
        |      FROM (SELECT doc_id, unnest(toks) AS tok FROM t)),
        |v AS (SELECT doc_id, bit,
        |        sum(CASE WHEN (h // (1 << bit)) % 2 = 1 THEN 1 ELSE -1 END) AS vote
        |      FROM u CROSS JOIN (SELECT unnest(range(16)) AS bit) GROUP BY 1, 2),
        |sg AS (SELECT doc_id,
        |         CAST(sum(CASE WHEN vote > 0 THEN 1 << bit ELSE 0 END)
        |           AS BIGINT) AS sh
        |       FROM v GROUP BY doc_id),
        |bands AS (SELECT doc_id, sh, 0 AS band, sh % 256 AS key FROM sg
        |          UNION ALL
        |          SELECT doc_id, sh, 1, sh // 256 FROM sg),
        |cand AS (SELECT DISTINCT
        |           least(a.doc_id, b.doc_id) AS id1,
        |           greatest(a.doc_id, b.doc_id) AS id2,
        |           CASE WHEN a.doc_id < b.doc_id THEN a.sh ELSE b.sh END AS h1,
        |           CASE WHEN a.doc_id < b.doc_id THEN b.sh ELSE a.sh END AS h2
        |         FROM bands a JOIN bands b
        |           ON a.band = b.band AND a.key = b.key
        |             AND a.doc_id < b.doc_id)
        |SELECT id1, id2, CAST(bit_count(xor(h1, h2)) AS BIGINT) AS hamming
        |FROM cand WHERE bit_count(xor(h1, h2)) <= 1
        |ORDER BY id1, id2""".stripMargin,
    // cluster_id = min doc_id reachable in the undirected verified-
    // pair graph; the linear-recursive CTE extends paths one edge per
    // step and the UNION dedups, so it reaches the same fixpoint as
    // the Spark side's min-label propagation
    "dedup_clusters" ->
      s"""WITH RECURSIVE $bandCte,
         |$verifiedPairsCte,
         |$closureCte
         |SELECT id AS doc_id, min(r) AS cluster_id
         |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin,
    // canonical selection: per cluster (singletons are their own
    // cluster) keep the max-quality member, ties to the lowest
    // doc_id; NULL-text quality ranks below every real score via the
    // same coalesce(q, -1) sentinel as the Spark side
    "dedup_canonical" ->
      s"""WITH RECURSIVE $bandCte,
         |$verifiedPairsCte,
         |$closureCte,
         |lab AS (SELECT id AS doc_id, min(r) AS cluster_id
         |        FROM reach GROUP BY id),
         |mem AS (SELECT d.doc_id,
         |          coalesce(l.cluster_id, d.doc_id) AS cluster_id
         |        FROM documents d LEFT JOIN lab l ON d.doc_id = l.doc_id),
         |tq AS (SELECT doc_id, string_split(text, ' ') AS toks
         |       FROM documents),
         |qm AS (SELECT doc_id, coalesce(round((
         |          least(len(toks)/50.0, 1.0)
         |          + CASE WHEN len(list_filter(toks,
         |              t -> t IN ('the','a','and','of','to','in','is')))
         |              *1.0/len(toks) BETWEEN 0.01 AND 0.6
         |            THEN 1.0 ELSE 0.0 END
         |          + (1.0 - least((1.0 - len(list_distinct(toks))
         |              *1.0/len(toks))/0.9, 1.0))) / 3.0, 4), -1.0) AS q
         |       FROM tq),
         |rep AS (SELECT m.cluster_id, m.doc_id,
         |          row_number() OVER (PARTITION BY m.cluster_id
         |            ORDER BY qm.q DESC, m.doc_id) AS rn
         |        FROM mem m JOIN qm ON m.doc_id = qm.doc_id),
         |can AS (SELECT cluster_id, doc_id AS canonical_id
         |        FROM rep WHERE rn = 1)
         |SELECT m.doc_id, m.cluster_id, c.canonical_id,
         |       (m.doc_id = c.canonical_id) AS is_kept
         |FROM mem m JOIN can c ON m.cluster_id = c.cluster_id
         |ORDER BY m.doc_id""".stripMargin,
    // impact rollup over the same canonical chain: per-source
    // before/after doc+token accounting, exact integers + two 6dp
    // keep-rate divisions
    "dedup_impact_report" ->
      s"""WITH RECURSIVE $bandCte,
         |$verifiedPairsCte,
         |$closureCte,
         |lab AS (SELECT id AS doc_id, min(r) AS cluster_id
         |        FROM reach GROUP BY id),
         |mem AS (SELECT d.doc_id,
         |          coalesce(l.cluster_id, d.doc_id) AS cluster_id
         |        FROM documents d LEFT JOIN lab l ON d.doc_id = l.doc_id),
         |tq AS (SELECT doc_id, string_split(text, ' ') AS toks
         |       FROM documents),
         |qm AS (SELECT doc_id, coalesce(round((
         |          least(len(toks)/50.0, 1.0)
         |          + CASE WHEN len(list_filter(toks,
         |              t -> t IN ('the','a','and','of','to','in','is')))
         |              *1.0/len(toks) BETWEEN 0.01 AND 0.6
         |            THEN 1.0 ELSE 0.0 END
         |          + (1.0 - least((1.0 - len(list_distinct(toks))
         |              *1.0/len(toks))/0.9, 1.0))) / 3.0, 4), -1.0) AS q
         |       FROM tq),
         |rep AS (SELECT m.cluster_id, m.doc_id,
         |          row_number() OVER (PARTITION BY m.cluster_id
         |            ORDER BY qm.q DESC, m.doc_id) AS rn
         |        FROM mem m JOIN qm ON m.doc_id = qm.doc_id),
         |can AS (SELECT cluster_id, doc_id AS canonical_id
         |        FROM rep WHERE rn = 1),
         |kept AS (SELECT m.doc_id,
         |           (m.doc_id = c.canonical_id) AS is_kept
         |         FROM mem m JOIN can c ON m.cluster_id = c.cluster_id),
         |sz AS (SELECT d.doc_id, d.source,
         |         CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tok,
         |         k.is_kept
         |       FROM documents d JOIN kept k ON d.doc_id = k.doc_id)
         |SELECT source, CAST(count(*) AS BIGINT) AS docs_before,
         |       CAST(sum(CASE WHEN is_kept THEN 1 ELSE 0 END) AS BIGINT)
         |         AS docs_kept,
         |       CAST(sum(n_tok) AS BIGINT) AS tokens_before,
         |       CAST(sum(CASE WHEN is_kept THEN n_tok ELSE 0 END)
         |         AS BIGINT) AS tokens_kept,
         |       round(CAST(sum(CASE WHEN is_kept THEN 1 ELSE 0 END)
         |         AS DOUBLE) / count(*), 6) AS doc_keep_rate,
         |       round(CAST(sum(CASE WHEN is_kept THEN n_tok ELSE 0 END)
         |         AS DOUBLE) / sum(n_tok), 6) AS token_keep_rate
         |FROM sz GROUP BY source ORDER BY source""".stripMargin,
    // jaccard-decile histogram over the verified pair set: banding on
    // the identically-rounded 4dp jaccard (floor(j·10) runs on the
    // same double both engines), min/max per band exact
    "dedup_jaccard_hist" ->
      s"""WITH $bandCte,
         |cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
         |         FROM bk a JOIN bk b ON a.band = b.band
         |           AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
         |shx AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
         |card AS (SELECT doc_id, count(*) AS c FROM shx GROUP BY 1),
         |inter AS (SELECT x.doc_id AS id1, y.doc_id AS id2, count(*) AS n
         |          FROM shx x JOIN shx y ON x.s = y.s
         |            AND x.doc_id < y.doc_id
         |          GROUP BY 1, 2),
         |jp AS (SELECT c.id1, c.id2,
         |         round(n*1.0/(c1.c + c2.c - n), 4) AS j
         |       FROM cand c JOIN inter i ON c.id1 = i.id1 AND c.id2 = i.id2
         |       JOIN card c1 ON c.id1 = c1.doc_id
         |       JOIN card c2 ON c.id2 = c2.doc_id
         |       WHERE n*1.0/(c1.c + c2.c - n) >= 0.5),
         |bins AS (SELECT least(CAST(floor(j * 10) AS BIGINT), 9) AS b, j
         |         FROM jp)
         |SELECT b / 10.0 AS bin_lo, CAST(count(*) AS BIGINT) AS n_pairs,
         |       min(j) AS min_j, max(j) AS max_j
         |FROM bins GROUP BY 1 ORDER BY bin_lo""".stripMargin,
    // LSH S-curve: measured capture per jaccard decile + the
    // multiplication-only theoretical 1-(1-s^3)^4 at decile midpoints
    "dedup_lsh_scurve" ->
      s"""WITH $bandCte,
         |shx AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
         |card AS (SELECT doc_id, count(*) AS c FROM shx GROUP BY 1),
         |inter AS (SELECT x.doc_id AS id1, y.doc_id AS id2,
         |            count(*) AS n
         |          FROM shx x JOIN shx y ON x.s = y.s
         |            AND x.doc_id < y.doc_id
         |          GROUP BY 1, 2),
         |jp AS (SELECT i.id1, i.id2,
         |         least(CAST(floor((n*1.0/(c1.c + c2.c - n)) * 10)
         |           AS BIGINT), 9) AS b
         |       FROM inter i
         |       JOIN card c1 ON i.id1 = c1.doc_id
         |       JOIN card c2 ON i.id2 = c2.doc_id),
         |cd AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
         |       FROM bk a JOIN bk b ON a.band = b.band
         |         AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
         |fl AS (SELECT jp.b,
         |        CASE WHEN cd.id1 IS NOT NULL THEN 1 ELSE 0 END AS hit
         |       FROM jp LEFT JOIN cd
         |         ON jp.id1 = cd.id1 AND jp.id2 = cd.id2),
         |g AS (SELECT b, CAST(count(*) AS BIGINT) AS n_true,
         |        CAST(sum(hit) AS BIGINT) AS n_hit
         |      FROM fl GROUP BY 1),
         |t0 AS (SELECT *, (b * 2 + 1) / 20.0 AS sm FROM g),
         |t1 AS (SELECT *, 1.0 - sm * sm * sm AS u FROM t0)
         |SELECT b AS decile, n_true, n_hit,
         |  round(n_hit * 1.0 / n_true, 4) AS capture_rate,
         |  round(1.0 - (u * u) * (u * u), 4) AS theory_rate
         |FROM t1 ORDER BY decile""".stripMargin,
    // band-recall audit: TRUE pairs from the shingle-intersection
    // join at the exact jaccard bar, candidates from the band
    // buckets; one summary row of exact counts
    "dedup_band_recall" ->
      s"""WITH $bandCte,
         |shx AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
         |card AS (SELECT doc_id, count(*) AS c FROM shx GROUP BY 1),
         |inter AS (SELECT x.doc_id AS id1, y.doc_id AS id2,
         |            count(*) AS n
         |          FROM shx x JOIN shx y ON x.s = y.s
         |            AND x.doc_id < y.doc_id
         |          GROUP BY 1, 2),
         |tp AS (SELECT i.id1, i.id2 FROM inter i
         |       JOIN card c1 ON i.id1 = c1.doc_id
         |       JOIN card c2 ON i.id2 = c2.doc_id
         |       WHERE n*1.0/(c1.c + c2.c - n) >= 0.5),
         |cd AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
         |       FROM bk a JOIN bk b ON a.band = b.band
         |         AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
         |h AS (SELECT tp.id1 FROM tp
         |      JOIN cd ON tp.id1 = cd.id1 AND tp.id2 = cd.id2)
         |SELECT CAST((SELECT count(*) FROM tp) AS BIGINT) AS n_true,
         |       CAST((SELECT count(*) FROM cd) AS BIGINT) AS n_cand,
         |       CAST((SELECT count(*) FROM h) AS BIGINT) AS n_hit,
         |       round((SELECT count(*) FROM h) * 1.0
         |         / (SELECT count(*) FROM tp), 4) AS recall""".stripMargin,
    // Heaps-law vocabulary growth: docs cut into rank deciles, each
    // word charged to its FIRST doc's decile, cumulative vocabulary
    "corpus_vocab_growth" ->
      """WITH d AS (SELECT doc_id, text FROM documents),
        |nr AS (SELECT count(*) AS n FROM d),
        |rk AS (SELECT doc_id, row_number() OVER (ORDER BY doc_id) AS rn
        |       FROM d),
        |bkt AS (SELECT doc_id, ((rn - 1) * 10) // n + 1 AS bucket
        |        FROM rk CROSS JOIN nr),
        |fw AS (SELECT tok, min(doc_id) AS doc_id FROM
        |         (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |          FROM d)
        |       GROUP BY 1),
        |pb AS (SELECT b.bucket, CAST(count(*) AS BIGINT) AS new_words
        |       FROM fw JOIN bkt b ON fw.doc_id = b.doc_id GROUP BY 1),
        |db AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs
        |       FROM bkt GROUP BY 1)
        |SELECT db.bucket, db.n_docs,
        |       coalesce(pb.new_words, 0) AS new_words,
        |       CAST(sum(db.n_docs) OVER (ORDER BY db.bucket) AS BIGINT)
        |         AS n_docs_cum,
        |       CAST(sum(coalesce(pb.new_words, 0))
        |         OVER (ORDER BY db.bucket) AS BIGINT) AS vocab_cum
        |FROM db LEFT JOIN pb USING (bucket) ORDER BY bucket""".stripMargin,
    // cross-source near-dup overlap: verified pairs joined to each
    // side's source, counted per unordered source pair
    "dedup_source_overlap" ->
      s"""WITH $bandCte,
         |$verifiedPairsCte,
         |ds AS (SELECT doc_id, source FROM documents)
         |SELECT least(a.source, b.source) AS source_a,
         |       greatest(a.source, b.source) AS source_b,
         |       CAST(count(*) AS BIGINT) AS n_pairs
         |FROM pairs p JOIN ds a ON p.id1 = a.doc_id
         |     JOIN ds b ON p.id2 = b.doc_id
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // cluster-size histogram — the "how much duplicate mass" number:
    // components → per-cluster member counts → count-of-counts
    "dedup_cluster_sizes" ->
      s"""WITH RECURSIVE $bandCte,
         |$verifiedPairsCte,
         |$closureCte,
         |lab AS (SELECT id AS doc_id, min(r) AS cluster_id
         |        FROM reach GROUP BY id),
         |cs AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS sz
         |       FROM lab GROUP BY 1)
         |SELECT sz AS cluster_size,
         |       CAST(count(*) AS BIGINT) AS n_clusters,
         |       CAST(sum(sz) AS BIGINT) AS n_docs,
         |       CAST(sum(sz - 1) AS BIGINT) AS n_removable
         |FROM cs GROUP BY 1 ORDER BY cluster_size""".stripMargin,
    // passage-level substring dedup: positional 3-grams, cross-doc
    // duplicated iff min(doc)≠max(doc) per gram, consecutive
    // positions island-merged (pos − row_number) into maximal spans
    "dedup_substring" ->
      """WITH corpus AS (SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000, text FROM documents WHERE doc_id % 10 = 0),
        |st AS (SELECT doc_id, string_split(text, ' ') AS toks FROM corpus),
        |g AS (SELECT doc_id, pos,
        |        toks[pos+1] || ' ' || toks[pos+2] || ' ' || toks[pos+3] AS s
        |      FROM st CROSS JOIN (SELECT unnest(range(128)) AS pos)
        |      WHERE pos <= len(toks) - 3),
        |d AS (SELECT s FROM g GROUP BY s HAVING min(doc_id) <> max(doc_id)),
        |p AS (SELECT doc_id, pos,
        |        row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS rn
        |      FROM g WHERE s IN (SELECT s FROM d)),
        |isl AS (SELECT doc_id, pos - rn AS grp, min(pos) AS a, max(pos) AS b
        |        FROM p GROUP BY 1, 2)
        |SELECT doc_id, CAST(a AS BIGINT) AS span_start,
        |       CAST(b + 2 AS BIGINT) AS span_end,
        |       CAST(b - a + 3 AS BIGINT) AS span_tokens
        |FROM isl WHERE b - a + 3 >= 8
        |ORDER BY doc_id, span_start""".stripMargin,
    "dedup_simhash60_pairs" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |u AS (SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS h
        |      FROM (SELECT doc_id, unnest(toks) AS tok FROM t)),
        |v AS (SELECT doc_id, bit,
        |        sum(CASE WHEN (h // (1::BIGINT << bit)) % 2 = 1
        |              THEN 1 ELSE -1 END) AS vote
        |      FROM u CROSS JOIN (SELECT unnest(range(60)) AS bit) GROUP BY 1, 2),
        |sg AS (SELECT doc_id,
        |         CAST(sum(CASE WHEN vote > 0 THEN (1::BIGINT << bit) ELSE 0 END)
        |           AS BIGINT) AS sh
        |       FROM v GROUP BY doc_id),
        |bands AS (SELECT doc_id, sh, band,
        |            (sh // (1::BIGINT << (band * 10))) % 1024 AS key
        |          FROM sg CROSS JOIN (SELECT unnest(range(6)) AS band) b(band)),
        |cand AS (SELECT DISTINCT
        |           least(a.doc_id, b.doc_id) AS id1,
        |           greatest(a.doc_id, b.doc_id) AS id2,
        |           CASE WHEN a.doc_id < b.doc_id THEN a.sh ELSE b.sh END AS h1,
        |           CASE WHEN a.doc_id < b.doc_id THEN b.sh ELSE a.sh END AS h2
        |         FROM bands a JOIN bands b
        |           ON a.band = b.band AND a.key = b.key
        |             AND a.doc_id < b.doc_id)
        |SELECT id1, id2, CAST(bit_count(xor(h1, h2)) AS BIGINT) AS hamming
        |FROM cand WHERE bit_count(xor(h1, h2)) <= 5
        |ORDER BY id1, id2""".stripMargin,
    "dedup_ngram_jaccard" ->
      s"""WITH $shingleCte,
         |blk AS (SELECT doc_id, shingles,
         |          md5(CAST(list_min(list_transform(shingles,
         |                s -> CAST('0x' || substr(md5('b0|' || s), 1, 15)
         |                       AS BIGINT))) AS VARCHAR)
         |            || '|' ||
         |            CAST(list_min(list_transform(shingles,
         |                s -> CAST('0x' || substr(md5('b1|' || s), 1, 15)
         |                       AS BIGINT))) AS VARCHAR)) AS block
         |        FROM sh),
         |cand AS (SELECT a.doc_id AS id1, b.doc_id AS id2
         |         FROM blk a JOIN blk b ON a.block = b.block
         |           AND a.doc_id < b.doc_id),
         |$jaccardVerify""".stripMargin,
    // mirrors Ann.hyperplanes exactly: component (t,p,d) =
    // (first-4-md5-bytes-as-int & 0x7fffffff)/Int.MaxValue*2-1, and
    // list_inner_product's strict left-to-right summation matches
    // VecDot (same reason the knn oracles hash-match)
    "dedup_embedding_cos" ->
      """WITH hpw AS (
        |  SELECT t, p, d,
        |    ((CAST('0x' || substr(md5(CAST(t AS VARCHAR) || '|' ||
        |        CAST(p AS VARCHAR) || '|' || CAST(d AS VARCHAR)), 1, 8)
        |        AS BIGINT) & 2147483647) / 2147483647.0 * 2.0 - 1.0) AS w
        |  FROM range(4) r1(t) CROSS JOIN range(4) r2(p)
        |       CROSS JOIN range(64) r3(d)),
        |hp AS (SELECT t, p, list(w ORDER BY d) AS wv FROM hpw GROUP BY t, p),
        |dots AS (SELECT e.vec_id, hp.t, hp.p,
        |           list_inner_product(e.embedding::DOUBLE[], hp.wv) AS dp
        |         FROM embeddings e CROSS JOIN hp),
        |sg AS (SELECT vec_id, t,
        |         sum(CASE WHEN dp > 0 THEN 1 << p ELSE 0 END) AS sig
        |       FROM dots GROUP BY 1, 2),
        |cand AS (SELECT DISTINCT a.vec_id AS id1, b.vec_id AS id2
        |         FROM sg a JOIN sg b
        |           ON a.t = b.t AND a.sig = b.sig AND a.vec_id < b.vec_id)
        |SELECT c.id1 AS id1, c.id2 AS id2,
        |       round(list_cosine_similarity(x.embedding::DOUBLE[],
        |                                    y.embedding::DOUBLE[]), 4) AS cosine
        |FROM cand c JOIN embeddings x ON c.id1 = x.vec_id
        |JOIN embeddings y ON c.id2 = y.vec_id
        |WHERE list_cosine_similarity(x.embedding::DOUBLE[],
        |                             y.embedding::DOUBLE[]) >= 0.35
        |ORDER BY id1, id2""".stripMargin,
    // cosine-threshold sweep: the shipped pairs' ROUNDED cosines
    // gridded cumulative-from-above, zero-anchored literal grid
    "dedup_cos_sweep" ->
      """WITH hpw AS (
        |  SELECT t, p, d,
        |    ((CAST('0x' || substr(md5(CAST(t AS VARCHAR) || '|' ||
        |        CAST(p AS VARCHAR) || '|' || CAST(d AS VARCHAR)), 1, 8)
        |        AS BIGINT) & 2147483647) / 2147483647.0 * 2.0 - 1.0) AS w
        |  FROM range(4) r1(t) CROSS JOIN range(4) r2(p)
        |       CROSS JOIN range(64) r3(d)),
        |hp AS (SELECT t, p, list(w ORDER BY d) AS wv FROM hpw GROUP BY t, p),
        |dots AS (SELECT e.vec_id, hp.t, hp.p,
        |           list_inner_product(e.embedding::DOUBLE[], hp.wv) AS dp
        |         FROM embeddings e CROSS JOIN hp),
        |sg AS (SELECT vec_id, t,
        |         sum(CASE WHEN dp > 0 THEN 1 << p ELSE 0 END) AS sig
        |       FROM dots GROUP BY 1, 2),
        |cand AS (SELECT DISTINCT a.vec_id AS id1, b.vec_id AS id2
        |         FROM sg a JOIN sg b
        |           ON a.t = b.t AND a.sig = b.sig AND a.vec_id < b.vec_id),
        |pr AS (SELECT round(list_cosine_similarity(x.embedding::DOUBLE[],
        |                 y.embedding::DOUBLE[]), 4) AS cosine
        |       FROM cand c JOIN embeddings x ON c.id1 = x.vec_id
        |       JOIN embeddings y ON c.id2 = y.vec_id
        |       WHERE list_cosine_similarity(x.embedding::DOUBLE[],
        |                                    y.embedding::DOUBLE[]) >= 0.35),
        |grd AS (SELECT CAST(threshold AS DOUBLE) AS threshold
        |        FROM (VALUES (0.35), (0.5), (0.65), (0.8), (0.95))
        |          g(threshold)),
        |cnt AS (SELECT grd.threshold, CAST(count(*) AS BIGINT) AS n_pairs
        |        FROM pr JOIN grd ON pr.cosine >= grd.threshold
        |        GROUP BY 1)
        |SELECT grd.threshold,
        |       CAST(coalesce(cnt.n_pairs, 0) AS BIGINT) AS n_pairs
        |FROM grd LEFT JOIN cnt USING (threshold)
        |ORDER BY threshold""".stripMargin,
    // semantic decontam: cross-split LSH bucket mates -> exact cosine
    // -> per-eval argmax by (cosine DESC, train_id) — the mirror's
    // row_number replays the max_by(struct(c, -train_id)) ordering
    "decontam_semantic" ->
      """WITH hpw AS (
        |  SELECT t, p, d,
        |    ((CAST('0x' || substr(md5(CAST(t AS VARCHAR) || '|' ||
        |        CAST(p AS VARCHAR) || '|' || CAST(d AS VARCHAR)), 1, 8)
        |        AS BIGINT) & 2147483647) / 2147483647.0 * 2.0 - 1.0) AS w
        |  FROM range(4) r1(t) CROSS JOIN range(4) r2(p)
        |       CROSS JOIN range(64) r3(d)),
        |hp AS (SELECT t, p, list(w ORDER BY d) AS wv FROM hpw GROUP BY t, p),
        |sp AS (SELECT vec_id,
        |         CASE WHEN substr(md5(CAST(vec_id AS VARCHAR)), 1, 4)
        |                   < 'cccd'
        |              THEN 'train' ELSE 'eval' END AS split
        |       FROM embeddings),
        |dots AS (SELECT e.vec_id, hp.t, hp.p,
        |           list_inner_product(e.embedding::DOUBLE[], hp.wv) AS dp
        |         FROM embeddings e CROSS JOIN hp),
        |sg AS (SELECT vec_id, t,
        |         sum(CASE WHEN dp > 0 THEN 1 << p ELSE 0 END) AS sig
        |       FROM dots GROUP BY 1, 2),
        |cand AS (SELECT DISTINCT q.vec_id AS eval_id, t2.vec_id AS train_id
        |         FROM sg q JOIN sg t2 ON q.t = t2.t AND q.sig = t2.sig
        |         JOIN sp sq ON q.vec_id = sq.vec_id
        |         JOIN sp st ON t2.vec_id = st.vec_id
        |         WHERE sq.split = 'eval' AND st.split = 'train'),
        |scored AS (SELECT c.eval_id, c.train_id,
        |             list_cosine_similarity(x.embedding::DOUBLE[],
        |                                    y.embedding::DOUBLE[]) AS cs
        |           FROM cand c JOIN embeddings x ON c.eval_id = x.vec_id
        |           JOIN embeddings y ON c.train_id = y.vec_id
        |           WHERE list_cosine_similarity(x.embedding::DOUBLE[],
        |                                        y.embedding::DOUBLE[])
        |                   >= 0.35),
        |r AS (SELECT *, row_number() OVER (PARTITION BY eval_id
        |        ORDER BY cs DESC, train_id) AS rk
        |      FROM scored)
        |SELECT eval_id, train_id, round(cs, 4) AS cosine
        |FROM r WHERE rk = 1 ORDER BY eval_id""".stripMargin,
    "sim_brute_topk" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
        |           FROM embeddings WHERE vec_id % 50 = 0),
        |d AS (SELECT q.qid, e.vec_id AS nn_id,
        |             list_cosine_similarity(e.embedding::DOUBLE[], q.qv) AS s
        |      FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.qid),
        |r AS (SELECT qid, nn_id, s,
        |             row_number() OVER (PARTITION BY qid ORDER BY s DESC, nn_id)
        |               AS rk
        |      FROM d)
        |SELECT qid, rk, nn_id, round(s, 4) AS score
        |FROM r WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,
    "text_langid" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |sc AS (SELECT doc_id,
        |  len(list_filter(toks, t -> t IN ('the','a','and','of','to','in','is')))
        |    *1.0/len(toks) AS en_score,
        |  len(list_filter(toks, t -> t IN ('der','die','das','und','ist','ein')))
        |    *1.0/len(toks) AS de_score,
        |  len(list_filter(toks, t -> t IN ('le','la','les','et','est','un')))
        |    *1.0/len(toks) AS fr_score
        |  FROM t)
        |SELECT doc_id, round(en_score, 4) AS en_score,
        |       round(de_score, 4) AS de_score, round(fr_score, 4) AS fr_score,
        |       list_sort([{'ns': -en_score, 'l': 'en'},
        |                  {'ns': -de_score, 'l': 'de'},
        |                  {'ns': -fr_score, 'l': 'fr'}])[1].l AS predicted
        |FROM sc ORDER BY doc_id""".stripMargin,
    // language-ID confusion matrix: the langid mirror's argmax
    // grouped against the ground-truth lang column
    "langid_confusion" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM documents),
        |sc AS (SELECT doc_id,
        |  len(list_filter(toks, t -> t IN ('the','a','and','of','to','in','is')))
        |    *1.0/len(toks) AS en_score,
        |  len(list_filter(toks, t -> t IN ('der','die','das','und','ist','ein')))
        |    *1.0/len(toks) AS de_score,
        |  len(list_filter(toks, t -> t IN ('le','la','les','et','est','un')))
        |    *1.0/len(toks) AS fr_score
        |  FROM t),
        |p AS (SELECT doc_id,
        |        list_sort([{'ns': -en_score, 'l': 'en'},
        |                   {'ns': -de_score, 'l': 'de'},
        |                   {'ns': -fr_score, 'l': 'fr'}])[1].l AS predicted
        |      FROM sc),
        |cm AS (SELECT d.lang AS actual, p.predicted,
        |         CAST(count(*) AS BIGINT) AS n
        |       FROM documents d JOIN p ON d.doc_id = p.doc_id
        |       GROUP BY 1, 2),
        |tot AS (SELECT actual, CAST(sum(n) AS BIGINT) AS n_actual
        |        FROM cm GROUP BY 1)
        |SELECT cm.actual, cm.predicted, cm.n,
        |       round(cm.n * 1.0 / tot.n_actual, 4) AS share
        |FROM cm JOIN tot ON cm.actual = tot.actual
        |ORDER BY cm.actual, cm.predicted""".stripMargin,
    // exact global deciles of the quality score; mirror assigns
    // decile by the same all-integer (rank-1)*10 div N formula over
    // the identical (score 4dp, doc_id) total order
    // budget-constrained selection: (quality DESC, doc_id) prefix
    // while the running token sum fits; the Spark side's banded
    // two-level rank+cumsum reproduces exactly this total order
    "corpus_budget_select" ->
      """WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks
        |           FROM documents),
        |m AS (SELECT doc_id, len(toks) AS n_tokens,
        |        len(list_filter(toks,
        |          t -> t IN ('the','a','and','of','to','in','is')))
        |          *1.0/len(toks) AS sw,
        |        1.0 - len(list_distinct(toks))*1.0/len(toks) AS rep
        |      FROM t),
        |q AS (SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        |        round((least(n_tokens/50.0, 1.0)
        |          + CASE WHEN sw BETWEEN 0.01 AND 0.6 THEN 1.0 ELSE 0.0 END
        |          + (1.0 - least(rep/0.9, 1.0))) / 3.0, 4) AS quality_score
        |      FROM m),
        |r AS (SELECT doc_id, quality_score, n_tokens,
        |        row_number() OVER (ORDER BY quality_score DESC, doc_id)
        |          AS rnk,
        |        sum(n_tokens) OVER (ORDER BY quality_score DESC, doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |          AS cum_tokens
        |      FROM q WHERE quality_score IS NOT NULL)
        |SELECT CAST(rnk AS BIGINT) AS rnk, doc_id, quality_score,
        |       n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
        |FROM r WHERE cum_tokens <= 10000 ORDER BY rnk""".stripMargin,
    // one-row embedding norm audit in integer micro-units
    // per-dimension variance from exact micro moments; dead flag
    // compares identical doubles at 1e-6
    "embed_dim_variance" ->
      """WITH ex AS (SELECT j.j AS dim,
        |        CAST(round(e.embedding[j.j + 1] * 10000) AS BIGINT)
        |          AS m
        |      FROM (SELECT embedding::DOUBLE[] AS embedding
        |            FROM embeddings) e
        |      CROSS JOIN (SELECT unnest(range(64)) AS j) j),
        |g AS (SELECT dim, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(m) AS BIGINT) AS sx,
        |        CAST(sum(m * m) AS BIGINT) AS qx
        |      FROM ex GROUP BY 1)
        |SELECT CAST(dim AS BIGINT) AS dim,
        |  round(CAST(sx AS DOUBLE) / n / CAST(10000.0 AS DOUBLE), 4)
        |    AS mean,
        |  round(CAST(n * qx - sx * sx AS DOUBLE)
        |    / CAST(n * (n - 1) AS DOUBLE)
        |    / CAST(100000000.0 AS DOUBLE), 6) AS variance,
        |  CAST(n * qx - sx * sx AS DOUBLE)
        |    / CAST(n * (n - 1) AS DOUBLE)
        |    / CAST(100000000.0 AS DOUBLE) < 1e-6 AS is_dead
        |FROM g ORDER BY dim""".stripMargin,
    "embed_norm_audit" ->
      """WITH e AS (SELECT embedding::DOUBLE[] AS v FROM embeddings),
        |m AS (SELECT CAST(round(sqrt(list_inner_product(v, v)) * 10000)
        |        AS BIGINT) AS m FROM e)
        |SELECT CAST(count(*) AS BIGINT) AS n_vecs,
        |       round(min(m) * 1.0 / 10000.0, 4) AS min_norm,
        |       round(max(m) * 1.0 / 10000.0, 4) AS max_norm,
        |       round(sum(m) * 1.0 / count(*) / 10000.0, 6) AS avg_norm,
        |       CAST(sum(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_zero
        |FROM m""".stripMargin,
    "quality_deciles" ->
      """WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks
        |           FROM documents),
        |m AS (SELECT doc_id, len(toks) AS n_tokens,
        |        len(list_filter(toks,
        |          t -> t IN ('the','a','and','of','to','in','is')))
        |          *1.0/len(toks) AS sw,
        |        1.0 - len(list_distinct(toks))*1.0/len(toks) AS rep
        |      FROM t),
        |q AS (SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        |        round((least(n_tokens/50.0, 1.0)
        |          + CASE WHEN sw BETWEEN 0.01 AND 0.6 THEN 1.0 ELSE 0.0 END
        |          + (1.0 - least(rep/0.9, 1.0))) / 3.0, 4) AS quality_score
        |      FROM m),
        |r AS (SELECT doc_id, quality_score, n_tokens,
        |        row_number() OVER (ORDER BY quality_score, doc_id) AS rnk,
        |        count(*) OVER () AS n
        |      FROM q WHERE quality_score IS NOT NULL)
        |SELECT CAST(((rnk - 1) * 10) // n AS BIGINT) + 1 AS decile,
        |       CAST(count(*) AS BIGINT) AS n_docs,
        |       min(quality_score) AS min_score,
        |       max(quality_score) AS max_score,
        |       round(avg(n_tokens), 4) AS avg_tokens
        |FROM r GROUP BY 1 ORDER BY decile""".stripMargin,
    "text_quality" ->
      """WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks
        |           FROM documents),
        |m AS (SELECT doc_id, length(text) AS n_chars, len(toks) AS n_tokens,
        |        len(list_distinct(toks)) AS n_distinct,
        |        len(list_filter(toks,
        |          t -> t IN ('the','a','and','of','to','in','is')))
        |          *1.0/len(toks) AS sw,
        |        1.0 - len(list_distinct(toks))*1.0/len(toks) AS rep
        |      FROM t)
        |SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
        |       CAST(n_tokens AS BIGINT) AS n_tokens,
        |       CAST(n_distinct AS BIGINT) AS n_distinct,
        |       round((n_chars - (n_tokens - 1))*1.0/n_tokens, 4)
        |         AS avg_token_len,
        |       round(sw, 4) AS stopword_ratio,
        |       round(rep, 4) AS repetition_ratio,
        |       round((least(n_tokens/50.0, 1.0)
        |         + CASE WHEN sw BETWEEN 0.01 AND 0.6 THEN 1.0 ELSE 0.0 END
        |         + (1.0 - least(rep/0.9, 1.0))) / 3.0, 4) AS quality_score
        |FROM m ORDER BY doc_id""".stripMargin,
    "text_tokens" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))
        |    AS BIGINT) AS bpe_tokens,
        |  round(length(text)*1.0
        |    / len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')), 4)
        |    AS chars_per_token
        |FROM documents ORDER BY doc_id""".stripMargin,
    // quantile_cont ≡ Spark's exact `percentile` (both linear
    // interpolation at index p·(n−1))
    "corpus_stats" ->
      """WITH d AS (SELECT lang, len(string_split(text, ' ')) AS n_toks,
        |                  n_chars
        |           FROM documents)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(n_toks) AS BIGINT) AS total_tokens,
        |       round(avg(n_toks), 4) AS avg_tokens,
        |       round(quantile_cont(n_toks, 0.5), 4) AS p50_tokens,
        |       round(quantile_cont(n_toks, 0.95), 4) AS p95_tokens,
        |       round(avg(n_chars), 4) AS avg_chars
        |FROM d GROUP BY lang ORDER BY lang""".stripMargin,
    // thresholds are hexThreshold(rate) literals: 0.25→'4000',
    // 0.75→'c000', 0.8→'cccd', 0.9→'e666'; fixed-width lowercase hex
    // compares lexicographically ≡ numerically on both engines
    // export sharding: the two-level distributed prefix sum collapses
    // to ONE global window in the mirror because the global order is
    // bucket-major — (bk, h, doc_id) — by construction; all-integer
    // arithmetic, so offsets and shard ids match bit-for-bit
    "export_shards" ->
      """WITH t AS (SELECT doc_id,
        |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
        |               AS BIGINT) AS h
        |           FROM documents),
        |b AS (SELECT *, h % 64 AS bk FROM t),
        |c AS (SELECT doc_id, n_tok,
        |             CAST(sum(n_tok) OVER (ORDER BY bk, h, doc_id)
        |               AS BIGINT) AS cum
        |      FROM b)
        |SELECT doc_id, n_tok, cum - n_tok AS start_tok,
        |       (cum - n_tok) // 2000 AS shard
        |FROM c ORDER BY start_tok, doc_id""".stripMargin,
    // manifest over the same shard chain: order-sensitive md5 via
    // string_agg(... ORDER BY start_tok, doc_id) ≡ Spark's sorted
    // collect_list concat — same string, same hash
    "export_shard_manifest" ->
      """WITH t AS (SELECT doc_id,
        |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
        |               AS BIGINT) AS h
        |           FROM documents),
        |b AS (SELECT *, h % 64 AS bk FROM t),
        |c AS (SELECT doc_id, n_tok,
        |             CAST(sum(n_tok) OVER (ORDER BY bk, h, doc_id)
        |               AS BIGINT) AS cum
        |      FROM b),
        |sh AS (SELECT doc_id, n_tok, cum - n_tok AS start_tok,
        |         (cum - n_tok) // 2000 AS shard
        |       FROM c)
        |SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
        |       min(doc_id) AS min_doc, max(doc_id) AS max_doc,
        |       md5(string_agg(CAST(doc_id AS VARCHAR), '|'
        |         ORDER BY start_tok, doc_id)) AS fingerprint
        |FROM sh GROUP BY shard ORDER BY shard""".stripMargin,
    // hash-coin hygiene: 64-bucket chi2 vs uniform with empty
    // buckets anchored; x64-scaled integer numerator
    "hash_uniformity_audit" ->
      """WITH c AS (SELECT CAST('0x' || substr(md5(CAST(doc_id
        |             AS VARCHAR)), 1, 15) AS BIGINT) % 64 AS bucket
        |           FROM documents),
        |oc AS (SELECT bucket, CAST(count(*) AS BIGINT) AS o
        |       FROM c GROUP BY 1),
        |g AS (SELECT u.b AS bucket, coalesce(oc.o, 0) AS o
        |      FROM (SELECT unnest(range(0, 64)) AS b) u
        |      LEFT JOIN oc ON u.b = oc.bucket),
        |t AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM g)
        |SELECT t.n AS n_docs, CAST(count(*) AS BIGINT) AS n_buckets,
        |       CAST(min(g.o) AS BIGINT) AS min_bucket,
        |       CAST(max(g.o) AS BIGINT) AS max_bucket,
        |       round(CAST(sum(CAST(g.o * 64 - t.n AS HUGEINT)
        |           * CAST(g.o * 64 - t.n AS HUGEINT)) AS DOUBLE)
        |         / CAST(t.n * 64 AS DOUBLE), 4) AS chi2
        |FROM g CROSS JOIN t GROUP BY t.n""".stripMargin,
    "corpus_sample_split" ->
      """WITH b AS (SELECT doc_id, lang, source,
        |                  substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS bucket
        |           FROM documents),
        |s AS (SELECT * FROM b
        |      WHERE bucket < CASE WHEN lang = 'en' THEN '4000'
        |                          ELSE 'c000' END)
        |SELECT doc_id, lang, source,
        |       CASE WHEN bucket < 'cccd' THEN 'train'
        |            WHEN bucket < 'e666' THEN 'val'
        |            ELSE 'test' END AS split
        |FROM s ORDER BY doc_id""".stripMargin,
    // deterministic reservoir: k smallest md5-hashes per stratum;
    // the hash is reduced mod 2^50 (exact in the heap's double key)
    // and ties break on doc_id — the rank window here is the MIRROR
    // of the bounded TopKAgg heap, not the plan
    "corpus_reservoir" ->
      """WITH h AS (SELECT lang, doc_id,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) % 1125899906842624 AS h50
        |  FROM documents),
        |r AS (SELECT lang, doc_id, h50,
        |        row_number() OVER (PARTITION BY lang
        |          ORDER BY h50, doc_id) AS rk
        |      FROM h)
        |SELECT lang, CAST(rk AS BIGINT) AS rk, doc_id, h50
        |FROM r WHERE rk <= 25 ORDER BY lang, rk""".stripMargin,
    // DSIR importance resampling: md5-bucketed token distributions,
    // add-1 smoothing, per-bucket micro-nat scores as exact BIGINTs,
    // doc weight = exact integer sum → bit-stable top-K cut
    "dsir_select" ->
      """WITH tb AS (SELECT doc_id, lang,
        |    CAST('0x' || substr(md5(tok), 1, 4) AS BIGINT) % 64 AS b
        |  FROM (SELECT doc_id, lang,
        |          unnest(string_split(text, ' ')) AS tok
        |        FROM documents)),
        |cp AS (SELECT b, CAST(count(*) AS BIGINT) AS cp FROM tb
        |       WHERE lang = 'en' GROUP BY b),
        |cq AS (SELECT b, CAST(count(*) AS BIGINT) AS cq FROM tb
        |       WHERE lang <> 'en' GROUP BY b),
        |bb AS (SELECT CAST(range AS BIGINT) AS b FROM range(64)),
        |m AS (SELECT bb.b, coalesce(cp.cp, 0) AS cp,
        |        coalesce(cq.cq, 0) AS cq
        |      FROM bb LEFT JOIN cp ON bb.b = cp.b
        |        LEFT JOIN cq ON bb.b = cq.b),
        |t AS (SELECT CAST(sum(cp) AS BIGINT) AS tp,
        |        CAST(sum(cq) AS BIGINT) AS tq FROM m),
        |sc AS (SELECT m.b,
        |        CAST(round((ln((m.cp + 1) * (t.tq + 64)) -
        |          ln((m.cq + 1) * (t.tp + 64))) * 1000000) AS BIGINT)
        |          AS sb
        |       FROM m, t),
        |dw AS (SELECT tb.doc_id, tb.lang,
        |        CAST(count(*) AS BIGINT) AS n_tokens,
        |        CAST(sum(sc.sb) AS BIGINT) AS lw
        |       FROM tb JOIN sc ON tb.b = sc.b WHERE tb.lang <> 'en'
        |       GROUP BY 1, 2)
        |SELECT doc_id, lang, n_tokens,
        |  round(lw / 1000000.0, 4) AS log_weight
        |FROM dw ORDER BY lw DESC, doc_id LIMIT 50""".stripMargin,
    // Poisson PPS sample (Sampling.weightedSample): p = min(1,
    // 150·w/W) with W an exact integer sum; u = md5-60-bit/2^60 —
    // +,·,/ only, so the keep decision replays bit-for-bit
    "corpus_weighted_sample" ->
      """WITH w AS (SELECT CAST(sum(n_chars) AS BIGINT) AS tw FROM documents),
        |c AS (SELECT doc_id, lang, n_chars,
        |        least(CAST(1.0 AS DOUBLE),
        |          (CAST(150.0 AS DOUBLE) * CAST(n_chars AS DOUBLE))
        |            / CAST(w.tw AS DOUBLE)) AS pfull,
        |        CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
        |               AS BIGINT) AS DOUBLE)
        |          / CAST(1152921504606846976 AS DOUBLE) AS u
        |      FROM documents, w)
        |SELECT doc_id, lang, n_chars, round(pfull, 6) AS p
        |FROM c WHERE u < pfull ORDER BY doc_id""".stripMargin,
    // KMV sketch (Sketch.kmvDistinct, k=64): distinct 60-bit hashes,
    // k-th smallest per group, estimate (k-1)·2^60/kth — exact below
    // k. The sketch state is engine-side only; the estimate is a pure
    // function of the data, which is what the oracle mirrors.
    "sketch_kmv_distinct" ->
      """WITH h AS (SELECT DISTINCT event_type,
        |    CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) AS h
        |  FROM events),
        |r AS (SELECT event_type, h,
        |             row_number() OVER (PARTITION BY event_type ORDER BY h)
        |               AS rn
        |      FROM h),
        |s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS nd,
        |             max(CASE WHEN rn = 64 THEN h END) AS kth
        |      FROM r GROUP BY event_type)
        |SELECT event_type, least(nd, 64) AS n_seen,
        |       CASE WHEN nd < 64 THEN round(CAST(nd AS DOUBLE), 4)
        |            ELSE round((CAST(63.0 AS DOUBLE)
        |                          * CAST(1152921504606846976 AS DOUBLE))
        |                       / CAST(kth AS DOUBLE), 4) END AS est_distinct
        |FROM s ORDER BY event_type""".stripMargin,
    // HLL sketch (Sketch.hllDistinct, m=64): registers defined from
    // the same md5-prefix60 hash (bucket = top 6 bits, ρ = leading
    // zeros of the remaining 54 + 1 via bin()), indicator sum kept in
    // scaled integers (Σ 2^(55−r)), so the estimate is bit-exact in
    // both engines; ln only in the small-range branch, 4dp-rounded
    "sketch_hll_distinct" ->
      """WITH h AS (SELECT event_type,
        |    CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) AS h
        |  FROM events),
        |b AS (SELECT event_type, h >> 54 AS bucket,
        |             h & 18014398509481983 AS rest FROM h),
        |r AS (SELECT event_type, bucket,
        |        CAST(max(CASE WHEN rest = 0 THEN 55
        |                 ELSE 55 - length(bin(rest)) END) AS BIGINT) AS r
        |      FROM b GROUP BY 1, 2),
        |a AS (SELECT event_type,
        |        CAST(sum(1::BIGINT << CAST(55 - r AS INT)) AS BIGINT) AS sp,
        |        CAST(count(*) AS BIGINT) AS nb
        |      FROM r GROUP BY 1),
        |e AS (SELECT event_type, CAST(64 - nb AS BIGINT) AS v_zero,
        |        (CAST(0.709 AS DOUBLE) * CAST(4096 AS DOUBLE)
        |           * CAST(36028797018963968 AS DOUBLE))
        |          / CAST(sp + (64 - nb) * 36028797018963968 AS DOUBLE)
        |          AS raw
        |      FROM a)
        |SELECT event_type, v_zero,
        |       round(CASE WHEN raw <= 160.0 AND v_zero > 0
        |              THEN 64.0 * ln(64.0 / v_zero) ELSE raw END, 4)
        |         AS est_distinct
        |FROM e ORDER BY event_type""".stripMargin,
    // HLL rollup: per-group registers plus a register-wise max merge
    // for the '__all__' row — the same estimate expression applied to
    // both register tables, never rescanning events
    "sketch_hll_rollup" ->
      """WITH h AS (SELECT event_type,
        |    CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) AS h
        |  FROM events),
        |b AS (SELECT event_type, h >> 54 AS bucket,
        |             h & 18014398509481983 AS rest FROM h),
        |r AS (SELECT event_type AS grp, bucket,
        |        CAST(max(CASE WHEN rest = 0 THEN 55
        |                 ELSE 55 - length(bin(rest)) END) AS BIGINT) AS r
        |      FROM b GROUP BY 1, 2),
        |rall AS (SELECT grp, bucket, r FROM r
        |         UNION ALL
        |         SELECT '__all__' AS grp, bucket, max(r) FROM r GROUP BY 2),
        |a AS (SELECT grp,
        |        CAST(sum(1::BIGINT << CAST(55 - r AS INT)) AS BIGINT) AS sp,
        |        CAST(count(*) AS BIGINT) AS nb
        |      FROM rall GROUP BY 1),
        |e AS (SELECT grp, CAST(64 - nb AS BIGINT) AS v_zero,
        |        (CAST(0.709 AS DOUBLE) * CAST(4096 AS DOUBLE)
        |           * CAST(36028797018963968 AS DOUBLE))
        |          / CAST(sp + (64 - nb) * 36028797018963968 AS DOUBLE)
        |          AS raw
        |      FROM a)
        |SELECT grp, v_zero,
        |       round(CASE WHEN raw <= 160.0 AND v_zero > 0
        |              THEN 64.0 * ln(64.0 / v_zero) ELSE raw END, 4)
        |         AS est_distinct
        |FROM e ORDER BY grp""".stripMargin,
    // mixture table: integer-exact volumes; tok_share is one exact
    // BIGINT/BIGINT division → identical IEEE double in both engines
    "corpus_mixture" ->
      """WITH d AS (SELECT source, lang,
        |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |           FROM documents),
        |g AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
        |             CAST(sum(n_tok) AS BIGINT) AS n_tokens
        |      FROM d GROUP BY 1, 2)
        |SELECT source, lang, n_docs, n_tokens,
        |       round(n_tokens / CAST(sum(n_tokens) OVER () AS BIGINT), 6)
        |         AS tok_share
        |FROM g ORDER BY source, lang""".stripMargin,
    // temperature-scaled mixture (α=0.5 evaluated as sqrt — pow(x,.5)
    // is not guaranteed bit-equal to sqrt across libms)
    "corpus_temperature_mix" ->
      """WITH g AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |             CAST(sum(len(string_split(text, ' '))) AS BIGINT)
        |               AS n_tokens
        |           FROM documents GROUP BY 1),
        |t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot,
        |        sum(sqrt(n_tokens)) AS tot_p
        |      FROM g)
        |SELECT g.source, g.n_docs, g.n_tokens,
        |       round(g.n_tokens / t.tot, 6) AS raw_share,
        |       round(sqrt(g.n_tokens) / t.tot_p, 6) AS temp_share,
        |       round((sqrt(g.n_tokens) / t.tot_p)
        |         / (g.n_tokens / t.tot), 4) AS boost
        |FROM g CROSS JOIN t ORDER BY source""".stripMargin,
    // corpus health dashboard: exact volumes + the KMV estimate
    // (md5-60 k-min over text) + histogram token percentiles, all
    // joined per language; dup_share clamps at 0 (estimate noise)
    // PSI drift monitor: md5 half-split waves, add-1-smoothed bin
    // shares from exact integers, per-bin term micro-quantized to a
    // BIGINT before the per-language sum
    "corpus_drift_psi" ->
      """WITH d AS (SELECT lang,
        |        substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '8000'
        |          AS ha,
        |        n_chars // 64 AS bin
        |      FROM documents),
        |bins AS (SELECT lang, bin,
        |        CAST(sum(CASE WHEN ha THEN 1 ELSE 0 END) AS BIGINT)
        |          AS ca,
        |        CAST(sum(CASE WHEN NOT ha THEN 1 ELSE 0 END) AS BIGINT)
        |          AS cb
        |      FROM d GROUP BY 1, 2),
        |tot AS (SELECT lang, CAST(sum(ca) AS BIGINT) AS ta,
        |        CAST(sum(cb) AS BIGINT) AS tb,
        |        CAST(count(*) AS BIGINT) AS nb
        |      FROM bins GROUP BY 1),
        |tm AS (SELECT bins.lang, tot.ta, tot.tb, tot.nb,
        |        CAST(round(((ca + 1) * 1.0 / (ta + nb)
        |          - (cb + 1) * 1.0 / (tb + nb))
        |          * ln(((ca + 1) * 1.0 / (ta + nb))
        |          / ((cb + 1) * 1.0 / (tb + nb))) * 1000000) AS BIGINT)
        |          AS tm
        |       FROM bins JOIN tot ON bins.lang = tot.lang)
        |SELECT lang, max(ta) AS n_a, max(tb) AS n_b, max(nb) AS n_bins,
        |  round(CAST(sum(tm) AS DOUBLE) / 1000000.0, 4) AS psi
        |FROM tm GROUP BY 1 ORDER BY lang""".stripMargin,
    "corpus_health" ->
      """WITH d AS (SELECT lang, text,
        |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |           FROM documents),
        |base AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |                CAST(sum(n_tok) AS BIGINT) AS n_tokens
        |         FROM d GROUP BY 1),
        |hh AS (SELECT DISTINCT lang,
        |         CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) AS h
        |       FROM d),
        |rr AS (SELECT lang, h,
        |         row_number() OVER (PARTITION BY lang ORDER BY h) AS rn
        |       FROM hh),
        |sk AS (SELECT lang, CAST(count(*) AS BIGINT) AS nd,
        |              max(CASE WHEN rn = 64 THEN h END) AS kth
        |       FROM rr GROUP BY 1),
        |est AS (SELECT lang,
        |          CASE WHEN nd < 64 THEN round(CAST(nd AS DOUBLE), 4)
        |               ELSE round((CAST(63.0 AS DOUBLE)
        |                             * CAST(1152921504606846976 AS DOUBLE))
        |                          / CAST(kth AS DOUBLE), 4) END
        |            AS est_distinct
        |        FROM sk),
        |hb AS (SELECT lang, CAST(floor(n_tok / 16.0) AS BIGINT) AS bin,
        |              CAST(count(*) AS BIGINT) AS cnt
        |       FROM d GROUP BY 1, 2),
        |hc AS (SELECT lang, bin, cnt,
        |              CAST(sum(cnt) OVER (PARTITION BY lang
        |                                  ORDER BY bin) AS BIGINT) AS cum,
        |              CAST(sum(cnt) OVER (PARTITION BY lang) AS BIGINT) AS n
        |       FROM hb),
        |ht AS (SELECT lang, bin, cnt, cum, n,
        |              CAST((1 * n + 1) // 2 AS BIGINT) AS t50,
        |              CAST((19 * n + 19) // 20 AS BIGINT) AS t95
        |       FROM hc),
        |hq AS (SELECT lang,
        |         arg_min(CASE WHEN cum >= t50 THEN
        |                   round(16.0 * bin
        |                     + 16.0 * (t50 - (cum - cnt)) / cnt, 4) END,
        |                 CASE WHEN cum >= t50 THEN bin END) AS p50_tok,
        |         arg_min(CASE WHEN cum >= t95 THEN
        |                   round(16.0 * bin
        |                     + 16.0 * (t95 - (cum - cnt)) / cnt, 4) END,
        |                 CASE WHEN cum >= t95 THEN bin END) AS p95_tok
        |       FROM ht GROUP BY lang)
        |SELECT b.lang, b.n_docs, b.n_tokens, e.est_distinct,
        |       round(greatest(CAST(0.0 AS DOUBLE),
        |                      1 - e.est_distinct / b.n_docs), 4)
        |         AS dup_share,
        |       hq.p50_tok, hq.p95_tok
        |FROM base b JOIN est e ON b.lang = e.lang
        |JOIN hq ON b.lang = hq.lang
        |ORDER BY b.lang""".stripMargin,
    // histogram quantile sketch: integer bins and ranks, one float
    // division at the end — DuckDB reproduces the estimate exactly.
    // Window sums cast back to BIGINT (DuckDB widens to HUGEINT).
    "sketch_hist_quantile" ->
      """WITH b AS (SELECT lang,
        |             CAST(floor(n_chars / 64.0) AS BIGINT) AS bin,
        |             CAST(count(*) AS BIGINT) AS cnt
        |           FROM documents GROUP BY 1, 2),
        |c AS (SELECT lang, bin, cnt,
        |             CAST(sum(cnt) OVER (PARTITION BY lang
        |                                 ORDER BY bin) AS BIGINT) AS cum,
        |             CAST(sum(cnt) OVER (PARTITION BY lang) AS BIGINT) AS n
        |      FROM b),
        |t AS (SELECT lang, bin, cnt, cum, n,
        |             CAST((1 * n + 1) // 2 AS BIGINT) AS t50,
        |             CAST((19 * n + 19) // 20 AS BIGINT) AS t95
        |      FROM c)
        |SELECT lang, max(n) AS n,
        |       arg_min(CASE WHEN cum >= t50 THEN
        |                 round(64.0 * bin
        |                   + 64.0 * (t50 - (cum - cnt)) / cnt, 4) END,
        |               CASE WHEN cum >= t50 THEN bin END) AS p50_est,
        |       arg_min(CASE WHEN cum >= t95 THEN
        |                 round(64.0 * bin
        |                   + 64.0 * (t95 - (cum - cnt)) / cnt, 4) END,
        |               CASE WHEN cum >= t95 THEN bin END) AS p95_est
        |FROM t GROUP BY lang ORDER BY lang""".stripMargin,
    // count-min sketch top-k: the md5-derived (row, bucket) hashing
    // and the integer bucket counts replay exactly, so even the
    // collision-inflated estimates hash-match
    "sketch_cms_topk" ->
      """WITH toks AS (SELECT unnest(string_split(text, ' ')) AS tok
        |              FROM documents),
        |dd AS (SELECT unnest(range(4)) AS d),
        |st AS (SELECT dd.d,
        |              CAST('0x' || substr(md5(CAST(dd.d AS VARCHAR)
        |                  || '|' || toks.tok), 1, 15) AS BIGINT) % 1024
        |                AS bucket,
        |              CAST(count(*) AS BIGINT) AS cnt
        |       FROM toks, dd GROUP BY 1, 2),
        |v AS (SELECT DISTINCT tok FROM toks),
        |pr AS (SELECT v.tok, dd.d,
        |              CAST('0x' || substr(md5(CAST(dd.d AS VARCHAR)
        |                  || '|' || v.tok), 1, 15) AS BIGINT) % 1024
        |                AS bucket
        |       FROM v, dd),
        |est AS (SELECT pr.tok, min(st.cnt) AS est
        |        FROM pr JOIN st ON pr.d = st.d AND pr.bucket = st.bucket
        |        GROUP BY 1)
        |SELECT tok, est FROM est
        |ORDER BY est DESC, tok LIMIT 15""".stripMargin,
    // grouped CMS: one sketch per language, same md5 hashing
    "sketch_cms_grouped" ->
      """WITH toks AS (SELECT lang, unnest(string_split(text, ' ')) AS tok
        |              FROM documents),
        |dd AS (SELECT unnest(range(4)) AS d),
        |st AS (SELECT toks.lang, dd.d,
        |              CAST('0x' || substr(md5(CAST(dd.d AS VARCHAR)
        |                  || '|' || toks.tok), 1, 15) AS BIGINT) % 1024
        |                AS bucket,
        |              CAST(count(*) AS BIGINT) AS cnt
        |       FROM toks, dd GROUP BY 1, 2, 3),
        |v AS (SELECT DISTINCT lang, tok FROM toks),
        |pr AS (SELECT v.lang, v.tok, dd.d,
        |              CAST('0x' || substr(md5(CAST(dd.d AS VARCHAR)
        |                  || '|' || v.tok), 1, 15) AS BIGINT) % 1024
        |                AS bucket
        |       FROM v, dd),
        |est AS (SELECT pr.lang, pr.tok, min(st.cnt) AS est
        |        FROM pr JOIN st ON pr.lang = st.lang AND pr.d = st.d
        |          AND pr.bucket = st.bucket
        |        GROUP BY 1, 2),
        |r AS (SELECT lang, tok, est, row_number() OVER (
        |        PARTITION BY lang ORDER BY est DESC, tok) AS rk
        |      FROM est)
        |SELECT lang, rk, tok, est FROM r WHERE rk <= 5
        |ORDER BY lang, rk""".stripMargin,
    // kNN majority-vote classifier: top-5 cosine neighbors (rank ties
    // by id, the repo-wide discipline), votes counted per label,
    // winner = max votes with smaller-label tiebreak
    // kNN regression: mean of 5 neighbor labels (integer-exact) and
    // the (rounded-score + 1)-weighted mean
    "knn_regression" ->
      """WITH q AS (SELECT vec_id AS qid, CAST(label AS DOUBLE)
        |             AS true_value, embedding::DOUBLE[] AS qv
        |           FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id AS id, CAST(label AS BIGINT) AS label,
        |             embedding::DOUBLE[] AS v
        |      FROM embeddings WHERE vec_id >= 10),
        |d AS (SELECT q.qid, c.id, c.label,
        |             list_cosine_similarity(c.v, q.qv) AS s
        |      FROM c CROSS JOIN q),
        |r AS (SELECT qid, id, label, round(s, 4) AS s,
        |             row_number() OVER (PARTITION BY qid
        |                                ORDER BY s DESC, id) AS rk
        |      FROM d WHERE s IS NOT NULL),
        |a AS (SELECT qid, CAST(sum(label) AS DOUBLE) / 5 AS pm,
        |             sum((s + 1.0) * label) / sum(s + 1.0) AS pw
        |      FROM r WHERE rk <= 5 GROUP BY 1)
        |SELECT q.qid, q.true_value, round(a.pm, 4) AS pred_mean,
        |       round(a.pw, 4) AS pred_wmean,
        |       round(abs(q.true_value - a.pm), 4) AS abs_err
        |FROM a JOIN q ON a.qid = q.qid ORDER BY q.qid""".stripMargin,
    "knn_classify" ->
      """WITH q AS (SELECT vec_id AS qid, CAST(label AS BIGINT)
        |             AS true_label, embedding::DOUBLE[] AS qv
        |           FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id AS id, CAST(label AS BIGINT) AS label,
        |             embedding::DOUBLE[] AS v
        |      FROM embeddings WHERE vec_id >= 10),
        |d AS (SELECT q.qid, c.id, c.label,
        |             list_cosine_similarity(c.v, q.qv) AS s
        |      FROM c CROSS JOIN q),
        |r AS (SELECT qid, id, label, s,
        |             row_number() OVER (PARTITION BY qid
        |                                ORDER BY s DESC, id) AS rk
        |      FROM d WHERE s IS NOT NULL),
        |v AS (SELECT qid, label, CAST(count(*) AS BIGINT) AS votes
        |      FROM r WHERE rk <= 5 GROUP BY 1, 2),
        |p AS (SELECT qid, label AS pred_label, votes,
        |             row_number() OVER (PARTITION BY qid
        |                                ORDER BY votes DESC, label) AS pr
        |      FROM v)
        |SELECT q.qid, q.true_label, p.pred_label, p.votes
        |FROM p JOIN q ON p.qid = q.qid WHERE p.pr = 1
        |ORDER BY q.qid""".stripMargin,
    // nearest-centroid confusion matrix: per-label means with the
    // kmeansCentroids 6dp/float round-trip, assignment via the shared
    // IVF argmin mirror
    "centroid_confusion" ->
      s"""WITH el AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v,
         |              label FROM embeddings),
         |e AS (SELECT id, v FROM el),
         |al AS (SELECT id, v, CAST(label AS BIGINT) AS cell FROM el),
         |${ivfMeanCte("lc", "al")},
         |${ivfAssignCte("asg", "lc")}
         |SELECT CAST(el.label AS BIGINT) AS label, asg.cell AS pred_label,
         |       CAST(count(*) AS BIGINT) AS n
         |FROM asg JOIN el ON asg.id = el.id
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // KMV rollup: per-group rows as in sketch_kmv_distinct, plus a
    // '__all__' row whose estimate comes from the k smallest of the
    // UNION of per-group k-min sets — which equals the k smallest
    // global distinct hashes (the mergeability property), so the
    // mirror computes it directly from the global distinct set
    // KMV set operations: per-group k-min sets → pairwise union /
    // Jaccard / intersection estimates, all pure md5+integer-derived
    // (the union's k-min IS the true k-min of A∪B; Broder resemblance
    // on it; intersection = J·U) — mirrored list-for-list
    "sketch_kmv_setops" ->
      """WITH h AS (SELECT DISTINCT event_type AS grp,
        |    CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) AS h
        |  FROM events WHERE value > 200),
        |r AS (SELECT grp, h,
        |             row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
        |      FROM h),
        |s AS (SELECT grp, CAST(count(*) AS BIGINT) AS nd,
        |             max(CASE WHEN rn = 64 THEN h END) AS kth,
        |             list_sort(list(h) FILTER (WHERE rn <= 64)) AS mins
        |      FROM r GROUP BY grp),
        |p AS (SELECT a.grp AS grp_a, b.grp AS grp_b,
        |             a.nd AS nd_a, a.kth AS kth_a, a.mins AS ma,
        |             b.nd AS nd_b, b.kth AS kth_b, b.mins AS mb
        |      FROM s a JOIN s b ON a.grp < b.grp),
        |c AS (SELECT *,
        |        list_sort(list_distinct(list_concat(ma, mb))) AS uni,
        |        list_intersect(ma, mb) AS inter
        |      FROM p),
        |d AS (SELECT *, least(64, len(uni)) AS m,
        |        len(list_intersect(uni[1:64], inter)) AS jnum
        |      FROM c),
        |e AS (SELECT *,
        |        CASE WHEN len(uni) < 64 THEN CAST(len(uni) AS DOUBLE)
        |             ELSE (CAST(63.0 AS DOUBLE)
        |                     * CAST(1152921504606846976 AS DOUBLE))
        |                  / CAST(list_extract(uni, m) AS DOUBLE) END AS u_est,
        |        CAST(jnum AS DOUBLE) / CAST(m AS DOUBLE) AS j_est
        |      FROM d)
        |SELECT grp_a, grp_b,
        |       CASE WHEN nd_a < 64 THEN round(CAST(nd_a AS DOUBLE), 4)
        |            ELSE round((CAST(63.0 AS DOUBLE)
        |                          * CAST(1152921504606846976 AS DOUBLE))
        |                       / CAST(kth_a AS DOUBLE), 4) END AS est_a,
        |       CASE WHEN nd_b < 64 THEN round(CAST(nd_b AS DOUBLE), 4)
        |            ELSE round((CAST(63.0 AS DOUBLE)
        |                          * CAST(1152921504606846976 AS DOUBLE))
        |                       / CAST(kth_b AS DOUBLE), 4) END AS est_b,
        |       round(u_est, 4) AS est_union,
        |       round(j_est, 4) AS jaccard_est,
        |       round(j_est * u_est, 4) AS est_inter
        |FROM e ORDER BY grp_a, grp_b""".stripMargin,
    "sketch_kmv_rollup" ->
      """WITH h AS (SELECT DISTINCT event_type,
        |    CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) AS h
        |  FROM events),
        |r AS (SELECT event_type, h,
        |             row_number() OVER (PARTITION BY event_type ORDER BY h)
        |               AS rn
        |      FROM h),
        |s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS nd,
        |             max(CASE WHEN rn = 64 THEN h END) AS kth
        |      FROM r GROUP BY event_type),
        |per AS (SELECT event_type AS grp, least(nd, 64) AS n_seen,
        |          CASE WHEN nd < 64 THEN round(CAST(nd AS DOUBLE), 4)
        |               ELSE round((CAST(63.0 AS DOUBLE)
        |                             * CAST(1152921504606846976 AS DOUBLE))
        |                          / CAST(kth AS DOUBLE), 4) END
        |            AS est_distinct
        |        FROM s),
        |gh AS (SELECT DISTINCT h FROM h),
        |gr AS (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM gh),
        |gs AS (SELECT CAST(count(*) AS BIGINT) AS n_seen,
        |              max(CASE WHEN rn = 64 THEN h END) AS kth
        |       FROM gr WHERE rn <= 64),
        |gl AS (SELECT '__all__' AS grp, n_seen,
        |         CASE WHEN n_seen < 64 THEN round(CAST(n_seen AS DOUBLE), 4)
        |              ELSE round((CAST(63.0 AS DOUBLE)
        |                            * CAST(1152921504606846976 AS DOUBLE))
        |                         / CAST(kth AS DOUBLE), 4) END
        |           AS est_distinct
        |       FROM gs)
        |SELECT grp, n_seen, est_distinct FROM per
        |UNION ALL SELECT grp, n_seen, est_distinct FROM gl
        |ORDER BY grp""".stripMargin,
    // chunk_id ≡ start_tok / stride (posexplode numbers the sequence
    // 0, stride, 2·stride… in order), so the oracle derives it
    // arithmetically; DuckDB list slicing clamps at the list end the
    // same way Spark's slice(length=32) does for the short final
    // window
    "text_chunk" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks,
        |                  len(string_split(text, ' ')) AS n
        |           FROM documents),
        |x AS (SELECT doc_id, toks, n,
        |             unnest(range(0, greatest(n, 1), 24)) AS st
        |      FROM t)
        |SELECT doc_id, CAST(st // 24 AS BIGINT) AS chunk_id,
        |       CAST(st AS BIGINT) AS start_tok,
        |       CAST(least(32, n - st) AS BIGINT) AS n_chunk_toks,
        |       md5(array_to_string(toks[st + 1 : least(st + 32, n)], ' '))
        |         AS chunk_md5
        |FROM x ORDER BY doc_id, chunk_id""".stripMargin,
    // offset packing over the chunk table: a chunk joins the sequence
    // holding its cumulative start offset (integer window cumsum +
    // floor-div — replays exactly)
    "chunk_pack" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks,
        |                  len(string_split(text, ' ')) AS n
        |           FROM documents),
        |x AS (SELECT doc_id, n, unnest(range(0, greatest(n, 1), 24)) AS st
        |      FROM t),
        |c AS (SELECT doc_id, CAST(st // 24 AS BIGINT) AS chunk_id,
        |             CAST(st AS BIGINT) AS start_tok,
        |             CAST(least(32, n - st) AS BIGINT) AS n_chunk_toks
        |      FROM x),
        |s AS (SELECT doc_id, chunk_id, start_tok, n_chunk_toks,
        |             coalesce(sum(n_chunk_toks) OVER (
        |               PARTITION BY doc_id ORDER BY chunk_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |               0) AS cum
        |      FROM c)
        |SELECT doc_id, CAST(cum // 128 AS BIGINT) AS seq_id,
        |       CAST(count(*) AS BIGINT) AS n_chunks,
        |       CAST(sum(n_chunk_toks) AS BIGINT) AS seq_toks,
        |       min(start_tok) AS first_tok
        |FROM s GROUP BY doc_id, seq_id
        |ORDER BY doc_id, seq_id""".stripMargin,
    // length-bucketed batching: cap = 2^ceil(log2 n) via INTEGER
    // bin-length (length(bin(n-1)) — the shared floor-log2
    // discipline), clamped to [16, 512]; batches of 8; the only
    // double is the final waste ratio
    "train_length_buckets" ->
      """WITH t AS (SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n
        |           FROM documents),
        |c AS (SELECT n,
        |        least(512, greatest(16,
        |          1::BIGINT << length(bin(greatest(n, 2) - 1)))) AS cap
        |      FROM t),
        |g AS (SELECT cap AS bucket_cap, CAST(count(*) AS BIGINT) AS n_docs,
        |             CAST(sum(n) AS BIGINT) AS total_tokens
        |      FROM c GROUP BY 1)
        |SELECT bucket_cap, n_docs, total_tokens,
        |       (n_docs + 7) // 8 AS n_batches,
        |       ((n_docs + 7) // 8) * 8 * bucket_cap AS padded_slots,
        |       round((((n_docs + 7) // 8) * 8 * bucket_cap - total_tokens)
        |         * 1.0 / (((n_docs + 7) // 8) * 8 * bucket_cap), 4)
        |         AS waste_pct
        |FROM g ORDER BY bucket_cap""".stripMargin,
    // planted-PII corpus (corpusWithPii): counts via
    // regexp_extract_all length, redaction email→phone→ip with the
    // 'g' flag (Spark's regexp_replace is global by default)
    "text_pii_redact" ->
      """WITH p AS (SELECT doc_id, text ||
        |    CASE WHEN doc_id % 10 = 0
        |         THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
        |         ELSE '' END ||
        |    CASE WHEN doc_id % 7 = 0
        |         THEN ' call 555-123-4567 or 555-987-6543' ELSE '' END ||
        |    CASE WHEN doc_id % 13 = 0
        |         THEN ' from host 192.168.1.10' ELSE '' END AS text
        |  FROM documents),
        |m AS (SELECT doc_id,
        |  CAST(len(regexp_extract_all(text,
        |    '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(text,
        |    '[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phones,
        |  CAST(len(regexp_extract_all(text,
        |    '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS BIGINT)
        |    AS n_ips,
        |  md5(regexp_replace(regexp_replace(regexp_replace(text,
        |    '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '[EMAIL]', 'g'),
        |    '[0-9]{3}-[0-9]{3}-[0-9]{4}', '[PHONE]', 'g'),
        |    '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '[IP]', 'g'))
        |    AS redacted_md5
        |FROM p)
        |SELECT doc_id, n_emails, n_phones, n_ips, redacted_md5,
        |       n_emails + n_phones + n_ips AS n_pii
        |FROM m ORDER BY doc_id""".stripMargin,
    // n-grams via list_transform ranges (1-based: range(1, len) gives
    // the len-1 bigram starts); fractions NULL when a doc has no
    // bigrams/trigrams, matching the Spark left joins
    "text_repetition" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM documents),
        |u AS (SELECT doc_id, unnest(toks) AS tok FROM t),
        |uc AS (SELECT doc_id, tok, count(*) AS c FROM u GROUP BY 1, 2),
        |ua AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_toks,
        |              max(c) AS mu FROM uc GROUP BY 1),
        |b AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
        |        i -> toks[i] || ' ' || toks[i+1])) AS bg FROM t),
        |bc AS (SELECT doc_id, bg, count(*) AS c FROM b GROUP BY 1, 2),
        |ba AS (SELECT doc_id, sum(c) AS n_bi, max(c) AS mb
        |       FROM bc GROUP BY 1),
        |g AS (SELECT doc_id, unnest(list_transform(range(1, len(toks) - 1),
        |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS tg
        |      FROM t),
        |gc AS (SELECT doc_id, tg, count(*) AS c FROM g GROUP BY 1, 2),
        |ga AS (SELECT doc_id, sum(c) AS n_tri,
        |              sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup
        |       FROM gc GROUP BY 1)
        |SELECT ua.doc_id, ua.n_toks,
        |       round(CAST(mu AS DOUBLE) / n_toks, 4) AS top_unigram_frac,
        |       round(CAST(mb AS DOUBLE) / n_bi, 4) AS top_bigram_frac,
        |       round(CAST(dup AS DOUBLE) / n_tri, 4) AS dup_trigram_frac
        |FROM ua LEFT JOIN ba USING (doc_id) LEFT JOIN ga USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "text_fingerprint" ->
      """WITH n AS (SELECT doc_id,
        |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp_md5
        |  FROM documents)
        |SELECT doc_id, fp_md5,
        |       CAST('0x' || substr(fp_md5, 1, 15) AS BIGINT) AS fp60
        |FROM n ORDER BY doc_id""".stripMargin,
    // Unicode normalization report: NFC + width-fold + casefold. The
    // translate tables interpolate from the SAME Scala vals the Spark
    // side uses (escaped for a single-quoted literal), so the two
    // engines cannot drift by a character; nfc_normalize is DuckDB's
    // canonical-composition twin of the codegen'd NfcNormalize.
    "text_normalize" -> {
      def sqlLit(v: String) = "'" + v.replace("'", "''") + "'"
      val from = sqlLit(graft.operators.TextOps.widthFoldFrom)
      val to = sqlLit(graft.operators.TextOps.widthFoldTo)
      s"""WITH nt AS (SELECT doc_id, text,
         |        lower(translate(nfc_normalize(text), $from, $to)) AS nx
         |      FROM documents)
         |SELECT doc_id, CAST(length(text) AS BIGINT) AS len_raw,
         |       CAST(length(nx) AS BIGINT) AS len_norm,
         |       text <> nx AS changed, md5(nx) AS norm_md5
         |FROM nt ORDER BY doc_id""".stripMargin
    },
    // type-token ratio: exact integer counts, one 4dp division
    "text_ttr" ->
      """WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws
        |           FROM documents),
        |c AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_words,
        |        CAST(len(list_distinct(ws)) AS BIGINT) AS n_distinct
        |      FROM w)
        |SELECT doc_id, n_words, n_distinct,
        |       round(CAST(n_distinct AS DOUBLE) / n_words, 4) AS ttr
        |FROM c WHERE n_words > 0 ORDER BY doc_id""".stripMargin,
    // hapax legomena per source: exact integer counts off one
    // (source, token) aggregate; ratios are single exact-long divisions
    "text_hapax" ->
      """WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS tok
        |           FROM documents),
        |g AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS tf
        |      FROM t GROUP BY 1, 2)
        |SELECT source, CAST(sum(tf) AS BIGINT) AS n_tokens,
        |       CAST(count(*) AS BIGINT) AS vocab,
        |       CAST(sum(CASE WHEN tf = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS hapax,
        |       round(CAST(sum(CASE WHEN tf = 1 THEN 1 ELSE 0 END)
        |         AS DOUBLE) / count(*), 6) AS hapax_ratio,
        |       round(CAST(sum(CASE WHEN tf = 1 THEN 1 ELSE 0 END)
        |         AS DOUBLE) / sum(tf), 6) AS hapax_token_share
        |FROM g GROUP BY 1 ORDER BY source""".stripMargin,
    // n-gram coverage of eval by train (doc_id%10 8/2 split): per n,
    // distinct + occurrence-weighted coverage via one gram-keyed
    // left join per n against the train distinct set
    "corpus_ngram_coverage" -> {
      def block(n: Int, gramList: String) =
        s"""g$n AS (SELECT (doc_id % 10 < 8) AS is_train, g
           |       FROM (SELECT doc_id, ws FROM w WHERE len(ws) >= $n),
           |            unnest($gramList) AS t(g)),
           |tr$n AS (SELECT DISTINCT g FROM g$n WHERE is_train),
           |ev$n AS (SELECT g, CAST(count(*) AS BIGINT) AS occ
           |        FROM g$n WHERE NOT is_train GROUP BY 1),
           |s$n AS (SELECT CAST($n AS BIGINT) AS n,
           |         CAST(count(*) AS BIGINT) AS eval_distinct,
           |         CAST(sum(CASE WHEN tr$n.g IS NOT NULL THEN 1
           |           ELSE 0 END) AS BIGINT) AS covered_distinct,
           |         CAST(sum(ev$n.occ) AS BIGINT) AS eval_occ,
           |         CAST(sum(CASE WHEN tr$n.g IS NOT NULL THEN ev$n.occ
           |           ELSE 0 END) AS BIGINT) AS covered_occ
           |       FROM ev$n LEFT JOIN tr$n ON ev$n.g = tr$n.g)""".stripMargin
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
         |           FROM documents),
         |${block(1, "ws")},
         |${block(2, "list_transform(range(1, len(ws)), " +
            "i -> ws[i] || ' ' || ws[i+1])")},
         |${block(3, "list_transform(range(1, len(ws) - 1), " +
            "i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])")},
         |u AS (SELECT * FROM s1 UNION ALL SELECT * FROM s2
         |      UNION ALL SELECT * FROM s3)
         |SELECT n, eval_distinct, covered_distinct,
         |       round(CAST(covered_distinct AS DOUBLE) / eval_distinct,
         |         6) AS distinct_coverage,
         |       eval_occ, covered_occ,
         |       round(CAST(covered_occ AS DOUBLE) / eval_occ, 6)
         |         AS occ_coverage
         |FROM u ORDER BY n""".stripMargin
    },
    // RAKE: phrase id = running stopword count; word score =
    // truncating (deg·10⁴)//freq fixed-point so phrase scores and
    // the top-k rank are all-integer; phrase string reassembled in
    // position order on both engines
    "text_rake_keywords" ->
      """WITH wlist AS (SELECT doc_id, string_split(text, ' ') AS ws
        |               FROM documents),
        |tk AS (SELECT doc_id, i AS pos, ws[i] AS tok
        |       FROM wlist, unnest(range(1, len(ws) + 1)) AS t(i)),
        |fl AS (SELECT doc_id, pos, tok,
        |         CASE WHEN tok IN ('the','a','and','of','to','in','is')
        |              THEN 1 ELSE 0 END AS is_stop
        |       FROM tk),
        |g AS (SELECT doc_id, pos, tok, is_stop,
        |        sum(is_stop) OVER (PARTITION BY doc_id ORDER BY pos
        |          ROWS UNBOUNDED PRECEDING) AS pid
        |      FROM fl),
        |words AS (SELECT doc_id, pid, pos, tok FROM g
        |          WHERE is_stop = 0 AND tok <> ''),
        |ph AS (SELECT doc_id, pid,
        |         string_agg(tok, ' ' ORDER BY pos) AS phrase,
        |         CAST(count(*) AS BIGINT) AS plen
        |       FROM words GROUP BY 1, 2),
        |occ AS (SELECT w.doc_id, w.pid, w.tok, ph.phrase, ph.plen
        |        FROM words w JOIN ph ON w.doc_id = ph.doc_id
        |                            AND w.pid = ph.pid),
        |ws2 AS (SELECT tok, (CAST(sum(plen) AS BIGINT) * 10000)
        |          // CAST(count(*) AS BIGINT) AS wscore
        |        FROM occ GROUP BY 1),
        |ps AS (SELECT occ.doc_id, occ.pid, occ.phrase, occ.plen,
        |         CAST(sum(ws2.wscore) AS BIGINT) AS score_scaled
        |       FROM occ JOIN ws2 USING (tok) GROUP BY 1, 2, 3, 4),
        |dd AS (SELECT phrase, CAST(max(plen) AS BIGINT) AS n_words,
        |         CAST(count(*) AS BIGINT) AS n_occur,
        |         CAST(max(score_scaled) AS BIGINT) AS score_scaled
        |       FROM ps GROUP BY 1),
        |r AS (SELECT phrase, n_words, n_occur, score_scaled,
        |        CAST(row_number() OVER (ORDER BY score_scaled DESC,
        |          phrase) AS BIGINT) AS rk
        |      FROM dd)
        |SELECT rk, phrase, n_words, n_occur,
        |       round(CAST(score_scaled AS DOUBLE) / 10000.0, 4) AS score
        |FROM r WHERE rk <= 20 ORDER BY rk""".stripMargin,
    // within-doc token entropy: integer floor-log2 bits (length of
    // the binary rendering of n div tf), BIGINT Σ tf·bits fold, one
    // final exact-long division — the text_surprisal discipline
    "text_token_entropy" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |           FROM documents),
        |g AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
        |      FROM t GROUP BY 1, 2),
        |n AS (SELECT doc_id, tok, tf,
        |        sum(tf) OVER (PARTITION BY doc_id) AS n
        |      FROM g),
        |b AS (SELECT doc_id, tf, n,
        |        CAST(length(bin(n // tf)) AS BIGINT) - 1 AS bits
        |      FROM n)
        |SELECT doc_id, CAST(max(n) AS BIGINT) AS n_tokens,
        |       CAST(count(*) AS BIGINT) AS n_distinct,
        |       CAST(sum(tf * bits) AS BIGINT) AS total_bits,
        |       round(CAST(sum(tf * bits) AS DOUBLE) / max(n), 4)
        |         AS bits_per_token
        |FROM b GROUP BY 1 ORDER BY doc_id""".stripMargin,
    // Simpson diversity of language mix per source: the HHI integer
    // arithmetic (squares via HUGEINT) pointed at corpus composition
    "corpus_source_diversity" ->
      """WITH g AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS n
        |           FROM documents GROUP BY 1, 2)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_langs,
        |       CAST(sum(n) AS BIGINT) AS n_docs,
        |       round(1.0 - CAST(sum(CAST(n AS HUGEINT) * n) AS DOUBLE)
        |         / CAST(CAST(sum(n) AS HUGEINT) * sum(n) AS DOUBLE), 6)
        |         AS simpson
        |FROM g GROUP BY 1 ORDER BY source""".stripMargin,
    // interarrival gaps per segment: lag over per-customer date
    // order, exact interpolated percentiles
    "orders_interarrival" ->
      """WITH o AS (SELECT o_custkey AS cust, o_orderkey,
        |        date_diff('day', DATE '1970-01-01',
        |          CAST(o_orderdate AS DATE)) AS d
        |      FROM orders),
        |g AS (SELECT cust,
        |        d - lag(d) OVER (PARTITION BY cust
        |                         ORDER BY d, o_orderkey) AS gap
        |      FROM o),
        |j AS (SELECT c.c_mktsegment, g.gap
        |      FROM g JOIN customer c ON g.cust = c.c_custkey
        |      WHERE g.gap IS NOT NULL)
        |SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_gaps,
        |       round(avg(gap), 4) AS mean_days,
        |       round(quantile_cont(gap, 0.5), 4) AS p50_days,
        |       round(quantile_cont(gap, 0.95), 4) AS p95_days
        |FROM j GROUP BY 1 ORDER BY c_mktsegment""".stripMargin,
    // chi-square independence: per-cell terms micro-quantized to
    // BIGINT before the cross-cell sum (events_anova discipline)
    "priority_returns_chi2" ->
      """WITH cells AS (SELECT o.o_orderpriority, l.l_returnflag,
        |         CAST(count(*) AS BIGINT) AS o
        |       FROM lineitem l
        |       JOIN orders o ON l.l_orderkey = o.o_orderkey
        |       GROUP BY 1, 2),
        |rt AS (SELECT o_orderpriority, CAST(sum(o) AS BIGINT) AS rt
        |       FROM cells GROUP BY 1),
        |ct AS (SELECT l_returnflag, CAST(sum(o) AS BIGINT) AS ct
        |       FROM cells GROUP BY 1),
        |tt AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
        |tm AS (SELECT cells.o,
        |         CAST(rt.rt AS DOUBLE) * ct.ct / tt.n AS e,
        |         cells.o_orderpriority, cells.l_returnflag
        |       FROM cells JOIN rt USING (o_orderpriority)
        |       JOIN ct USING (l_returnflag) CROSS JOIN tt),
        |q AS (SELECT CAST(count(*) AS BIGINT) AS n_cells,
        |        CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS nr,
        |        CAST(count(DISTINCT l_returnflag) AS BIGINT) AS nc,
        |        CAST(sum(CAST(round((o - e) * (o - e) / e * 1000000)
        |          AS BIGINT)) AS BIGINT) AS st
        |      FROM tm)
        |SELECT n_cells, (nr - 1) * (nc - 1) AS dof,
        |       round(CAST(st AS DOUBLE) / 1000000.0, 4) AS chi2
        |FROM q""".stripMargin,
    // XYZ classification: exact integer monthly-demand moments,
    // HUGEINT variance numerator, class cuts on the UNROUNDED CV
    "part_xyz_class" ->
      """WITH mo AS (SELECT l_partkey AS part,
        |         CAST(year(l_shipdate) * 12 + month(l_shipdate) - 1
        |           AS BIGINT) AS mx,
        |         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
        |       FROM lineitem GROUP BY 1, 2),
        |g AS (SELECT part, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(q) AS BIGINT) AS sx,
        |        sum(CAST(q AS HUGEINT) * q) AS qx
        |      FROM mo GROUP BY 1),
        |c AS (SELECT part, n, sx,
        |        sqrt(CAST(n * qx - CAST(sx AS HUGEINT) * sx AS DOUBLE)
        |          / CAST(n * (n - 1) AS DOUBLE))
        |          / (CAST(sx AS DOUBLE) / n) AS cv
        |      FROM g)
        |SELECT part, n AS n_months,
        |       round(CAST(sx AS DOUBLE) / n, 4) AS mean_qty,
        |       CASE WHEN n < 2 THEN NULL ELSE round(cv, 4) END AS cv,
        |       CASE WHEN n < 2 THEN 'Z' WHEN cv < 0.5 THEN 'X'
        |            WHEN cv < 1.0 THEN 'Y' ELSE 'Z' END AS xyz
        |FROM c ORDER BY part""".stripMargin,
    // ABC×XYZ: the two classifiers' cuts joined on partkey
    "part_abc_xyz_matrix" ->
      """WITH rev AS (SELECT l_partkey AS partkey,
        |        CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
        |          * 100) AS BIGINT)) AS BIGINT) AS cents
        |      FROM lineitem GROUP BY 1 HAVING cents > 0),
        |t AS (SELECT CAST(sum(cents) AS BIGINT) AS total FROM rev),
        |cu AS (SELECT partkey, cents,
        |         CAST(sum(cents) OVER (ORDER BY cents DESC, partkey)
        |           AS BIGINT) AS cum
        |       FROM rev),
        |k AS (SELECT cu.partkey, cu.cents,
        |        CASE WHEN cu.cum * 5 <= t.total * 4 THEN 'A'
        |             WHEN cu.cum * 20 <= t.total * 19 THEN 'B'
        |             ELSE 'C' END AS abc
        |      FROM cu, t),
        |mo AS (SELECT l_partkey AS part,
        |         CAST(year(l_shipdate) * 12 + month(l_shipdate) - 1
        |           AS BIGINT) AS mx,
        |         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
        |       FROM lineitem GROUP BY 1, 2),
        |g AS (SELECT part, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(q) AS BIGINT) AS sx,
        |        sum(CAST(q AS HUGEINT) * q) AS qx
        |      FROM mo GROUP BY 1),
        |cx AS (SELECT part, n,
        |        sqrt(CAST(n * qx - CAST(sx AS HUGEINT) * sx AS DOUBLE)
        |          / CAST(n * (n - 1) AS DOUBLE))
        |          / (CAST(sx AS DOUBLE) / n) AS cv
        |      FROM g),
        |x AS (SELECT part,
        |        CASE WHEN n < 2 THEN 'Z' WHEN cv < 0.5 THEN 'X'
        |             WHEN cv < 1.0 THEN 'Y' ELSE 'Z' END AS xyz
        |      FROM cx)
        |SELECT k.abc, x.xyz, CAST(count(*) AS BIGINT) AS n_parts,
        |       round(CAST(sum(k.cents) AS DOUBLE) / 100.0, 2) AS revenue
        |FROM k JOIN x ON k.partkey = x.part
        |GROUP BY 1, 2 ORDER BY abc, xyz""".stripMargin,
    // log-log elasticity: zipf-style micro-quantized ln moments,
    // DOUBLE numerators from HUGEINT-exact integers
    "part_price_elasticity" ->
      """WITH li AS (SELECT l_partkey,
        |         CAST(round(ln(l_extendedprice / l_quantity) * 1000000)
        |           AS BIGINT) AS x,
        |         CAST(round(ln(l_quantity) * 1000000) AS BIGINT) AS y
        |       FROM lineitem),
        |g AS (SELECT p.p_brand, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(x) AS BIGINT) AS sx,
        |        CAST(sum(y) AS BIGINT) AS sy,
        |        CAST(sum(x * y) AS BIGINT) AS sxy,
        |        CAST(sum(x * x) AS BIGINT) AS sxx
        |      FROM li JOIN part p ON li.l_partkey = p.p_partkey
        |      GROUP BY 1)
        |SELECT p_brand, n AS n_obs,
        |       round(CAST(CAST(n AS HUGEINT) * sxy
        |           - CAST(sx AS HUGEINT) * sy AS DOUBLE)
        |         / CAST(CAST(n AS HUGEINT) * sxx
        |           - CAST(sx AS HUGEINT) * sx AS DOUBLE), 4) AS elasticity
        |FROM g WHERE n >= 30
        |  AND CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx <> 0
        |ORDER BY p_brand""".stripMargin,
    // Gini of customer spend: the two-level banded rank decomposition
    // is exact, so the mirror collapses to the textbook one-window
    // form; rank-weighted products through HUGEINT
    "customer_gini" ->
      """WITH sp AS (SELECT o_custkey AS cust,
        |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |           AS BIGINT) AS c
        |       FROM orders GROUP BY 1),
        |r AS (SELECT c, cust,
        |        CAST(row_number() OVER (ORDER BY c, cust) AS BIGINT) AS i
        |      FROM sp),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(c) AS BIGINT) AS tot,
        |        sum(CAST(i AS HUGEINT) * c) AS sixx
        |      FROM r)
        |SELECT n AS n_customers, tot AS total_cents,
        |       round(CAST(2 * sixx - (n + 1) * CAST(tot AS HUGEINT)
        |           AS DOUBLE)
        |         / CAST(CAST(n AS HUGEINT) * tot AS DOUBLE), 6) AS gini
        |FROM a""".stripMargin,
    // one-way ANOVA F: per-type s²/n micro-quantized to BIGINT
    // before the cross-type sum (order-free), 1-row scalar fold
    "events_anova" ->
      """WITH g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |             CAST(sum(m) AS BIGINT) AS sx,
        |             CAST(sum(m * m) AS BIGINT) AS q
        |           FROM (SELECT event_type,
        |                   CAST(round(value * 100) AS BIGINT) AS m
        |                 FROM events) GROUP BY 1),
        |p AS (SELECT n, sx, q,
        |        CAST(round(CAST(CAST(sx AS HUGEINT) * sx AS DOUBLE)
        |          / n * 1000) AS BIGINT) AS rq
        |      FROM g),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS k,
        |        CAST(sum(n) AS BIGINT) AS nn,
        |        CAST(sum(sx) AS BIGINT) AS ss,
        |        CAST(sum(q) AS BIGINT) AS qq,
        |        CAST(sum(rq) AS BIGINT) AS srq
        |      FROM p)
        |SELECT k AS n_groups, nn AS n_obs,
        |       round(((CAST(srq AS DOUBLE) / 1000.0
        |           - CAST(CAST(ss AS HUGEINT) * ss AS DOUBLE) / nn)
        |           / (k - 1))
        |         / ((CAST(qq AS DOUBLE) - CAST(srq AS DOUBLE) / 1000.0)
        |           / (nn - k)), 4) AS f_stat
        |FROM a WHERE k > 1 AND nn > k""".stripMargin,
    // second capstone: cleaned corpus → md5 split → per-split volumes
    // + residual cross-split contamination (the decontam formulation
    // over the CLEANED corpus); CTE names suffixed A to avoid the
    // shared victims chain's names
    "pipeline_train_eval" ->
      s"""WITH RECURSIVE $bandCte,
         |$verifiedPairsCte,
         |$closureCte,
         |victims AS (SELECT id AS doc_id FROM reach
         |            GROUP BY id HAVING id <> min(r)),
         |tt AS (SELECT doc_id, text, string_split(text, ' ') AS toks
         |       FROM documents),
         |m AS (SELECT doc_id, len(toks) AS n_tokens,
         |        len(list_filter(toks,
         |          t -> t IN ('the','a','and','of','to','in','is')))
         |          *1.0/len(toks) AS sw,
         |        1.0 - len(list_distinct(toks))*1.0/len(toks) AS rep
         |      FROM tt),
         |qs AS (SELECT doc_id, round((least(n_tokens/50.0, 1.0)
         |         + CASE WHEN sw BETWEEN 0.01 AND 0.6 THEN 1.0 ELSE 0.0 END
         |         + (1.0 - least(rep/0.9, 1.0))) / 3.0, 4) AS quality_score
         |       FROM m),
         |clA AS (SELECT d.doc_id, d.text FROM documents d
         |        JOIN qs q ON d.doc_id = q.doc_id
         |        WHERE q.quality_score >= 0.5
         |          AND NOT EXISTS (SELECT 1 FROM victims v
         |                          WHERE v.doc_id = d.doc_id)),
         |splA AS (SELECT doc_id, text,
         |           CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
         |                     < 'cccd' THEN 'train'
         |                WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
         |                     < 'e666' THEN 'val'
         |                ELSE 'test' END AS split
         |         FROM clA),
         |${shingleCteFrom("splA", "A")},
         |sxA AS (SELECT doc_id, unnest(shingles) AS s FROM shA),
         |tsA AS (SELECT sxA.doc_id AS train_id, s
         |        FROM sxA JOIN splA USING (doc_id) WHERE split = 'train'),
         |esA AS (SELECT sxA.doc_id AS eval_id, s
         |        FROM sxA JOIN splA USING (doc_id) WHERE split <> 'train'),
         |ecA AS (SELECT eval_id, CAST(count(*) AS BIGINT) AS c
         |        FROM esA GROUP BY 1),
         |inA AS (SELECT train_id, eval_id, CAST(count(*) AS BIGINT) AS n
         |        FROM tsA JOIN esA USING (s) GROUP BY 1, 2),
         |coA AS (SELECT DISTINCT eval_id AS doc_id
         |        FROM inA JOIN ecA USING (eval_id) WHERE n / c >= 0.2),
         |cbA AS (SELECT splA.split, CAST(count(*) AS BIGINT)
         |          AS n_contaminated
         |        FROM coA JOIN splA USING (doc_id) GROUP BY 1),
         |rpA AS (SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
         |               CAST(sum(len(string_split(text, ' '))) AS BIGINT)
         |                 AS n_tokens
         |        FROM splA GROUP BY 1)
         |SELECT r.split, r.n_docs, r.n_tokens,
         |       coalesce(cbA.n_contaminated, 0) AS n_contaminated
         |FROM rpA r LEFT JOIN cbA ON r.split = cbA.split
         |ORDER BY r.split""".stripMargin,
    "pipeline_clean_corpus" ->
      s"""WITH RECURSIVE $bandCte,
         |$verifiedPairsCte,
         |$closureCte,
         |victims AS (SELECT id AS doc_id FROM reach
         |            GROUP BY id HAVING id <> min(r)),
         |tt AS (SELECT doc_id, text, string_split(text, ' ') AS toks
         |       FROM documents),
         |m AS (SELECT doc_id, len(toks) AS n_tokens,
         |        len(list_filter(toks,
         |          t -> t IN ('the','a','and','of','to','in','is')))
         |          *1.0/len(toks) AS sw,
         |        1.0 - len(list_distinct(toks))*1.0/len(toks) AS rep
         |      FROM tt),
         |qs AS (SELECT doc_id, round((least(n_tokens/50.0, 1.0)
         |         + CASE WHEN sw BETWEEN 0.01 AND 0.6 THEN 1.0 ELSE 0.0 END
         |         + (1.0 - least(rep/0.9, 1.0))) / 3.0, 4) AS quality_score
         |       FROM m)
         |SELECT d.source AS source, CAST(count(*) AS BIGINT) AS n_docs,
         |       round(avg(q.quality_score), 4) AS avg_quality
         |FROM documents d JOIN qs q ON d.doc_id = q.doc_id
         |WHERE q.quality_score >= 0.5
         |  AND NOT EXISTS (SELECT 1 FROM victims v WHERE v.doc_id = d.doc_id)
         |GROUP BY d.source ORDER BY d.source""".stripMargin,
    // request-batch dispatch: metric and filter are per-request DATA
    // (the reference's /search payload); ordering key is the
    // request's own metric, filter evaluated as a predicate
    "vdb_search_requests" ->
      """WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v, label
        |           FROM embeddings),
        |q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv,
        |             CASE WHEN vec_id % 2 = 0 THEN 10 ELSE 5 END AS k,
        |             CASE WHEN vec_id % 3 = 0 THEN 'L2'
        |                  WHEN vec_id % 3 = 1 THEN 'IP'
        |                  ELSE 'L1' END AS metric,
        |             CASE WHEN vec_id % 3 = 0 THEN '='
        |                  WHEN vec_id % 3 = 1 THEN '!=' END AS fop,
        |             5 AS fval
        |      FROM embeddings WHERE vec_id < 6),
        |d AS (SELECT q.qid, q.metric, q.k, e.id AS nn_id,
        |             CASE WHEN q.metric = 'L2' THEN list_distance(e.v, q.qv)
        |                  WHEN q.metric = 'L1' THEN
        |                    list_sum(list_transform(range(1, len(q.qv) + 1),
        |                      i -> abs(e.v[i] - q.qv[i])))
        |                  ELSE list_inner_product(e.v, q.qv) END AS s
        |      FROM e CROSS JOIN q
        |      WHERE q.fop IS NULL OR (q.fop = '=' AND e.label = q.fval)
        |         OR (q.fop = '!=' AND e.label <> q.fval)),
        |r AS (SELECT qid, nn_id, s, k,
        |             row_number() OVER (PARTITION BY qid ORDER BY
        |               CASE WHEN metric IN ('L2', 'L1') THEN s
        |                    ELSE -s END, nn_id)
        |               AS rk
        |      FROM d)
        |SELECT qid, rk, nn_id, round(s, 4) AS score
        |FROM r WHERE rk <= k ORDER BY qid, rk""".stripMargin,
    // per-request index routing (SearchApi.searchRouted): even qids
    // take the exact FLAT leg (per-request metric/k/filter), qid≡1
    // (mod 4) the IVF probe leg, qid≡3 (mod 4) the HNSW-analog NSW
    // beam leg. ALL legs share the graph chain's training CTEs
    // (ivfGraphCtes computes assignments + probes for every vector;
    // per-qid ranking makes its probe set a superset of the ivf
    // chain's, so restricting pr by qid parity is exact)
    "vdb_search_routed" ->
      s"""WITH $ivfGraphCtes,
         |el AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v, label
         |       FROM embeddings),
         |fq AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv,
         |              CASE WHEN vec_id % 3 = 0 THEN 10 ELSE 5 END AS k,
         |              CASE WHEN vec_id % 4 = 2 THEN 'IP'
         |                   ELSE 'L2' END AS metric,
         |              CASE WHEN vec_id = 4 THEN '='
         |                   WHEN vec_id = 2 THEN '!=' END AS fop,
         |              5 AS fval
         |       FROM embeddings WHERE vec_id < 8 AND vec_id % 2 = 0),
         |fd AS (SELECT fq.qid, fq.metric, fq.k, el.id AS nn_id,
         |              CASE WHEN fq.metric = 'L2'
         |                   THEN list_distance(el.v, fq.qv)
         |                   ELSE list_inner_product(el.v, fq.qv) END AS s
         |       FROM el CROSS JOIN fq
         |       WHERE fq.fop IS NULL OR (fq.fop = '=' AND el.label = fq.fval)
         |          OR (fq.fop = '!=' AND el.label <> fq.fval)),
         |fr AS (SELECT qid, nn_id, s, k,
         |              row_number() OVER (PARTITION BY qid ORDER BY
         |                CASE WHEN metric = 'L2' THEN s ELSE -s END, nn_id)
         |                AS rk
         |       FROM fd),
         |fl AS (SELECT qid, rk, nn_id, round(s, 4) AS score
         |       FROM fr WHERE rk <= k),
         |isc AS (SELECT pr.qid, a.id, list_cosine_similarity(a.v, q.qv) AS s
         |        FROM af a JOIN pr ON a.cell = pr.cell
         |             JOIN q ON pr.qid = q.qid
         |        WHERE pr.qid < 8 AND pr.qid % 4 = 1),
         |ir AS (SELECT qid, id, s,
         |              row_number() OVER (PARTITION BY qid
         |                ORDER BY s DESC, id) AS rk
         |       FROM isc WHERE s IS NOT NULL),
         |il AS (SELECT qid, rk, id AS nn_id, round(s, 4) AS score
         |       FROM ir
         |       WHERE rk <= CASE WHEN qid % 3 = 0 THEN 10 ELSE 5 END),
         |${nswBeamCtes("vec_id = 3")},
         |hl AS (SELECT qid, rk, id AS nn_id, round(s, 4) AS score
         |       FROM (SELECT *, row_number() OVER (PARTITION BY qid
         |               ORDER BY s DESC, id) AS rk FROM bf3)
         |       WHERE rk <= CASE WHEN qid % 3 = 0 THEN 10 ELSE 5 END),
         |${hnswBeamCtes("vec_id = 7", emitBase = false, qq = "hq")},
         |hil AS (SELECT qid, rk, id AS nn_id, round(s, 4) AS score
         |       FROM (SELECT *, row_number() OVER (PARTITION BY qid
         |               ORDER BY s DESC, id) AS rk FROM hbf3)
         |       WHERE rk <= CASE WHEN qid % 3 = 0 THEN 10 ELSE 5 END)
         |SELECT qid, rk, nn_id, score
         |FROM (SELECT * FROM fl UNION ALL SELECT * FROM il
         |      UNION ALL SELECT * FROM hl UNION ALL SELECT * FROM hil)
         |ORDER BY qid, rk""".stripMargin,
    // per-request ef_search (hnswlib_index.h:16, setEf at
    // hnswlib_index.cc:30): even qids FLAT (rounds_used 0), odd qids
    // the NSW beam leg with a per-request round budget ⌈ef/16⌉ —
    // ef=16 (qid≡1 mod 4) runs ONE round (the xbf1 chain), ef=48
    // (qid≡3) the full three (ybf3). Per-class chains are exact
    // because per-query trajectories are qid-partitioned — the Spark
    // side's single gated loop computes the identical prefix.
    "vdb_search_routed_ef" ->
      s"""WITH $ivfGraphCtes,
         |el AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v, label
         |       FROM embeddings),
         |fq AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv,
         |              CASE WHEN vec_id % 3 = 0 THEN 10 ELSE 5 END AS k,
         |              CASE WHEN vec_id % 4 = 2 THEN 'IP'
         |                   ELSE 'L2' END AS metric,
         |              CASE WHEN vec_id = 4 THEN '='
         |                   WHEN vec_id = 2 THEN '!=' END AS fop,
         |              5 AS fval
         |       FROM embeddings WHERE vec_id < 8 AND vec_id % 2 = 0),
         |fd AS (SELECT fq.qid, fq.metric, fq.k, el.id AS nn_id,
         |              CASE WHEN fq.metric = 'L2'
         |                   THEN list_distance(el.v, fq.qv)
         |                   ELSE list_inner_product(el.v, fq.qv) END AS s
         |       FROM el CROSS JOIN fq
         |       WHERE fq.fop IS NULL OR (fq.fop = '=' AND el.label = fq.fval)
         |          OR (fq.fop = '!=' AND el.label <> fq.fval)),
         |fr AS (SELECT qid, nn_id, s, k,
         |              row_number() OVER (PARTITION BY qid ORDER BY
         |                CASE WHEN metric = 'L2' THEN s ELSE -s END, nn_id)
         |                AS rk
         |       FROM fd),
         |fl AS (SELECT qid, rk, nn_id, round(s, 4) AS score,
         |              CAST(0 AS BIGINT) AS rounds_used
         |       FROM fr WHERE rk <= k),
         |${nswBeamCtes("vec_id < 8 AND vec_id % 4 = 1", pfx = "x",
            rounds = 1)},
         |${nswBeamCtes("vec_id < 8 AND vec_id % 4 = 3", pfx = "y",
            rounds = 3, emitBase = false)},
         |xl AS (SELECT qid, rk, id AS nn_id, round(s, 4) AS score,
         |              CAST(1 AS BIGINT) AS rounds_used
         |       FROM (SELECT *, row_number() OVER (PARTITION BY qid
         |               ORDER BY s DESC, id) AS rk FROM xbf1)
         |       WHERE rk <= CASE WHEN qid % 3 = 0 THEN 10 ELSE 5 END),
         |yl AS (SELECT qid, rk, id AS nn_id, round(s, 4) AS score,
         |              CAST(3 AS BIGINT) AS rounds_used
         |       FROM (SELECT *, row_number() OVER (PARTITION BY qid
         |               ORDER BY s DESC, id) AS rk FROM ybf3)
         |       WHERE rk <= CASE WHEN qid % 3 = 0 THEN 10 ELSE 5 END)
         |SELECT qid, rk, nn_id, score, rounds_used
         |FROM (SELECT * FROM fl UNION ALL SELECT * FROM xl
         |      UNION ALL SELECT * FROM yl)
         |ORDER BY qid, rk""".stripMargin,
    "vdb_knn_flat_l2" -> knnOracle("l2"),
    "vdb_knn_flat_ip" -> knnOracle("ip"),
    "vdb_knn_flat_l1" -> knnOracle("l1"),
    "vdb_knn_flat_linf" -> knnOracle("linf"),
    // freshness decay: boosted = ((1+cos)/2) / 2^(id%4) — the shift
    // to [0,1] keeps the decay monotone for negative cosines (a raw
    // negative divided by 2^b would move TOWARD zero, promoting the
    // stale match); the power-of-two divide only shifts the exponent,
    // exact on both engines
    "vdb_knn_recency_boost" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
        |           FROM embeddings WHERE vec_id < 5),
        |d AS (SELECT q.qid, e.vec_id AS nn_id,
        |        list_cosine_similarity(e.embedding::DOUBLE[], q.qv)
        |          AS c,
        |        e.vec_id % 4 AS bucket
        |      FROM embeddings e CROSS JOIN q),
        |s AS (SELECT qid, nn_id, c,
        |        ((c + 1) / 2)
        |          / CAST(1::BIGINT << CAST(bucket AS INTEGER) AS DOUBLE)
        |          AS dec
        |      FROM d WHERE c IS NOT NULL),
        |r AS (SELECT qid, nn_id, c, dec,
        |        row_number() OVER (PARTITION BY qid
        |          ORDER BY dec DESC, nn_id) AS rk
        |      FROM s)
        |SELECT qid, rk, nn_id, round(c, 4) AS score,
        |       round(dec, 4) AS boosted
        |FROM r WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,
    "vdb_knn_cosine" -> knnOracle("cos"),
    // recommend-by-examples: 2·avg(pos) − avg(neg) built from fetched
    // vectors, examples excluded, standard FLAT anatomy
    "vdb_recommend" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
        |           FROM embeddings),
        |rq AS (SELECT CAST(rid AS BIGINT) AS qid, pa, pb, ng
        |       FROM (VALUES (0, 0, 1, 6), (1, 2, 3, 7), (2, 4, 5, 8))
        |         t(rid, pa, pb, ng)),
        |rv AS (SELECT rq.qid, rq.pa, rq.pb, rq.ng,
        |         list_transform(range(1, len(a.v) + 1),
        |           i -> CAST(2.0 AS DOUBLE)
        |             * ((a.v[i] + b.v[i]) / CAST(2.0 AS DOUBLE))
        |             - c.v[i]) AS qv
        |       FROM rq JOIN e a ON rq.pa = a.vec_id
        |       JOIN e b ON rq.pb = b.vec_id
        |       JOIN e c ON rq.ng = c.vec_id),
        |sc AS (SELECT rv.qid, e.vec_id AS nn_id,
        |         list_cosine_similarity(e.v, rv.qv) AS s
        |       FROM e CROSS JOIN rv
        |       WHERE e.vec_id <> rv.pa AND e.vec_id <> rv.pb
        |         AND e.vec_id <> rv.ng),
        |r AS (SELECT qid, nn_id, s,
        |             row_number() OVER (PARTITION BY qid
        |               ORDER BY s DESC, nn_id) AS rk
        |      FROM sc WHERE s IS NOT NULL)
        |SELECT qid, rk, nn_id, round(s, 4) AS score
        |FROM r WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,
    // grouped search: per-(qid,label) top-2 hits, top-3 groups by
    // their best hit, all on rounded scores
    "vdb_knn_groupby" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
        |           FROM embeddings WHERE vec_id < 5),
        |d AS (SELECT q.qid, e.label, e.vec_id AS nn_id,
        |        round(list_cosine_similarity(e.embedding::DOUBLE[],
        |          q.qv), 4) AS s
        |      FROM embeddings e CROSS JOIN q),
        |h AS (SELECT qid, label, nn_id, s,
        |        row_number() OVER (PARTITION BY qid, label
        |          ORDER BY s DESC, nn_id) AS hit_rk
        |      FROM d WHERE s IS NOT NULL),
        |h2 AS (SELECT * FROM h WHERE hit_rk <= 2),
        |gb AS (SELECT qid, label, s AS gs FROM h2 WHERE hit_rk = 1),
        |gr AS (SELECT qid, label,
        |         row_number() OVER (PARTITION BY qid
        |           ORDER BY gs DESC, label) AS grp_rk
        |       FROM gb)
        |SELECT h2.qid, gr.grp_rk, h2.label,
        |       CAST(h2.hit_rk AS INTEGER) AS hit_rk, h2.nn_id,
        |       h2.s AS score
        |FROM h2 JOIN gr ON h2.qid = gr.qid AND h2.label = gr.label
        |WHERE gr.grp_rk <= 3
        |ORDER BY h2.qid, gr.grp_rk, hit_rk""".stripMargin,
    // scroll page 2: keyset continuation ≡ ranks 11..20 of the full
    // ordering on the 4dp-rounded score the API returned
    "vdb_scroll_page2" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
        |           FROM embeddings WHERE vec_id < 5),
        |d AS (SELECT q.qid, e.vec_id AS nn_id,
        |        round(list_cosine_similarity(e.embedding::DOUBLE[],
        |          q.qv), 4) AS s
        |      FROM embeddings e CROSS JOIN q),
        |r AS (SELECT qid, nn_id, s,
        |             row_number() OVER (PARTITION BY qid
        |               ORDER BY s DESC, nn_id) AS frk
        |      FROM d WHERE s IS NOT NULL)
        |SELECT qid, CAST(frk - 10 AS INTEGER) AS rk, nn_id,
        |       s AS score
        |FROM r WHERE frk > 10 AND frk <= 20
        |ORDER BY qid, rk""".stripMargin,
    // multi-vector OR query: best-of-two cosine, −2 sentinel on a
    // null leg so max() semantics cannot drift between engines
    "vdb_knn_multiquery" ->
      """WITH qa AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS q1
        |            FROM embeddings WHERE vec_id < 5),
        |qb AS (SELECT vec_id - 5 AS qid, embedding::DOUBLE[] AS q2
        |       FROM embeddings WHERE vec_id >= 5 AND vec_id < 10),
        |qq AS (SELECT qid, q1, q2 FROM qa JOIN qb USING (qid)),
        |d AS (SELECT qq.qid, e.vec_id AS nn_id,
        |        greatest(
        |          coalesce(list_cosine_similarity(e.embedding::DOUBLE[],
        |            qq.q1), -2.0),
        |          coalesce(list_cosine_similarity(e.embedding::DOUBLE[],
        |            qq.q2), -2.0)) AS s
        |      FROM embeddings e CROSS JOIN qq),
        |r AS (SELECT qid, nn_id, s,
        |             row_number() OVER (PARTITION BY qid
        |               ORDER BY s DESC, nn_id) AS rk
        |      FROM d WHERE s > -1.5)
        |SELECT qid, rk, nn_id, round(s, 4) AS score
        |FROM r WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,
    "vdb_knn_filtered_eq" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
        |           FROM embeddings WHERE vec_id < 5),
        |d AS (SELECT q.qid, e.vec_id AS nn_id,
        |             list_distance(e.embedding::DOUBLE[], q.qv) AS s
        |      FROM embeddings e CROSS JOIN q WHERE e.label = 5),
        |r AS (SELECT qid, nn_id, s,
        |             row_number() OVER (PARTITION BY qid ORDER BY s ASC, nn_id) AS rk
        |      FROM d)
        |SELECT qid, rk, nn_id, round(s, 4) AS score
        |FROM r WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,
    "vdb_knn_filtered_ne" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
        |           FROM embeddings WHERE vec_id < 5),
        |d AS (SELECT q.qid, e.vec_id AS nn_id,
        |             list_distance(e.embedding::DOUBLE[], q.qv) AS s
        |      FROM embeddings e CROSS JOIN q WHERE e.label <> 5),
        |r AS (SELECT qid, nn_id, s,
        |             row_number() OVER (PARTITION BY qid ORDER BY s ASC, nn_id) AS rk
        |      FROM d)
        |SELECT qid, rk, nn_id, round(s, 4) AS score
        |FROM r WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,
    "vdb_batch_knn" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
        |           FROM embeddings WHERE vec_id % 25 = 0),
        |d AS (SELECT q.qid, e.vec_id AS nn_id,
        |             list_cosine_similarity(e.embedding::DOUBLE[], q.qv) AS s
        |      FROM embeddings e CROSS JOIN q),
        |r AS (SELECT qid, nn_id, s,
        |             row_number() OVER (PARTITION BY qid ORDER BY s DESC, nn_id) AS rk
        |      FROM d)
        |SELECT qid, rk, nn_id, round(s, 4) AS score
        |FROM r WHERE rk <= 5 ORDER BY qid, rk""".stripMargin,
    "vdb_query_by_id" ->
      """SELECT vec_id, CAST(label AS BIGINT) AS label,
        |       CAST(len(embedding) AS BIGINT) AS dim,
        |       round(sqrt(list_inner_product(embedding::DOUBLE[],
        |                                     embedding::DOUBLE[])), 4) AS norm
        |FROM embeddings WHERE vec_id IN (3, 17, 42) ORDER BY vec_id""".stripMargin,
    "vdb_upsert" ->
      """WITH log AS (
        |  SELECT vec_id AS id, CAST(label AS BIGINT) AS label,
        |         CAST(1 AS BIGINT) AS version FROM embeddings
        |  UNION ALL
        |  SELECT vec_id, CAST(label + 100 AS BIGINT), CAST(2 AS BIGINT)
        |  FROM embeddings WHERE vec_id % 7 = 0),
        |r AS (SELECT id, label, version,
        |             row_number() OVER (PARTITION BY id ORDER BY version DESC) AS rk
        |      FROM log)
        |SELECT id, label, version FROM r WHERE rk = 1 ORDER BY id""".stripMargin,
    // compare-and-set: update applies only where the base still
    // holds the expected version (id%3==1 → version 2); accepted
    // rows bump the version, rejected keys keep the base row
    "vdb_upsert_cas" ->
      """WITH base AS (SELECT vec_id AS id, CAST(label AS BIGINT) AS label,
        |                CAST(1 + vec_id % 3 AS BIGINT) AS version
        |              FROM embeddings),
        |upd AS (SELECT vec_id AS id,
        |          CAST(label + 500 AS BIGINT) AS label,
        |          CAST(2 AS BIGINT) AS expected
        |        FROM embeddings WHERE vec_id % 5 = 0),
        |acc AS (SELECT upd.id, upd.label, base.version + 1 AS version
        |        FROM upd JOIN base USING (id)
        |        WHERE base.version = upd.expected),
        |log AS (SELECT * FROM base UNION ALL SELECT * FROM acc),
        |r AS (SELECT id, label, version,
        |        row_number() OVER (PARTITION BY id
        |          ORDER BY version DESC) AS rk
        |      FROM log)
        |SELECT id, label, version FROM r WHERE rk = 1 ORDER BY id""".stripMargin,
    // SCD2 history of the 4-epoch upsert log: change-collapse via
    // lag (v3 re-asserts v2 and must vanish), intervals via lead
    "scd2_intervals" ->
      """WITH log AS (
        |  SELECT vec_id AS id, CAST(label AS BIGINT) AS label,
        |         CAST(1 AS BIGINT) AS version FROM embeddings
        |  UNION ALL
        |  SELECT vec_id, CAST(label + 100 AS BIGINT), CAST(2 AS BIGINT)
        |  FROM embeddings WHERE vec_id % 7 = 0
        |  UNION ALL
        |  SELECT vec_id, CAST(label + 100 AS BIGINT), CAST(3 AS BIGINT)
        |  FROM embeddings WHERE vec_id % 14 = 0
        |  UNION ALL
        |  SELECT vec_id, CAST(label + 300 AS BIGINT), CAST(4 AS BIGINT)
        |  FROM embeddings WHERE vec_id % 21 = 0),
        |chg AS (SELECT id, label, version,
        |          lag(label) OVER (PARTITION BY id ORDER BY version) AS prev
        |        FROM log),
        |scd AS (SELECT id, label, version AS valid_from,
        |          lead(version) OVER (PARTITION BY id ORDER BY version)
        |            AS valid_to
        |        FROM chg WHERE prev IS NULL OR prev <> label)
        |SELECT id, label, valid_from, valid_to,
        |       CAST(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS BIGINT)
        |         AS is_current
        |FROM scd ORDER BY id, valid_from""".stripMargin,
    // tombstone LWW: the 6-epoch log (4 upsert epochs + v5 delete
    // wave %5 + v6 resurrection wave %15); a key whose winner is a
    // tombstone is absent, a resurrected key carries its v6 value
    "vdb_delete" ->
      """WITH log AS (
        |  SELECT vec_id AS id, CAST(label AS BIGINT) AS label,
        |         CAST(1 AS BIGINT) AS version, 'upsert' AS op
        |  FROM embeddings
        |  UNION ALL
        |  SELECT vec_id, CAST(label + 100 AS BIGINT), 2, 'upsert'
        |  FROM embeddings WHERE vec_id % 7 = 0
        |  UNION ALL
        |  SELECT vec_id, CAST(label + 100 AS BIGINT), 3, 'upsert'
        |  FROM embeddings WHERE vec_id % 14 = 0
        |  UNION ALL
        |  SELECT vec_id, CAST(label + 300 AS BIGINT), 4, 'upsert'
        |  FROM embeddings WHERE vec_id % 21 = 0
        |  UNION ALL
        |  SELECT vec_id, CAST(NULL AS BIGINT), 5, 'delete'
        |  FROM embeddings WHERE vec_id % 5 = 0
        |  UNION ALL
        |  SELECT vec_id, CAST(label + 500 AS BIGINT), 6, 'upsert'
        |  FROM embeddings WHERE vec_id % 15 = 0),
        |r AS (SELECT id, label, version, op,
        |             row_number() OVER (PARTITION BY id
        |               ORDER BY version DESC) AS rk
        |      FROM log)
        |SELECT id, label, version FROM r
        |WHERE rk = 1 AND op <> 'delete' ORDER BY id""".stripMargin,
    // snapshot diff v≤3 → v≤6 over the tombstone log + a v4
    // late-arrival wave (%11 re-keyed +400000): two LWW states,
    // full-outer joined; value semantics (identical attrs = no row)
    "vdb_snapshot_diff" ->
      """WITH log AS (
        |  SELECT vec_id AS id, CAST(label AS BIGINT) AS label,
        |         CAST(1 AS BIGINT) AS version, 'upsert' AS op
        |  FROM embeddings
        |  UNION ALL
        |  SELECT vec_id, CAST(label + 100 AS BIGINT), 2, 'upsert'
        |  FROM embeddings WHERE vec_id % 7 = 0
        |  UNION ALL
        |  SELECT vec_id, CAST(label + 100 AS BIGINT), 3, 'upsert'
        |  FROM embeddings WHERE vec_id % 14 = 0
        |  UNION ALL
        |  SELECT vec_id, CAST(label + 300 AS BIGINT), 4, 'upsert'
        |  FROM embeddings WHERE vec_id % 21 = 0
        |  UNION ALL
        |  SELECT vec_id, CAST(NULL AS BIGINT), 5, 'delete'
        |  FROM embeddings WHERE vec_id % 5 = 0
        |  UNION ALL
        |  SELECT vec_id, CAST(label + 500 AS BIGINT), 6, 'upsert'
        |  FROM embeddings WHERE vec_id % 15 = 0
        |  UNION ALL
        |  SELECT vec_id + 400000, CAST(label + 700 AS BIGINT), 4, 'upsert'
        |  FROM embeddings WHERE vec_id % 11 = 0),
        |ra AS (SELECT id, label, version, op, row_number() OVER (
        |         PARTITION BY id ORDER BY version DESC) AS rk
        |       FROM log WHERE version <= 3),
        |sa AS (SELECT id, label AS old_label, version AS old_version
        |       FROM ra WHERE rk = 1 AND op <> 'delete'),
        |rb AS (SELECT id, label, version, op, row_number() OVER (
        |         PARTITION BY id ORDER BY version DESC) AS rk
        |       FROM log WHERE version <= 6),
        |sb AS (SELECT id, label AS new_label, version AS new_version
        |       FROM rb WHERE rk = 1 AND op <> 'delete'),
        |d AS (SELECT COALESCE(sa.id, sb.id) AS id,
        |        CASE WHEN sa.id IS NULL THEN 'added'
        |             WHEN sb.id IS NULL THEN 'deleted'
        |             WHEN old_label IS DISTINCT FROM new_label
        |               THEN 'changed' END AS change,
        |        old_label, new_label, old_version, new_version
        |      FROM sa FULL OUTER JOIN sb ON sa.id = sb.id)
        |SELECT id, change, old_label, new_label, old_version, new_version
        |FROM d WHERE change IS NOT NULL ORDER BY id""".stripMargin,
    // SCD2 with tombstones: deletes seal valid_to without opening a
    // live interval; the change-collapse compares (label, op) so a
    // resurrection always opens a fresh interval
    "scd2_tombstones" ->
      (scd2TombCtes +
        """
          |SELECT id, label, valid_from, valid_to,
          |       CAST(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS BIGINT)
          |         AS is_current
          |FROM scd WHERE op <> 'delete' ORDER BY id, valid_from"""
        .stripMargin),
    // retention at horizon 4: closed-before-horizon intervals gone,
    // open and post-horizon intervals identical to the full history
    "scd2_retention" ->
      (scd2TombCtes +
        """
          |SELECT id, label, valid_from, valid_to,
          |       CAST(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS BIGINT)
          |         AS is_current
          |FROM scd WHERE op <> 'delete'
          |  AND (valid_to IS NULL OR valid_to > 4)
          |ORDER BY id, valid_from"""
        .stripMargin),
    "vdb_remove" ->
      """SELECT CAST(label AS BIGINT) AS label,
        |       CAST(count(*) AS BIGINT) AS n,
        |       min(vec_id) AS min_id, max(vec_id) AS max_id
        |FROM embeddings e
        |WHERE NOT EXISTS (SELECT 1 FROM embeddings r
        |                  WHERE r.vec_id % 10 = 0 AND r.vec_id = e.vec_id)
        |GROUP BY 1 ORDER BY label""".stripMargin,
    "vdb_filter_index_build" ->
      """SELECT CAST(label AS BIGINT) AS label, CAST(count(*) AS BIGINT) AS card,
        |       min(vec_id) AS min_id, max(vec_id) AS max_id
        |FROM embeddings GROUP BY 1 ORDER BY label""".stripMargin,
    "vdb_snapshot_replay" ->
      """WITH agg AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |         round(sum(value), 4) AS sum_value
        |  FROM events GROUP BY user_id),
        |l AS (
        |  SELECT user_id, value FROM (
        |    SELECT user_id, value,
        |           row_number() OVER (PARTITION BY user_id
        |                              ORDER BY ts DESC, event_id DESC) AS rk
        |    FROM events) WHERE rk = 1)
        |SELECT agg.user_id, agg.n_events, agg.sum_value,
        |       round(l.value, 4) AS last_value
        |FROM agg JOIN l USING (user_id) ORDER BY user_id""".stripMargin,
    "vdb_knn_filtered_in" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
        |           FROM embeddings WHERE vec_id < 5),
        |d AS (SELECT q.qid, e.vec_id AS nn_id,
        |             list_distance(e.embedding::DOUBLE[], q.qv) AS s
        |      FROM embeddings e CROSS JOIN q WHERE e.label IN (2, 4, 6)),
        |r AS (SELECT qid, nn_id, s,
        |             row_number() OVER (PARTITION BY qid ORDER BY s ASC, nn_id)
        |               AS rk
        |      FROM d)
        |SELECT qid, rk, nn_id, round(s, 4) AS score
        |FROM r WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,
    "vdb_knn_filtered_range" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
        |           FROM embeddings WHERE vec_id < 5),
        |d AS (SELECT q.qid, e.vec_id AS nn_id,
        |             list_distance(e.embedding::DOUBLE[], q.qv) AS s
        |      FROM embeddings e CROSS JOIN q
        |      WHERE e.label BETWEEN 3 AND 6),
        |r AS (SELECT qid, nn_id, s,
        |             row_number() OVER (PARTITION BY qid ORDER BY s ASC, nn_id)
        |               AS rk
        |      FROM d)
        |SELECT qid, rk, nn_id, round(s, 4) AS score
        |FROM r WHERE rk <= 10 ORDER BY qid, rk""".stripMargin,
    "doc_semantic_search" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
        |           FROM embeddings WHERE vec_id % 100 = 0),
        |d AS (SELECT q.qid, e.vec_id AS nn_id,
        |             list_cosine_similarity(e.embedding::DOUBLE[], q.qv) AS s
        |      FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.qid),
        |r AS (SELECT qid, nn_id, s,
        |             row_number() OVER (PARTITION BY qid ORDER BY s DESC, nn_id)
        |               AS rk
        |      FROM d)
        |SELECT r.qid, r.rk, r.nn_id, round(r.s, 4) AS score,
        |       doc.lang AS lang, doc.source AS source
        |FROM r JOIN documents doc ON r.nn_id = doc.doc_id
        |WHERE r.rk <= 5 ORDER BY r.qid, r.rk""".stripMargin,
    "q4_semi" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
        |FROM orders o
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_returnflag = 'R')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q6_filter_agg" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       round(sum(l_extendedprice), 2) AS sum_base_price,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        |       round(avg(l_quantity), 4) AS avg_qty,
        |       round(avg(l_extendedprice), 4) AS avg_price,
        |       round(avg(l_discount), 4) AS avg_disc,
        |       CAST(count(*) AS BIGINT) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-12-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_join" ->
      """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
        |       o_orderpriority,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    // the Bloom prefilter has no false negatives and the join removes
    // its false positives, so the oracle is the PLAIN join — result
    // equality proves the prefilter is a pure pruning step
    // deterministic textbook bloom (bit_j = md5_60(j|key) mod m),
    // measured FPR on disjoint probes vs (1-(1-1/m)^kn)^k
    "bloom_fpr_report" ->
      """WITH mem AS (SELECT c_custkey AS key FROM customer),
        |nb AS (SELECT CAST(count(*) AS BIGINT) AS n FROM mem),
        |js AS (SELECT unnest(range(0, 6)) AS j),
        |ks AS (SELECT unnest(range(1, 7)) AS k),
        |bits AS (SELECT DISTINCT js.j,
        |           CAST('0x' || substr(md5(CAST(js.j AS VARCHAR) || '|'
        |             || CAST(mem.key AS VARCHAR)), 1, 15) AS BIGINT)
        |             % 16384 AS bit
        |         FROM mem CROSS JOIN js),
        |bk AS (SELECT DISTINCT ks.k, bits.bit
        |       FROM ks JOIN bits ON bits.j < ks.k),
        |sb AS (SELECT k, CAST(count(*) AS BIGINT) AS n_bits_set
        |       FROM bk GROUP BY 1),
        |pr0 AS (SELECT key + 10000000 AS key FROM mem),
        |pb AS (SELECT ks.k, p.key, js.j,
        |         CAST('0x' || substr(md5(CAST(js.j AS VARCHAR) || '|'
        |           || CAST(p.key AS VARCHAR)), 1, 15) AS BIGINT)
        |           % 16384 AS bit
        |       FROM pr0 p CROSS JOIN js JOIN ks ON js.j < ks.k),
        |hit AS (SELECT pb.k, pb.key FROM pb
        |        JOIN bk ON bk.k = pb.k AND bk.bit = pb.bit
        |        GROUP BY pb.k, pb.key HAVING count(*) = pb.k),
        |fp AS (SELECT k, CAST(count(*) AS BIGINT) AS fp_hits
        |       FROM hit GROUP BY 1)
        |SELECT ks.k AS k, nb.n AS n_keys,
        |       CAST(coalesce(sb.n_bits_set, 0) AS BIGINT) AS n_bits_set,
        |       CAST(coalesce(fp.fp_hits, 0) AS BIGINT) AS fp_hits,
        |       round(CAST(coalesce(fp.fp_hits, 0) AS DOUBLE) / nb.n, 4)
        |         AS measured_fpr,
        |       round(power(1 - power(CAST(1 AS DOUBLE)
        |           - CAST(1 AS DOUBLE) / 16384, ks.k * nb.n), ks.k), 4)
        |         AS theory_fpr
        |FROM ks LEFT JOIN sb ON ks.k = sb.k
        |LEFT JOIN fp ON ks.k = fp.k CROSS JOIN nb
        |ORDER BY k""".stripMargin,
    "bloom_prefilter_join" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_items,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q5_join" ->
      """SELECT n_name,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    "q7_volume" ->
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        |       CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
        |    OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
        |GROUP BY 1, 2, 3
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,
    "q8_market_share" ->
      """WITH mkt AS (SELECT c_custkey FROM customer
        |             JOIN nation ON c_nationkey = n_nationkey
        |             JOIN region ON n_regionkey = r_regionkey
        |             WHERE r_name = 'ASIA')
        |SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |       round(sum(CASE WHEN n_name = 'NATION_3'
        |                      THEN l_extendedprice * (1 - l_discount)
        |                      ELSE 0 END)
        |             / sum(l_extendedprice * (1 - l_discount)), 4)
        |         AS mkt_share
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY'
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE o_custkey IN (SELECT c_custkey FROM mkt)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // gap fill: dense type×calendar grid built FROM the data bounds
    // (unnest(range(lo, hi+1)) — an expression, so column args are
    // fine where generate_series's table function rejects laterals;
    // a fixed literal window would silently truncate if the driver
    // regenerated events outside it), zero-filled counts, 7-day
    // trailing mean
    // over the FILLED series (≤7-int sum/count — exact both engines)
    // per-user feature table on the dense calendar: all-integer
    // lag/rolling/recency features
    "events_user_features" ->
      """WITH e AS (SELECT user_id,
        |             CAST(ts AS DATE) - DATE '1970-01-01' AS d
        |           FROM events),
        |b AS (SELECT min(d) AS lo, max(d) AS hi FROM e),
        |cal AS (SELECT unnest(range(lo, hi + 1)) AS d FROM b),
        |us AS (SELECT DISTINCT user_id FROM e),
        |daily AS (SELECT user_id, d, CAST(count(*) AS BIGINT) AS n
        |          FROM e GROUP BY 1, 2),
        |g AS (SELECT us.user_id, cal.d, coalesce(daily.n, 0) AS n
        |      FROM us CROSS JOIN cal
        |      LEFT JOIN daily ON daily.user_id = us.user_id
        |                     AND daily.d = cal.d),
        |f AS (SELECT user_id, d, n,
        |        coalesce(lag(n, 1) OVER pw, 0) AS lag1,
        |        sum(n) OVER (PARTITION BY user_id ORDER BY d
        |          ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS roll7,
        |        max(CASE WHEN n > 0 THEN d END) OVER
        |          (PARTITION BY user_id ORDER BY d
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |          AS la
        |      FROM g WINDOW pw AS (PARTITION BY user_id ORDER BY d))
        |SELECT user_id,
        |       CAST(DATE '1970-01-01' + CAST(d AS INTEGER) AS VARCHAR)
        |         AS day,
        |       CAST(n AS BIGINT) AS n, CAST(lag1 AS BIGINT) AS lag1,
        |       CAST(roll7 AS BIGINT) AS roll7,
        |       CAST(coalesce(d - la, -1) AS BIGINT) AS days_since_active
        |FROM f ORDER BY user_id, day""".stripMargin,
    "events_gap_fill" ->
      """WITH ev AS (SELECT event_type,
        |              CAST(ts AS DATE) - DATE '1970-01-01' AS d, value
        |            FROM events),
        |b AS (SELECT min(d) AS lo, max(d) AS hi FROM ev),
        |cal AS (SELECT unnest(range(lo, hi + 1)) AS d FROM b),
        |ty AS (SELECT DISTINCT event_type FROM ev),
        |daily AS (SELECT event_type, d, CAST(count(*) AS BIGINT) AS n
        |          FROM ev WHERE value > 300 GROUP BY 1, 2),
        |dense AS (SELECT ty.event_type, cal.d,
        |            coalesce(daily.n, 0) AS n
        |          FROM ty CROSS JOIN cal
        |          LEFT JOIN daily ON daily.event_type = ty.event_type
        |                         AND daily.d = cal.d)
        |SELECT event_type,
        |       CAST(DATE '1970-01-01' + CAST(d AS INTEGER) AS VARCHAR)
        |         AS day,
        |       n,
        |       round(avg(n) OVER (PARTITION BY event_type ORDER BY d
        |                          ROWS BETWEEN 6 PRECEDING
        |                          AND CURRENT ROW), 4) AS ma7
        |FROM dense ORDER BY event_type, day""".stripMargin,
    // pivot mirror: explicit-value conditional aggregation
    "events_pivot" ->
      """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        |       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
        |       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        |       CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        |       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin,
    // truncated EWMA (α=1/2, 14-day) as a banded self-join on the
    // dense grid; power-of-two weights keep num/den exact BIGINTs
    "events_ewma" ->
      """WITH ev AS (SELECT event_type,
        |              CAST(ts AS DATE) - DATE '1970-01-01' AS d
        |            FROM events),
        |b AS (SELECT min(d) AS lo, max(d) AS hi FROM ev),
        |cal AS (SELECT unnest(range(lo, hi + 1)) AS d FROM b),
        |ty AS (SELECT DISTINCT event_type FROM ev),
        |daily AS (SELECT event_type, d, CAST(count(*) AS BIGINT) AS n
        |          FROM ev GROUP BY 1, 2),
        |dense AS (SELECT ty.event_type, cal.d,
        |            coalesce(daily.n, 0) AS n
        |          FROM ty CROSS JOIN cal
        |          LEFT JOIN daily ON daily.event_type = ty.event_type
        |                         AND daily.d = cal.d),
        |w AS (SELECT a.event_type, a.d,
        |        CAST(sum(r.n * (1::BIGINT
        |          << CAST(13 - (a.d - r.d) AS INTEGER))) AS BIGINT) AS num,
        |        CAST(sum(1::BIGINT
        |          << CAST(13 - (a.d - r.d) AS INTEGER)) AS BIGINT) AS den
        |      FROM dense a JOIN dense r ON a.event_type = r.event_type
        |        AND r.d BETWEEN a.d - 13 AND a.d
        |      GROUP BY 1, 2)
        |SELECT event_type,
        |       CAST(DATE '1970-01-01' + CAST(d AS INTEGER) AS VARCHAR)
        |         AS day,
        |       round(num * 1.0 / den, 4) AS ewma
        |FROM w ORDER BY event_type, day""".stripMargin,
    "events_rollup_cube" ->
      """WITH e AS (SELECT event_type,
        |             strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |             value
        |           FROM events)
        |SELECT coalesce(event_type, 'ALL') AS event_type,
        |       coalesce(day, 'ALL') AS day,
        |       CAST(count(*) AS BIGINT) AS n, round(sum(value), 4) AS sv
        |FROM e GROUP BY ROLLUP(event_type, day)
        |ORDER BY event_type, day""".stripMargin,
    "q13_order_dist" ->
      """WITH pc AS (SELECT c_custkey,
        |              CAST(count(o_orderkey) AS BIGINT) AS c_count
        |            FROM customer
        |            LEFT OUTER JOIN orders ON c_custkey = o_custkey
        |            GROUP BY 1)
        |SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        |FROM pc GROUP BY 1
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    // Q15 shape: revenue view + argmax row(s); revenue rounded to 2dp
    // BEFORE the max/equality on both sides so argmax ties are decided
    // on printed cents, not last-ulp sum noise
    "q15_top_supplier" ->
      """WITH rev AS (SELECT l_suppkey,
        |               round(sum(l_extendedprice * (1 - l_discount)), 2)
        |                 AS total_revenue
        |             FROM lineitem
        |             WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |               AND l_shipdate < TIMESTAMP '1996-04-01'
        |             GROUP BY 1)
        |SELECT s.s_suppkey, s.s_name, r.total_revenue
        |FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey
        |WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
        |ORDER BY s.s_suppkey""".stripMargin,
    // Q17 shape: correlated scalar subquery (DuckDB decorrelates it
    // the same way the Spark side does by hand)
    "q17_small_qty" ->
      """SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
        |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE p.p_brand = 'Brand#3' AND p.p_size <= 25
        |  AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
        |                      FROM lineitem l2
        |                      WHERE l2.l_partkey = l.l_partkey)""".stripMargin,
    // weekly cohort retention: Monday-truncated weeks on both engines,
    // weeks_since is exact integer day arithmetic
    "events_retention" ->
      """WITH f AS (SELECT user_id,
        |             CAST(date_trunc('week', min(ts)) AS DATE)
        |               AS cohort_week
        |           FROM events GROUP BY 1),
        |a AS (SELECT DISTINCT user_id,
        |             CAST(date_trunc('week', ts) AS DATE) AS week
        |      FROM events),
        |g AS (SELECT f.cohort_week,
        |             CAST(date_diff('day', f.cohort_week, a.week) // 7
        |               AS BIGINT) AS weeks_since,
        |             CAST(count(*) AS BIGINT) AS n_users
        |      FROM f JOIN a ON f.user_id = a.user_id
        |      GROUP BY 1, 2),
        |cs AS (SELECT cohort_week, n_users AS cohort_n
        |       FROM g WHERE weeks_since = 0)
        |SELECT g.cohort_week, g.weeks_since, g.n_users,
        |       round(CAST(g.n_users AS DOUBLE) / cs.cohort_n, 4)
        |         AS retention
        |FROM g JOIN cs ON g.cohort_week = cs.cohort_week
        |ORDER BY g.cohort_week, g.weeks_since""".stripMargin,
    "q18_large_orders" ->
      """WITH big AS (SELECT l_orderkey, sum(l_quantity) AS total_qty
        |             FROM lineitem GROUP BY 1
        |             HAVING sum(l_quantity) > 300)
        |SELECT c_name, c_custkey, o_orderkey,
        |       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
        |       round(o_totalprice, 2) AS o_totalprice,
        |       round(total_qty, 2) AS total_qty
        |FROM big
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,
    // Q16 shape: lineitem as the part↔supplier relation, acctbal<0 as
    // the complaint filter; distinct-count + NOT IN anti-join
    // Q9 shape: profit = net revenue minus a 20%-discounted retail
    // unit cost (driver schema has no partsupp)
    "q9_profit" ->
      """SELECT n.n_name AS nation,
        |       CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
        |       round(sum(l.l_extendedprice * (1 - l.l_discount)
        |                 - 0.8 * p.p_retailprice * l.l_quantity), 2)
        |         AS sum_profit
        |FROM lineitem l
        |JOIN part p ON l.l_partkey = p.p_partkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE p.p_name LIKE '%widget%'
        |GROUP BY 1, 2
        |ORDER BY nation, o_year DESC""".stripMargin,
    // Q11 shape: per-part value vs 1.5× the global mean (scalar
    // threshold from the same aggregate, not a second scan)
    "q11_important_parts" ->
      """WITH pv AS (SELECT l_partkey AS p_partkey,
        |                   sum(l_extendedprice) AS value
        |            FROM lineitem GROUP BY 1),
        |t AS (SELECT avg(value) AS mv FROM pv)
        |SELECT p_partkey, round(value, 2) AS value
        |FROM pv, t WHERE value > mv * 1.5
        |ORDER BY value DESC, p_partkey""".stripMargin,
    // Q12 shape: late shipments (> 60 days after order) split into
    // critical vs other priorities per line status
    "q12_late_priority" ->
      """SELECT l.l_linestatus,
        |       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // market-basket pairs over customer baskets: frequent items
    // first (apriori prune), in-basket equi-join pair expansion,
    // lift/confidence from exact integer counts
    // item-item CF: basket-cosine n_both/sqrt(na*nb) from exact
    // counts, top-3 per part ranked on the 4dp-rounded score
    "part_item_cf" ->
      """WITH baskets AS (SELECT DISTINCT o.o_custkey AS cust,
        |                   l.l_partkey AS part
        |                 FROM lineitem l
        |                 JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |sup AS (SELECT part, CAST(count(*) AS BIGINT) AS n
        |        FROM baskets GROUP BY 1),
        |freq AS (SELECT part, n FROM sup WHERE n >= 20),
        |fb0 AS (SELECT b.cust, b.part,
        |          row_number() OVER (PARTITION BY b.cust
        |                             ORDER BY f.n DESC, b.part) AS crk
        |        FROM baskets b JOIN freq f USING (part)),
        |fb AS (SELECT cust, part FROM fb0 WHERE crk <= 64),
        |pr AS (SELECT a.part AS part_a, b.part AS part_b,
        |         CAST(count(*) AS BIGINT) AS n_both
        |       FROM fb a JOIN fb b ON a.cust = b.cust AND a.part < b.part
        |       GROUP BY 1, 2 HAVING count(*) >= 5),
        |sym AS (SELECT part_a AS part, part_b AS nbr, n_both FROM pr
        |        UNION ALL SELECT part_b, part_a, n_both FROM pr),
        |sc AS (SELECT sym.part, sym.nbr, sym.n_both,
        |         round(CAST(sym.n_both AS DOUBLE)
        |           / sqrt(CAST(sa.n AS DOUBLE) * sb.n), 4) AS score
        |       FROM sym JOIN sup sa ON sym.part = sa.part
        |       JOIN sup sb ON sym.nbr = sb.part),
        |rk AS (SELECT part, nbr, n_both, score,
        |         row_number() OVER (PARTITION BY part
        |                            ORDER BY score DESC, nbr) AS rk
        |       FROM sc)
        |SELECT part, rk, nbr, n_both, score FROM rk WHERE rk <= 3
        |ORDER BY part, rk""".stripMargin,
    // per-part OLS slope from five exact integer moments, top-20
    // movers ranked on the unrounded slope with part tiebreak
    "part_trend_slope" ->
      """WITH li AS (SELECT l_partkey AS part,
        |              CAST(year(l_shipdate) * 12 + month(l_shipdate) - 1
        |                AS BIGINT) AS mx,
        |              CAST(round(l_extendedprice * (1 - l_discount) * 100)
        |                AS BIGINT) AS cents
        |            FROM lineitem),
        |mo AS (SELECT part, mx, CAST(sum(cents) AS BIGINT) AS y
        |       FROM li GROUP BY 1, 2),
        |ag AS (SELECT part, CAST(count(*) AS BIGINT) AS nm,
        |         CAST(sum(mx) AS BIGINT) AS sx,
        |         CAST(sum(y) AS BIGINT) AS sy,
        |         CAST(sum(mx * y) AS BIGINT) AS sxy,
        |         CAST(sum(mx * mx) AS BIGINT) AS sxx
        |       FROM mo GROUP BY 1 HAVING count(*) >= 6),
        |sc AS (SELECT part, nm, sy,
        |         CAST(nm * sxy - sx * sy AS DOUBLE)
        |           / CAST(nm * sxx - sx * sx AS DOUBLE) AS sl
        |       FROM ag),
        |top AS (SELECT * FROM sc ORDER BY sl DESC, part LIMIT 20)
        |SELECT part, nm AS n_months,
        |       round(CAST(sy AS DOUBLE) / nm / 100, 4) AS mean_rev,
        |       round(sl / 100, 4) AS slope
        |FROM top ORDER BY slope DESC, part""".stripMargin,
    "basket_pairs" ->
      """WITH baskets AS (SELECT DISTINCT o.o_custkey AS cust,
        |                   l.l_partkey AS part
        |                 FROM lineitem l
        |                 JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |nb AS (SELECT CAST(count(DISTINCT cust) AS BIGINT) AS nb
        |       FROM baskets),
        |sup AS (SELECT part, CAST(count(*) AS BIGINT) AS n
        |        FROM baskets GROUP BY 1),
        |freq AS (SELECT part, n FROM sup WHERE n >= 20),
        |fb0 AS (SELECT b.cust, b.part,
        |          row_number() OVER (PARTITION BY b.cust
        |                             ORDER BY f.n DESC, b.part) AS crk
        |        FROM baskets b JOIN freq f USING (part)),
        |fb AS (SELECT cust, part FROM fb0 WHERE crk <= 64),
        |pr AS (SELECT a.part AS part_a, b.part AS part_b,
        |         CAST(count(*) AS BIGINT) AS n_both
        |       FROM fb a JOIN fb b ON a.cust = b.cust AND a.part < b.part
        |       GROUP BY 1, 2 HAVING count(*) >= 5)
        |SELECT pr.part_a, pr.part_b, pr.n_both,
        |       round(pr.n_both * 1.0 * nb.nb / (sa.n * 1.0 * sb.n), 4)
        |         AS lift,
        |       round(pr.n_both * 1.0 / sa.n, 4) AS conf_ab
        |FROM pr JOIN sup sa ON pr.part_a = sa.part
        |JOIN sup sb ON pr.part_b = sb.part CROSS JOIN nb
        |ORDER BY lift DESC, part_a, part_b LIMIT 20""".stripMargin,
    // Wilson lower bound on per-supplier on-time rate (q12 lateness
    // convention); z=1.96 forced through DOUBLE (a bare 1.96 literal
    // is DECIMAL in DuckDB — decimal arithmetic would diverge from
    // the double expression tree)
    "supplier_wilson" ->
      """WITH g AS (SELECT l.l_suppkey AS s_suppkey,
        |             CAST(count(*) AS BIGINT) AS n,
        |             CAST(sum(CASE WHEN l.l_shipdate <=
        |                 o.o_orderdate + INTERVAL 60 DAY
        |               THEN 1 ELSE 0 END) AS BIGINT) AS ontime
        |           FROM lineitem l
        |           JOIN orders o ON l.l_orderkey = o.o_orderkey
        |           GROUP BY 1),
        |w AS (SELECT s_suppkey, n, ontime, ontime * 1.0 / n AS p
        |      FROM g)
        |SELECT w.s_suppkey, s.s_name, w.n, w.ontime,
        |       round(w.p, 4) AS ontime_rate,
        |       round((w.p
        |           + (CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE))
        |             / (w.n * 2)
        |           - CAST(1.96 AS DOUBLE) * sqrt(w.p * (1.0 - w.p) / w.n
        |             + (CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE))
        |               / (w.n * w.n * 4)))
        |         / (1.0 + (CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE))
        |             / w.n), 6) AS wilson_lb
        |FROM w JOIN supplier s ON w.s_suppkey = s.s_suppkey
        |ORDER BY wilson_lb DESC, w.s_suppkey LIMIT 20""".stripMargin,
    // Zipf OLS from micro-unit-quantized logs summed as exact longs
    "corpus_zipf_fit" ->
      """WITH c AS (SELECT t, CAST(count(*) AS BIGINT) AS n
        |           FROM (SELECT unnest(string_split(text, ' ')) AS t
        |                 FROM documents) GROUP BY t),
        |top AS (SELECT n, row_number() OVER (ORDER BY n DESC, t) AS r
        |        FROM c ORDER BY n DESC, t LIMIT 100),
        |u AS (SELECT CAST(round(ln(r) * 1000000) AS BIGINT) AS x,
        |             CAST(round(ln(n) * 1000000) AS BIGINT) AS y
        |      FROM top),
        |sagg AS (SELECT CAST(count(*) AS BIGINT) AS k, sum(x) AS sx,
        |                sum(y) AS sy, sum(x * y) AS sxy,
        |                sum(x * x) AS sxx, sum(y * y) AS syy
        |         FROM u)
        |SELECT k AS n_terms,
        |  round((k * sxy - sx * sy) * 1.0 / (k * sxx - sx * sx), 4)
        |    AS slope,
        |  round((sy * 1.0 / k - ((k * sxy - sx * sy) * 1.0
        |    / (k * sxx - sx * sx)) * sx / k) / 1000000.0, 4)
        |    AS intercept,
        |  round(((k * sxy - sx * sy) * 1.0 * (k * sxy - sx * sy))
        |    / ((k * sxx - sx * sx) * 1.0 * (k * syy - sy * sy)), 4)
        |    AS r2
        |FROM sagg""".stripMargin,
    // SymSpell deletion blocking + exact levenshtein verify
    "part_fuzzy_terms" ->
      """WITH w AS (SELECT t, CAST(count(*) AS BIGINT) AS n
        |           FROM (SELECT unnest(string_split(p_name, ' ')) AS t
        |                 FROM part) GROUP BY t),
        |k AS (SELECT t, n, unnest(list_distinct(list_append(
        |        list_transform(range(1, length(t) + 1),
        |          i -> substr(t, 1, i - 1) || substr(t, i + 1)),
        |        t))) AS k
        |      FROM w),
        |p AS (SELECT DISTINCT x.t AS term_a, y.t AS term_b,
        |             x.n AS n_a, y.n AS n_b
        |      FROM k x JOIN k y ON x.k = y.k AND x.t < y.t)
        |SELECT term_a, term_b, n_a, n_b FROM p
        |WHERE levenshtein(term_a, term_b) = 1
        |ORDER BY term_a, term_b""".stripMargin,
    // hour-of-week heatmap: ISO dow both engines (Spark weekday+1)
    "events_heatmap" ->
      """WITH ev AS (SELECT isodow(ts) AS dow,
        |             CAST(hour(ts) AS BIGINT) AS hour FROM events),
        |t AS (SELECT CAST(count(*) AS DOUBLE) AS nt FROM ev)
        |SELECT CAST(dow AS BIGINT) AS dow, hour,
        |       CAST(count(*) AS BIGINT) AS n,
        |       round(count(*) / t.nt, 6) AS share
        |FROM ev, t GROUP BY 1, 2, t.nt
        |ORDER BY dow, hour""".stripMargin,
    // quantization-ladder fidelity: per-row cosine(v, recon) in 4dp
    // integer micro-units (fold-order-proof), reconstructions from
    // the same trained constants each codec's search mirror uses
    "embed_quant_error" ->
      s"""WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v
         |           FROM embeddings),
         |dims AS (SELECT i, min(v[i]) AS mn, max(v[i]) AS mx
         |         FROM e, (SELECT unnest(range(1, 65)) AS i) GROUP BY i),
         |mm AS (SELECT list(mn ORDER BY i) AS mns,
         |              list(mx ORDER BY i) AS mxs FROM dims),
         |mud AS (SELECT i, round(avg(v[i]), 6) AS mu
         |        FROM e, (SELECT unnest(range(1, 65)) AS i) GROUP BY i),
         |mus AS (SELECT list(mu ORDER BY i) AS m FROM mud),
         |$pqCtes,
         |sqm AS (SELECT CAST(round(list_cosine_similarity(e.v,
         |          list_transform(range(1, 65), i -> mm.mns[i] +
         |            (CASE WHEN mm.mxs[i] - mm.mns[i] <= 0 THEN 0.0
         |             ELSE least(255.0, greatest(0.0,
         |               round((e.v[i] - mm.mns[i])
         |                 / (mm.mxs[i] - mm.mns[i]) * 255.0))) END)
         |            * (mm.mxs[i] - mm.mns[i]) / 255.0))
         |          * 10000) AS BIGINT) AS micro
         |        FROM e, mm),
         |bqm AS (SELECT CAST(round(list_cosine_similarity(e.v,
         |          list_transform(range(1, 65), i ->
         |            CASE WHEN e.v[i] > mus.m[i]
         |                 THEN 1.0 ELSE -1.0 END)) * 10000) AS BIGINT)
         |          AS micro
         |        FROM e, mus),
         |pqm AS (SELECT CAST(round(list_cosine_similarity(e.v, prec.rv)
         |          * 10000) AS BIGINT) AS micro
         |        FROM e JOIN prec ON e.id = prec.id),
         |u AS (SELECT 'bq' AS method, CAST(count(*) AS BIGINT) AS n_vecs,
         |             sum(micro) AS ms FROM bqm
         |      UNION ALL SELECT 'pq', CAST(count(*) AS BIGINT),
         |             sum(micro) FROM pqm
         |      UNION ALL SELECT 'sq8', CAST(count(*) AS BIGINT),
         |             sum(micro) FROM sqm)
         |SELECT method, n_vecs,
         |       round(ms * 1.0 / n_vecs / 10000.0, 6) AS avg_cosine
         |FROM u ORDER BY method""".stripMargin,
    // lead-time distribution from exact integer day moments
    "supplier_lead_time" ->
      """WITH d AS (SELECT l.l_suppkey AS s_suppkey,
        |        date_diff('day', CAST(o.o_orderdate AS DATE),
        |          CAST(l.l_shipdate AS DATE)) AS days
        |      FROM lineitem l
        |      JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |g AS (SELECT s_suppkey, CAST(count(*) AS BIGINT) AS n,
        |        sum(days) AS sd, sum(days * days) AS sq,
        |        CAST(max(days) AS BIGINT) AS max_days
        |      FROM d GROUP BY 1 HAVING count(*) >= 2)
        |SELECT s_suppkey, n,
        |       round(sd * 1.0 / n, 2) AS mean_days,
        |       round(sqrt((sq * 1.0 * n - sd * 1.0 * sd)
        |         / (n * 1.0 * (n - 1))), 2) AS sd_days,
        |       max_days
        |FROM g ORDER BY s_suppkey""".stripMargin,
    // RFM: per-dimension exact global quartile by (value, custkey);
    // the banded two-level rank on the Spark side reproduces exactly
    // this total order (band is monotone in the value). Money sums
    // as integer cents — fold-order-proof (see Analytics.customerRfm)
    "customer_rfm" ->
      """WITH per AS (SELECT o_custkey AS custkey,
        |        max(CAST(o_orderdate AS DATE)) AS last_order,
        |        count(*) AS frequency,
        |        sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS cents
        |      FROM orders GROUP BY 1),
        |mx AS (SELECT max(CAST(o_orderdate AS DATE)) AS mxd FROM orders),
        |r AS (SELECT custkey,
        |        date_diff('day', last_order, mxd) AS recency_days,
        |        frequency,
        |        round(cents / 100.0, 2) AS monetary
        |      FROM per, mx),
        |k AS (SELECT *,
        |        row_number() OVER (ORDER BY recency_days, custkey) AS rr,
        |        row_number() OVER (ORDER BY frequency, custkey) AS fr,
        |        row_number() OVER (ORDER BY monetary, custkey) AS mr,
        |        count(*) OVER () AS n
        |      FROM r)
        |SELECT custkey, CAST(recency_days AS BIGINT) AS recency_days,
        |       CAST(frequency AS BIGINT) AS frequency, monetary,
        |       CAST((rr - 1) * 4 // n + 1 AS BIGINT) AS r_q,
        |       CAST((fr - 1) * 4 // n + 1 AS BIGINT) AS f_q,
        |       CAST((mr - 1) * 4 // n + 1 AS BIGINT) AS m_q,
        |       CAST(((rr - 1) * 4 // n + 1) * 100
        |         + ((fr - 1) * 4 // n + 1) * 10
        |         + ((mr - 1) * 4 // n + 1) AS BIGINT) AS rfm_cell
        |FROM k ORDER BY custkey""".stripMargin,
    // boilerplate: trigram doc-frequency tail at a 1%-of-corpus bar,
    // per-doc occurrence rollup (left join keeps sub-trigram docs)
    "text_boilerplate" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws
        |           FROM documents),
        |g AS (SELECT doc_id, concat_ws(' ', list_slice(ws, i, i + 2)) AS gram
        |      FROM d, unnest(range(1, len(ws) - 1)) AS t(i)
        |      WHERE len(ws) >= 3),
        |nd AS (SELECT CAST(count(*) AS DOUBLE) AS nd FROM documents),
        |bo AS (SELECT gram FROM g GROUP BY gram
        |       HAVING count(DISTINCT doc_id) >=
        |         (SELECT ceil(nd * 0.01) FROM nd)),
        |per AS (SELECT doc_id, count(*) AS n_grams,
        |          count(*) FILTER (WHERE gram IN (SELECT gram FROM bo))
        |            AS n_boiler
        |        FROM g GROUP BY doc_id)
        |SELECT d2.doc_id,
        |       CAST(coalesce(per.n_grams, 0) AS BIGINT) AS n_grams,
        |       CAST(coalesce(per.n_boiler, 0) AS BIGINT) AS n_boiler,
        |       coalesce(round(per.n_boiler * 1.0 / per.n_grams, 4), 0.0)
        |         AS boiler_ratio
        |FROM documents d2 LEFT JOIN per ON d2.doc_id = per.doc_id
        |ORDER BY d2.doc_id""".stripMargin,
    // Q2 shape: per-part min 2dp mean unit price among EUROPE
    // suppliers, argmin join-back returns every achieving supplier
    "q2_min_cost" ->
      """WITH es AS (SELECT s.s_suppkey, s.s_name, n.n_name
        |            FROM supplier s
        |            JOIN nation n ON s.s_nationkey = n.n_nationkey
        |            JOIN region r ON n.n_regionkey = r.r_regionkey
        |            WHERE r.r_name = 'EUROPE'),
        |sp AS (SELECT p_partkey, p_name FROM part
        |       WHERE p_type = 'SMALL' AND p_size < 15),
        |c AS (SELECT sp.p_partkey, sp.p_name, es.s_suppkey, es.s_name,
        |             es.n_name,
        |             round(avg(l.l_extendedprice / l.l_quantity), 2) AS cost
        |      FROM lineitem l
        |      JOIN sp ON l.l_partkey = sp.p_partkey
        |      JOIN es ON l.l_suppkey = es.s_suppkey
        |      GROUP BY 1, 2, 3, 4, 5),
        |m AS (SELECT p_partkey AS mk, min(cost) AS min_cost
        |      FROM c GROUP BY 1)
        |SELECT c.p_partkey, c.p_name, c.s_name, c.n_name, c.cost
        |FROM c JOIN m ON c.p_partkey = m.mk AND c.cost = m.min_cost
        |ORDER BY c.p_partkey, c.s_name""".stripMargin,
    "q16_supplier_cnt" ->
      """SELECT p.p_type,
        |       CAST(p.p_size - (p.p_size % 10) AS BIGINT) AS size_band,
        |       CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM lineitem l
        |JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE p.p_type <> 'PROMO' AND p.p_size <= 30
        |  AND l.l_suppkey NOT IN
        |      (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2
        |ORDER BY supplier_cnt DESC, p_type, size_band""".stripMargin,
    // Q20 shape: part filter → per-(part,supp) agg → per-part mean
    // threshold → distinct qualifying suppliers → dim join
    "q20_excess_supply" ->
      """WITH sh AS (SELECT l_partkey, l_suppkey,
        |              sum(l_quantity) AS qty
        |            FROM lineitem
        |            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |              AND l_shipdate < TIMESTAMP '1997-01-01'
        |              AND l_partkey IN
        |                  (SELECT p_partkey FROM part
        |                   WHERE p_type = 'SMALL')
        |            GROUP BY 1, 2),
        |pp AS (SELECT l_partkey, sum(qty) / count(*) AS avg_qty
        |       FROM sh GROUP BY 1),
        |q AS (SELECT DISTINCT sh.l_suppkey
        |      FROM sh JOIN pp ON sh.l_partkey = pp.l_partkey
        |      WHERE sh.qty > pp.avg_qty * 2.0)
        |SELECT s.s_suppkey, s.s_name, n.n_name
        |FROM supplier s
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |WHERE s.s_suppkey IN (SELECT l_suppkey FROM q)
        |ORDER BY s.s_suppkey""".stripMargin,
    // DAU/WAU stickiness: Monday-truncated weeks (the retention
    // discipline), exact BIGINT counts, divisions only at the end
    "events_stickiness" ->
      """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day,
        |              CAST(date_trunc('week', ts) AS DATE) AS week
        |            FROM events),
        |dau AS (SELECT week, day, CAST(count(*) AS BIGINT) AS dau
        |        FROM (SELECT DISTINCT user_id, day, week FROM ev)
        |        GROUP BY 1, 2),
        |wk AS (SELECT week, CAST(count(*) AS BIGINT) AS wau
        |       FROM (SELECT DISTINCT user_id, week FROM ev)
        |       GROUP BY 1),
        |d AS (SELECT week, CAST(sum(dau) AS BIGINT) AS sum_dau,
        |             CAST(count(*) AS BIGINT) AS n_days
        |      FROM dau GROUP BY 1)
        |SELECT CAST(d.week AS VARCHAR) AS week, d.n_days, wk.wau,
        |       round(CAST(d.sum_dau AS DOUBLE) / d.n_days, 4) AS avg_dau,
        |       round(CAST(d.sum_dau AS DOUBLE) / (d.n_days * wk.wau), 4)
        |         AS stickiness
        |FROM d JOIN wk ON d.week = wk.week
        |ORDER BY week""".stripMargin,
    "q14_promo" ->
      """SELECT round(
        |  sum(CASE WHEN p_type = 'PROMO'
        |        THEN l_extendedprice * (1 - l_discount) ELSE 0 END) * 100.0
        |  / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue_pct
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1996-07-01'""".stripMargin,
    "q10_returned" ->
      """SELECT c_custkey, c_name,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |       round(any_value(c_acctbal), 2) AS c_acctbal
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE l_returnflag = 'R'
        |GROUP BY c_custkey, c_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q19_disc_rev" ->
      """SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 1 AND 30)
        |   OR (p_brand = 'Brand#7' AND p_size BETWEEN 10 AND 30
        |       AND l_quantity BETWEEN 10 AND 40)""".stripMargin,
    // incremental near-dedup: batch (planted +200000 near-dups) bands
    // joined against corpus bands — candidates are CROSS pairs only
    "dedup_incremental" ->
      s"""WITH docs AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 200000, text || ' zzyzx'
         |  FROM documents WHERE doc_id % 9 = 0),
         |${bandCteFrom("docs")},
         |cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
         |         FROM bk a JOIN bk b ON a.band = b.band
         |           AND a.band_key = b.band_key
         |         WHERE a.doc_id >= 200000 AND b.doc_id < 200000),
         |shx AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
         |card AS (SELECT doc_id, count(*) AS c FROM shx GROUP BY 1),
         |inter AS (SELECT x.doc_id AS id1, y.doc_id AS id2, count(*) AS n
         |          FROM shx x JOIN shx y ON x.s = y.s
         |          WHERE x.doc_id >= 200000 AND y.doc_id < 200000
         |          GROUP BY 1, 2)
         |SELECT c.id1 AS id1, c.id2 AS id2,
         |       round(n*1.0/(c1.c + c2.c - n), 4) AS jaccard
         |FROM cand c JOIN inter i ON c.id1 = i.id1 AND c.id2 = i.id2
         |JOIN card c1 ON c.id1 = c1.doc_id JOIN card c2 ON c.id2 = c2.doc_id
         |WHERE n*1.0/(c1.c + c2.c - n) >= 0.5 ORDER BY c.id1, c.id2""".stripMargin,
    // bucketing must never change results: the oracle is the PLAIN
    // join — hash equality proves layout-invariance (the plan
    // property itself is pinned in LayoutSpec)
    "bucketed_join_agg" ->
      """SELECT o_orderpriority,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |       CAST(count(*) AS BIGINT) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // z-order skip-scan: file selection is conservative (min/max box
    // intersection) and the exact predicate re-applies, so the result
    // is the plain filter — layout invariance is the contract
    // (ZOrderSpec pins the actual pruning)
    "events_zorder_skip" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |       round(sum(value), 4) AS sum_value
        |FROM events
        |WHERE user_id BETWEEN 40 AND 79
        |  AND CAST(ts AS DATE) BETWEEN DATE '2024-01-09' AND DATE '2024-01-16'
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q21_sole_blame" ->
      """WITH l1 AS (SELECT DISTINCT l_orderkey, l_suppkey
        |            FROM lineitem WHERE l_returnflag = 'R')
        |SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        |FROM l1 JOIN supplier ON l1.l_suppkey = s_suppkey
        |WHERE EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name LIMIT 10""".stripMargin,
    "q22_global_sales" ->
      """WITH a AS (SELECT round(avg(c_acctbal), 4) AS avg_bal
        |           FROM customer WHERE c_acctbal > 0)
        |SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_cust,
        |       round(sum(c_acctbal), 2) AS total_bal
        |FROM customer, a
        |WHERE c_acctbal > a.avg_bal
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = customer.c_custkey
        |                    AND o.o_orderdate >= TIMESTAMP '2001-01-01')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_window_topn" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
        |  SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders)
        |WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin,
    // oracle is the PLAIN join — hash equality proves the salted
    // plan is salt-invariant
    // skew report: exact top-10 key loads; shares are single
    // BIGINT/BIGINT divisions (bit-deterministic doubles)
    "key_skew_report" ->
      """WITH c AS (SELECT CAST(user_id AS BIGINT) AS key,
        |             CAST(count(*) AS BIGINT) AS n
        |           FROM events GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS total,
        |             CAST(count(*) AS BIGINT) AS n_keys FROM c),
        |r AS (SELECT key, n,
        |             row_number() OVER (ORDER BY n DESC, key) AS rank
        |      FROM c)
        |SELECT rank, key, n, n_keys,
        |       round(CAST(n AS DOUBLE) / CAST(total AS DOUBLE), 4) AS share,
        |       round(CAST(sum(n) OVER (ORDER BY rank) AS DOUBLE)
        |             / CAST(total AS DOUBLE), 4) AS cum_share
        |FROM r CROSS JOIN t WHERE rank <= 10 ORDER BY rank""".stripMargin,
    "events_salted_enrich" ->
      """WITH ua AS (SELECT user_id, avg(value) AS user_avg
        |            FROM events GROUP BY user_id)
        |SELECT e.user_id, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CASE WHEN e.value > ua.user_avg THEN 1 ELSE 0 END)
        |         AS BIGINT) AS n_above
        |FROM events e JOIN ua USING (user_id)
        |GROUP BY e.user_id ORDER BY e.user_id""".stripMargin,
    // hopping windows: every event lands in the two 12h-aligned
    // 1-day windows covering it (epoch-aligned, like Spark's window())
    "events_hopping" ->
      """WITH w AS (SELECT event_type, value,
        |    unnest([to_timestamp((epoch_us(ts) // 43200000000) * 43200),
        |            to_timestamp((epoch_us(ts) // 43200000000) * 43200
        |                         - 43200)]) AS ws
        |  FROM events)
        |SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS w_start, event_type,
        |       CAST(count(*) AS BIGINT) AS n, round(sum(value), 4)
        |         AS sum_value
        |FROM w GROUP BY ws, event_type ORDER BY w_start, event_type""".stripMargin,
    // robust MAD anomaly twin: exact interpolated medians over the
    // daily frame, 1.4826 shared double literal, MAD=0 types excluded
    "events_anomaly_mad" ->
      """WITH daily AS (SELECT event_type,
        |    strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |med AS (SELECT event_type, quantile_cont(n, 0.5) AS med
        |        FROM daily GROUP BY 1),
        |wm AS (SELECT d.event_type, d.day, d.n, m.med
        |       FROM daily d JOIN med m USING (event_type)),
        |mad AS (SELECT event_type, quantile_cont(abs(n - med), 0.5)
        |          AS mad
        |        FROM wm GROUP BY 1),
        |rz AS (SELECT wm.event_type, wm.day, wm.n, wm.med, mad.mad,
        |        round((wm.n - wm.med)
        |          / (CAST(1.4826 AS DOUBLE) * mad.mad), 4) AS robust_z
        |       FROM wm JOIN mad USING (event_type) WHERE mad.mad > 0)
        |SELECT event_type, day, n, round(med, 4) AS med,
        |  round(mad, 4) AS mad, robust_z
        |FROM rz WHERE abs(robust_z) >= 2.5
        |ORDER BY event_type, day""".stripMargin,
    "events_anomaly" ->
      """WITH daily AS (SELECT event_type,
        |    strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |st AS (SELECT event_type, day, n,
        |         sum(n) OVER (PARTITION BY event_type) AS s1,
        |         sum(n*n) OVER (PARTITION BY event_type) AS s2,
        |         count(*) OVER (PARTITION BY event_type) AS nd
        |       FROM daily),
        |zs AS (SELECT event_type, day, n,
        |         round((n - s1 * 1.0 / nd)
        |           / sqrt(s2 * 1.0 / nd
        |                  - (s1 * 1.0 / nd) * (s1 * 1.0 / nd)), 4) AS zscore
        |       FROM st)
        |SELECT event_type, day, n, zscore FROM zs
        |WHERE abs(zscore) >= 2.0 ORDER BY event_type, day""".stripMargin,
    "events_anomaly_online" ->
      """WITH daily AS (SELECT event_type,
        |    strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |st AS (SELECT event_type, day, n,
        |         sum(n) OVER w AS s1, sum(n*n) OVER w AS s2,
        |         count(*) OVER w AS nd
        |       FROM daily
        |       WINDOW w AS (PARTITION BY event_type ORDER BY day
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |zs AS (SELECT event_type, day, n,
        |         round((n - s1 * 1.0 / nd)
        |           / sqrt(s2 * 1.0 / nd
        |                  - (s1 * 1.0 / nd) * (s1 * 1.0 / nd)), 4) AS zscore
        |       FROM st WHERE nd >= 7 AND nd * s2 > s1 * s1)
        |SELECT event_type, day, n, zscore FROM zs
        |WHERE abs(zscore) >= 2.0 ORDER BY event_type, day""".stripMargin,
    // changepoint: the argmax runs on the EXACT integer split score
    // |nd·cum − t·tot| (HUGEINT in DuckDB, BIGINT in Spark — cast
    // down before output); the two means are exact-integer divisions
    "events_changepoint" ->
      """WITH daily AS (SELECT event_type,
        |    strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |w AS (SELECT event_type, day, n,
        |        row_number() OVER (PARTITION BY event_type ORDER BY day)
        |          AS t,
        |        sum(n) OVER (PARTITION BY event_type ORDER BY day
        |          ROWS UNBOUNDED PRECEDING) AS cum,
        |        count(*) OVER (PARTITION BY event_type) AS nd,
        |        sum(n) OVER (PARTITION BY event_type) AS tot
        |      FROM daily),
        |d AS (SELECT *, abs(nd*cum - t*tot) AS score FROM w WHERE t < nd),
        |r AS (SELECT *, row_number() OVER (PARTITION BY event_type
        |        ORDER BY score DESC, day) AS rk
        |      FROM d)
        |SELECT event_type, day AS split_day,
        |       CAST(t AS BIGINT) AS days_before,
        |       CAST(nd - t AS BIGINT) AS days_after,
        |       CAST(score AS BIGINT) AS score,
        |       round(cum * 1.0 / t, 4) AS mean_before,
        |       round((tot - cum) * 1.0 / (nd - t), 4) AS mean_after
        |FROM r WHERE rk = 1 ORDER BY event_type""".stripMargin,
    "text_tfidf_keywords" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |           FROM documents),
        |tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
        |       FROM t GROUP BY 1, 2),
        |df AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
        |sc AS (SELECT doc_id, tok,
        |         round(tf * ln(n_docs * 1.0 / df), 4) AS score
        |       FROM tf JOIN df USING (tok) CROSS JOIN nn),
        |r AS (SELECT doc_id, tok, score,
        |        row_number() OVER (PARTITION BY doc_id
        |                           ORDER BY score DESC, tok) AS rk
        |      FROM sc)
        |SELECT doc_id, CAST(rk AS BIGINT) AS rk, tok, score
        |FROM r WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,
    // unigram surprisal: integer floor-log2 via length(bin(t // ctf))
    // − 1 on both engines; only the final bits/token divide is float
    "text_surprisal" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |           FROM documents),
        |tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
        |       FROM t GROUP BY 1, 2),
        |cnt AS (SELECT tok, CAST(sum(tf) AS BIGINT) AS ctf
        |        FROM tf GROUP BY 1),
        |tot AS (SELECT CAST(sum(ctf) AS BIGINT) AS t FROM cnt),
        |sc AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
        |         CAST(sum(tf * (length(bin(t // ctf)) - 1)) AS BIGINT)
        |           AS total_bits
        |       FROM tf JOIN cnt USING (tok) CROSS JOIN tot GROUP BY 1)
        |SELECT doc_id, n_tokens, total_bits,
        |       round(total_bits * 1.0 / n_tokens, 4) AS bits_per_token
        |FROM sc ORDER BY doc_id""".stripMargin,
    // bigram surprisal: the same integer floor-log2 path conditioned
    // on the previous token; DuckDB builds bigrams off the 1-based
    // token list (range end-exclusive, so i+1 stays in bounds)
    "text_bigram_surprisal" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
        |           FROM documents),
        |bg AS (SELECT doc_id, ws[i] AS a, ws[i + 1] AS b
        |       FROM w, unnest(range(1, len(ws))) AS t(i)),
        |tf AS (SELECT doc_id, a, b, CAST(count(*) AS BIGINT) AS tf
        |       FROM bg GROUP BY 1, 2, 3),
        |cab AS (SELECT a, b, CAST(sum(tf) AS BIGINT) AS cab
        |        FROM tf GROUP BY 1, 2),
        |ca AS (SELECT a, CAST(sum(cab) AS BIGINT) AS ca
        |       FROM cab GROUP BY 1),
        |sc AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_bigrams,
        |         CAST(sum(tf * (length(bin(ca // cab)) - 1)) AS BIGINT)
        |           AS total_bits
        |       FROM tf JOIN cab USING (a, b) JOIN ca USING (a)
        |       GROUP BY 1)
        |SELECT doc_id, n_bigrams, total_bits,
        |       round(total_bits * 1.0 / n_bigrams, 4) AS bits_per_bigram
        |FROM sc ORDER BY doc_id""".stripMargin,
    // Cavnar-Trenkle rank-order language ID: train-split char-trigram
    // profiles (top-20, (count DESC, gram) tiebreak), out-of-place
    // distance with max penalty 20, argmin with lang tiebreak
    "langid_ngram" ->
      """WITH pd AS (SELECT doc_id, lang, text || repeat(CASE lang
        |        WHEN 'en' THEN ' the of and to in is that it was for'
        |        WHEN 'de' THEN ' der die das und ist ein nicht mit sich auf'
        |        WHEN 'fr' THEN ' le la les et est un une pas que dans'
        |        WHEN 'es' THEN ' el la los y es un una no que por'
        |        WHEN 'zh' THEN ' de shi bu le zai you wo ta men zhe'
        |        ELSE '' END, 3) AS text
        |      FROM documents),
        |g AS (SELECT d.doc_id, d.lang, substr(d.text, i.i, 3) AS g
        |      FROM pd d,
        |           unnest(range(1, greatest(length(d.text) - 1, 1)))
        |             AS i(i)),
        |lp AS (SELECT lang AS plang, g, lr FROM (
        |    SELECT lang, g, row_number() OVER (PARTITION BY lang
        |        ORDER BY n DESC, g) AS lr
        |    FROM (SELECT lang, g, CAST(count(*) AS BIGINT) AS n
        |          FROM g WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
        |            < 'cccd'
        |          GROUP BY 1, 2)) WHERE lr <= 20),
        |dp AS (SELECT doc_id, g, dr FROM (
        |    SELECT doc_id, g, row_number() OVER (PARTITION BY doc_id
        |        ORDER BY n DESC, g) AS dr
        |    FROM (SELECT doc_id, g, CAST(count(*) AS BIGINT) AS n
        |          FROM g GROUP BY 1, 2)) WHERE dr <= 20),
        |ls AS (SELECT DISTINCT plang FROM lp),
        |pen AS (SELECT dp.doc_id, ls.plang,
        |         CAST(CASE WHEN lp.lr IS NOT NULL
        |           THEN abs(dp.dr - lp.lr) ELSE 20 END AS BIGINT) AS pen
        |        FROM dp CROSS JOIN ls
        |        LEFT JOIN lp ON lp.plang = ls.plang AND lp.g = dp.g),
        |ds AS (SELECT doc_id, plang, CAST(sum(pen) AS BIGINT) AS dist
        |       FROM pen GROUP BY 1, 2),
        |bst AS (SELECT doc_id, plang AS predicted, dist AS distance
        |        FROM (SELECT doc_id, plang, dist, row_number() OVER (
        |            PARTITION BY doc_id ORDER BY dist, plang) AS rn
        |          FROM ds) WHERE rn = 1)
        |SELECT d.doc_id, d.lang AS actual, b.predicted, b.distance
        |FROM pd d LEFT JOIN bst b ON d.doc_id = b.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    // CCNet head/middle/tail: every doc scored under the train-split
    // backoff model, exact p33/p66 cuts per language, volumes + share
    "corpus_ccnet_buckets" ->
      """WITH pd AS (SELECT doc_id, lang,
        |        CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
        |               >= 'cccd' AND doc_id % 3 = 0
        |             THEN text || ' zzqx7 table' ELSE text END AS text
        |      FROM documents),
        |w AS (SELECT doc_id, lang,
        |        substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'cccd'
        |          AS is_train,
        |        string_split(text, ' ') AS ws
        |      FROM pd),
        |bg AS (SELECT doc_id, lang, is_train, ws[i] AS a, ws[i + 1] AS b
        |       FROM w, unnest(range(1, len(ws))) AS t(i)),
        |cab AS (SELECT a, b, CAST(count(*) AS BIGINT) AS cab
        |        FROM bg WHERE is_train GROUP BY 1, 2),
        |ca AS (SELECT a, CAST(sum(cab) AS BIGINT) AS ca
        |       FROM cab GROUP BY 1),
        |cb AS (SELECT b, CAST(sum(cab) AS BIGINT) AS cb
        |       FROM cab GROUP BY 1),
        |nt AS (SELECT CAST(sum(cab) AS BIGINT) AS nn FROM cab),
        |tf AS (SELECT doc_id, lang, a, b, CAST(count(*) AS BIGINT) AS tf
        |       FROM bg GROUP BY 1, 2, 3, 4),
        |sc AS (SELECT tf.doc_id, tf.lang, tf.tf,
        |         CASE WHEN cab.cab IS NOT NULL
        |              THEN CAST(length(bin(ca.ca // cab.cab)) - 1
        |                     AS BIGINT)
        |              WHEN cb.cb IS NOT NULL
        |              THEN CAST(length(bin((5 * nt.nn) // (2 * cb.cb)))
        |                     - 1 AS BIGINT)
        |              ELSE 40 END AS bits
        |       FROM tf
        |       LEFT JOIN cab ON tf.a = cab.a AND tf.b = cab.b
        |       LEFT JOIN ca ON tf.a = ca.a
        |       LEFT JOIN cb ON tf.b = cb.b
        |       CROSS JOIN nt),
        |per AS (SELECT doc_id, lang, CAST(sum(tf) AS BIGINT) AS nb,
        |         CAST(sum(tf * bits) AS BIGINT) AS tb,
        |         CAST(sum(tf * bits) AS BIGINT) * 1.0
        |           / CAST(sum(tf) AS BIGINT) AS bpb
        |        FROM sc GROUP BY 1, 2),
        |th AS (SELECT lang,
        |        quantile_cont(bpb, CAST(1 AS DOUBLE) / 3) AS p33,
        |        quantile_cont(bpb, CAST(2 AS DOUBLE) / 3) AS p66
        |       FROM per GROUP BY 1),
        |tot AS (SELECT lang, CAST(count(*) AS BIGINT) AS nl
        |        FROM per GROUP BY 1),
        |bk AS (SELECT per.lang,
        |        CASE WHEN per.bpb <= th.p33 THEN 'head'
        |             WHEN per.bpb <= th.p66 THEN 'middle'
        |             ELSE 'tail' END AS bucket,
        |        per.nb
        |       FROM per JOIN th USING (lang))
        |SELECT bk.lang, bk.bucket, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(bk.nb) AS BIGINT) AS n_bigrams,
        |  round(CAST(count(*) AS BIGINT) * 1.0 / tot.nl, 4) AS doc_share
        |FROM bk JOIN tot USING (lang)
        |GROUP BY bk.lang, bk.bucket, tot.nl
        |ORDER BY lang, bucket""".stripMargin,
    // held-out cross-entropy with stupid backoff: train-split bigram
    // model, integer floor-log2 bits (seen / backoff / 40-bit OOV
    // sentinel), exact BIGINT sums, one final division
    "text_xent_score" ->
      """WITH pd AS (SELECT doc_id,
        |        CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
        |               >= 'cccd' AND doc_id % 3 = 0
        |             THEN text || ' zzqx7 table' ELSE text END AS text
        |      FROM documents),
        |w AS (SELECT doc_id,
        |        substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'cccd'
        |          AS is_train,
        |        string_split(text, ' ') AS ws
        |      FROM pd),
        |bg AS (SELECT doc_id, is_train, ws[i] AS a, ws[i + 1] AS b
        |       FROM w, unnest(range(1, len(ws))) AS t(i)),
        |cab AS (SELECT a, b, CAST(count(*) AS BIGINT) AS cab
        |        FROM bg WHERE is_train GROUP BY 1, 2),
        |ca AS (SELECT a, CAST(sum(cab) AS BIGINT) AS ca
        |       FROM cab GROUP BY 1),
        |cb AS (SELECT b, CAST(sum(cab) AS BIGINT) AS cb
        |       FROM cab GROUP BY 1),
        |nt AS (SELECT CAST(sum(cab) AS BIGINT) AS nn FROM cab),
        |vb AS (SELECT doc_id, a, b, CAST(count(*) AS BIGINT) AS tf
        |       FROM bg WHERE NOT is_train GROUP BY 1, 2, 3),
        |sc AS (SELECT vb.doc_id, vb.tf,
        |         CASE WHEN cab.cab IS NOT NULL
        |              THEN CAST(length(bin(ca.ca // cab.cab)) - 1
        |                     AS BIGINT)
        |              WHEN cb.cb IS NOT NULL
        |              THEN CAST(length(bin((5 * nt.nn) // (2 * cb.cb)))
        |                     - 1 AS BIGINT)
        |              ELSE 40 END AS bits,
        |         CASE WHEN cab.cab IS NOT NULL THEN 0
        |              WHEN cb.cb IS NOT NULL THEN 1 ELSE 2 END AS kind
        |       FROM vb
        |       LEFT JOIN cab ON vb.a = cab.a AND vb.b = cab.b
        |       LEFT JOIN ca ON vb.a = ca.a
        |       LEFT JOIN cb ON vb.b = cb.b
        |       CROSS JOIN nt)
        |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_bigrams,
        |  CAST(sum(tf * bits) AS BIGINT) AS total_bits,
        |  CAST(sum(CASE WHEN kind = 1 THEN tf ELSE 0 END) AS BIGINT)
        |    AS n_backoff,
        |  CAST(sum(CASE WHEN kind = 2 THEN tf ELSE 0 END) AS BIGINT)
        |    AS n_oov,
        |  round(sum(tf * bits) * 1.0 / sum(tf), 4) AS bits_per_bigram
        |FROM sc GROUP BY 1 ORDER BY doc_id""".stripMargin,
    // BPE training/tokenization mirrors are program-generated unrolled
    // CTE chains (one per merge round) — see Bpe.oracleCtes
    "bpe_learn" -> Bpe.learnOracle(8),
    "bpe_learn_batched" -> Bpe.batchedOracle(4, 4),
    "bpe_tokenize" -> Bpe.tokenizeOracle(8),
    // model-based quality gate: fixed-point features via `//` (the
    // IntegralDivide mirror), integer score, integer threshold
    "quality_classifier" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |           FROM documents),
        |tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
        |       FROM t GROUP BY 1, 2),
        |f AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_toks,
        |        CAST(count(*) AS BIGINT) AS n_distinct,
        |        CAST(max(tf) AS BIGINT) AS max_tf,
        |        CAST(sum(CASE WHEN tok IN
        |            ('the','a','and','of','to','in','is')
        |          THEN tf ELSE 0 END) AS BIGINT) AS stop_hits
        |      FROM tf GROUP BY 1),
        |x AS (SELECT doc_id, n_toks,
        |        CAST(least((n_toks * 10000) // 100, 10000) AS BIGINT)
        |          AS len_fp,
        |        CAST((n_distinct * 10000) // n_toks AS BIGINT) AS ttr_fp,
        |        CAST((stop_hits * 10000) // n_toks AS BIGINT) AS stop_fp,
        |        CAST((max_tf * 10000) // n_toks AS BIGINT) AS toptok_fp
        |      FROM f)
        |SELECT doc_id, n_toks, len_fp, ttr_fp, stop_fp, toptok_fp,
        |       CAST(3 * len_fp + 3 * ttr_fp + 2 * stop_fp - 4 * toptok_fp
        |         AS BIGINT) AS score,
        |       (3 * len_fp + 3 * ttr_fp + 2 * stop_fp - 4 * toptok_fp)
        |         >= 28000 AS keep
        |FROM x ORDER BY doc_id""".stripMargin,
    // BERT MLM 15% / 80-10-10: namespaced md5 coin per (doc,pos)
    "train_mlm_mask" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws
        |           FROM documents),
        |tk AS (SELECT doc_id, i - 1 AS pos
        |       FROM t, unnest(range(1, len(ws) + 1)) AS u(i)),
        |hs AS (SELECT doc_id,
        |         CAST('0x' || substr(md5('m|' || CAST(doc_id AS VARCHAR)
        |           || '|' || CAST(pos AS VARCHAR)), 1, 15) AS BIGINT)
        |           AS h
        |       FROM tk),
        |fl AS (SELECT doc_id, h % 100 < 15 AS m, (h // 100) % 10 AS r
        |       FROM hs)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |       CAST(sum(CASE WHEN m THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_masked,
        |       CAST(sum(CASE WHEN m AND r < 8 THEN 1 ELSE 0 END)
        |         AS BIGINT) AS n_mask_tok,
        |       CAST(sum(CASE WHEN m AND r = 8 THEN 1 ELSE 0 END)
        |         AS BIGINT) AS n_random,
        |       CAST(sum(CASE WHEN m AND r = 9 THEN 1 ELSE 0 END)
        |         AS BIGINT) AS n_keep,
        |       round(CAST(sum(CASE WHEN m THEN 1 ELSE 0 END) AS DOUBLE)
        |         / count(*), 4) AS mask_ratio
        |FROM fl GROUP BY 1 ORDER BY doc_id""".stripMargin,
    // T5 span corruption: md5 coin per (doc,pos), 1/20 starts,
    // len 1..4, overlaps merged to runs = sentinels
    "train_span_corrupt" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws
        |           FROM documents),
        |tk AS (SELECT doc_id, i - 1 AS pos
        |       FROM t, unnest(range(1, len(ws) + 1)) AS u(i)),
        |nt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens
        |       FROM tk GROUP BY 1),
        |hs AS (SELECT doc_id, pos,
        |         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|'
        |           || CAST(pos AS VARCHAR)), 1, 15) AS BIGINT) AS h
        |       FROM tk),
        |st AS (SELECT doc_id, pos, 1 + (h // 20) % 4 AS len
        |       FROM hs WHERE h % 20 = 0),
        |cov0 AS (SELECT DISTINCT st.doc_id, u.cp
        |         FROM st, unnest(range(st.pos, st.pos + st.len))
        |           AS u(cp)),
        |cov AS (SELECT c.doc_id, c.cp FROM cov0 c
        |        JOIN nt ON c.doc_id = nt.doc_id
        |        WHERE c.cp < nt.n_tokens),
        |rn AS (SELECT doc_id, cp,
        |         lag(cp) OVER (PARTITION BY doc_id ORDER BY cp) AS pc
        |       FROM cov),
        |runs AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_masked,
        |           CAST(sum(CASE WHEN pc IS NULL OR cp - pc > 1
        |             THEN 1 ELSE 0 END) AS BIGINT) AS n_spans
        |         FROM rn GROUP BY 1)
        |SELECT nt.doc_id, nt.n_tokens,
        |       CAST(coalesce(runs.n_spans, 0) AS BIGINT) AS n_spans,
        |       CAST(coalesce(runs.n_masked, 0) AS BIGINT) AS n_masked,
        |       round(CAST(coalesce(runs.n_masked, 0) AS DOUBLE)
        |         / nt.n_tokens, 4) AS corrupt_ratio,
        |       CAST(nt.n_tokens - coalesce(runs.n_masked, 0)
        |         + coalesce(runs.n_spans, 0) AS BIGINT) AS input_len,
        |       CAST(coalesce(runs.n_masked, 0)
        |         + coalesce(runs.n_spans, 0) AS BIGINT) AS target_len
        |FROM nt LEFT JOIN runs ON nt.doc_id = runs.doc_id
        |ORDER BY nt.doc_id""".stripMargin,
    // dataset card: 1-row composition of proven aggregates (size,
    // exact-dup share, near-dup pairs, both gates' keep rates)
    "corpus_dataset_card" ->
      s"""WITH $bandCte,
         |$verifiedPairsCte,
         |ndp AS (SELECT CAST(count(*) AS BIGINT) AS near_dup_pairs
         |        FROM pairs),
         |bs AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |         CAST(sum(len(string_split(text, ' '))) AS BIGINT)
         |           AS n_tokens,
         |         CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
         |         CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
         |         CAST(count(DISTINCT text) AS BIGINT) AS n_distinct
         |       FROM documents),
         |kqt AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
         |        FROM documents),
         |kqtf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
         |         FROM kqt GROUP BY 1, 2),
         |kqf AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_toks,
         |          CAST(count(*) AS BIGINT) AS n_distinct,
         |          CAST(max(tf) AS BIGINT) AS max_tf,
         |          CAST(sum(CASE WHEN tok IN
         |              ('the','a','and','of','to','in','is')
         |            THEN tf ELSE 0 END) AS BIGINT) AS stop_hits
         |        FROM kqtf GROUP BY 1),
         |kqg AS (SELECT
         |          (3 * least((n_toks * 10000) // 100, 10000)
         |            + 3 * ((n_distinct * 10000) // n_toks)
         |            + 2 * ((stop_hits * 10000) // n_toks)
         |            - 4 * ((max_tf * 10000) // n_toks)) >= 28000
         |            AS keep_m,
         |          round((least(n_toks/50.0, 1.0)
         |            + CASE WHEN stop_hits*1.0/n_toks
         |                BETWEEN 0.01 AND 0.6
         |                THEN 1.0 ELSE 0.0 END
         |            + (1.0 - least((1.0 - n_distinct*1.0/n_toks)/0.9,
         |                1.0))) / 3.0, 4) >= 0.5 AS keep_h
         |        FROM kqf),
         |kr AS (SELECT
         |         round(CAST(sum(CASE WHEN keep_m THEN 1 ELSE 0 END)
         |             AS DOUBLE) / count(*), 4) AS keep_rate_model,
         |         round(CAST(sum(CASE WHEN keep_h THEN 1 ELSE 0 END)
         |             AS DOUBLE) / count(*), 4) AS keep_rate_heuristic
         |       FROM kqg)
         |SELECT bs.n_docs, bs.n_tokens, bs.n_langs, bs.n_sources,
         |       round(CAST(1.0 AS DOUBLE)
         |         - CAST(bs.n_distinct AS DOUBLE) / bs.n_docs, 4)
         |         AS exact_dup_share,
         |       ndp.near_dup_pairs, kr.keep_rate_model,
         |       kr.keep_rate_heuristic
         |FROM bs CROSS JOIN ndp CROSS JOIN kr""".stripMargin,
    // Cohen's kappa between the model gate and the heuristic gate,
    // both gates off the one tf aggregate; pe=1 degenerates to NULL
    "quality_kappa" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |           FROM documents),
        |tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
        |       FROM t GROUP BY 1, 2),
        |f AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_toks,
        |        CAST(count(*) AS BIGINT) AS n_distinct,
        |        CAST(max(tf) AS BIGINT) AS max_tf,
        |        CAST(sum(CASE WHEN tok IN
        |            ('the','a','and','of','to','in','is')
        |          THEN tf ELSE 0 END) AS BIGINT) AS stop_hits
        |      FROM tf GROUP BY 1),
        |g AS (SELECT
        |        (3 * least((n_toks * 10000) // 100, 10000)
        |          + 3 * ((n_distinct * 10000) // n_toks)
        |          + 2 * ((stop_hits * 10000) // n_toks)
        |          - 4 * ((max_tf * 10000) // n_toks)) >= 28000 AS keep_m,
        |        round((least(n_toks/50.0, 1.0)
        |          + CASE WHEN stop_hits*1.0/n_toks BETWEEN 0.01 AND 0.6
        |              THEN 1.0 ELSE 0.0 END
        |          + (1.0 - least((1.0 - n_distinct*1.0/n_toks)/0.9,
        |              1.0))) / 3.0, 4) >= 0.5 AS keep_h
        |      FROM f),
        |c AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(CASE WHEN keep_m THEN 1 ELSE 0 END) AS BIGINT)
        |          AS keep_model,
        |        CAST(sum(CASE WHEN keep_h THEN 1 ELSE 0 END) AS BIGINT)
        |          AS keep_heuristic,
        |        CAST(sum(CASE WHEN keep_m = keep_h THEN 1 ELSE 0 END)
        |          AS BIGINT) AS n_agree
        |      FROM g)
        |SELECT n AS n_docs, keep_model, keep_heuristic, n_agree,
        |       round(CAST(n_agree AS DOUBLE) / n, 4) AS po,
        |       round((CAST(keep_model AS DOUBLE) * keep_heuristic
        |           + CAST(n - keep_model AS DOUBLE) * (n - keep_heuristic))
        |         / (CAST(n AS DOUBLE) * n), 4) AS pe,
        |       CASE WHEN (CAST(keep_model AS DOUBLE) * keep_heuristic
        |           + CAST(n - keep_model AS DOUBLE) * (n - keep_heuristic))
        |         / (CAST(n AS DOUBLE) * n) < 1.0
        |         THEN round((CAST(n_agree AS DOUBLE) / n
        |             - (CAST(keep_model AS DOUBLE) * keep_heuristic
        |               + CAST(n - keep_model AS DOUBLE)
        |                 * (n - keep_heuristic))
        |               / (CAST(n AS DOUBLE) * n))
        |           / (1.0 - (CAST(keep_model AS DOUBLE) * keep_heuristic
        |               + CAST(n - keep_model AS DOUBLE)
        |                 * (n - keep_heuristic))
        |               / (CAST(n AS DOUBLE) * n)), 4)
        |         ELSE NULL END AS kappa
        |FROM c""".stripMargin,
    // n-gram novelty: first corpus occurrence (min doc_id) per
    // distinct word-3-gram, per-doc novel fraction
    "text_ngram_novelty" ->
      s"""WITH $shingleCte,
         |shx AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
         |f AS (SELECT s, min(doc_id) AS first_doc FROM shx GROUP BY 1)
         |SELECT shx.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         |       CAST(sum(CASE WHEN f.first_doc = shx.doc_id
         |                     THEN 1 ELSE 0 END) AS BIGINT)
         |         AS novel_grams,
         |       round(sum(CASE WHEN f.first_doc = shx.doc_id
         |                      THEN 1 ELSE 0 END) * 1.0 / count(*), 4)
         |         AS novelty
         |FROM shx JOIN f ON f.s = shx.s
         |GROUP BY 1 ORDER BY doc_id""".stripMargin,
    "text_top_terms" ->
      """WITH u AS (SELECT DISTINCT lang, doc_id, tok FROM
        |             (SELECT lang, doc_id,
        |                     unnest(string_split(text, ' ')) AS tok
        |              FROM documents)),
        |df AS (SELECT lang, tok, CAST(count(*) AS BIGINT) AS df
        |       FROM u GROUP BY 1, 2),
        |r AS (SELECT lang, tok, df,
        |             row_number() OVER (PARTITION BY lang
        |                                ORDER BY df DESC, tok) AS rk
        |      FROM df)
        |SELECT lang, CAST(rk AS BIGINT) AS rk, tok, df
        |FROM r WHERE rk <= 5 ORDER BY lang, rk""".stripMargin,
    // maintained daily rollup: the oracle is the one-shot rebuild
    // (micro-unit longs keep the maintained == rebuilt fold exact)
    "events_daily_agg" ->
      """WITH e AS (SELECT CAST(ts AS DATE) AS d, event_type,
        |             CAST(round(value * 1000000, 0) AS BIGINT) AS mv
        |           FROM events)
        |SELECT CAST(d AS VARCHAR) AS day, event_type,
        |       CAST(count(*) AS BIGINT) AS n,
        |       round(CAST(sum(mv) AS DOUBLE) / 1000000, 4) AS sum_value
        |FROM e GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin,
    "events_tumbling" ->
      """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
        |       CAST(count(*) AS BIGINT) AS n, round(sum(value), 4) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin,
    "events_sessionize" ->
      """WITH x AS (
        |  SELECT user_id, event_id, ts,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |                OR CAST(floor(epoch(ts)) AS BIGINT)
        |                   - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
        |              THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |y AS (
        |  SELECT user_id, ts,
        |         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                                ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM x)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |       CAST(count(*) AS BIGINT) AS n_events,
        |       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end
        |FROM y GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,
    // the banded range join must equal the naive inequality join —
    // DuckDB plans it as IEJoin; the session CTEs mirror
    // events_sessionize's
    "events_session_attr" ->
      """WITH x AS (
        |  SELECT user_id, event_id, ts,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |                OR CAST(floor(epoch(ts)) AS BIGINT)
        |                   - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
        |              THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |y AS (
        |  SELECT user_id, ts,
        |         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                                ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM x),
        |sess AS (
        |  SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |         min(ts) AS s_start, max(ts) AS s_end
        |  FROM y GROUP BY user_id, session_id),
        |p AS (SELECT event_id, user_id, ts FROM events
        |      WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id,
        |       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS ets,
        |       s.session_id,
        |       strftime(s.s_start, '%Y-%m-%d %H:%M:%S') AS session_start,
        |       strftime(s.s_end, '%Y-%m-%d %H:%M:%S') AS session_end
        |FROM p JOIN sess s
        |  ON p.user_id = s.user_id
        | AND p.ts >= s.s_start AND p.ts <= s.s_end
        |ORDER BY event_id""".stripMargin,
    // DuckDB has a native ASOF JOIN with exactly the >= pick-latest
    // semantics AsOf.asofJoin implements via the union-tag window.
    // Timestamps compare at µs on both engines: Spark truncates the
    // parquet ns to timestamp_micros, the cast to DuckDB TIMESTAMP
    // (µs) truncates identically.
    "events_asof_join" ->
      """WITH c AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS cts,
        |                  max(value) AS click_value
        |           FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS pts, value
        |      FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id,
        |       strftime(p.pts, '%Y-%m-%d %H:%M:%S') AS ets,
        |       round(p.value, 4) AS pvalue,
        |       strftime(c.cts, '%Y-%m-%d %H:%M:%S') AS click_ts,
        |       round(c.click_value, 4) AS click_value
        |FROM p ASOF LEFT JOIN c
        |  ON p.user_id = c.user_id AND p.pts >= c.cts
        |ORDER BY event_id""".stripMargin,
  )
}
