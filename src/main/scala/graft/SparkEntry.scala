package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` keys ↔ SURVEY.md §2 operator ids; every entry has a DuckDB
  * oracle in `oracleSql` unless the operator is not SQL-expressible.
  */
object SparkEntry {

  /** Flagship on sf0.001: the SURVEY §7.3 minimum end-to-end slice —
    * synthetic session → cluster reduce → TPS-CV calibration → gaze
    * mapping → weighted validation-error summary (one row). */
  def entry(spark: SparkSession): DataFrame =
    Queries.gazePipeline(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s3_scan_prune" -> (Queries.scanPrune _),
    "p1_normalize" -> (Queries.normalize _),
    "p2_conf_filter" -> (Queries.confidenceFilter _),
    "p6_zscore_filter" -> (Queries.zscoreFilter _),
    "p7_small_filter" -> (Queries.smallFilter _),
    "a6_bimodality" -> (Queries.bimodality _),
    "p9_unit_convert" -> (Queries.unitConvert _),
    "p10_median_detrend" -> (Queries.medianDetrend _),
    "j1_asof_window_agg" -> (Queries.asofWindowAgg _),
    "j2_asof_nearest" -> (Queries.asofNearest _),
    "join_agg_revenue" -> (Queries.joinAgg _),
    "a1_dedup_ts" -> (Queries.dedupTimestamps _),
    "a2_cluster_stats" -> (Queries.clusterStats _),
    "a4_hist2d" -> (Queries.hist2d _),
    "a8_sliding_rate" -> (Queries.slidingRate _),
    "j4_cluster_rep" -> (Queries.clusterRepresentative _),
    "j5_snap_ts" -> (Queries.snapTimestamps _),
    "j6_searchsorted" -> (Queries.searchSorted _),
    "w3_remove_brief" -> (Queries.removeBrief _),
    "a3_cluster_gate" -> (Queries.clusterGate _),
    "a7_dbscan" -> (Queries.dbscan _),
    "w1_rle_segments" -> (Queries.rleSegments _),
    "w2_sessionize" -> (Queries.sessionize _),
    "w4_gradient" -> (Queries.gradient _),
    "w5_blink_segments" -> (Queries.blinkSegments _),
    "w6_saccade_segments" -> (Queries.saccadeSegments _),
    "w7_resample" -> (Queries.resample _),
    "w10_binocular_merge" -> (Queries.binocularMerge _),
    "m9_gaze_pipeline" -> (Queries.gazePipeline _),
    "m9_multisession" -> (Queries.multiSessionPipeline _),
    "multimodal_features" -> (Queries.multimodalFeatures _),
    "o2_union_stats" -> (Queries.unionStats _),
    "o5_distinct" -> (Queries.distinctPairs _),
    "m2_linreg" -> (Queries.linregByGroup _),
    "m4_poly_apply" -> (Queries.polyApply _),
    "m8_tps_apply" -> (Queries.tpsApply _),
    "dedup_exact" -> (Queries.dedupExact _),
    "dedup_minhash_lsh" -> (Queries.dedupMinhashLsh _),
    "dedup_ngram_jaccard" -> (Queries.dedupNgramJaccard _),
    "dedup_clusters" -> (Queries.dedupClusters _),
    "sample_stratified" -> (Queries.sampleStratified _),
    "pack_chunks" -> (Queries.packChunks _),
    "bpe_tokenize" -> (Queries.bpeTokenize _),
    "pack_chunks_bpe" -> (Queries.packChunksBpe _),
    "dedup_simhash" -> (Queries.dedupSimhash _),
    "text_stats" -> (Queries.textStats _),
    "text_langid" -> (Queries.textLangid _),
    "text_fingerprint" -> (Queries.textFingerprint _),
    "text_quality" -> (Queries.textQuality _),
    "text_decontaminate" -> (Queries.textDecontaminate _),
    "text_pii" -> (Queries.textPii _),
    "text_repetition" -> (Queries.textRepetition _),
    "text_line_dedup" -> (Queries.textLineDedup _),
    "bm25_topk" -> (Queries.bm25Topk _),
    "sim_brute_topk" -> (Queries.simBruteTopK _),
    "ann_lsh_topk" -> (Queries.annLshTopk _),
    "ann_ivf_topk" -> (Queries.annIvfTopk _),
    "ann_pq_topk" -> (Queries.annPqTopk _),
    "ann_ivf_pq_topk" -> (Queries.annIvfPqTopk _),
    "emb_neardup" -> (Queries.embNearDup _),
    "p8_quat_euler" -> (Queries.quatEuler _),
    "cv_pupil" -> (Queries.cvPupil _),
    "cv_checkerboard" -> (Queries.cvCheckerboard _),
    "cv_circles" -> (Queries.cvCircles _),
    "cv_multi_markers" -> (Queries.cvMultiMarkers _),
    "audio_features" -> (Queries.audioFeatures _),
    "cv_video_pupils" -> (Queries.cvVideoPupils _),
    "curation_pipeline" -> (Queries.curationPipeline _),
  )

  def oracleSql: Map[String, String] = Oracles.sql
}
