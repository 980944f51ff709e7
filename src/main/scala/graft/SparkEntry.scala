package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalOps.pricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (RelationalOps.pricingSummary _),
    "q02_filter_pushdown" -> (RelationalOps.filterPushdown _),
    "q03_join_agg"        -> (RelationalOps.joinAgg _),
    "q04_exists_semijoin" -> (RelationalOps.existsSemijoin _),
    "q05_multi_join"      -> (RelationalOps.multiJoin _),
    "q06_scan_agg"        -> (RelationalOps.scanAgg _),
    "q07_window_rank"     -> (RelationalOps.windowRank _),
    "q08_window_running"  -> (RelationalOps.windowRunning _),
    "q08b_window_range"   -> (RelationalOps.windowRange _),
    "q09_rollup"          -> (RelationalOps.rollupAgg _),
    "q09b_cube"           -> (RelationalOps.cubeAgg _),
    "q10_antijoin"        -> (RelationalOps.antiJoin _),
    "q11b_topk_agg"       -> (RelationalOps.topkPerGroupAgg _),
    "q11_topk_per_group"  -> (RelationalOps.topkPerGroup _),
    "q12_distinct_count"  -> (RelationalOps.distinctCount _),
    "q12b_approx_distinct" -> (RelationalOps.approxDistinct _),
    "q13_case_pivot"      -> (RelationalOps.casePivot _),
    "q14_percentiles"     -> (RelationalOps.percentiles _),
    "q14b_approx_percentiles" -> (RelationalOps.approxPercentiles _),
    "q15_union_dedup"     -> (RelationalOps.unionDedup _),
    "q16_json_extract"    -> (RelationalOps.jsonExtract _),
    "q17_string_funcs"    -> (RelationalOps.stringFuncs _),
    "q18_date_trunc"      -> (RelationalOps.dateTrunc _),
    "q19_correlated_avg"  -> (RelationalOps.correlatedAvg _),
    "q20_frame_index"     -> (RosbagDomainOps.frameIndex _),
    "q21_sessionize"      -> (RosbagDomainOps.sessionize _),
    "q22_frame_gaps"      -> (RosbagDomainOps.frameGaps _),
    "q23_detect_maxconf"  -> (RosbagDomainOps.detectMaxConf _),
    "q24_vru_filter"      -> (RosbagDomainOps.vruFilter _),
    "q25_label_search"    -> (RosbagDomainOps.labelSearch _),
    "q26_asof_join"       -> (RosbagDomainOps.asofJoin _),
    "q27_monitor_status"  -> (RosbagDomainOps.monitorStatus _),
    "q28_bbox_normalize"  -> (RosbagDomainOps.bboxNormalize _),
    "q29_bbox_iou"        -> (RosbagDomainOps.bboxIou _),
    "q29b_det_eval"       -> ((s: SparkSession, d: String) => RosbagDomainOps.detEval(s, d)),
    "q29c_det_ap"         -> ((s: SparkSession, d: String) => RosbagDomainOps.detAveragePrecision(s, d)),
    "q29d_nms"            -> (RosbagDomainOps.nmsTable _),
    "q29e_det_map_coco"   -> (RosbagDomainOps.detApCoco _),
    "q29f_det_ap_voc07"   -> ((s: SparkSession, d: String) => RosbagDomainOps.detAveragePrecisionVoc07(s, d)),
    "q29g_det_map_coco_greedy" -> ((s: SparkSession, d: String) => RosbagDomainOps.detApCocoGreedy(s, d)),
    "q29h_det_ap_voc07_greedy" -> ((s: SparkSession, d: String) => RosbagDomainOps.detAveragePrecisionVoc07Greedy(s, d)),
    "q29i_det_coco_scoreboard" -> (RosbagDomainOps.detCocoScoreboard _),
    "q29j_det_confusion"  -> (RosbagDomainOps.detConfusion _),
    "q32_track_stitch"    -> ((s: SparkSession, d: String) => RosbagDomainOps.trackStitch(s, d)),
    "q30_train_val_split" -> (RosbagDomainOps.trainValSplit _),
    "q34_salted_join"     -> ((s: SparkSession, d: String) => SkewOps.saltedJoin(s, d)),
    "q37_mp4_manifest"    -> (RosbagDomainOps.mp4ManifestIndex _),
    "q35_funnel"          -> (RosbagDomainOps.funnel _),
    "q36_sample"          -> (RosbagDomainOps.sampleDocs _),
    "q40_dedup_exact"     -> (DedupOps.exact _),
    "q41_dedup_ngram"     -> ((s: SparkSession, d: String) => DedupOps.ngramJaccard(s, d)),
    "q41b_dedup_ngram_capped" -> ((s: SparkSession, d: String) => DedupOps.ngramJaccard(s, d, dfCap = 4)),
    "q41c_dedup_ngram_prefix" -> ((s: SparkSession, d: String) => DedupOps.ngramJaccardPrefix(s, d)),
    "q41d_dedup_containment" -> ((s: SparkSession, d: String) => DedupOps.ngramContainment(s, d)),
    "q42_dedup_minhash"   -> (DedupOps.minhashLsh _),
    "q43_dedup_simhash"   -> (DedupOps.simhash _),
    "q44_dedup_embedding" -> ((s, d) => DedupOps.embeddingNearDup(s, d)),
    "q44b_dedup_embedding_blocked" -> ((s, d) => DedupOps.embeddingNearDup(s, d, subBlockBits = 3)),
    "q45_knn_bruteforce"  -> ((s: SparkSession, d: String) => SimilarityOps.knnBruteForce(s, d)),
    "q46_knn_lsh"         -> ((s: SparkSession, d: String) => SimilarityOps.knnLsh(s, d)),
    "q46c_knn_lsh_multi"  -> ((s: SparkSession, d: String) => SimilarityOps.knnLsh(s, d, tables = 2)),
    "q46b_knn_ivf"        -> ((s: SparkSession, d: String) => SimilarityOps.knnIvf(s, d)),
    "q46d_knn_ivf_auto"   -> ((s: SparkSession, d: String) => SimilarityOps.knnIvfAuto(s, d)),
    "q46e_knn_imi"        -> ((s: SparkSession, d: String) => SimilarityOps.knnImi(s, d)),
    "q46f_ann_recall_imi" -> ((s: SparkSession, d: String) => SimilarityOps.annRecallImi(s, d)),
    "q54_ivf_balance"     -> (SimilarityOps.ivfListBalance _),
    "q54b_ivf_balance_auto" -> (SimilarityOps.ivfListBalanceAuto _),
    "q68d_ann_recall_auto" -> ((s: SparkSession, d: String) => SimilarityOps.annRecallAuto(s, d)),
    "q68e_ann_recall_curve_auto" -> ((s: SparkSession, d: String) => SimilarityOps.annRecallCurveAuto(s, d)),
    "q101_prototype_prune" -> ((s: SparkSession, d: String) => SimilarityOps.prototypePrune(s, d)),
    "q103_cluster_map"    -> ((s: SparkSession, d: String) => SimilarityOps.clusterMap(s, d)),
    "q55_dedup_groups"    -> ((s: SparkSession, d: String) => DedupOps.dedupGroups(s, d)),
    "q55c_group_sizes"    -> ((s: SparkSession, d: String) => DedupOps.dedupGroupSizes(s, d)),
    "q55d_dedup_savings"  -> ((s: SparkSession, d: String) => DedupOps.dedupSavings(s, d)),
    "q55b_dedup_priority" -> ((s: SparkSession, d: String) => DedupOps.dedupGroupsPriority(s, d)),
    "q47_langid"          -> (TextAnalysisOps.langId _),
    "q48_quality_score"   -> (TextAnalysisOps.qualityScore _),
    "q48b_length_outliers" -> (TextAnalysisOps.lengthOutliers _),
    "q110_quality_drift"  -> ((s: SparkSession, d: String) => TextAnalysisOps.qualityDrift(s, d)),
    "q49_token_count"     -> (TextAnalysisOps.tokenCount _),
    "q50_fingerprint"     -> (TextAnalysisOps.fingerprint _),
    "q50b_winnow"         -> ((s: SparkSession, d: String) => CurationOps.winnow(s, d)),
    "q50c_winnow_dedup"   -> ((s: SparkSession, d: String) => CurationOps.winnowDedup(s, d)),
    "q51_embed_stats"     -> (TextAnalysisOps.embedStats _),
    "q52_top_terms"       -> (TextAnalysisOps.topTerms _),
    "q52b_vocab_growth"   -> ((s: SparkSession, d: String) => TextAnalysisOps.vocabGrowth(s, d)),
    "q52c_zipf_fit"       -> ((s: SparkSession, d: String) => TextAnalysisOps.zipfFit(s, d)),
    "q53_normalize"       -> (TextAnalysisOps.normalizeTokens _),
    "q56_contamination"   -> (CurationOps.contamination _),
    "q57_dup_ngram_rate"  -> (CurationOps.dupNgramRate _),
    "q82_decontaminate"   -> ((s: SparkSession, d: String) => CurationOps.decontaminate(s, d)),
    "q82b_decon_fuzzy"    -> ((s: SparkSession, d: String) => CurationOps.deconFuzzy(s, d)),
    "q82c_decon_bloom"    -> ((s: SparkSession, d: String) => CurationOps.deconBloom(s, d)),
    "q82d_decon_fraction" -> ((s: SparkSession, d: String) => CurationOps.deconFraction(s, d)),
    "q58_stratified_sample" -> ((s: SparkSession, d: String) => CurationOps.stratifiedSample(s, d)),
    "q59_quantize_int8"   -> (CurationOps.quantizeStats _),
    "q60_chunk_docs"      -> ((s: SparkSession, d: String) => CurationOps.chunkDocs(s, d)),
    "q62_incremental_dedup" -> ((s: SparkSession, d: String) => DedupOps.incrementalDedup(s, d)),
    "q61_pack_sequences"  -> ((s: SparkSession, d: String) => CurationOps.packSequences(s, d)),
    "q61b_pack_layout"    -> ((s: SparkSession, d: String) => CurationOps.packLayout(s, d)),
    "q63_gopher_quality"  -> (CurationOps.gopherQuality _),
    "q64_source_mix"      -> (CurationOps.sourceMix _),
    "q65_dup_runs"        -> ((s: SparkSession, d: String) => CurationOps.dupRuns(s, d)),
    "q83_dup_spans"       -> ((s: SparkSession, d: String) => CurationOps.dupSpans(s, d)),
    "q83b_cut_dup_spans"  -> ((s: SparkSession, d: String) => CurationOps.cutDupSpans(s, d)),
    "q109_mask_dup_spans" -> ((s: SparkSession, d: String) => CurationOps.maskDupSpans(s, d)),
    "q84_source_overlap"  -> ((s: SparkSession, d: String) => CurationOps.sourceOverlap(s, d)),
    "q85_source_divergence" -> ((s: SparkSession, d: String) => CurationOps.sourceDivergence(s, d)),
    "q85b_doremi_weights" -> ((s: SparkSession, d: String) => CurationOps.doremiWeights(s, d)),
    "q44c_dedup_embedding_dense" -> ((s: SparkSession, d: String) => DedupOps.embeddingNearDup(s, d, subBlockBits = 8)),
    "q44d_dedup_embedding_auto" -> ((s: SparkSession, d: String) => DedupOps.embeddingNearDupAuto(s, d)),
    "q67b_semantic_dedup_blocked" -> ((s: SparkSession, d: String) => DedupOps.semanticDedup(s, d, subBlockBits = 6)),
    "q67c_semantic_dedup_auto" -> ((s: SparkSession, d: String) => DedupOps.semanticDedupAuto(s, d)),
    "q86_dedup_recall"    -> (DedupOps.dedupRecall _),
    "q96b_winnow_curve"   -> ((s: SparkSession, d: String) => CurationOps.winnowCurve(s, d)),
    "q42b_minhash_est"    -> (DedupOps.minhashEst _),
    "q66_label_centroids" -> (TextAnalysisOps.labelCentroids _),
    "q66b_label_outliers" -> (TextAnalysisOps.labelOutliers _),
    "q66c_class_separation" -> (TextAnalysisOps.classSeparation _),
    "q87_bpe_pairs"       -> ((s: SparkSession, d: String) => TextAnalysisOps.bpePairs(s, d)),
    "q67_semantic_dedup"  -> ((s: SparkSession, d: String) => DedupOps.semanticDedup(s, d)),
    "q68_ann_recall"      -> ((s: SparkSession, d: String) => SimilarityOps.annRecall(s, d)),
    "q107_retrieval_quality" -> ((s: SparkSession, d: String) => SimilarityOps.retrievalQuality(s, d)),
    "q107b_retrieval_quality_multi" -> ((s: SparkSession, d: String) => SimilarityOps.retrievalQualityMulti(s, d)),
    "q108_index_drift"    -> ((s: SparkSession, d: String) => SimilarityOps.indexDrift(s, d)),
    "q68b_ann_recall_wide" -> ((s: SparkSession, d: String) => SimilarityOps.annRecall(s, d, queryIdMax = 300)),
    "q68c_ann_recall_curve" -> ((s: SparkSession, d: String) => SimilarityOps.annRecallCurve(s, d)),
    "q69_pq_stats"        -> (SimilarityOps.pqStats _),
    "q70_knn_pq"          -> ((s: SparkSession, d: String) => SimilarityOps.knnPq(s, d)),
    "q70b_knn_ivfpq"      -> ((s: SparkSession, d: String) => SimilarityOps.knnIvfPq(s, d)),
    "q70c_knn_ivfpq_res"  -> ((s: SparkSession, d: String) => SimilarityOps.knnIvfPqResidual(s, d)),
    "q70d_knn_opq"        -> ((s: SparkSession, d: String) => SimilarityOps.knnOpq(s, d)),
    "q70e_knn_opq_ivf"    -> ((s: SparkSession, d: String) => SimilarityOps.knnIvfPqOpq(s, d)),
    "q71_interp_align"    -> (TemporalOps.interpAlign _),
    "q72_overlap_join"    -> (TemporalOps.overlapJoin _),
    "q72b_range_join_rule" -> (TemporalOps.overlapJoinViaRule _),
    "q73_bm25"            -> ((s: SparkSession, d: String) => TextAnalysisOps.bm25(s, d)),
    "q73b_bm25_multi"     -> ((s: SparkSession, d: String) => TextAnalysisOps.bm25PerQuery(s, d)),
    "q81_hybrid_rrf"      -> ((s: SparkSession, d: String) => SimilarityOps.hybridRrf(s, d)),
    "q81b_hybrid_rrf_multi" -> ((s: SparkSession, d: String) => SimilarityOps.hybridRrfMulti(s, d)),
    "q74_pps_sample"      -> ((s: SparkSession, d: String) => CurationOps.ppsSample(s, d)),
    "q88_bpe_train"       -> ((s: SparkSession, d: String) => operators.Bpe.bpeTrainTable(s, d)),
    "q89_bpe_encode"      -> ((s: SparkSession, d: String) => operators.Bpe.bpeEncodeHistogram(s, d)),
    "q90_lm_perplexity"   -> ((s: SparkSession, d: String) => CurationOps.lmPerplexity(s, d)),
    "q90b_ccnet_buckets"  -> ((s: SparkSession, d: String) => CurationOps.ccnetBuckets(s, d)),
    "q100_hard_negatives" -> ((s: SparkSession, d: String) => SimilarityOps.hardNegatives(s, d)),
    "q91_dsir"            -> ((s: SparkSession, d: String) => CurationOps.dsirWeights(s, d)),
    "q92_pca_top"         -> ((s: SparkSession, d: String) => operators.Pca.topComponentTable(s, d)),
    "q92b_pca_spectrum"   -> ((s: SparkSession, d: String) => operators.Pca.topComponentsTable(s, d)),
    "q93_fertility"       -> ((s: SparkSession, d: String) => operators.Bpe.fertilityByLang(s, d)),
    "q94_clf_train"       -> ((s: SparkSession, d: String) => operators.Clf.trainTable(s, d)),
    "q94b_clf_train_sampled" -> ((s: SparkSession, d: String) => operators.Clf.trainTableSampled(s, d)),
    "q95_quality_clf"     -> ((s: SparkSession, d: String) => operators.Clf.scoreTable(s, d)),
    "q95b_clf_curve"      -> ((s: SparkSession, d: String) => operators.Clf.thresholdCurve(s, d)),
    "q95c_clf_eval"       -> ((s: SparkSession, d: String) => operators.Clf.evalTable(s, d)),
    "q95d_clf_calibration" -> ((s: SparkSession, d: String) => operators.Clf.calibrationTable(s, d)),
    "q64b_epoch_mix"      -> ((s: SparkSession, d: String) => CurationOps.epochMix(s, d)),
    "q64c_temperature_mix" -> ((s: SparkSession, d: String) => CurationOps.temperatureMix(s, d)),
    "q96_band_curve"      -> ((s: SparkSession, d: String) => DedupOps.bandCurve(s, d)),
    "q97_decon_curve"     -> ((s: SparkSession, d: String) => CurationOps.deconCurve(s, d)),
    "q98_quality_agreement" -> ((s: SparkSession, d: String) => CurationOps.qualityAgreement(s, d)),
    "q99_repetition_profile" -> ((s: SparkSession, d: String) => CurationOps.repetitionProfile(s, d)),
    "q75_scd2"            -> (TemporalOps.scd2 _),
    "q76_rolling_features" -> (TemporalOps.rollingFeatures _),
    "q77_cohort_retention" -> (TemporalOps.cohortRetention _),
    "q78_transitions"     -> (TemporalOps.transitionMatrix _),
    "q79_anomalies"       -> (QualityOps.anomalies _),
    "q104_voxel_downsample" -> (PointCloudOps.voxelTable _),
    "q105_audio_spectral" -> (graft.multimodal.AudioOps.spectralTable _),
    "q106_entropy"        -> (TextAnalysisOps.entropyProfile _),
    "q80_expectations"    -> ((s: SparkSession, d: String) => QualityOps.expectationAudit(s, d)),
    "q111_sensor_sync"    -> (TemporalOps.sensorSync _),
    "q112_level_shift"    -> ((s: SparkSession, d: String) => QualityOps.levelShift(s, d)),
    "q112b_level_shift_sharded" -> ((s: SparkSession, d: String) => QualityOps.levelShiftSharded(s, d)),
  )

  // Portable polynomial rolling hash in DuckDB SQL — mirrors
  // graft.functions.TextFunctions.charHash exactly.
  private def PH(x: String) =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(string_split($x, '')," +
      s" c -> ascii(c))), (acc, ch) -> (acc*31 + ch) % 1000000007)"

  // Second independent polynomial hash (x131 mod 998244353) — mirrors the
  // h2 half of ShingleKernels.simhash's 60-bit token hash H = h1 | h2<<30.
  private def PH2(x: String) =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(string_split($x, '')," +
      s" c -> ascii(c))), (acc, ch) -> (acc*131 + ch) % 998244353)"

  // The q89/q93 replace-chain BPE encoder in DuckDB SQL: expression
  // over column `s` (the chr(1)/chr(2)-wrapped symbol string) applying
  // the frozen merges in rank order — mirrors operators.Bpe.encodeCol.
  private def BPE_ENC: String =
    graft.operators.BpeMerges.values.sortBy(_._1)
      .foldLeft("s") { case (c, (_, l, r, _)) =>
        def q(x: String) = "'" + x.replace("'", "''") + "'"
        s"replace($c, chr(1)||${q(l)}||chr(2)||chr(1)||${q(r)}||chr(2), " +
          s"chr(1)||${q(l + r)}||chr(2))"
      }

  // The q47/q93 language-score expressions and verdict CASE, generated
  // from the SAME constants the operator classifies with
  // (TextAnalysisOps.Stopsets/ScriptRanges) — the two sides cannot
  // drift. Stopword languages count token hits; script languages count
  // characters in their BMP block (length minus length-with-block-
  // removed, DuckDB regexp_replace with the 'g' flag = Spark's global
  // default).
  private def langCountSqls: Seq[(String, String)] = {
    def q(w: String) = "'" + w.replace("'", "''") + "'"
    graft.operators.TextAnalysisOps.Stopsets.map { case (l, ws) =>
      l -> s"CAST(len(list_filter(string_split(text,' '), t -> t IN (${ws.map(q).mkString(",")}))) AS BIGINT)"
    } ++ graft.operators.TextAnalysisOps.ScriptRanges.map { case (l, lo, hi) =>
      l -> f"CAST(length(text) - length(regexp_replace(text, '[\\x{$lo%04x}-\\x{$hi%04x}]', '', 'g')) AS BIGINT)"
    }
  }

  private def langCaseSql: String = {
    val langs = graft.operators.TextAnalysisOps.AllLangs
    val gr = s"GREATEST(${langs.map(l => s"n_$l").mkString(", ")})"
    langs.map(l => s"WHEN n_$l = $gr AND n_$l > 0 THEN '$l'")
      .mkString("CASE ", " ", " ELSE 'und' END")
  }

  // The q94/q94b oracles: the frozen ClfWeights / ClfWeightsSampled
  // artifacts as VALUES tables — parity pins each distributed trainer
  // bit-exactly (see Clf.trainTable / Clf.trainTableSampled).
  private def clfOracleOf(bias: Double, values: Seq[(Int, Double)]): String = {
    val rows = ((-1, bias) +: values)
      .map { case (b, w) => s"(CAST($b AS BIGINT), CAST('$w' AS DOUBLE))" }
      .mkString(", ")
    s"SELECT * FROM (VALUES $rows) t(feature, weight) ORDER BY feature"
  }
  private def clfTrainOracleSql: String =
    clfOracleOf(graft.operators.ClfWeights.Bias, graft.operators.ClfWeights.values)
  private def clfTrainSampledOracleSql: String =
    clfOracleOf(graft.operators.ClfWeightsSampled.Bias,
      graft.operators.ClfWeightsSampled.values)

  // The shared q95/q95b scoring CTE chain (ends at `sc`): q91's
  // hashed-feature CTE at the classifier's bucket width + the frozen
  // weights as a VALUES table + the exact-decimal per-doc reduce —
  // mirrors Clf.scoreOf term for term.
  private def clfScoreCtes: String = {
    val B = graft.operators.ClfWeights.Buckets
    val vs = graft.operators.ClfWeights.values
    // a placeholder row outside [0,B) keeps the SQL valid pre-freeze
    val rows = (if (vs.isEmpty) Seq((-2, 0.0)) else vs)
      .map { case (b, w) => s"(CAST($b AS BIGINT), CAST('$w' AS DOUBLE))" }
      .mkString(", ")
    val bias = graft.operators.ClfWeights.Bias
    s"""d AS (SELECT doc_id, source,
       |            list_filter(string_split(text, ' '), x -> x <> '') AS t
       |          FROM documents),
       |unig AS (SELECT doc_id, source, unnest(t) AS g FROM d),
       |bigr AS (SELECT doc_id, source, t[i] || ' ' || t[i+1] AS g
       |         FROM (SELECT doc_id, source, t,
       |                 unnest(generate_series(1, len(t) - 1)) AS i
       |               FROM d WHERE len(t) >= 2)),
       |feats AS (SELECT doc_id, source, ${PH("g")} % $B AS b, COUNT(*) AS k
       |          FROM (SELECT * FROM unig UNION ALL SELECT * FROM bigr)
       |          GROUP BY doc_id, source, b),
       |wt AS (SELECT b, w FROM (VALUES $rows) t(b, w)),
       |sc AS (SELECT f.doc_id, f.source, CAST(SUM(f.k) AS BIGINT) AS n_feats,
       |         CAST('$bias' AS DOUBLE) + ${S("CAST(f.k AS DOUBLE) * COALESCE(wt.w, 0.0)")} /
       |           CAST(SUM(f.k) AS DOUBLE) AS logit
       |       FROM feats f LEFT JOIN wt USING (b)
       |       GROUP BY f.doc_id, f.source)""".stripMargin
  }

  // The q95 oracle: the shared scoring chain + the calibrated logit-0
  // verdict.
  private def qualityClfOracleSql: String =
    s"""WITH $clfScoreCtes
       |SELECT doc_id, source, n_feats, logit,
       |  CAST(logit > 0 AS INT) AS keep
       |FROM sc ORDER BY doc_id""".stripMargin

  // The q95b oracle: the shared scoring chain swept over the frozen
  // threshold list — mirrors Clf.thresholdCurve (counts are integers,
  // each rate one final IEEE division, null on an empty denominator).
  private def clfCurveOracleSql: String = {
    val ref = graft.operators.ClfWeights.RefSource
    val thrRows = graft.operators.Clf.CurveThresholds
      .map(t => s"(CAST('$t' AS DOUBLE))").mkString(", ")
    s"""WITH $clfScoreCtes,
       |thr AS (SELECT * FROM (VALUES $thrRows) t(threshold)),
       |agg AS (SELECT thr.threshold,
       |          CAST(COUNT(*) AS BIGINT) AS n_docs,
       |          CAST(SUM(CASE WHEN sc.logit > thr.threshold THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
       |          CAST(SUM(CASE WHEN sc.source = '$ref' THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
       |          CAST(SUM(CASE WHEN sc.logit > thr.threshold AND sc.source = '$ref' THEN 1 ELSE 0 END) AS BIGINT) AS n_ref_keep
       |        FROM sc, thr GROUP BY thr.threshold)
       |SELECT threshold, n_docs, n_keep,
       |  CASE WHEN n_docs > 0 THEN CAST(n_keep AS DOUBLE) / CAST(n_docs AS DOUBLE) END AS keep_rate,
       |  CASE WHEN n_ref > 0 THEN CAST(n_ref_keep AS DOUBLE) / CAST(n_ref AS DOUBLE) END AS ref_recall,
       |  CASE WHEN n_docs - n_ref > 0 THEN CAST(n_keep - n_ref_keep AS DOUBLE) / CAST(n_docs - n_ref AS DOUBLE) END AS bg_keep_rate
       |FROM agg ORDER BY threshold""".stripMargin
  }

  // The q95d oracle: the shared scoring chain -> algebraic-sigmoid
  // confidence deciles -> reliability rows + the ECE rollup (bin = -1),
  // decimal-carrier means and the identical fixed IEEE sigmoid chain.
  private def clfCalibrationOracleSql: String = {
    val ref = graft.operators.ClfWeights.RefSource
    s"""WITH $clfScoreCtes,
       |pb AS (SELECT
       |         LEAST(9, CAST(FLOOR((0.5 + 0.5 * logit / (1 + ABS(logit))) * 10) AS BIGINT)) AS bin,
       |         0.5 + 0.5 * logit / (1 + ABS(logit)) AS p,
       |         CASE WHEN source = '$ref' THEN 1 ELSE 0 END AS is_ref
       |       FROM sc),
       |bins AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |           CAST(SUM(is_ref) AS BIGINT) AS n_ref,
       |           ${A("p")} AS mean_conf
       |         FROM pb GROUP BY bin),
       |bins2 AS (SELECT bin, n_docs, n_ref, mean_conf,
       |            CAST(n_ref AS DOUBLE) / CAST(n_docs AS DOUBLE) AS ref_rate,
       |            ABS(mean_conf - CAST(n_ref AS DOUBLE) / CAST(n_docs AS DOUBLE)) AS gap
       |          FROM bins)
       |SELECT bin, n_docs, n_ref, mean_conf, ref_rate, gap FROM bins2
       |UNION ALL
       |SELECT CAST(-1 AS BIGINT), CAST(SUM(n_docs) AS BIGINT), CAST(SUM(n_ref) AS BIGINT),
       |  ${S("CAST(n_docs AS DOUBLE) * mean_conf")} / CAST(SUM(n_docs) AS DOUBLE),
       |  CAST(SUM(n_ref) AS DOUBLE) / CAST(SUM(n_docs) AS DOUBLE),
       |  ${S("CAST(n_docs AS DOUBLE) * gap")} / CAST(SUM(n_docs) AS DOUBLE)
       |FROM bins2 ORDER BY bin""".stripMargin
  }

  // The shared q90/q90b LM-scoring chain (CTE list ending at `lmsc`,
  // one row per scored doc) — mirrors CurationOps.lmScoreOf term for
  // term (reference source 'src0', add-one smoothing, the greatest(..,1)
  // empty-reference guard, carrier-exact per-doc reduce).
  private def lmScoreCtes: String =
    s"""d AS (SELECT doc_id, source,
       |            list_filter(string_split(text, ' '), x -> x <> '') AS t
       |          FROM documents),
       |bg AS (SELECT doc_id, source, t[i] AS w1, t[i+1] AS w2
       |       FROM (SELECT doc_id, source, t,
       |               unnest(generate_series(1, len(t) - 1)) AS i
       |             FROM d WHERE len(t) >= 2)),
       |k AS (SELECT doc_id, source, w1, w2, COUNT(*) AS k
       |      FROM bg GROUP BY doc_id, source, w1, w2),
       |uni AS (SELECT w, COUNT(*) AS c1
       |        FROM (SELECT unnest(t) AS w FROM d WHERE source = 'src0')
       |        GROUP BY w),
       |bi AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg
       |       WHERE source = 'src0' GROUP BY w1, w2),
       |vv AS (SELECT COUNT(*) AS v FROM uni),
       |sc AS (SELECT k.doc_id, k.source, k.k,
       |         -ln(CAST(COALESCE(bi.c12, 0) + 1 AS DOUBLE) /
       |             CAST(GREATEST(COALESCE(uni.c1, 0) + vv.v, 1) AS DOUBLE)) AS nll
       |       FROM k LEFT JOIN bi ON k.w1 = bi.w1 AND k.w2 = bi.w2
       |              LEFT JOIN uni ON k.w1 = uni.w
       |              CROSS JOIN vv),
       |lmsc AS (SELECT doc_id, source,
       |  CAST(SUM(k) AS BIGINT) AS n_bigrams,
       |  ${S("CAST(k AS DOUBLE) * nll")} / CAST(SUM(k) AS DOUBLE) AS avg_nll
       |FROM sc GROUP BY doc_id, source)""".stripMargin

  // The q95c oracle: the shared scoring chain + ROW_NUMBER global ranks
  // (logit, doc_id — the identical total order), midranks per tied-logit
  // group, Mann-Whitney AUC and the calibrated-threshold metrics —
  // mirrors Clf.evalTable term for term (carrier sum over group terms,
  // same IEEE chains).
  private def clfEvalOracleSql: String = {
    val ref = graft.operators.ClfWeights.RefSource
    s"""WITH $clfScoreCtes,
       |ranked AS (SELECT doc_id, source, logit,
       |             ROW_NUMBER() OVER (ORDER BY logit, doc_id) AS r FROM sc),
       |grp AS (SELECT logit,
       |          CAST(SUM(r) AS BIGINT) AS sum_ranks,
       |          CAST(COUNT(*) AS BIGINT) AS cnt,
       |          CAST(SUM(CASE WHEN source = '$ref' THEN 1 ELSE 0 END) AS BIGINT) AS pos_g
       |        FROM ranked GROUP BY logit),
       |mid AS (SELECT CAST(SUM(CAST(
       |          CAST(pos_g AS DOUBLE) * CAST(sum_ranks AS DOUBLE) / CAST(cnt AS DOUBLE)
       |          AS DECIMAL(27,6))) AS DOUBLE) AS sum_pos_midrank FROM grp),
       |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       |         CAST(SUM(CASE WHEN source = '$ref' THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
       |         CAST(SUM(CASE WHEN logit > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
       |         CAST(SUM(CASE WHEN logit > 0 AND source = '$ref' THEN 1 ELSE 0 END) AS BIGINT) AS n_ref_keep
       |       FROM sc)
       |SELECT n_docs, n_pos, n_docs - n_pos AS n_neg, n_keep, n_ref_keep,
       |  CASE WHEN n_pos > 0 AND n_docs - n_pos > 0 THEN
       |    (sum_pos_midrank - CAST(n_pos AS DOUBLE) * (CAST(n_pos AS DOUBLE) + 1.0) / 2.0)
       |    / (CAST(n_pos AS DOUBLE) * CAST(n_docs - n_pos AS DOUBLE)) END AS auc,
       |  CASE WHEN n_keep > 0 THEN CAST(n_ref_keep AS DOUBLE) / CAST(n_keep AS DOUBLE) END AS precision,
       |  CASE WHEN n_pos > 0 THEN CAST(n_ref_keep AS DOUBLE) / CAST(n_pos AS DOUBLE) END AS recall,
       |  CASE WHEN n_docs > 0 THEN
       |    CAST(n_ref_keep + (n_docs - n_pos) - (n_keep - n_ref_keep) AS DOUBLE)
       |    / CAST(n_docs AS DOUBLE) END AS accuracy
       |FROM st, mid""".stripMargin
  }

  // The q96 oracle: q86's ground-truth construction + one banded-pairs
  // CTE per layout over the same 16-hash signature, unioned and scored.
  private def bandCurveOracleSql: String = {
    val layoutCtes = graft.operators.DedupOps.CurveLayouts.map { case (nb, r) =>
      s"""b$nb AS (SELECT doc_id, i // $r AS band,
         |            string_agg(mh::VARCHAR, ',' ORDER BY i) AS sig
         |          FROM sigs GROUP BY doc_id, i // $r),
         |p$nb AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |        FROM b$nb a JOIN b$nb b
         |          ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id)""".stripMargin
    }.mkString(",\n")
    val armUnion = graft.operators.DedupOps.CurveLayouts.map { case (nb, r) =>
      s"SELECT $nb AS n_bands, $r AS rows_per_band, doc_a, doc_b FROM p$nb"
    }.mkString(" UNION ALL ")
    s"""WITH $SHINGLES,
       |posting AS (SELECT doc_id, unnest(hs) AS s FROM sh),
       |cnt AS (SELECT doc_id, CAST(len(hs) AS BIGINT) AS n FROM sh),
       |jp AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
       |       FROM posting a JOIN posting b ON a.s = b.s AND a.doc_id < b.doc_id
       |       GROUP BY a.doc_id, b.doc_id),
       |exact AS (SELECT doc_a, doc_b FROM jp
       |          JOIN cnt ca ON doc_a = ca.doc_id JOIN cnt cb ON doc_b = cb.doc_id
       |          WHERE shared / (ca.n + cb.n - shared) >= 0.5),
       |sigs AS (SELECT doc_id, i,
       |           list_min(list_transform(hs, v -> ((2*i+1)*v + 7919*i + 13) % 2147483647)) AS mh
       |         FROM sh, range(16) t(i)),
       |$layoutCtes,
       |cand AS ($armUnion),
       |nex AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_exact FROM exact),
       |agg AS (SELECT n_bands, rows_per_band, CAST(COUNT(*) AS BIGINT) AS n_candidates,
       |          CAST(SUM(CASE WHEN e.doc_a IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_caught
       |        FROM cand c LEFT JOIN exact e
       |          ON c.doc_a = e.doc_a AND c.doc_b = e.doc_b
       |        GROUP BY n_bands, rows_per_band)
       |SELECT CAST(n_bands AS BIGINT) AS n_bands,
       |  CAST(rows_per_band AS BIGINT) AS rows_per_band,
       |  n_candidates, n_exact, n_caught,
       |  CASE WHEN n_exact > 0 THEN CAST(n_caught AS DOUBLE) / CAST(n_exact AS DOUBLE)
       |       ELSE 0.0 END AS recall,
       |  CAST(n_caught AS DOUBLE) / CAST(n_candidates AS DOUBLE) AS jaccard_precision
       |FROM agg, nex ORDER BY rows_per_band""".stripMargin
  }

  // The q97 oracle: q82's removal-list SQL per window size, reduced to
  // the per-arm summary and unioned — mirrors CurationOps.deconCurve.
  private def deconCurveOracleSql: String = {
    val armCtes = graft.operators.CurationOps.DeconCurveKs.map { k =>
      s"""r0_$k AS (SELECT doc_id, unnest(generate_series(1, n - ${k - 1})) AS i, ts
         |       FROM t WHERE n >= $k),
         |wins_$k AS (SELECT doc_id, ('0x' || substr(md5(array_to_string(ts[i:i+${k - 1}], ' ')), 1, 15))::BIGINT AS rh FROM r0_$k),
         |held_$k AS (SELECT DISTINCT rh FROM wins_$k WHERE (doc_id * 2654435761) % 100 >= 80),
         |idx_$k AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_index FROM held_$k),
         |doc_$k AS (SELECT w.doc_id, SUM(CASE WHEN h.rh IS NOT NULL THEN 1 ELSE 0 END) > 0 AS drop
         |          FROM wins_$k w LEFT JOIN held_$k h ON w.rh = h.rh
         |          WHERE (w.doc_id * 2654435761) % 100 < 80 GROUP BY w.doc_id),
         |agg_$k AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_train_docs,
         |            CAST(COALESCE(SUM(CASE WHEN drop THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_flagged
         |          FROM doc_$k),
         |arm_$k AS (SELECT CAST($k AS BIGINT) AS k, i.n_index, a.n_train_docs, a.n_flagged,
         |            CASE WHEN a.n_train_docs > 0
         |                 THEN CAST(a.n_flagged AS DOUBLE) / CAST(a.n_train_docs AS DOUBLE)
         |                 ELSE 0.0 END AS flag_rate
         |          FROM agg_$k a CROSS JOIN idx_$k i)""".stripMargin
    }.mkString(",\n")
    val union = graft.operators.CurationOps.DeconCurveKs
      .map(k => s"SELECT * FROM arm_$k").mkString(" UNION ALL ")
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts,
       |                  len(string_split(text, ' ')) AS n FROM documents),
       |$armCtes
       |$union ORDER BY k""".stripMargin
  }

  // The q98 oracle: the q90/q91/q95 score constructions nested verbatim
  // (the q86 donor-oracle pattern), each pair ranked by ROW_NUMBER over
  // (score, doc_id) — the same total order as the Spark side's
  // distributed sort — and the Spearman arithmetic mirrored IEEE-op for
  // IEEE-op (exact-decimal Σd², one final division chain).
  private def qualityAgreementOracleSql: String = {
    val B = graft.operators.ClfWeights.Buckets
    val vs = graft.operators.ClfWeights.values
    val wRows = (if (vs.isEmpty) Seq((-2, 0.0)) else vs)
      .map { case (b, w) => s"(CAST($b AS BIGINT), CAST('$w' AS DOUBLE))" }
      .mkString(", ")
    val bias = graft.operators.ClfWeights.Bias
    def arm(tag: String, na: String, nb: String, a: String, b: String) =
      s"""j$tag AS (SELECT l.doc_id, l.score AS sa, r.score AS sb
         |        FROM $a l JOIN $b r USING (doc_id)),
         |r$tag AS (SELECT doc_id,
         |          ROW_NUMBER() OVER (ORDER BY sa, doc_id) AS ra,
         |          ROW_NUMBER() OVER (ORDER BY sb, doc_id) AS rb FROM j$tag),
         |arm$tag AS (SELECT '$na' AS method_a, '$nb' AS method_b,
         |          CAST(COUNT(*) AS BIGINT) AS n_docs,
         |          CASE WHEN COUNT(*) > 1 THEN
         |            1.0 - 6.0 * CAST(SUM(CAST(ra - rb AS DECIMAL(19,0)) *
         |                              CAST(ra - rb AS DECIMAL(19,0))) AS DOUBLE) /
         |              (CAST(COUNT(*) AS DOUBLE) *
         |               (CAST(COUNT(*) AS DOUBLE) * CAST(COUNT(*) AS DOUBLE) - 1.0))
         |          ELSE 0.0 END AS spearman
         |        FROM r$tag)""".stripMargin
    s"""WITH d AS (SELECT doc_id, source,
       |            list_filter(string_split(text, ' '), x -> x <> '') AS t
       |          FROM documents),
       |bg AS (SELECT doc_id, source, t[i] AS w1, t[i+1] AS w2
       |       FROM (SELECT doc_id, source, t,
       |               unnest(generate_series(1, len(t) - 1)) AS i
       |             FROM d WHERE len(t) >= 2)),
       |kk AS (SELECT doc_id, source, w1, w2, COUNT(*) AS k
       |      FROM bg GROUP BY doc_id, source, w1, w2),
       |uni AS (SELECT w, COUNT(*) AS c1
       |        FROM (SELECT unnest(t) AS w FROM d WHERE source = 'src0')
       |        GROUP BY w),
       |bi AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg
       |       WHERE source = 'src0' GROUP BY w1, w2),
       |vv AS (SELECT COUNT(*) AS v FROM uni),
       |lmrows AS (SELECT kk.doc_id, kk.k,
       |         -ln(CAST(COALESCE(bi.c12, 0) + 1 AS DOUBLE) /
       |             CAST(GREATEST(COALESCE(uni.c1, 0) + vv.v, 1) AS DOUBLE)) AS nll
       |       FROM kk LEFT JOIN bi ON kk.w1 = bi.w1 AND kk.w2 = bi.w2
       |              LEFT JOIN uni ON kk.w1 = uni.w
       |              CROSS JOIN vv),
       |lmsc AS (SELECT doc_id,
       |  -(${S("CAST(k AS DOUBLE) * nll")} / CAST(SUM(k) AS DOUBLE)) AS score
       |  FROM lmrows GROUP BY doc_id),
       |unig AS (SELECT doc_id, source, unnest(t) AS g FROM d),
       |bigr AS (SELECT doc_id, source, t[i] || ' ' || t[i+1] AS g
       |         FROM (SELECT doc_id, source, t,
       |                 unnest(generate_series(1, len(t) - 1)) AS i
       |               FROM d WHERE len(t) >= 2)),
       |featsd AS (SELECT doc_id, source, ${PH("g")} % 1024 AS b, COUNT(*) AS k
       |          FROM (SELECT * FROM unig UNION ALL SELECT * FROM bigr)
       |          GROUP BY doc_id, source, b),
       |ratio AS (SELECT b,
       |            SUM(CASE WHEN source = 'src0' THEN k ELSE 0 END) AS ct,
       |            SUM(CASE WHEN source <> 'src0' THEN k ELSE 0 END) AS cr
       |          FROM featsd GROUP BY b),
       |tot AS (SELECT SUM(ct) AS tt, SUM(cr) AS tr FROM ratio),
       |lrt AS (SELECT b,
       |          ln(CAST(ct + 1 AS DOUBLE) / CAST(tt + 1024 AS DOUBLE)) -
       |          ln(CAST(cr + 1 AS DOUBLE) / CAST(tr + 1024 AS DOUBLE)) AS lr
       |        FROM ratio CROSS JOIN tot),
       |dsirsc AS (SELECT f.doc_id,
       |  ${S("CAST(f.k AS DOUBLE) * lrt.lr")} AS score
       |  FROM featsd f JOIN lrt ON f.b = lrt.b WHERE f.source <> 'src0'
       |  GROUP BY f.doc_id),
       |featsc AS (SELECT doc_id, source, ${PH("g")} % $B AS b, COUNT(*) AS k
       |          FROM (SELECT * FROM unig UNION ALL SELECT * FROM bigr)
       |          GROUP BY doc_id, source, b),
       |wt AS (SELECT b, w FROM (VALUES $wRows) t(b, w)),
       |clfsc AS (SELECT f.doc_id,
       |         CAST('$bias' AS DOUBLE) + ${S("CAST(f.k AS DOUBLE) * COALESCE(wt.w, 0.0)")} /
       |           CAST(SUM(f.k) AS DOUBLE) AS score
       |       FROM featsc f LEFT JOIN wt USING (b)
       |       GROUP BY f.doc_id),
       |${arm("1", "lm", "dsir", "lmsc", "dsirsc")},
       |${arm("2", "lm", "clf", "lmsc", "clfsc")},
       |${arm("3", "dsir", "clf", "dsirsc", "clfsc")}
       |SELECT * FROM arm1 UNION ALL SELECT * FROM arm2
       |UNION ALL SELECT * FROM arm3 ORDER BY method_a, method_b""".stripMargin
  }

  // The q99 oracle: per window size k the q65/q83 60-bit window-hash
  // construction verbatim, per-(doc, gram) counts + sorted position
  // lists, the deterministic argmax gram (cnt DESC, rh ASC — mirrors
  // Spark's max_by(ps, struct(cnt, -rh))), and merged-interval coverage
  // as list arithmetic (mirrors CurationOps.coveredTokens exactly:
  // Σ min(k, nextStart − start), last window contributes k).
  private def repetitionProfileOracleSql(ns: Seq[Int]): String = {
    def cov(l: String, k: Int) =
      s"""CASE WHEN len($l) = 0 THEN 0 ELSE CAST(list_sum(
         |  list_transform(range(1, len($l) + 1), i ->
         |    CASE WHEN i < len($l) THEN least($k, $l[i + 1] - $l[i]) ELSE $k END))
         | AS BIGINT) END""".stripMargin
    val blocks = ns.map { k =>
      s"""r$k AS (SELECT doc_id, CAST(unnest(generate_series(1, n - ${k - 1})) AS BIGINT) AS pos, ts
         |       FROM t WHERE n >= $k),
         |h$k AS (SELECT doc_id, pos,
         |         ('0x' || substr(md5(array_to_string(ts[pos:pos+${k - 1}], ' ')), 1, 15))::BIGINT AS rh
         |       FROM r$k),
         |g$k AS (SELECT doc_id, rh, CAST(COUNT(*) AS BIGINT) AS cnt,
         |         list_sort(list(pos)) AS ps
         |       FROM h$k GROUP BY doc_id, rh),
         |a$k AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_windows,
         |         CAST(MAX(cnt) AS BIGINT) AS top_count,
         |         list_sort(COALESCE(flatten(list(ps) FILTER (WHERE cnt >= 2)),
         |                            CAST([] AS BIGINT[]))) AS dup_ps
         |       FROM g$k GROUP BY doc_id),
         |tp$k AS (SELECT doc_id, ps AS top_ps FROM
         |         (SELECT doc_id, ps, ROW_NUMBER() OVER
         |            (PARTITION BY doc_id ORDER BY cnt DESC, rh) AS rn FROM g$k) s
         |        WHERE rn = 1),
         |arm$k AS (SELECT a.doc_id, CAST($k AS BIGINT) AS n,
         |         a.n_windows + ${k - 1} AS n_tokens, a.n_windows, a.top_count,
         |         CAST(${cov("tp.top_ps", k)} AS DOUBLE) /
         |           CAST(a.n_windows + ${k - 1} AS DOUBLE) AS top_cover_frac,
         |         CAST(${cov("a.dup_ps", k)} AS DOUBLE) /
         |           CAST(a.n_windows + ${k - 1} AS DOUBLE) AS dup_cover_frac
         |       FROM a$k a JOIN tp$k tp USING (doc_id))""".stripMargin
    }.mkString(",\n")
    val union = ns.map(k => s"SELECT * FROM arm$k").mkString(" UNION ALL ")
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts,
       |            len(string_split(text, ' ')) AS n FROM documents),
       |$blocks
       |$union ORDER BY doc_id, n""".stripMargin
  }

  // Distinct hashed 3-gram shingles per document (mirrors
  // DedupOps.hashedShingles: word-level charHash, arithmetic 3-gram combine).
  private def SHINGLES =
    s"""tok AS (SELECT doc_id, list_transform(string_split(text, ' '), w -> ${PH("w")}) AS ws
       |       FROM documents WHERE len(string_split(text, ' ')) >= 3),
       |sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(ws) - 1),
       |         i -> ((ws[i]*1000003 + ws[i+1]) % 1000000007 * 1000003 + ws[i+2]) % 1000000007)) AS hs
       |       FROM tok)""".stripMargin

  // Double-widened embedding + L2 norm (mirrors VectorFunctions).
  /** The trained IVF quantizer as a DuckDB VALUES table — generated from
    * the SAME frozen constants the Spark query broadcasts (IvfCentroids),
    * so the coarse assignment is engine-exact by construction.
    */
  private def ivfCentsValues: String =
    graft.operators.IvfCentroids.values.zipWithIndex.map { case (cv, i) =>
      s"(CAST($i AS BIGINT), [${cv.mkString(", ")}]::DOUBLE[])"
    }.mkString("VALUES ", ", ", "")

  /** The AUTO-k quantizer's frozen gate-lake centroids as a DuckDB VALUES
    * table (IvfCentroidsAuto — full-precision shortest-repr doubles, so
    * SQL literals parse back to the identical bits the live trainer
    * produces; a spec pins live == frozen). Fails loudly pre-freeze. */
  private def ivfCentsAutoValues: String = {
    require(graft.operators.IvfCentroidsAuto.values.nonEmpty,
      "IvfCentroidsAuto not frozen — run TrainQuantizers --auto and paste")
    // each element rides as a STRING cast to DOUBLE: DuckDB lexes a bare
    // decimal literal as DECIMAL and then converts (double rounding — 1
    // ulp off shortest-repr on ~20% of values, caught when q101 first
    // exposed raw csim values); '…'::DOUBLE is a direct strtod parse and
    // recovers the exact frozen bits
    graft.operators.IvfCentroidsAuto.values.zipWithIndex.map { case (cv, i) =>
      s"(CAST($i AS BIGINT), [${cv.map(x => s"'$x'::DOUBLE").mkString(", ")}]::DOUBLE[])"
    }.mkString("VALUES ", ", ", "")
  }

  /** One IMI half codebook as a DuckDB VALUES table (ImiCodebooks —
    * full-precision '…'::DOUBLE literals, the ivfCentsAutoValues device).
    * Fails loudly pre-freeze. */
  private def imiHalfValues(cb: Array[Array[Double]]): String = {
    require(cb.nonEmpty,
      "ImiCodebooks not frozen — run TrainQuantizers --imi and paste")
    cb.zipWithIndex.map { case (cv, i) =>
      s"(CAST($i AS BIGINT), [${cv.map(x => s"'$x'::DOUBLE").mkString(", ")}]::DOUBLE[])"
    }.mkString("VALUES ", ", ", "")
  }

  /** The SHARED IMI search CTE chain (q46e/q46f): per-half L2 argmin
    * assignment from the frozen ImiCodebooks, additive cell-grid query
    * probing at 4 cells, cosine probe-then-rank ending in `imiTop`
    * (q_id, neighbor_id, cos, rank ≤ 3). ONE text — the search being
    * gated and its recall gate cannot drift apart. Expects EMB_NORM's
    * `n` upstream. */
  private def imiSearchCtes: String = imiSearchCtesK(3, "")

  /** The IMI chain parameterized by result depth `k` and a CTE-name
    * prefix `p` so it can coexist with the frozen-IVF asg/qs/cp chains in
    * one query (the q107b multi-arm oracle). */
  private def imiSearchCtesK(k: Int, p: String): String = {
    val kk = graft.operators.ImiCodebooks.k
    s"""${p}cb1 AS (SELECT i1, c FROM (${imiHalfValues(graft.operators.ImiCodebooks.half1)}) t(i1, c)),
       |${p}cb2 AS (SELECT i2, c FROM (${imiHalfValues(graft.operators.ImiCodebooks.half2)}) t(i2, c)),
       |${p}d1 AS (SELECT n.vec_id, b.i1,
       |         list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 33),
       |           i -> (n.v[i] - b.c[i]) * (n.v[i] - b.c[i]))), (x2, y2) -> x2 + y2) AS dd
       |       FROM n, ${p}cb1 b),
       |${p}d2 AS (SELECT n.vec_id, b.i2,
       |         list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 33),
       |           i -> (n.v[i + 32] - b.c[i]) * (n.v[i + 32] - b.c[i]))), (x2, y2) -> x2 + y2) AS dd
       |       FROM n, ${p}cb2 b),
       |${p}a1 AS (SELECT vec_id, i1 FROM (SELECT vec_id, i1,
       |         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dd, i1) AS rk FROM ${p}d1) WHERE rk = 1),
       |${p}a2 AS (SELECT vec_id, i2 FROM (SELECT vec_id, i2,
       |         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dd, i2) AS rk FROM ${p}d2) WHERE rk = 1),
       |${p}asg AS (SELECT a1.vec_id, CAST(a1.i1 * $kk + a2.i2 AS BIGINT) AS list_id
       |        FROM ${p}a1 a1 JOIN ${p}a2 a2 ON a1.vec_id = a2.vec_id),
       |${p}probe AS (SELECT d1.vec_id, CAST(d1.i1 * $kk + d2.i2 AS BIGINT) AS list_id,
       |            ROW_NUMBER() OVER (PARTITION BY d1.vec_id
       |              ORDER BY d1.dd + d2.dd, d1.i1 * $kk + d2.i2) AS crank
       |          FROM ${p}d1 d1 JOIN ${p}d2 d2 ON d1.vec_id = d2.vec_id
       |          WHERE d1.vec_id < 10),
       |${p}qs AS (SELECT p.vec_id AS q_id, n.v AS qv, n.nrm AS qnrm, p.list_id
       |       FROM ${p}probe p JOIN n ON n.vec_id = p.vec_id WHERE p.crank <= 4),
       |${p}cp AS (SELECT n.vec_id, n.v, n.nrm, a.list_id
       |       FROM ${p}asg a JOIN n ON n.vec_id = a.vec_id WHERE n.vec_id >= 10),
       |${p}imij AS (SELECT q_id, cp.vec_id AS neighbor_id,
       |        list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65),
       |          i -> qs.qv[i] * cp.v[i])), (x2, y2) -> x2 + y2) / (qs.qnrm * cp.nrm) AS cos
       |      FROM ${p}cp cp JOIN ${p}qs qs USING (list_id)),
       |${p}imiTop AS (SELECT q_id, neighbor_id, cos, rank FROM (
       |    SELECT q_id, neighbor_id, cos,
       |      CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank
       |    FROM ${p}imij) t
       |  WHERE rank <= $k)""".stripMargin
  }

  /** The trained PQ codebooks as a DuckDB VALUES table — generated from the
    * SAME frozen constants the Spark query broadcasts (PqCodebooks), so
    * code assignment is engine-exact by construction.
    */
  private def pqBooksValues: String =
    graft.operators.PqCodebooks.values.zipWithIndex.flatMap { case (book, sub) =>
      book.zipWithIndex.map { case (cv, code) =>
        s"(CAST($sub AS BIGINT), CAST($code AS BIGINT), [${cv.mkString(", ")}]::DOUBLE[])"
      }
    }.mkString("VALUES ", ", ", "")

  /** The q112/q112b oracle (ONE text — the sharded path is spec-pinned
    * bit-equal to the window form, so one oracle adjudicates both). */
  private def levelShiftOracleSql: String =
    """WITH st AS (
        |  SELECT event_type, COUNT(*) AS n,
        |    CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(value * value AS DECIMAL(27,6))) AS DOUBLE) AS sx2
        |  FROM events GROUP BY 1),
        |st2 AS (
        |  SELECT event_type, sqrt(sx2 / n - (sx / n) * (sx / n)) AS std FROM st),
        |win AS (
        |  SELECT event_id, event_type,
        |    COUNT(*) OVER wb AS n_before, COUNT(*) OVER wa AS n_after,
        |    CAST(SUM(CAST(value AS DECIMAL(27,6))) OVER wb AS DOUBLE) AS sb,
        |    CAST(SUM(CAST(value AS DECIMAL(27,6))) OVER wa AS DOUBLE) AS sa
        |  FROM events
        |  WINDOW
        |    wb AS (PARTITION BY event_type ORDER BY epoch_ns(ts), event_id
        |           ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING),
        |    wa AS (PARTITION BY event_type ORDER BY epoch_ns(ts), event_id
        |           ROWS BETWEEN CURRENT ROW AND 19 FOLLOWING))
        |SELECT event_id, event_type, mean_before, mean_after, shift_z FROM (
        |  SELECT w.event_id, w.event_type,
        |    w.sb / w.n_before AS mean_before,
        |    w.sa / w.n_after AS mean_after,
        |    (w.sa / w.n_after - w.sb / w.n_before) / (s.std * sqrt(2.0 / 20.0)) AS shift_z
        |  FROM win w JOIN st2 s USING (event_type)
        |  WHERE w.n_before = 20 AND w.n_after = 20 AND s.std > 0.0 AND NOT isnan(s.std)) t
        |WHERE ABS(shift_z) > 3.0
        |ORDER BY event_id""".stripMargin

  /** A frozen OPQ rotation as a DuckDB VALUES table of 64 (i, rv) rows
    * — row i produces rotated coordinate i. Full-precision '…'::DOUBLE
    * literals (the ivfCentsAutoValues device); fails loudly pre-freeze. */
  private def rotValuesOf(rot: Array[Array[Double]], what: String): String = {
    require(rot.nonEmpty, s"$what not frozen — run TrainQuantizers and paste")
    rot.zipWithIndex.map { case (rv, i) =>
      s"(CAST(${i + 1} AS BIGINT), [${rv.map(x => s"'$x'::DOUBLE").mkString(", ")}]::DOUBLE[])"
    }.mkString("VALUES ", ", ", "")
  }

  /** A frozen rotated-space codebook set as a DuckDB VALUES table,
    * full-precision '…'::DOUBLE literals. */
  private def booksValuesOf(books: Array[Array[Array[Double]]], what: String): String = {
    require(books.nonEmpty, s"$what not frozen — run TrainQuantizers and paste")
    books.zipWithIndex.flatMap { case (book, sub) =>
      book.zipWithIndex.map { case (cv, code) =>
        s"(CAST($sub AS BIGINT), CAST($code AS BIGINT), [${cv.map(x => s"'$x'::DOUBLE").mkString(", ")}]::DOUBLE[])"
      }
    }.mkString("VALUES ", ", ", "")
  }

  private def opqRotValues: String =
    rotValuesOf(graft.operators.OpqModel.rotation, "OpqModel")
  private def opqBooksValues: String =
    booksValuesOf(graft.operators.OpqModel.books, "OpqModel")
  private def opqResRotValues: String =
    rotValuesOf(graft.operators.OpqResidualModel.rotation, "OpqResidualModel")
  private def opqResBooksValues: String =
    booksValuesOf(graft.operators.OpqResidualModel.books, "OpqResidualModel")

  /** The frozen RESIDUAL PQ codebooks (PqResidualCodebooks — q70c and
    * q68's ivfpq_res arm) as a DuckDB VALUES table, same contract. */
  private def pqResBooksValues: String =
    graft.operators.PqResidualCodebooks.values.zipWithIndex.flatMap { case (book, sub) =>
      book.zipWithIndex.map { case (cv, code) =>
        s"(CAST($sub AS BIGINT), CAST($code AS BIGINT), [${cv.mkString(", ")}]::DOUBLE[])"
      }
    }.mkString("VALUES ", ", ", "")

  /** The IVFADC pipeline as DuckDB CTEs (q70b/q70c, and q68's ivfpq +
    * ivfpq_res arms): consumes `$cp(vec_id, v, list_id)` (corpus — raw
    * vectors for q70b, residuals v - c(v) for q70c), `$qs(q_id, qv,
    * list_id)` (probed queries, crank <= 2 — per-list residuals for
    * q70c) and `$books(sub_idx, code, cv)`. CTE names carry prefix `p`
    * so the raw and residual pipelines can coexist in one query (q68).
    * Mirrors SimilarityOps.knnIvfPq/knnIvfPqResidual: PQ code assignment
    * within the list-tagged corpus, ADC only against probed lists,
    * per-subspace sums added in fixed expression order.
    */
  private def ivfPqCtes: String = ivfPqCtesNamed("pq", "cp", "qs", "books")

  private def ivfPqCtesNamed(p: String, cp: String, qs: String, books: String): String =
    s"""${p}subs AS (SELECT vec_id, list_id, i AS sub_idx, v[i*8+1 : i*8+8] AS sv
       |           FROM $cp, range(8) t(i)),
       |${p}asg AS (SELECT vec_id, list_id, sub_idx, code FROM (
       |            SELECT s.vec_id, s.list_id, s.sub_idx, b.code,
       |              ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.sub_idx
       |                ORDER BY list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 9),
       |                  i -> (s.sv[i] - b.cv[i]) * (s.sv[i] - b.cv[i]))), (acc, z) -> acc + z) ASC,
       |                b.code ASC) AS rk
       |            FROM ${p}subs s JOIN $books b ON s.sub_idx = b.sub_idx) t WHERE rk = 1),
       |${p}recon AS (SELECT a.vec_id, a.list_id, a.sub_idx, b.cv FROM ${p}asg a
       |            JOIN $books b ON a.sub_idx = b.sub_idx AND a.code = b.code),
       |${p}qsubs AS (SELECT q_id, list_id, i AS sub_idx, qv[i*8+1 : i*8+8] AS qsv
       |            FROM $qs, range(8) t(i)),
       |${p}pair AS (SELECT q.q_id, r.vec_id AS neighbor_id, r.sub_idx,
       |             list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 9),
       |               i -> (q.qsv[i] - r.cv[i]) * (q.qsv[i] - r.cv[i]))), (acc, z) -> acc + z) AS dsub
       |           FROM ${p}recon r JOIN ${p}qsubs q ON r.sub_idx = q.sub_idx AND r.list_id = q.list_id),
       |${p}agg AS (SELECT q_id, neighbor_id,
       |            ${(0 until 8).map(s0 => s"SUM(CASE WHEN sub_idx = $s0 THEN dsub END) AS d$s0").mkString(", ")}
       |          FROM ${p}pair GROUP BY q_id, neighbor_id),
       |${p}top AS (SELECT q_id, neighbor_id, adc_dist,
       |            CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY adc_dist ASC, neighbor_id) AS BIGINT) AS rank
       |          FROM (SELECT q_id, neighbor_id,
       |                  ${(0 until 8).map(s0 => s"d$s0").mkString(" + ")} AS adc_dist
       |                FROM ${p}agg) t0)""".stripMargin

  /** The q68 recall-evaluation oracle as a function of the query/corpus
    * split: q68 uses the frozen serving convention (QueryIdMax = 10);
    * q68b widens to 300 query points so the per-arm recall means carry
    * enough sample to actually RANK the four arms (30 pairs could not
    * separate residual from raw — SURVEY §6). */
  private def annRecallOracleSql(qmax: Int): String =
    s"""WITH $EMB_NORM,
         |exj AS (SELECT a.vec_id AS q_id, b.vec_id AS neighbor_id,
         |          $DOT64 / (a.nrm * b.nrm) AS cos
         |        FROM n a JOIN n b ON a.vec_id < $qmax AND b.vec_id >= $qmax),
         |ex AS (SELECT q_id, neighbor_id FROM (
         |         SELECT q_id, neighbor_id,
         |           ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS rank
         |         FROM exj) t WHERE rank <= 3),
         |bk AS (SELECT vec_id, v, nrm,
         |  ${signBlocksSql(8)} AS bucket
         |  FROM n),
         |lshj AS (SELECT a.vec_id AS q_id, b.vec_id AS neighbor_id,
         |           $DOT64 / (a.nrm * b.nrm) AS cos
         |         FROM bk a JOIN bk b ON a.vec_id < $qmax AND b.vec_id >= $qmax AND a.bucket = b.bucket),
         |lsh AS (SELECT q_id, neighbor_id FROM (
         |          SELECT q_id, neighbor_id,
         |            ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS rank
         |          FROM lshj) t WHERE rank <= 3),
         |cents AS (SELECT list_id, cv,
         |            sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65),
         |              i -> cv[i] * cv[i])), (x2, y2) -> x2 + y2)) AS cnrm
         |          FROM ($ivfCentsValues) t(list_id, cv)),
         |asg AS (SELECT vec_id, v, nrm, list_id, csim,
         |          ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, list_id) AS crank
         |        FROM (SELECT n.vec_id, n.v, n.nrm, c.list_id,
         |                list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65),
         |                  i -> n.v[i] * c.cv[i])), (x2, y2) -> x2 + y2) / (n.nrm * c.cnrm) AS csim
         |              FROM n, cents c) t),
         |qs AS (SELECT vec_id AS q_id, v AS qv, nrm AS qnrm, list_id FROM asg
         |       WHERE vec_id < $qmax AND crank <= 2),
         |cp AS (SELECT vec_id, v, nrm, list_id FROM asg WHERE vec_id >= $qmax AND crank = 1),
         |ivfj AS (SELECT q_id, cp.vec_id AS neighbor_id,
         |           list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65),
         |             i -> qs.qv[i] * cp.v[i])), (x2, y2) -> x2 + y2) / (qs.qnrm * cp.nrm) AS cos
         |         FROM cp JOIN qs USING (list_id)),
         |ivf AS (SELECT q_id, neighbor_id FROM (
         |          SELECT q_id, neighbor_id,
         |            ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS rank
         |          FROM ivfj) t WHERE rank <= 3),
         |books AS (SELECT sub_idx, code, cv FROM ($pqBooksValues) t(sub_idx, code, cv)),
         |$ivfPqCtes,
         |ivfpq AS (SELECT q_id, neighbor_id FROM pqtop WHERE rank <= 3),
         |rbooks AS (SELECT sub_idx, code, cv FROM ($pqResBooksValues) t(sub_idx, code, cv)),
         |qsr AS (SELECT a.vec_id AS q_id,
         |          list_transform(range(1, 65), i -> a.v[i] - c.cv[i]) AS qv, a.list_id
         |        FROM asg a JOIN cents c USING (list_id)
         |        WHERE a.vec_id < $qmax AND a.crank <= 2),
         |cpr AS (SELECT a.vec_id,
         |          list_transform(range(1, 65), i -> a.v[i] - c.cv[i]) AS v, a.list_id
         |        FROM asg a JOIN cents c USING (list_id)
         |        WHERE a.vec_id >= $qmax AND a.crank = 1),
         |${ivfPqCtesNamed("pqr", "cpr", "qsr", "rbooks")},
         |ivfpqr AS (SELECT q_id, neighbor_id FROM pqrtop WHERE rank <= 3),
         |orot AS (SELECT i, rv FROM ($opqResRotValues) t(i, rv)),
         |qsoj AS (SELECT q.q_id, q.list_id, r.i,
         |           list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65),
         |             j -> r.rv[j] * q.qv[j])), (acc, z) -> acc + z) AS x
         |         FROM qsr q, orot r),
         |qso AS (SELECT q_id, list_id, list(x ORDER BY i) AS qv FROM qsoj GROUP BY q_id, list_id),
         |cpoj AS (SELECT c.vec_id, c.list_id, r.i,
         |           list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65),
         |             j -> r.rv[j] * c.v[j])), (acc, z) -> acc + z) AS x
         |         FROM cpr c, orot r),
         |cpo AS (SELECT vec_id, list_id, list(x ORDER BY i) AS v FROM cpoj GROUP BY vec_id, list_id),
         |obooks AS (SELECT sub_idx, code, cv FROM ($opqResBooksValues) t(sub_idx, code, cv)),
         |${ivfPqCtesNamed("pqo", "cpo", "qso", "obooks")},
         |opqivf AS (SELECT q_id, neighbor_id FROM pqotop WHERE rank <= 3),
         |idx AS (SELECT q_id, neighbor_id, 'lsh' AS src FROM lsh
         |        UNION ALL SELECT q_id, neighbor_id, 'ivf' AS src FROM ivf
         |        UNION ALL SELECT q_id, neighbor_id, 'ivfpq' AS src FROM ivfpq
         |        UNION ALL SELECT q_id, neighbor_id, 'ivfpq_res' AS src FROM ivfpqr
         |        UNION ALL SELECT q_id, neighbor_id, 'opq_ivf' AS src FROM opqivf)
         |SELECT q_id, n_exact, lsh_hits, ivf_hits, ivfpq_hits, ivfpq_res_hits, opq_ivf_hits,
         |  CAST(lsh_hits AS DOUBLE) / CAST(n_exact AS DOUBLE) AS lsh_recall,
         |  CAST(ivf_hits AS DOUBLE) / CAST(n_exact AS DOUBLE) AS ivf_recall,
         |  CAST(ivfpq_hits AS DOUBLE) / CAST(n_exact AS DOUBLE) AS ivfpq_recall,
         |  CAST(ivfpq_res_hits AS DOUBLE) / CAST(n_exact AS DOUBLE) AS ivfpq_res_recall,
         |  CAST(opq_ivf_hits AS DOUBLE) / CAST(n_exact AS DOUBLE) AS opq_ivf_recall
         |FROM (SELECT ex.q_id,
         |        CAST(COUNT(DISTINCT ex.neighbor_id) AS BIGINT) AS n_exact,
         |        CAST(COUNT(CASE WHEN idx.src = 'lsh' THEN 1 END) AS BIGINT) AS lsh_hits,
         |        CAST(COUNT(CASE WHEN idx.src = 'ivf' THEN 1 END) AS BIGINT) AS ivf_hits,
         |        CAST(COUNT(CASE WHEN idx.src = 'ivfpq' THEN 1 END) AS BIGINT) AS ivfpq_hits,
         |        CAST(COUNT(CASE WHEN idx.src = 'ivfpq_res' THEN 1 END) AS BIGINT) AS ivfpq_res_hits,
         |        CAST(COUNT(CASE WHEN idx.src = 'opq_ivf' THEN 1 END) AS BIGINT) AS opq_ivf_hits
         |      FROM ex LEFT JOIN idx
         |        ON ex.q_id = idx.q_id AND ex.neighbor_id = idx.neighbor_id
         |      GROUP BY ex.q_id) t
         |ORDER BY q_id""".stripMargin

  /** q107's graded-metric oracle: the q68 oracle's exact/IVF arm chains
    * (same asg/qs/cp CTEs, rank kept to k), the DCG discount and
    * ideal-DCG PREFIX tables as VALUES of the SAME double literals the
    * Scala side uses (SimilarityOps.retrievalDisc/retrievalIdcg —
    * StrictMath, computed once; neither engine calls its own log), each
    * rel·disc term through the DECIMAL carrier, rr/ndcg single IEEE ops. */
  private def retrievalQualityOracleSql(qmax: Int, k: Int): String = {
    val disc = operators.SimilarityOps.retrievalDisc(k)
    val idcg = operators.SimilarityOps.retrievalIdcg(k)
    val discValues = (1 to k).map(i =>
      s"(CAST($i AS BIGINT), CAST(${disc(i - 1)} AS DOUBLE))").mkString("VALUES ", ", ", "")
    val idcgValues = (1 to k).map(m =>
      s"(CAST($m AS BIGINT), CAST(${idcg(m - 1)} AS DOUBLE))").mkString("VALUES ", ", ", "")
    s"""WITH $EMB_NORM,
       |exj AS (SELECT a.vec_id AS q_id, b.vec_id AS neighbor_id,
       |          $DOT64 / (a.nrm * b.nrm) AS cos
       |        FROM n a JOIN n b ON a.vec_id < $qmax AND b.vec_id >= $qmax),
       |ex AS (SELECT q_id, neighbor_id, rank FROM (
       |         SELECT q_id, neighbor_id,
       |           ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS rank
       |         FROM exj) t WHERE rank <= $k),
       |cents AS (SELECT list_id, cv,
       |            sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65),
       |              i -> cv[i] * cv[i])), (x2, y2) -> x2 + y2)) AS cnrm
       |          FROM ($ivfCentsValues) t(list_id, cv)),
       |asg AS (SELECT vec_id, v, nrm, list_id, csim,
       |          ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, list_id) AS crank
       |        FROM (SELECT n.vec_id, n.v, n.nrm, c.list_id,
       |                list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65),
       |                  i -> n.v[i] * c.cv[i])), (x2, y2) -> x2 + y2) / (n.nrm * c.cnrm) AS csim
       |              FROM n, cents c) t),
       |qs AS (SELECT vec_id AS q_id, v AS qv, nrm AS qnrm, list_id FROM asg
       |       WHERE vec_id < $qmax AND crank <= 2),
       |cp AS (SELECT vec_id, v, nrm, list_id FROM asg WHERE vec_id >= $qmax AND crank = 1),
       |ivfj AS (SELECT q_id, cp.vec_id AS neighbor_id,
       |           list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65),
       |             i -> qs.qv[i] * cp.v[i])), (x2, y2) -> x2 + y2) / (qs.qnrm * cp.nrm) AS cos
       |         FROM cp JOIN qs USING (list_id)),
       |ivf AS (SELECT q_id, neighbor_id, rank FROM (
       |          SELECT q_id, neighbor_id,
       |            ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS rank
       |          FROM ivfj) t WHERE rank <= $k),
       |disc AS (SELECT * FROM ($discValues) t(i, disc)),
       |idcg AS (SELECT * FROM ($idcgValues) t(m, idcg)),
       |per AS (SELECT e.q_id,
       |          CAST(COUNT(*) AS BIGINT) AS n_exact,
       |          CAST(COUNT(a.rank) AS BIGINT) AS hits,
       |          CAST(SUM(CAST(CASE WHEN a.rank IS NOT NULL
       |            THEN CAST(($k + 1 - e.rank) AS DOUBLE) * d.disc ELSE 0.0 END
       |            AS DECIMAL(27,6))) AS DOUBLE) AS dcg,
       |          COALESCE(MAX(CASE WHEN e.rank = 1
       |            THEN 1.0 / CAST(a.rank AS DOUBLE) END), 0.0) AS rr
       |        FROM ex e LEFT JOIN ivf a
       |          ON e.q_id = a.q_id AND e.neighbor_id = a.neighbor_id
       |          LEFT JOIN disc d ON d.i = a.rank
       |        GROUP BY e.q_id)
       |SELECT p.q_id, p.n_exact, p.hits, p.dcg, p.rr, p.dcg / i.idcg AS ndcg
       |FROM per p JOIN idcg i ON i.m = p.n_exact
       |ORDER BY q_id""".stripMargin
  }

  /** q107b's multi-arm oracle: the q68b arm chains re-ranked to depth k
    * (LSH-multi, auto-k IVF, IMI via the prefixed chain, IVFADC raw and
    * residual), each scored with q107's graded-metric tail, rolled up to
    * one row per arm with decimal-carrier means over the per-query
    * values — the same shared disc/idcg double literals. */
  private def retrievalQualityMultiOracleSql(qmax: Int, k: Int): String = {
    val disc = operators.SimilarityOps.retrievalDisc(k)
    val idcg = operators.SimilarityOps.retrievalIdcg(k)
    val discValues = (1 to k).map(i =>
      s"(CAST($i AS BIGINT), CAST(${disc(i - 1)} AS DOUBLE))").mkString("VALUES ", ", ", "")
    val idcgValues = (1 to k).map(m =>
      s"(CAST($m AS BIGINT), CAST(${idcg(m - 1)} AS DOUBLE))").mkString("VALUES ", ", ", "")
    s"""WITH $EMB_NORM,
       |exj AS (SELECT a.vec_id AS q_id, b.vec_id AS neighbor_id,
       |          $DOT64 / (a.nrm * b.nrm) AS cos
       |        FROM n a JOIN n b ON a.vec_id < $qmax AND b.vec_id >= $qmax),
       |ex AS (SELECT q_id, neighbor_id, rank FROM (
       |         SELECT q_id, neighbor_id,
       |           ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS rank
       |         FROM exj) t WHERE rank <= $k),
       |bk AS (SELECT vec_id, v, nrm, ${signBlocksSql(8, t = 0)} AS b0, ${signBlocksSql(8, t = 1)} AS b1
       |  FROM n),
       |lshmj AS (SELECT DISTINCT a.vec_id AS q_id, b.vec_id AS neighbor_id,
       |        $DOT64 / (a.nrm * b.nrm) AS cos
       |      FROM bk a JOIN bk b ON a.vec_id < $qmax AND b.vec_id >= $qmax
       |        AND (a.b0 = b.b0 OR a.b1 = b.b1)),
       |lshm AS (SELECT q_id, neighbor_id, rank FROM (
       |    SELECT q_id, neighbor_id,
       |      CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank
       |    FROM lshmj) t WHERE rank <= $k),
       |acents AS (SELECT list_id, cv,
       |            sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65),
       |              i -> cv[i] * cv[i])), (x2, y2) -> x2 + y2)) AS cnrm
       |          FROM ($ivfCentsAutoValues) t(list_id, cv)),
       |aasg AS (SELECT vec_id, v, nrm, list_id, csim,
       |          ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, list_id) AS crank
       |        FROM (SELECT n.vec_id, n.v, n.nrm, c.list_id,
       |                list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65),
       |                  i -> n.v[i] * c.cv[i])), (x2, y2) -> x2 + y2) / (n.nrm * c.cnrm) AS csim
       |              FROM n, acents c) t),
       |aqs AS (SELECT vec_id AS q_id, v AS qv, nrm AS qnrm, list_id FROM aasg
       |       WHERE vec_id < $qmax AND crank <= 2),
       |acp AS (SELECT vec_id, v, nrm, list_id FROM aasg WHERE vec_id >= $qmax AND crank = 1),
       |aivfj AS (SELECT q_id, acp.vec_id AS neighbor_id,
       |           list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65),
       |             i -> aqs.qv[i] * acp.v[i])), (x2, y2) -> x2 + y2) / (aqs.qnrm * acp.nrm) AS cos
       |         FROM acp JOIN aqs USING (list_id)),
       |ivfauto AS (SELECT q_id, neighbor_id, rank FROM (
       |    SELECT q_id, neighbor_id,
       |      CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank
       |    FROM aivfj) t WHERE rank <= $k),
       |${imiSearchCtesK(k, "imi_")},
       |cents AS (SELECT list_id, cv,
       |            sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65),
       |              i -> cv[i] * cv[i])), (x2, y2) -> x2 + y2)) AS cnrm
       |          FROM ($ivfCentsValues) t(list_id, cv)),
       |asg AS (SELECT vec_id, v, nrm, list_id, csim,
       |          ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, list_id) AS crank
       |        FROM (SELECT n.vec_id, n.v, n.nrm, c.list_id,
       |                list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65),
       |                  i -> n.v[i] * c.cv[i])), (x2, y2) -> x2 + y2) / (n.nrm * c.cnrm) AS csim
       |              FROM n, cents c) t),
       |qs AS (SELECT vec_id AS q_id, v AS qv, nrm AS qnrm, list_id FROM asg
       |       WHERE vec_id < $qmax AND crank <= 2),
       |cp AS (SELECT vec_id, v, nrm, list_id FROM asg WHERE vec_id >= $qmax AND crank = 1),
       |books AS (SELECT sub_idx, code, cv FROM ($pqBooksValues) t(sub_idx, code, cv)),
       |$ivfPqCtes,
       |ivfpq AS (SELECT q_id, neighbor_id, rank FROM pqtop WHERE rank <= $k),
       |rbooks AS (SELECT sub_idx, code, cv FROM ($pqResBooksValues) t(sub_idx, code, cv)),
       |qsr AS (SELECT a.vec_id AS q_id,
       |          list_transform(range(1, 65), i -> a.v[i] - c.cv[i]) AS qv, a.list_id
       |        FROM asg a JOIN cents c USING (list_id)
       |        WHERE a.vec_id < $qmax AND a.crank <= 2),
       |cpr AS (SELECT a.vec_id,
       |          list_transform(range(1, 65), i -> a.v[i] - c.cv[i]) AS v, a.list_id
       |        FROM asg a JOIN cents c USING (list_id)
       |        WHERE a.vec_id >= $qmax AND a.crank = 1),
       |${ivfPqCtesNamed("pqr", "cpr", "qsr", "rbooks")},
       |ivfpqr AS (SELECT q_id, neighbor_id, rank FROM pqrtop WHERE rank <= $k),
       |orot AS (SELECT i, rv FROM ($opqResRotValues) t(i, rv)),
       |qsoj AS (SELECT q.q_id, q.list_id, r.i,
       |           list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65),
       |             j -> r.rv[j] * q.qv[j])), (acc, z) -> acc + z) AS x
       |         FROM qsr q, orot r),
       |qso AS (SELECT q_id, list_id, list(x ORDER BY i) AS qv FROM qsoj GROUP BY q_id, list_id),
       |cpoj AS (SELECT c.vec_id, c.list_id, r.i,
       |           list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65),
       |             j -> r.rv[j] * c.v[j])), (acc, z) -> acc + z) AS x
       |         FROM cpr c, orot r),
       |cpo AS (SELECT vec_id, list_id, list(x ORDER BY i) AS v FROM cpoj GROUP BY vec_id, list_id),
       |obooks AS (SELECT sub_idx, code, cv FROM ($opqResBooksValues) t(sub_idx, code, cv)),
       |${ivfPqCtesNamed("pqo", "cpo", "qso", "obooks")},
       |opqivf AS (SELECT q_id, neighbor_id, rank FROM pqotop WHERE rank <= $k),
       |disc AS (SELECT * FROM ($discValues) t(i, disc)),
       |idcg AS (SELECT * FROM ($idcgValues) t(m, idcg)),
       |idx AS (SELECT 1 AS arm_no, 'lsh_multi' AS arm, q_id, neighbor_id, rank FROM lshm
       |        UNION ALL SELECT 2, 'ivf_auto', q_id, neighbor_id, rank FROM ivfauto
       |        UNION ALL SELECT 3, 'imi', q_id, neighbor_id, rank FROM imi_imiTop
       |        UNION ALL SELECT 4, 'ivfpq', q_id, neighbor_id, rank FROM ivfpq
       |        UNION ALL SELECT 5, 'ivfpq_res', q_id, neighbor_id, rank FROM ivfpqr
       |        UNION ALL SELECT 6, 'opq_ivf', q_id, neighbor_id, rank FROM opqivf),
       |armt AS (SELECT CAST(arm_no AS BIGINT) AS arm_no, arm
       |         FROM (VALUES (1, 'lsh_multi'), (2, 'ivf_auto'), (3, 'imi'),
       |                      (4, 'ivfpq'), (5, 'ivfpq_res'), (6, 'opq_ivf')) t(arm_no, arm)),
       |per AS (SELECT ar.arm_no, ar.arm, e.q_id,
       |          CAST(COUNT(*) AS BIGINT) AS n_exact,
       |          CAST(COUNT(a.rank) AS BIGINT) AS hits,
       |          CAST(SUM(CAST(CASE WHEN a.rank IS NOT NULL
       |            THEN CAST(($k + 1 - e.rank) AS DOUBLE) * d.disc ELSE 0.0 END
       |            AS DECIMAL(27,6))) AS DOUBLE) AS dcg,
       |          COALESCE(MAX(CASE WHEN e.rank = 1
       |            THEN 1.0 / CAST(a.rank AS DOUBLE) END), 0.0) AS rr
       |        FROM armt ar CROSS JOIN ex e
       |          LEFT JOIN idx a ON a.arm_no = ar.arm_no
       |            AND a.q_id = e.q_id AND a.neighbor_id = e.neighbor_id
       |          LEFT JOIN disc d ON d.i = a.rank
       |        GROUP BY ar.arm_no, ar.arm, e.q_id),
       |perq AS (SELECT p.*, p.dcg / i.idcg AS ndcg
       |         FROM per p JOIN idcg i ON i.m = p.n_exact)
       |SELECT arm_no, arm, CAST(COUNT(*) AS BIGINT) AS n_queries,
       |  ${A("CAST(hits AS DOUBLE) / CAST(n_exact AS DOUBLE)")} AS recall,
       |  ${A("rr")} AS mrr,
       |  ${A("ndcg")} AS ndcg
       |FROM perq GROUP BY arm_no, arm ORDER BY arm_no""".stripMargin
  }

  /** The q68c recall-vs-nprobe curve oracle: the q68 oracle's exact arm
    * arithmetic (same asg/qs/cp CTEs, same IVFADC chain) with the probe
    * RANK carried onto every candidate, fanned over the curve points by a
    * VALUES join, per-(point, query) ROW_NUMBER top-k, integer hit counts
    * vs the brute-force truth, one final double division per recall. */
  private def annRecallCurveOracleSql(qmax: Int, k: Int, probes: Seq[Int]): String = {
    val maxProbe = probes.max
    val pointsValues = probes.map(p => s"(CAST($p AS BIGINT))").mkString("VALUES ", ", ", "")
    s"""WITH $EMB_NORM,
       |exj AS (SELECT a.vec_id AS q_id, b.vec_id AS neighbor_id,
       |          $DOT64 / (a.nrm * b.nrm) AS cos
       |        FROM n a JOIN n b ON a.vec_id < $qmax AND b.vec_id >= $qmax),
       |ex AS (SELECT q_id, neighbor_id FROM (
       |         SELECT q_id, neighbor_id,
       |           ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS rank
       |         FROM exj) t WHERE rank <= $k),
       |points AS (SELECT nprobe FROM ($pointsValues) t(nprobe)),
       |cents AS (SELECT list_id, cv,
       |            sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65),
       |              i -> cv[i] * cv[i])), (x2, y2) -> x2 + y2)) AS cnrm
       |          FROM ($ivfCentsValues) t(list_id, cv)),
       |asg AS (SELECT vec_id, v, nrm, list_id, csim,
       |          ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, list_id) AS crank
       |        FROM (SELECT n.vec_id, n.v, n.nrm, c.list_id,
       |                list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65),
       |                  i -> n.v[i] * c.cv[i])), (x2, y2) -> x2 + y2) / (n.nrm * c.cnrm) AS csim
       |              FROM n, cents c) t),
       |qs AS (SELECT vec_id AS q_id, v AS qv, nrm AS qnrm, list_id, CAST(crank AS BIGINT) AS crank
       |       FROM asg WHERE vec_id < $qmax AND crank <= $maxProbe),
       |cp AS (SELECT vec_id, v, nrm, list_id FROM asg WHERE vec_id >= $qmax AND crank = 1),
       |ivfj AS (SELECT q_id, cp.vec_id AS neighbor_id, qs.crank,
       |           list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65),
       |             i -> qs.qv[i] * cp.v[i])), (x2, y2) -> x2 + y2) / (qs.qnrm * cp.nrm) AS cos
       |         FROM cp JOIN qs USING (list_id)),
       |ivf_p AS (SELECT nprobe, q_id, neighbor_id FROM (
       |            SELECT p.nprobe, i.q_id, i.neighbor_id,
       |              ROW_NUMBER() OVER (PARTITION BY p.nprobe, i.q_id
       |                ORDER BY i.cos DESC, i.neighbor_id) AS rk
       |            FROM ivfj i JOIN points p ON i.crank <= p.nprobe) t WHERE rk <= $k),
       |books AS (SELECT sub_idx, code, cv FROM ($pqBooksValues) t(sub_idx, code, cv)),
       |pqsubs AS (SELECT vec_id, list_id, i AS sub_idx, v[i*8+1 : i*8+8] AS sv
       |           FROM cp, range(8) t(i)),
       |pqasg AS (SELECT vec_id, list_id, sub_idx, code FROM (
       |            SELECT s.vec_id, s.list_id, s.sub_idx, b.code,
       |              ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.sub_idx
       |                ORDER BY list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 9),
       |                  i -> (s.sv[i] - b.cv[i]) * (s.sv[i] - b.cv[i]))), (acc, z) -> acc + z) ASC,
       |                b.code ASC) AS rk
       |            FROM pqsubs s JOIN books b ON s.sub_idx = b.sub_idx) t WHERE rk = 1),
       |pqrecon AS (SELECT a.vec_id, a.list_id, a.sub_idx, b.cv FROM pqasg a
       |            JOIN books b ON a.sub_idx = b.sub_idx AND a.code = b.code),
       |pqqsubs AS (SELECT q_id, list_id, crank, i AS sub_idx, qv[i*8+1 : i*8+8] AS qsv
       |            FROM qs, range(8) t(i)),
       |pqpair AS (SELECT q.q_id, r.vec_id AS neighbor_id, q.crank, r.sub_idx,
       |             list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 9),
       |               i -> (q.qsv[i] - r.cv[i]) * (q.qsv[i] - r.cv[i]))), (acc, z) -> acc + z) AS dsub
       |           FROM pqrecon r JOIN pqqsubs q ON r.sub_idx = q.sub_idx AND r.list_id = q.list_id),
       |pqagg AS (SELECT q_id, neighbor_id, crank,
       |            ${(0 until 8).map(s0 => s"SUM(CASE WHEN sub_idx = $s0 THEN dsub END) AS d$s0").mkString(", ")}
       |          FROM pqpair GROUP BY q_id, neighbor_id, crank),
       |adc AS (SELECT q_id, neighbor_id, crank,
       |          ${(0 until 8).map(s0 => s"d$s0").mkString(" + ")} AS adc_dist
       |        FROM pqagg),
       |adc_p AS (SELECT nprobe, q_id, neighbor_id FROM (
       |            SELECT p.nprobe, a.q_id, a.neighbor_id,
       |              ROW_NUMBER() OVER (PARTITION BY p.nprobe, a.q_id
       |                ORDER BY a.adc_dist ASC, a.neighbor_id) AS rk
       |            FROM adc a JOIN points p ON a.crank <= p.nprobe) t WHERE rk <= $k),
       |ivf_hits AS (SELECT nprobe, CAST(COUNT(*) AS BIGINT) AS ivf_hits
       |             FROM ivf_p JOIN ex USING (q_id, neighbor_id) GROUP BY nprobe),
       |adc_hits AS (SELECT nprobe, CAST(COUNT(*) AS BIGINT) AS ivfadc_hits
       |             FROM adc_p JOIN ex USING (q_id, neighbor_id) GROUP BY nprobe),
       |truth AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_truth FROM ex)
       |SELECT p.nprobe,
       |  COALESCE(i.ivf_hits, 0) AS ivf_hits,
       |  COALESCE(a.ivfadc_hits, 0) AS ivfadc_hits,
       |  t.n_truth,
       |  CAST(COALESCE(i.ivf_hits, 0) AS DOUBLE) / CAST(t.n_truth AS DOUBLE) AS ivf_recall,
       |  CAST(COALESCE(a.ivfadc_hits, 0) AS DOUBLE) / CAST(t.n_truth AS DOUBLE) AS ivfadc_recall
       |FROM points p
       |LEFT JOIN ivf_hits i USING (nprobe)
       |LEFT JOIN adc_hits a USING (nprobe)
       |CROSS JOIN truth t
       |ORDER BY p.nprobe""".stripMargin
  }

  /** The q68e curve oracle: q68c's probe-rank/VALUES-fan construction
    * against the FROZEN auto-k artifact, raw-float arm only (the auto
    * index is raw-coded). */
  private def annRecallCurveAutoOracleSql(qmax: Int, k: Int, probes: Seq[Int]): String = {
    val maxProbe = probes.max
    val pointsValues = probes.map(p => s"(CAST($p AS BIGINT))").mkString("VALUES ", ", ", "")
    s"""WITH $EMB_NORM,
       |exj AS (SELECT a.vec_id AS q_id, b.vec_id AS neighbor_id,
       |          $DOT64 / (a.nrm * b.nrm) AS cos
       |        FROM n a JOIN n b ON a.vec_id < $qmax AND b.vec_id >= $qmax),
       |ex AS (SELECT q_id, neighbor_id FROM (
       |         SELECT q_id, neighbor_id,
       |           ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS rank
       |         FROM exj) t WHERE rank <= $k),
       |points AS (SELECT nprobe FROM ($pointsValues) t(nprobe)),
       |cents AS (SELECT list_id, cv,
       |            sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65),
       |              i -> cv[i] * cv[i])), (x2, y2) -> x2 + y2)) AS cnrm
       |          FROM ($ivfCentsAutoValues) t(list_id, cv)),
       |asg AS (SELECT vec_id, v, nrm, list_id, csim,
       |          ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, list_id) AS crank
       |        FROM (SELECT n.vec_id, n.v, n.nrm, c.list_id,
       |                list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65),
       |                  i -> n.v[i] * c.cv[i])), (x2, y2) -> x2 + y2) / (n.nrm * c.cnrm) AS csim
       |              FROM n, cents c) t),
       |qs AS (SELECT vec_id AS q_id, v AS qv, nrm AS qnrm, list_id, CAST(crank AS BIGINT) AS crank
       |       FROM asg WHERE vec_id < $qmax AND crank <= $maxProbe),
       |cp AS (SELECT vec_id, v, nrm, list_id FROM asg WHERE vec_id >= $qmax AND crank = 1),
       |ivfj AS (SELECT q_id, cp.vec_id AS neighbor_id, qs.crank,
       |           list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65),
       |             i -> qs.qv[i] * cp.v[i])), (x2, y2) -> x2 + y2) / (qs.qnrm * cp.nrm) AS cos
       |         FROM cp JOIN qs USING (list_id)),
       |ivf_p AS (SELECT nprobe, q_id, neighbor_id FROM (
       |            SELECT p.nprobe, i.q_id, i.neighbor_id,
       |              ROW_NUMBER() OVER (PARTITION BY p.nprobe, i.q_id
       |                ORDER BY i.cos DESC, i.neighbor_id) AS rk
       |            FROM ivfj i JOIN points p ON i.crank <= p.nprobe) t WHERE rk <= $k),
       |hits AS (SELECT nprobe, CAST(COUNT(*) AS BIGINT) AS auto_hits
       |         FROM ivf_p JOIN ex USING (q_id, neighbor_id) GROUP BY nprobe),
       |truth AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_truth FROM ex)
       |SELECT p.nprobe,
       |  COALESCE(h.auto_hits, 0) AS auto_hits,
       |  t.n_truth,
       |  CAST(COALESCE(h.auto_hits, 0) AS DOUBLE) / CAST(t.n_truth AS DOUBLE) AS auto_recall
       |FROM points p
       |LEFT JOIN hits h USING (nprobe)
       |CROSS JOIN truth t
       |ORDER BY p.nprobe""".stripMargin
  }

  private val EMB_NORM =
    """e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |      FROM embeddings),
      |n AS (SELECT vec_id, label, v,
      |        sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |          list_transform(v, y -> y*y)), (a2, b2) -> a2 + b2)) AS nrm
      |      FROM e)""".stripMargin

  private val DOT64 =
    "list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65)," +
      " i -> a.v[i]*b.v[i])), (a2, b2) -> a2 + b2)"

  // q73's full BM25 SQL — shared verbatim by the q81 hybrid-fusion oracle
  private val BM25_SQL =
    """WITH perdoc AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS dl,
        |    CAST(len(list_filter(string_split(text, ' '), x -> x = 'spark')) AS BIGINT) AS tf_spark,
        |    CAST(len(list_filter(string_split(text, ' '), x -> x = 'window')) AS BIGINT) AS tf_window,
        |    CAST(len(list_filter(string_split(text, ' '), x -> x = 'merge')) AS BIGINT) AS tf_merge
        |  FROM documents),
        |stats AS (
        |  SELECT COUNT(*) AS n_docs,
        |    CAST(SUM(CAST(dl AS DECIMAL(27,6))) AS DOUBLE) AS dl_sum,
        |    SUM(CASE WHEN tf_spark > 0 THEN 1 ELSE 0 END) AS df_spark,
        |    SUM(CASE WHEN tf_window > 0 THEN 1 ELSE 0 END) AS df_window,
        |    SUM(CASE WHEN tf_merge > 0 THEN 1 ELSE 0 END) AS df_merge
        |  FROM perdoc),
        |stats2 AS (SELECT *, dl_sum / n_docs AS avgdl FROM stats)
        |SELECT doc_id, dl, score FROM (
        |  SELECT p.doc_id, p.dl,
        |    (CASE WHEN p.tf_spark > 0 THEN
        |       ln((CAST(s.n_docs AS DOUBLE) - s.df_spark + 0.5) / (CAST(s.df_spark AS DOUBLE) + 0.5) + 1.0)
        |       * (CAST(p.tf_spark AS DOUBLE) * (1.2 + 1.0))
        |       / (CAST(p.tf_spark AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(p.dl AS DOUBLE) / s.avgdl))
        |     ELSE 0.0 END) +
        |    (CASE WHEN p.tf_window > 0 THEN
        |       ln((CAST(s.n_docs AS DOUBLE) - s.df_window + 0.5) / (CAST(s.df_window AS DOUBLE) + 0.5) + 1.0)
        |       * (CAST(p.tf_window AS DOUBLE) * (1.2 + 1.0))
        |       / (CAST(p.tf_window AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(p.dl AS DOUBLE) / s.avgdl))
        |     ELSE 0.0 END) +
        |    (CASE WHEN p.tf_merge > 0 THEN
        |       ln((CAST(s.n_docs AS DOUBLE) - s.df_merge + 0.5) / (CAST(s.df_merge AS DOUBLE) + 0.5) + 1.0)
        |       * (CAST(p.tf_merge AS DOUBLE) * (1.2 + 1.0))
        |       / (CAST(p.tf_merge AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(p.dl AS DOUBLE) / s.avgdl))
        |     ELSE 0.0 END) AS score
        |  FROM perdoc p CROSS JOIN stats2 s) t
        |WHERE score > 0.0 ORDER BY score DESC, doc_id LIMIT 20""".stripMargin

  // q73b: generated from TextAnalysisOps.Bm25QuerySet — the query table
  // lives in ONE place, so the Spark side and this SQL cannot disagree on
  // which terms belong to which query. Per-term arithmetic is BM25_SQL's
  // exact chain, but each term passes through the DECIMAL(27,6) carrier
  // before the (exact) decimal sum, then one cast back to double — JVM
  // Math.log and DuckDB ln differ by 1 ulp on some of this term set's
  // inputs, and the carrier rounds that sub-resolution noise away on
  // both sides identically (the q85 ln discipline).
  private val BM25_MULTI_SQL: String = {
    val queries = graft.operators.TextAnalysisOps.Bm25QuerySet
    val allTerms = queries.flatMap(_._2).distinct
    val tfCols = allTerms.map(t =>
      s"CAST(len(list_filter(string_split(text, ' '), x -> x = '$t')) AS BIGINT) AS tf_$t")
      .mkString(",\n    ")
    val dfCols = allTerms.map(t =>
      s"SUM(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS df_$t").mkString(",\n    ")
    def termExpr(t: String) =
      s"""CAST((CASE WHEN p.tf_$t > 0 THEN
         |       ln((CAST(s.n_docs AS DOUBLE) - s.df_$t + 0.5) / (CAST(s.df_$t AS DOUBLE) + 0.5) + 1.0)
         |       * (CAST(p.tf_$t AS DOUBLE) * (1.2 + 1.0))
         |       / (CAST(p.tf_$t AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(p.dl AS DOUBLE) / s.avgdl))
         |     ELSE 0.0 END) AS DECIMAL(27,6))""".stripMargin
    val qSelects = queries.map { case (qid, terms) =>
      s"""SELECT CAST($qid AS BIGINT) AS query_id, p.doc_id,
         |    CAST(${terms.map(termExpr).mkString(" +\n    ")} AS DOUBLE) AS score
         |  FROM perdoc p CROSS JOIN stats2 s""".stripMargin
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH perdoc AS (
       |  SELECT doc_id,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS dl,
       |    $tfCols
       |  FROM documents),
       |stats AS (
       |  SELECT COUNT(*) AS n_docs,
       |    CAST(SUM(CAST(dl AS DECIMAL(27,6))) AS DOUBLE) AS dl_sum,
       |    $dfCols
       |  FROM perdoc),
       |stats2 AS (SELECT *, dl_sum / n_docs AS avgdl FROM stats),
       |scored AS (
       |  $qSelects)
       |SELECT query_id, doc_id, score, rank FROM (
       |  SELECT query_id, doc_id, score,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS BIGINT) AS rank
       |  FROM scored WHERE score > 0.0) t
       |WHERE rank <= 20 ORDER BY query_id, rank""".stripMargin
  }

  // Shared oracle CTE: deterministic synthetic bounding boxes from `part`
  // (mirrors RosbagDomainOps.boxes).
  private val BOXES =
    """boxes AS (SELECT p_partkey AS box_id, p_partkey // 40 AS image_id,
      |  (p_partkey * 37) % 700 AS x, (p_partkey * 53) % 500 AS y,
      |  CAST((p_size * 7) % 100 + 20 AS BIGINT) AS w,
      |  CAST((p_size * 11) % 80 + 20 AS BIGINT) AS h FROM part)""".stripMargin

  // Shared oracle CTEs for the ranked-detection pair q29c/q29d: the scored
  // three-proposals-per-object detection model + the greedy NMS replay
  // (mirrors RosbagDomainOps.scoredDetections / nms). DuckDB has no
  // sequential loop, so NMS — greedy by definition — replays as a
  // recursive CTE stepping one score rank at a time per (image, class),
  // carrying the kept-box list; queries embedding this must open with
  // WITH RECURSIVE.
  private val SCORED_DET =
    """gt AS (SELECT p_partkey AS gt_id, p_partkey // 40 AS image_id, p_partkey % 3 AS class_id,
      |  (p_partkey * 37) % 700 AS gx, (p_partkey * 53) % 500 AS gy,
      |  CAST((p_size * 7) % 100 + 20 AS BIGINT) AS gw,
      |  CAST((p_size * 11) % 80 + 20 AS BIGINT) AS gh FROM part),
      |det AS (
      |  SELECT gt_id * 3 AS pred_id, image_id, class_id,
      |    gx + (gt_id % 11) - 5 AS x, gy + (gt_id * 3) % 11 - 5 AS y,
      |    gw + (gt_id % 7) - 3 AS w, gh + (gt_id * 5) % 7 - 3 AS h,
      |    600 + (gt_id * 13) % 400 AS si FROM gt
      |  UNION ALL
      |  SELECT gt_id * 3 + 1, image_id, class_id,
      |    gx + (gt_id * 5) % 15 - 7, gy + (gt_id * 7) % 15 - 7,
      |    gw + (gt_id % 9) - 4, gh + (gt_id * 11) % 9 - 4,
      |    300 + (gt_id * 17) % 400 FROM gt
      |  UNION ALL
      |  SELECT gt_id * 3 + 2, image_id, class_id,
      |    (gx + 200 + (gt_id * 19) % 300) % 700, (gy + 150 + (gt_id * 23) % 200) % 500,
      |    (gt_id * 29) % 80 + 20, (gt_id * 31) % 60 + 20,
      |    (gt_id * 37) % 1000 FROM gt)""".stripMargin

  private val NMS_CTES =
    s"""$SCORED_DET,
       |ranked AS (SELECT *,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY image_id, class_id ORDER BY si DESC, pred_id) AS BIGINT) AS rk
       |  FROM det),
       |grp AS (SELECT image_id, class_id, MAX(rk) AS nrk FROM ranked GROUP BY 1, 2),
       |step AS (
       |  SELECT image_id, class_id, CAST(0 AS BIGINT) AS rk,
       |    CAST([] AS STRUCT(pred_id BIGINT, x BIGINT, y BIGINT, w BIGINT, h BIGINT, si BIGINT)[]) AS kept
       |  FROM grp
       |  UNION ALL
       |  SELECT r.image_id, r.class_id, r.rk,
       |    CASE WHEN r.rk <= 400 AND COALESCE(list_max(list_transform(s.kept, k ->
       |        CAST(GREATEST(0, LEAST(k.x + k.w, r.x + r.w) - GREATEST(k.x, r.x))
       |           * GREATEST(0, LEAST(k.y + k.h, r.y + r.h) - GREATEST(k.y, r.y)) AS DOUBLE)
       |        / (k.w * k.h + r.w * r.h
       |           - GREATEST(0, LEAST(k.x + k.w, r.x + r.w) - GREATEST(k.x, r.x))
       |             * GREATEST(0, LEAST(k.y + k.h, r.y + r.h) - GREATEST(k.y, r.y))))), 0.0) <= 0.45
       |      THEN list_append(s.kept, {'pred_id': r.pred_id, 'x': r.x, 'y': r.y, 'w': r.w, 'h': r.h, 'si': r.si})
       |      ELSE s.kept END
       |  FROM step s JOIN ranked r
       |    ON r.image_id = s.image_id AND r.class_id = s.class_id AND r.rk = s.rk + 1),
       |keptd AS (SELECT s.image_id, s.class_id, u.pred_id, u.x, u.y, u.w, u.h, u.si
       |        FROM step s JOIN grp g ON s.image_id = g.image_id AND s.class_id = g.class_id AND s.rk = g.nrk,
       |        LATERAL (SELECT unnest(s.kept, recursive := true)) u)""".stripMargin

  // The SHARED q29c/q29e AP-sweep oracle builder (mirrors
  // RosbagDomainOps.apSweepCells): candidate pairs at the loosest gate,
  // a tis-CTE re-gate, per-ti mutual-best matching, the ranked sweep,
  // and the per-(ti, class) AP cells — ONE chain, parameterized by the
  // threshold-index list and the output shape, so the matching rule and
  // the decimal carrier can never drift between the two oracles (or
  // from the Scala side, which parameterizes identically).
  private def apSweepOracleSql(tis: Seq[Int], coco: Boolean,
      elevenPoint: Boolean = false, greedy: Boolean = false): String = {
    // COCO-greedy matching (q29g): the assignment is sequential in score
    // order, so — like the NMS replay — it runs as a recursive CTE
    // stepping one detection rank at a time per (ti, image, class),
    // carrying the claimed-GT list; each step's LATERAL picks the best
    // free GT (IoU DESC, gt_id) for the stepped detection.
    val matchCte =
      if (greedy)
        """gp AS (SELECT DISTINCT ti, image_id, class_id, pred_id, si FROM pairs),
          |rankedm AS (SELECT ti, image_id, class_id, pred_id,
          |              ROW_NUMBER() OVER (PARTITION BY ti, image_id, class_id
          |                ORDER BY si DESC, pred_id) AS rk
          |            FROM gp),
          |gcnt AS (SELECT ti, image_id, class_id, MAX(rk) AS nrk FROM rankedm GROUP BY 1, 2, 3),
          |gstep AS (
          |  SELECT ti, image_id, class_id, CAST(0 AS BIGINT) AS rk,
          |         CAST([] AS BIGINT[]) AS used, CAST([] AS BIGINT[]) AS tps
          |  FROM gcnt
          |  UNION ALL
          |  SELECT s.ti, s.image_id, s.class_id, r.rk,
          |    CASE WHEN pick.gt_id IS NOT NULL THEN list_append(s.used, pick.gt_id) ELSE s.used END,
          |    CASE WHEN pick.gt_id IS NOT NULL THEN list_append(s.tps, r.pred_id) ELSE s.tps END
          |  FROM gstep s
          |  JOIN rankedm r ON r.ti = s.ti AND r.image_id = s.image_id
          |    AND r.class_id = s.class_id AND r.rk = s.rk + 1
          |  LEFT JOIN LATERAL (
          |    SELECT p.gt_id FROM pairs p
          |    WHERE p.ti = s.ti AND p.pred_id = r.pred_id
          |      AND NOT list_contains(s.used, p.gt_id)
          |    ORDER BY p.iou DESC, p.gt_id LIMIT 1) pick ON TRUE),
          |m AS (SELECT s.ti, u.pred_id FROM gstep s
          |      JOIN gcnt g ON s.ti = g.ti AND s.image_id = g.image_id
          |        AND s.class_id = g.class_id AND s.rk = g.nrk,
          |      LATERAL (SELECT unnest(s.tps) AS pred_id) u)""".stripMargin
      else
        """m AS (SELECT ti, pred_id FROM (
          |        SELECT ti, pred_id,
          |          ROW_NUMBER() OVER (PARTITION BY ti, pred_id ORDER BY iou DESC, gt_id) AS rp,
          |          ROW_NUMBER() OVER (PARTITION BY ti, gt_id ORDER BY iou DESC, pred_id) AS rg
          |        FROM pairs) WHERE rp = 1 AND rg = 1)""".stripMargin
    // VOC07 11-point (q29f): mean of the envelope sampled at the eleven
    // recall points — p_interp(j/10) = MAX(iprec) over rows whose
    // 10·cum_tp ≥ j·n_gt (exact integer gate); a recall point past the
    // curve contributes 0. Left-assoc 11-term sum = the Scala side's
    // reduceLeft chain, bit-identical IEEE order.
    val apExpr =
      if (elevenPoint)
        "(" + (0 to 10).map(j =>
          s"COALESCE(MAX(CASE WHEN i.cum_tp * 10 >= $j * ng.n_gt THEN i.iprec END), 0.0)")
          .mkString(" + ") + ") / 11.0 AS ap"
      else
        "CAST(SUM(CAST(CASE WHEN i.is_tp = 1 THEN i.iprec END AS DECIMAL(27,6))) AS DOUBLE) / ng.n_gt AS ap"
    val cells =
      s"""pairs0 AS (SELECT g.image_id, g.class_id, g.gt_id, p.pred_id, p.si,
         |            CAST(inter AS DOUBLE) / uni AS iou
         |          FROM gt g JOIN keptd p ON g.image_id = p.image_id AND g.class_id = p.class_id,
         |          LATERAL (SELECT
         |            GREATEST(0, LEAST(g.gx + g.gw, p.x + p.w) - GREATEST(g.gx, p.x))
         |            * GREATEST(0, LEAST(g.gy + g.gh, p.y + p.h) - GREATEST(g.gy, p.y)) AS inter,
         |            g.gw * g.gh + p.w * p.h
         |            - GREATEST(0, LEAST(g.gx + g.gw, p.x + p.w) - GREATEST(g.gx, p.x))
         |              * GREATEST(0, LEAST(g.gy + g.gh, p.y + p.h) - GREATEST(g.gy, p.y)) AS uni) t
         |          WHERE CAST(inter AS DOUBLE) / uni >= 0.5),
         |tis AS (SELECT CAST(unnest([${tis.mkString(", ")}]) AS BIGINT) AS ti),
         |pairs AS (SELECT ti, image_id, class_id, gt_id, pred_id, si, iou
         |          FROM pairs0 CROSS JOIN tis
         |          WHERE iou >= CAST(ti AS DOUBLE) / 20.0),
         |$matchCte,
         |ng AS (SELECT class_id, CAST(COUNT(*) AS BIGINT) AS n_gt FROM gt GROUP BY class_id),
         |rk2 AS (SELECT t.ti, p.class_id, p.pred_id, p.si,
         |         CASE WHEN m.pred_id IS NOT NULL THEN 1 ELSE 0 END AS is_tp
         |       FROM keptd p CROSS JOIN tis t
         |       LEFT JOIN m ON m.ti = t.ti AND m.pred_id = p.pred_id),
         |cum AS (SELECT ti, class_id, pred_id, si, is_tp,
         |         SUM(is_tp) OVER (PARTITION BY ti, class_id ORDER BY si DESC, pred_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tp,
         |         CAST(ROW_NUMBER() OVER (PARTITION BY ti, class_id ORDER BY si DESC, pred_id) AS BIGINT) AS rnk
         |       FROM rk2),
         |ip AS (SELECT ti, class_id, is_tp, cum_tp,
         |         MAX(CAST(cum_tp AS DOUBLE) / rnk) OVER (PARTITION BY ti, class_id ORDER BY si DESC, pred_id
         |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS iprec
         |       FROM cum),
         |rawap AS (SELECT i.ti, i.class_id, ng.n_gt,
         |    CAST(COUNT(*) AS BIGINT) AS n_pred,
         |    CAST(SUM(i.is_tp) AS BIGINT) AS n_tp,
         |    $apExpr
         |  FROM ip i JOIN ng ON i.class_id = ng.class_id
         |  GROUP BY i.ti, i.class_id, ng.n_gt)""".stripMargin
    if (coco)
      s"""WITH RECURSIVE $NMS_CTES,
         |$cells,
         |percell AS (SELECT CAST(ti AS DOUBLE) / 20.0 AS iou_thr, class_id, n_gt, n_pred, n_tp,
         |    COALESCE(ap, 0.0) AS ap FROM rawap)
         |SELECT iou_thr, class_id, n_gt, n_pred, n_tp, ap FROM percell
         |UNION ALL
         |SELECT -1.0, CAST(-1 AS BIGINT), CAST(SUM(n_gt) AS BIGINT), CAST(SUM(n_pred) AS BIGINT),
         |  CAST(SUM(n_tp) AS BIGINT),
         |  CAST(SUM(CAST(ap AS DECIMAL(27,6))) AS DOUBLE) / COUNT(ap)
         |FROM percell ORDER BY iou_thr, class_id""".stripMargin
    else
      s"""WITH RECURSIVE $NMS_CTES,
         |$cells,
         |percls AS (SELECT class_id, n_gt, n_pred, n_tp, ap FROM rawap)
         |SELECT class_id, n_gt, n_pred, n_tp, ap FROM percls
         |UNION ALL
         |SELECT CAST(-1 AS BIGINT), CAST(SUM(n_gt) AS BIGINT), CAST(SUM(n_pred) AS BIGINT),
         |  CAST(SUM(n_tp) AS BIGINT),
         |  CAST(SUM(CAST(ap AS DECIMAL(27,6))) AS DOUBLE) / COUNT(ap)
         |FROM percls ORDER BY class_id""".stripMargin
  }

  // The q29i COCO-scoreboard oracle (mirrors RosbagDomainOps
  // .detCocoScoreboard): the apSweepOracleSql chain extended with the
  // pycocotools area-range/maxDets dimensions — detections rank and
  // truncate per (image, class) BEFORE matching; the greedy recursion
  // gains (ab, md) keys and IGNORE-awareness (the LATERAL pick orders
  // (gig, iou DESC, gt_id): best free non-ignored gt, else best free
  // ignored one — matched-to-ignored detections leave the PR sweep, as
  // do unmatched detections whose own area is out of range); per-cell AP
  // is pycocotools' 101-point interpolation (the q29f conditional-max
  // device at 101 samples, left-assoc chain); the twelve summarize()
  // rows are decimal-carrier means over member cells.
  private def cocoScoreboardOracleSql: String = {
    def binGate(ab: String, area: String): String =
      s"""CASE WHEN $ab = 0 THEN TRUE WHEN $ab = 1 THEN $area < 1024
         |     WHEN $ab = 2 THEN $area >= 1024 AND $area < 9216
         |     ELSE $area >= 9216 END""".stripMargin
    s"""WITH RECURSIVE $NMS_CTES,
       |dr AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY image_id, class_id
       |         ORDER BY si DESC, pred_id) AS BIGINT) AS dr,
       |       w * h AS darea FROM keptd),
       |tis AS (SELECT CAST(unnest([${(10 to 19).mkString(", ")}]) AS BIGINT) AS ti),
       |combos AS (SELECT CAST(ab AS BIGINT) AS ab, CAST(md AS BIGINT) AS md
       |           FROM (VALUES (0, 1), (0, 10), (0, 100), (1, 100), (2, 100), (3, 100)) c(ab, md)),
       |abins AS (SELECT DISTINCT ab FROM combos),
       |pairs0 AS (SELECT g.image_id, g.class_id, g.gt_id, p.pred_id, p.si, p.dr,
       |            g.gw * g.gh AS garea, CAST(inter AS DOUBLE) / uni AS iou
       |          FROM gt g JOIN dr p ON g.image_id = p.image_id AND g.class_id = p.class_id,
       |          LATERAL (SELECT
       |            GREATEST(0, LEAST(g.gx + g.gw, p.x + p.w) - GREATEST(g.gx, p.x))
       |            * GREATEST(0, LEAST(g.gy + g.gh, p.y + p.h) - GREATEST(g.gy, p.y)) AS inter,
       |            g.gw * g.gh + p.w * p.h
       |            - GREATEST(0, LEAST(g.gx + g.gw, p.x + p.w) - GREATEST(g.gx, p.x))
       |              * GREATEST(0, LEAST(g.gy + g.gh, p.y + p.h) - GREATEST(g.gy, p.y)) AS uni) t
       |          WHERE CAST(inter AS DOUBLE) / uni >= 0.5),
       |pairs AS (SELECT t.ti, c.ab, c.md, p.image_id, p.class_id, p.gt_id, p.pred_id,
       |            p.si, p.iou, NOT (${binGate("c.ab", "p.garea")}) AS gig
       |          FROM pairs0 p CROSS JOIN tis t CROSS JOIN combos c
       |          WHERE p.iou >= CAST(t.ti AS DOUBLE) / 20.0 AND p.dr <= c.md),
       |gp AS (SELECT DISTINCT ti, ab, md, image_id, class_id, pred_id, si FROM pairs),
       |rankedm AS (SELECT ti, ab, md, image_id, class_id, pred_id,
       |              ROW_NUMBER() OVER (PARTITION BY ti, ab, md, image_id, class_id
       |                ORDER BY si DESC, pred_id) AS rk
       |            FROM gp),
       |gcnt AS (SELECT ti, ab, md, image_id, class_id, MAX(rk) AS nrk
       |         FROM rankedm GROUP BY 1, 2, 3, 4, 5),
       |gstep AS (
       |  SELECT ti, ab, md, image_id, class_id, CAST(0 AS BIGINT) AS rk,
       |         CAST([] AS BIGINT[]) AS used, CAST([] AS BIGINT[]) AS tps,
       |         CAST([] AS BIGINT[]) AS igs
       |  FROM gcnt
       |  UNION ALL
       |  SELECT s.ti, s.ab, s.md, s.image_id, s.class_id, r.rk,
       |    CASE WHEN pick.gt_id IS NOT NULL THEN list_append(s.used, pick.gt_id) ELSE s.used END,
       |    CASE WHEN pick.gt_id IS NOT NULL AND NOT pick.gig
       |         THEN list_append(s.tps, r.pred_id) ELSE s.tps END,
       |    CASE WHEN pick.gt_id IS NOT NULL AND pick.gig
       |         THEN list_append(s.igs, r.pred_id) ELSE s.igs END
       |  FROM gstep s
       |  JOIN rankedm r ON r.ti = s.ti AND r.ab = s.ab AND r.md = s.md
       |    AND r.image_id = s.image_id AND r.class_id = s.class_id AND r.rk = s.rk + 1
       |  LEFT JOIN LATERAL (
       |    SELECT p.gt_id, p.gig FROM pairs p
       |    WHERE p.ti = s.ti AND p.ab = s.ab AND p.md = s.md AND p.pred_id = r.pred_id
       |      AND NOT list_contains(s.used, p.gt_id)
       |    ORDER BY p.gig, p.iou DESC, p.gt_id LIMIT 1) pick ON TRUE),
       |gdone AS (SELECT s.* FROM gstep s
       |          JOIN gcnt g ON s.ti = g.ti AND s.ab = g.ab AND s.md = g.md
       |            AND s.image_id = g.image_id AND s.class_id = g.class_id AND s.rk = g.nrk),
       |m AS (SELECT s.ti, s.ab, s.md, u.pred_id, FALSE AS mig
       |      FROM gdone s, LATERAL (SELECT unnest(s.tps) AS pred_id) u
       |      UNION ALL
       |      SELECT s.ti, s.ab, s.md, u.pred_id, TRUE
       |      FROM gdone s, LATERAL (SELECT unnest(s.igs) AS pred_id) u),
       |ngb AS (SELECT a.ab, g.class_id, CAST(COUNT(*) AS BIGINT) AS n_gt
       |        FROM gt g CROSS JOIN abins a
       |        WHERE ${binGate("a.ab", "g.gw * g.gh")}
       |        GROUP BY 1, 2),
       |rk2 AS (SELECT t.ti, c.ab, c.md, p.class_id, p.pred_id, p.si,
       |          CASE WHEN m.pred_id IS NOT NULL AND NOT m.mig THEN 1 ELSE 0 END AS is_tp
       |        FROM dr p CROSS JOIN tis t CROSS JOIN combos c
       |        LEFT JOIN m ON m.ti = t.ti AND m.ab = c.ab AND m.md = c.md
       |          AND m.pred_id = p.pred_id
       |        WHERE p.dr <= c.md
       |          AND NOT COALESCE(m.mig, NOT (${binGate("c.ab", "p.darea")}))),
       |cum AS (SELECT ti, ab, md, class_id, pred_id, si, is_tp,
       |          SUM(is_tp) OVER (PARTITION BY ti, ab, md, class_id ORDER BY si DESC, pred_id
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tp,
       |          CAST(ROW_NUMBER() OVER (PARTITION BY ti, ab, md, class_id
       |            ORDER BY si DESC, pred_id) AS BIGINT) AS rnk
       |        FROM rk2),
       |ip AS (SELECT ti, ab, md, class_id, is_tp, cum_tp,
       |         MAX(CAST(cum_tp AS DOUBLE) / rnk) OVER (PARTITION BY ti, ab, md, class_id
       |           ORDER BY si DESC, pred_id
       |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS iprec
       |       FROM cum),
       |rawap AS (SELECT i.ti, i.ab, i.md, i.class_id,
       |    CAST(SUM(i.is_tp) AS BIGINT) AS n_tp,
       |    (${(0 to 100).map(j =>
             s"COALESCE(MAX(CASE WHEN i.cum_tp * 100 >= $j * g.n_gt THEN i.iprec END), 0.0)")
             .mkString(" + ")}) / 101.0 AS ap
       |  FROM ip i JOIN ngb g ON i.ab = g.ab AND i.class_id = g.class_id
       |  GROUP BY 1, 2, 3, 4),
       |skeleton AS (SELECT t.ti, c.ab, c.md, n.class_id, n.n_gt
       |             FROM ngb n JOIN combos c ON c.ab = n.ab CROSS JOIN tis t),
       |cells AS (SELECT s.ti, s.ab, s.md, s.class_id, s.n_gt,
       |    COALESCE(r.n_tp, 0) AS n_tp,
       |    COALESCE(r.ap, 0.0) AS ap,
       |    CAST(COALESCE(r.n_tp, 0) AS DOUBLE) / s.n_gt AS recall
       |  FROM skeleton s LEFT JOIN rawap r ON r.ti = s.ti AND r.ab = s.ab
       |    AND r.md = s.md AND r.class_id = s.class_id),
       |mcells AS (
       |  SELECT 1 AS mno, 'AP' AS metric, ap AS v FROM cells WHERE ab = 0 AND md = 100
       |  UNION ALL SELECT 2, 'AP50', ap FROM cells WHERE ab = 0 AND md = 100 AND ti = 10
       |  UNION ALL SELECT 3, 'AP75', ap FROM cells WHERE ab = 0 AND md = 100 AND ti = 15
       |  UNION ALL SELECT 4, 'AP_small', ap FROM cells WHERE ab = 1 AND md = 100
       |  UNION ALL SELECT 5, 'AP_medium', ap FROM cells WHERE ab = 2 AND md = 100
       |  UNION ALL SELECT 6, 'AP_large', ap FROM cells WHERE ab = 3 AND md = 100
       |  UNION ALL SELECT 7, 'AR_1', recall FROM cells WHERE ab = 0 AND md = 1
       |  UNION ALL SELECT 8, 'AR_10', recall FROM cells WHERE ab = 0 AND md = 10
       |  UNION ALL SELECT 9, 'AR_100', recall FROM cells WHERE ab = 0 AND md = 100
       |  UNION ALL SELECT 10, 'AR_small', recall FROM cells WHERE ab = 1 AND md = 100
       |  UNION ALL SELECT 11, 'AR_medium', recall FROM cells WHERE ab = 2 AND md = 100
       |  UNION ALL SELECT 12, 'AR_large', recall FROM cells WHERE ab = 3 AND md = 100),
       |mnames AS (SELECT * FROM (VALUES (1, 'AP'), (2, 'AP50'), (3, 'AP75'),
       |    (4, 'AP_small'), (5, 'AP_medium'), (6, 'AP_large'), (7, 'AR_1'),
       |    (8, 'AR_10'), (9, 'AR_100'), (10, 'AR_small'), (11, 'AR_medium'),
       |    (12, 'AR_large')) n(mno, metric)),
       |magg AS (SELECT mno, CAST(COUNT(*) AS BIGINT) AS n_cells,
       |    CAST(SUM(CAST(v AS DECIMAL(27,6))) AS DOUBLE) / COUNT(v) AS value
       |  FROM mcells GROUP BY 1)
       |SELECT CAST(n.mno AS BIGINT) AS metric_no, n.metric,
       |  COALESCE(a.n_cells, 0) AS n_cells,
       |  COALESCE(a.value, -1.0) AS value
       |FROM mnames n LEFT JOIN magg a ON a.mno = n.mno
       |ORDER BY metric_no""".stripMargin
  }

  // Exact-sum carrier used by every oracle: identical decimal cast chain as
  // graft.functions.Exact, so double aggregates are bit-identical.
  /** Hyperplane sign-block SQL over column `v` (`bits` planes of table
    * `t`) — mirrors SimilarityOps.hyperplane / DedupOps.signBlocks: the
    * q44b/q44c blocks, q46/q68's LSH buckets, q46c's two tables and
    * q67b's blocks all interpolate THIS one fragment, so the plane
    * formula cannot drift between oracles (or from the Scala side). */
  private def signBlocksSql(bits: Int, t: Int = 0): String =
    (0 until bits).map { j =>
      val base = (t * 977 + j) * 131
      s"(CASE WHEN list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65)," +
        s" i -> v[i] * ((($base + (i-1)*7919) % 1001) - 500))), (x2, y2) -> x2 + y2) > 0" +
        s" THEN CAST(${1L << j} AS BIGINT) ELSE 0 END)"
    }.mkString(" + ")

  private def S(x: String)  = s"CAST(SUM(CAST($x AS DECIMAL(27,6))) AS DOUBLE)"
  private def A(x: String)  = s"CAST(SUM(CAST($x AS DECIMAL(27,6))) AS DOUBLE)/COUNT($x)"

  /** DuckDB-runnable oracle SQL per query (same column aliases both sides). */
  private val q72OverlapOracle: String =
    """WITH act AS (
        |  SELECT user_id, event_id, epoch_ns(ts) AS tsn
        |  FROM events WHERE event_type <> 'error'),
        |lagd AS (
        |  SELECT user_id, event_id, tsn,
        |    CASE WHEN lag(tsn) OVER w IS NULL OR tsn - lag(tsn) OVER w > 3600000000000
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM act WINDOW w AS (PARTITION BY user_id ORDER BY tsn, event_id)),
        |sess AS (
        |  SELECT user_id, tsn,
        |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY tsn, event_id
        |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        |  FROM lagd),
        |sbounds AS (
        |  SELECT user_id, session_seq, MIN(tsn) AS s_start, MAX(tsn) AS s_end
        |  FROM sess GROUP BY 1, 2),
        |wins AS (
        |  SELECT user_id, event_id AS wid,
        |    epoch_ns(ts) - 600000000000 AS w_start, epoch_ns(ts) + 600000000000 AS w_end
        |  FROM events WHERE event_type = 'error')
        |SELECT s.user_id, CAST(s.session_seq AS BIGINT) AS session_seq,
        |  s.s_start // 1000 AS start_us,
        |  COUNT(DISTINCT w.wid) AS n_windows, MIN(w.wid) AS first_wid
        |FROM sbounds s JOIN wins w
        |  ON s.user_id = w.user_id AND s.s_start <= w.w_end AND w.w_start <= s.s_end
        |GROUP BY 1, 2, 3 ORDER BY 1, 2""".stripMargin

  // The shared q50b/q50c/q86 winnowing CTE chain (t/r/h/p/mw — token
  // stream, md5-60-bit k=5 window hashes, HUGEINT packed keys, w=4
  // sliding minima) mirroring CurationOps.winnowSelectedOf term for term.
  private def winnowCtes: String =
    s"""$winnowHashCtes,
       |mw AS (SELECT doc_id, pos,
       |        MIN(pack) OVER (PARTITION BY doc_id ORDER BY pos
       |          ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS minpack,
       |        COUNT(*) OVER (PARTITION BY doc_id) AS m
       |      FROM p)""".stripMargin

  // The w-independent half of the winnow chain (token stream + packed
  // per-window keys) — q96b's per-w arms all hang off the same `p`.
  private def winnowHashCtes: String =
    """t AS (SELECT doc_id, string_split(text, ' ') AS ts,
      |                  len(string_split(text, ' ')) AS n FROM documents),
      |r AS (SELECT doc_id, CAST(unnest(generate_series(1, n - 4)) AS BIGINT) AS pos, ts
      |      FROM t WHERE n >= 5),
      |h AS (SELECT doc_id, pos,
      |        ('0x' || substr(md5(array_to_string(ts[pos:pos+4], ' ')), 1, 15))::BIGINT AS rh
      |      FROM r),
      |p AS (SELECT doc_id, pos,
      |        rh::HUGEINT * 4294967296 + (4294967296 - pos) AS pack FROM h)""".stripMargin

  // One q96b arm at winnow window `w`: the w-specific sliding-minimum
  // CTE + THE shared pair tail, all names w-suffixed.
  private def winnowArmCtes(w: Int): String = {
    val x = w.toString
    s"""mw$x AS (SELECT doc_id, pos,
       |        MIN(pack) OVER (PARTITION BY doc_id ORDER BY pos
       |          ROWS BETWEEN CURRENT ROW AND ${w - 1} FOLLOWING) AS minpack,
       |        COUNT(*) OVER (PARTITION BY doc_id) AS m
       |      FROM p),
       |${winnowPairTail(w, x)}""".stripMargin
  }

  // The q50c pair tail over a w-window's mw$sfx chain (sel...wnp, the
  // df<=64 / shared>=2 / jaccard>=0.35 constants in ONE place) — q50c
  // and q86 use the unsuffixed instance; q96b's per-w arms suffix it.
  private def winnowPairTail(w: Int, sfx: String): String =
    s"""sel$sfx AS (SELECT DISTINCT doc_id, CAST(minpack // 4294967296 AS BIGINT) AS fp
       |        FROM mw$sfx WHERE pos <= greatest(1, m - ${w - 1})),
       |dft$sfx AS (SELECT fp, COUNT(*) AS df FROM sel$sfx GROUP BY fp),
       |kept$sfx AS (SELECT s.doc_id, s.fp FROM sel$sfx s JOIN dft$sfx USING (fp) WHERE df <= 64),
       |nf$sfx AS (SELECT doc_id, COUNT(*) AS nf FROM kept$sfx GROUP BY doc_id),
       |pr$sfx AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
       |       FROM kept$sfx a JOIN kept$sfx b ON a.fp = b.fp AND a.doc_id < b.doc_id
       |       GROUP BY 1, 2),
       |wnp$sfx AS (SELECT doc_a, doc_b, CAST(shared AS BIGINT) AS shared,
       |          CAST(shared AS DOUBLE) / (na.nf + nb.nf - shared) AS jaccard
       |        FROM pr$sfx JOIN nf$sfx na ON pr$sfx.doc_a = na.doc_id JOIN nf$sfx nb ON pr$sfx.doc_b = nb.doc_id
       |        WHERE shared >= 2 AND CAST(shared AS DOUBLE) / (na.nf + nb.nf - shared) >= 0.35)""".stripMargin

  private def winnowPairCtes: String = winnowPairTail(4, "")


  def oracleSql: Map[String, String] = Map(
    // voxel-grid downsampling over the synthesized lidar sweeps: identical
    // integer->double coordinate chains, floor voxel assignment, decimal-
    // carrier centroids with one final IEEE division per voxel
    "q104_voxel_downsample" ->
      s"""WITH pts AS (SELECT l_orderkey % 20 AS sweep,
         |  CAST((l_partkey * 31) % 2000 AS DOUBLE) / 10.0 - 100.0 AS x,
         |  CAST((l_suppkey * 17) % 2000 AS DOUBLE) / 10.0 - 100.0 AS y,
         |  CAST((CAST(l_linenumber AS BIGINT) * 13) % 40 AS DOUBLE) / 10.0 - 2.0 AS z,
         |  l_quantity / 50.0 AS intensity FROM lineitem)
         |SELECT sweep,
         |  CAST(FLOOR(x / 5.0) AS BIGINT) AS vx,
         |  CAST(FLOOR(y / 5.0) AS BIGINT) AS vy,
         |  CAST(FLOOR(z / 5.0) AS BIGINT) AS vz,
         |  CAST(COUNT(*) AS BIGINT) AS n_points,
         |  ${S("x")} / COUNT(*) AS cx,
         |  ${S("y")} / COUNT(*) AS cy,
         |  ${S("z")} / COUNT(*) AS cz,
         |  ${S("intensity")} / COUNT(intensity) AS mean_intensity
         |FROM pts GROUP BY 1, 2, 3, 4 ORDER BY 1, 2, 3, 4""".stripMargin,
    // q105: the audio spectral kernel replayed over the same synthesized
    // PCM table — window 8 is the one DFT basis whose twiddles are exact
    // IEEE doubles ({0, +-1, +-sqrt(0.5)}), so power bins / rms /
    // centroid are fixed chains both engines reproduce bit-exactly
    "q105_audio_spectral" -> {
      def re(m: Int) =
        s"list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 9), " +
          s"i -> vs[i] * C[(($m * (i - 1)) % 8) + 1])), (x2, y2) -> x2 + y2)"
      def im(m: Int) =
        s"list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 9), " +
          s"i -> vs[i] * S[(($m * (i - 1)) % 8) + 1])), (x2, y2) -> x2 + y2)"
      def p(m: Int) = s"(${re(m)}) * (${re(m)}) + (${im(m)}) * (${im(m)}) AS p$m"
      s"""WITH clips AS (SELECT DISTINCT l_orderkey % 8 AS clip_id FROM lineitem),
         |samp AS (SELECT clip_id, t,
         |           ((clip_id * 37 + t * t * 29 + 11) % 401) - 200 AS s
         |         FROM clips, (SELECT unnest(range(0, 32)) AS t) ts),
         |win AS (SELECT clip_id, t // 8 AS win_no, t % 8 AS pos,
         |          CAST(s AS DOUBLE) / 32768.0 AS v
         |        FROM samp),
         |w AS (SELECT clip_id, CAST(win_no AS BIGINT) AS win_no,
         |        list(v ORDER BY pos) AS vs
         |      FROM win GROUP BY clip_id, win_no),
         |tw AS (SELECT
         |  [1.0, sqrt(0.5), 0.0, -sqrt(0.5), -1.0, -sqrt(0.5), 0.0, sqrt(0.5)] AS C,
         |  [0.0, sqrt(0.5), 1.0, sqrt(0.5), 0.0, -sqrt(0.5), -1.0, -sqrt(0.5)] AS S),
         |p AS (SELECT clip_id, win_no,
         |        sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 9),
         |          i -> vs[i] * vs[i])), (x2, y2) -> x2 + y2) / 8.0) AS rms,
         |        ${p(0)}, ${p(1)}, ${p(2)}, ${p(3)}, ${p(4)}
         |      FROM w, tw)
         |SELECT clip_id, win_no, rms, p0, p1, p2, p3, p4,
         |  CASE WHEN (p1 + p2 + p3 + p4) > 0
         |       THEN (1 * p1 + 2 * p2 + 3 * p3 + 4 * p4) / (p1 + p2 + p3 + p4)
         |       ELSE 0.0 END AS centroid
         |FROM p ORDER BY clip_id, win_no""".stripMargin
    },

    // q106 entropy: symbol frequencies per doc (tokens via the shared
    // space-split convention; chars via substr positions — never empty),
    // each p*ln(p) through the DECIMAL carrier (exact order-free sum),
    // nats -> bits by the SHARED Ln2 double literal, never a log call
    "q106_entropy" ->
      s"""WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
         |tf AS (SELECT doc_id, t, CAST(COUNT(*) AS DOUBLE) AS cnt FROM tk GROUP BY 1, 2),
         |tn AS (SELECT doc_id, SUM(cnt) AS n, COUNT(*) AS types FROM tf GROUP BY 1),
         |te AS (SELECT tf.doc_id,
         |    CAST(-SUM(CAST((cnt / n) * ln(cnt / n) AS DECIMAL(27,6))) AS DOUBLE)
         |      / ${operators.TextAnalysisOps.Ln2} AS ent
         |  FROM tf JOIN tn USING (doc_id) GROUP BY tf.doc_id),
         |ch AS (SELECT doc_id, substr(text, CAST(i AS INT), 1) AS t
         |       FROM documents, LATERAL (SELECT unnest(range(1, length(text) + 1)) AS i) g),
         |cf AS (SELECT doc_id, t, CAST(COUNT(*) AS DOUBLE) AS cnt FROM ch GROUP BY 1, 2),
         |cn AS (SELECT doc_id, SUM(cnt) AS n, COUNT(*) AS types FROM cf GROUP BY 1),
         |ce AS (SELECT cf.doc_id,
         |    CAST(-SUM(CAST((cnt / n) * ln(cnt / n) AS DECIMAL(27,6))) AS DOUBLE)
         |      / ${operators.TextAnalysisOps.Ln2} AS ent
         |  FROM cf JOIN cn USING (doc_id) GROUP BY cf.doc_id)
         |SELECT d.doc_id,
         |  CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
         |  CAST(tn.types AS BIGINT) AS n_token_types,
         |  te.ent AS token_ent_bits,
         |  CAST(COALESCE(cn.types, 0) AS BIGINT) AS n_char_types,
         |  COALESCE(ce.ent, 0.0) AS char_ent_bits
         |FROM documents d JOIN tn USING (doc_id) JOIN te USING (doc_id)
         |  LEFT JOIN cn USING (doc_id) LEFT JOIN ce USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    "q01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${S("l_quantity")} AS sum_qty,
         |  ${S("l_extendedprice")} AS sum_base_price,
         |  ${S("l_extendedprice*(1.0-l_discount)")} AS sum_disc_price,
         |  ${S("l_extendedprice*(1.0-l_discount)*(1.0+l_tax)")} AS sum_charge,
         |  ${A("l_quantity")} AS avg_qty,
         |  ${A("l_extendedprice")} AS avg_price,
         |  ${A("l_discount")} AS avg_disc,
         |  COUNT(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_filter_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-07-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q03_join_agg" ->
      s"""SELECT o_orderkey, ${S("l_extendedprice*(1.0-l_discount)")} AS revenue,
         |  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate
         |FROM customer, orders, lineitem
         |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND l_orderkey = o_orderkey
         |  AND o_orderdate < TIMESTAMP '1998-01-01' AND l_shipdate > TIMESTAMP '1998-01-01'
         |GROUP BY o_orderkey, o_orderdate
         |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,

    "q04_exists_semijoin" ->
      """SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity >= 48)
        |ORDER BY o_orderkey""".stripMargin,

    "q05_multi_join" ->
      s"""SELECT n_name, ${S("l_extendedprice*(1.0-l_discount)")} AS revenue
         |FROM customer, orders, lineitem, supplier, nation, region
         |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
         |  AND c_nationkey = s_nationkey AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
         |  AND r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
         |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,

    "q06_scan_agg" ->
      s"""SELECT ${S("l_extendedprice*l_discount")} AS revenue, COUNT(*) AS n
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
         |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,

    "q07_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rnk
        |  FROM orders) t
        |WHERE rnk <= 3 ORDER BY o_custkey, rnk, o_orderkey""".stripMargin,

    "q08_window_running" ->
      """SELECT event_id, user_id,
        |  CAST(SUM(CAST(value AS DECIMAL(27,6))) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value,
        |  LAG(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value
        |FROM events ORDER BY event_id""".stripMargin,

    "q08b_window_range" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        |  CAST(SUM(CAST(value AS DECIMAL(27,6))) OVER (
        |    PARTITION BY user_id ORDER BY epoch_us(ts)
        |    RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trailing_24h,
        |  COUNT(*) OVER (
        |    PARTITION BY user_id ORDER BY epoch_us(ts)
        |    RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW) AS n_24h
        |FROM events ORDER BY event_id""".stripMargin,

    "q09b_cube" ->
      s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
         |  ${S("o_totalprice")} AS sum_price
         |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
         |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "q09_rollup" ->
      s"""SELECT r_name, n_name, COUNT(*) AS n_customers, ${S("c_acctbal")} AS sum_bal
         |FROM region JOIN nation ON n_regionkey = r_regionkey
         |JOIN customer ON c_nationkey = n_nationkey
         |GROUP BY ROLLUP(r_name, n_name)
         |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,

    "q10_antijoin" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderdate >= TIMESTAMP '2000-01-01')
        |ORDER BY c_custkey""".stripMargin,

    "q11_topk_per_group" ->
      """SELECT event_type, event_id, user_id, value, rn FROM (
        |  SELECT event_type, event_id, user_id, value,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS BIGINT) AS rn
        |  FROM events) t
        |WHERE rn <= 3 ORDER BY event_type, rn""".stripMargin,

    "q11b_topk_agg" ->
      """SELECT event_type, event_id, user_id, value, rn FROM (
        |  SELECT event_type, event_id, user_id, value,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS BIGINT) AS rn
        |  FROM events) t
        |WHERE rn <= 3 ORDER BY event_type, rn""".stripMargin,

    "q12_distinct_count" ->
      """SELECT COUNT(DISTINCT l_partkey) AS n_parts, COUNT(DISTINCT l_suppkey) AS n_supps,
        |  COUNT(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem""".stripMargin,

    // q12b: HLL estimates are engine-specific, so the oracled surface is
    // the portable half — exact counts plus the ≤5% error VERDICT (DuckDB
    // asserts the verdict is TRUE; a drifted Spark sketch flips a boolean
    // and hash-mismatches)
    "q12b_approx_distinct" ->
      """SELECT COUNT(DISTINCT l_partkey) AS exact_parts,
        |  COUNT(DISTINCT l_orderkey) AS exact_orders,
        |  TRUE AS parts_within_5pct, TRUE AS orders_within_5pct
        |FROM lineitem""".stripMargin,

    "q13_case_pivot" ->
      s"""SELECT user_id,
         |  CAST(SUM(CASE WHEN event_type='click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
         |  CAST(SUM(CASE WHEN event_type='view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
         |  CAST(SUM(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
         |  CAST(SUM(CASE WHEN event_type='signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
         |  CAST(SUM(CASE WHEN event_type='error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
         |  MAX(CASE WHEN event_type='purchase' THEN value END) AS max_purchase,
         |  ${S("CASE WHEN event_type='purchase' THEN value ELSE 0.0 END")} AS sum_purchase
         |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q14_percentiles" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.5) AS median_qty,
        |  quantile_cont(l_quantity, 0.9) AS p90_qty,
        |  quantile_cont(l_extendedprice, 0.25) AS p25_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // q14b: exact values + TRUE verdicts — the sketch's rank-error
    // contract is the portable surface (q12b's device); sketch values
    // themselves never reach the output
    "q14b_approx_percentiles" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.5) AS median_qty,
        |  quantile_cont(l_quantity, 0.9) AS p90_qty,
        |  TRUE AS median_within, TRUE AS p90_within
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q15_union_dedup" ->
      """WITH u AS (
        |  SELECT doc_id, text FROM documents WHERE source = 'src0'
        |  UNION ALL SELECT doc_id, text FROM documents WHERE source = 'src1'
        |  UNION ALL SELECT doc_id, text FROM documents)
        |SELECT md5(text) AS text_hash, MIN(doc_id) AS keeper_doc_id, COUNT(*) AS n_copies
        |FROM u GROUP BY md5(text) ORDER BY text_hash""".stripMargin,

    "q16_json_extract" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q17_string_funcs" ->
      """SELECT p_partkey, UPPER(p_name) AS name_upper, substring(p_name, 1, 5) AS name_prefix,
        |  CAST(length(p_name) AS BIGINT) AS name_len,
        |  p_brand || '/' || p_type AS brand_type
        |FROM part
        |WHERE p_name LIKE '%widget%' OR contains(p_type, 'ECO')
        |ORDER BY p_partkey""".stripMargin,

    "q18_date_trunc" ->
      s"""SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month,
         |  COUNT(*) AS n_orders, ${S("o_totalprice")} AS sum_price
         |FROM orders GROUP BY date_trunc('month', o_orderdate)
         |ORDER BY month""".stripMargin,

    "q19_correlated_avg" ->
      s"""WITH avgs AS (SELECT l_partkey AS pk, ${A("l_quantity")} AS avg_qty
         |              FROM lineitem GROUP BY l_partkey)
         |SELECT l_orderkey, l_linenumber, l_partkey, l_quantity, avg_qty
         |FROM lineitem JOIN avgs ON l_partkey = pk
         |WHERE l_quantity < avg_qty * 0.4
         |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q20_frame_index" ->
      """SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS frame_no,
        |  strftime(ts, '%Y-%m-%dT%H:%M:%S') AS iso_time
        |FROM events ORDER BY user_id, frame_no""".stripMargin,

    "q21_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, epoch_ns(ts) AS tns,
        |    CASE WHEN lag(epoch_ns(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |         OR epoch_ns(ts) - lag(epoch_ns(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |            > 21600000000000 THEN 1 ELSE 0 END AS is_new
        |  FROM events),
        |sessions AS (
        |  SELECT user_id, tns,
        |    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY tns, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
        |  FROM flagged)
        |SELECT user_id, session_seq, COUNT(*) AS n_events,
        |  (MAX(tns) - MIN(tns)) // 1000000000 AS duration_s,
        |  strftime(make_timestamp(MIN(tns) // 1000), '%Y-%m-%dT%H:%M:%S') AS start_iso
        |FROM sessions GROUP BY user_id, session_seq
        |ORDER BY user_id, session_seq""".stripMargin,

    "q22_frame_gaps" ->
      """SELECT user_id, event_id, prev_event_id, gap_ms FROM (
        |  SELECT user_id, event_id,
        |    lag(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_event_id,
        |    (epoch_ns(ts) - lag(epoch_ns(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id))
        |      // 1000000 AS gap_ms
        |  FROM events) t
        |WHERE gap_ms > 172800000 ORDER BY user_id, event_id""".stripMargin,

    "q23_detect_maxconf" ->
      """SELECT user_id, strftime(ts, '%Y-%m-%d') AS day,
        |  MAX(CASE WHEN event_type='click' THEN value END) AS max_click,
        |  MAX(CASE WHEN event_type='view' THEN value END) AS max_view,
        |  MAX(CASE WHEN event_type='purchase' THEN value END) AS max_purchase,
        |  CAST(SUM(CASE WHEN event_type='click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
        |  CAST(SUM(CASE WHEN event_type='view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
        |  CAST(SUM(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
        |  CAST(SUM(CASE WHEN event_type='error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
        |  COUNT(*) AS n_detections
        |FROM events GROUP BY user_id, strftime(ts, '%Y-%m-%d')
        |ORDER BY user_id, day""".stripMargin,

    "q24_vru_filter" ->
      """SELECT DISTINCT user_id, strftime(ts, '%Y-%m-%d') AS day
        |FROM events WHERE event_type IN ('error', 'signup')
        |ORDER BY user_id, day""".stripMargin,

    "q25_label_search" ->
      """SELECT event_id, user_id, value, strftime(ts, '%Y-%m-%dT%H:%M:%S') AS iso_time
        |FROM events
        |WHERE event_type = 'purchase' AND value >= 150.0
        |  AND epoch_ns(ts) >= 1704412800000000000 AND epoch_ns(ts) < 1706745600000000000
        |ORDER BY value DESC, event_id LIMIT 20""".stripMargin,

    "q26_asof_join" ->
      """SELECT v.event_id AS view_id, v.user_id AS user_id, c.event_id AS click_id,
        |  (epoch_us(v.ts) - epoch_us(c.ts)) // 1000 AS lag_ms
        |FROM (SELECT * FROM events WHERE event_type = 'view') v
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON v.user_id = c.user_id AND v.ts >= c.ts
        |ORDER BY view_id""".stripMargin,

    "q27_monitor_status" ->
      """SELECT user_id, event_id AS last_event_id, event_type AS last_status, n_events, span_s
        |FROM (
        |  SELECT user_id, event_id, event_type,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn,
        |    COUNT(*) OVER (PARTITION BY user_id) AS n_events,
        |    (MAX(epoch_ns(ts)) OVER (PARTITION BY user_id)
        |     - MIN(epoch_ns(ts)) OVER (PARTITION BY user_id)) // 1000000000 AS span_s
        |  FROM events) t
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "q28_bbox_normalize" ->
      s"""WITH $BOXES
         |SELECT box_id, image_id,
         |  COUNT(*) OVER (PARTITION BY image_id) AS n_boxes,
         |  x / 800.0 AS xmin, (x + w) / 800.0 AS xmax,
         |  y / 600.0 AS ymin, (y + h) / 600.0 AS ymax,
         |  w * h / (800.0 * 600.0) AS area
         |FROM boxes ORDER BY box_id""".stripMargin,

    "q29_bbox_iou" ->
      s"""WITH $BOXES
         |SELECT a.image_id AS image_id, a.box_id AS box_a, b.box_id AS box_b,
         |  CAST(inter AS DOUBLE) / uni AS iou
         |FROM boxes a JOIN boxes b
         |  ON a.image_id = b.image_id AND a.box_id < b.box_id,
         |LATERAL (SELECT
         |  GREATEST(0, LEAST(a.x + a.w, b.x + b.w) - GREATEST(a.x, b.x))
         |  * GREATEST(0, LEAST(a.y + a.h, b.y + b.h) - GREATEST(a.y, b.y)) AS inter,
         |  a.w * a.h + b.w * b.h
         |  - GREATEST(0, LEAST(a.x + a.w, b.x + b.w) - GREATEST(a.x, b.x))
         |    * GREATEST(0, LEAST(a.y + a.h, b.y + b.h) - GREATEST(a.y, b.y)) AS uni) t
         |WHERE inter > 0
         |ORDER BY image_id, box_a, box_b""".stripMargin,

    // detection evaluation under deterministic mutual-best matching: both
    // engines compute the identical iou doubles from integer geometry, the
    // >= 0.5 gate and the (iou DESC, id) argmax are total-order exact
    "q29b_det_eval" ->
      s"""WITH $BOXES,
         |cb AS (SELECT *, box_id % 3 AS class_id FROM boxes),
         |gt AS (SELECT image_id, class_id, box_id AS gt_id, x AS gx, y AS gy, w AS gw, h AS gh
         |       FROM cb WHERE box_id % 2 = 0),
         |pr AS (SELECT image_id, class_id, box_id AS pred_id, x AS px, y AS py, w AS pw, h AS ph
         |       FROM cb WHERE box_id % 2 = 1),
         |pairs AS (SELECT g.class_id, g.gt_id, p.pred_id, CAST(inter AS DOUBLE) / uni AS iou
         |          FROM gt g JOIN pr p ON g.image_id = p.image_id AND g.class_id = p.class_id,
         |          LATERAL (SELECT
         |            GREATEST(0, LEAST(g.gx + g.gw, p.px + p.pw) - GREATEST(g.gx, p.px))
         |            * GREATEST(0, LEAST(g.gy + g.gh, p.py + p.ph) - GREATEST(g.gy, p.py)) AS inter,
         |            g.gw * g.gh + p.pw * p.ph
         |            - GREATEST(0, LEAST(g.gx + g.gw, p.px + p.pw) - GREATEST(g.gx, p.px))
         |              * GREATEST(0, LEAST(g.gy + g.gh, p.py + p.ph) - GREATEST(g.gy, p.py)) AS uni) t
         |          WHERE CAST(inter AS DOUBLE) / uni >= 0.5),
         |m AS (SELECT class_id, CAST(COUNT(*) AS BIGINT) AS n_matched FROM (
         |        SELECT class_id,
         |          ROW_NUMBER() OVER (PARTITION BY pred_id ORDER BY iou DESC, gt_id) AS rp,
         |          ROW_NUMBER() OVER (PARTITION BY gt_id ORDER BY iou DESC, pred_id) AS rg
         |        FROM pairs) WHERE rp = 1 AND rg = 1 GROUP BY class_id),
         |ng AS (SELECT class_id, CAST(COUNT(*) AS BIGINT) AS n_gt FROM gt GROUP BY class_id),
         |np AS (SELECT class_id, CAST(COUNT(*) AS BIGINT) AS n_pred FROM pr GROUP BY class_id),
         |sel AS (SELECT class_id,
         |  COALESCE(n_gt, 0) AS n_gt, COALESCE(n_pred, 0) AS n_pred,
         |  COALESCE(n_matched, 0) AS n_matched,
         |  CASE WHEN COALESCE(n_pred, 0) > 0
         |    THEN CAST(COALESCE(n_matched, 0) AS DOUBLE) / CAST(n_pred AS DOUBLE) END AS precision,
         |  CASE WHEN COALESCE(n_gt, 0) > 0
         |    THEN CAST(COALESCE(n_matched, 0) AS DOUBLE) / CAST(n_gt AS DOUBLE) END AS recall
         |FROM ng FULL JOIN np USING (class_id) LEFT JOIN m USING (class_id))
         |SELECT *,
         |  CASE WHEN precision IS NOT NULL AND recall IS NOT NULL AND precision + recall > 0
         |    THEN 2.0 * precision * recall / (precision + recall) END AS f1
         |FROM sel ORDER BY class_id""".stripMargin,

    // greedy NMS: DuckDB replays the sequential suppression loop as a
    // recursive CTE (one score rank per step, kept-list carried as a
    // struct list), same integer ranking + IoU gate as the Spark kernel
    "q29d_nms" ->
      s"""WITH RECURSIVE $NMS_CTES
         |SELECT image_id, class_id, pred_id, CAST(si AS DOUBLE) / 1000.0 AS score
         |FROM keptd ORDER BY image_id, class_id, pred_id""".stripMargin,

    // per-class VOC AP over post-NMS detections: the shared AP-sweep
    // chain at the single threshold index 10 (IoU >= 0.5)
    "q29c_det_ap" -> apSweepOracleSql(Seq(10), coco = false),

    // COCO mAP@[.5:.95]: the same chain over the ten indices, zero-TP
    // cells coalesced to ap 0, rollup = decimal-carrier cell mean
    "q29e_det_map_coco" -> apSweepOracleSql(10 to 19, coco = true),

    // VOC07 11-point AP (the reference's own training metric): the q29c
    // chain with the envelope sampled at recall in {0, 0.1, ..., 1}
    "q29f_det_ap_voc07" -> apSweepOracleSql(Seq(10), coco = false, elevenPoint = true),

    // COCO mAP under COCO's own greedy score-order assignment — the
    // recursive-CTE replay of the sequential claim loop
    "q29g_det_map_coco_greedy" -> apSweepOracleSql(10 to 19, coco = true, greedy = true),
    "q29i_det_coco_scoreboard" -> cocoScoreboardOracleSql,
    // class-agnostic mutual-best matching (the q29b window rule without
    // the class key) over the NMS-kept detections, then the confusion
    // matrix + the missed/background margins
    "q29j_det_confusion" ->
      s"""WITH RECURSIVE $NMS_CTES,
         |pairs AS (SELECT g.gt_id, g.class_id AS gt_class, p.pred_id,
         |            p.class_id AS pred_class, CAST(inter AS DOUBLE) / uni AS iou
         |          FROM gt g JOIN keptd p ON g.image_id = p.image_id,
         |          LATERAL (SELECT
         |            GREATEST(0, LEAST(g.gx + g.gw, p.x + p.w) - GREATEST(g.gx, p.x))
         |            * GREATEST(0, LEAST(g.gy + g.gh, p.y + p.h) - GREATEST(g.gy, p.y)) AS inter,
         |            g.gw * g.gh + p.w * p.h
         |            - GREATEST(0, LEAST(g.gx + g.gw, p.x + p.w) - GREATEST(g.gx, p.x))
         |              * GREATEST(0, LEAST(g.gy + g.gh, p.y + p.h) - GREATEST(g.gy, p.y)) AS uni) t
         |          WHERE CAST(inter AS DOUBLE) / uni >= 0.5),
         |m AS (SELECT gt_id, pred_id, gt_class, pred_class FROM (
         |        SELECT gt_id, pred_id, gt_class, pred_class,
         |          ROW_NUMBER() OVER (PARTITION BY pred_id ORDER BY iou DESC, gt_id) AS rp,
         |          ROW_NUMBER() OVER (PARTITION BY gt_id ORDER BY iou DESC, pred_id) AS rg
         |        FROM pairs) WHERE rp = 1 AND rg = 1)
         |SELECT gt_class, pred_class, CAST(COUNT(*) AS BIGINT) AS n
         |FROM m GROUP BY 1, 2
         |UNION ALL
         |SELECT g.class_id, CAST(-1 AS BIGINT), CAST(COUNT(*) AS BIGINT)
         |FROM gt g LEFT JOIN m ON m.gt_id = g.gt_id
         |WHERE m.gt_id IS NULL GROUP BY 1
         |UNION ALL
         |SELECT CAST(-1 AS BIGINT), p.class_id, CAST(COUNT(*) AS BIGINT)
         |FROM keptd p LEFT JOIN m ON m.pred_id = p.pred_id
         |WHERE m.pred_id IS NULL GROUP BY 2
         |ORDER BY gt_class, pred_class""".stripMargin,

    // the exact-reproduction arm for the reference's VOC07MApMetric:
    // 11-point interpolation AND greedy score-order assignment together
    "q29h_det_ap_voc07_greedy" ->
      apSweepOracleSql(Seq(10), coco = false, elevenPoint = true, greedy = true),

    // track stitching: identical frame numbering, box synthesis, IoU gate,
    // mutual-best links, then DuckDB's recursive closure in place of the
    // distributed min-label propagation (the q55 oracle pattern)
    "q32_track_stitch" ->
      """WITH RECURSIVE det AS (
        |  SELECT event_id AS det_id, user_id,
        |    (ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1) AS fno
        |  FROM events),
        |g AS (SELECT det_id, user_id, fno // 4 AS tstep,
        |        ((fno % 4) * 160 + (fno // 4) * 5) % 700 AS x,
        |        ((fno % 4) * 120 + (fno // 4) * 3) % 500 AS y,
        |        40 + ((fno % 4) * 7) % 30 AS wd,
        |        40 + ((fno % 4) * 11) % 25 AS ht
        |      FROM det),
        |links AS (SELECT a.det_id AS cur_id, b.det_id AS nxt_id,
        |            CAST(inter AS DOUBLE) / (a.wd * a.ht + b.wd * b.ht - inter) AS iou
        |          FROM g a JOIN g b ON a.user_id = b.user_id AND b.tstep = a.tstep + 1,
        |          LATERAL (SELECT
        |            GREATEST(0, LEAST(a.x + a.wd, b.x + b.wd) - GREATEST(a.x, b.x))
        |            * GREATEST(0, LEAST(a.y + a.ht, b.y + b.ht) - GREATEST(a.y, b.y)) AS inter) t
        |          WHERE CAST(inter AS DOUBLE) / (a.wd * a.ht + b.wd * b.ht - inter) >= 0.3),
        |mutual AS (SELECT cur_id, nxt_id FROM (
        |             SELECT cur_id, nxt_id,
        |               ROW_NUMBER() OVER (PARTITION BY cur_id ORDER BY iou DESC, nxt_id) AS rp,
        |               ROW_NUMBER() OVER (PARTITION BY nxt_id ORDER BY iou DESC, cur_id) AS rg
        |             FROM links) WHERE rp = 1 AND rg = 1),
        |nodes AS (SELECT DISTINCT cur_id AS u FROM mutual UNION SELECT DISTINCT nxt_id FROM mutual),
        |edges AS (SELECT cur_id AS u, nxt_id AS v FROM mutual UNION SELECT nxt_id, cur_id FROM mutual),
        |reach(src, dst) AS (
        |  SELECT u, u FROM nodes
        |  UNION
        |  SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u),
        |canon AS (SELECT src AS det_id, MIN(dst) AS track_id FROM reach GROUP BY src),
        |asg AS (SELECT g.det_id, g.user_id, g.tstep, COALESCE(c.track_id, g.det_id) AS track_id
        |        FROM g LEFT JOIN canon c USING (det_id))
        |SELECT track_id, CAST(MIN(user_id) AS BIGINT) AS camera_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_dets,
        |  CAST(MIN(tstep) AS BIGINT) AS t_first, CAST(MAX(tstep) AS BIGINT) AS t_last
        |FROM asg GROUP BY track_id ORDER BY track_id""".stripMargin,

    "q30_train_val_split" ->
      """SELECT lang,
        |  CASE WHEN (doc_id * 2654435761) % 100 < 80 THEN 'train' ELSE 'val' END AS split,
        |  COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM documents
        |GROUP BY lang, CASE WHEN (doc_id * 2654435761) % 100 < 80 THEN 'train' ELSE 'val' END
        |ORDER BY lang, split""".stripMargin,

    "q35_funnel" ->
      """WITH agg AS (
        |  SELECT user_id,
        |    MIN(CASE WHEN event_type = 'click' THEN epoch_ns(ts) END) AS first_click_ns,
        |    COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS n_clicks,
        |    COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchases
        |  FROM events GROUP BY user_id)
        |SELECT user_id,
        |  COALESCE(first_click_ns, 0) // 1000 AS first_click_us,
        |  n_clicks, n_purchases,
        |  COALESCE(first_click_ns IS NOT NULL AND EXISTS (
        |    SELECT 1 FROM events e WHERE e.user_id = agg.user_id
        |      AND e.event_type = 'purchase'
        |      AND epoch_ns(e.ts) >= first_click_ns
        |      AND epoch_ns(e.ts) <= first_click_ns + 172800000000000), FALSE) AS converted
        |FROM agg ORDER BY user_id""".stripMargin,

    "q36_sample" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE (doc_id * 2654435761) % 100 < 10 ORDER BY doc_id""".stripMargin,

    "q37_mp4_manifest" ->
      """WITH x AS (SELECT user_id, event_id, ts, epoch_us(ts) AS tus FROM events)
        |SELECT user_id, event_id,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS frame_no,
        |  CAST(COUNT(*) OVER w AS BIGINT) AS n_frames,
        |  MIN(tus) OVER w AS start_us,
        |  MAX(tus) OVER w AS end_us,
        |  CASE WHEN MAX(tus) OVER w > MIN(tus) OVER w
        |       THEN (COUNT(*) OVER w - 1) / ((MAX(tus) OVER w - MIN(tus) OVER w) / 1e6)
        |       ELSE 0.0 END AS fps
        |FROM x WINDOW w AS (PARTITION BY user_id)
        |ORDER BY user_id, frame_no""".stripMargin,

    // deliberately the PLAIN join: the parity gate proves the salted
    // rewrite is semantics-preserving
    "q34_salted_join" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, o_totalprice
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT' AND l_quantity >= 30
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q40_dedup_exact" ->
      """SELECT MIN(doc_id) AS doc_id, md5(text) AS text_hash, COUNT(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY doc_id""".stripMargin,

    "q41_dedup_ngram" ->
      s"""WITH $SHINGLES,
         |posting AS (SELECT doc_id, unnest(hs) AS s FROM sh),
         |cnt AS (SELECT doc_id, CAST(len(hs) AS BIGINT) AS n FROM sh),
         |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
         |          FROM posting a JOIN posting b ON a.s = b.s AND a.doc_id < b.doc_id
         |          GROUP BY a.doc_id, b.doc_id)
         |SELECT doc_a, doc_b, shared / (ca.n + cb.n - shared) AS jaccard
         |FROM pairs JOIN cnt ca ON doc_a = ca.doc_id JOIN cnt cb ON doc_b = cb.doc_id
         |WHERE shared / (ca.n + cb.n - shared) >= 0.5
         |ORDER BY doc_a, doc_b""".stripMargin,

    // q41d: the same inverted-index evidence scored ASYMMETRICALLY —
    // containment of the smaller shingle set, the subsumption catch
    "q41d_dedup_containment" ->
      s"""WITH $SHINGLES,
         |posting AS (SELECT doc_id, unnest(hs) AS s FROM sh),
         |cnt AS (SELECT doc_id, CAST(len(hs) AS BIGINT) AS n FROM sh),
         |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
         |          FROM posting a JOIN posting b ON a.s = b.s AND a.doc_id < b.doc_id
         |          GROUP BY a.doc_id, b.doc_id),
         |sc AS (SELECT doc_a, doc_b, ca.n AS na, cb.n AS nb, shared
         |       FROM pairs JOIN cnt ca ON doc_a = ca.doc_id JOIN cnt cb ON doc_b = cb.doc_id)
         |SELECT
         |  CASE WHEN na < nb OR (na = nb AND doc_a < doc_b) THEN doc_a ELSE doc_b END AS contained_id,
         |  CASE WHEN na < nb OR (na = nb AND doc_a < doc_b) THEN doc_b ELSE doc_a END AS container_id,
         |  shared / LEAST(na, nb) AS containment,
         |  shared / (na + nb - shared) AS jaccard
         |FROM sc WHERE shared / LEAST(na, nb) >= 0.8
         |ORDER BY contained_id, container_id""".stripMargin,

    // deliberately q41's PLAIN inverted-index oracle: the parity gate
    // proves the prefix filter + merge-walk verification is lossless
    "q41c_dedup_ngram_prefix" ->
      s"""WITH $SHINGLES,
         |posting AS (SELECT doc_id, unnest(hs) AS s FROM sh),
         |cnt AS (SELECT doc_id, CAST(len(hs) AS BIGINT) AS n FROM sh),
         |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
         |          FROM posting a JOIN posting b ON a.s = b.s AND a.doc_id < b.doc_id
         |          GROUP BY a.doc_id, b.doc_id)
         |SELECT doc_a, doc_b, shared / (ca.n + cb.n - shared) AS jaccard
         |FROM pairs JOIN cnt ca ON doc_a = ca.doc_id JOIN cnt cb ON doc_b = cb.doc_id
         |WHERE shared / (ca.n + cb.n - shared) >= 0.5
         |ORDER BY doc_a, doc_b""".stripMargin,

    "q41b_dedup_ngram_capped" ->
      s"""WITH $SHINGLES,
         |posting AS (SELECT doc_id, unnest(hs) AS s FROM sh),
         |cnt AS (SELECT doc_id, CAST(len(hs) AS BIGINT) AS n FROM sh),
         |elig AS (SELECT s FROM posting GROUP BY s HAVING COUNT(*) BETWEEN 2 AND 4),
         |pe AS (SELECT doc_id, s FROM posting JOIN elig USING (s)),
         |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
         |          FROM pe a JOIN pe b ON a.s = b.s AND a.doc_id < b.doc_id
         |          GROUP BY a.doc_id, b.doc_id)
         |SELECT doc_a, doc_b, shared / (ca.n + cb.n - shared) AS jaccard
         |FROM pairs JOIN cnt ca ON doc_a = ca.doc_id JOIN cnt cb ON doc_b = cb.doc_id
         |WHERE shared / (ca.n + cb.n - shared) >= 0.5
         |ORDER BY doc_a, doc_b""".stripMargin,

    "q42_dedup_minhash" ->
      s"""WITH $SHINGLES,
         |h AS (SELECT doc_id, hs FROM sh),
         |sigs AS (SELECT doc_id, i,
         |           list_min(list_transform(hs, v -> ((2*i+1)*v + 7919*i + 13) % 2147483647)) AS mh
         |         FROM h, range(16) t(i)),
         |bands AS (SELECT doc_id, i // 4 AS band,
         |            string_agg(mh::VARCHAR, ',' ORDER BY i) AS sig
         |          FROM sigs GROUP BY doc_id, i // 4)
         |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |FROM bands a JOIN bands b
         |  ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
         |ORDER BY doc_a, doc_b""".stripMargin,

    // recall evaluation nests q41's exact pairs (ground truth), q42's
    // banded candidates, and q43's simhash pairs verbatim, then joins on
    // the pair keys — each CTE is its donor oracle's text (q43's `h`
    // renamed h43 to avoid colliding with the minhash CTEs)
    // q96b: the winnow operating curve — per-w q50c arms (suffixed CTE
    // chains off the shared hash stream) vs q41's exact >=0.5 truth;
    // a pair-less arm keeps its row with zero counts (LEFT JOIN + 0.0,
    // never a 0/0)
    "q96b_winnow_curve" ->
      s"""WITH $SHINGLES, $winnowHashCtes,
         |${winnowArmCtes(2)},
         |${winnowArmCtes(4)},
         |${winnowArmCtes(8)},
         |posting AS (SELECT doc_id, unnest(hs) AS s FROM sh),
         |cnt AS (SELECT doc_id, CAST(len(hs) AS BIGINT) AS n FROM sh),
         |jp AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
         |       FROM posting a JOIN posting b ON a.s = b.s AND a.doc_id < b.doc_id
         |       GROUP BY a.doc_id, b.doc_id),
         |exact AS (SELECT doc_a, doc_b FROM jp
         |          JOIN cnt ca ON doc_a = ca.doc_id JOIN cnt cb ON doc_b = cb.doc_id
         |          WHERE shared / (ca.n + cb.n - shared) >= 0.5),
         |nex AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_exact FROM exact),
         |idx AS (SELECT CAST(2 AS BIGINT) AS w, CAST(COUNT(*) AS BIGINT) AS n_index FROM sel2
         |        UNION ALL SELECT CAST(4 AS BIGINT), CAST(COUNT(*) AS BIGINT) FROM sel4
         |        UNION ALL SELECT CAST(8 AS BIGINT), CAST(COUNT(*) AS BIGINT) FROM sel8),
         |cand AS (SELECT CAST(2 AS BIGINT) AS w, doc_a, doc_b FROM wnp2
         |         UNION ALL SELECT CAST(4 AS BIGINT), doc_a, doc_b FROM wnp4
         |         UNION ALL SELECT CAST(8 AS BIGINT), doc_a, doc_b FROM wnp8),
         |agg AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n_candidates,
         |          CAST(SUM(CASE WHEN e.doc_a IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_caught
         |        FROM cand c LEFT JOIN exact e
         |          ON c.doc_a = e.doc_a AND c.doc_b = e.doc_b
         |        GROUP BY w)
         |SELECT idx.w AS w, n_index,
         |  COALESCE(n_candidates, 0) AS n_candidates, n_exact,
         |  COALESCE(n_caught, 0) AS n_caught,
         |  CASE WHEN n_exact > 0
         |       THEN CAST(COALESCE(n_caught, 0) AS DOUBLE) / CAST(n_exact AS DOUBLE)
         |       ELSE 0.0 END AS recall,
         |  CASE WHEN COALESCE(n_candidates, 0) > 0
         |       THEN CAST(n_caught AS DOUBLE) / CAST(n_candidates AS DOUBLE)
         |       ELSE 0.0 END AS "precision"
         |FROM idx LEFT JOIN agg ON idx.w = agg.w, nex ORDER BY w""".stripMargin,

    "q86_dedup_recall" ->
      s"""WITH $SHINGLES, $winnowCtes,
         |$winnowPairCtes,
         |posting AS (SELECT doc_id, unnest(hs) AS s FROM sh),
         |cnt AS (SELECT doc_id, CAST(len(hs) AS BIGINT) AS n FROM sh),
         |jp AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
         |       FROM posting a JOIN posting b ON a.s = b.s AND a.doc_id < b.doc_id
         |       GROUP BY a.doc_id, b.doc_id),
         |exact AS (SELECT doc_a, doc_b FROM jp
         |          JOIN cnt ca ON doc_a = ca.doc_id JOIN cnt cb ON doc_b = cb.doc_id
         |          WHERE shared / (ca.n + cb.n - shared) >= 0.5),
         |sigs AS (SELECT doc_id, i,
         |           list_min(list_transform(hs, v -> ((2*i+1)*v + 7919*i + 13) % 2147483647)) AS mh
         |         FROM sh, range(16) t(i)),
         |bands AS (SELECT doc_id, i // 4 AS band,
         |            string_agg(mh::VARCHAR, ',' ORDER BY i) AS sig
         |          FROM sigs GROUP BY doc_id, i // 4),
         |mhp AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |        FROM bands a JOIN bands b
         |          ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
         |h43 AS (SELECT doc_id,
         |    list_transform(string_split(text, ' '),
         |      t -> ${PH("t")} + ${PH2("t")} * 1073741824) AS hs
         |  FROM documents),
         |bits AS (SELECT doc_id, j,
         |    CASE WHEN list_sum(list_transform(hs, v -> 2*((v >> j) & 1) - 1)) >= 0
         |         THEN (CAST(1 AS BIGINT) << j) ELSE 0 END AS bitval
         |  FROM h43, range(60) t(j)),
         |sims AS (SELECT doc_id, CAST(SUM(bitval) AS BIGINT) AS simhash FROM bits GROUP BY doc_id),
         |shp AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |        FROM sims a JOIN sims b ON a.doc_id < b.doc_id
         |        WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
         |cand AS (SELECT 'minhash' AS method, doc_a, doc_b FROM mhp
         |         UNION ALL SELECT 'simhash', doc_a, doc_b FROM shp
         |         UNION ALL SELECT 'winnow', doc_a, doc_b FROM wnp),
         |nex AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_exact FROM exact),
         |agg AS (SELECT method, CAST(COUNT(*) AS BIGINT) AS n_candidates,
         |          CAST(SUM(CASE WHEN e.doc_a IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_caught
         |        FROM cand c LEFT JOIN exact e
         |          ON c.doc_a = e.doc_a AND c.doc_b = e.doc_b
         |        GROUP BY method)
         |SELECT method, n_candidates, n_exact, n_caught,
         |  CASE WHEN n_exact > 0 THEN CAST(n_caught AS DOUBLE) / CAST(n_exact AS DOUBLE)
         |       ELSE 0.0 END AS recall,
         |  CAST(n_caught AS DOUBLE) / CAST(n_candidates AS DOUBLE) AS jaccard_precision
         |FROM agg, nex ORDER BY method""".stripMargin,

    "q55_dedup_groups" ->
      s"""WITH RECURSIVE $SHINGLES,
         |h AS (SELECT doc_id, hs FROM sh),
         |sigs AS (SELECT doc_id, i,
         |           list_min(list_transform(hs, v -> ((2*i+1)*v + 7919*i + 13) % 2147483647)) AS mh
         |         FROM h, range(16) t(i)),
         |bands AS (SELECT doc_id, i // 4 AS band,
         |            string_agg(mh::VARCHAR, ',' ORDER BY i) AS sig
         |          FROM sigs GROUP BY doc_id, i // 4),
         |p AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |      FROM bands a JOIN bands b
         |        ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
         |nodes AS (SELECT DISTINCT doc_a AS u FROM p UNION SELECT DISTINCT doc_b FROM p),
         |edges AS (SELECT doc_a AS u, doc_b AS v FROM p UNION SELECT doc_b, doc_a FROM p),
         |reach(src, dst) AS (
         |  SELECT u, u FROM nodes
         |  UNION
         |  SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u),
         |canon AS (SELECT src AS doc_id, MIN(dst) AS canonical FROM reach GROUP BY src)
         |SELECT d.doc_id, COALESCE(c.canonical, d.doc_id) AS canonical,
         |  (d.doc_id = COALESCE(c.canonical, d.doc_id)) AS is_canonical
         |FROM documents d LEFT JOIN canon c USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    // q55d: the q55 closure joined back to the corpus — per-source doc
    // and token attrition if every non-canonical member dropped
    "q55d_dedup_savings" ->
      s"""WITH RECURSIVE $SHINGLES,
         |h AS (SELECT doc_id, hs FROM sh),
         |sigs AS (SELECT doc_id, i,
         |           list_min(list_transform(hs, v -> ((2*i+1)*v + 7919*i + 13) % 2147483647)) AS mh
         |         FROM h, range(16) t(i)),
         |bands AS (SELECT doc_id, i // 4 AS band,
         |            string_agg(mh::VARCHAR, ',' ORDER BY i) AS sig
         |          FROM sigs GROUP BY doc_id, i // 4),
         |p AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |      FROM bands a JOIN bands b
         |        ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
         |nodes AS (SELECT DISTINCT doc_a AS u FROM p UNION SELECT DISTINCT doc_b FROM p),
         |edges AS (SELECT doc_a AS u, doc_b AS v FROM p UNION SELECT doc_b, doc_a FROM p),
         |reach(src, dst) AS (
         |  SELECT u, u FROM nodes
         |  UNION
         |  SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u),
         |canon AS (SELECT src AS doc_id, MIN(dst) AS canonical FROM reach GROUP BY src),
         |lab AS (SELECT d.doc_id, d.source,
         |          CAST(len(string_split(d.text, ' ')) AS BIGINT) AS nt,
         |          (d.doc_id = COALESCE(c.canonical, d.doc_id)) AS is_can
         |        FROM documents d LEFT JOIN canon c USING (doc_id))
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(CASE WHEN NOT is_can THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
         |  CAST(SUM(nt) AS BIGINT) AS tokens_total,
         |  CAST(SUM(CASE WHEN NOT is_can THEN nt ELSE 0 END) AS BIGINT) AS tokens_dropped,
         |  CAST(SUM(CASE WHEN NOT is_can THEN 1 ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS doc_drop_frac,
         |  CAST(SUM(CASE WHEN NOT is_can THEN nt ELSE 0 END) AS DOUBLE) / CAST(SUM(nt) AS DOUBLE) AS token_drop_frac
         |FROM lab GROUP BY source ORDER BY source""".stripMargin,

    // q55c: q55's closure reduced to the cluster-size histogram
    "q55c_group_sizes" ->
      s"""WITH RECURSIVE $SHINGLES,
         |h AS (SELECT doc_id, hs FROM sh),
         |sigs AS (SELECT doc_id, i,
         |           list_min(list_transform(hs, v -> ((2*i+1)*v + 7919*i + 13) % 2147483647)) AS mh
         |         FROM h, range(16) t(i)),
         |bands AS (SELECT doc_id, i // 4 AS band,
         |            string_agg(mh::VARCHAR, ',' ORDER BY i) AS sig
         |          FROM sigs GROUP BY doc_id, i // 4),
         |p AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |      FROM bands a JOIN bands b
         |        ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
         |nodes AS (SELECT DISTINCT doc_a AS u FROM p UNION SELECT DISTINCT doc_b FROM p),
         |edges AS (SELECT doc_a AS u, doc_b AS v FROM p UNION SELECT doc_b, doc_a FROM p),
         |reach(src, dst) AS (
         |  SELECT u, u FROM nodes
         |  UNION
         |  SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u),
         |canon AS (SELECT src AS doc_id, MIN(dst) AS canonical FROM reach GROUP BY src),
         |lab AS (SELECT d.doc_id, COALESCE(c.canonical, d.doc_id) AS canonical
         |        FROM documents d LEFT JOIN canon c USING (doc_id)),
         |gs AS (SELECT canonical, CAST(COUNT(*) AS BIGINT) AS group_size
         |       FROM lab GROUP BY canonical)
         |SELECT group_size, CAST(COUNT(*) AS BIGINT) AS n_groups
         |FROM gs GROUP BY group_size ORDER BY group_size""".stripMargin,

    // the same transitive closure; the representative minimizes the packed
    // (source-trust, doc_id) key instead of bare doc_id
    "q55b_dedup_priority" ->
      s"""WITH RECURSIVE $SHINGLES,
         |h AS (SELECT doc_id, hs FROM sh),
         |sigs AS (SELECT doc_id, i,
         |           list_min(list_transform(hs, v -> ((2*i+1)*v + 7919*i + 13) % 2147483647)) AS mh
         |         FROM h, range(16) t(i)),
         |bands AS (SELECT doc_id, i // 4 AS band,
         |            string_agg(mh::VARCHAR, ',' ORDER BY i) AS sig
         |          FROM sigs GROUP BY doc_id, i // 4),
         |p AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |      FROM bands a JOIN bands b
         |        ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
         |nodes AS (SELECT DISTINCT doc_a AS u FROM p UNION SELECT DISTINCT doc_b FROM p),
         |edges AS (SELECT doc_a AS u, doc_b AS v FROM p UNION SELECT doc_b, doc_a FROM p),
         |reach(src, dst) AS (
         |  SELECT u, u FROM nodes
         |  UNION
         |  SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u),
         |ranks AS (SELECT source,
         |            CAST(ROW_NUMBER() OVER (ORDER BY source) - 1 AS BIGINT) AS trust
         |          FROM (SELECT DISTINCT source FROM documents)),
         |keys AS (SELECT d.doc_id, r.trust * 1099511627776 + d.doc_id AS k
         |         FROM documents d JOIN ranks r USING (source)),
         |canonk AS (SELECT r.src AS doc_id, MIN(k.k) AS ck
         |           FROM reach r JOIN keys k ON r.dst = k.doc_id GROUP BY r.src)
         |SELECT d.doc_id,
         |  COALESCE(c.ck, k.k) % 1099511627776 AS canonical,
         |  (d.doc_id = COALESCE(c.ck, k.k) % 1099511627776) AS is_canonical
         |FROM documents d JOIN keys k USING (doc_id) LEFT JOIN canonk c USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    "q43_dedup_simhash" ->
      s"""WITH h AS (SELECT doc_id,
         |    list_transform(string_split(text, ' '),
         |      t -> ${PH("t")} + ${PH2("t")} * 1073741824) AS hs
         |  FROM documents),
         |bits AS (SELECT doc_id, j,
         |    CASE WHEN list_sum(list_transform(hs, v -> 2*((v >> j) & 1) - 1)) >= 0
         |         THEN (CAST(1 AS BIGINT) << j) ELSE 0 END AS bitval
         |  FROM h, range(60) t(j)),
         |sims AS (SELECT doc_id, CAST(SUM(bitval) AS BIGINT) AS simhash FROM bits GROUP BY doc_id)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
         |FROM sims a JOIN sims b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
         |ORDER BY doc_a, doc_b""".stripMargin,

    "q44_dedup_embedding" ->
      s"""WITH $EMB_NORM
         |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, $DOT64 / (a.nrm * b.nrm) AS cos
         |FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
         |WHERE $DOT64 / (a.nrm * b.nrm) > 0.25
         |ORDER BY vec_a, vec_b""".stripMargin,

    "q44b_dedup_embedding_blocked" ->
      s"""WITH $EMB_NORM,
         |bk AS (SELECT vec_id, label, v, nrm,
         |  ${signBlocksSql(3)} AS blk
         |  FROM n)
         |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, $DOT64 / (a.nrm * b.nrm) AS cos
         |FROM bk a JOIN bk b ON a.label = b.label AND a.blk = b.blk AND a.vec_id < b.vec_id
         |WHERE $DOT64 / (a.nrm * b.nrm) > 0.25
         |ORDER BY vec_a, vec_b""".stripMargin,

    // the dense-corpus dial proven at oracle level: same construction as
    // q44b with 8 planes instead of 3 (256 sub-blocks per label)
    "q44c_dedup_embedding_dense" ->
      s"""WITH $EMB_NORM,
         |bk AS (SELECT vec_id, label, v, nrm,
         |  ${signBlocksSql(8)} AS blk
         |  FROM n)
         |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, $DOT64 / (a.nrm * b.nrm) AS cos
         |FROM bk a JOIN bk b ON a.label = b.label AND a.blk = b.blk AND a.vec_id < b.vec_id
         |WHERE $DOT64 / (a.nrm * b.nrm) > 0.25
         |ORDER BY vec_a, vec_b""".stripMargin,

    // the AUTO dial: bits = min b in [0,16] with maxLabelPop <= 32·2^b —
    // the same exact-integer predicate DedupOps.autoBits evaluates, over
    // the same count; block key = 16-plane key masked to the low `bits`
    // (signBlocks(v, b) == signBlocks(v, 16) & (2^b - 1) by construction)
    "q44d_dedup_embedding_auto" ->
      s"""WITH $EMB_NORM,
         |mp AS (SELECT MAX(cnt) AS maxpop
         |       FROM (SELECT COUNT(*) AS cnt FROM n GROUP BY label)),
         |prm AS (SELECT COALESCE(MIN(b), 16) AS bits
         |        FROM range(0, 17) r(b), mp WHERE mp.maxpop <= 32 * (1 << b)),
         |bk AS (SELECT vec_id, label, v, nrm,
         |  ${signBlocksSql(16)} AS blk16
         |  FROM n),
         |bk2 AS (SELECT vec_id, label, v, nrm,
         |         blk16 & ((1 << (SELECT bits FROM prm)) - 1) AS blk FROM bk)
         |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, $DOT64 / (a.nrm * b.nrm) AS cos
         |FROM bk2 a JOIN bk2 b ON a.label = b.label AND a.blk = b.blk AND a.vec_id < b.vec_id
         |WHERE $DOT64 / (a.nrm * b.nrm) > 0.25
         |ORDER BY vec_a, vec_b""".stripMargin,

    "q45_knn_bruteforce" ->
      s"""WITH $EMB_NORM,
         |j AS (SELECT a.vec_id AS q_id, b.vec_id AS neighbor_id,
         |        $DOT64 / (a.nrm * b.nrm) AS cos
         |      FROM n a JOIN n b ON a.vec_id < 10 AND b.vec_id >= 10)
         |SELECT q_id, neighbor_id, cos, rank FROM (
         |  SELECT q_id, neighbor_id, cos,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank
         |  FROM j) t
         |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,

    // q100: q45's exact scan restricted to the hard band [0.1, 0.25) —
    // below q44's near-dup threshold by construction — ranked per query
    "q100_hard_negatives" ->
      s"""WITH $EMB_NORM,
         |j AS (SELECT a.vec_id AS q_id, b.vec_id AS neighbor_id,
         |        $DOT64 / (a.nrm * b.nrm) AS cos
         |      FROM n a JOIN n b ON a.vec_id < 10 AND b.vec_id >= 10),
         |f AS (SELECT * FROM j WHERE cos >= 0.1 AND cos < 0.25)
         |SELECT q_id, neighbor_id, cos, rank FROM (
         |  SELECT q_id, neighbor_id, cos,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank
         |  FROM f) t
         |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,

    "q47_langid" -> {
      val counts = langCountSqls.map { case (l, e) => s"  $e AS n_$l" }.mkString(",\n")
      s"""SELECT doc_id,
         |$counts,
         |  $langCaseSql AS lang_pred
         |FROM documents ORDER BY doc_id""".stripMargin
    },

    // PSI drift of the q48 score between id-watermark eras: old-era
    // decile edges (quantile_cont = Spark percentile, the q14
    // convention), Laplace-smoothed proportions, carrier-exact terms
    "q110_quality_drift" ->
      """WITH scored AS (SELECT doc_id,
        |    LEAST(1.0, len(string_split(text,' ')) / 100.0)
        |      * (len(list_distinct(string_split(text,' '))) / len(string_split(text,' '))) AS score
        |  FROM documents),
        |wm AS (SELECT (MIN(doc_id) + MAX(doc_id)) // 2 AS wm FROM scored),
        |tg AS (SELECT s.doc_id, s.score, s.doc_id >= w.wm AS is_new
        |       FROM scored s CROSS JOIN wm w),
        |cuts AS (SELECT quantile_cont(score, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS cuts
        |         FROM tg WHERE NOT is_new),
        |bk AS (SELECT t.is_new,
        |         CAST(1 + len(list_filter(c.cuts, x -> t.score >= x)) AS BIGINT) AS bucket
        |       FROM tg t CROSS JOIN cuts c),
        |cnt AS (SELECT bucket,
        |          CAST(COUNT(CASE WHEN NOT is_new THEN 1 END) AS BIGINT) AS n_old,
        |          CAST(COUNT(CASE WHEN is_new THEN 1 END) AS BIGINT) AS n_new
        |        FROM bk GROUP BY bucket),
        |tot AS (SELECT CAST(COUNT(CASE WHEN NOT is_new THEN 1 END) AS BIGINT) AS t_old,
        |          CAST(COUNT(CASE WHEN is_new THEN 1 END) AS BIGINT) AS t_new FROM tg),
        |allb AS (SELECT CAST(unnest(range(1, 11)) AS BIGINT) AS bucket),
        |per AS (SELECT a.bucket,
        |          CASE WHEN a.bucket > 1 THEN c.cuts[CAST(a.bucket - 1 AS INT)] END AS lo,
        |          CASE WHEN a.bucket < 10 THEN c.cuts[CAST(a.bucket AS INT)] END AS hi,
        |          COALESCE(n.n_old, 0) AS n_old, COALESCE(n.n_new, 0) AS n_new,
        |          CAST(COALESCE(n.n_old, 0) + 1 AS DOUBLE) / (t.t_old + 10) AS p_old,
        |          CAST(COALESCE(n.n_new, 0) + 1 AS DOUBLE) / (t.t_new + 10) AS p_new
        |        FROM allb a CROSS JOIN cuts c CROSS JOIN tot t
        |        LEFT JOIN cnt n USING (bucket)),
        |per2 AS (SELECT bucket, lo, hi, n_old, n_new, p_old, p_new,
        |          CAST(CAST((p_new - p_old) * ln(p_new / p_old) AS DECIMAL(27,6)) AS DOUBLE) AS term
        |        FROM per)
        |SELECT bucket, lo, hi, n_old, n_new, p_old, p_new, term FROM per2
        |UNION ALL
        |SELECT CAST(-1 AS BIGINT), NULL, NULL,
        |  CAST(SUM(n_old) AS BIGINT), CAST(SUM(n_new) AS BIGINT), NULL, NULL,
        |  CAST(SUM(CAST(term AS DECIMAL(27,6))) AS DOUBLE)
        |FROM per2 ORDER BY bucket""".stripMargin,

    "q48_quality_score" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
        |  len(list_distinct(string_split(text,' '))) / len(string_split(text,' ')) AS ttr,
        |  len(list_filter(string_split(text,' '), t -> t IN ('the','a','of','and','to','is')))
        |    / len(string_split(text,' ')) AS stop_ratio,
        |  LEAST(1.0, len(string_split(text,' ')) / 100.0)
        |    * (len(list_distinct(string_split(text,' '))) / len(string_split(text,' '))) AS score
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q49_token_count" ->
      """SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(len(string_split(text,' '))) AS BIGINT) AS sum_tokens,
        |  CAST(SUM(len(regexp_extract_all(text, '\w+'))) AS BIGINT) AS sum_word_tokens,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(CAST(SUM(len(string_split(text,' '))) AS BIGINT) AS DOUBLE) / COUNT(*) AS avg_tokens
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q50_fingerprint" ->
      s"""SELECT doc_id, ${PH("text")} AS fingerprint
         |FROM documents ORDER BY doc_id""".stripMargin,

    // q50b winnowing: k=5 token window hashes (the shared md5-60-bit
    // kernel), w=4 sliding window, rightmost-min via the HUGEINT packed
    // key mirroring Spark's DECIMAL(38,0) carrier bit-for-bit
    "q50b_winnow" ->
      s"""WITH $winnowCtes
         |SELECT DISTINCT doc_id,
         |  CAST(4294967296 - minpack % 4294967296 AS BIGINT) AS fp_pos,
         |  CAST(minpack // 4294967296 AS BIGINT) AS fp
         |FROM mw WHERE pos <= greatest(1, m - 3)
         |ORDER BY doc_id, fp_pos""".stripMargin,

    // q50c: Jaccard near-dup pairs over the winnow fingerprint index —
    // df-capped informative keys (<= 64), universe-consistent denominator,
    // minShared 2, threshold 0.35
    "q50c_winnow_dedup" ->
      s"""WITH $winnowCtes,
         |$winnowPairCtes
         |SELECT doc_a, doc_b, shared, jaccard
         |FROM wnp ORDER BY doc_a, doc_b""".stripMargin,

    "q51_embed_stats" ->
      s"""WITH $EMB_NORM
         |SELECT label, COUNT(*) AS n_vectors,
         |  CAST(SUM(CAST(nrm AS DECIMAL(27,6))) AS DOUBLE)/COUNT(nrm) AS avg_norm,
         |  MIN(nrm) AS min_norm, MAX(nrm) AS max_norm
         |FROM n GROUP BY label ORDER BY label""".stripMargin,

    "q46_knn_lsh" ->
      s"""WITH $EMB_NORM,
         |bk AS (SELECT vec_id, v, nrm,
         |  ${signBlocksSql(8)} AS bucket
         |  FROM n),
         |j AS (SELECT a.vec_id AS q_id, b.vec_id AS neighbor_id,
         |        $DOT64 / (a.nrm * b.nrm) AS cos
         |      FROM bk a JOIN bk b ON a.vec_id < 10 AND b.vec_id >= 10 AND a.bucket = b.bucket)
         |SELECT q_id, neighbor_id, cos, rank FROM (
         |  SELECT q_id, neighbor_id, cos,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank
         |  FROM j) t
         |WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin,

    // two independent hash tables OR-ed (SimilarityOps.knnLsh tables=2):
    // bucket_t uses the plane family (((t*977 + j)*131 + i*7919) % 1001) - 500;
    // a pair colliding in both tables ranks ONCE (SELECT DISTINCT = the
    // Spark side's dropDuplicates) — parity proves the cross-table dedup exact
    "q46c_knn_lsh_multi" ->
      s"""WITH $EMB_NORM,
         |bk AS (SELECT vec_id, v, nrm, ${signBlocksSql(8, t = 0)} AS b0, ${signBlocksSql(8, t = 1)} AS b1
         |  FROM n),
         |j AS (SELECT DISTINCT a.vec_id AS q_id, b.vec_id AS neighbor_id,
         |        $DOT64 / (a.nrm * b.nrm) AS cos
         |      FROM bk a JOIN bk b ON a.vec_id < 10 AND b.vec_id >= 10
         |        AND (a.b0 = b.b0 OR a.b1 = b.b1))
         |SELECT q_id, neighbor_id, cos, rank FROM (
         |  SELECT q_id, neighbor_id, cos,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank
         |  FROM j) t
         |WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin,

    "q46b_knn_ivf" ->
      s"""WITH $EMB_NORM,
         |cents AS (SELECT list_id, cv,
         |            sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65),
         |              i -> cv[i] * cv[i])), (x2, y2) -> x2 + y2)) AS cnrm
         |          FROM ($ivfCentsValues) t(list_id, cv)),
         |asg AS (SELECT vec_id, v, nrm, list_id, csim,
         |          ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, list_id) AS crank
         |        FROM (SELECT n.vec_id, n.v, n.nrm, c.list_id,
         |                list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65),
         |                  i -> n.v[i] * c.cv[i])), (x2, y2) -> x2 + y2) / (n.nrm * c.cnrm) AS csim
         |              FROM n, cents c) t),
         |qs AS (SELECT vec_id AS q_id, v AS qv, nrm AS qnrm, list_id FROM asg
         |       WHERE vec_id < 10 AND crank <= 2),
         |cp AS (SELECT vec_id, v, nrm, list_id FROM asg WHERE vec_id >= 10 AND crank = 1),
         |j AS (SELECT q_id, cp.vec_id AS neighbor_id,
         |        list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65),
         |          i -> qs.qv[i] * cp.v[i])), (x2, y2) -> x2 + y2) / (qs.qnrm * cp.nrm) AS cos
         |      FROM cp JOIN qs USING (list_id))
         |SELECT q_id, neighbor_id, cos, rank FROM (
         |  SELECT q_id, neighbor_id, cos,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank
         |  FROM j) t
         |WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin,

    // q46d: q46b's probe-then-rank construction against the FROZEN auto-k
    // gate artifact (generated-oracle pattern — live training is pinned
    // bit-equal to the artifact by AnnIndexSpec, so assignment here is
    // engine-exact)
    "q46d_knn_ivf_auto" ->
      s"""WITH $EMB_NORM,
         |cents AS (SELECT list_id, cv,
         |            sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65),
         |              i -> cv[i] * cv[i])), (x2, y2) -> x2 + y2)) AS cnrm
         |          FROM ($ivfCentsAutoValues) t(list_id, cv)),
         |asg AS (SELECT vec_id, v, nrm, list_id, csim,
         |          ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, list_id) AS crank
         |        FROM (SELECT n.vec_id, n.v, n.nrm, c.list_id,
         |                list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65),
         |                  i -> n.v[i] * c.cv[i])), (x2, y2) -> x2 + y2) / (n.nrm * c.cnrm) AS csim
         |              FROM n, cents c) t),
         |qs AS (SELECT vec_id AS q_id, v AS qv, nrm AS qnrm, list_id FROM asg
         |       WHERE vec_id < 10 AND crank <= 2),
         |cp AS (SELECT vec_id, v, nrm, list_id FROM asg WHERE vec_id >= 10 AND crank = 1),
         |j AS (SELECT q_id, cp.vec_id AS neighbor_id,
         |        list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65),
         |          i -> qs.qv[i] * cp.v[i])), (x2, y2) -> x2 + y2) / (qs.qnrm * cp.nrm) AS cos
         |      FROM cp JOIN qs USING (list_id))
         |SELECT q_id, neighbor_id, cos, rank FROM (
         |  SELECT q_id, neighbor_id, cos,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank
         |  FROM j) t
         |WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin,

    // q46e: ANN under the INVERTED MULTI-INDEX quantizer — per-half L2
    // argmin assignment (cell = i1*K + i2) and additive cell-grid query
    // probing replayed from the frozen ImiCodebooks artifact (the q46d
    // generated-oracle pattern; live training pinned bit-equal by
    // AnnIndexSpec), then q46b's cosine probe-then-rank tail
    "q46e_knn_imi" ->
      s"""WITH $EMB_NORM,
         |$imiSearchCtes
         |SELECT q_id, neighbor_id, cos, rank FROM imiTop
         |ORDER BY q_id, rank""".stripMargin,

    // q46f: the IMI recall row — q68d's evaluation shape over the SAME
    // imi chain (shared CTE text: the search being gated and the gate
    // cannot drift apart)
    "q46f_ann_recall_imi" ->
      s"""WITH $EMB_NORM,
         |$imiSearchCtes,
         |bf AS (SELECT q_id, neighbor_id FROM (
         |    SELECT a.vec_id AS q_id, b.vec_id AS neighbor_id,
         |      ROW_NUMBER() OVER (PARTITION BY a.vec_id ORDER BY $DOT64 / (a.nrm * b.nrm) DESC, b.vec_id) AS rank
         |    FROM n a JOIN n b ON a.vec_id < 10 AND b.vec_id >= 10) t
         |  WHERE rank <= 3)
         |SELECT bf.q_id,
         |  CAST(COUNT(DISTINCT bf.neighbor_id) AS BIGINT) AS n_exact,
         |  CAST(COUNT(i.neighbor_id) AS BIGINT) AS imi_hits,
         |  CAST(COUNT(i.neighbor_id) AS DOUBLE) / CAST(COUNT(DISTINCT bf.neighbor_id) AS DOUBLE) AS imi_recall
         |FROM bf LEFT JOIN imiTop i ON bf.q_id = i.q_id AND bf.neighbor_id = i.neighbor_id
         |GROUP BY bf.q_id ORDER BY bf.q_id""".stripMargin,

    // q54b: q54's health histogram under the frozen auto-k artifact,
    // over the searchable corpus only (what the index holds)
    "q54b_ivf_balance_auto" ->
      s"""WITH $EMB_NORM,
         |cents AS (SELECT list_id, cv,
         |            sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65),
         |              i -> cv[i] * cv[i])), (x2, y2) -> x2 + y2)) AS cnrm
         |          FROM ($ivfCentsAutoValues) t(list_id, cv)),
         |asg AS (SELECT vec_id, list_id,
         |          ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, list_id) AS crank
         |        FROM (SELECT n.vec_id, c.list_id,
         |                list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65),
         |                  i -> n.v[i] * c.cv[i])), (x2, y2) -> x2 + y2) / (n.nrm * c.cnrm) AS csim
         |              FROM (SELECT * FROM n WHERE vec_id >= 10) n, cents c) t)
         |SELECT list_id, CAST(COUNT(*) AS BIGINT) AS n_vectors
         |FROM asg WHERE crank = 1 GROUP BY list_id ORDER BY list_id""".stripMargin,

    // q101: D4 prototypicality pruning — assignment replayed from the
    // frozen auto-k artifact (q54b's CTE keeping csim), then the
    // within-cluster prototypicality rank and the ceil(frac·n) cut
    "q101_prototype_prune" ->
      s"""WITH $EMB_NORM,
         |cents AS (SELECT list_id, cv,
         |            sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65),
         |              i -> cv[i] * cv[i])), (x2, y2) -> x2 + y2)) AS cnrm
         |          FROM ($ivfCentsAutoValues) t(list_id, cv)),
         |asg AS (SELECT vec_id, list_id, csim,
         |          ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, list_id) AS crank
         |        FROM (SELECT n.vec_id, c.list_id,
         |                list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65),
         |                  i -> n.v[i] * c.cv[i])), (x2, y2) -> x2 + y2) / (n.nrm * c.cnrm) AS csim
         |              FROM (SELECT * FROM n WHERE vec_id >= 10) n, cents c) t),
         |r AS (SELECT vec_id, list_id, csim AS proto_cos,
         |        CAST(ROW_NUMBER() OVER (PARTITION BY list_id ORDER BY csim DESC, vec_id) AS BIGINT) AS proto_rank,
         |        CAST(COUNT(*) OVER (PARTITION BY list_id) AS BIGINT) AS n_list
         |      FROM asg WHERE crank = 1)
         |SELECT vec_id, list_id, proto_cos, proto_rank, n_list,
         |  CAST(proto_rank AS DOUBLE) > CEIL(0.25 * CAST(n_list AS DOUBLE)) AS keep
         |FROM r ORDER BY vec_id""".stripMargin,

    // q103: the per-cluster corpus map — frozen-artifact assignment
    // (q54b's CTE) joined to the q48 score formula on vec_id = doc_id;
    // mean/entropy through the DECIMAL(27,6) exact carrier
    "q103_cluster_map" ->
      s"""WITH $EMB_NORM,
         |cents AS (SELECT list_id, cv,
         |            sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65),
         |              i -> cv[i] * cv[i])), (x2, y2) -> x2 + y2)) AS cnrm
         |          FROM ($ivfCentsAutoValues) t(list_id, cv)),
         |asg AS (SELECT vec_id, list_id,
         |          ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, list_id) AS crank
         |        FROM (SELECT n.vec_id, c.list_id,
         |                list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65),
         |                  i -> n.v[i] * c.cv[i])), (x2, y2) -> x2 + y2) / (n.nrm * c.cnrm) AS csim
         |              FROM (SELECT * FROM n WHERE vec_id >= 10) n, cents c) t),
         |docs AS (SELECT a.list_id, d.source,
         |           CAST(len(string_split(d.text,' ')) AS BIGINT) AS n_tokens,
         |           LEAST(1.0, len(string_split(d.text,' ')) / 100.0)
         |             * (len(list_distinct(string_split(d.text,' '))) / len(string_split(d.text,' '))) AS score
         |         FROM documents d
         |         JOIN (SELECT vec_id, list_id FROM asg WHERE crank = 1) a ON d.doc_id = a.vec_id),
         |base AS (SELECT list_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
         |           CAST(SUM(CAST(score AS DECIMAL(27,6))) AS DOUBLE) / COUNT(score) AS avg_score
         |         FROM docs GROUP BY list_id),
         |src AS (SELECT list_id, source, CAST(COUNT(*) AS BIGINT) AS n_src
         |        FROM docs GROUP BY list_id, source),
         |ent AS (SELECT s.list_id,
         |          -CAST(SUM(CAST((CAST(n_src AS DOUBLE)/CAST(n_docs AS DOUBLE))
         |            * ln(CAST(n_src AS DOUBLE)/CAST(n_docs AS DOUBLE)) AS DECIMAL(27,6))) AS DOUBLE) AS src_entropy
         |        FROM src s JOIN base b ON s.list_id = b.list_id GROUP BY s.list_id),
         |top AS (SELECT list_id, source AS top_source FROM (
         |          SELECT list_id, source,
         |            ROW_NUMBER() OVER (PARTITION BY list_id ORDER BY n_src DESC, source) AS rn
         |          FROM src) t WHERE rn = 1)
         |SELECT b.list_id, n_docs, n_tokens, avg_score, src_entropy, top_source
         |FROM base b JOIN ent ON b.list_id = ent.list_id JOIN top ON b.list_id = top.list_id
         |ORDER BY b.list_id""".stripMargin,

    // q68e: the auto arm's recall-vs-nprobe curve — q68c's oracle device
    // (probe RANK fanned over a VALUES points table) against the frozen
    // auto artifact, raw-float arm
    "q68e_ann_recall_curve_auto" -> annRecallCurveAutoOracleSql(10, 3, Seq(1, 2, 4, 8, 16, 32)),

    // q68d: the auto arm's per-query recall vs exact brute force — both
    // arms replayed from the frozen artifact / the shared scan
    "q68d_ann_recall_auto" ->
      s"""WITH $EMB_NORM,
         |cents AS (SELECT list_id, cv,
         |            sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65),
         |              i -> cv[i] * cv[i])), (x2, y2) -> x2 + y2)) AS cnrm
         |          FROM ($ivfCentsAutoValues) t(list_id, cv)),
         |asg AS (SELECT vec_id, v, nrm, list_id, csim,
         |          ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, list_id) AS crank
         |        FROM (SELECT n.vec_id, n.v, n.nrm, c.list_id,
         |                list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65),
         |                  i -> n.v[i] * c.cv[i])), (x2, y2) -> x2 + y2) / (n.nrm * c.cnrm) AS csim
         |              FROM n, cents c) t),
         |qs AS (SELECT vec_id AS q_id, v AS qv, nrm AS qnrm, list_id FROM asg
         |       WHERE vec_id < 10 AND crank <= 2),
         |cp AS (SELECT vec_id, v, nrm, list_id FROM asg WHERE vec_id >= 10 AND crank = 1),
         |ivf AS (SELECT q_id, neighbor_id FROM (
         |    SELECT q_id, neighbor_id,
         |      ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS rank
         |    FROM (SELECT q_id, cp.vec_id AS neighbor_id,
         |            list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65),
         |              i -> qs.qv[i] * cp.v[i])), (x2, y2) -> x2 + y2) / (qs.qnrm * cp.nrm) AS cos
         |          FROM cp JOIN qs USING (list_id)) j) t
         |  WHERE rank <= 3),
         |bf AS (SELECT q_id, neighbor_id FROM (
         |    SELECT a.vec_id AS q_id, b.vec_id AS neighbor_id,
         |      ROW_NUMBER() OVER (PARTITION BY a.vec_id ORDER BY $DOT64 / (a.nrm * b.nrm) DESC, b.vec_id) AS rank
         |    FROM n a JOIN n b ON a.vec_id < 10 AND b.vec_id >= 10) t
         |  WHERE rank <= 3)
         |SELECT bf.q_id,
         |  CAST(COUNT(DISTINCT bf.neighbor_id) AS BIGINT) AS n_exact,
         |  CAST(COUNT(i.neighbor_id) AS BIGINT) AS auto_hits,
         |  CAST(COUNT(i.neighbor_id) AS DOUBLE) / CAST(COUNT(DISTINCT bf.neighbor_id) AS DOUBLE) AS auto_recall
         |FROM bf LEFT JOIN ivf i ON bf.q_id = i.q_id AND bf.neighbor_id = i.neighbor_id
         |GROUP BY bf.q_id ORDER BY bf.q_id""".stripMargin,

    "q54_ivf_balance" ->
      s"""WITH $EMB_NORM,
         |cents AS (SELECT list_id, cv,
         |            sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65),
         |              i -> cv[i] * cv[i])), (x2, y2) -> x2 + y2)) AS cnrm
         |          FROM ($ivfCentsValues) t(list_id, cv)),
         |asg AS (SELECT vec_id, list_id,
         |          ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, list_id) AS crank
         |        FROM (SELECT n.vec_id, c.list_id,
         |                list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65),
         |                  i -> n.v[i] * c.cv[i])), (x2, y2) -> x2 + y2) / (n.nrm * c.cnrm) AS csim
         |              FROM n, cents c) t)
         |SELECT list_id, CAST(COUNT(*) AS BIGINT) AS n_vectors
         |FROM asg WHERE crank = 1 GROUP BY list_id ORDER BY list_id""".stripMargin,

    "q52_top_terms" ->
      """WITH tf AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tfc AS (SELECT doc_id, term, COUNT(*) AS tf FROM tf GROUP BY doc_id, term),
        |dfc AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tfc GROUP BY term),
        |n AS (SELECT COUNT(*) AS n_total FROM documents),
        |scored AS (SELECT doc_id, term, tf, df, tf * n_total / df AS score
        |           FROM tfc JOIN dfc USING (term), n)
        |SELECT doc_id, rank, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df, score
        |FROM (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS BIGINT) AS rank
        |      FROM scored) t
        |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,

    // q48b: median/MAD robust z audit — Spark percentile == DuckDB
    // quantile_cont (the q14 convention); COUNT sums cast (HUGEINT)
    "q48b_length_outliers" ->
      """WITH m AS (SELECT source, quantile_cont(n_chars, 0.5) AS med_chars
        |           FROM documents GROUP BY source),
        |d AS (SELECT doc.source, doc.n_chars, m.med_chars,
        |        abs(doc.n_chars - m.med_chars) AS ad
        |      FROM documents doc JOIN m USING (source)),
        |md AS (SELECT source, quantile_cont(ad, 0.5) AS mad_chars FROM d GROUP BY source),
        |z AS (SELECT d.source, d.med_chars, md.mad_chars,
        |        CASE WHEN md.mad_chars > 0 THEN 0.6745 * d.ad / md.mad_chars END AS z
        |      FROM d JOIN md USING (source))
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  MIN(med_chars) AS med_chars, MIN(mad_chars) AS mad_chars,
        |  CAST(SUM(CASE WHEN z > 2.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_mild,
        |  CAST(SUM(CASE WHEN z > 3.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme,
        |  MAX(z) AS max_z
        |FROM z GROUP BY source ORDER BY source""".stripMargin,

    // q52b: the Heaps-law curve via the first-occurrence trick — vocab at
    // cutoff c = |{terms: min(doc_id) <= c}|; SUM OVER windows cast to
    // BIGINT (DuckDB SUM(BIGINT) is HUGEINT — the round-4 q61 lesson)
    "q52b_vocab_growth" ->
      """WITH h AS (SELECT MAX(doc_id) + 1 AS horizon FROM documents),
        |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |ft AS (SELECT term, MIN(doc_id) AS first_doc FROM tok GROUP BY term),
        |nt AS (SELECT LEAST(10, CAST(FLOOR(first_doc * 10 / horizon) AS BIGINT) + 1) AS bucket,
        |         CAST(COUNT(*) AS BIGINT) AS new_terms FROM ft, h GROUP BY 1),
        |pb AS (SELECT LEAST(10, CAST(FLOOR(doc_id * 10 / horizon) AS BIGINT) + 1) AS bucket,
        |         CAST(COUNT(*) AS BIGINT) AS n_docs,
        |         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |       FROM documents, h GROUP BY 1),
        |j AS (SELECT COALESCE(pb.bucket, nt.bucket) AS bucket,
        |        COALESCE(n_docs, 0) AS n_docs, COALESCE(n_tokens, 0) AS n_tokens,
        |        COALESCE(new_terms, 0) AS new_terms
        |      FROM pb FULL OUTER JOIN nt ON pb.bucket = nt.bucket)
        |SELECT bucket,
        |  CAST(SUM(n_docs) OVER w AS BIGINT) AS n_docs_cum,
        |  CAST(SUM(n_tokens) OVER w AS BIGINT) AS n_tokens_cum,
        |  new_terms,
        |  CAST(SUM(new_terms) OVER w AS BIGINT) AS vocab_size
        |FROM j
        |WINDOW w AS (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY bucket""".stripMargin,

    // q52c: Zipf log-log least squares over the K-bounded head — fit
    // sums on the carrier; a spread-less head yields NULL, never 0/0
    "q52c_zipf_fit" ->
      s"""WITH tok AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
         |tc AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY term),
         |top AS (SELECT term, n FROM tc ORDER BY n DESC, term LIMIT 100),
         |l AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY n DESC, term) AS BIGINT) AS rank,
         |        term, n FROM top),
         |l2 AS (SELECT rank, term, n,
         |         CAST(CAST(ln(CAST(rank AS DOUBLE)) AS DECIMAL(27,6)) AS DOUBLE) AS ln_rank,
         |         CAST(CAST(ln(CAST(n AS DOUBLE)) AS DECIMAL(27,6)) AS DOUBLE) AS ln_n FROM l),
         |f AS (SELECT CAST(COUNT(*) AS DOUBLE) AS kk,
         |        ${S("ln_rank")} AS sx, ${S("ln_n")} AS sy,
         |        ${S("ln_rank * ln_n")} AS sxy, ${S("ln_rank * ln_rank")} AS sxx
         |      FROM l2)
         |SELECT rank, term, n, ln_rank, ln_n,
         |  CASE WHEN kk * sxx - sx * sx <> 0.0
         |       THEN (kk * sxy - sx * sy) / (kk * sxx - sx * sx) END AS slope,
         |  CASE WHEN kk * sxx - sx * sx <> 0.0
         |       THEN (sy - ((kk * sxy - sx * sy) / (kk * sxx - sx * sx)) * sx) / kk
         |       END AS intercept
         |FROM l2, f ORDER BY rank""".stripMargin,

    "q53_normalize" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_raw,
        |  CAST(len(list_distinct(list_filter(
        |    list_transform(string_split(lower(text), ' '), t -> regexp_replace(t, '[^a-z0-9]', '', 'g')),
        |    t -> t <> '' AND t NOT IN ('the','a','of','and','to','is')))) AS BIGINT) AS n_clean,
        |  array_to_string(list_sort(list_distinct(list_filter(
        |    list_transform(string_split(lower(text), ' '), t -> regexp_replace(t, '[^a-z0-9]', '', 'g')),
        |    t -> t <> '' AND t NOT IN ('the','a','of','and','to','is')))), ' ') AS clean_sorted
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q56_contamination" ->
      s"""WITH $SHINGLES,
         |posting AS (SELECT doc_id, unnest(hs) AS s FROM sh),
         |train AS (SELECT DISTINCT s FROM posting WHERE (doc_id * 2654435761) % 100 < 80),
         |hits AS (SELECT p.doc_id, COUNT(*) AS n_contaminated
         |         FROM posting p JOIN train t ON p.s = t.s
         |         WHERE (p.doc_id * 2654435761) % 100 >= 80
         |         GROUP BY p.doc_id)
         |SELECT c.doc_id AS doc_id, CAST(len(hs) AS BIGINT) AS n_shingles,
         |  COALESCE(h.n_contaminated, 0) AS n_contaminated,
         |  CAST(COALESCE(h.n_contaminated, 0) AS DOUBLE) / CAST(len(hs) AS DOUBLE) AS contamination
         |FROM sh c LEFT JOIN hits h ON c.doc_id = h.doc_id
         |WHERE (c.doc_id * 2654435761) % 100 >= 80
         |ORDER BY doc_id""".stripMargin,

    // train-side removal list: any 13-gram window shared with the heldout
    // split drops the train doc (same md5-60-bit window hash as q65)
    "q82_decontaminate" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts,
        |                  len(string_split(text, ' ')) AS n FROM documents),
        |r0 AS (SELECT doc_id, unnest(generate_series(1, n - 12)) AS i, ts
        |       FROM t WHERE n >= 13),
        |wins AS (SELECT doc_id, ('0x' || substr(md5(array_to_string(ts[i:i+12], ' ')), 1, 15))::BIGINT AS rh FROM r0),
        |heldout AS (SELECT DISTINCT rh FROM wins WHERE (doc_id * 2654435761) % 100 >= 80),
        |probe AS (SELECT w.doc_id, w.rh, h.rh IS NOT NULL AS hit
        |          FROM wins w LEFT JOIN heldout h ON w.rh = h.rh
        |          WHERE (w.doc_id * 2654435761) % 100 < 80)
        |SELECT doc_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_ngrams,
        |  CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
        |  SUM(CASE WHEN hit THEN 1 ELSE 0 END) > 0 AS drop
        |FROM probe GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // q82c: the Bloom-prefiltered plan computes the SAME answer as q82
    // (the sketch is exact-verified away) — the oracle is q82's verbatim
    "q82c_decon_bloom" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts,
        |                  len(string_split(text, ' ')) AS n FROM documents),
        |r0 AS (SELECT doc_id, unnest(generate_series(1, n - 12)) AS i, ts
        |       FROM t WHERE n >= 13),
        |wins AS (SELECT doc_id, ('0x' || substr(md5(array_to_string(ts[i:i+12], ' ')), 1, 15))::BIGINT AS rh FROM r0),
        |heldout AS (SELECT DISTINCT rh FROM wins WHERE (doc_id * 2654435761) % 100 >= 80),
        |probe AS (SELECT w.doc_id, w.rh, h.rh IS NOT NULL AS hit
        |          FROM wins w LEFT JOIN heldout h ON w.rh = h.rh
        |          WHERE (w.doc_id * 2654435761) % 100 < 80)
        |SELECT doc_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_ngrams,
        |  CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
        |  SUM(CASE WHEN hit THEN 1 ELSE 0 END) > 0 AS drop
        |FROM probe GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // q82d: token-coverage decon — q82's window probe carrying positions,
    // merged-interval coverage (q99's cov arithmetic), >= 0.5 cut
    "q82d_decon_fraction" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts,
        |                  len(string_split(text, ' ')) AS n FROM documents),
        |r AS (SELECT doc_id, CAST(unnest(generate_series(1, n - 12)) AS BIGINT) AS pos, ts
        |      FROM t WHERE n >= 13),
        |h AS (SELECT doc_id, pos, ('0x' || substr(md5(array_to_string(ts[pos:pos+12], ' ')), 1, 15))::BIGINT AS rh
        |      FROM r),
        |heldout AS (SELECT DISTINCT rh FROM h WHERE (doc_id * 2654435761) % 100 >= 80),
        |m AS (SELECT h.doc_id, list_sort(list(pos)) AS ps
        |      FROM h JOIN heldout USING (rh)
        |      WHERE (h.doc_id * 2654435761) % 100 < 80 GROUP BY h.doc_id),
        |mc AS (SELECT doc_id,
        |         CASE WHEN len(ps) = 0 THEN CAST(0 AS BIGINT) ELSE CAST(list_sum(
        |           list_transform(range(1, len(ps) + 1), i ->
        |             CASE WHEN i < len(ps) THEN least(13, ps[i + 1] - ps[i]) ELSE 13 END))
        |          AS BIGINT) END AS n_covered
        |       FROM m),
        |tot AS (SELECT doc_id, CAST(n AS BIGINT) AS n_tokens FROM t
        |        WHERE n >= 13 AND (doc_id * 2654435761) % 100 < 80)
        |SELECT tot.doc_id AS doc_id, n_tokens,
        |  COALESCE(n_covered, 0) AS n_covered,
        |  CAST(COALESCE(n_covered, 0) AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS contam_frac,
        |  CAST(COALESCE(n_covered, 0) AS DOUBLE) / CAST(n_tokens AS DOUBLE) >= 0.5 AS drop
        |FROM tot LEFT JOIN mc ON tot.doc_id = mc.doc_id
        |ORDER BY doc_id""".stripMargin,

    // q82b: fuzzy decon — q42's minhash/band construction, candidates
    // restricted to train x held-out across the same 80/20 hash split,
    // q42b's position-agreement estimate, integer-exact drop at
    // n_agree >= 8 (= ceil(0.5 * 16))
    "q82b_decon_fuzzy" ->
      s"""WITH $SHINGLES,
         |sigs AS (SELECT doc_id, i,
         |           list_min(list_transform(hs, v -> ((2*i+1)*v + 7919*i + 13) % 2147483647)) AS mh
         |         FROM sh, range(16) t(i)),
         |bands AS (SELECT doc_id, i // 4 AS band,
         |            string_agg(mh::VARCHAR, ',' ORDER BY i) AS sig
         |          FROM sigs GROUP BY doc_id, i // 4),
         |cand AS (SELECT DISTINCT tr.doc_id AS doc_id, h.doc_id AS h_id
         |         FROM bands tr JOIN bands h ON tr.band = h.band AND tr.sig = h.sig
         |         WHERE (tr.doc_id * 2654435761) % 100 < 80
         |           AND (h.doc_id * 2654435761) % 100 >= 80),
         |ag AS (SELECT c.doc_id, c.h_id,
         |         CAST(SUM(CASE WHEN sa.mh = sb.mh THEN 1 ELSE 0 END) AS BIGINT) AS n_agree
         |       FROM cand c JOIN sigs sa ON sa.doc_id = c.doc_id
         |            JOIN sigs sb ON sb.doc_id = c.h_id AND sb.i = sa.i
         |       GROUP BY c.doc_id, c.h_id)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_candidates,
         |  MAX(n_agree) AS n_agree_max,
         |  CAST(MAX(n_agree) AS DOUBLE) / 16.0 AS best_est,
         |  MAX(n_agree) >= 8 AS drop
         |FROM ag GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q57_dup_ngram_rate" ->
      s"""WITH $SHINGLES
         |SELECT s.doc_id AS doc_id,
         |  CAST(len(t.ws) - 2 AS BIGINT) AS n_ngrams,
         |  CAST(len(s.hs) AS BIGINT) AS n_distinct,
         |  CAST(len(t.ws) - 2 - len(s.hs) AS DOUBLE) / CAST(len(t.ws) - 2 AS DOUBLE) AS dup_rate
         |FROM sh s JOIN tok t ON s.doc_id = t.doc_id
         |ORDER BY doc_id""".stripMargin,

    "q58_stratified_sample" ->
      """WITH ranked AS (
        |  SELECT doc_id, lang, n_chars,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY lang
        |      ORDER BY (doc_id * 2654435761) % 1000000007, doc_id) AS BIGINT) AS sample_rank,
        |    COUNT(*) OVER (PARTITION BY lang) AS n_lang
        |  FROM documents)
        |SELECT doc_id, lang, n_chars, sample_rank
        |FROM ranked WHERE sample_rank <= (n_lang * 20 + 99) // 100
        |ORDER BY lang, sample_rank""".stripMargin,

    // mirrors plans.QuantKernels.q8Stats: scale = maxabs/127 (recomputed
    // inline — IEEE division is deterministic), q = floor(x/scale + 0.5),
    // err = x - q*scale, sse left-folded in index order
    "q59_quantize_int8" ->
      """WITH e AS (SELECT label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |m AS (SELECT label, v, list_max(list_transform(v, x -> abs(x))) AS maxabs FROM e),
        |p AS (SELECT label,
        |  CASE WHEN maxabs = 0 THEN 0.0 ELSE
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(v,
        |      x -> (x - floor(x / (maxabs/127) + 0.5) * (maxabs/127))
        |         * (x - floor(x / (maxabs/127) + 0.5) * (maxabs/127)))),
        |      (acc, z) -> acc + z) END AS sse,
        |  CASE WHEN maxabs = 0 THEN 0.0 ELSE
        |    list_max(list_transform(v,
        |      x -> abs(x - floor(x / (maxabs/127) + 0.5) * (maxabs/127)))) END AS mae,
        |  CAST(CASE WHEN maxabs = 0 THEN 0 ELSE
        |    list_sum(list_transform(v,
        |      x -> CASE WHEN abs(floor(x / (maxabs/127) + 0.5)) >= 127 THEN 1 ELSE 0 END))
        |    END AS BIGINT) AS nsat
        |  FROM m)
        |SELECT label, COUNT(*) AS n_vectors,
        |  CAST(SUM(CAST(sse AS DECIMAL(27,6))) AS DOUBLE)/COUNT(sse) AS avg_sse,
        |  MAX(mae) AS max_abs_err,
        |  CAST(SUM(nsat) AS BIGINT) AS n_saturated
        |FROM p GROUP BY label ORDER BY label""".stripMargin,

    // window=32, stride=24: starts at 1 + k*24 for k in [0, ceil(max(0,n-32)/24)]
    "q60_chunk_docs" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts,
        |                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n
        |           FROM documents),
        |k AS (SELECT doc_id, ts, n, unnest(range(0, (greatest(n - 32, 0) + 23) // 24 + 1)) AS k
        |      FROM t)
        |SELECT doc_id, CAST(k AS BIGINT) AS chunk_no,
        |  CAST(k * 24 + 1 AS BIGINT) AS start_token,
        |  array_to_string(list_slice(ts, k * 24 + 1, least(k * 24 + 32, n)), ' ') AS chunk_text,
        |  CAST(least(n - k * 24, 32) AS BIGINT) AS n_chunk_tokens
        |FROM k ORDER BY doc_id, chunk_no""".stripMargin,

    "q62_incremental_dedup" ->
      s"""WITH $SHINGLES,
         |h AS (SELECT doc_id, hs FROM sh),
         |sigs AS (SELECT doc_id, i,
         |           list_min(list_transform(hs, v -> ((2*i+1)*v + 7919*i + 13) % 2147483647)) AS mh
         |         FROM h, range(16) t(i)),
         |bands AS (SELECT doc_id, i // 4 AS band,
         |            string_agg(mh::VARCHAR, ',' ORDER BY i) AS sig
         |          FROM sigs GROUP BY doc_id, i // 4),
         |newdocs AS (SELECT doc_id, md5(text) AS text_hash FROM documents WHERE source = 'src0'),
         |exhash AS (SELECT DISTINCT md5(text) AS text_hash FROM documents WHERE source <> 'src0'),
         |exbuckets AS (SELECT DISTINCT band, sig FROM bands
         |              WHERE doc_id IN (SELECT doc_id FROM documents WHERE source <> 'src0')),
         |nearhit AS (SELECT DISTINCT b.doc_id FROM bands b
         |            JOIN exbuckets e ON b.band = e.band AND b.sig = e.sig
         |            WHERE b.doc_id IN (SELECT doc_id FROM newdocs))
         |SELECT n.doc_id,
         |  CASE WHEN x.text_hash IS NOT NULL THEN 'exact'
         |       WHEN nh.doc_id IS NOT NULL THEN 'neardup'
         |       ELSE 'unique' END AS verdict
         |FROM newdocs n
         |LEFT JOIN exhash x ON n.text_hash = x.text_hash
         |LEFT JOIN nearhit nh ON n.doc_id = nh.doc_id
         |ORDER BY n.doc_id""".stripMargin,

    // budget=512 tokens, shard = doc_id % 32; bin = prefix-sum-before // budget
    "q61_pack_sequences" ->
      """WITH t AS (SELECT doc_id, doc_id % 32 AS shard,
        |                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |           FROM documents),
        |c AS (SELECT doc_id, shard, n_tokens,
        |        SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |      FROM t)
        |SELECT shard, CAST((cum - n_tokens) // 512 AS BIGINT) AS bin,
        |  COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
        |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        |FROM c GROUP BY shard, (cum - n_tokens) // 512
        |ORDER BY shard, bin""".stripMargin,

    // per-doc packed coordinates: bin + token offset within the bin
    "q61b_pack_layout" ->
      """WITH t AS (SELECT doc_id, doc_id % 32 AS shard,
        |                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |           FROM documents),
        |c AS (SELECT doc_id, shard, n_tokens,
        |        SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |      FROM t)
        |SELECT doc_id, shard,
        |  CAST((cum - n_tokens) // 512 AS BIGINT) AS bin,
        |  CAST((cum - n_tokens) % 512 AS BIGINT) AS "offset",
        |  n_tokens
        |FROM c ORDER BY doc_id""".stripMargin,

    // word-level quality rules: TTR, top-word dominance, mean word length
    "q63_gopher_quality" ->
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        |c AS (SELECT doc_id, w, COUNT(*) AS c FROM w GROUP BY doc_id, w)
        |SELECT doc_id,
        |  CAST(SUM(c) AS BIGINT) AS n_words,
        |  CAST(COUNT(*) AS BIGINT) AS n_distinct,
        |  CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS top_word_frac,
        |  CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS ttr,
        |  CAST(SUM(len(w) * c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS mean_word_len
        |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // sqrt-temperature source-mixing weights; normalizer through the
    // exact-decimal carrier so the sum is order-insensitive
    "q64_source_mix" ->
      """WITH t AS (SELECT source, COUNT(*) AS n_docs,
        |             CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT) AS n_tokens
        |           FROM documents GROUP BY source),
        |s AS (SELECT source, n_docs, n_tokens, sqrt(CAST(n_tokens AS DOUBLE)) AS sw FROM t),
        |tot AS (SELECT CAST(SUM(CAST(sw AS DECIMAL(27,6))) AS DOUBLE) AS total_sw FROM s)
        |SELECT source, CAST(n_docs AS BIGINT) AS n_docs, n_tokens, sw / total_sw AS weight
        |FROM s, tot ORDER BY source""".stripMargin,

    // q64c: the temperature curve — exponents by sqrt composition only
    // (the one correctly-rounded power primitive; pow() never appears),
    // per-alpha normalizers through the DECIMAL carrier
    "q64c_temperature_mix" ->
      """WITH t AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |             CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT) AS n_tokens
        |           FROM documents GROUP BY source),
        |arms AS (SELECT CAST(a.alpha AS DOUBLE) AS alpha, source, n_docs, n_tokens,
        |           CASE CAST(a.alpha AS DOUBLE)
        |             WHEN 0.25 THEN sqrt(sqrt(CAST(n_tokens AS DOUBLE)))
        |             WHEN 0.5  THEN sqrt(CAST(n_tokens AS DOUBLE))
        |             WHEN 0.75 THEN sqrt(CAST(n_tokens AS DOUBLE)) * sqrt(sqrt(CAST(n_tokens AS DOUBLE)))
        |             ELSE CAST(n_tokens AS DOUBLE) END AS sw
        |         FROM t, (VALUES (0.25), (0.5), (0.75), (1.0)) a(alpha)),
        |tot AS (SELECT alpha, CAST(SUM(CAST(sw AS DECIMAL(27,6))) AS DOUBLE) AS tsw
        |        FROM arms GROUP BY alpha),
        |tt AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS n_total FROM t)
        |SELECT arms.alpha, source, n_docs, n_tokens, sw / tsw AS weight,
        |  (sw / tsw) / (CAST(n_tokens AS DOUBLE) / CAST(n_total AS DOUBLE)) AS boost
        |FROM arms JOIN tot ON arms.alpha = tot.alpha, tt
        |ORDER BY arms.alpha, source""".stripMargin,

    // the mix applied as an epoch repetition plan: q64's IEEE weight
    // shares fix the integer quotas, everything after is integer
    // arithmetic on the multiplicative-hash line
    "q64b_epoch_mix" ->
      """WITH d AS (SELECT doc_id, source,
        |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |             (doc_id * 2654435761) % 1000000007 AS h
        |           FROM documents),
        |t AS (SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS src_tokens FROM d GROUP BY source),
        |sq AS (SELECT source, src_tokens, sqrt(CAST(src_tokens AS DOUBLE)) AS sw FROM t),
        |tot AS (SELECT CAST(SUM(CAST(sw AS DECIMAL(27,6))) AS DOUBLE) AS total_sw,
        |               CAST(SUM(src_tokens) AS BIGINT) AS corpus_tokens FROM sq),
        |q AS (SELECT source, src_tokens,
        |        CAST(FLOOR(CAST(corpus_tokens AS DOUBLE) * (sw / total_sw)) AS BIGINT) AS quota
        |      FROM sq, tot),
        |c AS (SELECT doc_id, source, n_tokens,
        |        COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
        |      FROM d)
        |SELECT c.doc_id, c.source, c.n_tokens,
        |  CAST(q.quota // q.src_tokens
        |    + CASE WHEN c.cum_before < q.quota % q.src_tokens THEN 1 ELSE 0 END AS BIGINT) AS repeats
        |FROM c JOIN q USING (source) ORDER BY doc_id""".stripMargin,

    // signature-agreement Jaccard estimate over the q42 candidate pairs
    "q42b_minhash_est" ->
      s"""WITH $SHINGLES,
         |h AS (SELECT doc_id, hs FROM sh),
         |sigs AS (SELECT doc_id, i,
         |           list_min(list_transform(hs, v -> ((2*i+1)*v + 7919*i + 13) % 2147483647)) AS mh
         |         FROM h, range(16) t(i)),
         |sl AS (SELECT doc_id, list(mh ORDER BY i) AS ml FROM sigs GROUP BY doc_id),
         |bands AS (SELECT doc_id, i // 4 AS band,
         |            string_agg(mh::VARCHAR, ',' ORDER BY i) AS sig
         |          FROM sigs GROUP BY doc_id, i // 4),
         |p AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |      FROM bands a JOIN bands b
         |        ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id)
         |SELECT p.doc_a, p.doc_b,
         |  CAST(len(list_filter(range(1, 17), i -> sa.ml[i] = sb.ml[i])) AS BIGINT) AS n_agree,
         |  CAST(len(list_filter(range(1, 17), i -> sa.ml[i] = sb.ml[i])) AS DOUBLE) / 16.0 AS est_jaccard
         |FROM p JOIN sl sa ON p.doc_a = sa.doc_id JOIN sl sb ON p.doc_b = sb.doc_id
         |ORDER BY doc_a, doc_b""".stripMargin,

    // per-label mean embedding (long format), exact-decimal per-dim average
    "q66_label_centroids" ->
      s"""WITH e AS (SELECT label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |           FROM embeddings),
         |u AS (SELECT label, i AS dim_idx, v[i] AS x FROM e, range(1, 65) t(i))
         |SELECT label, CAST(dim_idx AS BIGINT) AS dim_idx,
         |  CAST(COUNT(*) AS BIGINT) AS n_vectors,
         |  ${A("x")} AS mean_x
         |FROM u GROUP BY label, dim_idx ORDER BY label, dim_idx""".stripMargin,

    // q66b: vectors anti-aligned (cosine < 0) with their own label
    // centroid — exact-decimal means, the DOT64 fold chain, one divide
    "q66b_label_outliers" ->
      s"""WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |           FROM embeddings),
         |u AS (SELECT label, i AS p, v[i] AS x FROM e, range(1, 65) t(i)),
         |cm AS (SELECT label, p, ${A("x")} AS m FROM u GROUP BY label, p),
         |ca AS (SELECT label, list(m ORDER BY p) AS cv FROM cm GROUP BY label),
         |nl AS (SELECT label, COUNT(*) AS n_label FROM e GROUP BY label),
         |sc AS (SELECT e.vec_id, e.label,
         |  list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |    list_transform(range(1, 65), i -> e.v[i]*cv[i])), (a2, b2) -> a2 + b2) /
         |  (sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |    list_transform(range(1, 65), i -> e.v[i]*e.v[i])), (a2, b2) -> a2 + b2)) *
         |   sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |    list_transform(range(1, 65), i -> cv[i]*cv[i])), (a2, b2) -> a2 + b2))) AS csim
         |  FROM e JOIN ca USING (label))
         |SELECT sc.label AS label, vec_id, csim, n_label
         |FROM sc JOIN nl ON sc.label = nl.label
         |WHERE csim < 0.0
         |ORDER BY label, vec_id""".stripMargin,

    // q66c: Fisher-style class separation — q66b's centroid/cosine
    // chains aggregated per label + the bounded centroid×centroid
    // nearest-confusable pass (ties -> smaller label, both engines)
    "q66c_class_separation" ->
      s"""WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |           FROM embeddings),
         |u AS (SELECT label, i AS p, v[i] AS x FROM e, range(1, 65) t(i)),
         |cm AS (SELECT label, p, ${A("x")} AS m FROM u GROUP BY label, p),
         |ca AS (SELECT label, list(m ORDER BY p) AS cv FROM cm GROUP BY label),
         |sc AS (SELECT e.vec_id, e.label,
         |  list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |    list_transform(range(1, 65), i -> e.v[i]*cv[i])), (a2, b2) -> a2 + b2) /
         |  (sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |    list_transform(range(1, 65), i -> e.v[i]*e.v[i])), (a2, b2) -> a2 + b2)) *
         |   sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |    list_transform(range(1, 65), i -> cv[i]*cv[i])), (a2, b2) -> a2 + b2))) AS csim
         |  FROM e JOIN ca USING (label)),
         |self AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vectors,
         |           ${A("csim")} AS mean_self_cos, MIN(csim) AS min_self_cos
         |         FROM sc GROUP BY label),
         |cc AS (SELECT a.label, b.label AS nearest_label,
         |  list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |    list_transform(range(1, 65), i -> a.cv[i]*b.cv[i])), (a2, b2) -> a2 + b2) /
         |  (sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |    list_transform(range(1, 65), i -> a.cv[i]*a.cv[i])), (a2, b2) -> a2 + b2)) *
         |   sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |    list_transform(range(1, 65), i -> b.cv[i]*b.cv[i])), (a2, b2) -> a2 + b2))) AS nearest_cos
         |  FROM ca a JOIN ca b ON a.label <> b.label),
         |nr AS (SELECT label, nearest_label, nearest_cos,
         |         ROW_NUMBER() OVER (PARTITION BY label
         |           ORDER BY nearest_cos DESC, nearest_label) AS rk FROM cc)
         |SELECT self.label AS label, n_vectors, mean_self_cos, min_self_cos,
         |  nr.nearest_label, nr.nearest_cos, mean_self_cos - nr.nearest_cos AS margin
         |FROM self JOIN nr ON self.label = nr.label AND nr.rk = 1
         |ORDER BY label""".stripMargin,

    // BPE merge-candidate statistics: adjacent char-pair counts within
    // whitespace tokens, deterministic (count DESC, pair ASC) top-50
    "q87_bpe_pairs" ->
      """WITH words AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
        |pairs AS (SELECT unnest(list_transform(range(1, length(w)), i -> substr(w, CAST(i AS INT), 2))) AS pair
        |          FROM words WHERE length(w) >= 2)
        |SELECT pair, CAST(COUNT(*) AS BIGINT) AS n
        |FROM pairs GROUP BY pair
        |ORDER BY n DESC, pair LIMIT 50""".stripMargin,

    // q88: the frozen trained merge table (BpeMerges — jobs.BpeTrain over
    // the correctness-gate lake) as a VALUES oracle, the PqCodebooks
    // pattern: the Spark side re-runs the whole distributed k-round
    // trainer, so parity pins its counts, tie-breaks and merge
    // application engine-exactly against the committed artifact
    "q88_bpe_train" ->
      graft.operators.BpeMerges.values.map { case (rank, l, r, n) =>
        s"(CAST($rank AS BIGINT), '${l.replace("'", "''")}', '${r.replace("'", "''")}', CAST($n AS BIGINT))"
      }.mkString(
        "SELECT * FROM (VALUES ",
        ", ",
        ") t(rank, \"left\", \"right\", n) ORDER BY rank"),

    // q89: encode the corpus with the frozen merges and histogram the
    // resulting symbols. The oracle re-implements the replace-chain
    // encoder verbatim: each symbol travels chr(1)+sym+chr(2), and each
    // merge is ONE literal replace — left-to-right non-overlapping in
    // both engines, which on the bracket form IS the trainer's greedy
    // fold (the brackets make partial-symbol matches impossible and no
    // match shares characters with its neighbor)
    "q89_bpe_encode" -> {
      val encChain = BPE_ENC
      s"""WITH words AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
         |wr AS (SELECT chr(1) || array_to_string(
         |         list_transform(range(1, length(w) + 1), i -> substr(w, CAST(i AS INT), 1)),
         |         chr(2)||chr(1)) || chr(2) AS s
         |       FROM words WHERE length(w) >= 1),
         |enc AS (SELECT $encChain AS s FROM wr),
         |syms AS (SELECT unnest(string_split(substr(s, 2, length(s) - 2), chr(2)||chr(1))) AS sym FROM enc)
         |SELECT sym, CAST(COUNT(*) AS BIGINT) AS n
         |FROM syms GROUP BY sym ORDER BY n DESC, sym LIMIT 50""".stripMargin
    },

    // q93: tokenizer fertility (symbols per token under the frozen
    // merges) by q47's language verdict — the q47 CASE and the q89
    // encode chain composed verbatim, integer sums + one division
    "q93_fertility" -> {
      val encChain = BPE_ENC
      val counts = langCountSqls.map { case (l, e) => s"    $e AS n_$l" }.mkString(",\n")
      s"""WITH lang AS (
         |  SELECT doc_id, text,
         |    $langCaseSql AS lang_pred
         |  FROM (SELECT doc_id, text,
         |$counts
         |   FROM documents)),
         |words AS (SELECT lang_pred, unnest(string_split(text, ' ')) AS w FROM lang),
         |wr AS (SELECT lang_pred, chr(1) || array_to_string(
         |         list_transform(range(1, length(w) + 1), i -> substr(w, CAST(i AS INT), 1)),
         |         chr(2)||chr(1)) || chr(2) AS s
         |       FROM words WHERE length(w) >= 1),
         |enc AS (SELECT lang_pred, $encChain AS s FROM wr),
         |tok AS (SELECT lang_pred,
         |          len(string_split(substr(s, 2, length(s) - 2), chr(2)||chr(1))) AS ns
         |        FROM enc)
         |SELECT lang_pred, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         |  CAST(SUM(ns) AS BIGINT) AS n_syms,
         |  CAST(SUM(ns) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS fertility
         |FROM tok GROUP BY lang_pred ORDER BY lang_pred""".stripMargin
    },

    // q92: the frozen trained top principal component (PcaComponents —
    // jobs.PcaTrain over the correctness-gate lake) as a VALUES oracle,
    // the q88/PqCodebooks pattern: the Spark side re-runs the whole
    // distributed power iteration, so parity pins its carrier sums, dot
    // order, normalize and sign rule bit-exactly (Double.toString
    // round-trips; DuckDB's literal parser returns identical bits)
    // NOTE the string-cast literals: a bare decimal literal materializes
    // as DECIMAL first and the DECIMAL->DOUBLE conversion can lose the
    // last ulp; CAST('..' AS DOUBLE) takes the correctly-rounded
    // string->double path and returns the exact committed bits.
    // q94/q95: the frozen trained classifier (trainer parity + the
    // scoring stage); q96: the LSH banding operating curve vs q41 truth
    "q94_clf_train" -> clfTrainOracleSql,
    "q94b_clf_train_sampled" -> clfTrainSampledOracleSql,
    "q95_quality_clf" -> qualityClfOracleSql,
    "q95b_clf_curve" -> clfCurveOracleSql,
    "q95c_clf_eval" -> clfEvalOracleSql,
    "q95d_clf_calibration" -> clfCalibrationOracleSql,
    "q96_band_curve" -> bandCurveOracleSql,
    "q97_decon_curve" -> deconCurveOracleSql,
    "q98_quality_agreement" -> qualityAgreementOracleSql,
    "q99_repetition_profile" -> repetitionProfileOracleSql(Seq(2, 3, 4, 5, 10)),

    "q92_pca_top" ->
      graft.operators.PcaComponents.values.zipWithIndex.map { case (x, i) =>
        s"(CAST(${i + 1} AS BIGINT), CAST('$x' AS DOUBLE), " +
          s"CAST('${graft.operators.PcaComponents.Eigenvalue}' AS DOUBLE))"
      }.mkString(
        "SELECT * FROM (VALUES ",
        ", ",
        ") t(dim_idx, component, eigenvalue) ORDER BY dim_idx"),

    // q92b: the frozen K-component spectrum (same provenance/parity
    // pattern as q92 — string-cast literals return the exact bits)
    "q92b_pca_spectrum" -> {
      val ks = graft.operators.PcaComponents.componentsK
      // a placeholder row keeps the SQL valid pre-freeze
      val rows = if (ks.isEmpty)
        Seq("(CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE))")
      else ks.zipWithIndex.flatMap { case ((lam, u), ci) =>
        u.zipWithIndex.map { case (x, i) =>
          s"(CAST(${ci + 1} AS BIGINT), CAST(${i + 1} AS BIGINT), " +
            s"CAST('$x' AS DOUBLE), CAST('$lam' AS DOUBLE))"
        }
      }
      rows.mkString(
        "SELECT * FROM (VALUES ",
        ", ",
        ") t(comp_idx, dim_idx, component, eigenvalue) ORDER BY comp_idx, dim_idx")
    },

    // q91: DSIR hashed-n-gram importance weights. Target = src0, raw =
    // everything else; features are unigram+bigram charHash % 1024, so
    // both distribution tables are <= 1024 rows by construction. Raw
    // docs only; log-ratio per bucket is the fixed IEEE ln chain, the
    // per-doc sum rides the exact-decimal carrier.
    "q91_dsir" -> {
      val B = 1024
      s"""WITH d AS (SELECT doc_id, source,
         |            list_filter(string_split(text, ' '), x -> x <> '') AS t
         |          FROM documents),
         |unig AS (SELECT doc_id, source, unnest(t) AS g FROM d),
         |bigr AS (SELECT doc_id, source, t[i] || ' ' || t[i+1] AS g
         |         FROM (SELECT doc_id, source, t,
         |                 unnest(generate_series(1, len(t) - 1)) AS i
         |               FROM d WHERE len(t) >= 2)),
         |feats AS (SELECT doc_id, source, ${PH("g")} % $B AS b, COUNT(*) AS k
         |          FROM (SELECT * FROM unig UNION ALL SELECT * FROM bigr)
         |          GROUP BY doc_id, source, b),
         |ratio AS (SELECT b,
         |            SUM(CASE WHEN source = 'src0' THEN k ELSE 0 END) AS ct,
         |            SUM(CASE WHEN source <> 'src0' THEN k ELSE 0 END) AS cr
         |          FROM feats GROUP BY b),
         |tot AS (SELECT SUM(ct) AS tt, SUM(cr) AS tr FROM ratio),
         |lrt AS (SELECT b,
         |          ln(CAST(ct + 1 AS DOUBLE) / CAST(tt + $B AS DOUBLE)) -
         |          ln(CAST(cr + 1 AS DOUBLE) / CAST(tr + $B AS DOUBLE)) AS lr
         |        FROM ratio CROSS JOIN tot)
         |SELECT f.doc_id, f.source, CAST(SUM(f.k) AS BIGINT) AS n_feats,
         |  ${S("CAST(f.k AS DOUBLE) * lrt.lr")} AS logweight
         |FROM feats f JOIN lrt ON f.b = lrt.b WHERE f.source <> 'src0'
         |GROUP BY f.doc_id, f.source ORDER BY f.doc_id""".stripMargin
    },

    // q90: CCNet-style bigram-LM perplexity scoring. LM trained on the
    // src0 reference source with add-one smoothing; each doc's score is
    // the exact-decimal sum of per-bigram -ln((c12+1)/(c1+V)) over its
    // bigram multiset, divided once. Docs with < 2 tokens have no bigram
    // and are absent in both engines.
    "q90_lm_perplexity" ->
      s"""WITH $lmScoreCtes
         |SELECT * FROM lmsc ORDER BY doc_id""".stripMargin,

    // q90b: CCNet's head/middle/tail buckets over the q90 score — the
    // shared scoring chain + quantile_cont terciles (the q14 percentile
    // convention), ties at a cut landing LOW in both engines
    "q90b_ccnet_buckets" ->
      s"""WITH $lmScoreCtes,
         |cuts AS (SELECT quantile_cont(avg_nll, 0.3333333333333333) AS cut1,
         |                quantile_cont(avg_nll, 0.6666666666666666) AS cut2 FROM lmsc),
         |b AS (SELECT lmsc.source, cuts.cut1, cuts.cut2,
         |        CASE WHEN avg_nll <= cut1 THEN 'head'
         |             WHEN avg_nll <= cut2 THEN 'middle'
         |             ELSE 'tail' END AS bucket
         |      FROM lmsc CROSS JOIN cuts)
         |SELECT source, bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  MIN(cut1) AS cut1, MIN(cut2) AS cut2
         |FROM b GROUP BY source, bucket ORDER BY source, bucket""".stripMargin,

    // duplicated 8-token-run coverage per doc (exact-substring dedup signal)
    "q65_dup_runs" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts,
        |                  len(string_split(text, ' ')) AS n FROM documents),
        |r0 AS (SELECT doc_id, unnest(generate_series(1, n - 7)) AS i, ts
        |       FROM t WHERE n >= 8),
        |r AS (SELECT doc_id, ('0x' || substr(md5(array_to_string(ts[i:i+7], ' ')), 1, 15))::BIGINT AS rh FROM r0),
        |g AS (SELECT rh, MIN(doc_id) AS mn, MAX(doc_id) AS mx FROM r GROUP BY rh)
        |SELECT r.doc_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_runs,
        |  CAST(SUM(CASE WHEN g.mn <> r.doc_id OR g.mx <> r.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
        |  CAST(SUM(CASE WHEN g.mn <> r.doc_id OR g.mx <> r.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) AS shared_frac
        |FROM r JOIN g USING (rh) GROUP BY r.doc_id ORDER BY r.doc_id""".stripMargin,

    // ExactSubstr spans: same 60-bit window construction as q65/q82;
    // canonical first occurrence = ROW_NUMBER 1 over (doc_id, pos) per
    // hash (Spark's struct-min), runs merged by gaps-and-islands
    "q83_dup_spans" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts,
        |                  len(string_split(text, ' ')) AS n FROM documents),
        |r0 AS (SELECT doc_id, unnest(generate_series(1, n - 7)) AS i, ts
        |       FROM t WHERE n >= 8),
        |r AS (SELECT doc_id, CAST(i AS BIGINT) AS pos,
        |        ('0x' || substr(md5(array_to_string(ts[i:i+7], ' ')), 1, 15))::BIGINT AS rh FROM r0),
        |m AS (SELECT doc_id, pos,
        |        COUNT(*) OVER (PARTITION BY rh) AS cnt,
        |        ROW_NUMBER() OVER (PARTITION BY rh ORDER BY doc_id, pos) AS rn
        |      FROM r),
        |x AS (SELECT doc_id, pos,
        |        pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        |      FROM m WHERE cnt > 1 AND rn > 1)
        |SELECT doc_id,
        |  CAST(MIN(pos) AS BIGINT) AS start_token,
        |  CAST(MAX(pos) + 7 AS BIGINT) AS end_token,
        |  CAST(MAX(pos) + 7 - MIN(pos) + 1 AS BIGINT) AS n_tokens
        |FROM x GROUP BY doc_id, grp ORDER BY doc_id, start_token""".stripMargin,

    "q83b_cut_dup_spans" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts,
        |                  len(string_split(text, ' ')) AS n FROM documents),
        |r0 AS (SELECT doc_id, unnest(generate_series(1, n - 7)) AS i, ts
        |       FROM t WHERE n >= 8),
        |r AS (SELECT doc_id, CAST(i AS BIGINT) AS pos,
        |        ('0x' || substr(md5(array_to_string(ts[i:i+7], ' ')), 1, 15))::BIGINT AS rh FROM r0),
        |m AS (SELECT doc_id, pos,
        |        COUNT(*) OVER (PARTITION BY rh) AS cnt,
        |        ROW_NUMBER() OVER (PARTITION BY rh ORDER BY doc_id, pos) AS rn
        |      FROM r),
        |x AS (SELECT doc_id, pos,
        |        pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        |      FROM m WHERE cnt > 1 AND rn > 1),
        |spans AS (SELECT doc_id, MIN(pos) AS s, MAX(pos) + 7 AS e
        |          FROM x GROUP BY doc_id, grp),
        |tok AS (SELECT doc_id, unnest(generate_series(1, n)) AS i, ts FROM t),
        |keep AS (SELECT tk.doc_id, tk.i, tk.ts[tk.i] AS w FROM tok tk
        |         WHERE NOT EXISTS (SELECT 1 FROM spans sp
        |                           WHERE sp.doc_id = tk.doc_id AND tk.i BETWEEN sp.s AND sp.e))
        |SELECT doc_id, string_agg(w, ' ' ORDER BY i) AS text
        |FROM keep GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // the loss-masking policy: q83b's span chain, but covered tokens are
    // SUBSTITUTED with the shared sentinel instead of filtered — token
    // counts are length-stable by construction
    "q109_mask_dup_spans" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts,
        |                  len(string_split(text, ' ')) AS n FROM documents),
        |r0 AS (SELECT doc_id, unnest(generate_series(1, n - 7)) AS i, ts
        |       FROM t WHERE n >= 8),
        |r AS (SELECT doc_id, CAST(i AS BIGINT) AS pos,
        |        ('0x' || substr(md5(array_to_string(ts[i:i+7], ' ')), 1, 15))::BIGINT AS rh FROM r0),
        |m AS (SELECT doc_id, pos,
        |        COUNT(*) OVER (PARTITION BY rh) AS cnt,
        |        ROW_NUMBER() OVER (PARTITION BY rh ORDER BY doc_id, pos) AS rn
        |      FROM r),
        |x AS (SELECT doc_id, pos,
        |        pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        |      FROM m WHERE cnt > 1 AND rn > 1),
        |spans AS (SELECT doc_id, MIN(pos) AS s, MAX(pos) + 7 AS e
        |          FROM x GROUP BY doc_id, grp),
        |tok AS (SELECT doc_id, unnest(generate_series(1, n)) AS i, ts FROM t),
        |lab AS (SELECT tk.doc_id, tk.i, tk.ts[tk.i] AS tok0,
        |          CASE WHEN EXISTS (SELECT 1 FROM spans sp
        |               WHERE sp.doc_id = tk.doc_id AND tk.i BETWEEN sp.s AND sp.e)
        |          THEN 1 ELSE 0 END AS msk
        |        FROM tok tk)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |  CAST(SUM(msk) AS BIGINT) AS n_masked,
        |  CAST(SUM(msk) AS DOUBLE) / COUNT(*) AS mask_frac,
        |  string_agg(CASE WHEN msk = 1 THEN '${operators.CurationOps.MaskToken}' ELSE tok0 END,
        |    ' ' ORDER BY i) AS text
        |FROM lab GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // cross-source duplication matrix: distinct (window hash, source),
    // unordered source pairs per hash counted once
    "q84_source_overlap" ->
      """WITH t AS (SELECT source, string_split(text, ' ') AS ts,
        |                  len(string_split(text, ' ')) AS n FROM documents),
        |r0 AS (SELECT source, unnest(generate_series(1, n - 7)) AS i, ts
        |       FROM t WHERE n >= 8),
        |rs AS (SELECT DISTINCT source,
        |         ('0x' || substr(md5(array_to_string(ts[i:i+7], ' ')), 1, 15))::BIGINT AS rh FROM r0)
        |SELECT a.source AS source_a, b.source AS source_b,
        |  CAST(COUNT(*) AS BIGINT) AS n_shared_windows
        |FROM rs a JOIN rs b ON a.rh = b.rh AND a.source < b.source
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // per-source unigram KL vs the corpus: same fixed IEEE ratio chain,
    // count-scaled terms through the shared DECIMAL(27,6) carrier
    "q85_source_divergence" ->
      """WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents),
        |st AS (SELECT source, tok, COUNT(*) AS n FROM tok GROUP BY 1, 2),
        |bysrc AS (SELECT source, CAST(SUM(n) AS BIGINT) AS n_src,
        |            CAST(COUNT(*) AS BIGINT) AS n_distinct FROM st GROUP BY 1),
        |bytok AS (SELECT tok, CAST(SUM(n) AS BIGINT) AS n_tok FROM st GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total FROM st),
        |terms AS (SELECT st.source, bysrc.n_src, bysrc.n_distinct,
        |            CAST(st.n AS DOUBLE) * ln(
        |              (CAST(st.n AS DOUBLE) / CAST(bysrc.n_src AS DOUBLE))
        |                / (CAST(bytok.n_tok AS DOUBLE) / CAST(tot.n_total AS DOUBLE))) AS term
        |          FROM st JOIN bytok USING (tok) JOIN bysrc USING (source), tot)
        |SELECT source, n_src AS n_tokens, n_distinct,
        |  CAST(SUM(CAST(term AS DECIMAL(27,6))) AS DOUBLE) / CAST(n_src AS DOUBLE) AS kl
        |FROM terms GROUP BY source, n_src, n_distinct ORDER BY source""".stripMargin,

    // q85b: DoReMi reweighting over the shared q90 LM chain — per-source
    // token-weighted mean NLL, excess over the corpus mean, linear
    // surrogate update (exp avoided: libm last-ulp is not portable);
    // every cross-row double reduce rides the DECIMAL(27,6) carrier
    "q85b_doremi_weights" ->
      s"""WITH $lmScoreCtes,
         |bys AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |          CAST(SUM(n_bigrams) AS BIGINT) AS n_bigrams,
         |          ${S("avg_nll * CAST(n_bigrams AS DOUBLE)")} AS sum_nll
         |        FROM lmsc GROUP BY source),
         |bys2 AS (SELECT *, sum_nll / CAST(n_bigrams AS DOUBLE) AS mean_nll FROM bys),
         |tot AS (SELECT ${S("sum_nll")} AS tot_nll,
         |          CAST(SUM(n_bigrams) AS BIGINT) AS tot_bigrams FROM bys2),
         |w AS (SELECT source, n_docs, n_bigrams,
         |        CAST(n_bigrams AS DOUBLE) / CAST(tot_bigrams AS DOUBLE) AS token_share,
         |        mean_nll,
         |        GREATEST(0.0, mean_nll - tot_nll / CAST(tot_bigrams AS DOUBLE)) AS excess
         |      FROM bys2, tot),
         |w2 AS (SELECT *, token_share * (1.0 + 1.0 * excess) AS w_raw FROM w),
         |norm AS (SELECT ${S("w_raw")} AS z FROM w2)
         |SELECT source, n_docs, n_bigrams, token_share, mean_nll, excess,
         |  w_raw / z AS weight
         |FROM w2, norm ORDER BY source""".stripMargin,

    // SemDeDup: within-IVF-cluster cosine prune, min-id keeps the
    // representative (same frozen quantizer + fold order as q46b/q54)
    "q67_semantic_dedup" ->
      s"""WITH $EMB_NORM,
         |cents AS (SELECT list_id, cv,
         |            sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65),
         |              i -> cv[i] * cv[i])), (x2, y2) -> x2 + y2)) AS cnrm
         |          FROM ($ivfCentsValues) t(list_id, cv)),
         |asg AS (SELECT vec_id, list_id,
         |          ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, list_id) AS crank
         |        FROM (SELECT n.vec_id, c.list_id,
         |                list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65),
         |                  i -> n.v[i] * c.cv[i])), (x2, y2) -> x2 + y2) / (n.nrm * c.cnrm) AS csim
         |              FROM n, cents c) t),
         |a1 AS (SELECT vec_id, list_id FROM asg WHERE crank = 1),
         |sc AS (SELECT p.vec_a, p.vec_b, $DOT64 / (a.nrm * b.nrm) AS cos
         |       FROM (SELECT x.vec_id AS vec_a, y.vec_id AS vec_b
         |             FROM a1 x JOIN a1 y ON x.list_id = y.list_id AND x.vec_id < y.vec_id) p
         |       JOIN n a ON a.vec_id = p.vec_a JOIN n b ON b.vec_id = p.vec_b
         |       WHERE $DOT64 / (a.nrm * b.nrm) >= 0.3)
         |SELECT vec_b AS vec_id, CAST(COUNT(*) AS BIGINT) AS n_dups,
         |  MIN(vec_a) AS rep_id, MAX(cos) AS max_cos
         |FROM sc GROUP BY vec_b ORDER BY vec_id""".stripMargin,

    // blocked SemDeDup: q67's construction with the q44b/q44c hyperplane
    // sign-blocks (6 planes = 64 sub-blocks) added to the pair bucket —
    // the density dial for a frozen cluster count
    "q67b_semantic_dedup_blocked" ->
      s"""WITH $EMB_NORM,
         |cents AS (SELECT list_id, cv,
         |            sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65),
         |              i -> cv[i] * cv[i])), (x2, y2) -> x2 + y2)) AS cnrm
         |          FROM ($ivfCentsValues) t(list_id, cv)),
         |asg AS (SELECT vec_id, list_id,
         |          ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, list_id) AS crank
         |        FROM (SELECT n.vec_id, c.list_id,
         |                list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65),
         |                  i -> n.v[i] * c.cv[i])), (x2, y2) -> x2 + y2) / (n.nrm * c.cnrm) AS csim
         |              FROM n, cents c) t),
         |bk AS (SELECT vec_id,
         |  ${signBlocksSql(6)} AS blk
         |  FROM n),
         |a1 AS (SELECT asg.vec_id, asg.list_id, bk.blk
         |       FROM asg JOIN bk ON asg.vec_id = bk.vec_id WHERE asg.crank = 1),
         |sc AS (SELECT p.vec_a, p.vec_b, $DOT64 / (a.nrm * b.nrm) AS cos
         |       FROM (SELECT x.vec_id AS vec_a, y.vec_id AS vec_b
         |             FROM a1 x JOIN a1 y ON x.list_id = y.list_id AND x.blk = y.blk
         |                                AND x.vec_id < y.vec_id) p
         |       JOIN n a ON a.vec_id = p.vec_a JOIN n b ON b.vec_id = p.vec_b
         |       WHERE $DOT64 / (a.nrm * b.nrm) >= 0.3)
         |SELECT vec_b AS vec_id, CAST(COUNT(*) AS BIGINT) AS n_dups,
         |  MIN(vec_a) AS rep_id, MAX(cos) AS max_cos
         |FROM sc GROUP BY vec_b ORDER BY vec_id""".stripMargin,

    // AUTO-dial SemDeDup: bits = min b in [0,16] with maxClusterPop <=
    // 32·2^b (the q54 histogram's max, same exact-integer predicate as
    // DedupOps.autoBits), block key = 16-plane key masked to `bits`
    "q67c_semantic_dedup_auto" ->
      s"""WITH $EMB_NORM,
         |cents AS (SELECT list_id, cv,
         |            sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65),
         |              i -> cv[i] * cv[i])), (x2, y2) -> x2 + y2)) AS cnrm
         |          FROM ($ivfCentsValues) t(list_id, cv)),
         |asg AS (SELECT vec_id, list_id,
         |          ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, list_id) AS crank
         |        FROM (SELECT n.vec_id, c.list_id,
         |                list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65),
         |                  i -> n.v[i] * c.cv[i])), (x2, y2) -> x2 + y2) / (n.nrm * c.cnrm) AS csim
         |              FROM n, cents c) t),
         |a0 AS (SELECT vec_id, list_id FROM asg WHERE crank = 1),
         |mp AS (SELECT MAX(cnt) AS maxpop
         |       FROM (SELECT COUNT(*) AS cnt FROM a0 GROUP BY list_id)),
         |prm AS (SELECT COALESCE(MIN(b), 16) AS bits
         |        FROM range(0, 17) r(b), mp WHERE mp.maxpop <= 32 * (1 << b)),
         |bk AS (SELECT vec_id,
         |  ${signBlocksSql(16)} AS blk16
         |  FROM n),
         |a1 AS (SELECT a0.vec_id, a0.list_id,
         |         bk.blk16 & ((1 << (SELECT bits FROM prm)) - 1) AS blk
         |       FROM a0 JOIN bk ON a0.vec_id = bk.vec_id),
         |sc AS (SELECT p.vec_a, p.vec_b, $DOT64 / (a.nrm * b.nrm) AS cos
         |       FROM (SELECT x.vec_id AS vec_a, y.vec_id AS vec_b
         |             FROM a1 x JOIN a1 y ON x.list_id = y.list_id AND x.blk = y.blk
         |                                AND x.vec_id < y.vec_id) p
         |       JOIN n a ON a.vec_id = p.vec_a JOIN n b ON b.vec_id = p.vec_b
         |       WHERE $DOT64 / (a.nrm * b.nrm) >= 0.3)
         |SELECT vec_b AS vec_id, CAST(COUNT(*) AS BIGINT) AS n_dups,
         |  MIN(vec_a) AS rep_id, MAX(cos) AS max_cos
         |FROM sc GROUP BY vec_b ORDER BY vec_id""".stripMargin,

    // per-query recall@3 of the LSH and IVF indexes vs exact brute force
    // (each arm is its own oracle's formulation, k=3 throughout)
    "q68_ann_recall" -> annRecallOracleSql(10),

    // graded retrieval quality: exact + IVF arm chains at k=10, shared
    // StrictMath discount/IDCG literals, carrier-exact DCG
    "q107_retrieval_quality" -> retrievalQualityOracleSql(10, 10),
    // multi-arm graded retrieval: every q68b arm re-ranked to k=10 and
    // scored with q107's metric tail, one carrier-mean row per arm
    "q107b_retrieval_quality_multi" -> retrievalQualityMultiOracleSql(10, 10),

    // index staleness: frozen-quantizer assignment (the q54/q68 asg
    // chain), id-watermark era split, carrier-exact era means, one
    // division per mean + one for the drift ratio
    "q108_index_drift" ->
      s"""WITH $EMB_NORM,
         |cents AS (SELECT list_id, cv,
         |            sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65),
         |              i -> cv[i] * cv[i])), (x2, y2) -> x2 + y2)) AS cnrm
         |          FROM ($ivfCentsValues) t(list_id, cv)),
         |asg AS (SELECT vec_id, list_id, csim,
         |          ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, list_id) AS crank
         |        FROM (SELECT n.vec_id, c.list_id,
         |                list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65),
         |                  i -> n.v[i] * c.cv[i])), (x2, y2) -> x2 + y2) / (n.nrm * c.cnrm) AS csim
         |              FROM n, cents c WHERE n.vec_id >= 10) t),
         |wm AS (SELECT (10 + MAX(vec_id)) // 2 AS wm FROM e WHERE vec_id >= 10),
         |pv AS (SELECT a.vec_id, a.list_id, 1.0 - a.csim AS dist, a.vec_id >= w.wm AS is_new
         |       FROM asg a CROSS JOIN wm w WHERE a.crank = 1),
         |per AS (SELECT list_id,
         |          CAST(COUNT(CASE WHEN NOT is_new THEN 1 END) AS BIGINT) AS n_old,
         |          CAST(COUNT(CASE WHEN is_new THEN 1 END) AS BIGINT) AS n_new,
         |          CAST(SUM(CASE WHEN NOT is_new THEN CAST(dist AS DECIMAL(27,6)) END) AS DOUBLE)
         |            / CAST(COUNT(CASE WHEN NOT is_new THEN 1 END) AS DOUBLE) AS old_dist,
         |          CAST(SUM(CASE WHEN is_new THEN CAST(dist AS DECIMAL(27,6)) END) AS DOUBLE)
         |            / CAST(COUNT(CASE WHEN is_new THEN 1 END) AS DOUBLE) AS new_dist
         |        FROM pv GROUP BY list_id),
         |roll AS (SELECT CAST(-1 AS BIGINT) AS list_id,
         |          CAST(COUNT(CASE WHEN NOT is_new THEN 1 END) AS BIGINT) AS n_old,
         |          CAST(COUNT(CASE WHEN is_new THEN 1 END) AS BIGINT) AS n_new,
         |          CAST(SUM(CASE WHEN NOT is_new THEN CAST(dist AS DECIMAL(27,6)) END) AS DOUBLE)
         |            / CAST(COUNT(CASE WHEN NOT is_new THEN 1 END) AS DOUBLE) AS old_dist,
         |          CAST(SUM(CASE WHEN is_new THEN CAST(dist AS DECIMAL(27,6)) END) AS DOUBLE)
         |            / CAST(COUNT(CASE WHEN is_new THEN 1 END) AS DOUBLE) AS new_dist
         |        FROM pv)
         |SELECT list_id, n_old, n_new, old_dist, new_dist,
         |  CASE WHEN n_old > 0 AND n_new > 0 THEN new_dist / old_dist END AS drift
         |FROM (SELECT * FROM per UNION ALL SELECT * FROM roll) t
         |ORDER BY list_id""".stripMargin,

    "q68b_ann_recall_wide" -> annRecallOracleSql(300),
    "q68c_ann_recall_curve" -> annRecallCurveOracleSql(300, 3, Seq(1, 2, 4, 8, 16)),

    // PQ codebook QA: per-(subspace, code) population + mean squared
    // reconstruction error under the frozen trained codebooks
    "q69_pq_stats" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |           FROM embeddings),
         |books AS (SELECT sub_idx, code, cv FROM ($pqBooksValues) t(sub_idx, code, cv)),
         |subs AS (SELECT vec_id, i AS sub_idx, v[i*8+1 : i*8+8] AS sv
         |         FROM e, range(8) t(i)),
         |asg AS (SELECT vec_id, sub_idx, code, sqd,
         |          ROW_NUMBER() OVER (PARTITION BY vec_id, sub_idx ORDER BY sqd ASC, code ASC) AS rk
         |        FROM (SELECT s.vec_id, s.sub_idx, b.code,
         |                list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 9),
         |                  i -> (s.sv[i] - b.cv[i]) * (s.sv[i] - b.cv[i]))), (acc, z) -> acc + z) AS sqd
         |              FROM subs s JOIN books b USING (sub_idx)) t)
         |SELECT sub_idx, code, CAST(COUNT(*) AS BIGINT) AS n_vectors,
         |  ${A("sqd")} AS avg_sqdist
         |FROM asg WHERE rk = 1 GROUP BY sub_idx, code ORDER BY sub_idx, code""".stripMargin,

    // PQ asymmetric-distance search: query vs coded corpus reconstructions,
    // per-subspace partials added in fixed expression order
    "q70_knn_pq" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |           FROM embeddings),
         |books AS (SELECT sub_idx, code, cv FROM ($pqBooksValues) t(sub_idx, code, cv)),
         |subs AS (SELECT vec_id, i AS sub_idx, v[i*8+1 : i*8+8] AS sv
         |         FROM e, range(8) t(i) WHERE vec_id >= 10),
         |qsubs AS (SELECT vec_id AS q_id, i AS sub_idx, v[i*8+1 : i*8+8] AS qsv
         |          FROM e, range(8) t(i) WHERE vec_id < 10),
         |asg AS (SELECT vec_id, sub_idx, code FROM (
         |          SELECT s.vec_id, s.sub_idx, b.code,
         |            ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.sub_idx
         |              ORDER BY list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 9),
         |                i -> (s.sv[i] - b.cv[i]) * (s.sv[i] - b.cv[i]))), (acc, z) -> acc + z) ASC,
         |              b.code ASC) AS rk
         |          FROM subs s JOIN books b ON s.sub_idx = b.sub_idx) t WHERE rk = 1),
         |recon AS (SELECT a.vec_id, a.sub_idx, b.cv FROM asg a
         |          JOIN books b ON a.sub_idx = b.sub_idx AND a.code = b.code),
         |pair AS (SELECT q.q_id, r.vec_id AS neighbor_id, r.sub_idx,
         |           list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 9),
         |             i -> (q.qsv[i] - r.cv[i]) * (q.qsv[i] - r.cv[i]))), (acc, z) -> acc + z) AS dsub
         |         FROM recon r JOIN qsubs q ON r.sub_idx = q.sub_idx),
         |agg AS (SELECT q_id, neighbor_id,
         |          ${(0 until 8).map(s0 =>
                      s"SUM(CASE WHEN sub_idx = $s0 THEN dsub END) AS d$s0").mkString(", ")}
         |        FROM pair GROUP BY q_id, neighbor_id)
         |SELECT q_id, neighbor_id, adc_dist, rank FROM (
         |  SELECT q_id, neighbor_id, adc_dist,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY adc_dist ASC, neighbor_id) AS BIGINT) AS rank
         |  FROM (SELECT q_id, neighbor_id,
         |          ${(0 until 8).map(s0 => s"d$s0").mkString(" + ")} AS adc_dist
         |        FROM agg) t0) t
         |WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin,

    // IVFADC: the q46b coarse-probe CTEs select WHICH corpus vectors are
    // scored, the shared ivfPqCtes score them by PQ asymmetric distance —
    // probe-then-ADC from the same frozen constants as q46b + q70
    "q70b_knn_ivfpq" ->
      s"""WITH $EMB_NORM,
         |cents AS (SELECT list_id, cv,
         |            sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65),
         |              i -> cv[i] * cv[i])), (x2, y2) -> x2 + y2)) AS cnrm
         |          FROM ($ivfCentsValues) t(list_id, cv)),
         |asg AS (SELECT vec_id, v, nrm, list_id, csim,
         |          ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, list_id) AS crank
         |        FROM (SELECT n.vec_id, n.v, n.nrm, c.list_id,
         |                list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65),
         |                  i -> n.v[i] * c.cv[i])), (x2, y2) -> x2 + y2) / (n.nrm * c.cnrm) AS csim
         |              FROM n, cents c) t),
         |qs AS (SELECT vec_id AS q_id, v AS qv, list_id FROM asg
         |       WHERE vec_id < 10 AND crank <= 2),
         |cp AS (SELECT vec_id, v, list_id FROM asg WHERE vec_id >= 10 AND crank = 1),
         |books AS (SELECT sub_idx, code, cv FROM ($pqBooksValues) t(sub_idx, code, cv)),
         |$ivfPqCtes
         |SELECT q_id, neighbor_id, adc_dist, rank FROM pqtop
         |WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin,

    // residual IVFADC: identical pipeline to q70b, but cp/qs carry
    // RESIDUALS against the assigned/probed list's coarse centroid and
    // the books are the residual-trained constants (PqResidualCodebooks)
    "q70c_knn_ivfpq_res" ->
      s"""WITH $EMB_NORM,
         |cents AS (SELECT list_id, cv,
         |            sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65),
         |              i -> cv[i] * cv[i])), (x2, y2) -> x2 + y2)) AS cnrm
         |          FROM ($ivfCentsValues) t(list_id, cv)),
         |asg AS (SELECT vec_id, v, nrm, list_id, csim,
         |          ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, list_id) AS crank
         |        FROM (SELECT n.vec_id, n.v, n.nrm, c.list_id,
         |                list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65),
         |                  i -> n.v[i] * c.cv[i])), (x2, y2) -> x2 + y2) / (n.nrm * c.cnrm) AS csim
         |              FROM n, cents c) t),
         |qs AS (SELECT a.vec_id AS q_id,
         |         list_transform(range(1, 65), i -> a.v[i] - c.cv[i]) AS qv, a.list_id
         |       FROM asg a JOIN cents c USING (list_id)
         |       WHERE a.vec_id < 10 AND a.crank <= 2),
         |cp AS (SELECT a.vec_id,
         |         list_transform(range(1, 65), i -> a.v[i] - c.cv[i]) AS v, a.list_id
         |       FROM asg a JOIN cents c USING (list_id)
         |       WHERE a.vec_id >= 10 AND a.crank = 1),
         |books AS (SELECT sub_idx, code, cv FROM ($pqResBooksValues) t(sub_idx, code, cv)),
         |$ivfPqCtes
         |SELECT q_id, neighbor_id, adc_dist, rank FROM pqtop
         |WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin,

    // OPQ + IVF + PQ (q70e): q70c's probe-then-ADC with the rotation
    // learned on the residual distribution — coarse assignment/probing
    // CTEs identical to q70c, residuals rotated through the frozen
    // OpqResidualModel before the shared IVFADC chain.
    "q70e_knn_opq_ivf" ->
      s"""WITH $EMB_NORM,
         |cents AS (SELECT list_id, cv,
         |            sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65),
         |              i -> cv[i] * cv[i])), (x2, y2) -> x2 + y2)) AS cnrm
         |          FROM ($ivfCentsValues) t(list_id, cv)),
         |asg AS (SELECT vec_id, v, nrm, list_id, csim,
         |          ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, list_id) AS crank
         |        FROM (SELECT n.vec_id, n.v, n.nrm, c.list_id,
         |                list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65),
         |                  i -> n.v[i] * c.cv[i])), (x2, y2) -> x2 + y2) / (n.nrm * c.cnrm) AS csim
         |              FROM n, cents c) t),
         |qs0 AS (SELECT a.vec_id AS q_id,
         |          list_transform(range(1, 65), i -> a.v[i] - c.cv[i]) AS qv, a.list_id
         |        FROM asg a JOIN cents c USING (list_id)
         |        WHERE a.vec_id < 10 AND a.crank <= 2),
         |cp0 AS (SELECT a.vec_id,
         |          list_transform(range(1, 65), i -> a.v[i] - c.cv[i]) AS v, a.list_id
         |        FROM asg a JOIN cents c USING (list_id)
         |        WHERE a.vec_id >= 10 AND a.crank = 1),
         |rot AS (SELECT i, rv FROM ($opqResRotValues) t(i, rv)),
         |qsr AS (SELECT q.q_id, q.list_id, r.i,
         |          list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65),
         |            j -> r.rv[j] * q.qv[j])), (acc, z) -> acc + z) AS x
         |        FROM qs0 q, rot r),
         |qs AS (SELECT q_id, list_id, list(x ORDER BY i) AS qv FROM qsr GROUP BY q_id, list_id),
         |cpr AS (SELECT c.vec_id, c.list_id, r.i,
         |          list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65),
         |            j -> r.rv[j] * c.v[j])), (acc, z) -> acc + z) AS x
         |        FROM cp0 c, rot r),
         |cp AS (SELECT vec_id, list_id, list(x ORDER BY i) AS v FROM cpr GROUP BY vec_id, list_id),
         |books AS (SELECT sub_idx, code, cv FROM ($opqResBooksValues) t(sub_idx, code, cv)),
         |$ivfPqCtes
         |SELECT q_id, neighbor_id, adc_dist, rank FROM pqtop
         |WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin,

    // OPQ: q70's ADC scan in the learned rotated basis — rotation replayed
    // from the frozen OpqModel (64 full-precision rows), then the exact
    // q70 assignment/ADC chain against the rotated-space books. The
    // rotated coordinate fold (list_reduce ascending j) IS the Spark
    // kernel's accumulation order, so rotation is bit-identical.
    "q70d_knn_opq" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |           FROM embeddings),
         |rot AS (SELECT i, rv FROM ($opqRotValues) t(i, rv)),
         |rc AS (SELECT e.vec_id, r.i,
         |         list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65),
         |           j -> r.rv[j] * e.v[j])), (acc, z) -> acc + z) AS x
         |       FROM e, rot r),
         |re AS (SELECT vec_id, list(x ORDER BY i) AS v FROM rc GROUP BY vec_id),
         |books AS (SELECT sub_idx, code, cv FROM ($opqBooksValues) t(sub_idx, code, cv)),
         |subs AS (SELECT vec_id, i AS sub_idx, v[i*8+1 : i*8+8] AS sv
         |         FROM re, range(8) t(i) WHERE vec_id >= 10),
         |qsubs AS (SELECT vec_id AS q_id, i AS sub_idx, v[i*8+1 : i*8+8] AS qsv
         |          FROM re, range(8) t(i) WHERE vec_id < 10),
         |asg AS (SELECT vec_id, sub_idx, code FROM (
         |          SELECT s.vec_id, s.sub_idx, b.code,
         |            ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.sub_idx
         |              ORDER BY list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 9),
         |                i -> (s.sv[i] - b.cv[i]) * (s.sv[i] - b.cv[i]))), (acc, z) -> acc + z) ASC,
         |              b.code ASC) AS rk
         |          FROM subs s JOIN books b ON s.sub_idx = b.sub_idx) t WHERE rk = 1),
         |recon AS (SELECT a.vec_id, a.sub_idx, b.cv FROM asg a
         |          JOIN books b ON a.sub_idx = b.sub_idx AND a.code = b.code),
         |pair AS (SELECT q.q_id, r.vec_id AS neighbor_id, r.sub_idx,
         |           list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 9),
         |             i -> (q.qsv[i] - r.cv[i]) * (q.qsv[i] - r.cv[i]))), (acc, z) -> acc + z) AS dsub
         |         FROM recon r JOIN qsubs q ON r.sub_idx = q.sub_idx),
         |agg AS (SELECT q_id, neighbor_id,
         |          ${(0 until 8).map(s0 =>
                      s"SUM(CASE WHEN sub_idx = $s0 THEN dsub END) AS d$s0").mkString(", ")}
         |        FROM pair GROUP BY q_id, neighbor_id)
         |SELECT q_id, neighbor_id, adc_dist, rank FROM (
         |  SELECT q_id, neighbor_id, adc_dist,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY adc_dist ASC, neighbor_id) AS BIGINT) AS rank
         |  FROM (SELECT q_id, neighbor_id,
         |          ${(0 until 8).map(s0 => s"d$s0").mkString(" + ")} AS adc_dist
         |        FROM agg) t0) t
         |WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin,

    "q71_interp_align" ->
      """WITH u AS (
        |  SELECT user_id, epoch_us(ts) AS tsn, event_id, value, 0 AS kind
        |  FROM events WHERE event_type = 'error'
        |  UNION ALL
        |  SELECT user_id, epoch_us(ts), event_id, CAST(NULL AS DOUBLE), 1
        |  FROM events WHERE event_type = 'view'),
        |m AS (
        |  SELECT *,
        |    last_value(CASE WHEN kind = 0 THEN tsn END IGNORE NULLS) OVER fwd AS prev_ts,
        |    last_value(CASE WHEN kind = 0 THEN event_id END IGNORE NULLS) OVER fwd AS prev_id,
        |    last_value(CASE WHEN kind = 0 THEN value END IGNORE NULLS) OVER fwd AS prev_v,
        |    last_value(CASE WHEN kind = 0 THEN tsn END IGNORE NULLS) OVER bwd AS next_ts,
        |    last_value(CASE WHEN kind = 0 THEN event_id END IGNORE NULLS) OVER bwd AS next_id,
        |    last_value(CASE WHEN kind = 0 THEN value END IGNORE NULLS) OVER bwd AS next_v
        |  FROM u
        |  WINDOW
        |    fwd AS (PARTITION BY user_id ORDER BY tsn ASC, kind ASC, event_id ASC
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    bwd AS (PARTITION BY user_id ORDER BY tsn DESC, kind ASC, event_id DESC
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT event_id AS view_id, user_id, tsn AS t_us, prev_id, next_id,
        |  CASE WHEN prev_ts IS NULL THEN next_v
        |       WHEN next_ts IS NULL THEN prev_v
        |       WHEN next_ts = prev_ts THEN prev_v
        |       ELSE prev_v + (next_v - prev_v) *
        |            (CAST(tsn - prev_ts AS DOUBLE) / CAST(next_ts - prev_ts AS DOUBLE)) END
        |    AS value_interp
        |FROM m WHERE kind = 1 ORDER BY view_id""".stripMargin,

    "q72_overlap_join" -> q72OverlapOracle,

    // q72b shares q72's oracle verbatim — parity across both proves the
    // RangeJoinRule rewrite is semantics-preserving
    "q72b_range_join_rule" -> q72OverlapOracle,

    "q73_bm25" -> BM25_SQL,
    "q73b_bm25_multi" -> BM25_MULTI_SQL,

    // RRF fusion of q73's lexical top-20 and the vec-0 cosine top-20
    // (vec_id = doc_id convention). 1.0/(K+rank) is a fixed IEEE chain;
    // FULL JOIN USING coalesces doc_id exactly like Spark's full_outer.
    "q81_hybrid_rrf" ->
      s"""WITH $EMB_NORM,
         |bm AS (SELECT * FROM ($BM25_SQL)),
         |lexr AS (SELECT doc_id,
         |           CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank_lex
         |         FROM bm),
         |qv AS (SELECT v, nrm FROM n WHERE vec_id = 0),
         |sem AS (SELECT n.vec_id AS doc_id,
         |          list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65),
         |            i -> n.v[i]*qv.v[i])), (a2, b2) -> a2 + b2) / (n.nrm * qv.nrm) AS cos
         |        FROM n, qv WHERE n.vec_id >= 10),
         |semtop AS (SELECT doc_id, cos FROM sem ORDER BY cos DESC, doc_id LIMIT 20),
         |semr AS (SELECT doc_id,
         |           CAST(ROW_NUMBER() OVER (ORDER BY cos DESC, doc_id) AS BIGINT) AS rank_sem
         |         FROM semtop)
         |SELECT doc_id, rank_lex, rank_sem,
         |  COALESCE(CAST(1 AS DOUBLE) / (60 + rank_lex), 0) +
         |  COALESCE(CAST(1 AS DOUBLE) / (60 + rank_sem), 0) AS rrf
         |FROM lexr FULL JOIN semr USING (doc_id)
         |ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin,

    // q81 fanned over the query table vec_id < 3: per-query semantic
    // ranks, the shared BM25 list cross-joined to every query, fusion and
    // final rank PARTITIONED by query_id; FULL JOIN USING coalesces both
    // keys exactly like Spark's full_outer on the two-column key
    "q81b_hybrid_rrf_multi" ->
      s"""WITH $EMB_NORM,
         |bm AS (SELECT * FROM ($BM25_SQL)),
         |lexr AS (SELECT doc_id,
         |           CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank_lex
         |         FROM bm),
         |qv AS (SELECT vec_id AS query_id, v, nrm FROM n WHERE vec_id < 3),
         |sem AS (SELECT qv.query_id, n.vec_id AS doc_id,
         |          list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65),
         |            i -> n.v[i]*qv.v[i])), (a2, b2) -> a2 + b2) / (n.nrm * qv.nrm) AS cos
         |        FROM n, qv WHERE n.vec_id >= 10),
         |semtop AS (SELECT query_id, doc_id, rank_sem FROM (
         |             SELECT query_id, doc_id,
         |               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         |                 ORDER BY cos DESC, doc_id) AS BIGINT) AS rank_sem
         |             FROM sem) t WHERE rank_sem <= 20),
         |lexq AS (SELECT q.query_id, l.doc_id, l.rank_lex
         |         FROM lexr l, (SELECT DISTINCT query_id FROM qv) q),
         |f AS (SELECT query_id, doc_id, rank_lex, rank_sem,
         |        COALESCE(CAST(1 AS DOUBLE) / (60 + rank_lex), 0) +
         |        COALESCE(CAST(1 AS DOUBLE) / (60 + rank_sem), 0) AS rrf
         |      FROM lexq FULL JOIN semtop USING (query_id, doc_id))
         |SELECT query_id, doc_id, rank_lex, rank_sem, rrf, rank FROM (
         |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY rrf DESC, doc_id) AS BIGINT) AS rank FROM f) t
         |WHERE rank <= 20 ORDER BY query_id, rank""".stripMargin,

    "q74_pps_sample" ->
      """WITH d2 AS (
        |  SELECT source, doc_id, n_chars,
        |    SUM(n_chars) OVER (PARTITION BY source
        |      ORDER BY (doc_id * 2654435761) % 1000000007, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    SUM(n_chars) OVER (PARTITION BY source) AS tot
        |  FROM documents)
        |SELECT source, j AS pick, doc_id, n_chars
        |FROM d2 CROSS JOIN range(3) t(j)
        |WHERE (cum - n_chars) * 6 < (j * 2 + 1) * tot
        |  AND (j * 2 + 1) * tot <= cum * 6
        |ORDER BY source, pick""".stripMargin,

    "q75_scd2" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS tus, event_type FROM events),
        |ch AS (
        |  SELECT *, lag(event_type) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS prev_type
        |  FROM e),
        |f AS (SELECT * FROM ch WHERE prev_type IS NULL OR prev_type <> event_type)
        |SELECT user_id,
        |  CAST(ROW_NUMBER() OVER w AS BIGINT) AS version,
        |  event_type AS state,
        |  tus AS valid_from_us,
        |  lead(tus) OVER w AS valid_to_us,
        |  lead(tus) OVER w IS NULL AS is_current
        |FROM f WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)
        |ORDER BY user_id, version""".stripMargin,

    "q76_rolling_features" ->
      """SELECT event_id, user_id,
        |  CAST(SUM(CAST(value AS DECIMAL(27,6))) OVER w10 AS DOUBLE)
        |    / COUNT(*) OVER w10 AS mean_10,
        |  MIN(value) OVER w3 AS min_3,
        |  MAX(value) OVER w3 AS max_3,
        |  value - lag(value) OVER wb AS delta_1
        |FROM events
        |WINDOW
        |  wb  AS (PARTITION BY user_id ORDER BY ts, event_id),
        |  w10 AS (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN 9 PRECEDING AND CURRENT ROW),
        |  w3  AS (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    "q77_cohort_retention" ->
      """WITH wk AS (
        |  SELECT user_id, epoch_ns(ts) // 604800000000000 AS week FROM events),
        |lab AS (
        |  SELECT DISTINCT MIN(week) OVER (PARTITION BY user_id) AS cohort_week,
        |    week, user_id
        |  FROM wk),
        |counts AS (
        |  SELECT cohort_week, week, COUNT(DISTINCT user_id) AS n_users
        |  FROM lab GROUP BY 1, 2),
        |base AS (
        |  SELECT cohort_week, n_users AS cohort_size FROM counts
        |  WHERE week = cohort_week)
        |SELECT c.cohort_week, c.week - c.cohort_week AS weeks_since, c.n_users,
        |  b.cohort_size, (c.n_users * 100) // b.cohort_size AS retention_pct
        |FROM counts c JOIN base b USING (cohort_week)
        |ORDER BY c.cohort_week, weeks_since""".stripMargin,

    "q78_transitions" ->
      """WITH nxt AS (
        |  SELECT event_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        |  FROM events),
        |bi AS (
        |  SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS n
        |  FROM nxt WHERE next_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |  CAST((n * 10000) // SUM(n) OVER (PARTITION BY from_type) AS BIGINT) AS share_bp
        |FROM bi ORDER BY from_type, to_type""".stripMargin,

    "q79_anomalies" ->
      """WITH st AS (
        |  SELECT event_type, COUNT(*) AS n,
        |    CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(value * value AS DECIMAL(27,6))) AS DOUBLE) AS sx2
        |  FROM events GROUP BY 1),
        |st2 AS (
        |  SELECT event_type, sx / n AS mean, sqrt(sx2 / n - (sx / n) * (sx / n)) AS std
        |  FROM st)
        |SELECT e.event_id, e.event_type, e.value, (e.value - s.mean) / s.std AS zscore
        |FROM events e JOIN st2 s USING (event_type)
        |WHERE ABS(e.value - s.mean) > 3.0 * s.std
        |ORDER BY e.event_id""".stripMargin,

    "q80_expectations" ->
      """WITH wide AS (
        |  SELECT COUNT(*) AS n_rows,
        |    CAST(SUM(CASE WHEN l_quantity < 1.0 OR l_quantity > 50.0 THEN 1 ELSE 0 END) AS BIGINT) AS v1,
        |    CAST(SUM(CASE WHEN l_discount < 0.0 OR l_discount > 0.1 THEN 1 ELSE 0 END) AS BIGINT) AS v2,
        |    CAST(SUM(CASE WHEN l_extendedprice <= 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS v3,
        |    CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v4,
        |    CAST(SUM(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R') THEN 1 ELSE 0 END) AS BIGINT) AS v5,
        |    CAST(SUM(CASE WHEN l_tax < 0.0 OR l_tax > 0.2 THEN 1 ELSE 0 END) AS BIGINT) AS v6,
        |    CAST(SUM(CASE WHEN l_quantity > 45.0 THEN 1 ELSE 0 END) AS BIGINT) AS v7
        |  FROM lineitem)
        |SELECT check_name, n_rows, n_violations, n_violations = 0 AS pass FROM (
        |  SELECT 'quantity_in_range' AS check_name, n_rows, v1 AS n_violations FROM wide
        |  UNION ALL SELECT 'discount_in_range', n_rows, v2 FROM wide
        |  UNION ALL SELECT 'price_positive', n_rows, v3 FROM wide
        |  UNION ALL SELECT 'shipdate_not_null', n_rows, v4 FROM wide
        |  UNION ALL SELECT 'returnflag_domain', n_rows, v5 FROM wide
        |  UNION ALL SELECT 'tax_in_range', n_rows, v6 FROM wide
        |  UNION ALL SELECT 'quantity_not_extreme', n_rows, v7 FROM wide) t
        |ORDER BY check_name""".stripMargin,

    // q112 level-shift scan: two ROWS-frame window means over the same
    // (type; ts, event_id) sort, decimal-carrier sums with one double
    // division each, the q79 σ chain, and the two-sample z in a fixed
    // IEEE order — full windows only, constant channels gated out
    "q112_level_shift" -> levelShiftOracleSql,
    "q112b_level_shift_sharded" -> levelShiftOracleSql,

    // q111 sensor-sync audit: nearest-either-direction via TWO ASOF joins
    // (backward >= picks the last sample at-or-before each frame, forward
    // <= the first at-or-after); signed gap = frame − nearest with the
    // tie going to the earlier sample — the same total order the Spark
    // two-scan computes. µs everywhere; the mean is an exact integer SUM
    // cast to double ONCE (the decimal carrier double-rounds past 2^53
    // unscaled — see TemporalOps.syncRollupOf).
    "q111_sensor_sync" ->
      """WITH f AS (SELECT user_id, event_id, epoch_us(ts) AS t
        |           FROM events WHERE event_type = 'view'),
        |c AS (SELECT user_id, epoch_us(ts) AS t
        |      FROM events WHERE event_type = 'click'),
        |p AS (SELECT f.user_id, f.event_id, f.t, c.t AS pt
        |      FROM f ASOF LEFT JOIN c
        |        ON f.user_id = c.user_id AND f.t >= c.t),
        |n AS (SELECT f.event_id, c.t AS nt
        |      FROM f ASOF LEFT JOIN c
        |        ON f.user_id = c.user_id AND f.t <= c.t),
        |g AS (SELECT p.user_id, p.t,
        |        CASE WHEN pt IS NULL AND nt IS NULL THEN NULL
        |             WHEN nt IS NULL THEN p.t - pt
        |             WHEN pt IS NULL THEN -(nt - p.t)
        |             WHEN p.t - pt <= nt - p.t THEN p.t - pt
        |             ELSE -(nt - p.t) END AS gap
        |      FROM p JOIN n ON p.event_id = n.event_id)
        |SELECT user_id, t // 3600000000 AS hour_bucket,
        |  CAST(COUNT(*) AS BIGINT) AS n_frames,
        |  CAST(COUNT(*) - COUNT(gap) AS BIGINT) AS n_unmatched,
        |  CAST(MAX(ABS(gap)) AS BIGINT) AS max_abs_gap_us,
        |  CAST(SUM(gap) AS DOUBLE) / COUNT(gap) AS mean_gap_us
        |FROM g GROUP BY 1, 2 ORDER BY user_id, hour_bucket""".stripMargin,
  )
}
