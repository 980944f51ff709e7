#!/usr/bin/env python3
"""Emit the OPTIMIZATION_r16 per-operator audit table: before/close bench
numbers joined with the per-query examination verdict (legend in
OPTIMIZATION_r16.md). Usage: audit_table.py BEFORE.json CLOSE.json"""
import json, sys

b = json.load(open(sys.argv[1]))
m = json.load(open(sys.argv[2]))

V = {}
def setv(code, *qs):
    for q in qs: V[q] = code

setv("plan-ok",
     "q01_pricing_summary","q02_filter_pushdown","q03_join_agg","q04_exists_semijoin",
     "q05_multi_join","q06_scan_agg","q07_window_rank","q08_window_running",
     "q08b_window_range","q09_rollup","q09b_cube","q10_antijoin","q11_topk_per_group",
     "q11b_topk_agg","q12_distinct_count","q12b_approx_distinct","q13_case_pivot",
     "q14_percentiles","q14b_approx_percentiles","q15_union_dedup","q16_json_extract",
     "q17_string_funcs","q18_date_trunc","q19_correlated_avg","q34_salted_join",
     "q20_frame_index","q21_sessionize","q22_frame_gaps","q23_detect_maxconf",
     "q24_vru_filter","q25_label_search","q26_asof_join","q27_monitor_status",
     "q28_bbox_normalize","q29_bbox_iou","q30_train_val_split","q35_funnel",
     "q36_sample","q37_mp4_manifest","q40_dedup_exact","q47_langid","q48_quality_score",
     "q48b_length_outliers","q49_token_count","q51_embed_stats","q52_top_terms",
     "q52b_vocab_growth","q52c_zipf_fit","q53_normalize","q58_stratified_sample",
     "q59_quantize_int8","q60_chunk_docs","q61_pack_sequences","q61b_pack_layout",
     "q62_incremental_dedup","q63_gopher_quality","q64_source_mix","q64b_epoch_mix",
     "q64c_temperature_mix","q71_interp_align","q72_overlap_join","q72b_range_join_rule",
     "q73_bm25","q73b_bm25_multi","q74_pps_sample","q75_scd2","q76_rolling_features",
     "q77_cohort_retention","q78_transitions","q79_anomalies","q80_expectations",
     "q81_hybrid_rrf","q81b_hybrid_rrf_multi","q85_source_divergence","q85b_doremi_weights",
     "q87_bpe_pairs","q89_bpe_encode","q90_lm_perplexity","q93_fertility",
     "q95_quality_clf","q95b_clf_curve","q95d_clf_calibration","q104_voxel_downsample",
     "q105_audio_spectral","q106_entropy","q110_quality_drift","q111_sensor_sync",
     "q112_level_shift","q112b_level_shift_sharded")
setv("kernel",
     "q29b_det_eval","q29c_det_ap","q29d_nms","q29e_det_map_coco","q29f_det_ap_voc07",
     "q29g_det_map_coco_greedy","q29h_det_ap_voc07_greedy","q29i_det_coco_scoreboard",
     "q29j_det_confusion")
setv("latency", "q32_track_stitch","q55_dedup_groups","q55b_dedup_priority",
     "q55c_group_sizes","q55d_dedup_savings","q88_bpe_train")
setv("oracle-hash",
     "q41_dedup_ngram","q41b_dedup_ngram_capped","q41c_dedup_ngram_prefix",
     "q41d_dedup_containment","q42_dedup_minhash","q42b_minhash_est","q43_dedup_simhash",
     "q50_fingerprint","q50b_winnow","q50c_winnow_dedup","q56_contamination",
     "q57_dup_ngram_rate","q65_dup_runs","q82_decontaminate","q82b_decon_fuzzy",
     "q82c_decon_bloom","q82d_decon_fraction","q83_dup_spans","q83b_cut_dup_spans",
     "q84_source_overlap","q97_decon_curve","q99_repetition_profile","q109_mask_dup_spans")
setv("composed", "q86_dedup_recall","q96_band_curve","q96b_winnow_curve")
setv("ann",
     "q44_dedup_embedding","q44b_dedup_embedding_blocked","q44c_dedup_embedding_dense",
     "q44d_dedup_embedding_auto","q45_knn_bruteforce","q46_knn_lsh","q46b_knn_ivf",
     "q46c_knn_lsh_multi","q46d_knn_ivf_auto","q46e_knn_imi","q46f_ann_recall_imi",
     "q54_ivf_balance","q54b_ivf_balance_auto","q66_label_centroids","q66b_label_outliers",
     "q66c_class_separation","q67_semantic_dedup","q67b_semantic_dedup_blocked",
     "q67c_semantic_dedup_auto","q68_ann_recall","q68b_ann_recall_wide",
     "q68c_ann_recall_curve","q68d_ann_recall_auto","q68e_ann_recall_curve_auto",
     "q69_pq_stats","q70_knn_pq","q70b_knn_ivfpq","q70c_knn_ivfpq_res","q70d_knn_opq",
     "q70e_knn_opq_ivf","q92_pca_top","q92b_pca_spectrum","q100_hard_negatives",
     "q101_prototype_prune","q103_cluster_map","q107_retrieval_quality",
     "q107b_retrieval_quality_multi","q108_index_drift")
setv("OPT-1 (trainer kernel)", "q94b_clf_train_sampled")
setv("OPT-2 (overlap+sort-once)", "q98_quality_agreement")
setv("OPT-3 (sort-once)", "q95c_clf_eval")
setv("OPT-4 (persist scored)", "q90b_ccnet_buckets")
setv("OPT-5 (persist feats)", "q91_dsir")

missing = [q for q in b['queries'] if q not in V]
if missing:
    sys.stderr.write("UNASSIGNED: %s\n" % missing)

print("| query | before wall s | before CPU s | close wall s | close CPU s | verdict |")
print("|---|---|---|---|---|---|")
for q in sorted(b['queries']):
    w0, c0 = b['queries'][q], b['cpu'][q]
    w1 = m['queries'].get(q); c1 = m['cpu'].get(q)
    w1s = f"{w1:.2f}" if w1 is not None else "-"
    c1s = f"{c1:.1f}" if c1 is not None else "-"
    print(f"| {q} | {w0:.2f} | {c0:.1f} | {w1s} | {c1s} | {V.get(q,'?')} |")
