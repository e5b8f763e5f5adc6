"""Aggregated training-data operators: dedup, similarity, text, multimodal.

``EXTRA_QUERIES`` feeds ``__ray_entry__.queries()``; entries present in
``EXTRA_ORACLE_SQL`` are DuckDB-gated, the rest get the driver's rows-only
check (LSH / sketches / stubs are not SQL-expressible).
"""

from __future__ import annotations

from engine import (analytics, asof, bpe, classify, corpus, curate, decontam,
                    dedup, editsim, filters, multimodal, relational, robust,
                    simsearch, sketch, streaming, text)

EXTRA_QUERIES = {
    # as-of / range joins (point-in-time attribution)
    "events_asof_prior_purchase": asof.q_events_asof_prior_purchase,
    "events_range_join_counts": asof.q_events_range_join_counts,
    # windowed / order-statistics analytics
    "events_running_totals": analytics.q_events_running_totals,
    "value_quantiles_by_type": analytics.q_value_quantiles_by_type,
    "customers_without_urgent_order":
        analytics.q_customers_without_urgent_order,
    "distinct_users_by_type": analytics.q_distinct_users_by_type,
    "doc_rollup": analytics.q_doc_rollup,
    "top3_orders_per_priority": analytics.q_top3_orders_per_priority,
    "orders_per_customer_left": analytics.q_orders_per_customer_left,
    "event_transitions": analytics.q_event_transitions,
    "orders_above_customer_avg": analytics.q_orders_above_customer_avg,
    # fact-to-fact join plans
    "q3_revenue_topk": relational.q_q3_revenue_topk,
    "q18_big_orders": relational.q_q18_big_orders,
    "q4_priority_counts": relational.q_q4_priority_counts,
    # edit-distance near-dup family
    "edit_distance_pairs": editsim.q_edit_distance_pairs,
    # text analysis
    "text_stats": text.q_text_stats,
    "token_counts": text.q_token_counts,
    "doc_fingerprint_md5": text.q_doc_fingerprint,
    "fingerprint_rolling": text.q_fingerprint_rolling,
    "fingerprint_rolling_fast": text.q_fingerprint_rolling_fast,
    "lang_id": text.q_lang_id,
    "quality_score": text.q_quality_score,
    # dedup
    "dedup_exact": dedup.q_dedup_exact,
    "dedup_minhash_lsh": dedup.q_dedup_minhash_lsh,
    "dedup_clusters": dedup.q_dedup_clusters,
    "dedup_clusters_lp": dedup.q_dedup_clusters_lp,
    "dedup_simhash": dedup.q_dedup_simhash,
    "dedup_verified_pairs": dedup.q_dedup_verified_pairs,
    "ngram_jaccard_pairs": dedup.q_ngram_jaccard_pairs,
    # similarity search
    "simsearch_topk": simsearch.q_simsearch_topk,
    "simsearch_lsh": simsearch.q_simsearch_lsh,
    "simsearch_ivf": simsearch.q_simsearch_ivf,
    "simsearch_pq": simsearch.q_simsearch_pq,
    "embedding_near_dup": simsearch.q_embedding_near_dup,
    "embedding_similar_pairs_exact": simsearch.q_embedding_similar_pairs_exact,
    "semantic_dedup": simsearch.q_semantic_dedup,
    # multimodal plumbing
    "multimodal_decode": multimodal.q_multimodal_decode,
    "multimodal_stats": multimodal.q_multimodal_stats,
    "multimodal_resize": multimodal.q_multimodal_resize,
    "multimodal_frames": multimodal.q_multimodal_frames,
    # corpus preparation
    "corpus_split": corpus.q_corpus_split,
    "corpus_split_fast": corpus.q_corpus_split_fast,
    "pack_sequences": corpus.q_pack_sequences,
    "top_terms_by_lang": corpus.q_top_terms_by_lang,
    "events_hopping_window": corpus.q_events_hopping_window,
    "shuffle_shards": corpus.q_shuffle_shards,
    "source_cap": corpus.q_source_cap,
    "keyword_search": corpus.q_keyword_search,
    "keyword_search_indexed": corpus.q_keyword_search_indexed,
    "tfidf_topk": corpus.q_tfidf_topk,
    "tfidf_topk_indexed": corpus.q_tfidf_topk_indexed,
    "cross_corpus_dedup": decontam.q_cross_corpus_dedup,
    "knn_join": simsearch.q_knn_join,
    "knn_join_ivf": simsearch.q_knn_join_ivf,
    # tokenizer training (iterative; rows-only, pinned to a reference
    # implementation in tests/test_bpe.py)
    "bpe_merges": bpe.q_bpe_merges,
    "train_quality_classifier": classify.q_train_quality_classifier,
    "bpe_tokenize": bpe.q_bpe_tokenize,
    # composite curation pipeline
    "curate_corpus": curate.q_curate_corpus,
    "curate_corpus_neardup": curate.q_curate_corpus_neardup,
    # content filters (Gopher/CCNet family)
    "repetition_filter": filters.q_repetition_filter,
    "line_dedup": filters.q_line_dedup,
    "dup_ngram_stats": filters.q_dup_ngram_stats,
    "dup_ngram_stats_semijoin": filters.q_dup_ngram_stats_semijoin,
    "dup_span_removal": filters.q_dup_span_removal,
    "dup_span_removal_semijoin": filters.q_dup_span_removal_semijoin,
    "pii_redact": filters.q_pii_redact,
    "unigram_commonness": filters.q_unigram_commonness,
    # decontamination / mixture control
    "decontaminate": decontam.q_decontaminate,
    "decontaminate_fast": decontam.q_decontaminate_fast,
    "source_mixture_sample": decontam.q_source_mixture_sample,
    "source_mixture_sample_fast": decontam.q_source_mixture_sample_fast,
    # sketches / corpus profiling
    "kmv_distinct": sketch.q_kmv_distinct,
    "heavy_hitters": sketch.q_heavy_hitters,
    "late_data_watermark": streaming.q_late_data_watermark,
    "window_finalize": streaming.q_window_finalize,
    "kmv_distinct_fast": sketch.q_kmv_distinct_fast,
    "token_quantiles": sketch.q_token_quantiles,
    "stratified_sample": sketch.q_stratified_sample,
    # star-schema dimension joins over the previously untouched tables
    "promo_revenue": relational.q_promo_revenue,
    "nation_revenue": relational.q_nation_revenue,
    # robust / behavioral statistics
    "median_value_by_type": robust.q_median_value_by_type,
    "user_funnel": robust.q_user_funnel,
    "value_outliers": robust.q_value_outliers,
    "doc_length_histogram": robust.q_doc_length_histogram,
}

EXTRA_ORACLE_SQL = {
    "events_asof_prior_purchase": asof.SQL_EVENTS_ASOF,
    "events_range_join_counts": asof.SQL_EVENTS_RANGE_JOIN,
    "events_running_totals": analytics.SQL_EVENTS_RUNNING_TOTALS,
    "value_quantiles_by_type": analytics.SQL_VALUE_QUANTILES,
    "customers_without_urgent_order": analytics.SQL_CUSTOMERS_WITHOUT_URGENT,
    "distinct_users_by_type": analytics.SQL_DISTINCT_USERS_BY_TYPE,
    "doc_rollup": analytics.SQL_DOC_ROLLUP,
    "top3_orders_per_priority": analytics.SQL_TOP3_ORDERS_PER_PRIORITY,
    "orders_per_customer_left": analytics.SQL_ORDERS_PER_CUSTOMER_LEFT,
    "event_transitions": analytics.SQL_EVENT_TRANSITIONS,
    "orders_above_customer_avg": analytics.SQL_ORDERS_ABOVE_CUSTOMER_AVG,
    "q3_revenue_topk": relational.SQL_Q3_REVENUE_TOPK,
    "q18_big_orders": relational.SQL_Q18_BIG_ORDERS,
    "q4_priority_counts": relational.SQL_Q4_PRIORITY_COUNTS,
    "edit_distance_pairs": editsim.SQL_EDIT_DISTANCE_PAIRS,
    "text_stats": text.SQL_TEXT_STATS,
    "token_counts": text.SQL_TOKEN_COUNTS,
    "doc_fingerprint_md5": text.SQL_DOC_FINGERPRINT,
    "fingerprint_rolling": text.SQL_FINGERPRINT_ROLLING,
    "fingerprint_rolling_fast": text.SQL_FINGERPRINT_ROLLING_FAST,
    "lang_id": text.SQL_LANG_ID,
    "quality_score": text.SQL_QUALITY_SCORE,
    "dedup_exact": dedup.SQL_DEDUP_EXACT,
    "ngram_jaccard_pairs": dedup.SQL_NGRAM_JACCARD,
    "simsearch_topk": simsearch.SQL_SIMSEARCH_TOPK,
    "embedding_similar_pairs_exact": simsearch.SQL_EMBEDDING_SIMILAR_PAIRS,
    "multimodal_decode": multimodal.SQL_MULTIMODAL_DECODE,
    "multimodal_stats": multimodal.SQL_MULTIMODAL_STATS,
    "multimodal_resize": multimodal.SQL_MULTIMODAL_RESIZE,
    "multimodal_frames": multimodal.SQL_MULTIMODAL_FRAMES,
    "corpus_split": corpus.SQL_CORPUS_SPLIT,
    "pack_sequences": corpus.SQL_PACK_SEQUENCES,
    "top_terms_by_lang": corpus.SQL_TOP_TERMS,
    "events_hopping_window": corpus.SQL_EVENTS_HOPPING,
    "shuffle_shards": corpus.SQL_SHUFFLE_SHARDS,
    "source_cap": corpus.SQL_SOURCE_CAP,
    "keyword_search": corpus.SQL_KEYWORD_SEARCH,
    "keyword_search_indexed": corpus.SQL_KEYWORD_SEARCH,
    "tfidf_topk": corpus.SQL_TFIDF_TOPK,
    "tfidf_topk_indexed": corpus.SQL_TFIDF_TOPK,
    "cross_corpus_dedup": decontam.SQL_CROSS_CORPUS_DEDUP,
    "knn_join": simsearch.SQL_KNN_JOIN,
    "curate_corpus": curate.SQL_CURATE_CORPUS,
    "repetition_filter": filters.SQL_REPETITION_FILTER,
    "line_dedup": filters.SQL_LINE_DEDUP,
    "dup_ngram_stats": filters.SQL_DUP_NGRAM,
    "dup_ngram_stats_semijoin": filters.SQL_DUP_NGRAM,
    "dup_span_removal": filters.SQL_DUP_SPAN_REMOVAL,
    "dup_span_removal_semijoin": filters.SQL_DUP_SPAN_REMOVAL,
    "pii_redact": filters.SQL_PII_REDACT,
    "unigram_commonness": filters.SQL_UNIGRAM_COMMONNESS,
    "decontaminate": decontam.SQL_DECONTAMINATE,
    "decontaminate_fast": decontam.SQL_DECONTAMINATE,
    "source_mixture_sample": decontam.SQL_SOURCE_MIXTURE,
    "kmv_distinct": sketch.SQL_KMV_DISTINCT,
    "heavy_hitters": sketch.SQL_HEAVY_HITTERS,
    "late_data_watermark": streaming.SQL_LATE_DATA_WATERMARK,
    "window_finalize": streaming.SQL_WINDOW_FINALIZE,
    "token_quantiles": sketch.SQL_TOKEN_QUANTILES,
    "stratified_sample": sketch.SQL_STRATIFIED_SAMPLE,
    "promo_revenue": relational.SQL_PROMO_REVENUE,
    "nation_revenue": relational.SQL_NATION_REVENUE,
    "median_value_by_type": robust.SQL_MEDIAN_VALUE_BY_TYPE,
    "user_funnel": robust.SQL_USER_FUNNEL,
    "value_outliers": robust.SQL_VALUE_OUTLIERS,
    "doc_length_histogram": robust.SQL_DOC_LENGTH_HISTOGRAM,
}

ROWS_ONLY_QUERIES = {k: v for k, v in EXTRA_QUERIES.items()
                     if k not in EXTRA_ORACLE_SQL}
