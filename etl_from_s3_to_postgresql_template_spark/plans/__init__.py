"""Named query plans: the driver-contract surface.

``registry.QUERIES`` maps query-name -> (spark, sf_dir) -> DataFrame;
``registry.ORACLE`` maps query-name -> equivalent DuckDB SQL. Import the
submodules for their registration side effects.
"""

# Registration order = the order the driver's correctness gate walks the
# registry (it verifies a bounded prefix per round). Round 1 proved the
# §2 core + query_pack surface (CORRECTNESS_r01.json); round 2 proved
# llm_ops/corpus_ops/streaming_ops/multimodal_ops (CORRECTNESS_r02.json).
# Round 3 rotates the remaining never-driver-verified modules to the
# front (tpch2 + ext + llm_ops2 + analytics_ops = 41 entries), followed
# by llm_ops3 (new this round), so every unproven query sits inside the
# gate's checked prefix; proven modules register last.
from etl_from_s3_to_postgresql_template_spark.plans import registry
from etl_from_s3_to_postgresql_template_spark.plans import query_pack_tpch2  # noqa: F401
from etl_from_s3_to_postgresql_template_spark.plans import query_pack_ext  # noqa: F401
from etl_from_s3_to_postgresql_template_spark.plans import llm_ops2  # noqa: F401
from etl_from_s3_to_postgresql_template_spark.plans import analytics_ops  # noqa: F401
from etl_from_s3_to_postgresql_template_spark.plans import llm_ops3  # noqa: F401
from etl_from_s3_to_postgresql_template_spark.plans import llm_ops4  # noqa: F401
from etl_from_s3_to_postgresql_template_spark.plans import llm_ops  # noqa: F401
from etl_from_s3_to_postgresql_template_spark.plans import corpus_ops  # noqa: F401
from etl_from_s3_to_postgresql_template_spark.plans import streaming_ops  # noqa: F401
from etl_from_s3_to_postgresql_template_spark.plans import multimodal_ops  # noqa: F401
from etl_from_s3_to_postgresql_template_spark.plans import query_pack  # noqa: F401
from etl_from_s3_to_postgresql_template_spark.plans import core_ops  # noqa: F401

# Names stamped green by the driver's correctness gate in rounds 1-2
# (CORRECTNESS_r01.json + CORRECTNESS_r02.json).  The gate verifies a
# bounded prefix (~50) of the registry each round, so after module
# registration we rotate every never-driver-verified query to the front
# (keeping relative registration order) and the already-proven names to
# the back.  Pure bookkeeping: no query or oracle changes.
_DRIVER_VERIFIED = frozenset([
    "agg_approx_sketches", "agg_cube_grouping", "agg_cube_orders",
    "agg_date_range", "agg_duplicate_count", "agg_event_stats",
    "agg_files_per_date", "agg_median_percentile", "agg_null_col_detect",
    "agg_rollup", "agg_rows_per_day", "agg_rows_per_file", "corpus_bigram_lm",
    "corpus_bpe_pair_stats", "corpus_decontaminate", "corpus_pack_sequences",
    "corpus_prep_funnel", "corpus_sample_stratified", "corpus_vocab_topk",
    "dedup_duplicate_clusters", "dedup_embedding_pairs", "dedup_exact",
    "dedup_exact_docs", "dedup_exact_hashed", "dedup_fuzzy_levenshtein",
    "dedup_latest_per_key", "dedup_minhash_pairs", "dedup_ngram_jaccard",
    "dedup_ngram_jaccard_exact", "dedup_simhash_pairs", "doc_fingerprint",
    "docs_length_quantiles", "dq_rule_violations", "embedding_label_centroids",
    "embedding_norms", "embedding_quantize_int8", "filter_filename_date",
    "graph_token_triangles", "join_anti", "join_asof", "join_broadcast_dim",
    "join_full_outer", "join_range_bands", "join_semi", "json_extract_props",
    "multimodal_decode_meta", "multimodal_feature_hist",
    "multimodal_frame_sample", "multimodal_resize_decode",
    "pivot_status_counts", "profile_table_stats", "project_clean_colnames",
    "project_epoch_to_ts", "project_extract_date_str", "project_metadata_cols",
    "q10_returned_items", "q13_customer_distribution", "q14_promo_revenue",
    "q18_large_orders", "q19_disjunctive_filter", "q1_pricing_summary",
    "q20_promo_supplier_semi", "q3_shipping_priority", "q4_order_priority",
    "q5_region_revenue", "q6_forecast_revenue", "scan_csv", "scan_csv_gz",
    "scan_file_listing", "scan_jsonl", "scan_orc", "set_intersect_except",
    "set_ops_segments", "similarity_topk_bruteforce", "similarity_topk_ivf",
    "similarity_topk_lsh", "sort_limit_topn", "streaming_dedup_events",
    "streaming_foreachbatch_sink", "streaming_session_windows",
    "streaming_sliding_counts", "streaming_stateful_user_counts",
    "streaming_static_enrich", "streaming_stream_join",
    "streaming_window_counts", "text_lang_id", "text_quality",
    "text_quality_gate", "text_repetition_score", "text_tfidf_top_terms",
    "text_token_count", "text_token_count_bpe", "union_by_name",
    "unpivot_lineitem_metrics", "window_analytics_lag_lead",
    "window_running_sum", "window_session_events", "window_sliding_events",
    "window_topk_per_group", "window_tumbling_events",
])


def _rotate_unverified_first() -> None:
    ordered = sorted(
        registry.QUERIES, key=lambda n: (n in _DRIVER_VERIFIED,)
    )  # stable: relative registration order preserved within each class
    for mapping in (registry.QUERIES, registry.ORACLE):
        snapshot = {n: mapping[n] for n in ordered if n in mapping}
        mapping.clear()
        mapping.update(snapshot)


_rotate_unverified_first()

QUERIES = registry.QUERIES
ORACLE = registry.ORACLE

__all__ = ["QUERIES", "ORACLE", "registry"]
