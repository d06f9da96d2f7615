"""Query registry — the driver contract surface.

Every implemented operator from SURVEY.md §2 registers one named query
(a ``(spark, sf_dir) -> DataFrame`` callable) and, when the semantics
are SQL-expressible, a DuckDB oracle SQL string. ``__spark_entry__.py``
re-exports these to the verification driver.

Registration is by decorator so adding an operator is one function in
one themed module; importing this package pulls in every module.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query; ``oracle`` is the DuckDB-equivalent SQL
    (omit for genuinely non-SQL-expressible ops — driver then records a
    rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = " ".join(oracle.split())
        return fn

    return deco


# Import for side effects: each module registers its queries.
from magicxml_spark.queries import relational  # noqa: E402,F401
from magicxml_spark.queries import scalar  # noqa: E402,F401
from magicxml_spark.queries import hierarchy  # noqa: E402,F401
from magicxml_spark.queries import analytics  # noqa: E402,F401
from magicxml_spark.queries import extensions  # noqa: E402,F401
from magicxml_spark.queries import pipeline  # noqa: E402,F401
from magicxml_spark.queries import multimodal  # noqa: E402,F401

# ---------------------------------------------------------------------------
# Driver-sample ordering. The verification driver samples a prefix of
# the registry (~50 entries), so iteration order decides which queries
# get a driver-recorded correctness row each round. Round-12 rotation
# (VERDICT r11 "Next #5"): the FORTY-SIX queries whose latest rows are
# r9 lead (computed from CORRECTNESS_r01..r11), then the queries new
# this round, then the r10-fresh block and the r11-fresh tail. After
# this round no latest row should be older than r10. Names missing
# from the list (future additions) append in registration order; the
# assertion keeps the list honest.
# ---------------------------------------------------------------------------

_DRIVER_SAMPLE_ORDER = [
    # --- r9-stale head (round-12 rotation: every latest-r9 row,
    # computed from CORRECTNESS_r01..r11) ---
    "q_asof_prev_purchase",
    "q_audio_near_dup",
    "q_badwords_filter",
    "q_bm25_index_query",
    "q_bm25_per_query",
    "q_bm25_topk",
    "q_bpe_tokenize",
    "q_c4_span_dedup",
    "q_category_path",
    "q_category_path_recursive",
    "q_chunk_documents",
    "q_collect_distinct",
    "q_counts",
    "q_cube",
    "q_curation_v4",
    "q_dedup_clusters",
    "q_dense_ids",
    "q_dependency_parse",
    "q_dsir_model_score",
    "q_dsir_select",
    "q_events_stream_dedup",
    "q_events_stream_sessionize",
    "q_events_windowed",
    "q_histogram_quantiles",
    "q_justext_extract",
    "q_lm_snapshot_kn",
    "q_null_handling",
    "q_pack_sequences",
    "q_pack_sequences_text",
    "q_percentiles",
    "q_pivot",
    "q_price_pivot",
    "q_pricing_summary",
    "q_prune_profile",
    "q_rollup",
    "q_sanitize_name",
    "q_sessionize",
    "q_set_ops",
    "q_stream_cm_events",
    "q_stream_lm_score",
    "q_stream_minhash_pairs",
    "q_stream_winnow_pairs",
    "q_tfidf_pca",
    "q_topk_per_group",
    "q_union_lineage",
    "q_zorder_key",
    # --- new this round: fresh rows required (span probe last: its
    # sibling para probe + the in-suite gate cover the mechanism if
    # the ~50 window cuts before it) ---
    "q_curation_v7",
    "q_bpe_model_apply",
    "q_bpe_bytes",
    "q_snapshot_paragraph_probe",
    "q_snapshot_span_probe",
    "q_lm_snapshot_probe",
    "q_bm25_index_probe",
    "q_stream_paragraph_curation",
    "q_curation_v8",
    "q_quality_paragraphs",
    # --- r10-fresh block (next-oldest; the ~50 window tail may reach
    # here) ---
    "q_5gram_surprisal",
    "q_bigram_surprisal",
    "q_bloom_prefilter",
    "q_bpe_train",
    "q_c4_clean",
    "q_chunk_text",
    "q_chunks_to_shards",
    "q_cm_heavy_hitters",
    "q_cm_union",
    "q_contamination",
    "q_corpus_filter",
    "q_corpus_shuffle",
    "q_cosine_topk",
    "q_cosine_topk_auto",
    "q_cosine_topk_int8",
    "q_cosine_topk_ivf",
    "q_cosine_topk_lsh",
    "q_csv_normalize",
    "q_curation_pipeline",
    "q_curation_v2",
    "q_curation_v5",
    "q_decimal_comma",
    "q_decontaminate",
    "q_dedup_delimited",
    "q_defaults",
    "q_embedding_near_dup",
    "q_embedding_quantize",
    "q_exact_dedup",
    "q_fineweb_quality",
    "q_image_near_dup",
    "q_incremental_dedup",
    "q_ivf_snapshot_search",
    "q_justext_multilang",
    "q_lang_id",
    "q_lsh_pairs_capped",
    "q_lsh_xxhash64_recall",
    "q_minhash_lsh_pairs",
    "q_paragraph_dedup",
    "q_repetition_profile",
    "q_simhash",
    "q_simhash_near_dup",
    "q_simhash_wide",
    "q_simhash_wide_near_dup",
    "q_size_strip",
    "q_snapshot_dedup",
    "q_stock_aggregate",
    "q_stream_paragraph_dedup",
    "q_text_profile",
    "q_video_near_dup",
    "q_winnow_pairs_capped",
    # --- r11-fresh tail (newest rows; sampled last) ---
    "q_curation_v3",
    "q_embedding_cluster_dedup",
    "q_events_stream_windowed",
    "q_flagship_revenue",
    "q_gopher_quality",
    "q_hash_split",
    "q_hll_distinct",
    "q_hll_union",
    "q_html_clean",
    "q_ivf_refit_plan",
    "q_jaccard_pairs",
    "q_json_props",
    "q_key_skew",
    "q_line_dedup",
    "q_lm_snapshot_score",
    "q_md5_user_hash",
    "q_mixture_weights",
    "q_moving_sum",
    "q_perplexity_buckets",
    "q_pii_luhn",
    "q_pii_scrub",
    "q_quality_classifier",
    "q_quota_sample",
    "q_range_join",
    "q_salted_agg",
    "q_session_window",
    "q_stratified_sample",
    "q_stream_hll_users",
    "q_stream_interval_join",
    "q_stream_interval_outer",
    "q_stream_interval_semi",
    "q_stream_simhash_wide_pairs",
    "q_substring_dedup",
    "q_tfidf_top_terms",
    "q_token_shards",
    "q_trigram_surprisal",
    "q_unigram_surprisal",
    "q_url_dedup",
    "q_winnow_fingerprint",
    "q_winnow_pairs",
    "q_normalize_text",
    "q_snapshot_paragraph_dedup",
    "q_snapshot_span_dedup",
    "q_curation_v6",
    "q_normalize_dedup",
    "q_lang_id_paragraphs",
    "q_5gram_kn",
    "q_ann_recall",
    "q_anti_join",
    "q_asof_join",
]

_missing = [n for n in _DRIVER_SAMPLE_ORDER if n not in QUERIES]
assert not _missing, f"driver sample order names unknown queries: {_missing}"
QUERIES = {
    **{n: QUERIES[n] for n in _DRIVER_SAMPLE_ORDER},
    **{n: f for n, f in QUERIES.items() if n not in _DRIVER_SAMPLE_ORDER},
}
