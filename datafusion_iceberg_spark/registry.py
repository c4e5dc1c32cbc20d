"""Query registry: one named entry per implemented operator.

Each operator from SURVEY.md §2 registers a builder ``(spark, sf_dir) ->
DataFrame`` plus (when SQL-expressible) an equivalent ANSI-SQL string that
DuckDB can execute over the same parquet tables.  The driver hash-compares
the two at sf0.01; our local tests do the same at sf0.001.

Registration is decorator-based so the query and its oracle live side by
side at the definition site::

    @register("q1_pricing_summary", oracle=\"\"\"SELECT ...\"\"\")
    def q1(spark, sf_dir):
        ...
        return df
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query builder and (optionally) its DuckDB oracle SQL.

    Queries without an oracle get the driver's weaker rows-only check
    (reserved for genuinely non-SQL-expressible ops: approx sketches,
    stateful streaming, iterative algorithms).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle.strip()
        return fn

    return deco


# Driver-window ordering: the correctness driver walks ``queries()`` in
# dict order and stops after a fixed budget (50 rows per round).  The r5
# priority front-loads the queries whose code/oracle changed THIS round:
#   - agg_approx_count_distinct / agg_percentile_approx: the last two
#     no-oracle rows ever recorded (r1).  Restructured this round to emit
#     the exact value plus an in-query ``within_bound`` boolean, so they
#     finally get hash rows (VERDICT r4 item #1).
#   - iceberg_* new gates: equality deletes, partition-spec evolution,
#     nested-type writer, SQL time travel (VERDICT r4 items #3-#6).
# Everything else re-registers after, ranked by module.
_PRIORITY = [
    # -- changed/new this round: need fresh driver rows -----------------
    "iceberg_meta_partitions",
    "iceberg_meta_files_agg",
    "iceberg_meta_snapshots",
    "iceberg_ref_tag_scan",
    "iceberg_meta_refs",
    "iceberg_changelog_scan",
    "iceberg_metadata_count",
    "sample_hash_fraction",
    "sample_stratified_exact",
    "sample_mixture_weights",
    "text_decontaminate",
    "text_tfidf_topk",
    "text_bm25_rank",
    "embed_quantize_int8",
    "text_pack_sequences",
    "iceberg_orphan_cleanup",
    "iceberg_pyds_scan",
    "iceberg_wap_publish",
    "iceberg_zorder_scan",
    "dedup_connected_components",
    "profile_lineitem_columns",
    "iceberg_sql_dml_scan",
    "text_repetition_filter",
    "sim_hybrid_rrf",
    "stream_cdc_upsert",
    "iceberg_manifest_rewrite_scan",
    "dedup_survivorship_policy",
    "iceberg_pyds_write_scan",
    "text_unigram_surprise",
    "iceberg_incremental_mv",
    "embed_kmeans",
    "text_pmi_pairs",
    "text_boilerplate_spans",
    "pipeline_curation_funnel",
    "sample_train_val_test",
    "corpus_export_jsonl",
    "window_retention_cohorts",
    "agg_approx_count_distinct",
    "agg_percentile_approx",
    "iceberg_eq_delete_scan",
    "iceberg_spec_evolution_scan",
    "iceberg_nested_scan",
    "iceberg_sql_time_travel",
    # -- recent windows (hash-green at latest check; keep early) --------
    "agg_collect_sorted",
    "dedup_embedding_lsh",
    "sim_lsh_topk",
    "stream_sliding_window",
    "mm_decode_features",
    "mm_frame_sample",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "mm_embed_similarity_topk",
    "window_sliding_rows_frame",
    "window_range_frame",
    "window_ntile",
    "window_first_last_nth",
    "window_sessionization",
    "window_funnel_stages",
    "setop_union_all",
    "setop_union_distinct",
    "setop_intersect",
    "setop_intersect_all",
    "setop_except",
    "setop_except_all",
    "join_asof",
    "join_range_equi",
    "join_range_banded",
    "join_skew_salted",
    "stream_tumbling_window",
    "stream_session_window",
    "stream_filter_project",
    "stream_stream_interval_join",
    "stream_iceberg_sink",
    "stream_stateful_running_agg",
    "stream_dedup_stateful",
    "source_csv_roundtrip",
    "source_json_roundtrip",
    "source_orc_roundtrip",
    "source_binaryfile_scan",
    "source_avro_roundtrip",
    "json_extract_scalar",
    "json_from_json_agg",
    "json_conditional_stats",
    "json_map_bank",
    "fn_string_bank",
    "fn_regexp_bank",
    "fn_math_bank",
    "fn_datetime_bank",
    "fn_monthly_revenue",
    "fn_conditional_bank",
    "fn_array_bank",
    "fn_bitwise_bank",
    "udf_registered_sql",
    "udtf_posexplode_tokens",
    "q11_important_stock",
    "q21_sole_returnflag_supplier",
    "q22_dormant_customers",
    "agg_mode_min_by_max_by",
    "subquery_exists",
    "subquery_not_exists",
    "q12_priority_class_counts",
]
_PRIORITY_RANK = {n: i for i, n in enumerate(_PRIORITY)}

_MODULE_RANK = {
    "datafusion_iceberg_spark.iceberg.queries": 0,
    "datafusion_iceberg_spark.extensions.dedup": 1,
    "datafusion_iceberg_spark.extensions.similarity": 2,
    "datafusion_iceberg_spark.extensions.sampling": 3,
    "datafusion_iceberg_spark.extensions.text": 3,
    "datafusion_iceberg_spark.extensions.multimodal": 4,
    "datafusion_iceberg_spark.operators.windows": 5,
    "datafusion_iceberg_spark.operators.timeseries": 5,
    "datafusion_iceberg_spark.operators.setops": 6,
    "datafusion_iceberg_spark.operators.asof": 7,
    "datafusion_iceberg_spark.operators.skew": 8,
    "datafusion_iceberg_spark.streaming.windows": 9,
    "datafusion_iceberg_spark.streaming.stateful": 10,
    "datafusion_iceberg_spark.sources.formats": 11,
    "datafusion_iceberg_spark.functions.json_ops": 12,
    "datafusion_iceberg_spark.functions.scalar": 13,
    "datafusion_iceberg_spark.operators.relational": 14,
}


def ordered_names() -> list[str]:
    """Query names: explicit priority list first, then module rank,
    stable on registration order within each tier."""
    idx = {name: i for i, name in enumerate(QUERIES)}
    return sorted(
        QUERIES,
        key=lambda n: (
            _PRIORITY_RANK.get(n, len(_PRIORITY)),
            _MODULE_RANK.get(getattr(QUERIES[n], "__module__", ""), 99),
            idx[n],
        ),
    )


def load_all_modules() -> None:
    """Import every module that registers queries (idempotent)."""
    import datafusion_iceberg_spark.operators.relational  # noqa: F401
    import datafusion_iceberg_spark.operators.windows  # noqa: F401
    import datafusion_iceberg_spark.operators.timeseries  # noqa: F401
    import datafusion_iceberg_spark.operators.setops  # noqa: F401
    import datafusion_iceberg_spark.operators.asof  # noqa: F401
    import datafusion_iceberg_spark.operators.skew  # noqa: F401
    import datafusion_iceberg_spark.functions.scalar  # noqa: F401
    import datafusion_iceberg_spark.functions.json_ops  # noqa: F401
    import datafusion_iceberg_spark.extensions.dedup  # noqa: F401
    import datafusion_iceberg_spark.extensions.similarity  # noqa: F401
    import datafusion_iceberg_spark.extensions.sampling  # noqa: F401
    import datafusion_iceberg_spark.extensions.text  # noqa: F401
    import datafusion_iceberg_spark.extensions.multimodal  # noqa: F401
    import datafusion_iceberg_spark.iceberg.queries  # noqa: F401
    import datafusion_iceberg_spark.sources.formats  # noqa: F401
    import datafusion_iceberg_spark.streaming.windows  # noqa: F401
    import datafusion_iceberg_spark.streaming.stateful  # noqa: F401
