"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_revenue_forecast",
    "q10_returned_items",
    "q18_large_volume_customer",
    "q7_volume_shipping",
    "q19_disjunctive_revenue",
    "window_topk_per_group",
    "join_asof",
    "join_range_banded",
    "join_skew_salted",
    "agg_cube",
    "dedup_exact_hash",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "dedup_embedding_lsh",
    "iceberg_scan_agg",
    "sim_topk_bruteforce",
    "sim_ivf_topk",
    "text_token_frequencies",
    "json_from_json_agg",
    # round-5 additions: warehouse surface + training-pipeline ops
    "iceberg_meta_partitions",
    "iceberg_changelog_scan",
    "sample_stratified_exact",
    "text_decontaminate",
    "text_bm25_rank",
    # round-5 second half
    "text_repetition_filter",
    "sim_hybrid_rrf",
    "dedup_survivorship_policy",
    "text_unigram_surprise",
    "embed_kmeans",
    "pipeline_curation_funnel",
    # round-6 additions
    "dedup_segment_exact",
    "embed_pq_search",
    "iceberg_v2_sequence_scan",
    "iceberg_add_files_migrate",
    "iceberg_dv_delete_scan",
    "iceberg_mor_update_scan",
    "ts_gapfill_interpolate",
    # round-7 additions
    "iceberg_dv_foreign_scan",
    "iceberg_dv_rewrite_scan",
    "dedup_incremental_minhash",
    "iceberg_branch_write_scan",
    "stream_cdc_changelog",
    "iceberg_row_lineage_scan",
    "iceberg_lineage_changelog_scan",
    "iceberg_partition_stats_scan",
    "dedup_incremental_bloom",
    "iceberg_metadata_minmax",
    "iceberg_default_values_scan",
    # round-8 additions
    "iceberg_dv_compressed_scan",
    "iceberg_variant_scan",
    "iceberg_merge_cdc_apply_scan",
    "iceberg_rest_commit_scan",
    "iceberg_rest_txn_scan",
    "iceberg_upsert_eq_scan",
    "stream_upsert_eq",
    "iceberg_table_stats_scan",
    "dedup_semantic_cluster",
    "iceberg_runtime_pruned_join",
    "iceberg_scd2_apply_scan",
    "iceberg_timestamp_ns_scan",
    "text_cms_heavy_hitters",
    "sim_sq_topk",
    "sample_dsir_importance",
    "ts_ewma_features",
    # round-9 additions
    "iceberg_merge_schema_scan",
    "iceberg_rest_view_scan",
    "iceberg_namespace_ddl_scan",
    "iceberg_pyds_mor_scan",
    "stream_cdc_overwrite",
    "iceberg_dynamic_overwrite_scan",
    "iceberg_local_txn_scan",
    # round-10 additions
    "iceberg_mv_where_count_scan",
    "stream_cdc_lineage_overwrite",
    "iceberg_ds_projected_scan",
    "iceberg_pyds_rename_scan",
    # round-11 additions
    "cte_recursive_tree",
    "join_lateral_topk",
    "reshape_unpivot",
    "graph_pagerank_2iter",
    "text_zipf_slope",
    "iceberg_mv_avg_scan",
    "ts_resample_ohlc",
    "text_dup_ngram_mass",
    "corpus_shard_plan",
    "stream_rate_limited_tail",
    "fn_higher_order_bank",
    "stream_incremental_mv_pipeline",
    # round-12 additions
    "stream_available_now_drain",
    "iceberg_ds_sql_projected_scan",
    "iceberg_theta_stats_scan",
    "iceberg_foreign_kitchen_sink_scan",
    "sim_mmr_rerank",
    "fn_sql_udf_bank",
    "iceberg_mv_join_scan",
    "stream_join_left_outer",
    "agg_bitmap_distinct",
    "iceberg_sql_txn_scan",
    "iceberg_constraint_scan",
    "text_bigram_perplexity",
    "sample_soft_dedup_weights",
    "sim_matryoshka_truncated",
    "window_rolling_distinct_users",
    "iceberg_view_version_travel",
    "sample_epoch_shuffle_plan",
    "query_skyline_pareto",
    "join_string_similarity",
    "agg_grouping_markers",
    "agg_linear_regression",
    "ts_anomaly_zscore",
    "text_language_mix_entropy",
    # round-13 additions
    "iceberg_bucket_join_scan",
    "iceberg_orc_scan",
    "meta_registry_consistency",
    "dedup_bucketed_store_join",
    "stream_cdc_keyed_update_pairs",
    "iceberg_bucket_outer_join_scan",
    "sim_ivf_persisted_topk",
    "join_interval_overlap",
    "sample_weighted_no_replacement",
    # round-14 additions
    "iceberg_bucket_agg_scan",
    "iceberg_bucket_composite_join_scan",
    "iceberg_bucket_wide_join_scan",
    "iceberg_bucket_join_pruned_scan",
    "iceberg_keyed_changelog_scan",
    "sim_ivf_append_drift",
    "iceberg_bucket_anti_join_scan",
    "iceberg_bucket_distinct_scan",
    "iceberg_bucket_window_scan",
    "iceberg_bucket_merge_scan",
    "stream_bucket_merge_apply",
    "sim_ivf_recluster_report",
    "iceberg_avro_scan",
    "iceberg_identity_agg_scan",
    "iceberg_temporal_join_scan",
    "iceberg_truncate_join_scan",
    # round-15 additions
    "iceberg_spj_sql_join",
    "iceberg_spj_sql_agg",
    "iceberg_spj_sql_join_agg",
    "iceberg_spj_sql_distinct",
    "iceberg_spj_sql_time_travel",
    "dedup_exact_substring",
    "iceberg_bucket_agg_grouped_scan",
    "iceberg_bucket_chain_join_scan",
    "text_quality_classifier",
]


def main() -> None:
    # Quiet-host protocol (VERDICT r12 #6, r13 #6): recordings taken at
    # loadavg 3-5 smear totals 1.1-1.35x vs a quiet host, which reads as
    # a regression it isn't.  Wait (bounded — default raised 90 → 300 s
    # after the r13 wait twice timed out on a hot worktree) for the
    # 1-min load to settle below 2 before starting; if it never does,
    # proceed but stamp ``contended: true`` so the reader discounts the
    # recording instead of misreading it.  Only the START load gates:
    # once passes run, local[N] task threads inflate loadavg by design.
    settle_deadline = time.monotonic() + float(
        os.environ.get("SPARK_GRAFT_BENCH_SETTLE_S", "300")
    )
    while os.getloadavg()[0] >= 2.0 and time.monotonic() < settle_deadline:
        time.sleep(5)
    # Stamp the PRE-WARM-UP load: once the session starts, the warm-up
    # itself drives the 1-min load past 2 on any local[N] run — r13's
    # recordings read as "hot host" (start 3.35) when the host was
    # quiet and the load was self-inflicted.  This is the number the
    # settle loop gated on, so it is the honest ambient-contention stamp.
    load_start = os.getloadavg()[0]
    contended = load_start >= 2.0

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from datafusion_iceberg_spark import registry
    from datafusion_iceberg_spark.session import get_spark

    registry.load_all_modules()
    spark = get_spark("bench")

    # Warm-up, excluded from timings (steady-state cluster conditions):
    # JVM + codegen via one query, every input table's first-touch scan
    # (OS page cache), and the Python/Arrow worker pool (forked lazily on
    # the first Pandas-UDF task otherwise).
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from datafusion_iceberg_spark.session import cpus
    from datafusion_iceberg_spark.tables import TABLES, load_table

    @F.pandas_udf(T.LongType())
    def _warm(s):
        import numpy as np  # noqa: F401  (preload in every worker)

        return s

    # Pandas/Arrow first: loading the Python-runner classes floods the C2
    # queue (see session.py), so trigger it before the JVM-side warm-up,
    # which then doubles as settle time for the compiler.
    spark.range(cpus() * 4, numPartitions=cpus()).select(
        _warm("id")
    ).write.format("noop").mode("overwrite").save()
    registry.QUERIES["q6_revenue_forecast"](spark, sf_dir).collect()
    for t in TABLES:
        load_table(spark, sf_dir, t).write.format("noop").mode("overwrite").save()
    # build the iceberg fixture warehouse outside the timed passes (first
    # call materializes it; the benchmark measures the SCAN, not one-time
    # table creation)
    registry.QUERIES["iceberg_scan_agg"](spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()
    # same for the cdc warehouse (changelog benchmark measures the CDC
    # read, not the one-time 3-commit fixture build)
    registry.QUERIES["iceberg_changelog_scan"](spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()

    # Three full passes, min per query: steady-state latency.  The JVM JIT
    # recompiles codegen classes unpredictably after classloading events
    # (see session.py CICompilerCount note); a cold sample can be 5× the
    # settled time and measures the JIT, not the query.  Full passes —
    # rather than back-to-back repeats — give the compile queue a whole
    # pass worth of settle time; the first pass is effectively a rehearsal.
    timings: dict[str, float] = {}
    bench_start = time.perf_counter()
    # Soft wall-clock budget: finish the pass in flight but start no new
    # pass beyond it — a loaded host (this VM shows 10-30x jitter under
    # contention, PERF_NOTES.md) must degrade to fewer passes, not a
    # harness timeout with no output at all.  Scaled with the headline
    # count (VERDICT r15 #3: the fixed 420 s fit 138 queries x 3 passes
    # but silently degraded min-of-3 to min-of-1/2 once the set grew to
    # 147 under load): ~3.5 s/query covers three ~1.1 s/query passes
    # with slack.  n_passes below makes any remaining degradation loud.
    BUDGET_S = max(420.0, 3.5 * len(HEADLINE))
    n_passes = 0
    for _pass in range(3):
        if _pass > 0 and time.perf_counter() - bench_start > BUDGET_S:
            break
        for name in HEADLINE:
            fn = registry.QUERIES[name]
            t0 = time.perf_counter()
            # noop sink: full execution (scan→shuffle→operators), no driver
            # materialization skewing the measurement
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            if _pass == 0:
                # pass 0 is a rehearsal: it compiles every query's codegen
                # classes (the JIT storm lands here, not in the record);
                # recorded only as a fallback if the budget cuts later passes
                timings.setdefault(name, round(dt, 3))
            else:
                timings[name] = round(min(timings.get(name, dt), dt), 3)
        n_passes = _pass + 1

    total = round(sum(timings.values()), 3)
    # Host-contention stamp (VERDICT r11 #7): round-over-round totals have
    # smeared 1.1-1.35x purely with host loadavg; recording the 1-min load
    # at start and end lets the reader normalize a noisy recording instead
    # of misreading it as a regression.
    loadavg = [round(load_start, 2), round(os.getloadavg()[0], 2)]
    result = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "n_passes": n_passes,
        "loadavg": loadavg,
        "contended": contended,
        "sf": sf,
    }
    # Full result (with the complete per-query map) goes to a file; the
    # stdout contract line must stay under the driver's 2000-char tail
    # capture or `parsed` comes back null (BENCH_r08/r09).  Print a compact
    # line LAST: totals + the slowest handful, and a pointer to the file.
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_result.json"),
        "w",
    ) as fh:
        fh.write(json.dumps(result) + "\n")
    slowest = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:10]
    )
    compact = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": slowest,
        "n_queries": len(timings),
        "n_passes": n_passes,
        "loadavg": loadavg,
        "contended": contended,
        "queries_file": "bench_result.json",
        "sf": sf,
    }
    print(json.dumps(compact))


if __name__ == "__main__":
    main()
