"""Physical-plan auditing — the 100 TB design gate as code.

A query that returns correct rows through a pathological plan (cartesian
blowup, unbroadcast dimension, unpruned scan) passes every value oracle
and still melts a 1000-executor cluster; these helpers make plan shape a
testable property (used by tests/test_scale_patterns.py and the
all-queries sweep in tests/test_plan_audit.py).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_string(df: DataFrame) -> str:
    """The (initial adaptive) physical plan, without executing the query."""
    return df._jdf.queryExecution().executedPlan().toString()


def _count_global_windows(plan: str) -> int:
    """WindowExec nodes with an EMPTY partition spec — every row funnels
    through ONE task (Spark itself warns 'Moving all data to a single
    partition').  A ``Window`` line prints ``Window [exprs], [part],
    [order]``; the global form omits the partition group, leaving two
    top-level bracket groups instead of three (bracket-depth scan —
    expression text may nest brackets)."""
    n = 0
    for line in plan.splitlines():
        m = re.search(r"\bWindow (\[.*)$", line)
        if not m:
            continue
        depth = 0
        groups: list[str] = []
        for ch in m.group(1):
            if ch == "[":
                if depth == 0:
                    groups.append("")
                depth += 1
            if depth == 1 and groups:
                groups[-1] += ch
            if ch == "]":
                depth -= 1
        # three groups = [exprs], [partition], [order]: partitioned.
        # two groups where the trailing one is an ORDER spec (printed
        # with ASC/DESC NULLS markers) = ordered global window; two
        # groups with a bare attribute list = partitioned-unordered.
        if len(groups) >= 3:
            continue
        trailing = groups[-1] if len(groups) == 2 else ""
        if len(groups) < 2 or re.search(r"\b(ASC|DESC) NULLS", trailing):
            n += 1
    return n


def plan_summary(df: DataFrame) -> dict:
    plan = plan_string(df)
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    return {
        "cartesian": len(re.findall(r"CartesianProduct", plan)),
        "bnlj": len(re.findall(r"BroadcastNestedLoopJoin", plan)),
        "bhj": len(re.findall(r"BroadcastHashJoin", plan)),
        "smj": len(re.findall(r"SortMergeJoin", plan)),
        "shj": len(re.findall(r"ShuffledHashJoin", plan)),
        "exchanges": len(re.findall(r"Exchange ", plan)),
        "scans": len(re.findall(r"Scan parquet", plan)),
        "pushed_filter_scans": sum(1 for p in pushed if p.strip()),
        "global_window": _count_global_windows(plan),
    }


# Queries whose semantics legitimately need a nested-loop/cross product
# (theta joins, scalar-subquery broadcasts, intentional cross join,
# all-pairs similarity with a broadcast query side).
NESTED_LOOP_OK = frozenset(
    {
        "join_cross",
        "join_non_equi",
        "sim_topk_bruteforce",
        "sim_ivf_topk",
        # probe-building leg only: 5-row query set x 16-row broadcast
        # centroid table (the corpus-sized list scan is a partition-
        # pruned equi-join on cent_id, never a nested loop)
        "sim_ivf_persisted_topk",
        # int8-code search: corpus x (5-row broadcast query set) theta
        # join, the same bounded-build-side class as sim_topk_bruteforce
        "sim_sq_topk",
        # 1-row token-totals broadcast (constant-attach)
        "sample_dsir_importance",
        # ADC scan + exact-check leg: both are corpus x (5-row broadcast
        # query set) theta joins, the same bounded-build-side class as
        # sim_topk_bruteforce
        "embed_pq_search",
        "sim_pairwise_threshold",
        "mm_embed_similarity_topk",
        "subquery_scalar",
        "subquery_correlated_scalar",
        # single-row global-stats broadcasts (n_docs/total_tok): a BNLJ
        # against a 1-row build side is a constant-attach, not a scan blowup
        "text_bm25_rank",
        "q15_top_supplier",
        "q22_dormant_customers",
        # hybrid retrieval: 1-row query-vector broadcast + 1-row global
        # stats broadcast, same constant-attach class as the above
        "sim_hybrid_rrf",
        # 1-row vocab-total broadcast (constant-attach)
        "text_unigram_surprise",
        # 1-row vocabulary-size broadcast (constant-attach; appears
        # twice because the scored frame feeds both the top-20 cut and
        # the final projection)
        "text_bigram_perplexity",
        # 1-row total-row-count broadcast for the NTILE bucket arithmetic
        "window_ntile",
        # 1-row bigram-total broadcast (constant-attach)
        "text_pmi_pairs",
        # 1-row exact-count frame x 1-row fused-sketch frame: both sides
        # are global aggregates, the BNLJ attaches two constants
        "agg_hll_sketch_union",
        "iceberg_sketch_rollup_scan",
        # MMR re-rank: relevance stage is corpus x (5-row broadcast query
        # set) theta join — the sim_topk_bruteforce bounded-build-side
        # class; the pair stage and greedy loop are query-local over the
        # 20-candidate shortlist, never corpus-sized
        "sim_mmr_rerank",
        # both legs are corpus x (5-row broadcast query set) theta joins
        # (the sim_topk_bruteforce class); the prefix leg moves 1/4 the
        # vector bytes
        "sim_matryoshka_truncated",
        # 1-row n_unique broadcast (constant-attach)
        "sample_soft_dedup_weights",
        # 3-row epoch-list broadcast (the deliberate corpus x epochs
        # expansion; epoch count is a training config, never data-sized)
        "sample_epoch_shuffle_plan",
    }
)


# Queries whose global (no-partition) WindowExec runs over a frame that
# is TINY BY CONSTRUCTION — one row per value-chunk, or rows already cut
# by a limit — never over per-row corpus data.  Anything else with an
# empty partition spec funnels the full input through one task at 100 TB
# and is a violation.
GLOBAL_WINDOW_OK: dict[str, str] = {
    "text_pack_sequences": "cumsum over per-chunk totals (rows/1000 frame)",
    "window_ntile": "cumsum over per-value-chunk counts (tiny offsets frame)",
    "sim_hybrid_rrf": "rank windows over the two <=50-row post-limit legs",
    "sample_temperature_mixture": (
        "normalizing sum over ONE ROW PER SOURCE DOMAIN (tens of rows at "
        "any corpus size; the per-doc scan is aggregated before the window)"
    ),
    "text_zipf_slope": (
        "row_number over the 100-row TopK output (limit cuts before the "
        "window; the vocabulary agg is partial-combined upstream)"
    ),
}


def audit_query(name: str, df: DataFrame) -> list[str]:
    """Return a list of plan-shape violations (empty = clean)."""
    s = plan_summary(df)
    problems = []
    if s["cartesian"]:
        problems.append(f"CartesianProduct x{s['cartesian']}")
    if s["bnlj"] and name not in NESTED_LOOP_OK:
        problems.append(f"BroadcastNestedLoopJoin x{s['bnlj']}")
    if s["global_window"] and name not in GLOBAL_WINDOW_OK:
        problems.append(f"global WindowExec x{s['global_window']}")
    return problems
