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
        # 1-row bigram-total broadcast (constant-attach)
        "text_pmi_pairs",
    }
)


def audit_query(name: str, df: DataFrame) -> list[str]:
    """Return a list of plan-shape violations (empty = clean)."""
    s = plan_summary(df)
    problems = []
    if s["cartesian"]:
        problems.append(f"CartesianProduct x{s['cartesian']}")
    if s["bnlj"] and name not in NESTED_LOOP_OK:
        problems.append(f"BroadcastNestedLoopJoin x{s['bnlj']}")
    return problems
