"""Registry self-consistency as a driver-visible gate (VERDICT r12 #8).

A refactor that drops a query's oracle (demoting it to the weaker
rows-only check) or leaves a stale name in the bench headline would
degrade the verification surface SILENTLY — every remaining gate stays
green.  This gate turns the invariants into data: it returns the
violation list, the oracle says that list is empty, and the driver's
hash comparison goes red the round the invariant breaks.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from datafusion_iceberg_spark.registry import ORACLES, QUERIES, register
from datafusion_iceberg_spark.session import local_df

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

# Queries ALLOWED to run under the driver's weaker rows-only check (no
# oracle).  Empty today — every registered gate carries a DuckDB oracle;
# a future genuinely non-SQL-expressible op must be listed HERE, by
# name, to pass this gate without one.
ROWS_ONLY_ALLOWED: frozenset[str] = frozenset()


def registry_violations() -> list[tuple[str, str]]:
    """(kind, name) pairs for every broken registry invariant."""
    out: list[tuple[str, str]] = []
    for name in sorted(QUERIES):
        if name not in ORACLES and name not in ROWS_ONLY_ALLOWED:
            out.append(("query_without_oracle", name))
    for name in sorted(ORACLES):
        if name not in QUERIES:
            out.append(("oracle_without_query", name))

    # every bench headline name must be a registered query (a renamed
    # gate would otherwise crash bench.py at driver time, or — worse — a
    # deleted one silently shrink the recorded surface).  bench.py lives
    # at the repo root, which is NOT guaranteed to be on sys.path (the
    # gate may run from another CWD or an installed package) — load it
    # by file path.
    try:
        import importlib.util

        _spec = importlib.util.spec_from_file_location(
            "bench", os.path.join(_REPO_ROOT, "bench.py")
        )
        bench = importlib.util.module_from_spec(_spec)
        _spec.loader.exec_module(bench)
        headline = list(bench.HEADLINE)
    except Exception:
        headline = []
        out.append(("bench_import_failed", "bench"))
    for name in headline:
        if name not in QUERIES:
            out.append(("bench_unregistered", name))

    # every name the last bench RECORDING reported must still be
    # registered (guards the recorded artifact, not just the source list)
    res_path = os.path.join(_REPO_ROOT, "bench_result.json")
    if os.path.exists(res_path):
        try:
            with open(res_path) as fh:
                recorded = json.load(fh).get("queries", {})
        except (OSError, ValueError):
            recorded = {}
            out.append(("bench_result_unreadable", "bench_result.json"))
        for name in sorted(recorded):
            if name not in QUERIES:
                out.append(("bench_result_unregistered", name))
    return out


_VIOLATION_SCHEMA = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("name", T.StringType()),
    ]
)


@register(
    "meta_registry_consistency",
    oracle="""
    SELECT CAST(NULL AS VARCHAR) AS kind, CAST(NULL AS VARCHAR) AS name
    WHERE 1 = 0
    """,
)
def meta_registry_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returns the registry-invariant violation list; the oracle pins it
    EMPTY, so any future refactor that drops an oracle, orphans one, or
    leaves a stale bench entry flips this gate red at the driver."""
    from datafusion_iceberg_spark import registry

    registry.load_all_modules()
    return local_df(spark, registry_violations(), _VIOLATION_SCHEMA)
