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

import re

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
# dict order and stops after a fixed budget (~50 rows per round).  Rounds 1-6
# hand-maintained a ``_PRIORITY`` list that had to be rotated every round and
# wasn't in r6 (VERDICT r6 "What's wrong" #2), so the 10 round-6 gates never
# got a driver row.  The front is now MECHANICAL: parse every
# ``CORRECTNESS_r*.json`` in the repo root at import and order
#
#   1. queries with NO green driver row in any recorded round (new gates
#      self-promote the round they are registered), then
#   2. everything else, least-recently-verified round first,
#
# tie-broken by module rank then registration order, so the driver budget
# always re-verifies the stalest surface and this class of miss can't recur.

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


def _row_is_green(row: dict) -> bool:
    """A driver row counts as verified when it errored nowhere, the row
    counts matched, and the value hash (when the query has an oracle)
    did not mismatch."""
    return (
        row.get("err") is None
        and bool(row.get("rows_match"))
        and row.get("hash_match") is not False
    )


def driver_history(root: Optional[str] = None) -> dict[str, int]:
    """Map query name -> latest round with a green ``CORRECTNESS_r*.json``
    row.  Names absent from the map have never been driver-verified."""
    import glob
    import json
    import os

    if root is None:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest: dict[str, int] = {}
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            if isinstance(row, dict) and _row_is_green(row):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def ordered_names() -> list[str]:
    """Query names for the driver window: never-driver-verified gates
    first, then least-recently-verified, stable on module rank and
    registration order within each tier."""
    history = driver_history()
    idx = {name: i for i, name in enumerate(QUERIES)}
    return sorted(
        QUERIES,
        key=lambda n: (
            history.get(n, 0),  # 0 = never green -> front of the window
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
    import datafusion_iceberg_spark.operators.scd  # noqa: F401
    import datafusion_iceberg_spark.operators.meta  # noqa: F401
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
