"""Runtime file pruning from join keys — dynamic partition/file pruning
for the Iceberg scan path.

Spark's own dynamic partition pruning (DPP) only fires on Hive-style
partition columns of a ``FileSourceScanExec``; our scan plans files from
Iceberg manifests *before* Catalyst sees anything, so DPP never applies.
This module recovers (and generalizes) it at the metadata layer: before
scanning a large fact table for a join, derive a predicate on the fact
join key from the (already filtered) dimension side and feed it to the
existing two-level manifest/file pruning (pruning.py, A2-A5).  The
reference has no equivalent — DataFusion's scan receives only static
filters (table.rs:281-293).

Scale rationale (the 100 TB shape):

- The dimension side of a selective star-join is small after its filter
  (e.g. ``nation = 'GERMANY'`` → 1 key; a month of dates → 31 keys).
  One bounded aggregation job computes (ndv, min, max); the distinct
  key *values* are collected only when ndv ≤ ``max_keys`` (default
  4,096 scalars — kilobytes on the driver, never the dim rows).
- IN-list keys prune at file granularity via column bounds; above the
  cap we degrade to the [min, max] interval, which still skips files
  for clustered/sorted fact layouts (the common case for time or id
  keys).  Either way pruning is conservative: a kept file that holds
  no matching key only costs IO, never correctness.
- The join itself then runs on the pruned scan; with ``broadcast=True``
  (the default — a dim that passed the key-collect cap is broadcast
  material by construction) the plan is scan → BroadcastHashJoin with
  zero shuffle of the fact side.

Only inner/semi joins may use this: for them the derived predicate is
implied by the join (fact rows whose key has no dim partner produce no
output), so even the row-level re-filter ``to_df`` applies is
semantics-preserving.  Outer joins would lose unmatched fact rows and
are rejected.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_iceberg_spark.iceberg.pruning import Pred
from datafusion_iceberg_spark.iceberg.table import IcebergTable

# Above this many distinct dim keys we stop collecting values and prune
# with the [min, max] interval instead.  4,096 scalars ≈ tens of KB on
# the driver — safe at any cluster size.
DEFAULT_MAX_KEYS = 4096

_RUNTIME_JOINS = {"inner", "semi", "leftsemi", "left_semi"}


def runtime_key_pred(
    dim: DataFrame,
    dim_key: str,
    fact_key: str,
    max_keys: int = DEFAULT_MAX_KEYS,
) -> Optional[Pred]:
    """Derive a fact-side pruning predicate from the dim side's keys.

    One aggregation job computes (ndv, min, max); a second bounded
    ``collect`` fetches the distinct keys only when ndv ≤ ``max_keys``.
    Returns ``("in", fact_key, keys)`` below the cap,
    ``("between", fact_key, lo, hi)`` above it, or ``None`` when the dim
    side is empty of non-null keys (caller may short-circuit: an inner
    join with an empty build side is empty).
    """
    kc = F.col(dim_key)
    row = dim.agg(
        F.count_distinct(kc).alias("ndv"),
        F.min(kc).alias("lo"),
        F.max(kc).alias("hi"),
    ).collect()[0]
    if row["ndv"] == 0:
        return None
    if row["ndv"] <= max_keys:
        keys = [
            r["k"]
            for r in dim.select(kc.alias("k")).where(kc.isNotNull()).distinct().collect()
        ]
        return ("in", fact_key, keys)
    return ("between", fact_key, row["lo"], row["hi"])


def runtime_pruned_join(
    spark: SparkSession,
    fact: IcebergTable,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    how: str = "inner",
    fact_filters: Optional[Pred] = None,
    max_keys: int = DEFAULT_MAX_KEYS,
    broadcast: bool = True,
    snapshot_id: Optional[int] = None,
) -> DataFrame:
    """Join an Iceberg fact table to a (filtered) dim DataFrame with
    metadata-level runtime file pruning on the fact side.

    The fact scan's file list is pruned by BOTH the static
    ``fact_filters`` and the runtime key predicate derived from ``dim``,
    so files whose key bounds cannot match any surviving dim key are
    never opened.  Inner/semi only (see module docstring).
    """
    if how not in _RUNTIME_JOINS:
        raise ValueError(
            f"runtime_pruned_join supports {sorted(_RUNTIME_JOINS)} joins, "
            f"not {how!r}: the derived key predicate would drop unmatched "
            "fact rows an outer join must keep"
        )
    key_pred = runtime_key_pred(dim, dim_key, fact_key, max_keys)
    if key_pred is None:
        # no non-null dim keys ⇒ inner/semi result is provably empty;
        # skip the fact scan entirely (zero files opened)
        empty = fact.to_df(spark, snapshot_id=snapshot_id).limit(0)
        if how == "inner":
            return empty.join(dim.limit(0), empty[fact_key] == dim[dim_key], how)
        return empty
    pred: Pred = (
        ("and", fact_filters, key_pred) if fact_filters is not None else key_pred
    )
    fact_df = fact.to_df(spark, filters=pred, snapshot_id=snapshot_id)
    build = F.broadcast(dim) if broadcast else dim
    return fact_df.join(build, fact_df[fact_key] == build[dim_key], how)


def pruned_file_count(
    fact: IcebergTable,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    max_keys: int = DEFAULT_MAX_KEYS,
) -> tuple[int, int]:
    """(files without runtime pred, files with) — for tests/diagnostics."""
    before = len(fact.files())
    pred = runtime_key_pred(dim, dim_key, fact_key, max_keys)
    after = 0 if pred is None else len(fact.files(pred))
    return before, after
