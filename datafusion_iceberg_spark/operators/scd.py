"""Slowly-changing-dimension Type 2 apply over Iceberg (batch CDC →
versioned dimension history).

The classic warehouse pattern the reference cannot express at all (its
tables are read-only): applying a batch of attribute updates to a
dimension table while PRESERVING history — the previous version of a
changed row is closed out (``valid_to`` stamped, ``is_current`` false)
and a new open version inserted, atomically.

Spark-first shape — ONE ``MERGE`` commit via the merge-key union trick:
a changed key contributes two source legs, one carrying the real key
(equi-matches the open target row → close-out UPDATE) and one carrying a
NULL merge key (equi-matches nothing → NOT MATCHED INSERT of the new
version).  Brand-new and re-activated keys ride the NULL leg only.  The
whole apply is therefore a single atomic snapshot with the writer's
existing candidate-file pruning: only files whose key bounds overlap the
batch are rewritten (writer.py::merge), untouched files ride along.

At 100 TB: the dim-side diff joins are key-equi (shuffle on the key, or
broadcast when the batch is small), the union trick at most doubles the
*batch* (never the table), and the MERGE itself prunes by the batch's
key span — a small CDC batch against a huge dimension touches only the
files it must.
"""

from __future__ import annotations

from functools import reduce
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_iceberg_spark.iceberg.writer import MergeClause
from datafusion_iceberg_spark.registry import register

_MERGE_KEY = "__scd2_merge_key"


def _latest_per_key(updates: DataFrame, key: str, effective: str) -> DataFrame:
    """Newest update per key (ties on ``effective`` are the caller's
    bug; ``max_by`` picks one deterministically only when the timestamp
    is unique per key — documented contract, matching intra-batch SCD2
    semantics: one new version per key per apply)."""
    others = [c for c in updates.columns if c != key]
    return updates.groupBy(key).agg(
        *[F.expr(f"max_by({c}, {effective})").alias(c) for c in others]
    )


def scd2_apply(
    cat,
    ident: str,
    spark: SparkSession,
    updates: DataFrame,
    key: str,
    tracked: list[str],
    effective: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_col: str = "is_current",
) -> int:
    """Apply one batch of updates SCD2-style; returns the snapshot id.

    ``updates`` carries ``key``, every ``tracked`` attribute, and the
    ``effective`` change timestamp.  Rows whose tracked attributes are
    null-safe-equal to the key's open version are no-ops; changed keys
    close the open version at ``effective`` and insert a new open one;
    keys with no open version (brand-new, or previously closed out)
    insert an open version without touching history.
    """
    table = cat.load(ident)
    dim_cols = [f.name for f in table.metadata.struct_type().fields]
    for c in (key, *tracked, valid_from, valid_to, current_col):
        if c not in dim_cols:
            raise ValueError(f"dimension column missing from {ident}: {c}")
    upd = _latest_per_key(
        updates.select(key, *tracked, effective), key, effective
    )

    open_rows = (
        table.to_df(spark, columns=[key, *tracked, current_col])
        .where(F.col(current_col))
        .drop(current_col)
    )
    # null-safe "any tracked attribute differs"
    diff = reduce(
        lambda a, b: a | b,
        [~F.col(f"u.{c}").eqNullSafe(F.col(f"o.{c}")) for c in tracked],
    )
    u, o = upd.alias("u"), open_rows.alias("o")
    on = F.col(f"u.{key}") == F.col(f"o.{key}")
    changed = u.join(o, on, "inner").where(diff).select("u.*")
    no_open = u.join(o, on, "left_anti")

    # union trick: real-key leg closes out, NULL-key leg inserts
    close_leg = changed.withColumn(_MERGE_KEY, F.col(key))
    insert_leg = changed.unionByName(no_open).withColumn(
        _MERGE_KEY, F.lit(None).cast(changed.schema[key].dataType)
    )
    source = close_leg.unionByName(insert_leg)

    vt_type = table.metadata.struct_type()[valid_to].dataType.simpleString()
    insert_cols = [key, *tracked, valid_from, valid_to, current_col]
    insert_values = [
        f"src.{key}",
        *[f"src.{c}" for c in tracked],
        f"src.{effective}",
        f"CAST(NULL AS {vt_type})",
        "true",
    ]
    clauses = [
        MergeClause(
            "matched",
            f"t.{current_col}",
            "update",
            assignments={
                valid_to: f"src.{effective}",
                current_col: "false",
            },
        ),
        MergeClause(
            "not_matched",
            None,
            "insert",
            insert_cols=insert_cols,
            insert_values=insert_values,
        ),
    ]
    # through the catalog (not a bare writer) so the mirror refreshes
    # and concurrent-commit re-planning applies
    return cat.merge_into(
        ident, spark, source, on=[(key, _MERGE_KEY)], clauses=clauses
    )


def scd2_current(table, spark: SparkSession, current_col: str = "is_current") -> DataFrame:
    """The dimension as of now (open versions only)."""
    return table.to_df(spark).where(F.col(current_col))


def scd2_as_of(
    table,
    spark: SparkSession,
    ts,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Point-in-time view: versions whose [valid_from, valid_to) span
    covers ``ts`` (an open version has NULL valid_to)."""
    c_from, c_to = F.col(valid_from), F.col(valid_to)
    return table.to_df(spark).where(
        (c_from <= F.lit(ts)) & (c_to.isNull() | (c_to > F.lit(ts)))
    )


def scd2_rebuild(
    cdc: DataFrame,
    key: str,
    tracked: list[str],
    effective: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """One-shot SCD2 BACKFILL from a full CDC log: per key ordered by
    ``effective``, consecutive duplicate attribute tuples compact away
    (null-safe LAG comparison — sound because a skipped row equals its
    predecessor, transitively the last kept row), each kept change opens
    a version at its timestamp and closes at the next change's.  Two
    per-key windows, no shuffle beyond the key — the batch path that
    seeds a dimension before :func:`scd2_apply` takes over
    incrementally.  Ties on (key, effective) are the caller's bug."""
    from pyspark.sql import Window as W

    w = W.partitionBy(key).orderBy(effective)
    lagged = cdc.select(key, *tracked, effective).select(
        "*",
        *[F.lag(c).over(w).alias(f"__prev_{c}") for c in tracked],
        F.lag(F.lit(1)).over(w).alias("__has_prev"),
    )
    changed = reduce(
        lambda a, b: a | b,
        [~F.col(c).eqNullSafe(F.col(f"__prev_{c}")) for c in tracked],
    )
    kept = lagged.where(F.col("__has_prev").isNull() | changed).select(
        key, *tracked, effective
    )
    w2 = W.partitionBy(key).orderBy(effective)
    nxt = F.lead(effective).over(w2)
    return kept.select(
        key,
        *tracked,
        F.col(effective).alias(valid_from),
        nxt.alias(valid_to),
        nxt.isNull().alias(current_col),
    )


@register(
    "scd2_rebuild_from_cdc",
    oracle="""
    WITH kept AS (
      SELECT * FROM (
        SELECT user_id, event_type, ts,
               LAG(event_type) OVER w AS pe, LAG(1) OVER w AS hp
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
      ) WHERE hp IS NULL OR pe IS DISTINCT FROM event_type
    )
    SELECT user_id, event_type,
           CAST(ts AS TIMESTAMP) AS valid_from,
           CAST(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts)
                AS TIMESTAMP) AS valid_to,
           (LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL)
               AS is_current
    FROM kept ORDER BY user_id, valid_from
    """,
)
def scd2_rebuild_from_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 backfill gate: the full events CDC log folds into each
    user's event_type version history in one shot (scd2_rebuild) — the
    seeding path before incremental ``scd2_apply`` takes over."""
    from datafusion_iceberg_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    out = scd2_rebuild(
        ev, key="user_id", tracked=["event_type"], effective="ts"
    )
    return out.select(
        "user_id",
        "event_type",
        F.col("valid_from").cast("timestamp").alias("valid_from"),
        F.col("valid_to").cast("timestamp").alias("valid_to"),
        "is_current",
    ).orderBy("user_id", "valid_from")
