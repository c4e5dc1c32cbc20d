"""Incremental aggregate materialized views over Iceberg tables.

A classic warehouse capability the reference lacks entirely: a
SUM/COUNT-per-group rollup stored as its own Iceberg table, maintained
by applying the source's row-level CHANGELOG (``table.changelog_df``)
instead of recomputing the aggregate — cost per refresh is proportional
to the CHANGED rows since the last refresh, not the source size, which
is the whole point at 100 TB (a day of appends touches a day of data).

Mechanics:

- the MV table stores ``<group cols...>, sum_micros BIGINT, cnt BIGINT``
  — the measure is kept as exact fixed-point micros (the repo's money
  rule) so delta application is integer arithmetic, associative and
  engine-portable;
- refresh reads ``changelog_df(from=last_refreshed, to=current]``,
  signs each row (+1 insert / −1 delete), pre-aggregates the deltas
  (one shuffle over changed rows), and MERGEs them into the MV on the
  composite group key (writer.merge now supports composite ON);
- groups whose ``cnt`` reaches 0 are deleted;
- the refreshed-through snapshot id is recorded in the MV's table
  properties (``mv.source-snapshot-id``).

Consistency (r9 hardening): a refresh is ONE atomic commit — the MERGE
folds the zero-trim in as a conditional ``WHEN MATCHED AND t.cnt +
src.cnt = 0 THEN DELETE`` clause (net-zero NEW groups are skipped by a
conditional insert), and the refreshed-through snapshot id is stamped in
that MERGE snapshot's own summary (``mv.source-snapshot-id``).  A crash
leaves either the old state or the fully-applied new state; re-running
reads the marker from the snapshot summaries (falling back to the
creation-time table property), so the window can never double-apply.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def create_aggregate_mv(
    cat,
    spark: SparkSession,
    mv_ident: str,
    source_ident: str,
    group_cols: list,
    value_col: str,
    refresh: bool = True,
) -> Optional[dict]:
    """Create (and optionally immediately refresh) a SUM/COUNT MV."""
    src_meta = cat.load(source_ident).metadata
    by_name = {f.name: f for f in src_meta.struct_type().fields}
    missing = [c for c in list(group_cols) + [value_col] if c not in by_name]
    if missing:
        raise ValueError(f"MV columns not in source schema: {missing}")
    fields = [
        T.StructField(c, by_name[c].dataType, True) for c in group_cols
    ] + [
        T.StructField("sum_micros", T.LongType(), True),
        T.StructField("cnt", T.LongType(), True),
    ]
    cat.create_table(
        mv_ident,
        T.StructType(fields),
        properties={
            "mv.source": source_ident,
            "mv.group-cols": ",".join(group_cols),
            "mv.value-col": value_col,
            "mv.source-snapshot-id": "-1",
        },
    )
    if refresh:
        return refresh_aggregate_mv(cat, spark, mv_ident)
    return None


def _refreshed_through(mv_meta, src_meta) -> int:
    """The SOURCE snapshot id the MV has applied through: candidates are
    every MERGE snapshot summary carrying ``mv.source-snapshot-id`` (the
    atomic r9 marker) plus the table property (creation default -1;
    re-stamped only on no-op refreshes).  Recency is decided by the
    marker's position in the SOURCE's own history (ordinals) — a stale
    property can never shadow a newer merge marker or vice versa.
    Markers whose snapshot has been expired from the source are ignored
    (the next refresh replays from the newest surviving marker, and
    delta application is idempotent per window)."""
    candidates = []
    for s in mv_meta.raw.get("snapshots", []):
        v = (s.get("summary") or {}).get("mv.source-snapshot-id")
        if v is not None:
            candidates.append(int(v))
    prop = mv_meta.properties.get("mv.source-snapshot-id")
    if prop is not None and int(prop) != -1:
        candidates.append(int(prop))
    ords = src_meta.snapshot_ordinals()
    live = [c for c in candidates if c in ords]
    if not live:
        if candidates:
            # every marker predates the source's retained history: a
            # silent -1 would REPLAY the full changelog over existing
            # MV state (double-apply) — refuse loudly instead
            raise ValueError(
                "MV refresh markers all reference expired source "
                f"snapshots ({sorted(set(candidates))}); the delta "
                "window is unrecoverable — rebuild the MV (drop + "
                "create_aggregate_mv)"
            )
        return -1
    return max(live, key=lambda c: ords[c])


def refresh_aggregate_mv(cat, spark: SparkSession, mv_ident: str) -> dict:
    """Apply the source changelog since the last refresh.  Returns
    {"applied_rows", "from_snapshot", "to_snapshot"} (no-op when the
    source has not advanced)."""
    mv_meta = cat.load(mv_ident).metadata
    props = mv_meta.properties
    source_ident = props["mv.source"]
    group_cols = props["mv.group-cols"].split(",")
    value_col = props["mv.value-col"]
    src_rel = cat.load(source_ident)
    last = _refreshed_through(mv_meta, src_rel.metadata)
    src = src_rel
    cur = src.metadata.current_snapshot_id
    if cur is None or cur == last:
        return {"applied_rows": 0, "from_snapshot": last, "to_snapshot": cur}

    log = src.changelog_df(
        spark, from_snapshot_id=(last if last != -1 else None)
    )
    sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
        F.lit(-1)
    )
    micros = (
        F.floor(F.col(value_col) * 1000000 + 0.5).cast("long")
        if isinstance(
            src.metadata.struct_type()[value_col].dataType,
            (T.DoubleType, T.FloatType),
        )
        else F.col(value_col).cast("long") * 1000000
    )
    deltas = (
        log.groupBy(*group_cols)
        .agg(
            F.sum(sign * micros).alias("sum_micros"),
            F.sum(sign).alias("d_cnt"),
        )
        .select(
            *group_cols,
            F.col("sum_micros").cast("long").alias("sum_micros"),
            F.col("d_cnt").cast("long").alias("cnt"),
        )
    )
    deltas = deltas.cache()  # one changelog scan feeds count AND merge
    applied = deltas.count()
    if applied:
        from datafusion_iceberg_spark.iceberg.writer import MergeClause

        # ONE commit: conditional zero-trim rides the MERGE as a clause,
        # net-zero NEW groups skip the insert, and the refreshed-through
        # marker stamps the snapshot summary itself — atomic, idempotent
        cat.merge_into(
            mv_ident,
            spark,
            deltas,
            group_cols if len(group_cols) > 1 else group_cols[0],
            clauses=[
                MergeClause(
                    "matched", "t.cnt + src.cnt = 0", "delete"
                ),
                MergeClause(
                    "matched",
                    None,
                    "update",
                    assignments={
                        "sum_micros": "t.sum_micros + src.sum_micros",
                        "cnt": "t.cnt + src.cnt",
                    },
                ),
                MergeClause("not_matched", "src.cnt <> 0", "insert"),
            ],
            extra_summary={"mv.source-snapshot-id": str(cur)},
        )
    else:
        # source advanced with no logical change (e.g. replace-only
        # snapshots): nothing to apply, so a property stamp is safe
        cat.set_properties(mv_ident, {"mv.source-snapshot-id": str(cur)})
    deltas.unpersist()
    return {"applied_rows": applied, "from_snapshot": last, "to_snapshot": cur}


def mv_df(cat, spark: SparkSession, mv_ident: str) -> DataFrame:
    """The MV contents with the measure rescaled back to its unit."""
    df = cat.load(mv_ident).to_df(spark)
    return df.withColumn(
        "total", (F.col("sum_micros").cast("double") / 1000000)
    )
