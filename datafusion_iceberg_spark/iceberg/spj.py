"""Storage-partitioned joins (SPJ) over bucket-partitioned Iceberg tables.

The single largest avoidable shuffle at 100 TB is a fact-to-fact equi-join
of two tables that are ALREADY co-partitioned on the join key by an Iceberg
``bucket[N]`` partition spec: a plain ``df_a.join(df_b, key)`` hash-shuffles
both full tables even though every matching pair of rows is guaranteed to
live in the same bucket.  The reference feeds partition-grouped scan units
into DataFusion's partitioned execution for exactly this reason
(``datafusion_iceberg/src/table.rs:128-131`` groups data files by partition
value before building the physical plan); Spark's own Iceberg integration
exposes the same contract through DSv2 ``SupportsReportPartitioning``
("storage-partitioned join", SPARK-37375).

PySpark's Python-level APIs cannot report a partitioning contract to
Catalyst, so this module builds the SPJ plan explicitly from table
metadata the planner already holds:

    for each bucket b in range(coarse):
        scan LEFT's  bucket-b data files   (|L| / N bytes, no shuffle)
        scan RIGHT's bucket-b data files   (|R| / M bytes, no shuffle)
        BroadcastHashJoin the smaller side ( min(|L|,|R|) / coarse bytes)
    UNION ALL the per-bucket joins

The union of per-bucket broadcast joins contains ZERO shuffle Exchange on
the join keys: total bytes scanned equal one full scan of each side (each
file appears in exactly one bucket group), and the only data movement is
the per-bucket broadcast of the smaller side — ``min(|L|,|R|) / coarse``
bytes per task, which the table owner sizes via N at write time (a 1 TB
signature store bucketed 4096 ways broadcasts 250 MB per bucket).  A bucket
whose smaller side still exceeds ``max_broadcast_bytes`` degrades to a
shuffle join FOR THAT BUCKET ONLY (file-size sums come from manifest
metadata, so the decision is free) — skew degrades one bucket, not the
plan.

Bucket compatibility follows the Iceberg spec's transform algebra: the
murmur3 bucket value is ``(hash & MAX_INT) % N``, so ``bucket[kN]`` values
reduce to ``bucket[N]`` values by ``% N`` — two specs are join-compatible
whenever one bucket count divides the other, and the finer side's groups
fold onto the coarser grid.

Correctness notes:
  * rows with NULL join keys land in the null-bucket partition and are
    excluded from every bucket group (no equi-join can match them);
    preserved sides of LEFT/RIGHT/FULL joins re-attach those files
    null-extended, along with buckets whose other side is empty — see
    ``bucket_join``'s docstring for the outer-join decompositions.
  * MOR deletes apply per bucket group through the same
    ``IcebergTable._scan_files`` path as a full scan (position deletes
    match by file path; equality deletes are a global key predicate and
    commute with partitioning).
  * exact filters are re-applied by ``_scan_files`` after pruning, so
    pushed predicates stay exact per the table-scan contract.
"""

from __future__ import annotations

import re

from typing import Any, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_iceberg_spark.iceberg.manifests import DataFile
from datafusion_iceberg_spark.iceberg.table import IcebergTable

_BUCKET_RE = re.compile(r"^bucket\[(\d+)\]$")

# Per-bucket broadcast ceiling.  Spark's own autoBroadcastJoinThreshold
# defaults to 10 MB because a broadcast ships to EVERY executor; here each
# bucket's broadcast ships once per task that joins that bucket, and the
# table owner chose N precisely to make |side| / N memory-resident, so the
# ceiling is generous.  Manifest file sizes are compressed bytes; the 8×
# headroom vs a typical 4 GiB task heap absorbs decode expansion.
DEFAULT_MAX_BROADCAST_BYTES = 512 << 20


class BucketJoinError(ValueError):
    """The two tables' partition specs do not admit a shuffle-free join."""


def bucket_partitioning(table: IcebergTable) -> dict[str, tuple[int, str]]:
    """Source-column name → (bucket count N, partition field name) for every
    ``bucket[N]`` field in the table's DEFAULT partition spec, resolved
    against the current schema so renames follow the field id."""
    meta = table.metadata
    out: dict[str, tuple[int, str]] = {}
    names = meta.partition_column_names()
    for col, pf in zip(names, meta.partition_fields):
        m = _BUCKET_RE.match(pf.transform)
        if m:
            out[col] = (int(m.group(1)), pf.name)
    return out


def _bucket_groups(
    table: IcebergTable,
    col: str,
    coarse: int,
    filters,
    spark: SparkSession,
    snapshot_id: Optional[int] = None,
) -> tuple[list[list[DataFile]], list[DataFile], str]:
    """Partition the (pruned) data-file list onto the coarse bucket grid.

    Returns ``coarse`` lists of files, the NULL-key files (partition
    value null — their rows can never equi-match, but outer joins must
    still preserve them), and the partition field name.  Files written
    under an evolved spec that lacks the bucket field have no
    co-location guarantee — refuse loudly rather than silently produce a
    wrong join."""
    meta = table.metadata
    spec = bucket_partitioning(table)
    if col not in spec:
        raise BucketJoinError(
            f"column {col!r} is not bucket-partitioned in the default spec "
            f"(bucketed columns: {sorted(spec)})"
        )
    if spec[col][0] % coarse != 0:
        raise BucketJoinError(
            f"bucket[{spec[col][0]}] on {col!r} does not fold onto a "
            f"{coarse}-bucket grid"
        )

    # Per-FILE spec resolution: a spec-evolved table mixes files written
    # under different specs, and only the file's OWN spec says how its
    # partition value folds.  A file under bucket[4] cannot fold onto an
    # 8-bucket grid (h%8 is not derivable from h%4) — checking only the
    # field NAME here would group such files by a wrong grid and the
    # join would silently drop matching rows, so each file's spec must
    # carry a bucket transform on the column with a count the coarse
    # grid divides.
    by_id = {f["id"]: f["name"] for f in meta.current_schema["fields"]}
    spec_cache: dict[int, Optional[tuple[int, str]]] = {}

    def _spec_bucket(spec_id: int) -> Optional[tuple[int, str]]:
        if spec_id not in spec_cache:
            fields = meta.partition_fields_for_spec(spec_id)
            ent = None
            for pf in fields or []:
                m = _BUCKET_RE.match(pf.transform)
                if m and by_id.get(pf.source_id) == col:
                    ent = (int(m.group(1)), pf.name)
                    break
            spec_cache[spec_id] = ent
        return spec_cache[spec_id]

    groups: list[list[DataFile]] = [[] for _ in range(coarse)]
    null_files: list[DataFile] = []
    for f in table.files(filters, snapshot_id=snapshot_id, spark=spark):
        ent = _spec_bucket(f.spec_id)
        if ent is None:
            raise BucketJoinError(
                f"data file {f.path} was written under spec {f.spec_id}, "
                f"which has no bucket transform on {col!r} — no "
                "co-location guarantee; rewrite old files or use a "
                "plain join"
            )
        n_f, pname_f = ent
        if n_f % coarse != 0:
            raise BucketJoinError(
                f"data file {f.path} was written under bucket[{n_f}], "
                f"which does not fold onto the {coarse}-bucket grid — "
                "rewrite old files or use a plain join"
            )
        if pname_f not in f.partition:
            raise BucketJoinError(
                f"data file {f.path} carries no partition value for "
                f"{pname_f!r} — rewrite old files or use a plain join"
            )
        b = f.partition[pname_f]
        if b is None:
            # null join key: unmatchable by any equi-join; preserved
            # sides of outer joins re-attach these null-extended
            null_files.append(f)
            continue
        groups[int(b) % coarse].append(f)
    return groups, null_files, spec[col][1]


def compatible_bucket_counts(
    left: IcebergTable, right: IcebergTable, left_on: str, right_on: str
) -> int:
    """The coarse (shared) bucket count, or raise ``BucketJoinError``."""
    lspec = bucket_partitioning(left)
    rspec = bucket_partitioning(right)
    if left_on not in lspec:
        raise BucketJoinError(
            f"left table is not bucket-partitioned on {left_on!r}"
        )
    if right_on not in rspec:
        raise BucketJoinError(
            f"right table is not bucket-partitioned on {right_on!r}"
        )
    n, m = lspec[left_on][0], rspec[right_on][0]
    coarse = min(n, m)
    if max(n, m) % coarse != 0:
        raise BucketJoinError(
            f"incompatible bucket counts: bucket[{n}] vs bucket[{m}] — "
            "neither divides the other, so bucket values do not fold onto "
            "a shared grid"
        )
    return coarse


def bucket_join(
    spark: SparkSession,
    left: IcebergTable,
    right: IcebergTable,
    left_on: str,
    right_on: Optional[str] = None,
    how: str = "inner",
    left_filters: Optional[Any] = None,
    right_filters: Optional[Any] = None,
    max_broadcast_bytes: int = DEFAULT_MAX_BROADCAST_BYTES,
    left_snapshot_id: Optional[int] = None,
    right_snapshot_id: Optional[int] = None,
) -> DataFrame:
    """Shuffle-free equi-join of two bucket-co-partitioned Iceberg tables.

    Returns the joined DataFrame (all left columns then all right columns,
    join key deduplicated when the names match) whose physical plan is a
    UNION of per-bucket joins with no shuffle Exchange on the join keys.

    ``how``: inner | left | right | full.  Outer flavors stay
    broadcast-only by DECOMPOSITION — Spark's BroadcastHashJoin cannot
    build on the preserved side, and supports no full-outer at all, so:

    * left  = per-bucket ``LEFT OUTER`` (right side broadcast) + the
      left NULL-key files null-extended + left buckets with no right
      files null-extended (no probe needed — nothing can match);
    * right = symmetric;
    * full  = per-bucket ``inner ∪ left-anti ∪ right-anti`` (each leg a
      BroadcastHashJoin; anti legs null-extended) + both sides'
      unmatched-by-construction files — each side is scanned twice in
      the anti decomposition, the price of keeping every leg
      broadcastable instead of shuffling per-bucket SortMergeJoins.
    """
    if how not in ("inner", "left", "right", "full"):
        raise BucketJoinError(
            f"bucket_join supports inner/left/right/full (got {how!r})"
        )
    right_on = right_on if right_on is not None else left_on
    coarse = compatible_bucket_counts(left, right, left_on, right_on)
    lgroups, lnull, _ = _bucket_groups(
        left, left_on, coarse, left_filters, spark, left_snapshot_id
    )
    rgroups, rnull, _ = _bucket_groups(
        right, right_on, coarse, right_filters, spark, right_snapshot_id
    )

    same_name = left_on == right_on
    keep_left = how in ("left", "full")
    keep_right = how in ("right", "full")
    # hoist the delete-file listing: _scan_files(deletes=None) would
    # re-read every delete manifest PER BUCKET GROUP (4x coarse Avro
    # reads on a 4096-bucket join); list once per table and pass down
    # snapshot-scoped: a pinned side masks with ITS snapshot's deletes,
    # exactly like to_df's time travel
    ldel = left.position_delete_files(left_snapshot_id)
    leq = left.equality_delete_files(left_snapshot_id)
    rdel = right.position_delete_files(right_snapshot_id)
    req = right.equality_delete_files(right_snapshot_id)

    def _scan_l(fl, filt):
        return left._scan_files(spark, fl, filt, deletes=ldel, eq_deletes=leq)

    def _scan_r(fl, filt):
        return right._scan_files(
            spark, fl, filt, deletes=rdel, eq_deletes=req
        )
    lfields = [
        f
        for f in left.metadata.struct_type().fields
        if not (same_name and f.name == left_on)
    ]
    rfields = [
        f
        for f in right.metadata.struct_type().fields
        if not (same_name and f.name == right_on)
    ]

    def _extend(df: DataFrame, other_fields) -> DataFrame:
        for f in other_fields:
            df = df.withColumn(f.name, F.lit(None).cast(f.dataType))
        return df

    def _cond(dfl, dfr):
        return [left_on] if same_name else dfl[left_on] == dfr[right_on]

    subs: list[DataFrame] = []
    for b in range(coarse):
        lf, rf = lgroups[b], rgroups[b]
        if lf and not rf:
            if keep_left:
                subs.append(_extend(_scan_l(lf, left_filters), rfields))
            continue
        if rf and not lf:
            if keep_right:
                subs.append(_extend(_scan_r(rf, right_filters), lfields))
            continue
        if not lf and not rf:
            continue
        dfl = _scan_l(lf, left_filters)
        dfr = _scan_r(rf, right_filters)
        lbytes = sum(f.file_size_in_bytes for f in lf)
        rbytes = sum(f.file_size_in_bytes for f in rf)
        small = min(lbytes, rbytes)
        fits = small <= max_broadcast_bytes
        if how == "inner":
            if fits:
                if rbytes <= lbytes:
                    dfr = F.broadcast(dfr)
                else:
                    dfl = F.broadcast(dfl)
            # else: leave unhinted — Catalyst shuffles THIS bucket only
            # (skew degrades one union branch, not the whole plan)
            subs.append(dfl.join(dfr, on=_cond(dfl, dfr), how="inner"))
        elif how == "left":
            # build side must be the non-preserved (right) side
            bdfr = F.broadcast(dfr) if rbytes <= max_broadcast_bytes else dfr
            subs.append(dfl.join(bdfr, on=_cond(dfl, bdfr), how="left"))
        elif how == "right":
            # build side must be the non-preserved (left) side
            bdfl = F.broadcast(dfl) if lbytes <= max_broadcast_bytes else dfl
            subs.append(bdfl.join(dfr, on=_cond(bdfl, dfr), how="right"))
        else:  # full: inner ∪ left-anti ∪ right-anti, every leg BHJ-able
            bl = F.broadcast(dfl) if lbytes <= max_broadcast_bytes else dfl
            br = F.broadcast(dfr) if rbytes <= max_broadcast_bytes else dfr
            if fits:
                inner = (
                    dfl.join(br, on=_cond(dfl, br), how="inner")
                    if rbytes <= lbytes
                    else bl.join(dfr, on=_cond(bl, dfr), how="inner")
                )
            else:
                inner = dfl.join(dfr, on=_cond(dfl, dfr), how="inner")
            subs.append(inner)
            subs.append(
                _extend(
                    dfl.join(br, on=_cond(dfl, br), how="left_anti"), rfields
                )
            )
            subs.append(
                _extend(
                    dfr.join(bl, on=_cond(bl, dfr), how="left_anti"), lfields
                )
            )
    if keep_left and lnull:
        subs.append(_extend(_scan_l(lnull, left_filters), rfields))
    if keep_right and rnull:
        subs.append(_extend(_scan_r(rnull, right_filters), lfields))
    if not subs:
        # no contributing buckets: empty frame with the joined schema
        dfl = left.to_df(spark).limit(0)
        dfr = right.to_df(spark).limit(0)
        return dfl.join(dfr, on=_cond(dfl, dfr), how="inner")
    out = subs[0]
    for s in subs[1:]:
        out = out.unionByName(s)
    return out


def catalog_bucket_join(
    catalog,
    spark: SparkSession,
    left_ident: str,
    right_ident: str,
    left_on: str,
    right_on: Optional[str] = None,
    how: str = "inner",
    fallback: bool = False,
    **kwargs,
) -> DataFrame:
    """Catalog-level entry: resolve ``ns.table`` identifiers and join
    shuffle-free when the specs allow.  With ``fallback=True`` an
    incompatible pair degrades to the plain (shuffling) DataFrame join
    instead of raising — the planner shape a query layer wants: SPJ when
    the storage contract holds, correct either way."""
    left = catalog.load(left_ident)
    right = catalog.load(right_ident)
    if not isinstance(left, IcebergTable) or not isinstance(
        right, IcebergTable
    ):
        raise BucketJoinError("bucket_join joins TABLES, not views")
    try:
        return bucket_join(
            spark, left, right, left_on, right_on, how=how, **kwargs
        )
    except BucketJoinError:
        if not fallback:
            raise
        r_on = right_on if right_on is not None else left_on
        dfl, dfr = left.to_df(spark), right.to_df(spark)
        if left_on == r_on:
            return dfl.join(dfr, on=[left_on], how=how)
        return dfl.join(dfr, on=dfl[left_on] == dfr[r_on], how=how)
