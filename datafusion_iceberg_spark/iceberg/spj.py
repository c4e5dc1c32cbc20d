"""Storage-partitioned joins and aggregation (SPJ) over bucket-partitioned
Iceberg tables.

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

    group each side's (pruned) data files by partition tuple
    pack the occupied tuples into <= max_branches branches (LPT bin-pack
        on the broadcast-side bytes, from manifest metadata -- free)
    for each branch:
        scan LEFT's  branch files   (no shuffle)
        scan RIGHT's branch files   (no shuffle)
        BroadcastHashJoin the smaller side
    UNION ALL the per-branch joins

The union contains ZERO shuffle Exchange on the join keys: total bytes
scanned equal one full scan of each side (each file appears in exactly one
partition group, each group in exactly one branch), and the only data
movement is the per-branch broadcast of the smaller side.  Packing multiple
groups into a branch is correctness-free: the partition tuple is a FUNCTION
of the join key, so rows from different groups can never equi-match -- a
branch-level join equals the union of its groups' joins.  Bounding the
branch count keeps the Catalyst plan small (a 4096-bucket table yields a
64-branch plan, not 4096 subtrees -- plan analysis at that width is a known
Catalyst cost cliff) at the price of a larger per-branch broadcast; the
LPT packing keeps branches within ~4/3 of the optimal load.

Composite keys (the common production layout, e.g. ``bucket(N, k)`` +
``identity(region)``): every key position must be partition-backed on both
sides.  The FULL transform algebra of Spark-Iceberg's
KeyGroupedPartitioning (SPARK-37375) is supported:

* ``bucket[N]`` positions fold onto the shared coarse grid (``bucket[kN]``
  values reduce to ``bucket[N]`` by ``% N``; compatible whenever one
  count divides the other);
* ``truncate[W]`` positions fold string/binary prefixes to the shorter
  width, and integer truncation to the coarser grid exactly when the
  finer width divides it;
* temporal positions (hour/day/month/year) fold finer onto coarser via
  calendar-exact epoch arithmetic (day(ts) joins month(ts));
* ``identity`` positions group by the exact partition value.

At least one position must carry a non-identity transform for
``bucket_join``; the per-key operators (``bucket_agg``/``bucket_apply``/
``bucket_distinct``) accept any single partition-backed key.

A branch whose smaller side exceeds ``max_broadcast_bytes`` degrades to a
shuffle join FOR THAT BRANCH ONLY (file-size sums come from manifest
metadata, so the decision is free) -- skew degrades one branch, not the
plan.

Correctness notes:
  * rows with NULL in any join-key position land in a null partition and
    are excluded from every branch (no equi-join can match them);
    preserved sides of LEFT/RIGHT/FULL joins re-attach those files
    null-extended, along with branch sides whose other side is empty --
    see ``bucket_join``'s docstring for the outer-join decompositions.
  * MOR deletes apply per branch through the same
    ``IcebergTable._scan_files`` path as a full scan (position deletes
    match by file path; equality deletes are a global key predicate and
    commute with partitioning).
  * exact filters are re-applied by ``_scan_files`` after pruning, so
    pushed predicates stay exact per the table-scan contract.

``bucket_agg`` extends the same elision to the other big shuffle: a
``groupBy`` whose keys INCLUDE the bucket source column needs no final
Exchange -- each bucket holds every row for its keys, so a branch read as
ONE partition aggregates its keys completely.  ``coalesce(1)`` makes the
branch report ``SinglePartition``, which satisfies the aggregation's
ClusteredDistribution, and Catalyst plans partial+final HashAggregate
back-to-back with no Exchange (the plan real SPJ aggregation produces via
KeyGroupedPartitioning, SPARK-32709).
"""

from __future__ import annotations

import heapq
import os
import re

from typing import Any, Optional, Sequence, Union

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_iceberg_spark.iceberg.manifests import DataFile
from datafusion_iceberg_spark.iceberg.table import IcebergTable

_BUCKET_RE = re.compile(r"^bucket\[(\d+)\]$")
_TRUNC_RE = re.compile(r"^truncate\[(\d+)\]$")

# Per-branch broadcast ceiling.  Spark's own autoBroadcastJoinThreshold
# defaults to 10 MB because a broadcast ships to EVERY executor; here each
# branch's broadcast ships once per task that joins that branch, and the
# table owner chose N precisely to make |side| / N memory-resident, so the
# ceiling is generous.  Manifest file sizes are compressed bytes; the 8x
# headroom vs a typical 4 GiB task heap absorbs decode expansion.
DEFAULT_MAX_BROADCAST_BYTES = 512 << 20

# Plan-width ceiling: the union is capped at this many branches however
# many buckets the table has.  64 branches saturate a 64-slot stage while
# keeping the Catalyst tree and the number of broadcast stages bounded;
# raise it when the per-branch broadcast (|small side| / branches) must
# shrink below max_broadcast_bytes.
DEFAULT_MAX_BRANCHES = 64

KeySpec = Union[str, Sequence[str]]

# Driver threads used to BUILD branch subtrees concurrently.  Each branch
# costs ~30 ms of py4j round-trips + JVM-side FileIndex construction
# (PERF_NOTES r15) and branches are independent plans, so construction
# parallelizes across driver threads (py4j opens one JVM connection per
# Python thread; Dataset construction is thread-safe).  Measured on the
# 32-branch wide-join gate (min of 3, sf0.1): build 2.36 s serial →
# 1.24 s at 16 threads (the knee; 32 is flat — the residue is a JVM-side
# lock, not Python).  Scale-independent (driver planning cost, not
# data): the same default is right on a cluster.
# SPARK_GRAFT_PLAN_THREADS=1 restores serial.
PLAN_THREADS = max(1, int(os.environ.get("SPARK_GRAFT_PLAN_THREADS", "16")))


def _parallel_branches(build_one, branches: Sequence) -> list:
    """Run ``build_one(branch) -> list[DataFrame]`` over every branch,
    concurrently when it pays, and return the flattened results in
    BRANCH ORDER (the union shape stays deterministic).  Exceptions
    propagate exactly as in the serial loop."""
    if len(branches) <= 1 or PLAN_THREADS <= 1:
        nested = [build_one(b) for b in branches]
    else:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(
            max_workers=min(PLAN_THREADS, len(branches))
        ) as pool:
            nested = list(pool.map(build_one, branches))
    return [df for sub in nested for df in sub]


class BucketJoinError(ValueError):
    """The two tables' partition specs do not admit a shuffle-free join."""


def identity_partitioning(table: IcebergTable) -> dict[str, str]:
    """Source-column name → partition field name for every ``identity``
    field in the DEFAULT spec (the other partition-backed key kind —
    a date- or region-partitioned table co-locates those keys exactly
    like a bucketed one co-locates hashes)."""
    meta = table.metadata
    out: dict[str, str] = {}
    for col, pf in zip(meta.partition_column_names(), meta.partition_fields):
        if pf.transform == "identity":
            out[col] = pf.name
    return out


def _partition_backed_key(table: IcebergTable, cols) -> tuple[str, tuple]:
    """(key column, kind descriptor) for the first partition-backed
    column among ``cols`` — bucket preferred (bounded group count),
    identity accepted (date/region layouts) — or raise."""
    bspec = bucket_partitioning(table)
    ispec = identity_partitioning(table)
    bcol = next((c for c in cols if c in bspec), None)
    if bcol is not None:
        return bcol, ("bucket", bspec[bcol][0])
    icol = next((c for c in cols if c in ispec), None)
    if icol is not None:
        return icol, ("identity",)
    # temporal and truncate transforms are FUNCTIONS of the key: all
    # rows for one key value live in one partition, so per-key operators
    # over them are branch-local too (groupBy(ts) on a day(ts) layout)
    tspec = temporal_partitioning(table)
    tcol = next((c for c in cols if c in tspec), None)
    if tcol is not None:
        g = tspec[tcol][0]
        return tcol, ("temporal", g)
    trspec = truncate_partitioning(table)
    rcol = next((c for c in cols if c in trspec), None)
    if rcol is not None:
        t = _col_iceberg_type(table, rcol) or ""
        return rcol, ("truncate", trspec[rcol][0], t in ("int", "long"))
    raise BucketJoinError(
        f"no column of {list(cols)} is bucket- or identity-partitioned "
        "(nor temporal/truncate-transformed) "
        f"(bucketed: {sorted(bspec)}, identity: {sorted(ispec)}) — the "
        "key must determine the partition for a shuffle-free operator"
    )


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


# Temporal transforms are monotonic functions of the key: equal keys
# share a partition value, and the hierarchy folds finer → coarser
# (hour → day → month → year), so two specs are join-compatible whenever
# one's granularity contains the other's.
_TEMPORAL_RANK = {"hour": 0, "day": 1, "month": 2, "year": 3}


def _temporal_fold(value: int, src: str, dst: str) -> int:
    """Fold a temporal partition value from granularity ``src`` onto the
    coarser ``dst`` grid (identity when equal).  Domains per the spec:
    hours/days/months/years from epoch."""
    if src == dst:
        return int(value)
    v = int(value)
    if src == "hour":
        v = v // 24  # python // floors, matching the epoch-day domain
        src = "day"
        if src == dst:
            return v
    if src == "day":
        from datetime import date, timedelta

        d = date(1970, 1, 1) + timedelta(days=v)
        v = (d.year - 1970) * 12 + d.month - 1
        src = "month"
        if src == dst:
            return v
    if src == "month":
        v = v // 12  # floor: month -24..-13 → year -2
        src = "year"
        if src == dst:
            return v
    raise BucketJoinError(f"cannot fold {src} onto {dst}")


def temporal_partitioning(table: IcebergTable) -> dict[str, tuple[str, str]]:
    """Source-column name → (transform name, partition field name) for
    every hour/day/month/year field in the DEFAULT spec."""
    meta = table.metadata
    out: dict[str, tuple[str, str]] = {}
    for col, pf in zip(meta.partition_column_names(), meta.partition_fields):
        if pf.transform in _TEMPORAL_RANK:
            out[col] = (pf.transform, pf.name)
    return out


def truncate_partitioning(table: IcebergTable) -> dict[str, tuple[int, str]]:
    """Source-column name → (width W, partition field name) for every
    ``truncate[W]`` field in the DEFAULT spec."""
    meta = table.metadata
    out: dict[str, tuple[int, str]] = {}
    for col, pf in zip(meta.partition_column_names(), meta.partition_fields):
        m = _TRUNC_RE.match(pf.transform)
        if m:
            out[col] = (int(m.group(1)), pf.name)
    return out


def _col_iceberg_type(table: IcebergTable, col: str) -> Optional[str]:
    meta = table.metadata
    fid = meta.field_ids_by_name().get(col)
    t = meta.types_by_field_id().get(fid)
    return t if isinstance(t, str) else None


def _as_cols(on: KeySpec, side: str) -> list[str]:
    if isinstance(on, str):
        return [on]
    cols = list(on)
    if not cols:
        raise BucketJoinError(f"empty {side} join-key list")
    return cols


def compatible_partitioning(
    left: IcebergTable,
    right: IcebergTable,
    left_cols: list[str],
    right_cols: list[str],
) -> list[tuple]:
    """Per-position partitioning contract for a composite SPJ key.

    Returns one descriptor per key position: ``("bucket", coarse)`` when
    both sides carry ``bucket[..]`` on that column (coarse = the shared
    grid both counts fold onto), ``("identity",)`` when neither does
    (verified identity-partitioned per FILE later).  Raises
    :class:`BucketJoinError` on incompatible counts, on a position
    bucketed on one side only, or when no position is bucketed at all.
    """
    if len(left_cols) != len(right_cols):
        raise BucketJoinError(
            f"join-key arity mismatch: {left_cols} vs {right_cols}"
        )
    lspec = bucket_partitioning(left)
    rspec = bucket_partitioning(right)
    ltr = truncate_partitioning(left)
    rtr = truncate_partitioning(right)
    ltm = temporal_partitioning(left)
    rtm = temporal_partitioning(right)
    kinds: list[tuple] = []
    for lc, rc in zip(left_cols, right_cols):
        lb, rb = lspec.get(lc), rspec.get(rc)
        lt_, rt_ = ltr.get(lc), rtr.get(rc)
        lm_, rm_ = ltm.get(lc), rtm.get(rc)
        if lb is not None and rb is not None:
            n, m = lb[0], rb[0]
            coarse = min(n, m)
            if max(n, m) % coarse != 0:
                raise BucketJoinError(
                    f"incompatible bucket counts: bucket[{n}] vs "
                    f"bucket[{m}] — neither divides the other, so bucket "
                    "values do not fold onto a shared grid"
                )
            kinds.append(("bucket", coarse))
        elif lt_ is not None and rt_ is not None:
            # truncate positions: string prefixes fold to the SHORTER
            # width (any pair); integer truncation folds to the COARSER
            # grid only when the finer width divides it — trunc_Wf(x)
            # pins x inside one Wc block exactly when Wf | Wc
            w1, w2 = lt_[0], rt_[0]
            t = _col_iceberg_type(left, lc) or ""
            if t in ("int", "long"):
                lo, hi = sorted((w1, w2))
                if hi % lo != 0:
                    raise BucketJoinError(
                        f"incompatible truncate widths on {lc!r}: "
                        f"truncate[{w1}] vs truncate[{w2}] — neither "
                        "divides the other, so integer-truncated values "
                        "do not fold onto a shared grid"
                    )
                kinds.append(("truncate", hi, True))
            elif t in ("string", "binary"):
                kinds.append(("truncate", min(w1, w2), False))
            else:
                raise BucketJoinError(
                    f"truncate-partitioned join key {lc!r} has type "
                    f"{t!r}: only int/long/string/binary truncation "
                    "folds onto a shared grid"
                )
        elif lm_ is not None and rm_ is not None:
            # temporal positions: monotonic functions of the key — equal
            # keys share a value, and hour → day → month → year folds
            # finer onto coarser, so the COARSER granularity is the grid
            coarse = max(
                lm_[0], rm_[0], key=lambda t: _TEMPORAL_RANK[t]
            )
            kinds.append(("temporal", coarse))
        elif (
            (lb is None) != (rb is None)
            or (lt_ is None) != (rt_ is None)
            or (lm_ is None) != (rm_ is None)
        ):
            side, col = (
                ("left", lc)
                if (lb is None and lt_ is None and lm_ is None)
                else ("right", rc)
            )
            raise BucketJoinError(
                f"{side} table is not bucket-partitioned on {col!r} while "
                "the other side carries a bucket/truncate/temporal "
                "transform — a transform mix on one key position has no "
                "co-location guarantee"
            )
        else:
            kinds.append(("identity",))
    if not any(k[0] in ("bucket", "truncate", "temporal") for k in kinds):
        if len(left_cols) == 1:
            raise BucketJoinError(
                f"left table is not bucket-partitioned on {left_cols[0]!r} "
                f"(and right is not on {right_cols[0]!r})"
            )
        raise BucketJoinError(
            "no position of the composite join key is bucket-partitioned "
            "on both sides — add the bucket field that drives file "
            "co-location, or use a plain join"
        )
    return kinds


def compatible_bucket_counts(
    left: IcebergTable, right: IcebergTable, left_on: str, right_on: str
) -> int:
    """The coarse (shared) bucket count for a single-column key, or raise
    ``BucketJoinError``."""
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
    kinds = compatible_partitioning(left, right, [left_on], [right_on])
    return kinds[0][1]


def _partition_groups(
    table: IcebergTable,
    cols: list[str],
    kinds: list[tuple],
    filters,
    spark: SparkSession,
    snapshot_id: Optional[int] = None,
) -> tuple[dict[tuple, list[DataFile]], list[DataFile]]:
    """Group the (pruned) data-file list by its join-key partition tuple.

    Returns ``{key_tuple: files}`` plus the NULL-key files (some position's
    partition value is null — their rows can never equi-match, but outer
    joins must still preserve them)."""
    return group_data_files(
        table,
        table.files(filters, snapshot_id=snapshot_id, spark=spark),
        cols,
        kinds,
    )


def group_data_files(
    table: IcebergTable,
    files,
    cols: list[str],
    kinds: list[tuple],
) -> tuple[dict[tuple, list[DataFile]], list[DataFile]]:
    """Group a caller-supplied data-file list by its join-key partition
    tuple (the splittable core of :func:`_partition_groups`, also used
    by the grouped DataSource planner in sources/iceberg_datasource.py).

    Per-FILE spec resolution: a
    spec-evolved table mixes files written under different specs, and only
    the file's OWN spec says how its partition value folds — a file under
    ``bucket[4]`` cannot fold onto an 8-bucket grid (h%8 is not derivable
    from h%4), and a file whose spec lacks an identity field for a key
    position carries no co-location guarantee for it.  Such files refuse
    loudly rather than silently produce a wrong join."""
    meta = table.metadata
    by_id = {f["id"]: f["name"] for f in meta.current_schema["fields"]}
    spec_cache: dict[int, list[tuple]] = {}

    def _resolve(spec_id: int) -> list[tuple]:
        """Per key position: ("bucket", coarse, pname) | ("identity",
        None, pname) under THIS spec, or raise."""
        if spec_id in spec_cache:
            return spec_cache[spec_id]
        fields = meta.partition_fields_for_spec(spec_id) or []
        ents: list[tuple] = []
        for col, kind in zip(cols, kinds):
            ent = None
            for pf in fields:
                if by_id.get(pf.source_id) != col:
                    continue
                m = _BUCKET_RE.match(pf.transform)
                mt = _TRUNC_RE.match(pf.transform)
                if kind[0] == "bucket" and m:
                    n_f = int(m.group(1))
                    if n_f % kind[1] != 0:
                        raise BucketJoinError(
                            f"spec {spec_id} was written under "
                            f"bucket[{n_f}] on {col!r}, which does not "
                            f"fold onto the {kind[1]}-bucket grid — "
                            "rewrite old files or use a plain join"
                        )
                    ent = ("bucket", kind[1], pf.name)
                    break
                if kind[0] == "truncate" and mt:
                    w_f = int(mt.group(1))
                    is_int = kind[2]
                    ok = (
                        kind[1] % w_f == 0 if is_int else w_f >= kind[1]
                    )
                    if not ok:
                        raise BucketJoinError(
                            f"spec {spec_id} was written under "
                            f"truncate[{w_f}] on {col!r}, which does not "
                            f"fold onto the truncate[{kind[1]}] grid — "
                            "rewrite old files or use a plain join"
                        )
                    ent = ("truncate", (kind[1], is_int), pf.name)
                    break
                if (
                    kind[0] == "temporal"
                    and pf.transform in _TEMPORAL_RANK
                ):
                    if (
                        _TEMPORAL_RANK[pf.transform]
                        > _TEMPORAL_RANK[kind[1]]
                    ):
                        raise BucketJoinError(
                            f"spec {spec_id} was written under "
                            f"{pf.transform}({col}) — coarser than the "
                            f"{kind[1]} grid, so values cannot fold; "
                            "rewrite old files or use a plain join"
                        )
                    ent = ("temporal", (pf.transform, kind[1]), pf.name)
                    break
                if kind[0] == "identity" and pf.transform == "identity":
                    ent = ("identity", None, pf.name)
                    break
            if ent is None:
                want = "bucket" if kind[0] == "bucket" else "identity"
                raise BucketJoinError(
                    f"spec {spec_id} has no {want} transform on {col!r} — "
                    "no co-location guarantee; rewrite old files or use a "
                    "plain join"
                )
            ents.append(ent)
        spec_cache[spec_id] = ents
        return ents

    groups: dict[tuple, list[DataFile]] = {}
    null_files: list[DataFile] = []
    for f in files:
        try:
            ents = _resolve(f.spec_id)
        except BucketJoinError as e:
            raise BucketJoinError(f"data file {f.path}: {e}") from None
        key: list[Any] = []
        has_null = False
        for kind, coarse, pname in ents:
            if pname not in f.partition:
                raise BucketJoinError(
                    f"data file {f.path} carries no partition value for "
                    f"{pname!r} — rewrite old files or use a plain join"
                )
            v = f.partition[pname]
            if v is None:
                has_null = True
                break
            if kind == "bucket":
                key.append(int(v) % coarse)
            elif kind == "temporal":
                src, dst = coarse
                key.append(_temporal_fold(v, src, dst))
            elif kind == "truncate":
                wc, is_int = coarse
                if is_int:
                    # Iceberg int truncate: v - (v mod W), mod >= 0
                    key.append(int(v) - (int(v) % wc))
                else:
                    key.append(
                        v[:wc]
                        if isinstance(v, str)
                        else bytes(v)[:wc]
                    )
            else:
                key.append(v)
        if has_null:
            null_files.append(f)
            continue
        groups.setdefault(tuple(key), []).append(f)
    return groups, null_files


def _pack_branches(
    keys_loads: list[tuple[tuple, int]], max_branches: int
) -> list[list[tuple]]:
    """LPT bin-packing of partition groups into ≤ ``max_branches``
    branches: heaviest group first onto the least-loaded branch — the
    classic bound keeps every branch within 4/3 of the optimal load, so
    the per-branch broadcast stays predictable.  Deterministic (size
    then key-repr order) so plans are stable across runs."""
    ordered = sorted(keys_loads, key=lambda kl: (-kl[1], repr(kl[0])))
    if len(ordered) <= max_branches:
        return [[k] for k, _ in ordered]
    heap: list[tuple[int, int]] = [(0, i) for i in range(max_branches)]
    heapq.heapify(heap)
    branches: list[list[tuple]] = [[] for _ in range(max_branches)]
    for k, load in ordered:
        tot, i = heapq.heappop(heap)
        branches[i].append(k)
        heapq.heappush(heap, (tot + load, i))
    return [b for b in branches if b]


def bucket_join(
    spark: SparkSession,
    left: IcebergTable,
    right: IcebergTable,
    left_on: KeySpec,
    right_on: Optional[KeySpec] = None,
    how: str = "inner",
    left_filters: Optional[Any] = None,
    right_filters: Optional[Any] = None,
    max_broadcast_bytes: int = DEFAULT_MAX_BROADCAST_BYTES,
    left_snapshot_id: Optional[int] = None,
    right_snapshot_id: Optional[int] = None,
    max_branches: int = DEFAULT_MAX_BRANCHES,
    runtime_prune: Optional[str] = None,
    via_ds: bool = False,
    branch_fn=None,
) -> DataFrame:
    """Shuffle-free equi-join of two bucket-co-partitioned Iceberg tables.

    ``branch_fn`` (inner joins only): a key-local operator applied to
    each branch's JOINED frame before the union — the join analogue of
    :func:`bucket_apply`.  The function receives the branch join
    (all left columns then all right columns, same-name keys deduped)
    and must be key-local over the join keys: a ``groupBy`` whose keys
    include a transformed join-key position aggregates completely
    inside the branch (every row for those key values lives in this
    branch on BOTH sides), so ``branch_fn(df.coalesce(1))``-style
    shapes plan join AND aggregation with zero Exchange end-to-end.
    The empty-join fallback threads through ``branch_fn`` too, so the
    output schema is stable.

    Returns the joined DataFrame (all left columns then all right columns,
    join keys deduplicated when the names match) whose physical plan is a
    UNION of ≤ ``max_branches`` per-branch joins with no shuffle Exchange
    on the join keys.

    ``left_on``/``right_on`` accept a single column or a composite key
    list: one-plus positions bucketed (compatible counts fold onto the
    shared grid), the rest identity-partitioned — the production layout
    Spark-Iceberg's SPJ handles (SPARK-37375).

    ``how``: inner | left | right | full | left_semi | left_anti.
    Semi/anti return LEFT columns only: per-branch the right side is a
    broadcast existence probe; anti additionally keeps whole branches
    with no right files (plain scans, no probe) and the NULL-key left
    files (an equi-key NULL never matches) — the shuffle-free novelty
    filter an incremental dedup store wants.  Outer flavors stay
    broadcast-only by DECOMPOSITION — Spark's BroadcastHashJoin cannot
    build on the preserved side, and supports no full-outer at all, so:

    * left  = per-branch ``LEFT OUTER`` (right side broadcast) + the
      left NULL-key files null-extended + left branches with no right
      files null-extended (no probe needed — nothing can match);
    * right = symmetric;
    * full  = per-branch ``inner ∪ left-anti ∪ right-anti`` (each leg a
      BroadcastHashJoin; anti legs null-extended) + both sides'
      unmatched-by-construction files — each side is scanned twice in
      the anti decomposition, the price of keeping every leg
      broadcastable instead of shuffling per-branch SortMergeJoins.

    ``runtime_prune`` ("left" | "right" — inner/semi either side, anti
    right-only, outer refused) composes the SPJ with metadata-level
    runtime file pruning (runtime_filter.py): the
    OTHER side — typically a selectively filtered dim — is scanned once
    for its distinct join keys, and the named side's file listing is
    pruned by the derived IN-list/interval predicate BEFORE branches
    form, so a filtered dim skips fact files inside every bucket group.

    ``via_ds`` (r15, VERDICT r14 #6): branch sides read through the
    PYTHON DATASOURCE instead of ``_scan_files`` — each branch scan is
    an ``iceberg_py`` read scoped to the branch's files (``file_paths``)
    with one InputPartition per bucket group (``group_partitions_by``),
    the same split handoff the streaming/CDC path uses, so a
    DS-planned pipeline (e.g. a per-bucket state apply) composes with
    SPJ without crossing reader stacks.  Results match the default path
    byte-for-byte (MOR deletes apply inside the DS planner; exact
    filters re-apply via ``pred_to_sql``); parquet-only, like every
    ``iceberg_py`` read.
    """
    if how not in (
        "inner",
        "left",
        "right",
        "full",
        "left_semi",
        "left_anti",
    ):
        raise BucketJoinError(
            "bucket_join supports inner/left/right/full/left_semi/"
            f"left_anti (got {how!r})"
        )
    if branch_fn is not None and how != "inner":
        raise BucketJoinError(
            "branch_fn is key-local over INNER branches only (outer "
            "flavors add null-extended legs the fn never sees) — got "
            f"how={how!r}"
        )
    semi_anti = how in ("left_semi", "left_anti")
    lcols = _as_cols(left_on, "left")
    rcols = _as_cols(right_on, "right") if right_on is not None else list(
        lcols
    )
    kinds = compatible_partitioning(left, right, lcols, rcols)

    same_name = lcols == rcols
    keep_left = how in ("left", "full")
    keep_right = how in ("right", "full")

    def _cond(dfl, dfr):
        if same_name:
            return list(lcols)
        c: Column = dfl[lcols[0]] == dfr[rcols[0]]
        for lc, rc in zip(lcols[1:], rcols[1:]):
            c = c & (dfl[lc] == dfr[rc])
        return c

    def _empty_join() -> DataFrame:
        dfl = left.to_df(spark).limit(0)
        if semi_anti:
            return dfl
        dfr = right.to_df(spark).limit(0)
        out = dfl.join(dfr, on=_cond(dfl, dfr), how="inner")
        return branch_fn(out) if branch_fn is not None else out

    if runtime_prune is not None:
        if runtime_prune not in ("left", "right"):
            raise BucketJoinError(
                "runtime_prune names the side whose FILES get pruned: "
                f"'left' or 'right' (got {runtime_prune!r})"
            )
        _prune_ok = {
            "inner": {"left", "right"},
            "left_semi": {"left", "right"},
            # anti preserves unmatched LEFT rows: pruning left files
            # would drop them; pruning the right (probe) side only
            # removes rows that match nothing — safe
            "left_anti": {"right"},
        }
        if runtime_prune not in _prune_ok.get(how, set()):
            raise BucketJoinError(
                f"runtime_prune={runtime_prune!r} is unsafe for "
                f"how={how!r}: the derived key predicate would drop rows "
                "this join must keep (inner/semi: either side; anti: "
                "right only)"
            )
        from datafusion_iceberg_spark.iceberg.runtime_filter import (
            runtime_key_pred,
        )

        # any position's key derives a pruning predicate — rewrite_pred
        # folds it through bucket/truncate/temporal transforms and an
        # identity value prunes directly; prefer a transformed position
        # (the primary key), falling back to the first
        bidx = next(
            (i for i, kd in enumerate(kinds) if kd[0] != "identity"), 0
        )
        if runtime_prune == "right":
            dim = left.to_df(
                spark, filters=left_filters, snapshot_id=left_snapshot_id
            )
            pred = runtime_key_pred(dim, lcols[bidx], rcols[bidx])
            if pred is None:
                if how == "left_anti":
                    # the (filtered) left side has no non-null keys, so
                    # NO right row can match — an anti join keeps EVERY
                    # left row, it does not go empty
                    return left.to_df(
                        spark,
                        filters=left_filters,
                        snapshot_id=left_snapshot_id,
                    )
                return _empty_join()
            right_filters = (
                ("and", right_filters, pred)
                if right_filters is not None
                else pred
            )
        else:
            dim = right.to_df(
                spark, filters=right_filters, snapshot_id=right_snapshot_id
            )
            pred = runtime_key_pred(dim, rcols[bidx], lcols[bidx])
            if pred is None:
                return _empty_join()
            left_filters = (
                ("and", left_filters, pred)
                if left_filters is not None
                else pred
            )

    lgroups, lnull = _partition_groups(
        left, lcols, kinds, left_filters, spark, left_snapshot_id
    )
    rgroups, rnull = _partition_groups(
        right, rcols, kinds, right_filters, spark, right_snapshot_id
    )

    # hoist the delete-file listing: _scan_files(deletes=None) would
    # re-read every delete manifest PER BRANCH (4x branches Avro reads);
    # list once per table and pass down snapshot-scoped: a pinned side
    # masks with ITS snapshot's deletes, exactly like to_df's time travel
    ldel = left.position_delete_files(left_snapshot_id)
    leq = left.equality_delete_files(left_snapshot_id)
    rdel = right.position_delete_files(right_snapshot_id)
    req = right.equality_delete_files(right_snapshot_id)

    if via_ds:
        import json as _json

        from datafusion_iceberg_spark.iceberg.pruning import pred_to_sql
        from datafusion_iceberg_spark.sources.iceberg_datasource import (
            register_iceberg_datasource,
        )

        register_iceberg_datasource(spark)
        # group partitions by the first transformed key position (the
        # bucket/temporal/truncate column that drives co-location)
        _gidx = next(
            (i for i, kd in enumerate(kinds) if kd[0] != "identity"), 0
        )

        def _ds_scan(table, fl, filt, sid, key_col):
            r = (
                spark.read.format("iceberg_py")
                .option("path", table.metadata.root)
                .option(
                    "file_paths",
                    _json.dumps(sorted(f.path for f in fl)),
                )
                .option("group_partitions_by", key_col)
            )
            if sid is not None:
                r = r.option("snapshot_id", str(sid))
            df = r.load()
            if filt is not None:
                df = df.filter(pred_to_sql(filt))
            return df

        def _scan_l(fl, filt):
            return _ds_scan(left, fl, filt, left_snapshot_id, lcols[_gidx])

        def _scan_r(fl, filt):
            return _ds_scan(right, fl, filt, right_snapshot_id, rcols[_gidx])

    else:

        def _scan_l(fl, filt):
            return left._scan_files(
                spark, fl, filt, deletes=ldel, eq_deletes=leq
            )

        def _scan_r(fl, filt):
            return right._scan_files(
                spark, fl, filt, deletes=rdel, eq_deletes=req
            )

    joined_names = set(lcols) if same_name else set()
    lfields = [
        f
        for f in left.metadata.struct_type().fields
        if f.name not in joined_names
    ]
    rfields = [
        f
        for f in right.metadata.struct_type().fields
        if f.name not in joined_names
    ]

    def _extend(df: DataFrame, other_fields) -> DataFrame:
        for f in other_fields:
            df = df.withColumn(f.name, F.lit(None).cast(f.dataType))
        return df

    # keys contributing to the result under this join type; groups on
    # the dropped side of an inner/one-sided outer join can never
    # produce output rows, so their files are never scanned
    if how in ("inner", "left_semi"):
        keys = set(lgroups) & set(rgroups)
    elif how in ("left", "left_anti"):
        keys = set(lgroups)
    elif how == "right":
        keys = set(rgroups)
    else:
        keys = set(lgroups) | set(rgroups)

    def _bytes(groups, k) -> int:
        return sum(f.file_size_in_bytes for f in groups.get(k, ()))

    # ---- whole-side broadcast collapse (guide §3.1) -----------------------
    # When one side's ENTIRE participating file set fits under the same
    # per-branch broadcast ceiling, the union of per-branch broadcast
    # joins is row-identical to ONE broadcast join of the full branch
    # file scans: the partition tuple is a function of the join key, so
    # a branch's rows can only ever equi-match rows of their own groups
    # — probing the full-side hash relation finds exactly the same
    # pairs.  The collapse replaces |branches| BroadcastExchange jobs
    # with one, drops the per-branch plan-build py4j storm, and ships
    # the SAME total broadcast bytes (every executor received every
    # branch's broadcast anyway, |side| in aggregate).  Measured on the
    # 32-branch wide-join gate: 4.59 → ~0.9 s at sf0.1.  At 100 TB a
    # fact side blows the ceiling and the union SPJ engages unchanged —
    # this is the deliberate §3.1 strategy pick (broadcast the side
    # that fits), sized by manifest bytes, not a local-mode tune.
    # SPARK_GRAFT_SPJ_COLLAPSE=0 forces the union path.
    def _files_of(groups, ks) -> list:
        out = []
        for k in sorted(ks, key=repr):
            out.extend(groups.get(k, ()))
        return out

    if os.environ.get("SPARK_GRAFT_SPJ_COLLAPSE", "1") != "0":
        ikeys = set(lgroups) & set(rgroups)
        lf_i = _files_of(lgroups, ikeys)
        rf_i = _files_of(rgroups, ikeys)
        lb_i = sum(f.file_size_in_bytes for f in lf_i)
        rb_i = sum(f.file_size_in_bytes for f in rf_i)
        # branch_fn callers stay on the union path: the fn contract is a
        # key-local operator over a SinglePartition branch (coalesce(1) +
        # one-phase aggregate) — applied to a collapsed join it would
        # serialize the whole (potentially huge) probe side into one
        # partition, which is only harmless at toy scale
        if (
            how == "inner"
            and branch_fn is None
            and lf_i
            and rf_i
            and min(lb_i, rb_i) <= max_broadcast_bytes
        ):
            dfl, dfr = _scan_l(lf_i, left_filters), _scan_r(rf_i, right_filters)
            if rb_i <= lb_i:
                dfr = F.broadcast(dfr)
            else:
                dfl = F.broadcast(dfl)
            return dfl.join(dfr, on=_cond(dfl, dfr), how="inner")
        if how == "left_semi" and rb_i <= max_broadcast_bytes:
            if not lf_i or not rf_i:
                return _empty_join()
            dfl, dfr = _scan_l(lf_i, left_filters), _scan_r(rf_i, right_filters)
            return dfl.join(F.broadcast(dfr), on=_cond(dfl, dfr), how="left_semi")
        if how == "left_anti" and rb_i <= max_broadcast_bytes:
            lf_all = _files_of(lgroups, set(lgroups)) + list(lnull)
            if not lf_all:
                return _empty_join()
            dfl = _scan_l(lf_all, left_filters)
            if not rf_i:
                return dfl
            dfr = _scan_r(rf_i, right_filters)
            return dfl.join(F.broadcast(dfr), on=_cond(dfl, dfr), how="left_anti")
        if how == "left" and rb_i <= max_broadcast_bytes:
            lf_all = _files_of(lgroups, set(lgroups)) + list(lnull)
            if lf_all:
                dfl = _scan_l(lf_all, left_filters)
                dfr = _scan_r(rf_i, right_filters)
                return dfl.join(F.broadcast(dfr), on=_cond(dfl, dfr), how="left")
        if how == "right" and lb_i <= max_broadcast_bytes:
            rf_all = _files_of(rgroups, set(rgroups)) + list(rnull)
            if rf_all:
                dfl = _scan_l(lf_i, left_filters)
                dfr = _scan_r(rf_all, right_filters)
                return F.broadcast(dfl).join(dfr, on=_cond(dfl, dfr), how="right")
        if (
            how == "full"
            and lb_i <= max_broadcast_bytes
            and rb_i <= max_broadcast_bytes
        ):
            lf_all = _files_of(lgroups, set(lgroups)) + list(lnull)
            rf_all = _files_of(rgroups, set(rgroups)) + list(rnull)
            if lf_all and rf_all:
                # same inner ∪ left-anti ∪ right-anti decomposition as the
                # branch path (BroadcastHashJoin has no full-outer), with
                # whole-side scans per leg
                dfl_i = _scan_l(lf_i, left_filters)
                dfr_i = _scan_r(rf_i, right_filters)
                if rb_i <= lb_i:
                    inner = dfl_i.join(
                        F.broadcast(dfr_i), on=_cond(dfl_i, dfr_i), how="inner"
                    )
                else:
                    inner = F.broadcast(dfl_i).join(
                        dfr_i, on=_cond(dfl_i, dfr_i), how="inner"
                    )
                dfl_a = _scan_l(lf_all, left_filters)
                dfr_a = _scan_r(rf_all, right_filters)
                la = _extend(
                    dfl_a.join(
                        F.broadcast(dfr_i), on=_cond(dfl_a, dfr_i), how="left_anti"
                    ),
                    rfields,
                )
                ra = _extend(
                    dfr_a.join(
                        F.broadcast(dfl_i), on=_cond(dfl_i, dfr_a), how="left_anti"
                    ),
                    lfields,
                )
                return inner.unionByName(la).unionByName(ra)
    # ---- union-SPJ branch path --------------------------------------------

    keys_loads = []
    for k in keys:
        lb, rb = _bytes(lgroups, k), _bytes(rgroups, k)
        # branch load = what gets broadcast: the smaller side when both
        # are present, else whatever must be scanned for null-extension
        load = min(lb, rb) if (k in lgroups and k in rgroups) else lb + rb
        keys_loads.append((k, load))
    branches = _pack_branches(keys_loads, max_branches)

    def _build_branch(branch) -> list[DataFrame]:
        lf = [f for k in branch for f in lgroups.get(k, ())]
        rf = [f for k in branch for f in rgroups.get(k, ())]
        if semi_anti:
            # output schema = left columns only; the right side is a
            # broadcast existence probe (BroadcastHashJoin builds on the
            # right for both LeftSemi and LeftAnti)
            if not lf:
                return []
            if not rf:
                # nothing can match: anti keeps the whole branch as a
                # plain scan (no probe needed), semi drops it
                if how == "left_anti":
                    return [_scan_l(lf, left_filters)]
                return []
            dfl = _scan_l(lf, left_filters)
            dfr = _scan_r(rf, right_filters)
            rbytes = sum(f.file_size_in_bytes for f in rf)
            bdfr = F.broadcast(dfr) if rbytes <= max_broadcast_bytes else dfr
            return [dfl.join(bdfr, on=_cond(dfl, bdfr), how=how)]
        if lf and not rf:
            if keep_left:
                return [_extend(_scan_l(lf, left_filters), rfields)]
            return []
        if rf and not lf:
            if keep_right:
                return [_extend(_scan_r(rf, right_filters), lfields)]
            return []
        if not lf and not rf:
            return []
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
            # else: leave unhinted — Catalyst shuffles THIS branch only
            # (skew degrades one union branch, not the whole plan)
            bj = dfl.join(dfr, on=_cond(dfl, dfr), how="inner")
            return [branch_fn(bj) if branch_fn is not None else bj]
        if how == "left":
            # build side must be the non-preserved (right) side
            bdfr = F.broadcast(dfr) if rbytes <= max_broadcast_bytes else dfr
            return [dfl.join(bdfr, on=_cond(dfl, bdfr), how="left")]
        if how == "right":
            # build side must be the non-preserved (left) side
            bdfl = F.broadcast(dfl) if lbytes <= max_broadcast_bytes else dfl
            return [bdfl.join(dfr, on=_cond(bdfl, dfr), how="right")]
        # full: inner ∪ left-anti ∪ right-anti, every leg BHJ-able
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
        return [
            inner,
            _extend(
                dfl.join(br, on=_cond(dfl, br), how="left_anti"), rfields
            ),
            _extend(
                dfr.join(bl, on=_cond(bl, dfr), how="left_anti"), lfields
            ),
        ]

    subs = _parallel_branches(_build_branch, branches)
    if keep_left and lnull:
        subs.append(_extend(_scan_l(lnull, left_filters), rfields))
    if keep_right and rnull:
        subs.append(_extend(_scan_r(rnull, right_filters), lfields))
    if how == "left_anti" and lnull:
        # NULL join keys never equi-match, so an anti join KEEPS them
        subs.append(_scan_l(lnull, left_filters))
    if not subs:
        # no contributing branches: empty frame with the joined schema
        return _empty_join()
    out = subs[0]
    for s in subs[1:]:
        out = out.unionByName(s)
    return out


def compatible_partitioning_multi(
    tables: Sequence[IcebergTable],
    cols_per_side: Sequence[list[str]],
) -> list[tuple]:
    """Per-position partitioning contract for an N-way SPJ key: the
    multi-table generalization of :func:`compatible_partitioning`.
    Every side must carry the SAME transform family on each position,
    folding onto one shared grid: bucket counts fold to the minimum
    (which every count must divide evenly onto), integer truncate
    widths to the maximum (each must divide it), string truncate to the
    shortest prefix, temporal granularities to the coarsest.  Raises
    :class:`BucketJoinError` when any side breaks the family or the
    fold."""
    if len(tables) < 2:
        raise BucketJoinError("a chain join needs at least two tables")
    arity = len(cols_per_side[0])
    if any(len(c) != arity for c in cols_per_side):
        raise BucketJoinError(
            f"join-key arity mismatch across sides: {cols_per_side}"
        )
    specs = [
        (
            bucket_partitioning(t),
            truncate_partitioning(t),
            temporal_partitioning(t),
        )
        for t in tables
    ]
    kinds: list[tuple] = []
    for j in range(arity):
        buckets, truncs, temps, idents = [], [], [], 0
        for i, ((bs, trs, tms), cols) in enumerate(
            zip(specs, cols_per_side)
        ):
            c = cols[j]
            if c in bs:
                buckets.append(bs[c][0])
            elif c in trs:
                truncs.append(
                    (trs[c][0], _col_iceberg_type(tables[i], c) or "")
                )
            elif c in tms:
                temps.append(tms[c][0])
            else:
                idents += 1
        n = len(tables)
        if len(buckets) == n:
            coarse = min(buckets)
            bad = [b for b in buckets if b % coarse != 0]
            if bad:
                raise BucketJoinError(
                    f"incompatible bucket counts at key position {j}: "
                    f"{buckets} do not all fold onto the {coarse}-bucket "
                    "grid"
                )
            kinds.append(("bucket", coarse))
        elif len(truncs) == n:
            types = {t for _, t in truncs}
            widths = [w for w, _ in truncs]
            if types <= {"int", "long"}:
                coarse = max(widths)
                if any(coarse % w != 0 for w in widths):
                    raise BucketJoinError(
                        f"incompatible truncate widths at position {j}: "
                        f"{widths} do not all divide truncate[{coarse}]"
                    )
                kinds.append(("truncate", coarse, True))
            elif types <= {"string", "binary"}:
                kinds.append(("truncate", min(widths), False))
            else:
                raise BucketJoinError(
                    f"mixed/unsupported truncate source types {types} at "
                    f"key position {j}"
                )
        elif len(temps) == n:
            coarse = max(temps, key=lambda t: _TEMPORAL_RANK[t])
            kinds.append(("temporal", coarse))
        elif idents == n:
            kinds.append(("identity",))
        else:
            raise BucketJoinError(
                f"key position {j} mixes transform families across sides "
                "— no shared co-location grid exists"
            )
    if not any(k[0] in ("bucket", "truncate", "temporal") for k in kinds):
        raise BucketJoinError(
            "no position of the chain key carries a bucket/truncate/"
            "temporal transform on every side — add the transform that "
            "drives file co-location, or use plain joins"
        )
    return kinds


def bucket_join_chain(
    spark: SparkSession,
    tables: Sequence[IcebergTable],
    keys: Sequence[KeySpec],
    filters: Optional[Sequence[Any]] = None,
    snapshot_ids: Optional[Sequence[Optional[int]]] = None,
    max_broadcast_bytes: int = DEFAULT_MAX_BROADCAST_BYTES,
    max_branches: int = DEFAULT_MAX_BRANCHES,
    branch_fn=None,
) -> DataFrame:
    """Shuffle-free INNER equi-join of N co-partitioned Iceberg tables
    over ONE shared branch decomposition (VERDICT r14 #5).

    ``branch_fn``: key-local operator applied to each branch's joined
    frame before the union — same contract as :func:`bucket_join`'s
    (inner chain joins only, which is all this function builds): a
    ``groupBy``/dedup whose keys include a chain-key position runs
    completely inside the branch, so join AND aggregation plan with
    zero Exchange end-to-end.  The empty fallback threads through it
    for schema stability.

    A star/chain warehouse query joins three-plus co-partitioned tables
    (fact ⋈ fact ⋈ dim); chaining pairwise ``bucket_join`` calls would
    materialize each pair's union before the next join re-plans from
    scratch — and the second join SHUFFLES, because the union result no
    longer carries file-group metadata.  Here every side's (pruned)
    file list folds onto the SAME coarse grid
    (:func:`compatible_partitioning_multi`), branch keys are the
    intersection across all sides (inner join: a key missing anywhere
    produces nothing), and each branch joins all N sides' file groups
    left-to-right with the accumulated frame streamed and each later
    side broadcast when it fits — then one UNION of branches.  Zero
    shuffle Exchange on the join keys anywhere; the reference's
    partition-grouped scan units exist precisely so downstream
    operators compose this way (table.rs:128-131).

    ``keys[i]`` is table i's key column (or composite list); all sides
    must share arity.  Join condition: consecutive-pair equality
    (t0.k = t1.k AND t1.k = t2.k ...), the chain shape — equivalent to
    any other pairing for an inner equi-join.  Output columns: t0's
    columns, then each later side's columns, with a later side's key
    dropped when it is name-identical to t0's (Spark's same-name
    ``on=[names]`` dedup); duplicate NON-key names across sides refuse
    (the union could not address them).  NULL-key files drop (no inner
    equi-match).  MOR deletes apply per side through the same hoisted
    delete listing as :func:`bucket_join`.
    """
    n = len(tables)
    if n < 2:
        raise BucketJoinError("bucket_join_chain needs >= 2 tables")
    cols_per_side = [_as_cols(k, f"side {i}") for i, k in enumerate(keys)]
    if len(cols_per_side) != n:
        raise BucketJoinError("one key spec per table required")
    kinds = compatible_partitioning_multi(tables, cols_per_side)
    filters = list(filters) if filters is not None else [None] * n
    snapshot_ids = (
        list(snapshot_ids) if snapshot_ids is not None else [None] * n
    )
    if len(filters) != n or len(snapshot_ids) != n:
        raise BucketJoinError(
            "filters/snapshot_ids must align with tables when given"
        )
    # resolve columns + duplicate-name audit
    resolved: list[list[str]] = []
    for t, cols in zip(tables, cols_per_side):
        actual = {f.name for f in t.metadata.struct_type().fields}
        miss = [c for c in cols if c not in actual]
        if miss:
            raise BucketJoinError(
                f"key columns {miss} not in table at {t.metadata.root}"
            )
        resolved.append(list(cols))
    # name audit + per-side join mode: a side either name-matches the
    # accumulated frame's key on EVERY position (Spark's on=[names]
    # dedup) or on NONE (condition join, all columns kept); a partial
    # match — or any other repeated column name — refuses, because the
    # chained result could not address the duplicates
    base_cols = [f.name for f in tables[0].metadata.struct_type().fields]
    seen_names = {c.lower() for c in base_cols}
    prev_names = list(resolved[0])
    dedup: list[bool] = [False]
    join_left: list[list[str]] = [list(prev_names)]
    for i in range(1, n):
        side_cols = [f.name for f in tables[i].metadata.struct_type().fields]
        matches = [c == p for c, p in zip(resolved[i], prev_names)]
        if any(matches) and not all(matches):
            raise BucketJoinError(
                f"side {i} key {resolved[i]} name-matches the chain key "
                f"{prev_names} on some positions but not all — project "
                "to uniform names first"
            )
        same = set(resolved[i]) if all(matches) else set()
        dup = [
            c
            for c in side_cols
            if c.lower() in seen_names and c not in same
        ]
        if dup:
            raise BucketJoinError(
                f"side {i} repeats column names {dup} — the chained "
                "result could not address them; project them away first"
            )
        seen_names |= {c.lower() for c in side_cols}
        dedup.append(all(matches))
        join_left.append(list(prev_names))  # left key names for THIS link
        if not all(matches):
            prev_names = list(resolved[i])

    per_side_groups = []
    for t, cols, filt, sid in zip(tables, resolved, filters, snapshot_ids):
        groups, _nulls = _partition_groups(t, cols, kinds, filt, spark, sid)
        per_side_groups.append(groups)
    keys_common = set(per_side_groups[0])
    for g in per_side_groups[1:]:
        keys_common &= set(g)

    dels = [
        (t.position_delete_files(sid), t.equality_delete_files(sid))
        for t, sid in zip(tables, snapshot_ids)
    ]

    def _scan(i, fl):
        return tables[i]._scan_files(
            spark, fl, filters[i], deletes=dels[i][0], eq_deletes=dels[i][1]
        )

    def _bytes(i, k) -> int:
        return sum(
            f.file_size_in_bytes for f in per_side_groups[i].get(k, ())
        )

    keys_loads = []
    for k in keys_common:
        sizes = [_bytes(i, k) for i in range(n)]
        keys_loads.append((k, sum(sizes) - max(sizes)))
    branches = _pack_branches(keys_loads, max_branches)

    def _link(df: DataFrame, side: DataFrame, i: int) -> DataFrame:
        if dedup[i]:
            return df.join(side, on=list(resolved[i]), how="inner")
        cond = df[join_left[i][0]] == side[resolved[i][0]]
        for a, b in zip(join_left[i][1:], resolved[i][1:]):
            cond = cond & (df[a] == side[b])
        return df.join(side, on=cond, how="inner")

    def _empty() -> DataFrame:
        df = tables[0].to_df(spark).limit(0)
        for i in range(1, n):
            df = _link(df, tables[i].to_df(spark).limit(0), i)
        return branch_fn(df) if branch_fn is not None else df

    def _build_branch(branch) -> list[DataFrame]:
        fls = [
            [f for k in branch for f in per_side_groups[i].get(k, ())]
            for i in range(n)
        ]
        if any(not fl for fl in fls):
            return []
        df = _scan(0, fls[0])
        for i in range(1, n):
            dfr = _scan(i, fls[i])
            rbytes = sum(f.file_size_in_bytes for f in fls[i])
            side = F.broadcast(dfr) if rbytes <= max_broadcast_bytes else dfr
            df = _link(df, side, i)
        return [branch_fn(df) if branch_fn is not None else df]

    subs = _parallel_branches(_build_branch, branches)
    if not subs:
        return _empty()
    out = subs[0]
    for s in subs[1:]:
        out = out.unionByName(s)
    return out


def bucket_agg(
    spark: SparkSession,
    table: IcebergTable,
    group_cols: Sequence[str],
    aggs: Sequence[Column],
    filters: Optional[Any] = None,
    snapshot_id: Optional[int] = None,
    max_branches: int = DEFAULT_MAX_BRANCHES,
) -> DataFrame:
    """Storage-partitioned aggregation: ``groupBy(group_cols).agg(aggs)``
    on a bucket-partitioned table with ZERO shuffle Exchange anywhere.

    Requires some ``group_cols`` member to be the table's bucket source
    column — then the full group key FUNCTIONALLY DETERMINES the bucket,
    every bucket holds all rows for its keys, and a branch (a set of
    whole buckets) aggregated as ONE partition is complete: no combine
    across branches is ever needed.  ``coalesce(1)`` makes each branch
    report ``SinglePartition`` to Catalyst, which satisfies the
    aggregate's ClusteredDistribution, so the plan is partial+final
    HashAggregate back-to-back with NO Exchange — the plan real SPJ
    aggregation produces via KeyGroupedPartitioning (SPARK-32709); the
    reference's partition-grouped scan units exist to enable the same
    shape (table.rs:128-131).

    Parallelism = ``max_branches`` single-partition tasks, each reading
    |T| / branches bytes — the table owner sizes N (and the caller
    ``max_branches``) so a branch fits one task, exactly the SPJ-join
    contract.  Rows with a NULL bucket key form their own branch (SQL
    GROUP BY keeps the NULL group).  MOR deletes mask per branch through
    the same ``_scan_files`` path as a full scan.
    """
    group_cols = list(group_cols)
    if not group_cols:
        raise BucketJoinError("bucket_agg needs at least one group column")
    kcol, kind = _partition_backed_key(table, group_cols)
    groups, null_files = _partition_groups(
        table, [kcol], [kind], filters, spark, snapshot_id
    )
    deletes = table.position_delete_files(snapshot_id)
    eq_deletes = table.equality_delete_files(snapshot_id)

    def _scan(fl) -> DataFrame:
        return table._scan_files(
            spark, fl, filters, deletes=deletes, eq_deletes=eq_deletes
        )

    keys_loads = [
        (k, sum(f.file_size_in_bytes for f in fl)) for k, fl in groups.items()
    ]
    branches = _pack_branches(keys_loads, max_branches)
    subs = _parallel_branches(
        lambda branch: [
            _scan([f for k in branch for f in groups[k]])
            .coalesce(1)
            .groupBy(*group_cols)
            .agg(*aggs)
        ],
        branches,
    )
    if null_files:
        # all rows of these files have NULL in the bucket column — one
        # complete branch of their own (GROUP BY keeps the NULL group)
        subs.append(
            _scan(null_files).coalesce(1).groupBy(*group_cols).agg(*aggs)
        )
    if not subs:
        return (
            table.to_df(spark).limit(0).groupBy(*group_cols).agg(*aggs)
        )
    out = subs[0]
    for s in subs[1:]:
        out = out.unionByName(s)
    return out


GROUPED_AGG_FNS = ("count", "sum", "min", "max", "avg")

_SIMPLE_CMP_RE = re.compile(
    r"^\s*([A-Za-z_]\w*)\s*(>=|<=|!=|<>|==|=|>|<)\s*"
    r"(-?\d+\.\d+|-?\d+|'[^']*')\s*$"
)


def _parse_simple_pred(sql: str, fields: dict) -> "Optional[list[tuple]]":
    """SQL filter text → conjunctive (col, op, literal) tuples when the
    filter is a plain AND of column-vs-literal comparisons over known
    columns; None for anything else (the caller falls back to the exact
    JVM filter).  SQL comparison semantics are preserved: NULL compares
    to NULL and is dropped, which is exactly pyarrow's filter default."""
    if re.search(r"[()]|\bOR\b|\bNOT\b|\bIN\b|\bLIKE\b", sql, re.I):
        return None
    out: list[tuple] = []
    for part in re.split(r"\bAND\b", sql, flags=re.I):
        m = _SIMPLE_CMP_RE.match(part)
        if m is None or m.group(1) not in fields:
            return None
        raw = m.group(3)
        if raw.startswith("'"):
            val: Any = raw[1:-1]
        elif "." in raw:
            val = float(raw)
        else:
            val = int(raw)
        out.append((m.group(1), m.group(2), val))
    return out or None


def bucket_agg_grouped(
    spark: SparkSession,
    table: IcebergTable,
    group_cols: Sequence[str],
    aggs: "dict[str, tuple[str, Optional[str]]]",
    filter_expr: Optional[Union[str, Column]] = None,
    snapshot_id: Optional[int] = None,
) -> DataFrame:
    """Storage-partitioned aggregation over the GROUPED DataSource scan:
    one plan subtree however many partition groups the table has, one
    task per group, zero Exchange anywhere.

    :func:`bucket_agg` builds a UNION of per-branch ``coalesce(1)``
    aggregations — correct and zero-Exchange, but its plan width (and
    driver-side py4j build cost, ~30 ms/branch measured r15) is linear
    in ``max_branches``, and each branch is ONE task scanning
    |T|/branches bytes.  At 100 TB with bucket(4096) the union shape
    must choose between a 4096-subtree plan and 64 tasks of 1.6 TB.
    This variant moves the partition-group alignment INTO the scan: the
    Python DataSource plans one InputPartition per occupied group
    (``group_partitions_by``, sources/iceberg_datasource.py), so the
    plan is Scan -> [Filter] -> MapInArrow — constant build cost, task
    parallelism = number of groups — and the aggregation runs
    per-partition with pyarrow's hash group_by (incremental partial
    combine per Arrow batch, so task memory is bounded by the group's
    DISTINCT KEYS, not its rows).  Each task holds ALL rows for its
    keys (the bucket co-location contract), so per-partition results
    are globally exact with no final combine — the same contract the
    reference's partition-grouped scan units feed to DataFusion
    (table.rs:128-131).

    ``aggs``: ``{output_name: (fn, source_col)}`` with fn one of
    count/sum/min/max/avg (``("count", None)`` = COUNT(*)).  The
    restricted, decomposable set is what the incremental Arrow combine
    can re-aggregate exactly; arbitrary Column aggregates stay on
    :func:`bucket_agg`.  ``filter_expr`` (SQL string or Column) applies
    between scan and aggregation — a narrow op, partition alignment is
    preserved, and simple predicates push into the reader for file
    pruning.  Decimal sources refuse (Arrow sum precision semantics
    differ from Spark's).  Output columns: group_cols then agg names.
    """
    from pyspark.sql import types as T
    from pyspark.sql.pandas.types import to_arrow_schema

    from datafusion_iceberg_spark.sources.iceberg_datasource import (
        register_iceberg_datasource,
    )

    group_cols = list(group_cols)
    if not group_cols:
        raise BucketJoinError("bucket_agg_grouped needs a group column")
    kcol, _ = _partition_backed_key(table, group_cols)
    fields = {f.name: f for f in table.metadata.struct_type().fields}
    need: list[str] = list(group_cols)
    spec: list[tuple[str, str, Optional[str]]] = []
    for name, (fn, col) in aggs.items():
        if fn not in GROUPED_AGG_FNS:
            raise BucketJoinError(
                f"bucket_agg_grouped supports {GROUPED_AGG_FNS}, got "
                f"{fn!r} — use bucket_agg for arbitrary Column aggregates"
            )
        if fn == "count" and col is None:
            spec.append((name, fn, None))
            continue
        if col is None or col not in fields:
            raise BucketJoinError(
                f"aggregate {name!r}: unknown column {col!r}"
            )
        dt = fields[col].dataType
        if isinstance(dt, T.DecimalType) and fn in ("sum", "avg"):
            raise BucketJoinError(
                f"aggregate {name!r}: {fn} over DECIMAL column {col!r} — "
                "Arrow sum precision semantics differ from Spark's; use "
                "bucket_agg"
            )
        if col not in need:
            need.append(col)
        spec.append((name, fn, col))
    if not spec:
        raise BucketJoinError("bucket_agg_grouped needs at least one aggregate")

    def _out_type(fn: str, col: Optional[str]):
        if fn == "count":
            return T.LongType()
        if fn == "avg":
            return T.DoubleType()
        dt = fields[col].dataType
        if fn == "sum":
            if isinstance(
                dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
            ):
                return T.LongType()
            return T.DoubleType()
        return dt  # min/max keep the source type

    out_schema = T.StructType(
        [T.StructField(c, fields[c].dataType) for c in group_cols]
        + [
            T.StructField(name, _out_type(fn, col))
            for name, fn, col in spec
        ]
    )
    arrow_out = to_arrow_schema(out_schema)
    gcols = list(group_cols)
    agg_spec = list(spec)

    def agg_partition(batches):
        from datafusion_iceberg_spark.sources.iceberg_datasource import (
            _arrow_grouped_agg,
        )

        yield from _arrow_grouped_agg(
            batches, gcols, agg_spec, None, arrow_out
        )

    if filter_expr is not None:
        if isinstance(filter_expr, str):
            # conservative superset: any identifier token matching a
            # table column joins the reader projection (same rule as
            # catalog.ds_sql's statement-driven projection)
            for m in re.finditer(r"[A-Za-z_]\w*", filter_expr):
                if m.group(0) in fields and m.group(0) not in need:
                    need.append(m.group(0))
        else:
            # an opaque Column's references are not inspectable from
            # Python — read the full schema rather than under-project
            need = [f.name for f in table.metadata.struct_type().fields]
    register_iceberg_datasource(spark)
    reader = (
        spark.read.format("iceberg_py")
        .option("path", table.metadata.root)
        .option("group_partitions_by", kcol)
    )
    if snapshot_id is not None:
        reader = reader.option("snapshot_id", str(snapshot_id))

    # Fused path (guide §4, r16): when the filter is absent or a simple
    # conjunction of column-vs-literal comparisons, the whole
    # filter+aggregate runs INSIDE the DataSource reader — every fact
    # row crosses the JVM↔Python boundary once (in the source read)
    # instead of twice (source read out, mapInArrow back in), and only
    # the aggregated groups ever reach the JVM.  Measured: gate 1.47 →
    # see OPTIMIZATION_r16.md.  Complex filters keep the JVM filter +
    # mapInArrow spelling below.
    filt_tuples = (
        _parse_simple_pred(filter_expr, fields)
        if isinstance(filter_expr, str)
        else None
    )
    if filter_expr is None or filt_tuples is not None:
        import json as _json

        fused = reader.option(
            "agg_schema", _json.dumps(out_schema.jsonValue())
        ).option(
            "agg_json",
            _json.dumps(
                {
                    "group_cols": gcols,
                    "spec": [list(s) for s in agg_spec],
                    "filter": (
                        [list(f) for f in filt_tuples]
                        if filt_tuples
                        else None
                    ),
                    "read_cols": need,
                }
            ),
        )
        return fused.load()

    df = reader.option("columns", ",".join(need)).load()
    if filter_expr is not None:
        df = df.filter(filter_expr)
    return df.mapInArrow(agg_partition, out_schema)


def bucket_apply(
    spark: SparkSession,
    table: IcebergTable,
    key_col: str,
    fn,
    filters: Optional[Any] = None,
    snapshot_id: Optional[int] = None,
    max_branches: int = DEFAULT_MAX_BRANCHES,
) -> DataFrame:
    """Generic storage-partitioned per-key operator: apply ``fn`` to each
    branch of whole buckets read as ONE partition, union the results.

    ``fn`` MUST be key-local: its output over any row set that is closed
    under the bucket column's values must depend only on those rows —
    ``groupBy``/``Window.partitionBy`` on keys that include ``key_col``,
    ``dropDuplicates``/``distinct`` over such keys, per-key sorts and
    top-k.  Because each bucket holds ALL rows for its keys and a branch
    reports ``SinglePartition`` (``coalesce(1)``), Catalyst satisfies
    any ClusteredDistribution on those keys locally: aggregations plan
    partial+final back-to-back, windows sort in-partition — ZERO
    Exchange anywhere (asserted per use in tests/test_spj.py).
    ``bucket_agg`` is the aggregation specialization; this is the shape
    for windows, distinct, and sessionization over a bucketed table.
    """
    _, kind = _partition_backed_key(table, [key_col])
    groups, null_files = _partition_groups(
        table, [key_col], [kind], filters, spark, snapshot_id
    )
    deletes = table.position_delete_files(snapshot_id)
    eq_deletes = table.equality_delete_files(snapshot_id)

    def _scan(fl) -> DataFrame:
        return table._scan_files(
            spark, fl, filters, deletes=deletes, eq_deletes=eq_deletes
        )

    keys_loads = [
        (k, sum(f.file_size_in_bytes for f in fl)) for k, fl in groups.items()
    ]
    branches = _pack_branches(keys_loads, max_branches)
    subs = _parallel_branches(
        lambda branch: [
            fn(_scan([f for k in branch for f in groups[k]]).coalesce(1))
        ],
        branches,
    )
    if null_files:
        # all rows of these files share a NULL key — one complete branch
        subs.append(fn(_scan(null_files).coalesce(1)))
    if not subs:
        return fn(table.to_df(spark).limit(0))
    out = subs[0]
    for s in subs[1:]:
        out = out.unionByName(s)
    return out


def bucket_distinct(
    spark: SparkSession,
    table: IcebergTable,
    cols: Sequence[str],
    filters: Optional[Any] = None,
    snapshot_id: Optional[int] = None,
    max_branches: int = DEFAULT_MAX_BRANCHES,
) -> DataFrame:
    """Shuffle-free DISTINCT over columns that include the bucket source
    column: every duplicate of a projected tuple lives in one bucket, so
    per-branch ``distinct`` is globally exact — exact dedup over a
    content-hash-bucketed corpus with zero Exchange, the plan the plain
    ``dropDuplicates`` path shuffles the whole table to produce."""
    cols = list(cols)
    try:
        key_col, _ = _partition_backed_key(table, cols)
    except BucketJoinError as e:
        raise BucketJoinError(f"{e} — duplicates would straddle partitions") from None
    return bucket_apply(
        spark,
        table,
        key_col,
        lambda df: df.select(*cols).distinct(),
        filters=filters,
        snapshot_id=snapshot_id,
        max_branches=max_branches,
    )


def _bucket_merge_frame(
    spark: SparkSession,
    table: IcebergTable,
    source: DataFrame,
    key: str,
    insert_not_matched: bool,
    max_branches: int,
    order_by: Optional[Sequence[str]] = None,
):
    """(rewrite frame, untouched entries, expected parent) for
    :func:`bucket_merge` — split out so tests can plan-assert the
    rewrite before it commits."""
    from datafusion_iceberg_spark.iceberg.transforms import spark_expr

    spec = bucket_partitioning(table)
    if key not in spec:
        raise BucketJoinError(
            f"bucket_merge target is not bucket-partitioned on {key!r} "
            f"(bucketed columns: {sorted(spec)}) — use the plain merge"
        )
    n = spec[key][0]
    cols = [f.name for f in table.metadata.struct_type().fields]
    missing = [c for c in cols if c not in source.columns]
    if missing:
        raise BucketJoinError(
            f"bucket_merge source lacks table columns {missing}: the "
            "matched row is REPLACED by the source row, so the source "
            "must carry every table column"
        )
    src = source.select(*cols)
    dup = src.filter(F.col(key).isNotNull()).agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct(key).alias("nd"),
    ).collect()[0]
    if dup.n != dup.nd:
        raise BucketJoinError(
            f"bucket_merge source has duplicate keys on {key!r}: "
            f"{dup.n} rows, {dup.nd} distinct — keep the latest row per "
            "key before merging"
        )
    kdt = next(f.dataType for f in src.schema.fields if f.name == key)
    src_b = src.withColumn("__b", spark_expr(f"bucket[{n}]", key, kdt))
    # affected buckets: <= N ints of driver state, the merge's whole
    # coordination footprint
    affected = sorted(
        r["__b"]
        for r in src_b.select("__b").distinct().collect()
        if r["__b"] is not None
    )
    groups, null_files = _partition_groups(
        table, [key], [("bucket", n)], None, spark
    )
    cand_groups = {b: groups[(b,)] for b in affected if (b,) in groups}
    untouched = [
        f
        for k, fl in groups.items()
        if k not in {(b,) for b in affected}
        for f in fl
    ] + list(null_files)
    deletes = table.position_delete_files()
    eq_deletes = table.equality_delete_files()
    # the rewrite commits with _carry=False (no delete manifests ride
    # along), so every delete-targeted file OUTSIDE the affected buckets
    # must also rewrite — masked pass-through — or its deletes would
    # silently un-apply on the untouched copy (same rule as merge)
    dead = table.files_targeted_by_deletes()
    extra = [
        f for f in untouched if table.metadata.localize(f.path) in dead
    ]
    if extra:
        extra_paths = {f.path for f in extra}
        untouched = [f for f in untouched if f.path not in extra_paths]

    def _scan(fl):
        return table._scan_files(
            spark, fl, None, deletes=deletes, eq_deletes=eq_deletes
        )

    keys_loads = [
        (b, sum(f.file_size_in_bytes for f in fl))
        for b, fl in cand_groups.items()
    ]
    branches = _pack_branches(keys_loads, max_branches)
    subs: list[DataFrame] = []
    matched_buckets = set(cand_groups)
    for branch in branches:
        bl = list(branch)  # keys here are bare bucket ints, not tuples
        fl = [f for b in bl for f in cand_groups[b]]
        s_b = F.broadcast(
            src_b.filter(F.col("__b").isin([int(b) for b in bl])).drop("__b")
        )
        tgt = _scan(fl)
        if order_by:
            # conflict rule "greatest (order_by) tuple wins" (source
            # wins ties): union the branch's SOURCE-TOUCHED target rows
            # with its source rows and keep one row per key by a
            # KEY-LOCAL window — the branch is one partition
            # (coalesce(1) → SinglePartition satisfies the window's
            # distribution), so this stays shuffle-free like the
            # anti-join path.  The out-of-order-batch safety a
            # streaming apply needs: an older source row LOSES to
            # newer target state.  Target rows whose key the batch
            # never touches pass through UNCHANGED — only
            # source-touched keys enter the window, so legitimate
            # duplicate-key target rows on untouched keys survive
            # (on touched keys both modes collapse to one winner, the
            # keyed-upsert contract).
            if not insert_not_matched:
                s_use = s_b.join(
                    tgt.select(key), on=[key], how="left_semi"
                )
            else:
                s_use = s_b
            tgt_hit = tgt.join(s_b.select(key), on=[key], how="left_semi")
            tgt_miss = tgt.join(s_b.select(key), on=[key], how="left_anti")
            both = tgt_hit.withColumn("__src", F.lit(0)).unionByName(
                s_use.withColumn("__src", F.lit(1))
            )
            from pyspark.sql import Window as _W

            w = _W.partitionBy(key).orderBy(
                *[F.col(c).desc() for c in order_by], F.col("__src").desc()
            )
            out = (
                both.coalesce(1)
                .withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn", "__src")
                .unionByName(tgt_miss)
            )
        else:
            # matched rows are REPLACED by the source row: keep target
            # rows whose key has no source partner, add every source
            # row of the branch (match → replacement, no match →
            # insert) — one broadcast anti join per branch, the target
            # never shuffles
            survivors = tgt.join(s_b, on=[key], how="left_anti")
            out = survivors.unionByName(s_b) if insert_not_matched else (
                survivors.unionByName(
                    s_b.join(tgt.select(key), on=[key], how="left_semi")
                )
            )
        subs.append(out)
    # source rows in buckets the target does not populate are pure
    # inserts; NULL-key source rows never equi-match and insert likewise
    if insert_not_matched:
        if matched_buckets:
            rest = src_b.filter(
                ~F.col("__b").isin([int(b) for b in matched_buckets])
                | F.col("__b").isNull()
            ).drop("__b")
        else:
            rest = src_b.drop("__b")
        subs.append(rest)
    for f_extra in ([extra] if extra else []):
        subs.append(_scan(f_extra))
    frame = subs[0] if subs else src.limit(0)
    for s in subs[1:]:
        frame = frame.unionByName(s)
    return frame, untouched, table.metadata.current_snapshot_id


def bucket_merge(
    spark: SparkSession,
    catalog,
    ident: str,
    source: DataFrame,
    key: str,
    insert_not_matched: bool = True,
    max_branches: int = DEFAULT_MAX_BRANCHES,
    order_by: Optional[Sequence[str]] = None,
) -> int:
    """Copy-on-write UPSERT into a bucket-partitioned table that never
    shuffles the target: matched rows are replaced by the source row,
    unmatched source rows insert, and ONLY the buckets the source
    touches rewrite.

    The plain ``merge`` prunes candidate files by the source keys'
    [min, max] span — useless under hash bucketing, where every file
    spans the key range, so a continuous-ingest MERGE rewrites the
    whole table.  Here the source's bucket values (≤ N ints of driver
    state) select candidate FILE GROUPS exactly, each branch is a
    broadcast anti join (target side never moves), untouched buckets
    carry over as metadata entries, and delete-targeted files outside
    the affected buckets rewrite masked (the `_carry=False` rule the
    plain merge applies).  At 100 TB with bucket(4096) and a batch
    touching 200 buckets, the rewrite scans 200/4096 of the table and
    shuffles nothing but the batch.

    ``order_by`` changes the conflict rule from "source replaces" to
    "greatest (order_by…) tuple wins, source wins ties" — the
    out-of-order-batch safety a streaming CDC apply needs: an older
    row arriving late cannot regress newer state.  Implemented as a
    key-local window over the branch (still one partition, still no
    Exchange).

    Duplicate source keys refuse (SQL MERGE cardinality rule).  Row-
    lineage (v3) tables refuse — use ``merge``, which threads _row_id.
    """
    from datafusion_iceberg_spark.iceberg.writer import _lineage_on

    writer = catalog.writer(ident)
    table = catalog.load(ident)
    if not isinstance(table, IcebergTable):
        raise BucketJoinError("bucket_merge targets TABLES, not views")
    if _lineage_on(table.metadata.raw):
        raise BucketJoinError(
            "bucket_merge does not thread v3 row lineage through the "
            "rewrite — use merge() on lineage tables"
        )
    frame, untouched, parent = _bucket_merge_frame(
        spark, table, source, key, insert_not_matched, max_branches,
        order_by=order_by,
    )
    snap = writer.append(
        spark,
        frame,
        _carry=False,
        _operation="overwrite",
        _extra_entries=untouched,
        _allow_empty=True,
        _expected_parent=parent,
    )
    # the catalog serves an eager mirror: refresh it so the next load
    # sees this commit (same rule as Catalog.append)
    catalog._mirror[ident] = IcebergTable.load(table.metadata.root)
    return snap


def catalog_bucket_join(
    catalog,
    spark: SparkSession,
    left_ident: str,
    right_ident: str,
    left_on: KeySpec,
    right_on: Optional[KeySpec] = None,
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
        lcols = _as_cols(left_on, "left")
        rcols = (
            _as_cols(right_on, "right") if right_on is not None else lcols
        )
        dfl, dfr = left.to_df(spark), right.to_df(spark)
        if lcols == rcols:
            return dfl.join(dfr, on=lcols, how=how)
        cond = dfl[lcols[0]] == dfr[rcols[0]]
        for lc, rc in zip(lcols[1:], rcols[1:]):
            cond = cond & (dfl[lc] == dfr[rc])
        return dfl.join(dfr, on=cond, how=how)
