"""Spark 4 Python DataSource for Iceberg tables — the real split
handoff.

``spark.read.format("iceberg_py")`` plans the scan the way the
reference hands ``FileScanConfig`` file groups straight to the exec
(table.rs:281-293): the driver walks metadata → manifests → pruned file
list ONCE and emits one ``InputPartition`` per data file; executors
open exactly those files with pyarrow.  Spark never re-lists
directories or re-stats footers — the listing cost that motivated
``_compact_read_paths`` (PERF_NOTES.md round 5) disappears
structurally.

Also provides ``spark.readStream.format("iceberg_py")``: a
``DataSourceStreamReader`` that tails APPEND snapshots — offsets are
snapshot ordinals, each micro-batch plans the files added by the
snapshots in ``(start, end]`` (the incremental_df diff as a streaming
source), and partitions are again one file each, read in executors.

``df.write.format("iceberg_py")`` is the write half: executor tasks
stream Arrow batches straight into per-task parquet files under the
table root (no driver funneling), and ``commit`` publishes them as ONE
atomic Iceberg snapshot (append, or a replace snapshot for
``mode("overwrite")``); an aborted job just deletes its staging
directory — unpublished files were never visible.  Partitioned/sorted
tables refuse (their transforms run in the catalog append path).

MOR reads (r9): snapshots carrying position/DV/equality delete files
READ on the fast path too — the planner ships each file's delete
coverage with its partition and the executor masks dead rows (position
deletes filtered by path, DV blobs decoded, equality keys matched under
the strictly-newer sequence rule) using the same kernels as the CDC
stream; batch results match ``IcebergTable.to_df`` exactly.  Filters push down for PRUNING only
(file skip); Spark re-applies every filter exactly, so correctness
never depends on stats.
"""

from __future__ import annotations

import os
from typing import TYPE_CHECKING, Iterator, Optional

from dataclasses import dataclass, field

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)

if TYPE_CHECKING:  # pragma: no cover
    import pyarrow as pa


class IcebergFilePartition(InputPartition):
    """One scan split: a list of file CHUNKS ``(path, attach, row_groups)``
    where ``attach`` holds partition values for columns absent from the
    file (attached as constants) and ``row_groups`` is ``None`` for the
    whole file or a list of row-group ordinals for a slice of a large
    file.  Mirrors Spark's own FilePartition packing (and the
    reference's FileScanConfig file groups, table.rs:281-293): small
    files coalesce into one task, large files split at row-group
    boundaries — so parallelism tracks bytes, not file count."""

    def __init__(
        self,
        path: str = "",
        attach: Optional[dict] = None,
        chunks=None,
        mor: Optional[dict] = None,
        fids: Optional[dict] = None,
    ):
        if chunks is not None:
            self.chunks = chunks
        else:
            self.chunks = [(path, attach or {}, None)] if path else []
        # current top-level column name -> Iceberg field id (metadata-
        # sized; lets executors resolve columns by PARQUET:field_id so
        # files written before a RENAME COLUMN read correctly)
        self.fids = fids
        # MOR delete coverage (r9): {"pos_parquet": [paths],
        # "eq_specs": [((path, key_field_ids, cur_key_names), seq)],
        # "files":
        # {localized_path: {"raw", "fseq", "dv"}}} — present only when
        # the snapshot carries delete files and the caller asked the
        # reader to apply them executor-side
        self.mor = mor


def _translate_filters(filters):
    """Spark DataSource filters → our Pred tuples (pruning only).
    Returns (pred_or_None, all_filters) — every filter is reported back
    as unhandled so Spark re-applies them exactly; translated ones
    additionally skip files via manifest/file stats."""
    conj = None
    ops = {
        EqualTo: "=",
        GreaterThan: ">",
        GreaterThanOrEqual: ">=",
        LessThan: "<",
        LessThanOrEqual: "<=",
    }
    for f in filters:
        op = ops.get(type(f))
        if op is None or len(f.attribute) != 1:
            continue
        term = (op, f.attribute[0], f.value)
        conj = term if conj is None else ("and", conj, term)
    return conj


def _data_col_map(pf, want_names, fids) -> dict:
    """current column name -> THIS file's column name (None = absent).
    Field-id resolution is authoritative when both the plan map and the
    file carry ids — a bare name match could be a DIFFERENT field after
    a swap rename (a→b, b→a); name resolution covers id-less files."""
    names = set(pf.schema_arrow.names)
    by_id = _file_cols_by_id(pf) if fids else {}
    out = {}
    for n in want_names:
        fid = (fids or {}).get(n)
        if by_id and fid is not None:
            out[n] = by_id.get(fid)
        elif n in names:
            out[n] = n
        else:
            out[n] = None
    return out


def _read_file(
    path: str, attach: dict, arrow_schema, row_groups=None, fids=None
) -> Iterator["pa.RecordBatch"]:
    """Executor-side: stream one parquet file (or a row-group slice of
    it) as Arrow batches cast to the table schema, attaching missing
    partition columns as constants.  Column-pruned: only the
    table-schema columns present in the file are read from disk.
    Columns resolve by PARQUET:field_id when ``fids`` is given (r10:
    rename-proof reads, parity with to_df's field-id remap)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    cmap = _data_col_map(pf, arrow_schema.names, fids)
    want = sorted({v for v in cmap.values() if v is not None})
    kwargs = {} if row_groups is None else {"row_groups": list(row_groups)}
    # batches 4× pyarrow's default: fewer Arrow-IPC round trips to the
    # JVM per scan (the per-batch framing cost dominates at 64k rows)
    for batch in pf.iter_batches(columns=want, batch_size=262144, **kwargs):
        cols = []
        for field in arrow_schema:
            src = cmap.get(field.name)
            if src is not None:
                cols.append(batch.column(src).cast(field.type))
            else:
                val = attach.get(field.name)
                cols.append(pa.array([val] * batch.num_rows, type=field.type))
        yield pa.RecordBatch.from_arrays(cols, schema=arrow_schema)


def _file_cols_by_id(pf) -> dict:
    """column name per PARQUET:field_id in this file ({} for id-less
    files written by tools that don't stamp ids)."""
    out: dict = {}
    for f in pf.schema_arrow:
        v = (f.metadata or {}).get(b"PARQUET:field_id")
        if v is not None:
            out[int(v)] = f.name
    return out


def _resolve_key_cols(pf, kids, knames) -> list:
    """This parquet file's column names for the given Iceberg field ids:
    resolved by PARQUET:field_id whenever the file carries ids — files
    written before a RENAME COLUMN store the OLD name, so a name lookup
    silently misses them and resurrects equality-deleted rows (r9
    ADVICE) — and by current name for id-less files.  ``None`` marks a
    field the file genuinely lacks (written before ADD COLUMN: its rows
    read NULL for that key, which delete keys written from concrete
    values never match)."""
    by_id = _file_cols_by_id(pf)
    if by_id:
        return [by_id.get(fid) for fid in kids]
    names = set(pf.schema_arrow.names)
    return [n if n in names else None for n in knames]


def _eq_dead_positions(pf, specs, column_cache=None) -> set:
    """Row positions in ``pf`` matched by the equality-delete specs
    ``[(path, key_field_ids, current_key_names)]`` — key columns
    resolved per-file by field id on BOTH sides (the delete parquet too:
    it carries the names current at ITS write time).  Matching is
    null-safe Python tuple equality, same as the batch anti-join.
    ``column_cache`` (dict) shares decoded data columns across calls so
    a caller probing prior AND fresh specs reads each column once."""
    import pyarrow.parquet as pq

    out: set = set()
    resolved = []
    cache = column_cache if column_cache is not None else {}
    for spec_path, kids, knames in specs:
        data_cols = _resolve_key_cols(pf, kids, knames)
        if any(c is None for c in data_cols):
            continue  # key field absent from this data file: NULL keys
        try:
            kf = pq.ParquetFile(spec_path)
        except Exception:
            continue  # expired delete file: nothing to apply
        del_cols = _resolve_key_cols(kf, kids, knames)
        if any(c is None for c in del_cols):
            continue
        keys = kf.read(columns=del_cols)
        if keys.num_rows == 0:
            continue
        keyset = set(zip(*(keys.column(c).to_pylist() for c in del_cols)))
        resolved.append((data_cols, keyset))
    if not resolved:
        return out
    missing = sorted(
        {c for data_cols, _ in resolved for c in data_cols} - set(cache)
    )
    if missing:
        data = pf.read(columns=missing)
        for c in missing:
            cache[c] = data.column(c).to_pylist()
    for data_cols, keyset in resolved:
        for i, v in enumerate(zip(*(cache[c] for c in data_cols))):
            if v in keyset:
                out.add(i)
    return out


def _dead_positions(path: str, entry: dict, mor: dict) -> set:
    """File-absolute row positions deleted under the snapshot's MOR
    coverage: parquet position deletes filtered to this file's recorded
    path (row-group pruning applies via the file_path filter), the
    file's DV blob, and equality-delete key files with sequence
    STRICTLY above the file's (the same rule as the batch anti-joins,
    table._apply_equality_deletes)."""
    import pyarrow.parquet as pq

    from datafusion_iceberg_spark.iceberg.puffin import read_dv_positions

    dead: set = set()
    raw = entry["raw"]
    for p in mor["pos_parquet"]:
        try:
            t2 = pq.read_table(
                p,
                columns=["file_path", "pos"],
                filters=[("file_path", "==", raw)],
            )
        except Exception:
            continue  # expired delete file: nothing to apply
        dead.update(int(x) for x in t2.column("pos").to_pylist())
    if entry.get("dv") is not None:
        dead.update(read_dv_positions(*entry["dv"]))
    eq = [spec for spec, sq in mor["eq_specs"] if sq > entry["fseq"]]
    if eq:
        dead.update(_eq_dead_positions(pq.ParquetFile(path), eq))
    return dead


def _read_file_masked(
    path: str, attach: dict, arrow_schema, row_groups, dead: set, fids=None
) -> Iterator["pa.RecordBatch"]:
    """:func:`_read_file` minus the rows at ``dead`` file-absolute
    positions.  Row-group slices map batch rows to absolute positions
    via the footer's per-group row counts, so a large file split across
    partitions masks each slice correctly."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    md = pf.metadata
    starts, acc = [], 0
    for i in range(md.num_row_groups):
        starts.append(acc)
        acc += md.row_group(i).num_rows
    rgs = (
        list(row_groups)
        if row_groups is not None
        else list(range(md.num_row_groups))
    )
    slice_abs = np.concatenate(
        [
            np.arange(
                starts[i], starts[i] + md.row_group(i).num_rows, dtype=np.int64
            )
            for i in rgs
        ]
    ) if rgs else np.empty(0, dtype=np.int64)
    dead_arr = np.fromiter(dead, dtype=np.int64) if dead else None
    cmap = _data_col_map(pf, arrow_schema.names, fids)
    want = sorted({v for v in cmap.values() if v is not None})
    done = 0
    for batch in pf.iter_batches(columns=want, batch_size=262144, row_groups=rgs):
        n = batch.num_rows
        abs_pos = slice_abs[done:done + n]
        done += n
        if dead_arr is not None:
            keep = ~np.isin(abs_pos, dead_arr)
            if not keep.all():
                batch = batch.take(pa.array(np.nonzero(keep)[0]))
        if batch.num_rows == 0:
            continue
        cols = []
        for field in arrow_schema:
            src = cmap.get(field.name)
            if src is not None:
                cols.append(batch.column(src).cast(field.type))
            else:
                val = attach.get(field.name)
                cols.append(
                    pa.array([val] * batch.num_rows, type=field.type)
                )
        yield pa.RecordBatch.from_arrays(cols, schema=arrow_schema)


_OPEN_COST_BYTES = 4 * 1024 * 1024  # Spark's filesOpenCostInBytes default
_MAX_SPLIT_BYTES = 128 * 1024 * 1024  # Spark's maxPartitionBytes default


def _split_target_bytes(total_bytes: int, n_files: int) -> int:
    """Spark's maxSplitBytes formula: cap at maxPartitionBytes, but
    shrink toward total/defaultParallelism so small tables still fan out
    across the cluster's cores (each file also pays an open cost, which
    keeps thousands of tiny files from collapsing into one task)."""
    min_parts = max(int(os.environ.get("SPARK_GRAFT_CPUS", "32")), 1)
    padded = total_bytes + n_files * _OPEN_COST_BYTES
    return int(min(_MAX_SPLIT_BYTES, max(_OPEN_COST_BYTES, padded // min_parts + 1)))


def _plan_files(
    table,
    filters,
    snapshot_id=None,
    from_snapshot_id=None,
    _added_only=False,
    apply_deletes=False,
    file_filter=None,
    group_by=None,
):
    """Driver-side planning shared by batch and streaming: pruned file
    list (optionally the incremental diff) → bin-packed partitions.
    Small files coalesce up to the split target; files larger than the
    target split at row-group boundaries (one driver footer read per
    LARGE file only — small files plan purely from manifest stats).
    MOR snapshots (r9): with ``apply_deletes`` the partitions carry the
    snapshot's delete coverage and the executor masks dead rows per file
    (parquet position deletes filtered by path, DV blobs, equality
    deletes with sequence > the file's — the same kernels the CDC
    stream uses); without it they refuse (the streaming append tail
    passes ``_added_only``: deletes bind to file paths that existed
    when they committed, so files ADDED by a snapshot read clean).

    ``group_by`` (r15): a partition-backed source column — partitions
    are then aligned to the table's PARTITION GROUPS (one InputPartition
    per occupied group, NULL-key files pooled into one more) instead of
    bin-packed by size.  Every task holds ALL rows for its group's key
    values, so a per-partition operator keyed on that column
    (mapInArrow aggregation, per-key dedup) is globally exact — the
    storage-partitioned execution contract (table.rs:128-131,
    SPARK-37375) delivered through the DataSource split handoff with
    ONE plan subtree however many groups the table has."""
    meta = table.metadata
    mor = None
    if not _added_only:
        pos = table.position_delete_files(snapshot_id)
        eqs = table.equality_delete_files(snapshot_id)
        if pos or eqs:
            if not apply_deletes:
                raise ValueError(
                    "iceberg_py: snapshot has delete files; use "
                    "IcebergTable.to_df or a reader planned with "
                    "apply_deletes"
                )
            from datafusion_iceberg_spark.iceberg.table import _file_seq

            seqs = meta.snapshot_sequences()
            names_by_id = {v: k for k, v in meta.field_ids_by_name().items()}
            mor = {
                "pos_parquet": [
                    meta.localize(d.path)
                    for d in pos
                    if d.referenced_data_file is None
                ],
                "dv_by_raw": {
                    d.referenced_data_file: (
                        meta.localize(d.path),
                        int(d.content_offset or 0),
                        int(d.content_size_in_bytes or 0),
                    )
                    for d in pos
                    if d.referenced_data_file is not None
                },
                "eq_specs": [
                    (
                        (
                            meta.localize(d.path),
                            sorted(d.equality_ids),
                            [names_by_id[i] for i in sorted(d.equality_ids)],
                        ),
                        _file_seq(seqs, d, 1 << 31),
                    )
                    for d in eqs
                ],
                "files": {},
            }
    files = table.files(filters, snapshot_id=snapshot_id)
    if from_snapshot_id is not None:
        old = {f.path for f in table.files(filters, snapshot_id=from_snapshot_id)}
        files = [f for f in files if f.path not in old]
    if file_filter is not None:
        # rate-limited streaming: keep only the offset window's path
        # slice (mid-snapshot boundaries, max_files_per_batch)
        files = [f for f in files if f.path in file_filter]
    if not files:
        return []
    for f in files:
        if (f.file_format or "PARQUET").upper() != "PARQUET":
            from datafusion_iceberg_spark.iceberg.table import (
                UnsupportedFileFormatError,
            )

            raise UnsupportedFileFormatError(
                f"iceberg_py datasource: data file {f.path} has "
                f"file_format={f.file_format}; the executor read path is "
                "parquet-only (row-group splits, _metadata row positions) "
                "— scan ORC tables through IcebergTable.to_df instead"
            )
    sizes = [f.file_size_in_bytes or 0 for f in files]
    target = _split_target_bytes(sum(sizes), len(files))

    # (path, attach, row_groups, est_bytes) chunks: whole small files,
    # row-group slices of large ones
    import pyarrow.parquet as pq

    if mor is not None:
        from datafusion_iceberg_spark.iceberg.table import _file_seq

        seqs2 = meta.snapshot_sequences()
        for f in files:
            lp = meta.localize(f.path)
            mor["files"][lp] = {
                "raw": f.path,
                "fseq": _file_seq(seqs2, f, -1),
                "dv": mor["dv_by_raw"].get(f.path),
            }
    chunks = []
    for f, size in zip(files, sizes):
        path = meta.localize(f.path)
        attach = {k: v for k, v in (f.partition or {}).items()}
        if size > target * 3 // 2:
            md = pq.ParquetFile(path).metadata
            cur, cur_b = [], 0
            for i in range(md.num_row_groups):
                rg = md.row_group(i)
                # compressed on-disk bytes (sum over columns; the
                # row-group-level figure is uncompressed)
                b = (
                    sum(
                        rg.column(c).total_compressed_size or 0
                        for c in range(rg.num_columns)
                    )
                    or rg.total_byte_size
                    or 1
                )
                cur.append(i)
                cur_b += b
                if cur_b >= target:
                    chunks.append((path, attach, cur, cur_b))
                    cur, cur_b = [], 0
            if cur:
                chunks.append((path, attach, cur, cur_b))
        else:
            chunks.append((path, attach, None, size + _OPEN_COST_BYTES))

    # Column-resolution guard: executors resolve columns by
    # PARQUET:field_id (r10 — renamed files read correctly, parity with
    # to_df) with a name fallback for id-less files.  One footer probe
    # per planning call still refuses when a column resolves NOWHERE in
    # the probe file (written before ADD COLUMN: to_df fills the v3
    # initial-default there; this reader would fill plain NULL).
    fid_map = meta.field_ids_by_name()
    probe = pq.ParquetFile(chunks[0][0])
    cmap0 = _data_col_map(probe, meta.struct_type().names, fid_map)
    missing = [
        fld
        for fld, src in cmap0.items()
        if src is None and fld not in chunks[0][1]
    ]
    if missing:
        raise ValueError(
            f"iceberg_py: file schema lacks column(s) {missing} (added "
            "after the file was written?) — use IcebergTable.to_df, "
            "which fills initial-defaults"
        )

    if group_by is not None:
        # partition-group-aligned planning: one InputPartition per
        # occupied group (chunks of a group stay together; row-group
        # splits of a large file land in the SAME partition, preserving
        # key completeness), NULL-key files pooled into one partition
        from datafusion_iceberg_spark.iceberg.spj import (
            _partition_backed_key,
            group_data_files,
        )

        _, kind = _partition_backed_key(table, [group_by])
        groups, null_files = group_data_files(
            table, files, [group_by], [kind]
        )
        gid_by_path = {}
        for key, fl in groups.items():
            for f in fl:
                gid_by_path[meta.localize(f.path)] = key
        for f in null_files:
            gid_by_path[meta.localize(f.path)] = ("__null__",)
        by_group: dict = {}
        for path, attach, rgs, _b in chunks:
            by_group.setdefault(gid_by_path[path], []).append(
                (path, attach, rgs)
            )
        return [
            IcebergFilePartition(chunks=by_group[k], mor=mor, fids=fid_map)
            for k in sorted(by_group, key=repr)
        ]

    # greedy bin-pack into partitions of ~target bytes (Spark's
    # FilePartition.getFilePartitions shape)
    parts, cur, cur_b = [], [], 0
    for path, attach, rgs, b in chunks:
        if cur and cur_b + b > target:
            parts.append(
                IcebergFilePartition(chunks=cur, mor=mor, fids=fid_map)
            )
            cur, cur_b = [], 0
        cur.append((path, attach, rgs))
        cur_b += b
    if cur:
        parts.append(IcebergFilePartition(chunks=cur, mor=mor, fids=fid_map))
    return parts


_PRED_OPS = {
    ">": "greater",
    ">=": "greater_equal",
    "<": "less",
    "<=": "less_equal",
    "=": "equal",
    "==": "equal",
    "!=": "not_equal",
    "<>": "not_equal",
}


def _apply_simple_pred(t, filt):
    """Filter a pyarrow Table by conjunctive (col, op, literal) tuples —
    SQL comparison semantics (NULL compares to NULL, filtered out, which
    is pyarrow's default null_selection_behavior='drop')."""
    import pyarrow.compute as pc

    mask = None
    for col, op, val in filt:
        m = getattr(pc, _PRED_OPS[op])(t.column(col), val)
        mask = m if mask is None else pc.and_kleene(mask, m)
    return t.filter(mask) if mask is not None else t


def _arrow_grouped_agg(batches, gcols, agg_spec, filt, arrow_out):
    """Per-partition pyarrow hash aggregation with incremental partial
    combine (task memory bounded by the partition's distinct keys, not
    its rows).  ``agg_spec``: [(out_name, fn, source_col_or_None), ...]
    with fn in count/sum/min/max/avg; ``filt``: optional conjunctive
    (col, op, literal) tuples applied per batch before aggregation.
    Shared by the fused DataSource aggregate (one Python crossing) and
    spj.bucket_agg_grouped's mapInArrow fallback."""
    import pyarrow as pa
    import pyarrow.compute as pc

    # per-fn partial aggregates and their combine re-aggregates
    partial_aggs: list[tuple] = []
    for name, fn, col in agg_spec:
        if fn == "count" and col is None:
            partial_aggs.append(([], "count_all"))
        elif fn == "count":
            partial_aggs.append((col, "count"))
        elif fn == "avg":
            partial_aggs.append((col, "sum"))
            partial_aggs.append((col, "count"))
        else:
            partial_aggs.append((col, fn))
    seen: dict[str, tuple] = {}
    for p in partial_aggs:
        pname = "count_all" if p[1] == "count_all" else f"{p[0]}_{p[1]}"
        seen.setdefault(pname, p)
    plist = list(seen.values())
    combine_fn = {
        "count_all": "sum",
        "count": "sum",
        "sum": "sum",
        "min": "min",
        "max": "max",
    }

    acc = None
    for batch in batches:
        t = pa.Table.from_batches([batch])
        if filt:
            t = _apply_simple_pred(t, filt)
        if t.num_rows == 0:
            continue
        part = t.group_by(gcols, use_threads=False).aggregate(plist)
        if acc is None:
            acc = part
        else:
            both = pa.concat_tables([acc, part], promote_options="permissive")
            re_aggs = []
            rename = {}
            for pname, p in seen.items():
                cf = combine_fn[p[1]]
                re_aggs.append((pname, cf))
                rename[f"{pname}_{cf}"] = pname
            acc = both.group_by(gcols, use_threads=False).aggregate(re_aggs)
            acc = acc.rename_columns(
                [rename.get(c, c) for c in acc.column_names]
            )
    if acc is None or acc.num_rows == 0:
        return
    cols = [acc.column(c) for c in gcols]
    for name, fn, col in agg_spec:
        if fn == "count" and col is None:
            cols.append(acc.column("count_all"))
        elif fn == "avg":
            s = acc.column(f"{col}_sum")
            n = acc.column(f"{col}_count")
            cols.append(
                pc.if_else(
                    pc.equal(n, 0),
                    pa.nulls(acc.num_rows, pa.float64()),
                    pc.divide(
                        pc.cast(s, pa.float64()),
                        pc.cast(n, pa.float64()),
                    ),
                )
            )
        else:
            cols.append(acc.column(f"{col}_{fn}"))
    out = pa.table(cols, names=[*gcols, *[s0[0] for s0 in agg_spec]])
    yield from out.cast(arrow_out).to_batches()


class IcebergPyReader(DataSourceReader):
    def __init__(
        self, table, schema, group_by=None, file_filter=None, agg=None
    ):
        self._table = table
        self._schema = schema
        self._pred = None
        self._group_by = group_by
        self._file_filter = file_filter
        # fused per-partition aggregation (guide §4: the mapInArrow
        # spelling ships every fact row JVM→Python a SECOND time after
        # the Python source already produced it — aggregating inside the
        # reader crosses the boundary once, with only the aggregated
        # groups ever reaching the JVM): dict with group_cols, spec,
        # filter (conjunctive tuples or None) and read_st (the scan
        # schema; self._schema is the AGGREGATED output schema then)
        self._agg = agg

    def pushFilters(self, filters):
        self._pred = _translate_filters(filters)
        # report everything unhandled: pruning is only a file skip,
        # Spark's exact re-filter stays in the plan
        return filters

    def partitions(self):
        parts = _plan_files(
            self._table,
            self._pred,
            apply_deletes=True,
            group_by=self._group_by,
            file_filter=self._file_filter,
        )
        if not parts:
            # Spark requires >= 1 partition; an empty file emits no batches
            return [IcebergFilePartition("", {})]
        return parts

    def _scan_batches(self, partition: IcebergFilePartition, arrow_schema):
        mor = getattr(partition, "mor", None)
        fids = getattr(partition, "fids", None)
        for path, attach, rgs in partition.chunks:
            entry = (mor or {}).get("files", {}).get(path)
            if entry is not None:
                dead = _dead_positions(path, entry, mor)
                yield from _read_file_masked(
                    path, attach, arrow_schema, rgs, dead, fids=fids
                )
            else:
                yield from _read_file(
                    path, attach, arrow_schema, row_groups=rgs, fids=fids
                )

    def read(self, partition: IcebergFilePartition):
        from pyspark.sql.pandas.types import to_arrow_schema

        if self._agg is not None:
            yield from _arrow_grouped_agg(
                self._scan_batches(
                    partition, to_arrow_schema(self._agg["read_st"])
                ),
                self._agg["group_cols"],
                self._agg["spec"],
                self._agg.get("filter"),
                to_arrow_schema(self._schema),
            )
            return
        yield from self._scan_batches(
            partition, to_arrow_schema(self._schema)
        )


class IcebergPyStreamReader(DataSourceStreamReader):
    """Tail APPEND snapshots: offset = snapshot ordinal (commit order).
    Each micro-batch plans the file diff (start, end] on the driver —
    metadata-only — and packs the added files into bin-packed partitions.

    ``max_snapshots_per_batch`` (option) rate-limits a bursty table:
    each micro-batch advances at most that many snapshots, so a backlog
    of N commits drains in bounded batches instead of one giant catch-up
    batch (the analogue of Iceberg-Spark's max-files-per-micro-batch).
    The cap is driven off the last offset this reader planned or saw in
    ``partitions``; after a checkpoint restart the reader's base resets
    to -1, which can cost up to ``backlog/max`` EMPTY catch-up batches
    (eo <= checkpointed start plans nothing) before the cap re-syncs —
    bounded, documented, and never a correctness issue because offsets
    live in the checkpoint.

    ``max_files_per_batch`` (option, r11) rate-limits at FILE
    granularity: offsets become ``{"ordinal": o, "file": f}`` — all
    snapshots ≤ o consumed plus the first f added-files (path-sorted,
    so the slice is deterministic) of the snapshot at o+1 — so ONE
    backfill commit that added 10⁴ files drains as 10⁴/max bounded
    micro-batches instead of a single giant first batch.  A snapshot's
    added set is immutable once committed, which makes the mid-snapshot
    offset replayable from any checkpoint.  Old ``{"ordinal"}``-only
    checkpoints read as f=0 (snapshot boundary) — upgrading a running
    stream is safe.

    Trigger interaction (both caps): ``availableNow`` runs take ONE
    capped window per invocation — pyspark's DataSource stream wrapper
    has no ``SupportsTriggerAvailableNow`` hook, so Spark captures a
    single ``latestOffset`` as the run's target (measured r11).  The
    checkpoint carries the offset, so repeated availableNow runs drain
    a backlog incrementally (the scheduled-job shape); a continuously
    TRIGGERED stream (processingTime) drains it fully in bounded
    batches."""

    def __init__(
        self,
        root: str,
        schema,
        max_snapshots_per_batch=None,
        overwrite_diff_buckets=None,
        max_files_per_batch=None,
        pair_keys=None,
    ):
        self._root = root
        self._schema = schema
        # cdc mode, opt-in (``cdc_pair_keys``): pair an overwrite's
        # delete+insert rows sharing the schema's identifier-field tuple
        # into update_before/update_after — the v2-table analogue of the
        # row-lineage pairing (which needs no opt-in: _row_id is exact)
        self._pair_keys = str(pair_keys).strip().lower() in (
            "1",
            "true",
            "yes",
        )
        self._max_snaps = max_snapshots_per_batch
        self._max_files = (
            int(max_files_per_batch) if max_files_per_batch else None
        )
        if self._max_files is not None and self._max_files < 1:
            raise ValueError("max_files_per_batch must be >= 1")
        # cdc mode: parallelism of the overwrite net-diff (each bucket
        # re-reads the changed files, keeps 1/n of the rows)
        self._ow_buckets = int(overwrite_diff_buckets or 4)
        # highest (ordinal, file) planned/committed — the rate-limit base
        self._seen: Optional[tuple] = None
        self._added_cache: dict = {}  # ordinal -> path-sorted added files

    def _load(self):
        from datafusion_iceberg_spark.iceberg.table import IcebergTable

        return IcebergTable.load(self._root)

    def _fids(self) -> dict:
        """current top-level column name -> Iceberg field id, for
        executor-side column resolution (pre-RENAME files store old
        names).  One metadata load per deserialized reader, cached —
        Python workers are reused across tasks."""
        m = getattr(self, "_fids_cache", None)
        if m is None:
            m = self._load().metadata.field_ids_by_name()
            self._fids_cache = m
        return m

    def _ordinal_to_snapshot(self, table, ordinal: int) -> Optional[int]:
        for sid, o in table.metadata.snapshot_ordinals().items():
            if o == ordinal:
                return sid
        return None

    def _added_paths(self, table, ordinal: int) -> list:
        """Path-sorted RAW paths added by the snapshot at ``ordinal``
        (live files there minus live files one ordinal back).  Immutable
        once committed, so cached per reader."""
        hit = self._added_cache.get(ordinal)
        if hit is not None:
            return hit
        cur = {f.path for f in table.files(
            None, snapshot_id=self._ordinal_to_snapshot(table, ordinal)
        )}
        if ordinal > 0:
            prev = {f.path for f in table.files(
                None,
                snapshot_id=self._ordinal_to_snapshot(table, ordinal - 1),
            )}
            cur -= prev
        out = sorted(cur)
        self._added_cache[ordinal] = out
        return out

    def initialOffset(self) -> dict:
        return {"ordinal": -1}

    @staticmethod
    def _off(d: dict) -> tuple:
        return (d["ordinal"], d.get("file", 0))

    def latestOffset(self) -> dict:
        table = self._load()
        ords = table.metadata.snapshot_ordinals()
        latest = max(ords.values()) if ords else -1
        base_o, base_f = (-1, 0) if self._seen is None else self._seen
        if self._max_snaps:
            latest = min(latest, base_o + int(self._max_snaps))
        if self._max_files is None:
            # no file cap: consume to the (snapshot-capped) tip in one
            # batch — a partial offset left by a previously file-capped
            # run finishes along the way
            end = (latest, 0) if latest > base_o else (base_o, base_f)
        else:
            o, f, budget = base_o, base_f, self._max_files
            while o < latest and budget > 0:
                rem = len(self._added_paths(table, o + 1)) - f
                if rem <= budget:
                    budget -= rem
                    o, f = o + 1, 0
                else:
                    f += budget
                    budget = 0
            end = (o, f)
        if self._seen is None or end > self._seen:
            self._seen = end
        return {"ordinal": end[0], **({"file": end[1]} if end[1] else {})}

    def partitions(self, start: dict, end: dict):
        (so, sf), (eo, ef) = self._off(start), self._off(end)
        resync = max((so, sf), (eo, ef))
        if self._seen is None or resync > self._seen:
            self._seen = resync  # restart replay: resync the cap base
        if (eo, ef) <= (so, sf):
            return [IcebergFilePartition("", {})]
        table = self._load()
        file_filter = None
        if sf or ef:
            # mid-snapshot boundaries: keep only the allowed path slice
            # of each partially-consumed snapshot (full snapshots in
            # between pass through)
            hi = eo + 1 if ef else eo
            allowed: set = set()
            for o in range(so + 1, hi + 1):
                paths = self._added_paths(table, o)
                lo_i = sf if o == so + 1 else 0
                hi_i = ef if (ef and o == eo + 1) else len(paths)
                allowed.update(paths[lo_i:hi_i])
            parts = _plan_files(
                table,
                None,
                snapshot_id=self._ordinal_to_snapshot(table, hi),
                from_snapshot_id=(
                    self._ordinal_to_snapshot(table, so) if so >= 0 else None
                ),
                file_filter=allowed,
            )
            return parts or [IcebergFilePartition("", {})]
        parts = _plan_files(
            table,
            None,
            snapshot_id=self._ordinal_to_snapshot(table, eo),
            from_snapshot_id=(
                self._ordinal_to_snapshot(table, so) if so >= 0 else None
            ),
        )
        return parts or [IcebergFilePartition("", {})]

    def read(self, partition: IcebergFilePartition):
        from pyspark.sql.pandas.types import to_arrow_schema

        arrow_schema = to_arrow_schema(self._schema)
        fids = getattr(partition, "fids", None)
        for path, attach, rgs in partition.chunks:
            yield from _read_file(
                path, attach, arrow_schema, row_groups=rgs, fids=fids
            )

    def commit(self, end: dict) -> None:
        pass


class IcebergCdcDeletePartition(InputPartition):
    """One CDC delete unit: the rows of ``path`` at the DV bitmap DELTA
    positions (new blob minus the file's prior blob), tagged with the
    change columns via ``attach``."""

    def __init__(
        self, path: str, attach: dict, new_blob, old_blob, first_row_id=None
    ):
        self.path = path
        self.attach = attach
        self.new_blob = new_blob  # (puffin_path, offset, length)
        self.old_blob = old_blob  # same, or None
        # v3 row lineage: base id for position-derived _row_id values
        self.first_row_id = first_row_id


def _localize_recorded_path(path: str, location: str, root: str) -> str:
    """Executor-side replica of ``metadata.localize`` (table.rs:116-126
    analogue): map a path string RECORDED inside a delete file / manifest
    onto the actual on-disk root.  Shipped as (location, root) so CDC
    partitions need no metadata object in the task."""
    loc = location.rstrip("/")
    for scheme in ("file://", "s3a://", "s3://"):
        if path.startswith(scheme):
            path = path[len(scheme):]
        if loc.startswith(scheme):
            loc = loc[len(scheme):]
    if path.startswith(loc + "/"):
        return os.path.join(root, path[len(loc) + 1:])
    if path.startswith(loc):
        return root
    return path


class IcebergCdcPosDeletePartition(InputPartition):
    """One CDC delete unit for a PARQUET position-delete snapshot (r8,
    VERDICT r7 task 7): one FRESH delete file's (file_path, pos) rows,
    minus positions already deleted for the same targets in the prior
    snapshot (prior parquet delete files + prior DV blobs), materialized
    from the target data files.  Unlike DVs (merged bitmaps), parquet
    position-delete files are additive — our writer emits only live-row
    positions, but a foreign double-delete must not re-emit, so the
    prior subtraction reads prior delete files filtered to this
    partition's targets."""

    def __init__(
        self,
        delete_file: str,
        attach: dict,
        prior_delete_files: list,
        prior_dv_by_raw_target: dict,
        location: str,
        root: str,
        frid_map: dict | None = None,
    ):
        self.delete_file = delete_file          # localized fresh file
        self.attach = attach
        self.prior_delete_files = prior_delete_files  # localized paths
        # raw target path -> (puffin_path, offset, length)
        self.prior_dv_by_raw_target = prior_dv_by_raw_target
        self.location = location
        self.root = root
        # localized target -> first_row_id (lineage tables only)
        self.frid_map = frid_map or {}


class IcebergCdcEqDeletePartition(InputPartition):
    """One CDC delete unit for an EQUALITY-DELETE snapshot (r8): one
    candidate DATA file vs the snapshot's fresh equality-delete key
    files.  The executor reads only the data file's KEY columns, drops
    rows the prior snapshot had already deleted (position deletes, DV
    blob, and older equality deletes with sequence > the file's), then
    emits the OLD images of the rows whose key tuple null-safe-matches
    a fresh key — the same strictly-before rule the batch scan applies
    (:func:`table._apply_equality_deletes`).  Null-safe matching rides
    Python tuple equality ((1, None) == (1, None)) over a key-tuple
    set; at production batch sizes the kernel's per-file row loop
    bounds at the file's row count with a CDC-sized key set."""

    def __init__(
        self,
        path: str,
        attach: dict,
        fresh_specs: list,      # [(eq file, [key field ids], [cur names])]
        prior_eq: list,         # same shape, already seq-filtered
        prior_parquet: list,    # localized prior position-delete files
        prior_dv_blob,          # (path, offset, length) | None
        raw_path: str,          # as recorded (file_path filter key)
        first_row_id=None,
    ):
        self.path = path
        self.attach = attach
        self.fresh_specs = fresh_specs
        self.prior_eq = prior_eq
        self.prior_parquet = prior_parquet
        self.prior_dv_blob = prior_dv_blob
        self.raw_path = raw_path
        self.first_row_id = first_row_id


class IcebergCdcOverwriteDiffPartition(InputPartition):
    """One hash bucket of a file-REMOVING overwrite snapshot's net row
    diff (r9 — closes the last CDC fence): the executor reads the
    REMOVED files (masked by the prior snapshot's delete coverage so
    already-dead rows don't resurface) and the ADDED files, computes the
    multiset difference per canonical row key, and emits
    removed−added as ``delete`` rows and added−removed as ``insert``
    rows — carried rows cancel exactly, the same EXCEPT-ALL math as the
    batch ``changelog_df`` overwrite legs (iceberg/table.py:755).

    Bucketing: every bucket reads all changed files but keeps only rows
    whose deterministic key hash lands in its bucket, trading
    ``n_buckets``× read amplification for n-way parallelism and a
    1/n-size hash map — the knob (``overwrite_diff_buckets``) exists
    because a DataSource planner cannot run a distributed EXCEPT ALL;
    histories dominated by huge overwrites belong on the batch
    changelog."""

    def __init__(
        self,
        removed,        # [(localized_path, raw_path, file_seq)]
        added,          # [localized_path]
        attach_delete: dict,
        attach_insert: dict,
        prior_parquet,  # localized prior position-delete files
        prior_dv_by_raw,  # raw target -> (puffin, off, len)
        prior_eq,       # [((eq file, [key field ids], [cur names]), seq)]
        bucket: int,
        n_buckets: int,
        frid_map=None,  # localized path -> first_row_id (lineage tables)
        key_cols=None,  # identifier-field names: keyed update pairing
    ):
        self.key_cols = key_cols
        self.removed = removed
        self.added = added
        self.attach_delete = attach_delete
        self.attach_insert = attach_insert
        self.prior_parquet = prior_parquet
        self.prior_dv_by_raw = prior_dv_by_raw
        self.prior_eq = prior_eq
        self.bucket = bucket
        self.n_buckets = n_buckets
        self.frid_map = frid_map or {}


class IcebergPyCdcStreamReader(IcebergPyStreamReader):
    """CDC flavor of the stream reader (``mode=cdc``): each micro-batch
    emits the ROW-LEVEL diff of its snapshot range with ``_change_type``
    / ``_change_ordinal`` columns — the streaming analogue of
    ``changelog_df``.

    - append snapshots → the added files, read directly, tagged
      ``insert`` (the change columns ride the existing attach-constants
      mechanism, so bin-packing and column pruning are unchanged);
    - deletion-vector delete snapshots → per targeted file, the BITMAP
      DELTA positions (new blob minus prior blob) decoded executor-side
      and taken from the data file — the same math as ``changelog_df``'s
      DV fast path, with no Spark plan needed inside the DataSource;
    - replace (compaction) snapshots → nothing (no logical change);
    - parquet position-delete snapshots → per fresh delete file, its
      positions minus the prior snapshot's deletes for the same
      targets, materialized from the target data files;
    - equality-delete snapshots (incl. UPSERT commits) → per candidate
      strictly-older data file, the rows whose key tuples null-safe
      match the fresh key files, minus rows already deleted (r8);
    - file-REMOVING overwrites (COW DELETE/UPDATE/MERGE, INSERT
      OVERWRITE) → the net row diff, computed executor-side per hash
      bucket (``overwrite_diff_buckets`` partitions re-read the changed
      files and keep 1/n of the rows each): removed rows masked by the
      prior snapshot's delete coverage, multiset-EXCEPT the added rows —
      the same math as ``changelog_df``'s overwrite legs (r9).

    On a v3 ROW-LINEAGE table the feed also carries ``_row_id``
    (resolved per row: the file's materialized column when present,
    else ``first_row_id`` + position) and overwrite snapshots pair a
    delete+insert sharing one id into ``update_before``/``update_after``
    (r10 — buckets partition by id, so the pairing is bucket-local; no
    fences remain) — the keyed CDC stream downstream MERGE consumers
    apply by identity.
    """

    def partitions(self, start: dict, end: dict):
        so, eo = start["ordinal"], end["ordinal"]
        resync = (max(so, eo), 0)
        if self._seen is None or resync > self._seen:
            self._seen = resync
        if eo <= so:
            return [IcebergFilePartition("", {})]
        table = self._load()
        meta = table.metadata
        ords = meta.snapshot_ordinals()
        window = sorted(
            (o, sid) for sid, o in ords.items() if so < o <= eo
        )
        parts: list = []
        for o, sid in window:
            snap = next(
                s for s in meta.snapshots if s.snapshot_id == sid
            )
            op = snap.summary.get("operation", "")
            if op == "replace":
                continue
            prev_sid = self._ordinal_to_snapshot(table, o - 1)
            attach = {"_change_ordinal": o}
            lineage = any(f.name == "_row_id" for f in self._schema.fields)
            frid_map = (
                {
                    meta.localize(f.path): f.first_row_id
                    for f in table.files(snapshot_id=sid)
                }
                if lineage
                else {}
            )
            if op == "append":
                for part in _plan_files(
                    table,
                    None,
                    snapshot_id=sid,
                    from_snapshot_id=prev_sid,
                    _added_only=True,
                ):
                    part.chunks = [
                        (
                            p,
                            {
                                **a,
                                **attach,
                                "_change_type": "insert",
                                **(
                                    {"_cdc_first_row_id": frid_map.get(p)}
                                    if lineage
                                    else {}
                                ),
                            },
                            rgs,
                        )
                        for p, a, rgs in part.chunks
                    ]
                    parts.append(part)
                continue
            # delete / row-delta snapshot: DV-delete histories stream
            # (optionally with replacement/insert files — the MOR
            # UPDATE/MERGE row-delta shape); anything that REMOVES files
            # or adds non-DV deletes needs the batch changelog's
            # EXCEPT-ALL legs
            old_files = (
                {f.path for f in table.files(snapshot_id=prev_sid)}
                if prev_sid is not None
                else set()
            )
            new_files = {f.path for f in table.files(snapshot_id=sid)}
            removed_files = old_files - new_files
            added_files = new_files - old_files
            old_pos = (
                table.position_delete_files(snapshot_id=prev_sid)
                if prev_sid is not None
                else []
            )
            new_pos = table.position_delete_files(snapshot_id=sid)
            old_paths = {d.path for d in old_pos}
            fresh = [d for d in new_pos if d.path not in old_paths]
            fresh_eq = [
                d
                for d in table.equality_delete_files(snapshot_id=sid)
                if d.path
                not in {
                    e.path
                    for e in (
                        table.equality_delete_files(snapshot_id=prev_sid)
                        if prev_sid is not None
                        else []
                    )
                }
            ]
            fresh_dv = [
                d for d in fresh if d.referenced_data_file is not None
            ]
            fresh_parquet = [
                d for d in fresh if d.referenced_data_file is None
            ]
            if removed_files and not (fresh or fresh_eq):
                # file-REMOVING overwrite (COW DELETE/UPDATE/MERGE,
                # INSERT OVERWRITE): net row diff executor-side.  With
                # no fresh delete files in the commit, the added files
                # are necessarily clean (prior delete files cannot
                # reference files that did not exist), so the diff is
                # removed-masked-by-prior-coverage vs added.
                from datafusion_iceberg_spark.iceberg.table import (
                    _file_seq,
                )

                names_by_id = {
                    v: k for k, v in meta.field_ids_by_name().items()
                }
                seqs = meta.snapshot_sequences()
                prior_parquet3 = [
                    meta.localize(d.path)
                    for d in old_pos
                    if d.referenced_data_file is None
                ]
                prior_dv_by_raw = {
                    d.referenced_data_file: (
                        meta.localize(d.path),
                        int(d.content_offset or 0),
                        int(d.content_size_in_bytes or 0),
                    )
                    for d in old_pos
                    if d.referenced_data_file is not None
                }
                prior_eq3 = [
                    (
                        (
                            meta.localize(d.path),
                            sorted(d.equality_ids),
                            [names_by_id[i] for i in sorted(d.equality_ids)],
                        ),
                        _file_seq(seqs, d, 1 << 31),
                    )
                    for d in (
                        table.equality_delete_files(snapshot_id=prev_sid)
                        if prev_sid is not None
                        else []
                    )
                ]
                prev_by_path = {
                    f.path: f
                    for f in (
                        table.files(snapshot_id=prev_sid)
                        if prev_sid is not None
                        else []
                    )
                }
                removed_specs = [
                    (
                        meta.localize(p),
                        p,
                        _file_seq(seqs, prev_by_path[p], -1),
                    )
                    for p in sorted(removed_files)
                ]
                added_paths = [meta.localize(p) for p in sorted(added_files)]
                # lineage: ship first_row_id for BOTH sides (removed
                # files resolve through the PREVIOUS snapshot's
                # manifests; frid_map above covers the new side)
                frid_all = dict(frid_map)
                if lineage:
                    for p in removed_files:
                        frid_all[meta.localize(p)] = prev_by_path[
                            p
                        ].first_row_id
                key_cols = None
                if self._pair_keys and not lineage:
                    key_cols = meta.identifier_field_names()
                    if not key_cols:
                        raise ValueError(
                            "cdc_pair_keys: the table declares no "
                            "identifier-field-ids — set them "
                            "(set_identifier_fields) or enable row "
                            "lineage for exact pairing"
                        )
                    plan_cols = {f.name for f in self._schema.fields}
                    missing = [c for c in key_cols if c not in plan_cols]
                    if missing:
                        raise ValueError(
                            "cdc_pair_keys: identifier column(s) "
                            f"{missing} are not in the stream's "
                            "projected schema — the executor pairs "
                            "images by that tuple, so select them"
                        )
                n_buckets = max(1, int(self._ow_buckets))
                for b in range(n_buckets):
                    parts.append(
                        IcebergCdcOverwriteDiffPartition(
                            removed_specs,
                            added_paths,
                            {**attach, "_change_type": "delete"},
                            {**attach, "_change_type": "insert"},
                            prior_parquet3,
                            prior_dv_by_raw,
                            prior_eq3,
                            b,
                            n_buckets,
                            frid_map=frid_all if lineage else None,
                            key_cols=key_cols,
                        )
                    )
                continue
            streamable = not removed_files and (fresh or fresh_eq)
            if not streamable:
                raise ValueError(
                    "iceberg_py cdc stream: snapshot "
                    f"{sid} ({op!r}) mixes file removal with fresh "
                    "delete files — read this history with the batch "
                    "changelog (changelog_df) instead"
                )
            if added_files:
                # row-delta replacement/insert files stream as inserts
                for part in _plan_files(
                    table,
                    None,
                    snapshot_id=sid,
                    from_snapshot_id=prev_sid,
                    _added_only=True,
                ):
                    part.chunks = [
                        (
                            p,
                            {
                                **a,
                                **attach,
                                "_change_type": "insert",
                                **(
                                    {"_cdc_first_row_id": frid_map.get(p)}
                                    if lineage
                                    else {}
                                ),
                            },
                            rgs,
                        )
                        for p, a, rgs in part.chunks
                    ]
                    parts.append(part)
            old_dv = {
                meta.localize(d.referenced_data_file): d
                for d in old_pos
                if d.referenced_data_file is not None
            }
            if fresh_parquet:
                # one partition per fresh delete parquet: the executor
                # reads its (file_path, pos) rows, subtracts the prior
                # snapshot's deletes for the same targets, and emits the
                # deleted rows from the target data files
                prior_parquet = [
                    meta.localize(d.path)
                    for d in old_pos
                    if d.referenced_data_file is None
                ]
                prior_dv_raw = {
                    d.referenced_data_file: (
                        meta.localize(d.path),
                        int(d.content_offset or 0),
                        int(d.content_size_in_bytes or 0),
                    )
                    for d in old_pos
                    if d.referenced_data_file is not None
                }
                for d in fresh_parquet:
                    parts.append(
                        IcebergCdcPosDeletePartition(
                            meta.localize(d.path),
                            {**attach, "_change_type": "delete"},
                            prior_parquet,
                            prior_dv_raw,
                            meta.location,
                            meta.root,
                            frid_map=frid_map if lineage else None,
                        )
                    )
            for d in fresh_dv:
                tgt = meta.localize(d.referenced_data_file)
                prior = old_dv.get(tgt)
                parts.append(
                    IcebergCdcDeletePartition(
                        tgt,
                        {**attach, "_change_type": "delete"},
                        new_blob=(
                            meta.localize(d.path),
                            int(d.content_offset or 0),
                            int(d.content_size_in_bytes or 0),
                        ),
                        old_blob=(
                            None
                            if prior is None
                            else (
                                meta.localize(prior.path),
                                int(prior.content_offset or 0),
                                int(prior.content_size_in_bytes or 0),
                            )
                        ),
                        first_row_id=frid_map.get(tgt),
                    )
                )
            if fresh_eq:
                from datafusion_iceberg_spark.iceberg.table import (
                    _file_seq,
                )

                names_by_id = {
                    v: k for k, v in meta.field_ids_by_name().items()
                }
                seqs = meta.snapshot_sequences()

                def _spec(d):
                    return (
                        meta.localize(d.path),
                        sorted(d.equality_ids),
                        [names_by_id[i] for i in sorted(d.equality_ids)],
                    )

                prior_eq_all = [
                    (_spec(d), _file_seq(seqs, d, 1 << 31))
                    for d in (
                        table.equality_delete_files(snapshot_id=prev_sid)
                        if prev_sid is not None
                        else []
                    )
                ]
                prior_parquet2 = [
                    meta.localize(d.path)
                    for d in old_pos
                    if d.referenced_data_file is None
                ]
                prev_files = (
                    list(table.files(snapshot_id=prev_sid))
                    if prev_sid is not None
                    else []
                )
                for f in prev_files:
                    tgt = meta.localize(f.path)
                    fseq = _file_seq(seqs, f, -1)
                    fresh_specs = [
                        _spec(d)
                        for d in fresh_eq
                        if _file_seq(seqs, d, 1 << 31) > fseq
                    ]
                    if not fresh_specs:
                        continue
                    prior = old_dv.get(tgt)
                    parts.append(
                        IcebergCdcEqDeletePartition(
                            tgt,
                            {**attach, "_change_type": "delete"},
                            fresh_specs,
                            [s for s, sq in prior_eq_all if sq > fseq],
                            prior_parquet2,
                            None
                            if prior is None
                            else (
                                meta.localize(prior.path),
                                int(prior.content_offset or 0),
                                int(prior.content_size_in_bytes or 0),
                            ),
                            f.path,
                            first_row_id=frid_map.get(tgt),
                        )
                    )
        return parts or [IcebergFilePartition("", {})]

    def read(self, partition):
        from pyspark.sql.pandas.types import to_arrow_schema

        arrow_schema = to_arrow_schema(self._schema)
        lineage = "_row_id" in arrow_schema.names
        if isinstance(partition, IcebergCdcPosDeletePartition):
            yield from self._read_pos_delete(partition, arrow_schema)
            return
        if isinstance(partition, IcebergCdcEqDeletePartition):
            yield from self._read_eq_delete(partition, arrow_schema)
            return
        if isinstance(partition, IcebergCdcOverwriteDiffPartition):
            yield from self._read_overwrite_diff(partition, arrow_schema)
            return
        if not isinstance(partition, IcebergCdcDeletePartition):
            if not lineage:
                yield from super().read(partition)
                return
            yield from self._read_insert_with_ids(partition, arrow_schema)
            return
        from datafusion_iceberg_spark.iceberg.puffin import (
            read_dv_positions,
        )

        new = set(read_dv_positions(*partition.new_blob))
        old = (
            set(read_dv_positions(*partition.old_blob))
            if partition.old_blob is not None
            else set()
        )
        delta = sorted(new - old)
        if not delta:
            return
        yield from self._deleted_rows(
            partition.path,
            delta,
            partition.attach,
            partition.first_row_id,
            arrow_schema,
        )

    def _read_overwrite_diff(self, partition, arrow_schema):
        """Overwrite-snapshot CDC: multiset net diff of the removed vs
        added files, restricted to this partition's hash bucket.  Rows
        of removed files already dead at the prior snapshot (position
        deletes, DV blobs, strictly-newer equality deletes) are masked
        out first — they were reported deleted at their own ordinal.

        Vectorized (r10, VERDICT r9 #5): files land as Arrow tables;
        each column casts to a canonical length-prefixed string
        (null → sentinel, NaN canonicalized, per-COLUMN repr fallback
        for nested types Arrow can't cast), columns join into one key
        string per row, and CRC32 of the canonical key BYTES keeps the
        bucket contract (process-stable; the builtin hash is salted per
        worker).  Netting is a numpy unique+bincount group-by and
        emission a Table.take — values flow Arrow end-to-end, no
        per-row Python objects outside the crc32 loop."""
        import zlib

        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        from datafusion_iceberg_spark.iceberg.puffin import (
            read_dv_positions,
        )

        table_fields = [
            f
            for f in arrow_schema
            if f.name not in ("_change_type", "_change_ordinal")
        ]
        cols = [f.name for f in table_fields]

        def _alive_mask(pf, raw, fseq):
            n = pf.metadata.num_rows
            alive = np.ones(n, dtype=bool)
            for p in partition.prior_parquet:
                try:
                    t2 = pq.read_table(
                        p,
                        columns=["file_path", "pos"],
                        filters=[("file_path", "==", raw)],
                    )
                except Exception:
                    continue  # expired prior delete file
                for pos in t2.column("pos").to_pylist():
                    if 0 <= pos < n:
                        alive[pos] = False
            blob = partition.prior_dv_by_raw.get(raw)
            if blob is not None:
                for pos in read_dv_positions(*blob):
                    if 0 <= pos < n:
                        alive[pos] = False
            specs = [spec for spec, sq in partition.prior_eq if sq > fseq]
            for i in _eq_dead_positions(pf, specs):
                if i < n:
                    alive[i] = False
            return alive

        lineage = "_row_id" in arrow_schema.names

        def _read_aligned(pf, mask, path):
            """One file as an Arrow table in the full column order
            (missing columns null-filled, all cast to the plan types).
            On lineage tables ``_row_id`` RESOLVES here — materialized
            value when the file stores one, else first_row_id +
            file-absolute position (same rule as attach_row_lineage) —
            so carried rows cancel on identical ids and an update's
            pre/post images share one."""
            cmap = _data_col_map(pf, cols, self._fids())
            tbl = pf.read(
                columns=sorted({v for v in cmap.values() if v is not None})
            )
            n = tbl.num_rows
            pos = np.arange(n, dtype=np.int64)
            if mask is not None and not mask.all():
                tbl = tbl.filter(pa.array(mask))
                pos = pos[mask]
            arrays = []
            for f in table_fields:
                if f.name == "_row_id" and lineage:
                    frid = partition.frid_map.get(path)
                    if frid is None:
                        raise ValueError(
                            f"row lineage: data file {path} has no "
                            "first_row_id (written before "
                            "write.row-lineage.enabled?)"
                        )
                    computed = pa.array(pos + int(frid), pa.int64())
                    if cmap.get(f.name) is not None:
                        mat = tbl.column(cmap[f.name]).combine_chunks().cast(
                            pa.int64()
                        )
                        arrays.append(pc.coalesce(mat, computed))
                    else:
                        arrays.append(computed)
                elif cmap.get(f.name) is not None:
                    arrays.append(tbl.column(cmap[f.name]).cast(f.type))
                else:
                    arrays.append(pa.nulls(tbl.num_rows, f.type))
            return pa.Table.from_arrays(arrays, names=cols)

        def _canon_keys(tbl, kcols=None):
            """One canonical string per row: per-cell length-prefixed
            strings (prefix-free vs the null sentinel) joined with a
            unit separator; float NaN canonicalized so carried NaN rows
            cancel.  Arrow casts are shortest-round-trip, so distinct
            values stay distinct.  ``kcols`` restricts the canon to the
            identifier columns (keyed update pairing)."""
            if tbl.num_rows == 0:
                return []
            parts = []
            for c in kcols or cols:
                col = tbl.column(c).combine_chunks()
                try:
                    st = pc.cast(col, pa.string())
                    if pa.types.is_floating(col.type):
                        st = pc.if_else(
                            pc.is_nan(col), pa.scalar("__nan__"), st
                        )
                except (pa.ArrowNotImplementedError, pa.ArrowInvalid):
                    # nested/extension column: repr per CELL (one Python
                    # pass per such column, not per row of the diff)
                    st = pa.array(
                        [
                            None if v is None else repr(v)
                            for v in col.to_pylist()
                        ],
                        pa.string(),
                    )
                parts.append(
                    pc.binary_join_element_wise(
                        pc.cast(pc.binary_length(st), pa.string()),
                        st,
                        pa.scalar(":"),
                    )
                )
            joined = (
                pc.binary_join_element_wise(
                    *parts,
                    pa.scalar("\x1f"),
                    null_handling="replace",
                    null_replacement="\x00N",
                )
                if parts
                else pa.array([""] * tbl.num_rows, pa.string())
            )
            return joined.to_pylist()

        tables, signs = [], []
        for path, raw, fseq in partition.removed:
            pf = pq.ParquetFile(path)
            t = _read_aligned(pf, _alive_mask(pf, raw, fseq), path)
            if t.num_rows:
                tables.append(t)
                signs.append(np.ones(t.num_rows, dtype=np.int64))
        for path in partition.added:
            t = _read_aligned(pq.ParquetFile(path), None, path)
            if t.num_rows:
                tables.append(t)
                signs.append(-np.ones(t.num_rows, dtype=np.int64))
        if not tables:
            return
        big = pa.concat_tables(tables)
        sign = np.concatenate(signs)
        keys = _canon_keys(big)
        # bucket hash: full canonical row normally; the _row_id ALONE on
        # lineage tables — or the identifier-field tuple when keyed
        # pairing is on — so an update's pre/post images (same identity,
        # different values) land in ONE bucket and can pair
        key_cols = getattr(partition, "key_cols", None)
        if lineage:
            bucket_keys = [str(v) for v in big.column("_row_id").to_pylist()]
        elif key_cols:
            bucket_keys = _canon_keys(big, key_cols)
        else:
            bucket_keys = keys
        crc = np.fromiter(
            (zlib.crc32(k.encode()) for k in bucket_keys),
            dtype=np.uint32,
            count=len(bucket_keys),
        )
        idx = np.nonzero((crc % partition.n_buckets) == partition.bucket)[0]
        if idx.size == 0:
            return
        sub_keys = np.array([keys[i] for i in idx], dtype=object)
        uniq, inv = np.unique(sub_keys, return_inverse=True)
        net = np.bincount(inv, weights=sign[idx]).astype(np.int64)
        first = np.full(len(uniq), idx.size, dtype=np.int64)
        np.minimum.at(first, inv, np.arange(idx.size))
        rep = idx[first]  # one representative row position per key

        def _emit(take, attach):
            if take.size == 0:
                return
            t = big.take(pa.array(take, pa.int64()))
            arrays = []
            for field in arrow_schema:
                if field.name in ("_change_type", "_change_ordinal"):
                    arrays.append(
                        pa.array(
                            [attach.get(field.name)] * t.num_rows,
                            type=field.type,
                        )
                    )
                else:
                    arrays.append(
                        t.column(field.name).combine_chunks().cast(field.type)
                    )
            yield pa.RecordBatch.from_arrays(
                [
                    a.chunk(0) if isinstance(a, pa.ChunkedArray) else a
                    for a in arrays
                ],
                schema=arrow_schema,
            )

        del_rep = np.where(net > 0, net, 0)
        ins_rep = np.where(net < 0, -net, 0)
        if lineage or key_cols:
            # a delete+insert pair sharing one identity (the _row_id on
            # lineage tables; the identifier-field tuple under keyed
            # pairing) at this snapshot is an UPDATE: rename into
            # before/after images — the same rule as changelog_df's
            # keyed window (table.py), decided bucket-locally because
            # buckets partition by that identity
            rep_ids = np.array(
                [bucket_keys[i] for i in rep], dtype=object
            )
            both = set(rep_ids[del_rep > 0]) & set(rep_ids[ins_rep > 0])
            in_both = np.array(
                [i in both for i in rep_ids], dtype=bool
            )
            yield from _emit(
                np.repeat(rep, np.where(in_both, 0, del_rep)),
                partition.attach_delete,
            )
            yield from _emit(
                np.repeat(rep, np.where(in_both, del_rep, 0)),
                {**partition.attach_delete, "_change_type": "update_before"},
            )
            yield from _emit(
                np.repeat(rep, np.where(in_both, 0, ins_rep)),
                partition.attach_insert,
            )
            yield from _emit(
                np.repeat(rep, np.where(in_both, ins_rep, 0)),
                {**partition.attach_insert, "_change_type": "update_after"},
            )
        else:
            yield from _emit(
                np.repeat(rep, del_rep), partition.attach_delete
            )
            yield from _emit(
                np.repeat(rep, ins_rep), partition.attach_insert
            )

    def _read_pos_delete(self, partition, arrow_schema):
        """Parquet position-delete CDC: read the fresh delete file,
        group positions per target, subtract the prior snapshot's
        deletes for those targets (prior delete files read with a
        file_path filter — parquet row-group pruning keeps this a
        targeted read — plus any prior DV blob), then materialize the
        deleted rows from each target data file."""
        import pyarrow.parquet as pq

        from datafusion_iceberg_spark.iceberg.puffin import (
            read_dv_positions,
        )

        fresh = pq.read_table(
            partition.delete_file, columns=["file_path", "pos"]
        )
        by_raw: dict[str, set[int]] = {}
        for fp, pos in zip(
            fresh.column("file_path").to_pylist(),
            fresh.column("pos").to_pylist(),
        ):
            by_raw.setdefault(fp, set()).add(int(pos))
        if not by_raw:
            return
        raw_targets = sorted(by_raw)
        prior: dict[str, set[int]] = {t: set() for t in raw_targets}
        for pd_path in partition.prior_delete_files:
            try:
                t2 = pq.read_table(
                    pd_path,
                    columns=["file_path", "pos"],
                    filters=[("file_path", "in", raw_targets)],
                )
            except Exception:
                continue  # prior file vanished (expired): nothing to subtract
            for fp, pos in zip(
                t2.column("file_path").to_pylist(),
                t2.column("pos").to_pylist(),
            ):
                prior[fp].add(int(pos))
        for raw, blob in partition.prior_dv_by_raw_target.items():
            if raw in prior:
                prior[raw] |= set(read_dv_positions(*blob))
        for raw in raw_targets:
            delta = sorted(by_raw[raw] - prior[raw])
            if not delta:
                continue
            tgt = _localize_recorded_path(
                raw, partition.location, partition.root
            )
            yield from self._deleted_rows(
                tgt,
                delta,
                partition.attach,
                partition.frid_map.get(tgt),
                arrow_schema,
            )

    def _read_eq_delete(self, partition, arrow_schema):
        """Equality-delete CDC: read only the data file's key columns,
        mask rows the prior snapshot had already deleted (prior parquet
        position deletes filtered to this target, the prior DV blob,
        and prior equality deletes with sequence > the file's), then
        resolve the positions whose key tuple null-safe-matches a fresh
        key file and materialize their OLD images."""
        import numpy as np
        import pyarrow.parquet as pq

        from datafusion_iceberg_spark.iceberg.puffin import (
            read_dv_positions,
        )

        pf = pq.ParquetFile(partition.path)
        n = pf.metadata.num_rows
        alive = np.ones(n, dtype=bool)
        for p in partition.prior_parquet:
            try:
                t2 = pq.read_table(
                    p,
                    columns=["file_path", "pos"],
                    filters=[("file_path", "==", partition.raw_path)],
                )
            except Exception:
                continue  # prior delete file expired: nothing to subtract
            for pos in t2.column("pos").to_pylist():
                if 0 <= pos < n:
                    alive[pos] = False
        if partition.prior_dv_blob is not None:
            for pos in read_dv_positions(*partition.prior_dv_blob):
                if 0 <= pos < n:
                    alive[pos] = False
        # key columns resolve per-file by PARQUET:field_id on both the
        # data and the delete parquet (pre-RENAME files store old names);
        # the shared cache reads each data key column ONCE across the
        # prior and fresh passes
        col_cache: dict = {}
        for i in _eq_dead_positions(pf, partition.prior_eq, col_cache):
            if i < n:
                alive[i] = False
        matched = np.zeros(n, dtype=bool)
        for i in _eq_dead_positions(pf, partition.fresh_specs, col_cache):
            if i < n and alive[i]:
                matched[i] = True
        delta = [int(i) for i in np.nonzero(matched)[0]]
        if not delta:
            return
        yield from self._deleted_rows(
            partition.path,
            delta,
            partition.attach,
            partition.first_row_id,
            arrow_schema,
        )

    def _deleted_rows(
        self, target_path, delta, attach, first_row_id, arrow_schema
    ):
        """Materialize the OLD images of ``delta`` positions from one
        target data file, with change columns and (on lineage tables)
        per-row ``_row_id``.  Data columns resolve by PARQUET:field_id
        (r10 — pre-RENAME files read correctly, parity with to_df)."""
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        lineage = "_row_id" in arrow_schema.names
        pf = pq.ParquetFile(target_path)
        cmap = _data_col_map(pf, arrow_schema.names, self._fids())
        want = sorted({v for v in cmap.values() if v is not None})
        tbl = pf.read(columns=want).take(delta)
        cols = []
        for field in arrow_schema:
            if field.name == "_row_id" and lineage:
                computed = (
                    pa.array(
                        [first_row_id + p for p in delta],
                        type=pa.int64(),
                    )
                    if first_row_id is not None
                    else pa.nulls(tbl.num_rows, pa.int64())
                )
                if cmap.get("_row_id") is not None:
                    # materialized id wins; positional fallback fills
                    # the file's fresh-insert null slots
                    mat = tbl.column(cmap["_row_id"]).combine_chunks().cast(
                        pa.int64()
                    )
                    cols.append(pc.coalesce(mat, computed))
                else:
                    cols.append(computed)
            elif cmap.get(field.name) is not None:
                cols.append(
                    tbl.column(cmap[field.name])
                    .combine_chunks()
                    .cast(field.type)
                )
            else:
                val = attach.get(field.name)
                cols.append(
                    pa.array([val] * tbl.num_rows, type=field.type)
                )
        yield pa.RecordBatch.from_arrays(
            [
                c.chunk(0) if isinstance(c, pa.ChunkedArray) else c
                for c in cols
            ],
            schema=arrow_schema,
        )

    def _read_insert_with_ids(self, partition, arrow_schema):
        """Insert chunks of a lineage CDC stream: stream each file (or
        row-group slice) computing ``_row_id`` = materialized column
        when present, else the file's first_row_id + row position (the
        slice's base position is the sum of preceding row-group
        sizes)."""
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        for path, attach, rgs in partition.chunks:
            if not path:
                continue
            frid = attach.get("_cdc_first_row_id")
            pf = pq.ParquetFile(path)
            md = pf.metadata
            rg_rows = [
                md.row_group(i).num_rows for i in range(md.num_row_groups)
            ]
            sel = list(range(len(rg_rows))) if rgs is None else list(rgs)
            starts = []
            acc = 0
            for i, n in enumerate(rg_rows):
                starts.append(acc)
                acc += n
            cmap = _data_col_map(pf, arrow_schema.names, self._fids())
            want = sorted({v for v in cmap.values() if v is not None})
            for i in sel:
                tbl = pf.read_row_group(i, columns=want)
                base = starts[i]
                offset = 0
                for batch in tbl.to_batches(262144):
                    n = batch.num_rows
                    cols = []
                    for field in arrow_schema:
                        if field.name == "_row_id":
                            computed = (
                                pa.array(
                                    range(
                                        frid + base + offset,
                                        frid + base + offset + n,
                                    ),
                                    type=pa.int64(),
                                )
                                if frid is not None
                                else pa.nulls(n, pa.int64())
                            )
                            if cmap.get("_row_id") is not None:
                                mat = batch.column(cmap["_row_id"]).cast(
                                    pa.int64()
                                )
                                cols.append(pc.coalesce(mat, computed))
                            else:
                                cols.append(computed)
                        elif cmap.get(field.name) is not None:
                            cols.append(
                                batch.column(cmap[field.name]).cast(field.type)
                            )
                        else:
                            val = attach.get(field.name)
                            cols.append(
                                pa.array([val] * n, type=field.type)
                            )
                    yield pa.RecordBatch.from_arrays(
                        [
                            c.chunk(0)
                            if isinstance(c, pa.ChunkedArray)
                            else c
                            for c in cols
                        ],
                        schema=arrow_schema,
                    )
                    offset += n


@dataclass
class IcebergWriteMessage(WriterCommitMessage):
    paths: list = field(default_factory=list)
    rows: int = 0


class IcebergPyWriter(DataSourceArrowWriter):
    """``df.write.format("iceberg_py")`` — the write half of the split
    handoff: each executor task streams its Arrow batches into ONE
    parquet file under ``<root>/data/pyds-<uuid>/`` (no driver
    funneling), and ``commit`` on the driver stats the footers and
    commits a single atomic Iceberg snapshot (append, or an overwrite
    replace snapshot for ``mode("overwrite")``).  A failed job aborts by
    deleting the staging directory — the table never saw the files, so
    there is nothing to roll back (Iceberg semantics: files are invisible
    until the metadata commit)."""

    def __init__(self, root: str, overwrite: bool, arrow_schema_json: str):
        import uuid as uuidlib

        self._root = root
        self._overwrite = overwrite
        self._schema_json = arrow_schema_json
        self._dir = os.path.join(root, "data", f"pyds-{uuidlib.uuid4()}")

    def write(self, iterator):
        import uuid as uuidlib

        import pyarrow as pa
        import pyarrow.parquet as pq

        target = pa.ipc.read_schema(
            pa.BufferReader(bytes.fromhex(self._schema_json))
        )
        os.makedirs(self._dir, exist_ok=True)
        path = os.path.join(self._dir, f"part-{uuidlib.uuid4().hex}.parquet")
        writer = None
        rows = 0
        for batch in iterator:
            cols = [
                batch.column(f.name).cast(f.type) for f in target
            ]
            out = pa.RecordBatch.from_arrays(cols, schema=target)
            if writer is None:
                writer = pq.ParquetWriter(path, target)
            writer.write_batch(out)
            rows += out.num_rows
        if writer is None:
            return IcebergWriteMessage()
        writer.close()
        return IcebergWriteMessage(paths=[path], rows=rows)

    def commit(self, messages) -> None:
        from datafusion_iceberg_spark.iceberg.writer import IcebergWriter

        # Commit ONLY the files reported by successful tasks.  Walking the
        # staging dir instead would sweep in parquet left by failed,
        # retried, or speculative task attempts (possibly truncated),
        # yielding duplicate rows or a footer-read failure at commit time.
        paths = [p for m in messages if m for p in m.paths]
        # Drop any unreported stragglers from dead attempts before commit.
        if os.path.isdir(self._dir):
            keep = set(paths)
            for name in os.listdir(self._dir):
                full = os.path.join(self._dir, name)
                if full not in keep:
                    try:
                        os.remove(full)
                    except OSError:
                        pass
        w = IcebergWriter.for_table(self._root)
        if self._overwrite:
            w.commit_files(
                self._dir, paths, operation="overwrite", replace=True
            )
        elif paths:
            w.commit_files(self._dir, paths)
        # append of zero rows: no snapshot, nothing to clean

    def abort(self, messages) -> None:
        import shutil

        shutil.rmtree(self._dir, ignore_errors=True)


class IcebergPyStreamWriter(DataSourceStreamArrowWriter):
    """``df.writeStream.format("iceberg_py")`` — one Iceberg snapshot
    per micro-batch.  Tasks stream their batches to individual parquet
    files under ``<root>/data/pyds-stream/`` and report the paths via
    commit messages; ``commit(batchId)`` publishes exactly those files
    as ONE append snapshot.  Replayed batches (restart between the sink
    commit and the checkpoint write) are detected via a batch-id ledger
    next to the metadata and skipped — exactly-once END TO END given the
    engine's replay guarantee.  One concurrent streaming query per
    table (the ledger is per-table)."""

    def __init__(self, root: str, arrow_schema_json: str):
        self._root = root
        self._schema_json = arrow_schema_json
        self._dir = os.path.join(root, "data", "pyds-stream")

    def _ledger(self) -> str:
        return os.path.join(self._root, "metadata", "pyds-stream-commits.json")

    def write(self, iterator):
        import uuid as uuidlib

        import pyarrow as pa
        import pyarrow.parquet as pq

        target = pa.ipc.read_schema(
            pa.BufferReader(bytes.fromhex(self._schema_json))
        )
        os.makedirs(self._dir, exist_ok=True)
        path = os.path.join(self._dir, f"part-{uuidlib.uuid4().hex}.parquet")
        writer = None
        rows = 0
        for batch in iterator:
            cols = [batch.column(f.name).cast(f.type) for f in target]
            out = pa.RecordBatch.from_arrays(cols, schema=target)
            if writer is None:
                writer = pq.ParquetWriter(path, target)
            writer.write_batch(out)
            rows += out.num_rows
        if writer is None:
            return IcebergWriteMessage()
        writer.close()
        return IcebergWriteMessage(paths=[path], rows=rows)

    def _committed_batch_ids(self) -> set:
        """Batch ids already published, derived from table metadata: each
        micro-batch snapshot carries ``pyds-stream-batch-id`` in its
        summary, so the snapshot commit and the replay marker are ONE
        atomic write — a crash between the two can't exist."""
        from datafusion_iceberg_spark.iceberg.metadata import (
            load_table_metadata,
        )

        try:
            meta = load_table_metadata(self._root).raw
        except (OSError, KeyError, ValueError):
            return set()
        return {
            s.get("summary", {}).get("pyds-stream-batch-id")
            for s in meta.get("snapshots", [])
        } - {None}

    def commit(self, messages, batchId: int) -> None:
        import json

        from datafusion_iceberg_spark.iceberg.writer import IcebergWriter

        paths = [p for m in messages if m for p in m.paths]
        ledger = {}
        if os.path.exists(self._ledger()):
            try:
                with open(self._ledger()) as fh:
                    ledger = json.load(fh)
            except ValueError:
                # ledger is only a cache — rebuild from metadata below
                ledger = {}
        if str(batchId) in ledger or str(batchId) in self._committed_batch_ids():
            # replayed batch: already a snapshot — drop the re-staged files
            for p in paths:
                try:
                    os.remove(p)
                except OSError:
                    pass
            return
        if paths:
            w = IcebergWriter.for_table(self._root)
            snap = w.commit_files(
                self._dir,
                paths,
                extra_summary={"pyds-stream-batch-id": str(batchId)},
            )
        else:
            snap = None
        # The ledger is a pure cache over the batch-id stamps in snapshot
        # summaries (needed for empty batches, which commit no snapshot);
        # write it atomically so a crash mid-write can't corrupt it.
        ledger[str(batchId)] = snap
        tmp = self._ledger() + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(ledger, fh)
        os.replace(tmp, self._ledger())

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m:
                for p in m.paths:
                    try:
                        os.remove(p)
                    except OSError:
                        pass


class IcebergPyDataSource(DataSource):
    """Options: ``path`` (table root, required); ``snapshot_id`` /
    ``ref`` (batch read pins, optional)."""

    @classmethod
    def name(cls) -> str:
        return "iceberg_py"

    def _table(self):
        from datafusion_iceberg_spark.iceberg.table import IcebergTable

        root = self.options.get("path")
        if not root:
            raise ValueError("iceberg_py requires option 'path' (table root)")
        table = IcebergTable.load(root)
        ref = self.options.get("ref")
        snapshot_id = self.options.get("snapshot_id")
        if ref is not None:
            snapshot_id = table.metadata.resolve_ref(ref)
        elif snapshot_id is not None:
            snapshot_id = int(snapshot_id)
        return table, snapshot_id

    def schema(self):
        table, _ = self._table()
        st = table.metadata.struct_type()
        if self.options.get("mode") == "cdc":
            from pyspark.sql import types as T

            lineage = (
                str(
                    table.metadata.properties.get(
                        "write.row-lineage.enabled", ""
                    )
                ).lower()
                == "true"
            )
            return T.StructType(
                list(st.fields)
                + (
                    [T.StructField("_row_id", T.LongType())]
                    if lineage
                    else []
                )
                + [
                    T.StructField("_change_type", T.StringType()),
                    T.StructField("_change_ordinal", T.IntegerType()),
                ]
            )
        agg_schema = self.options.get("agg_schema")
        if agg_schema:
            # fused per-partition aggregation: the source's output IS the
            # aggregated frame (schema supplied by bucket_agg_grouped)
            import json as _json

            from pyspark.sql import types as T

            return T.StructType.fromJson(_json.loads(agg_schema))
        cols = self.options.get("columns")
        if cols:
            # explicit projection pushdown: pyspark 4.1's DataSource API
            # has no column-pruning hook (VERDICT r8 "What's missing"
            # #1), so offer the knob directly — readers then fetch only
            # these columns from parquet (the read path projects to the
            # reader schema), recovering most of the JVM-reader gap on
            # wide tables when the caller knows the projection
            from pyspark.sql import types as T

            want = [c.strip() for c in str(cols).split(",") if c.strip()]
            by_name = {f.name: f for f in st.fields}
            missing = [c for c in want if c not in by_name]
            if missing:
                raise ValueError(
                    f"iceberg_py columns option: not in table schema: "
                    f"{missing}"
                )
            return T.StructType([by_name[c] for c in want])
        return st

    def reader(self, schema) -> IcebergPyReader:
        table, snapshot_id = self._table()
        group_by = self.options.get("group_partitions_by")
        file_paths = self.options.get("file_paths")
        ffilter = None
        if file_paths:
            import json as _json

            ffilter = set(_json.loads(file_paths))
        agg = None
        agg_json = self.options.get("agg_json")
        if agg_json:
            import json as _json

            from pyspark.sql import types as T

            spec = _json.loads(agg_json)
            st = table.metadata.struct_type()
            by_name = {f.name: f for f in st.fields}
            agg = {
                "group_cols": spec["group_cols"],
                "spec": [tuple(s) for s in spec["spec"]],
                "filter": (
                    [tuple(f) for f in spec["filter"]]
                    if spec.get("filter")
                    else None
                ),
                "read_st": T.StructType(
                    [by_name[c] for c in spec["read_cols"]]
                ),
            }
        reader = IcebergPyReader(
            table, schema, group_by=group_by, file_filter=ffilter, agg=agg
        )
        inc_from = self.options.get("incremental_from")
        if inc_from is not None:
            # incremental BATCH read (r11): only the files added in
            # (incremental_from, snapshot_id-or-current] — the DS face
            # of IcebergTable.incremental_df, for batch pipelines that
            # pull "what's new since my last run" by snapshot id
            # (pushed filters still prune within the added set).
            # apply_deletes=True: the end snapshot's delete coverage
            # masks rows within the added-file set (a file added AND
            # partially deleted inside the window reads its live rows,
            # matching incremental_df / the JVM incremental scan).
            from_sid = int(inc_from)

            def pinned_inc():
                parts = _plan_files(
                    table,
                    reader._pred,
                    snapshot_id=snapshot_id,
                    from_snapshot_id=from_sid,
                    apply_deletes=True,
                    group_by=group_by,
                    file_filter=ffilter,
                )
                # empty diff (caught-up caller, or filters pruned every
                # added file) is the steady state — Spark needs >= 1
                # partition and read("") emits no batches
                return parts or [IcebergFilePartition("", {})]

            reader.partitions = pinned_inc  # type: ignore[method-assign]
            return reader
        if snapshot_id is not None:
            # pin every planning call to the requested snapshot
            def pinned():
                parts = _plan_files(
                    table,
                    reader._pred,
                    snapshot_id=snapshot_id,
                    apply_deletes=True,
                    group_by=group_by,
                    file_filter=ffilter,
                )
                return parts or [IcebergFilePartition("", {})]

            reader.partitions = pinned  # type: ignore[method-assign]
        return reader

    def streamReader(self, schema) -> IcebergPyStreamReader:
        cls = (
            IcebergPyCdcStreamReader
            if self.options.get("mode") == "cdc"
            else IcebergPyStreamReader
        )
        if (
            self.options.get("mode") == "cdc"
            and self.options.get("max_files_per_batch") is not None
        ):
            raise ValueError(
                "max_files_per_batch applies to the append-tail stream "
                "only — CDC offsets are snapshot-granular (a net diff "
                "is not separable per file); use max_snapshots_per_batch"
            )
        return cls(
            self.options.get("path"),
            schema,
            max_snapshots_per_batch=self.options.get("max_snapshots_per_batch"),
            overwrite_diff_buckets=self.options.get("overwrite_diff_buckets"),
            max_files_per_batch=self.options.get("max_files_per_batch"),
            pair_keys=self.options.get("cdc_pair_keys"),
        )

    def _check_writable(self, schema) -> str:
        """Shared batch/stream write validation; returns the serialized
        target arrow schema."""
        table, _ = self._table()
        meta = table.metadata
        if meta.partition_spec_entries():
            raise ValueError(
                "iceberg_py write: partitioned tables need the catalog "
                "append path (partition transforms run there)"
            )
        if meta.sort_order_columns():
            raise ValueError(
                "iceberg_py write: sorted tables need the catalog append "
                "path (repartitionByRange runs there)"
            )
        expected = [f.name.lower() for f in meta.struct_type().fields]
        got = [f.name.lower() for f in schema.fields]
        if got != expected:
            raise ValueError(
                f"iceberg_py write: dataframe columns {got} do not match "
                f"table schema {expected}"
            )
        from pyspark.sql.pandas.types import to_arrow_schema

        return to_arrow_schema(meta.struct_type()).serialize().to_pybytes().hex()

    def writer(self, schema, overwrite: bool) -> IcebergPyWriter:
        table, _ = self._table()
        return IcebergPyWriter(
            table.metadata.root, overwrite, self._check_writable(schema)
        )

    def streamWriter(self, schema, overwrite: bool) -> IcebergPyStreamWriter:
        if overwrite:
            raise ValueError(
                "iceberg_py streaming sink supports append output mode only"
            )
        table, _ = self._table()
        return IcebergPyStreamWriter(
            table.metadata.root, self._check_writable(schema)
        )


def ds_read(
    spark,
    root: str,
    columns=None,
    snapshot_id=None,
    ref=None,
):
    """Batch-read an Iceberg table through the Python DataSource with a
    projection PUSHED INTO the reader schema (VERDICT r9 #9).

    pyspark 4.1's DataSource API has no column-pruning hook, so a bare
    ``spark.read.format("iceberg_py").load().select(cols)`` still ships
    every column out of the Python reader; this helper derives the
    ``columns`` option from the projection you already know, so
    executors fetch ONLY those parquet columns (−25% on a 16→2-column
    scan, PERF_NOTES r9).  Limitation: a projection applied AFTER
    ``.load()`` cannot be recovered — Spark never tells the data source
    about it — so callers who project must come through here (or set
    the ``columns`` option themselves)."""
    r = spark.read.format("iceberg_py").option("path", root)
    if snapshot_id is not None:
        r = r.option("snapshot_id", str(snapshot_id))
    if ref is not None:
        r = r.option("ref", ref)
    if columns:
        r = r.option("columns", ",".join(columns))
    return r.load()


def register_iceberg_datasource(spark) -> None:
    """Idempotent session registration.  Python-side filter pushdown is
    opt-in in Spark 4 — enable it so ``pushFilters`` receives the
    predicates for file pruning."""
    try:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    except Exception:
        pass  # static-conf session: pushFilters then just never fires
    try:
        spark.dataSource.register(IcebergPyDataSource)
    except Exception as e:  # already registered
        if "already" not in str(e).lower():
            raise
