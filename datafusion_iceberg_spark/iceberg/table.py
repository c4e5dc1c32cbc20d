"""IcebergTable — the Spark analogue of the reference's
``DataFusionTable`` scan path (SURVEY.md §2A A1, A6-A10;
datafusion_iceberg/src/table.rs:94-296): metadata → snapshot →
manifest-list → manifests → two-level pruning → file list →
``spark.read.parquet``.

Division of labor at 100 TB: everything in this file is *driver-side
metadata work* over a few thousand manifest rows; the data path
(parquet scan, filters, shuffles) is pure Catalyst/Tungsten across the
executors.  Pruning here skips whole files without opening them; Spark's
parquet reader then re-prunes surviving files at row-group granularity
from their footers — the same two tiers the reference has
(PruningPredicate, then ParquetExec row-group pruning).
"""

from __future__ import annotations

import os
from typing import Any, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datafusion_iceberg_spark.iceberg.manifests import (
    DataFile,
    read_manifest,
    read_manifest_list,
)
from datafusion_iceberg_spark.iceberg.metadata import (
    TableMetadata,
    iceberg_type_to_spark,
    load_table_metadata,
)
from datafusion_iceberg_spark.iceberg.pruning import (
    Pred,
    pred_to_sql,
    prune_data_files,
    prune_manifests,
)
from datafusion_iceberg_spark.iceberg.stats import decode_stat
from datafusion_iceberg_spark.session import local_df as _local_df


class UnsupportedFileFormatError(ValueError):
    """A manifest entry's data file is in a format this engine cannot
    scan (file_format is parsed for every entry, manifests.py:179) —
    raised BEFORE any byte of the file is read, naming the file and
    format, instead of handing a non-parquet file to the parquet reader
    and failing with a confusing low-level decode error."""


class IcebergTable:
    """Read path for one Iceberg table rooted at a local/posix directory."""

    def __init__(self, metadata: TableMetadata):
        self.metadata = metadata

    @classmethod
    def load(cls, root: str) -> "IcebergTable":
        """Analogue of Table::load_file_system_table (table.rs:319-323)."""
        return cls(load_table_metadata(root))

    @property
    def inspect(self):
        """Metadata tables (``snapshots``/``files``/``manifests``/
        ``partitions``/``history``/``refs``) — see iceberg/inspect.py."""
        from datafusion_iceberg_spark.iceberg.inspect import Inspect

        return Inspect(self)

    # -- file planning ------------------------------------------------------

    def manifests(
        self,
        snapshot_id: Optional[int] = None,
        as_of_timestamp_ms: Optional[int] = None,
        content: int = 0,
    ):
        snap = self.metadata.snapshot(snapshot_id, as_of_timestamp_ms)
        if snap is None:
            return []
        path = self.metadata.localize(snap.manifest_list)
        return [m for m in read_manifest_list(path) if m.content == content]

    def position_delete_files(
        self,
        snapshot_id: Optional[int] = None,
        as_of_timestamp_ms: Optional[int] = None,
    ) -> list[DataFile]:
        """Position-delete files (merge-on-read): entries of content=1
        delete manifests whose data_file.content != 2.  Applied to every
        scan as an anti-join on (file_path, pos) — the read-side half the
        reference filters OUT and never applies (its manifests() drops
        content==1, so a v2 table with deletes would return deleted rows
        there)."""
        return [
            f
            for f in self._delete_entries(snapshot_id, as_of_timestamp_ms)
            if f.content != 2
        ]

    def equality_delete_files(
        self,
        snapshot_id: Optional[int] = None,
        as_of_timestamp_ms: Optional[int] = None,
    ) -> list[DataFile]:
        """Equality-delete files (Iceberg v2, content=2 entries): rows of
        the equality_ids key columns; a row in a data file is deleted when
        its key tuple null-safe-equals any delete row from a LATER commit
        (sequence semantics via snapshot ordinals).  This is the delete
        flavor Flink/CDC writers emit; VERDICT r4 item #3."""
        return [
            f
            for f in self._delete_entries(snapshot_id, as_of_timestamp_ms)
            if f.content == 2
        ]

    def _delete_entries(
        self,
        snapshot_id: Optional[int] = None,
        as_of_timestamp_ms: Optional[int] = None,
    ) -> list[DataFile]:
        files: list[DataFile] = []
        for mf in self.manifests(snapshot_id, as_of_timestamp_ms, content=1):
            for f in read_manifest(
                self.metadata.localize(mf.path), inherit_seq=mf.sequence_number
            ):
                f.spec_id = mf.partition_spec_id
                f.added_snapshot_id = mf.added_snapshot_id
                files.append(f)
        return files

    # below this many surviving manifests the driver decodes them itself.
    # Measured locally (warm FS): 64 manifests plan in 0.04 s on the
    # driver vs 0.44 s as a Spark job — scheduling dominates when a
    # manifest decodes in microseconds.  The distributed path wins when
    # per-manifest cost is latency-bound (object storage: ~50 ms/GET ×
    # 512 manifests ≈ 25 s serial vs ~1 s across executors), so the
    # default only flips for genuinely huge manifest lists; tune with
    # SPARK_GRAFT_DIST_PLAN_THRESHOLD for remote warehouses.
    DISTRIBUTED_PLAN_THRESHOLD = 256

    def files(
        self,
        filters: Optional[Pred] = None,
        snapshot_id: Optional[int] = None,
        as_of_timestamp_ms: Optional[int] = None,
        spark: Optional[SparkSession] = None,
        distributed_threshold: Optional[int] = None,
    ) -> list[DataFile]:
        """List live data files for a snapshot with two-level pruning:
        manifest partition summaries first (skips whole manifests without
        reading them — table.rs:136-138), then per-file column bounds
        (table.rs:143-145).

        When ``spark`` is given and the PRUNED manifest count reaches the
        threshold, the Avro decode + file-level pruning runs as a Spark
        job over the manifest list (one task per manifest chunk) and only
        the KEPT file descriptors return to the driver — planning then
        scales with the cluster, not the driver, the way real engines
        plan 10⁵-manifest tables.  Results are identical to the driver
        path (tested)."""
        manifests = self.manifests(snapshot_id, as_of_timestamp_ms)
        manifests = prune_manifests(manifests, filters, self.metadata)
        thr = distributed_threshold
        if thr is None:
            thr = int(
                os.environ.get(
                    "SPARK_GRAFT_DIST_PLAN_THRESHOLD",
                    self.DISTRIBUTED_PLAN_THRESHOLD,
                )
            )
        if spark is not None and len(manifests) >= thr:
            return self._plan_files_distributed(spark, manifests, filters)
        files: list[DataFile] = []
        for mf in manifests:
            for f in read_manifest(
                self.metadata.localize(mf.path), inherit_seq=mf.sequence_number
            ):
                if f.content != 0:
                    continue  # delete entries never belong in a data scan
                f.spec_id = mf.partition_spec_id
                f.added_snapshot_id = mf.added_snapshot_id
                files.append(f)
        return prune_data_files(files, filters, self.metadata)

    def _plan_files_distributed(
        self, spark: SparkSession, manifests: list, filters: Optional[Pred]
    ) -> list[DataFile]:
        """Executor-side manifest decode + file pruning.  Each task
        handles a chunk of manifests; the driver receives only the kept
        :class:`DataFile` descriptors (the same objects the local path
        yields, in manifest order for determinism).  The metadata and
        predicate ship once per task via closure pickle — both are plain
        dataclasses/tuples, kilobytes each."""
        meta = self.metadata
        payload = [
            (
                i,
                meta.localize(mf.path),
                mf.sequence_number,
                mf.partition_spec_id,
                mf.added_snapshot_id,
            )
            for i, mf in enumerate(manifests)
        ]

        def plan_chunk(it):
            from datafusion_iceberg_spark.iceberg.manifests import (
                read_manifest as _rm,
            )
            from datafusion_iceberg_spark.iceberg.pruning import (
                prune_data_files as _pdf,
            )

            for idx, path, seq, spec_id, added in it:
                chunk = []
                for f in _rm(path, inherit_seq=seq):
                    if f.content != 0:
                        continue
                    f.spec_id = spec_id
                    f.added_snapshot_id = added
                    chunk.append(f)
                yield idx, _pdf(chunk, filters, meta)

        n_tasks = min(len(payload), 64)
        got = (
            spark.sparkContext.parallelize(payload, n_tasks)
            .mapPartitions(plan_chunk)
            .collect()
        )
        out: list[DataFile] = []
        for _, chunk in sorted(got, key=lambda t: t[0]):
            out.extend(chunk)
        return out

    # -- statistics (A10, with reference bug #2 fixed) ---------------------

    def statistics(
        self, snapshot_id: Optional[int] = None
    ) -> dict[str, Any]:
        """num_rows/total_bytes from manifest-list row counts.  Uses
        ``added_rows_count + existing_rows_count`` — NOT file counts
        (reference bug: statistics.rs:29-31 sums added_files_count into
        num_rows)."""
        num_rows = 0
        total_files = 0
        rows_known = True
        for mf in self.manifests(snapshot_id):
            total_files += mf.added_files_count + mf.existing_files_count
            if mf.added_rows_count is None:
                rows_known = False
            else:
                num_rows += (mf.added_rows_count or 0) + (mf.existing_rows_count or 0)
        n_pos_deletes = sum(
            f.record_count for f in self.position_delete_files(snapshot_id)
        )
        total_bytes = sum(
            f.file_size_in_bytes for f in self.files(snapshot_id=snapshot_id)
        )
        # equality deletes match an unknown number of rows (a key may hit
        # many rows or none) — the row count stays an upper bound and the
        # estimate is flagged inexact so the broadcast-hint consumer stays
        # conservative
        has_eq = bool(self.equality_delete_files(snapshot_id))
        return {
            "num_rows": num_rows - n_pos_deletes if rows_known else None,
            "num_files": total_files,
            "total_bytes": total_bytes,
            # position deletes can overlap; the subtraction is an upper
            # bound on live rows, exact when each position is deleted once
            # (our writer only emits deletes for live rows, so it is)
            "is_exact": rows_known and not has_eq,
        }

    def files_targeted_by_deletes(self) -> set[str]:
        """Localized data-file paths that outstanding MOR deletes may
        remove rows from.  COW rewrites use this to fold deletes into the
        rewrite: their new snapshot carries no delete manifests, so every
        delete-targeted file must be in the rewrite set (scanned through
        ``_scan_files``, which applies the deletes) or its deletes would
        silently un-apply.

        Position deletes name their targets explicitly (driver-side read
        of the delete parquet's file_path column — metadata-sized).
        Equality deletes name only key VALUES, so any data file committed
        before the newest equality delete is a potential target — all
        such files are returned (a full fold, the COW trade; compaction
        is the cheap way to retire equality deletes)."""
        import pyarrow.parquet as pq

        out: set[str] = set()
        for d in self.position_delete_files():
            if d.referenced_data_file is not None:
                # deletion vector: the target is named in the entry
                out.add(self.metadata.localize(d.referenced_data_file))
                continue
            p = self.metadata.localize(d.path)
            try:
                col = pq.read_table(p, columns=["file_path"])["file_path"]
                out.update(col.to_pylist())
            except Exception:
                pass
        eq = self.equality_delete_files()
        if eq:
            seqs = self.metadata.snapshot_sequences()
            types_by_id = {
                f["id"]: f["type"]
                for f in self.metadata.current_schema["fields"]
                if isinstance(f.get("type"), str)
            }

            def _rng(df, fid):
                lo = (df.lower_bounds or {}).get(fid)
                hi = (df.upper_bounds or {}).get(fid)
                t = types_by_id.get(fid)
                if lo is None or hi is None or t is None:
                    return None
                lo, hi = decode_stat(t, lo), decode_stat(t, hi)
                if lo is None or hi is None:
                    return None
                return lo, hi

            def _may_hit(d, f) -> bool:
                """Can delete file ``d`` remove rows from data file
                ``f``?  False ONLY when some key column's ranges are
                both known and provably disjoint — the bounds the r8
                writer stamps on equality-delete key parquets; missing
                bounds (older writers, truncated strings) stay
                conservative."""
                for fid in d.equality_ids or ():
                    dr, fr = _rng(d, fid), _rng(f, fid)
                    if dr is None or fr is None:
                        continue
                    if dr[1] < fr[0] or fr[1] < dr[0]:
                        return False
                return True

            files = self.files()
            for d in eq:
                d_seq = _file_seq(seqs, d, 1 << 31)
                for f in files:
                    if _file_seq(seqs, f, -1) < d_seq and _may_hit(d, f):
                        out.add(self.metadata.localize(f.path))
        return out

    def metadata_min_max(
        self, column: str, spark: Optional[SparkSession] = None
    ):
        """Exact (min, max) for ``column`` answered from MANIFEST BOUNDS
        alone — zero data IO — when that answer is provably exact:

        - no outstanding deletes (a deleted row could be the extremum);
        - every live data file carries both bounds for the column;
        - the column's type round-trips bounds exactly (numeric /
          date / timestamp — STRING upper bounds may be writer-truncated,
          so strings always fall back).

        Otherwise falls back to a scan aggregate (needs ``spark``).
        This is the MIN/MAX half of the statistics feed (A10) the way
        engines push aggregates into metadata; the reference's
        statistics feed (statistics.rs) serves row counts only."""
        meta = self.metadata
        fid = meta.field_ids_by_name()[column]
        t = meta.types_by_field_id()[fid]
        exact_types = (
            "int",
            "long",
            "float",
            "double",
            "date",
            "time",
            "timestamp",
            "timestamptz",
        )
        has_deletes = bool(self.position_delete_files()) or bool(
            self.equality_delete_files()
        )
        if not has_deletes and t in exact_types:
            los, his = [], []
            complete = True
            for f in self.files():
                if t in ("float", "double"):
                    # Iceberg bounds EXCLUDE NaN, but Spark MAX treats
                    # NaN as greater than any value — only provably exact
                    # when the manifest proves zero NaNs in this file
                    # (unknown counts as maybe-NaN)
                    if f.nan_value_counts.get(fid) != 0:
                        complete = False
                        break
                lo = decode_stat(t, f.lower_bounds.get(fid))
                hi = decode_stat(t, f.upper_bounds.get(fid))
                if lo is None or hi is None:
                    if (f.record_count or 0) > (
                        f.null_value_counts.get(fid) or 0
                    ):
                        complete = False
                        break
                    continue  # all-null file: contributes no extremum
                los.append(lo)
                his.append(hi)
            if complete:
                return (
                    min(los) if los else None,
                    max(his) if his else None,
                )
        if spark is None:
            raise ValueError(
                f"metadata_min_max({column!r}): bounds are not provably "
                "exact (deletes outstanding, incomplete stats, or string "
                "truncation risk) — pass a SparkSession for the scan "
                "fallback"
            )
        row = (
            self.to_df(spark)
            .agg(F.min(column).alias("lo"), F.max(column).alias("hi"))
            .collect()[0]
        )
        return (row["lo"], row["hi"])

    # -- scan (A1) ----------------------------------------------------------

    def to_df(
        self,
        spark: SparkSession,
        filters: Optional[Pred] = None,
        snapshot_id: Optional[int] = None,
        as_of_timestamp_ms: Optional[int] = None,
        columns: Optional[list[str]] = None,
        ref: Optional[str] = None,
    ) -> DataFrame:
        """Plan the scan: pruned file list → ``spark.read.parquet`` with the
        table schema → exact re-filter → optional projection.
        ``ref`` names a tag/branch (``refs`` metadata map) and resolves to
        its pinned snapshot; mutually exclusive with the other pins.

        Pruning is only a file-skip; the full predicate is re-applied by
        Spark (and pushed into the parquet reader by Catalyst), so results
        are exact even when stats were missing or wrong — the same
        correctness contract as the reference (filters forwarded to the
        physical plan, table.rs:291-293).
        """
        if ref is not None:
            if snapshot_id is not None or as_of_timestamp_ms is not None:
                raise ValueError("ref is mutually exclusive with snapshot pins")
            snapshot_id = self.metadata.resolve_ref(ref)
        files = self.files(
            filters, snapshot_id, as_of_timestamp_ms, spark=spark
        )
        deletes = self.position_delete_files(snapshot_id, as_of_timestamp_ms)
        eq_deletes = self.equality_delete_files(snapshot_id, as_of_timestamp_ms)
        df = self._scan_files(
            spark, files, filters, deletes=deletes, eq_deletes=eq_deletes
        )
        if columns:
            df = df.select(*columns)
        return df

    def _scan_files(
        self,
        spark: SparkSession,
        files: list[DataFile],
        filters: Optional[Pred],
        deletes: Optional[list[DataFile]] = None,
        eq_deletes: Optional[list[DataFile]] = None,
        _with_row_meta: bool = False,
        _extra_cols: Optional[list] = None,
        _skip_defaults: bool = False,
    ) -> DataFrame:
        """files → DataFrame with partition values attached and the exact
        filter re-applied (shared by full and incremental scans).

        ``deletes=None`` / ``eq_deletes=None`` apply the CURRENT
        snapshot's position/equality deletes (so copy-on-write rewrites
        scanning through this path never resurrect MOR-deleted rows);
        pass ``[]`` to skip.  ``_with_row_meta`` exposes
        ``_ice_file``/``_ice_pos`` columns (file path + file-relative row
        index) for delete-file writers."""
        meta = self.metadata
        st = meta.struct_type()
        if deletes is None:
            deletes = self.position_delete_files()
        if eq_deletes is None:
            eq_deletes = self.equality_delete_files()
        if not files:
            return _local_df(spark, [], st)

        # file_format guard (spec field, manifests.py:179): the reference
        # wires parquet only (table.rs:291 ParquetFormat) and hands any
        # other format to the parquet reader, failing with a low-level
        # decode error; here ORC routes to Spark's native ORC reader and
        # anything else refuses LOUDLY, naming the file and format.
        fmts = {(f.file_format or "PARQUET").upper() for f in files}
        bad = sorted(fmts - {"PARQUET", "ORC", "AVRO"})
        if bad:
            off = next(
                f
                for f in files
                if (f.file_format or "PARQUET").upper() == bad[0]
            )
            raise UnsupportedFileFormatError(
                f"data file {off.path} has file_format={bad[0]}: this "
                "engine reads PARQUET natively, routes ORC to Spark's "
                "ORC reader, and decodes AVRO with its own container "
                "codec; other formats are spec-legal but unsupported "
                "— rewrite the table or scan it with the writing engine"
            )
        if "AVRO" in fmts:
            av = [
                f
                for f in files
                if (f.file_format or "PARQUET").upper() == "AVRO"
            ]
            if _with_row_meta or _extra_cols:
                raise UnsupportedFileFormatError(
                    "row-position metadata over AVRO data files is not "
                    "supported (_metadata.row_index is a parquet reader "
                    "feature): " + av[0].path
                )
            if deletes or eq_deletes:
                raise UnsupportedFileFormatError(
                    "MOR deletes over a table with AVRO data files are "
                    "not supported — rewrite the AVRO files to parquet "
                    "first: " + av[0].path
                )
            if not _skip_defaults and meta.initial_defaults():
                raise UnsupportedFileFormatError(
                    "v3 initial-default columns over AVRO data files are "
                    "not supported: " + av[0].path
                )
            out = self._scan_avro_files(spark, av, filters)
            rest = [
                f
                for f in files
                if (f.file_format or "PARQUET").upper() != "AVRO"
            ]
            if rest:
                out = out.unionByName(
                    self._scan_files(
                        spark,
                        rest,
                        filters,
                        deletes=deletes,
                        eq_deletes=eq_deletes,
                        _skip_defaults=_skip_defaults,
                    )
                )
            return out
        if "ORC" in fmts:
            orc = [
                f
                for f in files
                if (f.file_format or "PARQUET").upper() == "ORC"
            ]
            if _with_row_meta or _extra_cols:
                raise UnsupportedFileFormatError(
                    "row-position metadata over ORC data files is not "
                    "supported (_metadata.row_index is a parquet reader "
                    "feature): " + orc[0].path
                )
            if deletes or eq_deletes:
                raise UnsupportedFileFormatError(
                    "MOR deletes over a table with ORC data files are "
                    "not supported — rewrite the ORC files to parquet "
                    "first: " + orc[0].path
                )
            if not _skip_defaults and meta.initial_defaults():
                raise UnsupportedFileFormatError(
                    "v3 initial-default columns over ORC data files are "
                    "not supported: " + orc[0].path
                )
            out = self._scan_orc_files(spark, orc, filters)
            rest = [
                f
                for f in files
                if (f.file_format or "PARQUET").upper() != "ORC"
            ]
            if rest:
                pq = self._scan_files(
                    spark,
                    rest,
                    filters,
                    deletes=[],
                    eq_deletes=[],
                    _skip_defaults=_skip_defaults,
                )
                out = pq.unionByName(out)
            return out

        defaults = {} if _skip_defaults else meta.initial_defaults()
        if defaults:
            # v3 DEFAULT VALUES: the initial-default applies ONLY to
            # files written before the column existed — split the file
            # set by physical column presence (one cached footer probe
            # per file, driver-side), fill the absent groups with the
            # default LITERAL (a file lacking the column cannot hold an
            # explicit NULL), and apply the exact filter AFTER filling
            # so predicates on the defaulted column see filled values.
            groups: dict = {}
            for f in files:
                missing = frozenset(
                    c
                    for c in defaults
                    if not _file_has_column(meta.localize(f.path), c, meta)
                )
                groups.setdefault(missing, []).append(f)
            if len(groups) > 1 or next(iter(groups)):
                subs = []
                for missing, fl in groups.items():
                    sub = self._scan_files(
                        spark,
                        fl,
                        None,
                        deletes=deletes,
                        eq_deletes=eq_deletes,
                        _with_row_meta=_with_row_meta,
                        _extra_cols=_extra_cols,
                        _skip_defaults=True,
                    )
                    for c in missing:
                        v, dtype = defaults[c]
                        sub = sub.withColumn(c, F.lit(v).cast(dtype))
                    subs.append(sub)
                out = subs[0]
                for s in subs[1:]:
                    out = out.unionByName(s)
                if filters is not None:
                    out = out.filter(pred_to_sql(filters))
                return out

        # Id-keyed column mapping: when data files carry PARQUET:field_id
        # (the fixture does; our writer stamps them), request columns by
        # id so RENAME evolution reads old files correctly.  Files without
        # ids keep name resolution (requested schema carries no ids then).
        use_ids = _file_has_field_ids(meta.localize(files[0].path))
        if use_ids:
            st = meta.struct_type(with_field_ids=True)
            try:  # runtime-settable; a plain caller session (not built
                # by session.get_spark, which sets it) needs it on, or
                # post-RENAME scans silently resolve by name
                spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
            except Exception:
                pass
        if _extra_cols:
            # optional per-file columns outside the table schema (the
            # materialized v3 ``_row_id``): schema-specified reads yield
            # null for files that lack them
            st = T.StructType(
                list(st.fields)
                + [T.StructField(n, t) for n, t in _extra_cols]
            )
        with_meta = _with_row_meta or bool(deletes) or bool(eq_deletes)

        # Files read per partition-spec id: each spec determines which
        # partition columns live only in the directory layout and must be
        # attached from manifest partition_values (a spec-evolved table
        # mixes specs mid-history; the reference assumes the default spec
        # for every file, table.rs:233-238).  Single spec — the common
        # case — is one read, no union.
        by_spec: dict[int, list[DataFile]] = {}
        for f in files:
            by_spec.setdefault(f.spec_id, []).append(f)

        sub_dfs = []
        for sid in sorted(by_spec):
            sfiles = by_spec[sid]
            part_cols = meta.partition_column_names(sid)
            # Identity-transform partition values normally also exist
            # inside the data files (fixture and our writer both do this).
            # If a file schema omits them, attach from manifest
            # partition_values with native types (reference bug #4: it
            # stringifies them).  Presence is probed per FILE (memoized
            # footer reads): a spec group mixing in-file and
            # directory-only layouts would otherwise NULL-fill the
            # unprobed files' partition columns (ADVICE r13, the same
            # rule the ORC leg applies).
            by_missing: dict[frozenset, list[DataFile]] = {}
            if part_cols:
                for f in sfiles:
                    p = meta.localize(f.path)
                    miss = frozenset(
                        c
                        for c in part_cols
                        if not _file_has_column(p, c, meta, with_ids=use_ids)
                    )
                    by_missing.setdefault(miss, []).append(f)
            else:
                by_missing[frozenset()] = list(sfiles)
            for miss in sorted(by_missing, key=sorted):
                gfiles = by_missing[miss]
                if miss:
                    if _extra_cols:
                        raise ValueError(
                            "row-lineage scan over files missing partition "
                            "columns is not supported (directory-only "
                            "partition values)"
                        )
                    sub = _read_groups_with_partition_values(
                        spark,
                        meta,
                        gfiles,
                        sorted(miss),
                        with_ids=use_ids,
                        with_row_meta=with_meta,
                    )
                else:
                    rpaths = _compact_read_paths(
                        [meta.localize(f.path) for f in gfiles]
                    )
                    _tune_listing_parallelism(spark, len(rpaths))
                    sub = spark.read.schema(st).parquet(*rpaths)
                    if with_meta:
                        sub = sub.select(
                            "*",
                            F.col("_metadata.file_path").alias("_ice_file"),
                            F.col("_metadata.row_index").alias("_ice_pos"),
                        )
                sub_dfs.append(sub)
        df = sub_dfs[0]
        for sub in sub_dfs[1:]:
            df = df.unionByName(sub)

        if deletes:
            df = _apply_position_deletes(spark, meta, df, deletes, files)
        if eq_deletes:
            df = _apply_equality_deletes(spark, meta, df, eq_deletes, files)
        if (deletes or eq_deletes) and not _with_row_meta:
            df = df.drop("_ice_file", "_ice_pos")

        if filters is not None:
            df = df.filter(pred_to_sql(filters))
        return df

    def _scan_orc_files(
        self, spark: SparkSession, files: list[DataFile], filters
    ) -> DataFrame:
        """ORC-format data files (spec-legal; Hive-migrated and foreign
        tables carry them) routed to Spark's native ORC reader with
        name-based column resolution (ORC has no PARQUET:field_id
        analogue Spark can key on, so RENAME evolution over ORC files
        resolves by name).  Partition values missing from the files are
        attached from manifest metadata exactly like the parquet leg."""
        meta = self.metadata
        st = meta.struct_type()
        by_spec: dict[int, list[DataFile]] = {}
        for f in files:
            by_spec.setdefault(f.spec_id, []).append(f)
        subs = []
        for sid in sorted(by_spec):
            sfiles = by_spec[sid]
            part_cols = meta.partition_column_names(sid)
            # Probe EVERY file's footer for partition-column presence —
            # "files of one spec share the physical layout" is an
            # assumption, not an Iceberg guarantee, and Spark's ORC
            # reader silently fills absent columns with NULL: a spec
            # group mixing in-file and directory-only layouts would
            # yield NULL partition values for the unprobed files.  Files
            # are then grouped by their missing-column set so each
            # layout reads on its correct path (mirrors the per-file
            # _file_has_column probe the parquet v3-defaults leg uses).
            by_missing: dict[frozenset, list[DataFile]] = {}
            if part_cols:
                for f in sfiles:
                    probe = _orc_footer_names(meta.localize(f.path))
                    miss = frozenset(c for c in part_cols if c not in probe)
                    by_missing.setdefault(miss, []).append(f)
            else:
                by_missing[frozenset()] = list(sfiles)
            for miss in sorted(by_missing, key=sorted):
                gfiles = by_missing[miss]
                if miss:
                    sub = _read_groups_with_partition_values(
                        spark, meta, gfiles, sorted(miss), fmt="orc"
                    )
                else:
                    rpaths = _compact_read_paths(
                        [meta.localize(f.path) for f in gfiles]
                    )
                    _tune_listing_parallelism(spark, len(rpaths))
                    sub = spark.read.schema(st).orc(*rpaths)
                subs.append(sub)
        df = subs[0]
        for s in subs[1:]:
            df = df.unionByName(s)
        if filters is not None:
            df = df.filter(pred_to_sql(filters))
        return df

    def _scan_avro_files(
        self, spark: SparkSession, files: list[DataFile], filters
    ) -> DataFrame:
        """AVRO data files (spec-legal; the reference hands them to the
        parquet reader, table.rs:291): decoded EXECUTOR-SIDE by the same
        pure-Python container codec that decodes manifests
        (iceberg/avro.py) — the spark-avro jar is an external module
        absent in this deployment, so the codec distributes as one task
        per file through the SparkContext; at 100 TB AVRO data files
        are a migration tail, and each task streams one file.  Column
        resolution is by NAME (Avro carries no Iceberg field-id footer
        contract Spark could key on); partition values missing from a
        file attach from its manifest tuple, probed per FILE via a
        header-only schema read (same mixed-layout rule as the
        parquet/ORC legs).  Primitive columns only — nested or
        temporal-typed table schemas refuse loudly rather than decode
        into the wrong Spark type."""
        meta = self.metadata
        st = meta.struct_type()
        for f_ in st.fields:
            if not isinstance(
                f_.dataType,
                (
                    T.LongType,
                    T.IntegerType,
                    T.DoubleType,
                    T.FloatType,
                    T.StringType,
                    T.BooleanType,
                    T.BinaryType,
                ),
            ):
                raise UnsupportedFileFormatError(
                    f"AVRO data-file scan supports primitive columns; "
                    f"column {f_.name!r} is {f_.dataType.simpleString()} "
                    "— rewrite the files to parquet"
                )
        from datafusion_iceberg_spark.iceberg.avro import read_avro_schema

        names = [f_.name for f_ in st.fields]
        payload = []
        for f in files:
            p = meta.localize(f.path)
            sch = read_avro_schema(p)
            ffields = {
                fd["name"] for fd in (sch.get("fields") or [])
            } if isinstance(sch, dict) else set()
            part_cols = meta.partition_column_names(f.spec_id)
            pf_by_col = dict(
                zip(part_cols, meta.partition_fields_for_spec(f.spec_id) or [])
            )
            attach = {}
            for c in part_cols:
                if c in ffields:
                    continue
                pf = pf_by_col.get(c)
                if pf is None or pf.transform != "identity":
                    raise UnsupportedFileFormatError(
                        f"AVRO data file {p} lacks column {c!r}, whose "
                        "partition transform is not identity — no value "
                        "to attach; rewrite the file"
                    )
                attach[c] = f.partition.get(pf.name)
            payload.append((p, attach))

        def _rows(item):
            from datafusion_iceberg_spark.iceberg.avro import read_avro_file

            path, attach = item
            _, records = read_avro_file(path)
            for rec in records:
                yield tuple(
                    attach[c] if c in attach else rec.get(c) for c in names
                )

        rdd = spark.sparkContext.parallelize(payload, max(len(payload), 1))
        df = spark.createDataFrame(rdd.flatMap(_rows), st)
        if filters is not None:
            df = df.filter(pred_to_sql(filters))
        return df

    def attach_row_lineage(
        self, spark: SparkSession, df: DataFrame, files: list
    ) -> DataFrame:
        """Resolve v3 row lineage for a scan that carries
        ``_ice_file``/``_ice_pos`` and a (possibly null) materialized
        ``_row_id``: a row's id is the materialized value when present,
        else the file's ``first_row_id`` + position; its
        ``_last_updated_sequence_number`` is the file's data sequence.
        The per-file map is metadata-sized (three scalars per file)."""
        meta = self.metadata
        seqs = meta.snapshot_sequences()
        rows = []
        for f in files:
            if f.first_row_id is None:
                raise ValueError(
                    f"row lineage: data file {f.path} has no "
                    "first_row_id (written before "
                    "write.row-lineage.enabled, or by a writer without "
                    "lineage support)"
                )
            rows.append(
                (
                    meta.localize(f.path),
                    int(f.first_row_id),
                    _file_seq(seqs, f, -1),
                )
            )
        # join on the RAW _ice_file value: the map carries every spelling
        # the scan can produce (plain absolute, file://-URI, file:-URI;
        # object-store schemes pass through localize verbatim as the
        # plain spelling), so no per-row regexp normalization runs in
        # the hot path — at 2M rows that regexp was 3.5× the scan cost
        # (PERF_NOTES round 7)
        spellings = []
        for p, first, seq in rows:
            spellings.append((p, first, seq))
            spellings.append((f"file://{p}", first, seq))
            spellings.append((f"file:{p}", first, seq))
        lin = _local_df(
            spark, spellings, "_lin_path string, _lin_first long, _lin_seq long"
        )
        out = df.join(
            F.broadcast(lin), df["_ice_file"] == lin["_lin_path"], "left"
        )
        last_upd = (
            # rewritten files (COW compaction/update) materialize the
            # row's ORIGINAL last-updated sequence; rows without it take
            # the file's data sequence
            F.coalesce(
                F.col("_last_updated_sequence_number"), F.col("_lin_seq")
            )
            if "_last_updated_sequence_number" in df.columns
            else F.col("_lin_seq")
        )
        return (
            out.withColumn(
                "_row_id",
                F.coalesce(
                    F.col("_row_id"), F.col("_lin_first") + F.col("_ice_pos")
                ),
            )
            .withColumn("_last_updated_sequence_number", last_upd)
            .drop("_lin_path", "_lin_first", "_lin_seq")
        )

    def lineage_df(self, spark: SparkSession) -> DataFrame:
        """Table rows + the Iceberg v3 ROW-LINEAGE columns ``_row_id``
        (stable first-class row identity: assigned once at commit from
        the table's ``next-row-id`` counter, preserved across MOR
        updates via materialization) and
        ``_last_updated_sequence_number`` (the sequence of the commit
        that last wrote the row).  MOR deletes never shift ids (file
        positions are immutable); the reference has no row identity at
        all."""
        files = list(self.files())
        df = self._scan_files(
            spark,
            files,
            None,
            _with_row_meta=True,
            _extra_cols=[
                ("_row_id", T.LongType()),
                ("_last_updated_sequence_number", T.LongType()),
            ],
        )
        return self.attach_row_lineage(spark, df, files).drop(
            "_ice_file", "_ice_pos"
        )

    # -- incremental read (beyond reference parity, like the write path) ---

    def incremental_df(
        self,
        spark: SparkSession,
        from_snapshot_id: int,
        to_snapshot_id: Optional[int] = None,
        filters: Optional[Pred] = None,
    ) -> DataFrame:
        """Rows ADDED after ``from_snapshot_id`` up to ``to_snapshot_id``
        (default: current) — the changelog read an incremental pipeline
        tails instead of rescanning the table.  Implemented as a file-set
        diff of the two snapshots' live file lists (append-only history;
        replace snapshots rewrite files, so incremental reads across a
        compaction fall back to the full new file set — callers should
        checkpoint snapshot ids at compaction boundaries).

        Planning cost is metadata-only (two manifest walks on the driver);
        the scan reads just the added files."""
        old = {f.path for f in self.files(filters, snapshot_id=from_snapshot_id)}
        new = self.files(filters, snapshot_id=to_snapshot_id)
        added = [f for f in new if f.path not in old]
        return self._scan_files(spark, added, filters)

    def count_star(
        self,
        spark: Optional[SparkSession] = None,
        snapshot_id: Optional[int] = None,
        as_of_timestamp_ms: Optional[int] = None,
        ref: Optional[str] = None,
    ) -> int:
        """COUNT(*) from manifest statistics when the snapshot carries no
        delete files — a driver-side manifest walk, zero data IO (the
        statistics feed A10 answering a whole query, the way engines
        serve metadata-only counts).  A snapshot with position/equality
        deletes can't be answered from record_count sums (deleted rows
        still live in the data files), so it falls back to an exact scan
        count — which needs ``spark``."""
        if ref is not None:
            snapshot_id = self.metadata.resolve_ref(ref)
        has_deletes = bool(
            self.position_delete_files(snapshot_id, as_of_timestamp_ms)
        ) or bool(self.equality_delete_files(snapshot_id, as_of_timestamp_ms))
        if not has_deletes:
            return sum(
                f.record_count
                for f in self.files(None, snapshot_id, as_of_timestamp_ms)
            )
        if spark is None:
            raise ValueError(
                "snapshot has delete files; exact count needs a SparkSession"
            )
        return self.to_df(
            spark, snapshot_id=snapshot_id, as_of_timestamp_ms=as_of_timestamp_ms
        ).count()

    def changelog_df(
        self,
        spark: SparkSession,
        from_snapshot_id: Optional[int] = None,
        to_snapshot_id: Optional[int] = None,
        with_row_lineage: bool = False,
        pair_keys: bool = False,
    ) -> DataFrame:
        """Row-level CDC stream over the snapshot range ``(from, to]``:
        table columns plus ``_change_type`` (``'insert'``/``'delete'``)
        and ``_change_ordinal`` (the committing snapshot's ordinal).  An
        UPDATE surfaces as delete+insert at the same ordinal, exactly how
        Spark-on-Iceberg's create_changelog_view renders it.

        ``with_row_lineage`` (v3 row-lineage tables only) adds the
        stable ``_row_id`` to every change row and upgrades same-ordinal
        delete+insert pairs sharing an id into ``update_before`` /
        ``update_after`` images — the keyed CDC feed downstream MERGE
        consumers want, impossible without row identity.

        ``pair_keys`` gives v2 tables (no row lineage) the same upgrade
        on the schema's ``identifier-field-ids`` tuple: a same-ordinal
        delete+insert pair sharing the identifier tuple is an UPDATE —
        exactly the rule the streaming CDC source applies bucket-locally
        under its ``cdc_pair_keys`` option, so batch and stream
        consumers see identical feeds.  Requires declared identifier
        fields; mutually exclusive with ``with_row_lineage`` (the row id
        is the stronger identity — use it when the table has one).

        Per-snapshot cost model (the part that matters at 100 TB):

        - ``append`` — metadata-only file diff; scan just the added files.
        - ``replace`` (compaction) — no logical change; emits nothing.
        - ``delete``/``overwrite`` — exact net diff via EXCEPT ALL, but
          restricted to CHANGED files: rows in files retained on both
          sides with unchanged delete coverage are bitwise identical and
          would cancel, so they are never scanned.  Position deletes name
          their target files (read cheaply, distinct file_path); equality
          deletes can hit any retained older file, so their presence
          widens the diff to all retained files — conservative, correct.
        """
        meta = self.metadata
        key_cols: list[str] = []
        if pair_keys:
            if with_row_lineage:
                raise ValueError(
                    "pair_keys and with_row_lineage are mutually "
                    "exclusive: a row-lineage table pairs on the stable "
                    "_row_id, which subsumes identifier-field pairing"
                )
            key_cols = meta.identifier_field_names()
            if not key_cols:
                raise ValueError(
                    "pair_keys: the table declares no "
                    "identifier-field-ids — set them "
                    "(set_identifier_fields) or use the unpaired "
                    "changelog"
                )
        ords = meta.snapshot_ordinals()
        main = meta.main_ancestry_ids()
        # staged WAP snapshots (in `snapshots`, not in the log) are not
        # main history: the changelog never reports them
        snaps = [
            s
            for s in sorted(meta.snapshots, key=lambda s: ords[s.snapshot_id])
            if s.snapshot_id in main
        ]
        ids = [s.snapshot_id for s in snaps]
        start = ids.index(from_snapshot_id) + 1 if from_snapshot_id is not None else 0
        end = ids.index(to_snapshot_id) + 1 if to_snapshot_id is not None else len(ids)
        window = snaps[start:end]
        prev = ids[start - 1] if start > 0 else None

        def tag(df: DataFrame, kind: str, o: int) -> DataFrame:
            return df.select(
                "*",
                F.lit(kind).alias("_change_type"),
                F.lit(o).alias("_change_ordinal"),
            )

        _lin_extra = [
            ("_row_id", T.LongType()),
            ("_last_updated_sequence_number", T.LongType()),
        ]

        def _with_ids(df: DataFrame, files_list) -> DataFrame:
            """Resolve _row_id for a leg scanned with row meta + the
            materialized column; drop everything but table cols + id."""
            return self.attach_row_lineage(spark, df, files_list).drop(
                "_ice_file", "_ice_pos", "_last_updated_sequence_number"
            )

        # per-snapshot probes memoized across the ordinal loop: snapshot
        # k's file/delete sets are read once, not once as the "new" side
        # and again as the next iteration's "old" side — for a deep
        # history this halves the manifest reads (VERDICT r6 task 4)
        _files_memo: dict = {}
        _pos_memo: dict = {}
        _eq_memo: dict = {}

        def _files_of(sid):
            if sid not in _files_memo:
                _files_memo[sid] = {
                    f.path: f for f in self.files(snapshot_id=sid)
                }
            return _files_memo[sid]

        def _pos_of(sid):
            if sid not in _pos_memo:
                _pos_memo[sid] = self.position_delete_files(snapshot_id=sid)
            return _pos_memo[sid]

        def _eq_of(sid):
            if sid not in _eq_memo:
                _eq_memo[sid] = self.equality_delete_files(snapshot_id=sid)
            return _eq_memo[sid]

        frames: list[DataFrame] = []
        for s in window:
            op = s.summary.get("operation", "")
            o = ords[s.snapshot_id]
            if op == "replace":
                prev = s.snapshot_id
                continue
            old_files = _files_of(prev) if prev is not None else {}
            new_files = _files_of(s.snapshot_id)
            added = [f for p, f in new_files.items() if p not in old_files]
            removed = [f for p, f in old_files.items() if p not in new_files]
            if op == "append":
                if added:
                    sub = self._scan_files(
                        spark,
                        added,
                        None,
                        deletes=[],
                        eq_deletes=[],
                        _with_row_meta=with_row_lineage,
                        _extra_cols=_lin_extra if with_row_lineage else None,
                    )
                    if with_row_lineage:
                        sub = _with_ids(sub, added)
                    frames.append(tag(sub, "insert", o))
                prev = s.snapshot_id
                continue

            old_pos = _pos_of(prev) if prev is not None else []
            old_eq = _eq_of(prev) if prev is not None else []
            new_pos = _pos_of(s.snapshot_id)
            new_eq = _eq_of(s.snapshot_id)
            prev_del_paths = {f.path for f in old_pos} | {f.path for f in old_eq}
            fresh_pos = [f for f in new_pos if f.path not in prev_del_paths]
            fresh_eq = [f for f in new_eq if f.path not in prev_del_paths]
            retained = set(old_files) & set(new_files)
            targeted: set[str] = set()
            if fresh_eq:
                targeted = retained
            elif fresh_pos:
                # position deletes carry their targets' paths: one narrow
                # scan of the (small) delete files bounds the diff set.
                # DV entries (puffin) name the target in the entry itself.
                norm = {
                    meta.localize(f.referenced_data_file)
                    for f in fresh_pos
                    if f.referenced_data_file is not None
                }
                tpaths = [
                    meta.localize(f.path)
                    for f in fresh_pos
                    if f.referenced_data_file is None
                ]
                if tpaths:
                    hits = (
                        spark.read.parquet(*tpaths)
                        .select(
                            F.regexp_replace(
                                F.col("file_path"), "^file:/*", "/"
                            ).alias("p")
                        )
                        .distinct()
                        .collect()
                    )
                    norm |= {r.p for r in hits}
                targeted = {p for p in retained if meta.localize(p) in norm}
            added_paths = {meta.localize(f.path) for f in added}
            dv_only = (
                not removed
                and not fresh_eq
                and fresh_pos
                and all(
                    f.referenced_data_file is not None
                    and meta.localize(f.referenced_data_file)
                    not in added_paths
                    for f in fresh_pos
                )
            )
            if dv_only:
                # DV delete / row-delta snapshot: the net diff IS the
                # bitmap delta (fresh blob minus the file's prior blob)
                # plus, for a row-delta (MOR UPDATE/MERGE), the added
                # replacement/insert files as plain inserts.  The
                # general EXCEPT-ALL path applies every ACCUMULATED
                # delete to both sides, so its per-snapshot cost grows
                # with delete history and a deep changelog turns
                # quadratic; here we scan the targeted files once with
                # NO delete application and semi-join the bitmap-scale
                # delta (VERDICT r6 task 4 deep-history fix).
                if added:
                    ins = self._scan_files(
                        spark,
                        added,
                        None,
                        deletes=[],
                        eq_deletes=[],
                        _with_row_meta=with_row_lineage,
                        _extra_cols=_lin_extra if with_row_lineage else None,
                    )
                    if with_row_lineage:
                        ins = _with_ids(ins, added)
                    frames.append(tag(ins, "insert", o))
                old_dv = {
                    meta.localize(f.referenced_data_file): f
                    for f in old_pos
                    if f.referenced_data_file is not None
                }
                new_dv_rows, old_dv_rows = [], []
                for f in fresh_pos:
                    tgt = meta.localize(f.referenced_data_file)
                    new_dv_rows.append(
                        (
                            meta.localize(f.path),
                            int(f.content_offset or 0),
                            int(f.content_size_in_bytes or 0),
                            tgt,
                        )
                    )
                    prior = old_dv.get(tgt)
                    if prior is not None:
                        old_dv_rows.append(
                            (
                                meta.localize(prior.path),
                                int(prior.content_offset or 0),
                                int(prior.content_size_in_bytes or 0),
                                tgt,
                            )
                        )
                delta = _decode_dv_frame(spark, new_dv_rows)
                if old_dv_rows:
                    delta = delta.exceptAll(
                        _decode_dv_frame(spark, old_dv_rows)
                    )
                tgt_paths = {r[3] for r in new_dv_rows}
                tfs = [
                    old_files[p]
                    for p in sorted(retained)
                    if meta.localize(p) in tgt_paths
                ]
                sub = self._scan_files(
                    spark,
                    tfs,
                    None,
                    deletes=[],
                    eq_deletes=[],
                    _with_row_meta=True,
                    _extra_cols=_lin_extra if with_row_lineage else None,
                )
                # the decoded delta frame has no Spark stats (mapInPandas
                # RDD) — broadcast it when the manifests bound its size,
                # else the semi join shuffles the whole scanned side (the
                # same r10 fix as _apply_position_deletes)
                fresh_rows = 0
                for f in fresh_pos:
                    if f.record_count is None:
                        fresh_rows = None
                        break
                    fresh_rows += int(f.record_count)
                if fresh_rows is not None and fresh_rows <= _DELETE_BROADCAST_ROWS:
                    delta = F.broadcast(delta)
                cond = (
                    F.regexp_replace(sub["_ice_file"], "^file:/*", "/")
                    == delta["_del_file"]
                ) & (sub["_ice_pos"] == delta["_del_pos"])
                out = sub.join(delta, cond, "left_semi")
                out = (
                    _with_ids(out, tfs)
                    if with_row_lineage
                    else out.drop("_ice_file", "_ice_pos")
                )
                frames.append(tag(out, "delete", o))
                prev = s.snapshot_id
                continue

            old_side = removed + [old_files[p] for p in sorted(targeted)]
            new_side = added + [new_files[p] for p in sorted(targeted)]
            old_df = self._scan_files(
                spark,
                old_side,
                None,
                deletes=old_pos,
                eq_deletes=old_eq,
                _with_row_meta=with_row_lineage,
                _extra_cols=_lin_extra if with_row_lineage else None,
            )
            new_df = self._scan_files(
                spark,
                new_side,
                None,
                deletes=new_pos,
                eq_deletes=new_eq,
                _with_row_meta=with_row_lineage,
                _extra_cols=_lin_extra if with_row_lineage else None,
            )
            if with_row_lineage:
                # diff WITH the id column: two content-identical rows
                # with different ids stay distinct, and an update's
                # pre/post images can later pair on the id
                old_df = _with_ids(old_df, old_side)
                new_df = _with_ids(new_df, new_side)
            frames.append(tag(new_df.exceptAll(old_df), "insert", o))
            frames.append(tag(old_df.exceptAll(new_df), "delete", o))
            prev = s.snapshot_id

        if not frames:
            st = T.StructType(
                meta.struct_type().fields
                + ([T.StructField("_row_id", T.LongType())] if with_row_lineage else [])
                + [
                    T.StructField("_change_type", T.StringType()),
                    T.StructField("_change_ordinal", T.IntegerType()),
                ]
            )
            return _local_df(spark, [], st)
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f)
        if with_row_lineage or pair_keys:
            from pyspark.sql import Window

            # a delete+insert pair at ONE ordinal sharing ONE identity —
            # the _row_id on lineage tables, the identifier-field tuple
            # under keyed pairing — is an UPDATE: rename into
            # before/after images (keyed window — partitions by the
            # identity, no global shuffle hot spot; same rule the
            # streaming CDC source applies bucket-locally)
            ident = ["_row_id"] if with_row_lineage else key_cols
            w = Window.partitionBy(*ident, "_change_ordinal")
            # only 'insert'/'delete' exist at this point, so "both kinds
            # present" is min != max — no per-row set materialization
            both = (
                F.min("_change_type").over(w) != F.max("_change_type").over(w)
            )
            out = out.withColumn(
                "_change_type",
                F.when(
                    both & (F.col("_change_type") == "delete"),
                    "update_before",
                )
                .when(
                    both & (F.col("_change_type") == "insert"),
                    "update_after",
                )
                .otherwise(F.col("_change_type")),
            )
        return out


# delete-position count below which the anti-join's delete side
# broadcasts (manifest-known cardinality; ~100 bytes/row worst case →
# ≲100 MB broadcast, well under executor memory at cluster scale)
_DELETE_BROADCAST_ROWS = 1_000_000


def _apply_position_deletes(
    spark: SparkSession,
    meta: TableMetadata,
    df: DataFrame,
    deletes: list[DataFile],
    files: Optional[list[DataFile]] = None,
) -> DataFrame:
    """Anti-join the scan against position-delete rows on (file, pos).
    Paths normalize to scheme-less absolutes on both sides (_metadata
    yields file:// URIs; manifests record localized paths).

    Join strategy (r10): parquet-backed delete sides carry stats, but a
    DECODED DV frame is a mapInPandas RDD Spark sizes as unknown — the
    planner then SHUFFLES the whole fact side into a sort-merge anti
    join (measured: the dominant cost of a 1.5M-row DV-masked scan).
    The manifests already know the exact delete cardinality
    (record_count per delete entry = DV cardinality for v3 blobs), so
    when the summed count is under ``_DELETE_BROADCAST_ROWS`` the delete
    side gets an explicit broadcast hint: zero fact-side shuffle, the
    plan a 1000-executor cluster wants for CDC-scale deletes.  Unknown
    or huge counts keep the shuffle join (correct for massive purges).

    Sequence fidelity (v2 spec): a position delete applies only to data
    files whose data sequence number is <= the delete's.  Path equality
    makes this moot for linear histories (a future file can't be named
    by an older delete), but branch/rollback/WAP histories CAN surface a
    same-path file at a later sequence — so delete files that are newer
    than NO scanned data file they could target are filtered out, by
    pairing each delete row with its target file's sequence.

    DV legs resolve BOTH rules driver-side (r15): a deletion vector
    names its target (``referenced_data_file``) and both sequence
    numbers are manifest state, so target-not-scanned and
    newer-data-file vectors are dropped before any plan is built, and
    the surviving vectors need no sequence join at all — a branch scan
    (SPJ union, changelog leg) decodes only ITS files' vectors, and
    across a union every vector is decoded exactly once.  Path-named
    parquet delete files keep the executed sequence filter, against a
    BROADCAST (path, seq) map — a local-list frame has no size
    estimate, so the planner otherwise sorts and shuffles both sides
    into a SortMergeJoin (3 Exchanges + 2 Sorts per scan, measured on
    the DV gates at sf0.1)."""
    seqs = meta.snapshot_sequences()
    file_seq = (
        {meta.localize(f.path): _file_seq(seqs, f, -1) for f in files}
        if files
        else {}
    )
    pq_sides = []
    dv_rows = []
    kept: list[DataFile] = []
    for d in deletes:
        if d.referenced_data_file is not None:
            # v3 deletion vector: one puffin blob per target data file,
            # decoded in executors (one task per DV batch) — the ranged
            # read shape a reader at scale uses
            tgt = meta.localize(d.referenced_data_file)
            dseq = _file_seq(seqs, d, 1 << 31)
            if files:
                fseq = file_seq.get(tgt)
                if fseq is None:
                    continue  # targets a file outside this scan
                if fseq > dseq:
                    continue  # data file is newer than the delete
            dv_rows.append(
                (
                    meta.localize(d.path),
                    int(d.content_offset or 0),
                    int(d.content_size_in_bytes or 0),
                    tgt,
                )
            )
            kept.append(d)
            continue
        one = spark.read.parquet(meta.localize(d.path)).select(
            F.regexp_replace(F.col("file_path"), "^file:/*", "/").alias("_del_file"),
            F.col("pos").alias("_del_pos"),
            F.lit(_file_seq(seqs, d, 1 << 31)).cast("long").alias("_del_seq"),
        )
        pq_sides.append(one)
        kept.append(d)
    if not dv_rows and not pq_sides:
        return df
    pos = None
    if pq_sides:
        pos = pq_sides[0]
        for s in pq_sides[1:]:
            pos = pos.unionByName(s)
        if file_seq:
            # metadata-sized map: one (path, seq) row per scanned file
            fs = F.broadcast(
                _local_df(
                    spark,
                    list(file_seq.items()),
                    "_fs_path: string, _fs_seq: long",
                )
            )
            pos = (
                pos.join(fs, pos["_del_file"] == fs["_fs_path"], "left")
                .filter(
                    F.col("_fs_seq").isNull()  # unknown target: conservative
                    | (F.col("_fs_seq") <= F.col("_del_seq"))
                )
            )
        pos = pos.select("_del_file", "_del_pos")
    if dv_rows:
        dv = _decode_dv_frame(spark, dv_rows)
        pos = dv if pos is None else pos.unionByName(dv)
    total_rows = 0
    for d in kept:
        if d.record_count is None:
            total_rows = None
            break
        total_rows += int(d.record_count)
    if total_rows is not None and total_rows <= _DELETE_BROADCAST_ROWS:
        pos = F.broadcast(pos)
    cond = (
        F.regexp_replace(df["_ice_file"], "^file:/*", "/") == pos["_del_file"]
    ) & (df["_ice_pos"] == pos["_del_pos"])
    return df.join(pos, cond, "left_anti")


def _tune_listing_parallelism(spark: SparkSession, n_paths: int) -> None:
    """Bound the file-listing job's task count before an explicit-path
    read.  Spark's parallel partition discovery defaults to ONE TASK PER
    PATH (parallelism cap 10000) — measured at 23.8 s for a 10k-file
    explicit list on local[8], vs 5.5 s with the cap below and 3.7 s for
    the equivalent directory read (PERF_NOTES round 6).  ~64 files per
    listing task amortizes scheduling overhead locally and batches
    object-store HEADs per task on a cluster; the floor of 32 keeps a
    wide cluster's listing distributed."""
    if n_paths <= 32:
        return  # below Spark's parallel-discovery threshold: driver lists
    par = min(10000, max(32, -(-n_paths // 64)))
    try:  # runtime SQLConf; a locked-down session just keeps the default
        spark.conf.set(
            "spark.sql.sources.parallelPartitionDiscovery.parallelism", str(par)
        )
    except Exception:
        pass




def _decode_dv_frame(spark: SparkSession, dv_rows: list[tuple]) -> DataFrame:
    """(puffin_path, offset, length, target_file) rows → the
    (_del_file, _del_pos) frame position-delete application anti-joins
    against.  Blob decode runs in executors via mapInPandas — the driver
    ships only the metadata-scale DV list.  Sequence filtering happened
    driver-side (a DV names its target, so both seqs are known before
    planning)."""

    def decode(batches):
        import pandas as pd

        from datafusion_iceberg_spark.iceberg.puffin import (
            read_dv_positions,
        )

        for pdf in batches:
            rows = []
            for p, off, ln, tgt in pdf.itertuples(index=False):
                for pos in read_dv_positions(p, int(off), int(ln)):
                    rows.append((tgt, pos))
            yield pd.DataFrame(rows, columns=["_del_file", "_del_pos"])

    inp = _local_df(spark, dv_rows, "p string, o long, l long, tgt string")
    if len(dv_rows) > 1:
        # spread blob decodes one-per-task; a single vector skips the
        # round-robin Exchange (one fewer stage per scan)
        inp = inp.repartition(min(len(dv_rows), 64))
    return inp.mapInPandas(decode, "_del_file string, _del_pos long")


def _compact_read_paths(paths: list[str], threshold: int = 64) -> list[str]:
    """Collapse an explicit file list into whole-directory reads where a
    directory's parquet listing is EXACTLY the selected files.

    Why (VERDICT r4 item #2, measured in PERF_NOTES.md): Spark stats
    every explicitly-passed path before planning — above the
    parallel-discovery threshold that becomes a distributed listing job
    with ONE TASK PER FILE (19.1 s for a 10k-file scan on local[8]; the
    same scan via its directory: 2.7 s).  A directory path is one
    recursive listStatus instead of N per-file calls — on an object
    store, one LIST page per ~1000 keys instead of N HEAD requests.
    Our writer's layout makes full coverage the common case: every
    snapshot writes its own ``data/snap-<id>[/<part>=<val>]`` leaf
    directories, immutable once committed, so a live snapshot's file set
    covers its directories exactly; after a COW rewrite the old
    directory holds now-dead files, coverage fails, and those survivors
    fall back to explicit paths — correctness never depends on the
    directory state.  Only local paths compact (one cheap listdir per
    directory); scheme-prefixed paths and directories with
    subdirectories (partition-discovery risk) stay explicit."""
    if len(paths) < threshold:
        return paths
    by_dir: dict[str, list[str]] = {}
    for p in paths:
        by_dir.setdefault(os.path.dirname(p), []).append(p)
    out: list[str] = []
    for d, ps in by_dir.items():
        if "://" in d:
            out.extend(ps)
            continue
        try:
            entries = os.listdir(d)
        except OSError:
            out.extend(ps)
            continue
        parquet = {e for e in entries if e.endswith(".parquet")}
        clutter = [
            e
            for e in entries
            if e not in parquet and not e.startswith((".", "_"))
        ]
        if clutter:  # subdirs or foreign files — don't risk recursion
            out.extend(ps)
            continue
        if parquet == {os.path.basename(p) for p in ps}:
            out.append(d)
        else:
            out.extend(ps)
    return out


def _file_seq(seqs: dict[int, int], f: DataFile, unknown: int) -> int:
    """Effective data sequence number of a manifest entry: the explicit /
    manifest-inherited v2 ``sequence_number`` when the table recorded one
    (foreign v2 warehouses, this repo's v2 writer), else the owning
    snapshot's entry in :meth:`TableMetadata.snapshot_sequences`, else
    ``unknown`` (callers pick the conservative direction: -1 for data
    files, 2**31 for delete files — both make deletes apply)."""
    if f.sequence_number is not None:
        return f.sequence_number
    return seqs.get(f.added_snapshot_id, unknown)


def _apply_equality_deletes(
    spark: SparkSession,
    meta: TableMetadata,
    df: DataFrame,
    eq_deletes: list[DataFile],
    files: list[DataFile],
) -> DataFrame:
    """Anti-join the scan against equality-delete rows, sequence-aware.

    Semantics (Iceberg v2 spec): a delete row with key columns
    ``equality_ids`` removes every data row whose key tuple null-safe
    equals it AND whose data file was committed STRICTLY BEFORE the
    delete (so keys re-appended after the delete survive).  Commit order
    is the v2 data sequence number: the entry's explicit/inherited
    ``sequence_number`` when present (foreign v2 tables, our v2 writer),
    else :meth:`TableMetadata.snapshot_sequences` — which itself prefers
    real snapshot ``sequence-number`` fields over ordinal fallback.  The
    reference never reaches this path (it drops content=1 manifests
    wholesale, table.rs manifest walk).

    Scale shape: each data row is tagged with its file's commit ordinal
    via a broadcast join against a (path, ordinal) map that is
    metadata-sized (one row per file).  The delete side ships only the
    key columns + one ordinal; Spark sizes it from the parquet footprint,
    so AQE picks broadcast for the common small-CDC case and a shuffle
    hash join when the delete set is huge.  No collect of either side."""
    seqs = meta.snapshot_sequences()
    seq_rows = [
        (meta.localize(f.path), _file_seq(seqs, f, -1)) for f in files
    ]
    seq_df = F.broadcast(
        _local_df(spark, seq_rows, "_seq_path: string, _ice_seq: long")
    )
    df = df.join(
        seq_df,
        F.regexp_replace(df["_ice_file"], "^file:/*", "/") == seq_df["_seq_path"],
        "left",
    ).drop("_seq_path")

    names_by_id = {v: k for k, v in meta.field_ids_by_name().items()}
    groups: dict[tuple, list[DataFile]] = {}
    for d in eq_deletes:
        groups.setdefault(tuple(sorted(d.equality_ids)), []).append(d)

    for sig, dels in groups.items():
        key_cols = [names_by_id[i] for i in sig]
        side = None
        for d in dels:
            # unknown delete sequence → newest (delete applies everywhere):
            # conservative in the same direction as the data-side -1
            seq = _file_seq(seqs, d, 1 << 31)
            one = (
                spark.read.parquet(meta.localize(d.path))
                .select(
                    *[F.col(c).alias(f"_del_{c}") for c in key_cols],
                    F.lit(seq).cast("long").alias("_del_seq"),
                )
            )
            side = one if side is None else side.unionByName(one)
        cond = F.col("_ice_seq") < F.col("_del_seq")
        for c in key_cols:
            cond = cond & F.col(c).eqNullSafe(F.col(f"_del_{c}"))
        df = df.join(side, cond, "left_anti")
    return df.drop("_ice_seq")


# Footer-probe memo: data files are immutable once committed, so a
# path's (names, field-ids) never changes — per-FILE presence probes
# (the mixed-layout correctness rule, ADVICE r13) stay O(1) after the
# first scan of a table instead of re-reading footers every plan.
_FOOTER_PROBE_CACHE: dict = {}  # parquet: path → (names, ids); orc: ("orc", path) → names
_FOOTER_PROBE_CACHE_MAX = 262_144


def _footer_probe(path: str) -> tuple[frozenset, frozenset]:
    """(column names, PARQUET:field_id values) of a parquet footer."""
    hit = _FOOTER_PROBE_CACHE.get(path)
    if hit is not None:
        return hit
    import pyarrow.parquet as pq

    sch = pq.read_schema(path)
    ids = set()
    for f in sch:
        v = (f.metadata or {}).get(b"PARQUET:field_id")
        if v is not None:
            ids.add(v.decode())
    out = (frozenset(sch.names), frozenset(ids))
    if len(_FOOTER_PROBE_CACHE) >= _FOOTER_PROBE_CACHE_MAX:
        _FOOTER_PROBE_CACHE.clear()
    _FOOTER_PROBE_CACHE[path] = out
    return out


def _orc_footer_names(path: str) -> frozenset:
    """Top-level column names of an ORC footer — pyarrow driver-side
    (no py4j round-trip) and memoized like the parquet probe: data
    files are immutable, so a 1,000-file table pays the footer reads
    once per session, not once per plan."""
    hit = _FOOTER_PROBE_CACHE.get(("orc", path))
    if hit is not None:
        return hit
    import pyarrow.orc as paorc

    names = frozenset(paorc.ORCFile(path).schema.names)
    if len(_FOOTER_PROBE_CACHE) >= _FOOTER_PROBE_CACHE_MAX:
        _FOOTER_PROBE_CACHE.clear()
    _FOOTER_PROBE_CACHE[("orc", path)] = names
    return names


def _file_has_column(path: str, col: str, meta=None, with_ids: bool = False) -> bool:
    """Physical column-presence probe.  Resolution is by FIELD ID whenever
    the file carries ids and ``meta`` maps the name — a post-RENAME scan
    probing by name would misclassify files that store the column under
    its old name (and, for the v3 defaults split, silently overwrite
    their stored values with the initial-default).  ``with_ids`` is kept
    for callers that already know; id resolution is attempted regardless
    since a file without ids just falls back to the name check."""
    try:
        names, ids = _footer_probe(path)
        fid = meta.field_ids_by_name().get(col) if meta is not None else None
        if fid is not None and ids:
            return str(fid) in ids
        return col in names
    except Exception:
        return True  # assume present; read will surface real errors


def _file_has_field_ids(path: str) -> bool:
    try:
        import pyarrow.parquet as pq

        sch = pq.read_schema(path)
        return len(sch) > 0 and all(
            (f.metadata or {}).get(b"PARQUET:field_id") is not None for f in sch
        )
    except Exception:
        return False


def _hive_discovery_read(
    spark: SparkSession,
    meta: TableMetadata,
    files: list[DataFile],
    missing: list[str],
    st,
    with_row_meta: bool,
    fmt: str,
    types_by_id,
    ids_by_name,
) -> Optional[DataFrame]:
    """ONE partition-discovery read replacing per-group reads, when the
    directory layout PROVABLY reproduces the manifest values.

    The per-group path issues one ``spark.read`` per distinct partition
    tuple — measured at 150 ms of py4j round-trips each, the dominant
    plan-build cost of an SPJ over a directory-only (Hive-style) layout
    (168 groups → 5 s of driver time at the composite gate).  When
    every file's path carries ``col=value`` components whose PARSED
    value equals the manifest partition value, Spark's own partition
    discovery reconstructs the columns exactly, so the whole file set
    reads in ONE call with the full schema (discovered columns take the
    schema's types; extra discovered dirs — e.g. the bucket component —
    are dropped by the final projection).

    Conservative: integer-typed identity values only (int/long parse is
    unambiguous; strings would need escape-fidelity, timestamps a
    format contract), local paths, no NULL partition values, every
    missing column present in every path — ANY doubt returns None and
    the exact per-group attach runs instead."""
    if fmt not in ("parquet", "orc") or not files or not missing:
        return None
    if with_row_meta and fmt != "parquet":
        return None
    for col in missing:
        if types_by_id.get(ids_by_name.get(col)) not in ("int", "long"):
            return None
    by_base: dict[str, list[str]] = {}
    for f in files:
        p = meta.localize(f.path)
        if "://" in p:
            return None
        comp: dict[str, str] = {}
        cur = os.path.dirname(p)
        while "=" in os.path.basename(cur):
            k, _, v = os.path.basename(cur).partition("=")
            comp.setdefault(k, v)
            cur = os.path.dirname(cur)
        for col in missing:
            raw = f.partition.get(col)
            if raw is None or col not in comp:
                return None
            try:
                if int(comp[col]) != int(raw):
                    return None
            except (TypeError, ValueError):
                return None
        by_base.setdefault(cur, []).append(p)
    cols = [f.name for f in st.fields]
    if with_row_meta:
        cols = cols + [
            F.col("_metadata.file_path").alias("_ice_file"),
            F.col("_metadata.row_index").alias("_ice_pos"),
        ]
    # ONE read per non-partition base (= per contributing snapshot dir):
    # Spark's discovery refuses paths whose partition components start at
    # different ancestors (CONFLICTING_DIRECTORY_STRUCTURES), so a
    # multi-snapshot table unions per-base reads — #bases is bounded by
    # the live snapshot dirs, far below the per-partition-tuple fanout
    # this fast path replaces.  Leaf-directory compaction still applies
    # (partition components live ABOVE the leaf).
    subs = []
    for base in sorted(by_base):
        paths = _compact_read_paths(by_base[base])
        _tune_listing_parallelism(spark, len(paths))
        df = getattr(
            spark.read.schema(st).option("basePath", base), fmt
        )(*paths)
        subs.append(df.select(*cols))
    out = subs[0]
    for s in subs[1:]:
        out = out.unionByName(s)
    return out


def _read_groups_with_partition_values(
    spark: SparkSession,
    meta: TableMetadata,
    files: list[DataFile],
    missing: list[str],
    with_ids: bool = False,
    with_row_meta: bool = False,
    fmt: str = "parquet",
) -> DataFrame:
    """Group files by partition tuple (A6) and attach the missing partition
    columns as typed literals per group — the Spark rendering of the
    reference's schema-split + projection remap (table.rs:232-279), with
    Catalyst's name resolution replacing the positional remapping."""
    types_by_id = meta.types_by_field_id()
    ids_by_name = meta.field_ids_by_name()
    st = meta.struct_type(with_field_ids=with_ids)
    read_fields = [f for f in st.fields if f.name not in missing]
    from pyspark.sql import types as T

    read_schema = T.StructType(read_fields)

    fast = _hive_discovery_read(
        spark, meta, files, missing, st, with_row_meta, fmt,
        types_by_id, ids_by_name,
    )
    if fast is not None:
        return fast

    groups: dict[tuple, list[str]] = {}
    part_values: dict[tuple, dict[str, Any]] = {}
    for f in files:
        key = tuple(sorted(f.partition.items()))
        groups.setdefault(key, []).append(meta.localize(f.path))
        part_values[key] = f.partition

    parts = []
    for key, paths in groups.items():
        gpaths = _compact_read_paths(paths)
        _tune_listing_parallelism(spark, len(gpaths))
        if with_row_meta and fmt != "parquet":
            raise ValueError("row metadata requires parquet data files")
        df = getattr(spark.read.schema(read_schema), fmt)(*gpaths)
        for col in missing:
            raw = part_values[key].get(col)
            ice_t = types_by_id[ids_by_name[col]]
            spark_t = iceberg_type_to_spark(ice_t)
            # manifest partition values for identity transforms are typed
            # python scalars from Avro decoding, EXCEPT date/timestamp,
            # whose manifest domain is days/micros-from-epoch ints (Avro
            # logical types) — rehydrate before the literal cast
            if isinstance(raw, int) and isinstance(ice_t, str):
                from datetime import timedelta

                from datafusion_iceberg_spark.iceberg.stats import (
                    EPOCH_DATE,
                    EPOCH_TS,
                )

                if ice_t == "date":
                    raw = EPOCH_DATE + timedelta(days=raw)
                elif ice_t.startswith("timestamp"):
                    raw = EPOCH_TS + timedelta(microseconds=raw)
            df = df.withColumn(col, F.lit(raw).cast(spark_t))
        cols = [f.name for f in st.fields]
        if with_row_meta:
            cols += [
                F.col("_metadata.file_path").alias("_ice_file"),
                F.col("_metadata.row_index").alias("_ice_pos"),
            ]
        parts.append(df.select(*cols))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def min_max_by_field(table: IcebergTable, field_name: str):
    """Decoded (min, max) across live files for one column — metadata-only
    answer, no data scan (useful for tests and planning)."""
    meta = table.metadata
    fid = meta.field_ids_by_name()[field_name]
    t = meta.types_by_field_id()[fid]
    los, his = [], []
    for f in table.files():
        lo = decode_stat(t, f.lower_bounds.get(fid))
        hi = decode_stat(t, f.upper_bounds.get(fid))
        if lo is not None:
            los.append(lo)
        if hi is not None:
            his.append(hi)
    return (min(los) if los else None, max(his) if his else None)
