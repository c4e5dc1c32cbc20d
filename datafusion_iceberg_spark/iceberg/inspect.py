"""Iceberg metadata tables — ``snapshots`` / ``files`` / ``manifests`` /
``partitions`` / ``history`` / ``refs`` as queryable DataFrames, the
surface Spark exposes as ``db.tbl.files`` and Trino as ``"tbl$files"``.

The reference has none of these (its scan is pinned to the current
snapshot and the metadata stays internal — SURVEY.md §2C scope fence);
they are table stakes for operating an Iceberg warehouse, so we add
them the way we added the write path.

Scale design: the ``files`` table is the only one whose row count grows
with the data (a 100 TB table has 10^5–10^6 data files) — it is built
DISTRIBUTED: one input row per manifest, executors parse the manifest
Avro and emit one output row per file, so the driver holds only the
manifest list (bounded by snapshot count × partitions, thousands at
most).  ``partitions`` is a groupBy over that distributed frame.  The
per-snapshot tables (``snapshots``, ``history``, ``manifests``,
``refs``) are inherently small — driver-side rows are the right call.
"""

from __future__ import annotations

from datetime import datetime, timezone
from typing import TYPE_CHECKING, Iterator, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from datafusion_iceberg_spark.session import local_df

if TYPE_CHECKING:  # pragma: no cover
    from datafusion_iceberg_spark.iceberg.table import IcebergTable

_FILES_SCHEMA = T.StructType(
    [
        T.StructField("content", T.IntegerType()),
        T.StructField("file_path", T.StringType()),
        T.StructField("file_format", T.StringType()),
        T.StructField("spec_id", T.IntegerType()),
        T.StructField("partition", T.MapType(T.StringType(), T.StringType())),
        T.StructField("record_count", T.LongType()),
        T.StructField("file_size_in_bytes", T.LongType()),
        T.StructField("added_snapshot_id", T.LongType()),
        T.StructField("added_ordinal", T.IntegerType()),
        T.StructField("value_counts", T.MapType(T.StringType(), T.LongType())),
        T.StructField(
            "null_value_counts", T.MapType(T.StringType(), T.LongType())
        ),
        T.StructField("lower_bounds", T.MapType(T.StringType(), T.StringType())),
        T.StructField("upper_bounds", T.MapType(T.StringType(), T.StringType())),
    ]
)

_SNAPSHOTS_SCHEMA = T.StructType(
    [
        T.StructField("committed_at", T.TimestampType()),
        T.StructField("snapshot_id", T.LongType()),
        T.StructField("parent_id", T.LongType()),
        T.StructField("ordinal", T.IntegerType()),
        T.StructField("operation", T.StringType()),
        T.StructField("summary", T.MapType(T.StringType(), T.StringType())),
        T.StructField("is_current", T.BooleanType()),
    ]
)

_MANIFESTS_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("length", T.LongType()),
        T.StructField("partition_spec_id", T.IntegerType()),
        T.StructField("content", T.IntegerType()),
        T.StructField("added_snapshot_id", T.LongType()),
        T.StructField("added_data_files_count", T.IntegerType()),
        T.StructField("existing_data_files_count", T.IntegerType()),
        T.StructField("deleted_data_files_count", T.IntegerType()),
        T.StructField("added_rows_count", T.LongType()),
        T.StructField("existing_rows_count", T.LongType()),
        T.StructField("partition_summaries_count", T.IntegerType()),
    ]
)

_HISTORY_SCHEMA = T.StructType(
    [
        T.StructField("made_current_at", T.TimestampType()),
        T.StructField("snapshot_id", T.LongType()),
        T.StructField("ordinal", T.IntegerType()),
        T.StructField("is_current_ancestor", T.BooleanType()),
    ]
)

_ENTRIES_SCHEMA = T.StructType(
    [
        T.StructField("status", T.IntegerType()),
        T.StructField("snapshot_id", T.LongType()),
        T.StructField("sequence_number", T.LongType()),
        T.StructField("content", T.IntegerType()),
        T.StructField("file_path", T.StringType()),
        T.StructField("record_count", T.LongType()),
        T.StructField("file_size_in_bytes", T.LongType()),
    ]
)

_METADATA_LOG_SCHEMA = T.StructType(
    [
        T.StructField("file", T.StringType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("latest_snapshot_id", T.LongType()),
        T.StructField("latest_schema_id", T.IntegerType()),
        T.StructField("latest_sequence_number", T.LongType()),
    ]
)

_POSITION_DELETES_SCHEMA = T.StructType(
    [
        T.StructField("file_path", T.StringType()),
        T.StructField("pos", T.LongType()),
        T.StructField("delete_file_path", T.StringType()),
        T.StructField("delete_kind", T.StringType()),
    ]
)

_ALL_MANIFESTS_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("length", T.LongType()),
        T.StructField("partition_spec_id", T.IntegerType()),
        T.StructField("content", T.IntegerType()),
        T.StructField("added_snapshot_id", T.LongType()),
        T.StructField("reference_snapshot_id", T.LongType()),
        T.StructField("reference_ordinal", T.IntegerType()),
    ]
)

_REFS_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("snapshot_id", T.LongType()),
        T.StructField("ordinal", T.IntegerType()),
    ]
)


def _utc(ms: int) -> datetime:
    # naive UTC: Spark TimestampType + session tz UTC in tests; oracle
    # comparisons avoid timestamps entirely (ordinals instead)
    return datetime.fromtimestamp(ms / 1000, tz=timezone.utc).replace(tzinfo=None)


def _stringify(v) -> Optional[str]:
    if v is None:
        return None
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


class Inspect:
    """``table.inspect.files(spark)`` etc. — one accessor per metadata
    table, each returning a DataFrame."""

    def __init__(self, table: "IcebergTable"):
        self._t = table

    # -- snapshot-bounded small tables (driver rows) -------------------

    def snapshots(self, spark: SparkSession) -> DataFrame:
        meta = self._t.metadata
        ordinals = meta.snapshot_ordinals()
        rows = []
        prev: Optional[int] = None
        for s in sorted(
            meta.snapshots, key=lambda s: ordinals.get(s.snapshot_id, 0)
        ):
            rows.append(
                (
                    _utc(s.timestamp_ms),
                    s.snapshot_id,
                    # stored parent (exact, incl. staged WAP snapshots)
                    # with list-order fallback for metadata written
                    # before parent tracking
                    s.parent_id if s.parent_id is not None else prev,
                    ordinals.get(s.snapshot_id, 0),
                    s.summary.get("operation"),
                    {k: str(v) for k, v in s.summary.items()},
                    s.snapshot_id == meta.current_snapshot_id,
                )
            )
            prev = s.snapshot_id
        return local_df(spark, rows, _SNAPSHOTS_SCHEMA)

    def history(self, spark: SparkSession) -> DataFrame:
        meta = self._t.metadata
        ordinals = meta.snapshot_ordinals()
        log = meta.raw.get("snapshot-log", [])
        # linear history: every logged snapshot still in `snapshots` is an
        # ancestor of current (rollback rewrites the log)
        live = {s.snapshot_id for s in meta.snapshots}
        rows = [
            (
                _utc(e["timestamp-ms"]),
                e["snapshot-id"],
                ordinals.get(e["snapshot-id"], -1),
                e["snapshot-id"] in live,
            )
            for e in log
        ]
        return local_df(spark, rows, _HISTORY_SCHEMA)

    def manifests(
        self, spark: SparkSession, snapshot_id: Optional[int] = None
    ) -> DataFrame:
        rows = []
        for content in (0, 1):
            for mf in self._t.manifests(snapshot_id, content=content):
                rows.append(
                    (
                        mf.path,
                        mf.length,
                        mf.partition_spec_id,
                        mf.content,
                        mf.added_snapshot_id,
                        mf.added_files_count,
                        mf.existing_files_count,
                        mf.deleted_files_count,
                        mf.added_rows_count,
                        mf.existing_rows_count,
                        len(mf.partitions),
                    )
                )
        return local_df(spark, rows, _MANIFESTS_SCHEMA)

    def refs(self, spark: SparkSession) -> DataFrame:
        meta = self._t.metadata
        ordinals = meta.snapshot_ordinals()
        rows = []
        for name, ref in sorted(meta.raw.get("refs", {}).items()):
            sid = ref["snapshot-id"]
            rows.append(
                (name, ref.get("type", "branch"), sid, ordinals.get(sid, -1))
            )
        # implicit main branch -> current snapshot (Iceberg spec: `main`
        # exists whenever the table has a current snapshot)
        if meta.current_snapshot_id not in (None, -1) and "main" not in meta.raw.get(
            "refs", {}
        ):
            rows.append(
                (
                    "main",
                    "branch",
                    meta.current_snapshot_id,
                    ordinals.get(meta.current_snapshot_id, -1),
                )
            )
        return local_df(spark, sorted(rows), _REFS_SCHEMA)

    # -- files: the one that scales with the data (distributed) --------

    def files(
        self,
        spark: SparkSession,
        snapshot_id: Optional[int] = None,
        _manifest_rows: Optional[list] = None,
    ) -> DataFrame:
        """One row per data/delete file in the snapshot.  Built with one
        executor task per manifest batch: the driver ships only manifest
        paths; manifest Avro parsing and stats decoding happen in the
        executors (a 100 TB table's file list never funnels through the
        driver — the analogue of keeping the reference's
        ``FileScanConfig`` streaming, table.rs:281-293).
        ``_manifest_rows`` substitutes an explicit ManifestFile list
        (``all_files`` passes the cross-snapshot union)."""
        t = self._t
        meta = t.metadata
        ordinals = meta.snapshot_ordinals()
        manifests = []
        source = (
            _manifest_rows
            if _manifest_rows is not None
            else [
                mf
                for content in (0, 1)
                for mf in t.manifests(snapshot_id, content=content)
            ]
        )
        for mf in source:
            manifests.append(
                (
                    meta.localize(mf.path),
                    mf.partition_spec_id,
                    mf.added_snapshot_id,
                )
            )
        if not manifests:
            return local_df(spark, [], _FILES_SCHEMA)

        id_to_name = {v: k for k, v in meta.field_ids_by_name().items()}
        types_by_id = {
            fid: (ty if isinstance(ty, str) else None)
            for fid, ty in meta.types_by_field_id().items()
        }

        def parse(batches) -> Iterator["pd.DataFrame"]:
            import pandas as pd

            from datafusion_iceberg_spark.iceberg.manifests import read_manifest
            from datafusion_iceberg_spark.iceberg.stats import decode_stat

            def named(m: dict, decode: bool = False):
                out = {}
                for fid, v in (m or {}).items():
                    name = id_to_name.get(fid)
                    if name is None:
                        continue
                    if decode:
                        ty = types_by_id.get(fid)
                        v = _stringify(decode_stat(ty, v) if ty else v)
                    out[name] = v
                return out

            for pdf in batches:
                rows = []
                for path, spec_id, added_sid in pdf.itertuples(index=False):
                    for f in read_manifest(path):
                        rows.append(
                            {
                                "content": f.content,
                                "file_path": f.path,
                                "file_format": f.file_format,
                                "spec_id": int(spec_id),
                                "partition": {
                                    k: _stringify(v)
                                    for k, v in (f.partition or {}).items()
                                },
                                "record_count": f.record_count,
                                "file_size_in_bytes": f.file_size_in_bytes,
                                "added_snapshot_id": added_sid,
                                "added_ordinal": ordinals.get(added_sid, -1),
                                "value_counts": named(f.value_counts),
                                "null_value_counts": named(f.null_value_counts),
                                "lower_bounds": named(f.lower_bounds, True),
                                "upper_bounds": named(f.upper_bounds, True),
                            }
                        )
                yield pd.DataFrame(
                    rows, columns=[fld.name for fld in _FILES_SCHEMA.fields]
                )

        inp = local_df(spark, 
            manifests, "path string, spec_id int, added_snapshot_id long"
        )
        n_parts = max(1, min(len(manifests), 64))
        return inp.repartition(n_parts).mapInPandas(parse, _FILES_SCHEMA)

    def partitions(
        self, spark: SparkSession, snapshot_id: Optional[int] = None
    ) -> DataFrame:
        """Per-partition rollup of the files table (live data files only):
        record/file/byte counts.  A single narrow shuffle over file-level
        rows — no data files are opened."""
        files = self.files(spark, snapshot_id).filter(F.col("content") == 0)
        return files.groupBy("partition", "spec_id").agg(
            F.sum("record_count").alias("record_count"),
            F.count("*").alias("file_count"),
            F.sum("file_size_in_bytes").alias("total_size_in_bytes"),
        )


    # -- entries / all_* : the full Spark-Iceberg inspection family -----

    def entries(
        self, spark: SparkSession, snapshot_id: Optional[int] = None
    ) -> DataFrame:
        """One row per manifest ENTRY of the snapshot, INCLUDING
        status=2 (deleted) entries and v2 sequence numbers — the
        ``$entries`` table Spark-Iceberg exposes.  Distributed the same
        way as :meth:`files`: the driver ships (manifest path, inherited
        sequence) pairs; Avro parsing runs in executors."""
        t = self._t
        meta = t.metadata
        manifests = []
        for content in (0, 1):
            for mf in t.manifests(snapshot_id, content=content):
                manifests.append(
                    (
                        meta.localize(mf.path),
                        -1 if mf.sequence_number is None else mf.sequence_number,
                    )
                )
        return self._entries_from(spark, manifests)

    def _entries_from(self, spark: SparkSession, manifests: list) -> DataFrame:
        """Distributed entry parse shared by ``entries``/``all_entries``:
        the driver ships (manifest path, inherited sequence) pairs, Avro
        parsing runs in executors."""
        if not manifests:
            return local_df(spark, [], _ENTRIES_SCHEMA)

        def parse(batches) -> Iterator["pd.DataFrame"]:
            import pandas as pd

            from datafusion_iceberg_spark.iceberg.manifests import read_manifest

            for pdf in batches:
                rows = []
                for path, inherit in pdf.itertuples(index=False):
                    inherit = None if inherit < 0 else int(inherit)
                    for f in read_manifest(
                        path, inherit_seq=inherit, keep_deleted=True
                    ):
                        rows.append(
                            {
                                "status": f.status,
                                "snapshot_id": f.entry_snapshot_id,
                                "sequence_number": f.sequence_number,
                                "content": f.content,
                                "file_path": f.path,
                                "record_count": f.record_count,
                                "file_size_in_bytes": f.file_size_in_bytes,
                            }
                        )
                yield pd.DataFrame(
                    rows, columns=[fld.name for fld in _ENTRIES_SCHEMA.fields]
                )

        inp = local_df(spark, manifests, "path string, inherit long")
        n_parts = max(1, min(len(manifests), 64))
        return inp.repartition(n_parts).mapInPandas(parse, _ENTRIES_SCHEMA)

    def all_manifests(self, spark: SparkSession) -> DataFrame:
        """One row per (manifest, referencing snapshot) across EVERY
        snapshot in the table — ``$all_manifests``.  Driver-side: the
        row count is (snapshots × manifests per list), metadata-scale."""
        from datafusion_iceberg_spark.iceberg.manifests import (
            read_manifest_list,
        )

        meta = self._t.metadata
        ordinals = meta.snapshot_ordinals()
        rows = []
        for s in meta.snapshots:
            for mf in read_manifest_list(meta.localize(s.manifest_list)):
                rows.append(
                    (
                        mf.path,
                        mf.length,
                        mf.partition_spec_id,
                        mf.content,
                        mf.added_snapshot_id,
                        s.snapshot_id,
                        ordinals.get(s.snapshot_id, -1),
                    )
                )
        return local_df(spark, rows, _ALL_MANIFESTS_SCHEMA)

    def all_files(self, spark: SparkSession) -> DataFrame:
        """Every data/delete file referenced by ANY snapshot, deduped by
        (path, content) — ``$all_files``: what snapshot expiry / orphan
        analysis reasons over.  Manifest paths dedupe on the driver
        (metadata-scale); entry parsing is the same executor-distributed
        walk as :meth:`files`; the file-level dedup is a narrow shuffle
        on (file_path, content)."""
        from datafusion_iceberg_spark.iceberg.manifests import (
            read_manifest_list,
        )

        meta = self._t.metadata
        seen = set()
        union_manifests = []
        for s in meta.snapshots:
            for mf in read_manifest_list(meta.localize(s.manifest_list)):
                if mf.path in seen:
                    continue
                seen.add(mf.path)
                union_manifests.append(mf)
        df = self.files(spark, _manifest_rows=union_manifests)
        return df.dropDuplicates(["file_path", "content"])


    def position_deletes(
        self, spark: SparkSession, snapshot_id: Optional[int] = None
    ) -> DataFrame:
        """One row per deleted (data file, position) of the snapshot —
        Spark-Iceberg's ``$position_deletes``: parquet position-delete
        rows read as-is, deletion vectors decoded from their puffin
        blobs, both in EXECUTORS (the driver ships one metadata row per
        delete entry; a 100 TB table's delete volume never lands on the
        driver)."""
        t = self._t
        meta = t.metadata
        entries = []
        for d in t.position_delete_files(snapshot_id):
            if d.referenced_data_file is not None:
                entries.append(
                    (
                        "dv",
                        meta.localize(d.path),
                        int(d.content_offset or 0),
                        int(d.content_size_in_bytes or 0),
                        meta.localize(d.referenced_data_file),
                    )
                )
            else:
                entries.append(
                    ("position", meta.localize(d.path), 0, 0, None)
                )
        if not entries:
            return local_df(spark, [], _POSITION_DELETES_SCHEMA)

        def parse(batches) -> Iterator["pd.DataFrame"]:
            import pandas as pd
            import pyarrow.parquet as pq

            from datafusion_iceberg_spark.iceberg.puffin import (
                read_dv_positions,
            )

            cols = [f.name for f in _POSITION_DELETES_SCHEMA.fields]
            for pdf in batches:
                rows = []
                for kind, path, off, ln, tgt in pdf.itertuples(index=False):
                    if kind == "dv":
                        for p in read_dv_positions(path, int(off), int(ln)):
                            rows.append((tgt, int(p), path, "dv"))
                    else:
                        tb = pq.read_table(path, columns=["file_path", "pos"])
                        rows.extend(
                            (fp, int(p), path, "position")
                            for fp, p in zip(
                                tb.column("file_path").to_pylist(),
                                tb.column("pos").to_pylist(),
                            )
                        )
                yield pd.DataFrame(rows, columns=cols)

        inp = local_df(spark, 
            entries, "kind string, path string, off long, ln long, tgt string"
        )
        n_parts = max(1, min(len(entries), 64))
        return inp.repartition(n_parts).mapInPandas(
            parse, _POSITION_DELETES_SCHEMA
        )


    def partition_stats(self, spark: SparkSession) -> DataFrame:
        """``$partition_stats``: the registered Iceberg partition
        statistics file for the CURRENT snapshot (spec
        ``partition-statistics``), read as-is — one small parquet
        instead of a manifest walk.  Raises if none is registered for
        the current snapshot (run ``compute_partition_stats`` /
        ``CALL ... compute_partition_stats``)."""
        meta = self._t.metadata
        snap_id = meta.raw.get("current-snapshot-id")
        entry = next(
            (
                s
                for s in meta.raw.get("partition-statistics", [])
                if s.get("snapshot-id") == snap_id
            ),
            None,
        )
        if entry is None:
            raise ValueError(
                "no partition statistics registered for the current "
                "snapshot — CALL <catalog>.system.compute_partition_stats"
                " first"
            )
        return spark.read.parquet(meta.localize(entry["statistics-path"]))

    def stats(self, spark: SparkSession) -> DataFrame:
        """``$stats``: registered TABLE statistics files (spec
        ``statistics`` field) flattened to one row per (file, blob,
        field) — column name resolved from the current schema, the
        ``ndv`` property surfaced as a typed column (engines read it
        for join sizing; ``compute_table_stats`` writes it)."""
        from pyspark.sql import types as T

        meta = self._t.metadata
        names_by_id = {
            f["id"]: f["name"] for f in meta.current_schema["fields"]
        }
        rows = []
        for entry in meta.raw.get("statistics", []):
            for bm in entry.get("blob-metadata", []):
                props = bm.get("properties", {}) or {}
                for fid in bm.get("fields", []):
                    rows.append(
                        (
                            int(entry.get("snapshot-id", -1)),
                            entry.get("statistics-path", ""),
                            int(entry.get("file-size-in-bytes", 0)),
                            bm.get("type", ""),
                            int(fid),
                            names_by_id.get(int(fid)),
                            int(props["ndv"]) if "ndv" in props else None,
                            {k: str(v) for k, v in props.items()},
                        )
                    )
        schema = T.StructType(
            [
                T.StructField("snapshot_id", T.LongType(), False),
                T.StructField("statistics_path", T.StringType(), False),
                T.StructField("file_size_in_bytes", T.LongType(), False),
                T.StructField("blob_type", T.StringType(), False),
                T.StructField("field_id", T.IntegerType(), False),
                T.StructField("column_name", T.StringType(), True),
                T.StructField("ndv", T.LongType(), True),
                T.StructField(
                    "properties",
                    T.MapType(T.StringType(), T.StringType()),
                    True,
                ),
            ]
        )
        return local_df(spark, rows, schema)

    def all_entries(self, spark: SparkSession) -> DataFrame:
        """``$all_entries``: manifest entries across EVERY snapshot
        (deduped by manifest, like ``$all_files``), including deleted
        (status=2) entries — what snapshot-expiry analysis reads."""
        from datafusion_iceberg_spark.iceberg.manifests import (
            read_manifest_list,
        )

        meta = self._t.metadata
        seen = set()
        manifests = []
        for s in meta.snapshots:
            for mf in read_manifest_list(meta.localize(s.manifest_list)):
                if mf.path in seen:
                    continue
                seen.add(mf.path)
                manifests.append(
                    (
                        meta.localize(mf.path),
                        -1
                        if mf.sequence_number is None
                        else mf.sequence_number,
                    )
                )
        return self._entries_from(spark, manifests)

    def data_files(self, spark: SparkSession) -> DataFrame:
        """``$data_files``: the files table restricted to content=0
        entries — Spark-Iceberg inspection parity."""
        return self.files(spark).filter("content = 0")

    def delete_files(self, spark: SparkSession) -> DataFrame:
        """``$delete_files``: the files table restricted to delete
        entries (position/equality parquet and DV puffin)."""
        return self.files(spark).filter("content != 0")

    def metadata_log_entries(self, spark: SparkSession) -> DataFrame:
        """``$metadata_log_entries``: one row per metadata.json version
        on disk with its latest snapshot linkage — the audit trail of
        table commits (driver-side; version count is metadata-scale)."""
        import glob as _glob
        import json as _json
        import os as _os

        meta = self._t.metadata
        rows = []
        from datafusion_iceberg_spark.iceberg.metadata import (
            read_metadata_bytes,
        )

        for p in sorted(
            _glob.glob(_os.path.join(meta.root, "metadata", "v*.metadata.json")),
            key=lambda x: int(_os.path.basename(x).split(".")[0][1:]),
        ):
            try:
                m = _json.loads(read_metadata_bytes(p).decode("utf-8"))
            except (OSError, ValueError):
                continue
            cur = m.get("current-snapshot-id")
            cur = None if cur in (None, -1) else int(cur)
            snap = next(
                (
                    s
                    for s in m.get("snapshots", [])
                    if s.get("snapshot-id") == cur
                ),
                None,
            )
            rows.append(
                (
                    p,
                    _utc(int(m.get("last-updated-ms", 0))),
                    cur,
                    None if snap is None else snap.get("schema-id", 0),
                    None
                    if snap is None
                    else int(snap.get("sequence-number", 0) or 0),
                )
            )
        return local_df(spark, rows, _METADATA_LOG_SCHEMA)


METADATA_TABLES = {
    "snapshots",
    "files",
    "manifests",
    "partitions",
    "history",
    "refs",
    "changelog",
    "entries",
    "all_manifests",
    "all_files",
    "position_deletes",
    "partition_stats",
    "stats",
    "lineage",
    "data_files",
    "delete_files",
    "metadata_log_entries",
    "all_entries",
}


def metadata_df(
    table: "IcebergTable", spark: SparkSession, kind: str
) -> DataFrame:
    """Dispatch for the SQL surface (``<catalog>.<ns>.<tbl>$<kind>``).
    ``$changelog`` is the full-history CDC read (table.changelog_df)
    and ``$lineage`` the row-identity scan (table.lineage_df) — not
    metadata-only, but they belong on the same SQL surface."""
    if kind == "changelog":
        return table.changelog_df(spark)
    if kind == "lineage":
        return table.lineage_df(spark)
    ins = Inspect(table)
    if kind not in METADATA_TABLES:
        raise ValueError(
            f"unknown metadata table {kind!r} (known: {sorted(METADATA_TABLES)})"
        )
    return getattr(ins, kind)(spark)
