"""Manifest-list and manifest decoding → DataFile records.

Rebuilds the manifest-consumption half of ``iceberg-rs`` the reference
leans on (SURVEY.md §1.1 "Manifest list / Manifest / DataFile"; consumed
at datafusion_iceberg/src/pruning_statistics.rs:49-70, 155-195 and
table.rs:149-161).  All stats maps are normalized to ``{field_id: bytes}``
— keyed by Iceberg field ID per the spec (not column position; reference
bug, SURVEY.md §4.4 #1).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

from datafusion_iceberg_spark.iceberg.avro import read_avro_file


@dataclass
class PartitionSummary:
    """One entry of a manifest-list 'partitions' array: value range of one
    partition field across the whole manifest."""

    contains_null: bool
    contains_nan: Optional[bool]
    lower_bound: Optional[bytes]
    upper_bound: Optional[bytes]


@dataclass
class ManifestFile:
    """One manifest-list row."""

    path: str
    length: int
    partition_spec_id: int
    added_snapshot_id: Optional[int]
    added_files_count: int
    existing_files_count: int
    deleted_files_count: int
    added_rows_count: Optional[int]
    existing_rows_count: Optional[int]
    partitions: list[PartitionSummary] = field(default_factory=list)
    content: int = 0  # 0=data, 1=deletes (v2)
    # v2: the data sequence number of the commit that added this manifest
    # (inherited by its null-sequence entries) and the minimum sequence
    # number across its entries.  None on v1 manifest lists.
    sequence_number: Optional[int] = None
    min_sequence_number: Optional[int] = None


@dataclass
class DataFile:
    """One manifest entry's data_file, stats keyed by field ID."""

    path: str
    file_format: str
    partition: dict[str, Any]
    record_count: int
    file_size_in_bytes: int
    value_counts: dict[int, int] = field(default_factory=dict)
    null_value_counts: dict[int, int] = field(default_factory=dict)
    nan_value_counts: dict[int, int] = field(default_factory=dict)
    lower_bounds: dict[int, bytes] = field(default_factory=dict)
    upper_bounds: dict[int, bytes] = field(default_factory=dict)
    status: int = 1  # manifest-entry status: 0=existing 1=added 2=deleted
    # v2 data_file.content: 0=DATA, 1=POSITION_DELETES, 2=EQUALITY_DELETES
    content: int = 0
    equality_ids: list[int] = field(default_factory=list)
    # provenance stamped by the table scan from the owning manifest-list
    # row (not stored in the entry itself): partition-spec id for
    # spec-evolution-aware partition handling, and the manifest's
    # added_snapshot_id, whose snapshot-log ordinal serves as the v2
    # sequence number for equality-delete application order.
    spec_id: int = 0
    added_snapshot_id: Optional[int] = None
    # v2 data sequence number governing delete applicability: explicit on
    # the entry (``sequence_number`` / ``data_sequence_number``) or
    # inherited from the owning manifest-list row when the entry wrote
    # null (the standard v2 write shape).  None on v1 tables — consumers
    # fall back to the snapshot-ordinal scheme
    # (TableMetadata.snapshot_sequences).
    sequence_number: Optional[int] = None
    # the manifest ENTRY's own snapshot_id field (the commit that
    # added/deleted the entry) — distinct from added_snapshot_id, which
    # is stamped from the owning manifest-list row
    entry_snapshot_id: Optional[int] = None
    # Iceberg v3 deletion vectors: a content=1 entry whose file is a
    # PUFFIN container references exactly one data file and a blob range
    # within the container
    referenced_data_file: Optional[str] = None
    content_offset: Optional[int] = None
    content_size_in_bytes: Optional[int] = None
    # Iceberg v3 row lineage: the row id of the file's first row; rows
    # without a materialized ``_row_id`` column take first_row_id + pos
    first_row_id: Optional[int] = None


def _as_int_map(v: Any) -> dict[int, Any]:
    """Iceberg writes stats maps either as real Avro maps or as arrays of
    {key, value} records (the k/v-array encoding); accept both."""
    if v is None:
        return {}
    if isinstance(v, dict):
        return {int(k): val for k, val in v.items()}
    return {int(e["key"]): e["value"] for e in v}


def read_manifest_list(path: str) -> list[ManifestFile]:
    _, records = read_avro_file(path)
    out = []
    for r in records:
        out.append(
            ManifestFile(
                path=r["manifest_path"],
                length=r.get("manifest_length", 0),
                partition_spec_id=r.get("partition_spec_id", 0),
                added_snapshot_id=r.get("added_snapshot_id"),
                added_files_count=r.get("added_data_files_count")
                or r.get("added_files_count")
                or 0,
                existing_files_count=r.get("existing_data_files_count")
                or r.get("existing_files_count")
                or 0,
                deleted_files_count=r.get("deleted_data_files_count")
                or r.get("deleted_files_count")
                or 0,
                added_rows_count=r.get("added_rows_count"),
                existing_rows_count=r.get("existing_rows_count"),
                partitions=[
                    PartitionSummary(
                        contains_null=p.get("contains_null", False),
                        contains_nan=p.get("contains_nan"),
                        lower_bound=p.get("lower_bound"),
                        upper_bound=p.get("upper_bound"),
                    )
                    for p in (r.get("partitions") or [])
                ],
                content=r.get("content", 0) or 0,
                sequence_number=r.get("sequence_number"),
                min_sequence_number=r.get("min_sequence_number"),
            )
        )
    return out


def read_manifest(
    path: str, inherit_seq: Optional[int] = None, keep_deleted: bool = False
) -> list[DataFile]:
    """Manifest entries; deleted entries (status=2) are dropped — a live
    scan must not read files removed by the snapshot — unless
    ``keep_deleted`` (the ``$entries`` metadata table shows them).

    ``inherit_seq`` is the owning manifest-list row's ``sequence_number``:
    per the v2 spec, an entry whose ``sequence_number`` is null inherits
    it (writers stamp null on ADDED entries so a manifest commits without
    knowing its final sequence).  Entries that wrote an explicit value —
    e.g. EXISTING entries carried through a manifest rewrite — keep it."""
    _, records = read_avro_file(path)
    out = []
    for r in records:
        df = r["data_file"]
        status = r.get("status", 1)
        if status == 2 and not keep_deleted:
            continue
        seq = r.get("sequence_number")
        if seq is None:
            seq = r.get("data_sequence_number")
        if seq is None and status == 1:
            # v2 spec: null-sequence inheritance applies only to ADDED
            # entries.  An EXISTING/DELETED entry that (illegally) wrote
            # null must NOT take the rewrite commit's newer sequence —
            # that would flip delete applicability; leaving it None routes
            # _file_seq to the conservative snapshot-based fallback.
            seq = inherit_seq
        out.append(
            DataFile(
                path=df["file_path"],
                file_format=str(df.get("file_format", "PARQUET")),
                partition=dict(df.get("partition") or {}),
                record_count=df.get("record_count", 0),
                file_size_in_bytes=df.get("file_size_in_bytes", 0),
                value_counts=_as_int_map(df.get("value_counts")),
                null_value_counts=_as_int_map(df.get("null_value_counts")),
                nan_value_counts=_as_int_map(df.get("nan_value_counts")),
                lower_bounds=_as_int_map(df.get("lower_bounds")),
                upper_bounds=_as_int_map(df.get("upper_bounds")),
                status=status,
                content=df.get("content", 0) or 0,
                equality_ids=[int(i) for i in (df.get("equality_ids") or [])],
                sequence_number=None if seq is None else int(seq),
                entry_snapshot_id=r.get("snapshot_id"),
                referenced_data_file=df.get("referenced_data_file"),
                content_offset=df.get("content_offset"),
                content_size_in_bytes=df.get("content_size_in_bytes"),
                first_row_id=(
                    None
                    if df.get("first_row_id") is None
                    else int(df["first_row_id"])
                ),
            )
        )
    return out
