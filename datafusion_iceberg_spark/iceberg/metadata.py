"""Iceberg table-metadata model: ``v*.metadata.json`` parsing, schema ↔
Spark ``StructType`` conversion, snapshot selection (incl. time travel).

Replaces the metadata half of the reference's ``iceberg-rs`` dependency
(SURVEY.md §2A A12; schema conversion call sites
datafusion_iceberg/src/table.rs:81-87).
"""

from __future__ import annotations

import glob
import json
import os
from dataclasses import dataclass, field
from typing import Any, Optional

from pyspark.sql import types as T

# --------------------------------------------------------------------------
# Schema conversion (A12: iceberg_to_arrow_schema analogue)
# --------------------------------------------------------------------------

_PRIMITIVE_TO_SPARK: dict[str, T.DataType] = {
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "date": T.DateType(),
    "time": T.LongType(),  # micros since midnight (Spark has no TimeType)
    "timestamp": T.TimestampNTZType(),
    "timestamptz": T.TimestampType(),
    # Iceberg v3 nanosecond timestamps: Spark has no nanos type, so the
    # session domain is the raw int64 nanos-since-epoch (the same
    # convention spark.sql.legacy.parquet.nanosAsLong applies to
    # TIMESTAMP(NANOS) parquet) — full precision, no truncation.
    "timestamp_ns": T.LongType(),
    "timestamptz_ns": T.LongType(),
    "string": T.StringType(),
    "uuid": T.StringType(),
    "binary": T.BinaryType(),
    # Iceberg v3 VARIANT (metadata/value binary pair per the variant
    # spec) ↔ Spark 4's native VariantType; the reference has no v3.
    "variant": T.VariantType(),
}


def iceberg_type_to_spark(t: Any) -> T.DataType:
    if isinstance(t, str):
        if t in _PRIMITIVE_TO_SPARK:
            return _PRIMITIVE_TO_SPARK[t]
        if t.startswith("decimal"):
            p, s = t[t.index("(") + 1 : t.rindex(")")].split(",")
            return T.DecimalType(int(p), int(s))
        if t.startswith("fixed"):
            return T.BinaryType()
        raise ValueError(f"unsupported iceberg type {t!r}")
    tt = t["type"]
    if tt == "struct":
        return T.StructType(
            [
                T.StructField(
                    f["name"], iceberg_type_to_spark(f["type"]), not f.get("required")
                )
                for f in t["fields"]
            ]
        )
    if tt == "list":
        return T.ArrayType(
            iceberg_type_to_spark(t["element"]), not t.get("element-required")
        )
    if tt == "map":
        return T.MapType(
            iceberg_type_to_spark(t["key"]),
            iceberg_type_to_spark(t["value"]),
            not t.get("value-required"),
        )
    raise ValueError(f"unsupported iceberg type {t!r}")


def spark_type_to_iceberg(dt: T.DataType, next_id=None) -> Any:
    """Spark type → Iceberg schema-JSON type.

    Nested types (struct/list/map) serialize with element/key/value/field
    ids per the Iceberg spec, allocated from ``next_id`` (a zero-arg
    callable returning fresh ids — the writer threads its column-id
    counter through).  Without an allocator, nested types raise: a nested
    schema without ids would be unreadable by id-keyed consumers."""
    for name, st in _PRIMITIVE_TO_SPARK.items():
        if dt == st and name not in ("time", "uuid"):
            return name
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision},{dt.scale})"
    if isinstance(dt, T.IntegerType):
        return "int"
    if isinstance(dt, T.ShortType) or isinstance(dt, T.ByteType):
        return "int"
    if isinstance(dt, (T.ArrayType, T.MapType, T.StructType)):
        if next_id is None:
            raise NotImplementedError(
                "nested schemas need a field-id allocator (writer passes one)"
            )
        if isinstance(dt, T.ArrayType):
            eid = next_id()
            return {
                "type": "list",
                "element-id": eid,
                "element": spark_type_to_iceberg(dt.elementType, next_id),
                "element-required": not dt.containsNull,
            }
        if isinstance(dt, T.MapType):
            kid = next_id()
            vid = next_id()
            return {
                "type": "map",
                "key-id": kid,
                "key": spark_type_to_iceberg(dt.keyType, next_id),
                "value-id": vid,
                "value": spark_type_to_iceberg(dt.valueType, next_id),
                "value-required": not dt.valueContainsNull,
            }
        fields = []
        for f in dt.fields:
            fid = next_id()
            fields.append(
                {
                    "id": fid,
                    "name": f.name,
                    "required": not f.nullable,
                    "type": spark_type_to_iceberg(f.dataType, next_id),
                }
            )
        return {"type": "struct", "fields": fields}
    raise ValueError(f"unsupported spark type {dt!r}")


def schema_to_struct_type(
    schema_json: dict, with_field_ids: bool = False
) -> T.StructType:
    """Iceberg schema JSON → Spark StructType (field order preserved).

    ``with_field_ids`` stamps each StructField with
    ``{"parquet.field.id": <iceberg field id>}`` so Spark's parquet reader
    (spark.sql.parquet.fieldId.read.enabled) resolves file columns by the
    PARQUET:field_id they carry instead of by name — the id-keyed column
    mapping that makes RENAME evolution read old files correctly."""
    return T.StructType(
        [
            T.StructField(
                f["name"],
                iceberg_type_to_spark(f["type"]),
                not f.get("required"),
                {"parquet.field.id": f["id"]} if with_field_ids else None,
            )
            for f in schema_json["fields"]
        ]
    )


# --------------------------------------------------------------------------
# Table metadata
# --------------------------------------------------------------------------


@dataclass
class PartitionField:
    name: str
    transform: str
    source_id: int
    field_id: int


@dataclass
class Snapshot:
    snapshot_id: int
    timestamp_ms: int
    manifest_list: str
    summary: dict
    schema_id: Optional[int] = None
    parent_id: Optional[int] = None
    # v2: the commit's data sequence number (None on v1 metadata)
    sequence_number: Optional[int] = None


@dataclass
class TableMetadata:
    """Parsed v*.metadata.json (format versions 1 and 2)."""

    raw: dict
    root: str  # actual table root directory on disk
    location: str  # location recorded in metadata (may differ from root)

    format_version: int = field(init=False)
    table_uuid: str = field(init=False)
    last_column_id: int = field(init=False)
    current_schema: dict = field(init=False)
    partition_fields: list[PartitionField] = field(init=False)
    default_spec_id: int = field(init=False)
    partition_specs_by_id: dict[int, list[PartitionField]] = field(init=False)
    snapshots: list[Snapshot] = field(init=False)
    current_snapshot_id: Optional[int] = field(init=False)
    properties: dict = field(init=False)

    def __post_init__(self) -> None:
        raw = self.raw
        self.format_version = raw["format-version"]
        self.table_uuid = raw.get("table-uuid", "")
        self.last_column_id = raw.get("last-column-id", 0)
        schemas = raw.get("schemas")
        if schemas:
            sid = raw.get("current-schema-id", schemas[-1].get("schema-id", 0))
            self.current_schema = next(
                s for s in schemas if s.get("schema-id", 0) == sid
            )
        else:
            self.current_schema = raw["schema"]
        def _parse_fields(fields: list) -> list[PartitionField]:
            return [
                PartitionField(
                    f["name"],
                    f["transform"],
                    f["source-id"],
                    f.get("field-id", 1000 + i),
                )
                for i, f in enumerate(fields)
            ]

        specs = raw.get("partition-specs")
        if specs:
            self.default_spec_id = raw.get("default-spec-id", 0)
            # ALL specs, keyed by id — a table whose spec evolved
            # mid-history carries manifests under several specs and each
            # must be interpreted under ITS spec (the reference assumes
            # the default spec for every manifest, table.rs:233-238)
            self.partition_specs_by_id = {
                s.get("spec-id", 0): _parse_fields(s["fields"]) for s in specs
            }
            fields = next(
                s for s in specs if s.get("spec-id", 0) == self.default_spec_id
            )["fields"]
        else:
            self.default_spec_id = 0
            fields = raw.get("partition-spec", [])
            self.partition_specs_by_id = {0: _parse_fields(fields)}
        self.partition_fields = _parse_fields(fields)
        self.snapshots = [
            Snapshot(
                s["snapshot-id"],
                s["timestamp-ms"],
                s["manifest-list"],
                s.get("summary", {}),
                s.get("schema-id"),
                # a fresh table carries current-snapshot-id = -1 (Iceberg
                # spec sentinel); a first append copies that as its parent
                None
                if s.get("parent-snapshot-id") in (None, -1)
                else s.get("parent-snapshot-id"),
                s.get("sequence-number"),
            )
            for s in raw.get("snapshots", [])
        ]
        cur = raw.get("current-snapshot-id")
        self.current_snapshot_id = None if cur in (None, -1) else cur
        self.properties = raw.get("properties", {})

    # -- schema helpers ---------------------------------------------------

    def struct_type(self, with_field_ids: bool = False) -> T.StructType:
        return schema_to_struct_type(self.current_schema, with_field_ids)

    def field_ids_by_name(self) -> dict[str, int]:
        return {f["name"]: f["id"] for f in self.current_schema["fields"]}

    def identifier_field_names(self) -> list[str]:
        """Current-schema names of the schema's identifier-field-ids
        (the spec's declared row-identity key, e.g. set by
        writer.set_identifier_fields) — empty when none declared.
        STRICT like dml.py's equality-delete key resolution: an id
        missing from the current schema raises instead of silently
        shrinking the identity tuple (pairing/deleting on a partial key
        would be wrong, not approximate)."""
        ids = self.current_schema.get("identifier-field-ids") or []
        by_id = {f["id"]: f["name"] for f in self.current_schema["fields"]}
        missing = [i for i in ids if i not in by_id]
        if missing:
            raise ValueError(
                f"identifier-field-ids {missing} not in the current "
                "schema — the declared row identity is broken"
            )
        return [by_id[i] for i in ids]

    def initial_defaults(self) -> dict:
        """Iceberg v3 DEFAULT VALUES: {column name: (initial-default
        value, Spark type)} for current-schema fields that declare one.
        The default applies only to rows in files written BEFORE the
        column existed (spec: fixed at ALTER time)."""
        out = {}
        st = self.struct_type()
        by_name = {f.name: f.dataType for f in st.fields}
        for f in self.current_schema.get("fields", []):
            if f.get("initial-default") is not None and f["name"] in by_name:
                out[f["name"]] = (f["initial-default"], by_name[f["name"]])
        return out

    def write_defaults(self) -> dict:
        """{column name: write-default} for current-schema fields that
        declare one (v3 DEFAULT VALUES, writer side)."""
        return {
            f["name"]: f["write-default"]
            for f in self.current_schema.get("fields", [])
            if f.get("write-default") is not None
        }

    def types_by_field_id(self) -> dict[int, Any]:
        return {f["id"]: f["type"] for f in self.current_schema["fields"]}

    def partition_fields_for_spec(
        self, spec_id: Optional[int]
    ) -> Optional[list[PartitionField]]:
        """Partition fields of one spec; None when the id is unknown (a
        caller must then degrade conservatively — attach nothing, prune
        nothing)."""
        if spec_id is None:
            return self.partition_fields
        return self.partition_specs_by_id.get(spec_id)

    def partition_column_names(self, spec_id: Optional[int] = None) -> list[str]:
        """Source-column names of a spec's fields (default spec when
        ``spec_id`` is None), resolved against the CURRENT schema so
        renames follow the id."""
        fields = self.partition_fields_for_spec(spec_id)
        if fields is None:
            fields = self.partition_fields
        by_id = {f["id"]: f["name"] for f in self.current_schema["fields"]}
        return [by_id.get(pf.source_id, pf.name) for pf in fields]

    def partition_spec_entries(self) -> list[str]:
        """Writer-format spec strings ('col', 'day(col)', 'bucket(8, col)',
        'truncate(4, col)') reconstructed from the default spec — so a
        writer rebuilt from metadata keeps the transforms."""
        import re

        out = []
        for col, pf in zip(self.partition_column_names(), self.partition_fields):
            t = pf.transform
            if t == "identity":
                out.append(col)
            elif t in ("day", "month", "year", "hour"):
                out.append(f"{t}({col})")
            else:
                m = re.fullmatch(r"(bucket|truncate)\[(\d+)\]", t)
                if not m:
                    raise ValueError(f"unsupported transform in spec: {t}")
                out.append(f"{m.group(1)}({m.group(2)}, {col})")
        return out

    def sort_order_columns(self) -> list[str]:
        """Column names of the default sort order (identity transforms
        only — the writer applies it on append via range partitioning)."""
        oid = self.raw.get("default-sort-order-id", 0)
        names_by_id = {f["id"]: f["name"] for f in self.current_schema["fields"]}
        for so in self.raw.get("sort-orders", []):
            if so.get("order-id") == oid:
                return [
                    names_by_id[f["source-id"]]
                    for f in so.get("fields", [])
                    if f.get("transform", "identity") == "identity"
                    and f.get("source-id") in names_by_id
                ]
        return []

    # -- snapshot selection (time travel) ---------------------------------

    def snapshot(
        self,
        snapshot_id: Optional[int] = None,
        as_of_timestamp_ms: Optional[int] = None,
    ) -> Optional[Snapshot]:
        """Current snapshot, or an explicit one (VERSION AS OF), or the
        latest at/before a timestamp (TIMESTAMP AS OF).  The reference is
        pinned to the current snapshot (SURVEY.md §2C) — this is the
        nearly-free generalization the snapshot-parameterized reader buys."""
        if snapshot_id is not None:
            for s in self.snapshots:
                if s.snapshot_id == snapshot_id:
                    return s
            raise KeyError(f"snapshot {snapshot_id} not found")
        if as_of_timestamp_ms is not None:
            main = self.main_ancestry_ids()
            eligible = [
                s
                for s in self.snapshots
                if s.timestamp_ms <= as_of_timestamp_ms
                and s.snapshot_id in main
            ]
            if not eligible:
                return None
            return max(eligible, key=lambda s: s.timestamp_ms)
        if self.current_snapshot_id is None:
            return None
        return next(
            s for s in self.snapshots if s.snapshot_id == self.current_snapshot_id
        )

    def main_ancestry_ids(self) -> set[int]:
        """Snapshot ids on the MAIN line of history (the snapshot-log).
        Staged WAP snapshots live in ``snapshots`` with a branch ref but
        never enter the log until published — time travel and changelog
        reads must not see them.  Tables without a log (external
        fixtures) treat every snapshot as main."""
        log = self.raw.get("snapshot-log") or []
        if not log:
            return {s.snapshot_id for s in self.snapshots}
        return {e["snapshot-id"] for e in log}

    def refs(self) -> dict[str, dict]:
        """Named refs (Iceberg v2 ``refs`` map): ``{name: {"snapshot-id",
        "type": "tag"|"branch"}}``.  ``main`` is implicit — it always
        means the current snapshot (spec: the main branch is the table's
        current state), and an explicit entry never overrides that here
        because our writer keeps ``main`` implicit."""
        out = dict(self.raw.get("refs", {}))
        if self.current_snapshot_id not in (None, -1):
            out.setdefault(
                "main",
                {"snapshot-id": self.current_snapshot_id, "type": "branch"},
            )
        return out

    def resolve_ref(self, name: str) -> int:
        ref = self.refs().get(name)
        if ref is None:
            known = ", ".join(sorted(self.refs()))
            raise KeyError(f"ref {name!r} not found (known: {known})")
        return int(ref["snapshot-id"])

    def snapshot_ordinals(self) -> dict[int, int]:
        """{snapshot_id: commit ordinal} from the snapshot list (commit
        order).  This is our rendering of the v2 *sequence number*: a
        manifest's ordinal is the ordinal of its ``added_snapshot_id``,
        and an equality delete applies only to data files with a strictly
        smaller ordinal — so rows re-appended AFTER the delete survive.
        Unknown snapshot ids map to -1 (treated as oldest, i.e. deletes
        apply — the conservative direction for CDC-style tables)."""
        return {s.snapshot_id: i for i, s in enumerate(self.snapshots)}

    def snapshot_sequences(self) -> dict[int, int]:
        """{snapshot_id: data sequence number} for delete-applicability
        ordering.  Uses the REAL v2 ``sequence-number`` when the snapshot
        recorded one (tables written by Flink/Spark-Iceberg or this
        repo's v2 writer); v1 snapshots fall back to their snapshot-list
        ordinal — monotone in commit order, so within a table that never
        mixes the two schemes the comparison semantics are identical.
        In an upgraded v1→v2 table the spec assigns all pre-upgrade
        snapshots sequence 0; we approximate with the ordinal, which
        keeps pre-upgrade commit order (strictly more precise than the
        spec's collapse-to-0 and safe because v2 sequences continue from
        last-sequence-number ≥ the v1 commit count is not guaranteed —
        hence callers must treat cross-scheme gaps as best-effort, the
        same caveat Spark applies to upgraded tables)."""
        seqs = {}
        for i, s in enumerate(self.snapshots):
            seqs[s.snapshot_id] = (
                s.sequence_number if s.sequence_number is not None else i
            )
        return seqs

    # -- path relocation ---------------------------------------------------

    def localize(self, path: str) -> str:
        """Map a path recorded in metadata (absolute in the writing env,
        e.g. '/home/iceberg/warehouse/...') onto the actual on-disk root —
        the job the reference does with its synthetic per-table object-store
        URL (table.rs:116-126)."""
        loc = self.location.rstrip("/")
        for scheme in ("file://", "s3a://", "s3://"):
            if path.startswith(scheme):
                path = path[len(scheme) :]
            if loc.startswith(scheme):
                loc = loc[len(scheme) :]
        if path.startswith(loc + "/"):
            return os.path.join(self.root, path[len(loc) + 1 :])
        if path.startswith(loc):
            return self.root
        return path  # already local / relative


def load_table_metadata(root: str) -> TableMetadata:
    """Load the latest metadata version from ``<root>/metadata/``:
    version-hint.text if present, else the highest v*.metadata.json, else
    the lexicographically-last *.metadata.json (Java naming).

    All IO routes through the scheme-keyed FileIO registry (io.py), so a
    ``file://`` or ``memory://`` (or registered ``s3://``) table root
    reads through the same code path as a bare posix one — the
    object-store indirection the reference gets from table.rs:116-126."""
    from datafusion_iceberg_spark.iceberg.io import get_io

    fio = get_io(root)
    meta_dir = root.rstrip("/") + "/metadata"
    hint = meta_dir + "/version-hint.text"
    path = None
    if fio.exists(hint):
        v = fio.read_bytes(hint).decode().strip()
        for cand in (
            meta_dir + f"/v{v}.metadata.json",
            meta_dir + f"/v{v}.gz.metadata.json",
        ):
            if fio.exists(cand):
                path = cand
                break
    if path is None:
        versioned = fio.glob(meta_dir + "/v*.metadata.json")
        if versioned:
            path = max(
                versioned,
                key=lambda p: int(
                    os.path.basename(p).split(".")[0].lstrip("v") or -1
                ),
            )
    if path is None:
        anymeta = sorted(fio.glob(meta_dir + "/*.metadata.json"))
        if not anymeta:
            raise FileNotFoundError(f"no metadata json under {meta_dir}")
        path = anymeta[-1]
    raw = json.loads(read_metadata_bytes(path).decode("utf-8"))
    return TableMetadata(raw=raw, root=root, location=raw.get("location", root))


def read_metadata_bytes(path: str) -> bytes:
    """Raw metadata-JSON bytes, transparently gunzipping the spec's
    ``write.metadata.compression-codec=gzip`` spelling
    (``v{N}.gz.metadata.json`` — also accepted: a trailing ``.gz``)."""
    from datafusion_iceberg_spark.iceberg.io import get_io

    data = get_io(path).read_bytes(path)
    base = os.path.basename(path)
    if ".gz." in base or base.endswith(".gz") or data[:2] == b"\x1f\x8b":
        import gzip

        data = gzip.decompress(data)
    return data


def metadata_from_dict(raw: dict, metadata_location: str = "") -> TableMetadata:
    """Build TableMetadata from an already-parsed metadata document (the
    shape an Iceberg REST catalog's LoadTableResult carries in its
    ``metadata`` field) — no filesystem walk.  ``root`` is the table
    location itself; manifests/files resolve through ``localize`` +
    the FileIO registry."""
    loc = raw.get("location", "")
    root = loc or os.path.dirname(os.path.dirname(metadata_location))
    return TableMetadata(raw=raw, root=root, location=loc or root)
