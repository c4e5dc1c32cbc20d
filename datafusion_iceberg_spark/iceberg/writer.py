"""Iceberg write path (SURVEY.md §7 phase 6 — beyond reference parity,
which is read-only per §2C): create table, append Spark DataFrames,
commit snapshots atomically.

Layout written (Iceberg v1):

    <root>/metadata/v{N}.metadata.json      table metadata, snapshot log
    <root>/metadata/version-hint.text       latest version pointer
    <root>/metadata/snap-{id}.avro          manifest list
    <root>/metadata/{uuid}-m{i}.avro        manifest
    <root>/data/[<part>=<val>/]*.parquet    data files (written by Spark)

Scale notes: data files are written by executors
(``df.write.parquet``) — the driver only lists the output directory and
reads parquet *footers* (pyarrow) to build per-file stats, so commit cost
scales with file count, not data size.  Stats bounds are encoded with
Iceberg single-value serialization keyed by field ID.
"""

from __future__ import annotations

import glob
import json
import os
import re
import time
import uuid as uuidlib
from dataclasses import dataclass
from typing import Any, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from datafusion_iceberg_spark.iceberg.avro import write_avro_file
from datafusion_iceberg_spark.iceberg.metadata import spark_type_to_iceberg
from datafusion_iceberg_spark.iceberg.stats import encode_stat
from datafusion_iceberg_spark.session import local_df

# --- Avro schemas for manifest + manifest list (Iceberg v1 spec layout,
# required fields only — our reader and the spec's optional-field rules
# both tolerate the omissions) ---------------------------------------------


def zvalue_sql(columns: list, bits: int = 16) -> str:
    """SQL expression interleaving the bits of each column's normalized
    16-bit rank into one z-value.  ``columns`` = [(name, lo, hi), ...];
    ranks clamp to [0, 2^bits) and NULLs rank 0 (sort first).  Pure JVM
    functions (codegen-friendly); shared by rewrite_zorder and its
    property tests."""
    n = len(columns)
    terms = []
    for k, (col, lo, hi) in enumerate(columns):
        span = float(hi) - float(lo) or 1.0
        rank = (
            f"CAST(((CAST(`{col}` AS DOUBLE) - {float(lo)!r}) / {span!r})"
            f" * {(1 << bits) - 1} AS BIGINT)"
        )
        # COALESCE BEFORE the clamp: Spark's GREATEST/LEAST skip NULL
        # arguments, so a NULL rank would clamp to the MAX, not 0
        rank = f"COALESCE({rank}, 0L)"
        rank = f"GREATEST(0L, LEAST({(1 << bits) - 1}L, {rank}))"
        terms.append(
            f"aggregate(sequence(0, {bits - 1}), 0L,"
            f" (acc, i) -> acc + shiftleft(shiftright({rank}, i) & 1L,"
            f" i * {n} + {k}))"
        )
    return " + ".join(terms)


class CommitConflict(Exception):
    """Another writer committed the same base metadata version first —
    re-read the table state and retry (optimistic concurrency, the
    Iceberg commit protocol).  Raised instead of silently clobbering the
    other writer's metadata file."""


class RewriteConflict(CommitConflict):
    """A REWRITE commit (copy-on-write delete/update/merge, compaction,
    z-order — any ``_carry=False`` snapshot) found the table advanced
    past the snapshot it was planned against.  Blind-retrying would
    silently drop the concurrent commit's files from the new manifest
    (its snapshot stays time-travelable but vanishes from current), so
    the operation surfaces this instead: re-run it against fresh state.
    This mirrors Iceberg's RewriteFiles validation, where appends retry
    but rewrites must re-plan."""


# sentinel: "caller did not supply a planned parent" (None is a real
# value — a rewrite planned against an empty table)
_UNCHECKED = object()


def _nullable(t: Any) -> list:
    return ["null", t]


def _manifest_schema(partition_fields: list[dict]) -> dict:
    part_record = {
        "type": "record",
        "name": "r102",
        "fields": [
            {"name": f["name"], "type": _nullable(f["avro_type"]), "default": None}
            for f in partition_fields
        ],
    }
    int_long_map = {
        "type": "array",
        "items": {
            "type": "record",
            "name": "k_v_long",
            "fields": [
                {"name": "key", "type": "int"},
                {"name": "value", "type": "long"},
            ],
        },
        "logicalType": "map",
    }
    int_bytes_map = {
        "type": "array",
        "items": {
            "type": "record",
            "name": "k_v_bytes",
            "fields": [
                {"name": "key", "type": "int"},
                {"name": "value", "type": "bytes"},
            ],
        },
        "logicalType": "map",
    }
    data_file = {
        "type": "record",
        "name": "r2",
        "fields": [
            {"name": "file_path", "type": "string"},
            {"name": "file_format", "type": "string"},
            {"name": "partition", "type": part_record},
            {"name": "record_count", "type": "long"},
            {"name": "file_size_in_bytes", "type": "long"},
            {"name": "block_size_in_bytes", "type": "long"},
            {"name": "value_counts", "type": _nullable(int_long_map), "default": None},
            {
                "name": "null_value_counts",
                "type": _nullable(
                    {**int_long_map, "items": {**int_long_map["items"], "name": "k_v_long2"}}
                ),
                "default": None,
            },
            {
                "name": "nan_value_counts",
                "type": _nullable(
                    {**int_long_map, "items": {**int_long_map["items"], "name": "k_v_long3"}}
                ),
                "default": None,
            },
            {"name": "lower_bounds", "type": _nullable(int_bytes_map), "default": None},
            {
                "name": "upper_bounds",
                "type": _nullable(
                    {**int_bytes_map, "items": {**int_bytes_map["items"], "name": "k_v_bytes2"}}
                ),
                "default": None,
            },
            # v2: 0=DATA, 1=POSITION_DELETES, 2=EQUALITY_DELETES; the field
            # ids a content=2 file's rows are keyed by
            {"name": "content", "type": _nullable("int"), "default": None},
            {
                "name": "equality_ids",
                "type": _nullable({"type": "array", "items": "int"}),
                "default": None,
            },
            # v3 deletion vectors: puffin-backed content=1 entries name
            # their single target data file and blob range
            {"name": "referenced_data_file", "type": _nullable("string"), "default": None},
            {"name": "content_offset", "type": _nullable("long"), "default": None},
            {"name": "content_size_in_bytes", "type": _nullable("long"), "default": None},
            # v3 row lineage: row id of the file's first row (rows without
            # a materialized _row_id column take first_row_id + position)
            {"name": "first_row_id", "type": _nullable("long"), "default": None},
        ],
    }
    return {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int"},
            {"name": "snapshot_id", "type": _nullable("long"), "default": None},
            # v2: written null on ADDED entries → readers inherit the
            # manifest-list row's sequence_number (spec inheritance rule);
            # explicit values appear only on EXISTING entries carried
            # through manifest rewrites
            {"name": "sequence_number", "type": _nullable("long"), "default": None},
            {"name": "file_sequence_number", "type": _nullable("long"), "default": None},
            {"name": "data_file", "type": data_file},
        ],
    }


_MANIFEST_LIST_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        # v2: the committing snapshot's data sequence number, inherited by
        # entries that wrote null; min across the manifest's live entries
        {"name": "sequence_number", "type": _nullable("long"), "default": None},
        {"name": "min_sequence_number", "type": _nullable("long"), "default": None},
        {"name": "added_snapshot_id", "type": _nullable("long"), "default": None},
        {"name": "added_data_files_count", "type": _nullable("int"), "default": None},
        {"name": "existing_data_files_count", "type": _nullable("int"), "default": None},
        {"name": "deleted_data_files_count", "type": _nullable("int"), "default": None},
        {
            "name": "partitions",
            "type": _nullable(
                {
                    "type": "array",
                    "items": {
                        "type": "record",
                        "name": "r508",
                        "fields": [
                            {"name": "contains_null", "type": "boolean"},
                            {"name": "contains_nan", "type": _nullable("boolean"), "default": None},
                            {"name": "lower_bound", "type": _nullable("bytes"), "default": None},
                            {"name": "upper_bound", "type": _nullable("bytes"), "default": None},
                        ],
                    },
                }
            ),
            "default": None,
        },
        {"name": "added_rows_count", "type": _nullable("long"), "default": None},
        {"name": "existing_rows_count", "type": _nullable("long"), "default": None},
        {"name": "deleted_rows_count", "type": _nullable("long"), "default": None},
        # v2: 0 = data manifest, 1 = delete manifest (position deletes)
        {"name": "content", "type": _nullable("int"), "default": None},
    ],
}

def _next_sequence(meta: dict) -> int:
    """Data sequence number for the commit being built (v2 spec:
    ``last-sequence-number + 1``).  A v1 table upgraded mid-life has no
    counter; continue ABOVE its largest snapshot ordinal so new sequence
    numbers compare correctly against the ordinal fallback readers use
    for its pre-upgrade snapshots (snapshot_sequences)."""
    prev = meta.get("last-sequence-number")
    if prev is None:
        prev = max(len(meta.get("snapshots", [])) - 1, 0)
    return int(prev) + 1


def _carry_manifest_row(mf, deleted_rows: int = 0) -> dict:
    """A prior snapshot's manifest-list row carried verbatim into the new
    snapshot's list (the list is the complete snapshot, so unchanged
    manifests re-appear each commit).  Sequence fields are preserved —
    the carried manifest's entries still inherit their ORIGINAL commit's
    sequence number, never the new snapshot's."""
    return {
        "manifest_path": mf.path,
        "manifest_length": mf.length,
        "partition_spec_id": mf.partition_spec_id,
        "sequence_number": mf.sequence_number,
        "min_sequence_number": mf.min_sequence_number,
        "added_snapshot_id": mf.added_snapshot_id,
        "added_data_files_count": mf.added_files_count,
        "existing_data_files_count": mf.existing_files_count,
        "deleted_data_files_count": mf.deleted_files_count,
        "partitions": [
            {
                "contains_null": p.contains_null,
                "contains_nan": p.contains_nan,
                "lower_bound": p.lower_bound,
                "upper_bound": p.upper_bound,
            }
            for p in mf.partitions
        ]
        or None,
        "added_rows_count": mf.added_rows_count,
        "existing_rows_count": mf.existing_rows_count,
        "deleted_rows_count": deleted_rows,
        "content": mf.content,
    }


# Iceberg v3 row lineage: reserved field ids for the materialized
# lineage columns (spec "Reserved field IDs").  A row's id is the
# materialized ``_row_id`` value when present, else the file's
# ``first_row_id`` + its position.
ROW_ID_COL = "_row_id"
_ROW_ID_FIELD_ID = 2147483540
LAST_UPD_COL = "_last_updated_sequence_number"
_LAST_UPD_FIELD_ID = 2147483539


def _lineage_on(meta: dict) -> bool:
    """True when the table opted into v3 row lineage
    (``write.row-lineage.enabled`` table property)."""
    return (
        str(
            meta.get("properties", {}).get("write.row-lineage.enabled", "")
        ).lower()
        == "true"
    )


def _prefers_dv(table) -> bool:
    """True when the table's write.delete.mode asks for v3 deletion
    vectors — row-delta commits (MOR UPDATE/MERGE) then store their
    delete side as DVs too, matching how Spark-Iceberg v3 applies the
    property across every MOR write."""
    mode = table.metadata.properties.get("write.delete.mode", "").lower()
    return mode in ("deletion-vector", "deletion-vectors")


_SPARK_TO_AVRO = {
    "long": "long",
    "int": "int",
    "float": "float",
    "double": "double",
    "string": "string",
    "boolean": "boolean",
    "date": {"type": "int", "logicalType": "date"},
    "timestamp": {"type": "long", "logicalType": "timestamp-micros"},
    "timestamptz": {"type": "long", "logicalType": "timestamp-micros"},
}


def _avro_type_for(iceberg_type: str):
    """Avro schema for a partition-field value; timestamp variants all
    carry micros-from-epoch longs.  Unknown types fall back to string."""
    if iceberg_type in _SPARK_TO_AVRO:
        return _SPARK_TO_AVRO[iceberg_type]
    if iceberg_type.startswith("timestamp"):
        return {"type": "long", "logicalType": "timestamp-micros"}
    return "string"


@dataclass
class MergeClause:
    """One normalized MERGE WHEN clause.

    ``kind``: ``matched`` | ``not_matched`` (by target) |
    ``not_matched_by_source``.  ``condition`` is a SQL boolean over the
    fixed aliases ``t`` (target) / ``src`` (source) — ``None`` means
    unconditional.  ``action``: ``update``/``delete`` (matched, nmbs) or
    ``insert`` (not_matched).  ``insert_cols is None`` = ``INSERT *``;
    otherwise ``insert_values`` are per-column SQL exprs over ``src``.
    Clause order is significant: FIRST matching clause wins per row
    (standard SQL MERGE)."""

    kind: str
    condition: Optional[str]
    action: str
    assignments: Optional[dict] = None
    insert_cols: Optional[list] = None
    insert_values: Optional[list] = None


def _normalize_merge_clauses(
    clauses,
    when_matched_set,
    insert_not_matched,
    when_matched_delete,
    cols: list,
) -> list:
    """Legacy kwargs → clause list, then validate.  Spark's rule: for
    each clause kind, every clause but the LAST must carry a condition
    (an unconditioned earlier clause makes the rest unreachable) — this
    subsumes the old 'UPDATE SET and DELETE are exclusive' check."""
    if clauses is None:
        clauses = []
        if when_matched_delete:
            clauses.append(MergeClause("matched", None, "delete"))
        if when_matched_set is not None:
            clauses.append(
                MergeClause(
                    "matched", None, "update",
                    assignments=dict(when_matched_set),
                )
            )
        if insert_not_matched:
            clauses.append(MergeClause("not_matched", None, "insert"))
    seen_uncond: set = set()
    for cl in clauses:
        if cl.kind not in ("matched", "not_matched", "not_matched_by_source"):
            raise ValueError(f"MERGE: unknown clause kind {cl.kind!r}")
        if cl.kind == "not_matched" and cl.action != "insert":
            raise ValueError(
                "MERGE: WHEN NOT MATCHED supports only INSERT"
            )
        if cl.kind != "not_matched" and cl.action not in ("update", "delete"):
            raise ValueError(
                f"MERGE: WHEN {cl.kind} supports UPDATE SET / DELETE, "
                f"not {cl.action!r}"
            )
        if cl.kind in seen_uncond:
            raise ValueError(
                "MERGE: only the last clause of each WHEN kind may omit "
                "its AND condition (an earlier unconditioned clause makes "
                "later ones unreachable — e.g. unconditioned UPDATE SET "
                "and DELETE on MATCHED are mutually exclusive)"
            )
        if cl.condition is None:
            seen_uncond.add(cl.kind)
        if cl.action == "update":
            bad = set(cl.assignments or {}) - set(cols)
            if bad:
                raise ValueError(
                    f"merge SET of unknown columns: {sorted(bad)}"
                )
        if cl.action == "insert" and cl.insert_cols is not None:
            bad = set(cl.insert_cols) - set(cols)
            if bad:
                raise ValueError(
                    f"MERGE INSERT into unknown columns: {sorted(bad)}"
                )
            if len(cl.insert_cols) != len(cl.insert_values or []):
                raise ValueError(
                    "MERGE INSERT column/value arity mismatch"
                )
    return list(clauses)


def _merge_clause_index(clauses, matched_col, kinds: tuple):
    """Row-wise FIRST-matching clause index over the joined frame:
    ``matched_col`` gates matched vs not-matched-by-source kinds; a row
    matching no clause gets -1 (left untouched)."""
    from pyspark.sql import functions as F

    w = None
    for i, cl in enumerate(clauses):
        if cl.kind not in kinds:
            continue
        gate = matched_col if cl.kind == "matched" else ~matched_col
        if cl.condition:
            gate = gate & F.expr(f"coalesce(({cl.condition}), false)")
        w = F.when(gate, F.lit(i)) if w is None else w.when(gate, F.lit(i))
    return w.otherwise(F.lit(-1)) if w is not None else F.lit(-1)


def _normalize_merge_on(on) -> list:
    """MERGE ON spec → [(target_col, source_col), ...].  Accepts one
    column name (same name both sides), a tuple pair, or a list mixing
    names and pairs — ``t.colA = s.colB`` joins need distinct names per
    side now that the full source frame (extra CDC columns and all)
    participates in the join."""
    if isinstance(on, str):
        return [(on, on)]
    if isinstance(on, tuple) and len(on) == 2 and all(
        isinstance(x, str) for x in on
    ):
        return [(on[0], on[1])]
    out = []
    for item in on:
        if isinstance(item, str):
            out.append((item, item))
        else:
            out.append((item[0], item[1]))
    return out


def _puffin_codec(properties: dict) -> Optional[str]:
    """The opt-in ``write.puffin.compression-codec`` table property
    (``zstd``/``lz4``); anything else (including the spec-preferred
    unset/``none``) writes uncompressed blobs."""
    codec = str(properties.get("write.puffin.compression-codec", "")).lower()
    return codec if codec in ("lz4", "zstd") else None



def _eq_key_bounds(path: str, field_ids: dict, iceberg_types: dict):
    """(lower_bounds, upper_bounds) key/value lists for an equality-delete
    key parquet — the file holds ONLY the key columns, so the footer walk
    is tiny.  Bounds let readers and COW folds skip strictly-older data
    files whose key ranges cannot intersect the delete
    (table.files_targeted_by_deletes); missing bounds degrade to the old
    include-everything behavior."""
    try:
        st = _stat_parquet_footer(path, {}, field_ids, iceberg_types)
    except Exception:
        return [], []
    return (
        [{"key": k, "value": v} for k, v in st["lower_bounds"].items()],
        [{"key": k, "value": v} for k, v in st["upper_bounds"].items()],
    )

def _stat_parquet_footer(
    path: str,
    partition: dict,
    field_ids: dict,
    iceberg_types: dict,
) -> dict:
    """Per-file stats from ONE parquet footer (row-group min/max/null
    aggregated per file, + NaN counts for float columns).  Pure function
    of its arguments — runs on the driver for small appends and inside
    executor ``mapInPandas`` tasks when the footer-stats job is
    distributed (``_collect_file_stats_distributed``)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    lowers: dict[int, bytes] = {}
    uppers: dict[int, bytes] = {}
    nulls: dict[int, int] = {}
    values: dict[int, int] = {}
    mins: dict[str, Any] = {}
    maxs: dict[str, Any] = {}
    # Per-column completeness: a row group can legally omit
    # min/max (NaN-bearing float columns, oversized strings) or
    # null_count.  A file bound aggregated over a SUBSET of row
    # groups would be an understated bound — reads stay exact via
    # the re-filter, but DELETE/UPDATE/MERGE trust pruning to pick
    # every candidate file, so an incomplete column must emit NO
    # bound (conservative "maybe") rather than a wrong one.
    no_minmax: set[str] = set()
    no_nulls: set[str] = set()
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            name = col.path_in_schema.split(".")[0]
            fid = field_ids.get(name)
            if fid is None:
                continue
            if (
                not isinstance(iceberg_types.get(name), str)
                or iceberg_types.get(name) == "variant"
            ):
                # nested/variant column: parquet footers carry per-LEAF
                # stats; a single top-level bound would mix leaves
                # — emit none (pruning treats as unknown)
                continue
            values[fid] = values.get(fid, 0) + col.num_values
            st = col.statistics
            if st is None or st.null_count is None:
                no_nulls.add(name)
            else:
                nulls[fid] = nulls.get(fid, 0) + st.null_count
            if st is None or not st.has_min_max:
                no_minmax.add(name)
                continue
            try:
                st_min, st_max = st.min, st.max
            except Exception:
                # pyarrow's _cast_statistics cannot decode some logical
                # types (INT32/INT64-backed DECIMAL as Spark writes
                # decimal(p,s<=18)); the raw physical values are still in
                # the footer — rescale the unscaled ints ourselves, else
                # conservatively emit no bound
                t = iceberg_types.get(name, "")
                m = re.fullmatch(r"decimal\((\d+),\s*(\d+)\)", t)
                if m is not None and isinstance(st.min_raw, int):
                    from decimal import Decimal as _Dec

                    scale = int(m.group(2))
                    q = _Dec(1).scaleb(-scale)
                    st_min = _Dec(st.min_raw).scaleb(-scale).quantize(q)
                    st_max = _Dec(st.max_raw).scaleb(-scale).quantize(q)
                else:
                    no_minmax.add(name)
                    continue
            if isinstance(st_min, float) and (
                st_min != st_min or st_max != st_max
            ):
                # NaN bound (parquet writers may emit them for
                # NaN-bearing pages): every comparison with NaN is
                # false, so a NaN min/max silently poisons pruning
                # — treat the column as stats-less instead
                no_minmax.add(name)
            else:
                mn, mx = st_min, st_max
                if name not in mins or mn < mins[name]:
                    mins[name] = mn
                if name not in maxs or mx > maxs[name]:
                    maxs[name] = mx
    for name in no_nulls:
        fid = field_ids.get(name)
        if fid is not None:
            nulls.pop(fid, None)
    for name, mn in mins.items():
        if name in no_minmax:
            continue
        fid = field_ids[name]
        enc = encode_stat(iceberg_types[name], mn)
        if enc is not None:
            lowers[fid] = enc
    for name, mx in maxs.items():
        if name in no_minmax:
            continue
        fid = field_ids[name]
        enc = encode_stat(iceberg_types[name], mx)
        if enc is not None:
            uppers[fid] = enc
    # partition values count toward stats too (identity transform:
    # value is constant per file even though absent from the file)
    for k, v in partition.items():
        fid = field_ids.get(k)
        if fid is not None and v is not None:
            enc = encode_stat(iceberg_types[k], v)
            if enc is not None:
                lowers.setdefault(fid, enc)
                uppers.setdefault(fid, enc)
            values.setdefault(fid, md.num_rows)
            nulls.setdefault(fid, 0)
    # NaN counts for float/double columns: parquet footers carry
    # none, but Iceberg bounds EXCLUDE NaN while Spark MAX sorts
    # NaN above everything — metadata-only MIN/MAX is provably
    # exact only when the manifest proves zero NaNs, so count
    # them (one narrow column read per float column; rides the
    # distributed stats job when that path is taken)
    nans: dict[int, int] = {}
    float_cols = [
        c
        for c, t in iceberg_types.items()
        if t in ("float", "double")
        and field_ids.get(c) is not None
        and c not in partition
    ]
    if float_cols:
        import pyarrow.compute as pc

        try:
            tbl = pq.read_table(path, columns=float_cols)
            for c in float_cols:
                n = pc.sum(
                    pc.is_nan(tbl[c]).cast("int64")
                ).as_py()
                nans[field_ids[c]] = int(n or 0)
        except Exception:
            pass  # absent column (pre-evolution file): no count
    for k in partition:
        fid = field_ids.get(k)
        t = iceberg_types.get(k)
        if fid is not None and t in ("float", "double"):
            v = partition[k]
            nans[fid] = int(v is not None and v != v) * md.num_rows
    return {
        "path": path,
        "partition": partition,
        "record_count": md.num_rows,
        "file_size": os.path.getsize(path),
        "lower_bounds": lowers,
        "upper_bounds": uppers,
        "null_counts": nulls,
        "value_counts": values,
        "nan_counts": nans,
    }


def _carry_identifier_fields(cur: dict, new_schema: dict, dropped=()) -> None:
    """Schema evolutions produce a NEW schema object; identifier-field-ids
    (the upsert/row-identity keys) live ON the schema, so every evolution
    must carry them forward or an ADD COLUMN would silently wipe the
    table's upsert keys (r9 regression find).  ``dropped`` removes the
    ids of dropped fields (a dropped identifier column stops identifying
    rows, matching the spec's requirement that ids reference live fields)."""
    ids = [i for i in cur.get("identifier-field-ids", []) if i not in set(dropped)]
    if ids:
        new_schema["identifier-field-ids"] = ids


class IcebergWriter:
    """Create/append/commit for one table root."""

    def __init__(
        self,
        root: str,
        schema: T.StructType,
        partition_by: Optional[list[str]] = None,
        field_ids: Optional[dict[str, int]] = None,
        sort_by: Optional[list[str]] = None,
        spec_id: int = 0,
        iceberg_types: Optional[dict[str, Any]] = None,
        last_column_id: Optional[int] = None,
        write_defaults: Optional[dict] = None,
    ):
        from datafusion_iceberg_spark.iceberg.transforms import parse_spec_entry

        self.root = os.path.abspath(root)
        self.schema = schema
        # the spec id new manifests are stamped with (the table's default
        # spec — passed in when rebuilding a writer for a spec-evolved
        # table so old manifests keep their own id)
        self.spec_id = spec_id
        # spec entries: 'col' | 'day(col)' | 'month(col)' | 'year(col)' |
        # 'hour(col)' | 'bucket(N, col)' | 'truncate(W, col)'
        self.spec_entries = [parse_spec_entry(e) for e in (partition_by or [])]
        # partition_by = the DIRECTORY columns (derived names for
        # non-identity transforms; the source column name for identity)
        self.partition_by = [fname for _, _, fname in self.spec_entries]
        # field ids come from table metadata when rebuilding a writer for
        # an existing table (DROP COLUMN breaks the id==position+1
        # invariant; a positional fallback would stamp wrong ids on new
        # files and key stats to the wrong columns); position-based only
        # at first CREATE
        # v3 write-defaults: columns a writer fills when the input frame
        # omits them (fixed at ADD COLUMN ... DEFAULT time)
        self.write_defaults = dict(write_defaults or {})
        self.field_ids = dict(field_ids) if field_ids else {
            f.name: i + 1 for i, f in enumerate(schema.fields)
        }
        if iceberg_types is not None:
            # rebuilding for an existing table: take types VERBATIM from
            # metadata so nested element/key/value ids stay the ones the
            # table recorded (re-deriving would re-allocate them)
            self.iceberg_types = dict(iceberg_types)
            self.last_column_id = last_column_id or max(
                self.field_ids.values(), default=0
            )
        else:
            # fresh CREATE: top-level fields take ids 1..N, nested
            # element/key/value/subfield ids continue from N+1
            counter = iter(range(max(self.field_ids.values(), default=0) + 1, 1 << 30))
            self.iceberg_types = {
                f.name: spark_type_to_iceberg(f.dataType, lambda: next(counter))
                for f in schema.fields
            }
            self.last_column_id = next(counter) - 1
        self.sort_by = list(sort_by or [])

    def _part_result_type(self, source: str, transform: str) -> str:
        from datafusion_iceberg_spark.iceberg.transforms import (
            result_iceberg_type,
        )

        return result_iceberg_type(transform, self.iceberg_types[source])

    # -- metadata helpers ---------------------------------------------------

    def _schema_json(self) -> dict:
        return {
            "type": "struct",
            "schema-id": 0,
            "fields": [
                {
                    "id": self.field_ids[f.name],
                    "name": f.name,
                    "required": not f.nullable,
                    "type": self.iceberg_types[f.name],
                }
                for f in self.schema.fields
            ],
        }

    def _spec_json(self) -> dict:
        return {
            "spec-id": 0,
            "fields": [
                {
                    "name": fname,
                    "transform": transform,
                    "source-id": self.field_ids[source],
                    "field-id": 1000 + i,
                }
                for i, (source, transform, fname) in enumerate(self.spec_entries)
            ],
        }

    def _current_version(self) -> int:
        # The hint alone is not trustworthy: _commit_metadata creates
        # v{N+1}.metadata.json BEFORE the hint updates, so a writer that
        # dies between the two leaves the hint at N with v{N+1} on disk —
        # trusting it would make every later commit target the existing
        # v{N+1} and CommitConflict forever.  Reconcile with the glob.
        hint = -1
        hint_path = os.path.join(self.root, "metadata", "version-hint.text")
        if os.path.exists(hint_path):
            with open(hint_path) as fh:
                hint = int(fh.read().strip())
        vs = glob.glob(os.path.join(self.root, "metadata", "v*.metadata.json"))
        latest = max(
            (int(os.path.basename(p).split(".")[0][1:]) for p in vs), default=-1
        )
        return max(hint, latest)

    def _version_path(self, v: int) -> str:
        """Existing metadata file for version ``v`` — plain or gzip
        spelling (``write.metadata.compression-codec=gzip``)."""
        meta_dir = os.path.join(self.root, "metadata")
        plain = os.path.join(meta_dir, f"v{v}.metadata.json")
        if os.path.exists(plain):
            return plain
        gz = os.path.join(meta_dir, f"v{v}.gz.metadata.json")
        if os.path.exists(gz):
            return gz
        return plain  # let the open() raise the canonical error

    def _load_current(self) -> dict:
        from datafusion_iceberg_spark.iceberg.metadata import (
            read_metadata_bytes,
        )

        v = self._current_version()
        self._loaded_version = v
        return json.loads(
            read_metadata_bytes(self._version_path(v)).decode("utf-8")
        )

    def _load_table(self):
        """The read-side view of the table this writer mutates (file
        lists, manifests, scans for COW/MOR rewrites).  Overridable:
        a REST-committed table resolves through the catalog service
        (RestCommitWriter) and a staged transaction through its pending
        metadata (_StagedRestWriter) — the local default reads the
        latest on-disk version."""
        from datafusion_iceberg_spark.iceberg.table import IcebergTable

        return IcebergTable.load(self.root)

    def _commit_metadata(self, meta: dict) -> None:
        """Optimistic-concurrency commit: the new version number is
        base+1 where base is the version the caller READ (via
        _load_current), and the metadata file is created exclusively
        (os.link) — if a concurrent writer committed the same version
        first, this raises CommitConflict instead of clobbering it.
        append() retries by re-reading; other mutations surface the
        conflict to the caller."""
        base = getattr(self, "_loaded_version", None)
        if base is None:
            base = self._current_version()
        v = base + 1
        meta_dir = os.path.join(self.root, "metadata")
        os.makedirs(meta_dir, exist_ok=True)
        codec = str(
            (meta.get("properties") or {}).get(
                "write.metadata.compression-codec", "none"
            )
        ).lower()
        # tmp name must be unique per THREAD, not just per process: two
        # in-process writers racing on the same version would share a
        # pid-only name — the winner's cleanup removes the loser's
        # freshly-written tmp and the loser's os.link dies with
        # FileNotFoundError instead of the CommitConflict retry (r10
        # flake find: test_concurrent_append_optimistic_concurrency)
        import threading as _threading

        tmp = os.path.join(
            meta_dir,
            f".v{v}.metadata.json.{os.getpid()}.{_threading.get_ident()}.tmp",
        )
        if codec == "gzip":
            import gzip

            # mtime=0: deterministic bytes (gzip embeds a timestamp)
            with open(tmp, "wb") as raw_fh:
                with gzip.GzipFile(fileobj=raw_fh, mode="wb", mtime=0) as fh:
                    fh.write(json.dumps(meta, indent=1).encode("utf-8"))
            target = os.path.join(meta_dir, f"v{v}.gz.metadata.json")
        else:
            with open(tmp, "w") as fh:
                json.dump(meta, fh, indent=1)
            target = os.path.join(meta_dir, f"v{v}.metadata.json")
        # a concurrent writer may have landed the OTHER spelling of the
        # same version — both are version v, so both are conflicts
        other = (
            os.path.join(meta_dir, f"v{v}.metadata.json")
            if codec == "gzip"
            else os.path.join(meta_dir, f"v{v}.gz.metadata.json")
        )
        try:
            if os.path.exists(other):
                raise FileExistsError(other)
            # link = atomic create-exclusive with full content in place
            os.link(tmp, target)
        except FileExistsError:
            os.remove(tmp)
            raise CommitConflict(
                f"{self.root}: version v{v} was committed concurrently"
            )
        finally:
            try:
                os.remove(tmp)
            except FileNotFoundError:
                pass
        # version-hint last: readers see the new version only after the
        # metadata file is fully in place (single-FS atomic commit)
        hint_tmp = os.path.join(
            meta_dir,
            f".version-hint.{os.getpid()}.{_threading.get_ident()}.tmp",
        )
        with open(hint_tmp, "w") as fh:
            fh.write(str(v))
        os.rename(hint_tmp, os.path.join(meta_dir, "version-hint.text"))

    # -- public API ---------------------------------------------------------

    def _sort_order_json(self) -> dict:
        if not self.sort_by:
            return {"order-id": 0, "fields": []}
        return {
            "order-id": 1,
            "fields": [
                {
                    "transform": "identity",
                    "source-id": self.field_ids[c],
                    "direction": "asc",
                    "null-order": "nulls-first",
                }
                for c in self.sort_by
            ],
        }

    def create(self, properties: Optional[dict] = None) -> None:
        """v0 metadata: empty table, no snapshot (fixture analogue:
        v0.metadata.json with current-snapshot-id -1)."""
        if self._current_version() >= 0:
            raise FileExistsError(f"table already exists at {self.root}")
        props = properties or {}
        wants_v3 = (
            _lineage_on({"properties": props})
            or str(props.get("write.delete.mode", "")).lower()
            in ("deletion-vector", "deletion-vectors")
            # nanosecond timestamps are a v3 type
            or any(
                t in ("timestamp_ns", "timestamptz_ns")
                for t in self.iceberg_types.values()
                if isinstance(t, str)
            )
        )
        meta = {
            # format-version 2 by default: snapshots carry real data
            # sequence numbers (`sequence-number`, via
            # `last-sequence-number`) that govern MOR delete
            # applicability — interop with Flink/Spark-Iceberg v2
            # readers (VERDICT r5 task 4).  Tables that opt into v3
            # features (deletion vectors, row lineage) declare
            # format-version 3 from the start so strict foreign readers
            # know what to expect; a v2 table using them later is
            # upgraded one-way at the first v3 commit.
            "format-version": 3 if wants_v3 else 2,
            "last-sequence-number": 0,
            "table-uuid": str(uuidlib.uuid4()),
            "location": self.root,
            "last-updated-ms": int(time.time() * 1000),
            "last-column-id": self.last_column_id,
            "schema": self._schema_json(),
            "current-schema-id": 0,
            "schemas": [self._schema_json()],
            "partition-spec": self._spec_json()["fields"],
            "default-spec-id": 0,
            "partition-specs": [self._spec_json()],
            "last-partition-id": 1000 + max(len(self.partition_by) - 1, 0),
            "default-sort-order-id": 1 if self.sort_by else 0,
            "sort-orders": [self._sort_order_json()],
            "properties": properties or {},
            "current-snapshot-id": -1,
            "snapshots": [],
            "snapshot-log": [],
            "metadata-log": [],
        }
        self._commit_metadata(meta)

    def append(
        self,
        spark: SparkSession,
        df: DataFrame,
        _carry: bool = True,
        _operation: str = "append",
        _extra_entries: Optional[list] = None,
        _allow_empty: bool = False,
        stage_branch: Optional[str] = None,
        _expected_parent=_UNCHECKED,
        merge_schema: Optional[bool] = None,
        wap_id: Optional[str] = None,
        extra_summary: Optional[dict] = None,
    ) -> int:
        """Write df as parquet data files + commit an append snapshot.
        ``merge_schema=True`` (or the ``write.spark.accept-any-schema``
        table property) evolves the schema to accept source columns the
        table lacks — see :meth:`merge_source_schema`.
        ``wap_id`` stages the snapshot Spark-Iceberg-style (summary
        ``wap.id``, in the snapshot list, NO ref, main unmoved) for a
        later ``CALL publish_changes(wap_id)``.
        ``stage_branch`` stages the snapshot for write-audit-publish: it
        is committed to the snapshot list under a branch ref of that
        name, but ``main`` (current-snapshot-id, snapshot-log) does not
        move until :meth:`fast_forward` publishes it.
        Returns the new snapshot id.  With ``_carry=False`` the new
        manifest REPLACES all previous ones (a rewrite snapshot — used by
        :meth:`compact`); ``_extra_entries`` (DataFile objects) are
        surviving files included verbatim in the new manifest (used by
        :meth:`delete` for copy-on-write)."""
        self._maybe_merge_schema(df, merge_schema)
        if _operation in ("append", "overwrite"):
            # CHECK constraints guard NEW data; "replace"/"delete"
            # snapshots rewrite rows that already passed (ADD CONSTRAINT
            # validated pre-existing data, so this can't fail spuriously)
            self._enforce_check_constraints(df)
        snap_id = int(time.time() * 1000) * 1000 + (int.from_bytes(os.urandom(2), "big") % 1000)
        files = self._write_data_files(df, snap_id)
        return self._commit_file_stats(
            snap_id,
            files,
            _carry,
            _operation,
            _extra_entries,
            _allow_empty,
            stage_branch,
            _expected_parent,
            _extra_summary={
                **(extra_summary or {}),
                **({"wap.id": wap_id} if wap_id else {}),
            }
            or None,
            _staged_only=bool(wap_id),
        )

    def _enforce_check_constraints(self, df: DataFrame) -> None:
        """Delta-style CHECK constraints (``constraints.<name>`` table
        properties, managed by ALTER TABLE ADD/DROP CONSTRAINT): every
        incoming row must satisfy each expression — NULL counts as a
        violation (SQL CHECK must be TRUE).  Cost: one codegen'd filter
        + LIMIT 1 probe per constraint per write, no shuffle; beyond
        both the reference and the Iceberg spec (which has no CHECK)."""
        try:
            props = self._load_current().get("properties", {})
        except FileNotFoundError:
            return  # table being created: no committed metadata yet
        # any OTHER metadata read error must surface — silently skipping
        # enforcement on e.g. a truncated metadata file would let
        # violating rows through
        cons = {
            k[len("constraints."):]: v
            for k, v in props.items()
            if k.startswith("constraints.")
        }
        if not cons:
            return
        from pyspark.sql import functions as _F

        for cname in sorted(cons):
            expr = _F.expr(cons[cname])
            bad = df.filter(~expr | expr.isNull()).take(1)
            if bad:
                raise ValueError(
                    f"CHECK constraint {cname!r} violated: "
                    f"({cons[cname]}) is not TRUE for row "
                    f"{bad[0].asDict()} — nothing was written"
                )

    def _write_data_files(self, df: DataFrame, snap_id: int) -> list[dict]:
        """The write half of :meth:`append`: field-id-stamped parquet
        under ``data/snap-<id>`` with partition transforms and table
        sort order applied; returns the per-file stats dicts."""
        from pyspark.sql import functions as _F

        from datafusion_iceberg_spark.iceberg.transforms import spark_expr

        data_dir = os.path.join(self.root, "data", f"snap-{snap_id}")
        # stamp PARQUET:field_id on every column (fieldId.write.enabled in
        # session confs) so future scans can resolve by id across renames
        # v3 write-defaults: a frame omitting a defaulted column writes
        # the default for every row (post-ALTER INSERTs with the old
        # arity keep working); omitting a non-defaulted column stays an
        # error via the select below
        for f in self.schema.fields:
            if f.name not in df.columns and f.name in self.write_defaults:
                df = df.withColumn(
                    f.name,
                    _F.lit(self.write_defaults[f.name]).cast(f.dataType),
                )
        cols = [
            _F.col(f.name).alias(
                f.name, metadata={"parquet.field.id": self.field_ids[f.name]}
            )
            for f in self.schema.fields
        ]
        if ROW_ID_COL in df.columns:
            # v3 row lineage: MOR update/merge replacement rows and COW
            # rewrites carry their original row id MATERIALIZED (spec:
            # rewritten rows keep their id); fresh inserts carry null and
            # take first_row_id + position at read time
            cols.append(
                _F.col(ROW_ID_COL)
                .cast("long")
                .alias(
                    ROW_ID_COL,
                    metadata={"parquet.field.id": _ROW_ID_FIELD_ID},
                )
            )
        if LAST_UPD_COL in df.columns:
            # COW rewrites also materialize the original last-updated
            # sequence (otherwise every carried row would wrongly take
            # the rewrite commit's sequence); genuinely-changed rows
            # write null and take the new file's sequence at read time
            cols.append(
                _F.col(LAST_UPD_COL)
                .cast("long")
                .alias(
                    LAST_UPD_COL,
                    metadata={"parquet.field.id": _LAST_UPD_FIELD_ID},
                )
            )
        out = df.select(*cols)
        # non-identity transforms: materialize the derived partition column
        # (it lands in the directory layout only — partitionBy drops it
        # from the data files, same as identity)
        for source, transform, fname in self.spec_entries:
            if transform != "identity":
                out = out.withColumn(
                    fname,
                    spark_expr(
                        transform,
                        source,
                        dtype=out.schema[source].dataType,
                        iceberg_type=self.iceberg_types.get(source),
                    ),
                )
        if self.sort_by:
            # table sort order: range-partition on the sort key so files
            # cover DISJOINT key ranges (per-file min/max bounds become
            # tight → stats pruning skips all but the matching range),
            # then sort within each file for row-group/page locality
            out = out.repartitionByRange(*self.sort_by).sortWithinPartitions(
                *self.sort_by
            )
        elif self.partition_by:
            # write.distribution-mode (Iceberg write property): without
            # it, T upstream tasks × P live partitions yields T·P small
            # files per append — the dominant small-file generator at
            # 100 TB.  'hash' routes each partition's rows to one task
            # (one file per partition dir per append); 'range'
            # range-clusters on the partition columns.  Default 'none'
            # writes the frame as-is (the caller owns distribution).
            try:
                props = self._load_current().get("properties", {})
            except (OSError, ValueError, FileNotFoundError):
                props = {}
            mode = str(
                props.get("write.distribution-mode", "none")
            ).lower()
            if mode == "hash":
                out = out.repartition(*self.partition_by)
            elif mode == "range":
                out = out.repartitionByRange(*self.partition_by)
        writer = out.write.mode("overwrite")
        if self.partition_by:
            writer = writer.partitionBy(*self.partition_by)
        try:
            props = self._load_current().get("properties", {})
        except (OSError, ValueError, FileNotFoundError):
            props = {}
        codec = str(
            props.get("write.parquet.compression-codec", "")
        ).lower()
        if codec:
            # Iceberg write property: zstd/gzip/snappy/lz4/uncompressed —
            # forwarded to the parquet writer per data file (metadata and
            # puffin have their own codec properties)
            writer = writer.option(
                "compression",
                "uncompressed" if codec == "none" else codec,
            )
        writer.parquet(data_dir)
        return self._collect_file_stats(data_dir)

    def set_properties(self, updates: dict, removes: Optional[list] = None) -> None:
        """ALTER TABLE SET/UNSET TBLPROPERTIES: merge ``updates`` into the
        table properties (and drop ``removes``) in a new metadata
        version — a pure metadata commit, e.g. to flip
        ``write.delete.mode`` after creation."""
        meta = self._load_current()
        props = dict(meta.get("properties", {}))
        props.update({str(k): str(v) for k, v in updates.items()})
        for k in removes or []:
            props.pop(k, None)
        meta["properties"] = props
        meta["last-updated-ms"] = int(time.time() * 1000)
        self._commit_metadata(meta)

    @classmethod
    def for_table(cls, root: str) -> "IcebergWriter":
        """Rebuild a writer for an existing table from its metadata (the
        same reconstruction Catalog.writer performs, available without a
        catalog — used by the Python DataSource write path)."""
        from datafusion_iceberg_spark.iceberg.table import IcebergTable

        meta = IcebergTable.load(root).metadata
        return cls(
            meta.root,
            meta.struct_type(),
            meta.partition_spec_entries(),
            field_ids=meta.field_ids_by_name(),
            sort_by=meta.sort_order_columns(),
            spec_id=meta.default_spec_id,
            iceberg_types={
                f["name"]: f["type"] for f in meta.current_schema["fields"]
            },
            last_column_id=meta.last_column_id,
        )

    def add_files(self, source_dir: str) -> dict:
        """Spark-Iceberg's ``add_files`` / ``migrate`` procedure: register
        EXISTING parquet files into the table as ONE append snapshot
        without rewriting a byte of data — footers are statted for
        per-file column stats, hive-style ``col=value`` subdirectories
        become partition values, and the files are referenced IN PLACE
        (metadata may point outside the table root; ``localize`` passes
        foreign absolute paths through).  This is how a plain parquet
        lake migrates to Iceberg: the metadata commit IS the migration.

        Validates by footer that every non-partition table column is
        present in each file (name-resolved — migrated files rarely
        carry field ids) so a wrong-directory migration fails before the
        commit, not at first scan."""
        import pyarrow.parquet as pq

        paths = sorted(
            glob.glob(
                os.path.join(source_dir, "**", "*.parquet"), recursive=True
            )
        )
        if not paths:
            raise ValueError(f"add_files: no parquet files under {source_dir}")
        part_cols = {c for c in self.partition_by}
        needed = [
            f.name for f in self.schema.fields if f.name not in part_cols
        ]
        for p in paths:
            names = set(pq.read_schema(p).names)
            missing = [c for c in needed if c not in names]
            if missing:
                raise ValueError(
                    f"add_files: {p} lacks table column(s) {missing}"
                )
        files = self._collect_file_stats(source_dir, paths=paths)
        snap_id = int(time.time() * 1000) * 1000 + (
            int.from_bytes(os.urandom(2), "big") % 1000
        )
        snap = self._commit_file_stats(
            snap_id, files, True, "append", _extra_summary={"added-files-via": "add_files"}
        )
        return {
            "added_files_count": len(paths),
            "added_rows_count": sum(f["record_count"] for f in files),
            "snapshot_id": snap,
        }

    def commit_data_dir(
        self, data_dir: str, operation: str = "append", replace: bool = False
    ) -> int:
        """Commit parquet files that were written OUTSIDE this writer
        (e.g. by the Python DataSource write path): stat the footers,
        build the manifest, commit one snapshot.  The files must already
        live under the table root.  ``replace=True`` commits an
        overwrite snapshot referencing ONLY the new files."""
        snap_id = int(time.time() * 1000) * 1000 + (
            int.from_bytes(os.urandom(2), "big") % 1000
        )
        files = self._collect_file_stats(data_dir)
        if replace:
            return self._commit_file_stats(
                snap_id, files, False, operation, [], True
            )
        return self._commit_file_stats(snap_id, files, True, operation)

    def commit_files(
        self,
        data_dir: str,
        paths: list,
        operation: str = "append",
        replace: bool = False,
        extra_summary: Optional[dict] = None,
    ) -> int:
        """Commit exactly ``paths`` (already written under the table
        root) as one snapshot — the commit half of both DataSource write
        paths, where each task's file set arrives via executor commit
        messages rather than a directory walk.  Unlike
        :meth:`commit_data_dir` this never sweeps up parquet left by
        failed/retried/speculative task attempts: only files reported by
        successful tasks enter the snapshot.  ``replace=True`` commits an
        overwrite snapshot referencing ONLY ``paths``."""
        snap_id = int(time.time() * 1000) * 1000 + (
            int.from_bytes(os.urandom(2), "big") % 1000
        )
        files = self._collect_file_stats(data_dir, paths=paths)
        if replace:
            return self._commit_file_stats(
                snap_id, files, False, operation, [], True,
                _extra_summary=extra_summary,
            )
        return self._commit_file_stats(
            snap_id, files, True, operation, _extra_summary=extra_summary
        )

    def _lineage_scan(self, spark: SparkSession, table, files):
        """Scan ``files`` with the v3 lineage columns RESOLVED (ready to
        re-materialize into rewritten files): table columns + ``_row_id``
        + ``_last_updated_sequence_number``."""
        df = table._scan_files(
            spark,
            files,
            None,
            _with_row_meta=True,
            _extra_cols=[
                (ROW_ID_COL, T.LongType()),
                (LAST_UPD_COL, T.LongType()),
            ],
        )
        return table.attach_row_lineage(spark, df, files).drop(
            "_ice_file", "_ice_pos"
        )

    def _manifest_write_schema(self) -> dict:
        """The Avro schema this writer's manifests use (partition fields
        from the table spec) — needed when a commit must REWRITE a
        manifest it already wrote (row-lineage first_row_id assignment
        happens at commit time, when next-row-id is known)."""
        part_fields = [
            {
                "name": fname,
                "avro_type": _avro_type_for(
                    self._part_result_type(source, transform)
                ),
            }
            for source, transform, fname in self.spec_entries
        ]
        return _manifest_schema(part_fields)

    def _assign_first_row_ids(
        self, meta: dict, entries: list, manifest_path: str
    ) -> None:
        """v3 row lineage: give every ADDED data entry lacking one a
        ``first_row_id`` from the table's ``next-row-id`` counter (in
        entry order), rewrite the manifest with the assignments, and
        advance the counter in ``meta`` (committed atomically with the
        snapshot).  Re-entrant: the commit retry reloads metadata, so a
        concurrent commit's counter advance is observed before
        reassignment.  Entries stamped by an earlier (lost) attempt are
        tracked via a transient ``_provisional_first_row_id`` marker and
        re-assigned from the fresh counter — without it a CommitConflict
        retry would keep ids minted from a stale ``next-row-id`` and two
        racing lineage appends could commit overlapping ranges.  The
        marker never reaches disk: Avro encoding is schema-driven and
        the manifest schema has no such field."""
        if not _lineage_on(meta):
            return
        rid = int(meta.get("next-row-id", 0))
        changed = False
        for e in entries:
            d = e.get("data_file", {})
            if d.pop("_provisional_first_row_id", False):
                d["first_row_id"] = None  # stale: minted by a lost attempt
            if (
                e.get("status", 1) == 1
                and (d.get("content") or 0) == 0
                and d.get("first_row_id") is None
            ):
                d["first_row_id"] = rid
                d["_provisional_first_row_id"] = True
                rid += int(d.get("record_count", 0))
                changed = True
        if changed:
            write_avro_file(
                manifest_path, self._manifest_write_schema(), entries
            )
        if int(meta.get("format-version", 2)) < 3:
            meta["format-version"] = 3  # row lineage is a v3 feature
        meta["next-row-id"] = rid

    def _data_entry(self, snap_id: int, f: dict) -> dict:
        """Manifest entry dict for one per-file stats dict."""
        return {
            "status": 1,
            "snapshot_id": snap_id,
            "data_file": {
                "file_path": f["path"],
                "file_format": "PARQUET",
                "partition": f["partition"],
                "record_count": f["record_count"],
                "file_size_in_bytes": f["file_size"],
                "block_size_in_bytes": 67108864,
                "value_counts": [
                    {"key": k, "value": v} for k, v in f["value_counts"].items()
                ],
                "null_value_counts": [
                    {"key": k, "value": v} for k, v in f["null_counts"].items()
                ],
                "nan_value_counts": [
                    {"key": k, "value": v}
                    for k, v in f.get("nan_counts", {}).items()
                ],
                "lower_bounds": [
                    {"key": k, "value": v} for k, v in f["lower_bounds"].items()
                ],
                "upper_bounds": [
                    {"key": k, "value": v} for k, v in f["upper_bounds"].items()
                ],
            },
        }

    def _partition_summaries(self, all_parts: list[dict]) -> list[dict]:
        """Manifest-list partition summaries from per-file partition
        values (bounds encode with the TRANSFORM's result type — the
        domain the pruning rewrite compares against)."""
        summaries = []
        for source, transform, c in self.spec_entries:
            t = self._part_result_type(source, transform)
            vals = [p[c] for p in all_parts if p.get(c) is not None]
            summaries.append(
                {
                    "contains_null": any(p.get(c) is None for p in all_parts),
                    "contains_nan": False,
                    "lower_bound": encode_stat(t, min(vals)) if vals else None,
                    "upper_bound": encode_stat(t, max(vals)) if vals else None,
                }
            )
        return summaries

    def _commit_file_stats(
        self,
        snap_id: int,
        files: list,
        _carry: bool = True,
        _operation: str = "append",
        _extra_entries: Optional[list] = None,
        _allow_empty: bool = False,
        stage_branch: Optional[str] = None,
        _expected_parent=_UNCHECKED,
        _extra_summary: Optional[dict] = None,
        _extra_manifest_rows: Optional[list] = None,
        _staged_only: bool = False,
    ) -> int:
        """Manifest build + snapshot commit for per-file stats dicts
        (the post-write half of :meth:`append`, shared with
        :meth:`commit_data_dir`).  ``_extra_manifest_rows`` appends
        pre-built manifest-list rows (e.g. an upsert's equality-delete
        manifest) to the snapshot; rows with ``sequence_number=None``
        take the commit's sequence."""
        if not files and not (_allow_empty and _extra_entries is not None):
            raise ValueError("append produced no data files")

        meta_dir = os.path.join(self.root, "metadata")
        man_uuid = str(uuidlib.uuid4())
        manifest_path = os.path.join(meta_dir, f"{man_uuid}-m0.avro")
        part_fields = [
            {
                "name": fname,
                "avro_type": _avro_type_for(
                    self._part_result_type(source, transform)
                ),
            }
            for source, transform, fname in self.spec_entries
        ]
        entries = [self._data_entry(snap_id, f) for f in files]
        # surviving files re-included verbatim (copy-on-write delete):
        # they keep their original data sequence number — only genuinely
        # rewritten rows take the new commit's sequence
        for ef in _extra_entries or []:
            entries.append(
                {
                    "status": 1,
                    "snapshot_id": snap_id,
                    "sequence_number": ef.sequence_number,
                    "data_file": {
                        "file_path": ef.path,
                        "file_format": ef.file_format or "PARQUET",
                        "partition": dict(ef.partition),
                        "record_count": ef.record_count,
                        "file_size_in_bytes": ef.file_size_in_bytes,
                        "first_row_id": ef.first_row_id,
                        "block_size_in_bytes": 67108864,
                        "value_counts": [
                            {"key": k, "value": v} for k, v in ef.value_counts.items()
                        ],
                        "null_value_counts": [
                            {"key": k, "value": v}
                            for k, v in ef.null_value_counts.items()
                        ],
                        "nan_value_counts": [
                            {"key": k, "value": v}
                            for k, v in ef.nan_value_counts.items()
                        ],
                        "lower_bounds": [
                            {"key": k, "value": v} for k, v in ef.lower_bounds.items()
                        ],
                        "upper_bounds": [
                            {"key": k, "value": v} for k, v in ef.upper_bounds.items()
                        ],
                    },
                }
            )
        # stats sources for summaries/totals: new files + surviving files
        all_parts = [f["partition"] for f in files] + [
            dict(ef.partition) for ef in _extra_entries or []
        ]
        write_avro_file(manifest_path, _manifest_schema(part_fields), entries)

        summaries = self._partition_summaries(all_parts)
        total_rows = sum(f["record_count"] for f in files) + sum(
            ef.record_count for ef in _extra_entries or []
        )
        manifest_list_path = os.path.join(
            meta_dir, f"snap-{snap_id}-1-{man_uuid}.avro"
        )
        for _attempt in range(5):
            try:
                return self._commit_append_snapshot(
                    snap_id,
                    manifest_path,
                    manifest_list_path,
                    entries,
                    summaries,
                    total_rows,
                    _carry,
                    _operation,
                    stage_branch,
                    _expected_parent,
                    _extra_summary,
                    _extra_manifest_rows,
                    _staged_only=_staged_only,
                )
            except RewriteConflict:
                # the manifest was built from a now-stale file set: a
                # blind retry would drop the concurrent commit's files —
                # the caller must re-plan (see RewriteConflict docstring)
                raise
            except CommitConflict:
                if _attempt == 4:
                    raise
                time.sleep(0.05 * (_attempt + 1))
        raise AssertionError("unreachable")

    def _commit_append_snapshot(
        self,
        snap_id: int,
        manifest_path: str,
        manifest_list_path: str,
        entries: list,
        summaries: list,
        total_rows: int,
        _carry: bool,
        _operation: str,
        _stage_branch: Optional[str] = None,
        _expected_parent=_UNCHECKED,
        _extra_summary: Optional[dict] = None,
        _extra_manifest_rows: Optional[list] = None,
        _staged_only: bool = False,
    ) -> int:
        """The read-validate-commit section of append, re-entrant for the
        optimistic-concurrency retry: re-reads current metadata (so the
        carried manifest list reflects any snapshot that won a race) and
        commits base+1 exclusively."""
        meta = self._load_current()
        if _expected_parent is not _UNCHECKED:
            cur_check = meta.get("current-snapshot-id")
            cur_check = None if cur_check in (None, -1) else cur_check
            if cur_check != _expected_parent:
                raise RewriteConflict(
                    f"table advanced to snapshot {cur_check} since this "
                    f"rewrite was planned against {_expected_parent} — "
                    "re-run the operation on fresh state"
                )
        seq = _next_sequence(meta)
        self._assign_first_row_ids(meta, entries, manifest_path)
        # entries carried verbatim (rewrites, COW survivors) keep explicit
        # older sequence numbers; the manifest's min reflects them
        min_seq = min(
            [e.get("sequence_number") for e in entries if e.get("sequence_number") is not None]
            + [seq]
        )
        # An append snapshot's manifest list = all previous live manifests
        # + the new one (Iceberg spec: the list is the complete snapshot).
        # A STAGED BRANCH append bases on the BRANCH HEAD, not main, so a
        # branch accumulates commits like Spark-Iceberg's branch writes
        # (second staged append no longer silently drops the first).
        carried = []
        prev_id = meta.get("current-snapshot-id")
        if _stage_branch is not None:
            ref = meta.get("refs", {}).get(_stage_branch)
            if ref is not None:
                if ref.get("type") != "branch":
                    raise ValueError(
                        f"ref {_stage_branch!r} is a tag, not a branch"
                    )
                prev_id = int(ref["snapshot-id"])
        if not _carry:
            prev_id = None
        if prev_id not in (None, -1):
            prev_snap = next(
                s for s in meta["snapshots"] if s["snapshot-id"] == prev_id
            )
            from datafusion_iceberg_spark.iceberg.manifests import (
                read_manifest_list,
            )

            for mf in read_manifest_list(prev_snap["manifest-list"]):
                carried.append(_carry_manifest_row(mf))
        extra_rows = [
            {
                **row,
                "sequence_number": seq
                if row.get("sequence_number") is None
                else row["sequence_number"],
                "min_sequence_number": seq
                if row.get("min_sequence_number") is None
                else row["min_sequence_number"],
            }
            for row in _extra_manifest_rows or []
        ]
        write_avro_file(
            manifest_list_path,
            _MANIFEST_LIST_SCHEMA,
            carried
            + [
                {
                    "manifest_path": manifest_path,
                    "manifest_length": os.path.getsize(manifest_path),
                    "partition_spec_id": self.spec_id,
                    "sequence_number": seq,
                    "min_sequence_number": min_seq,
                    "added_snapshot_id": snap_id,
                    "added_data_files_count": len(entries),
                    "existing_data_files_count": 0,
                    "deleted_data_files_count": 0,
                    "partitions": summaries,
                    "added_rows_count": total_rows,  # rows, not file count
                    "existing_rows_count": 0,
                    "deleted_rows_count": 0,
                    "content": 0,
                }
            ]
            + extra_rows,
        )
        now = int(time.time() * 1000)
        prev_total = 0
        prev_files = 0
        base_snap = next(
            (s for s in meta.get("snapshots", []) if s["snapshot-id"] == prev_id),
            None,
        )
        if _carry and base_snap is not None:
            prev_total = int(base_snap["summary"].get("total-records", 0))
            prev_files = int(base_snap["summary"].get("total-data-files", 0))
        parent_id = prev_id if _carry else meta.get("current-snapshot-id")
        snapshot = {
            "snapshot-id": snap_id,
            "sequence-number": seq,
            # -1 is the spec sentinel for "no current snapshot" — a first
            # append has no parent, so don't record the sentinel as one
            "parent-snapshot-id": None if parent_id in (None, -1) else parent_id,
            "timestamp-ms": now,
            "summary": {
                "operation": _operation,
                "added-data-files": str(len(entries)),
                "added-records": str(total_rows),
                "total-records": str(prev_total + total_rows),
                "total-data-files": str(len(entries) + prev_files),
                **(_extra_summary or {}),
            },
            "manifest-list": manifest_list_path,
            "schema-id": 0,
        }
        meta["snapshots"] = meta.get("snapshots", []) + [snapshot]
        if _staged_only:
            # wap.id staging (Spark-Iceberg spark.wap.id parity): the
            # snapshot exists in the list for a later publish_changes /
            # cherrypick, but neither main nor any ref moves
            pass
        elif _stage_branch is None:
            meta["current-snapshot-id"] = snap_id
            meta["snapshot-log"] = meta.get("snapshot-log", []) + [
                {"timestamp-ms": now, "snapshot-id": snap_id}
            ]
        else:
            # write-audit-publish: snapshot exists (and is ref-pinned
            # against expiry) but main does not move until fast_forward
            if _stage_branch == "main":
                raise ValueError("'main' cannot be a staging branch")
            meta.setdefault("refs", {})[_stage_branch] = {
                "snapshot-id": snap_id,
                "type": "branch",
            }
        meta["last-sequence-number"] = seq
        meta["last-updated-ms"] = now
        self._commit_metadata(meta)
        return snap_id

    def add_column(
        self, name: str, dtype: T.DataType, default=None
    ) -> int:
        """ADD COLUMN schema evolution: commit a new schema version whose
        field list is the current schema plus one optional column at the
        end.  Existing data files lack the column; the scan reads with the
        current schema, so old rows surface as NULL — or as ``default``
        when given (Iceberg v3 DEFAULT VALUES: the ``initial-default``
        is fixed at ALTER time and applies ONLY to files written before
        the column existed; rows written afterwards keep their stored
        values, including explicit NULLs).  No rewrite, no downtime (the
        metadata commit IS the migration).  Returns the new field id.
        (RENAME and DROP live in :meth:`rename_column` /
        :meth:`drop_column`; scans resolve columns by PARQUET:field_id,
        so all three evolutions are metadata-only.)  A dotted ``name``
        (``s.z``) adds a NESTED struct field via
        :meth:`add_nested_field`."""
        if "." in name:
            if default is not None:
                raise NotImplementedError(
                    "DEFAULT on a nested field add is not supported"
                )
            return self.add_nested_field(name, dtype)
        if name in self.field_ids:
            raise ValueError(f"column already exists: {name}")
        meta = self._load_current()
        new_id = int(meta["last-column-id"]) + 1
        # nested types allocate element/key/value/subfield ids after the
        # column's own id
        counter = iter(range(new_id + 1, 1 << 30))
        new_type = spark_type_to_iceberg(dtype, lambda: next(counter))
        consumed_last = next(counter) - 1
        cur_id = meta.get("current-schema-id", 0)
        cur = next(
            s for s in meta["schemas"] if s.get("schema-id", 0) == cur_id
        )
        new_schema = {
            "type": "struct",
            "schema-id": max(s.get("schema-id", 0) for s in meta["schemas"]) + 1,
            "fields": cur["fields"]
            + [
                {
                    "id": new_id,
                    "name": name,
                    "required": False,
                    "type": new_type,
                    **(
                        {
                            "initial-default": default,
                            "write-default": default,
                        }
                        if default is not None
                        else {}
                    ),
                }
            ],
        }
        _carry_identifier_fields(cur, new_schema)
        if default is not None and int(meta.get("format-version", 2)) < 3:
            meta["format-version"] = 3  # default values are a v3 feature
        meta["schemas"] = meta["schemas"] + [new_schema]
        meta["current-schema-id"] = new_schema["schema-id"]
        meta["schema"] = new_schema  # v1 single-schema compat
        meta["last-column-id"] = consumed_last
        meta["last-updated-ms"] = int(time.time() * 1000)
        self._commit_metadata(meta)
        # keep this writer usable for subsequent appends
        self.schema = self.schema.add(T.StructField(name, dtype, True))
        self.field_ids[name] = new_id
        self.iceberg_types[name] = new_type
        self.last_column_id = consumed_last
        return new_id

    def add_nested_field(self, path: str, dtype: T.DataType) -> int:
        """ADD a field INSIDE a struct column (``s.z``, arbitrary struct
        depth): a new schema version where the parent struct's type
        gains one optional trailing field with a fresh id — metadata
        only.  Files written before the add lack the field; scans
        request the evolved struct (top-level resolved by field id,
        nested members by name — Spark's parquet reader fills missing
        nested members with NULL, verified in tests), so old rows
        surface as NULL.  Structs inside arrays/maps are refused (their
        element schemas are positional in the vectorized reader).
        Returns the new field id."""
        parts = path.split(".")
        top, rest = parts[0], parts[1:]
        if top not in self.field_ids:
            raise ValueError(f"no such column: {top}")
        if not rest:
            raise ValueError("add_nested_field needs a dotted path")
        meta = self._load_current()
        new_id = int(meta["last-column-id"]) + 1
        counter = iter(range(new_id + 1, 1 << 30))
        new_type = spark_type_to_iceberg(dtype, lambda: next(counter))
        consumed_last = next(counter) - 1
        cur_id = meta.get("current-schema-id", 0)
        cur = next(
            s for s in meta["schemas"] if s.get("schema-id", 0) == cur_id
        )
        import copy as _copy

        new_schema = _copy.deepcopy(cur)
        new_schema["schema-id"] = (
            max(s.get("schema-id", 0) for s in meta["schemas"]) + 1
        )
        node = next(f for f in new_schema["fields"] if f["name"] == top)
        for seg in rest[:-1]:
            t = node["type"]
            if not (isinstance(t, dict) and t.get("type") == "struct"):
                raise ValueError(
                    f"{path!r}: {node['name']!r} is not a struct"
                )
            node = next(
                (f for f in t["fields"] if f["name"] == seg), None
            )
            if node is None:
                raise ValueError(f"{path!r}: no such nested field {seg!r}")
        t = node["type"]
        if not (isinstance(t, dict) and t.get("type") == "struct"):
            raise ValueError(f"{path!r}: {node['name']!r} is not a struct")
        leaf = rest[-1]
        if any(f["name"] == leaf for f in t["fields"]):
            raise ValueError(f"nested field already exists: {path}")
        t["fields"] = t["fields"] + [
            {"id": new_id, "name": leaf, "required": False, "type": new_type}
        ]
        _carry_identifier_fields(cur, new_schema)
        meta["schemas"] = meta["schemas"] + [new_schema]
        meta["current-schema-id"] = new_schema["schema-id"]
        meta["schema"] = new_schema
        meta["last-column-id"] = consumed_last
        meta["last-updated-ms"] = int(time.time() * 1000)
        self._commit_metadata(meta)
        # refresh writer state from the committed schema (top-level type
        # changed shape)
        from datafusion_iceberg_spark.iceberg.metadata import (
            iceberg_type_to_spark,
        )

        top_field = next(
            f for f in new_schema["fields"] if f["name"] == top
        )
        self.iceberg_types[top] = top_field["type"]
        self.schema = T.StructType(
            [
                T.StructField(
                    f.name,
                    iceberg_type_to_spark(top_field["type"])
                    if f.name == top
                    else f.dataType,
                    f.nullable,
                )
                for f in self.schema.fields
            ]
        )
        self.last_column_id = consumed_last
        return new_id

    def rename_column(self, old: str, new: str) -> None:
        """RENAME COLUMN evolution: a new schema version with the same
        field id under the new name — metadata-only, no file rewrite.
        Old data files keep the old parquet column name; the scan resolves
        them by PARQUET:field_id (id-keyed column mapping), so reads stay
        correct across the rename.  Renaming a partition SOURCE column is
        refused: old files' directory layout embeds the old name and the
        partition-value parser is name-keyed."""
        if old not in self.field_ids:
            raise ValueError(f"no such column: {old}")
        if new in self.field_ids:
            raise ValueError(f"column already exists: {new}")
        if any(source == old for source, _, _ in self.spec_entries):
            raise NotImplementedError(
                "renaming a partition source column is not supported"
            )
        meta = self._load_current()
        cur_id = meta.get("current-schema-id", 0)
        cur = next(
            s for s in meta["schemas"] if s.get("schema-id", 0) == cur_id
        )
        new_schema = {
            "type": "struct",
            "schema-id": max(s.get("schema-id", 0) for s in meta["schemas"]) + 1,
            "fields": [
                {**f, "name": new} if f["name"] == old else dict(f)
                for f in cur["fields"]
            ],
        }
        _carry_identifier_fields(cur, new_schema)
        meta["schemas"] = meta["schemas"] + [new_schema]
        meta["current-schema-id"] = new_schema["schema-id"]
        meta["schema"] = new_schema  # v1 single-schema compat
        meta["last-updated-ms"] = int(time.time() * 1000)
        self._commit_metadata(meta)
        self.schema = T.StructType(
            [
                T.StructField(new, f.dataType, f.nullable)
                if f.name == old
                else f
                for f in self.schema.fields
            ]
        )
        self.field_ids[new] = self.field_ids.pop(old)
        self.iceberg_types[new] = self.iceberg_types.pop(old)

    _WIDENINGS = {("int", "long"), ("float", "double")}

    # -- schema evolution on write (mergeSchema) ---------------------------

    def _merge_schema_enabled(self) -> bool:
        """True when the table opted into write-side schema evolution via
        the ``write.spark.accept-any-schema`` property (Spark-Iceberg's
        name for the same switch)."""
        props = self._load_current().get("properties", {}) or {}
        return str(
            props.get("write.spark.accept-any-schema", "")
        ).lower() == "true"

    @staticmethod
    def _strip_ids(t):
        """Iceberg type with every field-id key removed, for structural
        comparison (fresh allocations never match recorded ids)."""
        if isinstance(t, dict):
            return {
                k: IcebergWriter._strip_ids(v)
                for k, v in t.items()
                if k not in ("id", "element-id", "key-id", "value-id", "field-id")
            }
        if isinstance(t, list):
            return [IcebergWriter._strip_ids(x) for x in t]
        return t

    @staticmethod
    def _struct_delta(prefix, old_st, new_st, nested, conflicts) -> None:
        """Recursive struct comparison (Spark types): source fields
        missing from the table struct become nested adds; shared fields
        must match exactly or both be structs (recurse); the SOURCE
        lacking a table field is fine (parquet fills NULL).  Anything
        else is a conflict."""
        old_by = {f.name: f for f in old_st.fields}
        for f in new_st.fields:
            o = old_by.get(f.name)
            if o is None:
                nested.append((prefix + f.name, f.dataType))
            elif o.dataType == f.dataType:
                continue
            elif isinstance(o.dataType, T.StructType) and isinstance(
                f.dataType, T.StructType
            ):
                IcebergWriter._struct_delta(
                    prefix + f.name + ".",
                    o.dataType,
                    f.dataType,
                    nested,
                    conflicts,
                )
            else:
                conflicts.append((prefix + f.name, o.dataType, f.dataType))

    def _source_schema_delta(
        self, df: DataFrame
    ) -> tuple[list, list, list, list]:
        """(new_fields, widen_fields, nested_adds, conflicts) the table
        schema needs to accept ``df``.  Internal lineage/positional
        columns never count.  ``nested_adds`` are struct-member adds
        (``s.z``) applied via :meth:`add_nested_field`; ``conflicts``
        are type drifts mergeSchema cannot express — raised only when
        evolution is actually requested."""
        from datafusion_iceberg_spark.iceberg.metadata import (
            iceberg_type_to_spark,
        )

        new, widen, nested, conflicts = [], [], [], []
        for f in df.schema.fields:
            if f.name in (ROW_ID_COL, LAST_UPD_COL) or f.name.startswith(
                "_ice_"
            ):
                continue
            if f.name not in self.field_ids:
                new.append(f)
                continue
            old_t = self.iceberg_types.get(f.name)
            new_t = spark_type_to_iceberg(f.dataType, lambda: 0)
            if (
                isinstance(old_t, str)
                and isinstance(new_t, str)
                and (old_t, new_t) in self._WIDENINGS
            ):
                widen.append(f)
            elif not isinstance(old_t, str) and self._strip_ids(
                old_t
            ) != self._strip_ids(new_t):
                old_spark = iceberg_type_to_spark(old_t)
                if isinstance(old_spark, T.StructType) and isinstance(
                    f.dataType, T.StructType
                ):
                    self._struct_delta(
                        f.name + ".", old_spark, f.dataType, nested, conflicts
                    )
                else:
                    conflicts.append((f.name, old_t, new_t))
        return new, widen, nested, conflicts

    def merge_source_schema(self, df: DataFrame) -> dict:
        """Evolve the table schema to ACCEPT ``df``: source columns absent
        from the table are auto-ADDed (optional — files written before the
        column existed read as NULL), and source columns whose type is an
        Iceberg-legal promotion of the table type (int→long, float→double)
        auto-widen.  Anything else (narrowing, incompatible types, missing
        required columns) still raises downstream — evolution must never
        lose data.  Returns ``{"added": [...], "widened": [...]}``.

        The schema update commits before the data snapshot (one metadata
        version per evolution step via :meth:`add_column` /
        :meth:`widen_column` — the same path SQL ALTER uses, so REST
        catalogs ship it as an ``add-schema`` update through the commit
        protocol).  A crash between the schema commit and the data commit
        leaves only an extra optional column: harmless and idempotent on
        retry.  Reference parity anchor: the reference pins one scan schema
        (table.rs:81-87) and has no write path; the field-id-keyed column
        mapping here is what makes mid-stream adds resolve correctly
        across old and new files."""
        new, widen, nested, conflicts = self._source_schema_delta(df)
        if conflicts:
            name, old_t, new_t = conflicts[0]
            raise ValueError(
                f"mergeSchema cannot evolve column {name!r} "
                f"({old_t} -> source {new_t}): ALTER the type "
                "explicitly before writing"
            )
        for f in new:
            self.add_column(f.name, f.dataType)
        for f in widen:
            self.widen_column(f.name, f.dataType)
        for path, dtype in nested:
            self.add_nested_field(path, dtype)
        return {
            "added": [f.name for f in new] + [p for p, _ in nested],
            "widened": [f.name for f in widen],
        }

    def _maybe_merge_schema(
        self, df: DataFrame, merge_schema: Optional[bool]
    ) -> None:
        """Write-path hook: evolve-to-accept when the caller forced
        ``merge_schema=True`` or the table property opted in (checked
        only when the source actually deviates — no metadata read on the
        hot path)."""
        if merge_schema is False:
            return
        new, widen, nested, conflicts = self._source_schema_delta(df)
        if not new and not widen and not nested and not conflicts:
            return
        if merge_schema or self._merge_schema_enabled():
            if conflicts:
                name, old_t, new_t = conflicts[0]
                raise ValueError(
                    f"mergeSchema cannot evolve column {name!r} "
                    f"({old_t} -> source {new_t}): ALTER the type "
                    "explicitly before writing"
                )
            for f in new:
                self.add_column(f.name, f.dataType)
            for f in widen:
                self.widen_column(f.name, f.dataType)
            for path, dtype in nested:
                self.add_nested_field(path, dtype)

    def widen_column(self, name: str, new_type: T.DataType) -> None:
        """ALTER COLUMN TYPE widening (Iceberg-legal promotions only:
        int→long, float→double): a new schema version with the same
        field id and the wider type — metadata-only.  Old data files
        keep the narrow physical type; Spark's parquet reader widens on
        read (verified for both promotions), the DataSource reader casts
        via pyarrow, and old manifests' narrow stat bounds decode
        width-aware (stats.decode_stat) so pruning stays tight."""
        if name not in self.field_ids:
            raise ValueError(f"no such column: {name}")
        old_t = self.iceberg_types.get(name)
        new_t = spark_type_to_iceberg(new_type, lambda: 0)
        if not isinstance(new_t, str) or (old_t, new_t) not in self._WIDENINGS:
            raise ValueError(
                f"illegal type promotion {old_t} -> {new_t} for {name!r} "
                f"(allowed: {sorted(self._WIDENINGS)})"
            )
        meta = self._load_current()
        cur_id = meta.get("current-schema-id", 0)
        cur = next(
            s for s in meta["schemas"] if s.get("schema-id", 0) == cur_id
        )
        new_schema = {
            "type": "struct",
            "schema-id": max(s.get("schema-id", 0) for s in meta["schemas"]) + 1,
            "fields": [
                {**f, "type": new_t} if f["name"] == name else dict(f)
                for f in cur["fields"]
            ],
        }
        _carry_identifier_fields(cur, new_schema)
        meta["schemas"] = meta["schemas"] + [new_schema]
        meta["current-schema-id"] = new_schema["schema-id"]
        meta["schema"] = new_schema
        meta["last-updated-ms"] = int(time.time() * 1000)
        self._commit_metadata(meta)
        self.schema = T.StructType(
            [
                T.StructField(f.name, new_type, f.nullable)
                if f.name == name
                else f
                for f in self.schema.fields
            ]
        )
        self.iceberg_types[name] = new_t

    def drop_column(self, name: str) -> None:
        """DROP COLUMN evolution: a new schema version without the field —
        metadata-only.  Old data files keep the physical column; scans
        request the current schema by field id, so it is simply never
        read.  The field id is retired, never reused (last-column-id is
        monotonic), so stats maps in old manifests stay unambiguous.
        Dropping a partition source column is refused."""
        if name not in self.field_ids:
            raise ValueError(f"no such column: {name}")
        if any(source == name for source, _, _ in self.spec_entries):
            raise NotImplementedError(
                "dropping a partition source column is not supported"
            )
        if len(self.field_ids) == 1:
            raise ValueError("cannot drop the only column")
        meta = self._load_current()
        cur_id = meta.get("current-schema-id", 0)
        cur = next(
            s for s in meta["schemas"] if s.get("schema-id", 0) == cur_id
        )
        new_schema = {
            "type": "struct",
            "schema-id": max(s.get("schema-id", 0) for s in meta["schemas"]) + 1,
            "fields": [dict(f) for f in cur["fields"] if f["name"] != name],
        }
        _carry_identifier_fields(
            cur, new_schema, dropped=(self.field_ids[name],)
        )
        meta["schemas"] = meta["schemas"] + [new_schema]
        meta["current-schema-id"] = new_schema["schema-id"]
        meta["schema"] = new_schema  # v1 single-schema compat
        meta["last-updated-ms"] = int(time.time() * 1000)
        self._commit_metadata(meta)
        self.schema = T.StructType(
            [f for f in self.schema.fields if f.name != name]
        )
        self.field_ids.pop(name)
        self.iceberg_types.pop(name)

    def evolve_partition_spec(self, partition_by: Optional[list[str]]) -> int:
        """Change the table's partitioning going forward (Iceberg
        partition-spec evolution): register a NEW spec with a fresh
        spec-id and fresh partition-field ids, make it the default, and
        leave every existing manifest under its original spec.  Scans
        interpret each manifest with its own spec
        (table.partition_fields_for_spec); pruning degrades conservatively
        on manifests whose spec doesn't cover the predicate.  Metadata-only
        — no data is rewritten (the point of spec evolution at 100 TB:
        re-partitioning without a 100 TB rewrite).  Returns the new
        spec-id; the writer stamps it on subsequent commits."""
        from datafusion_iceberg_spark.iceberg.transforms import parse_spec_entry

        entries = [parse_spec_entry(e) for e in (partition_by or [])]
        for source, _, _ in entries:
            if source not in self.field_ids:
                raise ValueError(f"no such column: {source}")
        meta = self._load_current()
        specs = meta.get("partition-specs") or [
            {"spec-id": 0, "fields": meta.get("partition-spec", [])}
        ]
        new_id = max(s.get("spec-id", 0) for s in specs) + 1
        last_pid = meta.get("last-partition-id", 999)
        fields = [
            {
                "name": fname,
                "transform": transform,
                "source-id": self.field_ids[source],
                "field-id": last_pid + 1 + i,
            }
            for i, (source, transform, fname) in enumerate(entries)
        ]
        meta["partition-specs"] = specs + [{"spec-id": new_id, "fields": fields}]
        meta["default-spec-id"] = new_id
        meta["last-partition-id"] = last_pid + len(fields)
        meta["partition-spec"] = fields  # v1 single-spec compat mirror
        meta["last-updated-ms"] = int(time.time() * 1000)
        self._commit_metadata(meta)
        self.spec_id = new_id
        self.spec_entries = entries
        self.partition_by = [fname for _, _, fname in entries]
        return new_id

    def rollback_to_snapshot(self, snapshot_id: int) -> int:
        """ROLLBACK: make an earlier snapshot current again (metadata-only
        — the snapshot's files still exist unless expired).  The rollback
        is itself a new entry in the snapshot log, so it is auditable and
        itself time-travelable."""
        meta = self._load_current()
        if not any(
            s["snapshot-id"] == snapshot_id for s in meta.get("snapshots", [])
        ):
            raise KeyError(f"snapshot {snapshot_id} not found (expired?)")
        now = int(time.time() * 1000)
        meta["current-snapshot-id"] = snapshot_id
        meta["last-updated-ms"] = now
        meta["snapshot-log"] = meta.get("snapshot-log", []) + [
            {"timestamp-ms": now, "snapshot-id": snapshot_id}
        ]
        self._commit_metadata(meta)
        return snapshot_id

    def compact(
        self,
        spark: SparkSession,
        target_file_bytes: int = 128 * 1024 * 1024,
    ) -> int:
        """Rewrite the table's current data files into ~target-sized files
        and commit a replace snapshot — the small-file maintenance every
        append-heavy 100 TB table needs (file count, not data size, is
        what drives scan-planning and commit cost; see module docstring).

        The rewrite is a single distributed job: scan current snapshot →
        ``repartition`` to ceil(total_bytes / target) → write; the old
        files stay on disk for time travel (snapshots are immutable), the
        new snapshot's manifest list simply stops referencing them."""
        import math

        from datafusion_iceberg_spark.iceberg.table import IcebergTable

        table = self._load_table()
        files = table.files()
        total_bytes = sum(f.file_size_in_bytes for f in files)
        n_out = max(1, math.ceil(total_bytes / target_file_bytes))
        # v3 row lineage: compaction moves every row to a new position,
        # so ids and last-updated sequences ride along materialized
        df = (
            self._lineage_scan(spark, table, files)
            if _lineage_on(table.metadata.raw)
            else table.to_df(spark)
        )
        if self.spec_entries:
            # keep partition dirs intact; spread within partitions
            # (repartition on SOURCE columns — derived ones are not in df)
            df = df.repartition(n_out, *[s for s, _, _ in self.spec_entries])
        else:
            df = df.repartition(n_out)
        return self.append(
            spark,
            df,
            _carry=False,
            _operation="replace",
            _expected_parent=table.metadata.current_snapshot_id,
        )

    def compact_binpack(
        self,
        spark: SparkSession,
        target_file_bytes: int = 128 * 1024 * 1024,
        small_ratio: float = 0.75,
    ) -> dict:
        """SELECTIVE binpack compaction: rewrite only the files below
        ``small_ratio × target`` (plus any file targeted by outstanding
        MOR deletes, whose deletes fold away exactly like
        :meth:`merge`'s rewrite); right-sized files ride along VERBATIM
        via ``_extra_entries``.  This is the routine-maintenance shape
        for a 100 TB table — :meth:`compact` rewrites everything and is
        only right after bulk ingestion.  One replace snapshot; cost is
        proportional to the small+delete-laden bytes, not the table.

        Returns the CALL-friendly summary dict; ``rewritten_files == 0``
        means the commit was skipped entirely (pure no-op)."""
        import math

        table = self._load_table()
        files = table.files()
        dead = table.files_targeted_by_deletes()
        threshold = int(target_file_bytes * small_ratio)
        cand_paths = {
            f.path
            for f in files
            if f.file_size_in_bytes < threshold
            or table.metadata.localize(f.path) in dead
        }
        candidates = [f for f in files if f.path in cand_paths]
        untouched = [f for f in files if f.path not in cand_paths]
        only_small_singleton = (
            len(candidates) < 2
            and not any(
                table.metadata.localize(f.path) in dead for f in candidates
            )
        )
        if not candidates or only_small_singleton:
            return {
                "rewritten_files": 0,
                "rewritten_bytes": 0,
                "new_files": 0,
                "kept_files": len(files),
            }
        total_bytes = sum(f.file_size_in_bytes for f in candidates)
        n_out = max(1, math.ceil(total_bytes / target_file_bytes))
        lineage = _lineage_on(table.metadata.raw)
        df = (
            self._lineage_scan(spark, table, candidates)
            if lineage
            else table._scan_files(spark, candidates, None)
        )
        if self.spec_entries:
            df = df.repartition(n_out, *[s for s, _, _ in self.spec_entries])
        else:
            df = df.repartition(n_out)
        snap = self.append(
            spark,
            df,
            _carry=False,
            _operation="replace",
            _extra_entries=untouched,
            _allow_empty=True,
            _expected_parent=table.metadata.current_snapshot_id,
        )
        new_meta = self._load_table().metadata
        n_new = sum(
            1
            for f in self._load_table().files()
            if f.path not in {x.path for x in files}
        )
        return {
            "rewritten_files": len(candidates),
            "rewritten_bytes": total_bytes,
            "new_files": n_new,
            "kept_files": len(untouched),
            "snapshot_id": new_meta.current_snapshot_id
            if new_meta.current_snapshot_id != -1
            else snap,
        }


    def compute_partition_stats(self) -> dict:
        """Iceberg PARTITION STATISTICS file (spec ``partition-statistics``
        field): one parquet row per partition of the CURRENT snapshot
        with data/delete record+file counts, written under ``metadata/``
        and registered in the table metadata (replacing any earlier
        entry for the same snapshot).  A planner or ``SHOW PARTITIONS``
        can then answer from one small parquet instead of a manifest
        walk.  Representation note: partition values are flattened into
        one column per partition field (like the ``$partitions`` table)
        rather than the spec's nested unified-partition struct — our
        reader and the spec's counters are otherwise aligned.  The walk
        is driver-side: partition count is metadata-scale."""
        import pyarrow as pa
        import pyarrow.parquet as papq

        from datafusion_iceberg_spark.iceberg.table import IcebergTable

        table = self._load_table()
        meta = table.metadata
        snap_id = meta.raw.get("current-snapshot-id")
        if snap_id in (None, -1):
            raise ValueError("compute_partition_stats: table has no snapshot")
        part_cols = [fname for _s, _t, fname in self.spec_entries]

        def key(partition: dict) -> tuple:
            return tuple(partition.get(c) for c in part_cols)

        agg: dict[tuple, dict] = {}

        def row(k: tuple) -> dict:
            return agg.setdefault(
                k,
                {
                    "data_record_count": 0,
                    "data_file_count": 0,
                    "total_data_file_size_in_bytes": 0,
                    "position_delete_record_count": 0,
                    "position_delete_file_count": 0,
                    "equality_delete_record_count": 0,
                    "equality_delete_file_count": 0,
                },
            )

        for f in table.files():
            r = row(key(f.partition))
            r["data_record_count"] += int(f.record_count or 0)
            r["data_file_count"] += 1
            r["total_data_file_size_in_bytes"] += int(
                f.file_size_in_bytes or 0
            )
        dv_seen = set()
        part_by_path = {
            meta.localize(f.path): f.partition for f in table.files()
        }
        for d in table.position_delete_files():
            if d.referenced_data_file is not None:
                # a DV's partition is its TARGET data file's (one map
                # built once — metadata-scale)
                tgt = meta.localize(d.referenced_data_file)
                r = row(key(part_by_path.get(tgt, {})))
                r["position_delete_record_count"] += int(d.record_count or 0)
                if (d.path, d.content_offset) not in dv_seen:
                    dv_seen.add((d.path, d.content_offset))
                    r["position_delete_file_count"] += 1
            else:
                r = row(key(d.partition))
                r["position_delete_record_count"] += int(d.record_count or 0)
                r["position_delete_file_count"] += 1
        for e in table.equality_delete_files():
            r = row(key(e.partition))
            r["equality_delete_record_count"] += int(e.record_count or 0)
            r["equality_delete_file_count"] += 1

        counters = [
            "data_record_count",
            "data_file_count",
            "total_data_file_size_in_bytes",
            "position_delete_record_count",
            "position_delete_file_count",
            "equality_delete_record_count",
            "equality_delete_file_count",
        ]
        keys = sorted(agg, key=lambda k: tuple(str(x) for x in k))
        cols: dict = {}
        for i, c in enumerate(part_cols):
            cols[c] = [k[i] for k in keys]
        cols["spec_id"] = [self.spec_id] * len(keys)
        for c in counters:
            cols[c] = pa.array(
                [agg[k][c] for k in keys], type=pa.int64()
            )
        now = int(time.time() * 1000)
        cols["last_updated_at"] = pa.array([now] * len(keys), pa.int64())
        cols["last_updated_snapshot_id"] = pa.array(
            [int(snap_id)] * len(keys), pa.int64()
        )
        meta_dir = os.path.join(self.root, "metadata")
        path = os.path.join(
            meta_dir, f"partition-stats-{snap_id}-{uuidlib.uuid4().hex}.parquet"
        )
        papq.write_table(pa.table(cols), path)
        raw = self._load_current()
        stats = [
            s
            for s in raw.get("partition-statistics", [])
            if s.get("snapshot-id") != snap_id
        ]
        stats.append(
            {
                "snapshot-id": int(snap_id),
                "statistics-path": path,
                "file-size-in-bytes": os.path.getsize(path),
            }
        )
        raw["partition-statistics"] = stats
        raw["last-updated-ms"] = now
        self._commit_metadata(raw)
        return {"partitions": len(keys), "path": path}

    # deterministic KMV NDV sketch parameters (compute_table_stats):
    # 60-bit md5-prefix hash, k = 256 minima, integer-arithmetic
    # estimator — bit-identical replayable in DuckDB (HUGEINT) and Spark
    _KMV_K = 256
    _KMV_DOMAIN = 1 << 60

    def _theta_blob(self, spark, df, col: str, snap_id: int, seq: int):
        """Spec-typed ``apache-datasketches-theta-v1`` blob for one
        column (compact ordered sketch over murmur3(seed 9001) hashes of
        the Appendix-D value bytes), or None for types outside the
        single-value serialization.  See compute_table_stats."""
        import pandas as pd

        from pyspark.sql import functions as F
        from pyspark.sql.functions import pandas_udf

        from datafusion_iceberg_spark.iceberg import theta as th
        from datafusion_iceberg_spark.iceberg.puffin import Blob

        type_name = dict(
            (f.name, f.dataType.simpleString()) for f in df.schema.fields
        )[col]
        supported = type_name in (
            "string", "int", "integer", "bigint", "double", "float",
            "boolean", "date", "timestamp", "binary",
        ) or type_name.startswith("decimal")
        if not supported:
            return None

        def _theta_h_fn(s):
            def one(v):
                if v is None or (isinstance(v, float) and v != v):
                    return None
                if type_name == "timestamp" and isinstance(
                    v, pd.Timestamp
                ):
                    b = th.single_value_bytes(int(v.value // 1000), type_name)
                else:
                    b = th.single_value_bytes(v, type_name)
                h = th.theta_hash(b)
                return h if h else None  # datasketches rejects hash 0

            return pd.Series([one(v) for v in s], dtype="Int64")

        # writer.py keeps pandas out of module scope, so declare the
        # UDF eval type explicitly instead of via pd.Series type hints
        _theta_h = pandas_udf(_theta_h_fn, "long", F.PandasUDFType.SCALAR)

        # DISTINCT the VALUES first (one shuffle) so the pure-Python
        # murmur runs once per distinct value, then keep the k smallest
        # hashes (TakeOrdered — no full sort)
        hashes = [
            r.h
            for r in df.where(F.col(col).isNotNull())
            .select(F.col(col).alias("v"))
            .distinct()
            .select(_theta_h(F.col("v")).alias("h"))
            .where(F.col("h").isNotNull())
            .distinct()
            .orderBy("h")
            .limit(self._KMV_K)
            .collect()
        ]
        if len(hashes) < self._KMV_K:
            entries, theta_long = hashes, th.LONG_MAX
        else:
            entries, theta_long = hashes[:-1], hashes[-1]
        est = th.estimate(entries, theta_long)
        return Blob(
            type="apache-datasketches-theta-v1",
            data=th.serialize_compact(entries, theta_long),
            fields=[self.field_ids[col]],
            snapshot_id=snap_id,
            sequence_number=seq,
            properties={"ndv": str(int(est))},
        )

    def compute_table_stats(
        self, spark: SparkSession, columns: Optional[list] = None
    ) -> dict:
        """Iceberg TABLE STATISTICS file (spec ``statistics`` field):
        per-column NDV sketches for the CURRENT snapshot, written as a
        puffin file and registered in metadata — the planner feed real
        engines read for join sizing (Trino/Spark read the ``ndv`` blob
        property).  The reference's statistics feed stops at manifest
        row counts (``statistics.rs:8-49``).

        The sketch is KMV (k minimum values): per column, hash each
        distinct value to 60 bits (md5 prefix — deterministic across
        engines, unlike datasketches' murmur), keep the k=256 smallest,
        estimate ndv = (k-1)·2⁶⁰ // h₍k₎ in integer arithmetic so the
        estimate is bit-identical wherever it is recomputed (the DuckDB
        oracle replays the full algorithm).  Blob type ``ndv-kmv-v1``
        (payload: the minima as big-endian u64s, mergeable by
        union+re-truncate) stays the oracle-able layer.

        ALONGSIDE it (r12), each supported-type column also gets the
        SPEC blob type ``apache-datasketches-theta-v1``: a compact
        ordered theta sketch whose entries are
        murmur3_x64_128(seed 9001) hashes of the Appendix-D single-value
        bytes — the wire format and hash stream foreign engines
        (Trino/Spark datasketches readers) deserialize AND merge, not
        just the ``ndv`` property (VERDICT r11 missing #4).  Built as a
        deterministic KMV in theta space: retain the k−1 smallest
        hashes, theta = the k-th (exact mode below k distinct) — a valid
        compact sketch under the standard min-theta union rule.  The
        murmur hashing runs in an Arrow-batched pandas_udf over the
        column's DISTINCT values only (no mmh3/datasketches in the
        container — pure-Python hash, bounded by NDV, maintenance-path
        only; unsupported types just skip the theta blob).

        Scale shape: per column one DISTINCT + a TakeOrdered(k) per
        sketch family — no full sort, driver receives ≤k longs each."""
        import struct as _struct

        from pyspark.sql import functions as F

        from datafusion_iceberg_spark.iceberg.puffin import Blob, write_puffin

        table = self._load_table()
        meta_now = table.metadata
        snap_id = meta_now.raw.get("current-snapshot-id")
        if snap_id in (None, -1):
            raise ValueError("compute_table_stats: table has no snapshot")
        seq = int(meta_now.raw.get("last-sequence-number", 0))
        cols = columns or [f.name for f in self.schema.fields]
        bad = [c for c in cols if c not in self.field_ids]
        if bad:
            raise ValueError(f"compute_table_stats: unknown columns {bad}")
        df = table.to_df(spark)
        blobs, ndvs = [], {}
        for c in cols:
            minima = [
                r.h
                for r in df.where(F.col(c).isNotNull())
                .select(
                    F.conv(
                        F.substring(F.md5(F.col(c).cast("string")), 1, 15),
                        16,
                        10,
                    )
                    .cast("long")
                    .alias("h")
                )
                .distinct()
                .orderBy("h")
                .limit(self._KMV_K)
                .collect()
            ]
            if len(minima) < self._KMV_K:
                ndv = len(minima)
            else:
                ndv = (self._KMV_K - 1) * self._KMV_DOMAIN // minima[-1]
            ndvs[c] = int(ndv)
            blobs.append(
                Blob(
                    type="ndv-kmv-v1",
                    data=b"".join(_struct.pack(">Q", h) for h in minima),
                    fields=[self.field_ids[c]],
                    snapshot_id=int(snap_id),
                    sequence_number=seq,
                    properties={
                        "ndv": str(int(ndv)),
                        "k": str(self._KMV_K),
                        "hash": "md5-60bit",
                    },
                )
            )
            theta_blob = self._theta_blob(
                spark, df, c, int(snap_id), seq
            )
            if theta_blob is not None:
                blobs.append(theta_blob)
        meta_dir = os.path.join(self.root, "metadata")
        path = os.path.join(
            meta_dir, f"table-stats-{snap_id}-{uuidlib.uuid4().hex}.puffin"
        )
        written = write_puffin(path, blobs)
        size = os.path.getsize(path)
        entry = {
            "snapshot-id": int(snap_id),
            "statistics-path": path,
            "file-size-in-bytes": size,
            "file-footer-size-in-bytes": 0,
            "blob-metadata": [
                {
                    "type": b.type,
                    "snapshot-id": b.snapshot_id,
                    "sequence-number": b.sequence_number,
                    "fields": b.fields,
                    "properties": b.properties,
                }
                for b in written
            ],
        }
        raw = self._load_current()
        raw["statistics"] = [
            s
            for s in raw.get("statistics", [])
            if s.get("snapshot-id") != int(snap_id)
        ] + [entry]
        raw["last-updated-ms"] = int(time.time() * 1000)
        self._commit_metadata(raw)
        return {"statistics-path": path, "ndv": ndvs}

    def table_stats(self) -> dict:
        """Read back the registered NDV statistics for the current
        snapshot (column name → ndv), falling back through older
        snapshots' entries like engines do after commits without a
        stats refresh."""
        raw = self._load_current()
        by_snap = {
            int(s.get("snapshot-id", -1)): s
            for s in raw.get("statistics", [])
        }
        order = [int(raw.get("current-snapshot-id", -1))] + [
            s["snapshot-id"] for s in reversed(raw.get("snapshots", []))
        ]
        entry = next(
            (by_snap[s] for s in order if s in by_snap), None
        )
        if entry is None:
            return {}
        names_by_id = {v: k for k, v in self.field_ids.items()}
        out, theta_out = {}, {}
        for bm in entry.get("blob-metadata", []):
            btype = bm.get("type")
            if btype not in ("ndv-kmv-v1", "apache-datasketches-theta-v1"):
                continue
            ndv = (bm.get("properties") or {}).get("ndv")
            if ndv is None:
                continue
            tgt = out if btype == "ndv-kmv-v1" else theta_out
            for fid in bm.get("fields", []):
                name = names_by_id.get(fid)
                if name is not None:
                    tgt[name] = int(ndv)
        # spec-typed theta blobs fill columns the kmv layer doesn't
        # cover — the path a FOREIGN engine's stats file reads through
        for name, ndv in theta_out.items():
            out.setdefault(name, ndv)
        return out

    def rewrite_manifests(self) -> dict:
        """Metadata-only maintenance: collapse the current snapshot's
        data manifests into ONE and commit a replace snapshot that
        references the SAME data files.  After N small appends a scan
        plans against N manifests (N avro reads, N partition-summary
        checks); this rewrites kilobytes of metadata instead of
        :meth:`compact`'s terabytes of data — the right tool when file
        SIZES are fine but manifest COUNT has grown.  No Spark job runs:
        the whole operation is driver-side avro.

        Refuses when delete manifests are outstanding (their targets
        must stay in their own manifests — run :meth:`compact` to fold
        deletes first) and when manifests span partition specs (one
        manifest carries one spec header)."""
        from datafusion_iceberg_spark.iceberg.table import IcebergTable

        table = self._load_table()
        mans = table.manifests()
        if table.manifests(content=1):
            raise ValueError(
                "rewrite_manifests with outstanding delete manifests: "
                "compact() first to fold deletes into data files"
            )
        spec_ids = {m.partition_spec_id for m in mans}
        if len(spec_ids) > 1:
            raise ValueError(
                "manifests span partition specs (spec evolution): one "
                "manifest carries one spec — compact() instead"
            )
        # After spec evolution with NO new writes, the single surviving
        # spec can differ from the writer's default spec — rewriting
        # those entries under the default spec's field schema would
        # mismatch the entries' partition dicts (ADVICE r5).  The new
        # manifest is built from self.spec_entries, so its spec must BE
        # the default spec.
        if spec_ids and spec_ids != {self.spec_id}:
            raise ValueError(
                f"manifest partition spec {spec_ids.pop()} differs from "
                f"the table's default spec {self.spec_id} (partition-spec "
                "evolution with no post-evolution writes) — compact() "
                "rewrites the data under the default spec instead"
            )
        if len(mans) <= 1:
            return {
                "manifests_before": len(mans),
                "manifests_after": len(mans),
                "snapshot_id": None,
            }
        files = table.files()
        snap_id = int(time.time() * 1000) * 1000 + (
            int.from_bytes(os.urandom(2), "big") % 1000
        )
        meta_dir = os.path.join(self.root, "metadata")
        man_uuid = str(uuidlib.uuid4())
        manifest_path = os.path.join(meta_dir, f"{man_uuid}-m0.avro")
        part_fields = [
            {
                "name": fname,
                "avro_type": _avro_type_for(
                    self._part_result_type(source, transform)
                ),
            }
            for source, transform, fname in self.spec_entries
        ]
        entries = [
            {
                "status": 1,
                "snapshot_id": snap_id,
                # rewritten manifests reference the SAME data files: keep
                # each file's original data sequence number explicit (the
                # v2 rule for carried entries) instead of letting it
                # inherit the rewrite commit's sequence
                "sequence_number": ef.sequence_number,
                "data_file": {
                    "file_path": ef.path,
                    "file_format": ef.file_format or "PARQUET",
                    "partition": dict(ef.partition),
                    "record_count": ef.record_count,
                    "file_size_in_bytes": ef.file_size_in_bytes,
                    "block_size_in_bytes": 67108864,
                    "value_counts": [
                        {"key": k, "value": v} for k, v in ef.value_counts.items()
                    ],
                    "null_value_counts": [
                        {"key": k, "value": v}
                        for k, v in ef.null_value_counts.items()
                    ],
                    "nan_value_counts": [
                        {"key": k, "value": v}
                        for k, v in ef.nan_value_counts.items()
                    ],
                    "lower_bounds": [
                        {"key": k, "value": v} for k, v in ef.lower_bounds.items()
                    ],
                    "upper_bounds": [
                        {"key": k, "value": v} for k, v in ef.upper_bounds.items()
                    ],
                },
            }
            for ef in files
        ]
        write_avro_file(manifest_path, _manifest_schema(part_fields), entries)
        all_parts = [dict(ef.partition) for ef in files]
        summaries = []
        for source, transform, c in self.spec_entries:
            t = self._part_result_type(source, transform)
            vals = [p[c] for p in all_parts if p.get(c) is not None]
            summaries.append(
                {
                    "contains_null": any(p.get(c) is None for p in all_parts),
                    "contains_nan": False,
                    "lower_bound": encode_stat(t, min(vals)) if vals else None,
                    "upper_bound": encode_stat(t, max(vals)) if vals else None,
                }
            )
        total_rows = sum(ef.record_count for ef in files)
        manifest_list_path = os.path.join(
            meta_dir, f"snap-{snap_id}-1-{man_uuid}.avro"
        )
        for _attempt in range(5):
            try:
                snap = self._commit_append_snapshot(
                    snap_id,
                    manifest_path,
                    manifest_list_path,
                    entries,
                    summaries,
                    total_rows,
                    False,
                    "replace",
                    None,
                    table.metadata.current_snapshot_id,
                )
                return {
                    "manifests_before": len(mans),
                    "manifests_after": 1,
                    "snapshot_id": snap,
                }
            except RewriteConflict:
                raise  # stale manifest: caller must re-plan
            except CommitConflict:
                if _attempt == 4:
                    raise
                time.sleep(0.05 * (_attempt + 1))
        raise AssertionError("unreachable")

    def rewrite_zorder(
        self,
        spark: SparkSession,
        columns: list,
        target_file_bytes: int = 128 * 1024 * 1024,
    ) -> int:
        """Z-order rewrite (Iceberg's rewrite_data_files zorder strategy):
        cluster the table on the bit-interleaving of 2-4 numeric columns
        so every file's min/max bounds are tight on ALL of them — a box
        predicate then prunes files on every dimension, where a linear
        sort only helps its leading column.

        Mechanics: each column normalizes to a 16-bit rank via its
        metadata min/max (decoded from manifests, no data scan), the
        ranks bit-interleave into one long z-value (pure JVM expressions
        inside codegen), and the rewrite is repartitionByRange + in-file
        sort on z — a single range shuffle, then a replace snapshot.
        The z column never lands in the files."""
        import math

        from pyspark.sql import functions as F

        from datafusion_iceberg_spark.iceberg.table import (
            IcebergTable,
            min_max_by_field,
        )

        if not 2 <= len(columns) <= 4:
            raise ValueError("zorder needs 2-4 columns")
        table = self._load_table()
        files = table.files()
        total_bytes = sum(f.file_size_in_bytes for f in files)
        n_out = max(1, math.ceil(total_bytes / target_file_bytes))
        # v3 row lineage rides the rewrite materialized, like compact()
        df = (
            self._lineage_scan(spark, table, files)
            if _lineage_on(table.metadata.raw)
            else table.to_df(spark)
        )

        bounds = []
        for col in columns:
            lo, hi = min_max_by_field(table, col)
            if lo is None or hi is None or not isinstance(lo, (int, float)):
                raise ValueError(
                    f"zorder column {col!r} needs numeric min/max stats"
                )
            bounds.append((col, lo, hi))
        z = F.expr(zvalue_sql(bounds))
        df = (
            df.withColumn("__z", z)
            .repartitionByRange(n_out, "__z")
            .sortWithinPartitions("__z")
            .drop("__z")
        )
        # repartitionByRange+sort survives the write because append()
        # writes the dataframe as-is when no table sort order is declared
        return self.append(
            spark,
            df,
            _carry=False,
            _operation="replace",
            _expected_parent=table.metadata.current_snapshot_id,
        )

    # -- stats collection ---------------------------------------------------

    def _collect_file_stats(
        self, data_dir: str, paths: Optional[list] = None
    ) -> list[dict]:
        """Walk written parquet files (or exactly ``paths``); derive
        per-file column stats from footers (row-group min/max/null
        aggregated per file).

        Scale: below ``write.stats.distributed-threshold`` files
        (default 512) the walk is driver-side — ~0.1 ms/file on local
        storage (measured, PERF_NOTES r7), far below the write itself.
        At or above the threshold the footer reads run as ONE Spark job
        (``mapInPandas`` over the path list, executors read footers and
        return pickled stats dicts ~1 KB/file): on an object store each
        footer is a ranged GET (~20-50 ms serial), so a 10⁵-file append
        must not pay it on the driver.  Partition values still parse
        driver-side (pure string ops on the path).  Both paths produce
        byte-identical stats (tests assert it)."""
        all_paths = (
            sorted(paths)
            if paths is not None
            else sorted(
                glob.glob(
                    os.path.join(data_dir, "**", "*.parquet"), recursive=True
                )
            )
        )
        parts: dict[str, dict[str, Any]] = {}
        for path in all_paths:
            rel = os.path.relpath(path, data_dir)
            partition: dict[str, Any] = {}
            for seg in rel.split(os.sep)[:-1]:
                if "=" in seg:
                    k, v = seg.split("=", 1)
                    partition[k] = self._parse_partition_value(k, v)
            parts[path] = partition
        try:
            threshold = int(
                self._load_current()
                .get("properties", {})
                .get("write.stats.distributed-threshold", 512)
            )
        except (OSError, ValueError, FileNotFoundError):
            threshold = 512
        spark = SparkSession.getActiveSession()
        if "variant" in self.iceberg_types.values():
            # pyarrow cannot parse the VARIANT parquet logical type's
            # footer (unknown Thrift LogicalType) — stats for variant
            # tables compute as one Spark aggregation instead
            if spark is None:
                raise RuntimeError(
                    "variant-table stats need an active SparkSession"
                )
            return self._collect_file_stats_spark(spark, all_paths, parts)
        if spark is not None and len(all_paths) >= threshold:
            return self._collect_file_stats_distributed(
                spark, all_paths, parts
            )
        return [
            _stat_parquet_footer(
                p, parts[p], self.field_ids, self.iceberg_types
            )
            for p in all_paths
        ]

    def _collect_file_stats_spark(
        self,
        spark: SparkSession,
        all_paths: list[str],
        parts: dict[str, dict[str, Any]],
    ) -> list[dict]:
        """Per-file stats as ONE Spark aggregation grouped by
        ``_metadata.file_path`` — the stats path for tables whose parquet
        footers pyarrow cannot parse (VARIANT logical type).  Bounds come
        from exact per-file MIN/MAX (tighter than footer row-group
        bounds); float/double columns with any NaN emit NO bounds
        (Spark MAX sorts NaN above everything — same conservative rule
        as the footer path's NaN guard); variant/nested columns emit
        counts only."""
        from urllib.parse import unquote, urlparse

        from pyspark.sql import functions as F

        identity_parts = {
            fname
            for (_src, tr, fname) in self.spec_entries
            if tr == "identity"
        }
        file_fields = [
            f for f in self.schema.fields if f.name not in identity_parts
        ]
        file_st = T.StructType(file_fields)
        bound_cols: list[tuple[str, str]] = []
        aggs = [F.count(F.lit(1)).alias("__n")]
        for f in file_fields:
            t = self.iceberg_types.get(f.name)
            if (
                not isinstance(t, str)
                or t == "variant"
                or t in ("uuid", "time")
                or t.startswith("fixed")
            ):
                continue
            c = F.col(f.name)
            bound_cols.append((f.name, t))
            aggs += [
                F.min(c).alias(f"__min__{f.name}"),
                F.max(c).alias(f"__max__{f.name}"),
                F.sum(c.isNull().cast("long")).alias(f"__null__{f.name}"),
            ]
            if t in ("float", "double"):
                aggs.append(
                    F.sum(F.isnan(c).cast("long")).alias(f"__nan__{f.name}")
                )
        rows = (
            spark.read.schema(file_st)
            .parquet(*all_paths)
            .groupBy(F.col("_metadata.file_path").alias("__p"))
            .agg(*aggs)
            .collect()
        )
        by_path = {}
        for r in rows:
            u = urlparse(r["__p"])
            by_path[unquote(u.path)] = r
        out = []
        for path in all_paths:
            r = by_path.get(os.path.abspath(path))
            # a path absent from the aggregation is a ZERO-ROW part file
            # (unreadable files fail the read itself, loudly): emit the
            # same empty stats the footer path would
            partition = parts[path]
            n = int(r["__n"]) if r is not None else 0
            lowers: dict[int, bytes] = {}
            uppers: dict[int, bytes] = {}
            nulls: dict[int, int] = {}
            values: dict[int, int] = {}
            nans: dict[int, int] = {}
            for f in file_fields:
                t = self.iceberg_types.get(f.name)
                fid = self.field_ids.get(f.name)
                if fid is None or not isinstance(t, str):
                    continue
                values[fid] = n
            for name, t in bound_cols:
                fid = self.field_ids[name]
                nulls[fid] = int(r[f"__null__{name}"] or 0) if r else 0
                if t in ("float", "double"):
                    nans[fid] = int(r[f"__nan__{name}"] or 0) if r else 0
                    if nans[fid]:
                        continue  # NaN-bearing: no bounds (see docstring)
                if r is None:
                    continue
                lo, hi = r[f"__min__{name}"], r[f"__max__{name}"]
                enc_lo = encode_stat(t, lo)
                enc_hi = encode_stat(t, hi)
                if enc_lo is not None and enc_hi is not None:
                    lowers[fid] = enc_lo
                    uppers[fid] = enc_hi
            for k, v in partition.items():
                fid = self.field_ids.get(k)
                if fid is not None and v is not None:
                    enc = encode_stat(self.iceberg_types[k], v)
                    if enc is not None:
                        lowers.setdefault(fid, enc)
                        uppers.setdefault(fid, enc)
                    values.setdefault(fid, n)
                    nulls.setdefault(fid, 0)
            out.append(
                {
                    "path": path,
                    "partition": partition,
                    "record_count": n,
                    "file_size": os.path.getsize(path),
                    "lower_bounds": lowers,
                    "upper_bounds": uppers,
                    "null_counts": nulls,
                    "value_counts": values,
                    "nan_counts": nans,
                }
            )
        return out

    def _collect_file_stats_distributed(
        self,
        spark: SparkSession,
        all_paths: list[str],
        parts: dict[str, dict[str, Any]],
    ) -> list[dict]:
        """Footer stats as one Spark job: executors read the footers
        (and the narrow NaN-count column scans) and return pickled
        per-file stats; the driver collects only the ~1 KB dicts.  The
        collect is bounded by file count, not data size."""
        import pickle

        import pandas as pd

        field_ids = dict(self.field_ids)
        iceberg_types = dict(self.iceberg_types)
        part_by_path = {p: parts[p] for p in all_paths}

        def stat_batches(it):
            for pdf in it:
                blobs = [
                    pickle.dumps(
                        _stat_parquet_footer(
                            p, part_by_path[p], field_ids, iceberg_types
                        )
                    )
                    for p in pdf["path"]
                ]
                yield pd.DataFrame({"path": pdf["path"], "stats": blobs})

        n_slices = min(len(all_paths), 4 * (spark.sparkContext.defaultParallelism or 8))
        rows = (
            local_df(spark, [(p,) for p in all_paths], "path string")
            .repartition(n_slices)
            .mapInPandas(stat_batches, "path string, stats binary")
            .collect()
        )
        by_path = {r["path"]: pickle.loads(bytes(r["stats"])) for r in rows}
        if len(by_path) != len(all_paths):
            missing = set(all_paths) - set(by_path)
            raise RuntimeError(
                f"distributed footer stats lost {len(missing)} file(s): "
                f"{sorted(missing)[:3]}"
            )
        return [by_path[p] for p in all_paths]


    def _parse_partition_value(self, col: str, raw: str) -> Any:
        if raw == "__HIVE_DEFAULT_PARTITION__":
            return None
        t = self.iceberg_types.get(col)
        if t is None:  # derived partition column → the transform's type
            for source, transform, fname in self.spec_entries:
                if fname == col:
                    t = self._part_result_type(source, transform)
                    break
            else:
                t = "string"
        from urllib.parse import unquote

        if t in ("int", "long"):
            return int(raw)
        if t in ("float", "double"):
            return float(raw)
        if t == "boolean":
            return raw.lower() == "true"
        if t == "date":
            # manifest domain for date partition values is days-from-epoch
            # (matches the Avro {'type':'int','logicalType':'date'} field
            # and encode_stat's int branch) — NOT the ISO string, which
            # would crash the Avro int encode at commit
            from datetime import date as _date

            from datafusion_iceberg_spark.iceberg.stats import EPOCH_DATE

            return (_date.fromisoformat(unquote(raw)) - EPOCH_DATE).days
        if t.startswith("timestamp"):
            # micros-from-epoch of the wall-clock reading (Avro
            # timestamp-micros domain)
            from datetime import datetime as _dt
            from datetime import timezone as _tz

            from datafusion_iceberg_spark.iceberg.stats import EPOCH_TS

            dt = _dt.fromisoformat(unquote(raw))
            if dt.tzinfo is not None:
                dt = dt.astimezone(_tz.utc).replace(tzinfo=None)
            delta = dt - EPOCH_TS
            return (
                delta.days * 86_400 + delta.seconds
            ) * 1_000_000 + delta.microseconds

        return unquote(raw)

    def _to_manifest_domain(self, col: str, value: Any) -> Any:
        """Normalize a Python value collect()ed from a Spark partition
        expression into the manifest partition-value domain that
        ``_parse_partition_value`` produces (date→epoch days,
        timestamp→epoch micros, int/long→int, float/double→float,
        decimal/other→string) so set-intersection against manifest
        tuples is exact."""
        if value is None:
            return None
        t = self.iceberg_types.get(col)
        if t is None:
            for source, transform, fname in self.spec_entries:
                if fname == col:
                    t = self._part_result_type(source, transform)
                    break
            else:
                t = "string"
        import datetime as _datetime

        if t == "date":
            from datafusion_iceberg_spark.iceberg.stats import EPOCH_DATE

            if isinstance(value, _datetime.datetime):
                value = value.date()
            if isinstance(value, _datetime.date):
                return (value - EPOCH_DATE).days
            return int(value)
        if isinstance(t, str) and t.startswith("timestamp"):
            from datafusion_iceberg_spark.iceberg.stats import EPOCH_TS

            if isinstance(value, _datetime.datetime):
                if value.tzinfo is not None:
                    value = value.astimezone(
                        _datetime.timezone.utc
                    ).replace(tzinfo=None)
                delta = value - EPOCH_TS
                return (
                    delta.days * 86_400 + delta.seconds
                ) * 1_000_000 + delta.microseconds
            return int(value)
        if t in ("int", "long"):
            return int(value)
        if t in ("float", "double"):
            return float(value)
        if t == "boolean":
            return bool(value)
        return str(value)

    def delete(self, spark: SparkSession, pred) -> int:
        """Copy-on-write DELETE WHERE pred (pred = the pruning tuple AST,
        e.g. ``("=", "o_orderstatus", "F")``): prune to the files that MAY
        contain matches, rewrite ONLY those without the matching rows, and
        commit a snapshot whose manifest = rewritten files + untouched
        files included verbatim.  Cost scales with the matched files, not
        the table — on a partition-aligned predicate this touches one
        partition's files and nothing else.  Rows where pred is NULL are
        kept (SQL DELETE semantics).  Beyond reference parity (the
        reference is read-only, SURVEY.md §2C), like the rest of the
        write path.

        ``pred`` may also be a raw SQL boolean string (the SQL DML
        surface passes WHERE clauses through verbatim): the prunable
        subset parses back into the tuple AST via ``sql_to_pred``;
        anything richer skips pruning (all files become candidates) but
        still filters exactly."""
        from datafusion_iceberg_spark.iceberg.pruning import (
            pred_to_sql,
            sql_to_pred,
        )
        from datafusion_iceberg_spark.iceberg.table import IcebergTable
        from pyspark.sql import functions as F

        if isinstance(pred, str):
            where_sql = pred
            pred = sql_to_pred(pred)
        else:
            where_sql = pred_to_sql(pred)
        table = self._load_table()
        all_files = table.files()
        candidates = (
            table.files(filters=pred) if pred is not None else list(all_files)
        )
        cand_paths = {f.path for f in candidates}
        untouched = [f for f in all_files if f.path not in cand_paths]
        if not candidates:
            cur = table.metadata.raw.get("current-snapshot-id")
            return int(cur) if cur is not None else -1
        # fold outstanding MOR deletes into this copy-on-write rewrite:
        # the new snapshot carries no delete manifests (_carry=False), so
        # every delete-targeted file must join the rewrite set or its
        # deletes would silently un-apply on the untouched copy
        dead = table.files_targeted_by_deletes()
        if dead:
            extra = [
                f
                for f in untouched
                if table.metadata.localize(f.path) in dead
            ]
            if extra:
                candidates = list(candidates) + extra
                cand_paths |= {f.path for f in extra}
                untouched = [f for f in untouched if f.path not in cand_paths]
        # v3 row lineage: surviving rows are REWRITTEN into new files,
        # so their id and last-updated sequence must ride along
        # materialized (position-derived lineage dies with the old file)
        scanned = (
            self._lineage_scan(spark, table, candidates)
            if _lineage_on(table.metadata.raw)
            else table._scan_files(spark, candidates, None)
        )
        keep_df = scanned.filter(
            F.expr(f"NOT coalesce(({where_sql}), false)")
        )
        return self.append(
            spark,
            keep_df,
            _carry=False,
            _operation="delete",
            _extra_entries=untouched,
            _allow_empty=True,
            _expected_parent=table.metadata.current_snapshot_id,
        )

    def delete_where_mor(self, spark: SparkSession, pred) -> int:
        """Merge-on-read DELETE: instead of rewriting matched files
        (:meth:`delete`), commit a POSITION-DELETE file — parquet rows of
        (file_path, pos) — referenced by a content=1 delete manifest.
        Readers anti-join scans against it (table.position_delete_files).

        Write cost is proportional to the number of DELETED ROWS, not the
        size of the files containing them — the right trade at 100 TB for
        small/selective deletes, with compaction folding deletes back into
        data files later.  Rows where pred is NULL are kept.

        ``pred`` accepts a raw SQL boolean string like :meth:`delete`
        (prunable subset → file pruning; otherwise all files are
        candidates)."""
        from pyspark.sql import functions as F

        from datafusion_iceberg_spark.iceberg.pruning import (
            pred_to_sql,
            sql_to_pred,
        )
        from datafusion_iceberg_spark.iceberg.table import IcebergTable

        if isinstance(pred, str):
            where_sql = pred
            pred = sql_to_pred(pred)
        else:
            where_sql = pred_to_sql(pred)
        table = self._load_table()
        candidates = (
            table.files(filters=pred)
            if pred is not None
            else list(table.files())
        )
        cur = table.metadata.raw.get("current-snapshot-id")
        if not candidates:
            return int(cur) if cur is not None else -1

        scanned = table._scan_files(
            spark, candidates, None, _with_row_meta=True
        )
        matched = scanned.filter(
            F.expr(f"coalesce(({where_sql}), false)")
        ).select(
            F.regexp_replace(F.col("_ice_file"), "^file:/*", "/").alias(
                "file_path"
            ),
            F.col("_ice_pos").cast("long").alias("pos"),
        )

        snap_id = int(time.time() * 1000) * 1000 + (
            int.from_bytes(os.urandom(2), "big") % 1000
        )
        del_dir = os.path.join(self.root, "data", f"snap-{snap_id}-deletes")
        matched.write.mode("overwrite").parquet(del_dir)

        import pyarrow.parquet as pq

        del_files = []
        for p in sorted(
            glob.glob(os.path.join(del_dir, "**", "*.parquet"), recursive=True)
        ):
            n = pq.ParquetFile(p).metadata.num_rows
            if n:
                del_files.append((p, n, os.path.getsize(p)))
        if not del_files:
            shutil_rmtree = __import__("shutil").rmtree
            shutil_rmtree(del_dir, ignore_errors=True)
            return int(cur) if cur is not None else -1

        meta_dir = os.path.join(self.root, "metadata")
        man_uuid = str(uuidlib.uuid4())
        manifest_path = os.path.join(meta_dir, f"{man_uuid}-del-m0.avro")
        entries = [
            {
                "status": 1,
                "snapshot_id": snap_id,
                "data_file": {
                    "file_path": p,
                    "file_format": "PARQUET",
                    "partition": {},
                    "record_count": n,
                    "file_size_in_bytes": sz,
                    "block_size_in_bytes": 67108864,
                    "value_counts": [],
                    "null_value_counts": [],
                    "lower_bounds": [],
                    "upper_bounds": [],
                    "content": 1,  # POSITION_DELETES
                },
            }
            for p, n, sz in del_files
        ]
        write_avro_file(manifest_path, _manifest_schema([]), entries)

        n_deleted = sum(n for _, n, _ in del_files)
        # target paths: position deletes bind to FILES — if a concurrent
        # rewrite (compaction/COW) replaced one, committing would
        # silently no-op those rows; validated at commit time below
        targets = set()
        for p, _, _ in del_files:
            targets.update(
                pq.read_table(p, columns=["file_path"])
                .column("file_path")
                .to_pylist()
            )
        manifest_list_path = os.path.join(
            meta_dir, f"snap-{snap_id}-1-{man_uuid}.avro"
        )
        for _attempt in range(5):
            try:
                return self._commit_mor_delete_snapshot(
                    snap_id,
                    manifest_path,
                    manifest_list_path,
                    entries,
                    n_deleted,
                    _target_paths=targets,
                )
            except RewriteConflict:
                raise  # a target file left the table: re-plan the delete
            except CommitConflict:
                if _attempt == 4:
                    raise
                time.sleep(0.05 * (_attempt + 1))
        raise AssertionError("unreachable")

    def update_where_mor(
        self, spark: SparkSession, pred, set_exprs: dict
    ) -> int:
        """Merge-on-read UPDATE (Iceberg's ``write.update.mode =
        'merge-on-read'``): ONE atomic snapshot carrying BOTH a
        position-delete file covering the matched rows AND a data
        manifest with their transformed replacements — the row-delta
        commit shape.  Write cost is proportional to MATCHED rows, not
        to the size of the files containing them (the copy-on-write
        :meth:`update` rewrites whole candidate files).

        The matched rows are scanned ONCE with row metadata; the delete
        side keeps only (file, pos), the insert side applies the SET
        expressions.  NULL-predicate rows are untouched (SQL UPDATE
        semantics)."""
        from pyspark.sql import functions as F

        from datafusion_iceberg_spark.iceberg.pruning import (
            pred_to_sql,
            sql_to_pred,
        )
        from datafusion_iceberg_spark.iceberg.table import IcebergTable

        if isinstance(pred, str):
            where_sql = pred
            pred = sql_to_pred(pred)
        else:
            where_sql = pred_to_sql(pred)
        unknown = set(set_exprs) - {f.name for f in self.schema.fields}
        if unknown:
            raise ValueError(f"UPDATE of unknown columns: {sorted(unknown)}")
        table = self._load_table()
        candidates = (
            table.files(filters=pred)
            if pred is not None
            else list(table.files())
        )
        cur = table.metadata.raw.get("current-snapshot-id")
        if not candidates:
            return int(cur) if cur is not None else -1

        lineage = _lineage_on(table.metadata.raw)
        scanned = table._scan_files(
            spark,
            candidates,
            None,
            _with_row_meta=True,
            _extra_cols=(
                [("_row_id", T.LongType())] if lineage else None
            ),
        ).cache()
        try:
            matched = scanned.filter(
                F.expr(f"coalesce(({where_sql}), false)")
            )
            if lineage:
                # v3 row lineage: replacement rows keep their identity —
                # materialize the resolved _row_id into the new files
                matched = table.attach_row_lineage(spark, matched, candidates)
            del_rows = matched.select(
                F.regexp_replace(F.col("_ice_file"), "^file:/*", "/").alias(
                    "file_path"
                ),
                F.col("_ice_pos").cast("long").alias("pos"),
            )
            new_rows = matched.select(
                *(
                    [
                        F.expr(set_exprs[f.name]).cast(f.dataType).alias(f.name)
                        if f.name in set_exprs
                        else F.col(f.name)
                        for f in self.schema.fields
                    ]
                    + ([F.col("_row_id")] if lineage else [])
                )
            )
            return self._commit_row_delta(
                spark, del_rows, new_rows, cur, use_dv=_prefers_dv(table)
            )
        finally:
            scanned.unpersist()

    def _commit_row_delta(
        self,
        spark: SparkSession,
        del_rows: DataFrame,
        new_rows: Optional[DataFrame],
        cur,
        use_dv: bool = False,
        extra_summary: Optional[dict] = None,
    ) -> int:
        """Write + commit one atomic row-delta snapshot: the matched
        rows' deletes — a position-delete parquet, or deletion vectors
        when ``use_dv`` (write.delete.mode='deletion-vector') — and,
        when ``new_rows`` is given, the replacement/insert data files;
        all manifests in the SAME snapshot.  Shared by merge-on-read
        UPDATE and MERGE."""
        from pyspark.sql import functions as F

        if new_rows is not None:
            # CHECK constraints guard the NEW row images of MOR
            # UPDATE/MERGE/upsert too (append() guards the COW paths)
            self._enforce_check_constraints(new_rows)
        drop_paths: Optional[set] = None
        if use_dv:
            from datafusion_iceberg_spark.iceberg.table import IcebergTable

            table = self._load_table()
            prior_map = self._dv_entry_map(table)
            new_dvs = self._collect_new_dvs(del_rows, prior_map)
            if not new_dvs and new_rows is None:
                return int(cur) if cur is not None else -1
            return self._commit_dv_snapshot(
                table,
                del_rows,
                new_dvs,
                prior_map,
                cur,
                new_rows=new_rows,
                _operation="overwrite",
                extra_summary=extra_summary,
            )
        else:
            snap_id = int(time.time() * 1000) * 1000 + (
                int.from_bytes(os.urandom(2), "big") % 1000
            )
            del_dir = os.path.join(
                self.root, "data", f"snap-{snap_id}-deletes"
            )
            del_rows.write.mode("overwrite").parquet(del_dir)

            import pyarrow.parquet as pq

            del_files = []
            for p in sorted(
                glob.glob(
                    os.path.join(del_dir, "**", "*.parquet"), recursive=True
                )
            ):
                n = pq.ParquetFile(p).metadata.num_rows
                if n:
                    del_files.append((p, n, os.path.getsize(p)))
            data_stats = (
                self._write_data_files(new_rows, snap_id)
                if new_rows is not None
                else []
            )
            if not del_files and not data_stats:
                import shutil

                shutil.rmtree(del_dir, ignore_errors=True)
                return int(cur) if cur is not None else -1

            meta_dir = os.path.join(self.root, "metadata")
            man_uuid = str(uuidlib.uuid4())
            manifest_path = os.path.join(meta_dir, f"{man_uuid}-del-m0.avro")
            entries = [
                {
                    "status": 1,
                    "snapshot_id": snap_id,
                    "data_file": {
                        "file_path": p,
                        "file_format": "PARQUET",
                        "partition": {},
                        "record_count": n,
                        "file_size_in_bytes": sz,
                        "block_size_in_bytes": 67108864,
                        "value_counts": [],
                        "null_value_counts": [],
                        "lower_bounds": [],
                        "upper_bounds": [],
                        "content": 1,
                    },
                }
                for p, n, sz in del_files
            ]
            write_avro_file(manifest_path, _manifest_schema([]), entries)
            n_deleted = sum(n for _, n, _ in del_files)
            targets = set()
            for p, _, _ in del_files:
                targets.update(
                    pq.read_table(p, columns=["file_path"])
                    .column("file_path")
                    .to_pylist()
                )
        data_manifest = None
        if data_stats:
            part_fields = [
                {
                    "name": fname,
                    "avro_type": _avro_type_for(
                        self._part_result_type(source, transform)
                    ),
                }
                for source, transform, fname in self.spec_entries
            ]
            d_manifest_path = os.path.join(meta_dir, f"{man_uuid}-m0.avro")
            d_entries = [self._data_entry(snap_id, f) for f in data_stats]
            write_avro_file(
                d_manifest_path, _manifest_schema(part_fields), d_entries
            )
            data_manifest = (
                d_manifest_path,
                d_entries,
                self._partition_summaries(
                    [f["partition"] for f in data_stats]
                ),
                sum(f["record_count"] for f in data_stats),
            )

        manifest_list_path = os.path.join(
            meta_dir, f"snap-{snap_id}-1-{man_uuid}.avro"
        )
        for _attempt in range(5):
            try:
                return self._commit_mor_delete_snapshot(
                    snap_id,
                    manifest_path,
                    manifest_list_path,
                    entries,
                    n_deleted,
                    _target_paths=targets,
                    _drop_manifest_paths=drop_paths,
                    _operation="overwrite",
                    _data_manifest=data_manifest,
                    _extra_summary=extra_summary,
                )
            except RewriteConflict:
                raise
            except CommitConflict:
                if _attempt == 4:
                    raise
                time.sleep(0.05 * (_attempt + 1))
        raise AssertionError("unreachable")

    def delete_where_dv(self, spark: SparkSession, pred) -> int:
        """Merge-on-read DELETE via Iceberg v3 DELETION VECTORS: matched
        row positions are stored as one roaring bitmap PER DATA FILE in
        Puffin containers, referenced by content=1 manifest entries
        carrying (referenced_data_file, content_offset,
        content_size_in_bytes).  The v3 replacement for parquet position
        deletes: a reader applies at most ONE blob per data file with a
        single ranged read — no per-delete-file scan legs.

        Scale shape (round 7, VERDICT r6 item #2): positions are
        roaring-encoded IN EXECUTORS — ``groupBy(file).applyInPandas``
        unions each file's new positions with its prior DV blob (ranged
        read, executor-side) and ships back kilobyte-scale bitmap BYTES;
        no position list ever materializes on the driver.  A commit
        writes blobs for TOUCHED files only and carries every untouched
        DV entry forward BY REFERENCE into its existing puffin container
        (the one-DV-per-file invariant is per data file, not per
        container), so commit cost is O(matched files), independent of
        the table's accumulated delete history.  Parquet-based position
        deletes and equality deletes, if any coexist, remain in force
        untouched.
        """
        from pyspark.sql import functions as F

        from datafusion_iceberg_spark.iceberg.pruning import (
            pred_to_sql,
            sql_to_pred,
        )
        from datafusion_iceberg_spark.iceberg.table import IcebergTable

        if isinstance(pred, str):
            where_sql = pred
            pred = sql_to_pred(pred)
        else:
            where_sql = pred_to_sql(pred)
        table = self._load_table()
        meta = table.metadata
        candidates = (
            table.files(filters=pred)
            if pred is not None
            else list(table.files())
        )
        cur = meta.raw.get("current-snapshot-id")
        if not candidates:
            return int(cur) if cur is not None else -1

        scanned = table._scan_files(
            spark, candidates, None, _with_row_meta=True
        )
        del_rows = scanned.filter(
            F.expr(f"coalesce(({where_sql}), false)")
        ).select(
            F.regexp_replace(F.col("_ice_file"), "^file:/*", "/").alias(
                "file_path"
            ),
            F.col("_ice_pos").cast("long").alias("pos"),
        )
        prior_map = self._dv_entry_map(table)
        new_dvs = self._collect_new_dvs(del_rows, prior_map)
        if not new_dvs:
            # nothing NEWLY deleted (predicate matched no live rows):
            # no snapshot — a spurious DV-rewrite commit would
            # over-report added-position-deletes (ADVICE r6)
            return int(cur) if cur is not None else -1
        return self._commit_dv_snapshot(
            table, del_rows, new_dvs, prior_map, cur
        )

    @staticmethod
    def _dv_entry_map(table) -> dict:
        """Localized data-file path → (localized puffin path, offset,
        length) for every live deletion-vector entry.  Metadata-sized:
        three scalars per DV, no blob bytes."""
        meta = table.metadata
        out = {}
        for e in table.position_delete_files():
            if e.referenced_data_file is not None:
                out[meta.localize(e.referenced_data_file)] = (
                    meta.localize(e.path),
                    int(e.content_offset or 0),
                    int(e.content_size_in_bytes or 0),
                )
        return out

    @staticmethod
    def _collect_new_dvs(del_rows, prior_map: dict) -> dict:
        """Executor-side roaring encoding of matched delete positions.

        ``del_rows`` is a (file_path, pos) DataFrame; each file's group
        is one ``applyInPandas`` task that (a) reads the file's PRIOR DV
        blob — ranged read against shared storage, in the executor —
        (b) unions it with the new positions, and (c) returns the merged
        portable-roaring bitmap BYTES plus cardinalities.  The driver
        collects kilobytes per touched file, never positions (a DELETE
        matching 10⁹ rows would otherwise funnel ~8 GB of Python ints
        through the driver).  Files whose matched rows were all already
        deleted (fresh == 0) are dropped so their DV is carried forward
        untouched.  Returns {localized data path: (bitmap bytes, merged
        cardinality, fresh position count)}."""
        import pandas as pd

        prior = dict(prior_map)

        def encode(pdf: pd.DataFrame) -> pd.DataFrame:
            from datafusion_iceberg_spark.iceberg.puffin import (
                read_dv_positions,
            )
            from datafusion_iceberg_spark.iceberg.roaring import (
                serialize_u64,
            )

            fp = pdf["file_path"].iloc[0]
            new = set(int(p) for p in pdf["pos"])
            loc = prior.get(fp)
            prev = set(read_dv_positions(*loc)) if loc else set()
            fresh = len(new - prev)
            merged = new | prev
            return pd.DataFrame(
                {
                    "file_path": [fp],
                    "bitmap": [serialize_u64(sorted(merged))],
                    "cardinality": [len(merged)],
                    "fresh": [fresh],
                }
            )

        rows = (
            del_rows.groupBy("file_path")
            .applyInPandas(
                encode,
                "file_path string, bitmap binary, cardinality long, fresh long",
            )
            .collect()
        )
        return {
            r["file_path"]: (
                bytes(r["bitmap"]),
                int(r["cardinality"]),
                int(r["fresh"]),
            )
            for r in rows
            if r["fresh"]
        }

    def _commit_dv_snapshot(
        self,
        table,
        del_rows,
        new_dvs: dict,
        prior_map: dict,
        cur,
        new_rows=None,
        _operation: str = "delete",
        extra_summary: Optional[dict] = None,
    ) -> int:
        """Build-and-commit loop shared by :meth:`delete_where_dv` and
        the DV mode of the row-delta commit (MOR UPDATE / MERGE).

        The DV manifest is REBUILT inside the retry loop against
        reloaded metadata (ADVICE r6): after a CommitConflict, a
        concurrent DV commit may have landed a content=1 manifest that
        the stale build would not have dropped — two DVs would then
        reference the same data file (reads stay correct, union is
        idempotent, but statistics() double-subtracts and the v3
        one-DV-per-file invariant breaks).  If the conflicting commit
        changed any TOUCHED file's prior DV, the executor-side merge
        re-runs with the fresh prior map; otherwise only the
        carry-forward/drop set is recomputed (metadata-only)."""
        from datafusion_iceberg_spark.iceberg.table import IcebergTable

        snap_id = int(time.time() * 1000) * 1000 + (
            int.from_bytes(os.urandom(2), "big") % 1000
        )
        meta_dir = os.path.join(self.root, "metadata")
        data_stats = (
            self._write_data_files(new_rows, snap_id)
            if new_rows is not None
            else []
        )
        data_manifest = None
        if data_stats:
            part_fields = [
                {
                    "name": fname,
                    "avro_type": _avro_type_for(
                        self._part_result_type(source, transform)
                    ),
                }
                for source, transform, fname in self.spec_entries
            ]
            d_manifest_path = os.path.join(
                meta_dir, f"{uuidlib.uuid4()}-m0.avro"
            )
            d_entries = [self._data_entry(snap_id, f) for f in data_stats]
            write_avro_file(
                d_manifest_path, _manifest_schema(part_fields), d_entries
            )
            data_manifest = (
                d_manifest_path,
                d_entries,
                self._partition_summaries(
                    [f["partition"] for f in data_stats]
                ),
                sum(f["record_count"] for f in data_stats),
            )

        for _attempt in range(5):
            built = self._build_dv_manifest(table, new_dvs, snap_id)
            if built is None:
                if data_manifest is None:
                    return int(cur) if cur is not None else -1
                # insert-only row delta (e.g. MERGE with no matches):
                # empty delete manifest + the data manifest, one snapshot
                manifest_path = os.path.join(
                    meta_dir, f"{uuidlib.uuid4()}-dv-m0.avro"
                )
                write_avro_file(manifest_path, _manifest_schema([]), [])
                built = (manifest_path, [], 0, set(), set(), 0, 0, None, None)
            (
                manifest_path,
                entries,
                n_fresh,
                targets,
                drop_paths,
                n_existing,
                existing_rows,
                min_seq,
                expected_seq,
            ) = built
            manifest_list_path = os.path.join(
                meta_dir, f"snap-{snap_id}-1-{uuidlib.uuid4()}.avro"
            )
            try:
                return self._commit_mor_delete_snapshot(
                    snap_id,
                    manifest_path,
                    manifest_list_path,
                    entries,
                    n_fresh,
                    _target_paths=targets,
                    _drop_manifest_paths=drop_paths,
                    _operation=_operation,
                    _data_manifest=data_manifest,
                    _existing_entries=(n_existing, existing_rows, min_seq),
                    _expected_seq=expected_seq,
                    _extra_summary=extra_summary,
                )
            except RewriteConflict:
                raise
            except CommitConflict:
                if _attempt == 4:
                    raise
                time.sleep(0.05 * (_attempt + 1))
                table = self._load_table()
                fresh_prior = self._dv_entry_map(table)
                if any(
                    fresh_prior.get(p) != prior_map.get(p) for p in new_dvs
                ):
                    prior_map = fresh_prior
                    new_dvs = self._collect_new_dvs(del_rows, prior_map)
                    if not new_dvs and data_manifest is None:
                        cur2 = table.metadata.raw.get("current-snapshot-id")
                        return int(cur2) if cur2 is not None else -1
                else:
                    prior_map = fresh_prior
        raise AssertionError("unreachable")

    def _build_dv_manifest(self, table, new_dvs: dict, snap_id: int):
        """Write the puffin container + content=1 manifest for one DV
        commit.  ``new_dvs`` maps localized data path → (merged roaring
        bitmap bytes, merged cardinality, fresh position count), already
        unioned with the file's prior DV in executors
        (:meth:`_collect_new_dvs`).

        Blobs are written for TOUCHED files only; live DV entries of
        UNTOUCHED files are carried forward as EXISTING (status=0)
        entries referencing their ORIGINAL puffin file/offset, with
        their original sequence numbers written explicitly so the new
        manifest-list row's sequence is never inherited onto them.  The
        v3 one-DV-per-data-file invariant is per FILE — it does not
        require one container per table — so commit cost is O(touched
        files), independent of delete history.  Returns (manifest_path,
        entries, n_fresh, targets, drop_manifest_paths, n_existing,
        existing_rows, min_seq, expected_seq) or None when nothing fresh
        is deleted."""
        from datafusion_iceberg_spark.iceberg.manifests import read_manifest
        from datafusion_iceberg_spark.iceberg.puffin import (
            dv_blob_from_bitmap,
            write_puffin,
        )

        if not new_dvs:
            return None
        meta = table.metadata
        # the sequence this commit is expected to take; stamped into the
        # puffin blob footers (ADVICE r6: strict foreign readers parse
        # it) and validated at commit time against reloaded metadata
        expected_seq = _next_sequence(meta.raw)
        drop_paths: set = set()
        carried = []
        for mf in table.manifests(content=1):
            mf_entries = read_manifest(
                meta.localize(mf.path), inherit_seq=mf.sequence_number
            )
            if mf_entries and all(
                e.referenced_data_file is not None for e in mf_entries
            ):
                drop_paths.add(mf.path)
                for e in mf_entries:
                    tgt = meta.localize(e.referenced_data_file)
                    if tgt not in new_dvs:
                        carried.append(e)
            # manifests mixing DVs with parquet position-delete entries
            # (foreign writers — ours never emits them) stay in the
            # list: a touched file's re-emitted blob beside theirs
            # double-applies harmlessly (bitmap union is idempotent) and
            # rewrite_deletion_vectors restores the one-DV invariant.
        dv_dir = os.path.join(self.root, "data", f"snap-{snap_id}-dv")
        os.makedirs(dv_dir, exist_ok=True)
        puffin_path = os.path.join(dv_dir, f"{uuidlib.uuid4().hex}.puffin")
        touched = sorted(new_dvs.items())
        blobs = [
            dv_blob_from_bitmap(
                bitmap,
                fp,
                cardinality=card,
                snapshot_id=snap_id,
                sequence_number=expected_seq,
            )
            for fp, (bitmap, card, _fresh) in touched
        ]
        # write.puffin.compression-codec (opt-in): compress DV blob
        # payloads (zstd/lz4), recorded per-blob in the footer.  Note:
        # uncompressed is the spec-preferred DV form (pure ranged
        # reads); our reader and the foreign-fallback path decode
        # compressed blobs via one footer parse (puffin.py:
        # read_dv_positions), matching engines that emit them.
        codec = _puffin_codec(table.metadata.properties)
        if codec:
            for b in blobs:
                b.compression_codec = codec
        write_puffin(puffin_path, blobs)
        psize = os.path.getsize(puffin_path)
        entries = [
            {
                "status": 0,  # EXISTING: carried through by reference
                "snapshot_id": e.entry_snapshot_id,
                "sequence_number": e.sequence_number,
                "data_file": {
                    "file_path": e.path,
                    "file_format": "PUFFIN",
                    "partition": {},
                    "record_count": e.record_count,
                    "file_size_in_bytes": e.file_size_in_bytes,
                    "block_size_in_bytes": 67108864,
                    "value_counts": [],
                    "null_value_counts": [],
                    "lower_bounds": [],
                    "upper_bounds": [],
                    "content": 1,
                    "referenced_data_file": e.referenced_data_file,
                    "content_offset": e.content_offset,
                    "content_size_in_bytes": e.content_size_in_bytes,
                },
            }
            for e in carried
        ] + [
            {
                "status": 1,
                "snapshot_id": snap_id,
                "data_file": {
                    "file_path": puffin_path,
                    "file_format": "PUFFIN",
                    "partition": {},
                    "record_count": card,
                    "file_size_in_bytes": psize,
                    "block_size_in_bytes": 67108864,
                    "value_counts": [],
                    "null_value_counts": [],
                    "lower_bounds": [],
                    "upper_bounds": [],
                    "content": 1,
                    "referenced_data_file": b.properties[
                        "referenced-data-file"
                    ],
                    "content_offset": b.offset,
                    "content_size_in_bytes": b.length,
                },
            }
            for b, (fp, (bitmap, card, _fresh)) in zip(blobs, touched)
        ]
        manifest_path = os.path.join(
            self.root, "metadata", f"{uuidlib.uuid4()}-dv-m0.avro"
        )
        write_avro_file(manifest_path, _manifest_schema([]), entries)
        # fresh positions only: merged cardinalities would over-report
        # added-position-deletes on every commit after the first
        n_fresh = sum(fresh for _fp, (_b, _c, fresh) in touched)
        carried_seqs = [
            e.sequence_number for e in carried if e.sequence_number is not None
        ]
        min_seq = min([expected_seq] + carried_seqs)
        return (
            manifest_path,
            entries,
            n_fresh,
            set(new_dvs),
            drop_paths,
            len(carried),
            sum(e.record_count or 0 for e in carried),
            min_seq,
            expected_seq,
        )

    def rewrite_position_deletes(self, spark: SparkSession) -> dict:
        """Iceberg's ``rewrite_position_delete_files`` maintenance: merge
        the table's accumulated position-delete files into ONE file (and
        its manifests into one), dropping DANGLING rows whose target data
        file is no longer live.  Data files are untouched — this is the
        cheap counterpart to :meth:`compact` when delete VOLUME is fine
        but delete FILE COUNT has grown (every scan anti-joins each
        delete file; N small deletes = N extra scan legs).

        Sequence safety: the merged file commits at a NEW sequence
        number, which can only WIDEN position-delete applicability — and
        position deletes bind to exact (path, pos), so a data file added
        after the original deletes has a different path and is never
        affected.  Delete manifests that carry equality-delete entries
        are kept (only pure position manifests are replaced); any
        position rows they also held are harmlessly duplicated in the
        merged file (the anti-join is idempotent)."""
        from pyspark.sql import functions as F

        from datafusion_iceberg_spark.iceberg.manifests import read_manifest
        from datafusion_iceberg_spark.iceberg.table import IcebergTable

        table = self._load_table()
        meta = table.metadata
        # parquet-backed position deletes only: deletion vectors hold one
        # merged bitmap per data file already — their container COUNT is
        # compacted separately by :meth:`rewrite_deletion_vectors`
        pos = [
            d
            for d in table.position_delete_files()
            if d.referenced_data_file is None
        ]
        if len(pos) <= 1:
            return {
                "deletes_before": len(pos),
                "deletes_after": len(pos),
                "snapshot_id": None,
            }
        # manifests to replace: content=1 manifests whose entries are all
        # parquet position deletes (eq- and DV-bearing manifests stay)
        drop_paths = set()
        for mf in table.manifests(content=1):
            entries = read_manifest(
                meta.localize(mf.path), inherit_seq=mf.sequence_number
            )
            if all(
                e.content != 2 and e.referenced_data_file is None
                for e in entries
            ):
                drop_paths.add(mf.path)
        # live-path set as a (metadata-sized) frame, not an isin literal
        # list — a 100k-file table would otherwise inline 100k strings
        # into one expression
        live_df = local_df(spark, 
            [(meta.localize(f.path),) for f in table.files()],
            "file_path: string",
        )
        merged = (
            spark.read.parquet(*[meta.localize(d.path) for d in pos])
            .select(
                F.regexp_replace(F.col("file_path"), "^file:/*", "/").alias(
                    "file_path"
                ),
                F.col("pos").cast("long").alias("pos"),
            )
            .dropDuplicates(["file_path", "pos"])
            .join(F.broadcast(live_df), "file_path", "left_semi")  # drop dangling
            .coalesce(1)
        )
        snap_id = int(time.time() * 1000) * 1000 + (
            int.from_bytes(os.urandom(2), "big") % 1000
        )
        del_dir = os.path.join(self.root, "data", f"snap-{snap_id}-deletes")
        merged.write.mode("overwrite").parquet(del_dir)

        import pyarrow.parquet as pq

        del_files = []
        for p in sorted(
            glob.glob(os.path.join(del_dir, "**", "*.parquet"), recursive=True)
        ):
            n = pq.ParquetFile(p).metadata.num_rows
            if n:
                del_files.append((p, n, os.path.getsize(p)))
        meta_dir = os.path.join(self.root, "metadata")
        man_uuid = str(uuidlib.uuid4())
        manifest_path = os.path.join(meta_dir, f"{man_uuid}-del-m0.avro")
        entries = [
            {
                "status": 1,
                "snapshot_id": snap_id,
                "data_file": {
                    "file_path": p,
                    "file_format": "PARQUET",
                    "partition": {},
                    "record_count": n,
                    "file_size_in_bytes": sz,
                    "block_size_in_bytes": 67108864,
                    "value_counts": [],
                    "null_value_counts": [],
                    "lower_bounds": [],
                    "upper_bounds": [],
                    "content": 1,
                },
            }
            for p, n, sz in del_files
        ]
        write_avro_file(manifest_path, _manifest_schema([]), entries)
        n_rows = sum(n for _, n, _ in del_files)
        manifest_list_path = os.path.join(
            meta_dir, f"snap-{snap_id}-1-{man_uuid}.avro"
        )
        for _attempt in range(5):
            try:
                snap = self._commit_mor_delete_snapshot(
                    snap_id,
                    manifest_path,
                    manifest_list_path,
                    entries,
                    n_rows,
                    _drop_manifest_paths=drop_paths,
                    _operation="replace",
                )
                return {
                    "deletes_before": len(pos),
                    "deletes_after": len(del_files),
                    "snapshot_id": snap,
                }
            except CommitConflict:
                if _attempt == 4:
                    raise
                time.sleep(0.05 * (_attempt + 1))
        raise AssertionError("unreachable")

    def rewrite_deletion_vectors(self) -> dict:
        """Maintenance: consolidate the table's live deletion-vector
        entries — spread across one puffin container per DV commit by the
        carry-forward write path — into ONE container and one manifest.
        The DV counterpart to :meth:`rewrite_position_deletes`: reads
        stay correct without it (each data file still has exactly one
        blob), but every container is one more open+ranged-read per scan
        and one more carried manifest-list entry.

        Bitmaps are NOT decoded: each file's framed blob is copied
        byte-for-byte into the new container (a file has at most one DV
        by invariant; should a foreign mixed manifest have produced two,
        that pair is decoded and unioned).  Cost is O(total DV bytes) —
        roaring-compressed kilobytes per file — with no position
        materialization.  Dangling DVs whose target data file is no
        longer live are dropped.  Original sequence numbers are carried
        onto the rewritten entries (EXISTING status), so delete
        applicability is unchanged."""
        from datafusion_iceberg_spark.iceberg.manifests import read_manifest
        from datafusion_iceberg_spark.iceberg.puffin import (
            Blob,
            dv_blob,
            read_dv_positions,
            write_puffin,
        )
        from datafusion_iceberg_spark.iceberg.table import IcebergTable

        table = self._load_table()
        meta = table.metadata
        dv_entries = [
            d
            for d in table.position_delete_files()
            if d.referenced_data_file is not None
        ]
        containers = {meta.localize(d.path) for d in dv_entries}
        if len(containers) <= 1:
            return {
                "containers_before": len(containers),
                "containers_after": len(containers),
                "snapshot_id": None,
            }
        live = {meta.localize(f.path) for f in table.files()}
        by_target: dict = {}
        for d in dv_entries:
            if meta.localize(d.referenced_data_file) in live:
                by_target.setdefault(d.referenced_data_file, []).append(d)

        snap_id = int(time.time() * 1000) * 1000 + (
            int.from_bytes(os.urandom(2), "big") % 1000
        )
        seq = _next_sequence(meta.raw)
        dv_dir = os.path.join(self.root, "data", f"snap-{snap_id}-dv")
        os.makedirs(dv_dir, exist_ok=True)
        puffin_path = os.path.join(dv_dir, f"{uuidlib.uuid4().hex}.puffin")
        codec = _puffin_codec(meta.properties)
        blobs = []
        metas = []  # (target, record_count, entry_seq)
        for tgt in sorted(by_target):
            ds = by_target[tgt]
            if len(ds) == 1:
                d = ds[0]
                with open(meta.localize(d.path), "rb") as fh:
                    fh.seek(int(d.content_offset or 0))
                    data = fh.read(int(d.content_size_in_bytes or 0))
                raw_ok = True
                try:
                    from datafusion_iceberg_spark.iceberg.puffin import (
                        dv_positions,
                    )

                    dv_positions(data)
                except Exception:
                    # source blob was COMPRESSED (foreign writer or our
                    # own write.puffin.compression-codec): the ranged
                    # bytes aren't a frame — re-encode from positions
                    raw_ok = False
                if raw_ok and not codec:
                    blobs.append(
                        Blob(
                            type="deletion-vector-v1",
                            data=data,
                            fields=[2147483546],
                            snapshot_id=snap_id,
                            sequence_number=d.sequence_number or seq,
                            properties={
                                "referenced-data-file": tgt,
                                "cardinality": str(int(d.record_count or 0)),
                            },
                        )
                    )
                else:
                    pos = read_dv_positions(
                        meta.localize(d.path),
                        int(d.content_offset or 0),
                        int(d.content_size_in_bytes or 0),
                    )
                    blobs.append(
                        dv_blob(
                            sorted(pos),
                            tgt,
                            snapshot_id=snap_id,
                            sequence_number=d.sequence_number or seq,
                        )
                    )
                metas.append((tgt, int(d.record_count or 0), d.sequence_number))
            else:
                # foreign mixed-manifest case: two blobs for one file —
                # decode + union, keep the NEWEST sequence
                pos: set = set()
                for d in ds:
                    pos |= set(
                        read_dv_positions(
                            meta.localize(d.path),
                            int(d.content_offset or 0),
                            int(d.content_size_in_bytes or 0),
                        )
                    )
                newest = max(
                    (d.sequence_number or 0 for d in ds), default=None
                )
                blobs.append(
                    dv_blob(
                        sorted(pos),
                        tgt,
                        snapshot_id=snap_id,
                        sequence_number=newest or seq,
                    )
                )
                metas.append((tgt, len(pos), newest))
        if codec:
            for b in blobs:
                b.compression_codec = codec
        write_puffin(puffin_path, blobs)
        psize = os.path.getsize(puffin_path)
        entries = [
            {
                # EXISTING: a rewrite relocates blobs, it deletes nothing
                "status": 0,
                "snapshot_id": snap_id,
                "sequence_number": entry_seq,
                "data_file": {
                    "file_path": puffin_path,
                    "file_format": "PUFFIN",
                    "partition": {},
                    "record_count": card,
                    "file_size_in_bytes": psize,
                    "block_size_in_bytes": 67108864,
                    "value_counts": [],
                    "null_value_counts": [],
                    "lower_bounds": [],
                    "upper_bounds": [],
                    "content": 1,
                    "referenced_data_file": b.properties[
                        "referenced-data-file"
                    ],
                    "content_offset": b.offset,
                    "content_size_in_bytes": b.length,
                },
            }
            for b, (tgt, card, entry_seq) in zip(blobs, metas)
        ]
        meta_dir = os.path.join(self.root, "metadata")
        manifest_path = os.path.join(meta_dir, f"{uuidlib.uuid4()}-dv-m0.avro")
        write_avro_file(manifest_path, _manifest_schema([]), entries)
        # manifests to drop: content=1 manifests whose entries are all DVs
        drop_paths = set()
        for mf in table.manifests(content=1):
            mf_entries = read_manifest(
                meta.localize(mf.path), inherit_seq=mf.sequence_number
            )
            if mf_entries and all(
                e.referenced_data_file is not None for e in mf_entries
            ):
                drop_paths.add(mf.path)
        manifest_list_path = os.path.join(
            meta_dir, f"snap-{snap_id}-1-{uuidlib.uuid4()}.avro"
        )
        min_seq = min(
            [seq] + [s for _t, _c, s in metas if s is not None]
        )
        for _attempt in range(5):
            try:
                snap = self._commit_mor_delete_snapshot(
                    snap_id,
                    manifest_path,
                    manifest_list_path,
                    entries,
                    0,  # a rewrite adds no fresh deletes
                    _drop_manifest_paths=drop_paths,
                    _operation="replace",
                    _existing_entries=(
                        len(entries),
                        sum(c for _t, c, _s in metas),
                        min_seq,
                    ),
                )
                return {
                    "containers_before": len(containers),
                    "containers_after": 1,
                    "snapshot_id": snap,
                }
            except CommitConflict:
                if _attempt == 4:
                    raise
                time.sleep(0.05 * (_attempt + 1))
        raise AssertionError("unreachable")

    def convert_position_deletes_to_dvs(self) -> dict:
        """Iceberg v3 migration: fold ALL outstanding position-type
        deletes — parquet (file_path, pos) files AND existing deletion
        vectors — into ONE puffin container with one roaring DV per live
        target file, committed as a replace-style delete snapshot that
        drops every pure-position delete manifest.  Equality-delete
        manifests are untouched (they are key-typed, not position-typed).

        Sequence safety: each target's new DV carries the NEWEST
        sequence among its contributing deletes — position deletes bind
        to exact (path, pos) on an immutable file, so widening the
        sequence never deletes a row the originals didn't.  Dangling
        positions (target no longer live) drop.  After this commit the
        table reads like a native v3 DV table; the format-version
        upgrades one-way if it was still 2."""
        import pyarrow.parquet as papq

        from datafusion_iceberg_spark.iceberg.manifests import read_manifest
        from datafusion_iceberg_spark.iceberg.puffin import (
            dv_blob,
            read_dv_positions,
            write_puffin,
        )

        table = self._load_table()
        meta = table.metadata
        pos_files = table.position_delete_files()
        if not pos_files:
            return {"converted_files": 0, "dv_targets": 0, "snapshot_id": None}
        live = {meta.localize(f.path) for f in table.files()}
        by_target: dict[str, set] = {}
        seq_by_target: dict[str, int] = {}

        def _note(tgt_local: str, tgt_raw: str, positions, seq):
            if tgt_local not in live:
                return
            by_target.setdefault(tgt_raw, set()).update(positions)
            if seq is not None:
                seq_by_target[tgt_raw] = max(
                    seq_by_target.get(tgt_raw, 0), int(seq)
                )

        n_parquet = 0
        for d in pos_files:
            if d.referenced_data_file is not None:
                pos = read_dv_positions(
                    meta.localize(d.path),
                    int(d.content_offset or 0),
                    int(d.content_size_in_bytes or 0),
                )
                _note(
                    meta.localize(d.referenced_data_file),
                    d.referenced_data_file,
                    pos,
                    d.sequence_number,
                )
            else:
                n_parquet += 1
                t = papq.read_table(
                    meta.localize(d.path), columns=["file_path", "pos"]
                )
                paths = t["file_path"].to_pylist()
                poss = t["pos"].to_pylist()
                per: dict[str, list] = {}
                for fp, po in zip(paths, poss):
                    per.setdefault(fp, []).append(int(po))
                for fp, plist in per.items():
                    _note(meta.localize(fp), fp, plist, d.sequence_number)
        if not by_target:
            return {"converted_files": len(pos_files), "dv_targets": 0,
                    "snapshot_id": None}

        snap_id = int(time.time() * 1000) * 1000 + (
            int.from_bytes(os.urandom(2), "big") % 1000
        )
        seq = _next_sequence(meta.raw)
        dv_dir = os.path.join(self.root, "data", f"snap-{snap_id}-dv")
        os.makedirs(dv_dir, exist_ok=True)
        puffin_path = os.path.join(dv_dir, f"{uuidlib.uuid4().hex}.puffin")
        codec = _puffin_codec(meta.properties)
        blobs, metas = [], []
        for tgt in sorted(by_target):
            entry_seq = seq_by_target.get(tgt)
            blobs.append(
                dv_blob(
                    sorted(by_target[tgt]),
                    tgt,
                    snapshot_id=snap_id,
                    sequence_number=entry_seq or seq,
                )
            )
            metas.append((tgt, len(by_target[tgt]), entry_seq))
        if codec:
            for b in blobs:
                b.compression_codec = codec
        write_puffin(puffin_path, blobs)
        psize = os.path.getsize(puffin_path)
        entries = [
            {
                "status": 0,  # relocation/merge, not fresh deletes
                "snapshot_id": snap_id,
                "sequence_number": entry_seq,
                "data_file": {
                    "file_path": puffin_path,
                    "file_format": "PUFFIN",
                    "partition": {},
                    "record_count": card,
                    "file_size_in_bytes": psize,
                    "block_size_in_bytes": 67108864,
                    "value_counts": [],
                    "null_value_counts": [],
                    "lower_bounds": [],
                    "upper_bounds": [],
                    "content": 1,
                    "referenced_data_file": b.properties[
                        "referenced-data-file"
                    ],
                    "content_offset": b.offset,
                    "content_size_in_bytes": b.length,
                },
            }
            for b, (tgt, card, entry_seq) in zip(blobs, metas)
        ]
        meta_dir = os.path.join(self.root, "metadata")
        manifest_path = os.path.join(meta_dir, f"{uuidlib.uuid4()}-dv-m0.avro")
        write_avro_file(manifest_path, _manifest_schema([]), entries)
        # drop every manifest holding only POSITION-type entries
        drop_paths = set()
        for mf in table.manifests(content=1):
            mf_entries = read_manifest(
                meta.localize(mf.path), inherit_seq=mf.sequence_number
            )
            if mf_entries and all(e.content == 1 for e in mf_entries):
                drop_paths.add(mf.path)
        manifest_list_path = os.path.join(
            meta_dir, f"snap-{snap_id}-1-{uuidlib.uuid4()}.avro"
        )
        min_seq = min(
            [seq] + [s for _t, _c, s in metas if s is not None]
        )
        for _attempt in range(5):
            try:
                snap = self._commit_mor_delete_snapshot(
                    snap_id,
                    manifest_path,
                    manifest_list_path,
                    entries,
                    0,
                    _drop_manifest_paths=drop_paths,
                    _operation="replace",
                    _existing_entries=(
                        len(entries),
                        sum(c for _t, c, _s in metas),
                        min_seq,
                    ),
                )
                return {
                    "converted_files": len(pos_files),
                    "parquet_position_files": n_parquet,
                    "dv_targets": len(by_target),
                    "snapshot_id": snap,
                }
            except CommitConflict:
                if _attempt == 4:
                    raise
                time.sleep(0.05 * (_attempt + 1))
        raise AssertionError("unreachable")

    def delete_where_eq(self, spark: SparkSession, keys_df: DataFrame) -> int:
        """Merge-on-read EQUALITY DELETE (Iceberg v2 content=2): commit a
        delete file holding KEY TUPLES — the columns of ``keys_df``, which
        must be table columns — referenced by a delete manifest whose
        entries carry ``equality_ids`` (the field ids of those columns).
        Readers drop any row whose key tuple null-safe-equals a delete row
        committed after the row's data file (table.equality_delete_files +
        sequence ordinals), so re-appending a deleted key later works.

        This is the delete flavor CDC/streaming writers (Flink) emit:
        cost is proportional to the number of deleted KEYS — no scan of
        the table at all, not even of the matching rows (cheaper than
        position deletes, which must locate each row first).  The
        reference silently drops content=1 manifests, so it has neither
        flavor (VERDICT r4 item #3)."""
        bad = [c for c in keys_df.columns if c not in self.field_ids]
        if bad:
            raise ValueError(f"equality-delete keys not in table schema: {bad}")
        eq_ids = sorted(self.field_ids[c] for c in keys_df.columns)

        snap_id = int(time.time() * 1000) * 1000 + (
            int.from_bytes(os.urandom(2), "big") % 1000
        )
        del_dir = os.path.join(self.root, "data", f"snap-{snap_id}-eqdeletes")
        # distinct() both dedups keys and spreads the write across the
        # shuffle partitions — a billion-key CDC purge lands as parallel
        # files, not one task's output (empties are skipped below)
        keys_df.distinct().write.mode("overwrite").parquet(del_dir)

        import pyarrow.parquet as pq

        del_files = []
        for p in sorted(
            glob.glob(os.path.join(del_dir, "**", "*.parquet"), recursive=True)
        ):
            n = pq.ParquetFile(p).metadata.num_rows
            if n:
                lo, hi = _eq_key_bounds(p, self.field_ids, self.iceberg_types)
                del_files.append((p, n, os.path.getsize(p), lo, hi))
        cur = self._load_current().get("current-snapshot-id")
        if not del_files:
            __import__("shutil").rmtree(del_dir, ignore_errors=True)
            return int(cur) if cur is not None else -1

        meta_dir = os.path.join(self.root, "metadata")
        man_uuid = str(uuidlib.uuid4())
        manifest_path = os.path.join(meta_dir, f"{man_uuid}-eqdel-m0.avro")
        entries = [
            {
                "status": 1,
                "snapshot_id": snap_id,
                "data_file": {
                    "file_path": p,
                    "file_format": "PARQUET",
                    "partition": {},
                    "record_count": n,
                    "file_size_in_bytes": sz,
                    "block_size_in_bytes": 67108864,
                    "value_counts": [],
                    "null_value_counts": [],
                    "lower_bounds": lo,
                    "upper_bounds": hi,
                    "content": 2,  # EQUALITY_DELETES
                    "equality_ids": eq_ids,
                },
            }
            for p, n, sz, lo, hi in del_files
        ]
        write_avro_file(manifest_path, _manifest_schema([]), entries)

        n_deleted = sum(n for _, n, _, _, _ in del_files)
        manifest_list_path = os.path.join(
            meta_dir, f"snap-{snap_id}-1-{man_uuid}.avro"
        )
        for _attempt in range(5):
            try:
                return self._commit_mor_delete_snapshot(
                    snap_id,
                    manifest_path,
                    manifest_list_path,
                    entries,
                    n_deleted,
                    delete_kind="equality",
                )
            except CommitConflict:
                if _attempt == 4:
                    raise
                time.sleep(0.05 * (_attempt + 1))
        raise AssertionError("unreachable")

    def set_identifier_fields(self, columns: list) -> None:
        """Declare the schema's row-identity columns (Iceberg
        ``identifier-field-ids`` — what Flink's upsert sink keys its
        equality deletes on).  Commits a new schema version carrying the
        ids; :meth:`upsert` resolves its keys from them."""
        bad = [c for c in columns if c not in self.field_ids]
        if bad:
            raise ValueError(f"identifier fields not in schema: {bad}")
        ids = sorted(self.field_ids[c] for c in columns)
        meta = self._load_current()
        cur_id = meta.get("current-schema-id", 0)
        cur = next(
            s for s in meta["schemas"] if s.get("schema-id", 0) == cur_id
        )
        if sorted(cur.get("identifier-field-ids", [])) == ids:
            return
        new_schema = {
            **cur,
            "schema-id": max(s.get("schema-id", 0) for s in meta["schemas"])
            + 1,
            "identifier-field-ids": ids,
        }
        meta["schemas"] = meta["schemas"] + [new_schema]
        meta["current-schema-id"] = new_schema["schema-id"]
        meta["schema"] = new_schema
        meta["last-updated-ms"] = int(time.time() * 1000)
        self._commit_metadata(meta)

    def set_sort_order(self, columns: list) -> None:
        """``ALTER TABLE ... WRITE ORDERED BY`` evolution: register a new
        sort order (or reuse an identical existing one) and make it the
        default — metadata-only; data already written keeps its layout
        and SUBSEQUENT appends sort by the new order, so file-level
        min/max bounds turn range filters into file pruning (the same
        effect :meth:`rewrite_sorted` gives retroactively).  An empty
        column list reverts to unsorted (order 0)."""
        bad = [c for c in columns if c not in self.field_ids]
        if bad:
            raise ValueError(f"sort columns not in schema: {bad}")
        meta = self._load_current()
        orders = list(meta.get("sort-orders", []))
        if not columns:
            if not any(o.get("order-id", 0) == 0 for o in orders):
                orders.append({"order-id": 0, "fields": []})
            target = 0
        else:
            fields = [
                {
                    "transform": "identity",
                    "source-id": self.field_ids[c],
                    "direction": "asc",
                    "null-order": "nulls-first",
                }
                for c in columns
            ]
            match = next(
                (o for o in orders if o.get("fields") == fields), None
            )
            if match is not None:
                target = match.get("order-id", 0)
            else:
                target = max(
                    (o.get("order-id", 0) for o in orders), default=0
                ) + 1
                orders.append({"order-id": target, "fields": fields})
        if meta.get("default-sort-order-id", 0) != target or orders != meta.get(
            "sort-orders", []
        ):
            meta["sort-orders"] = orders
            meta["default-sort-order-id"] = target
            meta["last-updated-ms"] = int(time.time() * 1000)
            self._commit_metadata(meta)
        self.sort_by = list(columns)

    def identifier_columns(self) -> list:
        """The schema's declared identity columns (empty if unset)."""
        meta = self._load_current()
        cur_id = meta.get("current-schema-id", 0)
        cur = next(
            s for s in meta["schemas"] if s.get("schema-id", 0) == cur_id
        )
        by_id = {f["id"]: f["name"] for f in cur["fields"]}
        return [by_id[i] for i in cur.get("identifier-field-ids", [])]

    def upsert(
        self,
        spark: SparkSession,
        df: DataFrame,
        on: Optional[list] = None,
        merge_schema: Optional[bool] = None,
    ) -> int:
        """Flink-style UPSERT: ONE snapshot carrying an equality-delete
        file on the key columns PLUS the batch's data files.  Keys come
        from ``on`` or the schema's identifier-field-ids
        (:meth:`set_identifier_fields`).  Last-wins per key against the
        prior table state: the delete and the new data share the
        commit's sequence number, and equality deletes apply only to
        data committed STRICTLY before (``_apply_equality_deletes``), so
        the batch's own rows survive.  Cost is O(batch): no scan, no
        rewrite of existing files — the delete flavor Flink CDC sinks
        emit per checkpoint.  Later upserts shadow earlier ones the same
        way (higher sequence).  ``merge_schema`` as in :meth:`append`
        (a key column that auto-adds is legal but matches nothing —
        pre-existing rows hold NULL in it, so the batch is pure insert)."""
        self._maybe_merge_schema(df, merge_schema)
        keys = list(on) if on else self.identifier_columns()
        if not keys:
            raise ValueError(
                "upsert needs key columns: pass on=[...] or declare them "
                "with set_identifier_fields"
            )
        bad = [c for c in keys if c not in self.field_ids]
        if bad:
            raise ValueError(f"upsert keys not in schema: {bad}")
        from pyspark.sql import functions as F
        from functools import reduce as _reduce

        keys_nn = _reduce(
            lambda a, b: a & b, [F.col(k).isNotNull() for k in keys]
        )
        bounds = df.filter(keys_nn).agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct(*keys).alias("nd"),
        ).collect()[0]
        if bounds.n != bounds.nd:
            raise ValueError(
                f"upsert batch has duplicate keys on {keys!r}: "
                f"{bounds.n} rows, {bounds.nd} distinct — keep the latest "
                "row per key before upserting"
            )
        eq_ids = sorted(self.field_ids[c] for c in keys)
        snap_id = int(time.time() * 1000) * 1000 + (
            int.from_bytes(os.urandom(2), "big") % 1000
        )
        files = self._write_data_files(df, snap_id)
        # the equality-delete side: just the key tuples, distinct
        del_dir = os.path.join(self.root, "data", f"snap-{snap_id}-eqdeletes")
        df.select(*keys).distinct().write.mode("overwrite").parquet(del_dir)
        import pyarrow.parquet as _pq

        del_files = []
        for p in sorted(
            glob.glob(os.path.join(del_dir, "**", "*.parquet"), recursive=True)
        ):
            n = _pq.ParquetFile(p).metadata.num_rows
            if n:
                lo, hi = _eq_key_bounds(p, self.field_ids, self.iceberg_types)
                del_files.append((p, n, os.path.getsize(p), lo, hi))
        extra_rows = []
        n_keys = sum(n for _, n, _, _, _ in del_files)
        if del_files:
            meta_dir = os.path.join(self.root, "metadata")
            man_uuid = str(uuidlib.uuid4())
            del_manifest = os.path.join(meta_dir, f"{man_uuid}-upsert-del.avro")
            del_entries = [
                {
                    "status": 1,
                    "snapshot_id": snap_id,
                    "data_file": {
                        "file_path": p,
                        "file_format": "PARQUET",
                        "partition": {},
                        "record_count": n,
                        "file_size_in_bytes": sz,
                        "block_size_in_bytes": 67108864,
                        "value_counts": [],
                        "null_value_counts": [],
                        "lower_bounds": lo,
                        "upper_bounds": hi,
                        "content": 2,  # EQUALITY_DELETES
                        "equality_ids": eq_ids,
                    },
                }
                for p, n, sz, lo, hi in del_files
            ]
            write_avro_file(del_manifest, _manifest_schema([]), del_entries)
            extra_rows.append(
                {
                    "manifest_path": del_manifest,
                    "manifest_length": os.path.getsize(del_manifest),
                    "partition_spec_id": self.spec_id,
                    "sequence_number": None,  # takes the commit's sequence
                    "min_sequence_number": None,
                    "added_snapshot_id": snap_id,
                    "added_data_files_count": len(del_entries),
                    "existing_data_files_count": 0,
                    "deleted_data_files_count": 0,
                    "partitions": [],
                    "added_rows_count": n_keys,
                    "existing_rows_count": 0,
                    "deleted_rows_count": 0,
                    "content": 1,  # delete manifest
                }
            )
        return self._commit_file_stats(
            snap_id,
            files,
            _operation="overwrite",
            _extra_summary={
                "added-delete-files": str(len(del_files)),
                "added-equality-deletes": str(n_keys),
            },
            _extra_manifest_rows=extra_rows,
        )

    def _commit_mor_delete_snapshot(
        self,
        snap_id: int,
        manifest_path: str,
        manifest_list_path: str,
        entries: list,
        n_deleted: int,
        delete_kind: str = "position",
        _target_paths: Optional[set] = None,
        _drop_manifest_paths: Optional[set] = None,
        _operation: str = "delete",
        _data_manifest: Optional[tuple] = None,
        _existing_entries: Optional[tuple] = None,
        _expected_seq: Optional[int] = None,
        _extra_summary: Optional[dict] = None,
    ) -> int:
        """Read-validate-commit section of delete_where_mor /
        delete_where_eq, re-entrant for the optimistic-concurrency
        retry.  For position deletes, validates that every TARGETED data
        file is still live (a concurrent rewrite that replaced one would
        make the delete silently no-op — Iceberg's RowDelta
        validateDataFilesExist); equality deletes bind by VALUE with
        ordinal sequencing, so concurrent appends/rewrites stay
        correct without this check.  ``_drop_manifest_paths`` omits
        those manifests from the carried list — how
        rewrite_position_deletes replaces the old delete manifests.
        ``_data_manifest`` = (manifest_path, n_entries, summaries,
        total_rows): an ADDITIONAL data manifest committed in the SAME
        snapshot — the row-delta shape merge-on-read UPDATE needs
        (deletes of the old rows + appends of the new rows, one atomic
        commit)."""
        meta = self._load_current()
        if _expected_seq is not None and _next_sequence(meta) != _expected_seq:
            # the DV manifest was built (and its blob footers stamped)
            # against older metadata: a commit landed between build and
            # commit, so its carry-forward/drop set may be stale —
            # surface as a conflict so the caller rebuilds (ADVICE r6)
            raise CommitConflict(
                f"{self.root}: sequence advanced past {_expected_seq} "
                "between DV build and commit"
            )
        if _target_paths:
            from datafusion_iceberg_spark.iceberg.metadata import TableMetadata

            tm = TableMetadata(meta, self.root, meta.get("location", self.root))
            live = set()
            cur_id = meta.get("current-snapshot-id")
            if cur_id not in (None, -1):
                from datafusion_iceberg_spark.iceberg.manifests import (
                    read_manifest,
                    read_manifest_list,
                )

                snap = next(
                    s
                    for s in meta["snapshots"]
                    if s["snapshot-id"] == cur_id
                )
                for mf in read_manifest_list(
                    tm.localize(snap["manifest-list"])
                ):
                    if mf.content == 0:
                        for f in read_manifest(tm.localize(mf.path)):
                            live.add(tm.localize(f.path))
            gone = {
                t for t in _target_paths if tm.localize(t) not in live
            }
            if gone:
                raise RewriteConflict(
                    f"position-delete targets {sorted(gone)[:3]}... are no "
                    "longer live (concurrent rewrite) — re-run the delete"
                )
        cur = meta.get("current-snapshot-id")
        carried = []
        if cur not in (None, -1):
            from datafusion_iceberg_spark.iceberg.manifests import (
                read_manifest_list,
            )

            prev_snap = next(
                s for s in meta["snapshots"] if s["snapshot-id"] == cur
            )
            for mf in read_manifest_list(prev_snap["manifest-list"]):
                if _drop_manifest_paths and mf.path in _drop_manifest_paths:
                    continue
                carried.append(_carry_manifest_row(mf))
        seq = _next_sequence(meta)
        n_existing, existing_rows, min_seq = _existing_entries or (0, 0, None)
        n_added = len(entries) - n_existing
        # added_rows_count = delete rows in ADDED files (merged blob
        # cardinalities for DVs — always summed from status=1 entries so
        # the manifest-list row matches its own manifest even when every
        # previously-DV'd file is touched and nothing is carried); the
        # snapshot SUMMARY separately reports only the FRESH position
        # count (n_deleted)
        added_rows = sum(
            e["data_file"].get("record_count", 0)
            for e in entries
            if e.get("status", 1) == 1
        )
        new_rows = [
            {
                "manifest_path": manifest_path,
                "manifest_length": os.path.getsize(manifest_path),
                "partition_spec_id": self.spec_id,
                "sequence_number": seq,
                "min_sequence_number": seq if min_seq is None else min(min_seq, seq),
                "added_snapshot_id": snap_id,
                "added_data_files_count": n_added,
                "existing_data_files_count": n_existing,
                "deleted_data_files_count": 0,
                "partitions": None,
                "added_rows_count": added_rows,
                "existing_rows_count": existing_rows,
                "deleted_rows_count": 0,
                "content": 1,
            }
        ]
        if _data_manifest is not None:
            d_path, d_entry_list, d_summaries, d_rows = _data_manifest
            self._assign_first_row_ids(meta, d_entry_list, d_path)
            d_entries = len(d_entry_list)
            new_rows.append(
                {
                    "manifest_path": d_path,
                    "manifest_length": os.path.getsize(d_path),
                    "partition_spec_id": self.spec_id,
                    "sequence_number": seq,
                    "min_sequence_number": seq,
                    "added_snapshot_id": snap_id,
                    "added_data_files_count": d_entries,
                    "existing_data_files_count": 0,
                    "deleted_data_files_count": 0,
                    "partitions": d_summaries or None,
                    "added_rows_count": d_rows,
                    "existing_rows_count": 0,
                    "deleted_rows_count": 0,
                    "content": 0,
                }
            )
        if any(
            e.get("data_file", {}).get("referenced_data_file") is not None
            for e in entries
        ) and int(meta.get("format-version", 2)) < 3:
            # deletion vectors are a v3 feature: one-way format upgrade
            meta["format-version"] = 3
        write_avro_file(
            manifest_list_path, _MANIFEST_LIST_SCHEMA, carried + new_rows
        )
        now = int(time.time() * 1000)
        prev_total = 0
        prev_files = 0
        cur_id = meta.get("current-snapshot-id")
        cur_snap = next(
            (s for s in meta.get("snapshots", []) if s["snapshot-id"] == cur_id),
            None,
        )
        if cur_snap is not None:
            prev_total = int(cur_snap["summary"].get("total-records", 0))
            prev_files = int(cur_snap["summary"].get("total-data-files", 0))
        extra_sum = {}
        if _data_manifest is not None:
            d_path, d_entry_list, d_summaries, d_rows = _data_manifest
            d_entries = len(d_entry_list)
            extra_sum = {
                "added-data-files": str(d_entries),
                "added-records": str(d_rows),
            }
            prev_total += d_rows
            prev_files += d_entries
        snapshot = {
            "snapshot-id": snap_id,
            "sequence-number": seq,
            "parent-snapshot-id": None if cur_id in (None, -1) else cur_id,
            "timestamp-ms": now,
            "summary": {
                "operation": _operation,
                "added-delete-files": str(len(entries)),
                f"added-{delete_kind}-deletes": str(n_deleted),
                "total-records": str(prev_total),
                "total-data-files": str(prev_files),
                **extra_sum,
                **(_extra_summary or {}),
            },
            "manifest-list": manifest_list_path,
            "schema-id": 0,
        }
        meta["snapshots"] = meta.get("snapshots", []) + [snapshot]
        meta["current-snapshot-id"] = snap_id
        meta["last-sequence-number"] = seq
        meta["last-updated-ms"] = now
        meta["snapshot-log"] = meta.get("snapshot-log", []) + [
            {"timestamp-ms": now, "snapshot-id": snap_id}
        ]
        self._commit_metadata(meta)
        return snap_id

    def update(self, spark: SparkSession, pred, set_exprs: dict[str, str]) -> int:
        """Copy-on-write UPDATE ... SET col = sql_expr WHERE pred: same
        surgical file rewrite as :meth:`delete`, but matched rows are
        transformed instead of dropped (CASE WHEN pred THEN expr ELSE col
        END per assigned column).  NULL-predicate rows are left unchanged,
        matching SQL UPDATE semantics.

        ``pred`` accepts a raw SQL boolean string like :meth:`delete`
        (prunable subset → file pruning; otherwise all files rewrite as
        candidates)."""
        from datafusion_iceberg_spark.iceberg.pruning import (
            pred_to_sql,
            sql_to_pred,
        )
        from datafusion_iceberg_spark.iceberg.table import IcebergTable
        from pyspark.sql import functions as F

        unknown = set(set_exprs) - {f.name for f in self.schema.fields}
        if unknown:
            raise ValueError(f"UPDATE of unknown columns: {sorted(unknown)}")
        if isinstance(pred, str):
            where_sql = pred
            pred = sql_to_pred(pred)
        else:
            where_sql = pred_to_sql(pred)
        table = self._load_table()
        all_files = table.files()
        candidates = (
            table.files(filters=pred) if pred is not None else list(all_files)
        )
        cand_paths = {f.path for f in candidates}
        untouched = [f for f in all_files if f.path not in cand_paths]
        if not candidates:
            cur = table.metadata.raw.get("current-snapshot-id")
            return int(cur) if cur is not None else -1
        # fold outstanding MOR deletes into this copy-on-write rewrite:
        # the new snapshot carries no delete manifests (_carry=False), so
        # every delete-targeted file must join the rewrite set or its
        # deletes would silently un-apply on the untouched copy
        dead = table.files_targeted_by_deletes()
        if dead:
            extra = [
                f
                for f in untouched
                if table.metadata.localize(f.path) in dead
            ]
            if extra:
                candidates = list(candidates) + extra
                cand_paths |= {f.path for f in extra}
                untouched = [f for f in untouched if f.path not in cand_paths]
        match = f"coalesce(({where_sql}), false)"
        lineage = _lineage_on(table.metadata.raw)
        scanned = (
            self._lineage_scan(spark, table, candidates)
            if lineage
            else table._scan_files(spark, candidates, None)
        )
        dtypes = dict(scanned.dtypes)
        # ONE select evaluating every CASE against the ORIGINAL row: the
        # predicate and all SET expressions must see old column values
        # (SQL UPDATE semantics) — sequential withColumn would re-evaluate
        # both against already-assigned columns.  Under row lineage the
        # rewritten survivors keep id AND last-updated; genuinely UPDATED
        # rows keep their id but write a null last-updated (the reader
        # then takes this commit's sequence — the row WAS updated now).
        updated = scanned.select(
            *[
                (
                    F.expr(
                        f"CASE WHEN {match} THEN ({set_exprs[c]}) ELSE {c} END"
                    )
                    .cast(dtypes[c])
                    .alias(c)
                    if c in set_exprs
                    else (
                        F.expr(
                            f"CASE WHEN {match} THEN CAST(NULL AS BIGINT)"
                            f" ELSE {LAST_UPD_COL} END"
                        ).alias(LAST_UPD_COL)
                        if lineage and c == LAST_UPD_COL
                        else F.col(c)
                    )
                )
                for c in scanned.columns
            ]
        )
        return self.append(
            spark,
            updated,
            _carry=False,
            _operation="overwrite",
            _extra_entries=untouched,
            _allow_empty=True,
            _expected_parent=table.metadata.current_snapshot_id,
        )

    def overwrite(self, spark: SparkSession, df: DataFrame) -> int:
        """INSERT OVERWRITE: one atomic snapshot whose manifests contain
        ONLY the new files — the previous contents vanish in the same
        commit (no delete-then-append window where a reader sees an
        empty table).  ``df`` may be empty (DELETE FROM without WHERE)."""
        return self.append(
            spark,
            df,
            _carry=False,
            _operation="overwrite",
            _extra_entries=[],
            _allow_empty=True,
        )

    def overwrite_partitions(
        self,
        spark: SparkSession,
        df: DataFrame,
        merge_schema: Optional[bool] = None,
    ) -> int:
        """DYNAMIC partition overwrite (Iceberg-Spark's INSERT OVERWRITE
        with partitionOverwriteMode=dynamic): ONE atomic snapshot in
        which every partition PRESENT IN ``df`` is replaced by df's rows
        and every other partition is untouched — the idempotent daily-
        backfill write shape at 100 TB (re-running a day replaces that
        day only; a full `overwrite` would wipe the table).  Untouched
        files carry verbatim; untouched files targeted by outstanding
        MOR deletes fold them by rewriting (the new snapshot carries no
        delete manifests, same rule as MERGE).  Replaced partitions are
        computed from df through the table's own spec transforms, so
        bucket/truncate/date specs all work."""
        from datafusion_iceberg_spark.iceberg.transforms import spark_expr
        from pyspark.sql import functions as F

        if not self.spec_entries:
            raise ValueError(
                "dynamic partition overwrite needs a partitioned table "
                "(unpartitioned: use overwrite)"
            )
        self._maybe_merge_schema(df, merge_schema)
        exprs = [
            (
                F.col(source)
                if transform == "identity"
                else spark_expr(
                    transform,
                    source,
                    dtype=df.schema[source].dataType,
                    iceberg_type=self.iceberg_types.get(source),
                )
            ).alias(fname)
            for source, transform, fname in self.spec_entries
        ]
        distinct_parts = df.select(*exprs).distinct()
        # Explosion guard: the replaced set is collect()ed to the driver
        # and diffed against the manifest, so a frame spanning 10⁶
        # partitions would build a 10⁶-tuple set and drop nearly every
        # file — almost certainly a mis-specified backfill, and at best
        # a job `overwrite()` does in one manifest swap.  Count first
        # (one agg, no wide collect) and refuse above the cap.
        cap = int(
            self._load_current()
            .get("properties", {})
            .get("write.overwrite.dynamic.max-partitions", 4096)
        )
        collected = distinct_parts.limit(cap + 1).collect()
        if len(collected) > cap:
            raise ValueError(
                f"dynamic partition overwrite would replace more than "
                f"write.overwrite.dynamic.max-partitions={cap} distinct "
                "partitions; use overwrite() for a full-table replace or "
                "raise the table property"
            )
        # Collected identity values arrive in Python types (datetime.date,
        # datetime.datetime, Decimal…) while manifest partition values
        # live in the Avro domain (_parse_partition_value: date→epoch
        # days, timestamp→epoch micros, decimal→string).  Normalize into
        # the manifest domain or the replaced-set intersection is empty
        # and the overwrite silently appends (r9 ADVICE, high).
        replaced = {
            tuple(
                self._to_manifest_domain(fname, v)
                for (_, _, fname), v in zip(self.spec_entries, r)
            )
            for r in collected
        }
        table = self._load_table()
        all_files = table.files()
        fnames = [fname for _, _, fname in self.spec_entries]

        def ptuple(f):
            return tuple((f.partition or {}).get(n) for n in fnames)

        survivors = [f for f in all_files if ptuple(f) not in replaced]
        dead = table.files_targeted_by_deletes()
        rewrite = [
            f
            for f in survivors
            if table.metadata.localize(f.path) in dead
        ]
        carried = [
            f
            for f in survivors
            if table.metadata.localize(f.path) not in dead
        ]
        out = df
        if rewrite:
            lineage = _lineage_on(table.metadata.raw)
            scan = (
                self._lineage_scan(spark, table, rewrite)
                if lineage
                else table._scan_files(spark, rewrite, None)
            )
            # new rows lack the lineage columns: they union as NULL and
            # take fresh ids at read time (standard insert semantics)
            out = scan.unionByName(df, allowMissingColumns=True)
        return self.append(
            spark,
            out,
            _carry=False,
            _operation="overwrite",
            _extra_entries=carried,
            _allow_empty=True,
            _expected_parent=table.metadata.current_snapshot_id,
        )

    def _merge_insert_frame(
        self,
        src: DataFrame,
        clauses: list,
        dtypes_map: dict,
        cols: list,
        anti_target: Optional[DataFrame] = None,
        keys: Optional[list] = None,
    ) -> Optional[DataFrame]:
        """The MERGE insert branch, shared by COW and MOR: source rows
        not matching any target key (anti-join on ``keys`` when
        ``anti_target`` given), routed through the NOT MATCHED clauses
        first-match-wins — each clause's condition gates it, explicit
        ``INSERT (cols) VALUES`` maps per-column exprs (unlisted target
        columns take their v3 write-default, else NULL), ``INSERT *``
        passes the source row through.  ``None`` when no insert clause
        exists; rows matching no clause are dropped (standard SQL)."""
        from functools import reduce

        from pyspark.sql import functions as F

        ins_clauses = [
            (i, cl)
            for i, cl in enumerate(clauses)
            if cl.kind == "not_matched"
        ]
        if not ins_clauses:
            return None
        frame = src.alias("src")
        if anti_target is not None:
            anti_cond = reduce(
                lambda a, b: a & b,
                [
                    F.col(f"src.{sk}") == F.col(f"t2.{tk}")
                    for tk, sk in keys
                ],
            )
            frame = frame.join(
                anti_target.select(*[tk for tk, _ in keys]).alias("t2"),
                anti_cond,
                "left_anti",
            )
        ic = None
        for i, cl in ins_clauses:
            gate = (
                F.expr(f"coalesce(({cl.condition}), false)")
                if cl.condition
                else F.lit(True)
            )
            ic = (
                F.when(gate, F.lit(i))
                if ic is None
                else ic.when(gate, F.lit(i))
            )
        frame = frame.withColumn("__ic", ic.otherwise(F.lit(-1))).filter(
            F.col("__ic") >= 0
        )
        ins_cols = []
        for c in cols:
            expr = None
            for i, cl in reversed(ins_clauses):
                if cl.insert_cols is None:
                    # INSERT *: table columns the source lacks (schema
                    # evolved past the source — e.g. a prior mergeSchema
                    # add) take their write-default, else NULL
                    e = f"src.{c}" if c in src.columns else None
                else:
                    e = dict(
                        zip(cl.insert_cols, cl.insert_values or [])
                    ).get(c)
                val = (
                    F.expr(f"({e})").cast(dtypes_map[c])
                    if e is not None
                    else F.lit(self.write_defaults.get(c)).cast(
                        dtypes_map[c]
                    )
                )
                expr = (
                    val
                    if expr is None
                    else F.when(F.col("__ic") == i, val).otherwise(expr)
                )
            ins_cols.append(expr.alias(c))
        return frame.select(*ins_cols)

    def merge(
        self,
        spark: SparkSession,
        source: DataFrame,
        on,
        when_matched_set: Optional[dict[str, str]] = None,
        insert_not_matched: bool = True,
        when_matched_delete: bool = False,
        clauses: Optional[list] = None,
        merge_schema: Optional[bool] = None,
        extra_summary: Optional[dict] = None,
    ) -> int:
        """MERGE INTO target USING source ON <key equality>, full SQL
        clause surface (r8): any number of ``WHEN MATCHED [AND cond]
        THEN UPDATE SET ... | DELETE``, ``WHEN NOT MATCHED [AND cond]
        THEN INSERT * | INSERT (cols) VALUES (exprs)``, and ``WHEN NOT
        MATCHED BY SOURCE [AND cond] THEN UPDATE SET ... | DELETE``,
        first-matching-clause-wins per row.  The legacy kwargs remain as
        sugar for the single-clause shapes; ``clauses`` (a
        :class:`MergeClause` list) overrides them.

        ``on`` is one key column or a list (composite keys join on ALL
        of them; file pruning uses the leading key's [min, max] span —
        conservative, every possible match stays in the candidate set).
        A NOT MATCHED BY SOURCE clause widens candidates to ALL files
        (every target row is in scope by definition).

        Copy-on-write, surgical: the rewrite is one distributed job —
        candidates LEFT-JOIN source (update/delete branch) unioned with
        source ANTI-JOIN target (insert branch); untouched files ride
        along verbatim."""
        from functools import reduce

        from datafusion_iceberg_spark.iceberg.table import IcebergTable
        from pyspark.sql import functions as F

        # schema evolution first so INSERT * / the rewrite frame see the
        # new columns (with accept-any-schema on, EVERY source column is
        # taken as a table column by design — CDC meta/op columns must be
        # dropped from the source first, same contract as Spark-Iceberg)
        self._maybe_merge_schema(source, merge_schema)
        keys = _normalize_merge_on(on)
        tkeys = [t for t, _ in keys]
        skeys = [sk for _, sk in keys]
        cols = [f.name for f in self.schema.fields]
        missing = [k for k in tkeys if k not in cols]
        if missing:
            raise ValueError(f"merge key not in schema: {missing}")
        clauses = _normalize_merge_clauses(
            clauses, when_matched_set, insert_not_matched,
            when_matched_delete, cols,
        )
        has_nmbs = any(c.kind == "not_matched_by_source" for c in clauses)
        # the FULL source frame joins: clause conditions and INSERT
        # VALUES exprs may reference source columns outside the table
        # schema (e.g. a CDC op column); INSERT * takes schema columns
        src = source
        keys_nn = reduce(
            lambda a, b: a & b, [F.col(k).isNotNull() for k in skeys]
        )
        bounds = src.filter(keys_nn).agg(
            F.min(skeys[0]).alias("lo"),
            F.max(skeys[0]).alias("hi"),
            F.count(F.lit(1)).alias("n"),
            F.countDistinct(*skeys).alias("nd"),
        ).collect()[0]
        if bounds.n != bounds.nd:
            # SQL MERGE raises when a target row matches multiple source
            # rows; a plain left join would silently multiply target rows.
            raise ValueError(
                f"MERGE source has duplicate keys on {skeys!r}: "
                f"{bounds.n} rows, {bounds.nd} distinct — dedup the source "
                "(e.g. keep the latest row per key) before merging"
            )
        if bounds.lo is None and src.first() is None and not has_nmbs:
            # empty source: nothing to do UNLESS a NOT MATCHED BY SOURCE
            # clause exists (then every target row is in scope)
            cur = self._load_table().metadata.raw.get(
                "current-snapshot-id"
            )
            return int(cur) if cur is not None else -1

        table = self._load_table()
        all_files = table.files()
        # NULL-key source rows can never equi-match, so when every source
        # key is NULL no target file is a candidate (insert branch only);
        # a NOT MATCHED BY SOURCE clause puts EVERY target row in scope
        if has_nmbs:
            candidates = list(all_files)
        else:
            candidates = (
                table.files(
                    filters=("between", tkeys[0], bounds.lo, bounds.hi)
                )
                if bounds.lo is not None
                else []
            )
        cand_paths = {f.path for f in candidates}
        untouched = [f for f in all_files if f.path not in cand_paths]

        # fold outstanding MOR deletes into this copy-on-write rewrite:
        # the new snapshot carries no delete manifests (_carry=False), so
        # every delete-targeted file must join the rewrite set or its
        # deletes would silently un-apply on the untouched copy
        dead = table.files_targeted_by_deletes()
        if dead:
            extra = [
                f
                for f in untouched
                if table.metadata.localize(f.path) in dead
            ]
            if extra:
                candidates = list(candidates) + extra
                cand_paths |= {f.path for f in extra}
                untouched = [f for f in untouched if f.path not in cand_paths]
        lineage = _lineage_on(table.metadata.raw)
        target = (
            self._lineage_scan(spark, table, candidates)
            if lineage
            else table._scan_files(spark, candidates, None)
        )
        # presence marker instead of key-IS-NOT-NULL: composite and
        # NULL-able keys both stay correct (a NULL key never equi-joins)
        src_m = src.withColumn("__m", F.lit(1))
        join_cond = reduce(
            lambda a, b: a & b,
            [F.col(f"t.{tk}") == F.col(f"src.{sk}") for tk, sk in keys],
        )
        joined = target.alias("t").join(src_m.alias("src"), join_cond, "left")
        matched = F.col("src.__m").isNotNull()
        # v3 row lineage through the COW rewrite: every surviving row
        # keeps its materialized id; rows the merge UPDATES write a null
        # last-updated (they take this commit's sequence at read time)
        # first-matching-clause index per target row (covers matched and
        # not-matched-by-source kinds); -1 = row untouched
        dtypes_map = {f.name: f.dataType for f in self.schema.fields}
        mc = _merge_clause_index(
            clauses, matched, ("matched", "not_matched_by_source")
        )
        del_idx = [
            i
            for i, cl in enumerate(clauses)
            if cl.kind != "not_matched" and cl.action == "delete"
        ]
        upd_idx = [
            i
            for i, cl in enumerate(clauses)
            if cl.kind != "not_matched" and cl.action == "update"
        ]
        was_updated = F.col("__mc").isin(upd_idx) if upd_idx else F.lit(False)
        lin_upd = (
            [
                F.col("t._row_id").alias("_row_id"),
                F.when(was_updated, F.lit(None).cast("long"))
                .otherwise(F.col("t._last_updated_sequence_number"))
                .alias("_last_updated_sequence_number"),
            ]
            if lineage
            else []
        )
        survivors = joined.withColumn("__mc", mc)
        if del_idx:
            survivors = survivors.filter(~F.col("__mc").isin(del_idx))
        val_cols = []
        for c in cols:
            expr = F.col(f"t.{c}")
            for i in reversed(upd_idx):
                e = (clauses[i].assignments or {}).get(c)
                if e is not None:
                    expr = F.when(
                        F.col("__mc") == i,
                        F.expr(f"({e})").cast(dtypes_map[c]),
                    ).otherwise(expr)
            val_cols.append(expr.alias(c))
        updated = survivors.select(*(val_cols + lin_upd))
        out = updated
        # keys absent from the whole TARGET: anti-join against the
        # candidate scan suffices — non-candidate files provably hold
        # no source keys (pruning is conservative the other way).
        # Under has_nmbs candidates = all files, so this stays a
        # full-target anti-join either way.
        inserts = self._merge_insert_frame(
            src, clauses, dtypes_map, cols, anti_target=target, keys=keys
        )
        if inserts is not None:
            lin_ins = (
                [
                    F.lit(None).cast("long").alias("_row_id"),
                    F.lit(None)
                    .cast("long")
                    .alias("_last_updated_sequence_number"),
                ]
                if lineage
                else []
            )
            out = updated.unionByName(inserts.select(*(cols + lin_ins)))
        return self.append(
            spark,
            out,
            _carry=False,
            _operation="overwrite",
            _extra_entries=untouched,
            _allow_empty=True,
            _expected_parent=table.metadata.current_snapshot_id,
            extra_summary=extra_summary,
        )

    def merge_mor(
        self,
        spark: SparkSession,
        source: DataFrame,
        on,
        when_matched_set: Optional[dict[str, str]] = None,
        insert_not_matched: bool = True,
        when_matched_delete: bool = False,
        clauses: Optional[list] = None,
        merge_schema: Optional[bool] = None,
        extra_summary: Optional[dict] = None,
    ) -> int:
        """Merge-on-read MERGE (``write.merge.mode='merge-on-read'``):
        the same clause semantics as :meth:`merge` (conditional WHEN
        clauses, explicit INSERT column lists, NOT MATCHED BY SOURCE),
        committed as ONE row-delta snapshot — position deletes covering
        every CLAUSE-SELECTED target row, plus data files holding the
        updated replacements and the NOT-MATCHED inserts.  Rows whose
        conditions select no clause are untouched (no delete, no
        rewrite).  No candidate file is rewritten; write cost is
        proportional to affected + inserted rows.  Same duplicate-key
        guard and key-span candidate pruning as the COW path (NOT
        MATCHED BY SOURCE widens candidates to all files)."""
        from functools import reduce

        from pyspark.sql import functions as F

        from datafusion_iceberg_spark.iceberg.table import IcebergTable

        self._maybe_merge_schema(source, merge_schema)
        keys = _normalize_merge_on(on)
        tkeys = [t for t, _ in keys]
        skeys = [sk for _, sk in keys]
        cols = [f.name for f in self.schema.fields]
        missing = [k for k in tkeys if k not in cols]
        if missing:
            raise ValueError(f"merge key not in schema: {missing}")
        clauses = _normalize_merge_clauses(
            clauses, when_matched_set, insert_not_matched,
            when_matched_delete, cols,
        )
        has_nmbs = any(c.kind == "not_matched_by_source" for c in clauses)
        # the FULL source frame joins: clause conditions and INSERT
        # VALUES exprs may reference source columns outside the table
        # schema (e.g. a CDC op column); INSERT * takes schema columns
        src = source
        keys_nn = reduce(
            lambda a, b: a & b, [F.col(k).isNotNull() for k in skeys]
        )
        bounds = src.filter(keys_nn).agg(
            F.min(skeys[0]).alias("lo"),
            F.max(skeys[0]).alias("hi"),
            F.count(F.lit(1)).alias("n"),
            F.countDistinct(*skeys).alias("nd"),
        ).collect()[0]
        if bounds.n != bounds.nd:
            raise ValueError(
                f"MERGE source has duplicate keys on {skeys!r}: "
                f"{bounds.n} rows, {bounds.nd} distinct — dedup the source "
                "(e.g. keep the latest row per key) before merging"
            )
        table = self._load_table()
        cur = table.metadata.raw.get("current-snapshot-id")
        dtypes_map = {f.name: f.dataType for f in self.schema.fields}
        if bounds.lo is None and src.first() is None and not has_nmbs:
            return int(cur) if cur is not None else -1
        if has_nmbs:
            candidates = list(table.files())
        else:
            candidates = (
                table.files(
                    filters=("between", tkeys[0], bounds.lo, bounds.hi)
                )
                if bounds.lo is not None
                else []
            )
        lineage = _lineage_on(table.metadata.raw)
        if not candidates:
            # nothing can match: the whole merge is the insert branch
            # (still clause-routed: conditions + explicit column lists)
            del_rows = local_df(spark, [], "file_path string, pos long")
            new_rows = self._merge_insert_frame(
                src, clauses, dtypes_map, cols
            )
            if new_rows is not None and lineage:
                new_rows = new_rows.select(
                    *(cols + [F.lit(None).cast("long").alias("_row_id")])
                )
            return self._commit_row_delta(
                spark,
                del_rows,
                new_rows,
                cur,
                use_dv=_prefers_dv(table),
                extra_summary=extra_summary,
            )
        scanned = table._scan_files(
            spark,
            candidates,
            None,
            _with_row_meta=True,
            _extra_cols=(
                [("_row_id", T.LongType())] if lineage else None
            ),
        ).cache()
        try:
            target_side = (
                table.attach_row_lineage(spark, scanned, candidates)
                if lineage
                else scanned
            )
            src_m = src.withColumn("__m", F.lit(1))
            join_cond = reduce(
                lambda a, b: a & b,
                [F.col(f"t.{tk}") == F.col(f"src.{sk}") for tk, sk in keys],
            )
            # inner join suffices without NOT MATCHED BY SOURCE clauses
            # (only matched rows can be affected); with them, unmatched
            # target rows are in scope too
            joined = target_side.alias("t").join(
                src_m.alias("src"),
                join_cond,
                "left" if has_nmbs else "inner",
            )
            matched = F.col("src.__m").isNotNull()
            mc = _merge_clause_index(
                clauses, matched, ("matched", "not_matched_by_source")
            )
            # ONLY clause-selected rows are touched: their old positions
            # delete; update-action rows additionally re-insert
            # transformed copies (delete-action rows just disappear)
            affected = joined.withColumn("__mc", mc).filter(
                F.col("__mc") >= 0
            )
            del_rows = affected.select(
                F.regexp_replace(
                    F.col("t._ice_file"), "^file:/*", "/"
                ).alias("file_path"),
                F.col("t._ice_pos").cast("long").alias("pos"),
            )
            upd_idx = [
                i
                for i, cl in enumerate(clauses)
                if cl.kind != "not_matched" and cl.action == "update"
            ]
            parts = []
            if upd_idx:
                val_cols = []
                for c in cols:
                    expr = F.col(f"t.{c}")
                    for i in reversed(upd_idx):
                        e = (clauses[i].assignments or {}).get(c)
                        if e is not None:
                            expr = F.when(
                                F.col("__mc") == i,
                                F.expr(f"({e})").cast(dtypes_map[c]),
                            ).otherwise(expr)
                    val_cols.append(expr.alias(c))
                parts.append(
                    affected.filter(F.col("__mc").isin(upd_idx)).select(
                        *(
                            val_cols
                            # updated rows keep their row identity
                            + ([F.col("t._row_id")] if lineage else [])
                        )
                    )
                )
            inserts = self._merge_insert_frame(
                src, clauses, dtypes_map, cols,
                anti_target=scanned, keys=keys,
            )
            if inserts is not None:
                # fresh inserts: null materialized id → the reader
                # falls back to the new file's first_row_id + pos
                parts.append(
                    inserts.select(
                        *(
                            cols
                            + (
                                [F.lit(None).cast("long").alias("_row_id")]
                                if lineage
                                else []
                            )
                        )
                    )
                )
            new_rows = None
            if parts:
                new_rows = parts[0]
                for p in parts[1:]:
                    new_rows = new_rows.unionByName(p)
            return self._commit_row_delta(
                spark,
                del_rows,
                new_rows,
                cur,
                use_dv=_prefers_dv(table),
                extra_summary=extra_summary,
            )
        finally:
            scanned.unpersist()

    def publish_changes(self, wap_id: str) -> int:
        """``CALL publish_changes(wap_id)`` (Spark-Iceberg WAP parity):
        find the staged snapshot whose summary carries this ``wap.id``
        and cherry-pick it onto current main (re-sequencing if main has
        advanced; double-publish guarded by cherrypick's ancestry
        check).  Returns the published snapshot id."""
        meta = self._load_current()
        matches = [
            s
            for s in meta.get("snapshots", [])
            if (s.get("summary") or {}).get("wap.id") == str(wap_id)
        ]
        if not matches:
            raise KeyError(f"no snapshot with wap.id={wap_id!r}")
        if len(matches) > 1:
            raise ValueError(
                f"wap.id={wap_id!r} is ambiguous: "
                f"{[s['snapshot-id'] for s in matches]}"
            )
        return self.cherrypick_snapshot(int(matches[0]["snapshot-id"]))

    def cherrypick_snapshot(self, snapshot_id: int) -> int:
        """Iceberg ``cherrypick_snapshot`` (append snapshots only): apply
        a staged/WAP snapshot's ADDED manifests onto the CURRENT main as
        a new commit — unlike :meth:`fast_forward` this works when main
        has advanced since staging, because an append introduces files
        only (nothing it read can have been invalidated).  The new
        commit takes a fresh sequence number, so the cherry-picked rows
        order AFTER any deletes committed meanwhile — "the changes apply
        now", Iceberg's own cherry-pick semantics.  Overwrite/delete
        snapshots are refused (their correctness depends on the state
        they were staged against).  Row-lineage ids minted at staging
        stay valid: the staged commit already advanced ``next-row-id``,
        so the range is reserved."""
        from datafusion_iceberg_spark.iceberg.manifests import (
            read_manifest_list,
        )

        meta = self._load_current()
        sid = int(snapshot_id)
        by_id = {s["snapshot-id"]: s for s in meta.get("snapshots", [])}
        src = by_id.get(sid)
        if src is None:
            raise KeyError(f"snapshot {sid} not found")
        if src["summary"].get("operation") != "append":
            raise ValueError(
                "cherrypick_snapshot supports append snapshots only "
                f"(got {src['summary'].get('operation')!r}) — overwrites "
                "depend on the state they were staged against"
            )
        cur = meta.get("current-snapshot-id")
        cur = None if cur in (None, -1) else cur
        # already applied? walk main's ancestry — the snapshot itself
        # (not-diverged publish) or any commit recording it as its
        # cherry-pick source (diverged re-commit)
        walk = cur
        while walk is not None:
            node = by_id.get(walk) or {}
            picked = node.get("summary", {}).get(
                "cherry-picked-snapshot-id"
            )
            if walk == sid or picked == str(sid):
                raise ValueError(
                    f"snapshot {sid} is already an ancestor of main"
                )
            walk = node.get("parent-snapshot-id")
        if src.get("parent-snapshot-id") == cur:
            # not diverged: publishing the snapshot itself is exact
            now = int(time.time() * 1000)
            meta["current-snapshot-id"] = sid
            meta["snapshot-log"] = meta.get("snapshot-log", []) + [
                {"timestamp-ms": now, "snapshot-id": sid}
            ]
            meta["last-updated-ms"] = now
            self._commit_metadata(meta)
            return sid
        added = [
            mf
            for mf in read_manifest_list(src["manifest-list"])
            if mf.added_snapshot_id == sid
        ]
        if not added:
            raise ValueError(f"snapshot {sid} added no manifests")
        new_id = int(time.time() * 1000) * 1000 + (
            int.from_bytes(os.urandom(2), "big") % 1000
        )
        seq = _next_sequence(meta)
        carried = []
        if cur is not None:
            for mf in read_manifest_list(by_id[cur]["manifest-list"]):
                carried.append(_carry_manifest_row(mf))
        added_rows = 0
        added_files = 0
        rows = []
        for mf in added:
            added_rows += int(mf.added_rows_count or 0) + int(
                mf.existing_rows_count or 0
            )
            added_files += int(mf.added_files_count or 0) + int(
                mf.existing_files_count or 0
            )
            row = _carry_manifest_row(mf)
            # the changes commit NOW: re-sequence the manifest (entries
            # wrote sequence=None and inherit this row's number)
            row["sequence_number"] = seq
            row["min_sequence_number"] = seq
            rows.append(row)
        meta_dir = os.path.join(self.root, "metadata")
        manifest_list_path = os.path.join(
            meta_dir, f"snap-{new_id}-1-{uuidlib.uuid4()}.avro"
        )
        write_avro_file(
            manifest_list_path, _MANIFEST_LIST_SCHEMA, carried + rows
        )
        now = int(time.time() * 1000)
        cur_summary = (by_id.get(cur) or {}).get("summary", {})
        snapshot = {
            "snapshot-id": new_id,
            "sequence-number": seq,
            "parent-snapshot-id": cur,
            "timestamp-ms": now,
            "summary": {
                "operation": "append",
                "added-data-files": str(added_files),
                "added-records": str(added_rows),
                "total-records": str(
                    int(cur_summary.get("total-records", 0)) + added_rows
                ),
                "total-data-files": str(
                    int(cur_summary.get("total-data-files", 0)) + added_files
                ),
                "cherry-picked-snapshot-id": str(sid),
            },
            "manifest-list": manifest_list_path,
            "schema-id": meta.get("current-schema-id", 0),
        }
        meta["snapshots"] = meta.get("snapshots", []) + [snapshot]
        meta["current-snapshot-id"] = new_id
        meta["snapshot-log"] = meta.get("snapshot-log", []) + [
            {"timestamp-ms": now, "snapshot-id": new_id}
        ]
        meta["last-sequence-number"] = seq
        meta["last-updated-ms"] = now
        self._commit_metadata(meta)
        return new_id

    def fast_forward(self, branch: str, drop_ref: bool = True) -> int:
        """Publish a staged branch (write-audit-publish step 3): advance
        ``main`` to the branch's snapshot.  Requires the staged
        snapshot's parent to BE the current snapshot — if main moved
        since staging, the staged manifest list is missing those commits
        and publishing would silently drop them, so this raises and the
        caller re-stages instead (the same conflict rule as Iceberg's
        cherry-pick of an overwrite)."""
        meta = self._load_current()
        ref = meta.get("refs", {}).get(branch)
        if ref is None:
            raise KeyError(f"branch {branch!r} not found")
        sid = int(ref["snapshot-id"])
        snap = next(
            (s for s in meta.get("snapshots", []) if s["snapshot-id"] == sid),
            None,
        )
        if snap is None:
            raise KeyError(f"snapshot {sid} (branch {branch!r}) not found")
        cur = meta.get("current-snapshot-id")
        cur = None if cur in (None, -1) else cur
        # walk the branch head's parent chain back to main: every
        # intermediate is a branch commit to publish (multi-commit
        # branches); if the walk never reaches current main, main moved
        # since staging and the branch's manifest lists are missing
        # those commits — publishing would silently drop them
        by_id = {s["snapshot-id"]: s for s in meta.get("snapshots", [])}
        chain = []
        walk = sid
        while walk is not None and walk != cur:
            node = by_id.get(walk)
            if node is None:
                break
            chain.append(walk)
            walk = node.get("parent-snapshot-id")
        if walk != cur:
            raise CommitConflict(
                f"cannot fast-forward {branch!r}: its history does not "
                f"descend from main's current snapshot {cur} — re-stage "
                "on top of the current snapshot"
            )
        now = int(time.time() * 1000)
        meta["current-snapshot-id"] = sid
        meta["snapshot-log"] = meta.get("snapshot-log", []) + [
            {"timestamp-ms": now, "snapshot-id": s}
            for s in reversed(chain)  # oldest branch commit first
        ]
        if drop_ref:
            meta["refs"].pop(branch, None)
        meta["last-updated-ms"] = now
        self._commit_metadata(meta)
        return sid

    def clean_metadata_log(self, keep_last: int = 5) -> dict:
        """Delete old ``v{N}.metadata.json`` versions, keeping the newest
        ``keep_last`` — the counterpart of Iceberg's
        ``write.metadata.delete-after-commit.enabled`` /
        ``previous-versions-max`` retention.  Every commit writes a new
        full metadata file, so a busy table accumulates thousands; only
        the latest is live (older ones serve metadata archaeology, not
        time travel — SNAPSHOTS carry time travel and are untouched
        here).  Version discovery stays correct because
        ``_current_version`` takes the max over hint and surviving
        files."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        cur = self._current_version()
        deleted = 0
        for p in glob.glob(
            os.path.join(self.root, "metadata", "v*.metadata.json")
        ):
            v = int(os.path.basename(p).split(".")[0][1:])
            if v <= cur - keep_last:
                try:
                    os.remove(p)
                    deleted += 1
                except OSError:
                    pass
        return {"deleted_versions": deleted, "current_version": cur}

    def remove_orphan_files(
        self, dry_run: bool = False, min_age_ms: int = 0
    ) -> dict:
        """Delete files under the table's ``data/`` tree referenced by NO
        snapshot — debris from crashed writes or failed commits, the
        maintenance op that pairs with expire_snapshots (which removes
        *referenced-by-expired* files; this removes *never-referenced*
        ones).  ``min_age_ms`` guards in-flight writer temp files in a
        concurrent deployment (production defaults to hours; tests pass
        0).  Returns {"orphan_files": n} (counted, and deleted unless
        ``dry_run``)."""
        from datafusion_iceberg_spark.iceberg.manifests import (
            read_manifest,
            read_manifest_list,
        )
        from datafusion_iceberg_spark.iceberg.metadata import TableMetadata

        meta = self._load_current()
        tm = TableMetadata(meta, self.root, meta.get("location", self.root))
        referenced: set[str] = set()
        for s in meta.get("snapshots", []):
            ml = tm.localize(s["manifest-list"])
            for mf in read_manifest_list(ml):
                for f in read_manifest(tm.localize(mf.path)):
                    referenced.add(os.path.realpath(tm.localize(f.path)))
        data_root = os.path.join(self.root, "data")
        now_ms = time.time() * 1000
        orphans: list[str] = []
        for dirpath, _dirs, files in os.walk(data_root):
            for fn in files:
                # Spark's hidden-file convention: _SUCCESS markers and
                # .crc sidecars are commit bookkeeping, not data — readers
                # never see them, so they are not orphans
                if fn.startswith((".", "_")):
                    continue
                p = os.path.join(dirpath, fn)
                if os.path.realpath(p) in referenced:
                    continue
                try:
                    age_ms = now_ms - os.path.getmtime(p) * 1000
                except OSError:
                    continue
                if age_ms >= min_age_ms:
                    orphans.append(p)
        if not dry_run:
            for p in orphans:
                try:
                    os.remove(p)
                except FileNotFoundError:
                    pass
        return {"orphan_files": len(orphans)}

    # -- named refs (tags and branches) ---------------------------------

    def create_ref(
        self, name: str, ref_type: str, snapshot_id: Optional[int] = None
    ) -> int:
        """Create or move a named ref (``refs`` map in the metadata JSON,
        Iceberg v2).  A *tag* is an immutable bookmark for time travel /
        retention; a *branch* names a line of history (we support reading
        branches; writes always advance ``main``).  ``main`` itself stays
        implicit — always the current snapshot — so it cannot be created
        or dropped here.

        Idempotent: re-pointing a ref at the snapshot it already names is
        a no-op (no metadata version churn for cached fixtures)."""
        if ref_type not in ("tag", "branch"):
            raise ValueError(f"ref type must be 'tag' or 'branch': {ref_type!r}")
        if name == "main":
            raise ValueError("'main' is implicit (the current snapshot)")
        meta = self._load_current()
        sid = snapshot_id
        if sid is None:
            sid = meta.get("current-snapshot-id")
        if sid in (None, -1):
            raise ValueError("table has no snapshot to reference")
        if not any(s["snapshot-id"] == sid for s in meta.get("snapshots", [])):
            raise KeyError(f"snapshot {sid} not found")
        existing = meta.get("refs", {}).get(name)
        if existing and existing.get("snapshot-id") == sid and existing.get(
            "type"
        ) == ref_type:
            return sid
        meta.setdefault("refs", {})[name] = {
            "snapshot-id": sid,
            "type": ref_type,
        }
        meta["last-updated-ms"] = int(time.time() * 1000)
        self._commit_metadata(meta)
        return sid

    def create_tag(self, name: str, snapshot_id: Optional[int] = None) -> int:
        return self.create_ref(name, "tag", snapshot_id)

    def create_branch(self, name: str, snapshot_id: Optional[int] = None) -> int:
        return self.create_ref(name, "branch", snapshot_id)

    def drop_ref(self, name: str) -> None:
        if name == "main":
            raise ValueError("'main' is implicit and cannot be dropped")
        meta = self._load_current()
        if name not in meta.get("refs", {}):
            raise KeyError(f"ref {name!r} not found")
        del meta["refs"][name]
        meta["last-updated-ms"] = int(time.time() * 1000)
        self._commit_metadata(meta)

    def expire_snapshots(
        self, keep_last: int = 1, older_than_ms: Optional[int] = None
    ) -> dict:
        """Expire all but the newest ``keep_last`` snapshots: trim the
        snapshot list/log in a new metadata version, then delete data and
        manifest files referenced ONLY by expired snapshots — the storage
        reclamation that pairs with :meth:`compact` (a replace snapshot
        leaves the old files for time travel; expiration is the explicit,
        separate decision to give that history up, mirroring Iceberg's
        own expire_snapshots maintenance action).

        ``older_than_ms`` restricts expiry to snapshots committed before
        that epoch-millis timestamp (Iceberg's ``expireOlderThan`` +
        ``retainLast`` composition: age is the policy, ``keep_last`` the
        floor that always survives regardless of age).

        Returns counts: {"expired_snapshots", "deleted_files"}."""
        from datafusion_iceberg_spark.iceberg.manifests import (
            read_manifest,
            read_manifest_list,
        )
        from datafusion_iceberg_spark.iceberg.metadata import TableMetadata

        meta = self._load_current()
        snaps = sorted(meta.get("snapshots", []), key=lambda s: s["timestamp-ms"])
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        if len(snaps) <= keep_last:
            return {"expired_snapshots": 0, "deleted_files": 0}
        kept, expired = snaps[-keep_last:], snaps[:-keep_last]
        if older_than_ms is not None:
            young = [s for s in expired if s["timestamp-ms"] >= older_than_ms]
            expired = [s for s in expired if s["timestamp-ms"] < older_than_ms]
            kept = young + kept
            if not expired:
                return {"expired_snapshots": 0, "deleted_files": 0}
        # named refs pin their snapshots: a tagged/branched snapshot never
        # expires (Iceberg's own retention contract) — readers of the ref
        # must not lose the files it references
        ref_ids = {
            int(r["snapshot-id"]) for r in meta.get("refs", {}).values()
        }
        # the CURRENT snapshot is always pinned: a staged WAP snapshot can
        # be NEWER than main, and keep_last-by-timestamp would otherwise
        # keep the staged one while expiring what main points at
        if meta.get("current-snapshot-id") not in (None, -1):
            ref_ids.add(int(meta["current-snapshot-id"]))
        if ref_ids:
            pinned = [s for s in expired if s["snapshot-id"] in ref_ids]
            expired = [s for s in expired if s["snapshot-id"] not in ref_ids]
            kept = pinned + kept
            if not expired:
                return {"expired_snapshots": 0, "deleted_files": 0}

        def _referenced(snapshot_dicts):
            tm = TableMetadata(meta, self.root, meta.get("location", self.root))
            data, manifests = set(), set()
            for s in snapshot_dicts:
                ml = tm.localize(s["manifest-list"])
                manifests.add(ml)
                for mf in read_manifest_list(ml):
                    mp = tm.localize(mf.path)
                    manifests.add(mp)
                    for f in read_manifest(mp):
                        data.add(tm.localize(f.path))
            return data, manifests

        keep_data, keep_manifests = _referenced(kept)
        drop_data, drop_manifests = _referenced(expired)

        # commit trimmed metadata FIRST (readers move off the expired
        # snapshots before any file disappears), then delete orphans
        kept_ids = {s["snapshot-id"] for s in kept}
        meta["snapshots"] = kept
        meta["snapshot-log"] = [
            e for e in meta.get("snapshot-log", []) if e["snapshot-id"] in kept_ids
        ]
        # statistics files are keyed by snapshot: entries for expired
        # snapshots go with them (their files become deletable orphans)
        for stats_key in ("statistics", "partition-statistics"):
            if stats_key in meta:
                meta[stats_key] = [
                    s
                    for s in meta[stats_key]
                    if s.get("snapshot-id") in kept_ids
                ]
        meta["last-updated-ms"] = int(time.time() * 1000)
        self._commit_metadata(meta)

        deleted = 0
        for path in (drop_data - keep_data) | (drop_manifests - keep_manifests):
            try:
                os.remove(path)
                deleted += 1
            except FileNotFoundError:
                pass
        return {"expired_snapshots": len(expired), "deleted_files": deleted}
