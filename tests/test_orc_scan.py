"""Non-parquet data-file handling: ORC routed to Spark's ORC reader,
everything else refused loudly BEFORE any byte is read (table.py
UnsupportedFileFormatError).  The reference hands every data file to the
parquet reader regardless of the manifest's file_format field
(table.rs:291 ParquetFormat) — a spec-legal ORC/Avro table fails there
with a low-level decode error."""

from __future__ import annotations

import os

import pytest

from datafusion_iceberg_spark.iceberg.table import (
    IcebergTable,
    UnsupportedFileFormatError,
)


def _orc_table(spark, sf_dir) -> IcebergTable:
    from datafusion_iceberg_spark import registry

    registry.load_all_modules()
    # building the gate's fixture also exercises the mixed-format union
    registry.QUERIES["iceberg_orc_scan"](spark, sf_dir)
    from datafusion_iceberg_spark.iceberg.queries import SCRATCH

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    return IcebergTable.load(os.path.join(SCRATCH, f"wh_{tag}_orc", "orctbl"))


def test_orc_gate_matches_oracle(spark, duck, sf_dir):
    from datafusion_iceberg_spark import registry
    from tests.oracle_compare import compare

    registry.load_all_modules()
    df = registry.QUERIES["iceberg_orc_scan"](spark, sf_dir)
    compare(df, duck.sql(registry.ORACLES["iceberg_orc_scan"]), "iceberg_orc_scan")


def test_orc_rows_match_plain_nation(spark, sf_dir):
    """Row-level equality: the ORC leg attaches directory-only partition
    values as typed literals, the parquet leg reads them in-file, and the
    union matches the source table exactly."""
    t = _orc_table(spark, sf_dir)
    got = sorted(
        (r.n_nationkey, r.n_name, r.n_regionkey)
        for r in t.to_df(spark).collect()
    )
    want = sorted(
        (r.n_nationkey, r.n_name, r.n_regionkey)
        for r in spark.read.parquet(f"{sf_dir}/nation.parquet").collect()
    )
    assert got == want


def test_orc_partition_pruning_applies(spark, sf_dir):
    """Manifest partition values prune ORC files exactly like parquet
    ones — the pruning layer is format-agnostic."""
    t = _orc_table(spark, sf_dir)
    pred = ("=", "n_regionkey", 3)
    files = t.files(pred)
    assert {f.partition["n_regionkey"] for f in files} == {3}
    assert all(f.file_format == "ORC" for f in files)
    rows = t.to_df(spark, filters=pred).collect()
    assert {r.n_regionkey for r in rows} == {3}


def test_unknown_format_refuses_loudly(spark, sf_dir):
    """A data file of a format outside the supported trio
    (PARQUET/ORC/AVRO — AVRO gained a real scan leg in r14) must raise
    a typed error naming the file and format — not reach a reader."""
    t = _orc_table(spark, sf_dir)
    files = t.files()
    files[0].file_format = "CSV"
    with pytest.raises(UnsupportedFileFormatError, match="CSV") as ei:
        t._scan_files(spark, files, None, deletes=[], eq_deletes=[])
    assert files[0].path in str(ei.value)


def test_datasource_plan_refuses_orc(spark, sf_dir):
    from datafusion_iceberg_spark.sources.iceberg_datasource import _plan_files

    t = _orc_table(spark, sf_dir)
    with pytest.raises(UnsupportedFileFormatError, match="ORC"):
        _plan_files(t, None)


def test_orc_with_deletes_refuses(spark, sf_dir):
    t = _orc_table(spark, sf_dir)
    files = t.files()
    fake_del = files[0]  # any DataFile works as a stand-in delete entry
    with pytest.raises(UnsupportedFileFormatError, match="MOR deletes"):
        t._scan_files(spark, files, None, deletes=[fake_del], eq_deletes=[])


# ---------------------------------------------------------------------------
# Round 14: AVRO data files through the pure-Python codec (executor-side)
# ---------------------------------------------------------------------------


def _avro_table(spark, tmp_path, deletes=False):
    import json as _json
    import os
    import time as _time
    import uuid as _uuid

    from datafusion_iceberg_spark.iceberg.avro import write_avro_file
    from datafusion_iceberg_spark.iceberg.writer import (
        _MANIFEST_LIST_SCHEMA,
        _manifest_schema,
    )

    root = str(tmp_path / "avtbl")
    data_dir, meta_dir = os.path.join(root, "data"), os.path.join(root, "metadata")
    os.makedirs(data_dir)
    os.makedirs(meta_dir)
    rec = {
        "type": "record",
        "name": "t",
        "fields": [
            {"name": "k", "type": ["null", "long"]},
            {"name": "s", "type": ["null", "string"]},
        ],
    }
    entries = []
    for g in range(3):
        p = os.path.join(data_dir, f"g{g}.avro")
        write_avro_file(
            p, rec, [{"k": g * 10 + i, "s": f"v{g}_{i}"} for i in range(5)]
        )
        entries.append(
            {
                "status": 1,
                "snapshot_id": 9001,
                "data_file": {
                    "file_path": p,
                    "file_format": "AVRO",
                    "partition": {"g": g},
                    "record_count": 5,
                    "file_size_in_bytes": os.path.getsize(p),
                    "block_size_in_bytes": 67108864,
                },
            }
        )
    m_path = os.path.join(meta_dir, "m.avro")
    write_avro_file(
        m_path, _manifest_schema([{"name": "g", "avro_type": "long"}]), entries
    )
    ml = os.path.join(meta_dir, "ml.avro")
    write_avro_file(
        ml,
        _MANIFEST_LIST_SCHEMA,
        [
            {
                "manifest_path": m_path,
                "manifest_length": os.path.getsize(m_path),
                "partition_spec_id": 0,
                "sequence_number": 1,
                "min_sequence_number": 1,
                "added_snapshot_id": 9001,
                "added_data_files_count": 3,
                "existing_data_files_count": 0,
                "deleted_data_files_count": 0,
                "partitions": None,
                "added_rows_count": 15,
                "existing_rows_count": 0,
                "deleted_rows_count": 0,
                "content": 0,
            }
        ],
    )
    now = int(_time.time() * 1000)
    meta = {
        "format-version": 2,
        "table-uuid": str(_uuid.uuid4()),
        "location": root,
        "last-updated-ms": now,
        "last-column-id": 3,
        "last-sequence-number": 1,
        "schemas": [
            {
                "type": "struct",
                "schema-id": 0,
                "fields": [
                    {"id": 1, "name": "k", "required": False, "type": "long"},
                    {"id": 2, "name": "s", "required": False, "type": "string"},
                    {"id": 3, "name": "g", "required": False, "type": "long"},
                ],
            }
        ],
        "current-schema-id": 0,
        "partition-specs": [
            {
                "spec-id": 0,
                "fields": [
                    {
                        "name": "g",
                        "transform": "identity",
                        "source-id": 3,
                        "field-id": 1000,
                    }
                ],
            }
        ],
        "default-spec-id": 0,
        "last-partition-id": 1000,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "default-sort-order-id": 0,
        "snapshots": [
            {
                "snapshot-id": 9001,
                "timestamp-ms": now,
                "sequence-number": 1,
                "manifest-list": ml,
                "summary": {"operation": "append"},
                "schema-id": 0,
            }
        ],
        "current-snapshot-id": 9001,
        "snapshot-log": [{"snapshot-id": 9001, "timestamp-ms": now}],
        "metadata-log": [],
    }
    with open(os.path.join(meta_dir, "v1.metadata.json"), "w") as fh:
        _json.dump(meta, fh)
    from datafusion_iceberg_spark.iceberg.table import IcebergTable

    return IcebergTable.load(root)


def test_avro_scan_rows_partition_attach_and_pruning(spark, tmp_path):
    t = _avro_table(spark, tmp_path)
    rows = sorted(map(tuple, t.to_df(spark).collect()))
    assert len(rows) == 15
    assert rows[0] == (0, "v0_0", 0)
    # identity partition value attached from the manifest tuple
    assert {r[2] for r in rows} == {0, 1, 2}
    # planning-time pruning on the partition value
    pruned = t.files(("=", "g", 1))
    assert len(pruned) == 1
    got = sorted(r.k for r in t.to_df(spark, filters=("=", "g", 1)).collect())
    assert got == [10, 11, 12, 13, 14]


def test_avro_scan_refusals(spark, tmp_path):
    import pytest

    from datafusion_iceberg_spark.iceberg.table import (
        UnsupportedFileFormatError,
    )

    t = _avro_table(spark, tmp_path)
    with pytest.raises(UnsupportedFileFormatError, match="row-position"):
        t._scan_files(spark, t.files(), None, _with_row_meta=True)
    fake_del = t.files()[:1]
    with pytest.raises(UnsupportedFileFormatError, match="MOR deletes"):
        t._scan_files(spark, t.files(), None, deletes=fake_del)


def test_avro_gate_matches_oracle(spark, duck, sf_dir):
    from datafusion_iceberg_spark import registry
    from tests.oracle_compare import compare

    registry.load_all_modules()
    name = "iceberg_avro_scan"
    compare(
        registry.QUERIES[name](spark, sf_dir),
        duck.sql(registry.ORACLES[name]),
        name,
    )
