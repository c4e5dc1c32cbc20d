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
    """An AVRO data file (spec-legal) must raise a typed error naming the
    file and format — not reach a reader."""
    t = _orc_table(spark, sf_dir)
    files = t.files()
    files[0].file_format = "AVRO"
    with pytest.raises(UnsupportedFileFormatError, match="AVRO") as ei:
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
