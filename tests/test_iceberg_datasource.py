"""Spark 4 Python DataSource for Iceberg (sources/iceberg_datasource.py):
split handoff, pruning, refusal rules, snapshot/ref pins, streaming tail."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from datafusion_iceberg_spark.iceberg.queries import fixture
from datafusion_iceberg_spark.sources.iceberg_datasource import (
    IcebergPyReader,
    _plan_files,
    register_iceberg_datasource,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def fx(spark):
    f = fixture(spark, SF_DIR)
    register_iceberg_datasource(spark)
    return f


def test_batch_read_matches_to_df(spark, fx):
    root = fx.orders.metadata.root
    ds = spark.read.format("iceberg_py").option("path", root).load()
    ref = fx.orders.to_df(spark)
    assert ds.count() == ref.count()
    assert sorted(ds.columns) == sorted(ref.columns)
    a = {
        (r.o_orderstatus, r.n)
        for r in ds.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    b = {
        (r.o_orderstatus, r.n)
        for r in ref.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert a == b


def test_partition_pruning_plans_fewer_files(spark, fx):
    """pushFilters -> _plan_files must skip non-matching partition files
    before any executor task is created."""
    def n_files(parts):
        return sum(len(p.chunks) for p in parts)

    all_parts = _plan_files(fx.orders, None)
    pruned = _plan_files(fx.orders, ("=", "o_orderstatus", "F"))
    assert 0 < n_files(pruned) < n_files(all_parts)
    # and a filtered read through Spark is still exact
    n = (
        spark.read.format("iceberg_py")
        .option("path", fx.orders.metadata.root)
        .load()
        .filter("o_orderstatus = 'F'")
        .count()
    )
    assert n == fx.orders.to_df(spark).filter("o_orderstatus = 'F'").count()


def test_snapshot_and_ref_pins(spark, fx):
    root = fx.orders.metadata.root
    n1 = (
        spark.read.format("iceberg_py")
        .option("path", root)
        .option("snapshot_id", str(fx.snap1))
        .load()
        .count()
    )
    assert n1 == fx.orders.to_df(spark, snapshot_id=fx.snap1).count()
    fx.catalog.create_tag("sales.orders", "pre_odd", fx.snap1)
    n2 = (
        spark.read.format("iceberg_py")
        .option("path", root)
        .option("ref", "pre_odd")
        .load()
        .count()
    )
    assert n2 == n1


def test_mor_snapshot_refuses_without_apply_deletes(spark, fx):
    """Direct _plan_files callers must OPT IN to MOR masking
    (apply_deletes) — the default refuses so a caller that cannot mask
    (e.g. a plain file lister) never silently over-reads; the batch
    READER path opts in (see test_batch_read_applies_mor_deletes)."""
    from datafusion_iceberg_spark.iceberg.queries import _cdc_fixture

    cdc = _cdc_fixture(spark, SF_DIR).load("cdc.orders")
    with pytest.raises(Exception, match="delete files"):
        _plan_files(cdc, None)
    assert _plan_files(cdc, None, apply_deletes=True)  # plans fine


def test_streaming_tail_with_checkpoint(spark, fx, tmp_path):
    from datafusion_iceberg_spark.iceberg.catalog import Catalog
    from datafusion_iceberg_spark.tables import load_table

    root = str(tmp_path / "wh_stream")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    for d in (root, ckpt, out):
        shutil.rmtree(d, ignore_errors=True)
    cat = Catalog(root)
    nation = load_table(spark, SF_DIR, "nation")
    cat.create_table("t.n", nation.schema)
    cat.append("t.n", spark, nation.filter(F.col("n_nationkey") < 20))
    troot = cat.load("t.n").metadata.root

    def run_once():
        q = (
            spark.readStream.format("iceberg_py")
            .option("path", troot)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    assert spark.read.parquet(out).count() == 20
    cat.append("t.n", spark, nation.filter(F.col("n_nationkey") >= 20))
    run_once()
    got = spark.read.parquet(out)
    # exactly the 5 appended rows arrived in the second batch
    assert got.count() == 25
    assert got.select("n_nationkey").distinct().count() == 25


def test_rename_evolution_reads_by_field_id(spark, fx, tmp_path):
    """Files written under an old column name read correctly through the
    DS (columns resolve by PARQUET:field_id, r10 — the r2-r9 reader
    refused these tables outright); a column no file can resolve (added
    after the write, initial-default territory) still refuses."""
    import shutil

    from datafusion_iceberg_spark.iceberg.catalog import Catalog
    from datafusion_iceberg_spark.tables import load_table

    root = str(tmp_path / "wh_rename")
    shutil.rmtree(root, ignore_errors=True)
    cat = Catalog(root)
    nation = load_table(spark, SF_DIR, "nation")
    cat.create_table("t.n", nation.schema)
    cat.append("t.n", spark, nation)
    cat.rename_column("t.n", "n_name", "nation_name")
    t = cat.load("t.n")
    parts = _plan_files(t, None)
    assert parts and all(p.fids for p in parts)
    register_iceberg_datasource(spark)
    via_ds = (
        spark.read.format("iceberg_py")
        .option("path", os.path.join(root, "t", "n"))
        .load()
    )
    want = sorted(
        (r.n_nationkey, r.nation_name)
        for r in t.to_df(spark).select("n_nationkey", "nation_name").collect()
    )
    got = sorted(
        (r.n_nationkey, r.nation_name)
        for r in via_ds.select("n_nationkey", "nation_name").collect()
    )
    assert got == want and len(got) == 25
    # a post-write ADD COLUMN still refuses (default-fill lives in to_df)
    from pyspark.sql import types as _T

    cat.add_column("t.n", "extra", _T.IntegerType())
    with pytest.raises(ValueError, match="lacks column"):
        _plan_files(cat.load("t.n"), None)


# -- write path -----------------------------------------------------------


@pytest.fixture()
def write_wh(spark, tmp_path):
    from datafusion_iceberg_spark.iceberg.catalog import Catalog
    from datafusion_iceberg_spark.tables import load_table

    register_iceberg_datasource(spark)
    root = str(tmp_path / "pyds_wh")
    cat = Catalog(root)
    nation = load_table(spark, SF_DIR, "nation")
    cat.create_table("w.nat", nation.schema)
    yield cat, nation, os.path.join(root, "w", "nat")
    shutil.rmtree(root, ignore_errors=True)


def test_writer_append_and_overwrite(spark, write_wh):
    from datafusion_iceberg_spark.iceberg.table import IcebergTable

    cat, nation, tbl_root = write_wh
    nation.write.format("iceberg_py").option("path", tbl_root).mode(
        "append"
    ).save()
    t = IcebergTable.load(tbl_root)
    assert t.to_df(spark).count() == nation.count()
    # one snapshot per write job, stats usable by the pruning kernel
    assert len(t.metadata.snapshots) == 1
    assert all(f.lower_bounds for f in t.files())
    nation.limit(5).write.format("iceberg_py").option("path", tbl_root).mode(
        "append"
    ).save()
    t = IcebergTable.load(tbl_root)
    assert t.to_df(spark).count() == nation.count() + 5
    # overwrite = ONE atomic replace snapshot
    n_snaps = len(t.metadata.snapshots)
    nation.limit(7).write.format("iceberg_py").option("path", tbl_root).mode(
        "overwrite"
    ).save()
    t = IcebergTable.load(tbl_root)
    assert t.to_df(spark).count() == 7
    assert len(t.metadata.snapshots) == n_snaps + 1
    # round trip through the DataSource reader
    back = spark.read.format("iceberg_py").option("path", tbl_root).load()
    assert back.count() == 7


def test_writer_cow_delete_on_ds_written_files(spark, write_wh):
    """Files written by the DataSource (pyarrow, no PARQUET:field_id
    metadata) must still support the catalog write path: stats are keyed
    by name->field-id at commit, so pruning and COW rewrite work."""
    from datafusion_iceberg_spark.iceberg.table import IcebergTable

    cat, nation, tbl_root = write_wh
    nation.write.format("iceberg_py").option("path", tbl_root).mode(
        "append"
    ).save()
    cat2 = type(cat)(cat.warehouse)  # fresh mirror sees the DS commit
    cat2.delete_where("w.nat", spark, ("=", "n_nationkey", 1))
    t = IcebergTable.load(tbl_root)
    assert t.to_df(spark).filter(F.col("n_nationkey") == 1).count() == 0
    assert t.to_df(spark).count() == nation.count() - 1


def test_writer_refuses_partitioned_and_mismatched(spark, write_wh, tmp_path):
    from datafusion_iceberg_spark.iceberg.catalog import Catalog
    from datafusion_iceberg_spark.tables import load_table

    cat, nation, tbl_root = write_wh
    # column mismatch
    with pytest.raises(Exception, match="do not match"):
        nation.select("n_nationkey").write.format("iceberg_py").option(
            "path", tbl_root
        ).mode("append").save()
    # partitioned table refused
    cat.create_table(
        "w.part_nat", nation.schema, partition_by=["n_regionkey"]
    )
    with pytest.raises(Exception, match="partitioned"):
        nation.write.format("iceberg_py").option(
            "path", os.path.join(cat.warehouse, "w", "part_nat")
        ).mode("append").save()


def test_stream_writer_sink_and_replay_idempotent(spark, tmp_path):
    """writeStream.format('iceberg_py'): one snapshot per micro-batch;
    a replayed batch id must not double-commit."""
    import pyarrow.parquet as pq

    from datafusion_iceberg_spark.iceberg.catalog import Catalog
    from datafusion_iceberg_spark.iceberg.table import IcebergTable
    from datafusion_iceberg_spark.sources.iceberg_datasource import (
        IcebergPyStreamWriter,
        IcebergWriteMessage,
    )
    from datafusion_iceberg_spark.tables import load_table, table_path

    register_iceberg_datasource(spark)
    root = str(tmp_path / "swh")
    cat = Catalog(root)
    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "event_type", "value"
    )
    cat.create_table("s.ev", ev.schema)
    tbl_root = os.path.join(root, "s", "ev")
    stage = os.path.join(root, "_src")
    os.makedirs(stage)
    t = pq.read_table(
        table_path(SF_DIR, "events"),
        columns=["event_id", "event_type", "value"],
    )
    half = t.num_rows // 2
    pq.write_table(t.slice(0, half), os.path.join(stage, "a.parquet"))
    pq.write_table(t.slice(half), os.path.join(stage, "b.parquet"))
    raw = spark.read.parquet(os.path.join(stage, "a.parquet")).schema
    stream = (
        spark.readStream.schema(raw)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    q = (
        stream.writeStream.format("iceberg_py")
        .option("path", tbl_root)
        .option("checkpointLocation", os.path.join(root, "_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    tb = IcebergTable.load(tbl_root)
    assert tb.to_df(spark).count() == t.num_rows
    assert [s.summary.get("operation") for s in tb.metadata.snapshots] == [
        "append",
        "append",
    ]
    # simulate a REPLAY of batch 1: the ledger must skip the commit
    w = IcebergPyStreamWriter(tbl_root, "")
    n_before = len(IcebergTable.load(tbl_root).metadata.snapshots)
    fake = os.path.join(tbl_root, "data", "pyds-stream", "replay.parquet")
    pq.write_table(t.slice(0, 3), fake)
    w.commit([IcebergWriteMessage(paths=[fake], rows=3)], batchId=1)
    tb2 = IcebergTable.load(tbl_root)
    assert len(tb2.metadata.snapshots) == n_before  # no new snapshot
    assert not os.path.exists(fake)  # re-staged file cleaned up
    assert tb2.to_df(spark).count() == t.num_rows


def test_stream_pipe_iceberg_to_iceberg(spark, tmp_path):
    """Composability: readStream from one Iceberg table (snapshot-tail
    source) -> projection -> writeStream into another (per-batch
    snapshot sink).  The downstream table must equal the transform of
    the upstream, and appending upstream + re-running the pipe must
    carry ONLY the new rows (offsets + ledger cooperate)."""
    from datafusion_iceberg_spark.iceberg.catalog import Catalog
    from datafusion_iceberg_spark.iceberg.table import IcebergTable
    from datafusion_iceberg_spark.tables import load_table

    register_iceberg_datasource(spark)
    root = str(tmp_path / "pipe")
    cat = Catalog(root)
    nation = load_table(spark, SF_DIR, "nation").select(
        "n_nationkey", "n_name"
    )
    cat.create_table("p.src", nation.schema)
    cat.append("p.src", spark, nation.filter(F.col("n_nationkey") < 15))
    src_root = os.path.join(root, "p", "src")

    out_schema = (
        nation.withColumn("name_len", F.length("n_name")).schema
    )
    cat.create_table("p.dst", out_schema)
    dst_root = os.path.join(root, "p", "dst")

    def run_pipe():
        stream = (
            spark.readStream.format("iceberg_py").option("path", src_root).load()
        )
        q = (
            stream.withColumn("name_len", F.length("n_name"))
            .writeStream.format("iceberg_py")
            .option("path", dst_root)
            .option("checkpointLocation", os.path.join(root, "_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    run_pipe()
    dst = IcebergTable.load(dst_root)
    assert dst.to_df(spark).count() == 15
    # upstream advances; the pipe resumes from its checkpointed offset
    cat.append("p.src", spark, nation.filter(F.col("n_nationkey") >= 15))
    run_pipe()
    dst = IcebergTable.load(dst_root)
    got = {
        (r.n_nationkey, r.name_len)
        for r in dst.to_df(spark).collect()
    }
    want = {
        (r.n_nationkey, len(r.n_name)) for r in nation.collect()
    }
    assert got == want  # exactly-once: no dupes, nothing missing


def test_batch_commit_ignores_straggler_files(spark, write_wh):
    """A failed/retried/speculative task attempt can leave a (possibly
    truncated) parquet file in the staging dir.  The job-level commit
    must publish ONLY the files reported by successful task commit
    messages — never sweep the directory (ADVICE r5, high)."""
    import pyarrow as pa

    from datafusion_iceberg_spark.iceberg.table import IcebergTable
    from datafusion_iceberg_spark.sources.iceberg_datasource import (
        IcebergPyWriter,
        IcebergWriteMessage,
    )

    cat, nation, tbl_root = write_wh
    schema_hex = pa.schema([("n_nationkey", pa.int64())]).serialize().hex()
    w = IcebergPyWriter(tbl_root, overwrite=False, arrow_schema_json=schema_hex)
    os.makedirs(w._dir)
    # the "successful" task file
    import pyarrow.parquet as pq

    good = os.path.join(w._dir, "part-good.parquet")
    pq.write_table(
        pa.table({"n_nationkey": list(range(10))}), good
    )
    # a truncated straggler from a dead attempt: invalid parquet footer
    bad = os.path.join(w._dir, "part-dead-attempt.parquet")
    with open(bad, "wb") as fh:
        fh.write(b"PAR1\x00\x00broken")
    w.commit([IcebergWriteMessage(paths=[good], rows=10)])
    t = IcebergTable.load(tbl_root)
    assert t.to_df(spark).count() == 10  # straggler not committed
    assert not os.path.exists(bad)  # and cleaned from staging
    committed = {f.path for f in t.files()}
    assert good in committed and bad not in committed


def test_stream_replay_detected_without_ledger(spark, tmp_path):
    """Exactly-once must not depend on the ledger file: the batch id is
    stamped into the snapshot summary in the SAME atomic metadata commit,
    so replay after a crash between commit and ledger write (or after
    ledger corruption) is still detected (ADVICE r5, low)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from datafusion_iceberg_spark.iceberg.catalog import Catalog
    from datafusion_iceberg_spark.iceberg.table import IcebergTable
    from datafusion_iceberg_spark.sources.iceberg_datasource import (
        IcebergPyStreamWriter,
        IcebergWriteMessage,
    )
    from pyspark.sql import types as T

    root = str(tmp_path / "swh2")
    cat = Catalog(root)
    cat.create_table(
        "s.t", T.StructType([T.StructField("x", T.LongType())])
    )
    tbl_root = os.path.join(root, "s", "t")
    w = IcebergPyStreamWriter(tbl_root, "")
    stage = os.path.join(tbl_root, "data", "pyds-stream")
    os.makedirs(stage, exist_ok=True)

    def stage_file(name, vals):
        p = os.path.join(stage, name)
        pq.write_table(pa.table({"x": vals}), p)
        return p

    w.commit([IcebergWriteMessage(paths=[stage_file("b0.parquet", [1, 2])], rows=2)], batchId=0)
    # crash scenario: ledger lost AND corrupted variants
    os.remove(w._ledger())
    w.commit([IcebergWriteMessage(paths=[stage_file("b0r.parquet", [1, 2])], rows=2)], batchId=0)
    t = IcebergTable.load(tbl_root)
    assert len(t.metadata.snapshots) == 1  # replay skipped via summary stamp
    assert t.to_df(spark).count() == 2
    with open(w._ledger(), "w") as fh:
        fh.write("{corrupt")
    w.commit([IcebergWriteMessage(paths=[stage_file("b1.parquet", [3])], rows=1)], batchId=1)
    t = IcebergTable.load(tbl_root)
    assert t.to_df(spark).count() == 3  # new batch still commits
    assert [
        s.summary.get("pyds-stream-batch-id") for s in t.metadata.snapshots
    ] == ["0", "1"]


def test_stream_rate_limit_bounds_batches(spark, tmp_path):
    """max_snapshots_per_batch drains a 5-commit backlog in bounded
    micro-batches (ceil(5/2) = 3 with rows) instead of one catch-up
    batch, and every row still arrives exactly once."""
    import shutil

    from datafusion_iceberg_spark.iceberg.catalog import Catalog
    from datafusion_iceberg_spark.tables import load_table

    register_iceberg_datasource(spark)
    root = str(tmp_path / "wh_rate")
    ckpt = str(tmp_path / "ckpt_rate")
    out = str(tmp_path / "out_rate")
    for d in (root, ckpt, out):
        shutil.rmtree(d, ignore_errors=True)
    cat = Catalog(root)
    nation = load_table(spark, SF_DIR, "nation")
    cat.create_table("t.n", nation.schema)
    for i in range(5):
        cat.append(
            "t.n", spark, nation.filter(F.col("n_nationkey") % 5 == i)
        )
    troot = cat.load("t.n").metadata.root

    batch_rows = []

    def sink(df, batch_id):
        batch_rows.append(df.count())

    q = (
        spark.readStream.format("iceberg_py")
        .option("path", troot)
        .option("max_snapshots_per_batch", "2")
        .load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="1 seconds")
        .start()
    )
    try:
        import time

        deadline = time.time() + 120
        while sum(batch_rows) < 25 and time.time() < deadline:
            time.sleep(1)
    finally:
        q.stop()
    assert sum(batch_rows) == 25
    nonzero = [b for b in batch_rows if b > 0]
    # 5 snapshots at <= 2 per batch: at least 3 data-carrying batches,
    # and no single batch saw the whole backlog
    assert len(nonzero) >= 3
    assert max(nonzero) < 25


# --- CDC stream mode (round 7) ---------------------------------------------


def _cdc_stream_rows(spark, table_root, out_dir, ckpt):
    q = (
        spark.readStream.format("iceberg_py")
        .option("path", table_root)
        .option("mode", "cdc")
        .load()
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.read.parquet(out_dir)


def test_cdc_stream_emits_dv_delta_only(spark, tmp_path):
    """Overlapping DV deletes: the second snapshot streams ONLY its
    fresh positions (bitmap delta), not the merged vector."""
    from datafusion_iceberg_spark.iceberg.catalog import Catalog
    from datafusion_iceberg_spark.tables import load_table

    register_iceberg_datasource(spark)
    cat = Catalog(str(tmp_path / "wh"), name="cdcx")
    nation = load_table(spark, SF_DIR, "nation")
    cat.create_table(
        "c.n", nation.schema,
        properties={"write.delete.mode": "deletion-vector"},
    )
    cat.append("c.n", spark, nation)
    cat.sql(spark, "DELETE FROM cdcx.c.n WHERE n_nationkey IN (2, 4)")
    cat.sql(spark, "DELETE FROM cdcx.c.n WHERE n_nationkey IN (4, 9)")
    rows = _cdc_stream_rows(
        spark,
        str(tmp_path / "wh" / "c" / "n"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    dels = (
        rows.filter(F.col("_change_type") == "delete")
        .groupBy("_change_ordinal")
        .agg(F.sort_array(F.collect_list("n_nationkey")).alias("ks"))
        .orderBy("_change_ordinal")
        .collect()
    )
    assert [list(r.ks) for r in dels] == [[2, 4], [9]]
    ins = rows.filter(F.col("_change_type") == "insert")
    assert ins.count() == 25 and ins.agg(F.max("_change_ordinal")).first()[0] == 0


def test_cdc_stream_skips_replace_snapshots(spark, tmp_path):
    from datafusion_iceberg_spark.iceberg.catalog import Catalog
    from datafusion_iceberg_spark.tables import load_table

    register_iceberg_datasource(spark)
    cat = Catalog(str(tmp_path / "wh"), name="cdcr")
    nation = load_table(spark, SF_DIR, "nation")
    cat.create_table(
        "c.n", nation.schema,
        properties={"write.delete.mode": "deletion-vector"},
    )
    cat.append("c.n", spark, nation)
    cat.sql(spark, "DELETE FROM cdcr.c.n WHERE n_nationkey < 3")
    cat.compact("c.n", spark)  # replace snapshot: no logical change
    rows = _cdc_stream_rows(
        spark,
        str(tmp_path / "wh" / "c" / "n"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    by_type = {
        r["_change_type"]: r["n"]
        for r in rows.groupBy("_change_type").agg(F.count("*").alias("n")).collect()
    }
    assert by_type == {"insert": 25, "delete": 3}


def test_cdc_stream_parquet_position_deletes(spark, tmp_path):
    """r8 (VERDICT r7 task 7): merge-on-read parquet position-delete
    histories stream in mode=cdc — each fresh delete file's positions
    (minus the prior snapshot's deletes for the same targets) emit as
    delete rows with old images."""
    from datafusion_iceberg_spark.iceberg.catalog import Catalog
    from datafusion_iceberg_spark.tables import load_table

    register_iceberg_datasource(spark)
    cat = Catalog(str(tmp_path / "wh"), name="cdcp")
    nation = load_table(spark, SF_DIR, "nation")
    cat.create_table(
        "c.n", nation.schema,
        properties={"write.delete.mode": "merge-on-read"},
    )
    cat.append("c.n", spark, nation)
    cat.sql(spark, "DELETE FROM cdcp.c.n WHERE n_nationkey IN (2, 4)")
    cat.sql(spark, "DELETE FROM cdcp.c.n WHERE n_nationkey IN (9, 11)")
    rows = _cdc_stream_rows(
        spark,
        str(tmp_path / "wh" / "c" / "n"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    dels = (
        rows.filter(F.col("_change_type") == "delete")
        .groupBy("_change_ordinal")
        .agg(F.sort_array(F.collect_list("n_nationkey")).alias("ks"))
        .orderBy("_change_ordinal")
        .collect()
    )
    assert [list(r.ks) for r in dels] == [[2, 4], [9, 11]]
    ins = rows.filter(F.col("_change_type") == "insert")
    assert ins.count() == 25
    # the stream's net effect equals the batch changelog's
    log = cat.load("c.n").changelog_df(spark)
    assert (
        log.filter(F.col("_change_type") == "delete").count()
        == rows.filter(F.col("_change_type") == "delete").count()
    )


def test_cdc_stream_mor_update_row_delta(spark, tmp_path):
    """MOR UPDATE row-delta snapshots (parquet position deletes +
    replacement files) stream as delete+insert pairs."""
    from datafusion_iceberg_spark.iceberg.catalog import Catalog
    from datafusion_iceberg_spark.tables import load_table

    register_iceberg_datasource(spark)
    cat = Catalog(str(tmp_path / "wh"), name="cdcu")
    nation = load_table(spark, SF_DIR, "nation")
    cat.create_table(
        "c.n", nation.schema,
        properties={
            "write.delete.mode": "merge-on-read",
            "write.update.mode": "merge-on-read",
        },
    )
    cat.append("c.n", spark, nation)
    cat.sql(
        spark,
        "UPDATE cdcu.c.n SET n_name = 'REDACTED' WHERE n_nationkey IN (3, 7)",
    )
    rows = _cdc_stream_rows(
        spark,
        str(tmp_path / "wh" / "c" / "n"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    upd = rows.filter(F.col("_change_ordinal") == 1)
    dels = upd.filter(F.col("_change_type") == "delete")
    ins = upd.filter(F.col("_change_type") == "insert")
    assert sorted(r.n_nationkey for r in dels.collect()) == [3, 7]
    assert sorted(r.n_nationkey for r in ins.collect()) == [3, 7]
    assert {r.n_name for r in ins.collect()} == {"REDACTED"}
    assert {r.n_name for r in dels.collect()} != {"REDACTED"}


def test_cdc_stream_equality_deletes(spark, tmp_path):
    """r8: EQUALITY-delete snapshots stream in mode=cdc — each fresh key
    file resolves to the matching rows of strictly-older data files
    (minus rows the prior snapshot already deleted) and emits their old
    images.  A key deleted twice must NOT re-emit (the prior eq delete
    masks it)."""
    from datafusion_iceberg_spark.iceberg.catalog import Catalog
    from datafusion_iceberg_spark.tables import load_table

    register_iceberg_datasource(spark)
    cat = Catalog(str(tmp_path / "wh"), name="cdce")
    nation = load_table(spark, SF_DIR, "nation")
    cat.create_table("c.n", nation.schema)
    cat.append("c.n", spark, nation)
    cat.delete_where_eq(
        "c.n", spark, spark.createDataFrame([(1,), (2,)], "n_nationkey int")
    )
    # key 2 again (already gone, must not re-emit) + fresh key 3
    cat.delete_where_eq(
        "c.n", spark, spark.createDataFrame([(2,), (3,)], "n_nationkey int")
    )
    rows = _cdc_stream_rows(
        spark,
        str(tmp_path / "wh" / "c" / "n"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    dels = (
        rows.filter(F.col("_change_type") == "delete")
        .groupBy("_change_ordinal")
        .agg(F.sort_array(F.collect_list("n_nationkey")).alias("ks"))
        .orderBy("_change_ordinal")
        .collect()
    )
    assert [list(r.ks) for r in dels] == [[1, 2], [3]]
    # net effect equals the batch changelog's EXCEPT-ALL computation
    log = cat.load("c.n").changelog_df(spark)
    assert (
        log.filter(F.col("_change_type") == "delete").count()
        == rows.filter(F.col("_change_type") == "delete").count()
    )


def test_cdc_stream_upsert_history(spark, tmp_path):
    """An UPSERT snapshot (one commit: equality delete on the keys +
    the batch's data files) streams as delete+insert pairs: the old
    image of each updated key and the batch's rows — while the batch's
    OWN rows are never self-deleted (strictly-before rule)."""
    from datafusion_iceberg_spark.iceberg.catalog import Catalog

    register_iceberg_datasource(spark)
    cat = Catalog(str(tmp_path / "wh"), name="cdup")
    df = spark.createDataFrame([(1, 10), (2, 20), (3, 30)], "k long, v long")
    cat.create_table("c.t", df.schema)
    cat.append("c.t", spark, df)
    cat.set_identifier_fields("c.t", ["k"])
    cat.upsert(
        "c.t", spark, spark.createDataFrame([(2, 200), (4, 40)], "k long, v long")
    )
    rows = _cdc_stream_rows(
        spark,
        str(tmp_path / "wh" / "c" / "t"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    up = rows.filter(F.col("_change_ordinal") == rows.agg(
        F.max("_change_ordinal")
    ).first()[0])
    dels = [(r.k, r.v) for r in up.filter("_change_type = 'delete'").collect()]
    ins = sorted(
        (r.k, r.v) for r in up.filter("_change_type = 'insert'").collect()
    )
    assert dels == [(2, 20)]
    assert ins == [(2, 200), (4, 40)]


def test_cdc_stream_carries_row_ids_on_lineage_tables(spark, tmp_path):
    """mode=cdc on a row-lineage table: every change row carries its
    stable _row_id — positional for appended files, materialized for
    MOR-update replacement files, and the DV delete delta reports the
    ids of the removed rows."""
    from datafusion_iceberg_spark.iceberg.catalog import Catalog
    from datafusion_iceberg_spark.tables import load_table

    register_iceberg_datasource(spark)
    cat = Catalog(str(tmp_path / "wh"), name="cdl")
    nation = (
        load_table(spark, SF_DIR, "nation").orderBy("n_nationkey").coalesce(1)
    )
    cat.create_table(
        "c.n",
        nation.schema,
        properties={
            "write.row-lineage.enabled": "true",
            "write.delete.mode": "deletion-vector",
            "write.update.mode": "merge-on-read",
        },
    )
    cat.append("c.n", spark, nation)  # ids 0..24 (sorted single file)
    cat.sql(spark, "DELETE FROM cdl.c.n WHERE n_nationkey IN (3, 7)")
    cat.sql(spark, "UPDATE cdl.c.n SET n_name = 'UPD' WHERE n_nationkey = 4")
    rows = _cdc_stream_rows(
        spark,
        str(tmp_path / "wh" / "c" / "n"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    ).collect()
    by = {}
    for r in rows:
        by.setdefault((r["_change_ordinal"], r["_change_type"]), []).append(r)
    # append: 25 inserts with positional ids == keys (sorted file)
    ins0 = {r["n_nationkey"]: r["_row_id"] for r in by[(0, "insert")]}
    assert ins0 == {k: k for k in range(25)}
    # DV delete: removed rows report their ids
    del1 = {r["n_nationkey"]: r["_row_id"] for r in by[(1, "delete")]}
    assert del1 == {3: 3, 7: 7}
    # MOR update (row-delta at ordinal 2): delete of the old copy and
    # insert of the replacement BOTH carry the original id 4
    del2 = {r["n_nationkey"]: r["_row_id"] for r in by[(2, "delete")]}
    ins2 = {
        r["n_nationkey"]: (r["_row_id"], r["n_name"])
        for r in by[(2, "insert")]
    }
    assert del2 == {4: 4}
    assert ins2 == {4: (4, "UPD")}


def test_cdc_stream_checkpoint_restart(spark, tmp_path):
    """A CDC stream resumes from its checkpoint: commits landed while
    the stream was down are emitted exactly once on restart."""
    from datafusion_iceberg_spark.iceberg.catalog import Catalog
    from datafusion_iceberg_spark.tables import load_table

    register_iceberg_datasource(spark)
    cat = Catalog(str(tmp_path / "wh"), name="ckr")
    nation = load_table(spark, SF_DIR, "nation")
    cat.create_table(
        "c.n", nation.schema,
        properties={"write.delete.mode": "deletion-vector"},
    )
    cat.append("c.n", spark, nation.filter("n_nationkey < 10"))
    table_root = str(tmp_path / "wh" / "c" / "n")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _cdc_stream_rows(spark, table_root, out, ckpt)
    n1 = spark.read.parquet(out).count()
    assert n1 == 10
    # new commits while the stream is down
    cat.append("c.n", spark, nation.filter("n_nationkey BETWEEN 10 AND 14"))
    cat.sql(spark, "DELETE FROM ckr.c.n WHERE n_nationkey IN (1, 12)")
    # restart from the SAME checkpoint: only the new diff is emitted
    rows = _cdc_stream_rows(spark, table_root, out, ckpt)
    by = {}
    for r in rows.collect():
        by.setdefault((r["_change_ordinal"], r["_change_type"]), []).append(
            r["n_nationkey"]
        )
    assert sorted(by[(0, "insert")]) == list(range(10))  # not re-emitted
    assert sorted(by[(1, "insert")]) == [10, 11, 12, 13, 14]
    assert sorted(by[(2, "delete")]) == [1, 12]
    assert rows.count() == 10 + 5 + 2  # exactly once across both runs


def test_cdc_stream_file_removing_overwrites(spark, tmp_path):
    """r9 — the last CDC fence falls: a history of COW DELETE (file-
    removing overwrite snapshots) and INSERT OVERWRITE streams in
    mode=cdc, each snapshot's NET row diff computed executor-side per
    hash bucket, byte-equal to the batch changelog's EXCEPT-ALL legs."""
    from datafusion_iceberg_spark.iceberg.catalog import Catalog

    register_iceberg_datasource(spark)
    cat = Catalog(str(tmp_path / "wh"), name="cdow")
    df = spark.createDataFrame(
        [(i, i * 10) for i in range(1, 9)], "k long, v long"
    )
    cat.create_table("c.t", df.schema)
    cat.append("c.t", spark, df)                      # ordinal 0
    cat.sql(spark, "DELETE FROM cdow.c.t WHERE k IN (2, 5)")   # COW: removes+rewrites
    cat.sql(spark, "UPDATE cdow.c.t SET v = v + 1 WHERE k = 7")  # COW update
    cat.overwrite(                                    # INSERT OVERWRITE
        "c.t",
        spark,
        spark.createDataFrame([(100, 1), (101, 2)], "k long, v long"),
    )
    rows = _cdc_stream_rows(
        spark,
        str(tmp_path / "wh" / "c" / "t"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    log = cat.load("c.t").changelog_df(spark)
    key = lambda d: sorted(
        (r["k"], r["v"], r["_change_type"], r["_change_ordinal"])
        for r in d.collect()
    )
    assert key(rows) == key(log)
    # spot-check semantics: the COW delete emits ONLY the 2 deleted rows
    # (carried rows cancel), the update a delete+insert pair
    o1 = [r for r in rows.collect() if r["_change_ordinal"] == 1]
    assert sorted((r["k"], r["_change_type"]) for r in o1) == [
        (2, "delete"), (5, "delete"),
    ]
    o2 = sorted(
        (r["k"], r["v"], r["_change_type"])
        for r in rows.collect()
        if r["_change_ordinal"] == 2
    )
    assert o2 == [(7, 70, "delete"), (7, 71, "insert")]


def test_cdc_stream_overwrite_respects_prior_mor_coverage(spark, tmp_path):
    """A COW overwrite folding outstanding MOR deletes must NOT
    resurrect already-dead rows as CDC deletes: rows the prior
    snapshot's DV/position/equality deletes had killed were reported at
    their own ordinal."""
    from datafusion_iceberg_spark.iceberg.catalog import Catalog

    register_iceberg_datasource(spark)
    cat = Catalog(str(tmp_path / "wh"), name="cdow2")
    df = spark.createDataFrame(
        [(i, i * 10) for i in range(1, 7)], "k long, v long"
    )
    cat.create_table("c.t", df.schema)
    cat.append("c.t", spark, df)
    # MOR equality delete on k=3 (ordinal 1), then a COW delete on k=4
    # (ordinal 2) whose rewrite folds the eq-delete coverage
    cat.delete_where_eq(
        "c.t", spark, spark.createDataFrame([(3,)], "k long")
    )
    cat.delete_where("c.t", spark, "k = 4")
    rows = _cdc_stream_rows(
        spark,
        str(tmp_path / "wh" / "c" / "t"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    log = cat.load("c.t").changelog_df(spark)
    key = lambda d: sorted(
        (r["k"], r["v"], r["_change_type"], r["_change_ordinal"])
        for r in d.collect()
    )
    assert key(rows) == key(log)
    o2 = [r for r in rows.collect() if r["_change_ordinal"] == 2]
    assert sorted((r["k"], r["_change_type"]) for r in o2) == [(4, "delete")]


def test_batch_read_applies_mor_deletes(spark, tmp_path):
    """r9 — the DS batch fence falls: a table with outstanding parquet
    position deletes, DV deletes, AND equality deletes reads through
    format('iceberg_py') with executor-side masking, matching
    IcebergTable.to_df exactly."""
    from datafusion_iceberg_spark.iceberg.catalog import Catalog
    from datafusion_iceberg_spark.tables import load_table

    register_iceberg_datasource(spark)
    cat = Catalog(str(tmp_path / "wh"), name="morls")
    nation = load_table(spark, SF_DIR, "nation")
    cat.create_table("c.n", nation.schema)
    cat.append("c.n", spark, nation)
    # parquet position deletes
    cat.delete_where_mor("c.n", spark, ("<", "n_nationkey", 3))
    # equality deletes
    cat.delete_where_eq(
        "c.n", spark, spark.createDataFrame([(7,), (9,)], "n_nationkey int")
    )
    via_ds = (
        spark.read.format("iceberg_py")
        .option("path", str(tmp_path / "wh" / "c" / "n"))
        .load()
    )
    want = sorted(
        r.n_nationkey for r in cat.load("c.n").to_df(spark).collect()
    )
    got = sorted(r.n_nationkey for r in via_ds.collect())
    assert got == want
    assert all(k >= 3 and k not in (7, 9) for k in got)


def test_batch_read_applies_dv_deletes_with_rg_splits(spark, tmp_path):
    """DV coverage + a file large enough to split at row-group
    boundaries: masked positions stay file-absolute per slice."""
    from datafusion_iceberg_spark.iceberg.catalog import Catalog

    register_iceberg_datasource(spark)
    cat = Catalog(str(tmp_path / "wh"), name="mordv")
    df = spark.range(0, 50_000).selectExpr(
        "id AS k", "id * 2 AS v"
    ).coalesce(1)
    cat.create_table(
        "c.t", df.schema,
        properties={"write.delete.mode": "deletion-vector"},
    )
    cat.append("c.t", spark, df)
    cat.sql(spark, "DELETE FROM mordv.c.t WHERE k % 1000 = 7")
    via_ds = (
        spark.read.format("iceberg_py")
        .option("path", str(tmp_path / "wh" / "c" / "t"))
        .load()
    )
    assert via_ds.count() == 50_000 - 50
    assert via_ds.filter("k % 1000 = 7").count() == 0
    # aggregate equality against the anti-join path
    a = cat.load("c.t").to_df(spark).agg({"v": "sum"}).collect()[0][0]
    b = via_ds.agg({"v": "sum"}).collect()[0][0]
    assert a == b


def test_batch_read_eq_delete_respects_sequence_rule(spark, tmp_path):
    """A row re-inserted AFTER an equality delete survives the DS read
    (the delete applies only to strictly-older files)."""
    from datafusion_iceberg_spark.iceberg.catalog import Catalog

    register_iceberg_datasource(spark)
    cat = Catalog(str(tmp_path / "wh"), name="morseq")
    df = spark.createDataFrame([(1, 10), (2, 20)], "k long, v long")
    cat.create_table("c.t", df.schema)
    cat.append("c.t", spark, df)
    cat.delete_where_eq("c.t", spark, spark.createDataFrame([(1,)], "k long"))
    cat.append("c.t", spark, spark.createDataFrame([(1, 111)], "k long, v long"))
    via_ds = (
        spark.read.format("iceberg_py")
        .option("path", str(tmp_path / "wh" / "c" / "t"))
        .load()
    )
    got = {(r.k, r.v) for r in via_ds.collect()}
    assert got == {(1, 111), (2, 20)}


def test_columns_option_projects_reader_schema(spark, tmp_path):
    """r9: .option('columns', 'a,b') narrows the DataSource schema —
    the explicit projection-pushdown knob (pyspark's DS API has no
    pruning hook), so executors read only those parquet columns."""
    from datafusion_iceberg_spark.iceberg.catalog import Catalog
    from datafusion_iceberg_spark.tables import load_table

    register_iceberg_datasource(spark)
    cat = Catalog(str(tmp_path / "wh"), name="proj")
    nation = load_table(spark, SF_DIR, "nation")
    cat.create_table("c.n", nation.schema)
    cat.append("c.n", spark, nation)
    df = (
        spark.read.format("iceberg_py")
        .option("path", str(tmp_path / "wh" / "c" / "n"))
        .option("columns", "n_nationkey, n_name")
        .load()
    )
    assert df.columns == ["n_nationkey", "n_name"]
    assert df.count() == nation.count()
    # unknown columns refuse with the schema contract
    with pytest.raises(Exception, match="not in table schema"):
        (
            spark.read.format("iceberg_py")
            .option("path", str(tmp_path / "wh" / "c" / "n"))
            .option("columns", "nope")
            .load()
            .count()
        )
    # composes with MOR masking (key columns may be outside the
    # projection: coverage reads them independently from the file)
    cat.delete_where_eq(
        "c.n", spark, spark.createDataFrame([(1,), (2,)], "n_nationkey int")
    )
    got = (
        spark.read.format("iceberg_py")
        .option("path", str(tmp_path / "wh" / "c" / "n"))
        .option("columns", "n_name")
        .load()
        .count()
    )
    assert got == nation.count() - 2


def test_batch_read_eq_delete_after_rename_column(spark, tmp_path):
    """Equality deletes must keep applying through the DS fast path
    after a RENAME COLUMN: files written before the rename store the
    OLD parquet name, so key columns resolve by PARQUET:field_id —
    name lookups silently skipped the delete file and resurrected
    deleted rows, diverging from IcebergTable.to_df (r9 ADVICE)."""
    from datafusion_iceberg_spark.iceberg.catalog import Catalog

    register_iceberg_datasource(spark)
    cat = Catalog(str(tmp_path / "wh"), name="morren")
    df = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "k long, v long"
    )
    cat.create_table("c.t", df.schema)
    cat.append("c.t", spark, df)  # data files carry name 'k'
    cat.rename_column("c.t", "k", "key")
    # delete by the NEW name; the delete parquet carries 'key', the
    # data parquet carries 'k' — both resolve to field id 1
    cat.delete_where_eq(
        "c.t", spark, spark.createDataFrame([(2,)], "key long")
    )
    via_ds = (
        spark.read.format("iceberg_py")
        .option("path", str(tmp_path / "wh" / "c" / "t"))
        .load()
    )
    want = sorted(
        (r.key, r.v) for r in cat.load("c.t").to_df(spark).collect()
    )
    got = sorted((r.key, r.v) for r in via_ds.collect())
    assert got == want == [(1, 10), (3, 30)]


def test_ds_read_helper_projects_reader_schema(spark, tmp_path):
    """ds_read(columns=...) derives the DS `columns` option from the
    caller's projection (VERDICT r9 #9): the reader schema — and hence
    the parquet fetch — carries only the projected columns, no manual
    option required."""
    from datafusion_iceberg_spark.iceberg.catalog import Catalog
    from datafusion_iceberg_spark.sources.iceberg_datasource import ds_read
    from datafusion_iceberg_spark.tables import load_table

    register_iceberg_datasource(spark)
    cat = Catalog(str(tmp_path / "wh"), name="dsr")
    orders = load_table(spark, SF_DIR, "orders")
    cat.create_table("c.o", orders.schema)
    cat.append("c.o", spark, orders)
    root = str(tmp_path / "wh" / "c" / "o")
    df = ds_read(spark, root, columns=["o_orderkey", "o_totalprice"])
    # the READER schema is the projection — the Python worker never
    # materializes the other columns, and pyarrow reads only these two
    assert [f.name for f in df.schema.fields] == ["o_orderkey", "o_totalprice"]
    want = {
        (r.o_orderkey, r.o_totalprice)
        for r in cat.load("c.o")
        .to_df(spark)
        .select("o_orderkey", "o_totalprice")
        .collect()
    }
    assert {(r.o_orderkey, r.o_totalprice) for r in df.collect()} == want
    # unprojected helper read returns the full schema
    assert len(ds_read(spark, root).schema.fields) == len(orders.schema.fields)


def test_cdc_stream_lineage_over_cow_update(spark, tmp_path):
    """r10 — the LAST lineage fence falls (VERDICT r9 #3): a mode=cdc
    stream over a v3 row-lineage table with COW UPDATE/DELETE history
    carries _row_id on every change row and pairs an update's pre/post
    images as update_before/update_after, matching
    changelog_df(with_row_lineage=True) exactly.  Buckets partition by
    _row_id so the pairing is bucket-local — no distributed join."""
    from datafusion_iceberg_spark.iceberg.catalog import Catalog

    register_iceberg_datasource(spark)
    cat = Catalog(str(tmp_path / "wh"), name="cdlin")
    df = spark.createDataFrame(
        [(i, i * 10) for i in range(1, 9)], "k long, v long"
    )
    cat.create_table(
        "c.t", df.schema,
        properties={"write.row-lineage.enabled": "true"},
    )
    cat.append("c.t", spark, df)                                 # ord 0
    cat.sql(spark, "UPDATE cdlin.c.t SET v = v + 1 WHERE k IN (3, 7)")  # ord 1
    cat.sql(spark, "DELETE FROM cdlin.c.t WHERE k = 5")          # ord 2
    cat.append(                                                  # ord 3
        "c.t", spark, spark.createDataFrame([(9, 90)], df.schema)
    )

    rows = _cdc_stream_rows(
        spark,
        str(tmp_path / "wh" / "c" / "t"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    log = cat.load("c.t").changelog_df(spark, with_row_lineage=True)

    def key(d):
        return sorted(
            (r["k"], r["v"], r["_row_id"], r["_change_type"], r["_change_ordinal"])
            for r in d.collect()
        )

    assert key(rows) == key(log)
    # the updates surfaced as before/after pairs sharing an id
    pairs = [
        r for r in rows.collect()
        if r["_change_type"] in ("update_before", "update_after")
    ]
    assert sorted((r["k"], r["_change_type"], r["v"]) for r in pairs) == [
        (3, "update_after", 31),
        (3, "update_before", 30),
        (7, "update_after", 71),
        (7, "update_before", 70),
    ]
    by_id = {}
    for r in pairs:
        by_id.setdefault(r["_row_id"], set()).add(r["_change_type"])
    assert all(v == {"update_before", "update_after"} for v in by_id.values())
    # the DELETE stays a plain delete with its stable id
    dels = [r for r in rows.collect() if r["_change_type"] == "delete"]
    assert [(r["k"], r["v"]) for r in dels] == [(5, 50)]


def test_cdc_stream_reads_renamed_history_by_field_id(spark, tmp_path):
    """CDC old-image and diff reads resolve data columns by field id:
    files written before RENAME COLUMN stream with the CURRENT name
    (r10 — the same rule as batch to_df)."""
    from datafusion_iceberg_spark.iceberg.catalog import Catalog

    register_iceberg_datasource(spark)
    cat = Catalog(str(tmp_path / "wh"), name="cdrn")
    df = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "k long, v long"
    )
    cat.create_table("c.t", df.schema)
    cat.append("c.t", spark, df)           # files store 'v'
    cat.rename_column("c.t", "v", "val")   # current name 'val'
    cat.sql(spark, "DELETE FROM cdrn.c.t WHERE k = 2")  # COW overwrite diff
    rows = _cdc_stream_rows(
        spark,
        str(tmp_path / "wh" / "c" / "t"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    got = {
        (r["k"], r["val"], r["_change_type"], r["_change_ordinal"])
        for r in rows.collect()
    }
    assert got == {
        (1, 10, "insert", 0),
        (2, 20, "insert", 0),
        (3, 30, "insert", 0),
        (2, 20, "delete", 1),
    }


def test_stream_file_rate_limit_offsets_walk(spark, tmp_path):
    """max_files_per_batch (r11): offsets advance at FILE granularity
    through a single multi-file commit — {"ordinal", "file"} mid-snapshot
    boundaries, deterministic path-sorted slices, and the union of the
    capped windows covers every row exactly once."""
    import shutil

    from datafusion_iceberg_spark.iceberg.catalog import Catalog
    from datafusion_iceberg_spark.sources.iceberg_datasource import (
        IcebergPyStreamReader,
    )
    from datafusion_iceberg_spark.tables import load_table

    root = str(tmp_path / "wh_frate")
    shutil.rmtree(root, ignore_errors=True)
    cat = Catalog(root)
    nation = load_table(spark, SF_DIR, "nation")
    cat.create_table("t.n", nation.schema)
    cat.append("t.n", spark, nation.repartition(5))  # ONE 5-file snapshot
    table = cat.load("t.n")
    assert len(table.files()) == 5
    reader = IcebergPyStreamReader(
        table.metadata.root, table.to_df(spark).schema,
        max_files_per_batch=2,
    )
    offs = [reader.initialOffset()]
    for _ in range(10):
        nxt = reader.latestOffset()
        if nxt == offs[-1]:
            break
        offs.append(nxt)
    # 5 files at <=2/batch: -1 -> (0,2) -> (0,4) -> (1? no 2nd snapshot)
    assert offs == [
        {"ordinal": -1},
        {"ordinal": -1, "file": 2},
        {"ordinal": -1, "file": 4},
        {"ordinal": 0},
    ]
    seen = 0
    for s, e in zip(offs, offs[1:]):
        parts = reader.partitions(s, e)
        n_files = sum(len(p.chunks) for p in parts)
        assert n_files <= 2
        # count rows through the executor read path
        for p in parts:
            for b in reader.read(p):
                seen += b.num_rows
    assert seen == 25


def test_stream_file_rate_limit_end_to_end(spark, tmp_path):
    """The same cap through a real readStream: one 5-file commit drains
    in >=3 data-carrying micro-batches, no batch sees the whole table,
    every row arrives exactly once."""
    import shutil
    import time

    from datafusion_iceberg_spark.iceberg.catalog import Catalog
    from datafusion_iceberg_spark.tables import load_table

    register_iceberg_datasource(spark)
    root = str(tmp_path / "wh_frate2")
    ckpt = str(tmp_path / "ckpt_frate2")
    for d in (root, ckpt):
        shutil.rmtree(d, ignore_errors=True)
    cat = Catalog(root)
    nation = load_table(spark, SF_DIR, "nation")
    cat.create_table("t.n", nation.schema)
    cat.append("t.n", spark, nation.repartition(5))
    troot = cat.load("t.n").metadata.root

    batch_rows = []

    def sink(df, batch_id):
        batch_rows.append(df.count())

    q = (
        spark.readStream.format("iceberg_py")
        .option("path", troot)
        .option("max_files_per_batch", "2")
        .load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="1 seconds")
        .start()
    )
    try:
        deadline = time.time() + 120
        while sum(batch_rows) < 25 and time.time() < deadline:
            time.sleep(1)
    finally:
        q.stop()
    assert sum(batch_rows) == 25
    nonzero = [b for b in batch_rows if b > 0]
    assert len(nonzero) >= 3
    assert max(nonzero) < 25


def test_cdc_stream_refuses_file_rate_limit(spark, tmp_path):
    import shutil

    from datafusion_iceberg_spark.iceberg.catalog import Catalog
    from datafusion_iceberg_spark.tables import load_table

    register_iceberg_datasource(spark)
    root = str(tmp_path / "wh_frate3")
    shutil.rmtree(root, ignore_errors=True)
    cat = Catalog(root)
    nation = load_table(spark, SF_DIR, "nation")
    cat.create_table("t.n", nation.schema)
    cat.append("t.n", spark, nation)
    troot = cat.load("t.n").metadata.root
    with pytest.raises(Exception, match="max_files_per_batch"):
        (
            spark.readStream.format("iceberg_py")
            .option("path", troot)
            .option("mode", "cdc")
            .option("max_files_per_batch", "2")
            .load()
            .writeStream.format("noop")
            .start()
            .processAllAvailable()
        )


@pytest.mark.parametrize("seed", [7, 23])
def test_stream_file_rate_limit_fuzz(spark, tmp_path, seed):
    """Property: for random commit histories (1-5 files each, delete
    snapshots interleaved) and random caps, the offset walk covers every
    live row EXACTLY once with every batch at most cap files."""
    import random
    import shutil

    from datafusion_iceberg_spark.iceberg.catalog import Catalog
    from datafusion_iceberg_spark.sources.iceberg_datasource import (
        IcebergPyStreamReader,
    )

    rng = random.Random(seed)
    root = str(tmp_path / "wh_fuzz")
    shutil.rmtree(root, ignore_errors=True)
    cat = Catalog(root)
    df0 = spark.createDataFrame([(0, 0)], "k long, v long")
    cat.create_table("t.f", df0.schema)
    nxt = 0
    for _ in range(4):
        n_files = rng.randrange(1, 6)
        rows = [(nxt + i, rng.randrange(100)) for i in range(n_files * 3)]
        nxt += len(rows)
        cat.append(
            "t.f",
            spark,
            spark.createDataFrame(rows, df0.schema).repartition(n_files),
        )
    table = cat.load("t.f")
    expected = sorted(
        r.k for r in table.to_df(spark).collect()
    )
    cap = rng.randrange(1, 5)
    reader = IcebergPyStreamReader(
        table.metadata.root, table.to_df(spark).schema,
        max_files_per_batch=cap,
    )
    offs = [reader.initialOffset()]
    for _ in range(100):
        nxt_off = reader.latestOffset()
        if nxt_off == offs[-1]:
            break
        offs.append(nxt_off)
    got = []
    for s, e in zip(offs, offs[1:]):
        parts = reader.partitions(s, e)
        assert sum(len(p.chunks) for p in parts) <= cap
        for p in parts:
            for b in reader.read(p):
                got.extend(b.column("k").to_pylist())
    assert sorted(got) == expected, f"seed={seed} cap={cap}"


def test_ds_incremental_batch_read(spark, fx):
    """incremental_from (r11): the DS batch read plans only the files
    added after the given snapshot — matching incremental_df — and
    composes with a snapshot_id upper pin."""
    root = fx.orders.metadata.root
    inc = (
        spark.read.format("iceberg_py")
        .option("path", root)
        .option("incremental_from", str(fx.snap1))
        .load()
    )
    ref = fx.orders.incremental_df(spark, fx.snap1)
    assert inc.count() == ref.count()
    a = sorted(r.o_orderkey for r in inc.select("o_orderkey").collect())
    b = sorted(r.o_orderkey for r in ref.select("o_orderkey").collect())
    assert a == b
    # upper pin: (snap1, snap2] window
    win = (
        spark.read.format("iceberg_py")
        .option("path", root)
        .option("incremental_from", str(fx.snap1))
        .option("snapshot_id", str(fx.snap2))
        .load()
    )
    ref2 = fx.orders.incremental_df(spark, fx.snap1, fx.snap2)
    assert win.count() == ref2.count()


def test_ds_incremental_empty_diff_reads_zero_rows(spark, fx):
    """ADVICE r12 (high): incremental_from at the CURRENT snapshot — the
    steady state of a caught-up 'what landed since my last run' poller —
    must return an empty frame, not crash on pyspark's [None]
    empty-partition substitution.  Same guard for a pinned read whose
    pushed filter prunes every file."""
    root = fx.orders.metadata.root
    head = fx.orders.metadata.current_snapshot_id
    caught_up = (
        spark.read.format("iceberg_py")
        .option("path", root)
        .option("incremental_from", str(head))
        .load()
    )
    assert caught_up.count() == 0
    pruned_all = (
        spark.read.format("iceberg_py")
        .option("path", root)
        .option("snapshot_id", str(fx.snap1))
        .load()
        .filter("o_orderstatus = 'ZZ'")  # matches no partition
    )
    assert pruned_all.count() == 0


def test_ds_incremental_applies_mor_deletes(spark, fx):
    """ADVICE r12 (low): the incremental window plans with MOR masking —
    an end snapshot carrying delete files must not raise, and files
    added INSIDE the window read with the end snapshot's delete
    coverage applied (parity with incremental_df)."""
    from datafusion_iceberg_spark.iceberg.queries import _cdc_fixture

    cdc = _cdc_fixture(spark, SF_DIR).load("cdc.orders")
    snaps = sorted(s.snapshot_id for s in cdc.metadata.snapshots)
    hist = sorted(
        cdc.metadata.snapshots, key=lambda s: s.sequence_number or 0
    )
    first = hist[0].snapshot_id
    inc = (
        spark.read.format("iceberg_py")
        .option("path", cdc.metadata.root)
        .option("incremental_from", str(first))
        .load()
    )
    ref = cdc.incremental_df(spark, first)
    assert inc.count() == ref.count()
    a = sorted(r.o_orderkey for r in inc.select("o_orderkey").collect())
    b = sorted(r.o_orderkey for r in ref.select("o_orderkey").collect())
    assert a == b
    assert snaps  # history sanity


def test_ds_sql_statement_driven_projection(spark, tmp_path):
    """ds_sql (r12): a SELECT of 2 of 16 columns through the DS path
    reads a reader schema of just the referenced columns (selected +
    WHERE), while COUNT(*) is not a projection star and SELECT * falls
    back to the full schema."""
    from datafusion_iceberg_spark.iceberg.catalog import Catalog
    from datafusion_iceberg_spark.tables import load_table

    root = str(tmp_path / "wh_dssql")
    cat = Catalog(root, name="dsq")
    base = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    wide = base
    for i in range(12):  # pad to a 16-column table
        wide = wide.withColumn(f"pad_{i:02d}", F.col("o_orderkey") + i)
    cat.create_table("w.orders", wide.schema)
    cat.append("w.orders", spark, wide)
    assert len(cat.load("w.orders").metadata.struct_type().fields) == 16

    out = cat.ds_sql(
        spark,
        "SELECT o_orderstatus, SUM(o_totalprice) AS rev FROM "
        "dsq.w.orders WHERE o_custkey % 2 = 0 GROUP BY o_orderstatus",
    )
    # the registered DS view carries ONLY the statement's columns
    ds_view_cols = spark.table("w_orders__ds").columns
    assert set(ds_view_cols) == {"o_orderstatus", "o_totalprice", "o_custkey"}
    ref = (
        wide.filter("o_custkey % 2 = 0")
        .groupBy("o_orderstatus")
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    a = {(r.o_orderstatus, round(r.rev, 2)) for r in out.collect()}
    b = {(r.o_orderstatus, round(r.rev, 2)) for r in ref.collect()}
    assert a == b

    # COUNT(*) is not a projection star: reader schema stays minimal
    n = cat.ds_sql(
        spark, "SELECT COUNT(*) AS n FROM dsq.w.orders WHERE o_custkey > 0"
    ).collect()[0].n
    assert n == wide.filter("o_custkey > 0").count()
    assert spark.table("w_orders__ds").columns == ["o_custkey"]

    # SELECT * reads the full 16-column schema
    star = cat.ds_sql(spark, "SELECT * FROM dsq.w.orders")
    assert len(spark.table("w_orders__ds").columns) == 16
    assert star.count() == wide.count()

    # non-SELECT statements refuse
    with pytest.raises(ValueError, match="SELECT"):
        cat.ds_sql(spark, "DELETE FROM dsq.w.orders WHERE o_custkey = 1")
