"""Dynamic partition overwrite (r9): one atomic snapshot replaces only
the partitions PRESENT in the incoming frame — the idempotent
daily-backfill write at 100 TB (Iceberg-Spark's INSERT OVERWRITE with
partitionOverwriteMode=dynamic)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from datafusion_iceberg_spark.iceberg.catalog import Catalog


@pytest.fixture()
def scratch(tmp_path):
    return str(tmp_path)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k long, dt string, v long")


def test_replaces_only_touched_partitions(spark, scratch):
    cat = Catalog(os.path.join(scratch, "wh"))
    df = _mk(spark, [(1, "d1", 10), (2, "d1", 20), (3, "d2", 30), (4, "d3", 40)])
    cat.create_table("ns.t", df.schema, partition_by=["dt"])
    cat.append("ns.t", spark, df)
    n_files_before = len(cat.load("ns.t").files())
    # backfill d1 with different rows; d2/d3 untouched and NOT rewritten
    cat.overwrite_partitions(
        "ns.t", spark, _mk(spark, [(9, "d1", 90)])
    )
    got = {(r.k, r.dt, r.v) for r in cat.sql(spark, "SELECT * FROM iceberg.ns.t").collect()}
    assert got == {(9, "d1", 90), (3, "d2", 30), (4, "d3", 40)}
    # ONE new snapshot; untouched files carried by reference (same paths)
    meta = cat.load("ns.t").metadata
    assert len(meta.raw["snapshots"]) == 2
    paths_after = {f.path for f in cat.load("ns.t").files()}
    d2d3_before = {
        f.path
        for f in [f for f in cat.load("ns.t").files()]
        if f.partition.get("dt") in ("d2", "d3")
    }
    assert d2d3_before <= paths_after
    # idempotent: re-running the same backfill yields the same table
    cat.overwrite_partitions("ns.t", spark, _mk(spark, [(9, "d1", 90)]))
    got2 = {(r.k, r.dt, r.v) for r in cat.sql(spark, "SELECT * FROM iceberg.ns.t").collect()}
    assert got2 == got


def test_unpartitioned_refuses(spark, scratch):
    cat = Catalog(os.path.join(scratch, "wh"))
    df = _mk(spark, [(1, "d1", 10)])
    cat.create_table("ns.t", df.schema)
    cat.append("ns.t", spark, df)
    with pytest.raises(ValueError, match="partitioned"):
        cat.overwrite_partitions("ns.t", spark, df)


def test_transform_spec_partitions(spark, scratch):
    """bucket(2, k) spec: replaced partitions compute through the same
    transform the writer uses, so only matching buckets are replaced."""
    cat = Catalog(os.path.join(scratch, "wh"))
    df = _mk(spark, [(i, f"d{i%3}", i * 10) for i in range(1, 9)])
    cat.create_table("ns.t", df.schema, partition_by=["bucket(4, k)"])
    cat.append("ns.t", spark, df)
    before = {(r.k, r.v) for r in cat.load("ns.t").to_df(spark).collect()}
    new = _mk(spark, [(1, "dX", 111)])  # k=1's bucket only
    cat.overwrite_partitions("ns.t", spark, new)
    after = {(r.k, r.v) for r in cat.load("ns.t").to_df(spark).collect()}
    # every surviving row's bucket differs from k=1's; k=1's replaced
    from datafusion_iceberg_spark.iceberg.transforms import spark_expr

    source, transform, _ = cat.writer("ns.t").spec_entries[0]
    buckets = {
        r.k: r.b
        for r in _mk(spark, [(k, "x", 0) for k, _ in before])
        .select("k", spark_expr(transform, source).alias("b"))
        .collect()
    }
    b1 = (
        _mk(spark, [(1, "x", 0)])
        .select(spark_expr(transform, source).alias("b"))
        .collect()[0].b
    )
    kept = {k for k, v in before if buckets[k] != b1}
    assert after == {(k, v) for k, v in before if k in kept} | {(1, 111)}


def test_folds_outstanding_mor_deletes(spark, scratch):
    """An untouched partition holding files targeted by MOR deletes is
    rewritten (deletes fold) instead of carried with dangling deletes."""
    cat = Catalog(os.path.join(scratch, "wh"))
    df = _mk(spark, [(1, "d1", 10), (2, "d2", 20), (3, "d2", 30)])
    cat.create_table("ns.t", df.schema, partition_by=["dt"])
    cat.append("ns.t", spark, df)
    cat.delete_where_mor("ns.t", spark, ("=", "k", 2))  # targets d2's file
    cat.overwrite_partitions("ns.t", spark, _mk(spark, [(9, "d1", 90)]))
    got = {(r.k, r.dt, r.v) for r in cat.sql(spark, "SELECT * FROM iceberg.ns.t").collect()}
    assert got == {(9, "d1", 90), (3, "d2", 30)}  # k=2 stays deleted
    # the new snapshot carries no delete manifests
    assert not cat.load("ns.t").position_delete_files()


def test_sql_insert_overwrite_dynamic_mode(spark, scratch):
    cat = Catalog(os.path.join(scratch, "wh"), name="dyn")
    df = _mk(spark, [(1, "d1", 10), (2, "d2", 20)])
    cat.create_table(
        "ns.t", df.schema, partition_by=["dt"],
        properties={"write.overwrite.mode": "dynamic"},
    )
    cat.append("ns.t", spark, df)
    out = cat.sql(
        spark,
        "INSERT OVERWRITE dyn.ns.t VALUES (9, 'd1', 90)",
    ).first()
    assert out.operation == "overwrite_partitions"
    got = {(r.k, r.dt) for r in cat.sql(spark, "SELECT * FROM dyn.ns.t").collect()}
    assert got == {(9, "d1"), (2, "d2")}
    # session conf flavor (property absent)
    cat2 = Catalog(os.path.join(scratch, "wh2"), name="dyn2")
    cat2.create_table("ns.t", df.schema, partition_by=["dt"])
    cat2.append("ns.t", spark, df)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        out = cat2.sql(
            spark, "INSERT OVERWRITE dyn2.ns.t VALUES (8, 'd2', 80)"
        ).first()
        assert out.operation == "overwrite_partitions"
        got = {(r.k, r.dt) for r in cat2.sql(spark, "SELECT * FROM dyn2.ns.t").collect()}
        assert got == {(1, "d1"), (8, "d2")}
    finally:
        spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    # static default replaces everything
    cat3 = Catalog(os.path.join(scratch, "wh3"), name="dyn3")
    cat3.create_table("ns.t", df.schema, partition_by=["dt"])
    cat3.append("ns.t", spark, df)
    out = cat3.sql(
        spark, "INSERT OVERWRITE dyn3.ns.t VALUES (7, 'd9', 70)"
    ).first()
    assert out.operation == "overwrite"
    assert {(r.k, r.dt) for r in cat3.sql(spark, "SELECT * FROM dyn3.ns.t").collect()} == {(7, "d9")}


def test_date_identity_partition_replaced(spark, scratch):
    """Identity date partitions: collect() returns datetime.date while the
    manifest stores epoch-days ints — the replaced set must normalize into
    the manifest domain or the overwrite silently appends (r9 ADVICE)."""
    import datetime

    cat = Catalog(os.path.join(scratch, "wh"))
    df = spark.createDataFrame(
        [
            (1, datetime.date(2024, 1, 1), 10),
            (2, datetime.date(2024, 1, 2), 20),
        ],
        "k long, d date, v long",
    )
    cat.create_table("ns.t", df.schema, partition_by=["d"])
    cat.append("ns.t", spark, df)
    backfill = spark.createDataFrame(
        [(9, datetime.date(2024, 1, 1), 90)], "k long, d date, v long"
    )
    cat.overwrite_partitions("ns.t", spark, backfill)
    got = {
        (r.k, r.d, r.v)
        for r in cat.load("ns.t").to_df(spark).collect()
    }
    assert got == {
        (9, datetime.date(2024, 1, 1), 90),
        (2, datetime.date(2024, 1, 2), 20),
    }
    # idempotent re-run (the daily-backfill contract)
    cat.overwrite_partitions("ns.t", spark, backfill)
    assert {
        (r.k, r.d, r.v) for r in cat.load("ns.t").to_df(spark).collect()
    } == got


def test_timestamp_and_decimal_identity_partitions(spark, scratch):
    import datetime
    from decimal import Decimal

    cat = Catalog(os.path.join(scratch, "wh"))
    df = spark.createDataFrame(
        [
            (1, datetime.datetime(2024, 1, 1, 12, 0, 0), Decimal("1.50"), 10),
            (2, datetime.datetime(2024, 1, 2, 12, 0, 0), Decimal("2.50"), 20),
        ],
        "k long, ts timestamp, price decimal(10,2), v long",
    )
    cat.create_table("ns.ts_t", df.schema, partition_by=["ts"])
    cat.append("ns.ts_t", spark, df)
    cat.overwrite_partitions(
        "ns.ts_t",
        spark,
        spark.createDataFrame(
            [(9, datetime.datetime(2024, 1, 1, 12, 0, 0), Decimal("9.99"), 90)],
            df.schema,
        ),
    )
    got = {(r.k, r.v) for r in cat.load("ns.ts_t").to_df(spark).collect()}
    assert got == {(9, 90), (2, 20)}

    cat.create_table("ns.dec_t", df.schema, partition_by=["price"])
    cat.append("ns.dec_t", spark, df)
    cat.overwrite_partitions(
        "ns.dec_t",
        spark,
        spark.createDataFrame(
            [(8, datetime.datetime(2024, 3, 1), Decimal("1.50"), 80)], df.schema
        ),
    )
    got = {(r.k, r.v) for r in cat.load("ns.dec_t").to_df(spark).collect()}
    assert got == {(8, 80), (2, 20)}


def test_partition_explosion_guard(spark, scratch):
    """A frame spanning more partitions than
    write.overwrite.dynamic.max-partitions refuses with a clear message
    instead of collecting a huge replaced set (r9 VERDICT #6)."""
    cat = Catalog(os.path.join(scratch, "wh"))
    df = _mk(spark, [(i, f"d{i}", i) for i in range(20)])
    cat.create_table(
        "ns.t", df.schema, partition_by=["dt"],
        properties={"write.overwrite.dynamic.max-partitions": "10"},
    )
    cat.append("ns.t", spark, _mk(spark, [(1, "d1", 10)]))
    with pytest.raises(ValueError, match="max-partitions"):
        cat.overwrite_partitions("ns.t", spark, df)
    # under the cap still works
    cat.overwrite_partitions("ns.t", spark, _mk(spark, [(5, "d1", 50)]))
    assert {(r.k, r.v) for r in cat.load("ns.t").to_df(spark).collect()} == {(5, 50)}
