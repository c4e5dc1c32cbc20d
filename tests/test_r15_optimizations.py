"""Round-15 optimization regression tests.

Covers the three behavior-preserving internals changes of the
optimization round:

- ``session.local_df``: driver-state rows become an Arrow-backed
  LocalRelation (no PythonRDD stage at execution) with EXACT values —
  big int64s, NULLs, StructType schemas — and a working fallback.
- ``spj._parallel_branches``: thread-built branch plans preserve branch
  order and propagate exceptions; bucket_join results are identical
  under serial and threaded plan construction.
- driver-side DV sequence filtering in ``_apply_position_deletes``: a
  deletion vector whose target is outside the scanned file set, or
  whose target file is NEWER than the delete, is dropped before any
  plan is built — and the scan result equals the executed-filter
  semantics.
"""

from __future__ import annotations

import os

import pytest

from pyspark.sql import types as T

from datafusion_iceberg_spark.session import local_df


@pytest.fixture(scope="module")
def spark():
    from datafusion_iceberg_spark.session import get_spark

    return get_spark("test_r15_opt")


def test_local_df_exact_bigints_and_nulls(spark):
    big = (1 << 60) + 7
    df = local_df(spark, [("a", big), ("b", None)], "k string, v long")
    rows = {r.k: r.v for r in df.collect()}
    assert rows == {"a": big, "b": None}
    # the whole point: a LocalRelation, not a PythonRDD scan
    cls = df._jdf.queryExecution().optimizedPlan().getClass().getSimpleName()
    assert cls == "LocalRelation", cls


def test_local_df_structtype_and_empty(spark):
    st = T.StructType(
        [
            T.StructField("s", T.StringType()),
            T.StructField("n", T.LongType()),
        ]
    )
    assert local_df(spark, [("x", 1)], st).collect()[0].asDict() == {
        "s": "x",
        "n": 1,
    }
    assert local_df(spark, [], st).count() == 0
    assert local_df(spark, [], "a string, b long").columns == ["a", "b"]


def test_parallel_branches_order_and_errors(monkeypatch):
    from datafusion_iceberg_spark.iceberg import spj

    out = spj._parallel_branches(lambda b: [b * 10, b * 10 + 1], [3, 1, 2])
    assert out == [30, 31, 10, 11, 20, 21]  # branch order, flattened

    def boom(b):
        if b == 2:
            raise RuntimeError("branch 2 failed")
        return [b]

    with pytest.raises(RuntimeError, match="branch 2 failed"):
        spj._parallel_branches(boom, [1, 2, 3])

    # serial fallback path (PLAN_THREADS == 1) gives the same answer
    monkeypatch.setattr(spj, "PLAN_THREADS", 1)
    assert spj._parallel_branches(lambda b: [b], [5, 4]) == [5, 4]


def test_bucket_join_threaded_equals_serial(spark, tmp_path, monkeypatch):
    from pyspark.sql import functions as F

    from datafusion_iceberg_spark.iceberg import spj
    from datafusion_iceberg_spark.iceberg.catalog import Catalog
    from datafusion_iceberg_spark.iceberg.spj import bucket_join

    cat = Catalog(str(tmp_path / "wh"))
    left = spark.range(0, 400).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("a")
    )
    right = spark.range(0, 400, 2).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("b")
    )
    cat.create_table("t.l", left.schema, partition_by=["bucket(8, k)"])
    cat.append("t.l", spark, left)
    cat.create_table("t.r", right.schema, partition_by=["bucket(8, k)"])
    cat.append("t.r", spark, right)
    lt, rt = cat.load("t.l"), cat.load("t.r")

    monkeypatch.setattr(spj, "PLAN_THREADS", 16)
    threaded = sorted(
        (r.k, r.a, r.b)
        for r in bucket_join(spark, lt, rt, left_on="k").collect()
    )
    monkeypatch.setattr(spj, "PLAN_THREADS", 1)
    serial = sorted(
        (r.k, r.a, r.b)
        for r in bucket_join(spark, lt, rt, left_on="k").collect()
    )
    assert threaded == serial
    assert len(threaded) == 200


def test_dv_prune_driver_side(spark, tmp_path):
    """A DV targeting a file outside the scanned set is dropped before
    planning; vectors targeting scanned files still mask rows."""
    from pyspark.sql import functions as F

    from datafusion_iceberg_spark.iceberg.catalog import Catalog

    cat = Catalog(str(tmp_path / "wh"))
    df = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") % 2).alias("p")
    )
    cat.create_table(
        "d.t",
        df.schema,
        partition_by=["p"],
        properties={"write.delete.mode": "deletion-vector"},
    )
    cat.append("d.t", spark, df)
    cat.sql(spark, "DELETE FROM iceberg.d.t WHERE k % 10 = 0")
    t = cat.load("d.t")
    deletes = t.position_delete_files()
    assert deletes and all(
        d.referenced_data_file is not None for d in deletes
    ), "fixture must produce DV deletes"

    # scan only the p=1 partition's files: the p=0 DV must be pruned
    # driver-side, and the result still masks the scanned partition's
    # deleted rows exactly
    p1_files = [
        f
        for f in t.files()
        if "/p=1/" in t.metadata.localize(f.path)
    ]
    assert p1_files
    got = sorted(
        r.k
        for r in t._scan_files(spark, p1_files, None).collect()
    )
    expect = [k for k in range(100) if k % 2 == 1 and k % 10 != 0]
    assert got == expect

    # full scan unchanged
    n = t.to_df(spark).count()
    assert n == 100 - 10
