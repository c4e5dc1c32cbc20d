"""Grouped-DataSource storage-partitioned aggregation (VERDICT r14 #2 +
#6): one InputPartition per partition group through the Python
DataSource (``group_partitions_by``), aggregation per partition via
mapInArrow + pyarrow hash group_by — ONE plan subtree, task parallelism
= number of groups, zero Exchange anywhere, results byte-identical to
the plain shuffling groupBy.
"""

from __future__ import annotations

import shutil

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from datafusion_iceberg_spark.iceberg.catalog import Catalog
from datafusion_iceberg_spark.iceberg.spj import (
    BucketJoinError,
    bucket_agg_grouped,
)
from datafusion_iceberg_spark.plans.audit import plan_string


@pytest.fixture(scope="module")
def wh(tmp_path_factory, spark, sf_dir):
    root = str(tmp_path_factory.mktemp("spa_grp_wh"))
    cat = Catalog(root)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey",
        "l_extendedprice",
        "l_discount",
        F.floor(F.col("l_extendedprice") * 100 + 0.5)
        .cast("long")
        .alias("cents"),
    )
    cat.create_table(
        "g.li", li.schema, partition_by=["bucket(8, l_orderkey)"]
    )
    cat.append("g.li", spark, li)
    # a table with NULL keys: nulls pool into their own partition
    nk = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("v", T.LongType())]
    )
    cat.create_table("g.nulls", nk, partition_by=["bucket(4, k)"])
    cat.append(
        "g.nulls",
        spark,
        spark.createDataFrame(
            [(1, 10), (1, 20), (None, 5), (None, 7), (2, 1)], nk
        ),
    )
    yield cat
    shutil.rmtree(root, ignore_errors=True)


def test_grouped_agg_matches_plain_all_fns(spark, wh):
    t = wh.load("g.li")
    g = bucket_agg_grouped(
        spark,
        t,
        ["l_orderkey"],
        {
            "n": ("count", None),
            "nd": ("count", "l_discount"),
            "s": ("sum", "cents"),
            "mn": ("min", "l_discount"),
            "mx": ("max", "l_discount"),
            "av": ("avg", "cents"),
        },
    )
    plain = (
        t.to_df(spark)
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("l_discount").alias("nd"),
            F.sum("cents").alias("s"),
            F.min("l_discount").alias("mn"),
            F.max("l_discount").alias("mx"),
            F.avg("cents").alias("av"),
        )
        .select(*g.columns)
    )
    got = sorted(map(tuple, g.collect()))
    want = sorted(map(tuple, plain.collect()))
    assert got == want and len(got) > 100
    # dtypes match exactly (nullability may differ: mapInArrow output
    # fields are declared nullable; plain COUNT is provably non-null)
    assert g.dtypes == plain.dtypes


def test_grouped_agg_plan_single_subtree_zero_exchange(spark, wh):
    t = wh.load("g.li")
    g = bucket_agg_grouped(spark, t, ["l_orderkey"], {"n": ("count", None)})
    plan = plan_string(g)
    assert "Exchange" not in plan
    assert "MapInArrow" in plan
    assert plan.count("BatchScan") == 1  # ONE subtree, not a union
    # task parallelism = number of occupied partition groups
    assert g.rdd.getNumPartitions() == 8


def test_grouped_agg_null_keys_form_their_own_group(spark, wh):
    t = wh.load("g.nulls")
    g = bucket_agg_grouped(
        spark, t, ["k"], {"n": ("count", None), "s": ("sum", "v")}
    )
    rows = {r["k"]: (r["n"], r["s"]) for r in g.collect()}
    assert rows == {1: (2, 30), None: (2, 12), 2: (1, 1)}
    # occupied buckets (keys 1 and 2 may hash-collide) + 1 null partition
    from datafusion_iceberg_spark.iceberg.transforms import bucket_value

    occupied = len({bucket_value(1, 4), bucket_value(2, 4)})
    assert g.rdd.getNumPartitions() == occupied + 1


def test_grouped_agg_filter_pushes_and_matches(spark, wh):
    t = wh.load("g.li")
    g = bucket_agg_grouped(
        spark,
        t,
        ["l_orderkey"],
        {"n": ("count", None), "s": ("sum", "cents")},
        filter_expr="l_discount > 0.05",
    )
    plain = (
        t.to_df(spark)
        .filter("l_discount > 0.05")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s"))
        .select(*g.columns)
    )
    assert sorted(map(tuple, g.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_grouped_agg_applies_mor_deletes(spark, wh, tmp_path):
    cat = Catalog(str(tmp_path / "morwh"))
    sch = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("v", T.LongType())]
    )
    cat.create_table(
        "m.t",
        sch,
        partition_by=["bucket(4, k)"],
        properties={"write.delete.mode": "merge-on-read"},
    )
    cat.append(
        "m.t",
        spark,
        spark.createDataFrame([(1, 1), (1, 2), (2, 3), (3, 4)], sch),
    )
    cat.delete_where_mor("m.t", spark, ("=", "v", 2))
    g = bucket_agg_grouped(
        spark, cat.load("m.t"), ["k"], {"n": ("count", None), "s": ("sum", "v")}
    )
    assert {(r["k"], r["n"], r["s"]) for r in g.collect()} == {
        (1, 1, 1),
        (2, 1, 3),
        (3, 1, 4),
    }


def test_grouped_agg_refusals(spark, wh):
    t = wh.load("g.li")
    with pytest.raises(BucketJoinError, match="supports"):
        bucket_agg_grouped(
            spark, t, ["l_orderkey"], {"x": ("median", "cents")}
        )
    with pytest.raises(BucketJoinError, match="unknown column"):
        bucket_agg_grouped(spark, t, ["l_orderkey"], {"x": ("sum", "nope")})
    with pytest.raises(BucketJoinError):
        # group key not partition-backed
        bucket_agg_grouped(spark, t, ["l_discount"], {"n": ("count", None)})


def test_grouped_agg_decimal_sum_refuses(spark, tmp_path):
    cat = Catalog(str(tmp_path / "decwh"))
    sch = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("d", T.DecimalType(18, 2)),
        ]
    )
    cat.create_table("d.t", sch, partition_by=["bucket(4, k)"])
    from decimal import Decimal

    cat.append(
        "d.t", spark, spark.createDataFrame([(1, Decimal("1.50"))], sch)
    )
    with pytest.raises(BucketJoinError, match="DECIMAL"):
        bucket_agg_grouped(spark, cat.load("d.t"), ["k"], {"s": ("sum", "d")})
