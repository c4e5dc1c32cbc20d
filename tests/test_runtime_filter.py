"""Runtime file pruning from join keys (iceberg/runtime_filter.py).

Verifies the three contracts: files are actually SKIPPED (not just
re-filtered), results stay exact vs a plain join, and the guard rails
(outer-join rejection, empty-dim short-circuit, key-collect cap) hold.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from datafusion_iceberg_spark.iceberg.catalog import Catalog
from datafusion_iceberg_spark.iceberg.runtime_filter import (
    pruned_file_count,
    runtime_key_pred,
    runtime_pruned_join,
)


@pytest.fixture(scope="module")
def fact_cat(spark, tmp_path_factory):
    """A fact table written as 4 range-partitioned files with tight,
    disjoint key bounds (k in [0,250), [250,500), ...)."""
    root = str(tmp_path_factory.mktemp("rtwh"))
    cat = Catalog(root)
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    cat.create_table("ns.fact", df.schema)
    cat.append("ns.fact", spark, df.repartitionByRange(4, "k"))
    return cat


def test_in_list_prunes_files(spark, fact_cat):
    fact = fact_cat.load("ns.fact")
    dim = spark.createDataFrame([(10,), (50,), (200,)], "j long")
    before, after = pruned_file_count(fact, dim, "k", "j")
    assert before == 4
    assert after == 1  # all keys in [0,250) → one file survives


def test_range_path_prunes_files(spark, fact_cat):
    fact = fact_cat.load("ns.fact")
    dim = spark.range(300, 490).select(F.col("id").alias("j"))
    before, after = pruned_file_count(fact, dim, "k", "j", max_keys=8)
    assert before == 4
    assert after == 1  # [300, 489] interval → second file only


def test_join_result_exact(spark, fact_cat):
    fact = fact_cat.load("ns.fact")
    dim = spark.createDataFrame(
        [(10, "a"), (700, "b"), (5000, "c")], "j long, tag string"
    )
    got = runtime_pruned_join(spark, fact, dim, "k", "j").select(
        "k", "v", "tag"
    )
    rows = {(r["k"], r["v"], r["tag"]) for r in got.collect()}
    assert rows == {(10, 20, "a"), (700, 1400, "b")}  # 5000 unmatched


def test_semi_join(spark, fact_cat):
    fact = fact_cat.load("ns.fact")
    dim = spark.createDataFrame([(10,), (700,)], "j long")
    got = runtime_pruned_join(spark, fact, dim, "k", "j", how="semi")
    assert sorted(r["k"] for r in got.collect()) == [10, 700]


def test_outer_join_rejected(spark, fact_cat):
    fact = fact_cat.load("ns.fact")
    dim = spark.createDataFrame([(10,)], "j long")
    with pytest.raises(ValueError, match="outer"):
        runtime_pruned_join(spark, fact, dim, "k", "j", how="left")


def test_empty_dim_short_circuits(spark, fact_cat):
    fact = fact_cat.load("ns.fact")
    dim = spark.createDataFrame([], "j long")
    assert runtime_key_pred(dim, "j", "k") is None
    got = runtime_pruned_join(spark, fact, dim, "k", "j")
    assert got.count() == 0
    semi = runtime_pruned_join(spark, fact, dim, "k", "j", how="semi")
    assert semi.count() == 0


def test_null_keys_ignored_in_pred(spark, fact_cat):
    """NULL dim keys never join in inner/semi; the derived pred must not
    include them (an IN list with NULL would poison 3-valued eval)."""
    fact = fact_cat.load("ns.fact")
    dim = spark.createDataFrame([(10,), (None,)], "j long")
    pred = runtime_key_pred(dim, "j", "k")
    assert pred == ("in", "k", [10])
    got = runtime_pruned_join(spark, fact, dim, "k", "j", how="semi")
    assert [r["k"] for r in got.collect()] == [10]


def test_key_cap_degrades_to_range(spark, fact_cat):
    dim = spark.range(0, 100).select(F.col("id").alias("j"))
    pred = runtime_key_pred(dim, "j", "k", max_keys=10)
    assert pred == ("between", "k", 0, 99)


def test_static_filters_compose(spark, fact_cat):
    fact = fact_cat.load("ns.fact")
    dim = spark.createDataFrame([(10,), (700,)], "j long")
    got = runtime_pruned_join(
        spark, fact, dim, "k", "j", fact_filters=(">", "k", 100)
    )
    assert [r["k"] for r in got.collect()] == [700]


def test_broadcast_plan_no_fact_shuffle(spark, fact_cat):
    """The default plan is BroadcastHashJoin with no Exchange on the
    fact scan leg — the shape that matters at 100 TB."""
    fact = fact_cat.load("ns.fact")
    dim = spark.createDataFrame([(10,), (700,)], "j long")
    got = runtime_pruned_join(spark, fact, dim, "k", "j")
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_runtime_pred_composes_with_bucket_pruning(spark, tmp_path):
    """The runtime IN-list rewrites through the bucket transform
    (transforms.rewrite_pred), so a runtime-filtered join over a
    bucket-partitioned fact prunes whole buckets at the metadata level —
    the composition that makes point-lookup joins cheap at 100 TB."""
    from datafusion_iceberg_spark.iceberg.catalog import Catalog
    from datafusion_iceberg_spark.iceberg.transforms import bucket_value

    cat = Catalog(str(tmp_path / "wh"))
    df = spark.range(0, 4000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    cat.create_table("b.fact", df.schema, partition_by=["bucket(8, k)"])
    cat.append("b.fact", spark, df)
    fact = cat.load("b.fact")
    all_files = fact.files()
    # dim keys all land in one bucket → only that bucket's files survive
    keys = [k for k in range(4000) if bucket_value(k, 8) == 3][:5]
    dim = spark.createDataFrame([(k,) for k in keys], "j long")
    before, after = pruned_file_count(fact, dim, "k", "j")
    assert before == len(all_files) > 1
    assert after < before
    surviving = fact.files(runtime_key_pred(dim, "j", "k"))
    assert {f.partition.get("k_bucket") for f in surviving} == {3}
    got = runtime_pruned_join(spark, fact, dim, "k", "j")
    assert sorted(r["k"] for r in got.collect()) == sorted(keys)
