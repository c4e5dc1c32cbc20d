"""Distributed scan planning (table.files with spark= and enough
manifests): executor-side Avro decode + file pruning must be byte-
identical to the driver path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafusion_iceberg_spark.iceberg.catalog import Catalog


@pytest.fixture(scope="module")
def many_manifest_cat(spark, tmp_path_factory):
    """8 appends = 8 manifests, each with distinct key ranges."""
    cat = Catalog(str(tmp_path_factory.mktemp("distplan")))
    df0 = spark.range(0, 1).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("v")
    )
    cat.create_table("d.t", df0.schema)
    for i in range(8):
        df = (
            spark.range(i * 100, (i + 1) * 100)
            .select(F.col("id").alias("k"), (F.col("id") * 7).alias("v"))
            .coalesce(1)
        )
        cat.append("d.t", spark, df)
    return cat


def _key(f):
    return (f.path, f.sequence_number, f.spec_id, f.record_count)


def test_distributed_matches_driver(spark, many_manifest_cat):
    t = many_manifest_cat.load("d.t")
    local = t.files()
    dist = t.files(spark=spark, distributed_threshold=4)
    assert [_key(f) for f in local] == [_key(f) for f in dist]
    assert len(local) == 8


def test_distributed_prunes_identically(spark, many_manifest_cat):
    t = many_manifest_cat.load("d.t")
    pred = ("between", "k", 250, 420)
    local = t.files(pred)
    dist = t.files(pred, spark=spark, distributed_threshold=1)
    assert [_key(f) for f in local] == [_key(f) for f in dist]
    assert 0 < len(local) < 8
    # and the scan over the distributed plan returns the same rows
    rows = t.to_df(spark, filters=pred).count()
    assert rows == 171


def test_below_threshold_stays_on_driver(spark, many_manifest_cat):
    """With the default threshold the 8-manifest table plans locally —
    no Spark job (asserted via the jobs counter)."""
    t = many_manifest_cat.load("d.t")
    sc = spark.sparkContext
    before = sc.statusTracker().getJobIdsForGroup(None)
    t.files(spark=spark)  # default threshold 32 > 8
    after = sc.statusTracker().getJobIdsForGroup(None)
    assert before == after


def test_partition_values_survive_distribution(spark, tmp_path):
    cat = Catalog(str(tmp_path / "wh"))
    df = spark.range(0, 400).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).cast("string").alias("p"),
    )
    cat.create_table("d.t", df.schema, partition_by=["p"])
    for i in range(3):
        cat.append(
            "d.t",
            spark,
            df.filter(F.col("k").between(i * 100, (i + 1) * 100 - 1)),
        )
    t = cat.load("d.t")
    local = t.files(("=", "p", "2"))
    dist = t.files(("=", "p", "2"), spark=spark, distributed_threshold=1)
    assert sorted(f.path for f in local) == sorted(f.path for f in dist)
    assert all(f.partition.get("p") == "2" for f in dist)
