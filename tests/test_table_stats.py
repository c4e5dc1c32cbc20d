"""Iceberg TABLE STATISTICS files (spec ``statistics`` field): per-column
NDV via deterministic KMV sketches in puffin — the planner feed real
engines read for join sizing.  The reference's statistics stop at
manifest row counts (statistics.rs:8-49)."""

from __future__ import annotations

import hashlib
import os
import struct

import pytest
from pyspark.sql import functions as F

from datafusion_iceberg_spark.iceberg.catalog import Catalog


@pytest.fixture()
def scratch(tmp_path):
    return str(tmp_path)


def _kmv_ref(values, k=256, domain=1 << 60):
    """Python replay of the exact sketch the writer computes."""
    hs = sorted(
        {
            int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
            for v in values
            if v is not None
        }
    )[:k]
    if len(hs) < k:
        return len(hs)
    return (k - 1) * domain // hs[-1]


def test_ndv_matches_deterministic_replay_and_is_close(spark, scratch):
    cat = Catalog(os.path.join(scratch, "wh"))
    df = spark.range(5000).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).cast("string").alias("bucket"),
        (F.col("id") % 1000).alias("mid"),
    )
    cat.create_table("ns.t", df.schema)
    cat.append("ns.t", spark, df)
    out = cat.compute_table_stats("ns.t", spark)
    ndv = out["ndv"]
    # bit-identical to the reference replay (determinism is the contract)
    assert ndv["k"] == _kmv_ref(range(5000))
    assert ndv["bucket"] == _kmv_ref(str(i % 7) for i in range(5000))
    assert ndv["mid"] == _kmv_ref(i % 1000 for i in range(5000))
    # small domains are exact; large ones within KMV error (~1/sqrt(k))
    assert ndv["bucket"] == 7
    assert abs(ndv["k"] - 5000) / 5000 < 0.2
    assert abs(ndv["mid"] - 1000) / 1000 < 0.2
    # read-back API serves the registered entry
    assert cat.table_stats("ns.t") == ndv


def test_stats_file_blobs_and_expire_drop(spark, scratch):
    from datafusion_iceberg_spark.iceberg.puffin import read_puffin

    cat = Catalog(os.path.join(scratch, "wh"))
    df = spark.range(100).select(F.col("id").alias("k"))
    cat.create_table("ns.t", df.schema)
    cat.append("ns.t", spark, df)
    out = cat.compute_table_stats("ns.t", spark)
    blobs, _ = read_puffin(out["statistics-path"])
    assert blobs[0].type == "ndv-kmv-v1" and blobs[0].fields == [1]
    minima = [
        struct.unpack(">Q", blobs[0].data[i : i + 8])[0]
        for i in range(0, len(blobs[0].data), 8)
    ]
    assert minima == sorted(minima) and len(minima) == 100  # < k: all
    assert blobs[0].properties["ndv"] == "100"
    # stats entries are snapshot-keyed: expiring the snapshot drops them
    cat.append("ns.t", spark, spark.range(5).select(F.col("id").alias("k")))
    cat.expire_snapshots("ns.t", keep_last=1)
    assert cat.table_stats("ns.t") == {}
    meta = cat.load("ns.t").metadata.raw
    assert meta.get("statistics", []) == []


def test_stats_refresh_replaces_and_falls_back(spark, scratch):
    cat = Catalog(os.path.join(scratch, "wh"))
    df = spark.range(50).select(F.col("id").alias("k"))
    cat.create_table("ns.t", df.schema)
    cat.append("ns.t", spark, df)
    cat.compute_table_stats("ns.t", spark)
    # stale-but-useful: after a new commit WITHOUT a refresh, the old
    # entry still serves (engines read the newest entry <= history)
    cat.append("ns.t", spark, spark.range(50, 80).select(F.col("id").alias("k")))
    assert cat.table_stats("ns.t") == {"k": 50}
    cat.compute_table_stats("ns.t", spark)
    assert cat.table_stats("ns.t") == {"k": 80}
    # one entry per snapshot, newest kept on recompute
    meta = cat.load("ns.t").metadata.raw
    assert len(meta["statistics"]) == 2


def test_stats_through_rest_service(spark, scratch):
    from datafusion_iceberg_spark.iceberg.rest_catalog import (
        LocalRestServer,
        RestCatalog,
        RestCatalogClient,
    )

    with LocalRestServer(os.path.join(scratch, "wh")) as base:
        client = RestCatalogClient(base)
        rest = RestCatalog(client, name="rc")
        df = spark.range(64).select(F.col("id").alias("k"))
        rest.create_table("ns.t", df.schema)
        rest.append("ns.t", spark, df)
        rest.compute_table_stats("ns.t", spark)  # set-statistics update
        assert rest.table_stats("ns.t") == {"k": 64}
        served = client.load_table("ns", "t")["metadata"]
        assert len(served["statistics"]) == 1
        assert (
            served["statistics"][0]["blob-metadata"][0]["properties"]["ndv"]
            == "64"
        )


def test_stats_metadata_table(spark, scratch):
    cat = Catalog(os.path.join(scratch, "wh"), name="st")
    df = spark.range(40).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("g")
    )
    cat.create_table("ns.t", df.schema)
    cat.append("ns.t", spark, df)
    cat.compute_table_stats("ns.t", spark)
    rows = cat.sql(
        spark,
        "SELECT column_name, ndv, blob_type FROM st.ns.`t$stats`"
        " ORDER BY column_name",
    ).collect()
    assert [(r.column_name, r.ndv, r.blob_type) for r in rows] == [
        ("g", 5, "ndv-kmv-v1"),
        ("k", 40, "ndv-kmv-v1"),
    ]
