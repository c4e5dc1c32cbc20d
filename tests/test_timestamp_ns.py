"""Iceberg v3 nanosecond timestamps (``timestamp_ns`` / ``timestamptz_ns``).

Spark has no nanos type, so the session domain is the raw int64
nanos-since-epoch (metadata.py maps the Iceberg type to LongType — the
same convention ``nanosAsLong`` applies to TIMESTAMP(NANOS) parquet).
Fidelity is verified against pyarrow's ground-truth int64 view of the
driver's events.parquet, which carries true sub-microsecond precision
DuckDB (micros) cannot even represent.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafusion_iceberg_spark.iceberg.catalog import Catalog
from datafusion_iceberg_spark.tables import load_table


@pytest.fixture(scope="module")
def ns_cat(spark, sf_dir, tmp_path_factory):
    # the driver's events.ts is micros; synthesize deterministic
    # sub-microsecond jitter so the table genuinely holds values no
    # micros engine can represent
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        (
            F.unix_micros("ts") * F.lit(1000) + F.col("event_id") % 1000
        ).alias("ts"),
        "event_type",
    )
    cat = Catalog(str(tmp_path_factory.mktemp("tsns")), name="tsns")
    cat.sql(
        spark,
        "CREATE TABLE tsns.ev.t (event_id BIGINT, ts TIMESTAMP_NS,"
        " event_type STRING)",
    )
    cat.append("ev.t", spark, ev)
    return cat


def test_metadata_declares_v3_ns_type(spark, ns_cat):
    meta = ns_cat.load("ev.t").metadata
    types = {f["name"]: f["type"] for f in meta.current_schema["fields"]}
    assert types["ts"] == "timestamp_ns"
    assert int(meta.raw["format-version"]) == 3


def test_nanos_roundtrip_exact(spark, ns_cat, sf_dir):
    """Full nanosecond precision through create → append → scan, checked
    against pyarrow's ground-truth int64 micros view plus the same
    jitter (a micros engine could not even represent these values)."""
    import pyarrow.parquet as pq

    raw = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts"]
    )
    ids = raw["event_id"].to_pylist()
    micros = raw["ts"].cast("int64").to_pylist()
    want = {i: us * 1000 + i % 1000 for i, us in zip(ids, micros)}
    got = {
        r["event_id"]: r["ts"]
        for r in ns_cat.load("ev.t").to_df(spark).collect()
    }
    assert got == want
    # the data genuinely exercises sub-micro precision
    assert any(v % 1000 for v in got.values())


def test_stats_prune_on_ns_bounds(spark, tmp_path):
    """Manifest bounds for a timestamp_ns column decode as raw longs and
    prune files (a datetime decode would truncate and corrupt the
    interval test)."""
    cat = Catalog(str(tmp_path / "wh"), name="tsb")
    cat.sql(spark, "CREATE TABLE tsb.d.t (k BIGINT, ts TIMESTAMP_NS)")
    base = 1_700_000_000_000_000_000
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"),
        (F.lit(base) + F.col("id") * 1_000_001).alias("ts"),
    )
    cat.append("d.t", spark, df.repartitionByRange(4, "ts"))
    t = cat.load("d.t")
    lo = base + 10 * 1_000_001
    hi = base + 20 * 1_000_001
    pruned = t.files(("between", "ts", lo, hi))
    assert len(t.files()) == 4
    assert len(pruned) == 1
    rows = t.to_df(spark, filters=("between", "ts", lo, hi)).count()
    assert rows == 11


def test_sql_filter_and_agg(spark, ns_cat):
    out = ns_cat.sql(
        spark,
        "SELECT event_type, COUNT(*) AS n, MIN(ts) AS lo, MAX(ts) AS hi"
        " FROM tsns.ev.t GROUP BY event_type ORDER BY event_type",
    ).collect()
    assert len(out) > 0
    assert all(isinstance(r["lo"], int) for r in out)


def test_timestamptz_ns_and_rest_create(spark, tmp_path):
    from datafusion_iceberg_spark.iceberg.rest_catalog import (
        LocalRestServer,
        RestCatalog,
        RestCatalogClient,
    )

    with LocalRestServer(str(tmp_path / "wh")) as base:
        rest = RestCatalog(RestCatalogClient(base), name="rns")
        df = spark.createDataFrame(
            [(1, 1_700_000_000_000_000_123)], "k long, ts long"
        )
        rest.create_table(
            "ns.t", df.schema, iceberg_types={"ts": "timestamptz_ns"}
        )
        rest.append("ns.t", spark, df)
        meta = rest.load("ns.t").metadata
        types = {
            f["name"]: f["type"] for f in meta.current_schema["fields"]
        }
        assert types["ts"] == "timestamptz_ns"
        got = rest.load("ns.t").to_df(spark).first()
        assert got["ts"] == 1_700_000_000_000_000_123
