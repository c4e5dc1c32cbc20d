"""The big gate: every registered query with an oracle must match DuckDB
at sf0.001 — the same comparison the driver runs at sf0.01."""

from __future__ import annotations

import pytest

from datafusion_iceberg_spark import registry

registry.load_all_modules()

ORACLED = sorted(registry.ORACLES)
ROWS_ONLY = sorted(set(registry.QUERIES) - set(registry.ORACLES))

from tests.oracle_compare import compare  # noqa: E402


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, duck, sf_dir, name):
    df = registry.QUERIES[name](spark, sf_dir)
    rel = duck.sql(registry.ORACLES[name])
    compare(df, rel, name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(spark, sf_dir, name):
    df = registry.QUERIES[name](spark, sf_dir)
    n = df.count()
    assert n >= 0
    assert len(df.schema.fields) > 0


def test_tz_fence_fires_on_timestamptz_oracle(spark, duck):
    """The portability check must REJECT a DuckDB oracle that returns
    TIMESTAMPTZ (the r3 stream_sliding_window driver-red): to_timestamp()
    without CAST(... AS TIMESTAMP) has to fail loudly here, not surface
    as a driver hash mismatch."""
    from pyspark.sql import functions as F

    from tests.oracle_compare import check_driver_portability

    sdf = spark.range(1).select(
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("ts")
    )
    rel_tz = duck.sql("SELECT to_timestamp(1704067200) AS ts")
    with pytest.raises(AssertionError, match="tz-aware"):
        check_driver_portability(sdf, rel_tz, "fence_probe")
    # and the CAST form passes
    rel_ok = duck.sql("SELECT CAST(to_timestamp(1704067200) AS TIMESTAMP) AS ts")
    check_driver_portability(sdf, rel_ok, "fence_probe_ok")
