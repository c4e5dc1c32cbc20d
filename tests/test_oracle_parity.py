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
