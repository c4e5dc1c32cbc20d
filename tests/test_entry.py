"""Smoke tier (mirrors the driver's t1 check and the reference's own
end-to-end test shape, datafusion_iceberg/src/table.rs:314-350)."""

from __future__ import annotations

import __spark_entry__ as entry_mod


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["l_orderkey", "revenue", "o_orderdate", "o_orderpriority"]


def test_queries_and_oracles_consistent():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert len(qs) >= 60, f"expected a wide surface, got {len(qs)}"
    assert set(oracles) <= set(qs)
    # the majority of the surface must be oracle-checked, not rows-only
    assert len(oracles) >= 0.7 * len(qs)
