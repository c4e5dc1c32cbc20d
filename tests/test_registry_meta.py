"""Registry self-consistency (operators/meta.py): the invariants the
gate pins, verified directly plus through the gate's own oracle shape."""

from __future__ import annotations

from datafusion_iceberg_spark import registry
from datafusion_iceberg_spark.operators.meta import (
    ROWS_ONLY_ALLOWED,
    registry_violations,
)

registry.load_all_modules()


def test_no_registry_violations():
    assert registry_violations() == []


def test_every_query_has_oracle_or_allowlist():
    missing = set(registry.QUERIES) - set(registry.ORACLES) - ROWS_ONLY_ALLOWED
    assert missing == set()


def test_bench_headline_subset_of_registry():
    import bench

    assert set(bench.HEADLINE) <= set(registry.QUERIES)
    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE), "duplicate bench entry"


def test_gate_returns_empty_frame(spark, sf_dir):
    df = registry.QUERIES["meta_registry_consistency"](spark, sf_dir)
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == ["kind", "name"]


def test_violations_detected(monkeypatch):
    """The detector actually fires: registering a query without an oracle
    (not allowlisted) must produce a violation row."""
    monkeypatch.setitem(registry.QUERIES, "zz_probe_no_oracle", lambda s, d: None)
    try:
        v = registry_violations()
        assert ("query_without_oracle", "zz_probe_no_oracle") in v
    finally:
        pass  # monkeypatch restores QUERIES
