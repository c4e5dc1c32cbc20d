"""Sweep EVERY registered query's physical plan for scale pathologies.

Catches the failure mode the value oracle cannot: correct rows through a
plan that would melt at 100 TB (accidental cartesian, nested-loop join
where an equi-join was intended).  Plans are built, not executed — the
sweep is cheap.
"""

from __future__ import annotations

from datafusion_iceberg_spark import registry
from datafusion_iceberg_spark.plans.audit import audit_query

registry.load_all_modules()


def test_all_query_plans_are_scale_clean(spark, sf_dir):
    problems = {}
    for name, fn in sorted(registry.QUERIES.items()):
        if name.startswith("stream_"):
            continue  # streaming queries execute on build; covered elsewhere
        df = fn(spark, sf_dir)
        found = audit_query(name, df)
        if found:
            problems[name] = found
    assert not problems, f"plan violations: {problems}"
