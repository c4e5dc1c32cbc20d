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


def test_global_window_detector(spark):
    """The r5 blind spot: WindowExec with an empty partition spec must be
    flagged; partitioned windows (ordered or not) must not be."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from datafusion_iceberg_spark.plans.audit import plan_summary

    df = spark.range(100).withColumn("g", F.col("id") % 3)
    glob = df.withColumn("rn", F.row_number().over(W.orderBy("id")))
    assert plan_summary(glob)["global_window"] == 1
    part = df.withColumn(
        "rn", F.row_number().over(W.partitionBy("g").orderBy("id"))
    )
    assert plan_summary(part)["global_window"] == 0
    # partitioned WITHOUT order (the dedup_survivorship n_copies shape)
    unordered = df.withColumn(
        "c", F.count(F.lit(1)).over(W.partitionBy("g"))
    )
    assert plan_summary(unordered)["global_window"] == 0
    # audit_query flags unallowlisted names only
    from datafusion_iceberg_spark.plans.audit import audit_query

    assert any("global WindowExec" in p for p in audit_query("nope", glob))
    assert audit_query("text_pack_sequences", glob) == []
