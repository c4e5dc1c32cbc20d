"""Scale-pattern regression tests: the physical-plan properties that make
operators survive a 1000-executor / 100 TB deployment.

These assert on the *executed plan*, not just results — a correct answer
with a shuffle where none is needed is a failure at scale.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F


def _executed_plan(df) -> str:
    df.write.format("noop").mode("overwrite").save()
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_is_shuffle_free(spark, sf_dir, tmp_path):
    """Fact-fact joins at 100 TB must be co-located: bucketBy the join key
    at write time, and the join plans with NO exchange on either side
    (each task reads matching buckets from both tables)."""
    warehouse = str(tmp_path / "warehouse")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice"
    )
    od = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    for df, name, key in ((li, "li_bkt", "l_orderkey"), (od, "od_bkt", "o_orderkey")):
        (
            df.write.mode("overwrite")
            .bucketBy(8, key)
            .sortBy(key)
            .option("path", f"{warehouse}/{name}")
            .saveAsTable(name)
        )
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table("li_bkt")
            .join(
                spark.table("od_bkt"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("l_orderkey")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = _executed_plan(joined)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        # the join inputs come straight from the bucketed scans — the only
        # permissible exchange is AFTER the join (none expected here, since
        # the groupBy key is the bucket key and partitioning propagates)
        assert "Exchange hashpartitioning" not in plan, plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        for name in ("li_bkt", "od_bkt"):
            spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_salted_join_spreads_hot_key(spark, sf_dir):
    """The salted fact side must spread the hot key over N_SALTS distinct
    (key, salt) groups — the property that kills the straggler task."""
    from datafusion_iceberg_spark.operators.skew import N_SALTS, _HOT_KEY

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    salted = li.select(
        F.expr(_HOT_KEY).alias("hot_key"),
        F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(N_SALTS)).alias(
            "salt"
        ),
    )
    spread = (
        salted.filter(F.col("hot_key") == 0)
        .select("salt")
        .distinct()
        .count()
    )
    assert spread == N_SALTS, f"hot key spread over {spread}/{N_SALTS} salts"


def test_broadcast_dimension_joins(spark, sf_dir):
    """q5 (5-way star join) must broadcast every dimension — a shuffle of
    region/nation/supplier at 100 TB wastes a full fact-table pass."""
    from datafusion_iceberg_spark import registry

    registry.load_all_modules()
    df = registry.QUERIES["q5_local_supplier_volume"](spark, sf_dir)
    plan = _executed_plan(df)
    assert len(re.findall(r"BroadcastHashJoin", plan)) >= 4, plan
    assert "SortMergeJoin" not in plan


def test_scan_prunes_columns(spark, sf_dir):
    """A 2-column projection must reach the parquet reader as a 2-column
    ReadSchema (column pruning is what makes 100 TB scans affordable)."""
    df = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .filter(F.col("l_shipdate") > "1996-01-01")
        .select("l_orderkey", "l_extendedprice")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert cols == {"l_orderkey", "l_extendedprice", "l_shipdate"}, cols
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan or "GreaterThan" in plan
