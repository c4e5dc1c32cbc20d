"""Differential fuzzer for the incremental aggregate MV (r10): random
append/COW-delete/MOR-delete sequences against a source table, refresh
after every step, and the MV must equal a from-scratch recompute of
SELECT g, SUM, COUNT, MIN, MAX, AVG FROM source WHERE pred GROUP BY g —
covering WHERE-boundary updates, retraction-driven MIN/MAX recompute,
zero-trimmed groups, and marker idempotency."""

from __future__ import annotations

import os
import random

import pytest
from pyspark.sql import functions as F

from datafusion_iceberg_spark.iceberg.catalog import Catalog
from datafusion_iceberg_spark.iceberg.mv import (
    create_aggregate_mv,
    refresh_aggregate_mv,
)


def _recompute(cat, spark, where):
    src = cat.load("m.src").to_df(spark)
    if where:
        src = src.filter(where)
    agged = src.groupBy("g").agg(
        (F.sum(F.col("v").cast("long") * 1000000)).alias("s"),
        F.count(F.lit(1)).alias("c"),
        F.min("v").alias("mn"),
        F.max("v").alias("mx"),
    )
    return {
        (r.g, r.s, r.c, r.mn, r.mx, r.av)
        for r in agged.withColumn(
            # the EXACT operation order the MV's MERGE derives avg with
            "av", (F.col("s").cast("double") / 1000000) / F.col("c")
        ).collect()
    }


def _mv_state(cat, spark):
    return {
        (r.g, r.sum_micros, r.cnt, r.min_v, r.max_v, r.avg_v)
        for r in cat.load("m.mv").to_df(spark).collect()
    }


@pytest.mark.parametrize("seed", [3, 17])
def test_mv_refresh_matches_recompute(spark, tmp_path, seed):
    rng = random.Random(seed)
    cat = Catalog(os.path.join(str(tmp_path), "wh"), name="mvf")
    df0 = spark.createDataFrame(
        [(0, "g0", 100)], "id long, g string, v long"
    )
    cat.create_table("m.src", df0.schema)
    cat.append("m.src", spark, df0)
    where = "v % 10 <> 3"  # WHERE on the source
    create_aggregate_mv(
        cat, spark, "m.mv", "m.src", ["g"], "v",
        aggs=["sum", "count", "min", "max", "avg"], where=where,
    )
    next_id = 1
    live_ids = [0]
    for step in range(8):
        op = rng.choice(["append", "cow_delete", "mor_delete", "noop"])
        if op == "append":
            rows = [
                (next_id + i, f"g{rng.randrange(3)}", rng.randrange(-50, 200))
                for i in range(rng.randrange(1, 6))
            ]
            cat.append(
                "m.src", spark, spark.createDataFrame(rows, df0.schema)
            )
            live_ids.extend(r[0] for r in rows)
            next_id += len(rows)
        elif op in ("cow_delete", "mor_delete") and live_ids:
            victim = rng.choice(live_ids)
            if op == "cow_delete":
                cat.delete_where("m.src", spark, ("<=", "id", victim))
            else:
                cat.delete_where_mor("m.src", spark, ("<=", "id", victim))
            live_ids = [i for i in live_ids if i > victim]
        out = refresh_aggregate_mv(cat, spark, "m.mv")
        assert _mv_state(cat, spark) == _recompute(cat, spark, where), (
            f"seed={seed} step={step} op={op}"
        )
        # idempotent: an immediate second refresh applies nothing
        assert refresh_aggregate_mv(cat, spark, "m.mv")["applied_rows"] == 0
