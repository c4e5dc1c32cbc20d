"""Skew-mitigation join patterns for the 100 TB path.

The reference inherits DataFusion 14's hash joins, which (like Spark's)
degrade when one join key dominates: every row with the hot key lands in
one shuffle partition → one straggler task.  Spark offers two answers —
AQE skew-join splitting (enabled in session.py, handles moderate skew
automatically) and **explicit key salting** for the extreme case where a
single key is a large fraction of the fact table.  This module registers
the salted pattern as a first-class, oracle-checked operator:

    fact:  salt = pmod(hash(unique cols), S)   — deterministic spread
    dim:   exploded ×S (one copy per salt value)
    join:  ON (key, salt) — the hot key now spans S partitions

Salting is semantics-preserving, so the DuckDB oracle is simply the
UNSALTED join — the strongest possible check that the rewrite is sound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_iceberg_spark.registry import register
from datafusion_iceberg_spark.tables import load_table

N_SALTS = 16

# ~90% of lineitem rows collapse onto hot key 0 — the adversarial skew a
# training-data pipeline sees when one crawl domain dominates a join key.
_HOT_KEY = "CASE WHEN l_orderkey % 10 < 9 THEN 0 ELSE l_orderkey END"
_HOT_KEY_DIM = "CASE WHEN o_orderkey % 10 < 9 THEN 0 ELSE o_orderkey END"


@register(
    "join_skew_salted",
    oracle=f"""
    WITH fact AS (
        SELECT {_HOT_KEY} AS hot_key, l_extendedprice
        FROM lineitem
    ), dim AS (
        SELECT {_HOT_KEY_DIM} AS hot_key, COUNT(*) AS n_orders
        FROM orders GROUP BY 1
    )
    SELECT f.hot_key,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(CAST(FLOOR(f.l_extendedprice * 100 + 0.5) AS BIGINT)
                AS DECIMAL(18,0))) AS DOUBLE) / 100 AS sum_price,
           MAX(d.n_orders) AS n_orders
    FROM fact f JOIN dim d ON f.hot_key = d.hot_key
    GROUP BY f.hot_key
    ORDER BY f.hot_key
    LIMIT 100
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted equi-join under extreme key skew.

    The fact side gets a deterministic salt from columns that are unique
    per row (orderkey, linenumber), the dim side is exploded ×N_SALTS, and
    the join key becomes (hot_key, salt): the 90%-hot key is spread over
    N_SALTS tasks instead of one straggler.  The oracle runs the plain
    unsalted join — identical results prove the rewrite is lossless."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")

    fact = lineitem.select(
        F.expr(_HOT_KEY).alias("hot_key"),
        "l_extendedprice",
        F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(N_SALTS)).alias(
            "salt"
        ),
    )
    dim = (
        orders.select(F.expr(_HOT_KEY_DIM).alias("hot_key"))
        .groupBy("hot_key")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(N_SALTS - 1))))
    )
    return (
        fact.join(dim, ["hot_key", "salt"])
        .groupBy("hot_key")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            (
                F.sum(
                    F.floor(F.col("l_extendedprice") * 100 + 0.5)
                    .cast("long")
                    .cast("decimal(18,0)")
                ).cast("double")
                / 100
            ).alias("sum_price"),
            F.max("n_orders").alias("n_orders"),
        )
        .orderBy("hot_key")
        .limit(100)
    )
