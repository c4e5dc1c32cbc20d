"""As-of and range joins — operators the reference's host engine
(DataFusion 14) reaches via sort-merge/nested-loop and Spark has no native
operator for.  Implemented as compositions of built-in DataFrame ops
(SURVEY.md §2B "custom operators" guidance):

- **as-of join**: union the two streams, tag, and take ``last(value,
  ignorenulls)`` over an ordered window — one shuffle on the key, no
  nested loop; scales linearly, no broadcast required.
- **banded range join**: quantize the range key into buckets, explode the
  probe side into adjacent buckets, equi-join on the bucket, re-filter the
  exact band.  Turns an O(n·m) nested-loop into an equi-shuffle — the only
  way a pure range join survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from datafusion_iceberg_spark.registry import register
from datafusion_iceberg_spark.tables import load_table
from datafusion_iceberg_spark.operators.relational import register_sql


@register(
    "join_asof",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts, c.ts AS last_click_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    ORDER BY p.event_id
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each purchase, the most recent click (same user, ts <= purchase
    ts).  Union-window formulation: O(n log n) per user partition, single
    shuffle on user_id."""
    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(None).cast("long").alias("event_id"),
        F.col("ts").alias("click_ts"),
        F.lit(0).alias("is_left"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        "event_id",
        F.lit(None).cast("timestamp").alias("click_ts"),
        F.lit(1).alias("is_left"),
    )
    # At equal ts the click sorts first (is_left asc) so `>=` semantics match
    # DuckDB's ASOF JOIN.
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "is_left")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    merged = clicks.unionByName(purchases).withColumn(
        "last_click_ts", F.last("click_ts", ignorenulls=True).over(w)
    )
    return (
        merged.filter(F.col("is_left") == 1)
        .select("event_id", "user_id", "ts", "last_click_ts")
        .orderBy("event_id")
    )


register_sql(
    "join_range_equi",
    """
    SELECT o_orderpriority, COUNT(*) AS n_lines
    FROM lineitem JOIN orders
      ON l_orderkey = o_orderkey
     AND l_shipdate >= o_orderdate
     AND l_shipdate < o_orderdate + INTERVAL '90' DAY
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_lines
    FROM lineitem JOIN orders
      ON l_orderkey = o_orderkey
     AND l_shipdate >= o_orderdate
     AND l_shipdate < o_orderdate + INTERVAL 90 DAY
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)


@register(
    "join_range_banded",
    oracle="""
    SELECT p.event_id, COUNT(c.event_id) AS n_nearby_clicks
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON c.ts BETWEEN p.ts - INTERVAL 5 MINUTE AND p.ts + INTERVAL 5 MINUTE
    GROUP BY p.event_id ORDER BY p.event_id
    """,
)
def join_range_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure range join (no equi key): clicks within ±5 min of each purchase.
    Bucketize ts to 5-min cells, explode probe into the 3 adjacent cells,
    equi-join on the cell, exact re-filter — shuffle-friendly at any scale."""
    band_us = 5 * 60 * 1_000_000  # 5 minutes in microseconds
    events = load_table(spark, sf_dir, "events")
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(F.col("event_id").alias("c_id"), F.unix_micros("ts").alias("c_us"))
        .withColumn("bucket", (F.col("c_us") / band_us).cast("long"))
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(F.col("event_id").alias("p_id"), F.unix_micros("ts").alias("p_us"))
        .withColumn(
            "bucket",
            F.explode(
                F.array(
                    ((F.col("p_us") / band_us).cast("long") - 1),
                    (F.col("p_us") / band_us).cast("long"),
                    ((F.col("p_us") / band_us).cast("long") + 1),
                )
            ),
        )
    )
    matched = (
        purchases.join(clicks, "bucket")
        .filter(F.abs(F.col("c_us") - F.col("p_us")) <= band_us)
        .groupBy("p_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    all_p = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id")
    )
    return (
        all_p.join(matched, "p_id", "left")
        .select(
            F.col("p_id").alias("event_id"),
            F.coalesce(F.col("n"), F.lit(0)).alias("n_nearby_clicks"),
        )
        .orderBy("event_id")
    )
