"""Window-function surface (SURVEY.md §2B — ranking, analytic, frames).

Determinism note: window outputs are only oracle-comparable when the ORDER
BY inside the window is total (ties broken by a unique key) *or* the
function is order-key-determined (rank/dense_rank/percent_rank/cume_dist
depend only on the key values, so ties are safe).  Every query here obeys
that rule — the same discipline keeps results stable across cluster
re-runs at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from datafusion_iceberg_spark.registry import register
from datafusion_iceberg_spark.tables import load_table
from datafusion_iceberg_spark.operators.relational import register_sql


@register(
    "window_topk_per_group",
    oracle="""
    SELECT * FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    ) WHERE rn <= 3
    ORDER BY o_custkey, rn
    """,
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group — the canonical window pattern; at 100 TB prefer this
    over groupBy+collect+sort (single shuffle on the partition key, no
    driver materialization)."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")
    )


@register(
    "window_ranking_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           RANK() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS rnk,
           DENSE_RANK() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS drnk,
           ROUND(PERCENT_RANK() OVER (PARTITION BY l_returnflag ORDER BY l_quantity), 9) AS prnk,
           ROUND(CUME_DIST() OVER (PARTITION BY l_returnflag ORDER BY l_quantity), 9) AS cdist
    FROM lineitem
    WHERE l_orderkey < 500
    ORDER BY l_orderkey, l_linenumber
    """,
)
def window_ranking_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank/percent_rank/cume_dist over tied keys — deterministic
    because these depend only on the order-key values."""
    lineitem = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 500)
    w = W.partitionBy("l_returnflag").orderBy("l_quantity")
    return lineitem.select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.round(F.percent_rank().over(w), 9).alias("prnk"),
        F.round(F.cume_dist().over(w), 9).alias("cdist"),
    ).orderBy("l_orderkey", "l_linenumber")


@register(
    "window_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           LAG(o_totalprice) OVER w AS prev_price,
           LEAD(o_totalprice) OVER w AS next_price,
           LAG(o_totalprice, 2, -1.0) OVER w AS prev2_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, o_orderkey
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.lag("o_totalprice", 2, -1.0).over(w).alias("prev2_price"),
    ).orderBy("o_custkey", "o_orderkey")


@register(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS DECIMAL(18,0)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 100
             AS running_total,
           COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_n
    FROM orders
    ORDER BY o_custkey, o_orderkey
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative aggregate with an explicit ROWS frame; decimal-sum inside
    the frame for cross-engine bitwise equality."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    scaled = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").cast(
        "decimal(18,0)"
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        (F.sum(scaled).over(w).cast("double") / 100).alias("running_total"),
        F.count(F.lit(1)).over(w).alias("running_n"),
    ).orderBy("o_custkey", "o_orderkey")


@register(
    "window_sliding_rows_frame",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS DECIMAL(18,0)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) / 100
             AS moving_sum_3
    FROM orders
    ORDER BY o_custkey, o_orderkey
    """,
)
def window_sliding_rows_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, W.currentRow)
    )
    scaled = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").cast(
        "decimal(18,0)"
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        (F.sum(scaled).over(w).cast("double") / 100).alias("moving_sum_3"),
    ).orderBy("o_custkey", "o_orderkey")


@register(
    "window_range_frame",
    oracle="""
    SELECT s_suppkey, s_acctbal,
           COUNT(*) OVER (ORDER BY s_acctbal
                          RANGE BETWEEN 500.0 PRECEDING AND 500.0 FOLLOWING)
             AS n_within_500
    FROM supplier
    ORDER BY s_suppkey
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over a numeric key — frame membership is value-defined,
    so ties are safe.

    Distributed without a global window: chunk rows by 1000-wide value
    ranges (>= 2x the 500 frame radius), replicate every row to its own
    chunk and both neighbors, and run the RANGE window PARTITIONED by
    chunk — any row's +-500 frame lies entirely within {k-1, k, k+1}, so
    the partitioned count over the replicated set equals the global
    count for rows evaluated in their HOME chunk; replica rows are
    dropped after the window.  3x shuffle volume on (key, value) pairs
    buys full parallelism; partition size is bounded by the value-range
    density (the inherent limit of RANGE frames — ties must co-locate)."""
    supplier = load_table(spark, sf_dir, "supplier")
    s = supplier.select(
        "s_suppkey",
        "s_acctbal",
        F.floor(F.col("s_acctbal") / 1000).cast("long").alias("home"),
    )
    rep = s.select(
        "s_suppkey",
        "s_acctbal",
        "home",
        F.explode(
            F.array(F.col("home") - 1, F.col("home"), F.col("home") + 1)
        ).alias("pchunk"),
    )
    # fractional RANGE bounds only via the SQL window expression
    counted = rep.withColumn(
        "n_within_500",
        F.expr(
            "COUNT(*) OVER (PARTITION BY pchunk ORDER BY s_acctbal"
            " RANGE BETWEEN 500.0 PRECEDING AND 500.0 FOLLOWING)"
        ),
    )
    return (
        counted.filter(F.col("pchunk") == F.col("home"))
        .select("s_suppkey", "s_acctbal", "n_within_500")
        .orderBy("s_suppkey")
    )


@register(
    "window_ntile",
    oracle="""
    SELECT c_custkey, NTILE(4) OVER (ORDER BY c_acctbal, c_custkey) AS quartile
    FROM customer ORDER BY c_custkey
    """,
)
def window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE over a GLOBAL order without a single-task global window:
    two-phase distributed rank (the text_pack_sequences prefix-sum
    pattern).  Phase 1 chunks rows by a range of the leading order key
    (chunk order == global order; ties share a chunk because chunk is a
    function of the value), cumsums the tiny per-chunk counts frame into
    row offsets, and broadcasts them.  Phase 2 row_numbers WITHIN each
    chunk (partitioned window — parallel) and adds the offset: a global
    1-based rank with no corpus-sized window.  The bucket then follows
    the exact SQL NTILE split (first N%n buckets get one extra row)
    computed from the 1-row total-count attach."""
    customer = load_table(spark, sf_dir, "customer")
    t = customer.select(
        "c_custkey",
        "c_acctbal",
        # acctbal spans ~[-1000, 10000]; 500-wide value chunks keep each
        # partitioned window bounded while preserving global order
        F.floor(F.col("c_acctbal") / 500).cast("long").alias("chunk"),
    )
    chunk_cnt = t.groupBy("chunk").agg(F.count(F.lit(1)).alias("cn"))
    w_chunks = W.orderBy("chunk").rowsBetween(W.unboundedPreceding, -1)
    # tiny frame: one row per value chunk — allowlisted global window
    offsets = chunk_cnt.select(
        "chunk", F.coalesce(F.sum("cn").over(w_chunks), F.lit(0)).alias("off")
    )
    total = chunk_cnt.agg(F.sum("cn").alias("N"))  # 1-row constant attach
    w_in = W.partitionBy("chunk").orderBy("c_acctbal", "c_custkey")
    ranked = (
        t.join(F.broadcast(offsets), "chunk")
        .crossJoin(F.broadcast(total))
        .withColumn("rn", F.col("off") + F.row_number().over(w_in))
    )
    # SQL NTILE(n): q = N div n, r = N mod n; buckets 1..r have q+1 rows
    n = F.lit(4)
    q, r = F.floor(F.col("N") / n), F.col("N") % n
    cut = r * (q + 1)  # last rank inside the "big" buckets
    q_safe = F.greatest(q, F.lit(1))  # q=0 => otherwise-branch unreachable
    quartile = F.when(
        F.col("rn") <= cut, F.floor((F.col("rn") - 1) / (q + 1)) + 1
    ).otherwise(r + F.floor((F.col("rn") - cut - 1) / q_safe) + 1)
    return ranked.select(
        "c_custkey", quartile.cast("int").alias("quartile")
    ).orderBy("c_custkey")


@register(
    "window_first_last_nth",
    oracle="""
    SELECT o_custkey, o_orderkey,
           FIRST_VALUE(o_totalprice) OVER w AS first_price,
           LAST_VALUE(o_totalprice) OVER w AS last_price,
           NTH_VALUE(o_totalprice, 2) OVER w AS second_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY o_custkey, o_orderkey
    """,
)
def window_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
    ).orderBy("o_custkey", "o_orderkey")


# Sessionization: gap>threshold cumulative-flag pattern (batch analogue of
# streaming session windows; see streaming/ for the session_window version).
register_sql(
    "window_sessionization",
    """
    SELECT user_id, session_id, COUNT(*) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM (
        SELECT user_id, ts,
               CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS session_id
        FROM (
            SELECT user_id, ts, event_id,
                   CASE WHEN ts > LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                                  + INTERVAL '30' MINUTE
                         OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                        THEN 1 ELSE 0 END AS is_new
            FROM events
        )
    )
    GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
    oracle="""
    SELECT user_id, session_id, COUNT(*) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM (
        SELECT user_id, ts,
               CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS session_id
        FROM (
            SELECT user_id, ts, event_id,
                   CASE WHEN ts > LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                                  + INTERVAL 30 MINUTE
                         OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                        THEN 1 ELSE 0 END AS is_new
            FROM events
        )
    )
    GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
)


# Funnel analysis: ordered view→click→purchase progression per user —
# each later stage strictly after the user's FIRST completion of the
# earlier one (the sequence-match shape product analytics runs at
# 100 TB).  Three aggregations + two left joins, all shuffled on
# user_id, so one co-partitioned exchange chain and no self-join
# explosion; the same SQL runs on both engines.
register_sql(
    "window_funnel_stages",
    """
    WITH v AS (
        SELECT user_id, MIN(ts) AS t_view
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, MIN(e.ts) AS t_click
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts > v.t_view
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, MIN(e.ts) AS t_purchase
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.t_click
        GROUP BY e.user_id
    )
    SELECT reached_stage, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM (
        SELECT v.user_id,
               CASE WHEN p.user_id IS NOT NULL THEN 3
                    WHEN c.user_id IS NOT NULL THEN 2
                    ELSE 1 END AS reached_stage
        FROM v
        LEFT JOIN c ON v.user_id = c.user_id
        LEFT JOIN p ON p.user_id = v.user_id
    )
    GROUP BY reached_stage ORDER BY reached_stage
    """,
)


@register(
    "window_retention_cohorts",
    oracle="""
    WITH ev AS (
      SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk FROM events
    ),
    cohort AS (SELECT user_id, MIN(wk) AS cohort_wk FROM ev GROUP BY user_id),
    activity AS (SELECT DISTINCT user_id, wk FROM ev)
    SELECT CAST(cohort.cohort_wk AS TIMESTAMP) AS cohort_week,
           CAST((activity.wk - cohort.cohort_wk) / 7 AS INTEGER) AS week_offset,
           COUNT(DISTINCT activity.user_id) AS n_users
    FROM activity JOIN cohort USING (user_id)
    GROUP BY 1, 2 ORDER BY cohort_week, week_offset
    """,
)
def window_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention cohort matrix — the product-analytics staple: users
    grouped by FIRST-ACTIVITY week, counted in each subsequent week
    they return (cohort_week × week_offset).

    Scale shape: two aggregations over (user_id, week) pairs — the
    cohort assignment is a per-user MIN and the activity set a
    DISTINCT, both shuffling narrow pairs; the cohort frame (one row
    per user) joins back user-keyed.  No window function at all: the
    cohort shape is pure groupBy/join, which scales past any
    per-partition window."""
    events = load_table(spark, sf_dir, "events")
    ev = events.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("wk")
    )
    cohort = ev.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    activity = ev.distinct()
    return (
        activity.join(cohort, "user_id")
        .groupBy(
            F.col("cohort_wk").cast("timestamp").alias("cohort_week"),
            (F.datediff(F.col("wk"), F.col("cohort_wk")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


@register(
    "window_time_range_frame",
    oracle="""
    SELECT user_id, event_id,
           CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) OVER (
             PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 30 MINUTES PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cents_30m,
           COUNT(*) OVER (
             PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 30 MINUTES PRECEDING AND CURRENT ROW
           ) AS n_30m
    FROM events WHERE user_id < 200 ORDER BY user_id, event_id
    """,
)
def window_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval RANGE frame: each event's rolling 30-minute sum /
    count over ITS OWN trailing window — value-based bounds, so ties in
    ts land in one frame regardless of row order (deterministic where a
    ROWS frame would not be).  One shuffle on user_id; frames never
    cross partitions.  The rolling-feature shape of fraud/abuse scoring
    at event-stream scale."""
    from datafusion_iceberg_spark.tables import sql_query

    return sql_query(
        spark,
        sf_dir,
        """
        SELECT user_id, event_id,
               CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) OVER (
                 PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 30 MINUTES PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS cents_30m,
               COUNT(*) OVER (
                 PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 30 MINUTES PRECEDING AND CURRENT ROW
               ) AS n_30m
        FROM events WHERE user_id < 200 ORDER BY user_id, event_id
        """,
    )


@register(
    "window_rolling_distinct_users",
    oracle="""
    WITH daily AS (
      SELECT DISTINCT event_type, CAST(ts AS DATE) AS d, user_id FROM events
    ),
    days AS (SELECT DISTINCT event_type, d FROM daily)
    SELECT days.event_type, CAST(days.d AS TIMESTAMP) AS day_ts,
           CAST(COUNT(DISTINCT daily.user_id) AS BIGINT) AS u7
    FROM days
    JOIN daily ON daily.event_type = days.event_type
              AND daily.d BETWEEN days.d - 6 AND days.d
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def window_rolling_distinct_users(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EXACT trailing-7-day distinct users per event type — the DAU/WAU
    family Spark's window aggregates don't provide directly
    (count_distinct is unsupported over windows; approx_count_distinct
    is lossy).  Shape: dedup to (type, day, user) grain FIRST — the
    shuffle carries one row per active user-day, not per event — then
    ``size(collect_set(user))`` over a day-RANGE frame gives the exact
    rolling union cardinality (daily distincts cannot be summed: users
    overlap across days).  At 100 TB the set state is bounded by one
    window's distinct users per partition key; when that itself is too
    wide, the same query composes with the bitmap rollup
    (agg_bitmap_distinct) — per-day bitmaps OR-merge across the frame
    instead of materializing sets.  The DuckDB oracle replays via the
    interval self-join (portable exact semantics)."""
    daily = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.to_date("ts").alias("d"),
            "user_id",
        )
        .distinct()
    )
    w = (
        W.partitionBy("event_type")
        .orderBy(F.unix_date(F.col("d")))
        .rangeBetween(-6, 0)
    )
    return (
        daily.withColumn(
            "u7", F.size(F.collect_set("user_id").over(w)).cast("long")
        )
        .select(
            "event_type",
            F.col("d").cast("timestamp").alias("day_ts"),
            "u7",
        )
        .distinct()
        .orderBy("event_type", "day_ts")
    )
