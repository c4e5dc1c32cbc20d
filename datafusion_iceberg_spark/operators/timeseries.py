"""Time-series gap filling — the hypertable-style `time_bucket_gapfill`
+ `interpolate`/`locf` surface (TimescaleDB/QuestDB shape) rebuilt on
plain Spark windows.

Scale design: the dense time spine is generated PER GROUP from that
group's own [min, max] bucket span with `sequence()` + `explode` —
pure JVM expressions, no driver loop, no cross-group blowup; the
interpolation windows partition by the series key, so state never
crosses groups and the sort is per-series.  At 100 TB the frame is
(series × buckets), which is the OUTPUT size — nothing bigger ever
materializes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from datafusion_iceberg_spark.registry import register
from datafusion_iceberg_spark.tables import load_table


@register(
    "ts_gapfill_interpolate",
    oracle="""
    WITH b AS (
        -- exact integer micros: per-row scaling then integer-sum/);
        -- double SUM order varies between engines, integer sums don't
        SELECT event_type, date_trunc('hour', ts) AS bucket,
               CAST(FLOOR(CAST(SUM(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)
                          / COUNT(*)) AS BIGINT) AS v
        FROM events GROUP BY 1, 2
    ),
    rng AS (
        SELECT event_type, MIN(bucket) AS lo, MAX(bucket) AS hi
        FROM b GROUP BY 1
    ),
    spine AS (
        SELECT event_type,
               unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
        FROM rng
    ),
    j AS (
        SELECT s.event_type, s.bucket, b.v
        FROM spine s LEFT JOIN b USING (event_type, bucket)
    ),
    w AS (
        SELECT *,
            last_value(v IGNORE NULLS) OVER (
                PARTITION BY event_type ORDER BY bucket
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
            last_value(CASE WHEN v IS NOT NULL THEN bucket END IGNORE NULLS)
                OVER (PARTITION BY event_type ORDER BY bucket
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pb,
            first_value(v IGNORE NULLS) OVER (
                PARTITION BY event_type ORDER BY bucket
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
            first_value(CASE WHEN v IS NOT NULL THEN bucket END IGNORE NULLS)
                OVER (PARTITION BY event_type ORDER BY bucket
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nb
        FROM j
    )
    SELECT event_type, bucket,
           CAST(CASE
                WHEN v IS NOT NULL THEN v
                WHEN pv IS NULL THEN nv
                WHEN nv IS NULL THEN pv
                ELSE pv + CAST(FLOOR(
                    CAST((nv - pv) * CAST(epoch(bucket) - epoch(pb) AS BIGINT) AS DOUBLE)
                    / CAST(epoch(nb) - epoch(pb) AS BIGINT)) AS BIGINT)
                END AS BIGINT) AS value_micro,
           (v IS NULL) AS was_gap
    FROM w ORDER BY event_type, bucket
    """,
)
def ts_gapfill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly rollup of ``events.value`` per event_type with a DENSE
    time spine: missing hours are linearly interpolated between the
    nearest present buckets (edges take the nearest neighbor — leading
    gaps backfill, trailing gaps carry forward / LOCF).  The
    time_bucket_gapfill + interpolate() pattern every monitoring /
    sensor pipeline needs, expressed as sequence-explode spine + two
    ignore-nulls windows — all JVM, no UDF.

    Determinism: values are scaled to integer MICROS per row before
    aggregation (double SUM order differs between engines; integer sums
    don't) and the interpolation divides exact integers — both engines
    produce bit-identical BIGINTs, the same pattern as embed_kmeans."""
    events = load_table(spark, sf_dir, "events")
    buckets = (
        events.groupBy(
            "event_type", F.date_trunc("hour", F.col("ts")).alias("bucket")
        )
        .agg(
            F.expr(
                "CAST(FLOOR(CAST(SUM(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT))"
                " AS DOUBLE) / COUNT(*)) AS BIGINT)"
            ).alias("v")
        )
    )
    spine = (
        buckets.groupBy("event_type")
        .agg(F.min("bucket").alias("lo"), F.max("bucket").alias("hi"))
        .select(
            "event_type",
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
            ).alias("bucket"),
        )
    )
    j = spine.join(buckets, ["event_type", "bucket"], "left")
    back = (
        W.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    fwd = (
        W.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    marked = F.when(F.col("v").isNotNull(), F.col("bucket"))
    w = (
        j.withColumn("pv", F.last("v", ignorenulls=True).over(back))
        .withColumn("pb", F.last(marked, ignorenulls=True).over(back))
        .withColumn("nv", F.first("v", ignorenulls=True).over(fwd))
        .withColumn("nb", F.first(marked, ignorenulls=True).over(fwd))
    )
    interp = F.expr(
        "pv + CAST(FLOOR("
        " CAST((nv - pv) * (unix_timestamp(bucket) - unix_timestamp(pb)) AS DOUBLE)"
        " / (unix_timestamp(nb) - unix_timestamp(pb))) AS BIGINT)"
    )
    filled = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(interp)
    )
    return (
        w.select(
            "event_type",
            "bucket",
            filled.cast("long").alias("value_micro"),
            F.col("v").isNull().alias("was_gap"),
        )
        .orderBy("event_type", "bucket")
    )


@register(
    "ts_ewma_features",
    oracle="""
    WITH seq AS (
      SELECT user_id, value,
             ROW_NUMBER() OVER w AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS n
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           CAST(MAX(n) AS BIGINT) AS n_events,
           ROUND(SUM(value * CASE WHEN rn = 1 THEN POWER(0.75, n - 1)
                                  ELSE 0.25 * POWER(0.75, n - rn) END),
                 4) AS ewma_value
    FROM seq GROUP BY user_id ORDER BY user_id
    """,
)
def ts_ewma_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series exponentially-weighted moving average (α = 0.25) at
    the latest observation — the standard feature-engineering smoother,
    computed from the CLOSED FORM e_n = Σ α(1−α)^{n−i}·v_i (first
    observation keeps the full (1−α)^{n−1} remainder), so no recursive
    UDF: one per-series window for (rn, n), one groupBy — all codegen.
    Weights vanish below double precision after ~130 steps, identically
    in both engines (same IEEE doubles), and the result rounds to 4dp
    per the repo float rule.  At 100 TB: shuffles only on the series
    key, state never crosses series."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy("user_id")).alias("n"),
    )
    weight = F.when(
        F.col("rn") == 1, F.pow(F.lit(0.75), F.col("n") - 1)
    ).otherwise(F.lit(0.25) * F.pow(F.lit(0.75), F.col("n") - F.col("rn")))
    return (
        seq.groupBy("user_id")
        .agg(
            F.max("n").cast("long").alias("n_events"),
            F.round(F.sum(F.col("value") * weight), 4).alias("ewma_value"),
        )
        .orderBy("user_id")
    )


@register(
    "ts_resample_ohlc",
    oracle="""
    SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket,
           COUNT(*) AS n,
           ROUND(MIN(value), 2) AS low, ROUND(MAX(value), 2) AS high,
           ROUND(arg_min(value, LPAD(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
                 || LPAD(CAST(event_id AS VARCHAR), 12, '0')), 2) AS open,
           ROUND(arg_max(value, LPAD(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
                 || LPAD(CAST(event_id AS VARCHAR), 12, '0')), 2) AS close
    FROM events GROUP BY event_type, bucket
    ORDER BY event_type, bucket
    """,
)
def ts_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downsample an event stream to hourly OHLC bars per series — the
    classic resample: open/close via MIN_BY/MAX_BY on a total ordering
    key (zero-padded epoch-micros ++ event_id breaks timestamp ties
    deterministically), high/low/count in the SAME single-pass
    partial-combined aggregate.  One shuffle of |buckets×series| rows
    regardless of event count — the window-function spelling
    (FIRST_VALUE over each bucket) would shuffle every EVENT into a
    sorted window instead."""
    ev = load_table(spark, sf_dir, "events")
    okey = F.concat(
        F.lpad(F.unix_micros("ts").cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    return (
        ev.groupBy(
            "event_type", F.date_trunc("HOUR", "ts").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 2).alias("low"),
            F.round(F.max("value"), 2).alias("high"),
            F.round(F.min_by("value", okey), 2).alias("open"),
            F.round(F.max_by("value", okey), 2).alias("close"),
        )
        .orderBy("event_type", "bucket")
    )


# --- interval overlap join (bucketed temporal join) -------------------------

# Bucket width for the interval expansion: sized near the typical session
# span so an interval expands to a handful of buckets (expansion factor =
# span/W + 1; the shuffle carries (bucket, interval bounds), never event
# payloads).  At 100 TB, W is the knob that trades expansion rows against
# per-bucket candidate density — same role as Databricks' range-join bin
# size hint.
_OVERLAP_BUCKET_US = 3_600_000_000  # 1 hour


def _overlap_sql(micros: str, seq: str) -> str:
    """One SQL text, two engines: ``micros`` = epoch-microseconds fn,
    ``seq`` = inclusive integer-range table function applied as
    '<seq-open>lo, hi<seq-close>' via format placeholders."""
    return f"""
    WITH s0 AS (
        SELECT user_id, ts, event_id,
               CASE WHEN ts > LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                              + INTERVAL 30 MINUTE
                     OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events
    ),
    s1 AS (
        SELECT user_id, ts,
               CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS session_id
        FROM s0
    ),
    sess AS (
        SELECT user_id, session_id,
               MIN(ts) AS s_start, MAX(ts) AS s_end
        FROM s1 GROUP BY user_id, session_id
        HAVING COUNT(*) >= 2
    ),
    sb AS (
        SELECT user_id, session_id, s_start, s_end, bucket
        FROM sess {seq.format(lo=f"{micros}(s_start) DIV {_OVERLAP_BUCKET_US}",
                              hi=f"{micros}(s_end) DIV {_OVERLAP_BUCKET_US}")}
    ),
    pts AS (
        SELECT event_id, ts,
               {micros}(ts) DIV {_OVERLAP_BUCKET_US} AS bucket
        FROM events WHERE event_type = 'error'
    ),
    cand AS (
        SELECT DISTINCT p.event_id, s.user_id, s.session_id
        FROM pts p JOIN sb s
          ON p.bucket = s.bucket
         AND p.ts >= s.s_start AND p.ts <= s.s_end
    )
    SELECT event_id, COUNT(*) AS n_active,
           CAST(MIN(user_id) AS BIGINT) AS min_user
    FROM cand GROUP BY event_id ORDER BY event_id
    """


@register(
    "join_interval_overlap",
    oracle=f"""
    WITH s0 AS (
        SELECT user_id, ts, event_id,
               CASE WHEN ts > LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                              + INTERVAL 30 MINUTE
                     OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events
    ),
    s1 AS (
        SELECT user_id, ts,
               CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS session_id
        FROM s0
    ),
    sess AS (
        SELECT user_id, session_id, MIN(ts) AS s_start, MAX(ts) AS s_end
        FROM s1 GROUP BY user_id, session_id
        HAVING COUNT(*) >= 2
    ),
    pts AS (SELECT event_id, ts FROM events WHERE event_type = 'error'),
    cand AS (
        SELECT DISTINCT p.event_id, s.user_id, s.session_id
        FROM pts p JOIN sess s
          ON p.ts >= s.s_start AND p.ts <= s.s_end
    )
    SELECT event_id, COUNT(*) AS n_active,
           CAST(MIN(user_id) AS BIGINT) AS min_user
    FROM cand GROUP BY event_id ORDER BY event_id
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL OVERLAP JOIN, distributed: which user sessions (derived
    gap>30min intervals, >=2 events) were ACTIVE at each error event —
    the temporal containment join (point IN [start, end]) that a naive
    plan executes as a theta-join cartesian.  The scale pattern: expand
    each interval to the 1-hour buckets it covers (``sequence`` +
    ``explode`` — expansion rows carry only bounds and ids), map each
    point to ITS bucket, hash-join on the bucket, exact-filter the
    containment, DISTINCT away multi-bucket double-hits.  Shuffle =
    points + interval-bucket expansions, never the pair space; the
    bucket width is the bin-size knob (Databricks' range-join hint
    plays the same role).  The DuckDB oracle is the textbook theta
    join — fine at oracle scale, the thing this plan exists to avoid
    at 100 TB."""
    from datafusion_iceberg_spark.operators.relational import sql_query

    return sql_query(
        spark,
        sf_dir,
        _overlap_sql(
            "unix_micros",
            "LATERAL VIEW explode(sequence({lo}, {hi})) b AS bucket",
        ),
    )
