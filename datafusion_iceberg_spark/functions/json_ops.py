"""JSON functions over ``events.props`` (JSON text column).

Not in DataFusion 14 core (SURVEY.md §2B marks JSON as extended surface),
but free in Spark: ``get_json_object`` / ``from_json`` stay JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datafusion_iceberg_spark.registry import register
from datafusion_iceberg_spark.tables import load_table


@register(
    "json_extract_scalar",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
    FROM events ORDER BY event_id
    """,
)
def json_extract_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_value"),
    ).orderBy("event_id")


@register(
    "json_from_json_agg",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def json_from_json_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed extraction via from_json with an explicit schema (the
    production shape — one parse, typed struct, no per-field re-parse)."""
    events = load_table(spark, sf_dir, "events")
    parsed = events.withColumn(
        "j", F.from_json("props", T.StructType([T.StructField("k", T.LongType())]))
    )
    return (
        parsed.groupBy("event_type")
        .agg(
            F.sum(F.col("j.k")).alias("sum_k"),
            F.max(F.col("j.k")).alias("max_k"),
        )
        .orderBy("event_type")
    )


@register(
    "json_conditional_stats",
    oracle="""
    SELECT event_type,
           COUNT(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
                 THEN 1 END) AS n_high,
           COUNT(*) AS n_total
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def json_conditional_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        events.groupBy("event_type")
        .agg(
            F.count(F.when(k > 50, 1)).alias("n_high"),
            F.count(F.lit(1)).alias("n_total"),
        )
        .orderBy("event_type")
    )


@register(
    "json_map_bank",
    oracle="""
    SELECT event_id,
           array_to_string(json_keys(props), ',') AS ks,
           array_to_string([CAST(json_extract_string(props, '$.k') AS BIGINT)], ',') AS vs,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           len(json_keys(props)) AS n_entries,
           CAST(1 AS INTEGER) AS has_k
    FROM events WHERE event_id < 500 ORDER BY event_id
    """,
)
def json_map_bank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-function bank over JSON parsed as ``map<string,long>``:
    map_keys / map_values / element_at / size / map_contains_key — the
    map surface Spark adds beyond DataFusion 14 (SURVEY.md §2B JSON row).
    Array outputs are stringified: the comparison harness canonicalizes
    scalar cells only (raw arrays are unhashable there)."""
    events = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    return (
        events.filter(F.col("event_id") < 500)
        .select(
            "event_id",
            F.concat_ws(",", F.map_keys(m)).alias("ks"),
            F.concat_ws(",", F.map_values(m)).alias("vs"),
            F.element_at(m, "k").alias("k_val"),
            F.size(m).alias("n_entries"),
            F.map_contains_key(m, "k").cast("int").alias("has_k"),
        )
        .orderBy("event_id")
    )
