"""Test-warehouse access: load the driver's parquet tables and register them
as temp views so queries can be written in either the DataFrame or SQL API.

At 100 TB these reads would be Iceberg tables resolved through
``datafusion_iceberg_spark.iceberg``; the parquet files here stand in for
the data-file layer of that stack (same reader path:
``spark.read.parquet``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_iceberg_spark.session import apply_runtime_confs

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# (app_id, sf_dir, name) → DataFrame.  A DataFrame is an immutable logical
# plan, so reuse is safe; caching skips the parquet-footer schema read that
# otherwise costs a driver round-trip per load (× 10 tables × every query —
# the dominant fixed cost of a metadata-driven catalog, same reason the
# reference mirrors its catalog eagerly, mirror.rs:23-53).
_DF_CACHE: dict[tuple[str, str, str], DataFrame] = {}
_VIEWS_REGISTERED: dict[str, str] = {}  # app_id → sf_dir currently registered


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir, name)
    cached = _DF_CACHE.get(key)
    if cached is not None:
        return cached
    apply_runtime_confs(spark)
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        # The driver's events.ts has shipped as two physical types across
        # rounds; normalize both to Spark's native TIMESTAMP (LTZ, micros)
        # so every downstream operator sees one type:
        # - TIMESTAMP(NANOS) arrives as long (nanosAsLong conf): truncate
        #   ns→us with integer division (DIV — double division would lose
        #   precision above 2^53 ns).  DuckDB truncates the same way.
        # - TIMESTAMP(MICROS, isAdjustedToUTC=false) arrives as
        #   TIMESTAMP_NTZ: cast to LTZ under the pinned UTC session zone —
        #   the stored micros are unchanged, and DuckDB's naive TIMESTAMP
        #   reads of the same file agree value-for-value.
        from pyspark.sql import types as T

        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            df = df.withColumn(
                "ts", F.expr("timestamp_micros(CAST(ts DIV 1000 AS BIGINT))")
            )
        elif isinstance(ts_type, T.TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    _DF_CACHE[key] = df
    return df


def register_views(spark: SparkSession, sf_dir: str, names=TABLES) -> None:
    """Register each table as a temp view named after itself.  Registration
    is cached per (session, sf_dir): re-registering 10 views on every query
    costs a py4j round-trip each, and the underlying plans are immutable."""
    app_id = spark.sparkContext.applicationId
    if _VIEWS_REGISTERED.get(app_id) == sf_dir and names is TABLES:
        return
    apply_runtime_confs(spark)
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    if names is TABLES:
        _VIEWS_REGISTERED[app_id] = sf_dir


def sql_query(spark: SparkSession, sf_dir: str, sql: str, names=TABLES) -> DataFrame:
    """Register views then run a SQL query — the standard builder body."""
    register_views(spark, sf_dir, names)
    return spark.sql(sql)


def scale_out(df: DataFrame, factor: int = 1) -> DataFrame:
    """Spread a narrow scan across the cluster before compute-dense
    per-row work (hashing, shingling, UDFs).  Small single-file inputs
    arrive as ONE partition — without this, a 32-core machine runs
    expression-heavy operators on one core.  At real scale the scan is
    already wide and AQE coalesces any excess, so the round-robin shuffle
    of the (small) input is the cheapest insurance there is.  factor=1
    matches the Python-worker pool exactly: more partitions than workers
    just multiplies Arrow/worker spin-up without adding parallelism."""
    from datafusion_iceberg_spark.session import cpus

    target = cpus() * factor
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
