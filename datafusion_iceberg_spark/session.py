"""SparkSession factory tuned for the harness (local[N]) and, by the same
knobs, for a real cluster.

The settings mirror what a 1000-executor deployment would want: AQE on
(runtime re-plan, skew-join splitting, partition coalescing), shuffle
partitions sized to parallelism rather than the 200 default, Arrow enabled
for the Pandas-UDF path, and UTC session time so results are
timezone-stable against any oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs we also (re)apply to driver-provided sessions.
RUNTIME_CONFS = {
    "spark.sql.session.timeZone": "UTC",
    # local-mode: shuffle width = cores (the 200 default burns task-launch
    # overhead on tiny partitions); on a real cluster AQE coalescing makes
    # this a ceiling, not a fixed width
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Parquet scan: keep pushdown on (it is the default; pinned for clarity).
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    # events.parquet carries TIMESTAMP(NANOS) which the vectorized reader
    # rejects; read as long and convert in tables.load_table.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Iceberg id-keyed column mapping: the writer stamps PARQUET:field_id
    # on data files and the scan requests columns by id, so RENAME
    # evolution reads old files correctly.  Name-based resolution still
    # applies when the requested schema carries no ids (non-Iceberg reads
    # are unaffected).
    "spark.sql.parquet.fieldId.read.enabled": "true",
    "spark.sql.parquet.fieldId.write.enabled": "true",
}


def cpus() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(app_name: str = "datafusion_iceberg_spark") -> SparkSession:
    n = cpus()
    b = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        # Wide C2 compiler pool: loading the Arrow/Python runner floods the
        # JIT queue, and freshly generated whole-stage-codegen classes run
        # interpreted (10-20× slower) until the queue drains.  Measured on
        # local[32]: q1 tail latency 63s → 9s worst case.
        .config("spark.driver.extraJavaOptions", "-XX:CICompilerCount=20")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in RUNTIME_CONFS.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def local_df(spark: SparkSession, rows, schema):
    """Driver-state rows → DataFrame as an Arrow-backed LOCAL relation.

    ``createDataFrame(list)`` pickles through a PythonRDD parallelized
    over ``defaultParallelism`` partitions — every EXECUTION of the
    frame then costs one Python worker task per core, even for a 3-row
    metadata map, and a plan that embeds the frame N times (per-branch
    unions) pays it N times.  Routing through pandas engages the Arrow
    conversion path instead: the rows land in the JVM as a
    LocalTableScan — zero Python tasks, zero scheduler stages at
    execution (measured on the DV-masked SPJ gates: 2.4 s → 0.8 s at
    sf0.1).  ``schema`` is a DDL string (``"name type"`` or
    ``"name: type"`` items) or a StructType; falls back to the plain
    path if pandas or Arrow is unavailable, or for rows pandas cannot
    represent faithfully."""
    try:
        import pandas as pd

        if isinstance(schema, str):
            names = [
                f.strip().split(":")[0].split()[0] for f in schema.split(",")
            ]
        else:
            names = list(schema.fieldNames())
        # object dtype keeps Python ints exact: pandas would otherwise
        # coerce an int column containing None to float64, silently
        # rounding values past 2^53 (snapshot ids); Arrow converts
        # object arrays of int/None to exact int64-with-nulls
        pdf = pd.DataFrame(rows, columns=names, dtype=object)
        return spark.createDataFrame(pdf, schema)
    except Exception:
        return spark.createDataFrame(rows, schema)


def apply_runtime_confs(spark: SparkSession) -> None:
    """Best-effort apply of runtime-settable confs to an externally built
    session (the driver hands us its own SparkSession)."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass
