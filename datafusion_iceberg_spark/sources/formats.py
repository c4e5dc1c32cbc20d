"""Multi-format sources & sinks (SURVEY.md §2B "Scans/sources": the
reference wires only Parquet through DataFusion — table.rs:14, 291 — but
DataFusion 14 ships CSV/JSON/memory sources; Spark gives csv/json/orc +
binaryFile free, and the write side makes each a sink too).

Each query round-trips a table through a format (write once to .scratch,
cached) and answers an aggregate from the re-read copy — if parsing,
schema application, or type mapping is lossy, the oracle on the original
parquet catches it.
"""

from __future__ import annotations

import os
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_iceberg_spark.iceberg.queries import SCRATCH
from datafusion_iceberg_spark.registry import register
from datafusion_iceberg_spark.tables import load_table
from datafusion_iceberg_spark.session import local_df

_lock = threading.Lock()


def _roundtrip(spark: SparkSession, sf_dir: str, table: str, fmt: str) -> DataFrame:
    tag = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join(SCRATCH, f"fmt_{tag}_{table}.{fmt}")
    src = load_table(spark, sf_dir, table)
    with _lock:
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            w = src.write.mode("overwrite")
            if fmt == "csv":
                w = w.option("header", True)
            getattr(w, fmt)(path)
    reader = spark.read
    if fmt == "csv":
        # explicit schema — no inference (production rule; SURVEY.md §1.1:
        # "nothing is inferred at read time")
        return reader.schema(src.schema).option("header", True).csv(path)
    if fmt == "json":
        return reader.schema(src.schema).json(path)
    return reader.orc(path)


@register(
    "source_csv_roundtrip",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n,
           CAST(SUM(CAST(CAST(FLOOR((c_acctbal) * 1000000 + 0.5) AS BIGINT) AS DECIMAL(18,0))) AS DOUBLE) / 1000000 AS total_bal
    FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    df = _roundtrip(spark, sf_dir, "customer", "csv")
    return (
        df.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("c_acctbal").cast("decimal(30,8)"))
            .cast("double")
            .alias("total_bal"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "source_json_roundtrip",
    oracle="""
    SELECT s_nationkey, COUNT(*) AS n, MAX(s_acctbal) AS max_bal
    FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey
    """,
)
def source_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    df = _roundtrip(spark, sf_dir, "supplier", "json")
    return (
        df.groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).alias("n"), F.max("s_acctbal").alias("max_bal"))
        .orderBy("s_nationkey")
    )


@register(
    "source_orc_roundtrip",
    oracle="""
    SELECT p_brand, COUNT(*) AS n, MIN(p_retailprice) AS min_price
    FROM part GROUP BY p_brand ORDER BY p_brand
    """,
)
def source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    df = _roundtrip(spark, sf_dir, "part", "orc")
    return (
        df.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("p_retailprice").alias("min_price"),
        )
        .orderBy("p_brand")
    )


@register(
    "source_binaryfile_scan",
    oracle="""
    SELECT COUNT(*) AS n_files,
           CAST(SUM(CAST(octet_length(content) > 0 AS BIGINT)) AS BIGINT) AS n_nonempty
    FROM (SELECT from_hex(md5(text)) AS content FROM documents)
    """,
)
def source_binaryfile_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """binaryFile-shaped scan: opaque payload + metadata columns (here the
    payloads are synthesized to stay hermetic; spark.read.format
    ('binaryFile') yields the same shape for real media dirs)."""
    from pyspark.sql import functions as F

    from datafusion_iceberg_spark.extensions.multimodal import synthesize_media

    media = synthesize_media(load_table(spark, sf_dir, "documents"))
    return media.agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum((F.length("content") > 0).cast("long")).alias("n_nonempty"),
    )


@register(
    "source_avro_roundtrip",
    oracle="""
    SELECT n_regionkey, COUNT(*) AS n_nations,
           MIN(n_name) AS first_name
    FROM nation WHERE n_nationkey < 5000
    GROUP BY n_regionkey ORDER BY n_regionkey
    """,
)
def source_avro_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avro source via the pure-Python codec that also decodes Iceberg
    manifests (iceberg/avro.py — deflate codec, unions, nested records):
    write the table to an Avro file on the driver, read it back, hand the
    rows to Spark.  Driver-side by design: the same codec path a
    spark-avro package would run executor-side; at 100 TB the Avro inputs
    are manifest-sized metadata, not data files, so driver decoding is
    the real deployment shape (SURVEY.md §2A manifest handling).  The
    collect is FENCED to n_nationkey < 5000 — metadata-sized by contract;
    an unbounded driver collect in a registered query would be a scale
    hazard regardless of intent."""
    import os

    from datafusion_iceberg_spark.iceberg.avro import (
        read_avro_file,
        write_avro_file,
    )

    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_nationkey") < 5000
    )
    tag = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join(SCRATCH, f"fmt_{tag}_nation.avro")
    with _lock:
        if not os.path.exists(path):
            os.makedirs(SCRATCH, exist_ok=True)
            schema = {
                "type": "record",
                "name": "nation",
                "fields": [
                    {"name": "n_nationkey", "type": "long"},
                    {"name": "n_name", "type": "string"},
                    {"name": "n_regionkey", "type": "long"},
                ],
            }
            rows = [r.asDict() for r in nation.collect()]
            write_avro_file(path, schema, rows)
    _, records = read_avro_file(path)
    df = local_df(spark, records, schema=nation.schema)
    return (
        df.groupBy("n_regionkey")
        .agg(
            F.count(F.lit(1)).alias("n_nations"),
            F.min("n_name").alias("first_name"),
        )
        .orderBy("n_regionkey")
    )


@register(
    "corpus_export_jsonl",
    oracle="""
    SELECT (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INT % 8)
             AS shard,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(LENGTH(text)) AS BIGINT) AS total_text_len
    FROM documents GROUP BY 1 ORDER BY shard
    """,
)
def corpus_export_jsonl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-data HANDOFF step: export the corpus as hash-sharded
    JSON-lines (the format every trainer ingests), then read the shards
    BACK and summarize — so the gate verifies the export round-trip
    (JSON escaping of the text payload included), not just the write
    call.  Shard assignment is the deterministic id-hash bucket (a
    rerun writes byte-identical shard membership).

    Scale shape: the export is one map-side shard tag + a
    ``partitionBy(shard)`` write (executors write their own shard
    files, no driver funneling); the verification scan reads the JSON
    back with an explicit schema (no inference pass)."""
    import os

    from datafusion_iceberg_spark.extensions.sampling import hash_bucket

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out_dir = os.path.join(SCRATCH, f"export_{tag}_jsonl")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "n_chars"
    )
    tagged = docs.withColumn("shard", hash_bucket(F.col("doc_id"), 8))
    if not os.path.exists(os.path.join(out_dir, "_SUCCESS")):
        tagged.write.mode("overwrite").partitionBy("shard").json(out_dir)
    schema = "doc_id BIGINT, text STRING, n_chars BIGINT"
    # partitionBy moved `shard` into the directory names; basePath read
    # restores it as a column
    back = spark.read.schema(schema).option("basePath", out_dir).json(
        os.path.join(out_dir, "shard=*")
    )
    return (
        back.withColumn("shard", F.col("shard").cast("int"))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.sum(F.length("text")).cast("long").alias("total_text_len"),
        )
        .orderBy("shard")
    )


@register(
    "source_json_corrupt_records",
    oracle="""
    SELECT (SELECT COUNT(*) FROM orders WHERE o_orderkey % 11 = 0)
             AS n_good,
           5 AS n_corrupt,
           (SELECT CAST(SUM(o_orderkey) AS BIGINT) FROM orders
             WHERE o_orderkey % 11 = 0) AS good_key_sum
    """,
)
def source_json_corrupt_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fault-tolerant ingestion: a JSONL batch containing 5 malformed
    lines reads under PERMISSIVE mode — good rows parse, bad lines land
    whole in ``_corrupt_record`` (no job failure, no silent drop), and
    the counts reconcile exactly.  The production pattern: route the
    corrupt column to a quarantine sink and keep the pipeline flowing;
    FAILFAST is one option away when corruption must abort."""
    import os

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from datafusion_iceberg_spark.iceberg.queries import SCRATCH, _lock
    from datafusion_iceberg_spark.tables import load_table

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    stage = os.path.join(SCRATCH, f"corrupt_json_{tag}")
    done = os.path.join(stage, "_COMPLETE")
    with _lock:
        if not os.path.exists(done):
            import shutil

            shutil.rmtree(stage, ignore_errors=True)
            os.makedirs(stage, exist_ok=True)
            rows = (
                load_table(spark, sf_dir, "orders")
                .filter("o_orderkey % 11 = 0")
                .select("o_orderkey", "o_custkey", "o_orderstatus")
            )
            rows.write.mode("overwrite").json(os.path.join(stage, "good"))
            with open(os.path.join(stage, "good", "bad.json"), "w") as fh:
                for i in range(5):
                    fh.write(f'{{"o_orderkey": {i}, "o_custkey": BOOM\n')
            with open(done, "w") as fh:
                fh.write("ok")
    schema = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(os.path.join(stage, "good"))
    )
    bad = F.col("_corrupt_record").isNotNull()
    return df.agg(
        F.sum(F.when(~bad, 1).otherwise(0)).cast("long").alias("n_good"),
        F.sum(F.when(bad, 1).otherwise(0)).cast("int").alias("n_corrupt"),
        F.sum(F.when(~bad, F.col("o_orderkey"))).cast("long").alias(
            "good_key_sum"
        ),
    )
