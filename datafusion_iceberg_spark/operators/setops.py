"""Set operations (SURVEY.md §2B): UNION [ALL] / INTERSECT [ALL] /
EXCEPT [ALL] — DataFrame API; Catalyst rewrites intersect/except to
semi/anti joins, which is exactly how DataFusion 14 executes them too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_iceberg_spark.registry import register
from datafusion_iceberg_spark.tables import load_table


def _rich(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select(F.col("c_nationkey").alias("nationkey"))
    )


def _supp(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )


@register(
    "setop_union_all",
    oracle="""
    SELECT nationkey, COUNT(*) AS n FROM (
        SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 5000
        UNION ALL
        SELECT s_nationkey AS nationkey FROM supplier
    ) GROUP BY nationkey ORDER BY nationkey
    """,
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    u = _rich(spark, sf_dir).unionAll(_supp(spark, sf_dir))
    return u.groupBy("nationkey").agg(F.count(F.lit(1)).alias("n")).orderBy("nationkey")


@register(
    "setop_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 5000
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    ORDER BY nationkey
    """,
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _rich(spark, sf_dir).union(_supp(spark, sf_dir)).distinct().orderBy("nationkey")
    )


@register(
    "setop_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 5000
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    ORDER BY nationkey
    """,
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _rich(spark, sf_dir).intersect(_supp(spark, sf_dir)).orderBy("nationkey")


@register(
    "setop_intersect_all",
    oracle="""
    SELECT n_regionkey AS k FROM nation
    INTERSECT ALL
    SELECT r_regionkey AS k FROM region
    ORDER BY k
    """,
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    nat = load_table(spark, sf_dir, "nation").select(F.col("n_regionkey").alias("k"))
    reg = load_table(spark, sf_dir, "region").select(F.col("r_regionkey").alias("k"))
    return nat.intersectAll(reg).orderBy("k")


@register(
    "setop_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    ORDER BY nationkey
    """,
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    return cust.subtract(_supp(spark, sf_dir)).orderBy("nationkey")


@register(
    "setop_except_all",
    oracle="""
    SELECT n_regionkey AS k FROM nation
    EXCEPT ALL
    SELECT r_regionkey AS k FROM region
    ORDER BY k
    """,
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    nat = load_table(spark, sf_dir, "nation").select(F.col("n_regionkey").alias("k"))
    reg = load_table(spark, sf_dir, "region").select(F.col("r_regionkey").alias("k"))
    return nat.exceptAll(reg).orderBy("k")
