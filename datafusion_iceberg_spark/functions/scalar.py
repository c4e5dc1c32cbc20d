"""Scalar function banks (SURVEY.md §2B: string / math / datetime /
conditional) — the DataFusion 14 scalar surface re-expressed with
``pyspark.sql.functions`` (JVM-side, whole-stage-codegen'd; no Python in
the hot path).

Oracle notes: transcendentals (sin/cos/exp/ln/atan2) are rounded to 6
decimals on both sides — JVM libm and DuckDB's C libm can differ in the
last ulp.  IEEE-exact ops (abs/ceil/floor/sqrt/sign) compare unrounded.
DuckDB's ``regexp_replace`` is first-match-only by default, so the oracle
passes the ``'g'`` flag to match Spark's replace-all semantics.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_iceberg_spark.registry import register
from datafusion_iceberg_spark.tables import load_table


@register(
    "fn_string_bank",
    oracle="""
    SELECT p_partkey,
           UPPER(p_name) AS up_name,
           LOWER(p_brand) AS low_brand,
           LENGTH(p_name) AS name_len,
           SUBSTR(p_name, 1, 8) AS name_prefix,
           CONCAT(p_brand, ':', p_type) AS brand_type,
           REPLACE(p_name, ' ', '_') AS snake_name,
           LPAD(CAST(p_partkey AS VARCHAR), 10, '0') AS padded_key,
           REVERSE(p_brand) AS rev_brand,
           STRPOS(p_name, 'a') AS first_a,
           SPLIT_PART(p_type, ' ', 1) AS type_head,
           TRIM('  ' || p_brand || '  ') AS trimmed,
           MD5(p_name) AS name_md5,
           SHA256(p_name) AS name_sha256
    FROM part ORDER BY p_partkey
    """,
)
def fn_string_bank(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("up_name"),
        F.lower("p_brand").alias("low_brand"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("snake_name"),
        F.lpad(F.col("p_partkey").cast("string"), 10, "0").alias("padded_key"),
        F.reverse("p_brand").alias("rev_brand"),
        F.instr("p_name", "a").alias("first_a"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_head"),
        F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit("  "))).alias("trimmed"),
        F.md5("p_name").alias("name_md5"),
        F.sha2("p_name", 256).alias("name_sha256"),
    ).orderBy("p_partkey")


@register(
    "fn_regexp_bank",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
           regexp_replace(p_name, '[aeiou]', '*', 'g') AS starred,
           CASE WHEN regexp_matches(p_type, '^Type[13]') THEN 1 ELSE 0 END AS is_type13
    FROM part ORDER BY p_partkey
    """,
)
def fn_regexp_bank(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"),
        F.regexp_replace("p_name", r"[aeiou]", "*").alias("starred"),
        F.when(F.col("p_type").rlike(r"^Type[13]"), 1).otherwise(0).alias("is_type13"),
    ).orderBy("p_partkey")


@register(
    "fn_math_bank",
    oracle="""
    SELECT s_suppkey,
           ABS(s_acctbal - 5000) AS abs_centered,
           CAST(CEIL(s_acctbal) AS BIGINT) AS ceil_bal,
           CAST(FLOOR(s_acctbal) AS BIGINT) AS floor_bal,
           ROUND(s_acctbal, 1) AS round_bal,
           SQRT(ABS(s_acctbal)) AS sqrt_bal,
           CAST(SIGN(s_acctbal - 5000) AS DOUBLE) AS sign_centered,
           CAST(s_suppkey % 7 AS BIGINT) AS mod7,
           ROUND(EXP(s_suppkey * 0.1), 6) AS exp_k,
           ROUND(LN(s_suppkey + 1.0), 6) AS ln_k,
           ROUND(LOG10(s_suppkey + 1.0), 6) AS log10_k,
           ROUND(LOG2(s_suppkey + 1.0), 6) AS log2_k,
           ROUND(POW(s_suppkey, 2.5), 6) AS pow_k,
           ROUND(SIN(s_suppkey * 0.5), 6) AS sin_k,
           ROUND(COS(s_suppkey * 0.5), 6) AS cos_k,
           ROUND(ATAN2(s_suppkey * 1.0, 3.0), 6) AS atan2_k,
           GREATEST(s_acctbal, 5000.0) AS hi,
           LEAST(s_acctbal, 5000.0) AS lo
    FROM supplier ORDER BY s_suppkey
    """,
)
def fn_math_bank(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier = load_table(spark, sf_dir, "supplier")
    k = F.col("s_suppkey")
    return supplier.select(
        "s_suppkey",
        F.abs(F.col("s_acctbal") - 5000).alias("abs_centered"),
        F.ceil("s_acctbal").alias("ceil_bal"),
        F.floor("s_acctbal").alias("floor_bal"),
        F.round("s_acctbal", 1).alias("round_bal"),
        F.sqrt(F.abs("s_acctbal")).alias("sqrt_bal"),
        F.signum(F.col("s_acctbal") - 5000).alias("sign_centered"),
        (k % 7).cast("long").alias("mod7"),
        F.round(F.exp(k * 0.1), 6).alias("exp_k"),
        F.round(F.log(k + 1.0), 6).alias("ln_k"),
        F.round(F.log10(k + 1.0), 6).alias("log10_k"),
        F.round(F.log2(k + 1.0), 6).alias("log2_k"),
        F.round(F.pow(k, 2.5), 6).alias("pow_k"),
        F.round(F.sin(k * 0.5), 6).alias("sin_k"),
        F.round(F.cos(k * 0.5), 6).alias("cos_k"),
        F.round(F.atan2(k * 1.0, F.lit(3.0)), 6).alias("atan2_k"),
        F.greatest("s_acctbal", F.lit(5000.0)).alias("hi"),
        F.least("s_acctbal", F.lit(5000.0)).alias("lo"),
    ).orderBy("s_suppkey")


@register(
    "fn_datetime_bank",
    oracle="""
    SELECT o_orderkey,
           CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS yr,
           CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER) AS mon,
           CAST(EXTRACT(DAY FROM o_orderdate) AS INTEGER) AS dom,
           CAST(EXTRACT(HOUR FROM o_orderdate) AS INTEGER) AS hr,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day_start,
           CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS odate,
           o_orderdate + INTERVAL 30 DAY AS plus30,
           o_orderdate - INTERVAL 1 HOUR AS minus1h,
           CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS INTEGER)
             AS days_since_epoch_start,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
           CAST(epoch(o_orderdate) AS BIGINT) AS unix_sec
    FROM orders WHERE o_orderkey < 200 ORDER BY o_orderkey
    """,
)
def fn_datetime_bank(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mon"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.hour("o_orderdate").alias("hr"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.date_trunc("day", "o_orderdate").alias("day_start"),
        F.col("o_orderdate").cast("date").cast("timestamp").alias("odate"),
        (F.col("o_orderdate") + F.expr("INTERVAL '30' DAY")).alias("plus30"),
        (F.col("o_orderdate") - F.expr("INTERVAL '1' HOUR")).alias("minus1h"),
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lit("1995-01-01").cast("date"),
        ).alias("days_since_epoch_start"),
        F.last_day(F.col("o_orderdate").cast("date")).cast("timestamp").alias("month_end"),
        F.unix_timestamp("o_orderdate").alias("unix_sec"),
    ).orderBy("o_orderkey")


@register(
    "fn_monthly_revenue",
    oracle="""
    SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(CAST(FLOOR((o_totalprice) * 1000000 + 0.5) AS BIGINT) AS DECIMAL(18,0))) AS DOUBLE) / 1000000 AS revenue
    FROM orders
    GROUP BY 1 ORDER BY order_month
    """,
)
def fn_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_trunc rollup — at scale this is the partition-pruning friendly
    shape (month aligns with typical time-partitioning)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.date_trunc("month", "o_orderdate").alias("order_month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(30,8)"))
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("order_month")
    )


@register(
    "fn_conditional_bank",
    oracle="""
    SELECT c_custkey,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
           CASE c_mktsegment WHEN 'MACHINERY' THEN 1 WHEN 'AUTOMOBILE' THEN 2 ELSE 0 END
             AS seg_code,
           CAST(c_acctbal > 0 AS INTEGER) AS is_positive,
           IF(c_acctbal > 5000, 'high', 'low') AS bal_band
    FROM customer ORDER BY c_custkey
    """,
)
def fn_conditional_bank(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    return customer.select(
        "c_custkey",
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")
        ).alias("seg_or_other"),
        F.when(F.col("c_mktsegment") == "MACHINERY", 1)
        .when(F.col("c_mktsegment") == "AUTOMOBILE", 2)
        .otherwise(0)
        .alias("seg_code"),
        (F.col("c_acctbal") > 0).cast("int").alias("is_positive"),
        F.when(F.col("c_acctbal") > 5000, "high").otherwise("low").alias("bal_band"),
    ).orderBy("c_custkey")


# ---------------------------------------------------------------------------
# UDF / UDTF surface (SURVEY.md §2B last row: DataFusion 14 supports UDF
# registration; the reference registers none — we expose the Spark path)
# ---------------------------------------------------------------------------


@register(
    "udf_registered_sql",
    oracle="""
    SELECT c_custkey,
           ROUND(c_acctbal * 1.1 + LEAST(c_acctbal, 0) * 0.4, 6) AS adjusted
    FROM customer ORDER BY c_custkey
    """,
)
def udf_registered_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched Pandas UDF registered into the SQL function registry
    and invoked from SQL text — the full user-function path.  The kernel
    is vectorized (one numpy expression per batch); row-at-a-time
    ``F.udf`` is deliberately NOT used (10-100× slower, SURVEY.md
    'UDFs are the slow path')."""
    from pyspark.sql import types as T
    from pyspark.sql import functions as SF

    @SF.pandas_udf(T.DoubleType())
    def credit_adjust(bal: pd.Series) -> pd.Series:
        # penalize negative balances: vectorized, no Python-per-row
        return (bal * 1.1 + bal.clip(upper=0) * 0.4).round(6)

    spark.udf.register("credit_adjust", credit_adjust)
    from datafusion_iceberg_spark.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        "SELECT c_custkey, credit_adjust(c_acctbal) AS adjusted"
        " FROM customer ORDER BY c_custkey"
    )


@register(
    "udtf_posexplode_tokens",
    oracle="""
    SELECT doc_id, tok_pos - 1 AS tok_pos, tok
    FROM (
        SELECT doc_id,
               unnest(string_split(text, ' ')) AS tok,
               generate_subscripts(string_split(text, ' '), 1) AS tok_pos
        FROM documents
    )
    WHERE doc_id < 50
    ORDER BY doc_id, tok_pos
    """,
)
def udtf_posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-generating function: one row per (doc, position, token) via
    posexplode — the lateral-view/UDTF row the reference reaches through
    DataFusion's unnest."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("doc_id") < 50)
        .select(
            "doc_id",
            F.posexplode(F.split("text", " ")).alias("tok_pos", "tok"),
        )
        .orderBy("doc_id", "tok_pos")
    )


@register(
    "fn_array_bank",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_toks,
           array_to_string(list_sort(string_split(text, ' ')[1:2]), '|') AS first2_sorted,
           CAST(list_contains(string_split(text, ' '), 'the') AS INTEGER) AS has_the,
           string_split(text, ' ')[-1] AS last_tok,
           array_to_string(list_reverse(string_split(text, ' '))[1:1], '|') AS rev_head
    FROM documents WHERE doc_id < 200 ORDER BY doc_id
    """,
)
def fn_array_bank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function bank (construct/slice/sort/contains/element_at/
    reverse) — the collection surface over tokenized text.  DuckDB list
    functions differ in name and 1-based indexing, hence the separate
    oracle text."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return (
        docs.filter(F.col("doc_id") < 200)
        .select(
            "doc_id",
            F.size(toks).alias("n_toks"),
            F.array_join(F.sort_array(F.slice(toks, 1, 2)), "|").alias(
                "first2_sorted"
            ),
            F.array_contains(toks, "the").cast("int").alias("has_the"),
            F.element_at(toks, -1).alias("last_tok"),
            F.array_join(F.slice(F.reverse(toks), 1, 1), "|").alias("rev_head"),
        )
        .orderBy("doc_id")
    )


@register(
    "udtf_python_bigrams",
    oracle="""
    SELECT doc_id, pos, bigram FROM (
      SELECT doc_id, p - 1 AS pos,
             tok || ' ' || LEAD(tok) OVER (
               PARTITION BY doc_id ORDER BY p) AS bigram
      FROM (
        SELECT doc_id,
               unnest(string_split(text, ' ')) AS tok,
               generate_subscripts(string_split(text, ' '), 1) AS p
        FROM documents WHERE doc_id < 30
      )
    ) WHERE bigram IS NOT NULL
    ORDER BY doc_id, pos
    """,
)
def udtf_python_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-defined TABLE function in Python (Spark 4 ``@udtf``), joined
    laterally: one input row fans out to N output rows computed by
    arbitrary Python — the extension point for tokenizers/chunkers the
    built-in generators can't express.  Scale note: a Python UDTF is
    row-at-a-time (the slow path) — this demo bounds the input and the
    package's hot-path equivalents stay with explode/posexplode
    (udtf_posexplode_tokens) or Arrow-batched mapInPandas
    (text_chunk_documents); reach for @udtf only when per-row Python
    state is genuinely required."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, bigram string")
    class _Bigrams:
        def eval(self, text: str):
            toks = text.split(" ")
            for i in range(len(toks) - 1):
                yield i, toks[i] + " " + toks[i + 1]

    spark.udtf.register("py_bigrams", _Bigrams)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents"
    )
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.bigram
        FROM documents d, LATERAL py_bigrams(d.text) t
        WHERE d.doc_id < 30
        ORDER BY d.doc_id, t.pos
        """
    )


@register(
    "fn_higher_order_bank",
    oracle="""
    SELECT doc_id,
           len(list_filter(string_split(text, ' '),
                           x -> length(x) > 4)) AS n_long,
           array_to_string(list_transform(string_split(text, ' ')[1:3],
                           x -> upper(x)), '|') AS upper3,
           CAST(list_sum(list_transform(string_split(text, ' '),
                           x -> length(x))) AS BIGINT) AS total_chars,
           CAST(len(list_filter(string_split(text, ' '),
                           x -> length(x) > 6)) > 0 AS INTEGER) AS any_gt6
    FROM documents WHERE doc_id < 200 ORDER BY doc_id
    """,
)
def fn_higher_order_bank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order lambda functions over arrays (filter / transform /
    aggregate / exists) — all Catalyst expressions inside whole-stage
    codegen, the JVM-side alternative to a Python UDF for per-element
    logic.  DuckDB spells them list_filter/list_transform/list_sum."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return (
        docs.filter(F.col("doc_id") < 200)
        .select(
            "doc_id",
            F.size(F.filter(toks, lambda t: F.length(t) > 4)).alias(
                "n_long"
            ),
            F.array_join(
                F.transform(F.slice(toks, 1, 3), lambda t: F.upper(t)), "|"
            ).alias("upper3"),
            F.aggregate(
                toks,
                F.lit(0).cast("long"),
                lambda acc, t: acc + F.length(t).cast("long"),
            ).alias("total_chars"),
            F.exists(toks, lambda t: F.length(t) > 6)
            .cast("int")
            .alias("any_gt6"),
        )
        .orderBy("doc_id")
    )


@register(
    "fn_try_arithmetic_bank",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 3 = 0 THEN NULL
                ELSE o_totalprice / (o_orderkey % 3) END AS safe_div,
           CAST(NULL AS BIGINT) AS overflow_add,
           CAST(o_orderkey + 1 AS BIGINT) AS ok_add,
           CASE WHEN o_orderstatus = 'F' THEN 1 ELSE NULL END AS parsed
    FROM orders WHERE o_orderkey < 300 ORDER BY o_orderkey
    """,
)
def fn_try_arithmetic_bank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-mode safety valves: Spark 4 runs with ANSI ON, so division
    by zero / long overflow / bad casts ERROR by default — the ``try_*``
    family returns NULL instead, per expression, without giving up
    strictness everywhere else.  try_divide(x, 0) → NULL,
    try_add(Long.MAX, 1) → NULL (the plain + would raise),
    try_to_number on a non-numeric string → NULL.  The oracle spells
    the same semantics with CASE/NULL literals."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderkey") < 300)
        .select(
            "o_orderkey",
            F.try_divide(
                F.col("o_totalprice"), F.col("o_orderkey") % 3
            ).alias("safe_div"),
            F.try_add(
                F.lit(9223372036854775807).cast("long"),
                (F.col("o_orderkey") * 0 + 1).cast("long"),
            ).alias("overflow_add"),
            F.try_add(F.col("o_orderkey"), F.lit(1)).cast("long").alias(
                "ok_add"
            ),
            F.try_to_number(
                F.when(F.col("o_orderstatus") == "F", F.lit("1")).otherwise(
                    F.lit("x")
                ),
                F.lit("9"),
            )
            .cast("int")
            .alias("parsed"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "fn_url_bank",
    oracle="""
    SELECT source AS site, COUNT(*) AS n_docs,
           COUNT(DISTINCT lang) AS n_langs
    FROM documents
    GROUP BY source ORDER BY site
    """,
)
def fn_url_bank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing (the crawl-curation entry point: host/path/query
    extraction feed domain filters, dedup keys, and per-site quotas).
    Documents get deterministic synthetic URLs; ``parse_url`` splits
    them JVM-side and the per-host rollup must reconstruct exactly the
    per-source stats the oracle computes from the raw columns — a
    parse–reassemble round trip, not a tautology."""
    docs = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&utm_source=feed"),
    )
    parsed = docs.select(
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("qlang"),
    )
    return (
        parsed.groupBy(
            F.regexp_replace("host", "\\.example\\.com$", "").alias("site")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("qlang").alias("n_langs"),
        )
        .orderBy("site")
    )


@register(
    "fn_sql_udf_bank",
    oracle="""
    WITH agg AS (
      SELECT l_returnflag,
             CASE WHEN l_quantity < 10 THEN 'low'
                  WHEN l_quantity < 30 THEN 'mid'
                  ELSE 'high' END AS band,
             COUNT(*) AS n,
             CAST(SUM(CAST(CAST(FLOOR(
               l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000
               + 0.5) AS BIGINT) AS DECIMAL(18,0))) AS DOUBLE) / 1000000
               AS net_sum
      FROM lineitem
      GROUP BY 1, 2
    )
    SELECT l_returnflag, band, n, net_sum, i
    FROM agg CROSS JOIN (SELECT 1 AS i UNION ALL SELECT 2 AS i)
    ORDER BY l_returnflag, band, i
    """,
)
def fn_sql_udf_bank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL UDFs (SQL-language functions, SPARK-46246 family):
    a SCALAR function (``CREATE TEMPORARY FUNCTION ... RETURNS <type>
    RETURN <expr>``) and a TABLE function (``RETURNS TABLE(...) RETURN
    SELECT ...``) consumed via lateral join.  Both are declarative
    bodies, so Catalyst INLINES them into the plan (whole-stage codegen,
    predicate pushdown through the call) — the opposite of an opaque
    Python UDF; the 100 TB cost is identical to writing the expression
    inline.  DataFusion ships `CREATE FUNCTION` at the SQL layer too,
    so this is the Spark spelling of that surface.

    The oracle inlines the same expressions (DuckDB macros would also
    work; inlining keeps the fixed-point money-sum convention of
    operators/relational.py::_fixed_point_sum visible)."""
    from datafusion_iceberg_spark.tables import register_views

    register_views(spark, sf_dir)
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION net_val("
        "p DOUBLE, d DOUBLE, t DOUBLE) RETURNS DOUBLE "
        "RETURN p * (1 - d) * (1 + t)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION qty_band(q DOUBLE) "
        "RETURNS STRING RETURN CASE WHEN q < 10 THEN 'low' "
        "WHEN q < 30 THEN 'mid' ELSE 'high' END"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION dup_rows(n INT) "
        "RETURNS TABLE(i INT) RETURN SELECT explode(sequence(1, n))"
    )
    return spark.sql(
        """
        WITH agg AS (
          SELECT l_returnflag, qty_band(l_quantity) AS band,
                 COUNT(*) AS n,
                 CAST(SUM(CAST(CAST(FLOOR(
                   net_val(l_extendedprice, l_discount, l_tax) * 1000000
                   + 0.5) AS BIGINT) AS DECIMAL(18,0))) AS DOUBLE) / 1000000
                   AS net_sum
          FROM lineitem
          GROUP BY 1, 2
        )
        SELECT l_returnflag, band, n, net_sum, i
        FROM agg, LATERAL dup_rows(2)
        ORDER BY l_returnflag, band, i
        """
    )


@register(
    "agg_collated_group",
    oracle="""
    WITH mixed AS (
      SELECT CASE WHEN c_custkey % 2 = 0 THEN UPPER(c_mktsegment)
                  ELSE LOWER(c_mktsegment) END AS seg,
             c_acctbal
      FROM customer
    )
    SELECT LOWER(seg) AS seg_norm, COUNT(*) AS n,
           CAST(SUM(CAST(CAST(FLOOR(c_acctbal * 1000000 + 0.5) AS BIGINT)
             AS DECIMAL(18,0))) AS DOUBLE) / 1000000 AS bal_sum
    FROM mixed
    GROUP BY LOWER(seg)
    ORDER BY seg_norm
    """,
)
def agg_collated_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 string COLLATIONS: grouping under ``UTF8_LCASE`` merges
    case-variant keys ENGINE-SIDE — no lower() rewrite of the data, and
    comparisons/joins on the collated column stay codegen'd.  The input
    deliberately case-splits c_mktsegment by key parity so a binary
    (UTF8_BINARY) grouping would return 2x the groups; the oracle
    normalizes with LOWER() (DuckDB has no collation-typed GROUP BY) and
    the output projects a lower-cased key because the collated group's
    REPRESENTATIVE value is engine-dependent (either case may win)."""
    from datafusion_iceberg_spark.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH mixed AS (
          SELECT CASE WHEN c_custkey % 2 = 0 THEN UPPER(c_mktsegment)
                      ELSE LOWER(c_mktsegment) END AS seg,
                 c_acctbal
          FROM customer
        )
        SELECT LOWER(k) AS seg_norm, n, bal_sum FROM (
          SELECT COLLATE(seg, 'UTF8_LCASE') AS k, COUNT(*) AS n,
                 CAST(SUM(CAST(CAST(FLOOR(c_acctbal * 1000000 + 0.5)
                   AS BIGINT) AS DECIMAL(18,0))) AS DOUBLE) / 1000000
                   AS bal_sum
          FROM mixed
          GROUP BY COLLATE(seg, 'UTF8_LCASE')
        )
        ORDER BY seg_norm
        """
    )
