"""Differential SELECT fuzzing: seeded random aggregate queries — one
ANSI text, two engines — run against the same parquet through Spark AND
DuckDB and must agree exactly.  The generator wanders into predicate /
grouping / HAVING combinations no hand-written gate covers; every value
is integer-exact or fixed-point so agreement is bitwise, not tolerant.
(The write-side counterpart is test_dml_differential.)"""

from __future__ import annotations

import random

import pytest

from datafusion_iceberg_spark.tables import sql_query
from tests.oracle_compare import compare

_GROUPS = [
    "o_orderstatus",
    "o_orderpriority",
    "CAST(o_custkey % 10 AS BIGINT)",
]
_FILTERS = [
    "o_orderkey % {m} = {r}",
    "o_totalprice < {x}",
    "o_orderstatus <> 'P'",
    "o_custkey % {m} <> {r}",
]
_AGGS = [
    "COUNT(*) AS n",
    "CAST(SUM(o_orderkey) AS BIGINT) AS key_sum",
    "COUNT(DISTINCT o_custkey) AS nd_cust",
    "CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)"
    " AS cents_sum",
    "MIN(o_orderkey) AS k_min",
    "MAX(o_orderkey) AS k_max",
]


def _gen(rng: random.Random) -> str:
    n_group = rng.randrange(0, 3)
    groups = rng.sample(_GROUPS, n_group)
    aggs = rng.sample(_AGGS, rng.randrange(1, 4))
    sel = [f"{g} AS g{i}" for i, g in enumerate(groups)] + aggs
    where = []
    for f in rng.sample(_FILTERS, rng.randrange(0, 3)):
        where.append(
            f.format(
                m=rng.choice([3, 5, 7, 11]),
                r=rng.randrange(0, 3),
                x=rng.choice([50_000, 150_000, 300_000]),
            )
        )
    sql = f"SELECT {', '.join(sel)} FROM orders"
    if where:
        sql += " WHERE " + " AND ".join(where)
    if groups:
        sql += " GROUP BY " + ", ".join(groups)
        if rng.random() < 0.4:
            sql += " HAVING COUNT(*) > " + str(rng.randrange(0, 4))
        sql += " ORDER BY " + ", ".join(
            f"g{i}" for i in range(len(groups))
        )
    return sql


@pytest.mark.parametrize("seed", [11, 42, 271])
def test_random_aggregates_agree(spark, duck, sf_dir, seed):
    rng = random.Random(seed)
    for i in range(12):
        sql = _gen(rng)
        sdf = sql_query(spark, sf_dir, sql)
        try:
            rel = duck.sql(sql)
        except Exception as e:  # generator bug, not an engine diff
            raise AssertionError(f"oracle rejected {sql!r}: {e}") from e
        compare(sdf, rel, f"seed={seed} q{i}: {sql}")


_JOIN_AGGS = [
    "COUNT(*) AS n",
    "CAST(SUM(o.o_orderkey) AS BIGINT) AS key_sum",
    "COUNT(DISTINCT c.c_nationkey) AS nd_nat",
    "MIN(c.c_custkey) AS c_min",
]


def _gen_join(rng: random.Random) -> str:
    groups = rng.sample(
        ["c.c_mktsegment", "o.o_orderstatus", "CAST(c.c_nationkey AS BIGINT)"],
        rng.randrange(1, 3),
    )
    aggs = rng.sample(_JOIN_AGGS, rng.randrange(1, 4))
    sel = [f"{g} AS g{i}" for i, g in enumerate(groups)] + aggs
    how = rng.choice(["JOIN", "LEFT JOIN"])
    sql = (
        f"SELECT {', '.join(sel)} FROM customer c {how} orders o "
        "ON o.o_custkey = c.c_custkey"
    )
    where = []
    if rng.random() < 0.6:
        where.append(f"c.c_custkey % {rng.choice([2, 5, 9])} = 0")
    if rng.random() < 0.4 and how == "JOIN":
        where.append(f"o.o_totalprice > {rng.choice([20_000, 200_000])}")
    if where:
        sql += " WHERE " + " AND ".join(where)
    sql += " GROUP BY " + ", ".join(groups)
    sql += " ORDER BY " + ", ".join(f"g{i}" for i in range(len(groups)))
    return sql


@pytest.mark.parametrize("seed", [5, 99])
def test_random_joins_agree(spark, duck, sf_dir, seed):
    rng = random.Random(seed)
    for i in range(10):
        sql = _gen_join(rng)
        sdf = sql_query(spark, sf_dir, sql)
        rel = duck.sql(sql)
        compare(sdf, rel, f"seed={seed} j{i}: {sql}")
