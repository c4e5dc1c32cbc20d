"""Differential DML testing: a seeded random program of INSERT / DELETE
/ UPDATE / MERGE statements executes against BOTH the Iceberg catalog
(via the SQL surface) and DuckDB (native DML on an equivalent table);
after every statement the full table contents must match exactly.

This catches whole classes the per-statement unit tests can't: statement
interaction (delete after update after merge), predicate edge cases the
generator wanders into, and snapshot-chain corruption that only shows a
few statements later."""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from datafusion_iceberg_spark.iceberg.catalog import Catalog

COLS = "(k BIGINT, grp STRING, val BIGINT)"
GROUPS = ("a", "b", "c")


@pytest.fixture(params=["copy-on-write", "merge-on-read"])
def engines(spark, tmp_path, request):
    cat = Catalog(str(tmp_path / "wh"), name="fuzz")
    cat.sql(
        spark,
        f"CREATE TABLE fuzz.d.t {COLS} TBLPROPERTIES "
        f"('write.delete.mode' = '{request.param}')",
    )
    con = duckdb.connect()
    con.execute(f"CREATE TABLE t {COLS}")
    yield cat, con
    con.close()


def _state_spark(spark, cat):
    return sorted(
        (r.k, r.grp, r.val)
        for r in cat.sql(spark, "SELECT * FROM fuzz.d.t").collect()
    )


def _state_duck(con):
    return sorted(tuple(r) for r in con.execute("SELECT * FROM t").fetchall())


def _gen_statements(rng: random.Random, n: int) -> list[tuple[str, str]]:
    """(spark_sql, duck_sql) pairs — semantically identical programs
    (DuckDB has no INSERT OVERWRITE/TRUNCATE spelling; those render as
    the equivalent DELETE[+INSERT])."""
    out = []
    next_k = 0
    for _ in range(n):
        kind = rng.choice(
            [
                "insert", "insert", "insert",
                "delete", "update", "update",
                "overwrite", "truncate",
            ]
        )
        if kind == "overwrite":
            rows = ", ".join(
                f"({next_k + i}, '{rng.choice(GROUPS)}', {rng.randint(-50, 50)})"
                for i in range(rng.randint(1, 3))
            )
            next_k += 3
            out.append(
                (
                    "INSERT OVERWRITE fuzz.d.t VALUES " + rows,
                    f"DELETE FROM t; INSERT INTO t VALUES {rows}",
                )
            )
            continue
        if kind == "truncate":
            out.append(("TRUNCATE TABLE fuzz.d.t", "DELETE FROM t"))
            continue
        if kind == "insert":
            rows = ", ".join(
                f"({next_k + i}, '{rng.choice(GROUPS)}', {rng.randint(-50, 50)})"
                for i in range(rng.randint(1, 5))
            )
            next_k += 5
            s = "INSERT INTO {t} VALUES " + rows
        elif kind == "delete":
            pred = rng.choice(
                [
                    f"k % {rng.randint(2, 5)} = 0",
                    f"grp = '{rng.choice(GROUPS)}' AND val > {rng.randint(-20, 20)}",
                    f"val BETWEEN {rng.randint(-50, 0)} AND {rng.randint(0, 50)}",
                    f"k IN ({rng.randint(0, 30)}, {rng.randint(0, 30)})",
                ]
            )
            s = "DELETE FROM {t} WHERE " + pred
        else:
            col, expr = rng.choice(
                [
                    ("val", f"val + {rng.randint(1, 9)}"),
                    ("val", "-val"),
                    ("grp", f"'{rng.choice(GROUPS)}'"),
                    ("val", "val * 2"),
                ]
            )
            pred = rng.choice(
                [
                    f"grp = '{rng.choice(GROUPS)}'",
                    f"k > {rng.randint(0, 25)}",
                    f"val < {rng.randint(-10, 10)}",
                ]
            )
            s = f"UPDATE {{t}} SET {col} = {expr} WHERE " + pred
        out.append((s.format(t="fuzz.d.t"), s.format(t="t")))
    return out


@pytest.mark.parametrize("seed", [7, 21, 99])
def test_random_dml_program_matches_duckdb(spark, engines, seed):
    cat, con = engines
    rng = random.Random(seed)
    for i, (s_sql, d_sql) in enumerate(_gen_statements(rng, 14)):
        cat.sql(spark, s_sql)
        con.execute(d_sql)
        a, b = _state_spark(spark, cat), _state_duck(con)
        assert a == b, f"divergence after stmt {i}: {s_sql!r}\n{a[:5]}\n{b[:5]}"
    # history invariants after the whole program: every snapshot in the
    # chain still scans (no manifest corruption that only a later
    # statement exposes), and time travel to each is self-consistent
    t = cat.load("d.t")
    for s in t.metadata.snapshots:
        n = t.to_df(spark, snapshot_id=s.snapshot_id).count()
        assert n >= 0
    # the changelog's net row effect equals the final row count
    log = t.changelog_df(spark)
    ins = log.filter(F.col("_change_type") == "insert").count()
    dels = log.filter(F.col("_change_type") == "delete").count()
    assert ins - dels == len(_state_spark(spark, cat))


def test_merge_differential(spark, engines):
    """MERGE vs DuckDB's equivalent INSERT ... ON CONFLICT-ish rewrite
    (update matched, insert new)."""
    cat, con = engines
    cat.sql(
        spark,
        "INSERT INTO fuzz.d.t VALUES (1, 'a', 10), (2, 'b', 20), (3, 'c', 30)",
    )
    con.execute("INSERT INTO t VALUES (1, 'a', 10), (2, 'b', 20), (3, 'c', 30)")
    spark.sql(
        "SELECT * FROM VALUES (2, 'z', 99), (9, 'z', 90) AS s(k, grp, val)"
    ).createOrReplaceTempView("fuzz_merge_src")
    cat.sql(
        spark,
        "MERGE INTO fuzz.d.t t USING fuzz_merge_src s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET grp = s.grp, val = s.val "
        "WHEN NOT MATCHED THEN INSERT *",
    )
    con.execute("UPDATE t SET grp = 'z', val = 99 WHERE k = 2")
    con.execute("INSERT INTO t VALUES (9, 'z', 90)")
    assert _state_spark(spark, cat) == _state_duck(con)
