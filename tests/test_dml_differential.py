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


@pytest.fixture(
    params=["copy-on-write", "merge-on-read", "deletion-vector"]
)
def engines(spark, tmp_path, request):
    """All three storage strategies end-to-end: merge-on-read runs
    DELETEs as position-delete files and UPDATEs/MERGEs as row-delta
    snapshots; deletion-vector stores every delete side as v3 roaring
    bitmaps in puffin (update/merge mode stays merge-on-read — DV is a
    delete-file flavor, not a commit shape), so every random program
    exercises the full MOR + DV write surface."""
    mode = request.param
    row_mode = "merge-on-read" if mode == "deletion-vector" else mode
    cat = Catalog(str(tmp_path / "wh"), name="fuzz")
    cat.sql(
        spark,
        f"CREATE TABLE fuzz.d.t {COLS} TBLPROPERTIES "
        f"('write.delete.mode' = '{mode}',"
        f" 'write.update.mode' = '{row_mode}',"
        f" 'write.merge.mode' = '{row_mode}')",
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


def _duck_merge_equiv(con, src_rows, matched_action):
    """DuckDB 1.0 has no MERGE; apply the semantically equivalent
    UPDATE/DELETE + INSERT derived from the CURRENT duck state (a valid
    differential: duck executes only plain DML)."""
    existing = {r[0] for r in con.execute("SELECT k FROM t").fetchall()}
    for k, grp, val in src_rows:
        if k in existing:
            if matched_action == "delete":
                con.execute(f"DELETE FROM t WHERE k = {k}")
            else:
                con.execute(
                    f"UPDATE t SET grp = '{grp}', val = {val} WHERE k = {k}"
                )
        else:
            con.execute(f"INSERT INTO t VALUES ({k}, '{grp}', {val})")


def _render_merge_source(rng, src_rows):
    """Four spellings of the same source rows: plain VALUES subquery,
    computed-projection subquery, a CTE inside the USING parens, and a
    WINDOW-FUNCTION projection (top-1 per group via ROW_NUMBER — the
    r6 parser-risk shape).  Returns (sql, effective_rows): computed
    shifts val by +1 and window keeps one row per group, so the
    effective rows differ from the literal ones."""
    vals = ", ".join(f"({k}, '{g}', {v})" for k, g, v in src_rows)
    form = rng.choice(["plain", "computed", "cte", "window", "nested_cte"])
    if form == "nested_cte":
        # r8 parser gate: a CTE nested INSIDE a CTE body, with string
        # literals and comments carrying MERGE keywords (' WHEN MATCHED
        # THEN DELETE ', ' ON ', 'WHERE') — the shape the old regex
        # layer could split mid-statement on; the token-stream parser
        # treats strings/comments as atomic
        return (
            f"(WITH outer_src AS ("
            f"  WITH inner_src AS (SELECT * FROM (VALUES {vals})"
            f"    AS v(k, grp, val))"
            f"  SELECT k, grp, val FROM inner_src"
            f"  WHERE grp <> ' WHEN MATCHED THEN DELETE ' -- ON t.k = s.k\n"
            f"    AND grp <> 'WHERE 1 = 1'"
            f") SELECT /* WHEN NOT MATCHED */ * FROM outer_src)",
            src_rows,
        )
    if form == "window":
        # deterministic top-1 per group (val DESC, k as tie-break)
        best = {}
        for k, g, v in src_rows:
            cur = best.get(g)
            if cur is None or (-v, k) < (-cur[2], cur[0]):
                best[g] = (k, g, v)
        return (
            f"(SELECT k, grp, val FROM ("
            f"SELECT v.*, ROW_NUMBER() OVER ("
            f"PARTITION BY grp ORDER BY val DESC, k) AS rn"
            f" FROM (VALUES {vals}) AS v(k, grp, val)) WHERE rn = 1)",
            sorted(best.values()),
        )
    if form == "plain":
        return (
            f"(SELECT * FROM (VALUES {vals}) AS v(k, grp, val))",
            src_rows,
        )
    if form == "computed":
        return (
            f"(SELECT k, grp, val + 1 AS val"
            f" FROM (VALUES {vals}) AS v(k, grp, val))",
            [(k, g, v + 1) for k, g, v in src_rows],
        )
    return (
        f"(WITH src AS (SELECT * FROM (VALUES {vals}) AS v(k, grp, val))"
        f" SELECT * FROM src WHERE val >= -1000)",
        src_rows,
    )


@pytest.mark.parametrize("seed", [11, 37, 73])
def test_random_merge_program_matches_duckdb(spark, engines, seed):
    """MERGE with subquery / computed-projection / CTE sources mixed
    into a random insert program, against both delete modes, with a
    full-state compare after every statement (VERDICT r5 task 7)."""
    cat, con = engines
    rng = random.Random(seed)
    next_k = 0
    for i in range(10):
        if rng.random() < 0.4 or next_k == 0:
            rows = ", ".join(
                f"({next_k + j}, '{rng.choice(GROUPS)}', {rng.randint(-50, 50)})"
                for j in range(rng.randint(1, 4))
            )
            next_k += 4
            cat.sql(spark, "INSERT INTO fuzz.d.t VALUES " + rows)
            con.execute("INSERT INTO t VALUES " + rows)
        else:
            # unique source keys: half aimed at existing range, half new
            ks = rng.sample(range(next_k + 6), rng.randint(2, 4))
            src_rows = [
                (k, rng.choice(GROUPS), rng.randint(-50, 50)) for k in ks
            ]
            next_k = max(next_k, max(ks) + 1)
            src_sql, effective = _render_merge_source(rng, src_rows)
            matched = rng.choice(["update", "delete"])
            if matched == "delete":
                clause = "WHEN MATCHED THEN DELETE"
            else:
                clause = "WHEN MATCHED THEN UPDATE SET grp = s.grp, val = s.val"
            cat.sql(
                spark,
                f"MERGE INTO fuzz.d.t t USING {src_sql} s ON t.k = s.k "
                f"{clause} WHEN NOT MATCHED THEN INSERT *",
            )
            _duck_merge_equiv(con, effective, matched)
        a, b = _state_spark(spark, cat), _state_duck(con)
        assert a == b, f"divergence after stmt {i}\n{a[:5]}\n{b[:5]}"


@pytest.fixture(params=["copy-on-write", "merge-on-read"])
def kw_engines(spark, tmp_path, request):
    """Table whose columns are backtick-quoted KEYWORDS — the
    identifier-shadowing shapes a regex SQL surface is most likely to
    mis-parse."""
    cat = Catalog(str(tmp_path / "whk"), name="fuzz")
    cat.sql(
        spark,
        "CREATE TABLE fuzz.d.t (`select` BIGINT, `where` STRING, "
        "`order` BIGINT) TBLPROPERTIES "
        f"('write.delete.mode' = '{request.param}')",
    )
    con = duckdb.connect()
    con.execute('CREATE TABLE t ("select" BIGINT, "where" STRING, "order" BIGINT)')
    yield cat, con
    con.close()


def test_quoted_keyword_identifiers_differential(spark, kw_engines):
    """INSERT/UPDATE/DELETE/MERGE against columns named select/where/
    order (backticks on Spark, double quotes on DuckDB) must stay
    state-identical — keyword shadowing inside predicates and SET
    clauses exercised end-to-end."""
    cat, con = kw_engines
    cat.sql(
        spark,
        "INSERT INTO fuzz.d.t VALUES (1, 'a', 10), (2, 'b', 20), (3, 'a', 30)",
    )
    con.execute("INSERT INTO t VALUES (1, 'a', 10), (2, 'b', 20), (3, 'a', 30)")
    cat.sql(
        spark,
        "UPDATE fuzz.d.t SET `order` = `order` + 5 WHERE `where` = 'a'",
    )
    con.execute('UPDATE t SET "order" = "order" + 5 WHERE "where" = \'a\'')
    cat.sql(spark, "DELETE FROM fuzz.d.t WHERE `select` = 2")
    con.execute('DELETE FROM t WHERE "select" = 2')
    cat.sql(
        spark,
        "MERGE INTO fuzz.d.t t USING (SELECT * FROM (VALUES (1, 'z', 99), "
        "(7, 'q', 70)) AS v(`select`, `where`, `order`)) s "
        "ON t.`select` = s.`select` "
        "WHEN MATCHED THEN UPDATE SET `where` = s.`where`, `order` = s.`order` "
        "WHEN NOT MATCHED THEN INSERT *",
    )
    con.execute("UPDATE t SET \"where\" = 'z', \"order\" = 99 WHERE \"select\" = 1")
    con.execute("INSERT INTO t VALUES (7, 'q', 70)")

    a = sorted(tuple(r) for r in cat.sql(spark, "SELECT * FROM fuzz.d.t").collect())
    b = sorted(tuple(r) for r in con.execute("SELECT * FROM t").fetchall())
    assert a == b


def test_mixed_ddl_dml_script_differential(spark, engines):
    """One multi-statement SCRIPT mixing DDL (ALTER ADD COLUMN) with DML
    before and after the schema change — the script splitter, schema
    evolution, and DML must compose; state compared to DuckDB executing
    the same program."""
    cat, con = engines
    cat.sql(
        spark,
        """
        INSERT INTO fuzz.d.t VALUES (1, 'a', 10), (2, 'b', 20);
        ALTER TABLE fuzz.d.t ADD COLUMN extra BIGINT;
        UPDATE fuzz.d.t SET extra = val * 2 WHERE k = 1;
        INSERT INTO fuzz.d.t VALUES (3, 'c', 30, 300);
        DELETE FROM fuzz.d.t WHERE k = 2;
        """,
    )
    con.execute("INSERT INTO t VALUES (1, 'a', 10), (2, 'b', 20)")
    con.execute("ALTER TABLE t ADD COLUMN extra BIGINT")
    con.execute("UPDATE t SET extra = val * 2 WHERE k = 1")
    con.execute("INSERT INTO t VALUES (3, 'c', 30, 300)")
    con.execute("DELETE FROM t WHERE k = 2")
    a = sorted(
        tuple(r) for r in cat.sql(spark, "SELECT * FROM fuzz.d.t").collect()
    )
    b = sorted(tuple(r) for r in con.execute("SELECT * FROM t").fetchall())
    assert a == b
    # every snapshot in the chain still scans after the mixed script
    t = cat.load("d.t")
    for s in t.metadata.snapshots:
        assert t.to_df(spark, snapshot_id=s.snapshot_id).count() >= 0


def _gen_subquery_statements(rng: random.Random, n: int) -> list[tuple[str, str]]:
    """INSERTs interleaved with DELETE/UPDATE whose WHERE clause embeds a
    NESTED SUBQUERY over the target table itself (IN / NOT IN / scalar
    aggregate comparison) — the r6 parser-risk shape.  DuckDB executes
    the identical SQL, so semantics (subquery sees the pre-statement
    snapshot) are compared, not just parse success."""
    out = []
    next_k = 0
    for _ in range(n):
        if rng.random() < 0.45 or next_k == 0:
            rows = ", ".join(
                f"({next_k + j}, '{rng.choice(GROUPS)}', {rng.randint(-50, 50)})"
                for j in range(rng.randint(1, 4))
            )
            next_k += 4
            s = "INSERT INTO {t} VALUES " + rows
        else:
            sub = rng.choice(
                [
                    "k IN (SELECT k FROM {t} WHERE val > " + str(rng.randint(-20, 20)) + ")",
                    "k NOT IN (SELECT k FROM {t} WHERE grp = '" + rng.choice(GROUPS) + "')",
                    "val < (SELECT AVG(val) FROM {t})",
                    "val >= (SELECT MAX(val) FROM {t} WHERE grp = '" + rng.choice(GROUPS) + "')",
                ]
            )
            roll = rng.random()
            if roll < 0.34:
                s = "DELETE FROM {t} WHERE " + sub
            elif roll < 0.67:
                s = (
                    f"UPDATE {{t}} SET val = val + {rng.randint(1, 5)} WHERE "
                    + sub
                )
            else:
                # r8 parser gate: scalar SUBQUERY in the SET expression
                # itself (commas and WHERE live inside the parens — the
                # old regex split SET lists on top-level text, this
                # must parse as one assignment)
                agg = rng.choice(["MAX", "MIN"])
                set_sub = (
                    f"(SELECT {agg}(val) FROM {{t}} WHERE grp = "
                    f"'{rng.choice(GROUPS)}')"
                )
                s = (
                    f"UPDATE {{t}} SET val = {set_sub} + "
                    f"{rng.randint(1, 3)} WHERE " + sub
                )
        out.append((s.format(t="fuzz.d.t"), s.format(t="t")))
    return out


@pytest.mark.parametrize("seed", [5, 23, 61])
def test_nested_subquery_dml_differential(spark, engines, seed):
    """DELETE/UPDATE with nested-subquery predicates over the target
    table, full-state compare after every statement, across all three
    delete modes (VERDICT r6 task 5)."""
    cat, con = engines
    rng = random.Random(seed)
    for i, (s_sql, d_sql) in enumerate(_gen_subquery_statements(rng, 12)):
        cat.sql(spark, s_sql)
        con.execute(d_sql)
        a, b = _state_spark(spark, cat), _state_duck(con)
        assert a == b, f"divergence after stmt {i}: {s_sql!r}\n{a[:5]}\n{b[:5]}"
    # the snapshot chain survives the whole program
    t = cat.load("d.t")
    for s in t.metadata.snapshots:
        assert t.to_df(spark, snapshot_id=s.snapshot_id).count() >= 0


def test_full_clause_merge_differential(spark, engines):
    """r8 full MERGE surface across all three storage modes: conditional
    WHEN MATCHED clauses (first-match-wins), INSERT (cols) VALUES with
    expressions, and NOT MATCHED BY SOURCE DELETE — state-compared to
    DuckDB executing the equivalent plain DML."""
    cat, con = engines
    cat.sql(
        spark,
        "INSERT INTO fuzz.d.t VALUES "
        "(1, 'a', 10), (2, 'b', -20), (3, 'c', 30), (4, 'a', 40)",
    )
    con.execute(
        "INSERT INTO t VALUES "
        "(1, 'a', 10), (2, 'b', -20), (3, 'c', 30), (4, 'a', 40)"
    )
    spark.sql(
        "SELECT * FROM VALUES (1, 'z', 100), (2, 'z', 200), (9, 'z', 900) "
        "AS s(k, grp, val)"
    ).createOrReplaceTempView("fcm_src")
    cat.sql(
        spark,
        "MERGE INTO fuzz.d.t t USING fcm_src s ON t.k = s.k "
        "WHEN MATCHED AND t.val < 0 THEN DELETE "
        "WHEN MATCHED THEN UPDATE SET val = t.val + s.val "
        "WHEN NOT MATCHED AND s.val > 500 THEN INSERT (k, grp, val) "
        "VALUES (s.k, upper(s.grp), s.val * 2) "
        "WHEN NOT MATCHED BY SOURCE AND t.grp = 'c' THEN DELETE",
    )
    # duck equivalent: matched k=1 val>=0 -> update; k=2 val<0 -> delete;
    # k=9 not matched, val 900>500 -> insert ('Z', 1800);
    # not-matched-by-source (k=3,4): grp 'c' (k=3) deleted
    con.execute("UPDATE t SET val = val + 100 WHERE k = 1")
    con.execute("DELETE FROM t WHERE k = 2")
    con.execute("INSERT INTO t VALUES (9, 'Z', 1800)")
    con.execute("DELETE FROM t WHERE k = 3")
    assert _state_spark(spark, cat) == _state_duck(con)
    # the snapshot chain survives and the next statement composes
    cat.sql(spark, "DELETE FROM fuzz.d.t WHERE k = 9")
    con.execute("DELETE FROM t WHERE k = 9")
    assert _state_spark(spark, cat) == _state_duck(con)


@pytest.mark.parametrize("seed", [101, 202, 303])
def test_random_upsert_program_matches_duckdb(spark, engines, seed):
    """r8: UPSERT (one-snapshot equality-delete + append) interleaved
    with plain INSERTs and DELETEs across all three storage strategies —
    DV/position deletes and equality deletes coexist in one history.
    DuckDB replays each upsert as DELETE-keys + INSERT (its exact
    relational meaning), and the full table state must match after
    every statement."""
    cat, con = engines
    rng = random.Random(seed)
    seed_rows = [(k, GROUPS[k % 3], k * 10) for k in range(8)]
    vals = ", ".join(f"({k}, '{g}', {v})" for k, g, v in seed_rows)
    cat.sql(spark, f"INSERT INTO fuzz.d.t VALUES {vals}")
    con.execute(f"INSERT INTO t VALUES {vals}")
    next_k = 100
    for _step in range(6):
        op = rng.choice(["upsert", "upsert", "insert", "delete"])
        if op == "upsert":
            existing = [r[0] for r in _state_duck(con)]
            keys = set()
            if existing:
                keys |= {rng.choice(existing) for _ in range(rng.randint(1, 3))}
            for _ in range(rng.randint(0, 2)):
                keys.add(next_k)
                next_k += 1
            rows = [
                (k, rng.choice(GROUPS), rng.randint(0, 500)) for k in sorted(keys)
            ]
            cat.upsert(
                "d.t",
                spark,
                spark.createDataFrame(rows, "k BIGINT, grp STRING, val BIGINT"),
                on=["k"],
            )
            in_list = ", ".join(str(k) for k, _, _ in rows)
            con.execute(f"DELETE FROM t WHERE k IN ({in_list})")
            con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
        elif op == "insert":
            rows = [
                (next_k + i, rng.choice(GROUPS), rng.randint(0, 500))
                for i in range(rng.randint(1, 3))
            ]
            next_k += len(rows)
            vals = ", ".join(f"({k}, '{g}', {v})" for k, g, v in rows)
            cat.sql(spark, f"INSERT INTO fuzz.d.t VALUES {vals}")
            con.execute(f"INSERT INTO t VALUES {vals}")
        else:
            g = rng.choice(GROUPS)
            lim = rng.randint(0, 400)
            pred = f"grp = '{g}' AND val < {lim}"
            cat.sql(spark, f"DELETE FROM fuzz.d.t WHERE {pred}")
            con.execute(f"DELETE FROM t WHERE {pred}")
        a, b = _state_spark(spark, cat), _state_duck(con)
        assert a == b, f"seed {seed} step {_step} ({op}): {a[:5]} != {b[:5]}"


# ---------------------------------------------------------------------------
# Schema-evolution interleaved with DML: the field-id-mapping risk class
# (reference bug #1, SURVEY §4.4) hit by random ADD/RENAME/DROP COLUMN
# between INSERT/UPDATE/DELETE, differentially vs DuckDB's native ALTERs.
# ---------------------------------------------------------------------------


def _gen_evolution_program(rng: random.Random, n: int):
    """Yields (spark_sql, duck_sql, cols_after) triples.  ``cols`` tracks
    the live schema as [(name, type), ...]; k is never renamed/dropped
    (the compare key).  ADD COLUMN alternates defaulted / NULL; INSERTs
    randomly omit a droppable suffix column to exercise write-defaults."""
    cols = [("k", "BIGINT"), ("grp", "VARCHAR"), ("val", "BIGINT")]
    next_k = 1000
    next_c = 0
    out = []
    for _ in range(n):
        kind = rng.choice(
            ["insert", "insert", "insert", "update", "delete",
             "add", "add", "rename", "drop", "widen"]
        )
        droppable = [c for c, _ in cols[1:]]
        if kind == "add":
            next_c += 1
            name = f"c{next_c}"
            typ = rng.choice(["BIGINT", "VARCHAR", "DOUBLE", "INT"])
            spark_typ = "STRING" if typ == "VARCHAR" else typ
            duck_typ = "INTEGER" if typ == "INT" else typ
            if rng.random() < 0.5:
                dflt = (
                    f"'{rng.choice(GROUPS)}'" if typ == "VARCHAR"
                    else f"{rng.randint(-9, 9)}.5" if typ == "DOUBLE"
                    else str(rng.randint(-9, 9))
                )
                s = f"ADD COLUMN {name} {{typ}} DEFAULT {dflt}"
            else:
                s = f"ADD COLUMN {name} {{typ}}"
            cols = cols + [(name, typ)]
            out.append((
                f"ALTER TABLE fuzz.d.t {s.format(typ=spark_typ)}",
                f"ALTER TABLE t {s.format(typ=duck_typ)}",
                list(cols),
            ))
        elif kind == "rename" and droppable:
            old = rng.choice(droppable)
            next_c += 1
            new = f"r{next_c}"
            cols = [(new if c == old else c, t) for c, t in cols]
            out.append((
                f"ALTER TABLE fuzz.d.t RENAME COLUMN {old} TO {new}",
                f"ALTER TABLE t RENAME COLUMN {old} TO {new}",
                list(cols),
            ))
        elif kind == "drop" and len(droppable) > 1:
            victim = rng.choice(droppable)
            cols = [(c, t) for c, t in cols if c != victim]
            out.append((
                f"ALTER TABLE fuzz.d.t DROP COLUMN {victim}",
                f"ALTER TABLE t DROP COLUMN {victim}",
                list(cols),
            ))
        elif kind == "widen":
            narrow = [c for c, t in cols if t == "INT"]
            if not narrow:
                continue
            victim = rng.choice(narrow)
            cols = [
                (c, "BIGINT" if c == victim else t) for c, t in cols
            ]
            out.append((
                f"ALTER TABLE fuzz.d.t ALTER COLUMN {victim} TYPE BIGINT",
                f"ALTER TABLE t ALTER COLUMN {victim} SET DATA TYPE BIGINT",
                list(cols),
            ))
        elif kind == "update":
            name, typ = rng.choice(cols[1:])
            expr = (
                f"'{rng.choice(GROUPS)}'" if typ == "VARCHAR"
                else f"{rng.randint(1, 5)}.25" if typ == "DOUBLE"
                else str(rng.randint(-99, 99))
            )  # INT and BIGINT share the small-int literal range
            pred = f"k % {rng.randint(2, 4)} = {rng.randint(0, 1)}"
            s = f"UPDATE {{t}} SET {name} = {expr} WHERE {pred}"
            out.append((s.format(t="fuzz.d.t"), s.format(t="t"), list(cols)))
        elif kind == "delete":
            pred = f"k % {rng.randint(3, 6)} = {rng.randint(0, 2)}"
            s = f"DELETE FROM {{t}} WHERE {pred}"
            out.append((s.format(t="fuzz.d.t"), s.format(t="t"), list(cols)))
        else:
            use = list(cols)
            if len(use) > 2 and rng.random() < 0.4:
                use = use[:-1]  # omit the newest column → write-default
            names = ", ".join(c for c, _ in use)
            vals = []
            for i in range(rng.randint(1, 3)):
                row = []
                for c, t in use:
                    if c == "k":
                        row.append(str(next_k))
                        next_k += 1
                    elif t == "VARCHAR":
                        row.append(f"'{rng.choice(GROUPS)}'")
                    elif t == "DOUBLE":
                        row.append(f"{rng.randint(-9, 9)}.75")
                    else:
                        row.append(str(rng.randint(-99, 99)))
                vals.append("(" + ", ".join(row) + ")")
            s = f"INSERT INTO {{t}} ({names}) VALUES " + ", ".join(vals)
            out.append((s.format(t="fuzz.d.t"), s.format(t="t"), list(cols)))
    return out


@pytest.mark.parametrize("seed", [13, 44, 88])
def test_random_schema_evolution_program_matches_duckdb(
    spark, engines, seed
):
    cat, con = engines
    con.execute("INSERT INTO t VALUES (1, 'a', 10), (2, 'b', 20), (3, 'c', 30)")
    cat.sql(spark, "INSERT INTO fuzz.d.t VALUES (1, 'a', 10), (2, 'b', 20), (3, 'c', 30)")
    rng = random.Random(seed)
    for i, (s_sql, d_sql, cols) in enumerate(
        _gen_evolution_program(rng, 14)
    ):
        cat.sql(spark, s_sql)
        for stmt in d_sql.split(";"):
            con.execute(stmt)
        names = ", ".join(c for c, _ in cols)
        got = sorted(
            tuple(r)
            for r in cat.sql(
                spark, f"SELECT {names} FROM fuzz.d.t"
            ).collect()
        )
        want = sorted(
            tuple(r)
            for r in con.execute(f"SELECT {names} FROM t").fetchall()
        )
        assert got == want, (
            f"seed {seed} diverged after stmt {i}: {s_sql}\n"
            f"spark={got}\nduck={want}"
        )
