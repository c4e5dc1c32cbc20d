"""Differential fuzzing of the SQL-surface SPJ router: seeded random
statements execute twice through ``Catalog.sql`` — once with routing
enabled, once with ``enable_spj_sql=False`` — and must agree row-exactly
(both engines are Spark, so ANY deterministic expression is safe to
compare bitwise).  When the plain path rejects a statement the routed
path must reject it too (the router is absent, never wider).  The
generator wanders into select-list / predicate / grouping / DISTINCT /
ORDER-LIMIT combinations no hand-written test covers — the adversarial
check behind the module's "never wrong, only absent" contract.
"""

from __future__ import annotations

import random
import shutil

import pytest

from pyspark.sql import functions as F

from datafusion_iceberg_spark.iceberg.catalog import Catalog
from datafusion_iceberg_spark.plans.audit import plan_string


@pytest.fixture(scope="module")
def fwh(tmp_path_factory, spark, sf_dir):
    """orders bucket(8) ⋈ lineitem bucket(16) (SPJ-compatible) plus a
    same-schema lineitem copy for same-name-key / ambiguity shapes."""
    root = str(tmp_path_factory.mktemp("spj_sql_fuzz_wh"))
    cat = Catalog(root, name="fz")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice", "l_quantity"
    )
    li_b = li.select(
        F.col("l_orderkey"), F.col("l_extendedprice").alias("l_price_b")
    )
    cat.create_table(
        "f.orders8", orders.schema, partition_by=["bucket(8, o_orderkey)"]
    )
    cat.append("f.orders8", spark, orders)
    cat.create_table(
        "f.li16", li.schema, partition_by=["bucket(16, l_orderkey)"]
    )
    cat.append("f.li16", spark, li.limit(3000))
    cat.append("f.li16", spark, li.subtract(li.limit(3000)))
    cat.create_table(
        "f.li16b", li_b.schema, partition_by=["bucket(16, l_orderkey)"]
    )
    cat.append("f.li16b", spark, li_b)
    yield cat
    shutil.rmtree(root, ignore_errors=True)


_L_ITEMS = [
    "l.l_orderkey",
    "l.l_quantity",
    "l_extendedprice",
    "CAST(l.l_quantity AS BIGINT) AS qi",
]
_O_ITEMS = ["o.o_orderstatus", "o.o_orderkey", "o_totalprice"]
_AGGS = [
    "COUNT(*) AS n",
    "CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents",
    "MIN(l.l_quantity) AS q_min",
    "MAX(l.l_orderkey) AS k_max",
    "COUNT(DISTINCT l.l_quantity) AS nd_q",
]
_WHERES = [
    "l.l_quantity > {q}",
    "l.l_orderkey % {m} = {r}",
    "l.l_extendedprice < {x}",
]
_O_WHERES = ["o.o_orderstatus <> 'P'", "o.o_totalprice > {x}"]


def _fmt(t, rng):
    return t.format(
        q=rng.choice([10, 25, 40]),
        m=rng.choice([3, 5, 7]),
        r=rng.randrange(0, 3),
        x=rng.choice([1000, 20000, 100000]),
    )


def _li_pin(rng: random.Random, fwh) -> str:
    """Sometimes pin the lineitem side to a historical snapshot — the
    routed plan must read AT the pin, byte-identical to plain time
    travel (including the fuzzer's two-snapshot history)."""
    if rng.random() < 0.25:
        snaps = fwh.load("f.li16").metadata.snapshots
        sid = rng.choice(snaps).snapshot_id
        return f" FOR VERSION AS OF {sid}"
    return ""


def _gen_single(rng: random.Random, pin: str = "") -> str:
    distinct = rng.random() < 0.35
    group = (not distinct) and rng.random() < 0.6
    if distinct:
        pool = ["l.l_orderkey", "l.l_quantity", "l_extendedprice"]
        items = rng.sample(pool, rng.randrange(1, len(pool) + 1))
        sel = ", ".join(items)
    elif group:
        gkeys = rng.sample(["l.l_orderkey", "l.l_quantity"], rng.randrange(1, 3))
        aggs = rng.sample(_AGGS, rng.randrange(1, 3))
        sel = ", ".join(gkeys + aggs)
    else:
        items = rng.sample(_L_ITEMS, rng.randrange(1, 4))
        sel = ", ".join(items)
    q = f"SELECT {'DISTINCT ' if distinct else ''}{sel} FROM fz.f.li16{pin} AS l"
    wh = [_fmt(t, rng) for t in rng.sample(_WHERES, rng.randrange(0, 3))]
    if wh:
        q += " WHERE " + " AND ".join(wh)
    if group:
        q += " GROUP BY " + ", ".join(gkeys)
        if rng.random() < 0.4:
            q += " HAVING COUNT(*) >= " + str(rng.randrange(1, 4))
    if rng.random() < 0.5:
        # deterministic LIMIT needs a total order: sort by position over
        # every output column
        ncols = len(sel.split(","))
        q += " ORDER BY " + ", ".join(str(i + 1) for i in range(ncols))
        if rng.random() < 0.6:
            q += f" LIMIT {rng.choice([7, 50, 400])}"
    return q


def _gen_join(rng: random.Random, pin: str = "") -> str:
    distinct = rng.random() < 0.3
    group = (not distinct) and rng.random() < 0.6
    if distinct:
        pool = ["l.l_orderkey", "o.o_orderkey", "o.o_orderstatus", "l.l_quantity"]
        sel = ", ".join(rng.sample(pool, rng.randrange(1, 4)))
    elif group:
        gkeys = rng.sample(
            ["l.l_orderkey", "o.o_orderkey", "o.o_orderstatus", "l.l_quantity"],
            rng.randrange(1, 3),
        )
        aggs = rng.sample(_AGGS, rng.randrange(1, 3))
        sel = ", ".join(gkeys + aggs)
    else:
        sel = ", ".join(
            rng.sample(_L_ITEMS[:3] + _O_ITEMS, rng.randrange(1, 4))
        )
    q = (
        f"SELECT {'DISTINCT ' if distinct else ''}{sel} "
        f"FROM fz.f.orders8 AS o JOIN fz.f.li16{pin} AS l "
        "ON o.o_orderkey = l.l_orderkey"
    )
    wh = [
        _fmt(t, rng)
        for t in rng.sample(_WHERES + _O_WHERES, rng.randrange(0, 3))
    ]
    if wh:
        q += " WHERE " + " AND ".join(wh)
    if group:
        q += " GROUP BY " + ", ".join(gkeys)
        if rng.random() < 0.4:
            q += " HAVING COUNT(*) >= " + str(rng.randrange(1, 4))
    if rng.random() < 0.5:
        ncols = len(sel.split(","))
        q += " ORDER BY " + ", ".join(str(i + 1) for i in range(ncols))
        if rng.random() < 0.6:
            q += f" LIMIT {rng.choice([7, 50, 400])}"
    return q


def _run_both(cat, spark, q):
    """(rows_or_None, error_or_None) for routed and plain executions."""

    def run(enabled):
        cat.enable_spj_sql = enabled
        try:
            return sorted(map(tuple, cat.sql(spark, q).collect())), None
        except Exception as e:  # noqa: BLE001 — error parity check
            return None, e
        finally:
            cat.enable_spj_sql = True

    return run(True), run(False)


@pytest.mark.parametrize("seed", [7, 19, 83])
def test_routed_and_plain_agree(spark, fwh, seed):
    rng = random.Random(seed)
    routed_count = 0
    for i in range(24):
        pin = _li_pin(rng, fwh)
        q = (
            _gen_join(rng, pin)
            if rng.random() < 0.5
            else _gen_single(rng, pin)
        )
        (r_rows, r_err), (p_rows, p_err) = _run_both(fwh, spark, q)
        if p_err is not None:
            assert r_err is not None, (
                f"seed={seed} q{i}: plain rejected but routed ran: {q}"
            )
            continue
        assert r_err is None, (
            f"seed={seed} q{i}: routed errored where plain ran: {q}\n{r_err}"
        )
        assert r_rows == p_rows, f"seed={seed} q{i}: row mismatch: {q}"
        fwh.enable_spj_sql = True
        if "Union" in plan_string(fwh.sql(spark, q)):
            routed_count += 1
    # the fuzzer must actually exercise the router, not only fallbacks
    assert routed_count >= 5


def test_ambiguous_and_unknown_refs_error_in_both(spark, fwh):
    """Same-name-key join: bare key refs are ambiguous in plain SQL;
    unknown columns are unresolved — routed surface must agree."""
    cases = [
        # bare deduped key name
        "SELECT l_orderkey FROM fz.f.li16 AS a JOIN fz.f.li16b AS b "
        "ON a.l_orderkey = b.l_orderkey",
        # unknown column through an alias
        "SELECT l.nope FROM fz.f.li16 AS l GROUP BY l.nope",
        # wrong-side qualified reference
        "SELECT b.l_quantity FROM fz.f.li16 AS a JOIN fz.f.li16b AS b "
        "ON a.l_orderkey = b.l_orderkey LIMIT 3",
    ]
    for q in cases:
        (r_rows, r_err), (p_rows, p_err) = _run_both(fwh, spark, q)
        assert p_err is not None, f"expected plain to reject: {q}"
        assert r_err is not None, f"routed ran where plain rejects: {q}"
