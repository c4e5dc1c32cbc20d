"""SQL-surface SPJ routing (iceberg/spj_sql.py): the SAME SQL text that
plans a shuffling join/aggregation runs shuffle-free when the storage
contract allows, byte-identical to the plain plan, with silent fallback
on every refusal.  Reference anchor: the catalog surface IS the query
surface (catalog.rs:114-117); Spark-Iceberg users get this from
KeyGroupedPartitioning (SPARK-37375) without changing query text.
"""

from __future__ import annotations

import re
import shutil

import pytest

from pyspark.sql import functions as F

from datafusion_iceberg_spark.iceberg.catalog import Catalog
from datafusion_iceberg_spark.plans.audit import plan_string


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _plain(cat, spark, q):
    cat.enable_spj_sql = False
    try:
        return cat.sql(spark, q)
    finally:
        cat.enable_spj_sql = True


def _key_exchanges(df, *keys):
    plan = plan_string(df)
    hits = []
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        if any(k in m.group(1) for k in keys):
            hits.append(m.group(1))
    return hits


@pytest.fixture(scope="module")
def wh(tmp_path_factory, spark, sf_dir):
    """orders bucket(8) ⋈ lineitem bucket(16) (compatible), lineitem
    bucket(12) (incompatible), an unpartitioned nation, and a VIEW —
    the full routing/fallback matrix."""
    root = str(tmp_path_factory.mktemp("spj_sql_wh"))
    cat = Catalog(root, name="spjcat")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice", "l_quantity"
    )
    cat.create_table(
        "f.orders8", orders.schema, partition_by=["bucket(8, o_orderkey)"]
    )
    cat.append("f.orders8", spark, orders)
    cat.create_table(
        "f.li16", li.schema, partition_by=["bucket(16, l_orderkey)"]
    )
    cat.append("f.li16", spark, li)
    cat.create_table(
        "f.li12", li.schema, partition_by=["bucket(12, l_orderkey)"]
    )
    cat.append("f.li12", spark, li)
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    cat.create_table("f.nation", nation.schema)
    cat.append("f.nation", spark, nation)
    cat.create_view(
        "f.ordview", "SELECT o_orderkey, o_totalprice FROM f_orders8"
    )
    yield cat
    shutil.rmtree(root, ignore_errors=True)


JOIN_Q = (
    "SELECT o.o_orderstatus, COUNT(*) AS n, "
    "SUM(CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT)) AS cents "
    "FROM spjcat.f.orders8 AS o JOIN spjcat.f.li16 AS l "
    "ON o.o_orderkey = l.l_orderkey "
    "WHERE l.l_quantity > 10 "
    "GROUP BY o.o_orderstatus ORDER BY o.o_orderstatus"
)


def test_join_routes_zero_exchange_and_byte_identical(spark, wh, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SPJ_COLLAPSE", "0")
    routed = wh.sql(spark, JOIN_Q)
    plan = plan_string(routed)
    assert "Union" in plan
    assert plan.count("BroadcastHashJoin") >= 2
    assert not _key_exchanges(routed, "o_orderkey", "l_orderkey")
    # WHERE pushes into the branch parquet scans through the Union
    assert "PushedFilters" in plan
    got = _rows(routed)
    want = _rows(_plain(wh, spark, JOIN_Q))
    assert got == want and len(got) > 0


def test_join_routes_collapsed_by_default(spark, wh):
    """r16 whole-side broadcast collapse: the routed join defaults to a
    single BroadcastHashJoin (no Union) when a side fits the ceiling —
    rows byte-identical to plain Spark, zero Exchange on the keys."""
    routed = wh.sql(spark, JOIN_Q)
    plan = plan_string(routed)
    assert plan.count("BroadcastHashJoin") == 1
    assert "Union" not in plan
    assert not _key_exchanges(routed, "o_orderkey", "l_orderkey")
    assert "PushedFilters" in plan
    got = _rows(routed)
    want = _rows(_plain(wh, spark, JOIN_Q))
    assert got == want and len(got) > 0


def _ensure_li16b(wh, spark, sf_dir):
    """Create the same-key-name lineitem copy on demand — called by
    every test that references it, so each runs in isolation."""
    li2 = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_orderkey"), F.col("l_discount")
    )
    if "f.li16b" not in wh._relation_keys():
        wh.create_table(
            "f.li16b", li2.schema, partition_by=["bucket(16, l_orderkey)"]
        )
        wh.append("f.li16b", spark, li2)


def test_join_same_name_keys_and_qualified_select(spark, wh, sf_dir):
    """Same-name key columns dedup in the view; references through
    EITHER alias resolve to it (b-alias rewritten to a-alias)."""
    _ensure_li16b(wh, spark, sf_dir)
    q = (
        "SELECT a.l_orderkey, b.l_orderkey AS k2, a.l_extendedprice, "
        "b.l_discount "
        "FROM spjcat.f.li16 AS a JOIN spjcat.f.li16b AS b "
        "ON a.l_orderkey = b.l_orderkey LIMIT 20"
    )
    routed = wh.sql(spark, q)
    assert not _key_exchanges(routed, "l_orderkey")
    assert routed.columns == ["l_orderkey", "k2", "l_extendedprice", "l_discount"]
    assert routed.count() == 20


def test_agg_routes_zero_exchange_and_byte_identical(spark, wh):
    q = (
        "SELECT l.l_orderkey, COUNT(*) AS n, "
        "SUM(CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT)) AS cents "
        "FROM spjcat.f.li16 AS l WHERE l.l_quantity > 5 "
        "GROUP BY l.l_orderkey HAVING COUNT(*) >= 2 "
        "ORDER BY l_orderkey LIMIT 100"
    )
    routed = wh.sql(spark, q)
    plan = plan_string(routed)
    # ZERO hash Exchange anywhere: per-branch partial+final HashAggregate
    assert "Exchange hashpartitioning" not in plan
    assert "Union" in plan
    got = _rows(routed)
    want = _rows(_plain(wh, spark, q))
    assert got == want and len(got) == 100


def test_agg_unaliased_and_positional_order(spark, wh):
    q = (
        "SELECT l_orderkey, MAX(l_quantity) AS mq FROM spjcat.f.li16 "
        "GROUP BY l_orderkey ORDER BY 2 DESC, 1 ASC LIMIT 10"
    )
    routed = wh.sql(spark, q)
    assert "Exchange hashpartitioning" not in plan_string(routed)
    assert _rows(routed) == _rows(_plain(wh, spark, q))


FALLBACKS = [
    # incompatible bucket counts (8 vs 12): specs refuse, plain join runs
    (
        "incompatible-specs",
        "SELECT o.o_orderkey, l.l_extendedprice FROM spjcat.f.orders8 AS o "
        "JOIN spjcat.f.li12 AS l ON o.o_orderkey = l.l_orderkey LIMIT 5",
    ),
    # one side is a VIEW, not a table
    (
        "view-side",
        "SELECT v.o_totalprice, l.l_extendedprice FROM spjcat.f.ordview AS v "
        "JOIN spjcat.f.li16 AS l ON v.o_orderkey = l.l_orderkey LIMIT 5",
    ),
    # unpartitioned side
    (
        "unpartitioned",
        "SELECT n.n_name, o.o_orderkey FROM spjcat.f.nation AS n "
        "JOIN spjcat.f.orders8 AS o ON n.n_nationkey = o.o_orderkey LIMIT 5",
    ),
    # outer join flavor
    (
        "left-join",
        "SELECT o.o_orderkey, l.l_extendedprice FROM spjcat.f.orders8 AS o "
        "LEFT JOIN spjcat.f.li16 AS l ON o.o_orderkey = l.l_orderkey LIMIT 5",
    ),
    # non-equi ON
    (
        "non-equi",
        "SELECT o.o_orderkey, l.l_orderkey FROM spjcat.f.orders8 AS o "
        "JOIN spjcat.f.li16 AS l ON o.o_orderkey < l.l_orderkey LIMIT 5",
    ),
    # subquery
    (
        "subquery",
        "SELECT t.o_orderkey FROM (SELECT o_orderkey FROM spjcat.f.orders8) "
        "AS t LIMIT 5",
    ),
    # window function over a GROUP BY shape
    (
        "window-fn",
        "SELECT l_orderkey, RANK() OVER (ORDER BY COUNT(*)) AS r "
        "FROM spjcat.f.li16 GROUP BY l_orderkey LIMIT 5",
    ),
    # GROUP BY on a non-partition-backed key
    (
        "non-backed-key",
        "SELECT l_quantity, COUNT(*) AS n FROM spjcat.f.li16 "
        "GROUP BY l_quantity ORDER BY l_quantity LIMIT 5",
    ),
    # set operation
    (
        "union",
        "SELECT o_orderkey FROM spjcat.f.orders8 UNION ALL "
        "SELECT l_orderkey FROM spjcat.f.li16 LIMIT 5",
    ),
]


@pytest.mark.parametrize("label,q", FALLBACKS, ids=[f[0] for f in FALLBACKS])
def test_fallback_matrix_runs_plain_and_matches(spark, wh, label, q):
    """Every refusal shape executes the PLAIN plan — never an error, and
    identical rows to the explicitly-disabled path."""
    got = wh.sql(spark, q)
    want = _plain(wh, spark, q)
    assert got.count() == want.count()


def test_fallback_unknown_column_error_matches_plain(spark, wh):
    """Errors surface from the PLAIN path: a typo'd column in a
    routable-looking statement raises Spark's normal analysis error,
    not a router internal."""
    q = (
        "SELECT l.nope, COUNT(*) AS n FROM spjcat.f.li16 AS l "
        "GROUP BY l.nope"
    )
    with pytest.raises(Exception) as e:
        wh.sql(spark, q)
    assert "nope" in str(e.value) or "UNRESOLVED" in str(e.value).upper()


def test_script_and_dml_paths_unaffected(spark, wh):
    """Multi-statement scripts skip routing (REPEATABLE READ pins);
    DML keeps dispatching to the write path."""
    out = wh.sql(
        spark,
        "SELECT COUNT(*) AS n FROM spjcat.f.orders8; "
        "SELECT o.o_orderstatus, COUNT(*) AS n FROM spjcat.f.orders8 AS o "
        "JOIN spjcat.f.li16 AS l ON o.o_orderkey = l.l_orderkey "
        "GROUP BY o.o_orderstatus",
    )
    assert out.count() > 0


def test_registered_gates_actually_route(spark, sf_dir):
    """The driver gates' SQL text must ROUTE, not silently fall back:
    the join gate plans a broadcast join with zero join-key Exchange
    (collapsed to ONE BroadcastHashJoin by default, a Union of them
    when collapse is off), the agg gate plans zero hash Exchange
    anywhere."""
    from datafusion_iceberg_spark.iceberg.queries import (
        iceberg_spj_sql_agg,
        iceberg_spj_sql_join,
    )

    j = iceberg_spj_sql_join(spark, sf_dir)
    jp = plan_string(j)
    assert jp.count("BroadcastHashJoin") >= 1
    assert "SortMergeJoin" not in jp
    assert not _key_exchanges(j, "o_orderkey", "l_orderkey")
    assert j.count() > 0

    a = iceberg_spj_sql_agg(spark, sf_dir)
    ap = plan_string(a)
    assert "Exchange hashpartitioning" not in ap
    assert "Union" in ap
    assert a.count() > 0


JOIN_AGG_Q = (
    "SELECT l.l_orderkey, o.o_orderstatus, COUNT(*) AS n, "
    "SUM(CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT)) AS cents "
    "FROM spjcat.f.orders8 AS o JOIN spjcat.f.li16 AS l "
    "ON o.o_orderkey = l.l_orderkey "
    "WHERE l.l_quantity > 10 "
    "GROUP BY l.l_orderkey, o.o_orderstatus HAVING COUNT(*) >= 2 "
    "ORDER BY l_orderkey, o_orderstatus LIMIT 200"
)


def test_join_group_by_key_aggregates_per_branch(spark, wh):
    """GROUP BY covering the join key (either side's copy) runs the
    whole statement per branch: join AND aggregation plan with ZERO
    hash Exchange anywhere, byte-identical to the plain plan."""
    routed = wh.sql(spark, JOIN_AGG_Q)
    plan = plan_string(routed)
    assert "Exchange hashpartitioning" not in plan
    assert "Union" in plan and plan.count("BroadcastHashJoin") >= 2
    got = _rows(routed)
    want = _rows(_plain(wh, spark, JOIN_AGG_Q))
    assert got == want and len(got) > 0


def test_join_group_by_other_side_key_and_same_name(spark, wh, sf_dir):
    """Coverage via the LEFT side's key name; and the same-name-key pair
    (deduped view column) grouped through the a-alias."""
    _ensure_li16b(wh, spark, sf_dir)
    q = (
        "SELECT o.o_orderkey, COUNT(*) AS n "
        "FROM spjcat.f.orders8 AS o JOIN spjcat.f.li16 AS l "
        "ON o.o_orderkey = l.l_orderkey GROUP BY o.o_orderkey"
    )
    routed = wh.sql(spark, q)
    assert "Exchange hashpartitioning" not in plan_string(routed)
    assert _rows(routed) == _rows(_plain(wh, spark, q))
    q2 = (
        "SELECT a.l_orderkey, COUNT(*) AS n, SUM(b.l_discount) AS d "
        "FROM spjcat.f.li16 AS a JOIN spjcat.f.li16b AS b "
        "ON a.l_orderkey = b.l_orderkey GROUP BY a.l_orderkey"
    )
    routed2 = wh.sql(spark, q2)
    assert "Exchange hashpartitioning" not in plan_string(routed2)
    assert _rows(routed2) == _rows(_plain(wh, spark, q2))


def test_join_group_by_nonkey_still_routes_join_only(spark, wh):
    """GROUP BY not covering the join key degrades to the splice path:
    join shuffle-free, aggregation shuffles above the union (JOIN_Q's
    plan shape) — never a refusal."""
    routed = wh.sql(spark, JOIN_Q)
    plan = plan_string(routed)
    assert not _key_exchanges(routed, "o_orderkey", "l_orderkey")
    assert "Exchange hashpartitioning" in plan  # the agg, by design


def test_qualified_ref_to_wrong_side_errors_like_plain(spark, wh, sf_dir):
    """`b.c` where c is the OTHER side's column must surface plain
    SQL's unresolved-column error, not silently resolve through the
    rewritten view (the router is absent, never wider)."""
    _ensure_li16b(wh, spark, sf_dir)
    q = (
        "SELECT b.l_extendedprice FROM spjcat.f.li16 AS a "
        "JOIN spjcat.f.li16b AS b ON a.l_orderkey = b.l_orderkey LIMIT 5"
    )
    with pytest.raises(Exception) as e:
        wh.sql(spark, q)
    s = str(e.value).upper()
    assert "L_EXTENDEDPRICE" in s or "UNRESOLVED" in s


def test_bare_deduped_key_ref_errors_like_plain(spark, wh, sf_dir):
    """A bare reference to a same-name join key is AMBIGUOUS_REFERENCE
    in plain SQL (both sides in scope) even though the deduped view
    would resolve it — the router must fall back and surface the
    plain error."""
    _ensure_li16b(wh, spark, sf_dir)
    q = (
        "SELECT l_orderkey, COUNT(*) AS n FROM spjcat.f.li16 AS a "
        "JOIN spjcat.f.li16b AS b ON a.l_orderkey = b.l_orderkey "
        "GROUP BY l_orderkey"
    )
    with pytest.raises(Exception) as e:
        wh.sql(spark, q)
    assert "AMBIGUOUS" in str(e.value).upper()


def test_three_way_chain_routes(spark, wh, sf_dir):
    """A 3-table FROM (two JOINs) routes through bucket_join_chain:
    zero join-key Exchange, byte-identical to the plain chained join."""
    third = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("c_orderkey"),
        F.col("o_orderpriority").alias("c_pri"),
    )
    if "f.clerk4" not in wh._relation_keys():
        wh.create_table(
            "f.clerk4", third.schema, partition_by=["bucket(4, c_orderkey)"]
        )
        wh.append("f.clerk4", spark, third)
    q = (
        "SELECT o.o_orderstatus, c.c_pri, COUNT(*) AS n "
        "FROM spjcat.f.orders8 AS o "
        "JOIN spjcat.f.li16 AS l ON o.o_orderkey = l.l_orderkey "
        "JOIN spjcat.f.clerk4 AS c ON l.l_orderkey = c.c_orderkey "
        "GROUP BY o.o_orderstatus, c.c_pri ORDER BY o_orderstatus, c_pri"
    )
    routed = wh.sql(spark, q)
    plan = plan_string(routed)
    assert not _key_exchanges(routed, "orderkey")
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 4
    got = _rows(routed)
    want = _rows(_plain(wh, spark, q))
    assert got == want and len(got) > 0
    # star form (both later sides referencing the FIRST alias) routes too
    q_star = q.replace(
        "ON l.l_orderkey = c.c_orderkey", "ON o.o_orderkey = c.c_orderkey"
    )
    assert _rows(wh.sql(spark, q_star)) == want


def test_select_distinct_single_table_routes(spark, wh):
    """SELECT DISTINCT whose column set contains the partition-backed
    key runs per branch: zero Exchange (plain shuffles for the dedup),
    byte-identical; WHERE + ORDER BY/LIMIT handled."""
    q = (
        "SELECT DISTINCT l.l_orderkey, l.l_quantity FROM spjcat.f.li16 AS l "
        "WHERE l.l_quantity > 40 ORDER BY l_orderkey, l_quantity LIMIT 100"
    )
    routed = wh.sql(spark, q)
    plan = plan_string(routed)
    assert "Union" in plan
    assert "Exchange hashpartitioning" not in plan
    got = _rows(routed)
    want = _rows(_plain(wh, spark, q))
    assert got == want and len(got) > 0


def test_select_distinct_not_covering_key_falls_back(spark, wh):
    """DISTINCT set without the key cannot pin tuples to branches —
    silent fallback to the plain plan."""
    q = "SELECT DISTINCT l.l_quantity FROM spjcat.f.li16 AS l"
    routed = wh.sql(spark, q)
    assert "Union" not in plan_string(routed)
    assert _rows(routed) == _rows(_plain(wh, spark, q))


def test_join_select_distinct_routes_and_degrades(spark, wh):
    """Join + SELECT DISTINCT covering a join-key copy: zero Exchange
    end-to-end.  Not covering: join still routes (splice), dedup
    shuffles above the union."""
    q = (
        "SELECT DISTINCT l.l_orderkey, o.o_orderstatus "
        "FROM spjcat.f.orders8 AS o JOIN spjcat.f.li16 AS l "
        "ON o.o_orderkey = l.l_orderkey"
    )
    routed = wh.sql(spark, q)
    plan = plan_string(routed)
    assert "Union" in plan and "Exchange hashpartitioning" not in plan
    assert _rows(routed) == _rows(_plain(wh, spark, q))
    q2 = (
        "SELECT DISTINCT o.o_orderstatus "
        "FROM spjcat.f.orders8 AS o JOIN spjcat.f.li16 AS l "
        "ON o.o_orderkey = l.l_orderkey"
    )
    routed2 = wh.sql(spark, q2)
    plan2 = plan_string(routed2)
    # join routed via splice (collapsed to one BroadcastHashJoin)
    assert plan2.count("BroadcastHashJoin") >= 1
    assert not _key_exchanges(routed2, "o_orderkey", "l_orderkey")
    assert "Exchange hashpartitioning" in plan2  # the dedup, by design
    assert _rows(routed2) == _rows(_plain(wh, spark, q2))


def test_count_distinct_aggregates_zero_exchange(spark, wh):
    """Distinct AGGREGATES inside routed per-branch statements are
    exact (groups are branch-local) and plan zero-Exchange — plain
    Spark expands COUNT(DISTINCT) into a two-shuffle plan."""
    q = (
        "SELECT l.l_orderkey, COUNT(DISTINCT l.l_quantity) AS nq "
        "FROM spjcat.f.li16 AS l GROUP BY l.l_orderkey"
    )
    routed = wh.sql(spark, q)
    plan = plan_string(routed)
    assert "Union" in plan and "Exchange hashpartitioning" not in plan
    assert _rows(routed) == _rows(_plain(wh, spark, q))
    q2 = (
        "SELECT l.l_orderkey, COUNT(DISTINCT l.l_quantity) AS nq "
        "FROM spjcat.f.orders8 AS o JOIN spjcat.f.li16 AS l "
        "ON o.o_orderkey = l.l_orderkey GROUP BY l.l_orderkey"
    )
    routed2 = wh.sql(spark, q2)
    plan2 = plan_string(routed2)
    assert "Union" in plan2 and "Exchange hashpartitioning" not in plan2
    assert _rows(routed2) == _rows(_plain(wh, spark, q2))


def test_nondeterministic_functions_never_route(spark, wh):
    """Statement-scoped/nondeterministic functions (CURRENT_DATE, RAND)
    would be computed once per BRANCH if routed — the fence refuses at
    recognition and the plain path executes."""
    q = (
        "SELECT l.l_orderkey, COUNT(*) AS n, CURRENT_DATE AS d "
        "FROM spjcat.f.li16 AS l GROUP BY l.l_orderkey"
    )
    assert "Union" not in plan_string(wh.sql(spark, q))
    q2 = (
        "SELECT DISTINCT l.l_orderkey, RAND() AS r "
        "FROM spjcat.f.li16 AS l"
    )
    assert "Union" not in plan_string(wh.sql(spark, q2))


def test_chain_group_by_key_aggregates_per_branch(spark, wh, sf_dir):
    """3-table chain whose GROUP BY covers the chain key (any side's
    copy): the whole statement runs per branch over ONE shared branch
    decomposition — join AND aggregation zero-Exchange end-to-end."""
    third = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("c_orderkey"),
        F.col("o_orderpriority").alias("c_pri"),
    )
    if "f.clerk4" not in wh._relation_keys():
        wh.create_table(
            "f.clerk4", third.schema, partition_by=["bucket(4, c_orderkey)"]
        )
        wh.append("f.clerk4", spark, third)
    q = (
        "SELECT c.c_orderkey, COUNT(*) AS n, "
        "SUM(CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT)) AS cents "
        "FROM spjcat.f.orders8 AS o "
        "JOIN spjcat.f.li16 AS l ON o.o_orderkey = l.l_orderkey "
        "JOIN spjcat.f.clerk4 AS c ON l.l_orderkey = c.c_orderkey "
        "GROUP BY c.c_orderkey ORDER BY c_orderkey LIMIT 300"
    )
    routed = wh.sql(spark, q)
    plan = plan_string(routed)
    assert "Exchange hashpartitioning" not in plan
    assert "Union" in plan and plan.count("BroadcastHashJoin") >= 4
    got = _rows(routed)
    want = _rows(_plain(wh, spark, q))
    assert got == want and len(got) > 0


def test_chain_select_distinct_per_branch(spark, wh, sf_dir):
    """3-table chain under SELECT DISTINCT covering the chain key:
    zero-Exchange dedup over the shared decomposition."""
    third = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("c_orderkey"),
        F.col("o_orderpriority").alias("c_pri"),
    )
    if "f.clerk4" not in wh._relation_keys():
        wh.create_table(
            "f.clerk4", third.schema, partition_by=["bucket(4, c_orderkey)"]
        )
        wh.append("f.clerk4", spark, third)
    q = (
        "SELECT DISTINCT o.o_orderkey, c.c_pri "
        "FROM spjcat.f.orders8 AS o "
        "JOIN spjcat.f.li16 AS l ON o.o_orderkey = l.l_orderkey "
        "JOIN spjcat.f.clerk4 AS c ON o.o_orderkey = c.c_orderkey"
    )
    routed = wh.sql(spark, q)
    plan = plan_string(routed)
    assert "Exchange hashpartitioning" not in plan
    assert "Union" in plan
    assert _rows(routed) == _rows(_plain(wh, spark, q))


def test_time_travel_routes_at_snapshot(spark, wh, sf_dir):
    """FOR VERSION AS OF on a routable GROUP BY runs the statement per
    branch AT THE SNAPSHOT (snapshot-parameterized SPJ): zero Exchange,
    byte-identical to the plain time-travel path, and genuinely
    historical (an append after the pin must not leak in)."""
    t = wh.load("f.li12")
    snap0 = t.metadata.current_snapshot_id
    extra = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_extendedprice", "l_quantity")
        .limit(100)
    )
    wh.append("f.li12", spark, extra)
    q = (
        "SELECT l.l_orderkey, COUNT(*) AS n FROM spjcat.f.li12 "
        f"FOR VERSION AS OF {snap0} AS l "
        "GROUP BY l.l_orderkey ORDER BY l_orderkey LIMIT 50"
    )
    routed = wh.sql(spark, q)
    plan = plan_string(routed)
    assert "Union" in plan and "Exchange hashpartitioning" not in plan
    assert _rows(routed) == _rows(_plain(wh, spark, q))
    # the pin is real: total counts then vs now differ by the append
    n_then = _rows(
        _plain(
            wh,
            spark,
            f"SELECT COUNT(*) AS n FROM spjcat.f.li12 FOR VERSION AS OF {snap0}",
        )
    )[0][0]
    n_now = _rows(
        _plain(wh, spark, "SELECT COUNT(*) AS n FROM spjcat.f.li12")
    )[0][0]
    assert n_now == n_then + 100


def test_time_travel_schema_evolution_falls_back(spark, wh, sf_dir):
    """A snapshot written under a DIFFERENT schema id must not route:
    the router's audits resolve against the current schema, so the
    plain path (which reads the snapshot's own schema) executes."""
    if "f.evo" not in wh._relation_keys():
        li = (
            spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            .select("l_orderkey", "l_quantity")
            .limit(500)
        )
        wh.create_table(
            "f.evo", li.schema, partition_by=["bucket(4, l_orderkey)"]
        )
        wh.append("f.evo", spark, li)
        wh.sql(spark, "ALTER TABLE spjcat.f.evo ADD COLUMN extra INT")
    snaps = wh.load("f.evo").metadata.snapshots
    snap0 = snaps[0].snapshot_id
    q = (
        "SELECT l.l_orderkey, COUNT(*) AS n FROM spjcat.f.evo "
        f"FOR VERSION AS OF {snap0} AS l GROUP BY l.l_orderkey "
        "ORDER BY l_orderkey LIMIT 20"
    )
    routed = wh.sql(spark, q)
    assert "Union" not in plan_string(routed)  # fence fired
    assert _rows(routed) == _rows(_plain(wh, spark, q))


def test_time_travel_join_routes(spark, wh):
    """A routed JOIN with a FOR VERSION AS OF pin on one side resolves
    the pin into the snapshot-parameterized bucket_join."""
    s_o = wh.load("f.orders8").metadata.current_snapshot_id
    q = (
        f"SELECT o.o_orderstatus, COUNT(*) AS n "
        f"FROM spjcat.f.orders8 FOR VERSION AS OF {s_o} AS o "
        "JOIN spjcat.f.li16 AS l ON o.o_orderkey = l.l_orderkey "
        "GROUP BY o.o_orderstatus ORDER BY o_orderstatus"
    )
    routed = wh.sql(spark, q)
    # collapsed by default: one BroadcastHashJoin, no join-key Exchange
    assert plan_string(routed).count("BroadcastHashJoin") >= 1
    assert not _key_exchanges(routed, "o_orderkey", "l_orderkey")
    assert _rows(routed) == _rows(_plain(wh, spark, q))
