"""Storage-partitioned joins: shuffle elision on bucket-co-partitioned
Iceberg tables (iceberg/spj.py).

The plan property the module exists for — a fact-to-fact join with ZERO
shuffle Exchange on the join keys — is asserted on the physical plan
string, and byte-identical results vs the plain (shuffling) join are
asserted row-for-row.  Reference anchor: partition-grouped scan units
feeding partitioned execution, table.rs:128-131.
"""

from __future__ import annotations

import os
import re
import shutil

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from datafusion_iceberg_spark.iceberg.catalog import Catalog
from datafusion_iceberg_spark.iceberg.spj import (
    BucketJoinError,
    bucket_join,
    bucket_partitioning,
    compatible_bucket_counts,
)
from datafusion_iceberg_spark.plans.audit import plan_string


@pytest.fixture(scope="module")
def wh(tmp_path_factory, spark, sf_dir):
    """orders bucket(8, o_orderkey) ⋈ lineitem bucket(16, l_orderkey),
    plus an unpartitioned nation and a 12-bucket copy for the
    incompatibility test."""
    root = str(tmp_path_factory.mktemp("spj_wh"))
    cat = Catalog(root)
    orders = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice"
    )
    cat.create_table(
        "spj.orders8", orders.schema, partition_by=["bucket(8, o_orderkey)"]
    )
    cat.append("spj.orders8", spark, orders)
    cat.create_table(
        "spj.li16", li.schema, partition_by=["bucket(16, l_orderkey)"]
    )
    cat.append("spj.li16", spark, li)
    cat.create_table(
        "spj.li12", li.schema, partition_by=["bucket(12, l_orderkey)"]
    )
    cat.append("spj.li12", spark, li)
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    cat.create_table("spj.nation", nation.schema)
    cat.append("spj.nation", spark, nation)
    yield cat
    shutil.rmtree(root, ignore_errors=True)


def test_bucket_partitioning_detection(wh):
    spec = bucket_partitioning(wh.load("spj.orders8"))
    assert spec == {"o_orderkey": (8, "o_orderkey_bucket")}
    assert bucket_partitioning(wh.load("spj.nation")) == {}


def test_compatible_counts_fold_and_refuse(wh):
    o8 = wh.load("spj.orders8")
    li16 = wh.load("spj.li16")
    li12 = wh.load("spj.li12")
    assert (
        compatible_bucket_counts(o8, li16, "o_orderkey", "l_orderkey") == 8
    )
    with pytest.raises(BucketJoinError, match="incompatible bucket counts"):
        compatible_bucket_counts(o8, li12, "o_orderkey", "l_orderkey")


def test_bucket_join_byte_identical_to_plain_join(spark, wh):
    o8 = wh.load("spj.orders8")
    li16 = wh.load("spj.li16")
    spj = bucket_join(spark, o8, li16, "o_orderkey", "l_orderkey")
    plain = o8.to_df(spark).join(
        li16.to_df(spark),
        on=F.col("o_orderkey") == F.col("l_orderkey"),
        how="inner",
    ).select(*spj.columns)
    got = sorted(map(tuple, spj.collect()))
    want = sorted(map(tuple, plain.collect()))
    assert got == want
    assert len(got) > 0


def test_bucket_join_plan_has_zero_exchange_on_join_keys(spark, wh, monkeypatch):
    """THE property: no shuffle Exchange hash-partitioning on the join
    keys anywhere in the plan — the union path (collapse forced off)
    runs as a Union of per-bucket BroadcastHashJoins over per-bucket
    file groups."""
    monkeypatch.setenv("SPARK_GRAFT_SPJ_COLLAPSE", "0")
    o8 = wh.load("spj.orders8")
    li16 = wh.load("spj.li16")
    spj = bucket_join(spark, o8, li16, "o_orderkey", "l_orderkey")
    plan = plan_string(spj)
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "o_orderkey" not in m.group(1)
        assert "l_orderkey" not in m.group(1)
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 2
    assert "Union" in plan
    # an aggregate ABOVE the join may shuffle on ITS OWN key — that is
    # the expected residual Exchange, never the join keys
    agg = spj.groupBy("o_orderstatus").count()
    aplan = plan_string(agg)
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", aplan):
        assert "o_orderkey" not in m.group(1)
        assert "l_orderkey" not in m.group(1)


def test_bucket_join_collapses_to_single_broadcast_join(spark, wh):
    """r16 whole-side broadcast collapse (guide §3.1): when one side's
    ENTIRE participating file set fits under the broadcast ceiling, the
    union of per-branch joins collapses to ONE BroadcastHashJoin — same
    rows, zero Exchange on the join keys, |branches|× fewer broadcast
    jobs."""
    o8 = wh.load("spj.orders8")
    li16 = wh.load("spj.li16")
    spj = bucket_join(spark, o8, li16, "o_orderkey", "l_orderkey")
    plan = plan_string(spj)
    assert plan.count("BroadcastHashJoin") == 1
    assert "Union" not in plan
    assert "SortMergeJoin" not in plan
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "o_orderkey" not in m.group(1)
        assert "l_orderkey" not in m.group(1)
    # row-identical to the forced union path
    import os as _os

    _os.environ["SPARK_GRAFT_SPJ_COLLAPSE"] = "0"
    try:
        union = bucket_join(spark, o8, li16, "o_orderkey", "l_orderkey")
        assert sorted(map(tuple, spj.collect())) == sorted(
            map(tuple, union.collect())
        )
    finally:
        _os.environ.pop("SPARK_GRAFT_SPJ_COLLAPSE", None)


def test_bucket_join_filters_push_into_bucket_scans(spark, wh):
    o8 = wh.load("spj.orders8")
    li16 = wh.load("spj.li16")
    spj = bucket_join(
        spark,
        o8,
        li16,
        "o_orderkey",
        "l_orderkey",
        left_filters=("=", "o_orderstatus", "F"),
    )
    plain = (
        o8.to_df(spark)
        .filter("o_orderstatus = 'F'")
        .join(
            li16.to_df(spark),
            on=F.col("o_orderkey") == F.col("l_orderkey"),
            how="inner",
        )
        .select(*spj.columns)
    )
    assert sorted(map(tuple, spj.collect())) == sorted(
        map(tuple, plain.collect())
    )
    # the exact re-filter reaches the parquet scan as a pushed filter
    assert "PushedFilters" in plan_string(spj)


def test_bucket_join_oversized_bucket_degrades_not_fails(spark, wh):
    """max_broadcast_bytes=0: every bucket's smaller side exceeds the
    ceiling, each union branch degrades to a shuffle join INDIVIDUALLY,
    results stay identical (the skew story: one hot bucket never poisons
    the whole plan)."""
    o8 = wh.load("spj.orders8")
    li16 = wh.load("spj.li16")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        spj = bucket_join(
            spark, o8, li16, "o_orderkey", "l_orderkey", max_broadcast_bytes=0
        )
        # unhinted and with Catalyst's auto-broadcast off, the oversized
        # buckets shuffle individually (at test scale AQE would otherwise
        # re-broadcast the tiny sides, hiding the degradation shape)
        assert "BroadcastHashJoin" not in plan_string(spj)
        rows = sorted(map(tuple, spj.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    base = bucket_join(spark, o8, li16, "o_orderkey", "l_orderkey")
    assert rows == sorted(map(tuple, base.collect()))


def test_bucket_join_null_keys_match_plain_inner(spark, tmp_path):
    """NULL join keys land in the null-bucket partition, are excluded
    from every bucket group, and an inner join never matches them —
    byte-identical to the plain join."""
    cat = Catalog(str(tmp_path / "nulls"))
    lschema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("lv", T.StringType()),
        ]
    )
    rschema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("rv", T.StringType()),
        ]
    )
    left = spark.createDataFrame(
        [(1, "a"), (2, "b"), (None, "ln"), (3, "c")], lschema
    )
    right = spark.createDataFrame(
        [(1, "x"), (None, "rn"), (3, "y"), (4, "z")], rschema
    )
    cat.create_table("n.l", lschema, partition_by=["bucket(4, k)"])
    cat.append("n.l", spark, left)
    cat.create_table("n.r", rschema, partition_by=["bucket(4, k)"])
    cat.append("n.r", spark, right)
    lt, rt = cat.load("n.l"), cat.load("n.r")
    spj = bucket_join(spark, lt, rt, "k")
    plain = lt.to_df(spark).join(rt.to_df(spark), on=["k"], how="inner")
    assert sorted(map(tuple, spj.select(*plain.columns).collect())) == sorted(
        map(tuple, plain.collect())
    )
    assert {r.k for r in spj.collect()} == {1, 3}


def test_bucket_join_refusals(spark, wh):
    o8 = wh.load("spj.orders8")
    li16 = wh.load("spj.li16")
    nation = wh.load("spj.nation")
    with pytest.raises(BucketJoinError, match="not bucket-partitioned"):
        bucket_join(spark, o8, nation, "o_orderkey", "n_nationkey")
    with pytest.raises(BucketJoinError, match="left_anti"):
        bucket_join(spark, o8, li16, "o_orderkey", "l_orderkey", how="cross")


@pytest.mark.parametrize("how", ["left", "right", "full"])
def test_bucket_outer_joins_match_plain(spark, tmp_path, how):
    """Outer flavors: NULL-key files and match-less buckets re-attach
    null-extended; every leg stays a BroadcastHashJoin (full outer
    decomposes to inner ∪ anti ∪ anti) — byte-identical to the plain
    shuffling outer join."""
    cat = Catalog(str(tmp_path / "outer"))
    lschema = "k long, lv string"
    rschema = "k long, rv string"
    left = spark.createDataFrame(
        [(1, "a"), (2, "b"), (None, "ln"), (3, "c"), (7, "g")], lschema
    )
    right = spark.createDataFrame(
        [(1, "x"), (None, "rn"), (3, "y"), (4, "z"), (3, "y2")], rschema
    )
    cat.create_table("o.l", left.schema, partition_by=["bucket(4, k)"])
    cat.append("o.l", spark, left)
    cat.create_table("o.r", right.schema, partition_by=["bucket(8, k)"])
    cat.append("o.r", spark, right)
    lt, rt = cat.load("o.l"), cat.load("o.r")
    spj = bucket_join(spark, lt, rt, "k", how=how)
    plain = lt.to_df(spark).join(rt.to_df(spark), on=["k"], how=how)
    got = sorted(map(tuple, spj.select(*plain.columns).collect()),
                 key=lambda t: tuple((v is None, v) for v in t))
    want = sorted(map(tuple, plain.collect()),
                  key=lambda t: tuple((v is None, v) for v in t))
    assert got == want
    plan = plan_string(spj)
    assert "SortMergeJoin" not in plan
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "k#" not in m.group(1)


def test_gate_matches_oracle(spark, duck, sf_dir):
    from datafusion_iceberg_spark import registry
    from tests.oracle_compare import compare

    registry.load_all_modules()
    df = registry.QUERIES["iceberg_bucket_join_scan"](spark, sf_dir)
    compare(
        df,
        duck.sql(registry.ORACLES["iceberg_bucket_join_scan"]),
        "iceberg_bucket_join_scan",
    )
    # and the gate's own plan carries no join-key shuffle
    plan = plan_string(df)
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "o_orderkey" not in m.group(1)
        assert "l_orderkey" not in m.group(1)


def test_bucketed_sig_store_join_zero_exchange_on_band_hash(spark, sf_dir):
    """The pipeline composition (VERDICT r12 #7): the incremental-dedup
    candidate join over the bucket-partitioned signature store carries
    NO shuffle Exchange on band_hash — only the candidate DISTINCT and
    verify stages shuffle, on their own keys."""
    from datafusion_iceberg_spark.extensions.dedup import (
        _bucketed_sig_tables,
    )
    from datafusion_iceberg_spark.iceberg.spj import bucket_join

    store, stag = _bucketed_sig_tables(spark, sf_dir)
    j = bucket_join(spark, store, stag, "band_hash")
    plan = plan_string(j)
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "band_hash" not in m.group(1)
    # r16: whole-side collapse yields ONE BroadcastHashJoin when a side
    # fits the ceiling; the union shape survives behind the env switch
    assert plan.count("BroadcastHashJoin") >= 1


def test_bucketed_sig_gate_matches_incremental_gate(spark, sf_dir):
    """Same duplicate report as the shuffling incremental gate (the cap
    rule differs formally — per-side vs union — but no sf0.001 bucket is
    anywhere near 1000, so the candidate sets coincide and the verified
    output must be identical row-for-row)."""
    from datafusion_iceberg_spark import registry

    registry.load_all_modules()
    a = sorted(
        map(
            tuple,
            registry.QUERIES["dedup_bucketed_store_join"](
                spark, sf_dir
            ).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            registry.QUERIES["dedup_incremental_minhash"](
                spark, sf_dir
            ).collect(),
        )
    )
    assert a == b


def test_catalog_bucket_join_resolves_and_falls_back(spark, wh):
    from datafusion_iceberg_spark.iceberg.spj import catalog_bucket_join

    df = catalog_bucket_join(
        wh, spark, "spj.orders8", "spj.li16", "o_orderkey", "l_orderkey"
    )
    assert df.count() > 0
    # incompatible counts: raises without fallback, joins with it
    with pytest.raises(BucketJoinError):
        catalog_bucket_join(
            wh, spark, "spj.orders8", "spj.li12", "o_orderkey", "l_orderkey"
        )
    fb = catalog_bucket_join(
        wh,
        spark,
        "spj.orders8",
        "spj.li12",
        "o_orderkey",
        "l_orderkey",
        fallback=True,
    )
    assert fb.count() == df.count()


def test_persisted_ivf_probe_prunes_partitions(spark, sf_dir):
    """The inverted-file lookup IS manifest partition pruning: a probe
    list of cluster ids plans only those clusters' files."""
    from datafusion_iceberg_spark.extensions.similarity import _ivf_store

    store = _ivf_store(spark, sf_dir)
    n_all = len(store.files())
    pruned = store.files(("in", "cent_id", [5, 6]))
    assert 0 < len(pruned) < n_all
    assert {f.partition["cent_id"] for f in pruned} <= {5, 6}


def test_spec_evolved_bucket_count_refuses(spark, tmp_path):
    """Review finding: a file written under bucket(4, k) cannot fold onto
    an 8-bucket grid (h%8 is not derivable from h%4) — after evolving the
    spec to bucket(8, k), joining must refuse loudly on the OLD files
    instead of silently dropping matches."""
    cat = Catalog(str(tmp_path / "ev"))
    left = spark.createDataFrame([(i, f"v{i}") for i in range(64)], "k long, lv string")
    right = spark.createDataFrame([(i, f"w{i}") for i in range(64)], "k long, rv string")
    cat.create_table("e.l", left.schema, partition_by=["bucket(4, k)"])
    cat.append("e.l", spark, left)
    cat.evolve_partition_spec("e.l", ["bucket(8, k)"])
    cat.append("e.l", spark, left)  # new files under bucket(8)
    cat.create_table("e.r", right.schema, partition_by=["bucket(8, k)"])
    cat.append("e.r", spark, right)
    with pytest.raises(BucketJoinError, match="bucket\\[4\\]"):
        bucket_join(spark, cat.load("e.l"), cat.load("e.r"), "k").collect()


def test_bucket_write_exact_for_big_longs_with_nulls(spark, tmp_path):
    """Review finding: a nullable int64 batch upcasts to float64 in the
    pandas bridge, rounding values above 2^53 — the writer now routes
    integral columns through an exact masked path, so snowflake-scale
    ids bucket correctly even in null-carrying batches."""
    from datafusion_iceberg_spark.iceberg.transforms import bucket_value

    big = (1 << 62) + 12345  # NOT representable in float64
    cat = Catalog(str(tmp_path / "big"))
    df = spark.createDataFrame(
        [(big, "a"), (None, "n"), (7, "b")], "k long, v string"
    )
    cat.create_table("b.t", df.schema, partition_by=["bucket(8, k)"])
    cat.append("b.t", spark, df)
    t = cat.load("b.t")
    by_bucket = {
        f.partition["k_bucket"]: f.record_count for f in t.files()
    }
    assert by_bucket.get(bucket_value(big, 8), 0) >= 1
    # and the pruned point-lookup finds the row
    rows = t.to_df(spark, filters=("=", "k", big)).collect()
    assert [r.v for r in rows] == ["a"]


def test_bucket_join_applies_mor_deletes(spark, tmp_path):
    """The hoisted delete listing must still MASK deleted rows in every
    per-bucket scan: a MOR position delete on the left side disappears
    from the join output exactly as it does from a plain scan."""
    cat = Catalog(str(tmp_path / "mor"))
    left = spark.createDataFrame(
        [(i, f"v{i}") for i in range(32)], "k long, lv string"
    )
    right = spark.createDataFrame(
        [(i, f"w{i}") for i in range(32)], "k long, rv string"
    )
    cat.create_table("m.l", left.schema, partition_by=["bucket(4, k)"])
    cat.append("m.l", spark, left)
    cat.create_table("m.r", right.schema, partition_by=["bucket(4, k)"])
    cat.append("m.r", spark, right)
    cat.delete_where_mor("m.l", spark, ("<", "k", 5))
    lt, rt = cat.load("m.l"), cat.load("m.r")
    spj = bucket_join(spark, lt, rt, "k")
    keys = sorted(r.k for r in spj.collect())
    assert keys == list(range(5, 32))
    # outer flavor: deleted left rows are gone, unmatched RIGHT rows
    # (none here) and the mask agree with the plain join
    full = bucket_join(spark, lt, rt, "k", how="full")
    fkeys = sorted(r.k for r in full.collect())
    assert fkeys == list(range(0, 32))  # rows 0-4 survive via RIGHT side
    rv_null = {r.k for r in full.collect() if r.lv is None}
    assert rv_null == {0, 1, 2, 3, 4}


def test_bucket_join_snapshot_pins(spark, tmp_path):
    """Time travel through the SPJ: a pinned side joins ITS snapshot's
    files and delete coverage, like to_df(snapshot_id=...)."""
    cat = Catalog(str(tmp_path / "tt"))
    left = spark.createDataFrame(
        [(i, f"v{i}") for i in range(16)], "k long, lv string"
    )
    right = spark.createDataFrame(
        [(i, f"w{i}") for i in range(16)], "k long, rv string"
    )
    cat.create_table("t.l", left.schema, partition_by=["bucket(4, k)"])
    cat.append("t.l", spark, left)
    cat.create_table("t.r", right.schema, partition_by=["bucket(4, k)"])
    cat.append("t.r", spark, right)
    lt = cat.load("t.l")
    snap1 = lt.metadata.current_snapshot_id
    # second commit doubles the left side's rows for keys >= 8
    cat.append(
        "t.l",
        spark,
        spark.createDataFrame(
            [(i, f"x{i}") for i in range(8, 16)], "k long, lv string"
        ),
    )
    lt = cat.load("t.l")
    rt = cat.load("t.r")
    pinned = bucket_join(spark, lt, rt, "k", left_snapshot_id=snap1)
    assert pinned.count() == 16  # pre-append view: one row per key
    current = bucket_join(spark, lt, rt, "k")
    assert current.count() == 24  # 16 + the 8 duplicated keys


# ---------------------------------------------------------------------------
# Round 14: composite keys, bounded plan width, bucket_agg, runtime_prune
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def comp_wh(tmp_path_factory, spark):
    """Composite-key layout: bucket(8, k) + identity(g) vs bucket(4, k) +
    identity(g) — the bucket position folds 8 → 4, the identity position
    groups by exact value."""
    root = str(tmp_path_factory.mktemp("spj_comp"))
    cat = Catalog(root)
    left = spark.createDataFrame(
        [(i, i % 3, f"l{i}") for i in range(200)] + [(None, 1, "lnull")],
        "k long, g long, lv string",
    )
    right = spark.createDataFrame(
        [(i, i % 3, f"r{i}") for i in range(150)]
        + [(7, None, "rnull"), (7, 1, "rdup")],
        "k long, g long, rv string",
    )
    cat.create_table(
        "c.l", left.schema, partition_by=["bucket(8, k)", "g"]
    )
    cat.append("c.l", spark, left)
    cat.create_table(
        "c.r", right.schema, partition_by=["bucket(4, k)", "g"]
    )
    cat.append("c.r", spark, right)
    yield cat
    shutil.rmtree(root, ignore_errors=True)


@pytest.mark.parametrize("how", ["inner", "left", "right", "full"])
def test_composite_key_join_matches_plain(spark, comp_wh, how):
    """Composite (bucket + identity) SPJ is byte-identical to the plain
    shuffling join for every flavor, including NULL keys on either
    position (unmatchable; preserved sides re-attach null-extended)."""
    lt, rt = comp_wh.load("c.l"), comp_wh.load("c.r")
    spj = bucket_join(spark, lt, rt, ["k", "g"], how=how)
    plain = lt.to_df(spark).join(rt.to_df(spark), on=["k", "g"], how=how)
    got = sorted(
        map(tuple, spj.select(*plain.columns).collect()),
        key=lambda t: tuple((v is None, v) for v in t),
    )
    want = sorted(
        map(tuple, plain.collect()),
        key=lambda t: tuple((v is None, v) for v in t),
    )
    assert got == want
    assert len(want) > 0


def test_composite_key_join_zero_exchange_on_keys(spark, comp_wh, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SPJ_COLLAPSE", "0")
    lt, rt = comp_wh.load("c.l"), comp_wh.load("c.r")
    spj = bucket_join(spark, lt, rt, ["k", "g"])
    plan = plan_string(spj)
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "k#" not in m.group(1)
        assert "g#" not in m.group(1)
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2


def test_composite_key_position_bucketed_one_side_refuses(spark, comp_wh, tmp_path):
    """A position bucketed on one side but identity on the other has no
    co-location guarantee — refuse loudly."""
    cat = Catalog(str(tmp_path / "mixpos"))
    df = spark.createDataFrame([(1, 2, "x")], "k long, g long, v string")
    cat.create_table(
        "m.t", df.schema, partition_by=["bucket(4, k)", "bucket(4, g)"]
    )
    cat.append("m.t", spark, df)
    lt = comp_wh.load("c.l")  # bucket(8, k) + identity(g)
    with pytest.raises(BucketJoinError, match="transform mix"):
        bucket_join(spark, lt, cat.load("m.t"), ["k", "g"])


def test_composite_key_missing_identity_in_old_spec_refuses(spark, tmp_path):
    """Spec evolution: files written before the identity field joined
    the spec carry no per-file value for it — no co-location guarantee
    for the composite key; refuse instead of silently mis-grouping."""
    cat = Catalog(str(tmp_path / "evc"))
    df = spark.createDataFrame(
        [(i, i % 3, f"v{i}") for i in range(40)], "k long, g long, v string"
    )
    cat.create_table("e.l", df.schema, partition_by=["bucket(4, k)"])
    cat.append("e.l", spark, df)
    cat.evolve_partition_spec("e.l", ["bucket(4, k)", "g"])
    cat.append("e.l", spark, df)
    cat.create_table("e.r", df.schema, partition_by=["bucket(4, k)", "g"])
    cat.append("e.r", spark, df)
    with pytest.raises(BucketJoinError, match="no identity transform"):
        bucket_join(spark, cat.load("e.l"), cat.load("e.r"), ["k", "g"])


def test_wide_join_bounded_branches_and_planning_time(spark, tmp_path):
    """The r13 docstring's own sizing example, now tested: a 256-bucket
    join packs into ≤ max_branches union branches (LPT on manifest byte
    sums), planning stays fast, the zero-Exchange property holds, and
    rows match the plain join."""
    import time

    cat = Catalog(str(tmp_path / "wide"))
    n = 4096
    left = spark.createDataFrame(
        [(i, f"l{i}") for i in range(n)], "k long, lv string"
    ).coalesce(1)
    right = spark.createDataFrame(
        [(i, f"r{i}") for i in range(n)], "k long, rv string"
    ).coalesce(1)
    cat.create_table("w.l", left.schema, partition_by=["bucket(256, k)"])
    cat.append("w.l", spark, left)
    cat.create_table("w.r", right.schema, partition_by=["bucket(256, k)"])
    cat.append("w.r", spark, right)
    lt, rt = cat.load("w.l"), cat.load("w.r")
    assert len(lt.files()) == 256  # every bucket occupied
    t0 = time.time()
    spj = bucket_join(spark, lt, rt, "k", max_branches=32)
    plan = plan_string(spj)  # forces full analysis + physical planning
    elapsed = time.time() - t0
    assert elapsed < 60, f"planning took {elapsed:.1f}s"
    assert plan.count("BroadcastHashJoin") <= 32
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "k#" not in m.group(1)
    got = sorted(map(tuple, spj.collect()))
    want = sorted(
        map(
            tuple,
            lt.to_df(spark)
            .join(rt.to_df(spark), on=["k"], how="inner")
            .select(*spj.columns)
            .collect(),
        )
    )
    assert got == want
    assert len(got) == n


def test_bucket_agg_zero_exchange_and_matches_plain(spark, wh):
    """Storage-partitioned aggregation: groupBy on the bucket source
    column plans with ZERO Exchange of any kind — each branch reads
    whole buckets as one partition (SinglePartition satisfies the
    aggregate's ClusteredDistribution), so partial+final HashAggregate
    run back-to-back in one stage."""
    from datafusion_iceberg_spark.iceberg.spj import bucket_agg

    o8 = wh.load("spj.orders8")
    agg = bucket_agg(
        spark,
        o8,
        ["o_orderkey"],
        [
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")).alias(
                "cents"
            ),
        ],
        max_branches=8,
    )
    plan = plan_string(agg)
    assert "Exchange" not in plan
    got = sorted(map(tuple, agg.collect()))
    want = sorted(
        map(
            tuple,
            o8.to_df(spark)
            .groupBy("o_orderkey")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(
                    F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
                ).alias("cents"),
            )
            .collect(),
        )
    )
    assert got == want


def test_bucket_agg_null_keys_and_extra_group_cols(spark, tmp_path):
    """NULL bucket keys form their own complete branch (SQL GROUP BY
    keeps the NULL group); extra group columns only refine within-bucket
    groups and stay shuffle-free."""
    from datafusion_iceberg_spark.iceberg.spj import bucket_agg

    cat = Catalog(str(tmp_path / "aggnull"))
    df = spark.createDataFrame(
        [(i % 5 if i % 7 else None, i % 2, i) for i in range(300)],
        "k long, tag long, v long",
    )
    cat.create_table("a.t", df.schema, partition_by=["bucket(4, k)"])
    cat.append("a.t", spark, df)
    t = cat.load("a.t")
    agg = bucket_agg(
        spark, t, ["k", "tag"], [F.sum("v").alias("s"), F.count("v").alias("n")]
    )
    assert "Exchange" not in plan_string(agg)
    got = sorted(
        map(tuple, agg.collect()),
        key=lambda r: tuple((x is None, x) for x in r),
    )
    want = sorted(
        map(
            tuple,
            df.groupBy("k", "tag")
            .agg(F.sum("v").alias("s"), F.count("v").alias("n"))
            .collect(),
        ),
        key=lambda r: tuple((x is None, x) for x in r),
    )
    assert got == want
    assert any(r[0] is None for r in got)  # the NULL group survived


def test_bucket_agg_applies_mor_deletes(spark, tmp_path):
    from datafusion_iceberg_spark.iceberg.spj import bucket_agg

    cat = Catalog(str(tmp_path / "aggmor"))
    df = spark.createDataFrame(
        [(i % 8, i) for i in range(64)], "k long, v long"
    )
    cat.create_table("a.t", df.schema, partition_by=["bucket(4, k)"])
    cat.append("a.t", spark, df)
    cat.delete_where_mor("a.t", spark, ("<", "v", 32))
    t = cat.load("a.t")
    agg = bucket_agg(spark, t, ["k"], [F.count(F.lit(1)).alias("n")])
    assert sorted(map(tuple, agg.collect())) == [(k, 4) for k in range(8)]


def test_bucket_agg_refuses_without_bucket_group_col(spark, wh):
    from datafusion_iceberg_spark.iceberg.spj import bucket_agg

    o8 = wh.load("spj.orders8")
    with pytest.raises(BucketJoinError, match="bucket- or identity-partitioned"):
        bucket_agg(spark, o8, ["o_orderstatus"], [F.count(F.lit(1)).alias("n")])


def test_runtime_prune_skips_fact_files_inside_bucket_groups(spark, tmp_path):
    """SPJ × runtime filter: a selective dim filter derives an IN-list
    that folds through the bucket transform and PRUNES whole fact bucket
    groups from the file listing — the composed plan scans fewer files
    and still carries no join-key Exchange."""
    from datafusion_iceberg_spark.iceberg.transforms import bucket_value

    cat = Catalog(str(tmp_path / "rtp"))
    dim = spark.createDataFrame(
        [(i, "hot" if i == 5 else "cold") for i in range(64)],
        "k long, tag string",
    )
    fact = spark.createDataFrame(
        [(i % 64, i) for i in range(2048)], "k long, v long"
    )
    cat.create_table("r.dim", dim.schema, partition_by=["bucket(16, k)"])
    cat.append("r.dim", spark, dim.coalesce(1))
    cat.create_table("r.fact", fact.schema, partition_by=["bucket(16, k)"])
    cat.append("r.fact", spark, fact.coalesce(1))
    dt, ft = cat.load("r.dim"), cat.load("r.fact")
    n_all = len(ft.files())
    assert n_all >= 8  # murmur3 spread: most of the 16 buckets occupied
    spj = bucket_join(
        spark,
        dt,
        ft,
        "k",
        left_filters=("=", "tag", "hot"),
        runtime_prune="right",
    )
    # only the hot key's bucket group survives on the fact side: the
    # branch count collapses to 1 join
    plan = plan_string(spj)
    assert plan.count("BroadcastHashJoin") == 1
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "k#" not in m.group(1)
    rows = spj.collect()
    assert {r.k for r in rows} == {5}
    assert len(rows) == 2048 // 64
    # file-count evidence at the metadata layer, like pruned_file_count
    pruned = ft.files(("in", "k", [5]))
    assert len(pruned) == 1
    assert {f.partition["k_bucket"] for f in pruned} == {bucket_value(5, 16)}


def test_runtime_prune_empty_dim_short_circuits(spark, tmp_path):
    cat = Catalog(str(tmp_path / "rte"))
    dim = spark.createDataFrame([(1, "a")], "k long, tag string")
    fact = spark.createDataFrame([(1, 10)], "k long, v long")
    cat.create_table("r.dim", dim.schema, partition_by=["bucket(4, k)"])
    cat.append("r.dim", spark, dim)
    cat.create_table("r.fact", fact.schema, partition_by=["bucket(4, k)"])
    cat.append("r.fact", spark, fact)
    spj = bucket_join(
        spark,
        cat.load("r.dim"),
        cat.load("r.fact"),
        "k",
        left_filters=("=", "tag", "nomatch"),
        runtime_prune="right",
    )
    assert spj.count() == 0


def test_runtime_prune_refuses_outer(spark, wh):
    o8 = wh.load("spj.orders8")
    li16 = wh.load("spj.li16")
    with pytest.raises(BucketJoinError, match="unsafe"):
        bucket_join(
            spark,
            o8,
            li16,
            "o_orderkey",
            "l_orderkey",
            how="left",
            left_filters=("=", "o_orderstatus", "F"),
            runtime_prune="right",
        )


def test_new_gates_match_oracles(spark, duck, sf_dir):
    from datafusion_iceberg_spark import registry
    from tests.oracle_compare import compare

    registry.load_all_modules()
    for name in (
        "iceberg_bucket_agg_scan",
        "iceberg_bucket_composite_join_scan",
        "iceberg_bucket_wide_join_scan",
        "iceberg_bucket_join_pruned_scan",
    ):
        df = registry.QUERIES[name](spark, sf_dir)
        compare(df, duck.sql(registry.ORACLES[name]), name)


def test_ivf_append_preserves_probe_pruning(spark, sf_dir):
    """Incremental appends land in identity(cent_id) partitions, so the
    planning-time inverted-file lookup keeps pruning: a probe list opens
    only the probed clusters' files, base AND appended."""
    from datafusion_iceberg_spark.extensions.similarity import (
        _ivf_append_fixture,
    )

    store = _ivf_append_fixture(spark, sf_dir).load("ann.ivfa")
    n_all = len(store.files())
    pruned = store.files(("in", "cent_id", [5, 6]))
    assert 0 < len(pruned) < n_all
    assert {f.partition["cent_id"] for f in pruned} <= {5, 6}
    # appended files exist in the pruned listing's clusters too: the
    # store has base + appended files per occupied cluster
    per_cluster: dict = {}
    for f in store.files():
        per_cluster.setdefault(f.partition["cent_id"], 0)
        per_cluster[f.partition["cent_id"]] += 1
    assert max(per_cluster.values()) >= 2  # base file + appended file


@pytest.mark.parametrize("how", ["left_semi", "left_anti"])
def test_bucket_semi_anti_match_plain(spark, tmp_path, how):
    """Semi/anti SPJ is byte-identical to the plain shuffling semi/anti
    join, including NULL keys (anti KEEPS them — they match nothing) and
    keys with no right-side files."""
    cat = Catalog(str(tmp_path / "sa"))
    left = spark.createDataFrame(
        [(1, "a"), (2, "b"), (None, "ln"), (3, "c"), (7, "g")],
        "k long, lv string",
    )
    right = spark.createDataFrame(
        [(1, "x"), (None, "rn"), (3, "y"), (3, "y2"), (4, "z")],
        "k long, rv string",
    )
    cat.create_table("s.l", left.schema, partition_by=["bucket(4, k)"])
    cat.append("s.l", spark, left)
    cat.create_table("s.r", right.schema, partition_by=["bucket(8, k)"])
    cat.append("s.r", spark, right)
    lt, rt = cat.load("s.l"), cat.load("s.r")
    spj = bucket_join(spark, lt, rt, "k", how=how)
    assert spj.columns == ["k", "lv"]  # left columns only
    plain = lt.to_df(spark).join(rt.to_df(spark), on=["k"], how=how)
    key = lambda t: tuple((v is None, v) for v in t)  # noqa: E731
    assert sorted(map(tuple, spj.collect()), key=key) == sorted(
        map(tuple, plain.collect()), key=key
    )
    plan = plan_string(spj)
    assert "SortMergeJoin" not in plan
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "k#" not in m.group(1)


def test_bucket_anti_runtime_prune_safe_and_left_refused(spark, tmp_path):
    from datafusion_iceberg_spark.iceberg.spj import BucketJoinError

    cat = Catalog(str(tmp_path / "sarp"))
    left = spark.createDataFrame(
        [(i, f"l{i}") for i in range(32)], "k long, lv string"
    )
    right = spark.createDataFrame(
        [(i, "hot" if i < 4 else "cold") for i in range(32)],
        "k long, tag string",
    )
    cat.create_table("s.l", left.schema, partition_by=["bucket(4, k)"])
    cat.append("s.l", spark, left)
    cat.create_table("s.r", right.schema, partition_by=["bucket(4, k)"])
    cat.append("s.r", spark, right)
    lt, rt = cat.load("s.l"), cat.load("s.r")
    anti = bucket_join(
        spark,
        lt,
        rt,
        "k",
        how="left_anti",
        right_filters=("=", "tag", "hot"),
        runtime_prune="right",
    )
    assert sorted(r.k for r in anti.collect()) == list(range(4, 32))
    with pytest.raises(BucketJoinError, match="unsafe"):
        bucket_join(
            spark, lt, rt, "k", how="left_anti", runtime_prune="left"
        )


def test_bucket_distinct_zero_exchange_and_exact(spark, tmp_path):
    from datafusion_iceberg_spark.iceberg.spj import (
        BucketJoinError,
        bucket_distinct,
    )

    cat = Catalog(str(tmp_path / "bd"))
    df = spark.createDataFrame(
        [(i % 10, i % 3) for i in range(200)] + [(None, 0)],
        "k long, g long",
    )
    cat.create_table("d.t", df.schema, partition_by=["bucket(4, k)"])
    cat.append("d.t", spark, df)
    t = cat.load("d.t")
    out = bucket_distinct(spark, t, ["k", "g"])
    assert "Exchange" not in plan_string(out)
    key = lambda r: tuple((v is None, v) for v in r)  # noqa: E731
    got = sorted(map(tuple, out.collect()), key=key)
    want = sorted(
        map(tuple, df.select("k", "g").distinct().collect()), key=key
    )
    assert got == want
    assert (None, 0) in got  # the NULL-key tuple survives
    with pytest.raises(BucketJoinError, match="straddle"):
        bucket_distinct(spark, t, ["g"])


def test_bucket_apply_window_zero_exchange(spark, tmp_path):
    """bucket_apply with a per-key window: rank computes branch-locally
    (SinglePartition satisfies the ClusteredDistribution), zero Exchange
    in the plan, results match the plain shuffling window."""
    from pyspark.sql import Window as W

    from datafusion_iceberg_spark.iceberg.spj import bucket_apply

    cat = Catalog(str(tmp_path / "bw"))
    df = spark.createDataFrame(
        [(i % 20, i, float(i % 7)) for i in range(400)],
        "k long, seq long, score double",
    )
    cat.create_table("w.t", df.schema, partition_by=["bucket(4, k)"])
    cat.append("w.t", spark, df)
    t = cat.load("w.t")

    def topk(d):
        w = W.partitionBy("k").orderBy(F.col("score").desc(), "seq")
        return d.withColumn("rn", F.row_number().over(w)).filter(
            F.col("rn") <= 3
        )

    out = bucket_apply(spark, t, "k", topk)
    assert "Exchange" not in plan_string(out)
    w = W.partitionBy("k").orderBy(F.col("score").desc(), "seq")
    want = (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .collect()
    )
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, want))


def test_semi_anti_distinct_window_gates_match_oracles(spark, duck, sf_dir):
    from datafusion_iceberg_spark import registry
    from tests.oracle_compare import compare

    registry.load_all_modules()
    for name in (
        "iceberg_bucket_anti_join_scan",
        "iceberg_bucket_distinct_scan",
        "iceberg_bucket_window_scan",
    ):
        df = registry.QUERIES[name](spark, sf_dir)
        compare(df, duck.sql(registry.ORACLES[name]), name)


def test_bucket_merge_semantics_and_file_carry(spark, tmp_path):
    """Upsert semantics (replace matched, insert unmatched, keep the
    rest), only the source-touched buckets rewrite (untouched files
    carry by PATH), and the rewrite frame carries no join-key Exchange."""
    from datafusion_iceberg_spark.iceberg.spj import (
        _bucket_merge_frame,
        bucket_merge,
    )
    from datafusion_iceberg_spark.iceberg.transforms import bucket_value

    cat = Catalog(str(tmp_path / "bm"))
    base = spark.createDataFrame(
        [(i, f"v{i}", float(i)) for i in range(100)],
        "k long, name string, val double",
    ).coalesce(1)
    cat.create_table("m.t", base.schema, partition_by=["bucket(8, k)"])
    cat.append("m.t", spark, base)
    before = {f.path: f.partition["k_bucket"] for f in cat.load("m.t").files()}
    src = spark.createDataFrame(
        [
            (0, "u0", 100.0),
            (5, "u5", 105.0),
            (200, "n200", 200.0),
            (None, "nn", -1.0),
        ],
        "k long, name string, val double",
    )
    frame, untouched, _ = _bucket_merge_frame(
        spark, cat.load("m.t"), src, "k", True, 64
    )
    for m in re.finditer(
        r"Exchange hashpartitioning\(([^)]*)\)", plan_string(frame)
    ):
        assert "k#" not in m.group(1)
    bucket_merge(spark, cat, "m.t", src, "k")
    t1 = cat.load("m.t")
    rows = {r.k: (r.name, r.val) for r in t1.to_df(spark).collect() if r.k is not None}
    assert rows[0] == ("u0", 100.0) and rows[5] == ("u5", 105.0)
    assert rows[200] == ("n200", 200.0)
    assert rows[1] == ("v1", 1.0) and len(rows) == 101
    nulls = [r for r in t1.to_df(spark).collect() if r.k is None]
    assert len(nulls) == 1 and nulls[0].name == "nn"
    after = {f.path: f.partition["k_bucket"] for f in t1.files()}
    carried = set(before) & set(after)
    touched = {bucket_value(k, 8) for k in (0, 5, 200)}
    assert carried and all(before[p] not in touched for p in carried)


def test_bucket_merge_update_only_and_refusals(spark, tmp_path):
    from datafusion_iceberg_spark.iceberg.spj import bucket_merge

    cat = Catalog(str(tmp_path / "bmr"))
    base = spark.createDataFrame(
        [(i, i * 10) for i in range(20)], "k long, v long"
    )
    cat.create_table("m.t", base.schema, partition_by=["bucket(4, k)"])
    cat.append("m.t", spark, base)
    # update-only: unmatched source keys do NOT insert
    src = spark.createDataFrame([(3, 999), (500, 1)], "k long, v long")
    bucket_merge(spark, cat, "m.t", src, "k", insert_not_matched=False)
    rows = {r.k: r.v for r in cat.load("m.t").to_df(spark).collect()}
    assert rows[3] == 999 and 500 not in rows and len(rows) == 20
    # duplicate source keys refuse (SQL MERGE cardinality rule)
    dup = spark.createDataFrame([(1, 1), (1, 2)], "k long, v long")
    with pytest.raises(BucketJoinError, match="duplicate"):
        bucket_merge(spark, cat, "m.t", dup, "k")
    # unbucketed target refuses
    flat = spark.createDataFrame([(1, 1)], "k long, v long")
    cat.create_table("m.flat", flat.schema)
    cat.append("m.flat", spark, flat)
    with pytest.raises(BucketJoinError, match="not bucket-partitioned"):
        bucket_merge(spark, cat, "m.flat", src, "k")


def test_bucket_merge_folds_outstanding_mor_deletes(spark, tmp_path):
    """A MOR delete targeting an UNTOUCHED bucket's file must rewrite
    masked (the _carry=False rule): the deleted rows stay gone after the
    merge commit."""
    from datafusion_iceberg_spark.iceberg.spj import bucket_merge
    from datafusion_iceberg_spark.iceberg.transforms import bucket_value

    cat = Catalog(str(tmp_path / "bmd"))
    base = spark.createDataFrame(
        [(i, i * 10) for i in range(64)], "k long, v long"
    ).coalesce(1)
    cat.create_table("m.t", base.schema, partition_by=["bucket(8, k)"])
    cat.append("m.t", spark, base)
    # delete a key that lives in a bucket the merge source won't touch
    tgt_bucket = bucket_value(7, 8)
    victim = next(
        k for k in range(8, 64) if bucket_value(k, 8) != tgt_bucket
    )
    cat.delete_where_mor("m.t", spark, ("=", "k", victim))
    src = spark.createDataFrame([(7, 777)], "k long, v long")
    bucket_merge(spark, cat, "m.t", src, "k")
    rows = {r.k: r.v for r in cat.load("m.t").to_df(spark).collect()}
    assert victim not in rows
    assert rows[7] == 777
    assert len(rows) == 63
    # and the new snapshot carries no delete manifests at all
    t1 = cat.load("m.t")
    assert not t1.position_delete_files()


def test_bucket_merge_gate_matches_oracle(spark, duck, sf_dir):
    from datafusion_iceberg_spark import registry
    from tests.oracle_compare import compare

    registry.load_all_modules()
    name = "iceberg_bucket_merge_scan"
    compare(
        registry.QUERIES[name](spark, sf_dir),
        duck.sql(registry.ORACLES[name]),
        name,
    )


def test_bucket_merge_order_by_out_of_order_safe(spark, tmp_path):
    """order_by conflict rule: an OLDER source row cannot regress newer
    target state; ties go to the source; the rewrite frame stays
    Exchange-free (key-local window over a single-partition branch)."""
    from datafusion_iceberg_spark.iceberg.spj import (
        _bucket_merge_frame,
        bucket_merge,
    )

    cat = Catalog(str(tmp_path / "bmo"))
    base = spark.createDataFrame(
        [(i, 100, f"v{i}") for i in range(20)], "k long, ts long, name string"
    ).coalesce(1)
    cat.create_table("m.t", base.schema, partition_by=["bucket(4, k)"])
    cat.append("m.t", spark, base)
    src = spark.createDataFrame(
        [(3, 200, "new3"), (5, 50, "old5"), (99, 10, "n99")],
        "k long, ts long, name string",
    )
    frame, _, _ = _bucket_merge_frame(
        spark, cat.load("m.t"), src, "k", True, 64, order_by=["ts"]
    )
    # broadcast exchanges (the source-key probes) are fine; the claim
    # is no SHUFFLE exchange anywhere
    assert "Exchange hashpartitioning" not in plan_string(frame)
    assert "Exchange rangepartitioning" not in plan_string(frame)
    bucket_merge(spark, cat, "m.t", src, "k", order_by=["ts"])
    rows = {r.k: (r.ts, r.name) for r in cat.load("m.t").to_df(spark).collect()}
    assert rows[3] == (200, "new3")   # newer source won
    assert rows[5] == (100, "v5")     # older source lost
    assert rows[99] == (10, "n99")    # insert
    assert len(rows) == 21
    bucket_merge(
        spark,
        cat,
        "m.t",
        spark.createDataFrame([(3, 200, "tie3")], "k long, ts long, name string"),
        "k",
        order_by=["ts"],
    )
    rows = {r.k: r.name for r in cat.load("m.t").to_df(spark).collect()}
    assert rows[3] == "tie3"  # tie -> source wins


def test_hive_discovery_fast_path_matches_per_group_reads(spark, tmp_path, monkeypatch):
    """Directory-only identity layouts read via ONE partition-discovery
    call (fast path) — byte-identical to the per-group literal-attach
    path, which stays the fallback for anything the fast path cannot
    prove."""
    from datafusion_iceberg_spark.iceberg import table as tbl_mod

    cat = Catalog(str(tmp_path / "hd"))
    df = spark.createDataFrame(
        [(i, i % 5, f"v{i}") for i in range(100)], "k long, g int, s string"
    ).coalesce(1)
    cat.create_table("h.t", df.schema, partition_by=["bucket(4, k)", "g"])
    cat.append("h.t", spark, df)
    t = cat.load("h.t")
    fast = sorted(map(tuple, t.to_df(spark).collect()))
    monkeypatch.setattr(
        tbl_mod, "_hive_discovery_read", lambda *a, **k: None
    )
    slow = sorted(map(tuple, t.to_df(spark).collect()))
    assert fast == slow
    assert len(fast) == 100
    # filters still exact through the fast path
    got = sorted(
        r.k for r in t.to_df(spark, filters=("=", "g", 3)).collect()
    )
    assert got == [i for i in range(100) if i % 5 == 3]


def test_bucket_merge_differential_vs_plain_merge(spark, tmp_path):
    """Semantics proof: bucket_merge (replace-on-match upsert) equals
    writer.merge with an all-columns UPDATE SET on two identical tables
    fed the same source — row-for-row, including inserts."""
    cat = Catalog(str(tmp_path / "bmdiff"))
    rows = [(i, f"v{i}", float(i * 3 % 17)) for i in range(200)]
    base = spark.createDataFrame(rows, "k long, name string, val double")
    for ident in ("d.bucketed", "d.plain"):
        cat.create_table(
            ident,
            base.schema,
            partition_by=["bucket(8, k)"] if ident == "d.bucketed" else None,
        )
        cat.append(ident, spark, base)
    src = spark.createDataFrame(
        [(k, f"u{k}", float(k)) for k in range(0, 200, 7)]
        + [(1000 + k, f"n{k}", -1.0) for k in range(5)],
        "k long, name string, val double",
    )
    from datafusion_iceberg_spark.iceberg.spj import bucket_merge

    bucket_merge(spark, cat, "d.bucketed", src, "k")
    cat.merge_into(
        "d.plain",
        spark,
        src,
        "k",
        when_matched_set={
            "k": "src.k",
            "name": "src.name",
            "val": "src.val",
        },
        insert_not_matched=True,
    )
    a = sorted(map(tuple, cat.load("d.bucketed").to_df(spark).collect()))
    b = sorted(map(tuple, cat.load("d.plain").to_df(spark).collect()))
    assert a == b
    assert len(a) == 205


def test_identity_keyed_spa_zero_exchange(spark, tmp_path):
    """r14 generalization: bucket_agg / bucket_distinct accept an
    IDENTITY-partitioned key (date/region layouts) — same zero-Exchange
    plan, groups keyed by the exact partition value."""
    from datafusion_iceberg_spark.iceberg.spj import (
        bucket_agg,
        bucket_distinct,
    )

    cat = Catalog(str(tmp_path / "idspa"))
    df = spark.createDataFrame(
        [(i % 6, i, i % 4) for i in range(300)], "region long, v long, tag long"
    )
    cat.create_table("i.t", df.schema, partition_by=["region"])
    cat.append("i.t", spark, df)
    t = cat.load("i.t")
    agg = bucket_agg(
        spark, t, ["region"], [F.sum("v").alias("s"), F.count("v").alias("n")]
    )
    assert "Exchange" not in plan_string(agg)
    got = sorted(map(tuple, agg.collect()))
    want = sorted(
        map(
            tuple,
            df.groupBy("region")
            .agg(F.sum("v").alias("s"), F.count("v").alias("n"))
            .collect(),
        )
    )
    assert got == want
    d = bucket_distinct(spark, t, ["region", "tag"])
    assert "Exchange" not in plan_string(d)
    assert sorted(map(tuple, d.collect())) == sorted(
        map(tuple, df.select("region", "tag").distinct().collect())
    )


def test_ivf_recluster_preserves_pruning_and_balances(spark, sf_dir):
    """After the Lloyd step the store still prunes by cent_id at
    planning time, holds every vector exactly once, and the gate's
    oracle replays the full build -> recluster pipeline."""
    from datafusion_iceberg_spark import registry
    from datafusion_iceberg_spark.extensions.similarity import (
        _ivf_recluster_fixture,
    )

    registry.load_all_modules()
    cat = _ivf_recluster_fixture(spark, sf_dir)
    store = cat.load("ann.ivfr")
    n_all = len(store.files())
    probed = sorted({f.partition["cent_id"] for f in store.files()})[:2]
    pruned = store.files(("in", "cent_id", probed))
    assert 0 < len(pruned) < n_all
    assert {f.partition["cent_id"] for f in pruned} <= set(probed)
    df = store.to_df(spark)
    assert df.count() == df.select("cand_id").distinct().count()


def test_ivf_recluster_gate_matches_oracle(spark, duck, sf_dir):
    from datafusion_iceberg_spark import registry
    from tests.oracle_compare import compare

    registry.load_all_modules()
    name = "sim_ivf_recluster_report"
    compare(
        registry.QUERIES[name](spark, sf_dir),
        duck.sql(registry.ORACLES[name]),
        name,
    )


def test_identity_agg_gate_matches_oracle_and_plan(spark, duck, sf_dir):
    from datafusion_iceberg_spark import registry
    from tests.oracle_compare import compare

    registry.load_all_modules()
    name = "iceberg_identity_agg_scan"
    df = registry.QUERIES[name](spark, sf_dir)
    compare(df, duck.sql(registry.ORACLES[name]), name)
    # zero Exchange hashpartitioning on the group key anywhere (the
    # orderBy's rangepartitioning over ~5 rows is the only residual)
    plan = plan_string(df)
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "event_type" not in m.group(1)


@pytest.mark.parametrize(
    "lw,rw",
    [(100, 100), (100, 200)],  # same width; finer folds onto coarser
)
def test_truncate_int_spj_matches_plain(spark, tmp_path, lw, rw):
    """Integer truncate[W] positions: values fold onto the coarser grid
    when the finer width divides it — shuffle-free join over
    truncate-partitioned tables, byte-identical to the plain join."""
    cat = Catalog(str(tmp_path / f"tr{lw}_{rw}"))
    left = spark.createDataFrame(
        [(i, f"l{i}") for i in range(0, 1000, 7)], "k long, lv string"
    ).coalesce(1)
    right = spark.createDataFrame(
        [(i, f"r{i}") for i in range(0, 1000, 3)], "k long, rv string"
    ).coalesce(1)
    cat.create_table(
        "t.l", left.schema, partition_by=[f"truncate({lw}, k)"]
    )
    cat.append("t.l", spark, left)
    cat.create_table(
        "t.r", right.schema, partition_by=[f"truncate({rw}, k)"]
    )
    cat.append("t.r", spark, right)
    lt, rt = cat.load("t.l"), cat.load("t.r")
    spj = bucket_join(spark, lt, rt, "k")
    plain = lt.to_df(spark).join(rt.to_df(spark), on=["k"], how="inner")
    assert sorted(map(tuple, spj.select(*plain.columns).collect())) == sorted(
        map(tuple, plain.collect())
    )
    plan = plan_string(spj)
    assert "SortMergeJoin" not in plan
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "k#" not in m.group(1)


def test_truncate_string_spj_and_incompatible_int_refuses(spark, tmp_path):
    from datafusion_iceberg_spark.iceberg.spj import BucketJoinError

    cat = Catalog(str(tmp_path / "trs"))
    words = ["alpha", "alpine", "beta", "bet", "gamma", "go", "golang"]
    left = spark.createDataFrame(
        [(w, f"l{w}") for w in words], "k string, lv string"
    )
    right = spark.createDataFrame(
        [(w, f"r{w}") for w in words + ["delta"]], "k string, rv string"
    )
    cat.create_table("s.l", left.schema, partition_by=["truncate(2, k)"])
    cat.append("s.l", spark, left)
    cat.create_table("s.r", right.schema, partition_by=["truncate(3, k)"])
    cat.append("s.r", spark, right)
    lt, rt = cat.load("s.l"), cat.load("s.r")
    spj = bucket_join(spark, lt, rt, "k")
    plain = lt.to_df(spark).join(rt.to_df(spark), on=["k"], how="inner")
    assert sorted(map(tuple, spj.select(*plain.columns).collect())) == sorted(
        map(tuple, plain.collect())
    )
    # integer widths that divide neither way refuse
    ints_l = spark.createDataFrame([(1, "a")], "k long, lv string")
    ints_r = spark.createDataFrame([(1, "b")], "k long, rv string")
    cat.create_table("s.il", ints_l.schema, partition_by=["truncate(100, k)"])
    cat.append("s.il", spark, ints_l)
    cat.create_table("s.ir", ints_r.schema, partition_by=["truncate(150, k)"])
    cat.append("s.ir", spark, ints_r)
    with pytest.raises(BucketJoinError, match="incompatible truncate"):
        bucket_join(spark, cat.load("s.il"), cat.load("s.ir"), "k")


def test_temporal_spj_day_vs_month_matches_plain(spark, tmp_path):
    """Temporal positions: day(ts) on one side folds onto month(ts) on
    the other — a timestamp-keyed join over date-partitioned tables
    with zero shuffle Exchange on the key."""
    import datetime as dt

    cat = Catalog(str(tmp_path / "tmp1"))
    stamps = [
        dt.datetime(2024, m, d, h)
        for m in (1, 2, 3)
        for d in (1, 15, 28)
        for h in (0, 12)
    ]
    left = spark.createDataFrame(
        [(t, f"l{i}") for i, t in enumerate(stamps)], "ts timestamp, lv string"
    ).coalesce(1)
    right = spark.createDataFrame(
        [(t, f"r{i}") for i, t in enumerate(stamps[::2])],
        "ts timestamp, rv string",
    ).coalesce(1)
    cat.create_table("t.l", left.schema, partition_by=["day(ts)"])
    cat.append("t.l", spark, left)
    cat.create_table("t.r", right.schema, partition_by=["month(ts)"])
    cat.append("t.r", spark, right)
    lt, rt = cat.load("t.l"), cat.load("t.r")
    spj = bucket_join(spark, lt, rt, "ts")
    plain = lt.to_df(spark).join(rt.to_df(spark), on=["ts"], how="inner")
    assert sorted(map(tuple, spj.select(*plain.columns).collect())) == sorted(
        map(tuple, plain.collect())
    )
    assert len(plain.collect()) > 0
    plan = plan_string(spj)
    assert "SortMergeJoin" not in plan
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "ts#" not in m.group(1)


def test_temporal_fold_hierarchy_exact():
    from datafusion_iceberg_spark.iceberg.spj import _temporal_fold

    # 2024-02-15 is day 19768 from epoch; month index (2024-1970)*12+1
    assert _temporal_fold(19768, "day", "month") == (2024 - 1970) * 12 + 1
    assert _temporal_fold(19768, "day", "year") == 54
    assert _temporal_fold(19768 * 24 + 7, "hour", "day") == 19768
    assert _temporal_fold(-1, "hour", "day") == -1  # pre-epoch floors
    assert _temporal_fold((2024 - 1970) * 12 + 1, "month", "year") == 54
    assert _temporal_fold(-13, "month", "year") == -2


def test_temporal_backed_spa_zero_exchange(spark, tmp_path):
    """groupBy(ts) over a day(ts)-partitioned table: the transform is a
    function of the key, so per-key aggregation is branch-local — the
    date-partitioned fact-table rollup with zero Exchange."""
    import datetime as dt

    from datafusion_iceberg_spark.iceberg.spj import bucket_agg

    cat = Catalog(str(tmp_path / "tspa"))
    rows = [
        (dt.datetime(2024, 1, 1 + (i % 9), i % 24), i) for i in range(400)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, v long")
    cat.create_table("t.t", df.schema, partition_by=["day(ts)"])
    cat.append("t.t", spark, df)
    t = cat.load("t.t")
    agg = bucket_agg(
        spark, t, ["ts"], [F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")]
    )
    assert "Exchange" not in plan_string(agg)
    got = sorted(map(tuple, agg.collect()))
    want = sorted(
        map(
            tuple,
            df.groupBy("ts")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
            .collect(),
        )
    )
    assert got == want


def test_temporal_join_gate_matches_oracle(spark, duck, sf_dir):
    from datafusion_iceberg_spark import registry
    from tests.oracle_compare import compare

    registry.load_all_modules()
    name = "iceberg_temporal_join_scan"
    df = registry.QUERIES[name](spark, sf_dir)
    compare(df, duck.sql(registry.ORACLES[name]), name)
    plan = plan_string(df)
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "ts#" not in m.group(1)


def test_truncate_join_gate_matches_oracle(spark, duck, sf_dir):
    from datafusion_iceberg_spark import registry
    from tests.oracle_compare import compare

    registry.load_all_modules()
    name = "iceberg_truncate_join_scan"
    df = registry.QUERIES[name](spark, sf_dir)
    compare(df, duck.sql(registry.ORACLES[name]), name)
    plan = plan_string(df)
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "p_partkey" not in m.group(1)


def test_runtime_prune_on_temporal_only_key(spark, tmp_path):
    """Review fix: runtime_prune over a key with NO bucket position
    (temporal/truncate-only SPJ) must prune via that transform, not
    crash with StopIteration."""
    import datetime as dt

    cat = Catalog(str(tmp_path / "rtt"))
    stamps = [dt.datetime(2024, 1, d, 6) for d in range(1, 11)]
    left = spark.createDataFrame(
        [(t, "hot" if t.day == 3 else "cold") for t in stamps],
        "ts timestamp, tag string",
    ).coalesce(1)
    right = spark.createDataFrame(
        [(t, i) for i, t in enumerate(stamps)], "ts timestamp, v long"
    ).coalesce(1)
    cat.create_table("t.l", left.schema, partition_by=["day(ts)"])
    cat.append("t.l", spark, left)
    cat.create_table("t.r", right.schema, partition_by=["day(ts)"])
    cat.append("t.r", spark, right)
    lt, rt = cat.load("t.l"), cat.load("t.r")
    spj = bucket_join(
        spark,
        lt,
        rt,
        "ts",
        left_filters=("=", "tag", "hot"),
        runtime_prune="right",
    )
    rows = spj.collect()
    assert len(rows) == 1 and rows[0].v == 2
    # catalog fallback path also survives (no bare StopIteration)
    from datafusion_iceberg_spark.iceberg.spj import catalog_bucket_join

    df = catalog_bucket_join(
        cat, spark, "t.l", "t.r", "ts", fallback=True,
        left_filters=("=", "tag", "hot"), runtime_prune="right",
    )
    assert df.count() == 1


def test_runtime_prune_anti_all_null_left_keeps_rows(spark, tmp_path):
    """Review fix: left_anti + runtime_prune with an all-NULL-key left
    side keeps EVERY left row (nothing can match), instead of returning
    an empty frame."""
    cat = Catalog(str(tmp_path / "rtn"))
    left = spark.createDataFrame(
        [(None, "a"), (None, "b")], "k long, lv string"
    )
    right = spark.createDataFrame([(1, "x")], "k long, rv string")
    cat.create_table("n.l", left.schema, partition_by=["bucket(4, k)"])
    cat.append("n.l", spark, left)
    cat.create_table("n.r", right.schema, partition_by=["bucket(4, k)"])
    cat.append("n.r", spark, right)
    anti = bucket_join(
        spark,
        cat.load("n.l"),
        cat.load("n.r"),
        "k",
        how="left_anti",
        runtime_prune="right",
    )
    assert sorted(r.lv for r in anti.collect()) == ["a", "b"]


def test_bucket_merge_order_by_preserves_untouched_duplicate_keys(
    spark, tmp_path
):
    """Review fix: with order_by, legitimate duplicate-key target rows
    whose key the batch never touches pass through UNCHANGED; on a
    source-touched key both modes collapse to the single winner (the
    keyed-upsert contract)."""
    from datafusion_iceberg_spark.iceberg.spj import bucket_merge

    cat = Catalog(str(tmp_path / "bmdup"))
    base = spark.createDataFrame(
        [(1, 100, "a1"), (1, 100, "a2"), (2, 100, "b"), (3, 100, "c")],
        "k long, ts long, name string",
    ).coalesce(1)
    cat.create_table("m.t", base.schema, partition_by=["bucket(2, k)"])
    cat.append("m.t", spark, base)
    src = spark.createDataFrame([(3, 200, "c2")], "k long, ts long, name string")
    bucket_merge(spark, cat, "m.t", src, "k", order_by=["ts"])
    rows = sorted(
        (r.k, r.ts, r.name) for r in cat.load("m.t").to_df(spark).collect()
    )
    assert rows == [
        (1, 100, "a1"),
        (1, 100, "a2"),  # untouched duplicate-key rows both survive
        (2, 100, "b"),
        (3, 200, "c2"),
    ]


def test_timestamp_ns_temporal_spj_folds_and_refuses(spark, tmp_path):
    """VERDICT r14 #8: v3 timestamp_ns columns are carried as raw int64
    nanos, so temporal partition transforms must SCALE the nanos domain
    before folding (exact integer floor-division — no double carrier).
    A day-partitioned ns table joins a month-partitioned ns pair
    shuffle-free and byte-identical to the plain join (day folds onto
    month through negative pre-epoch values too); a temporal transform
    on a NON-ns integral column refuses with the type named instead of
    surfacing Spark's opaque CAST_INVALID_INPUT mid-write."""
    from pyspark.sql import types as T

    DAY = 86_400_000_000_000
    cat = Catalog(str(tmp_path / "nswh"))
    sa = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("ts", T.LongType())]
    )
    cat.create_table(
        "ns.a", sa, partition_by=["day(ts)"], iceberg_types={"ts": "timestamp_ns"}
    )
    cat.append(
        "ns.a",
        spark,
        spark.createDataFrame(
            [(1, DAY + 5), (2, 2 * DAY + 7), (3, -DAY + 3), (4, 40 * DAY)], sa
        ),
    )
    sb = T.StructType(
        [T.StructField("ts", T.LongType()), T.StructField("v", T.LongType())]
    )
    cat.create_table(
        "ns.b", sb, partition_by=["month(ts)"], iceberg_types={"ts": "timestamp_ns"}
    )
    cat.append(
        "ns.b",
        spark,
        spark.createDataFrame(
            [(DAY + 5, 100), (40 * DAY, 200), (-DAY + 3, 300)], sb
        ),
    )
    ta, tb = cat.load("ns.a"), cat.load("ns.b")
    # write path produced day-domain ints (incl. the floored pre-epoch day)
    days = sorted(f.partition["ts_day"] for f in ta.files(None, spark=spark))
    assert days == [-1, 1, 2, 40]
    months = sorted(f.partition["ts_month"] for f in tb.files(None, spark=spark))
    assert months == [-1, 0, 1]
    j = bucket_join(spark, ta, tb, "ts", "ts")
    plain = (
        ta.to_df(spark)
        .join(
            tb.to_df(spark).withColumnRenamed("ts", "ts2"),
            F.col("ts") == F.col("ts2"),
        )
        .select(*j.columns)
    )
    got = sorted(map(tuple, j.collect()))
    assert got == sorted(map(tuple, plain.collect()))
    assert len(got) == 3
    plan = plan_string(j)
    assert "Exchange hashpartitioning" not in plan
    # non-ns integral refusal, type named
    cat.create_table("ns.bad", sa, partition_by=["day(id)"])
    with pytest.raises(ValueError, match="iceberg type 'long'"):
        cat.append(
            "ns.bad", spark, spark.createDataFrame([(1, DAY)], sa)
        )


def test_bucket_join_chain_three_way(spark, wh, sf_dir, tmp_path):
    """Multi-way SPJ (VERDICT r14 #5): three co-partitioned tables with
    distinct bucket counts (8, 16, 4 — all fold onto the 4-grid) join
    over ONE shared branch decomposition: zero join-key Exchange,
    byte-identical to the plain chained join."""
    from datafusion_iceberg_spark.iceberg.spj import bucket_join_chain

    cat = Catalog(str(tmp_path / "chain"))
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderstatus"
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice"
    )
    third = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("r_orderkey"),
        F.col("o_orderpriority").alias("r_pri"),
    )
    cat.create_table(
        "c.o8", orders.schema, partition_by=["bucket(8, o_orderkey)"]
    )
    cat.append("c.o8", spark, orders)
    cat.create_table(
        "c.l16", li.schema, partition_by=["bucket(16, l_orderkey)"]
    )
    cat.append("c.l16", spark, li)
    cat.create_table(
        "c.r4", third.schema, partition_by=["bucket(4, r_orderkey)"]
    )
    cat.append("c.r4", spark, third)
    t0, t1, t2 = cat.load("c.o8"), cat.load("c.l16"), cat.load("c.r4")
    j = bucket_join_chain(
        spark, [t0, t1, t2], ["o_orderkey", "l_orderkey", "r_orderkey"]
    )
    plan = plan_string(j)
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "orderkey" not in m.group(1)
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 4  # 2 joins x >= 2 branches
    plain = (
        t0.to_df(spark)
        .join(t1.to_df(spark), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t2.to_df(spark), F.col("l_orderkey") == F.col("r_orderkey"))
        .select(*j.columns)
    )
    got = sorted(map(tuple, j.collect()))
    assert got == sorted(map(tuple, plain.collect()))
    assert len(got) > 0


def test_bucket_join_chain_same_name_dedup_and_refusals(spark, tmp_path):
    from pyspark.sql import types as T

    from datafusion_iceberg_spark.iceberg.spj import bucket_join_chain

    cat = Catalog(str(tmp_path / "chain2"))
    mk = lambda name, vcol, n, rows: (
        cat.create_table(
            name,
            T.StructType(
                [
                    T.StructField("k", T.LongType()),
                    T.StructField(vcol, T.LongType()),
                ]
            ),
            partition_by=[f"bucket({n}, k)"],
        ),
        cat.append(
            name, spark, spark.createDataFrame(rows, f"k long, {vcol} long")
        ),
    )
    mk("c.s1", "v1", 4, [(1, 10), (2, 20), (3, 30)])
    mk("c.s2", "v2", 8, [(1, 100), (3, 300)])
    mk("c.s3", "v3", 2, [(1, 1000), (3, 3000), (4, 4)])
    js = bucket_join_chain(
        spark,
        [cat.load("c.s1"), cat.load("c.s2"), cat.load("c.s3")],
        ["k", "k", "k"],
    )
    assert js.columns == ["k", "v1", "v2", "v3"]  # same-name keys dedup
    assert sorted(map(tuple, js.collect())) == [
        (1, 10, 100, 1000),
        (3, 30, 300, 3000),
    ]
    assert "Exchange hashpartitioning" not in plan_string(js)
    # counts that do not all fold onto the minimum refuse: (4, 8, 3)
    mk("c.s4", "v4", 3, [(1, 5)])
    with pytest.raises(BucketJoinError, match="incompatible bucket counts"):
        bucket_join_chain(
            spark,
            [cat.load("c.s1"), cat.load("c.s2"), cat.load("c.s4")],
            ["k", "k", "k"],
        )
    # duplicate non-key column name refuses
    mk("c.s5", "v1", 4, [(1, 7)])
    with pytest.raises(BucketJoinError, match="repeats column names"):
        bucket_join_chain(
            spark,
            [cat.load("c.s1"), cat.load("c.s5")],
            ["k", "k"],
        )


def test_bucket_join_via_ds_matches_and_partitions_align(spark, wh):
    """VERDICT r14 #6: ``via_ds=True`` reads each branch side through
    the Python DataSource — one InputPartition per bucket group inside
    the branch (the streaming/CDC split handoff) — and matches the
    default ``_scan_files`` path byte-for-byte."""
    from datafusion_iceberg_spark.sources.iceberg_datasource import (
        _plan_files,
        register_iceberg_datasource,
    )

    o8 = wh.load("spj.orders8")
    li16 = wh.load("spj.li16")
    ds = bucket_join(
        spark, o8, li16, "o_orderkey", "l_orderkey", via_ds=True,
        left_filters=("=", "o_orderstatus", "F"),
    )
    plain = bucket_join(
        spark, o8, li16, "o_orderkey", "l_orderkey",
        left_filters=("=", "o_orderstatus", "F"),
    )
    got = sorted(map(tuple, ds.select(*plain.columns).collect()))
    want = sorted(map(tuple, plain.collect()))
    assert got == want and len(got) > 0
    plan = plan_string(ds)
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "orderkey" not in m.group(1)
    assert "BatchScan iceberg_py" in plan
    # per-branch InputPartition counts: a full-table DS plan grouped by
    # the bucket column yields exactly one partition per occupied group
    register_iceberg_datasource(spark)
    parts = _plan_files(o8, None, apply_deletes=True, group_by="o_orderkey")
    groups = {
        f.partition["o_orderkey_bucket"]
        for f in o8.files(None, spark=spark)
    }
    assert len(parts) == len(groups)
