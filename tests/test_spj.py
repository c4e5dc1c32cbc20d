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


def test_bucket_join_plan_has_zero_exchange_on_join_keys(spark, wh):
    """THE property: no shuffle Exchange hash-partitioning on the join
    keys anywhere in the plan — the join runs as a Union of per-bucket
    BroadcastHashJoins over per-bucket file groups."""
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
    with pytest.raises(BucketJoinError, match="inner/left/right/full"):
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
    assert plan.count("BroadcastHashJoin") >= 2


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
