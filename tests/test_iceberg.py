"""Iceberg layer tests.

Tier 1 (SURVEY.md §5 item 3a): metadata reader against the reference's
committed nyc/taxis fixture (read-only at /root/reference) — 4 files,
typed partition values {1,2}, stats keyed by field ID.
Tier 2: pruning kernel cases (predicate × bounds → keep/skip; unknown ⇒
keep) + the three reference bugs of SURVEY.md §4.4 as regressions on OUR
code.  Tier 3: write→read round-trip, time travel, views, catalog.
"""

from __future__ import annotations

import os
import shutil

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from datafusion_iceberg_spark.iceberg.avro import read_avro_file, write_avro_file
from datafusion_iceberg_spark.iceberg.catalog import Catalog
from datafusion_iceberg_spark.iceberg.pruning import ColumnStats, evaluate
from datafusion_iceberg_spark.iceberg.table import IcebergTable
from datafusion_iceberg_spark.iceberg.view import IcebergView

FIXTURE = "/root/reference/datafusion_iceberg/tests/home/iceberg/warehouse/nyc/taxis"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(FIXTURE), reason="reference fixture unavailable"
)

SCRATCH = "/root/repo/.scratch"


@pytest.fixture()
def scratch(tmp_path_factory):
    d = tmp_path_factory.mktemp("iceberg")
    yield str(d)
    shutil.rmtree(d, ignore_errors=True)


# ---------------------------------------------------------------------------
# Tier 1: fixture metadata reader
# ---------------------------------------------------------------------------


def test_fixture_file_listing():
    t = IcebergTable.load(FIXTURE)
    files = t.files()
    assert len(files) == 4
    assert sorted(f.partition["vendor_id"] for f in files) == [1, 1, 2, 2]
    assert all(f.record_count == 1 for f in files)
    # stats maps keyed by 1-based field ID (not 0-based position)
    for f in files:
        assert set(f.lower_bounds) == {1, 2, 3, 4, 5}


def test_fixture_partition_values_native_types():
    """Reference bug #4 regression: partition values must stay native-typed
    (the reference JSON-stringifies them → GROUP BY groups on '1' not 1)."""
    t = IcebergTable.load(FIXTURE)
    for f in t.files():
        assert isinstance(f.partition["vendor_id"], int)


def test_fixture_statistics_rows_not_files():
    """Reference bug #2 regression: num_rows from added_rows_count, not
    added_files_count."""
    t = IcebergTable.load(FIXTURE)
    stats = t.statistics()
    assert stats["num_rows"] == 4
    assert stats["num_files"] == 4
    assert stats["is_exact"] is True
    assert stats["total_bytes"] > 0


def test_fixture_pruning_by_field_id():
    """Reference bug #1 regression: bounds lookups keyed by field ID.
    trip_distance is field 3 (position 2); a positional lookup would fetch
    trip_id's bounds and never prune on distance."""
    t = IcebergTable.load(FIXTURE)
    assert len(t.files(filters=("=", "vendor_id", 1))) == 2
    assert len(t.files(filters=("=", "vendor_id", 99))) == 0
    assert len(t.files(filters=(">", "trip_distance", 3.0))) == 1
    assert len(t.files(filters=(">", "trip_distance", 100.0))) == 0
    # conservative: unknown column/operator keeps everything
    assert len(t.files(filters=("=", "no_such_column", 7))) == 4


def test_fixture_scan_end_to_end(spark):
    """The reference's own test query (table.rs:329-335): GROUP BY
    vendor_id, MIN(trip_distance) → 1.8 (vendor 1), 0.9 (vendor 2)."""
    t = IcebergTable.load(FIXTURE)
    df = t.to_df(spark)
    df.createOrReplaceTempView("nyc_taxis")
    rows = spark.sql(
        "SELECT vendor_id, MIN(trip_distance) AS min_trip_distance "
        "FROM nyc_taxis GROUP BY vendor_id ORDER BY vendor_id"
    ).collect()
    assert [r.vendor_id for r in rows] == [1, 2]
    assert abs(rows[0].min_trip_distance - 1.8) < 1e-6
    assert abs(rows[1].min_trip_distance - 0.9) < 1e-6


def test_fixture_scan_with_pruning_filter(spark):
    t = IcebergTable.load(FIXTURE)
    df = t.to_df(spark, filters=("=", "vendor_id", 1))
    rows = df.collect()
    assert len(rows) == 2
    assert all(r.vendor_id == 1 for r in rows)


# ---------------------------------------------------------------------------
# Tier 2: pruning kernel unit cases
# ---------------------------------------------------------------------------


def _st(lo, hi, nulls=0, count=10):
    return {"x": ColumnStats(lo, hi, nulls, count)}


@pytest.mark.parametrize(
    "pred,stats,expect_skip",
    [
        (("=", "x", 5), _st(1, 3), True),
        (("=", "x", 2), _st(1, 3), False),
        (("<", "x", 1), _st(1, 3), True),
        (("<=", "x", 1), _st(1, 3), False),
        ((">", "x", 3), _st(1, 3), True),
        ((">=", "x", 3), _st(1, 3), False),
        (("between", "x", 4, 9), _st(1, 3), True),
        (("between", "x", 3, 9), _st(1, 3), False),
        (("in", "x", [4, 5]), _st(1, 3), True),
        (("in", "x", [3, 5]), _st(1, 3), False),
        (("isnull", "x"), _st(1, 3, nulls=0), True),
        (("isnull", "x"), _st(1, 3, nulls=2), False),
        (("notnull", "x"), _st(None, None, nulls=10, count=10), True),
        (("and", ("=", "x", 2), (">", "x", 5)), _st(1, 3), True),
        (("or", ("=", "x", 9), (">", "x", 2)), _st(1, 3), False),
        # unknown bounds ⇒ keep (conservative)
        (("=", "x", 5), _st(None, None), False),
        (("=", "y", 5), _st(1, 3), False),  # no stats for column
    ],
)
def test_pruning_kernel(pred, stats, expect_skip):
    assert (evaluate(pred, stats) is False) == expect_skip


def test_avro_roundtrip(scratch):
    schema = {
        "type": "record",
        "name": "rec",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": ["null", "string"], "default": None},
            {"name": "c", "type": {"type": "array", "items": "double"}},
            {"name": "d", "type": {"type": "map", "values": "bytes"}},
        ],
    }
    records = [
        {"a": -3, "b": None, "c": [1.5, -2.25], "d": {"k": b"\x01\x02"}},
        {"a": 2**62, "b": "héllo", "c": [], "d": {}},
    ]
    path = os.path.join(scratch, "t.avro")
    write_avro_file(path, schema, records)
    _, back = read_avro_file(path)
    assert back == records


# ---------------------------------------------------------------------------
# Tier 3: write path round-trip, time travel, views, catalog
# ---------------------------------------------------------------------------


def test_roundtrip_partitioned(spark, sf_dir, scratch):
    cat = Catalog(os.path.join(scratch, "wh"))
    src = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag"
    )
    cat.create_table("ns.li", src.schema, partition_by=["l_returnflag"])
    cat.append("ns.li", spark, src)

    table = cat.load("ns.li")
    assert isinstance(table, IcebergTable)
    df = table.to_df(spark)
    assert df.count() == src.count()
    # partition column readable & native-typed
    got = dict(
        df.groupBy("l_returnflag").count().collect()
    )
    want = dict(src.groupBy("l_returnflag").count().collect())
    assert {r: c for r, c in got.items()} == {r: c for r, c in want.items()}

    # partition pruning skips files
    all_files = table.files()
    pruned = table.files(filters=("=", "l_returnflag", "R"))
    assert 0 < len(pruned) < len(all_files)

    # file-level stats pruning on a non-partition column
    pruned2 = table.files(filters=(">", "l_orderkey", 10**12))
    assert len(pruned2) == 0

    # filtered scan is exact (pruning + re-filter)
    n_filtered = table.to_df(
        spark, filters=("=", "l_returnflag", "R")
    ).count()
    assert n_filtered == src.filter(F.col("l_returnflag") == "R").count()


def test_time_travel(spark, sf_dir, scratch):
    cat = Catalog(os.path.join(scratch, "wh"))
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    first = orders.filter(F.col("o_orderkey") % 2 == 0)
    second = orders.filter(F.col("o_orderkey") % 2 != 0)
    cat.create_table("ns.ord", first.schema)
    s1 = cat.append("ns.ord", spark, first)
    s2 = cat.append("ns.ord", spark, second)
    table = cat.load("ns.ord")
    assert isinstance(table, IcebergTable)
    assert table.to_df(spark, snapshot_id=s1).count() == first.count()
    assert table.to_df(spark, snapshot_id=s2).count() == orders.count()
    assert table.to_df(spark).count() == orders.count()
    # statistics reflect the current snapshot exactly (rows, not files)
    assert table.statistics()["num_rows"] == orders.count()
    # timestamp travel: as of snapshot-1 commit time
    snap1 = table.metadata.snapshot(snapshot_id=s1)
    assert (
        table.to_df(spark, as_of_timestamp_ms=snap1.timestamp_ms).count()
        == first.count()
    )


def test_view_roundtrip(spark, sf_dir, scratch):
    cat = Catalog(os.path.join(scratch, "wh"))
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    cat.create_table("ns.nation", nation.schema)
    cat.append("ns.nation", spark, nation)
    cat.create_view(
        "ns.nation_counts",
        "SELECT n_regionkey, COUNT(*) AS n FROM ns_nation GROUP BY n_regionkey",
    )
    # reload catalog from disk: view + table must both mirror back
    cat2 = Catalog(os.path.join(scratch, "wh"))
    assert cat2.table_exists("ns.nation_counts")
    view = cat2.load("ns.nation_counts")
    assert isinstance(view, IcebergView)
    rows = cat2.sql(
        spark, "SELECT * FROM ns_nation_counts ORDER BY n_regionkey"
    ).collect()
    want = dict(nation.groupBy("n_regionkey").count().collect())
    assert {r.n_regionkey: r.n for r in rows} == want


def test_catalog_lifecycle(spark, sf_dir, scratch):
    cat = Catalog(os.path.join(scratch, "wh"))
    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    cat.create_table("a.region", region.schema)
    cat.append("a.region", spark, region)
    assert cat.namespaces() == ["a"]
    assert cat.table_names() == ["a.region"]
    assert cat.table_exists("a.region")
    # synchronous drop (reference bug #3: its drop future is never polled)
    cat.drop("a.region")
    assert not cat.table_exists("a.region")
    cat2 = Catalog(os.path.join(scratch, "wh"))
    assert cat2.table_names() == []  # storage agrees with the mirror


# ---------------------------------------------------------------------------
# Tier 2b: pruning conservatism — property-based
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st


_vals = st.integers(min_value=-20, max_value=20)


def _leaf(col):
    return st.one_of(
        st.tuples(st.sampled_from(["=", "!=", "<", "<=", ">", ">="]),
                  st.just(col), _vals),
        st.tuples(st.just("between"), st.just(col), _vals, _vals),
        st.tuples(st.just("in"), st.just(col),
                  st.lists(_vals, min_size=1, max_size=4)),
        st.tuples(st.just("isnull"), st.just(col)),
        st.tuples(st.just("notnull"), st.just(col)),
    )


def _pred(col):
    return st.recursive(
        _leaf(col),
        lambda kids: st.one_of(
            st.tuples(st.just("and"), kids, kids),
            st.tuples(st.just("or"), kids, kids),
            st.tuples(st.just("not"), kids),
        ),
        max_leaves=6,
    )


def _row_eval(pred, v):
    """Ground truth: evaluate the predicate on a single row value (None =
    SQL NULL), SQL three-valued logic collapsed to 'row matches'."""
    op = pred[0]
    if op == "and":
        return _row_eval(pred[1], v) and _row_eval(pred[2], v)
    if op == "or":
        return _row_eval(pred[1], v) or _row_eval(pred[2], v)
    if op == "not":
        # NULL comparisons are UNKNOWN, and NOT UNKNOWN is still not-match;
        # approximate ground truth: a NULL row only matches isnull leaves,
        # so NOT over a NULL-row sub-predicate stays False unless the sub
        # is a non-matching isnull/notnull tree.  Evaluate strictly:
        return not _row_eval(pred[1], v)
    if op == "isnull":
        return v is None
    if op == "notnull":
        return v is not None
    if v is None:
        return False
    if op == "=":
        return v == pred[2]
    if op == "!=":
        return v != pred[2]
    if op == "<":
        return v < pred[2]
    if op == "<=":
        return v <= pred[2]
    if op == ">":
        return v > pred[2]
    if op == ">=":
        return v >= pred[2]
    if op == "between":
        return pred[2] <= v <= pred[3]
    if op == "in":
        return v in pred[2]
    raise AssertionError(op)


@settings(max_examples=300, deadline=None)
@given(
    pred=_pred("x"),
    rows=st.lists(st.one_of(st.none(), _vals), min_size=1, max_size=8),
)
def test_pruning_never_skips_matching_file(pred, rows):
    """THE pruning invariant (SURVEY.md §4.1): evaluate(pred, stats)
    may return False (skip) ONLY IF no row in the file matches.  'not'
    over NULL rows uses SQL semantics in the kernel but two-valued
    ground truth here, so restrict the check to the sound direction."""
    non_null = [r for r in rows if r is not None]
    stats = {
        "x": ColumnStats(
            min(non_null) if non_null else None,
            max(non_null) if non_null else None,
            len(rows) - len(non_null),
            len(rows),
        )
    }
    verdict = evaluate(pred, stats)
    if verdict is False:  # kernel says: no row can match — prove it
        matching = [r for r in rows if _row_eval(pred, r)]
        assert not matching, (
            f"pruned a file with matching rows {matching}: pred={pred}, "
            f"stats=({stats['x'].lower},{stats['x'].upper},"
            f"{stats['x'].null_count},{stats['x'].value_count})"
        )


def test_compaction_replace_snapshot(spark, sf_dir, scratch):
    """compact(): many small files → few target-sized files in a replace
    snapshot; rows identical; old snapshot still time-travelable; an
    incremental read across the compaction sees the rewritten file set."""
    cat = Catalog(os.path.join(scratch, "wh"))
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    cat.create_table("ns.oc", orders.schema)
    # two appends, deliberately fragmented (8 files each)
    s1 = cat.append("ns.oc", spark, orders.repartition(8))
    s2 = cat.append("ns.oc", spark, orders.repartition(8))
    table = cat.load("ns.oc")
    assert isinstance(table, IcebergTable)
    n_before = len(table.files())
    assert n_before == 16

    s3 = cat.compact("ns.oc", spark, target_file_bytes=1 << 30)
    table = cat.load("ns.oc")
    files_after = table.files()
    assert len(files_after) < n_before
    assert table.to_df(spark).count() == 2 * orders.count()
    # stats survive the rewrite (rows, not files — reference bug #2)
    assert table.statistics()["num_rows"] == 2 * orders.count()
    # time travel to the pre-compaction snapshot still works
    assert table.to_df(spark, snapshot_id=s2).count() == 2 * orders.count()
    assert table.to_df(spark, snapshot_id=s1).count() == orders.count()
    # snapshot summary records the operation
    assert table.metadata.snapshot(snapshot_id=s3).summary["operation"] == "replace"


def test_incremental_read(spark, sf_dir, scratch):
    """incremental_df(from, to): exactly the rows appended in between,
    planned from metadata only."""
    cat = Catalog(os.path.join(scratch, "wh"))
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    a = orders.filter(F.col("o_orderkey") % 3 == 0)
    b = orders.filter(F.col("o_orderkey") % 3 == 1)
    c = orders.filter(F.col("o_orderkey") % 3 == 2)
    cat.create_table("ns.inc", orders.schema)
    s1 = cat.append("ns.inc", spark, a)
    s2 = cat.append("ns.inc", spark, b)
    s3 = cat.append("ns.inc", spark, c)
    table = cat.load("ns.inc")
    assert isinstance(table, IcebergTable)
    assert table.incremental_df(spark, s1, s2).count() == b.count()
    assert table.incremental_df(spark, s2, s3).count() == c.count()
    assert table.incremental_df(spark, s1).count() == b.count() + c.count()
    assert table.incremental_df(spark, s3).count() == 0
    # filters prune the added-file scan too
    got = table.incremental_df(
        spark, s1, s2, filters=(">", "o_orderkey", 100)
    ).count()
    assert got == b.filter(F.col("o_orderkey") > 100).count()


def test_schema_evolution_add_column(spark, sf_dir, scratch):
    """ADD COLUMN: metadata-only migration — old files read as NULL for
    the new column, new appends carry it, stats prune on it."""
    cat = Catalog(os.path.join(scratch, "wh"))
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name"
    )
    cat.create_table("ns.ev", nation.schema)
    cat.append("ns.ev", spark, nation)

    fid = cat.add_column("ns.ev", "population", T.LongType())
    assert fid == 3  # appended column keeps id == position+1

    table = cat.load("ns.ev")
    assert isinstance(table, IcebergTable)
    df = table.to_df(spark)
    assert "population" in df.columns
    assert df.filter(F.col("population").isNull()).count() == nation.count()

    enriched = nation.withColumn(
        "population", (F.col("n_nationkey") + 1) * 1000
    )
    cat.append("ns.ev", spark, enriched)
    table = cat.load("ns.ev")
    df2 = table.to_df(spark)
    assert df2.count() == 2 * nation.count()
    assert df2.filter(F.col("population").isNotNull()).count() == nation.count()
    # new column's stats drive file pruning: old files have no bounds for
    # field 3 (conservative keep); a predicate beyond the new bounds skips
    # the new files
    pruned = table.files(filters=(">", "population", 10**9))
    assert len(pruned) < len(table.files())


def test_expire_snapshots(spark, sf_dir, scratch):
    """expire_snapshots: old history dropped from metadata, files owned
    only by expired snapshots deleted, current snapshot intact."""
    cat = Catalog(os.path.join(scratch, "wh"))
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    cat.create_table("ns.exp", nation.schema)
    cat.append("ns.exp", spark, nation)
    cat.append("ns.exp", spark, nation)
    cat.compact("ns.exp", spark)  # replace snapshot: rewrites all files

    table = cat.load("ns.exp")
    assert isinstance(table, IcebergTable)
    assert len(table.metadata.snapshots) == 3
    n_rows = table.to_df(spark).count()

    result = cat.writer("ns.exp").expire_snapshots(keep_last=1)
    assert result["expired_snapshots"] == 2
    # the two append snapshots' files are unreferenced by the compacted
    # snapshot -> physically deleted
    assert result["deleted_files"] > 0

    table = IcebergTable.load(table.metadata.root)
    assert len(table.metadata.snapshots) == 1
    assert table.to_df(spark).count() == n_rows
    # expired history no longer addressable
    with pytest.raises(Exception):
        table.files(snapshot_id=-12345)


def test_partition_transform_day(spark, sf_dir, scratch):
    """day(ts) partitioning: manifest pruning on a raw-ts predicate must
    skip via the transformed-domain summaries, and the scan stays exact."""
    from datafusion_iceberg_spark.tables import load_table

    cat = Catalog(os.path.join(scratch, "wh"))
    # load_table normalizes ts across the fixture's physical types
    # (BIGINT nanos vs TIMESTAMP_NTZ micros) — same branch the product
    # path and streaming/windows.py use.
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "value"
    )
    cat.create_table("ns.ev_day", events.schema, partition_by=["day(ts)"])
    cat.append("ns.ev_day", spark, events)
    table = cat.load("ns.ev_day")
    assert isinstance(table, IcebergTable)

    spec = table.metadata.partition_fields[0]
    assert spec.transform == "day"
    assert table.metadata.partition_spec_entries() == ["day(ts)"]

    # full scan exact
    assert table.to_df(spark).count() == events.count()

    # manifest pruning in the transformed domain: a one-day window must
    # not keep every manifest... at minimum the predicate is exact
    from datetime import datetime

    lo = datetime(2024, 1, 1, 0, 0, 0)
    pred = ("<", "ts", lo)
    want = events.filter(F.col("ts") < F.lit(lo)).count()
    assert table.to_df(spark, filters=pred).count() == want

    # a predicate before the table's time range prunes ALL files
    early = ("<", "ts", datetime(1999, 1, 1))
    assert len(table.files(filters=early)) == 0
    assert table.to_df(spark, filters=early).count() == 0


def test_partition_transform_bucket(spark, sf_dir, scratch):
    """bucket(8, o_orderkey): equality predicates prune to one bucket's
    files; results stay exact; round-trip through catalog.writer keeps
    the transform."""
    from datafusion_iceberg_spark.iceberg.transforms import bucket_value

    cat = Catalog(os.path.join(scratch, "wh"))
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    cat.create_table(
        "ns.ord_bkt", orders.schema, partition_by=["bucket(8, o_orderkey)"]
    )
    cat.append("ns.ord_bkt", spark, orders)
    table = cat.load("ns.ord_bkt")
    assert isinstance(table, IcebergTable)

    all_files = table.files()
    buckets = {f.partition["o_orderkey_bucket"] for f in all_files}
    assert buckets == set(range(8))  # murmur3 spreads keys over all buckets

    key = 42
    pred = ("=", "o_orderkey", key)
    pruned = table.files(filters=pred)
    assert {f.partition["o_orderkey_bucket"] for f in pruned} == {
        bucket_value(key, 8)
    }
    got = table.to_df(spark, filters=pred).collect()
    want = orders.filter(F.col("o_orderkey") == key).collect()
    assert len(got) == len(want) == 1
    assert got[0].o_totalprice == want[0].o_totalprice

    # writer rebuilt from metadata keeps the transform (second append)
    cat.append("ns.ord_bkt", spark, orders)
    table = cat.load("ns.ord_bkt")
    assert table.to_df(spark).count() == 2 * orders.count()
    assert len(table.files(filters=pred)) == 2 * len(pruned)


def test_iceberg_bucket_hash_reference_values():
    """Iceberg-spec murmur3 bucket values (spec appendix B test vectors):
    bucket hash of int/long 34 = 2017239379, of string 'iceberg' =
    1210000089."""
    from datafusion_iceberg_spark.iceberg.transforms import murmur3_32

    assert murmur3_32((34).to_bytes(8, "little", signed=True)) == 2017239379
    assert murmur3_32(b"iceberg") == 1210000089


def test_copy_on_write_delete(spark, sf_dir, scratch):
    """DELETE WHERE: only files that may contain matches are rewritten;
    untouched partitions keep their ORIGINAL file paths; results exact;
    pre-delete snapshot still time-travelable."""
    cat = Catalog(os.path.join(scratch, "wh"))
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    cat.create_table(
        "ns.del", orders.schema, partition_by=["o_orderstatus"]
    )
    s1 = cat.append("ns.del", spark, orders)
    table = cat.load("ns.del")
    assert isinstance(table, IcebergTable)
    before = {f.path for f in table.files()}
    untouched_before = {
        f.path for f in table.files() if f.partition["o_orderstatus"] != "F"
    }

    # delete rows within one partition (partition-aligned + row predicate)
    pred = ("and", ("=", "o_orderstatus", "F"), (">", "o_totalprice", 100000.0))
    s2 = cat.delete_where("ns.del", spark, pred)
    table = cat.load("ns.del")

    want = orders.filter(
        ~((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 100000.0))
    )
    got = table.to_df(spark)
    assert got.count() == want.count()
    assert got.filter(
        (F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 100000.0)
    ).count() == 0

    # surgical: untouched partitions keep their original files
    after = {f.path for f in table.files()}
    assert untouched_before <= after
    # the F-partition files were rewritten
    assert not any(
        f.path in before
        for f in table.files()
        if f.partition["o_orderstatus"] == "F"
    )
    # statistics and time travel
    assert table.statistics()["num_rows"] == want.count()
    assert table.to_df(spark, snapshot_id=s1).count() == orders.count()
    assert (
        table.metadata.snapshot(snapshot_id=s2).summary["operation"] == "delete"
    )


def test_delete_all_rows_in_scope(spark, sf_dir, scratch):
    """Deleting every row of the matched files leaves a valid table."""
    cat = Catalog(os.path.join(scratch, "wh"))
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    cat.create_table("ns.deln", nation.schema)
    cat.append("ns.deln", spark, nation)
    cat.delete_where("ns.deln", spark, (">=", "n_nationkey", 0))
    table = cat.load("ns.deln")
    assert isinstance(table, IcebergTable)
    assert table.to_df(spark).count() == 0
    assert table.statistics()["num_rows"] == 0


def test_copy_on_write_update(spark, sf_dir, scratch):
    """UPDATE WHERE: matched rows transformed, others byte-identical;
    untouched partition files not rewritten."""
    cat = Catalog(os.path.join(scratch, "wh"))
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    cat.create_table("ns.upd", orders.schema, partition_by=["o_orderstatus"])
    cat.append("ns.upd", spark, orders)
    table = cat.load("ns.upd")
    assert isinstance(table, IcebergTable)
    untouched_before = {
        f.path for f in table.files() if f.partition["o_orderstatus"] != "O"
    }

    pred = ("and", ("=", "o_orderstatus", "O"), ("<", "o_totalprice", 50000.0))
    cat.update_where(
        "ns.upd", spark, pred, {"o_totalprice": "o_totalprice * 2"}
    )
    table = cat.load("ns.upd")
    got = table.to_df(spark)
    assert got.count() == orders.count()

    want_updated = orders.filter(
        (F.col("o_orderstatus") == "O") & (F.col("o_totalprice") < 50000.0)
    )
    n_upd = want_updated.count()
    assert n_upd > 0
    # doubled values present, original small-O rows gone
    assert (
        got.filter(
            (F.col("o_orderstatus") == "O") & (F.col("o_totalprice") < 50000.0)
        ).count()
        == want_updated.filter(F.col("o_totalprice") * 2 < 50000.0).count()
    )
    # sum invariant: total goes up by exactly the updated rows' sum
    from decimal import Decimal

    def tot(df):
        return df.selectExpr(
            "CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS DECIMAL(28,0)) s"
        ).collect()[0].s

    assert tot(got) == tot(orders) + tot(want_updated)
    # untouched partitions keep original files
    after = {f.path for f in table.files()}
    assert untouched_before <= after


# ---------------------------------------------------------------------------
# Transform-rewrite conservatism — property-based
# ---------------------------------------------------------------------------

from datetime import datetime as _dt, timedelta as _td

from hypothesis import given, settings, strategies as hst


_ts = hst.integers(min_value=0, max_value=4 * 365 * 24 * 3600).map(
    lambda s: _dt(2020, 1, 1) + _td(seconds=s)
)
_ops = hst.sampled_from(["=", "<", "<=", ">", ">="])


@settings(max_examples=300, deadline=None)
@given(op=_ops, lit=_ts, rows=hst.lists(_ts, min_size=1, max_size=10),
       transform=hst.sampled_from(["day", "month", "year"]))
def test_transform_rewrite_never_skips_matching_rows(op, lit, rows, transform):
    """If the rewritten predicate says a container (bounds = transformed
    min/max of its rows) cannot match, NO row may satisfy the original
    predicate — the invariant transform pruning rests on."""
    from datafusion_iceberg_spark.iceberg.pruning import ColumnStats, evaluate
    from datafusion_iceberg_spark.iceberg.transforms import apply, rewrite_pred

    pred = (op, "ts", lit)
    tvals = [apply(transform, r) for r in rows]
    stats = {"ts": ColumnStats(min(tvals), max(tvals), 0, len(rows))}
    if evaluate(rewrite_pred(pred, "ts", transform), stats) is False:
        import operator

        cmp = {"=": operator.eq, "<": operator.lt, "<=": operator.le,
               ">": operator.gt, ">=": operator.ge}[op]
        matching = [r for r in rows if cmp(r, lit)]
        assert not matching, (
            f"pruned a container with matches: {op} {lit} {transform}, "
            f"rows={rows}"
        )


@settings(max_examples=200, deadline=None)
@given(key=hst.one_of(hst.integers(-10**9, 10**9), hst.text(max_size=8)),
       keys=hst.lists(hst.integers(-10**9, 10**9), min_size=1, max_size=10),
       n=hst.sampled_from([4, 8, 16]))
def test_bucket_rewrite_never_skips_matching_rows(key, keys, n):
    from datafusion_iceberg_spark.iceberg.pruning import ColumnStats, evaluate
    from datafusion_iceberg_spark.iceberg.transforms import (
        bucket_value,
        rewrite_pred,
    )

    pred = ("=", "k", key)
    bvals = [bucket_value(k, n) for k in keys]
    stats = {"k": ColumnStats(min(bvals), max(bvals), 0, len(keys))}
    if evaluate(rewrite_pred(pred, "k", f"bucket[{n}]"), stats) is False:
        assert key not in keys


def test_merge_into(spark, sf_dir, scratch):
    """MERGE: matched keys updated from source, new keys inserted,
    untouched rows byte-identical; equals the textbook upsert."""
    cat = Catalog(os.path.join(scratch, "wh"))
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    cat.create_table("ns.mrg", nation.schema)
    cat.append("ns.mrg", spark, nation)

    # source: update nations 0-4 (rename), insert nations 100-102
    upd = nation.filter(F.col("n_nationkey") < 5).withColumn(
        "n_name", F.concat(F.lit("NEW_"), "n_name")
    )
    ins = spark.createDataFrame(
        [(100 + i, f"ADDED_{i}", i % 5) for i in range(3)], nation.schema
    )
    source = upd.unionByName(ins)

    cat.merge_into(
        "ns.mrg", spark, source, on="n_nationkey",
        when_matched_set={"n_name": "src.n_name"},
    )
    table = cat.load("ns.mrg")
    assert isinstance(table, IcebergTable)
    got = {r.n_nationkey: r.n_name for r in table.to_df(spark).collect()}
    assert len(got) == nation.count() + 3
    for i in range(5):
        assert got[i].startswith("NEW_")
    for i in range(5, 25):
        assert not got[i].startswith("NEW_")
    for i in range(3):
        assert got[100 + i] == f"ADDED_{i}"

    # merge with empty source is a no-op
    before = table.metadata.raw["current-snapshot-id"]
    snap = cat.merge_into(
        "ns.mrg", spark, spark.createDataFrame([], nation.schema), on="n_nationkey"
    )
    assert snap == before


# ---------------------------------------------------------------------------
# Round-2 regressions (ADVICE r1): UPDATE old-row semantics, MERGE duplicate
# keys, date/timestamp identity partitioning, stats completeness
# ---------------------------------------------------------------------------


def test_update_multi_column_old_row_semantics(spark, scratch):
    """SQL UPDATE: the predicate AND all SET expressions evaluate against
    the ORIGINAL row.  SET status='done', ts=ts+1 WHERE status='pending'
    must update BOTH columns on every pending row (a sequential
    withColumn re-evaluates the predicate against the mutated status and
    silently drops later assignments)."""
    cat = Catalog(os.path.join(scratch, "wh"))
    df = spark.createDataFrame(
        [(1, "pending", 10), (2, "pending", 20), (3, "done", 30)],
        "id INT, status STRING, ts INT",
    )
    cat.create_table("ns.t", df.schema)
    cat.append("ns.t", spark, df)
    cat.update_where(
        "ns.t",
        spark,
        ("=", "status", "pending"),
        {"status": "'done'", "ts": "ts + 1"},
    )
    got = {r.id: (r.status, r.ts) for r in
           cat.load("ns.t").to_df(spark).collect()}
    assert got == {1: ("done", 11), 2: ("done", 21), 3: ("done", 30)}


def test_update_swap_columns_sees_old_values(spark, scratch):
    """SET a=b, b=a must SWAP (both expressions read old values)."""
    cat = Catalog(os.path.join(scratch, "wh"))
    df = spark.createDataFrame([(1, 10, 20)], "id INT, a INT, b INT")
    cat.create_table("ns.swap", df.schema)
    cat.append("ns.swap", spark, df)
    cat.update_where("ns.swap", spark, ("=", "id", 1), {"a": "b", "b": "a"})
    row = cat.load("ns.swap").to_df(spark).collect()[0]
    assert (row.a, row.b) == (20, 10)


def test_merge_duplicate_source_keys_raises(spark, sf_dir, scratch):
    """SQL MERGE errors when a target row matches multiple source rows —
    a plain left join would silently multiply target rows."""
    cat = Catalog(os.path.join(scratch, "wh"))
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    cat.create_table("ns.dup", nation.schema)
    cat.append("ns.dup", spark, nation)
    dup_src = nation.filter(F.col("n_nationkey") < 2).unionAll(
        nation.filter(F.col("n_nationkey") < 1)
    )
    with pytest.raises(ValueError, match="duplicate keys"):
        cat.merge_into(
            "ns.dup", spark, dup_src, on="n_nationkey",
            when_matched_set={"n_name": "src.n_name"},
        )
    # table unchanged
    assert cat.load("ns.dup").to_df(spark).count() == nation.count()


def test_identity_partition_on_date_column(spark, scratch):
    """Identity-partitioning on a DATE column: commit must not crash on
    the Avro {'type':'int','logicalType':'date'} partition field, scans
    must rehydrate the value, and partition pruning must stay exact."""
    from datetime import date

    cat = Catalog(os.path.join(scratch, "wh"))
    df = spark.createDataFrame(
        [(i, date(2024, 1, 1 + i % 5), float(i)) for i in range(20)],
        "id INT, d DATE, v DOUBLE",
    )
    cat.create_table("ns.dt", df.schema, partition_by=["d"])
    cat.append("ns.dt", spark, df)
    table = cat.load("ns.dt")
    assert isinstance(table, IcebergTable)
    got = table.to_df(spark)
    assert got.count() == 20
    assert dict(got.dtypes)["d"] == "date"
    assert (
        got.filter(F.col("d") == F.lit("2024-01-03").cast("date")).count()
        == df.filter(F.col("d") == F.lit("2024-01-03").cast("date")).count()
    )
    # pruning on the partition date keeps exactly the matching files
    files = table.files(filters=("=", "d", date(2024, 1, 3)))
    assert files
    assert all(f.partition["d"] == (date(2024, 1, 3) - date(1970, 1, 1)).days
               for f in files)
    # DELETE through the pruned path works on the date partition
    cat.delete_where("ns.dt", spark, ("=", "d", date(2024, 1, 3)))
    left = cat.load("ns.dt").to_df(spark)
    assert left.filter(F.col("d") == F.lit("2024-01-03").cast("date")).count() == 0
    assert left.count() == 20 - df.filter(
        F.col("d") == F.lit("2024-01-03").cast("date")
    ).count()


def test_identity_partition_on_timestamp_column(spark, scratch):
    """Identity-partitioning on a TIMESTAMP column round-trips through
    the micros-from-epoch manifest domain."""
    from datetime import datetime

    cat = Catalog(os.path.join(scratch, "wh"))
    df = spark.createDataFrame(
        [(i, datetime(2024, 1, 1, i % 3, 30), float(i)) for i in range(9)],
        "id INT, ts TIMESTAMP, v DOUBLE",
    )
    cat.create_table("ns.tst", df.schema, partition_by=["ts"])
    cat.append("ns.tst", spark, df)
    got = cat.load("ns.tst").to_df(spark)
    assert got.count() == 9
    assert dict(got.dtypes)["ts"] == "timestamp"
    assert (
        got.filter(F.col("ts") == F.lit("2024-01-01 01:30:00").cast("timestamp")).count()
        == 3
    )


def test_nan_column_emits_no_bounds(spark, scratch):
    """A float column containing NaN gets NO lower/upper bound in the
    manifest (parquet may drop row-group min/max for NaN pages; an
    understated bound would let DELETE/UPDATE/MERGE miss candidate
    files).  Pruning must then treat the column as unknown → keep."""
    import math

    cat = Catalog(os.path.join(scratch, "wh"))
    df = spark.createDataFrame(
        [(1, float("nan")), (2, 5.0), (3, 123.0)], "id INT, x DOUBLE"
    )
    cat.create_table("ns.nan", df.schema)
    cat.append("ns.nan", spark, df)
    table = cat.load("ns.nan")
    assert isinstance(table, IcebergTable)
    fid = table.metadata.field_ids_by_name()["x"]
    for f in table.files():
        # either no bound at all (conservative) or a bound pair that
        # brackets every non-NaN value in the file
        lo = f.lower_bounds.get(fid)
        hi = f.upper_bounds.get(fid)
        if lo is not None or hi is not None:
            from datafusion_iceberg_spark.iceberg.stats import decode_stat

            lo_v, hi_v = decode_stat("double", lo), decode_stat("double", hi)
            assert lo_v is not None and hi_v is not None
            # a NaN bound poisons every comparison → must never be emitted
            assert not math.isnan(lo_v) and not math.isnan(hi_v)
    # file-level pruning never skips the NaN-bearing file for x-predicates
    assert len(table.files(filters=(">", "x", 1000.0))) >= 0  # no crash
    got = table.to_df(spark, filters=("<", "x", 10.0))
    assert got.count() == 1


# ---------------------------------------------------------------------------
# REST catalog (catalog_rest crate parity) + FileIO indirection
# ---------------------------------------------------------------------------


def _rest_fixture_warehouse(spark, sf_dir, scratch):
    cat = Catalog(os.path.join(scratch, "wh"))
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    cat.create_table("ns.nation", nation.schema)
    cat.append("ns.nation", spark, nation)
    return cat, nation


def test_rest_catalog_walk_and_scan(spark, sf_dir, scratch):
    """Mirror build over HTTP (list_namespaces → list_tables → load_table)
    then scan: same rows as the direct filesystem catalog."""
    from datafusion_iceberg_spark.iceberg.rest_catalog import (
        LocalRestServer,
        RestCatalog,
        RestCatalogClient,
    )

    cat, nation = _rest_fixture_warehouse(spark, sf_dir, scratch)
    with LocalRestServer(cat.warehouse) as base:
        rest = RestCatalog(RestCatalogClient(base))
        assert rest.namespaces() == ["ns"]
        assert rest.table_names() == ["ns.nation"]
        got = rest.load("ns.nation").to_df(spark)
    assert got.count() == nation.count()
    assert sorted(r.n_nationkey for r in got.collect()) == sorted(
        r.n_nationkey for r in nation.collect()
    )


def test_rest_catalog_register_drop_synchronous(spark, sf_dir, scratch):
    """register_table/drop write back to the remote catalog BEFORE
    returning (reference bug #3: its LocalPool future is never polled, so
    the remote stays stale) — a second, fresh mirror must observe both."""
    from datafusion_iceberg_spark.iceberg.rest_catalog import (
        LocalRestServer,
        RestCatalog,
        RestCatalogClient,
    )

    cat, nation = _rest_fixture_warehouse(spark, sf_dir, scratch)
    # an EXTERNAL table (own directory, not in the served warehouse)
    ext = Catalog(os.path.join(scratch, "ext"))
    ext.create_table("other.extra", nation.schema)
    ext.append("other.extra", spark, nation)
    ext_meta_dir = os.path.join(scratch, "ext", "other", "extra")

    with LocalRestServer(cat.warehouse) as base:
        client = RestCatalogClient(base)
        rest = RestCatalog(client)
        rest.register_table("ns.extra", ext_meta_dir)
        assert rest.table_exists("ns.extra")
        assert rest.load("ns.extra").to_df(spark).count() == nation.count()
        # fresh mirror sees the registration (remote actually mutated)
        rest2 = RestCatalog(RestCatalogClient(base))
        assert rest2.table_exists("ns.extra")
        rest2.drop("ns.extra")
        assert not rest2.table_exists("ns.extra")
        rest3 = RestCatalog(RestCatalogClient(base))
        assert not rest3.table_exists("ns.extra")
        assert rest3.table_exists("ns.nation")


def test_fileio_file_scheme_same_hash(spark):
    """The committed reference fixture reads identically through a
    file:// root and a bare posix root (FileIO indirection, VERDICT #4
    done-criterion)."""
    t_posix = IcebergTable.load(FIXTURE)
    t_file = IcebergTable.load("file://" + FIXTURE)
    rows_posix = sorted(
        tuple(r) for r in t_posix.to_df(spark).collect()
    )
    rows_file = sorted(tuple(r) for r in t_file.to_df(spark).collect())
    assert rows_posix == rows_file
    assert len(rows_file) == 4


def test_fileio_memory_scheme_metadata_roundtrip():
    """Avro + metadata JSON round-trip through memory:// — proves the IO
    seam carries a non-posix scheme end-to-end (the s3:// path binds the
    same way when a client library is present)."""
    import json as _json

    from datafusion_iceberg_spark.iceberg.avro import (
        read_avro_file,
        write_avro_file,
    )
    from datafusion_iceberg_spark.iceberg.io import get_io
    from datafusion_iceberg_spark.iceberg.metadata import load_table_metadata

    schema = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "x", "type": "long"}],
    }
    write_avro_file("memory://wh/t/metadata/m0.avro", schema, [{"x": 7}])
    _, recs = read_avro_file("memory://wh/t/metadata/m0.avro")
    assert recs == [{"x": 7}]

    with open(os.path.join(FIXTURE, "metadata", "v1.metadata.json")) as fh:
        raw = fh.read()
    get_io("memory://wh/t/metadata/v1.metadata.json").write_bytes(
        "memory://wh/t/metadata/v1.metadata.json", raw.encode()
    )
    meta = load_table_metadata("memory://wh/t")
    assert meta.raw == _json.loads(raw)
    assert meta.struct_type().fieldNames() == [
        f["name"] for f in meta.current_schema["fields"]
    ]


def test_fileio_scheme_resolution():
    """s3:// resolves to a bound S3IO when a client library exists, or
    raises ImportError when none does; unknown schemes always raise."""
    from datafusion_iceberg_spark.iceberg import io as iio

    iio._REGISTRY.pop("s3", None)
    try:
        impl = iio.get_io("s3://bucket/table/metadata/v1.metadata.json")
        assert isinstance(impl, iio.S3IO)
    except ImportError as e:
        assert "s3" in str(e)
    with pytest.raises(ValueError, match="no FileIO registered"):
        iio.get_io("gopher://x/y")


# ---------------------------------------------------------------------------
# Field-id column mapping: RENAME evolution
# ---------------------------------------------------------------------------


def test_rename_column_reads_old_files_by_field_id(spark, sf_dir, scratch):
    """Files written before the rename resolve through PARQUET:field_id —
    values survive under the new name, no silent nulls."""
    cat = Catalog(os.path.join(scratch, "wh"))
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    cat.create_table("ns.ren", nation.schema)
    cat.append("ns.ren", spark, nation)
    cat.rename_column("ns.ren", "n_name", "nation_label")

    table = cat.load("ns.ren")
    df = table.to_df(spark)
    assert "nation_label" in df.columns and "n_name" not in df.columns
    got = {r.n_nationkey: r.nation_label for r in df.collect()}
    want = {r.n_nationkey: r.n_name for r in nation.collect()}
    assert got == want  # would be all-None without id mapping

    # appends after the rename write the NEW name; mixed files still read
    extra = nation.limit(3).select(
        F.col("n_nationkey") + 1000,
        F.col("n_name"),
        "n_regionkey",
    ).toDF("n_nationkey", "nation_label", "n_regionkey")
    cat.append("ns.ren", spark, extra)
    df2 = cat.load("ns.ren").to_df(spark)
    assert df2.count() == nation.count() + 3
    assert df2.filter(F.col("nation_label").isNull()).count() == 0

    # stats pruning still works on the renamed column (bounds are id-keyed)
    t = cat.load("ns.ren")
    assert len(t.files(filters=("=", "nation_label", "\x7f"))) == 0


def test_rename_column_guards(spark, sf_dir, scratch):
    cat = Catalog(os.path.join(scratch, "wh"))
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderstatus"
    )
    cat.create_table("ns.g", orders.schema, partition_by=["o_orderstatus"])
    cat.append("ns.g", spark, orders)
    w = cat.writer("ns.g")
    with pytest.raises(ValueError):
        w.rename_column("nope", "x")
    with pytest.raises(ValueError):
        w.rename_column("o_orderkey", "o_orderstatus")
    with pytest.raises(NotImplementedError):
        w.rename_column("o_orderstatus", "status")


# ---------------------------------------------------------------------------
# Merge-on-read: position-delete write + anti-join read path
# ---------------------------------------------------------------------------


def test_mor_position_delete_roundtrip(spark, sf_dir, scratch):
    """MOR delete: rows vanish from scans without rewriting data files."""
    cat = Catalog(os.path.join(scratch, "wh"))
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    cat.create_table("ns.mor", orders.schema)
    cat.append("ns.mor", spark, orders)
    table = cat.load("ns.mor")
    data_files_before = {f.path for f in table.files()}

    pred = ("=", "o_orderstatus", "F")
    n_match = orders.filter(F.col("o_orderstatus") == "F").count()
    assert n_match > 0
    cat.delete_where_mor("ns.mor", spark, pred)

    table = cat.load("ns.mor")
    # data files untouched (no rewrite), delete files present
    assert {f.path for f in table.files()} == data_files_before
    dels = table.position_delete_files()
    assert dels and sum(d.record_count for d in dels) == n_match

    got = table.to_df(spark)
    assert got.filter(F.col("o_orderstatus") == "F").count() == 0
    assert got.count() == orders.count() - n_match
    # statistics reflect live rows
    assert table.statistics()["num_rows"] == orders.count() - n_match


def test_mor_delete_stacks_and_time_travel(spark, sf_dir, scratch):
    """Two MOR deletes stack; time travel before the deletes sees all
    rows; a second delete never re-deletes already-dead positions."""
    cat = Catalog(os.path.join(scratch, "wh"))
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    cat.create_table("ns.m2", nation.schema)
    snap0 = cat.append("ns.m2", spark, nation)
    cat.delete_where_mor("ns.m2", spark, ("<", "n_nationkey", 5))
    cat.delete_where_mor("ns.m2", spark, ("<", "n_nationkey", 8))

    table = cat.load("ns.m2")
    got = table.to_df(spark)
    assert got.count() == nation.count() - 8
    assert got.filter(F.col("n_nationkey") < 8).count() == 0
    # total delete records = 5 + 3 (second delete skips dead rows)
    assert sum(d.record_count for d in table.position_delete_files()) == 8
    # time travel to pre-delete snapshot sees everything
    assert table.to_df(spark, snapshot_id=snap0).count() == nation.count()


def test_mor_then_cow_interplay(spark, sf_dir, scratch):
    """A COW UPDATE after a MOR delete must not resurrect deleted rows."""
    cat = Catalog(os.path.join(scratch, "wh"))
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    cat.create_table("ns.mix", nation.schema)
    cat.append("ns.mix", spark, nation)
    cat.delete_where_mor("ns.mix", spark, ("<", "n_nationkey", 3))
    cat.update_where(
        "ns.mix", spark, ("<", "n_nationkey", 10), {"n_name": "'X'"}
    )
    got = cat.load("ns.mix").to_df(spark)
    assert got.count() == nation.count() - 3
    assert got.filter(F.col("n_nationkey") < 3).count() == 0
    assert got.filter((F.col("n_nationkey") >= 3) & (F.col("n_nationkey") < 10)
                      ).select("n_name").distinct().collect()[0][0] == "X"


def test_view_declared_schema_assertion(spark, sf_dir, scratch):
    """A view carrying a declared schema validates the expanded plan
    against it; a mismatching declaration raises instead of silently
    changing shape (reference views always carry schemas,
    table.rs:369-391)."""
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name"
    )
    nation.createOrReplaceTempView("vsrc_nation")
    ok_schema = {
        "type": "struct",
        "schema-id": 0,
        "fields": [
            {"id": 1, "name": "n_nationkey", "required": False, "type": "int"},
            {"id": 2, "name": "n_name", "required": False, "type": "string"},
        ],
    }
    v1 = IcebergView.create(
        os.path.join(scratch, "v_ok"),
        "SELECT n_nationkey, n_name FROM vsrc_nation",
        schema_json=ok_schema,
    )
    assert v1.to_df(spark).count() == nation.count()

    bad_schema = {
        "type": "struct",
        "schema-id": 0,
        "fields": [
            {"id": 1, "name": "n_nationkey", "required": False, "type": "int"},
            {"id": 2, "name": "nation_name", "required": False, "type": "string"},
        ],
    }
    v2 = IcebergView.create(
        os.path.join(scratch, "v_bad"),
        "SELECT n_nationkey, n_name FROM vsrc_nation",
        schema_json=bad_schema,
    )
    with pytest.raises(ValueError, match="declared"):
        v2.to_df(spark)

    bad_type = {
        "type": "struct",
        "schema-id": 0,
        "fields": [
            {"id": 1, "name": "n_nationkey", "required": False, "type": "long"},
            {"id": 2, "name": "n_name", "required": False, "type": "string"},
        ],
    }
    v3 = IcebergView.create(
        os.path.join(scratch, "v_badtype"),
        "SELECT n_nationkey, n_name FROM vsrc_nation",
        schema_json=bad_type,
    )
    with pytest.raises(ValueError, match="expands to"):
        v3.to_df(spark)


@settings(max_examples=50, deadline=None)
@given(vals=hst.lists(hst.integers(-2**63, 2**63 - 1), min_size=1, max_size=64),
       n=hst.sampled_from([4, 16, 128]))
def test_vectorized_bucket_matches_scalar(vals, n):
    """The numpy murmur3 kernel must agree with the scalar reference for
    every int64 (the write path uses the vector kernel; pruning literals
    use the scalar one — disagreement would mis-prune silently)."""
    import numpy as np

    from datafusion_iceberg_spark.iceberg.transforms import (
        _murmur3_int64_vec,
        bucket_value,
    )

    vec = _murmur3_int64_vec(np.array(vals, dtype=np.int64)) % n
    assert list(vec) == [bucket_value(v, n) for v in vals]


def test_compact_folds_mor_deletes(spark, sf_dir, scratch):
    """Compaction rewrites the live (delete-applied) rows and the new
    replace snapshot carries no delete manifests — deletes are folded in,
    the maintenance pairing for MOR."""
    cat = Catalog(os.path.join(scratch, "wh"))
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    cat.create_table("ns.cf", nation.schema)
    cat.append("ns.cf", spark, nation)
    cat.delete_where_mor("ns.cf", spark, ("<", "n_nationkey", 5))
    cat.compact("ns.cf", spark)
    table = cat.load("ns.cf")
    assert table.position_delete_files() == []
    got = table.to_df(spark)
    assert got.count() == nation.count() - 5
    assert got.filter(F.col("n_nationkey") < 5).count() == 0


def test_three_part_name_resolution_and_stats_broadcast(spark, sf_dir, scratch):
    """catalog.sql resolves <catalog>.<ns>.<table> triples; the
    metadata-small side plans as a broadcast join via the manifest-stats
    hint (no SQL hint written)."""
    cat = Catalog(os.path.join(scratch, "wh"), name="mycat")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    region = spark.read.parquet(f"{sf_dir}/region.parquet").select(
        "r_regionkey", "r_name"
    )
    cat.create_table("geo.nation", nation.schema)
    cat.append("geo.nation", spark, nation)
    cat.create_table("geo.region", region.schema)
    cat.append("geo.region", spark, region)

    df = cat.sql(
        spark,
        "SELECT r_name, COUNT(*) AS n FROM mycat.geo.nation"
        " JOIN mycat.geo.region ON n_regionkey = r_regionkey"
        " GROUP BY r_name ORDER BY r_name",
    )
    rows = {r.r_name: r.n for r in df.collect()}
    want = {
        r.r_name: r.n
        for r in nation.join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert rows == want
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # a column reference like alias.col is never rewritten
    df2 = cat.sql(
        spark,
        "SELECT t.n_name FROM geo_nation t WHERE t.n_nationkey = 3",
    )
    assert df2.count() == 1
    # an alias/CTE that SHARES the catalog name is a legitimate two-part
    # column reference — must pass through, not hard-error (ADVICE r3)
    df3 = cat.sql(
        spark,
        "SELECT mycat.n_name FROM geo_nation AS mycat"
        " WHERE mycat.n_nationkey = 3",
    )
    assert df3.count() == 1
    # Spark identifiers are case-insensitive: an upper-cased catalog
    # spelling rewrites the same as the registered one (ADVICE r3)
    df4 = cat.sql(
        spark, "SELECT COUNT(*) AS n FROM MYCAT.GEO.NATION"
    )
    assert df4.collect()[0].n == nation.count()
    # unknown three-part names still raise the clear error, any case
    with pytest.raises(ValueError, match="unresolved catalog reference"):
        cat.sql(spark, "SELECT * FROM MyCat.geo.nope")


def test_drop_column_and_post_drop_append(spark, sf_dir, scratch):
    """DROP COLUMN is metadata-only; old files' physical column is never
    read; appends after the drop keep ORIGINAL field ids for surviving
    columns (a positional re-derivation would stamp wrong ids and key
    stats to the wrong columns)."""
    cat = Catalog(os.path.join(scratch, "wh"))
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    cat.create_table("ns.dc", nation.schema)
    cat.append("ns.dc", spark, nation)
    cat.drop_column("ns.dc", "n_name")

    table = cat.load("ns.dc")
    df = table.to_df(spark)
    assert df.columns == ["n_nationkey", "n_regionkey"]
    assert df.count() == nation.count()
    # surviving columns keep their original ids in a rebuilt writer
    w = cat.writer("ns.dc")
    assert w.field_ids == {"n_nationkey": 1, "n_regionkey": 3}

    extra = nation.select(
        (F.col("n_nationkey") + 1000).alias("n_nationkey"), "n_regionkey"
    ).limit(2)
    cat.append("ns.dc", spark, extra)
    df2 = cat.load("ns.dc").to_df(spark)
    assert df2.count() == nation.count() + 2
    # stats pruning on n_regionkey (id 3) still sound across old+new files
    t = cat.load("ns.dc")
    n_all = df2.filter(F.col("n_regionkey") == 2).count()
    assert t.to_df(spark, filters=("=", "n_regionkey", 2)).count() == n_all
    with pytest.raises(ValueError):
        cat.writer("ns.dc").drop_column("nope")


def test_rollback_to_snapshot(spark, sf_dir, scratch):
    """Rollback re-points current to an earlier snapshot; the rollback is
    itself a snapshot-log entry (auditable); rolling forward again works."""
    cat = Catalog(os.path.join(scratch, "wh"))
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    cat.create_table("ns.rb", nation.schema)
    snap1 = cat.append("ns.rb", spark, nation.filter(F.col("n_nationkey") < 10))
    snap2 = cat.append("ns.rb", spark, nation.filter(F.col("n_nationkey") >= 10))
    assert cat.load("ns.rb").to_df(spark).count() == nation.count()

    cat.rollback_to_snapshot("ns.rb", snap1)
    assert cat.load("ns.rb").to_df(spark).count() == 10
    cat.rollback_to_snapshot("ns.rb", snap2)
    assert cat.load("ns.rb").to_df(spark).count() == nation.count()
    with pytest.raises(KeyError):
        cat.rollback_to_snapshot("ns.rb", 123456789)


def test_concurrent_append_optimistic_concurrency(spark, sf_dir, scratch):
    """Two appends racing on the same base version: neither is lost —
    the loser of the metadata race re-reads and re-commits on top
    (Iceberg optimistic concurrency; a clobbering rename would silently
    drop one append's rows)."""
    import threading

    cat = Catalog(os.path.join(scratch, "wh"))
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    cat.create_table("ns.cc", nation.schema)
    half1 = nation.filter(F.col("n_nationkey") < 12)
    half2 = nation.filter(F.col("n_nationkey") >= 12)

    w1 = cat.writer("ns.cc")
    w2 = cat.writer("ns.cc")
    errs = []

    def go(w, df):
        try:
            w.append(spark, df)
        except Exception:  # pragma: no cover - diagnostic
            import traceback

            errs.append(traceback.format_exc())

    t1 = threading.Thread(target=go, args=(w1, half1))
    t2 = threading.Thread(target=go, args=(w2, half2))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs, errs
    table = cat.load("ns.cc")
    table = type(table).load(table.metadata.root)  # fresh read
    got = table.to_df(spark)
    assert got.count() == nation.count()
    assert len(table.metadata.snapshots) == 2


def test_commit_conflict_raised_for_metadata_race(spark, sf_dir, scratch):
    """A stale writer committing after someone else advanced the version
    gets CommitConflict (for non-append mutations, surfaced, not
    retried)."""
    from datafusion_iceberg_spark.iceberg.writer import CommitConflict

    cat = Catalog(os.path.join(scratch, "wh"))
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    cat.create_table("ns.cr", nation.schema)
    cat.append("ns.cr", spark, nation)
    w_stale = cat.writer("ns.cr")
    meta = w_stale._load_current()  # reads v1
    cat.append("ns.cr", spark, nation.limit(1))  # advances to v2
    with pytest.raises(CommitConflict):
        w_stale._commit_metadata(meta)  # would clobber v2


def test_sorted_write_tightens_pruning(spark, sf_dir, scratch):
    """A table with a declared sort order writes range-partitioned files
    with disjoint key ranges — a key-range predicate prunes to a strict
    subset of files, where an unsorted write (hash layout) keeps most."""
    cat = Catalog(os.path.join(scratch, "wh"))
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    ).repartition(8)
    cat.create_table("ns.sorted", orders.schema, sort_by=["o_totalprice"])
    cat.append("ns.sorted", spark, orders)
    cat.create_table("ns.unsorted", orders.schema)
    cat.append("ns.unsorted", spark, orders)

    t_sorted = cat.load("ns.sorted")
    t_unsorted = cat.load("ns.unsorted")
    assert t_sorted.metadata.sort_order_columns() == ["o_totalprice"]
    pred = ("between", "o_totalprice", 900000.0, 1000000.0)
    n_s_all = len(t_sorted.files())
    n_s = len(t_sorted.files(filters=pred))
    n_u = len(t_unsorted.files(filters=pred))
    n_u_all = len(t_unsorted.files())
    if n_s_all > 1:
        assert n_s < n_s_all  # pruning actually skips files
        assert n_s / n_s_all <= n_u / max(n_u_all, 1)
    # correctness unchanged
    want = orders.filter(F.col("o_totalprice").between(900000.0, 1000000.0)).count()
    assert t_sorted.to_df(spark, filters=pred).count() == want
    # appends through a REBUILT writer keep the sort order (metadata round-trip)
    w = cat.writer("ns.sorted")
    assert w.sort_by == ["o_totalprice"]


def test_partition_transform_hour(spark, scratch):
    """hour() partitioning: written partition values land in the
    hours-from-epoch domain and equality pruning on the source timestamp
    keeps exactly the matching hour's files (tz-independent — ADVICE r1
    flagged the unix_timestamp session-tz hazard)."""
    from datetime import datetime

    cat = Catalog(os.path.join(scratch, "wh"))
    df = spark.createDataFrame(
        [(i, datetime(2024, 3, 1, 8 + (i % 3), 15), float(i)) for i in range(12)],
        "id INT, ts TIMESTAMP, v DOUBLE",
    )
    cat.create_table("ns.h", df.schema, partition_by=["hour(ts)"])
    cat.append("ns.h", spark, df)
    table = cat.load("ns.h")
    assert isinstance(table, IcebergTable)
    got = table.to_df(spark)
    assert got.count() == 12
    # equality pruning on the source timestamp hits one hour partition
    lit = datetime(2024, 3, 1, 9, 15)
    files = table.files(filters=("=", "ts", lit))
    assert files
    from datafusion_iceberg_spark.iceberg.transforms import apply

    want_hour = apply("hour", lit)
    assert all(f.partition["ts_hour"] == want_hour for f in files)
    assert len(files) < len(table.files())
    assert table.to_df(spark, filters=("=", "ts", lit)).count() == 4


def test_mor_delete_null_predicate_rows_kept(spark, scratch):
    """SQL DELETE semantics under MOR: rows where the predicate is NULL
    are kept (coalesce(pred, false) on the matched side)."""
    cat = Catalog(os.path.join(scratch, "wh"))
    df = spark.createDataFrame(
        [(1, 5.0), (2, None), (3, 50.0)], "id INT, x DOUBLE"
    )
    cat.create_table("ns.nm", df.schema)
    cat.append("ns.nm", spark, df)
    cat.delete_where_mor("ns.nm", spark, ("<", "x", 10.0))
    got = {r.id for r in cat.load("ns.nm").to_df(spark).collect()}
    assert got == {2, 3}  # NULL row kept, matching row gone


def test_bare_view_refreshes_on_reattach(spark, scratch):
    """ADVICE r2 #1 regression: a bare-name view created by attach() must
    be refreshed on the next attach() — otherwise the bare name serves the
    file list frozen at first attach after any append/delete/evolution.
    Views that existed BEFORE the catalog first attached stay untouched."""
    cat = Catalog(os.path.join(scratch, "wh"))
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id INT, s STRING")
    cat.create_table("ns.barev", df.schema)
    cat.append("ns.barev", spark, df)
    cat.attach(spark)
    assert spark.sql("SELECT count(*) AS c FROM barev").collect()[0].c == 2
    # append after attach: both the flat and the BARE view must see it
    cat.append("ns.barev", spark, spark.createDataFrame([(3, "c")], df.schema))
    cat.attach(spark)
    assert spark.sql("SELECT count(*) AS c FROM ns_barev").collect()[0].c == 3
    assert spark.sql("SELECT count(*) AS c FROM barev").collect()[0].c == 3
    # a pre-existing session view is never shadowed by attach()
    spark.createDataFrame([(99,)], "z INT").createOrReplaceTempView("preexist")
    cat.create_table("ns.preexist", df.schema)
    cat.append("ns.preexist", spark, df)
    cat.attach(spark)
    assert [r.z for r in spark.sql("SELECT z FROM preexist").collect()] == [99]
    spark.catalog.dropTempView("preexist")


def test_orphan_metadata_version_recovered(spark, scratch):
    """ADVICE r2 #2 regression: a writer that dies between writing
    v{N+1}.metadata.json and updating version-hint.text must not wedge
    the table — _current_version reconciles hint with the on-disk glob."""
    import json

    cat = Catalog(os.path.join(scratch, "wh"))
    df = spark.createDataFrame([(1, "a")], "id INT, s STRING")
    cat.create_table("ns.orph", df.schema)
    cat.append("ns.orph", spark, df)
    root = os.path.join(scratch, "wh", "ns", "orph")
    meta_dir = os.path.join(root, "metadata")
    hint = os.path.join(meta_dir, "version-hint.text")
    n = int(open(hint).read().strip())
    # simulate the crash: copy current metadata to v{N+1}, hint stays at N
    cur = json.load(open(os.path.join(meta_dir, f"v{n}.metadata.json")))
    with open(os.path.join(meta_dir, f"v{n+1}.metadata.json"), "w") as fh:
        json.dump(cur, fh)
    # next append must succeed (targets v{N+2}), not CommitConflict ×5
    cat.append("ns.orph", spark, spark.createDataFrame([(2, "b")], df.schema))
    assert cat.load("ns.orph").to_df(spark).count() == 2
    assert int(open(hint).read().strip()) == n + 2


# ---------------------------------------------------------------------------
# Equality deletes (Iceberg v2, VERDICT r4 item #3)
# ---------------------------------------------------------------------------


def test_equality_delete_basic_and_sequence(spark, sf_dir, scratch):
    """Equality delete removes matching keys from EARLIER commits only:
    keys re-appended after the delete survive (sequence semantics)."""
    cat = Catalog(os.path.join(scratch, "wh"))
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    cat.create_table("ns.eq", nation.schema)
    s1 = cat.append("ns.eq", spark, nation)
    cat.delete_where_eq(
        "ns.eq", spark, nation.filter(F.col("n_nationkey") < 10).select("n_nationkey")
    )
    table = cat.load("ns.eq")
    assert isinstance(table, IcebergTable)
    keys = {r.n_nationkey for r in table.to_df(spark).select("n_nationkey").collect()}
    assert keys == set(range(10, 25))
    # deleting absent keys is a no-op; stats turn inexact with eq deletes
    assert table.statistics()["is_exact"] is False

    # re-append five deleted keys — they must survive the earlier delete
    cat.append("ns.eq", spark, nation.filter(F.col("n_nationkey") < 5))
    table = cat.load("ns.eq")
    keys = {r.n_nationkey for r in table.to_df(spark).select("n_nationkey").collect()}
    assert keys == set(range(10, 25)) | set(range(0, 5))

    # time travel to snapshot 1 ignores the later delete entirely
    assert table.to_df(spark, snapshot_id=s1).count() == 25


def test_equality_delete_multi_column_nullsafe(spark, scratch):
    """Multi-column keys use null-safe equality: a (1, NULL) delete row
    removes the (1, NULL) data row, not every id=1 row."""
    cat = Catalog(os.path.join(scratch, "wh"))
    df = spark.createDataFrame(
        [(1, "a"), (1, None), (2, "a"), (2, None), (3, "b")],
        "id INT, grp STRING",
    )
    cat.create_table("ns.eqn", df.schema)
    cat.append("ns.eqn", spark, df)
    cat.delete_where_eq(
        "ns.eqn",
        spark,
        spark.createDataFrame([(1, None), (3, "b")], "id INT, grp STRING"),
    )
    table = cat.load("ns.eqn")
    assert isinstance(table, IcebergTable)
    rows = {
        (r.id, r.grp) for r in table.to_df(spark).collect()
    }
    assert rows == {(1, "a"), (2, "a"), (2, None)}


def test_mixed_position_and_equality_deletes(spark, sf_dir, scratch):
    """Both MOR delete flavors outstanding on one table compose; a
    subsequent copy-on-write DELETE folds both in (no resurrection)."""
    cat = Catalog(os.path.join(scratch, "wh"))
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    cat.create_table("ns.mix", nation.schema)
    cat.append("ns.mix", spark, nation)
    # position delete: keys 20-24; equality delete: keys 0-4
    cat.delete_where_mor("ns.mix", spark, (">=", "n_nationkey", 20))
    cat.delete_where_eq(
        "ns.mix", spark, nation.filter(F.col("n_nationkey") < 5).select("n_nationkey")
    )
    table = cat.load("ns.mix")
    assert isinstance(table, IcebergTable)
    keys = {r.n_nationkey for r in table.to_df(spark).select("n_nationkey").collect()}
    assert keys == set(range(5, 20))

    # copy-on-write delete of one more key folds outstanding MOR deletes
    cat.delete_where("ns.mix", spark, ("=", "n_nationkey", 10))
    table = cat.load("ns.mix")
    keys = {r.n_nationkey for r in table.to_df(spark).select("n_nationkey").collect()}
    assert keys == set(range(5, 20)) - {10}
    # and the new snapshot carries no delete manifests at all
    assert table.position_delete_files() == []
    assert table.equality_delete_files() == []


def test_equality_delete_unknown_column_raises(spark, sf_dir, scratch):
    cat = Catalog(os.path.join(scratch, "wh"))
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    cat.create_table("ns.eqbad", nation.schema)
    cat.append("ns.eqbad", spark, nation)
    with pytest.raises(ValueError, match="not in table schema"):
        cat.delete_where_eq(
            "ns.eqbad", spark, spark.createDataFrame([(1,)], "nope INT")
        )


# ---------------------------------------------------------------------------
# Partition-spec evolution (VERDICT r4 item #4)
# ---------------------------------------------------------------------------


def test_partition_spec_evolution_scan(spark, sf_dir, scratch):
    """Manifests written under different specs each attach their own
    directory-only partition column; results exact across the mix."""
    cat = Catalog(os.path.join(scratch, "wh"))
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cat.create_table("ns.ev", orders.schema, partition_by=["o_orderstatus"])
    even = orders.filter(F.col("o_orderkey") % 2 == 0)
    odd = orders.filter(F.col("o_orderkey") % 2 != 0)
    cat.append("ns.ev", spark, even)
    new_id = cat.evolve_partition_spec("ns.ev", ["o_orderpriority"])
    assert new_id == 1
    cat.append("ns.ev", spark, odd)

    table = cat.load("ns.ev")
    assert isinstance(table, IcebergTable)
    # per-file spec ids: both specs present among live files
    assert {f.spec_id for f in table.files()} == {0, 1}
    got = table.to_df(spark)
    assert got.count() == orders.count()
    # both partition columns fully populated (attached from the right spec)
    assert got.filter(F.col("o_orderstatus").isNull()).count() == 0
    assert got.filter(F.col("o_orderpriority").isNull()).count() == 0

    # filtered scan across the mix stays exact; spec-0 manifests prune on
    # the o_orderstatus summary, spec-1 manifests degrade conservatively
    pred = ("=", "o_orderstatus", "F")
    want = orders.filter(F.col("o_orderstatus") == "F").count()
    assert table.to_df(spark, filters=pred).count() == want
    f_files = table.files(filters=pred)
    # every spec-1 (odd) file survives manifest pruning only if it may
    # match; all spec-0 files kept must be from the F partition
    assert all(
        f.partition.get("o_orderstatus") == "F"
        for f in f_files
        if f.spec_id == 0
    )


def test_spec_evolution_transform_and_unpartition(spark, sf_dir, scratch):
    """Evolving to a bucket transform and then to unpartitioned: the
    transformed-domain pruning pass evaluates each file under ITS spec,
    and an unpartitioned tail spec scans fine."""
    cat = Catalog(os.path.join(scratch, "wh"))
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    cat.create_table("ns.evb", nation.schema, partition_by=["n_regionkey"])
    cat.append("ns.evb", spark, nation.filter(F.col("n_nationkey") < 10))
    cat.evolve_partition_spec("ns.evb", ["bucket(4, n_nationkey)"])
    cat.append(
        "ns.evb",
        spark,
        nation.filter((F.col("n_nationkey") >= 10) & (F.col("n_nationkey") < 20)),
    )
    cat.evolve_partition_spec("ns.evb", None)
    cat.append("ns.evb", spark, nation.filter(F.col("n_nationkey") >= 20))

    table = cat.load("ns.evb")
    assert isinstance(table, IcebergTable)
    assert table.to_df(spark).count() == 25
    # point predicate on the bucketed column: exact under every spec
    got = table.to_df(spark, filters=("=", "n_nationkey", 12))
    assert [r.n_nationkey for r in got.collect()] == [12]
    # pruning never drops a matching file across the three specs
    for k in (3, 12, 23):
        files = table.files(filters=("=", "n_nationkey", k))
        scanned = table._scan_files(spark, files, ("=", "n_nationkey", k))
        assert scanned.count() == 1


def test_spec_evolution_writer_rebuild_uses_new_spec(spark, sf_dir, scratch):
    """A writer rebuilt from metadata after evolution stamps the new spec
    id and partitions new data by the new layout."""
    cat = Catalog(os.path.join(scratch, "wh"))
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    cat.create_table("ns.evw", nation.schema)
    cat.append("ns.evw", spark, nation.filter(F.col("n_nationkey") < 5))
    cat.evolve_partition_spec("ns.evw", ["n_regionkey"])
    cat.append("ns.evw", spark, nation.filter(F.col("n_nationkey") >= 5))
    table = cat.load("ns.evw")
    assert isinstance(table, IcebergTable)
    new_files = [f for f in table.files() if f.spec_id == 1]
    assert new_files and all(
        f.partition.get("n_regionkey") is not None for f in new_files
    )
    assert table.to_df(spark).count() == 25


# ---------------------------------------------------------------------------
# Nested types through the writer (VERDICT r4 item #5)
# ---------------------------------------------------------------------------


def test_nested_schema_ids_unique_and_roundtrip(spark, scratch):
    """Struct/list/map schema serialization allocates unique element/key/
    value/subfield ids, records last-column-id past them, and the schema
    round-trips metadata → StructType."""
    import json as _json

    df = spark.createDataFrame(
        [(1, {"a": 1, "b": "x"}, [1, 2], {"k": 2.0})],
        "id INT, s STRUCT<a: INT, b: STRING>, l ARRAY<INT>, m MAP<STRING, DOUBLE>",
    )
    cat = Catalog(os.path.join(scratch, "wh"))
    cat.create_table("ns.nest", df.schema)
    cat.append("ns.nest", spark, df)
    table = cat.load("ns.nest")
    assert isinstance(table, IcebergTable)

    meta_raw = table.metadata.raw
    schema = meta_raw["schemas"][-1]

    def walk_ids(t, out):
        if isinstance(t, dict):
            if t["type"] == "struct":
                for f in t["fields"]:
                    out.append(f["id"])
                    walk_ids(f["type"], out)
            elif t["type"] == "list":
                out.append(t["element-id"])
                walk_ids(t["element"], out)
            elif t["type"] == "map":
                out.append(t["key-id"])
                out.append(t["value-id"])
                walk_ids(t["key"], out)
                walk_ids(t["value"], out)

    ids = []
    walk_ids({"type": "struct", "fields": schema["fields"]}, ids)
    assert len(ids) == len(set(ids)), f"duplicate field ids: {ids}"
    assert meta_raw["last-column-id"] == max(ids)
    # round-trip back to Spark types
    assert table.metadata.struct_type() == df.schema
    # scan returns the nested values intact
    row = table.to_df(spark).collect()[0]
    assert row.s.a == 1 and row.s.b == "x"
    assert row.l == [1, 2] and row.m == {"k": 2.0}
    _json.dumps(meta_raw)  # metadata must stay JSON-serializable


def test_nested_writer_rebuild_preserves_ids(spark, scratch):
    """A writer rebuilt from metadata must keep the recorded nested ids
    (not re-allocate) — a second append then a scan stays consistent."""
    df = spark.createDataFrame(
        [(1, [10, 20])], "id INT, vals ARRAY<INT>"
    )
    cat = Catalog(os.path.join(scratch, "wh"))
    cat.create_table("ns.nest2", df.schema)
    cat.append("ns.nest2", spark, df)
    ids_before = cat.load("ns.nest2").metadata.raw["schemas"][-1]
    cat.append(
        "ns.nest2", spark, spark.createDataFrame([(2, [30])], df.schema)
    )
    table = cat.load("ns.nest2")
    assert isinstance(table, IcebergTable)
    assert table.metadata.raw["schemas"][-1] == ids_before
    got = {r.id: r.vals for r in table.to_df(spark).collect()}
    assert got == {1: [10, 20], 2: [30]}


def test_add_nested_column(spark, scratch):
    """ADD COLUMN with a nested type allocates ids after the column's own
    id; old rows read as NULL."""
    df = spark.createDataFrame([(1,)], "id INT")
    cat = Catalog(os.path.join(scratch, "wh"))
    cat.create_table("ns.nest3", df.schema)
    cat.append("ns.nest3", spark, df)
    from pyspark.sql import types as TT

    cat.add_column("ns.nest3", "tags", TT.ArrayType(TT.StringType()))
    cat.append(
        "ns.nest3",
        spark,
        spark.createDataFrame([(2, ["a", "b"])], "id INT, tags ARRAY<STRING>"),
    )
    table = cat.load("ns.nest3")
    assert isinstance(table, IcebergTable)
    got = {r.id: r.tags for r in table.to_df(spark).collect()}
    assert got == {1: None, 2: ["a", "b"]}


# ---------------------------------------------------------------------------
# SQL-surface time travel (VERDICT r4 item #6)
# ---------------------------------------------------------------------------


def test_sql_time_travel(spark, sf_dir, scratch):
    """FOR VERSION AS OF / FOR TIMESTAMP AS OF on 3-part catalog names;
    literals inside strings stay untouched; SYSTEM_ prefixes accepted."""
    cat = Catalog(os.path.join(scratch, "wh"), name="tcat")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    cat.create_table("ns.tt", nation.schema)
    s1 = cat.append("ns.tt", spark, nation.filter(F.col("n_nationkey") < 10))
    table = cat.load("ns.tt")
    assert isinstance(table, IcebergTable)
    ts1 = table.metadata.snapshot(snapshot_id=s1).timestamp_ms
    import time as _time

    _time.sleep(0.01)
    cat.append("ns.tt", spark, nation.filter(F.col("n_nationkey") >= 10))

    # current: 25 rows; VERSION AS OF s1: 10 rows
    assert cat.sql(spark, "SELECT COUNT(*) AS n FROM tcat.ns.tt").collect()[0].n == 25
    got = cat.sql(
        spark, f"SELECT COUNT(*) AS n FROM tcat.ns.tt FOR VERSION AS OF {s1}"
    )
    assert got.collect()[0].n == 10
    # SYSTEM_VERSION spelling + epoch-millis timestamp
    assert (
        cat.sql(
            spark,
            f"SELECT COUNT(*) AS n FROM tcat.ns.tt FOR SYSTEM_VERSION AS OF {s1}",
        ).collect()[0].n
        == 10
    )
    assert (
        cat.sql(
            spark,
            f"SELECT COUNT(*) AS n FROM tcat.ns.tt FOR TIMESTAMP AS OF {ts1}",
        ).collect()[0].n
        == 10
    )
    # ISO timestamp literal (UTC) after the second append → sees all rows
    from datetime import datetime, timezone

    iso_now = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M:%S.%f")
    assert (
        cat.sql(
            spark,
            f"SELECT COUNT(*) AS n FROM tcat.ns.tt FOR TIMESTAMP AS OF '{iso_now}'",
        ).collect()[0].n
        == 25
    )
    # the phrase inside a string literal is NOT rewritten
    got = cat.sql(
        spark,
        "SELECT 'tcat.ns.tt FOR VERSION AS OF 1' AS s FROM tcat.ns.tt LIMIT 1",
    )
    assert got.collect()[0].s == "tcat.ns.tt FOR VERSION AS OF 1"


def test_catalog_name_collision_edge_cases(spark, sf_dir, scratch):
    """ADVICE r4: (1) three-part struct-field access through an alias that
    shares the catalog name passes through (middle segment is not a
    registered namespace); (2) a two-part table reference with the
    namespace omitted raises this layer's clear error, not Spark's
    generic one."""
    cat = Catalog(os.path.join(scratch, "wh"), name="mycat")
    df = spark.createDataFrame(
        [(1, {"width_hint": 7, "mt": "img"})],
        "id INT, meta STRUCT<width_hint: INT, mt: STRING>",
    )
    cat.create_table("geo.media", df.schema)
    cat.append("geo.media", spark, df)

    # struct-field access through an alias sharing the catalog name
    got = cat.sql(
        spark,
        "SELECT mycat.meta.width_hint AS w FROM geo_media AS mycat",
    )
    assert got.collect()[0].w == 7
    # ... and through the rewritten 3-part name under the same alias
    got = cat.sql(
        spark,
        "SELECT mycat.meta.width_hint AS w FROM mycat.geo.media AS mycat",
    )
    assert got.collect()[0].w == 7

    # two-part table reference (namespace omitted) → clear error here
    with pytest.raises(ValueError, match="unresolved catalog reference"):
        cat.sql(spark, "SELECT * FROM mycat.media")
    # unknown namespace in table position → clear error too
    with pytest.raises(ValueError, match="unresolved catalog reference"):
        cat.sql(spark, "SELECT * FROM mycat.nope.media")
    # known namespace + unknown table outside table position → clear error
    with pytest.raises(ValueError, match="unresolved catalog reference"):
        cat.sql(
            spark,
            "SELECT (SELECT COUNT(*) FROM geo_media WHERE id = mycat.geo.nope.x)"
            " FROM geo_media",
        )

    # ADVICE r5: even when the STRUCT FIELD name collides with a
    # registered namespace, an alias/CTE shadowing the catalog name wins —
    # 'mycat.meta.width_hint' is a field access, not a table miss
    cat.create_namespace("meta")
    cat.create_table(
        "meta.stats", spark.createDataFrame([(1,)], "id INT").schema
    )
    got = cat.sql(
        spark,
        "SELECT mycat.meta.width_hint AS w FROM geo_media AS mycat",
    )
    assert got.collect()[0].w == 7
    # CTE named like the catalog shadows it too
    got = cat.sql(
        spark,
        "WITH mycat AS (SELECT * FROM geo_media) "
        "SELECT mycat.meta.width_hint AS w FROM mycat",
    )
    assert got.collect()[0].w == 7
    # with NO shadowing alias, the same dotted path still raises
    with pytest.raises(ValueError, match="unresolved catalog reference"):
        cat.sql(
            spark,
            "SELECT g.id FROM geo_media AS g WHERE g.id = mycat.meta.nope.x",
        )


# ---------------------------------------------------------------------------
# Split handoff: directory-compacted read paths (VERDICT r4 item #2)
# ---------------------------------------------------------------------------


def test_compact_read_paths(tmp_path):
    from datafusion_iceberg_spark.iceberg.table import _compact_read_paths

    d1 = tmp_path / "snap-1"
    d2 = tmp_path / "snap-2"
    d1.mkdir()
    d2.mkdir()
    for i in range(5):
        (d1 / f"f{i}.parquet").write_bytes(b"x")
        (d2 / f"g{i}.parquet").write_bytes(b"x")
    (d1 / "_SUCCESS").write_bytes(b"")  # ignored clutter
    full1 = [str(d1 / f"f{i}.parquet") for i in range(5)]
    full2 = [str(d2 / f"g{i}.parquet") for i in range(5)]

    # below threshold: untouched
    assert _compact_read_paths(full1, threshold=64) == full1
    # exact coverage → one directory per group
    got = _compact_read_paths(full1 + full2, threshold=1)
    assert sorted(got) == sorted([str(d1), str(d2)])
    # partial coverage (a dead file on disk) → explicit files survive
    got = _compact_read_paths(full1[:-1] + full2, threshold=1)
    assert sorted(got) == sorted(full1[:-1] + [str(d2)])
    # a subdirectory in the dir blocks compaction (discovery risk)
    (d2 / "part=x").mkdir()
    got = _compact_read_paths(full1 + full2, threshold=1)
    assert sorted(got) == sorted([str(d1)] + full2)
    # scheme-prefixed paths never compact
    s3 = [f"s3://bucket/dir/f{i}.parquet" for i in range(3)]
    assert _compact_read_paths(s3, threshold=1) == s3


def test_dir_compacted_scan_excludes_dead_files(spark, sf_dir, scratch):
    """After a COW delete, the old snapshot directory still holds the
    pre-rewrite (dead) files — coverage fails there and the scan must not
    resurrect them through a directory read."""
    cat = Catalog(os.path.join(scratch, "wh"))
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    cat.create_table("ns.dead", nation.schema)
    cat.append("ns.dead", spark, nation.repartition(5))
    cat.delete_where("ns.dead", spark, ("<", "n_nationkey", 3))
    table = cat.load("ns.dead")
    assert isinstance(table, IcebergTable)
    from datafusion_iceberg_spark.iceberg.table import _compact_read_paths

    paths = [table.metadata.localize(f.path) for f in table.files()]
    compacted = _compact_read_paths(paths, threshold=1)
    # survivors from the rewritten first snapshot stay explicit
    assert any(p.endswith(".parquet") for p in compacted)
    assert table.to_df(spark).count() == 22


def test_fileio_s3_stub_roundtrip():
    """S3 FileIO driven by an in-process boto3-compatible fake (VERDICT
    r4 item #7): metadata JSON + manifest-list + manifest Avro round-trip
    over s3:// through the scheme router with zero network — the offline
    stand-in for the reference's env-gated S3 catalog test
    (catalog.rs:85-96)."""
    import json as _json

    from datafusion_iceberg_spark.iceberg import io as iio
    from datafusion_iceberg_spark.iceberg.avro import (
        read_avro_file,
        write_avro_file,
    )
    from datafusion_iceberg_spark.iceberg.manifests import (
        read_manifest,
        read_manifest_list,
    )
    from datafusion_iceberg_spark.iceberg.metadata import load_table_metadata

    class FakeS3Client:
        """The five boto3 S3 calls S3IO issues, over a dict."""

        def __init__(self):
            self.objects: dict[tuple[str, str], bytes] = {}

        def put_object(self, Bucket, Key, Body):
            self.objects[(Bucket, Key)] = bytes(Body)

        def get_object(self, Bucket, Key):
            import io as _io

            if (Bucket, Key) not in self.objects:
                raise KeyError((Bucket, Key))
            return {"Body": _io.BytesIO(self.objects[(Bucket, Key)])}

        def head_object(self, Bucket, Key):
            if (Bucket, Key) not in self.objects:
                raise FileNotFoundError((Bucket, Key))
            return {"ContentLength": len(self.objects[(Bucket, Key)])}

        def get_paginator(self, op):
            assert op == "list_objects_v2"
            objects = self.objects

            class P:
                def paginate(self, Bucket, Prefix):
                    keys = sorted(
                        k for b, k in objects if b == Bucket and k.startswith(Prefix)
                    )
                    # one page per 2 keys: exercises multi-page listing
                    for i in range(0, len(keys), 2):
                        yield {"Contents": [{"Key": k} for k in keys[i : i + 2]]}

            return P()

    fake = FakeS3Client()
    prev = iio._REGISTRY.get("s3")
    iio.register_io("s3", iio.S3IO(client=fake))
    try:
        root = "s3://lake/wh/nyc/taxis"
        with open(os.path.join(FIXTURE, "metadata", "v1.metadata.json")) as fh:
            raw = fh.read()
        iio.get_io(root).write_bytes(
            f"{root}/metadata/v1.metadata.json", raw.encode()
        )
        # no version hint → glob (paginated listing) finds v1
        meta = load_table_metadata(root)
        assert meta.raw == _json.loads(raw)

        # manifest-list + manifest avro round-trip at s3:// paths
        from datafusion_iceberg_spark.iceberg.writer import (
            _MANIFEST_LIST_SCHEMA,
            _manifest_schema,
        )

        mpath = f"{root}/metadata/aa-m0.avro"
        write_avro_file(
            mpath,
            _manifest_schema([]),
            [
                {
                    "status": 1,
                    "snapshot_id": 7,
                    "data_file": {
                        "file_path": f"{root}/data/f1.parquet",
                        "file_format": "PARQUET",
                        "partition": {},
                        "record_count": 3,
                        "file_size_in_bytes": 99,
                        "block_size_in_bytes": 1,
                        "content": 0,
                    },
                }
            ],
        )
        lpath = f"{root}/metadata/snap-7.avro"
        write_avro_file(
            lpath,
            _MANIFEST_LIST_SCHEMA,
            [
                {
                    "manifest_path": mpath,
                    "manifest_length": iio.get_io(mpath).getsize(mpath),
                    "partition_spec_id": 0,
                    "added_snapshot_id": 7,
                    "added_data_files_count": 1,
                    "existing_data_files_count": 0,
                    "deleted_data_files_count": 0,
                    "partitions": None,
                    "added_rows_count": 3,
                    "existing_rows_count": 0,
                    "deleted_rows_count": 0,
                    "content": 0,
                }
            ],
        )
        mfs = read_manifest_list(lpath)
        assert len(mfs) == 1 and mfs[0].path == mpath
        dfs = read_manifest(mfs[0].path)
        assert len(dfs) == 1
        assert dfs[0].path == f"{root}/data/f1.parquet"
        assert dfs[0].record_count == 3

        # version hint now points at the same metadata (hint path works)
        iio.get_io(root).write_bytes(
            f"{root}/metadata/version-hint.text", b"1"
        )
        assert load_table_metadata(root).raw == _json.loads(raw)
        # multi-page pagination really happened (>2 keys under metadata/)
        _, _, key = root.partition("s3://")[2].partition("/")
        n_meta = sum(
            1 for b, k in fake.objects if k.startswith("wh/nyc/taxis/metadata/")
        )
        assert n_meta >= 3
    finally:
        if prev is not None:
            iio._REGISTRY["s3"] = prev
        else:
            iio._REGISTRY.pop("s3", None)


# -- changelog (CDC) scan ----------------------------------------------


def _changelog_counts(log):
    out = {}
    for r in log.groupBy("_change_ordinal", "_change_type").count().collect():
        out[(r["_change_ordinal"], r["_change_type"])] = r["count"]
    return out


def test_changelog_cow_update_and_compaction(spark, sf_dir, scratch):
    """COW update surfaces as delete+insert at one ordinal; compaction
    (replace) emits nothing; range slicing honors (from, to]."""
    import shutil

    from datafusion_iceberg_spark.iceberg.catalog import Catalog
    from datafusion_iceberg_spark.tables import load_table

    root = os.path.join(scratch, "wh_changelog")
    shutil.rmtree(root, ignore_errors=True)
    cat = Catalog(root)
    nation = load_table(spark, sf_dir, "nation")
    cat.create_table("t.n", nation.schema)
    s1 = cat.append("t.n", spark, nation)
    # COW update: bump one nation's comment
    cat.update_where(
        "t.n",
        spark,
        ("=", "n_nationkey", 7),
        {"n_name": "'UPDATED'"},
    )
    t = cat.load("t.n")
    s2 = t.metadata.current_snapshot_id
    s3 = cat.compact("t.n", spark)
    t = cat.load("t.n")
    # full history: 25 inserts @0, 1 delete + 1 insert @1, nothing @2
    log = t.changelog_df(spark)
    counts = _changelog_counts(log)
    assert counts[(0, "insert")] == 25
    assert counts[(1, "delete")] == 1
    assert counts[(1, "insert")] == 1
    assert (2, "insert") not in counts and (2, "delete") not in counts
    row = [
        tuple(r)
        for r in log.filter("_change_type = 'insert' AND _change_ordinal = 1")
        .select("n_nationkey", "n_name")
        .collect()
    ]
    assert row == [(7, "UPDATED")]
    # slice: only the update commit
    sliced = t.changelog_df(spark, from_snapshot_id=s1, to_snapshot_id=s2)
    c2 = _changelog_counts(sliced)
    assert c2 == {(1, "delete"): 1, (1, "insert"): 1}
    # slice ending at s1: only the initial load
    first = t.changelog_df(spark, to_snapshot_id=s1)
    assert _changelog_counts(first) == {(0, "insert"): 25}
    # empty window
    assert t.changelog_df(spark, from_snapshot_id=s3).count() == 0


def test_changelog_append_only_matches_incremental(spark, sf_dir, scratch):
    from datafusion_iceberg_spark.iceberg.queries import fixture

    fx = fixture(spark, sf_dir)
    log = fx.orders.changelog_df(spark, from_snapshot_id=fx.snap1)
    assert log.filter("_change_type <> 'insert'").count() == 0
    inc = fx.orders.incremental_df(spark, fx.snap1, fx.snap2)
    assert log.count() == inc.count()


def test_count_star_metadata_vs_fallback(spark, sf_dir, scratch):
    from datafusion_iceberg_spark.iceberg.queries import _cdc_fixture, fixture

    fx = fixture(spark, sf_dir)
    # metadata path needs no SparkSession at all
    assert fx.orders.count_star() == fx.orders.to_df(spark).count()
    assert (
        fx.orders.count_star(snapshot_id=fx.snap1)
        == fx.orders.to_df(spark, snapshot_id=fx.snap1).count()
    )
    cdc = _cdc_fixture(spark, sf_dir).load("cdc.orders")
    # MOR deletes present -> metadata alone must refuse
    import pytest as _pytest

    with _pytest.raises(ValueError):
        cdc.count_star()
    assert cdc.count_star(spark) == cdc.to_df(spark).count()


def test_changelog_equality_delete(spark, sf_dir, scratch):
    """Equality-delete commits surface as delete rows; rows re-appended
    after the delete survive and show as inserts."""
    import shutil

    from datafusion_iceberg_spark.iceberg.catalog import Catalog
    from datafusion_iceberg_spark.tables import load_table
    from pyspark.sql import functions as F

    root = os.path.join(scratch, "wh_changelog_eq")
    shutil.rmtree(root, ignore_errors=True)
    cat = Catalog(root)
    nation = load_table(spark, sf_dir, "nation")
    cat.create_table("t.n", nation.schema)
    cat.append("t.n", spark, nation)
    keys = nation.filter(F.col("n_nationkey") < 5).select("n_nationkey")
    cat.delete_where_eq("t.n", spark, keys)
    cat.append("t.n", spark, nation.filter(F.col("n_nationkey") == 3))
    t = cat.load("t.n")
    counts = _changelog_counts(t.changelog_df(spark))
    assert counts == {(0, "insert"): 25, (1, "delete"): 5, (2, "insert"): 1}
    assert t.to_df(spark).count() == 21


def test_remove_orphan_files(spark, sf_dir, scratch):
    import shutil

    from datafusion_iceberg_spark.iceberg.catalog import Catalog
    from datafusion_iceberg_spark.tables import load_table

    root = os.path.join(scratch, "wh_orphans")
    shutil.rmtree(root, ignore_errors=True)
    cat = Catalog(root)
    nation = load_table(spark, sf_dir, "nation")
    cat.create_table("t.n", nation.schema)
    cat.append("t.n", spark, nation)
    cat.compact("t.n", spark)  # old snapshot's files stay REFERENCED
    w = cat.writer("t.n")
    assert w.remove_orphan_files(dry_run=True) == {"orphan_files": 0}
    data_dir = os.path.join(cat.load("t.n").metadata.root, "data")
    stray = os.path.join(data_dir, "stray.parquet")
    with open(stray, "wb") as fh:
        fh.write(b"junk")
    # age guard: a fresh file is protected when min_age_ms is high
    assert w.remove_orphan_files(min_age_ms=60_000) == {"orphan_files": 0}
    assert os.path.exists(stray)
    assert w.remove_orphan_files(dry_run=True) == {"orphan_files": 1}
    assert os.path.exists(stray)  # dry run never deletes
    assert w.remove_orphan_files() == {"orphan_files": 1}
    assert not os.path.exists(stray)
    # table and its time-travel history intact
    t = cat.load("t.n")
    assert t.to_df(spark).count() == 25
    first = sorted(t.metadata.snapshots, key=lambda s: s.timestamp_ms)[0]
    assert t.to_df(spark, snapshot_id=first.snapshot_id).count() == 25


def test_rest_catalog_shares_sql_surface(spark, sf_dir, scratch):
    """The REST mirror inherits the full SqlSurface: 3-part names,
    $metadata tables, and time travel all work through rest.sql()."""
    from datafusion_iceberg_spark.iceberg.rest_catalog import (
        LocalRestServer,
        RestCatalog,
        RestCatalogClient,
    )

    cat, nation = _rest_fixture_warehouse(spark, sf_dir, scratch)
    with LocalRestServer(cat.warehouse) as base:
        rest = RestCatalog(RestCatalogClient(base))
        n = rest.sql(
            spark, "SELECT COUNT(*) AS n FROM rest.ns.nation"
        ).first()["n"]
        assert n == 25
        snaps = rest.sql(
            spark,
            "SELECT operation, is_current FROM rest.ns.nation$snapshots",
        ).collect()
        assert [(s.operation, s.is_current) for s in snaps] == [("append", True)]
        sid = rest.load("ns.nation").metadata.current_snapshot_id
        n2 = rest.sql(
            spark,
            f"SELECT COUNT(*) AS n FROM rest.ns.nation FOR VERSION AS OF {sid}",
        ).first()["n"]
        assert n2 == 25
        import pytest as _pytest

        with _pytest.raises(ValueError, match="unresolved catalog"):
            rest.sql(spark, "SELECT * FROM rest.ns.nope")


# -- write-audit-publish (stage on branch, fast-forward main) -----------


def test_wap_stage_audit_publish(spark, sf_dir, scratch):
    import shutil

    from datafusion_iceberg_spark.iceberg.catalog import Catalog
    from datafusion_iceberg_spark.iceberg.writer import CommitConflict
    from datafusion_iceberg_spark.tables import load_table
    from pyspark.sql import functions as F

    root = os.path.join(scratch, "wh_wap")
    shutil.rmtree(root, ignore_errors=True)
    cat = Catalog(root)
    nation = load_table(spark, sf_dir, "nation")
    cat.create_table("t.n", nation.schema)
    cat.append("t.n", spark, nation.filter(F.col("n_nationkey") < 20))
    main_before = cat.load("t.n").metadata.current_snapshot_id

    staged = cat.stage_append(
        "t.n", spark, nation.filter(F.col("n_nationkey") >= 20), "audit"
    )
    t = cat.load("t.n")
    # main did not move; the branch sees the staged rows
    assert t.metadata.current_snapshot_id == main_before
    assert t.to_df(spark).count() == 20
    assert t.to_df(spark, ref="audit").count() == 25
    # staged snapshot is invisible to changelog and TIMESTAMP AS OF
    assert t.changelog_df(spark).count() == 20
    snaps = {r.snapshot_id: r for r in t.inspect.snapshots(spark).collect()}
    assert snaps[staged].parent_id == main_before
    assert not snaps[staged].is_current

    # publish
    published = cat.fast_forward("t.n", "audit")
    assert published == staged
    t = cat.load("t.n")
    assert t.metadata.current_snapshot_id == staged
    assert t.to_df(spark).count() == 25
    assert t.changelog_df(spark).count() == 25
    assert "audit" not in t.metadata.raw.get("refs", {})


def test_wap_fast_forward_conflict(spark, sf_dir, scratch):
    import shutil

    from datafusion_iceberg_spark.iceberg.catalog import Catalog
    from datafusion_iceberg_spark.iceberg.writer import CommitConflict
    from datafusion_iceberg_spark.tables import load_table
    from pyspark.sql import functions as F

    root = os.path.join(scratch, "wh_wap2")
    shutil.rmtree(root, ignore_errors=True)
    cat = Catalog(root)
    nation = load_table(spark, sf_dir, "nation")
    cat.create_table("t.n", nation.schema)
    cat.append("t.n", spark, nation.filter(F.col("n_nationkey") < 10))
    cat.stage_append(
        "t.n", spark, nation.filter(F.col("n_nationkey") >= 20), "audit"
    )
    # main moves while the audit runs -> publish must refuse (the staged
    # manifest list lacks this append; fast-forwarding would drop it)
    cat.append(
        "t.n",
        spark,
        nation.filter((F.col("n_nationkey") >= 10) & (F.col("n_nationkey") < 20)),
    )
    import pytest as _pytest

    with _pytest.raises(CommitConflict, match="re-stage"):
        cat.fast_forward("t.n", "audit")
    # table unaffected by the failed publish
    assert cat.load("t.n").to_df(spark).count() == 20


def test_zorder_prunes_both_dimensions(spark, sf_dir, scratch):
    """After the z-order rewrite, a box predicate on (o_custkey,
    o_totalprice) prunes files on BOTH columns; a corner box must scan
    strictly fewer files than the table has."""
    from datafusion_iceberg_spark.iceberg.queries import _zorder_fixture

    cat = _zorder_fixture(spark, sf_dir)
    t = cat.load("z.orders")
    all_files = t.files()
    assert len(all_files) > 2  # rewrite produced a real spread
    pred = ("and", ("<=", "o_custkey", 40), ("<=", "o_totalprice", 80000))
    pruned = t.files(pred)
    assert len(pruned) < len(all_files)
    # single-dimension predicates prune too (z-order is fair to each dim)
    p1 = t.files(("<=", "o_custkey", 20))
    p2 = t.files(("<=", "o_totalprice", 50000))
    assert len(p1) < len(all_files)
    assert len(p2) < len(all_files)
    # and the rewrite lost nothing
    assert t.to_df(spark).count() == t.count_star()


def test_zorder_rejects_bad_columns(spark, sf_dir, scratch):
    from datafusion_iceberg_spark.iceberg.queries import _zorder_fixture

    cat = _zorder_fixture(spark, sf_dir)
    with pytest.raises(ValueError, match="2-4"):
        cat.rewrite_zorder("z.orders", spark, ["o_custkey"])
    with pytest.raises(ValueError, match="stats"):
        cat.rewrite_zorder("z.orders", spark, ["o_orderstatus", "o_custkey"])


def test_zvalue_properties(spark):
    """z-value invariants, evaluated through the REAL SQL expression on
    a grid: per-dimension monotonicity (fixing the other coordinate),
    range bound < 2^(2*bits), and NULL ranking first."""
    from pyspark.sql import functions as F

    from datafusion_iceberg_spark.iceberg.writer import zvalue_sql

    z = zvalue_sql([("x", 0, 65535), ("y", 0, 65535)])
    grid = spark.range(0, 255 * 64).select(
        ((F.col("id") % 255) * 257).alias("x"),
        ((F.col("id") / 255).cast("long") * 4099 % 65536).alias("y"),
    ).withColumn("z", F.expr(z))
    assert grid.filter(F.col("z") >= F.lit(1 << 32)).count() == 0
    assert grid.filter(F.col("z") < 0).count() == 0
    # monotone in x for fixed y, and in y for fixed x
    from pyspark.sql import window as W

    for fix, var in (("y", "x"), ("x", "y")):
        w = W.Window.partitionBy(fix).orderBy(var)
        bad = (
            grid.withColumn("pz", F.lag("z").over(w))
            .filter(F.col("pz").isNotNull() & (F.col("z") <= F.col("pz")))
            .count()
        )
        assert bad == 0, f"z not monotone in {var}"
    # NULL coordinate ranks first (z contributes 0 bits for it)
    nz = spark.sql("SELECT CAST(NULL AS BIGINT) AS x, 65535 AS y").withColumn(
        "z", F.expr(z)
    )
    lo = spark.sql("SELECT 0 AS x, 65535 AS y").withColumn("z", F.expr(z))
    assert nz.first()["z"] == lo.first()["z"]


def test_sampling_hash_bucket_engine_parity_and_spread(spark):
    """hash_bucket must equal the python md5 reimplementation for
    arbitrary keys (engine portability is the design contract) and
    spread roughly uniformly."""
    import hashlib

    from pyspark.sql import functions as F

    from datafusion_iceberg_spark.extensions.sampling import hash_bucket

    rows = spark.range(0, 5000).select(
        F.col("id"), hash_bucket(F.col("id")).alias("b")
    )
    got = {r.id: r.b for r in rows.collect()}
    for k, v in list(got.items())[:500]:
        expect = int(hashlib.md5(str(k).encode()).hexdigest()[:4], 16) % 100
        assert v == expect, (k, v, expect)
    counts = rows.groupBy("b").count().collect()
    assert len(counts) == 100
    assert all(20 <= r["count"] <= 90 for r in counts)  # ~50 expected


def test_expire_never_drops_current_under_staged(spark, sf_dir, scratch):
    """A staged WAP snapshot is newer than main; expire(keep_last=1)
    must still keep what main points at."""
    import shutil

    from datafusion_iceberg_spark.iceberg.catalog import Catalog
    from datafusion_iceberg_spark.tables import load_table
    from pyspark.sql import functions as F

    root = os.path.join(scratch, "wh_expire_staged")
    shutil.rmtree(root, ignore_errors=True)
    cat = Catalog(root)
    nation = load_table(spark, sf_dir, "nation")
    cat.create_table("t.n", nation.schema)
    cat.append("t.n", spark, nation.filter(F.col("n_nationkey") < 10))
    cat.append("t.n", spark, nation.filter(
        (F.col("n_nationkey") >= 10) & (F.col("n_nationkey") < 20)))
    cat.stage_append("t.n", spark, nation.filter(F.col("n_nationkey") >= 20), "audit")
    out = cat.writer("t.n").expire_snapshots(keep_last=1)
    # only the FIRST main snapshot could expire; current and staged stay
    assert out["expired_snapshots"] == 1
    t = cat.load("t.n")
    assert t.to_df(spark).count() == 20
    assert t.to_df(spark, ref="audit").count() == 25
    cat.fast_forward("t.n", "audit")
    assert cat.load("t.n").to_df(spark).count() == 25


def test_rewrite_manifests_metadata_only(spark, sf_dir, scratch):
    """Manifest compaction must keep the EXACT data-file set (no data
    rewrite), preserve time travel, and refuse with outstanding deletes."""
    import os

    from datafusion_iceberg_spark.iceberg.catalog import Catalog
    from datafusion_iceberg_spark.tables import load_table
    from pyspark.sql import functions as F

    root = os.path.join(scratch, "wh_manrw")
    cat = Catalog(root)
    nation = load_table(spark, sf_dir, "nation")
    cat.create_table("m.nat", nation.schema)
    for i in range(3):
        cat.append("m.nat", spark, nation.filter(F.col("n_nationkey") % 3 == i))
    t = cat.load("m.nat")
    files_before = sorted(f.path for f in t.files())
    assert len(t.manifests()) == 3
    pre_snap = t.metadata.current_snapshot_id
    out = cat.rewrite_manifests("m.nat")
    assert out == {
        "manifests_before": 3,
        "manifests_after": 1,
        "snapshot_id": out["snapshot_id"],
    }
    t = cat.load("m.nat")
    assert len(t.manifests()) == 1
    # identical files — the data was never touched
    assert sorted(f.path for f in t.files()) == files_before
    assert t.to_df(spark).count() == nation.count()
    # time travel to the pre-rewrite snapshot still sees 3 manifests
    assert len(t.manifests(snapshot_id=pre_snap)) == 3
    # idempotent no-op on a single-manifest table
    out2 = cat.rewrite_manifests("m.nat")
    assert out2["snapshot_id"] is None
    # refusal with outstanding MOR deletes
    cat.delete_where_mor("m.nat", spark, ("=", "n_nationkey", 3))
    import pytest as _pytest

    with _pytest.raises(ValueError, match="delete manifests"):
        cat.rewrite_manifests("m.nat")


# -- sql_to_pred property tests ------------------------------------------

from hypothesis import given as _g, settings as _s, strategies as _h


def _lit_strategy():
    return _h.one_of(
        _h.integers(-10**9, 10**9),
        _h.floats(
            min_value=-1e9,
            max_value=1e9,
            allow_nan=False,
            allow_infinity=False,
        ).filter(lambda x: abs(x) > 1e-6 or x == 0),
        _h.text(
            alphabet="ab'c xyz_09", min_size=0, max_size=8
        ),
        _h.booleans(),
    )


_col = _h.sampled_from(["o_orderkey", "weird col", "x", "Name_9"])


def _pred_strategy(depth=0):
    leaf = _h.one_of(
        _h.tuples(
            _h.sampled_from(["=", "!=", "<", "<=", ">", ">="]),
            _col,
            _lit_strategy(),
        ),
        _h.tuples(_h.just("isnull"), _col),
        _h.tuples(_h.just("notnull"), _col),
        _h.builds(
            lambda c, vs: ("in", c, vs),
            _col,
            _h.lists(_lit_strategy(), min_size=1, max_size=4),
        ),
        _h.builds(
            lambda c, lo, hi: ("between", c, lo, hi),
            _col,
            _h.integers(-1000, 1000),
            _h.integers(-1000, 1000),
        ),
    )
    if depth >= 2:
        return leaf
    sub = _pred_strategy(depth + 1)
    return _h.one_of(
        leaf,
        _h.builds(lambda a, b: ("and", a, b), sub, sub),
        _h.builds(lambda a, b: ("or", a, b), sub, sub),
        _h.builds(lambda a: ("not", a), sub),
    )


@_s(max_examples=200, deadline=None)
@_g(pred=_pred_strategy())
def test_sql_to_pred_roundtrips_pred_to_sql(pred):
    """Any AST the pruning kernel accepts must survive
    pred -> SQL -> AST unchanged (modulo float literal spelling), so the
    SQL DML surface prunes exactly like the Python API."""
    from datafusion_iceberg_spark.iceberg.pruning import (
        pred_to_sql,
        sql_to_pred,
    )

    sql = pred_to_sql(pred)
    back = sql_to_pred(sql)
    assert back is not None, sql

    def norm(p):
        op = p[0]
        if op in ("and", "or"):
            return (op, *[norm(q) for q in p[1:]])
        if op == "not":
            return ("not", norm(p[1]))
        if op == "in":
            return ("in", p[1], [_n(v) for v in p[2]])
        if op == "between":
            return ("between", p[1], _n(p[2]), _n(p[3]))
        if op in ("isnull", "notnull"):
            return p
        return (op, p[1], _n(p[2]))

    def _n(v):
        # int-valued floats render as '5.0' -> parse back as float; both
        # compare equal against stats, so normalize numerically
        if isinstance(v, bool):
            return v
        if isinstance(v, (int, float)):
            return float(v)
        return v

    assert norm(back) == norm(pred), (pred, sql, back)


def test_sql_to_pred_rejects_unprunable():
    from datafusion_iceberg_spark.iceberg.pruning import sql_to_pred

    for bad in (
        "upper(a) = 'X'",
        "a + 1 = 2",
        "a IN (SELECT x FROM t)",
        "a = b",           # column-to-column: not prunable
        "TRUE",
        "a LIKE 'x%'",
        "",
    ):
        assert sql_to_pred(bad) is None, bad


def test_rest_catalog_sql_dml_write_through(spark, sf_dir, scratch):
    """SQL DML against the REST mirror commits THROUGH the service
    (r8: the SqlSurface was read-only before write-through commits):
    the DELETE lands as a new metadata version on the server and the
    mirror reflects it immediately."""
    import os

    from datafusion_iceberg_spark.iceberg.catalog import Catalog
    from datafusion_iceberg_spark.iceberg.rest_catalog import (
        LocalRestServer,
        RestCatalog,
        RestCatalogClient,
    )
    from datafusion_iceberg_spark.tables import load_table

    root = os.path.join(scratch, "wh_ro")
    cat = Catalog(root)
    nation = load_table(spark, sf_dir, "nation")
    cat.create_table("ro.nat", nation.schema)
    cat.append("ro.nat", spark, nation)
    with LocalRestServer(root) as base:
        client = RestCatalogClient(base)
        rest = RestCatalog(client, name="restro")
        n = rest.sql(spark, "SELECT COUNT(*) AS n FROM restro.ro.nat").first()[
            "n"
        ]
        assert n == nation.count()
        rest.sql(spark, "DELETE FROM restro.ro.nat WHERE n_nationkey = 1")
        n2 = rest.sql(
            spark, "SELECT COUNT(*) AS n FROM restro.ro.nat"
        ).first()["n"]
        assert n2 == n - 1
        # the commit went through the SERVICE: a fresh client sees it
        served = client.load_table("ro", "nat")["metadata"]
        assert len(served["snapshots"]) == 2  # append + delete rewrite


def test_expire_snapshots_older_than(spark, sf_dir, scratch):
    """Age-based expiry: only snapshots older than the cutoff expire,
    keep_last is the floor either way."""
    import os

    from datafusion_iceberg_spark.iceberg.catalog import Catalog
    from datafusion_iceberg_spark.tables import load_table
    from pyspark.sql import functions as F

    root = os.path.join(scratch, "wh_age")
    cat = Catalog(root)
    nation = load_table(spark, sf_dir, "nation")
    cat.create_table("a.nat", nation.schema)
    for i in range(3):
        cat.append("a.nat", spark, nation.filter(F.col("n_nationkey") % 3 == i))
    t = cat.load("a.nat")
    snaps = sorted(t.metadata.snapshots, key=lambda s: s.timestamp_ms)
    w = cat.writer("a.nat")
    # cutoff before everything -> nothing expires
    out = w.expire_snapshots(keep_last=1, older_than_ms=snaps[0].timestamp_ms)
    assert out == {"expired_snapshots": 0, "deleted_files": 0}
    # cutoff after the first snapshot -> exactly one expires (the
    # catalog wrapper also refreshes the mirror)
    out = cat.expire_snapshots(
        "a.nat", keep_last=1, older_than_ms=snaps[0].timestamp_ms + 1
    )
    assert out["expired_snapshots"] == 1
    t = cat.load("a.nat")
    assert len(t.metadata.snapshots) == 2
    # data still correct at current snapshot
    assert t.to_df(spark).count() == nation.count()


def test_clean_metadata_log(spark, sf_dir, scratch):
    import glob as g
    import os

    from datafusion_iceberg_spark.iceberg.catalog import Catalog
    from datafusion_iceberg_spark.tables import load_table
    from pyspark.sql import functions as F

    root = os.path.join(scratch, "wh_mlog")
    cat = Catalog(root)
    nation = load_table(spark, sf_dir, "nation")
    cat.create_table("a.nat", nation.schema)
    for i in range(4):
        cat.append("a.nat", spark, nation.filter(F.col("n_nationkey") % 4 == i))
    meta_dir = os.path.join(root, "a", "nat", "metadata")
    n_before = len(g.glob(os.path.join(meta_dir, "v*.metadata.json")))
    assert n_before >= 5  # create + 4 appends
    out = cat.writer("a.nat").clean_metadata_log(keep_last=2)
    assert out["deleted_versions"] == n_before - 2
    left = g.glob(os.path.join(meta_dir, "v*.metadata.json"))
    assert len(left) == 2
    # table still loads and scans; the NEXT commit still versions correctly
    t = cat.load("a.nat")
    assert t.to_df(spark).count() == nation.count()
    cat.append("a.nat", spark, nation.limit(1))
    assert cat.load("a.nat").to_df(spark).count() == nation.count() + 1


def test_cow_rewrite_conflict_not_lost_update(spark, sf_dir, scratch):
    """A copy-on-write DELETE racing a concurrent APPEND must raise
    RewriteConflict instead of blind-retrying — the retry would commit a
    manifest built from the pre-append file set and silently drop the
    appended rows from the current snapshot."""
    import os

    from datafusion_iceberg_spark.iceberg.catalog import Catalog
    from datafusion_iceberg_spark.iceberg.writer import (
        IcebergWriter,
        RewriteConflict,
    )
    from datafusion_iceberg_spark.tables import load_table
    from pyspark.sql import functions as F

    root = os.path.join(scratch, "wh_race_cow")
    cat = Catalog(root)
    nation = load_table(spark, sf_dir, "nation")
    cat.create_table("r.nat", nation.schema)
    cat.append("r.nat", spark, nation.filter(F.col("n_nationkey") < 20))

    w = cat.writer("r.nat")
    orig = IcebergWriter._commit_file_stats
    fired = {"done": False}

    def interleave(self, *a, **k):
        # first commit attempt: sneak in a concurrent append
        if not fired["done"] and self.root.endswith("r/nat"):
            fired["done"] = True
            cat.writer("r.nat").append(
                spark, nation.filter(F.col("n_nationkey") >= 20)
            )
        return orig(self, *a, **k)

    IcebergWriter._commit_file_stats = interleave
    try:
        with pytest.raises(RewriteConflict, match="re-run"):
            w.delete(spark, ("=", "n_nationkey", 3))
    finally:
        IcebergWriter._commit_file_stats = orig
    # nothing lost: both halves present, delete did NOT apply
    t = cat.load("r.nat")
    t = type(t).load(t.metadata.root)
    assert t.to_df(spark).count() == nation.count()
    # re-running the delete on fresh state succeeds
    cat2 = Catalog(root)
    cat2.delete_where("r.nat", spark, ("=", "n_nationkey", 3))
    t2 = cat2.load("r.nat")
    assert t2.to_df(spark).count() == nation.count() - 1


def test_mor_delete_conflict_when_target_compacted(spark, sf_dir, scratch):
    """A MOR position delete whose planned target files were compacted
    away mid-flight must raise RewriteConflict (the delete would bind to
    dead paths and silently no-op)."""
    import os

    from datafusion_iceberg_spark.iceberg.catalog import Catalog
    from datafusion_iceberg_spark.iceberg.writer import (
        IcebergWriter,
        RewriteConflict,
    )
    from datafusion_iceberg_spark.tables import load_table
    from pyspark.sql import functions as F

    root = os.path.join(scratch, "wh_race_mor")
    cat = Catalog(root)
    nation = load_table(spark, sf_dir, "nation")
    cat.create_table("r.nat", nation.schema)
    cat.append("r.nat", spark, nation)

    w = cat.writer("r.nat")
    orig = IcebergWriter._commit_mor_delete_snapshot
    fired = {"done": False}

    def interleave(self, *a, **k):
        if not fired["done"]:
            fired["done"] = True
            cat.writer("r.nat").compact(spark)  # replaces every file
        return orig(self, *a, **k)

    IcebergWriter._commit_mor_delete_snapshot = interleave
    try:
        with pytest.raises(RewriteConflict, match="no longer live"):
            w.delete_where_mor(spark, ("=", "n_nationkey", 5))
    finally:
        IcebergWriter._commit_mor_delete_snapshot = orig
    t = cat.load("r.nat")
    t = type(t).load(t.metadata.root)
    assert t.to_df(spark).count() == nation.count()  # nothing applied
    # re-planned MOR delete on the compacted table succeeds
    cat2 = Catalog(root)
    cat2.delete_where_mor("r.nat", spark, ("=", "n_nationkey", 5))
    t2 = cat2.load("r.nat")
    t2 = type(t2).load(t2.metadata.root)
    assert t2.to_df(spark).count() == nation.count() - 1


def test_catalog_replans_rewrite_conflict(spark, sf_dir, scratch):
    """Catalog-layer DML retries a RewriteConflict by re-planning the
    whole operation on fresh state: the concurrent append survives AND
    the delete applies — nothing lost, no error surfaced."""
    import os

    from datafusion_iceberg_spark.iceberg.catalog import Catalog
    from datafusion_iceberg_spark.iceberg.writer import IcebergWriter
    from datafusion_iceberg_spark.tables import load_table
    from pyspark.sql import functions as F

    root = os.path.join(scratch, "wh_replan")
    cat = Catalog(root)
    nation = load_table(spark, sf_dir, "nation")
    cat.create_table("r.nat", nation.schema)
    cat.append("r.nat", spark, nation.filter(F.col("n_nationkey") < 20))

    orig = IcebergWriter._commit_file_stats
    fired = {"done": False}

    def interleave(self, *a, **k):
        if not fired["done"] and a[3] == "delete":  # only the delete commit
            fired["done"] = True
            IcebergWriter.for_table(self.root).append(
                spark, nation.filter(F.col("n_nationkey") >= 20)
            )
        return orig(self, *a, **k)

    IcebergWriter._commit_file_stats = interleave
    try:
        cat.delete_where("r.nat", spark, ("=", "n_nationkey", 3))
    finally:
        IcebergWriter._commit_file_stats = orig
    assert fired["done"]
    t = cat.load("r.nat")
    t = type(t).load(t.metadata.root)
    got = {r.n_nationkey for r in t.to_df(spark).select("n_nationkey").collect()}
    assert 3 not in got                       # delete applied
    assert got >= {20, 21, 22, 23, 24}        # concurrent append survived
    assert len(got) == nation.count() - 1


def test_incremental_mv_applies_only_deltas(spark, sf_dir, scratch):
    """Each refresh must process exactly the snapshots committed since
    the previous one, and the MV must track the source through appends,
    deletes and a no-op refresh."""
    import os

    from datafusion_iceberg_spark.iceberg.catalog import Catalog
    from datafusion_iceberg_spark.iceberg.mv import (
        create_aggregate_mv,
        mv_df,
        refresh_aggregate_mv,
    )
    from datafusion_iceberg_spark.tables import load_table
    from pyspark.sql import functions as F

    root = os.path.join(scratch, "wh_mv")
    cat = Catalog(root)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    cat.create_table("m.src", orders.schema)
    cat.append("m.src", spark, orders.filter(F.col("o_orderkey") % 2 == 0))

    out = create_aggregate_mv(
        cat, spark, "m.mv", "m.src", ["o_orderstatus"], "o_totalprice"
    )
    assert out["applied_rows"] > 0

    def expected():
        return {
            (r.o_orderstatus, r.cnt)
            for r in cat.load("m.src")
            .to_df(spark)
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        }

    def got():
        return {
            (r.o_orderstatus, r.cnt)
            for r in mv_df(cat, spark, "m.mv").collect()
        }

    assert got() == expected()
    # no source change -> refresh is a no-op
    out = refresh_aggregate_mv(cat, spark, "m.mv")
    assert out["applied_rows"] == 0
    # append the odds, then MOR-delete a slice; refresh applies deltas
    cat.append("m.src", spark, orders.filter(F.col("o_orderkey") % 2 != 0))
    cat.delete_where_mor("m.src", spark, ("<", "o_totalprice", 30000.0))
    out = refresh_aggregate_mv(cat, spark, "m.mv")
    assert out["applied_rows"] > 0
    assert got() == expected()
    # the exact money sums match a recomputation too
    full = {
        (r.o_orderstatus, r.s)
        for r in cat.load("m.src")
        .to_df(spark)
        .groupBy("o_orderstatus")
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 1000000 + 0.5).cast("long")
            ).alias("s")
        )
        .collect()
    }
    mv = {
        (r.o_orderstatus, r.sum_micros)
        for r in cat.load("m.mv").to_df(spark).collect()
    }
    assert mv == full


def test_widen_column_type_promotion(spark, sf_dir, scratch):
    """int->long and float->double widening: metadata-only, old narrow
    files still scan AND still prune (width-aware stat decode)."""
    import os

    from datafusion_iceberg_spark.iceberg.catalog import Catalog
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    root = os.path.join(scratch, "wh_widen")
    cat = Catalog(root)
    df = spark.range(100).select(
        F.col("id").cast("int").alias("k"),
        (F.col("id") * 1.5).cast("float").alias("w"),
    )
    cat.create_table("w.t", df.schema, sort_by=["k"])
    cat.append("w.t", spark, df)
    files_before = len(cat.load("w.t").files())
    cat.widen_column("w.t", "k", T.LongType())
    cat.widen_column("w.t", "w", T.DoubleType())
    t = cat.load("w.t")
    st = {f.name: f.dataType.simpleString() for f in t.metadata.struct_type().fields}
    assert st == {"k": "bigint", "w": "double"}
    # old narrow files scan under the wide schema
    out = t.to_df(spark)
    assert out.count() == 100
    assert dict(out.dtypes) == {"k": "bigint", "w": "double"}
    assert out.agg(F.sum("k")).first()[0] == sum(range(100))
    # pruning still works against the 4-byte bounds of old manifests
    pruned = t.files(filters=("between", "k", 0, 5))
    assert 0 < len(pruned) < files_before or files_before == 1
    # big values land fine after widening
    big = spark.createDataFrame([(2**40, 1e300)], t.metadata.struct_type())
    cat.append("w.t", spark, big)
    assert (
        cat.load("w.t").to_df(spark).filter(F.col("k") == 2**40).count() == 1
    )
    # illegal promotions refused
    import pytest as _pytest

    with _pytest.raises(ValueError, match="illegal type promotion"):
        cat.widen_column("w.t", "w", T.LongType())


def test_widen_column_sql_surface(spark, sf_dir, scratch):
    import os

    from datafusion_iceberg_spark.iceberg.catalog import Catalog
    from pyspark.sql import functions as F

    root = os.path.join(scratch, "wh_widen_sql")
    cat = Catalog(root, name="wcat")
    df = spark.range(10).select(F.col("id").cast("int").alias("k"))
    cat.create_table("w.t", df.schema)
    cat.append("w.t", spark, df)
    out = cat.sql(spark, "ALTER TABLE wcat.w.t ALTER COLUMN k TYPE BIGINT").first()
    assert out.operation == "widen_column"
    assert (
        cat.load("w.t").metadata.struct_type()["k"].dataType.simpleString()
        == "bigint"
    )


def test_split_statements_and_resolve_names_edges():
    """Script splitting and name resolution must never fire inside
    string literals or comments."""
    from datafusion_iceberg_spark.iceberg.catalog import SqlSurface

    class Fake(SqlSurface):
        name = "c"
        _mirror = {"ns.t": None}

        def namespaces(self):
            return ["ns"]

    f = Fake()
    stmts = f._split_statements(
        "SELECT 'a;b' AS x; -- trailing; comment\nSELECT 2; ;"
    )
    assert len(stmts) == 2
    assert "'a;b'" in stmts[0]
    out = f.resolve_names("SELECT * FROM c.ns.t WHERE x = 'c.ns.t'")
    assert out == "SELECT * FROM `ns_t` WHERE x = 'c.ns.t'"
    # backticked spellings resolve; unknown tables pass through
    assert f.resolve_names("FROM `c`.`ns`.`t`") == "FROM `ns_t`"
    assert f.resolve_names("FROM c.ns.other") == "FROM c.ns.other"


def test_rewrite_manifests_refuses_stale_spec(spark, sf_dir, scratch):
    """ADVICE r5: after partition-spec evolution with NO post-evolution
    writes, the surviving manifests carry the OLD spec — rewriting them
    under the writer's default (new) spec would produce a manifest whose
    avro partition schema mismatches its entries.  Must refuse."""
    from datafusion_iceberg_spark.iceberg.catalog import Catalog
    from datafusion_iceberg_spark.tables import load_table

    cat = Catalog(os.path.join(scratch, "wh_rwm"), name="rwm")
    nation = load_table(spark, sf_dir, "nation")
    cat.create_table("ns.n", nation.schema, partition_by=["n_regionkey"])
    # two appends -> two manifests (so rewrite has something to collapse)
    cat.append("ns.n", spark, nation.filter(F.col("n_nationkey") < 10))
    cat.append("ns.n", spark, nation.filter(F.col("n_nationkey") >= 10))
    cat.evolve_partition_spec("ns.n", ["n_nationkey"])
    with pytest.raises(ValueError, match="default spec"):
        cat.writer("ns.n").rewrite_manifests()
    # a post-evolution write under the new spec... still mixes specs, and
    # the mixed-spec guard fires first
    cat.append("ns.n", spark, nation.limit(1))
    with pytest.raises(ValueError, match="span partition specs"):
        cat.writer("ns.n").rewrite_manifests()


def test_v2_sequence_scan_foreign_fixture(spark, sf_dir, duck):
    """The hand-authored foreign v2 fixture (real sequence numbers,
    scrambled snapshot order, explicit-vs-inherited entry sequences)
    scans to the oracle's exact row set — VERDICT r5 task 4."""
    from datafusion_iceberg_spark.iceberg.queries import (
        iceberg_v2_sequence_scan,
    )
    from datafusion_iceberg_spark.registry import ORACLES

    rows = [
        (int(r["n_nationkey"]), r["n_name"])
        for r in iceberg_v2_sequence_scan(spark, sf_dir).collect()
    ]
    exp = [
        (int(a), b)
        for a, b in duck.execute(
            ORACLES["iceberg_v2_sequence_scan"]
        ).fetchall()
    ]
    assert rows == exp and len(rows) == 15


def test_writer_emits_v2_sequence_numbers(spark, sf_dir, scratch):
    """New tables are format-version 2: metadata tracks
    last-sequence-number, every snapshot carries sequence-number, and
    manifest-list rows carry sequence_number/min_sequence_number that
    entries inherit; COW rewrites preserve surviving files' original
    sequences (explicit entry values, reflected in min_sequence_number)."""
    import os

    from datafusion_iceberg_spark.iceberg.catalog import Catalog
    from datafusion_iceberg_spark.tables import load_table
    from pyspark.sql import functions as F

    root = os.path.join(scratch, "wh_v2w")
    cat = Catalog(root)
    nation = load_table(spark, sf_dir, "nation")
    cat.create_table("v.nat", nation.schema)
    cat.append("v.nat", spark, nation.filter(F.col("n_nationkey") < 10))
    cat.append("v.nat", spark, nation.filter(F.col("n_nationkey") >= 10))
    t = cat.load("v.nat")
    assert t.metadata.format_version == 2
    assert t.metadata.raw["last-sequence-number"] == 2
    assert sorted(
        s.sequence_number for s in t.metadata.snapshots
    ) == [1, 2]
    mans = sorted(t.manifests(), key=lambda m: m.sequence_number)
    assert [m.sequence_number for m in mans] == [1, 2]
    assert [m.min_sequence_number for m in mans] == [1, 2]
    # entries inherit the manifest-list sequence
    for f in t.files():
        assert f.sequence_number in (1, 2)
    # MOR delete commit takes sequence 3; COW-style surviving entries in
    # a later rewrite keep their original sequence explicit
    cat.delete_where_mor("v.nat", spark, "n_nationkey = 5")
    t = cat.load("v.nat")
    assert t.metadata.raw["last-sequence-number"] == 3
    dels = t.position_delete_files()
    assert dels and all(d.sequence_number == 3 for d in dels)
    # snapshot_sequences prefers the real recorded numbers
    seqs = t.metadata.snapshot_sequences()
    assert sorted(seqs.values()) == [1, 2, 3]


def test_add_files_migrates_in_place(spark, sf_dir, scratch):
    """add_files registers pre-existing hive-layout parquet without
    rewriting: same rows, partition values from dir names, files
    referenced at their original paths; schema-mismatched directories
    refuse before any commit."""
    import os

    from datafusion_iceberg_spark.iceberg.catalog import Catalog
    from datafusion_iceberg_spark.tables import load_table

    root = os.path.join(scratch, "wh_addf_t")
    lake = os.path.join(root, "lake")
    nation = load_table(spark, sf_dir, "nation")
    nation.write.mode("overwrite").partitionBy("n_regionkey").parquet(lake)
    cat = Catalog(root)
    cat.create_table("m.nat", nation.schema, partition_by=["n_regionkey"])
    out = cat.add_files("m.nat", lake)
    assert out["added_rows_count"] == nation.count()
    t = cat.load("m.nat")
    assert t.to_df(spark).count() == nation.count()
    # files are referenced in place — no copy under the table root
    assert all(f.path.startswith(lake) for f in t.files())
    # partition pruning works off the migrated metadata
    pruned = t.files(filters=("=", "n_regionkey", 1))
    assert 0 < len(pruned) < len(t.files())
    # wrong-schema source refuses before committing
    bad = os.path.join(root, "bad_lake")
    nation.select("n_nationkey").write.mode("overwrite").parquet(bad)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="lacks table column"):
        cat.add_files("m.nat", bad)


def test_rewrite_position_deletes_merges_and_drops_dangling(
    spark, sf_dir, scratch
):
    """Three MOR deletes accumulate three position-delete files; the
    rewrite merges them into ONE at a new sequence, scan results are
    unchanged, and rows pointing at files retired by a later compaction
    would be dropped as dangling.  Runs via the CALL surface."""
    import os

    from datafusion_iceberg_spark.iceberg.catalog import Catalog
    from datafusion_iceberg_spark.tables import load_table
    from pyspark.sql import functions as F

    root = os.path.join(scratch, "wh_posrw")
    cat = Catalog(root)
    nation = load_table(spark, sf_dir, "nation")
    cat.create_table("m.nat", nation.schema)
    cat.append("m.nat", spark, nation)
    for k in (1, 7, 13):
        cat.delete_where_mor("m.nat", spark, f"n_nationkey = {k}")
    t = cat.load("m.nat")
    assert len(t.position_delete_files()) == 3
    expect = sorted(
        r.n_nationkey
        for r in t.to_df(spark).select("n_nationkey").collect()
    )
    out = cat.sql(
        spark, "CALL iceberg.system.rewrite_position_delete_files('m.nat')"
    )
    vals = {r[0]: r[1] for r in out.collect()}
    assert vals["deletes_before"] == "3" and vals["deletes_after"] == "1"
    t = cat.load("m.nat")
    dels = t.position_delete_files()
    assert len(dels) == 1 and dels[0].record_count == 3
    # merged deletes carry the NEW commit's sequence
    assert dels[0].sequence_number == t.metadata.raw["last-sequence-number"]
    got = sorted(
        r.n_nationkey for r in t.to_df(spark).select("n_nationkey").collect()
    )
    assert got == expect and 1 not in got and 7 not in got and 13 not in got
    # idempotent no-op on a single-delete-file table
    out2 = cat.rewrite_position_deletes("m.nat", spark)
    assert out2["snapshot_id"] is None
    # time travel to the pre-rewrite snapshot still applies 3 delete files
    pre = t.metadata.snapshots[-2].snapshot_id
    assert len(t.position_delete_files(snapshot_id=pre)) == 3


def test_roaring_portable_roundtrip():
    """Portable 64-bit roaring codec: array containers, bitmap
    containers (>4096 cardinality), multi-bucket 64-bit values, and a
    hand-built RUN-container bitmap decode."""
    import struct

    from datafusion_iceberg_spark.iceberg.roaring import (
        deserialize_u64,
        serialize_u64,
        _deserialize32,
    )

    import random

    rng = random.Random(11)
    for case in (
        [],
        [0],
        [65535, 65536, 65537],
        list(range(9000)),
        [rng.randrange(0, 1 << 50) for _ in range(4000)],
    ):
        assert deserialize_u64(serialize_u64(case)) == sorted(set(case))
    # hand-built run bitmap: cookie 12347, 1 container (run), key 0,
    # card-1 = 9, runbits=0b1, no offsets (n < 4), runs: (5, len 9)
    buf = struct.pack("<I", (0 << 16) | 12347) + b"\x01" + struct.pack(
        "<HH", 0, 9
    ) + struct.pack("<H", 1) + struct.pack("<HH", 5, 9)
    vals, _ = _deserialize32(buf, 0)
    assert vals == list(range(5, 15))


def test_deletion_vector_delete_scan(spark, sf_dir, scratch):
    """v3 deletion vectors end-to-end: DELETE under
    write.delete.mode='deletion-vector' stores roaring bitmaps in ONE
    puffin container (one blob per touched data file), the scan applies
    them, a second delete REWRITES the DV set (still one DV per file),
    and COW compaction folds them away."""
    import os

    from datafusion_iceberg_spark.iceberg.catalog import Catalog
    from datafusion_iceberg_spark.tables import load_table
    from pyspark.sql import functions as F

    root = os.path.join(scratch, "wh_dv")
    cat = Catalog(root)
    orders = load_table(spark, sf_dir, "orders")
    cat.create_table("d.o", orders.schema, partition_by=["o_orderstatus"])
    cat.append("d.o", spark, orders)
    cat.sql(
        spark,
        "ALTER TABLE iceberg.d.o SET TBLPROPERTIES"
        " ('write.delete.mode' = 'deletion-vector')",
    )
    n0 = orders.count()
    cat.sql(spark, "DELETE FROM iceberg.d.o WHERE o_orderkey % 7 = 0")
    t = cat.load("d.o")
    dels = t.position_delete_files()
    assert dels and all(d.referenced_data_file is not None for d in dels)
    assert all(d.file_format == "PUFFIN" for d in dels)
    # one puffin container for the whole commit
    assert len({d.path for d in dels}) == 1
    expect1 = orders.filter(F.col("o_orderkey") % 7 != 0)
    assert t.to_df(spark).count() == expect1.count()
    # second delete: DV set rewritten, at most one DV per data file
    cat.sql(spark, "DELETE FROM iceberg.d.o WHERE o_orderkey % 11 = 0")
    t = cat.load("d.o")
    dels = t.position_delete_files()
    targets = [d.referenced_data_file for d in dels]
    assert len(targets) == len(set(targets))  # <= 1 DV per file
    assert len({d.path for d in dels}) == 1  # old container superseded
    expect2 = expect1.filter(F.col("o_orderkey") % 11 != 0)
    got = t.to_df(spark)
    assert got.count() == expect2.count()
    assert got.agg(F.sum("o_orderkey")).collect()[0][0] == (
        expect2.agg(F.sum("o_orderkey")).collect()[0][0]
    )
    # statistics subtract DV cardinalities exactly
    st = t.statistics()
    assert st["num_rows"] == expect2.count() and st["is_exact"]
    # compaction folds the DVs away
    cat.compact("d.o", spark)
    t = cat.load("d.o")
    assert not t.position_delete_files()
    assert t.to_df(spark).count() == expect2.count()
    assert n0 > expect2.count()


def test_changelog_over_deletion_vectors(spark, sf_dir, scratch):
    """The CDC changelog reports exactly the rows each DV delete
    removed, including across a DV-set rewrite (second delete's bitmap
    carries old+new positions but only the new removals are emitted)."""
    import os

    from datafusion_iceberg_spark.iceberg.catalog import Catalog
    from datafusion_iceberg_spark.tables import load_table
    from pyspark.sql import functions as F

    root = os.path.join(scratch, "wh_dvlog")
    cat = Catalog(root)
    nation = load_table(spark, sf_dir, "nation")
    cat.create_table(
        "d.n", nation.schema,
        properties={"write.delete.mode": "deletion-vector"},
    )
    cat.append("d.n", spark, nation)
    cat.sql(spark, "DELETE FROM iceberg.d.n WHERE n_nationkey IN (2, 4)")
    cat.sql(spark, "DELETE FROM iceberg.d.n WHERE n_nationkey IN (4, 9)")
    log = cat.load("d.n").changelog_df(spark)
    dels = (
        log.filter(F.col("_change_type") == "delete")
        .groupBy("_change_ordinal")
        .agg(F.sort_array(F.collect_list("n_nationkey")).alias("ks"))
        .orderBy("_change_ordinal")
        .collect()
    )
    assert [list(r.ks) for r in dels] == [[2, 4], [9]]


def test_update_where_mor_row_delta(spark, sf_dir, tmp_path):
    """write.update.mode='merge-on-read': UPDATE commits ONE snapshot
    carrying both the position deletes and the replacement rows; scan,
    statistics, changelog, and a follow-up compaction all agree with
    the copy-on-write result."""
    from datafusion_iceberg_spark.iceberg.catalog import Catalog
    from datafusion_iceberg_spark.tables import load_table
    from pyspark.sql import functions as F

    root = str(tmp_path / "wh_morupd")
    cat = Catalog(root)
    nation = load_table(spark, sf_dir, "nation")
    cat.create_table(
        "u.n", nation.schema,
        properties={"write.update.mode": "merge-on-read"},
    )
    cat.append("u.n", spark, nation)
    n_snaps0 = len(cat.load("u.n").metadata.snapshots)
    cat.sql(
        spark,
        "UPDATE iceberg.u.n SET n_name = concat(n_name, '_X'),"
        " n_regionkey = n_regionkey + 100 WHERE n_nationkey % 5 = 0",
    )
    t = cat.load("u.n")
    # exactly ONE new snapshot for the whole row-delta
    assert len(t.metadata.snapshots) == n_snaps0 + 1
    assert t.position_delete_files()  # MOR artifacts present
    got = t.to_df(spark)
    assert got.count() == 25
    updated = got.filter(F.col("n_nationkey") % 5 == 0)
    assert updated.count() == 5
    assert all(
        r.n_name.endswith("_X") and r.n_regionkey >= 100
        for r in updated.collect()
    )
    untouched = got.filter(F.col("n_nationkey") % 5 != 0)
    assert all(
        not r.n_name.endswith("_X") and r.n_regionkey < 100
        for r in untouched.collect()
    )
    # statistics stay exact: 25 live rows
    assert t.statistics()["num_rows"] == 25
    # changelog: the update surfaces as 5 deletes + 5 inserts at one ordinal
    log = t.changelog_df(spark)
    counts = {
        (r._change_type, r._change_ordinal): r.n
        for r in log.groupBy("_change_type", "_change_ordinal")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert counts[("delete", 1)] == 5 and counts[("insert", 1)] == 5
    # compaction folds the row-delta away, result unchanged
    cat.compact("u.n", spark)
    t = cat.load("u.n")
    assert not t.position_delete_files()
    assert t.to_df(spark).count() == 25
    assert t.to_df(spark).filter(F.col("n_regionkey") >= 100).count() == 5


def test_merge_mor_row_delta(spark, sf_dir, tmp_path):
    """write.merge.mode='merge-on-read': MERGE commits one row-delta
    snapshot (deletes of matched rows + updated/inserted data files);
    semantics identical to the COW merge, including MATCHED DELETE."""
    from datafusion_iceberg_spark.iceberg.catalog import Catalog
    from datafusion_iceberg_spark.tables import load_table
    from pyspark.sql import functions as F

    root = str(tmp_path / "wh_mormrg")
    cat = Catalog(root)
    nation = load_table(spark, sf_dir, "nation")
    cat.create_table(
        "m.n", nation.schema,
        properties={"write.merge.mode": "merge-on-read"},
    )
    cat.append("m.n", spark, nation)
    n_snaps0 = len(cat.load("m.n").metadata.snapshots)
    src = nation.filter(F.col("n_nationkey").isin(1, 3)).select(
        "n_nationkey",
        F.concat(F.col("n_name"), F.lit("_M")).alias("n_name"),
        (F.col("n_regionkey") + 50).alias("n_regionkey"),
    ).unionByName(
        spark.createDataFrame([(77, "NEWLAND_M", 7)], nation.schema)
    )
    cat.merge_into(
        "m.n", spark, src, "n_nationkey",
        when_matched_set={"n_name": "src.n_name", "n_regionkey": "src.n_regionkey"},
    )
    t = cat.load("m.n")
    assert len(t.metadata.snapshots) == n_snaps0 + 1  # one atomic commit
    assert t.position_delete_files()
    got = t.to_df(spark)
    assert got.count() == 26  # 25 + 1 insert
    m = {r.n_nationkey: (r.n_name, r.n_regionkey) for r in got.collect()}
    assert m[1][0].endswith("_M") and m[1][1] >= 50
    assert m[3][0].endswith("_M")
    assert m[77] == ("NEWLAND_M", 7)
    assert not m[2][0].endswith("_M")
    # MATCHED DELETE flavor
    del_src = spark.createDataFrame([(5,)], "n_nationkey: long").select(
        F.col("n_nationkey"),
        F.lit("x").alias("n_name"),
        F.lit(0).cast("long").alias("n_regionkey"),
    )
    cat.merge_into(
        "m.n", spark, del_src, "n_nationkey",
        when_matched_delete=True, insert_not_matched=False,
    )
    t = cat.load("m.n")
    got2 = t.to_df(spark)
    assert got2.count() == 25
    assert got2.filter(F.col("n_nationkey") == 5).count() == 0


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=(1 << 40) - 1),
        max_size=300,
    ),
    st.sampled_from([0, 1 << 16, 1 << 33]),
)
def test_roaring_roundtrip_property(vals, base):
    """Any u64 position set round-trips through the portable codec,
    across container-type boundaries (the 4096-cardinality array→bitmap
    switch) and bucket boundaries."""
    from datafusion_iceberg_spark.iceberg.roaring import (
        deserialize_u64,
        serialize_u64,
    )

    positions = [base + v for v in vals]
    # push some cases over the array→bitmap container threshold
    if len(vals) > 250:
        positions += list(range(base, base + 5000))
    assert deserialize_u64(serialize_u64(positions)) == sorted(set(positions))


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text("ab/", min_size=1, max_size=20),
            st.lists(st.integers(0, 1 << 30), min_size=1, max_size=50),
        ),
        min_size=1,
        max_size=5,
    )
)
def test_puffin_dv_roundtrip_property(files):
    """Multi-blob puffin containers round-trip positions, properties,
    and ranged reads for arbitrary referenced paths."""
    import tempfile, os

    from datafusion_iceberg_spark.iceberg.puffin import (
        dv_blob,
        read_dv_positions,
        read_puffin,
        write_puffin,
    )

    path = tempfile.mktemp(suffix=".puffin")
    try:
        blobs = write_puffin(
            path, [dv_blob(pos, f"/d/{name}") for name, pos in files]
        )
        rb, _ = read_puffin(path)
        for (name, pos), b, meta_b in zip(files, blobs, rb):
            want = sorted(set(pos))
            assert read_dv_positions(path, b.offset, b.length) == want
            assert meta_b.properties["referenced-data-file"] == f"/d/{name}"
    finally:
        os.remove(path)


def test_row_delta_uses_deletion_vectors(spark, sf_dir, tmp_path):
    """With write.delete.mode='deletion-vector', MOR UPDATE and MERGE
    store their delete side as DVs (one puffin blob per touched file)
    and the DV-set rewrite keeps at most one vector per data file across
    a delete+update+merge sequence."""
    from datafusion_iceberg_spark.iceberg.catalog import Catalog
    from datafusion_iceberg_spark.tables import load_table
    from pyspark.sql import functions as F

    root = str(tmp_path / "wh_dvrd")
    cat = Catalog(root)
    nation = load_table(spark, sf_dir, "nation")
    cat.create_table(
        "d.n", nation.schema,
        properties={
            "write.delete.mode": "deletion-vector",
            "write.update.mode": "merge-on-read",
            "write.merge.mode": "merge-on-read",
        },
    )
    cat.append("d.n", spark, nation)
    cat.sql(spark, "DELETE FROM iceberg.d.n WHERE n_nationkey = 3")
    cat.sql(
        spark,
        "UPDATE iceberg.d.n SET n_regionkey = n_regionkey + 10"
        " WHERE n_nationkey IN (1, 5)",
    )
    src = spark.createDataFrame([(7, "MERGED", 70)], nation.schema)
    cat.merge_into(
        "d.n", spark, src, "n_nationkey",
        when_matched_set={"n_name": "src.n_name"},
    )
    t = cat.load("d.n")
    dels = t.position_delete_files()
    assert dels and all(d.referenced_data_file is not None for d in dels)
    targets = [d.referenced_data_file for d in dels]
    assert len(targets) == len(set(targets))  # <=1 DV per file
    assert len({d.path for d in dels}) == 1  # one merged container
    got = {r.n_nationkey: (r.n_name, r.n_regionkey) for r in t.to_df(spark).collect()}
    assert 3 not in got and len(got) == 24
    assert got[1][1] >= 10 and got[5][1] >= 10
    assert got[7][0] == "MERGED"
    assert got[2][1] < 10 and not got[2][0] == "MERGED"


def test_metadata_min_max_guard_rails(spark, sf_dir, tmp_path):
    """metadata_min_max answers from bounds only when provably exact:
    deletes or string truncation risk force the scan fallback, and the
    fallback agrees with the metadata answer on clean snapshots."""
    import pytest

    from datafusion_iceberg_spark.iceberg.catalog import Catalog
    from datafusion_iceberg_spark.tables import load_table

    cat = Catalog(str(tmp_path / "wh"), name="mm")
    orders = load_table(spark, sf_dir, "orders")
    cat.create_table("m.o", orders.schema,
                     properties={"write.delete.mode": "deletion-vector"})
    cat.append("m.o", spark, orders)
    t = cat.load("m.o")
    lo, hi = t.metadata_min_max("o_orderkey")
    exp_lo, exp_hi = orders.agg(
        F.min("o_orderkey"), F.max("o_orderkey")
    ).collect()[0]
    assert (lo, hi) == (exp_lo, exp_hi)
    # strings never answer from bounds (writer truncation risk)
    with pytest.raises(ValueError, match="exact"):
        t.metadata_min_max("o_orderstatus")
    assert t.metadata_min_max("o_orderstatus", spark) == ("F", "P")
    # a delete makes bounds unprovable: the MAX row might be gone
    cat.sql(
        spark,
        "DELETE FROM mm.m.o WHERE o_orderkey ="
        f" {int(exp_hi)}",
    )
    t = cat.load("m.o")
    with pytest.raises(ValueError, match="exact"):
        t.metadata_min_max("o_orderkey")
    lo2, hi2 = t.metadata_min_max("o_orderkey", spark)
    assert lo2 == exp_lo and hi2 < exp_hi


def test_metadata_min_max_nan_guard(spark, sf_dir, tmp_path):
    """ADVICE r7: Iceberg manifest bounds EXCLUDE NaN but Spark MAX
    sorts NaN above everything — float/double answer from bounds only
    when the manifest proves zero NaNs (our writer counts them); a
    NaN-bearing column falls back to the scan, whose answer then
    matches Spark semantics."""
    import math

    import pytest

    from datafusion_iceberg_spark.iceberg.catalog import Catalog

    cat = Catalog(str(tmp_path / "wh"), name="nanmm")
    clean = spark.createDataFrame(
        [(1, 1.5), (2, 7.25), (3, -2.0)], "id int, v double"
    )
    cat.create_table("m.clean", clean.schema)
    cat.append("m.clean", spark, clean.coalesce(1))
    t = cat.load("m.clean")
    # zero NaNs proven by the manifest: bounds answer, no data IO
    assert t.metadata_min_max("v") == (-2.0, 7.25)
    f = t.files()[0]
    fid = t.metadata.field_ids_by_name()["v"]
    assert f.nan_value_counts.get(fid) == 0

    dirty = spark.createDataFrame(
        [(1, 1.5), (2, float("nan")), (3, -2.0)], "id int, v double"
    )
    cat.create_table("m.dirty", dirty.schema)
    cat.append("m.dirty", spark, dirty.coalesce(1))
    t2 = cat.load("m.dirty")
    f2 = t2.files()[0]
    assert f2.nan_value_counts.get(fid) == 1
    with pytest.raises(ValueError, match="exact"):
        t2.metadata_min_max("v")
    lo, hi = t2.metadata_min_max("v", spark)
    assert lo == -2.0 and math.isnan(hi)  # Spark: NaN > everything


def test_default_values_initial_vs_explicit_null(spark, sf_dir, tmp_path):
    """v3 DEFAULT VALUES: the initial-default fills only files written
    before the column existed; later explicit NULLs stay NULL, filters
    see filled values, and DML/DELETE over the mixed table stays
    correct."""
    from datafusion_iceberg_spark.iceberg.catalog import Catalog
    from datafusion_iceberg_spark.tables import load_table

    cat = Catalog(str(tmp_path / "wh"), name="dflt")
    nation = load_table(spark, sf_dir, "nation")
    cat.create_table("d.n", nation.schema)
    cat.append("d.n", spark, nation.filter("n_nationkey < 10"))
    cat.sql(spark, "ALTER TABLE dflt.d.n ADD COLUMN score BIGINT DEFAULT 7")
    post = nation.filter("n_nationkey >= 10").withColumn(
        "score",
        F.when(F.col("n_nationkey") % 2 == 0, F.col("n_nationkey") * 10),
    )
    cat.append("d.n", spark, post)
    t = cat.load("d.n")
    rows = {r["n_nationkey"]: r["score"] for r in t.to_df(spark).collect()}
    assert all(rows[k] == 7 for k in range(10))
    assert rows[10] == 100 and rows[11] is None
    assert t.metadata.raw["format-version"] == 3
    # SQL filter on the defaulted column
    n = cat.sql(
        spark, "SELECT COUNT(*) AS n FROM dflt.d.n WHERE score = 7"
    ).first()["n"]
    assert n == 10
    # DELETE with a predicate over the defaulted column removes the
    # pre-ALTER rows (COW rewrite materializes the filled values)
    cat.sql(spark, "DELETE FROM dflt.d.n WHERE score = 7")
    t = cat.load("d.n")
    assert t.to_df(spark).count() == 15
    assert t.to_df(spark).filter("score = 7").count() == 0


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=(1 << 20) - 1),  # run start
            st.integers(min_value=1, max_value=5000),  # run length
        ),
        min_size=1,
        max_size=8,
    ),
    st.lists(
        st.integers(min_value=0, max_value=(1 << 20) - 1), max_size=50
    ),
)
def test_roaring_run_heavy_roundtrip_property(runs, extras):
    """Run-heavy inputs (the range-delete shape the serializer now
    encodes as run containers) roundtrip exactly, mixed with sparse
    stragglers that keep some containers in array/bitmap form."""
    from datafusion_iceberg_spark.iceberg.roaring import (
        deserialize_u64,
        serialize_u64,
    )

    pos = set(extras)
    for start, length in runs:
        pos.update(range(start, start + length))
    expected = sorted(pos)
    assert deserialize_u64(serialize_u64(expected)) == expected


def test_write_distribution_mode_hash_bounds_file_count(spark, sf_dir, tmp_path):
    """write.distribution-mode='hash' routes each partition's rows to
    one task: an append from a 16-way-shuffled frame writes one file
    per partition dir instead of up-to-16 per dir."""
    from datafusion_iceberg_spark.iceberg.catalog import Catalog
    from datafusion_iceberg_spark.tables import load_table

    orders = load_table(spark, sf_dir, "orders").repartition(16)
    for mode, expect_max in (("none", 50), ("hash", 1)):
        cat = Catalog(str(tmp_path / f"wh_{mode}"), name=f"dm{mode}")
        cat.create_table(
            "d.o", orders.schema, partition_by=["o_orderstatus"],
            properties={"write.distribution-mode": mode},
        )
        cat.append("d.o", spark, orders)
        t = cat.load("d.o")
        per_dir: dict = {}
        for f in t.files():
            per_dir.setdefault(f.partition.get("o_orderstatus"), 0)
            per_dir[f.partition.get("o_orderstatus")] += 1
        worst = max(per_dir.values())
        if mode == "hash":
            assert worst == 1, per_dir
        else:
            assert worst > 1, per_dir  # the explosion the mode fixes
        assert t.to_df(spark).count() == orders.count()


def test_table_health_and_policy_maintenance(spark, sf_dir, tmp_path):
    """table_health reads the triage signals with zero data IO;
    maintain() runs only what the thresholds call for and leaves the
    table clean: files compacted (deletes folded), DV containers gone,
    partition stats fresh, row set unchanged."""
    from datafusion_iceberg_spark.iceberg.catalog import Catalog
    from datafusion_iceberg_spark.tables import load_table

    cat = Catalog(str(tmp_path / "wh"), name="hm")
    orders = load_table(spark, sf_dir, "orders")
    cat.create_table(
        "h.o", orders.schema, partition_by=["o_orderstatus"],
        properties={"write.delete.mode": "deletion-vector"},
    )
    # messy history: 3 small appends + 3 DV deletes
    for r in range(3):
        cat.append(
            "h.o", spark,
            orders.filter(F.col("o_orderkey") % 3 == r).repartition(4),
        )
    for st in ("F", "O", "P"):
        cat.sql(
            spark,
            f"DELETE FROM hm.h.o WHERE o_orderstatus = '{st}'"
            " AND o_orderkey % 5 = 0",
        )
    h = cat.table_health("h.o")
    assert h["data_files"] >= 9 and h["small_file_ratio"] == 1.0
    assert h["dv_containers"] == 3 and h["partition_stats_stale"]
    expect = orders.filter("o_orderkey % 5 != 0").count()

    out = cat.maintain(
        "h.o", spark, min_files=4, max_dv_containers=0, max_manifests=2
    )
    assert out.get("compacted")
    after = out["after"]
    assert after["data_files"] < h["data_files"]
    assert after["dv_containers"] == 0  # compaction folded the deletes
    assert not after["partition_stats_stale"]
    t = cat.load("h.o")
    assert t.to_df(spark).count() == expect
    # second run is a near-no-op (only thresholds re-checked)
    out2 = cat.maintain(
        "h.o", spark, min_files=4, max_dv_containers=0, max_manifests=2
    )
    assert not out2.get("compacted") and "dv_rewrite" not in out2


def test_distributed_footer_stats_match_driver(spark, sf_dir, tmp_path, monkeypatch):
    """VERDICT r7 task 3: at or above write.stats.distributed-threshold
    the append's footer stats collect via a Spark job — the DRIVER opens
    zero parquet footers — and the committed manifest stats are
    IDENTICAL to the driver-serial walk's."""
    from datafusion_iceberg_spark.iceberg import writer as writer_mod
    from datafusion_iceberg_spark.tables import load_table

    orders = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
        .repartition(6)
    )

    def build(name, props):
        cat = Catalog(str(tmp_path / name), name=name)
        cat.create_table("s.o", orders.schema, properties=props)
        cat.append("s.o", spark, orders)
        return cat.load("s.o")

    t_serial = build("whser", None)

    real = writer_mod._stat_parquet_footer
    calls = {"n": 0}

    def counting(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(writer_mod, "_stat_parquet_footer", counting)
    t_dist = build(
        "whdist", {"write.stats.distributed-threshold": "1"}
    )
    # the driver-side function never ran: every footer was read in an
    # executor task (mapInPandas workers are separate processes, so the
    # monkeypatched counter can't be reached from there)
    assert calls["n"] == 0

    def fingerprint(t):
        return sorted(
            (
                f.record_count,
                tuple(sorted(f.lower_bounds.items())),
                tuple(sorted(f.upper_bounds.items())),
                tuple(sorted(f.null_value_counts.items())),
                tuple(sorted(f.value_counts.items())),
                tuple(sorted(f.nan_value_counts.items())),
            )
            for f in t.files()
        )

    assert fingerprint(t_dist) == fingerprint(t_serial)
    # the distributed-stat table scans correctly end-to-end
    assert t_dist.to_df(spark).count() == orders.count()


def test_auto_maintenance_bounds_dv_containers(spark, sf_dir, tmp_path):
    """VERDICT r7 task 4: with maintenance.auto-after-commits=10 set, a
    50-commit DV-delete chain stays bounded in DV container count with
    NO explicit CALL — every 10th snapshot the triage fires and
    rewrite_deletion_vectors consolidates."""
    df = spark.range(200).selectExpr(
        "CAST(id AS BIGINT) AS k", "CAST(id % 7 AS BIGINT) AS g"
    )
    cat = Catalog(str(tmp_path / "wh"), name="am")
    cat.create_table(
        "a.t",
        df.schema,
        properties={
            "write.delete.mode": "deletion-vector",
            "maintenance.auto-after-commits": "10",
        },
    )
    cat.append("a.t", spark, df.coalesce(2))
    for i in range(50):
        cat.sql(spark, f"DELETE FROM am.a.t WHERE k = {i}")
    h = cat.table_health("a.t")
    # without auto-maintenance this is ~50 (one puffin per commit);
    # the 10-commit cadence keeps it at most one cycle's worth
    assert h["dv_containers"] <= 12, h
    assert cat.load("a.t").to_df(spark).count() == 150


def test_auto_maintenance_noop_is_triage_only(spark, sf_dir, tmp_path):
    """When thresholds never trip, the auto hook costs only the
    zero-IO health triage: no maintenance commits appear in the
    snapshot chain (snapshots == user commits), and no maintenance
    summary operations exist."""
    df = spark.range(50).selectExpr("CAST(id AS BIGINT) AS k")
    cat = Catalog(str(tmp_path / "wh2"), name="am2")
    cat.create_table(
        "a.t",
        df.schema,
        properties={"maintenance.auto-after-commits": "1"},
    )
    for _ in range(5):
        cat.append("a.t", spark, df.coalesce(1))
    t = cat.load("a.t")
    assert len(t.metadata.snapshots) == 5  # appends only, no extra commits


def test_variant_type_round_trip(spark, sf_dir, tmp_path):
    """Iceberg v3 VARIANT (r8): Spark VariantType maps to the v3
    'variant' schema type, appends commit parquet VARIANT with per-file
    stats from the Spark aggregation path (pyarrow cannot parse the
    VARIANT footer), scans read it back typed, and non-variant columns
    keep exact bounds for pruning."""
    df = spark.sql(
        "SELECT id, parse_json(concat('{\"k\":', CAST(id AS STRING), '}'))"
        " AS v FROM range(50)"
    ).coalesce(2)
    cat = Catalog(str(tmp_path / "wh"), name="vrt")
    cat.create_table("n.t", df.schema)
    assert (
        cat.load("n.t").metadata.current_schema["fields"][1]["type"]
        == "variant"
    )
    cat.append("n.t", spark, df)
    t = cat.load("n.t")
    out = t.to_df(spark)
    assert out.schema["v"].dataType.typeName() == "variant"
    got = out.selectExpr(
        "CAST(SUM(CAST(variant_get(v, '$.k', 'long') AS LONG)) AS LONG) AS s"
    ).first()[0]
    assert got == sum(range(50))
    # non-variant column bounds are exact -> pruning works
    fid = t.metadata.field_ids_by_name()["id"]
    for f in t.files():
        assert fid in f.lower_bounds and fid in f.upper_bounds
        vfid = t.metadata.field_ids_by_name()["v"]
        assert vfid not in f.lower_bounds  # variant: counts only
    assert t.files(filters=("<", "id", 0)) == []
    # SQL surface: INSERT with a variant expression + typed extraction
    cat.sql(
        spark,
        "INSERT INTO vrt.n.t SELECT 999 AS id, parse_json('{\"k\":-7}') AS v",
    )
    s2 = cat.sql(
        spark,
        "SELECT CAST(SUM(CAST(variant_get(v, '$.k', 'long') AS LONG))"
        " AS LONG) AS s FROM vrt.n.t",
    ).first()[0]
    assert s2 == sum(range(50)) - 7


def test_variant_table_zero_row_file_stats(spark, sf_dir, tmp_path):
    """The Spark stats path treats a part file absent from the
    aggregation as a zero-row file (Spark writes empty parts for empty
    tasks) rather than failing the commit."""
    df = spark.sql(
        "SELECT id, parse_json('{\"a\":1}') AS v FROM range(3)"
    ).repartition(8)  # most parts empty
    cat = Catalog(str(tmp_path / "wh"), name="vz")
    cat.create_table("n.t", df.schema)
    cat.append("n.t", spark, df)
    t = cat.load("n.t")
    assert t.to_df(spark).count() == 3
    assert sum(f.record_count for f in t.files()) == 3


def test_default_column_survives_rename(spark, sf_dir, tmp_path):
    """Regression (r8 evolution fuzzer, seed 88): files written AFTER an
    ADD COLUMN ... DEFAULT store real values under the original name; a
    later RENAME must not make the defaults split misclassify them as
    pre-column files (which silently overwrote stored values with the
    initial-default).  Presence is probed by field id, not name."""
    from datafusion_iceberg_spark.iceberg.catalog import Catalog
    from datafusion_iceberg_spark.tables import load_table

    cat = Catalog(str(tmp_path / "wh"), name="rnm")
    nation = load_table(spark, sf_dir, "nation")
    cat.create_table("d.n", nation.schema)
    cat.append("d.n", spark, nation.filter("n_nationkey < 5"))
    cat.sql(spark, "ALTER TABLE rnm.d.n ADD COLUMN score BIGINT DEFAULT 7")
    cat.append(
        "d.n",
        spark,
        nation.filter("n_nationkey >= 20").withColumn(
            "score", F.col("n_nationkey") * 100
        ),
    )
    cat.sql(spark, "ALTER TABLE rnm.d.n RENAME COLUMN score TO points")
    rows = {
        r["n_nationkey"]: r["points"]
        for r in cat.load("d.n").to_df(spark).collect()
    }
    assert all(rows[k] == 7 for k in range(5))        # pre-column files
    assert all(rows[k] == k * 100 for k in range(20, 25))  # stored values


def test_call_ancestors_of(spark, sf_dir, tmp_path):
    """CALL ancestors_of walks the parent chain (Spark-Iceberg
    procedure parity), from current or a pinned snapshot."""
    from datafusion_iceberg_spark.iceberg.catalog import Catalog
    from datafusion_iceberg_spark.tables import load_table

    cat = Catalog(str(tmp_path / "wh"), name="anc")
    nation = load_table(spark, sf_dir, "nation")
    cat.create_table("d.n", nation.schema)
    for i in range(3):
        cat.append("d.n", spark, nation.filter(f"n_nationkey % 3 = {i}"))
    snaps = sorted(
        cat.load("d.n").metadata.snapshots, key=lambda s: s.timestamp_ms
    )
    full = cat.ancestors_of("d.n")
    assert list(full) == [s.snapshot_id for s in reversed(snaps)]
    partial = cat.ancestors_of("d.n", snaps[1].snapshot_id)
    assert list(partial) == [snaps[1].snapshot_id, snaps[0].snapshot_id]
    out = cat.sql(
        spark, f"CALL anc.system.ancestors_of('d.n', {snaps[1].snapshot_id})"
    ).collect()
    assert len(out) == 2
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not found"):
        cat.ancestors_of("d.n", 999)


def test_gzip_metadata_roundtrip(spark, sf_dir, tmp_path):
    """write.metadata.compression-codec=gzip: every metadata version
    after CREATE writes as v{N}.gz.metadata.json; reads (catalog load,
    writer reload, $metadata_log_entries) gunzip transparently; a
    foreign gzip table (hand-written .gz) also loads."""
    import glob as g
    import gzip
    import json
    import os

    from datafusion_iceberg_spark.iceberg.catalog import Catalog
    from datafusion_iceberg_spark.tables import load_table

    cat = Catalog(str(tmp_path / "wh"), name="gz")
    nation = load_table(spark, sf_dir, "nation")
    cat.create_table(
        "d.n",
        nation.schema,
        properties={"write.metadata.compression-codec": "gzip"},
    )
    cat.append("d.n", spark, nation.limit(7))
    cat.append("d.n", spark, nation.limit(3))
    meta_dir = os.path.join(str(tmp_path / "wh"), "d", "n", "metadata")
    gz_files = g.glob(os.path.join(meta_dir, "v*.gz.metadata.json"))
    assert len(gz_files) >= 2  # appends committed as gzip
    with open(sorted(gz_files)[-1], "rb") as fh:
        assert fh.read(2) == b"\x1f\x8b"
    t = cat.load("d.n")
    assert t.to_df(spark).count() == 10
    # DML through SQL still commits/reads fine
    cat.sql(spark, "DELETE FROM gz.d.n WHERE n_nationkey = 0")
    assert cat.load("d.n").to_df(spark).filter("n_nationkey = 0").count() == 0
    # inspection over mixed (v0 gzip) history
    logs = t.inspect.metadata_log_entries(spark).collect()
    assert len(logs) >= 3
    # foreign flavor: a table whose latest metadata was gzipped by
    # another engine with no version-hint
    froot = str(tmp_path / "foreign")
    os.makedirs(os.path.join(froot, "metadata"))
    src = json.loads(
        gzip.decompress(open(sorted(gz_files)[0], "rb").read())
    )
    with open(
        os.path.join(froot, "metadata", "v1.gz.metadata.json"), "wb"
    ) as fh:
        fh.write(gzip.compress(json.dumps(src).encode()))
    from datafusion_iceberg_spark.iceberg.metadata import load_table_metadata

    fm = load_table_metadata(froot)
    assert fm.table_uuid == src["table-uuid"]


def test_rollback_to_timestamp_and_set_current(spark, sf_dir, tmp_path):
    from datafusion_iceberg_spark.iceberg.catalog import Catalog
    from datafusion_iceberg_spark.tables import load_table

    cat = Catalog(str(tmp_path / "wh"), name="rbt")
    nation = load_table(spark, sf_dir, "nation")
    cat.create_table("d.n", nation.schema)
    cat.append("d.n", spark, nation.limit(5))
    snaps1 = cat.load("d.n").metadata
    s1, t1 = snaps1.current_snapshot_id, snaps1.snapshots[-1].timestamp_ms
    cat.append("d.n", spark, nation.limit(3))
    s2 = cat.load("d.n").metadata.current_snapshot_id
    cat.rollback_to_timestamp("d.n", t1)
    assert cat.load("d.n").metadata.current_snapshot_id == s1
    assert cat.load("d.n").to_df(spark).count() == 5
    # roll FORWARD again via set_current_snapshot (SQL CALL spelling)
    cat.sql(spark, f"CALL rbt.system.set_current_snapshot('d.n', {s2})")
    assert cat.load("d.n").to_df(spark).count() == 8
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no snapshot"):
        cat.rollback_to_timestamp("d.n", 1)


def test_mv_refresh_is_one_atomic_commit(spark, tmp_path):
    """r9 hardening: an applied MV refresh is ONE snapshot on the MV —
    the zero-trim rides the MERGE as a conditional DELETE clause,
    net-zero new groups skip the insert, and the refreshed-through
    marker lives in that snapshot's own summary, so a re-run applies
    nothing (idempotent) and no crash window can double-apply."""
    import os

    from datafusion_iceberg_spark.iceberg.catalog import Catalog
    from datafusion_iceberg_spark.iceberg.mv import (
        create_aggregate_mv,
        mv_df,
        refresh_aggregate_mv,
    )

    cat = Catalog(os.path.join(str(tmp_path), "wh"), name="mvat")
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 5.0), (3, "b", 7.0)],
        "id long, g string, x double",
    )
    cat.create_table("m.src", df.schema)
    cat.append("m.src", spark, df)
    create_aggregate_mv(cat, spark, "m.mv", "m.src", ["g"], "x")
    n0 = len(cat.load("m.mv").metadata.raw["snapshots"])
    # delete ALL of group b (cnt hits 0 -> trimmed INSIDE the merge) and
    # append a net-zero new group? (insert+delete in one window nets 0)
    cat.delete_where("m.src", spark, ("=", "g", "b"))
    out = refresh_aggregate_mv(cat, spark, "m.mv")
    assert out["applied_rows"] == 1
    mv_meta = cat.load("m.mv").metadata
    snaps = mv_meta.raw["snapshots"]
    assert len(snaps) == n0 + 1  # ONE commit for merge + trim + marker
    assert (snaps[-1]["summary"] or {}).get("mv.source-snapshot-id") == str(
        cat.load("m.src").metadata.current_snapshot_id
    )
    rows = {r.g: (r.sum_micros, r.cnt) for r in mv_df(cat, spark, "m.mv").collect()}
    assert "b" not in rows and rows["a"] == (15_000_000, 2)
    # idempotent: a re-run reads the summary marker and applies nothing
    out = refresh_aggregate_mv(cat, spark, "m.mv")
    assert out["applied_rows"] == 0
    assert len(cat.load("m.mv").metadata.raw["snapshots"]) == n0 + 1
    # a group that nets to zero WITHIN the window is never inserted
    cat.append(
        "m.src",
        spark,
        spark.createDataFrame([(9, "z", 1.0)], "id long, g string, x double"),
    )
    cat.delete_where("m.src", spark, ("=", "g", "z"))
    out = refresh_aggregate_mv(cat, spark, "m.mv")
    rows = {r.g for r in mv_df(cat, spark, "m.mv").collect()}
    assert "z" not in rows


def test_mv_refresh_refuses_after_marker_expiry(spark, tmp_path):
    """If every refresh marker references an expired source snapshot,
    refresh must refuse (a silent full-changelog replay over existing
    MV state would double-apply) and direct the user to rebuild."""
    import os

    import pytest

    from datafusion_iceberg_spark.iceberg.catalog import Catalog
    from datafusion_iceberg_spark.iceberg.mv import (
        create_aggregate_mv,
        refresh_aggregate_mv,
    )

    cat = Catalog(os.path.join(str(tmp_path), "wh"), name="mvex")
    df = spark.createDataFrame([(1, "a", 1.0)], "id long, g string, x double")
    cat.create_table("m.src", df.schema)
    cat.append("m.src", spark, df)
    create_aggregate_mv(cat, spark, "m.mv", "m.src", ["g"], "x")
    # advance the source and expire everything but the newest snapshot,
    # so the MV's marker points at retired history
    cat.append("m.src", spark, spark.createDataFrame(
        [(2, "b", 2.0)], "id long, g string, x double"))
    cat.append("m.src", spark, spark.createDataFrame(
        [(3, "c", 3.0)], "id long, g string, x double"))
    cat.expire_snapshots("m.src", keep_last=1)
    with pytest.raises(ValueError, match="expired source snapshots"):
        refresh_aggregate_mv(cat, spark, "m.mv")


def test_mv_refresh_marker_survives_mor_merge_mode(spark, tmp_path):
    """An MV table with write.merge.mode='merge-on-read' must still stamp
    mv.source-snapshot-id on the refresh MERGE snapshot — dropping it on
    the MOR route made the next refresh double-apply the delta window
    (r9 ADVICE, medium)."""
    import os

    from datafusion_iceberg_spark.iceberg.catalog import Catalog
    from datafusion_iceberg_spark.iceberg.mv import (
        create_aggregate_mv,
        mv_df,
        refresh_aggregate_mv,
    )

    cat = Catalog(os.path.join(str(tmp_path), "wh"))
    src = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0)],
        "id long, g string, x double",
    )
    cat.create_table("m.src", src.schema)
    cat.append("m.src", spark, src)
    create_aggregate_mv(cat, spark, "m.mv", "m.src", ["g"], "x")
    # route subsequent refresh MERGEs through merge_mor
    cat.set_properties("m.mv", {"write.merge.mode": "merge-on-read"})
    cat.append(
        "m.src",
        spark,
        spark.createDataFrame([(4, "b", 40.0)], src.schema),
    )
    out = refresh_aggregate_mv(cat, spark, "m.mv")
    assert out["applied_rows"] > 0
    # the marker must ride the MOR snapshot summary
    snaps = cat.load("m.mv").metadata.raw["snapshots"]
    assert any(
        (s.get("summary") or {}).get("mv.source-snapshot-id")
        == str(out["to_snapshot"])
        for s in snaps
    )
    want = {("a", 30.0, 2), ("b", 70.0, 2)}

    def got():
        return {
            (r.g, r.total, r.cnt) for r in mv_df(cat, spark, "m.mv").collect()
        }

    assert got() == want
    # an idle refresh is a no-op, and a further delta applies ONCE
    assert refresh_aggregate_mv(cat, spark, "m.mv")["applied_rows"] == 0
    assert got() == want
    cat.append(
        "m.src", spark, spark.createDataFrame([(5, "a", 5.0)], src.schema)
    )
    refresh_aggregate_mv(cat, spark, "m.mv")
    assert got() == {("a", 35.0, 3), ("b", 70.0, 2)}


def test_write_parquet_compression_codec_property(spark, tmp_path):
    """write.parquet.compression-codec routes to the data-file writer:
    zstd files read back exactly and the footer records the codec."""
    import os

    import pyarrow.parquet as pq

    from datafusion_iceberg_spark.iceberg.catalog import Catalog
    from datafusion_iceberg_spark.tables import load_table
    from tests.conftest import SF_DIR

    cat = Catalog(os.path.join(str(tmp_path), "wh"), name="zc")
    nation = load_table(spark, SF_DIR, "nation")
    cat.create_table(
        "z.n",
        nation.schema,
        properties={"write.parquet.compression-codec": "zstd"},
    )
    cat.append("z.n", spark, nation)
    t = cat.load("z.n")
    files = t.files()
    assert files
    for f in files:
        md = pq.ParquetFile(t.metadata.localize(f.path)).metadata
        codecs = {
            md.row_group(i).column(0).compression
            for i in range(md.num_row_groups)
        }
        assert codecs == {"ZSTD"}
    assert t.to_df(spark).count() == nation.count()
