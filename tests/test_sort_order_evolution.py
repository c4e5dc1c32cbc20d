"""Sort-order evolution (ALTER TABLE ... WRITE ORDERED BY): a new
default sort order applies to SUBSEQUENT appends only — old files keep
their layout, new files carry tight non-overlapping min/max bounds so
range filters prune at the file level."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from datafusion_iceberg_spark.iceberg.catalog import Catalog
from datafusion_iceberg_spark.iceberg.stats import decode_stat


@pytest.fixture()
def scratch(tmp_path):
    return str(tmp_path)


def _shuffled(spark, lo, hi):
    return (
        spark.range(lo, hi)
        .select(
            # scramble so input order is NOT already sorted
            F.xxhash64("id").alias("scramble"),
            F.col("id").alias("k"),
            (F.col("id") * 2).alias("v"),
        )
        .orderBy("scramble")
        .drop("scramble")
        .repartition(4)
    )


def _file_bounds(cat, ident, col_id):
    table = cat.load(ident)
    out = []
    for f in table.files():
        lo, hi = f.lower_bounds.get(col_id), f.upper_bounds.get(col_id)
        if lo is not None:
            out.append(
                (decode_stat("long", lo), decode_stat("long", hi))
            )
    return out


def test_write_ordered_by_tightens_new_file_bounds(spark, scratch):
    cat = Catalog(os.path.join(scratch, "wh"))
    df = _shuffled(spark, 0, 4000)
    cat.create_table("ns.t", df.schema)
    cat.append("ns.t", spark, df)
    pre = _file_bounds(cat, "ns.t", 1)
    # unsorted 4-partition append: every file spans ~the whole domain
    assert any(hi - lo > 3000 for lo, hi in pre)
    cat.sql(spark, "ALTER TABLE iceberg.ns.t WRITE ORDERED BY k")
    assert cat.load("ns.t").metadata.raw["default-sort-order-id"] == 1
    cat.append("ns.t", spark, _shuffled(spark, 4000, 8000))
    post = [b for b in _file_bounds(cat, "ns.t", 1) if b[0] >= 4000]
    assert post, "second append produced no files in the new range"
    # range-partitioned sorted write: new files are pairwise DISJOINT
    post.sort()
    for (lo1, hi1), (lo2, hi2) in zip(post, post[1:]):
        assert hi1 <= lo2, f"overlapping sorted files: {post}"
    # rows are intact across the evolution
    n = cat.sql(spark, "SELECT COUNT(*) AS n FROM iceberg.ns.t").first()["n"]
    assert n == 8000


def test_write_unordered_reverts_and_reuse_dedups_orders(spark, scratch):
    cat = Catalog(os.path.join(scratch, "wh"))
    df = _shuffled(spark, 0, 100)
    cat.create_table("ns.t", df.schema)
    cat.append("ns.t", spark, df)
    cat.set_sort_order("ns.t", ["k"])
    cat.sql(spark, "ALTER TABLE iceberg.ns.t WRITE UNORDERED")
    meta = cat.load("ns.t").metadata.raw
    assert meta["default-sort-order-id"] == 0
    # re-declaring an existing order reuses its id (no duplicate entry)
    cat.set_sort_order("ns.t", ["k"])
    meta = cat.load("ns.t").metadata.raw
    assert meta["default-sort-order-id"] == 1
    assert len(meta["sort-orders"]) == 2  # order 0 + order 1, no dup
    with pytest.raises(ValueError, match="not in schema"):
        cat.set_sort_order("ns.t", ["nope"])


def test_sort_order_through_rest(spark, scratch):
    from datafusion_iceberg_spark.iceberg.rest_catalog import (
        LocalRestServer,
        RestCatalog,
        RestCatalogClient,
    )

    with LocalRestServer(os.path.join(scratch, "wh")) as base:
        client = RestCatalogClient(base)
        rest = RestCatalog(client, name="rc")
        df = _shuffled(spark, 0, 100)
        rest.create_table("ns.t", df.schema)
        rest.set_sort_order("ns.t", ["v"])  # add-sort-order update
        served = client.load_table("ns", "t")["metadata"]
        assert served["default-sort-order-id"] == 1
        assert served["sort-orders"][1]["fields"][0]["source-id"] == 2


def test_partition_evolution_via_sql(spark, scratch):
    """ADD/DROP PARTITION FIELD: metadata-only, new spec applies to
    subsequent appends; each manifest is read under ITS spec."""
    cat = Catalog(os.path.join(scratch, "wh"))
    df = _shuffled(spark, 0, 200)
    cat.create_table("ns.t", df.schema)
    cat.append("ns.t", spark, df)
    cat.sql(spark, "ALTER TABLE iceberg.ns.t ADD PARTITION FIELD bucket(4, k)")
    meta = cat.load("ns.t").metadata
    assert meta.default_spec_id == 1
    cat.append("ns.t", spark, _shuffled(spark, 200, 400))
    n = cat.sql(spark, "SELECT COUNT(*) AS n FROM iceberg.ns.t").first()["n"]
    assert n == 400
    # bucket-pruned point lookup still sees rows from BOTH specs
    got = cat.sql(
        spark, "SELECT COUNT(*) AS n FROM iceberg.ns.t WHERE k IN (5, 205)"
    ).first()["n"]
    assert got == 2
    cat.sql(spark, "ALTER TABLE iceberg.ns.t DROP PARTITION FIELD bucket(4, k)")
    assert cat.load("ns.t").metadata.partition_spec_entries() == []
    import pytest as _pytest

    with _pytest.raises(Exception, match="not in current spec"):
        cat.sql(
            spark, "ALTER TABLE iceberg.ns.t DROP PARTITION FIELD day(nope)"
        )
