"""Flink-style UPSERT: one snapshot = equality delete on the identity
keys + the batch's data files (writer.upsert), keyed by the schema's
identifier-field-ids.  The reference has no write path at all
(SURVEY.md §2C); this is the delete flavor Flink CDC sinks emit per
checkpoint — cost O(batch), no table scan."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from datafusion_iceberg_spark.iceberg.catalog import Catalog


@pytest.fixture()
def scratch(tmp_path):
    return str(tmp_path)


def _rows(spark, pairs):
    return spark.createDataFrame(pairs, "k long, v long")


def _state(cat, spark, ident="ns.t"):
    return {
        r["k"]: r["v"]
        for r in cat.sql(spark, f"SELECT k, v FROM iceberg.{ident}").collect()
    }


def test_upsert_last_wins_and_inserts(spark, scratch):
    cat = Catalog(os.path.join(scratch, "wh"))
    df = _rows(spark, [(1, 10), (2, 20), (3, 30)])
    cat.create_table("ns.t", df.schema)
    cat.append("ns.t", spark, df)
    cat.set_identifier_fields("ns.t", ["k"])
    cat.upsert("ns.t", spark, _rows(spark, [(2, 200), (4, 40)]))
    assert _state(cat, spark) == {1: 10, 2: 200, 3: 30, 4: 40}
    # a second upsert shadows the first (higher sequence)
    cat.upsert("ns.t", spark, _rows(spark, [(2, 2000), (5, 50)]))
    assert _state(cat, spark) == {1: 10, 2: 2000, 3: 30, 4: 40, 5: 50}
    # ONE snapshot per upsert, carrying both delete and data files
    tbl = cat.load("ns.t")
    assert len(tbl.metadata.snapshots) == 3
    last = tbl.metadata.snapshots[-1]
    assert last.summary["operation"] == "overwrite"
    assert int(last.summary["added-equality-deletes"]) == 2


def test_upsert_explicit_keys_and_composite(spark, scratch):
    cat = Catalog(os.path.join(scratch, "wh"))
    df = spark.createDataFrame(
        [(1, "a", 10), (1, "b", 11), (2, "a", 20)], "k long, s string, v long"
    )
    cat.create_table("ns.c", df.schema)
    cat.append("ns.c", spark, df)
    # composite key via on=[...] without declared identifier fields
    cat.upsert(
        "ns.c",
        spark,
        spark.createDataFrame([(1, "b", 111)], "k long, s string, v long"),
        on=["k", "s"],
    )
    got = {
        (r["k"], r["s"]): r["v"]
        for r in cat.sql(spark, "SELECT * FROM iceberg.ns.c").collect()
    }
    assert got == {(1, "a"): 10, (1, "b"): 111, (2, "a"): 20}


def test_upsert_requires_keys_and_unique_batch(spark, scratch):
    cat = Catalog(os.path.join(scratch, "wh"))
    df = _rows(spark, [(1, 10)])
    cat.create_table("ns.t", df.schema)
    cat.append("ns.t", spark, df)
    with pytest.raises(ValueError, match="identifier"):
        cat.upsert("ns.t", spark, _rows(spark, [(1, 11)]))
    cat.set_identifier_fields("ns.t", ["k"])
    with pytest.raises(ValueError, match="duplicate keys"):
        cat.upsert("ns.t", spark, _rows(spark, [(1, 11), (1, 12)]))


def test_identifier_fields_persist_in_schema(spark, scratch):
    cat = Catalog(os.path.join(scratch, "wh"))
    df = _rows(spark, [(1, 10)])
    cat.create_table("ns.t", df.schema)
    cat.set_identifier_fields("ns.t", ["k"])
    meta = cat.load("ns.t").metadata
    assert meta.current_schema.get("identifier-field-ids") == [1]
    # idempotent: no new schema version for the same declaration
    n_schemas = len(meta.raw["schemas"])
    cat.set_identifier_fields("ns.t", ["k"])
    assert len(cat.load("ns.t").metadata.raw["schemas"]) == n_schemas


def test_upsert_interleaves_with_appends(spark, scratch):
    """Sequence ordering across mixed commits: an append AFTER an upsert
    re-introduces a deleted key (strictly-before rule)."""
    cat = Catalog(os.path.join(scratch, "wh"))
    df = _rows(spark, [(1, 10), (2, 20)])
    cat.create_table("ns.t", df.schema)
    cat.append("ns.t", spark, df)
    cat.set_identifier_fields("ns.t", ["k"])
    cat.upsert("ns.t", spark, _rows(spark, [(1, 100)]))
    # later plain append wins over the earlier upsert's delete
    cat.append("ns.t", spark, _rows(spark, [(9, 90)]))
    assert _state(cat, spark) == {1: 100, 2: 20, 9: 90}
    # compaction folds the MOR state into plain data files, same rows
    cat.compact("ns.t", spark)
    assert _state(cat, spark) == {1: 100, 2: 20, 9: 90}


def test_upsert_through_rest_service(spark, scratch):
    from datafusion_iceberg_spark.iceberg.rest_catalog import (
        LocalRestServer,
        RestCatalog,
        RestCatalogClient,
    )

    with LocalRestServer(os.path.join(scratch, "wh")) as base:
        client = RestCatalogClient(base)
        rest = RestCatalog(client, name="rc")
        df = _rows(spark, [(1, 10), (2, 20)])
        rest.create_table("ns.t", df.schema)
        rest.append("ns.t", spark, df)
        rest.set_identifier_fields("ns.t", ["k"])
        rest.upsert("ns.t", spark, _rows(spark, [(2, 200), (3, 30)]))
        got = {
            r["k"]: r["v"]
            for r in rest.sql(spark, "SELECT k, v FROM rc.ns.t").collect()
        }
        assert got == {1: 10, 2: 200, 3: 30}
        served = client.load_table("ns", "t")["metadata"]
        cur = served["current-snapshot-id"]
        snap = next(
            s for s in served["snapshots"] if s["snapshot-id"] == cur
        )
        assert snap["summary"]["added-equality-deletes"] == "2"


def test_set_identifier_fields_via_sql(spark, scratch):
    cat = Catalog(os.path.join(scratch, "wh"))
    df = _rows(spark, [(1, 10), (2, 20)])
    cat.create_table("ns.t", df.schema)
    cat.append("ns.t", spark, df)
    cat.sql(spark, "ALTER TABLE iceberg.ns.t SET IDENTIFIER FIELDS k")
    assert cat.load("ns.t").metadata.current_schema[
        "identifier-field-ids"
    ] == [1]
    cat.upsert("ns.t", spark, _rows(spark, [(2, 200)]))
    assert _state(cat, spark) == {1: 10, 2: 200}


def test_eq_delete_bounds_narrow_cow_fold(spark, tmp_path):
    """r8: equality-delete key parquets carry key-column bounds, so
    files_targeted_by_deletes folds only strictly-older files whose key
    ranges can intersect the delete — not the whole older table."""
    from pyspark.sql import functions as F

    from datafusion_iceberg_spark.iceberg.catalog import Catalog

    cat = Catalog(str(tmp_path / "wh"), name="eqb")
    df_lo = spark.range(0, 100).select(
        F.col("id").alias("k"), F.col("id").alias("v")
    )
    df_hi = spark.range(100000, 100100).select(
        F.col("id").alias("k"), F.col("id").alias("v")
    )
    cat.create_table("d.t", df_lo.schema)
    cat.append("d.t", spark, df_lo.coalesce(1))
    cat.append("d.t", spark, df_hi.coalesce(1))
    cat.set_identifier_fields("d.t", ["k"])
    # upsert touches only the low key range
    cat.upsert(
        "d.t",
        spark,
        spark.createDataFrame([(5, 555), (7, 777)], "k long, v long"),
    )
    t = cat.load("d.t")
    targeted = t.files_targeted_by_deletes()
    lows = [p for p in targeted if "snap-" in p]
    # exactly the low-range file (and not the upsert's own batch file,
    # which is same-sequence) is targeted; the high-range file is spared
    assert len(targeted) == 1
    # and a compact folds only what it must, with exact results
    out = cat.compact_binpack("d.t", spark, target_file_bytes=1 << 30)
    got = {r["k"]: r["v"] for r in cat.load("d.t").to_df(spark).collect()}
    assert got[5] == 555 and got[7] == 777 and got[6] == 6
    assert got[100050] == 100050
    assert len(got) == 200


def test_sql_delete_equality_mode(spark, tmp_path):
    """write.delete.mode='equality': SQL DELETE commits the matching
    identifier keys as an equality-delete file — later re-inserts of the
    same key SURVIVE (the eq-delete strictly-older contract)."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from datafusion_iceberg_spark.iceberg.catalog import Catalog

    cat = Catalog(str(tmp_path / "wh"), name="eqd")
    df = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    cat.create_table(
        "d.t", df.schema, properties={"write.delete.mode": "equality"}
    )
    cat.append("d.t", spark, df)
    with _pytest.raises(ValueError, match="IDENTIFIER FIELDS"):
        cat.sql(spark, "DELETE FROM eqd.d.t WHERE k < 10")
    cat.set_identifier_fields("d.t", ["k"])
    cat.sql(spark, "DELETE FROM eqd.d.t WHERE k < 10")
    t = cat.load("d.t")
    assert t.to_df(spark).count() == 90
    assert t.equality_delete_files()
    assert not t.position_delete_files()
    # re-insert a deleted key: the older eq delete must NOT hit it
    cat.append(
        "d.t", spark, spark.createDataFrame([(5, 999)], "k long, v long")
    )
    rows = {r["k"]: r["v"] for r in cat.load("d.t").to_df(spark).collect()}
    assert rows[5] == 999 and len(rows) == 91
