"""Keyed CDC update pairing on NON-lineage (v2) tables
(sources/iceberg_datasource.py, opt-in ``cdc_pair_keys``): the
identifier-field tuple substitutes for ``_row_id`` as the pre/post image
identity, bucket-locally."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from datafusion_iceberg_spark.iceberg.catalog import Catalog
from datafusion_iceberg_spark.sources.iceberg_datasource import (
    register_iceberg_datasource,
)


def _stream_cdc(spark, root, table_dir, out, pair=True, extra=None):
    reader = (
        spark.readStream.format("iceberg_py")
        .option("path", table_dir)
        .option("mode", "cdc")
    )
    if pair:
        reader = reader.option("cdc_pair_keys", "true")
    for k, v in (extra or {}).items():
        reader = reader.option(k, v)
    q = (
        reader.load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", os.path.join(root, "_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.read.parquet(out).filter(F.col("_change_ordinal") > 0)


@pytest.fixture()
def wh(tmp_path, spark):
    register_iceberg_datasource(spark)
    root = str(tmp_path / "wh")
    cat = Catalog(root, name="ckp")
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40)],
        "k long, name string, v long",
    )
    cat.create_table("n.t", df.schema)
    cat.set_identifier_fields("n.t", ["k"])
    cat.append("n.t", spark, df)
    return root, cat


def test_value_update_pairs(spark, wh, tmp_path):
    """A COW UPDATE of a non-key column yields update_before/update_after
    sharing the key — never bare delete/insert."""
    root, cat = wh
    cat.sql(spark, "UPDATE ckp.n.t SET v = v + 100 WHERE k IN (2, 3)")
    rows = _stream_cdc(
        spark, root, os.path.join(root, "n", "t"), str(tmp_path / "o1")
    ).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r["_change_type"], []).append((r["k"], r["v"]))
    assert sorted(by_type.get("update_before", [])) == [(2, 20), (3, 30)]
    assert sorted(by_type.get("update_after", [])) == [(2, 120), (3, 130)]
    assert "delete" not in by_type and "insert" not in by_type


def test_key_change_stays_delete_insert(spark, wh, tmp_path):
    """Updating the IDENTIFIER itself is a key death + key birth: the
    images do not share an identity and must stream as delete+insert."""
    root, cat = wh
    cat.sql(spark, "UPDATE ckp.n.t SET k = 99 WHERE k = 4")
    rows = _stream_cdc(
        spark, root, os.path.join(root, "n", "t"), str(tmp_path / "o2")
    ).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r["_change_type"], []).append(r["k"])
    assert by_type.get("delete") == [4]
    assert by_type.get("insert") == [99]
    assert "update_before" not in by_type


def test_opt_in_required_without_identifier_fields(spark, tmp_path):
    """cdc_pair_keys on a table with NO identifier-field-ids refuses
    loudly at planning time."""
    register_iceberg_datasource(spark)
    root = str(tmp_path / "wh2")
    cat = Catalog(root, name="ckq")
    df = spark.createDataFrame([(1, 10)], "k long, v long")
    cat.create_table("n.t", df.schema)
    cat.append("n.t", spark, df)
    cat.sql(spark, "UPDATE ckq.n.t SET v = 11 WHERE k = 1")
    with pytest.raises(Exception, match="identifier-field-ids"):
        _stream_cdc(
            spark, root, os.path.join(root, "n", "t"), str(tmp_path / "o3")
        ).collect()


def test_without_opt_in_unpaired(spark, wh, tmp_path):
    """Without the option the v2 overwrite diff keeps the plain
    delete/insert shape (backwards-compatible default)."""
    root, cat = wh
    cat.sql(spark, "UPDATE ckp.n.t SET v = v + 100 WHERE k = 1")
    rows = _stream_cdc(
        spark,
        root,
        os.path.join(root, "n", "t"),
        str(tmp_path / "o4"),
        pair=False,
    ).collect()
    types = {r["_change_type"] for r in rows}
    assert types == {"delete", "insert"}


# ---------------------------------------------------------------------------
# Round 14: keyed pairing on the BATCH changelog face (VERDICT r13 #5)
# ---------------------------------------------------------------------------


def test_batch_changelog_pair_keys_upgrades_updates(spark, tmp_path):
    from datafusion_iceberg_spark.iceberg.catalog import Catalog

    cat = Catalog(str(tmp_path / "bkp"), name="bkp")
    df = spark.createDataFrame(
        [(i, i * 10) for i in range(20)], "k long, v long"
    )
    cat.create_table("c.t", df.schema)
    cat.set_identifier_fields("c.t", ["k"])
    cat.append("c.t", spark, df)
    cat.sql(spark, "UPDATE bkp.c.t SET v = v + 1 WHERE k % 5 = 0")
    t = cat.load("c.t")
    log = t.changelog_df(spark, pair_keys=True)
    rows = log.filter("(_change_ordinal) > 0").collect()
    before = sorted((r.k, r.v) for r in rows if r._change_type == "update_before")
    after = sorted((r.k, r.v) for r in rows if r._change_type == "update_after")
    assert before == [(k, k * 10) for k in range(0, 20, 5)]
    assert after == [(k, k * 10 + 1) for k in range(0, 20, 5)]
    # nothing left unpaired at the update ordinal
    assert not [r for r in rows if r._change_type in ("insert", "delete")]
    # the initial append stays a plain insert (no delete partner)
    ins = log.filter("_change_ordinal = 0").collect()
    assert {r._change_type for r in ins} == {"insert"}
    assert len(ins) == 20


def test_batch_changelog_pair_keys_mixed_ops_stay_unpaired(spark, tmp_path):
    """A DELETE-only commit and an INSERT-only commit must NOT upgrade:
    pairing requires both faces at ONE ordinal for ONE key."""
    from datafusion_iceberg_spark.iceberg.catalog import Catalog

    cat = Catalog(str(tmp_path / "bkm"), name="bkm")
    df = spark.createDataFrame(
        [(i, i * 10) for i in range(10)], "k long, v long"
    )
    cat.create_table("c.t", df.schema)
    cat.set_identifier_fields("c.t", ["k"])
    cat.append("c.t", spark, df)
    cat.sql(spark, "DELETE FROM bkm.c.t WHERE k = 3")
    cat.append(
        "c.t", spark, spark.createDataFrame([(3, 999)], "k long, v long")
    )
    t = cat.load("c.t")
    rows = t.changelog_df(spark, pair_keys=True).filter(
        "_change_ordinal > 0"
    ).collect()
    kinds = sorted((r._change_ordinal, r._change_type, r.v) for r in rows)
    assert kinds == [(1, "delete", 30), (2, "insert", 999)]


def test_batch_changelog_pair_keys_refusals(spark, tmp_path):
    import pytest

    from datafusion_iceberg_spark.iceberg.catalog import Catalog

    cat = Catalog(str(tmp_path / "bkr"), name="bkr")
    df = spark.createDataFrame([(1, 2)], "k long, v long")
    cat.create_table("c.t", df.schema)
    cat.append("c.t", spark, df)
    t = cat.load("c.t")
    with pytest.raises(ValueError, match="identifier-field-ids"):
        t.changelog_df(spark, pair_keys=True)
    with pytest.raises(ValueError, match="mutually"):
        t.changelog_df(spark, pair_keys=True, with_row_lineage=True)


def test_keyed_changelog_gate_matches_oracle(spark, duck, sf_dir):
    from datafusion_iceberg_spark import registry
    from tests.oracle_compare import compare

    registry.load_all_modules()
    name = "iceberg_keyed_changelog_scan"
    compare(
        registry.QUERIES[name](spark, sf_dir),
        duck.sql(registry.ORACLES[name]),
        name,
    )
