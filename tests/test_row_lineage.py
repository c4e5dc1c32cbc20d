"""Iceberg v3 row lineage (round 7): stable first-class row ids
assigned at commit, preserved across DV deletes, MOR updates/merges,
and COW rewrites (compaction/update/delete/merge) via materialized
lineage columns; changelog update images keyed by id.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafusion_iceberg_spark.iceberg.catalog import Catalog
from datafusion_iceberg_spark.tables import load_table

LINEAGE_PROPS = {
    "write.row-lineage.enabled": "true",
    "write.delete.mode": "deletion-vector",
    "write.update.mode": "merge-on-read",
    "write.merge.mode": "merge-on-read",
}


def _table(spark, sf_dir, tmp_path):
    cat = Catalog(str(tmp_path / "wh"), name="lin")
    nation = (
        load_table(spark, sf_dir, "nation").orderBy("n_nationkey").coalesce(1)
    )
    cat.create_table("l.n", nation.schema, properties=LINEAGE_PROPS)
    cat.append("l.n", spark, nation.filter("n_nationkey % 2 = 0"))
    cat.append("l.n", spark, nation.filter("n_nationkey % 2 = 1"))
    return cat


def _lineage(spark, cat):
    return {
        r["n_nationkey"]: (
            r["_row_id"],
            r["_last_updated_sequence_number"],
        )
        for r in cat.load("l.n").lineage_df(spark).collect()
    }


def test_append_assigns_dense_ids_in_commit_order(spark, sf_dir, tmp_path):
    cat = _table(spark, sf_dir, tmp_path)
    out = _lineage(spark, cat)
    # evens (first append, sorted file): ids 0..12; odds: 13..24
    assert out[0] == (0, 1) and out[2] == (1, 1) and out[24] == (12, 1)
    assert out[1] == (13, 2) and out[23] == (24, 2)
    assert sorted(v[0] for v in out.values()) == list(range(25))
    # the counter is persisted in metadata
    t = cat.load("l.n")
    assert int(t.metadata.raw["next-row-id"]) == 25
    # manifest entries carry first_row_id
    frids = sorted(f.first_row_id for f in t.files())
    assert frids == [0, 13]


def test_dv_delete_preserves_surviving_ids(spark, sf_dir, tmp_path):
    cat = _table(spark, sf_dir, tmp_path)
    cat.sql(spark, "DELETE FROM lin.l.n WHERE n_nationkey IN (0, 13)")
    out = _lineage(spark, cat)
    assert 0 not in out and 13 not in out and len(out) == 23
    # neighbours keep their exact pre-delete ids and sequences
    assert out[2] == (1, 1) and out[15] == (20, 2)


def test_mor_update_keeps_id_bumps_sequence(spark, sf_dir, tmp_path):
    cat = _table(spark, sf_dir, tmp_path)
    cat.sql(spark, "UPDATE lin.l.n SET n_name = 'UPD' WHERE n_nationkey = 4")
    out = _lineage(spark, cat)
    assert out[4] == (2, 3)  # id unchanged, updated at the delete's seq
    assert out[6] == (3, 1)  # untouched neighbour unchanged
    # the replacement file holds a MATERIALIZED _row_id column
    t = cat.load("l.n")
    import pyarrow.parquet as pq

    newest = max(
        (f for f in t.files()), key=lambda f: f.first_row_id or 0
    )
    names = pq.read_schema(t.metadata.localize(newest.path)).names
    assert "_row_id" in names
    # and a second update still carries the ORIGINAL id forward
    cat.sql(spark, "UPDATE lin.l.n SET n_name = 'UPD2' WHERE n_nationkey = 4")
    assert _lineage(spark, cat)[4] == (2, 4)


def test_merge_updates_keep_ids_inserts_get_fresh(spark, sf_dir, tmp_path):
    cat = _table(spark, sf_dir, tmp_path)
    t = cat.load("l.n")
    spark.createDataFrame(
        [(8, "ZZ", 0), (30, "NEW", 0)], t.metadata.struct_type()
    ).createOrReplaceTempView("lin_merge_src")
    cat.sql(
        spark,
        "MERGE INTO lin.l.n t USING lin_merge_src s"
        " ON t.n_nationkey = s.n_nationkey"
        " WHEN MATCHED THEN UPDATE SET n_name = s.n_name"
        " WHEN NOT MATCHED THEN INSERT *",
    )
    out = _lineage(spark, cat)
    assert out[8] == (4, 3)  # matched: id kept
    assert out[30][0] >= 25  # insert: fresh id past the counter
    ids = [v[0] for v in out.values()]
    assert len(ids) == len(set(ids)), "row ids must stay unique"


def test_compaction_materializes_lineage(spark, sf_dir, tmp_path):
    """COW compaction rewrites every row into new files at new
    positions; ids AND last-updated sequences must ride along
    materialized, byte-stable across the rewrite."""
    cat = _table(spark, sf_dir, tmp_path)
    cat.sql(spark, "DELETE FROM lin.l.n WHERE n_nationkey = 0")
    cat.sql(spark, "UPDATE lin.l.n SET n_name = 'UPD' WHERE n_nationkey = 4")
    before = _lineage(spark, cat)
    cat.compact("l.n", spark)
    after = _lineage(spark, cat)
    assert after == before
    # compacted files carry BOTH materialized lineage columns
    t = cat.load("l.n")
    import pyarrow.parquet as pq

    for f in t.files():
        names = pq.read_schema(t.metadata.localize(f.path)).names
        assert "_row_id" in names
        assert "_last_updated_sequence_number" in names
    # and a fresh append after compaction continues the id sequence
    nation = load_table(spark, sf_dir, "nation")
    cat.append(
        "l.n",
        spark,
        nation.filter("n_nationkey = 0"),
    )
    out = _lineage(spark, cat)
    assert out[0][0] >= 25  # re-inserted row is a NEW row: fresh id


def test_cow_update_and_delete_preserve_lineage(spark, sf_dir, tmp_path):
    """Copy-on-write UPDATE keeps the matched row's id (null
    materialized last-updated → the rewrite commit's sequence), and COW
    DELETE leaves survivors' lineage untouched."""
    cat = Catalog(str(tmp_path / "wh"), name="lin")
    nation = (
        load_table(spark, sf_dir, "nation").orderBy("n_nationkey").coalesce(1)
    )
    cat.create_table(
        "l.n",
        nation.schema,
        properties={"write.row-lineage.enabled": "true"},  # COW modes
    )
    cat.append("l.n", spark, nation)
    cat.sql(spark, "UPDATE lin.l.n SET n_name = 'UPD' WHERE n_nationkey = 4")
    out = _lineage(spark, cat)
    assert out[4] == (4, 2)  # id kept; updated at the COW commit's seq
    assert out[6] == (6, 1)  # survivor untouched
    cat.sql(spark, "DELETE FROM lin.l.n WHERE n_nationkey = 10")
    out = _lineage(spark, cat)
    assert 10 not in out
    assert out[4] == (4, 2) and out[11] == (11, 1)


def test_cow_merge_preserves_lineage(spark, sf_dir, tmp_path):
    cat = Catalog(str(tmp_path / "wh"), name="lin")
    nation = (
        load_table(spark, sf_dir, "nation").orderBy("n_nationkey").coalesce(1)
    )
    cat.create_table(
        "l.n", nation.schema, properties={"write.row-lineage.enabled": "true"}
    )
    cat.append("l.n", spark, nation)
    t = cat.load("l.n")
    spark.createDataFrame(
        [(8, "ZZ", 0), (30, "NEW", 0)], t.metadata.struct_type()
    ).createOrReplaceTempView("lin_cow_merge_src")
    cat.sql(
        spark,
        "MERGE INTO lin.l.n t USING lin_cow_merge_src s"
        " ON t.n_nationkey = s.n_nationkey"
        " WHEN MATCHED THEN UPDATE SET n_name = s.n_name"
        " WHEN NOT MATCHED THEN INSERT *",
    )
    out = _lineage(spark, cat)
    assert out[8] == (8, 2)  # matched: id kept, updated at merge seq
    assert out[6] == (6, 1)  # carried candidate row untouched
    assert out[30][0] >= 25  # insert: fresh id
    ids = [v[0] for v in out.values()]
    assert len(ids) == len(set(ids))


def test_lineage_refuses_pre_lineage_files(spark, sf_dir, tmp_path):
    cat = Catalog(str(tmp_path / "wh"), name="lin")
    nation = load_table(spark, sf_dir, "nation")
    cat.create_table("l.n", nation.schema)  # lineage NOT enabled
    cat.append("l.n", spark, nation)
    with pytest.raises(ValueError, match="first_row_id"):
        cat.load("l.n").lineage_df(spark).collect()


def test_v3_features_stamp_format_version(spark, sf_dir, tmp_path):
    """Tables using v3 features declare format-version 3: at create when
    the properties opt in, or via one-way upgrade at the first DV /
    lineage commit on an older table."""
    cat = _table(spark, sf_dir, tmp_path)  # lineage+DV props at create
    assert cat.load("l.n").metadata.raw["format-version"] == 3

    cat2 = Catalog(str(tmp_path / "wh2"), name="up")
    nation = load_table(spark, sf_dir, "nation")
    cat2.create_table("u.n", nation.schema)  # plain v2 table
    cat2.append("u.n", spark, nation)
    assert cat2.load("u.n").metadata.raw["format-version"] == 2
    cat2.delete_where_dv("u.n", spark, "n_nationkey = 3")
    assert cat2.load("u.n").metadata.raw["format-version"] == 3


def test_changelog_with_row_lineage_update_images(spark, sf_dir, tmp_path):
    """changelog_df(with_row_lineage=True): every change row carries the
    stable _row_id, and a MOR UPDATE's delete+insert pair at one ordinal
    becomes update_before/update_after images keyed by that id."""
    cat = _table(spark, sf_dir, tmp_path)
    cat.sql(spark, "DELETE FROM lin.l.n WHERE n_nationkey = 2")
    cat.sql(spark, "UPDATE lin.l.n SET n_name = 'UPD' WHERE n_nationkey = 4")
    log = cat.load("l.n").changelog_df(spark, with_row_lineage=True)
    rows = log.select(
        "n_nationkey", "n_name", "_row_id", "_change_type", "_change_ordinal"
    ).collect()
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r["_change_type"], []).append(r)
    # appends: every insert carries its id; key 4's original insert is id 2
    ins = {r["n_nationkey"]: r["_row_id"] for r in by_type["insert"]}
    assert ins[0] == 0 and ins[4] == 2 and ins[1] == 13
    # the plain DV delete of key 2 stays a delete, with its id
    dels = {r["n_nationkey"]: r["_row_id"] for r in by_type.get("delete", [])}
    assert dels == {2: 1}
    # the update surfaces as before/after images sharing id 2
    before = [r for r in by_type["update_before"]]
    after = [r for r in by_type["update_after"]]
    assert len(before) == 1 and len(after) == 1
    assert before[0]["n_nationkey"] == 4 and before[0]["_row_id"] == 2
    assert after[0]["n_name"] == "UPD" and after[0]["_row_id"] == 2
    assert before[0]["_change_ordinal"] == after[0]["_change_ordinal"]


def test_lineage_sql_surface(spark, sf_dir, tmp_path):
    """SQL users reach row lineage via the $lineage table suffix."""
    cat = _table(spark, sf_dir, tmp_path)
    cat.sql(spark, "DELETE FROM lin.l.n WHERE n_nationkey = 2")
    rows = cat.sql(
        spark,
        "SELECT n_nationkey, _row_id FROM lin.l.n$lineage"
        " WHERE _last_updated_sequence_number = 1 ORDER BY _row_id",
    ).collect()
    got = [(r[0], r[1]) for r in rows]
    assert (2, 1) not in got and got[0] == (0, 0) and len(got) == 12


def test_concurrent_lineage_appends_no_overlapping_ids(
    spark, sf_dir, tmp_path, monkeypatch
):
    """ADVICE r7: a lineage append that loses the metadata race must
    RE-MINT first_row_id from the reloaded next-row-id on retry — ids
    stamped by the lost attempt are stale (the winner consumed that
    range) and keeping them commits overlapping _row_id values."""
    from datafusion_iceberg_spark.iceberg import writer as writer_mod

    cat = Catalog(str(tmp_path / "wh"), name="lin")
    nation = (
        load_table(spark, sf_dir, "nation").orderBy("n_nationkey").coalesce(1)
    )
    cat.create_table("l.n", nation.schema, properties=LINEAGE_PROPS)
    cat.append("l.n", spark, nation.filter("n_nationkey < 5"))  # ids 0..4

    orig_load = writer_mod.IcebergWriter._load_current
    state = {"fired": False}

    def racing_load(self):
        meta = orig_load(self)
        if not state["fired"]:
            state["fired"] = True
            # competitor wins the race AFTER this attempt read metadata
            # (and will assign ids from the same counter value); restore
            # the real loader so the competitor's commit is unpatched
            monkeypatch.setattr(
                writer_mod.IcebergWriter, "_load_current", orig_load
            )
            try:
                cat.append(
                    "l.n", spark, nation.filter("n_nationkey >= 20")
                )  # consumes ids 5..9
            finally:
                monkeypatch.setattr(
                    writer_mod.IcebergWriter, "_load_current", racing_load
                )
        return meta

    monkeypatch.setattr(
        writer_mod.IcebergWriter, "_load_current", racing_load
    )
    cat.append("l.n", spark, nation.filter("n_nationkey BETWEEN 10 AND 14"))

    t = cat.load("l.n")
    ids = [r["_row_id"] for r in t.lineage_df(spark).collect()]
    assert len(ids) == len(set(ids)), f"duplicate _row_id values: {sorted(ids)}"
    assert sorted(ids) == list(range(15))
    assert int(t.metadata.raw["next-row-id"]) == 15
