"""Round-7 deletion-vector write-path contract (VERDICT r6 item #2 +
ADVICE r6): executor-side roaring encoding, carry-forward of untouched
DVs by reference, fresh-only delete accounting, conflict-safe rebuild,
and the rewrite_deletion_vectors maintenance op.

Reference parity anchor: the reference filters delete manifests out
entirely (table.rs:139-145) — this whole surface extends the lead.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from datafusion_iceberg_spark.iceberg.catalog import Catalog
from datafusion_iceberg_spark.tables import load_table


def _dv_table(spark, sf_dir, root, name="d.n", rows="nation"):
    cat = Catalog(root)
    src = load_table(spark, sf_dir, rows)
    cat.create_table(
        name,
        src.schema,
        properties={"write.delete.mode": "deletion-vector"},
    )
    cat.append(name, spark, src)
    return cat, src


def test_untouched_dvs_carried_forward_by_reference(spark, sf_dir, tmp_path):
    """A DV commit writes blobs for TOUCHED files only; other files'
    vectors stay in their ORIGINAL puffin container (entry carried
    forward by reference), so commit cost is O(matched files), not
    O(table delete history)."""
    root = str(tmp_path / "wh")
    cat = Catalog(root)
    lineitem = load_table(spark, sf_dir, "lineitem")
    # partition so different predicates touch disjoint files
    cat.create_table(
        "d.l",
        lineitem.schema,
        partition_by=["l_returnflag"],
        properties={"write.delete.mode": "deletion-vector"},
    )
    cat.append("d.l", spark, lineitem)
    cat.sql(
        spark,
        "DELETE FROM iceberg.d.l WHERE l_returnflag = 'R' AND l_orderkey % 5 = 0",
    )
    t = cat.load("d.l")
    dels1 = {d.referenced_data_file: d for d in t.position_delete_files()}
    assert dels1
    containers1 = {d.path for d in dels1.values()}
    assert len(containers1) == 1

    # second delete touches ONLY 'A'-partition files
    cat.sql(
        spark,
        "DELETE FROM iceberg.d.l WHERE l_returnflag = 'A' AND l_orderkey % 5 = 0",
    )
    t = cat.load("d.l")
    dels2 = {d.referenced_data_file: d for d in t.position_delete_files()}
    # at most one DV per data file
    assert len(dels2) == len(t.position_delete_files())
    # the R-partition vectors still point into the ORIGINAL container —
    # byte-identical references, not rewritten copies
    for tgt, d1 in dels1.items():
        d2 = dels2[tgt]
        assert d2.path == d1.path
        assert d2.content_offset == d1.content_offset
        assert d2.content_size_in_bytes == d1.content_size_in_bytes
        # carried entries keep their original data sequence number
        assert d2.sequence_number == d1.sequence_number
    # and the A-partition vectors live in a NEW container
    new_containers = {d.path for d in dels2.values()} - containers1
    assert len(new_containers) == 1
    # scan agrees with the logical result
    expect = lineitem.filter(
        ~((F.col("l_returnflag").isin("R", "A")) & (F.col("l_orderkey") % 5 == 0))
    )
    got = t.to_df(spark)
    assert got.count() == expect.count()
    st = t.statistics()
    assert st["num_rows"] == expect.count() and st["is_exact"]


def test_dv_summary_reports_fresh_positions_only(spark, sf_dir, tmp_path):
    """ADVICE r6: added-position-deletes must count NEWLY deleted
    positions, not the merged union with prior vectors."""
    root = str(tmp_path / "wh")
    cat, nation = _dv_table(spark, sf_dir, root)
    cat.sql(spark, "DELETE FROM iceberg.d.n WHERE n_nationkey < 10")
    cat.sql(spark, "DELETE FROM iceberg.d.n WHERE n_nationkey < 15")
    t = cat.load("d.n")
    snaps = sorted(
        t.metadata.raw["snapshots"], key=lambda s: s["sequence-number"]
    )
    deltas = [
        int(s["summary"].get("added-position-deletes", 0)) for s in snaps
    ]
    # append, first delete (10 fresh), second delete (5 fresh: 10..14)
    assert deltas[-2:] == [10, 5]
    assert t.to_df(spark).count() == nation.filter("n_nationkey >= 15").count()


def test_noop_dv_delete_commits_no_snapshot(spark, sf_dir, tmp_path):
    """ADVICE r6: a DELETE matching only already-deleted (or no) rows on
    a table with existing DVs must NOT commit a spurious DV-rewrite
    snapshot."""
    root = str(tmp_path / "wh")
    cat, nation = _dv_table(spark, sf_dir, root)
    cat.sql(spark, "DELETE FROM iceberg.d.n WHERE n_nationkey < 5")
    t = cat.load("d.n")
    n_snaps = len(t.metadata.raw["snapshots"])
    # rows already gone: the scan sees no live match
    cat.sql(spark, "DELETE FROM iceberg.d.n WHERE n_nationkey < 5")
    # and a predicate matching nothing at all
    cat.sql(spark, "DELETE FROM iceberg.d.n WHERE n_nationkey = 999")
    t = cat.load("d.n")
    assert len(t.metadata.raw["snapshots"]) == n_snaps
    assert t.to_df(spark).count() == nation.filter("n_nationkey >= 5").count()


def test_collect_new_dvs_ships_bitmap_bytes_not_positions(
    spark, sf_dir, tmp_path
):
    """The driver-side payload of a DV delete is {path: (roaring bytes,
    cardinality, fresh)} — serialized bitmaps, never position lists."""
    from datafusion_iceberg_spark.iceberg.roaring import deserialize_u64
    from datafusion_iceberg_spark.iceberg.writer import IcebergWriter

    del_rows = spark.createDataFrame(
        [("f1", p) for p in range(100)] + [("f2", p) for p in (7, 9)],
        "file_path string, pos long",
    )
    out = IcebergWriter._collect_new_dvs(del_rows, {})
    assert set(out) == {"f1", "f2"}
    bitmap, card, fresh = out["f1"]
    assert isinstance(bitmap, bytes)
    assert card == 100 and fresh == 100
    assert deserialize_u64(bitmap) == list(range(100))
    assert deserialize_u64(out["f2"][0]) == [7, 9]


def test_collect_new_dvs_merges_prior_blob_in_executor(
    spark, sf_dir, tmp_path
):
    """Prior vectors are ranged-read and unioned IN the applyInPandas
    task; rows already deleted count as not-fresh, and a group with no
    fresh rows is dropped (its DV carries forward untouched)."""
    from datafusion_iceberg_spark.iceberg.puffin import dv_blob, write_puffin
    from datafusion_iceberg_spark.iceberg.roaring import deserialize_u64
    from datafusion_iceberg_spark.iceberg.writer import IcebergWriter

    puffin = str(tmp_path / "prior.puffin")
    blobs = write_puffin(
        puffin, [dv_blob([5, 6], "f1"), dv_blob([1, 2], "f2")]
    )
    prior = {
        "f1": (puffin, blobs[0].offset, blobs[0].length),
        "f2": (puffin, blobs[1].offset, blobs[1].length),
    }
    del_rows = spark.createDataFrame(
        [("f1", 5), ("f1", 7), ("f2", 1), ("f2", 2)],
        "file_path string, pos long",
    )
    out = IcebergWriter._collect_new_dvs(del_rows, prior)
    # f2's matches were all already deleted: nothing fresh, dropped
    assert set(out) == {"f1"}
    bitmap, card, fresh = out["f1"]
    assert deserialize_u64(bitmap) == [5, 6, 7]
    assert (card, fresh) == (3, 1)


def test_dv_blob_footer_carries_sequence_number(spark, sf_dir, tmp_path):
    """ADVICE r6: puffin blob metadata must record the commit's data
    sequence number (strict foreign readers parse it), matching the
    manifest entry's sequence."""
    from datafusion_iceberg_spark.iceberg.puffin import read_puffin

    root = str(tmp_path / "wh")
    cat, _ = _dv_table(spark, sf_dir, root)
    cat.sql(spark, "DELETE FROM iceberg.d.n WHERE n_nationkey < 3")
    t = cat.load("d.n")
    d = t.position_delete_files()[0]
    blobs, _props = read_puffin(t.metadata.localize(d.path))
    assert blobs and all(b.sequence_number == d.sequence_number for b in blobs)
    assert d.sequence_number == t.metadata.raw["last-sequence-number"]


def test_concurrent_dv_commit_rebuilds_not_duplicates(
    spark, sf_dir, tmp_path, monkeypatch
):
    """ADVICE r6: if another DV commit lands between build and commit,
    the retry must REBUILD against fresh metadata — after both commits
    every data file still has at most one DV and statistics subtract
    each position once."""
    from datafusion_iceberg_spark.iceberg import writer as writer_mod

    root = str(tmp_path / "wh")
    cat, nation = _dv_table(spark, sf_dir, root)

    orig = writer_mod.IcebergWriter._commit_mor_delete_snapshot
    state = {"fired": False}

    def racing_commit(self, *args, **kwargs):
        if not state["fired"]:
            state["fired"] = True
            # land a competing DV delete through a SECOND writer before
            # the first commit attempt runs (unpatched, no recursion)
            writer_mod.IcebergWriter._commit_mor_delete_snapshot = orig
            try:
                Catalog(root).sql(
                    spark, "DELETE FROM iceberg.d.n WHERE n_nationkey = 20"
                )
            finally:
                writer_mod.IcebergWriter._commit_mor_delete_snapshot = (
                    racing_commit
                )
        return orig(self, *args, **kwargs)

    monkeypatch.setattr(
        writer_mod.IcebergWriter, "_commit_mor_delete_snapshot", racing_commit
    )
    cat.sql(spark, "DELETE FROM iceberg.d.n WHERE n_nationkey < 5")
    t = cat.load("d.n")
    dels = t.position_delete_files()
    targets = [d.referenced_data_file for d in dels]
    assert len(targets) == len(set(targets)), "two DVs reference one file"
    expect = nation.filter("n_nationkey >= 5 AND n_nationkey != 20")
    assert t.to_df(spark).count() == expect.count()
    st = t.statistics()
    assert st["num_rows"] == expect.count() and st["is_exact"]


def test_rewrite_deletion_vectors_consolidates_containers(
    spark, sf_dir, tmp_path
):
    """Maintenance: N carry-forward containers merge into one by byte
    copy; scan results, per-file cardinalities, and original sequence
    numbers are unchanged."""
    root = str(tmp_path / "wh")
    cat = Catalog(root)
    lineitem = load_table(spark, sf_dir, "lineitem")
    cat.create_table(
        "d.l",
        lineitem.schema,
        partition_by=["l_returnflag"],
        properties={"write.delete.mode": "deletion-vector"},
    )
    cat.append("d.l", spark, lineitem)
    for flag in ("R", "A", "N"):
        cat.sql(
            spark,
            f"DELETE FROM iceberg.d.l WHERE l_returnflag = '{flag}'"
            " AND l_orderkey % 3 = 0",
        )
    t = cat.load("d.l")
    before = {
        d.referenced_data_file: (d.record_count, d.sequence_number)
        for d in t.position_delete_files()
    }
    n_containers = len({d.path for d in t.position_delete_files()})
    assert n_containers == 3
    n_rows = t.to_df(spark).count()

    res = cat.rewrite_deletion_vectors("d.l")
    assert res["containers_before"] == 3 and res["containers_after"] == 1
    t = cat.load("d.l")
    after = {
        d.referenced_data_file: (d.record_count, d.sequence_number)
        for d in t.position_delete_files()
    }
    assert after == before
    assert len({d.path for d in t.position_delete_files()}) == 1
    assert t.to_df(spark).count() == n_rows
    st = t.statistics()
    assert st["num_rows"] == n_rows and st["is_exact"]
    # idempotent second call is a no-op
    res2 = cat.rewrite_deletion_vectors("d.l")
    assert res2["snapshot_id"] is None


def test_existing_entry_null_sequence_not_inherited(tmp_path):
    """ADVICE r6 (manifests.py): v2 null-sequence inheritance applies
    only to ADDED (status=1) entries; an EXISTING entry that illegally
    wrote null must stay None (conservative fallback), not take the
    rewrite commit's newer sequence."""
    from datafusion_iceberg_spark.iceberg.avro import write_avro_file
    from datafusion_iceberg_spark.iceberg.manifests import read_manifest
    from datafusion_iceberg_spark.iceberg.writer import _manifest_schema

    path = str(tmp_path / "m.avro")
    entries = [
        {
            "status": 1,
            "snapshot_id": 1,
            "data_file": {
                "file_path": "/d/a.parquet",
                "file_format": "PARQUET",
                "partition": {},
                "record_count": 1,
                "file_size_in_bytes": 10,
                "block_size_in_bytes": 1,
            },
        },
        {
            "status": 0,
            "snapshot_id": 1,
            "data_file": {
                "file_path": "/d/b.parquet",
                "file_format": "PARQUET",
                "partition": {},
                "record_count": 1,
                "file_size_in_bytes": 10,
                "block_size_in_bytes": 1,
            },
        },
    ]
    write_avro_file(path, _manifest_schema([]), entries)
    got = {f.path: f.sequence_number for f in read_manifest(path, inherit_seq=9)}
    assert got["/d/a.parquet"] == 9  # ADDED inherits
    assert got["/d/b.parquet"] is None  # EXISTING does not
