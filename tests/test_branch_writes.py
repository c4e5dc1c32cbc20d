"""Multi-commit branch writes (round 7): staged appends chain on the
branch head, main stays isolated until fast-forward, and publishing
replays the whole chain into the snapshot log in commit order.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafusion_iceberg_spark.iceberg.catalog import Catalog
from datafusion_iceberg_spark.iceberg.writer import CommitConflict
from datafusion_iceberg_spark.tables import load_table


def test_branch_appends_chain_on_branch_head(spark, sf_dir, tmp_path):
    cat = Catalog(str(tmp_path / "wh"), name="bw")
    nation = load_table(spark, sf_dir, "nation")
    cat.create_table("b.n", nation.schema)
    cat.append("b.n", spark, nation.filter("n_nationkey < 5"))
    cat.stage_append("b.n", spark, nation.filter("n_nationkey BETWEEN 5 AND 9"), "dev")
    cat.stage_append("b.n", spark, nation.filter("n_nationkey BETWEEN 10 AND 14"), "dev")
    t = cat.load("b.n")
    # main untouched; branch holds base + both staged commits
    assert t.to_df(spark).count() == 5
    assert t.to_df(spark, ref="dev").count() == 15
    # the second branch commit's parent is the FIRST branch commit
    refs = t.metadata.refs()
    head = refs["dev"]["snapshot-id"]
    snaps = {s.snapshot_id: s for s in t.metadata.snapshots}
    parent = snaps[head].parent_id
    assert parent in snaps and parent != t.metadata.raw["current-snapshot-id"]


def test_fast_forward_publishes_whole_chain_in_order(spark, sf_dir, tmp_path):
    cat = Catalog(str(tmp_path / "wh"), name="bw")
    nation = load_table(spark, sf_dir, "nation")
    cat.create_table("b.n", nation.schema)
    cat.append("b.n", spark, nation.filter("n_nationkey < 5"))
    cat.stage_append("b.n", spark, nation.filter("n_nationkey BETWEEN 5 AND 9"), "dev")
    cat.stage_append("b.n", spark, nation.filter("n_nationkey BETWEEN 10 AND 14"), "dev")
    head = cat.load("b.n").metadata.refs()["dev"]["snapshot-id"]
    cat.fast_forward("b.n", "dev")
    t = cat.load("b.n")
    assert t.metadata.raw["current-snapshot-id"] == head
    assert t.to_df(spark).count() == 15
    # snapshot-log gained BOTH branch commits, oldest first
    log_ids = [e["snapshot-id"] for e in t.metadata.raw["snapshot-log"]]
    assert log_ids[-1] == head
    snaps = {s.snapshot_id: s for s in t.metadata.snapshots}
    assert snaps[head].parent_id == log_ids[-2]
    # changelog sees the published chain as two ordinary appends
    log = t.changelog_df(spark)
    counts = (
        log.groupBy("_change_ordinal")
        .count()
        .orderBy("_change_ordinal")
        .collect()
    )
    assert [int(r["count"]) for r in counts] == [5, 5, 5]


def test_fast_forward_refuses_when_main_moved(spark, sf_dir, tmp_path):
    cat = Catalog(str(tmp_path / "wh"), name="bw")
    nation = load_table(spark, sf_dir, "nation")
    cat.create_table("b.n", nation.schema)
    cat.append("b.n", spark, nation.filter("n_nationkey < 5"))
    cat.stage_append("b.n", spark, nation.filter("n_nationkey BETWEEN 5 AND 9"), "dev")
    # main advances after staging: publishing would drop this commit
    cat.append("b.n", spark, nation.filter("n_nationkey = 20"))
    with pytest.raises(CommitConflict, match="descend"):
        cat.fast_forward("b.n", "dev")
    # main unaffected by the failed publish
    t = cat.load("b.n")
    assert t.to_df(spark).count() == 6


def test_branch_append_totals_track_branch_lineage(spark, sf_dir, tmp_path):
    """total-records in a staged snapshot's summary accumulates over the
    BRANCH lineage, not main's."""
    cat = Catalog(str(tmp_path / "wh"), name="bw")
    nation = load_table(spark, sf_dir, "nation")
    cat.create_table("b.n", nation.schema)
    cat.append("b.n", spark, nation.filter("n_nationkey < 5"))
    cat.stage_append("b.n", spark, nation.filter("n_nationkey BETWEEN 5 AND 9"), "dev")
    cat.stage_append("b.n", spark, nation.filter("n_nationkey BETWEEN 10 AND 14"), "dev")
    t = cat.load("b.n")
    head = t.metadata.refs()["dev"]["snapshot-id"]
    snap = next(s for s in t.metadata.snapshots if s.snapshot_id == head)
    assert int(snap.summary["total-records"]) == 15


def test_racing_branch_appends_serialize_without_loss(spark, sf_dir, tmp_path, monkeypatch):
    """Two writers staging on the same branch race on the metadata CAS:
    the loser retries on fresh state and the branch ends with BOTH
    commits chained (no lost update)."""
    from datafusion_iceberg_spark.iceberg import writer as writer_mod

    cat = Catalog(str(tmp_path / "wh"), name="br")
    nation = load_table(spark, sf_dir, "nation")
    cat.create_table("b.n", nation.schema)
    cat.append("b.n", spark, nation.filter("n_nationkey < 5"))
    root = str(tmp_path / "wh")

    orig = writer_mod.IcebergWriter._commit_append_snapshot
    state = {"fired": False}

    def racing(self, *a, **k):
        # the only patched-window call is the outer staged append
        if not state["fired"]:
            state["fired"] = True
            writer_mod.IcebergWriter._commit_append_snapshot = orig
            try:
                Catalog(root, name="br").stage_append(
                    "b.n",
                    spark,
                    load_table(spark, sf_dir, "nation").filter(
                        "n_nationkey BETWEEN 5 AND 9"
                    ),
                    "dev",
                )
            finally:
                writer_mod.IcebergWriter._commit_append_snapshot = racing
        return orig(self, *a, **k)

    monkeypatch.setattr(
        writer_mod.IcebergWriter, "_commit_append_snapshot", racing
    )
    cat.stage_append(
        "b.n", spark, nation.filter("n_nationkey BETWEEN 10 AND 14"), "dev"
    )
    monkeypatch.undo()
    t = Catalog(root, name="br").load("b.n")
    # both staged commits are on the branch; main untouched
    assert t.to_df(spark, ref="dev").count() == 15
    assert t.to_df(spark).count() == 5
    cat2 = Catalog(root, name="br")
    cat2.fast_forward("b.n", "dev")
    assert cat2.load("b.n").to_df(spark).count() == 15


def test_cherrypick_diverged_staged_append(spark, sf_dir, tmp_path):
    """cherrypick_snapshot applies a staged append after main ADVANCED
    (where fast_forward refuses): rows land, a post-staging delete still
    orders BEFORE the cherry-picked rows (fresh sequence), and the
    already-applied guard fires on a second pick."""
    import pytest as _pytest

    from datafusion_iceberg_spark.iceberg.catalog import Catalog
    from datafusion_iceberg_spark.iceberg.writer import CommitConflict
    from datafusion_iceberg_spark.tables import load_table

    cat = Catalog(str(tmp_path / "wh"), name="cp")
    nation = load_table(spark, sf_dir, "nation")
    cat.create_table("d.n", nation.schema)
    cat.append("d.n", spark, nation.filter("n_nationkey < 10"))
    staged = cat.stage_append(
        "d.n", spark, nation.filter("n_nationkey >= 20"), branch="audit"
    )
    # main advances: the branch no longer fast-forwards
    cat.append("d.n", spark, nation.filter("n_nationkey BETWEEN 10 AND 14"))
    with _pytest.raises(CommitConflict):
        cat.fast_forward("d.n", "audit")
    cat.cherrypick_snapshot("d.n", staged)
    t = cat.load("d.n")
    keys = sorted(r["n_nationkey"] for r in t.to_df(spark).collect())
    assert keys == list(range(15)) + list(range(20, 25))
    summary = t.metadata.snapshots[-1].summary
    assert summary["cherry-picked-snapshot-id"] == str(staged)
    with _pytest.raises(ValueError, match="ancestor"):
        cat.cherrypick_snapshot("d.n", staged)
    # overwrite snapshots are refused
    cat.overwrite("d.n", spark, nation.limit(3))
    ow = cat.load("d.n").metadata.current_snapshot_id
    cat.rollback_to_snapshot("d.n", t.metadata.current_snapshot_id)
    with _pytest.raises(ValueError, match="append snapshots only"):
        cat.cherrypick_snapshot("d.n", ow)


def test_cherrypick_not_diverged_publishes(spark, sf_dir, tmp_path):
    from datafusion_iceberg_spark.iceberg.catalog import Catalog
    from datafusion_iceberg_spark.tables import load_table

    cat = Catalog(str(tmp_path / "wh"), name="cp2")
    nation = load_table(spark, sf_dir, "nation")
    cat.create_table("d.n", nation.schema)
    cat.append("d.n", spark, nation.limit(5))
    staged = cat.stage_append("d.n", spark, nation.limit(2), branch="b")
    out = cat.sql(
        spark, f"CALL cp2.system.cherrypick_snapshot('d.n', {staged})"
    ).collect()
    assert {r["key"]: r["value"] for r in out}["result"] == str(staged)
    assert cat.load("d.n").metadata.current_snapshot_id == staged
    assert cat.load("d.n").to_df(spark).count() == 7


def test_wap_id_staging_and_publish_changes(spark, tmp_path):
    """Spark-Iceberg WAP parity (r9): with write.wap.enabled and a
    session spark.wap.id, INSERT stages the snapshot (summary wap.id,
    main unmoved, NO ref); CALL publish_changes(wap_id) cherry-picks it
    onto main — including after main advanced; double-publish and
    unknown/ambiguous ids refuse."""
    import os

    import pytest

    from datafusion_iceberg_spark.iceberg.catalog import Catalog

    cat = Catalog(os.path.join(str(tmp_path), "wh"), name="wap")
    df = spark.createDataFrame([(1, 10), (2, 20)], "k long, v long")
    cat.create_table("ns.t", df.schema)
    cat.append("ns.t", spark, df)
    cat.set_properties("ns.t", {"write.wap.enabled": "true"})
    spark.conf.set("spark.wap.id", "audit-1")
    try:
        out = cat.sql(
            spark, "INSERT INTO wap.ns.t VALUES (3, 30), (4, 40)"
        ).first()
        assert out.operation == "stage_wap"
        # main unmoved, no ref created, snapshot staged with the summary
        meta = cat.load("ns.t").metadata
        staged = [
            s
            for s in meta.raw["snapshots"]
            if (s.get("summary") or {}).get("wap.id") == "audit-1"
        ]
        assert len(staged) == 1
        assert meta.raw["current-snapshot-id"] != staged[0]["snapshot-id"]
        assert "refs" not in meta.raw or all(
            r.get("snapshot-id") != staged[0]["snapshot-id"]
            for r in meta.raw.get("refs", {}).values()
        )
        assert {
            r.k for r in cat.sql(spark, "SELECT k FROM wap.ns.t").collect()
        } == {1, 2}
    finally:
        spark.conf.unset("spark.wap.id")
    # main advances independently, then the audit publishes
    cat.append("ns.t", spark, spark.createDataFrame([(9, 90)], "k long, v long"))
    cat.sql(spark, "CALL wap.system.publish_changes('ns.t', 'audit-1')")
    assert {
        r.k for r in cat.sql(spark, "SELECT k FROM wap.ns.t").collect()
    } == {1, 2, 3, 4, 9}
    with pytest.raises(Exception):  # double publish refuses (ancestry guard)
        cat.publish_changes("ns.t", "audit-1")
    with pytest.raises(KeyError):
        cat.publish_changes("ns.t", "nope")
