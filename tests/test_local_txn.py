"""Local multi-table transactions (r9): the filesystem mirror of the
REST catalog's /v1/transactions/commit — data files write eagerly,
metadata commits stage, commit validates EVERY table's version before
landing anything (conflict anywhere → CommitConflict, nothing lands)."""

from __future__ import annotations

import os

import pytest

from datafusion_iceberg_spark.iceberg.catalog import Catalog
from datafusion_iceberg_spark.iceberg.writer import CommitConflict


@pytest.fixture()
def scratch(tmp_path):
    return str(tmp_path)


def _rows(spark, pairs):
    return spark.createDataFrame(pairs, "k long, v long")


def _state(cat, spark, ident):
    return {
        r.k: r.v
        for r in cat.load(ident).to_df(spark).collect()
    }


def test_two_table_move_commits_atomically(spark, scratch):
    cat = Catalog(os.path.join(scratch, "wh"))
    df = _rows(spark, [(1, 10), (2, 20), (3, 30)])
    cat.create_table("t.hot", df.schema)
    cat.create_table("t.archive", df.schema)
    cat.append("t.hot", spark, df)
    with cat.transaction() as txn:
        txn.append("t.archive", spark, _rows(spark, [(2, 20)]))
        txn.delete_where("t.hot", spark, "k = 2")
        # pre-commit: NOTHING is visible outside the transaction
        assert _state(cat, spark, "t.hot") == {1: 10, 2: 20, 3: 30}
        assert _state(cat, spark, "t.archive") == {}
    assert _state(cat, spark, "t.hot") == {1: 10, 3: 30}
    assert _state(cat, spark, "t.archive") == {2: 20}


def test_chained_reads_see_staged_state(spark, scratch):
    """A 2nd op on the same table inside the txn sees the 1st's staged
    commit — including mid-txn DDL."""
    cat = Catalog(os.path.join(scratch, "wh"))
    df = _rows(spark, [(1, 10)])
    cat.create_table("t.a", df.schema)
    cat.append("t.a", spark, df)
    with cat.transaction() as txn:
        txn.add_column("t.a", "tag", __import__("pyspark").sql.types.StringType())
        txn.append(
            "t.a",
            spark,
            spark.createDataFrame([(2, 20, "x")], "k long, v long, tag string"),
        )
    got = {
        (r.k, r.v, r.tag)
        for r in cat.load("t.a").to_df(spark).collect()
    }
    assert got == {(1, 10, None), (2, 20, "x")}
    # ONE metadata landing folded both mutations: schema v2 + snapshot
    meta = cat.load("t.a").metadata
    assert "tag" in meta.field_ids_by_name()


def test_conflict_anywhere_publishes_nothing(spark, scratch):
    cat = Catalog(os.path.join(scratch, "wh"))
    df = _rows(spark, [(1, 10)])
    cat.create_table("t.a", df.schema)
    cat.create_table("t.b", df.schema)
    cat.append("t.a", spark, df)
    cat.append("t.b", spark, df)
    txn = cat.transaction()
    txn.append("t.a", spark, _rows(spark, [(5, 50)]))
    txn.append("t.b", spark, _rows(spark, [(6, 60)]))
    # an external writer advances t.b between stage and commit
    cat.append("t.b", spark, _rows(spark, [(7, 70)]))
    with pytest.raises(CommitConflict, match="t.b advanced"):
        txn.commit()
    # NOTHING landed — not even the non-conflicting t.a commit
    assert _state(cat, spark, "t.a") == {1: 10}
    assert _state(cat, spark, "t.b") == {1: 10, 7: 70}


def test_abort_on_exception(spark, scratch):
    cat = Catalog(os.path.join(scratch, "wh"))
    df = _rows(spark, [(1, 10)])
    cat.create_table("t.a", df.schema)
    cat.append("t.a", spark, df)
    with pytest.raises(RuntimeError, match="boom"):
        with cat.transaction() as txn:
            txn.append("t.a", spark, _rows(spark, [(9, 90)]))
            raise RuntimeError("boom")
    assert _state(cat, spark, "t.a") == {1: 10}


def _mark_dead_owner(txn_path):
    """Recovery skips manifests whose owner pid is alive; a simulated
    crash must therefore rewrite the pid to one that is DEAD (a reaped
    child's)."""
    import json
    import subprocess

    proc = subprocess.Popen(["true"])
    proc.wait()
    with open(txn_path) as fh:
        m = json.load(fh)
    m["pid"] = proc.pid
    with open(txn_path, "w") as fh:
        json.dump(m, fh)


def test_crash_between_commits_rolls_forward_on_reload(spark, scratch):
    """VERDICT r9 #7: an intent manifest written before the commit loop
    makes a crash between table commits recoverable — the next
    Catalog() load rolls the missing tables FORWARD to the staged
    metadata, restoring all-or-nothing."""
    wh = os.path.join(scratch, "wh")
    cat = Catalog(wh)
    cat.create_table("ns.a", _rows(spark, [(1, 10)]).schema)
    cat.create_table("ns.b", _rows(spark, [(1, 10)]).schema)
    cat.append("ns.a", spark, _rows(spark, [(1, 10)]))
    cat.append("ns.b", spark, _rows(spark, [(2, 20)]))

    txn = cat.transaction()
    txn.append("ns.a", spark, _rows(spark, [(3, 30)]))
    txn.append("ns.b", spark, _rows(spark, [(4, 40)]))
    # simulate a crash AFTER table a commits but BEFORE table b:
    # run phase 1 + intent write + first commit by hand
    plain = {}
    for ident in sorted(txn._pending):
        w = cat.writer(ident)
        base = txn._base_version.get(ident)
        w._loaded_version = base if base is not None else w._current_version()
        plain[ident] = w
    txn_path = cat._write_txn_intent(
        {
            ident: {
                "target_version": plain[ident]._loaded_version + 1,
                "metadata": txn._pending[ident],
            }
            for ident in sorted(txn._pending)
        }
    )
    plain["ns.a"]._commit_metadata(txn._pending["ns.a"])  # crash here
    assert os.path.exists(txn_path)
    _mark_dead_owner(txn_path)  # the "crashed" process is gone

    # a fresh catalog load recovers: BOTH tables show the transaction
    cat2 = Catalog(wh)
    assert _state(cat2, spark, "ns.a") == {1: 10, 3: 30}
    assert _state(cat2, spark, "ns.b") == {2: 20, 4: 40}
    assert not os.path.exists(txn_path)  # intent consumed
    # idempotent: loading again changes nothing
    cat3 = Catalog(wh)
    assert _state(cat3, spark, "ns.b") == {2: 20, 4: 40}
    # .txn never leaks into the namespace listing
    assert ".txn" not in cat3.namespaces()


def test_completed_txn_leaves_no_intent(spark, scratch):
    wh = os.path.join(scratch, "wh")
    cat = Catalog(wh)
    cat.create_table("ns.a", _rows(spark, [(1, 10)]).schema)
    cat.append("ns.a", spark, _rows(spark, [(1, 10)]))
    with cat.transaction() as txn:
        txn.append("ns.a", spark, _rows(spark, [(5, 50)]))
    import glob

    assert not glob.glob(os.path.join(wh, ".txn", "txn-*.json"))
    assert _state(cat, spark, "ns.a") == {1: 10, 5: 50}


def test_foreign_commit_blocks_roll_forward(spark, scratch):
    """A foreign writer taking the target version post-crash cannot be
    silently clobbered: recovery raises, names the manifest, and keeps
    it for a human decision."""
    import json

    wh = os.path.join(scratch, "wh")
    cat = Catalog(wh)
    cat.create_table("ns.a", _rows(spark, [(1, 10)]).schema)
    cat.append("ns.a", spark, _rows(spark, [(1, 10)]))
    staged = json.loads(
        json.dumps(cat.load("ns.a").metadata.raw)
    )  # any full metadata dict works as a stand-in
    staged["last-updated-ms"] = 1  # differs from whatever lands
    v = cat.writer("ns.a")._current_version()
    p = cat._write_txn_intent(
        {"ns.a": {"target_version": v + 1, "metadata": staged}}
    )
    # foreign commit takes v+1 first
    cat.append("ns.a", spark, _rows(spark, [(9, 90)]))
    # while the owner process is ALIVE the manifest is skipped (it may
    # be an in-flight transaction) — reads keep working
    assert Catalog(wh).load("ns.a") is not None
    _mark_dead_owner(p)
    with pytest.raises(RuntimeError, match="foreign commit"):
        Catalog(wh)


def test_live_conflict_cleans_up_intent(spark, scratch):
    """A CommitConflict in the live commit loop with NOTHING landed
    removes the intent manifest — the warehouse stays loadable and the
    conflict surfaces as a clean abort (r10 review find)."""
    import glob

    wh = os.path.join(scratch, "wh")
    cat = Catalog(wh)
    cat.create_table("ns.a", _rows(spark, [(1, 10)]).schema)
    cat.append("ns.a", spark, _rows(spark, [(1, 10)]))
    txn = cat.transaction()
    txn.append("ns.a", spark, _rows(spark, [(2, 20)]))
    # concurrent writer advances the table between validation and commit:
    # monkey-steal the version by committing through a second catalog
    Catalog(wh).append("ns.a", spark, _rows(spark, [(9, 90)]))
    with pytest.raises(CommitConflict):
        txn.commit()
    assert not glob.glob(os.path.join(wh, ".txn", "txn-*.json"))
    # warehouse loads fine; the foreign append survived, the txn didn't
    assert _state(Catalog(wh), spark, "ns.a") == {1: 10, 9: 90}
