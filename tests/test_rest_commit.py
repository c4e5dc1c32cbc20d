"""REST catalog write-through commits: the CommitTableRequest protocol
(rest_commit.py), OAuth2 + pagination on the client, and the full DML
surface routed through the service (RestCommitWriter).

The reference's REST crate never commits table updates through the
service (catalog_rest/src/catalog.rs:98-135 — create/register/drop
only); this suite covers the surface a real REST catalog (Polaris,
Gravitino, Glue REST) requires of every writer.
"""

from __future__ import annotations

import json
import os
import urllib.error
import urllib.request

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datafusion_iceberg_spark.iceberg.rest_catalog import (
    LocalRestServer,
    RestCatalog,
    RestCatalogClient,
)
from datafusion_iceberg_spark.iceberg.rest_commit import (
    RequirementFailed,
    apply_updates,
    canonical,
    check_requirements,
    metadata_updates,
)
from datafusion_iceberg_spark.iceberg.writer import CommitConflict
from datafusion_iceberg_spark.tables import load_table


@pytest.fixture()
def scratch(tmp_path):
    return str(tmp_path)


# ---------------------------------------------------------------------------
# protocol units (no Spark)
# ---------------------------------------------------------------------------

BASE = {
    "format-version": 2,
    "table-uuid": "u-1",
    "location": "/w/ns/t",
    "last-sequence-number": 0,
    "last-updated-ms": 1,
    "last-column-id": 2,
    "schema": {"type": "struct", "schema-id": 0, "fields": []},
    "current-schema-id": 0,
    "schemas": [{"type": "struct", "schema-id": 0, "fields": []}],
    "partition-spec": [],
    "default-spec-id": 0,
    "partition-specs": [{"spec-id": 0, "fields": []}],
    "last-partition-id": 999,
    "default-sort-order-id": 0,
    "sort-orders": [{"order-id": 0, "fields": []}],
    "properties": {},
    "current-snapshot-id": -1,
    "snapshots": [],
    "snapshot-log": [],
    "metadata-log": [],
}


def _snap(sid: int, seq: int, parent=None) -> dict:
    s = {
        "snapshot-id": sid,
        "timestamp-ms": 1000 + sid,
        "sequence-number": seq,
        "manifest-list": f"/w/ns/t/metadata/snap-{sid}.avro",
        "summary": {"operation": "append"},
    }
    if parent is not None:
        s["parent-snapshot-id"] = parent
    return s


def test_diff_apply_roundtrip_snapshot_commit():
    import copy

    new = copy.deepcopy(BASE)
    new["snapshots"] = [_snap(10, 1)]
    new["current-snapshot-id"] = 10
    new["last-sequence-number"] = 1
    new["snapshot-log"] = [{"timestamp-ms": 5, "snapshot-id": 10}]
    new["last-updated-ms"] = 5
    reqs, ups = metadata_updates(BASE, new)
    # conservative CAS on main even for a first snapshot
    assert {"type": "assert-table-uuid", "uuid": "u-1"} in reqs
    assert any(
        r["type"] == "assert-ref-snapshot-id" and "snapshot-id" not in r
        for r in reqs
    )
    actions = [u["action"] for u in ups]
    assert actions == ["add-snapshot", "set-snapshot-ref"]
    applied = apply_updates(BASE, ups, ts_ms=5)
    assert canonical(applied) == canonical(new)


def test_diff_apply_roundtrip_expire_and_properties():
    import copy

    base = copy.deepcopy(BASE)
    base["snapshots"] = [_snap(10, 1), _snap(11, 2, parent=10)]
    base["current-snapshot-id"] = 11
    base["last-sequence-number"] = 2
    base["snapshot-log"] = [
        {"timestamp-ms": 5, "snapshot-id": 10},
        {"timestamp-ms": 6, "snapshot-id": 11},
    ]
    base["properties"] = {"a": "1", "b": "2"}
    new = copy.deepcopy(base)
    new["snapshots"] = [s for s in new["snapshots"] if s["snapshot-id"] != 10]
    new["snapshot-log"] = [e for e in new["snapshot-log"] if e["snapshot-id"] != 10]
    new["properties"] = {"a": "9", "c": "3"}
    reqs, ups = metadata_updates(base, new)
    actions = sorted(u["action"] for u in ups)
    assert actions == [
        "remove-properties",
        "remove-snapshots",
        "set-properties",
    ]
    applied = apply_updates(base, ups, ts_ms=7)
    assert canonical(applied) == canonical(new)
    # expiration keeps the high-water sequence number (monotonic)
    assert applied["last-sequence-number"] == 2


def test_diff_emits_verbatim_log_for_branch_publish():
    """fast_forward appends a CHAIN of log entries in one commit — the
    derived one-entry-per-main-move rule cannot reproduce it, so the
    differ ships the log verbatim (documented deviation)."""
    import copy

    base = copy.deepcopy(BASE)
    base["snapshots"] = [_snap(10, 1)]
    base["current-snapshot-id"] = 10
    base["last-sequence-number"] = 1
    base["snapshot-log"] = [{"timestamp-ms": 5, "snapshot-id": 10}]
    base["refs"] = {"audit": {"snapshot-id": 12, "type": "branch"}}
    base["snapshots"] += [_snap(11, 2, parent=10), _snap(12, 3, parent=11)]
    base["last-sequence-number"] = 3  # staged commits advanced it
    new = copy.deepcopy(base)
    new["current-snapshot-id"] = 12
    new["snapshot-log"] = base["snapshot-log"] + [
        {"timestamp-ms": 8, "snapshot-id": 11},
        {"timestamp-ms": 8, "snapshot-id": 12},
    ]
    del new["refs"]["audit"]
    reqs, ups = metadata_updates(base, new)
    assert any(u["action"] == "set-snapshot-log" for u in ups)
    applied = apply_updates(base, ups, ts_ms=8)
    assert canonical(applied) == canonical(new)


def test_requirements_reject_stale_state():
    import copy

    meta = copy.deepcopy(BASE)
    meta["snapshots"] = [_snap(10, 1)]
    meta["current-snapshot-id"] = 10
    with pytest.raises(RequirementFailed, match="uuid"):
        check_requirements(
            meta, [{"type": "assert-table-uuid", "uuid": "other"}]
        )
    with pytest.raises(RequirementFailed, match="ref 'main'"):
        check_requirements(
            meta,
            [{"type": "assert-ref-snapshot-id", "ref": "main"}],  # expects none
        )
    check_requirements(
        meta,
        [{"type": "assert-ref-snapshot-id", "ref": "main", "snapshot-id": 10}],
    )
    with pytest.raises(RequirementFailed, match="already exists"):
        check_requirements(meta, [{"type": "assert-create"}])
    check_requirements(None, [{"type": "assert-create"}])
    with pytest.raises(RequirementFailed, match="schema moved"):
        check_requirements(
            meta, [{"type": "assert-current-schema-id", "current-schema-id": 9}]
        )


def test_apply_rejects_unknown_and_duplicate():
    with pytest.raises(RequirementFailed, match="unknown update action"):
        apply_updates(BASE, [{"action": "frobnicate"}], ts_ms=1)
    import copy

    base = copy.deepcopy(BASE)
    base["snapshots"] = [_snap(10, 1)]
    with pytest.raises(RequirementFailed, match="already exists"):
        apply_updates(
            base, [{"action": "add-snapshot", "snapshot": _snap(10, 1)}], 1
        )
    with pytest.raises(RequirementFailed, match="no snapshot"):
        apply_updates(
            BASE,
            [
                {
                    "action": "set-snapshot-ref",
                    "ref-name": "main",
                    "snapshot-id": 99,
                    "type": "branch",
                }
            ],
            1,
        )


# ---------------------------------------------------------------------------
# end-to-end through the in-process service
# ---------------------------------------------------------------------------


def _rows(spark, n=10):
    return spark.range(n).select(
        F.col("id").cast("long").alias("k"),
        (F.col("id") * 10).cast("long").alias("v"),
    )


def test_create_append_scan_through_service(spark, scratch):
    with LocalRestServer(os.path.join(scratch, "wh")) as base:
        client = RestCatalogClient(base)
        rest = RestCatalog(client, name="rc")
        rest.create_table("ns.t", _rows(spark).schema)
        rest.append("ns.t", spark, _rows(spark, 10))
        rest.append("ns.t", spark, _rows(spark, 5))
        got = rest.sql(spark, "SELECT COUNT(*) AS n, SUM(v) AS s FROM rc.ns.t").first()
        assert (got["n"], got["s"]) == (15, 10 * sum(range(10)) + 10 * sum(range(5)))
        served = client.load_table("ns", "t")["metadata"]
        assert len(served["snapshots"]) == 2
        # the SERVICE stamped the metadata log (client never writes it)
        assert len(served["metadata-log"]) == 2
        # snapshot-log derived server-side: one entry per main move
        assert [e["snapshot-id"] for e in served["snapshot-log"]] == [
            s["snapshot-id"] for s in served["snapshots"]
        ]


def test_stale_commit_is_409_and_retry_wins(spark, scratch):
    with LocalRestServer(os.path.join(scratch, "wh")) as base:
        client = RestCatalogClient(base)
        rest = RestCatalog(client, name="rc")
        rest.create_table("ns.t", _rows(spark).schema)
        rest.append("ns.t", spark, _rows(spark, 10))
        served = client.load_table("ns", "t")["metadata"]
        cur = served["current-snapshot-id"]
        # a hand-rolled stale commit: requirements pin main to "no snapshot"
        with pytest.raises(CommitConflict, match="rejected"):
            client.commit_table(
                "ns",
                "t",
                [{"type": "assert-ref-snapshot-id", "ref": "main"}],
                [],
            )
        # the writer's own optimistic retry handles mid-flight races:
        # stale MIRROR state is irrelevant because the writer GETs fresh
        # metadata inside the commit section
        rest2 = RestCatalog(RestCatalogClient(base), name="rc2")
        rest.append("ns.t", spark, _rows(spark, 3))  # rest2's mirror is now stale
        rest2.append("ns.t", spark, _rows(spark, 2))
        served = client.load_table("ns", "t")["metadata"]
        assert len(served["snapshots"]) == 3
        assert served["current-snapshot-id"] != cur


def test_dv_delete_and_merge_through_service(spark, scratch):
    with LocalRestServer(os.path.join(scratch, "wh")) as base:
        client = RestCatalogClient(base)
        rest = RestCatalog(client, name="rc")
        rest.create_table(
            "ns.t",
            _rows(spark).schema,
            properties={"write.delete.mode": "deletion-vectors"},
        )
        rest.append("ns.t", spark, _rows(spark, 20))
        rest.delete_where_dv("ns.t", spark, "k >= 15")
        n = rest.sql(spark, "SELECT COUNT(*) AS n FROM rc.ns.t").first()["n"]
        assert n == 15
        served = client.load_table("ns", "t")["metadata"]
        assert served["format-version"] == 3  # upgraded through the service
        # MERGE through the service (update k<2, insert 100/101)
        src = spark.createDataFrame(
            [(0, 1000), (1, 1001), (100, 42), (101, 43)], "k long, v long"
        )
        rest.merge_into("ns.t", spark, src, "k", when_matched_set={"v": "src.v"})
        got = dict(
            (r["k"], r["v"])
            for r in rest.sql(
                spark, "SELECT k, v FROM rc.ns.t WHERE k IN (0, 1, 100, 101)"
            ).collect()
        )
        assert got == {0: 1000, 1: 1001, 100: 42, 101: 43}


def test_ddl_and_maintenance_through_service(spark, scratch):
    with LocalRestServer(os.path.join(scratch, "wh")) as base:
        client = RestCatalogClient(base)
        rest = RestCatalog(client, name="rc")
        rest.create_table("ns.t", _rows(spark).schema)
        rest.append("ns.t", spark, _rows(spark, 5))
        rest.add_column("ns.t", "tag", T.StringType())
        served = client.load_table("ns", "t")["metadata"]
        assert len(served["schemas"]) == 2
        names = [
            f["name"]
            for s in served["schemas"]
            if s["schema-id"] == served["current-schema-id"]
            for f in s["fields"]
        ]
        assert names == ["k", "v", "tag"]
        rest.set_properties("ns.t", {"owner": "r8"})
        assert (
            client.load_table("ns", "t")["metadata"]["properties"]["owner"]
            == "r8"
        )
        rest.append("ns.t", spark, _rows(spark, 5).withColumn("tag", F.lit("x")))
        rest.expire_snapshots("ns.t", keep_last=1)
        served = client.load_table("ns", "t")["metadata"]
        assert len(served["snapshots"]) == 1
        n = rest.sql(spark, "SELECT COUNT(*) AS n FROM rc.ns.t").first()["n"]
        assert n == 10


def test_row_lineage_next_row_id_through_service(spark, scratch):
    """v3 lineage: the client-assigned counter rides the documented
    set-next-row-id update and the service persists it monotonic."""
    with LocalRestServer(os.path.join(scratch, "wh")) as base:
        client = RestCatalogClient(base)
        rest = RestCatalog(client, name="rc")
        rest.create_table(
            "ns.t",
            _rows(spark).schema,
            properties={"write.row-lineage.enabled": "true"},
        )
        rest.append("ns.t", spark, _rows(spark, 7))
        rest.append("ns.t", spark, _rows(spark, 3))
        served = client.load_table("ns", "t")["metadata"]
        assert served.get("next-row-id") == 10
        assert served["format-version"] == 3


def test_oauth_token_flow_and_401(spark, scratch):
    wh = os.path.join(scratch, "wh")
    with LocalRestServer(wh, credential="svc:hunter2") as base:
        # no token → 401
        with pytest.raises(urllib.error.HTTPError) as ei:
            RestCatalogClient(base).list_namespaces()
        assert ei.value.code == 401
        # wrong secret → 401 from the tokens endpoint
        with pytest.raises(urllib.error.HTTPError) as ei:
            RestCatalogClient(base, credential="svc:wrong")
        assert ei.value.code == 401
        # client-credentials exchange → full read/write surface
        client = RestCatalogClient(base, credential="svc:hunter2")
        rest = RestCatalog(client, name="rc")
        rest.create_table("ns.t", _rows(spark).schema)
        rest.append("ns.t", spark, _rows(spark, 4))
        assert rest.sql(spark, "SELECT COUNT(*) AS n FROM rc.ns.t").first()["n"] == 4


def test_pagination_walks_all_pages(spark, scratch):
    wh = os.path.join(scratch, "wh")
    with LocalRestServer(wh, page_size=2) as base:
        client = RestCatalogClient(base)
        rest = RestCatalog(client, name="rc")
        for i in range(5):
            rest.create_table(f"ns.t{i}", _rows(spark).schema)
        # raw single page honors the server page size
        req = urllib.request.Request(f"{base}/v1/namespaces/ns/tables")
        with urllib.request.urlopen(req) as resp:
            page = json.loads(resp.read())
        assert len(page["identifiers"]) == 2 and "next-page-token" in page
        # the client walks next-page-token to exhaustion
        assert sorted(client.list_tables("ns")) == [f"t{i}" for i in range(5)]
        rest.refresh()
        assert rest.table_names("ns") == [f"ns.t{i}" for i in range(5)]


# ---------------------------------------------------------------------------
# multi-table transactions (POST /v1/transactions/commit)
# ---------------------------------------------------------------------------


def test_transaction_multi_table_atomic(spark, scratch):
    with LocalRestServer(os.path.join(scratch, "wh")) as base:
        client = RestCatalogClient(base)
        rest = RestCatalog(client, name="rc")
        rest.create_table("ns.a", _rows(spark).schema)
        rest.create_table("ns.b", _rows(spark).schema)
        rest.append("ns.a", spark, _rows(spark, 10))
        txn = rest.transaction()
        txn.append("ns.a", spark, _rows(spark, 5))
        txn.delete_where("ns.a", spark, "k < 2")
        txn.append("ns.b", spark, _rows(spark, 7))
        # nothing is visible before commit — the service still serves
        # the pre-transaction versions
        assert len(client.load_table("ns", "a")["metadata"]["snapshots"]) == 1
        assert client.load_table("ns", "b")["metadata"]["snapshots"] == []
        txn.commit()
        a = rest.sql(spark, "SELECT COUNT(*) AS n FROM rc.ns.a").first()["n"]
        b = rest.sql(spark, "SELECT COUNT(*) AS n FROM rc.ns.b").first()["n"]
        assert (a, b) == (15 - 4, 7)  # k∈{0,1} deleted from both appends
        # A carries append+append+delete = 3 snapshots, atomically
        assert len(client.load_table("ns", "a")["metadata"]["snapshots"]) == 3


def test_transaction_same_table_chained_ddl_and_write(spark, scratch):
    with LocalRestServer(os.path.join(scratch, "wh")) as base:
        client = RestCatalogClient(base)
        rest = RestCatalog(client, name="rc")
        rest.create_table("ns.t", _rows(spark).schema)
        with rest.transaction() as txn:
            txn.append("ns.t", spark, _rows(spark, 4))
            txn.add_column("ns.t", "tag", T.StringType())
            txn.append(
                "ns.t", spark, _rows(spark, 2).withColumn("tag", F.lit("x"))
            )
        rows = rest.sql(
            spark,
            "SELECT COUNT(*) AS n, COUNT(tag) AS tagged FROM rc.ns.t",
        ).first()
        assert (rows["n"], rows["tagged"]) == (6, 2)
        served = client.load_table("ns", "t")["metadata"]
        assert len(served["schemas"]) == 2 and len(served["snapshots"]) == 2


def test_transaction_conflict_publishes_nothing(spark, scratch):
    with LocalRestServer(os.path.join(scratch, "wh")) as base:
        client = RestCatalogClient(base)
        rest = RestCatalog(client, name="rc")
        rest.create_table("ns.a", _rows(spark).schema)
        rest.create_table("ns.b", _rows(spark).schema)
        txn = rest.transaction()
        txn.append("ns.a", spark, _rows(spark, 5))
        txn.append("ns.b", spark, _rows(spark, 5))
        # a commit lands on A AFTER the transaction staged against it
        rest.append("ns.a", spark, _rows(spark, 1))
        with pytest.raises(CommitConflict, match="rejected"):
            txn.commit()
        # B published NOTHING even though its own requirements held
        assert client.load_table("ns", "b")["metadata"]["snapshots"] == []


def test_transaction_discarded_on_exception(spark, scratch):
    with LocalRestServer(os.path.join(scratch, "wh")) as base:
        client = RestCatalogClient(base)
        rest = RestCatalog(client, name="rc")
        rest.create_table("ns.t", _rows(spark).schema)
        with pytest.raises(RuntimeError, match="boom"):
            with rest.transaction() as txn:
                txn.append("ns.t", spark, _rows(spark, 5))
                raise RuntimeError("boom")
        assert client.load_table("ns", "t")["metadata"]["snapshots"] == []


def test_diff_apply_roundtrip_expire_with_pinned_ref_reorder():
    """expire_snapshots moves ref-pinned survivors AHEAD of the
    keep_last tail in the snapshots list; the applier keeps base order.
    Both are the same table — canonical() compares id-keyed sets."""
    import copy

    base = copy.deepcopy(BASE)
    base["snapshots"] = [_snap(10, 1), _snap(11, 2, 10), _snap(12, 3, 11)]
    base["current-snapshot-id"] = 12
    base["last-sequence-number"] = 3
    base["snapshot-log"] = [
        {"timestamp-ms": t, "snapshot-id": s} for t, s in ((5, 10), (6, 11), (7, 12))
    ]
    base["refs"] = {"v1": {"snapshot-id": 10, "type": "tag"}}
    new = copy.deepcopy(base)
    # keep_last=1 with the tag pinning snapshot 10: 11 expires, and the
    # survivor list comes back [pinned, newest] — REORDERED vs base
    new["snapshots"] = [_snap(10, 1), _snap(12, 3, 11)]
    new["snapshot-log"] = [
        e for e in new["snapshot-log"] if e["snapshot-id"] != 11
    ]
    reqs, ups = metadata_updates(base, new)
    assert [u["action"] for u in ups] == ["remove-snapshots"]
    assert ups[0]["snapshot-ids"] == [11]
    applied = apply_updates(base, ups, ts_ms=9)
    assert canonical(applied) == canonical(new)


def test_wap_compact_rollback_through_service(spark, scratch):
    """The wider maintenance surface rides the same two lifecycle
    overrides: WAP staging + fast-forward (multi-entry snapshot-log →
    the verbatim-log update), MOR update, compaction, rollback."""
    with LocalRestServer(os.path.join(scratch, "wh")) as base:
        client = RestCatalogClient(base)
        rest = RestCatalog(client, name="rc")
        rest.create_table("ns.t", _rows(spark).schema)
        rest.append("ns.t", spark, _rows(spark, 10))
        # write-audit-publish entirely through the service
        rest.stage_append("ns.t", spark, _rows(spark, 5), branch="audit")
        served = client.load_table("ns", "t")["metadata"]
        assert "audit" in served.get("refs", {})
        n_main = rest.sql(spark, "SELECT COUNT(*) AS n FROM rc.ns.t").first()["n"]
        assert n_main == 10  # main has not moved
        rest.fast_forward("ns.t", "audit")
        assert (
            rest.sql(spark, "SELECT COUNT(*) AS n FROM rc.ns.t").first()["n"]
            == 15
        )
        # MOR update, then compaction folds the delta into data files
        rest.set_properties("ns.t", {"write.update.mode": "merge-on-read"})
        rest.update_where_mor("ns.t", spark, "k = 1", {"v": "v + 1000"})
        assert (
            rest.sql(
                spark, "SELECT SUM(v) AS s FROM rc.ns.t WHERE k = 1"
            ).first()["s"]
            == 2 * 10 + 2000  # two k=1 rows (both appends), both updated
        )
        pre_compact = client.load_table("ns", "t")["metadata"]
        rest.compact("ns.t", spark)
        assert (
            rest.sql(
                spark, "SELECT SUM(v) AS s FROM rc.ns.t WHERE k = 1"
            ).first()["s"]
            == 2 * 10 + 2000
        )
        # rollback to the pre-compaction snapshot — same bytes
        rest.rollback_to_snapshot(
            "ns.t", pre_compact["current-snapshot-id"]
        )
        assert (
            rest.sql(spark, "SELECT COUNT(*) AS n FROM rc.ns.t").first()["n"]
            == 15
        )


def test_transaction_upsert_stages_atomically(spark, scratch):
    """UPSERT inside a multi-table transaction: the equality-delete +
    append snapshot stages like any other op, and a second staged op on
    the same table chains on top of it."""
    with LocalRestServer(os.path.join(scratch, "wh")) as base:
        client = RestCatalogClient(base)
        rest = RestCatalog(client, name="rc")
        rest.create_table("ns.t", _rows(spark).schema)
        rest.append("ns.t", spark, _rows(spark, 5))
        rest.set_identifier_fields("ns.t", ["k"])
        with rest.transaction() as txn:
            txn.upsert(
                "ns.t",
                spark,
                spark.createDataFrame([(2, 222), (9, 90)], "k long, v long"),
            )
            txn.append(
                "ns.t", spark, spark.createDataFrame([(50, 500)], "k long, v long")
            )
        got = {
            r["k"]: r["v"]
            for r in rest.sql(spark, "SELECT k, v FROM rc.ns.t").collect()
        }
        assert got == {0: 0, 1: 10, 2: 222, 3: 30, 4: 40, 9: 90, 50: 500}
        served = client.load_table("ns", "t")["metadata"]
        assert len(served["snapshots"]) == 3  # append + upsert + append


# ---------------------------------------------------------------------------
# Transaction fuzzer: random multi-table programs of transactions
# (commit or abort) differentially vs DuckDB applying ops only on commit.
# ---------------------------------------------------------------------------


def _txn_state(spark, rest, ident):
    return sorted(
        tuple(r)
        for r in rest.load(ident).to_df(spark).select("k", "grp", "val").collect()
    )


def _duck_state(con, t):
    return sorted(tuple(r) for r in con.execute(f"SELECT k, grp, val FROM {t}").fetchall())


@pytest.mark.parametrize("seed", [5, 42])
def test_random_txn_program_matches_duckdb(spark, scratch, seed):
    import random

    import duckdb

    rng = random.Random(seed)
    groups = ("a", "b", "c")
    with LocalRestServer(os.path.join(scratch, "wh")) as base:
        rest = RestCatalog(RestCatalogClient(base), name="rc")
        con = duckdb.connect()
        schema_df = spark.createDataFrame([], "k long, grp string, val long")
        for t in ("t1", "t2"):
            rest.create_table(f"ns.{t}", schema_df.schema)
            con.execute(f"CREATE TABLE {t} (k BIGINT, grp VARCHAR, val BIGINT)")
        next_k = 0
        for step in range(6):
            ops = []  # (table, kind, payload) applied to duck ONLY on commit
            n_ops = rng.randint(1, 4)
            for _ in range(n_ops):
                t = rng.choice(("t1", "t2"))
                kind = rng.choice(("append", "append", "delete", "update"))
                if kind == "append":
                    rows = [
                        (next_k + i, rng.choice(groups), rng.randint(-50, 50))
                        for i in range(rng.randint(1, 3))
                    ]
                    next_k += 3
                    ops.append((t, "append", rows))
                elif kind == "delete":
                    ops.append((t, "delete", f"k % {rng.randint(2, 4)} = 0"))
                else:
                    ops.append(
                        (t, "update", (f"val < {rng.randint(-10, 10)}",
                                        {"val": "val + 100"}))
                    )
            abort = rng.random() < 0.3
            before = {
                t: _txn_state(spark, rest, f"ns.{t}") for t in ("t1", "t2")
            }
            try:
                with rest.transaction() as txn:
                    for t, kind, payload in ops:
                        ident = f"ns.{t}"
                        if kind == "append":
                            txn.append(
                                ident,
                                spark,
                                spark.createDataFrame(
                                    payload, "k long, grp string, val long"
                                ),
                            )
                        elif kind == "delete":
                            txn.delete_where(ident, spark, payload)
                        else:
                            txn.update_where(ident, spark, payload[0], payload[1])
                        # isolation: the catalog's PUBLISHED view must not
                        # move while the txn is staging
                        assert _txn_state(spark, rest, ident) == before[t]
                    if abort:
                        raise RuntimeError("fuzz abort")
            except RuntimeError as e:
                assert "fuzz abort" in str(e)
            if not abort:
                for t, kind, payload in ops:
                    if kind == "append":
                        con.executemany(
                            f"INSERT INTO {t} VALUES (?, ?, ?)", payload
                        )
                    elif kind == "delete":
                        con.execute(f"DELETE FROM {t} WHERE {payload}")
                    else:
                        con.execute(
                            f"UPDATE {t} SET val = val + 100 WHERE {payload[0]}"
                        )
            for t in ("t1", "t2"):
                got = _txn_state(spark, rest, f"ns.{t}")
                want = _duck_state(con, t)
                assert got == want, (
                    f"seed {seed} step {step} abort={abort} table {t}:\n"
                    f"rest={got}\nduck={want}"
                )
        con.close()


def test_rest_wap_publish_changes(spark, tmp_path):
    """WAP by wap.id rides the REST commit protocol: the staged-only
    snapshot and the publish both go through CommitTableRequest on the
    service; a fresh client sees main move only after publish."""
    import os

    from datafusion_iceberg_spark.iceberg.rest_catalog import (
        LocalRestServer,
        RestCatalog,
        RestCatalogClient,
    )

    root = os.path.join(str(tmp_path), "wh")
    os.makedirs(root, exist_ok=True)
    server = LocalRestServer(root)
    try:
        base = server.start()
        rest = RestCatalog(RestCatalogClient(base), name="rw")
        df = spark.createDataFrame([(1, 10)], "k long, v long")
        rest.create_table("ns.t", df.schema)
        rest.append("ns.t", spark, df)
        # stage through the service
        rest._commit_op(
            "ns.t",
            lambda: rest.writer("ns.t").append(
                spark,
                spark.createDataFrame([(2, 20)], "k long, v long"),
                wap_id="audit-9",
            ),
        )
        fresh = RestCatalog(RestCatalogClient(base), name="rw2")
        assert {r.k for r in fresh.load("ns.t").to_df(spark).collect()} == {1}
        rest.publish_changes("ns.t", "audit-9")
        fresh2 = RestCatalog(RestCatalogClient(base), name="rw3")
        assert {r.k for r in fresh2.load("ns.t").to_df(spark).collect()} == {1, 2}
    finally:
        server.stop()


def test_wap_insert_and_publish_through_service(spark, scratch):
    """INSERT INTO a WAP-enabled REST table stages the snapshot through
    the service (add-snapshot without set-snapshot-ref — main unmoved)
    and CALL publish_changes lands it; previously this path crashed with
    TypeError because RestCatalog.append had no wap_id (r9 ADVICE)."""
    with LocalRestServer(os.path.join(scratch, "wh")) as base:
        client = RestCatalogClient(base)
        rest = RestCatalog(client, name="rcw")
        rest.create_table(
            "ns.t",
            _rows(spark).schema,
            properties={"write.wap.enabled": "true"},
        )
        rest.append("ns.t", spark, _rows(spark, 4))
        spark.conf.set("spark.wap.id", "audit-1")
        try:
            out = rest.sql(
                spark, "INSERT INTO rcw.ns.t VALUES (99, 990)"
            ).first()
            assert out.operation == "stage_wap"
            # main unmoved: readers see only the first append
            assert rest.sql(spark, "SELECT COUNT(*) AS n FROM rcw.ns.t").first().n == 4
            served = client.load_table("ns", "t")["metadata"]
            assert len(served["snapshots"]) == 2  # staged snapshot IS in metadata
            staged = [
                s for s in served["snapshots"]
                if (s.get("summary") or {}).get("wap.id") == "audit-1"
            ]
            assert len(staged) == 1
            assert served["current-snapshot-id"] != staged[0]["snapshot-id"]
            # publish via CALL, committed through the service
            rest.sql(spark, "CALL rcw.system.publish_changes('ns.t', 'audit-1')")
            assert rest.sql(spark, "SELECT COUNT(*) AS n FROM rcw.ns.t").first().n == 5
            # a FRESH mirror (new client walk) sees the published rows
            rest2 = RestCatalog(RestCatalogClient(base), name="rcw2")
            assert rest2.sql(spark, "SELECT COUNT(*) AS n FROM rcw2.ns.t").first().n == 5
        finally:
            spark.conf.unset("spark.wap.id")
