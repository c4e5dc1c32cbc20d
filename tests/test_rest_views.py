"""View DDL through the REST service (VERDICT r8 "What's missing" #5):
CREATE VIEW on a REST catalog commits view metadata through
POST /v1/namespaces/{ns}/views (CreateViewRequest), reads resolve via
GET .../views/{v}, DROP VIEW via DELETE.  Reference parity: the
reference's mirror carries Relation::View through the same walk
(mirror.rs:34,67-78 via table.rs:102-112) but is read-only."""

from __future__ import annotations

import os

import pytest

from datafusion_iceberg_spark.iceberg.rest_catalog import (
    LocalRestServer,
    RestCatalog,
    RestCatalogClient,
)


@pytest.fixture()
def server(tmp_path):
    root = os.path.join(str(tmp_path), "wh")
    os.makedirs(root, exist_ok=True)
    srv = LocalRestServer(root)
    base = srv.start()
    yield base
    srv.stop()


def _seed(spark, rest):
    df = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30), (4, 40)], "k long, v long"
    )
    rest.create_table("ns.t", df.schema)
    rest.append("ns.t", spark, df)


def test_create_view_commits_through_service(spark, server):
    rest = RestCatalog(RestCatalogClient(server), name="r")
    _seed(spark, rest)
    rest.sql(
        spark,
        "CREATE VIEW r.ns.big AS SELECT k, v FROM r.ns.t WHERE v >= 20",
    )
    got = {
        r["k"]: r["v"]
        for r in rest.sql(spark, "SELECT k, v FROM r.ns.big").collect()
    }
    assert got == {2: 20, 3: 30, 4: 40}
    # service-side: a FRESH client lists, loads, and queries the view
    fresh = RestCatalog(RestCatalogClient(server), name="r2")
    # lazy mirror (r10): the walk LISTS the view; metadata loads on
    # first reference
    assert fresh._known.get("ns.big") == "view"
    assert "ns.big" not in fresh._mirror  # not loaded yet
    assert not hasattr(fresh.load("ns.big"), "files")  # loads as a view
    got2 = {
        r["k"]: r["v"]
        for r in fresh.sql(spark, "SELECT k, v FROM r2.ns.big").collect()
    }
    assert got2 == got
    # the raw endpoint speaks the spec shape
    res = RestCatalogClient(server).load_view("ns", "big")
    assert "view-uuid" in res["metadata"]
    reps = res["metadata"]["versions"][-1]["representations"]
    assert reps[0]["type"] == "sql"


def test_create_or_replace_and_drop_view(spark, server):
    rest = RestCatalog(RestCatalogClient(server), name="r")
    _seed(spark, rest)
    rest.sql(spark, "CREATE VIEW r.ns.sel AS SELECT k FROM r.ns.t WHERE k = 1")
    with pytest.raises(ValueError, match="ALREADY_EXISTS"):
        rest.sql(spark, "CREATE VIEW r.ns.sel AS SELECT k FROM r.ns.t")
    rest.sql(
        spark,
        "CREATE OR REPLACE VIEW r.ns.sel AS SELECT k FROM r.ns.t WHERE k >= 3",
    )
    assert {
        r["k"] for r in rest.sql(spark, "SELECT k FROM r.ns.sel").collect()
    } == {3, 4}
    rest.sql(spark, "DROP VIEW r.ns.sel")
    fresh = RestCatalog(RestCatalogClient(server), name="r3")
    assert "ns.sel" not in fresh._known and "ns.sel" not in fresh._mirror
    # dropping again 404s through the service
    with pytest.raises(Exception):
        RestCatalogClient(server).drop_view("ns", "sel")


def test_view_name_collision_with_table_409(spark, server):
    rest = RestCatalog(RestCatalogClient(server), name="r")
    _seed(spark, rest)
    with pytest.raises(Exception, match="409|exists"):
        RestCatalogClient(server).create_view("ns", "t", "SELECT 1 AS x")


def test_replace_view_is_versioned_commit(spark, server):
    """REPLACE commits a NEW view version through CommitViewRequest —
    the service-side version log keeps the prior SQL (no drop+create)."""
    rest = RestCatalog(RestCatalogClient(server), name="r")
    _seed(spark, rest)
    rest.sql(spark, "CREATE VIEW r.ns.vv AS SELECT k FROM r.ns.t WHERE k = 1")
    rest.sql(
        spark,
        "CREATE OR REPLACE VIEW r.ns.vv AS SELECT k FROM r.ns.t WHERE k >= 3",
    )
    meta = RestCatalogClient(server).load_view("ns", "vv")["metadata"]
    assert meta["current-version-id"] == 2
    assert len(meta["versions"]) == 2
    assert len(meta["version-log"]) == 2
    # query resolves the NEW version; uuid unchanged (same view object)
    assert {
        r["k"] for r in rest.sql(spark, "SELECT k FROM r.ns.vv").collect()
    } == {3, 4}


def test_local_replace_view_is_versioned(spark, tmp_path):
    import os

    from datafusion_iceberg_spark.iceberg.catalog import Catalog

    cat = Catalog(os.path.join(str(tmp_path), "wh"))
    df = spark.createDataFrame([(1, 10), (2, 20)], "k long, v long")
    cat.create_table("ns.t", df.schema)
    cat.append("ns.t", spark, df)
    cat.sql(spark, "CREATE VIEW iceberg.ns.w AS SELECT k FROM iceberg.ns.t")
    cat.sql(
        spark,
        "CREATE OR REPLACE VIEW iceberg.ns.w AS"
        " SELECT k FROM iceberg.ns.t WHERE k = 2",
    )
    view = cat.load("ns.w")
    assert view.raw["current-version-id"] == 2
    assert len(view.raw["version-log"]) == 2
    assert {
        r["k"] for r in cat.sql(spark, "SELECT k FROM iceberg.ns.w").collect()
    } == {2}


def test_view_time_travel_versions(spark, tmp_path):
    """FOR VERSION AS OF on a VIEW expands that version's stored SQL;
    TIMESTAMP AS OF walks the version log (view time travel, r12)."""
    import shutil

    from datafusion_iceberg_spark.iceberg.catalog import Catalog
    from datafusion_iceberg_spark.tables import load_table
    from tests.conftest import SF_DIR

    d = tmp_path / "vtt_wh"
    cat = Catalog(str(d), name="vtt")
    nation = load_table(spark, SF_DIR, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    cat.create_table("v.nation", nation.schema)
    cat.append("v.nation", spark, nation)
    cat.sql(
        spark,
        "CREATE VIEW vtt.v.rpt AS "
        "SELECT n_regionkey, COUNT(*) AS n FROM vtt.v.nation "
        "GROUP BY n_regionkey",
    )
    cat.sql(
        spark,
        "CREATE OR REPLACE VIEW vtt.v.rpt AS "
        "SELECT n_regionkey, MIN(n_nationkey) AS n FROM vtt.v.nation "
        "GROUP BY n_regionkey",
    )
    cur = {
        r["n_regionkey"]: r["n"]
        for r in cat.sql(
            spark, "SELECT * FROM vtt.v.rpt"
        ).collect()
    }
    v1 = {
        r["n_regionkey"]: r["n"]
        for r in cat.sql(
            spark, "SELECT * FROM vtt.v.rpt FOR VERSION AS OF 1"
        ).collect()
    }
    # v1 = counts (5 per region at any sf), current = min keys
    assert set(v1.values()) != set(cur.values()) or v1 != cur
    assert all(v == 5 for v in v1.values())
    # TIMESTAMP AS OF far future resolves to the current version
    far = cat.sql(
        spark,
        "SELECT * FROM vtt.v.rpt FOR TIMESTAMP AS OF 99999999999999",
    ).collect()
    assert {r["n_regionkey"]: r["n"] for r in far} == cur
    # unknown version errors loudly
    import pytest as _pytest

    with _pytest.raises(KeyError, match="no version"):
        cat.sql(spark, "SELECT * FROM vtt.v.rpt FOR VERSION AS OF 9")
    shutil.rmtree(d, ignore_errors=True)
