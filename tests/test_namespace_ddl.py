"""SQL CREATE/DROP NAMESPACE (VERDICT r8 "What's missing" #4): one
parser production dispatching to the catalogs' existing
``create_namespace`` machinery, plus the new RESTRICT ``drop_namespace``
— round-trips on both the filesystem catalog and the REST catalog
(where both verbs commit through the service: POST /v1/namespaces,
DELETE /v1/namespaces/{ns})."""

from __future__ import annotations

import os

import pytest

from datafusion_iceberg_spark.iceberg.catalog import Catalog


@pytest.fixture()
def scratch(tmp_path):
    return str(tmp_path)


def _names(cat, spark):
    return [
        r["namespace"]
        for r in cat.sql(spark, f"SHOW NAMESPACES IN {cat.name}").collect()
    ]


def test_local_namespace_roundtrip(spark, scratch):
    cat = Catalog(os.path.join(scratch, "wh"))
    cat.sql(spark, "CREATE NAMESPACE iceberg.sales")
    assert "sales" in _names(cat, spark)
    # idempotent spelling + duplicate error
    cat.sql(spark, "CREATE NAMESPACE IF NOT EXISTS iceberg.sales")
    with pytest.raises(KeyError):
        cat.sql(spark, "CREATE NAMESPACE iceberg.sales")
    cat.sql(spark, "DROP NAMESPACE iceberg.sales")
    assert "sales" not in _names(cat, spark)
    cat.sql(spark, "DROP NAMESPACE IF EXISTS iceberg.sales")
    with pytest.raises(KeyError):
        cat.sql(spark, "DROP NAMESPACE iceberg.sales")


def test_schema_synonym(spark, scratch):
    cat = Catalog(os.path.join(scratch, "wh"))
    cat.sql(spark, "CREATE SCHEMA iceberg.ops")
    assert "ops" in _names(cat, spark)
    cat.sql(spark, "DROP SCHEMA iceberg.ops")
    assert "ops" not in _names(cat, spark)


def test_drop_restricts_non_empty(spark, scratch):
    cat = Catalog(os.path.join(scratch, "wh"))
    cat.sql(spark, "CREATE NAMESPACE iceberg.live")
    cat.sql(spark, "CREATE TABLE iceberg.live.t (k BIGINT, v BIGINT)")
    with pytest.raises(ValueError, match="not empty"):
        cat.sql(spark, "DROP NAMESPACE iceberg.live")
    cat.sql(spark, "DROP TABLE iceberg.live.t")
    cat.sql(spark, "DROP NAMESPACE iceberg.live")
    assert "live" not in _names(cat, spark)


def test_other_catalog_falls_through(spark, scratch):
    """A namespace statement naming another catalog is not ours — it
    hands through to Spark (which errors on the unknown catalog, not on
    our parser)."""
    cat = Catalog(os.path.join(scratch, "wh"))
    with pytest.raises(Exception) as ei:
        cat.sql(spark, "CREATE NAMESPACE somewhere_else.ns")
    assert "somewhere_else" in str(ei.value)


def test_rest_namespace_roundtrip(spark, scratch):
    from datafusion_iceberg_spark.iceberg.rest_catalog import (
        LocalRestServer,
        RestCatalog,
        RestCatalogClient,
    )

    root = os.path.join(scratch, "whrest")
    os.makedirs(root, exist_ok=True)
    server = LocalRestServer(root)
    try:
        base = server.start()
        rest = RestCatalog(RestCatalogClient(base), name="r")
        rest.sql(spark, "CREATE NAMESPACE r.sales")
        assert "sales" in _names(rest, spark)
        # the create is service-side: a FRESH client sees it
        fresh = RestCatalog(RestCatalogClient(base), name="r2")
        assert "sales" in fresh.namespaces()
        # RESTRICT through the service: 409 while a table remains
        rest.create_table(
            "sales.t",
            spark.createDataFrame([(1,)], "k long").schema,
        )
        with pytest.raises(Exception, match="not empty|409"):
            rest.sql(spark, "DROP NAMESPACE r.sales")
        rest.drop("sales.t")
        rest.sql(spark, "DROP NAMESPACE r.sales")
        assert "sales" not in _names(rest, spark)
        fresh2 = RestCatalog(RestCatalogClient(base), name="r3")
        assert "sales" not in fresh2.namespaces()
    finally:
        server.stop()


def test_local_namespace_properties(spark, scratch):
    cat = Catalog(os.path.join(scratch, "wh"))
    cat.sql(spark, "CREATE NAMESPACE iceberg.sales")
    cat.sql(
        spark,
        "ALTER NAMESPACE iceberg.sales SET PROPERTIES"
        " ('owner' = 'data-eng', 'retention' = '30d')",
    )
    rows = {
        r["info_name"]: r["info_value"]
        for r in cat.sql(spark, "DESCRIBE NAMESPACE iceberg.sales").collect()
    }
    assert rows == {
        "namespace": "sales", "owner": "data-eng", "retention": "30d",
    }
    # UNSET removes; missing keys report through the API shape
    cat.sql(
        spark, "ALTER NAMESPACE iceberg.sales UNSET PROPERTIES ('retention')"
    )
    res = cat.update_namespace_properties(
        "sales", {}, ["retention", "owner"]
    )
    assert res == {"updated": [], "removed": ["owner"], "missing": ["retention"]}
    rows = {
        r["info_name"]
        for r in cat.sql(spark, "DESCRIBE NAMESPACE iceberg.sales").collect()
    }
    assert rows == {"namespace"}
    # SCHEMA synonym parses too
    cat.sql(
        spark,
        "ALTER SCHEMA iceberg.sales SET PROPERTIES ('x' = '1')",
    )
    assert cat.namespace_properties("sales") == {"x": "1"}


def test_rest_namespace_properties(spark, scratch):
    from datafusion_iceberg_spark.iceberg.rest_catalog import (
        LocalRestServer,
        RestCatalog,
        RestCatalogClient,
    )

    root = os.path.join(scratch, "whrest")
    os.makedirs(root, exist_ok=True)
    server = LocalRestServer(root)
    try:
        base = server.start()
        rest = RestCatalog(RestCatalogClient(base), name="r")
        rest.sql(spark, "CREATE NAMESPACE r.ops")
        rest.sql(
            spark,
            "ALTER NAMESPACE r.ops SET PROPERTIES ('tier' = 'hot')",
        )
        # spec endpoint shape via a raw client
        res = RestCatalogClient(base).load_namespace("ops")
        assert res["properties"] == {"tier": "hot"}
        # DESCRIBE resolves through the service
        rows = {
            r["info_name"]: r["info_value"]
            for r in rest.sql(spark, "DESCRIBE NAMESPACE r.ops").collect()
        }
        assert rows == {"namespace": "ops", "tier": "hot"}
        out = RestCatalogClient(base).update_namespace_properties(
            "ops", {"tier": "cold"}, ["nope"]
        )
        assert out["updated"] == ["tier"] and out["missing"] == ["nope"]
        assert rest.namespace_properties("ops") == {"tier": "cold"}
    finally:
        server.stop()


def test_show_views(spark, scratch):
    cat = Catalog(os.path.join(scratch, "wh"))
    df = spark.createDataFrame([(1,)], "k long")
    cat.create_table("a.t", df.schema)
    cat.append("a.t", spark, df)
    cat.sql(spark, "CREATE VIEW iceberg.a.v1 AS SELECT k FROM iceberg.a.t")
    cat.sql(spark, "CREATE VIEW iceberg.b.v2 AS SELECT k FROM iceberg.a.t")
    rows = {
        (r.namespace, r.viewName)
        for r in cat.sql(spark, "SHOW VIEWS IN iceberg").collect()
    }
    assert rows == {("a", "v1"), ("b", "v2")}
    rows = {
        r.viewName
        for r in cat.sql(spark, "SHOW VIEWS IN iceberg.a").collect()
    }
    assert rows == {"v1"}
