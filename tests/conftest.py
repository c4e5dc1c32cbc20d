"""Shared fixtures: one SparkSession per test session (JVM startup is
~15 s — never per-test), plus the DuckDB oracle connection."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # lighter for tests
    from datafusion_iceberg_spark.session import get_spark

    s = get_spark("tests")
    yield s


@pytest.fixture(autouse=True)
def _release_scoped_caches():
    """Free any scoped-cache blocks a gate builder registered, after the
    test that consumed them finishes — mirrors what
    ``__spark_entry__.queries()`` does for the driver sweep, so an
    880-test session doesn't accumulate cached frames (ADVICE r11 #4)."""
    yield
    from datafusion_iceberg_spark.caching import release_scoped_caches

    release_scoped_caches()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
