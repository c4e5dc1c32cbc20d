"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H-Q3-shaped: filter + join +
groupBy + agg + orderBy) at sf0.001.  ``queries()`` / ``oracle_sql()``
surface every operator registered in
:mod:`datafusion_iceberg_spark.registry` — one entry per operator from
SURVEY.md §2, each with DuckDB oracle SQL where SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from datafusion_iceberg_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    registry.load_all_modules()
    return registry.QUERIES["q3_shipping_priority"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, ordered so a
    budget-limited correctness sweep reaches every subsystem: Iceberg
    stack first, then extensions/windows/setops/streaming/sources, with
    the relational surface last (driver-verified in round 1).

    Each callable first releases the PREVIOUS gate's scoped caches
    (builders that cache an intermediate shared by two consumers in the
    returned plan register it via
    :func:`datafusion_iceberg_spark.caching.scoped_cache`) — so a
    274-gate single-session sweep holds at most one gate's cache blocks
    instead of accumulating them all."""
    registry.load_all_modules()

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            from datafusion_iceberg_spark.caching import release_scoped_caches

            release_scoped_caches()
            return fn(spark, sf_dir)

        run.__name__ = getattr(fn, "__name__", "query")
        run.__doc__ = fn.__doc__
        run.__module__ = fn.__module__
        run.__wrapped__ = fn
        return run

    return {name: wrap(registry.QUERIES[name]) for name in registry.ordered_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query — ALL registered queries (the
    registry is the source of truth for the count; every gate has one),
    including full-algorithm replays of the md5 hash-family ops
    (minhash/simhash/LSH/fake media codecs) and, since round 5, in-query
    bound assertions that make even the Spark-internal approx sketches
    (HLL++/KLL) hash-verifiable."""
    registry.load_all_modules()
    return {
        name: registry.ORACLES[name]
        for name in registry.ordered_names()
        if name in registry.ORACLES
    }
