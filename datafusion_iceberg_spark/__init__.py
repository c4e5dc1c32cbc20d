"""datafusion_iceberg_spark — a PySpark-native analytics engine with the
capabilities of JanKaul/datafusion_iceberg, rebuilt Spark-first.

The reference (/root/reference, Rust) is a DataFusion TableProvider /
CatalogProvider for Apache Iceberg tables and views.  Here the host engine is
Spark (Catalyst + Tungsten); this package provides:

- ``iceberg/``     — pure-Python Iceberg metadata reader (metadata JSON,
                     manifest-list/manifest Avro), two-level statistics
                     pruning, snapshot selection, and an ``IcebergTable``
                     that yields a ``pyspark.sql.DataFrame``
                     (reference: datafusion_iceberg/src/table.rs,
                     pruning_statistics.rs, statistics.rs).
- ``catalog``      — namespace/catalog mirror exposing tables + views
                     (reference: datafusion_iceberg_catalog_rest/src/*.rs).
- ``operators/``   — the relational operator surface (joins, aggregates,
                     windows, set ops, subqueries) expressed as DataFrame /
                     Spark SQL programs with DuckDB oracle SQL for each.
- ``functions/``   — scalar function banks (string/math/datetime/json).
- ``extensions/``  — LLM-data-pipeline operators: dedup (exact/minhash/
                     simhash), embedding similarity search, text analysis,
                     multimodal column plumbing.
- ``streaming/``   — Structured Streaming ports of the windowed operators.

Every query is registered via :mod:`datafusion_iceberg_spark.registry` and
surfaced through ``__spark_entry__.py`` for the driver's correctness oracle.
"""

from datafusion_iceberg_spark.registry import QUERIES, ORACLES, register

__all__ = ["QUERIES", "ORACLES", "register"]
__version__ = "0.1.0"
