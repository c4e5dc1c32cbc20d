"""Iceberg round-trip queries for the driver oracle.

Filled in by the Iceberg phase (metadata reader + scan + write path):
each query materializes an Iceberg table from the sf_dir parquet, reads it
back through :class:`IcebergTable`, and runs SQL — oracled against plain
SQL over the original parquet.
"""
