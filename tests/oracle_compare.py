"""Order-insensitive Spark ↔ DuckDB result comparison — the same contract
the driver's CORRECTNESS gate applies (row count + column names + values,
columns sorted by name)."""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

REL_TOL = 1e-9
ABS_TOL = 1e-9


def _norm(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        return v
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return v


def _sort_key(row):
    return tuple(
        (v is None, str(type(v).__name__), str(v)) for v in row
    )


def _values_close(a, b) -> bool:
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            return math.isclose(float(a), float(b), rel_tol=REL_TOL, abs_tol=ABS_TOL)
        except (TypeError, ValueError):
            return False
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(_values_close(x, y) for x, y in zip(a, b))
    return a == b


def compare(spark_df, duck_rel, name: str = "") -> None:
    """Assert the Spark DataFrame and DuckDB relation agree (order- and
    column-order-insensitive, float-tolerant). Raises AssertionError."""
    s_cols = [c.lower() for c in spark_df.columns]
    d_cols = [c.lower() for c in duck_rel.columns]
    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} duck={sorted(d_cols)}"
    )

    s_order = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
    d_order = sorted(range(len(d_cols)), key=lambda i: d_cols[i])

    s_rows = [
        tuple(_norm(row[i]) for i in s_order) for row in spark_df.collect()
    ]
    d_rows = [tuple(_norm(row[i]) for i in d_order) for row in duck_rel.fetchall()]

    assert len(s_rows) == len(d_rows), (
        f"{name}: row count spark={len(s_rows)} duck={len(d_rows)}"
    )

    s_rows.sort(key=_sort_key)
    d_rows.sort(key=_sort_key)
    for i, (sr, dr) in enumerate(zip(s_rows, d_rows)):
        assert _values_close(sr, dr), (
            f"{name}: row {i} differs\n spark={sr}\n duck ={dr}"
        )
