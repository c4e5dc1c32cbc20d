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


def _dtype_kind(dtype) -> str:
    """Collapse a pandas dtype to the representation class the driver's
    value-hash distinguishes: int, float, bool, datetime, other-object."""
    k = getattr(dtype, "kind", "O")
    if k in ("i", "u"):
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k in ("M", "m"):
        return "datetime"
    return "object"


def check_driver_portability(spark_df, duck_rel, name: str = "") -> None:
    """The round-1 driver red rows were *representation* bugs invisible to
    the fetchall()-based value check: DuckDB HUGEINT materializes as
    float64 in pandas while Spark BIGINT stays int64 (q12), and raw array
    cells are unhashable in the driver's canonicalizer (agg_collect_sorted).
    This check reproduces the driver's pandas view of both results and
    fails on (a) int-vs-float dtype-kind mismatch per column, (b) any
    ndarray/list/dict cell in either frame."""
    import numpy as np

    s_pdf = spark_df.toPandas()
    d_pdf = duck_rel.df()
    s_map = {c.lower(): s_pdf[c] for c in s_pdf.columns}
    d_map = {c.lower(): d_pdf[c] for c in d_pdf.columns}
    # TIMESTAMPTZ fence (the r3 stream_sliding_window red): DuckDB's
    # to_timestamp() yields TIMESTAMP WITH TIME ZONE → tz-aware pandas
    # dtype, while Spark timestamps arrive naive — the driver's
    # schema/value hashes split on that even when instants agree.  Any
    # timestamp-producing oracle must CAST(... AS TIMESTAMP).
    for m, side in ((s_map, "spark"), (d_map, "duck")):
        for col, series in m.items():
            if getattr(series.dtype, "tz", None) is not None:
                raise AssertionError(
                    f"{name}: {side} column {col!r} is tz-aware "
                    f"({series.dtype}) — driver hashes schema apart; "
                    "CAST(... AS TIMESTAMP) in the oracle SQL"
                )
    for col in sorted(s_map):
        sk, dk = _dtype_kind(s_map[col].dtype), _dtype_kind(d_map[col].dtype)
        # All-NULL columns legitimately surface as object/float NaN — only
        # flag the int/float/datetime disagreement the driver hashes apart.
        if {sk, dk} == {"int", "float"} or (
            "datetime" in (sk, dk) and sk != dk
        ):
            raise AssertionError(
                f"{name}: column {col!r} dtype-kind mismatch "
                f"spark={sk}({s_map[col].dtype}) duck={dk}({d_map[col].dtype})"
                " — driver value-hash would differ; CAST both sides"
            )
        for series, side in ((s_map[col], "spark"), (d_map[col], "duck")):
            if series.dtype == object:
                for v in series:
                    if isinstance(v, (np.ndarray, list, dict)):
                        raise AssertionError(
                            f"{name}: {side} column {col!r} holds "
                            f"{type(v).__name__} cells — unhashable in the "
                            "driver canonicalizer; stringify the output"
                        )


def compare(spark_df, duck_rel, name: str = "") -> None:
    """Assert the Spark DataFrame and DuckDB relation agree (order- and
    column-order-insensitive, float-tolerant). Raises AssertionError."""
    check_driver_portability(spark_df, duck_rel, name)
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
