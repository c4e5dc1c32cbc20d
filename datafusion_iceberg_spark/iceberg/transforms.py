"""Iceberg partition transforms beyond identity: day / month / year /
bucket[N] / truncate[W] (Iceberg spec "Partition Transforms").

The reference only exercises identity (fixture spec on vendor_id), but
time- and bucket-partitioning are what make 100 TB tables prunable: a
predicate on the SOURCE column must skip manifests whose summaries are
stored in the TRANSFORMED domain.  Two pieces live here:

- value-side: ``apply(transform, value)`` (driver, for pruning literals)
  and ``spark_expr(transform, col)`` (executor, for the write path) —
  the same function computed in both places, including Iceberg's
  murmur3-based bucket hash (pure Python + a Pandas UDF).
- predicate-side: ``rewrite_pred`` maps a predicate on the source column
  into a conservative predicate on the transformed domain, exploiting
  monotonicity (day/month/year/truncate) or hash semantics (bucket:
  equality only).  Under a NOT the relaxation direction flips, so
  transformed leaves inside NOT degrade to "maybe" (keep).
"""

from __future__ import annotations

import re
from datetime import date, datetime, timezone
from typing import Any, Optional

EPOCH = date(1970, 1, 1)


def parse_spec_entry(entry: str) -> tuple[str, str, str]:
    """'col' | 'day(col)' | 'bucket(16, col)' | 'truncate(4, col)' →
    (source_col, transform_str, partition_field_name)."""
    entry = entry.strip()
    m = re.fullmatch(r"(day|month|year|hour)\s*\(\s*(\w+)\s*\)", entry)
    if m:
        t, col = m.group(1), m.group(2)
        return col, t, f"{col}_{t}"
    m = re.fullmatch(r"bucket\s*\(\s*(\d+)\s*,\s*(\w+)\s*\)", entry)
    if m:
        n, col = int(m.group(1)), m.group(2)
        return col, f"bucket[{n}]", f"{col}_bucket"
    m = re.fullmatch(r"truncate\s*\(\s*(\d+)\s*,\s*(\w+)\s*\)", entry)
    if m:
        w, col = int(m.group(1)), m.group(2)
        return col, f"truncate[{w}]", f"{col}_trunc"
    if re.fullmatch(r"\w+", entry):
        return entry, "identity", entry
    raise ValueError(f"unsupported partition spec entry: {entry!r}")


def result_iceberg_type(transform: str, source_type: str) -> str:
    if transform == "identity" or transform.startswith("truncate"):
        return source_type
    return "int"  # day/month/year/hour/bucket all produce ints


# -- murmur3_x86_32 (Iceberg bucket hash) -----------------------------------

_C1, _C2 = 0xCC9E2D51, 0x1B873593
_M32 = 0xFFFFFFFF


def murmur3_32(data: bytes, seed: int = 0) -> int:
    h = seed
    n4 = len(data) // 4
    for i in range(n4):
        k = int.from_bytes(data[4 * i : 4 * i + 4], "little")
        k = (k * _C1) & _M32
        k = ((k << 15) | (k >> 17)) & _M32
        k = (k * _C2) & _M32
        h ^= k
        h = ((h << 13) | (h >> 19)) & _M32
        h = (h * 5 + 0xE6546B64) & _M32
    tail = data[4 * n4 :]
    if tail:
        k = 0
        for i, b in enumerate(tail):
            k |= b << (8 * i)
        k = (k * _C1) & _M32
        k = ((k << 15) | (k >> 17)) & _M32
        k = (k * _C2) & _M32
        h ^= k
    h ^= len(data)
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _M32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _M32
    h ^= h >> 16
    return h


def _bucket_bytes(value: Any) -> bytes:
    """Iceberg single-value serialization for bucketing: int/long/date as
    signed 8-byte little-endian, string as UTF-8."""
    if isinstance(value, bool):
        raise ValueError("bucket on boolean not in Iceberg spec")
    if isinstance(value, int):
        return value.to_bytes(8, "little", signed=True)
    if isinstance(value, str):
        return value.encode()
    raise ValueError(f"bucket transform unsupported for {type(value)}")


def bucket_value(value: Any, n: int) -> int:
    return (murmur3_32(_bucket_bytes(value)) & 0x7FFFFFFF) % n


def _murmur3_int64_vec(vals):
    """Vectorized murmur3_x86_32 over int64 values serialized as Iceberg
    bucket bytes (8-byte little-endian): two 4-byte blocks, empty tail.
    Returns (hash & 0x7FFFFFFF) as int64 — identical to
    murmur3_32(_bucket_bytes(v)) & 0x7FFFFFFF for every int64 v."""
    import numpy as np

    with np.errstate(over="ignore"):
        data = vals.astype("<i8").view(np.uint64)
        c1 = np.uint32(_C1)
        c2 = np.uint32(_C2)
        h = np.zeros(len(vals), dtype=np.uint32)
        for word in (
            (data & np.uint64(0xFFFFFFFF)).astype(np.uint32),
            (data >> np.uint64(32)).astype(np.uint32),
        ):
            k = word * c1
            k = (k << np.uint32(15)) | (k >> np.uint32(17))
            k = k * c2
            h ^= k
            h = (h << np.uint32(13)) | (h >> np.uint32(19))
            h = h * np.uint32(5) + np.uint32(0xE6546B64)
        h ^= np.uint32(8)  # length
        h ^= h >> np.uint32(16)
        h = h * np.uint32(0x85EBCA6B)
        h ^= h >> np.uint32(13)
        h = h * np.uint32(0xC2B2AE35)
        h ^= h >> np.uint32(16)
        return (h & np.uint32(0x7FFFFFFF)).astype(np.int64)


# -- value-side application -------------------------------------------------


def _as_date(value: Any) -> date:
    if isinstance(value, datetime):
        return value.date()
    if isinstance(value, date):
        return value
    if isinstance(value, str):
        return datetime.fromisoformat(value).date()
    raise ValueError(f"not a date/timestamp: {value!r}")


def apply(transform: str, value: Any) -> Any:
    """Compute the transformed value for a literal (driver-side, used to
    rewrite pruning predicates)."""
    if value is None:
        return None
    if transform == "identity":
        return value
    if transform == "day":
        return (_as_date(value) - EPOCH).days
    if transform == "month":
        d = _as_date(value)
        return (d.year - 1970) * 12 + (d.month - 1)
    if transform == "year":
        return _as_date(value).year - 1970
    if transform == "hour":
        if isinstance(value, str):
            value = datetime.fromisoformat(value)
        if not isinstance(value, datetime):
            raise ValueError(f"hour() needs a timestamp: {value!r}")
        ts = value.replace(tzinfo=value.tzinfo or timezone.utc)
        return int(ts.timestamp() // 3600)
    m = re.fullmatch(r"bucket\[(\d+)\]", transform)
    if m:
        return bucket_value(value, int(m.group(1)))
    m = re.fullmatch(r"truncate\[(\d+)\]", transform)
    if m:
        w = int(m.group(1))
        if isinstance(value, str):
            return value[:w]
        if isinstance(value, int):
            return value - (value % w)  # floored (works for negatives)
        raise ValueError(f"truncate unsupported for {type(value)}")
    raise ValueError(f"unknown transform: {transform}")


def spark_expr(transform: str, col: str, dtype=None, iceberg_type=None):
    """The same transform as a Spark Column (write path).  ``dtype`` —
    the source column's Spark type when the caller knows it — routes
    integral columns through an EXACT vectorized bucket path even when
    the batch carries nulls (without it, Arrow→pandas upcasts a
    nullable int64 batch to float64, which silently rounds values above
    2^53 and would bucket snowflake-scale ids into the wrong
    partition).

    ``iceberg_type`` — the declared Iceberg type, when the caller knows
    it: v3 ``timestamp_ns``/``timestamptz_ns`` columns are carried as
    raw int64 NANOS in Spark (no ns timestamp type exists), so temporal
    transforms on an integral column scale the nanos domain with exact
    integer floor-division before folding to hours/days (and tz-free
    DATE arithmetic for months/years); an integral column WITHOUT a ns
    declaration refuses loudly — ``day(some_long)`` has no epoch domain
    and the naive path would raise Spark's opaque CAST_INVALID_INPUT
    mid-write."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    if transform == "identity":
        return F.col(col)
    if (
        transform in ("day", "month", "year", "hour")
        and dtype is not None
        and dtype.typeName() in ("long", "integer", "short", "byte")
    ):
        if iceberg_type not in ("timestamp_ns", "timestamptz_ns"):
            raise ValueError(
                f"temporal transform {transform!r} on integral column "
                f"{col!r} (iceberg type "
                f"{iceberg_type or dtype.typeName()!r}): only v3 "
                "timestamp_ns/timestamptz_ns longs carry a nanosecond "
                "epoch domain this transform can fold"
            )

        def _floor_div(d: int):
            # exact for the full int64 range: (c - pmod(c, d)) is a
            # multiple of d, and the quotient (epoch hours/days) is far
            # below 2^53, so the double division is lossless
            c = F.col(col)
            return ((c - F.pmod(c, F.lit(d))) / F.lit(d)).cast("int")

        if transform == "hour":
            return _floor_div(3_600_000_000_000)
        days = _floor_div(86_400_000_000_000)
        if transform == "day":
            return days
        # months/years via DATE arithmetic — tz-free, unlike F.year on a
        # TimestampType column which renders in the session timezone
        dcol = F.date_add(F.to_date(F.lit("1970-01-01")), days)
        if transform == "month":
            return (F.year(dcol) - 1970) * 12 + F.month(dcol) - 1
        return F.year(dcol) - 1970
    if transform == "day":
        return F.datediff(F.to_date(F.col(col)), F.lit("1970-01-01"))
    if transform == "month":
        return (F.year(col) - 1970) * 12 + F.month(col) - 1
    if transform == "year":
        return F.year(col) - 1970
    if transform == "hour":
        # tz-independent: hours-from-epoch of the WALL-CLOCK reading, the
        # same convention apply() uses for naive literals (assumed UTC).
        # bare unix_timestamp() yields the session-tz-shifted instant, so
        # a non-UTC caller session would write partition values offset
        # from the pruning rewrite's literals and equality pruning could
        # skip matching files.  from_utc_timestamp(col, session_tz) adds
        # the offset back (identity under UTC sessions).
        from pyspark.sql import SparkSession

        sess = SparkSession.getActiveSession()
        tz = (
            sess.conf.get("spark.sql.session.timeZone", "UTC")
            if sess is not None
            else "UTC"
        )
        wall = F.from_utc_timestamp(F.col(col), tz) if tz != "UTC" else F.col(col)
        return F.floor(F.unix_timestamp(wall) / 3600).cast("int")
    m = re.fullmatch(r"bucket\[(\d+)\]", transform)
    if m:
        n = int(m.group(1))

        if dtype is not None and dtype.typeName() in (
            "long",
            "integer",
            "short",
            "byte",
        ):
            # exact + always-vectorized integral path: nulls are masked
            # JVM-side (coalesce to 0 keeps the batch int64 end-to-end,
            # so no float carrier ever touches the values) and restored
            # from the companion null-mask column
            @F.pandas_udf(T.IntegerType())
            def _bucket_int(s, isnull):
                import numpy as np
                import pandas as pd

                vals = _murmur3_int64_vec(s.to_numpy(dtype=np.int64)) % n
                out = pd.Series(vals).astype("Int32")
                mask = isnull.to_numpy(dtype=bool)
                if mask.any():
                    out[mask] = None
                return out

            return _bucket_int(
                F.coalesce(F.col(col), F.lit(0)).cast("long"),
                F.col(col).isNull(),
            )

        @F.pandas_udf(T.IntegerType())
        def _bucket(s):
            import numpy as np
            import pandas as pd

            if pd.api.types.is_integer_dtype(s.dtype) and not s.isna().any():
                # vectorized murmur3 over the whole Arrow batch (ints are
                # 8-byte little-endian blocks → two 4-byte words; a
                # per-value Python lambda here was the write path's only
                # row-at-a-time hot spot)
                return pd.Series(
                    _murmur3_int64_vec(s.to_numpy(dtype=np.int64)) % n
                ).astype("int32")
            # a nullable INT column arrives as float64 (NaN for nulls) or
            # Int64; normalize nulls first, then hash the integer VALUE
            # (never the float carrier — Iceberg buckets int/long bytes)
            def _one(v):
                if v is None or (isinstance(v, float) and v != v) or pd.isna(v):
                    return None
                if isinstance(v, float) and v.is_integer():
                    # float carrier from a nullable int batch: exact only
                    # below 2^53 — beyond that the upcast already rounded
                    # the value, refuse rather than bucket it wrongly
                    if abs(v) > 2**53:
                        raise ValueError(
                            "nullable int64 batch upcast to float64 lost "
                            f"precision at {v!r}; pass the column dtype to "
                            "spark_expr for the exact path"
                        )
                    v = int(v)
                return bucket_value(v, n)

            return s.map(_one)

        return _bucket(F.col(col))
    m = re.fullmatch(r"truncate\[(\d+)\]", transform)
    if m:
        w = int(m.group(1))
        return F.expr(
            f"CASE WHEN typeof({col}) = 'string' THEN substring({col}, 1, {w})"
            f" ELSE CAST({col} - pmod({col}, {w}) AS STRING) END"
        )
    raise ValueError(f"unknown transform: {transform}")


# -- predicate-side rewrite -------------------------------------------------

_MONOTONIC = re.compile(r"^(day|month|year|hour|truncate\[\d+\])$")
_BUCKET = re.compile(r"^bucket\[\d+\]$")


def rewrite_pred(pred: tuple, col: str, transform: str, in_not: bool = False):
    """Rewrite predicate leaves on ``col`` into the transformed domain
    (conservative: any leaf we cannot soundly map becomes ("maybe",),
    which the evaluator treats as keep).  Leaves on other columns pass
    through unchanged."""
    op = pred[0]
    if op in ("and", "or"):
        return (
            op,
            rewrite_pred(pred[1], col, transform, in_not),
            rewrite_pred(pred[2], col, transform, in_not),
        )
    if op == "not":
        return ("not", rewrite_pred(pred[1], col, transform, not in_not))
    if len(pred) < 2 or pred[1] != col:
        return pred
    if in_not:
        return ("maybe",)
    try:
        if _MONOTONIC.match(transform):
            if op == "=":
                return ("=", col, apply(transform, pred[2]))
            if op in ("<", "<="):
                return ("<=", col, apply(transform, pred[2]))
            if op in (">", ">="):
                return (">=", col, apply(transform, pred[2]))
            if op == "between":
                return (
                    "between",
                    col,
                    apply(transform, pred[2]),
                    apply(transform, pred[3]),
                )
            if op == "in":
                return ("in", col, [apply(transform, v) for v in pred[2]])
        elif _BUCKET.match(transform):
            if op == "=":
                return ("=", col, apply(transform, pred[2]))
            if op == "in":
                return ("in", col, [apply(transform, v) for v in pred[2]])
    except ValueError:
        return ("maybe",)
    return ("maybe",)
