"""Iceberg single-value binary (de)serialization — the analogue of the
reference's ``any_iter_to_array`` type dispatch
(datafusion_iceberg/src/pruning_statistics.rs:198-243), plus the encode
direction for our write path.

Per the Iceberg spec ("Appendix D: Single-value serialization", public
docs): ints/longs/floats/doubles little-endian, strings UTF-8, date =
int32 days from epoch, time/timestamp = int64 micros, decimal =
big-endian unscaled int.

Correctness note (SURVEY.md §4.4 bug 1): stats maps are keyed by Iceberg
**field ID**; everything in this package looks bounds up by field ID and
translates name→ID through the table schema — never by column position
(the reference's off-by-one).
"""

from __future__ import annotations

import struct
from datetime import date, datetime, timedelta, timezone
from decimal import Decimal
from typing import Any

EPOCH_DATE = date(1970, 1, 1)
EPOCH_TS = datetime(1970, 1, 1)


def decode_stat(iceberg_type: str, data: bytes | None) -> Any:
    """Decode one bound/stat value for an Iceberg primitive type string.
    Unknown types return None (⇒ pruning treats the bound as unknown and
    keeps the file — conservative, mirroring the reference's design)."""
    if data is None or not isinstance(iceberg_type, str):
        return None  # nested types carry no single-value bounds
    t = iceberg_type
    try:
        if t == "boolean":
            return data[0] != 0
        if t == "int":
            return struct.unpack("<i", data)[0]
        if t == "long":
            # type widening (int -> long): manifests written before the
            # ALTER carry 4-byte bounds; decode them as int so old files
            # keep pruning instead of degrading to "no stats"
            if len(data) == 4:
                return struct.unpack("<i", data)[0]
            return struct.unpack("<q", data)[0]
        if t == "float":
            return struct.unpack("<f", data)[0]
        if t == "double":
            # float -> double widening: 4-byte bounds from pre-ALTER files
            if len(data) == 4:
                return float(struct.unpack("<f", data)[0])
            return struct.unpack("<d", data)[0]
        if t in ("string", "uuid"):
            return data.decode("utf-8", errors="replace")
        if t == "date":
            return EPOCH_DATE + timedelta(days=struct.unpack("<i", data)[0])
        if t == "time":
            return struct.unpack("<q", data)[0]  # micros since midnight
        if t in ("timestamp_ns", "timestamptz_ns"):
            # v3 nanos: bounds are int64 nanos-since-epoch; the Spark
            # domain is the same raw long (metadata.py), so return it
            # undecoded — datetime would silently truncate to micros
            return struct.unpack("<q", data)[0]
        if t.startswith("timestamptz"):
            us = struct.unpack("<q", data)[0]
            return EPOCH_TS.replace(tzinfo=timezone.utc) + timedelta(microseconds=us)
        if t.startswith("timestamp"):
            return EPOCH_TS + timedelta(microseconds=struct.unpack("<q", data)[0])
        if t.startswith("decimal"):
            # decimal(p, s): big-endian two's-complement unscaled value
            scale = int(t.rstrip(")").split(",")[1]) if "," in t else 0
            unscaled = int.from_bytes(data, "big", signed=True)
            return Decimal(unscaled).scaleb(-scale)
        if t in ("binary",) or t.startswith("fixed"):
            return bytes(data)
    except (struct.error, IndexError, ValueError):
        return None
    return None


def encode_stat(iceberg_type: str, value: Any) -> bytes | None:
    """Inverse of :func:`decode_stat` for the write path."""
    if value is None or not isinstance(iceberg_type, str):
        return None  # nested types carry no single-value bounds
    t = iceberg_type
    if t == "boolean":
        return b"\x01" if value else b"\x00"
    if t == "int":
        return struct.pack("<i", int(value))
    if t == "long":
        return struct.pack("<q", int(value))
    if t == "float":
        return struct.pack("<f", float(value))
    if t == "double":
        return struct.pack("<d", float(value))
    if t in ("string", "uuid"):
        return str(value).encode("utf-8")
    if t == "date":
        if isinstance(value, int):  # already days-from-epoch (the domain
            return struct.pack("<i", value)  # manifest partition values use)
        return struct.pack("<i", (value - EPOCH_DATE).days)
    if t == "time":
        return struct.pack("<q", int(value))
    if t in ("timestamp_ns", "timestamptz_ns"):
        return struct.pack("<q", int(value))  # domain long = nanos
    if t.startswith("timestamp"):
        if isinstance(value, datetime):
            if value.tzinfo is not None:
                value = value.astimezone(timezone.utc).replace(tzinfo=None)
            us = int((value - EPOCH_TS).total_seconds() * 1_000_000)
            # recompute exactly from components to dodge float rounding
            delta = value - EPOCH_TS
            us = (delta.days * 86_400 + delta.seconds) * 1_000_000 + delta.microseconds
            return struct.pack("<q", us)
        return struct.pack("<q", int(value))
    if t.startswith("decimal"):
        scale = int(t.rstrip(")").split(",")[1]) if "," in t else 0
        unscaled = int(Decimal(value).scaleb(scale))
        n = (unscaled.bit_length() + 8) // 8 or 1
        return unscaled.to_bytes(n, "big", signed=True)
    if t in ("binary",) or t.startswith("fixed"):
        return bytes(value)
    return None
