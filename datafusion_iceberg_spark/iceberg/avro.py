"""Minimal pure-Python Avro Object Container File codec.

The reference delegates manifest Avro decoding to ``iceberg-rs``
(SURVEY.md §0); this module is our stand-in.  Implements the subset of the
Avro 1.x spec Iceberg manifests use — records, unions, nullable fields,
maps (incl. the key/value array-pair encoding Iceberg uses for
``map<int, bytes>``), arrays, fixed, all primitives, and the ``deflate``
block codec — both read and write (the write path emits manifest and
manifest-list files).

Spec references: Avro 1.11 specification §"Object Container Files" and
§"Binary encoding" (public Apache documentation).  No code is derived
from the reference repo (which contains no Avro logic of its own).
"""

from __future__ import annotations

import json
import os
import struct
import zlib
from typing import Any

MAGIC = b"Obj\x01"


# ---------------------------------------------------------------------------
# Binary decoding primitives
# ---------------------------------------------------------------------------


class Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def read(self, n: int) -> bytes:
        b = self.buf[self.pos : self.pos + n]
        if len(b) != n:
            raise EOFError(f"avro: wanted {n} bytes, got {len(b)}")
        self.pos += n
        return b

    def read_long(self) -> int:
        """zigzag varint"""
        shift = 0
        acc = 0
        while True:
            b = self.buf[self.pos]
            self.pos += 1
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)

    def read_bytes(self) -> bytes:
        return self.read(self.read_long())

    def read_string(self) -> str:
        return self.read_bytes().decode("utf-8")

    def read_float(self) -> float:
        return struct.unpack("<f", self.read(4))[0]

    def read_double(self) -> float:
        return struct.unpack("<d", self.read(8))[0]

    def read_bool(self) -> bool:
        return self.read(1) != b"\x00"

    def at_end(self) -> bool:
        return self.pos >= len(self.buf)


def _decode(schema: Any, r: Reader) -> Any:
    """Decode one value for ``schema`` (parsed Avro schema JSON)."""
    if isinstance(schema, str):
        t = schema
        if t == "null":
            return None
        if t == "boolean":
            return r.read_bool()
        if t == "int" or t == "long":
            return r.read_long()
        if t == "float":
            return r.read_float()
        if t == "double":
            return r.read_double()
        if t == "bytes":
            return r.read_bytes()
        if t == "string":
            return r.read_string()
        raise ValueError(f"avro: unknown primitive {t!r}")
    if isinstance(schema, list):  # union
        idx = r.read_long()
        return _decode(schema[idx], r)
    t = schema["type"]
    if t in ("record", "error"):
        return {f["name"]: _decode(f["type"], r) for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            n = r.read_long()
            if n == 0:
                break
            if n < 0:
                r.read_long()  # block byte-size, unused
                n = -n
            for _ in range(n):
                out.append(_decode(schema["items"], r))
        return out
    if t == "map":
        out = {}
        while True:
            n = r.read_long()
            if n == 0:
                break
            if n < 0:
                r.read_long()
                n = -n
            for _ in range(n):
                k = r.read_string()
                out[k] = _decode(schema["values"], r)
        return out
    if t == "fixed":
        return r.read(schema["size"])
    if t == "enum":
        return schema["symbols"][r.read_long()]
    # named-type reference resolved during parse; primitives wrapped in dict
    return _decode(t, r)


# ---------------------------------------------------------------------------
# Binary encoding primitives
# ---------------------------------------------------------------------------


def _zigzag_encode(v: int) -> bytes:
    u = (v << 1) ^ (v >> 63) if v < 0 else v << 1
    u &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            break
    return bytes(out)


def _encode(schema: Any, v: Any, out: bytearray) -> None:
    if isinstance(schema, str):
        t = schema
        if t == "null":
            return
        if t == "boolean":
            out += b"\x01" if v else b"\x00"
        elif t in ("int", "long"):
            out += _zigzag_encode(int(v))
        elif t == "float":
            out += struct.pack("<f", float(v))
        elif t == "double":
            out += struct.pack("<d", float(v))
        elif t == "bytes":
            out += _zigzag_encode(len(v)) + bytes(v)
        elif t == "string":
            b = v.encode("utf-8")
            out += _zigzag_encode(len(b)) + b
        else:
            raise ValueError(f"avro: unknown primitive {t!r}")
        return
    if isinstance(schema, list):  # union — pick first branch matching None-ness
        if v is None:
            idx = schema.index("null")
            out += _zigzag_encode(idx)
            return
        idx = next(i for i, s in enumerate(schema) if s != "null")
        out += _zigzag_encode(idx)
        _encode(schema[idx], v, out)
        return
    t = schema["type"]
    if t == "record":
        for f in schema["fields"]:
            _encode(f["type"], v.get(f["name"]), out)
    elif t == "array":
        if v:
            out += _zigzag_encode(len(v))
            for item in v:
                _encode(schema["items"], item, out)
        out += _zigzag_encode(0)
    elif t == "map":
        if v:
            out += _zigzag_encode(len(v))
            for k, val in v.items():
                _encode("string", str(k), out)
                _encode(schema["values"], val, out)
        out += _zigzag_encode(0)
    elif t == "fixed":
        assert len(v) == schema["size"]
        out += bytes(v)
    else:
        _encode(t, v, out)


# ---------------------------------------------------------------------------
# Container files
# ---------------------------------------------------------------------------


def _resolve_named(schema: Any, types: dict[str, Any]) -> Any:
    """Inline named-type references so _decode never sees a bare name."""
    if isinstance(schema, str):
        return types.get(schema, schema)
    if isinstance(schema, list):
        return [_resolve_named(s, types) for s in schema]
    if isinstance(schema, dict):
        t = schema.get("type")
        if t in ("record", "error", "fixed", "enum") and "name" in schema:
            types[schema["name"]] = schema
        out = dict(schema)
        if t in ("record", "error"):
            out["fields"] = [
                {**f, "type": _resolve_named(f["type"], types)}
                for f in schema["fields"]
            ]
        elif t == "array":
            out["items"] = _resolve_named(schema["items"], types)
        elif t == "map":
            out["values"] = _resolve_named(schema["values"], types)
        elif isinstance(t, (dict, list)):
            out["type"] = _resolve_named(t, types)
        return out
    return schema


def read_avro_schema(path: str) -> Any:
    """Header-only read → parsed schema JSON (no block decode) — the
    cheap per-file presence probe the scan's partition-column attach
    rule needs.  Reads a bounded PREFIX (headers are schema JSON +
    codec, kilobytes) and falls back to the full file only if the
    header somehow exceeds it — planning over large AVRO data files
    never pulls their byte volume onto the driver."""
    from datafusion_iceberg_spark.iceberg.io import get_io

    io = get_io(path)
    try:
        with io.open_read(path) as fh:
            prefix = fh.read(1 << 20)
    except Exception:
        prefix = io.read_bytes(path)
    for data in (prefix, None):
        if data is None:
            data = io.read_bytes(path)  # header larger than the prefix
        try:
            r = Reader(data)
            if r.read(4) != MAGIC:
                raise ValueError(f"{path}: not an Avro container file")
            meta = _decode({"type": "map", "values": "bytes"}, r)
            return _resolve_named(
                json.loads(meta["avro.schema"].decode("utf-8")), {}
            )
        except ValueError:
            raise
        except Exception:
            if len(data) < (1 << 20):
                raise  # full file was already in hand — a real error
            continue
    raise ValueError(f"{path}: could not parse Avro header")


def read_avro_file(path: str) -> tuple[Any, list[Any]]:
    """Read an Avro container file → (parsed schema JSON, list of records).
    IO routes through the scheme-keyed FileIO registry (io.py) — the
    object-store seam the reference gets from its object_store dependency
    (table.rs:116-126)."""
    from datafusion_iceberg_spark.iceberg.io import get_io

    data = get_io(path).read_bytes(path)
    r = Reader(data)
    if r.read(4) != MAGIC:
        raise ValueError(f"{path}: not an Avro container file")
    meta = _decode({"type": "map", "values": "bytes"}, r)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    schema = _resolve_named(schema, {})
    codec = meta.get("avro.codec", b"null").decode()
    sync = r.read(16)
    records: list[Any] = []
    while not r.at_end():
        n = r.read_long()
        size = r.read_long()
        block = r.read(size)
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec != "null":
            raise ValueError(f"avro codec {codec!r} unsupported")
        br = Reader(block)
        for _ in range(n):
            records.append(_decode(schema, br))
        if r.read(16) != sync:
            raise ValueError(f"{path}: sync marker mismatch")
    return schema, records


def write_avro_file(
    path: str, schema: Any, records: list[Any], extra_meta: dict[str, bytes] | None = None
) -> None:
    """Write an Avro container file (null codec — manifests are small)."""
    out = bytearray()
    out += MAGIC
    meta = {"avro.schema": json.dumps(schema).encode(), "avro.codec": b"null"}
    if extra_meta:
        meta.update(extra_meta)
    _encode({"type": "map", "values": "bytes"}, meta, out)
    sync = os.urandom(16)
    out += sync
    if records:
        block = bytearray()
        for rec in records:
            _encode(schema, rec, block)
        out += _zigzag_encode(len(records))
        out += _zigzag_encode(len(block))
        out += block
        out += sync
    from datafusion_iceberg_spark.iceberg.io import get_io

    get_io(path).write_bytes(path, bytes(out))
