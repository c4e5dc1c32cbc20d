"""Portable-format Roaring bitmap codec (64-bit), for Iceberg v3
deletion vectors.

Iceberg's deletion-vector blobs store deleted row positions as a 64-bit
Roaring bitmap in the cross-language "portable" serialization (the
format shared by RoaringBitmap's Java/C/Go implementations, documented
in the RoaringFormatSpec):

- 64-bit layout: ``u64 n_buckets`` little-endian, then for each bucket
  (ascending) ``u32 high`` (the position's upper 32 bits) followed by a
  standard 32-bit roaring bitmap of the lower 32 bits.
- 32-bit layout: this codec READS both flavors (no-run cookie
  ``12346``, run cookie ``12347``) and WRITES whichever is smaller per
  container (spec size rule: run = 2 + 4·n_runs bytes vs array = 2·card
  vs bitmap = 8192) — a contiguous range delete serializes as a handful
  of bytes instead of kilobyte bitmaps.

Everything here derives from the public RoaringFormatSpec; no code is
ported from any implementation.
"""

from __future__ import annotations

import struct

_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE_RUN = 12347
_ARRAY_MAX = 4096  # cardinality above this → bitmap container


def _runs_of(vals: list[int]) -> list[tuple[int, int]]:
    """(start, length-1) runs of a sorted unique u16 list."""
    runs = []
    start = prev = vals[0]
    for v in vals[1:]:
        if v == prev + 1:
            prev = v
            continue
        runs.append((start, prev - start))
        start = prev = v
    runs.append((start, prev - start))
    return runs


def _serialize32(values: list[int]) -> bytes:
    """32-bit roaring: values must be sorted unique u32.  Emits the RUN
    flavor (cookie 12347) when any container is cheaper as runs — a
    contiguous range-delete of 64k positions costs 6 bytes instead of an
    8 KiB bitmap — and the classic no-run flavor otherwise (format
    choice per the RoaringFormatSpec size rule: run = 2 + 4·n_runs vs
    array = 2·card vs bitmap = 8192)."""
    containers: dict[int, list[int]] = {}
    for v in values:
        containers.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(containers)
    enc = {}  # key -> ("run"|"array"|"bitmap", payload bytes)
    any_run = False
    for k in keys:
        vals = containers[k]
        card = len(vals)
        runs = _runs_of(vals)
        run_cost = 2 + 4 * len(runs)
        plain_cost = 2 * card if card <= _ARRAY_MAX else 8192
        if run_cost < plain_cost:
            any_run = True
            body = struct.pack("<H", len(runs)) + b"".join(
                struct.pack("<HH", s, ln) for s, ln in runs
            )
            enc[k] = ("run", body)
        elif card <= _ARRAY_MAX:
            enc[k] = ("array", struct.pack(f"<{card}H", *vals))
        else:
            bits = bytearray(8192)
            for v in vals:
                bits[v >> 3] |= 1 << (v & 7)
            enc[k] = ("bitmap", bytes(bits))

    n = len(keys)
    out = bytearray()
    if any_run:
        cookie = _SERIAL_COOKIE_RUN | ((n - 1) << 16)
        out += struct.pack("<I", cookie)
        runbits = bytearray((n + 7) // 8)
        for i, k in enumerate(keys):
            if enc[k][0] == "run":
                runbits[i >> 3] |= 1 << (i & 7)
        out += runbits
        for k in keys:
            out += struct.pack("<HH", k, len(containers[k]) - 1)
        if n >= 4:  # offset header only at/above the spec threshold
            pos = len(out) + 4 * n
            for k in keys:
                out += struct.pack("<I", pos)
                pos += len(enc[k][1])
        for k in keys:
            out += enc[k][1]
        return bytes(out)

    out += struct.pack("<II", _SERIAL_COOKIE_NO_RUN, n)
    for k in keys:
        out += struct.pack("<HH", k, len(containers[k]) - 1)
    # offset header (always present in the no-run flavor)
    header = 8 + 4 * n + 4 * n
    pos = header
    for k in keys:
        out += struct.pack("<I", pos)
        pos += len(enc[k][1])
    for k in keys:
        out += enc[k][1]
    return bytes(out)


def _deserialize32(buf: bytes, pos: int) -> tuple[list[int], int]:
    """Decode one 32-bit roaring bitmap at ``pos``; returns (values,
    next_pos).  Handles both run (12347) and no-run (12346) cookies."""
    (cookie,) = struct.unpack_from("<I", buf, pos)
    has_run = (cookie & 0xFFFF) == _SERIAL_COOKIE_RUN
    if has_run:
        n = ((cookie >> 16) & 0xFFFF) + 1
        pos += 4
        runbits = buf[pos : pos + (n + 7) // 8]
        pos += (n + 7) // 8
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        (n,) = struct.unpack_from("<I", buf, pos + 4)
        pos += 8
        runbits = b""
    else:
        raise ValueError(f"roaring: unknown cookie {cookie}")
    keys_cards = [
        struct.unpack_from("<HH", buf, pos + 4 * i) for i in range(n)
    ]
    pos += 4 * n
    if not has_run or n >= 4:  # offset header present in these cases
        pos += 4 * n
    values: list[int] = []
    for i, (key, card_m1) in enumerate(keys_cards):
        card = card_m1 + 1
        is_run = bool(runbits and (runbits[i >> 3] & (1 << (i & 7))))
        base = key << 16
        if is_run:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            for _ in range(n_runs):
                start, length = struct.unpack_from("<HH", buf, pos)
                pos += 4
                values.extend(base + start + j for j in range(length + 1))
        elif card <= _ARRAY_MAX:
            vals = struct.unpack_from(f"<{card}H", buf, pos)
            pos += 2 * card
            values.extend(base + v for v in vals)
        else:
            bits = buf[pos : pos + 8192]
            pos += 8192
            for byte_i, b in enumerate(bits):
                while b:
                    low = b & (-b)
                    values.append(base + (byte_i << 3) + low.bit_length() - 1)
                    b ^= low
    return values, pos


def serialize_u64(positions: list[int]) -> bytes:
    """Portable 64-bit roaring: sorted-unique positions → bytes."""
    positions = sorted(set(int(p) for p in positions))
    buckets: dict[int, list[int]] = {}
    for p in positions:
        if p < 0 or p > 0xFFFFFFFFFFFFFFFF:
            raise ValueError(f"roaring: position out of u64 range: {p}")
        buckets.setdefault(p >> 32, []).append(p & 0xFFFFFFFF)
    out = bytearray(struct.pack("<Q", len(buckets)))
    for high in sorted(buckets):
        out += struct.pack("<I", high)
        out += _serialize32(buckets[high])
    return bytes(out)


def deserialize_u64(buf: bytes) -> list[int]:
    """Portable 64-bit roaring bytes → sorted positions."""
    (n_buckets,) = struct.unpack_from("<Q", buf, 0)
    pos = 8
    values: list[int] = []
    for _ in range(n_buckets):
        (high,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        lows, pos = _deserialize32(buf, pos)
        base = high << 32
        values.extend(base + v for v in lows)
    return values
