"""Apache DataSketches compact theta sketches, spec-typed for Iceberg.

The Iceberg spec's standard NDV statistics blob is
``apache-datasketches-theta-v1``: a serialized COMPACT theta sketch over
the column's values, each value converted to bytes with the spec's
single-value serialization (Appendix D) and hashed with
murmur3_x64_128(seed=9001) — so sketches written by different engines
MERGE correctly.  The container has no datasketches/mmh3 library, so this
module implements the public wire format directly:

- :func:`murmur3_x64_128` — the reference algorithm (Austin Appleby's
  public-domain MurmurHash3, x64 128-bit variant), pure Python, verified
  against the published test vectors.
- :func:`single_value_bytes` — Iceberg Appendix-D single-value
  serialization for the primitive types we sketch.
- :func:`serialize_compact` / :func:`deserialize_compact` — the
  datasketches compact-ordered wire layout (SerVer 3, family COMPACT,
  little-endian preamble, sorted u64 entries), the format
  ``theta_sketch_compact()`` readers wrap.

The sketch we BUILD is a deterministic KMV expressed in theta space:
retain the k−1 smallest hashes, theta = the k-th smallest (exact mode
below k distinct).  That is a valid compact theta sketch — every entry
< theta, estimate = retained · 2⁶³ / theta — and unions with sketches
from other engines by the standard min-theta rule, while staying
bit-reproducible (no retained-set dependence on insertion order, unlike
QuickSelect's 2k-buffer rebuilds).

Reference parity anchor: ``statistics.rs:8-49`` (the reference's
manifest-row-count feed this generalizes, at spec level).
"""

from __future__ import annotations

import struct

from typing import Iterable, Optional

_MASK = (1 << 64) - 1
_C1 = 0x87C37B91114253D5
_C2 = 0x4CF5AD432745937F
DEFAULT_SEED = 9001  # datasketches DEFAULT_UPDATE_SEED
LONG_MAX = (1 << 63) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def _fmix(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & _MASK
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & _MASK
    k ^= k >> 33
    return k


def murmur3_x64_128(data: bytes, seed: int = 0) -> tuple:
    """MurmurHash3 x64 128-bit of ``data``; returns (h1, h2) as u64."""
    h1 = seed & _MASK
    h2 = seed & _MASK
    length = len(data)
    nblocks = length // 16
    for i in range(nblocks):
        o = i * 16
        k1 = int.from_bytes(data[o : o + 8], "little")
        k2 = int.from_bytes(data[o + 8 : o + 16], "little")
        k1 = (k1 * _C1) & _MASK
        k1 = _rotl(k1, 31)
        k1 = (k1 * _C2) & _MASK
        h1 ^= k1
        h1 = _rotl(h1, 27)
        h1 = (h1 + h2) & _MASK
        h1 = (h1 * 5 + 0x52DCE729) & _MASK
        k2 = (k2 * _C2) & _MASK
        k2 = _rotl(k2, 33)
        k2 = (k2 * _C1) & _MASK
        h2 ^= k2
        h2 = _rotl(h2, 31)
        h2 = (h2 + h1) & _MASK
        h2 = (h2 * 5 + 0x38495AB5) & _MASK
    tail = data[nblocks * 16 :]
    tl = len(tail)
    if tl > 8:
        k2 = 0
        for i in range(tl - 1, 7, -1):
            k2 = (k2 << 8) | tail[i]
        k2 = (k2 * _C2) & _MASK
        k2 = _rotl(k2, 33)
        k2 = (k2 * _C1) & _MASK
        h2 ^= k2
    if tl > 0:
        k1 = 0
        for i in range(min(tl, 8) - 1, -1, -1):
            k1 = (k1 << 8) | tail[i]
        k1 = (k1 * _C1) & _MASK
        k1 = _rotl(k1, 31)
        k1 = (k1 * _C2) & _MASK
        h1 ^= k1
    h1 ^= length
    h2 ^= length
    h1 = (h1 + h2) & _MASK
    h2 = (h2 + h1) & _MASK
    h1 = _fmix(h1)
    h2 = _fmix(h2)
    h1 = (h1 + h2) & _MASK
    h2 = (h2 + h1) & _MASK
    return h1, h2


def seed_hash(seed: int = DEFAULT_SEED) -> int:
    """datasketches Util.computeSeedHash: low 16 bits of h1 of the seed
    hashed (as one little-endian long) with seed 0; 0 is illegal."""
    sh = murmur3_x64_128(struct.pack("<q", seed), 0)[0] & 0xFFFF
    if sh == 0:
        raise ValueError(f"seed {seed} hashes to the illegal seed-hash 0")
    return sh


def theta_hash(value_bytes: bytes, seed: int = DEFAULT_SEED) -> int:
    """The 63-bit hash a theta sketch retains: h1 >>> 1 (datasketches
    rejects the value 0; callers must skip it)."""
    return murmur3_x64_128(value_bytes, seed)[0] >> 1


def single_value_bytes(value, type_name: str) -> Optional[bytes]:
    """Iceberg single-value serialization (spec Appendix D) for the
    primitive types we sketch; None for SQL NULL (never sketched).
    ``type_name`` is the Spark simpleString (``int``, ``bigint``,
    ``string``, ``double``, ``float``, ``boolean``, ``date``,
    ``timestamp``, ``binary``, ``decimal(p,s)``)."""
    if value is None:
        return None
    t = type_name
    if t == "string":
        return str(value).encode("utf-8")
    if t in ("int", "integer"):
        return struct.pack("<i", int(value))
    if t == "bigint":
        return struct.pack("<q", int(value))
    if t == "double":
        v = float(value)
        if v == 0.0:
            v = 0.0  # -0.0 canonicalizes to +0.0
        return struct.pack("<d", v)
    if t == "float":
        v = float(value)
        if v == 0.0:
            v = 0.0
        return struct.pack("<f", v)
    if t == "boolean":
        return b"\x01" if value else b"\x00"
    if t == "date":
        import datetime

        if isinstance(value, datetime.date):
            days = (value - datetime.date(1970, 1, 1)).days
        else:
            days = int(value)
        return struct.pack("<i", days)
    if t == "timestamp":
        import datetime

        if isinstance(value, datetime.datetime):
            epoch = datetime.datetime(
                1970, 1, 1, tzinfo=value.tzinfo
            )
            micros = int((value - epoch).total_seconds() * 1_000_000)
        else:
            micros = int(value)
        return struct.pack("<q", micros)
    if t == "binary":
        return bytes(value)
    if t.startswith("decimal"):
        from decimal import Decimal

        d = Decimal(value)
        unscaled = int(d.scaleb(-d.as_tuple().exponent))
        n = max(1, (unscaled.bit_length() + 8) // 8)
        return unscaled.to_bytes(n, "big", signed=True)
    raise ValueError(f"theta sketch: unsupported type {type_name}")


# -- compact-ordered wire format (datasketches SerVer 3) ----------------

_FAMILY_COMPACT = 3
_SER_VER = 3
_FLAG_READ_ONLY = 2
_FLAG_EMPTY = 4
_FLAG_COMPACT = 8
_FLAG_ORDERED = 16


def serialize_compact(
    entries: Iterable[int],
    theta_long: int = LONG_MAX,
    lg_nom: int = 8,
    seed: int = DEFAULT_SEED,
) -> bytes:
    """Compact-ordered theta sketch bytes: ``entries`` are retained
    63-bit hashes (sorted ascending on write), ``theta_long`` the
    exclusive retention bound (LONG_MAX = exact mode)."""
    ents = sorted(int(e) for e in entries)
    if any(e <= 0 or e >= theta_long for e in ents):
        raise ValueError("entries must satisfy 0 < entry < theta")
    flags = _FLAG_READ_ONLY | _FLAG_COMPACT | _FLAG_ORDERED
    if not ents and theta_long == LONG_MAX:
        flags |= _FLAG_EMPTY
        pre = struct.pack(
            "<BBBBBBH", 1, _SER_VER, _FAMILY_COMPACT, lg_nom, 0, flags,
            seed_hash(seed),
        )
        return pre
    if theta_long == LONG_MAX:
        pre_longs = 2  # exact mode: theta implied
    else:
        pre_longs = 3
    out = [
        struct.pack(
            "<BBBBBBH", pre_longs, _SER_VER, _FAMILY_COMPACT, lg_nom, 0,
            flags, seed_hash(seed),
        ),
        struct.pack("<iI", len(ents), 0),  # curCount, unused
    ]
    if pre_longs == 3:
        out.append(struct.pack("<q", theta_long))
    out.extend(struct.pack("<Q", e) for e in ents)
    return b"".join(out)


def deserialize_compact(data: bytes, seed: int = DEFAULT_SEED) -> tuple:
    """(entries, theta_long) from compact theta sketch bytes; validates
    the preamble and the seed hash."""
    if len(data) < 8:
        raise ValueError("theta sketch: truncated preamble")
    pre_longs, ser_ver, family, _lg_nom, _lg_arr, flags, sh = struct.unpack(
        "<BBBBBBH", data[:8]
    )
    if ser_ver != _SER_VER:
        raise ValueError(f"theta sketch: serialization version {ser_ver}")
    if family != _FAMILY_COMPACT:
        raise ValueError(f"theta sketch: family {family} is not COMPACT")
    if sh != seed_hash(seed):
        raise ValueError("theta sketch: seed hash mismatch")
    if flags & _FLAG_EMPTY:
        return [], LONG_MAX
    if pre_longs < 2:
        raise ValueError("theta sketch: non-empty needs >= 2 preamble longs")
    cur_count = struct.unpack("<i", data[8:12])[0]
    off = 16
    theta_long = LONG_MAX
    if pre_longs >= 3:
        theta_long = struct.unpack("<q", data[16:24])[0]
        off = 24
    entries = [
        struct.unpack("<Q", data[off + 8 * i : off + 8 * i + 8])[0]
        for i in range(cur_count)
    ]
    return entries, theta_long


def estimate(entries, theta_long: int) -> int:
    """The theta estimator, integer arithmetic: retained / (theta/2⁶³)."""
    if theta_long >= LONG_MAX:
        return len(entries)
    return len(entries) * (1 << 63) // theta_long


def union(sketches: Iterable[tuple]) -> tuple:
    """Union compact sketches by the standard rule: theta = min theta,
    keep distinct entries < theta.  Input/output: (entries, theta)."""
    theta = LONG_MAX
    seen: set = set()
    pairs = list(sketches)
    for _, t in pairs:
        theta = min(theta, t)
    for ents, _ in pairs:
        seen.update(e for e in ents if e < theta)
    return sorted(seen), theta
