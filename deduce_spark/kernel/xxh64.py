"""Pure-Python XXH64 matching Spark's ``xxhash64()`` SQL function.

Spark's XxHash64 expression (sql/catalyst XXH64.java) is standard XXH64
(Cyan4973 spec) over each column's byte representation, chained: the hash
of column i seeds column i+1, starting from seed 42.  Strings hash their
UTF-8 bytes; the result is a SIGNED 64-bit long.

Needed by the golden-fixture generator (``deduce_spark.golden``): surface
ids in the KG pipeline are ``F.xxhash64(surface, type)`` and the sequential
reference implementation must reproduce them bit-exactly without a JVM.
Validated against Spark in tests/unit/test_xxh64.py.
"""

from __future__ import annotations

import struct

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_MASK = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def _round(acc: int, lane: int) -> int:
    acc = (acc + lane * _P2) & _MASK
    return (_rotl(acc, 31) * _P1) & _MASK


def _merge_round(h: int, v: int) -> int:
    h ^= _round(0, v)
    return (h * _P1 + _P4) & _MASK


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _MASK
    h ^= h >> 29
    h = (h * _P3) & _MASK
    h ^= h >> 32
    return h


def xxh64(data: bytes, seed: int) -> int:
    """Unsigned XXH64 of ``data`` with ``seed`` (little-endian lanes)."""
    seed &= _MASK
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _MASK
        v2 = (seed + _P2) & _MASK
        v3 = seed
        v4 = (seed - _P1) & _MASK
        while i <= n - 32:
            l1, l2, l3, l4 = struct.unpack_from("<QQQQ", data, i)
            v1 = _round(v1, l1)
            v2 = _round(v2, l2)
            v3 = _round(v3, l3)
            v4 = _round(v4, l4)
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _MASK
        for v in (v1, v2, v3, v4):
            h = _merge_round(h, v)
    else:
        h = (seed + _P5) & _MASK
    h = (h + n) & _MASK
    while i + 8 <= n:
        (k,) = struct.unpack_from("<Q", data, i)
        h = (_rotl(h ^ _round(0, k), 27) * _P1 + _P4) & _MASK
        i += 8
    if i + 4 <= n:
        (k4,) = struct.unpack_from("<I", data, i)
        h = (_rotl(h ^ (k4 * _P1) & _MASK, 23) * _P2 + _P3) & _MASK
        i += 4
    while i < n:
        h = (_rotl(h ^ (data[i] * _P5) & _MASK, 11) * _P1) & _MASK
        i += 1
    return _fmix(h)


def spark_xxhash64(*cols: str | bytes | int, seed: int = 42) -> int:
    """Signed long equal to Spark's ``xxhash64(col1, col2, ...)``.

    Strings/bytes hash their bytes; ints hash as 8-byte little-endian
    longs (Spark hashes LongType via hashLong).  Null columns would be
    skipped by Spark — pass only non-null values.
    """
    h = seed & _MASK
    for c in cols:
        if isinstance(c, str):
            h = xxh64(c.encode("utf-8"), h)
        elif isinstance(c, (bytes, bytearray)):
            h = xxh64(bytes(c), h)
        elif isinstance(c, int):
            h = _hash_long(c, h)
        else:  # pragma: no cover
            raise TypeError(f"unsupported column type {type(c)}")
    return h - (1 << 64) if h >= (1 << 63) else h


def _hash_long(value: int, seed: int) -> int:
    """Spark XXH64.hashLong: a single 8-byte lane."""
    h = (seed + _P5 + 8) & _MASK
    h = (_rotl(h ^ _round(0, value & _MASK), 27) * _P1 + _P4) & _MASK
    return _fmix(h)
