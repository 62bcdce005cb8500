"""Pure-Python XXH64 (Collet's public xxHash spec, 64-bit variant).

Spark's ``F.xxhash64(col)`` hashes a string column's UTF-8 bytes with XXH64
at seed 42 (``org.apache.spark.sql.catalyst.expressions.XxHash64``).  This
module reimplements the algorithm from the public specification so the
contract oracle and tests can reproduce Spark-side hash-derived values
(e.g. the multimodal ``kind`` assignment) in a single process, without a
JVM.  Verified against ``F.xxhash64`` for empty/short/long/unicode inputs in
``tests/test_multimodal.py``.
"""

from __future__ import annotations

import struct

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1

SPARK_SEED = 42  # Spark's default seed for xxhash64 expressions


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    return (_rotl((acc + inp * _P2) & _M, 31) * _P1) & _M


def _merge(acc: int, val: int) -> int:
    return ((acc ^ _round(0, val)) * _P1 + _P4) & _M


def xxh64(data: bytes, seed: int = SPARK_SEED) -> int:
    """XXH64 of ``data`` as an unsigned 64-bit int."""
    n = len(data)
    off = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while off + 32 <= n:
            a, b, c, d = struct.unpack_from("<QQQQ", data, off)
            v1, v2, v3, v4 = _round(v1, a), _round(v2, b), _round(v3, c), _round(v4, d)
            off += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        h = _merge(_merge(_merge(_merge(h, v1), v2), v3), v4)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while off + 8 <= n:
        (k,) = struct.unpack_from("<Q", data, off)
        h = (_rotl(h ^ _round(0, k), 27) * _P1 + _P4) & _M
        off += 8
    if off + 4 <= n:
        (k,) = struct.unpack_from("<I", data, off)
        h = (_rotl(h ^ ((k * _P1) & _M), 23) * _P2 + _P3) & _M
        off += 4
    while off < n:
        h = (_rotl(h ^ ((data[off] * _P5) & _M), 11) * _P1) & _M
        off += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def xxh64_signed(data: bytes, seed: int = SPARK_SEED) -> int:
    """XXH64 reinterpreted as a signed Java ``long`` — the value Spark's
    ``F.xxhash64`` column carries."""
    h = xxh64(data, seed)
    return h - (1 << 64) if h >= (1 << 63) else h
