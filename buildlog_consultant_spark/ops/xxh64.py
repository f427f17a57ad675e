"""Pure-Python xxHash64 (XXH64), used only to build independent oracles.

Implements the public XXH64 algorithm (Yann Collet's xxHash, BSD — spec at
github.com/Cyan4973/xxHash/blob/dev/doc/xxhash_spec.md). Spark's
``F.xxhash64(col)`` is XXH64 with seed 42 over the value's byte encoding
(UTF-8 for strings), so this lets a driver-independent Python oracle
recompute e.g. SimHash signatures exactly.
"""

from __future__ import annotations

MASK64 = 0xFFFFFFFFFFFFFFFF
PRIME1 = 0x9E3779B185EBCA87
PRIME2 = 0xC2B2AE3D27D4EB4F
PRIME3 = 0x165667B19E3779F9
PRIME4 = 0x85EBCA77C2B2AE63
PRIME5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & MASK64


def _round(acc: int, lane: int) -> int:
    acc = (acc + lane * PRIME2) & MASK64
    return (_rotl(acc, 31) * PRIME1) & MASK64


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * PRIME1 + PRIME4) & MASK64


def xxh64(data: bytes, seed: int = 42) -> int:
    """XXH64 digest of ``data`` as an unsigned 64-bit int (Spark default
    seed is 42)."""
    n = len(data)
    pos = 0
    if n >= 32:
        v1 = (seed + PRIME1 + PRIME2) & MASK64
        v2 = (seed + PRIME2) & MASK64
        v3 = seed & MASK64
        v4 = (seed - PRIME1) & MASK64
        while pos + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[pos : pos + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[pos + 8 : pos + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[pos + 16 : pos + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[pos + 24 : pos + 32], "little"))
            pos += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & MASK64
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + PRIME5) & MASK64
    h = (h + n) & MASK64
    while pos + 8 <= n:
        k1 = _round(0, int.from_bytes(data[pos : pos + 8], "little"))
        h ^= k1
        h = (_rotl(h, 27) * PRIME1 + PRIME4) & MASK64
        pos += 8
    if pos + 4 <= n:
        h ^= (int.from_bytes(data[pos : pos + 4], "little") * PRIME1) & MASK64
        h = (_rotl(h, 23) * PRIME2 + PRIME3) & MASK64
        pos += 4
    while pos < n:
        h ^= (data[pos] * PRIME5) & MASK64
        h = (_rotl(h, 11) * PRIME1) & MASK64
        pos += 1
    h ^= h >> 33
    h = (h * PRIME2) & MASK64
    h ^= h >> 29
    h = (h * PRIME3) & MASK64
    h ^= h >> 32
    return h


def xxh64_signed(data: bytes, seed: int = 42) -> int:
    """XXH64 as a signed 64-bit int — the value Spark's xxhash64 returns."""
    h = xxh64(data, seed)
    return h - (1 << 64) if h >= (1 << 63) else h
