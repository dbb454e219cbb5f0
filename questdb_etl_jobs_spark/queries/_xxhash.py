"""Pure-CPython XXH64 — oracle-side mirror of Spark's ``xxhash64``.

Implements the public XXH64 algorithm (Cyan4973/xxHash spec) with Spark's
default seed 42, so Python-computed oracles can verify xxhash64-based
sketches (SimHash, MinHash) exactly instead of falling back to rows-only
checks. Parity with ``F.xxhash64`` is golden-tested in
tests/test_operators.py (empty, short, 8/4/1-byte tails, >32-byte stripe
path).

ORACLE-SIDE ONLY: the engine never hashes in Python — this exists so the
differential gate can recompute what the JVM did.
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def xxh64(data: bytes, seed: int = 42) -> int:
    """Unsigned XXH64 of ``data`` (Spark's default seed 42)."""
    n = len(data)
    i = 0
    if n >= 32:
        v = [
            (seed + _P1 + _P2) & _M,
            (seed + _P2) & _M,
            seed & _M,
            (seed - _P1) & _M,
        ]
        while i + 32 <= n:
            for lane in range(4):
                word = int.from_bytes(data[i + 8 * lane : i + 8 * lane + 8], "little")
                acc = (v[lane] + word * _P2) & _M
                v[lane] = (_rotl(acc, 31) * _P1) & _M
            i += 32
        h = (_rotl(v[0], 1) + _rotl(v[1], 7) + _rotl(v[2], 12) + _rotl(v[3], 18)) & _M
        for acc in v:
            acc = (acc * _P2) & _M
            acc = (_rotl(acc, 31) * _P1) & _M
            h ^= acc
            h = (h * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        word = int.from_bytes(data[i : i + 8], "little")
        k = (_rotl((word * _P2) & _M, 31) * _P1) & _M
        h ^= k
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def xxh64_signed(data: bytes, seed: int = 42) -> int:
    """Two's-complement view, matching Spark's LongType output."""
    h = xxh64(data, seed)
    return h - (1 << 64) if h >= (1 << 63) else h


def simhash_bits_py(text: str, n_bits: int = 64) -> list[int]:
    """CPython mirror of operators.dedup.simhash_bits."""
    votes = [0] * n_bits
    for token in text.split(" "):
        h = xxh64(token.encode())
        for j in range(n_bits):
            votes[j] += 1 if (h >> j) & 1 else -1
    return [1 if v > 0 else 0 for v in votes]
