"""Pure-Python XXH64 matching Spark SQL's `xxhash64` expression.

Implemented from the public xxHash specification (Cyan4973/xxHash) plus
Spark's documented chaining semantics: the expression seeds with 42 and
feeds each argument's hash in as the seed of the next
(`XxHash64` / `XXH64` in Apache Spark, sql/catalyst hash expressions):

  xxhash64(c1, c2, ...) = h_n  where  h_0 = 42,
      h_k = hash_<type>(c_k, seed=h_{k-1})

IntegerType arguments use the 4-byte tail path (`hashInt`), LongType the
8-byte tail path (`hashLong`), StringType the general byte-stream hash
over UTF-8 bytes. All arithmetic is modulo 2^64; results are returned as
SIGNED 64-bit (Spark LongType) values.

This exists so the q19/q20 contract queries (minhash-LSH, simhash) get a
VALUE-level local oracle: DuckDB has no xxhash64, so the driver's SQL
check is rows-only for them, and a wrong band hash or flipped sign bit
would otherwise go unnoticed.
"""

from __future__ import annotations

MASK = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & MASK


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * P2) & MASK
    h ^= h >> 29
    h = (h * P3) & MASK
    h ^= h >> 32
    return h


def hash_int(i: int, seed: int) -> int:
    """4-byte value tail path (Spark IntegerType argument)."""
    h = (seed + P5 + 4) & MASK
    h ^= ((i & 0xFFFFFFFF) * P1) & MASK
    h = (_rotl(h, 23) * P2 + P3) & MASK
    return _fmix(h)


def hash_long(l: int, seed: int) -> int:
    """8-byte value tail path (Spark LongType argument)."""
    h = (seed + P5 + 8) & MASK
    h ^= (_rotl((l & MASK) * P2 & MASK, 31) * P1) & MASK
    h = (_rotl(h, 27) * P1 + P4) & MASK
    return _fmix(h)


def hash_bytes(data: bytes, seed: int) -> int:
    """General byte-stream XXH64 (Spark StringType argument, UTF-8)."""
    n = len(data)
    off = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & MASK
        v2 = (seed + P2) & MASK
        v3 = seed & MASK
        v4 = (seed - P1) & MASK
        while off + 32 <= n:
            for i, v in enumerate((v1, v2, v3, v4)):
                k = int.from_bytes(data[off + 8 * i:off + 8 * i + 8], "little")
                v = (_rotl((v + k * P2) & MASK, 31) * P1) & MASK
                if i == 0:
                    v1 = v
                elif i == 1:
                    v2 = v
                elif i == 2:
                    v3 = v
                else:
                    v4 = v
            off += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & MASK
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * P2) & MASK, 31) * P1) & MASK
            h = (h * P1 + P4) & MASK
    else:
        h = (seed + P5) & MASK
    h = (h + n) & MASK
    while off + 8 <= n:
        k = int.from_bytes(data[off:off + 8], "little")
        h ^= (_rotl((k * P2) & MASK, 31) * P1) & MASK
        h = (_rotl(h, 27) * P1 + P4) & MASK
        off += 8
    if off + 4 <= n:
        k = int.from_bytes(data[off:off + 4], "little")
        h ^= (k * P1) & MASK
        h = (_rotl(h, 23) * P2 + P3) & MASK
        off += 4
    while off < n:
        h ^= (data[off] * P5) & MASK
        h = (_rotl(h, 11) * P1) & MASK
        off += 1
    return _fmix(h)


def _signed(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


def xxhash64(*args: int | str, seed: int = 42) -> int:
    """Spark `F.xxhash64(...)` replica.

    Python ints are hashed with the LongType path unless wrapped in
    Int32(); strs use UTF-8 bytes. Returns a SIGNED 64-bit value.
    """
    h = seed
    for a in args:
        if isinstance(a, Int32):
            h = hash_int(a.value, h)
        elif isinstance(a, str):
            h = hash_bytes(a.encode("utf-8"), h)
        elif isinstance(a, int):
            h = hash_long(a, h)
        else:
            raise TypeError(f"unsupported arg type {type(a)}")
    return _signed(h)


class Int32:
    """Marks an argument as Spark IntegerType (4-byte tail path) — e.g.
    `F.lit(3)` literals, which are ints, not longs, in Spark SQL."""

    __slots__ = ("value",)

    def __init__(self, value: int):
        self.value = value
