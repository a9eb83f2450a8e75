"""Driver-side twin of Spark's `xxhash64` expression (pure Python).

Spark's XxHash64 expression hashes each non-null column in order, seeding with
42 and chaining the running hash as the seed for the next column; longs go
through the 8-byte fast path, ints through the 4-byte path, strings through the
streaming XXH64 body over their UTF-8 bytes (the algorithm is the public XXH64
spec as specialized in Apache Spark's XXH64 implementation).

Why it exists: `LakeTable.lookup()` must map a key to its bucket
(`pmod(xxhash64(*keys), n_buckets)`) WITHOUT launching a Spark job — a point
lookup that pays a job submission just to evaluate a hash is a latency
anti-pattern (VERDICT r1). Parity with the JVM expression is asserted in
tests/test_functions.py against F.xxhash64 for every supported type and for
multi-column chaining.
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


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def hash_long(value: int, seed: int) -> int:
    h = (seed + _P5 + 8) & _M
    k1 = _rotl((value & _M) * _P2 & _M, 31) * _P1 & _M
    h ^= k1
    h = (_rotl(h, 27) * _P1 + _P4) & _M
    return _fmix(h)


def hash_int(value: int, seed: int) -> int:
    h = (seed + _P5 + 4) & _M
    h ^= ((value & 0xFFFFFFFF) * _P1) & _M
    h = (_rotl(h, 23) * _P2 + _P3) & _M
    return _fmix(h)


def hash_bytes(data: bytes, seed: int) -> int:
    n = len(data)
    off = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while off <= n - 32:
            for i, v in enumerate((v1, v2, v3, v4)):
                k = int.from_bytes(data[off + i * 8: off + i * 8 + 8], "little")
                v = _rotl((v + k * _P2) & _M, 31) * _P1 & _M
                if i == 0:
                    v1 = v
                elif i == 1:
                    v2 = v
                elif i == 2:
                    v3 = v
                else:
                    v4 = v
            off += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h ^= _rotl((v * _P2) & _M, 31) * _P1 & _M
            h = (h * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while off <= n - 8:
        k1 = int.from_bytes(data[off: off + 8], "little")
        h ^= _rotl((k1 * _P2) & _M, 31) * _P1 & _M
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        off += 8
    if off <= n - 4:
        h ^= (int.from_bytes(data[off: off + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        off += 4
    while off < n:
        h ^= (data[off] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        off += 1
    return _fmix(h)


def _to_signed(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


def xxhash64_cols(values: list, types: list[str], seed: int = 42) -> int:
    """Spark-parity xxhash64 over a column tuple (signed 64-bit result).

    `types` are Spark simpleString type names per value ('bigint', 'int',
    'string', 'binary', ...). NULL values are skipped, exactly like the JVM
    expression. Unsupported types raise (callers fall back to a Spark job).
    """
    h = seed & _M
    for v, t in zip(values, types):
        if v is None:
            continue
        if t in ("bigint", "long"):
            h = hash_long(int(v), h)
        elif t in ("int", "integer"):
            h = hash_int(int(v), h)
        elif t == "string":
            h = hash_bytes(str(v).encode("utf-8"), h)
        elif t == "binary":
            h = hash_bytes(bytes(v), h)
        else:
            raise TypeError(f"driver-side xxhash64 unsupported for type {t}")
    return _to_signed(h)
