"""Per-file bloom filters for manifest-level equality file skipping.

Zone maps (`FileEntry.col_stats`) prune range predicates, but a point lookup
on a high-cardinality UNSORTED column almost never falls outside a file's
[min, max] — every file "may match" and nothing is skipped. A bloom filter
answers the membership question the zone map can't: "does this file contain
THIS value?" with no false negatives (Bloom 1970; Parquet's column bloom
filters and Iceberg puffin blobs solve the same problem at row-group / file
granularity).

Split of work:

- **Build (Spark, write time)**: one bounded aggregation over the
  just-written files computes, per (bucket, column), the set of bit
  positions — `k` Kirsch-Mitzenmacher double-hash probes
  `(h1 + i*h2) mod m` derived from the JVM `xxhash64` of the value. The
  collected result is ≤ `m` ints per file per column, packed into an
  `m`-bit bitmap stored base64 in the manifest entry.
- **Probe (driver, read time)**: `read_where`/`lookup` recompute the same
  probes from the Spark-parity xxhash64 port (functions/xxh64.py — bit-exact,
  so a set bit on the JVM side is found on the Python side) and drop files
  whose bitmap misses any probe, before any scan task is scheduled.

Sizing: `m` adapts per file to `bits_per_key * rows` (rounded up to a power
of two, clamped) — small files don't bloat the JSON manifest, big files keep
the ~1% false-positive rate of 10 bits/key with k=7. At 100 TB the manifest
moves to Avro (see lake/manifest.py scale note) and the clamp ceiling rises;
the probe math is unchanged.
"""

from __future__ import annotations

import base64

from pyspark.sql import Column
from pyspark.sql import functions as F

from change_data_capturer_ms_spark.functions.xxh64 import xxhash64_cols

BITS_PER_KEY = 10
K_HASHES = 7  # ~0.69 * bits_per_key, the optimal k for that load factor
M_MIN = 1 << 10
M_MAX = 1 << 17

_U64 = (1 << 64) - 1
_U32 = (1 << 32) - 1

# Spark simpleString type names the driver-side probe can hash (must stay in
# lockstep with functions/xxh64.py xxhash64_cols) — a column outside this set
# gets no bloom rather than a filter the reader can't probe.
SUPPORTED_TYPES = ("bigint", "long", "int", "integer", "string", "binary")


def bloom_m(rows: int, bits_per_key: int = BITS_PER_KEY) -> int:
    """Bitmap width for a file of `rows` keys: next power of two, clamped."""
    m = M_MIN
    while m < rows * bits_per_key and m < M_MAX:
        m <<= 1
    return m


def probe_positions(h: int, m: int, k: int = K_HASHES) -> list[int]:
    """Driver-side Kirsch-Mitzenmacher probes for a (possibly signed) xxhash64.

    Mirrors `position_exprs` exactly: unsigned split of the 64-bit hash into
    (low32, high32), probe i = (h1 + i*h2) mod m. No term exceeds 2^35, so
    Python and JVM long arithmetic agree bit-for-bit.
    """
    u = h & _U64
    h1, h2 = u & _U32, u >> 32
    return [(h1 + i * h2) % m for i in range(k)]


def position_exprs(col: str, m: Column | int, k: int = K_HASHES) -> list[Column]:
    """Spark-side probe positions for `col` (NULL value ⇒ NULL positions —
    equality with NULL never matches, so nulls add no bits)."""
    h = F.xxhash64(F.col(col))  # seed 42, same as the driver port default
    h1 = h.bitwiseAND(F.lit(_U32))
    h2 = F.shiftrightunsigned(h, 32)
    m_col = F.lit(m) if isinstance(m, int) else m
    return [
        F.when(F.col(col).isNotNull(), F.pmod(h1 + F.lit(i) * h2, m_col))
        for i in range(k)
    ]


def pack_bits(positions, m: int) -> str:
    """Pack set-bit positions into an m-bit LSB-first bitmap, base64-encoded."""
    buf = bytearray(m // 8)
    for p in positions:
        buf[p >> 3] |= 1 << (p & 7)
    return base64.b64encode(bytes(buf)).decode("ascii")


def might_contain(bloom: dict, h: int) -> bool:
    """Probe a FileEntry bloom entry `{"m": int, "k": int, "b64": str}` with a
    signed xxhash64. False ⇒ the value is definitely absent from the file."""
    bits = base64.b64decode(bloom["b64"])
    for p in probe_positions(h, bloom["m"], bloom["k"]):
        if not bits[p >> 3] & (1 << (p & 7)):
            return False
    return True


def value_hash(value, spark_type: str) -> int | None:
    """Signed xxhash64 of a literal as Spark computes it, or None when the
    type is outside the driver port's support (⇒ no bloom pruning)."""
    if value is None:
        return None  # `col = NULL` matches nothing; pruning is moot
    try:
        return xxhash64_cols([value], [spark_type])
    except TypeError:
        return None
