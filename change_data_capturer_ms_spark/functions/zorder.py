"""Z-order (Morton) interleaved clustering expression.

Linear `sort_cols` clustering (Iceberg SORT rewrite) gives the FIRST sort
column tight parquet row-group stats and every later column almost none. A
Z-order curve interleaves the bits of several columns so that rows close in
z-value are close in EVERY participating dimension — each column keeps
roughly `bits / n_cols` bits of clustering resolution, which is what makes
multi-dimensional min/max pruning (row-group skipping, zone maps) effective
for more than one predicate column (Iceberg's rewrite_data_files
strategy=>'zorder' re-expressed; Morton 1966).

Everything here is a pure Catalyst expression tree (shift/and/or over longs
— whole-stage codegen, no UDF): ~`bits * n_cols` bitwise terms, constant per
row. Column domains are normalised to unsigned `bits`-bit ints:

- numeric / date / timestamp: min-max scaled with bounds from ONE bounded
  pre-aggregation (2 values per column collected to the driver);
- strings: locality comes from the leading characters — the first
  `bits // 8` codepoints (capped at 255) are packed big-endian, preserving
  lexicographic-prefix order without any data-dependent statistics.

Skewed numeric distributions degrade resolution (min-max scaling, not
quantiles) but never correctness: the z-value is only a SORT key, every row
keeps its data. Quantile-based ranking would need a global window sort —
an extra full shuffle a maintenance rewrite shouldn't pay.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_NUMERIC_KINDS = ("tinyint", "smallint", "int", "bigint", "float", "double",
                  "decimal", "date", "timestamp")


def _scaled(df: DataFrame, col: str, bits: int,
            stats: dict[str, tuple[float, float]]) -> Column:
    """Normalise `col` to an unsigned `bits`-bit long."""
    top = (1 << bits) - 1
    kind = dict(df.dtypes)[col]
    if kind == "string":
        n_chars = max(1, bits // 8)
        packed = F.lit(0).cast("long")
        for i in range(1, n_chars + 1):
            cp = F.least(F.coalesce(F.ascii(F.substring(F.col(col), i, 1)),
                                    F.lit(0)), F.lit(255))
            packed = F.shiftleft(packed, 8) + cp.cast("long")
        return packed
    if not any(kind.startswith(k) for k in _NUMERIC_KINDS):
        raise ValueError(f"zorder: unsupported column type {col}:{kind}")
    lo, hi = stats[col]
    span = (hi - lo) or 1.0
    v = F.coalesce(F.col(col).cast("double"), F.lit(lo))
    return F.least(
        F.greatest(((v - F.lit(lo)) / F.lit(span) * F.lit(float(top)))
                   .cast("long"), F.lit(0)),
        F.lit(top),
    )


def zorder_key(df: DataFrame, cols: Sequence[str], bits: int = 16) -> Column:
    """The Morton interleave of `cols` as a single long sort key.

    Runs one bounded min/max aggregation over the numeric columns (the only
    job this launches; strings need no stats). `bits` per column; total key
    width `bits * len(cols)` must fit a long (≤ 63)."""
    cols = list(cols)
    if not cols:
        raise ValueError("zorder: need at least one column")
    if bits * len(cols) > 63:
        raise ValueError(f"zorder: {bits} bits x {len(cols)} cols exceeds a long")
    kinds = dict(df.dtypes)
    for c in cols:
        if kinds[c] != "string" and not any(
            kinds[c].startswith(k) for k in _NUMERIC_KINDS
        ):
            raise ValueError(f"zorder: unsupported column type {c}:{kinds[c]}")
    numeric = [c for c in cols if kinds[c] != "string"]
    stats: dict[str, tuple[float, float]] = {}
    if numeric:
        row = df.agg(*[f(F.col(c).cast("double")).alias(f"{n}_{c}")
                       for c in numeric
                       for n, f in (("lo", F.min), ("hi", F.max))]).first()
        for c in numeric:
            lo = row[f"lo_{c}"]
            hi = row[f"hi_{c}"]
            stats[c] = (0.0, 1.0) if lo is None else (float(lo), float(hi))
    scaled = [_scaled(df, c, bits, stats) for c in cols]
    z = F.lit(0).cast("long")
    # MSB-first interleave: bit (bits-1) of every column, then bit (bits-2)...
    for b in range(bits - 1, -1, -1):
        for s in scaled:
            z = F.shiftleft(z, 1) + F.shiftright(s, b).bitwiseAND(F.lit(1))
    return z
