"""Distribution drift between two table snapshots (dataset-shift detection).

A CDC-maintained training corpus changes continuously; the question "did this
batch shift the data distribution?" must be answerable WITHOUT exporting the
table. This module compares two snapshots (or any two frames — e.g.
`LakeTable.read(version=v1)` vs `read(version=v2)`) column-wise:

- `histogram`: fixed-bin counts over a numeric column — ONE aggregation,
  width_bucket-style binning, map-side combined; output is `bins + 2` rows
  (underflow bin 0, overflow bin bins+1) regardless of table size.
- `category_freq`: frequencies of a categorical column (one groupBy).
- `psi`: Population Stability Index between the two binned distributions —
  the standard drift score (banking/ML monitoring practice; > 0.2 is the
  conventional "significant shift" threshold). Computed by OUTER-joining the
  two O(bins)-row histograms — the join inputs are tiny aggregates, never
  row-level data, so the whole check is one scan per side + an O(bins) join.

Everything is built-in Catalyst expressions (no UDF); the scan per side
reads ONLY the profiled column (column pruning) and, on a lake table, can be
fed by `read_incremental`/`snapshot_diff` instead of full reads when only
the changed slice matters.

Zero-count smoothing: PSI is undefined when a bin is empty on one side; the
conventional epsilon floor keeps the score finite while preserving ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_EPS = 1e-6


def histogram(df: DataFrame, col: str, bins: int, lo: float, hi: float) -> DataFrame:
    """Fixed-bin histogram: `(bin, n)` with bin 0 = underflow, bins+1 =
    overflow, NULLs excluded. Fixed [lo, hi) bounds (not data-dependent) so
    two snapshots bin identically — comparability is the whole point."""
    if not bins > 0 or not hi > lo:
        raise ValueError("histogram: need bins > 0 and hi > lo")
    # explicit floor arithmetic rather than F.width_bucket: same semantics,
    # but the expression `floor(bins * (v - lo) / (hi - lo)) + 1` evaluates
    # left-to-right in IEEE doubles identically in any engine, so a DuckDB
    # oracle can rederive bins bit-exactly (DuckDB lacks width_bucket)
    v = F.col(col).cast("double")
    bucket = (
        F.when(v < float(lo), F.lit(0))
        .when(v >= float(hi), F.lit(bins + 1))
        .otherwise(
            (F.floor(F.lit(float(bins)) * (v - float(lo)) / F.lit(float(hi) - float(lo)))
             + F.lit(1)).cast("int"))
    )
    return (
        df.filter(F.col(col).isNotNull())
        .select(bucket.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def category_freq(df: DataFrame, col: str) -> DataFrame:
    """Per-category counts `(cat, n)`; NULL kept as its own category (a batch
    that suddenly NULLs a column out IS drift)."""
    return df.groupBy(F.col(col).alias("cat")).agg(F.count(F.lit(1)).alias("n"))


def _psi_from_counts(old: DataFrame, new: DataFrame, key: str) -> DataFrame:
    """PSI over two `(key, n)` count frames: one O(bins) outer join.

    Totals come from an unpartitioned window over the JOINED frame — O(bins)
    rows in one task — not from separate `.agg()` actions, which would
    re-trigger the full underlying scans (one scan per side total)."""
    from pyspark.sql import Window

    joined = (
        old.withColumnRenamed("n", "n_old")
        .join(new.withColumnRenamed("n", "n_new"), on=key, how="full_outer")
        .select(key,
                F.coalesce(F.col("n_old"), F.lit(0)).alias("n_old"),
                F.coalesce(F.col("n_new"), F.lit(0)).alias("n_new"))
    )
    w = Window.partitionBy()
    tot_o = F.greatest(F.sum("n_old").over(w), F.lit(1))
    tot_n = F.greatest(F.sum("n_new").over(w), F.lit(1))
    p = F.greatest(F.col("n_old") / tot_o, F.lit(_EPS))
    q = F.greatest(F.col("n_new") / tot_n, F.lit(_EPS))
    return joined.select(
        key, "n_old", "n_new",
        ((q - p) * F.log(q / p)).alias("psi_term"),
    )


def psi(old: DataFrame, new: DataFrame, col: str, bins: int = 10,
        lo: float | None = None, hi: float | None = None,
        categorical: bool = False) -> float:
    """Population Stability Index of `col` between two frames.

    Numeric: both sides binned on the SAME fixed [lo, hi) grid (required —
    pass bounds, or they are taken from `old`'s min/max in one bounded agg,
    which is fine when `old` is the reference window). Categorical: per-value
    frequencies. Returns the scalar PSI (two scans + an O(bins) join);
    `psi_terms` returns the per-bin breakdown instead."""
    return psi_terms(old, new, col, bins, lo, hi, categorical) \
        .agg(F.sum("psi_term")).first()[0] or 0.0


def psi_from_counts(old: dict, new: dict, eps: float = _EPS) -> float:
    """Pure-Python PSI between two `{category: count}` dicts.

    For drift alerts over per-batch monitor counts ALREADY collected into
    lease metrics (`CDCPipeline(monitor_cols=...)`) — the score costs zero
    Spark jobs because the O(top_k) counts were folded during the batch's
    own planning pass. Same epsilon-floor convention as the DataFrame path."""
    import math

    tot_o = max(sum(old.values()), 1)
    tot_n = max(sum(new.values()), 1)
    s = 0.0
    for k in set(old) | set(new):
        p = max(old.get(k, 0) / tot_o, eps)
        q = max(new.get(k, 0) / tot_n, eps)
        s += (q - p) * math.log(q / p)
    return s


def psi_terms(old: DataFrame, new: DataFrame, col: str, bins: int = 10,
              lo: float | None = None, hi: float | None = None,
              categorical: bool = False) -> DataFrame:
    """Per-bin PSI contributions `(bin|cat, n_old, n_new, psi_term)` — the
    drilldown that says WHICH slice of the distribution moved."""
    if categorical:
        return _psi_from_counts(category_freq(old, col),
                                category_freq(new, col), "cat")
    if lo is None or hi is None:
        row = old.agg(F.min(F.col(col).cast("double")),
                      F.max(F.col(col).cast("double"))).first()
        lo = row[0] if lo is None else lo
        hi = row[1] if hi is None else hi
        if lo is None or hi is None or not hi > lo:
            raise ValueError(
                "psi: reference column is empty/constant — pass explicit lo/hi")
    return _psi_from_counts(histogram(old, col, bins, lo, hi),
                            histogram(new, col, bins, lo, hi), "bin")
