"""Grouped pandas/Arrow UDF operators — the E22 surface (SURVEY.md §2.2).

north_star mandates that custom per-group logic runs as vectorized pandas/Arrow
UDFs, never per-row Python. Two canonical shapes:

- grouped-map (`applyInPandas`): whole-group transform — the engine's seam for
  per-repo normalization / custom flattening. The group key partitions the
  shuffle, so one hot group lands on one Python worker: at cluster scale feed
  this operator through `salted_repartition` (operators/dedupe.py) when group
  cardinality is skewed and the transform is key-separable.
- grouped-agg (`pandas_udf` with groupBy().agg()): custom aggregate over Arrow
  batches with partial aggregation unavailable (Spark ships all group rows) —
  use only for aggregates inexpressible as builtins; builtin twins stay the
  fast path.

Reference parity: the reference's only per-batch hook is the opaque
`ProcessResult` callback (/root/reference/src/factory/types.ts:3-5); these
operators are its typed, distributed re-expression.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def zscore_normalize(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    out_col: str = "zscore",
    id_cols: list[str] | None = None,
) -> DataFrame:
    """Grouped-map applyInPandas: per-group z-score of `value_col`.

    z = (x - mean) / sample_std; groups with fewer than 2 rows or zero variance
    normalize to 0.0 (deterministic, matches the SQL-window oracle).
    """
    id_cols = id_cols or [c for c in df.columns if c not in group_cols + [value_col]]
    out_schema = T.StructType(
        [df.schema[c] for c in group_cols]
        + [df.schema[c] for c in id_cols]
        + [T.StructField(out_col, T.DoubleType(), True)]
    )
    cols = group_cols + id_cols

    def _norm(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf[value_col].astype("float64")
        std = x.std(ddof=1)
        z = (x - x.mean()) / std if pd.notna(std) and std > 0 else x * 0.0
        out = pdf[cols].copy()
        out[out_col] = z
        return out

    return df.groupBy(*group_cols).applyInPandas(_norm, schema=out_schema)


def weighted_mean_agg(value_col: str, weight_col: str):
    """Grouped-agg pandas UDF: sum(v*w)/sum(w) over Arrow batches."""

    @F.pandas_udf("double")
    def _wmean(v: pd.Series, w: pd.Series) -> float:
        wf = w.astype("float64")
        denom = wf.sum()
        return float((v.astype("float64") * wf).sum() / denom) if denom else float("nan")

    return _wmean(F.col(value_col), F.col(weight_col))
