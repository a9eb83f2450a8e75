"""Pivot / unpivot (melt) reshape operators.

`pivot_counts` requires an EXPLICIT pivot-value list: `groupBy().pivot(col)`
without values runs a hidden collect-distinct job over the full input to
discover columns — at 100 TB that is an extra full scan, and an unbounded
distinct can blow the 10k-column pivot limit. With the list supplied the plan
is a single hash aggregate (partial + final) over `(row_key)`, conditional
counts per value — one shuffle, fully codegen'd.

`melt` is the inverse: a `stack`-style unpivot implemented with
array+explode — pure projection + generator, no shuffle at all.

Reference anchor: no reshape surface exists in the reference (capture loop
only); this extends the engine's metrics/reporting operators (SURVEY.md §2.2
E9/E10 family).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pivot_counts(df: DataFrame, row_col: str, pivot_col: str,
                 values: Sequence[str]) -> DataFrame:
    """Wide count matrix: one row per `row_col`, one column per pivot value.

    Missing (row, value) combinations yield NULL (Spark pivot-count
    semantics); callers wanting dense zeros coalesce downstream.
    """
    if not values:
        raise ValueError("pivot_counts requires an explicit pivot-value list "
                         "(implicit discovery = a full extra scan at scale)")
    return df.groupBy(row_col).pivot(pivot_col, list(values)).count()


def melt(df: DataFrame, id_cols: Sequence[str], value_cols: Sequence[str],
         var_name: str = "variable", value_name: str = "value",
         drop_nulls: bool = True) -> DataFrame:
    """Unpivot `value_cols` into (var_name, value_name) long format.

    Built as explode(array(struct(name, value)...)) — the DataFrame twin of
    SQL `stack`; generator-only, no shuffle, streams at any scale.
    """
    pairs = F.array(*[
        F.struct(F.lit(c).alias(var_name), F.col(c).alias(value_name))
        for c in value_cols
    ])
    out = (df.select(*id_cols, F.explode(pairs).alias("_kv"))
             .select(*id_cols, f"_kv.{var_name}", f"_kv.{value_name}"))
    if drop_nulls:
        out = out.filter(F.col(value_name).isNotNull())
    return out
