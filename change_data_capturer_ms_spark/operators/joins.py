"""Temporal joins Spark lacks as builtins — as-of join and bucketed range join.

Both are compositions of existing DataFrame operators (SURVEY.md §2.2 E8 — the
"custom operator as composition" tier): no UDFs, no nested-loop joins, shuffle
shapes chosen for 100 TB inputs.

- `asof_join`: for each left row, the latest right row with
  right_ts <= left_ts per key. Planned as union + per-key ordered window with
  `last(..., ignorenulls=True)` — ONE shuffle on the key, no inequality join
  (Spark would otherwise plan BroadcastNestedLoopJoin, quadratic).
- `range_join_bucketed`: left rows within [right_ts - window, right_ts) per
  key. Each side maps to coarse time buckets (the probe side explodes to the
  two candidate buckets); the bucket equi-join bounds candidates, an exact
  predicate refines. Each qualifying pair meets in exactly one bucket, so no
  dedup pass is needed. This is the standard interval-bucketing trick range
  joins use at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    tiebreaker: str | None = None,
) -> DataFrame:
    """Left as-of join: latest right row (by right_ts <= left_ts) per key.

    Equal timestamps match (right visible to a simultaneous left row). Ties
    among right rows at the same timestamp are broken by `tiebreaker`
    (greatest wins) — pass one whenever right_ts is not unique per key, or
    results are nondeterministic.

    Scale: one hash shuffle on `on` + an ordered window. If a single key's
    row count exceeds a partition's working set, pre-split by coarse time
    range and run per-range with boundary carry-over.
    """
    right_cols = right_cols or [c for c in right.columns if c not in on]
    rstruct = F.struct(*[F.col(c) for c in right_cols])
    order_tb = F.col(tiebreaker) if tiebreaker else F.lit(0)

    l = left.withColumn("_t", F.col(left_ts)).withColumn("_src", F.lit(1)) \
            .withColumn("_r", F.lit(None).cast(
                right.select(rstruct.alias("_r")).schema["_r"].dataType)) \
            .withColumn("_tb", F.lit(None).cast("long"))
    r = right.select(
        *on,
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_src"),
        rstruct.alias("_r"),
        order_tb.cast("long").alias("_tb"),
    )
    unioned = l.select(*left.columns, "_t", "_src", "_r", "_tb").unionByName(
        r.select(*on, "_t", "_src", "_r", "_tb"), allowMissingColumns=True
    )
    # right rows sort before left rows at equal _t (asof is <=); among right
    # rows at equal _t the greatest tiebreaker sorts last and wins last()
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_t"), F.col("_src"), F.col("_tb").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn("_match", F.last("_r", ignorenulls=True).over(w))
    out = matched.filter(F.col("_src") == 1).drop("_t", "_src", "_r", "_tb")
    for c in right_cols:
        out = out.withColumn(c, F.col(f"_match.{c}"))
    return out.drop("_match")


def range_join_bucketed(
    probe: DataFrame,
    build: DataFrame,
    on: list[str],
    probe_ts: str,
    build_ts: str,
    window_sec: int,
    bucket_sec: int | None = None,
) -> DataFrame:
    """Pairs where build_ts in [probe_ts - window, probe_ts), bucket-bounded.

    Returns probe rows joined to matching build rows (columns prefixed with
    `b_` on name clashes). bucket_sec defaults to window_sec, giving exactly
    two candidate buckets per probe row.
    """
    bucket_sec = bucket_sec or window_sec
    assert bucket_sec >= window_sec, "bucket must cover the window"

    def _epoch(col):  # works for TIMESTAMP and TIMESTAMP_NTZ alike
        return F.col(col).cast("timestamp").cast("double")

    p_bucket = F.floor(_epoch(probe_ts) / bucket_sec)

    rename = {c: f"b_{c}" for c in build.columns if c in probe.columns and c not in on}
    b = build
    for old, new in rename.items():
        b = b.withColumnRenamed(old, new)
    b_ts = rename.get(build_ts, build_ts)

    b = b.withColumn("_bucket", F.floor(_epoch(b_ts) / bucket_sec))
    p = probe.withColumn("_buckets", F.array(p_bucket - 1, p_bucket)) \
             .withColumn("_bucket", F.explode("_buckets")).drop("_buckets")

    cond = (
        (F.col(b_ts) >= F.col(probe_ts) - F.expr(f"INTERVAL {window_sec} SECOND"))
        & (F.col(b_ts) < F.col(probe_ts))
    )
    return p.join(b, on + ["_bucket"], "inner").filter(cond).drop("_bucket")
