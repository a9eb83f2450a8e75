"""Stream-stream interval join: enrich one change stream with another.

The reference is single-stream (one change feed → one sink), but a real CDC
deployment routinely correlates TWO live feeds — e.g. change events joined to
a slower status/metadata stream (CI results, moderation verdicts) that arrives
within minutes of the event. Structured Streaming supports this natively when
both sides carry watermarks and the join carries an event-time range
constraint: the range bounds how long each side's rows stay in the join state
store, so state is O(watermark window), not O(stream history) — the property
that makes the operator viable on an unbounded 100 TB/day feed.

Plain DataFrame composition: works identically for two static frames (the
batch twin is the test oracle) and for two readStream frames.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    watermark: str | None = "10 minutes",
    lower: str = "0 seconds",
    upper: str = "15 minutes",
    how: str = "inner",
    right_prefix: str = "r_",
) -> DataFrame:
    """Join `left` rows to `right` rows with equal `keys` whose event time
    falls in [left_ts - lower, left_ts + upper].

    - `watermark` applies to BOTH sides (None ⇒ static/batch mode: no
      watermark, same join semantics — the oracle path).
    - Right-side columns come back `right_prefix`-renamed (keys are not
      duplicated), so downstream code never hits ambiguous references.
    - `how`: "inner" or "left_outer" (outer emits left rows with NULL right
      columns once the watermark proves no match can still arrive — Spark's
      state-store contract for outer stream-stream joins).
    """
    if how not in ("inner", "left_outer"):
        raise ValueError(f"how must be 'inner' or 'left_outer', got {how!r}")
    if watermark is not None:
        left = left.withWatermark(left_ts, watermark)
        right = right.withWatermark(right_ts, watermark)
    r_ts = right_prefix + right_ts
    renamed = right.select(
        *[F.col(k).alias(right_prefix + k) for k in keys],
        F.col(right_ts).alias(r_ts),
        *[F.col(c).alias(right_prefix + c)
          for c in right.columns if c not in keys and c != right_ts],
    )
    key_eq = reduce(
        lambda a, b: a & b,
        [F.col(k) == F.col(right_prefix + k) for k in keys],
    )
    in_range = F.col(r_ts).between(
        F.col(left_ts) - F.expr(f"INTERVAL {lower}"),
        F.col(left_ts) + F.expr(f"INTERVAL {upper}"),
    )
    out = left.join(renamed, key_eq & in_range, how)
    return out.drop(*[right_prefix + k for k in keys])
