"""Per-key change-delta audit over an ordered change log (lag/lead analytics).

The CDC read side of the engine: given the ordered event log keyed by
(key, seq), compute for every event what actually changed relative to the
previous version of the same key — previous value, numeric delta, and a
change classification (`create` / `update` / `noop`). This is the query a
consumer of the reference's event stream would run to audit it
(the reference itself only captures and forwards events —
/root/reference/src/capturer/mongo/mongo.ts:13-41 — it has no read-side
analytics; SURVEY.md §2.2 extras).

Scale shape: ONE window shuffle partitioned by the key — the same partitioning
the LWW dedupe and MERGE stages already use, so at 100 TB this rides an
existing exchange (AQE reuses the exchange when composed in one plan). No UDF,
no self-join (a naive formulation joins the log to itself on seq-1 — twice the
shuffle for the same answer).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def change_deltas(
    df: DataFrame,
    keys: Sequence[str],
    order_cols: Sequence[str | Column],
    value_col: str,
    change_col: str = "change_kind",
) -> DataFrame:
    """Append prev_value / delta / change-kind columns per key in log order.

    `order_cols` must be a total order within each key (seq, or ts + unique
    tiebreaker) — same determinism contract as LWW dedupe (SURVEY.md §7.3).
    """
    w = Window.partitionBy(*keys).orderBy(*order_cols)
    prev = F.lag(value_col).over(w)
    kind = (
        F.when(prev.isNull(), "create")
        .when(~prev.eqNullSafe(F.col(value_col)), "update")
        .otherwise("noop")
    )
    return (
        df.withColumn("prev_value", prev)
          .withColumn("delta", F.col(value_col) - prev)
          .withColumn(change_col, kind)
    )


def content_change_audit(
    log: DataFrame,
    keys: Sequence[str] = ("repo", "path"),
    seq_col: str = "seq",
    content_col: str = "content",
) -> DataFrame:
    """Change-log audit on the engine's own schema: per key in seq order, flag
    whether the content hash actually changed vs the previous version and how
    the byte size moved. Hash first (sha256 projected BEFORE the window — agg/
    window exprs get no common-subexpression elimination, see CLAUDE.md), then
    one lag window."""
    hashed = log.select(
        *keys, seq_col,
        F.sha2(F.col(content_col), 256).alias("content_sha"),
        F.coalesce(F.length(content_col).cast("long"), F.lit(0)).alias("content_len"),
    )
    w = Window.partitionBy(*keys).orderBy(seq_col)
    prev_sha = F.lag("content_sha").over(w)
    prev_len = F.lag("content_len").over(w)
    # NULL content = delete tombstone post-image (sources/changelog.py writes
    # deletes that way); a non-null content whose previous image was a delete
    # (or absent) is a (re-)create. eqNullSafe everywhere — three-valued logic
    # on sha comparisons would silently misclassify (cf. ADVICE r1 on validate).
    kind = (
        F.when(F.col("content_sha").isNull(), "delete")
        .when(prev_sha.isNull(), "create")
        .when(~prev_sha.eqNullSafe(F.col("content_sha")), "update")
        .otherwise("noop")
    )
    return hashed.select(
        *keys, seq_col, "content_sha",
        kind.alias("change_kind"),
        (F.col("content_len") - F.coalesce(prev_len, F.lit(0))).alias("bytes_delta"),
    )
