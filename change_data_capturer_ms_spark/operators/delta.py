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


def scd2_history(
    df: DataFrame,
    keys: Sequence[str],
    order_cols: Sequence[str | Column],
    version_col: str = "version_num",
) -> DataFrame:
    """Slowly-changing-dimension Type-2 view of a change log.

    Every event opens a version row: `version_num` (1-based per key),
    `valid_to` = the next version's first order column (NULL = open/current),
    `is_current` flag. The consumer-side "history table" a warehouse would
    derive from the reference's forwarded event stream (the reference only
    captures+forwards — /root/reference/src/capturer/mongo/mongo.ts:13-41).

    Scale shape: ONE window shuffle partitioned by the key — identical
    partitioning to LWW dedupe / MERGE, no self-join. At 10^10 events the
    window state per key is O(1) (lead(1) + running count).
    """
    w = Window.partitionBy(*keys).orderBy(*order_cols)
    lead_first = F.lead(order_cols[0]).over(w)
    return (
        df.withColumn(version_col, F.row_number().over(w))
          .withColumn("valid_to", lead_first)
          .withColumn("is_current", lead_first.isNull())
    )


def snapshot_diff(
    df: DataFrame,
    keys: Sequence[str],
    seq_col: str,
    value_cols: Sequence[str],
    seq_old: int,
    seq_new: int,
    op_col: str | None = None,
    delete_op: str = "delete",
) -> DataFrame:
    """Version-to-version change feed: diff the LWW state at `seq_old` vs
    `seq_new`, one row per key that changed, classified added/changed/removed.

    "What changed between checkpoint A and checkpoint B" — the incremental-
    consume question a downstream of the lake asks (lake/table.py
    read_incremental answers it with manifests; this answers it from the raw
    log, e.g. for audit/backfill before any table exists).

    Scale shape: a naive formulation materialises two LWW states and
    full-outer-joins them — three shuffles on the key. This is ONE shuffle:
    a single groupBy(key) computes both states with conditional max_by
    (max_by skips rows where the ordering expr is NULL, so `when(seq <= s,
    seq)` restricts each aggregate to its snapshot without a second pass).
    Rows with seq > seq_new are filtered before the shuffle, and unchanged
    keys are dropped before any downstream consumer sees them.
    """
    img = F.struct(*[F.col(c) for c in ((op_col,) if op_col else ()) + tuple(value_cols)])
    seq = F.col(seq_col)
    agg = (
        df.filter(seq <= F.lit(seq_new))
          .groupBy(*keys)
          .agg(
              F.max_by(img, F.when(seq <= F.lit(seq_old), seq)).alias("img_old"),
              F.max_by(img, seq).alias("img_new"),
          )
    )
    # a snapshot "has" the key only if its last image is not a delete tombstone
    def live(side: str) -> Column:
        col = F.col(side)
        if op_col is None:
            return col.isNotNull()
        return col.isNotNull() & ~col[op_col].eqNullSafe(delete_op)

    old_live, new_live = live("img_old"), live("img_new")
    kind = (
        F.when(~old_live & new_live, "added")
        .when(old_live & ~new_live, "removed")
        .when(old_live & new_live
              & ~F.col("img_old").eqNullSafe(F.col("img_new")), "changed")
    )
    out_vals = [
        F.when(old_live, F.col("img_old")[c]).alias(f"old_{c}") for c in value_cols
    ] + [
        F.when(new_live, F.col("img_new")[c]).alias(f"new_{c}") for c in value_cols
    ]
    return (
        agg.select(*keys, kind.alias("change"), *out_vals)
           .filter(F.col("change").isNotNull())
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
