"""Snapshot-based CDC: derive a change log from full snapshots (full-load diff).

The reference tails a live change stream (Mongo `watchStream` /
/root/reference/src/capturer/mongo/mongo.ts:13-41, Cosmos change feed
/root/reference/src/capturer/cosmos/cosmos.ts:23-31). Many real upstreams have
no stream to tail — vendor dumps, JDBC snapshot exports, object-store drops.
The standard CDC answer (Debezium snapshot mode, DMS full-load + CDC handoff)
is re-expressed here Spark-first:

1. **bootstrap** — a full snapshot becomes an all-`insert` change log pinned at
   a seq watermark W (`snapshot_to_changelog(None, snap, seq=W)`);
2. **poll diff** — each subsequent snapshot diffs against the previous one and
   emits `insert` / `update` / `delete` events at a higher watermark;
3. **handoff** — if the upstream later grows a real change stream, the tail
   resumes at seq > W and the lake's monotone MERGE watermark guarantees a
   replayed pre-W event can never beat the bootstrap row.

Events come out in the engine's change-log shape (op/seq + payload), so the
same `LakeTable.merge` / `CDCPipeline` machinery applies them — no second
ingest path.

Scale shape: ONE shuffle. Both snapshots union with a side tag and diff in a
single groupBy via side-restricted conditional max_by — not two reads + a full
outer join (three shuffles). At 100 TB the diff of two
snapshot exports is a single key-partitioned aggregation whose output is
O(changed keys), and everything stays JVM-side (no UDF).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CHANGE_TO_OP = {"added": "insert", "changed": "update", "removed": "delete"}


def snapshot_to_changelog(
    old: DataFrame | None,
    new: DataFrame,
    key_cols: Sequence[str],
    seq: int,
    value_cols: Sequence[str] | None = None,
    op_col: str = "op",
    seq_col: str = "seq",
) -> DataFrame:
    """Change-log events that transform snapshot `old` into snapshot `new`.

    One event per key whose state differs: `insert` (key only in `new`),
    `update` (present in both, any value column differs — NULL-safe),
    `delete` (key only in `old`; payload carries the old values for audit,
    MERGE keeps only the tombstone). `old=None` is the bootstrap full load:
    every `new` row becomes an `insert`.

    `seq` stamps every emitted event (one event per key per poll, so a shared
    seq is unambiguous for LWW); successive polls MUST use increasing seqs and
    the first post-bootstrap tail seq must exceed the bootstrap's. Snapshots
    must be unique per key (they are tables, not logs) — feed a log through
    `lww_dedupe` first if needed.

    Schema evolution: `old` and `new` may disagree on payload columns; the
    union aligns them (`allowMissingColumns`) and a column backfilled between
    polls surfaces as `update` (NULL-safe struct comparison).
    """
    keys = list(key_cols)
    if value_cols is None:
        value_cols = [c for c in new.columns if c not in keys]
        value_cols += [c for c in (old.columns if old is not None else [])
                       if c not in keys and c not in value_cols]
    vals = list(value_cols)
    if old is None:
        return new.select(
            *keys,
            F.lit("insert").alias(op_col),
            F.lit(seq).cast("long").alias(seq_col),
            *vals,
        )
    both = (
        old.withColumn("_side", F.lit(0))
        .unionByName(new.withColumn("_side", F.lit(1)), allowMissingColumns=True)
    )
    # side-RESTRICTED images (max_by skips rows whose ordering expr is NULL):
    # operators/delta.snapshot_diff's log-shaped `max_by(img, seq)` would hand
    # an old-only key its OLD image as img_new (snapshots carry no op column
    # to flag the delete), silently swallowing every `removed`.
    img = F.struct(*[F.col(c) for c in vals])
    side = F.col("_side")
    agg = both.groupBy(*keys).agg(
        F.max_by(img, F.when(side == 0, 0)).alias("_old"),
        F.max_by(img, F.when(side == 1, 1)).alias("_new"),
    )
    o, n = F.col("_old"), F.col("_new")
    change = (
        F.when(o.isNull() & n.isNotNull(), "added")
        .when(o.isNotNull() & n.isNull(), "removed")
        .when(~o.eqNullSafe(n), "changed")  # both present; NULL-safe compare
    )
    op = F.element_at(
        F.create_map(*[F.lit(x) for kv in _CHANGE_TO_OP.items() for x in kv]),
        F.col("change"),
    )
    return (
        agg.select(*keys, change.alias("change"), o.alias("_old"), n.alias("_new"))
        .filter(F.col("change").isNotNull())  # unchanged keys emit nothing
        .select(
            *keys,
            op.alias(op_col),
            F.lit(seq).cast("long").alias(seq_col),
            *[
                F.when(F.col("change") == "removed", F.col("_old")[c])
                .otherwise(F.col("_new")[c])
                .alias(c)
                for c in vals
            ],
        )
    )
