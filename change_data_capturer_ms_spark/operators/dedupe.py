"""Last-writer-wins dedupe by key + skew-defusing salted repartition.

Reference semantics: the lease container is upserted last-writer-wins on `id`
(/root/reference/src/capturer/cosmos/utils.ts:55-62 `items.upsert`); the engine
generalizes that to per-(repo, path) LWW by monotonic seq over the change stream
(SURVEY.md §2.2 E6, E17).

Scale design:
- `lww_dedupe` (default) is an aggregation — `max_by(struct(*), ordering)` — which
  Spark executes as partial_max_by (map-side combine) + final_max_by. On a change log
  with high per-key duplication (the common CDC case) the shuffle carries one row per
  key per map partition instead of every event: this is the operator that makes
  10^10-event batches feasible.
- `lww_dedupe_window` is the row_number()==1 formulation (same result, full shuffle of
  all rows, no partial aggregation) — kept for parity testing and for consumers that
  need losing rows too (rank > 1).
- Ties on seq are broken deterministically by `tiebreakers` (replay convergence
  depends on this, SURVEY.md §7.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _ordering_struct(seq_col: str, tiebreakers: list[str]):
    return F.struct(F.col(seq_col), *[F.col(c) for c in tiebreakers])


def lww_dedupe(
    df: DataFrame,
    keys: list[str],
    seq_col: str = "seq",
    tiebreakers: list[str] | None = None,
) -> DataFrame:
    """Keep, per key, the row with the greatest (seq, *tiebreakers).

    Aggregation form: groupBy(keys).agg(max_by(struct(all_columns), ordering)).
    Partial aggregation happens map-side, so shuffle volume is O(distinct keys per
    partition), not O(rows).
    """
    tiebreakers = tiebreakers or []
    payload = F.struct(*[F.col(c) for c in df.columns])
    winner = F.max_by(payload, _ordering_struct(seq_col, tiebreakers)).alias("_w")
    out = df.groupBy(*[F.col(k) for k in keys]).agg(winner)
    return out.select(*[F.col(f"_w.{c}").alias(c) for c in df.columns])


def lww_dedupe_window(
    df: DataFrame,
    keys: list[str],
    seq_col: str = "seq",
    tiebreakers: list[str] | None = None,
) -> DataFrame:
    """Window-rank formulation of LWW (ROW_NUMBER() OVER (... ORDER BY seq DESC) = 1)."""
    tiebreakers = tiebreakers or []
    order = [F.col(seq_col).desc()] + [F.col(c).desc() for c in tiebreakers]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def lww_dedupe_two_phase(
    df: DataFrame,
    keys: list[str],
    seq_col: str = "seq",
    tiebreakers: list[str] | None = None,
    salt_buckets: int = 16,
) -> DataFrame:
    """LWW dedupe for residual single-hot-key skew (SURVEY.md §2.2 E17).

    When ONE key carries a dominant share of a batch (one file force-pushed
    millions of times), the single-phase aggregation funnels all its rows into
    one reducer. Phase 1 groups by (key, salt) where salt = pmod(seq, S) — a
    pure row function, so results stay exact — reducing the hot key to at most
    S candidates spread over S reducers; phase 2 reduces the S candidates per
    key. Uniform keys pay one extra tiny shuffle (candidates only), so this is
    the opt-in variant; `lww_dedupe` remains the default. Equality with the
    single-phase operator is asserted in tests.
    """
    tiebreakers = tiebreakers or []
    payload = F.struct(*[F.col(c) for c in df.columns])
    order = _ordering_struct(seq_col, tiebreakers)
    salted = df.withColumn("_salt", F.pmod(F.col(seq_col), F.lit(salt_buckets)))
    phase1 = (
        salted.groupBy(*[F.col(k) for k in keys], F.col("_salt"))
        .agg(F.max_by(payload, order).alias("_w"))
        .select(*[F.col(f"_w.{c}").alias(c) for c in df.columns])
    )
    phase2 = (
        phase1.groupBy(*[F.col(k) for k in keys])
        .agg(F.max_by(F.struct(*[F.col(c) for c in df.columns]), order).alias("_w"))
    )
    return phase2.select(*[F.col(f"_w.{c}").alias(c) for c in df.columns])


def streaming_dedupe_within_watermark(
    stream_df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming duplicate suppression bounded by an event-time watermark
    (SURVEY.md §2.2 E19).

    The batch LWW dedupe (above) is exact but needs the whole batch; on an
    unbounded stream, exact dedupe state grows forever. This variant keeps
    per-key state only within the watermark horizon — the right tool for
    at-least-once sources that re-deliver recent events (the reference replays
    the last page after a crash, /root/reference/src/capturer/cosmos/cosmos.ts:91-105).
    Late duplicates beyond the watermark are handled by the idempotent MERGE
    downstream (same key, same seq ⇒ same winner), so end-to-end semantics stay
    exactly-once even when this operator's state has expired.
    """
    return stream_df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def salted_repartition(
    df: DataFrame,
    hot_cols: list[str],
    salt_cols: list[str],
    salt_buckets: int = 8,
    num_partitions: int | None = None,
) -> DataFrame:
    """Repartition by (hot_cols..., salt) where salt = xxhash64(salt_cols) % buckets.

    Defuses hot-key skew (one repo carrying 50% of events, north_rule) while keeping
    correctness: the salt is a *pure function of the full key* (hot_cols + salt_cols),
    never random, so every row of a given (repo, path) lands in the same partition and
    per-key operators (LWW dedupe, grouped-map UDFs) stay exact — the invariant test
    asserts salted == unsalted (SURVEY.md §2.2 E17).

    At cluster scale this is the partitioner for the pandas-UDF transform stage
    (op classification / flattening / hashing) so a hot repo spreads over
    `salt_buckets` executors instead of serializing on one.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(salt_buckets))
    df = df.withColumn("_salt", salt)
    cols = [F.col(c) for c in hot_cols] + [F.col("_salt")]
    out = df.repartition(num_partitions, *cols) if num_partitions else df.repartition(*cols)
    return out.drop("_salt")
