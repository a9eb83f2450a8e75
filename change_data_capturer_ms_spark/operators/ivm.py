"""Incremental view maintenance (IVM): keep a downstream aggregate in sync
with the change feed WITHOUT recomputing it from the full table.

The canonical consumer of a CDC engine is a materialized aggregate ("orders
per status", "bytes per repo") that must track the upstream table. The naive
maintenance plan recomputes `groupBy(g).agg(...)` over the whole snapshot on
every micro-batch — O(table) per batch, the thing a 100 TB deployment cannot
afford. IVM makes it O(changed): a keyed change feed (`snapshot_diff` output,
or `LakeTable.snapshot_diff` between committed versions) is turned into
retract/insert contributions per group, aggregated into per-group deltas, and
folded into the previous aggregate state.

Supported measures are the self-maintainable ones (no per-group re-scan ever
needed): COUNT(*) and SUM(x). AVG is derived (sum/count) by the caller;
MIN/MAX are deliberately NOT offered — a retraction of the current extremum
requires re-reading the group, which silently reintroduces the O(table) cost
this module exists to avoid (classic IVM literature: Gupta & Mumick,
"Maintenance of Materialized Views: Problems, Techniques, and Applications").
COUNT(DISTINCT x) is offered two ways (see the distinct section below):
exactly, via self-maintainable value-level counts, or approximately for
append-only feeds via mergeable Datasketches HLL sketches.

Reference tie-in: the reference only captures+forwards events
(/root/reference/src/capturer/mongo/mongo.ts:13-41); this is the first-class
read-side consumer the north rule's lake layer enables (SURVEY.md §2.2
extras).

Scale shape:
- `agg_deltas_from_diff`: ONE pass over the diff (posexplode of a 2-element
  retract/insert array — no self-union, the diff is never scanned twice) and
  ONE groupBy on the group columns. The diff itself is O(changed keys), so
  the whole maintenance job is O(changed), independent of table size.
- `apply_agg_deltas`: union(prev_state, deltas) → ONE groupBy(group) —
  the same union+single-agg shape as the lake MERGE (lake/table.py), one
  shuffle, no join. Groups whose count reaches zero vanish (a group is live
  iff it has live rows), so repeated maintenance never accretes dead rows.

A group-changing update (key moves from group A to group B) is handled with
no special case: the retract contribution targets A, the insert contribution
targets B.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: column name for the maintained COUNT(*) measure
COUNT_COL = "n_rows"

# Sums are carried as DECIMAL so that incremental accumulation is EXACT:
# with doubles, (a+b)+c != a+(b+c), and the maintained sum would drift from
# a recompute by float-addition order — a hash-level correctness failure.
_DEC = "decimal(28,6)"


def agg_deltas_from_diff(
    diff: DataFrame,
    group_cols: Sequence[str],
    sum_cols: Sequence[str] = (),
) -> DataFrame:
    """Per-group (delta_count, delta_sum...) from a `snapshot_diff`-shaped feed.

    `diff` must carry `change` in ('added','changed','removed') plus
    `old_<c>` / `new_<c>` for every column in `group_cols` and `sum_cols`
    (exactly what `operators.delta.snapshot_diff` and
    `LakeTable.snapshot_diff` emit). Returns one row per touched group:
    `group_cols..., n_rows (bigint), <s> (decimal) ...` — each the NET change.
    """
    old_live = F.col("change").isin("changed", "removed")
    new_live = F.col("change").isin("changed", "added")

    def contrib(side: str, sign: int):
        live = old_live if side == "old" else new_live
        return F.when(
            live,
            F.struct(
                *[F.col(f"{side}_{g}").alias(g) for g in group_cols],
                F.lit(sign).cast("long").alias(COUNT_COL),
                *[
                    (F.lit(sign) * F.coalesce(F.col(f"{side}_{s}").cast(_DEC),
                                              F.lit(0).cast(_DEC))).alias(s)
                    for s in sum_cols
                ],
            ),
        )

    # one pass: each diff row fans out to <=2 contribution structs (retract
    # from the old group, insert into the new group); nulls drop pre-shuffle
    exploded = diff.select(
        F.explode(F.array(contrib("old", -1), contrib("new", +1))).alias("c")
    ).filter(F.col("c").isNotNull()).select("c.*")
    return exploded.groupBy(*group_cols).agg(
        F.sum(COUNT_COL).alias(COUNT_COL),
        *[F.sum(s).cast(_DEC).alias(s) for s in sum_cols],
    )


def apply_agg_deltas(
    state: DataFrame,
    deltas: DataFrame,
    group_cols: Sequence[str],
    sum_cols: Sequence[str] = (),
) -> DataFrame:
    """Fold per-group deltas into the previous aggregate state.

    `state` and `deltas` share the schema `group_cols..., n_rows, sum_cols...`
    (an empty/initial state is fine — pass `state.limit(0)` or a frame built
    by `agg_deltas_from_diff` on the first diff). One union + one groupBy,
    no join; groups whose maintained count reaches 0 are dropped.
    """
    cols = [*group_cols, COUNT_COL, *sum_cols]
    merged = (
        state.select(*cols)
        .unionByName(deltas.select(*cols))
        .groupBy(*group_cols)
        .agg(
            F.sum(COUNT_COL).alias(COUNT_COL),
            *[F.sum(s).cast(_DEC).alias(s) for s in sum_cols],
        )
    )
    return merged.filter(F.col(COUNT_COL) > 0)


def agg_state(
    df: DataFrame,
    group_cols: Sequence[str],
    sum_cols: Sequence[str] = (),
) -> DataFrame:
    """Bootstrap: the full-recompute aggregate in the maintained-state schema
    (count as long, sums as exact decimal). Run once at view creation; every
    later refresh goes through `agg_deltas_from_diff` + `apply_agg_deltas`."""
    return df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias(COUNT_COL),
        *[F.sum(F.col(s).cast(_DEC)).cast(_DEC).alias(s) for s in sum_cols],
    )


# -- COUNT(DISTINCT x) maintenance --------------------------------------------
#
# DISTINCT is not directly self-maintainable: retracting a value requires
# knowing whether other live rows still carry it. Two honest options, chosen
# by feed semantics:
#
# 1. EXACT (handles deletes/updates): keep the state one level finer — per
#    (group, value) live-row counts, which ARE self-maintainable (they're just
#    COUNT(*) grouped by group+value). The distinct count is then a COUNT of
#    state rows per group: `distinct_counts(value_state)`. State is
#    O(live distinct (group, value) pairs) — the information-theoretic floor
#    for exactness under deletion — and each refresh is the same O(changed)
#    union+groupBy as plain COUNT maintenance.
# 2. APPROXIMATE (append-only feeds): HLL sketches union in O(sketch) with no
#    value-level state at all — `hll_state` / `apply_hll_deltas`. Sketches
#    are mergeable but NOT retractable (removing an element from an HLL is
#    undefined), so this path REFUSES diffs containing removals/changes
#    rather than silently under- or over-counting.


def distinct_counts(value_state: DataFrame,
                    group_cols: Sequence[str]) -> DataFrame:
    """COUNT(DISTINCT value) per group from a value-level count state.

    `value_state` is the `apply_agg_deltas` state maintained with
    `group_cols + [value_col]` as the grouping — every row is a LIVE
    (group, value) pair, so the distinct count is a row count: one
    aggregation over state that is already O(distinct pairs), never a
    re-scan of the base table.

    NULL note: a live NULL value holds a state row and is counted here;
    SQL's COUNT(DISTINCT) skips NULLs — filter `value IS NOT NULL` rows out
    of the maintained state (or the feed) when SQL semantics are wanted."""
    return value_state.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_distinct"))


HLL_COL = "hll"


def hll_state(df: DataFrame, group_cols: Sequence[str], value_col: str,
              lg_k: int = 12) -> DataFrame:
    """Bootstrap an APPROXIMATE distinct state: one Datasketches HLL sketch
    per group (binary, mergeable). `lg_k=12` ⇒ ~1.6% relative standard error
    at 4 KB per group, constant regardless of cardinality. The sketch hashes
    int/bigint/string/binary values (Spark's hll_sketch_agg contract) — cast
    other types to string first."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias(HLL_COL))


def hll_deltas_from_diff(diff: DataFrame, group_cols: Sequence[str],
                        value_col: str, lg_k: int = 12) -> DataFrame:
    """Per-group HLL sketch of the batch's ADDED values.

    Append-only guard: HLL union cannot retract, so any 'removed' or
    'changed' row in the diff raises ValueError — callers with mutable feeds
    use the exact value-level path instead. The guard is one bounded
    aggregation over the diff (O(changed), same as the maintenance itself).
    """
    n_bad = diff.filter(F.col("change") != "added").limit(1).count()
    if n_bad:
        raise ValueError(
            "hll_deltas_from_diff: diff contains removals/updates — HLL "
            "sketches cannot retract; use the exact value-level state "
            "(agg_deltas_from_diff with group_cols+[value]) for mutable feeds")
    return diff.groupBy(*[F.col(f"new_{g}").alias(g) for g in group_cols]).agg(
        F.hll_sketch_agg(F.col(f"new_{value_col}"), F.lit(lg_k)).alias(HLL_COL))


def apply_hll_deltas(state: DataFrame, deltas: DataFrame,
                     group_cols: Sequence[str]) -> DataFrame:
    """Union per-group sketches into the previous state: one union + one
    groupBy with `hll_union_agg` — O(touched groups × sketch bytes)."""
    cols = [*group_cols, HLL_COL]
    return (
        state.select(*cols)
        .unionByName(deltas.select(*cols))
        .groupBy(*group_cols)
        .agg(F.hll_union_agg(F.col(HLL_COL)).alias(HLL_COL))
    )


def hll_estimates(state: DataFrame, group_cols: Sequence[str]) -> DataFrame:
    """Readout: approximate COUNT(DISTINCT) per group from the sketch state."""
    return state.select(
        *group_cols,
        F.hll_sketch_estimate(F.col(HLL_COL)).alias("n_distinct_approx"))
