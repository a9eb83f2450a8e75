"""Incremental view maintenance: maintained aggregate ≡ full recompute."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from change_data_capturer_ms_spark.operators import (
    agg_deltas_from_diff,
    agg_state,
    apply_agg_deltas,
    lww_dedupe,
    snapshot_diff,
)


def _log(spark):
    # keyed change log: (key, seq, grp, val, op). Covers insert, in-group
    # update, GROUP-MIGRATING update, delete, re-insert after delete.
    rows = [
        # key, seq, grp, val, op
        (1, 1, "a", 10.0, "insert"),
        (2, 2, "a", 20.0, "insert"),
        (3, 3, "b", 30.0, "insert"),
        (1, 4, "a", 11.0, "update"),     # in-group value change
        (2, 5, "b", 20.0, "update"),     # group migration a -> b
        (3, 6, "b", None, "delete"),     # delete
        (4, 7, "c", 40.0, "insert"),     # new group appears
        (3, 8, "a", 35.0, "insert"),     # re-insert after delete, new group
        (4, 9, "c", None, "delete"),     # group c vanishes entirely
        (5, 10, "b", 0.25, "insert"),
    ]
    return spark.createDataFrame(
        [Row(key=k, seq=s, grp=g, val=v, op=o) for k, s, g, v, o in rows]
    )


def _recompute(log, w):
    state = lww_dedupe(log.filter(F.col("seq") <= w), keys=["key"], seq_col="seq")
    return agg_state(state.filter(F.col("op") != "delete"), ["grp"], ["val"])


def _norm(df):
    return sorted(
        (r["grp"], r["n_rows"], None if r["val"] is None else float(r["val"]))
        for r in df.collect()
    )


class TestIVM:
    @pytest.mark.parametrize("cuts", [(3, 6, 10), (1, 5, 8, 10), (10,)])
    def test_maintenance_equals_recompute_at_every_cut(self, spark, cuts):
        log = _log(spark)
        state = _recompute(log, 0).limit(0)  # empty initial state
        prev = 0
        for w in cuts:
            diff = snapshot_diff(
                log, keys=["key"], seq_col="seq",
                value_cols=["grp", "val"], seq_old=prev, seq_new=w,
                op_col="op",
            )
            deltas = agg_deltas_from_diff(diff, ["grp"], ["val"])
            state = apply_agg_deltas(state, deltas, ["grp"], ["val"])
            assert _norm(state) == _norm(_recompute(log, w)), f"cut {w}"
            prev = w

    def test_zero_count_group_vanishes(self, spark):
        log = _log(spark)
        # at w=9 group c has been created (seq 7) and fully deleted (seq 9)
        final = _recompute(log, 9)
        assert "c" not in {r["grp"] for r in final.collect()}
        diff = snapshot_diff(log, keys=["key"], seq_col="seq",
                             value_cols=["grp", "val"], seq_old=0, seq_new=9,
                             op_col="op")
        deltas = agg_deltas_from_diff(diff, ["grp"], ["val"])
        state = apply_agg_deltas(final.limit(0), deltas, ["grp"], ["val"])
        assert "c" not in {r["grp"] for r in state.collect()}
        assert _norm(state) == _norm(final)

    def test_empty_diff_is_noop(self, spark):
        log = _log(spark)
        base = _recompute(log, 10)
        diff = snapshot_diff(log, keys=["key"], seq_col="seq",
                             value_cols=["grp", "val"], seq_old=10, seq_new=10,
                             op_col="op")
        assert diff.count() == 0
        state = apply_agg_deltas(base, agg_deltas_from_diff(diff, ["grp"], ["val"]),
                                 ["grp"], ["val"])
        assert _norm(state) == _norm(base)

    def test_apply_plan_is_join_free_single_shuffle(self, spark):
        log = _log(spark)
        base = _recompute(log, 5)
        diff = snapshot_diff(log, keys=["key"], seq_col="seq",
                             value_cols=["grp", "val"], seq_old=5, seq_new=10,
                             op_col="op")
        deltas = agg_deltas_from_diff(diff, ["grp"], ["val"])
        out = apply_agg_deltas(base, deltas, ["grp"], ["val"])
        # maintenance must be O(changed): folding deltas into state is a
        # union + one grouped agg — never a join
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan

    def test_exact_decimal_sums_no_float_drift(self, spark):
        # 0.1 added 10 times in doubles != 1.0; decimal-backed IVM is exact
        rows = [Row(key=i, seq=i, grp="g", val=0.1, op="insert") for i in range(1, 11)]
        log = spark.createDataFrame(rows)
        diff = snapshot_diff(log, keys=["key"], seq_col="seq",
                             value_cols=["grp", "val"], seq_old=0, seq_new=10,
                             op_col="op")
        deltas = agg_deltas_from_diff(diff, ["grp"], ["val"])
        state = apply_agg_deltas(_recompute(log, 0).limit(0), deltas, ["grp"], ["val"])
        r = state.collect()[0]
        assert float(r["val"]) == 1.0 and r["n_rows"] == 10


class TestDistinctIVM:
    """COUNT(DISTINCT) maintenance: exact value-level path and HLL path."""

    def test_exact_distinct_equals_recompute_at_every_cut(self, spark):
        from change_data_capturer_ms_spark.operators import distinct_counts

        log = _log(spark)
        # value-level state: plain COUNT maintenance grouped by (grp, val).
        # empty init via range(0)+casts — createDataFrame([], schema) plants
        # a codegen-breaking ExistingRDD node (see lake/table.py read())
        empty = spark.range(0).select(
            F.lit("x").alias("grp"), F.lit(0.0).alias("val"))
        state = agg_state(empty, ["grp", "val"])
        prev = 0
        for w in (3, 6, 10):
            diff = snapshot_diff(log, keys=["key"], seq_col="seq",
                                 value_cols=["grp", "val"], seq_old=prev,
                                 seq_new=w, op_col="op")
            deltas = agg_deltas_from_diff(diff, ["grp", "val"])
            state = apply_agg_deltas(state, deltas, ["grp", "val"])
            got = sorted((r["grp"], r["n_distinct"])
                         for r in distinct_counts(state, ["grp"]).collect())
            live = lww_dedupe(log.filter(F.col("seq") <= w), keys=["key"],
                              seq_col="seq").filter(F.col("op") != "delete")
            want = sorted(
                (r["grp"], r["nd"]) for r in
                live.groupBy("grp").agg(
                    F.countDistinct("val").alias("nd")).collect())
            assert got == want, f"cut {w}"
            prev = w

    def test_hll_maintenance_matches_direct_sketch(self, spark):
        from change_data_capturer_ms_spark.operators import (
            apply_hll_deltas, hll_deltas_from_diff, hll_estimates, hll_state)

        # append-only feed: 3 groups x overlapping values across two batches
        rows = [Row(key=i, seq=i, grp=f"g{i % 3}", val=f"v{i % 40}", op="insert")
                for i in range(1, 121)]
        log = spark.createDataFrame(rows)
        b1, b2 = log.filter(F.col("seq") <= 60), log.filter(F.col("seq") > 60)

        state = hll_state(b1, ["grp"], "val")
        diff = snapshot_diff(log, keys=["key"], seq_col="seq",
                             value_cols=["grp", "val"], seq_old=60, seq_new=120,
                             op_col="op")
        state = apply_hll_deltas(
            state, hll_deltas_from_diff(diff, ["grp"], "val"), ["grp"])
        got = {r["grp"]: r["n_distinct_approx"]
               for r in hll_estimates(state, ["grp"]).collect()}
        # direct sketch over the full feed — merge must be lossless
        want = {r["grp"]: r["n_distinct_approx"]
                for r in hll_estimates(hll_state(log, ["grp"], "val"),
                                       ["grp"]).collect()}
        assert got == want
        # and at this tiny cardinality the HLL estimate is exact
        exact = {r["grp"]: r["nd"] for r in log.groupBy("grp").agg(
            F.countDistinct("val").alias("nd")).collect()}
        assert got == exact

    def test_hll_refuses_mutable_feed(self, spark):
        from change_data_capturer_ms_spark.operators import hll_deltas_from_diff

        log = _log(spark)
        # seq (4, 10]: in-place updates and a delete -> retractions present
        # (a 0-based window would net every delete out into plain 'added')
        diff = snapshot_diff(log, keys=["key"], seq_col="seq",
                             value_cols=["grp", "val"], seq_old=4, seq_new=10,
                             op_col="op")
        with pytest.raises(ValueError, match="cannot retract"):
            hll_deltas_from_diff(diff, ["grp"], "val")
