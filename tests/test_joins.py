"""Temporal join operators: as-of and bucketed range join vs tiny hand oracles,
and plan-shape guards (no nested-loop join may appear)."""

import datetime

from pyspark.sql import functions as F

from change_data_capturer_ms_spark.operators.joins import asof_join, range_join_bucketed


def _ts(m):
    return datetime.datetime(2024, 1, 1, 0, m)


def test_asof_join_hand_case(spark):
    left = spark.createDataFrame(
        [(1, "u", _ts(5)), (2, "u", _ts(10)), (3, "u", _ts(2)), (4, "v", _ts(8))],
        "id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u", _ts(3), 100), ("u", _ts(10), 200), ("v", _ts(9), 300)],
        "k string, ts timestamp, val long",
    )
    out = asof_join(left, right, on=["k"], right_cols=["val"], tiebreaker="val")
    got = {r["id"]: r["val"] for r in out.collect()}
    # id1@5 -> val100 (ts3); id2@10 -> val200 (equal ts matches); id3@2 -> none;
    # id4 v@8 -> none (right v is at 9, later)
    assert got == {1: 100, 2: 200, 3: None, 4: None}


def test_asof_equal_ts_tiebreak_is_greatest(spark):
    left = spark.createDataFrame([(1, "u", _ts(5))], "id long, k string, ts timestamp")
    right = spark.createDataFrame(
        [("u", _ts(5), 7), ("u", _ts(5), 9), ("u", _ts(5), 8)],
        "k string, ts timestamp, val long",
    )
    out = asof_join(left, right, on=["k"], right_cols=["val"], tiebreaker="val")
    assert out.first()["val"] == 9


def test_range_join_hand_case(spark):
    probe = spark.createDataFrame(
        [(1, "u", _ts(30)), (2, "u", _ts(59))], "pid long, k string, ts timestamp"
    )
    build = spark.createDataFrame(
        [("u", _ts(10)), ("u", _ts(25)), ("u", _ts(29)), ("u", _ts(30)), ("u", _ts(45))],
        "k string, ts timestamp",
    )
    pairs = range_join_bucketed(probe, build, on=["k"], probe_ts="ts",
                                build_ts="ts", window_sec=1200)  # 20 min
    counts = {r["pid"]: r["n"] for r in
              pairs.groupBy("pid").agg(F.count(F.lit(1)).alias("n")).collect()}
    # pid1 window [10:00, 30:00): builds at 10,25,29 -> 3 (30 excluded, exact bound)
    # pid2 window [39:00, 59:00): build at 45 -> 1
    assert counts == {1: 3, 2: 1}


def test_no_nested_loop_in_plans(spark):
    left = spark.createDataFrame([(1, "u", _ts(5))], "id long, k string, ts timestamp")
    right = spark.createDataFrame([("u", _ts(3), 1)], "k string, ts timestamp, val long")
    a = asof_join(left, right, on=["k"], right_cols=["val"], tiebreaker="val")
    r = range_join_bucketed(left, right.drop("val"), on=["k"], probe_ts="ts",
                            build_ts="ts", window_sec=60)
    for df in (a, r):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "NestedLoop" not in plan and "CartesianProduct" not in plan
