"""Stream-stream interval join (streaming/joins.py): the streaming result over
file streams must equal the batch twin (the oracle), and the time-range bound
is what keeps the join state finite."""

import datetime

from pyspark.sql import functions as F

from change_data_capturer_ms_spark.streaming import stream_interval_join

BASE = datetime.datetime(2026, 1, 1, 12, 0, 0)


def _events(spark):
    rows = [(f"repo_{i % 4}", BASE + datetime.timedelta(minutes=i), i)
            for i in range(40)]
    return spark.createDataFrame(rows, "repo string, ts timestamp, seq long")


def _statuses(spark):
    # one status per repo every ~10 min, offset +5 min from event times;
    # some land inside the [0s, 15m] window of several events, some outside
    rows = [(f"repo_{i % 4}", BASE + datetime.timedelta(minutes=10 * i + 5),
             "ok" if i % 3 else "fail")
            for i in range(12)]
    return spark.createDataFrame(rows, "repo string, ts timestamp, status string")


def test_batch_twin_semantics(spark):
    l, r = _events(spark), _statuses(spark)
    out = stream_interval_join(l, r, ["repo"], watermark=None).collect()
    assert out, "window must capture some pairs"
    for row in out:
        assert row["repo"] is not None
        delta = (row["r_ts"] - row["ts"]).total_seconds()
        assert 0 <= delta <= 15 * 60
    # left_outer keeps every left row at least once
    lo = stream_interval_join(l, r, ["repo"], watermark=None, how="left_outer")
    assert lo.select("seq").distinct().count() == 40
    matched = {row["seq"] for row in out}
    unmatched = {row["seq"] for row in lo.collect() if row["r_ts"] is None}
    assert matched.isdisjoint(unmatched)


def test_streaming_equals_batch(spark, tmpdir_path):
    l, r = _events(spark), _statuses(spark)
    l.write.parquet(f"{tmpdir_path}/l")
    r.write.parquet(f"{tmpdir_path}/r")
    ls = spark.readStream.schema(l.schema).parquet(f"{tmpdir_path}/l")
    rs = spark.readStream.schema(r.schema).parquet(f"{tmpdir_path}/r")
    joined = stream_interval_join(ls, rs, ["repo"], watermark="30 minutes")
    q = (joined.writeStream.format("parquet")
         .option("path", f"{tmpdir_path}/out")
         .option("checkpointLocation", f"{tmpdir_path}/ckpt")
         .trigger(availableNow=True).start())
    q.awaitTermination()
    got = spark.read.parquet(f"{tmpdir_path}/out")
    want = stream_interval_join(l, r, ["repo"], watermark=None)
    cols = ["repo", "seq", "r_status"]
    assert got.select(*cols).exceptAll(want.select(*cols)).count() == 0
    assert want.select(*cols).exceptAll(got.select(*cols)).count() == 0
    # the physical plan carries the event-time range as a join condition —
    # the state-cleanup contract
    plan = joined._jdf.queryExecution().analyzed().toString()
    assert "ts" in plan
