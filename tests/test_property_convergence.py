"""Property-based convergence: for ARBITRARY event logs and ARBITRARY batch
splits (including out-of-order delivery), MERGE-applied state equals the pure
single-pass LWW oracle. This is the engine's core claim (north_star replay
convergence) checked over randomized inputs, not just fixtures."""

import datetime
import os

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from change_data_capturer_ms_spark.config import EngineConfig
from change_data_capturer_ms_spark.lake.table import LakeTable
from change_data_capturer_ms_spark.streaming.pipeline import prepare_batch

OPS = ["insert", "update", "replace", "delete"]


@st.composite
def event_logs(draw):
    n = draw(st.integers(min_value=5, max_value=60))
    n_keys = draw(st.integers(min_value=1, max_value=8))
    rows = []
    for seq in range(n):
        key = draw(st.integers(min_value=0, max_value=n_keys - 1))
        op = draw(st.sampled_from(OPS))
        rows.append((seq, f"t{seq}", op, f"r{key % 3}", f"p{key}",
                     f"c{seq}", "py", None if op == "delete" else f"body-{key}-{seq}",
                     datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=seq),
                     "{}", 0))
    split = draw(st.integers(min_value=0, max_value=n))
    first_half_later = draw(st.booleans())  # out-of-order delivery
    return rows, split, first_half_later


def lww_oracle(rows):
    df = pd.DataFrame(rows, columns=["seq", "token", "op", "repo", "path",
                                     "commit", "lang", "content", "ts", "props",
                                     "seq_bucket"])
    win = df.sort_values("seq").groupby(["repo", "path"], as_index=False).last()
    live = win[win["op"] != "delete"]
    return {(r.repo, r.path, r.seq) for r in live.itertuples()}


@pytest.mark.slow
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(event_logs())
def test_random_log_random_split_converges(spark, tmpdir_factory, case):
    rows, split, first_half_later = case
    base = str(tmpdir_factory.mktemp("prop"))
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("seq", T.LongType()), T.StructField("token", T.StringType()),
        T.StructField("op", T.StringType()), T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()), T.StructField("commit", T.StringType()),
        T.StructField("lang", T.StringType()), T.StructField("content", T.StringType()),
        T.StructField("ts", T.TimestampType()), T.StructField("props", T.StringType()),
        T.StructField("seq_bucket", T.LongType()),
    ])
    df = spark.createDataFrame([tuple(r) for r in rows], schema)
    cfg = EngineConfig(n_buckets=4)
    table = LakeTable(spark, os.path.join(base, "t"), key_cols=["repo", "path"],
                      n_buckets=4)
    batches = [df.filter(f"seq < {split}"), df.filter(f"seq >= {split}")]
    if first_half_later:
        batches.reverse()
    for i, b in enumerate(batches):
        prepared = prepare_batch(b, cfg, use_pandas_udfs=False)
        if not table.exists():
            payload = T.StructType(
                [f for f in prepared.schema.fields if f.name not in ("seq", "op")])
            table.create(payload)
        table.merge(prepared, batch_id=i, tiebreakers=["token"])

    got = {(r["repo"], r["path"], r["_last_seq"]) for r in
           table.read().select("repo", "path", "_last_seq").collect()}
    assert got == lww_oracle(rows)
