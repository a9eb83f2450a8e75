"""Custom stateful streaming operators — applyInPandasWithState (E18/E22).

The reference's capture loop is stateless per event (its only state is the lease
token, /root/reference/src/capturer/cosmos/cosmos.ts:91-105); the engine adds the
custom-stateful-operator seam Structured Streaming offers for per-key running
state: Arrow-batched grouped state functions, never per-row Python.

`running_key_stats` keeps, per key, a cumulative (event count, max seq, sum of a
value column) across micro-batches — the shape of a per-repo ingest-progress
tracker. State lives in the streaming state store (checkpointed, recovered on
restart); output mode "update" emits one row per key per batch it appeared in.

Scale notes: state is O(distinct keys); keys are hash-partitioned across
executors, and a hot key is ONE group — pair with salted pre-aggregation if a
single key's per-batch row volume dominates. GroupStateTimeout can bound state
lifetime for expirable keys.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_key_stats(
    stream_df: DataFrame,
    keys: list[str],
    seq_col: str = "seq",
    value_col: str | None = None,
) -> DataFrame:
    """Per-key cumulative (n_events, max_seq[, sum_value]) across micro-batches."""
    key_fields = [stream_df.schema[k] for k in keys]
    with_value = value_col is not None
    out_fields = key_fields + [
        T.StructField("n_events", T.LongType()),
        T.StructField("max_seq", T.LongType()),
    ]
    state_fields = [
        T.StructField("n", T.LongType()),
        T.StructField("mx", T.LongType()),
    ]
    if with_value:
        out_fields.append(T.StructField("sum_value", T.DoubleType()))
        state_fields.append(T.StructField("sv", T.DoubleType()))
    out_schema = T.StructType(out_fields)
    state_schema = T.StructType(state_fields)

    def fn(key, pdf_iter, state: GroupState):
        if state.exists:
            prior = state.get
        else:
            prior = (0, -1, 0.0) if with_value else (0, -1)
        n, mx = prior[0], prior[1]
        sv = prior[2] if with_value else 0.0
        for pdf in pdf_iter:
            n += len(pdf)
            if len(pdf):
                mx = max(mx, int(pdf[seq_col].max()))
                if with_value:
                    sv += float(pdf[value_col].sum())
        state.update((n, mx, sv) if with_value else (n, mx))
        row = list(key) + [n, mx] + ([sv] if with_value else [])
        yield pd.DataFrame([row], columns=[f.name for f in out_fields])

    return stream_df.groupBy(*keys).applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )
