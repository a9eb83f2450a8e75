"""Minimum slice (SURVEY.md §7.1): gen log → filter → dedupe → MERGE → sha256 verify
against the pure-pandas oracle."""

import pytest
from pyspark.sql import functions as F

from change_data_capturer_ms_spark.config import EngineConfig
from change_data_capturer_ms_spark.lake.table import LakeTable
from change_data_capturer_ms_spark.sources.changelog import gen_changelog
from change_data_capturer_ms_spark.streaming.pipeline import prepare_batch

from tests.oracle import apply_oracle

N = 5_000


def _final_state(spark, tmpdir_path, use_pandas_udfs, captured_ops):
    log = gen_changelog(spark, N, seed=7, n_repos=20, paths_per_repo=10)
    cfg = EngineConfig(n_buckets=8, captured_ops=captured_ops)
    prepared = prepare_batch(log, cfg, use_pandas_udfs=use_pandas_udfs)
    table = LakeTable(spark, f"{tmpdir_path}/t", key_cols=["repo", "path"], n_buckets=8)
    from pyspark.sql import types as T
    payload = [f for f in prepared.schema.fields if f.name not in ("seq", "op")]
    table.create(T.StructType(payload))
    res = table.merge(prepared, batch_id=0, tiebreakers=["token"])
    assert not res["skipped"]
    return table, log.toPandas()


@pytest.mark.parametrize("use_pandas_udfs", [True, False])
def test_slice_matches_oracle(spark, tmpdir_path, use_pandas_udfs):
    table, log_pd = _final_state(
        spark, tmpdir_path, use_pandas_udfs,
        captured_ops=("insert", "update", "replace", "delete"),
    )
    got = table.read().toPandas()
    want = apply_oracle(log_pd)

    assert len(got) == len(want)
    key = ["repo", "path"]
    got_s = got.sort_values(key).reset_index(drop=True)
    want_s = want.sort_values(key).reset_index(drop=True)
    # the north-star invariant: row-by-row sha256(content) equality
    assert list(got_s["content_sha256"]) == list(want_s["content_sha256"])
    assert list(got_s["_last_seq"]) == list(want_s["_last_seq"])
    assert list(got_s["commit"]) == list(want_s["commit"])


def test_slice_reference_op_filter(spark, tmpdir_path):
    """Reference parity: only insert|update|replace captured — deletes dropped
    (/root/reference/src/capturer/mongo/mongo.ts:23)."""
    table, log_pd = _final_state(
        spark, tmpdir_path, False, captured_ops=("insert", "update", "replace")
    )
    got = table.read().toPandas()
    want = apply_oracle(log_pd, captured_ops=("insert", "update", "replace"))
    assert len(got) == len(want)
    got_s = got.sort_values(["repo", "path"]).reset_index(drop=True)
    want_s = want.sort_values(["repo", "path"]).reset_index(drop=True)
    assert list(got_s["content_sha256"]) == list(want_s["content_sha256"])


def test_merge_is_idempotent(spark, tmpdir_path):
    """E21 exactly-once: re-delivering a committed batch_id is a no-op."""
    table, _ = _final_state(
        spark, tmpdir_path, False,
        captured_ops=("insert", "update", "replace", "delete"),
    )
    v1 = table.manifest().version
    state1 = table.read().orderBy("repo", "path").toPandas()
    log = gen_changelog(spark, N, seed=7, n_repos=20, paths_per_repo=10)
    prepared = prepare_batch(log, EngineConfig(n_buckets=8))
    res = table.merge(prepared, batch_id=0, tiebreakers=["token"])
    assert res["skipped"]
    assert table.manifest().version == v1
    state2 = table.read().orderBy("repo", "path").toPandas()
    assert state1.equals(state2)


def test_incremental_merge_converges(spark, tmpdir_path):
    """Two half-log batches == one full-log batch (replay convergence)."""
    log = gen_changelog(spark, N, seed=11, n_repos=15, paths_per_repo=8)
    cfg = EngineConfig(n_buckets=8)
    half = N // 2

    def build(table_path, batches):
        table = LakeTable(spark, table_path, key_cols=["repo", "path"], n_buckets=8)
        for i, b in enumerate(batches):
            prepared = prepare_batch(b, cfg, use_pandas_udfs=False)
            if not table.exists():
                from pyspark.sql import types as T
                payload = [f for f in prepared.schema.fields if f.name not in ("seq", "op")]
                table.create(T.StructType(payload))
            table.merge(prepared, batch_id=i, tiebreakers=["token"])
        return table.read().orderBy("repo", "path").toPandas()

    single = build(f"{tmpdir_path}/one", [log])
    double = build(
        f"{tmpdir_path}/two",
        [log.filter(F.col("seq") < half), log.filter(F.col("seq") >= half)],
    )
    assert list(single["content_sha256"]) == list(double["content_sha256"])
    assert list(single["_last_seq"]) == list(double["_last_seq"])
