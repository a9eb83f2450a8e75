"""Multi-source fan-in: several change logs (distinct source_ids) MERGE into
ONE lake table. The exactly-once ledger and batch watermarks are namespaced by
source_id, so each source's redelivery dedupes independently; resume state per
source lives in each pipeline's own streaming checkpoint (the table-level
lease records the last committer, informational). Contract: sources must share
one seq space OR write disjoint key spaces — LWW across sources on the same
key needs a global order (same constraint Debezium/DMS impose on merged
topics)."""

import pytest
from pyspark.sql import functions as F

from change_data_capturer_ms_spark.sources.changelog import gen_changelog, write_changelog
from tests.test_invariants import _pipe, _state


def _two_pipes(spark, tmpdir_path):
    """Two pipelines over two logs, ONE shared table/ckpt-roots split."""
    pipe_a, log_a = _pipe(spark, tmpdir_path, sub="a")
    # pipe B shares A's TABLE but has its own log + checkpoint
    from change_data_capturer_ms_spark.streaming.pipeline import CDCPipeline
    from change_data_capturer_ms_spark.config import EngineConfig

    log_b = f"{tmpdir_path}/b/log"
    pipe_b = CDCPipeline(spark, log_b, pipe_a.table, f"{tmpdir_path}/b/ckpt",
                         source_id="changelog-b", cfg=EngineConfig(n_buckets=8),
                         use_pandas_udfs=False)
    pipe_a.source_id = "changelog-a"
    return pipe_a, log_a, pipe_b, log_b


def test_two_sources_disjoint_keys_converge(spark, tmpdir_path):
    """Source A owns repos 0-7, source B owns 8-15 (disjoint key spaces);
    interleaved drains + a redelivery per source converge to the union."""
    pipe_a, log_a, pipe_b, log_b = _two_pipes(spark, tmpdir_path)
    # disjoint key spaces via distinct seeds then repo renames
    full = gen_changelog(spark, 2000, seed=41, n_repos=8, paths_per_repo=4)
    a_log = full.filter(F.col("seq") < 1000)
    b_log = (full.filter(F.col("seq") >= 1000)
             .withColumn("repo", F.concat(F.lit("bsrc_"), F.col("repo"))))
    write_changelog(a_log, log_a)
    write_changelog(b_log, log_b)

    pipe_a.run_stream()
    pipe_b.run_stream()
    t = pipe_a.table
    n_after = t.read().count()
    assert t.read().filter(F.col("repo").startswith("bsrc_")).count() > 0
    assert t.read().filter(~F.col("repo").startswith("bsrc_")).count() > 0

    # idle re-runs are no-ops for BOTH sources (per-source checkpoints)
    v = t.manifest().version
    pipe_a.run_stream()
    pipe_b.run_stream()
    assert t.read().count() == n_after
    # per-source exactly-once: each source's batch 0 is committed independently
    assert t.is_batch_committed("changelog-a", 0)
    assert t.is_batch_committed("changelog-b", 0)

    # equivalent single-log replay over the union converges to the same state
    ref, log_r = _pipe(spark, tmpdir_path, sub="ref")
    write_changelog(a_log.unionByName(b_log), log_r)
    ref.run_stream()
    s1, s2 = _state(t), _state(ref.table)
    assert list(s1["content_sha256"]) == list(s2["content_sha256"])
    assert list(s1["_last_seq"]) == list(s2["_last_seq"])


def test_redelivery_dedupes_per_source(spark, tmpdir_path):
    """A batch id committed by source A must NOT suppress the same numeric id
    from source B (the ledger key is source-namespaced)."""
    pipe_a, log_a, pipe_b, log_b = _two_pipes(spark, tmpdir_path)
    log = gen_changelog(spark, 500, seed=42, n_repos=6, paths_per_repo=3)
    a_rows = log.filter(F.col("seq") < 250)
    b_rows = (log.filter(F.col("seq") >= 250)
              .withColumn("repo", F.concat(F.lit("bsrc_"), F.col("repo"))))
    r1 = pipe_a.apply_batch(a_rows, batch_id=0)
    assert not r1["skipped"]
    r2 = pipe_b.apply_batch(b_rows, batch_id=0)  # same numeric id, other source
    assert not r2["skipped"], "source-B batch 0 must not be masked by source A"
    s = _state(pipe_a.table)
    r3 = pipe_a.apply_batch(a_rows, batch_id=0)  # true redelivery → no-op
    assert r3["skipped"]
    assert _state(pipe_a.table).equals(s)
