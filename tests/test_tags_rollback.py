"""Named snapshot tags + rollback (Iceberg ref/rollback parity) on the lake
table: pinning, tag-aware reads and expiry retention, and full-logical-state
rollback (files + lease + exactly-once ledger restore)."""

import pytest
from pyspark.sql import functions as F

from change_data_capturer_ms_spark.sources.changelog import gen_changelog, write_changelog
from tests.test_invariants import _pipe, _state


def _seed(spark, tmpdir_path, batches=3, n=600):
    pipe, log_dir = _pipe(spark, tmpdir_path)
    full = gen_changelog(spark, n * batches, seed=31, n_repos=8, paths_per_repo=4)
    parts = [full.filter((F.col("seq") >= i * n) & (F.col("seq") < (i + 1) * n))
             for i in range(batches)]
    for i, p in enumerate(parts):
        pipe.apply_batch(p, batch_id=i)
    return pipe, parts


class TestTags:
    def test_tag_read_and_expiry_pinning(self, spark, tmpdir_path):
        pipe, _ = _seed(spark, tmpdir_path)
        t = pipe.table
        v1 = t.manifest().version - 2  # after first batch
        t.tag("training-run-1", v1)
        assert t.tags() == {"training-run-1": v1}
        a = t.read(version=v1).orderBy("repo", "path").toPandas()
        b = t.read(tag="training-run-1").orderBy("repo", "path").toPandas()
        assert a.equals(b)

        rep = t.expire_snapshots(keep_last=1)
        assert v1 in rep["retained_versions"], "tagged version must be pinned"
        assert t.read(tag="training-run-1").count() == len(a)

        t.drop_tag("training-run-1")
        rep2 = t.expire_snapshots(keep_last=1)
        assert v1 not in rep2["retained_versions"]

    def test_tag_validation(self, spark, tmpdir_path):
        pipe, _ = _seed(spark, tmpdir_path, batches=1)
        t = pipe.table
        with pytest.raises(ValueError):
            t.tag("bad name/with slash")
        with pytest.raises(KeyError):
            t.read(tag="nope")
        with pytest.raises(ValueError):
            t.read(version=0, tag="x")


class TestRollback:
    def test_rollback_restores_state_and_ledger(self, spark, tmpdir_path):
        pipe, parts = _seed(spark, tmpdir_path)
        t = pipe.table
        v_after_b1 = t.manifest().version - 1  # snapshot after batch 0 and 1
        s_after_b1 = (
            t.read(version=v_after_b1)
            .select("repo", "path", "content_sha256", "_last_seq")
            .orderBy("repo", "path").toPandas()
        )
        res = t.rollback(version=v_after_b1)
        assert not res["skipped"] and res["restored"] == v_after_b1
        assert _state(t).equals(s_after_b1)
        # ledger restored: batch 2 is no longer committed, so its redelivery
        # REAPPLIES (without ledger restore it would silently no-op)
        assert not t.is_batch_committed("changelog", 2)
        r = pipe.apply_batch(parts[2], batch_id=2)
        assert not r["skipped"]
        # and the final state equals the pre-rollback one
        pipe2, _ = _pipe(spark, tmpdir_path, sub="ref")
        full = gen_changelog(spark, 1800, seed=31, n_repos=8, paths_per_repo=4)
        pipe2.apply_batch(full, batch_id=0)
        assert list(_state(t)["content_sha256"]) == \
            list(_state(pipe2.table)["content_sha256"])

    def test_rollback_by_tag_and_roll_forward(self, spark, tmpdir_path):
        pipe, _ = _seed(spark, tmpdir_path, batches=2)
        t = pipe.table
        v_now = t.manifest().version
        t.tag("good", v_now - 1)
        before = _state(t)
        t.rollback(tag="good")
        assert not _state(t).equals(before)
        # roll FORWARD: the pre-rollback version is still in history
        t.rollback(version=v_now)
        assert _state(t).equals(before)
        assert t.rollback(version=t.manifest().version)["skipped"]
        with pytest.raises(ValueError):
            t.rollback()
        with pytest.raises(ValueError):
            t.rollback(version=1, tag="good")

    def test_rollback_preserves_resume_semantics(self, spark, tmpdir_path):
        """After rollback, the restored lease drives the incremental reader:
        re-running the stream re-drains exactly the rolled-back suffix."""
        pipe, log_dir = _pipe(spark, tmpdir_path)
        full = gen_changelog(spark, 1200, seed=32, n_repos=6, paths_per_repo=3)
        write_changelog(full.filter(F.col("seq") < 600), log_dir)
        pipe.run_stream()
        v1 = pipe.table.manifest().version
        lease1 = dict(pipe.table.lease())
        write_changelog(full.filter(F.col("seq") >= 600), log_dir)
        pipe.run_stream()
        final = _state(pipe.table)

        pipe.table.rollback(version=v1)
        assert pipe.table.lease()["lease"] == lease1["lease"]
        # batch reader resumes from the restored watermark and reconverges
        reader_seq = int(pipe.table.lease()["metrics"]["max_seq"])
        assert reader_seq == 599
        batch = pipe.reader.read_batch(after_seq=reader_seq)
        pipe.apply_batch(batch, batch_id="replay")
        assert _state(pipe.table).equals(final)
