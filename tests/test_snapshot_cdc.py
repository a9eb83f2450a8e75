"""Snapshot-based CDC (sources/snapshot_cdc.py): full-load bootstrap, poll-diff
change derivation, and snapshot→stream handoff — the no-WAL ingest path
(Debezium snapshot mode / DMS full-load+CDC re-expressed; the reference only
covers live streams, src/capturer/mongo/mongo.ts:13-41)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from change_data_capturer_ms_spark.lake.table import LakeTable
from change_data_capturer_ms_spark.operators.dedupe import lww_dedupe
from change_data_capturer_ms_spark.sources.changelog import gen_changelog
from change_data_capturer_ms_spark.sources.snapshot_cdc import snapshot_to_changelog

KEYS = ["repo", "path"]
PAYLOAD = ["commit", "lang", "content"]


def _snapshot(log, upto_seq):
    """The upstream's full table export as of `upto_seq` (LWW live state)."""
    s = lww_dedupe(log.filter(F.col("seq") <= upto_seq), KEYS, seq_col="seq")
    return s.filter(F.col("op") != "delete").select(*KEYS, *PAYLOAD)


def _mk_table(spark, path):
    t = LakeTable(spark, path, key_cols=KEYS, n_buckets=8)
    fields = [T.StructField(c, T.StringType()) for c in KEYS + PAYLOAD]
    t.create(T.StructType(fields))
    return t


def _live(t):
    return t.read().select(*KEYS, *PAYLOAD)


def _frames_equal(a, b):
    return a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


class TestSnapshotCDC:
    def test_poll_diff_converges_to_final_snapshot(self, spark, tmpdir_path):
        """Bootstrap + two poll diffs reproduce the last snapshot exactly,
        including deletes (tombstoned, not resurrectable)."""
        log = gen_changelog(spark, 3000, seed=11, n_repos=12, paths_per_repo=6)
        w1, w2, w3 = 999, 1999, 2999
        s1, s2, s3 = (_snapshot(log, w) for w in (w1, w2, w3))

        t = _mk_table(spark, f"{tmpdir_path}/t")
        t.merge(snapshot_to_changelog(None, s1, KEYS, seq=w1), batch_id=0)
        t.merge(snapshot_to_changelog(s1, s2, KEYS, seq=w2), batch_id=1)
        t.merge(snapshot_to_changelog(s2, s3, KEYS, seq=w3), batch_id=2)

        assert _frames_equal(_live(t), s3)
        # a key live at w2 but gone at w3 left a tombstone carrying seq w3
        removed = (
            s2.select(*KEYS).exceptAll(s3.select(*KEYS)).limit(1).collect()
        )
        assert removed, "fixture must delete at least one key between polls"
        k = removed[0].asDict()
        tomb = (
            t.read(include_deleted=True)
            .filter((F.col("repo") == k["repo"]) & (F.col("path") == k["path"]))
            .select("_last_op", "_last_seq").collect()
        )
        assert tomb and tomb[0]["_last_op"] == "delete"
        assert tomb[0]["_last_seq"] == w3

    def test_diff_event_mix_matches_set_algebra(self, spark, tmpdir_path):
        """Op counts from the diff equal the key-set algebra of the snapshots,
        and unchanged keys emit nothing (output is O(changed))."""
        log = gen_changelog(spark, 2400, seed=12, n_repos=10, paths_per_repo=5)
        s_old, s_new = _snapshot(log, 1199), _snapshot(log, 2399)
        ev = snapshot_to_changelog(s_old, s_new, KEYS, seq=2399).cache()

        ko = {tuple(r) for r in s_old.select(*KEYS).collect()}
        kn = {tuple(r) for r in s_new.select(*KEYS).collect()}
        by_op = {r["op"]: r["n"] for r in
                 ev.groupBy("op").agg(F.count("*").alias("n")).collect()}
        assert by_op.get("insert", 0) == len(kn - ko)
        assert by_op.get("delete", 0) == len(ko - kn)
        # updates: common keys whose payload changed
        common = s_old.alias("o").join(s_new.alias("n"), KEYS)
        changed = common.filter(
            ~F.struct(*[F.col(f"o.{c}") for c in PAYLOAD]).eqNullSafe(
                F.struct(*[F.col(f"n.{c}") for c in PAYLOAD]))).count()
        assert by_op.get("update", 0) == changed
        assert ev.count() == sum(by_op.values())
        ev.unpersist()

    def test_bootstrap_then_stream_handoff_converges(self, spark, tmpdir_path):
        """Full-load at watermark W, then tail events with seq > W (delivered
        twice — at-least-once overlap) ⇒ same live state as a full replay."""
        log = gen_changelog(spark, 3000, seed=13, n_repos=12, paths_per_repo=6).cache()
        w = 1499

        # reference lake: full replay of the whole log
        ref = _mk_table(spark, f"{tmpdir_path}/ref")
        ref.merge(log.select(*KEYS, "op", "seq", *PAYLOAD), batch_id=0,
                  tiebreakers=["commit"])

        # handoff lake: snapshot bootstrap + tail (suffix delivered twice)
        t = _mk_table(spark, f"{tmpdir_path}/hand")
        t.merge(snapshot_to_changelog(None, _snapshot(log, w), KEYS, seq=w),
                batch_id="bootstrap")
        tail = log.filter(F.col("seq") > w).select(*KEYS, "op", "seq", *PAYLOAD)
        t.merge(tail, batch_id="tail-1", tiebreakers=["commit"])
        t.merge(tail, batch_id="tail-2", tiebreakers=["commit"])  # overlap redelivery

        assert _frames_equal(_live(t), _live(ref))
        # the bootstrap must not regress once tail events land: watermark monotone
        assert t.lease()["metrics"]["max_seq"] == 2999
        log.unpersist()

    def test_bootstrap_all_insert_and_schema(self, spark):
        snap = (
            spark.range(5)
            .select(F.concat(F.lit("r"), F.col("id")).alias("repo"),
                    F.lit("p").alias("path"), F.lit("c").alias("commit"),
                    F.lit("py").alias("lang"), F.lit("x").alias("content"))
        )
        ev = snapshot_to_changelog(None, snap, KEYS, seq=7)
        rows = ev.collect()
        assert len(rows) == 5 and all(r["op"] == "insert" and r["seq"] == 7
                                      for r in rows)
        assert dict(ev.dtypes)["seq"] == "bigint"

    def test_schema_evolution_between_polls_surfaces_as_update(self, spark):
        old = spark.range(2).select(
            F.concat(F.lit("r"), F.col("id")).alias("repo"),
            F.lit("p").alias("path"), F.lit("v1").alias("content"))
        new = old.withColumn("stars", (F.col("repo") == "r0").cast("int") * 5)
        ev = snapshot_to_changelog(old, new, KEYS, seq=1)
        got = {(r["repo"], r["op"], r["stars"]) for r in ev.collect()}
        # both rows changed (stars went NULL -> value), payload carries new col
        assert got == {("r0", "update", 5), ("r1", "update", 0)}
