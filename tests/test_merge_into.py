"""Generic clause-based MERGE INTO (lake/table.py merge_into): Delta/Iceberg
`MERGE INTO t USING s` parity on the engine's bucket layout — clause order,
conditional update/delete/insert, tombstone interplay with the CDC feed,
exactly-once, schema evolution, and merge-on-read write shape."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from change_data_capturer_ms_spark.lake.table import LakeTable

KEYS = ["repo", "path"]


def _mk(spark, path, write_mode="cow", rows=None):
    t = LakeTable(spark, path, key_cols=KEYS, n_buckets=4, write_mode=write_mode)
    t.create(T.StructType([
        T.StructField("repo", T.StringType()), T.StructField("path", T.StringType()),
        T.StructField("content", T.StringType()), T.StructField("n", T.LongType()),
    ]))
    if rows:
        src = spark.createDataFrame(rows, "repo string, path string, op string, "
                                          "seq long, content string, n long")
        t.merge(src, batch_id="seed")
    return t


def _live(t):
    return {(r["repo"], r["path"]): (r["content"], r["n"])
            for r in t.read().collect()}


SEED = [
    ("r1", "a", "insert", 0, "c1", 1),
    ("r1", "b", "insert", 1, "c2", 2),
    ("r2", "a", "insert", 2, "c3", 3),
    ("r2", "b", "delete", 3, None, None),  # tombstone
]


@pytest.mark.parametrize("write_mode", ["cow", "mor"])
class TestMergeInto:
    def test_update_all_insert_delete_clauses(self, spark, tmpdir_path, write_mode):
        t = _mk(spark, f"{tmpdir_path}/t", write_mode, SEED)
        src = spark.createDataFrame(
            [("r1", "a", "C1", 10),   # matched -> update
             ("r2", "a", "kill", 0),  # matched -> delete (content == 'kill')
             ("r3", "x", "new", 7),   # not matched -> insert
             ("r2", "b", "back", 9)], # tombstoned -> counts as insert (resurrect)
            "repo string, path string, content string, n long")
        res = t.merge_into(
            src,
            when_matched_delete=F.col("s.content") == "kill",
            when_matched_update="all",
            when_not_matched_insert=True,
            batch_id="m1",
        )
        mt = res["metrics"]
        assert (mt["inserts"], mt["updates"], mt["deletes"]) == (2, 1, 1)
        assert _live(t) == {
            ("r1", "a"): ("C1", 10),
            ("r1", "b"): ("c2", 2),       # untouched carry
            ("r3", "x"): ("new", 7),
            ("r2", "b"): ("back", 9),     # resurrected over the tombstone
        }
        # deleted key carries a tombstone with this commit's seq (CDC feed sees it)
        dead = (t.read(include_deleted=True)
                .filter((F.col("repo") == "r2") & (F.col("path") == "a"))
                .select("_last_op", "_last_seq", "content").collect())
        assert dead[0]["_last_op"] == "delete"
        assert dead[0]["_last_seq"] == mt["max_seq"]
        assert dead[0]["content"] == "c3"  # tombstone keeps old payload

    def test_update_expressions_and_conditions(self, spark, tmpdir_path, write_mode):
        t = _mk(spark, f"{tmpdir_path}/t", write_mode, SEED)
        src = spark.createDataFrame(
            [("r1", "a", 100), ("r1", "b", 1), ("r9", "z", 5)],
            "repo string, path string, add long")
        t.merge_into(
            src,
            when_matched_update={"n": F.col("t.n") + F.col("s.add")},
            matched_update_condition=F.col("s.add") > 1,  # r1/b untouched
            when_not_matched_insert={"content": F.lit("ins"),
                                     "n": F.col("s.add") * 2},
            batch_id="m2",
        )
        assert _live(t) == {
            ("r1", "a"): ("c1", 101),   # expression over both sides
            ("r1", "b"): ("c2", 2),     # condition filtered the clause
            ("r2", "a"): ("c3", 3),
            ("r9", "z"): ("ins", 10),   # dict insert, unlisted cols from dict only
        }

    def test_incremental_feed_sees_exactly_the_merge(self, spark, tmpdir_path,
                                                     write_mode):
        t = _mk(spark, f"{tmpdir_path}/t", write_mode, SEED)
        v_before = t.manifest().version
        src = spark.createDataFrame([("r1", "a", "C1", 10)],
                                    "repo string, path string, content string, n long")
        t.merge_into(src, batch_id="m3")
        inc = t.read_incremental(since_version=v_before).collect()
        assert {(r["repo"], r["path"], r["_last_op"]) for r in inc} == {
            ("r1", "a", "update")}

    def test_exactly_once_and_watermark_monotone(self, spark, tmpdir_path,
                                                 write_mode):
        t = _mk(spark, f"{tmpdir_path}/t", write_mode, SEED)
        src = spark.createDataFrame([("r1", "a", "C1", 10)],
                                    "repo string, path string, content string, n long")
        t.merge_into(src, batch_id="once")
        v = t.manifest().version
        state = _live(t)
        res = t.merge_into(src, batch_id="once")  # re-delivery
        assert res["skipped"] and t.manifest().version == v
        assert _live(t) == state
        with pytest.raises(ValueError, match="watermark"):
            t.merge_into(src, batch_id="old", seq=0)

    def test_source_duplicate_keys_raise(self, spark, tmpdir_path, write_mode):
        t = _mk(spark, f"{tmpdir_path}/t", write_mode, SEED)
        src = spark.createDataFrame(
            [("r1", "a", "x", 1), ("r1", "a", "y", 2)],
            "repo string, path string, content string, n long")
        with pytest.raises(ValueError, match="multiple rows per key"):
            t.merge_into(src, batch_id="dup")

    def test_schema_evolution_new_column(self, spark, tmpdir_path, write_mode):
        t = _mk(spark, f"{tmpdir_path}/t", write_mode, SEED)
        src = spark.createDataFrame([("r1", "a", "C1", 1, 42)],
                                    "repo string, path string, content string, "
                                    "n long, stars long")
        t.merge_into(src, batch_id="evo")
        got = {(r["repo"], r["path"]): r["stars"] for r in t.read().collect()}
        assert got[("r1", "a")] == 42
        assert got[("r1", "b")] is None  # carried rows NULL-fill the new column

    def test_key_update_rejected_and_clauseless_rejected(self, spark, tmpdir_path,
                                                         write_mode):
        t = _mk(spark, f"{tmpdir_path}/t", write_mode, SEED)
        src = spark.createDataFrame([("r1", "a", "x", 1)],
                                    "repo string, path string, content string, n long")
        with pytest.raises(ValueError, match="key columns"):
            t.merge_into(src, when_matched_update={"repo": F.lit("nope")},
                         batch_id="bad")
        with pytest.raises(ValueError, match="at least one clause"):
            t.merge_into(src, when_matched_update=None,
                         when_not_matched_insert=None, batch_id="bad2")


def test_mor_merge_into_writes_only_changed_rows(spark, tmpdir_path):
    """Under merge-on-read the delta files carry O(changed) rows, not the
    bucket contents (the whole point of the mode)."""
    t = _mk(spark, f"{tmpdir_path}/t", "mor",
            [("r%d" % i, "p", "insert", i, "c", i) for i in range(50)])
    files_before = len(t.manifest().files)
    src = spark.createDataFrame([("r1", "p", "upd", 99)],
                                "repo string, path string, content string, n long")
    t.merge_into(src, batch_id="m")
    new_files = [f for f in t.manifest().files][files_before:]
    assert sum(f.rows for f in t.manifest().files) == 51  # 50 base + 1 delta
    assert _live(t)[("r1", "p")] == ("upd", 99)
