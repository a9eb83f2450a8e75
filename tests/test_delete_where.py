"""delete_where (lake/table.py): predicate deletes become tombstones through
the merge path — CDC-visible, exactly-once, zone-map-pruned candidates."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from change_data_capturer_ms_spark.lake.table import LakeTable

KEYS = ["repo", "path"]

SEED = [
    ("r1", "a", "insert", 0, "keep", 1),
    ("r1", "b", "insert", 1, "erase-me", 2),
    ("r2", "a", "insert", 2, "erase-me", 30),
    ("r2", "b", "insert", 3, "keep", 40),
]


def _mk(spark, path, write_mode="cow"):
    t = LakeTable(spark, path, key_cols=KEYS, n_buckets=4,
                  write_mode=write_mode)
    t.create(T.StructType([
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("content", T.StringType()),
        T.StructField("n", T.LongType()),
    ]))
    src = spark.createDataFrame(
        SEED, "repo string, path string, op string, seq long, "
              "content string, n long")
    t.merge(src, batch_id="seed")
    return t


@pytest.mark.parametrize("write_mode", ["cow", "mor"])
def test_predicate_delete_tombstones_and_cdc(spark, tmpdir_path, write_mode):
    t = _mk(spark, f"{tmpdir_path}/t", write_mode)
    v0 = t.manifest().version
    res = t.delete_where(predicate=F.col("content") == "erase-me",
                         batch_id="gdpr-1")
    assert res["metrics"]["deletes"] == 2
    live = {(r["repo"], r["path"]) for r in t.read().collect()}
    assert live == {("r1", "a"), ("r2", "b")}
    # tombstones persist (resurrection safety), not row removal
    dead = t.read(include_deleted=True).filter(
        F.col("_last_op") == "delete").count()
    assert dead == 2
    # CDC visibility: incremental consumers see the deletes as tombstones
    inc = t.read_incremental(since_version=v0)
    ops = {(r["repo"], r["path"]): r["_last_op"] for r in inc.collect()}
    assert ops == {("r1", "b"): "delete", ("r2", "a"): "delete"}
    # exactly-once: redelivery of the same erasure batch is a no-op
    again = t.delete_where(predicate=F.col("content") == "erase-me",
                           batch_id="gdpr-1")
    assert again["skipped"] is True


def test_zone_map_filters_path(spark, tmpdir_path):
    t = _mk(spark, f"{tmpdir_path}/t")
    res = t.delete_where(filters=[("n", ">=", 30)],
                         predicate=F.col("content") == "erase-me",
                         batch_id="gdpr-2")
    # filters AND predicate: only ("r2","a") has n>=30 AND erase-me
    assert res["metrics"]["deletes"] == 1
    live = {(r["repo"], r["path"]) for r in t.read().collect()}
    assert live == {("r1", "a"), ("r1", "b"), ("r2", "b")}


def test_requires_a_condition(spark, tmpdir_path):
    t = _mk(spark, f"{tmpdir_path}/t")
    with pytest.raises(ValueError, match="filters and/or predicate"):
        t.delete_where()


@pytest.mark.parametrize("write_mode", ["cow", "mor"])
def test_update_where_rewrites_matches(spark, tmpdir_path, write_mode):
    t = _mk(spark, f"{tmpdir_path}/t", write_mode)
    v0 = t.manifest().version
    res = t.update_where(
        {"content": F.lit("redacted"), "n": F.col("t.n") + 100},
        predicate=F.col("content") == "erase-me",
        batch_id="fix-1",
    )
    assert res["metrics"]["updates"] == 2
    got = {(r["repo"], r["path"]): (r["content"], r["n"])
           for r in t.read().collect()}
    assert got[("r1", "b")] == ("redacted", 102)
    assert got[("r2", "a")] == ("redacted", 130)
    assert got[("r1", "a")] == ("keep", 1)  # untouched
    # CDC visibility: exactly the updated rows surface incrementally
    inc = {(r["repo"], r["path"]) for r in
           t.read_incremental(since_version=v0).collect()}
    assert inc == {("r1", "b"), ("r2", "a")}
    # exactly-once redelivery
    assert t.update_where({"n": F.lit(0)},
                          predicate=F.col("content") == "redacted",
                          batch_id="fix-1")["skipped"] is True


def test_update_where_validates_args(spark, tmpdir_path):
    t = _mk(spark, f"{tmpdir_path}/t")
    with pytest.raises(ValueError, match="filters and/or predicate"):
        t.update_where({"n": F.lit(1)})
    with pytest.raises(ValueError, match="non-empty"):
        t.update_where({}, predicate=F.lit(True))


def test_distinct_default_mutations_do_not_collide(spark, tmpdir_path):
    """Default batch_id derives from the mutation spec: two DIFFERENT
    predicate mutations run with defaults must both apply (the old fixed
    batch_id=0 made the second a silent ledger no-op), while retrying the
    SAME mutation stays exactly-once."""
    t = _mk(spark, f"{tmpdir_path}/t")
    r1 = t.delete_where(predicate=F.col("content") == "erase-me")
    assert r1["skipped"] is False and r1["metrics"]["deletes"] == 2
    # a different predicate delete with defaults is NOT ledger-skipped
    r2 = t.delete_where(filters=[("n", ">=", 40)])
    assert r2["skipped"] is False and r2["metrics"]["deletes"] == 1
    # retrying the same default mutation is still a no-op
    assert t.delete_where(filters=[("n", ">=", 40)])["skipped"] is True
    # update_where defaults don't collide with the deletes...
    r3 = t.update_where({"n": F.lit(7)}, predicate=F.col("content") == "keep")
    assert r3["skipped"] is False and r3["metrics"]["updates"] == 1
    # ...and a different set_exprs on the SAME predicate is a new mutation
    r4 = t.update_where({"n": F.lit(8)}, predicate=F.col("content") == "keep")
    assert r4["skipped"] is False
    assert {r["n"] for r in t.read().collect()} == {8}
