"""Branch refs: write-to-branch isolation, fast-forward publish, divergence
refusal, exactly-once ledger carry-over, maintenance on a branch."""

import pytest
from pyspark.sql import types as T

from change_data_capturer_ms_spark.lake.table import LakeTable

SCHEMA = T.StructType([
    T.StructField("repo", T.StringType()),
    T.StructField("path", T.StringType()),
    T.StructField("content", T.StringType()),
])


def _batch(spark, rows, seq0=0):
    data = [(r, p, c, seq0 + i, "insert") for i, (r, p, c) in enumerate(rows)]
    return spark.createDataFrame(
        data, "repo string, path string, content string, seq long, op string"
    )


def _state(t, **kw):
    return {(r["repo"], r["path"]): r["content"] for r in t.read(**kw).collect()}


@pytest.fixture()
def table(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "tbl"), key_cols=["repo", "path"],
                  n_buckets=4)
    t.create(SCHEMA)
    t.merge(_batch(spark, [("r1", "a", "v0"), ("r2", "b", "v0")]), batch_id=0)
    return t


def test_branch_commits_are_invisible_on_main(table, spark):
    table.create_branch("audit")
    tb = table.branch("audit")
    tb.merge(_batch(spark, [("r1", "a", "v1"), ("r3", "c", "v1")], seq0=10),
             batch_id=1)
    # branch sees the new state, main does not
    assert _state(tb)[("r1", "a")] == "v1"
    assert ("r3", "c") in _state(tb)
    assert _state(table)[("r1", "a")] == "v0"
    assert ("r3", "c") not in _state(table)
    # refs report independently
    assert table.branches()["audit"] > table.manifest().version


def test_fast_forward_publishes_and_keeps_ledger(table, spark):
    table.create_branch("audit")
    tb = table.branch("audit")
    tb.merge(_batch(spark, [("r1", "a", "v1")], seq0=10), batch_id=1)
    res = table.fast_forward("audit")
    assert res["skipped"] is False
    assert _state(table)[("r1", "a")] == "v1"
    # batch 1 committed on the branch must stay exactly-once after publish
    redo = table.merge(_batch(spark, [("r1", "a", "BAD")], seq0=10), batch_id=1)
    assert redo["skipped"] is True
    assert _state(table)[("r1", "a")] == "v1"


def test_fast_forward_refuses_diverged_main(table, spark):
    table.create_branch("audit")
    tb = table.branch("audit")
    tb.merge(_batch(spark, [("r1", "a", "branch")], seq0=10), batch_id=1)
    # main advances independently -> branch head no longer descends from main
    table.merge(_batch(spark, [("r2", "b", "main")], seq0=20), batch_id=2)
    with pytest.raises(RuntimeError, match="not an ancestor"):
        table.fast_forward("audit")


def test_fast_forward_noop_when_branch_at_main(table):
    table.create_branch("b")
    assert table.fast_forward("b")["skipped"] is True


def test_branch_rollback_moves_only_the_branch(table, spark):
    base_v = table.manifest().version
    table.create_branch("audit")
    tb = table.branch("audit")
    tb.merge(_batch(spark, [("r1", "a", "v1")], seq0=10), batch_id=1)
    tb.rollback(version=base_v)
    assert _state(tb)[("r1", "a")] == "v0"         # branch restored
    assert table.manifest().version == base_v       # main untouched
    # after rollback the branch ledger forgot batch 1 -> it may re-apply
    again = tb.merge(_batch(spark, [("r1", "a", "v1b")], seq0=11), batch_id=1)
    assert again["skipped"] is False
    assert _state(tb)[("r1", "a")] == "v1b"


def test_branch_heads_survive_expire_snapshots(table, spark):
    table.create_branch("keepme")
    tb = table.branch("keepme")
    tb.merge(_batch(spark, [("r9", "z", "vb")], seq0=30), batch_id=7)
    head = table.branches()["keepme"]
    # advance main well past keep_last
    for i in range(3):
        table.merge(_batch(spark, [("r2", "b", f"m{i}")], seq0=40 + i),
                    batch_id=10 + i)
    table.expire_snapshots(keep_last=1, orphan_grace_sec=0.0)
    # the branch head snapshot is still fully readable
    assert _state(tb)[("r9", "z")] == "vb"
    assert table.branches()["keepme"] == head


def test_unpublished_branch_ancestry_survives_expiry(table, spark):
    """A branch carrying 2+ unpublished commits keeps its INTERMEDIATE
    manifests through expire_snapshots — otherwise fast_forward's parent
    walk hits the expired gap and a genuinely publishable branch becomes
    permanently unpublishable."""
    table.create_branch("wip")
    tb = table.branch("wip")
    tb.merge(_batch(spark, [("r5", "x", "mid")], seq0=50), batch_id=21)
    tb.merge(_batch(spark, [("r6", "y", "tip")], seq0=60), batch_id=22)
    table.expire_snapshots(keep_last=1, orphan_grace_sec=0.0)
    res = table.fast_forward("wip")
    assert res["skipped"] is False
    got = _state(table)
    assert got[("r5", "x")] == "mid" and got[("r6", "y")] == "tip"


def test_fast_forward_detects_concurrent_main_commit(table, spark, monkeypatch):
    """Publish uses the expected-parent protocol: a main commit landing
    between the ancestry check and the pointer swap must abort the publish,
    not silently drop that commit from main's history."""
    table.create_branch("audit")
    tb = table.branch("audit")
    tb.merge(_batch(spark, [("r1", "a", "v1")], seq0=10), batch_id=1)
    real = table.store.current_version
    calls = {"n": 0}

    def racy():
        calls["n"] += 1
        return real() if calls["n"] == 1 else real() + 999

    monkeypatch.setattr(table.store, "current_version", racy)
    with pytest.raises(RuntimeError, match="concurrent main commit"):
        table.fast_forward("audit")


def test_unknown_branch_raises(table):
    with pytest.raises(KeyError):
        table.branch("nope")
    with pytest.raises(ValueError):
        table.create_branch("bad name!")


def test_duplicate_branch_refused(table):
    table.create_branch("b")
    with pytest.raises(ValueError, match="already exists"):
        table.create_branch("b")


def test_stale_branch_does_not_pin_prefork_main_history(table, spark):
    """The branch-ancestry pin walk stops at the FORK POINT on main: a stale
    branch (main advanced since the cut) must pin only its own unpublished
    commits, not main's entire pre-fork history — otherwise nothing below
    keep_last is ever reclaimed once any old branch exists."""
    import glob as _glob
    import os as _os

    table.create_branch("stale")
    tb = table.branch("stale")
    tb.merge(_batch(spark, [("r7", "w", "branchv")], seq0=70), batch_id=31)
    fork = table.manifest().version  # branch forked at current main
    # advance main well past keep_last so pre-fork history becomes expirable
    for i in range(4):
        table.merge(_batch(spark, [("r2", "b", f"m{i}")], seq0=80 + i),
                    batch_id=40 + i)
    table.expire_snapshots(keep_last=1, orphan_grace_sec=0.0)
    kept = {int(_os.path.basename(p)[1:-5]) for p in
            _glob.glob(_os.path.join(table.path, "_meta", "v*.json"))}
    # the branch's own unpublished commit survives; main ancestry STRICTLY
    # below the fork is reclaimed (the fix: the walk stops at main ancestry,
    # not at retained-main, so it cannot drag pre-fork manifests along)
    assert table.branches()["stale"] in kept
    assert not [v for v in kept if v < fork], (
        f"pre-fork main manifests pinned by a stale branch: {sorted(kept)}")
    # branch stays fully readable; publish correctly refuses (stale)
    assert _state(tb)[("r7", "w")] == "branchv"
    with pytest.raises(RuntimeError, match="not an ancestor"):
        table.fast_forward("stale")
