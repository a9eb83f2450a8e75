"""Incremental MinHash-LSH index (operators/dedup_index.py): maintained from a
change feed, it must always equal the index recomputed from the current corpus
state; probes must find near-dups, miss removed/stale hashes, and prune buckets
manifest-side (LakeTable bucket_cols ⊂ key_cols)."""

import random

import pytest
from pyspark.sql import functions as F

from change_data_capturer_ms_spark.operators.dedup_index import (
    MinHashLSHIndex,
    band_rows,
)

VOCAB = [f"w{i}" for i in range(60)]


def _text(rng, n_words=30):
    return " ".join(rng.choice(VOCAB) for _ in range(n_words))


def _mk_corpus(seed=7, n=14):
    rng = random.Random(seed)
    return {f"doc{i:02d}": _text(rng) for i in range(n)}


def _changes_df(spark, rows):
    """rows: list of (doc_id, old_text|None, new_text|None, seq)."""
    return spark.createDataFrame(
        [(i, o, nw, s) for (i, o, nw, s) in rows],
        "doc_id string, old_text string, new_text string, seq long",
    )


def _corpus_df(spark, state: dict):
    return spark.createDataFrame(
        list(state.items()), "doc_id string, text string")


def _assert_index_matches_state(idx, spark, state):
    expected = band_rows(_corpus_df(spark, state)).select(
        "band", "band_hash", "id")
    actual = idx.table.read().select("band", "band_hash", "id")
    assert actual.exceptAll(expected).count() == 0
    assert expected.exceptAll(actual).count() == 0


@pytest.fixture(scope="module")
def built(spark, tmpdir_path_mod):
    """Index maintained through insert → update/delete/insert batches, with
    the Python-side corpus state tracked alongside."""
    idx = MinHashLSHIndex(spark, f"{tmpdir_path_mod}/lsh_index", n_buckets=16)
    state = _mk_corpus()
    rng = random.Random(99)

    # batch 0: everything inserted
    b0 = [(d, None, t, i) for i, (d, t) in enumerate(sorted(state.items()))]
    idx.update(_changes_df(spark, b0), batch_id=0)

    # batch 1: rewrite two docs completely, delete one, add one
    b1 = []
    seq = 100
    old0 = state["doc00"]
    state["doc00"] = _text(rng)
    b1.append(("doc00", old0, state["doc00"], seq)); seq += 1
    old1 = state["doc01"]
    state["doc01"] = _text(rng)
    b1.append(("doc01", old1, state["doc01"], seq)); seq += 1
    b1.append(("doc02", state.pop("doc02"), None, seq)); seq += 1
    state["doc90"] = _text(rng)
    b1.append(("doc90", None, state["doc90"], seq)); seq += 1
    idx.update(_changes_df(spark, b1), batch_id=1)
    return idx, state, old0


def test_maintained_index_equals_recompute(spark, built):
    idx, state, _ = built
    _assert_index_matches_state(idx, spark, state)


def test_update_is_exactly_once(spark, built):
    idx, state, old0 = built
    before = idx.table.manifest().version
    res = idx.update(_changes_df(
        spark, [("doc00", old0, state["doc00"], 101)]), batch_id=1)
    assert res["skipped"] is True
    assert idx.table.manifest().version == before
    _assert_index_matches_state(idx, spark, state)


def test_probe_finds_near_duplicate(spark, built):
    idx, state, _ = built
    # near-dup of doc05: change the last word only — most bands still collide
    words = state["doc05"].split(" ")
    near = " ".join(words[:-1] + ["zzz"])
    probes = spark.createDataFrame(
        [("q_near", near), ("q_exact", state["doc07"])],
        "doc_id string, text string")
    hits = idx.probe(probes).collect()
    got = {(r["probe_id"], r["index_id"]) for r in hits}
    assert ("q_exact", "doc07") in got  # identical text: all bands collide
    assert ("q_near", "doc05") in got
    exact = [r for r in hits
             if (r["probe_id"], r["index_id"]) == ("q_exact", "doc07")]
    assert exact[0]["n_shared_bands"] == idx.bands


def test_probe_misses_deleted_and_stale(spark, built):
    idx, state, old0 = built
    # doc02 was deleted; doc00's OLD text was tombstoned out of the index —
    # neither may surface, even as exact-text probes
    probes = spark.createDataFrame(
        [("q_del", "irrelevant " * 10), ("q_stale", old0)],
        "doc_id string, text string")
    hits = idx.probe(probes)
    bad = hits.filter(F.col("index_id").isin("doc02")).count()
    assert bad == 0
    stale = {r["index_id"] for r in hits.filter(
        F.col("probe_id") == "q_stale").collect()}
    assert "doc00" not in stale or state["doc00"] == old0


def test_probe_prunes_buckets_manifest_side(spark, built):
    idx, state, _ = built
    probes = spark.createDataFrame(
        [("q", state["doc05"])], "doc_id string, text string")
    q = band_rows(probes, bands=idx.bands, n=idx.n)
    buckets = idx._probe_buckets(q, max_hashes=4096)
    assert buckets is not None
    assert len(buckets) <= idx.bands  # one doc: ≤ bands distinct hashes
    m = idx.table.manifest()
    all_buckets = {f.bucket for f in m.files}
    assert len(all_buckets) > len(buckets), \
        "fixture too small to demonstrate pruning"
    # over the cap ⇒ no pruning (full-join fallback), never an error
    assert idx._probe_buckets(q, max_hashes=1) is None


def test_probe_bucket_parity_jvm_vs_driver(spark, built):
    """The driver-side xxhash64 bucket of every probe hash must equal the
    bucket the JVM assigned at write time — else pruning silently drops hits.
    Proven end-to-end: an exact-text probe with pruning finds all bands."""
    idx, state, _ = built
    probes = spark.createDataFrame(
        [("q", state["doc90"])], "doc_id string, text string")
    hits = idx.probe(probes, max_hashes=4096).collect()
    got = {(r["probe_id"], r["index_id"], r["n_shared_bands"]) for r in hits}
    assert ("q", "doc90", idx.bands) in got


def test_bucket_cols_must_be_key_subset(spark, tmpdir_path):
    from change_data_capturer_ms_spark.lake.table import LakeTable
    from change_data_capturer_ms_spark.operators.dedup_index import INDEX_SCHEMA

    t = LakeTable(spark, f"{tmpdir_path}/bad", key_cols=["id"],
                  bucket_cols=["nope"])
    with pytest.raises(ValueError, match="subset of key_cols"):
        t.create(INDEX_SCHEMA)


def test_optimize_preserves_probe_results(spark, tmpdir_path):
    """The index table takes high-frequency small batches, so it fragments;
    table.optimize() (compact → expiries) must not change probe answers."""
    # merge-on-read: each tiny batch appends delta files (O(batch) writes) —
    # the realistic mode for a high-frequency index — so buckets fragment
    idx = MinHashLSHIndex(spark, f"{tmpdir_path}/idx_opt", n_buckets=8,
                          write_mode="mor")
    state = _mk_corpus(seed=21, n=10)
    items = sorted(state.items())
    # many tiny batches → multi-file buckets
    for b, (d, t) in enumerate(items):
        idx.update(_changes_df(spark, [(d, None, t, b)]), batch_id=b)
    probes = spark.createDataFrame(
        [("q", state["doc04"])], "doc_id string, text string")
    before = {(r["probe_id"], r["index_id"], r["n_shared_bands"])
              for r in idx.probe(probes).collect()}
    files_before = len(idx.table.manifest().files)
    rep = idx.table.optimize()
    files_after = len(idx.table.manifest().files)
    assert files_after < files_before, rep
    after = {(r["probe_id"], r["index_id"], r["n_shared_bands"])
             for r in idx.probe(probes).collect()}
    assert after == before and before
