"""IVF ANN: determinism and recall against the exact brute-force baseline."""

import os

from pyspark.sql import functions as F

from change_data_capturer_ms_spark.operators import brute_force_topk, ivf_topk


def test_ivf_recall_and_determinism(spark, sf_dir):
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    queries = emb.filter(F.col("vec_id") < 5)

    exact = brute_force_topk(emb, queries, k=5)
    approx = ivf_topk(emb, queries, k=5, n_cells=8, nprobe=3)

    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, f"IVF recall too low: {recall}"

    # seeded KMeans + fixed iterations => rerun is identical
    again = {(r["query_id"], r["neighbor_id"]) for r in
             ivf_topk(emb, queries, k=5, n_cells=8, nprobe=3).collect()}
    assert a == again


def test_ivf_det_recall_and_multiprobe_lift(spark, sf_dir):
    """Deterministic-quantizer IVF: decent recall vs brute force; multi-probe
    LSH: recall never below the single-probe variant."""
    from change_data_capturer_ms_spark.operators import ivf_topk_det, lsh_topk

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    queries = emb.filter(F.col("vec_id") < 5)

    exact = {(r["query_id"], r["neighbor_id"])
             for r in brute_force_topk(emb, queries, k=5).collect()}
    det = {(r["query_id"], r["neighbor_id"])
           for r in ivf_topk_det(emb, queries, k=5, n_cells=8, nprobe=3).collect()}
    # hash-seeded centroids trade some recall vs learned KMeans cells (ivf_topk
    # asserts >= 0.5 above) for exact oracle-checkability
    assert len(exact & det) / len(exact) >= 0.4

    # probing every cell degenerates to the exact scan — recall must be 1.0
    full = {(r["query_id"], r["neighbor_id"])
            for r in ivf_topk_det(emb, queries, k=5, n_cells=8, nprobe=8).collect()}
    assert full == exact

    single = {(r["query_id"], r["neighbor_id"])
              for r in lsh_topk(emb, queries, k=5, bits=4).collect()}
    multi = {(r["query_id"], r["neighbor_id"])
             for r in lsh_topk(emb, queries, k=5, bits=4, multiprobe=True).collect()}
    r_single = len(exact & single) / len(exact)
    r_multi = len(exact & multi) / len(exact)
    # these near-random synthetic embeddings give the axis-sign bucketer little
    # to work with (r_single ≈ 0.08); the point is the multi-probe LIFT at
    # unchanged plan shape: scanning bits+1 of 2^bits buckets multiplies recall
    assert r_multi >= r_single + 0.1, (r_single, r_multi)
    assert r_multi >= 0.25, f"multi-probe recall too low: {r_multi}"


def test_pq_topk_recall_and_determinism(spark, sf_dir):
    """Product-quantization ANN: decent recall vs brute force after exact
    re-rank; fully deterministic (hash-seeded codebooks, no training)."""
    from change_data_capturer_ms_spark.operators import pq_topk

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    queries = emb.filter(F.col("vec_id") < 5)
    exact = {(r["query_id"], r["neighbor_id"])
             for r in brute_force_topk(emb, queries, k=5).collect()}
    # near-random 64-dim vectors need fine subspaces: 4-dim × 32 codes gives
    # recall ≈ 0.9 at rerank=30; coarse m=4 × 16 codes measures ≈ 0.16
    got = {(r["query_id"], r["neighbor_id"])
           for r in pq_topk(emb, queries, k=5, m=16, n_codes=32, rerank=30).collect()}
    recall = len(exact & got) / len(exact)
    assert recall >= 0.7, f"PQ recall too low: {recall}"
    again = {(r["query_id"], r["neighbor_id"])
             for r in pq_topk(emb, queries, k=5, m=16, n_codes=32, rerank=30).collect()}
    assert got == again
    # rerank == corpus size degenerates to exact search
    n = emb.count()
    full = {(r["query_id"], r["neighbor_id"])
            for r in pq_topk(emb, queries, k=5, m=16, n_codes=32, rerank=n).collect()}
    assert full == exact
