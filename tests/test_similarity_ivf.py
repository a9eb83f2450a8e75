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
