"""Scale-bound tests for the document-dedup operators: hot-shingle fan-out is
capped, and banded SimHash finds hamming-close pairs without an all-pairs join."""

from pyspark.sql import functions as F

from change_data_capturer_ms_spark.operators import (
    ngram_jaccard_pairs,
    simhash_pairs_banded,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_ngram_df_cap_bounds_hot_shingle_fanout(spark):
    """50 docs sharing ONE stop-shingle (plus unique tails) would fan out
    C(50,2)=1225 candidate pairs; the df cap removes the hot shingle from the
    join so the pair count collapses to 0."""
    rows = [(i, f"aa bb cc unique{i} tail{i} x{i}") for i in range(50)]
    docs = _docs(spark, rows)
    uncapped = ngram_jaccard_pairs(docs, threshold=0.0, df_cap=None)
    capped = ngram_jaccard_pairs(docs, threshold=0.0, df_cap=10)
    assert uncapped.count() == 1225  # every pair shares the 'aa bb cc' shingle
    assert capped.count() == 0

    # docs that ALSO share non-hot shingles keep their pair; jaccard denominator
    # stays exact (uncapped per-doc sizes)
    rows2 = rows + [(100, "aa bb cc same same same"), (101, "aa bb cc same same same")]
    capped2 = ngram_jaccard_pairs(_docs(spark, rows2), threshold=0.0, df_cap=10)
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in capped2.collect()}
    assert set(got) == {(100, 101)}
    # 4 shingles each, 'aa bb cc' is hot (52 docs > cap): shared=3 of 4 ⇒ 3/5? no:
    # sizes are uncapped (4 each), shared counts only non-hot shingles (3)
    assert abs(got[(100, 101)] - round(3 / (4 + 4 - 3), 6)) < 1e-9


def test_simhash_banded_finds_near_dups_and_matches_bruteforce(spark):
    """Banded candidates + popcount filter == brute-force hamming-≤k pairs
    (pigeonhole guarantees completeness for max_hamming ≤ bands-1)."""
    from change_data_capturer_ms_spark.operators import simhash

    rows = [(i, f"the quick brown fox jumps over lazy dog number {i % 7}")
            for i in range(40)]
    docs = _docs(spark, rows)
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in simhash_pairs_banded(docs, bits=32, bands=4, max_hamming=3).collect()}

    s = {r["id"]: r["simhash"] for r in simhash(docs, bits=32).collect()}
    want = {}
    ids = sorted(s)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            h = bin(s[a] ^ s[b]).count("1")
            if h <= 3:
                want[(a, b)] = h
    assert got == want and len(want) > 0


def test_duplicate_clusters_matches_union_find(spark):
    """Min-label propagation CC == a plain union-find over the same pairs."""
    import random

    from change_data_capturer_ms_spark.operators import duplicate_clusters

    rng = random.Random(7)
    # several chains/cliques + singleton-free edge list
    pairs = [(i, i + 1) for i in range(0, 10)]            # one 11-node chain
    pairs += [(100 + a, 100 + b) for a in range(5) for b in range(a + 1, 5)]
    pairs += [(rng.randrange(200, 240), rng.randrange(200, 240)) for _ in range(30)]
    pairs = [(a, b) if a < b else (b, a) for a, b in pairs if a != b]

    parent = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    for a, b in pairs:
        union(a, b)
    want = {x: find(x) for x in parent}

    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = {r["id"]: r["cluster_id"] for r in duplicate_clusters(df).collect()}
    assert got == want
    # every cluster id is the component minimum
    assert all(cid == min(k for k, v in got.items() if v == cid)
               for cid in set(got.values()))


def test_dedup_dataset_keeps_canonicals_and_uniques(spark):
    from change_data_capturer_ms_spark.operators import dedup_dataset

    base = "the quick brown fox jumps over the lazy dog again and again today"
    # genuinely disjoint token sets — shared templates would legitimately
    # cluster under MinHash at this threshold
    rows = [(i, " ".join(f"w{i}_{j}" for j in range(12))) for i in range(10)]
    rows += [(100, base), (101, base), (102, base + " x")]  # near-dup cluster
    docs = _docs(spark, rows)

    out_exact = dedup_dataset(docs, method="exact")
    ids_exact = {r["doc_id"] for r in out_exact.select("doc_id").collect()}
    assert 100 in ids_exact and 101 not in ids_exact  # exact dup dropped
    assert 102 in ids_exact                            # near-dup kept by exact

    out_mh = dedup_dataset(docs, method="minhash", threshold=0.5)
    ids_mh = {r["doc_id"] for r in out_mh.select("doc_id").collect()}
    assert set(range(10)) <= ids_mh          # uniques untouched
    assert 100 in ids_mh                     # canonical survivor
    assert 101 not in ids_mh and 102 not in ids_mh  # cluster losers dropped

    out_sh = dedup_dataset(docs, method="simhash", max_hamming=3)
    ids_sh = {r["doc_id"] for r in out_sh.select("doc_id").collect()}
    assert 100 in ids_sh and 101 not in ids_sh
