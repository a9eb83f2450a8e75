"""Connected components (operators/graph.py): fixpoint labels vs a pure-Python
union-find reference, long-chain convergence (the case naive min-propagation
can't finish in log rounds), and the end-to-end keep-canonical dedup."""

import pytest
from hypothesis import given, settings, strategies as st

from change_data_capturer_ms_spark.operators import (
    component_stats,
    connected_components,
    dedup_keep_canonical,
)


def _uf_components(n_nodes, edges):
    """Union-find reference: node -> min id of its component."""
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in range(n_nodes)}


def _labels(spark, edges, **kw):
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "id_a long, id_b long"
    )
    return {
        r["id"]: r["component"]
        for r in connected_components(df, **kw).collect()
    }


def test_two_triangles_and_a_bridge(spark):
    edges = [(0, 1), (1, 2), (2, 0), (10, 11), (11, 12), (2, 10), (20, 21)]
    got = _labels(spark, edges)
    assert got == {0: 0, 1: 0, 2: 0, 10: 0, 11: 0, 12: 0, 20: 20, 21: 20}


def test_long_chain_converges(spark):
    # path 0-1-2-...-63: diameter 63, must still converge well inside the
    # 30-round bound (large-star/small-star is O(log^2 n), not O(diameter))
    edges = [(i, i + 1) for i in range(63)]
    got = _labels(spark, edges)
    assert got == {i: 0 for i in range(64)}


def test_duplicate_and_reversed_edges(spark):
    got = _labels(spark, [(5, 3), (3, 5), (5, 3), (7, 7)])
    # self-loop only: node 7 has no real edge -> absent from the labeling
    assert got == {3: 3, 5: 3}


@settings(max_examples=6, deadline=None)
@given(st.lists(
    st.tuples(st.integers(0, 39), st.integers(0, 39)),
    min_size=1, max_size=60,
))
def test_matches_union_find(spark, edges):
    edges = [(a, b) for a, b in edges if a != b]
    got = _labels(spark, edges)
    want = _uf_components(40, edges)
    seen = {n for a, b in edges for n in (a, b)}
    assert got == {n: want[n] for n in seen}


def test_component_stats(spark):
    df = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11)], "id_a long, id_b long"
    )
    labels = connected_components(df)
    stats = {r["component"]: r["n_members"]
             for r in component_stats(labels).collect()}
    assert stats == {0: 3, 10: 2}


def test_dedup_keep_canonical(spark):
    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in range(8)], "doc_id long, text string"
    )
    # components {1,2,3} and {5,6}; 0,4,7 are singletons
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "id_a long, id_b long"
    )
    kept = sorted(
        r["doc_id"] for r in dedup_keep_canonical(docs, pairs).collect()
    )
    assert kept == [0, 1, 4, 5, 7]


def test_non_convergence_raises(spark):
    df = spark.createDataFrame([(0, 1), (1, 2)], "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="no fixpoint"):
        connected_components(df, max_iter=0)


def test_durable_checkpoint_identical_labels(spark, tmp_path):
    """checkpoint_dir (real-cluster fault-tolerant path) must produce the
    exact same labeling as the default localCheckpoint path — the knob changes
    failure semantics, never results."""
    edges = [(0, 1), (1, 2), (2, 0), (10, 11), (11, 12), (2, 10), (20, 21),
             *[(100 + i, 101 + i) for i in range(20)]]
    local = _labels(spark, edges)
    durable = _labels(spark, edges, checkpoint_dir=str(tmp_path / "cc_ckpt"))
    assert durable == local
    # the durable path actually wrote checkpoint blocks
    import glob
    assert glob.glob(str(tmp_path / "cc_ckpt" / "*" / "*"))


def test_duplicate_clusters_durable_checkpoint(spark, tmp_path):
    from change_data_capturer_ms_spark.operators.dedup_docs import (
        duplicate_clusters,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    want = {r["id"]: r["cluster_id"] for r in duplicate_clusters(pairs).collect()}
    got = {
        r["id"]: r["cluster_id"]
        for r in duplicate_clusters(
            pairs, checkpoint_dir=str(tmp_path / "dc_ckpt")
        ).collect()
    }
    assert got == want == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}
