"""Global plan hygiene over the ENTIRE driver query surface: every one of the
50 `queries()` entries must be free of per-row Python in the hot path (Arrow
UDF queries are explicitly declared) and free of unbounded cartesian products.
This is the sweeping version of tests/test_plans.py — a new operator fold
cannot silently smuggle a Python row loop or an all-pairs join into the gate.
"""

import pytest

import __spark_entry__ as entrymod

# Queries that legitimately run Arrow-batched Python (pandas UDF /
# applyInPandas / mapInPandas) — the DECLARED seams, every one vectorized
# batch-at-a-time, never row-at-a-time:
ARROW_OK = {
    "classify_op",             # pandas-UDF op classification (E5)
    "grouped_map_normalize",   # applyInPandas grouped map (E22)
    "grouped_agg_weighted",    # pandas grouped-agg (E22)
    "stateful_running_stats",  # applyInPandasWithState (E22)
    "multimodal_pipeline",     # mapInPandas media decode seam
}

# Queries whose CONSTRUCTION runs real lake work (merges/streams) — heavy, and
# their plan hygiene is asserted by their own dedicated tests. Checked here
# only for Python nodes if cheap, else skipped.
HEAVY = {
    "merge_upsert", "time_travel", "point_lookup", "incr_agg",
    "union_evolution", "snapshot_cdc", "drift_psi", "cdc_streaming_state",
    "streaming_window_counts", "snapshot_diff", "scd2_history",
}

PY_NODES = ("BatchEvalPython",)  # row-at-a-time Python: never acceptable
ARROW_NODES = ("ArrowEvalPython", "FlatMapGroupsInPandas", "MapInPandas",
               "FlatMapGroupsInPandasWithState")


@pytest.fixture(scope="module")
def plans(spark):
    out = {}
    for name, fn in entrymod.queries().items():
        if name in HEAVY:
            continue
        df = fn(spark, "/root/testdata/sf0.001")
        out[name] = df._jdf.queryExecution().executedPlan().toString()
    return out


def test_no_row_at_a_time_python_anywhere(plans):
    bad = [n for n, p in plans.items() if any(x in p for x in PY_NODES)]
    assert bad == [], f"row-at-a-time Python UDF in: {bad}"


def test_arrow_python_only_where_declared(plans):
    undeclared = [
        n for n, p in plans.items()
        if n not in ARROW_OK and any(x in p for x in ARROW_NODES)
    ]
    assert undeclared == [], f"undeclared Arrow-Python seams in: {undeclared}"


def test_no_cartesian_products(plans):
    # An unbounded CartesianProduct is never acceptable. A
    # BroadcastNestedLoopJoin is acceptable ONLY where the broadcast side is
    # bounded by construction:
    #  - embed_knn_methods: the labeled exact-kNN baseline (broadcast = the
    #    query batch; the LSH path in the same query is the scale shape)
    #  - embed_ivf_ann: vectors × K centroid literals (broadcast = K rows —
    #    the canonical IVF assignment shape)
    #  - tfidf_top_terms: terms × ONE corpus-count row
    #  - embed_near_dup: r4 semdedup fold — vectors × 8 broadcast centroids
    #    (the same bounded IVF-assignment shape as embed_ivf_ann)
    BNL_OK = {"embed_knn_methods", "embed_ivf_ann", "tfidf_top_terms",
              "embed_near_dup"}
    bad = [n for n, p in plans.items() if "CartesianProduct" in p]
    assert bad == [], f"cartesian product in: {bad}"
    bnl = [n for n, p in plans.items()
           if "BroadcastNestedLoopJoin" in p and n not in BNL_OK]
    assert bnl == [], f"unexpected nested-loop join in: {bnl}"
