"""Unit + plan tests for the round-2 additions: deterministic hash
split/sampling, pivot/unpivot reshape, per-key change-delta audit, TF-IDF.

Mirrors the reference's unit-test layer (SURVEY.md §5.1: deterministic inputs,
exact assertions) plus the engine's plan-hygiene layer (tests/test_plans.py):
the scale properties — no shuffle where none is needed, no hidden distinct
scan in pivot — are asserted on `explain` output, not assumed.
"""

import math

import pytest
from pyspark.sql import Row, functions as F

from change_data_capturer_ms_spark.operators import (
    change_deltas,
    content_change_audit,
    hash_sample,
    hash_split,
    melt,
    pivot_counts,
    stratified_sample_exact,
    tfidf_top_terms,
)
from change_data_capturer_ms_spark.sources import gen_changelog


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# -- hash split / sampling ---------------------------------------------------

def test_hash_split_partitions_and_is_stable(spark):
    df = spark.range(2000).withColumnRenamed("id", "k")
    s = hash_split(df, "k")
    counts = {r["split"]: r["n"] for r in
              s.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sum(counts.values()) == 2000
    assert set(counts) == {"train", "val", "test"}
    # hash buckets are uniform: 80/10/10 within a few percent at n=2000
    assert 1500 < counts["train"] < 1700
    # membership is a pure function of the key: repartitioning changes nothing
    s2 = hash_split(df.repartition(13), "k")
    assert s.orderBy("k").collect() == s2.orderBy("k").collect()


def test_hash_split_rejects_bad_weights(spark):
    df = spark.range(10).withColumnRenamed("id", "k")
    with pytest.raises(ValueError):
        hash_split(df, "k", splits=(("a", 0.5), ("b", 0.6)))


def test_hash_split_no_shuffle(spark):
    df = spark.range(100).withColumnRenamed("id", "k")
    assert "Exchange" not in _plan(hash_split(df, "k"))
    assert "Exchange" not in _plan(hash_sample(df, "k", 0.25))


def test_hash_sample_fraction_and_salt_independence(spark):
    df = spark.range(5000).withColumnRenamed("id", "k")
    a = hash_sample(df, "k", 0.2, salt="a")
    assert 800 < a.count() < 1200
    # different salts draw (nearly) independent samples
    b = hash_sample(df, "k", 0.2, salt="b")
    overlap = a.join(b, "k").count()
    assert overlap < 0.1 * 5000  # ~0.04 expected


def test_stratified_sample_exact_counts(spark):
    df = spark.createDataFrame(
        [Row(g="x", k=i) for i in range(100)] + [Row(g="y", k=i + 100) for i in range(37)]
    )
    s = stratified_sample_exact(df, ["g"], "k", 0.1)
    got = {r["g"]: r["n"] for r in
           s.groupBy("g").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got == {"x": 10, "y": math.ceil(37 * 0.1)}


# -- pivot / unpivot ---------------------------------------------------------

def test_pivot_melt_round_trip(spark, sf_dir):
    import os
    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    vals = [f"src{i}" for i in range(20)]
    wide = pivot_counts(d, "lang", "source", vals)
    long = melt(wide, ["lang"], vals, var_name="source", value_name="n")
    expect = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("n"))
    assert long.exceptAll(expect).count() == 0
    assert expect.exceptAll(long).count() == 0


def test_pivot_requires_explicit_values(spark):
    df = spark.createDataFrame([Row(a="x", b="p")])
    with pytest.raises(ValueError):
        pivot_counts(df, "a", "b", [])


def test_pivot_is_single_agg_no_extra_scan(spark):
    df = spark.createDataFrame([Row(a="x", b="p"), Row(a="x", b="q")])
    plan = _plan(pivot_counts(df, "a", "b", ["p", "q"]))
    # explicit value list ⇒ one scan feeding (a,b)-count + pivotfirst agg
    # pairs (both partial+final); implicit discovery would add a separate
    # collect-distinct JOB (a second scan) before this plan even exists
    assert plan.count("Scan ") == 1
    assert plan.count("Exchange") <= 2
    assert "pivotfirst" in plan


def test_melt_no_shuffle_and_null_handling(spark):
    df = spark.createDataFrame([Row(k="a", x=1, y=None), Row(k="b", x=None, y=2)])
    out = melt(df, ["k"], ["x", "y"], var_name="col", value_name="v")
    assert "Exchange" not in _plan(out)
    assert sorted((r["k"], r["col"], r["v"]) for r in out.collect()) == [
        ("a", "x", 1), ("b", "y", 2)]
    kept = melt(df, ["k"], ["x", "y"], drop_nulls=False)
    assert kept.count() == 4


# -- change deltas -----------------------------------------------------------

def test_change_deltas_classification(spark):
    df = spark.createDataFrame([
        Row(k="a", seq=1, v=10.0),
        Row(k="a", seq=2, v=10.0),   # unchanged -> noop
        Row(k="a", seq=3, v=12.5),   # changed  -> update
        Row(k="b", seq=1, v=7.0),    # first    -> create
    ])
    out = change_deltas(df, ["k"], [F.col("seq")], "v").orderBy("k", "seq")
    rows = [(r["k"], r["seq"], r["prev_value"], r["delta"], r["change_kind"])
            for r in out.collect()]
    assert rows == [
        ("a", 1, None, None, "create"),
        ("a", 2, 10.0, 0.0, "noop"),
        ("a", 3, 10.0, 2.5, "update"),
        ("b", 1, None, None, "create"),
    ]


def test_change_deltas_single_shuffle(spark):
    df = spark.createDataFrame([Row(k="a", seq=1, v=1.0)])
    plan = _plan(change_deltas(df, ["k"], [F.col("seq")], "v"))
    assert plan.count("Exchange") == 1  # one window shuffle, no self-join


def test_content_change_audit_delete_recreate(spark):
    rows = [
        Row(repo="r", path="p", seq=1, content="aa"),
        Row(repo="r", path="p", seq=2, content="aa"),    # unchanged
        Row(repo="r", path="p", seq=3, content="bbb"),   # changed
        Row(repo="r", path="p", seq=4, content=None),    # tombstone
        Row(repo="r", path="p", seq=5, content="c"),     # re-create
    ]
    out = content_change_audit(spark.createDataFrame(rows)).orderBy("seq")
    got = [(r["change_kind"], r["bytes_delta"]) for r in out.collect()]
    assert got == [("create", 2), ("noop", 0), ("update", 1),
                   ("delete", -3), ("create", 1)]


def test_content_change_audit_on_changelog(spark):
    log = gen_changelog(spark, 500, seed=77)
    out = content_change_audit(log)
    kinds = {r["change_kind"]: r["n"] for r in
             out.groupBy("change_kind").agg(F.count(F.lit(1)).alias("n")).collect()}
    # the classification partitions the whole log
    assert sum(kinds.values()) == 500
    # every delete op in the log (null content) is classified as delete
    assert kinds.get("delete", 0) == log.filter(F.col("op") == "delete").count()
    # at least one create per key whose history starts with a non-delete
    n_keys = log.select("repo", "path").distinct().count()
    assert kinds["create"] >= n_keys - kinds.get("delete", 0)


# -- tf-idf ------------------------------------------------------------------

def test_tfidf_manual_example(spark):
    docs = spark.createDataFrame([
        Row(doc_id=1, text="apple banana apple"),
        Row(doc_id=2, text="banana cherry"),
        Row(doc_id=3, text="banana banana banana"),
    ])
    out = {r["term"]: r for r in tfidf_top_terms(docs, top_k=10).collect()}
    assert out["banana"]["doc_freq"] == 3 and out["banana"]["total_tf"] == 5
    assert out["apple"]["doc_freq"] == 1 and out["apple"]["total_tf"] == 2
    # smoothed idf = ln((N+1)/(df+1)) + 1
    assert abs(out["apple"]["idf"] - (math.log(4 / 2) + 1)) < 1e-4
    assert abs(out["banana"]["tfidf"] - 5 * (math.log(4 / 4) + 1)) < 1e-4
    # deterministic ordering: banana (df 3) first
    ordered = [r["term"] for r in tfidf_top_terms(docs, top_k=10).collect()]
    assert ordered[0] == "banana"


# -- SCD2 history ------------------------------------------------------------

def test_scd2_history_versions_and_currency(spark):
    from change_data_capturer_ms_spark.operators import scd2_history

    rows = [Row(k="a", seq=1, v="x"), Row(k="a", seq=3, v="y"),
            Row(k="a", seq=7, v="y"), Row(k="b", seq=2, v="z")]
    out = scd2_history(spark.createDataFrame(rows), ["k"], [F.col("seq")])
    got = {(r["k"], r["seq"]): (r["version_num"], r["valid_to"], r["is_current"])
           for r in out.collect()}
    assert got == {
        ("a", 1): (1, 3, False),
        ("a", 3): (2, 7, False),
        ("a", 7): (3, None, True),
        ("b", 2): (1, None, True),
    }


def test_scd2_history_single_shuffle(spark):
    from change_data_capturer_ms_spark.operators import scd2_history

    df = spark.range(100).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("seq"))
    plan = _plan(scd2_history(df, ["k"], [F.col("seq")]))
    assert plan.count("Exchange") == 1  # one window shuffle, no self-join


# -- snapshot diff -----------------------------------------------------------

def _diff_rows(spark, seq_old, seq_new):
    from change_data_capturer_ms_spark.operators import snapshot_diff

    rows = [
        Row(k="chg", seq=1, op="upsert", v="old"),
        Row(k="chg", seq=10, op="upsert", v="new"),
        Row(k="add", seq=8, op="upsert", v="born"),
        Row(k="rm", seq=2, op="upsert", v="dead"),
        Row(k="rm", seq=9, op="delete", v=None),
        Row(k="same", seq=3, op="upsert", v="still"),
        Row(k="reborn", seq=1, op="delete", v=None),
        Row(k="reborn", seq=9, op="upsert", v="back"),
        Row(k="future", seq=20, op="upsert", v="later"),
    ]
    return snapshot_diff(spark.createDataFrame(rows), ["k"], "seq", ["v"],
                         seq_old, seq_new, op_col="op")


def test_snapshot_diff_classification(spark):
    out = _diff_rows(spark, seq_old=5, seq_new=15)
    got = {r["k"]: (r["change"], r["old_v"], r["new_v"]) for r in out.collect()}
    # unchanged keys and keys past seq_new never appear
    assert got == {
        "chg": ("changed", "old", "new"),
        "add": ("added", None, "born"),
        "rm": ("removed", "dead", None),
        "reborn": ("added", None, "back"),
    }


def test_snapshot_diff_single_shuffle(spark):
    plan = _plan(_diff_rows(spark, 5, 15))
    # ONE groupBy with conditional max_by — not two states + a join
    assert plan.count("Exchange") == 1
    assert "Join" not in plan


# -- text profile fold -------------------------------------------------------

def test_text_profile_matches_separate_ops(spark):
    from change_data_capturer_ms_spark.operators import (
        lang_id_builtin, quality_scores, text_profile)

    docs = spark.createDataFrame([
        Row(doc_id=1, text="the quick brown fox and the lazy dog"),
        Row(doc_id=2, text="el rapido zorro y el perro de la casa"),
        Row(doc_id=3, text="zzz qqq"),
    ])
    prof = {r["doc_id"]: r.asDict() for r in text_profile(docs).collect()}
    qual = {r["doc_id"]: r.asDict() for r in quality_scores(docs).collect()}
    lang = {r["doc_id"]: r.asDict() for r in lang_id_builtin(docs).collect()}
    for i in (1, 2, 3):
        merged = {**qual[i], **lang[i]}
        assert prof[i] == merged
    assert "Exchange" not in _plan(text_profile(docs))


def test_weighted_hash_sample(spark):
    from change_data_capturer_ms_spark.operators import weighted_hash_sample

    df = spark.createDataFrame(
        [(i, 1.0 if i < 100 else (0.0 if i < 200 else 0.3))
         for i in range(2200)],
        "doc_id long, w double",
    )
    kept = weighted_hash_sample(df, "doc_id", "w").collect()
    ids = {r["doc_id"] for r in kept}
    assert all(i in ids for i in range(100))        # p=1 always kept
    assert all(i not in ids for i in range(100, 200))  # p=0 never kept
    frac = sum(1 for i in ids if i >= 200) / 2000
    assert 0.2 <= frac <= 0.4                        # p=0.3 in expectation
    # determinism: membership survives repartitioning
    again = {r["doc_id"]
             for r in weighted_hash_sample(df.repartition(13), "doc_id", "w")
             .collect()}
    assert again == ids
    # out-of-range weights clamp instead of misbehaving
    oob = spark.createDataFrame([(1, 7.5), (2, -3.0)], "doc_id long, w double")
    got = {r["doc_id"] for r in weighted_hash_sample(oob, "doc_id", "w").collect()}
    assert got == {1}
