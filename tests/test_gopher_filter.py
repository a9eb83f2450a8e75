"""gopher_filter (operators/text.py): rule tagging, NULL-metric pass-through
(three-valued-logic safety), and composition over the real profile pass."""

from pyspark.sql import functions as F

from change_data_capturer_ms_spark.operators import (
    gopher_filter,
    gopher_rules,
    repetition_profile,
    text_profile,
)

PROFILE_SCHEMA = (
    "doc_id long, n_tokens int, mean_tok_len double, distinct_ratio double, "
    "stopword_ratio double, dup_line_frac double, top_g2_frac double, "
    "dup_g5_frac double"
)


def _run(spark, rows):
    df = spark.createDataFrame(rows, PROFILE_SCHEMA)
    return {
        r["doc_id"]: (r["keep"], list(r["drop_reasons"]))
        for r in gopher_filter(df).collect()
    }


def test_rules_tag_and_keep(spark):
    got = _run(spark, [
        # clean doc
        (0, 100, 5.0, 0.5, 0.05, 0.0, 0.1, 0.0),
        # too short + no stopwords
        (1, 10, 5.0, 0.5, 0.0, 0.0, 0.1, 0.0),
        # repetitive on all three repetition axes
        (2, 100, 5.0, 0.5, 0.05, 0.9, 0.9, 0.9),
        # mean token length out of range (too long) + low diversity
        (3, 100, 25.0, 0.05, 0.05, 0.0, 0.1, 0.0),
    ])
    assert got[0] == (True, [])
    assert got[1] == (False, ["n_tokens", "no_stopwords"])
    assert got[2] == (False, ["dup_lines", "top_2gram", "dup_5gram"])
    assert got[3] == (False, ["mean_tok_len", "low_diversity"])


def test_null_metrics_pass(spark):
    # NULL repetition metrics (doc too short for a 5-gram) must NOT drop
    got = _run(spark, [(0, 100, 5.0, 0.5, 0.05, None, None, None)])
    assert got[0] == (True, [])


def test_custom_rules_lang(spark):
    df = spark.createDataFrame(
        [(0, "en"), (1, "und")], "doc_id long, lang_guess string"
    )
    rules = [r for r in gopher_rules(require_lang="en") if r[0] == "lang"]
    got = {
        r["doc_id"]: r["keep"] for r in gopher_filter(df, rules=rules).collect()
    }
    assert got == {0: True, 1: False}


def test_composes_over_real_profile(spark, sf_dir=None):
    docs = spark.createDataFrame(
        [
            (0, " ".join(f"w{i} the of and to in" for i in range(20))),
            (1, "tiny doc"),
        ],
        "doc_id long, text string",
    )
    prof = text_profile(docs).join(
        repetition_profile(docs).withColumnRenamed("id", "doc_id"),
        "doc_id", "left",
    )
    out = gopher_filter(prof)
    got = {r["doc_id"]: r["keep"] for r in out.collect()}
    assert got[1] is False  # 2 tokens < 50
    # the long doc passes length/stopwords; repetition of 'the of and to in'
    # 2-grams makes top_2gram fire — either way the decision is deterministic
    assert isinstance(got[0], bool)
    # no UDF / no extra shuffle: the filter is a projection over the profile
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
