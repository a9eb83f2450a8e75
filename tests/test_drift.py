"""Distribution drift (histogram/PSI) vs a pure-python reference."""

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from change_data_capturer_ms_spark.operators.drift import (
    category_freq,
    histogram,
    psi,
    psi_terms,
)


def _py_psi(old_vals, new_vals, bins, lo, hi, eps=1e-6):
    def binned(vals):
        counts = [0] * (bins + 2)
        for v in vals:
            if v < lo:
                b = 0
            elif v >= hi:
                b = bins + 1
            else:
                b = 1 + int((v - lo) / (hi - lo) * bins)
            counts[b] += 1
        return counts
    co, cn = binned(old_vals), binned(new_vals)
    to, tn = max(sum(co), 1), max(sum(cn), 1)
    s = 0.0
    for a, b in zip(co, cn):
        if a == 0 and b == 0:
            continue  # bin absent from the outer join entirely
        p, q = max(a / to, eps), max(b / tn, eps)
        s += (q - p) * math.log(q / p)
    return s


class TestHistogram:
    def test_bins_match_reference_with_under_overflow(self, spark):
        vals = [-5.0, 0.0, 0.5, 4.9, 5.0, 9.9, 10.0, 42.0]
        df = spark.createDataFrame([Row(x=v) for v in vals])
        got = {r["bin"]: r["n"] for r in histogram(df, "x", 2, 0.0, 10.0).collect()}
        # -5 underflow; 0,0.5,4.9 bin1; 5,9.9 bin2; 10,42 overflow
        assert got == {0: 1, 1: 3, 2: 2, 3: 2}

    def test_nulls_excluded_and_validation(self, spark):
        df = spark.createDataFrame([Row(x=1.0), Row(x=None)])
        assert histogram(df, "x", 4, 0.0, 2.0).agg(F.sum("n")).first()[0] == 1
        with pytest.raises(ValueError):
            histogram(df, "x", 0, 0.0, 1.0)
        with pytest.raises(ValueError):
            histogram(df, "x", 4, 1.0, 1.0)

    def test_plan_single_agg_no_udf(self, spark):
        df = spark.createDataFrame([Row(x=float(i)) for i in range(100)])
        plan = histogram(df, "x", 10, 0.0, 100.0) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "python" not in plan.lower() and "Join" not in plan
        assert plan.count("Exchange") == 1  # one shuffle: the groupBy


class TestPSI:
    def test_identical_distributions_score_zero(self, spark):
        df = spark.createDataFrame([Row(x=float(i % 17)) for i in range(500)])
        assert psi(df, df, "x", bins=8, lo=0.0, hi=17.0) == pytest.approx(0.0)

    def test_matches_python_reference(self, spark):
        old_vals = [float((i * 7) % 50) for i in range(400)]
        new_vals = [float((i * 7) % 50) * 1.4 + 5 for i in range(300)]
        old = spark.createDataFrame([Row(x=v) for v in old_vals])
        new = spark.createDataFrame([Row(x=v) for v in new_vals])
        got = psi(old, new, "x", bins=10, lo=0.0, hi=50.0)
        want = _py_psi(old_vals, new_vals, 10, 0.0, 50.0)
        assert got == pytest.approx(want, rel=1e-9)

    def test_shift_detected_above_threshold(self, spark):
        old = spark.createDataFrame([Row(x=float(i % 20)) for i in range(1000)])
        new = spark.createDataFrame([Row(x=float(i % 20) + 12) for i in range(1000)])
        assert psi(old, new, "x", bins=10, lo=0.0, hi=20.0) > 0.2

    def test_default_bounds_from_reference_side(self, spark):
        old = spark.createDataFrame([Row(x=float(i)) for i in range(100)])
        assert psi(old, old, "x", bins=5) == pytest.approx(0.0)
        const = spark.createDataFrame([Row(x=1.0)])
        with pytest.raises(ValueError, match="empty/constant"):
            psi(const, const, "x")

    def test_categorical_with_null_category(self, spark):
        old = spark.createDataFrame(
            [Row(lang="py")] * 50 + [Row(lang="go")] * 50)
        new = spark.createDataFrame(
            [Row(lang="py")] * 30 + [Row(lang="go")] * 30 + [Row(lang=None)] * 40)
        terms = psi_terms(old, new, "lang", categorical=True).collect()
        cats = {r["cat"] for r in terms}
        assert None in cats  # sudden NULLs ARE drift
        score = psi(old, new, "lang", categorical=True)
        assert score > 0.2

    def test_terms_show_which_bin_moved(self, spark):
        old = spark.createDataFrame([Row(x=1.0)] * 90 + [Row(x=5.0)] * 10)
        new = spark.createDataFrame([Row(x=1.0)] * 10 + [Row(x=5.0)] * 90)
        terms = {r["bin"]: r for r in
                 psi_terms(old, new, "x", bins=2, lo=0.0, hi=6.0).collect()}
        # both populated bins carry large positive contributions
        assert terms[1]["psi_term"] > 0.5 and terms[2]["psi_term"] > 0.5

    def test_freq_counts(self, spark):
        df = spark.createDataFrame([Row(lang="py"), Row(lang="py"), Row(lang=None)])
        got = {r["cat"]: r["n"] for r in category_freq(df, "lang").collect()}
        assert got == {"py": 2, None: 1}


class TestMonitor:
    def test_psi_from_counts_matches_dataframe_path(self, spark):
        from change_data_capturer_ms_spark.operators import psi_from_counts

        old = {"py": 50, "go": 50}
        new = {"py": 30, "go": 30, "rs": 40}
        assert psi_from_counts(old, old) == pytest.approx(0.0)
        old_df = spark.createDataFrame(
            [Row(lang=k) for k, n in old.items() for _ in range(n)])
        new_df = spark.createDataFrame(
            [Row(lang=k) for k, n in new.items() for _ in range(n)])
        assert psi_from_counts(old, new) == pytest.approx(
            psi(old_df, new_df, "lang", categorical=True), rel=1e-9)

    def test_pipeline_monitor_records_counts_and_scores_drift(
            self, spark, tmpdir_path):
        """Opt-in monitor: per-batch top-K lang counts ride the lease; a
        batch that shifts the mix scores PSI > 0.2 with no further Spark
        jobs (monitor_drift reads lease history only)."""
        from change_data_capturer_ms_spark.config import EngineConfig
        from change_data_capturer_ms_spark.lake.table import LakeTable
        from change_data_capturer_ms_spark.sources import gen_changelog
        from change_data_capturer_ms_spark.streaming import CDCPipeline

        table = LakeTable(spark, f"{tmpdir_path}/t", key_cols=["repo", "path"],
                          n_buckets=4)
        pipe = CDCPipeline(spark, f"{tmpdir_path}/l", table, f"{tmpdir_path}/c",
                           cfg=EngineConfig(n_buckets=4), use_pandas_udfs=False,
                           monitor_cols=["lang"])
        b1 = gen_changelog(spark, 600, seed=30, n_repos=6, paths_per_repo=4)
        b2 = (gen_changelog(spark, 600, seed=31, n_repos=6, paths_per_repo=4,
                            start_seq=600)
              .withColumn("lang", F.lit("zz")))  # sudden single-language mix
        pipe.apply_batch(b1, batch_id=0)
        assert "lang" in pipe.current_lease()["monitor"]
        pipe.apply_batch(b2, batch_id=1)
        assert pipe.current_lease()["monitor"]["lang"] == {"zz": 600}

        scores = pipe.monitor_drift("lang")
        assert len(scores) == 1 and scores[0]["psi"] > 0.2

    def test_monitor_summary_is_one_job_for_many_columns(
            self, spark, tmpdir_path):
        """N monitored columns must NOT mean N scans of the batch: the
        GROUPING SETS summary launches the same number of Spark jobs for 3
        columns as for 1, and matches the per-column groupBy/top-K result
        (including the native-type count tiebreak) exactly."""
        from change_data_capturer_ms_spark.config import EngineConfig
        from change_data_capturer_ms_spark.lake.table import LakeTable
        from change_data_capturer_ms_spark.sources import gen_changelog
        from change_data_capturer_ms_spark.streaming import CDCPipeline

        table = LakeTable(spark, f"{tmpdir_path}/t", key_cols=["repo", "path"],
                          n_buckets=4)

        def mk(cols):
            return CDCPipeline(spark, f"{tmpdir_path}/l", table,
                               f"{tmpdir_path}/c", cfg=EngineConfig(n_buckets=4),
                               use_pandas_udfs=False, monitor_cols=cols,
                               monitor_top_k=5)

        df = gen_changelog(spark, 800, seed=32, n_repos=6, paths_per_repo=4)
        df = df.filter(F.col("op").isin("insert", "update", "delete")).cache()
        df.count()

        def jobs_for(pipe, group):
            sc = spark.sparkContext
            sc.setJobGroup(group, group)
            out = pipe._monitor_summary(df)
            sc.setJobGroup("", "")
            return out, len(sc.statusTracker().getJobIdsForGroup(group))

        got3, n3 = jobs_for(mk(["lang", "repo", "op"]), "mon3")
        _, n1 = jobs_for(mk(["lang"]), "mon1")
        assert n3 == n1  # job count independent of monitored-column count

        # value parity with the old one-job-per-column shape
        for c in ("lang", "repo", "op"):
            rows = (df.groupBy(c).agg(F.count(F.lit(1)).alias("n"))
                    .orderBy(F.desc("n"), F.col(c)).limit(5).collect())
            want = {("<null>" if r[c] is None else str(r[c])): int(r["n"])
                    for r in rows}
            assert got3[c] == want, c
        df.unpersist()

    def test_monitor_summary_survives_reserved_like_column_names(
            self, spark, tmpdir_path):
        """Monitored columns literally named `gid`, `n` or `_rk` must not
        collide with the summary's internal aliases (AMBIGUOUS_REFERENCE
        would fail every micro-batch AFTER its merge committed)."""
        from change_data_capturer_ms_spark.config import EngineConfig
        from change_data_capturer_ms_spark.lake.table import LakeTable
        from change_data_capturer_ms_spark.streaming import CDCPipeline

        table = LakeTable(spark, f"{tmpdir_path}/t", key_cols=["repo", "path"],
                          n_buckets=4)
        pipe = CDCPipeline(spark, f"{tmpdir_path}/l", table, f"{tmpdir_path}/c",
                           cfg=EngineConfig(n_buckets=4),
                           use_pandas_udfs=False,
                           monitor_cols=["gid", "n", "_rk"], monitor_top_k=3)
        df = spark.createDataFrame(
            [Row(gid="a", n=i % 2, _rk=float(i)) for i in range(10)])
        got = pipe._monitor_summary(df)
        assert got["gid"] == {"a": 10}
        assert got["n"] == {"0": 5, "1": 5}
        assert len(got["_rk"]) == 3
