"""Z-order clustering: interleave math, multi-column locality, lake rewrite."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from change_data_capturer_ms_spark.functions.zorder import zorder_key


def _py_interleave(vals, bits):
    """Pure-python MSB-first Morton reference."""
    z = 0
    for b in range(bits - 1, -1, -1):
        for v in vals:
            z = (z << 1) | ((v >> b) & 1)
    return z


class TestZOrderKey:
    def test_interleave_matches_python_reference(self, spark):
        # x,y already span [0, 2^4) so min-max scaling maps i -> i exactly
        bits = 4
        rows = [Row(x=x, y=y) for x in range(16) for y in range(16)]
        df = spark.createDataFrame(rows)
        got = {(r["x"], r["y"]): r["z"]
               for r in df.withColumn("z", zorder_key(df, ["x", "y"], bits=bits)).collect()}
        for x in range(16):
            for y in range(16):
                assert got[(x, y)] == _py_interleave((x, y), bits), (x, y)

    def test_string_prefix_packing_preserves_lex_prefix_order(self, spark):
        df = spark.createDataFrame([Row(s=s) for s in ["", "a", "ab", "az", "b", "ba"]])
        out = df.withColumn("z", zorder_key(df, ["s"], bits=16)).collect()
        by_s = {r["s"]: r["z"] for r in out}
        # packing the first 2 codepoints big-endian keeps prefix order
        assert by_s[""] < by_s["a"] < by_s["ab"] < by_s["az"] < by_s["b"] < by_s["ba"]

    def test_validation(self, spark):
        df = spark.createDataFrame([Row(x=1, y=2)])
        with pytest.raises(ValueError, match="exceeds a long"):
            zorder_key(df, ["x", "y"], bits=32)
        with pytest.raises(ValueError, match="at least one"):
            zorder_key(df, [])
        arr = spark.createDataFrame([Row(a=[1, 2])])
        with pytest.raises(ValueError, match="unsupported column type"):
            zorder_key(arr, ["a"])

    def test_plan_is_codegen_only(self, spark):
        df = spark.createDataFrame([Row(x=1, y=2)])
        out = df.withColumn("z", zorder_key(df, ["x", "y"]))
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "python" not in plan.lower()

    def test_zorder_clusters_both_dimensions(self, spark):
        """Chunks of the z-ordered sequence are tight in BOTH x and y;
        a linear sort on x leaves y unclustered — the property that makes
        multi-column min/max pruning work."""
        import random

        rng = random.Random(7)
        rows = [Row(x=rng.randrange(4096), y=rng.randrange(4096))
                for _ in range(4096)]
        df = spark.createDataFrame(rows).coalesce(1)
        zed = [(r["x"], r["y"]) for r in
               df.sort(zorder_key(df, ["x", "y"], bits=12)).collect()]
        linear = sorted((r["x"], r["y"]) for r in rows)

        def avg_chunk_range(seq, dim, chunk=64):
            spans = []
            for i in range(0, len(seq), chunk):
                vals = [t[dim] for t in seq[i:i + chunk]]
                spans.append(max(vals) - min(vals))
            return sum(spans) / len(spans)

        full = 4096
        # z-order: both dimensions clustered well below the full range
        assert avg_chunk_range(zed, 0) < full / 3
        assert avg_chunk_range(zed, 1) < full / 3
        # linear sort: first dim extremely tight, second dim ~unclustered
        assert avg_chunk_range(linear, 0) < full / 16
        assert avg_chunk_range(linear, 1) > full / 2


class TestCompactZorder:
    def test_compact_zorder_preserves_state_and_clusters(self, spark, tmpdir_path):
        from tests.test_invariants import _pipe, _state
        from change_data_capturer_ms_spark.sources import gen_changelog

        pipe, _ = _pipe(spark, tmpdir_path, write_mode="mor")
        pipe.apply_batch(gen_changelog(spark, 600, seed=13), batch_id=0)
        pipe.apply_batch(gen_changelog(spark, 300, seed=13, start_seq=600),
                         batch_id=1)
        before = _state(pipe.table)
        with pytest.raises(ValueError, match="mutually exclusive"):
            pipe.table.compact(sort_cols=["repo"], zorder_cols=["repo"])
        res = pipe.table.compact(zorder_cols=["repo", "_last_seq"])
        assert res["compacted_buckets"] > 0
        assert _state(pipe.table).equals(before)
        # the temp sort key must not leak into the written files
        cols = pipe.table.read(include_deleted=True).columns
        assert "_zkey" not in cols
