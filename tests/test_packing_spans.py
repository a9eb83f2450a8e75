"""Sequence packing (operators/packing.py) and exact-substring duplicate spans
(operators/dedup_docs.duplicate_spans) — the training-data layout + byte-level
dedup operators."""

import pytest
from pyspark.sql import functions as F

from change_data_capturer_ms_spark.operators.dedup_docs import duplicate_spans
from change_data_capturer_ms_spark.operators.packing import (
    pack_bins_greedy,
    pack_concat_chunks,
)


def _docs(spark, sizes):
    return spark.createDataFrame(
        [(f"d{i:03d}", n) for i, n in enumerate(sizes)],
        "doc_id string, n_tokens long")


class TestConcatChunks:
    def test_gapless_and_span_math(self, spark):
        df = _docs(spark, [10, 20, 30, 4000, 50, 60, 70, 80, 90, 5])
        rows = (pack_concat_chunks(df, budget=100, n_shards=2)
                .orderBy("shard", "start_offset").collect())
        toks = dict(df.collect())
        offset = {}
        for r in rows:
            got = offset.get(r["shard"], 0)
            assert r["start_offset"] == got, "stream must be gapless per shard"
            n = toks[r["doc_id"]]
            assert r["chunk"] == got // 100
            assert r["n_chunks_spanned"] == (got + n - 1) // 100 - got // 100 + 1
            offset[r["shard"]] = got + n

    def test_deterministic_across_repartition(self, spark):
        df = _docs(spark, list(range(1, 200)))
        a = pack_concat_chunks(df, budget=256, n_shards=8).orderBy("doc_id")
        b = pack_concat_chunks(df.repartition(13), budget=256,
                               n_shards=8).orderBy("doc_id")
        assert [tuple(r) for r in a.collect()] == [tuple(r) for r in b.collect()]

    def test_zero_budget_rejected(self, spark):
        with pytest.raises(ValueError):
            pack_concat_chunks(_docs(spark, [1]), budget=0)


class TestGreedyBins:
    def test_bins_never_exceed_budget(self, spark):
        sizes = [1000, 24, 1000, 500, 2049, 3, 2048, 700, 700, 700, 1, 1]
        out = pack_bins_greedy(_docs(spark, sizes), budget=2048,
                               n_shards=2).collect()
        assert len(out) == len(sizes)
        toks = {f"d{i:03d}": n for i, n in enumerate(sizes)}
        sums, members = {}, {}
        for r in out:
            k = (r["shard"], r["bin"])
            sums[k] = sums.get(k, 0) + toks[r["doc_id"]]
            members.setdefault(k, []).append(r)
            assert r["oversize"] == (toks[r["doc_id"]] > 2048)
        for k, s in sums.items():
            if not any(m["oversize"] for m in members[k]):
                assert s <= 2048, f"bin {k} overflows: {s}"
            else:
                assert len(members[k]) == 1, "oversize doc must sit alone"
        # offsets are the running fill inside each bin
        for k, ms in members.items():
            ms.sort(key=lambda r: r["bin_offset"])
            fill = 0
            for m in ms:
                assert m["bin_offset"] == fill
                fill += toks[m["doc_id"]]

    def test_matches_concat_order(self, spark):
        """Greedy bins walk the same deterministic hash order as concat-chunk —
        the two layouts agree on the stream, only the cut rule differs."""
        df = _docs(spark, [7, 11, 13, 17, 19, 23, 29, 31])
        chunk_order = {(r["shard"], r["start_offset"]): r["doc_id"]
                       for r in pack_concat_chunks(df, budget=50, n_shards=2).collect()}
        bin_rows = pack_bins_greedy(df, budget=50, n_shards=2).collect()
        # reconstruct greedy order per shard: (bin, bin_offset) is lexicographic
        for shard in {r["shard"] for r in bin_rows}:
            greedy = [r["doc_id"] for r in sorted(
                (r for r in bin_rows if r["shard"] == shard),
                key=lambda r: (r["bin"], r["bin_offset"]))]
            concat = [v for (s, _), v in sorted(
                ((k, v) for k, v in chunk_order.items() if k[0] == shard))]
            assert greedy == concat


class TestDuplicateSpans:
    def test_shared_substring_folds_to_one_maximal_span(self, spark):
        shared = " ".join(f"s{i}" for i in range(12))  # 12 shared tokens
        df = spark.createDataFrame([
            ("a", "x0 x1 x2 " + shared + " x3 x4"),
            ("b", "y0 " + shared + " y1 y2 y3"),
            ("c", "z0 z1 z2 z3 z4 z5 z6 z7 z8 z9"),
        ], "doc_id string, text string")
        out = duplicate_spans(df, n=8).collect()
        spans = {r["id"]: (r["span_start"], r["span_end"], r["n_windows"])
                 for r in out}
        # doc a: shared tokens occupy positions 3..14; 12-token run with n=8
        # yields 5 overlapping windows folded into ONE island
        assert spans["a"] == (3, 14, 5)
        assert spans["b"] == (1, 12, 5)
        assert "c" not in spans
        assert len(out) == 2

    def test_two_disjoint_spans_stay_separate(self, spark):
        s1 = " ".join(f"p{i}" for i in range(8))
        s2 = " ".join(f"q{i}" for i in range(8))
        df = spark.createDataFrame([
            ("a", s1 + " mid1 mid2 mid3 " + s2),
            ("b", s1 + " other filler words " + s2),
        ], "doc_id string, text string")
        out = duplicate_spans(df, n=8)
        assert out.filter(F.col("id") == "a").count() == 2

    def test_df_cap_drops_boilerplate(self, spark):
        header = " ".join(f"h{i}" for i in range(8))
        df = spark.createDataFrame(
            [(f"d{i}", header + f" body{i} tail{i} end{i}") for i in range(6)],
            "doc_id string, text string")
        assert duplicate_spans(df, n=8, df_cap=3).count() == 0
        assert duplicate_spans(df, n=8, df_cap=100).count() == 6

    def test_runs_on_sf_documents(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        out = duplicate_spans(docs, text_col="text", id_col="doc_id", n=6)
        # deterministic corpus: just assert the operator runs and bounds hold
        rows = out.limit(2000).collect()
        for r in rows:
            assert r["span_end"] >= r["span_start"] + 5
            assert r["n_windows"] >= 1
