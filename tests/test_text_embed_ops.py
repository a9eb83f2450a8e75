"""Winnowing fingerprints + embedding normalize/quantize operators."""

import hashlib

import numpy as np
from pyspark.sql import functions as F

from change_data_capturer_ms_spark.operators import (
    dequantize_embeddings,
    normalize_embeddings,
    quantize_embeddings_int8,
    winnow_fingerprints,
)


def _md5_56(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:14], 16)


def _winnow_ref(text: str, n: int, window: int) -> set[tuple[int, int]]:
    """Pure-python reference of the MOSS winnowing scheme (rightmost min)."""
    words = text.split(" ")
    if len(words) < n:
        return set()
    hashes = [_md5_56(" ".join(words[i:i + n])) for i in range(len(words) - n + 1)]
    out = set()
    if len(hashes) < window:
        windows = [0]
    else:
        windows = range(len(hashes) - window + 1)
    for s in windows:
        win = hashes[s:s + window]
        m = min(win)
        # rightmost instance of the min
        j = max(i for i, h in enumerate(win) if h == m)
        out.add((s + j, m))
    return out


def test_winnow_matches_reference_scheme(spark):
    texts = [
        (0, "a b c d e f g h i j k l m"),
        (1, "x y z x y z x y z x y z"),          # repeats force hash ties
        (2, "one two three four"),                # exactly n words -> 1 shingle
        (3, "short doc here now ok"),             # fewer shingles than window
        (4, "a b"),                               # shorter than n -> no output
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {}
    for r in winnow_fingerprints(df, n=4, window=4).collect():
        got.setdefault(r["id"], set()).add((r["fp_pos"], r["fp_hash"]))
    for i, t in texts:
        want = _winnow_ref(t, 4, 4)
        assert got.get(i, set()) == want, (i, got.get(i), want)


def test_winnow_shared_substring_guarantee(spark):
    """Two docs sharing a ≥ window+n-1 word run must share a fingerprint hash."""
    shared = "alpha beta gamma delta epsilon zeta eta"  # 7 = 4+4-1 words
    df = spark.createDataFrame(
        [(0, f"xx yy {shared} zz"), (1, f"{shared} unrelated tail words")],
        "doc_id long, text string",
    )
    fps = winnow_fingerprints(df, n=4, window=4)
    a = {r["fp_hash"] for r in fps.filter(F.col("id") == 0).collect()}
    b = {r["fp_hash"] for r in fps.filter(F.col("id") == 1).collect()}
    assert a & b, "shared run must produce at least one common fingerprint"


def test_normalize_and_quantize_roundtrip(spark):
    rows = [(0, [3.0, 4.0]), (1, [0.0, 0.0]), (2, [-1.5, 2.5]), (3, [127.0, -0.5])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    unit = {r["vec_id"]: (r["unit"], r["norm"])
            for r in normalize_embeddings(df).collect()}
    assert abs(np.linalg.norm(unit[0][0]) - 1.0) < 1e-12
    assert unit[0][0] == [0.6, 0.8] and unit[0][1] == 5.0
    assert unit[1][0] == [0.0, 0.0]  # zero vector passes through

    q = quantize_embeddings_int8(df)
    deq = {r["vec_id"]: r["embedding"] for r in dequantize_embeddings(q).collect()}
    for vid, vec in rows:
        scale = max(abs(x) for x in vec) / 127.0
        for orig, rec in zip(vec, deq[vid]):
            assert abs(orig - rec) <= (scale / 2 + 1e-12) if scale else rec == 0.0
    # int8 domain respected
    for r in q.collect():
        assert all(-127 <= x <= 127 for x in r["q"])


# -- PII redaction -----------------------------------------------------------

class TestRedactPII:
    def test_redacts_and_counts(self, spark):
        from pyspark.sql import Row
        from change_data_capturer_ms_spark.operators import redact_pii

        df = spark.createDataFrame([
            Row(doc_id=1, text="mail a@b.com or c.d+x@e.org, call +1 (555) 123-4567"),
            Row(doc_id=2, text="server 10.0.0.1 ssn 123-45-6789"),
            Row(doc_id=3, text="clean text, no pii at all"),
        ])
        out = {r["doc_id"]: r for r in redact_pii(df).collect()}
        assert out[1]["n_email"] == 2 and out[1]["n_phone"] == 1
        assert "[PII:email]" in out[1]["text_redacted"]
        assert "a@b.com" not in out[1]["text_redacted"]
        assert "555" not in out[1]["text_redacted"]
        assert out[2]["n_ipv4"] == 1 and out[2]["n_ssn"] == 1
        assert "10.0.0.1" not in out[2]["text_redacted"]
        assert "123-45-6789" not in out[2]["text_redacted"]
        assert out[3]["text_redacted"] == out[3]["text"]
        assert all(out[3][f"n_{k}"] == 0 for k in ("email", "phone", "ipv4", "ssn"))

    def test_kind_subset_and_validation(self, spark):
        import pytest
        from pyspark.sql import Row
        from change_data_capturer_ms_spark.operators import redact_pii

        df = spark.createDataFrame([Row(doc_id=1, text="a@b.com 10.0.0.1")])
        row = redact_pii(df, kinds=("email",)).collect()[0]
        assert "10.0.0.1" in row["text_redacted"]  # not requested: untouched
        assert "a@b.com" not in row["text_redacted"]
        assert "n_ipv4" not in row.asDict()
        with pytest.raises(ValueError, match="unknown PII kinds"):
            redact_pii(df, kinds=("email", "iban"))

    def test_projection_only_plan(self, spark):
        from pyspark.sql import Row
        from change_data_capturer_ms_spark.operators import redact_pii

        df = spark.createDataFrame([Row(doc_id=1, text="x")])
        plan = redact_pii(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # pure projection: runs at scan speed
