"""End-to-end composition: the CDC pipeline maintains a documents lake table,
and the incremental LSH index is maintained from the TABLE'S OWN snapshot_diff
change feed — change log → MERGE → version diff → index update. The version
number is the feed seq (monotone across diffs; each key appears at most once
per diff), the table version is the index batch id (exactly-once even if the
indexer re-runs a diff after a crash)."""

import pytest
from pyspark.sql import functions as F

from change_data_capturer_ms_spark.operators.dedup_index import (
    MinHashLSHIndex,
    band_rows,
)
from change_data_capturer_ms_spark.sources.changelog import gen_changelog, write_changelog
from tests.test_invariants import _pipe


def _to_text(col):
    """The generator's content is newline/punct-joined (near zero spaces), so
    word shingles would be empty — derive a whitespace-tokenised text the way
    a real pipeline's normaliser would."""
    return F.regexp_replace(col, "[\\n/=#.]+", " ")


def _index_from_diff(idx, table, v_old, v_new):
    """One indexer step: version diff → change rows → index update."""
    diff = table.snapshot_diff(v_old, v_new)
    changes = diff.select(
        F.concat_ws("/", "repo", "path").alias("doc_id"),
        _to_text(F.col("old_content")).alias("old_text"),
        _to_text(F.col("new_content")).alias("new_text"),
        F.lit(v_new).cast("long").alias("seq"),
    )
    return idx.update(changes, batch_id=v_new, source_id="doc-index")


def test_index_tracks_table_through_pipeline_batches(spark, tmpdir_path):
    pipe, log = _pipe(spark, tmpdir_path)
    full = gen_changelog(spark, 3000, seed=71, n_repos=6, paths_per_repo=4)
    idx = MinHashLSHIndex(spark, f"{tmpdir_path}/idx", n_buckets=16)

    indexed_at = 0  # pre-create version
    write_changelog(full.filter(F.col("seq") < 1500), log)
    pipe.run_stream()
    v1 = pipe.table.manifest().version
    _index_from_diff(idx, pipe.table, indexed_at, v1)
    indexed_at = v1

    write_changelog(full.filter(F.col("seq") >= 1500), log)
    pipe.run_stream()
    v2 = pipe.table.manifest().version
    assert v2 > v1
    _index_from_diff(idx, pipe.table, indexed_at, v2)

    # the maintained index equals the index recomputed from the live table
    docs = pipe.table.read().select(
        F.concat_ws("/", "repo", "path").alias("doc_id"),
        _to_text(F.col("content")).alias("text"),
    ).filter(F.col("text").isNotNull())
    expected = band_rows(docs).select("band", "band_hash", "id")
    assert expected.count() > 0, "fixture must produce shingleable docs"
    actual = idx.table.read().select("band", "band_hash", "id")
    assert actual.exceptAll(expected).count() == 0
    assert expected.exceptAll(actual).count() == 0

    # a crash-retry of the same diff is a ledger no-op
    res = _index_from_diff(idx, pipe.table, v1, v2)
    assert res["skipped"] is True

    # probing a live document's exact text finds it in full-band collision
    alive = docs.limit(1).collect()[0]
    probe = spark.createDataFrame([("q", alive["text"])],
                                  "doc_id string, text string")
    hits = {(r["index_id"], r["n_shared_bands"])
            for r in idx.probe(probe).collect()}
    assert (alive["doc_id"], idx.bands) in hits
