"""Metadata tables (files_df/history_df — Iceberg `table.files`/`history`
parity), batched point lookups (lookup_many: one job for N keys), and the
Debezium change-event envelope on the queue sink."""

import json
import os

from pyspark.sql import functions as F

from change_data_capturer_ms_spark.queue import JsonQueueSink
from change_data_capturer_ms_spark.sources import gen_changelog, write_changelog
from tests.test_invariants import _pipe


def _built(spark, tmpdir_path, n=1500):
    pipe, log = _pipe(spark, tmpdir_path)
    full = gen_changelog(spark, n, seed=61, n_repos=8, paths_per_repo=4)
    write_changelog(full.filter(F.col("seq") < n // 2), log)
    pipe.run_stream()
    write_changelog(full.filter(F.col("seq") >= n // 2), log)
    pipe.run_stream()
    return pipe.table


def test_files_df_matches_manifest(spark, tmpdir_path):
    t = _built(spark, tmpdir_path)
    m = t.manifest()
    fdf = t.files_df().orderBy("path").collect()
    assert len(fdf) == len(m.files)
    by_path = {f.path: f for f in m.files}
    total_rows = 0
    for r in fdf:
        e = by_path[r["path"]]
        assert (r["bucket"], r["rows"], r["bytes"]) == (e.bucket, e.rows, e.bytes)
        total_rows += r["rows"]
    # file row counts cover the physical table (incl. tombstones)
    assert total_rows == t.read(include_deleted=True).count()


def test_history_df_walks_retained_chain(spark, tmpdir_path):
    t = _built(spark, tmpdir_path)
    h = t.history_df().orderBy(F.desc("version")).collect()
    m = t.manifest()
    assert h[0]["version"] == m.version
    assert h[-1]["version"] == 0 and h[-1]["parent"] is None
    versions = [r["version"] for r in h]
    parents = [r["parent"] for r in h]
    assert parents[:-1] == versions[1:], "rows must chain version→parent"
    # merge commits carry their batch metrics
    merged = [r for r in h if r["batch_id"] is not None]
    assert merged and all(r["rows"] > 0 for r in merged)
    # after snapshot expiry the walk ends at the oldest RETAINED version
    t.expire_snapshots(keep_last=1)
    h2 = t.history_df().collect()
    assert {r["version"] for r in h2} <= {m.version, m.version - 1}


def test_lookup_many_equals_individual_lookups(spark, tmpdir_path):
    t = _built(spark, tmpdir_path)
    some = (t.read().select("repo", "path").distinct()
            .orderBy("repo", "path").limit(5).collect())
    keys = [{"repo": r["repo"], "path": r["path"]} for r in some]
    batched = t.lookup_many(keys).select("repo", "path", "content_sha256")
    singles = None
    for kv in keys:
        one = t.lookup(kv).select("repo", "path", "content_sha256")
        singles = one if singles is None else singles.unionByName(one)
    assert batched.exceptAll(singles).count() == 0
    assert singles.exceptAll(batched).count() == 0
    # duplicate keys must not duplicate rows; unknown keys return nothing
    dup = t.lookup_many(keys + keys[:2])
    assert dup.count() == batched.count()
    assert t.lookup_many([{"repo": "no_such", "path": "nope"}]).count() == 0
    assert t.lookup_many([]).count() == 0


def test_debezium_envelope_shape(spark, tmpdir_path):
    sink = JsonQueueSink(spark, os.path.join(tmpdir_path, "qd"),
                         envelope="debezium")
    batch = gen_changelog(spark, 300, seed=62, n_repos=4, paths_per_repo=3)
    res = sink.produce(batch, batch_id=0, source_id="cdc")
    assert res["rows"] == 300
    env = sink.consume().collect()
    ops = {"c": 0, "u": 0, "d": 0}
    for r in env:
        payload = json.loads(r["body"])["payload"]
        assert set(payload) >= {"before", "after", "op", "source"}
        assert payload["source"]["name"] == "cdc"
        assert isinstance(payload["source"]["seq"], int)
        ops[payload["op"]] += 1
        if payload["op"] == "d":
            assert payload["after"] is None  # explicit null, not missing
            # delete keys are recoverable from the before-image (Debezium d contract)
            assert payload["before"]["repo"] == r["key"].split("/", 1)[0]
        else:
            assert payload["before"] is None
            assert payload["after"]["repo"] == r["key"].split("/", 1)[0]
    # the generator emits all three op kinds
    assert all(v > 0 for v in ops.values()), ops
