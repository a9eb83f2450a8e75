"""Streaming-specific operators: watermark dedupe, windowed aggregation, and the
spark-submit entry point (`main.py`)."""

import json
import os
import subprocess
import sys

from pyspark.sql import functions as F

from change_data_capturer_ms_spark.operators import streaming_dedupe_within_watermark
from change_data_capturer_ms_spark.sources import gen_changelog, write_changelog

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_streaming_dedupe_within_watermark(spark, tmpdir_path):
    """Duplicated recent events (at-least-once redelivery) are suppressed."""
    log = gen_changelog(spark, 500, seed=21, n_repos=5, paths_per_repo=4)
    dup = log.unionByName(log)  # exact redelivery of every event
    write_changelog(dup, f"{tmpdir_path}/log")

    schema = spark.read.parquet(f"{tmpdir_path}/log").schema
    stream = spark.readStream.schema(schema).parquet(f"{tmpdir_path}/log")
    deduped = streaming_dedupe_within_watermark(
        stream, keys=["seq"], ts_col="ts", watermark="1 hour"
    )
    q = (
        deduped.writeStream.format("memory").queryName("dedupe_wm")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    out = spark.table("dedupe_wm")
    assert out.count() == 500
    assert out.select("seq").distinct().count() == 500


def test_running_key_stats_across_batches(spark, tmpdir_path):
    """applyInPandasWithState accumulates per-key state across micro-batches;
    final state equals the batch aggregate."""
    from change_data_capturer_ms_spark.streaming import running_key_stats

    log = gen_changelog(spark, 800, seed=23, n_repos=4, paths_per_repo=3)
    log.repartition(2).write.mode("overwrite").parquet(f"{tmpdir_path}/log")
    schema = spark.read.parquet(f"{tmpdir_path}/log").schema
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(
        f"{tmpdir_path}/log"
    )
    q = (
        running_key_stats(stream, keys=["repo"], seq_col="seq")
        .writeStream.format("memory").queryName("state_counts")
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = (
        spark.table("state_counts")
        .groupBy("repo")
        .agg(F.max("n_events").alias("n_events"), F.max("max_seq").alias("max_seq"))
    )
    want = (
        spark.read.parquet(f"{tmpdir_path}/log")
        .groupBy("repo")
        .agg(F.count(F.lit(1)).alias("n_events"), F.max("seq").alias("max_seq"))
    )
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
    # state really spanned batches: at least one key updated twice
    ups = spark.table("state_counts").groupBy("repo").count()
    assert ups.filter(F.col("count") >= 2).count() > 0


def test_main_entry_spark_submit_shape(spark, tmpdir_path):
    """main.py drives the full pipeline as a subprocess (spark-submit stand-in:
    plain python with --master local; same code path as --py-files on a cluster)."""
    write_changelog(gen_changelog(spark, 1000, seed=22, n_repos=5, paths_per_repo=4),
                    f"{tmpdir_path}/log")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO_ROOT, "main.py"),
         "--log", f"{tmpdir_path}/log",
         "--table", f"{tmpdir_path}/table",
         "--checkpoint", f"{tmpdir_path}/ckpt",
         "--master", "local[4]", "--n-buckets", "8"],
        capture_output=True, text=True, timeout=420,
        env={**os.environ, "CDC_SHUFFLE_PARTITIONS": "8"},
        cwd=REPO_ROOT,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    payload = json.loads(line)
    assert payload["status"] == "OK"
    assert payload["lease"]["id"] == "changelog"
    assert int(payload["lease"]["lease"]) == 999
    # applied table readable from this session too
    from change_data_capturer_ms_spark.lake.table import LakeTable
    t = LakeTable(spark, f"{tmpdir_path}/table")
    assert t.read().count() > 0


def test_pipeline_event_dedup_watermark(spark, tmpdir_path):
    """CDCPipeline(event_dedup_watermark=...): redelivered events are dropped
    at the stream boundary — per-batch merge metrics count each event ONCE,
    and state matches a clean-log run."""
    from change_data_capturer_ms_spark import EngineConfig
    from change_data_capturer_ms_spark.sources import create_sink
    from change_data_capturer_ms_spark.streaming import CDCPipeline

    log = gen_changelog(spark, 500, seed=29, n_repos=5, paths_per_repo=4)
    write_changelog(log.unionByName(log), f"{tmpdir_path}/log")  # 2x delivery

    t = create_sink("lake-parquet", spark, f"{tmpdir_path}/t", n_buckets=4)
    pipe = CDCPipeline(spark, f"{tmpdir_path}/log", t, f"{tmpdir_path}/ckpt",
                       cfg=EngineConfig(n_buckets=4),
                       event_dedup_watermark="1 hour")
    pipe.run_stream()
    applied = sum(r["rows"] or 0 for r in t.history_df().collect())
    # metrics `rows` counts CAPTURED (pre-LWW) batch rows, so without the
    # stream-boundary dedup the doubled delivery would sum to 2x this
    expected = log.filter(F.col("op").isin(*EngineConfig().captured_ops)).count()
    assert applied == expected

    # state identical to a clean (non-duplicated) run
    t2 = create_sink("lake-parquet", spark, f"{tmpdir_path}/t2", n_buckets=4)
    write_changelog(log, f"{tmpdir_path}/log2")
    CDCPipeline(spark, f"{tmpdir_path}/log2", t2, f"{tmpdir_path}/ckpt2",
                cfg=EngineConfig(n_buckets=4)).run_stream()
    a = t.read().select("repo", "path", "content_sha256")
    b = t2.read().select("repo", "path", "content_sha256")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
