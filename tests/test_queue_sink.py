"""Queue sink round trip — mirrors the reference message-queue integration spec
(__integrations__/.../messageQueue.test.ts:101-139: produced messages are
readable back with the same content; send failures are aggregated, not thrown).
"""

import os

from pyspark.sql import functions as F

from change_data_capturer_ms_spark.queue import JsonQueueSink, parse_envelopes
from change_data_capturer_ms_spark.sources import gen_changelog
from change_data_capturer_ms_spark.sources.registry import create_sink


def test_produce_consume_round_trip(spark, tmpdir_path):
    sink = create_sink("queue-json", spark, os.path.join(tmpdir_path, "q"))
    assert isinstance(sink, JsonQueueSink)
    batch = gen_changelog(spark, 500, seed=31, n_repos=5, paths_per_repo=3)

    res = sink.produce(batch, batch_id=0, source_id="changelog")
    assert res == {"skipped": False, "batch_id": 0, "rows": 500}

    env = sink.consume()
    assert env.count() == 500
    ok, failed = parse_envelopes(env, batch.schema)
    assert failed.count() == 0
    # payload round-trips exactly (key fields + content hash domain)
    a = batch.select("repo", "path", "seq", "op", "content").orderBy("seq")
    b = ok.select("repo", "path", "seq", "op", "content").orderBy("seq")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # the message key is the document key (partition affinity)
    row = ok.first()
    assert env.filter(F.col("key") == f"{row['repo']}/{row['path']}").count() > 0


def test_produce_is_idempotent_on_batch_id(spark, tmpdir_path):
    sink = JsonQueueSink(spark, os.path.join(tmpdir_path, "q2"))
    batch = gen_changelog(spark, 200, seed=32)
    assert sink.produce(batch, batch_id=7)["skipped"] is False
    assert sink.produce(batch, batch_id=7)["skipped"] is True  # re-delivery no-op
    assert sink.consume().count() == 200
    # a second distinct batch appends
    sink.produce(gen_changelog(spark, 100, seed=33, start_seq=200), batch_id=8)
    assert sink.consume().count() == 300


def test_uncommitted_batch_is_invisible_and_failures_aggregate(spark, tmpdir_path):
    sink = JsonQueueSink(spark, os.path.join(tmpdir_path, "q3"))
    batch = gen_changelog(spark, 100, seed=34)
    sink.produce(batch, batch_id=0)
    # crash simulation: data dir written but marker missing -> invisible
    marker = sink._marker("cdc", 0)
    os.remove(marker)
    assert sink.consume().count() == 0
    # re-produce commits it again (exactly-once via marker, like the manifest)
    sink.produce(batch, batch_id=0)
    assert sink.consume().count() == 100

    # undecodable bodies land in the failure frame, never thrown away
    garbage = spark.createDataFrame(
        [("k", "{not json", "cdc", "99", 1), ("k", None, "cdc", "99", 2)],
        "key string, body string, source_id string, batch_id string, seq long",
    )
    ok, failed = parse_envelopes(sink.consume().unionByName(garbage), batch.schema)
    assert ok.count() == 100
    assert failed.count() == 2


def test_all_null_payload_round_trips_as_ok(spark):
    """to_json drops null fields, so an all-null payload produces body '{}' —
    a VALID message that must land in `ok` (all fields null), not the DLQ."""
    from pyspark.sql import types as T

    env = spark.createDataFrame(
        [("k1", "{}", "cdc", "0", 1),                 # all-null payload
         ("k2", '{"a": "x"}', "cdc", "0", 2),         # partial payload
         ("k3", "{broken", "cdc", "0", 3)],           # corrupt body
        "key string, body string, source_id string, batch_id string, seq long",
    )
    payload_schema = T.StructType([
        T.StructField("a", T.StringType()), T.StructField("b", T.StringType())
    ])
    ok, failed = parse_envelopes(env, payload_schema)
    got = {r["_msg_key"]: (r["a"], r["b"]) for r in ok.collect()}
    assert got == {"k1": (None, None), "k2": ("x", None)}
    assert [r["key"] for r in failed.collect()] == ["k3"]


def test_pipeline_produces_to_queue(spark, tmpdir_path):
    """Capture -> MERGE apply -> queue produce (the reference topology): every
    applied micro-batch also lands on the queue exactly once."""
    from change_data_capturer_ms_spark.config import EngineConfig
    from change_data_capturer_ms_spark.lake.table import LakeTable
    from change_data_capturer_ms_spark.sources import write_changelog
    from change_data_capturer_ms_spark.streaming import CDCPipeline

    q = JsonQueueSink(spark, os.path.join(tmpdir_path, "q"))
    table = LakeTable(spark, f"{tmpdir_path}/t", key_cols=["repo", "path"], n_buckets=4)
    log = gen_changelog(spark, 400, seed=35)
    write_changelog(log, f"{tmpdir_path}/log")
    pipe = CDCPipeline(spark, f"{tmpdir_path}/log", table, f"{tmpdir_path}/c",
                       cfg=EngineConfig(n_buckets=4), use_pandas_udfs=False,
                       queue_sink=q)
    pipe.run_stream()
    captured = log.filter(
        F.col("op").isin("insert", "update", "replace", "delete")).count()
    assert q.consume().count() == captured
    # envelopes decode back to the raw change rows
    ok, failed = parse_envelopes(q.consume(), log.schema)
    assert failed.count() == 0 and ok.count() == captured
    # drained log -> no new envelopes on re-run
    pipe.run_stream()
    assert q.consume().count() == captured


def test_consume_incremental_tails_new_batches(spark, tmpdir_path):
    """A downstream consumer remembers its batch watermark and reads only
    newer committed batches (queue as a registered SOURCE)."""
    from change_data_capturer_ms_spark.sources.registry import create_source

    q = create_source("queue-json", spark, os.path.join(tmpdir_path, "q5"))
    for b in range(3):
        q.produce(gen_changelog(spark, 100, seed=40 + b, start_seq=100 * b),
                  batch_id=b)
    assert q.consume().count() == 300
    inc = q.consume_incremental(after_batch=0)
    assert inc.count() == 200
    assert set(r["batch_id"] for r in inc.select("batch_id").distinct().collect()) \
        == {"1", "2"}
    assert q.consume_incremental(after_batch=2).count() == 0
    # per-source filter
    q.produce(gen_changelog(spark, 50, seed=44, start_seq=300),
              batch_id=0, source_id="other")
    assert q.consume_incremental(after_batch=0, source_id="other").count() == 0
    assert q.consume_incremental(after_batch=-1, source_id="other").count() == 50


def test_queue_to_downstream_lake_chain(spark, tmpdir_path):
    """Full topology: upstream captures the log into lake A and produces to the
    queue; a DOWNSTREAM consumer tails committed envelopes, decodes them and
    MERGEs into its own lake B — final states must match row for row."""
    from pyspark.sql import types as T

    from change_data_capturer_ms_spark.config import EngineConfig
    from change_data_capturer_ms_spark.lake.table import LakeTable
    from change_data_capturer_ms_spark.sources import write_changelog
    from change_data_capturer_ms_spark.streaming import CDCPipeline

    q = JsonQueueSink(spark, os.path.join(tmpdir_path, "q"))
    a = LakeTable(spark, f"{tmpdir_path}/lakeA", key_cols=["repo", "path"], n_buckets=4)
    log = gen_changelog(spark, 600, seed=37, n_repos=6, paths_per_repo=4)
    write_changelog(log, f"{tmpdir_path}/log")
    CDCPipeline(spark, f"{tmpdir_path}/log", a, f"{tmpdir_path}/ckptA",
                cfg=EngineConfig(n_buckets=4), use_pandas_udfs=False,
                queue_sink=q).run_stream()

    # downstream consumer: tail everything after its watermark, decode, apply
    b = LakeTable(spark, f"{tmpdir_path}/lakeB", key_cols=["repo", "path"], n_buckets=4)
    env = q.consume_incremental(after_batch=-1)
    rows, failed = parse_envelopes(env, log.schema)
    assert failed.count() == 0
    payload = [f for f in log.schema.fields if f.name not in ("seq", "op")]
    b.create(T.StructType(payload))
    batch = rows.drop("_msg_key", "_msg_source_id", "_msg_batch_id", "_msg_seq")
    b.merge(batch, seq_col="seq", op_col="op", batch_id=0,
            source_id="queue-consumer", tiebreakers=["token"])

    cols = ["repo", "path", "content", "_last_seq"]
    sa = a.read().select(*cols).orderBy("repo", "path")
    sb = b.read().select(*cols).orderBy("repo", "path")
    assert sa.exceptAll(sb).count() == 0 and sb.exceptAll(sa).count() == 0


def test_consumer_lease_kill_and_resume(spark, tmpdir_path):
    """Consumer-side lease: poll→process→commit advances a persisted
    watermark; a killed consumer (new instance, same lease dir) resumes
    exactly after the last COMMITTED batch; a crash between poll and commit
    redelivers (at-least-once)."""
    from change_data_capturer_ms_spark.queue import QueueConsumer

    sink = create_sink("queue-json", spark, os.path.join(tmpdir_path, "qc"))
    b0 = gen_changelog(spark, 100, seed=40, n_repos=3, paths_per_repo=2)
    b1 = gen_changelog(spark, 80, seed=41, n_repos=3, paths_per_repo=2)
    sink.produce(b0, batch_id=0, source_id="cdc")
    sink.produce(b1, batch_id=1, source_id="cdc")

    seen: list[int] = []
    c = QueueConsumer(sink, consumer_id="downstream")
    assert c.current_lease() is None  # fresh consumer: no watermark
    out = c.process(lambda df: seen.append(df.count()))
    assert out == {"skipped": False, "lease": "1", "batches": 2}
    assert seen == [180]
    assert c.current_lease()["id"] == "downstream"

    # nothing new -> no-op, watermark unchanged
    assert c.process(lambda df: seen.append(df.count()))["skipped"] is True
    assert seen == [180]

    # "kill" the consumer: a brand-new instance restores the watermark
    sink.produce(gen_changelog(spark, 60, seed=42, n_repos=3, paths_per_repo=2),
                 batch_id=2, source_id="cdc")
    c2 = QueueConsumer(sink, consumer_id="downstream")
    df, markers = c2.poll()
    assert [m["batch_id"] for m in markers] == ["2"]
    assert df.count() == 60

    # crash between poll and commit: redelivery on the next poll
    df2, markers2 = c2.poll()
    assert [m["batch_id"] for m in markers2] == ["2"]
    c2.commit(markers2)
    assert c2.current_lease()["lease"] == "2"
    assert c2.poll()[1] == []

    # corrupt lease decodes as None -> consumer restarts from the beginning
    with open(c2._lease_path(), "w") as f:
        f.write("{not json")
    c3 = QueueConsumer(sink, consumer_id="downstream")
    assert c3.current_lease() is None
    _, ms = c3.poll()
    assert [m["batch_id"] for m in ms] == ["0", "1", "2"]

    # watermark is monotone: committing an older marker never regresses
    c2.commit(markers2)  # re-commit batch 2 markers after lease repair
    assert QueueConsumer(sink, consumer_id="downstream").current_lease()["lease"] == "2"


def test_consumer_lease_source_filter_and_nonnumeric(spark, tmpdir_path):
    """A source_id-scoped consumer only tails its source; non-numeric batch
    ids (DLQ replays) stay outside the numeric watermark tail."""
    from change_data_capturer_ms_spark.queue import QueueConsumer

    sink = create_sink("queue-json", spark, os.path.join(tmpdir_path, "qs"))
    b = gen_changelog(spark, 50, seed=43, n_repos=2, paths_per_repo=2)
    sink.produce(b, batch_id=0, source_id="a")
    sink.produce(b, batch_id=0, source_id="b")
    sink.produce(b, batch_id="replay-7", source_id="a")

    ca = QueueConsumer(sink, consumer_id="ca", source_id="a")
    df, ms = ca.poll()
    assert [(m["source_id"], m["batch_id"]) for m in ms] == [("a", "0")]
    assert df.count() == 50
    ca.commit(ms)
    assert ca.poll()[1] == []  # replay-7 is non-numeric: not in the tail


def test_bind_queue_service_attaches_validated_config(spark, tmpdir_path):
    """K6/F3 end seam: decode-or-raise producer params, then bind the offline
    sink with the validated config attached (broker_config.bind_queue_service).
    """
    import pytest

    from change_data_capturer_ms_spark.queue import (
        NOT_SUPPORTED_ERROR,
        bind_queue_service,
    )

    sas = ("Endpoint=sb://ns.servicebus.windows.net/;"
           "SharedAccessKeyName=sender;SharedAccessKey=k=;EntityPath=t")
    sink = bind_queue_service(
        spark, os.path.join(tmpdir_path, "q4"),
        {"queueType": "eventhub", "useManagedIdentity": False,
         "connectionString": sas})
    assert isinstance(sink, JsonQueueSink)
    assert sink.producer_config.brokers == ["ns.servicebus.windows.net:9093"]
    assert sink.producer_config.idempotent is True  # K5 exactly-once contract
    # the bound sink is the engine's real produce path
    batch = gen_changelog(spark, 50, seed=35)
    assert sink.produce(batch, batch_id=0)["rows"] == 50
    assert sink.consume().count() == 50

    # decode failure must raise BEFORE any sink is constructed
    with pytest.raises(ValueError, match=NOT_SUPPORTED_ERROR):
        bind_queue_service(spark, os.path.join(tmpdir_path, "q5"),
                           {"queueType": "sqs"})
    assert not os.path.exists(os.path.join(tmpdir_path, "q5"))


def test_consumer_history_ring_bounded(tmpdir_path):
    """The consumer's per-commit audit history is a RING (last history_keep
    commits), not an unbounded small-file append; a no-advance commit (same
    watermark) gets its own entry instead of overwriting the previous one."""
    from types import SimpleNamespace

    from change_data_capturer_ms_spark.queue import QueueConsumer

    c = QueueConsumer(SimpleNamespace(path=tmpdir_path), consumer_id="ring",
                      history_keep=5)
    for i in range(12):
        c.commit([{"batch_id": str(i), "rows": 1}])
    ring = c._history_files()
    assert len(ring) == 5  # bounded, oldest pruned
    assert c.current_lease()["lease"] == "11"

    # no-advance commit: watermark stays, history still records the commit
    before = set(ring)
    c.commit([{"batch_id": "3", "rows": 1}])  # older than watermark
    after = c._history_files()
    assert len(after) == 5
    assert set(after) != before  # a NEW entry rotated in — no silent overwrite
    assert c.current_lease()["lease"] == "11"  # monotone

    # history_keep=0 disables the ring entirely
    c0 = QueueConsumer(SimpleNamespace(path=tmpdir_path), consumer_id="noring",
                       history_keep=0)
    c0.commit([{"batch_id": "1", "rows": 1}])
    assert c0._history_files() == []
    assert c0.current_lease()["lease"] == "1"
