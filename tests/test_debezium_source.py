"""Debezium-envelope source decode + JSONL change-log source.

Round-trip contract: queue sink (envelope="debezium") → decode_debezium is
lossless for upserts (after-image) and key-complete for deletes
(before-image), with op mapped through the LWW-equivalent engine domain.
"""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from change_data_capturer_ms_spark.errors import NotSupportedError
from change_data_capturer_ms_spark.queue import JsonQueueSink
from change_data_capturer_ms_spark.sources import (
    CHANGE_LOG_SCHEMA,
    DebeziumQueueReader,
    JsonChangeLogReader,
    create_source,
    decode_debezium,
    gen_changelog,
)

PAYLOAD_SCHEMA = T.StructType(
    [T.StructField(f.name, f.dataType, True)
     for f in CHANGE_LOG_SCHEMA.fields if f.name != "op"]
)

# sink maps insert→c, update|replace→u, delete→d; decode maps back u→update
EXPECTED_OP = {"insert": "insert", "update": "update",
               "replace": "update", "delete": "delete"}


def _expected(batch):
    exp_op = F.create_map(
        *[x for k, v in EXPECTED_OP.items() for x in (F.lit(k), F.lit(v))]
    )[F.col("op")]
    return batch.withColumn("op", exp_op)


class TestDebeziumRoundTrip:
    def test_full_round_trip(self, spark, tmpdir_path):
        qp = os.path.join(tmpdir_path, "qdbz")
        batch = gen_changelog(spark, 300, seed=77, n_repos=5, paths_per_repo=4)
        sink = JsonQueueSink(spark, qp, envelope="debezium")
        sink.produce(batch, batch_id=0, source_id="src1")

        rdr = DebeziumQueueReader(spark, qp, PAYLOAD_SCHEMA)
        dec = rdr.read_batch()
        assert dec.count() == 300
        assert dec.filter(F.col("source_name") != "src1").count() == 0

        cols = [f.name for f in CHANGE_LOG_SCHEMA.fields]  # incl. op
        got = dec.select(*cols)
        want = _expected(batch).select(*cols)
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0
        # delete rows kept their keys from the before-image
        dels = dec.filter(F.col("op") == "delete")
        assert dels.count() > 0
        assert dels.filter(F.col("repo").isNull() | F.col("path").isNull()
                           ).count() == 0
        assert dels.filter(F.col("content").isNotNull()).count() == 0
        # decode quarantine empty on a clean feed
        assert rdr.read_quarantine().count() == 0

    def test_incremental_and_op_filter(self, spark, tmpdir_path):
        qp = os.path.join(tmpdir_path, "qdbz2")
        sink = JsonQueueSink(spark, qp, envelope="debezium")
        b0 = gen_changelog(spark, 100, seed=7)
        b1 = gen_changelog(spark, 80, seed=7, start_seq=100)
        sink.produce(b0, batch_id=0)
        sink.produce(b1, batch_id=1)
        rdr = DebeziumQueueReader(spark, qp, PAYLOAD_SCHEMA)
        tail = rdr.read_batch(after_batch=0)
        assert tail.count() == 80
        assert tail.agg(F.min("seq")).first()[0] == 100
        only_del = rdr.read_batch(ops=("delete",))
        assert only_del.filter(F.col("op") != "delete").count() == 0

    def test_quarantine_reasons(self, spark):
        ps = T.StructType([T.StructField("repo", T.StringType(), True)])
        rows = [
            ("ok", '{"payload": {"after": {"repo": "r"}, "op": "c", '
                   '"source": {"name": "s", "seq": 1}}}'),
            ("garbage", "not json at all"),
            ("badop", '{"payload": {"after": {"repo": "r"}, "op": "x", '
                      '"source": {"name": "s", "seq": 2}}}'),
            ("noimage", '{"payload": {"op": "c", '
                        '"source": {"name": "s", "seq": 3}}}'),
        ]
        env = spark.createDataFrame(rows, ["key", "body"])
        events, quarantine = decode_debezium(env, ps)
        assert events.count() == 1
        e = events.first()
        assert (e["repo"], e["op"], e["seq"], e["source_name"]) == \
            ("r", "insert", 1, "s")
        q = {r["key"]: list(r["_reasons"]) for r in quarantine.collect()}
        assert q["garbage"] == ["undecodable_body"]
        assert q["badop"] == ["bad_op:x"]
        assert q["noimage"] == ["no_image"]
        assert "ok" not in q

    def test_registry_binding(self, spark, tmpdir_path):
        qp = os.path.join(tmpdir_path, "qdbz3")
        JsonQueueSink(spark, qp, envelope="debezium").produce(
            gen_changelog(spark, 50, seed=3), batch_id=0)
        rdr = create_source("changelog-debezium", spark, qp, PAYLOAD_SCHEMA)
        assert isinstance(rdr, DebeziumQueueReader)
        assert rdr.read_batch().count() == 50
        with pytest.raises(NotSupportedError):
            create_source("changelog-avro", spark, qp)


class TestJsonChangeLog:
    def test_read_with_quarantine_split(self, spark, tmpdir_path):
        d = os.path.join(tmpdir_path, "jl")
        gen_changelog(spark, 300, seed=11).coalesce(2).write.mode(
            "overwrite").json(d)
        with open(os.path.join(d, "extra.json"), "w") as f:
            f.write("{{{ not json\n")
            f.write('{"op": "insert", "repo": "r"}\n')  # parses, but no seq
        rdr = JsonChangeLogReader(spark, d)
        events, quarantine = rdr.read_batch()
        assert events.count() == 300
        assert quarantine.count() == 2
        assert events.columns == [f.name for f in CHANGE_LOG_SCHEMA.fields]
        # parsed values survive the text round trip bit-for-bit
        want = gen_changelog(spark, 300, seed=11)
        got = events.select(*want.columns)
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0

    def test_resume_and_op_pushdown(self, spark, tmpdir_path):
        d = os.path.join(tmpdir_path, "jl2")
        gen_changelog(spark, 200, seed=12).write.mode("overwrite").json(d)
        rdr = create_source("changelog-jsonl", spark, d)
        assert isinstance(rdr, JsonChangeLogReader)
        events, _ = rdr.read_batch(after_seq=149)
        assert events.count() == 50
        assert events.agg(F.min("seq")).first()[0] == 150
        dels, _ = rdr.read_batch(ops=("delete", "insert"))
        assert dels.filter(~F.col("op").isin("delete", "insert")).count() == 0

    def test_quarantine_split_is_projection_independent(self, spark,
                                                        tmpdir_path):
        """PERMISSIVE's corrupt column is populated per-QUERY under column
        pruning: a line whose only bad field is `ts` parses clean when a
        narrow projection never reads ts, and corrupt when the full row is
        read — without the cached full-schema parse, the same line flips
        between events and quarantine depending on the downstream plan."""
        d = os.path.join(tmpdir_path, "jl3")
        gen_changelog(spark, 100, seed=13).write.mode("overwrite").json(d)
        with open(os.path.join(d, "bad_ts.json"), "w") as f:
            f.write('{"seq": 9999, "token": "t", "op": "insert", '
                    '"repo": "r", "path": "p", "commit": "c", "lang": "py", '
                    '"content": "x", "ts": "not-a-timestamp", '
                    '"seq_bucket": 0}\n')
        events, quarantine = JsonChangeLogReader(spark, d).read_batch()
        # narrow plan (count prunes to ~nothing) and full materialization
        # must agree on the SAME split
        assert events.count() == len(events.collect()) == 100
        assert events.filter(F.col("seq") == 9999).count() == 0
        assert quarantine.count() == 1
