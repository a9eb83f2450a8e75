"""Bloom file skipping: probe math parity, bitmap semantics, lake pruning."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from change_data_capturer_ms_spark.lake.bloom import (
    K_HASHES,
    bloom_m,
    might_contain,
    pack_bits,
    position_exprs,
    probe_positions,
    value_hash,
)


class TestBloomUnit:
    def test_roundtrip_no_false_negatives(self):
        m = 1 << 12
        hashes = [value_hash(f"doc-{i}", "string") for i in range(200)]
        pos = [p for h in hashes for p in probe_positions(h, m)]
        bloom = {"m": m, "k": K_HASHES, "b64": pack_bits(pos, m)}
        for h in hashes:
            assert might_contain(bloom, h)

    def test_absent_values_rejected(self):
        m = 1 << 12
        pos = [p for i in range(200)
               for p in probe_positions(value_hash(f"doc-{i}", "string"), m)]
        bloom = {"m": m, "k": K_HASHES, "b64": pack_bits(pos, m)}
        # 200 keys in a 4096-bit / k=7 bloom → FPR well under 1%; over 500
        # absent probes essentially none should pass
        false_pos = sum(
            might_contain(bloom, value_hash(f"other-{i}", "string"))
            for i in range(500)
        )
        assert false_pos <= 5

    def test_bloom_m_adapts_and_clamps(self):
        assert bloom_m(0) == 1 << 10
        assert bloom_m(10_000) == 1 << 17  # 100k bits needed -> 131072
        assert bloom_m(10**9) == 1 << 17  # ceiling
        assert bloom_m(150) == 1 << 11  # 1500 bits -> 2048

    def test_spark_driver_probe_parity(self, spark):
        """The build (JVM xxhash64 + Catalyst arithmetic) and the probe
        (Python port) must produce identical positions, or pruning would
        silently drop live files."""
        m = 1 << 13
        rows = [Row(s=f"val-{i}", n=i * 7 - 3, i32=i) for i in range(50)]
        df = spark.createDataFrame(rows).select(
            "s", "n", F.col("i32").cast("int").alias("i32"))
        out = df.select(
            "s", "n", "i32",
            *[p.alias(f"s_{i}") for i, p in enumerate(position_exprs("s", m))],
            *[p.alias(f"n_{i}") for i, p in enumerate(position_exprs("n", m))],
            *[p.alias(f"i_{i}") for i, p in enumerate(position_exprs("i32", m))],
        ).collect()
        for r in out:
            assert [r[f"s_{i}"] for i in range(K_HASHES)] == \
                probe_positions(value_hash(r["s"], "string"), m)
            assert [r[f"n_{i}"] for i in range(K_HASHES)] == \
                probe_positions(value_hash(r["n"], "bigint"), m)
            assert [r[f"i_{i}"] for i in range(K_HASHES)] == \
                probe_positions(value_hash(r["i32"], "int"), m)

    def test_value_hash_unsupported_and_null(self):
        assert value_hash(None, "string") is None
        assert value_hash(1.5, "double") is None


class TestBloomLake:
    def _bloom_pipe(self, spark, tmpdir_path, write_mode="mor"):
        import os

        from change_data_capturer_ms_spark.config import EngineConfig
        from change_data_capturer_ms_spark.lake.table import LakeTable
        from change_data_capturer_ms_spark.streaming.pipeline import CDCPipeline

        table = LakeTable(spark, os.path.join(tmpdir_path, "table"),
                          key_cols=["repo", "path"], n_buckets=4,
                          write_mode=write_mode,
                          bloom_cols=["path", "content_sha256"])
        pipe = CDCPipeline(spark, os.path.join(tmpdir_path, "log"), table,
                           os.path.join(tmpdir_path, "ckpt"),
                           cfg=EngineConfig(n_buckets=4), use_pandas_udfs=False)
        return pipe, table

    def test_create_validates_bloom_cols(self, spark, tmpdir_path):
        import os

        from change_data_capturer_ms_spark.lake.table import LakeTable
        from change_data_capturer_ms_spark.sources.changelog import gen_changelog

        schema = gen_changelog(spark, 1).schema
        t1 = LakeTable(spark, os.path.join(tmpdir_path, "t1"),
                       key_cols=["repo", "path"], bloom_cols=["nope"])
        with pytest.raises(ValueError, match="unknown column"):
            t1.create(schema)
        t2 = LakeTable(spark, os.path.join(tmpdir_path, "t2"),
                       key_cols=["repo", "path"], bloom_cols=["ts"])
        with pytest.raises(ValueError, match="no\n?.*driver-side|driver-side"):
            t2.create(schema)

    def test_bloom_prunes_what_zone_maps_cannot(self, spark, tmpdir_path):
        from change_data_capturer_ms_spark.sources.changelog import gen_changelog

        pipe, table = self._bloom_pipe(spark, tmpdir_path)
        pipe.apply_batch(gen_changelog(spark, 800, seed=5), batch_id=0)
        pipe.apply_batch(gen_changelog(spark, 400, seed=5, start_seq=800),
                         batch_id=1)

        m = table.manifest()
        assert m.bloom_cols == ["path", "content_sha256"]
        assert all(f.bloom and "path" in f.bloom for f in m.files)

        # correctness first: every live key still found through the bloom path
        live = table.read().select("repo", "path").limit(20).collect()
        assert live
        for r in live:
            got = table.lookup({"repo": r["repo"], "path": r["path"]}).collect()
            assert len(got) == 1

        n_files = len(m.files)
        # absent values: lexicographically inside the data's range, so the
        # zone map keeps every file — only the bloom can skip
        # generated paths are src/dir_{d}/file_{d+10k}.py (k<5); inserting a
        # letter before ".py" lands between two real paths of the same dir
        absent = [f"src/dir_{d}/file_{d + 10 * k}a.py"
                  for d in range(10) for k in range(3)]
        zone_only = sum(
            len([f for f in m.files
                 if not f.col_stats or "path" not in (f.col_stats or {})
                 or f.col_stats["path"][0] <= a <= f.col_stats["path"][1]])
            for a in absent
        )
        with_bloom = sum(
            len(table.candidate_files([("path", "=", a)])) for a in absent
        )
        assert with_bloom < zone_only / 5, (with_bloom, zone_only, n_files)
        # and the reads themselves stay correct (0 rows, no error)
        assert table.read_where([("path", "=", absent[0])]).count() == 0

    def test_bloom_survives_compaction(self, spark, tmpdir_path):
        from change_data_capturer_ms_spark.sources.changelog import gen_changelog

        pipe, table = self._bloom_pipe(spark, tmpdir_path)
        pipe.apply_batch(gen_changelog(spark, 600, seed=9), batch_id=0)
        pipe.apply_batch(gen_changelog(spark, 300, seed=9, start_seq=600),
                         batch_id=1)
        res = table.compact()
        assert res["compacted_buckets"] > 0
        m = table.manifest()
        assert all(f.bloom and "path" in f.bloom for f in m.files)
        r = table.read().select("repo", "path").first()
        assert len(table.lookup({"repo": r["repo"], "path": r["path"]}).collect()) == 1
