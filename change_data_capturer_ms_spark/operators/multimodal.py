"""Multimodal column plumbing: image/audio/video as opaque binary + typed metadata.

The Spark-side mechanics are real and tested — schema, Arrow batch shape,
`mapInPandas` iterator contract, partition sizing — while the actual media decode is
stubbed (the sandbox has no image/audio libraries): `decode_media` calls a
deterministic fake extractor and raises NotImplementedError if a real decode is
requested. Swapping in PIL/torchaudio touches only `_decode_real`.

Scale notes: binary payloads ride in Arrow record batches; keep
`spark.sql.execution.arrow.maxRecordsPerBatch` low for large blobs so a batch fits
worker memory, and repartition by a size-aware key before the UDF so one partition
doesn't accumulate all the 100 MB videos.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.StructType([
            T.StructField("mime", T.StringType()),
            T.StructField("source", T.StringType()),
        ]), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("payload_sha256", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),    # fake-decoded dims
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
    ]
)


def _decode_real(payload: bytes, kind: str) -> dict:
    raise NotImplementedError(
        "real media decode requires PIL/ffmpeg/torchaudio — not in this environment; "
        "deterministic fake decode is the default (use_real_decode=False)"
    )


def _decode_fake(payload: bytes, kind: str) -> dict:
    """Deterministic stand-in: dims derived from the payload hash, so tests can
    assert exact values without media libs."""
    h = hashlib.sha256(payload).digest()
    return {
        "width": 16 + h[0] % 240 if kind in ("image", "video") else None,
        "height": 16 + h[1] % 240 if kind in ("image", "video") else None,
        "n_frames": 1 if kind == "image" else 1 + h[2] % 300,
    }


def suggest_arrow_batch_rows(avg_payload_bytes: int,
                             target_batch_bytes: int = 64 << 20) -> int:
    """Executor-memory-aware Arrow batch sizing for binary media columns.

    An Arrow batch holds `maxRecordsPerBatch` full payloads in memory at once
    on BOTH the JVM and Python sides of the mapInPandas boundary; Spark's
    default (10,000 rows) assumes scalar columns and would put ~1 TB in one
    batch for 100 MB videos. rows = clamp(target_bytes / avg_payload, 1, 10k).
    Pick target_batch_bytes well under spark.executor.memory / cores (64 MB
    default leaves headroom for the decoded representation, typically larger
    than the encoded payload)."""
    if avg_payload_bytes <= 0:
        return 10_000
    return max(1, min(10_000, target_batch_bytes // avg_payload_bytes))


def extract_media_features(df: DataFrame, use_real_decode: bool = False,
                           arrow_batch_rows: int | None = None) -> DataFrame:
    """mapInPandas decode/feature-extract over binary media rows.

    Iterator-of-batches form: each Arrow batch is decoded and yielded without
    materializing the whole partition (essential when payloads are MBs each).

    arrow_batch_rows sets `spark.sql.execution.arrow.maxRecordsPerBatch` —
    size it from payload sizes via `suggest_arrow_batch_rows` so one batch of
    blobs fits worker memory. NOTE: this is a session-level conf (Spark has no
    per-plan override); it applies to every Arrow exchange that executes while
    set, so configure it once per media pipeline, not per query mid-flight.
    """
    decode = _decode_real if use_real_decode else _decode_fake
    if arrow_batch_rows is not None:
        df.sparkSession.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(int(arrow_batch_rows)))

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                payload = bytes(payload) if payload is not None else b""
                d = decode(payload, kind)
                rows.append({
                    "media_id": media_id,
                    "kind": kind,
                    "n_bytes": len(payload),
                    "payload_sha256": hashlib.sha256(payload).hexdigest(),
                    "width": d["width"],
                    "height": d["height"],
                    "n_frames": d["n_frames"],
                })
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return df.mapInPandas(fn, FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plan for videos: expands (media_id, n_frames) into sampled
    frame indices with `sequence` + `explode` — pure Catalyst, the decode of each
    sampled frame happens in a later mapInPandas stage."""
    return (
        df.filter(F.col("kind") == "video")
        .withColumn(
            "frame_idx",
            F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))),
        )
        .select("media_id", "frame_idx")
    )


def synth_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Build a media table from a text table (payload = utf-8 bytes): exercises the
    binary-column plumbing deterministically without media files."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.col(id_col), 3) + 1).cast("int"),
    )
    return df.select(
        F.col(id_col).alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit("synthetic").alias("source"),
        ).alias("meta"),
    )
