"""change_data_capturer_ms_spark — a PySpark-native CDC / incremental-ingest engine.

A from-scratch re-expression of the capabilities of pagopa/change-data-capturer-ms
(reference at /root/reference, see SURVEY.md) as an idiomatic Spark engine:

- tail an ordered change-event log (insert/update/delete/replace keyed by (repo, path))
  with Structured Streaming (`sources.changelog`),
- deduplicate by monotonic resume-token/LSN, last-writer-wins per key
  (`operators.dedupe`),
- apply key-bucketed MERGE upserts into a snapshot-isolated Parquet lake table with
  exactly-once commits, additive schema evolution and time travel (`lake`),
- persist a resume lease + per-partition lineage + metrics per micro-batch
  (`streaming.pipeline`), mirroring the reference's ContinuationTokenItem lease
  contract (/root/reference/src/factory/types.ts:7-12).

Everything is DataFrame/SQL (Catalyst + Tungsten + AQE); Python hits the hot path only
as vectorized pandas/Arrow UDFs (never per-row Python UDFs).
"""

from change_data_capturer_ms_spark.config import EngineConfig
from change_data_capturer_ms_spark.session import get_spark

__all__ = ["EngineConfig", "get_spark"]

__version__ = "0.1.0"
