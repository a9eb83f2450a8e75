"""Source / sink registries — the reference's factory dispatch, kept open.

Reference: `createDatabaseService` dispatches on a ServiceType enum and returns a
typed error for unsupported kinds (/root/reference/src/factory/factory.ts:22-33);
`createInternalQueueService` does the same for sinks
(/root/reference/src/queue/factory.ts:57-68). We keep the open-enum + exact
error-message contract but as plain dict registries, so new formats (a real Iceberg
catalog, Kafka) bind without touching engine code.
"""

from __future__ import annotations

from typing import Callable

from change_data_capturer_ms_spark.errors import NotSupportedError, QueueNotSupportedError

_SOURCES: dict[str, Callable] = {}
_SINKS: dict[str, Callable] = {}


def register_source(kind: str) -> Callable:
    def deco(factory: Callable) -> Callable:
        _SOURCES[kind] = factory
        return factory
    return deco


def register_sink(kind: str) -> Callable:
    def deco(factory: Callable) -> Callable:
        _SINKS[kind] = factory
        return factory
    return deco


def create_source(kind: str, *args, **kwargs):
    try:
        factory = _SOURCES[kind]
    except KeyError:
        # exact message parity: /root/reference/src/factory/factory.ts:20
        raise NotSupportedError() from None
    return factory(*args, **kwargs)


def create_sink(kind: str, *args, **kwargs):
    try:
        factory = _SINKS[kind]
    except KeyError:
        # exact message parity: /root/reference/src/queue/factory.ts:55
        raise QueueNotSupportedError() from None
    return factory(*args, **kwargs)


# built-in bindings
@register_source("changelog-parquet")
def _changelog_source(spark, log_path, schema=None):
    from change_data_capturer_ms_spark.sources.changelog import ChangeLogReader
    return ChangeLogReader(spark, log_path, schema)


@register_sink("lake-parquet")
def _lake_sink(spark, table_path, key_cols=("repo", "path"), **kwargs):
    from change_data_capturer_ms_spark.lake.table import LakeTable
    return LakeTable(spark, table_path, key_cols=list(key_cols), **kwargs)


@register_sink("queue-json")
def _queue_json_sink(spark, queue_path, key_cols=("repo", "path"), **kwargs):
    """Message-envelope queue sink (reference K3/K4 produce side,
    /root/reference/src/queue/eventhub/utils.ts:91-98)."""
    from change_data_capturer_ms_spark.queue import JsonQueueSink
    return JsonQueueSink(spark, queue_path, key_cols=key_cols, **kwargs)


@register_source("queue-json")
def _queue_json_source(spark, queue_path, key_cols=("repo", "path"), **kwargs):
    """The same durable queue as a SOURCE: downstream consumers tail committed
    envelopes incrementally (consume / consume_incremental)."""
    from change_data_capturer_ms_spark.queue import JsonQueueSink
    return JsonQueueSink(spark, queue_path, key_cols=key_cols, **kwargs)


@register_source("changelog-jsonl")
def _changelog_jsonl_source(spark, log_path, schema=None, **kwargs):
    """Newline-JSON change log with corrupt-record quarantine (ingest edge)."""
    from change_data_capturer_ms_spark.sources.changelog import JsonChangeLogReader
    return JsonChangeLogReader(spark, log_path, schema, **kwargs)


@register_source("changelog-debezium")
def _changelog_debezium_source(spark, queue_path, payload_schema, **kwargs):
    """Debezium-envelope queue as a change-log source (sources/debezium.py)."""
    from change_data_capturer_ms_spark.sources.debezium import DebeziumQueueReader
    return DebeziumQueueReader(spark, queue_path, payload_schema, **kwargs)
