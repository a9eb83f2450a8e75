from change_data_capturer_ms_spark.sources.changelog import (
    CHANGE_LOG_SCHEMA,
    ChangeLogReader,
    JsonChangeLogReader,
    gen_changelog,
    write_changelog,
)
from change_data_capturer_ms_spark.sources.debezium import (
    DEBEZIUM_OP_MAP,
    DebeziumQueueReader,
    decode_debezium,
    debezium_envelope_schema,
)
from change_data_capturer_ms_spark.sources.snapshot_cdc import snapshot_to_changelog
from change_data_capturer_ms_spark.sources.registry import (
    create_source,
    create_sink,
    register_source,
    register_sink,
)

__all__ = [
    "CHANGE_LOG_SCHEMA",
    "ChangeLogReader",
    "JsonChangeLogReader",
    "DEBEZIUM_OP_MAP",
    "DebeziumQueueReader",
    "decode_debezium",
    "debezium_envelope_schema",
    "gen_changelog",
    "write_changelog",
    "snapshot_to_changelog",
    "create_source",
    "create_sink",
    "register_source",
    "register_sink",
]
