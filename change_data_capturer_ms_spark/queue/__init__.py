from change_data_capturer_ms_spark.queue.broker_config import (
    NOT_SUPPORTED_ERROR,
    SAS_DECODE_ERROR,
    ProducerConfig,
    bind_queue_service,
    decode_queue_params,
    parse_eventhub_sas,
    plain_producer_config,
)
from change_data_capturer_ms_spark.queue.queue_json import (
    JsonQueueSink,
    QueueConsumer,
    parse_envelopes,
)

__all__ = [
    "JsonQueueSink",
    "QueueConsumer",
    "parse_envelopes",
    "ProducerConfig",
    "parse_eventhub_sas",
    "plain_producer_config",
    "decode_queue_params",
    "bind_queue_service",
    "NOT_SUPPORTED_ERROR",
    "SAS_DECODE_ERROR",
]
