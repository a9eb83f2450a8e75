from change_data_capturer_ms_spark.queue.queue_json import (
    JsonQueueSink,
    QueueConsumer,
    parse_envelopes,
)

__all__ = ["JsonQueueSink", "QueueConsumer", "parse_envelopes"]
