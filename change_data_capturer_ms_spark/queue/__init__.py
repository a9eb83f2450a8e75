from change_data_capturer_ms_spark.queue.queue_json import (
    JsonQueueSink,
    parse_envelopes,
)

__all__ = ["JsonQueueSink", "parse_envelopes"]
