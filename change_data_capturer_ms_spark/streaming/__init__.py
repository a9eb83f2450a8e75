from change_data_capturer_ms_spark.streaming.pipeline import CDCPipeline, prepare_batch
from change_data_capturer_ms_spark.streaming.stateful import running_key_stats
from change_data_capturer_ms_spark.streaming.joins import stream_interval_join
from change_data_capturer_ms_spark.streaming import audits

__all__ = ["CDCPipeline", "prepare_batch", "running_key_stats",
           "stream_interval_join", "audits"]
