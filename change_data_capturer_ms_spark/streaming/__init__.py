from change_data_capturer_ms_spark.streaming.pipeline import CDCPipeline, prepare_batch

__all__ = ["CDCPipeline", "prepare_batch"]
