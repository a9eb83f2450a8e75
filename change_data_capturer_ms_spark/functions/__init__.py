from change_data_capturer_ms_spark.functions.hashing import (
    content_sha256_builtin,
    content_sha256_pandas,
    custom_id,
)
from change_data_capturer_ms_spark.functions.classify import classify_op_pandas, OP_CLASSES
from change_data_capturer_ms_spark.functions.flatten import flatten_json_col, PROPS_SCHEMA
from change_data_capturer_ms_spark.functions.validate import validate_batch

__all__ = [
    "content_sha256_builtin",
    "content_sha256_pandas",
    "custom_id",
    "classify_op_pandas",
    "OP_CLASSES",
    "flatten_json_col",
    "PROPS_SCHEMA",
    "validate_batch",
]
