"""Document flattening — nested JSON post-image → typed columns.

The reference passes the schemaless `fullDocument` through untouched
(/root/reference/src/capturer/mongo/mongo.ts:26-33); the engine flattens it to typed
columns (north_star "document flattening") with `from_json` + star-expansion —
pure Catalyst expressions, codegen'd, no Python in the path (E4). `get_json_object`
stays available for ad-hoc paths without a declared schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# schema of the synthetic change-log props document (FIXTURES.md §1)
PROPS_SCHEMA = T.StructType(
    [
        T.StructField("size_bytes", T.LongType()),
        T.StructField("origin", T.StringType()),
        T.StructField("is_pr", T.BooleanType()),
    ]
)


def flatten_json_col(
    df: DataFrame,
    json_col: str = "props",
    schema: T.StructType = PROPS_SCHEMA,
    prefix: str = "",
    drop_source: bool = False,
) -> DataFrame:
    """Star-expand a JSON string column into top-level typed columns."""
    parsed = df.withColumn("_doc", F.from_json(F.col(json_col), schema))
    for f in schema.fields:
        parsed = parsed.withColumn(prefix + f.name, F.col(f"_doc.{f.name}"))
    parsed = parsed.drop("_doc")
    return parsed.drop(json_col) if drop_source else parsed
