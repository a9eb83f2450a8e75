"""Op-type classification as a vectorized pandas UDF.

The reference hardcodes every Mongo change to operationType "insert"
(/root/reference/src/factory/mongoCDCService.ts:29-33) after server-side filtering to
insert|update|replace (/root/reference/src/capturer/mongo/mongo.ts:23). The engine
classifies all four ops for real (north_star), Arrow-batched.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

# op → merge action class
OP_CLASSES = {
    "insert": "upsert",
    "update": "upsert",
    "replace": "upsert",
    "delete": "delete",
}


@pandas_udf(StringType())
def _classify_pd(op: pd.Series) -> pd.Series:
    return op.map(OP_CLASSES).fillna("unknown")


def classify_op_pandas(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return _classify_pd(c)


def classify_op_builtin(col: str | Column) -> Column:
    """CASE-expression twin (codegen path + the DuckDB-oracle-expressible form)."""
    c = F.col(col) if isinstance(col, str) else col
    expr = F.lit("unknown")
    out = F.when(c == "delete", F.lit("delete")).when(
        c.isin("insert", "update", "replace"), F.lit("upsert")
    ).otherwise(expr)
    return out
