"""Content hashing + id munging.

north_star: content hashing runs as a vectorized pandas/Arrow UDF; the engine also
keeps the pure-JVM `sha2` builtin (whole-stage-codegen'd) and tests them equal, so
deployments can choose throughput (builtin) vs the mandated UDF path. The per-row
invariant vs the reference final state is sha256(content) equality
(BASELINE.json input_hint).

`custom_id` is the reference's only scalar string op: prefix/id space-to-dash munge
(/root/reference/src/capturer/cosmos/cosmos.ts:40-45 `generateCustomId`).
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType


def content_sha256_builtin(col: str | Column) -> Column:
    """JVM-side sha256 hex (codegen hot path)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sha2(c.cast("string"), 256)


@pandas_udf(StringType())
def _sha256_pd(s: pd.Series) -> pd.Series:
    # Arrow-batched (one Python call per ~10k-row batch), never row-at-a-time pickle
    return s.map(
        lambda v: None if v is None else hashlib.sha256(str(v).encode("utf-8")).hexdigest()
    )


def content_sha256_pandas(col: str | Column) -> Column:
    """Arrow/pandas UDF sha256 hex — the north_star-mandated UDF path; equality with
    the builtin is asserted in tests/test_functions.py."""
    c = F.col(col) if isinstance(col, str) else col
    return _sha256_pd(c)


def custom_id(id_col: str | Column, prefix: str = "") -> Column:
    """generateCustomId parity: `${prefix.replace(" ","-")}${id.replace(" ","-")}`
    (/root/reference/src/capturer/cosmos/cosmos.ts:40-45)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.concat(
        F.regexp_replace(F.lit(prefix), " ", "-"),
        F.regexp_replace(c, " ", "-"),
    )
