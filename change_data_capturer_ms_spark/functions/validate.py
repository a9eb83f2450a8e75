"""Schema-on-read validation with a quarantine (DLQ) split.

The reference decodes untrusted payloads with io-ts and routes failures to
`Either.Left` / `Option.none` (lease items: /root/reference/src/capturer/cosmos/
utils.ts:76-91 — a decode failure yields None, never a crash; queue params:
/root/reference/src/queue/factory.ts:19-53). The engine's distributed
re-expression: one pass tags each row valid/invalid against declared
constraints, then two column-pruned filters split the batch into an apply
frame and a quarantine frame carrying per-row reasons — bad rows never poison
a MERGE and are never silently dropped.

Everything is builtin Catalyst expressions (casts + null checks + isin), so
validation rides whole-stage codegen; the tagged frame is computed once per
branch off the same scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def validate_batch(
    df: DataFrame,
    required: list[str] | None = None,
    op_col: str = "op",
    allowed_ops: tuple[str, ...] = ("insert", "update", "replace", "delete"),
    seq_col: str = "seq",
    content_col: str | None = "content",
    delete_op: str = "delete",
) -> tuple[DataFrame, DataFrame]:
    """Split a change batch into (valid, quarantine).

    Checks, each contributing a reason string:
      - required columns non-null,
      - op within the domain (reference $match op filter, mongo.ts:23),
      - seq castable to long and non-negative,
      - content non-null unless op is a delete.

    Returns (valid rows with original schema, quarantine rows + `_reasons`
    array<string>).
    """
    required = required if required is not None else ["repo", "path"]
    reasons = []
    for c in required:
        reasons.append(F.when(F.col(c).isNull(), F.lit(f"null:{c}")))
    # NULL-safe: `isin` is NULL (not FALSE) for a NULL op, so `~isin` alone
    # would never fire and NULL-op rows would bypass the DLQ only to be dropped
    # silently by the captured-ops filter downstream — violating the module's
    # never-silently-dropped contract
    reasons.append(
        F.when(F.col(op_col).isNull() | ~F.col(op_col).isin(*allowed_ops),
               F.concat(F.lit("bad_op:"), F.coalesce(F.col(op_col), F.lit("<null>"))))
    )
    reasons.append(
        F.when(F.col(seq_col).cast("long").isNull() | (F.col(seq_col).cast("long") < 0),
               F.lit("bad_seq"))
    )
    if content_col is not None:
        reasons.append(
            F.when(F.col(content_col).isNull()
                   & ~F.col(op_col).eqNullSafe(delete_op),
                   F.lit("null_content_for_upsert"))
        )
    tagged = df.withColumn(
        "_reasons",
        F.filter(F.array(*reasons), lambda r: r.isNotNull()),
    )
    valid = tagged.filter(F.size("_reasons") == 0).drop("_reasons")
    quarantine = tagged.filter(F.size("_reasons") > 0)
    return valid, quarantine
