"""Pure-pandas oracle for the CDC apply semantics (SURVEY.md §7.1).

Independent re-implementation of filter → LWW dedupe → MERGE-with-deletes used to
verify the Spark engine's final table state row-by-row via sha256(content) equality
(BASELINE.json input_hint). Deliberately naive — correctness reference only.
"""

from __future__ import annotations

import hashlib

import pandas as pd


def apply_oracle(
    log: pd.DataFrame,
    captured_ops=("insert", "update", "replace", "delete"),
    keys=("repo", "path"),
) -> pd.DataFrame:
    """Final table state after applying the whole log in seq order."""
    df = log[log["op"].isin(captured_ops)].sort_values("seq")
    state: dict = {}
    for row in df.itertuples(index=False):
        k = tuple(getattr(row, c) for c in keys)
        if row.op == "delete":
            state.pop(k, None)
        else:
            state[k] = row
    rows = []
    for row in state.values():
        d = row._asdict()
        d["content_sha256"] = (
            None if d["content"] is None
            else hashlib.sha256(d["content"].encode("utf-8")).hexdigest()
        )
        d["_last_seq"] = d["seq"]
        rows.append(d)
    out = pd.DataFrame(rows)
    return out.drop(columns=[c for c in ("seq", "op", "seq_bucket") if c in out.columns])
