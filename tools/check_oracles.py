"""Local mimic of the driver's correctness gate: run each __spark_entry__ query and
its DuckDB oracle side-by-side, compare row count + columns + order-insensitive
values. Usage: python tools/check_oracles.py [sf_dir] [query ...]"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            try:
                if len(df) and isinstance(df[c].iloc[0], (list, np.ndarray)):
                    df[c] = df[c].map(lambda v: tuple(np.round(np.asarray(v, dtype=float), 5)))
            except Exception:
                pass
        if np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(5)
        if np.issubdtype(df[c].dtype, np.datetime64):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name, sdf, odf) -> list[str]:
    problems = []
    if len(sdf) != len(odf):
        problems.append(f"rowcount spark={len(sdf)} oracle={len(odf)}")
    if sorted(sdf.columns) != sorted(odf.columns):
        problems.append(f"columns spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        return problems
    a, b = norm(sdf), norm(odf)
    if len(a) == len(b):
        for c in a.columns:
            try:
                if np.issubdtype(a[c].dtype, np.floating) or np.issubdtype(b[c].dtype, np.floating):
                    av = a[c].astype(float).to_numpy()
                    bv = b[c].astype(float).to_numpy()
                    ok = np.allclose(av, bv, rtol=0, atol=2e-5, equal_nan=True)
                else:
                    ok = a[c].astype(str).equals(b[c].astype(str))
            except Exception as e:
                ok = False
            if not ok:
                mism = (a[c].astype(str) != b[c].astype(str))
                idx = list(a.index[mism][:3])
                problems.append(
                    f"values col={c} ndiff={int(mism.sum())} e.g. spark={list(a[c][idx])} "
                    f"oracle={list(b[c][idx])}"
                )
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from change_data_capturer_ms_spark.session import get_spark
    spark = get_spark(master="local[8]", shuffle_partitions=8,
                      extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failed.append(name)
            print(f"FAIL {name}: spark error: {str(e)[:300]}")
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(sdf)} rows  ({time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            failed.append(name)
            print(f"FAIL {name}: oracle error: {str(e)[:300]}")
            continue
        problems = compare(name, sdf, odf)
        if problems:
            failed.append(name)
            print(f"FAIL {name}: " + " | ".join(problems))
        else:
            print(f"OK   {name}: {len(sdf)} rows  ({time.time()-t0:.1f}s)")
    print(f"\n{len(failed)} failed: {failed}")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
