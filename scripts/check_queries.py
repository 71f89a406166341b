"""Driver-style correctness check: run queries() vs oracle_sql().

Usage:  python scripts/check_queries.py [--sf DIR] [name ...]
        (no names = every query that has an oracle)

Emulates the harness compare: row count, column-name set, and a
value-level comparison with columns sorted by name and rows sorted by
all columns; floats rounded to 6dp, timestamps normalized to strings.
"""

from __future__ import annotations

import argparse
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.dt.strftime("%Y-%m-%d %H:%M:%S")
        elif pd.api.types.is_float_dtype(s):
            df[c] = np.round(s.astype(np.float64), 6)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
        elif s.dtype == object:
            df[c] = s.astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import os

    os.environ["SPARK_GRAFT_ORACLE_SF"] = args.sf  # data-derived oracles

    from log_aggregation_pipeline_spark.session import get_spark

    import __spark_entry__ as E

    spark = get_spark(cores=args.cores)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")

    qs, os_ = E.queries(), E.oracle_sql()
    names = args.names or [n for n in qs if n in os_]
    def _free(df):
        # caller-owned cache lifetime: LSH pair plans persist their
        # shingle frames; free after materialization so a full-set
        # sweep doesn't accumulate cached blocks across queries
        for f in getattr(df, "lap_persisted", ()):
            f.unpersist()

    n_fail = 0
    for name in names:
        if name not in os_:
            df = qs[name](spark, args.sf)
            try:
                print(f"{name:32s} NO-ORACLE (rows={df.count()})")
            finally:
                _free(df)
            continue
        df = None
        try:
            df = qs[name](spark, args.sf)
            sp = normalize(df.toPandas())
            dk = normalize(con.sql(os_[name]).df())
        except Exception as exc:  # noqa: BLE001
            # free in the error path too: a query failing mid-action
            # must not leave its persisted blocks cached for the rest
            # of a multi-hundred-query sweep
            print(f"{name:32s} ERROR: {exc}")
            n_fail += 1
            continue
        finally:
            if df is not None:
                _free(df)
        rows_ok = len(sp) == len(dk)
        cols_ok = list(sp.columns) == list(dk.columns)
        val_ok = rows_ok and cols_ok and sp.astype(str).equals(dk.astype(str))
        status = "OK" if (rows_ok and cols_ok and val_ok) else "FAIL"
        if status == "FAIL":
            n_fail += 1
            print(
                f"{name:32s} FAIL rows={len(sp)}/{len(dk)} cols_ok={cols_ok} "
                f"val_ok={val_ok}"
            )
            if rows_ok and cols_ok and not val_ok:
                diff = (sp.astype(str) != dk.astype(str)).any(axis=1)
                print("  spark:\n", sp[diff].head(4))
                print("  duckdb:\n", dk[diff].head(4))
            elif not cols_ok:
                print(f"  spark cols : {list(sp.columns)}")
                print(f"  duckdb cols: {list(dk.columns)}")
        else:
            print(f"{name:32s} OK   rows={len(sp)}")
    print(f"\n{'ALL GREEN' if n_fail == 0 else f'{n_fail} FAILURES'}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
