"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry and its ``oracle_sql()`` twin at a given sf_dir,
compare row count, column names, and an order-insensitive value hash.

Usage: python tools/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df


def value_hash(df: pd.DataFrame) -> str:
    import hashlib
    return hashlib.md5(
        pd.util.hash_pandas_object(canon(df), index=False).values.tobytes()
    ).hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, "%s.parquet" % t)
        if os.path.exists(p):
            con.execute("CREATE VIEW %s AS SELECT * FROM read_parquet('%s')"
                        % (t, p))
    qs = e.queries()
    oracles = e.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            mine = canon(to_pandas(fn(sf_dir)))
        except Exception as ex:
            print("%-24s ERROR (ray): %s" % (name, ex))
            n_fail += 1
            continue
        if name not in oracles:
            print("%-24s rows-only: %d rows, cols=%s" %
                  (name, len(mine), list(mine.columns)))
            continue
        try:
            theirs = canon(con.execute(oracles[name]).fetchdf())
        except Exception as ex:
            print("%-24s ERROR (sql): %s" % (name, ex))
            n_fail += 1
            continue
        ok_rows = len(mine) == len(theirs)
        ok_cols = list(mine.columns) == list(theirs.columns)
        # dtype-insensitive value compare
        try:
            m2 = mine.astype("float64", errors="ignore")
        except Exception:
            m2 = mine
        ok_vals = False
        if ok_rows and ok_cols:
            try:
                mm = mine.reset_index(drop=True)
                tt = theirs.reset_index(drop=True)
                ok_vals = True
                for c in mm.columns:
                    a, b = mm[c], tt[c]
                    if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
                        if not ((a.astype(float) - b.astype(float)).abs() < 1e-9).all():
                            ok_vals = False
                    else:
                        if not (a.astype(str) == b.astype(str)).all():
                            ok_vals = False
            except Exception as ex:
                print("  cmp error:", ex)
        status = "PASS" if (ok_rows and ok_cols and ok_vals) else "FAIL"
        if status == "PASS":
            n_pass += 1
        else:
            n_fail += 1
        print("%-24s %s rows(%d/%d) cols(%s/%s)" %
              (name, status, len(mine), len(theirs),
               list(mine.columns), list(theirs.columns)))
        if status == "FAIL" and ok_rows and ok_cols:
            mm = mine.reset_index(drop=True)
            tt = theirs.reset_index(drop=True)
            for c in mm.columns:
                neq = (mm[c].astype(str) != tt[c].astype(str))
                if neq.any():
                    i = neq.idxmax()
                    print("   first diff col=%s row=%d mine=%r theirs=%r"
                          % (c, i, mm[c][i], tt[c][i]))
                    break
    print("summary: %d pass, %d fail" % (n_pass, n_fail))
    ray.shutdown()


if __name__ == "__main__":
    main()
