#!/usr/bin/env python
"""Strict driver-style oracle check: EXACT value equality (floats included).

The driver hashes sorted values, so `round`-level float drift that pytest's
isclose tolerates still fails there.  This script reproduces that bar:

    python scripts/check_oracle.py [--sf /root/testdata/sf0.01] [names...]

Owns the Ray session (the library and __ray_entry__ never call ray.init).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    import pandas as pd
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import duckdb
    import numpy as np
    import pandas as pd
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")

    import __ray_entry__ as em

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{args.sf}/{t}.parquet')")

    qs, sqls = em.queries(), em.oracle_sql()
    names = args.names or sorted(sqls)
    n_fail = 0
    for name in names:
        if name not in sqls:
            print(f"{name:24s} NO_ORACLE (rows-only)")
            res = qs[name](args.sf)
            df = res if isinstance(res, pd.DataFrame) else res.to_pandas()
            print(f"{'':24s}   -> {len(df)} rows")
            continue
        try:
            res = qs[name](args.sf)
            got = canon(res if isinstance(res, pd.DataFrame)
                        else res.to_pandas())
            exp = canon(con.sql(sqls[name]).df())
        except Exception as e:  # noqa: BLE001
            print(f"{name:24s} ERROR: {e!r}")
            n_fail += 1
            continue
        ok_cols = list(got.columns) == list(exp.columns)
        ok_rows = len(got) == len(exp)
        ok_vals = ok_cols and ok_rows
        detail = ""
        if ok_vals:
            for c in got.columns:
                g, e = got[c].to_numpy(), exp[c].to_numpy()
                try:
                    e = e.astype(g.dtype)
                except (ValueError, TypeError):
                    pass
                eq = (g == e) | (pd.isna(g) & pd.isna(e))
                if not eq.all():
                    ok_vals = False
                    i = int(np.argmin(eq))
                    detail = f" col={c} row{i}: {g[i]!r} != {e[i]!r}"
                    break
        status = "OK" if (ok_cols and ok_rows and ok_vals) else "FAIL"
        if status == "FAIL":
            n_fail += 1
            if not ok_cols:
                detail = f" cols {list(got.columns)} != {list(exp.columns)}"
            elif not ok_rows:
                detail = f" rows {len(got)} != {len(exp)}"
        print(f"{name:24s} {status} ({len(got)} rows){detail}")
    ray.shutdown()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
