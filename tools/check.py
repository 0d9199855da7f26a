#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, runs each SQL in DuckDB over views
named after the parquet tables in <sfDir>, loads the Spark result parquet
from <verifyOutDir>/<name>/, sorts columns by name, sorts rows, and
compares (exact + tolerant-float)."""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) and len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort",
                            ignore_index=True)
    return df


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = canon(pd.concat([pd.read_parquet(f) for f in files],
                                  ignore_index=True))
            exp = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns spark={list(got.columns)} "
                  f"duck={list(exp.columns)}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows spark={len(got)} duck={len(exp)}")
            n_fail += 1
            continue
        ok = True
        detail = ""
        for c in got.columns:
            g, e = got[c], exp[c]
            # Driver's strict gate hashes rendered values: int64 242 vs
            # float64 242.0 hash-differ even when numerically equal. A
            # float-vs-int dtype split is therefore a hard FAIL here too
            # (fix the oracle SQL with CAST(... AS BIGINT)).
            g_f = np.issubdtype(g.dtype, np.floating)
            e_f = np.issubdtype(e.dtype, np.floating)
            g_i = np.issubdtype(g.dtype, np.integer)
            e_i = np.issubdtype(e.dtype, np.integer)
            if (g_f and e_i) or (g_i and e_f):
                ok = False
                detail = (f"col {c}: dtype mismatch spark={g.dtype} "
                          f"duck={e.dtype} (strict hash renders "
                          f"X vs X.0 — CAST the oracle side)")
                break
            if g_f or e_f:
                ga = g.astype(float).to_numpy()
                ea = e.astype(float).to_numpy()
                both_nan = np.isnan(ga) & np.isnan(ea)
                close = np.isclose(ga, ea, rtol=1e-9, atol=1e-9) | both_nan
                exact = ((ga == ea) | both_nan).all()
                if not close.all():
                    ok = False
                    i = int(np.argmin(close))
                    detail = f"col {c} row {i}: {ga[i]} != {ea[i]}"
                    break
                if not exact:
                    detail += f" [col {c}: float-close-not-exact]"
            else:
                gs = g.astype(str).to_numpy()
                es = e.astype(str).to_numpy()
                if not (gs == es).all():
                    ok = False
                    i = int(np.argmin(gs == es))
                    detail = f"col {c} row {i}: {gs[i]!r} != {es[i]!r}"
                    break
        if ok:
            print(f"PASS {name} ({len(got)} rows){detail}")
            n_pass += 1
        else:
            print(f"FAIL {name}: {detail}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
