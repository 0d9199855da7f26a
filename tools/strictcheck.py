#!/usr/bin/env python3
"""Strict (bit-exact) mimic of the driver's hash compare.

Usage: python3 tools/strictcheck.py <sfDir> <verifyOutDir> [name ...]

Like tools/check.py but with NO float tolerance: after sorting columns
by name and rows by all columns, every value must be exactly equal
(floats compared by bit pattern via repr). This is the bar the driver's
hash_match applies; check.py's isclose pass is NOT sufficient.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def cell(v):
    # null check FIRST: NaN must map to '<null>' before the float-repr
    # branch (else float-dtype NaN renders 'nan' while object-dtype None
    # renders '<null>' and null-bearing columns spuriously mismatch)
    if v is None:
        return "<null>"
    if isinstance(v, float):
        return "<null>" if np.isnan(v) else repr(v)  # bit-faithful doubles
    try:
        if pd.isna(v):  # pd.NaT / pd.NA in object columns
            return "<null>"
    except (TypeError, ValueError):
        pass  # array-valued cell: isna is ambiguous, fall through
    # a DATE surfaces as datetime.date from Spark parquet but as a
    # midnight datetime64 from DuckDB's .df(); the driver's rendering
    # (Series.astype(str)) drops the zero time-of-day, so match it —
    # symmetric on both sides, so genuine timestamps stay comparable
    if isinstance(v, (pd.Timestamp, np.datetime64)):
        t = pd.Timestamp(v)
        if t.time() == pd.Timestamp(0).time() and t.tz is None:
            return str(t.date())
    return str(v)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) and len(df.columns):
        # sort on STRINGIFIED cells: object columns holding None raise
        # TypeError under raw sort_values (None vs str comparison), and
        # this also makes the row order engine-dtype-independent
        sdf = pd.DataFrame(
            {c: [cell(v) for v in df[c].tolist()] for c in df.columns})
        order = sdf.sort_values(by=list(sdf.columns), kind="mergesort").index
        df = df.loc[order].reset_index(drop=True)
    return df


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
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
            gs = np.array([cell(v) for v in got[c].tolist()])
            es = np.array([cell(v) for v in exp[c].tolist()])
            neq = gs != es
            if neq.any():
                ok = False
                i = int(np.argmax(neq))
                detail = (f"col {c} ({got[c].dtype}/{exp[c].dtype}) "
                          f"row {i}: spark={gs[i]!r} duck={es[i]!r} "
                          f"(n_diff={int(neq.sum())})")
                break
        if ok:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: {detail}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail (strict)")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
