#!/usr/bin/env python3
"""Dev-only replica of the driver's correctness gate.

Usage: python3 tools/compare.py <sfDir> <outDir>
  - expects `outDir/<name>/` parquet dirs written by graft.Verify
  - expects `outDir/oracle_sql.json`
Registers each test table as a DuckDB view named after the table, runs each
oracle SQL, and compares against the Spark result: columns sorted by name,
rows sorted, exact match (with a tiny float tolerance fallback reported
separately so we know which queries rely on it).
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) == 0:
        return df.reset_index(drop=True)
    # stringify for stable sort incl. None
    key = df.astype(str).apply(lambda r: "\x00".join(r.values), axis=1)
    df = df.iloc[key.argsort(kind="mergesort")].reset_index(drop=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        res_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark result written"); n_fail += 1; continue
        try:
            spark_df = pd.concat([pd.read_parquet(f) for f in files])
            duck_df = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {str(e)[:200]}"); n_fail += 1; continue
        s, o = norm(spark_df), norm(duck_df)
        if list(s.columns) != list(o.columns):
            print(f"FAIL {name}: columns {list(s.columns)} vs {list(o.columns)}"); n_fail += 1; continue
        if len(s) != len(o):
            print(f"FAIL {name}: rows {len(s)} vs {len(o)}"); n_fail += 1; continue
        # Driver parity: the driver hashes stringified values, so an
        # int64-vs-float64 dtype skew ('0' vs '0.0') or IEEE -0.0 fails its
        # gate even when values compare numerically equal. Require str-exact.
        strfail = []
        for c in s.columns:
            if not (s[c].astype(str).values == o[c].astype(str).values).all():
                strfail.append(c)
        exact = True
        close = True
        for c in s.columns:
            a, b = s[c].values, o[c].values
            if np.issubdtype(s[c].dtype, np.floating) or np.issubdtype(o[c].dtype, np.floating):
                af = pd.to_numeric(s[c], errors="coerce").values.astype(float)
                bf = pd.to_numeric(o[c], errors="coerce").values.astype(float)
                same_nan = np.isnan(af) == np.isnan(bf)
                eq = np.where(np.isnan(af), same_nan, af == bf)
                if not eq.all():
                    exact = False
                    bad0 = np.where(~eq)[0][:2]
                    print(f"  {name}.{c} inexact rows {bad0}: {af[bad0]} vs {bf[bad0]}")
                    cl = np.where(np.isnan(af), same_nan,
                                  np.isclose(af, bf, rtol=1e-9, atol=1e-12))
                    if not cl.all():
                        close = False
                        bad = np.where(~cl)[0][:3]
                        print(f"  {name}.{c} mismatch rows {bad}: {af[bad]} vs {bf[bad]}")
            else:
                if not (pd.Series(a).astype(str).values == pd.Series(b).astype(str).values).all():
                    exact = close = False
                    bad = np.where(pd.Series(a).astype(str).values != pd.Series(b).astype(str).values)[0][:3]
                    print(f"  {name}.{c} mismatch rows {bad}: {a[bad]} vs {b[bad]}")
        if strfail:
            for c in strfail:
                a, b = s[c].astype(str).values, o[c].astype(str).values
                bad = np.where(a != b)[0][:3]
                print(f"  {name}.{c} str-mismatch rows {bad}: {a[bad]} vs {b[bad]}")
            print(f"STRFAIL {name} ({len(s)} rows) — driver hash would fail"); n_fail += 1
        elif exact:
            print(f"PASS {name} ({len(s)} rows)"); n_pass += 1
        elif close:
            print(f"CLOSE {name} ({len(s)} rows) — float-tolerance only"); n_pass += 1
        else:
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
