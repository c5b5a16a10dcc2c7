#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/check.py [sfdir] [outdir] [only_query ...]
Runs each oracle SQL from outdir/oracle_sql.json against the sf parquet
tables, loads the Spark-written parquet for the same query, sorts columns
by name then rows by all columns, and compares exactly.
"""
import sys, json, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    fails = []
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            odf = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            fails.append(name); continue
        try:
            sdf = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            fails.append(name); continue
        o = odf[sorted(odf.columns)]
        s = sdf[sorted(sdf.columns)]
        if list(o.columns) != list(s.columns):
            print(f"FAIL {name}: cols oracle={list(o.columns)} spark={list(s.columns)}")
            fails.append(name); continue
        if len(o) != len(s):
            print(f"FAIL {name}: rows oracle={len(o)} spark={len(s)}")
            fails.append(name); continue
        cols = list(o.columns)
        o = o.sort_values(cols, kind="mergesort").reset_index(drop=True)
        s = s.sort_values(cols, kind="mergesort").reset_index(drop=True)
        bad = []
        for c in cols:
            oc, sc = o[c], s[c]
            if oc.dtype != sc.dtype:
                try:
                    sc = sc.astype(oc.dtype)
                except Exception:
                    bad.append((c, "dtype", oc.dtype, sc.dtype)); continue
            eq = (oc == sc) | (oc.isna() & sc.isna())
            if not eq.all():
                i = eq[~eq].index[0]
                bad.append((c, i, oc[i], sc[i]))
        if bad:
            print(f"FAIL {name}: {len(bad)} col mismatches")
            for b in bad[:4]:
                print(f"   col={b[0]} at={b[1]} oracle={b[2]!r} spark={b[3]!r}")
            fails.append(name)
        else:
            print(f"PASS {name} ({len(o)} rows x {len(cols)} cols)")
    n = len([k for k in oracle if not only or k in only])
    print(f"\n{n - len(fails)}/{n} pass" + (f"; FAILS: {fails}" if fails else ""))
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
