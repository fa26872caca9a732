#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: tools/parity.py <sfDir> <verifyOutDir> [query ...]

Loads each <verifyOutDir>/<name> parquet (Spark result), runs the matching
SQL from oracle_sql.json in DuckDB over the sfDir tables, canonicalizes both
(columns sorted by name, rows sorted), and diffs exactly.
"""
import json, sys, glob, os
import duckdb

def canon(rel):
    cols = sorted(rel.columns)
    df = rel.df()[cols]
    df = df.sort_values(by=cols, kind="mergesort").reset_index(drop=True)
    return df

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(outdir)
                   if os.path.isdir(os.path.join(outdir, d)))
    n_pass = n_fail = 0
    for name in names:
        if only and name not in only:
            continue
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        got = canon(con.sql(f"SELECT * FROM read_parquet({files!r})"))
        if name not in oracle:
            print(f"SKIP {name}: no oracle (rows={len(got)})"); continue
        try:
            want = canon(con.sql(oracle[name]))
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}"); n_fail += 1; continue
        eq = got.equals(want)
        if not eq:
            # pinpoint first mismatching cell
            diff = (got != want) & ~(got.isna() & want.isna())
            bad = diff.any(axis=1)
            idx = bad[bad].index[:3]
            print(f"FAIL {name}: value mismatch at rows {list(idx)}")
            for i in idx:
                for c in got.columns:
                    g, w = got.at[i, c], want.at[i, c]
                    if (g != w) and not (g != g and w != w):
                        print(f"   row {i} col {c}: spark={g!r} duckdb={w!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
