#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage:
    python3 tools/check.py [sf_dir] [out_dir]

Expects `sbt "runMain graft.Verify <sf_dir> <out_dir>"` to have been run
first: <out_dir>/<query>/ holds Spark result parquet, and
<out_dir>/oracle_sql.json holds the DuckDB SQL per query.

Compares each Spark result against DuckDB running the oracle SQL over the
same testdata: columns sorted by name, rows sorted by all columns, exact
cell equality (floats must match bit-for-bit after whatever rounding the
query itself applies).
"""
import glob
import json
import math
import os
import sys

import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(v)
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, int):
        return int(v)
    return str(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))
    return [cols[i] for i in order], out


def main():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    with open(os.path.join(OUT_DIR, "oracle_sql.json")) as f:
        oracles = json.load(f)

    result_dirs = sorted(
        d for d in os.listdir(OUT_DIR)
        if os.path.isdir(os.path.join(OUT_DIR, d)))

    n_pass = n_fail = n_noora = 0
    for name in result_dirs:
        files = glob.glob(os.path.join(OUT_DIR, name, "*.parquet"))
        if not files:
            print(f"FAIL  {name}: no spark parquet output")
            n_fail += 1
            continue
        rel = con.sql(f"SELECT * FROM read_parquet({files!r})")
        s_cols, s_rows = rel.columns, rel.fetchall()
        if name not in oracles:
            print(f"NOORA {name}: rows={len(s_rows)} (rows-only check)")
            n_noora += 1
            if len(s_rows) == 0:
                print(f"      ^ WARNING: zero rows")
            continue
        try:
            orel = con.sql(oracles[name])
            o_cols, o_rows = orel.columns, orel.fetchall()
        except Exception as ex:
            print(f"FAIL  {name}: oracle SQL error: {ex}")
            n_fail += 1
            continue
        sc, sr = norm_rows(s_cols, s_rows)
        oc, orr = norm_rows(o_cols, o_rows)
        if sc != oc:
            print(f"FAIL  {name}: columns spark={sc} oracle={oc}")
            n_fail += 1
            continue
        if len(sr) != len(orr):
            print(f"FAIL  {name}: rowcount spark={len(sr)} oracle={len(orr)}")
            n_fail += 1
            continue
        bad = [(a, b) for a, b in zip(sr, orr) if a != b]
        if bad:
            print(f"FAIL  {name}: {len(bad)}/{len(sr)} rows differ; cols={sc}; first 3:")
            for a, b in bad[:3]:
                print(f"      spark : {a}")
                print(f"      oracle: {b}")
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(sr)} rows")
            if len(sr) == 0:
                print(f"      ^ WARNING: zero rows on both sides")
            n_pass += 1

    missing = set(oracles) - set(result_dirs)
    for name in sorted(missing):
        print(f"FAIL  {name}: oracle present but no spark output dir")
        n_fail += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_noora} rows-only ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
