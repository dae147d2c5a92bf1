#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
loads each <outDir>/<name> parquet (Spark result), runs the matching
oracle SQL from <outDir>/oracle_sql.json in DuckDB over the sfDir tables,
sorts columns by name, normalizes, and compares row-by-row.

Usage: python3 tools/compare.py <sfDir> <outDir>
"""
import glob
import json
import math
import os
import sys

import duckdb


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.10g}"
    return str(v)


def table(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return [tuple(norm(r[i]) for i in order) for r in rows]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for f in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(f)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        res_dir = f"{out_dir}/{name}"
        if not os.path.isdir(res_dir):
            print(f"FAIL {name}: no Spark output")
            n_fail += 1
            continue
        try:
            got_rel = con.sql(
                f"SELECT * FROM read_parquet('{res_dir}/*.parquet')")
            got = table(got_rel.fetchall(), got_rel.columns)
            want_rel = con.sql(sql)
            want = table(want_rel.fetchall(), want_rel.columns)
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if sorted(got_rel.columns) != sorted(want_rel.columns):
            print(f"FAIL {name}: cols {sorted(got_rel.columns)} vs {sorted(want_rel.columns)}")
            n_fail += 1
        elif got == want:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: {len(got)} vs {len(want)} rows", end="")
            diff = [(a, b) for a, b in zip(got, want) if a != b][:3]
            print(f"; first diffs: {diff}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
