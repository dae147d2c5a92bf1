#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
loads each <outDir>/<name> parquet (Spark result), runs the matching
oracle SQL from <outDir>/oracle_sql.json in DuckDB over the sfDir tables,
sorts columns by name, normalizes, and compares row-by-row.

TYPE GATE (added round 14, after the p25 incident): the driver's hasher is
type-sensitive, so value equality under string normalization is NOT enough.
DuckDB promotes SUM(BIGINT) and window-SUM arithmetic to HUGEINT (int128),
which Spark can never emit; the r12/r13 p25 failures were exactly this, and
the old string-normalizing compare was structurally blind to it. Now every
query FAILS if (a) any oracle output column is HUGEINT/UHUGEINT, or (b) an
oracle column's type family (int / float / decimal / ...) differs from the
Spark output column with the same name. Local PASS therefore implies
type-compatible results, matching what the driver's typed hasher checks.

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


def family(t):
    """Collapse a DuckDB type name to the hash-compatibility family the
    driver's typed hasher distinguishes."""
    t = str(t).upper()
    if "HUGEINT" in t:
        return "hugeint"  # int128: Spark cannot emit this; always a bug
    if t.startswith("DECIMAL"):
        return "decimal"
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if t in ("FLOAT", "DOUBLE", "REAL"):
        return "float"
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    return t


def type_mismatches(got_rel, want_rel):
    """Name-matched column type-family diffs (oracle vs Spark output)."""
    got_t = dict(zip(got_rel.columns, [str(t) for t in got_rel.types]))
    want_t = dict(zip(want_rel.columns, [str(t) for t in want_rel.types]))
    bad = []
    for c in sorted(set(got_t) & set(want_t)):
        fw, fg = family(want_t[c]), family(got_t[c])
        if fw == "hugeint":
            bad.append(f"{c}: oracle {want_t[c]} (int128 — cast to BIGINT)")
        elif fw != fg:
            bad.append(f"{c}: oracle {want_t[c]} vs spark {got_t[c]}")
    return bad


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
        tbad = type_mismatches(got_rel, want_rel)
        if sorted(got_rel.columns) != sorted(want_rel.columns):
            print(f"FAIL {name}: cols {sorted(got_rel.columns)} vs {sorted(want_rel.columns)}")
            n_fail += 1
        elif tbad:
            print(f"FAIL {name}: type mismatch [{'; '.join(tbad)}]")
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
