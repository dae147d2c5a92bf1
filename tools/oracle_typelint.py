#!/usr/bin/env python3
"""One-shot corpus lint: run every oracle SQL through DuckDB and assert no
output column is HUGEINT/UHUGEINT (int128) — a type Spark can never emit,
so any such column is a guaranteed driver-gate hash failure (the r12/r13
p25_pack_chunks class). Cheap: LIMIT-0 planning only, no Spark run needed.

Usage: python3 tools/oracle_typelint.py <sfDir> <oracle_sql.json>
       (oracle_sql.json is dumped by `graft.Verify` into its outDir)
"""
import glob
import json
import os
import sys

import duckdb


def main(sf_dir, oracle_json):
    con = duckdb.connect()
    for f in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(f)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")
    oracles = json.load(open(oracle_json))
    bad = 0
    for name, sql in sorted(oracles.items()):
        try:
            rel = con.sql(f"SELECT * FROM ({sql}) LIMIT 0")
        except Exception as e:
            print(f"ERROR {name}: {e}")
            bad += 1
            continue
        huge = [c for c, t in zip(rel.columns, rel.types)
                if "HUGEINT" in str(t).upper()]
        if huge:
            print(f"HUGEINT {name}: {huge} — cast to BIGINT inside the oracle")
            bad += 1
    print(f"== {len(oracles)} oracles, {bad} flagged ==")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
