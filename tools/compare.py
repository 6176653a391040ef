#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's parquet
dump against the DuckDB oracles in oracle_sql.json.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir> [name ...]

For each named query (default: all in oracle_sql.json) this registers the
testdata parquet tables as DuckDB views, runs the oracle SQL, and compares
row count, column names (sorted), and cell values column-name-sorted —
the same shape the driver hashes.
"""
import json
import math
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(round(v, 12))
    if isinstance(v, bytes):
        return v.hex()
    return repr(v)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if not names:
        names = list(oracle)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    failures = 0
    for name in names:
        if name not in oracle:
            print(f"{name:32s} NO_ORACLE (rows-only in the driver)")
            continue
        try:
            spark_tbl = pq.read_table(f"{out_dir}/{name}")
            odf = con.sql(oracle[name])
            ocols = odf.columns
            orows = odf.fetchall()
        except Exception as e:
            print(f"{name:32s} ERR {e}")
            failures += 1
            continue
        scols = spark_tbl.column_names
        if sorted(scols) != sorted(ocols):
            print(f"{name:32s} SCHEMA spark={sorted(scols)} oracle={sorted(ocols)}")
            failures += 1
            continue
        order = sorted(scols)
        sdata = spark_tbl.to_pydict()
        srows = list(zip(*[sdata[c] for c in order]))
        idx = [ocols.index(c) for c in order]
        orows2 = [tuple(r[i] for i in idx) for r in orows]
        if len(srows) != len(orows2):
            print(f"{name:32s} ROWS spark={len(srows)} oracle={len(orows2)}")
            failures += 1
            continue
        # sort rows before comparing: queries ordered by a non-unique key
        # may legitimately interleave ties differently across engines
        # (the driver's hash gate is likewise order-insensitive)
        snorm = sorted(tuple(map(norm, r)) for r in srows)
        onorm = sorted(tuple(map(norm, r)) for r in orows2)
        bad = None
        for i, (a, b) in enumerate(zip(snorm, onorm)):
            if a != b:
                bad = (i, a, b)
                break
        if bad:
            print(f"{name:32s} VALUE row {bad[0]}: spark={bad[1]} oracle={bad[2]}")
            failures += 1
        else:
            print(f"{name:32s} OK ({len(srows)} rows)")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
