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


# Oracle output column types the driver's hash gate normalizes the same
# way Spark's parquet dump does. DuckDB sum() over integers yields HUGEINT
# (int128) which the driver hashes differently from BIGINT even when the
# values are identical (round-9 lesson: 6 bit-identical queries read as
# red). DECIMAL has the same hazard. Fail fast on oracle SQL whose OUTPUT
# schema contains them — fix is CAST(... AS BIGINT/DOUBLE) in the oracle.
SAFE_TYPES = ("BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE",
              "FLOAT", "VARCHAR", "BOOLEAN", "DATE", "TIMESTAMP", "BLOB")
BANNED_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")


def check_types(con, sql):
    """Return list of (col, type) oracle output columns with banned types."""
    desc = con.sql(f"DESCRIBE {sql}").fetchall()
    bad = []
    for row in desc:
        col, typ = row[0], row[1].upper()
        if any(typ.startswith(b) for b in BANNED_TYPES) or \
                not any(typ.startswith(s) for s in SAFE_TYPES):
            bad.append((col, row[1]))
    return bad


def norm(v):
    # NO rounding: the driver's gate hashes full-precision values, so a
    # 12dp-rounded local compare is strictly weaker and can pass queries
    # the driver fails. Exactness conventions (round(...,4-6) in BOTH
    # engines) must make the dumped values literally identical.
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
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
            banned = check_types(con, oracle[name])
            if banned:
                print(f"{name:32s} ORACLE_TYPE {banned} "
                      "(HUGEINT/DECIMAL output breaks the driver's hash "
                      "gate; CAST in the oracle SQL)")
                failures += 1
                continue
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
