#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir> [query ...]

Reads each <out_dir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from <out_dir>/oracle_sql.json in DuckDB with views
named after the test tables, sorts columns by name (the driver does the
same before hashing), and compares cell values in row order.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return float(v)
    return v


def cmp_cell(a, b):
    # Strict mirror of the driver's value hash: NO int/float coercion
    # (duckdb HUGEINT -> pandas float64 must be caught, not forgiven)
    # and NO epsilon for floats (the driver hashes exact values).
    try:
        import pandas as pd
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    a, b = norm(a), norm(b)
    import numbers
    def is_int(v):
        return isinstance(v, numbers.Integral) and not isinstance(v, bool)
    if (isinstance(a, float) and is_int(b)) or \
       (isinstance(b, float) and is_int(a)):
        return False  # int column vs float column = driver hash mismatch
    if isinstance(a, float) and isinstance(b, float):
        # last-bit ULP noise passes the driver's hash (observed r03:
        # q143/q154 differ in the 16th digit yet hash-match) — allow it
        if a == b:
            return True
        denom = max(abs(a), abs(b), 1e-12)
        return abs(a - b) / denom < 1e-12
    # decimal vs float/int is fine (exact reprs of the same value)
    try:
        if isinstance(a, (int, float)) or isinstance(b, (int, float)):
            return float(a) == float(b)
    except (TypeError, ValueError):
        pass
    return a == b


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            failures += 1
            continue
        gc, wc = sorted(got.columns), sorted(want.columns)
        if gc != wc:
            print(f"FAIL {name}: columns {gc} != {wc}")
            failures += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            failures += 1
            continue
        got, want = got[gc], want[wc]
        bad = None
        for i in range(len(got)):
            for c in gc:
                if not cmp_cell(got[c].iloc[i], want[c].iloc[i]):
                    bad = (i, c, got[c].iloc[i], want[c].iloc[i])
                    break
            if bad:
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]} col {bad[1]}: "
                  f"spark={bad[2]!r} oracle={bad[3]!r}")
            failures += 1
        else:
            print(f"OK   {name} ({len(got)} rows)")
    print(f"{'ALL GREEN' if failures == 0 else f'{failures} FAILURES'}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
