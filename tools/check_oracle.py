#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB against the parquet tables in
<sfDir>, and compares: columns sorted by name, rows sorted, exact value
equality (with float near-miss reporting).
"""
import json
import math
import sys

import duckdb
import pyarrow.parquet as pq
import pyarrow as pa

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    """pandas DataFrame -> column-name-sorted, row-sorted list of tuples."""
    df = df[sorted(df.columns)]
    rows = [tuple(norm(v) for v in r) for r in df.itertuples(index=False, name=None)]
    return sorted(rows, key=lambda r: tuple(str(x) for x in r)), list(df.columns)


def norm(v):
    if isinstance(v, float):
        return v
    try:
        import numpy as np
        if isinstance(v, np.integer):
            return int(v)
        if isinstance(v, np.floating):
            return float(v)
        if isinstance(v, np.ndarray):
            return tuple(norm(x) for x in v)
    except ImportError:
        pass
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    try:
        import decimal
        if isinstance(v, decimal.Decimal):
            return float(v)
    except ImportError:
        pass
    return v


def close(a, b):
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-12)
    if isinstance(a, tuple) and isinstance(b, tuple) and len(a) == len(b):
        return all(close(x, y) for x, y in zip(a, b))
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = pq.read_table(f"{out_dir}/{name}").to_pandas()
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            n_fail += 1
            continue
        try:
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {str(e)[:200]}")
            n_fail += 1
            continue
        g_rows, g_cols = canon(got)
        w_rows, w_cols = canon(want)
        if g_cols != w_cols:
            print(f"FAIL {name}: columns differ spark={g_cols} oracle={w_cols}")
            n_fail += 1
            continue
        if len(g_rows) != len(w_rows):
            print(f"FAIL {name}: rowcount spark={len(g_rows)} oracle={len(w_rows)}")
            n_fail += 1
            continue
        exact = g_rows == w_rows
        if exact:
            print(f"PASS {name} ({len(g_rows)} rows, exact)")
            n_pass += 1
            continue
        # find first mismatch; report whether it is a float near-miss
        near = all(close(a, b) for a, b in zip(g_rows, w_rows))
        if near:
            diffs = [(a, b) for a, b in zip(g_rows, w_rows) if a != b][:3]
            print(f"NEAR {name}: float-only diffs (driver may still fail!): {diffs}")
            n_fail += 1
        else:
            diffs = [(a, b) for a, b in zip(g_rows, w_rows) if not close(a, b)][:3]
            print(f"FAIL {name}: value diffs: {diffs}")
            n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail of {n_pass + n_fail}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
