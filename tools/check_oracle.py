#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB against the parquet tables in
<sfDir>, and compares: columns sorted by name, rows sorted, exact value
equality. TYPE-STRICT like the driver's hasher: an int and a float (or
Decimal) that compare numerically equal still FAIL — `3397 == 3397.0` being
True in Python is exactly how the r14 samp_shard_export HUGEINT mismatch
slipped past the previous version of this replica while the driver failed
the row. A value-equal-but-type-different row set is reported as TYPE so
the fix (a CAST in the oracle SQL) is obvious.
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
    """pandas DataFrame -> column-name-sorted, row-sorted list of tuples of
    (type-tag, value) pairs — the tag makes int/float/Decimal distinct.

    Rows sort by the UNTAGGED values (numerics as numbers, everything else
    as str): sorting by str() of the tagged tuples ordered ('i', 3397) and
    ('f', 3397.0) differently on each side, misaligning the zip and
    reporting a value FAIL where the TYPE diagnostic was intended."""
    df = df[sorted(df.columns)]
    rows = [tuple(norm(v) for v in r) for r in df.itertuples(index=False, name=None)]
    return sorted(rows, key=lambda r: tuple(sort_key(x) for x in r)), list(df.columns)


def sort_key(c):
    """type-agnostic ordering key for one tagged cell: all numeric kinds
    (bool/int/float/Decimal) compare as numbers (NaN after everything),
    lists recurse, everything else as str."""
    t, v = c
    if t == "l":
        return ("l", tuple(sort_key(x) for x in v))
    if t in ("b", "i", "f", "dec"):
        f = float(v)
        if math.isnan(f):
            return ("n", (2, 0.0, ""))
        return ("n", (1, f, str(v)))
    return ("s", str(v))


def norm(v):
    """-> (tag, canonical-value). numpy scalars fold into their python
    kin (both sides produce them), but int vs float vs Decimal vs bool
    stay DISTINCT — the driver hashes them differently."""
    try:
        import numpy as np
        if isinstance(v, np.bool_):
            v = bool(v)
        elif isinstance(v, np.integer):
            v = int(v)
        elif isinstance(v, np.floating):
            v = float(v)
        elif isinstance(v, np.ndarray):
            v = list(v)
    except ImportError:
        pass
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, float):
        return ("f", v)
    if isinstance(v, (list, tuple)):
        return ("l", tuple(norm(x) for x in v))
    try:
        import decimal
        if isinstance(v, decimal.Decimal):
            return ("dec", v)
    except ImportError:
        pass
    return (type(v).__name__, v)


def val(c):
    """strip the type tags back off for value-only comparison."""
    t, v = c
    return tuple(val(x) for x in v) if t == "l" else v


def values_equal(a, b):
    """python-loose equality of the untagged values (int 3 == float 3.0)."""
    return val(a) == val(b)


def close(a, b):
    a, b = val(a), val(b)
    return _close(a, b)


def _close(a, b):
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-12)
    if isinstance(a, tuple) and isinstance(b, tuple) and len(a) == len(b):
        return all(_close(x, y) for x, y in zip(a, b))
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
        if g_rows == w_rows:
            print(f"PASS {name} ({len(g_rows)} rows, exact)")
            n_pass += 1
            continue
        n_fail += 1
        # classify the first mismatches: type-only, float near-miss, or value
        pairs = list(zip(g_rows, w_rows))
        type_only = all(all(values_equal(a, b) for a, b in zip(ga, wa))
                        for ga, wa in pairs)
        if type_only:
            diffs = [(a, b) for ga, wa in pairs
                     for a, b in zip(ga, wa) if a != b][:3]
            print(f"TYPE {name}: values equal but types differ "
                  f"(driver WILL fail — CAST in the oracle SQL): {diffs}")
            continue
        near = all(close(a, b) for ga, wa in pairs for a, b in zip(ga, wa))
        if near:
            diffs = [(a, b) for ga, wa in pairs
                     for a, b in zip(ga, wa) if a != b][:3]
            print(f"NEAR {name}: float-only diffs (driver may still fail!): {diffs}")
        else:
            diffs = [(a, b) for ga, wa in pairs
                     for a, b in zip(ga, wa) if not close(a, b)][:3]
            print(f"FAIL {name}: value diffs: {diffs}")
    print(f"\n{n_pass} pass / {n_fail} fail of {n_pass + n_fail}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
