#!/usr/bin/env python3
"""DuckDB result-type sweep over the oracle SQL surface.

Usage: python3 tools/type_sweep.py <sfDir> <oracle_sql.json>

Binds (does NOT execute) every oracle statement in DuckDB and fails if any
result column infers HUGEINT / UHUGEINT / DECIMAL. The driver's correctness
gate hashes values TYPE-SENSITIVELY, so a DuckDB SUM(BIGINT) -> HUGEINT
column hash-mismatches a Spark LongType column even when every value is
equal — the r11 (lay_compaction), r12 (tx_mix_weights), r14
(samp_shard_export) failure class. This sweep is invoked from
OracleTypeSpec at `sbt test` time, so the class cannot ship again: every
new oracle row is swept the moment it is registered.

Exit 0 = clean; exit 1 = at least one offending column (listed on stdout).
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

BAD = ("HUGEINT", "UHUGEINT", "DECIMAL")


def main():
    sf_dir, oracle_json = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(oracle_json))
    bad = []
    for name, sql in sorted(oracle.items()):
        try:
            rel = con.sql(sql)
            cols, types = rel.columns, [str(t).upper() for t in rel.types]
        except Exception as e:
            bad.append(f"{name}: bind error: {str(e)[:200]}")
            continue
        for c, ty in zip(cols, types):
            if any(b in ty for b in BAD):
                bad.append(f"{name}: column `{c}` infers {ty} "
                           "(cast it to BIGINT/DOUBLE in the oracle SQL)")
    for b in bad:
        print(f"TYPE-SWEEP FAIL {b}")
    print(f"type sweep: {len(oracle) - len(set(b.split(':')[0] for b in bad))} clean"
          f" / {len(oracle)} statements, {len(bad)} offending column(s)")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
