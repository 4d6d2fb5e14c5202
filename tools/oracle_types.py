#!/usr/bin/env python3
"""Registry-integrity gate: assert every oracle SQL's output column types.

Usage: python3 tools/oracle_types.py <sfDir> <oracle_sql.json>

Runs `DESCRIBE (<sql>)` for every registered oracle (no data is read, so
this completes in seconds) and fails if any output column's DuckDB type
falls outside the set with an exact Spark analogue — HUGEINT and DECIMAL
being the usual offenders (`sum(BIGINT)` is HUGEINT in DuckDB and `//`
propagates it), which hash-mismatch against Spark BIGINT at the driver
even when values are identical (round-7 q135/q168).
"""
import json
import sys

import duckdb

from parity import TABLES, oracle_type_errors


def main(sf_dir: str, oracle_path: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(oracle_path))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            bad = oracle_type_errors(con, sql)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            failures += 1
            continue
        if bad:
            print(f"FAIL {name}: non-Spark-typed oracle column(s): {bad}")
            failures += 1
        else:
            print(f"OK   {name}")
    print(f"\n{len(oracle) - failures}/{len(oracle)} oracles Spark-typed")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
