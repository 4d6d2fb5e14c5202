#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/parity.py <sfDir> <verifyOutDir>

Registers each testdata parquet as a DuckDB view, runs every entry of
oracle_sql.json, loads the matching Spark-written parquet, sorts columns
by name (the driver does this before hashing), and compares values
exactly. Prints one line per query.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# The driver's hasher distinguishes cell types, so an oracle column that
# DuckDB types as HUGEINT (e.g. sum(BIGINT), or // propagating it) will
# hash-mismatch a Spark BIGINT even when every value is identical — the
# exact defect that shipped q135/q168 red in round 7. Allow only types
# with an exact Spark analogue; anything else is a registry bug, failed
# here before values are even compared.
ALLOWED_TYPES = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE",
                 "FLOAT", "VARCHAR", "DATE", "TIMESTAMP", "BOOLEAN", "BLOB"}


def oracle_type_errors(con, sql: str) -> list:
    """Return [(col, duckdb_type)] for oracle output columns whose DuckDB
    type has no exact Spark analogue (HUGEINT, DECIMAL, ...)."""
    desc = con.execute(f"DESCRIBE ({sql})").fetchall()
    bad = []
    for row in desc:
        col, typ = row[0], row[1].upper()
        base = typ.split("(")[0].strip()
        if base not in ALLOWED_TYPES and not base.endswith("[]"):
            bad.append((col, typ))
    return bad


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # Normalize timestamp-ish and float cell values to comparable forms.
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        elif df[c].dtype == object:
            df[c] = df[c].apply(
                lambda v: str(v) if not isinstance(v, (int, float, str, bytes, type(None))) else v)
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            bad_types = oracle_type_errors(con, sql)
            if bad_types:
                print(f"FAIL {name}: oracle column type(s) with no exact "
                      f"Spark analogue: {bad_types} — CAST in the oracle SQL")
                failures += 1
                continue
            expected = canon(con.execute(sql).df())
            got = canon(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            failures += 1
            continue
        if list(expected.columns) != list(got.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(expected.columns)}")
            failures += 1
            continue
        if len(expected) != len(got):
            print(f"FAIL {name}: rows {len(got)} != {len(expected)}")
            failures += 1
            continue
        diff_cols = []
        for c in expected.columns:
            e, g = expected[c], got[c]
            try:
                same = (e.fillna("<null>") == g.fillna("<null>")).all() \
                    if e.dtype == object else ((e == g) | (e.isna() & g.isna())).all()
            except Exception:  # noqa: BLE001
                same = list(e) == list(g)
            if not same:
                diff_cols.append(c)
        if diff_cols:
            failures += 1
            print(f"FAIL {name}: value mismatch in {diff_cols}")
            c = diff_cols[0]
            mask = ~(((expected[c] == got[c]) |
                      (expected[c].isna() & got[c].isna())))
            idx = mask[mask].index[:3]
            for i in idx:
                print(f"  row {i} col {c}: oracle={expected[c][i]!r} spark={got[c][i]!r}")
        else:
            print(f"OK   {name} ({len(got)} rows)")
    print(f"\n{len(oracle) - failures}/{len(oracle)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
