#!/usr/bin/env python3
"""Scale-up generator for the empirical scaling table (docs/SCALING.md).

Usage: python3 tools/scale_gen.py <baseSfDir> <outDir> <copies>

Builds <outDir> as a <copies>x enlargement of <baseSfDir>:

- documents: each copy offsets doc_id by k*1_000_000 (a multiple of 10,
  preserving the q44/q45 doc_id%10 slice per copy) and prefixes every
  non-leading token with a copy tag ("xk"), so shingle/passage overlap
  ACROSS copies is zero and every copy contributes its own near-dup
  pair structure — the workload grows linearly, not quadratically in
  clone pairs, which is what an organic corpus does.
- embeddings: each copy offsets vec_id and ROTATES the dimension order
  by (7*k) mod 64 — distinct for every k < 64 (gcd(7, 64) = 1), so no
  two copies share a rotation (the old 16*k rule wrapped at k=4).
  Rotation preserves all within-copy inner products (the pair/cluster
  structure is identical per copy) while cross-copy cosines are
  scrambled far below the 0.4 near-dup threshold.
- relational tables (customer/orders/lineitem/part/supplier/events):
  each copy offsets every table key and foreign key by k*10_000_000,
  so the copies are disjoint consistent subgraphs — joins, funnels,
  and the co-occurrence graph grow linearly (organic growth), never
  quadratically in cross-copy pairs. Dates/timestamps are NOT shifted:
  a 10x corpus has 10x orders per month and 10x events per session
  window, which is what real growth does to a calendar. nation/region
  are dimensions and stay 1x (foreign keys to them are unchanged).

The output feeds Bench via SPARK_GRAFT_SF_DIR. Deterministic: no RNG.
"""
import shutil
import sys

import duckdb

DOC_OFF = 1_000_000
REL_OFF = 10_000_000

# (table, [key columns to offset per copy]); nation/region stay 1x
REL_TABLES = [
    ("customer", ["c_custkey"]),
    ("orders", ["o_orderkey", "o_custkey"]),
    ("lineitem", ["l_orderkey", "l_partkey", "l_suppkey"]),
    ("part", ["p_partkey"]),
    ("supplier", ["s_suppkey"]),
    ("events", ["event_id", "user_id"]),
]
DIM_TABLES = ["region", "nation"]


def main(base: str, out: str, copies: int) -> None:
    import os
    if copies > 10:
        raise SystemExit("copies > 10 would push per-copy id offsets toward "
                         "the next copy's range; use <= 10")
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    # the per-copy id offsets are only injective if base ids stay below them
    max_ids = con.execute(
        f"SELECT (SELECT max(doc_id) FROM read_parquet('{base}/documents.parquet')), "
        f"(SELECT max(vec_id) FROM read_parquet('{base}/embeddings.parquet'))"
    ).fetchone()
    if any(m is not None and m >= DOC_OFF for m in max_ids):
        raise SystemExit(f"base ids {max_ids} >= {DOC_OFF} would collide "
                         "with the per-copy id offset")
    doc_parts = []
    emb_parts = []
    for k in range(copies):
        tag = f" x{k}"  # replaces the token separator -> prefixes tokens
        doc_parts.append(f"""
          SELECT doc_id + {k * DOC_OFF} AS doc_id,
                 {'text' if k == 0 else f"replace(text, ' ', '{tag}')"} AS text,
                 lang, source, n_chars
          FROM read_parquet('{base}/documents.parquet')""")
        rot = 7 * k % 64
        emb = ("embedding" if rot == 0 else
               f"embedding[{rot + 1}:64] || embedding[1:{rot}]")
        emb_parts.append(f"""
          SELECT vec_id + {k * DOC_OFF} AS vec_id,
                 {emb} AS embedding, label
          FROM read_parquet('{base}/embeddings.parquet')""")
    con.execute(f"COPY ({' UNION ALL '.join(doc_parts)}) TO "
                f"'{out}/documents.parquet' (FORMAT PARQUET)")
    con.execute(f"COPY ({' UNION ALL '.join(emb_parts)}) TO "
                f"'{out}/embeddings.parquet' (FORMAT PARQUET)")
    for t, keys in REL_TABLES:
        cols = con.execute(
            f"SELECT column_name FROM (DESCRIBE SELECT * FROM "
            f"read_parquet('{base}/{t}.parquet'))").fetchall()
        mx = con.execute(
            "SELECT max(greatest(" + ", ".join(keys) + ")) FROM "
            f"read_parquet('{base}/{t}.parquet')").fetchone()[0]
        if mx is not None and mx >= REL_OFF:
            raise SystemExit(f"{t} keys reach {mx} >= {REL_OFF}: offsets collide")
        parts = []
        for k in range(copies):
            sel = ", ".join(
                f"{c[0]} + {k * REL_OFF} AS {c[0]}" if c[0] in keys else c[0]
                for c in cols)
            parts.append(
                f"SELECT {sel} FROM read_parquet('{base}/{t}.parquet')")
        con.execute(f"COPY ({' UNION ALL '.join(parts)}) TO "
                    f"'{out}/{t}.parquet' (FORMAT PARQUET)")
    for t in DIM_TABLES:
        shutil.copyfile(f"{base}/{t}.parquet", f"{out}/{t}.parquet")
    n, li = con.execute(
        f"SELECT (SELECT count(*) FROM read_parquet('{out}/documents.parquet')), "
        f"(SELECT count(*) FROM read_parquet('{out}/lineitem.parquet'))").fetchone()
    print(f"wrote {out}: documents={n} lineitem={li} ({copies} copies)")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))
