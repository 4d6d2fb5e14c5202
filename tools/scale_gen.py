#!/usr/bin/env python3
"""Scale-up generator for the text/vector stress tables.

Usage: python3 tools/scale_gen.py <baseSfDir> <outDir> <copies>

Builds <outDir> as a <copies>x enlargement of <baseSfDir>:

- documents: each copy offsets doc_id by k*1_000_000 (a multiple of 10,
  preserving the q44/q45 doc_id%10 slice per copy) and prefixes every
  non-leading token with a copy tag ("xk"), so shingle/passage overlap
  ACROSS copies is zero and every copy contributes its own near-dup
  pair structure — the workload grows linearly, not quadratically in
  clone pairs, which is what an organic corpus does.
- embeddings: each copy offsets vec_id and ROTATES the dimension order
  by 16*k. Rotation preserves all within-copy inner products (the
  pair/cluster structure is identical per copy) while cross-copy
  cosines are scrambled far below the 0.4 near-dup threshold.
- every other table is copied 1x (the relational queries are not the
  scaling subject here).

The output feeds Bench via SPARK_GRAFT_SF_DIR for the docs/SCALING.md
empirical scale-up table. Deterministic: no RNG anywhere.
"""
import shutil
import sys

import duckdb

TEXT_TABLES = {"documents", "embeddings"}
COPY_TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
               "lineitem", "events"]


def main(base: str, out: str, copies: int) -> None:
    import os
    # rot = 16*k wraps mod 64 at k=4: copy 4's embeddings would be
    # bit-identical to copy 0's (cross-copy cosine 1.0), silently breaking
    # the "cross-copy cosines scrambled" invariant documented above.
    if copies > 4:
        raise SystemExit("copies > 4 would repeat the dimension rotation "
                         "(16*k mod 64) — cross-copy cosines of 1.0 break "
                         "the linear-growth invariant; use <= 4")
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    # the k*1_000_000 id offset is only injective if base ids stay below 1M
    max_ids = con.execute(
        f"SELECT (SELECT max(doc_id) FROM read_parquet('{base}/documents.parquet')), "
        f"(SELECT max(vec_id) FROM read_parquet('{base}/embeddings.parquet'))"
    ).fetchone()
    if any(m is not None and m >= 1_000_000 for m in max_ids):
        raise SystemExit(f"base ids {max_ids} >= 1_000_000 would collide "
                         "with the per-copy id offset")
    doc_parts = []
    emb_parts = []
    for k in range(copies):
        tag = f" x{k}"  # replaces the token separator -> prefixes tokens
        doc_parts.append(f"""
          SELECT doc_id + {k * 1_000_000} AS doc_id,
                 {'text' if k == 0 else f"replace(text, ' ', '{tag}')"} AS text,
                 lang, source, n_chars
          FROM read_parquet('{base}/documents.parquet')""")
        rot = 16 * k % 64
        emb = ("embedding" if rot == 0 else
               f"embedding[{rot + 1}:64] || embedding[1:{rot}]")
        emb_parts.append(f"""
          SELECT vec_id + {k * 1_000_000} AS vec_id,
                 {emb} AS embedding, label
          FROM read_parquet('{base}/embeddings.parquet')""")
    con.execute(f"COPY ({' UNION ALL '.join(doc_parts)}) TO "
                f"'{out}/documents.parquet' (FORMAT PARQUET)")
    con.execute(f"COPY ({' UNION ALL '.join(emb_parts)}) TO "
                f"'{out}/embeddings.parquet' (FORMAT PARQUET)")
    for t in COPY_TABLES:
        shutil.copyfile(f"{base}/{t}.parquet", f"{out}/{t}.parquet")
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{out}/documents.parquet')").fetchone()[0]
    print(f"wrote {out}: documents={n} rows ({copies} copies)")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))
