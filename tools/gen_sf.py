#!/usr/bin/env python3
"""Deterministic scale-up of the driver's synthetic test tables.

Usage: python3 tools/gen_sf.py <srcDir> <dstDir> [factor=10] [tables]

`tables` (optional, comma-separated) restricts generation to a subset —
e.g. `region,nation,customer,supplier,part,orders,lineitem,events` for a
documents-free relational decade. The source must be an ORIGINAL sf
directory: every shift key is asserted < SPAN before writing (re-running
over an amplified directory would collide replica id lanes).

Derives an N-times-larger dataset from an existing sf directory by writing
`factor` replicas with TPC-H-style growth semantics, so per-query
sfN/sf ratios measure the ENGINE's scaling, not an artifact of the data:

- fixed dims (region, nation) stay fixed — exactly as TPC-H scales;
- every key column shifts by `replica * 10_000_000` with JOIN STRUCTURE
  preserved (an order's lineitems shift together, so customer->orders->
  lineitem joins have the same per-key fan-out at any factor);
- group-by columns (lang, source, event_type, returnflag, dates...) are
  untouched — group cardinality does not grow with corpus size;
- document TEXT is rotated through a per-replica Caesar alphabet
  (identity for replica 0): length-preserving and deterministic, replicas
  are neither exact nor near duplicates of each other (a naive copy would
  make every doc a 10-way duplicate and quadratically inflate every
  pair-emitting dedup output), while WITHIN-replica near-dup structure is
  preserved exactly;
- embeddings get a small per-replica constant offset (0 for replica 0),
  cast back to float: replicas cluster near their original (realistic for
  grown corpora) without being bit-equal.

Pure SQL over deterministic input — no RNG, so reruns are byte-stable.
Writes ONE parquet file per table (what tools/compare.py and the Spark
readers both expect). Driver-side tooling (duckdb), not library code.
"""
import os
import sys

import duckdb

SPAN = 10_000_000  # > any source key; shifted ids stay far below 2^63

SHIFTS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_AS_IS = ["region", "nation"]

LOWER = "abcdefghijklmnopqrstuvwxyz"


def rot(s: str, k: int) -> str:
    return s[k:] + s[:k]


def gen(src: str, dst: str, factor: int, tables=None) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in COPY_AS_IS:
        if tables and t not in tables:
            continue
        con.execute(f"COPY (SELECT * FROM '{src}/{t}.parquet') TO '{dst}/{t}.parquet' (FORMAT parquet)")
        print(f"{t}: copied")
    for t, keys in SHIFTS.items():
        if tables and t not in tables:
            continue
        # guard against re-amplifying an already-amplified directory:
        # shifted keys reuse the same SPAN lanes, so source keys at or
        # above SPAN would silently collide replica ids and corrupt the
        # join-structure/dedup invariants the scale measurements rest on
        for k in keys:
            mx = con.execute(
                f"SELECT max({k}) FROM '{src}/{t}.parquet'").fetchone()[0]
            if mx is not None and mx >= SPAN:
                sys.exit(f"ERROR: {t}.{k} max={mx} >= SPAN={SPAN} — source "
                         "directory looks already amplified; refusing to "
                         "collide replica id lanes")
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'").fetchall()]
        legs = []
        for i in range(factor):
            sel = []
            for c in cols:
                if c in keys:
                    sel.append(f"{c} + {i * SPAN} AS {c}")
                elif t == "documents" and c == "text":
                    if i == 0:
                        sel.append("text")
                    else:
                        # rotate i%25+1 in [1,25]: never the identity, and
                        # distinct per replica for factor <= 25
                        k = i % 25 + 1
                        sel.append(
                            f"translate(text, '{LOWER}{LOWER.upper()}', "
                            f"'{rot(LOWER, k)}{rot(LOWER.upper(), k)}') AS text")
                elif t == "embeddings" and c == "embedding":
                    off = i * 0.0005
                    sel.append(
                        f"list_transform(embedding, x -> CAST(x + {off} AS FLOAT)) AS embedding")
                else:
                    sel.append(c)
            legs.append(f"SELECT {', '.join(sel)} FROM '{src}/{t}.parquet'")
        con.execute(
            f"COPY ({' UNION ALL '.join(legs)}) TO '{dst}/{t}.parquet' (FORMAT parquet)")
        n = con.execute(f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows ({factor}x)")


if __name__ == "__main__":
    # optional 4th arg: comma-separated table subset (e.g. the relational
    # tables + events for a documents-free sf10 decade)
    subset = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
    gen(sys.argv[1], sys.argv[2],
        int(sys.argv[3]) if len(sys.argv) > 3 else 10, subset)
