#!/usr/bin/env python3
"""Build an sf0.3-ish soak slice by stacking 3 key-shifted copies of
sf0.1 (round-3 verdict #9: catch O(n^2) surprises the 2x bench gate
can't see). Dimension tables (region/nation) keep their natural size;
fact/corpus tables triple with disjoint keys. Deterministic — no RNG.

Usage: tools/gen_soak.py [src_sf_dir] [dst_dir]
"""
import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/soakdata/sf0.3"
COPIES = 3

# per-table key columns to shift by copy_index * stride (stride = a
# round power of ten above the max key, so copies never collide)
SHIFTS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
KEEP = ["region", "nation"]  # fixed-size dimensions


def stride(con, table, col):
    mx = con.sql(f"SELECT max({col}) FROM '{SRC}/{table}.parquet'").fetchone()[0]
    s = 10
    while s <= mx:
        s *= 10
    return s


def main():
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    for t in KEEP:
        con.sql(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{DST}/{t}.parquet'")
        print(f"{t}: copied")
    for t, keys in SHIFTS.items():
        strides = {k: stride(con, t, k) for k in keys}
        cols = [r[0] for r in con.sql(
            f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'").fetchall()]
        selects = []
        for i in range(COPIES):
            exprs = []
            for c in cols:
                if c in strides and i > 0:
                    exprs.append(f"{c} + {i * strides[c]} AS {c}")
                elif c == "text" and i > 0:
                    # keep copies out of EXACT-dup range but inside the
                    # shingle structure (near-dup costs still triple)
                    exprs.append(f"text || ' copymark{i}' AS text")
                else:
                    exprs.append(c)
            selects.append(
                f"SELECT {', '.join(exprs)} FROM '{SRC}/{t}.parquet'")
        q = " UNION ALL ".join(selects)
        con.sql(f"COPY ({q}) TO '{DST}/{t}.parquet'")
        n = con.sql(f"SELECT count(*) FROM '{DST}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
