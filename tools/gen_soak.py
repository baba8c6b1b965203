#!/usr/bin/env python3
"""Build an sf0.3-ish soak slice by stacking 3 key-shifted copies of
sf0.1 (round-3 verdict #9: catch O(n^2) surprises the 2x bench gate
can't see). Dimension tables (region/nation) keep their natural size;
fact/corpus tables triple with disjoint keys. Deterministic — no RNG.

Usage: tools/gen_soak.py [src_sf_dir] [dst_dir] [--skew]

--skew (round-7 verdict task 6): same 3x volume but ADVERSARIALLY
distributed — the uniform-copy soak cannot see skewed-key scale
killers (a plan that sorts a whole source/gram partition on one task
is linear on uniform copies and explodes on skew). Applied on top of
the key shift:
  - documents.source: one mega-source holds 80% of rows;
  - documents.text: a fixed hot 5-gram is injected into 50% of docs
    (df ~ half the corpus — the license-boilerplate shape);
  - customer.c_nationkey: 80% of customers point at one nation
    (hot-predicate/join-key skew for the SPARQL family).
A skew-safe gate still lands ~3x vs uniform sf0.1; a skew-broken one
funnels ~2.4x of the whole corpus through one task and blows past the
4x bar.
"""
import os
import sys

import duckdb

args = [a for a in sys.argv[1:] if a != "--skew"]
SKEW = "--skew" in sys.argv[1:]
SRC = args[0] if len(args) > 0 else "/root/testdata/sf0.1"
DST = args[1] if len(args) > 1 else (
    "/root/repo/soakdata/sf0.3skew" if SKEW else "/root/repo/soakdata/sf0.3")
COPIES = 3

HOT_GRAM = " hotgA hotgB hotgC hotgD hotgE"  # one 5-token shingle

# per-table key columns to shift by copy_index * stride. Columns in the
# same KEY FAMILY (an FK and the PK it references) MUST share one stride
# or the shifted copies get dangling/colliding FKs — so strides are
# computed once per family from the DIMENSION (referenced) table's max,
# not per-table (orders.o_custkey max need not share a power of ten
# with customer.c_custkey max).
SHIFTS = {
    "customer": {"c_custkey": "custkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {"l_orderkey": "orderkey"},
    "part": {"p_partkey": "partkey"},
    "events": {"event_id": "eventid", "user_id": "userid"},
    "documents": {"doc_id": "docid"},
    "embeddings": {"vec_id": "vecid"},
}
# key family -> (owning table, PK column) the stride derives from
FAMILIES = {
    "custkey": ("customer", "c_custkey"),
    "suppkey": ("supplier", "s_suppkey"),
    "orderkey": ("orders", "o_orderkey"),
    "partkey": ("part", "p_partkey"),
    "eventid": ("events", "event_id"),
    "userid": ("events", "user_id"),
    "docid": ("documents", "doc_id"),
    "vecid": ("embeddings", "vec_id"),
}
KEEP = ["region", "nation"]  # fixed-size dimensions


def stride(con, table, col):
    mx = con.sql(f"SELECT max({col}) FROM '{SRC}/{table}.parquet'").fetchone()[0]
    if mx is None:  # empty table: any stride keeps copies disjoint
        return 10
    s = 10
    while s <= mx:
        s *= 10
    return s


def main():
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    fam_stride = {f: stride(con, t, c) for f, (t, c) in FAMILIES.items()}
    for t in KEEP:
        con.sql(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{DST}/{t}.parquet'")
        print(f"{t}: copied")
    for t, keys in SHIFTS.items():
        strides = {k: fam_stride[f] for k, f in keys.items()}
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
        if SKEW and t == "documents":
            q = f"""SELECT doc_id,
                      CASE WHEN doc_id % 2 = 0 THEN text || '{HOT_GRAM}'
                           ELSE text END AS text,
                      lang,
                      CASE WHEN doc_id % 10 < 8 THEN 'megasource'
                           ELSE source END AS source,
                      n_chars
                    FROM ({q})"""
        if SKEW and t == "events":
            # round-8: one bot user holds 50% of events — the hot-key
            # shape the per-user window rewrite (EventWindows) must
            # survive; a per-user window would funnel half the stream
            # through one task
            q = f"""SELECT * REPLACE (
                      CASE WHEN event_id % 2 = 0 THEN 0
                           ELSE user_id END AS user_id)
                    FROM ({q})"""
        if SKEW and t == "customer":
            q = f"""SELECT * REPLACE (
                      CASE WHEN c_custkey % 10 < 8 THEN 0
                           ELSE c_nationkey END AS c_nationkey)
                    FROM ({q})"""
        con.sql(f"COPY ({q}) TO '{DST}/{t}.parquet'")
        n = con.sql(f"SELECT count(*) FROM '{DST}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
