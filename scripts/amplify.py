#!/usr/bin/env python3
"""Build an sf1.0-scale verification fixture by key-shifted replication.

The driver ships sf{0.001,0.01,0.1}; the one-time sf1.0 hash run
(round-16 verdict ask #6) needs ~10x sf0.1. Replicating sf0.1 K times
with CONSISTENT key-space shifts preserves every foreign-key
relationship (each copy is a disjoint, internally-consistent shard),
and the DuckDB oracle runs over the same amplified parquet, so the
hash comparison is exactly as strong as at the driver scales — the
data need not be the official generator's, the oracle replays
whatever the input is.

Shift scheme per copy k (k=0 is the original):
  orders/lineitem : o_orderkey/l_orderkey += k * ORD
  customer        : c_custkey += k * CUST; o_custkey likewise
  part/partsupp-ish keys: p_partkey/l_partkey += k * PART
  supplier        : s_suppkey/l_suppkey += k * SUPP
  events          : event_id += k * EV; user_id += k * USR
  documents       : doc_id += k * DOC
  embeddings      : vec_id += k * VEC
  region/nation   : copied once (dimension tables; every copy's
                    nation/region keys keep pointing at them)
Shift bases are the table's (max key + 1) so copies never collide.

Usage: amplify.py <srcSfDir> <dstDir> [K=10]
"""
import sys
import duckdb

SHIFTS = {
    "orders":    [("o_orderkey", "ORD"), ("o_custkey", "CUST")],
    "lineitem":  [("l_orderkey", "ORD"), ("l_partkey", "PART"),
                  ("l_suppkey", "SUPP")],
    "customer":  [("c_custkey", "CUST")],
    "part":      [("p_partkey", "PART")],
    "supplier":  [("s_suppkey", "SUPP")],
    "events":    [("event_id", "EV"), ("user_id", "USR")],
    "documents": [("doc_id", "DOC")],
    "embeddings": [("vec_id", "VEC")],
    "region":    [],
    "nation":    [],
}

BASES = {
    "ORD":  ("orders", "o_orderkey"),
    "CUST": ("customer", "c_custkey"),
    "PART": ("part", "p_partkey"),
    "SUPP": ("supplier", "s_suppkey"),
    "EV":   ("events", "event_id"),
    "USR":  ("events", "user_id"),
    "DOC":  ("documents", "doc_id"),
    "VEC":  ("embeddings", "vec_id"),
}


def main():
    src, dst = sys.argv[1], sys.argv[2]
    k_copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    import os
    os.makedirs(dst, exist_ok=True)
    # Every table present in the source dir must be covered by SHIFTS:
    # a table silently omitted here would make downstream verification
    # silently narrower (the gate would "pass" having never seen the
    # missing table at scale) instead of failing loudly (ADVICE r16).
    present = sorted(f[:-len(".parquet")] for f in os.listdir(src)
                     if f.endswith(".parquet"))
    uncovered = [t for t in present if t not in SHIFTS]
    if uncovered:
        sys.exit(f"amplify: tables in {src} not covered by SHIFTS: "
                 f"{uncovered} — add shift entries (or [] for a "
                 "dimension table copied once) before amplifying")
    con = duckdb.connect()
    bases = {}
    for name, (table, keycol) in BASES.items():
        v = con.execute(
            f"SELECT max({keycol}) + 1 FROM '{src}/{table}.parquet'"
        ).fetchone()[0]
        if v is None:
            sys.exit(f"amplify: {table}.{keycol} is empty — cannot "
                     "derive a shift base")
        bases[name] = v
    print("shift bases:", bases)
    for table, shifts in SHIFTS.items():
        if not shifts:  # dimension table: copy once
            con.execute(
                f"COPY (SELECT * FROM '{src}/{table}.parquet') TO "
                f"'{dst}/{table}.parquet' (FORMAT PARQUET)")
            continue
        # (column, type) once; shifted keys are CAST back to their
        # exact parquet type so every copy's schema matches copy 0
        types = {r[0]: r[1] for r in con.execute(
            f"DESCRIBE SELECT * FROM '{src}/{table}.parquet'").fetchall()}
        shifted = dict(shifts)
        union = []
        for k in range(k_copies):
            exprs = [
                f"CAST({c} + {k} * {bases[shifted[c]]} AS {t}) AS {c}"
                if c in shifted and k > 0 else c
                for c, t in types.items()]
            union.append(
                f"SELECT {', '.join(exprs)} FROM '{src}/{table}.parquet'")
        con.execute(f"COPY ({' UNION ALL '.join(union)}) TO "
                    f"'{dst}/{table}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM '{dst}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows ({k_copies} copies)")


if __name__ == "__main__":
    main()
