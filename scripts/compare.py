#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: compare.py <sfDir> <verifyOutDir>
Reads each <out>/<name> parquet dir written by graft.Verify, runs the
matching oracle SQL from <out>/oracle_sql.json in DuckDB over the same
sfDir parquet tables, and diffs: row count, sorted column names, and a
hash of the value matrix (columns sorted by name, rows sorted).

Normalization mirrors the driver's pandas/arrow fetch path:
 - results are pulled via .df() (pandas), so DuckDB HUGEINT widens to
   float64 and renders '3.0' while Spark BIGINT renders '3' — a real
   mismatch the driver would flag (r01 q17/q23 regression class);
 - floats use full precision repr, not %.6g.
"""
import sys, os, json, glob, hashlib
import math
import duckdb
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, (float, np.floating)):
        if math.isnan(v):
            return "NaN"
        return repr(float(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, np.ndarray)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    # pandas NaT / NA objects
    if v != v:
        return "NaN"
    return str(v)

def table_fingerprint(con, rel_sql):
    df = con.sql(rel_sql).df()
    cols = sorted(df.columns)
    df = df[cols]
    # mirror pandas nullable handling: NaN/None/NaT all normalize
    rows = df.itertuples(index=False, name=None)
    srows = sorted("|".join(norm_cell(c) for c in r) for r in rows)
    h = hashlib.sha1("\n".join(srows).encode()).hexdigest()[:16]
    return len(srows), cols, h, srows[:3]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(os.path.basename(d) for d in glob.glob(f"{out_dir}/*")
                   if os.path.isdir(d))
    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        spark_sql = f"SELECT * FROM '{out_dir}/{name}/*.parquet'"
        try:
            sn, sc, sh, sr = table_fingerprint(con, spark_sql)
        except Exception as e:
            print(f"FAIL {name}: cannot read spark result: {e}")
            n_fail += 1
            continue
        if name not in oracle:
            status = "ROWS-ONLY" if sn > 0 else "ROWS-ONLY-EMPTY!"
            print(f"{status} {name}: rows={sn}")
            n_rowsonly += 1
            continue
        try:
            on_, oc, oh, orows = table_fingerprint(con, oracle[name])
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if sc != oc:
            print(f"FAIL {name}: cols spark={sc} oracle={oc}")
            n_fail += 1
        elif sn != on_:
            print(f"FAIL {name}: rows spark={sn} oracle={on_}")
            n_fail += 1
        elif sh != oh:
            print(f"FAIL {name}: hash mismatch ({sn} rows)")
            for a, b in zip(sr, orows):
                if a != b:
                    print(f"   spark:  {a[:200]}\n   oracle: {b[:200]}")
                    break
            n_fail += 1
        else:
            print(f"PASS {name}: rows={sn}")
            n_pass += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
