#!/usr/bin/env python3
"""Dev-only harness mirror: compare Verify.scala's parquet dumps against
DuckDB running SparkEntry.oracleSql on the same tables, the way the driver
does (sort columns by name, compare values). Not part of the engine.

Usage: python3 tools/check_oracle.py [sfDir] [verifyOutDir]
"""
import sys, json, os, glob, math
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out, "oracle_sql.json")))
    dirs = set(d for d in os.listdir(out) if os.path.isdir(os.path.join(out, d)))
    declared = sorted(dirs | set(oracle))
    n_ok = n_bad = 0
    for name in declared:
        files = sorted(glob.glob(os.path.join(out, name, "*.parquet")))
        if not files:
            print(f"FAIL {name}: no spark output parquet"); n_bad += 1; continue
        sdf = pq.read_table(files).to_pandas()
        if name not in oracle:
            print(f"SKIP {name}: no oracle (rows={len(sdf)})")
            continue
        try:
            ddf = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_bad += 1; continue
        ok, msg = compare(sdf, ddf)
        if ok:
            note = f" [{msg}]" if msg else ""
            print(f"OK   {name}: rows={len(sdf)}{note}"); n_ok += 1
        else:
            print(f"FAIL {name}: {msg}"); n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} fail, {len(declared)} declared")
    sys.exit(1 if n_bad else 0)

def compare(sdf, ddf):
    scols, dcols = sorted(sdf.columns), sorted(ddf.columns)
    if scols != dcols:
        return False, f"columns differ: spark={scols} duck={dcols}"
    if len(sdf) != len(ddf):
        return False, f"row count: spark={len(sdf)} duck={len(ddf)}"
    sdf, ddf = sdf[scols], ddf[scols]
    for c in scols:
        sv, dv = list(sdf[c]), list(ddf[c])
        for i, (a, b) in enumerate(zip(sv, dv)):
            if not cell_eq(a, b):
                return False, (f"col {c} row {i}: spark={a!r} ({type(a).__name__}) "
                               f"duck={b!r} ({type(b).__name__})")
    # values equal; surface dtype drift (the driver may compare stricter)
    notes = [f"{c}: {sdf[c].dtype} vs {ddf[c].dtype}"
             for c in scols if str(sdf[c].dtype) != str(ddf[c].dtype)]
    if notes:
        return True, "dtype drift: " + "; ".join(notes)
    return True, ""

def cell_eq(a, b):
    an, bn = is_nan_or_none(a), is_nan_or_none(b)
    if an or bn:
        return an and bn
    return a == b

def is_nan_or_none(x):
    if x is None:
        return True
    try:
        return isinstance(x, float) and math.isnan(x)
    except Exception:
        return False

if __name__ == "__main__":
    main()
