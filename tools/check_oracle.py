#!/usr/bin/env python3
"""Local replay of the driver's correctness gate: read Verify's parquet
dumps, run each oracle SQL in DuckDB against the same sf dir, compare
row counts, schemas (sorted column names) and value hashes.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import hashlib

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm_hash(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize values to strings; sort rows for order independence
    sdf = df.astype(str)
    rows = sorted(map(tuple, sdf.values.tolist()))
    h = hashlib.sha256()
    for r in rows:
        h.update(("\x1f".join(r) + "\x1e").encode())
    return h.hexdigest()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    con.execute("SET threads=8")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(os.path.join(d, "*.parquet"))
        got = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
        if name not in oracle:
            results[name] = {"status": "rows_only", "rows": len(got)}
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            results[name] = {"status": "ORACLE_ERROR", "err": str(e)[:300]}
            continue
        schema_ok = sorted(got.columns) == sorted(exp.columns)
        rows_ok = len(got) == len(exp)
        hash_ok = schema_ok and rows_ok and norm_hash(got) == norm_hash(exp)
        status = "OK" if hash_ok else "MISMATCH"
        results[name] = {"status": status, "rows": len(got), "oracle_rows": len(exp),
                         "schema_ok": schema_ok}
        if status == "MISMATCH" and schema_ok and rows_ok:
            # find first differing cell for debugging
            g = got.reindex(sorted(got.columns), axis=1).astype(str)
            e = exp.reindex(sorted(exp.columns), axis=1).astype(str)
            gr = sorted(map(tuple, g.values.tolist()))
            er = sorted(map(tuple, e.values.tolist()))
            for i, (a, b) in enumerate(zip(gr, er)):
                if a != b:
                    results[name]["first_diff"] = {"row": i, "got": a, "exp": b}
                    break
    bad = {k: v for k, v in results.items() if v["status"] not in ("OK", "rows_only")}
    for k in sorted(results):
        v = results[k]
        print(f"{v['status']:>12}  {k}  rows={v.get('rows')}"
              + (f" oracle_rows={v.get('oracle_rows')}" if 'oracle_rows' in v else "")
              + (f" err={v.get('err')}" if 'err' in v else ""))
        if "first_diff" in v:
            print(f"              first_diff: got={v['first_diff']['got']}")
            print(f"                          exp={v['first_diff']['exp']}")
    print(f"\n{len([v for v in results.values() if v['status']=='OK'])} OK, "
          f"{len([v for v in results.values() if v['status']=='rows_only'])} rows_only, "
          f"{len(bad)} failing")
    sys.exit(1 if bad else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
