#!/usr/bin/env python3
"""Local replica of the driver's correctness compare: run graft.Verify
output against DuckDB oracles over the same parquet tables.

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import hashlib

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def frame_hash(df: pd.DataFrame) -> str:
    # stringify everything; round floats to kill engine fp-order noise
    def cell(v):
        if isinstance(v, float):
            return f"{v:.6g}"
        if isinstance(v, (list, tuple)) or str(type(v)).endswith("ndarray'>"):
            return "[" + ",".join(cell(x) for x in v) + "]"
        return str(v)
    h = hashlib.sha256()
    for row in df.itertuples(index=False):
        h.update(("|".join(cell(v) for v in row) + "\n").encode())
    return h.hexdigest()

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
            exp = con.sql(sql).df()
            g, e = canon(got), canon(exp)
            schema_ok = list(g.columns) == list(e.columns)
            rows_ok = len(g) == len(e)
            hash_ok = schema_ok and rows_ok and frame_hash(g) == frame_hash(e)
            if hash_ok:
                print(f"PASS {name} rows={len(g)}")
                n_pass += 1
            else:
                n_fail += 1
                print(f"FAIL {name} schema_ok={schema_ok} rows {len(g)} vs {len(e)}")
                if schema_ok:
                    print("  got cols:", list(g.columns))
                    merged = g.merge(e, how="outer", indicator=True)
                    diff = merged[merged["_merge"] != "both"]
                    print(diff.head(8).to_string())
                else:
                    print("  got:", list(g.columns), " exp:", list(e.columns))
        except Exception as ex:
            n_fail += 1
            print(f"ERROR {name}: {ex}")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
