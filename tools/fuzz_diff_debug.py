#!/usr/bin/env python3
"""Per-id differ for a failing FuzzDiff case: prints spark vs duck rows
keyed by the `id` column, plus the corpus string for context.

Usage: python3 tools/fuzz_diff_debug.py <sfDir> <outDir> <caseName> [maxRows]
"""
import json, sys, glob, os
import duckdb

def main(sf_dir, out_dir, case, max_rows=10):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders", "lineitem"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    tdir = os.path.join(out_dir, "_tables")
    for tn in sorted(os.listdir(tdir)):
        if tn.endswith(".parquet"):
            con.execute(f"CREATE VIEW {tn[:-8]} AS SELECT * FROM read_parquet('{tdir}/{tn}/*.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    files = glob.glob(f"{out_dir}/{case}/*.parquet")
    got = con.execute(f"SELECT * FROM read_parquet({files!r})").df()
    want = con.execute(oracle[case]).df()
    cols = sorted(got.columns)
    got = got[cols]
    want = want[sorted(want.columns)]
    if "id" not in cols and "id_a" not in cols:
        print("no id column; dumping both heads")
        print(got.head(20)); print(want.head(20)); return
    key = ["id"] if "id" in cols else ["id_a", "id_b"]
    g = {tuple(r[k] for k in key): tuple(r) for _, r in got.iterrows()}
    w = {tuple(r[k] for k in key): tuple(r) for _, r in want.iterrows()}
    corpus = {r[0]: r[1] for r in con.execute("SELECT id, s FROM fuzz_docs").fetchall()}
    shown = 0
    for k in sorted(set(g) | set(w), key=str):
        a, b = g.get(k), w.get(k)
        same = False
        if a is not None and b is not None:
            same = all(str(x) == str(y) for x, y in zip(a, b))
        if not same:
            print(f"id={k} s={corpus.get(k[0] if len(k)==1 else k[0])!r}")
            print(f"  spark: {a}")
            print(f"  duck : {b}")
            shown += 1
            if shown >= max_rows:
                break
    print(f"cols={cols}; {shown}+ mismatched keys shown")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3], int(sys.argv[4]) if len(sys.argv) > 4 else 10)
