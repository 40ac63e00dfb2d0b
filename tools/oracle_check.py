#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>
Reads each <verifyOutDir>/<name> parquet result (written by graft.Verify),
runs the matching SQL from oracle_sql.json in DuckDB over the sfDir tables,
sorts columns by name and rows by value, and compares cell-by-cell.
"""
import json, sys, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return [cols[i] for i in order], out

def norm(v):
    if isinstance(v, float):
        # + 0.0 canonicalizes -0.0 to 0.0: the two are numerically equal
        # but str-sort differently, misaligning the row compare (seen on
        # exact-cancellation dot products whose summation order differs).
        # The 13-significant-digit cap absorbs summation-order noise at
        # magnitudes where round(…, 9) is the identity: round 4 saw a
        # 1e+150 fuzz dot product differing in the 17th digit, round 5
        # (seed 999) one differing in the 15th (~5 ULPs — engines may
        # accumulate sequentially vs pairwise/FMA). A real semantic
        # divergence shows up orders of magnitude above 13 digits.
        v = round(v, 9) + 0.0
        return float(f"{v:.12e}")
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written dataset dir (e.g. ScaleUp's sf1)
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
        else:
            continue
        if t == "events":
            # ScaleUp's sf1 writes ts as BIGINT epoch-nanos (Spark reads the
            # driver's TIMESTAMP(NANOS) as long and has no nanos writer);
            # normalize to TIMESTAMP so one oracle SQL serves both layouts.
            # DuckDB 1.0 can't build TIMESTAMP_NS from BIGINT, so this
            # truncates to micros — a divergence vs Spark's nanos math would
            # surface as a FAIL, never a false pass. Driver layout untouched.
            row = con.execute("SELECT typeof(ts) FROM events LIMIT 1").fetchone()
            if row and row[0] == "BIGINT":
                con.execute(
                    "CREATE OR REPLACE VIEW events AS SELECT * REPLACE "
                    f"(make_timestamp(ts // 1000) AS ts) FROM read_parquet('{p}/*.parquet')")
    # extra input tables written by the producer (e.g. FuzzDiff's edge
    # corpus): <out_dir>/_tables/<name>.parquet/ becomes view <name> —
    # both engines then read byte-identical parquet inputs
    tdir = os.path.join(out_dir, "_tables")
    if os.path.isdir(tdir):
        for tn in sorted(os.listdir(tdir)):
            if tn.endswith(".parquet"):
                con.execute(
                    f"CREATE VIEW {tn[:-8]} AS SELECT * FROM read_parquet('{tdir}/{tn}/*.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # big-scale runs (sf10: 500k docs) can push DuckDB's hash joins past
    # host RAM — cap the budget so it spills to disk instead of OOMing
    # the box. Derived from physical RAM (min(80GB, 70%)) rather than a
    # hardcoded 80GB, which would RAISE the budget above DuckDB's own
    # 80%-of-RAM default on hosts with <100GB; GRAFT_DUCKDB_MEMLIMIT
    # overrides for odd hosts.
    memlimit = os.environ.get("GRAFT_DUCKDB_MEMLIMIT")
    if not memlimit:
        try:
            phys = os.sysconf("SC_PHYS_PAGES") * os.sysconf("SC_PAGE_SIZE")
            memlimit = f"{min(80, max(1, int(phys * 0.7 / 2**30)))}GB"
        except (ValueError, OSError):
            memlimit = "8GB"
    con.execute(f"SET memory_limit='{memlimit}'")
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    n_pass = n_fail = n_rowsonly = 0
    for name in sorted(os.listdir(out_dir)):
        if name.startswith("_"):
            continue
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            print(f"FAIL  {name}: no parquet output"); n_fail += 1; continue
        got = con.execute(f"SELECT * FROM read_parquet({files!r})").fetchall()
        got_cols = [c[0] for c in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet({files!r})").fetchall()]
        if name not in oracle:
            status = "ROWS-ONLY" if len(got) > 0 else "ROWS-ONLY-EMPTY!"
            print(f"{status}  {name}: {len(got)} rows"); n_rowsonly += 1
            continue
        try:
            res = con.execute(oracle[name])
            want_cols = [c[0] for c in res.description]
            want = res.fetchall()
            # Driver-hash parity heuristic: surface physical-type differences
            # (e.g. DuckDB HUGEINT vs Spark BIGINT sums) that value compare
            # can't see. Warning only — value compare still decides pass/fail.
            got_types = dict(
                (c[0], c[1]) for c in con.execute(
                    f"DESCRIBE SELECT * FROM read_parquet({files!r})").fetchall())
            want_types = dict(
                (c[0], c[1]) for c in con.execute(
                    f"DESCRIBE {oracle[name]}").fetchall())
            int_family = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT"}
            for c in sorted(set(got_types) & set(want_types)):
                gt, wt = got_types[c], want_types[c]
                # int-width differences hash green in the driver (r01 evidence);
                # HUGEINT / DECIMAL / float-vs-int do not
                if gt != wt and not (gt in int_family and wt in int_family):
                    print(f"TYPE? {name}.{c}: spark {gt} vs oracle {wt}")
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}"); n_fail += 1; continue
        gc, g = canon(got, got_cols)
        wc, w = canon(want, want_cols)
        if gc != wc:
            print(f"FAIL  {name}: columns {gc} vs oracle {wc}"); n_fail += 1; continue
        if len(g) != len(w):
            print(f"FAIL  {name}: {len(g)} rows vs oracle {len(w)}"); n_fail += 1; continue
        bad = [(a, b) for a, b in zip(g, w) if a != b]
        if bad:
            print(f"FAIL  {name}: {len(bad)}/{len(g)} rows differ; first: {bad[0][0]} vs {bad[0][1]}")
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(g)} rows"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
