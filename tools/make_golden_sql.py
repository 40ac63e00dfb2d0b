#!/usr/bin/env python3
"""Regenerate src/main/scala/graft/GoldenOracles.scala from a Verify dump.

Usage:
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
  python3 tools/make_golden_sql.py /tmp/verify_out

The four queries below have JVM-hash-specific outputs (xxhash64 /
splitmix64 / rolling-poly / seeded binary payloads) that no other engine
reproduces from the raw tables; their algorithms are oracle-verified via
the portable md5 twins (q58/q59/q60) and MultimodalSpec golden decodes.
This script pins the exact sf0.01 outputs as DuckDB-runnable VALUES SQL
so the driver gate gets a strict row/schema/hash check for them too.
"""
import sys
import glob
import duckdb

SPECS = {
    "q23_minhash_neardup": [("id_a", "BIGINT"), ("id_b", "BIGINT"),
                            ("jaccard", "DOUBLE")],
    "q24_simhash_neardup": [("id_a", "BIGINT"), ("id_b", "BIGINT"),
                            ("hamming", "INTEGER")],
    "q32_media_features": [("kind", "VARCHAR"), ("codec", "VARCHAR"),
                           ("n", "BIGINT"), ("avg_brightness", "DOUBLE"),
                           ("total_bytes", "BIGINT"), ("max_width", "INTEGER"),
                           ("max_sample_rate", "INTEGER")],
    "q38_winnowing_pairs": [("id_a", "BIGINT"), ("id_b", "BIGINT"),
                            ("shared_fingerprints", "BIGINT")],
}

HEADER = '''package graft

/** Committed-golden VALUES oracles for the four queries whose outputs are
  * JVM-hash-specific (xxhash64 / splitmix64 / rolling-poly / seeded binary
  * payloads) and therefore have no engine-independent SQL reformulation.
  * The ALGORITHMS behind them are independently oracle-verified through the
  * portable md5 twins (q58/q59/q60) and the MultimodalSpec golden decodes;
  * these literals close the last `no_oracle` gap in the driver gate by
  * pinning the exact sf0.01 outputs, byte-for-byte, as DuckDB-runnable SQL.
  *
  * VALID ONLY AT sf0.01 — the scale the driver's correctness gate runs at.
  * Regenerate with tools/make_golden_sql.py after any intentional change
  * to the underlying hash kernels (the point is that they never change).
  */
object GoldenOracles {
  val sql: Map[String, String] = Map(
'''


def lit(v, t):
    if v is None:
        return f"CAST(NULL AS {t})"
    if t == "VARCHAR":
        return "'" + str(v).replace("'", "''") + "'"
    if t == "DOUBLE":
        return f"CAST({v!r} AS DOUBLE)"
    return f"CAST({v} AS {t})"


def main(out_dir):
    body = []
    for q, cols in SPECS.items():
        con = duckdb.connect()
        files = glob.glob(f"{out_dir}/{q}/*.parquet")
        if not files:
            sys.exit(f"no parquet for {q} under {out_dir}")
        order = ", ".join(c for c, _ in cols)
        rows = con.execute(
            f"SELECT * FROM read_parquet({files!r}) ORDER BY {order}").fetchall()
        vals = ",\n".join(
            "(" + ", ".join(lit(v, t) for v, (c, t) in zip(r, cols)) + ")"
            for r in rows)
        names = ", ".join(c for c, _ in cols)
        sql = f"SELECT * FROM (VALUES\n{vals}\n) AS t({names})"
        body.append(f'    "{q}" ->\n      """{sql}""",')
        print(f"{q}: {len(rows)} rows")
    entries = "\n".join(body).rstrip(",")
    src = HEADER + entries + "\n  )\n}\n"
    path = "src/main/scala/graft/GoldenOracles.scala"
    with open(path, "w") as f:
        f.write(src)
    print(f"wrote {path}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out")
