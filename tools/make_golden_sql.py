#!/usr/bin/env python3
"""Regenerate the scale-keyed golden VALUES oracles from a Verify dump.

Usage:
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
  python3 tools/make_golden_sql.py /tmp/verify_out sf0.01

Writes src/main/resources/golden/<scale>/<query>.sql — one DuckDB-runnable
VALUES statement per golden query, loaded at runtime by
graft.GoldenOracles (resource files sidestep Scala's 64 KB string-constant
limit, which the sf0.1 winnowing pair set exceeds).

The four queries below have JVM-hash-specific outputs (xxhash64 /
splitmix64 / rolling-poly / seeded binary payloads) that no other engine
reproduces from the raw tables; their algorithms are oracle-verified via
the portable md5 twins (q58/q59/q60) and MultimodalSpec golden decodes.
Pinning the exact per-scale outputs as VALUES SQL gives the driver gate a
strict row/schema/hash check for them too.
"""
import os
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
    "q120_trigram_xent_hashed": [("doc_id", "BIGINT"),
                                 ("n_trigrams", "BIGINT"),
                                 ("xent", "DOUBLE")],
    "q125_5gram_xent_hashed": [("doc_id", "BIGINT"),
                               ("n_5grams", "BIGINT"),
                               ("xent", "DOUBLE")],
    "q127_byte_bpe_merges": [("rank", "INTEGER"), ("left", "VARCHAR"),
                             ("right", "VARCHAR")],
    "q128_byte_bpe_tokens": [("doc_id", "BIGINT"), ("n_tokens", "INTEGER"),
                             ("id1", "BIGINT"), ("id2", "BIGINT"),
                             ("id3", "BIGINT")],
    "q136_sp_unigram_tokens": [("doc_id", "BIGINT"), ("n_pieces", "INTEGER"),
                               ("p1", "VARCHAR"), ("p2", "VARCHAR"),
                               ("p3", "VARCHAR")],
}


def lit(v, t):
    if v is None:
        return f"CAST(NULL AS {t})"
    if t == "VARCHAR":
        return "'" + str(v).replace("'", "''") + "'"
    if t == "DOUBLE":
        return f"CAST({v!r} AS DOUBLE)"
    return f"CAST({v} AS {t})"


def main(out_dir, scale, only=None):
    dest = os.path.join("src/main/resources/golden", scale)
    os.makedirs(dest, exist_ok=True)
    specs = SPECS if only is None else {q: SPECS[q] for q in only}
    for q, cols in specs.items():
        con = duckdb.connect()
        files = glob.glob(f"{out_dir}/{q}/*.parquet")
        if not files:
            sys.exit(f"no parquet for {q} under {out_dir}")
        order = ", ".join(f'"{c}"' for c, _ in cols)
        rows = con.execute(
            f"SELECT * FROM read_parquet({files!r}) ORDER BY {order}").fetchall()
        vals = ",\n".join(
            "(" + ", ".join(lit(v, t) for v, (c, t) in zip(r, cols)) + ")"
            for r in rows)
        names = ", ".join(f'"{c}"' for c, _ in cols)
        sql = f"SELECT * FROM (VALUES\n{vals}\n) AS t({names})\n"
        path = os.path.join(dest, f"{q}.sql")
        with open(path, "w") as f:
            f.write(sql)
        print(f"{path}: {len(rows)} rows")


if __name__ == "__main__":
    # optional 3rd+ args: regenerate only the named queries (partial
    # regen after adding a NEW golden query; full regen otherwise)
    if len(sys.argv) >= 4:
        main(sys.argv[1], sys.argv[2], only=sys.argv[3:])
        sys.exit(0)
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    main(sys.argv[1], sys.argv[2])
