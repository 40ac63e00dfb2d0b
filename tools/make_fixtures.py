#!/usr/bin/env python3
"""Generate schema-matched synthetic fixtures for the two reference datasets
whose CSVs are missing from this container (`compas.csv`,
`bar_pass_prediction.csv` ship as .MISSING_LARGE_BLOBS placeholders in the
reference checkout). The fixtures reproduce the SCHEMA CONTRACT the loaders
in graft.data.Datasets (and reference getdataset.py:126-163,325-378)
depend on — column names, index column, string/numeric domains, label
domains, and non-empty (sensitive x label) cells for DEMV — not the real
data distributions. Deterministic: seeded stdlib `random`, no deps.

Usage: python3 tools/make_fixtures.py  (writes data/*.csv)
"""
import os
import random

OUT = os.path.join(os.path.dirname(__file__), "..", "data")


def make_compas(path, n=1200, seed=29):
    rng = random.Random(seed)
    cols = ["sex", "age", "race", "juv_fel_count", "juv_misd_count",
            "juv_other_count", "priors_count", "c_charge_degree",
            "two_year_recid"]
    rows = []
    for i in range(n):
        sex = rng.randint(0, 1)
        race = rng.randint(0, 1)
        # both sides of the age-50 binarization threshold populated per cell
        age = rng.randint(18, 49) if rng.random() < 0.75 else rng.randint(50, 75)
        juv_f = min(rng.randrange(0, 5), rng.randrange(0, 5))
        juv_m = min(rng.randrange(0, 6), rng.randrange(0, 6))
        juv_o = min(rng.randrange(0, 4), rng.randrange(0, 4))
        priors = rng.randrange(0, 20)
        degree = rng.randint(0, 1)
        # label correlated with priors + charge degree so classifiers beat
        # chance; every (sex, race, label) cell non-empty at this n
        p = 0.15 + 0.035 * priors + 0.1 * degree + 0.05 * (1 - race)
        recid = 1 if rng.random() < min(p, 0.9) else 0
        rows.append([i, sex, age, race, juv_f, juv_m, juv_o, priors, degree, recid])
    with open(path, "w") as f:
        f.write("," + ",".join(cols) + "\n")
        for r in rows:
            f.write(",".join(str(x) for x in r) + "\n")


def make_law(path, n=1500, seed=103):
    rng = random.Random(seed)
    # dropped by the loader but present in the real file (constants ok)
    dropped = ["ID", "decile1b", "decile3", "decile1", "cluster", "bar1",
               "bar2", "sex", "male", "race1", "race2", "other", "asian",
               "black", "hisp", "bar", "index6040", "indxgrp", "indxgrp2",
               "dnn_bar_pass_prediction", "grad", "bar1_yr", "bar2_yr",
               "ugpa"]
    kept = ["gender", "race", "age", "Dropout", "gpa", "lsat", "zfygpa",
            "zgpa", "fulltime", "fam_inc", "tier", "pass_bar"]
    with open(path, "w") as f:
        f.write("," + ",".join(dropped + kept) + "\n")
        for i in range(n):
            gender = "female" if rng.random() < 0.45 else "male"
            # race 7.0 -> 0 in the loader; anything else -> 1
            race = 7.0 if rng.random() < 0.55 else float(rng.choice([1, 2, 3, 4, 5, 6, 8]))
            age = rng.randint(22, 60) if rng.random() < 0.85 else rng.randint(61, 75)
            dropout = "YES" if rng.random() < 0.12 else "NO"
            # continuous gpa so qcut(3) has clean tertile edges; correlate
            # with lsat so the label is learnable
            gpa = round(rng.uniform(1.5, 4.2), 3)
            lsat = round(20.0 + 5.0 * gpa + rng.uniform(-4, 4), 1)
            zfygpa = round((gpa - 2.85) / 0.6 + rng.uniform(-0.3, 0.3), 2)
            zgpa = round((gpa - 2.85) / 0.6 + rng.uniform(-0.2, 0.2), 2)
            fulltime = rng.choice([1, 2])
            fam_inc = rng.randint(1, 5)
            tier = rng.randint(1, 6)
            pass_bar = 1 if rng.random() < 0.85 else 0
            drop_vals = [i, 0, 0, 0, 1, "P", "P", 1, 1, 0, 0, 0, 0, 0, 0,
                         "P", 0.0, "g1", "g1", 0.0, "Y", 0, 0, round(gpa * 0.9, 2)]
            kept_vals = [gender, race, age, dropout, gpa, lsat, zfygpa,
                         zgpa, fulltime, fam_inc, tier, pass_bar]
            f.write(str(i) + "," +
                    ",".join(str(x) for x in drop_vals + kept_vals) + "\n")


if __name__ == "__main__":
    os.makedirs(OUT, exist_ok=True)
    make_compas(os.path.join(OUT, "compas.csv"))
    make_law(os.path.join(OUT, "bar_pass_prediction.csv"))
    print("wrote", os.path.join(OUT, "compas.csv"))
    print("wrote", os.path.join(OUT, "bar_pass_prediction.csv"))
