#!/usr/bin/env python3
"""Local imitation of the driver's correctness gate.

Usage: oracle_check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (Spark result), runs the matching
oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB over views of the
sfDir parquet tables, sorts columns by name + rows, and diffs values.
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Queries KNOWN to legitimately return zero rows at the checked SF may be
# allowlisted here by name; any OTHER vacuous (0-row) gate fails the run —
# a gate that cannot fail is not a gate (ADVICE r7 #1, VERDICT r6 wrong #1).
VACUOUS_ALLOWLIST = set()


def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    import glob
    import os
    names = sorted(os.path.basename(p) for p in glob.glob(f"{out_dir}/*")
                   if os.path.isdir(p))
    failures = 0
    vacuous = 0
    for name in names:
        spark_df = con.execute(
            f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
        if name not in oracle:
            print(f"  {name}: NO-ORACLE rows={len(spark_df)}")
            continue
        try:
            ora_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"✗ {name}: oracle SQL failed: {e}")
            failures += 1
            continue
        s, o = canon(spark_df), canon(ora_df)
        if list(s.columns) != list(o.columns):
            print(f"✗ {name}: columns {list(s.columns)} != {list(o.columns)}")
            failures += 1
            continue
        if len(s) != len(o):
            print(f"✗ {name}: rows {len(s)} != {len(o)}")
            failures += 1
            continue
        if not s.equals(o):
            neq = (s != o) & ~(s.isna() & o.isna())
            bad_cols = [c for c in s.columns if neq[c].any()]
            print(f"✗ {name}: value mismatch in {bad_cols}")
            for c in bad_cols[:3]:
                i = neq[c].idxmax()
                print(f"    row {i} col {c}: spark={s[c][i]!r} "
                      f"oracle={o[c][i]!r}")
            failures += 1
            continue
        # an empty-vs-empty hash match is trivially green: flag it loudly
        # AND count it toward the exit status (ADVICE r7 #1) — a 0-row
        # gate cannot fail, so unless explicitly allowlisted it fails the
        # run (VERDICT r6 wrong #1 — three gates sat vacuous for rounds)
        vac = ""
        if len(s) == 0 and name not in VACUOUS_ALLOWLIST:
            vacuous += 1
            vac = "  [VACUOUS: 0 rows — this gate cannot fail]"
        print(f"✓ {name}: rows={len(s)} cols={len(s.columns)}{vac}")
    ok = failures == 0 and vacuous == 0
    print(f"{'PASS' if ok else 'FAIL'}: "
          f"{len(names) - failures}/{len(names)} queries match, "
          f"{vacuous} unallowlisted vacuous")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
