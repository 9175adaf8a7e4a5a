#!/usr/bin/env python3
"""Convert the reference's DDL INSERT data (/root/reference/ddl/*.sql) into
parquet fixtures for the golden-parity test suite (SURVEY.md §5).

Data only — no reference code is used. Output: fixtures/ref/*.parquet.
"""
import re
import sys

import duckdb


def main(ref_dir, out_dir):
    con = duckdb.connect()
    # The DDL is Postgres-flavored but simple enough for DuckDB to execute
    # statement-by-statement (the reference itself splits on ';' —
    # src/job.py:74). The sellout file ends in a stray ';;' which empty-
    # statement dropping handles.
    for name in ["chains", "stores", "products", "combined_sellout"]:
        sql = open(f"{ref_dir}/ddl/{name}.sql").read()
        for stmt in sql.split(";"):
            stmt = stmt.strip()
            if not stmt:
                continue
            # DuckDB lacks CASCADE on DROP TABLE of non-dependent tables
            stmt = re.sub(r"DROP TABLE IF EXISTS (\w+) CASCADE",
                          r"DROP TABLE IF EXISTS \1", stmt)
            con.execute(stmt)
    import os
    os.makedirs(out_dir, exist_ok=True)
    for table in ["chains", "stores", "products", "sellout"]:
        con.execute(
            f"COPY {table} TO '{out_dir}/{table}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT COUNT(*) FROM {table}").fetchone()[0]
        print(f"{table}: {n} rows")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/reference",
         sys.argv[2] if len(sys.argv) > 2 else "/root/repo/fixtures/ref")
