#!/usr/bin/env python3
"""Local pre-validation of SparkEntry oracles: replicates the driver's
DuckDB compare (sort columns by name, sort rows, compare values) against
the Verify.scala parquet dumps. Usage:
    python3 tools/validate.py <sfDir> <verifyOutDir>
"""
import glob
import json
import math
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver-style tolerant float repr
        return f"{v:.9g}"
    return str(v)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = con.sql(f"SELECT * FROM read_parquet({files!r})")
            got_cols = sorted(got.columns)
            got_rows = con.sql(
                f"SELECT {', '.join(got_cols)} FROM read_parquet({files!r})").fetchall()
            exp = con.sql(sql)
            exp_cols = sorted(exp.columns)
            exp_rows = con.sql(f"SELECT {', '.join(exp_cols)} FROM ({sql})").fetchall()
        except Exception as e:
            print(f"FAIL {name}: query error: {e}")
            n_fail += 1
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns {got_cols} != {exp_cols}")
            n_fail += 1
            continue
        g = sorted([tuple(norm(v) for v in r) for r in got_rows])
        e = sorted([tuple(norm(v) for v in r) for r in exp_rows])
        if g == e:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: {len(g)} vs {len(e)} rows")
            diff = [(a, b) for a, b in zip(g, e) if a != b][:3]
            for a, b in diff:
                print(f"   spark: {a}\n   duck : {b}")
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
