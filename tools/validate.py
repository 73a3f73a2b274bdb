#!/usr/bin/env python3
"""Local oracle pre-validation: mimics the driver's DuckDB compare.

Usage: python3 tools/validate.py <sfDir> <verifyOutDir> [query ...]
Registers each parquet table in sfDir as a DuckDB view, runs each oracle
SQL from verifyOutDir/oracle_sql.json, loads the Spark result parquet,
sorts columns by name, and compares row counts, schemas, and values.
"""
import json, math, sys

import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # 9 significant digits (NOT an absolute round): large magnitudes
        # (revenue sums ~1e8) differ between Spark and DuckDB by more than
        # 1e-9 absolute from accumulation order alone. Normalize -0.0 so
        # sign-of-zero repr differences can't mismatch; anything else
        # compares at full relative precision (queries round in-query, so
        # sub-epsilon noise never reaches this comparator — and a real
        # small-value disagreement should fail here, not at the driver).
        if v == 0.0:
            v = 0.0
        return format(v, ".9g")
    return repr(v)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        try:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        except duckdb.Error:
            pass
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            want = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        try:
            got = pq.read_table(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark result missing: {e}")
            failures += 1
            continue
        want = want.select(sorted(want.column_names))
        got = got.select(sorted(got.column_names))
        if want.column_names != got.column_names:
            print(f"FAIL {name}: columns want={want.column_names} got={got.column_names}")
            failures += 1
            continue
        if want.num_rows != got.num_rows:
            print(f"FAIL {name}: rows want={want.num_rows} got={got.num_rows}")
            failures += 1
            continue
        # Sort rows before comparing: oracle/Spark ORDER BY keys are total
        # in practice, but multi-part parquet read order is not contractual.
        wl = sorted([norm(v) for v in d.values()] for d in want.to_pylist())
        gl = sorted([norm(v) for v in d.values()] for d in got.to_pylist())
        if wl != gl:
            bad = next(i for i, (a, b) in enumerate(zip(wl, gl)) if a != b)
            print(f"FAIL {name}: first diff at row {bad}:\n  want={wl[bad]}\n  got ={gl[bad]}")
            failures += 1
            continue
        print(f"ok   {name} ({got.num_rows} rows)")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
