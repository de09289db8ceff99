#!/usr/bin/env python3
"""Full-surface determinism check: row-for-row diff of two Verify dumps.

Usage: diff_verify_dumps.py <outDirA> <outDirB>

Run graft.Verify twice with different SPARK_GRAFT_CPUS (the knob that
sets both local[] threads and shuffle partitions) and diff every query's
parquet output. Any difference means the query's values depend on
partitioning — exactly the class the driver's hash compare would flag
nondeterministically. Complements DeterminismSpec (curated list, in-JVM)
with an exhaustive out-of-process sweep.

Driver-side python (duckdb) — dev tooling only, NOT an engine dependency.
"""
import sys
from pathlib import Path

import duckdb


def main():
    a, b = Path(sys.argv[1]), Path(sys.argv[2])
    names_a = {d.name for d in a.iterdir() if d.is_dir()}
    names_b = {d.name for d in b.iterdir() if d.is_dir()}
    # symmetric presence check: a query that ran in only one dump is a
    # failure regardless of which side is missing it
    only_a = sorted(names_a - names_b)
    only_b = sorted(names_b - names_a)
    if only_a or only_b:
        if only_a:
            print(f"FAIL: missing in {b}: {only_a}")
        if only_b:
            print(f"FAIL: missing in {a}: {only_b}")
        sys.exit(1)
    names = sorted(names_a)
    con = duckdb.connect()
    n_pass = n_fail = 0
    for n in names:
        ra = con.sql(f"SELECT * FROM '{a / n}/*.parquet'")
        cols = ", ".join(f'"{c}"' for c in ra.columns)
        try:
            diff = con.sql(
                f"(SELECT {cols} FROM '{a / n}/*.parquet' EXCEPT ALL "
                f" SELECT {cols} FROM '{b / n}/*.parquet') UNION ALL "
                f"(SELECT {cols} FROM '{b / n}/*.parquet' EXCEPT ALL "
                f" SELECT {cols} FROM '{a / n}/*.parquet')").fetchall()
        except Exception as e:  # e.g. nested types EXCEPT unsupported
            print(f"SKIP {n}: {e}")
            continue
        # EXCEPT ALL is set-level: also require identical row ORDER for
        # the first mismatch report (the driver hashes sorted columns,
        # but LIMIT boundaries make order part of the contract)
        ra_rows = con.sql(f"SELECT {cols} FROM '{a / n}/*.parquet'").fetchall()
        rb_rows = con.sql(f"SELECT {cols} FROM '{b / n}/*.parquet'").fetchall()
        if diff or ra_rows != rb_rows:
            print(f"FAIL {n}: {len(diff)} set-diff rows; "
                  f"ordered-equal={ra_rows == rb_rows}")
            n_fail += 1
        else:
            n_pass += 1
    print(f"\n{n_pass} identical, {n_fail} differ")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
