#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare.

Usage: check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (Spark result) and runs the
matching SQL from oracle_sql.json in DuckDB with views over the sfDir
parquet tables. Compares: row count, column names (sorted), and values
(columns sorted by name, strict equality; floats reported with max abs
diff so rounding gaps are visible). Strict pass here implies the
driver's check passes.

Driver-side python (duckdb/pyarrow) — dev tooling only, NOT an engine
dependency.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        return round(v, 9)
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        res_dir = Path(out_dir) / name
        if not res_dir.exists():
            print(f"FAIL {name}: no spark result dumped")
            n_fail += 1
            continue
        spark_rel = con.sql(f"SELECT * FROM '{res_dir}/*.parquet'")
        try:
            duck_rel = con.sql(sql)
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        s_cols, d_cols = sorted(spark_rel.columns), sorted(duck_rel.columns)
        if s_cols != d_cols:
            print(f"FAIL {name}: columns spark={s_cols} duck={d_cols}")
            n_fail += 1
            continue
        # The driver's value hash is type-repr-sensitive: a DuckDB HUGEINT
        # (sum of integers) hashes differently from Spark's int64 even when
        # values are equal (round-3/4 q_pipe_pack regression). Python's
        # Decimal(5000) == 5000 hides this from fetchall comparison, so flag
        # it at the type level: oracle SQL must CAST integer sums to BIGINT.
        wide = [c for c, t in zip(duck_rel.columns, duck_rel.types)
                if str(t) in ("HUGEINT", "UHUGEINT") or
                str(t).startswith("DECIMAL")]
        if wide:
            print(f"FAIL {name}: oracle columns {wide} are HUGEINT/DECIMAL "
                  f"(driver hash mismatch) — CAST them to BIGINT/DOUBLE "
                  f"in the oracle SQL")
            n_fail += 1
            continue
        s_rows = con.sql(
            f"SELECT {', '.join(s_cols)} FROM spark_rel").fetchall()
        d_rows = con.sql(
            f"SELECT {', '.join(d_cols)} FROM duck_rel").fetchall()
        if len(s_rows) != len(d_rows):
            print(f"FAIL {name}: rows spark={len(s_rows)} duck={len(d_rows)}")
            n_fail += 1
            continue
        bad = None
        max_fdiff = 0.0
        for i, (sr, dr) in enumerate(zip(s_rows, d_rows)):
            if tuple(map(norm, sr)) != tuple(map(norm, dr)):
                for a, b in zip(sr, dr):
                    if isinstance(a, float) and isinstance(b, float):
                        if math.isfinite(a) and math.isfinite(b):
                            max_fdiff = max(max_fdiff, abs(a - b))
                if bad is None:
                    bad = (i, sr, dr)
        if bad:
            i, sr, dr = bad
            print(f"FAIL {name}: first mismatch row {i} (max float diff "
                  f"{max_fdiff:g})\n  cols : {s_cols}\n  spark: {sr}\n  duck : {dr}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s_rows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
