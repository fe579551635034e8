#!/usr/bin/env python3
"""Dev-only parity checker mirroring the driver's correctness gate:
runs graft.Verify output against DuckDB executing SparkEntry.oracleSql
on the same parquet tables, compares row count, schema (column names),
and values (columns sorted by name, rows as-ordered).

Usage: python3 tools/check_parity.py /root/testdata/sf0.01 /tmp/verify_out
"""
import glob
import json
import math
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.reset_index(drop=True)


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def main(sf_dir: str, out_dir: str) -> None:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not spark_files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = norm(pd.concat([pd.read_parquet(f) for f in sorted(spark_files)]))
            want = norm(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        problems = []
        if len(got) != len(want):
            problems.append(f"rows {len(got)} != {len(want)}")
        if list(got.columns) != list(want.columns):
            problems.append(f"cols {list(got.columns)} != {list(want.columns)}")
        if not problems:
            for c in got.columns:
                gv, wv = got[c].tolist(), want[c].tolist()
                bad = [(i, x, y) for i, (x, y) in enumerate(zip(gv, wv))
                       if not values_equal(x, y)]
                if bad:
                    i, x, y = bad[0]
                    problems.append(
                        f"col {c}: {len(bad)} diffs, first row {i}: {x!r} != {y!r}")
            # dtype check (informational)
            for c in got.columns:
                if str(got[c].dtype) != str(want[c].dtype):
                    problems.append(f"DTYPE col {c}: {got[c].dtype} vs {want[c].dtype}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems[:4]))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
