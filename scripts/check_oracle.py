#!/usr/bin/env python3
"""Local self-check mirroring the driver's correctness gate.

Usage: after `sbt "runMain graft.Verify <sfDir> <outDir>"`, run
    python3 scripts/check_oracle.py <sfDir> <outDir>

Reads each <outDir>/<name> parquet (Spark result), runs the matching
oracle SQL from <outDir>/oracle_sql.json in DuckDB over the sf tables,
and compares schema + row count + values (sorted rows, columns sorted
by name). This is a dev tool only — the shipped library has no Python.
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True,
                        key=lambda s: s.map(lambda v: str(v)))
    return df


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return float(a) == float(b)
    return str(a) == str(b)


def main(sf_dir: str, out_dir: str) -> int:
    out = Path(out_dir)
    oracle = json.loads((out / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    failures = 0
    for name in sorted(oracle):
        spark_path = out / name
        if not spark_path.exists():
            print(f"FAIL {name}: no spark output")
            failures += 1
            continue
        got = canon(pd.read_parquet(spark_path))
        want = canon(con.execute(oracle[name]).fetchdf())
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs "
                  f"{list(want.columns)}")
            failures += 1
            continue
        def kind(dt):
            k = str(dt).lower()
            if "int" in k:
                return "int"
            if "float" in k or "double" in k:
                return "float"
            if "bool" in k:
                return "bool"
            return "other"
        dk = [(c, kind(got[c].dtype), kind(want[c].dtype))
              for c in got.columns
              if kind(got[c].dtype) != kind(want[c].dtype)]
        # nullable int columns surface as float in pandas — tolerate
        dk = [d for d in dk if {d[1], d[2]} != {"int", "float"}]
        if dk:
            print(f"FAIL {name}: dtype kinds differ {dk}")
            failures += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            failures += 1
            continue
        bad = None
        for col in got.columns:
            ga, wa = got[col].tolist(), want[col].tolist()
            for i, (x, y) in enumerate(zip(ga, wa)):
                if not values_equal(x, y):
                    bad = (col, i, x, y)
                    break
            if bad:
                break
        if bad:
            col, i, x, y = bad
            print(f"FAIL {name}: value mismatch col={col} row={i}: "
                  f"spark={x!r} duckdb={y!r}")
            failures += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
    missing = set()
    for d in out.iterdir():
        if d.is_dir() and d.name not in oracle:
            missing.add(d.name)
    for name in sorted(missing):
        n = len(pd.read_parquet(out / name))
        print(f"ROWS-ONLY {name} ({n} rows)")
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
