#!/usr/bin/env python3
"""Local self-check mirroring the driver's correctness gate.

Usage: after `sbt "runMain graft.Verify <sfDir> <outDir>"`, run
    python3 scripts/check_oracle.py <sfDir> <outDir>

Reads each <outDir>/<name> parquet (Spark result), runs the matching
oracle SQL from <outDir>/oracle_sql.json in DuckDB over the sf tables,
and compares schema + row count + values (sorted rows, columns sorted
by name).

Types are compared on the AUTHORITATIVE Arrow schemas from both engines
(parquet footer / duckdb .arrow()), not on pandas dtypes: pandas
silently widens nullable ints to float and its float(a)==float(b)
comparison hides int-vs-float divergence (the q25 SIGN TINYINT-vs-
DOUBLE class, which hash-mismatches in the driver's gate). Numeric
kinds must match exactly — an int column on one side and a float column
on the other is a FAIL here, as it is in the driver.

This is a dev tool only — the shipped library has no Python.
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Oracle-environment pin: a builder-green / driver-red divergence
# (r6 doc23) is indistinguishable from a logic bug unless the DuckDB
# version difference surfaces loudly. The builder's known-good version
# is the default; set GRAFT_DUCKDB_EXPECT to re-pin (or to "any" to
# skip the guard when deliberately probing another version).
EXPECTED_DUCKDB = "1.0.0"


def check_duckdb_version() -> bool:
    """Report (never abort): a version diff must be ATTRIBUTABLE, so
    the per-query comparison still runs and the divergence — if any —
    lands on a specific query instead of zeroing out the whole gate in
    an environment we don't control."""
    import os
    expect = os.environ.get("GRAFT_DUCKDB_EXPECT", EXPECTED_DUCKDB)
    got = duckdb.__version__
    matched = expect == "any" or got == expect
    print(f"duckdb version: {got} (expected {expect})")
    if not matched:
        print(f"WARNING: duckdb {got} != pinned {expect} — a hash "
              "mismatch below may be a VERSION diff, not a logic bug.")
    return matched


def arrow_kind(t: pa.DataType) -> str:
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return "list"
    return str(t)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True,
                        key=lambda s: s.map(lambda v: str(v)))
    return df


def values_equal(a, b, kind: str) -> bool:
    if a is None and b is None:
        return True
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if pd.isna(a) != pd.isna(b):
            return False
    except (TypeError, ValueError):
        pass
    if kind == "float":
        fa, fb = float(a), float(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb
    if kind == "int":
        return int(a) == int(b)
    if kind == "bool":
        return bool(a) == bool(b)
    return str(a) == str(b)


def main(sf_dir: str, out_dir: str) -> int:
    version_ok = check_duckdb_version()
    out = Path(out_dir)
    results = {"duckdb_version": duckdb.__version__,
               "duckdb_version_pinned": version_ok, "queries": {}}
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
            results["queries"][name] = "FAIL:no-output"
            failures += 1
            continue
        got_tbl = pq.read_table(spark_path)
        want_tbl = con.execute(oracle[name]).arrow()
        got_kinds = {f.name: arrow_kind(f.type) for f in got_tbl.schema}
        want_kinds = {f.name: arrow_kind(f.type) for f in want_tbl.schema}
        if sorted(got_kinds) != sorted(want_kinds):
            print(f"FAIL {name}: columns {sorted(got_kinds)} vs "
                  f"{sorted(want_kinds)}")
            results["queries"][name] = "FAIL:columns"
            failures += 1
            continue
        dk = [(c, got_kinds[c], want_kinds[c]) for c in sorted(got_kinds)
              if got_kinds[c] != want_kinds[c]]
        # DECIMAL(sum of DOUBLE) etc: decimal-vs-float is a real
        # divergence; int-vs-float likewise. No tolerated pairs.
        if dk:
            print(f"FAIL {name}: type kinds differ {dk}")
            results["queries"][name] = "FAIL:types"
            failures += 1
            continue
        got = canon(got_tbl.to_pandas())
        want = canon(want_tbl.to_pandas())
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            results["queries"][name] = "FAIL:rows"
            failures += 1
            continue
        bad = None
        for col in got.columns:
            ga, wa = got[col].tolist(), want[col].tolist()
            for i, (x, y) in enumerate(zip(ga, wa)):
                if not values_equal(x, y, got_kinds[col]):
                    bad = (col, i, x, y)
                    break
            if bad:
                break
        if bad:
            col, i, x, y = bad
            print(f"FAIL {name}: value mismatch col={col} row={i}: "
                  f"spark={x!r} duckdb={y!r}")
            results["queries"][name] = f"FAIL:value:{col}"
            failures += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            results["queries"][name] = "PASS"
    missing = set()
    for d in out.iterdir():
        if d.is_dir() and d.name not in oracle:
            missing.add(d.name)
    for name in sorted(missing):
        n = len(pd.read_parquet(out / name))
        print(f"ROWS-ONLY {name} ({n} rows)")
    (out / "gate_result.json").write_text(json.dumps(results, indent=1))
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
