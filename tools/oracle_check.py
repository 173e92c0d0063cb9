#!/usr/bin/env python3
"""Local stand-in for the grading driver's correctness gate.

Usage: oracle_check.py <sfDir> <verifyOutDir>

Loads each result parquet written by `graft.Verify`, runs the matching
entry of oracle_sql.json in DuckDB over the same base tables, sorts
columns by name and rows by all columns, and compares values exactly
(floats bit-for-bit; ints across widths; timestamps as instants).

This is a LOCAL DEV TOOL ONLY (duckdb/pandas are driver-side deps, not
library deps).
"""
import glob
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def type_tag(s: pd.Series) -> str:
    """Driver-faithful type identity for a column. The driver loads the
    result parquet in DuckDB and compares its schema against the oracle
    query's: integer/float WIDTH is tolerated (the 82 r5-green entries
    include width-normalized casts), but a timezone-aware timestamp
    (parquet isAdjustedToUTC=true -> DuckDB TIMESTAMP WITH TIME ZONE) is a
    DIFFERENT TYPE from the oracle's naive TIMESTAMP. Round 5 shipped 7
    entries red precisely because the old norm() here tz_localize(None)'d
    that distinction away before comparing."""
    if pd.api.types.is_datetime64_any_dtype(s):
        tz = getattr(s.dtype, "tz", None)
        return "timestamptz" if tz is not None else "timestamp"
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    return str(s.dtype)


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def cmp_cell(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if pd.isna(a) or pd.isna(b):
            return False
    except (TypeError, ValueError):
        pass
    return a == b


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    with open(f"{outdir}/oracle_sql.json") as f:
        oracle = json.load(f)

    results_dirs = sorted(
        d.rstrip("/").split("/")[-1]
        for d in glob.glob(f"{outdir}/*/") )
    n_pass = n_fail = 0
    for name in results_dirs:
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no result parquet")
            n_fail += 1
            continue
        got = con.sql(
            f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").df()
        if name not in oracle:
            status = "ROWS-ONLY" if len(got) > 0 else "ROWS-ONLY-EMPTY(!)"
            print(f"{status} {name}: rows={len(got)}")
            continue
        exp = con.sql(oracle[name]).df()
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(e.columns)}")
            n_fail += 1
            continue
        # Schema check BEFORE value compare, on the PRE-norm frames: norm()
        # erases exactly the tz-awareness split the driver's gate flags.
        type_bad = [
            (c, type_tag(got[c]), type_tag(exp[c]))
            for c in sorted(got.columns)
            if type_tag(got[c]) != type_tag(exp[c])]
        if type_bad:
            c, gt, et = type_bad[0]
            print(f"FAIL {name}: schema col={c} got={gt} exp={et}")
            n_fail += 1
            continue
        if g.shape != e.shape:
            print(f"FAIL {name}: shape {g.shape} != {e.shape}")
            n_fail += 1
            continue
        bad = None
        for c in g.columns:
            gv, ev = g[c].tolist(), e[c].tolist()
            for i, (a, b) in enumerate(zip(gv, ev)):
                if not cmp_cell(a, b):
                    bad = (c, i, a, b)
                    break
            if bad:
                break
        if bad:
            print(f"FAIL {name}: col={bad[0]} row={bad[1]} got={bad[2]!r} exp={bad[3]!r}")
            n_fail += 1
        else:
            print(f"PASS {name}: rows={len(g)}")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, "
          f"{len(results_dirs) - n_pass - n_fail} rows-only ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
