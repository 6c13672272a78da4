#!/usr/bin/env python3
"""Local dev loop mimicking the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Loads each Spark result parquet written by graft.Verify, runs the matching
oracle SQL (from <verifyOutDir>/oracle_sql.json) in DuckDB over the same
testdata parquet files, and compares values exactly (columns sorted by name,
rows in emitted order). Exact match here implies the driver's hash compare
passes regardless of its hashing details.

Strictly harsher than the driver's gate: before comparing, both frames are
run through the driver's own normalization — sort columns by name, then
pandas-lexsort the rows by ALL columns — and any dtype that lexsort cannot
handle (e.g. a raw array/list column, which raised
"unhashable type: numpy.ndarray" in the driver on round 8's
q_media_features) is a hard FAIL even if the values happen to agree in
emitted order. The value compare itself stays in emitted order, which is
stronger than the driver's sorted-hash compare.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].reset_index(drop=True)
    return df


def driver_lexsort(df: pd.DataFrame) -> Exception | None:
    """Reproduce the driver's row normalization (sort_values over every
    column); returns the exception a driver run would hit, else None."""
    try:
        d = df[sorted(df.columns)]
        if len(d.columns):
            d.sort_values(by=list(d.columns), kind="mergesort")
        return None
    except Exception as e:
        return e


def compare(name: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list[str]:
    problems = []
    for side, df in (("spark", spark_df), ("duck", duck_df)):
        err = driver_lexsort(df)
        if err is not None:
            problems.append(
                f"{side} result would crash the driver's row lexsort: {err!r}"
                " (serialize array/map/struct columns, e.g. array_join)")
    if problems:
        return problems
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        problems.append(f"columns differ: spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}")
        return problems
    s, d = norm(spark_df), norm(duck_df)
    if len(s) != len(d):
        problems.append(f"row count differs: spark={len(s)} duck={len(d)}")
        return problems
    for c in s.columns:
        sv, dv = s[c], d[c]
        if str(sv.dtype) != str(dv.dtype):
            problems.append(f"col {c}: dtype spark={sv.dtype} duck={dv.dtype}")
        try:
            if sv.dtype == object:
                eq = (sv.astype(str) == dv.astype(str)) | (sv.isna() & dv.isna())
            else:
                eq = (sv == dv) | (sv.isna() & dv.isna())
            bad = (~eq).to_numpy().nonzero()[0]
            if len(bad):
                i = int(bad[0])
                problems.append(
                    f"col {c}: {len(bad)} mismatched values, first at row {i}: "
                    f"spark={sv.iloc[i]!r} duck={dv.iloc[i]!r}")
        except Exception as e:  # dtype comparison blowup
            problems.append(f"col {c}: compare error {e}")
    return problems


def main() -> None:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_df = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            n_fail += 1
            continue
        try:
            duck_df = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        problems = compare(name, spark_df, duck_df)
        if problems:
            n_fail += 1
            print(f"FAIL {name}:")
            for p in problems:
                print(f"   {p}")
        else:
            n_pass += 1
            print(f"PASS {name} ({len(spark_df)} rows)")
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
