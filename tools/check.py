#!/usr/bin/env python3
"""Local proxy for the driver's correctness gate.

Reads each Spark result parquet under OUTDIR/<name>/, runs the matching
oracle SQL from OUTDIR/oracle_sql.json in DuckDB against the testdata
tables at SFDIR, sorts columns by name + rows by all columns, and
compares values exactly. Dev tooling only — not part of the shipped
library.

Usage: python3 tools/check.py <sfdir> <outdir>
"""
import glob
import json
import math
import os
import re
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# Oracle output types that are driver-poison regardless of values: DuckDB
# HUGEINT/DECIMAL (and unsigned ints) reach pandas as float64/object/uint,
# so the driver's TYPED hash mismatches a Spark int64 even when == holds.
# This exact gap hid s06's dropped_id_sum (SUM(BIGINT) -> HUGEINT) for
# four rounds (r10-r13); the r14 root-cause device was a one-off DESCRIBE
# sweep — standing since r15 (r14 verdict item 7).
BAD_ORACLE_TYPE = re.compile(
    r"HUGEINT|DECIMAL|UBIGINT|UINTEGER|USMALLINT|UTINYINT", re.I)


def describe_sweep(con, oracle):
    """DESCRIBE every oracle query; return (name, col, type) offenders."""
    offenders = []
    for name in sorted(oracle):
        try:
            rows = con.execute(f"DESCRIBE ({oracle[name]})").fetchall()
        except Exception as e:
            offenders.append((name, "<describe failed>", str(e)))
            continue
        for row in rows:
            col, typ = row[0], row[1]
            if BAD_ORACLE_TYPE.search(typ or ""):
                offenders.append((name, col, typ))
    return offenders


def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def values_equal(a, b):
    if a is b:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if a != a and b != b:  # NaN-ish
            return True
    except Exception:
        pass
    return a == b


def main(sfdir, outdir):
    # environment forensics: the oracle engine's own version next to the
    # Spark-side meta.json the Verify dump carries (r13 verdict item 9)
    meta = os.path.join(outdir, "meta.json")
    spark_meta = ""
    if os.path.exists(meta):
        with open(meta) as f:
            spark_meta = f.read().strip()
    print(f"checker: duckdb {duckdb.__version__}; verify meta: {spark_meta or 'absent'}")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(outdir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    n_pass = n_fail = 0
    # standing dtype pre-gate: any oracle emitting a driver-poison type
    # fails the gate BEFORE value comparison ever runs
    for name, col, typ in describe_sweep(con, oracle):
        print(f"FAIL {name}: oracle dtype sweep col={col} type={typ}")
        n_fail += 1
    for name in sorted(oracle):
        files = glob.glob(os.path.join(outdir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            spark_df = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf()
            duck_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        s, o = canon(spark_df), canon(duck_df)
        if list(s.columns) != list(o.columns):
            print(f"FAIL {name}: columns spark={list(s.columns)} oracle={list(o.columns)}")
            n_fail += 1
            continue
        # dtype-KIND mismatch (int vs float/object) fails even when values
        # compare == : the driver's hash is typed, so an oracle column that
        # DuckDB types as HUGEINT/DECIMAL (pandas float64/object) against a
        # Spark int64 is driver-red while == stays green. This exact gap hid
        # s06's dropped_id_sum (SUM(BIGINT) -> HUGEINT) for four rounds
        # (r10-r13). Width differences (int32 vs int64) stay tolerated.
        kind_bad = [
            (c, s[c].dtype, o[c].dtype) for c in s.columns
            if getattr(s[c].dtype, "kind", "O") != getattr(o[c].dtype, "kind", "O")
        ]
        if kind_bad:
            c, sk, ok = kind_bad[0]
            print(f"FAIL {name}: dtype kind mismatch col={c} spark={sk} oracle={ok}")
            n_fail += 1
            continue
        if len(s) != len(o):
            print(f"FAIL {name}: rows spark={len(s)} oracle={len(o)}")
            n_fail += 1
            continue
        bad = None
        for col in s.columns:
            sv, ov = list(s[col]), list(o[col])
            for i, (x, y) in enumerate(zip(sv, ov)):
                if not values_equal(x, y):
                    bad = (col, i, x, y)
                    break
            if bad:
                break
        if bad:
            col, i, x, y = bad
            print(f"FAIL {name}: value mismatch col={col} row={i} spark={x!r} oracle={y!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
