#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/selfcheck.py [verify_out_dir] [sf_dir]

Models the DRIVER's comparator, not a lenient value compare: both sides are
materialized as pandas DataFrames (the Spark parquet dump via pyarrow, the
oracle via duckdb `.df()`), columns are sorted by name, rows are sorted by all
columns, and values are hashed through their pandas dtype — so a DuckDB
HUGEINT that pandas renders as float64 (`3.0`) mismatches a Spark int64 `3`
exactly like it does in CORRECTNESS_r*.json, and an array-typed cell raises
the same TypeError the driver hits in sort_values.

Also lints every oracle's DuckDB result types against a driver-safe set:
HUGEINT, DECIMAL and LIST/STRUCT/MAP outputs are reported even when the
values happen to compare equal, because they are one pandas conversion away
from a red row.
"""
import glob
import hashlib
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# DuckDB result types that survive the driver's pandas conversion + hash
# with the same rendering as Spark's parquet dump.
UNSAFE_TYPE_MARKERS = ("HUGEINT", "DECIMAL", "[]", "LIST", "STRUCT", "MAP")


def cell_str(v):
    """Canonical dtype-sensitive rendering: np.int64(3) -> '3',
    np.float64(3.0) -> '3.0', None/NaN -> 'NaN'."""
    if v is None:
        return "NaN"
    if isinstance(v, float) and v != v:
        return "NaN"
    try:
        if pd.isna(v):
            return "NaN"
    except (TypeError, ValueError):
        pass  # arrays: unreachable here, sort_values raises first
    return str(v)


def frame_hash(df):
    """Driver-shaped hash: columns sorted by name, rows sorted by all
    columns, then a digest over the dtype-sensitive string of every cell.
    Raises TypeError on unhashable (array) cells, like the driver."""
    df = df[sorted(df.columns)]
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    df = df.reset_index(drop=True)
    h = hashlib.md5()
    for row in df.itertuples(index=False, name=None):
        h.update(("\x1f".join(cell_str(v) for v in row) + "\x1e").encode())
    return h.hexdigest()


def load_spark(out, name):
    files = sorted(glob.glob(f"{out}/{name}/*.parquet"))
    if not files:
        raise FileNotFoundError(f"no parquet under {out}/{name}")
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)


def first_diff(sdf, odf, k=3):
    """Human-readable first differing rows after driver-shaped sorting."""
    def canon(df):
        df = df[sorted(df.columns)]
        df = df.sort_values(by=list(df.columns), kind="mergesort")
        return df.reset_index(drop=True)
    s, o = canon(sdf), canon(odf)
    out = []
    for i in range(min(len(s), len(o))):
        srow = tuple(cell_str(v) for v in s.iloc[i])
        orow = tuple(cell_str(v) for v in o.iloc[i])
        if srow != orow:
            out.append((i, srow, orow))
            if len(out) >= k:
                break
    return out


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracles = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    failed, warned = [], []
    for name in sorted(oracles):
        sql = oracles[name]
        try:
            sdf = load_spark(out, name)
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_fail += 1
            failed.append(name)
            continue
        try:
            rel = con.sql(sql)
            # Type lint BEFORE pandas conversion: these DuckDB types do not
            # round-trip to pandas with Spark-compatible dtypes.
            bad_types = [f"{c}:{t}" for c, t in zip(rel.columns, map(str, rel.types))
                         if any(m in str(t).upper() for m in UNSAFE_TYPE_MARKERS)]
            odf = rel.df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e).splitlines()[0][:160]}")
            n_fail += 1
            failed.append(name)
            continue
        problems = []
        if bad_types:
            problems.append(f"driver-unsafe oracle types: {bad_types}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(
                f"cols spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        elif len(sdf) != len(odf):
            problems.append(f"rowcount spark={len(sdf)} oracle={len(odf)}")
        else:
            try:
                sh, oh = frame_hash(sdf), frame_hash(odf)
            except TypeError as e:
                problems.append(f"comparator crash (array-typed cell?): {e}")
            else:
                if sh != oh:
                    sdt = {c: str(sdf[c].dtype) for c in sorted(sdf.columns)}
                    odt = {c: str(odf[c].dtype) for c in sorted(odf.columns)}
                    dt_diff = {c: (sdt[c], odt[c]) for c in sdt if sdt[c] != odt[c]}
                    msg = f"hash mismatch"
                    if dt_diff:
                        msg += f"; dtype diffs {dt_diff}"
                    msg += f"; first rows {first_diff(sdf, odf)}"
                    problems.append(msg)
        if problems:
            print(f"FAIL {name}: " + " | ".join(problems))
            n_fail += 1
            failed.append(name)
        else:
            print(f"PASS {name} ({len(sdf)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    if failed:
        print("failed:", " ".join(failed))
        sys.exit(1)


if __name__ == "__main__":
    main()
