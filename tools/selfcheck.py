#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/selfcheck.py [verify_out_dir] [sf_dir]

Reads each <out>/<query>/ parquet dump written by graft.Verify plus
<out>/oracle_sql.json, registers the fixture tables as DuckDB views, runs each
oracle, and compares: column names (sorted), row counts, and values — both in
result order and sorted — reporting the first few diffs per query.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def rows_equal(a, b):
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        x, y = norm(x), norm(y)
        if isinstance(x, float) and isinstance(y, float):
            if x != y:
                return False
        elif x != y:
            return False
    return True


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracles = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    failed = []
    for name in sorted(oracles):
        sql = oracles[name]
        try:
            spark_rel = con.sql(
                f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')")
            spark_cols = list(spark_rel.columns)
            # driver sorts columns by name before hashing
            sel = ", ".join(f'"{c}"' for c in sorted(spark_cols))
            spark_rows = con.sql(
                f"SELECT {sel} FROM read_parquet('{out}/{name}/*.parquet')").fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_fail += 1
            failed.append(name)
            continue
        try:
            o_rel = con.sql(sql)
            o_cols = list(o_rel.columns)
            o_sel = ", ".join(f'"{c}"' for c in sorted(o_cols))
            o_rows = con.sql(f"SELECT {o_sel} FROM ({sql}) oq").fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e).splitlines()[0][:160]}")
            n_fail += 1
            failed.append(name)
            continue
        problems = []
        if sorted(spark_cols) != sorted(o_cols):
            problems.append(f"cols spark={sorted(spark_cols)} oracle={sorted(o_cols)}")
        if len(spark_rows) != len(o_rows):
            problems.append(f"rowcount spark={len(spark_rows)} oracle={len(o_rows)}")
        if not problems:
            exact = rows_equal(spark_rows, o_rows)
            in_order = "ordered" if exact else None
            if not exact:
                if rows_equal(sorted(spark_rows, key=repr), sorted(o_rows, key=repr)):
                    problems.append("rows match only after sorting (ORDER mismatch)")
                else:
                    diffs = [(i, a, b) for i, (a, b) in
                             enumerate(zip(spark_rows, o_rows)) if not rows_equal([a], [b])]
                    problems.append(f"{len(diffs)} differing rows; first: {diffs[:3]}")
        if problems:
            print(f"FAIL {name}: " + " | ".join(problems))
            n_fail += 1
            failed.append(name)
        else:
            print(f"PASS {name} ({len(spark_rows)} rows)")
            n_pass += 1
    # queries without oracle: report row counts
    print(f"\n{n_pass} pass, {n_fail} fail")
    if failed:
        print("failed:", " ".join(failed))
        sys.exit(1)


if __name__ == "__main__":
    main()
