#!/usr/bin/env python
"""Local replica of the driver's t2 correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB at
sf0.01, compare row count + schema (column names) + order-insensitive
values. Exact match required for non-float columns; floats compare exact
first, with max-abs-diff reported when they differ (to decide whether a
query needs the DECIMAL-sum treatment).

Usage: python scripts/check_correctness.py [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_connection():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def normalize(rows, columns):
    """Sort columns by name, then rows by stringified values —
    approximates the driver's order-insensitive compare."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                vals.append(("f", v))
            elif hasattr(v, "isoformat"):
                vals.append(("t", v.isoformat()))
            else:
                vals.append(("s", str(v)))
        out.append(tuple(vals))
    return sorted(out, key=str), [columns[i] for i in order]


def compare(name, spark_df, con, sql):
    t0 = time.time()
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = spark_df.columns
    spark_sec = time.time() - t0
    t0 = time.time()
    res = con.sql(sql)
    d_rows = [tuple(r) for r in res.fetchall()]
    d_cols = list(res.columns)
    duck_sec = time.time() - t0

    problems = []
    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"schema: spark={sorted(s_cols)} duck={sorted(d_cols)}")
    if len(s_rows) != len(d_rows):
        problems.append(f"rowcount: spark={len(s_rows)} duck={len(d_rows)}")
    if not problems:
        sn, cols = normalize(s_rows, s_cols)
        dn, _ = normalize(d_rows, d_cols)
        n_mismatch, max_diff = 0, 0.0
        for a, b in zip(sn, dn):
            if a != b:
                n_mismatch += 1
                for (ta, va), (tb, vb) in zip(a, b):
                    if ta == tb == "f" and va is not None and vb is not None:
                        if not (math.isnan(va) and math.isnan(vb)):
                            max_diff = max(max_diff, abs(va - vb))
                    elif va != vb:
                        max_diff = float("inf")
        if n_mismatch:
            problems.append(
                f"values: {n_mismatch}/{len(sn)} rows differ, max_float_diff={max_diff:g}"
            )
            for a, b in zip(sn, dn):
                if a != b:
                    print(f"    spark: {a}\n    duck : {b}")
                    break
    status = "OK " if not problems else "FAIL"
    print(f"{status} {name:28s} rows={len(s_rows):6d} spark={spark_sec:5.1f}s duck={duck_sec:4.1f}s "
          + "; ".join(problems))
    return not problems


def main():
    import __spark_entry__ as e
    from incremental_github_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="check-correctness")
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connection()
    qs = e.queries()
    oracles = e.oracle_sql()
    only = set(sys.argv[1:])
    ok = fail = rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, SF_DIR)
            if name in oracles:
                if compare(name, df, con, oracles[name]):
                    ok += 1
                else:
                    fail += 1
            else:
                n = df.count()
                print(f"ROWS {name:28s} rows={n:6d} (no oracle)")
                rows_only += 1
        except Exception as ex:
            fail += 1
            print(f"ERR  {name:28s} {type(ex).__name__}: {str(ex)[:200]}")
    print(f"\n{ok} oracle-matched, {rows_only} rows-only, {fail} failed")
    spark.stop()
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main())
