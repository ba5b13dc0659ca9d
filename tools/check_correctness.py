"""Local differential checker mimicking the driver's CORRECTNESS gate.

Runs every __spark_entry__.queries() entry and its oracle_sql() on the same
parquet tables, compares row count, sorted column names, and an
order-insensitive multiset of stringified rows. Floats are compared
exactly (repr) — we *want* to catch cross-engine ulp drift here rather
than mask it.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime
import math
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from columnar_spark.session import get_spark
from columnar_spark.catalog import TABLES


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return repr(v)


def _rows_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_norm_cell(r[i]) for i in order) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("check-correctness")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    failures = []

    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {e}")
            continue

        if name not in oracles:
            n_rowsonly += 1
            print(f"rows  {name}: {len(srows)} rows ({time.time()-t0:.1f}s) [no oracle]")
            continue

        try:
            ores = con.execute(oracles[name])
            ocols = [d[0] for d in ores.description]
            orows = ores.fetchall()
        except Exception as e:
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {e}")
            continue

        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} duckdb={sorted(ocols)}")
        if not problems:
            sm, om = _rows_to_multiset(scols, srows), _rows_to_multiset(ocols, orows)
            if sm != om:
                diffs = [(a, b) for a, b in zip(sm, om) if a != b][:3]
                problems.append(f"values differ, e.g. {diffs}")
        if problems:
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            n_pass += 1
            print(f"PASS  {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    if failures:
        print("failing:", " ".join(failures))
        sys.exit(1)


if __name__ == "__main__":
    main()
