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
    args = [a for a in sys.argv[1:] if not a.startswith("--json")]
    json_out = None
    for a in sys.argv[1:]:
        if a.startswith("--json="):
            json_out = a.split("=", 1)[1]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    spark = get_spark("check-correctness")
    con = duckdb.connect()
    import os

    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        # ingested layouts are multi-split DIRECTORIES; raw testdata is
        # single files — register either so the differential can run
        # against an engine layout (both engines must read the SAME rows)
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    failures = []
    report = {}

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
            report[name] = {"status": "err", "err": f"spark {type(e).__name__}: {e}"[:400]}
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {e}")
            continue

        if name not in oracles:
            n_rowsonly += 1
            report[name] = {"status": "rows_only", "spark_rows": len(srows)}
            print(f"rows  {name}: {len(srows)} rows ({time.time()-t0:.1f}s) [no oracle]")
            continue

        try:
            ores = con.execute(oracles[name])
            ocols = [d[0] for d in ores.description]
            orows = ores.fetchall()
        except Exception as e:
            n_fail += 1
            failures.append(name)
            report[name] = {"status": "err", "err": f"duckdb {type(e).__name__}: {e}"[:400]}
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
            report[name] = {
                "status": "fail",
                "spark_rows": len(srows),
                "oracle_rows": len(orows),
                "err": "; ".join(problems)[:400],
            }
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            n_pass += 1
            report[name] = {
                "status": "pass",
                "rows_match": True,
                "schema_match": True,
                "hash_match": True,
                "spark_rows": len(srows),
                "oracle_rows": len(orows),
            }
            print(f"PASS  {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    if json_out:
        import json

        with open(json_out, "w") as fh:
            json.dump(
                {"sf_dir": sf_dir, "pass": n_pass, "fail": n_fail,
                 "rows_only": n_rowsonly, "queries": report},
                fh, indent=1,
            )
        print(f"wrote {json_out}")
    if failures:
        print("failing:", " ".join(failures))
        sys.exit(1)


if __name__ == "__main__":
    main()
