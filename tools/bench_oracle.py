"""Time the DuckDB oracle for every bench query that has one, at a
given sf_dir — the denominator of BASELINE.md's "<=2x DuckDB" gate.

DuckDB parallelizes parquet scans by row group, and the raw testdata is
single-row-group (1 thread); the engine's bench serves from its own
multi-split ingested layout. For an honest comparison DuckDB gets the
same ingested layout (pass --raw to use the raw files instead).

Usage: python tools/bench_oracle.py [sf_dir] [--raw]
Prints one line per query and a JSON summary to stdout.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from bench import BENCH_QUERIES
from columnar_spark.catalog import TABLES


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    raw = "--raw" in sys.argv
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    layout = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".cache",
        f"layout_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    src = sf_dir if raw or not os.path.isdir(layout) else layout

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(src, f"{t}.parquet")
        rel = f"parquet_scan('{p}/*.parquet')" if os.path.isdir(p) else f"'{p}'"
        sel = "*"
        if t == "events":
            # The ingested layout stores ts as BIGINT nanoseconds (the
            # engine reads TIMESTAMP(NANOS) as long); the oracle SQL is
            # written against the raw timestamp column — convert back.
            row = con.execute(f"DESCRIBE SELECT ts FROM {rel}").fetchone()
            if row[1] == "BIGINT":
                sel = "* REPLACE (make_timestamp(ts // 1000) AS ts)"
        con.execute(f"CREATE VIEW {t} AS SELECT {sel} FROM {rel}")

    oracles = entrymod.oracle_sql()
    timings: dict[str, float] = {}
    total = 0.0
    missing = []
    # Pathological-on-DuckDB queries (e.g. semantic_decontaminate at 10x
    # runs >1h/exec in some windows) can be skipped or timed with a
    # single cold execution so one outlier doesn't block the capture.
    skip = set(filter(None, os.environ.get("ORACLE_SKIP", "").split(",")))
    once = set(filter(None, os.environ.get("ORACLE_ONCE", "").split(",")))
    for name in BENCH_QUERIES:
        sql = oracles.get(name)
        if sql is None:
            missing.append(name)
            continue
        if name in skip:
            print(f"# {name}: skipped (ORACLE_SKIP)", file=sys.stderr)
            continue
        if name in once:
            t0 = time.time()
            con.execute(sql).fetchall()
            best = time.time() - t0
            timings[name] = round(best, 3)
            total += best
            print(f"# {name}: {best:.3f}s (single cold exec)", file=sys.stderr)
            continue
        con.execute(sql).fetchall()  # warm
        best = None
        for _ in range(2):
            t0 = time.time()
            con.execute(sql).fetchall()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        total += best
        print(f"# {name}: {best:.3f}s", file=sys.stderr)

    print(
        json.dumps(
            {
                "engine": "duckdb-oracle",
                "source": src,
                "total_sec": round(total, 3),
                "n_queries": len(timings),
                "no_oracle": missing,
                "queries": timings,
            }
        )
    )


if __name__ == "__main__":
    main()
