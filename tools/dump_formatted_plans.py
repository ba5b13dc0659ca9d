"""Dump .explain("formatted") for bench queries into plans/<tag>/<q>_<suffix>.txt.

Usage: python tools/dump_formatted_plans.py <tag> <before|after> [query ...]
Defaults to every bench.py query against the ingested sf0.1 layout (built
if missing), matching the plans the bench actually times.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from bench import BENCH_QUERIES
from columnar_spark.session import get_spark
from columnar_spark.writer import build_sf_layout


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r10"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:] or BENCH_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    layout_dir = os.path.join(
        repo, ".cache", f"layout_{os.path.basename(sf_dir.rstrip('/'))}"
    )
    out_dir = os.path.join(repo, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("dump-formatted-plans")
    # Match bench.py's session shape so the dumped plan is the timed plan.
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    build_sf_layout(spark, sf_dir, layout_dir)

    qs = entrymod.queries()
    for name in names:
        try:
            df = qs[name](spark, layout_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            plan = f"ERROR {type(e).__name__}: {e}"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(f"wrote {name}_{suffix}.txt ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
