"""Materialize a referentially-consistent N-times corpus from an sf dir.

Purpose: the ≤2x-DuckDB bench gate at sf0.1 is dominated by Spark's
per-query scheduling floor (~60ms/query vs DuckDB microqueries of
5-30ms). This tool builds the scale where that floor is noise — the
corpus a 100 TB deployment looks like from one executor's point of view
— so BENCH_SCALE measures plan quality, not fixed cost.

Replication is key-shifted with REFERENTIAL consistency: every foreign
key shifts by the SAME offset as the primary key it references
(l_partkey by part's offset, o_custkey by customer's offset, ...), so
join fan-out, group counts and selectivities scale like real data
growth rather than duplicated keys. region/nation stay fixed, like
TPC-H itself.

Usage: python tools/make_scale_corpus.py [N] [src_sf_dir] [dest_dir]
Defaults: N=10, /root/testdata/sf0.1, /root/repo/.cache/sf1.0
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from columnar_spark.session import get_spark

# table -> (primary keys to shift, {fk_col: referenced_table})
PLAN = {
    "region": None,  # fixed-size, like TPC-H
    "nation": None,
    "customer": (["c_custkey"], {}),
    "supplier": (["s_suppkey"], {}),
    "part": (["p_partkey"], {}),
    "orders": (["o_orderkey"], {"o_custkey": "customer"}),
    "lineitem": (
        ["l_orderkey"],
        {"l_orderkey": "orders", "l_partkey": "part", "l_suppkey": "supplier"},
    ),
    "events": (["event_id", "user_id"], {}),
    "documents": (["doc_id"], {}),
    "embeddings": (["vec_id"], {}),
}

# primary-key column per table, for FK offset lookups
PK = {
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
}


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dest = (
        sys.argv[3]
        if len(sys.argv) > 3
        else os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".cache", "sf1.0")
    )
    os.makedirs(dest, exist_ok=True)
    spark = get_spark("make-scale-corpus")

    dfs: dict[str, DataFrame] = {
        t: spark.read.parquet(os.path.join(src, f"{t}.parquet")) for t in PLAN
    }
    # one offset per referenced key space, shared by PK and all FKs
    offsets: dict[str, int] = {}
    for t, pk in PK.items():
        offsets[t] = int(dfs[t].agg(F.max(pk)).first()[0]) + 1

    for t, plan in PLAN.items():
        out_path = os.path.join(dest, f"{t}.parquet")
        if os.path.exists(os.path.join(out_path, "_SUCCESS")):
            print(f"# {t}: exists, skipping", file=sys.stderr)
            continue
        df = dfs[t]
        if plan is None:
            df.coalesce(1).write.mode("overwrite").parquet(out_path)
            continue
        pks, fks = plan
        rep = df.crossJoin(spark.range(n).toDF("__copy"))
        shifted = set()
        for c, ref in fks.items():
            rep = rep.withColumn(c, F.col(c) + F.col("__copy") * F.lit(offsets[ref]))
            shifted.add(c)
        for c in pks:
            if c in shifted:
                continue
            off = offsets.get(t)
            if off is None or c not in PK.values():
                off = int(df.agg(F.max(c)).first()[0]) + 1
            rep = rep.withColumn(c, F.col(c) + F.col("__copy") * F.lit(off))
        nparts = max(2, min(64, rep.count() // 200_000 + 1))
        rep.drop("__copy").repartition(nparts).write.mode("overwrite").parquet(out_path)
        print(f"# {t}: x{n} -> {out_path} ({nparts} files)", file=sys.stderr)

    # Ingest-time secondary indexes, like any ingested layout carries
    # (reference builds per-column SIs during ingest, builder.cpp:849+):
    # the measure-bearing l_partkey value index serves the large-IN-list
    # COUNT/SUM aggregate index-only (filter_in_large_list).
    from columnar_spark.stats import value_index_path, write_value_index

    li_path = os.path.join(dest, "lineitem.parquet")
    for icol in ("l_partkey", "l_orderkey"):
        if not os.path.exists(os.path.join(value_index_path(li_path, icol), "_SUCCESS")):
            write_value_index(spark, li_path, icol, measures=[("l_quantity", 2)])
            print(f"# lineitem.{icol} value index (+l_quantity measure)", file=sys.stderr)

    print(dest)


if __name__ == "__main__":
    main()
