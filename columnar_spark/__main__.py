"""Operational CLI — the engine's host-daemon surface in one command:

    python -m columnar_spark ingest  SRC_DIR DEST_DIR [--force]
    python -m columnar_spark append  SRC TABLE_PATH [--format parquet|csv|json]
                                     [--cluster-by C1,C2]
    python -m columnar_spark check   TABLE_PATH
    python -m columnar_spark stats   TABLE_PATH
    python -m columnar_spark compact TABLE_PATH [--target-rows N]
    python -m columnar_spark knn-build TABLE_PATH [--vec-col C] [--id-col C]
                                       [--metric cosine|l2] [--nlist N]
    python -m columnar_spark knn-query TABLE_PATH (--id QID | --vec=F1,F2,...)
                                       [--k K] [--nprobe N]
    python -m columnar_spark sql "SELECT ..." --sf-dir DIR
    python -m columnar_spark history TABLE_PATH
    python -m columnar_spark vacuum  TABLE_PATH [--retain-last N]
    python -m columnar_spark restore TABLE_PATH --version N
    python -m columnar_spark index-build TABLE_PATH --col C
    python -m columnar_spark diff    TABLE_PATH [--from V] [--to V] --keys K1,K2
    python -m columnar_spark corpus-stats TABLE_PATH [--top-collocations N]
    python -m columnar_spark vocab-monitor-init TABLE_PATH [--force]
    python -m columnar_spark vocab-report TABLE_PATH
    python -m columnar_spark bpe-train TABLE_PATH [--n-merges N] [--out F] [--stats]

`ingest` builds the clustered multi-split layout + stats sidecars (+ the
persisted KNN index for the embeddings table); `check` runs the storage
integrity checker; `stats` prints the manifest; `sql` registers the
star-schema views and runs a query through Engine.sql (which applies the
index-covered COUNT rewrite). Exit code is non-zero on any failure —
scriptable like the reference's indexer/indextool pair.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="python -m columnar_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("ingest")
    sp.add_argument("src_dir")
    sp.add_argument("dest_dir")
    sp.add_argument("--force", action="store_true")

    sp = sub.add_parser("append")
    sp.add_argument("src")
    sp.add_argument("table_path")
    sp.add_argument("--format", default="parquet", choices=["parquet", "csv", "json", "orc"])
    sp.add_argument("--cluster-by", default=None, help="comma-separated sort columns")
    sp.add_argument("--quarantine", default=None,
                    help="csv/json only: divert malformed records to this parquet "
                         "dir instead of failing (requires an existing table for "
                         "the declared schema)")

    sp = sub.add_parser("check")
    sp.add_argument("table_path")

    sp = sub.add_parser("stats")
    sp.add_argument("table_path")

    sp = sub.add_parser("compact")
    sp.add_argument("table_path")
    sp.add_argument("--target-rows", type=int, default=75_000)

    sp = sub.add_parser("knn-build")
    sp.add_argument("table_path")
    sp.add_argument("--vec-col", default="embedding")
    sp.add_argument("--id-col", default="vec_id")
    sp.add_argument("--metric", default="cosine", choices=["cosine", "l2"])
    sp.add_argument("--nlist", type=int, default=16)

    sp = sub.add_parser("graph-build")
    sp.add_argument("table_path")
    sp.add_argument("--vec-col", default="embedding")
    sp.add_argument("--id-col", default="vec_id")
    sp.add_argument("--metric", default="cosine", choices=["cosine", "l2", "ip"])
    sp.add_argument("--num-parts", type=int, default=8)
    sp.add_argument("--m", type=int, default=16)

    sp = sub.add_parser("graph-query")
    sp.add_argument("table_path")
    g = sp.add_mutually_exclusive_group(required=True)
    g.add_argument("--id", type=int, help="query vector's id in the table")
    g.add_argument("--vec", help="literal query vector: comma-separated floats")
    sp.add_argument("--k", type=int, default=10)
    sp.add_argument("--ef", type=int, default=64)
    sp.add_argument("--vec-col", default=None,
                    help="select among per-attribute graph indexes")

    sp = sub.add_parser("knn-query")
    sp.add_argument("table_path")
    g = sp.add_mutually_exclusive_group(required=True)
    g.add_argument("--id", type=int, help="query vector's id in the table")
    g.add_argument("--vec", help="literal query vector: comma-separated floats")
    sp.add_argument("--k", type=int, default=10)
    sp.add_argument("--nprobe", type=int, default=4)
    sp.add_argument("--vec-col", default=None,
                    help="select among per-attribute vector indexes")

    sp = sub.add_parser("sql")
    sp.add_argument("query")
    sp.add_argument("--sf-dir", required=True)

    sp = sub.add_parser("text-index-build")
    sp.add_argument("table_path")
    sp.add_argument("--text-col", default="text")
    sp.add_argument("--id-col", default="doc_id")

    sp = sub.add_parser("percolate")
    sp.add_argument("table_path")
    sp.add_argument("rules", help="JSON file: [{'id': ..., 'query': ...}, ...]")
    sp.add_argument("--mode", default="terms", choices=["terms", "boolean"])
    sp.add_argument("--text-col", default="text")
    sp.add_argument("--id-col", default="doc_id")
    sp.add_argument("--limit", type=int, default=1000)

    sp = sub.add_parser("rollup-build")
    sp.add_argument("table_path")
    sp.add_argument("--ts-col", default="ts")
    sp.add_argument("--bucket", default="1 day")
    sp.add_argument("--keys", default="event_type", help="comma-separated")
    sp.add_argument("--value-col", default="value")

    sp = sub.add_parser("topk")
    sp.add_argument("table_path")
    sp.add_argument("--col", required=True)
    sp.add_argument("--k", type=int, default=10)
    sp.add_argument("--asc", action="store_true")
    sp.add_argument("--tiebreak", default=None)

    sp = sub.add_parser("search")
    sp.add_argument("table_path")
    sp.add_argument("query")
    sp.add_argument("--k", type=int, default=10)
    sp.add_argument(
        "--mode", default="bm25", choices=["bm25", "boolean", "phrase"]
    )
    sp.add_argument("--text-col", default="text")
    sp.add_argument("--id-col", default="doc_id")

    sp = sub.add_parser("index-build")
    sp.add_argument("table_path")
    sp.add_argument(
        "--col",
        required=True,
        help="column to index; a comma-separated pair (e.g. --col a,b) "
        "builds a composite index keyed by struct(a, b)",
    )
    sp.add_argument(
        "--json-path",
        default=None,
        help="build a per-field JSON index over get_json_object(col, path), "
        "e.g. --col props --json-path '$.k'",
    )
    sp.add_argument(
        "--measure",
        action="append",
        default=None,
        metavar="COL:DP",
        help="carry an exact int64 fixed-point SUM of COL at DP decimal "
        "places (repeatable), e.g. --measure o_totalprice:2",
    )

    sp = sub.add_parser("proj-build")
    sp.add_argument("fact_path", help="fact table (projection lives beside it)")
    sp.add_argument("--dim", required=True, help="dim table parquet path")
    sp.add_argument("--name", required=True, help="projection name")
    sp.add_argument("--fact-key", required=True)
    sp.add_argument("--dim-key", required=True)
    sp.add_argument(
        "--dim-cols", required=True,
        help="comma-separated dim columns to carry onto the fact rows",
    )
    sp.add_argument(
        "--cluster-by", default=None,
        help="comma-separated projection cluster keys (range clustering)",
    )

    sp = sub.add_parser("textstats-build")
    sp.add_argument("table_path")
    sp.add_argument("--id-col", default="doc_id")
    sp.add_argument("--text-col", default="text")

    sp = sub.add_parser("merge")
    sp.add_argument("table_path")
    sp.add_argument("--updates", required=True, help="parquet path of update rows")
    sp.add_argument("--keys", required=True, help="comma-separated key columns")
    sp.add_argument("--deletes", default=None, help="parquet path of delete keys")

    sp = sub.add_parser("diff")
    sp.add_argument("table_path")
    sp.add_argument("--from", dest="v_from", type=int, default=None)
    sp.add_argument("--to", dest="v_to", type=int, default=None)
    sp.add_argument("--keys", required=True, help="comma-separated key columns")
    sp.add_argument("--limit", type=int, default=100)

    sp = sub.add_parser("history")
    sp.add_argument("table_path")

    sp = sub.add_parser("vacuum")
    sp.add_argument("table_path")
    sp.add_argument("--retain-last", type=int, default=1)

    sp = sub.add_parser("restore")
    sp.add_argument("table_path")
    sp.add_argument("--version", type=int, required=True)

    sp = sub.add_parser("vocab-monitor-init")
    sp.add_argument("table_path")
    sp.add_argument("--text-col", default="text")
    sp.add_argument("--force", action="store_true",
                    help="rebuild an existing monitor from the current table")

    sp = sub.add_parser("vocab-report")
    sp.add_argument("table_path")

    sp = sub.add_parser("corpus-stats")
    sp.add_argument("table_path")
    sp.add_argument("--text-col", default="text")
    sp.add_argument("--top-collocations", type=int, default=0)
    sp.add_argument("--min-count", type=int, default=5)

    sp = sub.add_parser("bpe-train")
    sp.add_argument("table_path")
    sp.add_argument("--text-col", default="text")
    sp.add_argument("--n-merges", type=int, default=1000)
    sp.add_argument("--min-pair-count", type=int, default=2)
    sp.add_argument("--out", default=None, help="write merges JSON here")
    sp.add_argument("--stats", action="store_true", help="also print fertility")

    args = p.parse_args(argv)

    # snapshot bookkeeping is pure driver-side file I/O — no session
    if args.cmd == "history":
        from columnar_spark.snapshots import history

        print(json.dumps([e.__dict__ for e in history(args.table_path)]))
        return 0

    if args.cmd == "vacuum":
        from columnar_spark.snapshots import vacuum

        removed = vacuum(args.table_path, retain_last=args.retain_last)
        print(json.dumps({"removed_versions": removed}))
        return 0

    if args.cmd == "restore":
        from columnar_spark.snapshots import restore

        retired = restore(args.table_path, args.version)
        print(json.dumps({"restored": args.version, "displaced_as": retired}))
        return 0

    from columnar_spark.session import get_spark

    spark = get_spark("columnar-spark-cli")

    if args.cmd == "index-build":
        if args.json_path:
            from columnar_spark.stats import write_json_field_index

            vname = write_json_field_index(
                spark, args.table_path, args.col, args.json_path
            )
            print(
                json.dumps(
                    {
                        "index": vname,
                        "parent": args.col,
                        "json_path": args.json_path,
                        "dest": f"{args.table_path}.vidx/{vname}",
                    }
                )
            )
            return 0
        from columnar_spark.stats import write_value_index

        key = tuple(args.col.split(",")) if "," in args.col else args.col
        measures = [
            (m.rsplit(":", 1)[0], int(m.rsplit(":", 1)[1]))
            for m in (args.measure or [])
        ] or None
        write_value_index(spark, args.table_path, key, measures=measures)
        print(json.dumps({"index": args.col, "dest": args.table_path + ".vidx"}))
        return 0

    if args.cmd == "proj-build":
        from columnar_spark.projections import write_join_projection

        write_join_projection(
            spark,
            args.fact_path,
            args.dim,
            name=args.name,
            fact_key=args.fact_key,
            dim_key=args.dim_key,
            dim_cols=tuple(args.dim_cols.split(",")),
            cluster_by=tuple(args.cluster_by.split(",")) if args.cluster_by else (),
        )
        print(
            json.dumps(
                {
                    "projection": args.name,
                    "dest": args.fact_path.rstrip("/") + f".proj/{args.name}",
                }
            )
        )
        return 0

    if args.cmd == "textstats-build":
        from columnar_spark.textstats import write_textstats_sidecar

        write_textstats_sidecar(
            spark, args.table_path, id_col=args.id_col, text_col=args.text_col
        )
        print(
            json.dumps(
                {"index": "textstats", "dest": args.table_path.rstrip("/") + ".textstats"}
            )
        )
        return 0

    if args.cmd == "merge":
        from columnar_spark.operators.upsert import merge_into

        updates = spark.read.parquet(args.updates)
        deletes = spark.read.parquet(args.deletes) if args.deletes else None
        before, n_up, after = merge_into(
            spark, args.table_path, updates, args.keys.split(","), deletes=deletes
        )
        print(
            json.dumps(
                {"rows_before": before, "updates": n_up, "rows_after": after}
            )
        )
        return 0

    if args.cmd == "text-index-build":
        from columnar_spark.operators.fulltext import write_text_index

        write_text_index(
            spark, args.table_path, text_col=args.text_col, id_col=args.id_col
        )
        print(json.dumps({"index": "fulltext", "dest": args.table_path + ".ftidx"}))
        return 0

    if args.cmd == "percolate":
        from columnar_spark.operators.fulltext import percolate, percolate_boolean

        with open(args.rules) as fh:
            rules = [(r["id"], r["query"]) for r in json.load(fh)]
        df = spark.read.parquet(args.table_path)
        fn = percolate_boolean if args.mode == "boolean" else percolate
        out = fn(df, rules, id_col=args.id_col, text_col=args.text_col)
        rows = [r.asDict() for r in out.limit(args.limit).collect()]
        print(json.dumps({"n_matches": out.count(), "matches": rows}, default=str))
        return 0

    if args.cmd == "rollup-build":
        from columnar_spark.streaming.rollup import write_rollup_sidecar

        root = write_rollup_sidecar(
            spark.read.parquet(args.table_path),
            args.table_path,
            ts_col=args.ts_col,
            bucket=args.bucket,
            keys=tuple(k for k in args.keys.split(",") if k),
            value_col=args.value_col,
        )
        print(json.dumps({"index": "rollup", "dest": root}))
        return 0

    if args.cmd == "topk":
        from columnar_spark.operators.topk import topk_pruned

        df, read, total = topk_pruned(
            spark,
            args.table_path,
            args.col,
            args.k,
            descending=not args.asc,
            tiebreak_col=args.tiebreak,
        )
        print(
            json.dumps(
                {
                    "files_read": read,
                    "files_total": total,
                    "rows": [r.asDict() for r in df.collect()],
                },
                default=str,
            )
        )
        return 0

    if args.cmd == "search":
        from columnar_spark.operators import fulltext as FT

        df = spark.read.parquet(args.table_path)
        loaded = FT.load_text_index(spark, args.table_path)
        postings = loaded[0] if loaded else None
        analyzer = loaded[2].get("analyzer") if loaded else None
        if args.mode == "bm25":
            if loaded:
                out = FT.bm25_search_indexed(spark, args.table_path, args.query, k=args.k)
            else:
                out = FT.bm25_search(
                    df, args.query, k=args.k, id_col=args.id_col, text_col=args.text_col
                )
        elif args.mode == "boolean":
            out = FT.match_boolean(
                df, args.query, id_col=args.id_col, text_col=args.text_col,
                postings=postings, analyzer=analyzer,
            ).orderBy("doc_id").limit(args.k)
        else:  # phrase
            pos = postings if postings is not None and "positions" in postings.columns else None
            out = FT.phrase_match(
                df, args.query, id_col=args.id_col, text_col=args.text_col,
                postings=pos, analyzer=analyzer if pos is not None else None,
            ).orderBy("doc_id").limit(args.k)
        print(json.dumps([r.asDict() for r in out.collect()], default=str))
        return 0

    if args.cmd == "diff":
        from columnar_spark.snapshots import table_changes

        ch = table_changes(
            spark, args.table_path, args.v_from, args.v_to, args.keys.split(",")
        )
        rows = [r.asDict() for r in ch.limit(args.limit).collect()]
        print(json.dumps({"n_changes": ch.count(), "sample": rows}, default=str))
        return 0

    if args.cmd == "ingest":
        from columnar_spark.writer import build_sf_layout

        built = build_sf_layout(spark, args.src_dir, args.dest_dir, force=args.force)
        print(json.dumps({"built": built, "dest": args.dest_dir}))
        return 0

    if args.cmd == "append":
        from columnar_spark.streaming.ingest import append_batch
        from columnar_spark.writer import WriteSpec

        reader = spark.read
        if args.format == "csv":
            # schema inferred against the existing table when present —
            # CSV has no types of its own
            import os

            if os.path.isdir(args.table_path):
                reader = reader.schema(spark.read.parquet(args.table_path).schema)
            else:
                reader = reader.option("inferSchema", "true")
            reader = reader.option("header", "true")
        if args.quarantine is not None:
            import os

            if args.format not in ("csv", "json"):
                print(json.dumps({"error": "--quarantine applies to csv/json"}))
                return 1
            if not os.path.isdir(args.table_path):
                print(json.dumps({"error": "--quarantine needs an existing table "
                                           "to declare the schema"}))
                return 1
            from columnar_spark.sources.readers import read_source_quarantined

            batch, bad = read_source_quarantined(
                spark, args.src, args.format,
                schema=spark.read.parquet(args.table_path).schema,
                quarantine_path=args.quarantine,
            )
            n_bad = bad.count()
        else:
            batch = getattr(reader, args.format)(args.src)
            n_bad = None
        spec = WriteSpec(
            cluster_by=tuple(args.cluster_by.split(",")) if args.cluster_by else ()
        )
        append_batch(batch, args.table_path, spec)
        out = {"appended": batch.count(), "dest": args.table_path}
        if n_bad is not None:
            out["quarantined"] = n_bad
        print(json.dumps(out))
        return 0

    if args.cmd == "check":
        from columnar_spark.writer import check_table

        errors = check_table(spark, args.table_path)
        print(json.dumps({"ok": not errors, "errors": errors}))
        return 1 if errors else 0

    if args.cmd == "stats":
        from columnar_spark.stats import load_manifest
        from columnar_spark.writer import stats_path

        man = load_manifest(spark, stats_path(args.table_path))
        print(json.dumps(man, default=str, indent=1))
        return 0

    if args.cmd == "compact":
        from columnar_spark.writer import compact_table

        result = compact_table(spark, args.table_path, rows_per_split=args.target_rows)
        print(json.dumps({"compacted": True, "result": str(result)}))
        return 0

    if args.cmd == "knn-build":
        from columnar_spark.operators.knn_index import build_vector_index

        df = spark.read.parquet(args.table_path)
        out = build_vector_index(
            spark, df, args.table_path, vec_col=args.vec_col,
            id_col=args.id_col, metric=args.metric, nlist=args.nlist,
        )
        print(json.dumps({"index": out}))
        return 0

    if args.cmd == "graph-build":
        from columnar_spark.operators.hnsw_index import build_graph_index

        df = spark.read.parquet(args.table_path)
        out = build_graph_index(
            spark, df, args.table_path, vec_col=args.vec_col,
            id_col=args.id_col, metric=args.metric,
            num_parts=args.num_parts, M=args.m,
        )
        print(json.dumps({"index": out}))
        return 0

    if args.cmd == "graph-query":
        from pyspark.sql import functions as F

        from columnar_spark.operators.hnsw_index import (
            knn_query_graph,
            load_graph_index_meta,
        )

        meta = load_graph_index_meta(args.table_path, vec_col=args.vec_col)
        if meta is None:
            print(json.dumps({"error": "no fresh graph index; run graph-build first"}))
            return 1
        if args.vec is not None:
            q = [float(x) for x in args.vec.split(",")]
            if len(q) != meta["dim"]:
                print(json.dumps({"error": f"vector has {len(q)} dims, index has {meta['dim']}"}))
                return 1
        else:
            df = spark.read.parquet(args.table_path)
            row = df.filter(F.col(meta["id_col"]) == args.id).select(meta["vec_col"]).first()
            if row is None:
                print(json.dumps({"error": f"id {args.id} not found"}))
                return 1
            q = [float(x) for x in row[0]]
        hits = knn_query_graph(
            spark, args.table_path, q, args.k, ef=args.ef, vec_col=args.vec_col
        )
        out = [
            {"id": r[meta["id_col"]], "dist": r["dist"]} for r in hits.collect()
        ]
        print(json.dumps(out))
        return 0

    if args.cmd == "knn-query":
        from pyspark.sql import functions as F

        from columnar_spark.operators.knn_index import (
            knn_query_indexed,
            load_vector_index,
        )

        idx = load_vector_index(args.table_path, vec_col=args.vec_col)
        if idx is None:
            print(json.dumps({"error": "no index; run knn-build first"}))
            return 1
        if args.vec is not None:
            q = [float(x) for x in args.vec.split(",")]
            if len(q) != idx.dim:
                print(json.dumps({"error": f"vector has {len(q)} dims, index has {idx.dim}"}))
                return 1
        else:
            df = spark.read.parquet(args.table_path)
            row = df.filter(F.col(idx.id_col) == args.id).select(idx.vec_col).first()
            if row is None:
                print(json.dumps({"error": f"id {args.id} not found"}))
                return 1
            q = [float(x) for x in row[0]]
        hits = knn_query_indexed(spark, idx, q, args.k, nprobe=args.nprobe)
        dist_col = "dist" if "dist" in hits.columns else "pq_dist"
        out = [
            {"id": r["id"], "dist": r[dist_col]}
            for r in hits.select("id", dist_col).collect()
        ]
        print(json.dumps(out))
        return 0

    if args.cmd == "vocab-monitor-init":
        from columnar_spark.streaming.vocab import init_vocab_monitor

        init_vocab_monitor(
            spark, args.table_path, text_col=args.text_col, force=args.force
        )
        print(json.dumps({"monitor": args.table_path + ".vocab", "text_col": args.text_col}))
        return 0

    if args.cmd == "vocab-report":
        from columnar_spark.streaming.vocab import vocab_report

        row = vocab_report(spark, args.table_path).collect()[0]
        print(json.dumps(row.asDict(), default=str))
        return 0

    if args.cmd == "corpus-stats":
        from columnar_spark.operators.collocations import (
            bigram_collocations,
            vocab_stats,
        )

        df = spark.read.parquet(args.table_path)
        out = vocab_stats(df, args.text_col).collect()[0].asDict()
        if args.top_collocations:
            out["collocations"] = [
                r.asDict()
                for r in bigram_collocations(
                    df, args.text_col, min_count=args.min_count, k=args.top_collocations
                ).collect()
            ]
        print(json.dumps(out, default=str))
        return 0

    if args.cmd == "bpe-train":
        from columnar_spark.operators.bpe import (
            bpe_fertility_stats,
            train_bpe,
            word_counts,
        )

        df = spark.read.parquet(args.table_path)
        merges = train_bpe(
            word_counts(df, args.text_col),
            n_merges=args.n_merges,
            min_pair_count=args.min_pair_count,
        )
        if args.out:
            with open(args.out, "w") as fh:
                json.dump([list(m) for m in merges], fh)
        res = {"n_merges_learned": len(merges), "out": args.out}
        if args.stats:
            res["fertility"] = bpe_fertility_stats(
                df, merges, args.text_col
            ).collect()[0].asDict()
        print(json.dumps(res, default=str))
        return 0

    if args.cmd == "sql":
        from columnar_spark.table import Engine

        eng = Engine(spark, args.sf_dir)
        # auto-discover: registers every *.parquet table actually present
        # (the fixed catalog list crashed on dirs carrying a subset)
        eng.register_views()
        rows = eng.sql(args.query).collect()
        for r in rows[:100]:
            print(json.dumps(r.asDict(), default=str))
        if len(rows) > 100:
            print(f"... {len(rows) - 100} more rows", file=sys.stderr)
        return 0

    return 2


if __name__ == "__main__":
    sys.exit(main())
