"""Fold fresh 10x captures into BENCH_SCALE.json: reads the bench.py
JSON line (spark side) and the bench_oracle.py JSON summary (duckdb
side) from files, recomputes per-query ratios and headline totals
(ratio_all and ratio_excluding the semantic_decontaminate outlier),
bumps `round`, and preserves history/notes/distributed_path.

Usage: python tools/update_bench_scale.py <spark.json> <duck.json> <round>
"""

import json
import sys

spark_path, duck_path, rnd = sys.argv[1], sys.argv[2], int(sys.argv[3])
spark = json.loads([l for l in open(spark_path) if l.strip().startswith("{")][-1])
duck = json.loads([l for l in open(duck_path) if l.strip().startswith("{")][-1])
duck_q = duck.get("queries", duck)

p = "/root/repo/BENCH_SCALE.json"
d = json.load(open(p))

per = {}
no_oracle = []
for q, s in sorted(spark["queries"].items()):
    dd = duck_q.get(q)
    if dd is None:
        no_oracle.append(q)
        continue
    per[q] = {"spark_sec": round(s, 3), "duckdb_sec": round(dd, 3),
              "ratio": round(s / dd, 2) if dd else None}

OUTLIER = "semantic_decontaminate"
sp_all = sum(v["spark_sec"] for v in per.values())
du_all = sum(v["duckdb_sec"] for v in per.values())
sp_ex = sp_all - per.get(OUTLIER, {}).get("spark_sec", 0)
du_ex = du_all - per.get(OUTLIER, {}).get("duckdb_sec", 0)

prev_round = d.get("round")
hist = d.setdefault("history", {})
hist[f"r{prev_round}_final_tree"] = {
    "ratio_all": d["headline"]["oracle_subset_ratio_all"],
    "ratio_excl": d["headline"]["oracle_subset_ratio_excluding_duckdb_outlier"],
    "spark_total_sec": d["headline"].get("spark_total_sec_all"),
    "note": "see git history of this file for the full capture",
}
d["round"] = rnd
d["headline"] = {
    "oracle_subset_ratio_all": round(sp_all / du_all, 3),
    "oracle_subset_ratio_excluding_duckdb_outlier": round(sp_ex / du_ex, 3),
    "gate": "<=2.0 measured",
    "spark_total_sec_all": round(sp_all, 2),
    "duckdb_total_sec_all": round(du_all, 2),
    "spark_total_sec_excl": round(sp_ex, 2),
    "duckdb_total_sec_excl": round(du_ex, 2),
    "n_oracle_queries": len(per),
}
d["spark_bench_total_sec_61_queries"] = spark["value"]
d.pop("spark_bench_total_sec_60_queries", None)
d["spark_concurrent_8threads_sec"] = spark.get("concurrent_total_sec")
d["sched_floor_sec_per_query"] = spark.get("sched_floor_sec_per_query")
d["no_oracle_queries"] = sorted(no_oracle)
d["per_query"] = per

json.dump(d, open(p, "w"), indent=1)
print(json.dumps({"ratio_all": d["headline"]["oracle_subset_ratio_all"],
                  "ratio_excl": d["headline"]["oracle_subset_ratio_excluding_duckdb_outlier"],
                  "spark_all": round(sp_all, 2), "duck_all": round(du_all, 2),
                  "n": len(per)}))
