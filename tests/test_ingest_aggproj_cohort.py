"""End-to-end: the ledgered ingest path (append_batch) must maintain
the round-9 sidecars — aggregate projections (both delta directions)
and the cohort matrix — exactly: after every append the artifacts stay
FRESH (signatures re-recorded) and their merged contents equal a live
recompute; a replayed batch is a no-op; crash recovery rebuilds them."""

import json
import os

import pytest
from pyspark.sql import functions as F

from columnar_spark.aggprojections import (
    agg_projection_meta,
    check_agg_projection,
    load_agg_projection,
    write_agg_projection,
)
from columnar_spark.operators.cohort import (
    check_cohort_sidecar,
    load_cohort_matrix,
    write_cohort_sidecar,
)
from columnar_spark.streaming.ingest import append_batch

SF = "/root/testdata/sf0.001"

KEYS = {"l_orderkey": "l_orderkey", "o_orderdate": "o_orderdate"}
MEASURES = [
    {"name": "cnt", "agg": "count"},
    {"name": "qty2", "agg": "sum",
     "expr": "CAST(FLOOR(l_quantity * 100.0 + 0.5) AS BIGINT)"},
]
ENRICH = ({"table": "orders.parquet", "left_on": "l_orderkey",
           "right_on": "o_orderkey", "cols": {"o_orderdate": "o_orderdate"}},)


def test_ledgered_append_maintains_agg_and_cohort(spark, tmp_path):
    d = tmp_path
    li = str(d / "lineitem.parquet")
    orders = str(d / "orders.parquet")
    events = str(d / "events.parquet")
    src_li = spark.read.parquet(f"{SF}/lineitem.parquet")
    src_or = spark.read.parquet(f"{SF}/orders.parquet")
    src_ev = spark.read.parquet(f"{SF}/events.parquet")
    src_li.filter(F.col("l_orderkey") % 5 != 0).write.parquet(li)
    src_or.filter(F.col("o_orderkey") % 9 != 0).write.parquet(orders)
    src_ev.filter(F.col("event_id") % 3 == 0).write.parquet(events)

    write_agg_projection(spark, li, name="p", keys=KEYS, measures=MEASURES,
                         enrich=ENRICH)
    write_cohort_sidecar(spark, events)

    # fact-side ledgered append -> agg partials fold, artifact stays fresh
    li_delta = src_li.filter(F.col("l_orderkey") % 5 == 0)
    assert append_batch(li_delta, li, batch_id=1) is True
    got = load_agg_projection(spark, li, "p")
    assert got is not None, "agg projection went stale after its own append"
    assert agg_projection_meta(li, "p")["compacted"] is False
    assert check_agg_projection(spark, li, "p") == []

    # replay of the same batch: complete no-op (ledger), still fresh
    assert append_batch(li_delta, li, batch_id=1) is False
    assert load_agg_projection(spark, li, "p") is not None
    assert check_agg_projection(spark, li, "p") == []

    # enrichment-side ledgered append (orders) -> source x Δdim fold
    or_delta = src_or.filter(F.col("o_orderkey") % 9 == 0)
    assert append_batch(or_delta, orders, batch_id=2) is True
    assert load_agg_projection(spark, li, "p") is not None
    assert check_agg_projection(spark, li, "p") == []

    # events ledgered append -> cohort correction fold
    ev_delta = src_ev.filter(F.col("event_id") % 3 == 1)
    assert append_batch(ev_delta, events, batch_id=3) is True
    m = load_cohort_matrix(spark, events)
    assert m is not None, "cohort matrix went stale after its own append"
    assert check_cohort_sidecar(spark, events) == []

    # crash recovery: a dangling inflight marker forces the rebuild path,
    # which must leave both artifacts fresh and exact
    lp = os.path.join(events + ".ingest", "meta.json")
    led = json.load(open(lp))
    led["inflight"] = "99"
    json.dump(led, open(lp, "w"))
    ev_delta2 = src_ev.filter(F.col("event_id") % 3 == 2)
    assert append_batch(ev_delta2, events, batch_id=4) is True
    assert load_cohort_matrix(spark, events) is not None
    assert check_cohort_sidecar(spark, events) == []
