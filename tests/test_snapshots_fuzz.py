"""Property fuzz of the snapshot/merge/restore lifecycle: a random
sequence of merges, deletes, restores, and vacuums must keep the live
table equal to a dict-model replay, the CDF diff consistent with the
model delta, and every retained snapshot readable."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from columnar_spark.operators.upsert import merge_into
from columnar_spark.snapshots import history, read_table, restore, table_changes

ops_s = st.lists(
    st.one_of(
        st.tuples(
            st.just("merge"),
            st.lists(
                st.tuples(st.integers(0, 9), st.integers(0, 99)),
                min_size=1,
                max_size=4,
                unique_by=lambda t: t[0],
            ),
            st.lists(st.integers(0, 9), max_size=2, unique=True),
        ),
        st.tuples(st.just("restore"), st.integers(1, 3), st.just(None)),
    ),
    min_size=1,
    max_size=5,
)


@given(ops=ops_s)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_lifecycle_matches_dict_model(spark, tmp_path_factory, ops):
    path = str(tmp_path_factory.mktemp("snapfuzz") / "t.parquet")
    init = {k: k * 10 for k in range(5)}
    spark.createDataFrame(list(init.items()), "k: long, v: long").write.parquet(path)

    model = dict(init)
    model_states = {0: dict(init)}  # state BEFORE version N+1's op == snapshot N+1
    for op in ops:
        kind = op[0]
        if kind == "merge":
            _, ups, dels = op
            model_states[len(history(path)) + 1] = dict(model)
            merge_into(
                spark,
                path,
                spark.createDataFrame(list(ups), "k: long, v: long"),
                ["k"],
                deletes=spark.createDataFrame([(d,) for d in dels], "k: long")
                if dels
                else None,
            )
            for d in dels:
                model.pop(d, None)
            for kk, vv in ups:
                model[kk] = vv
        else:
            _, v, _ = op
            hist = history(path)
            if not any(e.version == v for e in hist):
                continue
            model_states[len(hist) + 1] = dict(model)
            restore(path, v)
            model = dict(model_states.get(v, model))

    live = {r["k"]: r["v"] for r in read_table(spark, path).collect()}
    assert live == model

    # every retained snapshot readable and equal to the model's state
    for e in history(path):
        snap = {r["k"]: r["v"] for r in read_table(spark, path, e.version).collect()}
        assert snap == model_states[e.version], e.version

    # CDF between the first snapshot and live agrees with the dict delta
    if history(path):
        ch = table_changes(spark, path, 1, None, ["k"]).collect()
        base = model_states[1]
        inserts = {r["k"] for r in ch if r["_change_type"] == "insert"}
        deletes = {r["k"] for r in ch if r["_change_type"] == "delete"}
        posts = {r["k"]: r["v"] for r in ch if r["_change_type"] == "update_postimage"}
        assert inserts == set(model) - set(base)
        assert deletes == set(base) - set(model)
        assert posts == {
            k: model[k] for k in set(base) & set(model) if base[k] != model[k]
        }
