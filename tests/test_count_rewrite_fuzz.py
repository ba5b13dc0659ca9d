"""Differential fuzzing of the index-covered COUNT rewrite: for random
covered-grammar predicates, Engine.sql's index-answered count must equal
spark.sql's plain-plan count on the same view. A wrong rewrite is a
silent correctness bug, so the parser/compiler is held to the ground
truth, not to its own expectations."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from columnar_spark.table import Engine

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def eng2(spark):
    e = Engine(spark, SF)
    e.register_views(["lineitem"])
    e.build_value_index("lineitem", "l_linenumber")
    e.build_value_index("lineitem", "l_returnflag")
    return e


_num_lit = st.integers(min_value=-2, max_value=9)
_str_lit = st.sampled_from(["A", "N", "R", "Z", ""])


def _num_term(col: str):
    return st.one_of(
        st.tuples(st.sampled_from(["=", "<>", "!=", "<", "<=", ">", ">="]), _num_lit).map(
            lambda t: f"{col} {t[0]} {t[1]}"
        ),
        st.lists(_num_lit, min_size=1, max_size=4).map(
            lambda vs: f"{col} IN ({', '.join(map(str, vs))})"
        ),
        st.tuples(_num_lit, _num_lit).map(lambda t: f"{col} BETWEEN {t[0]} AND {t[1]}"),
        st.just(f"{col} IS NOT NULL"),
    )


def _str_term(col: str):
    return st.one_of(
        st.tuples(st.sampled_from(["=", "<>"]), _str_lit).map(
            lambda t: f"{col} {t[0]} '{t[1]}'"
        ),
        st.lists(_str_lit, min_size=1, max_size=3).map(
            lambda vs: f"{col} IN ({', '.join(repr(v) for v in vs)})"
        ),
        st.just(f"{col} IS NOT NULL"),
    )


@st.composite
def covered_query(draw):
    col, term_gen = draw(
        st.sampled_from(
            [("l_linenumber", _num_term), ("l_returnflag", _str_term)]
        )
    )
    n_terms = draw(st.integers(min_value=1, max_value=3))
    terms = [draw(term_gen(col)) for _ in range(n_terms)]
    alias = draw(st.sampled_from(["n", "cnt"]))
    return f"SELECT COUNT(*) AS {alias} FROM lineitem WHERE {' AND '.join(terms)}", alias


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=covered_query())
def test_rewritten_count_matches_plain_plan(eng2, q):
    sql, alias = q
    rewritten = eng2.sql(sql).first()[alias]
    plain = eng2.spark.sql(sql).first()[alias]
    assert rewritten == plain, sql
    # and the rewrite actually fired (index path, no base relation)
    plan = eng2.sql(sql)._jdf.queryExecution().executedPlan().toString()
    assert "lineitem.parquet" not in plan, sql


@st.composite
def covered_group_query(draw):
    col, term_gen = draw(
        st.sampled_from(
            [("l_linenumber", _num_term), ("l_returnflag", _str_term)]
        )
    )
    n_terms = draw(st.integers(min_value=0, max_value=2))
    terms = [draw(term_gen(col)) for _ in range(n_terms)]
    where = f" WHERE {' AND '.join(terms)}" if terms else ""
    return f"SELECT {col}, COUNT(*) AS n FROM lineitem{where} GROUP BY {col}", col


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=covered_group_query())
def test_rewritten_group_count_matches_plain_plan(eng2, q):
    sql, col = q
    got = sorted(map(tuple, eng2.sql(sql).collect()))
    want = sorted(map(tuple, eng2.spark.sql(sql).collect()))
    assert got == want, sql
    plan = eng2.sql(sql)._jdf.queryExecution().executedPlan().toString()
    assert "lineitem.parquet" not in plan, sql


# ------------------------------------------------ JSON per-field fuzz

@pytest.fixture(scope="module")
def eng_json(spark):
    e = Engine(spark, SF)
    e.register_views(["events"])
    e.build_json_field_index("events", "props", "$.k")
    return e


_json_lit = st.sampled_from(["0", "7", "12", "99", "100", "zzz", ""])


def _json_term(draw_col: str):
    expr = f"get_json_object(props, '$.k')"
    return st.one_of(
        st.tuples(st.sampled_from(["=", "<>"]), _json_lit).map(
            lambda t: f"{expr} {t[0]} '{t[1]}'"
        ),
        st.lists(_json_lit, min_size=1, max_size=3).map(
            lambda vs: f"{expr} IN ({', '.join(repr(v) for v in vs)})"
        ),
        st.just(f"{expr} IS NOT NULL"),
    )


@st.composite
def covered_json_query(draw):
    n_terms = draw(st.integers(min_value=1, max_value=2))
    terms = [draw(_json_term("props")) for _ in range(n_terms)]
    return f"SELECT COUNT(*) AS n FROM events WHERE {' AND '.join(terms)}"


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sql=covered_json_query())
def test_rewritten_json_field_count_matches_plain_plan(eng_json, sql):
    """get_json_object predicates normalize into the virtual-column
    convention and answer from the per-field index — ground truth is the
    plain plan evaluating the same expression over the base table."""
    rewritten = eng_json.sql(sql).first()["n"]
    plain = eng_json.spark.sql(sql).first()["n"]
    assert rewritten == plain, sql
    plan = eng_json.sql(sql)._jdf.queryExecution().executedPlan().toString()
    assert "events.parquet" not in plan, sql
