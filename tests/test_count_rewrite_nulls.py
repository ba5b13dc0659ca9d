"""ANSI three-valued logic on index-served rewrites: `col <> lit` must
NOT count NULL-key rows (NULL <> lit is NULL, not true). The engine's
exclude-filter semantics deliberately MATCH nulls (reference
CreateFilterExpr exclude flips the match), so the SQL->Filter
translation composes a NOTNULL conjunct — this pins Engine.sql ==
spark.sql on a table that actually has NULL keys."""

import pytest
from pyspark.sql import functions as F

from columnar_spark.table import Engine


@pytest.fixture(scope="module")
def nulleng(spark, tmp_path_factory):
    sf = str(tmp_path_factory.mktemp("nullsf"))
    rows = [
        (i, None if i % 5 == 0 else i % 7, None if i % 4 == 0 else f"s{i % 3}", float(i))
        for i in range(200)
    ]
    spark.createDataFrame(
        rows, "id: long, k: int, s: string, v: double"
    ).write.parquet(f"{sf}/t.parquet")
    eng = Engine(spark, sf)
    eng.register_views(["t"])
    eng.build_value_index("t", "k")
    eng.build_value_index("t", "s")
    return eng


@pytest.mark.parametrize(
    "sql",
    [
        "SELECT COUNT(*) AS n FROM t WHERE k <> 3",
        "SELECT COUNT(*) AS n FROM t WHERE k != 0",
        "SELECT COUNT(*) AS n FROM t WHERE s <> 's1'",
        "SELECT COUNT(*) AS n FROM t WHERE k <> 3 AND k <> 5",
        "SELECT COUNT(*) AS n FROM t WHERE k <> 2 AND k >= 1",
    ],
)
def test_not_equal_excludes_null_keys(nulleng, sql):
    got = nulleng.sql(sql).collect()
    want = nulleng.spark.sql(sql).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_not_equal_still_served_from_index(nulleng):
    """The NOTNULL conjunct keeps the query inside the covered grammar:
    the rewrite still fires (no base scan) AND gives the ANSI answer."""
    sql = "SELECT COUNT(*) AS n FROM t WHERE k <> 3"
    out = nulleng.sql(sql)
    assert out.first()["n"] == nulleng.spark.sql(sql).first()["n"]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "/t.parquet" not in plan, plan  # answered index-only


def test_group_count_not_equal_matches_spark(nulleng):
    sql = "SELECT k, COUNT(*) AS n FROM t WHERE k <> 3 GROUP BY k"
    got = sorted(map(tuple, nulleng.sql(sql).collect()))
    want = sorted(map(tuple, nulleng.spark.sql(sql).collect()))
    assert got == want
