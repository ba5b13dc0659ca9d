"""Differential fuzz for Engine.sql DML: seeded random DELETE/UPDATE/
INSERT statements run against the CoW parquet table AND against DuckDB
on identical starting data — final table contents must match exactly
(NULL predicate semantics, old-value assignment visibility, positional
INSERT binds). The grammar sticks to ANSI shared by both engines;
division is excluded (the engines round double->int differently)."""

import random

import duckdb
import pytest

ROWS = 40


def _mk_rows(rng):
    vals = ["a", "b", "c", None]
    return [
        (i, rng.choice(vals), rng.choice([None, 0, 5, 10, 25, 100]))
        for i in range(ROWS)
    ]


def _stmt(rng, i):
    preds = [
        "v > 10",
        "v <= 5",
        "c = 'b'",
        "c <> 'a'",
        "c IS NULL",
        "v IS NOT NULL AND c = 'c'",
        f"id % 7 = {rng.randrange(7)}",
        "v + id > 30",
    ]
    kind = rng.random()
    if kind < 0.4:
        return f"DELETE FROM t WHERE {rng.choice(preds)}"
    if kind < 0.8:
        sets = [
            "v = v + 1",
            "v = coalesce(v, 0) * 2",
            "c = upper(c)",
            "v = id * 2, id = id + 1000",
            "c = CASE WHEN v > 10 THEN 'hi' ELSE 'lo' END",
        ]
        where = rng.choice(["", f" WHERE {rng.choice(preds)}"])
        return f"UPDATE t SET {rng.choice(sets)}{where}"
    return (
        f"INSERT INTO t VALUES ({1000 + i}, 'z', {rng.randrange(50)}), "
        f"({2000 + i}, NULL, NULL)"
    )


@pytest.mark.parametrize("seed", [11, 29, 47])
def test_dml_matches_duckdb(spark, tmp_path, seed):
    from columnar_spark.table import Engine

    rng = random.Random(seed)
    rows = _mk_rows(rng)
    p = str(tmp_path / "t.parquet")
    spark.createDataFrame(rows, "id int, c string, v int").write.parquet(p)
    eng = Engine(spark, str(tmp_path))
    eng.register_views(["t"])

    con = duckdb.connect()
    con.execute("CREATE TABLE t (id int, c varchar, v int)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)

    for i in range(10):
        stmt = _stmt(rng, i)
        eng.sql(stmt)
        con.execute(stmt)
        mine = sorted(
            tuple(r) for r in spark.read.parquet(p).collect()
        )
        theirs = sorted(tuple(r) for r in con.execute("SELECT * FROM t").fetchall())
        assert mine == theirs, (stmt, mine[:5], theirs[:5])


def _ddl_stmt(rng, i, added):
    """Stateful DDL/DML grammar: ALTER/TRUNCATE mixed into the DML ops,
    with INSERT arity tracking the live column set."""
    preds = ["v > 10", "c = 'b'", "c IS NULL", f"id % 5 = {rng.randrange(5)}"]
    k = rng.random()
    if k < 0.15 and len(added) < 3:
        name = f"w{i}"
        added.append(name)
        return f"ALTER TABLE t ADD COLUMN {name} int DEFAULT {rng.randrange(9)}"
    if k < 0.25 and added:
        name = added.pop(rng.randrange(len(added)))
        return f"ALTER TABLE t DROP COLUMN {name}"
    if k < 0.32:
        return "TRUNCATE TABLE t"
    if k < 0.6:
        return f"DELETE FROM t WHERE {rng.choice(preds)}"
    if k < 0.85:
        sets = ["v = v + 1", "c = upper(c)"]
        if added:
            sets.append(f"{rng.choice(added)} = id % 3")
        where = rng.choice(["", f" WHERE {rng.choice(preds)}"])
        return f"UPDATE t SET {rng.choice(sets)}{where}"
    extra = "".join(f", {rng.randrange(9)}" for _ in added)
    return f"INSERT INTO t VALUES ({1000 + i}, 'z', {rng.randrange(50)}{extra})"


@pytest.mark.parametrize("seed", [3, 61])
def test_ddl_dml_sequences_match_duckdb(spark, tmp_path, seed):
    """ALTER ADD/DROP COLUMN, TRUNCATE, DELETE/UPDATE/INSERT interleaved:
    the CoW table must track DuckDB's contents AND schema through every
    sequence (new columns backfill their DEFAULT, drops remove keyed
    indexes, truncate keeps the schema)."""
    from columnar_spark.table import Engine

    rng = random.Random(seed)
    rows = _mk_rows(rng)
    p = str(tmp_path / "t.parquet")
    spark.createDataFrame(rows, "id int, c string, v int").write.parquet(p)
    eng = Engine(spark, str(tmp_path))
    eng.register_views(["t"])

    con = duckdb.connect()
    con.execute("CREATE TABLE t (id int, c varchar, v int)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)

    added: list = []
    for i in range(12):
        stmt = _ddl_stmt(rng, i, added)
        eng.sql(stmt)
        # DuckDB's TRUNCATE spelling differs; contents-equivalent form
        con.execute("DELETE FROM t" if stmt.startswith("TRUNCATE") else stmt)
        df = spark.read.parquet(p)
        assert df.columns == [d[0] for d in con.execute("SELECT * FROM t LIMIT 0").description], stmt
        mine = sorted(tuple(r) for r in df.collect())
        theirs = sorted(tuple(r) for r in con.execute("SELECT * FROM t").fetchall())
        assert mine == theirs, (i, stmt, mine[:3], theirs[:3])
