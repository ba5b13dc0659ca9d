"""Seeded differential fuzz of the daemon SQL surface — MATCH (boolean
DSL), FACET (plain and MATCH-combined), CALL KEYWORDS — under one
driver, with EXPLAIN-safety asserted for every generated statement: a
read-only statement EXPLAINs to a plan frame without changing the
table; a generated mutating statement is refused by the EXPLAIN
allowlist and leaves contents untouched (the f1ea794/776d3e8 bug
class from the round-5 review, now fuzzed instead of example-pinned)."""

import random
import re

import pytest
from pyspark.sql import functions as F

from columnar_spark.operators.fulltext import (
    TOKEN_SPLIT_RE,
    match_boolean_reference,
)
from columnar_spark.table import Engine

VOCAB = ["scan", "vector", "index", "spark", "query", "merge", "shard", "graph"]
LANGS = ["en", "de", "fr", "pt"]


def _mk_corpus(spark, tmp_path, rng, n=60):
    rows = []
    for i in range(n):
        words = [rng.choice(VOCAB) for _ in range(rng.randrange(3, 9))]
        rows.append((i, " ".join(words), rng.choice(LANGS), rng.randrange(3)))
    p = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        rows, "doc_id: long, text: string, lang: string, grp: int"
    ).write.parquet(p)
    return rows, p


def _rand_bool_query(rng, depth=0):
    r = rng.random()
    if depth >= 2 or r < 0.4:
        return rng.choice(VOCAB)
    a = _rand_bool_query(rng, depth + 1)
    b = _rand_bool_query(rng, depth + 1)
    if r < 0.6:
        return f"({a} AND {b})"
    if r < 0.8:
        return f"({a} OR {b})"
    return f"({a} AND NOT {b})"


def _facet_reference(rows, cols, pred, limit=None):
    """Python twin of the plain-FACET frame."""
    keep = [r for r in rows if pred(r)]
    out = []
    for c in cols:
        idx = {"lang": 2, "grp": 3}[c]
        counts = {}
        for r in keep:
            counts[str(r[idx])] = counts.get(str(r[idx]), 0) + 1
        vals = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if limit is not None:
            vals = vals[:limit]
        out.extend((c, v, n) for v, n in vals)
    return sorted(out)


@pytest.mark.parametrize("seed", [17, 83])
def test_daemon_surface_fuzz(spark, tmp_path, seed):
    rng = random.Random(seed)
    rows, p = _mk_corpus(spark, tmp_path / str(seed), rng)
    eng = Engine(spark, str(tmp_path / str(seed)))
    eng.register_views(["docs"])
    docs = [(i, t) for i, t, _l, _g in rows]

    def table_state():
        return sorted(tuple(r) for r in spark.read.parquet(p).collect())

    baseline = table_state()

    for i in range(12):
        fam = rng.randrange(4)
        if fam == 0:
            # boolean MATCH DSL vs the python reference evaluator
            q = _rand_bool_query(rng)
            stmt = (
                f"SELECT doc_id FROM docs WHERE MATCH('{q}') "
                "LIMIT 500 OPTION mode=boolean"
            )
            got = sorted(r["doc_id"] for r in eng.sql(stmt).collect())
            want = sorted(match_boolean_reference(docs, q))
            assert got == want, (q, got[:10], want[:10])
        elif fam == 1:
            # plain FACET [WHERE pred] [LIMIT n]
            cols = rng.sample(["lang", "grp"], rng.randrange(1, 3))
            use_pred = rng.random() < 0.5
            lim = rng.choice([None, 1, 2])
            pred_sql = "grp >= 1" if use_pred else None
            stmt = "SELECT * FROM docs "
            if pred_sql:
                stmt += f"WHERE {pred_sql} "
            stmt += "FACET " + ", ".join(cols)
            if lim is not None:
                stmt += f" LIMIT {lim}"
            got = sorted(
                (r["facet"], r["value"], r["cnt"]) for r in eng.sql(stmt).collect()
            )
            want = _facet_reference(
                rows, cols, (lambda r: r[3] >= 1) if use_pred else (lambda r: True),
                limit=lim,
            )
            # LIMIT keeps top-n by (cnt desc, value asc) per facet; the
            # returned frame is value-ordered — compare as sets of rows
            assert sorted(got) == sorted(want), (stmt, got, want)
        elif fam == 2:
            # MATCH + FACET: facet counts over the any-term match set
            terms = rng.sample(VOCAB, rng.randrange(1, 3))
            stmt = (
                f"SELECT * FROM docs WHERE MATCH('{' '.join(terms)}') FACET lang"
            )
            got = sorted(
                (r["facet"], r["value"], r["cnt"]) for r in eng.sql(stmt).collect()
            )
            tset = set(terms)
            keep = [
                r for r in rows
                if tset & {t for t in re.split(TOKEN_SPLIT_RE, r[1].lower()) if t}
            ]
            counts = {}
            for r in keep:
                counts[r[2]] = counts.get(r[2], 0) + 1
            want = sorted(("lang", v, n) for v, n in counts.items())
            assert got == want, (stmt, got, want)
        else:
            # CALL KEYWORDS echoes tokens with their normalized forms
            words = [rng.choice(VOCAB).upper() for _ in range(rng.randrange(1, 4))]
            stmt = f"CALL KEYWORDS('{' '.join(words)}', 'docs')"
            got = [(r["keyword"], r["normalized"]) for r in eng.sql(stmt).collect()]
            assert got == [(w, w.lower()) for w in words], stmt

        # EXPLAIN safety for the exact statement just fuzzed: a plan
        # frame comes back and nothing in the table moved
        plan = eng.sql(f"EXPLAIN {stmt}").first()["plan"]
        assert plan and isinstance(plan, str)
        assert table_state() == baseline

    # generated MUTATING statements: EXPLAIN refuses them (allowlist)
    # and the refusal executes nothing
    for stmt in [
        f"DELETE FROM docs WHERE grp = {rng.randrange(3)}",
        "UPDATE docs SET lang = 'xx' WHERE grp = 1",
        "INSERT INTO docs VALUES (999, 'zz', 'en', 0)",
        "TRUNCATE TABLE docs",
        "FROBNICATE docs",  # unknown verb: refused by default
    ]:
        with pytest.raises(ValueError):
            eng.sql(f"EXPLAIN {stmt}")
        assert table_state() == baseline

    # WEIGHT() outside bm25 mode stays loudly refused under fuzz inputs
    with pytest.raises(ValueError, match="WEIGHT|bm25"):
        eng.sql(
            "SELECT doc_id, WEIGHT() FROM docs WHERE MATCH('scan') "
            "OPTION mode=boolean"
        )
