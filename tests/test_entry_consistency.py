"""Consistency of the three public query registries: the driver grades
queries()[:50], bench.py times BENCH_QUERIES, and oracle_sql() is the
correctness denominator — a rename or rotation that orphans an entry in
any of them silently shrinks a gate, so pin the invariants."""

import __spark_entry__ as E
from bench import BENCH_QUERIES


def test_all_bench_queries_are_declared():
    qs = E.queries()
    missing = [q for q in BENCH_QUERIES if q not in qs]
    assert not missing, missing


def test_driver_graded_50_all_oracle_bearing():
    qs, os_ = E.queries(), E.oracle_sql()
    first50 = list(qs)[:50]
    assert len(first50) == 50
    missing = [q for q in first50 if q not in os_]
    assert not missing, missing


def test_every_oracle_has_a_query_and_no_empty_sql():
    qs, os_ = E.queries(), E.oracle_sql()
    assert set(os_) <= set(qs)
    assert all(isinstance(s, str) and s.strip() for s in os_.values())


def test_priority_list_has_no_unknown_or_duplicate_names():
    qs = E.queries()
    seen = set()
    for name in E._DRIVER_PRIORITY:
        assert name in qs, f"_DRIVER_PRIORITY names unknown query {name}"
        assert name not in seen, f"duplicate in _DRIVER_PRIORITY: {name}"
        seen.add(name)
