"""Sequence packing: next-fit reference parity on one partition,
capacity/coverage/contiguity invariants on many, oversized-doc handling,
and a hypothesis fuzz of the single-partition path."""

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from columnar_spark.operators.pack import pack_sequences


def _next_fit(sizes, budget):
    """Python reference: list of (bin, offset) in input order."""
    out, b, used, opened = [], 0, 0, False
    for s in sizes:
        if opened and used + s > budget:
            b, used = b + 1, 0
        opened = True
        out.append((b, used))
        used += s
    return out


def _collect(spark, sizes, budget, parts=1):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(sizes)], "doc_id: long, n_tok: long"
    )
    rows = pack_sequences(df, "doc_id", "n_tok", budget, num_partitions=parts).collect()
    return sorted((r["doc_id"], r["bin_id"], r["offset"]) for r in rows)


def test_single_partition_matches_reference(spark):
    sizes = [100, 200, 300, 50, 500, 10, 512, 1, 1]
    got = _collect(spark, sizes, budget=512)
    want = _next_fit(sizes, 512)
    base = got[0][1] - want[0][0]  # partition base offset
    assert [(b - base, o) for _, b, o in got] == want


def test_invariants_multi_partition(spark):
    sizes = [37 * (i % 13) + 1 for i in range(500)]
    rows = _collect(spark, sizes, budget=256, parts=8)
    assert len(rows) == 500  # every doc assigned exactly once
    by_bin = {}
    for doc, b, off in rows:
        by_bin.setdefault(b, []).append((off, sizes[doc]))
    for b, items in by_bin.items():
        items.sort()
        total = sum(s for _, s in items)
        assert total <= 256 or len(items) == 1  # capacity (oversized alone)
        # offsets lay out contiguously
        pos = 0
        for off, s in items:
            assert off == pos
            pos += s


def test_oversized_doc_gets_own_bin(spark):
    rows = _collect(spark, [10, 9999, 10], budget=100)
    bins = [b for _, b, _ in rows]
    assert bins[0] != bins[1] and bins[1] != bins[2]
    assert [o for _, _, o in rows] == [0, 0, 0]


@settings(max_examples=15, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=600), min_size=1, max_size=60),
       st.integers(min_value=1, max_value=512))
def test_fuzz_single_partition(spark, sizes, budget):
    got = _collect(spark, sizes, budget)
    want = _next_fit(sizes, budget)
    base = got[0][1] - want[0][0]
    assert [(b - base, o) for _, b, o in got] == want


def test_carry_state_across_arrow_batches(spark):
    """The next-fit carry (open bin + used tokens) must survive Arrow
    batch boundaries within a partition: force tiny batches and compare
    against the single-batch reference."""
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key, None)
    spark.conf.set(key, "16")
    try:
        sizes = [23 * (i % 11) + 1 for i in range(400)]
        got = _collect(spark, sizes, budget=200)
        want = _next_fit(sizes, 200)
        base = got[0][1] - want[0][0]
        assert [(b - base, o) for _, b, o in got] == want
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)
