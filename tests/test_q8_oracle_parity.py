"""Cross-engine determinism of the q8 quantization arithmetic: the
python build-side levels (hnsw_index._q8_levels), the at-rest int8
roundtrip, and the DuckDB SQL the oracle uses must agree bit-for-bit on
random vectors and bounds — this is the foundation the knn_graph_l2_q8
hash oracle stands on (floor((clip(x)-lo)*255/(hi-lo)+0.5) evaluated in
IEEE float64 the same way everywhere)."""

import duckdb
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from columnar_spark.operators.hnsw_index import (
    _q8_bytes_to_levels,
    _q8_levels,
    _q8_levels_to_bytes,
)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-50, max_value=50, allow_nan=False, width=32),
        min_size=4,
        max_size=64,
    ),
    st.floats(min_value=-10, max_value=0, allow_nan=False),
    st.floats(min_value=0.5, max_value=10, allow_nan=False),
)
def test_q8_levels_match_duckdb_sql(vec, lo, hi):
    got = _q8_levels(vec, lo, hi)
    con = duckdb.connect()
    want = con.execute(
        "SELECT list_transform($vec::DOUBLE[], x -> "
        "floor((least(greatest(x, $lo), $hi) - $lo)"
        " * (255.0 / ($hi - $lo)) + 0.5))",
        {"vec": [float(x) for x in vec], "lo": lo, "hi": hi},
    ).fetchone()[0]
    assert [float(x) for x in got] == [float(x) for x in want], (lo, hi)
    # levels are exactly representable: at-rest int8 roundtrip is lossless
    assert (_q8_bytes_to_levels(_q8_levels_to_bytes(got)) == got).all()
    # level-space squared L2 sums are exact integers (the walk's
    # summation-order-free determinism)
    q = _q8_levels([0.0] * len(vec), lo, hi)
    d = got.astype(np.float64) - q.astype(np.float64)
    s = float(np.dot(d, d))
    assert s == int(s)
