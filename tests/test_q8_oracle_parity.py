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


def test_q8_walk_dtype_upcasts_past_float32_exactness():
    """ADVICE r8: float32 np.dot keeps level-space sums exact only while
    dim * 255^2 < 2^24 (dim <= 258). Past that the walk space must be
    float64 or the bit-for-bit SQL-oracle parity silently degrades."""
    from columnar_spark.operators.hnsw_index import _q8_walk_dtype

    assert _q8_walk_dtype(64) == np.float32
    assert _q8_walk_dtype(258) == np.float32  # 258*255^2 < 2^24: still exact
    assert _q8_walk_dtype(259) == np.float64
    assert _q8_walk_dtype(1536) == np.float64

    # construct the adversarial case: dim=1024, all-255-vs-all-0 levels.
    # exact squared L2 = 1024 * 255^2 = 66,585,600 > 2^24 — float32
    # accumulation would round; the shipped float64 path must be exact.
    dim = 1024
    a = _q8_levels([50.0] * dim, -1.0, 1.0)   # clips to hi -> level 255
    b = _q8_levels([-50.0] * dim, -1.0, 1.0)  # clips to lo -> level 0
    assert a.dtype == np.float64 and b.dtype == np.float64
    d = a - b
    assert float(np.dot(d, d)) == dim * 255 * 255
    # at-rest roundtrip preserves the float64 walk dtype
    back = _q8_bytes_to_levels(_q8_levels_to_bytes(a))
    assert back.dtype == np.float64 and (back == a).all()
    # and the HnswIndex walk array keeps float64 (no silent downcast)
    from columnar_spark.operators.hnsw_py import _walk_array

    assert _walk_array(a).dtype == np.float64
    assert _walk_array([1.0, 2.0]).dtype == np.float32  # default unchanged
