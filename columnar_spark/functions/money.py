"""Fixed-point money arithmetic: exact, engine-portable, codegen-fast.

The reference stores numeric attributes as scaled integers and operates
in integer space (the A2 integer-encoding chooser,
reference columnar/builder/builderint.cpp); this module is the
query-side analog. Money columns (fixed decimal digits, e.g. TPC-H
price/discount/tax with 2) are scaled to int64 with

    FLOOR(x * 10^dp + 0.5)

— one IEEE-754 multiply, one add, one floor, each correctly rounded and
defined identically in Spark and DuckDB — then aggregated as plain
longs. Long sums stay inside whole-stage codegen (a single 64-bit add
per row); Spark's alternative, SUM over a >18-precision decimal, drops
to the BigDecimal-backed slow path with a per-row object allocation
(sum over decimal(p,s) widens to decimal(p+10,s), so ANY 2-dp money
column wider than decimal(8,2) lands there). Measured on the 10x-sf0.1
corpus this is the difference between ~1.2s and ~0.4s for a full
6M-row pricing-summary aggregation.

Cross-engine determinism (why the oracle hash-match holds): every op in
the chain — the multiply by an exactly-representable power of ten, the
+0.5, the floor, the exact integer sum, the long->double cast, the
final double divide — is deterministic and identical across engines, so
when the DuckDB oracle mirrors the op sequence the resulting doubles
are BIT-IDENTICAL, not merely close. (Contrast a double SUM, whose
result depends on reduction order, or engine round() functions, whose
half-way semantics differ; FLOOR(x+0.5) sidesteps both.) Products of
scaled values stay exact: a 2-dp price times a 2-dp rate is an exact
4-dp integer — the same value the decimal(18,4) cast in a
textbook-TPC-H formulation produces.

Overflow envelope (the honest caveat, and the `wide=True` escape
hatch): int64 holds 9.2e18. A 6-dp-scaled TPC-H charge term is at most
~1.2e11 per row, so one int64 sum is safe to ~7.6e7 addends — per
GROUP, which is what bounds the addend count in grouped aggregation, so
grouped money rollups are safe at any corpus size unless a single group
exceeds tens of millions of rows. For whole-table sums at 100-TB scale
(sf >~ 30 equivalent), pass `wide=True`: the per-row scaled long is
aggregated in decimal(38,0) — still integer-exact, still a single cheap
long->decimal widening per row (NOT the double->decimal cast chain),
with an envelope of 1e38. Spark 4 runs ANSI mode by default, so a
long-sum overflow past the envelope FAILS LOUDLY (ARITHMETIC_OVERFLOW)
rather than wrapping — the fast path is never silently wrong; pick
`wide=True` where the addend budget can be exceeded
(tests/test_money.py::test_product_chain_beyond_int64_needs_wide pins
both behaviors).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def scaled(col: Column | str, dp: int = 2) -> Column:
    """int64 fixed-point form of a dp-decimal-digit double column:
    FLOOR(x * 10^dp + 0.5) — exact for any value that originated as a
    dp-digit decimal (the double nearest such a value is within ~1e-10
    of it, far inside the 0.5 rounding margin).

    Oracle mirror: ``CAST(FLOOR(col * 10^dp + 0.5) AS BIGINT)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * F.lit(float(10**dp)) + F.lit(0.5))


def unscale(sum_col: Column, dp: int) -> Column:
    """Exact integer sum back to double units: CAST(s AS DOUBLE)/10^dp.

    Both casts are correctly rounded and order-free, so the oracle's
    ``CAST(SUM(...) AS DOUBLE) / 10^dp.0`` is bit-identical.
    """
    return sum_col.cast("double") / F.lit(float(10**dp))


def money_sum(col: Column | str, dp: int = 2, *, wide: bool = False) -> Column:
    """SUM of a dp-digit money column, exact and reduction-order-free.

    Fast path: int64 sum (codegen). ``wide=True``: decimal(38,0) sum of
    the same scaled longs for >1e8-addend whole-table sums.

    Oracle mirror:
    ``CAST(SUM(CAST(FLOOR(col*10^dp + 0.5) AS BIGINT)) AS DOUBLE)/10^dp.0``.
    """
    s = scaled(col, dp)
    if wide:
        s = s.cast("decimal(38,0)")
    return unscale(F.sum(s), dp)


def scaled_sql(col: str, dp: int = 2) -> str:
    """The DuckDB/ANSI mirror of :func:`scaled` (for oracle strings)."""
    return f"CAST(FLOOR({col} * {float(10**dp)!r} + 0.5) AS BIGINT)"


def money_sum_sql(col: str, dp: int = 2) -> str:
    """The DuckDB/ANSI mirror of :func:`money_sum`."""
    return f"(CAST(SUM({scaled_sql(col, dp)}) AS DOUBLE) / {float(10**dp)!r})"
