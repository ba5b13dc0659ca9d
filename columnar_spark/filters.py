"""The engine's pushed-down filter surface.

Reference parity: this module re-expresses the complete predicate model MCL
accepts for pushdown — `common::Filter_t` (reference common/filter.h:48-68)
with types VALUES / RANGE / FLOATRANGE / STRINGS / NOTNULL (filter.h:28-36),
per-filter exclude (filter.h:51), MVA quantifiers NONE/ALL/ANY (filter.h:39-44),
and independently open/closed/unbounded interval bounds (common/interval.h:24-52,
all 16 shapes). Type fixups mirror `FixupFilterSettings`
(common/filter.cpp:25-68): integer filters on float columns become float
ranges; out-of-domain bounds on unsigned columns clamp to unbounded.

Spark-first design: a Filter compiles to a single Catalyst `Column`
expression built only from built-in functions, so predicate pushdown,
Parquet row-group/page pruning (the reference's zone maps,
columnar/builder/builderminmax.h) and whole-stage codegen all apply for
free. There is no custom evaluation engine here on purpose — the
reference's analyzer machinery (columnar/accessor/accessortraits.h:104-276)
is *replaced* by Catalyst + the vectorized Parquet reader, and our job is
semantic parity, verified differentially against DuckDB.

Null semantics (documented engine choice): the reference has no null bitmap
(SURVEY §1.1); nulls are host-managed. This engine defines: a null value
never matches an inclusive filter, and *does* match the exclude form
(matches = coalesce(pred, false); exclude = NOT matches). NOTNULL is the
explicit null filter (filter.h:35).

Empty-set MVA semantics (documented engine choice, matching Spark's
exists/forall): ANY over an empty array is false, ALL over an empty array
is true (vacuous truth). Mirrors reference edge noted at
columnar/accessor/accessormva.cpp:32-69.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from enum import Enum
from functools import reduce
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

UINT32_MAX = 0xFFFFFFFF


class FilterType(Enum):
    VALUES = "values"          # col IN (v1..vn)            — reference C1
    RANGE = "range"            # int interval                — reference C2
    FLOATRANGE = "floatrange"  # float interval              — reference C3
    STRINGS = "strings"        # string equality / IN        — reference C4
    NOTNULL = "notnull"        # col IS NOT NULL             — reference C5


class MvaAggr(Enum):
    NONE = "none"
    ANY = "any"                # any element matches         — reference C7
    ALL = "all"                # all elements match          — reference C8


@dataclass
class Filter:
    """One conjunct, mirroring common::Filter_t (filter.h:48-68)."""

    name: str
    type: FilterType
    exclude: bool = False                     # m_bExclude — reference C6
    mva: MvaAggr = MvaAggr.NONE
    values: Sequence[int] = field(default_factory=tuple)
    strings: Sequence[str] = field(default_factory=tuple)
    min_value: float | int | None = None      # None = left-unbounded
    max_value: float | int | None = None      # None = right-unbounded
    left_closed: bool = True
    right_closed: bool = True
    unsigned: bool = False                    # treat column as UINT32 domain


def _is_float_type(dt: T.DataType) -> bool:
    return isinstance(dt, (T.FloatType, T.DoubleType))


def _element_type(dt: T.DataType) -> T.DataType:
    return dt.elementType if isinstance(dt, T.ArrayType) else dt


def _fixup(f: Filter, dt: T.DataType) -> Filter:
    """Coerce the filter to the column type — FixupFilterSettings parity
    (common/filter.cpp:25-68).

    - int VALUES / RANGE against a float column -> FLOATRANGE semantics
      (each int value v becomes the degenerate interval [v, v],
      filter.cpp:50-64);
    - unsigned columns: negative bounds clamp to unbounded-left / empty,
      bounds above UINT32_MAX clamp to unbounded-right.
    """
    elem = _element_type(dt)
    if f.type in (FilterType.VALUES, FilterType.RANGE) and _is_float_type(elem):
        if f.type == FilterType.RANGE:
            return Filter(
                name=f.name, type=FilterType.FLOATRANGE, exclude=f.exclude,
                mva=f.mva, min_value=f.min_value, max_value=f.max_value,
                left_closed=f.left_closed, right_closed=f.right_closed,
            )
        # VALUES on float col: exact float equality per value.
        return Filter(
            name=f.name, type=FilterType.VALUES, exclude=f.exclude, mva=f.mva,
            values=[float(v) for v in f.values],
        )
    if f.unsigned and f.type == FilterType.RANGE:
        lo, hi = f.min_value, f.max_value
        if lo is not None and lo < 0:
            lo = None
        if hi is not None and hi > UINT32_MAX:
            hi = None
        return Filter(
            name=f.name, type=f.type, exclude=f.exclude, mva=f.mva,
            min_value=lo, max_value=hi,
            left_closed=f.left_closed, right_closed=f.right_closed,
        )
    return f


def _range_pred(x: Column, f: Filter) -> Column:
    """Interval membership with independent bound shapes — all 16 variants
    of common/interval.h:24-52 via two optional comparisons."""
    conds: list[Column] = []
    if f.min_value is not None:
        conds.append(x >= f.min_value if f.left_closed else x > f.min_value)
    if f.max_value is not None:
        conds.append(x <= f.max_value if f.right_closed else x < f.max_value)
    if not conds:
        # Degenerate fully-unbounded range: match-all
        # (IsFilterDegenerate, columnar/columnar.cpp:707-718).
        return F.lit(True)
    return reduce(lambda a, b: a & b, conds)


def _scalar_pred(x: Column, f: Filter) -> Column:
    if f.type == FilterType.VALUES:
        if len(f.values) == 1:
            return x == f.values[0]  # single-value fast path (accessorint.cpp:553+)
        return x.isin(list(f.values))
    if f.type in (FilterType.RANGE, FilterType.FLOATRANGE):
        return _range_pred(x, f)
    if f.type == FilterType.STRINGS:
        # Binary-collation equality: the engine fixes the reference's
        # host-supplied StringCmp_fn (filter.h:46) to byte comparison.
        if len(f.strings) == 1:
            return x == f.strings[0]
        return x.isin(list(f.strings))
    if f.type == FilterType.NOTNULL:
        return x.isNotNull()
    raise ValueError(f"unsupported filter type {f.type}")


def compile_filter(f: Filter, schema: T.StructType) -> Column:
    """Compile one Filter to a Catalyst Column predicate."""
    try:
        dt = schema[f.name].dataType
    except KeyError:
        raise KeyError(f"filter references unknown column {f.name!r}") from None
    f = _fixup(f, dt)
    col = F.col(f.name)

    if isinstance(dt, T.ArrayType) and f.type != FilterType.NOTNULL:
        if f.mva == MvaAggr.ALL:
            # reference C8 MvaAll_T (accessormva.cpp:32-69)
            pred = F.forall(col, lambda x: _scalar_pred(x, f))
        else:
            # ANY is the default MVA quantifier (filter.h:41)
            if f.type == FilterType.VALUES and f.values:
                # sorted-list overlap — MvaAny_T merge-probe analog
                pred = F.arrays_overlap(col, F.array(*[F.lit(v) for v in f.values]))
            elif f.type == FilterType.STRINGS and f.strings:
                pred = F.arrays_overlap(col, F.array(*[F.lit(s) for s in f.strings]))
            else:
                pred = F.exists(col, lambda x: _scalar_pred(x, f))
    else:
        pred = _scalar_pred(col, f)

    if f.exclude:
        # Null-is-match on exclude needs the explicit coalesce; the
        # include form deliberately returns the bare predicate — in a
        # WHERE/filter a null predicate already drops the row, and a bare
        # comparison is translatable to a Parquet PushedFilter while
        # coalesce(...) is not (verified via plans.explain).
        return ~F.coalesce(pred, F.lit(False))
    return pred


def compile_filters(filters: Sequence[Filter], schema: T.StructType) -> Column:
    """AND of conjuncts. The reference host zipper-intersects row-id
    iterators (common/blockiterator.h:39 HintRowID); in Spark the same AND
    is one predicate that Catalyst orders and pushes down."""
    if not filters:
        return F.lit(True)
    return reduce(lambda a, b: a & b, (compile_filter(f, schema) for f in filters))


def apply_filters(df: DataFrame, filters: Sequence[Filter]) -> DataFrame:
    return df.filter(compile_filters(filters, df.schema))


def to_sql(f: Filter, dialect: str = "duckdb") -> str:
    """Render the filter as ANSI SQL for the differential oracle."""

    def lit(v) -> str:
        if isinstance(v, str):
            return "'" + v.replace("'", "''") + "'"
        if isinstance(v, float) and (math.isinf(v) or math.isnan(v)):
            raise ValueError("non-finite literal in filter")
        return repr(v)

    col = f.name
    if f.type == FilterType.NOTNULL:
        base = f"{col} IS NOT NULL"
        return f"NOT ({base})" if f.exclude else base

    if f.mva == MvaAggr.NONE:
        ref = col
        if f.type == FilterType.VALUES:
            base = f"{ref} IN ({', '.join(lit(v) for v in f.values)})"
        elif f.type in (FilterType.RANGE, FilterType.FLOATRANGE):
            parts = []
            if f.min_value is not None:
                parts.append(f"{ref} >{'=' if f.left_closed else ''} {lit(f.min_value)}")
            if f.max_value is not None:
                parts.append(f"{ref} <{'=' if f.right_closed else ''} {lit(f.max_value)}")
            base = " AND ".join(parts) or "TRUE"
            base = f"({base})"
        elif f.type == FilterType.STRINGS:
            base = f"{col} IN ({', '.join(lit(s) for s in f.strings)})"
        else:
            raise ValueError(f.type)
        if f.exclude:
            return f"NOT COALESCE(({base}), FALSE)"
        return f"({base})"

    # MVA quantifiers on list columns (DuckDB lambda syntax).
    if f.type == FilterType.VALUES:
        inner = f"x IN ({', '.join(lit(v) for v in f.values)})"
    elif f.type == FilterType.STRINGS:
        inner = f"x IN ({', '.join(lit(s) for s in f.strings)})"
    else:
        parts = []
        if f.min_value is not None:
            parts.append(f"x >{'=' if f.left_closed else ''} {lit(f.min_value)}")
        if f.max_value is not None:
            parts.append(f"x <{'=' if f.right_closed else ''} {lit(f.max_value)}")
        inner = " AND ".join(parts) or "TRUE"
    if f.mva == MvaAggr.ANY:
        base = f"len(list_filter({col}, x -> {inner})) > 0"
    else:
        base = f"len(list_filter({col}, x -> {inner})) = len({col})"
    if f.exclude:
        return f"NOT COALESCE(({base}), FALSE)"
    return f"({base})"
