"""Declared type system — reference common/schema.h:29-44 parity.

The reference schema is fixed at build time: a list of (name, AttrType_e,
hash-fn, knn-flag). This module maps every reference attribute type onto
its Spark type (SURVEY §1.2 table) and builds StructTypes from the same
declaration shape. Unsigned 32-bit values live in LongType to cover the
full uint32 domain (filters clamp like FixupFilterSettings); UINT64 also
maps to LongType with the reference's own caveat that it only appears as
string hashes.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import types as T

# AttrType_e (common/schema.h:29-44) -> Spark type
ATTR_TYPES: dict[str, T.DataType] = {
    "uint32": T.LongType(),           # full unsigned range needs 64 bits
    "timestamp": T.TimestampType(),   # reference stores uint32 seconds
    "int64": T.LongType(),
    "uint64": T.LongType(),           # string-hash companions only
    "boolean": T.BooleanType(),
    "float": T.FloatType(),
    "string": T.StringType(),
    "uint32set": T.ArrayType(T.LongType()),   # sorted MVA invariant
    "int64set": T.ArrayType(T.LongType()),    # sorted MVA invariant
    "floatvec": T.ArrayType(T.FloatType()),   # KNN vector column
    "binary": T.BinaryType(),                 # engine extra: media payloads
}

UNSIGNED_TYPES = {"uint32", "uint64"}
MVA_TYPES = {"uint32set", "int64set"}


def declare_schema(attrs: Sequence[tuple[str, str]]) -> T.StructType:
    """StructType from [(name, attr_type)] — the Schema_t analog."""
    fields = []
    for name, attr in attrs:
        if attr not in ATTR_TYPES:
            raise KeyError(f"unknown attribute type {attr!r}; one of {sorted(ATTR_TYPES)}")
        fields.append(T.StructField(name, ATTR_TYPES[attr]))
    return T.StructType(fields)


def mva_columns(attrs: Sequence[tuple[str, str]]) -> list[str]:
    """Columns carrying the sorted-set invariant (for WriteSpec.mva_cols)."""
    return [n for n, a in attrs if a in MVA_TYPES]


def unsigned_columns(attrs: Sequence[tuple[str, str]]) -> list[str]:
    """Columns needing unsigned filter clamping (Filter.unsigned)."""
    return [n for n, a in attrs if a in UNSIGNED_TYPES]
