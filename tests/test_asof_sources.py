"""As-of join semantics and source readers / declared type system."""

import pytest
from pyspark.sql import functions as F

from columnar_spark.operators.asof import asof_join
from columnar_spark.sources.readers import read_source
from columnar_spark.sources.schema import declare_schema, mva_columns, unsigned_columns


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, 10, 100), (1, 25, 101), (1, 5, 102), (2, 50, 103), (3, 9, 104)],
        "k: long, t: long, eid: long",
    )
    right = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (2, 60, "c")],
        "k: long, t: long, v: string",
    )
    out = {
        r["eid"]: r["matched_v"]
        for r in asof_join(left, right, "k", "k", "t", "t", ["v"], how="left").collect()
    }
    assert out[100] == "a"     # equal time matches (inclusive)
    assert out[101] == "b"     # latest <= 25
    assert out[102] is None    # before first right row
    assert out[103] is None    # right exists only later
    assert out[104] is None    # key has no right rows
    inner = asof_join(left, right, "k", "k", "t", "t", ["v"], how="inner")
    assert sorted(r["eid"] for r in inner.collect()) == [100, 101]


def test_asof_type_mismatch_raises(spark):
    left = spark.createDataFrame([(1, 1, 1)], "k: long, t: long, eid: long")
    right = spark.createDataFrame([(1, "x", "v")], "k: long, t: string, v: string")
    with pytest.raises(TypeError):
        asof_join(left, right, "k", "k", "t", "t", ["v"])


def test_declare_schema_and_helpers():
    attrs = [
        ("id", "uint32"),
        ("ts", "timestamp"),
        ("score", "float"),
        ("name", "string"),
        ("tags", "uint32set"),
        ("vec", "floatvec"),
    ]
    schema = declare_schema(attrs)
    assert [f.dataType.simpleString() for f in schema.fields] == [
        "bigint", "timestamp", "float", "string", "array<bigint>", "array<float>",
    ]
    assert mva_columns(attrs) == ["tags"]
    assert unsigned_columns(attrs) == ["id"]
    with pytest.raises(KeyError):
        declare_schema([("x", "decimal")])


def test_read_csv_json_with_declared_schema(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("src")
    csv_path, json_path = str(base / "t.csv"), str(base / "t.jsonl")
    with open(csv_path, "w") as f:
        f.write("id,name,score\n1,alpha,1.5\n2,beta,2.5\n")
    with open(json_path, "w") as f:
        f.write('{"id": 1, "name": "alpha", "score": 1.5}\n'
                '{"id": 2, "name": "beta", "score": 2.5}\n')

    attrs = [("id", "uint32"), ("name", "string"), ("score", "float")]
    for fmt, path in (("csv", csv_path), ("json", json_path)):
        df = read_source(spark, path, fmt, attrs=attrs)
        assert df.schema == declare_schema(attrs)
        rows = {r["id"]: (r["name"], r["score"]) for r in df.collect()}
        assert rows == {1: ("alpha", 1.5), 2: ("beta", 2.5)}


def test_asof_null_payload_value_still_matches(spark):
    """A matched right row whose payload VALUES are null must survive an
    inner as-of join (the payload struct is non-null for any right row),
    and payload columns must never stitch across different right rows."""
    from columnar_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 10), (1, 20)], "k int, t int")
    right = spark.createDataFrame(
        [(1, 5, None, "a"), (1, 15, 7, None)],
        "k int, t int, x int, y string",
    )
    out = asof_join(left, right, "k", "k", "t", "t", ["x", "y"], how="inner")
    rows = {r["t"]: (r["matched_x"], r["matched_y"]) for r in out.collect()}
    # t=10 matches the t=5 right row: x null, y='a' — survives inner, and
    # x must NOT be stitched from any other row.
    assert rows[10] == (None, "a")
    # t=20 matches t=15 atomically: (7, None), never (7, 'a').
    assert rows[20] == (7, None)
