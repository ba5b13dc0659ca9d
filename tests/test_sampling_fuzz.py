"""Property fuzz of deterministic hash-gate sampling: per-key
determinism across invocations and salts, engine-portability (the md5
gate recomputed in python picks exactly the same keys), and the
monotone-threshold property (a key kept at fraction f stays kept at any
f' > f — the invariant that lets a sampled dataset be EXTENDED without
resampling)."""

import hashlib

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from columnar_spark.operators.sampling import sample_gate

keys_s = st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=60)
frac_s = st.sampled_from([0.0, 0.1, 0.25, 0.5, 0.9, 1.0])


def _py_gate(key: int, fraction: float, salt: str) -> bool:
    if fraction >= 1.0:
        return True
    thresh = format(int(fraction * 65536), "04x")
    return hashlib.md5(f"{key}{salt}".encode()).hexdigest()[:4] < thresh


@given(keys=keys_s, frac=frac_s)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_gate_portable_and_monotone(spark, keys, frac):
    df = spark.createDataFrame([(k,) for k in set(keys)], "k: long")
    kept = {
        r["k"] for r in df.filter(sample_gate(F.col("k"), frac, salt="s")).collect()
    }
    want = {k for k in set(keys) if _py_gate(k, frac, "s")}
    assert kept == want

    # monotone: everything kept at frac stays kept at a larger fraction
    bigger = min(1.0, frac + 0.3)
    kept_bigger = {
        r["k"] for r in df.filter(sample_gate(F.col("k"), bigger, salt="s")).collect()
    }
    assert kept <= kept_bigger


def test_temperature_fractions_properties(spark):
    """Rarest stratum keeps everything; rates decrease with stratum
    size; uniform corpus -> all rates 1.0; alpha=1 -> no reweighting."""
    from columnar_spark.operators.sampling import temperature_fractions

    rows = [(i, "big") for i in range(400)] + \
           [(i + 400, "mid") for i in range(100)] + \
           [(i + 500, "rare") for i in range(25)]
    df = spark.createDataFrame(rows, "doc_id: long, src: string")

    fr = temperature_fractions(df, "src", alpha=0.5)
    assert fr["rare"] == 1.0
    assert fr["rare"] > fr["mid"] > fr["big"] > 0.0

    uni = spark.createDataFrame(
        [(i, f"s{i % 4}") for i in range(400)], "doc_id: long, src: string"
    )
    assert set(temperature_fractions(uni, "src", alpha=0.5).values()) == {1.0}

    assert set(temperature_fractions(df, "src", alpha=1.0).values()) == {1.0}


def test_temperature_sample_flattens_mix(spark):
    """After sampling at alpha=0.5 the realized shares sit between the
    original mix and uniform (flattened, not inverted)."""
    from columnar_spark.operators.sampling import temperature_sample

    rows = [(i, "big") for i in range(800)] + \
           [(i + 800, "rare") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id: long, src: string")
    out = temperature_sample(df, "doc_id", "src", alpha=0.5, salt="t")
    got = {r["src"]: r["count"] for r in out.groupBy("src").count().collect()}
    assert got["rare"] == 50  # rarest keeps all
    big_share = got["big"] / (got["big"] + got["rare"])
    assert 0.5 < big_share < 800 / 850  # flattened toward uniform


# ------------------------------------------------- weighted (per-row) gate

from columnar_spark.operators.sampling import weighted_sample_gate

weight_s = st.sampled_from([0.0, 0.05, 0.3, 0.5, 0.77, 1.0])


def _py_wgate(key: int, w: float, salt: str) -> bool:
    pos = hashlib.md5(f"{key}{salt}".encode()).hexdigest()[:8]
    thresh = format(int(w * (1 << 32)), "08x")
    return pos < thresh


@given(keys=keys_s, w=weight_s)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_weighted_gate_portable_and_monotone(spark, keys, w):
    df = spark.createDataFrame([(k,) for k in set(keys)], "k: long")
    kept = {
        r["k"]
        for r in df.filter(
            weighted_sample_gate(F.col("k"), F.lit(w), salt="s")
        ).collect()
    }
    want = {k for k in set(keys) if _py_wgate(k, w, "s")}
    assert kept == want

    # monotone: raising every weight only ADDS rows (extend-don't-resample)
    w2 = min(1.0, w + 0.2)
    kept2 = {
        r["k"]
        for r in df.filter(
            weighted_sample_gate(F.col("k"), F.lit(w2), salt="s")
        ).collect()
    }
    assert kept <= kept2


def test_assign_splits_cluster_coherent_and_proportional(spark):
    """Leakage safety: every dup-cluster lands in ONE split; global
    proportions track the weights; same salt -> same assignment."""
    from pyspark.sql import functions as F

    from columnar_spark.operators.sampling import assign_splits

    n = 4000
    df = spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % 700).alias("grp"),  # 700 clusters, ~5.7 rows each
    )
    out = assign_splits(
        df, "k", {"train": 0.8, "val": 0.1, "test": 0.1},
        salt="s1", group_col="grp",
    )
    # one split per cluster
    assert (
        out.groupBy("grp").agg(F.countDistinct("split").alias("d"))
        .filter(F.col("d") > 1).count() == 0
    )
    # proportions within tolerance (700 clusters hashing independently)
    frac = {
        r["split"]: r["count"] / n for r in out.groupBy("split").count().collect()
    }
    assert abs(frac["train"] - 0.8) < 0.08 and abs(frac.get("val", 0) - 0.1) < 0.05
    # determinism
    again = assign_splits(
        df, "k", {"train": 0.8, "val": 0.1, "test": 0.1},
        salt="s1", group_col="grp",
    )
    assert out.exceptAll(again).count() == 0 and again.exceptAll(out).count() == 0
    # a different salt reshuffles (at least one cluster moves)
    moved = assign_splits(
        df, "k", {"train": 0.8, "val": 0.1, "test": 0.1},
        salt="s2", group_col="grp",
    )
    assert moved.exceptAll(out).count() > 0


def test_split_label_covers_degenerate_weights(spark):
    from pyspark.sql import functions as F

    from columnar_spark.operators.sampling import assign_splits

    df = spark.range(100).select(F.col("id").alias("k"))
    one = assign_splits(df, "k", {"all": 1.0})
    assert one.filter(F.col("split") != "all").count() == 0
    import pytest as _pt

    with _pt.raises(ValueError):
        assign_splits(df, "k", {})
