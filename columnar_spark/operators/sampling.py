"""Deterministic sampling for training-data pipelines.

A 100 TB corpus is down-sampled per stratum (language, source, quality
band) when building training mixes. `rand()`-based sampling is neither
reproducible across runs nor auditable; hash-gate sampling is both: a row
is kept iff a salted hash of its key falls under the stratum's threshold.
Same salt -> same sample, forever, on any engine (md5 is engine-portable,
so the DuckDB oracle reproduces the exact row set).

No reference counterpart (the reference is a search engine, not a
training pipeline); this belongs to the north-star LLM-data operator set
alongside dedup/quality/embedding ops.

Scale posture: a pure codegen'd predicate on the scan — no shuffle, no
state, prunes with the scan like any filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 65536  # 4 hex chars of md5


def sample_gate(key: Column, fraction: float, salt: str = "") -> Column:
    """True for ~`fraction` of keys, deterministically: the first 4 hex
    chars of md5(key || salt) compared lexicographically against the
    fraction's hex threshold (fixed-width lowercase hex sorts like its
    numeric value, so plain string `<` is the numeric test on any
    engine)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    thresh = format(min(int(fraction * _BUCKETS), _BUCKETS), "04x")
    if fraction >= 1.0:
        return F.lit(True)
    return F.substring(F.md5(F.concat(key.cast("string"), F.lit(salt))), 1, 4) < F.lit(thresh)


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Keep each row with its stratum's fraction (deterministic per key):
    the training-mix builder's reweighting step."""
    gate = None
    for stratum, frac in sorted(fractions.items()):
        cond = (F.col(strata_col) == stratum) & sample_gate(F.col(key_col), frac, salt)
        gate = cond if gate is None else (gate | cond)
    others = ~F.col(strata_col).isin(list(fractions)) & sample_gate(
        F.col(key_col), default_fraction, salt
    )
    return df.filter(gate | others if gate is not None else others)


def temperature_fractions(
    df: DataFrame, strata_col: str, alpha: float = 0.5, ndigits: int = 4
) -> dict[str, float]:
    """Per-stratum keep rates that flatten the corpus mix toward a
    temperature-alpha distribution (the multilingual-pretraining /
    DoReMi recipe): target share q_s ~ p_s^alpha, realized by keeping
    each stratum at rate r_s ~ p_s^(alpha-1), scaled so the rarest
    stratum keeps everything (a filter cannot up-sample).

    Driver-side: one tiny groupBy-count collect (n_strata rows).
    Rates are rounded to `ndigits` so an SQL oracle computing the same
    formula lands on bit-identical hash-gate thresholds."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    counts = {
        r[strata_col]: r["count"]
        for r in df.groupBy(strata_col).count().collect()
    }
    total = sum(counts.values())
    raw = {s: (c / total) ** (alpha - 1.0) for s, c in counts.items()}
    top = max(raw.values())
    return {s: round(v / top, ndigits) for s, v in raw.items()}


def temperature_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    alpha: float = 0.5,
    salt: str = "",
) -> DataFrame:
    """Deterministic temperature-mixed sample: compute the stratum keep
    rates from the data, then apply the hash-gate per stratum. Same
    salt + same data -> same sample on any engine."""
    fractions = temperature_fractions(df, strata_col, alpha)
    return stratified_sample(df, key_col, strata_col, fractions, salt=salt)


def weighted_sample_gate(key: Column, weight: Column, salt: str = "") -> Column:
    """Per-ROW keep probability (vs sample_gate's per-stratum constant):
    keep iff hash-position(key) < weight, where position is the first 8
    hex chars of md5(key || salt) read as a 32-bit fraction. Same
    determinism/auditability contract as sample_gate; `weight` is any
    expression in [0, 1] (quality score, length damping, per-domain
    rate), so importance sampling stays a pure scan predicate — no
    shuffle, engine-portable, reproducible."""
    pos = F.substring(F.md5(F.concat(key.cast("string"), F.lit(salt))), 1, 8)
    thresh = F.lower(
        F.lpad(
            F.hex(F.floor(weight * F.lit(float(1 << 32))).cast("bigint")), 8, "0"
        )
    )
    return pos < thresh


def weighted_sample(
    df: DataFrame, key_col: str, weight: Column, salt: str = ""
) -> DataFrame:
    return df.filter(weighted_sample_gate(F.col(key_col), weight, salt))


def split_label(key: Column, weights: dict[str, float], salt: str = "") -> Column:
    """Deterministic split label for a key: the md5 hash-gate position
    (sample_gate's 4-hex bucket space) against the cumulative weight
    boundaries, labels assigned in the dict's insertion order. Same
    engine-portability contract as sample_gate — a DuckDB CASE over
    substring(md5(...),1,4) reproduces the exact assignment."""
    if not weights:
        raise ValueError("weights must be non-empty")
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    h = F.substring(F.md5(F.concat(key.cast("string"), F.lit(salt))), 1, 4)
    labels = list(weights)
    col = None
    acc = 0.0
    for label in labels[:-1]:
        acc += weights[label] / total
        buckets = min(int(acc * _BUCKETS), _BUCKETS)
        # a full-bucket boundary would format as the 5-char '10000',
        # which sorts BELOW most 4-hex prefixes — the always-true
        # condition must be explicit (sample_gate has the same guard)
        cond = (
            F.lit(True)
            if buckets >= _BUCKETS
            else h < F.lit(format(buckets, "04x"))
        )
        branch = F.when(cond, F.lit(label))
        col = branch if col is None else col.when(cond, F.lit(label))
    last = F.lit(labels[-1])
    return col.otherwise(last) if col is not None else last


def assign_splits(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float],
    salt: str = "",
    group_col: str | None = None,
    out_col: str = "split",
) -> DataFrame:
    """Leakage-safe train/val/test assignment: the split label hashes the
    GROUP key (a dup-cluster id — e.g. exact_dedup's survivor id or
    minhash_dedup's keep_id) when `group_col` is given, else the row's
    own key — so every member of a duplicate cluster lands in the SAME
    split and train/eval contamination through duplication is
    structurally impossible (the leakage mode benchmark-decontamination
    papers flag for random per-row splits). Deterministic, auditable,
    engine-portable (md5 gate), and a pure scan projection — no shuffle,
    no state, works identically on 100 TB."""
    key = F.col(group_col) if group_col else F.col(key_col)
    return df.withColumn(out_col, split_label(key, weights, salt))
