"""Text-analysis expressions for training-data pipelines.

North-star extras beyond the reference's operator set (the reference's
text handling is limited to string storage + hashing, SURVEY §2.A7/A8;
its embeddings library tokenizes internally). All pure Catalyst
expressions — language ID, quality scoring, token counting and
fingerprinting run inside whole-stage codegen, no Python in the hot path,
so they stream over 100 TB with zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language function-word lists for the n-gram/stopword heuristic
# language identifier. Deterministic, dependency-free.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "of", "and", "to", "a", "in", "is", "it", "you", "that"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une", "est", "que"],
    "es": ["el", "la", "de", "que", "y", "los", "en", "un", "una", "es"],
    "de": ["der", "die", "und", "das", "ist", "von", "den", "ein", "eine", "zu"],
    "zh": ["的", "是", "在", "了", "我", "有", "和", "人", "这", "中"],
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization; empty string -> empty array.

    trim-then-split instead of split-then-HOF-filter: `\\s+` can only
    produce empty elements at the ends (leading separator, or the [""]
    of an all-whitespace input), so trimming first makes the filter
    unnecessary — and array HOFs (F.filter) evaluate interpreted
    lambdas per element while trim/split/CASE stay in whole-stage
    codegen (~18% measured on the 10x documents scan). Equivalent for
    ALL inputs, not just canonical ones.

    The trim must strip the same class the split matches: F.trim only
    removes 0x20, so 'tab foo' would leak a leading '' token (and break
    the DuckDB-oracle equivalence, whose list_filter drops empties) —
    hence btrim over the explicit Java \\s set [ \\t\\n\\x0B\\f\\r] —
    a char-set scan of the two ends, cheaper in principle than a
    ^\\s+|\\s+$ regexp pass and A/B-indistinguishable from the old
    F.trim on the sf0.1 text queries. Any Python-side
    mirror of this tokenizer must split on exactly that ASCII class
    (operators/bpe._py_tokens), NOT str.split(), which also breaks on
    Unicode spaces like NBSP."""
    trimmed = F.btrim(text, F.lit(" \t\n\x0b\f\r"))
    return F.when(
        F.length(trimmed) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(trimmed, r"\s+"))


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def char_count(text: Column) -> Column:
    return F.length(text)


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-approximating token count: word pieces + punctuation runs,
    via the common `\\w+|[^\\w\\s]` tokenizer regex."""
    return F.size(F.filter(F.split(text, r"(?<=\W)|(?=\W)"), lambda t: F.trim(t) != ""))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    toks = tokens(F.lower(text))
    sw = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
    n_sw = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return n_sw.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")


def alpha_ratio(text: Column) -> Column:
    """Share of characters that are alphanumeric or space — a punctuation/
    noise quality signal."""
    clean = F.regexp_replace(text, r"[^A-Za-z0-9 ]", "")
    return F.length(clean).cast("double") / F.greatest(F.length(text), F.lit(1)).cast("double")


def mean_word_length(text: Column) -> Column:
    toks = tokens(text)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return total.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")


def quality_score(text: Column) -> Column:
    """Composite document-quality heuristic in [0, 1]:
    length band + stopword presence + low punctuation noise.
    Deterministic closed form so the DuckDB oracle can mirror it."""
    return quality_score_from(
        text, tokens(text), tokens(F.lower(text)), lang="en"
    )


def quality_score_from(
    text: Column,
    toks: Column,
    lower_toks: Column,
    lang: str = "en",
    alpha: Column | None = None,
) -> Column:
    """quality_score over PRE-MATERIALIZED token arrays — compose with
    other text stats by projecting tokens(text) / tokens(lower(text))
    once (codegen CSE does not dedupe the regex splits across composed
    expressions; measured ~15-50%% of the scan on document-sized rows).
    Arithmetic is identical operation-for-operation to quality_score."""
    n_tok = F.size(toks).cast("double")
    len_score = F.least(n_tok / F.lit(50.0), F.lit(1.0))
    sw = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
    swr = F.size(
        F.filter(lower_toks, lambda t: F.array_contains(sw, t))
    ).cast("double") / F.greatest(F.size(lower_toks), F.lit(1)).cast("double")
    if alpha is None:
        alpha = alpha_ratio(text)
    return F.round(
        F.lit(0.4) * len_score
        + F.lit(0.3) * F.least(swr * 5.0, F.lit(1.0))
        + F.lit(0.3) * alpha,
        6,
    )


def lang_id(text: Column, lower_tokens: Column | None = None) -> Column:
    """Stopword-overlap language ID: argmax over per-language hit counts,
    ties broken by language-code order. Returns a language code string.
    Pass `lower_tokens` (a pre-materialized tokens(lower(text)) column)
    to avoid re-tokenizing when composing with other text stats — the
    token array is referenced once per language, and codegen CSE does
    not dedupe the regex split across composed expressions."""
    toks = lower_tokens if lower_tokens is not None else tokens(F.lower(text))
    scores = []
    for code, words in sorted(LANG_STOPWORDS.items()):
        sw = F.array(*[F.lit(w) for w in words])
        scores.append(
            F.struct(
                F.size(F.filter(toks, lambda t: F.array_contains(sw, t))).alias("hits"),
                F.lit(code).alias("code"),
            )
        )
    # array_max on struct orders by (hits, code); invert code ordering is
    # not needed — deterministic either way, documented as tie-by-max-code.
    best = F.array_max(F.array(*scores))
    return F.when(best["hits"] > 0, best["code"]).otherwise(F.lit("und"))


EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?\d[\d\-() ]{7,}\d"
URL_RE = r"https?://[^\s]+"


def redact_pii(text: Column) -> Column:
    """Training-data cleaning: mask emails, phone numbers, and URLs with
    typed placeholders. Pure regexp_replace chain (codegen, streamable)."""
    out = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, URL_RE, "<URL>")
    out = F.regexp_replace(out, PHONE_RE, "<PHONE>")
    return out


def strip_markup(text: Column) -> Column:
    """Remove HTML/XML tags and collapse the resulting whitespace."""
    no_tags = F.regexp_replace(text, r"<[^>]+>", " ")
    return F.trim(F.regexp_replace(no_tags, r"\s+", " "))


def word_ngrams(text: Column, n: int = 2) -> Column:
    """Word n-gram array (space-joined) from single-space tokenization.

    Uses F.split(text, " ") — NOT the whitespace-collapsing tokens() —
    so the gram universe matches an engine-agnostic string_split oracle
    exactly. Guarded for size < n (sequence() would otherwise generate a
    DESCENDING range and fabricate grams)."""
    t = F.split(text, " ")
    # slice+array_join measures ~2.5x faster than n element_at lookups
    # per gram (one bounds check + bulk copy vs n scattered reads);
    # identical output — split() never yields nulls, so array_join and
    # concat_ws agree.
    grams = F.transform(
        F.sequence(F.lit(1), F.size(t) - F.lit(n - 1)),
        lambda i: F.array_join(F.slice(t, i, n), " "),
    )
    return F.when(F.size(t) >= n, grams).otherwise(F.array().cast("array<string>"))


def repetition_signals(df, id_col: str, text_col: str, n: int = 2):
    """Gopher-style repetition quality signals per document (Rae et al.
    2021 §A1.1 repetition filters, public methodology):

    - top{n}gram_cover: fraction of all word n-grams taken by the single
      most frequent n-gram (boilerplate / template detector);
    - dup{n}gram_frac: fraction of n-gram occurrences whose gram appears
      more than once (loops, keyword stuffing);
    - uniq_tok_ratio: distinct tokens / total tokens.

    Plan: explode -> two-level groupBy, both keyed on (id, gram) then
    (id) — partial aggregation map-side, no window, no driver state;
    ratios are int/int double divisions rounded to 6 (cross-engine
    exact)."""
    grams = df.select(F.col(id_col), F.explode(word_ngrams(F.col(text_col), n)).alias("g"))
    gc = grams.groupBy(id_col, "g").agg(F.count(F.lit(1)).alias("c"))
    gsig = gc.groupBy(id_col).agg(
        F.round(F.max("c").cast("double") / F.sum("c").cast("double"), 6).alias(
            f"top{n}gram_cover"
        ),
        F.round(
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).cast("double")
            / F.sum("c").cast("double"),
            6,
        ).alias(f"dup{n}gram_frac"),
    )
    tc = (
        df.select(F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("tok"))
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tsig = tc.groupBy(id_col).agg(
        F.round(F.count(F.lit(1)).cast("double") / F.sum("c").cast("double"), 6).alias(
            "uniq_tok_ratio"
        )
    )
    return gsig.join(tsig, id_col)


def doc_fingerprint(
    text: Column, shingle_k: int = 3, toks: Column | None = None
) -> Column:
    """Document fingerprint: lexicographic min of md5 over token
    k-shingles (winnowing-style). md5 exists identically in Spark and
    DuckDB, so this is oracle-matchable cross-engine. Pass `toks` (a
    pre-materialized tokens(text) column) to avoid re-tokenizing when
    composing with other text stats."""
    toks = toks if toks is not None else tokens(text)
    n = F.size(toks)
    # slice+array_join, same rationale (and measurement) as
    # dedup.token_shingles: ~2x faster than element_at per offset.
    shingles = F.when(
        n >= shingle_k,
        F.transform(
            F.sequence(F.lit(1), n - F.lit(shingle_k - 1)),
            lambda i: F.array_join(F.slice(toks, i, shingle_k), " "),
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))
    return F.array_min(F.transform(shingles, lambda s: F.md5(s)))


def chunk_documents(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 16,
):
    """Split documents into overlapping token-window chunks — the
    RAG/embedding prep step (fixed-size windows with overlap so no
    span is cut at a boundary without context). Returns
    (id_col, chunk_id, n_chunk_tokens, chunk_text); chunk_id is the
    0-based window index, stride = chunk_tokens - overlap.

    Pure codegen: tokenize once, then slice+array_join per window
    offset (the same slice construction measured ~2.5x faster than
    per-offset element_at for shingles). The explode widens rows by
    ceil(n_tok/stride) — bounded by document length, no shuffle;
    chunking streams with the scan.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = tokens(F.col(text_col))
    n_tok = F.size(toks)
    # window starts: 0, stride, 2*stride, ... while start < n_tok
    # (last window may be short; empty docs produce no chunks)
    n_chunks = F.floor((n_tok - 1) / F.lit(stride)) + 1
    # guard BEFORE building the sequence: n_tok = 0 would ask for
    # sequence(0, -stride) and fail the executor-side bounds check
    starts = F.when(
        n_tok > 0, F.sequence(F.lit(0), (n_chunks - 1) * stride, F.lit(stride))
    ).otherwise(F.array().cast("array<bigint>"))
    out = df.select(
        F.col(id_col),
        F.col(text_col),
        F.posexplode(
            F.transform(
                starts,
                lambda s: F.array_join(
                    F.slice(tokens(F.col(text_col)), s + 1, chunk_tokens), " "
                ),
            )
        ).alias("chunk_id", "chunk_text"),
    )
    return out.select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.size(F.split(F.col("chunk_text"), " ")).cast("long").alias("n_chunk_tokens"),
        "chunk_text",
    ).filter(F.col("chunk_text") != "")
