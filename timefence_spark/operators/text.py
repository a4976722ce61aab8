"""Text-analysis operators: token stats, quality scoring, language ID,
document fingerprinting.

All pure Spark expressions (whole-stage codegen; no Python in the hot path),
so they run at scan speed over 100 TB document corpora.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Small built-in stopword profiles for the n-gram/marker-word language
# heuristic and for quality scoring. Deliberately tiny DEFAULTS — both
# lang_id and quality_score accept a user-supplied profile (``markers=`` /
# ``stopwords=``) so production lexicons plug in without code changes.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "auf"],
    "fr": ["le", "la", "les", "et", "est", "pas", "pour", "dans", "que", "une"],
    "es": ["el", "la", "los", "de", "que", "es", "en", "un", "por", "con"],
    "zh": ["的", "是", "在", "了", "和", "有", "我", "不", "这", "人"],
}

EN_STOPWORDS = LANG_MARKERS["en"] + ["a", "an", "on", "at", "by", "as", "be", "are"]


def _tokens(text: Column) -> Column:
    return F.split(F.lower(text), r"\s+")


def token_stats(df: DataFrame, *, id_col: str, text_col: str) -> DataFrame:
    """Token counting + type/token profile: n_chars, n_tokens, n_types,
    type_token_ratio, mean_token_len (BPE-ish proxy: whitespace tokens)."""
    toks = _tokens(F.col(text_col))
    n_tokens = F.size(toks)
    n_types = F.size(F.array_distinct(toks))
    total_tok_chars = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    return df.select(
        F.col(id_col),
        F.length(text_col).alias("n_chars"),
        n_tokens.alias("n_tokens"),
        n_types.alias("n_types"),
        F.round(n_types.cast("double") / n_tokens, 6).alias("type_token_ratio"),
        F.round(total_tok_chars.cast("double") / n_tokens, 6).alias("mean_token_len"),
    )


# BPE-style pre-tokenizer approximation: contraction suffixes, letter runs,
# short digit runs (BPE splits long numbers), single punctuation marks.
# Restricted to constructs RE2 and Java regex treat identically, so external
# SQL oracles (DuckDB regexp_extract_all) count the same tokens.
BPE_TOKEN_PATTERN = r"'(?:s|t|re|ve|m|ll|d)|[a-z]+|[0-9]{1,3}|[^\sa-z0-9]"


def token_count_bpe(df: DataFrame, *, id_col: str, text_col: str) -> DataFrame:
    """Sub-word token estimate: whitespace count plus a BPE-ish regex count
    (``BPE_TOKEN_PATTERN`` over lowered text) and their ratio — the standard
    cheap proxy for LLM token budgeting over a corpus. Scan-speed: one
    regexp pass per row, no shuffle."""
    lowered = F.lower(F.col(text_col))
    n_ws = F.size(F.split(lowered, r"\s+"))
    n_bpe = F.size(F.regexp_extract_all(lowered, F.lit(BPE_TOKEN_PATTERN), F.lit(0)))
    return df.select(
        F.col(id_col),
        n_ws.alias("n_tokens_ws"),
        n_bpe.alias("n_tokens_bpe"),
        F.round(n_bpe.cast("double") / n_ws, 6).alias("bpe_per_ws"),
    )


def quality_score(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    stopwords: list[str] | None = None,
) -> DataFrame:
    """Heuristic quality signals + a composite [0,1] score.

    Signals (all cheap expressions): length band, punctuation ratio, digit
    ratio, uppercase ratio, stopword ratio, repetition (1 - type/token).
    The composite mirrors common pretraining-data filters (C4-style).

    ``stopwords`` overrides the built-in demo lexicon (``EN_STOPWORDS``) —
    pass a production stopword list for the target corpus language. The
    list lands in the plan as one array literal, so arbitrarily large
    profiles stay scan-speed.
    """
    if stopwords is None:
        stopwords = EN_STOPWORDS
    text = F.col(text_col)
    toks = _tokens(text)
    n_chars = F.length(text)
    n_tokens = F.size(toks)
    n_types = F.size(F.array_distinct(toks))
    punct = n_chars - F.length(F.regexp_replace(text, r"[!-/:-@\[-`{-~]", ""))
    digits = n_chars - F.length(F.regexp_replace(text, r"[0-9]", ""))
    uppers = n_chars - F.length(F.regexp_replace(text, r"[A-Z]", ""))
    stop_arr = F.array(*[F.lit(w) for w in stopwords])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))

    punct_ratio = F.round(punct.cast("double") / n_chars, 6)
    digit_ratio = F.round(digits.cast("double") / n_chars, 6)
    upper_ratio = F.round(uppers.cast("double") / n_chars, 6)
    stopword_ratio = F.round(n_stop.cast("double") / n_tokens, 6)
    repetition = F.round(1.0 - n_types.cast("double") / n_tokens, 6)

    length_ok = (n_chars >= 50) & (n_chars <= 100_000)
    score = (
        F.when(length_ok, F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(punct_ratio <= 0.2, F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(repetition <= 0.5, F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(digit_ratio <= 0.2, F.lit(0.25)).otherwise(F.lit(0.0))
    )
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        punct_ratio.alias("punct_ratio"),
        digit_ratio.alias("digit_ratio"),
        upper_ratio.alias("upper_ratio"),
        stopword_ratio.alias("stopword_ratio"),
        repetition.alias("repetition"),
        F.round(score, 2).alias("quality_score"),
    )


def lang_id(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    markers: dict[str, list[str]] | None = None,
) -> DataFrame:
    """Marker-word language heuristic: count hits against each language's
    marker list; predict the argmax (ties -> lexicographically LARGEST
    language code, deterministic — a consequence of ``array_max`` over
    (hits, lang) structs comparing the lang field after the hit count).

    ``markers`` overrides the built-in demo profile (``LANG_MARKERS``):
    pass ``{lang: [marker words...]}`` for production lexicons or extra
    languages. Each list becomes one array literal in the projection, so
    the operator stays scan-speed regardless of profile size.

    Returns (id, lang_pred, lang_score). One projection, no shuffle."""
    if markers is None:
        markers = LANG_MARKERS
    toks = _tokens(F.col(text_col))
    scores = []
    for lang, lang_markers in sorted(markers.items()):
        marker_arr = F.array(*[F.lit(w) for w in lang_markers])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(marker_arr, t)))
        scores.append(F.struct(hits.alias("hits"), F.lit(lang).alias("lang")))
    # array_max over (hits, lang) structs: max hits, then (on tied hit
    # counts) the lexicographically largest lang — struct comparison falls
    # through to the second field. The oracle pins the same rule
    # (list_max over identical structs).
    best = F.array_max(F.array(*scores))
    n_tokens = F.size(toks)
    return df.select(
        F.col(id_col),
        best["lang"].alias("lang_pred"),
        F.round(best["hits"].cast("double") / n_tokens, 6).alias("lang_score"),
    )


def fingerprint(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    shingle_k: int = 5,
    num_hashes: int = 8,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Document fingerprint: the ``num_hashes`` smallest hashes of the word
    ``shingle_k``-grams (min-k sketch / winnowing-lite). Two documents
    sharing most fingerprint entries are near-duplicates; the sketch is tiny
    and joinable. Returns (id, fingerprint: array<bigint>).

    ``hash_fn='md5'`` uses the portable 60-bit md5 hash (bit-identical in
    external SQL engines) so the sketch is differentially verifiable."""
    toks = _tokens(F.col(text_col))
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - shingle_k, F.lit(0)))
    gram_at = lambda i: F.concat_ws(" ", F.slice(toks, i + 1, shingle_k))  # noqa: E731
    if hash_fn == "xxhash64":
        gram_hash = lambda i: F.xxhash64(gram_at(i))  # noqa: E731
    elif hash_fn == "md5":
        gram_hash = lambda i: (  # noqa: E731
            F.conv(F.substring(F.md5(gram_at(i)), 1, 15), 16, 10).cast("long")
        )
    else:
        raise ValueError(f"Unknown hash_fn '{hash_fn}' (xxhash64|md5).")
    hashes = F.array_distinct(F.transform(idx, gram_hash))
    mink = F.slice(F.array_sort(hashes), 1, num_hashes)
    return df.select(F.col(id_col), mink.alias("fingerprint"))
