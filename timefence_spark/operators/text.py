"""Text-analysis operators: token stats, quality scoring, language ID,
document fingerprinting.

All pure Spark expressions (whole-stage codegen; no Python in the hot path),
so they run at scan speed over 100 TB document corpora.
"""

from __future__ import annotations

import re as _re

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


def _nsize(arr: Column | str, guard: Column | None = None) -> Column:
    """Array length with NULL-in-NULL-out on EVERY session config.

    Plain ``F.size(NULL)`` is config-dependent: -1 under
    ``spark.sql.legacy.sizeOfNull=true`` (the pre-ANSI default some 3.x
    deployments still run), NULL under the ANSI semantics the oracles pin.
    A -1 count silently poisons every downstream ratio instead of
    propagating NULL, so guard explicitly rather than depend on the
    session (same contract classifier_score establishes for its token
    counts).

    ``guard``: a CHEAP column whose (non-)nullness implies ``arr``'s —
    pass the staged source column when ``arr`` is a derived expression
    (filter/regexp over it), so the non-codegen derivation isn't
    evaluated twice, once in the null check and once in the count (the
    plan-shape tests pin single evaluation)."""
    arr = F.col(arr) if isinstance(arr, str) else arr
    guard = arr if guard is None else guard
    return F.when(guard.isNotNull(), F.size(arr))


def token_stats(df: DataFrame, *, id_col: str, text_col: str) -> DataFrame:
    """Token counting + type/token profile: n_chars, n_tokens, n_types,
    type_token_ratio, mean_token_len (BPE-ish proxy: whitespace tokens).

    Staged projections (see repetition_signals): the split and the
    char-sum aggregate are non-codegen, so staging keeps each at one
    evaluation per row instead of one per consuming output column."""
    staged = df.select(
        F.col(id_col),
        F.length(text_col).alias("n_chars"),
        _tokens(F.col(text_col)).alias("__toks"),
    )
    toks = F.col("__toks")
    counts = staged.select(
        id_col,
        "n_chars",
        _nsize(toks).alias("n_tokens"),
        _nsize(F.array_distinct(toks), toks).alias("n_types"),
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
        ).alias("__tok_chars"),
    )
    return counts.select(
        id_col,
        "n_chars",
        "n_tokens",
        "n_types",
        F.round(F.col("n_types").cast("double") / F.col("n_tokens"), 6).alias(
            "type_token_ratio"
        ),
        F.round(F.col("__tok_chars").cast("double") / F.col("n_tokens"), 6).alias(
            "mean_token_len"
        ),
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
    counts = df.select(
        F.col(id_col),
        _nsize(F.split(lowered, r"\s+"), F.col(text_col)).alias(
            "n_tokens_ws"
        ),
        _nsize(
            F.regexp_extract_all(lowered, F.lit(BPE_TOKEN_PATTERN), F.lit(0)),
            F.col(text_col),
        ).alias("n_tokens_bpe"),
    )
    return counts.select(
        id_col,
        "n_tokens_ws",
        "n_tokens_bpe",
        F.round(
            F.col("n_tokens_bpe").cast("double") / F.col("n_tokens_ws"), 6
        ).alias("bpe_per_ws"),
    )


def quality_score(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    stopwords: list[str] | None = None,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Heuristic quality signals + a composite [0,1] score.

    Signals (all cheap expressions): length band, punctuation ratio, digit
    ratio, uppercase ratio, stopword ratio, repetition (1 - type/token).
    The composite mirrors common pretraining-data filters (C4-style).

    ``stopwords`` overrides the built-in demo lexicon (``EN_STOPWORDS``) —
    pass a production stopword list for the target corpus language. The
    list lands in the plan as one array literal, so arbitrarily large
    profiles stay scan-speed.

    ``keep_cols`` carries the named input columns through to the output
    unchanged (names must not collide with the metric columns) — this is
    how Corpus.report chains several scan-side operators into ONE
    projection instead of joining their outputs back together on id.
    """
    if stopwords is None:
        stopwords = EN_STOPWORDS
    keep = [F.col(c) for c in (keep_cols or [])]
    # Staged projections (see repetition_signals): tokenize once, count
    # once, then derive ratios/score from plain columns.
    staged = df.select(
        F.col(id_col),
        F.col(text_col).alias("__text"),
        F.length(text_col).alias("n_chars"),
        _tokens(F.col(text_col)).alias("__toks"),
        *keep,
    )
    text = F.col("__text")
    toks = F.col("__toks")
    stop_arr = F.array(*[F.lit(w) for w in stopwords])
    counts = staged.select(
        id_col,
        "n_chars",
        _nsize(toks).alias("n_tokens"),
        _nsize(F.array_distinct(toks), toks).alias("__n_types"),
        (
            F.col("n_chars")
            - F.length(F.regexp_replace(text, r"[!-/:-@\[-`{-~]", ""))
        ).alias("__punct"),
        (F.col("n_chars") - F.length(F.regexp_replace(text, r"[0-9]", ""))).alias(
            "__digits"
        ),
        (F.col("n_chars") - F.length(F.regexp_replace(text, r"[A-Z]", ""))).alias(
            "__uppers"
        ),
        _nsize(
            F.filter(toks, lambda t: F.array_contains(stop_arr, t)), toks
        ).alias("__n_stop"),
        *keep,
    )
    n_chars = F.col("n_chars")
    n_tokens = F.col("n_tokens")
    ratios = counts.select(
        id_col,
        "n_chars",
        "n_tokens",
        F.round(F.col("__punct").cast("double") / n_chars, 6).alias("punct_ratio"),
        F.round(F.col("__digits").cast("double") / n_chars, 6).alias("digit_ratio"),
        F.round(F.col("__uppers").cast("double") / n_chars, 6).alias("upper_ratio"),
        F.round(F.col("__n_stop").cast("double") / n_tokens, 6).alias(
            "stopword_ratio"
        ),
        F.round(1.0 - F.col("__n_types").cast("double") / n_tokens, 6).alias(
            "repetition"
        ),
        *keep,
    )
    length_ok = (n_chars >= 50) & (n_chars <= 100_000)
    score = (
        F.when(length_ok, F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(F.col("punct_ratio") <= 0.2, F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(F.col("repetition") <= 0.5, F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(F.col("digit_ratio") <= 0.2, F.lit(0.25)).otherwise(F.lit(0.0))
    )
    return ratios.select(
        id_col,
        "n_chars",
        "n_tokens",
        "punct_ratio",
        "digit_ratio",
        "upper_ratio",
        "stopword_ratio",
        "repetition",
        F.round(score, 2).alias("quality_score"),
        *keep,
    )


def lang_id(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    markers: dict[str, list[str]] | None = None,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Marker-word language heuristic: count hits against each language's
    marker list; predict the argmax (ties -> lexicographically LARGEST
    language code, deterministic — a consequence of ``array_max`` over
    (hits, lang) structs comparing the lang field after the hit count).

    ``markers`` overrides the built-in demo profile (``LANG_MARKERS``):
    pass ``{lang: [marker words...]}`` for production lexicons or extra
    languages. Each list becomes one array literal in the projection, so
    the operator stays scan-speed regardless of profile size.

    Returns (id, lang_pred, lang_score), plus any ``keep_cols`` carried
    through unchanged. One projection, no shuffle."""
    if markers is None:
        markers = LANG_MARKERS
    keep = [F.col(c) for c in (keep_cols or [])]
    # Staged projections (see repetition_signals): one tokenize, then one
    # filter per language over the staged array, then one argmax.
    staged = df.select(
        F.col(id_col), _tokens(F.col(text_col)).alias("__toks"), *keep
    )
    toks = F.col("__toks")
    scores = []
    for lang, lang_markers in sorted(markers.items()):
        marker_arr = F.array(*[F.lit(w) for w in lang_markers])
        hits = _nsize(
            F.filter(toks, lambda t: F.array_contains(marker_arr, t)), toks
        )
        scores.append(F.struct(hits.alias("hits"), F.lit(lang).alias("lang")))
    # array_max over (hits, lang) structs: max hits, then (on tied hit
    # counts) the lexicographically largest lang — struct comparison falls
    # through to the second field. The oracle pins the same rule
    # (list_max over identical structs).
    scored = staged.select(
        id_col,
        _nsize(toks).alias("__n_tokens"),
        F.array_max(F.array(*scores)).alias("__best"),
        *keep,
    )
    return scored.select(
        id_col,
        F.col("__best")["lang"].alias("lang_pred"),
        F.round(
            F.col("__best")["hits"].cast("double") / F.col("__n_tokens"), 6
        ).alias("lang_score"),
        *keep,
    )


def gopher_quality(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    stopwords: list[str] | None = None,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_frac: float = 0.8,
    min_stopword_hits: int = 2,
) -> DataFrame:
    """Gopher-style pretraining-data quality rules (Rae et al. 2021, §A1.1):
    word-count band, mean word length band, symbol-to-word ratio (# and
    ellipsis), fraction of words containing an alphabetic character, and
    presence of at least ``min_stopword_hits`` distinct common stopwords.

    Emits each signal, each rule's boolean, and the conjunctive
    ``gopher_pass``. One projection per row — no shuffle, no Python; runs
    at scan speed over a 100 TB corpus and composes with ``filter`` for the
    actual drop. ``stopwords`` plugs in a production lexicon (defaults to
    the demo ``EN_STOPWORDS``)."""
    if stopwords is None:
        stopwords = EN_STOPWORDS
    # Staged projections (tokens -> signals -> rules): the token split and
    # the filter/aggregate HOFs are non-codegen, so inlining them into
    # every signal column would re-split the text per column; staging makes
    # each execute once (CollapseProject keeps non-cheap exprs staged).
    staged = df.select(
        F.col(id_col),
        F.col(text_col).alias("__text"),
        _tokens(F.col(text_col)).alias("__toks"),
    )
    toks = F.col("__toks")
    text = F.col("__text")
    n_words = _nsize(toks)
    total_chars = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    # symbols: '#' plus unicode/ascii ellipsis occurrences across the doc
    n_hash = F.length(text) - F.length(F.regexp_replace(text, r"#", ""))
    n_ellipsis = _nsize(
        F.regexp_extract_all(text, F.lit(r"\.\.\.|…"), F.lit(0)), text
    )
    n_alpha_words = _nsize(F.filter(toks, lambda t: t.rlike("[a-z]")), toks)
    stop_arr = F.array(*[F.lit(w) for w in stopwords])
    stop_hits = _nsize(
        F.filter(F.array_distinct(toks), lambda t: F.array_contains(stop_arr, t)),
        toks,
    )
    signals = staged.select(
        id_col,
        n_words.alias("n_words"),
        F.round(total_chars.cast("double") / n_words, 6).alias("mean_word_len"),
        F.round((n_hash + n_ellipsis).cast("double") / n_words, 6).alias(
            "symbol_ratio"
        ),
        F.round(n_alpha_words.cast("double") / n_words, 6).alias("alpha_word_frac"),
        stop_hits.alias("stopword_hits"),
    )

    r_words = (F.col("n_words") >= min_words) & (F.col("n_words") <= max_words)
    r_wordlen = (F.col("mean_word_len") >= min_mean_word_len) & (
        F.col("mean_word_len") <= max_mean_word_len
    )
    r_symbol = F.col("symbol_ratio") <= max_symbol_ratio
    r_alpha = F.col("alpha_word_frac") >= min_alpha_frac
    r_stop = F.col("stopword_hits") >= min_stopword_hits
    return signals.select(
        id_col,
        "n_words",
        "mean_word_len",
        "symbol_ratio",
        "alpha_word_frac",
        "stopword_hits",
        r_words.alias("rule_word_count"),
        r_wordlen.alias("rule_mean_word_len"),
        r_symbol.alias("rule_symbol_ratio"),
        r_alpha.alias("rule_alpha_words"),
        r_stop.alias("rule_stopwords"),
        (r_words & r_wordlen & r_symbol & r_alpha & r_stop).alias("gopher_pass"),
    )


def repetition_signals(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    ngram: int = 2,
) -> DataFrame:
    """Within-document repetition (Rae et al. 2021 §A1.2, the n-gram rules):
    ``dup_ngram_frac`` (fraction of word n-grams that are repeats of an
    earlier occurrence) and ``top_ngram_frac`` (occurrences of the single
    most frequent n-gram over all n-grams), plus that top n-gram for
    inspection.

    Scale shape: the naive relational form (explode n-grams -> count per
    (doc, gram) -> argmax per doc) shuffles every n-gram of every document
    — O(corpus tokens) shuffle rows. Here the whole computation is a
    per-row projection: sort the document's n-gram array, then one
    ``aggregate`` pass counts the longest equal run (= the modal count).
    O(n log n) per document, zero shuffle, corpus-size-independent.

    Built as STAGED projections (grams -> aggregates -> ratios), not one
    select: inlining everything duplicates the non-codegen run-length
    aggregate per output column that reads it, and Catalyst's
    CollapseProject keeps non-cheap expressions staged rather than
    re-inlining them — so the sort + run pass executes once per row."""
    tokenized = df.select(
        F.col(id_col), _tokens(F.col(text_col)).alias("__toks")
    )
    toks = F.col("__toks")
    # _nsize for uniformity; behavior here is config-safe either way (both
    # legacy -1 and ANSI NULL fail `n >= ngram` into the empty-gram branch).
    n = _nsize(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - ngram + 1, F.lit(1)))
    grams = F.when(
        n >= ngram,
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, ngram))),
    ).otherwise(F.array().cast("array<string>"))
    staged = tokenized.select(F.col(id_col), grams.alias("__grams"))

    # Longest equal run in the sorted array == count of the modal n-gram;
    # carry (prev, run, best, best_gram) through one aggregate pass.
    zero = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
        F.lit(None).cast("string").alias("best_gram"),
    )

    def step(acc, x):  # noqa: ANN001 - Column HOF
        run = F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1).otherwise(F.lit(1))
        better = run > acc["best"]
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.when(better, run).otherwise(acc["best"]).alias("best"),
            F.when(better, x).otherwise(acc["best_gram"]).alias("best_gram"),
        )

    agg = staged.select(
        id_col,
        F.size("__grams").alias("n_ngrams"),
        F.size(F.array_distinct("__grams")).alias("__nd"),
        F.aggregate(F.array_sort("__grams"), zero, step).alias("__top"),
    )
    n_grams = F.col("n_ngrams")
    return agg.select(
        id_col,
        "n_ngrams",
        F.when(n_grams > 0, F.round(1.0 - F.col("__nd").cast("double") / n_grams, 6))
        .otherwise(F.lit(0.0))
        .alias("dup_ngram_frac"),
        F.when(
            n_grams > 0,
            F.round(F.col("__top")["best"].cast("double") / n_grams, 6),
        )
        .otherwise(F.lit(0.0))
        .alias("top_ngram_frac"),
        F.col("__top")["best_gram"].alias("top_ngram"),
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
    external SQL engines) so the sketch is differentially verifiable.

    Tokens are staged in their own projection (see repetition_signals) so
    the text splits once per row, not once per reference in the gram
    expression."""
    tokenized = df.select(
        F.col(id_col), _tokens(F.col(text_col)).alias("__toks")
    )
    toks = F.col("__toks")
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
    return tokenized.select(F.col(id_col), mink.alias("fingerprint"))


def classifier_score(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    weights: dict[str, float] | None = None,
    weights_df: DataFrame | None = None,
    bias: float = 0.0,
    out_col: str = "clf_score",
) -> DataFrame:
    """Linear (fasttext-style) document classifier over unigram features —
    the "does this look like reference text" scoring step public LLM
    pipelines run between heuristic gates and expensive filters.

    ``score = sigmoid(bias + sum_w weight(w) * n_w / n_tokens)`` where
    ``n_w`` counts occurrences of word ``w`` (lowercased whitespace
    tokens) and ``n_tokens`` normalizes for length. Returns
    (id, n_tokens, out_col) with the score rounded to 6 places (libm exp
    differs across engines in the last ulp; rounding keeps the score
    oracle-replayable).

    Zero-token contract: a document with no tokens (NULL text — split
    always yields >= 1 token otherwise) gets ``n_tokens = 0`` and
    ``score = sigmoid(bias)``, the linear model's no-evidence
    prediction. Guarded explicitly with ``F.when`` — never via
    ``size(NULL)``, whose value differs between legacy (-1) and ANSI
    (NULL) modes, so the contract holds on every pyspark >= 3.5.

    Two physical paths, same math:

    * ``weights`` (dict) — every weight becomes a literal in ONE
      projection (like lang_id's marker arrays): scan-speed, zero
      shuffle. Right for curated vocabularies up to a few hundred terms;
      the deterministic left-to-right fold also makes this the
      differential-oracle path.
    * ``weights_df`` — a (word, weight) DataFrame for production-sized
      vocabularies: tokens explode scan-side, pre-aggregate to one row
      per (doc, distinct word), inner-join the weight table (AQE
      broadcasts vocabulary-sized sides), one groupBy(doc) sums. Join
      and aggregate carry (id, word-hash-sized rows) only. Summation
      order over the hash aggregation is engine-arbitrary, so scores can
      differ from the expression path in the last ulp — the 6-place
      round normally absorbs it.
    """
    if (weights is None) == (weights_df is None):
        raise ValueError("pass exactly one of weights / weights_df")
    sig = lambda x: F.lit(1.0) / (F.lit(1.0) + F.exp(-x))  # noqa: E731
    if weights is not None:
        staged = df.select(
            F.col(id_col), _tokens(F.col(text_col)).alias("__toks")
        )
        toks = F.col("__toks")
        raw = F.lit(float(bias))
        n_tokens = F.col("__n")
        counted = staged.select(
            id_col,
            F.when(toks.isNotNull(), F.size(toks))
            .otherwise(F.lit(0))
            .alias("__n"),
            toks.alias("__toks"),
        )
        for word, w in weights.items():
            n_w = F.size(F.filter(F.col("__toks"), lambda t: t == F.lit(word)))
            raw = raw + F.lit(float(w)) * n_w.cast("double") / n_tokens
        return counted.select(
            id_col,
            F.col("__n").alias("n_tokens"),
            F.round(
                F.when(F.col("__n") > 0, sig(raw)).otherwise(
                    sig(F.lit(float(bias)))
                ),
                6,
            ).alias(out_col),
        )
    per_doc = (
        df.select(F.col(id_col), F.explode(_tokens(F.col(text_col))).alias("__w"))
        .groupBy(id_col, "__w")
        .agg(F.count(F.lit(1)).alias("__n_w"))
    )
    wdf = weights_df.select(
        F.col(weights_df.columns[0]).alias("__w"),
        F.col(weights_df.columns[1]).cast("double").alias("__weight"),
    )
    sums = (
        per_doc.join(wdf, "__w")
        .groupBy(id_col)
        .agg(F.sum(F.col("__weight") * F.col("__n_w")).alias("__wsum"))
    )
    t = _tokens(F.col(text_col))
    lengths = df.select(
        F.col(id_col),
        F.when(t.isNotNull(), F.size(t)).otherwise(F.lit(0)).alias("n_tokens"),
    )
    return lengths.join(sums, id_col, "left").select(
        id_col,
        "n_tokens",
        F.round(
            F.when(
                F.col("n_tokens") > 0,
                sig(
                    F.lit(float(bias))
                    + F.coalesce("__wsum", F.lit(0.0)) / F.col("n_tokens")
                ),
            ).otherwise(sig(F.lit(float(bias)))),
            6,
        ).alias(out_col),
    )


def fit_classifier(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    label_col: str,
    smoothing: float = 1.0,
    min_count: int = 1,
) -> DataFrame:
    """Closed-form Naive-Bayes trainer for :func:`classifier_score` —
    turns a labeled document sample into a (word, weight) table, the
    train half of the quality-classifier loop public LLM pipelines run
    (label a seed set "looks like reference text" / "doesn't", fit, then
    score the whole corpus). Reference scope: the reference ships
    scoring only; the trainer is this engine's pipeline extension.

    ``weight(w) = ln((c_pos(w)+a)/(T_pos+a*V)) - ln((c_neg(w)+a)/(T_neg+a*V))``
    — the multinomial NB log-likelihood ratio with add-``a`` smoothing
    (``a = smoothing``), where ``c_pos/c_neg`` count occurrences of ``w``
    in positive/negative documents, ``T_pos/T_neg`` the class token
    totals over the vocabulary, and ``V`` the vocabulary size. The
    vocabulary is every token (lowercased whitespace split, empty
    artifacts dropped) with total count >= ``min_count``; totals and
    ``V`` are computed AFTER that cut so the model is self-consistent.
    ``label_col`` is cast to boolean; rows with a NULL label or NULL
    text contribute nothing. Weights are rounded to 6 places (libm log
    ulp) — the same contract the logprob family uses.

    Returns (word, weight, n_pos, n_neg) ordered weight desc, word asc.
    Feed straight into ``classifier_score(weights_df=...)``; for a prior
    bias use ``ln(n_pos_docs / n_neg_docs)`` from your label counts.

    100 TB shape: one scan-side explode -> one word-keyed shuffle with
    conditional partial sums (map-side combine collapses each word per
    partition); class totals and V reduce the vocabulary-sized table to
    ONE row that attaches via a broadcast cross join (same sanctioned
    shape as bigram_logprob's totals). Nothing document-sized crosses
    the wire after the first aggregation."""
    if smoothing <= 0.0:
        raise ValueError(f"smoothing must be > 0, got {smoothing}")
    lab = F.col("__lab")
    counts = (
        df.select(
            F.col(label_col).cast("boolean").alias("__lab"),
            F.explode(_tokens(F.col(text_col))).alias("word"),
        )
        .where(lab.isNotNull() & (F.col("word") != ""))
        .groupBy("word")
        .agg(
            F.sum(F.when(lab, 1).otherwise(0)).cast("long").alias("n_pos"),
            F.sum(F.when(lab, 0).otherwise(1)).cast("long").alias("n_neg"),
        )
        .where(F.col("n_pos") + F.col("n_neg") >= int(min_count))
    )
    totals = F.broadcast(
        counts.agg(
            F.coalesce(F.sum("n_pos"), F.lit(0).cast("long")).alias("__t_pos"),
            F.coalesce(F.sum("n_neg"), F.lit(0).cast("long")).alias("__t_neg"),
            F.count(F.lit(1)).alias("__v"),
        )
    )
    a = F.lit(float(smoothing))
    av = a * F.col("__v").cast("double")
    weight = F.log(
        (F.col("n_pos").cast("double") + a)
        / (F.col("__t_pos").cast("double") + av)
    ) - F.log(
        (F.col("n_neg").cast("double") + a)
        / (F.col("__t_neg").cast("double") + av)
    )
    return (
        counts.crossJoin(totals)
        .select(
            "word",
            F.round(weight, 6).alias("weight"),
            "n_pos",
            "n_neg",
        )
        .orderBy(F.desc("weight"), F.asc("word"))
    )


def hashed_classifier_score(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    weights: list[float],
    bias: float = 0.0,
    ngram: int = 1,
    hash_fn: str = "xxhash64",
    normalize: bool = True,
    out_col: str = "clf_score",
) -> DataFrame:
    """Linear classifier over HASHED features (VERDICT r12 item 6) —
    the scoring half of the DCLM / fineweb-edu-style learned quality
    filter: ``score = sigmoid(bias + w · hash_embed(text))`` where the
    feature vector is :func:`hash_embed`'s signed-hashing embedding
    (dims = ``len(weights)``; pass the same ``ngram`` / ``hash_fn`` /
    ``normalize`` the model was trained with —
    :func:`fit_classifier_hashed` returns them alongside the weights).

    Unlike :func:`classifier_score`'s explicit-vocabulary model, the
    feature space here is BOUNDED BY CONSTRUCTION (the hashing trick,
    Weinberger et al. 2009), so the weight vector is a few-hundred-
    entry literal no matter the corpus vocabulary — the model ships in
    the plan, and the dot product is one deterministic left-to-right
    ``zip_with`` + ``aggregate`` fold per document (scan-speed, zero
    extra shuffle beyond hash_embed's one pre-agg).

    Returns (id, out_col) with the score rounded to 6 places (libm exp
    ulp contract, like :func:`classifier_score`). Documents that embed
    to no row (no grams: NULL/empty text, or fewer than ``ngram``
    tokens) produce NO row — the keep-unscored policy downstream."""
    dims = len(weights)
    if dims < 2:
        raise ValueError(f"weights must have >= 2 entries, got {dims}")
    emb = hash_embed(
        df, id_col=id_col, text_col=text_col, dims=dims, ngram=ngram,
        hash_fn=hash_fn, normalize=normalize, round_to=6,
    )
    w_arr = F.array(*[F.lit(float(w)) for w in weights])
    dot = F.aggregate(
        F.zip_with(F.col("embedding"), w_arr, lambda x, w: x * w),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    raw = F.lit(float(bias)) + dot
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-raw))
    return emb.select(F.col(id_col), F.round(score, 6).alias(out_col))


def fit_classifier_hashed(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    label_col: str,
    dims: int = 64,
    ngram: int = 1,
    hash_fn: str = "xxhash64",
    iters: int = 50,
    lr: float = 2.0,
    l2: float = 0.0,
    momentum: float = 0.9,
    normalize: bool = True,
    mode: str = "auto",
    local_threshold: int = 100_000,
) -> dict:
    """Logistic-regression trainer over hashed features (VERDICT r12
    item 6) — the LEARNED quality classifier DCLM / fineweb-edu-style
    pipelines filter with, one rung above :func:`fit_classifier`'s
    closed-form Naive Bayes: NB sums per-occurrence log-odds, so a
    document repeating one weak token 50 times swamps the score;
    logistic regression over the L2-normalized :func:`hash_embed`
    features weighs EVIDENCE, not repetitions, and handles correlated
    features. Returns ``{"weights": [...], "bias": float, "ngram": n,
    "hash_fn": ..., "normalize": True, "n_docs": N, "iters_run": k}``
    — feed weights/bias straight to :func:`hashed_classifier_score`.

    Training is full-batch gradient descent with heavy-ball momentum
    (Polyak — full-batch GD on a logistic loss converges O(1/t);
    momentum buys the practical 5-10x, deterministically), made
    DETERMINISTIC by integer quantization (the unigram trainer's
    micronat trick, applied to GD): features quantize to micro-units
    once (hash_embed already rounds to 6 places, so the quantization
    is exact), the model lives on the micro grid between iterations,
    per-row margins are exact integer dot products, residuals quantize
    to micros, and each gradient component is an exact integer sum
    (decimal(38,0) — no float summation-order dependence, no overflow
    at any corpus size). The only floating-point steps run on the
    DRIVER over ``dims + 1`` values per iteration — bit-reproducible.
    Stops early when the quantized model is unchanged by an iteration
    (a fixed point on the micro grid).

    100 TB shape: ONE hash_embed pass (its single pre-agg shuffle)
    materializes the (label, micro-feature) table, pinned with
    localCheckpoint so the loop never recomputes upstream; each
    iteration is one scan of that narrow table (dims longs + a label)
    with a ``dims + 2``-column aggregate — the bounded-driver-collect
    pattern the BPE trainer documents. ``mode='auto'`` is size-gated
    like :func:`train_bpe_spark`: a labeled sample within
    ``local_threshold`` rows is collected ONCE (bounded by the gate)
    and the loop runs driver-side on numpy int64 — the gradient sums
    are the same exact integers, so the two paths differ only where
    libm ``exp`` differs in the last ulp (a 1-micro residual on a
    measure-zero boundary); pass ``mode='distributed'`` to force the
    per-iteration Spark jobs, ``'local'`` to error past the gate.
    Rows with a NULL label or no grams contribute nothing."""
    if dims < 2:
        raise ValueError(f"dims must be >= 2, got {dims}")
    if dims > 4096:
        raise ValueError(
            f"dims must be <= 4096 (per-iteration aggregate width), "
            f"got {dims}"
        )
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    if lr <= 0.0:
        raise ValueError(f"lr must be > 0, got {lr}")
    if l2 < 0.0:
        raise ValueError(f"l2 must be >= 0, got {l2}")
    if not 0.0 <= momentum < 1.0:
        raise ValueError(f"momentum must be in [0, 1), got {momentum}")
    if mode not in ("auto", "local", "distributed"):
        raise ValueError(f"mode must be auto|local|distributed, got {mode!r}")
    emb = hash_embed(
        df, id_col=id_col, text_col=text_col, dims=dims, ngram=ngram,
        hash_fn=hash_fn, normalize=normalize, round_to=6,
    )
    labels = df.select(
        F.col(id_col),
        F.col(label_col).cast("boolean").cast("int").alias("__y"),
    ).where(F.col("__y").isNotNull())
    feats_plan = emb.join(labels, id_col).select(
        F.col("__y"),
        F.transform(
            F.col("embedding"),
            lambda x: F.round(x * 1e6).cast("long"),
        ).alias("__xm"),
    )

    # Shared driver-side update: heavy-ball on the dims+1 float values,
    # re-quantized to the micro grid. Identical code for both paths —
    # the paths differ only in who computes the exact integer sums.
    state = {
        "beta": [0] * dims,  # micro-units
        "bias_m": 0,
        "vel": [0.0] * dims,
        "vel_b": 0.0,
    }

    def step(g_ints, gb_int, n_docs) -> bool:
        beta, vel = state["beta"], state["vel"]
        new_beta = []
        for j in range(dims):
            g = float(g_ints[j]) / 1e12 / n_docs
            g += l2 * (beta[j] / 1e6)
            vel[j] = momentum * vel[j] - lr * g
            new_beta.append(round((beta[j] / 1e6 + vel[j]) * 1e6))
        gb = float(gb_int) / 1e6 / n_docs
        state["vel_b"] = momentum * state["vel_b"] - lr * gb
        new_bias = round((state["bias_m"] / 1e6 + state["vel_b"]) * 1e6)
        changed = new_beta != beta or new_bias != state["bias_m"]
        state["beta"], state["bias_m"] = new_beta, new_bias
        return changed

    def result(n_docs, iters_run) -> dict:
        return {
            "weights": [b / 1e6 for b in state["beta"]],
            "bias": state["bias_m"] / 1e6,
            "ngram": ngram,
            "hash_fn": hash_fn,
            "normalize": normalize,
            "n_docs": n_docs,
            "iters_run": iters_run,
        }

    if mode in ("auto", "local"):
        # One gated action, like train_bpe_spark's local path.
        head = feats_plan.limit(local_threshold + 1).collect()
        if len(head) <= local_threshold:
            import numpy as np

            n_docs = len(head)
            if n_docs == 0:
                raise ValueError(
                    "no trainable rows: every document has a NULL "
                    "label or embeds to no grams"
                )
            X = np.array([list(r["__xm"]) for r in head], dtype=np.int64)
            y = np.array([r["__y"] for r in head], dtype=np.float64)
            # int64 exactness guard for the r @ X gradient sums
            if int(np.abs(X).max()) * 1_000_000 * n_docs >= 2**63 - 1:
                raise ValueError(
                    "raw-count features too large for the exact int64 "
                    "local gradient — use normalize=True or "
                    "mode='distributed' (decimal sums)"
                )
            iters_run = 0
            for _ in range(iters):
                iters_run += 1
                b_arr = np.array(state["beta"], dtype=np.int64)
                prod = X * b_arr  # exact int64 per-entry products
                # same j-order float accumulation as the Spark fold
                acc = np.full(n_docs, float(state["bias_m"]) * 1e6)
                for j in range(dims):
                    acc += prod[:, j].astype(np.float64)
                p = 1.0 / (1.0 + np.exp(-(acc / 1e12)))
                r = np.rint((p - y) * 1e6).astype(np.int64)
                g_ints = (r @ X).tolist()  # exact int64 (guarded above)
                if not step(g_ints, int(r.sum()), n_docs):
                    break
            return result(n_docs, iters_run)
        if mode == "local":
            raise ValueError(
                f"mode='local' but more than {local_threshold} labeled "
                "rows; raise local_threshold or use "
                "mode='auto'/'distributed'"
            )

    feats = feats_plan.localCheckpoint(eager=True)
    n_docs = feats.count()
    if n_docs == 0:
        raise ValueError(
            "no trainable rows: every document has a NULL label or "
            "embeds to no grams"
        )
    iters_run = 0
    for _ in range(iters):
        iters_run += 1
        # margin: micro-beta · micro-x in 1e-12-units. Products compute
        # in double (a within-row left-to-right fold — deterministic
        # regardless of precision, and overflow-free for raw-count
        # features under normalize=False).
        margin = F.aggregate(
            F.zip_with(
                F.col("__xm"),
                F.array(*[F.lit(int(b)) for b in state["beta"]]),
                lambda x, b: x.cast("double") * b,
            ),
            F.lit(float(state["bias_m"]) * 1e6),
            lambda acc, x: acc + x,
        )
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-(margin / F.lit(1e12))))
        r = F.round((p - F.col("__y").cast("double")) * 1e6).cast("long")
        staged = feats.select(r.alias("__r"), "__xm")
        sums = staged.agg(
            F.sum(F.col("__r").cast("decimal(38,0)")).alias("__gb"),
            *[
                F.sum(
                    (
                        F.col("__r") * F.element_at(F.col("__xm"), j + 1)
                    ).cast("decimal(38,0)")
                ).alias(f"__g{j}")
                for j in range(dims)
            ],
        ).head()
        g_ints = [int(sums[f"__g{j}"] or 0) for j in range(dims)]
        if not step(g_ints, int(sums["__gb"] or 0), n_docs):
            break
    return result(n_docs, iters_run)


def bm25_score(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    query: str,
    k1: float = 1.2,
    b: float = 0.75,
    out_col: str = "bm25",
) -> DataFrame:
    """Okapi BM25 relevance of every document to a literal query string —
    the standard keyword-retrieval scorer (Robertson & Zaragoza 2009),
    used in data curation to pull topic-targeted subsets out of a corpus
    ("find me the docs about X" without an embedding index). Reference
    scope: pipeline extension beyond the reference's operator set.

    ``score(d) = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))``
    with the Lucene-style non-negative ``idf(t) = ln(1 + (N - df + 0.5)
    / (df + 0.5))``, ``dl`` the document's token count (lowercased
    whitespace split, empty artifacts dropped; NULL text counts 0),
    ``N`` ALL documents and ``avgdl`` the mean ``dl`` over them. Query
    terms are the distinct tokens of ``query`` under the same split.
    Only documents matching at least one term are returned:
    (id, n_terms_matched, out_col), score rounded to 6 places,
    unordered — sort downstream.

    100 TB shape: per-term counts are literal filter-size expressions in
    ONE scan-side projection (zero explode, zero shuffle — the
    classifier_score literal path); corpus statistics (N, avgdl, every
    df(t)) reduce to ONE row in a single aggregate that attaches via a
    broadcast cross join. The corpus is scanned twice (once for the
    stats row, once for scoring) — both scans are shuffle-free and
    column-pruned, which beats shuffling per-term postings at scale.
    For large OR-of-many-terms queries (hundreds+), prefer the posting
    shape: explode + join a term table (see classifier_score's
    weights_df path)."""
    qterms = sorted({t for t in query.lower().split() if t})
    if not qterms:
        raise ValueError("query must contain at least one token")
    if k1 < 0 or not 0.0 <= b <= 1.0:
        raise ValueError(f"need k1 >= 0 and 0 <= b <= 1, got k1={k1} b={b}")
    toks_raw = _tokens(F.col(text_col))
    staged = df.select(
        F.col(id_col),
        F.filter(toks_raw, lambda t: t != F.lit("")).alias("__toks"),
    )
    toks = F.col("__toks")
    def _tf(w: str, i: int) -> Column:
        # One-arg lambda per term (a two-arg lambda would be read as
        # F.filter's (element, index) form and clobber the captured term).
        return F.coalesce(
            _nsize(F.filter(toks, lambda t: t == F.lit(w)), guard=toks),
            F.lit(0),
        ).alias(f"__tf_{i}")

    tf_cols = [_tf(w, i) for i, w in enumerate(qterms)]
    per_doc = staged.select(
        F.col(id_col),
        F.coalesce(_nsize(toks), F.lit(0)).alias("__dl"),
        *tf_cols,
    )
    stats = F.broadcast(
        per_doc.agg(
            F.count(F.lit(1)).alias("__n"),
            F.avg("__dl").alias("__avgdl"),
            *[
                F.sum((F.col(f"__tf_{i}") > 0).cast("long")).alias(f"__df_{i}")
                for i in range(len(qterms))
            ],
        )
    )
    joined = per_doc.crossJoin(stats)
    n = F.col("__n").cast("double")
    score = F.lit(0.0)
    matched = F.lit(0)
    for i in range(len(qterms)):
        tf = F.col(f"__tf_{i}").cast("double")
        dfreq = F.col(f"__df_{i}").cast("double")
        idf = F.log(
            F.lit(1.0) + (n - dfreq + F.lit(0.5)) / (dfreq + F.lit(0.5))
        )
        norm = tf + F.lit(float(k1)) * (
            F.lit(1.0 - float(b))
            + F.lit(float(b)) * F.col("__dl").cast("double") / F.col("__avgdl")
        )
        score = score + F.when(
            tf > 0, idf * tf * F.lit(float(k1) + 1.0) / norm
        ).otherwise(F.lit(0.0))
        matched = matched + (F.col(f"__tf_{i}") > 0).cast("int")
    return joined.select(
        F.col(id_col),
        matched.alias("n_terms_matched"),
        F.round(score, 6).alias(out_col),
    ).where(F.col("n_terms_matched") > 0)


def _per_doc_term_counts(
    df: DataFrame, id_col: str, terms, out_name: str
) -> DataFrame:
    """(id, term, __n): per-document term occurrence counts computed
    SCAN-SIDE from the ``terms`` array expression — no shuffle.

    Each document is ONE input row, so its complete term multiset is
    already partition-local; a ``groupBy(id, term)`` pre-aggregation
    (the round-12 shape) re-shuffled every distinct (doc, term) pair —
    a corpus-scale exchange of term TEXT — only to compute counts the
    scan already had. Instead: sort the array, find the distinct-run
    boundaries (positions where ``s[i] != s[i-1]``), and emit one
    (term, run-length) struct per distinct term. ``F.get`` (0-based,
    NULL out of range) keeps the expression ANSI-safe. A NULL terms
    array, or an empty one, emits no rows (the explode drops them),
    matching the exploded-rows semantics.

    The sorted array and the boundary array are materialized as REAL
    projected columns (two stacked selects), never inlined expressions:
    every `F.get` inside the run-length lambda references them, and an
    inlined copy re-evaluates the whole sort/filter per element access —
    O(d²·log d) per document (measured: a single-expression version hung
    the sf0.001 oracle sweep). CollapseProject keeps the split because
    the produced columns are non-cheap and multiply referenced."""
    s = F.col("__s")
    bnd = F.col("__b")
    staged = df.select(
        F.col(id_col), F.array_sort(terms).alias("__s")
    ).select(
        F.col(id_col),
        s,
        F.filter(
            F.sequence(F.lit(0), F.size(s) - 1),
            lambda i: (i == F.lit(0)) | (F.get(s, i) != F.get(s, i - 1)),
        ).alias("__b"),
    )
    entries = F.transform(
        bnd,
        lambda x, j: F.struct(
            F.get(s, x).alias(out_name),
            (F.coalesce(F.get(bnd, j + 1), F.size(s)) - x)
            .cast("long")
            .alias("__n"),
        ),
    )
    return staged.select(
        F.col(id_col),
        F.explode(F.when(F.size(s) >= 1, entries)).alias("__e"),
    ).select(
        F.col(id_col),
        F.col("__e." + out_name).alias(out_name),
        F.col("__e.__n").alias("__n"),
    )


def word_frequencies(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    top_k: int | None = None,
) -> DataFrame:
    """Corpus-level vocabulary table: (word, n_occurrences, n_docs),
    ordered by (n_occurrences desc, word asc) and optionally truncated to
    the ``top_k`` head — the input to stopword curation, vocabulary-growth
    tracking, and frequency-based quality filters.

    100 TB shape: explode is scan-local; per-doc occurrence counts
    pre-aggregate BEFORE the global shuffle (one row per distinct word per
    doc crosses the wire, with n_docs as a count and n_occurrences as a
    sum — no count-distinct shuffle of raw occurrences); word keys are
    near-uniform, so no salting needed. The scan-side sorted-run-length
    alternative (:func:`_per_doc_term_counts`, used by
    :func:`ngram_frequencies`) was measured SLOWER here: unigrams repeat
    heavily within a document, so the (doc, word) pre-agg compresses the
    exchange far below gram scale while the per-doc token sort costs
    O(d log d) string compares — r13 A/B 0.60s → 0.85s at sf0.1.
    ``top_k`` is a driver-side limit on sorted output — fine for
    vocabulary heads; leave it ``None`` to write the full table."""
    per_doc = (
        df.select(
            F.col(id_col),
            F.explode(_tokens(F.col(text_col))).alias("word"),
        )
        .where(F.col("word") != "")
        .groupBy(id_col, "word")
        .agg(F.count("*").alias("__n"))
    )
    out = (
        per_doc.groupBy("word")
        .agg(
            F.sum("__n").alias("n_occurrences"),
            F.count("*").alias("n_docs"),
        )
        .orderBy(F.desc("n_occurrences"), F.asc("word"))
    )
    return out.limit(top_k) if top_k is not None else out


def ngram_frequencies(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    n: int = 3,
    top_k: int | None = None,
    min_docs: int = 1,
) -> DataFrame:
    """Corpus-level n-gram table: (ngram, n_occurrences, n_docs), ordered
    by (n_occurrences desc, ngram asc) — the boilerplate miner. Frequent
    long n-grams that recur across many documents are navigation chrome,
    cookie banners and license headers; the head of this table is what a
    line/span blocklist gets curated from. Only FULL n-grams count: a
    document with fewer than ``n`` tokens contributes nothing (unlike the
    shingle helpers, which degrade to shorter tails). ``min_docs`` drops
    grams seen in fewer documents — within-document repetition alone is
    repetition_signals' job, not boilerplate.

    100 TB shape: the word_frequencies plan one gram-width up — gram
    construction is scan-local (tokens slice m times per row, no
    explode-then-window); per-doc occurrence counts are SCAN-SIDE array
    arithmetic (:func:`_per_doc_term_counts`), so ONE global shuffle
    carries map-side-partial-aggregated gram rows and doc frequency is a
    plain count, never a count-distinct expand. Grams are near-unique
    within a document, so the (doc, gram) pre-agg exchange this replaces
    shipped every gram occurrence (corpus scale); r13 A/B at sf0.1 is
    flat (5.05s → 5.04s) with one less Exchange and doc_id pruned from
    the scan. Gram keys are near-uniform; no salting needed."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    toks = F.filter(_tokens(F.col(text_col)), lambda x: x != "")
    sz = _nsize(toks, F.col(text_col).isNotNull())
    grams = F.when(
        sz >= n,
        F.transform(
            F.sequence(F.lit(0), sz - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    )
    per_doc = _per_doc_term_counts(df, id_col, grams, "ngram")
    out = (
        per_doc.groupBy("ngram")
        .agg(
            F.sum("__n").alias("n_occurrences"),
            F.count("*").alias("n_docs"),
        )
        .where(F.col("n_docs") >= min_docs)
        .orderBy(F.desc("n_occurrences"), F.asc("ngram"))
    )
    return out.limit(top_k) if top_k is not None else out


def hash_embed(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    dims: int = 64,
    ngram: int = 1,
    hash_fn: str = "xxhash64",
    normalize: bool = True,
    round_to: int | None = 6,
    out_col: str = "embedding",
) -> DataFrame:
    """Deterministic text embeddings via SIGNED FEATURE HASHING
    (the hashing trick, Weinberger et al. 2009): every word n-gram maps
    to one of ``dims`` buckets by hash, contributes +1/-1 by an
    independent sign hash (the signs make collisions cancel in
    expectation, keeping inner products unbiased), counts accumulate,
    and the vector optionally L2-normalizes. Returns (id, out_col:
    array<double>); documents with zero grams emit NO row (the
    keep-unscored convention of the logprob family).

    This is the dependency-free embedder that closes the
    text -> embedding -> ANN/semantic-dedup loop inside the engine:
    ``hash_embed`` -> :func:`similarity.semantic_dedup` /
    :func:`similarity.cosine_topk` works end-to-end with no external
    model, and because buckets/signs derive from the portable content
    hash (``hash_fn='md5'``), an external SQL oracle reproduces every
    vector bit-for-bit. A trained-model embedder slots in at the same
    (id, vector) boundary.

    100 TB shape: gram construction is scan-local; one (id, bucket)
    pre-aggregated shuffle (at most ``min(dims, grams)`` rows per doc)
    plus the per-doc gather — the word_frequencies plan keyed by doc.
    The vector materializes from a bucket->weight map with one
    ``sequence(0, dims-1)`` transform; normalization binds the raw
    vector once (single-element-transform trick) so the norm fold does
    not re-evaluate it per element."""
    from timefence_spark.operators.dedup import _content_hash

    if dims < 2:
        raise ValueError(f"dims must be >= 2, got {dims}")
    if ngram < 1:
        raise ValueError(f"ngram must be >= 1, got {ngram}")
    toks = F.filter(_tokens(F.col(text_col)), lambda x: x != "")
    sz = _nsize(toks, F.col(text_col).isNotNull())
    if ngram == 1:
        grams = F.when(sz >= 1, toks)
    else:
        grams = F.when(
            sz >= ngram,
            F.transform(
                F.sequence(F.lit(0), sz - ngram),
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, ngram)),
            ),
        )
    g = df.select(F.col(id_col), F.explode(grams).alias("__g"))
    # Independent salts for bucket and sign: deriving both from ONE hash
    # (e.g. h % dims and h % 2) correlates sign with bucket parity for
    # even dims, biasing every even-bucket weight positive.
    bucket = F.pmod(
        _content_hash(F.concat(F.lit("b:"), F.col("__g")), hash_fn),
        F.lit(int(dims)),
    )
    sign = F.when(
        F.pmod(
            _content_hash(F.concat(F.lit("s:"), F.col("__g")), hash_fn),
            F.lit(2),
        )
        == 0,
        F.lit(1.0),
    ).otherwise(F.lit(-1.0))
    per_bucket = (
        g.select(F.col(id_col), bucket.alias("__b"), sign.alias("__s"))
        .groupBy(id_col, "__b")
        .agg(F.sum("__s").alias("__w"))
    )
    gathered = per_bucket.groupBy(id_col).agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("__b"), F.col("__w")))
        ).alias("__m")
    )
    # try_element_at: under spark.sql.ansi.enabled=true a plain
    # element_at on a missing map key raises MAP_KEY_DOES_NOT_EXIST —
    # and most keys ARE missing here (the map holds only touched
    # buckets). try_ returns NULL on both configs (ADVICE r12).
    raw = (
        f"transform(sequence(0, {int(dims) - 1}), "
        "i -> coalesce(try_element_at(`__m`, i), 0D))"
    )
    if normalize:
        # All-zero vectors (signs cancelled in every bucket) stay zero
        # instead of dividing by a zero norm.
        vec = (
            f"element_at(transform(array({raw}), V -> "
            "element_at(transform("
            "array(sqrt(aggregate(V, 0D, (acc, x) -> acc + x * x))), "
            "N -> IF(N = 0D, V, transform(V, x -> x / N))), 1)), 1)"
        )
    else:
        vec = raw
    if round_to is not None:
        vec = f"transform({vec}, x -> round(x, {int(round_to)}))"
    return gathered.select(
        F.col(id_col), F.expr(vec).alias(out_col)
    )


# Default code-keyword lexicon for code_signals: identifiers common in
# source code across mainstream languages and RARE in prose (English
# stopword-ish keywords like if/for/while/true are deliberately absent —
# they fire on every paragraph). A plan literal like the lang-id
# markers — swap per corpus.
CODE_KEYWORDS: tuple[str, ...] = (
    "def", "return", "import", "const", "function", "void", "int",
    "float", "bool", "public", "static", "struct", "null", "nullptr",
    "print", "println", "printf", "lambda", "elif", "endif",
    "namespace", "typedef", "async", "await", "len", "args", "kwargs",
)


def code_signals(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    keywords: tuple[str, ...] | list[str] = CODE_KEYWORDS,
    score_threshold: float = 0.45,
) -> DataFrame:
    """Code-vs-prose routing signals — pretraining pipelines treat code
    as its own stream (different dedup granularity, different quality
    gates, separate mixing weight), so the first structural pass over a
    crawl tags probable source code. Returns ``(id, n_lines,
    indent_frac, punct_density, kw_hits, code_score, is_code)``:

    * ``indent_frac`` — fraction of non-empty lines starting with a tab
      or 4 spaces (block structure);
    * ``punct_density`` — ``{};()=`` characters per non-empty line
      (counted by length-difference, exactly replayable — no regex);
    * ``kw_hits`` — distinct ``keywords`` present among the lowercased
      identifier tokens (split on non-``[a-z0-9_]`` runs, so
      ``print(add(1,`` yields ``print``/``add``/``1`` — code glues
      identifiers to punctuation); a plan-literal lexicon, like
      lang_id's markers;
    * ``code_score`` — mean of three capped sub-scores
      (indent_frac, punct_density/4 capped at 1, kw_hits/5 capped at 1),
      rounded to 6; ``is_code = code_score >= score_threshold``.

    NULL text yields NULL signals (no row dropped — routing wants every
    id back). A heuristic, deliberately: it runs at scan speed with
    zero shuffle on 100 TB, and mis-taggings are cheap because both
    streams get deduplicated and quality-gated downstream anyway."""
    lines = F.split(F.col(text_col), "\n")
    staged = df.select(
        F.col(id_col),
        F.col(text_col).isNotNull().alias("__ok"),
        F.coalesce(F.col(text_col), F.lit("")).alias("__t"),
        F.filter(lines, lambda l: F.trim(l) != "").alias("__lines"),
    )
    n_lines = F.size("__lines")
    indented = F.size(
        F.filter(
            F.col("__lines"),
            lambda l: l.startswith("\t") | l.startswith("    "),
        )
    )
    punct = F.lit(0)
    for ch in "{};()=":
        punct = punct + (
            F.length("__t")
            - F.length(F.replace(F.col("__t"), F.lit(ch), F.lit("")))
        )
    toks = F.array_distinct(
        F.filter(
            F.split(F.lower(F.col("__t")), r"[^a-z0-9_]+"),
            lambda t: t != "",
        )
    )
    kw = F.size(
        F.array_intersect(
            toks, F.array(*[F.lit(k) for k in keywords])
        )
    )
    staged = staged.select(
        F.col(id_col), "__ok",
        n_lines.alias("n_lines"),
        F.when(n_lines > 0, indented.cast("double") / n_lines)
        .otherwise(F.lit(0.0))
        .alias("__indent"),
        F.when(n_lines > 0, punct.cast("double") / n_lines)
        .otherwise(F.lit(0.0))
        .alias("__punct"),
        kw.alias("__kw"),
    )
    score = F.round(
        (
            F.col("__indent")
            + F.least(F.col("__punct") / F.lit(4.0), F.lit(1.0))
            + F.least(F.col("__kw") / F.lit(5.0), F.lit(1.0))
        )
        / F.lit(3.0),
        6,
    )
    return staged.select(
        F.col(id_col),
        F.when(F.col("__ok"), F.col("n_lines")).alias("n_lines"),
        F.when(F.col("__ok"), F.round(F.col("__indent"), 6)).alias(
            "indent_frac"
        ),
        F.when(F.col("__ok"), F.round(F.col("__punct"), 6)).alias(
            "punct_density"
        ),
        F.when(F.col("__ok"), F.col("__kw")).alias("kw_hits"),
        F.when(F.col("__ok"), score).alias("code_score"),
        F.when(F.col("__ok"), score >= F.lit(float(score_threshold)))
        .alias("is_code"),
    )


def corpus_stats(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    exact: bool = True,
) -> DataFrame:
    """One-row corpus health summary: ``(n_docs, n_empty, n_chars,
    n_tokens, mean_tokens, p50_tokens, p90_tokens)`` — the numbers a
    pipeline run logs before and after each cleaning stage. ``n_empty``
    counts NULL/whitespace-only documents (they contribute 0 tokens).

    100 TB shape: ONE scan-side projection (token counts per doc) into
    ONE aggregation — no joins, no window. ``exact=True`` (default)
    computes exact percentiles (one sort-based aggregate buffer;
    replayable by quantile_cont); ``exact=False`` switches to the
    approx_percentile sketch — bounded memory, mergeable partials, the
    right call at petabyte scale where a last-decimal-exact median is
    not worth a global sort."""
    toks = F.filter(_tokens(F.col(text_col)), lambda x: x != "")
    staged = df.select(
        F.col(id_col),
        F.col(text_col).isNull().alias("__isnull"),
        F.coalesce(F.length(text_col), F.lit(0)).alias("__chars"),
        F.when(F.col(text_col).isNull(), F.lit(0))
        .otherwise(F.size(toks))
        .alias("__ntok"),
    )
    perc = F.percentile if exact else F.percentile_approx
    return staged.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.when(F.col("__isnull") | (F.col("__ntok") == 0), 1)
            .otherwise(0)
        ).alias("n_empty"),
        F.sum("__chars").alias("n_chars"),
        F.sum("__ntok").alias("n_tokens"),
        F.round(F.avg("__ntok"), 6).alias("mean_tokens"),
        F.round(perc(F.col("__ntok"), F.lit(0.5)), 6).alias("p50_tokens"),
        F.round(perc(F.col("__ntok"), F.lit(0.9)), 6).alias("p90_tokens"),
    )


def gram_duplication(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    n: int = 13,
    min_docs: int = 2,
) -> DataFrame:
    """Per-document cross-corpus duplication rate: ``(id, n_grams,
    dup_frac)`` where ``dup_frac`` is the fraction of the document's
    word ``n``-grams (occurrence-weighted) that appear in at least
    ``min_docs`` documents corpus-wide. The memorization-risk signal of
    Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
    Better"): documents whose 13-grams are mostly shared are boilerplate
    or near-copies that near-dup banding may have missed, and are the
    first candidates for down-weighting. Documents with fewer than ``n``
    tokens emit no row (no full grams to judge — same contract as
    :func:`ngram_frequencies`).

    100 TB shape: gram construction is scan-local (the
    ngram_frequencies plan); one (doc, gram) pre-agg shuffle, one gram
    doc-frequency aggregation (plain count over the pre-agg — never a
    count-distinct expand), one gram-keyed equi-join back (AQE-handled;
    gram keys near-uniform), one groupBy(doc). Nothing driver-side."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    toks = F.filter(_tokens(F.col(text_col)), lambda x: x != "")
    sz = _nsize(toks, F.col(text_col).isNotNull())
    grams = F.when(
        sz >= n,
        F.transform(
            F.sequence(F.lit(0), sz - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    )
    per_doc = (
        df.select(F.col(id_col), F.explode(grams).alias("ngram"))
        .groupBy(id_col, "ngram")
        .agg(F.count("*").alias("__n"))
    )
    gram_docs = per_doc.groupBy("ngram").agg(
        F.count("*").alias("__docs")
    )
    return (
        per_doc.join(gram_docs, "ngram")
        .groupBy(id_col)
        .agg(
            F.sum("__n").alias("n_grams"),
            F.round(
                F.sum(
                    F.when(F.col("__docs") >= min_docs, F.col("__n"))
                    .otherwise(F.lit(0))
                ).cast("double")
                / F.sum("__n"),
                6,
            ).alias("dup_frac"),
        )
    )


def unigram_logprob(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    lm: DataFrame | None = None,
    smoothing_k: float = 1.0,
    deterministic: bool = False,
) -> DataFrame:
    """Per-document fluency under a unigram language model — the cheap
    tier of the CCNet/perplexity-style quality filter family.

    The LM is a (word, n_occurrences) table: pass one (e.g. trained on a
    trusted corpus via :func:`word_frequencies`) or leave ``lm=None`` to
    score the corpus against its own unigram statistics (a second scan of
    ``df``). Add-k smoothing: ``p(w) = (n_w + k) / (N + k * (V + 1))``
    with the ``+1`` reserving mass for out-of-vocabulary words.

    Returns ``(id, n_tokens, oov_frac, mean_nll)`` where ``mean_nll`` is
    the mean of ``-ln p(w)`` over the document's tokens (lower = more
    fluent under the LM) and ``oov_frac`` the fraction of tokens missing
    from the LM. Token-less documents (NULL/empty/whitespace-only text)
    produce NO output row — they have no tokens to score; callers who
    need every id back should left-join this result (as
    ``Corpus.filter_fluency`` does via its anti-join on over-threshold
    ids, which keeps unscored documents).

    Physical shape: tokens explode scan-side and pre-aggregate to one row
    per (doc, distinct word) before any join; the LM attaches with an
    un-hinted equi-join (AQE broadcasts vocabulary-sized tables); one
    groupBy(doc) finishes. The LM's two scalars (N, V) ride in the plan
    as a broadcast one-row cross join, so the whole call stays lazy.

    ``deterministic=True`` makes the per-document sum reproducible across
    engines and partitionings: per-word contributions are collected,
    sorted by word, and folded in that order, so IEEE double addition
    runs in one canonical sequence (used by the DuckDB oracle entry).
    The default sums in shuffle order — the right choice at scale, where
    a last-ulp-deterministic mean is not worth a per-doc array sort."""
    per_doc_word = (
        df.select(
            F.col(id_col), F.explode(_tokens(F.col(text_col))).alias("word")
        )
        .where(F.col("word") != "")
        .groupBy(id_col, "word")
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    if lm is None:
        # Own-corpus LM: re-aggregate the scorer's own (doc, word)
        # table instead of a second corpus scan (word_frequencies'
        # n_occurrences is exactly sum(__cnt) over docs; round 13,
        # guide §2.4 — the shared (id, word) exchange is planned once).
        lm = per_doc_word.groupBy("word").agg(
            F.sum("__cnt").cast("long").alias("__n")
        )
    else:
        lm = lm.select(
            "word", F.col("n_occurrences").cast("long").alias("__n")
        )
    # The LM's two scalars (N, V) stay IN the plan as a broadcast one-row
    # cross join: an eager .first() here would run the whole LM
    # aggregation as an extra job at call time and again at action time,
    # doubling the corpus scan for lm=None and breaking laziness.
    totals = F.broadcast(
        lm.agg(
            F.coalesce(F.sum("__n"), F.lit(0).cast("long")).alias("__N"),
            F.count(F.lit(1)).alias("__V"),
        )
    )
    denom = (
        F.col("__N")
        + F.lit(float(smoothing_k)) * (F.col("__V") + F.lit(1))
    ).cast("double")
    # The joined copy renames __n: lm's lineage also feeds the totals
    # aggregate, and Spark's self-join disambiguation would otherwise see
    # two attributes named __n and refuse to resolve the reference.
    joined = per_doc_word.join(
        lm.withColumnRenamed("__n", "__n_word"), "word", "left"
    ).crossJoin(totals)
    nll_word = -F.log(
        (F.coalesce(F.col("__n_word"), F.lit(0)) + F.lit(float(smoothing_k)))
        / denom
    )
    oov = F.when(F.col("__n_word").isNull(), F.col("__cnt")).otherwise(F.lit(0))
    grouped = joined.groupBy(id_col).agg(
        F.sum("__cnt").alias("n_tokens"),
        F.sum(oov).alias("__oov"),
        (
            F.collect_list(F.struct(F.col("word"), (F.col("__cnt") * nll_word).alias("c")))
            if deterministic
            else F.sum(F.col("__cnt") * nll_word)
        ).alias("__nll"),
    )
    if deterministic:
        nll_total = F.aggregate(
            F.array_sort(F.col("__nll")), F.lit(0.0), lambda acc, s: acc + s["c"]
        )
    else:
        nll_total = F.col("__nll")
    return grouped.select(
        F.col(id_col),
        F.col("n_tokens"),
        F.round(F.col("__oov").cast("double") / F.col("n_tokens"), 6).alias(
            "oov_frac"
        ),
        F.round(nll_total / F.col("n_tokens"), 6).alias("mean_nll"),
    )


def _bigram_pairs(df: DataFrame, *, id_col: str, text_col: str) -> DataFrame:
    """(id, w_prev, word) — one row per adjacent token pair. Empty split
    artifacts (leading/trailing whitespace) are filtered BEFORE pairing
    so they cannot break adjacency; \\s+ splitting guarantees no interior
    empties. Docs with < 2 tokens emit no pairs. Scan-side: filter +
    transform + one posexplode, zero shuffle."""
    toks_raw = _tokens(F.col(text_col))
    staged = df.select(
        F.col(id_col),
        F.filter(toks_raw, lambda t: t != F.lit("")).alias("__toks"),
    )
    toks = F.col("__toks")
    n = _nsize(toks)
    grams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(2), F.greatest(n, F.lit(2))),
            lambda i: F.struct(
                F.element_at(toks, i - 1).alias("w_prev"),
                F.element_at(toks, i).alias("word"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w_prev:string,word:string>>"))
    return staged.select(F.col(id_col), F.explode(grams).alias("__g")).select(
        id_col, F.col("__g.w_prev"), F.col("__g.word")
    )


def bigram_frequencies(
    df: DataFrame, *, id_col: str, text_col: str, top_k: int | None = None
) -> DataFrame:
    """Corpus-wide bigram table (w_prev, word, n_occurrences) — the
    training step for :func:`bigram_logprob`'s LM, the bigram analogue of
    :func:`word_frequencies`. Deterministic order: count desc, then
    (w_prev, word) asc. One explode + one (w_prev, word) shuffle."""
    out = (
        _bigram_pairs(df, id_col=id_col, text_col=text_col)
        .groupBy("w_prev", "word")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("w_prev"), F.asc("word"))
    )
    return out.limit(top_k) if top_k is not None else out


def bigram_logprob(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    lm: DataFrame | None = None,
    lm_unigram: DataFrame | None = None,
    lam: float = 0.5,
    smoothing_k: float = 1.0,
    deterministic: bool = False,
) -> DataFrame:
    """Per-document fluency under an INTERPOLATED bigram language model —
    the middle tier of the CCNet-style perplexity filter family (CCNet,
    Wenzek et al. 2020, filters on LM perplexity; a lambda-interpolated
    bigram with unigram backoff is the standard dependency-free
    approximation one rung above :func:`unigram_logprob`).

    ``p(w_i | w_{i-1}) = lam * p_bi + (1 - lam) * p_uni`` where
    ``p_bi = n(w_{i-1}, w_i) / n(w_{i-1}, ·)`` (0 for unseen context or
    pair — the unigram interpolation term keeps every probability
    positive) and ``p_uni`` is the same add-k unigram as
    :func:`unigram_logprob`. ``lm`` is a (w_prev, word, n_occurrences)
    table from :func:`bigram_frequencies` (``None``: the corpus's own
    statistics); ``lm_unigram`` the matching (word, n_occurrences) table
    (``None``: derived the same way).

    Returns ``(id, n_bigrams, oov_frac, mean_nll)`` over the document's
    BIGRAM positions (transitions): ``oov_frac`` = fraction of
    transitions unseen in the bigram LM, ``mean_nll`` the mean
    ``-ln p``. Documents with < 2 tokens have no transitions and produce
    NO row (the keep-unscored policy of ``Corpus.filter_fluency``
    applies downstream).

    Physical shape mirrors :func:`unigram_logprob`: pairs explode
    scan-side and pre-aggregate to one row per (doc, w_prev, word)
    before any join; the bigram LM, its per-context totals, and the
    unigram LM attach with un-hinted equi-joins (AQE broadcasts
    vocabulary-sized tables); one groupBy(doc) finishes.
    ``deterministic=True`` folds each document's contributions in
    (w_prev, word)-sorted order for bit-reproducible external replay."""
    if not 0.0 <= lam <= 1.0:
        raise ValueError(f"lam must be in [0, 1], got {lam}")
    if lm is None and lm_unigram is None:
        # FUSED own-corpus path (round 13, guide §2.4): the bigram LM,
        # the unigram LM, and the per-doc scoring table all derive from
        # ONE padded-window explode + (id, w1, word) pre-aggregation —
        # the old path re-scanned and re-exploded the corpus three
        # times. include_tail keeps the final token position so the
        # 1-prefix sums reproduce word_frequencies' counts exactly.
        pdw = _padded_window_counts(
            df, id_col=id_col, text_col=text_col, n=2, include_tail=True
        )
        # T2 mirrors the KN path's type table: one (w1, word) re-agg of
        # the shared pre-agg; __wlen >= 2 (an aggregate column, so the
        # predicate stays ABOVE the shared exchange) selects real pairs.
        T2 = pdw.groupBy("w1", "word").agg(
            F.sum("__cnt").alias("__w"), F.max("__wlen").alias("__wlen")
        )
        # __wlen >= 1 is vacuously true; referencing it keeps the
        # max(__wlen) buffer in this consumer's copy of the shared
        # pre-aggregation (column pruning would otherwise drop it and
        # split the shared exchange). coalesce(key, '') as in the KN
        # path: block inferred isnotnull(key) build-side filters.
        uni = (
            T2.where(F.col("__wlen") >= 1)
            .groupBy(F.coalesce(F.col("w1"), F.lit("")).alias("word"))
            .agg(F.sum("__w").cast("long").alias("__n_uni"))
        )
        bi = T2.where(F.col("__wlen") >= 2).select(
            F.coalesce(F.col("w1"), F.lit("")).alias("w_prev"),
            F.coalesce(F.col("word"), F.lit("")).alias("word"),
            F.col("__w").cast("long").alias("__n_bi"),
        )
        per_doc_pair = pdw.where(F.col("__wlen") >= 2).select(
            F.col(id_col), F.col("w1").alias("w_prev"), "word", "__cnt"
        )
    else:
        if lm is None:
            lm = bigram_frequencies(df, id_col=id_col, text_col=text_col)
        if lm_unigram is None:
            lm_unigram = word_frequencies(
                df, id_col=id_col, text_col=text_col
            )
        bi = lm.select(
            "w_prev", "word",
            F.col("n_occurrences").cast("long").alias("__n_bi"),
        )
        uni = lm_unigram.select(
            "word", F.col("n_occurrences").cast("long").alias("__n_uni")
        )
        per_doc_pair = (
            _bigram_pairs(df, id_col=id_col, text_col=text_col)
            .groupBy(id_col, "w_prev", "word")
            .agg(F.count(F.lit(1)).alias("__cnt"))
        )
    ctx = bi.groupBy("w_prev").agg(F.sum("__n_bi").alias("__n_ctx"))
    totals = F.broadcast(
        uni.agg(
            F.coalesce(F.sum("__n_uni"), F.lit(0).cast("long")).alias("__N"),
            F.count(F.lit(1)).alias("__V"),
        )
    )
    denom = (
        F.col("__N") + F.lit(float(smoothing_k)) * (F.col("__V") + F.lit(1))
    ).cast("double")
    joined = (
        per_doc_pair.join(bi, ["w_prev", "word"], "left")
        .join(ctx, "w_prev", "left")
        .join(uni, "word", "left")
        .crossJoin(totals)
    )
    p_uni = (
        F.coalesce(F.col("__n_uni"), F.lit(0)) + F.lit(float(smoothing_k))
    ) / denom
    p_bi = F.coalesce(
        F.col("__n_bi").cast("double") / F.col("__n_ctx").cast("double"),
        F.lit(0.0),
    )
    nll_pair = -F.log(F.lit(float(lam)) * p_bi + F.lit(1.0 - float(lam)) * p_uni)
    oov = F.when(F.col("__n_bi").isNull(), F.col("__cnt")).otherwise(F.lit(0))
    grouped = joined.groupBy(id_col).agg(
        F.sum("__cnt").alias("n_bigrams"),
        F.sum(oov).alias("__oov"),
        (
            F.collect_list(
                F.struct(
                    F.col("w_prev"),
                    F.col("word"),
                    (F.col("__cnt") * nll_pair).alias("c"),
                )
            )
            if deterministic
            else F.sum(F.col("__cnt") * nll_pair)
        ).alias("__nll"),
    )
    if deterministic:
        nll_total = F.aggregate(
            F.array_sort(F.col("__nll")), F.lit(0.0), lambda acc, s: acc + s["c"]
        )
    else:
        nll_total = F.col("__nll")
    return grouped.select(
        F.col(id_col),
        F.col("n_bigrams"),
        F.round(F.col("__oov").cast("double") / F.col("n_bigrams"), 6).alias(
            "oov_frac"
        ),
        F.round(nll_total / F.col("n_bigrams"), 6).alias("mean_nll"),
    )


def _trigram_pairs(df: DataFrame, *, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, w2, word) — one row per adjacent token TRIPLE, the
    trigram analogue of :func:`_bigram_pairs` (same empty-token filter,
    same scan-side filter + transform + one posexplode, zero shuffle).
    Docs with < 3 tokens emit no rows."""
    toks_raw = _tokens(F.col(text_col))
    staged = df.select(
        F.col(id_col),
        F.filter(toks_raw, lambda t: t != F.lit("")).alias("__toks"),
    )
    toks = F.col("__toks")
    n = _nsize(toks)
    grams = F.when(
        n >= 3,
        F.transform(
            F.sequence(F.lit(3), F.greatest(n, F.lit(3))),
            lambda i: F.struct(
                F.element_at(toks, i - 2).alias("w1"),
                F.element_at(toks, i - 1).alias("w2"),
                F.element_at(toks, i).alias("word"),
            ),
        ),
    ).otherwise(
        F.array().cast("array<struct<w1:string,w2:string,word:string>>")
    )
    return staged.select(F.col(id_col), F.explode(grams).alias("__g")).select(
        id_col, F.col("__g.w1"), F.col("__g.w2"), F.col("__g.word")
    )


def trigram_frequencies(
    df: DataFrame, *, id_col: str, text_col: str, top_k: int | None = None
) -> DataFrame:
    """Corpus-wide trigram table (w1, w2, word, n_occurrences) — the
    training step for :func:`trigram_logprob`'s LM. Deterministic order:
    count desc, then (w1, w2, word) asc. One explode + one
    (w1, w2, word) shuffle."""
    out = (
        _trigram_pairs(df, id_col=id_col, text_col=text_col)
        .groupBy("w1", "w2", "word")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(
            F.desc("n_occurrences"), F.asc("w1"), F.asc("w2"), F.asc("word")
        )
    )
    return out.limit(top_k) if top_k is not None else out


def trigram_logprob(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    lm: DataFrame | None = None,
    lm_bigram: DataFrame | None = None,
    discount: float = 0.75,
    smoothing_k: float = 1.0,
    deterministic: bool = False,
) -> DataFrame:
    """Per-document fluency under an interpolated KNESER-NEY trigram LM
    (VERDICT r11 item 6) — the top rung of the CCNet-style fluency
    ladder (Wenzek et al. 2020 filter on a 5-gram KenLM; interpolated
    KN with a fixed discount is KenLM's own smoothing family, and a
    trigram over the bounded gram-type tables is the honest
    shuffle-once Spark version).

    Standard interpolated KN (Chen & Goodman 1999), fixed discount D:

    * ``p3(w|u,v) = (max(c(uvw)-D, 0) + D * N1p(uv.) * p2(w|v)) / c(uv.)``
      when context (u,v) was seen, else ``p2(w|v)``;
    * ``p2(w|v) = (max(N1p(.vw)-D, 0) + D * T(v) * p1(w)) / N1p(.v.)``
      over CONTINUATION counts (distinct left-contexts, the KN insight:
      "how many contexts does this bigram continue?"), else ``p1(w)``;
    * ``p1(w) = (N1p(.w) + k) / (B + k*(V+1))`` — the continuation
      unigram with the same add-k floor as :func:`unigram_logprob`
      (B = distinct bigram types), so every probability is positive and
      unseen words never zero the product.

    ``lm`` is a (w1, w2, word, n_occurrences) table from
    :func:`trigram_frequencies`; ``lm_bigram`` the matching bigram table
    (both ``None``: this corpus's own statistics). Pass BOTH or NEITHER
    — the continuation-unigram backoff (N1p(.w), B, V) derives from
    ``lm_bigram``, so supplying only ``lm`` would silently mix the
    external trigram model with the scored corpus's own bigram
    statistics (ADVICE r12); it raises instead. The two tables must
    come from the SAME corpus, and a ``top_k``-truncated ``lm`` yields
    inconsistent context totals (c(uv.) under-counts dropped types) —
    train untruncated, like :func:`bigram_logprob` documents. All KN
    statistics — context totals, continuation counts, type counts —
    derive from those two TYPE tables with vocabulary-scale
    aggregations; nothing corpus-sized is re-shuffled.

    Returns ``(id, n_trigrams, oov_frac, mean_nll)`` over the document's
    trigram positions: ``oov_frac`` = fraction unseen at the trigram
    level, ``mean_nll`` the mean ``-ln p3``. Documents with < 3 tokens
    produce NO row (the keep-unscored policy downstream).
    ``deterministic=True`` folds contributions in (w1, w2, word)-sorted
    order for bit-reproducible external replay — same contract as
    :func:`unigram_logprob`/:func:`bigram_logprob`."""
    if not 0.0 < discount < 1.0:
        raise ValueError(f"discount must be in (0, 1), got {discount}")
    if (lm is None) != (lm_bigram is None):
        raise ValueError(
            "pass BOTH lm and lm_bigram (from the same corpus) or "
            "NEITHER — the KN unigram backoff derives from lm_bigram, "
            "and mixing an external trigram model with this corpus's "
            "own bigrams scores under two different models"
        )
    if lm is None:
        # Own-corpus statistics: exactly ngram_logprob at n=3 (the
        # docstrings' stated identity) — route through the shared
        # fused scorer so the ladder derives from ONE padded-window
        # explode instead of three corpus scans (round 13, guide §2.4).
        return _kn_ngram_scored(
            df, id_col=id_col, text_col=text_col, n=3, lms=None,
            min_count=1, discount=discount, smoothing_k=smoothing_k,
            deterministic=deterministic, n_out_col="n_trigrams",
        )
    D = F.lit(float(discount))
    tri = lm.select(
        "w1", "w2", "word",
        F.col("n_occurrences").cast("long").alias("__n_tri"),
    )
    # c(uv.) and N1p(uv.) — one agg over the trigram type table
    ctx3 = tri.groupBy("w1", "w2").agg(
        F.sum("__n_tri").alias("__n_ctx3"),
        F.count(F.lit(1)).alias("__t_ctx3"),
    )
    # N1p(.vw): distinct u per (v, w); N1p(.v.) and T(v) follow from it
    cont_bi = tri.groupBy(
        F.col("w2").alias("__v"), F.col("word").alias("__w")
    ).agg(F.count(F.lit(1)).alias("__n_cbi"))
    cont_ctx = cont_bi.groupBy("__v").agg(
        F.sum("__n_cbi").alias("__n_cctx"),
        F.count(F.lit(1)).alias("__t_cctx"),
    )
    bi = lm_bigram.select("w_prev", "word")
    # N1p(.w): distinct left-contexts per word, from the bigram TYPE set
    cont_uni = bi.groupBy("word").agg(F.count(F.lit(1)).alias("__n_cu"))
    totals = F.broadcast(
        cont_uni.agg(
            F.coalesce(F.sum("__n_cu"), F.lit(0).cast("long")).alias("__B"),
            F.count(F.lit(1)).alias("__V"),
        )
    )
    denom1 = (
        F.col("__B") + F.lit(float(smoothing_k)) * (F.col("__V") + F.lit(1))
    ).cast("double")
    per_doc = (
        _trigram_pairs(df, id_col=id_col, text_col=text_col)
        .groupBy(id_col, "w1", "w2", "word")
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    joined = (
        per_doc.join(tri, ["w1", "w2", "word"], "left")
        .join(ctx3, ["w1", "w2"], "left")
        .join(
            cont_bi,
            (F.col("w2") == F.col("__v")) & (F.col("word") == F.col("__w")),
            "left",
        )
        .drop("__v", "__w")
        .join(cont_ctx.withColumnRenamed("__v", "w2"), "w2", "left")
        .join(cont_uni, "word", "left")
        .crossJoin(totals)
    )
    p1 = (
        F.coalesce(F.col("__n_cu"), F.lit(0)) + F.lit(float(smoothing_k))
    ) / denom1
    p2_seen = (
        F.greatest(
            F.coalesce(F.col("__n_cbi"), F.lit(0)).cast("double") - D,
            F.lit(0.0),
        )
        + D * F.col("__t_cctx").cast("double") * p1
    ) / F.col("__n_cctx").cast("double")
    p2 = F.when(F.col("__n_cctx").isNotNull(), p2_seen).otherwise(p1)
    p3_seen = (
        F.greatest(
            F.coalesce(F.col("__n_tri"), F.lit(0)).cast("double") - D,
            F.lit(0.0),
        )
        + D * F.col("__t_ctx3").cast("double") * p2
    ) / F.col("__n_ctx3").cast("double")
    p3 = F.when(F.col("__n_ctx3").isNotNull(), p3_seen).otherwise(p2)
    nll = -F.log(p3)
    oov = F.when(F.col("__n_tri").isNull(), F.col("__cnt")).otherwise(F.lit(0))
    grouped = joined.groupBy(id_col).agg(
        F.sum("__cnt").alias("n_trigrams"),
        F.sum(oov).alias("__oov"),
        (
            F.collect_list(
                F.struct(
                    F.col("w1"),
                    F.col("w2"),
                    F.col("word"),
                    (F.col("__cnt") * nll).alias("c"),
                )
            )
            if deterministic
            else F.sum(F.col("__cnt") * nll)
        ).alias("__nll"),
    )
    if deterministic:
        nll_total = F.aggregate(
            F.array_sort(F.col("__nll")), F.lit(0.0), lambda acc, s: acc + s["c"]
        )
    else:
        nll_total = F.col("__nll")
    return grouped.select(
        F.col(id_col),
        F.col("n_trigrams"),
        F.round(
            F.col("__oov").cast("double") / F.col("n_trigrams"), 6
        ).alias("oov_frac"),
        F.round(nll_total / F.col("n_trigrams"), 6).alias("mean_nll"),
    )


def _ngram_tuples(
    df: DataFrame, *, id_col: str, text_col: str, n: int
) -> DataFrame:
    """(id, w1..w_{n-1}, word) — one row per adjacent token n-TUPLE,
    the order-n generalization of :func:`_trigram_pairs` (same
    empty-token filter, same scan-side filter + transform + one
    posexplode, zero shuffle). Docs with < n tokens emit no rows."""
    toks_raw = _tokens(F.col(text_col))
    staged = df.select(
        F.col(id_col),
        F.filter(toks_raw, lambda t: t != F.lit("")).alias("__toks"),
    )
    toks = F.col("__toks")
    sz = _nsize(toks)
    names = [f"w{j}" for j in range(1, n)] + ["word"]

    def tup(i):
        return F.struct(
            *[
                F.element_at(toks, i - (n - 1 - j)).alias(names[j])
                for j in range(n)
            ]
        )

    struct_t = ",".join(f"{c}:string" for c in names)
    grams = F.when(
        sz >= n,
        F.transform(F.sequence(F.lit(n), F.greatest(sz, F.lit(n))), tup),
    ).otherwise(F.expr(f"cast(array() as array<struct<{struct_t}>>)"))
    return staged.select(F.col(id_col), F.explode(grams).alias("__g")).select(
        id_col, *[F.col(f"__g.{c}") for c in names]
    )


def ngram_lm_frequencies(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    n: int,
    min_count: int = 1,
    top_k: int | None = None,
) -> DataFrame:
    """Corpus-wide order-n gram table (w1..w_{n-1}, word,
    n_occurrences) — the training step for :func:`ngram_logprob`'s LM
    ladder, the order-n generalization of :func:`trigram_frequencies`
    (same deterministic order: count desc, then words asc; one explode
    + one gram-keyed shuffle).

    ``min_count`` is the KenLM-style count-pruning floor (VERDICT r12
    item 5): grams below it are dropped AFTER the count, which is what
    bounds the type table at high orders — a 100 TB web corpus's raw
    5-gram type table is itself corpus-scale (most 5-grams are
    singletons), pruned at 2+ it collapses toward the vocabulary
    scale the KN statistics derivation needs."""
    if n < 2:
        raise ValueError(f"n must be >= 2, got {n}")
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    names = [f"w{j}" for j in range(1, n)] + ["word"]
    out = (
        _ngram_tuples(df, id_col=id_col, text_col=text_col, n=n)
        .groupBy(*names)
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    if min_count > 1:
        out = out.where(F.col("n_occurrences") >= min_count)
    out = out.orderBy(
        F.desc("n_occurrences"), *[F.asc(c) for c in names]
    )
    return out.limit(top_k) if top_k is not None else out


def _padded_window_counts(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    n: int,
    include_tail: bool = False,
) -> DataFrame:
    """(id, w1..w_{n-1}, word, __cnt): one row per DISTINCT padded
    suffix-window per document — the single-explode source every KN
    ladder statistic derives from (round 13 optimization, guide §2.4).

    A window starts at every token position with >= 2 tokens remaining
    (``include_tail=True``: at EVERY position, so the 1-prefixes count
    unigram occurrences exactly) and carries the next ``n`` tokens,
    NULL-padded past the document end. A k-gram occurrence at position i (any 2 <= k <= n) is exactly
    the non-NULL k-prefix of the window at i, so grouping the non-NULL
    k-prefixes of this one table reproduces ``ngram_lm_frequencies``'
    counts for EVERY order at once — one scan + one (id, window)
    shuffle where the ladder path pays one scan + one corpus-scale
    shuffle PER order. Same tokenizer and empty-token filter as
    :func:`_ngram_tuples`."""
    toks_raw = _tokens(F.col(text_col))
    staged = df.select(
        F.col(id_col),
        F.filter(toks_raw, lambda t: t != F.lit("")).alias("__toks"),
    )
    toks = F.col("__toks")
    sz = _nsize(toks)
    names = [f"w{j}" for j in range(1, n)] + ["word"]

    def win(i):
        # try_element_at: past-the-end pads NULL on EVERY session
        # config (plain element_at throws under ANSI).
        return F.struct(
            *[
                F.try_element_at(toks, i + F.lit(j)).alias(names[j])
                for j in range(n)
            ]
        )

    struct_t = ",".join(f"{c}:string" for c in names)
    min_sz, last = (1, sz) if include_tail else (2, sz - 1)
    wins = F.when(
        sz >= min_sz, F.transform(F.sequence(F.lit(1), last), win)
    ).otherwise(F.expr(f"cast(array() as array<struct<{struct_t}>>)"))
    exploded = staged.select(
        F.col(id_col), F.explode(wins).alias("__g")
    ).select(id_col, *[F.col(f"__g.{c}") for c in names])
    # __wlen (the window's non-NULL length, so names[k-1] IS NOT NULL
    # <=> __wlen >= k) is exposed as an AGGREGATE of the grouping keys,
    # NOT as a plain column: Catalyst pushes key-predicates below
    # aggregations and through this groupBy into the explode stage,
    # which would split the one shared corpus-scale exchange into one
    # filtered copy per consumer (re-running the scan+explode each
    # time). A predicate on an aggregate output cannot be pushed below
    # the aggregate, so every per-order consumer filters on __wlen and
    # the exchange is planned — and executed — exactly once.
    wlen = F.when(F.col(names[-1]).isNotNull(), F.lit(n))
    for j in range(n - 2, 0, -1):
        wlen = wlen.when(F.col(names[j]).isNotNull(), F.lit(j + 1))
    wlen = wlen.otherwise(F.lit(1))
    return exploded.groupBy(id_col, *names).agg(
        F.count(F.lit(1)).alias("__cnt"),
        F.max(wlen).alias("__wlen"),
    )


def _padded_window_counts_packed(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    n: int,
) -> DataFrame:
    """(id, __g, __cnt, __wlen): :func:`_padded_window_counts` with the
    window packed into ONE space-joined gram STRING instead of a struct
    of n token columns (round 14, VERDICT r13 item 4 — guide §2.3/§5).

    Exactness: :func:`_tokens` splits on whitespace and the empty-token
    filter drops '' — a token can never contain a space — so the
    space-joined string is a bijective encoding of the token tuple, and
    every k-prefix / k-suffix the KN ladder derives is an exact
    ``substring_index()`` of the key. What this buys at the corpus-scale
    (id, window) exchange (ngram_nll's dominant cost, measured GC-bound
    in round 13): one UTF8 string per row instead of a 5-field struct —
    one hash/compare per hash-agg probe instead of n, ~40% fewer
    serialized bytes (no per-field null bits/offsets), and one object
    per window in the explode instead of a struct + n slices.

    Windows start at every position with >= 2 tokens remaining and carry
    the next ``n`` tokens, CLIPPED at the document end (the packed string
    of a clipped window simply has fewer tokens — the NULL padding of the
    struct variant encodes as absence). ``__wlen`` (the window's token
    count) is exposed as an AGGREGATE for the same Catalyst reason as in
    :func:`_padded_window_counts`: a predicate on an aggregate output
    cannot be pushed below the aggregation, so every per-order consumer
    filters ABOVE the one shared corpus-scale exchange and the exchange
    is planned — and executed — exactly once."""
    toks_raw = _tokens(F.col(text_col))
    staged = df.select(
        F.col(id_col),
        F.filter(toks_raw, lambda t: t != F.lit("")).alias("__toks"),
    )
    toks = F.col("__toks")
    sz = _nsize(toks)

    def win(i):
        return F.struct(
            F.array_join(F.slice(toks, i, n), " ").alias("g"),
            F.least(F.lit(n), sz - i + 1).cast("int").alias("l"),
        )

    wins = F.when(
        sz >= 2, F.transform(F.sequence(F.lit(1), sz - 1), win)
    ).otherwise(F.expr("cast(array() as array<struct<g:string,l:int>>)"))
    exploded = staged.select(
        F.col(id_col), F.explode(wins).alias("__w")
    ).select(id_col, F.col("__w.g").alias("__g"), F.col("__w.l").alias("__l"))
    return exploded.groupBy(id_col, "__g").agg(
        F.count(F.lit(1)).alias("__cnt"),
        F.max("__l").alias("__wlen"),
    )


def ngram_logprob(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    n: int = 5,
    lms: list[DataFrame] | None = None,
    min_count: int = 1,
    discount: float = 0.75,
    smoothing_k: float = 1.0,
    deterministic: bool = False,
) -> DataFrame:
    """Per-document fluency under an interpolated KNESER-NEY order-n LM
    (VERDICT r12 item 5) — the KenLM-grade top of the CCNet fluency
    ladder (Wenzek et al. 2020 filter on a 5-gram KenLM; interpolated
    KN with a fixed discount is KenLM's smoothing family, and n=5 is
    its published order). :func:`trigram_logprob` is exactly this at
    n=3; both follow Chen & Goodman 1999 with fixed discount D:

    * the HIGHEST order uses raw counts:
      ``p_n = (max(c(gram)-D, 0) + D * T(ctx) * p_{n-1}) / c(ctx·)``
      when the (n-1)-context was seen, else ``p_{n-1}``;
    * every middle order k uses CONTINUATION counts (distinct
      left-extensions among order-(k+1) gram TYPES — the KN insight):
      ``p_k = (max(N1p(·g_k)-D, 0) + D * T'(ctx_k) * p_{k-1})
      / N1p(·ctx_k·)`` when defined, else ``p_{k-1}``;
    * the base is the continuation unigram with the same add-k floor
      as :func:`unigram_logprob`, so every probability is positive.

    ``lms`` is the LM ladder ``[order-n table, order-(n-1) table, ...,
    order-2 table]`` — each a (w1..w_{k-1}, word, n_occurrences) table
    from :func:`ngram_lm_frequencies` (an order-2 table may use
    ``w_prev`` for its context column, so :func:`bigram_frequencies`
    output plugs in). Pass the FULL ladder or ``None`` (this corpus's
    own statistics) — a partial ladder would mix models, same contract
    as :func:`trigram_logprob`. All tables must come from the same
    corpus and be untruncated (no ``top_k``).

    ``min_count`` (used when ``lms`` is None) is the KenLM-style
    count-pruning floor applied to every derived order >= 3 — the knob
    that bounds high-order type tables at web scale (see
    :func:`ngram_lm_frequencies`); the order-2 table stays unpruned
    because the continuation-unigram base (N1p(·w), B, V) must cover
    the vocabulary. Pruning changes the model (KenLM's does too):
    pruned grams score through backoff.

    Returns ``(id, n_ngrams, oov_frac, mean_nll)`` over the document's
    order-n positions: ``oov_frac`` = fraction unseen at the top
    level, ``mean_nll`` the mean ``-ln p_n``. Documents with < n
    tokens produce NO row. ``deterministic=True`` folds contributions
    in gram-sorted order for bit-reproducible external replay.

    100 TB shape (same as :func:`trigram_logprob`, one rung up): ALL
    KN statistics derive from the n-1 gram-TYPE tables with
    vocabulary-scale aggregations; the only corpus-scale work is the
    scan-side gram explode pre-aggregated to one row per (doc, gram)
    before the joins, and every stat table attaches with an
    AQE-broadcast equi-join."""
    if n < 3:
        raise ValueError(
            f"n must be >= 3 (use bigram_logprob/unigram_logprob for "
            f"lower orders), got {n}"
        )
    if not 0.0 < discount < 1.0:
        raise ValueError(f"discount must be in (0, 1), got {discount}")
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    if lms is not None and len(lms) != n - 1:
        raise ValueError(
            f"lms must be the full ladder of {n - 1} tables "
            f"[order-{n} .. order-2], got {len(lms)} — a partial "
            "ladder would mix two models' statistics"
        )
    return _kn_ngram_scored(
        df, id_col=id_col, text_col=text_col, n=n, lms=lms,
        min_count=min_count, discount=discount, smoothing_k=smoothing_k,
        deterministic=deterministic, n_out_col="n_ngrams",
    )


def _kn_ngram_scored(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    n: int,
    lms: list[DataFrame] | None,
    min_count: int,
    discount: float,
    smoothing_k: float,
    deterministic: bool,
    n_out_col: str,
) -> DataFrame:
    """Shared interpolated-KN scorer behind :func:`ngram_logprob` (any
    order) and :func:`trigram_logprob`'s own-corpus case (n=3,
    ``n_out_col="n_trigrams"``) — identical formula, identical output.

    Round 14 (VERDICT r13 item 4, guide §2.3/§5): every gram key — the
    padded windows, the order tables, the continuation tables, all the
    scoring join keys — is ONE space-joined string instead of n token
    columns (see :func:`_padded_window_counts_packed` for the exactness
    argument: the whitespace tokenizer makes the encoding bijective and
    ``substring_index`` derives every prefix/suffix the ladder needs).
    The n=5 struct keys were the round-13-measured GC bottleneck: the
    corpus-scale exchange carried 5 UTF8 slices + struct overhead per
    position, and every hash-agg/join probe hashed 5 strings. Outputs
    are bit-identical: join match sets are unchanged (key encoding is
    bijective; NULL keys in external lms tables still never match
    because ``concat`` propagates NULL), and the deterministic fold
    rebuilds the (w1..word) struct by splitting the gram, so the sort
    order is the same tuple order as before."""
    D = F.lit(float(discount))
    names = [f"w{j}" for j in range(1, n)] + ["word"]
    SEP = " "

    def pfx(col, k: int):
        # first k tokens of a packed gram
        return F.substring_index(col, SEP, k)

    def sfx(col, k: int):
        # last k tokens of a packed gram
        return F.substring_index(col, SEP, -k)

    def gram_key(cols: list[str]):
        # packed key from token COLUMNS (external lms tables): concat —
        # NOT concat_ws — so a NULL field yields a NULL key that never
        # equi-joins, exactly like the old multi-column join.
        parts: list = []
        for i, c in enumerate(cols):
            if i:
                parts.append(F.lit(SEP))
            parts.append(F.col(c))
        return F.concat(*parts)

    # Join keys are re-exposed through coalesce(col, '') — a no-op on
    # values (every own-corpus key is non-NULL past its __wlen filter)
    # that makes the output non-nullable, so the optimizer does NOT
    # infer isnotnull(key) filters on these build sides. Inferred key
    # filters push below the shared aggregations into the explode stage
    # and would split the one corpus-scale exchange into a filtered
    # copy per joined table.
    def nn(col: str, alias: str):
        return F.coalesce(F.col(col), F.lit("")).alias(alias)

    cont: dict[int, DataFrame] = {}
    cctx: dict[int, DataFrame] = {}
    if lms is None:
        # FUSED own-corpus path (round 13, guide §2.4): every ladder
        # statistic derives from ONE padded-window explode instead of
        # one scan + one corpus-scale gram shuffle per order. The
        # (id, window) pre-aggregation is shared verbatim with the
        # scoring join's per-doc table, so the corpus is read once.
        pdw = _padded_window_counts_packed(
            df, id_col=id_col, text_col=text_col, n=n
        )
        T = pdw.groupBy("__g").agg(
            F.sum("__cnt").alias("__w"), F.max("__wlen").alias("__wlen")
        )

        def order_table(k: int) -> DataFrame:
            # order-k gram type table: counts of the k-prefixes of
            # windows with >= k tokens (__wlen >= k) reproduce
            # ngram_lm_frequencies(n=k) exactly; same min_count pruning
            # floor for k >= 3, order-2 table unpruned (the
            # continuation-unigram base must cover the vocabulary).
            t = (
                T.where(F.col("__wlen") >= k)
                .groupBy(pfx(F.col("__g"), k).alias("__g"))
                .agg(F.sum("__w").alias("__n"))
            )
            # min_count floor for k >= 3; the k < 3 (and min_count=1)
            # filter is vacuously true (counts are >= 1 by
            # construction) but referencing __n keeps the sum buffer
            # in every consumer's copy of the shared subtree — column
            # pruning would otherwise drop it for count-only consumers
            # (cont/cont_uni) and split the shared corpus exchange.
            return t.where(
                F.col("__n") >= (min_count if k >= 3 else 1)
            )

        tabs = {k: order_table(k) for k in range(2, n + 1)}
        top = tabs[n].select(
            nn("__g", "__g"),
            F.col("__n").cast("long").alias("__n_top"),
        )
        for k in range(n - 1, 1, -1):
            # order-(k+1) TYPE rows grouped by their k-token suffix:
            # count(1) IS the distinct-left-extension count N1p(.g_k).
            c = (
                tabs[k + 1]
                .groupBy(sfx(F.col("__g"), k).alias("__s"))
                .agg(F.count(F.lit(1)).alias(f"__nc_{k}"))
                .select(nn("__s", f"__s{k}"), F.col(f"__nc_{k}"))
            )
            cont[k] = c
        cont_uni = (
            tabs[2]
            .groupBy(sfx(F.col("__g"), 1).alias("__w1s"))
            .agg(F.count(F.lit(1)).alias("__n_cu"))
            .select(nn("__w1s", "__wd"), F.col("__n_cu"))
        )
        per_doc = pdw.where(F.col("__wlen") >= n).drop("__wlen")
    else:
        lms = list(lms)
        # Normalize an order-2 table's bigram_frequencies naming.
        if "w_prev" in lms[-1].columns:
            lms[-1] = lms[-1].withColumnRenamed("w_prev", "w1")
        missing = [c for c in names if c not in lms[0].columns]
        if missing:
            raise ValueError(
                f"lms[0] (order {n}) is missing columns {missing} — "
                f"expected {names} + n_occurrences"
            )
        top = lms[0].select(
            gram_key(names).alias("__g"),
            F.col("n_occurrences").cast("long").alias("__n_top"),
        )
        # Middle orders k = n-1 .. 2: continuation tables from the
        # order-(k+1) TYPE set (rows are unique, so count(1) per suffix
        # IS the distinct-left-extension count).
        for k in range(n - 1, 1, -1):
            src = lms[n - 1 - k]  # order k+1: columns w1..wk, word
            src_names = [f"w{j}" for j in range(1, k + 1)] + ["word"]
            missing = [c for c in src_names if c not in src.columns]
            if missing:
                raise ValueError(
                    f"lms[{n - 1 - k}] (order {k + 1}) is missing columns "
                    f"{missing} — expected {src_names} + n_occurrences"
                )
            suffix_src = src_names[1:]
            c = (
                src.select(gram_key(suffix_src).alias(f"__s{k}"))
                .groupBy(f"__s{k}")
                .agg(F.count(F.lit(1)).alias(f"__nc_{k}"))
            )
            cont[k] = c
        # Base: continuation unigram from the order-2 TYPE set.
        bi = lms[-1].select("w1", "word")
        cont_uni = bi.groupBy(F.col("word").alias("__wd")).agg(
            F.count(F.lit(1)).alias("__n_cu")
        )
        per_doc = (
            _ngram_tuples(df, id_col=id_col, text_col=text_col, n=n)
            .select(F.col(id_col), gram_key(names).alias("__g"))
            .groupBy(id_col, "__g")
            .agg(F.count(F.lit(1)).alias("__cnt"))
        )
    ctx_top = top.groupBy(pfx(F.col("__g"), n - 1).alias("__gp")).agg(
        F.sum("__n_top").alias("__nctx_top"),
        F.count(F.lit(1)).alias("__t_top"),
    )
    for k in range(n - 1, 1, -1):
        cctx[k] = cont[k].groupBy(
            pfx(F.col(f"__s{k}"), k - 1).alias(f"__sp{k}")
        ).agg(
            F.sum(f"__nc_{k}").alias(f"__ncc_{k}"),
            F.count(F.lit(1)).alias(f"__tc_{k}"),
        )
    totals = F.broadcast(
        cont_uni.agg(
            F.coalesce(F.sum("__n_cu"), F.lit(0).cast("long")).alias("__B"),
            F.count(F.lit(1)).alias("__V"),
        )
    )
    denom1 = (
        F.col("__B") + F.lit(float(smoothing_k)) * (F.col("__V") + F.lit(1))
    ).cast("double")

    # Scoring join keys: every prefix/suffix derives from the one packed
    # per-doc gram AFTER the shared exchange (a narrow projection), so
    # the corpus-scale wire carries exactly (id, gram, count).
    per_doc = per_doc.withColumn("__gp", pfx(F.col("__g"), n - 1))
    for k in range(n - 1, 1, -1):
        per_doc = per_doc.withColumn(f"__s{k}", sfx(F.col("__g"), k))
        per_doc = per_doc.withColumn(
            f"__sp{k}", pfx(F.col(f"__s{k}"), k - 1)
        )
    per_doc = per_doc.withColumn("__wd", sfx(F.col("__g"), 1))
    joined = per_doc.join(top, "__g", "left").join(ctx_top, "__gp", "left")
    for k in range(n - 1, 1, -1):
        joined = joined.join(cont[k], f"__s{k}", "left").join(
            cctx[k], f"__sp{k}", "left"
        )
    joined = joined.join(cont_uni, "__wd", "left").crossJoin(totals)

    p = (
        F.coalesce(F.col("__n_cu"), F.lit(0)) + F.lit(float(smoothing_k))
    ) / denom1
    for k in range(2, n):
        p_seen = (
            F.greatest(
                F.coalesce(F.col(f"__nc_{k}"), F.lit(0)).cast("double") - D,
                F.lit(0.0),
            )
            + D * F.col(f"__tc_{k}").cast("double") * p
        ) / F.col(f"__ncc_{k}").cast("double")
        p = F.when(F.col(f"__ncc_{k}").isNotNull(), p_seen).otherwise(p)
    p_top_seen = (
        F.greatest(
            F.coalesce(F.col("__n_top"), F.lit(0)).cast("double") - D,
            F.lit(0.0),
        )
        + D * F.col("__t_top").cast("double") * p
    ) / F.col("__nctx_top").cast("double")
    p = F.when(F.col("__nctx_top").isNotNull(), p_top_seen).otherwise(p)
    nll = -F.log(p)
    oov = F.when(
        F.col("__n_top").isNull(), F.col("__cnt")
    ).otherwise(F.lit(0))
    # Deterministic fold: rebuild the (w1..word) token fields by
    # splitting the packed gram so the array_sort order is the SAME
    # tuple order as the unpacked implementation (sorting the packed
    # string directly could diverge on tokens containing chars < ' ').
    gparts = F.split(F.col("__g"), SEP)
    grouped = joined.groupBy(id_col).agg(
        F.sum("__cnt").alias(n_out_col),
        F.sum(oov).alias("__oov"),
        (
            F.collect_list(
                F.struct(
                    *[
                        F.element_at(gparts, j + 1).alias(names[j])
                        for j in range(n)
                    ],
                    (F.col("__cnt") * nll).alias("c"),
                )
            )
            if deterministic
            else F.sum(F.col("__cnt") * nll)
        ).alias("__nll"),
    )
    if deterministic:
        nll_total = F.aggregate(
            F.array_sort(F.col("__nll")), F.lit(0.0),
            lambda acc, s: acc + s["c"],
        )
    else:
        nll_total = F.col("__nll")
    return grouped.select(
        F.col(id_col),
        F.col(n_out_col),
        F.round(
            F.col("__oov").cast("double") / F.col(n_out_col), 6
        ).alias("oov_frac"),
        F.round(nll_total / F.col(n_out_col), 6).alias("mean_nll"),
    )


def fluency_buckets(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    bounds: tuple[float, float] = (1.0 / 3.0, 2.0 / 3.0),
    model: str = "unigram",
    exact: bool = True,
    lm: DataFrame | None = None,
    strata_col: str | None = None,
    **kwargs,
) -> DataFrame:
    """CCNet-style head/middle/tail partition of the corpus by LM
    fluency (Wenzek et al. 2020 split CommonCrawl into perplexity
    terciles and trained preferentially on the "head"): score every
    document's ``mean_nll`` (:func:`unigram_logprob`,
    :func:`bigram_logprob`, or :func:`trigram_logprob` per ``model``;
    extra kwargs pass through),
    take the ``bounds`` percentiles of the score distribution as
    thresholds, and label each scored document ``head`` (most fluent —
    lowest NLL), ``middle``, or ``tail``. Returns (id, mean_nll,
    bucket); documents the scorer skips (no tokens / no transitions)
    produce no row, mirroring ``Corpus.filter_fluency``.

    ``strata_col`` computes thresholds PER STRATUM (CCNet buckets per
    language — a fluent-but-rare language must not land wholly in the
    tail of a global distribution); the column is carried into the
    output. The threshold table grows to one row per stratum and
    attaches with a broadcast equi-join instead of the one-row cross
    join; pair it with a per-language ``lm`` for full CCNet semantics.

    Thresholds are rounded to 6 places (like every score in the logprob
    family), so bucket assignment is reproducible across engines; the
    percentile itself is the exact linear-interpolated quantile
    (``percentile_cont`` semantics) when ``exact=True`` — the
    oracle-replayable path.

    100 TB shape: the thresholds are a ONE-row aggregate broadcast back
    over the scored table (same sanctioned cross-join shape as the LM
    totals). ``exact=True`` gathers every score into the single
    percentile task — fine up to hundreds of millions of documents
    (doubles), the honest limit of exact quantiles; pass ``exact=False``
    for Spark's approx_percentile sketch (bounded memory, engine-
    specific tie-breaking — not oracle-replayable). The scored subtree
    feeds both the threshold aggregate and the final projection; persist
    it first if the LM scoring dominates and the optimizer cannot reuse
    the exchange."""
    lo, hi = bounds
    if not 0.0 < lo < hi < 1.0:
        raise ValueError(f"bounds must be ascending in (0, 1), got {bounds}")
    if model == "unigram":
        scored = unigram_logprob(
            df, id_col=id_col, text_col=text_col, lm=lm, **kwargs
        )
    elif model == "bigram":
        scored = bigram_logprob(
            df, id_col=id_col, text_col=text_col, lm=lm, **kwargs
        )
    elif model == "trigram":
        scored = trigram_logprob(
            df, id_col=id_col, text_col=text_col, lm=lm, **kwargs
        )
    elif _re.fullmatch(r"[3-9]gram", model or ""):
        # '4gram'/'5gram'/...: the KenLM-grade KN ladder (VERDICT r12
        # item 5). An external LM is the full lms= ladder (kwargs), not
        # the single lm= table.
        if lm is not None:
            raise ValueError(
                f"model={model!r} takes its external LM as the full "
                "lms= ladder (see ngram_logprob), not lm="
            )
        scored = ngram_logprob(
            df, id_col=id_col, text_col=text_col, n=int(model[0]),
            **kwargs,
        )
    else:
        raise ValueError(
            f"model must be 'unigram', 'bigram', 'trigram', or "
            f"'<n>gram' (3-9), got {model!r}"
        )
    scored = scored.select(F.col(id_col), "mean_nll")
    perc = F.percentile if exact else F.percentile_approx
    cut_aggs = [
        F.round(perc(F.col("mean_nll"), F.lit(float(lo))), 6).alias("__t_lo"),
        F.round(perc(F.col("mean_nll"), F.lit(float(hi))), 6).alias("__t_hi"),
    ]
    bucket = (
        F.when(F.col("mean_nll") <= F.col("__t_lo"), F.lit("head"))
        .when(F.col("mean_nll") <= F.col("__t_hi"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    if strata_col is None:
        labeled = scored.crossJoin(F.broadcast(scored.agg(*cut_aggs)))
        keep = [F.col(id_col)]
    else:
        strata = df.select(F.col(id_col), F.col(strata_col))
        per_stratum = scored.join(strata, id_col)
        # A NULL stratum is a real group: the threshold row attaches with
        # a NULL-SAFE join (a plain key would silently drop every
        # NULL-stratum document from the labeled output).
        cuts = F.broadcast(
            per_stratum.groupBy(strata_col)
            .agg(*cut_aggs)
            .withColumnRenamed(strata_col, "__s_cut")
        )
        labeled = per_stratum.join(
            cuts, F.col(strata_col).eqNullSafe(F.col("__s_cut"))
        )
        keep = [F.col(id_col), F.col(strata_col)]
    return labeled.select(*keep, "mean_nll", bucket.alias("bucket"))


def normalize_text(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    out_col: str | None = None,
    lowercase: bool = False,
) -> DataFrame:
    """Expression-only text normalization: strip control characters
    (C0 + DEL), collapse whitespace runs to single spaces, trim, and
    optionally lowercase — the standard canonicalization pass before
    hashing/dedup so formatting variants collide.

    Replaces ``text_col`` in place unless ``out_col`` is given. Unicode
    NFC normalization is deliberately NOT included: Spark has no built-in
    NFC expression and a per-row Python UDF would put the hot path on the
    slow path; run an Arrow-batched normalizer beforehand if the corpus
    needs it. Scan-speed, zero shuffle."""
    t = F.col(text_col)
    t = F.regexp_replace(t, "[\\x00-\\x1f\\x7f]", " ")
    t = F.regexp_replace(t, "\\s+", " ")
    t = F.trim(t)
    if lowercase:
        t = F.lower(t)
    return df.withColumn(out_col or text_col, t)


# Default dedup floor for line_dedup: lines shorter than this many
# characters bypass dedup (always kept). C4's line filters target
# sentence-scale spans, not stop-words and bullets; semantically, a
# corpus-scope dedup of sub-floor lines ("", "-", "the") would strip them
# from every document but the globally first one.
LINE_DEDUP_MIN_LEN = 10


def line_dedup(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    sep: str = "\n",
    min_len: int = LINE_DEDUP_MIN_LEN,
    scope: str = "corpus",
    key_by: str = "text",
) -> DataFrame:
    """C4-style line-level dedup: every distinct line is kept only at its
    first occurrence (ordered by (doc id, position)); later occurrences
    are removed from their documents' text. ``scope='corpus'`` (default)
    dedups globally; ``scope='document'`` dedups only within each
    document (repeated-boilerplate removal that leaves other docs'
    copies alone). Lines shorter than ``min_len`` characters (default
    :data:`LINE_DEDUP_MIN_LEN`) bypass dedup entirely and are always
    kept; pass ``min_len=0`` to dedup every line.

    Returns one row per input document: (id, text (deduplicated,
    ``sep``-joined), n_lines, n_kept). Documents whose every line was
    seen earlier keep an empty text. ``sep`` is treated as a LITERAL
    separator on both the split and the re-join.

    Physical shape: ONE explode scan-side; the first occurrence per line
    is a MIN(struct(id, pos)) aggregation — partial aggregation combines
    a hot line to one candidate per map partition, so a boilerplate
    header duplicated across half the corpus costs one row per
    partition, not one 50%-of-the-corpus sort partition (the window
    formulation used through round 5 had exactly that straggler). The
    kept lines ARE the winner table (plus sub-floor occurrences), so no
    join ships occurrences back to their winners; one groupBy(id) over
    only the kept lines reassembles documents.

    ``key_by`` picks the aggregation key:

    * ``'text'`` (default) — the literal line string: exactly
      replayable by an external SQL oracle, collision-free.
    * ``'hash'`` — a 128-bit content key (two independent xxhash64
      halves): the winner aggregation groups/shuffles on FIXED-WIDTH
      16-byte keys (the line text rides the min-struct payload, once per
      distinct line per map partition), so hot-key combining and the
      exchange never hash or compare long strings. A collision would
      wrongly drop one line at ~2^-64 odds per pair — the same accepted
      trade as published content-hash exact dedup. Output is identical
      to ``'text'`` on non-adversarial data (asserted against the same
      oracle in the differential suite)."""
    import re

    if scope not in ("corpus", "document"):
        raise ValueError(f"scope must be 'corpus' or 'document', got {scope!r}")
    if key_by not in ("text", "hash"):
        raise ValueError(f"key_by must be 'text' or 'hash', got {key_by!r}")
    lines = df.select(
        F.col(id_col),
        # F.split takes a regex: escape so sep is literal, matching the
        # literal array_join below (an unescaped '.' would split on
        # every character and silently wipe the corpus).
        F.posexplode(F.split(F.col(text_col), F.lit(re.escape(sep)), -1)).alias(
            "__pos", "__line"
        ),
    )
    if key_by == "hash":
        # 128-bit content key: aggregation + join shuffle 16 fixed bytes
        # per line, never the line text (which only the rebuild groupBy
        # needs, and that shuffles per-DOC rows, not per-LINE keys)
        lines = lines.withColumns(
            {
                "__k1": F.xxhash64("__line"),
                "__k2": F.xxhash64("__line", F.lit(1)),
            }
        )
        key_cols = ["__k1", "__k2"]
    else:
        key_cols = ["__line"]
    group_cols = key_cols if scope == "corpus" else [id_col, *key_cols]
    # Round-13 rewrite (guide §2.4): the kept dedup-lines are exactly the
    # winner table — no need to join every exploded occurrence back to
    # its group's winner to flag keep/drop. In text mode the group key IS
    # the line; in hash mode the winner's text rides the MIN(struct)
    # payload instead: the struct orders on (id, pos) first, so the
    # aggregate picks the winner occurrence's OWN line (identical to the
    # old join output even under a hash collision), and the combiner
    # ships one (key, struct) row per distinct line per map partition —
    # strictly fewer text bytes than the removed join, whose probe side
    # carried every occurrence's text. Kept lines = winners ∪ sub-floor
    # occurrences (which bypass dedup); the rebuild groupBy(id) shuffles
    # only KEPT lines instead of every line. The MIN(struct) aggregation
    # (map-side combine collapses hot boilerplate lines) is now the only
    # line-keyed stage, so the straggler posture is unchanged. n_lines is
    # scan-side arithmetic: the split emits its array size in lines.
    win_payload = [F.col(id_col).alias("__wi"), F.col("__pos").alias("__wp")]
    if key_by == "hash":
        win_payload.append(F.col("__line").alias("__wl"))
    winners = (
        lines.where(F.length("__line") >= min_len)
        .groupBy(*group_cols)
        .agg(F.min(F.struct(*win_payload)).alias("__w"))
    )
    won_line = F.col("__w.__wl") if key_by == "hash" else F.col("__line")
    kept = winners.select(
        F.col("__w.__wi").alias(id_col),
        F.col("__w.__wp").alias("__pos"),
        won_line.alias("__line"),
    ).unionByName(
        lines.where(F.length("__line") < min_len).select(
            F.col(id_col), "__pos", "__line"
        )
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(F.col("__pos"), F.col("__line"))
                    )
                ),
                lambda s: s["__line"],
            ),
            sep,
        ).alias("text"),
    )
    split_sz = F.size(
        F.split(F.col(text_col), F.lit(re.escape(sep)), -1)
    )
    per_doc = df.select(
        F.col(id_col),
        F.when(F.col(text_col).isNotNull(), split_sz)
        .otherwise(F.lit(0))
        .cast("long")
        .alias("n_lines"),
    )
    return per_doc.join(rebuilt, id_col, "left").select(
        id_col,
        F.coalesce("text", F.lit("")).alias("text"),
        F.col("n_lines"),
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
    )


def token_count_exact(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    tokenizer_fn,
    out_col: str = "n_tokens",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Exact token counts under a REAL tokenizer: ``tokenizer_fn(text) ->
    int`` (e.g. a HuggingFace/BPE encoder's length) runs Arrow-batched
    through ``mapInPandas`` — the injection-point pattern the multimodal
    stubs use, since tokenizer libraries are deployment-specific. Returns
    (id, *keep_cols, out_col); ``keep_cols`` carries input columns
    through the stage row-for-row (no join needed to reattach counts, so
    duplicate ids cannot inflate the output). Use
    :func:`token_count_bpe` for the dependency-free regex estimate.

    100 TB shape: partitioning preserved, one Python worker per
    partition, Arrow batch transfer — the tokenizer is the only per-row
    Python in the pipeline, confined to this stage."""
    import pandas as pd

    keep = list(keep_cols or [])
    if out_col in (id_col, *keep):
        raise ValueError(
            f"out_col {out_col!r} collides with a kept column"
        )
    schema_parts = [f"{id_col} {df.schema[id_col].dataType.simpleString()}"]
    schema_parts += [
        f"{c} {df.schema[c].dataType.simpleString()}" for c in keep
    ]
    schema_parts.append(f"{out_col} long")

    def batches(it):
        for pdf in it:
            out = {id_col: pdf[id_col].values}
            for c in keep:
                out[c] = pdf[c].values
            out[out_col] = [
                int(tokenizer_fn(t if t is not None else ""))
                for t in pdf[text_col]
            ]
            yield pd.DataFrame(out)

    in_cols = [id_col, *dict.fromkeys([*keep, text_col])]
    return df.select(*in_cols).mapInPandas(batches, ", ".join(schema_parts))


def chunk_documents(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 512,
    overlap: int = 0,
    min_tokens: int = 1,
) -> DataFrame:
    """Split documents into (optionally overlapping) token-window chunks
    — the context-window prep step for RAG indexing and fixed-length
    training examples. One row per chunk:
    (id, chunk_idx, tok_start, n_tokens, chunk_text), where chunk
    ``i`` starts at token ``i * (chunk_tokens - overlap)`` and carries up
    to ``chunk_tokens`` whitespace tokens re-joined with single spaces.
    A trailing chunk shorter than ``min_tokens`` is dropped (fully
    covered by the previous chunk's overlap or too small to embed);
    documents with no tokens — NULL text, empty string, or
    whitespace-only text — produce no rows. Unlike the corpus-wide
    ``split`` convention (where ``''`` counts as one empty token), the
    chunker filters empty split artifacts: a zero-content chunk is never
    a valid RAG/training example (ADVICE r7).

    100 TB shape: a pure scan-side projection — split, a
    sequence/transform over start offsets, one posexplode. Zero shuffle,
    cost linear in tokens emitted (overlap re-emits ``overlap`` tokens
    per boundary; keep it << chunk_tokens)."""
    if chunk_tokens < 1:
        raise ValueError(f"chunk_tokens must be >= 1, got {chunk_tokens}")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"overlap must be in [0, chunk_tokens), got {overlap}"
        )
    if min_tokens < 1:
        raise ValueError(f"min_tokens must be >= 1, got {min_tokens}")
    stride = chunk_tokens - overlap
    tokenized = df.select(
        F.col(id_col),
        F.filter(
            F.split(F.col(text_col), r"\s+"), lambda t: t != F.lit("")
        ).alias("__toks"),
    )
    toks = F.col("__toks")
    n = F.size(toks)
    # start offsets 0, stride, 2*stride, ... strictly below n (greatest
    # guard: sequence() must never run descending for empty docs)
    starts = F.sequence(
        F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride)
    )
    exploded = tokenized.where(n >= 1).select(
        F.col(id_col),
        n.alias("__n"),
        F.posexplode(
            F.transform(
                starts,
                lambda s: F.struct(
                    s.alias("tok_start"),
                    F.slice(toks, s + 1, chunk_tokens).alias("__chunk"),
                ),
            )
        ).alias("chunk_idx", "__c"),
    )
    return exploded.where(
        (F.col("__c.tok_start") < F.col("__n"))
        & (F.size("__c.__chunk") >= min_tokens)
    ).select(
        id_col,
        "chunk_idx",
        F.col("__c.tok_start").alias("tok_start"),
        F.size("__c.__chunk").alias("n_tokens"),
        F.array_join(F.col("__c.__chunk"), " ").alias("chunk_text"),
    )
