"""WordPiece subword tokenizer (Schuster & Nakajima 2012 / BERT) —
likelihood-scored merge trainer + greedy longest-match encoder.

The third leg of the tokenizer story next to :mod:`bpe` (frequency-
scored merges) and :mod:`unigram` (Kudo 2018 EM): WordPiece runs the
same merge loop as BPE over the word-TYPE table but picks the pair
maximizing ``count(l, r) / (count(l) * count(r))`` — the pair whose
merge most increases corpus likelihood under a unigram LM (the rule
HuggingFace ``tokenizers``' WordPiece trainer implements) — and
encodes with greedy longest-match-first ("maximal munch", BERT's
``WordpieceTokenizer``) instead of replaying merges.

Conventions (HF-compatible): a word's first character is a bare
symbol, every later character carries the ``##`` continuation prefix
("hello" -> [h, ##e, ##l, ##l, ##o]); merging (a, b) yields
``a + strip_prefix(b, '##')``; a word with ANY unmatchable position
encodes to the single unknown token (default ``[UNK]``), as does a
word longer than ``max_word_chars`` (HF's max_input_chars_per_word).

**Exact external replayability** (the module contract bpe/unigram
set): the score is ONE IEEE-double expression —
``CAST(cnt AS DOUBLE) / (CAST(cnt_l AS DOUBLE) * CAST(cnt_r AS
DOUBLE))`` — computed identically by Python floats, the Spark JVM,
and DuckDB; candidate pairs are pre-filtered to ``count >= 2`` and
ties break on (l, r) ascending, so every argmax decision is
bit-portable. Double multiplication keeps the denominator exact far
past BIGINT range (counts < 2^26 multiply exactly; beyond that all
three engines still round identically).

100 TB shape (:func:`train_wordpiece_spark`): state is the word-type
table built by ONE corpus-wide word-count shuffle (the exact
:func:`bpe.train_bpe_spark` shape and size gate). Each distributed
iteration adds one bounded symbol-count aggregation (|alphabet| +
|merges| rows — KBs) broadcast-joined to the pair counts; everything
else matches the BPE loop, including the pure-JVM merge fold. The
encoder runs the greedy JVM ``aggregate`` fold against ONE broadcast
vocab map — by default once per DISTINCT word with a join-reassembly
(Zipf: |types| << |tokens|), or scan-side per token with zero
shuffles (``strategy='scan'``); zero Python in the executor path
either way. Reference parity note: the reference (timefence) ships no
tokenizer trainer; this module is §2.11 extension surface.
"""

from __future__ import annotations

from collections import Counter

from timefence_spark.operators.bpe import _ws_split

CONT = "##"


def _word_syms(word: str) -> tuple[str, ...]:
    """HF WordPiece symbol split: bare first char, ##-prefixed rest."""
    return tuple(
        c if i == 0 else CONT + c for i, c in enumerate(word)
    )


def _strip_cont(piece: str) -> str:
    return piece[len(CONT):] if piece.startswith(CONT) else piece


def _train_wordpiece_from_vocab(
    words: Counter, n_merges: int
) -> list[tuple[str, str]]:
    """The canonical likelihood-merge loop over a symbol-tuple ->
    frequency table; shared semantics with the distributed trainer and
    the DuckDB oracle replay (filter count >= 2, argmax by score desc
    then (l, r) asc, merged = l + strip(r))."""
    vocab: dict[tuple[str, ...], int] = dict(words)
    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges:
        pair_cnt: Counter = Counter()
        sym_cnt: Counter = Counter()
        for syms, freq in vocab.items():
            for s in syms:
                sym_cnt[s] += freq
            for a, b in zip(syms, syms[1:]):
                pair_cnt[(a, b)] += freq
        best = None
        for (left, right), c in pair_cnt.items():
            if c < 2:
                continue
            score = c / (float(sym_cnt[left]) * float(sym_cnt[right]))
            key = (-score, left, right)
            if best is None or key < best[0]:
                best = (key, (left, right))
        if best is None:
            break
        left, right = best[1]
        merges.append((left, right))
        merged = left + _strip_cont(right)
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, freq in vocab.items():
            out: list[str] = []
            for s in syms:
                if out and out[-1] == left and s == right:
                    out[-1] = merged
                else:
                    out.append(s)
            key_t = tuple(out)
            new_vocab[key_t] = new_vocab.get(key_t, 0) + freq
        vocab = new_vocab
    return merges


def train_wordpiece(
    text: str, *, n_merges: int = 100
) -> list[tuple[str, str]]:
    """Train on whitespace-tokenized text (the :func:`bpe.train_bpe`
    mirror). Returns the merge list [(l, r), ...] in learned order;
    build the encoder vocabulary with :func:`wordpiece_pieces`."""
    if n_merges < 0:
        raise ValueError(f"n_merges must be >= 0, got {n_merges}")
    words = Counter(
        _word_syms(w) for w in _ws_split(text)
    )
    return _train_wordpiece_from_vocab(words, n_merges)


def wordpiece_pieces(
    merges: list[tuple[str, str]], alphabet: list[str]
) -> list[str]:
    """Encoder vocabulary: the (sorted) alphabet — bare first chars and
    ##-prefixed continuations actually seen in the corpus — followed by
    each merge's merged token in learned order. The list index is the
    piece id (callers typically prepend special tokens like [UNK])."""
    seen = set(alphabet)
    out = sorted(alphabet)
    for left, right in merges:
        m = left + _strip_cont(right)
        if m not in seen:
            seen.add(m)
            out.append(m)
    return out


def train_wordpiece_spark(
    df,
    *,
    text_col: str = "text",
    n_merges: int = 100,
    checkpoint_every: int = 10,
    mode: str = "auto",
    local_threshold: int = 100_000,
) -> list[tuple[str, str]]:
    """Distributed WordPiece training: the BPE word-type-table loop
    (see bpe.train_bpe_spark for the shape discussion) with the
    likelihood argmax. Per distributed iteration:

    * pair counts — one ``transform``+``explode`` over each word's
      symbol array, ONE ``groupBy(l, r)`` shuffle, pre-filtered to
      ``count >= 2`` (HF's min_frequency floor — also what makes the
      stop rule portable);
    * symbol counts — one ``explode`` + ``groupBy(s)`` shuffle whose
      result is BOUNDED by the live symbol inventory (|alphabet| +
      |merges| rows), broadcast onto the pair table twice (left and
      right denominators);
    * best pair — ``ORDER BY score DESC, l, r LIMIT 1`` collected (ONE
      row per iteration); score is the single IEEE-double expression
      the module docstring pins;
    * merge application — the same pure-JVM fold as BPE with
      ``merged = l + strip_prefix(r, '##')``; merged can never equal l
      (r is never the bare prefix), so the fold cannot re-merge its
      own output.

    ``mode='auto'`` collects the type table once when it fits
    ``local_threshold`` and trains driver-side (identical merges by
    construction — the shared loop); ``mode='distributed'`` forces the
    Spark loop. Stops when no pair reaches count 2."""
    from pyspark.sql import functions as F

    if mode not in ("auto", "local", "distributed"):
        raise ValueError(f"mode must be auto|local|distributed, got {mode!r}")
    if checkpoint_every < 1:
        raise ValueError(
            f"checkpoint_every must be >= 1, got {checkpoint_every}"
        )
    if n_merges < 0:
        raise ValueError(f"n_merges must be >= 0, got {n_merges}")
    word_counts = (
        df.select(F.explode(F.split(F.col(text_col), r"\s+")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    if mode in ("auto", "local"):
        head = word_counts.limit(local_threshold + 1).collect()
        if len(head) <= local_threshold:
            return _train_wordpiece_from_vocab(
                Counter(
                    {_word_syms(r["w"]): r["freq"] for r in head}
                ),
                n_merges,
            )
        if mode == "local":
            raise ValueError(
                f"mode='local' but the corpus has more than "
                f"{local_threshold} word types; raise local_threshold or "
                "use mode='auto'/'distributed'"
            )

    syms_expr = (
        "transform(split(w, ''), "
        f"(c, i) -> IF(i = 0, c, concat('{CONT}', c)))"
    )
    vocab = word_counts.select(
        F.expr(syms_expr).alias("syms"), "freq"
    ).localCheckpoint(eager=True)
    pair_expr = (
        "explode(transform(slice(syms, 1, size(syms) - 1), "
        "(s, i) -> struct(s AS l, syms[i + 1] AS r)))"
    )
    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges:
        pairs = (
            vocab.select(F.expr(pair_expr).alias("p"), "freq")
            .groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("cnt"))
            .where(F.col("cnt") >= 2)
        )
        syms = (
            vocab.select(F.explode("syms").alias("s"), "freq")
            .groupBy("s")
            .agg(F.sum("freq").alias("scnt"))
        )
        top = (
            pairs.join(
                F.broadcast(syms.select(F.col("s").alias("l"),
                                        F.col("scnt").alias("lcnt"))),
                "l",
            )
            .join(
                F.broadcast(syms.select(F.col("s").alias("r"),
                                        F.col("scnt").alias("rcnt"))),
                "r",
            )
            .withColumn(
                "score",
                F.col("cnt").cast("double")
                / (F.col("lcnt").cast("double")
                   * F.col("rcnt").cast("double")),
            )
            .orderBy(F.desc("score"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        left, right = top[0]["l"], top[0]["r"]
        merges.append((left, right))
        merged = left + _strip_cont(right)
        lc, rc, mc = F.lit(left), F.lit(right), F.lit(merged)
        vocab = vocab.select(
            F.aggregate(
                "syms",
                F.expr("cast(array() as array<string>)"),
                lambda acc, x: F.when(
                    (F.size(acc) > 0)
                    & (F.element_at(acc, -1) == lc)
                    & (x == rc),
                    F.concat(
                        F.slice(acc, F.lit(1), F.size(acc) - 1),
                        F.array(mc),
                    ),
                ).otherwise(F.concat(acc, F.array(x))),
            ).alias("syms"),
            "freq",
        )
        if len(merges) % checkpoint_every == 0:
            vocab = vocab.localCheckpoint(eager=True)
    return merges


def wordpiece_alphabet_spark(df, *, text_col: str = "text") -> list[str]:
    """The corpus's WordPiece alphabet — every bare first character and
    ##-prefixed continuation character seen in any word — sorted.

    The per-character explode runs over distinct word TYPES, not word
    occurrences (round-13 optimization, guide §2.3): the word
    ``distinct`` collapses repeats map-side before anything character-
    shaped is built, so the symbol transform+explode — the expensive
    per-row work — runs |types| times instead of |tokens| times. Both
    aggregations are bounded (word types, then the character
    inventory); the symbol set is identical by construction."""
    from pyspark.sql import functions as F

    syms_expr = (
        "explode(transform(split(w, ''), "
        f"(c, i) -> IF(i = 0, c, concat('{CONT}', c))))"
    )
    rows = (
        df.select(F.explode(F.split(F.col(text_col), r"\s+")).alias("w"))
        .where(F.col("w") != "")
        .distinct()
        .select(F.expr(syms_expr).alias("s"))
        .distinct()
        .collect()
    )
    return sorted(r["s"] for r in rows)


def _greedy_pieces_sql(
    w: str, m: str, *, max_len: int, max_word_chars: int, unk: str
) -> str:
    """SQL expression: the WordPiece pieces array of the (non-empty)
    string expression ``w`` under the map<string,int> vocab column
    ``m`` — greedy longest-match-first, whole-word [UNK] on any
    unmatchable position or an over-long word. Pure JVM whole-row
    expression (the executor path has no Python): one ``aggregate``
    fold over character positions whose state is (consumed-prefix
    length, pieces, failed); the per-step best match length binds ONCE
    via a single-element transform (the _viterbi_pieces_sql trick), so
    the longest-match scan is not re-evaluated per field."""
    unk_lit = "'" + unk.replace("'", "''") + "'"

    def piece(pos: str, ln: str) -> str:
        return (
            f"IF({pos} = 0, substring({w}, 1, {ln}), "
            f"concat('{CONT}', substring({w}, {pos} + 1, {ln})))"
        )

    best = (
        f"array_max(filter(transform("
        f"sequence(1, least({max_len}, length({w}) - acc.p)), "
        f"L -> IF(try_element_at({m}, {piece('acc.p', 'L')}) IS NOT NULL, "
        "L, CAST(NULL AS INT))), x -> x IS NOT NULL))"
    )
    step = (
        f"element_at(transform(array({best}), B -> IF(B IS NULL, "
        f"named_struct('p', length({w}), 'out', acc.out, 'bad', true), "
        f"named_struct('p', acc.p + B, "
        f"'out', array_append(acc.out, {piece('acc.p', 'B')}), "
        "'bad', false))), 1)"
    )
    fold = (
        f"aggregate(sequence(1, length({w})), "
        "named_struct('p', 0, "
        "'out', CAST(array() AS array<string>), 'bad', false), "
        f"(acc, _i) -> IF(acc.bad OR acc.p >= length({w}), acc, {step}), "
        f"a -> IF(a.bad, array({unk_lit}), a.out))"
    )
    return (
        f"IF(length({w}) > {max_word_chars}, array({unk_lit}), {fold})"
    )


def _vocab_row_df(spark, pieces: list[str]):
    """(map<piece,id>, …) as ONE broadcastable row — the bounded-model
    pattern unigram._model_row_df uses. Ids are the list indexes."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(p, i) for i, p in enumerate(pieces)], "piece string, id int"
    )
    return df.groupBy().agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("piece"), F.col("id")))
        ).alias("__wpm"),
    )


def encode_documents_wordpiece(
    df,
    vocab: list[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    unk: str = "[UNK]",
    max_word_chars: int = 100,
    output: str = "pieces",
    out_col: str = "tokens",
    strategy: str = "types",
):
    """Tokenize documents with a WordPiece vocabulary: whitespace
    words, each greedy-longest-matched under ``vocab`` (build it with
    :func:`wordpiece_pieces` from a trained merge list + alphabet),
    concatenated in order. A word with any unmatchable position, or
    longer than ``max_word_chars``, contributes the single ``unk``
    token — BERT's whole-word-UNK rule. ``output='pieces'`` emits
    array<string>; ``'ids'`` emits array<int> (id = the piece's vocab
    index; ``unk`` maps to its own index when present in ``vocab``,
    else -1). NULL text -> empty array, the module encode convention.

    ``strategy='types'`` (default) runs the greedy DP once per
    DISTINCT word, not once per token: (doc, widx, word) explodes
    scan-side, distinct words segment under the one-row broadcast
    vocab map, pieces join back on the word and one (doc) aggregation
    reassembles in word order. Zipf makes the type table orders of
    magnitude smaller than the corpus, so the interpreted fold —
    the expensive part — runs |types| times instead of |tokens| times
    (measured 6x on the sf0.1 bench corpus; more on real text where
    types/tokens is smaller). Cost: the tokenized corpus crosses the
    wire once (ids + short words + piece arrays, three bounded
    shuffles). ``strategy='scan'`` keeps the zero-shuffle per-token
    fold — right for streaming sinks or corpora of near-unique words
    (URLs, hashes) where the type table IS the corpus."""
    from pyspark.sql import functions as F

    if output not in ("pieces", "ids"):
        raise ValueError(f"output must be pieces|ids, got {output!r}")
    if strategy not in ("types", "scan"):
        raise ValueError(
            f"strategy must be types|scan, got {strategy!r}"
        )
    if max_word_chars < 1:
        raise ValueError(
            f"max_word_chars must be >= 1, got {max_word_chars}"
        )
    max_len = max((len(p) for p in vocab), default=1)
    mrow = _vocab_row_df(df.sparkSession, list(vocab))
    word_pieces = _greedy_pieces_sql(
        "w", "`__wpm`", max_len=max_len,
        max_word_chars=max_word_chars, unk=unk,
    )
    if strategy == "types":
        return _encode_by_types(
            df, mrow, word_pieces,
            id_col=id_col, text_col=text_col, output=output,
            out_col=out_col,
        )
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
        return staged.withColumn(out_col, pieces).drop("__wpm")
    return staged.withColumn(
        out_col,
        F.coalesce(
            F.expr(
                "transform(" + toks + ", p -> "
                "coalesce(try_element_at(`__wpm`, p), -1))"
            ),
            F.expr("CAST(array() AS array<int>)"),
        ),
    ).drop("__wpm")


def _encode_by_types(
    df, mrow, word_pieces: str, *, id_col, text_col, output, out_col
):
    """Per-distinct-word segmentation + join-reassembly (the
    line_dedup reassembly shape): explode (id, widx, w) scan-side,
    fold ONCE per distinct word, equi-join pieces back (AQE
    broadcasts the type table when it is small), reassemble per doc by
    sorting (widx, pieces) structs. Docs with no words (NULL/empty
    text) re-enter via the left join with an empty token array."""
    from pyspark.sql import functions as F

    words = df.select(
        F.col(id_col),
        F.posexplode_outer(
            F.filter(
                F.split(F.col(text_col), r"\s+"), lambda w: w != ""
            )
        ).alias("__wi", "__w"),
    ).where(F.col("__w").isNotNull())
    # word_pieces is written against a column named `w`
    pieces_expr = (
        word_pieces
        if output == "pieces"
        else (
            "transform(" + word_pieces + ", p -> "
            "coalesce(try_element_at(`__wpm`, p), -1))"
        )
    )
    types = (
        words.select("__w").distinct()
        .crossJoin(F.broadcast(mrow))
        .withColumnRenamed("__w", "w")
        .select(F.col("w"), F.expr(pieces_expr).alias("__pieces"))
        .select(F.col("w").alias("__w"), "__pieces")
    )
    empty = (
        "CAST(array() AS array<string>)"
        if output == "pieces"
        else "CAST(array() AS array<int>)"
    )
    assembled = (
        words.join(types, "__w")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("__wi").alias("i"),
                                F.col("__pieces").alias("p"),
                            )
                        )
                    ),
                    lambda s: s["p"],
                )
            ).alias(out_col)
        )
    )
    return df.join(assembled, id_col, "left").withColumn(
        out_col, F.coalesce(F.col(out_col), F.expr(empty))
    )


def save_wordpiece_tokenizer(
    path,
    *,
    merges: list[tuple[str, str]],
    alphabet: list[str],
    format: str = "native",
    unk_token: str = "[UNK]",
) -> None:
    """Persist merges + alphabet as one JSON artifact — the train-once /
    encode-many contract of bpe.save_tokenizer.

    ``format='hf'`` writes the HuggingFace ``tokenizer.json`` layout
    (model.type=WordPiece) instead: the DERIVED vocabulary
    (:func:`wordpiece_pieces`, plus ``unk_token`` appended when absent)
    with list-index ids — HF WordPiece stores the final vocab, not the
    training merges. Load it back with
    :func:`.hf_tokenizer.load_hf_tokenizer` (the ``vocab`` field feeds
    :func:`encode_documents_wordpiece` directly)."""
    import json
    from pathlib import Path

    if format == "hf":
        from timefence_spark.operators.hf_tokenizer import (
            save_hf_tokenizer,
        )

        save_hf_tokenizer(
            path,
            wordpiece={
                "vocab": wordpiece_pieces(merges, alphabet),
                "unk_token": unk_token,
            },
        )
        return
    if format != "native":
        raise ValueError(f"format must be native|hf, got {format!r}")
    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(
        json.dumps(
            {
                "format": "timefence-spark-wordpiece",
                "version": 1,
                "alphabet": list(alphabet),
                "merges": [[left, right] for left, right in merges],
            }
        )
    )


def load_wordpiece_tokenizer(
    path,
) -> tuple[list[tuple[str, str]], list[str]]:
    import json
    from pathlib import Path

    data = json.loads(Path(path).read_text())
    if isinstance(data.get("model"), dict) and "type" in data["model"]:
        # tokenizer.json stores the FINAL vocab; merges/alphabet are
        # training residue it doesn't carry, so this loader can't
        # reconstruct its return shape from one.
        raise ValueError(
            f"{path} is a tokenizer.json artifact — load it with "
            "hf_tokenizer.load_hf_tokenizer; its 'vocab' feeds "
            "encode_documents_wordpiece directly"
        )
    if data.get("format") != "timefence-spark-wordpiece":
        raise ValueError(
            f"{path} is not a timefence-spark wordpiece artifact"
        )
    return (
        [(left, right) for left, right in data["merges"]],
        [str(a) for a in data["alphabet"]],
    )
