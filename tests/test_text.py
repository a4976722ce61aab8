"""Text operators: token stats/quality vs DuckDB oracles; lang-id/fingerprint
properties."""

from __future__ import annotations

import pytest

from timefence_spark.operators import text as text_ops

from tests.conftest import assert_df_equals_sql


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_token_stats_vs_oracle(spark, oracle, docs):
    out = text_ops.token_stats(docs, id_col="doc_id", text_col="text")
    sql = r"""
    WITH t AS (
        SELECT doc_id, text, string_split_regex(lower(text), '\s+') AS toks
        FROM documents
    )
    SELECT doc_id,
           LENGTH(text) AS n_chars,
           LEN(toks) AS n_tokens,
           LEN(list_distinct(toks)) AS n_types,
           ROUND(LEN(list_distinct(toks))::DOUBLE / LEN(toks), 6) AS type_token_ratio,
           ROUND(list_sum(list_transform(toks, t -> LENGTH(t)))::DOUBLE / LEN(toks), 6)
               AS mean_token_len
    FROM t
    """
    assert_df_equals_sql(out, oracle, sql)


def test_quality_score_ranges(spark, docs):
    rows = text_ops.quality_score(docs, id_col="doc_id", text_col="text").collect()
    assert len(rows) == docs.count()
    for r in rows:
        assert 0.0 <= r.quality_score <= 1.0
        assert 0.0 <= r.punct_ratio <= 1.0
        assert 0.0 <= r.repetition <= 1.0
        assert r.stopword_ratio >= 0.0


def test_lang_id_deterministic_and_scored(spark, docs):
    out1 = text_ops.lang_id(docs, id_col="doc_id", text_col="text").collect()
    out2 = text_ops.lang_id(docs, id_col="doc_id", text_col="text").collect()
    assert {r.doc_id: r.lang_pred for r in out1} == {
        r.doc_id: r.lang_pred for r in out2
    }
    assert all(r.lang_pred in text_ops.LANG_MARKERS for r in out1)


def test_lang_id_on_real_language_text(spark):
    samples = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and it is warm in the sun"),
            (2, "der hund ist nicht mit der katze und das ist gut"),
            (3, "le chat est dans la maison et il est pour les enfants"),
            (4, "el perro es de la casa y es un amigo con el gato"),
        ],
        "doc_id int, text string",
    )
    preds = {
        r.doc_id: r.lang_pred
        for r in text_ops.lang_id(samples, id_col="doc_id", text_col="text").collect()
    }
    assert preds == {1: "en", 2: "de", 3: "fr", 4: "es"}


def test_lang_id_custom_profile_changes_prediction(spark):
    """A user-supplied marker profile must override the demo lexicon."""
    samples = spark.createDataFrame(
        [(1, "frobnicate the widget with zork and grue tokens")],
        "doc_id int, text string",
    )
    default_pred = text_ops.lang_id(
        samples, id_col="doc_id", text_col="text"
    ).collect()[0]
    assert default_pred.lang_pred == "en"  # "the"/"with" hit the demo list
    custom = {
        "zorkish": ["frobnicate", "zork", "grue", "widget"],
        "en": text_ops.LANG_MARKERS["en"],
    }
    custom_pred = text_ops.lang_id(
        samples, id_col="doc_id", text_col="text", markers=custom
    ).collect()[0]
    assert custom_pred.lang_pred == "zorkish"
    assert custom_pred.lang_score > default_pred.lang_score


def test_quality_score_custom_stopwords(spark):
    """stopword_ratio must follow the supplied lexicon, not the default."""
    samples = spark.createDataFrame(
        [(1, "alpha beta gamma alpha beta gamma alpha beta gamma delta")],
        "doc_id int, text string",
    )
    default_row = text_ops.quality_score(
        samples, id_col="doc_id", text_col="text"
    ).collect()[0]
    assert default_row.stopword_ratio == 0.0
    custom_row = text_ops.quality_score(
        samples, id_col="doc_id", text_col="text", stopwords=["alpha", "delta"]
    ).collect()[0]
    assert custom_row.stopword_ratio == 0.4


def test_fingerprint_properties(spark, docs):
    fp = text_ops.fingerprint(docs, id_col="doc_id", text_col="text", num_hashes=8)
    rows = fp.collect()
    assert all(1 <= len(r.fingerprint) <= 8 for r in rows)
    assert all(r.fingerprint == sorted(r.fingerprint) for r in rows)
    # identical text -> identical fingerprint
    import pyspark.sql.functions as F

    dup = docs.limit(5).select((F.col("doc_id") + 9000).alias("doc_id"), "text")
    both = text_ops.fingerprint(
        docs.limit(5).select("doc_id", "text").unionByName(dup),
        id_col="doc_id",
        text_col="text",
    ).collect()
    by_id = {r.doc_id: r.fingerprint for r in both}
    for i in by_id:
        if i >= 9000:
            assert by_id[i] == by_id[i - 9000]


def test_gopher_quality_rules(spark):
    """Each Gopher rule fires on its designed violation; pass requires all."""
    rows = [
        (1, "the quick brown foxes jumped over the lazy dogs and then rested on warm stones for hours"),
        (2, "a b c d e f g h i j k l m n o p"),            # short words
        (3, "word " * 4),                                   # too few words
        (4, "#x #y #z " * 8 + "the of and to in is that"),  # symbol-heavy
        (5, "1 2 3 4 5 6 7 8 9 10 11 12 the of"),           # digit words
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r["doc_id"]: r.asDict()
        for r in text_ops.gopher_quality(
            df, id_col="doc_id", text_col="text", min_words=10
        ).collect()
    }
    assert got[1]["gopher_pass"] is True
    assert got[2]["rule_mean_word_len"] is False and got[2]["gopher_pass"] is False
    assert got[3]["rule_word_count"] is False
    assert got[4]["rule_symbol_ratio"] is False
    assert got[5]["rule_alpha_words"] is False
    # Thresholds are per-call knobs
    loose = {
        r["doc_id"]: r.asDict()
        for r in text_ops.gopher_quality(
            df, id_col="doc_id", text_col="text",
            min_words=2, min_mean_word_len=0.0, max_symbol_ratio=10.0,
            min_alpha_frac=0.0, min_stopword_hits=0,
        ).collect()
    }
    assert all(v["gopher_pass"] for v in loose.values())


def test_repetition_signals_exact(spark):
    rows = [
        (1, "a b a b a b a b"),       # "a b" x4 of 7 bigrams
        (2, "all unique words here"),  # 3 bigrams, all distinct
        (3, "solo"),                   # no bigram
        (4, "x y x y z x y"),          # "x y" x3 of 6
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r["doc_id"]: r.asDict()
        for r in text_ops.repetition_signals(
            df, id_col="doc_id", text_col="text", ngram=2
        ).collect()
    }
    assert got[1]["n_ngrams"] == 7 and got[1]["top_ngram"] == "a b"
    assert got[1]["top_ngram_frac"] == pytest.approx(4 / 7, abs=1e-6)
    assert got[1]["dup_ngram_frac"] == pytest.approx(1 - 2 / 7, abs=1e-6)
    assert got[2]["dup_ngram_frac"] == 0.0 and got[2]["top_ngram_frac"] == pytest.approx(1 / 3, abs=1e-6)
    assert got[3]["n_ngrams"] == 0 and got[3]["top_ngram"] is None
    assert got[4]["top_ngram"] == "x y" and got[4]["top_ngram_frac"] == 0.5
    # trigram mode
    tri = {
        r["doc_id"]: r.asDict()
        for r in text_ops.repetition_signals(
            df, id_col="doc_id", text_col="text", ngram=3
        ).collect()
    }
    assert tri[1]["top_ngram"] in ("a b a", "b a b") and tri[1]["n_ngrams"] == 6


def test_text_operator_plans_single_evaluate(spark, docs):
    """Plan-shape pin: the non-codegen HOFs (split/filter/aggregate/argmax)
    must appear exactly once in each executed plan — a second occurrence
    means a wide select re-inlined a staged expression and the per-row cost
    silently doubled (caught live: lang_id once re-split the text 11x)."""
    cases = [
        (text_ops.token_stats, {"split(lower": 1, "aggregate(": 1}),
        (text_ops.token_count_bpe, {"regexp_extract_all": 1}),
        (text_ops.quality_score, {"split(lower": 1}),
        (text_ops.lang_id, {"split(lower": 1, "array_max": 1}),
        (text_ops.gopher_quality, {"split(lower": 1}),
        (text_ops.repetition_signals, {"split(lower": 1, "aggregate(": 1}),
    ]
    for fn, expected in cases:
        plan = (
            fn(docs, id_col="doc_id", text_col="text")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        for marker, count in expected.items():
            assert plan.count(marker) == count, (
                f"{fn.__name__}: {marker} appears {plan.count(marker)}x, "
                f"expected {count}"
            )


def test_normalize_text_behaviors(spark):
    df = spark.createDataFrame(
        [(1, "  A\tB\r\nC   D \x07E  "), (2, None)], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r["text"]
        for r in text_ops.normalize_text(
            df, id_col="doc_id", text_col="text", lowercase=True
        ).collect()
    }
    assert out[1] == "a b c d e"
    assert out[2] is None
    kept = text_ops.normalize_text(df, id_col="doc_id", text_col="text", out_col="norm")
    assert set(kept.columns) == {"doc_id", "text", "norm"}


def test_line_dedup_min_len_and_first_occurrence(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta\nshared line one\nunique to one"),
            (2, "shared line one\ngamma delta\nxx"),
            (3, "shared line one"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in text_ops.line_dedup(
            df, id_col="doc_id", text_col="text", min_len=3
        ).collect()
    }
    assert out[1]["text"] == "alpha beta\nshared line one\nunique to one"
    assert out[1]["n_kept"] == 3
    # doc 2 loses the shared line (doc 1 saw it first); short 'xx' bypasses
    assert out[2]["text"] == "gamma delta\nxx"
    assert out[2]["n_lines"] == 3 and out[2]["n_kept"] == 2
    # doc 3's only line was seen earlier -> empty text
    assert out[3]["text"] == "" and out[3]["n_kept"] == 0


def test_vendored_bpe_deterministic_and_greedy():
    """The vendored BPE must be a pure function of its fixed training
    text (merge list stable across imports/reloads) and encode by global
    best rank at the leftmost occurrence — the loop the SQL oracle
    replays."""
    import importlib

    from timefence_spark.operators import bpe

    merges_a = list(bpe.VENDORED_MERGES)
    importlib.reload(bpe)
    assert bpe.VENDORED_MERGES == merges_a
    assert len(bpe.VENDORED_MERGES) > 50

    # concatenation of the tokens must reproduce the word; unknown
    # characters fall back to singles
    for w in ["customer", "table", "spark", "xyzzy", "a", ""]:
        toks = bpe.encode(w) if w else []
        assert "".join(toks) == w
    # rank order decides, not left-to-right scanning: with ranks
    # {(b,c):0, (a,b):1} the (b,c) merge wins even though (a,b) is
    # leftmost
    ranks = {("b", "c"): 0, ("a", "b"): 1}
    assert bpe.encode("abc", ranks) == ["a", "bc"]
    # leftmost occurrence of the best-ranked pair merges first
    ranks = {("a", "a"): 0}
    assert bpe.encode("aaa", ranks) == ["aa", "a"]
    assert bpe.token_count(None) == 0
    assert bpe.token_count("  ") == 0


def test_train_bpe_spark_matches_python_trainer(spark):
    """Distributed BPE training (round 9) must be merge-for-merge
    identical to the sequential Python trainer on the same text — same
    pair counts, same (-freq, pair) tie-break, same stop rule — and the
    learned merges must plug into token_count_exact via
    make_token_counter."""
    from timefence_spark.operators import bpe, text as t_ops

    rows = [
        (1, "low lower lowest low low newer newest new"),
        (2, "wider wide widest new newer lower"),
        (3, "the cat sat on the mat the cat ran"),
        (4, ""),  # empty doc contributes nothing
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    ref = bpe.train_bpe(
        " ".join(t for _, t in rows), n_merges=30
    )
    # Distributed loop AND the size-gated local path (auto at this size)
    # must both reproduce the sequential trainer exactly.
    got = bpe.train_bpe_spark(
        df, text_col="text", n_merges=30, checkpoint_every=5,
        mode="distributed",
    )
    assert got == ref and len(got) > 5
    assert bpe.train_bpe_spark(df, text_col="text", n_merges=30) == ref
    # the gate overflows to distributed when types exceed the threshold
    assert bpe.train_bpe_spark(
        df, text_col="text", n_merges=30, local_threshold=3
    ) == ref
    with pytest.raises(ValueError, match="word types"):
        bpe.train_bpe_spark(
            df, text_col="text", n_merges=5, mode="local", local_threshold=3
        )
    with pytest.raises(ValueError, match="checkpoint_every"):
        bpe.train_bpe_spark(df, text_col="text", checkpoint_every=0)
    # ASCII-whitespace contract: NBSP is NOT a word boundary on either
    # side, so trainer and counter agree on Unicode-whitespace text.
    nb = spark.createDataFrame(
        [(1, "a\u00a0b a\u00a0b c c")], "doc_id long, text string"
    )
    got_nb = bpe.train_bpe_spark(nb, text_col="text", n_merges=5)
    assert got_nb == bpe.train_bpe("a\u00a0b a\u00a0b c c", 5)
    assert ("a", "\u00a0") in got_nb  # NBSP lives INSIDE the word

    # the learned table drives exact counting end-to-end
    counter = bpe.make_token_counter(got)
    counts = {
        r["doc_id"]: r["n_tokens"]
        for r in t_ops.token_count_exact(
            df, id_col="doc_id", text_col="text", tokenizer_fn=counter
        ).collect()
    }
    ranks = {p: i for i, p in enumerate(got)}
    for doc_id, txt in rows:
        expect = sum(len(bpe.encode(w, ranks)) for w in txt.split() if w)
        assert counts[doc_id] == expect

    # early stop: a corpus where no pair repeats learns nothing
    single = spark.createDataFrame([(1, "ab cd ef")], "doc_id long, text string")
    assert bpe.train_bpe_spark(single, text_col="text", n_merges=10) == []


def test_classifier_score_paths_agree_and_gate_filters(spark):
    """The literal-expression path and the explode+broadcast-join path
    must score identically (up to the documented last-ulp round), and
    the Corpus gate keeps only docs over the threshold."""
    from timefence_spark import Corpus
    from timefence_spark.operators import text as t_ops

    rows = [
        (1, "the table holds the query data"),
        (2, "slow dup slow dup slow"),
        (3, "table table query"),
        (4, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    weights = {"table": 2.0, "query": 1.5, "slow": -1.5, "dup": -2.0}
    expr = {
        r["doc_id"]: r
        for r in t_ops.classifier_score(
            docs, id_col="doc_id", text_col="text", weights=weights, bias=-0.5
        ).collect()
    }
    wdf = spark.createDataFrame(list(weights.items()), "word string, weight double")
    joined = {
        r["doc_id"]: r
        for r in t_ops.classifier_score(
            docs, id_col="doc_id", text_col="text", weights_df=wdf, bias=-0.5
        ).collect()
    }
    import math

    for i in (1, 2, 3):
        assert abs(expr[i]["clf_score"] - joined[i]["clf_score"]) <= 1e-6
    # hand-check doc 3: (2*2 + 1.5*1)/3 - 0.5 = 1.3333...
    want = 1.0 / (1.0 + math.exp(-(2 * 2 + 1.5) / 3 + 0.5))
    assert expr[3]["clf_score"] == pytest.approx(want, abs=1e-6)
    # zero-token contract: NULL text -> n_tokens = 0 and the model's
    # no-evidence prediction sigmoid(bias), identically on both paths —
    # guarded with F.when, so it cannot depend on legacy-vs-ANSI
    # size(NULL) semantics
    no_evidence = 1.0 / (1.0 + math.exp(0.5))
    for path in (expr, joined):
        assert path[4]["n_tokens"] == 0
        assert path[4]["clf_score"] == pytest.approx(no_evidence, abs=1e-6)
    # classifier gate: positive docs survive, spammy docs drop, and the
    # token-less doc is KEPT (keep-unscored, mirroring filter_fluency)
    kept = {
        r["doc_id"]
        for r in Corpus(docs)
        .filter_classifier(min_score=0.5, weights=weights, bias=-0.5)
        .df.collect()
    }
    assert kept == {1, 3, 4}
    with pytest.raises(ValueError):
        t_ops.classifier_score(docs, id_col="doc_id", text_col="text")


def test_line_dedup_hash_mode_matches_text_mode(spark):
    """key_by='hash' must produce byte-identical output to key_by='text'
    on data with a hot boilerplate line, in-doc repeats, and sub-floor
    short lines — the 128-bit key changes the shuffle shape, never the
    answer."""
    from timefence_spark.operators import text as t_ops

    hot = "this exact header line appears in most documents"
    rows = [
        (i, "\n".join([hot, f"unique line number {i} with payload", "xx",
                       hot if i % 3 == 0 else f"tail {i}"]))
        for i in range(1, 40)
    ] + [(99, None), (100, "")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    kw = dict(id_col="doc_id", text_col="text", min_len=3)
    by_text = sorted(map(tuple, t_ops.line_dedup(docs, **kw).collect()))
    by_hash = sorted(
        map(tuple, t_ops.line_dedup(docs, key_by="hash", **kw).collect())
    )
    assert by_text == by_hash
    with pytest.raises(ValueError, match="key_by"):
        t_ops.line_dedup(docs, key_by="md5", **kw)


def test_chunk_documents_known_answers(spark):
    """Token-window chunking: stride = chunk_tokens - overlap, boundary
    tokens repeat across chunks, trailing fragments below min_tokens are
    dropped, token-less docs produce no rows, and the plan is a pure
    projection (no exchange)."""
    from timefence_spark.operators import text as t_ops

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h i j"), (2, "x y z"), (3, None), (4, "solo")],
        "doc_id long, text string",
    )
    out = t_ops.chunk_documents(
        docs, id_col="doc_id", text_col="text", chunk_tokens=4, overlap=1
    )
    rows = sorted(map(tuple, out.collect()))
    assert rows == [
        (1, 0, 0, 4, "a b c d"),
        (1, 1, 3, 4, "d e f g"),
        (1, 2, 6, 4, "g h i j"),
        (1, 3, 9, 1, "j"),
        (2, 0, 0, 3, "x y z"),
        (4, 0, 0, 1, "solo"),
    ]
    # min_tokens drops the trailing fragment
    trimmed = t_ops.chunk_documents(
        docs, id_col="doc_id", text_col="text",
        chunk_tokens=4, overlap=1, min_tokens=2,
    )
    assert (1, 3, 9, 1, "j") not in set(map(tuple, trimmed.collect()))
    # scan-side: no shuffle anywhere in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    for bad in (
        dict(chunk_tokens=0),
        dict(overlap=4),
        dict(min_tokens=0),
    ):
        with pytest.raises(ValueError):
            t_ops.chunk_documents(
                docs, id_col="doc_id", text_col="text",
                **{"chunk_tokens": 4, "overlap": 1, **bad},
            )


@pytest.mark.parametrize(
    "ansi,legacy",
    [("true", "false"), ("false", "true")],
    ids=["ansi-4x", "legacy-3x"],
)
def test_null_text_portable_across_size_semantics(spark, ansi, legacy):
    """A NULL-text document must yield the SAME (oracle-pinned) outputs
    under ANSI size(NULL)=NULL and under the legacy sizeOfNull=-1 config
    some 3.x deployments still run — the _nsize guards make the operators
    independent of session config, so counts are NULL (never -1) and no
    -1 poisons a downstream ratio."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, None), (2, "the quick brown fox the fox")],
        "doc_id long, text string",
    )
    ops = {
        "token_stats": lambda d: text_ops.token_stats(
            d, id_col="doc_id", text_col="text"
        ),
        "token_count_bpe": lambda d: text_ops.token_count_bpe(
            d, id_col="doc_id", text_col="text"
        ),
        "quality_score": lambda d: text_ops.quality_score(
            d, id_col="doc_id", text_col="text"
        ),
        "lang_id": lambda d: text_ops.lang_id(
            d, id_col="doc_id", text_col="text"
        ),
        "gopher_quality": lambda d: text_ops.gopher_quality(
            d, id_col="doc_id", text_col="text"
        ),
        "repetition_signals": lambda d: text_ops.repetition_signals(
            d, id_col="doc_id", text_col="text"
        ),
        "classifier_score": lambda d: text_ops.classifier_score(
            d, id_col="doc_id", text_col="text", weights={"fox": 1.0}
        ),
        # guarded sites outside text.py (same sweep): URL counts, PII
        # counts, decontamination gram counts
        "url_signals": lambda d: __import__(
            "timefence_spark.operators.web", fromlist=["web"]
        ).url_signals(d, id_col="doc_id", text_col="text"),
        "pii_signals": lambda d: __import__(
            "timefence_spark.operators.pii", fromlist=["pii"]
        ).pii_signals(d, id_col="doc_id", text_col="text"),
        "decontaminate_report": lambda d: __import__(
            "timefence_spark.operators.dedup", fromlist=["dedup"]
        ).decontaminate(
            d, d.where("doc_id = 2"), id_col="doc_id", text_col="text", n=2
        ),
    }
    saved = {
        "spark.sql.ansi.enabled": spark.conf.get("spark.sql.ansi.enabled"),
        "spark.sql.legacy.sizeOfNull": spark.conf.get(
            "spark.sql.legacy.sizeOfNull"
        ),
    }
    try:
        spark.conf.set("spark.sql.ansi.enabled", ansi)
        spark.conf.set("spark.sql.legacy.sizeOfNull", legacy)
        # sanity: the config really flips raw size(NULL) semantics
        raw = df.where("doc_id = 1").select(
            F.size(F.split(F.col("text"), " ")).alias("s")
        ).head()["s"]
        assert raw == (None if ansi == "true" else -1)
        for name, op in ops.items():
            rows = {r["doc_id"]: r.asDict() for r in op(df).collect()}
            null_row = rows[1]
            for col, val in null_row.items():
                assert val != -1, (name, col, null_row)
            if "n_tokens" in null_row and name != "classifier_score":
                assert null_row["n_tokens"] is None, (name, null_row)
            # the non-null doc is unaffected by config
            assert rows[2]["doc_id"] == 2
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_hash_embed_ansi_mode(spark):
    """hash_embed gathers the dense vector from a sparse bucket map —
    most keys are MISSING by construction, and under
    spark.sql.ansi.enabled=true a plain element_at on a missing map key
    throws MAP_KEY_DOES_NOT_EXIST. The gather uses try_element_at
    (ADVICE r12), so the vectors must be identical across configs."""
    df = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "pack my box")],
        "doc_id long, text string",
    )
    saved = spark.conf.get("spark.sql.ansi.enabled")
    out = {}
    try:
        for ansi in ("false", "true"):
            spark.conf.set("spark.sql.ansi.enabled", ansi)
            out[ansi] = {
                r["doc_id"]: r["embedding"]
                for r in text_ops.hash_embed(
                    df, id_col="doc_id", text_col="text", dims=16
                ).collect()
            }
    finally:
        spark.conf.set("spark.sql.ansi.enabled", saved)
    assert out["true"] == out["false"]
    assert len(out["true"][1]) == 16


def test_chunk_documents_empty_and_whitespace_docs(spark):
    """ADVICE r7: empty-string and whitespace-only documents must produce
    NO chunks at the default min_tokens=1 (split('') yields [''], which
    previously leaked a zero-content chunk), and leading/trailing
    whitespace must not inject empty tokens into real chunks."""
    docs = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, None), (4, "a b"), (5, "  a b  ")],
        "doc_id long, text string",
    )
    rows = text_ops.chunk_documents(
        docs, id_col="doc_id", text_col="text", chunk_tokens=4
    ).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == {4, 5}
    for d in (4, 5):
        (chunk,) = by_doc[d]
        assert chunk["chunk_text"] == "a b"
        assert chunk["n_tokens"] == 2
        assert chunk["tok_start"] == 0


def test_bigram_logprob_known_answers(spark):
    """Hand-computed interpolated bigram NLL on a 3-doc corpus:
    transitions score lam*p_bi + (1-lam)*p_uni with add-1 unigram
    backoff; docs with < 2 tokens produce no row; unseen transitions
    (under an external LM) count toward oov_frac."""
    import math

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b"), (3, "x"), (4, None)],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in text_ops.bigram_logprob(
            docs, id_col="doc_id", text_col="text", lam=0.5
        ).collect()
    }
    assert set(out) == {1, 2}  # doc 3: one token; doc 4: NULL
    # corpus: tokens a(3) b(3) x(1), N=7, V=3 -> denom = 7 + 1*(3+1) = 11
    # bigrams: (a,b):3, (b,a):1 ; ctx totals: a->3, b->1
    p_uni = {"a": 4 / 11, "b": 4 / 11}
    p_ab = 0.5 * (3 / 3) + 0.5 * p_uni["b"]
    p_ba = 0.5 * (1 / 1) + 0.5 * p_uni["a"]
    d1 = (2 * -math.log(p_ab) + 1 * -math.log(p_ba)) / 3
    assert out[1]["n_bigrams"] == 3
    assert out[1]["oov_frac"] == 0.0
    assert out[1]["mean_nll"] == pytest.approx(d1, abs=1e-6)
    assert out[2]["mean_nll"] == pytest.approx(-math.log(p_ab), abs=1e-6)

    # external LM that has never seen (b, a): transition is OOV but still
    # scored via the unigram backoff
    lm = spark.createDataFrame(
        [("a", "b", 3)], "w_prev string, word string, n_occurrences long"
    )
    uni = spark.createDataFrame(
        [("a", 3), ("b", 3), ("x", 1)], "word string, n_occurrences long"
    )
    ext = {
        r["doc_id"]: r
        for r in text_ops.bigram_logprob(
            docs, id_col="doc_id", text_col="text",
            lm=lm, lm_unigram=uni, lam=0.5,
        ).collect()
    }
    assert ext[1]["oov_frac"] == pytest.approx(1 / 3, abs=1e-6)
    p_ba_oov = 0.5 * 0.0 + 0.5 * p_uni["a"]
    d1_ext = (2 * -math.log(p_ab) + 1 * -math.log(p_ba_oov)) / 3
    assert ext[1]["mean_nll"] == pytest.approx(d1_ext, abs=1e-6)

    with pytest.raises(ValueError, match="lam"):
        text_ops.bigram_logprob(docs, id_col="doc_id", text_col="text", lam=1.5)


def test_filter_fluency_bigram_model(spark):
    """Corpus.filter_fluency(model='bigram') drops high-NLL docs and
    keeps unscored (< 2 token) docs."""
    from timefence_spark.corpus import Corpus

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat " * 5),
            (2, "the cat sat on the mat " * 5),
            (3, "zq wv xj kp qq zz pq vx"),  # unseen-transition soup
            (4, "one"),                       # single token: unscored, kept
        ],
        "doc_id long, text string",
    )
    # Reference LM trained on the fluent docs (the CCNet setup: score
    # against a trusted corpus, not self — under self-statistics a
    # unique-transition soup scores p_bi = 1 for every pair).
    ref = docs.where("doc_id <= 2")
    lm = text_ops.bigram_frequencies(ref, id_col="doc_id", text_col="text")
    uni = text_ops.word_frequencies(ref, id_col="doc_id", text_col="text")
    nll = {
        r["doc_id"]: r["mean_nll"]
        for r in text_ops.bigram_logprob(
            docs, id_col="doc_id", text_col="text", lm=lm, lm_unigram=uni
        ).collect()
    }
    assert nll[3] > max(nll[1], nll[2])
    cut = (max(nll[1], nll[2]) + nll[3]) / 2
    kept = {
        r["doc_id"]
        for r in Corpus(docs).filter_fluency(
            max_nll=cut, model="bigram", lm=lm, lm_unigram=uni
        ).df.collect()
    }
    assert kept == {1, 2, 4}
    with pytest.raises(ValueError, match="model"):
        # trigram became a real model in round 12; 4-grams are not one
        Corpus(docs).filter_fluency(max_nll=1.0, model="fourgram")


def test_fit_classifier_known_answers(spark):
    """NB log-odds against hand-computed values; NULL label rows drop,
    NULL text contributes nothing, min_count cuts the vocabulary (and
    the totals/V are recomputed after the cut)."""
    import math

    rows = [
        (1, "good good nice", True),
        (2, "bad bad awful", False),
        (3, "good bad", True),
        (4, None, True),
        (5, "ignored words", None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lab boolean")
    got = {
        r["word"]: r
        for r in text_ops.fit_classifier(
            docs, id_col="doc_id", text_col="text", label_col="lab"
        ).collect()
    }
    # counts: good (3, 0), nice (1, 0), bad (1, 2), awful (0, 1)
    # T_pos = 5, T_neg = 3, V = 4, a = 1
    assert set(got) == {"good", "nice", "bad", "awful"}
    assert (got["good"]["n_pos"], got["good"]["n_neg"]) == (3, 0)
    assert (got["bad"]["n_pos"], got["bad"]["n_neg"]) == (1, 2)

    def w(c_pos, c_neg, t_pos=5, t_neg=3, v=4):
        return round(
            math.log((c_pos + 1) / (t_pos + v)) - math.log((c_neg + 1) / (t_neg + v)),
            6,
        )

    assert got["good"]["weight"] == w(3, 0)
    assert got["nice"]["weight"] == w(1, 0)
    assert got["bad"]["weight"] == w(1, 2)
    assert got["awful"]["weight"] == w(0, 1)
    assert got["good"]["weight"] > 0 > got["awful"]["weight"]

    # min_count=2 drops nice/awful; totals shrink to the surviving vocab.
    cut = {
        r["word"]: r["weight"]
        for r in text_ops.fit_classifier(
            docs, id_col="doc_id", text_col="text", label_col="lab", min_count=2
        ).collect()
    }
    assert set(cut) == {"good", "bad"}
    assert cut["good"] == w(3, 0, t_pos=4, t_neg=2, v=2)

    with pytest.raises(ValueError, match="smoothing"):
        text_ops.fit_classifier(
            docs, id_col="doc_id", text_col="text", label_col="lab", smoothing=0.0
        )


def test_fit_classifier_feeds_classifier_score(spark):
    """The train -> score loop closes: weights fitted on a labeled seed
    separate the classes when fed to classifier_score(weights_df=...),
    and Corpus.train_classifier returns the same table."""
    from timefence_spark import Corpus

    rows = [
        (1, "alpha alpha beta common", True),
        (2, "alpha common beta", True),
        (3, "zed zed common junk", False),
        (4, "junk zed common", False),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lab boolean")
    weights = text_ops.fit_classifier(
        docs, id_col="doc_id", text_col="text", label_col="lab"
    ).select("word", "weight")
    scores = {
        r["doc_id"]: r["clf_score"]
        for r in text_ops.classifier_score(
            docs, id_col="doc_id", text_col="text", weights_df=weights
        ).collect()
    }
    assert min(scores[1], scores[2]) > max(scores[3], scores[4])
    via_corpus = Corpus(docs).train_classifier(label_col="lab")
    assert sorted(via_corpus.columns) == ["n_neg", "n_pos", "weight", "word"]
    assert {
        (r["word"], r["weight"]) for r in via_corpus.collect()
    } == {
        (r["word"], r["weight"])
        for r in text_ops.fit_classifier(
            docs, id_col="doc_id", text_col="text", label_col="lab"
        ).collect()
    }


def test_bm25_known_answers(spark):
    """BM25 against a hand-computed mirror; unmatched and NULL-text docs
    emit no row; parameter validation."""
    import math

    rows = [
        (1, "apple apple pie"),
        (2, "banana split"),
        (3, "cherry tart"),
        (4, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in text_ops.bm25_score(
            docs, id_col="doc_id", text_col="text", query="apple banana"
        ).collect()
    }
    assert set(got) == {1, 2}

    n, avgdl, k1, b = 4, 7 / 4, 1.2, 0.75

    def bm25(tf, dl, df):
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        return round(
            idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl)), 6
        )

    assert got[1]["bm25"] == bm25(2, 3, 1)
    assert got[2]["bm25"] == bm25(1, 2, 1)
    assert got[1]["n_terms_matched"] == 1
    # A doc matching BOTH terms outscores single-term matches of like length.
    both = {
        r["doc_id"]: r
        for r in text_ops.bm25_score(
            docs.union(
                spark.createDataFrame(
                    [(5, "apple banana pie")], "doc_id long, text string"
                )
            ),
            id_col="doc_id", text_col="text", query="apple banana",
        ).collect()
    }
    assert both[5]["n_terms_matched"] == 2
    assert both[5]["bm25"] > max(both[1]["bm25"], both[2]["bm25"])

    with pytest.raises(ValueError, match="token"):
        text_ops.bm25_score(
            docs, id_col="doc_id", text_col="text", query="   "
        )
    with pytest.raises(ValueError, match="k1"):
        text_ops.bm25_score(
            docs, id_col="doc_id", text_col="text", query="apple", b=1.5
        )


def test_corpus_rank_bm25(spark):
    """Corpus.rank_bm25 returns the scored frame; semi-join back
    materializes the keyword subset."""
    from timefence_spark import Corpus

    rows = [(1, "spark joins tables"), (2, "pie recipe"), (3, "spark spark")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    c = Corpus(docs)
    ranked = c.rank_bm25("spark")
    ids = {r["doc_id"] for r in ranked.collect()}
    assert ids == {1, 3}
    subset = c.df.join(ranked.select("doc_id"), "doc_id", "left_semi")
    assert {r["doc_id"] for r in subset.collect()} == {1, 3}


def test_fluency_buckets(spark):
    """Tercile partition: thresholds split the scored docs ~evenly, the
    head holds the lowest NLLs, unscored (token-less) docs emit no row,
    and the approx path labels with the same vocabulary of buckets."""
    from timefence_spark import Corpus

    rows = [(i, "the common words " + ("the " * (i % 7))) for i in range(1, 13)]
    rows += [(13, "zyx qwv jkh unseen rare gibberish"), (14, None)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in text_ops.fluency_buckets(
            docs, id_col="doc_id", text_col="text"
        ).collect()
    }
    assert 14 not in out  # NULL text: no tokens, no row
    assert set(r["bucket"] for r in out.values()) == {"head", "middle", "tail"}
    assert out[13]["bucket"] == "tail"  # rare words = least fluent
    by_bucket = {}
    for r in out.values():
        by_bucket.setdefault(r["bucket"], []).append(r["mean_nll"])
    assert max(by_bucket["head"]) <= min(by_bucket["middle"])
    assert max(by_bucket["middle"]) <= min(by_bucket["tail"])
    # thresholds are percentiles: each bucket holds >= 1/4 of the docs here
    assert min(len(v) for v in by_bucket.values()) >= len(out) // 4

    approx = Corpus(docs).fluency_buckets(exact=False)
    assert {r["bucket"] for r in approx.collect()} <= {"head", "middle", "tail"}

    with pytest.raises(ValueError, match="bounds"):
        text_ops.fluency_buckets(
            docs, id_col="doc_id", text_col="text", bounds=(0.8, 0.2)
        )
    with pytest.raises(ValueError, match="model"):
        # trigram became a real model in round 12; 4-grams are not one
        text_ops.fluency_buckets(
            docs, id_col="doc_id", text_col="text", model="fourgram"
        )


def test_fluency_buckets_per_stratum(spark):
    """strata_col computes thresholds within each stratum: a stratum
    whose scores all exceed the other's still gets its own head/middle/
    tail split instead of sinking wholly into the global tail."""
    rows = [(i, "the common words " + ("the " * (i % 5)), "big") for i in range(1, 10)]
    rows += [
        (20, "rare gibberish zyx qwv", "small"),
        (21, "rare gibberish zyx jkh", "small"),
        (22, "rare gibberish qwv jkh unseen", "small"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {
        r["doc_id"]: r
        for r in text_ops.fluency_buckets(
            docs, id_col="doc_id", text_col="text", strata_col="lang"
        ).collect()
    }
    assert out[20]["lang"] == "small"
    small_buckets = {out[i]["bucket"] for i in (20, 21, 22)}
    assert "head" in small_buckets  # per-stratum: small lang has a head
    big_buckets = {out[i]["bucket"] for i in range(1, 10)}
    assert big_buckets == {"head", "middle", "tail"}
    # global thresholds, by contrast, drown the rare stratum in the tail
    glob = {
        r["doc_id"]: r["bucket"]
        for r in text_ops.fluency_buckets(
            docs, id_col="doc_id", text_col="text"
        ).collect()
    }
    assert {glob[i] for i in (20, 21, 22)} == {"tail"}


def test_fluency_buckets_null_stratum_kept(spark):
    """Documents with a NULL stratum form their own threshold group and
    stay in the labeled output (code-review r8 finding: the plain
    equi-join silently dropped them)."""
    rows = [(i, "the common words " + ("the " * (i % 5)), "en") for i in range(1, 8)]
    rows += [(20, "the common words", None), (21, "rare zyx qwv", None),
             (22, "the the the common", None)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {
        r["doc_id"]: r
        for r in text_ops.fluency_buckets(
            docs, id_col="doc_id", text_col="text", strata_col="lang"
        ).collect()
    }
    assert {20, 21, 22} <= set(out)
    assert out[20]["lang"] is None
    assert out[21]["bucket"] == "tail"  # rare words: least fluent of its group


def test_ngram_frequencies_full_grams_only_and_min_docs(spark):
    from timefence_spark.operators import text as t

    df = spark.createDataFrame(
        [
            (1, "cookie policy accepted here"),
            (2, "read our cookie policy accepted now"),
            (3, "cookie policy"),          # < n tokens: contributes nothing
            (4, None),                     # NULL text: contributes nothing
            (5, "  cookie   policy accepted  "),  # whitespace runs collapse
        ],
        "doc_id long, text string",
    )
    out = {
        r["ngram"]: (r["n_occurrences"], r["n_docs"])
        for r in t.ngram_frequencies(
            df, id_col="doc_id", text_col="text", n=3
        ).collect()
    }
    assert out["cookie policy accepted"] == (3, 3)
    assert "cookie policy" not in out  # no short tails
    mined = t.ngram_frequencies(
        df, id_col="doc_id", text_col="text", n=3, min_docs=3
    ).collect()
    assert [(r["ngram"], r["n_occurrences"], r["n_docs"]) for r in mined] == [
        ("cookie policy accepted", 3, 3)
    ]
    # n=1 degenerates to word_frequencies
    w = {
        (r["word"], r["n_occurrences"], r["n_docs"])
        for r in t.word_frequencies(
            df, id_col="doc_id", text_col="text"
        ).collect()
    }
    g = {
        (r["ngram"], r["n_occurrences"], r["n_docs"])
        for r in t.ngram_frequencies(
            df, id_col="doc_id", text_col="text", n=1
        ).collect()
    }
    assert w == g
    with pytest.raises(ValueError, match="n must be"):
        t.ngram_frequencies(df, id_col="doc_id", text_col="text", n=0)


def test_train_bpe_batched_rounds(spark):
    """VERDICT r9 item 3: merges_per_round=B amortizes the per-merge
    driver round-trip. On a corpus whose top pairs are mutually
    NON-interacting (disjoint symbol sets, 2-symbol words so merges
    create no new pairs) B>1 must produce exactly the B=1 merge list;
    overlapping pairs are deferred to the next round (still merged, in
    the same order sequential training would pick them here); and the
    batched run launches measurably fewer Spark jobs."""
    from timefence_spark.operators import bpe

    # six disjoint 2-letter words, strictly decreasing frequency
    words = [("ab", 9), ("cd", 8), ("ef", 7), ("gh", 6), ("ij", 5),
             ("kl", 4)]
    rows = [
        (i, " ".join(w for w, n in words for _ in range(n)))
        for i in range(1)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    seq = bpe.train_bpe_spark(
        df, text_col="text", n_merges=6, mode="distributed",
    )
    bat = bpe.train_bpe_spark(
        df, text_col="text", n_merges=6, mode="distributed",
        merges_per_round=3,
    )
    assert seq == bat == [tuple(w) for w, _ in words]
    assert bat == bpe.train_bpe(rows[0][1], 6)  # == the Python trainer

    # overlap deferral: (x,y) and (y,z) share y, so the batch accepts
    # (x,y) and the disjoint (c,d) in round 1 and (y,z) in round 2 —
    # the SAME merge set as sequential, with the overlapping pair
    # reordered after the round's disjoint accepts (the documented
    # batched-BPE approximation; only non-interacting tops are
    # order-identical).
    ov = spark.createDataFrame(
        [(1, " ".join(["xy"] * 9 + ["yz"] * 8 + ["cd"] * 3))],
        "doc_id long, text string",
    )
    seq_ov = bpe.train_bpe_spark(
        ov, text_col="text", n_merges=3, mode="distributed",
    )
    bat_ov = bpe.train_bpe_spark(
        ov, text_col="text", n_merges=3, mode="distributed",
        merges_per_round=3,
    )
    assert seq_ov == [("x", "y"), ("y", "z"), ("c", "d")]
    assert bat_ov == [("x", "y"), ("c", "d"), ("y", "z")]
    assert set(seq_ov) == set(bat_ov)

    # fewer driver round-trips: count Spark jobs around each run
    def n_jobs() -> int:
        # max jobId, not list size — the store evicts old jobs at
        # spark.ui.retainedJobs and size deltas can go negative.
        sc = spark.sparkContext
        store = sc._jsc.sc().statusStore()
        jl = store.jobsList(sc._jvm.java.util.ArrayList())
        return max(
            (jl.apply(i).jobId() for i in range(jl.size())), default=-1
        ) + 1

    j0 = n_jobs()
    bpe.train_bpe_spark(df, text_col="text", n_merges=6,
                        mode="distributed")
    j1 = n_jobs()
    bpe.train_bpe_spark(df, text_col="text", n_merges=6,
                        mode="distributed", merges_per_round=6)
    j2 = n_jobs()
    assert (j2 - j1) * 2 <= (j1 - j0), (j1 - j0, j2 - j1)

    with pytest.raises(ValueError, match="merges_per_round"):
        bpe.train_bpe_spark(df, text_col="text", merges_per_round=0)


def test_gram_duplication_rate(spark):
    """gram_duplication (round 10): occurrence-weighted fraction of a
    doc's n-grams shared with >= min_docs docs, hand-checked."""
    from timefence_spark.operators.text import gram_duplication

    rows = [
        (1, "a b c d"),      # grams: "a b","b c","c d"
        (2, "a b x y"),      # grams: "a b","b x","x y"
        (3, "z z"),          # gram: "z z" (unique)
        (4, "q"),            # < n tokens -> no row
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_grams"], r["dup_frac"]) for r in
           gram_duplication(df, id_col="doc_id", text_col="text", n=2).collect()}
    assert got[1] == (3, 0.333333)   # only "a b" shared with doc 2
    assert got[2] == (3, 0.333333)
    assert got[3] == (1, 0.0)
    assert 4 not in got

    import pytest as _pytest
    with _pytest.raises(ValueError, match="min_docs"):
        gram_duplication(df, id_col="doc_id", text_col="text", min_docs=1)


def test_corpus_stats_summary(spark):
    """corpus_stats (round 10): one-row health summary, hand-checked,
    NULL/empty docs counted and weighing zero tokens."""
    from timefence_spark.operators.text import corpus_stats

    rows = [
        (1, "a b c"),
        (2, "x y"),
        (3, None),
        (4, "   "),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    r = corpus_stats(df, id_col="doc_id", text_col="text").head()
    assert r["n_docs"] == 4 and r["n_empty"] == 2
    assert r["n_tokens"] == 5 and r["n_chars"] == 5 + 3 + 0 + 3
    assert r["mean_tokens"] == 1.25
    assert r["p50_tokens"] == 1.0 and r["p90_tokens"] == 2.7
    # sketch mode returns the same shape (values approximate)
    a = corpus_stats(df, id_col="doc_id", text_col="text", exact=False).head()
    assert a["n_tokens"] == 5 and a["p50_tokens"] is not None


def test_code_signals_calibration(spark):
    """code_signals (round 10): real code snippets tag is_code, prose
    (even punctuation-heavy) does not, NULL text yields NULL signals."""
    from timefence_spark.operators.text import code_signals

    rows = [
        (1, "def add(a, b):\n    return a + b\n\nprint(add(1, 2))"),
        (2, "The weather was lovely and the children walked along."),
        (3, None),
        (4, 'int main() {\n    printf("hi");\n    return 0;\n}'),
        (5, "He said (quietly); and then = nothing happened."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in code_signals(
        df, id_col="doc_id", text_col="text"
    ).collect()}
    assert got[1]["is_code"] is True and got[4]["is_code"] is True
    assert got[2]["is_code"] is False and got[5]["is_code"] is False
    assert got[3]["code_score"] is None and got[3]["is_code"] is None
    assert got[1]["kw_hits"] >= 3  # def, return, print via identifier split
    assert got[4]["indent_frac"] == 0.5
    # custom lexicon overrides the default
    custom = code_signals(
        df, id_col="doc_id", text_col="text",
        keywords=("weather", "children"), score_threshold=0.1,
    ).collect()
    assert {r["doc_id"]: r["kw_hits"] for r in custom}[2] == 2


def test_train_bpe_spark_byte_pretokenize(spark):
    """Byte-level pretokenization (VERDICT r11 item 4): both trainer
    paths (Spark-expression rendering in the type table; Python
    byte_render in the local trainer) must be merge-for-merge
    identical, merges must form over UTF-8 bytes for non-ASCII text,
    and the byte-mode encoder must round-trip every character through
    the learned vocab with zero OOV."""
    from timefence_spark.operators import bpe

    rows = [
        (1, "héllo héllo héllo wörld wörld"),
        (2, "héllo wörld naïve naïve café café café"),
        (3, "plain ascii words plain ascii words"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    text = " ".join(t for _, t in rows)
    ref = bpe.train_bpe(text, n_merges=25, pretokenize="byte")
    # auto (local path, Spark-side rendering feeds the collect) and the
    # forced distributed loop both match the Python byte trainer.
    assert bpe.train_bpe_spark(
        df, text_col="text", n_merges=25, pretokenize="byte"
    ) == ref
    assert bpe.train_bpe_spark(
        df, text_col="text", n_merges=25, pretokenize="byte",
        mode="distributed", checkpoint_every=5,
    ) == ref
    # byte semantics differ from char semantics on multi-byte text:
    # every trained symbol is built from byte-table chars, and 'é'
    # (U+00E9) appears only as its rendered bytes 'Ã©', never raw.
    assert ref != bpe.train_bpe(text, n_merges=25)
    assert all("é" not in l + r for l, r in ref)
    assert any("Ã©" in l + r for l, r in ref)

    # encoder parity: byte-mode ids decode back to the byte-rendered
    # document, and nothing is OOV (full byte coverage).
    vocab = bpe.bpe_vocab(
        df, text_col="text", merges=ref, pretokenize="byte"
    )
    enc = bpe.encode_documents(
        df, id_col="doc_id", text_col="text", merges=ref, vocab=vocab,
        pretokenize="byte",
    )
    got = {r["doc_id"]: list(r["token_ids"]) for r in enc.collect()}
    for doc_id, doc_text in rows:
        decoded = "".join(vocab[i] for i in got[doc_id])
        assert decoded == "".join(
            bpe.byte_render(w) for w in doc_text.split()
        )
    # counter agrees with the encoder's n_tokens
    counter = bpe.make_token_counter(ref, pretokenize="byte")
    for doc_id, doc_text in rows:
        assert counter(doc_text) == len(got[doc_id])

    with pytest.raises(ValueError, match="pretokenize"):
        bpe.train_bpe_spark(df, text_col="text", pretokenize="bytes")
    with pytest.raises(ValueError, match="pretokenize"):
        bpe.encode_documents(
            df, id_col="doc_id", text_col="text", pretokenize="Byte"
        )


def _rank_auc(scores: dict, is_pos) -> float:
    pairs = sorted(scores.items(), key=lambda kv: kv[1])
    ranks = {d: i + 1 for i, (d, _) in enumerate(pairs)}
    n_pos = sum(1 for d in scores if is_pos(d))
    n_neg = len(scores) - n_pos
    r_pos = sum(ranks[d] for d in scores if is_pos(d))
    return (r_pos - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)


def test_fit_classifier_hashed_beats_nb_on_correlated_features(spark):
    """Learned quality classifier (VERDICT r12 item 6): on a planted
    corpus with a perfectly CORRELATED token pair (one signal, two
    tokens — Naive Bayes double-counts it as independent evidence),
    the micro-quantized logistic-regression trainer must out-rank the
    NB baseline (AUC), retrain bit-identically, and produce the same
    model on the size-gated local path and the distributed loop."""
    import random

    from timefence_spark.operators import text as T

    rng = random.Random(11)
    noise = ["the", "a", "of", "and", "to", "in", "it", "is"]
    rows = []
    for i in range(400):
        pos = i % 2 == 0
        words = []
        if rng.random() < (0.40 if pos else 0.70):
            words += ["nile", "river"]  # correlated pair: one signal
        if rng.random() < (0.75 if pos else 0.35):
            words += ["quality"]
        if rng.random() < (0.65 if pos else 0.30):
            words += ["method"]
        while len(words) < 16:
            words.append(rng.choice(noise))
        rng.shuffle(words)
        rows.append((i, " ".join(words), pos))
    df = spark.createDataFrame(rows, "doc_id long, text string, label boolean")

    model = T.fit_classifier_hashed(
        df, id_col="doc_id", text_col="text", label_col="label",
        dims=64, iters=800, lr=1.0, normalize=False,
    )
    assert len(model["weights"]) == 64 and model["n_docs"] == 400
    scored = {
        r["doc_id"]: r["clf_score"]
        for r in T.hashed_classifier_score(
            df, id_col="doc_id", text_col="text",
            weights=model["weights"], bias=model["bias"],
            normalize=False,
        ).collect()
    }
    nb_weights = T.fit_classifier(
        df, id_col="doc_id", text_col="text", label_col="label"
    )
    nb = {
        r["doc_id"]: r["clf_score"]
        for r in T.classifier_score(
            df, id_col="doc_id", text_col="text", weights_df=nb_weights
        ).collect()
    }
    is_pos = lambda d: d % 2 == 0  # noqa: E731
    auc_lr = _rank_auc(scored, is_pos)
    auc_nb = _rank_auc(nb, is_pos)
    assert auc_lr > auc_nb, (auc_lr, auc_nb)
    assert auc_lr > 0.85

    # bit-identical retrain (quantized GD: exact integer sums, fixed
    # driver arithmetic)
    model2 = T.fit_classifier_hashed(
        df, id_col="doc_id", text_col="text", label_col="label",
        dims=64, iters=800, lr=1.0, normalize=False,
    )
    assert model2 == model

    # Corpus wiring round-trips the model dict
    from timefence_spark.corpus import Corpus

    c = Corpus(df)
    cm = c.train_quality_classifier(
        label_col="label", dims=64, iters=800, lr=1.0, normalize=False
    )
    assert cm == model
    cs = {
        r["doc_id"]: r["clf_score"]
        for r in c.score_quality_classifier(cm).collect()
    }
    assert cs == scored


def test_fit_classifier_hashed_paths_and_errors(spark):
    """Local (size-gated collect) and distributed (per-iteration
    decimal-sum jobs) trainers produce the same model; error paths:
    empty label set, over-threshold mode='local', bad hyperparams,
    unscored docs produce no score row."""
    from timefence_spark.operators import text as T

    rows = [
        (
            i,
            (
                "good text insight value "
                if i % 2 == 0
                else "spam click buy now "
            )
            + "the a of and",
            i % 2 == 0,
        )
        for i in range(60)
    ] + [(1000, None, True), (1001, "", False)]
    df = spark.createDataFrame(rows, "doc_id long, text string, label boolean")

    local = T.fit_classifier_hashed(
        df, id_col="doc_id", text_col="text", label_col="label",
        dims=16, iters=6, lr=1.0,
    )
    dist = T.fit_classifier_hashed(
        df, id_col="doc_id", text_col="text", label_col="label",
        dims=16, iters=6, lr=1.0, mode="distributed",
    )
    # gradients are exact integers on both paths; residuals can differ
    # only where libm exp differs at a micro-rounding boundary
    assert max(
        abs(a - b)
        for a, b in zip(
            local["weights"] + [local["bias"]],
            dist["weights"] + [dist["bias"]],
        )
    ) <= 2e-6
    # NULL/empty docs embed to no grams -> no score row
    scored = T.hashed_classifier_score(
        df, id_col="doc_id", text_col="text",
        weights=local["weights"], bias=local["bias"],
    )
    ids = {r["doc_id"] for r in scored.collect()}
    assert 1000 not in ids and 1001 not in ids and len(ids) == 60

    with pytest.raises(ValueError, match="trainable"):
        T.fit_classifier_hashed(
            df.where("doc_id < 0"), id_col="doc_id", text_col="text",
            label_col="label", dims=8,
        )
    with pytest.raises(ValueError, match="local_threshold"):
        T.fit_classifier_hashed(
            df, id_col="doc_id", text_col="text", label_col="label",
            dims=8, mode="local", local_threshold=10,
        )
    for bad in (
        {"dims": 1}, {"iters": 0}, {"lr": 0.0}, {"l2": -1.0},
        {"momentum": 1.0}, {"mode": "remote"},
    ):
        with pytest.raises(ValueError):
            T.fit_classifier_hashed(
                df, id_col="doc_id", text_col="text", label_col="label",
                **{"dims": 8, **bad},
            )
    with pytest.raises(ValueError, match="weights"):
        T.hashed_classifier_score(
            df, id_col="doc_id", text_col="text", weights=[0.1]
        )


def test_gpt2_split_matches_spark_regex(spark):
    """The Python gpt2_split scanner, Spark's regexp_extract_all over
    GPT2_SPLIT_REGEX (Java lookahead), and the DuckDB sentinel replay
    (__spark_entry__._oracle_train_bpe_gpt2_sql's construction) must
    segment identically — the three engines the gpt2 mode runs on."""
    import duckdb
    from pyspark.sql import functions as F

    from timefence_spark.operators import bpe

    texts = [
        "a  b", "a b", "it's", "a  's", "hello   world  ", "a \t b",
        "tab\t\tx", "num 123 x,y.z", " lead", "a\n\nb", "",
        "x4sep'll no", "don'T", "I'd've", "a 'quote'", "....",
        "a    b", "café 中文 123", "nbsp\xa0x", "mixed42id",
        "end space ", "  ", "\t", "a-b_c", "1,234.56!", "π≈3.14",
    ]
    scanner = [bpe.gpt2_split(t) for t in texts]
    # pieces always concatenate back to the input (GPT-2 property)
    for t, ps in zip(texts, scanner):
        assert "".join(ps) == t

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, text string"
    )
    got = {
        r["i"]: list(r["p"])
        for r in df.select(
            "i",
            F.regexp_extract_all(
                "text", F.lit(bpe.GPT2_SPLIT_REGEX), 0
            ).alias("p"),
        ).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == scanner[i], (t, got[i], scanner[i])

    # DuckDB sentinel construction (RE2 has no lookahead)
    con = duckdb.connect()
    pat = (
        r"'s|'t|'re|'ve|'m|'ll|'d"
        r"|\x01? ?\p{L}+|\x01? ?\p{N}+|\x01? ?[^\s\x01\p{L}\p{N}]+"
        r"|\x01?\s+"
    )
    for i, t in enumerate(texts):
        duck = con.execute(
            "SELECT list_transform(regexp_extract_all("
            "regexp_replace(?, '(\\s)(\\S)', chr(1) || '\\1\\2', 'g'),"
            " ?), p -> replace(p, chr(1), ''))",
            [t, pat],
        ).fetchone()[0]
        assert duck == scanner[i], (t, duck, scanner[i])


def test_train_bpe_spark_gpt2_pretokenize(spark):
    """GPT-2 pretokenization (VERDICT r12 item 4): Spark and Python
    trainers are merge-for-merge identical, merges form over
    byte-rendered regex pieces (leading space -> Ġ), and the encoder's
    id stream decodes back to the EXACT original text — whitespace
    included — which no whitespace-boundary mode can do."""
    from timefence_spark.operators import bpe

    rows = [
        (1, "the planner reads the table scan and prunes it"),
        (2, "the scan isn't slow, it's 42 times faster\tthan that"),
        (3, "héllo wörld  héllo wörld naïve café"),
        (4, None),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    text = " ".join(t for _, t in rows if t)
    one = spark.createDataFrame([(0, text)], "doc_id long, text string")
    ref = bpe.train_bpe(text, n_merges=30, pretokenize="gpt2")
    assert bpe.train_bpe_spark(
        one, text_col="text", n_merges=30, pretokenize="gpt2"
    ) == ref
    assert bpe.train_bpe_spark(
        one, text_col="text", n_merges=30, pretokenize="gpt2",
        mode="distributed", checkpoint_every=5,
    ) == ref
    # Ġ (byte-rendered space) participates in merges — the convention
    # the whitespace/byte modes never produce.
    assert any("Ġ" in l + r for l, r in ref)

    vocab = bpe.bpe_vocab(
        df, text_col="text", merges=ref, pretokenize="gpt2"
    )
    # GPT-2 convention: all 256 byte symbols + merge products, no scan
    assert len(vocab) == len(set(bpe.byte_unicode_table())
                             | {a + b for a, b in ref})
    enc = bpe.encode_documents(
        df, id_col="doc_id", text_col="text", merges=ref, vocab=vocab,
        pretokenize="gpt2",
    )
    got = {r["doc_id"]: list(r["token_ids"]) for r in enc.collect()}
    table = bpe.byte_unicode_table()
    unrender = {c: b for b, c in enumerate(table)}
    for doc_id, doc_text in rows:
        if doc_text is None:
            continue
        decoded = bytes(
            unrender[c] for c in "".join(vocab[i] for i in got[doc_id])
        ).decode("utf-8")
        assert decoded == doc_text, doc_id
    counter = bpe.make_token_counter(ref, pretokenize="gpt2")
    for doc_id, doc_text in rows:
        if doc_text is not None:
            assert counter(doc_text) == len(got[doc_id])


def test_byte_unicode_table_shape():
    """The 256-char table is a bijection, printable bytes map to
    themselves, and byte_render is injective on distinct words."""
    from timefence_spark.operators.bpe import byte_render, byte_unicode_table

    L = byte_unicode_table()
    assert len(L) == 256 and len(set(L)) == 256
    for b in list(range(33, 127)) + list(range(161, 173)) + list(
        range(174, 256)
    ):
        assert L[b] == chr(b)
    assert L[32] != " " and L[0] != "\x00"  # controls remapped
    assert byte_render("héllo") == "hÃ©llo"  # the GPT-2 rendering
    words = ["a", "b", "ab", "é", "\x00", " x", "Ā"]
    assert len({byte_render(w) for w in words}) == len(words)


def test_trigram_logprob_known_answers(spark):
    """Hand-computed interpolated Kneser-Ney trigram NLL (VERDICT r11
    item 6) on a tiny corpus: trigram discount with continuation-count
    bigram backoff and add-1 continuation unigram; docs with < 3 tokens
    produce no row; a Python KN replica checks every transition."""
    import math

    rows = [
        (1, "a b c a b c"),
        (2, "a b d"),
        (3, "b c"),  # two tokens: no trigram row
        (4, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in text_ops.trigram_logprob(
            docs, id_col="doc_id", text_col="text", discount=0.75
        ).collect()
    }
    assert set(out) == {1, 2}
    assert out[1]["n_trigrams"] == 4 and out[2]["n_trigrams"] == 1
    assert out[1]["oov_frac"] == 0.0

    # Python KN replica over the same corpus statistics
    from collections import Counter

    D, k = 0.75, 1.0
    toks = {i: (t or "").split() for i, t in rows}
    tris = Counter(
        (w[j - 2], w[j - 1], w[j])
        for w in toks.values() for j in range(2, len(w))
    )
    bis = Counter(
        (w[j - 1], w[j]) for w in toks.values() for j in range(1, len(w))
    )
    ctx3 = Counter()
    t_ctx3 = Counter()
    for (u, v, w), c in tris.items():
        ctx3[(u, v)] += c
        t_ctx3[(u, v)] += 1
    cbi = Counter((v, w) for (u, v, w) in tris)
    cctx = Counter()
    t_cctx = Counter()
    for (v, w), c in cbi.items():
        cctx[v] += c
        t_cctx[v] += 1
    cuni = Counter(w for (u, w) in bis)
    B, V = sum(cuni.values()), len(cuni)
    denom1 = B + k * (V + 1)

    def p1(w):
        return (cuni.get(w, 0) + k) / denom1

    def p2(v, w):
        if cctx.get(v):
            return (
                max(cbi.get((v, w), 0) - D, 0.0)
                + D * t_cctx[v] * p1(w)
            ) / cctx[v]
        return p1(w)

    def p3(u, v, w):
        if ctx3.get((u, v)):
            return (
                max(tris.get((u, v, w), 0) - D, 0.0)
                + D * t_ctx3[(u, v)] * p2(v, w)
            ) / ctx3[(u, v)]
        return p2(v, w)

    for doc_id in (1, 2):
        w = toks[doc_id]
        nll = [
            -math.log(p3(w[j - 2], w[j - 1], w[j]))
            for j in range(2, len(w))
        ]
        assert out[doc_id]["mean_nll"] == pytest.approx(
            sum(nll) / len(nll), abs=1e-6
        ), doc_id

    # deterministic mode gives the identical rounded scores
    det = {
        r["doc_id"]: r["mean_nll"]
        for r in text_ops.trigram_logprob(
            docs, id_col="doc_id", text_col="text", deterministic=True
        ).collect()
    }
    assert det == {i: out[i]["mean_nll"] for i in out}

    # external LM that never saw (b, c, a): transition is OOV but still
    # scored via the KN backoff chain. lm and lm_bigram come from the
    # same (tiny) corpus, as the contract requires.
    lm = spark.createDataFrame(
        [("a", "b", "c", 2), ("a", "b", "d", 1)],
        "w1 string, w2 string, word string, n_occurrences long",
    )
    lm_bi = spark.createDataFrame(
        [("a", "b", 3), ("b", "c", 2), ("b", "d", 1)],
        "w_prev string, word string, n_occurrences long",
    )
    ext = {
        r["doc_id"]: r
        for r in text_ops.trigram_logprob(
            docs, id_col="doc_id", text_col="text", lm=lm, lm_bigram=lm_bi
        ).collect()
    }
    assert 0.0 < ext[1]["oov_frac"] < 1.0
    assert ext[1]["mean_nll"] > 0.0

    # exactly one of lm / lm_bigram mixes two models' statistics
    with pytest.raises(ValueError, match="BOTH"):
        text_ops.trigram_logprob(
            docs, id_col="doc_id", text_col="text", lm=lm
        )
    with pytest.raises(ValueError, match="BOTH"):
        text_ops.trigram_logprob(
            docs, id_col="doc_id", text_col="text", lm_bigram=lm_bi
        )

    with pytest.raises(ValueError, match="discount"):
        text_ops.trigram_logprob(
            docs, id_col="doc_id", text_col="text", discount=1.5
        )


def test_ngram_logprob_kenlm_grade(spark):
    """Order-n interpolated Kneser-Ney (VERDICT r12 item 5): n=3 is
    bit-identical to trigram_logprob, n=4/5 match a Python KN replica
    (with and without the KenLM-style min_count pruning floor), the
    partial-ladder and bad-n error paths raise, an external full
    ladder scores, and fluency_buckets accepts model='5gram'."""
    import math
    from collections import Counter, defaultdict

    rows = [
        (1, "the cat sat on the mat and the cat sat again on the mat"),
        (2, "the dog ran over the hill and the dog ran back home"),
        (3, "a b"),
        (4, "the cat ran on the hill and sat on the mat again today"),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    tri = {
        r["doc_id"]: (r["n_trigrams"], r["oov_frac"], r["mean_nll"])
        for r in text_ops.trigram_logprob(
            df, id_col="doc_id", text_col="text"
        ).collect()
    }
    ng3 = {
        r["doc_id"]: (r["n_ngrams"], r["oov_frac"], r["mean_nll"])
        for r in text_ops.ngram_logprob(
            df, id_col="doc_id", text_col="text", n=3
        ).collect()
    }
    assert ng3 == tri

    def toks(t):
        return [w for w in (t or "").lower().split() if w]

    def grams(ws, k):
        return [tuple(ws[i:i + k]) for i in range(len(ws) - k + 1)]

    corpus = [toks(t) for _, t in rows if t]

    def replica(N, min_count):
        tabs = {
            k: Counter(g for ws in corpus for g in grams(ws, k))
            for k in range(2, N + 1)
        }
        for k in range(3, N + 1):
            if min_count > 1:
                tabs[k] = Counter(
                    {g: v for g, v in tabs[k].items() if v >= min_count}
                )
        D = 0.75
        cont, cctx = {}, {}
        for k in range(N - 1, 1, -1):
            c = Counter()
            for g in tabs[k + 1]:
                c[g[1:]] += 1
            cont[k] = c
            cc = defaultdict(lambda: [0, 0])
            for g, v in c.items():
                cc[g[:-1]][0] += v
                cc[g[:-1]][1] += 1
            cctx[k] = cc
        cuni = Counter()
        for g in tabs[2]:
            cuni[g[1]] += 1
        B, V = sum(cuni.values()), len(cuni)
        ctx_top = defaultdict(lambda: [0, 0])
        for g, v in tabs[N].items():
            ctx_top[g[:-1]][0] += v
            ctx_top[g[:-1]][1] += 1

        def p_kn(g):
            p = (cuni.get(g[-1], 0) + 1.0) / (B + 1.0 * (V + 1))
            for k in range(2, N):
                suf = g[len(g) - k:]
                cc = cctx[k].get(suf[:-1])
                if cc:
                    p = (
                        max(cont[k].get(suf, 0) - D, 0) + D * cc[1] * p
                    ) / cc[0]
            ct = ctx_top.get(g[:-1])
            if ct:
                p = (max(tabs[N].get(g, 0) - D, 0) + D * ct[1] * p) / ct[0]
            return p

        return tabs, p_kn

    for N in (4, 5):
        for mc in (1, 2):
            tabs, p_kn = replica(N, mc)
            got = {
                r["doc_id"]: r
                for r in text_ops.ngram_logprob(
                    df, id_col="doc_id", text_col="text", n=N,
                    min_count=mc, deterministic=(mc == 2),
                ).collect()
            }
            for doc_id, t in rows:
                ws = toks(t)
                gs = grams(ws, N)
                if not gs:
                    assert doc_id not in got
                    continue
                nll = sum(-math.log(p_kn(g)) for g in gs) / len(gs)
                oov = sum(1 for g in gs if g not in tabs[N]) / len(gs)
                r = got[doc_id]
                assert r["n_ngrams"] == len(gs), (N, mc, doc_id)
                assert r["mean_nll"] == pytest.approx(
                    round(nll, 6), abs=2e-6
                ), (N, mc, doc_id)
                assert r["oov_frac"] == pytest.approx(
                    round(oov, 6), abs=2e-6
                ), (N, mc, doc_id)

    # external FULL ladder (corpus's own tables fed back in) == internal
    lms = [
        text_ops.ngram_lm_frequencies(
            df, id_col="doc_id", text_col="text", n=k
        )
        for k in range(4, 1, -1)
    ]
    ext = {
        r["doc_id"]: r["mean_nll"]
        for r in text_ops.ngram_logprob(
            df, id_col="doc_id", text_col="text", n=4, lms=lms
        ).collect()
    }
    base = {
        r["doc_id"]: r["mean_nll"]
        for r in text_ops.ngram_logprob(
            df, id_col="doc_id", text_col="text", n=4
        ).collect()
    }
    assert ext == base

    with pytest.raises(ValueError, match="full ladder"):
        text_ops.ngram_logprob(
            df, id_col="doc_id", text_col="text", n=4, lms=lms[:1]
        )
    with pytest.raises(ValueError, match="n must be >= 3"):
        text_ops.ngram_logprob(df, id_col="doc_id", text_col="text", n=2)
    with pytest.raises(ValueError, match="min_count"):
        text_ops.ngram_logprob(
            df, id_col="doc_id", text_col="text", n=4, min_count=0
        )

    fb = {
        r["doc_id"]: r["bucket"]
        for r in text_ops.fluency_buckets(
            df, id_col="doc_id", text_col="text", model="5gram"
        ).collect()
    }
    assert set(fb) == {1, 2, 4} and set(fb.values()) <= {
        "head", "middle", "tail"
    }
    with pytest.raises(ValueError, match="lms"):
        text_ops.fluency_buckets(
            df, id_col="doc_id", text_col="text", model="5gram", lm=lms[0]
        )


def test_fluency_buckets_trigram_model(spark):
    """fluency_buckets(model='trigram') labels head/middle/tail by KN
    trigram NLL; unscored (< 3 token) docs produce no row."""
    rows = [(i, "the cat sat on the mat again " * (1 + i % 3))
            for i in range(9)] + [(99, "too short")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = text_ops.fluency_buckets(
        docs, id_col="doc_id", text_col="text", model="trigram"
    ).collect()
    ids = {r["doc_id"] for r in out}
    assert 99 not in ids and len(ids) == 9
    assert {r["bucket"] for r in out} <= {"head", "middle", "tail"}
    with pytest.raises(ValueError, match="model"):
        text_ops.fluency_buckets(
            docs, id_col="doc_id", text_col="text", model="fourgram"
        )


def test_hash_embed_properties(spark):
    """hash_embed (round 12): identical text -> identical unit vector;
    near-identical docs are cosine-close while disjoint-vocabulary docs
    are not; zero-gram docs emit no row; md5 and xxhash64 modes share
    every structural property."""
    import math

    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over a sleepy dog"),
            (3, "zq xv plorb gnarf wibble"),
            (4, ""),
            (5, None),
        ],
        "doc_id long, text string",
    )
    for fn in ("xxhash64", "md5"):
        out = {
            r["doc_id"]: list(r["embedding"])
            for r in text_ops.hash_embed(
                docs, id_col="doc_id", text_col="text", dims=32,
                hash_fn=fn,
            ).collect()
        }
        assert set(out) == {0, 1, 2, 3}
        assert out[0] == out[1]
        assert all(len(v) == 32 for v in out.values())
        norms = {
            k: math.sqrt(sum(x * x for x in v)) for k, v in out.items()
        }
        assert all(abs(n - 1.0) < 1e-4 for n in norms.values())

        def cos(a, b):
            return sum(x * y for x, y in zip(a, b))

        assert cos(out[0], out[2]) > 0.6          # 8/9 shared words
        assert cos(out[0], out[3]) < cos(out[0], out[2])

    with pytest.raises(ValueError, match="dims"):
        text_ops.hash_embed(docs, id_col="doc_id", text_col="text", dims=1)
    with pytest.raises(ValueError, match="ngram"):
        text_ops.hash_embed(
            docs, id_col="doc_id", text_col="text", ngram=0
        )


def test_hash_embed_closes_semantic_dedup_loop(spark):
    """The in-engine text -> embedding -> semantic-dedup composition:
    Corpus.embed feeds dedup_semantic, and near-duplicate documents
    (one word changed) collapse while distinct content survives —
    no external model anywhere."""
    from timefence_spark.corpus import Corpus

    base = "the planner pushes the filter below the join and prunes row groups"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base.replace("prunes", "skips")),       # near-dup of 1
            (3, "completely different musings about cooking pasta al dente"),
        ],
        "doc_id long, text string",
    )
    c = Corpus(docs)
    emb = c.embed(dims=64)
    survived = c.dedup_semantic(emb, n_clusters=1, threshold=0.8)
    ids = {r["doc_id"] for r in survived.df.select("doc_id").collect()}
    assert ids == {1, 3}, ids
