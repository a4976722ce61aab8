"""Corpus fluent API: each stage must equal the manual operator
composition, and the chain must stay one lazy plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from timefence_spark import Corpus
from timefence_spark.operators import dedup, sampling, text


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _ids(df_or_corpus):
    df = getattr(df_or_corpus, "df", df_or_corpus)
    return {r["doc_id"] for r in df.select("doc_id").collect()}


def test_corpus_requires_columns(spark, docs):
    with pytest.raises(ValueError):
        Corpus(docs.select("doc_id"), id_col="doc_id", text_col="text")


def test_dedup_exact_matches_operator(spark, docs):
    got = _ids(Corpus(docs).dedup_exact())
    want = {
        r["doc_id"]
        for r in dedup.exact_dedup(
            docs, id_col="doc_id", content_cols=["text"]
        ).collect()
    }
    assert got == want


def test_filter_stages_match_operators(spark, docs):
    c = Corpus(docs).filter_gopher(min_words=10)
    want = {
        r["doc_id"]
        for r in text.gopher_quality(
            docs, id_col="doc_id", text_col="text", min_words=10
        )
        .where(F.col("gopher_pass"))
        .collect()
    }
    assert _ids(c) == want
    # filtered corpus keeps the full schema
    assert c.df.columns == docs.columns

    langs = _ids(Corpus(docs).filter_languages(["en"]))
    want_lang = {
        r["doc_id"]
        for r in text.lang_id(docs, id_col="doc_id", text_col="text")
        .where(F.col("lang_pred") == "en")
        .collect()
    }
    assert langs == want_lang
    assert len(langs) > 0


def test_chain_composes_and_stays_lazy(spark, docs):
    bench = docs.where(F.col("doc_id") % 50 == 0)
    corpus = docs.where(F.col("doc_id") % 50 != 0)
    chain = (
        Corpus(corpus)
        .dedup_exact()
        .filter_gopher(min_words=10)
        .decontaminate(bench, n=7)
        .split({"train": 0.8, "val": 0.1, "test": 0.1}, salt="sp", hash_fn="md5")
    )
    out = chain.df.where(F.col("split") == "train")
    # must equal the manual operator composition (same stages, same salts)
    survivors = corpus.join(
        dedup.exact_dedup(corpus, id_col="doc_id", content_cols=["text"])
        .select("doc_id"),
        "doc_id", "left_semi",
    )
    q_ok = (
        text.gopher_quality(survivors, id_col="doc_id", text_col="text", min_words=10)
        .where(F.col("gopher_pass")).select("doc_id")
    )
    d_ok = (
        dedup.decontaminate(survivors, bench, id_col="doc_id", text_col="text", n=7)
        .where(~F.col("contaminated")).select("doc_id")
    )
    manual = sampling.split_by_hash(
        survivors.join(q_ok, "doc_id", "left_semi")
        .join(d_ok, "doc_id", "left_semi"),
        id_col="doc_id",
        weights={"train": 0.8, "val": 0.1, "test": 0.1},
        salt="sp", hash_fn="md5",
    ).where(F.col("split") == "train")
    assert _ids(out) == _ids(manual)


def test_redact_and_sample_and_pack(spark):
    rows = [
        (i, f"doc {i} mail user{i}@x.example.com words words words", 40 + i)
        for i in range(20)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, n_tok long")
    c = Corpus(docs).redact_pii()
    assert c.df.columns == docs.columns
    assert c.df.where(F.col("text").contains("@")).count() == 0
    sampled = Corpus(docs).sample(0.5, salt="s")
    assert 0 < sampled.df.count() < 20
    packed = Corpus(docs).pack(token_col="n_tok", budget=100, num_shards=2)
    assert {"shard", "chunk", "chunk_offset", "oversized"} <= set(packed.columns)
    assert packed.count() == 20


def test_dedup_near_keep_best(spark):
    good = "the cat sat on the mat and the dog sat on the log nearby today"
    rows = [
        (1, good + " 999 999 999 999 999 999 999 999"),
        (2, good + " again"),
        (3, "entirely different content about query planning and shuffles"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    best = _ids(
        Corpus(docs).dedup_near(keep="best", num_perm=32, bands=16, threshold=0.5)
    )
    min_id = _ids(
        Corpus(docs).dedup_near(keep="min_id", num_perm=32, bands=16, threshold=0.5)
    )
    assert best == {2, 3}
    assert min_id == {1, 3}
    with pytest.raises(ValueError):
        Corpus(docs).dedup_near(keep="nope")


def test_corpus_report(spark, docs):
    rep = Corpus(docs).report()
    n = docs.count()
    assert rep["n_docs"] == n
    assert 0 < rep["n_distinct_texts"] <= n
    assert rep["exact_dup_pct"] == pytest.approx(
        100.0 * (n - rep["n_distinct_texts"]) / n, abs=0.01
    )
    assert rep["avg_chars"] > 0 and rep["median_chars"] > 0
    assert 0.0 <= rep["avg_quality"] <= 1.0
    assert rep["pii_doc_pct"] == 0.0          # synthetic corpus has no PII
    assert sum(rep["languages"].values()) == n


def test_corpus_normalize_dedup_lines_filter_pii(spark):
    rows = [
        (1, "Hello  World\nshared content line here\nkeep me", "a"),
        (2, "shared content line here\nother  text", "b"),
        (3, "mail me: bob@x.example.org", "c"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, src string")
    norm = Corpus(docs).normalize(lowercase=True)
    assert norm.df.where(F.col("doc_id") == 1).head()["text"] == (
        "hello world shared content line here keep me"
    )
    ld = Corpus(docs).dedup_lines(min_len=12)
    t2 = ld.df.where(F.col("doc_id") == 2).head()
    assert "shared content line here" not in t2["text"]
    assert t2["src"] == "b"  # payload columns preserved
    kept = Corpus(docs).filter_pii()
    assert {r["doc_id"] for r in kept.df.collect()} == {1, 2}


def test_token_count_exact_injection(spark):
    from timefence_spark.operators import text as t_ops

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, ""), (3, None)], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r["n_tokens"]
        for r in t_ops.token_count_exact(
            docs, id_col="doc_id", text_col="text",
            tokenizer_fn=lambda s: len(s.split()),
        ).collect()
    }
    assert out == {1: 3, 2: 0, 3: 0}


def test_report_and_filters_handle_null_text(spark):
    docs = spark.createDataFrame(
        [(1, "real content here with some words"), (2, None), (3, None)],
        "doc_id long, text string",
    )
    rep = Corpus(docs).report()
    assert rep["n_docs"] == 3
    # the two NULL texts are ONE duplicate group, not phantom dups of doc 1
    assert rep["n_distinct_texts"] == 2
    assert rep["exact_dup_pct"] == pytest.approx(33.33, abs=0.01)
    assert rep["pii_doc_pct"] == 0.0
    # NULL-text docs carry zero PII -> kept
    assert _ids(Corpus(docs).filter_pii()) == {1, 2, 3}
    # all-NULL corpus must not crash
    only_null = spark.createDataFrame([(1, None), (2, None)], "doc_id long, text string")
    rep2 = Corpus(only_null).report()
    assert rep2["n_distinct_texts"] == 1 and rep2["avg_chars"] == 0.0


def test_line_dedup_literal_separator(spark):
    from timefence_spark.operators import text as t_ops

    df = spark.createDataFrame([(1, "abc.def.abc"), (2, "def.xyz")], "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in t_ops.line_dedup(
            df, id_col="doc_id", text_col="text", sep=".", min_len=0
        ).collect()
    }
    # '.' must split into 3 literal segments, not on every character
    assert out[1]["n_lines"] == 3
    assert out[1]["text"] == "abc.def"          # second 'abc' deduped in-doc
    assert out[2]["text"] == "xyz"              # 'def' seen in doc 1 first


def test_dedup_lines_document_scope_and_fluency_filter(spark):
    from timefence_spark.operators import text as t_ops

    rows = [
        (1, "repeated boilerplate line\nbody one\nrepeated boilerplate line"),
        (2, "repeated boilerplate line\nbody two"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # document scope: in-doc repeat removed, doc 2 keeps its own copy
    out = {
        r["doc_id"]: r["text"]
        for r in t_ops.line_dedup(
            docs, id_col="doc_id", text_col="text", scope="document"
        ).collect()
    }
    assert out[1] == "repeated boilerplate line\nbody one"
    assert out[2] == "repeated boilerplate line\nbody two"
    with pytest.raises(ValueError):
        t_ops.line_dedup(docs, id_col="doc_id", text_col="text", scope="global")
    # facade passes scope through
    c = Corpus(docs).dedup_lines(min_len=0, scope="document")
    assert c.df.where(F.col("doc_id") == 2).head()["text"] == out[2]

    fluent = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "zzzq qqzx wvvw qpqp")],
        "doc_id long, text string",
    )
    # under the corpus's own add-1 LM: doc 1 mean NLL ~2.17 (two 'the'
    # occurrences), doc 2 ~2.30 (all hapaxes) — 2.2 separates them
    kept = Corpus(fluent).filter_fluency(max_nll=2.2)
    assert _ids(kept) == {1}


def test_report_is_one_action(spark, docs):
    """report() chains quality/PII/lang/hash into one projection and one
    aggregate (VERDICT r5 item 7: the old shape paid four separate
    scans). Two pins: the aggregated frame's physical plan reads the
    corpus EXACTLY once, and the whole report is one action — at most 3
    jobs, because AQE materializes the exact-distinct aggregate's two
    shuffle stages as separate jobs; the old multi-action shape cost 5+
    jobs and four scans."""
    from timefence_spark.plans import physical_summary

    combined, _ = Corpus(docs)._report_frame()
    assert len(physical_summary(combined).scans) == 1

    def n_jobs() -> int:
        sc = spark.sparkContext
        store = sc._jsc.sc().statusStore()
        return store.jobsList(sc._jvm.java.util.ArrayList()).size()

    Corpus(docs).report()  # warm: plan/codegen jobs out of the way
    before = n_jobs()
    Corpus(docs).report()
    assert n_jobs() - before <= 3


def test_with_token_counts_feeds_pack(spark):
    """Facade chain corpus -> exact BPE token counts -> next-fit packing:
    counts match the vendored tokenizer, schema is preserved + n_tokens,
    and the packed output respects the budget."""
    from timefence_spark.operators import bpe

    rows = [(i, "the customer orders table joins the lineitem table") for i in range(6)]
    rows.append((6, None))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    c = Corpus(docs).with_token_counts()
    got = {r["doc_id"]: r["n_tokens"] for r in c.df.collect()}
    assert got[0] == bpe.token_count(rows[0][1])
    assert got[6] == 0
    assert c.df.columns == ["doc_id", "text", "n_tokens"]
    packed = c.pack(token_col="n_tokens", budget=got[0] * 2, num_shards=1)
    per_chunk = (
        packed.groupBy("chunk").sum("n_tokens").collect()
    )
    assert all(r["sum(n_tokens)"] <= got[0] * 2 for r in per_chunk)


def test_dedup_semantic_drops_planted_copies(spark, sf_dir):
    """Corpus.dedup_semantic over a (id, vector) side table: the planted
    identical-embedding doc (larger id) is dropped, docs without an
    embedding row are kept (no vector, no redundancy evidence)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    copies = emb.where(F.col("doc_id") < 3).select(
        (F.col("doc_id") + 70000).alias("doc_id"), "embedding"
    )
    vectors = emb.unionByName(copies)
    docs = vectors.select("doc_id").unionByName(
        spark.createDataFrame([(99999,)], "doc_id long")  # no embedding row
    ).withColumn("text", F.concat(F.lit("doc "), F.col("doc_id")))
    kept = {
        r["doc_id"]
        for r in Corpus(docs)
        .dedup_semantic(vectors, n_clusters=8, threshold=0.999)
        .df.collect()
    }
    assert all(i in kept for i in range(3))          # originals survive
    assert not any(i + 70000 in kept for i in range(3))  # copies dropped
    assert 99999 in kept                              # unscored doc kept


def test_dedup_semantic_ignores_stale_side_table_rows(spark):
    """ADVICE r7: a document must not be dropped because its only
    near-duplicate exists solely in the embeddings side table (already
    removed by an earlier pipeline stage) — that would leave no surviving
    copy of the content. The embeddings are semi-joined to live ids."""
    vectors = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, [0.0, 1.0])],
        "doc_id long, embedding array<double>",
    )
    # doc 1 was removed earlier; only 2 and 3 are live
    docs = spark.createDataFrame(
        [(2, "two"), (3, "three")], "doc_id long, text string"
    )
    kept = {
        r["doc_id"]
        for r in Corpus(docs)
        .dedup_semantic(vectors, n_clusters=1, threshold=0.99)
        .df.collect()
    }
    assert kept == {2, 3}  # 2 survives: its dup (1) is not in the corpus


def test_decontaminate_semantic_drops_planted_contamination(spark):
    """A corpus doc whose embedding matches a benchmark item is dropped;
    unrelated docs and docs without embeddings survive."""
    corpus_emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (9, [1.0, 0.0])],
        "doc_id long, embedding array<double>",
    )
    bench_emb = spark.createDataFrame(
        [(100, [1.0, 0.0])], "doc_id long, embedding array<double>"
    )
    docs = spark.createDataFrame(
        [(1, "contaminated"), (2, "clean"), (3, "no embedding")],
        "doc_id long, text string",
    )
    kept = {
        r["doc_id"]
        for r in Corpus(docs)
        .decontaminate_semantic(
            corpus_emb, bench_emb, n_clusters=1, threshold=0.99
        )
        .df.collect()
    }
    # doc 9 exists only in the stale side table; it must not affect docs
    assert kept == {2, 3}


def test_corpus_write_jsonl_round_trip(spark, tmp_path):
    """Corpus.write('jsonl') round-trips through read_jsonl with a
    pinned schema; shuffle_salt writes the epoch order into the files;
    partition_by lays out hive dirs; bad format rejects."""
    import pytest

    from timefence_spark import Corpus
    from timefence_spark.operators import sampling
    from timefence_spark.sources.readers import read_jsonl

    rows = [(i, f"doc {i} text", "en" if i % 2 else "de") for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    c = Corpus(docs)

    out = str(tmp_path / "corpus_jsonl")
    c.write(out, format="jsonl", shuffle_salt="e0")
    back = read_jsonl(
        spark, out, schema="doc_id long, text string, lang string",
        text_col="text",
    )
    assert {(r.doc_id, r.text, r.lang) for r in back.collect()} == set(rows)
    # epoch order survives: part files sorted by name replay the shuffle
    import glob
    import json

    ordered = []
    for f in sorted(glob.glob(out + "/part-*")):
        with open(f) as fh:
            ordered += [json.loads(line)["doc_id"] for line in fh]
    expect = [
        r.doc_id
        for r in sampling.deterministic_shuffle(
            docs, id_col="doc_id", salt="e0"
        ).collect()
    ]
    assert ordered == expect

    pq = str(tmp_path / "corpus_pq")
    c.split({"train": 0.8, "val": 0.2}).write(pq, partition_by="split")
    assert spark.read.parquet(pq).where("split = 'train'").count() > 0

    with pytest.raises(ValueError, match="format"):
        c.write(str(tmp_path / "x"), format="csvish")


def test_corpus_to_sequences_end_to_end(spark):
    """Round-9 terminal: train a corpus-fitted BPE, tokenize, and pack
    into fixed-length training rows — the full corpus -> trainer-input
    loop through the facade."""
    from timefence_spark import Corpus
    from timefence_spark.operators import bpe

    rows = [(i, "the scan reads the table " * (i % 3 + 1)) for i in range(20)]
    c = Corpus(spark.createDataFrame(rows, "doc_id long, text string"))
    merges = c.train_bpe(n_merges=15)
    assert merges == bpe.train_bpe(
        " ".join(t for _, t in rows), n_merges=15
    )
    seqs = c.to_sequences(
        seq_len=16, merges=merges, num_shards=2, hash_fn="md5", pad_id=0
    ).collect()
    assert seqs
    total = sum(r["n_tokens"] for r in seqs)
    expect_total = sum(
        len(bpe.encode(w, {p: i for i, p in enumerate(merges)}))
        for _, t in rows for w in t.split()
    )
    assert total == expect_total  # pad mode loses no tokens
    assert all(len(r["input_ids"]) == 16 for r in seqs)


def test_dedup_urls_keeps_min_id_and_null_urls(spark, docs):
    from pyspark.sql import functions as F

    with_urls = docs.withColumn(
        "url",
        F.when(
            F.col("doc_id") < 40,
            F.concat(
                F.lit("https://Example.org/p/"),
                F.floor(F.col("doc_id") / 2).cast("string"),
                F.when(F.col("doc_id") % 2 == 1, F.lit("/?utm_source=x"))
                .otherwise(F.lit("")),
            ),
        ),
    )
    got = _ids(Corpus(with_urls).dedup_urls())
    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    # pairs (2g, 2g+1) collapse to min = even ids; NULL-url docs all kept
    want = {i for i in all_ids if i >= 40 or i % 2 == 0}
    assert got == want


def test_top_ngrams_matches_operator(spark, docs):
    from timefence_spark.operators import text as t

    got = [tuple(r) for r in Corpus(docs).top_ngrams(n=2, top_k=5).collect()]
    want = [
        tuple(r)
        for r in t.ngram_frequencies(
            docs, id_col="doc_id", text_col="text", n=2, top_k=5, min_docs=2
        ).collect()
    ]
    assert got == want and len(got) == 5


def test_corpus_filter_gram_duplication(spark):
    """Facade for the Lee et al. duplication gate: over-threshold docs
    drop, under-threshold and unscorable (< n tokens) docs stay."""
    from timefence_spark.corpus import Corpus

    rows = [
        (1, "a b c d"),   # shares "a b" with doc 2 -> dup_frac 1/3
        (2, "a b x y"),
        (3, "z w"),       # unique gram -> 0.0
        (4, "q"),         # unscorable -> kept
        (5, "a b a b a b"),  # grams mostly "a b"/"b a" -> high dup
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    c = Corpus(df, id_col="doc_id", text_col="text")
    kept = sorted(
        r["doc_id"]
        for r in c.filter_gram_duplication(max_frac=0.5, n=2).df.collect()
    )
    assert 4 in kept and 3 in kept and 5 not in kept
    assert kept == [1, 2, 3, 4]


def test_to_sequences_wordpiece(spark):
    """Corpus.to_sequences(wordpiece_vocab=) (round 11): WordPiece ids
    feed the same single-exchange pack_sequences; unknown words encode
    as the [UNK] vocab index."""
    import pytest

    from timefence_spark.corpus import Corpus
    from timefence_spark.operators import wordpiece as wp

    text = "pack the rows pack the rows pack the rows"
    docs = spark.createDataFrame(
        [(i, text) for i in range(4)] + [(9, "zzz")],
        "doc_id long, text string",
    )
    c = Corpus(docs)
    merges = c.train_wordpiece(n_merges=6)
    # alphabet WITHOUT doc 9 ('zzz'), so 'z' stays unknown at encode
    alpha = wp.wordpiece_alphabet_spark(
        docs.where("doc_id != 9"), text_col="text"
    )
    vocab = wp.wordpiece_pieces(merges, alpha) + ["[UNK]"]
    seqs = c.to_sequences(
        seq_len=8, wordpiece_vocab=vocab, num_shards=2, pad_id=0
    )
    rows = seqs.collect()
    assert rows and all(len(r["input_ids"]) == 8 for r in rows)
    ids = {i for r in rows for i in r["input_ids"]}
    assert ids <= set(range(len(vocab)))  # includes the [UNK] index
    assert vocab.index("[UNK]") in ids  # 'zzz' has no 'z' in alphabet
    with pytest.raises(ValueError, match="exactly one"):
        c.to_sequences(
            seq_len=8, wordpiece_vocab=vocab,
            unigram_model=[("a", 1, 0)],
        )
    with pytest.raises(ValueError, match="exactly one"):
        c.to_sequences(
            seq_len=8, wordpiece_vocab=vocab, merges=[("a", "b")]
        )


def test_to_sequences_empty_merges_is_a_bpe_selection(spark):
    """ADVICE r11: `merges=[]` is a legitimate BPE selection (character-
    level encoding, zero merges) — truthiness-based validation treated it
    as absent, silently ignoring it next to another tokenizer instead of
    raising the documented 'exactly one' error."""
    import pytest

    from timefence_spark.corpus import Corpus

    docs = spark.createDataFrame(
        [(0, "ab ab"), (1, "ab")], "doc_id long, text string"
    )
    c = Corpus(docs)
    with pytest.raises(ValueError, match="exactly one"):
        c.to_sequences(
            seq_len=4, merges=[], unigram_model=[("a", 1, 0)]
        )
    # And merges=[] ALONE still selects (character-level) BPE.
    rows = c.to_sequences(seq_len=4, merges=[], num_shards=1, pad_id=0).collect()
    assert rows and all(len(r["input_ids"]) == 4 for r in rows)


def test_filter_fluency_trigram_and_byte_sequences(spark):
    """Corpus.filter_fluency(model='trigram') gates on KN trigram NLL
    (unscored short docs kept); Corpus.to_sequences(pretokenize='byte')
    feeds byte-level BPE ids into the same single-exchange packer."""
    from timefence_spark.corpus import Corpus
    from timefence_spark.operators import bpe

    docs = spark.createDataFrame(
        [(i, "the cat sat on the mat again and again") for i in range(6)]
        + [(50, "zq xv plorb")] + [(99, "too short")],
        "doc_id long, text string",
    )
    c = Corpus(docs)
    # repeated docs score ~0.09 mean NLL, the gibberish one ~0.72
    # (its unique trigram is still "seen" under self-statistics, so
    # the gap is discount-driven, not OOV-driven)
    scored_kept = c.filter_fluency(max_nll=0.3, model="trigram")
    ids = {r["doc_id"] for r in scored_kept.df.select("doc_id").collect()}
    assert 99 in ids           # < 3 tokens: unscored, kept
    assert set(range(6)) <= ids
    assert 50 not in ids       # gibberish: high NLL, dropped

    merges = c.train_bpe(n_merges=8, pretokenize="byte")
    vocab = bpe.bpe_vocab(
        docs, text_col="text", merges=merges, pretokenize="byte"
    )
    seqs = c.to_sequences(
        seq_len=6, merges=merges, vocab=vocab, pretokenize="byte",
        num_shards=2, pad_id=0,
    )
    rows = seqs.collect()
    assert rows and all(len(r["input_ids"]) == 6 for r in rows)
    assert all(
        0 <= i < len(vocab) for r in rows for i in r["input_ids"]
    )
