"""Unigram-LM tokenizer (VERDICT r10 item 3): trainer determinism,
the segmentation-concatenation property, local/distributed path
equality, the JVM-fold encoder vs the Python DP, and the CLI path."""

from __future__ import annotations

import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from timefence_spark.operators import unigram as U

TEXT = """the query planner reads the table scan and pushes the filter
below the join so the scan prunes row groups early a hash join builds
the small side and probes the big side a merge join sorts both sides
the window ranks rows per partition and the filter keeps the first row
the dedup groups rows by hash value and keeps one row per group"""


def test_train_unigram_model_shape_and_determinism():
    m1 = U.train_unigram(TEXT, vocab_size=60, max_piece_len=4, em_iters=2)
    m2 = U.train_unigram(TEXT, vocab_size=60, max_piece_len=4, em_iters=2)
    assert m1 == m2  # pure function of the text
    assert len(m1) <= 60 + 0  # chars fit inside 60 here
    pieces = [p for p, _, _ in m1]
    assert len(set(pieces)) == len(pieces)
    # ordered by (count desc, piece asc) — the id contract
    key = [(-c, p) for p, c, _ in m1]
    assert key == sorted(key)
    # every training character is covered
    chars = {ch for w in re.split(r"\s+", TEXT) for ch in w}
    assert chars <= set(pieces)
    # logp_micro really is floor(ln(cnt/total)*1e6 + 0.5)
    total = sum(c for _, c, _ in m1)
    import math

    for p, c, lp in m1:
        assert lp == int(math.floor(math.log(c / total) * 1e6 + 0.5))


# hypothesis: the Viterbi segmentation of ANY word concatenates back to
# the word, under a model that does not necessarily cover its chars.
@given(
    st.text(
        alphabet=st.characters(
            codec="ascii", categories=("Lu", "Ll", "Nd", "P")
        ),
        min_size=1,
        max_size=24,
    )
)
@settings(deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_viterbi_concatenation_property(word):
    model = {p: lp for p, _, lp in U.train_unigram(
        TEXT, vocab_size=50, max_piece_len=4, em_iters=1
    )}
    segs = U.viterbi_segment(word, model, 4)
    assert "".join(segs) == word
    assert all(segs)  # no empty pieces


def test_viterbi_prefers_higher_scoring_segmentation():
    # 'ab' piece scores better than 'a'+'b' -> must pick the pair
    model = {"a": -3_000_000, "b": -3_000_000, "ab": -2_000_000}
    assert U.viterbi_segment("ab", model, 2) == ["ab"]
    # when the split scores better, take it
    model2 = {"a": -500_000, "b": -500_000, "ab": -2_000_000}
    assert U.viterbi_segment("ab", model2, 2) == ["a", "b"]
    # exact tie -> prefer the LONGER last piece
    model3 = {"a": -1_000_000, "b": -1_000_000, "ab": -2_000_000}
    assert U.viterbi_segment("ab", model3, 2) == ["ab"]


def test_train_unigram_spark_local_matches_distributed(spark):
    rows = [(i, TEXT) for i in range(3)] + [
        (99, "extra words beyond the training corpus body text here")
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kw = dict(vocab_size=60, max_piece_len=4, seed_size=300, em_iters=2)
    loc = U.train_unigram_spark(df, **kw)
    dist = U.train_unigram_spark(df, mode="distributed", **kw)
    assert loc == dist
    # partitioning-invariant (pure function of the corpus text)
    assert U.train_unigram_spark(df.repartition(7), **kw) == loc
    # matches the pure-Python trainer on the same concatenated text
    from collections import Counter

    words: Counter = Counter()
    for _, t in rows:
        for w in re.split(r"\s+", t):
            if w:
                words[w] += 1
    ref = U._train_unigram_from_vocab(
        words, vocab_size=60, max_piece_len=4, seed_size=300, em_iters=2
    )
    assert loc == ref


def test_encode_documents_unigram_matches_python(spark):
    rows = [
        (1, TEXT),
        (2, "planner"),
        (3, ""),          # empty -> empty tokens
        (4, None),        # NULL -> empty tokens
        (5, "zebra!!? unknown chars é"),  # unseen chars segment as UNK
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    model = U.train_unigram(TEXT, vocab_size=60, max_piece_len=4)
    enc = U.encode_documents_unigram(
        df, model, id_col="doc_id", text_col="text"
    )
    got = {r["doc_id"]: r["tokens"] for r in enc.collect()}
    md = {p: lp for p, _, lp in model}
    ml = max(len(p) for p, _, _ in model)

    def py(t):
        out = []
        for w in re.split(r"\s+", t or ""):
            if w:
                out.extend(U.viterbi_segment(w, md, ml))
        return out

    for i, t in rows:
        assert got[i] == py(t), i
    assert got[3] == [] and got[4] == []
    # ids output: model row index; unknown pieces -> -1
    ids = {
        r["doc_id"]: r["tokens"]
        for r in U.encode_documents_unigram(
            df, model, id_col="doc_id", text_col="text", output="ids"
        ).collect()
    }
    vocab_index = {p: i for i, (p, _, _) in enumerate(model)}
    for i, t in rows:
        assert ids[i] == [vocab_index.get(p, -1) for p in py(t)], i
    assert -1 in ids[5]  # the unseen chars really map to UNK
    with pytest.raises(ValueError, match="output"):
        U.encode_documents_unigram(df, model, output="bogus")


def test_unigram_encoder_plan_is_scan_side(spark):
    """The encoder's only join must be the ONE-row broadcast model map
    — no shuffles, no Python workers in the executor path."""
    from timefence_spark.plans import physical_summary

    df = spark.createDataFrame(
        [(i, TEXT) for i in range(5)], "doc_id long, text string"
    )
    model = U.train_unigram(TEXT, vocab_size=50, max_piece_len=4)
    out = U.encode_documents_unigram(
        df, model, id_col="doc_id", text_col="text"
    )
    s = physical_summary(out)
    assert s.exchanges <= 1  # the one-row aggregate side only
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "ArrowEval" not in plan


def test_unigram_save_load_roundtrip(tmp_path):
    model = U.train_unigram(TEXT, vocab_size=40, max_piece_len=3)
    p = tmp_path / "uni.json"
    U.save_unigram_tokenizer(p, model=model)
    assert U.load_unigram_tokenizer(p) == model
    with pytest.raises(ValueError, match="unigram artifact"):
        bad = tmp_path / "bad.json"
        bad.write_text('{"format": "something-else"}')
        U.load_unigram_tokenizer(bad)


def test_unigram_validation():
    with pytest.raises(ValueError, match="vocab_size"):
        U.train_unigram(TEXT, vocab_size=0)
    with pytest.raises(ValueError, match="max_piece_len"):
        U.train_unigram(TEXT, max_piece_len=0)
    with pytest.raises(ValueError, match="em_iters"):
        U.train_unigram(TEXT, em_iters=-1)
    with pytest.raises(ValueError, match="seed_size"):
        U.train_unigram(TEXT, seed_size=-1)
    assert U.train_unigram("", vocab_size=10) == []


def test_corpus_to_sequences_unigram(spark):
    """Corpus.to_sequences(unigram_model=...) packs unigram ids: id
    streams match encode_documents_unigram, no Python stage in the
    encode plan, and mixing tokenizer args errors."""
    from timefence_spark.corpus import Corpus

    rows = [(i, TEXT) for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    model = U.train_unigram(TEXT, vocab_size=60, max_piece_len=4)
    c = Corpus(df, id_col="doc_id", text_col="text")
    seqs = c.to_sequences(seq_len=16, unigram_model=model, num_shards=2)
    assert set(seqs.columns) == {"shard", "seq", "n_tokens", "input_ids"}
    total_packed = sum(r["n_tokens"] for r in seqs.collect())
    enc = U.encode_documents_unigram(
        df, model, id_col="doc_id", text_col="text", output="ids"
    )
    total_ids = sum(len(r["tokens"]) for r in enc.collect())
    # packing cuts to full seq_len rows; the tail remainder per shard
    # (< seq_len each) is the only loss
    assert total_packed <= total_ids
    assert total_ids - total_packed < 16 * 2
    with pytest.raises(ValueError, match="exactly one"):
        c.to_sequences(seq_len=16, unigram_model=model, merges=[("a", "b")])


def test_cli_corpus_train_tokenizer_unigram(spark, tmp_path):
    import json as _json

    from click.testing import CliRunner

    from timefence_spark.cli import cli

    src = tmp_path / "docs.parquet"
    spark.createDataFrame(
        [(i, TEXT) for i in range(3)], "doc_id long, text string"
    ).write.parquet(str(src))
    out = tmp_path / "model.parquet"
    tok = tmp_path / "tok.json"
    res = CliRunner().invoke(
        cli,
        [
            "corpus-train-tokenizer", "--input", str(src),
            "--output", str(out), "--model", "unigram",
            "--vocab-size", "50", "--max-piece-len", "4",
            "--save-tokenizer", str(tok), "--json",
        ],
        catch_exceptions=False,
    )
    assert res.exit_code == 0, res.output
    summary = _json.loads(res.output.strip().splitlines()[-1])
    assert summary["model"] == "unigram" and summary["n_learned"] > 0
    stored = spark.read.parquet(str(out))
    assert set(stored.columns) == {"token_id", "piece", "cnt", "logp_micro"}
    assert stored.count() == summary["n_learned"]
    assert U.load_unigram_tokenizer(tok)[0][0] == (
        stored.orderBy("token_id").head()["piece"]
    )
