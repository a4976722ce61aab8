"""WordPiece tokenizer (round 11): trainer determinism and likelihood
scoring, local/distributed path equality, the greedy JVM-fold encoder
vs the Python reference semantics, whole-word [UNK] rules, the
tokenizer artifact round-trip, and the CLI path."""

from __future__ import annotations

import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from timefence_spark.operators import wordpiece as W

TEXT = """the query planner reads the table scan and pushes the filter
below the join so the scan prunes row groups early a hash join builds
the small side and probes the big side a merge join sorts both sides
the window ranks rows per partition and the filter keeps the first row
the dedup groups rows by hash value and keeps one row per group"""


def _greedy_py(word: str, vocab: set[str], unk: str, maxw: int) -> list[str]:
    """Reference greedy longest-match (BERT WordpieceTokenizer)."""
    if len(word) > maxw:
        return [unk]
    pos, out = 0, []
    while pos < len(word):
        best = None
        for L in range(len(word) - pos, 0, -1):
            piece = word[pos: pos + L] if pos == 0 else (
                "##" + word[pos: pos + L]
            )
            if piece in vocab:
                best = (L, piece)
                break
        if best is None:
            return [unk]
        pos += best[0]
        out.append(best[1])
    return out


def test_train_wordpiece_determinism_and_shape():
    m1 = W.train_wordpiece(TEXT, n_merges=20)
    m2 = W.train_wordpiece(TEXT, n_merges=20)
    assert m1 == m2
    assert len(m1) <= 20
    # every merge's parts reference live symbols: l bare-or-##, r ##-only
    for left, right in m1:
        assert right.startswith("##")
        assert left != ""


def test_wordpiece_likelihood_beats_raw_frequency():
    """The likelihood score cnt/(cnt_l*cnt_r) must pick a rarer but
    higher-association pair over the globally most frequent one: 'th'
    appears constantly here, but 'q'+'##u' is a perfect association."""
    text = "the the the the the the the the quo quo"
    merges = W.train_wordpiece(text, n_merges=1)
    # 'the' pairs score 8/(8*8)=0.125; 'quo' pairs score 2/(2*2)=0.5 and
    # tie with each other, so (l, r) ascending picks ('##u', '##o').
    assert merges == [("##u", "##o")]


def test_wordpiece_merged_token_strips_continuation():
    merges = W.train_wordpiece("aab aab aab", n_merges=2)
    # ('a','##a') -> 'aa' (bare left keeps no prefix), then ('aa','##b')
    pieces = W.wordpiece_pieces(merges, ["a", "##a", "##b"])
    assert "aa" in pieces or "aab" in pieces
    for p in pieces:
        assert not p.startswith("####")


def test_local_and_distributed_trainers_identical(spark):
    docs = spark.createDataFrame(
        [(i, TEXT) for i in range(3)], "doc_id int, text string"
    )
    m_local = W.train_wordpiece_spark(
        docs, text_col="text", n_merges=12, mode="local"
    )
    m_dist = W.train_wordpiece_spark(
        docs, text_col="text", n_merges=12, mode="distributed"
    )
    assert m_local == m_dist
    assert m_local == W.train_wordpiece(
        " ".join([TEXT] * 3), n_merges=12
    )


def test_encoder_matches_python_greedy(spark):
    docs = spark.createDataFrame([(0, TEXT)], "doc_id int, text string")
    merges = W.train_wordpiece(TEXT, n_merges=15)
    alpha = W.wordpiece_alphabet_spark(docs, text_col="text")
    vocab = W.wordpiece_pieces(merges, alpha)
    enc = W.encode_documents_wordpiece(
        docs, vocab, id_col="doc_id", text_col="text"
    )
    got = enc.collect()[0]["tokens"]
    vset = set(vocab)
    want = [
        p
        for w in re.split(r"\s+", TEXT)
        if w
        for p in _greedy_py(w, vset, "[UNK]", 100)
    ]
    assert got == want


def test_encoder_unknown_word_is_whole_word_unk(spark):
    docs = spark.createDataFrame(
        [(0, "cab zzz c")], "doc_id int, text string"
    )
    vocab = ["c", "a", "b", "##a", "##b"]
    enc = W.encode_documents_wordpiece(
        docs, vocab, id_col="doc_id", text_col="text"
    )
    # 'cab' segments, 'zzz' has no 'z' -> whole-word UNK, 'c' matches
    assert enc.collect()[0]["tokens"] == ["c", "##a", "##b", "[UNK]", "c"]


def test_encoder_overlong_word_is_unk(spark):
    docs = spark.createDataFrame(
        [(0, "aaaa aa")], "doc_id int, text string"
    )
    enc = W.encode_documents_wordpiece(
        docs, ["a", "##a"], id_col="doc_id", text_col="text",
        max_word_chars=3,
    )
    assert enc.collect()[0]["tokens"] == ["[UNK]", "a", "##a"]


def test_encoder_ids_mode_and_null_text(spark):
    docs = spark.createDataFrame(
        [(0, "ab zz"), (1, None)], "doc_id int, text string"
    )
    vocab = ["[UNK]", "a", "##b"]
    enc = W.encode_documents_wordpiece(
        docs, vocab, id_col="doc_id", text_col="text", output="ids"
    )
    rows = {r["doc_id"]: r["tokens"] for r in enc.collect()}
    assert rows[0] == [1, 2, 0]  # a, ##b, [UNK] -> its own vocab id
    assert rows[1] == []


def test_greedy_is_longest_match_not_merge_replay(spark):
    """Greedy longest-match can pick a piece NO merge sequence builds
    at that position — the defining difference from BPE encoding."""
    docs = spark.createDataFrame([(0, "abc")], "doc_id int, text string")
    vocab = ["a", "##b", "##c", "##bc", "abc"]
    enc = W.encode_documents_wordpiece(
        docs, vocab, id_col="doc_id", text_col="text"
    )
    assert enc.collect()[0]["tokens"] == ["abc"]


@given(
    st.lists(
        st.text(
            alphabet=st.characters(codec="ascii", categories=("Ll",)),
            min_size=1, max_size=8,
        ),
        min_size=1, max_size=6,
    )
)
@settings(
    max_examples=30, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_property_pieces_concatenate_or_unk(words):
    """For any corpus, encoding its own words with its own trained
    vocab: every word's pieces either concatenate back to the word
    (after stripping ##) or are the single [UNK]; training on a corpus
    always covers its own alphabet, so UNK cannot occur here."""
    text = " ".join(words)
    merges = W.train_wordpiece(text, n_merges=10)
    alpha = sorted(
        {
            s
            for w in words
            for s in W._word_syms(w)
        }
    )
    vocab = set(W.wordpiece_pieces(merges, alpha))
    for w in words:
        pieces = _greedy_py(w, vocab, "[UNK]", 100)
        assert pieces != ["[UNK]"]
        assert "".join(W._strip_cont(p) for p in pieces) == w


def test_tokenizer_artifact_roundtrip(tmp_path):
    merges = W.train_wordpiece(TEXT, n_merges=10)
    alpha = sorted(
        {s for w in re.split(r"\s+", TEXT) if w for s in W._word_syms(w)}
    )
    path = tmp_path / "wp.json"
    W.save_wordpiece_tokenizer(path, merges=merges, alphabet=alpha)
    m2, a2 = W.load_wordpiece_tokenizer(path)
    assert m2 == merges and a2 == alpha
    with pytest.raises(ValueError):
        bad = tmp_path / "bad.json"
        bad.write_text('{"format": "other"}')
        W.load_wordpiece_tokenizer(bad)


def test_validation_errors(spark):
    docs = spark.createDataFrame([(0, "ab")], "doc_id int, text string")
    with pytest.raises(ValueError, match="mode"):
        W.train_wordpiece_spark(docs, mode="nope")
    with pytest.raises(ValueError, match="n_merges"):
        W.train_wordpiece(TEXT, n_merges=-1)
    with pytest.raises(ValueError, match="output"):
        W.encode_documents_wordpiece(docs, ["a"], output="nope")
    with pytest.raises(ValueError, match="max_word_chars"):
        W.encode_documents_wordpiece(docs, ["a"], max_word_chars=0)


def test_cli_train_wordpiece(spark, tmp_path):
    from click.testing import CliRunner

    from timefence_spark.cli import cli

    src = tmp_path / "docs.parquet"
    spark.createDataFrame(
        [(0, TEXT), (1, TEXT)], "doc_id int, text string"
    ).write.parquet(str(src))
    out = tmp_path / "model.parquet"
    tok = tmp_path / "wp.json"
    res = CliRunner().invoke(
        cli,
        [
            "corpus-train-tokenizer",
            "--input", str(src), "--output", str(out),
            "--model", "wordpiece", "--n-merges", "8",
            "--save-tokenizer", str(tok), "--json",
        ],
    )
    assert res.exit_code == 0, res.output
    model = spark.read.parquet(str(out)).orderBy("merge_rank").collect()
    assert len(model) == 8
    merges, alpha = W.load_wordpiece_tokenizer(tok)
    assert [(r["lhs"], r["rhs"]) for r in model] == merges
    assert all(len(a) in (1, 3) for a in alpha)
