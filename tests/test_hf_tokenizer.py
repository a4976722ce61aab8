"""HF tokenizer.json interop (VERDICT r11 item 3): export -> import ->
identical encodings for all three trained families, plus layout and
error-path checks. Fixture-based — no network, no `tokenizers`
dependency."""

from __future__ import annotations

import json

import pytest

CORPUS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox naps under the warm sun"),
    (2, "pack the rows pack the rows pack the rows"),
    (3, "shuffle bytes across the cluster before the join"),
    (4, "zebras vex the quick dog"),
]


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def _ids(df, col="token_ids"):
    return {
        r["doc_id"]: list(r[col])
        for r in df.select("doc_id", col).collect()
    }


def test_bpe_hf_roundtrip(spark, docs, tmp_path):
    from timefence_spark.operators import bpe

    merges = bpe.train_bpe_spark(docs, text_col="text", n_merges=12)
    vocab = bpe.bpe_vocab(docs, text_col="text", merges=merges)
    before = _ids(
        bpe.encode_documents(
            docs, id_col="doc_id", text_col="text", merges=merges,
            vocab=vocab,
        )
    )

    p = tmp_path / "tokenizer.json"
    bpe.save_tokenizer(p, merges=merges, vocab=vocab, format="hf")

    data = json.loads(p.read_text())
    assert data["model"]["type"] == "BPE"
    assert data["pre_tokenizer"] == {"type": "WhitespaceSplit"}
    assert data["model"]["vocab"] == {t: i for i, t in enumerate(vocab)}
    assert all(
        isinstance(m, str) and len(m.split(" ")) == 2
        for m in data["model"]["merges"]
    )

    m2, v2, pre2 = bpe.load_tokenizer(p)
    assert m2 == merges and v2 == vocab and pre2 == "whitespace"
    after = _ids(
        bpe.encode_documents(
            docs, id_col="doc_id", text_col="text", merges=m2, vocab=v2
        )
    )
    assert after == before


def test_bpe_hf_roundtrip_gpt2(spark, docs, tmp_path):
    """GPT-2-mode HF round trip (VERDICT r12 item 4): the export
    carries the ByteLevel pre_tokenizer/decoder pair (what the
    `tokenizers` library needs to segment with the GPT-2 regex and
    byte-render, i.e. to reproduce bpe.gpt2_split + byte_render
    exactly), the reimported model encodes id-identically, and
    pretokenize='byte' exports are rejected (ADVICE r12 — they would
    silently mis-encode)."""
    from timefence_spark.operators import bpe

    merges = bpe.train_bpe_spark(
        docs, text_col="text", n_merges=12, pretokenize="gpt2"
    )
    vocab = bpe.bpe_vocab(
        docs, text_col="text", merges=merges, pretokenize="gpt2"
    )
    before = _ids(
        bpe.encode_documents(
            docs, id_col="doc_id", text_col="text", merges=merges,
            vocab=vocab, pretokenize="gpt2",
        )
    )

    p = tmp_path / "gpt2_tokenizer.json"
    bpe.save_tokenizer(
        p, merges=merges, vocab=vocab, format="hf", pretokenize="gpt2"
    )
    data = json.loads(p.read_text())
    assert data["pre_tokenizer"] == {
        "type": "ByteLevel",
        "add_prefix_space": False,
        "trim_offsets": True,
        "use_regex": True,
    }
    assert data["decoder"]["type"] == "ByteLevel"
    # Ġ-rendered tokens survive serialization; no token contains a
    # raw space (the "left right" merge form stays unambiguous)
    assert any(t.startswith("Ġ") for t in data["model"]["vocab"])
    assert all(" " not in t for t in data["model"]["vocab"])

    m2, v2, pre2 = bpe.load_tokenizer(p)
    assert (m2, v2, pre2) == (merges, vocab, "gpt2")
    after = _ids(
        bpe.encode_documents(
            docs, id_col="doc_id", text_col="text", merges=m2, vocab=v2,
            pretokenize=pre2,
        )
    )
    assert after == before

    with pytest.raises(ValueError, match="gpt2"):
        bpe.save_tokenizer(
            tmp_path / "nope.json", merges=merges, vocab=vocab,
            format="hf", pretokenize="byte",
        )


def test_bpe_hf_requires_vocab_and_accepts_pair_merges(tmp_path):
    from timefence_spark.operators import bpe
    from timefence_spark.operators.hf_tokenizer import load_hf_tokenizer

    with pytest.raises(ValueError, match="vocab"):
        bpe.save_tokenizer(
            tmp_path / "t.json", merges=[("a", "b")], format="hf"
        )
    with pytest.raises(ValueError, match="format"):
        bpe.save_tokenizer(
            tmp_path / "t.json", merges=[("a", "b")], format="bogus"
        )
    # tokenizers >= 0.20 writes merges as ["left", "right"] pairs.
    p = tmp_path / "pairform.json"
    p.write_text(
        json.dumps(
            {
                "model": {
                    "type": "BPE",
                    "vocab": {"a": 0, "b": 1, "ab": 2},
                    "merges": [["a", "b"]],
                }
            }
        )
    )
    loaded = load_hf_tokenizer(p)
    assert loaded["type"] == "bpe"
    assert loaded["merges"] == [("a", "b")]
    assert loaded["vocab"] == ["a", "b", "ab"]
    # and the family loader reads it transparently too
    assert bpe.load_tokenizer(p) == (
        [("a", "b")], ["a", "b", "ab"], "whitespace"
    )


def test_wordpiece_hf_roundtrip(spark, docs, tmp_path):
    from timefence_spark.operators import wordpiece as wp
    from timefence_spark.operators.hf_tokenizer import load_hf_tokenizer

    merges = wp.train_wordpiece_spark(docs, text_col="text", n_merges=10)
    alpha = wp.wordpiece_alphabet_spark(docs, text_col="text")
    vocab = wp.wordpiece_pieces(merges, alpha) + ["[UNK]"]
    before = _ids(
        wp.encode_documents_wordpiece(
            docs, vocab, id_col="doc_id", text_col="text", output="ids",
            out_col="token_ids",
        ),
    )

    p = tmp_path / "tokenizer.json"
    wp.save_wordpiece_tokenizer(p, merges=merges, alphabet=alpha, format="hf")

    data = json.loads(p.read_text())
    assert data["model"]["type"] == "WordPiece"
    assert data["model"]["unk_token"] == "[UNK]"
    assert data["model"]["continuing_subword_prefix"] == "##"

    loaded = load_hf_tokenizer(p)
    assert loaded["type"] == "wordpiece"
    assert loaded["vocab"] == vocab  # [UNK] appended exactly once, last
    after = _ids(
        wp.encode_documents_wordpiece(
            docs, loaded["vocab"], id_col="doc_id", text_col="text",
            output="ids", out_col="token_ids",
        ),
    )
    assert after == before

    # the native loader refuses tokenizer.json with a pointer, since the
    # HF layout doesn't carry merges/alphabet
    with pytest.raises(ValueError, match="load_hf_tokenizer"):
        wp.load_wordpiece_tokenizer(p)


def test_unigram_hf_roundtrip(spark, docs, tmp_path):
    from timefence_spark.operators import unigram as uni

    model = uni.train_unigram_spark(
        docs, text_col="text", vocab_size=40, em_iters=2
    )
    before = _ids(
        uni.encode_documents_unigram(
            docs, model, id_col="doc_id", text_col="text", output="ids",
            out_col="token_ids",
        ),
    )

    p = tmp_path / "tokenizer.json"
    uni.save_unigram_tokenizer(p, model=model, format="hf")

    data = json.loads(p.read_text())
    assert data["model"]["type"] == "Unigram"
    assert data["model"]["vocab"][0][0] == model[0][0]  # order preserved

    m2 = uni.load_unigram_tokenizer(p)
    # id space (row order), pieces, and micronat scores survive exactly;
    # counts aren't part of the HF layout and come back as 0
    assert [(pc, lp) for pc, _c, lp in m2] == [
        (pc, lp) for pc, _c, lp in model
    ]
    after = _ids(
        uni.encode_documents_unigram(
            docs, m2, id_col="doc_id", text_col="text", output="ids",
            out_col="token_ids",
        ),
    )
    assert after == before


def test_hf_loader_error_paths(tmp_path):
    from timefence_spark.operators import bpe
    from timefence_spark.operators.hf_tokenizer import (
        load_hf_tokenizer,
        save_hf_tokenizer,
    )

    with pytest.raises(ValueError, match="exactly one"):
        save_hf_tokenizer(
            tmp_path / "t.json",
            bpe={"merges": [], "vocab": ["a"]},
            unigram={"model": []},
        )
    with pytest.raises(ValueError, match="exactly one"):
        save_hf_tokenizer(tmp_path / "t.json")

    p = tmp_path / "sparse.json"
    p.write_text(
        json.dumps(
            {"model": {"type": "WordPiece", "vocab": {"a": 0, "b": 7}}}
        )
    )
    with pytest.raises(ValueError, match="dense"):
        load_hf_tokenizer(p)

    p2 = tmp_path / "unsupported.json"
    p2.write_text(json.dumps({"model": {"type": "WordLevel", "vocab": {}}}))
    with pytest.raises(ValueError, match="unsupported"):
        load_hf_tokenizer(p2)

    p3 = tmp_path / "notokenizer.json"
    p3.write_text(json.dumps({"hello": 1}))
    with pytest.raises(ValueError, match="model.type"):
        load_hf_tokenizer(p3)

    # cross-family: a WordPiece tokenizer.json through the BPE loader
    p4 = tmp_path / "wp.json"
    save_hf_tokenizer(p4, wordpiece={"vocab": ["a", "##b"]})
    with pytest.raises(ValueError, match="wordpiece"):
        bpe.load_tokenizer(p4)
