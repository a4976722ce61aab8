"""HuggingFace ``tokenizer.json`` interop for the trained tokenizer
families (VERDICT r11 item 3).

Real pipelines hand the trained tokenizer to training code as a
``tokenizer.json`` (the `tokenizers` library's serialization), not a
private artifact: this module writes that layout for the three trained
families — BPE (:func:`bpe.train_bpe_spark`), WordPiece
(:func:`wordpiece.train_wordpiece_spark`), Unigram
(:func:`unigram.train_unigram_spark`) — and reads it back into the
exact model objects this package's encoders consume, so
export -> import -> encode is id-identical to encoding with the
original model. Everything is driver-side JSON on KB-sized models; no
network, no `tokenizers` dependency (the layout is public and stable:
top-level version/pre_tokenizer/model blocks, with model.type one of
BPE | WordPiece | Unigram).

Reference semantics notes (what each family round-trips):

* **BPE** — ``model.vocab`` is the token->id dict (our id = vocab list
  index) and ``model.merges`` the ranked merge list. Written as the
  classic ``"left right"`` strings (readable by every `tokenizers`
  version); pairs-form ``["left", "right"]`` (tokenizers >= 0.20) is
  accepted on load. No token ever contains a space (whitespace modes
  never include one; gpt2 mode byte-renders spaces to ``Ġ``), so the
  string form is unambiguous. The pre_tokenizer block records the
  training mode: ByteLevel for ``pretokenize='gpt2'`` (the library
  then splits with the GPT-2 regex and byte-renders, exactly matching
  bpe.gpt2_split + bpe.byte_render), WhitespaceSplit otherwise;
  ``pretokenize='byte'`` has no HF equivalent and is rejected
  (ADVICE r12).
* **WordPiece** — ``model.vocab`` only (HF WordPiece stores the final
  vocabulary; merges/alphabet are training residue). Our pieces already
  carry HF's ``##`` continuation prefix, so the vocab maps verbatim;
  ids are vocab-list indexes on both sides. ``unk_token`` defaults to
  ``[UNK]`` and is appended to the exported vocab when absent (our
  encoder resolves unknown words to the [UNK] entry's index).
* **Unigram** — ``model.vocab`` is the ORDERED [piece, logprob] list;
  order is the id space on both sides. Our integer-micronat scores
  export as floats (micros / 1e6) and re-import by rounding back to
  micros — exact for every representable score, so Viterbi
  segmentations are bit-identical after a round trip. Training counts
  are not part of the HF layout (they don't affect encoding) and
  re-import as 0.
"""

from __future__ import annotations

import json
from pathlib import Path

__all__ = [
    "bpe_to_hf_dict",
    "wordpiece_to_hf_dict",
    "unigram_to_hf_dict",
    "save_hf_tokenizer",
    "load_hf_tokenizer",
]

_WS_PRETOKENIZER = {"type": "WhitespaceSplit"}
# GPT-2's pre_tokenizer as the `tokenizers` library serializes it:
# regex split (the published GPT-2 pattern, use_regex=true) + per-piece
# byte-to-unicode rendering — exactly bpe.gpt2_split + bpe.byte_render.
_BYTELEVEL_PRETOKENIZER = {
    "type": "ByteLevel",
    "add_prefix_space": False,
    "trim_offsets": True,
    "use_regex": True,
}
_BYTELEVEL_DECODER = {
    "type": "ByteLevel",
    "add_prefix_space": True,
    "trim_offsets": True,
    "use_regex": True,
}


def _envelope(model: dict, *, pretokenize: str = "whitespace") -> dict:
    """The tokenizer.json top level: the fields `tokenizers` always
    writes, with the knobs this package doesn't use left null/empty.
    ``pretokenize='gpt2'`` emits the ByteLevel pre_tokenizer/decoder
    pair; everything else emits WhitespaceSplit."""
    byte_level = pretokenize == "gpt2"
    return {
        "version": "1.0",
        "truncation": None,
        "padding": None,
        "added_tokens": [],
        "normalizer": None,
        "pre_tokenizer": dict(
            _BYTELEVEL_PRETOKENIZER if byte_level else _WS_PRETOKENIZER
        ),
        "post_processor": None,
        "decoder": dict(_BYTELEVEL_DECODER) if byte_level else None,
        "model": model,
    }


def bpe_to_hf_dict(
    *,
    merges: list[tuple[str, str]],
    vocab: list[str],
    pretokenize: str = "whitespace",
) -> dict:
    """HF tokenizer.json dict for a trained BPE model.

    ``vocab`` is required (HF BPE stores token ids in the model block);
    pass :func:`bpe.bpe_vocab`'s output or a loaded artifact's vocab.

    ``pretokenize`` must say how the merges were trained (ADVICE r12 —
    a byte-trained model exported with a character-level pre_tokenizer
    would silently mis-encode in the `tokenizers` library):
    'gpt2' exports the ByteLevel pre_tokenizer (true GPT-2-style
    round trip), 'whitespace' exports WhitespaceSplit, and 'byte'
    (whitespace boundaries + byte rendering) has no HF pre_tokenizer
    equivalent and raises — retrain with pretokenize='gpt2' or keep
    the native format for byte-mode models."""
    if vocab is None:
        raise ValueError(
            "format='hf' requires a vocab: HF BPE serializes the "
            "token->id table in the model block (pass bpe_vocab(...)'s "
            "output, or the vocab from a saved artifact)"
        )
    if pretokenize == "byte":
        raise ValueError(
            "pretokenize='byte' (whitespace word boundaries + byte "
            "rendering) has no HuggingFace pre_tokenizer equivalent — "
            "an exported tokenizer.json would silently mis-encode raw "
            "text in the tokenizers library. Train with "
            "pretokenize='gpt2' for an HF-round-trippable byte-level "
            "model, or save format='native'"
        )
    if pretokenize not in ("whitespace", "gpt2"):
        raise ValueError(
            f"pretokenize must be whitespace|gpt2 for HF export, "
            f"got {pretokenize!r}"
        )
    for left, right in merges:
        if " " in left or " " in right:
            raise ValueError(
                f"merge pair {(left, right)!r} contains a space — not "
                "representable in the tokenizer.json merges list"
            )
    return _envelope(
        {
            "type": "BPE",
            "dropout": None,
            "unk_token": None,
            "continuing_subword_prefix": None,
            "end_of_word_suffix": None,
            "fuse_unk": False,
            "byte_fallback": False,
            "vocab": {tok: i for i, tok in enumerate(vocab)},
            "merges": [f"{left} {right}" for left, right in merges],
        },
        pretokenize=pretokenize,
    )


def wordpiece_to_hf_dict(
    *, vocab: list[str], unk_token: str = "[UNK]"
) -> dict:
    """HF tokenizer.json dict for a trained WordPiece model.

    ``vocab`` is :func:`wordpiece.wordpiece_pieces`' output (ids are
    list indexes); ``unk_token`` is appended when absent so the HF side
    and our greedy encoder agree on the unknown id."""
    vocab = list(vocab)
    if unk_token not in vocab:
        vocab.append(unk_token)
    return _envelope(
        {
            "type": "WordPiece",
            "unk_token": unk_token,
            "continuing_subword_prefix": "##",
            "max_input_chars_per_word": 100,
            "vocab": {tok: i for i, tok in enumerate(vocab)},
        }
    )


def unigram_to_hf_dict(
    *, model: list[tuple[str, int, int]]
) -> dict:
    """HF tokenizer.json dict for a trained unigram model.

    ``model`` is train_unigram_spark's (piece, count, logp_micro) rows;
    row order IS the id space and is preserved in the ordered HF vocab
    list. unk_id is null: our encoder maps unknowns to -1 rather than a
    reserved row, and the HF layout allows the absent-unk form."""
    return _envelope(
        {
            "type": "Unigram",
            "unk_id": None,
            "vocab": [[piece, lp / 1e6] for piece, _cnt, lp in model],
            "byte_fallback": False,
        }
    )


def save_hf_tokenizer(
    path,
    *,
    bpe: dict | None = None,
    wordpiece: dict | None = None,
    unigram: dict | None = None,
) -> None:
    """Write a tokenizer.json for exactly one family.

    Pass the family's model kwargs as a dict::

        save_hf_tokenizer(p, bpe={"merges": merges, "vocab": vocab,
                                  "pretokenize": "gpt2"})
        save_hf_tokenizer(p, wordpiece={"vocab": pieces})
        save_hf_tokenizer(p, unigram={"model": rows})
    """
    chosen = [x is not None for x in (bpe, wordpiece, unigram)]
    if sum(chosen) != 1:
        raise ValueError(
            "pass exactly one of bpe=, wordpiece=, unigram="
        )
    if bpe is not None:
        data = bpe_to_hf_dict(**bpe)
    elif wordpiece is not None:
        data = wordpiece_to_hf_dict(**wordpiece)
    else:
        data = unigram_to_hf_dict(**unigram)
    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(json.dumps(data, ensure_ascii=False))


def _ordered_vocab(vocab: dict[str, int], what: str) -> list[str]:
    """token->id dict back to the id-ordered list our encoders use.

    Ids must be a permutation of 0..n-1 (they are in every artifact the
    `tokenizers` library writes); anything else would silently scramble
    the id space, so it raises."""
    n = len(vocab)
    out: list[str | None] = [None] * n
    for tok, i in vocab.items():
        if not isinstance(i, int) or not 0 <= i < n or out[i] is not None:
            raise ValueError(
                f"{what} vocab ids are not a dense 0..{n - 1} range "
                f"(offending entry: {tok!r} -> {i!r})"
            )
        out[i] = tok
    return out  # type: ignore[return-value]


def _parse_merge(m, idx: int) -> tuple[str, str]:
    if isinstance(m, str):
        parts = m.split(" ")
        if len(parts) != 2:
            raise ValueError(
                f"merges[{idx}] {m!r} is not a 'left right' pair"
            )
        return parts[0], parts[1]
    if isinstance(m, (list, tuple)) and len(m) == 2:
        return str(m[0]), str(m[1])
    raise ValueError(f"merges[{idx}] {m!r} is not a merge pair")


def load_hf_tokenizer(path) -> dict:
    """Read a tokenizer.json into ready-to-encode model objects.

    Returns a dict keyed by family::

        {"type": "bpe", "merges": [...], "vocab": [...],
         "pretokenize": "whitespace" | "gpt2"}
        {"type": "wordpiece", "vocab": [...], "unk_token": "[UNK]"}
        {"type": "unigram", "model": [(piece, 0, logp_micro), ...]}

    Feed the fields straight to :func:`bpe.encode_documents`,
    :func:`wordpiece.encode_documents_wordpiece`,
    :func:`unigram.encode_documents_unigram`, or the matching
    ``Corpus.to_sequences`` argument."""
    data = json.loads(Path(path).read_text())
    model = data.get("model")
    if not isinstance(model, dict) or "type" not in model:
        raise ValueError(
            f"{path} is not a tokenizer.json artifact (no model.type)"
        )
    kind = model["type"]
    if kind == "BPE":
        pre = data.get("pre_tokenizer") or {}
        pre_type = pre.get("type")
        if pre_type == "Sequence":
            kinds = [
                p.get("type") for p in pre.get("pretokenizers") or []
            ]
            pre_type = "ByteLevel" if "ByteLevel" in kinds else pre_type
        return {
            "type": "bpe",
            "merges": [
                _parse_merge(m, i)
                for i, m in enumerate(model.get("merges") or [])
            ],
            "vocab": _ordered_vocab(model.get("vocab") or {}, "BPE"),
            # ByteLevel == GPT-2 regex split + byte rendering, which is
            # this package's pretokenize='gpt2'; anything else maps to
            # the whitespace default (the closest encode-side behavior
            # we have for Whitespace/WhitespaceSplit/absent).
            "pretokenize": (
                "gpt2" if pre_type == "ByteLevel" else "whitespace"
            ),
        }
    if kind == "WordPiece":
        return {
            "type": "wordpiece",
            "vocab": _ordered_vocab(
                model.get("vocab") or {}, "WordPiece"
            ),
            "unk_token": model.get("unk_token", "[UNK]"),
        }
    if kind == "Unigram":
        return {
            "type": "unigram",
            "model": [
                (str(piece), 0, round(float(lp) * 1e6))
                for piece, lp in (model.get("vocab") or [])
            ],
        }
    raise ValueError(
        f"unsupported tokenizer.json model.type {kind!r} "
        "(supported: BPE, WordPiece, Unigram)"
    )
