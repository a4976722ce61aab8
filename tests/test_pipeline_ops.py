"""PII scrubbing, sequence packing, URL/domain filtering, vocabulary ops:
unit and invariant tests beyond the entry-level DuckDB oracles."""

from __future__ import annotations

from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from timefence_spark.operators import packing, pii, text as text_ops, web


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# ---------------------------------------------------------------------------
# PII
# ---------------------------------------------------------------------------


def test_pii_signals_clean_corpus(spark, docs):
    """The synthetic corpus carries no PII: every count must be zero."""
    out = pii.pii_signals(docs, id_col="doc_id", text_col="text")
    assert out.where(F.col("has_pii")).count() == 0
    assert out.count() == docs.count()


def test_pii_detect_and_redact_roundtrip(spark):
    rows = [
        (1, "mail bob.smith+x@corp.example.com today"),
        (2, "call me at (555) 123-4567 or +1-555-123-4567 now"),
        (3, "server at 192.168.1.250 port 8080"),
        (4, "clean text with number 123456789 and v1.2.3 tag"),
        (5, "a@b.io and 10.0.0.1 and 555-123-4567"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sig = {
        r["doc_id"]: r
        for r in pii.pii_signals(df, id_col="doc_id", text_col="text").collect()
    }
    assert sig[1]["n_email"] == 1 and sig[1]["n_pii"] == 1
    assert sig[2]["n_phone"] == 2
    assert sig[3]["n_ipv4"] == 1
    assert sig[4]["n_pii"] == 0 and not sig[4]["has_pii"]
    assert (sig[5]["n_email"], sig[5]["n_phone"], sig[5]["n_ipv4"]) == (1, 1, 1)

    red = {
        r["doc_id"]: r["text_redacted"]
        for r in pii.redact_pii(df, id_col="doc_id", text_col="text").collect()
    }
    assert red[1] == "mail <EMAIL> today"
    assert "<PHONE>" in red[2] and "123-4567" not in red[2]
    assert red[3] == "server at <IP> port 8080"
    assert red[4] == rows[3][1]  # untouched
    # After redaction nothing matches any more (idempotence).
    df2 = spark.createDataFrame(
        [(k, v) for k, v in red.items()], "doc_id long, text string"
    )
    assert (
        pii.pii_signals(df2, id_col="doc_id", text_col="text")
        .where(F.col("has_pii"))
        .count()
        == 0
    )


def test_redact_pii_custom_rules(spark):
    df = spark.createDataFrame([(1, "id ABC-123 ok")], "doc_id long, text string")
    out = pii.redact_pii(
        df,
        id_col="doc_id",
        text_col="text",
        rules=[("ticket", r"[A-Z]{3}-[0-9]{3}", "<TICKET>")],
    ).head()
    assert out["text_redacted"] == "id <TICKET> ok"


# ---------------------------------------------------------------------------
# Sequence packing
# ---------------------------------------------------------------------------

BUDGET = 400


def test_pack_next_fit_invariants(spark, docs):
    """Every chunk's token sum <= budget unless it is a single oversized
    doc; chunk ids are contiguous from 0 per shard; offsets are the
    running sum inside the chunk."""
    out = packing.pack_next_fit(
        docs.select("doc_id", "n_chars"),
        id_col="doc_id", token_col="n_chars", budget=BUDGET,
        num_shards=4, salt="t", hash_fn="md5",
    ).collect()
    assert len(out) == docs.count()
    chunks = defaultdict(list)
    for r in out:
        chunks[(r["shard"], r["chunk"])].append(r)
    for (shard, _), rows in chunks.items():
        total = sum(r["n_chars"] for r in rows)
        if any(r["oversized"] for r in rows):
            assert len(rows) == 1, "oversized docs must sit alone"
        else:
            assert total <= BUDGET
        # offsets are the prefix sums of the chunk in offset order
        rows.sort(key=lambda r: r["chunk_offset"])
        acc = 0
        for r in rows:
            assert r["chunk_offset"] == acc
            acc += r["n_chars"]
    for shard in {s for s, _ in chunks}:
        ids = sorted(c for s, c in chunks if s == shard)
        assert ids == list(range(len(ids))), "chunks must be contiguous"


def test_pack_stream_covers_stream(spark, docs):
    """start offsets tile each shard's stream exactly: sorted spans are
    adjacent and chunk spans match floor arithmetic."""
    out = packing.pack_stream(
        docs.select("doc_id", "n_chars"),
        id_col="doc_id", token_col="n_chars", budget=500,
        num_shards=4, salt="t", hash_fn="md5",
    ).collect()
    by_shard = defaultdict(list)
    for r in out:
        by_shard[r["shard"]].append(r)
    for rows in by_shard.values():
        rows.sort(key=lambda r: r["start_offset"])
        acc = 0
        for r in rows:
            assert r["start_offset"] == acc
            assert r["chunk_start"] == acc // 500
            last = max(acc + r["n_chars"] - 1, acc)
            assert r["chunk_end"] == last // 500
            assert r["straddles"] == (r["chunk_end"] != r["chunk_start"])
            acc += r["n_chars"]


def test_pack_rejects_bad_args(spark, docs):
    d = docs.select("doc_id", "n_chars")
    with pytest.raises(ValueError):
        packing.pack_stream(d, id_col="doc_id", token_col="n_chars", budget=0)
    with pytest.raises(ValueError):
        packing.pack_next_fit(
            d, id_col="doc_id", token_col="n_chars", budget=10, num_shards=0
        )


# ---------------------------------------------------------------------------
# URL / domains
# ---------------------------------------------------------------------------


def test_extract_urls_and_blocklist(spark):
    rows = [
        (1, "see https://spam.example.com/x and http://ok.org/page?q=1"),
        (2, "nothing here"),
        (3, "mixed HTTPS://CAPS.example.com/ and https://ok.org"),
        (4, "dup https://spam.example.com/a https://spam.example.com/b"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    urls = web.extract_urls(df, id_col="doc_id", text_col="text").collect()
    # scheme match is case-sensitive lowercase by pattern: doc 3's caps URL
    # is not matched (documented simple-pattern behavior), the ok.org one is.
    assert {(r["doc_id"], r["domain"]) for r in urls} == {
        (1, "spam.example.com"),
        (1, "ok.org"),
        (3, "ok.org"),
        (4, "spam.example.com"),
    }
    kept = web.filter_blocked_domains(
        df, ["spam.example.com"], id_col="doc_id", text_col="text"
    )
    assert {r["doc_id"] for r in kept.collect()} == {2, 3}
    only_blocked = web.filter_blocked_domains(
        df, ["spam.example.com"], id_col="doc_id", text_col="text", invert=True
    )
    assert {r["doc_id"] for r in only_blocked.collect()} == {1, 4}


def test_url_signals_density(spark):
    df = spark.createDataFrame(
        [(1, "x https://a.io/b y"), (2, "")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in web.url_signals(df, id_col="doc_id", text_col="text").collect()}
    assert out[1]["n_urls"] == 1 and out[1]["n_domains"] == 1
    assert out[1]["link_density"] == pytest.approx(len("https://a.io/b") / len("x https://a.io/b y"), abs=1e-6)
    assert out[2]["n_urls"] == 0 and out[2]["link_density"] == 0.0


# ---------------------------------------------------------------------------
# Vocabulary
# ---------------------------------------------------------------------------


def test_word_frequencies_full_table(spark):
    df = spark.createDataFrame(
        [(1, "a b a"), (2, "b c"), (3, "a")], "doc_id long, text string"
    )
    rows = text_ops.word_frequencies(df, id_col="doc_id", text_col="text").collect()
    got = {r["word"]: (r["n_occurrences"], r["n_docs"]) for r in rows}
    assert got == {"a": (3, 2), "b": (2, 2), "c": (1, 1)}
    # ordered head: count desc then word asc
    assert [r["word"] for r in rows] == ["a", "b", "c"]
    top1 = text_ops.word_frequencies(
        df, id_col="doc_id", text_col="text", top_k=1
    ).collect()
    assert [(r["word"]) for r in top1] == ["a"]


# ---------------------------------------------------------------------------
# Unigram LM fluency
# ---------------------------------------------------------------------------


def test_unigram_logprob_external_lm_and_oov(spark):
    import math

    lm = spark.createDataFrame(
        [("the", 6), ("cat", 3)], "word string, n_occurrences long"
    )
    docs = spark.createDataFrame(
        [(1, "the cat"), (2, "the zebra")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r
        for r in text_ops.unigram_logprob(
            docs, id_col="doc_id", text_col="text", lm=lm
        ).collect()
    }
    # N=9, V=2, k=1 -> denom = 12; p(the)=7/12, p(cat)=4/12, p(oov)=1/12
    denom = 12.0
    exp1 = (-math.log(7 / denom) - math.log(4 / denom)) / 2
    exp2 = (-math.log(7 / denom) - math.log(1 / denom)) / 2
    assert out[1]["mean_nll"] == pytest.approx(exp1, abs=1e-6)
    assert out[1]["oov_frac"] == 0.0
    assert out[2]["mean_nll"] == pytest.approx(exp2, abs=1e-6)
    assert out[2]["oov_frac"] == 0.5
    assert out[2]["n_tokens"] == 2


def test_unigram_logprob_deterministic_matches_default(spark, docs):
    a = text_ops.unigram_logprob(
        docs, id_col="doc_id", text_col="text", deterministic=True
    )
    b = text_ops.unigram_logprob(docs, id_col="doc_id", text_col="text")
    ra = {r["doc_id"]: r["mean_nll"] for r in a.collect()}
    rb = {r["doc_id"]: r["mean_nll"] for r in b.collect()}
    assert ra.keys() == rb.keys()
    for k in ra:
        assert ra[k] == pytest.approx(rb[k], abs=1e-6)


def test_pii_extended_rules(spark):
    df = spark.createDataFrame(
        [
            (1, "ssn 123-45-6789 card 4111 1111 1111 1111 tel 555-123-4567"),
            (2, "just ids 1234567890123456 and 123456789"),
        ],
        "doc_id long, text string",
    )
    sig = {
        r["doc_id"]: r
        for r in pii.pii_signals(
            df, id_col="doc_id", text_col="text", rules=pii.EXTENDED_PII_RULES
        ).collect()
    }
    assert sig[1]["n_ssn"] == 1
    assert sig[1]["n_credit_card"] == 1
    assert sig[1]["n_phone"] >= 1
    assert sig[2]["n_pii"] == 0  # bare digit runs don't match
    red = pii.redact_pii(
        df, id_col="doc_id", text_col="text", rules=pii.EXTENDED_PII_RULES
    ).head()
    assert "<SSN>" in red["text_redacted"]
    assert "<CARD>" in red["text_redacted"]
    assert "1111" not in red["text_redacted"]


def test_mixture_sample_rates_and_nesting(spark, docs):
    from timefence_spark.operators import sampling

    d = docs.select("doc_id", "lang")
    out = sampling.mixture_sample(
        d, id_col="doc_id", strata_col="lang",
        fractions={"en": 1.0, "de": 0.0}, default_fraction=0.5, salt="m",
    )
    by_lang = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    totals = {r["lang"]: r["n"] for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert by_lang.get("en") == totals["en"]          # fraction 1.0 keeps all
    assert "de" not in by_lang                        # fraction 0.0 drops all
    for lang, n in by_lang.items():
        if lang not in ("en", "de"):
            assert 0 < n < totals[lang]               # default rate in between
    # nesting: a smaller fraction with the same salt is a subset
    smaller = sampling.mixture_sample(
        d, id_col="doc_id", strata_col="lang",
        fractions={"en": 0.3}, default_fraction=0.2, salt="m",
    )
    big_ids = {r["doc_id"] for r in out.collect()}
    assert all(r["doc_id"] in big_ids or r["lang"] == "de"
               for r in smaller.collect())
    with pytest.raises(ValueError):
        sampling.mixture_sample(
            d, id_col="doc_id", strata_col="lang", fractions={"en": 1.5}
        )


def test_pii_signals_null_text_reports_zero(spark):
    """NULL-text rows must report 0 counts and has_pii=false (not NULL):
    a ~has_pii filter would otherwise silently drop them."""
    from pyspark.sql import functions as F

    from timefence_spark.operators import pii

    docs = spark.createDataFrame(
        [(1, "mail bob@x.example.org"), (2, None)], "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: r
        for r in pii.pii_signals(docs, id_col="doc_id", text_col="text").collect()
    }
    assert rows[2]["n_email"] == 0 and rows[2]["n_pii"] == 0
    assert rows[2]["has_pii"] is False
    assert rows[1]["has_pii"] is True
    kept = pii.pii_signals(docs, id_col="doc_id", text_col="text").where(
        ~F.col("has_pii")
    )
    assert [r["doc_id"] for r in kept.collect()] == [2]


def test_strip_html_edge_cases(spark):
    """strip_html: container-content drops, <header> must NOT match the
    <head> drop, block boundaries become newlines, entities decode in
    the standard order (&amp; last), malformed nesting degrades to
    whitespace, NULL stays NULL."""
    from timefence_spark.operators.web import strip_html

    rows = [
        (1, "<head><title>x</title></head><header>Site Menu</header>ok"),
        (2, "a &amp;lt; b"),        # decodes to "a &lt; b", NOT "a < b"
        (3, "<p>one</p><p>two</p>"),
        (4, "<div>broken <b>nest</div> tail</b>"),
        (5, None),
        (6, "  no   markup\t here  "),
        (7, "<SCRIPT>alert(1)</SCRIPT>visible<STYLE>x</STYLE>"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["text"]
        for r in strip_html(df, id_col="doc_id", text_col="text").collect()
    }
    assert got[1] == "Site Menu\nok"
    assert got[2] == "a &lt; b"
    assert got[3] == "one\ntwo"
    assert got[4] == "broken nest\ntail"
    assert got[5] is None
    assert got[6] == "no markup here"
    assert got[7] == "visible"

    from timefence_spark.corpus import Corpus

    kept = {
        r["doc_id"]: r["text"]
        for r in Corpus(df.where("doc_id = 3")).strip_html().df.collect()
    }
    assert kept[3] == "one\ntwo"


def test_pack_sequences_matches_python_reference(spark):
    """pack_sequences (round 9) must equal the sequential reference:
    per shard, docs ordered by (salted md5 hash, id), ids concatenated
    and cut every seq_len — padded tail when pad_id is set, dropped
    otherwise; every emitted row is exactly seq_len wide in pad mode
    and only full rows survive drop mode."""
    import hashlib

    from timefence_spark.operators.packing import pack_sequences

    rows = [
        (i, list(range(i * 10, i * 10 + (i % 7) + 1))) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, token_ids array<int>")

    def md5h(doc_id, salt="s"):
        return int(
            hashlib.md5(f"{doc_id}:{salt}".encode()).hexdigest()[:15], 16
        )

    n_shards, seq_len = 3, 8
    streams = {s: [] for s in range(n_shards)}
    for doc_id, ids in sorted(rows, key=lambda r: (md5h(r[0]), r[0])):
        streams[md5h(doc_id) % n_shards].extend(ids)

    for pad_id in (0, None):
        out = pack_sequences(
            df, id_col="doc_id", ids_col="token_ids", seq_len=seq_len,
            num_shards=n_shards, salt="s", hash_fn="md5", pad_id=pad_id,
        ).collect()
        got = {(r["shard"], r["seq"]): r for r in out}
        expected = {}
        for s, stream in streams.items():
            for q in range(0, (len(stream) + seq_len - 1) // seq_len):
                chunk = stream[q * seq_len: (q + 1) * seq_len]
                if pad_id is None and len(chunk) < seq_len:
                    continue
                n = len(chunk)
                if pad_id is not None:
                    chunk = chunk + [pad_id] * (seq_len - n)
                expected[(s, q)] = (n, chunk)
        assert set(got) == set(expected)
        for key, (n, chunk) in expected.items():
            assert got[key]["n_tokens"] == n
            assert got[key]["input_ids"] == chunk
            assert len(got[key]["input_ids"]) == seq_len

    # NULL id arrays count as empty; bad seq_len rejected
    with pytest.raises(ValueError, match="seq_len"):
        pack_sequences(df, id_col="doc_id", seq_len=0)
    nulls = spark.createDataFrame(
        [(1, None), (2, [1, 2, 3])], "doc_id long, token_ids array<int>"
    )
    out = pack_sequences(
        nulls, id_col="doc_id", seq_len=2, num_shards=1, hash_fn="md5",
    ).collect()
    assert sum(r["n_tokens"] for r in out) == 2  # one full seq survives


def test_encode_documents_roundtrip_and_vocab(spark):
    """encode_documents ids decode back to the exact token strings via
    the vocab list, n_tokens matches token_count, and the vocabulary is
    closed (chars + merge products, lexicographic)."""
    from timefence_spark.operators import bpe

    rows = [(1, "the scan reads the table"), (2, ""), (3, None), (4, "zq!")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    vocab = bpe.bpe_vocab(df, text_col="text")
    assert vocab == sorted(set(vocab))  # lexicographic dense ids
    out = {
        r["doc_id"]: r
        for r in bpe.encode_documents(
            df, id_col="doc_id", text_col="text"
        ).collect()
    }
    for doc_id, txt in rows:
        toks = [
            t for w in (txt or "").split() if w for t in bpe.encode(w)
        ]
        assert out[doc_id]["n_tokens"] == len(toks)
        assert [vocab[i] for i in out[doc_id]["token_ids"]] == toks
    assert out[2]["token_ids"] == [] and out[3]["token_ids"] == []

    # Frozen-vocab OOV contract: a vocab from another snapshot raises a
    # descriptive error by default, substitutes with oov_id on request.
    other = spark.createDataFrame([(9, "zq! new\u00e9char")],
                                  "doc_id long, text string")
    with pytest.raises(Exception, match="not in the .*vocabulary"):
        bpe.encode_documents(
            other, id_col="doc_id", text_col="text", vocab=vocab
        ).collect()
    sub = bpe.encode_documents(
        other, id_col="doc_id", text_col="text", vocab=vocab, oov_id=0
    ).collect()[0]
    assert sub["n_tokens"] == len(sub["token_ids"]) > 0
    assert 0 in sub["token_ids"]


def test_temperature_weights_and_budgets(spark):
    """Temperature weighting: T=1 is proportional, T→∞ flattens toward
    uniform, budgets floor(weight * total) feed token_budget_sample, and
    the composed Corpus.mixture_temperature respects every budget."""
    import math

    from timefence_spark import Corpus
    from timefence_spark.operators import sampling

    rows = [
        (i, "web" if i < 60 else ("books" if i < 80 else "code"), 100)
        for i in range(100)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tok long")
    w1 = {
        r["stratum"]: r["weight"]
        for r in sampling.temperature_weights(
            df, strata_col="source", token_col="n_tok", temperature=1.0
        ).collect()
    }
    assert w1 == {"web": 0.6, "books": 0.2, "code": 0.2}
    w9 = {
        r["stratum"]: r["weight"]
        for r in sampling.temperature_weights(
            df, strata_col="source", token_col="n_tok", temperature=100.0
        ).collect()
    }
    assert all(abs(v - 1 / 3) < 0.01 for v in w9.values())  # ~uniform
    # monotone flattening: web's share shrinks as T grows
    w2 = {
        r["stratum"]: r["weight"]
        for r in sampling.temperature_weights(
            df, strata_col="source", token_col="n_tok", temperature=2.0
        ).collect()
    }
    assert w9["web"] < w2["web"] < w1["web"]
    exp = 6000 ** 0.5 / (6000 ** 0.5 + 2 * 2000 ** 0.5)
    assert math.isclose(w2["web"], exp, abs_tol=1e-6)

    budgets = sampling.temperature_budgets(
        df, strata_col="source", token_col="n_tok", total_tokens=5000,
        temperature=2.0,
    )
    assert budgets["web"] == int(exp * 5000)
    mixed = Corpus(df, text_col="source").mixture_temperature(
        total_tokens=5000, token_col="n_tok", temperature=2.0,
        hash_fn="md5",
    ).df
    got = {
        r["source"]: r["n"]
        for r in mixed.groupBy("source").agg(
            F.sum("n_tok").alias("n")
        ).collect()
    }
    for s, b in budgets.items():
        assert got.get(s, 0) <= b

    with pytest.raises(ValueError, match="temperature"):
        sampling.temperature_weights(df, strata_col="source", temperature=0)

    # NULL strata are excluded (SQL equality could never budget them) and
    # an all-zero corpus yields 0.0 weights, not a division by zero.
    with_null = spark.createDataFrame(
        [(1, None, 50), (2, "web", 100), (3, "code", 100)],
        "doc_id long, source string, n_tok long",
    )
    wn = {
        r["stratum"]: r["weight"]
        for r in sampling.temperature_weights(
            with_null, strata_col="source", token_col="n_tok"
        ).collect()
    }
    assert set(wn) == {"web", "code"} and wn["web"] == 0.5
    bn = sampling.temperature_budgets(
        with_null, strata_col="source", token_col="n_tok", total_tokens=100
    )
    assert bn == {"web": 50, "code": 50}  # sortable, NULL-free
    zeros = spark.createDataFrame(
        [(1, "web", None), (2, "code", 0)],
        "doc_id long, source string, n_tok long",
    )
    wz = {
        r["stratum"]: r["weight"]
        for r in sampling.temperature_weights(
            zeros, strata_col="source", token_col="n_tok"
        ).collect()
    }
    assert wz == {"web": 0.0, "code": 0.0}


def test_canonicalize_url_and_url_dedup(spark):
    """The normalization contract, edge by edge: fragment drop, scheme/
    host case, default ports (scheme-matched only), trailing slashes,
    tracking-param removal, byte-wise param sort, non-URL passthrough,
    NULL passthrough; url_dedup keeps min(id) per canonical form and
    keeps every NULL-url row."""
    from timefence_spark.operators import web

    rows = [
        (1, "HTTPS://Example.ORG:443/a/b/?utm_source=x&b=2&a=1#frag"),
        (2, "https://example.org/a/b?a=1&b=2"),
        (3, "http://EXAMPLE.org:80/"),
        (4, "http://example.org"),
        (5, "https://example.org:80/x"),    # port doesn't match scheme: kept
        (6, "  not a url at all  "),
        (7, None),
        (8, "https://example.org/a/b?b=2&a=1&fbclid=123"),
        (9, "ftp://Files.Example.com/Dir/"),  # path case preserved
        (10, "https://www.example.org/w"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {
        r["doc_id"]: r["canonical_url"]
        for r in web.canonicalize_urls(df, url_col="url").collect()
    }
    assert got[1] == "https://example.org/a/b?a=1&b=2"
    assert got[2] == "https://example.org/a/b?a=1&b=2"
    assert got[3] == "http://example.org"
    assert got[4] == "http://example.org"
    assert got[5] == "https://example.org:80/x"
    assert got[6] == "not a url at all"
    assert got[7] is None
    assert got[8] == "https://example.org/a/b?a=1&b=2"
    assert got[9] == "ftp://files.example.com/Dir"
    assert got[10] == "https://www.example.org/w"
    www = {
        r["doc_id"]: r["canonical_url"]
        for r in web.canonicalize_urls(
            df, url_col="url", strip_www=True
        ).collect()
    }
    assert www[10] == "https://example.org/w"

    kept = sorted(
        r["doc_id"]
        for r in web.url_dedup(df, id_col="doc_id", url_col="url").collect()
    )
    # canonical groups: {1,2,8} -> 1, {3,4} -> 3; 5,6,9,10 unique; 7 NULL kept
    assert kept == [1, 3, 5, 6, 7, 9, 10]


@pytest.mark.slow
def test_dsir_weights_prefer_target_like_docs(spark):
    """DSIR (round 10): documents sharing the target corpus's n-gram
    distribution must weigh higher than off-distribution ones; the two
    hash kernels agree on ordering; sampling is deterministic Gumbel
    top-k (stable across reruns); degenerate inputs validate."""
    from timefence_spark.corpus import Corpus
    from timefence_spark.operators import sampling

    legal = "the party of the first part agrees to the terms herein"
    recipe = "mix the flour with sugar and bake the cake until golden"
    rows = (
        [(i, legal + f" clause {i}") for i in range(20)]          # target-like
        + [(100 + i, recipe + f" step {i}") for i in range(20)]  # off-target
    )
    raw = spark.createDataFrame(rows, "doc_id long, text string")
    target = spark.createDataFrame(
        [(1000 + i, legal + f" annex {i}") for i in range(10)],
        "doc_id long, text string",
    )
    w = {r["doc_id"]: r["log_weight"] for r in sampling.dsir_weights(
        raw, target, id_col="doc_id", text_col="text", buckets=512
    ).collect()}
    legal_mean = sum(w[i] for i in range(20)) / 20
    recipe_mean = sum(w[100 + i] for i in range(20)) / 20
    assert legal_mean > recipe_mean

    # md5 kernel ranks the same corpus the same way (values differ only
    # through bucket collisions; the class separation must survive)
    w2 = {r["doc_id"]: r["log_weight"] for r in sampling.dsir_weights(
        raw, target, id_col="doc_id", text_col="text", buckets=512,
        hash_fn="md5", deterministic=True,
    ).collect()}
    assert sum(w2[i] for i in range(20)) > sum(w2[100 + i] for i in range(20))

    # Gumbel top-k: deterministic, mostly target-like, rerun-stable
    sel = sampling.dsir_sample(
        raw, target, id_col="doc_id", text_col="text", n=10, buckets=512,
    )
    picked = sorted(r["doc_id"] for r in sel.collect())
    assert picked == sorted(r["doc_id"] for r in sel.collect())
    assert sum(1 for d in picked if d < 100) >= 7  # weights dominate noise
    ranks = {r["doc_id"]: r["sample_rank"] for r in sel.collect()}
    assert sorted(ranks.values()) == list(range(1, 11))

    # facade: select_dsir keeps raw columns only
    c = Corpus(raw, id_col="doc_id", text_col="text").select_dsir(
        Corpus(target, id_col="doc_id", text_col="text"), n=10, buckets=512,
    )
    assert set(c.df.columns) == {"doc_id", "text"}
    assert c.df.count() == 10

    with pytest.raises(ValueError, match="buckets"):
        sampling.hashed_ngram_buckets(
            raw, id_col="doc_id", text_col="text", buckets=1
        )
    with pytest.raises(ValueError, match="n_max"):
        sampling.hashed_ngram_buckets(
            raw, id_col="doc_id", text_col="text", n_max=3
        )
    with pytest.raises(ValueError, match="smoothing_k"):
        sampling.dsir_weights(
            raw, target, id_col="doc_id", text_col="text", smoothing_k=0
        )
    with pytest.raises(ValueError, match="n must be"):
        sampling.dsir_sample(
            raw, target, id_col="doc_id", text_col="text", n=0
        )


def test_dsir_empty_and_whitespace_docs_emit_no_row(spark):
    """Token-less documents (empty string, whitespace-only, NULL) must
    emit no feature row and no weight row — not crash the job. Round-10
    regression: the bigram F.slice length went negative on 0-token docs
    and Spark raised INVALID_PARAMETER_VALUE.LENGTH."""
    from timefence_spark.operators import sampling

    rows = [
        (1, "real document with several words here"),
        (2, ""),            # empty
        (3, "   \t  \n "),  # whitespace-only
        (4, None),          # NULL
        (5, "solo"),        # single token: no bigrams, unigram only
        (6, "another normal document body with words"),
    ]
    raw = spark.createDataFrame(rows, "doc_id long, text string")
    target = spark.createDataFrame(
        [(10, "real document words"), (11, "normal document words")],
        "doc_id long, text string",
    )

    feats = sampling.hashed_ngram_buckets(
        raw, id_col="doc_id", text_col="text", buckets=128
    )
    ids_with_feats = {r["doc_id"] for r in feats.select("doc_id").distinct().collect()}
    assert ids_with_feats == {1, 5, 6}

    w = sampling.dsir_weights(
        raw, target, id_col="doc_id", text_col="text", buckets=128
    )
    assert {r["doc_id"] for r in w.collect()} == {1, 5, 6}

    # sampling over a corpus containing degenerate docs still works and
    # never selects them
    sel = sampling.dsir_sample(
        raw, target, id_col="doc_id", text_col="text", n=3, buckets=128
    )
    assert {r["doc_id"] for r in sel.collect()} <= {1, 5, 6}


def test_dsir_sample_partitioning_invariant(spark):
    """deterministic=True makes DSIR selection a pure function of
    (corpus, target, salt): identical ids and ranks from a 1-partition
    and a 7-partition layout of the same data."""
    from timefence_spark.operators import sampling

    rows = [(i, f"document number {i} about topic{i % 5} with words "
                f"shared across the corpus body text") for i in range(60)]
    raw = spark.createDataFrame(rows, "doc_id long, text string")
    target = raw.where("doc_id % 5 = 0")

    def pick(df):
        return sorted(
            (r["doc_id"], r["sample_rank"])
            for r in sampling.dsir_sample(
                df, target, id_col="doc_id", text_col="text", n=15,
                buckets=256, deterministic=True,
            ).collect()
        )

    assert pick(raw.coalesce(1)) == pick(raw.repartition(7))
