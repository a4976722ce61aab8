"""WARC crawl-archive ingestion: framing, gzip members, error paths."""

from __future__ import annotations

import gzip

import pytest
from pyspark.sql import functions as F

from timefence_spark.sources import warc as W


def test_parse_warc_records_and_http_body(spark):
    html = b"<html><body><p>hello crawl</p></body></html>"
    http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html
    recs = [
        ("warcinfo", "urn:none", b"software: test"),
        ("response", "http://a.example/x", http),
        ("response", "http://b.example/y", b"no http headers here"),
    ]
    for gz in (False, True):
        blob = W.build_warc(recs, gzip_members=gz)
        df = spark.createDataFrame(
            [(1, bytearray(blob)), (2, None), (3, bytearray(b""))],
            "fid long, content binary",
        )
        rows = (
            W.parse_warc(df, id_col="fid", binary_col="content")
            .orderBy("record_idx")
            .collect()
        )
        assert [r["fid"] for r in rows] == [1, 1, 1]
        assert [r["warc_type"] for r in rows] == [
            "warcinfo", "response", "response",
        ]
        assert rows[1]["target_uri"] == "http://a.example/x"
        assert rows[1]["content_length"] == len(http)
        assert bytes(rows[1]["payload"]) == http
        body = (
            W.parse_warc(df, id_col="fid", binary_col="content")
            .where("record_idx = 1")
            .select(W.http_body(F.col("payload")).alias("b"))
            .head()["b"]
        )
        assert body == html.decode()
        # non-HTTP payload passes through http_body whole
        raw = (
            W.parse_warc(df, id_col="fid", binary_col="content")
            .where("record_idx = 2")
            .select(W.http_body(F.col("payload")).alias("b"))
            .head()["b"]
        )
        assert raw == "no http headers here"


def test_parse_warc_error_paths():
    good = W.build_warc([("response", "http://x", b"abc")])
    # truncated payload
    with pytest.raises(ValueError, match="truncated"):
        list(W._parse_warc_bytes(good[:-7]))
    # wrong magic
    with pytest.raises(ValueError, match="record start"):
        list(W._parse_warc_bytes(b"HTTP/1.1 200 OK\r\n\r\n"))
    # missing Content-Length
    bad = good.replace(b"Content-Length", b"X-Length")
    with pytest.raises(ValueError, match="Content-Length"):
        list(W._parse_warc_bytes(bad))
    # unreasonable Content-Length is refused before allocating
    huge = good.replace(b"Content-Length: 3", b"Content-Length: 999999999999")
    with pytest.raises(ValueError, match="unreasonable"):
        list(W._parse_warc_bytes(huge))
    # unterminated header block
    with pytest.raises(ValueError, match="unterminated"):
        list(W._parse_warc_bytes(b"WARC/1.0\r\nWARC-Type: x\r\n"))
    # gzip member walk: two members, second plain-concatenated record
    two = gzip.compress(good, mtime=0) + gzip.compress(good, mtime=0)
    assert len(list(W._parse_warc_bytes(two))) == 2


def test_read_warc_files(spark, tmp_path):
    recs = [("response", "http://a/x", b"payload-a")]
    p = tmp_path / "crawl"
    p.mkdir()
    (p / "a.warc.gz").write_bytes(W.build_warc(recs, gzip_members=True))
    (p / "b.warc").write_bytes(W.build_warc(recs))
    out = W.read_warc(spark, str(p)).collect()
    assert len(out) == 2
    assert {r["warc_file"].rsplit("/", 1)[-1] for r in out} == {
        "a.warc.gz", "b.warc",
    }


def test_corpus_from_crawl(spark, tmp_path):
    """Corpus.from_crawl: WARC files -> stripped text corpus with stable
    per-record ids and surviving URIs, ready for the cleaning stages."""
    from timefence_spark.corpus import Corpus

    html = b"<html><body><h1>T</h1><p>hello &amp; crawl</p></body></html>"
    http = b"HTTP/1.1 200 OK\r\n\r\n" + html
    p = tmp_path / "crawl"
    p.mkdir()
    (p / "a.warc.gz").write_bytes(
        W.build_warc(
            [
                ("warcinfo", "urn:none", b"x"),
                ("response", "http://a/x", http),
                ("response", "http://a/y", http),
            ],
            gzip_members=True,
        )
    )
    c = Corpus.from_crawl(spark, str(p))
    rows = c.df.collect()
    assert len(rows) == 2  # warcinfo dropped
    assert {r["target_uri"] for r in rows} == {"http://a/x", "http://a/y"}
    assert all(r["text"] == "T\nhello & crawl" for r in rows)
    assert len({r["doc_id"] for r in rows}) == 2  # unique stable ids
    # chains into the normal pipeline
    assert c.dedup_exact().df.count() == 1  # same text -> one survivor


def test_read_jsonl(spark, tmp_path):
    from timefence_spark.sources.readers import read_jsonl

    f = tmp_path / "docs.jsonl"
    f.write_text(
        '{"doc_id": 1, "text": "hello", "lang": "en"}\n'
        '{"doc_id": 2, "text": "welt", "lang": "de"}\n'
        '{"doc_id": 3}\n'
    )
    df = read_jsonl(
        spark, str(f), schema="doc_id long, text string, lang string",
        text_col="text",
    )
    rows = {r["doc_id"]: r for r in df.collect()}
    assert rows[1]["text"] == "hello"
    assert rows[3]["text"] is None  # missing field NULL-fills under schema
    with pytest.raises(ValueError, match="no field"):
        read_jsonl(spark, str(f), schema="doc_id long", text_col="text")
