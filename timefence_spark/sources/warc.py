"""WARC (ISO 28500) crawl-archive ingestion — the container Common-Crawl
style pipelines actually read.

A WARC file is a concatenation of records, each ``WARC/1.0`` + CRLF
headers + blank line + ``Content-Length`` payload bytes + CRLF CRLF;
real crawl archives store each record as its own gzip member, so a plain
``gzip.decompress`` only yields the first record — :func:`_gunzip_members`
walks every member with ``zlib.decompressobj``.

100 TB shape: one crawl FILE is the unit of parallelism (they ship at a
fixed ~1 GB, so file-level splitting is the format's own design for
distributed reads — records are not individually seekable without the
side index). :func:`read_warc` maps Spark's ``binaryFile`` source through
an Arrow-batched ``mapInPandas`` parser, so payload bytes move worker-side
only; :func:`parse_warc` is the same parser over an in-memory binary
column for blob-shaped ingestion (e.g. archives landed in a table). The
HTTP-response helper :func:`http_body` stays a pure Spark expression, so
the header strip costs no Python.

Format reference: ISO 28500 / the public WARC 1.0/1.1 specification;
gzip member framing per RFC 1952.
"""

from __future__ import annotations

import zlib
from typing import Iterator

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

WARC_SCHEMA = (
    "record_idx int, warc_type string, target_uri string, "
    "record_id string, content_length long, payload binary"
)

# Hard per-record payload cap: a corrupt Content-Length must not ask one
# worker for a multi-GB allocation. Real response records are page-sized.
MAX_RECORD_BYTES = 64 * 1024 * 1024


def _gunzip_members(data: bytes) -> bytes:
    """Concatenated-gzip-member decompression (each WARC record is its
    own member in .warc.gz): loop ``decompressobj`` over unused_data.
    Non-gzip input is returned unchanged."""
    if len(data) < 2 or data[:2] != b"\x1f\x8b":
        return data
    out = []
    rest = data
    while rest[:2] == b"\x1f\x8b":
        d = zlib.decompressobj(wbits=31)
        out.append(d.decompress(rest))
        out.append(d.flush())
        rest = d.unused_data
    return b"".join(out)


def _parse_warc_bytes(blob: bytes) -> Iterator[tuple]:
    """Yield (record_idx, warc_type, target_uri, record_id,
    content_length, payload) for every record in one (possibly .gz)
    WARC blob. Malformed framing raises ValueError — a crawl archive
    with broken record lengths cannot be resynchronized safely."""
    data = _gunzip_members(blob)
    pos = 0
    idx = 0
    n = len(data)
    while pos < n:
        # tolerate inter-record padding/newlines
        while pos < n and data[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            break
        if not data.startswith(b"WARC/", pos):
            raise ValueError(f"bad WARC record start at byte {pos}")
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            raise ValueError("unterminated WARC header block")
        headers: dict[str, str] = {}
        for line in data[pos:hdr_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("ascii", "replace")] = (
                v.strip().decode("utf-8", "replace")
            )
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError) as exc:
            raise ValueError("WARC record missing Content-Length") from exc
        if not 0 <= length <= MAX_RECORD_BYTES:
            raise ValueError(f"unreasonable WARC Content-Length {length}")
        body_start = hdr_end + 4
        payload = data[body_start : body_start + length]
        if len(payload) != length:
            raise ValueError("truncated WARC payload")
        yield (
            idx,
            headers.get("warc-type"),
            headers.get("warc-target-uri"),
            headers.get("warc-record-id"),
            length,
            bytes(payload),
        )
        idx += 1
        pos = body_start + length


def parse_warc(
    df: DataFrame, *, id_col: str, binary_col: str
) -> DataFrame:
    """Explode a binary column of WARC blobs (one blob = one crawl file,
    plain or per-record-gzip) into one row per record:
    (id, record_idx, warc_type, target_uri, record_id, content_length,
    payload). NULL/empty blobs yield no rows; a malformed blob fails its
    task loudly (framing errors are data corruption, not noise —
    pre-filter with a try-parse if the archive set is dirty)."""
    import pandas as pd

    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = f"{id_col} {id_type}, {WARC_SCHEMA}"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, blob in zip(pdf[id_col], pdf[binary_col]):
                if blob is None or len(blob) == 0:
                    continue
                for rec in _parse_warc_bytes(bytes(blob)):
                    rows.append((rid, *rec))
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "record_idx", "warc_type", "target_uri",
                    "record_id", "content_length", "payload",
                ],
            )

    return df.select(id_col, binary_col).mapInPandas(gen, out_schema)


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Read .warc / .warc.gz files under ``path`` into one row per
    record (plus the source file path as ``warc_file``). File-level
    parallelism — the format's own unit of distribution."""
    files = spark.read.format("binaryFile").load(path).select(
        F.col("path").alias("warc_file"), F.col("content")
    )
    return parse_warc(files, id_col="warc_file", binary_col="content")


def http_body(payload: Column) -> Column:
    """The body of an HTTP response payload as UTF-8 text: everything
    after the first CRLF CRLF (response records carry status line +
    headers before the HTML). Pure expression — no Python in the path.
    Payloads with no header block (non-HTTP records) pass through
    whole."""
    txt = payload.cast("string")
    sep = F.instr(txt, "\r\n\r\n")
    return F.when(sep > 0, txt.substr(sep + 4, F.length(txt))).otherwise(txt)


def build_warc(
    records: list[tuple[str, str, bytes]], *, gzip_members: bool = False
) -> bytes:
    """Assemble a WARC blob from (warc_type, target_uri, payload) records
    — the synthesis half used by tests and the differential oracle; the
    output is spec-shaped enough for any WARC reader. ``gzip_members``
    compresses each record as its own gzip member (the .warc.gz
    convention)."""
    import gzip as _gzip

    out = []
    for i, (wtype, uri, payload) in enumerate(records):
        rec = (
            b"WARC/1.0\r\n"
            + f"WARC-Type: {wtype}\r\n".encode()
            + f"WARC-Target-URI: {uri}\r\n".encode()
            + f"WARC-Record-ID: <urn:rec:{i}>\r\n".encode()
            + f"Content-Length: {len(payload)}\r\n".encode()
            + b"\r\n"
            + payload
            + b"\r\n\r\n"
        )
        out.append(
            _gzip.compress(rec, mtime=0) if gzip_members else rec
        )
    return b"".join(out)
