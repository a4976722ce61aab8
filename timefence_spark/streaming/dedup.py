"""Streaming exact deduplication — incremental corpus ingestion.

A crawl/ingest pipeline appends documents continuously; exact dedup must
drop re-fetched content ACROSS micro-batches, not just within one. Spark's
``dropDuplicates`` on a streaming DataFrame keeps first-arrival state per
key forever; ``dropDuplicatesWithinWatermark`` bounds that state by an
event-time horizon. This module wraps both behind a content-hash key.

100 TB shape: state is one entry per DISTINCT content hash (not per row)
— with a watermark it is further bounded to the horizon's distinct
content. At large hash cardinality run the RocksDB state store provider
(see docs/concepts/scale.md); the hash itself is computed scan-side, so
the only shuffle is the state-store partitioning on the hash key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _content_hash(cols: list[str], hash_fn: str) -> Column:
    """Content hash of the column values.

    Single column: hash the value directly (NULL -> NULL hash; streaming
    dropDuplicates treats NULL keys as equal, so all-null contents dedup
    together). Multiple columns: hash each column separately and hash the
    fixed-width concatenation — NULLs get their own token, so
    ("a", NULL) / (NULL, "a") / ("a", "") all hash differently
    (``concat_ws`` alone SKIPS null arguments and would collide them)."""
    if hash_fn not in ("md5", "xxhash64"):
        raise ValueError(f"Unknown hash_fn '{hash_fn}' (md5|xxhash64).")

    def h(col: Column) -> Column:
        if hash_fn == "md5":
            return F.md5(col.cast("string"))
        return F.xxhash64(col.cast("string")).cast("string")

    if len(cols) == 1:
        return h(F.col(cols[0]))
    tokens = [
        F.coalesce(h(F.col(c)), F.lit("<NULL>")) for c in cols
    ]
    return h(F.concat_ws(":", *tokens))


def streaming_exact_dedup(
    stream: DataFrame,
    *,
    content_cols: str | list[str],
    time_col: str | None = None,
    watermark: str | None = None,
    hash_fn: str = "md5",
    hash_col: str = "content_hash",
) -> DataFrame:
    """First-arrival exact dedup of a document stream by content hash.

    Appends ``hash_col`` and drops every later row with a hash already
    seen. For a single content column the hash is ``hash_fn(value)``
    directly; for multiple columns each value is hashed on its own (NULLs
    become the literal ``<NULL>`` marker), the per-column hash tokens are
    joined with ``:``, and that string is hashed again — so the value is
    reproducible externally as ``h(h(c1) : h(c2) : ...)``.

    * ``watermark=None`` — global dedup: state holds every distinct hash
      seen since the query started. Right for bounded replays and modest
      cardinalities; pair with RocksDB state at scale.
    * ``watermark='48 hours'`` (requires ``time_col``) — dedup within the
      watermark horizon via ``dropDuplicatesWithinWatermark``: re-fetches
      typically cluster in time, and state is pruned as the watermark
      advances — the unbounded-ingest configuration.

    Within one micro-batch the surviving row for a duplicated hash is
    partition-order dependent (Spark keeps an arbitrary first); across
    micro-batches arrival order decides. Downstream aggregates on the
    hash column are deterministic either way.

    STATE COMPATIBILITY: the hash format changed in round 6 (see
    CHANGELOG.md) — single-column now hashes the value directly,
    multi-column nests per-column hashes. State written by the earlier
    format never matches the new hashes, so restarting an existing
    query after an upgrade silently re-admits previously-seen documents.
    Restart from a fresh checkpoint location after upgrading."""
    if isinstance(content_cols, str):
        content_cols = [content_cols]
    out = stream.withColumn(hash_col, _content_hash(content_cols, hash_fn))
    if watermark is not None:
        if time_col is None:
            raise ValueError("watermark requires time_col")
        # Watermarks require TIMESTAMP (LTZ); NTZ inputs are cast through
        # a helper column (value-preserving under the engine's pinned UTC
        # session timezone — same device as streaming/asof.py).
        out = (
            out.withColumn("__event_time", F.col(time_col).cast("timestamp"))
            .withWatermark("__event_time", watermark)
            .dropDuplicatesWithinWatermark([hash_col])
            .drop("__event_time")
        )
        return out
    return out.dropDuplicates([hash_col])
