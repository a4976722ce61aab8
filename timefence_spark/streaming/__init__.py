"""Structured Streaming extensions (beyond reference parity).

The reference is batch-only (SURVEY.md §2.9); its ``embargo`` is the static
analogue of a streaming watermark. This package carries the same temporal
invariant — ``feature_time < label_time - embargo`` — into Structured
Streaming:

* :func:`streaming_asof_join` — stateful stream-stream point-in-time join
  (``applyInPandasWithState``, watermark-driven emission).
* :func:`stream_static_asof_join` — stateless broadcast PIT join of a label
  stream against a small static feature table (``mapInPandas``).
* :func:`flag_leaks` / :func:`leak_counts` — streaming temporal audit.
* :func:`streaming_exact_dedup` — first-arrival content dedup across
  micro-batches (state per distinct hash, optionally watermark-bounded).
* :func:`near_dedup_batch` / :func:`streaming_near_dedup` — incremental
  MinHash-LSH NEAR-dedup via a band-registry state table + foreachBatch
  (doc-level ANY over band-keyed state is not expressible as one
  stateful operator; see streaming/near_dedup.py).
"""

from timefence_spark.streaming.asof import (
    stream_static_asof_join,
    streaming_asof_join,
)
from timefence_spark.streaming.audit import flag_leaks, leak_counts
from timefence_spark.streaming.dedup import streaming_exact_dedup
from timefence_spark.streaming.near_dedup import (
    near_dedup_batch,
    plan_near_dedup_batch,
    streaming_near_dedup,
)

__all__ = [
    "streaming_asof_join",
    "stream_static_asof_join",
    "flag_leaks",
    "leak_counts",
    "streaming_exact_dedup",
    "near_dedup_batch",
    "plan_near_dedup_batch",
    "streaming_near_dedup",
]
