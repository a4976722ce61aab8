"""Rank fusion for hybrid retrieval — reciprocal rank fusion (RRF).

Cormack et al. 2009: fuse the ranked lists of several retrievers by
``score(d) = sum_i w_i / (k + rank_i(d))`` — the standard way to
combine dense ANN, lexical (BM25), and compressed-index retrievers
without score calibration (ranks are comparable where raw scores are
not). This module fuses the outputs of this package's retrieval
operators (cosine_topk / pq_topk / ivf_pq_topk / bm25_score ranks /
...): anything with (query, neighbor, rank) columns.

Integer-exact scores: each term quantizes to "RRF micros" —
``floor(1e9 * w / (k + rank) + 0.5)`` as BIGINT — so the fused score
is an INTEGER SUM, immune to float-summation order (a groupBy sum of
doubles is not deterministic in its low bits; an external SQL oracle
replays integer sums bit-for-bit). The term itself is one IEEE double
division + floor, identical on any engine given the same (w, k, rank).

100 TB shape: retriever outputs are top-k-bounded per query, so the
fusion input is |queries| * k * n_retrievers rows regardless of corpus
size — one unionByName (no shuffle), ONE (query, neighbor) aggregation
shuffle of (two ids, one long), one per-query window over <=
k * n_retrievers rows. The heavy lifting stays in the retrievers.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

RRF_MICROS = 1_000_000_000


def rrf_fuse(
    results: list[DataFrame],
    *,
    k: int = 60,
    top_k: int = 10,
    weights: list[float] | None = None,
    query_col: str = "query_id",
    neighbor_col: str = "neighbor_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Fuse ranked retriever outputs into
    ``(query, neighbor, rrf_micros, n_retrievers, rank)``:
    ``rrf_micros = sum_i floor(1e9 * w_i / (k + rank_i) + 0.5)`` over
    the retrievers that returned the pair (a missing pair contributes
    nothing — standard RRF), ``n_retrievers`` counts them, and ``rank``
    orders by (rrf_micros desc, neighbor asc) per query, keeping
    ``top_k``. ``k=60`` is the Cormack et al. constant; ``weights``
    (default all 1.0) bias trusted retrievers."""
    if not results:
        raise ValueError("results must name at least one retriever output")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    if weights is not None and len(weights) != len(results):
        raise ValueError(
            f"weights has {len(weights)} entries for {len(results)} "
            "retrievers"
        )
    terms = []
    for i, df in enumerate(results):
        w = 1.0 if weights is None else float(weights[i])
        terms.append(
            df.select(
                F.col(query_col).alias("query_id"),
                F.col(neighbor_col).alias("neighbor_id"),
                F.expr(
                    f"CAST(floor({float(RRF_MICROS)!r} * {w!r} / "
                    f"({int(k)} + `{rank_col}`) + 0.5) AS BIGINT)"
                ).alias("__t"),
            )
        )
    union = reduce(lambda a, b: a.unionByName(b), terms)
    scored = union.groupBy("query_id", "neighbor_id").agg(
        F.sum("__t").alias("rrf_micros"),
        F.count(F.lit(1)).alias("n_retrievers"),
    )
    win = Window.partitionBy("query_id").orderBy(
        F.desc("rrf_micros"), F.asc("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(win)).where(
        F.col("rank") <= top_k
    )
