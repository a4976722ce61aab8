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


def mmr_rerank(
    candidates: DataFrame,
    vectors: DataFrame,
    *,
    query_col: str = "query_id",
    neighbor_col: str = "neighbor_id",
    rel_col: str = "cosine",
    vec_id: str = "vec_id",
    vec_col: str = "embedding",
    lambda_: float = 0.5,
    k: int = 10,
    normalize: bool = True,
) -> DataFrame:
    """Maximal Marginal Relevance rerank (Carbonell & Goldstein 1998):
    greedily re-order each query's candidate list to trade relevance
    against redundancy — step t picks the unselected candidate
    maximizing ``lambda * rel(d) - (1 - lambda) * max_{s in S}
    sim(d, s)`` — the standard diversification pass over any of this
    package's retrievers' (query, neighbor, rel) output, with
    candidate vectors joined from ``vectors`` for the pairwise cosine.

    **Integer-exact selection.** Relevance and pairwise similarity
    quantize to micros at ONE rounding site each
    (``floor(x * 1e6 + 0.5)`` as BIGINT — the unigram trainer's rule),
    and lambda quantizes to ``lam = floor(lambda * 1e6 + 0.5)``, so
    every greedy comparison is the integer
    ``lam * rel_m - (1e6 - lam) * max_sim_m`` with ties broken by
    neighbor ascending — bit-portable to a SQL replay. Returns
    ``(query, neighbor, mmr_units, rank)``, rank 1..k in selection
    order; ``mmr_units`` is the score AT selection time.

    Candidates with a NULL relevance, no vector row, or a degenerate
    vector (NULL, NULL elements, zero norm under ``normalize``) are
    dropped before selection — they cannot participate in the
    similarity term. ``normalize=True`` (default) L2-normalizes
    vectors so the dot IS the cosine; pass False when the vectors are
    pre-normalized.

    100 TB shape: candidate lists are top-N-bounded per query, so ONE
    equi-join attaches vectors (broadcast/AQE — the corpus never
    scans beyond the matched ids), ONE (query) aggregation gathers
    each list, and the greedy loop runs as a pure-JVM ``aggregate``
    fold over the bounded array — k * N * k * dim flops per QUERY
    row, zero Python, no N^2 shuffle. The heavy lifting stays in the
    retriever that produced the candidates."""
    if not 0.0 <= lambda_ <= 1.0:
        raise ValueError(f"lambda_ must be in [0, 1], got {lambda_}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    import math

    lam = int(math.floor(lambda_ * 1_000_000 + 0.5))
    rest = 1_000_000 - lam

    # Vector hygiene (double cast, degenerate-row drop) and the L2
    # normalization run AFTER the id equi-join, on the matched candidate
    # rows only — candidate lists are top-N-bounded per query, so this
    # is a few hundred rows where the corpus side is unbounded. The
    # corpus scan projects only (id, vector); at 100 TB the
    # normalize-then-join order paid a full-corpus interpreted-HOF pass
    # (norm fold + divide transform per row) for rows the join then
    # discarded (round-13 optimization, guide §1.2/§4: don't compute
    # things you throw away).
    vecs = vectors.select(
        F.col(vec_id).alias("__vid"), F.col(vec_col).alias("__raw")
    )
    dvec = F.transform(F.col("__raw"), lambda x: x.cast("double"))
    ok = (
        F.col("__raw").isNotNull()
        & (F.size(F.filter(dvec, lambda x: x.isNull())) == 0)
        & (F.size(dvec) > 0)
    )
    matched = (
        candidates.where(F.col(rel_col).isNotNull())
        .select(
            F.col(query_col).alias("query_id"),
            F.col(neighbor_col).alias("neighbor_id"),
            F.expr(
                f"CAST(floor(CAST(`{rel_col}` AS DOUBLE) * 1000000D "
                "+ 0.5D) AS BIGINT)"
            ).alias("__rm"),
        )
        .join(vecs, F.col("neighbor_id") == F.col("__vid"))
        .select("query_id", "neighbor_id", "__rm",
                F.when(ok, dvec).alias("__v0"))
    )
    if normalize:
        # staged norm: an inline norm inside the transform lambda would
        # re-fold per element (HOF lambdas are not CSE'd)
        matched = (
            matched.withColumn(
                "__n",
                F.sqrt(
                    F.aggregate(
                        F.transform(F.col("__v0"), lambda x: x * x),
                        F.lit(0.0),
                        lambda a, x: a + x,
                    )
                ),
            )
            .withColumn(
                "__v",
                F.when(
                    F.col("__n") > 0,
                    F.transform(
                        F.col("__v0"), lambda x: x / F.col("__n")
                    ),
                ),
            )
            .drop("__v0", "__n")
        )
    else:
        matched = matched.withColumnRenamed("__v0", "__v")
    # The degenerate-row drop rides INSIDE collect_list (NULL entries
    # are skipped by collect_list) instead of a where(__v IS NOT NULL):
    # a plain filter references only build-side-derived columns, so
    # Catalyst pushes it through the join into the corpus scan — which
    # re-evaluates the cast/null-check/norm HOF chain once per CORPUS
    # row as a scan filter, exactly the full-corpus pass the join
    # reorder exists to avoid. An aggregate argument cannot be pushed.
    # Queries whose candidates are all degenerate yield an empty
    # __cands, and the posexplode of the empty fold output drops them —
    # same rows as the filter produced.
    grouped = matched.groupBy("query_id").agg(
        F.sort_array(
            F.collect_list(
                F.when(
                    F.col("__v").isNotNull(),
                    F.struct(
                        F.col("neighbor_id").alias("n"),
                        F.col("__rm").alias("rm"),
                        F.col("__v").alias("v"),
                    ),
                )
            )
        ).alias("__cands")
    )
    simm = (
        "coalesce(array_max(transform(acc.sel, s -> "
        "CAST(floor(aggregate(zip_with(c.v, s, (x, y) -> x * y), 0D, "
        "(a, p) -> a + p) * 1000000D + 0.5D) AS BIGINT))), 0L)"
    )
    # Tie-break: equal-utility candidates resolve to the smallest neighbor
    # id (documented asc order). array_min over (-u, n) negates the BIGINT
    # utility — never the id — so string/any orderable neighbor ids work.
    argmax = (
        "array_min(transform(transform(acc.rem, c -> named_struct("
        f"'u', {lam}L * c.rm - {rest}L * ({simm}), "
        "'n', c.n, 'v', c.v)), s -> named_struct("
        "'nu', -s.u, 'n', s.n, 'u', s.u, 'v', s.v)))"
    )
    step = (
        f"element_at(transform(array({argmax}), best -> named_struct("
        "'rem', filter(acc.rem, x -> x.n != best.n), "
        "'sel', array_append(acc.sel, best.v), "
        "'out', array_append(acc.out, "
        "named_struct('n', best.n, 'u', best.u)))), 1)"
    )
    fold = (
        f"aggregate(sequence(1, {int(k)}), "
        "named_struct("
        "'rem', `__cands`, "
        "'sel', filter(transform(`__cands`, c -> c.v), x -> false), "
        "'out', filter(transform(`__cands`, c -> "
        "named_struct('n', c.n, 'u', 0L)), x -> false)), "
        f"(acc, _i) -> IF(size(acc.rem) = 0, acc, {step}), "
        "a -> a.out)"
    )
    return (
        grouped.select(
            "query_id", F.posexplode(F.expr(fold)).alias("__r0", "__s")
        )
        .select(
            "query_id",
            F.col("__s.n").alias("neighbor_id"),
            F.col("__s.u").alias("mmr_units"),
            (F.col("__r0") + 1).cast("int").alias("rank"),
        )
    )
