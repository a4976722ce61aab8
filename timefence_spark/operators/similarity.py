"""Similarity search over embedding columns (array<float>).

* cosine_topk        — exact brute-force top-k; the correctness baseline.
                       Broadcast the query side; the corpus is never shuffled.
* rp_lsh_topk        — random-hyperplane LSH: bucket by sign-bit signature,
                       search only same-bucket candidates. The scale path:
                       candidate count ~ N / 2^bits per table.
* ivf_topk           — inverted-file index: deterministic sampled centroids,
                       assign corpus to nearest centroid, probe the query's
                       closest ``nprobe`` lists.
* pq_train/encode/topk — product quantization: vectors compress to m small
                       codes, queries score by asymmetric distance over the
                       codes; ivf_pq_topk / ivf_pq_build_index compose the
                       probe and compression levers (FAISS-style IVF-PQ).
* sq_train/encode/topk — scalar quantization: per-dimension 8-bit affine
                       codes, 4x memory, reconstructed-cosine scan.
* bq_train/encode/topk — binary quantization: 1 bit/dim sign codes packed
                       into 32-bit BIGINT lanes, 32x memory; Hamming
                       (XOR+popcount) search, optional exact rerank.

Vector math comes in two interchangeable kernels:

* ``'expr'`` — pure Spark expressions (zip_with + aggregate fold, sequential
  double accumulation, deterministic; bit-exact vs external SQL oracles).
* ``'arrow'`` — one numpy/BLAS matmul (or einsum) per Arrow batch, ~10x the
  per-row throughput of the interpreted higher-order-function fold. Scores
  can differ from the fold in the last ulp; rounded outputs (the default)
  are identical on non-adversarial data.

Degenerate-vector contract (both kernels): NULL or length-mismatched
vectors and zero-norm denominators score NULL (ranks LAST under the
descending top-k order — ``try_divide`` semantics, independent of
spark.sql.ansi.enabled); vectors containing NaN score NaN (Spark ranks NaN
FIRST, above every real number). The one asymmetry: the arrow kernels pick
the expected width from the first valid query vector, so an off-width pair
that the fold would score against a same-width partner scores NULL instead
— only observable with ragged corpora.
"""

from __future__ import annotations

import logging
import warnings

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timefence_spark._checkpoint import pin
from timefence_spark.operators.asof import (
    BROADCAST_BYTES_THRESHOLD,
    estimated_size_bytes,
)

logger = logging.getLogger(__name__)

# Fallback probe cap for the arrow kernel's driver-side query collect when
# Catalyst has no size estimate: |Q| rows x 64 float64 dims ~ 100 MB at
# 200k — the same order as BROADCAST_BYTES_THRESHOLD.
ARROW_QUERY_ROW_CAP = 200_000


def _arrow_query_side_ok(queries: DataFrame) -> bool:
    """Gate for collecting the query side to the driver (same boundedness
    policy as :func:`_gate_broadcast`): Catalyst's size estimate when it
    has one, else a bounded ``limit().count()`` probe. Returns False when
    the query side is too large — callers degrade to the ``'expr'`` plan
    instead of OOMing the driver."""
    est = estimated_size_bytes(queries)
    if est is not None:
        return est <= BROADCAST_BYTES_THRESHOLD
    return queries.limit(ARROW_QUERY_ROW_CAP + 1).count() <= ARROW_QUERY_ROW_CAP


def _gate_broadcast(df: DataFrame, flag: bool | None) -> DataFrame:
    """Broadcast hint with a safety gate (same policy as the as-of join).

    ``True`` forces the hint (caller override), ``False`` suppresses it;
    the default ``None`` hints only when Catalyst's size estimate fits
    under :data:`BROADCAST_BYTES_THRESHOLD`, so an unexpectedly large
    query side degrades to a shuffle join instead of hitting the 8 GB
    broadcast cap or an executor OOM."""
    if flag is False:
        return df
    if flag is None:
        est = estimated_size_bytes(df)
        if est is None or est > BROADCAST_BYTES_THRESHOLD:
            return df
    return F.broadcast(df)


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL (not an ANSI error) on zero-norm vectors.

    ``try_divide`` keeps the pre-ANSI divide-by-zero-is-NULL semantics
    under Spark 4's default ansi.enabled=true: a zero-norm vector yields a
    NULL score that ranks last in descending top-k order, instead of
    failing the whole job."""
    return F.try_divide(dot(a, b), l2_norm(a) * l2_norm(b))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    query_id: str,
    corpus_id: str,
    query_vec: str = "embedding",
    corpus_vec: str = "embedding",
    k: int = 10,
    round_to: int | None = 6,
    broadcast_queries: bool | None = None,
    compute: str = "expr",
) -> DataFrame:
    """Exact top-k by cosine: (query_id, neighbor_id, cosine, rank).

    Self-matches (same id) are excluded. The query side is broadcast (when
    its size estimate allows — see :func:`_gate_broadcast`) so the big
    corpus streams through map-side — one window shuffle keyed by query_id
    on the (|Q| x |C|) scored set; keep |Q| bounded or pre-filter the
    corpus (see rp_lsh_topk / ivf_topk).

    ``compute='arrow'`` switches the scoring kernel to one numpy matmul
    per Arrow batch with per-batch top-k pruning (see
    :func:`_cosine_topk_arrow`): the shuffled candidate set shrinks from
    |Q| x |C| rows to |Q| x k per batch, and the per-row cost drops from
    an interpreted higher-order-function fold to BLAS. Use it when the
    corpus is large or vectors are wide; ``'expr'`` stays the pure-JVM,
    oracle-exact default (sequential-fold float semantics match external
    SQL engines bit-for-bit). The arrow kernel collects the query side to
    the driver, so it is gated the same way the broadcast is: past
    :data:`BROADCAST_BYTES_THRESHOLD` (or :data:`ARROW_QUERY_ROW_CAP`
    rows when Catalyst has no size estimate) the call degrades to the
    ``'expr'`` plan instead of OOMing the driver."""
    if compute == "arrow":
        if _arrow_query_side_ok(queries):
            return _cosine_topk_arrow(
                queries, corpus, query_id=query_id, corpus_id=corpus_id,
                query_vec=query_vec, corpus_vec=corpus_vec, k=k, round_to=round_to,
            )
        logger.warning(
            "cosine_topk(compute='arrow'): query side exceeds the driver-"
            "collect gate (%d bytes / %d rows); falling back to the 'expr' "
            "shuffle plan.",
            BROADCAST_BYTES_THRESHOLD,
            ARROW_QUERY_ROW_CAP,
        )
    q = _gate_broadcast(
        queries.select(
            F.col(query_id).alias("query_id"), F.col(query_vec).alias("__qv")
        ),
        broadcast_queries,
    )
    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"), F.col(corpus_vec).alias("__cv")
    )
    score = cosine(F.col("__qv"), F.col("__cv"))
    if round_to is not None:
        score = F.round(score, round_to)
    scored = (
        c.join(q, F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", score.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def _cosine_topk_arrow(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    query_id: str,
    corpus_id: str,
    query_vec: str,
    corpus_vec: str,
    k: int,
    round_to: int | None,
    lsh: dict | None = None,
) -> DataFrame:
    """Vectorized exact scan: the bounded query side is collected to one
    numpy matrix (gated by :func:`_arrow_query_side_ok` — driver transfer
    is O(|Q| x dim)), the corpus streams through ONE matmul per Arrow
    batch, and each batch emits only its per-query top-k candidates under
    the full Spark ordering (NaN first, finite desc, NULL last; ties by
    neighbor_id asc) — a global winner is always in its batch's top-k, so
    batch boundaries cannot drop one. The global re-rank then sees
    O(|Q| x k x batches) rows instead of |Q| x |C|.

    ``lsh={'bits': b, 'tables': t, 'seed': s}`` turns the scan into the
    single-pass RP-LSH plan (see :func:`rp_lsh_topk`): corpus signatures
    are one extra matmul per batch, candidates are pairs sharing any
    table's bucket with a query, and only candidates are ranked/emitted —
    same candidate set and scores as the bucket-join plan, with zero
    candidate shuffles. Off-width/NULL vectors take bucket 0 in every
    table, exactly like the expr signature path.

    Degenerates mirror the ``'expr'`` kernel (see module docstring):
    NULL/off-width vectors and zero-norm denominators -> NULL (ranks
    last), NaN elements -> NaN (ranks first). NaN survives the Arrow
    boundary via a marker column (pandas->Arrow conversion would
    otherwise fold NaN into null).

    Float caveat: numpy sums in a different order than the sequential
    expression fold, so scores can differ in the last ulp — use the
    ``'expr'`` kernel when bit-exact parity with an external SQL oracle
    matters."""
    import numpy as np
    import pandas as pd

    qrows = queries.select(query_id, query_vec).collect()
    spark = queries.sparkSession
    qid_type = queries.schema[query_id].dataType.simpleString()
    nid_type = corpus.schema[corpus_id].dataType.simpleString()
    out_schema = (
        f"query_id {qid_type}, neighbor_id {nid_type}, "
        "cosine double, __nan boolean"
    )
    if not qrows:
        empty = spark.createDataFrame([], out_schema).drop("__nan")
        return empty.withColumn("rank", F.lit(1)).where(F.lit(False))
    qids = np.array([r[0] for r in qrows])
    qvecs = [r[1] for r in qrows]
    # Expected width = first valid query vector's length; queries that are
    # NULL or off-width score NULL against everything (ranked last).
    dim = next((len(v) for v in qvecs if v is not None), 0)
    qvalid = np.fromiter(
        (v is not None and len(v) == dim for v in qvecs), dtype=bool, count=len(qvecs)
    )
    if qvalid.any():
        qmat = np.vstack(
            [np.asarray(v, dtype=np.float64) for v, ok in zip(qvecs, qvalid) if ok]
        )
        qnorm = np.linalg.norm(qmat, axis=1)
    else:
        qmat = np.zeros((0, dim))
        qnorm = np.zeros(0)
    # Column j of the score matrix corresponds to the j-th VALID query.
    valid_qpos = np.flatnonzero(qvalid)

    nq = len(qids)
    planes_flat = None
    if lsh is not None:
        bits, tables = lsh["bits"], lsh["tables"]
        planes_flat = np.array(
            [_hyperplanes(dim, bits, lsh["seed"] + t) for t in range(tables)],
            dtype=np.float64,
        ).reshape(tables * bits, max(dim, 1))
        powers = (1 << np.arange(bits)).astype(np.int64)
        # (nq, tables) query buckets; invalid queries take bucket 0 per
        # table, mirroring the expr signature path.
        qsig = np.zeros((nq, tables), dtype=np.int64)
        if qvalid.any():
            signs = (qmat @ planes_flat.T) >= 0
            qsig[qvalid] = (
                signs.reshape(len(qmat), tables, bits).astype(np.int64) @ powers
            )
        # Invalid corpus rows sit in bucket 0 of every table: they are
        # candidates of exactly the queries with any bucket-0 table.
        bad_row_cand = np.any(qsig == 0, axis=1)  # (nq,)

    def _emit_topk(ids, rank_val, score, is_nan, is_null, qid, out):
        """Batch-local top-k under (rank_val desc, id asc); appends row
        arrays to ``out``."""
        keep = ids != qid
        if not keep.any():
            return
        ids = ids[keep]
        rank_val = rank_val[keep]
        score = score[keep]
        is_nan = is_nan[keep]
        is_null = is_null[keep]
        # Two-pass stable argsort == lexsort by (rank_val desc, id asc),
        # but also works for object-dtype (string) id columns.
        by_id = np.argsort(ids, kind="stable")
        order = by_id[np.argsort(-rank_val[by_id], kind="stable")][: min(k, len(ids))]
        out[0].append(np.full(len(order), qid))
        out[1].append(ids[order])
        out[2].append(
            [None if (is_null[i] or is_nan[i]) else float(score[i]) for i in order]
        )
        out[3].append(is_nan[order])

    def gen(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            vals = pdf[corpus_vec].to_numpy()
            ids_all = pdf[corpus_id].to_numpy()
            cvalid = np.fromiter(
                (v is not None and len(v) == dim for v in vals),
                dtype=bool,
                count=len(vals),
            )
            ids_v = ids_all[cvalid]
            ids_bad = ids_all[~cvalid]
            n_v, n_bad = len(ids_v), len(ids_bad)
            cmat = (
                np.vstack(vals[cvalid]).astype(np.float64)
                if n_v
                else np.zeros((0, dim))
            )
            if n_v and len(valid_qpos):
                cnorm = np.linalg.norm(cmat, axis=1)
                raw = cmat @ qmat.T  # (n_v, |Q_valid|)
                denom = np.outer(cnorm, qnorm)
                with np.errstate(divide="ignore", invalid="ignore"):
                    sc = raw / denom
                null_m = denom == 0  # try_divide: exact-zero denominator -> NULL
                if round_to is not None:
                    # Round BEFORE pruning: ranking is defined on rounded
                    # scores, and a candidate just under the batch k-th
                    # can round up into a tie it would win on id order.
                    sc = np.round(sc, round_to)
            else:
                sc = np.zeros((n_v, 0))
                null_m = np.zeros((n_v, 0), dtype=bool)
            cand_v = None
            if planes_flat is not None:
                # (n_v, tables) corpus buckets -> (n_v, nq) candidate mask:
                # a pair is a candidate iff any table's buckets match.
                csig = np.zeros((n_v, tables), dtype=np.int64)
                if n_v:
                    signs_c = (cmat @ planes_flat.T) >= 0
                    csig = (
                        signs_c.reshape(n_v, tables, bits).astype(np.int64) @ powers
                    )
                cand_v = np.zeros((n_v, nq), dtype=bool)
                for t in range(tables):
                    cand_v |= csig[:, t][:, None] == qsig[None, :, t]
            out = ([], [], [], [])
            for qpos in range(len(qids)):
                if qvalid[qpos]:
                    j = int(np.searchsorted(valid_qpos, qpos))
                    col = sc[:, j] if n_v else np.zeros(0)
                    nullc = null_m[:, j] if n_v else np.zeros(0, dtype=bool)
                else:
                    col = np.full(n_v, np.nan)
                    nullc = np.ones(n_v, dtype=bool)
                ids = np.concatenate([ids_v, ids_bad]) if n_bad else ids_v
                is_null = np.concatenate([nullc, np.ones(n_bad, bool)])
                score = np.concatenate([col, np.full(n_bad, np.nan)])
                if cand_v is not None:
                    mask = np.concatenate(
                        [cand_v[:, qpos], np.full(n_bad, bad_row_cand[qpos])]
                    )
                    if not mask.any():
                        continue
                    ids, is_null, score = ids[mask], is_null[mask], score[mask]
                is_nan = np.isnan(score) & ~is_null
                # Total order: NaN first (+inf), finite by value, NULL last.
                rank_val = np.where(is_nan, np.inf, np.where(is_null, -np.inf, score))
                _emit_topk(ids, rank_val, score, is_nan, is_null, qids[qpos], out)
            if out[0]:
                yield pd.DataFrame(
                    {
                        "query_id": np.concatenate(out[0]),
                        "neighbor_id": np.concatenate(out[1]),
                        "cosine": np.concatenate(
                            [np.asarray(x, dtype=object) for x in out[2]]
                        ),
                        "__nan": np.concatenate(out[3]),
                    }
                )

    scored = (
        corpus.select(corpus_id, corpus_vec)
        .mapInPandas(gen, out_schema)
        .withColumn(
            "cosine",
            F.when(F.col("__nan"), F.lit(float("nan"))).otherwise(F.col("cosine")),
        )
        .drop("__nan")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def _pairwise_cosine_arrow(
    pairs: DataFrame,
    *,
    a_col: str,
    b_col: str,
    out_col: str = "cosine",
    round_to: int | None = 6,
) -> DataFrame:
    """Row-wise cosine over already-joined vector pairs — one einsum per
    Arrow batch instead of an interpreted ``aggregate(zip_with(...))``
    fold per row (~10x the per-row throughput on 64-dim vectors).

    Drops ``a_col``/``b_col`` from the output and appends ``out_col``.
    Degenerate rows follow the module contract: NULL for null vectors,
    per-pair length mismatches, and zero-norm denominators; NaN (ranked
    first by Spark) propagates from NaN elements. Rows are grouped by
    vector length inside each batch, so ragged corpora still vectorize.
    """
    import numpy as np
    import pandas as pd

    passthrough = [c for c in pairs.columns if c not in (a_col, b_col)]
    fields = ", ".join(
        f"{c} {pairs.schema[c].dataType.simpleString()}" for c in passthrough
    )
    out_schema = f"{fields}, {out_col} double, __nan boolean"

    def gen(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            va = pdf[a_col].to_numpy()
            vb = pdf[b_col].to_numpy()
            n = len(pdf)
            score = np.zeros(n)
            is_null = np.ones(n, dtype=bool)
            is_nan = np.zeros(n, dtype=bool)
            lengths = np.fromiter(
                (
                    len(a) if a is not None and b is not None and len(a) == len(b) else -1
                    for a, b in zip(va, vb)
                ),
                dtype=np.int64,
                count=n,
            )
            for ln in np.unique(lengths):
                if ln < 0:
                    continue  # null / mismatched rows stay NULL
                idx = np.flatnonzero(lengths == ln)
                if ln == 0:
                    continue  # empty vectors: zero norm -> NULL
                amat = np.vstack(va[idx]).astype(np.float64)
                bmat = np.vstack(vb[idx]).astype(np.float64)
                raw = np.einsum("ij,ij->i", amat, bmat)
                denom = np.linalg.norm(amat, axis=1) * np.linalg.norm(bmat, axis=1)
                with np.errstate(divide="ignore", invalid="ignore"):
                    s = raw / denom
                null_g = denom == 0  # try_divide: exact-zero denominator
                if round_to is not None:
                    s = np.round(s, round_to)
                score[idx] = s
                is_null[idx] = null_g
                is_nan[idx] = np.isnan(s) & ~null_g
            out = {c: pdf[c] for c in passthrough}
            out[out_col] = pd.array(
                [
                    None if (is_null[i] or is_nan[i]) else float(score[i])
                    for i in range(n)
                ],
                dtype=object,
            )
            out["__nan"] = is_nan
            yield pd.DataFrame(out)

    return (
        pairs.mapInPandas(gen, out_schema)
        .withColumn(
            out_col,
            F.when(F.col("__nan"), F.lit(float("nan"))).otherwise(F.col(out_col)),
        )
        .drop("__nan")
    )


def _hyperplanes(dim: int, bits: int, seed: int) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes (driver-side constants)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    return rng.randn(bits, dim).tolist()


def rp_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit signature of a vector against fixed hyperplanes -> int.

    NaN dots contribute a 0 bit (same as the arrow kernel's
    ``dots >= 0``; Spark alone would order NaN >= 0 as true)."""
    bits = []
    for i, p in enumerate(planes):
        plane = F.lit([float(x) for x in p])
        d = dot(vec, plane)
        bits.append(
            F.when((d >= 0) & ~F.isnan(d), F.shiftleft(F.lit(1), i)).otherwise(
                F.lit(0)
            )
        )
    sig = bits[0]
    for b in bits[1:]:
        sig = sig.bitwiseOR(b)
    return sig


def _rp_bucket_expr(vec_col: str, planes: list[list[float]]) -> Column:
    """Same signature as :func:`rp_signature`, built as ONE ``F.expr`` string.

    Column-object construction pays a py4j round-trip per node; a 16-table x
    4-plane x 64-dim signature was ~50k round-trips (≈8 s of driver time per
    query build). One SQL string per table parses JVM-side in microseconds.

    The dot product stays in ``aggregate(zip_with(...))`` form: higher-order
    functions are CodegenFallback (interpreted), but the alternative — flat
    ``v[0]*c0 + ...`` expansion — inflates the expression tree ~100x (the
    plane constants repeat through every Project node, a ~500 KB plan at 16
    tables) and destabilizes broadcast planning. One Literal per plane
    array keeps the tree small; interpretation cost is acceptable
    (signatures are ~1 s of a 3 s query at sf0.1).

    Each dot binds ONCE through the single-element-transform trick so the
    per-bit guard can test it twice (sign + NaN) without recomputing: Spark
    orders NaN largest (``NaN >= 0`` is true) while the numpy kernel's
    ``dots >= 0`` gives False — without the ``isnan`` guard a NaN-bearing
    vector would hash to the all-ones bucket in expr mode and bucket 0 in
    arrow mode, breaking the kernels' bit-parity contract. NULL dots
    (NULL elements) already fall to the 0 bit on both paths."""
    dots = "array(" + ",".join(
        "aggregate(zip_with(`" + vec_col + "`, array("
        + ",".join(f"{float(x)!r}D" for x in p)
        + "), (x, y) -> CAST(x AS DOUBLE) * y), 0D, (acc, v) -> acc + v)"
        for p in planes
    ) + ")"
    base = " + ".join(
        f"(CASE WHEN element_at(D, {i + 1}) >= 0 "
        f"AND NOT isnan(element_at(D, {i + 1})) THEN {1 << i} ELSE 0 END)"
        for i in range(len(planes))
    )
    return F.expr(
        f"element_at(transform(array({dots}), D -> ({base})), 1)"
    )


def _rp_probe_expr(
    vec_col: str, planes: list[list[float]], probes: int
) -> Column:
    """Multiprobe bucket ARRAY for one LSH table: the base signature
    plus the ``probes`` single-bit flips of smallest |margin| (Lv et
    al. 2007's step-wise probing restricted to 1-flips) — the buckets
    a query checks so near-boundary neighbors in adjacent buckets are
    still candidates. The per-plane dots bind ONCE via the
    single-element-transform trick (HOF lambdas are not CSE'd), then
    the base bucket binds the same way; ties on |margin| break by bit
    index, matching the numpy argsort (stable) and the SQL replay.
    Degenerate vectors (NULL / wrong width) emit just [0], the base
    bucket the non-probing paths give them."""
    dots = "array(" + ",".join(
        "aggregate(zip_with(`" + vec_col + "`, array("
        + ",".join(f"{float(x)!r}D" for x in p)
        + "), (x, y) -> CAST(x AS DOUBLE) * y), 0D, (acc, v) -> acc + v)"
        for p in planes
    ) + ")"
    bits = len(planes)
    base = " + ".join(
        f"(CASE WHEN element_at(D, {i + 1}) >= 0 THEN {1 << i} "
        "ELSE 0 END)"
        for i in range(bits)
    )
    flips = (
        f"slice(array_sort(transform(sequence(0, {bits - 1}), "
        "i -> named_struct('m', abs(element_at(D, i + 1)), 'b', i))), "
        f"1, {int(probes)})"
    )
    probed = (
        f"element_at(transform(array(CAST(({base}) AS LONG)), B -> "
        f"concat(array(B), transform({flips}, "
        "s -> CAST(B ^ shiftleft(1, s.b) AS LONG)))), 1)"
    )
    full = (
        f"element_at(transform(array({dots}), D -> {probed}), 1)"
    )
    ok = (
        f"`{vec_col}` IS NOT NULL AND size(`{vec_col}`) = {len(planes[0])}"
        f" AND size(filter(`{vec_col}`, x -> x IS NULL)) = 0"
        f" AND size(filter(`{vec_col}`, x -> isnan(x))) = 0"
        # NULL elements make every dot (hence every margin) NULL, and
        # NaN elements make them NaN (Spark orders NaN largest, so
        # NaN >= 0 is true and NaN margins still sort/emit): both would
        # diverge from the arrow kernel's bucket-0, no-probe behavior —
        # so degenerate vectors emit their base bucket [0] and nothing
        # else, keeping the expr and arrow kernels bit-identical.
    )
    return F.expr(
        f"IF({ok}, {full}, array(CAST(0 AS LONG)))"
    )


def _rp_buckets_arrow(
    df: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    out_id: str,
    dim: int,
    bits: int,
    tables: int,
    seed: int,
    probes: int = 0,
) -> DataFrame:
    """(id, table_id, bucket) for every LSH table via ONE numpy matmul per
    Arrow batch — the vectorized-UDF path for wide vectors / many tables,
    where the expression form (higher-order functions, interpreted) gets
    CPU-bound. ~(batch x dim) @ (dim x tables*bits) per batch; bucket bits
    pack with a power-of-two dot."""
    import numpy as np
    import pandas as pd

    planes = np.array(
        [_hyperplanes(dim, bits, seed + t) for t in range(tables)], dtype=np.float64
    )  # (tables, bits, dim)
    flat = planes.reshape(tables * bits, dim)
    powers = (1 << np.arange(bits)).astype(np.int64)

    n_probe = max(0, min(int(probes), bits))

    def gen(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            vals = pdf[vec_col].to_numpy()
            # NULL / wrong-dimension vectors get bucket 0 in every table —
            # exactly what the expr path computes for them (NULL dot ->
            # CASE ELSE 0 per bit) — instead of crashing np.vstack.
            valid = np.fromiter(
                (v is not None and len(v) == dim for v in vals),
                dtype=bool,
                count=len(vals),
            )
            buckets = np.zeros((len(pdf), tables), dtype=np.int64)
            dots = None
            if valid.any():
                vecs = np.vstack(vals[valid]).astype(np.float64)
                dots = vecs @ flat.T  # (n_valid, tables*bits)
                signs = dots >= 0
                buckets[valid] = (
                    signs.reshape(int(valid.sum()), tables, bits).astype(np.int64)
                    @ powers
                )  # (n_valid, tables)
            ids = np.repeat(pdf[id_col].to_numpy(), tables)
            frames = [
                pd.DataFrame(
                    {
                        out_id: ids,
                        "table_id": np.tile(np.arange(tables), len(pdf)),
                        "bucket": buckets.reshape(-1),
                    }
                )
            ]
            if n_probe and dots is not None:
                # multiprobe: flip the n_probe lowest-|margin| bits of
                # each VALID row's signature, one extra row per flip.
                # Stable argsort breaks |margin| ties by bit index —
                # the expr path's struct(m, b) sort order. Rows with
                # NaN dots (NULL vector elements) emit no probes: NaN
                # margin order is engine-specific, and the expr path
                # gives such vectors their base bucket only.
                nv = int(valid.sum())
                clean = ~np.isnan(dots).any(axis=1)  # (nv,)
                if clean.any():
                    nc = int(clean.sum())
                    margins = np.abs(dots[clean]).reshape(
                        nc, tables, bits
                    )
                    order = np.argsort(margins, axis=2, kind="stable")
                    vbuckets = buckets[valid][clean]  # (nc, tables)
                    pid = np.repeat(
                        pdf[id_col].to_numpy()[valid][clean], tables
                    )
                    ptab = np.tile(np.arange(tables), nc)
                    for j in range(n_probe):
                        flipped = vbuckets ^ (
                            np.int64(1) << order[:, :, j].astype(np.int64)
                        )
                        frames.append(
                            pd.DataFrame(
                                {
                                    out_id: pid,
                                    "table_id": ptab,
                                    "bucket": flipped.reshape(-1),
                                }
                            )
                        )
            yield pd.concat(frames, ignore_index=True)

    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, vec_col).mapInPandas(
        gen, f"{out_id} {id_type}, table_id int, bucket long"
    )


def rp_lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    query_id: str,
    corpus_id: str,
    query_vec: str = "embedding",
    corpus_vec: str = "embedding",
    k: int = 10,
    bits: int = 8,
    tables: int = 4,
    dim: int | None = None,
    seed: int = 42,
    round_to: int | None = 6,
    signature_impl: str = "arrow",
    score_impl: str = "arrow",
    single_pass: bool | None = None,
    broadcast_queries: bool | None = None,
    max_bucket_size: int | None = None,
    probes: int = 0,
) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH candidate generation +
    exact cosine re-ranking of candidates.

    ``probes`` enables QUERY-side multiprobe (Lv et al. 2007,
    single-bit flips): besides its base bucket, each query checks the
    ``probes`` buckets reached by flipping its lowest-|margin|
    signature bits per table — near-boundary neighbors that landed one
    bucket over become candidates WITHOUT adding tables, so recall
    rises at the cost of ~(1 + probes)x candidates instead of
    (more tables)x signatures + storage. Corpus signatures are
    unchanged (this is what makes multiprobe the scale move: at 100 TB
    the corpus-side bucket table is the big one). probes > 0 forces
    the bucket-join plan (the single-pass kernel probes base buckets
    only) and is capped at ``bits``.

    ``max_bucket_size`` caps CORPUS-side bucket membership in the join
    plan (hot buckets from near-constant vector regions emit
    |bucket| x |queries in bucket| candidates): oversized buckets are
    skipped, mirroring dedup.minhash_lsh_pairs. The cap only exists in
    the bucket-join plan, so setting it forces that plan (the single-pass
    arrow plan scores candidates in-batch, where a hot bucket costs
    memory-bounded compute rather than a shuffle).

    ``tables`` independent signatures; a corpus vector is a candidate if it
    shares any table's bucket with the query. Expected candidates per query
    ~ tables * N / 2^bits. Recall rises with tables, cost with candidates.

    ``signature_impl`` defaults to ``'arrow'`` (one numpy matmul per Arrow
    batch): measured at sf0.1/local[32] it is both faster warm (~2.0s vs
    ~3.1s suite query) and far more stable (±0.1s vs 3-22s swings) than the
    ``'expr'`` path, whose higher-order functions are CodegenFallback
    (interpreted) and ride the JIT/code-cache ramp. The one-time cost is
    Python-worker spin-up on the session's first Arrow stage (~15s cold,
    amortized by worker reuse). ``'expr'`` remains as the pure-JVM fallback
    for sessions where Python workers are unavailable or per-session
    spin-up dominates (tiny one-shot jobs).

    ``score_impl`` picks the exact re-rank kernel for the candidate pairs:
    ``'arrow'`` (default — one einsum per Arrow batch, see
    :func:`_pairwise_cosine_arrow`) or ``'expr'`` (the interpreted
    JVM fold, bit-exact vs external SQL oracles).

    When both kernels are ``'arrow'`` and the query side passes the
    driver-collect gate (``single_pass=None``, the default — or forced
    with ``True``), the whole operator collapses into ONE corpus pass:
    signatures, candidate matching and scoring happen per Arrow batch
    against the in-closure query matrix (see the ``lsh`` hook on
    :func:`_cosine_topk_arrow`), so the bucket join, the two vector-attach
    joins and the candidate dedup shuffle disappear; the only shuffle left
    is the final top-k window on O(|Q| x k x batches) rows. Same candidate
    set and scores as the join plan. ``single_pass=False`` keeps the join
    plan — the right shape when |Q| is unbounded."""
    if dim is None:
        first = corpus.select(F.size(corpus_vec).alias("d")).head(1)
        if not first:
            return cosine_topk(
                queries, corpus, query_id=query_id, corpus_id=corpus_id,
                query_vec=query_vec, corpus_vec=corpus_vec, k=k,
            )
        dim = first[0]["d"]

    if probes < 0:
        raise ValueError(f"probes must be >= 0, got {probes}")
    probes = min(probes, bits)
    if (
        signature_impl == "arrow"
        and score_impl == "arrow"
        and single_pass is not False
        # The cap only exists in the bucket-join plan; setting it forces
        # that plan so the guard the caller asked for is actually active.
        and max_bucket_size is None
        # multiprobe only exists in the bucket-join plan too
        and probes == 0
        and (single_pass or _arrow_query_side_ok(queries))
    ):
        return _cosine_topk_arrow(
            queries, corpus, query_id=query_id, corpus_id=corpus_id,
            query_vec=query_vec, corpus_vec=corpus_vec, k=k, round_to=round_to,
            lsh={"bits": bits, "tables": tables, "seed": seed},
        )

    def signatures(
        df: DataFrame, idc: str, vecc: str, out_id: str, n_probe: int = 0
    ) -> DataFrame:
        # ids + buckets only: the vectors stay OUT of the bucket join and
        # candidate dedup (they would multiply shuffle volume by the vector
        # width x tables); they re-attach per distinct candidate pair below.
        if signature_impl == "arrow":
            return _rp_buckets_arrow(
                df, id_col=idc, vec_col=vecc, out_id=out_id,
                dim=dim, bits=bits, tables=tables, seed=seed,
                probes=n_probe,
            ).withColumn("bucket", F.col("bucket").cast("int"))
        if n_probe:
            sigs = F.array(
                *[
                    F.struct(
                        F.lit(t).alias("table_id"),
                        _rp_probe_expr(
                            vecc, _hyperplanes(dim, bits, seed + t),
                            n_probe,
                        ).alias("buckets"),
                    )
                    for t in range(tables)
                ]
            )
            return (
                df.select(
                    F.col(idc).alias(out_id), F.explode(sigs).alias("s")
                )
                .select(
                    out_id, "s.table_id",
                    F.explode("s.buckets").alias("bucket"),
                )
                .withColumn("bucket", F.col("bucket").cast("int"))
            )
        sigs = F.array(
            *[
                F.struct(
                    F.lit(t).alias("table_id"),
                    _rp_bucket_expr(vecc, _hyperplanes(dim, bits, seed + t)).alias(
                        "bucket"
                    ),
                )
                for t in range(tables)
            ]
        )
        return df.select(
            F.col(idc).alias(out_id), F.explode(sigs).alias("s")
        ).select(out_id, "s.table_id", "s.bucket")

    qs = signatures(queries, query_id, query_vec, "query_id", probes)
    cs = signatures(corpus, corpus_id, corpus_vec, "neighbor_id")
    if max_bucket_size is not None:
        from timefence_spark.operators.dedup import _cap_buckets

        cs = _cap_buckets(cs, ["table_id", "bucket"], max_bucket_size)
    # Pinning the query-side broadcast keeps the corpus un-shuffled for
    # candidate generation — right for the typical bounded-|Q| lookup. The
    # hint is size-gated by default (self-join-sized query sets degrade to
    # a shuffle join rather than blowing the 8 GB broadcast cap); pass
    # broadcast_queries=True/False to override.
    qs = _gate_broadcast(qs, broadcast_queries)
    cand = (
        qs.join(cs, ["table_id", "bucket"])
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    qv = _gate_broadcast(
        queries.select(F.col(query_id).alias("query_id"), F.col(query_vec).alias("__qv")),
        broadcast_queries,
    )
    cv = corpus.select(F.col(corpus_id).alias("neighbor_id"), F.col(corpus_vec).alias("__cv"))
    cand = cand.join(qv, "query_id").join(cv, "neighbor_id")
    if score_impl == "arrow":
        scored = _pairwise_cosine_arrow(
            cand.select("query_id", "neighbor_id", "__qv", "__cv"),
            a_col="__qv", b_col="__cv", round_to=round_to,
        )
    else:
        score = cosine(F.col("__qv"), F.col("__cv"))
        if round_to is not None:
            score = F.round(score, round_to)
        scored = cand.select("query_id", "neighbor_id", score.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    query_id: str,
    corpus_id: str,
    query_vec: str = "embedding",
    corpus_vec: str = "embedding",
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    round_to: int | None = 6,
    hash_fn: str = "xxhash64",
    compute: str = "expr",
    refine_iters: int = 0,
) -> DataFrame:
    """IVF-flat: centroids = deterministic hash-sample of ``nlist`` corpus
    vectors; corpus rows are assigned to their nearest centroid (one broadcast
    pass); each query probes its ``nprobe`` nearest lists and re-ranks
    exactly. Probing fraction nprobe/nlist of the corpus per query.

    ``hash_fn='md5'`` makes the centroid sample portable (bit-identical in
    DuckDB) so the whole index build + probe is oracle-checkable.

    Neither kernel shuffles the corpus for assignment. ``'expr'`` (the
    pure-JVM, oracle-exact default) scores the row's vector against an
    array of centroid literals and comparator-sorts it in place — a
    projection, replacing the older cross join + per-id window shuffle
    whose exchange dominated the operator's cost. ``compute='arrow'``
    scores assignment as one (batch x dim) @ (dim x nlist) matmul per
    Arrow batch and re-ranks via :func:`_pairwise_cosine_arrow`; its
    last-ulp score differences can flip nearest-centroid assignment on
    near-equidistant rows, which an external-SQL oracle would see — hence
    the expr default. Both kernels collect the nlist centroid vectors to
    the driver (tiny by construction: nlist rows) and ship them in the
    plan/closure."""
    sampled = _ivf_centroids(
        corpus, corpus_id=corpus_id, corpus_vec=corpus_vec, nlist=nlist,
        seed=seed, hash_fn=hash_fn, refine_iters=refine_iters,
    )
    assign = _ivf_assign_factory(sampled, compute=compute, nlist=nlist)

    corpus_assigned = assign(
        corpus.select(F.col(corpus_id).alias("neighbor_id"), F.col(corpus_vec).alias("__cv")),
        "neighbor_id", "__cv", 1,
    )
    query_probes = assign(
        queries.select(F.col(query_id).alias("query_id"), F.col(query_vec).alias("__qv")),
        "query_id", "__qv", nprobe,
    )
    cand = query_probes.join(corpus_assigned, "centroid_id").where(
        F.col("neighbor_id") != F.col("query_id")
    )
    return _ivf_rank(cand, compute=compute, round_to=round_to, k=k)


def _ivf_centroids(
    corpus: DataFrame,
    *,
    corpus_id: str,
    corpus_vec: str,
    nlist: int,
    seed: int,
    hash_fn: str,
    refine_iters: int = 0,
) -> DataFrame:
    """(centroid_id, centroid): a deterministic hash-sample of ``nlist``
    corpus vectors, ids dense in hash order — optionally refined with
    ``refine_iters`` Lloyd (k-means) iterations via
    :func:`_refine_centroids`. Refinement is what SemDeDup actually runs
    (k-means, not a raw sample); each iteration costs one assignment
    projection plus one positional-mean shuffle over the corpus, and the
    result stays bit-replayable by an external SQL oracle (sorted
    deterministic summation — see _refine_centroids)."""
    if hash_fn == "xxhash64":
        sample_hash = F.xxhash64(F.col("cid").cast("string"), F.lit(seed))
    else:
        sample_hash = F.conv(
            F.substring(
                F.md5(F.concat(F.col("cid").cast("string"), F.lit(f":{seed}"))), 1, 15
            ),
            16,
            10,
        ).cast("long")
    sampled = (
        corpus.select(F.col(corpus_id).alias("cid"), F.col(corpus_vec).alias("cv"))
        .withColumn("__h", sample_hash)
        .orderBy("__h")
        .limit(nlist)
        .withColumn("centroid_id", F.row_number().over(Window.orderBy("__h")) - 1)
        .select("centroid_id", F.col("cv").alias("centroid"))
    )
    if refine_iters:
        vecs = corpus.select(
            F.col(corpus_id).alias("__rid"), F.col(corpus_vec).alias("__rv")
        )
        # pin() per iteration: iteration i+1's assignment factory collects
        # the refined centroids, which would otherwise re-execute every
        # prior iteration's corpus-wide aggregation chain (O(iters^2)).
        sampled = pin(sampled)
        for _ in range(int(refine_iters)):
            sampled = pin(_refine_centroids(sampled, vecs, nlist=nlist))
    return sampled


def _refine_centroids(
    sampled: DataFrame, vecs: DataFrame, *, nlist: int
) -> DataFrame:
    """One Lloyd iteration: assign every corpus vector to its nearest
    centroid (the exact expr kernel — same tie-breaks an oracle can
    replay), then move each centroid to its cluster's elementwise mean;
    empty clusters keep their previous centroid (the standard k-means
    convention, and the deterministic one).

    The mean is computed per (centroid, position): posexplode, then a
    SORTED sequential fold of each group's values (0.0-initialized, in
    member-id order), so the double summation runs in ONE canonical
    order — an external SQL engine replaying ``list(x ORDER BY id)``
    with a 0.0-prepended reduce produces bit-identical centroids, which
    keeps every downstream assignment and cosine oracle-exact.

    100 TB shape: one rows x dim shuffle of (id, pos, value) per
    iteration — ids and doubles only, no text, no pairs — and the fold
    buffer per group is ONE position of one cluster (cluster_size
    doubles), never a whole cluster of vectors. Keep ``refine_iters``
    small (1-3); each iteration also costs one driver collect of nlist
    centroids for the next assignment plan."""
    assign = _ivf_assign_factory(sampled, compute="expr", nlist=nlist)
    assigned = assign(vecs, "__rid", "__rv", 1)
    pos = assigned.select(
        "centroid_id", "__rid", F.posexplode("__rv").alias("__p", "__x")
    )
    sums = pos.groupBy("centroid_id", "__p").agg(
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("__rid").alias("r"),
                        F.col("__x").cast("double").alias("x"),
                    )
                )
            ),
            F.lit(0.0),
            lambda acc, s: acc + s["x"],
        ).alias("__s"),
        F.count(F.lit(1)).alias("__c"),
    )
    means = (
        sums.select(
            "centroid_id",
            F.struct(F.col("__p"), (F.col("__s") / F.col("__c")).alias("m")).alias(
                "__pm"
            ),
        )
        .groupBy("centroid_id")
        .agg(F.array_sort(F.collect_list("__pm")).alias("__pms"))
        .select(
            "centroid_id",
            F.transform("__pms", lambda s: s["m"]).alias("__new"),
        )
    )
    return sampled.join(means, "centroid_id", "left").select(
        "centroid_id",
        F.coalesce("__new", F.col("centroid").cast("array<double>")).alias(
            "centroid"
        ),
    )


def _ivf_rank(
    cand: DataFrame, *, compute: str, round_to: int | None, k: int
) -> DataFrame:
    """Exact re-rank of probed candidates: (query_id, neighbor_id,
    cosine, rank <= k), deterministic tie-break on the smaller id."""
    if compute == "arrow":
        scored = _pairwise_cosine_arrow(
            cand.select("query_id", "neighbor_id", "__qv", "__cv"),
            a_col="__qv", b_col="__cv", round_to=round_to,
        ).dropDuplicates(["query_id", "neighbor_id"])
    else:
        score = cosine(F.col("__qv"), F.col("__cv"))
        if round_to is not None:
            score = F.round(score, round_to)
        scored = cand.select(
            "query_id", "neighbor_id", score.alias("cosine")
        ).dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def ivf_build_index(
    corpus: DataFrame,
    *,
    corpus_id: str,
    corpus_vec: str = "embedding",
    nlist: int = 16,
    seed: int = 42,
    hash_fn: str = "xxhash64",
    compute: str = "expr",
    refine_iters: int = 0,
    path: str,
) -> None:
    """Materialize an IVF-flat index to ``path`` for repeated searches:

    * ``<path>/centroids`` — the ``nlist`` sampled centroid vectors.
    * ``<path>/corpus`` — every corpus vector with its nearest-centroid
      assignment, written ``partitionBy('centroid_id')``.

    The partitioned layout is the point: :func:`ivf_search` filters on
    the probed centroid ids, so the parquet reader PRUNES to
    nprobe/nlist of the index directories — repeated queries never
    rescan (or re-assign) the full corpus, which is the difference
    between an index and a cached DataFrame at 100 TB. Rebuild when the
    corpus changes (assignment is a pure function of (corpus, nlist,
    seed, hash_fn))."""
    sampled = _ivf_centroids(
        corpus, corpus_id=corpus_id, corpus_vec=corpus_vec, nlist=nlist,
        seed=seed, hash_fn=hash_fn, refine_iters=refine_iters,
    )
    sampled.write.mode("overwrite").parquet(f"{path}/centroids")
    assign = _ivf_assign_factory(sampled, compute=compute, nlist=nlist)
    assigned = assign(
        corpus.select(
            F.col(corpus_id).alias("neighbor_id"),
            F.col(corpus_vec).alias("__cv"),
        ),
        "neighbor_id", "__cv", 1,
    )
    assigned.select("neighbor_id", F.col("__cv").alias("vector"), "centroid_id")\
        .write.mode("overwrite").partitionBy("centroid_id")\
        .parquet(f"{path}/corpus")


def ivf_append(
    spark,
    path: str,
    new_corpus: DataFrame,
    *,
    corpus_id: str,
    corpus_vec: str = "embedding",
    compute: str = "expr",
) -> None:
    """Append rows to a persisted :func:`ivf_build_index` (IVF-FLAT)
    index without re-sampling centroids — the flat sibling of
    :func:`ivf_pq_append`: new vectors assign to the FROZEN persisted
    centroids and land as appended list-partitioned files under
    ``<path>/corpus``. Same Faiss ``add()`` semantics and same caveats
    (caller owns id uniqueness; drifted distributions degrade recall
    gracefully — rebuild when the model ages out)."""
    cents = spark.read.parquet(f"{path}/centroids")
    assign = _ivf_assign_factory(cents, compute=compute, nlist=None)
    assigned = assign(
        new_corpus.select(
            F.col(corpus_id).alias("neighbor_id"),
            F.col(corpus_vec).alias("__cv"),
        ),
        "neighbor_id", "__cv", 1,
    )
    assigned.select(
        "neighbor_id", F.col("__cv").alias("vector"), "centroid_id"
    ).write.mode("append").partitionBy("centroid_id").parquet(
        f"{path}/corpus"
    )


def ivf_search(
    spark,
    path: str,
    queries: DataFrame,
    *,
    query_id: str,
    query_vec: str = "embedding",
    k: int = 10,
    nprobe: int = 4,
    round_to: int | None = 6,
    compute: str = "expr",
) -> DataFrame:
    """Top-k search against a persisted :func:`ivf_build_index` index.

    Queries assign to their ``nprobe`` nearest centroids (centroids table
    is nlist rows — collected into the assignment expression), the
    distinct probed centroid ids (at most nlist values) become a static
    IN-filter on the partitioned corpus — file-level partition pruning,
    no full-index scan — and the survivors re-rank exactly. Matches
    :func:`ivf_topk` output for the same parameters."""
    centroids = spark.read.parquet(f"{path}/centroids")
    # nlist=None: the factory applies the expr-literal gate with a
    # budget-capped collect of the (tiny) persisted centroids table.
    assign = _ivf_assign_factory(centroids, compute=compute, nlist=None)
    # pin(): the assignment projection feeds BOTH the probed-id collect
    # and the candidate join; without the localCheckpoint it would be
    # recomputed in each job (two assignment stages per search).
    query_probes = pin(
        assign(
            queries.select(
                F.col(query_id).alias("query_id"),
                F.col(query_vec).alias("__qv"),
            ),
            "query_id", "__qv", nprobe,
        )
    )
    probed = [
        int(r["centroid_id"])
        for r in query_probes.select("centroid_id").distinct().collect()
    ]
    index = spark.read.parquet(f"{path}/corpus").where(
        F.col("centroid_id").isin(probed or [-1])
    )
    cand = query_probes.join(
        index.select(
            "centroid_id", "neighbor_id", F.col("vector").alias("__cv")
        ),
        "centroid_id",
    ).where(F.col("neighbor_id") != F.col("query_id"))
    return _ivf_rank(cand, compute=compute, round_to=round_to, k=k)


def _seq_l2_norm(vec) -> float | None:
    """Driver-side replica of ``l2_norm``'s evaluation: the same
    left-to-right float64 accumulation and final sqrt the Spark fold
    performs, so the constant is bit-identical to what the expression
    would have computed (IEEE doubles are deterministic per op order).
    A NULL element poisons the fold to NULL (returned as None); NaN
    propagates through the arithmetic exactly like the expression."""
    import math

    acc = 0.0
    for x in vec:
        if x is None:
            return None
        acc += float(x) * float(x)
    return math.sqrt(acc)


def _sql_double(x) -> str:
    """A double as a Spark SQL literal, covering the values ``repr()+'D'``
    cannot express: NULL, NaN and infinities (``nanD`` is a parse error;
    ``float(None)`` raises). Keeps degenerate centroid vectors scoring
    NULL/NaN exactly as the pre-literal cross-join plan did."""
    import math

    if x is None:
        return "CAST(NULL AS DOUBLE)"
    x = float(x)
    if math.isnan(x):
        return "CAST('NaN' AS DOUBLE)"
    if math.isinf(x):
        sign = "-" if x < 0 else ""
        return f"CAST('{sign}Infinity' AS DOUBLE)"
    return f"{x!r}D"


#: Ceiling on nlist x dim before the literal-embedding expr kernel is
#: refused in favor of the Arrow kernel. Past a few thousand doubles the
#: generated SQL string stops being parseable in reasonable time (SemDeDup's
#: own cited configuration — 50K clusters x 768 dims — would be a ~400 MB
#: expression string), and the per-plan shipping cost dwarfs any
#: oracle-exactness benefit. 8192 keeps every sane IVF configuration
#: (nlist<=64 at dim<=128, nlist=16 at dim<=512) on the exact JVM path.
_ASSIGN_EXPR_MAX_LITERALS = 8192


def _ivf_assign_factory(sampled: DataFrame, *, compute: str, nlist: int | None = None):
    """Choose the centroid-assignment kernel, gating the expr path on
    centroid volume. ``compute='arrow'`` always takes the matmul kernel.
    ``compute='expr'`` takes the literal-embedding kernel only while
    nlist x dim <= :data:`_ASSIGN_EXPR_MAX_LITERALS`; past that the expr
    SQL string is unbuildable at scale, so the factory falls back to the
    Arrow kernel (which ships the centroid matrix via ``sc.broadcast`` —
    once per executor, not per task) and warns, because the fallback's
    last-ulp score differences are observable by an external oracle on
    near-equidistant rows.

    ``nlist`` is the caller's requested list count (an upper bound on the
    sampled rows); when omitted (``ivf_search`` reading a persisted
    centroids table) the gate is applied with a budget-capped collect —
    one bounded job, no separate count."""
    if compute == "arrow":
        return _ivf_assign_arrow_factory(sampled)
    if nlist is not None and nlist > _ASSIGN_EXPR_MAX_LITERALS:
        # dim >= 1, so nlist alone already exceeds the literal budget:
        # skip the driver collect entirely (at SemDeDup scale it is the
        # expensive part) and go straight to the broadcast kernel.
        warnings.warn(
            f"centroid assignment: nlist={nlist} exceeds the expr-kernel "
            f"literal budget ({_ASSIGN_EXPR_MAX_LITERALS}); using the "
            "Arrow kernel with a broadcast centroid matrix. Pass "
            "compute='arrow' to silence this.",
            stacklevel=3,
        )
        return _ivf_assign_arrow_factory(sampled)
    if nlist is None:
        # Unknown list count: fetch at most budget+1 rows in ONE job; an
        # overfull result proves the budget is blown without completing
        # the collect (the Arrow factory re-collects columnar-side).
        cap = _ASSIGN_EXPR_MAX_LITERALS + 1
        rows = sampled.limit(cap).collect()
        if len(rows) >= cap:
            warnings.warn(
                f"centroid assignment: centroid count exceeds the "
                f"expr-kernel literal budget ({_ASSIGN_EXPR_MAX_LITERALS}); "
                "using the Arrow kernel with a broadcast centroid matrix. "
                "Pass compute='arrow' to silence this.",
                stacklevel=3,
            )
            return _ivf_assign_arrow_factory(sampled)
        rows.sort(key=lambda r: r["centroid_id"])
    else:
        rows = sorted(sampled.collect(), key=lambda r: r["centroid_id"])
    dim = max(
        (len(r["centroid"]) for r in rows if r["centroid"] is not None),
        default=0,
    )
    if len(rows) * dim > _ASSIGN_EXPR_MAX_LITERALS:
        warnings.warn(
            f"centroid assignment: nlist*dim = {len(rows)}x{dim} exceeds "
            f"the expr-kernel literal budget ({_ASSIGN_EXPR_MAX_LITERALS}); "
            "using the Arrow kernel with a broadcast centroid matrix. "
            "Pass compute='arrow' to silence this.",
            stacklevel=3,
        )
        return _ivf_assign_arrow_factory(sampled, _rows=rows)
    return _ivf_assign_expr_factory(sampled, _rows=rows)


def _ivf_assign_expr_factory(sampled: DataFrame, _rows=None):
    """Build the pure-expression centroid-assignment function: centroids
    are collected once (nlist rows) and embedded as array literals; each
    row is scored against every centroid and the top ``n_lists`` picked
    in place. ONE projection — no cross join, no exchange, no window —
    so assignment cost scales with rows x nlist dot-folds and moves zero
    shuffle bytes (the old cross-join plan shuffled rows x nlist
    candidate rows, vectors included, into a per-id window sort).

    Scores are bit-identical to the cross-join plan's ``cosine`` fold:
    the row's norm is staged once per row (same fold, same value), and
    each centroid's norm is a driver-computed constant via
    :func:`_seq_l2_norm` (same accumulation order -> same double), so
    only ONE interpreted dot-fold runs per (row, centroid) instead of
    the cross join's three (dot + both norms) — measured ~2.5x less
    interpreted-fold work at sf0.1.

    Ranking replicates the old window's (cosine desc, centroid_id asc)
    order, including Spark's desc-order NaN-first / NULL-last placement:
    cosine lives in [-1, 1], so NULL maps to -2 (last) and NaN to +2
    (first) in the sort key; -i breaks ties toward the smaller id."""
    cent_rows = (
        _rows
        if _rows is not None
        else sorted(sampled.collect(), key=lambda r: r["centroid_id"])
    )
    # NULL centroid vectors stay in the list (scoring NULL against every
    # row, ranked last — the old cross-join behavior) rather than being
    # silently dropped and renumbering nothing.
    cents = [
        (
            int(r["centroid_id"]),
            list(r["centroid"]) if r["centroid"] is not None else None,
            _seq_l2_norm(r["centroid"]) if r["centroid"] is not None else None,
        )
        for r in cent_rows
    ]

    def assign(df: DataFrame, idc: str, vecc: str, n_lists: int) -> DataFrame:
        if not cents:
            return df.select(
                F.col(idc), F.col(vecc), F.lit(0).alias("centroid_id")
            ).where(F.lit(False))

        # ONE F.expr string for the whole scored array (same rationale as
        # _rp_bucket_expr): Column-object construction costs a py4j round
        # trip per node, and nlist x dim literal doubles is ~1000 round
        # trips (~1s of driver time per query build); one SQL string
        # parses JVM-side in microseconds. The outer transform binds each
        # (cosine, id) struct to a lambda variable, so the CASE's three
        # references to the score cost one fold evaluation, not three.
        elems = []
        for cid, cvec, cnorm in cents:
            if cvec is None:
                c_sql = "CAST(NULL AS DOUBLE)"
            else:
                arr = "array(" + ",".join(_sql_double(x) for x in cvec) + ")"
                dot_sql = (
                    f"aggregate(zip_with(`{vecc}`, {arr}, "
                    "(x, y) -> CAST(x AS DOUBLE) * y), 0D, (acc, v) -> acc + v)"
                )
                c_sql = f"try_divide({dot_sql}, `__nv` * {_sql_double(cnorm)})"
            elems.append(f"named_struct('c', {c_sql}, 'i', {cid})")
        keyed_sql = (
            "transform(array(" + ",".join(elems) + "), s -> named_struct("
            "'k', CASE WHEN s.c IS NULL THEN -2.0D "
            "WHEN isnan(s.c) THEN 2.0D ELSE s.c END, "
            "'ni', -s.i, 'i', s.i))"
        )
        staged = df.select(
            F.col(idc), F.col(vecc), l2_norm(F.col(vecc)).alias("__nv")
        ).select(F.col(idc), F.col(vecc), F.expr(keyed_sql).alias("__sc"))
        if n_lists == 1:
            return staged.select(
                idc, vecc, F.array_max("__sc")["i"].alias("centroid_id")
            )
        picked = F.slice(
            F.array_sort(
                F.col("__sc"),
                # sort_array orders struct fields ascending; reverse via
                # comparator on the precomputed keys (cheap: two doubles).
                lambda l, r: F.when(l["k"] > r["k"], F.lit(-1))
                .when(l["k"] < r["k"], F.lit(1))
                .otherwise(l["i"] - r["i"]),
            ),
            1,
            n_lists,
        )
        return staged.select(
            F.col(idc), F.col(vecc), F.explode(picked).alias("__pick")
        ).select(idc, vecc, F.col("__pick")["i"].alias("centroid_id"))

    return assign


def _ivf_assign_arrow_factory(sampled: DataFrame, _rows=None):
    """Build the vectorized centroid-assignment function: centroids are
    collected once — via ``toArrow()`` (columnar, no per-row py4j cost;
    the path that matters at SemDeDup's cited 50K x 768, where the matrix
    is ~300 MB) with a row-collect fallback — and shipped via
    ``sc.broadcast``: ONE torrent-distributed copy per executor, instead
    of a ~matrix-sized task closure re-serialized with every task. Each
    Arrow batch scores (batch x dim) @ (dim x nlist) in one matmul and
    emits its top ``n_lists`` centroid ids per row. No cross join, no
    per-id window shuffle — the corpus is never shuffled for assignment.

    Ranking matches the expr path's (cosine desc, centroid_id asc): a
    stable argsort over the score row keeps centroid-id order on exact
    ties, and degenerate scores (zero-norm -> NULL in expr) sort last.
    """
    import numpy as np
    import pandas as pd

    cmat = None
    if _rows is None:
        try:
            tbl = sampled.toArrow()  # pyspark >= 4.0
        except Exception:  # pragma: no cover - legacy collect path
            tbl = None
        if tbl is not None and tbl.num_rows:
            import pyarrow.compute as pc

            tbl = tbl.take(
                pc.sort_indices(
                    tbl, sort_keys=[("centroid_id", "ascending")]
                )
            )
            col = tbl.column("centroid").combine_chunks()
            lengths = pc.list_value_length(col)
            if (
                col.null_count == 0
                and lengths.null_count == 0
                and len(pc.unique(lengths)) == 1
            ):
                flat = col.flatten()
                if flat.null_count == 0:
                    dim0 = lengths[0].as_py()
                    cmat = (
                        flat.to_numpy(zero_copy_only=False)
                        .astype(np.float64)
                        .reshape(tbl.num_rows, dim0)
                    )
            if cmat is None:
                cmat = np.vstack(
                    [
                        np.asarray(v, dtype=np.float64)
                        for v in tbl.column("centroid").to_pylist()
                    ]
                )
    if cmat is None:
        cent_rows = (
            _rows
            if _rows is not None
            else sorted(sampled.collect(), key=lambda r: r["centroid_id"])
        )
        if not cent_rows:
            # Empty corpus: same contract as the expr factory — an
            # always-false filter, no numpy work, no broadcast.
            def assign_empty(
                df: DataFrame, idc: str, vecc: str, n_lists: int
            ) -> DataFrame:
                return df.select(
                    F.col(idc), F.col(vecc), F.lit(0).alias("centroid_id")
                ).where(F.lit(False))

            return assign_empty
        cmat = np.vstack(
            [np.asarray(r["centroid"], dtype=np.float64) for r in cent_rows]
        )
    cnorm = np.linalg.norm(cmat, axis=1)
    dim = int(cmat.shape[1])
    nlist = int(cmat.shape[0])
    bc = sampled.sparkSession.sparkContext.broadcast((cmat, cnorm))

    def assign(df: DataFrame, idc: str, vecc: str, n_lists: int) -> DataFrame:
        id_type = df.schema[idc].dataType.simpleString()
        vec_type = df.schema[vecc].dataType.simpleString()
        out_schema = f"{idc} {id_type}, {vecc} {vec_type}, centroid_id int"
        nl = min(n_lists, nlist)

        def gen(batches):
            cmat_b, cnorm_b = bc.value
            for pdf in batches:
                if pdf.empty:
                    continue
                vals = pdf[vecc].to_numpy()
                n = len(pdf)
                valid = np.fromiter(
                    (v is not None and len(v) == dim for v in vals),
                    dtype=bool,
                    count=n,
                )
                # Invalid/degenerate rows score NULL against every
                # centroid in the expr plan; the (desc, centroid_id asc)
                # window then assigns them centroids 0..n_lists-1.
                order = np.tile(np.arange(nlist), (n, 1))
                if valid.any():
                    vmat = np.vstack(vals[valid]).astype(np.float64)
                    vnorm = np.linalg.norm(vmat, axis=1)
                    raw = vmat @ cmat_b.T
                    denom = np.outer(vnorm, cnorm_b)
                    with np.errstate(divide="ignore", invalid="ignore"):
                        sc = raw / denom
                    # NULL (zero denom) ranks last: -inf under desc order.
                    sc = np.where(denom == 0, -np.inf, sc)
                    sc = np.nan_to_num(sc, nan=-np.inf)
                    order[valid] = np.argsort(-sc, axis=1, kind="stable")
                picked = order[:, :nl]  # (n, nl)
                yield pd.DataFrame(
                    {
                        idc: np.repeat(pdf[idc].to_numpy(), nl),
                        vecc: np.repeat(pdf[vecc].to_numpy(), nl),
                        "centroid_id": picked.reshape(-1),
                    }
                )

        return df.select(idc, vecc).mapInPandas(gen, out_schema)

    return assign


def embedding_near_dup_pairs(
    df: DataFrame,
    *,
    id_col: str,
    vec_col: str = "embedding",
    threshold: float = 0.95,
    bits: int = 8,
    tables: int = 4,
    seed: int = 42,
    dim: int | None = None,
    signature_impl: str = "arrow",
    score_impl: str = "arrow",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine >= t),
    using the same RP-LSH blocking as rp_lsh_topk. Pass ``dim`` when known
    — the fallback probe runs a small Spark job per call.
    ``signature_impl`` defaults to ``'arrow'`` (one numpy matmul per Arrow
    batch, see :func:`_rp_buckets_arrow` and the rationale on
    :func:`rp_lsh_topk`); ``'expr'`` is the pure-JVM fallback.
    ``score_impl`` picks the verification kernel for candidate pairs —
    ``'arrow'`` (einsum per batch, default) or ``'expr'`` (JVM fold).
    NULL and NaN cosines fail the ``>= threshold`` filter in both."""
    if dim is None:
        first = df.select(F.size(vec_col).alias("d")).head(1)
        if not first:
            return df.sparkSession.createDataFrame(
                [], "id_a long, id_b long, cosine double"
            )
        dim = first[0]["d"]
    if signature_impl == "arrow":
        exploded = _rp_buckets_arrow(
            df, id_col=id_col, vec_col=vec_col, out_id=id_col,
            dim=dim, bits=bits, tables=tables, seed=seed,
        ).withColumn("bucket", F.col("bucket").cast("int"))
    else:
        sigs = F.array(
            *[
                F.struct(
                    F.lit(t).alias("table_id"),
                    _rp_bucket_expr(vec_col, _hyperplanes(dim, bits, seed + t)).alias(
                        "bucket"
                    ),
                )
                for t in range(tables)
            ]
        )
        exploded = df.select(F.col(id_col), F.explode(sigs).alias("s")).select(
            id_col, "s.table_id", "s.bucket"
        )
    # ids-only bucket join + dedup; vectors re-attach per distinct pair
    # (same shuffle-de-amplification as minhash_lsh_pairs); hot buckets
    # are skipped under max_bucket_size, same guard as minhash_lsh_pairs.
    if max_bucket_size is not None:
        from timefence_spark.operators.dedup import _cap_buckets

        exploded = _cap_buckets(
            exploded, ["table_id", "bucket"], max_bucket_size
        )
    a = exploded.select("table_id", "bucket", F.col(id_col).alias("id_a"))
    b = exploded.select("table_id", "bucket", F.col(id_col).alias("id_b"))
    cand = (
        a.join(b, ["table_id", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    vecs = df.select(F.col(id_col), F.col(vec_col))
    cand = cand.join(
        vecs.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")), "id_a"
    ).join(
        vecs.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")), "id_b"
    )
    if score_impl == "arrow":
        scored = _pairwise_cosine_arrow(
            cand.select("id_a", "id_b", "va", "vb"),
            a_col="va", b_col="vb", round_to=6,
        )
    else:
        scored = cand.withColumn(
            "cosine", F.round(cosine(F.col("va"), F.col("vb")), 6)
        )
    return (
        scored.where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def semantic_dup_pairs(
    df: DataFrame,
    *,
    id_col: str,
    vec_col: str = "embedding",
    n_clusters: int = 16,
    threshold: float = 0.9,
    seed: int = 42,
    hash_fn: str = "xxhash64",
    compute: str = "expr",
    round_to: int | None = 6,
    max_cluster_size: int | None = None,
    refine_iters: int = 0,
) -> DataFrame:
    """SemDeDup-style semantic near-duplicate pairs (Abbas et al. 2023,
    "SemDeDup: Data-efficient learning at web-scale through semantic
    deduplication"): cluster the embedding space, then score cosine
    similarity only WITHIN each cluster — the published recipe for
    finding semantically-redundant training documents that exact and
    MinHash dedup cannot see (paraphrases, templated rewrites,
    translations of boilerplate).

    Returns (id_a, id_b, cluster_id, cosine) with id_a < id_b and
    cosine >= ``threshold``, rounded to ``round_to`` places.

    Physical shape, 100 TB story:

    * Clustering reuses the IVF machinery: ``n_clusters`` deterministic
      hash-sampled centroids (:func:`_ivf_centroids`), assignment as ONE
      literal-centroid projection (``compute='expr'``) or one matmul per
      Arrow batch (``'arrow'``) — zero shuffle either way.
    * The only shuffle is the cluster-keyed self-join; candidate volume
      is sum(c_i^2)/2 over cluster sizes instead of N^2/2, and
      ``max_cluster_size`` skips degenerate hot clusters (same recall
      trade, same mechanism as the LSH ``max_bucket_size`` caps). Size
      ``n_clusters`` ~ N/1000 so clusters stay joinable; SemDeDup used
      50K clusters for ~600M documents.
    * Scoring needs the vectors on both sides. With ``'expr'``/``'arrow'``
      the cluster-keyed self-join shares one exchange (ReuseExchange)
      but READS every vector from the shuffle service twice (a-side +
      b-side) and materializes (id_a, id_b, va, vb) candidate rows —
      O(sum c_i^2) vector copies in the join stage. With
      ``compute='grouped'`` scoring is one ``applyInPandas`` per
      cluster: each vector is shuffled AND read exactly once, nothing
      pair-shaped is ever materialized row-wise, and the within-cluster
      cosine is a single in-worker matmul (bench: same shuffle-write
      bytes, ~0.78x read bytes and faster wall time at sf0.1). Grouped
      is the 100 TB-friendly kernel whenever every cluster fits a worker
      (pair ``max_cluster_size`` with it; the score matrix is
      O(cluster^2) doubles in-memory). Assignment under 'grouped' uses
      the exact expr kernel; scores share the arrow kernel's last-ulp
      caveat vs the sequential fold (invisible at the default rounding
      on non-adversarial data).

    ``refine_iters`` runs that many Lloyd (k-means) iterations on the
    sampled centroids before the final assignment — what SemDeDup
    actually clusters with. Each iteration costs one assignment
    projection plus one positional-mean shuffle over the corpus (see
    :func:`_refine_centroids` for the deterministic fold that keeps it
    oracle-replayable).

    Centroid sampling, assignment tie-breaks, refinement means, and the
    sequential-fold cosine are all deterministic, so an external SQL
    oracle can replay the exact pair set (hash_fn='md5' for cross-engine
    hashes).
    """
    if n_clusters < 1:
        raise ValueError(f"n_clusters must be >= 1, got {n_clusters}")
    if compute not in ("expr", "arrow", "grouped"):
        raise ValueError(
            f"compute must be 'expr', 'arrow' or 'grouped', got {compute!r}"
        )
    centroids = _ivf_centroids(
        df, corpus_id=id_col, corpus_vec=vec_col, nlist=n_clusters,
        seed=seed, hash_fn=hash_fn, refine_iters=refine_iters,
    )
    assign = _ivf_assign_factory(
        centroids,
        compute="expr" if compute == "grouped" else compute,
        nlist=n_clusters,
    )
    assigned = assign(
        df.select(F.col(id_col).alias("__sid"), F.col(vec_col).alias("__sv")),
        "__sid", "__sv", 1,
    )
    if max_cluster_size is not None:
        if max_cluster_size < 2:
            raise ValueError(
                f"max_cluster_size must be >= 2, got {max_cluster_size}"
            )
        w = Window.partitionBy("centroid_id")
        assigned = (
            assigned.withColumn("__csz", F.count(F.lit(1)).over(w))
            .where(F.col("__csz") <= max_cluster_size)
            .drop("__csz")
        )
    if compute == "grouped":
        return _semantic_pairs_grouped(
            assigned, df.schema[id_col].dataType.simpleString(),
            threshold=threshold, round_to=round_to,
        )
    a = assigned.select(
        F.col("centroid_id").alias("cluster_id"),
        F.col("__sid").alias("id_a"),
        F.col("__sv").alias("__va"),
    )
    b = assigned.select(
        F.col("centroid_id").alias("cluster_id"),
        F.col("__sid").alias("id_b"),
        F.col("__sv").alias("__vb"),
    )
    cand = a.join(b, "cluster_id").where(F.col("id_a") < F.col("id_b"))
    if compute == "arrow":
        scored = _pairwise_cosine_arrow(
            cand.select("cluster_id", "id_a", "id_b", "__va", "__vb"),
            a_col="__va", b_col="__vb", round_to=round_to,
        )
    else:
        score = cosine(F.col("__va"), F.col("__vb"))
        if round_to is not None:
            score = F.round(score, round_to)
        scored = cand.select("cluster_id", "id_a", "id_b", score.alias("cosine"))
    return scored.where(F.col("cosine") >= threshold).select(
        "id_a", "id_b", "cluster_id", "cosine"
    )


def semantic_contamination_pairs(
    df: DataFrame,
    bench: DataFrame,
    *,
    id_col: str,
    vec_col: str = "embedding",
    bench_id_col: str | None = None,
    bench_vec_col: str | None = None,
    n_clusters: int = 16,
    threshold: float = 0.9,
    seed: int = 42,
    hash_fn: str = "xxhash64",
    compute: str = "expr",
    round_to: int | None = 6,
    refine_iters: int = 0,
) -> DataFrame:
    """Embedding-level benchmark contamination: (corpus_id, bench_id,
    cluster_id, cosine >= threshold) pairs between a training corpus and
    a held-out eval set — the semantic sibling of the n-gram
    :func:`dedup.decontaminate` (paraphrased or translated eval items
    that share no 8-gram still collide in embedding space).

    Physical shape: centroids are sampled (and optionally Lloyd-refined)
    from the CORPUS side only — the deterministic reference frame — and
    BOTH tables assign against them with the shuffle-free kernel; the
    only exchange is the cluster-keyed corpus-bench join, whose bench
    side is benchmark-sized (AQE broadcasts it). Nothing corpus-sized is
    ever pairwise."""
    bench_id_col = bench_id_col or id_col
    bench_vec_col = bench_vec_col or vec_col
    if compute not in ("expr", "arrow"):
        raise ValueError(f"compute must be 'expr' or 'arrow', got {compute!r}")
    centroids = _ivf_centroids(
        df, corpus_id=id_col, corpus_vec=vec_col, nlist=n_clusters,
        seed=seed, hash_fn=hash_fn, refine_iters=refine_iters,
    )
    assign = _ivf_assign_factory(centroids, compute=compute, nlist=n_clusters)
    corpus_a = assign(
        df.select(F.col(id_col).alias("__cid"), F.col(vec_col).alias("__cv")),
        "__cid", "__cv", 1,
    ).select(
        F.col("centroid_id").alias("cluster_id"),
        F.col("__cid").alias("corpus_id"),
        F.col("__cv").alias("__va"),
    )
    bench_a = assign(
        bench.select(
            F.col(bench_id_col).alias("__bid"),
            F.col(bench_vec_col).alias("__bv"),
        ),
        "__bid", "__bv", 1,
    ).select(
        F.col("centroid_id").alias("cluster_id"),
        F.col("__bid").alias("bench_id"),
        F.col("__bv").alias("__vb"),
    )
    cand = corpus_a.join(bench_a, "cluster_id")
    if compute == "arrow":
        scored = _pairwise_cosine_arrow(
            cand.select("cluster_id", "corpus_id", "bench_id", "__va", "__vb"),
            a_col="__va", b_col="__vb", round_to=round_to,
        )
    else:
        score = cosine(F.col("__va"), F.col("__vb"))
        if round_to is not None:
            score = F.round(score, round_to)
        scored = cand.select(
            "cluster_id", "corpus_id", "bench_id", score.alias("cosine")
        )
    return scored.where(F.col("cosine") >= threshold).select(
        "corpus_id", "bench_id", "cluster_id", "cosine"
    )


def semantic_decontaminate(
    df: DataFrame,
    bench: DataFrame,
    *,
    id_col: str,
    vec_col: str = "embedding",
    **kwargs,
) -> DataFrame:
    """Drop every corpus row with a semantic near-duplicate in the
    benchmark (same keep-unscored policy as the n-gram decontaminate:
    rows without an embedding row simply produce no pair and survive).
    Returns the surviving rows of ``df`` unchanged."""
    pairs = semantic_contamination_pairs(
        df, bench, id_col=id_col, vec_col=vec_col, **kwargs
    )
    hits = pairs.select(F.col("corpus_id").alias(id_col)).distinct()
    return df.join(hits, id_col, "left_anti")


def _semantic_pairs_grouped(
    assigned: DataFrame,
    id_type: str,
    *,
    threshold: float,
    round_to: int | None,
) -> DataFrame:
    """The ``compute='grouped'`` scoring stage of :func:`semantic_dup_pairs`:
    ONE shuffle keyed by cluster — each vector is written and read
    exactly once (the self-join kernels reuse one exchange but read it
    twice and materialize pair-carrying-vector rows) — then the full
    within-cluster cosine as a single (c x dim) @ (dim x c) matmul per
    cluster. Emits only the surviving (id_a < id_b, cosine >= threshold)
    pairs, so nothing pair-shaped ever hits the wire.

    Degenerate contract matches the expr kernel's observable output:
    NULL / empty / ragged-width vectors and NaN-poisoned scores can never
    reach the threshold there (NULL and NaN both fail ``>=``), and here
    they are excluded by construction (only equal-width valid vectors
    pair; zero-norm denominators divide to NaN, which fails the keep
    mask). Scores share the arrow kernels' np.round-vs-F.round last-ulp
    caveat."""
    import numpy as np
    import pandas as pd

    out_schema = f"id_a {id_type}, id_b {id_type}, cluster_id int, cosine double"
    thr = float(threshold)
    cols = ["id_a", "id_b", "cluster_id", "cosine"]

    def score_cluster(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            return pd.DataFrame(columns=cols)
        cid = int(pdf["centroid_id"].iloc[0])
        pdf = pdf.sort_values("__sid", kind="mergesort")
        ids = pdf["__sid"].to_numpy()
        vals = pdf["__sv"].to_numpy()
        lengths = np.fromiter(
            (len(v) if v is not None else -1 for v in vals),
            dtype=np.int64,
            count=n,
        )
        frames = []
        for ln in np.unique(lengths):
            if ln <= 0:
                continue
            idx = np.flatnonzero(lengths == ln)
            if len(idx) < 2:
                continue
            vmat = np.vstack(vals[idx]).astype(np.float64)
            norms = np.linalg.norm(vmat, axis=1)
            with np.errstate(divide="ignore", invalid="ignore"):
                scores = (vmat @ vmat.T) / np.outer(norms, norms)
            if round_to is not None:
                scores = np.round(scores, round_to)
            iu, ju = np.triu_indices(len(idx), k=1)
            s = scores[iu, ju]
            with np.errstate(invalid="ignore"):
                keep = s >= thr
            if keep.any():
                frames.append(
                    pd.DataFrame(
                        {
                            "id_a": ids[idx[iu[keep]]],
                            "id_b": ids[idx[ju[keep]]],
                            "cluster_id": cid,
                            "cosine": s[keep],
                        }
                    )
                )
        if not frames:
            return pd.DataFrame(columns=cols)
        return pd.concat(frames, ignore_index=True)

    return assigned.groupBy("centroid_id").applyInPandas(score_cluster, out_schema)


def semantic_dedup(
    df: DataFrame,
    *,
    id_col: str,
    vec_col: str = "embedding",
    n_clusters: int = 16,
    threshold: float = 0.9,
    seed: int = 42,
    hash_fn: str = "xxhash64",
    compute: str = "expr",
    max_cluster_size: int | None = None,
    refine_iters: int = 0,
) -> DataFrame:
    """Drop every row with a semantic near-duplicate of smaller id —
    the same pairwise canonicalization policy as :func:`minhash_dedup`
    (feed :func:`semantic_dup_pairs` into
    :func:`dedup.connected_components` for transitive grouping
    instead). Returns the surviving rows of ``df`` unchanged."""
    pairs = semantic_dup_pairs(
        df, id_col=id_col, vec_col=vec_col, n_clusters=n_clusters,
        threshold=threshold, seed=seed, hash_fn=hash_fn, compute=compute,
        max_cluster_size=max_cluster_size, refine_iters=refine_iters,
    )
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, id_col, "left_anti")


# ---------------------------------------------------------------------------
# Product quantization (IVF-PQ's PQ half): compress vectors to m small codes
# so 100 TB of embeddings fit the memory/shuffle budget ANN needs.
# ---------------------------------------------------------------------------


def _pq_probe_dim(df: DataFrame, vec_col: str, id_col: str) -> int:
    """Dimension of the MIN-id non-null vector — ONE bounded aggregate
    (the same class of driver probe ivf_search's centroid collect
    performs). Keyed on the smallest id rather than "whichever row the
    first partition yields": on a mixed-width corpus an arbitrary-row
    probe would make the trained codebook partition-order-dependent,
    breaking the module's determinism contract."""
    row = (
        df.where(F.col(vec_col).isNotNull())
        .agg(F.min_by(F.size(vec_col), F.col(id_col)).alias("d"))
        .head()
    )
    if row is None or row["d"] is None:
        raise ValueError(f"no non-null vectors in column {vec_col!r}")
    return int(row["d"])


def _pq_sub_sample_hash(cid: Column, seed: int, hash_fn: str) -> Column:
    """The EXACT sample-ordering hash :func:`_ivf_centroids` uses for a
    given seed — shared so pq_train's single-collect local path selects
    the same per-subspace rows the m TakeOrdered jobs would."""
    if hash_fn == "xxhash64":
        return F.xxhash64(cid.cast("string"), F.lit(seed))
    return F.conv(
        F.substring(F.md5(F.concat(cid.cast("string"), F.lit(f":{seed}"))), 1, 15),
        16,
        10,
    ).cast("long")


def _pq_cap_thr(cap: int, n: int) -> int:
    """Integer-exact hash-bucket threshold for "keep ~cap of n rows":
    ceil(cap * B / n) in pure integer arithmetic, so an external SQL
    oracle replays the same threshold with no float-rounding hazard."""
    from timefence_spark.operators.sampling import _BUCKETS

    return (cap * _BUCKETS + n - 1) // n


def _pq_cap_training_rows(
    corpus: DataFrame, *, corpus_id: str, cap: int, seed: int, hash_fn: str
) -> DataFrame:
    """Distributed-path training cap (VERDICT r10 item 4): when the
    corpus holds more than ``cap`` valid rows, keep the deterministic
    ~cap-row salted-hash sample (pure function of ids — stable under
    repartition, replayable by the oracle). One count job; the filter
    itself is scan-side."""
    from timefence_spark.operators.sampling import _BUCKETS, _salted_hash

    n = corpus.count()
    if n <= cap:
        return corpus
    thr = _pq_cap_thr(cap, n)
    h = _salted_hash(F.col(corpus_id), f"pqtraincap:{seed}", hash_fn)
    return corpus.where(F.pmod(h, F.lit(_BUCKETS)) < thr)


def _pq_train_local_attempt(
    corpus: DataFrame,
    *,
    corpus_id: str,
    corpus_vec: str,
    m: int,
    ksub: int,
    dsub: int,
    seed: int,
    hash_fn: str,
    local_threshold: int,
    train_cap: int | None,
):
    """Size-gated single-collect PQ training (VERDICT r10 item 4): pull
    at most ``local_threshold + 1`` valid rows — each carrying its m
    Spark-computed per-subspace sample hashes plus the cap hash, so NO
    hash is ever re-implemented driver-side — and run the identical
    (hash asc, top-ksub, slice) selection in one pass. Returns None on
    overflow (the caller falls through to the m-TakeOrdered distributed
    loop). Replaces m scheduler round-trips with one bounded collect;
    selection, and therefore the codebook, is byte-identical to the
    distributed path's by construction."""
    from pyspark.sql import types as T

    from timefence_spark.operators.sampling import _BUCKETS, _salted_hash

    cid = F.col(corpus_id)
    cols = [F.col(corpus_vec).alias("__v")]
    cols.append(
        F.pmod(
            _salted_hash(cid, f"pqtraincap:{seed}", hash_fn), F.lit(_BUCKETS)
        ).alias("__hcap")
    )
    for sub in range(m):
        cols.append(
            _pq_sub_sample_hash(cid, seed + sub, hash_fn).alias(f"__h{sub}")
        )
    rows = corpus.select(*cols).limit(local_threshold + 1).collect()
    if len(rows) > local_threshold:
        return None
    n = len(rows)
    if train_cap is not None and n > train_cap:
        thr = _pq_cap_thr(train_cap, n)
        rows = [r for r in rows if r["__hcap"] < thr]
    out = []
    for sub in range(m):
        key = f"__h{sub}"
        lo, hi = sub * dsub, (sub + 1) * dsub
        for code, r in enumerate(sorted(rows, key=lambda r: r[key])[:ksub]):
            out.append((sub, code, [float(x) for x in r["__v"][lo:hi]]))
    spark = corpus.sparkSession
    schema = T.StructType(
        [
            T.StructField("sub", T.IntegerType(), False),
            T.StructField("code", T.IntegerType(), False),
            T.StructField(
                "centroid", T.ArrayType(T.DoubleType(), False), True
            ),
        ]
    )
    return spark.createDataFrame(out, schema)


def pq_train(
    corpus: DataFrame,
    *,
    corpus_id: str,
    corpus_vec: str = "embedding",
    m: int = 8,
    nbits: int = 4,
    seed: int = 42,
    hash_fn: str = "xxhash64",
    refine_iters: int = 0,
    train_fraction: float | None = None,
    train_cap: int | str | None = "auto",
    local_threshold: int = 65_536,
    mode: str = "auto",
) -> DataFrame:
    """Train a product-quantization codebook (Jégou et al. 2011, the PQ
    half of FAISS-style IVF-PQ): split every vector into ``m``
    contiguous subvectors and learn ``2**nbits`` sub-centroids per
    subspace. Returns (sub, code, centroid) with ``m * 2**nbits`` rows —
    the whole model is KBs regardless of corpus size.

    Deterministic like the IVF centroids it reuses: each subspace's
    codes are a salted hash-sample of the corpus's subvectors (seed
    offset by subspace), optionally polished with ``refine_iters``
    Lloyd iterations under the ENCODING metric — L2 argmin with
    smaller-code ties, exactly :func:`pq_encode`'s key, so training
    optimizes what search actually measures — with the same sorted-fold
    means contract as :func:`_refine_centroids`. ``train_fraction``
    hash-samples the training rows first — PQ codebooks converge on a
    sample; training on all of 100 TB buys nothing.

    ``train_cap`` (VERDICT r10 item 4) bounds the DISTRIBUTED training
    set the way Faiss bounds codebook training (max_points_per_centroid
    = 256): ``"auto"`` caps at ``256 * 2**nbits`` rows via the same
    salted-hash predicate :func:`hash_sample` uses, with an
    integer-exact threshold ``ceil(cap * B / n)`` an external SQL
    oracle replays verbatim (no float rounding); ``None`` disables.
    The cap only engages past ``local_threshold`` (below it the whole
    training set is one bounded collect — see below), so small-corpus
    results are byte-identical with or without it.

    100 TB shape: corpora whose VALID rows fit ``local_threshold``
    (``mode='auto'``) collect ONCE — per-subspace sample hashes ride
    the same collect, selection happens driver-side with the identical
    (hash asc, top-ksub) rule — replacing m TakeOrdered jobs with one
    (~8x fewer scheduler round-trips for m=8; measured 1.75s -> ~0.4s
    of knn_ivf_pq's inline train at sf0.1). Past the gate
    (``mode='distributed'`` forces it), sampling is m TakeOrdered jobs
    over the capped rows (per-partition top-k + driver merge; id + one
    slice read each). Each Lloyd iteration is ONE corpus pass — a
    shuffle-free join-kernel encode feeding one (sub, code, pos)-keyed
    shuffle of doubles — not m per-subspace passes, and always
    distributed. Vector dim must divide evenly by ``m`` (the standard
    PQ layout)."""
    if m < 1:
        raise ValueError(f"m must be >= 1, got {m}")
    if not 1 <= nbits <= 8:
        raise ValueError(f"nbits must be in [1, 8], got {nbits}")
    if mode not in ("auto", "distributed"):
        raise ValueError(f"mode must be auto|distributed, got {mode!r}")
    if train_cap == "auto":
        train_cap = 256 * 2**nbits
    elif train_cap is not None and int(train_cap) < 1:
        raise ValueError(f"train_cap must be >= 1, got {train_cap}")
    if train_fraction is not None:
        from timefence_spark.operators.sampling import hash_sample

        corpus = hash_sample(
            corpus, id_col=corpus_id, fraction=train_fraction,
            salt=f"pqtrain:{seed}", hash_fn=hash_fn,
        )
    dim = _pq_probe_dim(corpus, corpus_vec, corpus_id)
    if dim % m:
        raise ValueError(f"vector dim {dim} is not divisible by m={m}")
    # Codebooks train on VALID vectors only: a NULL/off-width row sampled
    # as a sub-centroid would poison every argmin with a NULL distance
    # key (the IVF sampler keeps NULLs for cross-join parity; a PQ model
    # has no use for them).
    corpus = corpus.where(
        F.col(corpus_vec).isNotNull() & (F.size(corpus_vec) == dim)
    )
    dsub = dim // m
    ksub = 2**nbits
    if mode == "auto" and not refine_iters:
        local = _pq_train_local_attempt(
            corpus, corpus_id=corpus_id, corpus_vec=corpus_vec, m=m,
            ksub=ksub, dsub=dsub, seed=seed, hash_fn=hash_fn,
            local_threshold=local_threshold,
            train_cap=None if train_cap is None else int(train_cap),
        )
        if local is not None:
            return local
    if train_cap is not None:
        corpus = _pq_cap_training_rows(
            corpus, corpus_id=corpus_id, cap=int(train_cap), seed=seed,
            hash_fn=hash_fn,
        )
        # The distributed loop reads its source once per subspace (m
        # TakeOrdered passes, +1 per Lloyd iteration). Pin it HERE
        # rather than relying on callers reading a docstring (VERDICT
        # r10 item 5): a computed source — rotate_vectors' dim^2
        # matvec, ivf_pq_topk's residual join — would otherwise re-run
        # its projection chain per pass. Post-cap the pinned table is
        # ~train_cap rows, so the materialization stays bounded at any
        # input scale; with train_cap=None (explicitly unbounded
        # training) the scan-per-pass shape is kept — materializing a
        # 100 TB source would be worse than m re-scans.
        corpus = pin(corpus)
    books = []
    for sub in range(m):
        sliced = corpus.select(
            F.col(corpus_id),
            F.slice(F.col(corpus_vec), sub * dsub + 1, dsub).alias("__sv"),
        )
        cb = _ivf_centroids(
            sliced, corpus_id=corpus_id, corpus_vec="__sv", nlist=ksub,
            seed=seed + sub, hash_fn=hash_fn,
        )
        books.append(
            cb.select(
                F.lit(sub).alias("sub"),
                F.col("centroid_id").alias("code"),
                F.col("centroid").cast("array<double>").alias("centroid"),
            )
        )
    out = books[0]
    for b in books[1:]:
        out = out.unionByName(b)
    if refine_iters:
        # pin() per iteration: iteration i+1's encode collects/broadcasts
        # the refined book, which would otherwise re-execute every prior
        # iteration's corpus-wide aggregation chain (O(iters^2)).
        out = pin(out)
        for _ in range(int(refine_iters)):
            out = pin(
                _pq_refine(
                    out, corpus, corpus_id=corpus_id, corpus_vec=corpus_vec,
                    dsub=dsub,
                )
            )
    return out


def _pq_refine(
    book: DataFrame,
    corpus: DataFrame,
    *,
    corpus_id: str,
    corpus_vec: str,
    dsub: int,
) -> DataFrame:
    """One PQ Lloyd iteration, all subspaces in ONE corpus pass: encode
    every vector with the current codebook (the join kernel — L2 argmin,
    smaller-code ties, exactly what search will measure; the IVF
    refiner's cosine assignment is the wrong metric for subvectors),
    then move each (sub, code) to its members' elementwise mean via the
    same SORTED sequential fold as :func:`_refine_centroids` (0.0-init,
    member-id order — bit-reproducible by an external SQL engine).
    Codes with no members keep their previous centroid (the standard
    deterministic k-means convention)."""
    encoded = pq_encode(
        corpus, corpus_id=corpus_id, corpus_vec=corpus_vec, codebook=book,
        compute="join",
    )
    vecs = corpus.select(
        F.col(corpus_id).alias("__rid"),
        F.col(corpus_vec).cast("array<double>").alias("__rv"),
    )
    members = (
        encoded.where(F.col("codes").isNotNull())
        .select(F.col(corpus_id).alias("__rid"), "codes")
        .join(vecs, "__rid")
        .select("__rid", "__rv", F.posexplode("codes").alias("sub", "code"))
        .select(
            "__rid", "sub", "code",
            F.posexplode(
                F.expr(f"slice(`__rv`, sub * {dsub} + 1, {dsub})")
            ).alias("__p", "__x"),
        )
    )
    sums = members.groupBy("sub", "code", "__p").agg(
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("__rid").alias("r"),
                        F.col("__x").cast("double").alias("x"),
                    )
                )
            ),
            F.lit(0.0),
            lambda acc, s: acc + s["x"],
        ).alias("__s"),
        F.count(F.lit(1)).alias("__c"),
    )
    means = (
        sums.select(
            "sub", "code",
            F.struct(F.col("__p"), (F.col("__s") / F.col("__c")).alias("m")).alias(
                "__pm"
            ),
        )
        .groupBy("sub", "code")
        .agg(F.array_sort(F.collect_list("__pm")).alias("__pms"))
        .select(
            "sub", "code",
            F.transform("__pms", lambda s: s["m"]).alias("__new"),
        )
    )
    return book.join(means, ["sub", "code"], "left").select(
        "sub", "code",
        F.coalesce("__new", F.col("centroid")).alias("centroid"),
    )


def _pq_check_literal_budget(books: dict) -> None:
    """The expr PQ kernels embed the codebook as SQL literals (the model
    is KBs at sane settings: m=8, nbits=4, dim<=128 -> <=2^4*128 = 2048
    doubles). Past the expr budget the generated SQL stops being
    parseable in reasonable time — raise so the callers fall back to the
    bit-identical 'join' kernel (the same gating idea as the IVF
    assignment kernels, with a stronger fallback: no ulp caveat)."""
    total = sum(
        len(v) for entries in books.values() for _, v, _ in entries
        if v is not None
    )
    if total > _ASSIGN_EXPR_MAX_LITERALS:
        raise ValueError(
            f"PQ codebook embeds {total} literal doubles — past the expr "
            f"budget ({_ASSIGN_EXPR_MAX_LITERALS}). Reduce m/nbits (the "
            "codebook is m * 2**nbits * dim/m doubles = dim * 2**nbits), "
            "or train on a lower-dimensional projection."
        )


def _pq_collect_codebook(codebook: DataFrame):
    """codebook -> {sub: [(code, vec, half_sqnorm), ...] sorted by code}.
    One driver collect of m * ksub rows — the model is KBs."""
    by_sub: dict[int, list] = {}
    for r in codebook.collect():
        vec = list(r["centroid"]) if r["centroid"] is not None else None
        half = None
        if vec is not None:
            # Same sequential fold order as the encode expression's dot:
            # acc = 0.0; acc += x*x left-to-right (bit-reproducible).
            acc = 0.0
            for x in vec:
                acc += float(x) * float(x)
            half = 0.5 * acc
        by_sub.setdefault(int(r["sub"]), []).append(
            (int(r["code"]), vec, half)
        )
    for sub in by_sub:
        by_sub[sub].sort(key=lambda t: t[0])
    return dict(sorted(by_sub.items()))


def _pq_book_row(codebook: DataFrame) -> DataFrame:
    """The codebook as ONE nested-array row, ordered (sub asc, code asc):
    ``book: array<struct<sub, entries: array<struct<code, centroid>>>>``.
    Broadcast-cross-joined onto the corpus it is the collect-free,
    unbounded alternative to embedding the codebook as SQL literals."""
    per_sub = codebook.groupBy("sub").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("code").cast("int").alias("code"),
                    F.col("centroid").cast("array<double>").alias("centroid"),
                )
            )
        ).alias("entries")
    )
    return per_sub.groupBy().agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("sub").cast("int").alias("sub"), "entries"))
        ).alias("__book")
    )


# SQL fragments shared by both PQ kernels: the same sequential folds the
# oracle replays (zip_with product fold, 0D-init accumulation).
def _pq_dot_sql(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * y),"
        " 0D, (acc, v) -> acc + v)"
    )


# Residual of a row against its assigned coarse centroid (`__cv` minus
# `__centv`), element-wise in double arithmetic. zip_with's NULL padding
# preserves the degenerate-input contract: NULL vectors, width mismatches
# against the centroid, and NULL elements all surface as NULL elements
# that pq_encode's validity guard turns into NULL codes.
_RESIDUAL_SQL = (
    "zip_with(`__cv`, `__centv`,"
    " (x, y) -> CAST(x AS DOUBLE) - CAST(y AS DOUBLE))"
)


def truncate_embeddings(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    dims: int,
    out_col: str | None = None,
    renormalize: bool = True,
) -> DataFrame:
    """Matryoshka-style prefix truncation: keep the first ``dims``
    components of each vector, optionally L2-renormalized — the standard
    memory/latency lever for MRL-trained embeddings (Kusupati et al.
    2022), where nested prefixes are themselves valid representations.
    A pure scan-side projection; at 100 TB it cuts every downstream ANN
    shuffle/scan by dim_old/dims before any quantization rung applies
    (and composes with all of them — truncate, then SQ/PQ/BQ).

    Degenerate rows — NULL vector, fewer than ``dims`` components, a
    NULL element inside the kept prefix, or (under ``renormalize``) a
    zero-norm prefix — truncate to NULL, the module's NULL-not-error
    contract. Cosine over truncated vectors is identical with and
    without renormalization; renormalize matters when downstream
    consumers read raw dot products or vector bytes."""
    if dims < 1:
        raise ValueError(f"dims must be >= 1, got {dims}")
    out = out_col or vec_col
    sliced = F.transform(
        F.slice(F.col(vec_col), 1, dims), lambda x: x.cast("double")
    )
    ok = (
        F.col(vec_col).isNotNull()
        & (F.size(vec_col) >= dims)
        & (F.size(F.filter(sliced, lambda x: x.isNull())) == 0)
    )
    if not renormalize:
        return df.withColumn(out, F.when(ok, sliced))
    # Stage the prefix and its norm in their own projections: an outer
    # norm referenced inside the transform lambda would re-run the
    # whole L2 fold PER ELEMENT (HOF lambdas are not CSE'd — the same
    # trap sq_encode documents); the staged aliases are multi-referenced
    # non-cheap expressions, which CollapseProject leaves alone.
    staged = df.withColumn("__mrl_v", F.when(ok, sliced)).withColumn(
        "__mrl_n", l2_norm(F.col("__mrl_v"))
    )
    return staged.withColumn(
        out,
        F.when(
            F.col("__mrl_n") > 0,
            F.transform(
                F.col("__mrl_v"), lambda x: x / F.col("__mrl_n")
            ),
        ),
    ).drop("__mrl_v", "__mrl_n")


def jl_projection(
    dim: int, dims: int, seed: int = 42
) -> list[list[float]]:
    """Seeded orthonormal random projection (Johnson–Lindenstrauss):
    the first ``dims`` rows of the seeded orthogonal matrix
    :func:`opq_rotation` builds — a ``dims x dim`` matrix whose rows
    are orthonormal, so projected dot products approximate the
    originals with the JL distortion bound. A driver-side constant
    like :func:`_hyperplanes`: both engines of an oracle replay
    receive the same literals, which is what keeps the projected-ANN
    entry exactly SQL-replayable (the data-adaptive variant is
    :func:`pca_train`)."""
    if not 1 <= dims <= dim:
        raise ValueError(f"dims must be in [1, {dim}], got {dims}")
    return opq_rotation(dim, seed)[:dims]


def pca_train(
    corpus: DataFrame,
    *,
    corpus_id: str,
    corpus_vec: str = "embedding",
    dims: int,
    center: bool = True,
    train_cap: int = 16_384,
    seed: int = 42,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """A PCA projection for the ANN ladder: ``(pos, row, bias, var)``
    with ``row`` the pos-th principal axis (unit length, ordered by
    explained variance desc), ``bias = -<row, mean>`` when ``center``
    (so the affine map :func:`project_vectors` applies is
    ``<row, x - mean>``, faiss ``PCAMatrix``'s geometry), and ``var``
    the axis's sample variance. Apply with :func:`project_vectors`,
    then run any downstream rung (exact / SQ / PQ / BQ) in the reduced
    space — the classic dim-reduction rung between MRL truncation
    (prefix, training-dependent) and OPQ (square, PQ-specific).

    Training runs DRIVER-side on a deterministic salted-hash sample of
    at most ``train_cap`` rows (the same pure-function-of-ids rule as
    pq_train's cap — partitioning/rerun-stable), via one dim x dim
    covariance eigendecomposition; axes are sign-fixed (largest-|x|
    coordinate positive, first index on ties) so the decomposition is
    unique. Like ``opq_train(method='parametric')`` this is
    deliberately NOT oracle-covered — LAPACK eigenvectors are
    deterministic per platform but not bit-portable across engines —
    and its quality gate is the recall property test (PCA >= the
    seeded :func:`jl_projection` on anisotropic data); everything
    DOWNSTREAM of the returned projection keeps the exact-replay
    contract since the matrix is just data.

    100 TB shape: the model is dims x dim doubles (KBs); training
    reads one bounded sample (TakeOrdered by salted hash — no
    shuffle); application is a scan-side projection that shrinks every
    downstream ANN shuffle/scan by dim/dims."""
    import numpy as np

    from timefence_spark.operators.sampling import _salted_hash

    dim = _pq_probe_dim(corpus, corpus_vec, corpus_id)
    if not 1 <= dims <= dim:
        raise ValueError(f"dims must be in [1, {dim}], got {dims}")
    if train_cap < 2:
        raise ValueError(f"train_cap must be >= 2, got {train_cap}")
    sample = (
        corpus.where(
            F.col(corpus_vec).isNotNull()
            & (F.size(corpus_vec) == dim)
            # A single NULL element becomes NaN under numpy and poisons
            # the whole covariance — same valid-row contract as sq_train.
            & (
                F.expr(
                    f"size(filter(`{corpus_vec}`, x -> x IS NULL))"
                )
                == 0
            )
        )
        .select(
            F.col(corpus_vec).alias("__v"),
            _salted_hash(
                F.col(corpus_id), f"pcatrain:{seed}", hash_fn
            ).alias("__h"),
        )
        .orderBy("__h")
        .limit(train_cap)
        .collect()
    )
    X = np.array([r["__v"] for r in sample], dtype=np.float64)
    if X.shape[0] < 2:
        raise ValueError(
            f"pca_train needs >= 2 valid training vectors, got {X.shape[0]}"
        )
    mean = X.mean(0) if center else np.zeros(dim)
    Xc = X - mean
    cov = (Xc.T @ Xc) / (X.shape[0] - 1)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:dims]
    rows = []
    for pos, j in enumerate(order):
        axis = evecs[:, j]
        # unique up to sign: make the largest-|x| coordinate positive
        pivot = int(np.argmax(np.abs(axis)))
        if axis[pivot] < 0:
            axis = -axis
        rows.append(
            (
                pos,
                [float(x) for x in axis],
                float(-(axis @ mean)) if center else 0.0,
                float(max(evals[j], 0.0)),
            )
        )
    return corpus.sparkSession.createDataFrame(
        rows, "pos int, row array<double>, bias double, var double"
    )


def project_vectors(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    projection: DataFrame,
    out_col: str | None = None,
    renormalize: bool = False,
    compute: str = "expr",
    materialize: bool = False,
) -> DataFrame:
    """Apply an affine projection (``(pos, row [, bias])`` as from
    :func:`pca_train`, or a seeded :func:`jl_projection` matrix loaded
    into the same shape) to a vector column:
    ``out[i] = <row_i, x> + bias_i`` — a RECTANGULAR generalization of
    :func:`rotate_vectors` (same scan-side shape, same NULL-not-error
    contract, same expr/join kernel split and literal budget, same
    ``materialize`` escape for multi-consumer pipelines). With
    ``renormalize`` the projected vector is L2-normalized (staged norm
    so the HOF lambda cannot re-fold per element — the
    truncate_embeddings trap), which downstream cosine rungs need
    because projection does not preserve norms the way a square
    rotation does; a zero-norm projection normalizes to NULL."""
    if compute not in ("expr", "join"):
        raise ValueError(f"compute must be 'expr' or 'join', got {compute!r}")
    out = out_col or vec_col
    has_bias = "bias" in projection.columns
    bias_col = (
        F.col("bias") if has_bias else F.lit(0.0).cast("double")
    )
    proj = projection.select("pos", "row", bias_col.alias("bias"))
    if compute == "expr":
        rows = sorted(proj.collect(), key=lambda r: r["pos"])
        if not rows:
            raise ValueError("empty projection")
        dim = len(rows[0]["row"])
        if len(rows) * dim > _ASSIGN_EXPR_MAX_LITERALS:
            warnings.warn(
                f"projection embeds {len(rows) * dim} literal doubles — "
                f"past the expr budget ({_ASSIGN_EXPR_MAX_LITERALS}). "
                "Falling back to compute='join' (bit-identical).",
                stacklevel=2,
            )
            compute = "join"
        else:
            mat = "array(" + ",".join(
                "named_struct('r', array("
                + ",".join(_sql_double(x) for x in r["row"])
                + f"), 'b', {_sql_double(r['bias'])})"
                for r in rows
            ) + ")"
            projected = f"transform({mat}, p -> " + _pq_dot_sql(
                "p.r", f"`{vec_col}`"
            ) + " + p.b)"
            ok = (
                F.col(vec_col).isNotNull()
                & (F.size(vec_col) == dim)
                & (F.size(F.filter(vec_col, lambda x: x.isNull())) == 0)
            )
            res = df.withColumn(out, F.when(ok, F.expr(projected)))
            res = _renorm(res, out) if renormalize else res
            return pin(res) if materialize else res
    row_df = proj.groupBy().agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col("pos"), F.col("row"), F.col("bias"))
                )
            ),
            lambda s: F.struct(s["row"].alias("r"), s["bias"].alias("b")),
        ).alias("__proj")
    )
    dim_expr = F.size(F.element_at("__proj", 1)["r"])
    ok = (
        F.col(vec_col).isNotNull()
        & (F.size(vec_col) == dim_expr)
        & (F.size(F.filter(vec_col, lambda x: x.isNull())) == 0)
    )
    projected = "transform(`__proj`, p -> " + _pq_dot_sql(
        "p.r", f"`{vec_col}`"
    ) + " + p.b)"
    res = (
        df.crossJoin(F.broadcast(row_df))
        .withColumn(out, F.when(ok, F.expr(projected)))
        .drop("__proj")
    )
    res = _renorm(res, out) if renormalize else res
    return pin(res) if materialize else res


def _renorm(df: DataFrame, col: str) -> DataFrame:
    """L2-normalize an array<double> column in place; zero-norm or NULL
    input -> NULL. Staged norm projection (no per-element re-fold)."""
    staged = df.withColumn("__pv_n", l2_norm(F.col(col)))
    return staged.withColumn(
        col,
        F.when(
            F.col("__pv_n") > 0,
            F.transform(F.col(col), lambda x: x / F.col("__pv_n")),
        ),
    ).drop("__pv_n")


def opq_rotation(dim: int, seed: int = 42) -> list[list[float]]:
    """Seeded random orthogonal matrix: QR of a seeded Gaussian, with the
    decomposition made unique by sign-fixing against R's diagonal. A
    driver-side constant like :func:`_hyperplanes` — both engines of an
    oracle replay receive the same literals, so replay needs no SQL
    linear algebra."""
    import numpy as np

    rng = np.random.RandomState(seed)
    q, r = np.linalg.qr(rng.randn(dim, dim))
    return (q * np.sign(np.diag(r))).tolist()


def opq_train(
    corpus: DataFrame,
    *,
    corpus_id: str,
    corpus_vec: str = "embedding",
    seed: int = 42,
    method: str = "seeded",
    iters: int = 5,
    m: int = 8,
    nbits: int = 4,
    train_cap: int = 16_384,
    lloyd_iters: int = 3,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """An OPQ rotation for the PQ pipeline: (pos, row) with ``row`` the
    pos-th row of an orthogonal matrix sized to the corpus's vector
    dim. Apply with :func:`rotate_vectors` to corpus AND queries, then
    run the unchanged pq_train/pq_encode/pq_topk — cosine is invariant
    under orthogonal maps (<Rq, Rx> = <q, x>, |Rx| = |x|), so rotation
    changes only HOW the coordinates split into PQ subspaces.

    ``method='seeded'`` (default) is the seeded random-rotation variant
    (Ge et al. 2013's initialization; faiss ``RandomRotationMatrix``):
    it balances per-subspace variance, which is most of parametric
    OPQ's win when a few dimensions carry most of the energy, and it is
    data-independent-given-dim — the whole rotated-PQ pipeline keeps
    the module's SQL-replayability contract.

    ``method='parametric'`` (VERDICT r10 item 6) is the data-adaptive
    alternation (Ge et al. 2013 OPQ-P; faiss ``OPQMatrix``): encode a
    bounded training sample under the current rotation, solve the
    orthogonal Procrustes problem ``min_R ||X R^T - Y||_F`` against the
    reconstructions via one d x d SVD, repeat ``iters`` times from the
    seeded initialization. Everything runs DRIVER-side on a
    deterministic salted-hash sample of at most ``train_cap`` rows
    (sample selection is the same pure-function-of-ids rule as
    pq_train's cap, so it is partitioning/rerun-stable), with
    sub-codebooks fitted by ``lloyd_iters`` Lloyd steps per subspace.
    This variant is deliberately NOT oracle-covered: LAPACK's SVD is
    deterministic per platform but not bit-portable across engines, so
    its quality gate is the recall property test (parametric >= seeded
    on anisotropic data — tests/test_similarity.py) instead of a SQL
    replay; everything DOWNSTREAM of the returned rotation (rotate ->
    pq_train -> ADC) keeps its exact-replay contract since the
    rotation is just data.

    100 TB shape: the model is dim^2 doubles (KBs); training reads one
    bounded sample (TakeOrdered by salted hash — no shuffle); rotation
    application is a scan-side projection (see :func:`rotate_vectors`)."""
    if method not in ("seeded", "parametric"):
        raise ValueError(
            f"method must be seeded|parametric, got {method!r}"
        )
    dim = _pq_probe_dim(corpus, corpus_vec, corpus_id)
    spark = corpus.sparkSession
    if method == "seeded":
        rows = [
            (i, [float(x) for x in row])
            for i, row in enumerate(opq_rotation(dim, seed))
        ]
        return spark.createDataFrame(rows, "pos int, row array<double>")
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    if dim % m:
        raise ValueError(f"vector dim {dim} is not divisible by m={m}")
    import numpy as np

    from timefence_spark.operators.sampling import _salted_hash

    sample = (
        corpus.where(
            F.col(corpus_vec).isNotNull() & (F.size(corpus_vec) == dim)
        )
        .select(
            F.col(corpus_vec).alias("__v"),
            _salted_hash(
                F.col(corpus_id), f"opqtrain:{seed}", hash_fn
            ).alias("__h"),
        )
        .orderBy("__h")
        .limit(train_cap)
        .collect()
    )
    X = np.array([r["__v"] for r in sample], dtype=np.float64)
    if X.shape[0] < 2:
        raise ValueError(
            f"parametric OPQ needs >= 2 valid training vectors, got "
            f"{X.shape[0]}"
        )
    R = np.array(opq_rotation(dim, seed), dtype=np.float64)
    ksub, dsub = 2**nbits, dim // m
    for _ in range(int(iters)):
        Z = X @ R.T
        Y = np.empty_like(Z)
        for sub in range(m):
            S = Z[:, sub * dsub: (sub + 1) * dsub]
            C = S[: min(ksub, S.shape[0])].copy()  # hash-order init
            for _ in range(int(lloyd_iters)):
                d2 = (
                    (S * S).sum(1)[:, None]
                    + (C * C).sum(1)[None, :]
                    - 2.0 * (S @ C.T)
                )
                a = d2.argmin(1)
                for k in range(C.shape[0]):
                    mask = a == k
                    if mask.any():
                        C[k] = S[mask].mean(0)
            d2 = (
                (S * S).sum(1)[:, None]
                + (C * C).sum(1)[None, :]
                - 2.0 * (S @ C.T)
            )
            Y[:, sub * dsub: (sub + 1) * dsub] = C[d2.argmin(1)]
        # Procrustes: min_A ||X A - Y||_F over orthogonal A, A = R^T
        U, _s, Vt = np.linalg.svd(X.T @ Y)
        R = (U @ Vt).T
    rows = [(i, [float(x) for x in R[i]]) for i in range(dim)]
    return spark.createDataFrame(rows, "pos int, row array<double>")


def rotate_vectors(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    rotation: DataFrame,
    out_col: str | None = None,
    compute: str = "expr",
    materialize: bool = False,
) -> DataFrame:
    """Apply a rotation (``(pos, row)`` as from :func:`opq_train`) to a
    vector column: ``out[i] = <row_i, x>``. A pure scan-side projection —
    nothing shuffles; the rotated column replaces ``vec_col`` unless
    ``out_col`` names a new one. Degenerate rows (NULL vector, width
    mismatch, NULL elements) rotate to NULL, the module's NULL-not-error
    contract, so downstream pq_train/pq_encode filters see them exactly
    as they would the originals.

    ``compute='expr'`` embeds the dim^2 matrix as plan literals
    (budget-gated like the PQ kernels, falling back with a warning);
    ``compute='join'`` attaches the matrix as ONE nested-array broadcast
    row — no collect, no budget, bit-identical (same sequential dot
    fold).

    Multi-consumer pipelines (VERDICT r10 item 5): ``materialize=True``
    localCheckpoints the rotated table inside the operator, so callers
    no longer hand-``pin()`` from a docstring warning. Every consumer
    of an un-materialized rotation pays the matvec again AND (in expr
    mode) re-compiles a dim^2-literal plan — measured on the
    knn_pq_opq shape at sf0.1: expr-unmaterialized 6.3s,
    join-unmaterialized 4.3s, materialized 3.3s. The default stays
    False because materializing is corpus-sized: at 100 TB the right
    move is writing the rotated corpus once (or feeding single-pass
    consumers, which self-protect — :func:`pq_train` single-collects
    its gated source and pins its capped distributed training rows)."""
    if compute not in ("expr", "join"):
        raise ValueError(f"compute must be 'expr' or 'join', got {compute!r}")
    out = out_col or vec_col
    if compute == "expr":
        rows = sorted(rotation.collect(), key=lambda r: r["pos"])
        if not rows:
            raise ValueError("empty rotation")
        dim = len(rows[0]["row"])
        if len(rows) * dim > _ASSIGN_EXPR_MAX_LITERALS:
            warnings.warn(
                f"rotation embeds {len(rows) * dim} literal doubles — past "
                f"the expr budget ({_ASSIGN_EXPR_MAX_LITERALS}). Falling "
                "back to compute='join' (bit-identical).",
                stacklevel=2,
            )
            compute = "join"
        else:
            mat = "array(" + ",".join(
                "array(" + ",".join(_sql_double(x) for x in r["row"]) + ")"
                for r in rows
            ) + ")"
            rotated = f"transform({mat}, r -> " + _pq_dot_sql(
                "r", f"`{vec_col}`"
            ) + ")"
            ok = (
                F.col(vec_col).isNotNull()
                & (F.size(vec_col) == dim)
                & (F.size(F.filter(vec_col, lambda x: x.isNull())) == 0)
            )
            res = df.withColumn(out, F.when(ok, F.expr(rotated)))
            return pin(res) if materialize else res
    # join kernel: the matrix as ONE position-ordered nested-array row
    row_df = rotation.groupBy().agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("pos"), F.col("row")))
            ),
            lambda s: s["row"],
        ).alias("__rot")
    )
    dim_expr = F.size(F.element_at("__rot", 1))
    ok = (
        F.col(vec_col).isNotNull()
        & (F.size(vec_col) == dim_expr)
        & (F.size(F.filter(vec_col, lambda x: x.isNull())) == 0)
    )
    rotated = "transform(`__rot`, r -> " + _pq_dot_sql(
        "r", f"`{vec_col}`"
    ) + ")"
    res = (
        df.crossJoin(F.broadcast(row_df))
        .withColumn(out, F.when(ok, F.expr(rotated)))
        .drop("__rot")
    )
    return pin(res) if materialize else res


def pq_encode(
    corpus: DataFrame,
    *,
    corpus_id: str,
    corpus_vec: str = "embedding",
    codebook: DataFrame,
    compute: str = "expr",
) -> DataFrame:
    """Quantize every vector to its ``m`` nearest sub-centroid codes:
    (id, codes array<int>). Degenerate rows — NULL vector, wrong width,
    or any NULL element — get NULL codes (downstream ADC filters them,
    matching brute-force cosine's NULL-rank-last treatment; without the
    guard a corrupt row would argmin to code 0 everywhere and surface as
    a high-scoring fake neighbor).

    The nearest code minimizes L2 distance; the ranking key is the
    dot-based half-norm form ``0.5*|c|^2 - <x_sub, c>`` (equal ordering,
    one fold per (row, code) instead of three), ties to the smaller
    code. Encoding shuffles nothing and runs at scan speed in BOTH
    kernels; the output is the compressed corpus — m small ints per
    vector instead of dim floats, the representation ANN scans at
    100 TB.

    * ``compute='expr'`` — codebook sub-centroids become SQL literals
      (one driver collect of the KB-sized model); budget-gated like the
      IVF kernels, falling back to ``'join'`` with a warning past
      dim * 2**nbits literal doubles.
    * ``compute='join'`` — the codebook aggregates to ONE nested-array
      row that broadcast-cross-joins onto the corpus (sanctioned one-row
      shape); no collect, no literal budget. BIT-IDENTICAL to the expr
      kernel: same sequential folds, same tie-breaks — unlike the
      IVF arrow fallback there is no last-ulp caveat."""
    if compute not in ("expr", "join"):
        raise ValueError(f"compute must be 'expr' or 'join', got {compute!r}")
    staged = corpus.select(F.col(corpus_id), F.col(corpus_vec).alias("__v"))
    if compute == "expr":
        books = _pq_collect_codebook(codebook)
        if not books:
            raise ValueError("empty codebook")
        try:
            _pq_check_literal_budget(books)
        except ValueError as exc:
            warnings.warn(
                f"{exc} Falling back to compute='join' (bit-identical).",
                stacklevel=2,
            )
            compute = "join"
    if compute == "join":
        if codebook.isEmpty():
            raise ValueError("empty codebook")
        argmin = (
            "array_min(transform(s.entries, e -> named_struct("
            "'k', 0.5D * " + _pq_dot_sql("e.centroid", "e.centroid") + " - "
            + _pq_dot_sql(
                "slice(`__v`, s.sub * size(e.centroid) + 1, size(e.centroid))",
                "e.centroid",
            )
            + ", 'i', e.code))).i"
        )
        codes_sql = f"transform(`__book`, s -> {argmin})"
        # Expected width derived in-plan from the codebook itself.
        valid = F.expr(
            "`__v` IS NOT NULL AND NOT exists(`__v`, x -> x IS NULL)"
            " AND size(`__v`) = aggregate(`__book`, 0,"
            " (acc, s) -> acc + size(element_at(s.entries, 1).centroid))"
        )
        return staged.crossJoin(F.broadcast(_pq_book_row(codebook))).select(
            F.col(corpus_id),
            F.when(valid, F.expr(codes_sql)).alias("codes"),
        )
    dsub = next(
        len(v) for entries in books.values() for _, v, _ in entries if v is not None
    )
    subs_sql = []
    for sub, entries in books.items():
        elems = []
        for code, vec, half in entries:
            if vec is None:
                key = "CAST(NULL AS DOUBLE)"
            else:
                arr = "array(" + ",".join(_sql_double(x) for x in vec) + ")"
                dot = _pq_dot_sql(f"slice(`__v`, {sub * dsub + 1}, {dsub})", arr)
                key = f"{_sql_double(half)} - {dot}"
            elems.append(f"named_struct('k', {key}, 'i', {code})")
        # array_min: struct comparison orders by k then i — L2 argmin with
        # the smaller code winning ties.
        subs_sql.append(f"array_min(array({','.join(elems)})).i")
    codes_sql = "array(" + ",".join(subs_sql) + ")"
    valid = F.expr(
        "`__v` IS NOT NULL AND NOT exists(`__v`, x -> x IS NULL)"
        f" AND size(`__v`) = {len(books) * dsub}"
    )
    return staged.select(
        F.col(corpus_id),
        F.when(valid, F.expr(codes_sql)).alias("codes"),
    )


def pq_topk(
    queries: DataFrame,
    encoded: DataFrame,
    codebook: DataFrame,
    *,
    query_id: str,
    query_vec: str = "embedding",
    encoded_id: str = "vec_id",
    k: int = 10,
    round_to: int | None = 6,
    rerank: DataFrame | None = None,
    rerank_id: str | None = None,
    rerank_vec: str = "embedding",
    rerank_factor: int = 4,
    broadcast_queries: bool | None = None,
    compute: str = "expr",
) -> DataFrame:
    """Approximate top-k by asymmetric PQ distance: queries stay exact,
    corpus rows are their ``codes``, and the score is the reconstructed
    cosine ``sum_sub <q_sub, c[sub][code]> / (|q| * |reconstruction|)``.
    Returns (query_id, neighbor_id, cosine, rank) like the other kNN
    operators; with ``rerank`` (the original vector table) the top
    ``k * rerank_factor`` approximate candidates re-score exactly and
    the final top-k is exact-cosine-ranked — the standard ADC + refine
    pipeline.

    100 TB shape: the scan side is the ENCODED corpus — m small ints
    per row, dim/m * 8/4-ish compression — so the brute-force pass that
    sizes the memory/shuffle budget runs over codes, not vectors. Each
    query row computes its m x ksub dot-product LUT once in a staged
    projection; candidates score by LUT lookup, never touching a float
    vector. Queries broadcast (size-gated like cosine_topk); only the
    optional re-rank join touches true vectors, for k * rerank_factor
    rows per query.

    ``compute='expr'`` embeds the codebook as SQL literals (budget-gated,
    falls back to ``'join'`` with a warning); ``compute='join'``
    broadcast-cross-joins the one-row nested codebook — no collect, no
    literal budget, BIT-IDENTICAL scores (same folds, same order)."""
    q_all = queries.select(
        F.col(query_id).alias("query_id"), F.col(query_vec).alias("__qv")
    )
    cand = (
        encoded.select(F.col(encoded_id).alias("neighbor_id"), F.col("codes"))
        .crossJoin(
            _gate_broadcast(q_all.select("query_id"), broadcast_queries)
        )
        .where(F.col("neighbor_id") != F.col("query_id"))
    )
    approx = _pq_adc_rank(
        q_all, cand, codebook,
        k=k if rerank is None else k * rerank_factor,
        round_to=round_to, compute=compute,
        broadcast_queries=broadcast_queries,
    )
    if rerank is None:
        return approx
    return _pq_rerank(
        approx, q_all, rerank, rerank_id=rerank_id, rerank_vec=rerank_vec,
        round_to=round_to, k=k,
    )


def _pq_rerank(
    approx: DataFrame,
    q_all: DataFrame,
    rerank: DataFrame,
    *,
    rerank_id: str | None,
    rerank_vec: str,
    round_to: int | None,
    k: int,
) -> DataFrame:
    """Exact re-score of the ADC shortlist against true vectors — the
    refine step shared by pq_topk / ivf_pq_topk / ivf_pq_search."""
    if rerank_id is None:
        raise ValueError("rerank requires rerank_id")
    short = approx.select("query_id", "neighbor_id")
    cv = rerank.select(
        F.col(rerank_id).alias("neighbor_id"), F.col(rerank_vec).alias("__cv")
    )
    exact = short.join(q_all, "query_id").join(cv, "neighbor_id")
    return _ivf_rank(exact, compute="expr", round_to=round_to, k=k)

def ivf_pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    query_id: str,
    corpus_id: str,
    query_vec: str = "embedding",
    corpus_vec: str = "embedding",
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    m: int = 8,
    nbits: int = 4,
    seed: int = 42,
    hash_fn: str = "xxhash64",
    compute: str = "expr",
    refine_iters: int = 0,
    round_to: int | None = 6,
    rerank: bool = False,
    rerank_factor: int = 4,
    codebook: DataFrame | None = None,
    residual: bool | None = None,
) -> DataFrame:
    """FAISS-style IVF-PQ: the coarse quantizer prunes WHICH rows are
    candidates (each query probes its ``nprobe`` nearest of ``nlist``
    inverted lists), and product quantization compresses WHAT those
    candidates cost to scan (m codes instead of dim floats, scored by
    asymmetric distance). Composition of :func:`ivf_topk`'s probe plan
    and :func:`pq_topk`'s ADC scoring — both halves keep their
    deterministic sampling/fold contracts, so the full pipeline stays
    oracle-replayable.

    ``residual=True`` (default, matching Faiss ``IndexIVFPQ``) PQ-encodes
    the RESIDUAL ``x - c_j`` of each row against its assigned coarse
    centroid instead of the raw vector: residuals concentrate near the
    origin so the 2**nbits sub-centroids spend their precision on the
    within-list variation rather than re-describing the coarse structure
    — this is where IVF-PQ's recall at small nbits comes from. Scoring
    decomposes exactly (see :func:`_pq_adc_rank`): the per-query LUT is
    unchanged, each candidate adds its probed list's <q, c_j> and the
    reconstruction norm gains per-centroid constants attached by one
    nlist-row broadcast. ``residual=False`` keeps the raw-vector
    encoding.

    ``residual=None`` (the default) resolves by geometry ownership:
    inline training (``codebook=None``) uses residual encoding; an
    explicit ``codebook=`` resolves to ``residual=False`` because a
    standalone :func:`pq_train` codebook is trained on raw vectors —
    silently encoding residuals against it would produce degraded ADC
    scores with no error. Pass ``residual=True`` alongside ``codebook=``
    only if the codebook really was trained on residuals (e.g. reusing
    one from this function's inline path); the persisted-index path
    (:func:`ivf_pq_build_index` / :func:`ivf_pq_search`) records the
    geometry in its meta table instead, so prefer it for reuse.

    ``rerank=True`` re-scores the top ``k * rerank_factor`` ADC
    candidates against the true vectors (the standard refine step);
    PQ sub-codebooks train at ``seed + 101 + sub`` so the coarse sample
    (at ``seed``) and the subspace samples never share a hash stream.
    Pass ``codebook`` to reuse a pre-trained PQ model.

    100 TB shape: candidate volume is nprobe/nlist of the corpus and
    each candidate row carries (id, centroid_id, m small ints) — the
    probe prunes rows, PQ prunes bytes. Assignment and encoding are both
    scan-side projections (the residual subtract rides the same scan);
    the only exchange is the candidate equi-join on centroid_id. The
    residual extras are nlist-bounded broadcasts, never per-candidate
    recomputation. For repeated query batches, persist the assigned
    codes partitioned by centroid_id (the :func:`ivf_build_index` layout
    with codes instead of vectors) and filter-prune instead of
    recomputing."""
    if residual is None:
        # ADVICE r10: a pre-trained codebook= (pq_train output) is raw-
        # vector geometry; only inline training owns residual geometry.
        residual = codebook is None
    cents = _ivf_centroids(
        corpus, corpus_id=corpus_id, corpus_vec=corpus_vec, nlist=nlist,
        seed=seed, hash_fn=hash_fn, refine_iters=refine_iters,
    )
    if residual:
        # Referenced by 3 extra plans below (residual join, query <q,c>,
        # per-centroid constants) — pin the nlist rows so each reuse
        # doesn't re-run the corpus TakeOrdered sample.
        cents = pin(cents)
    assign = _ivf_assign_factory(cents, compute="expr", nlist=nlist)
    # One corpus pass feeds both: nearest coarse list + PQ codes.
    # Materialize it ONCE (r11): `assigned` fans out to the encode
    # source (training collect + codes projection) AND the candidate
    # listing — unpinned, the nlist-literal assignment argmin re-runs
    # over the corpus per consumer (measured 4.9s -> 5.7s on the
    # knn_ivf_pq bench row when only the encode source was pinned and
    # the listing re-assigned). Pinning the PARENT instead of enc_src
    # also spares the residual-geometry path a second corpus pass. For
    # repeated query batches the no-materialization path remains
    # ivf_pq_build_index/ivf_pq_search.
    assigned = pin(
        assign(
            corpus.select(
                F.col(corpus_id).alias("neighbor_id"),
                F.col(corpus_vec).alias("__cv"),
            ),
            "neighbor_id", "__cv", 1,
        )
    )
    cvecs = F.broadcast(
        cents.select("centroid_id", F.col("centroid").alias("__centv"))
    )
    if residual:
        enc_src = (
            assigned.select("neighbor_id", "__cv", "centroid_id")
            .join(cvecs, "centroid_id")
            .select("neighbor_id", F.expr(_RESIDUAL_SQL).alias("__cv"))
        )
    else:
        enc_src = assigned.select("neighbor_id", "__cv")
    if codebook is None:
        # enc_src needs no pin of its own: its parent `assigned` is
        # pinned above, the residual subtract is a cheap broadcast
        # join over it, and pq_train's size-gated path reads at most
        # LIMIT local_threshold+1 rows (its distributed path pins its
        # own capped training rows).
        codebook = pq_train(
            enc_src, corpus_id="neighbor_id", corpus_vec="__cv", m=m,
            nbits=nbits, seed=seed + 101, hash_fn=hash_fn,
            refine_iters=refine_iters,
        )
    codes = pq_encode(
        enc_src, corpus_id="neighbor_id", corpus_vec="__cv",
        codebook=codebook, compute=compute,
    )
    listed = assigned.select("neighbor_id", "centroid_id").join(
        codes, "neighbor_id"
    )
    probes = assign(
        queries.select(
            F.col(query_id).alias("query_id"), F.col(query_vec).alias("__qv")
        ),
        "query_id", "__qv", nprobe,
    )
    if residual:
        # <q, c_j> once per (query, probed list) — nprobe rows per
        # query, not per candidate; same sequential fold as the LUT.
        probes = probes.join(cvecs, "centroid_id").select(
            "query_id", "centroid_id",
            F.expr(_pq_dot_sql("`__qv`", "`__centv`")).alias("__qc"),
        )
        cand_cols = ["query_id", "neighbor_id", "codes", "centroid_id",
                     "__qc"]
    else:
        probes = probes.select("query_id", "centroid_id")
        cand_cols = ["query_id", "neighbor_id", "codes"]
    cand_ids = probes.join(listed, "centroid_id").where(
        F.col("neighbor_id") != F.col("query_id")
    ).select(*cand_cols).dropDuplicates(
        ["query_id", "neighbor_id"]
    )
    # ADC-score the pruned candidate set: reuse pq_topk's scoring by
    # treating the candidate list as the encoded corpus per query. The
    # LUT/staging mirrors pq_topk but joins on query_id instead of a
    # cross join (candidates are already per-query).
    approx = _pq_adc_rank(
        queries.select(
            F.col(query_id).alias("query_id"), F.col(query_vec).alias("__qv")
        ),
        cand_ids, codebook, k=k if not rerank else k * rerank_factor,
        round_to=round_to, compute=compute,
        cents=cents if residual else None,
    )
    if not rerank:
        return approx.where(F.col("rank") <= k)
    q_all = queries.select(
        F.col(query_id).alias("query_id"), F.col(query_vec).alias("__qv")
    )
    return _pq_rerank(
        approx, q_all, corpus, rerank_id=corpus_id, rerank_vec=corpus_vec,
        round_to=round_to, k=k,
    )


def _pq_adc_rank(
    q_base: DataFrame,
    cand: DataFrame,
    codebook: DataFrame,
    *,
    k: int,
    round_to: int | None,
    compute: str,
    broadcast_queries: bool | None = None,
    cents: DataFrame | None = None,
) -> DataFrame:
    """Rank per-query PQ candidates (query_id, neighbor_id, codes) by
    asymmetric cosine — pq_topk's scoring stage for a candidate set that
    is already per-query (equi-join on query_id instead of the
    brute-force cross join). The per-query LUT table joins through the
    same size gate as cosine_topk's query side (``broadcast_queries``):
    the LUT rows carry m x 2**nbits doubles each, so an unconditional
    broadcast would OOM on an unbounded query set.

    ``cents`` switches on RESIDUAL scoring (Faiss IVF-PQ): the codes are
    PQ codes of ``x - c_j`` (the row's coarse centroid), so the
    reconstruction is ``x̂ = c_j + r̂`` and the cosine decomposes as::

        <q, x̂>  = <q, c_j> + sum_sub <q_sub, r_cent[sub][code]>
        |x̂|^2   = |c_j|^2 + 2 * sum_sub <c_j_sub, r_cent[sub][code]>
                  + sum_sub |r_cent[sub][code]|^2

    ``cand`` must then carry ``centroid_id`` and ``__qc`` (= <q, c_j>,
    computed once per (query, probed list) upstream — nprobe rows per
    query, not per candidate). The per-centroid constants — |c_j|^2 and
    the (centroid x sub x code) cross-term table — attach via ONE
    broadcast join of nlist rows built here from ``cents`` x codebook;
    they are query-independent, so the per-query LUT stays exactly as in
    raw mode (raw q slices — <q, r̂> never needs q's residual). All new
    terms use the same sequential dot fold as the LUT, so an external
    SQL oracle replays scores bit-for-bit."""
    if compute not in ("expr", "join"):
        raise ValueError(f"compute must be 'expr' or 'join', got {compute!r}")
    if compute == "expr":
        books = _pq_collect_codebook(codebook)
        if not books:
            raise ValueError("empty codebook")
        try:
            _pq_check_literal_budget(books)
        except ValueError as exc:
            warnings.warn(
                f"{exc} Falling back to compute='join' (bit-identical).",
                stacklevel=2,
            )
            compute = "join"
    if compute == "join":
        if codebook.isEmpty():
            raise ValueError("empty codebook")
        lut_sql = (
            "transform(`__book`, s -> transform(s.entries, e -> "
            + _pq_dot_sql(
                "slice(`__qv`, s.sub * size(e.centroid) + 1, size(e.centroid))",
                "e.centroid",
            )
            + "))"
        )
        n2_sql = (
            "transform(`__book`, s -> transform(s.entries, e -> "
            + _pq_dot_sql("e.centroid", "e.centroid")
            + "))"
        )
        q = q_base.crossJoin(F.broadcast(_pq_book_row(codebook))).select(
            "query_id",
            l2_norm(F.col("__qv")).alias("__qn"),
            F.expr(lut_sql).alias("__lut"),
            F.expr(n2_sql).alias("__n2"),
        )
        num = (
            "aggregate(zip_with(`__lut`, `codes`,"
            " (l, c) -> element_at(l, c + 1)), 0D, (acc, v) -> acc + v)"
        )
        den = (
            "aggregate(zip_with(`__n2`, `codes`,"
            " (l, c) -> element_at(l, c + 1)), 0D, (acc, v) -> acc + v)"
        )
        if cents is None:
            score = F.expr(f"try_divide({num}, `__qn` * sqrt({den}))")
        else:
            cdot = (
                "aggregate(zip_with(`__cdot`, `codes`,"
                " (l, c) -> element_at(l, c + 1)), 0D, (acc, v) -> acc + v)"
            )
            score = F.expr(
                f"try_divide(`__qc` + {num},"
                f" `__qn` * sqrt(`__cn2` + 2D * {cdot} + {den}))"
            )
        extra = None
    else:
        m = len(books)
        dsub = next(
            len(v)
            for entries in books.values()
            for _, v, _ in entries
            if v is not None
        )
        lut_subs, n2_subs = [], []
        for sub, entries in books.items():
            dots, n2 = [], []
            for code, vec, half in entries:
                if vec is None:
                    dots.append("CAST(NULL AS DOUBLE)")
                    n2.append("CAST(NULL AS DOUBLE)")
                else:
                    arr = "array(" + ",".join(_sql_double(x) for x in vec) + ")"
                    dots.append(
                        _pq_dot_sql(f"slice(`__qv`, {sub * dsub + 1}, {dsub})", arr)
                    )
                    n2.append(_sql_double(2.0 * half))
            lut_subs.append("array(" + ",".join(dots) + ")")
            n2_subs.append("array(" + ",".join(n2) + ")")
        q = q_base.select(
            "query_id",
            l2_norm(F.col("__qv")).alias("__qn"),
            F.expr("array(" + ",".join(lut_subs) + ")").alias("__lut"),
        )
        dot_chain = " + ".join(
            f"element_at(element_at(`__lut`, {s + 1}),"
            f" element_at(`codes`, {s + 1}) + 1)"
            for s in range(m)
        )
        n2_chain = " + ".join(
            f"element_at(element_at(`__n2`, {s + 1}),"
            f" element_at(`codes`, {s + 1}) + 1)"
            for s in range(m)
        )
        if cents is None:
            score = F.expr(
                f"try_divide({dot_chain}, `__qn` * sqrt({n2_chain}))"
            )
        else:
            # Chains parenthesized so both kernels add the SAME totals in
            # the SAME order as the join kernel's aggregates: qc + (sum),
            # (cn2 + 2*(cdot_sum)) + (n2_sum).
            cdot_chain = " + ".join(
                f"element_at(element_at(`__cdot`, {s + 1}),"
                f" element_at(`codes`, {s + 1}) + 1)"
                for s in range(m)
            )
            score = F.expr(
                f"try_divide(`__qc` + ({dot_chain}),"
                f" `__qn` * sqrt(`__cn2` + 2D * ({cdot_chain})"
                f" + ({n2_chain})))"
            )
        extra = F.expr("array(" + ",".join(n2_subs) + ")").alias("__n2")
    joined = cand.where(F.col("codes").isNotNull()).join(
        _gate_broadcast(q, broadcast_queries), "query_id"
    )
    if extra is not None:
        joined = joined.withColumn("__n2", extra)
    if cents is not None:
        # Per-centroid residual constants: |c_j|^2 and the (sub x code)
        # cross-term table <c_j_sub, r_cent>. nlist rows, KBs each —
        # ONE broadcast join, query-independent (built once per plan,
        # not per query). Same sequential dot fold as the LUT so the
        # oracle replays it.
        cdot_sql = (
            "transform(`__book`, s -> transform(s.entries, e -> "
            + _pq_dot_sql(
                "slice(`__centv`, s.sub * size(e.centroid) + 1,"
                " size(e.centroid))",
                "e.centroid",
            )
            + "))"
        )
        cterms = (
            cents.select(
                F.col("centroid_id"), F.col("centroid").alias("__centv")
            )
            .crossJoin(F.broadcast(_pq_book_row(codebook)))
            .select(
                "centroid_id",
                F.expr(cdot_sql).alias("__cdot"),
                F.expr(_pq_dot_sql("`__centv`", "`__centv`")).alias("__cn2"),
            )
        )
        joined = joined.join(F.broadcast(cterms), "centroid_id")
    scored = joined.select(
        "query_id",
        "neighbor_id",
        (F.round(score, round_to) if round_to is not None else score).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )


def ivf_pq_build_index(
    corpus: DataFrame,
    *,
    corpus_id: str,
    corpus_vec: str = "embedding",
    nlist: int = 16,
    m: int = 8,
    nbits: int = 4,
    seed: int = 42,
    hash_fn: str = "xxhash64",
    compute: str = "expr",
    refine_iters: int = 0,
    residual: bool = True,
    rotation: DataFrame | None = None,
    path: str,
) -> None:
    """Materialize an IVF-PQ index to ``path`` for repeated searches:

    * ``<path>/centroids`` — the coarse quantizer (nlist vectors).
    * ``<path>/codebook`` — the PQ model (m * 2**nbits sub-centroids).
    * ``<path>/codes`` — every corpus row's PQ codes with its inverted
      list, written ``partitionBy('centroid_id')``.
    * ``<path>/rotation`` — the OPQ rotation, when one was supplied.
    * ``<path>/meta`` — one row recording ``residual``/``rotated`` (and
      the build parameters), so :func:`ivf_pq_search` scores with the
      geometry the codes were written in. An index without a meta table
      (built before residual encoding existed) reads as raw-encoded.

    ``residual=True`` (default, Faiss ``IndexIVFPQ``) stores PQ codes of
    ``x - c_j``; the codebook is trained on residuals. See
    :func:`ivf_pq_topk` for why this lifts recall at small nbits.

    ``rotation=`` (round 11: an :func:`opq_train` model, seeded or
    parametric) builds the ENTIRE index in the rotated space — the
    Faiss ``OPQMatrix + IndexIVFPQ`` composition: coarse centroids,
    list assignment, and PQ codes all quantize ``R x``. The rotation is
    persisted with the index and :func:`ivf_pq_search` applies it to
    queries automatically, so callers never manage the rotated space by
    hand; reranking still happens against raw vectors (cosine is
    rotation-invariant, so raw-vs-raw is the same ranking).

    The :func:`ivf_build_index` layout with CODES instead of vectors —
    the stored index is m small ints per row, so at 100 TB the index is
    dim*4/m-ish smaller than IVF-flat AND searches still prune to
    nprobe/nlist of the files. Rebuild when the corpus changes
    (everything is a pure function of (corpus, nlist, m, nbits, seed,
    hash_fn, residual, rotation))."""
    if rotation is not None:
        rotation = pin(rotation)  # read twice: persisted + applied
        rotation.write.mode("overwrite").parquet(f"{path}/rotation")
        corpus = rotate_vectors(
            corpus, vec_col=corpus_vec, rotation=rotation,
            materialize=True,
        )
    cents = _ivf_centroids(
        corpus, corpus_id=corpus_id, corpus_vec=corpus_vec, nlist=nlist,
        seed=seed, hash_fn=hash_fn, refine_iters=refine_iters,
    )
    if residual:
        cents = pin(cents)
    cents.write.mode("overwrite").parquet(f"{path}/centroids")
    assign = _ivf_assign_factory(cents, compute="expr", nlist=nlist)
    # Parent pin, same rationale as ivf_pq_topk: assignment fans out to
    # training, the codes projection, and the listing write.
    assigned = pin(
        assign(
            corpus.select(
                F.col(corpus_id).alias("neighbor_id"),
                F.col(corpus_vec).alias("__cv"),
            ),
            "neighbor_id", "__cv", 1,
        )
    )
    if residual:
        cvecs = F.broadcast(
            cents.select("centroid_id", F.col("centroid").alias("__centv"))
        )
        enc_src = (
            assigned.select("neighbor_id", "__cv", "centroid_id")
            .join(cvecs, "centroid_id")
            .select("neighbor_id", F.expr(_RESIDUAL_SQL).alias("__cv"))
        )
    else:
        enc_src = assigned.select("neighbor_id", "__cv")
    book = pq_train(
        enc_src, corpus_id="neighbor_id", corpus_vec="__cv", m=m,
        nbits=nbits, seed=seed + 101, hash_fn=hash_fn,
        refine_iters=refine_iters,
    )
    book.write.mode("overwrite").parquet(f"{path}/codebook")
    codes = pq_encode(
        enc_src, corpus_id="neighbor_id", corpus_vec="__cv", codebook=book,
        compute=compute,
    )
    assigned.select("neighbor_id", "centroid_id").join(codes, "neighbor_id")\
        .write.mode("overwrite").partitionBy("centroid_id")\
        .parquet(f"{path}/codes")
    spark = corpus.sparkSession
    spark.createDataFrame(
        [(bool(residual), rotation is not None, int(nlist), int(m),
          int(nbits), int(seed), str(hash_fn), 1)],
        "residual boolean, rotated boolean, nlist int, m int, nbits int,"
        " seed int, hash_fn string, generation int",
    ).write.mode("overwrite").parquet(f"{path}/meta")


def ivf_pq_append(
    spark,
    path: str,
    new_corpus: DataFrame,
    *,
    corpus_id: str,
    corpus_vec: str = "embedding",
    compute: str = "expr",
) -> int:
    """Append new rows to a persisted :func:`ivf_pq_build_index` index
    WITHOUT retraining (VERDICT r11 item 5): growing corpora encode
    against the FROZEN model — the index's centroids, codebook, and
    rotation exactly as persisted — and the resulting codes append as
    new list-partitioned files under ``<path>/codes``. Returns the new
    meta ``generation`` (bumped by 1 per append; legacy build-only
    indexes read as generation 1).

    Equivalence contract (pinned by tests): appended rows carry
    byte-identical codes to what :func:`ivf_pq_build_index` would have
    written for them HAD the same frozen model been used — so
    search-after-append equals search over a rebuild with that model,
    and appends are batching-invariant (one append of A∪B == append A
    then append B).

    What this deliberately does NOT do: re-balance lists or refresh the
    model. Appended data quantizes against centroids/codebooks trained
    on the original corpus — the standard Faiss ``add()`` semantics —
    so drifted distributions degrade recall gracefully rather than
    changing existing neighbors' codes. Rebuild when the generation
    count (or a recall probe) says the model has aged out.

    Caller owns id uniqueness: ids already present in the index are
    appended, not upserted (same as writing duplicate ids to the
    original build).

    100 TB shape: one broadcast-assign + encode scan over ONLY the new
    rows, one partitioned parquet append — nothing existing is read or
    rewritten except the single-row meta table."""
    meta_rows = spark.read.parquet(f"{path}/meta").collect()
    if len(meta_rows) != 1:
        raise ValueError(
            f"{path}/meta must hold exactly one row, found "
            f"{len(meta_rows)} — not an ivf_pq_build_index artifact"
        )
    meta = meta_rows[0].asDict()
    residual = bool(meta["residual"])
    generation = int(meta.get("generation") or 1)
    cents = spark.read.parquet(f"{path}/centroids")
    book = spark.read.parquet(f"{path}/codebook")
    src = new_corpus.select(
        F.col(corpus_id).alias("neighbor_id"),
        F.col(corpus_vec).alias("__cv"),
    )
    if bool(meta.get("rotated")):
        rot = spark.read.parquet(f"{path}/rotation")
        src = rotate_vectors(
            src, vec_col="__cv", rotation=rot, materialize=True
        )
    assign = _ivf_assign_factory(cents, compute="expr", nlist=None)
    # Parent pin, same rationale as the build: assignment feeds the
    # encode projection and the listing write.
    assigned = pin(assign(src, "neighbor_id", "__cv", 1))
    if residual:
        cvecs = F.broadcast(
            cents.select("centroid_id", F.col("centroid").alias("__centv"))
        )
        enc_src = (
            assigned.select("neighbor_id", "__cv", "centroid_id")
            .join(cvecs, "centroid_id")
            .select("neighbor_id", F.expr(_RESIDUAL_SQL).alias("__cv"))
        )
    else:
        enc_src = assigned.select("neighbor_id", "__cv")
    codes = pq_encode(
        enc_src, corpus_id="neighbor_id", corpus_vec="__cv",
        codebook=book, compute=compute,
    )
    assigned.select("neighbor_id", "centroid_id").join(codes, "neighbor_id")\
        .write.mode("append").partitionBy("centroid_id")\
        .parquet(f"{path}/codes")
    meta["generation"] = generation + 1
    spark.createDataFrame(
        [(bool(meta["residual"]), bool(meta.get("rotated")),
          int(meta["nlist"]), int(meta["m"]), int(meta["nbits"]),
          int(meta["seed"]), str(meta["hash_fn"]),
          int(meta["generation"]))],
        "residual boolean, rotated boolean, nlist int, m int, nbits int,"
        " seed int, hash_fn string, generation int",
    ).write.mode("overwrite").parquet(f"{path}/meta")
    return generation + 1


def ivf_pq_search(
    spark,
    path: str,
    queries: DataFrame,
    *,
    query_id: str,
    query_vec: str = "embedding",
    k: int = 10,
    nprobe: int = 4,
    round_to: int | None = 6,
    compute: str = "expr",
    rerank: DataFrame | None = None,
    rerank_id: str | None = None,
    rerank_vec: str = "embedding",
    rerank_factor: int = 4,
) -> DataFrame:
    """Top-k search against a persisted :func:`ivf_pq_build_index`
    index: queries probe their ``nprobe`` nearest coarse centroids, the
    probed list ids become a static IN-filter on the partitioned codes
    table (file-level partition pruning — nprobe/nlist of the index is
    read, and what is read is CODES, not vectors), and candidates score
    by asymmetric PQ distance. Residual-vs-raw geometry is read from the
    index's ``meta`` table (an index predating meta reads as raw), so
    search always scores what the codes actually encode. Matches
    :func:`ivf_pq_topk` for the same parameters; ``rerank`` (the
    original vector table) re-scores the top ``k * rerank_factor``
    exactly."""
    centroids = spark.read.parquet(f"{path}/centroids")
    book = spark.read.parquet(f"{path}/codebook")
    residual = False
    try:
        residual = bool(
            spark.read.parquet(f"{path}/meta").head()["residual"]
        )
    except Exception as exc:  # legacy index: no meta table
        from pyspark.errors import AnalysisException

        if not (
            isinstance(exc, AnalysisException)
            and "PATH_NOT_FOUND" in str(exc)
        ):
            raise
    rot = None
    try:
        rot = spark.read.parquet(f"{path}/rotation")
    except Exception as exc:  # index built without a rotation
        from pyspark.errors import AnalysisException

        if not (
            isinstance(exc, AnalysisException)
            and "PATH_NOT_FOUND" in str(exc)
        ):
            raise
    assign = _ivf_assign_factory(centroids, compute="expr", nlist=None)
    q_all = queries.select(
        F.col(query_id).alias("query_id"), F.col(query_vec).alias("__qv")
    )
    # A rotated index probes and ADC-scores in the rotated space, so
    # queries rotate here — but `q_all` (raw) feeds the exact rerank:
    # cosine is rotation-invariant, and the rerank table holds RAW
    # vectors.
    q_probe = (
        q_all
        if rot is None
        else rotate_vectors(q_all, vec_col="__qv", rotation=rot)
    )
    query_probes = pin(assign(q_probe, "query_id", "__qv", nprobe))
    probed = [
        int(r["centroid_id"])
        for r in query_probes.select("centroid_id").distinct().collect()
    ]
    codes = spark.read.parquet(f"{path}/codes").where(
        F.col("centroid_id").isin(probed or [-1])
    )
    if residual:
        cvecs = F.broadcast(
            centroids.select(
                "centroid_id", F.col("centroid").alias("__centv")
            )
        )
        probes = query_probes.join(cvecs, "centroid_id").select(
            "query_id", "centroid_id",
            F.expr(_pq_dot_sql("`__qv`", "`__centv`")).alias("__qc"),
        )
        cand = (
            probes.join(codes, "centroid_id")
            .where(F.col("neighbor_id") != F.col("query_id"))
            .select("query_id", "neighbor_id", "codes", "centroid_id",
                    "__qc")
        )
    else:
        cand = (
            query_probes.select("query_id", "centroid_id")
            .join(codes, "centroid_id")
            .where(F.col("neighbor_id") != F.col("query_id"))
            .select("query_id", "neighbor_id", "codes")
        )
    approx = _pq_adc_rank(
        q_probe, cand, book,
        k=k if rerank is None else k * rerank_factor,
        round_to=round_to, compute=compute,
        cents=centroids if residual else None,
    )
    if rerank is None:
        return approx.where(F.col("rank") <= k)
    return _pq_rerank(
        approx, q_all, rerank, rerank_id=rerank_id, rerank_vec=rerank_vec,
        round_to=round_to, k=k,
    )


# ---------------------------------------------------------------------------
# Scalar quantization (SQ8): the simple rung of the compression ladder
# (float vectors -> SQ int codes -> PQ sub-codebooks). Per-dimension
# affine quantization: code_i = floor((x_i - lo_i) / (hi_i - lo_i) *
# (2^nbits - 1) + 0.5), reconstruction x̂_i = lo_i + code_i * step_i.
# 4x memory at nbits=8 with near-exact recall (each dimension keeps 256
# levels), no codebook training — bounds are one exact min/max pass.
# ---------------------------------------------------------------------------


def sq_train(
    corpus: DataFrame,
    *,
    corpus_id: str,
    corpus_vec: str = "embedding",
) -> DataFrame:
    """Per-dimension (pos, lo, hi) bounds over the VALID corpus vectors
    (width/NULL-element filter mirroring pq_train). One posexplode to
    (pos, value) pairs + a map-side-combining min/max aggregation whose
    shuffle is dim x partitions rows — exact at any corpus size, no
    sampling needed (min/max are mergeable)."""
    dim = _pq_probe_dim(corpus, corpus_vec, corpus_id)
    # element-level double cast: FLOAT[] inputs must quantize in double
    # arithmetic or bounds/recon drift a float-ulp off the SQL oracle
    v = F.transform(F.col(corpus_vec), lambda x: x.cast("double"))
    valid = corpus.where(
        F.col(corpus_vec).isNotNull()
        & (F.size(v) == dim)
        & (F.size(F.filter(v, lambda x: x.isNull())) == 0)
    )
    return (
        valid.select(F.posexplode(v).alias("pos", "__x"))
        .groupBy("pos")
        .agg(F.min("__x").alias("lo"), F.max("__x").alias("hi"))
    )


def _sq_bounds_row(bounds: DataFrame) -> DataFrame:
    """Bounds aggregated to ONE row of position-ordered arrays — the
    same no-collect broadcast-attach shape as the PQ 'join' kernel."""
    ordered = F.array_sort(
        F.collect_list(F.struct(F.col("pos"), F.col("lo"), F.col("hi")))
    )
    return bounds.agg(
        F.transform(ordered, lambda s: s["lo"]).alias("__los"),
        F.transform(ordered, lambda s: s["hi"]).alias("__his"),
    )


def sq_encode(
    corpus: DataFrame,
    *,
    corpus_id: str,
    corpus_vec: str = "embedding",
    bounds: DataFrame,
    nbits: int = 8,
) -> DataFrame:
    """(id, codes array<int>, rnorm double): per-dimension affine codes
    plus the reconstruction's L2 norm (precomputed once here so the ADC
    scan never rebuilds it). Corrupt vectors (wrong width, NULL
    elements) get NULL codes/rnorm, like pq_encode. Codes clamp to
    [0, 2^nbits - 1] so encoding data OUTSIDE the training bounds stays
    in range; floor(x + 0.5) rather than round() so the oracle's integer
    codes are bit-identical (no half-even/half-up ambiguity).

    100 TB shape: a scan-side projection — the one-row bounds attach is
    a broadcast cross join; nothing shuffles."""
    if nbits < 1 or nbits > 16:
        raise ValueError(f"nbits must be in [1, 16], got {nbits}")
    maxc = (1 << nbits) - 1
    v = F.transform(F.col(corpus_vec), lambda x: x.cast("double"))
    row = F.broadcast(_sq_bounds_row(bounds))
    dim = F.size(F.col("__los"))
    # dim >= 1 folds the degenerate EMPTY-bounds table (training corpus
    # had zero valid vectors) into the corrupt-vector NULL branch: with
    # dim = 0 the sequence below is the descending [0, -1] and the CASE
    # would evaluate element_at(v, 0), an error in ANSI and legacy alike
    # (ADVICE r9).
    ok = (
        F.col(corpus_vec).isNotNull()
        & (dim >= 1)
        & (F.size(v) == dim)
        & (F.size(F.filter(v, lambda x: x.isNull())) == 0)
    )
    idx = F.sequence(F.lit(0), dim - 1)
    lo = lambda i: F.element_at("__los", i + 1)  # noqa: E731
    hi = lambda i: F.element_at("__his", i + 1)  # noqa: E731
    # Clamp on the LONG floor result, cast int afterwards: values far
    # outside the training bounds would otherwise overflow the int cast
    # and fail the job under ANSI mode instead of clamping.
    code = lambda i: F.when(hi(i) == lo(i), F.lit(0)).otherwise(  # noqa: E731
        F.greatest(
            F.lit(0).cast("long"),
            F.least(
                F.lit(maxc).cast("long"),
                F.floor(
                    (F.element_at(v, i + 1) - lo(i))
                    / (hi(i) - lo(i))
                    * maxc
                    + 0.5
                ),
            ),
        ).cast("int")
    )
    # Staged: codes materialize once, rnorm derives from the codes
    # column — the quantization CASE chain would otherwise re-evaluate
    # twice more inside recon^2 (transform lambdas are not CSE'd).
    staged = corpus.crossJoin(row).select(
        F.col(corpus_id),
        F.when(ok, F.transform(idx, code)).alias("codes"),
        "__los",
        "__his",
    )
    c_recon = lambda i: F.element_at("__los", i + 1) + F.element_at(  # noqa: E731
        "codes", i + 1
    ).cast("double") * (
        (F.element_at("__his", i + 1) - F.element_at("__los", i + 1)) / maxc
    )
    c_idx = F.sequence(F.lit(0), F.size("__los") - 1)
    rnorm = F.sqrt(
        F.aggregate(
            F.transform(c_idx, lambda i: c_recon(i) * c_recon(i)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return staged.select(
        F.col(corpus_id),
        "codes",
        F.when(F.col("codes").isNotNull(), rnorm).alias("rnorm"),
    )


def sq_topk(
    queries: DataFrame,
    encoded: DataFrame,
    bounds: DataFrame,
    *,
    query_id: str,
    query_vec: str = "embedding",
    encoded_id: str = "vec_id",
    k: int = 10,
    nbits: int = 8,
    round_to: int | None = 6,
    broadcast_queries: bool | None = None,
    rerank: DataFrame | None = None,
    rerank_id: str | None = None,
    rerank_vec: str = "embedding",
    rerank_factor: int = 4,
) -> DataFrame:
    """Approximate top-k by reconstructed cosine over SQ codes: queries
    stay exact, each candidate scores as
    ``<q, x̂> / (|q| |x̂|)`` with ``x̂`` decoded inline from its codes
    (|x̂| was precomputed at encode time). Brute force over the
    COMPRESSED corpus by definition, like pq_topk — the scan side is
    int codes at dim bytes/row instead of dim*8; queries broadcast
    (size-gated). ``nbits`` MUST match the encode-time value (the codes
    carry no header; a mismatch reconstructs with the wrong step size).
    ``rerank`` re-scores the top k*rerank_factor exactly. Returns
    (query_id, neighbor_id, cosine, rank). Degenerate inputs follow the
    module's NULL-not-error contract: zero-norm queries or zero-
    reconstruction candidates score NULL (rank last), and a query vector
    of the wrong width or with NULL elements scores NULL instead of
    failing the job under ANSI mode."""
    if nbits < 1 or nbits > 16:
        raise ValueError(f"nbits must be in [1, 16], got {nbits}")
    maxc = (1 << nbits) - 1
    # Query norm computed ONCE per query row, before the candidate
    # cross join — recomputing the dim-element fold per (query,
    # candidate) pair would multiply the hot-path work by |corpus|.
    q_all = queries.select(
        F.col(query_id).alias("query_id"),
        F.transform(F.col(query_vec), lambda x: x.cast("double")).alias(
            "__qv"
        ),
    ).withColumn("__qn", l2_norm(F.col("__qv")))
    row = F.broadcast(_sq_bounds_row(bounds))
    cand = (
        encoded.where(F.col("codes").isNotNull())
        .select(
            F.col(encoded_id).alias("neighbor_id"), "codes", "rnorm"
        )
        .crossJoin(_gate_broadcast(q_all, broadcast_queries))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .crossJoin(row)
    )
    dim = F.size(F.col("__los"))
    idx = F.sequence(F.lit(0), dim - 1)
    lo = lambda i: F.element_at("__los", i + 1)  # noqa: E731
    hi = lambda i: F.element_at("__his", i + 1)  # noqa: E731
    recon = lambda i: lo(i) + F.element_at(  # noqa: E731
        "codes", i + 1
    ).cast("double") * ((hi(i) - lo(i)) / maxc)
    dot = F.aggregate(
        F.transform(idx, lambda i: F.element_at("__qv", i + 1) * recon(i)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    # CASE short-circuits per row, so the dot fold (which indexes __qv
    # up to the bounds dim) never evaluates for malformed query vectors.
    q_ok = (
        F.col("__qv").isNotNull()
        & (dim >= 1)  # empty bounds: NULL score, not element_at(_, 0)
        & (F.size("__qv") == dim)
        & (F.size(F.filter("__qv", lambda x: x.isNull())) == 0)
    )
    score = F.when(
        q_ok, F.try_divide(dot, F.col("__qn") * F.col("rnorm"))
    )
    if round_to is not None:
        score = F.round(score, round_to)
    scored = cand.select("query_id", "neighbor_id", score.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    approx = scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= (k if rerank is None else k * rerank_factor)
    )
    if rerank is None:
        return approx
    return _pq_rerank(
        approx, q_all, rerank, rerank_id=rerank_id, rerank_vec=rerank_vec,
        round_to=round_to, k=k,
    )


# ---------------------------------------------------------------------------
# Binary quantization (BQ): 1-bit sign codes + Hamming-distance search.
# The last rung of the compression ladder (full -> SQ8 -> PQ -> binary):
# each dimension contributes ONE bit (x >= per-dim threshold), so a
# 768-dim float32 vector compresses 3072 bytes -> 96 bytes (32x), and
# candidate scoring is XOR + popcount over packed integer lanes — no
# floating point at all on the scan side. Standard practice pairs the
# Hamming shortlist with an exact rerank (rerank=...), mirroring pq_topk.
#
# Determinism: thresholds are (min+max)/2 per dimension — min/max are
# exact and merge-order-independent (unlike a distributed mean, whose
# float summation order could flip a sign bit right at the threshold and
# break cross-engine replay). Bits pack 32 per BIGINT lane (bit i of the
# vector -> lane i//32, position i%32), never touching the sign bit, so
# Spark and ANSI-SQL oracles agree without unsigned-overflow caveats.


def bq_train(
    corpus: DataFrame,
    *,
    corpus_id: str,
    corpus_vec: str = "embedding",
) -> DataFrame:
    """Per-dimension (pos, thr) binarization thresholds over the VALID
    corpus vectors: thr = (min + max) / 2. One posexplode + min/max
    aggregation (map-side combining; shuffle is dim x partitions rows).
    Exact at any corpus size — no sampling, no order dependence."""
    bounds = sq_train(corpus, corpus_id=corpus_id, corpus_vec=corpus_vec)
    return bounds.select(
        "pos", ((F.col("lo") + F.col("hi")) / 2).alias("thr")
    )


def _bq_thr_list(thresholds: DataFrame) -> list:
    """Thresholds collected to a position-ordered Python list (one
    bounded row per dimension — the table is vocabulary-scale by
    construction). Collecting at plan time lets the bit-packing and
    Hamming expressions unroll to STATIC arithmetic inside whole-stage
    codegen; the round-13 isolated re-measures caught the previous
    higher-order-function fold running interpreted, with per-JVM
    bimodal JIT behavior (BENCH_DETAIL isolated_remeasure_r13b)."""
    rows = thresholds.select("pos", "thr").collect()
    rows.sort(key=lambda r: r["pos"])
    return [r["thr"] for r in rows]


# 2^(i mod 32) as a BIGINT literal array: PySpark's shiftleft() only
# takes a Python-int shift amount, so the per-bit weight is a lookup
# instead of a column-valued shift. 32 longs — negligible literal cost.
_BQ_POW2 = [1 << p for p in range(32)]


def _bq_lanes_static(v: Column, thr: list) -> Column:
    """Statically-unrolled sign-bit packing against LITERAL thresholds:
    lane j is a plain sum of dim CASE terms, so the whole expression
    lives inside whole-stage codegen (a dynamic higher-order-function
    fold evaluates interpreted). Same
    format contract: bit i = (vec[i] >= thr[i]), 32 bits per BIGINT
    lane, NULL elements pack as 0 (callers exclude them via ``ok``)."""
    dim = len(thr)
    lanes = []
    for j in range(0, dim, 32):
        terms = [
            F.when(
                F.element_at(v, i + 1) >= F.lit(thr[i]),
                F.lit(_BQ_POW2[i % 32]).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
            for i in range(j, min(j + 32, dim))
        ]
        lane = terms[0]
        for t in terms[1:]:
            lane = lane + t
        lanes.append(lane)
    return F.array(*lanes)


def bq_encode(
    corpus: DataFrame,
    *,
    corpus_id: str,
    corpus_vec: str = "embedding",
    thresholds: DataFrame,
) -> DataFrame:
    """(id, lanes array<bigint>): packed 1-bit sign codes. Corrupt
    vectors (NULL, wrong width, NULL elements) get NULL lanes, like
    pq_encode/sq_encode.

    100 TB shape: a scan-side projection — the thresholds collapse to
    one bounded row collected at plan time and embedded as literals
    (see :func:`_bq_thr_list`), so the packing is static codegen
    arithmetic and nothing shuffles or joins at all."""
    thr = _bq_thr_list(thresholds)
    dim = len(thr)
    v = F.transform(F.col(corpus_vec), lambda x: x.cast("double"))
    if dim == 0:  # empty thresholds: NULL lanes, like sq_encode
        return corpus.select(
            F.col(corpus_id),
            F.lit(None).cast("array<bigint>").alias("lanes"),
        )
    ok = (
        F.col(corpus_vec).isNotNull()
        & (F.size(v) == F.lit(dim))
        & (F.size(F.filter(v, lambda x: x.isNull())) == 0)
    )
    return corpus.select(
        F.col(corpus_id),
        F.when(ok, _bq_lanes_static(v, thr)).alias("lanes"),
    )


def bq_topk(
    queries: DataFrame,
    encoded: DataFrame,
    thresholds: DataFrame,
    *,
    query_id: str,
    query_vec: str = "embedding",
    encoded_id: str = "vec_id",
    k: int = 10,
    broadcast_queries: bool | None = None,
    rerank: DataFrame | None = None,
    rerank_id: str | None = None,
    rerank_vec: str = "embedding",
    rerank_factor: int = 4,
    round_to: int | None = 6,
) -> DataFrame:
    """Approximate top-k by Hamming distance over packed sign bits:
    queries binarize inline with the SAME thresholds, each candidate
    scores sum(bit_count(xor(q_lane, c_lane))) — integer-only scan,
    brute force over the compressed corpus by definition (like pq_topk/
    sq_topk; queries broadcast, size-gated). Ascending Hamming, ties
    break on neighbor_id. Malformed query vectors score NULL (ranked
    last). ``rerank`` re-scores the top k*rerank_factor exactly and
    returns (query_id, neighbor_id, cosine, rank); without it the
    result is (query_id, neighbor_id, hamming, rank)."""
    thr = _bq_thr_list(thresholds)
    dim = len(thr)
    v = F.transform(F.col(query_vec), lambda x: x.cast("double"))
    ok = (
        F.col(query_vec).isNotNull()
        & F.lit(dim >= 1)  # empty thresholds: NULL hamming, not an error
        & (F.size(v) == F.lit(dim))
        & (F.size(F.filter(v, lambda x: x.isNull())) == 0)
    )
    # Query lanes (and the exact-vector copy for the rerank path) are
    # computed ONCE per query row, before the candidate cross join. The
    # literal thresholds make both the packing and the Hamming fold
    # below static codegen arithmetic (no broadcast attach, no
    # interpreted higher-order functions — isolated_remeasure_r13b).
    q_all = (
        queries.select(
            F.col(query_id).alias("query_id"),
            v.alias("__qv"),
            F.when(ok, _bq_lanes_static(v, thr)).alias("__qlanes")
            if dim >= 1
            else F.lit(None).cast("array<bigint>").alias("__qlanes"),
        )
        .withColumn("__qn", l2_norm(F.col("__qv")))
    )
    cand = (
        encoded.where(F.col("lanes").isNotNull())
        .select(F.col(encoded_id).alias("neighbor_id"), "lanes")
        .crossJoin(_gate_broadcast(q_all, broadcast_queries))
        .where(F.col("neighbor_id") != F.col("query_id"))
    )
    n_lanes_static = (dim + 31) // 32
    if n_lanes_static:
        lane_terms = [
            F.bit_count(
                F.element_at("lanes", j + 1).bitwiseXOR(
                    F.element_at("__qlanes", j + 1)
                )
            )
            for j in range(n_lanes_static)
        ]
        ham = lane_terms[0].cast("long")
        for t in lane_terms[1:]:
            ham = ham + t
    else:
        ham = F.lit(None).cast("long")
    scored = cand.select(
        "query_id",
        "neighbor_id",
        F.when(F.col("__qlanes").isNotNull(), ham)
        .cast("int")
        .alias("hamming"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc_nulls_last("hamming"), F.asc("neighbor_id")
    )
    approx = scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= (k if rerank is None else k * rerank_factor)
    )
    if rerank is None:
        return approx
    return _pq_rerank(
        approx,
        q_all.select("query_id", "__qv", "__qn"),
        rerank,
        rerank_id=rerank_id,
        rerank_vec=rerank_vec,
        round_to=round_to,
        k=k,
    )
