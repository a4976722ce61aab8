"""Similarity search over embedding columns (array<float>).

* cosine_topk        — exact brute-force top-k; the correctness baseline.
                       Broadcast the query side; the corpus is never shuffled.
* rp_lsh_topk        — random-hyperplane LSH: bucket by sign-bit signature,
                       search only same-bucket candidates. The scale path:
                       candidate count ~ N / 2^bits per table.
* ivf_topk           — inverted-file index: deterministic sampled centroids,
                       assign corpus to nearest centroid, probe the query's
                       closest ``nprobe`` lists.

Vector math is pure Spark expressions (zip_with + aggregate fold — sequential
double accumulation, deterministic). No UDFs; survives codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timefence_spark.operators.asof import (
    BROADCAST_BYTES_THRESHOLD,
    estimated_size_bytes,
)


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
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


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
    SQL engines bit-for-bit)."""
    if compute == "arrow":
        return _cosine_topk_arrow(
            queries, corpus, query_id=query_id, corpus_id=corpus_id,
            query_vec=query_vec, corpus_vec=corpus_vec, k=k, round_to=round_to,
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
) -> DataFrame:
    """Vectorized exact scan: the bounded query side is collected to one
    numpy matrix (the same boundedness assumption the broadcast plan makes
    — driver transfer is O(|Q| x dim)), the corpus streams through ONE
    normalized matmul per Arrow batch, and each batch emits only its
    per-query top-k candidates (every score tied with the k-th kept, so
    batch boundaries can never drop a deterministic-tie winner). The
    global re-rank then sees O(|Q| x k x batches) rows instead of
    |Q| x |C|.

    Float caveat: numpy sums in a different order than the sequential
    expression fold, so scores can differ in the last ulp — use the
    ``'expr'`` kernel when bit-exact parity with an external SQL oracle
    matters. NaN scores (zero-norm vectors) are kept as candidates to
    match Spark's NaN-sorts-first descending order; NULL or wrong-width
    vectors never match (the fold scores them NULL, ranked last)."""
    import numpy as np
    import pandas as pd

    qrows = queries.select(query_id, query_vec).collect()
    spark = queries.sparkSession
    qid_type = queries.schema[query_id].dataType.simpleString()
    nid_type = corpus.schema[corpus_id].dataType.simpleString()
    out_schema = f"query_id {qid_type}, neighbor_id {nid_type}, cosine double"
    if not qrows:
        empty = spark.createDataFrame([], out_schema)
        return empty.withColumn("rank", F.lit(1)).where(F.lit(False))
    qids = np.array([r[0] for r in qrows])
    qmat = np.vstack([np.asarray(r[1], dtype=np.float64) for r in qrows])
    dim = qmat.shape[1]
    qnorm = np.linalg.norm(qmat, axis=1)
    qn = qmat / np.where(qnorm == 0, 1.0, qnorm)[:, None]
    qn[qnorm == 0] = np.nan  # zero-norm query -> NaN scores, like the fold

    def gen(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            vals = pdf[corpus_vec].to_numpy()
            valid = np.fromiter(
                (v is not None and len(v) == dim for v in vals),
                dtype=bool,
                count=len(vals),
            )
            if not valid.any():
                continue
            cmat = np.vstack(vals[valid]).astype(np.float64)
            ids = pdf[corpus_id].to_numpy()[valid]
            cnorm = np.linalg.norm(cmat, axis=1)
            cn = cmat / np.where(cnorm == 0, 1.0, cnorm)[:, None]
            cn[cnorm == 0] = np.nan
            scores = cn @ qn.T  # (n_batch, |Q|)
            if round_to is not None:
                # Round BEFORE pruning: ranking is defined on rounded
                # scores, and a candidate just under the batch k-th can
                # round up into a tie it would deterministically win.
                scores = np.round(scores, round_to)
            n = scores.shape[0]
            out_q, out_n, out_s = [], [], []
            for j in range(scores.shape[1]):
                col = scores[:, j]
                mask = ids != qids[j]
                nan_sel = np.isnan(col) & mask
                col2 = np.where(mask & ~np.isnan(col), col, -np.inf)
                kk = min(k, n)
                kth = np.partition(col2, n - kk)[n - kk]
                sel = ((col2 >= kth) & np.isfinite(col2)) | nan_sel
                cnt = int(sel.sum())
                if not cnt:
                    continue
                out_q.append(np.full(cnt, qids[j]))
                out_n.append(ids[sel])
                out_s.append(col[sel])
            if out_q:
                yield pd.DataFrame(
                    {
                        "query_id": np.concatenate(out_q),
                        "neighbor_id": np.concatenate(out_n),
                        "cosine": np.concatenate(out_s),
                    }
                )

    scored = corpus.select(corpus_id, corpus_vec).mapInPandas(gen, out_schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def _hyperplanes(dim: int, bits: int, seed: int) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes (driver-side constants)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    return rng.randn(bits, dim).tolist()


def rp_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit signature of a vector against fixed hyperplanes -> int."""
    bits = []
    for i, p in enumerate(planes):
        plane = F.lit([float(x) for x in p])
        bits.append(
            F.when(dot(vec, plane) >= 0, F.shiftleft(F.lit(1), i)).otherwise(F.lit(0))
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
    (signatures are ~1 s of a 3 s query at sf0.1)."""
    terms = []
    for i, p in enumerate(planes):
        arr = "array(" + ",".join(f"{float(x)!r}D" for x in p) + ")"
        dot_sql = (
            f"aggregate(zip_with(`{vec_col}`, {arr}, "
            "(x, y) -> CAST(x AS DOUBLE) * y), 0D, (acc, v) -> acc + v)"
        )
        terms.append(f"(CASE WHEN {dot_sql} >= 0 THEN {1 << i} ELSE 0 END)")
    return F.expr("(" + " + ".join(terms) + ")")


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
            if valid.any():
                vecs = np.vstack(vals[valid]).astype(np.float64)
                signs = (vecs @ flat.T) >= 0  # (n_valid, tables*bits)
                buckets[valid] = (
                    signs.reshape(int(valid.sum()), tables, bits).astype(np.int64)
                    @ powers
                )  # (n_valid, tables)
            ids = np.repeat(pdf[id_col].to_numpy(), tables)
            yield pd.DataFrame(
                {
                    out_id: ids,
                    "table_id": np.tile(np.arange(tables), len(pdf)),
                    "bucket": buckets.reshape(-1),
                }
            )

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
    broadcast_queries: bool | None = None,
) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH candidate generation +
    exact cosine re-ranking of candidates.

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
    spin-up dominates (tiny one-shot jobs)."""
    if dim is None:
        first = corpus.select(F.size(corpus_vec).alias("d")).head(1)
        if not first:
            return cosine_topk(
                queries, corpus, query_id=query_id, corpus_id=corpus_id,
                query_vec=query_vec, corpus_vec=corpus_vec, k=k,
            )
        dim = first[0]["d"]

    def signatures(df: DataFrame, idc: str, vecc: str, out_id: str) -> DataFrame:
        # ids + buckets only: the vectors stay OUT of the bucket join and
        # candidate dedup (they would multiply shuffle volume by the vector
        # width x tables); they re-attach per distinct candidate pair below.
        if signature_impl == "arrow":
            return _rp_buckets_arrow(
                df, id_col=idc, vec_col=vecc, out_id=out_id,
                dim=dim, bits=bits, tables=tables, seed=seed,
            ).withColumn("bucket", F.col("bucket").cast("int"))
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

    qs = signatures(queries, query_id, query_vec, "query_id")
    cs = signatures(corpus, corpus_id, corpus_vec, "neighbor_id")
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
) -> DataFrame:
    """IVF-flat: centroids = deterministic hash-sample of ``nlist`` corpus
    vectors; corpus rows are assigned to their nearest centroid (one broadcast
    pass); each query probes its ``nprobe`` nearest lists and re-ranks
    exactly. Probing fraction nprobe/nlist of the corpus per query.

    ``hash_fn='md5'`` makes the centroid sample portable (bit-identical in
    DuckDB) so the whole index build + probe is oracle-checkable."""
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
    cent = F.broadcast(sampled)

    def assign(df: DataFrame, idc: str, vecc: str, out: str, n_lists: int) -> DataFrame:
        scored = df.crossJoin(cent).select(
            F.col(idc),
            F.col(vecc),
            "centroid_id",
            cosine(F.col(vecc), F.col("centroid")).alias("__cs"),
        )
        w = Window.partitionBy(idc).orderBy(F.desc("__cs"), F.asc("centroid_id"))
        return (
            scored.withColumn("__r", F.row_number().over(w))
            .where(F.col("__r") <= n_lists)
            .select(idc, vecc, "centroid_id")
        )

    corpus_assigned = assign(
        corpus.select(F.col(corpus_id).alias("neighbor_id"), F.col(corpus_vec).alias("__cv")),
        "neighbor_id", "__cv", "list", 1,
    )
    query_probes = assign(
        queries.select(F.col(query_id).alias("query_id"), F.col(query_vec).alias("__qv")),
        "query_id", "__qv", "probe", nprobe,
    )
    cand = query_probes.join(corpus_assigned, "centroid_id").where(
        F.col("neighbor_id") != F.col("query_id")
    )
    score = cosine(F.col("__qv"), F.col("__cv"))
    if round_to is not None:
        score = F.round(score, round_to)
    scored = cand.select("query_id", "neighbor_id", score.alias("cosine")).dropDuplicates(
        ["query_id", "neighbor_id"]
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


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
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine >= t),
    using the same RP-LSH blocking as rp_lsh_topk. Pass ``dim`` when known
    — the fallback probe runs a small Spark job per call.
    ``signature_impl`` defaults to ``'arrow'`` (one numpy matmul per Arrow
    batch, see :func:`_rp_buckets_arrow` and the rationale on
    :func:`rp_lsh_topk`); ``'expr'`` is the pure-JVM fallback."""
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
    # (same shuffle-de-amplification as minhash_lsh_pairs).
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
    return (
        cand.withColumn("cosine", F.round(cosine(F.col("va"), F.col("vb")), 6))
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
