"""Deduplication operators for large-scale training-data pipelines.

All operators are pure DataFrame/expression plans (JVM-side, whole-stage
codegen, no Python UDFs in the hot path), designed for 100 TB corpora:

* exact_dedup        — content-hash groupBy; one shuffle on the hash.
* minhash_signatures / minhash_lsh_pairs / minhash_dedup
                     — shingle -> minhash -> banded LSH bucket join ->
                       exact-Jaccard verification. Candidate generation cost
                       is bounded by bucket sizes, never all-pairs.
* simhash / simhash_pairs — 64-bit SimHash + chunk-banding for Hamming<=k.
* ngram_jaccard_pairs — exact n-gram Jaccard via inverted index with a
                       document-frequency cap (classic all-pairs pruning).

Hash function: xxhash64 (Spark built-in, deterministic across executors and
runs). Permutations for MinHash are the standard (a*h + b) mod p family with
constants derived from a seed on the driver, so signatures are reproducible.
"""

from __future__ import annotations

import random
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timefence_spark._checkpoint import pin

# 2^31 - 1: keeps a*h + b inside int64 (a, h < p -> a*h < 2^62), so the
# permutation family (a*h + b) mod p runs in native long arithmetic.
_MERSENNE_P = (1 << 31) - 1


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def _exact_content_hash(content_cols: Sequence[str]) -> Column:
    """md5 content hash. Single column: md5 of the value (NULL -> NULL —
    groupBy treats NULL keys as one group, so all-null contents dedup
    together, distinct from empty strings). Multiple columns: md5 of the
    per-column md5 tokens with a NULL marker — a bare ``concat_ws`` SKIPS
    null arguments, which would collide ("a", NULL) with (NULL, "a")."""
    if len(content_cols) == 1:
        return F.md5(F.col(content_cols[0]).cast("string"))
    tokens = [
        F.coalesce(F.md5(F.col(c).cast("string")), F.lit("<NULL>"))
        for c in content_cols
    ]
    return F.md5(F.concat_ws(":", *tokens))


def exact_survivor_ids(
    df: DataFrame,
    *,
    id_col: str,
    content_cols: Sequence[str],
    keep: str = "min",
) -> DataFrame:
    """The ids-only half of :func:`exact_dedup`: one id per distinct
    content (min or max — deterministic). Use this directly when the
    surviving set feeds semi-joins (e.g. a cleaning chain): it avoids
    embedding an extra corpus semi-join inside every consumer subtree."""
    agg = F.min(id_col) if keep == "min" else F.max(id_col)
    return (
        df.groupBy(_exact_content_hash(content_cols).alias("__content_hash"))
        .agg(agg.alias(id_col))
        .select(id_col)
    )


def exact_dedup(
    df: DataFrame,
    *,
    id_col: str,
    content_cols: Sequence[str],
    keep: str = "min",
) -> DataFrame:
    """Keep one row per distinct content (md5 content hash — see
    :func:`_exact_content_hash` for the NULL-safe multi-column encoding).

    One hash-partitioned aggregation; survivor is the min (or max) id, which
    is deterministic. Returns the surviving rows (all original columns).
    """
    survivors = exact_survivor_ids(
        df, id_col=id_col, content_cols=content_cols, keep=keep
    )
    return df.join(survivors, id_col, "left_semi")


def duplicate_groups(
    df: DataFrame, *, id_col: str, content_cols: Sequence[str]
) -> DataFrame:
    """Groups of exact duplicates: (content_hash, n_copies, member ids)."""
    hash_col = _exact_content_hash(content_cols)
    return (
        df.groupBy(hash_col.alias("content_hash"))
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.sort_array(F.collect_list(id_col)).alias("ids"),
        )
        .where(F.col("n_copies") > 1)
    )


# ---------------------------------------------------------------------------
# Shingling + MinHash
# ---------------------------------------------------------------------------


def _tokens(text: Column) -> Column:
    return F.split(F.lower(text), r"\s+")


def shingles_from_tokens(toks: Column, k: int = 3) -> Column:
    """Word k-shingles from an already-materialized token array column.

    Prefer this over :func:`shingles` when the tokens can be staged in
    their own projection: the text split then runs once per row instead of
    once per reference inside the shingle expression (size, sequence bound,
    and slice all read the token array)."""
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    shingle_at = lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k))  # noqa: E731
    return F.array_distinct(F.transform(idx, shingle_at))


def shingles(text: Column, k: int = 3) -> Column:
    """Word k-shingles as a deduplicated array of strings (inline form —
    re-tokenizes per reference; see :func:`shingles_from_tokens`)."""
    return shingles_from_tokens(_tokens(text), k)


def _staged_shingles(
    df: DataFrame, *, id_col: str, text_col: str, k: int
) -> DataFrame:
    """(id, __grams) with tokenize and shingle each evaluated once per row
    (two staged projections — CollapseProject keeps non-cheap exprs put)."""
    tokenized = df.select(
        F.col(id_col), _tokens(F.col(text_col)).alias("__toks")
    )
    return tokenized.select(
        F.col(id_col), shingles_from_tokens(F.col("__toks"), k).alias("__grams")
    )


def _perm_constants(num_perm: int, seed: int) -> list[tuple[int, int]]:
    rng = random.Random(seed)
    return [
        (rng.randrange(1, _MERSENNE_P), rng.randrange(0, _MERSENNE_P))
        for _ in range(num_perm)
    ]


def _content_hash(s: Column, hash_fn: str) -> Column:
    """Positive 31-bit content hash of a string.

    ``xxhash64`` is the fast default (JVM intrinsic). ``md5`` is the
    *portable* variant — bit-identical in any engine with a standard md5
    (DuckDB: ``CAST('0x' || substr(md5(s), 1, 15) AS BIGINT) % 2147483647``),
    which lets LSH outputs be differentially verified against external SQL
    oracles. Same algorithm either way; only the hash primitive changes.
    """
    if hash_fn == "xxhash64":
        return F.pmod(F.xxhash64(s), F.lit(_MERSENNE_P))
    if hash_fn == "md5":
        h60 = F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")
        return F.pmod(h60, F.lit(_MERSENNE_P))
    raise ValueError(f"Unknown hash_fn '{hash_fn}' (xxhash64|md5).")


def _shingle_df(
    df: DataFrame, *, id_col: str, text_col: str, shingle_k: int
) -> DataFrame:
    return _staged_shingles(
        df, id_col=id_col, text_col=text_col, k=shingle_k
    ).withColumnRenamed("__grams", "__shingles")


def _signature_df(
    shingle_tbl: DataFrame,
    *,
    id_col: str,
    num_perm: int,
    seed: int,
    hash_fn: str,
) -> DataFrame:
    """(id, signature) via explode + one hash-aggregation.

    Higher-order array functions (transform/aggregate) are interpreted, not
    codegen'd — 64 array passes per row cost ~10x the same work as flat
    expressions. Exploding to (id, shingle_hash) rows and taking 64
    ``min((a*h+b) mod p)`` aggregates keeps the whole pipeline inside
    whole-stage codegen with map-side partial aggregation: shuffle volume is
    num_perm longs per document, independent of text size.
    """
    exploded = shingle_tbl.select(
        F.col(id_col), F.explode_outer("__shingles").alias("__s")
    ).select(F.col(id_col), _content_hash(F.col("__s"), hash_fn).alias("__h"))
    mins = [
        F.min(F.pmod(F.lit(a) * F.col("__h") + F.lit(b), F.lit(_MERSENNE_P))).alias(
            f"__sig{j}"
        )
        for j, (a, b) in enumerate(_perm_constants(num_perm, seed))
    ]
    return (
        exploded.groupBy(id_col)
        .agg(*mins)
        .select(
            F.col(id_col),
            F.array(*[f"__sig{j}" for j in range(num_perm)]).alias("signature"),
        )
    )


def minhash_signatures(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    num_perm: int = 64,
    shingle_k: int = 3,
    seed: int = 42,
    hash_fn: str = "xxhash64",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(id, shingles, signature: array<bigint>[num_perm]).

    min over shingles of (a_j * h(s) + b_j) mod p per permutation — entirely
    JVM-side; the signature aggregation runs in whole-stage codegen (see
    :func:`_signature_df`).

    The shingle table (re-tokenizing the full corpus text) feeds both the
    signature aggregation and the output join, so it is pinned (lazy
    localCheckpoint, or a reliable checkpoint under ``checkpoint_dir``) to
    compute exactly once.
    """
    sh = pin(
        _shingle_df(df, id_col=id_col, text_col=text_col, shingle_k=shingle_k),
        checkpoint_dir=checkpoint_dir,
        eager=False,
    )
    sig = _signature_df(
        sh, id_col=id_col, num_perm=num_perm, seed=seed, hash_fn=hash_fn
    )
    return sh.join(sig, id_col).select(id_col, "__shingles", "signature")


def _cap_buckets(
    buckets: DataFrame, keys: str | Sequence[str], max_bucket_size: int | None
) -> DataFrame:
    """Drop LSH buckets with more than ``max_bucket_size`` members before
    a bucket self-join (see minhash_lsh_pairs). ids-only window count —
    the bucket table is already keyed by ``keys``, so the count rides the
    same partitioning the self-join needs."""
    if max_bucket_size is None:
        return buckets
    if max_bucket_size < 2:
        raise ValueError(
            f"max_bucket_size must be >= 2, got {max_bucket_size}"
        )
    if isinstance(keys, str):
        keys = [keys]
    w = Window.partitionBy(*keys)
    return (
        buckets.withColumn("__bsz", F.count(F.lit(1)).over(w))
        .where(F.col("__bsz") <= max_bucket_size)
        .drop("__bsz")
    )


def _band_buckets(
    sigs: DataFrame, *, id_col: str, num_perm: int, bands: int, hash_fn: str
) -> DataFrame:
    """(id, band_hash) LSH bucket membership from a signature table —
    shared by :func:`minhash_lsh_pairs` and the streaming near-dedup
    registry. band_hash is a long in xxhash64 mode, or the raw
    "band:sig,sig,.." string in portable mode so an external SQL oracle
    reproduces identical buckets."""
    rows_per_band = num_perm // bands
    band_str = lambda b: F.concat_ws(  # noqa: E731
        ",", F.slice("signature", b * rows_per_band + 1, rows_per_band)
    )
    if hash_fn == "xxhash64":
        band_keys = F.array(*[F.xxhash64(F.lit(b), band_str(b)) for b in range(bands)])
    else:
        band_keys = F.array(
            *[F.concat_ws(":", F.lit(str(b)), band_str(b)) for b in range(bands)]
        )
    return sigs.select(F.col(id_col), F.explode(band_keys).alias("band_hash"))


def minhash_lsh_pairs(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.7,
    seed: int = 42,
    hash_fn: str = "xxhash64",
    max_bucket_size: int | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded LSH, verified with exact
    Jaccard over shingle sets. Returns (id_a, id_b, jaccard), id_a < id_b.

    Scale shape: the bucket self-join carries ONLY (band_hash, id) — never
    the shingle arrays — so shuffle volume for candidate generation is
    O(bands x N x 16 bytes), independent of corpus text size. Shingles are
    re-attached by two joins against the (id, shingles) table per *distinct*
    candidate pair for the exact-Jaccard verification.

    The (id, shingles) table — which re-tokenizes and re-shingles the full
    corpus text — has THREE consumers (signature aggregation + both
    verification joins), so it is pinned once (lazy localCheckpoint by
    default; pass ``checkpoint_dir`` for a reliable-FS checkpoint on
    preemptible executors) instead of recomputed per consumer.

    ``max_bucket_size`` is the hot-bucket guard for web-scale corpora: a
    band bucket shared by k documents emits k^2/2 candidate pairs, so one
    boilerplate mega-bucket (empty pages, license stubs) can dominate the
    whole job. Buckets above the cap are SKIPPED for candidate generation
    (standard practice — true near-dups in a dropped bucket usually still
    collide in one of the other ``bands-1`` bands, so recall loss is
    modest while the worst-case pair count becomes bands x N x cap/2).
    Costs one extra ids-only aggregation; ``None`` (default) disables.
    """
    if num_perm % bands != 0:
        raise ValueError("num_perm must be divisible by bands")

    # Signatures and shingle sets as SEPARATE dataframes: bands derive from
    # signatures only; the shingle table is touched only by the per-pair
    # verification joins. They never need to be joined to each other.
    # Pinned: one shingling pass serves all three consumers.
    shingle_tbl = pin(
        _shingle_df(
            df, id_col=id_col, text_col=text_col, shingle_k=shingle_k
        ),
        checkpoint_dir=checkpoint_dir,
        eager=False,
    )
    sigs = _signature_df(
        shingle_tbl, id_col=id_col, num_perm=num_perm, seed=seed, hash_fn=hash_fn
    )

    buckets = _band_buckets(
        sigs, id_col=id_col, num_perm=num_perm, bands=bands, hash_fn=hash_fn
    )
    buckets = _cap_buckets(buckets, "band_hash", max_bucket_size)

    left = buckets.select("band_hash", F.col(id_col).alias("id_a"))
    right = buckets.select("band_hash", F.col(id_col).alias("id_b"))
    candidates = (
        left.join(right, "band_hash")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )

    with_sets = candidates.join(
        shingle_tbl.select(
            F.col(id_col).alias("id_a"), F.col("__shingles").alias("sh_a")
        ),
        "id_a",
    ).join(
        shingle_tbl.select(
            F.col(id_col).alias("id_b"), F.col("__shingles").alias("sh_b")
        ),
        "id_b",
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    jaccard = inter.cast("double") / union
    return (
        with_sets.withColumn("jaccard", F.round(jaccard, 6))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_dedup(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.7,
    seed: int = 42,
    hash_fn: str = "xxhash64",
    max_bucket_size: int | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Drop every row that has a near-duplicate with a smaller id.

    (Pairwise canonicalization, the standard practical policy — not a full
    transitive closure, which needs iterative connected components.)
    """
    pairs = minhash_lsh_pairs(
        df, id_col=id_col, text_col=text_col, num_perm=num_perm, bands=bands,
        shingle_k=shingle_k, threshold=threshold, seed=seed, hash_fn=hash_fn,
        max_bucket_size=max_bucket_size, checkpoint_dir=checkpoint_dir,
    )
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, id_col, "left_anti")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def _simhash_bits(hash_fn: str) -> int:
    # md5 mode uses the 60-bit portable hash, so the signature is 60 bits
    # (4 chunks x 15); xxhash64 mode keeps the full 64 (4 x 16).
    return 64 if hash_fn == "xxhash64" else 60


def simhash(
    df: DataFrame, *, id_col: str, text_col: str, hash_fn: str = "xxhash64"
) -> DataFrame:
    """SimHash over word tokens: bit i is set iff the sum over tokens of ±1
    (sign of bit i of the token hash) is positive. Pure expressions; the
    token hash array is STAGED in its own projection so each token is
    tokenized and hashed exactly once — inlining it would re-run
    split+hash inside every one of the ``nbits`` per-bit aggregates
    (observed: 25 split/transform evaluations per row before staging)."""
    toks = F.array_distinct(_tokens(F.col(text_col)))
    if hash_fn == "xxhash64":
        tok_hash = lambda t: F.xxhash64(t)  # noqa: E731
    elif hash_fn == "md5":
        tok_hash = lambda t: (  # noqa: E731
            F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")
        )
    else:
        raise ValueError(f"Unknown hash_fn '{hash_fn}' (xxhash64|md5).")
    nbits = _simhash_bits(hash_fn)
    staged = df.select(
        F.col(id_col), F.transform(toks, tok_hash).alias("__hashes")
    )
    hl = F.col("__hashes")
    bit_sum = lambda i: F.aggregate(  # noqa: E731
        hl,
        F.lit(0).cast("long"),
        lambda acc, h: acc
        + F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
    )
    # Per-bit sums as one array, folded into a single long signature.
    # In 64-bit mode bit 63 is the sign bit: its power-of-two is long-min.
    sums = F.array(*[bit_sum(i) for i in range(nbits)])
    powers = F.array(
        *[F.lit(1 << i).cast("long") for i in range(min(nbits, 63))],
        *([F.lit(-(1 << 63)).cast("long")] if nbits == 64 else []),
    )
    fold = F.aggregate(
        F.zip_with(
            sums,
            powers,
            lambda s, p: F.when(s > 0, p).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc.bitwiseOR(x),
    )
    return staged.select(F.col(id_col), fold.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    hash_fn: str = "xxhash64",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs with Hamming(simhash) <= max_hamming.

    Banding: split the signature into 4 chunks; any pair within Hamming<=3
    shares at least one exact chunk (pigeonhole), so candidates come from
    equi-joins on chunks — no all-pairs comparison. ``max_bucket_size``
    skips hot chunk buckets (see minhash_lsh_pairs — same quadratic-pair
    guard; note simhash pigeonhole pairs dropped this way lose their
    GUARANTEED band, so the cap trades the Hamming<=k completeness
    guarantee for bounded cost on boilerplate-heavy corpora).
    """
    sigs = simhash(df, id_col=id_col, text_col=text_col, hash_fn=hash_fn)
    chunk_bits = _simhash_bits(hash_fn) // 4
    chunk_mask = (1 << chunk_bits) - 1
    chunks = F.array(
        *[
            F.struct(
                F.lit(c).alias("chunk_id"),
                F.shiftright("simhash", c * chunk_bits)
                .bitwiseAND(F.lit(chunk_mask))
                .alias("chunk"),
            )
            for c in range(4)
        ]
    )
    exploded = sigs.select(id_col, "simhash", F.explode(chunks).alias("c")).select(
        id_col, "simhash", "c.chunk_id", "c.chunk"
    )
    exploded = _cap_buckets(exploded, ["chunk_id", "chunk"], max_bucket_size)
    left = exploded.select(
        "chunk_id", "chunk", F.col(id_col).alias("id_a"), F.col("simhash").alias("sig_a")
    )
    right = exploded.select(
        "chunk_id", "chunk", F.col(id_col).alias("id_b"), F.col("simhash").alias("sig_b")
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        left.join(right, ["chunk_id", "chunk"])
        .where(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", hamming)
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard (inverted index)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    max_doc_freq: int = 1000,
    hash_index: bool = True,
) -> DataFrame:
    """Exact Jaccard similarity join over word n-gram sets.

    Inverted index: explode n-grams, drop grams appearing in more than
    ``max_doc_freq`` docs (they generate quadratic candidates but carry no
    selectivity), count co-occurring grams per pair, compute
    |A∩B| / (|A|+|B|-|A∩B|). Returns (id_a, id_b, jaccard).

    ``hash_index`` (default on) keys the inverted index by the grams'
    64-bit xxhash instead of the n-word strings — the exploded rows, the
    doc-frequency aggregation and the pair self-join then carry longs
    (same device as decontaminate's hash_grams, ~3x less index cost). A
    cross-gram hash collision (probability ~ distinct_grams^2 / 2^64)
    could overcount one intersection; pass ``hash_index=False`` for the
    literal string index."""
    base = _staged_shingles(df, id_col=id_col, text_col=text_col, k=n).withColumn(
        # NULL-text guard (text._nsize convention): legacy sizeOfNull
        # would poison the jaccard denominator with -1
        "__n", F.when(F.col("__grams").isNotNull(), F.size("__grams"))
    )
    gram_keys = (
        F.transform("__grams", lambda g: F.xxhash64(g))
        if hash_index
        else F.col("__grams")
    )
    inv = base.select(id_col, "__n", F.explode(gram_keys).alias("gram"))
    rare = (
        inv.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") <= max_doc_freq)
        .select("gram")
    )
    inv = inv.join(rare, "gram", "left_semi")
    a = inv.select(F.col("gram"), F.col(id_col).alias("id_a"), F.col("__n").alias("n_a"))
    b = inv.select(F.col("gram"), F.col(id_col).alias("id_b"), F.col("__n").alias("n_b"))
    co = (
        a.join(b, "gram")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = F.col("inter").cast("double") / (F.col("n_a") + F.col("n_b") - F.col("inter"))
    return (
        co.withColumn("jaccard", F.round(jac, 6))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    id_col: str,
    text_col: str,
    bench_id: str | None = None,
    bench_text: str | None = None,
    n: int = 8,
    min_overlap: int = 1,
    hash_grams: bool = True,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents that share at least
    ``min_overlap`` distinct word ``n``-grams with ANY benchmark document
    (the standard eval-set contamination rule — e.g. GPT-3's 13-gram /
    Gopher's 8-gram overlap checks).

    ``hash_grams`` (default on) hashes every gram to a 64-bit key
    scan-side, BEFORE the explode: the exploded stream and the broadcast
    bench set then carry longs instead of ~n-word strings — measured
    2.8x faster at sf0.1 and a ~5x smaller broadcast; a cross-gram hash
    collision (probability ~ grams^2 / 2^64) can at worst overcount
    matched_grams by one. ``hash_fn='md5'`` uses the portable 60-bit
    md5 prefix so external SQL oracles replay the same hashed join;
    ``hash_grams=False`` keeps the plain string join.

    Returns ``(id, n_grams, matched_grams, contaminated)`` — one row per
    corpus document, so callers drop with ``.where(~contaminated)`` or keep
    the counts for audit.

    100 TB shape: the benchmark side (an eval suite — KBs to MBs) reduces
    to its DISTINCT gram set and broadcasts; the corpus side explodes to
    (id, gram) and hits that broadcast with an inner hash join — no
    corpus-side shuffle for matching. The only shuffle is the per-document
    match count, which carries ids of MATCHED grams only (contamination is
    rare, so this is a trickle), and the final enrich join whose right side
    is that same small matched table (size-gated broadcast under AQE)."""
    bench_id = bench_id or id_col
    bench_text = bench_text or text_col
    if hash_grams:
        if hash_fn == "xxhash64":
            g_hash = lambda g: F.xxhash64(g)  # noqa: E731
        elif hash_fn == "md5":
            g_hash = lambda g: (  # noqa: E731
                F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("long")
            )
        else:
            raise ValueError(f"Unknown hash_fn '{hash_fn}' (xxhash64|md5).")
        grams_of = lambda c: F.transform(c, g_hash)  # noqa: E731
    else:
        grams_of = lambda c: c  # noqa: E731
    bench_grams = (
        _staged_shingles(benchmark, id_col=bench_id, text_col=bench_text, k=n)
        .select(F.explode(grams_of(F.col("__grams"))).alias("__gram"))
        .distinct()
    )
    base = _staged_shingles(corpus, id_col=id_col, text_col=text_col, k=n)
    ex = base.select(id_col, F.explode(grams_of(F.col("__grams"))).alias("__gram"))
    matched = (
        ex.join(F.broadcast(bench_grams), "__gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("matched_grams"))
    )
    return (
        base.select(
            F.col(id_col),
            F.when(
                F.col("__grams").isNotNull(), F.size("__grams")
            ).alias("n_grams"),
        )
        .join(matched, id_col, "left")
        .select(
            id_col,
            "n_grams",
            F.coalesce("matched_grams", F.lit(0)).alias("matched_grams"),
            (F.coalesce("matched_grams", F.lit(0)) >= min_overlap).alias(
                "contaminated"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Transitive closure: connected components over near-duplicate pairs
# ---------------------------------------------------------------------------


# Edge-count gate for connected_components(algorithm='auto'): at or below
# this many DISTINCT directed edges the graph is collected and solved on
# the driver (union-find). At the cap this is ~500K two-field Rows over
# the wire and up to ~1M mapping tuples shipped back — single-digit
# seconds and well within a default driver heap, vs a fixed job + two
# shuffles per distributed round. Above it, the alternating
# large-star/small-star rounds run — the shape that survives 100 TB.
CC_LOCAL_MAX_EDGES = 500_000

# Hard refusal cap for the EXPLICIT algorithm='local' path: 'auto' never
# collects past CC_LOCAL_MAX_EDGES by construction, but 'local' collects
# the whole edge set on the driver — above this many edges that is an
# OOM-shaped request, so refuse unless the caller passes force=True.
CC_LOCAL_FORCE_EDGES = 5_000_000


def connected_components(
    edges: DataFrame,
    vertices: DataFrame,
    *,
    id_col: str,
    max_iter: int = 25,
    algorithm: str = "auto",
    local_max_edges: int = CC_LOCAL_MAX_EDGES,
    checkpoint_dir: str | None = None,
    force: bool = False,
) -> DataFrame:
    """(id, component_id) where component_id is the min id reachable
    through ``edges`` [(id_a, id_b)].

    ``algorithm`` picks the physical strategy; all three produce the
    identical labeling (property-tested against each other on random
    graphs):

    * ``'auto'`` (default) — collect up to ``local_max_edges`` + 1
      distinct edges in one limit+collect job; if the limit wasn't hit,
      solve with a driver-side union-find (``'local'``), otherwise run
      ``'star'``. The explicit size gate is the same contract as a
      broadcast join: small graphs are a driver problem, not a cluster
      problem. Explicit ``algorithm='local'`` skips that gate but still
      refuses past ``CC_LOCAL_FORCE_EDGES`` (5M) distinct edges unless
      ``force=True`` — a driver collect at that size is an OOM request.
    * ``'star'`` — alternating large-star/small-star contraction
      (Kiveris et al., "Connected Components in MapReduce and Beyond",
      2014): each round points high nodes at their neighborhood minimum,
      so star-heavy near-dup graphs contract in ~2 rounds and chains in
      O(log n) rounds, vs graph-diameter rounds for label propagation.
    * ``'propagation'`` — the classic min-label propagation loop
      (diameter rounds; kept as the reference implementation the others
      are differentially tested against).

    ``checkpoint_dir`` upgrades the per-round lineage pins from
    executor-local blocks to reliable-storage checkpoints (survives
    executor loss mid-loop — the right setting for long iterative jobs
    on preemptible executors; see docs/concepts/scale.md).
    """
    if max_iter < 1:
        raise ValueError(f"max_iter must be >= 1, got {max_iter}")
    if algorithm not in ("auto", "local", "star", "propagation"):
        raise ValueError(
            "algorithm must be 'auto', 'local', 'star' or 'propagation', "
            f"got {algorithm!r}"
        )

    if algorithm != "propagation":
        return _cc_star_or_local(
            edges, vertices, id_col=id_col, max_iter=max_iter,
            algorithm=algorithm, local_max_edges=local_max_edges,
            checkpoint_dir=checkpoint_dir, force=force,
        )

    sym = edges.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).unionByName(edges.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
    sym = pin(sym, checkpoint_dir=checkpoint_dir, eager=False)

    labels = pin(
        vertices.select(
            F.col(id_col).alias("vid"), F.col(id_col).alias("comp")
        ),
        checkpoint_dir=checkpoint_dir,
        eager=False,
    )

    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.src == labels.vid)
            .groupBy("dst")
            .agg(F.min("comp").alias("nmin"))
        )
        # Carry the previous label through the checkpoint so the
        # convergence check is a scan of the materialized round output —
        # no second join pass over the old labels. The count() below is
        # the materializing action: it truncates lineage for the next
        # round AND returns the changed-count in the same job.
        new_labels = (
            labels.join(neighbor_min, labels.vid == neighbor_min.dst, "left")
            .select(
                "vid",
                F.col("comp").alias("__prev"),
                F.least(F.col("comp"), F.coalesce("nmin", "comp")).alias("comp"),
            )
        )
        new_labels = pin(new_labels, checkpoint_dir=checkpoint_dir, eager=False)
        changed = new_labels.where(F.col("comp") != F.col("__prev")).count()
        labels = new_labels.select("vid", "comp")
        if changed == 0:
            break
    else:
        import warnings

        warnings.warn(
            f"connected_components did not converge within max_iter={max_iter} "
            f"rounds ({changed} labels still changing); component ids may be "
            "split. Raise max_iter for graphs with long chains.",
            stacklevel=2,
        )
    return labels.select(F.col("vid").alias(id_col), F.col("comp").alias("component_id"))


def _cc_labels_from_mapping(
    vertices: DataFrame, mapping: DataFrame, id_col: str, *, broadcast: bool = False
) -> DataFrame:
    """(id, component_id) for every vertex: mapped nodes take their
    component minimum, isolated vertices are their own component.

    ``broadcast=True`` pins the mapping to a broadcast join — correct
    for the driver union-find path, whose mapping is bounded by the
    local collect cap (<= ~8 MB of (id, comp) longs), and measurably
    faster than letting AQE discover the same plan (halves the labeling
    job at bench scale). The star path leaves it False: its mapping is
    one row per non-isolated vertex, unbounded at corpus scale."""
    m = mapping.withColumnRenamed("vid", id_col)
    if broadcast:
        m = F.broadcast(m)
    return (
        vertices.select(F.col(id_col))
        .join(m, id_col, "left")
        .select(
            id_col,
            F.coalesce("comp", F.col(id_col)).alias("component_id"),
        )
    )


def _cc_local_union_find(
    edge_rows, vertices: DataFrame, id_col: str, *, broadcast: bool = True
) -> DataFrame:
    """Driver-side union-find over collected edges; component = min id.

    ``broadcast`` pins the labeling join's mapping side to a broadcast —
    callers must only pass True when the edge set came through the
    auto-path cap (~CC_LOCAL_MAX_EDGES, mapping <= ~8 MB of longs).
    Explicit algorithm='local' can legitimately collect up to
    CC_LOCAL_FORCE_EDGES edges (unbounded with force=True); forcing a
    multi-hundred-MB mapping onto every executor there would be the
    memory-pressure plan the size-gated default join avoids, so those
    callers pass False and let AQE pick."""
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in edge_rows:
        if a is None or b is None:
            continue
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min: the min id stays the root, so the root IS the
            # component id when the loop finishes
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    spark = vertices.sparkSession
    id_type = vertices.schema[id_col].dataType
    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField("vid", id_type), T.StructField("comp", id_type)]
    )
    mapping = spark.createDataFrame(
        [(x, find(x)) for x in parent], schema
    )
    return _cc_labels_from_mapping(vertices, mapping, id_col, broadcast=broadcast)


def _cc_star_or_local(
    edges: DataFrame,
    vertices: DataFrame,
    *,
    id_col: str,
    max_iter: int,
    algorithm: str,
    local_max_edges: int,
    checkpoint_dir: str | None = None,
    force: bool = False,
) -> DataFrame:
    """'auto' / 'local' / 'star' strategies for connected_components.

    The star path's convergence test is a (count, xxhash64-sum) signature
    of the edge set, fused into each round's materializing action — an
    exact set comparison would cost an extra shuffle per round for a
    check that in practice fires once. A colliding signature would stop
    one round early at astronomical odds (64-bit sum over the symmetric
    difference); the labeling is additionally property-tested against
    min-label propagation on random graphs."""
    # distinct up front: LSH pair generators emit the same edge from
    # several bands; the gate should measure (and the driver collect,
    # when taken, should transfer) unique edges, not band multiplicity.
    e = pin(
        edges.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct(),
        checkpoint_dir=checkpoint_dir,
        eager=False,
    )

    def signature(df: DataFrame) -> tuple[int, int]:
        # decimal(38,0) sum: a long sum of 64-bit hashes overflows under
        # ANSI mode; the decimal accumulator is exact at any edge count
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).first()
        return int(row["n"] or 0), int(row["h"] or 0)

    if algorithm in ("auto", "local"):
        # Gate and fetch in ONE job: collect up to the cap + 1. Under the
        # cap, the graph is a driver problem (same contract as a
        # broadcast join); one row over, the overfetch is discarded and
        # the distributed star rounds take over.
        if algorithm == "local":
            # Explicit local is the caller's call up to a point: past
            # CC_LOCAL_FORCE_EDGES the driver collect is an OOM-shaped
            # request, so refuse unless force=True. 'auto' never hits
            # this — its collect is capped at local_max_edges + 1.
            cap = int(CC_LOCAL_FORCE_EDGES)
            if force:
                rows = e.collect()
            else:
                rows = e.limit(cap + 1).collect()
                if len(rows) > cap:
                    raise ValueError(
                        f"connected_components(algorithm='local') would "
                        f"collect more than {cap} distinct edges on the "
                        "driver. Use algorithm='auto'/'star' for graphs "
                        "this size, or pass force=True to collect anyway."
                    )
        else:
            rows = e.limit(local_max_edges + 1).collect()
        if algorithm == "local" or len(rows) <= local_max_edges:
            if not rows:
                return vertices.select(
                    F.col(id_col), F.col(id_col).alias("component_id")
                )
            return _cc_local_union_find(
                (tuple(r) for r in rows),
                vertices,
                id_col,
                # Forced broadcast only for cap-bounded edge sets; an
                # explicit 'local' past the auto cap keeps the size-gated
                # default join (ADVICE r7: the mapping can be ~100s of MB
                # at CC_LOCAL_FORCE_EDGES, GBs with force=True).
                broadcast=len(rows) <= local_max_edges,
            )

    prev_sig = None
    for _ in range(max_iter):
        # Large-star: every neighbor v larger than u points at the
        # minimum of u's closed neighborhood. Preserves connectivity,
        # never emits self-loops (the target is <= u < v).
        sym = e.unionByName(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("mn")
        )
        large = (
            sym.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("mn").alias("v"))
            .distinct()
        )
        # Small-star: direct edges large->small, point every smaller
        # neighbor (and u itself) at the neighborhood minimum.
        dir_e = large.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).where(F.col("u") != F.col("v"))
        smins = dir_e.groupBy("u").agg(F.min("v").alias("mn"))
        e = (
            dir_e.join(smins, "u")
            .select(F.col("v").alias("u"), F.col("mn").alias("v"))
            .where(F.col("u") != F.col("v"))
            .unionByName(
                smins.select(F.col("u"), F.col("mn").alias("v"))
            )
            .distinct()
        )
        e = pin(e, checkpoint_dir=checkpoint_dir, eager=False)
        sig = signature(e)  # ONE job: materializes round + convergence probe
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        import warnings

        warnings.warn(
            f"connected_components(star) did not converge within "
            f"max_iter={max_iter} rounds; component ids may be split. "
            "Raise max_iter for adversarially long chains.",
            stacklevel=2,
        )
    # Fixpoint edges are stars (node -> component min); centers label
    # themselves. The defensive min-agg collapses the (rare) final
    # pre-convergence state where a node still carries two targets.
    mapping = (
        e.groupBy("u")
        .agg(F.min("v").alias("comp"))
        .select(F.col("u").alias("vid"), "comp")
        .unionByName(
            e.select(F.col("v").alias("vid"), F.col("v").alias("comp")).distinct()
        )
        .groupBy("vid")
        .agg(F.min("comp").alias("comp"))
    )
    return _cc_labels_from_mapping(vertices, mapping, id_col)


def duplicate_spans(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    k: int = 8,
    scope: str = "corpus",
    key_by: str = "text",
) -> DataFrame:
    """Exact-substring duplication stats: slide a ``k``-token window over
    every document and mark each window whose token sequence appeared
    earlier (corpus-wide first occurrence ordered by (doc id, position);
    ``scope='document'`` restricts to in-document repeats). This is the
    detection half of the published exact-substring dedup recipe for
    training data — long verbatim overlaps show up as runs of duplicated
    windows, and the per-document duplicated fraction is the filter
    signal (drop or down-weight docs that are mostly copied text).

    Returns (id, n_windows, n_dup_windows, dup_fraction). Documents with
    fewer than ``k`` tokens have zero windows and ``dup_fraction`` 0.0.

    Physical shape — the same straggler-proof pattern as line_dedup: one
    scan-side posexplode to (window-gram, id, pos), first occurrence per
    gram as a MIN(struct) aggregation (map-side combine collapses hot
    boilerplate grams), an AQE-splittable join back, one groupBy(id).

    ``key_by='text'`` (default) keys by the joined token string —
    exactly oracle-replayable. ``key_by='hash'`` keys by a 128-bit
    content key (two independent xxhash64 halves) computed scan-side
    INSIDE the explode expression, so no stage ever shuffles gram text
    at all — every shuffled row is (16-byte key, id, pos). Unlike
    line_dedup, spans never needs the gram downstream, so hash mode
    removes gram bytes from the wire entirely; output is identical on
    non-adversarial data (collision odds ~2^-64 per pair)."""
    if scope not in ("corpus", "document"):
        raise ValueError(f"scope must be 'corpus' or 'document', got {scope!r}")
    if key_by not in ("text", "hash"):
        raise ValueError(f"key_by must be 'text' or 'hash', got {key_by!r}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    tokenized = df.select(
        F.col(id_col), _tokens(F.col(text_col)).alias("__toks")
    )
    toks = F.col("__toks")
    # greatest() guard: for docs with < k tokens the unguarded sequence
    # would be descending and its transform would evaluate slice(toks, 0,
    # k) — a runtime error that today only avoids firing because the
    # size>=k filter happens to push below the Generate. Same guard as
    # the sibling shingle code (text.py fingerprint, minhash shingles).
    windows = tokenized.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.size(toks) - k, F.lit(0))),
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
            )
        ).alias("__pos", "__gram"),
    ).where(F.size(toks) >= k)
    if key_by == "hash":
        # hash AFTER the explode (one gram build per window, two cheap
        # row-level hashes — hashing inside the transform would rebuild
        # each slice+concat twice) and drop the string in the same
        # projection: exploded rows shuffle 16 bytes, never gram text
        windows = windows.select(
            F.col(id_col),
            "__pos",
            F.struct(
                F.xxhash64("__gram").alias("k1"),
                F.xxhash64("__gram", F.lit(1)).alias("k2"),
            ).alias("__gram"),
        )
    group_cols = ["__gram"] if scope == "corpus" else [id_col, "__gram"]
    # Round-13 rewrite (guide §2.4): the old plan joined every exploded
    # window back to its gram's MIN(struct) winner to flag duplicates —
    # a second corpus-scale explode + a gram-keyed join of all windows.
    # But each gram group crowns exactly ONE winning occurrence, so
    # per document: n_dup_windows = n_windows - (windows this document
    # WINS). n_windows is pure scan-side arithmetic (the slide emits
    # exactly max(len - k + 1, 0) windows), and wins-per-doc is a
    # vocabulary->document-scale re-aggregation of the winner table.
    # One explode + one gram shuffle total; the straggler-proof
    # MIN(struct) aggregation (map-side combine collapses hot
    # boilerplate grams) is unchanged, and no join ever carries
    # window-scale rows.
    winners = windows.groupBy(*group_cols).agg(
        F.min(
            F.struct(F.col(id_col).alias("__wi"), F.col("__pos").alias("__wp"))
        ).alias("__w")
    )
    wins = winners.groupBy(F.col("__w.__wi").alias(id_col)).agg(
        F.count(F.lit(1)).alias("__won")
    )
    n_win_expr = F.when(
        F.size(F.col("__toks")) >= k,
        (F.size(F.col("__toks")) - F.lit(k - 1)).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    per_doc = tokenized.select(F.col(id_col), n_win_expr.alias("n_windows"))
    return per_doc.join(wins, id_col, "left").select(
        id_col,
        F.col("n_windows"),
        (F.col("n_windows") - F.coalesce("__won", F.lit(0))).alias(
            "n_dup_windows"
        ),
        F.round(
            F.when(
                F.col("n_windows") > 0,
                (
                    F.col("n_windows") - F.coalesce("__won", F.lit(0))
                ).cast("double") / F.col("n_windows"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("dup_fraction"),
    )


def remove_duplicate_spans(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    k: int = 8,
    scope: str = "corpus",
    key_by: str = "text",
) -> DataFrame:
    """The REMOVAL half of exact-substring dedup (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): delete
    from each document every token covered by a duplicated ``k``-token
    window, keeping the corpus-wide first occurrence (ordered by
    (doc id, position); ``scope='document'`` removes only in-document
    repeats). :func:`duplicate_spans` is the matching detection half —
    same windows, same winner rule.

    Returns (id, text, n_tokens, n_removed): ``text`` is the surviving
    tokens joined with single spaces (tokenization is whitespace-split,
    so original inter-token whitespace is normalized; token case is
    preserved — only the duplicate-match is case-insensitive, matching
    duplicate_spans). Documents with < k tokens pass through unchanged
    modulo that whitespace normalization; NULL text yields "".

    Physical shape: the duplicate_spans agg+join detects dup windows,
    each dup window explodes to its <= k covered token indices (ids+ints
    only), one distinct, and the surviving-token reassembly is the
    line_dedup groupBy pattern. ``key_by='hash'`` keys the window
    aggregation+join by 128-bit gram hashes — no gram text on any wire.
    """
    if scope not in ("corpus", "document"):
        raise ValueError(f"scope must be 'corpus' or 'document', got {scope!r}")
    if key_by not in ("text", "hash"):
        raise ValueError(f"key_by must be 'text' or 'hash', got {key_by!r}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    # original-case tokens for the rebuild; the gram key lowercases, so
    # detection semantics match duplicate_spans exactly (lower() then
    # split == split then lower() under a whitespace tokenizer)
    tokenized = df.select(
        F.col(id_col),
        F.split(F.col(text_col), r"\s+").alias("__otoks"),
    )
    toks = F.col("__otoks")
    windows = tokenized.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.size(toks) - k, F.lit(0))),
                lambda i: F.lower(F.concat_ws(" ", F.slice(toks, i + 1, k))),
            )
        ).alias("__pos", "__gram"),
    ).where(F.size(toks) >= k)
    if key_by == "hash":
        # hash after the explode (one gram build per window) and drop the
        # string in the same projection — see duplicate_spans
        windows = windows.select(
            F.col(id_col),
            "__pos",
            F.struct(
                F.xxhash64("__gram").alias("k1"),
                F.xxhash64("__gram", F.lit(1)).alias("k2"),
            ).alias("__gram"),
        )
    group_cols = ["__gram"] if scope == "corpus" else [id_col, "__gram"]
    winners = windows.groupBy(*group_cols).agg(
        F.min(
            F.struct(F.col(id_col).alias("__wi"), F.col("__pos").alias("__wp"))
        ).alias("__w")
    )
    occurrence = F.struct(
        F.col(id_col).alias("__wi"), F.col("__pos").alias("__wp")
    )
    dup_windows = windows.join(winners, group_cols).where(
        occurrence != F.col("__w")
    )
    covered = dup_windows.select(
        F.col(id_col),
        F.explode(
            F.sequence(F.col("__pos"), F.col("__pos") + F.lit(k - 1))
        ).alias("__idx"),
    ).distinct()
    tokens = tokenized.select(
        F.col(id_col), F.posexplode(toks).alias("__idx", "__tok")
    )
    kept = tokens.join(covered, [id_col, "__idx"], "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("__idx"), F.col("__tok")))
                ),
                lambda s: s["__tok"],
            ),
            " ",
        ).alias("text"),
        F.count(F.lit(1)).alias("__n_kept"),
    )
    totals = tokens.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_tokens"))
    return (
        df.select(id_col)
        .join(totals, id_col, "left")
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce("text", F.lit("")).alias("text"),
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            (
                F.coalesce("n_tokens", F.lit(0))
                - F.coalesce("__n_kept", F.lit(0))
            ).alias("n_removed"),
        )
    )


def minhash_components(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.7,
    seed: int = 42,
    hash_fn: str = "xxhash64",
    max_iter: int = 25,
    max_bucket_size: int | None = None,
    cc_algorithm: str = "auto",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Full transitive near-duplicate grouping: (id, component_id).

    minhash_dedup's pairwise policy keeps B when A~B and B~C but A!~C; the
    transitive closure assigns {A, B, C} one component so a downstream
    "keep min id per component" drops both B and C. This is the standard
    corpus-dedup policy at scale (cluster then keep one representative).
    ``cc_algorithm`` selects the closure strategy — see
    :func:`connected_components`.
    """
    pairs = minhash_lsh_pairs(
        df, id_col=id_col, text_col=text_col, num_perm=num_perm, bands=bands,
        shingle_k=shingle_k, threshold=threshold, seed=seed, hash_fn=hash_fn,
        max_bucket_size=max_bucket_size, checkpoint_dir=checkpoint_dir,
    )
    return connected_components(
        pairs.select("id_a", "id_b"), df, id_col=id_col, max_iter=max_iter,
        algorithm=cc_algorithm, checkpoint_dir=checkpoint_dir,
    )


def dedup_keep_best(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    scores: DataFrame | None = None,
    score_col: str = "quality_score",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.7,
    seed: int = 42,
    hash_fn: str = "xxhash64",
    max_iter: int = 25,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Quality-aware transitive dedup: cluster near-duplicates
    (:func:`minhash_components`) and keep the BEST-scoring document per
    component instead of the min-id one — the policy real pipelines want
    (drop the truncated/boilerplate copy, keep the clean one).

    ``scores`` is any (id, score) table; default = the composite from
    ``text.quality_score``. Ties break toward the smaller id, so the
    result is deterministic even under coarse scores.

    Returns one row per SURVIVING document: (id, component_id, score).
    Anti-join the ids back to the corpus to drop the losers. Physical
    shape: the components labeling (see scale.md) + one score join + one
    window over component_id — components are tiny (ids only), so the
    extra cost over min-id dedup is one shuffle of (id, component, score).
    """
    from timefence_spark.operators.text import quality_score

    comps = minhash_components(
        df, id_col=id_col, text_col=text_col, num_perm=num_perm, bands=bands,
        shingle_k=shingle_k, threshold=threshold, seed=seed, hash_fn=hash_fn,
        max_iter=max_iter, max_bucket_size=max_bucket_size,
    )
    if scores is None:
        scores = quality_score(df, id_col=id_col, text_col=text_col)
    # LEFT join: a document missing from a caller-supplied scores table
    # must not vanish from the corpus — it ranks below every scored
    # member (desc_nulls_last) but still survives if it is alone (or its
    # whole component is unscored; ties then break by id).
    scored = comps.join(
        scores.select(F.col(id_col), F.col(score_col)), id_col, "left"
    )
    w = Window.partitionBy("component_id").orderBy(
        F.col(score_col).desc_nulls_last(), F.asc(id_col)
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(id_col, "component_id", score_col)
    )
