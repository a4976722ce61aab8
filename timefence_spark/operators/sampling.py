"""Deterministic sampling operators for training-data pipelines.

Random sampling is wrong for 100 TB pipeline work: reruns must select the
SAME rows (cache keys, incremental builds, reproducibility), so every
operator here derives its decision from a salted content hash of the row's
id — stable across runs, partitions, and cluster sizes, and expressible in
external SQL engines for differential verification.

Two hash modes everywhere, mirroring ``operators.dedup``/``fingerprint``:

* ``'xxhash64'`` (default) — Spark's built-in, one JVM expression, fastest.
* ``'md5'`` — the portable 60-bit md5-prefix hash that external engines
  (DuckDB: ``CAST(concat('0x', substr(md5(x),1,15)) AS BIGINT)``) compute
  bit-identically, so oracle queries replay the exact selection.

All operators are single projections or one window; nothing collects to the
driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Hash-bucket resolution for fraction sampling: fraction granularity is
# 1/_BUCKETS (1e-6), plenty for corpus sampling.
_BUCKETS = 1_000_000


def _salted_hash(col: Column, salt: str, hash_fn: str) -> Column:
    """Non-negative deterministic hash of (col, salt)."""
    keyed = F.concat_ws(":", col.cast("string"), F.lit(salt))
    if hash_fn == "xxhash64":
        return F.pmod(F.xxhash64(keyed), F.lit(2**62))
    if hash_fn == "md5":
        # 60-bit prefix of md5 — portable (see module docstring).
        return F.conv(F.substring(F.md5(keyed), 1, 15), 16, 10).cast("long")
    raise ValueError(f"Unknown hash_fn '{hash_fn}' (xxhash64|md5).")


def hash_sample(
    df: DataFrame,
    *,
    id_col: str,
    fraction: float,
    salt: str = "",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows by salted id hash.

    Unlike ``DataFrame.sample`` (seeded per-partition RNG: selection
    changes when partitioning changes), the decision is a pure function of
    (id, salt): stable under repartition, rerun, and engine. Different
    salts give independent samples; the same salt gives nested samples
    (fraction 0.1 ⊂ fraction 0.2). One filter evaluated in the scan stage
    — no shuffle, no extra pass (the hash predicate can't prune parquet
    row groups, but rows drop before anything downstream sees them)."""
    if not (0.0 <= fraction <= 1.0):
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    h = _salted_hash(F.col(id_col), salt, hash_fn)
    return df.where(F.pmod(h, F.lit(_BUCKETS)) < int(round(fraction * _BUCKETS)))


def stratified_sample(
    df: DataFrame,
    *,
    strata_cols: str | list[str],
    n_per_stratum: int,
    id_col: str,
    salt: str = "",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Deterministic ``n_per_stratum`` rows per stratum: rank rows inside
    each stratum by salted id hash (id as tie-break) and keep the first n.

    The per-source / per-language quota sampler for corpus balancing.
    Physical shape: ONE shuffle on the strata columns into a window
    row_number — no driver-side quota bookkeeping. Skewed strata bound the
    sort partition at stratum size; quota selection of a same-salt sample
    is again nested (n=100 ⊂ n=1000)."""
    if isinstance(strata_cols, str):
        strata_cols = [strata_cols]
    if n_per_stratum < 1:
        raise ValueError(f"n_per_stratum must be >= 1, got {n_per_stratum}")
    h = _salted_hash(F.col(id_col), salt, hash_fn)
    w = Window.partitionBy(*strata_cols).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n_per_stratum)
        .drop("__rn")
    )


def split_by_hash(
    df: DataFrame,
    *,
    id_col: str,
    weights: dict[str, float],
    salt: str = "",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Assign every row to a named split by salted id hash: adds a
    ``split`` column ('train'/'val'/... per ``weights``, which must sum to
    1.0 within 1e-6). Deterministic train/val/test partitioning that is
    reproducible across engines and reruns, and consistent for a given id
    even as the corpus around it grows. One projection, no shuffle;
    downstream writes can ``partitionBy('split')``.

    Split names are assigned in sorted-name order over contiguous hash
    ranges, so the mapping is stable under dict reordering."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-6:
        raise ValueError(f"weights must sum to 1.0, got {total}")
    if any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-negative")
    h = F.pmod(_salted_hash(F.col(id_col), salt, hash_fn), F.lit(_BUCKETS))
    expr = None
    cum = 0.0
    for name in sorted(weights):
        cum += weights[name]
        bound = int(round(cum * _BUCKETS))
        cond = h < F.lit(bound)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    # Float-rounding guard: anything at/above the last bound lands in the
    # final (sorted-last) split.
    expr = expr.otherwise(F.lit(sorted(weights)[-1]))
    return df.withColumn("split", expr)


def token_budget_sample(
    df: DataFrame,
    *,
    id_col: str,
    token_col: str,
    strata_col: str,
    budgets: dict[str, int],
    default_budget: int | None = None,
    salt: str = "",
    hash_fn: str = "xxhash64",
    n_buckets: int = 64,
) -> DataFrame:
    """Token-budget corpus mixing — "take N tokens from each source", the
    Pile/Dolma-style mixture step where quotas are TOKENS, not document
    fractions (:func:`mixture_sample` is the fraction version). Each
    stratum keeps the prefix of its documents, in salted-hash order,
    whose running token total stays within the stratum's budget; the
    first document that would overflow is dropped and (cumulative sums
    being monotone) so is everything after it. Deterministic: the order
    is a pure function of (id, salt), so reruns pick the same documents
    and same-salt budgets nest (10M-token sample ⊂ 100M-token sample).
    Strata missing from ``budgets`` keep everything when
    ``default_budget`` is None, else apply ``default_budget``. NULL
    token counts weigh 0.

    100 TB shape: a naive ``SUM() OVER (PARTITION BY stratum ORDER BY
    hash)`` puts an ENTIRE stratum in one window task — a crawl source
    with billions of documents serializes. Instead the running sum is
    two-phase: documents land in ``n_buckets`` CONTIGUOUS hash ranges
    (the bucket is a monotone function of the hash, so bucket-major
    order IS hash order and ``n_buckets`` tunes parallelism without
    changing which documents are selected), the per-(stratum, bucket)
    token subtotals (a strata x buckets table — tiny) get exclusive
    prefix offsets via a window over that tiny table, and the offsets
    broadcast back so the real window partitions on (stratum, bucket) —
    each task sorts ~1/n_buckets of a stratum. The decomposed running
    sum equals the single-window sum exactly (integer arithmetic),
    which is what the oracle replays as one window ordered by
    (hash, id)."""
    if any(b < 0 for b in budgets.values()) or (
        default_budget is not None and default_budget < 0
    ):
        raise ValueError("budgets must be non-negative")
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    h = _salted_hash(F.col(id_col), salt, hash_fn)
    # Hash domain per mode (see _salted_hash): md5 keeps a 60-bit prefix,
    # xxhash64 is pmod-folded into [0, 2^62). Ceil-divide so the bucket
    # index never reaches n_buckets.
    domain = 2**60 if hash_fn == "md5" else 2**62
    width = -(-domain // int(n_buckets))
    staged = df.withColumn("__h", h).withColumn(
        "__b", F.expr(f"`__h` div {width}")
    )
    toks = F.coalesce(F.col(token_col).cast("long"), F.lit(0))
    sub = staged.groupBy(strata_col, "__b").agg(F.sum(toks).alias("__sub"))
    w_off = (
        Window.partitionBy(strata_col)
        .orderBy(F.col("__b").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # NULL strata are a real group (kept per the budgets/default contract,
    # like mixture_sample's CASE fallthrough), so the offsets attach with
    # a NULL-SAFE equi-join — a plain join key would silently drop every
    # NULL-stratum row.
    offsets = F.broadcast(
        sub.select(
            F.col(strata_col).alias("__s_off"),
            F.col("__b").alias("__b_off"),
            F.coalesce(F.sum("__sub").over(w_off), F.lit(0)).alias("__off"),
        )
    )
    budget = None
    for k in sorted(budgets):
        cond = F.col(strata_col) == k
        lit = F.lit(int(budgets[k]))
        budget = F.when(cond, lit) if budget is None else budget.when(cond, lit)
    if default_budget is None:
        default = F.lit(None).cast("long")
    else:
        default = F.lit(int(default_budget))
    budget = default if budget is None else budget.otherwise(default)
    w_run = (
        Window.partitionBy(strata_col, "__b")
        .orderBy(F.col("__h").asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.col("__off") + F.sum(toks).over(w_run)
    return (
        staged.join(
            offsets,
            F.col(strata_col).eqNullSafe(F.col("__s_off"))
            & (F.col("__b") == F.col("__b_off")),
        )
        .withColumn("__cum", cum)
        .where(budget.isNull() | (F.col("__cum") <= budget))
        .drop("__h", "__b", "__off", "__cum", "__s_off", "__b_off")
    )


def deterministic_shuffle(
    df: DataFrame,
    *,
    id_col: str,
    salt: str = "",
    hash_fn: str = "xxhash64",
    partitions: int | None = None,
    key_col: str | None = None,
) -> DataFrame:
    """Globally shuffle the corpus into a reproducible random order — the
    "shuffle the training data before packing/writing" step. Row order is
    ascending salted id hash (id as tie-break): a pure function of
    (id, salt), so reruns, resumes, and other engines produce the SAME
    permutation, and different salts give independent epochs.

    ``key_col`` (optional) keeps the sort key as a named column — write
    it alongside the data to make the order auditable downstream (and
    externally replayable with ``hash_fn='md5'``; see module docstring).

    100 TB shape: ``repartitionByRange`` on the hash samples range bounds
    and gives every output partition an even, unordered-in/ordered-out
    slice (hashes are uniform — no skew by construction), then
    ``sortWithinPartitions`` finishes locally: one exchange + local
    sorts, the same physical plan as a global ORDER BY but with the
    partition count under caller control (``partitions``; default
    session parallelism). Never a single-partition window."""
    h = _salted_hash(F.col(id_col), salt, hash_fn)
    key = key_col or "__shuffle_key"
    keyed = df.withColumn(key, h)
    order = [F.col(key).asc(), F.col(id_col).asc()]
    ranged = (
        keyed.repartitionByRange(partitions, *order)
        if partitions
        else keyed.repartitionByRange(*order)
    )
    out = ranged.sortWithinPartitions(*order)
    return out if key_col else out.drop(key)


def mixture_sample(
    df: DataFrame,
    *,
    id_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Per-stratum sampling rates — corpus mixture weighting (e.g. keep
    100% of curated sources, 10% of crawl): each row keeps with its
    stratum's fraction, decided by the same salted id hash as
    :func:`hash_sample` (stable across reruns/partitioning; same-salt
    samples nest per stratum). Strata missing from ``fractions`` use
    ``default_fraction``.

    One filter in the scan stage — the fraction lookup compiles to a CASE
    chain over the (small, driver-known) strata map; no join, no
    shuffle."""
    for k, v in fractions.items():
        if not (0.0 <= v <= 1.0):
            raise ValueError(f"fraction for {k!r} must be in [0, 1], got {v}")
    if not (0.0 <= default_fraction <= 1.0):
        raise ValueError(f"default_fraction must be in [0, 1], got {default_fraction}")
    bound = None
    for k in sorted(fractions):
        b = int(round(fractions[k] * _BUCKETS))
        cond = F.col(strata_col) == k
        bound = F.when(cond, b) if bound is None else bound.when(cond, b)
    bound = (
        bound.otherwise(int(round(default_fraction * _BUCKETS)))
        if bound is not None
        else F.lit(int(round(default_fraction * _BUCKETS)))
    )
    h = F.pmod(_salted_hash(F.col(id_col), salt, hash_fn), F.lit(_BUCKETS))
    return df.where(h < bound)


def temperature_weights(
    df: DataFrame,
    *,
    strata_col: str,
    token_col: str | None = None,
    temperature: float = 1.0,
    round_to: int | None = 6,
) -> DataFrame:
    """Temperature-scaled source weights — the Pile/Gopher mixing rule
    ``weight_s ∝ n_s^(1/T)``: T=1 is proportional (natural) sampling,
    T→∞ approaches uniform across sources, T<1 sharpens toward the
    biggest sources. ``n_s`` is the stratum's row count, or its token
    total when ``token_col`` is given (NULL counts weigh 0). Returns
    (stratum, n, weight), weights summing to ~1. NULL-stratum rows are
    EXCLUDED from the weighting (SQL equality can never select them in
    :func:`token_budget_sample`'s per-stratum budgets — coalesce a
    sentinel stratum first if they must participate); an empty or
    all-zero corpus yields weight 0.0 per stratum, not a
    division-by-zero.

    Feed the result to :func:`temperature_budgets` to turn a global
    token budget into per-source budgets for
    :func:`token_budget_sample` — the temperature → budgets → prefix
    selection chain is then deterministic end to end.

    100 TB shape: one stratum aggregation (map-side combined), and the
    normalizing total rides a ONE-ROW broadcast cross join (the
    fit_classifier totals pattern) — no global window, no collect."""
    if temperature <= 0:
        raise ValueError(f"temperature must be > 0, got {temperature}")
    n = (
        F.sum(F.coalesce(F.col(token_col), F.lit(0)))
        if token_col is not None
        else F.count(F.lit(1))
    )
    grouped = (
        df.where(F.col(strata_col).isNotNull())
        .groupBy(F.col(strata_col).alias("stratum"))
        .agg(n.cast("long").alias("n"))
    )
    powed = grouped.select(
        "stratum", "n",
        F.pow(F.col("n").cast("double"), F.lit(1.0 / temperature)).alias("__p"),
    )
    total = powed.agg(F.sum("__p").alias("__tot"))
    w = F.when(
        F.col("__tot") > 0, F.col("__p") / F.col("__tot")
    ).otherwise(F.lit(0.0))
    if round_to is not None:
        w = F.round(w, round_to)
    return (
        powed.crossJoin(F.broadcast(total))
        .select("stratum", "n", w.alias("weight"))
    )


def temperature_budgets(
    df: DataFrame,
    *,
    strata_col: str,
    token_col: str,
    total_tokens: int,
    temperature: float = 1.0,
) -> dict[str, int]:
    """Per-stratum token budgets from a global budget under temperature
    weighting: ``budget_s = floor(weight_s * total_tokens)``. One
    bounded driver collect (strata-count rows); plug straight into
    :func:`token_budget_sample(budgets=...)`."""
    rows = temperature_weights(
        df, strata_col=strata_col, token_col=token_col,
        temperature=temperature, round_to=None,
    ).collect()
    return {
        r["stratum"]: int(r["weight"] * total_tokens) for r in rows
    }


# ---------------------------------------------------------------------------
# DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
# arXiv:2302.03169). Select raw-corpus documents whose hashed-n-gram
# distribution looks like a trusted TARGET corpus: fit bag-of-hashed-ngram
# multinomials over both corpora, weight each raw document by the
# log-likelihood ratio of its features, and resample via deterministic
# Gumbel top-k. The standard pretraining data-selection method between
# "keyword filter" and "train a classifier" (cheaper than fit_classifier's
# labeled setup: the target corpus IS the label).
# ---------------------------------------------------------------------------


def hashed_ngram_buckets(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    buckets: int = 10_000,
    n_max: int = 2,
    salt: str = "dsir",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(id, bucket, cnt): DSIR's hashed bag-of-ngrams features — word
    1..``n_max``-grams of the lowercased whitespace tokens, hashed into
    ``buckets`` by the salted portable hash. The fixed feature width is
    what makes the method scale-free: distributions over any corpus size
    are ``buckets``-row tables.

    100 TB shape: grams build scan-side (filter + transform, no
    token-level shuffle); ONE (id, bucket) pre-aggregation shuffle whose
    width is bounded by min(doc grams, buckets) per document."""
    if buckets < 2:
        raise ValueError(f"buckets must be >= 2, got {buckets}")
    if n_max not in (1, 2):
        raise ValueError(f"n_max must be 1 or 2, got {n_max}")
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != F.lit("")
    )
    staged = df.select(F.col(id_col), toks.alias("__toks"))
    grams = F.col("__toks")
    if n_max == 2:
        # two-arg transform lambda = (element, index): slice element j
        # (1-based) pairs with token j+1 = element_at(__toks, i + 2).
        # greatest(...,0): F.slice raises INVALID_PARAMETER_VALUE.LENGTH
        # on length -1, which a 0-token (empty/whitespace-only) document
        # would otherwise produce — those docs must emit no row, not fail
        # the job.
        bigrams = F.transform(
            F.slice(
                F.col("__toks"),
                1,
                F.greatest(F.size("__toks") - 1, F.lit(0)),
            ),
            lambda x, i: F.concat_ws(
                " ", x, F.element_at(F.col("__toks"), i + F.lit(2))
            ),
        )
        grams = F.concat(grams, bigrams)
    return (
        staged.select(F.col(id_col), F.explode(grams).alias("__gram"))
        .select(
            F.col(id_col),
            F.pmod(
                _salted_hash(F.col("__gram"), salt, hash_fn), F.lit(buckets)
            ).alias("bucket"),
        )
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    *,
    id_col: str,
    text_col: str,
    buckets: int = 10_000,
    n_max: int = 2,
    smoothing_k: float = 1.0,
    salt: str = "dsir",
    hash_fn: str = "xxhash64",
    deterministic: bool = False,
    round_to: int | None = 6,
) -> DataFrame:
    """Per-document DSIR importance log-weights:
    ``log w(x) = sum_b c_b(x) * [ln p_target(b) - ln p_raw(b)]`` with
    add-k smoothed bucket multinomials fitted on each corpus. Returns
    ``(id, n_grams, log_weight)`` for every raw document with at least
    one token (token-less documents emit no row, like unigram_logprob).
    Higher = more target-like.

    Physical shape: both corpus distributions aggregate to
    ``buckets``-row tables (one explode + pre-agg shuffle each); their
    totals ride a one-row broadcast cross join; the per-bucket log-ratio
    table joins the raw documents' features with an AQE-broadcast
    equi-join; one groupBy(id) finishes. Nothing about the model grows
    with corpus size. Buckets unseen in BOTH fits (possible when the
    distributions were fitted on samples) fall back to the smoothed
    ratio ``ln(R + kB) - ln(T + kB)`` via the left join's coalesce.

    ``deterministic=True`` folds each document's contributions in
    bucket order (canonical IEEE summation, replayable by an external
    SQL engine); the default sums in shuffle order — right at scale."""
    if smoothing_k <= 0:
        raise ValueError(f"smoothing_k must be > 0, got {smoothing_k}")
    k = float(smoothing_k)
    raw_b = hashed_ngram_buckets(
        raw, id_col=id_col, text_col=text_col, buckets=buckets,
        n_max=n_max, salt=salt, hash_fn=hash_fn,
    )
    tgt_b = hashed_ngram_buckets(
        target, id_col=id_col, text_col=text_col, buckets=buckets,
        n_max=n_max, salt=salt, hash_fn=hash_fn,
    )
    rdist = raw_b.groupBy("bucket").agg(F.sum("cnt").alias("__rn"))
    tdist = tgt_b.groupBy("bucket").agg(F.sum("cnt").alias("__tn"))
    dist = rdist.join(tdist, "bucket", "full_outer").select(
        "bucket",
        F.coalesce("__rn", F.lit(0)).alias("__rn"),
        F.coalesce("__tn", F.lit(0)).alias("__tn"),
    )
    totals = F.broadcast(
        dist.agg(
            F.coalesce(F.sum("__rn"), F.lit(0)).alias("__R"),
            F.coalesce(F.sum("__tn"), F.lit(0)).alias("__T"),
        )
    )
    kb = F.lit(k * buckets)
    # Exact term order mirrored by the SQL oracle: ln(t+k) - ln(r+k)
    # - ln(T+kB) + ln(R+kB), left-associative.
    lr = (
        F.log(F.col("__tn") + F.lit(k))
        - F.log(F.col("__rn") + F.lit(k))
        - F.log(F.col("__T") + kb)
        + F.log(F.col("__R") + kb)
    )
    lr_tbl = dist.crossJoin(totals).select(
        "bucket", lr.alias("__lr"), "__R", "__T"
    )
    joined = raw_b.join(lr_tbl, "bucket", "left").crossJoin(
        totals.withColumnRenamed("__R", "__R2").withColumnRenamed(
            "__T", "__T2"
        )
    )
    fallback = -F.log(F.col("__T2") + kb) + F.log(F.col("__R2") + kb)
    contrib = F.col("cnt") * F.coalesce(F.col("__lr"), fallback)
    grouped = joined.groupBy(id_col).agg(
        F.sum("cnt").alias("n_grams"),
        (
            F.collect_list(F.struct(F.col("bucket"), contrib.alias("c")))
            if deterministic
            else F.sum(contrib)
        ).alias("__w"),
    )
    if deterministic:
        total = F.aggregate(
            F.array_sort(F.col("__w")), F.lit(0.0), lambda acc, s: acc + s["c"]
        )
    else:
        total = F.col("__w")
    if round_to is not None:
        total = F.round(total, round_to)
    return grouped.select(
        F.col(id_col), F.col("n_grams"), total.alias("log_weight")
    )


def dsir_sample(
    raw: DataFrame,
    target: DataFrame,
    *,
    id_col: str,
    text_col: str,
    n: int,
    buckets: int = 10_000,
    n_max: int = 2,
    smoothing_k: float = 1.0,
    salt: str = "dsir",
    hash_fn: str = "xxhash64",
    deterministic: bool = False,
) -> DataFrame:
    """DSIR resampling: ``n`` raw documents drawn without replacement
    with probability proportional to their importance weight, via the
    deterministic Gumbel top-k trick — ``key = log_w + g(id)`` where the
    Gumbel noise ``g = -ln(-ln(u))`` derives from the salted id hash
    (a pure function of (id, salt)). Returns the selected raw rows plus
    ``log_weight`` and ``sample_rank`` (1-based by descending key).

    Determinism: the noise is always partition-independent, and
    ``log_weight`` rounds to 6 decimals before keying — but the default
    weight SUM runs in shuffle order, so a last-ulp float difference at
    a rounding boundary could in principle flip a near-tied selection
    across partitionings. Pass ``deterministic=True`` for the
    bucket-ordered fold that makes selection a bit-stable pure function
    of (corpus, target, salt) — the mode the oracle entry replays and
    the one to use for cache-keyed / resumable pipelines.

    100 TB shape: weights as in :func:`dsir_weights`; selection is a
    TakeOrdered top-n (per-partition heads + driver merge, no global
    sort shuffle); the n-row id set broadcasts back onto the raw scan."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    w = dsir_weights(
        raw, target, id_col=id_col, text_col=text_col, buckets=buckets,
        n_max=n_max, smoothing_k=smoothing_k, salt=salt, hash_fn=hash_fn,
        deterministic=deterministic,
    )
    u = (
        F.pmod(
            _salted_hash(F.col(id_col), f"{salt}|gumbel", hash_fn),
            F.lit(_BUCKETS),
        )
        + F.lit(0.5)
    ) / F.lit(float(_BUCKETS))
    keyed = w.select(
        F.col(id_col), "log_weight",
        F.round(F.col("log_weight") - F.log(-F.log(u)), 6).alias("__key"),
    )
    sel = (
        keyed.orderBy(F.desc("__key"), F.asc(id_col))
        .limit(n)
        .select(
            F.col(id_col), "log_weight",
            F.row_number()
            .over(Window.orderBy(F.desc("__key"), F.asc(id_col)))
            .alias("sample_rank"),
        )
    )
    return raw.join(F.broadcast(sel), id_col)
