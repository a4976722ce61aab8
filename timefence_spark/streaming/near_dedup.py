"""Streaming NEAR-duplicate deduplication — incremental MinHash-LSH.

:func:`streaming_exact_dedup` drops byte-identical refetches; a crawl also
re-ingests boilerplate-rewrapped and lightly-edited copies that only a
near-dup signal catches. The state here is a BAND REGISTRY — every LSH
band hash ever admitted — and a document is dropped when ANY of its bands
collides with the registry (standard banded-MinHash candidate semantics:
P[collision] ≈ 1-(1-j^r)^b for Jaccard j, r rows/band, b bands).

Why not one stateful operator? The decision is doc-level ("ANY band
seen") but the state is band-keyed: a single
``applyInPandasWithState``/``transformWithState`` pass can answer per
BAND, and the doc-level ANY then needs a second stateful aggregation —
a chain Structured Streaming does not support without event-time
windows. The standard production pattern (and the one implemented here)
is ``foreachBatch`` + a state TABLE: each micro-batch joins against the
registry, survivors go to the sink, and only THEN the batch's bands
join the registry. The registry is stored as parquet keyed by band
hash — swap the commit callable returned by
:func:`plan_near_dedup_batch` for a Delta / Iceberg transactional append
to tighten the semantics further.

Delivery semantics: AT-LEAST-ONCE, and the ORDER of the two
non-atomic effects is what makes it so. :func:`streaming_near_dedup`
writes survivors to the sink FIRST and appends the batch's bands to the
registry SECOND (via the two-phase :func:`plan_near_dedup_batch`). A
crash between the two replays the micro-batch with the registry still
lacking the batch's own bands, so the identical survivor set is
recomputed and re-appended to the sink — duplicated rows (dedupe
downstream on id), never lost rows. The reverse order (registry first)
would be at-MOST-once: the replayed batch's bands would all hit the
registry and the survivors would be silently and permanently dropped
from the output. Registry replay after BOTH effects committed is
harmless — band membership is idempotent; re-appended band rows change
no decision. Within one batch the greedy keep-smallest-id rule makes
survivors deterministic; across batches arrival order decides, exactly
like the exact-dedup stream.

State growth (bounded-state mode): by default the registry keeps every
band ever admitted — exact transitive-drop semantics, state
O(bands x distinct admitted docs). For unbounded streams pass
``ttl_batches=N``: each registry row carries the ``batch_seq`` that
admitted it, decisions only consult rows with
``batch_seq > current - N`` (parquet min/max footer stats prune whole
registry files, since every append writes a single-seq file), and every
``compact_every`` batches the live rows are rewritten into a fresh
generation directory (``gen=K``) and older generations deleted, so disk
and file count plateau at O(bands admitted in the last N batches). The
tradeoff is the watermark tradeoff: a near-duplicate arriving more than
N batches after its original is re-admitted. Generation directories
make compaction crash-safe without a rename window: readers union every
``gen=*`` dir and filter by seq, so a compaction that wrote ``gen=K+1``
but crashed before deleting ``gen<=K`` merely double-counts rows the
semi-join ignores; there is never an instant where the registry path
reads as empty. (A TTL'd registry uses the ``gen=`` layout from its
first append; a registry created without TTL is a flat parquet dir and
cannot retroactively turn TTL on — the rows lack ``batch_seq``.)

100 TB shape: per batch — one band shuffle of (band_hash, id) rows
(never text), one min-per-band aggregation (map-side combined; a hot
boilerplate band combines instead of exploding), one broadcast-or-
shuffle semi-join against the (TTL-pruned) registry, and one ids-only
anti-join append. Cap pathological buckets with ``max_bucket_size``
exactly as in batch LSH.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from timefence_spark.operators.dedup import (
    _band_buckets,
    _cap_buckets,
    _shingle_df,
    _signature_df,
)

_REGISTRY_SCHEMA = "band_hash string"
_REGISTRY_TTL_SCHEMA = "band_hash string, batch_seq bigint"


def _registry(spark, state_path: str, *, ttl: bool) -> DataFrame:
    """The band registry at ``state_path`` (empty before the first
    append). ONLY the path-not-found case maps to an empty registry —
    any other read failure (auth, corrupt footer, permissions) must
    fail the batch: silently substituting an empty registry would admit
    near-duplicates of everything already seen."""
    from pyspark.errors import AnalysisException

    schema = _REGISTRY_TTL_SCHEMA if ttl else _REGISTRY_SCHEMA
    try:
        # recursiveFileLookup covers both layouts: flat files (no TTL)
        # and gen=K subdirectories (TTL). It deliberately does NOT
        # partition-discover gen as a column — batch_seq in the rows is
        # the only liveness key, so mixed layouts still read.
        return (
            spark.read.schema(schema)
            .option("recursiveFileLookup", "true")
            .parquet(state_path)
        )
    except AnalysisException as exc:
        if "PATH_NOT_FOUND" in str(exc):
            return spark.createDataFrame([], schema)
        raise


def _hadoop_fs(spark, path: str):
    jvm = spark.sparkContext._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath, jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())


def _gen_dirs(spark, state_path: str) -> list[tuple[int, str]]:
    """Sorted (gen_number, uri) for every ``gen=K`` child of the registry."""
    jpath, fs = _hadoop_fs(spark, state_path)
    if not fs.exists(jpath):
        return []
    out = []
    for status in fs.listStatus(jpath):
        name = status.getPath().getName()
        if status.isDirectory() and name.startswith("gen="):
            try:
                out.append((int(name[4:]), status.getPath().toString()))
            except ValueError:
                continue
    return sorted(out)


def plan_near_dedup_batch(
    batch_df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    state_path: str,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    seed: int = 42,
    hash_fn: str = "xxhash64",
    max_bucket_size: int | None = None,
    batch_seq: int = 0,
    ttl_batches: int | None = None,
    compact_every: int = 32,
) -> tuple[DataFrame, Callable[[], None]]:
    """Two-phase near-dedup of one micro-batch: compute now, commit later.

    Returns ``(survivors, commit_registry)``. ``survivors`` is the
    surviving rows (all columns of ``batch_df``), eagerly MATERIALIZED
    (``localCheckpoint``) so its content cannot shift under later
    registry writes. ``commit_registry()`` appends the batch's bands
    (also already materialized — calling it runs no recomputation
    against live state) and, in TTL mode, periodically compacts.

    ORDERING CONTRACT: write ``survivors`` to the sink BEFORE calling
    ``commit_registry()``. That order is what makes a crash-replayed
    micro-batch at-least-once (duplicated sink rows) instead of
    at-most-once (survivors silently dropped because the replay's own
    bands are already registered) — see the module docstring.

    A document survives iff none of its band hashes (1) is already in
    the live registry or (2) is shared with a smaller-id document in the
    same batch (greedy first-arrival; the within-batch rule is what a
    sequential ingest of the batch in id order would decide). ALL of the
    batch's bands — survivors' and dropped rows' alike — then join the
    registry, so anything near a previously SEEN document stays dropped
    in later batches (registry semantics, matching the batch
    ``minhash_dedup``'s transitive-drop posture rather than
    keep-one-per-component).

    ``ttl_batches`` bounds state: only registry rows admitted within the
    last ``ttl_batches`` batches (``batch_seq > current - ttl``) count,
    expired bands are re-admitted with a fresh seq on reappearance, and
    every ``compact_every``-th batch rewrites the live rows into a new
    ``gen=K`` directory, deleting older generations. Legacy rows without
    a ``batch_seq`` (written by a non-TTL registry) read as NULL and are
    treated as expired.
    """
    if num_perm % bands != 0:
        raise ValueError("num_perm must be divisible by bands")
    if ttl_batches is not None and ttl_batches < 1:
        raise ValueError("ttl_batches must be >= 1")
    spark = batch_df.sparkSession
    ttl = ttl_batches is not None

    shingle_tbl = _shingle_df(
        batch_df.select(id_col, text_col),
        id_col=id_col, text_col=text_col, shingle_k=shingle_k,
    )
    sigs = _signature_df(
        shingle_tbl, id_col=id_col, num_perm=num_perm, seed=seed,
        hash_fn=hash_fn,
    )
    band_tbl = _cap_buckets(
        _band_buckets(
            sigs, id_col=id_col, num_perm=num_perm, bands=bands,
            hash_fn=hash_fn,
        ).select(F.col(id_col), F.col("band_hash").cast("string")),
        "band_hash",
        max_bucket_size,
    ).persist()
    try:
        registry = _registry(spark, state_path, ttl=ttl)
        if ttl:
            # batch_seq in parquet footers -> min/max stats prune whole
            # expired files before any row is read.
            live = registry.where(
                F.col("batch_seq") > F.lit(int(batch_seq) - ttl_batches)
            ).select("band_hash")
        else:
            live = registry.select("band_hash")

        state_hits = (
            band_tbl.join(live, "band_hash", "left_semi")
            .select(id_col)
            .distinct()
        )
        # keep-smallest-id within the batch: min per band + join back
        # (groupBy not window — a hot boilerplate band combines map-side
        # instead of sorting one giant partition).
        band_min = band_tbl.groupBy("band_hash").agg(
            F.min(id_col).alias("__min_id")
        )
        batch_losers = (
            band_tbl.join(band_min, "band_hash")
            .where(F.col(id_col) > F.col("__min_id"))
            .select(id_col)
            .distinct()
        )
        dropped = state_hits.unionByName(batch_losers).distinct()
        survivors = batch_df.join(dropped, id_col, "left_anti")
        # Pin BOTH outputs before anything mutates the registry: their
        # plans embed a registry scan, and re-executing either after the
        # commit below would read the batch's own bands back.
        out = survivors.localCheckpoint(eager=True)
        new_bands_df = band_tbl.select("band_hash").distinct().join(
            live, "band_hash", "left_anti"
        )
        if ttl:
            new_bands_df = new_bands_df.withColumn(
                "batch_seq", F.lit(int(batch_seq)).cast("bigint")
            )
        new_bands = new_bands_df.localCheckpoint(eager=True)
    finally:
        band_tbl.unpersist()

    def commit_registry() -> None:
        if ttl:
            gens = _gen_dirs(spark, state_path)
            cur = gens[-1][0] if gens else 0
            new_bands.write.mode("append").parquet(
                f"{state_path}/gen={cur}"
            )
            if compact_every and batch_seq > 0 and batch_seq % compact_every == 0:
                _compact_registry(
                    spark, state_path,
                    batch_seq=int(batch_seq), ttl_batches=ttl_batches,
                )
        else:
            new_bands.write.mode("append").parquet(state_path)

    return out, commit_registry


def _compact_registry(
    spark, state_path: str, *, batch_seq: int, ttl_batches: int
) -> None:
    """Rewrite live registry rows into generation ``max+1``, then delete
    older generations. Crash-safe by construction: readers union every
    generation and filter by ``batch_seq``, so the worst crash outcome is
    leftover duplicate rows (ignored by the semi-join), never a window
    where the registry reads empty."""
    gens = _gen_dirs(spark, state_path)
    if not gens:
        return
    live = (
        _registry(spark, state_path, ttl=True)
        .where(F.col("batch_seq") > F.lit(batch_seq - ttl_batches))
        .groupBy("band_hash")
        .agg(F.max("batch_seq").alias("batch_seq"))
        # A registry generation is band hashes from a bounded window of
        # batches — small; one file keeps the listing cost flat.
        .coalesce(1)
        .localCheckpoint(eager=True)  # pin before deleting its inputs
    )
    next_gen = gens[-1][0] + 1
    live.write.mode("errorifexists").parquet(f"{state_path}/gen={next_gen}")
    _, fs = _hadoop_fs(spark, state_path)
    jvm = spark.sparkContext._jvm
    for _, uri in gens:
        fs.delete(jvm.org.apache.hadoop.fs.Path(uri), True)


def near_dedup_batch(
    batch_df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    state_path: str,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    seed: int = 42,
    hash_fn: str = "xxhash64",
    max_bucket_size: int | None = None,
    batch_seq: int = 0,
    ttl_batches: int | None = None,
    compact_every: int = 32,
) -> DataFrame:
    """One micro-batch of near-dedup against (and updating) the band
    registry at ``state_path``: :func:`plan_near_dedup_batch` with the
    registry committed before returning. For batch-driven callers that
    manage their own sink ordering; :func:`streaming_near_dedup` uses
    the two-phase form directly so the sink write can precede the
    registry append (the at-least-once ordering)."""
    survivors, commit = plan_near_dedup_batch(
        batch_df, id_col=id_col, text_col=text_col, state_path=state_path,
        num_perm=num_perm, bands=bands, shingle_k=shingle_k, seed=seed,
        hash_fn=hash_fn, max_bucket_size=max_bucket_size,
        batch_seq=batch_seq, ttl_batches=ttl_batches,
        compact_every=compact_every,
    )
    commit()
    return survivors


def streaming_near_dedup(
    stream: DataFrame,
    *,
    id_col: str,
    text_col: str,
    state_path: str,
    output_path: str,
    checkpoint: str,
    output_format: str = "parquet",
    available_now: bool = True,
    ttl_batches: int | None = None,
    compact_every: int = 32,
    **near_dedup_kwargs,
):
    """Start the near-dedup stream: each micro-batch computes survivors
    against the shared band registry, appends them to ``output_path``,
    and only then commits the batch's bands to the registry (sink before
    state — the order that keeps crash-replay at-least-once; see module
    docstring). ``ttl_batches`` bounds registry state for unbounded
    streams (batch_id is the TTL clock). Returns the started
    StreamingQuery (``availableNow`` by default — drain what exists,
    then stop; pass ``available_now=False`` for a continuous microbatch
    trigger)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        survivors, commit_registry = plan_near_dedup_batch(
            batch_df, id_col=id_col, text_col=text_col,
            state_path=state_path, batch_seq=batch_id,
            ttl_batches=ttl_batches, compact_every=compact_every,
            **near_dedup_kwargs,
        )
        survivors.write.mode("append").format(output_format).save(
            output_path
        )
        commit_registry()

    writer = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
