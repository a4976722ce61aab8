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
registry, survivors append to the sink, the batch's bands append to the
registry. The registry is stored as parquet keyed by band hash —
swap :func:`near_dedup_batch`'s two registry touch-points for a Delta /
Iceberg table to make the append transactional.

Delivery semantics: AT-LEAST-ONCE. The registry append and the sink
append are not atomic with the streaming checkpoint; a batch replayed
after a crash may re-append sink rows (dedupe downstream on id) while
the registry replay is harmless (band membership is idempotent —
re-appended band rows change no decision; the anti-join merely keeps the
registry file count down). Within one batch the greedy keep-smallest-id
rule makes survivors deterministic; across batches arrival order
decides, exactly like the exact-dedup stream.

100 TB shape: per batch — one band shuffle of (band_hash, id) rows
(never text), one min-per-band aggregation (map-side combined; a hot
boilerplate band combines instead of exploding), one broadcast-or-
shuffle semi-join against the registry, and one ids-only anti-join
append. Registry size is O(bands x distinct admitted docs) longs; cap
pathological buckets with ``max_bucket_size`` exactly as in batch LSH.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from timefence_spark.operators.dedup import (
    _band_buckets,
    _cap_buckets,
    _shingle_df,
    _signature_df,
)

_REGISTRY_SCHEMA = "band_hash string"


def _registry(spark, state_path: str) -> DataFrame:
    """The band registry at ``state_path`` (empty before the first
    append). ONLY the path-not-found case maps to an empty registry —
    any other read failure (auth, corrupt footer, permissions) must
    fail the batch: silently substituting an empty registry would admit
    near-duplicates of everything already seen."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.schema(_REGISTRY_SCHEMA).parquet(state_path)
    except AnalysisException as exc:
        if "PATH_NOT_FOUND" in str(exc):
            return spark.createDataFrame([], _REGISTRY_SCHEMA)
        raise


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
) -> DataFrame:
    """One micro-batch of near-dedup against (and updating) the band
    registry at ``state_path``. Returns the surviving rows (all columns
    of ``batch_df``), MATERIALIZED — the registry must be read before it
    is appended to, so this function is eager by necessity.

    A document survives iff none of its band hashes (1) is already in
    the registry or (2) is shared with a smaller-id document in the same
    batch (greedy first-arrival; the within-batch rule is what a
    sequential ingest of the batch in id order would decide). ALL of the
    batch's bands — survivors' and dropped rows' alike — then join the
    registry, so anything near a previously SEEN document stays dropped
    in later batches (registry semantics, matching the batch
    ``minhash_dedup``'s transitive-drop posture rather than
    keep-one-per-component)."""
    if num_perm % bands != 0:
        raise ValueError("num_perm must be divisible by bands")
    spark = batch_df.sparkSession

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
        registry = _registry(spark, state_path)

        state_hits = (
            band_tbl.join(registry, "band_hash", "left_semi")
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
        # Pin survivors BEFORE the registry grows: their plan embeds a
        # registry scan, and re-executing it after the append below would
        # read the batch's own bands back and drop everything.
        out = survivors.localCheckpoint(eager=True)

        new_bands = (
            band_tbl.select("band_hash")
            .distinct()
            .join(registry, "band_hash", "left_anti")
        )
        new_bands.write.mode("append").parquet(state_path)
        return out
    finally:
        band_tbl.unpersist()


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
    **near_dedup_kwargs,
):
    """Start the near-dedup stream: each micro-batch runs
    :func:`near_dedup_batch` against the shared band registry and appends
    survivors to ``output_path``. Returns the started StreamingQuery
    (``availableNow`` by default — drain what exists, then stop; pass
    ``available_now=False`` for a continuous microbatch trigger)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        survivors = near_dedup_batch(
            batch_df, id_col=id_col, text_col=text_col,
            state_path=state_path, **near_dedup_kwargs,
        )
        survivors.write.mode("append").format(output_format).save(
            output_path
        )

    writer = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
