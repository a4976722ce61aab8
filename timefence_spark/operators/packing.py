"""Sequence packing: assign documents to fixed token-budget training
chunks.

LLM pretraining concatenates tokenized documents into a stream and cuts it
into context-window-sized chunks; the pipeline-side question is "which
chunk(s) does each document land in, and does it straddle a boundary".
Two packers:

* :func:`pack_stream` — the GPT-style concatenate-then-cut rule: documents
  are laid end-to-end in a deterministic order and chunk boundaries fall
  every ``budget`` tokens regardless of document edges. Pure window
  cumulative sum — one shuffle on the shard key, expressible in any SQL
  engine, so it is differentially verifiable.
* :func:`pack_next_fit` — boundary-respecting next-fit: a document that
  does not fit in the current chunk's remainder opens a new chunk, so no
  document straddles (oversized documents get a chunk of their own,
  flagged). The running remainder makes this inherently sequential, so it
  runs as one ``applyInPandas`` pass per shard (Arrow-batched, numpy loop).

Both packers shard the corpus first (salted hash of the id, ``num_shards``
buckets): sharding bounds every sequential scan at corpus_size/num_shards
and is how a 1000-executor cluster packs 100 TB — each shard's stream is
independent, deterministic, and reproducible across runs and partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timefence_spark.operators.sampling import _salted_hash


def _with_shard(
    df: DataFrame, id_col: str, num_shards: int, salt: str, hash_fn: str
) -> DataFrame:
    if num_shards < 1:
        raise ValueError(f"num_shards must be >= 1, got {num_shards}")
    h = _salted_hash(F.col(id_col), salt, hash_fn)
    return df.withColumn("shard", F.pmod(h, F.lit(num_shards)).cast("int"))


def pack_stream(
    df: DataFrame,
    *,
    id_col: str,
    token_col: str,
    budget: int,
    num_shards: int = 64,
    salt: str = "",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Concatenate-then-cut packing (documents may straddle boundaries).

    Within each shard, documents are ordered by (salted hash, id) — a
    deterministic shuffle of the corpus — and laid end-to-end; chunk ``c``
    of a shard covers token offsets [c*budget, (c+1)*budget). Output adds:

    * ``shard``        — hash shard (independent packing stream)
    * ``start_offset`` — first token's offset in the shard stream
    * ``chunk_start``  — chunk index containing the first token
    * ``chunk_end``    — chunk index containing the last token
    * ``straddles``    — chunk_end != chunk_start (document is cut)

    Physical shape: ONE shuffle (window over shard), cumulative sum per
    shard; no Python, no driver state. Zero-token documents take
    start_offset's chunk and never straddle."""
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    sharded = _with_shard(df, id_col, num_shards, salt, hash_fn)
    h = _salted_hash(F.col(id_col), salt, hash_fn)
    w = (
        Window.partitionBy("shard")
        .orderBy(h.asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tok = F.coalesce(F.col(token_col).cast("long"), F.lit(0))
    end_offset = F.sum(tok).over(w)  # exclusive end of this doc's span
    start = (end_offset - tok).alias("start_offset")
    chunk_start = F.floor(F.col("start_offset") / budget).cast("long")
    # Last token sits at end_offset-1; empty docs use start_offset.
    last_tok = F.greatest(F.col("__end") - 1, F.col("start_offset"))
    return (
        sharded.select("*", start, end_offset.alias("__end"))
        .select(
            *df.columns,
            "shard",
            "start_offset",
            chunk_start.alias("chunk_start"),
            F.floor(last_tok / budget).cast("long").alias("chunk_end"),
        )
        .withColumn("straddles", F.col("chunk_end") != F.col("chunk_start"))
    )


def pack_next_fit(
    df: DataFrame,
    *,
    id_col: str,
    token_col: str,
    budget: int,
    num_shards: int = 64,
    salt: str = "",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Boundary-respecting next-fit packing (no document straddles).

    Same deterministic per-shard order as :func:`pack_stream`; a document
    goes into the current chunk if its tokens fit in the remainder,
    otherwise it opens the next chunk. Documents longer than ``budget``
    get a chunk of their own with ``oversized = true`` (the caller decides
    whether to split or drop them). Output adds ``shard``, ``chunk``
    (per-shard chunk index), ``chunk_offset`` (token offset inside the
    chunk), ``oversized``.

    Next-fit's running remainder is sequential by nature, so each shard is
    one ``applyInPandas`` group: a single Arrow batch per shard and a tight
    numpy/python loop over it. Shard size bounds memory (corpus/num_shards
    rows); raise ``num_shards`` for bigger corpora — shards pack
    independently, so parallelism scales with the cluster, exactly like a
    bucketed write. Invariant (property-tested): every chunk's token sum
    <= budget unless it is a single oversized document."""
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    import pandas as pd

    sharded = _with_shard(df, id_col, num_shards, salt, hash_fn)
    sort_key = _salted_hash(F.col(id_col), salt, hash_fn)
    sharded = sharded.withColumn("__ord", sort_key)

    out_fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in sharded.schema.fields
    )
    out_schema = (
        f"{out_fields}, chunk long, chunk_offset long, oversized boolean"
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["__ord", id_col], kind="mergesort", ignore_index=True
        )
        toks = pdf[token_col].fillna(0).astype("int64").to_numpy()
        n = len(pdf)
        chunk = [0] * n
        offset = [0] * n
        oversized = [False] * n
        # m tracks chunk MEMBERSHIP, not just token usage: a zero-token
        # document occupies the chunk without raising `used`, and an
        # oversized doc must still open a fresh chunk past it (the
        # "oversized docs sit alone" contract).
        cur, used, m = 0, 0, 0
        for i in range(n):
            t = int(toks[i])
            if t > budget:
                # Oversized: own chunk, then continue fresh.
                cur += 1 if m > 0 else 0
                chunk[i], offset[i], oversized[i] = cur, 0, True
                cur += 1
                used, m = 0, 0
                continue
            if used + t > budget:
                cur += 1
                used, m = 0, 0
            chunk[i], offset[i] = cur, used
            used += t
            m += 1
        pdf = pdf.copy()
        pdf["chunk"] = chunk
        pdf["chunk_offset"] = offset
        pdf["oversized"] = oversized
        return pdf

    packed = sharded.groupBy("shard").applyInPandas(pack, out_schema)
    return packed.select(
        *df.columns, "shard", "chunk", "chunk_offset", "oversized"
    )


def assemble_chunks(
    packed: DataFrame,
    *,
    id_col: str,
    text_col: str,
    token_col: str,
    sep: str = " ",
) -> DataFrame:
    """Materialize packed chunks from :func:`pack_next_fit` output: one row
    per (shard, chunk) with the documents' text concatenated in
    chunk-offset order — the final corpus-to-training-stream step.

    Returns (shard, chunk, n_docs, n_tokens, text). One shuffle on the
    (shard, chunk) key; the in-chunk ordering is an array_sort over the
    collected (offset, id, text) structs, so chunk size (bounded by the
    pack budget) bounds the per-group memory, never the corpus. The id
    rides in the sort struct as a tie-break: zero-token documents share
    their ``chunk_offset`` with the following document, and without a
    unique secondary key the concatenation order of such ties would fall
    to the text values (and differ from any external replay)."""
    ordered = F.array_sort(
        F.collect_list(
            F.struct(F.col("chunk_offset"), F.col(id_col), F.col(text_col))
        )
    )
    return packed.groupBy("shard", "chunk").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col(token_col).cast("long")).alias("n_tokens"),
        F.array_join(
            F.transform(ordered, lambda s: s[text_col]), sep
        ).alias("text"),
    )


def pack_sequences(
    encoded: DataFrame,
    *,
    id_col: str,
    ids_col: str = "token_ids",
    seq_len: int,
    num_shards: int = 64,
    salt: str = "",
    hash_fn: str = "xxhash64",
    pad_id: int | None = None,
) -> DataFrame:
    """Materialize fixed-length training sequences from tokenized
    documents (:func:`operators.bpe.encode_documents` output) — the
    id-level counterpart of :func:`pack_stream`'s document-level
    assignment: documents lay end-to-end per shard in the same
    deterministic (salted hash, id) order, the concatenated id stream is
    cut every ``seq_len`` tokens, and each cut materializes as an
    ``input_ids`` row ready for a trainer. Documents straddle sequence
    boundaries by design (GPT-style concatenate-then-cut).

    One row per (shard, seq): (shard, seq, n_tokens, input_ids).
    ``pad_id`` pads each shard's final partial sequence up to
    ``seq_len``; ``pad_id=None`` drops partial tails instead (the usual
    pretraining choice).

    100 TB shape: ONE document-level exchange total. Docs hash-shuffle
    once on the shard key; the per-shard window prefix-sum (num_shards
    independent streams, no global sort), the posexplode to token rows,
    AND the (shard, seq) aggregation all run on that same partitioning —
    Catalyst sees hashpartitioning(shard) satisfies the (shard, seq)
    clustering, so token-level rows NEVER cross the wire (plan-pinned in
    tests/test_plans.py). Per-group memory is bounded by seq_len structs,
    never by document or corpus size; parallelism is num_shards — size it
    to the cluster (default 64). Token-level rows are inherent to
    materializing training data — this operator is the boundary where the
    pipeline stops being document-shaped; everything upstream (dedup,
    filtering, counting) stays at document granularity."""
    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    sharded = _with_shard(encoded, id_col, num_shards, salt, hash_fn)
    h = _salted_hash(F.col(id_col), salt, hash_fn)
    w = (
        Window.partitionBy("shard")
        .orderBy(h.asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ids = F.coalesce(F.col(ids_col), F.expr("cast(array() as array<int>)"))
    n_tok = F.size(ids).cast("long")
    start = (F.sum(n_tok).over(w) - n_tok).alias("__start")
    tokens = (
        sharded.select("shard", ids.alias("__ids"), start)
        .select(
            "shard",
            F.posexplode("__ids").alias("__p", "__tid"),
            F.col("__start"),
        )
        .select(
            "shard",
            F.col("__tid"),
            (F.col("__start") + F.col("__p")).alias("__gpos"),
        )
    )
    seqs = (
        tokens.groupBy(
            "shard", F.floor(F.col("__gpos") / seq_len).alias("seq")
        )
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("__gpos"), F.col("__tid")))
                ),
                lambda s: s["__tid"],
            ).alias("input_ids")
        )
        .select(
            "shard",
            F.col("seq").cast("long").alias("seq"),
            F.size("input_ids").cast("long").alias("n_tokens"),
            "input_ids",
        )
    )
    if pad_id is None:
        return seqs.where(F.col("n_tokens") == seq_len)
    return seqs.withColumn(
        "input_ids",
        F.concat(
            F.col("input_ids"),
            F.array_repeat(
                F.lit(pad_id).cast("int"),
                (F.lit(seq_len) - F.col("n_tokens")).cast("int"),
            ),
        ),
    )
