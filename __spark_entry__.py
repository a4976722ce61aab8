"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship multi-feature PIT build at sf0.001.
``queries()`` exposes each implemented operator from SURVEY.md §2 (plus the
LLM-data-pipeline extensions) as (spark, sf_dir) -> DataFrame; every entry has
a DuckDB-equivalent ``oracle_sql()``.

All computed/aggregate columns are aliased identically on both sides; computed
floats are rounded (or summed as DECIMAL) so cross-engine value hashes match.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timefence_spark.operators import dedup, similarity, text
from timefence_spark.operators.asof import asof_join
from timefence_spark.sources.readers import read_parquet

DAY = 86400


def _t(spark: SparkSession, sf_dir: str, name: str, *, spread: bool | None = None) -> DataFrame:
    df = read_parquet(spark, f"{sf_dir}/{name}.parquet")
    if spread is None:
        spread = name in ("documents", "embeddings")
    if spread:
        # These tables arrive as one small parquet file -> ONE scan
        # partition, so every CPU-bound operator (shingling, signatures,
        # vector math) would run single-threaded regardless of cores. A real
        # corpus has thousands of files; spread the small test file so the
        # plan exercises the parallel shape. (~MBs shuffled once.) Pure
        # hash-aggregate queries pass spread=False: Spark already
        # parallelizes the aggregation after the scan, so the extra
        # shuffle is a dead cost there.
        df = df.repartition(spark.sparkContext.defaultParallelism)
    return df


# ---------------------------------------------------------------------------
# PIT / as-of joins (SURVEY §2.3 J1-J5)
# ---------------------------------------------------------------------------


def _prev_order_feature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (custkey, orderdate): max total — unique (key, ts) by construction."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_totalprice").alias("prev_total"))
        .select(
            F.col("o_custkey").alias("user_id"),
            F.col("o_orderdate").alias("feature_time"),
            "prev_total",
        )
    )


def _pit_orders(
    spark: SparkSession,
    sf_dir: str,
    *,
    embargo_d: int = 0,
    strict: bool = True,
    staleness_d: int | None = None,
    strategy: str = "auto",
    skew_bucket: int | None = None,
) -> DataFrame:
    labels = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    return asof_join(
        labels,
        _prev_order_feature(spark, sf_dir),
        on=[("o_custkey", "user_id")],
        left_time="o_orderdate",
        right_time="feature_time",
        value_cols=["prev_total"],
        prefix="f",
        embargo=embargo_d * DAY,
        lookback=365 * DAY,
        staleness=None if staleness_d is None else staleness_d * DAY,
        strict=strict,
        strategy=strategy,
        skew_bucket=skew_bucket,
    )


def _pit_orders_oracle(
    *, op: str = "<", embargo_d: int = 0, staleness_d: int | None = None
) -> str:
    upper = (
        f"l.o_orderdate - INTERVAL {embargo_d} DAY" if embargo_d else "l.o_orderdate"
    )
    staleness = (
        f"\n         AND f.feature_time >= l.o_orderdate - INTERVAL {staleness_d} DAY"
        if staleness_d is not None
        else ""
    )
    return f"""
    WITH labels AS (SELECT ROW_NUMBER() OVER () AS rid, * FROM orders),
    feat AS (
        SELECT o_custkey AS user_id, o_orderdate AS feature_time,
               MAX(o_totalprice) AS prev_total
        FROM orders GROUP BY 1, 2
    ), ranked AS (
        SELECT l.o_orderkey, l.o_custkey, l.o_orderdate, l.o_totalprice,
               f.prev_total AS f__prev_total, f.feature_time AS f__feature_time,
               ROW_NUMBER() OVER (PARTITION BY l.rid ORDER BY f.feature_time DESC) AS rn
        FROM labels l
        LEFT JOIN feat f
          ON f.user_id = l.o_custkey
         AND f.feature_time {op} {upper}
         AND f.feature_time >= l.o_orderdate - INTERVAL 365 DAY{staleness}
    )
    SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice,
           f__prev_total, f__feature_time
    FROM ranked WHERE rn = 1
    """


def q_pit_strict(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _pit_orders(spark, sf_dir)


def q_pit_embargo(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _pit_orders(spark, sf_dir, embargo_d=7)


def q_pit_inclusive(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _pit_orders(spark, sf_dir, strict=False, embargo_d=30)


def q_pit_staleness(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _pit_orders(spark, sf_dir, staleness_d=90)


def q_pit_union_strategy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same invariant as q_pit_strict through the no-fanout union plan."""
    return _pit_orders(spark, sf_dir, strategy="union")


def q_pit_skew_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same invariant through the skew-hardened bucketed union plan (90-day
    time buckets + cross-bucket carry join) — must be result-identical to
    pit_strict."""
    return _pit_orders(spark, sf_dir, strategy="union", skew_bucket=90 * DAY)


def q_pit_composite_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    labels = li.select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_shipdate"
    )
    feat = (
        li.groupBy("l_partkey", "l_suppkey", "l_shipdate")
        .agg(F.max("l_extendedprice").alias("prior_price"))
        .select(
            "l_partkey",
            "l_suppkey",
            F.col("l_shipdate").alias("feature_time"),
            "prior_price",
        )
    )
    return asof_join(
        labels,
        feat,
        on=["l_partkey", "l_suppkey"],
        left_time="l_shipdate",
        right_time="feature_time",
        value_cols=["prior_price"],
        prefix="f",
        lookback=365 * DAY,
        strict=True,
    )


ORACLE_PIT_COMPOSITE = """
    WITH labels AS (SELECT ROW_NUMBER() OVER () AS rid, * FROM lineitem),
    feat AS (
        SELECT l_partkey, l_suppkey, l_shipdate AS feature_time,
               MAX(l_extendedprice) AS prior_price
        FROM lineitem GROUP BY 1, 2, 3
    ), ranked AS (
        SELECT l.l_orderkey, l.l_linenumber, l.l_partkey, l.l_suppkey, l.l_shipdate,
               f.prior_price AS f__prior_price, f.feature_time AS f__feature_time,
               ROW_NUMBER() OVER (PARTITION BY l.rid ORDER BY f.feature_time DESC) AS rn
        FROM labels l
        LEFT JOIN feat f
          ON f.l_partkey = l.l_partkey AND f.l_suppkey = l.l_suppkey
         AND f.feature_time < l.l_shipdate
         AND f.feature_time >= l.l_shipdate - INTERVAL 365 DAY
    )
    SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_shipdate,
           f__prior_price, f__feature_time
    FROM ranked WHERE rn = 1
"""


def q_pit_events_keymap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fine-grained (sub-second) timestamps + key mapping user_id->entity."""
    ev = _t(spark, sf_dir, "events")
    labels = ev.where(F.col("event_id") % 5 == 0).select(
        "event_id", F.col("user_id").alias("entity"), F.col("ts").alias("label_time")
    )
    feat = (
        ev.groupBy("user_id", "ts")
        .agg(F.max("value").alias("v"))
        .select("user_id", F.col("ts").alias("feature_time"), "v")
    )
    return asof_join(
        labels,
        feat,
        on=[("entity", "user_id")],
        left_time="label_time",
        right_time="feature_time",
        value_cols=["v"],
        prefix="f",
        embargo=3600,
        lookback=7 * DAY,
        strict=True,
    )


ORACLE_PIT_EVENTS = """
    WITH labels AS (
        SELECT event_id, user_id AS entity, ts AS label_time
        FROM events WHERE event_id % 5 = 0
    ), feat AS (
        SELECT user_id, ts AS feature_time, MAX(value) AS v
        FROM events GROUP BY 1, 2
    ), ranked AS (
        SELECT l.event_id, l.entity, l.label_time,
               f.v AS f__v, f.feature_time AS f__feature_time,
               ROW_NUMBER() OVER (PARTITION BY l.event_id ORDER BY f.feature_time DESC) AS rn
        FROM labels l
        LEFT JOIN feat f
          ON f.user_id = l.entity
         AND f.feature_time < l.label_time - INTERVAL 1 HOUR
         AND f.feature_time >= l.label_time - INTERVAL 7 DAY
    )
    SELECT event_id, entity, label_time, f__v, f__feature_time
    FROM ranked WHERE rn = 1
"""


def q_pit_multi_single_pass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same invariant and output as q_pit_multi_feature, produced by the
    ONE-pass multi-feature plan (pit_match_multi): both features union with
    the spine into a single shuffle + Window operator, mixed embargos (0 and
    1d) riding on the feature-side sort position. o_orderkey serves as the
    spine row id; one join re-attaches the label columns."""
    from timefence_spark.operators.asof import pit_match_multi

    orders = _t(spark, sf_dir, "orders")
    labels = orders.select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    f1 = _prev_order_feature(spark, sf_dir).select(
        F.col("user_id").alias("o_custkey"), "feature_time", "prev_total"
    )
    day_spend = orders.groupBy("o_custkey", "o_orderdate").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("day_spend")
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_micros(F.col("o_orderdate").cast("timestamp")))
        .rangeBetween(-30 * DAY * 1_000_000, 0)
    )
    f2 = day_spend.select(
        "o_custkey",
        F.col("o_orderdate").alias("feature_time"),
        F.sum("day_spend").over(w).cast("double").alias("spend_30d"),
    )
    matched = pit_match_multi(
        labels,
        [
            ("prev", f1, "feature_time", ["prev_total"], 0),
            ("roll", f2, "feature_time", ["spend_30d"], DAY),
        ],
        key_pairs=[("o_custkey", "o_custkey")],
        label_time="o_orderdate",
        lookback_s=365 * DAY,
        strict=True,
        row_id="o_orderkey",
    )
    return labels.join(matched, "o_orderkey", "left").select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        "o_totalprice",
        "prev__prev_total",
        "prev__feature_time",
        "roll__spend_30d",
        "roll__feature_time",
    )


# ---------------------------------------------------------------------------
# Streaming as-of joins under the differential gate: the stream runs with
# trigger(availableNow=True) over staged file sources and lands in a memory
# sink; the oracle is the BATCH as-of SQL on the same events table — the two
# are defined to agree (timefence_spark/streaming/asof.py:1-41).
# ---------------------------------------------------------------------------


def _stage_event_streams(
    spark: SparkSession, sf_dir: str, *, with_sentinels: bool
) -> tuple[str, str]:
    """Write the events-derived label/feature tables as file-source staging
    dirs under /tmp (one file per micro-batch via maxFilesPerTrigger=1).

    Sentinels: two trailing far-future feature files (nonexistent key -1)
    advance the watermark past every label — the first moves the watermark,
    the second provides the batch in which the event-time timeouts fire and
    flush pending state. Only the stream-stream join needs them; the
    stream-static join is stateless."""
    import tempfile
    import uuid
    from datetime import datetime

    stage = f"{tempfile.gettempdir()}/tf_stream_{uuid.uuid4().hex[:8]}"
    ev = _t(spark, sf_dir, "events", spread=False)
    labels = ev.where(F.col("event_id") % 5 == 0).select(
        "event_id", F.col("user_id").alias("entity"), F.col("ts").alias("label_time")
    )
    feat = (
        ev.groupBy("user_id", "ts")
        .agg(F.max("value").alias("v"))
        .select("user_id", F.col("ts").alias("feature_time"), "v")
    )
    labels.coalesce(1).write.parquet(f"{stage}/labels/b0")
    feat.coalesce(1).write.parquet(f"{stage}/features/b0")
    if with_sentinels:
        for i, day in enumerate((1, 2)):
            spark.createDataFrame(
                [(-1, datetime(2100, 1, day), 0.0)], feat.schema
            ).coalesce(1).write.parquet(f"{stage}/features/b{i + 1}")
    return stage, f"tfs_{uuid.uuid4().hex[:8]}"


def _run_to_memory_sink(spark: SparkSession, stage: str, qname: str, joined) -> DataFrame:
    q = (
        joined.writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .option("checkpointLocation", f"{stage}/ckpt_{qname}")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(qname)


def q_streaming_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream as-of join (applyInPandasWithState) replayed over file
    sources with trigger(availableNow=True); semantics identical to
    q_pit_events_keymap, so it shares that batch oracle SQL."""
    from timefence_spark.streaming import streaming_asof_join

    stage, qname = _stage_event_streams(spark, sf_dir, with_sentinels=True)
    lbl_schema = "event_id long, entity long, label_time timestamp_ntz"
    ft_schema = "user_id long, feature_time timestamp_ntz, v double"
    ls = (
        spark.readStream.schema(lbl_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{stage}/labels/*")
    )
    fs = (
        spark.readStream.schema(ft_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{stage}/features/*")
    )
    joined = streaming_asof_join(
        ls,
        fs,
        on=[("entity", "user_id")],
        left_time="label_time",
        right_time="feature_time",
        value_cols=["v"],
        prefix="f",
        embargo=3600,
        lookback=7 * DAY,
        strict=True,
        max_delay="0 seconds",
    )
    return _run_to_memory_sink(spark, stage, qname, joined).orderBy("event_id")


def q_streaming_asof_static(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label stream against a static feature table whose payload is a MAP
    column — exercises the non-orderable-payload fallback (array_sort
    comparator on feature_time) in the broadcast compacted-history plan.
    The map is unpacked to a plain double afterwards so the oracle compares
    scalar values."""
    from timefence_spark.streaming import stream_static_asof_join

    stage, qname = _stage_event_streams(spark, sf_dir, with_sentinels=False)
    ev = _t(spark, sf_dir, "events", spread=False)
    feat = (
        ev.groupBy("user_id", "ts")
        .agg(F.max("value").alias("v"))
        .select(
            "user_id",
            F.col("ts").alias("feature_time"),
            F.create_map(F.lit("v"), F.col("v")).alias("payload"),
        )
    )
    lbl_schema = "event_id long, entity long, label_time timestamp_ntz"
    ls = (
        spark.readStream.schema(lbl_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{stage}/labels/*")
    )
    joined = stream_static_asof_join(
        ls,
        feat,
        on=[("entity", "user_id")],
        left_time="label_time",
        right_time="feature_time",
        value_cols=["payload"],
        prefix="f",
        embargo=3600,
        lookback=7 * DAY,
        strict=True,
    )
    out = _run_to_memory_sink(spark, stage, qname, joined)
    return out.select(
        "event_id",
        "entity",
        "label_time",
        F.col("f__payload")["v"].alias("f__v"),
        "f__feature_time",
    ).orderBy("event_id")


def q_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup replayed over file sources: the documents
    table split into two micro-batches (odd ids then even ids) with
    first-arrival state carried across the batch boundary. Output is the
    distinct content-hash set — deterministic regardless of which
    duplicate row survives — so it shares a plain DISTINCT batch oracle."""
    import tempfile
    import uuid

    from timefence_spark.streaming import streaming_exact_dedup

    stage = f"{tempfile.gettempdir()}/tf_sdedup_{uuid.uuid4().hex[:8]}"
    qname = f"tfd_{uuid.uuid4().hex[:8]}"
    docs = _t(spark, sf_dir, "documents", spread=False).select("doc_id", "text")
    docs.where(F.col("doc_id") % 2 == 1).coalesce(1).write.parquet(f"{stage}/in/b0")
    docs.where(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(f"{stage}/in/b1")
    ds = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{stage}/in/*")
    )
    deduped = streaming_exact_dedup(ds, content_cols="text", hash_fn="md5")
    out = _run_to_memory_sink(spark, stage, qname, deduped)
    return out.select("content_hash")


ORACLE_STREAMING_DEDUP = """
    SELECT DISTINCT md5(text) AS content_hash FROM documents
"""


def q_streaming_near_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental MinHash-LSH NEAR-dedup (new in round 9): the
    documents table replayed as two micro-batches (even ids then odd)
    through the band-registry kernel (streaming.near_dedup_batch,
    portable md5 hashes) — a doc survives iff no LSH band collides with
    the registry or with a smaller-id doc in its own batch; ALL seen
    bands then join the registry. The oracle replays both batches
    declaratively over the same SQL band table the batch minhash oracle
    uses."""
    import shutil
    import tempfile
    import uuid

    from timefence_spark.streaming import near_dedup_batch

    docs = _t(spark, sf_dir, "documents", spread=False).select(
        "doc_id", "text"
    )
    state = f"{tempfile.gettempdir()}/tf_ndreg_{uuid.uuid4().hex[:8]}"
    try:
        parts = []
        for parity in (0, 1):
            surv = near_dedup_batch(
                docs.where(F.col("doc_id") % 2 == parity),
                id_col="doc_id", text_col="text", state_path=state,
                hash_fn="md5",
            )
            parts.append(surv.select("doc_id"))
        # near_dedup_batch is eager (localCheckpoint), so the registry
        # dir can be removed before returning the lazy union.
        return parts[0].unionByName(parts[1])
    finally:
        shutil.rmtree(state, ignore_errors=True)


def _oracle_streaming_near_dedup_sql() -> str:
    return f"""
    WITH {_minhash_pairs_cte()},
    b0 AS (SELECT doc_id, band_key FROM bands WHERE doc_id % 2 = 0),
    b1 AS (SELECT doc_id, band_key FROM bands WHERE doc_id % 2 = 1)
    SELECT d.doc_id FROM documents d
    WHERE (d.doc_id % 2 = 0 AND NOT EXISTS (
               SELECT 1 FROM b0 x JOIN b0 y ON x.band_key = y.band_key
               WHERE x.doc_id = d.doc_id AND y.doc_id < d.doc_id))
       OR (d.doc_id % 2 = 1
           AND NOT EXISTS (
               SELECT 1 FROM b1 x JOIN b0 y ON x.band_key = y.band_key
               WHERE x.doc_id = d.doc_id)
           AND NOT EXISTS (
               SELECT 1 FROM b1 x JOIN b1 y ON x.band_key = y.band_key
               WHERE x.doc_id = d.doc_id AND y.doc_id < d.doc_id))
    """


def q_pit_multi_feature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two features recombined on the spine (J5): as-of prev_total plus an
    as-of 30d rolling DECIMAL spend (sql-mode-style derived feature)."""
    orders = _t(spark, sf_dir, "orders")
    labels = orders.select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    f1 = _prev_order_feature(spark, sf_dir)
    day_spend = orders.groupBy("o_custkey", "o_orderdate").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("day_spend")
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_micros(F.col("o_orderdate").cast("timestamp")))
        .rangeBetween(-30 * DAY * 1_000_000, 0)
    )
    f2 = day_spend.select(
        "o_custkey",
        F.col("o_orderdate").alias("feature_time"),
        F.sum("day_spend").over(w).cast("double").alias("spend_30d"),
    )
    step1 = asof_join(
        labels,
        f1,
        on=[("o_custkey", "user_id")],
        left_time="o_orderdate",
        right_time="feature_time",
        value_cols=["prev_total"],
        prefix="prev",
        lookback=365 * DAY,
        strict=True,
    )
    return asof_join(
        step1,
        f2,
        on=["o_custkey"],
        left_time="o_orderdate",
        right_time="feature_time",
        value_cols=["spend_30d"],
        prefix="roll",
        embargo=1 * DAY,
        lookback=365 * DAY,
        strict=True,
    )


ORACLE_PIT_MULTI = """
    WITH labels AS (SELECT ROW_NUMBER() OVER () AS rid, * FROM orders),
    f1 AS (
        SELECT o_custkey AS user_id, o_orderdate AS feature_time,
               MAX(o_totalprice) AS prev_total
        FROM orders GROUP BY 1, 2
    ),
    day_spend AS (
        SELECT o_custkey, o_orderdate,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS day_spend
        FROM orders GROUP BY 1, 2
    ),
    f2 AS (
        SELECT o_custkey, o_orderdate AS feature_time,
               CAST(SUM(day_spend) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate
                   RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS spend_30d
        FROM day_spend
    ),
    j1 AS (
        SELECT l.rid, f.prev_total AS prev__prev_total,
               f.feature_time AS prev__feature_time,
               ROW_NUMBER() OVER (PARTITION BY l.rid ORDER BY f.feature_time DESC) AS rn
        FROM labels l
        LEFT JOIN f1 f
          ON f.user_id = l.o_custkey
         AND f.feature_time < l.o_orderdate
         AND f.feature_time >= l.o_orderdate - INTERVAL 365 DAY
    ),
    j2 AS (
        SELECT l.rid, f.spend_30d AS roll__spend_30d,
               f.feature_time AS roll__feature_time,
               ROW_NUMBER() OVER (PARTITION BY l.rid ORDER BY f.feature_time DESC) AS rn
        FROM labels l
        LEFT JOIN f2 f
          ON f.o_custkey = l.o_custkey
         AND f.feature_time < l.o_orderdate - INTERVAL 1 DAY
         AND f.feature_time >= l.o_orderdate - INTERVAL 365 DAY
    )
    SELECT l.o_orderkey, l.o_custkey, l.o_orderdate, l.o_totalprice,
           j1.prev__prev_total, j1.prev__feature_time,
           j2.roll__spend_30d, j2.roll__feature_time
    FROM labels l
    LEFT JOIN (SELECT * FROM j1 WHERE rn = 1) j1 ON j1.rid = l.rid
    LEFT JOIN (SELECT * FROM j2 WHERE rn = 1) j2 ON j2.rid = l.rid
"""


# ---------------------------------------------------------------------------
# Windowed aggregation (SURVEY §2.4 A7 / §2.5 W3)
# ---------------------------------------------------------------------------


def q_rolling_spend_30d(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_micros(F.col("o_orderdate").cast("timestamp")))
        .rangeBetween(-30 * DAY * 1_000_000, 0)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("spend_30d"),
    )


ORACLE_ROLLING = """
    SELECT o_orderkey, o_custkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate
               RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS spend_30d
    FROM orders
"""


# ---------------------------------------------------------------------------
# Duplicate detection (SURVEY §2.4 A3)
# ---------------------------------------------------------------------------


def q_duplicate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") > 1)
    )


ORACLE_DUPLICATES = """
    SELECT o_custkey, o_orderdate, COUNT(*) AS cnt
    FROM orders GROUP BY 1, 2 HAVING COUNT(*) > 1
"""


# ---------------------------------------------------------------------------
# Audit-temporal counts (SURVEY §3.2 temporal mode) on a planted-leak dataset
# ---------------------------------------------------------------------------


def q_audit_temporal_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic leaky dataset (feature_time = label_time + 3d for even
    keys, -3d for odd) -> per-feature leak count/pct like audit.temporal."""
    orders = _t(spark, sf_dir, "orders")
    shifted = orders.select(
        "o_orderkey",
        F.col("o_orderdate").alias("label_time"),
        F.when(
            F.col("o_custkey") % 2 == 0,
            F.col("o_orderdate") + F.make_dt_interval(days=F.lit(3)),
        )
        .otherwise(F.col("o_orderdate") - F.make_dt_interval(days=F.lit(3)))
        .alias("f__feature_time"),
    )
    lt = F.col("label_time")
    ft = F.col("f__feature_time")
    return shifted.agg(
        F.count(F.lit(1)).alias("total_rows"),
        F.count(F.when(ft.isNotNull() & (ft >= lt), 1)).alias("leaky_rows"),
        F.max(
            F.when(ft >= lt, F.unix_micros(ft.cast("timestamp")) - F.unix_micros(lt.cast("timestamp")))
        ).alias("max_leak_us"),
    )


ORACLE_AUDIT_TEMPORAL = """
    WITH shifted AS (
        SELECT o_orderkey, o_orderdate AS label_time,
               CASE WHEN o_custkey % 2 = 0
                    THEN o_orderdate + INTERVAL 3 DAY
                    ELSE o_orderdate - INTERVAL 3 DAY END AS f__feature_time
        FROM orders
    )
    SELECT COUNT(*) AS total_rows,
           COUNT(*) FILTER (f__feature_time IS NOT NULL AND f__feature_time >= label_time) AS leaky_rows,
           MAX(CASE WHEN f__feature_time >= label_time
                    THEN epoch_us(f__feature_time) - epoch_us(label_time) END) AS max_leak_us
    FROM shifted
"""


def q_leak_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level leak flagging (streaming audit's flag_leaks, batch form) on
    the planted-leak dataset with a 1d embargo: a row leaks when
    feature_time >= label_time - 1d."""
    from timefence_spark.streaming import flag_leaks

    orders = _t(spark, sf_dir, "orders")
    shifted = orders.select(
        "o_orderkey",
        F.col("o_orderdate").alias("label_time"),
        F.when(
            F.col("o_custkey") % 2 == 0,
            F.col("o_orderdate") + F.make_dt_interval(days=F.lit(3)),
        )
        .otherwise(F.col("o_orderdate") - F.make_dt_interval(days=F.lit(3)))
        .alias("f__feature_time"),
    )
    return flag_leaks(
        shifted,
        feature_time_columns={"f": "f__feature_time"},
        label_time="label_time",
        embargo="1d",
    ).select(
        "o_orderkey",
        "label_time",
        F.col("__leak__f").alias("leak_f"),
        F.col("__leak_any").alias("leak_any"),
    )


ORACLE_LEAK_FLAGS = """
    WITH shifted AS (
        SELECT o_orderkey, o_orderdate AS label_time,
               CASE WHEN o_custkey % 2 = 0
                    THEN o_orderdate + INTERVAL 3 DAY
                    ELSE o_orderdate - INTERVAL 3 DAY END AS f__feature_time
        FROM orders
    )
    SELECT o_orderkey, label_time,
           (f__feature_time IS NOT NULL
            AND f__feature_time >= label_time - INTERVAL 1 DAY) AS leak_f,
           (f__feature_time IS NOT NULL
            AND f__feature_time >= label_time - INTERVAL 1 DAY) AS leak_any
    FROM shifted
"""


# ---------------------------------------------------------------------------
# LLM-data-pipeline extensions: dedup / text analysis / similarity
# ---------------------------------------------------------------------------


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash: survivor = min doc_id per md5(text)."""
    return (
        _t(spark, sf_dir, "documents", spread=False)
        .groupBy(F.md5(F.col("text")).alias("content_hash"))
        .agg(F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


ORACLE_DEDUP_EXACT = """
    SELECT md5(text) AS content_hash, MIN(doc_id) AS doc_id,
           COUNT(*) AS n_copies
    FROM documents GROUP BY 1
"""


def q_text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + type/token profile per document."""
    docs = _t(spark, sf_dir, "documents")
    tokens = F.split(F.col("text"), r"\s+")
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.size(tokens).alias("n_tokens"),
        F.size(F.array_distinct(tokens)).alias("n_types"),
    )


ORACLE_TEXT_TOKENS = r"""
    SELECT doc_id, LENGTH(text) AS n_chars,
           LEN(string_split_regex(text, '\s+')) AS n_tokens,
           LEN(list_distinct(string_split_regex(text, '\s+'))) AS n_types
    FROM documents
"""


def q_lang_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language profile: exact-integer aggregates (deterministic cross-engine)."""
    return (
        _t(spark, sf_dir, "documents", spread=False)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )


ORACLE_LANG_PROFILE = """
    SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
    FROM documents GROUP BY 1
"""


def q_knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 neighbors for query vectors (vec_id < 20).

    Calls the library operator so the benched plan is the plan a user gets:
    the corpus streams map-side and the (small, filtered) QUERY side is
    broadcast — never the corpus. ``spread=False`` on the query side: no
    point shuffling 20 rows to 32 partitions."""
    corpus = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    queries = (
        _t(spark, sf_dir, "embeddings", spread=False)
        .where(F.col("vec_id") < 20)
        .select("vec_id", "embedding")
    )
    return similarity.cosine_topk(
        queries,
        corpus,
        query_id="vec_id",
        corpus_id="vec_id",
        k=5,
        round_to=4,
        broadcast_queries=True,
    ).select("query_id", "neighbor_id", "cosine", "rank")


def q_knn_cosine_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same exact top-5 as q_knn_cosine through the Arrow matmul kernel
    (one BLAS matmul + per-batch top-k pruning per Arrow batch) — shares
    the brute-force oracle; verified value-identical at every test SF."""
    corpus = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    queries = (
        _t(spark, sf_dir, "embeddings", spread=False)
        .where(F.col("vec_id") < 20)
        .select("vec_id", "embedding")
    )
    return similarity.cosine_topk(
        queries,
        corpus,
        query_id="vec_id",
        corpus_id="vec_id",
        k=5,
        round_to=4,
        compute="arrow",
    ).select("query_id", "neighbor_id", "cosine", "rank")


ORACLE_KNN = """
    WITH pairs AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROUND(
                   list_dot_product(q.embedding, c.embedding) /
                   (SQRT(list_dot_product(q.embedding, q.embedding)) *
                    SQRT(list_dot_product(c.embedding, c.embedding))), 4
               ) AS cosine
        FROM embeddings q JOIN embeddings c ON c.vec_id != q.vec_id
        WHERE q.vec_id < 20
    ), ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC
        ) AS rank
        FROM pairs
    )
    SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 5
"""


def q_knn_mrl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-truncated exact kNN: vectors prefix-truncate to 16 of
    64 dims (truncate_embeddings — scan-side slice, every downstream
    byte 4x smaller), then brute-force cosine top-5. Renormalization is
    cosine-invariant, so the oracle scores raw truncated prefixes."""
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    tr = similarity.truncate_embeddings(
        emb, vec_col="embedding", dims=16, renormalize=False
    )
    return similarity.cosine_topk(
        tr.where(F.col("vec_id") < 20), tr,
        query_id="vec_id", corpus_id="vec_id", k=5, round_to=4,
        broadcast_queries=True,
    ).select("query_id", "neighbor_id", "cosine", "rank")


ORACLE_KNN_MRL = """
    WITH t AS (
        SELECT vec_id, (embedding::DOUBLE[])[1:16] AS v FROM embeddings
    ), pairs AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROUND(
                   list_dot_product(q.v, c.v) /
                   (SQRT(list_dot_product(q.v, q.v)) *
                    SQRT(list_dot_product(c.v, c.v))), 4
               ) AS cosine
        FROM t q JOIN t c ON c.vec_id != q.vec_id
        WHERE q.vec_id < 20
    ), ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC
        ) AS rank
        FROM pairs
    )
    SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 5
"""


def q_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-Marginal-Relevance diversification (new in round 11,
    fusion.mmr_rerank): each query's exact-cosine top-20 greedily
    re-ordered by ``lambda*rel - (1-lambda)*max-sim-to-selected`` with
    relevance/similarity/lambda quantized to integer micros at single
    rounding sites — every greedy pick is an integer comparison, so
    the oracle replays the selection loop bit-for-bit as a recursive
    CTE. One bounded (query) gather + a pure-JVM fold; no N^2
    shuffle, no Python in the rerank itself.

    Candidate generation uses the Arrow matmul kernel (round 14,
    VERDICT r13 item 3): the 'expr' kernel's candidate pass was a
    BroadcastNestedLoopJoin scoring |Q| x |C| rows through the
    interpreted HOF fold — O(queries x corpus) at scale. The Arrow
    scan streams the corpus through one BLAS matmul per batch with
    per-batch top-k pruning (the q_knn_cosine_arrow path, verified
    value-identical to the fold at every test SF on round_to=4
    outputs), so no BNLJ over the corpus remains in the plan."""
    from timefence_spark.operators import fusion

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cands = similarity.cosine_topk(
        emb.where(F.col("vec_id") < 10), emb,
        query_id="vec_id", corpus_id="vec_id", k=20, round_to=4,
        compute="arrow",
    )
    return fusion.mmr_rerank(cands, emb, lambda_=0.7, k=5)


ORACLE_MMR_RERANK = """
    WITH RECURSIVE
    e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    pairs AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROUND(list_dot_product(q.v, c.v) /
                     (SQRT(list_dot_product(q.v, q.v)) *
                      SQRT(list_dot_product(c.v, c.v))), 4) AS cosine
        FROM e q JOIN e c ON c.vec_id != q.vec_id
        WHERE q.vec_id < 10
    ),
    cand0 AS (
        SELECT query_id, neighbor_id, cosine, ROW_NUMBER() OVER (
            PARTITION BY query_id
            ORDER BY cosine DESC, neighbor_id ASC) AS rnk
        FROM pairs
    ),
    cand AS (
        SELECT query_id, neighbor_id,
               CAST(floor(cosine * 1000000 + 0.5) AS BIGINT) AS rm
        FROM cand0 WHERE rnk <= 20
    ),
    vn AS (
        SELECT vec_id,
               list_transform(v, x -> x / sqrt(list_dot_product(v, v)))
                   AS nv
        FROM e
        WHERE v IS NOT NULL AND len(list_filter(v, x -> x IS NULL)) = 0
          AND sqrt(list_dot_product(v, v)) > 0
    ),
    gr AS (
        SELECT query_id,
               list(struct_pack(n := neighbor_id, rm := rm, v := nv)
                    ORDER BY neighbor_id) AS cands
        FROM cand JOIN vn ON neighbor_id = vec_id
        GROUP BY query_id
    ),
    mst(query_id, step, rem, sel, outl) AS (
        SELECT query_id, 0, cands, []::DOUBLE[][],
               []::STRUCT(n BIGINT, u BIGINT)[]
        FROM gr
        UNION ALL
        SELECT query_id, step + 1,
               list_filter(rem, x -> x.n != best.n),
               list_append(sel, best.v),
               list_append(outl, {'n': best.n, 'u': best.u})
        FROM mst, LATERAL (
            SELECT t.c.n AS n, t.c.v AS v,
                   700000 * t.c.rm - 300000 * coalesce(
                       list_aggregate(list_transform(sel, s ->
                           CAST(floor(list_dot_product(t.c.v, s)
                                      * 1000000 + 0.5) AS BIGINT)),
                           'max'), 0) AS u
            FROM (SELECT unnest(rem) AS c) t
            ORDER BY u DESC, n ASC LIMIT 1
        ) best
        WHERE step < 5 AND len(rem) > 0
    ),
    fin AS (
        SELECT query_id, outl FROM (
            SELECT query_id, outl, ROW_NUMBER() OVER (
                PARTITION BY query_id ORDER BY step DESC) AS rn
            FROM mst) WHERE rn = 1
    )
    SELECT query_id, o.s.n AS neighbor_id, o.s.u AS mmr_units,
           CAST(o.i AS INT) AS rank
    FROM fin, LATERAL (SELECT unnest(outl) AS s,
                              generate_subscripts(outl, 1) AS i) o
    """


RPROJ_DIMS = 16
RPROJ_SEED = 11


def q_knn_rproj(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-projection (Johnson–Lindenstrauss) kNN (new in round 11):
    vectors project through a seeded 16x64 orthonormal matrix
    (similarity.jl_projection — a driver-side constant like the LSH
    hyperplanes) via project_vectors' scan-side affine kernel, then
    brute-force cosine top-5 in the reduced space. The seeded matrix
    is the exactly-replayable half of the dim-reduction rung; the
    data-adaptive half is pca_train (recall-property-gated, like
    parametric OPQ), which produces the same (pos, row, bias) shape
    project_vectors consumes — so THIS oracle verifies the projection
    machinery both paths share."""
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    mat = similarity.jl_projection(64, RPROJ_DIMS, seed=RPROJ_SEED)
    proj = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(mat)],
        "pos int, row array<double>",
    )
    p = similarity.project_vectors(
        emb, vec_col="embedding", projection=proj
    )
    return similarity.cosine_topk(
        p.where(F.col("vec_id") < 20), p,
        query_id="vec_id", corpus_id="vec_id", k=5, round_to=4,
        broadcast_queries=True,
    ).select("query_id", "neighbor_id", "cosine", "rank")


def _oracle_knn_rproj_sql(
    k: int = 5, dim: int = 64, dims: int = RPROJ_DIMS,
    seed: int = RPROJ_SEED,
) -> str:
    mat = "[" + ",".join(
        "[" + ",".join(repr(float(x)) for x in row) + "]"
        for row in similarity.jl_projection(dim, dims, seed)
    ) + "]"
    return f"""
    WITH e0 AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), t AS (
        SELECT vec_id,
               CASE WHEN v IS NOT NULL AND len(v) = {dim}
                     AND len(list_filter(v, x -> x IS NULL)) = 0
                    THEN list_transform({mat}, r -> list_dot_product(r, v))
               END AS v
        FROM e0
    ), pairs AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROUND(
                   list_dot_product(q.v, c.v) /
                   (SQRT(list_dot_product(q.v, q.v)) *
                    SQRT(list_dot_product(c.v, c.v))), 4
               ) AS cosine
        FROM t q JOIN t c ON c.vec_id != q.vec_id
        WHERE q.vec_id < 20
    ), ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC
        ) AS rank
        FROM pairs
    )
    SELECT query_id, neighbor_id, cosine, rank
    FROM ranked WHERE rank <= {k}
    """


def q_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of two retrievers (new in round 11,
    fusion.rrf_fuse): full-dim exact cosine top-10 and MRL-truncated
    (16-dim prefix) cosine top-10, fused by Cormack et al. 2009's
    ``sum 1/(60 + rank)`` with integer-micros quantization — the fused
    score is an integer SUM, so the oracle replays it bit-for-bit with
    no float-summation-order hazard. The standard hybrid-retrieval
    combiner for this package's dense/compressed/lexical rankers."""
    from timefence_spark.operators import fusion

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    queries = (
        _t(spark, sf_dir, "embeddings", spread=False)
        .where(F.col("vec_id") < 20)
        .select("vec_id", "embedding")
    )
    dense = similarity.cosine_topk(
        queries, emb, query_id="vec_id", corpus_id="vec_id", k=10,
        round_to=4, broadcast_queries=True,
    )
    tr = similarity.truncate_embeddings(
        emb, vec_col="embedding", dims=16, renormalize=False
    )
    mrl = similarity.cosine_topk(
        tr.where(F.col("vec_id") < 20), tr,
        query_id="vec_id", corpus_id="vec_id", k=10, round_to=4,
        broadcast_queries=True,
    )
    return fusion.rrf_fuse([dense, mrl], k=60, top_k=5)


ORACLE_HYBRID_RRF = """
    WITH pairs AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROUND(
                   list_dot_product(q.embedding, c.embedding) /
                   (SQRT(list_dot_product(q.embedding, q.embedding)) *
                    SQRT(list_dot_product(c.embedding, c.embedding))), 4
               ) AS cosine
        FROM embeddings q JOIN embeddings c ON c.vec_id != q.vec_id
        WHERE q.vec_id < 20
    ), dense AS (
        SELECT query_id, neighbor_id, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC
        ) AS rank FROM pairs
    ), t AS (
        SELECT vec_id, (embedding::DOUBLE[])[1:16] AS v FROM embeddings
    ), tpairs AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROUND(
                   list_dot_product(q.v, c.v) /
                   (SQRT(list_dot_product(q.v, q.v)) *
                    SQRT(list_dot_product(c.v, c.v))), 4
               ) AS cosine
        FROM t q JOIN t c ON c.vec_id != q.vec_id
        WHERE q.vec_id < 20
    ), mrl AS (
        SELECT query_id, neighbor_id, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC
        ) AS rank FROM tpairs
    ), terms AS (
        SELECT query_id, neighbor_id,
               CAST(floor(1000000000.0 * 1.0 / (60 + rank) + 0.5)
                    AS BIGINT) AS t
        FROM dense WHERE rank <= 10
        UNION ALL
        SELECT query_id, neighbor_id,
               CAST(floor(1000000000.0 * 1.0 / (60 + rank) + 0.5)
                    AS BIGINT) AS t
        FROM mrl WHERE rank <= 10
    ), fused AS (
        SELECT query_id, neighbor_id, SUM(t)::BIGINT AS rrf_micros,
               COUNT(*)::BIGINT AS n_retrievers
        FROM terms GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id, rrf_micros, n_retrievers,
           CAST(rank AS INT) AS rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id
            ORDER BY rrf_micros DESC, neighbor_id ASC) AS rank
        FROM fused)
    WHERE rank <= 5
"""


def q_code_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-vs-prose routing signals: indentation structure, {};()=
    density (length-difference counting — no regex), identifier-token
    keyword hits, combined score. Fully replayed by the oracle."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return text.code_signals(docs, id_col="doc_id", text_col="text")


def _oracle_code_signals_sql() -> str:
    from timefence_spark.operators.text import CODE_KEYWORDS

    kw = "[" + ",".join(f"'{k}'" for k in CODE_KEYWORDS) + "]"
    punct = "0"
    for ch in "{};()=":
        lit = f"'{ch}'"
        punct += f" + (LENGTH(t) - LENGTH(replace(t, {lit}, '')))"
    return f"""
    WITH s AS (
        SELECT doc_id,
               text IS NOT NULL AS ok,
               COALESCE(text, '') AS t,
               list_filter(string_split(COALESCE(text, ''), chr(10)),
                           l -> trim(l) != '') AS lines
        FROM documents
    ), m AS (
        SELECT doc_id, ok, len(lines) AS n_lines,
               CASE WHEN len(lines) > 0 THEN
                   CAST(len(list_filter(lines, l ->
                       starts_with(l, chr(9)) OR starts_with(l, '    ')))
                        AS DOUBLE) / len(lines)
               ELSE 0.0 END AS ind,
               CASE WHEN len(lines) > 0 THEN
                   CAST({punct} AS DOUBLE) / len(lines)
               ELSE 0.0 END AS pd,
               len(list_intersect(
                   list_distinct(list_filter(
                       string_split_regex(lower(t), '[^a-z0-9_]+'),
                       x -> x != '')), {kw})) AS kw
        FROM s
    )
    SELECT doc_id,
           CASE WHEN ok THEN n_lines END AS n_lines,
           CASE WHEN ok THEN ROUND(ind, 6) END AS indent_frac,
           CASE WHEN ok THEN ROUND(pd, 6) END AS punct_density,
           CASE WHEN ok THEN kw END AS kw_hits,
           CASE WHEN ok THEN
               ROUND((ind + LEAST(pd / 4.0, 1.0)
                      + LEAST(kw / 5.0, 1.0)) / 3.0, 6) END AS code_score,
           CASE WHEN ok THEN
               ROUND((ind + LEAST(pd / 4.0, 1.0)
                      + LEAST(kw / 5.0, 1.0)) / 3.0, 6) >= 0.45
           END AS is_code
    FROM m
    """


def q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row corpus health summary (docs/empties/chars/tokens/exact
    percentiles) — the before/after log line of every cleaning stage.
    Exact percentile parity: Spark F.percentile == DuckDB
    quantile_cont."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return text.corpus_stats(docs, id_col="doc_id", text_col="text")


ORACLE_CORPUS_STATS = r"""
    WITH s AS (
        SELECT doc_id,
               text IS NULL AS tnull,
               COALESCE(LENGTH(text), 0) AS chars,
               CASE WHEN text IS NULL THEN 0
                    ELSE len(list_filter(
                        string_split_regex(lower(text), '\s+'),
                        t -> t != ''))
               END AS ntok
        FROM documents
    )
    SELECT COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN tnull OR ntok = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_empty,
           CAST(SUM(chars) AS BIGINT) AS n_chars,
           CAST(SUM(ntok) AS BIGINT) AS n_tokens,
           ROUND(AVG(ntok), 6) AS mean_tokens,
           ROUND(quantile_cont(ntok, 0.5), 6) AS p50_tokens,
           ROUND(quantile_cont(ntok, 0.9), 6) AS p90_tokens
    FROM s
"""


HASH_EMBED_DIMS = 16


def q_hash_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hashing-trick text embeddings (new in round 12):
    signed feature hashing (Weinberger et al. 2009) — every word maps
    to one of 16 buckets by the portable content hash, contributes
    +/-1 by an independent sign hash, counts accumulate, L2 normalize.
    The dependency-free embedder that closes the text -> embedding ->
    ANN/semantic-dedup loop inside the engine (text.hash_embed); the
    oracle rebuilds every vector bit-for-bit from the same md5-derived
    buckets/signs. Emitted exploded as (doc_id, dim_idx, val)."""
    docs = _t(spark, sf_dir, "documents", spread=False)
    emb = text.hash_embed(
        docs, id_col="doc_id", text_col="text", dims=HASH_EMBED_DIMS,
        hash_fn="md5",
    )
    return emb.select(
        "doc_id", F.posexplode("embedding").alias("dim_idx", "val")
    )


# Shared CTE prefix: documents -> per-doc dense signed-hash vector +
# its L2 norm (the hash_embed pipeline) — consumed by the hash_embed
# oracle (exploded dims) and the classifier_hashed oracle (dot+sigmoid).
_HASH_EMBED_CTE = rf"""
    WITH t AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\s+'),
                           x -> x <> '') AS toks
        FROM documents
    ), g AS (
        SELECT doc_id, unnest(toks) AS gram
        FROM t WHERE len(toks) >= 1
    ), hb AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5('b:' || gram), 1, 15)) AS BIGINT)
                   % 2147483647 % {HASH_EMBED_DIMS} AS b,
               CASE WHEN CAST(('0x' || substr(md5('s:' || gram), 1, 15))
                              AS BIGINT) % 2147483647 % 2 = 0
                    THEN 1.0 ELSE -1.0 END AS s
        FROM g
    ), pb AS (
        SELECT doc_id, b, SUM(s) AS w FROM hb GROUP BY 1, 2
    ), es AS (
        SELECT doc_id, list(struct_pack(b := b, w := w)) AS entries
        FROM pb GROUP BY 1
    ), dense AS (
        SELECT doc_id,
               list_transform(range(0, {HASH_EMBED_DIMS}), i ->
                   coalesce(list_reduce(
                       list_transform(entries, e ->
                           CASE WHEN e.b = i THEN e.w ELSE 0.0 END),
                       (a, b) -> a + b), 0.0)) AS v
        FROM es
    ), normed AS (
        SELECT doc_id, v,
               sqrt(list_reduce(list_transform(v, x -> x * x),
                                (a, b) -> a + b)) AS n
        FROM dense
    )"""

ORACLE_HASH_EMBED = rf"""{_HASH_EMBED_CTE}
    SELECT doc_id,
           CAST(i AS INT) AS dim_idx,
           ROUND(CASE WHEN n = 0 THEN v[CAST(i AS INT) + 1]
                      ELSE v[CAST(i AS INT) + 1] / n END, 6) AS val
    FROM normed, unnest(range(0, {HASH_EMBED_DIMS})) AS u(i)
"""

# Fixed seeded weight vector shared by the Spark query and the SQL
# replay (Knuth multiplicative-hash spread over [-1, 1] at 6 dp): the
# scoring oracle's model is a LITERAL, like classifier_score's — the
# trainer itself is pytest-gated (deterministic quantized GD; see
# tests/test_text.py).
CLASSIFIER_HASHED_WEIGHTS = [
    round((((j * 2654435761) % 2000001) - 1000000) / 1e6, 6)
    for j in range(HASH_EMBED_DIMS)
]
CLASSIFIER_HASHED_BIAS = -0.125


def q_classifier_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear classifier over HASHED features (new in round 13, VERDICT
    r12 item 6): score = sigmoid(bias + w · hash_embed(text)) — the
    scoring half of the DCLM/fineweb-edu-style learned quality filter
    (text.hashed_classifier_score). The weight vector here is a fixed
    seeded literal so both engines score the identical model; the
    logistic-regression trainer (text.fit_classifier_hashed —
    deterministic micro-quantized gradient descent) is covered by the
    pytest AUC property against the Naive-Bayes baseline."""
    docs = _t(spark, sf_dir, "documents", spread=False)
    return text.hashed_classifier_score(
        docs, id_col="doc_id", text_col="text",
        weights=CLASSIFIER_HASHED_WEIGHTS, bias=CLASSIFIER_HASHED_BIAS,
        hash_fn="md5",
    )


def _oracle_classifier_hashed_sql() -> str:
    """The hash_embed CTE chain + a left-to-right dot-product fold over
    the literal weight list + sigmoid, rounded to 6 — the exact
    expression order hashed_classifier_score's zip_with/aggregate
    evaluates (both folds start at 0 and add products in index
    order)."""
    w = "[" + ", ".join(repr(x) for x in CLASSIFIER_HASHED_WEIGHTS) + "]"
    d = HASH_EMBED_DIMS
    return rf"""{_HASH_EMBED_CTE}, vec AS (
        SELECT doc_id,
               list_transform(range(0, {d}), i ->
                   ROUND(CASE WHEN n = 0 THEN v[CAST(i AS INT) + 1]
                              ELSE v[CAST(i AS INT) + 1] / n END, 6))
                   AS e
        FROM normed
    )
    SELECT doc_id,
           ROUND(1.0 / (1.0 + exp(-({CLASSIFIER_HASHED_BIAS!r}
               + coalesce(list_reduce(
                   list_transform(range(0, {d}), i ->
                       e[CAST(i AS INT) + 1] * {w}[CAST(i AS INT) + 1]),
                   (a, b) -> a + b), 0.0)))), 6) AS clf_score
    FROM vec
"""


def q_gram_duplication(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document cross-corpus n-gram duplication rate (Lee et al.
    2022 memorization-risk signal): fraction of each doc's 5-grams that
    appear in >= 2 documents. Oracle replays grams -> doc-frequency ->
    occurrence-weighted fraction."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return text.gram_duplication(
        docs, id_col="doc_id", text_col="text", n=5, min_docs=2,
    )


ORACLE_GRAM_DUPLICATION = r"""
    WITH d AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\s+'),
                           t -> t != '') AS toks
        FROM documents
    ), g AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(toks) - 3),
                   i -> array_to_string(toks[i:i+4], ' '))) AS ngram
        FROM d WHERE len(toks) >= 5
    ), per_doc AS (
        SELECT doc_id, ngram, count(*) AS n FROM g GROUP BY 1, 2
    ), gdocs AS (
        SELECT ngram, count(*) AS n_docs FROM per_doc GROUP BY 1
    )
    SELECT p.doc_id, CAST(SUM(p.n) AS BIGINT) AS n_grams,
           ROUND(CAST(SUM(CASE WHEN gd.n_docs >= 2 THEN p.n ELSE 0 END)
                      AS DOUBLE) / SUM(p.n), 6) AS dup_frac
    FROM per_doc p JOIN gdocs gd USING (ngram)
    GROUP BY p.doc_id
"""


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard similarity join (inverted index) — verified
    against a brute-force O(n^2) DuckDB join."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return dedup.ngram_jaccard_pairs(
        docs, id_col="doc_id", text_col="text", n=3, threshold=0.2,
        max_doc_freq=100_000,
    )


ORACLE_NGRAM_JACCARD = r"""
    WITH g AS (
        SELECT doc_id,
               list_distinct([
                   array_to_string(toks[i:i+2], ' ')
                   FOR i IN range(1, GREATEST(len(toks) - 2, 1) + 1)
               ]) AS grams
        FROM (SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
              FROM documents)
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           ROUND(
               len(list_intersect(a.grams, b.grams))::DOUBLE /
               (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))),
               6
           ) AS jaccard
    FROM g a JOIN g b ON a.doc_id < b.doc_id
    WHERE len(list_intersect(a.grams, b.grams))::DOUBLE /
          (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))) >= 0.2
"""


def q_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish sub-word token estimate per document (LLM token budgeting)."""
    docs = _t(spark, sf_dir, "documents")
    return text.token_count_bpe(docs, id_col="doc_id", text_col="text")


ORACLE_TOKEN_BPE = r"""
    WITH t AS (
        SELECT doc_id, lower(text) AS lt FROM documents
    )
    SELECT doc_id,
           len(string_split_regex(lt, '\s+')) AS n_tokens_ws,
           len(regexp_extract_all(lt,
               '''(?:s|t|re|ve|m|ll|d)|[a-z]+|[0-9]{1,3}|[^\sa-z0-9]')) AS n_tokens_bpe,
           ROUND(len(regexp_extract_all(lt,
               '''(?:s|t|re|ve|m|ll|d)|[a-z]+|[0-9]{1,3}|[^\sa-z0-9]'))::DOUBLE /
               len(string_split_regex(lt, '\s+')), 6) AS bpe_per_ws
    FROM t
"""


def q_token_count_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT token counts under the vendored deterministic BPE
    (operators/bpe.py, 105 merges trained from a fixed corpus): the
    real-tokenizer injection point (text.token_count_exact, Arrow-batched
    mapInPandas) exercised end-to-end instead of only the regex proxy.
    The oracle replays the SAME greedy merge loop as a recursive CTE
    over the same merge table — both engines compute BPE independently,
    from characters up."""
    from timefence_spark.operators import bpe

    docs = _t(spark, sf_dir, "documents", spread=False)
    return text.token_count_exact(
        docs, id_col="doc_id", text_col="text", tokenizer_fn=bpe.token_count
    )


def _oracle_token_count_exact_sql() -> str:
    from timefence_spark.operators import bpe

    keys = ", ".join(
        "'" + (a + " " + b).replace("'", "''") + "'"
        for a, b in bpe.VENDORED_MERGES
    )
    vals = ", ".join(str(i) for i in range(len(bpe.VENDORED_MERGES)))
    merge_map = f"MAP([{keys}], [{vals}])"
    big = bpe.MAX_RANK_SENTINEL
    # rank of each adjacent token pair under the merge table (sentinel =
    # not mergeable); list_min picks the best rank, list_position its
    # leftmost occurrence — exactly bpe.encode's iteration.
    rs = (
        f"list_transform(range(1, len(toks)), i -> "
        f"coalesce(list_extract(map_extract({merge_map}, "
        f"toks[i] || ' ' || toks[i+1]), 1), {big}))"
    )
    return rf"""
    WITH RECURSIVE
    words AS (
        SELECT DISTINCT w AS word FROM (
            SELECT unnest(string_split_regex(coalesce(text,''), '\s+')) AS w
            FROM documents) WHERE len(w) > 0
    ),
    enc AS (
        SELECT word, string_split(word, '') AS toks FROM words
        UNION ALL
        SELECT word,
               list_slice(toks, 1, j - 1)
                 || [toks[j] || toks[j + 1]]
                 || list_slice(toks, j + 2, len(toks)) AS toks
        FROM (
            SELECT word, toks, list_min(rs) AS best,
                   list_position(rs, list_min(rs)) AS j
            FROM (SELECT word, toks, {rs} AS rs FROM enc WHERE len(toks) > 1)
        ) WHERE best < {big}
    ),
    term AS (
        SELECT word, len(toks) AS n_tok
        FROM (SELECT word, toks,
                     CASE WHEN len(toks) > 1 THEN list_min({rs})
                          ELSE {big} END AS best
              FROM enc)
        WHERE best = {big}
    ),
    doc_words AS (
        SELECT doc_id, w AS word, count(*) AS c FROM (
            SELECT doc_id,
                   unnest(string_split_regex(coalesce(text,''), '\s+')) AS w
            FROM documents) WHERE len(w) > 0 GROUP BY 1, 2
    )
    SELECT d.doc_id, CAST(coalesce(sum(dw.c * t.n_tok), 0) AS BIGINT) AS n_tokens
    FROM documents d
    LEFT JOIN doc_words dw USING (doc_id)
    LEFT JOIN term t USING (word)
    GROUP BY d.doc_id
    """


TRAIN_BPE_MERGES = 50


def q_train_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTRIBUTED BPE training (new in round 9, VERDICT r8 item 5): the
    Sennrich et al. 2016 merge loop as Spark aggregations — per
    iteration one pair-count shuffle over the word-TYPE table + one
    bounded (single-row) best-pair collect + a pure-JVM fold applying
    the merge; see operators/bpe.train_bpe_spark. Returns the learned
    merge table (merge_rank, lhs, rhs), which token_count_exact consumes
    via bpe.make_token_counter. The oracle replays the whole training
    loop as ONE recursive CTE: LATERAL pair-count + arg-best over the
    carried vocabulary list, list_reduce for the merge fold — verified
    merge-for-merge identical to the Python reference trainer."""
    from timefence_spark.operators import bpe

    docs = _t(spark, sf_dir, "documents", spread=False)
    merges = bpe.train_bpe_spark(
        docs, text_col="text", n_merges=TRAIN_BPE_MERGES
    )
    return spark.createDataFrame(
        [(i, l, r) for i, (l, r) in enumerate(merges)],
        "merge_rank int, lhs string, rhs string",
    )


ORACLE_TRAIN_BPE = rf"""
    WITH RECURSIVE
    words AS (
        SELECT w, COUNT(*)::BIGINT AS freq
        FROM (SELECT unnest(string_split_regex(text, '\s+')) AS w
              FROM documents)
        WHERE w <> ''
        GROUP BY w
    ),
    init AS (
        SELECT list({{'syms': string_split_regex(w, ''), 'freq': freq}})
               AS vocab
        FROM words
    ),
    state(iter, vocab, merges) AS (
        SELECT 0, vocab, []::STRUCT(l VARCHAR, r VARCHAR)[] FROM init
        UNION ALL
        SELECT iter + 1,
               list_transform(vocab, w -> {{'syms': list_reduce(
                       list_transform(w.syms, s -> [s]),
                       (acc, x) -> CASE WHEN len(acc) > 0
                                         AND acc[-1] = best.l
                                         AND x[1] = best.r
                                   THEN list_append(
                                       list_slice(acc, 1, len(acc) - 1),
                                       best.l || best.r)
                                   ELSE list_append(acc, x[1]) END),
                   'freq': w.freq}}),
               list_append(merges, {{'l': best.l, 'r': best.r}})
        FROM state, LATERAL (
            SELECT p.l, p.r, p.cnt FROM (
                SELECT u.w.syms[j] AS l, u.w.syms[j + 1] AS r,
                       SUM(u.w.freq) AS cnt
                FROM (SELECT unnest(vocab) AS w) u,
                     LATERAL (SELECT unnest(range(1, len(u.w.syms))) AS j)
                GROUP BY 1, 2
            ) p
            ORDER BY cnt DESC, l, r LIMIT 1
        ) best
        WHERE iter < {TRAIN_BPE_MERGES} AND best.cnt >= 2
    )
    SELECT i - 1 AS merge_rank, m.l AS lhs, m.r AS rhs
    FROM (SELECT merges FROM state ORDER BY iter DESC LIMIT 1),
         LATERAL (SELECT unnest(merges) AS m,
                         generate_subscripts(merges, 1) AS i)
    """


def q_train_bpe_byte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BYTE-LEVEL BPE training (new in round 12, VERDICT r11 item 4):
    GPT-2-style pretokenization — word types render through the
    byte-to-unicode table (bpe.byte_render / bpe._byte_render_words,
    one hex + constant-string-lookup projection over the type table)
    before the SAME merge loop as train_bpe, so merges form over bytes
    (full coverage, no OOV characters; multi-byte characters assemble
    from their UTF-8 bytes). The oracle replays the rendering with the
    identical construction — substr(table_literal, byte + 1, 1) per hex
    pair — feeding the unchanged recursive-CTE trainer."""
    from timefence_spark.operators import bpe

    docs = _t(spark, sf_dir, "documents", spread=False)
    merges = bpe.train_bpe_spark(
        docs, text_col="text", n_merges=TRAIN_BPE_MERGES,
        pretokenize="byte",
    )
    return spark.createDataFrame(
        [(i, l, r) for i, (l, r) in enumerate(merges)],
        "merge_rank int, lhs string, rhs string",
    )


def _oracle_train_bpe_byte_sql() -> str:
    """ORACLE_TRAIN_BPE with its words CTE swapped for a byte-rendered
    one: raw word types -> hex of UTF-8 bytes -> each hex pair indexes
    the 256-char byte-to-unicode table literal (rendering is injective,
    so mapping AFTER the GROUP BY preserves frequencies — exactly what
    train_bpe_spark does)."""
    from timefence_spark.operators.bpe import byte_unicode_table

    plain_words = """words AS (
        SELECT w, COUNT(*)::BIGINT AS freq
        FROM (SELECT unnest(string_split_regex(text, '\\s+')) AS w
              FROM documents)
        WHERE w <> ''
        GROUP BY w
    ),"""
    tbl = byte_unicode_table().replace("'", "''")
    byte_words = f"""rawwords AS (
        SELECT w, COUNT(*)::BIGINT AS freq
        FROM (SELECT unnest(string_split_regex(text, '\\s+')) AS w
              FROM documents)
        WHERE w <> ''
        GROUP BY w
    ),
    words AS (
        SELECT array_to_string(list_transform(
                   range(1, length(hex(w)) // 2 + 1),
                   i -> substr('{tbl}',
                               ('0x' || substr(hex(w),
                                               CAST(i * 2 - 1 AS INT),
                                               2))::INT + 1,
                               1)), '') AS w,
               freq
        FROM rawwords
    ),"""
    assert plain_words in ORACLE_TRAIN_BPE, "train_bpe words CTE drifted"
    return ORACLE_TRAIN_BPE.replace(plain_words, byte_words, 1)


def q_train_bpe_gpt2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-2 BPE training (new in round 13, VERDICT r12 item 4): the
    published GPT-2 split regex (contractions, space-prefixed
    letter/digit/punct runs, whitespace-run handling) replaces the
    whitespace split — applied JVM-side via regexp_extract_all (Java
    regex handles the pattern's lookahead natively) — then the byte
    rendering and merge loop run unchanged, so leading spaces become
    the Ġ convention and merges can span them. This is the mode whose
    HF export (ByteLevel pre_tokenizer) round-trips through the
    HuggingFace tokenizers library. See operators/bpe.GPT2_SPLIT_REGEX
    / gpt2_split."""
    from timefence_spark.operators import bpe

    docs = _t(spark, sf_dir, "documents", spread=False)
    merges = bpe.train_bpe_spark(
        docs, text_col="text", n_merges=TRAIN_BPE_MERGES,
        pretokenize="gpt2",
    )
    return spark.createDataFrame(
        [(i, l, r) for i, (l, r) in enumerate(merges)],
        "merge_rank int, lhs string, rhs string",
    )


def _oracle_train_bpe_gpt2_sql() -> str:
    """ORACLE_TRAIN_BPE with the words CTE swapped for GPT-2 regex
    pieces + byte rendering. RE2 (DuckDB's regex engine) has no
    lookahead, so the pattern's `\\s+(?!\\S)` is replayed with a
    SENTINEL construction: a chr(1) marker is first inserted between
    each whitespace run's last character and the following
    non-whitespace (one global regexp_replace), the alternation then
    matches sentinel-prefixed pieces with plain greedy classes, and the
    sentinel is stripped from the extracted pieces — verified
    piece-for-piece identical to Java's lookahead evaluation and the
    Python scanner (tests/test_text.py). Assumes chr(1) does not occur
    in the corpus (it never does in real text)."""
    from timefence_spark.operators.bpe import byte_unicode_table

    plain_words = """words AS (
        SELECT w, COUNT(*)::BIGINT AS freq
        FROM (SELECT unnest(string_split_regex(text, '\\s+')) AS w
              FROM documents)
        WHERE w <> ''
        GROUP BY w
    ),"""
    tbl = byte_unicode_table().replace("'", "''")
    # lookahead-free GPT-2 alternation over the sentinel-marked text
    pat = (
        r"''s|''t|''re|''ve|''m|''ll|''d"
        r"|\x01? ?\p{L}+|\x01? ?\p{N}+|\x01? ?[^\s\x01\p{L}\p{N}]+"
        r"|\x01?\s+"
    )
    gpt2_words = f"""rawwords AS (
        SELECT w, COUNT(*)::BIGINT AS freq
        FROM (SELECT replace(unnest(regexp_extract_all(
                  regexp_replace(text, '(\\s)(\\S)',
                                 chr(1) || '\\1\\2', 'g'),
                  '{pat}')), chr(1), '') AS w
              FROM documents)
        WHERE w <> ''
        GROUP BY w
    ),
    words AS (
        SELECT array_to_string(list_transform(
                   range(1, length(hex(w)) // 2 + 1),
                   i -> substr('{tbl}',
                               ('0x' || substr(hex(w),
                                               CAST(i * 2 - 1 AS INT),
                                               2))::INT + 1,
                               1)), '') AS w,
               freq
        FROM rawwords
    ),"""
    assert plain_words in ORACLE_TRAIN_BPE, "train_bpe words CTE drifted"
    return ORACLE_TRAIN_BPE.replace(plain_words, gpt2_words, 1)


# ---------------------------------------------------------------------------
# Unigram-LM tokenizer (VERDICT r10 item 3) — trainer + encoder entries.
# Fixed hyperparameters shared by the Spark queries and the SQL replay.
# ---------------------------------------------------------------------------
UNIGRAM_VOCAB = 40
UNIGRAM_ML = 4       # max piece length
UNIGRAM_SEED = 200   # seed-vocabulary cut for multi-char candidates
UNIGRAM_UNK = 1_000_000  # micronats below the rarest piece


def q_train_unigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM (SentencePiece-style) tokenizer training (new in
    round 11, VERDICT r10 item 3): Kudo 2018 with hard-EM + count
    pruning over the word-TYPE table — see operators/unigram.py for
    the algorithm and the integer-micronat score contract that makes
    the whole trainer (seed -> EM -> prune -> final recount, Viterbi
    segmentation included) exactly replayable by the DuckDB oracle:
    piece log-probs quantize to BIGINT micronats at the model boundary,
    so every DP decision is an integer comparison on both engines."""
    from timefence_spark.operators import unigram

    docs = _t(spark, sf_dir, "documents", spread=False)
    model = unigram.train_unigram_spark(
        docs, text_col="text", vocab_size=UNIGRAM_VOCAB,
        max_piece_len=UNIGRAM_ML, seed_size=UNIGRAM_SEED, em_iters=1,
    )
    return spark.createDataFrame(
        model, "piece string, cnt long, logp_micro long"
    )


def q_unigram_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents Viterbi-tokenized under the corpus-trained unigram
    model (new in round 11): encode_documents_unigram — ONE broadcast
    model map + a pure-JVM DP fold per word, zero Python in the
    executor path, zero shuffles. Emitted as (doc_id, pos, piece) rows;
    the oracle replays training end-to-end and then segments each
    document's words with the same integer-score DP."""
    from timefence_spark.operators import unigram

    docs = _t(spark, sf_dir, "documents", spread=False)
    model = unigram.train_unigram_spark(
        docs, text_col="text", vocab_size=UNIGRAM_VOCAB,
        max_piece_len=UNIGRAM_ML, seed_size=UNIGRAM_SEED, em_iters=1,
    )
    enc = unigram.encode_documents_unigram(
        docs.where(F.col("doc_id") < 30), model,
        id_col="doc_id", text_col="text", output="pieces",
    )
    return enc.select(
        "doc_id", F.posexplode("tokens").alias("pos", "piece")
    )


def _unigram_vit_ctes(n: int, words_src: str, mrow: str) -> str:
    """CTE block: Viterbi-segment every (w, freq) row of ``words_src``
    under the one-row model ``mrow`` (map m + unk) — the SQL mirror of
    unigram.viterbi_segment / _viterbi_pieces_sql. vit{n} advances all
    words' DP tables in lockstep (one recursion step per character
    position; best candidate = list_sort of (score, piece_len) structs,
    exactly Spark's array_max tie-break); rec{n} walks the
    back-pointers; seg{n}/ucounts{n} yield segmentations and
    freq-weighted piece counts."""
    return rf"""
    vit{n}(w, freq, m, unk, i, f) AS (
        SELECT w, freq, m, unk, 0,
               [{{'s': CAST(0 AS BIGINT), 'b': 1}}]
        FROM {words_src}, {mrow}
        UNION ALL
        SELECT w, freq, m, unk, i + 1,
               list_append(f, list_sort(list_filter(
                   list_transform(range(1, least({UNIGRAM_ML}, i + 1) + 1),
                       L -> {{'s': f[i - L + 2].s + coalesce(
                                 list_extract(map_extract(m,
                                     substr(w, i - L + 2, L::INT)), 1),
                                 CASE WHEN L = 1 THEN unk ELSE NULL END),
                             'b': L}}),
                   x -> x.s IS NOT NULL))[-1])
        FROM vit{n} WHERE i < len(w)
    ),
    rec{n}(w, freq, f, pos, parts) AS (
        SELECT w, freq, f, len(w), []::VARCHAR[]
        FROM vit{n} WHERE i = len(w)
        UNION ALL
        SELECT w, freq, f, pos - f[pos + 1].b,
               list_prepend(substr(w, pos - f[pos + 1].b + 1,
                                   f[pos + 1].b::INT), parts)
        FROM rec{n} WHERE pos > 0
    ),
    seg{n} AS (SELECT w, freq, parts FROM rec{n} WHERE pos = 0),
    ucounts{n} AS (
        SELECT piece, SUM(freq)::BIGINT AS cnt
        FROM (SELECT unnest(parts) AS piece, freq FROM seg{n})
        GROUP BY 1
    )"""


def _unigram_train_ctes() -> str:
    """The full trainer replay as a WITH-clause body (needs WITH
    RECURSIVE): word counts -> substring seed -> model0 -> EM round
    (vit0) -> char-floored recount -> prune to UNIGRAM_VOCAB -> model1
    -> final recount (vit1) -> uout(piece, cnt, logp_micro). Mirrors
    unigram._train_from_seed with em_iters=1 step for step."""
    micro = (
        "CAST(floor(ln(cnt::DOUBLE / total::DOUBLE) * 1000000 + 0.5) "
        "AS BIGINT)"
    )
    return rf"""
    uwords AS (
        SELECT w, COUNT(*)::BIGINT AS freq
        FROM (SELECT unnest(string_split_regex(coalesce(text, ''),
                     '\s+')) AS w FROM documents)
        WHERE w <> '' GROUP BY w
    ),
    ucand AS (
        SELECT piece, SUM(freq)::BIGINT AS cnt FROM (
            SELECT substr(w, i::INT, L::INT) AS piece, freq
            FROM uwords,
                 LATERAL (SELECT unnest(range(1, len(w) + 1)) AS i),
                 LATERAL (SELECT unnest(range(1,
                     least({UNIGRAM_ML}, len(w) - i + 1) + 1)) AS L)
        ) GROUP BY 1
    ),
    uchars AS (SELECT piece, cnt FROM ucand WHERE len(piece) = 1),
    useed AS (
        SELECT piece, cnt FROM uchars
        UNION ALL
        SELECT piece, cnt FROM (
            SELECT piece, cnt FROM ucand
            WHERE len(piece) > 1 AND cnt >= 2
            ORDER BY cnt DESC, piece LIMIT {UNIGRAM_SEED})
    ),
    umodel0 AS (
        SELECT piece, {micro} AS lp
        FROM useed, (SELECT SUM(cnt)::BIGINT AS total FROM useed)
    ),
    umrow0 AS (
        SELECT map_from_entries(list({{'k': piece, 'v': lp}})) AS m,
               MIN(lp) - {UNIGRAM_UNK} AS unk
        FROM umodel0
    ),
    {_unigram_vit_ctes(0, "uwords", "umrow0")},
    uvocab1 AS (
        SELECT piece, cnt FROM ucounts0 WHERE cnt > 0
        UNION ALL
        SELECT c.piece, 1::BIGINT FROM uchars c
        WHERE c.piece NOT IN (SELECT piece FROM ucounts0 WHERE cnt > 0)
    ),
    upruned AS (
        SELECT piece, cnt FROM uvocab1 WHERE len(piece) = 1
        UNION ALL
        SELECT piece, cnt FROM (
            SELECT piece, cnt,
                   row_number() OVER (ORDER BY cnt DESC, piece) AS rk
            FROM uvocab1 WHERE len(piece) > 1)
        WHERE rk <= greatest({UNIGRAM_VOCAB} - (
            SELECT COUNT(*) FROM uvocab1 WHERE len(piece) = 1), 0)
    ),
    umodel1 AS (
        SELECT piece, {micro} AS lp
        FROM upruned, (SELECT SUM(cnt)::BIGINT AS total FROM upruned)
    ),
    umrow1 AS (
        SELECT map_from_entries(list({{'k': piece, 'v': lp}})) AS m,
               MIN(lp) - {UNIGRAM_UNK} AS unk
        FROM umodel1
    ),
    {_unigram_vit_ctes(1, "uwords", "umrow1")},
    ufinal AS (
        SELECT p.piece,
               CASE WHEN len(p.piece) = 1
                    THEN greatest(coalesce(c.cnt, 0), 1)
                    ELSE coalesce(c.cnt, 0) END AS cnt
        FROM upruned p LEFT JOIN ucounts1 c USING (piece)
    ),
    ufin AS (SELECT piece, cnt FROM ufinal WHERE cnt > 0),
    uout AS (
        SELECT piece, cnt, {micro} AS logp_micro
        FROM ufin, (SELECT SUM(cnt)::BIGINT AS total FROM ufin)
    )"""


ORACLE_TRAIN_UNIGRAM = rf"""
    WITH RECURSIVE
    {_unigram_train_ctes()}
    SELECT piece, cnt, logp_micro FROM uout
    """

ORACLE_UNIGRAM_ENCODE = rf"""
    WITH RECURSIVE
    {_unigram_train_ctes()},
    umrow2 AS (
        SELECT map_from_entries(list({{'k': piece, 'v': logp_micro}})) AS m,
               MIN(logp_micro) - {UNIGRAM_UNK} AS unk
        FROM uout
    ),
    udocw AS (
        SELECT doc_id, wi, w FROM (
            SELECT doc_id, unnest(ws) AS w,
                   generate_subscripts(ws, 1) AS wi
            FROM (SELECT doc_id,
                         list_filter(string_split_regex(
                             coalesce(text, ''), '\s+'),
                             x -> x <> '') AS ws
                  FROM documents WHERE doc_id < 30))
    ),
    uencw AS (SELECT DISTINCT w, 1::BIGINT AS freq FROM udocw),
    {_unigram_vit_ctes(2, "uencw", "umrow2")},
    utoks AS (
        SELECT dw.doc_id, dw.wi, s.parts
        FROM udocw dw JOIN seg2 s USING (w)
    )
    SELECT doc_id, CAST(pos - 1 AS INT) AS pos, piece FROM (
        SELECT doc_id,
               row_number() OVER (
                   PARTITION BY doc_id ORDER BY wi, pj) AS pos,
               piece
        FROM (SELECT doc_id, wi, unnest(parts) AS piece,
                     generate_subscripts(parts, 1) AS pj
              FROM utoks))
    """


# ---------------------------------------------------------------------------
# WordPiece tokenizer (round 11) — likelihood-scored merge trainer +
# greedy longest-match encoder entries. Fixed hyperparameters shared by
# the Spark queries and the SQL replay.
# ---------------------------------------------------------------------------
WORDPIECE_MERGES = 12
WORDPIECE_MAXW = 100  # HF max_input_chars_per_word


def q_train_wordpiece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WordPiece training (new in round 11): the BPE word-type-table
    merge loop scored by ``count(l,r) / (count(l) * count(r))`` — the
    likelihood rule of Schuster & Nakajima 2012 as implemented by the
    HuggingFace trainer — with ##-continuation symbols; see
    operators/wordpiece.train_wordpiece_spark. The score is ONE
    IEEE-double expression with count>=2 pre-filtering and (l, r)
    tie-breaks, so the argmax is bit-portable; the oracle replays the
    whole loop as one recursive CTE (pair counts + symbol counts +
    ratio arg-best over the carried vocabulary, list_reduce merge
    fold), verified merge-for-merge."""
    from timefence_spark.operators import wordpiece

    docs = _t(spark, sf_dir, "documents", spread=False)
    merges = wordpiece.train_wordpiece_spark(
        docs, text_col="text", n_merges=WORDPIECE_MERGES
    )
    return spark.createDataFrame(
        [(i, l, r) for i, (l, r) in enumerate(merges)],
        "merge_rank int, lhs string, rhs string",
    )


def q_wordpiece_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents tokenized under the corpus-trained WordPiece vocab
    (new in round 11): greedy longest-match-first with whole-word
    [UNK] — BERT's WordpieceTokenizer — via the default
    per-distinct-word strategy: the pure-JVM fold runs ONCE per word
    TYPE against the one-row broadcast vocab map, pieces join back,
    docs reassemble in word order (zero executor Python;
    operators/wordpiece.encode_documents_wordpiece). The oracle
    replays training end-to-end, rebuilds the vocabulary, and
    greedy-matches every distinct word with a recursive CTE before the
    same word-order reassembly — structurally the SAME
    per-type-then-reassemble shape the operator runs."""
    from timefence_spark.operators import wordpiece

    docs = _t(spark, sf_dir, "documents", spread=False)
    merges = wordpiece.train_wordpiece_spark(
        docs, text_col="text", n_merges=WORDPIECE_MERGES
    )
    alphabet = wordpiece.wordpiece_alphabet_spark(docs, text_col="text")
    vocab = wordpiece.wordpiece_pieces(merges, alphabet)
    enc = wordpiece.encode_documents_wordpiece(
        docs.where(F.col("doc_id") < 30), vocab,
        id_col="doc_id", text_col="text",
        max_word_chars=WORDPIECE_MAXW,
    )
    return enc.select(
        "doc_id", F.posexplode("tokens").alias("pos", "piece")
    )


def _wordpiece_train_ctes() -> str:
    """Trainer replay as a WITH-clause body (needs WITH RECURSIVE):
    word counts -> ##-symbol init -> merge recursion with the
    likelihood arg-best -> wmerges(l, r) in learned order. Mirrors
    wordpiece._train_wordpiece_from_vocab step for step: candidate
    pairs pre-filtered to count >= 2, ORDER BY the one IEEE-double
    score DESC then (l, r), merged token = l || strip_prefix(r, '##')."""
    return rf"""
    wwords AS (
        SELECT w, COUNT(*)::BIGINT AS freq
        FROM (SELECT unnest(string_split_regex(coalesce(text, ''),
                     '\s+')) AS w FROM documents)
        WHERE w <> ''
        GROUP BY w
    ),
    winit AS (
        SELECT list({{'syms': list_transform(range(1, length(w) + 1),
                         i -> CASE WHEN i = 1 THEN substr(w, i::INT, 1)
                                   ELSE '##' || substr(w, i::INT, 1) END),
                     'freq': freq}}) AS vocab
        FROM wwords
    ),
    wstate(iter, vocab, merges) AS (
        SELECT 0, vocab, []::STRUCT(l VARCHAR, r VARCHAR)[] FROM winit
        UNION ALL
        SELECT iter + 1,
               list_transform(vocab, w -> {{'syms': list_reduce(
                       list_transform(w.syms, s -> [s]),
                       (acc, x) -> CASE WHEN len(acc) > 0
                                         AND acc[-1] = best.l
                                         AND x[1] = best.r
                                   THEN list_append(
                                       list_slice(acc, 1, len(acc) - 1),
                                       best.l ||
                                       CASE WHEN starts_with(best.r, '##')
                                            THEN substr(best.r, 3)
                                            ELSE best.r END)
                                   ELSE list_append(acc, x[1]) END),
                   'freq': w.freq}}),
               list_append(merges, {{'l': best.l, 'r': best.r}})
        FROM wstate, LATERAL (
            SELECT p.l, p.r FROM (
                SELECT u.w.syms[j] AS l, u.w.syms[j + 1] AS r,
                       SUM(u.w.freq) AS cnt
                FROM (SELECT unnest(vocab) AS w) u,
                     LATERAL (SELECT unnest(range(1, len(u.w.syms))) AS j)
                GROUP BY 1, 2
            ) p,
            (SELECT s, SUM(freq) AS cnt FROM (
                SELECT unnest(uu.w.syms) AS s, uu.w.freq AS freq
                FROM (SELECT unnest(vocab) AS w) uu) GROUP BY 1) sl,
            (SELECT s, SUM(freq) AS cnt FROM (
                SELECT unnest(uu.w.syms) AS s, uu.w.freq AS freq
                FROM (SELECT unnest(vocab) AS w) uu) GROUP BY 1) sr
            WHERE p.cnt >= 2 AND sl.s = p.l AND sr.s = p.r
            ORDER BY p.cnt::DOUBLE / (sl.cnt::DOUBLE * sr.cnt::DOUBLE)
                     DESC, p.l, p.r
            LIMIT 1
        ) best
        WHERE iter < {WORDPIECE_MERGES}
    ),
    wmerges AS (
        SELECT m.l AS l, m.r AS r, i
        FROM (SELECT merges FROM wstate ORDER BY iter DESC LIMIT 1),
             LATERAL (SELECT unnest(merges) AS m,
                             generate_subscripts(merges, 1) AS i)
    )"""


ORACLE_TRAIN_WORDPIECE = rf"""
    WITH RECURSIVE
    {_wordpiece_train_ctes()}
    SELECT i - 1 AS merge_rank, l AS lhs, r AS rhs FROM wmerges
    """

ORACLE_WORDPIECE_ENCODE = rf"""
    WITH RECURSIVE
    {_wordpiece_train_ctes()},
    walpha AS (
        SELECT DISTINCT CASE WHEN i = 1 THEN substr(w, i::INT, 1)
                             ELSE '##' || substr(w, i::INT, 1) END AS piece
        FROM wwords, LATERAL (SELECT unnest(range(1, length(w) + 1)) AS i)
    ),
    wvocab AS (
        SELECT piece FROM walpha
        UNION
        SELECT l || CASE WHEN starts_with(r, '##') THEN substr(r, 3)
                         ELSE r END
        FROM wmerges
    ),
    wmaxlen AS (SELECT max(length(piece)) AS ml FROM wvocab),
    wdocw AS (
        SELECT doc_id, wx.w AS w, wx.i AS widx
        FROM (SELECT doc_id,
                     list_filter(string_split_regex(coalesce(text, ''),
                                 '\s+'), x -> x <> '') AS ws
              FROM documents WHERE doc_id < 30),
             LATERAL (SELECT unnest(ws) AS w,
                             generate_subscripts(ws, 1) AS i) wx
    ),
    wdist AS (SELECT DISTINCT w FROM wdocw),
    wpe(w, pos, parts, bad) AS (
        SELECT w, 0, []::VARCHAR[], length(w) > {WORDPIECE_MAXW}
        FROM wdist
        UNION ALL
        SELECT w,
               CASE WHEN b.L IS NULL THEN length(w) ELSE pos + b.L END,
               CASE WHEN b.L IS NULL THEN parts
                    ELSE list_append(parts,
                         CASE WHEN pos = 0 THEN substr(w, 1, b.L)
                              ELSE '##' || substr(w, pos + 1, b.L) END)
                    END,
               b.L IS NULL
        FROM wpe, LATERAL (
            SELECT max(L)::INT AS L
            FROM (SELECT unnest(range(1,
                         least((SELECT ml FROM wmaxlen),
                               length(w) - pos) + 1)) AS L) t
            WHERE (CASE WHEN pos = 0 THEN substr(w, 1, L::INT)
                        ELSE '##' || substr(w, pos + 1, L::INT) END)
                  IN (SELECT piece FROM wvocab)
        ) b
        WHERE pos < length(w) AND NOT bad
    ),
    wseg AS (
        SELECT w, CASE WHEN bad THEN ['[UNK]'] ELSE parts END AS parts
        FROM wpe WHERE bad OR pos = length(w)
    ),
    wtoks AS (
        SELECT d.doc_id, d.widx, s.parts
        FROM wdocw d JOIN wseg s USING (w)
    )
    SELECT doc_id, CAST(pos - 1 AS INT) AS pos, piece FROM (
        SELECT doc_id,
               row_number() OVER (
                   PARTITION BY doc_id ORDER BY widx, pj) AS pos,
               piece
        FROM (SELECT doc_id, widx, unnest(parts) AS piece,
                     generate_subscripts(parts, 1) AS pj
              FROM wtoks))
    """


def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents tokenized to integer id sequences under the vendored
    BPE (new in round 9): bpe.encode_documents — one bounded vocab
    collect + one Arrow-batched mapInPandas, no token-level shuffle.
    Ids emitted as a CSV string for cross-engine value hashing. The
    oracle re-derives vocabulary (corpus chars + merge products,
    lexicographic dense ids), re-encodes every word type with the
    recursive-CTE greedy merge loop, and reassembles documents in word
    order."""
    from timefence_spark.operators import bpe

    docs = _t(spark, sf_dir, "documents", spread=False)
    enc = bpe.encode_documents(docs, id_col="doc_id", text_col="text")
    return enc.select(
        "doc_id",
        "n_tokens",
        F.array_join(
            F.transform("token_ids", lambda x: x.cast("string")), ","
        ).alias("ids_csv"),
    )


def _bpe_enc_ctes(
    merge_map: str | None = None,
    products_select: str | None = None,
    enc_src: str = "enc",
) -> str:
    """Shared WITH-clause body: word-type BPE encoding (recursive CTE),
    corpus-derived vocabulary, and per-document token-id lists — the SQL
    mirror of bpe.encode_documents. Yields CTEs: words, enc, term,
    vocab, vmap, doc_ids (doc_id, toks, ids). Defaults encode under the
    VENDORED merges embedded as map/list literals; pass ``merge_map``
    (SQL expr: 'l r' -> 0-based rank map) and ``products_select`` (a
    SELECT yielding one column ``t`` of merge-product strings) to encode
    under a merge table the surrounding query computes — e.g. the
    recursive trainer's own output (bpe_encode_trained)."""
    from timefence_spark.operators import bpe

    if merge_map is None:
        keys = ", ".join(
            "'" + (a + " " + b).replace("'", "''") + "'"
            for a, b in bpe.VENDORED_MERGES
        )
        vals = ", ".join(str(i) for i in range(len(bpe.VENDORED_MERGES)))
        merge_map = f"MAP([{keys}], [{vals}])"
    if products_select is None:
        products = ", ".join(
            "'" + (a + b).replace("'", "''") + "'"
            for a, b in bpe.VENDORED_MERGES
        )
        products_select = f"SELECT DISTINCT unnest([{products}]) AS t"
    big = bpe.MAX_RANK_SENTINEL
    rs = (
        f"list_transform(range(1, len(toks)), i -> "
        f"coalesce(list_extract(map_extract({merge_map}, "
        f"toks[i] || ' ' || toks[i+1]), 1), {big}))"
    )
    return rf"""
    words AS (
        SELECT DISTINCT w AS word FROM (
            SELECT unnest(string_split_regex(coalesce(text,''), '\s+')) AS w
            FROM documents) WHERE len(w) > 0
    ),
    enc AS (
        SELECT word, string_split(word, '') AS toks FROM words
        UNION ALL
        SELECT word,
               list_slice(toks, 1, j - 1)
                 || [toks[j] || toks[j + 1]]
                 || list_slice(toks, j + 2, len(toks)) AS toks
        FROM (
            SELECT word, toks, list_min(rs) AS best,
                   list_position(rs, list_min(rs)) AS j
            FROM (SELECT word, toks, {rs} AS rs FROM {enc_src} WHERE len(toks) > 1)
        ) WHERE best < {big}
    ),
    term AS (
        SELECT word, toks
        FROM (SELECT word, toks,
                     CASE WHEN len(toks) > 1 THEN list_min({rs})
                          ELSE {big} END AS best
              FROM {enc_src})
        WHERE best = {big}
    ),
    vocab AS (
        SELECT t AS token, ROW_NUMBER() OVER (ORDER BY t) - 1 AS tid
        FROM (
            SELECT DISTINCT unnest(string_split_regex(
                regexp_replace(coalesce(text,''), '\s+', '', 'g'), '')) AS t
            FROM documents
            UNION
            {products_select}
        ) WHERE t <> ''
    ),
    vmap AS (
        SELECT map(list(token ORDER BY tid), list(tid ORDER BY tid)) AS mm
        FROM vocab
    ),
    doc_words AS (
        SELECT doc_id, j, w FROM (
            SELECT doc_id,
                   unnest(string_split_regex(coalesce(text,''), '\s+')) AS w,
                   generate_subscripts(
                       string_split_regex(coalesce(text,''), '\s+'), 1) AS j
            FROM documents)
        WHERE len(w) > 0
    ),
    doc_toks AS (
        SELECT d.doc_id, flatten(list(t.toks ORDER BY d.j)) AS toks
        FROM doc_words d JOIN term t ON d.w = t.word
        GROUP BY d.doc_id
    ),
    doc_ids AS (
        SELECT doc.doc_id,
               coalesce(
                   list_transform(dt.toks, t -> map_extract(vmap.mm, t)[1]),
                   []::BIGINT[]) AS ids
        FROM documents doc
        LEFT JOIN doc_toks dt ON doc.doc_id = dt.doc_id, vmap
    )"""


def _oracle_bpe_encode_sql() -> str:
    return f"""
    WITH RECURSIVE{_bpe_enc_ctes()}
    SELECT doc_id,
           CAST(len(ids) AS BIGINT) AS n_tokens,
           array_to_string(ids, ',') AS ids_csv
    FROM doc_ids
    """


def q_bpe_encode_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full corpus-fitted loop in one entry (new in round 9): learn
    the merge table FROM this corpus (train_bpe_spark) and tokenize the
    corpus under it (encode_documents). The oracle replays BOTH halves
    in ONE DuckDB query — the recursive trainer's merge list feeds the
    recursive word encoder's rank map and the vocabulary's product set —
    so training and tokenization are differentially verified end-to-end
    with no Python-side constants."""
    from timefence_spark.operators import bpe

    docs = _t(spark, sf_dir, "documents", spread=False)
    merges = bpe.train_bpe_spark(
        docs, text_col="text", n_merges=TRAIN_BPE_MERGES
    )
    enc = bpe.encode_documents(
        docs, id_col="doc_id", text_col="text", merges=merges
    )
    return enc.select(
        "doc_id",
        "n_tokens",
        F.array_join(
            F.transform("token_ids", lambda x: x.cast("string")), ","
        ).alias("ids_csv"),
    )


def _oracle_bpe_encode_trained_sql() -> str:
    # The trainer's CTE chain, t-prefixed so it can precede the encoder
    # CTEs (which reuse the names words/enc/...) in one WITH RECURSIVE.
    trainer = (
        ORACLE_TRAIN_BPE.strip()
        .removeprefix("WITH RECURSIVE")
        .replace("words AS (", "twords AS (", 1)
        .replace("FROM words", "FROM twords")
        .replace("init AS (", "tinit AS (", 1)
        .replace("FROM init", "FROM tinit")
        .replace("state(iter, vocab, merges) AS (", "tstate(iter, vocab, merges) AS (", 1)
        .replace("FROM state,", "FROM tstate,")
        .replace("FROM state ", "FROM tstate ")
    )
    # Split the trainer's final SELECT off into a tmerges CTE.
    ctes, final_select = trainer.rsplit("SELECT i - 1 AS merge_rank", 1)
    trainer_ctes = (
        ctes.rstrip().rstrip(")")
        + """),
    tmerges AS (
        SELECT i - 1 AS merge_rank""" + final_select + """
    ),
    tmap AS (
        SELECT map(list(lhs || ' ' || rhs ORDER BY merge_rank),
                   list(merge_rank ORDER BY merge_rank)) AS mm
        FROM tmerges
    ),"""
    )
    return f"""
    WITH RECURSIVE
    {trainer_ctes}{_bpe_enc_ctes(
        merge_map="mm",
        products_select="SELECT DISTINCT lhs || rhs AS t FROM tmerges",
        enc_src="enc, tmap",
    )}
    SELECT doc_id,
           CAST(len(ids) AS BIGINT) AS n_tokens,
           array_to_string(ids, ',') AS ids_csv
    FROM doc_ids
    """


_SEQ_LEN = 128
_SEQ_SHARDS = 8


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-length training sequences (new in round 9): documents →
    token ids (encode_documents) → per-shard concatenate-then-cut at
    seq_len=128 with pad_id=0 on each shard's tail
    (packing.pack_sequences). Portable md5 shard hash so the oracle
    replays the exact shard streams; ids emitted as CSV."""
    from timefence_spark.operators import bpe, packing

    docs = _t(spark, sf_dir, "documents", spread=False)
    enc = bpe.encode_documents(docs, id_col="doc_id", text_col="text")
    seqs = packing.pack_sequences(
        enc, id_col="doc_id", ids_col="token_ids", seq_len=_SEQ_LEN,
        num_shards=_SEQ_SHARDS, salt="pack", hash_fn="md5", pad_id=0,
    )
    return seqs.select(
        "shard",
        "seq",
        "n_tokens",
        F.array_join(
            F.transform("input_ids", lambda x: x.cast("string")), ","
        ).alias("ids_csv"),
    )


def _oracle_pack_sequences_sql() -> str:
    h = _duck_md5_hash("doc_id", "pack")
    return f"""
    WITH RECURSIVE{_bpe_enc_ctes()},
    packed AS (
        SELECT shard, ids, endo - len(ids) AS start FROM (
            SELECT ids,
                   CAST(h % {_SEQ_SHARDS} AS INT) AS shard,
                   SUM(len(ids)) OVER (
                       PARTITION BY h % {_SEQ_SHARDS}
                       ORDER BY h ASC, doc_id ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS endo
            FROM (SELECT doc_id, ids, {h} AS h FROM doc_ids))
    ),
    tokens AS (
        SELECT shard, start + j - 1 AS gpos, ids[j] AS tid
        FROM packed, LATERAL (SELECT unnest(range(1, len(ids) + 1)) AS j)
    ),
    seqs AS (
        SELECT shard, gpos // {_SEQ_LEN} AS seq,
               CAST(count(*) AS BIGINT) AS n_tokens,
               list(tid ORDER BY gpos) AS ids
        FROM tokens GROUP BY 1, 2
    )
    SELECT shard, CAST(seq AS BIGINT) AS seq, n_tokens,
           array_to_string(
               ids || list_transform(
                   range(1, {_SEQ_LEN} - len(ids) + 1), x -> 0),
               ',') AS ids_csv
    FROM seqs
    """


def q_knn_sq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-quantized ANN (new in round 9): per-dimension 8-bit affine
    codes (similarity.sq_train/sq_encode — one exact min/max pass, then
    a scan-side projection), brute-force reconstructed-cosine top-k over
    the compressed corpus (sq_topk). The oracle replays bounds, integer
    codes (floor(x+0.5), clamped) and the sequential reconstruction
    folds exactly."""
    emb = _t(spark, sf_dir, "embeddings", spread=False)
    bounds = similarity.sq_train(emb, corpus_id="vec_id")
    enc = similarity.sq_encode(emb, corpus_id="vec_id", bounds=bounds)
    return similarity.sq_topk(
        emb.where(F.col("vec_id") < 20), enc, bounds,
        query_id="vec_id", k=5,
    )


def _oracle_knn_sq_sql(k: int = 5, dim: int = 64, maxc: int = 255) -> str:
    rng = f"range(1, {dim + 1})"
    return f"""
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), ve AS (
        SELECT * FROM e
        WHERE v IS NOT NULL AND len(v) = {dim}
          AND len(list_filter(v, x -> x IS NULL)) = 0
    ), b AS (
        SELECT pos, MIN(x) AS lo, MAX(x) AS hi FROM (
            SELECT unnest(v) AS x, generate_subscripts(v, 1) AS pos FROM ve)
        GROUP BY pos
    ), arr AS (
        SELECT list(lo ORDER BY pos) AS los, list(hi ORDER BY pos) AS his
        FROM b
    ), enc AS (
        SELECT vec_id,
               list_transform({rng}, i ->
                   CASE WHEN his[i] = los[i] THEN 0
                        ELSE GREATEST(0, LEAST({maxc},
                            CAST(FLOOR((v[i] - los[i]) / (his[i] - los[i])
                                       * {maxc} + 0.5) AS INT)))
                   END) AS codes
        FROM ve, arr
    ), rec AS (
        SELECT vec_id,
               list_transform({rng}, i ->
                   los[i] + codes[i]::DOUBLE * ((his[i] - los[i]) / {maxc}))
                   AS rv
        FROM enc, arr
    ), rn AS (
        SELECT vec_id, rv,
               SQRT(list_reduce(list_transform(rv, x -> x * x),
                                (a, b) -> a + b)) AS rnorm
        FROM rec
    ), scored AS (
        SELECT q.vec_id AS query_id, r.vec_id AS neighbor_id,
               ROUND(list_reduce(
                         list_transform({rng}, i -> q.v[i] * r.rv[i]),
                         (a, b) -> a + b)
                     / (SQRT(list_dot_product(q.v, q.v)) * r.rnorm),
                     6) AS cosine
        FROM (SELECT * FROM e WHERE vec_id < 20) q
        JOIN rn r ON r.vec_id != q.vec_id
    ), ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC
        ) AS rank FROM scored
    )
    SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= {k}
    """


def q_knn_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-quantized ANN (new in round 9): 1-bit sign codes against
    per-dimension (min+max)/2 thresholds packed 32-per-BIGINT lane
    (similarity.bq_train/bq_encode), Hamming-distance top-k over the
    packed lanes (bq_topk) — integer-only XOR+popcount scan, the 32x
    rung of the compression ladder (full -> SQ8 -> PQ -> binary). The
    oracle replays thresholds, lane packing and the Hamming fold
    exactly; (min+max)/2 keeps training merge-order-independent so the
    bits can't flip across engines."""
    emb = _t(spark, sf_dir, "embeddings", spread=False)
    thr = similarity.bq_train(emb, corpus_id="vec_id")
    enc = similarity.bq_encode(emb, corpus_id="vec_id", thresholds=thr)
    return similarity.bq_topk(
        emb.where(F.col("vec_id") < 20), enc, thr,
        query_id="vec_id", k=5,
    )


def _oracle_knn_binary_sql(k: int = 5, dim: int = 64) -> str:
    lanes = (dim + 31) // 32
    return f"""
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), ve AS (
        SELECT * FROM e
        WHERE v IS NOT NULL AND len(v) = {dim}
          AND len(list_filter(v, x -> x IS NULL)) = 0
    ), b AS (
        SELECT pos, (MIN(x) + MAX(x)) / 2 AS thr FROM (
            SELECT unnest(v) AS x, generate_subscripts(v, 1) AS pos FROM ve)
        GROUP BY pos
    ), arr AS (
        SELECT list(thr ORDER BY pos) AS thrs FROM b
    ), lanes AS (
        SELECT vec_id,
               list_transform(range(0, {lanes}), j ->
                   list_reduce(
                       list_transform(range(j*32, LEAST(j*32+32, {dim})),
                           i -> (CASE WHEN v[i+1] >= thrs[i+1]
                                      THEN 1::BIGINT ELSE 0::BIGINT END)
                                * (1::BIGINT << (i % 32))),
                       (a, b2) -> a + b2)) AS lanes
        FROM ve, arr
    ), scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               list_reduce(
                   list_transform(range(1, {lanes + 1}), i ->
                       bit_count(xor(q.lanes[i], c.lanes[i]))::BIGINT),
                   (a, b2) -> a + b2)::INT AS hamming
        FROM (SELECT * FROM lanes WHERE vec_id < 20) q
        JOIN lanes c ON c.vec_id != q.vec_id
    ), ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY hamming ASC, neighbor_id ASC
        ) AS rank FROM scored
    )
    SELECT query_id, neighbor_id, hamming, rank FROM ranked WHERE rank <= {k}
    """


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-k document fingerprint sketch (portable md5 hashes), emitted as a
    comma-joined string for scalar value hashing."""
    docs = _t(spark, sf_dir, "documents")
    fp = text.fingerprint(
        docs, id_col="doc_id", text_col="text", shingle_k=5, num_hashes=8,
        hash_fn="md5",
    )
    return fp.select("doc_id", F.concat_ws(",", "fingerprint").alias("fp"))


ORACLE_FINGERPRINT = r"""
    WITH t AS (
        SELECT doc_id, string_split_regex(lower(text), '\s+') AS tk
        FROM documents
    ), g AS (
        SELECT doc_id, list_distinct([
            array_to_string(tk[i:i+4], ' ')
            FOR i IN range(1, GREATEST(len(tk) - 4, 1) + 1)
        ]) AS grams FROM t
    )
    SELECT doc_id,
           array_to_string(
               (list_sort(list_distinct(list_transform(grams, g ->
                   CAST(concat('0x', substr(md5(g), 1, 15)) AS BIGINT)))))[1:8],
               ',') AS fp
    FROM g
"""


# Fixed demo classifier: positive weight on reference-like words,
# negative on spammy ones — shared by the Spark entry and the oracle.
CLF_WEIGHTS = {
    "table": 2.0,
    "query": 1.5,
    "data": 1.0,
    "the": 0.25,
    "slow": -1.5,
    "dup": -2.0,
}
CLF_BIAS = -0.5


def q_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear unigram quality classifier (fasttext-style gate): literal
    weights compiled into one scan-speed projection; sigmoid rounded to
    6 places so libm exp differences can't break the hash compare."""
    docs = _t(spark, sf_dir, "documents", spread=False)
    return text.classifier_score(
        docs, id_col="doc_id", text_col="text",
        weights=CLF_WEIGHTS, bias=CLF_BIAS,
    )


def _oracle_classifier_sql() -> str:
    terms = " + ".join(
        f"{w} * len(list_filter(toks, t -> t = '{word}')) / len(toks)"
        for word, w in CLF_WEIGHTS.items()
    )
    return rf"""
    WITH t AS (
        SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
        FROM documents
    )
    SELECT doc_id,
           CASE WHEN toks IS NULL THEN 0 ELSE len(toks) END AS n_tokens,
           CASE WHEN toks IS NULL OR len(toks) = 0
                THEN ROUND(1.0 / (1.0 + exp(-(CAST({CLF_BIAS} AS DOUBLE)))), 6)
                ELSE ROUND(1.0 / (1.0 + exp(-({CLF_BIAS} + {terms}))), 6)
           END AS clf_score
    FROM t
    """


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return text.quality_score(docs, id_col="doc_id", text_col="text")


ORACLE_QUALITY = r"""
    WITH t AS (
        SELECT doc_id, text,
               string_split_regex(lower(text), '\s+') AS toks,
               LENGTH(text) AS n_chars
        FROM documents
    ), m AS (
        SELECT doc_id, text, toks, n_chars,
               LEN(toks) AS n_tokens,
               LEN(list_distinct(toks)) AS n_types,
               n_chars - LENGTH(regexp_replace(text, '[!-/:-@\[-`{-~]', '', 'g')) AS punct,
               n_chars - LENGTH(regexp_replace(text, '[0-9]', '', 'g')) AS digits,
               n_chars - LENGTH(regexp_replace(text, '[A-Z]', '', 'g')) AS uppers,
               LEN(list_filter(toks, x -> list_contains(
                   ['the','and','of','to','in','is','that','it','for','with',
                    'a','an','on','at','by','as','be','are'], x))) AS n_stop
        FROM t
    )
    SELECT doc_id, n_chars, n_tokens,
           ROUND(punct::DOUBLE / n_chars, 6) AS punct_ratio,
           ROUND(digits::DOUBLE / n_chars, 6) AS digit_ratio,
           ROUND(uppers::DOUBLE / n_chars, 6) AS upper_ratio,
           ROUND(n_stop::DOUBLE / n_tokens, 6) AS stopword_ratio,
           ROUND(1.0 - n_types::DOUBLE / n_tokens, 6) AS repetition,
           ROUND(
               (CASE WHEN n_chars >= 50 AND n_chars <= 100000 THEN 0.25 ELSE 0.0 END) +
               (CASE WHEN ROUND(punct::DOUBLE / n_chars, 6) <= 0.2 THEN 0.25 ELSE 0.0 END) +
               (CASE WHEN ROUND(1.0 - n_types::DOUBLE / n_tokens, 6) <= 0.5 THEN 0.25 ELSE 0.0 END) +
               (CASE WHEN ROUND(digits::DOUBLE / n_chars, 6) <= 0.2 THEN 0.25 ELSE 0.0 END),
               2) AS quality_score
    FROM m
"""


def q_minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup survivors, portable-hash mode: the md5-derived
    shingle hash is bit-identical in DuckDB, so the WHOLE pipeline
    (signatures -> banding -> bucket join -> exact-Jaccard verify -> anti
    join) is differentially verified against the SQL oracle."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return dedup.minhash_dedup(
        docs, id_col="doc_id", text_col="text", num_perm=64, bands=16,
        threshold=0.7, hash_fn="md5",
    ).select("doc_id")


# Boilerplate sentence planted at the head of every even doc: its
# 8-token windows duplicate across half the corpus, giving the
# exact-substring detector real signal (the synthetic word soup has
# almost no natural k-gram overlap).
_SPAN_BOILER = (
    "subscribe to our newsletter today for more great content like this"
)


def q_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplication stats (the detection half of the
    published exact-substring dedup recipe): fraction of each document's
    8-token windows whose sequence appeared earlier in the corpus. The
    planted boilerplate head makes half the docs carry duplicated runs;
    first occurrences stay clean."""
    docs = _t(spark, sf_dir, "documents", spread=False).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(F.lit(_SPAN_BOILER + " "), F.col("text")),
        ).otherwise(F.col("text")).alias("text"),
    )
    return dedup.duplicate_spans(docs, id_col="doc_id", text_col="text", k=8)


def q_duplicate_spans_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same query, key_by='hash': every shuffled row carries a 16-byte
    gram key instead of the joined 8-token string. Shares the text-mode
    oracle — identical output IS the correctness claim for the 128-bit
    key (a divergence would mean a hash collision or a keying bug)."""
    docs = _t(spark, sf_dir, "documents", spread=False).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(F.lit(_SPAN_BOILER + " "), F.col("text")),
        ).otherwise(F.col("text")).alias("text"),
    )
    return dedup.duplicate_spans(
        docs, id_col="doc_id", text_col="text", k=8, key_by="hash"
    )


def _oracle_duplicate_spans_sql() -> str:
    return rf"""
    WITH p AS (
        SELECT doc_id,
               CASE WHEN doc_id % 2 = 0
                    THEN '{_SPAN_BOILER} ' || text ELSE text END AS text
        FROM documents
    ), t AS (
        SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks FROM p
    ), w AS (
        SELECT doc_id, i AS pos,
               array_to_string(toks[i + 1 : i + 8], ' ') AS gram
        FROM t, unnest(range(0, len(toks) - 7)) AS u(i)
        WHERE len(toks) >= 8
    ), f AS (
        SELECT doc_id, pos,
               ROW_NUMBER() OVER (
                   PARTITION BY gram ORDER BY doc_id ASC, pos ASC
               ) > 1 AS dup
        FROM w
    ), s AS (
        SELECT doc_id, COUNT(*) AS n_windows,
               COUNT(*) FILTER (dup) AS n_dup_windows
        FROM f GROUP BY doc_id
    )
    SELECT d.doc_id,
           coalesce(s.n_windows, 0) AS n_windows,
           coalesce(s.n_dup_windows, 0) AS n_dup_windows,
           ROUND(CASE WHEN coalesce(s.n_windows, 0) > 0
                      THEN s.n_dup_windows::DOUBLE / s.n_windows
                      ELSE 0.0 END, 6) AS dup_fraction
    FROM documents d LEFT JOIN s USING (doc_id)
    """


def q_remove_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The removal half of exact-substring dedup: the planted boilerplate
    head is cut from every even doc (its windows repeat earlier docs'),
    first occurrences keep their text. The oracle re-derives covered
    token indices and rebuilds each document independently."""
    docs = _t(spark, sf_dir, "documents", spread=False).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(F.lit(_SPAN_BOILER + " "), F.col("text")),
        ).otherwise(F.col("text")).alias("text"),
    )
    return dedup.remove_duplicate_spans(
        docs, id_col="doc_id", text_col="text", k=8
    )


def _oracle_remove_dup_spans_sql() -> str:
    return rf"""
    WITH p AS (
        SELECT doc_id,
               CASE WHEN doc_id % 2 = 0
                    THEN '{_SPAN_BOILER} ' || text ELSE text END AS text
        FROM documents
    ), t AS (
        SELECT doc_id,
               string_split_regex(text, '\s+') AS otoks,
               string_split_regex(lower(text), '\s+') AS toks
        FROM p
    ), w AS (
        SELECT doc_id, i AS pos,
               array_to_string(toks[i + 1 : i + 8], ' ') AS gram
        FROM t, unnest(range(0, len(toks) - 7)) AS u(i)
        WHERE len(toks) >= 8
    ), f AS (
        SELECT doc_id, pos,
               ROW_NUMBER() OVER (
                   PARTITION BY gram ORDER BY doc_id ASC, pos ASC
               ) > 1 AS dup
        FROM w
    ), cov AS (
        SELECT DISTINCT doc_id, pos + j AS idx
        FROM f, unnest(range(0, 8)) AS v(j)
        WHERE dup
    ), tok AS (
        SELECT doc_id, i - 1 AS idx, otoks[i] AS tok
        FROM t, unnest(range(1, len(otoks) + 1)) AS u(i)
    ), kept AS (
        SELECT k.doc_id,
               array_to_string(list(k.tok ORDER BY k.idx), ' ') AS text,
               COUNT(*) AS n_kept
        FROM tok k LEFT JOIN cov c ON k.doc_id = c.doc_id AND k.idx = c.idx
        WHERE c.doc_id IS NULL
        GROUP BY k.doc_id
    ), tot AS (
        SELECT doc_id, len(otoks) AS n_tokens FROM t
    )
    SELECT d.doc_id,
           coalesce(kept.text, '') AS text,
           coalesce(tot.n_tokens, 0) AS n_tokens,
           coalesce(tot.n_tokens, 0) - coalesce(kept.n_kept, 0) AS n_removed
    FROM documents d
    LEFT JOIN tot USING (doc_id)
    LEFT JOIN kept USING (doc_id)
    """


def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive near-duplicate grouping: every document labeled with the
    min doc_id reachable through verified MinHash-LSH pairs (iterative
    min-label propagation; oracle = DuckDB recursive CTE)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return dedup.minhash_components(
        docs, id_col="doc_id", text_col="text", num_perm=64, bands=16,
        threshold=0.7, hash_fn="md5",
    )


def q_dedup_components_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DISTRIBUTED closure strategy under the differential gate: same
    pairs, same expected labeling as dedup_components, but forced through
    the alternating large-star/small-star rounds (the 'auto' route picks
    the driver union-find at these scales, so without this entry the
    star path would never face the oracle)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return dedup.minhash_components(
        docs, id_col="doc_id", text_col="text", num_perm=64, bands=16,
        threshold=0.7, hash_fn="md5", cc_algorithm="star",
    )


def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware dedup: transitive near-dup components + keep the
    best-quality doc per component (ties to the smaller id). Oracle =
    the components recursive CTE joined to the quality-score expression,
    both reused verbatim from their own entries."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return dedup.dedup_keep_best(
        docs, id_col="doc_id", text_col="text", num_perm=64, bands=16,
        threshold=0.7, hash_fn="md5",
    )


def _oracle_dedup_keep_best_sql() -> str:
    return f"""
    WITH comp AS ({_oracle_dedup_components_sql()}),
    q AS ({ORACLE_QUALITY})
    SELECT doc_id, component_id, quality_score FROM (
        SELECT comp.doc_id, comp.component_id, q.quality_score,
               ROW_NUMBER() OVER (
                   PARTITION BY comp.component_id
                   ORDER BY q.quality_score DESC, comp.doc_id ASC
               ) AS rn
        FROM comp JOIN q USING (doc_id)
    ) WHERE rn = 1
    """


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs, portable-hash mode (60-bit md5 signature,
    4x15-bit chunk banding) — fully oracle-checked in DuckDB."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return dedup.simhash_pairs(
        docs, id_col="doc_id", text_col="text", max_hamming=3, hash_fn="md5"
    )


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language heuristic per document."""
    docs = _t(spark, sf_dir, "documents")
    return text.lang_id(docs, id_col="doc_id", text_col="text")


ORACLE_LANG_ID = r"""
    WITH t AS (
        SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks FROM documents
    ), scored AS (
        SELECT doc_id, LEN(toks) AS n_tokens,
            [
              {'hits': LEN(list_filter(toks, x -> list_contains(
                  ['der','die','das','und','ist','nicht','mit','ein','zu','auf'], x))),
               'lang': 'de'},
              {'hits': LEN(list_filter(toks, x -> list_contains(
                  ['the','and','of','to','in','is','that','it','for','with'], x))),
               'lang': 'en'},
              {'hits': LEN(list_filter(toks, x -> list_contains(
                  ['el','la','los','de','que','es','en','un','por','con'], x))),
               'lang': 'es'},
              {'hits': LEN(list_filter(toks, x -> list_contains(
                  ['le','la','les','et','est','pas','pour','dans','que','une'], x))),
               'lang': 'fr'},
              {'hits': LEN(list_filter(toks, x -> list_contains(
                  ['的','是','在','了','和','有','我','不','这','人'], x))),
               'lang': 'zh'}
            ] AS scores
        FROM t
    )
    SELECT doc_id,
           list_max(scores)['lang'] AS lang_pred,
           ROUND(list_max(scores)['hits']::DOUBLE / n_tokens, 6) AS lang_score
    FROM scored
"""


def q_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style pretraining quality rules per document (word-count band,
    mean word length, symbol ratio, alpha-word fraction, stopword presence)
    — one shuffle-free projection (operators/text.gopher_quality)."""
    docs = _t(spark, sf_dir, "documents", spread=False)
    return text.gopher_quality(
        docs, id_col="doc_id", text_col="text", min_words=10
    )


ORACLE_GOPHER = r"""
    WITH t AS (
        SELECT doc_id, text,
               string_split_regex(lower(text), '\s+') AS toks
        FROM documents
    ), s AS (
        SELECT doc_id,
            LEN(toks) AS n_words,
            ROUND(list_sum(list_transform(toks, x -> LENGTH(x)))::DOUBLE
                  / LEN(toks), 6) AS mean_word_len,
            ROUND((LENGTH(text) - LENGTH(replace(text, '#', ''))
                   + LEN(regexp_extract_all(text, '\.\.\.|…')))::DOUBLE
                  / LEN(toks), 6) AS symbol_ratio,
            ROUND(LEN(list_filter(toks, x -> regexp_matches(x, '[a-z]')))::DOUBLE
                  / LEN(toks), 6) AS alpha_word_frac,
            LEN(list_filter(list_distinct(toks), x -> list_contains(
                ['the','and','of','to','in','is','that','it','for','with',
                 'a','an','on','at','by','as','be','are'], x))) AS stopword_hits
        FROM t
    )
    SELECT doc_id, n_words, mean_word_len, symbol_ratio, alpha_word_frac,
           stopword_hits,
           (n_words >= 10 AND n_words <= 100000) AS rule_word_count,
           (mean_word_len >= 3.0 AND mean_word_len <= 10.0) AS rule_mean_word_len,
           (symbol_ratio <= 0.1) AS rule_symbol_ratio,
           (alpha_word_frac >= 0.8) AS rule_alpha_words,
           (stopword_hits >= 2) AS rule_stopwords,
           ((n_words >= 10 AND n_words <= 100000)
            AND (mean_word_len >= 3.0 AND mean_word_len <= 10.0)
            AND (symbol_ratio <= 0.1)
            AND (alpha_word_frac >= 0.8)
            AND (stopword_hits >= 2)) AS gopher_pass
    FROM s
"""


def q_repetition_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition signals over word bigrams (duplicate-
    n-gram fraction + top-n-gram fraction, Rae et al. repetition filters).
    Per-row sorted-array run-length pass — zero shuffle; the oracle
    recomputes the modal bigram relationally (unnest -> count -> argmax
    with the same count-desc, gram-asc tie-break)."""
    docs = _t(spark, sf_dir, "documents", spread=False)
    return text.repetition_signals(docs, id_col="doc_id", text_col="text", ngram=2)


ORACLE_REPETITION = r"""
    WITH t AS (
        SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
        FROM documents
    ), g AS (
        SELECT doc_id,
            CASE WHEN LEN(toks) >= 2
                 THEN list_transform(range(1, LEN(toks)),
                                     i -> concat(toks[i], ' ', toks[i+1]))
                 ELSE [] END AS grams
        FROM t
    ), counts AS (
        SELECT doc_id, gram, COUNT(*) AS c
        FROM (SELECT doc_id, unnest(grams) AS gram FROM g)
        GROUP BY doc_id, gram
    ), top AS (
        SELECT doc_id, c, gram,
               ROW_NUMBER() OVER (
                   PARTITION BY doc_id ORDER BY c DESC, gram ASC
               ) AS rn
        FROM counts
    )
    SELECT g.doc_id,
           LEN(g.grams) AS n_ngrams,
           CASE WHEN LEN(g.grams) > 0
                THEN ROUND(1.0 - LEN(list_distinct(g.grams))::DOUBLE
                           / LEN(g.grams), 6)
                ELSE 0.0 END AS dup_ngram_frac,
           CASE WHEN LEN(g.grams) > 0
                THEN ROUND(top.c::DOUBLE / LEN(g.grams), 6)
                ELSE 0.0 END AS top_ngram_frac,
           top.gram AS top_ngram
    FROM g LEFT JOIN (SELECT * FROM top WHERE rn = 1) top USING (doc_id)
"""


def q_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: every 50th document plays the eval set;
    the rest of the corpus is flagged on >=1 shared word 5-gram
    (operators/dedup.decontaminate: broadcast bench-gram set, ids-only
    match counting)."""
    docs = _t(spark, sf_dir, "documents", spread=False)
    bench = docs.where(F.col("doc_id") % 50 == 0)
    corpus = docs.where(F.col("doc_id") % 50 != 0)
    return dedup.decontaminate(
        corpus, bench, id_col="doc_id", text_col="text", n=5, min_overlap=1,
        hash_fn="md5",
    )


ORACLE_DECONTAMINATION = r"""
    WITH t AS (
        SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
        FROM documents
    ), g AS (
        SELECT doc_id,
               list_distinct([
                   array_to_string(toks[i:i+4], ' ')
                   FOR i IN range(1, GREATEST(len(toks) - 4, 1) + 1)
               ]) AS grams
        FROM t
    ), bench AS (
        SELECT DISTINCT CAST(concat('0x', substr(md5(gram), 1, 15)) AS BIGINT)
               AS gh
        FROM (SELECT unnest(grams) AS gram FROM g WHERE doc_id % 50 = 0)
    ), corpus AS (
        SELECT * FROM g WHERE doc_id % 50 <> 0
    ), m AS (
        SELECT c.doc_id, COUNT(*) AS matched
        FROM (SELECT doc_id,
                     CAST(concat('0x', substr(md5(gram), 1, 15)) AS BIGINT)
                     AS gh
              FROM (SELECT doc_id, unnest(grams) AS gram FROM corpus)) c
        JOIN bench USING (gh)
        GROUP BY c.doc_id
    )
    SELECT corpus.doc_id,
           len(corpus.grams) AS n_grams,
           COALESCE(m.matched, 0) AS matched_grams,
           (COALESCE(m.matched, 0) >= 1) AS contaminated
    FROM corpus LEFT JOIN m USING (doc_id)
"""


# Portable salted 60-bit md5 hash, as computed by operators/sampling.py in
# hash_fn='md5' mode: DuckDB evaluates this bit-identically.
def _duck_md5_hash(id_expr: str, salt: str) -> str:
    return (
        f"CAST(concat('0x', substr(md5(concat({id_expr}::VARCHAR, ':{salt}')),"
        f" 1, 15)) AS BIGINT)"
    )


def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 30% corpus sample by salted id hash (portable md5
    mode) — selection is a pure function of (id, salt): stable across
    reruns/partitioning and replayable by the oracle."""
    from timefence_spark.operators import sampling

    docs = _t(spark, sf_dir, "documents", spread=False)
    return sampling.hash_sample(
        docs.select("doc_id", "lang", "source"),
        id_col="doc_id", fraction=0.3, salt="bench", hash_fn="md5",
    )


ORACLE_HASH_SAMPLE = f"""
    SELECT doc_id, lang, source FROM documents
    WHERE {_duck_md5_hash("doc_id", "bench")} % 1000000 < 300000
"""


def q_shuffle_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global corpus shuffle (portable md5 mode): row order
    = ascending salted id hash, a pure function of (id, salt), kept as
    an auditable `shuffle_key` column. Physically one range exchange +
    local sorts — the global-ORDER-BY plan, never a single-partition
    window."""
    from timefence_spark.operators import sampling

    docs = _t(spark, sf_dir, "documents", spread=False)
    return sampling.deterministic_shuffle(
        docs.select("doc_id", "lang"),
        id_col="doc_id", salt="epoch0", hash_fn="md5",
        key_col="shuffle_key",
    )


ORACLE_SHUFFLE_ROWS = f"""
    SELECT doc_id, lang,
           {_duck_md5_hash("doc_id", "epoch0")} AS shuffle_key
    FROM documents
    ORDER BY shuffle_key, doc_id
"""


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-(lang, source) quota sample: 5 docs per stratum,
    ranked by salted hash with id tie-break — one shuffle on the strata
    columns into a window row_number."""
    from timefence_spark.operators import sampling

    docs = _t(spark, sf_dir, "documents", spread=False)
    return sampling.stratified_sample(
        docs.select("doc_id", "lang", "source"),
        strata_cols=["lang", "source"], n_per_stratum=5,
        id_col="doc_id", salt="strat", hash_fn="md5",
    )


ORACLE_STRATIFIED_SAMPLE = f"""
    SELECT doc_id, lang, source FROM (
        SELECT doc_id, lang, source,
               ROW_NUMBER() OVER (
                   PARTITION BY lang, source
                   ORDER BY {_duck_md5_hash("doc_id", "strat")} ASC, doc_id ASC
               ) AS rn
        FROM documents
    ) WHERE rn <= 5
"""


def q_split_by_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment by salted id hash: the
    standard reproducible corpus split (split of a given id never changes
    as the corpus grows). Splits occupy contiguous hash ranges in
    sorted-name order: test [0, 0.1), train [0.1, 0.9), val [0.9, 1)."""
    from timefence_spark.operators import sampling

    docs = _t(spark, sf_dir, "documents", spread=False)
    return sampling.split_by_hash(
        docs.select("doc_id"),
        id_col="doc_id",
        weights={"train": 0.8, "val": 0.1, "test": 0.1},
        salt="sp", hash_fn="md5",
    )


ORACLE_SPLIT_BY_HASH = f"""
    SELECT doc_id,
           CASE WHEN {_duck_md5_hash("doc_id", "sp")} % 1000000 < 100000
                THEN 'test'
                WHEN {_duck_md5_hash("doc_id", "sp")} % 1000000 < 900000
                THEN 'train'
                ELSE 'val' END AS split
    FROM documents
"""


# ---------------------------------------------------------------------------
# PII scrubbing (operators/pii.py). The synthetic corpus carries no PII, so
# both sides plant deterministic spans derived from doc_id (same device as
# the leak_flags planted dataset): every 3rd doc an email, every 5th a
# phone number, every 7th an IPv4 — identical expressions in both engines.
# ---------------------------------------------------------------------------


def _pii_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timefence_spark.operators import pii  # noqa: F401  (patterns below)

    d = F.col("doc_id")
    planted = F.concat(
        F.col("text"),
        F.when(
            d % 3 == 0,
            F.concat(
                F.lit(" reach me at user"),
                d.cast("string"),
                F.lit("@mail.example.com"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            d % 5 == 0,
            F.concat(
                F.lit(" call (555) 010-"),
                F.lpad((d % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            d % 7 == 0,
            F.concat(
                F.lit(" from 10.0."),
                (d % 256).cast("string"),
                F.lit("."),
                (d % 250).cast("string"),
            ),
        ).otherwise(F.lit("")),
    )
    return _t(spark, sf_dir, "documents", spread=False).select(
        "doc_id", planted.alias("text")
    )


_PII_TEXT_SQL = """
        SELECT doc_id,
               concat(
                   text,
                   CASE WHEN doc_id % 3 = 0
                        THEN concat(' reach me at user', doc_id::VARCHAR,
                                    '@mail.example.com') ELSE '' END,
                   CASE WHEN doc_id % 5 = 0
                        THEN concat(' call (555) 010-',
                                    lpad((doc_id % 10000)::VARCHAR, 4, '0'))
                        ELSE '' END,
                   CASE WHEN doc_id % 7 = 0
                        THEN concat(' from 10.0.', (doc_id % 256)::VARCHAR,
                                    '.', (doc_id % 250)::VARCHAR) ELSE '' END
               ) AS text
        FROM documents
"""


def q_pii_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document PII counts (emails / phones / IPv4) over the planted
    corpus — regexp families restricted to Java/RE2-identical constructs,
    so the oracle counts the same spans."""
    from timefence_spark.operators import pii

    return pii.pii_signals(
        _pii_planted(spark, sf_dir), id_col="doc_id", text_col="text"
    )


def _oracle_pii_signals_sql() -> str:
    from timefence_spark.operators import pii

    # coalesce mirrors pii_signals' NULL-text contract: zero counts, not
    # NULL, so has_pii is never NULL.
    counts = ", ".join(
        "coalesce(len(regexp_extract_all(text, '" + pat + "')), 0) AS n_"
        + name
        for name, pat, _ in pii.PII_RULES
    )
    return (
        "WITH p AS (" + _PII_TEXT_SQL + "), c AS ("
        "SELECT doc_id, " + counts + " FROM p) "
        "SELECT doc_id, n_email, n_phone, n_ipv4, "
        "n_email + n_phone + n_ipv4 AS n_pii, "
        "n_email + n_phone + n_ipv4 > 0 AS has_pii FROM c"
    )


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redaction pass: every planted span replaced by its family token, in
    the fixed email -> phone -> IPv4 rule order."""
    from timefence_spark.operators import pii

    return pii.redact_pii(
        _pii_planted(spark, sf_dir), id_col="doc_id", text_col="text"
    ).select("doc_id", "text_redacted")


def _oracle_pii_redact_sql() -> str:
    from timefence_spark.operators import pii

    expr = "text"
    for _, pat, token in pii.PII_RULES:
        expr = "regexp_replace(" + expr + ", '" + pat + "', '" + token + "', 'g')"
    return (
        "WITH p AS (" + _PII_TEXT_SQL + ") "
        "SELECT doc_id, " + expr + " AS text_redacted FROM p"
    )


# ---------------------------------------------------------------------------
# Sequence packing (operators/packing.py): documents -> fixed token-budget
# training chunks, n_chars standing in for the token count.
# ---------------------------------------------------------------------------

_PACK_SHARDS = 8


def q_pack_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style concatenate-then-cut packing: deterministic per-shard
    order (salted md5, portable), cumulative offsets, chunk span per doc.
    One window shuffle; fully SQL-replayable."""
    from timefence_spark.operators import packing

    docs = _t(spark, sf_dir, "documents", spread=False).select("doc_id", "n_chars")
    return packing.pack_stream(
        docs, id_col="doc_id", token_col="n_chars", budget=2000,
        num_shards=_PACK_SHARDS, salt="pack", hash_fn="md5",
    )


def _oracle_pack_stream_sql() -> str:
    h = _duck_md5_hash("doc_id", "pack")
    return f"""
    WITH s AS (
        SELECT doc_id, n_chars, {h} AS h FROM documents
    ), c AS (
        SELECT doc_id, n_chars,
               CAST(h % {_PACK_SHARDS} AS INT) AS shard,
               CAST(SUM(n_chars) OVER (
                   PARTITION BY h % {_PACK_SHARDS}
                   ORDER BY h ASC, doc_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS endo
        FROM s
    )
    SELECT doc_id, n_chars, shard,
           endo - n_chars AS start_offset,
           (endo - n_chars) // 2000 AS chunk_start,
           GREATEST(endo - 1, endo - n_chars) // 2000 AS chunk_end,
           GREATEST(endo - 1, endo - n_chars) // 2000
               <> (endo - n_chars) // 2000 AS straddles
    FROM c
    """


def q_pack_next_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boundary-respecting next-fit packing (no straddles; oversized docs
    flagged in their own chunk). Sequential per shard by nature — one
    applyInPandas group per shard; the oracle replays the same recurrence
    with a recursive CTE."""
    from timefence_spark.operators import packing

    docs = _t(spark, sf_dir, "documents", spread=False).select("doc_id", "n_chars")
    return packing.pack_next_fit(
        docs, id_col="doc_id", token_col="n_chars", budget=400,
        num_shards=_PACK_SHARDS, salt="pack", hash_fn="md5",
    )


def _pack_next_fit_cte(b: int) -> str:
    """WITH-clause body replaying pack_next_fit's per-shard recurrence
    (shared by the pack_next_fit and pack_assemble oracles)."""
    h = _duck_md5_hash("doc_id", "pack")
    return f"""
    WITH RECURSIVE s AS (
        SELECT doc_id, n_chars,
               CAST(h % {_PACK_SHARDS} AS INT) AS shard,
               ROW_NUMBER() OVER (
                   PARTITION BY h % {_PACK_SHARDS} ORDER BY h ASC, doc_id ASC
               ) AS rn
        FROM (SELECT doc_id, n_chars, {h} AS h FROM documents)
    ), r AS (
        -- state: cur = open chunk index, used = its token fill,
        -- m = its member count (zero-token docs occupy a chunk without
        -- raising used; oversized docs must still skip past them)
        SELECT shard, rn, doc_id, n_chars,
               0 AS chunk, 0 AS chunk_offset,
               n_chars > {b} AS oversized,
               CASE WHEN n_chars > {b} THEN 1 ELSE 0 END AS cur,
               CASE WHEN n_chars > {b} THEN 0 ELSE n_chars END AS used,
               CASE WHEN n_chars > {b} THEN 0 ELSE 1 END AS m
        FROM s WHERE rn = 1
        UNION ALL
        SELECT s.shard, s.rn, s.doc_id, s.n_chars,
               CASE WHEN s.n_chars > {b}
                    THEN r.cur + CASE WHEN r.m > 0 THEN 1 ELSE 0 END
                    WHEN r.used + s.n_chars > {b} THEN r.cur + 1
                    ELSE r.cur END AS chunk,
               CASE WHEN s.n_chars > {b} OR r.used + s.n_chars > {b}
                    THEN 0 ELSE r.used END AS chunk_offset,
               s.n_chars > {b} AS oversized,
               CASE WHEN s.n_chars > {b}
                    THEN r.cur + CASE WHEN r.m > 0 THEN 1 ELSE 0 END + 1
                    WHEN r.used + s.n_chars > {b} THEN r.cur + 1
                    ELSE r.cur END AS cur,
               CASE WHEN s.n_chars > {b} THEN 0
                    WHEN r.used + s.n_chars > {b} THEN s.n_chars
                    ELSE r.used + s.n_chars END AS used,
               CASE WHEN s.n_chars > {b} THEN 0
                    WHEN r.used + s.n_chars > {b} THEN 1
                    ELSE r.m + 1 END AS m
        FROM r JOIN s ON s.shard = r.shard AND s.rn = r.rn + 1
    )
    """


def _oracle_pack_next_fit_sql() -> str:
    return (
        _pack_next_fit_cte(400)
        + """
    SELECT doc_id, n_chars, shard, CAST(chunk AS BIGINT) AS chunk,
           CAST(chunk_offset AS BIGINT) AS chunk_offset, oversized
    FROM r
    """
    )


def q_pack_assemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk materialization: next-fit pack, then concatenate each chunk's
    documents in offset order — the corpus-to-training-stream step. One
    (shard, chunk) shuffle; per-group memory bounded by the pack budget."""
    from timefence_spark.operators import packing

    docs = _t(spark, sf_dir, "documents", spread=False).select(
        "doc_id", "n_chars", "text"
    )
    packed = packing.pack_next_fit(
        docs, id_col="doc_id", token_col="n_chars", budget=400,
        num_shards=_PACK_SHARDS, salt="pack", hash_fn="md5",
    )
    return packing.assemble_chunks(
        packed, id_col="doc_id", text_col="text", token_col="n_chars"
    )


def _oracle_pack_assemble_sql() -> str:
    return (
        _pack_next_fit_cte(400)
        + """
    SELECT r.shard, CAST(r.chunk AS BIGINT) AS chunk,
           COUNT(*) AS n_docs,
           CAST(SUM(r.n_chars) AS BIGINT) AS n_tokens,
           string_agg(d.text, ' ' ORDER BY r.chunk_offset, d.doc_id) AS text
    FROM r JOIN documents d USING (doc_id)
    GROUP BY r.shard, r.chunk
    """
    )


# ---------------------------------------------------------------------------
# URL / domain analysis (operators/web.py). URLs are planted from doc_id +
# source/lang, the same device as the PII queries.
# ---------------------------------------------------------------------------


def _url_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = F.col("doc_id")
    planted = F.concat(
        F.col("text"),
        F.when(
            d % 2 == 0,
            F.concat(
                F.lit(" see https://"), F.col("source"),
                F.lit(".example.org/p/"), d.cast("string"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            d % 6 == 0,
            F.concat(
                F.lit(" and http://cdn."), F.col("lang"), F.lit(".example.net/x")
            ),
        ).otherwise(F.lit("")),
    )
    return _t(spark, sf_dir, "documents", spread=False).select(
        "doc_id", "lang", "source", planted.alias("text")
    )


_URL_TEXT_SQL = """
        SELECT doc_id, lang, source,
               concat(
                   text,
                   CASE WHEN doc_id % 2 = 0
                        THEN concat(' see https://', source, '.example.org/p/',
                                    doc_id::VARCHAR) ELSE '' END,
                   CASE WHEN doc_id % 6 = 0
                        THEN concat(' and http://cdn.', lang, '.example.net/x')
                        ELSE '' END
               ) AS text
        FROM documents
"""


def q_url_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document link profile: URL count, distinct domains, link
    density — the standard boilerplate/spam signal set."""
    from timefence_spark.operators import web

    return web.url_signals(
        _url_planted(spark, sf_dir), id_col="doc_id", text_col="text"
    )


def q_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level dedup (new in round 9): crawl re-fetch removal. Every
    3 documents share one page; each sees it under a different dirty
    spelling (scheme/host case + default port, trailing slash, tracking
    params, unsorted params + fragment). web.canonicalize_url folds the
    spellings together and web.url_dedup keeps min(doc_id) per
    canonical form via one min-agg + semi-join (no window). The oracle
    replays the full normalization chain."""
    from timefence_spark.operators import web

    d = F.col("doc_id")
    g = F.floor(d / 3).cast("string")
    src = F.col("source")
    url = (
        F.when(d % 6 == 0, F.concat(
            F.lit("https://"), src, F.lit(".example.org/p/"), g))
        .when(d % 6 == 1, F.concat(
            F.lit("HTTPS://"), F.upper(src), F.lit(".Example.ORG:443/p/"), g))
        .when(d % 6 == 2, F.concat(
            F.lit("https://"), src, F.lit(".example.org/p/"), g, F.lit("/")))
        .when(d % 6 == 3, F.concat(
            F.lit("https://"), src, F.lit(".example.org/p/"), g,
            F.lit("?utm_source=feed&utm_medium=rss")))
        .when(d % 6 == 4, F.concat(
            F.lit("https://"), src, F.lit(".example.org/p/"), g,
            F.lit("?b=2&a=1#top")))
        .otherwise(F.concat(
            F.lit("https://"), src, F.lit(".example.org/p/"), g,
            F.lit("?a=1&b=2&gclid="), d.cast("string")))
    )
    docs = _t(spark, sf_dir, "documents", spread=False).select(
        "doc_id", url.alias("url")
    )
    return web.url_dedup(docs, id_col="doc_id", url_col="url").select(
        "doc_id", "canonical_url"
    )


ORACLE_URL_DEDUP = r"""
    WITH u0 AS (
        SELECT doc_id,
               CASE doc_id % 6
                   WHEN 0 THEN 'https://' || source || '.example.org/p/'
                               || (doc_id // 3)
                   WHEN 1 THEN 'HTTPS://' || upper(source)
                               || '.Example.ORG:443/p/' || (doc_id // 3)
                   WHEN 2 THEN 'https://' || source || '.example.org/p/'
                               || (doc_id // 3) || '/'
                   WHEN 3 THEN 'https://' || source || '.example.org/p/'
                               || (doc_id // 3)
                               || '?utm_source=feed&utm_medium=rss'
                   WHEN 4 THEN 'https://' || source || '.example.org/p/'
                               || (doc_id // 3) || '?b=2&a=1#top'
                   ELSE 'https://' || source || '.example.org/p/'
                        || (doc_id // 3) || '?a=1&b=2&gclid=' || doc_id
               END AS url
        FROM documents
    ), t AS (
        SELECT doc_id,
               regexp_replace(url, '^[ \t\r\n]+|[ \t\r\n]+$', '', 'g')
                   AS u,
               regexp_replace(
                   regexp_replace(url, '^[ \t\r\n]+|[ \t\r\n]+$', '',
                                  'g'),
                   '#.*$', '') AS nofrag
        FROM u0
    ), parts AS (
        SELECT doc_id, u,
               lower(regexp_extract(nofrag,
                   '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
               lower(regexp_extract(nofrag,
                   '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS auth0,
               regexp_replace(regexp_extract(nofrag,
                   '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1),
                   '/+$', '') AS path,
               regexp_extract(nofrag, '\?([^#]*)', 1) AS rawq
        FROM t
    ), normed AS (
        SELECT doc_id, u, scheme, path, rawq,
               CASE WHEN scheme = 'http' AND auth0 LIKE '%:80'
                    THEN substr(auth0, 1, length(auth0) - 3)
                    WHEN scheme = 'https' AND auth0 LIKE '%:443'
                    THEN substr(auth0, 1, length(auth0) - 4)
                    ELSE auth0 END AS auth,
               list_sort(list_filter(string_split(rawq, '&'),
                   p -> p <> ''
                        AND NOT starts_with(split_part(p, '=', 1), 'utm_')
                        AND split_part(p, '=', 1) NOT IN
                            ('gclid', 'fbclid', 'msclkid', 'mc_eid',
                             'igshid'))) AS kept
        FROM parts
    ), canon AS (
        SELECT doc_id,
               CASE WHEN regexp_matches(u, '^[A-Za-z][A-Za-z0-9+.-]*://')
                    THEN scheme || '://' || auth || path ||
                         CASE WHEN len(kept) > 0
                              THEN '?' || array_to_string(kept, '&')
                              ELSE '' END
                    ELSE u END AS canonical_url
        FROM normed
    )
    SELECT doc_id, canonical_url FROM canon
    WHERE doc_id = (SELECT MIN(c2.doc_id) FROM canon c2
                    WHERE c2.canonical_url = canon.canonical_url)
"""


def q_ngram_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus boilerplate mining (new in round 9): top recurring word
    3-grams with total and document frequency (text.ngram_frequencies —
    per-doc pre-agg before the one gram shuffle, no count-distinct
    expand). The table head is what line/span blocklists get curated
    from."""
    docs = _t(spark, sf_dir, "documents", spread=False)
    return text.ngram_frequencies(
        docs, id_col="doc_id", text_col="text", n=3, top_k=100, min_docs=2
    )


def _oracle_ngram_freq_sql(n: int = 3, top_k: int = 100,
                           min_docs: int = 2) -> str:
    return rf"""
    WITH t AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\s+'),
                           x -> x <> '') AS tk
        FROM documents WHERE text IS NOT NULL
    ), g AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(tk) - {n} + 2),
                      i -> array_to_string(tk[i:i+{n - 1}], ' '))) AS ngram
        FROM t WHERE len(tk) >= {n}
    ), pd AS (
        SELECT doc_id, ngram, COUNT(*) AS c FROM g GROUP BY doc_id, ngram
    )
    SELECT ngram, SUM(c)::BIGINT AS n_occurrences,
           COUNT(*)::BIGINT AS n_docs
    FROM pd GROUP BY ngram HAVING COUNT(*) >= {min_docs}
    ORDER BY n_occurrences DESC, ngram ASC LIMIT {top_k}
    """


def _sql_str(pattern: str) -> str:
    """Embed a regex in a single-quoted SQL literal (escape ')."""
    return pattern.replace("'", "''")


def _oracle_url_signals_sql() -> str:
    from timefence_spark.operators import web

    u = "regexp_extract_all(text, '" + _sql_str(web.URL_PATTERN) + "')"
    dom = (
        "list_transform(" + u + ", x -> lower(regexp_extract(x,"
        " 'https?://([A-Za-z0-9.-]+)', 1)))"
    )
    return (
        "WITH p AS (" + _URL_TEXT_SQL + ") "
        "SELECT doc_id, len(" + u + ") AS n_urls, "
        "len(list_distinct(" + dom + ")) AS n_domains, "
        "round(COALESCE(list_sum(list_transform(" + u + ", x -> length(x))), 0)"
        "::DOUBLE / GREATEST(length(text), 1), 6) AS link_density "
        "FROM p"
    )


def q_domain_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level domain frequency table (blocklist curation input):
    one partial-agg shuffle on the domain key."""
    from timefence_spark.operators import web

    return web.domain_counts(
        _url_planted(spark, sf_dir), id_col="doc_id", text_col="text"
    )


def _oracle_domain_counts_sql() -> str:
    from timefence_spark.operators import web

    return (
        "WITH p AS (" + _URL_TEXT_SQL + "), e AS ("
        "SELECT doc_id, lower(regexp_extract(u, 'https?://([A-Za-z0-9.-]+)', 1))"
        " AS domain FROM (SELECT doc_id, unnest(regexp_extract_all(text, '"
        + _sql_str(web.URL_PATTERN) + "')) AS u FROM p)) "
        "SELECT domain, COUNT(*) AS n_urls, COUNT(DISTINCT doc_id) AS n_docs "
        "FROM e GROUP BY 1"
    )


_BLOCKED_DOMAINS = ["src3.example.org", "cdn.zh.example.net"]


def q_domain_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocklist filtering: drop every document linking to a blocked
    domain. Broadcast blocklist; the text column never shuffles."""
    from timefence_spark.operators import web

    return web.filter_blocked_domains(
        _url_planted(spark, sf_dir),
        _BLOCKED_DOMAINS,
        id_col="doc_id",
        text_col="text",
    ).select("doc_id", "lang", "source")


def _oracle_domain_blocklist_sql() -> str:
    from timefence_spark.operators import web

    blocked = ", ".join("'" + d + "'" for d in _BLOCKED_DOMAINS)
    return (
        "WITH p AS (" + _URL_TEXT_SQL + "), e AS ("
        "SELECT doc_id, lower(regexp_extract(u, 'https?://([A-Za-z0-9.-]+)', 1))"
        " AS domain FROM (SELECT doc_id, unnest(regexp_extract_all(text, '"
        + _sql_str(web.URL_PATTERN) + "')) AS u FROM p)) "
        "SELECT doc_id, lang, source FROM p WHERE doc_id NOT IN ("
        "SELECT doc_id FROM e WHERE domain IN (" + blocked + "))"
    )


def q_word_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary head: top-100 words by occurrence (deterministic
    (count desc, word asc) order) with document frequency."""
    return text.word_frequencies(
        _t(spark, sf_dir, "documents", spread=False),
        id_col="doc_id", text_col="text", top_k=100,
    )


ORACLE_WORD_FREQ = r"""
    WITH w AS (
        SELECT doc_id,
               unnest(string_split_regex(lower(text), '\s+')) AS word
        FROM documents
    )
    SELECT word, COUNT(*) AS n_occurrences, COUNT(DISTINCT doc_id) AS n_docs
    FROM w WHERE word <> ''
    GROUP BY 1 ORDER BY n_occurrences DESC, word ASC LIMIT 100
"""


def q_normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalization pass: control chars stripped, whitespace runs
    collapsed, trimmed, lowercased. Planted mess: tabs/CRs and doubled
    spaces derived from doc_id so the oracle rewrites the same spans."""
    d = F.col("doc_id")
    messy = F.concat(
        F.when(d % 2 == 0, F.lit("\t ")).otherwise(F.lit("")),
        F.col("text"),
        F.when(d % 3 == 0, F.lit("\r\n trailing  Spaces ")).otherwise(F.lit("")),
    )
    docs = _t(spark, sf_dir, "documents", spread=False).select(
        "doc_id", messy.alias("text")
    )
    return text.normalize_text(
        docs, id_col="doc_id", text_col="text", lowercase=True
    )


ORACLE_NORMALIZE = r"""
    WITH p AS (
        SELECT doc_id,
               concat(
                   CASE WHEN doc_id % 2 = 0 THEN chr(9) || ' ' ELSE '' END,
                   text,
                   CASE WHEN doc_id % 3 = 0
                        THEN chr(13) || chr(10) || ' trailing  Spaces '
                        ELSE '' END
               ) AS text
        FROM documents
    )
    SELECT doc_id,
           lower(trim(regexp_replace(
               regexp_replace(text, '[\x00-\x1f\x7f]', ' ', 'g'),
               '\s+', ' ', 'g'))) AS text
    FROM p
"""


def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style line-level dedup across the corpus, at the operator's
    DEFAULT dedup floor (min_len=10). Every third space becomes a line
    break (planted identically in both engines), so 'lines' are 3-word
    shingles: most clear the floor and dedup to their global first
    occurrence, while the short ones ('a the big') exercise the
    always-keep bypass."""
    docs = _t(spark, sf_dir, "documents", spread=False).select(
        "doc_id",
        F.regexp_replace("text", r"(\w+ \w+ \w+) ", "$1\n").alias("text"),
    )
    return text.line_dedup(docs, id_col="doc_id", text_col="text")


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (RAG/context-window prep):
    16-token chunks, 4-token overlap (stride 12), trailing chunks under
    8 tokens dropped. Pure scan-side expressions; the oracle enumerates
    the identical start offsets."""
    docs = _t(spark, sf_dir, "documents", spread=False)
    return text.chunk_documents(
        docs, id_col="doc_id", text_col="text",
        chunk_tokens=16, overlap=4, min_tokens=8,
    )


ORACLE_CHUNK_DOCUMENTS = r"""
    WITH t AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\s+'),
                           tok -> tok <> '') AS toks
        FROM documents
    ), c AS (
        SELECT doc_id,
               CAST(i AS INT) AS chunk_idx,
               CAST(i * 12 AS INT) AS tok_start,
               toks[i * 12 + 1 : i * 12 + 16] AS chunk
        FROM t, unnest(range(0, CAST(ceil(len(toks)::DOUBLE / 12) AS BIGINT))) AS u(i)
        WHERE len(toks) >= 1
    )
    SELECT doc_id, chunk_idx, tok_start,
           CAST(len(chunk) AS INT) AS n_tokens,
           array_to_string(chunk, ' ') AS chunk_text
    FROM c
    WHERE len(chunk) >= 8
"""


def q_media_decode_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOSSY format under the differential gate: baseline grayscale JPEGs
    (operators/codecs.py: FDCT + flat-8 quantization + Annex-K Huffman)
    built per doc_id as a grid of uniform 8x8 blocks — each block's value
    a pure function of (doc_id, block row, block col), so the DC
    difference chain and per-block EOB Huffman coding are exercised
    across blocks while every block stays EXACTLY reconstructible (a
    uniform block has only a DC coefficient; with q00=8 the 8*(v-128)
    DC quantizes losslessly). Block counts are powers of two (1/2/4), so
    mean and population variance are EXACT doubles in both engines — the
    cross-engine hash compares identical IEEE values, no tolerance. The
    oracle recomputes dimensions AND pixel statistics from the same
    block-value formula — matching proves the Huffman+dequant+IDCT path
    reconstructed the actual raster."""
    import numpy as np
    import pandas as pd

    from timefence_spark.operators import codecs, multimodal

    flat_q = np.full((8, 8), 8, np.int32)

    def gen(it):
        for pdf in it:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                bw, bh = d % 2 + 1, (d // 2) % 2 + 1  # blocks across / down
                img = np.empty((bh * 8, bw * 8), np.uint8)
                for bi in range(bh):
                    for bj in range(bw):
                        img[bi * 8 : bi * 8 + 8, bj * 8 : bj * 8 + 8] = (
                            d * 7 + bi * 16 + bj * 29
                        ) % 256
                payloads.append(codecs.jpeg_encode_gray(img, quant=flat_q))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].values, "payload": payloads}
            )

    planted = (
        _t(spark, sf_dir, "documents", spread=False)
        .select("doc_id")
        .mapInPandas(gen, "doc_id long, payload binary")
    )
    info = multimodal.decode_images(
        planted, id_col="doc_id", binary_col="payload",
        decode_fn=codecs.jpeg_decode_info,
    )
    stats = multimodal.image_channel_stats(
        planted, id_col="doc_id", binary_col="payload",
        stats_fn=codecs.jpeg_channel_stats,
    )
    return info.join(stats, "doc_id").select(
        "doc_id", "width", "height", "channels", "format",
        F.round("mean_r", 6).alias("mean_r"),
        F.round("std_rgb", 6).alias("std_rgb"),
    )


ORACLE_MEDIA_DECODE_JPEG = """
    WITH px AS (
        SELECT d.doc_id,
               CAST((d.doc_id * 7 + bi.i * 16 + bj.j * 29) % 256 AS DOUBLE)
                   AS v
        FROM documents d,
             unnest(range(0, (d.doc_id // 2) % 2 + 1)) AS bi(i),
             unnest(range(0, d.doc_id % 2 + 1)) AS bj(j)
    )
    SELECT doc_id,
           CAST((doc_id % 2 + 1) * 8 AS INT) AS width,
           CAST(((doc_id // 2) % 2 + 1) * 8 AS INT) AS height,
           1 AS channels,
           'jpeg' AS format,
           ROUND(AVG(v), 6) AS mean_r,
           ROUND(sqrt(AVG(v * v) - AVG(v) * AVG(v)), 6) AS std_rgb
    FROM px
    GROUP BY doc_id
"""


def q_media_decode_jpeg_rgb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COLOR (YCbCr 4:4:4) baseline JPEG under the differential gate:
    per-block-uniform RGB images (power-of-two block grids; channel
    values pairwise DISTINCT per block — the Cb coefficient pair sums to
    exactly 0.5, so r == g would park the chroma DC on an exact half
    where the FDCT's last-ulp noise flips the rounding; distinct
    channels keep every rounding off the boundary) encode through the
    full RGB->YCbCr -> FDCT ->
    Huffman path and decode back through Huffman -> IDCT -> YCbCr->RGB.
    The oracle recomputes each block's decoded RGB with the SAME
    double-precision arithmetic (BT.601 terms in the same order,
    banker's rounding via round_even) and aggregates per-channel means —
    matching proves the entire lossy color chain, not just headers.
    std is omitted: pixel count per image is 192*blocks (not a power of
    two), so a global std is not exactly representable cross-engine."""
    import numpy as np
    import pandas as pd

    from timefence_spark.operators import codecs, multimodal

    flat_q = np.full((8, 8), 8, np.int32)

    def gen(it):
        for pdf in it:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                bw, bh = d % 2 + 1, (d // 2) % 2 + 1
                img = np.empty((bh * 8, bw * 8, 3), np.uint8)
                for bi in range(bh):
                    for bj in range(bw):
                        blk = img[bi * 8 : bi * 8 + 8, bj * 8 : bj * 8 + 8]
                        base = d * 7 + bi * 16 + bj * 29
                        blk[:, :, 0] = base % 255 + 1
                        blk[:, :, 1] = (base + 97) % 255 + 1
                        blk[:, :, 2] = (base + 173) % 255 + 1
                payloads.append(codecs.jpeg_encode_rgb(img, quant=flat_q))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].values, "payload": payloads}
            )

    planted = (
        _t(spark, sf_dir, "documents", spread=False)
        .select("doc_id")
        .mapInPandas(gen, "doc_id long, payload binary")
    )
    info = multimodal.decode_images(
        planted, id_col="doc_id", binary_col="payload",
        decode_fn=codecs.jpeg_decode_info,
    )
    stats = multimodal.image_channel_stats(
        planted, id_col="doc_id", binary_col="payload",
        stats_fn=codecs.jpeg_channel_stats,
    )
    return info.join(stats, "doc_id").select(
        "doc_id", "width", "height", "channels", "format",
        F.round("mean_r", 6).alias("mean_r"),
        F.round("mean_g", 6).alias("mean_g"),
        F.round("mean_b", 6).alias("mean_b"),
    )


ORACLE_MEDIA_DECODE_JPEG_RGB = """
    WITH blocks AS (
        SELECT d.doc_id,
               CAST((d.doc_id * 7 + bi.i * 16 + bj.j * 29) % 255 + 1
                    AS DOUBLE) AS r0,
               CAST((d.doc_id * 7 + bi.i * 16 + bj.j * 29 + 97) % 255 + 1
                    AS DOUBLE) AS g0,
               CAST((d.doc_id * 7 + bi.i * 16 + bj.j * 29 + 173) % 255 + 1
                    AS DOUBLE) AS b0
        FROM documents d,
             unnest(range(0, (d.doc_id // 2) % 2 + 1)) AS bi(i),
             unnest(range(0, d.doc_id % 2 + 1)) AS bj(j)
    ), ycc AS (
        -- encoder: BT.601 full-range, same term order; flat-8 quant on a
        -- uniform block keeps only the DC, which quantizes to
        -- round_even(channel) (numpy banker's rounding)
        SELECT doc_id,
               round_even(0.299 * r0 + 0.587 * g0 + 0.114 * b0 - 128.0, 0) AS yq,
               round_even(-0.168736 * r0 - 0.331264 * g0 + 0.5 * b0, 0) AS cbq,
               round_even(0.5 * r0 - 0.418688 * g0 - 0.081312 * b0, 0) AS crq
        FROM blocks
    ), px AS (
        -- decoder: level shift, YCbCr->RGB in the same order, one final
        -- banker's round + clamp
        SELECT doc_id,
               LEAST(GREATEST(round_even(yq + 128.0 + 1.402 * crq, 0), 0), 255) AS rr,
               LEAST(GREATEST(round_even(yq + 128.0 - 0.344136 * cbq
                                          - 0.714136 * crq, 0), 0), 255) AS gg,
               LEAST(GREATEST(round_even(yq + 128.0 + 1.772 * cbq, 0), 0), 255) AS bb
        FROM ycc
    )
    SELECT doc_id,
           CAST((doc_id % 2 + 1) * 8 AS INT) AS width,
           CAST(((doc_id // 2) % 2 + 1) * 8 AS INT) AS height,
           3 AS channels,
           'jpeg' AS format,
           ROUND(AVG(rr), 6) AS mean_r,
           ROUND(AVG(gg), 6) AS mean_g,
           ROUND(AVG(bb), 6) AS mean_b
    FROM px
    GROUP BY doc_id
"""


def q_media_decode_jpeg_420(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHROMA-SUBSAMPLED (4:2:0) baseline JPEG — the layout most
    real-world JPEGs use — under the differential gate. Images are
    uniform per 16x16 MCU tile (power-of-two MCU grids, channel values
    pairwise distinct as in the 4:4:4 entry), so the 2x2 chroma box
    mean is the identity, every block carries only a DC coefficient,
    and the decoded value follows the same round_even chain; the MCU
    interleave (4 Y blocks + Cb + Cr), the subsampled-chroma planes and
    the nearest-neighbor upsample are all exercised for real."""
    import numpy as np
    import pandas as pd

    from timefence_spark.operators import codecs, multimodal

    flat_q = np.full((8, 8), 8, np.int32)

    def gen(it):
        for pdf in it:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                mw, mh = d % 2 + 1, (d // 2) % 2 + 1  # MCUs across / down
                img = np.empty((mh * 16, mw * 16, 3), np.uint8)
                for bi in range(mh):
                    for bj in range(mw):
                        blk = img[
                            bi * 16 : bi * 16 + 16, bj * 16 : bj * 16 + 16
                        ]
                        base = d * 7 + bi * 16 + bj * 29
                        blk[:, :, 0] = base % 255 + 1
                        blk[:, :, 1] = (base + 97) % 255 + 1
                        blk[:, :, 2] = (base + 173) % 255 + 1
                payloads.append(
                    codecs.jpeg_encode_rgb(img, quant=flat_q, subsample="420")
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].values, "payload": payloads}
            )

    planted = (
        _t(spark, sf_dir, "documents", spread=False)
        .select("doc_id")
        .mapInPandas(gen, "doc_id long, payload binary")
    )
    info = multimodal.decode_images(
        planted, id_col="doc_id", binary_col="payload",
        decode_fn=codecs.jpeg_decode_info,
    )
    stats = multimodal.image_channel_stats(
        planted, id_col="doc_id", binary_col="payload",
        stats_fn=codecs.jpeg_channel_stats,
    )
    return info.join(stats, "doc_id").select(
        "doc_id", "width", "height", "channels", "format",
        F.round("mean_r", 6).alias("mean_r"),
        F.round("mean_g", 6).alias("mean_g"),
        F.round("mean_b", 6).alias("mean_b"),
    )


ORACLE_MEDIA_DECODE_JPEG_420 = """
    WITH blocks AS (
        SELECT d.doc_id,
               CAST((d.doc_id * 7 + bi.i * 16 + bj.j * 29) % 255 + 1
                    AS DOUBLE) AS r0,
               CAST((d.doc_id * 7 + bi.i * 16 + bj.j * 29 + 97) % 255 + 1
                    AS DOUBLE) AS g0,
               CAST((d.doc_id * 7 + bi.i * 16 + bj.j * 29 + 173) % 255 + 1
                    AS DOUBLE) AS b0
        FROM documents d,
             unnest(range(0, (d.doc_id // 2) % 2 + 1)) AS bi(i),
             unnest(range(0, d.doc_id % 2 + 1)) AS bj(j)
    ), ycc AS (
        SELECT doc_id,
               round_even(0.299 * r0 + 0.587 * g0 + 0.114 * b0 - 128.0, 0) AS yq,
               round_even(-0.168736 * r0 - 0.331264 * g0 + 0.5 * b0, 0) AS cbq,
               round_even(0.5 * r0 - 0.418688 * g0 - 0.081312 * b0, 0) AS crq
        FROM blocks
    ), px AS (
        SELECT doc_id,
               LEAST(GREATEST(round_even(yq + 128.0 + 1.402 * crq, 0), 0), 255) AS rr,
               LEAST(GREATEST(round_even(yq + 128.0 - 0.344136 * cbq
                                          - 0.714136 * crq, 0), 0), 255) AS gg,
               LEAST(GREATEST(round_even(yq + 128.0 + 1.772 * cbq, 0), 0), 255) AS bb
        FROM ycc
    )
    SELECT doc_id,
           CAST((doc_id % 2 + 1) * 16 AS INT) AS width,
           CAST(((doc_id // 2) % 2 + 1) * 16 AS INT) AS height,
           3 AS channels,
           'jpeg' AS format,
           ROUND(AVG(rr), 6) AS mean_r,
           ROUND(AVG(gg), 6) AS mean_g,
           ROUND(AVG(bb), 6) AS mean_b
    FROM px
    GROUP BY doc_id
"""


def q_line_dedup_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same query, key_by='hash': the winner aggregation and attach-back
    join key on a 128-bit line hash instead of the line text. Shares the
    text-mode oracle — identical output IS the correctness claim for
    the hash keying."""
    docs = _t(spark, sf_dir, "documents", spread=False).select(
        "doc_id",
        F.regexp_replace("text", r"(\w+ \w+ \w+) ", "$1\n").alias("text"),
    )
    return text.line_dedup(docs, id_col="doc_id", text_col="text", key_by="hash")


ORACLE_LINE_DEDUP = r"""
    WITH p AS (
        SELECT doc_id,
               string_split(
                   regexp_replace(text, '(\w+ \w+ \w+) ', '\1' || chr(10), 'g'),
                   chr(10)
               ) AS l
        FROM documents
    ), e AS (
        SELECT doc_id, l[i + 1] AS line, i AS pos
        FROM p, unnest(range(0, len(l))) AS t(i)
    ), k AS (
        SELECT doc_id, line, pos,
               len(line) < 10 OR ROW_NUMBER() OVER (
                   PARTITION BY line ORDER BY doc_id ASC, pos ASC
               ) = 1 AS keep
        FROM e
    ), rebuilt AS (
        SELECT doc_id,
               COUNT(*) AS n_lines,
               COUNT(*) FILTER (keep) AS n_kept,
               COALESCE(
                   string_agg(CASE WHEN keep THEN line END, chr(10)
                              ORDER BY pos),
                   ''
               ) AS text
        FROM k GROUP BY doc_id
    )
    SELECT d.doc_id, COALESCE(r.text, '') AS text,
           COALESCE(r.n_lines, 0) AS n_lines,
           COALESCE(r.n_kept, 0) AS n_kept
    FROM documents d LEFT JOIN rebuilt r USING (doc_id)
"""


def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pile-style mixture weighting: per-language sampling rates decided
    by the salted portable hash (en 100%, de/fr 40%, others 10%)."""
    from timefence_spark.operators import sampling

    docs = _t(spark, sf_dir, "documents", spread=False)
    return sampling.mixture_sample(
        docs.select("doc_id", "lang", "source"),
        id_col="doc_id", strata_col="lang",
        fractions={"en": 1.0, "de": 0.4, "fr": 0.4},
        default_fraction=0.1, salt="mix", hash_fn="md5",
    )


ORACLE_MIXTURE_SAMPLE = f"""
    SELECT doc_id, lang, source FROM documents
    WHERE {_duck_md5_hash("doc_id", "mix")} % 1000000 <
          CASE lang WHEN 'de' THEN 400000 WHEN 'en' THEN 1000000
                    WHEN 'fr' THEN 400000 ELSE 100000 END
"""


def q_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dolma-style token-budget mixing: keep each language's hash-order
    document prefix within a per-language token quota (n_chars as the
    weight column; en 20K, de 8K, other languages unlimited). The
    running sum is the two-phase bucketed decomposition — the oracle
    replays it as ONE window over the identical (bucket, hash, id) total
    order, pinning the decomposition's exactness."""
    from timefence_spark.operators import sampling

    docs = _t(spark, sf_dir, "documents", spread=False)
    return sampling.token_budget_sample(
        docs.select("doc_id", "lang", "source", "n_chars"),
        id_col="doc_id", token_col="n_chars", strata_col="lang",
        budgets={"en": 20_000, "de": 8_000}, default_budget=None,
        salt="mix", hash_fn="md5", n_buckets=8,
    )  # n_buckets tunes parallelism only; the oracle is bucket-free


def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance log-weights (Xie et al. 2023): hashed 1-2-gram
    bucket multinomials fitted on the raw corpus and a trusted target
    slice (doc_id % 7 == 0), per-document log-likelihood ratio. The
    oracle replays tokenize -> gram -> hash-bucket -> smoothed
    distributions -> bucket-ordered contribution fold exactly (portable
    md5 buckets, deterministic fold)."""
    from timefence_spark.operators import sampling

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    target = docs.where(F.col("doc_id") % 7 == 0)
    return sampling.dsir_weights(
        docs, target, id_col="doc_id", text_col="text", buckets=1000,
        hash_fn="md5", deterministic=True,
    )


def q_dsir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR resampling: Gumbel top-20 over the importance weights, with
    the Gumbel noise derived from the salted id hash — fully
    deterministic, so the oracle replays weighting AND selection."""
    from timefence_spark.operators import sampling

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    target = docs.where(F.col("doc_id") % 7 == 0)
    return sampling.dsir_sample(
        docs, target, id_col="doc_id", text_col="text", n=20,
        buckets=1000, hash_fn="md5", deterministic=True,
    ).select("doc_id", "log_weight", "sample_rank")


_DSIR_CORE_SQL = """
    d AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\\s+'),
                           t -> t != '') AS toks
        FROM documents
    ), g AS (
        SELECT doc_id, unnest(list_concat(toks,
            list_transform(range(1, len(toks)),
                           i -> toks[i] || ' ' || toks[i + 1]))) AS gram
        FROM d
    ), b AS (
        SELECT doc_id,
               CAST(concat('0x', substr(md5(gram || ':dsir'), 1, 15))
                    AS BIGINT) % 1000 AS bucket
        FROM g
    ), feats AS (
        SELECT doc_id, bucket, count(*) AS cnt FROM b GROUP BY 1, 2
    ), rdist AS (
        SELECT bucket, SUM(cnt) AS rn FROM feats GROUP BY 1
    ), tdist AS (
        SELECT bucket, SUM(cnt) AS tn FROM feats
        WHERE doc_id % 7 = 0 GROUP BY 1
    ), tot AS (
        SELECT (SELECT SUM(rn) FROM rdist) AS R,
               (SELECT COALESCE(SUM(tn), 0) FROM tdist) AS T
    ), lr AS (
        -- exact Spark term order: ln(t+k) - ln(r+k) - ln(T+kB) + ln(R+kB)
        SELECT r.bucket,
               LN(COALESCE(t.tn, 0) + 1.0) - LN(r.rn + 1.0)
               - LN(T + 1000.0) + LN(R + 1000.0) AS lr
        FROM rdist r LEFT JOIN tdist t USING (bucket) CROSS JOIN tot
    ), scored AS (
        SELECT f.doc_id, CAST(SUM(f.cnt) AS BIGINT) AS n_grams,
               ROUND(list_reduce(list_transform(
                   list(struct_pack(b := f.bucket, x := f.cnt * lr.lr)
                        ORDER BY f.bucket),
                   s -> s.x), (a, b) -> a + b), 6) AS log_weight
        FROM feats f JOIN lr USING (bucket)
        GROUP BY f.doc_id
    )
"""

ORACLE_DSIR_WEIGHTS = f"""
    WITH {_DSIR_CORE_SQL}
    SELECT doc_id, n_grams, log_weight FROM scored
"""

ORACLE_DSIR_SAMPLE = f"""
    WITH {_DSIR_CORE_SQL}, gum AS (
        SELECT doc_id, log_weight,
               ROUND(log_weight - LN(-LN(
                   ((CAST(concat('0x', substr(md5(doc_id::VARCHAR
                        || ':dsir|gumbel'), 1, 15)) AS BIGINT) % 1000000)
                    + 0.5) / 1000000.0)), 6) AS key
        FROM scored
    ), ranked AS (
        SELECT doc_id, log_weight,
               ROW_NUMBER() OVER (ORDER BY key DESC, doc_id ASC)
                   AS sample_rank
        FROM gum
    )
    SELECT doc_id, log_weight, CAST(sample_rank AS INT) AS sample_rank
    FROM ranked WHERE sample_rank <= 20
"""


def q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source weights (new in round 9, the
    Pile/Gopher mixing rule weight ∝ n^(1/T) at T=2 over per-source
    token totals): one stratum aggregation + a one-row broadcast
    normalizing total — no global window, no collect. Feed
    temperature_budgets(total_tokens=...) -> token_budget_sample for the
    full temperature -> budgets -> prefix-selection chain
    (Corpus.mixture_temperature)."""
    from timefence_spark.operators import sampling

    docs = _t(spark, sf_dir, "documents", spread=False)
    return sampling.temperature_weights(
        docs, strata_col="source", token_col="n_chars", temperature=2.0,
    )


ORACLE_TEMPERATURE_MIX = """
    WITH g AS (
        SELECT source AS stratum,
               CAST(SUM(COALESCE(n_chars, 0)) AS BIGINT) AS n
        FROM documents GROUP BY 1
    )
    SELECT stratum, n,
           ROUND(POW(n::DOUBLE, 0.5) / SUM(POW(n::DOUBLE, 0.5)) OVER (), 6)
               AS weight
    FROM g
    """


ORACLE_TOKEN_BUDGET = f"""
    WITH t AS (
        SELECT doc_id, lang, source, n_chars,
               {_duck_md5_hash("doc_id", "mix")} AS h
        FROM documents
    ), o AS (
        SELECT doc_id, lang, source, n_chars,
               SUM(COALESCE(n_chars, 0)) OVER (
                   PARTITION BY lang
                   ORDER BY h, doc_id
                   ROWS UNBOUNDED PRECEDING
               ) AS cum
        FROM t
    )
    SELECT doc_id, lang, source, n_chars FROM o
    WHERE CASE lang
              WHEN 'en' THEN cum <= 20000
              WHEN 'de' THEN cum <= 8000
              ELSE TRUE
          END
"""


def q_unigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style unigram fluency score: mean -ln p(word) per document
    under the corpus's own add-1-smoothed unigram LM. deterministic=True
    folds each document's contributions in sorted-word order so the
    double summation is bit-reproducible against the external oracle."""
    return text.unigram_logprob(
        _t(spark, sf_dir, "documents", spread=False),
        id_col="doc_id", text_col="text", deterministic=True,
    )


ORACLE_UNIGRAM_NLL = r"""
    WITH w AS (
        SELECT doc_id,
               unnest(string_split_regex(lower(text), '\s+')) AS word
        FROM documents
    ), dw AS (
        SELECT doc_id, word, COUNT(*) AS cnt
        FROM w WHERE word <> '' GROUP BY 1, 2
    ), lm AS (
        SELECT word, COUNT(*) AS n FROM w WHERE word <> '' GROUP BY 1
    ), tot AS (
        SELECT CAST(SUM(n) AS DOUBLE) + 1.0 * (COUNT(*) + 1) AS denom
        FROM lm
    ), contrib AS (
        SELECT dw.doc_id, dw.word, dw.cnt,
               dw.cnt * -ln((lm.n + 1.0) / tot.denom) AS c
        FROM dw JOIN lm USING (word) CROSS JOIN tot
    )
    -- list(... ORDER BY word) + list_reduce replays Spark's sorted fold in
    -- the same element order (list_reduce's no-init fold equals the 0.0-init
    -- fold bit-for-bit: 0.0 + x == x for the positive NLL terms).
    SELECT doc_id,
           CAST(SUM(cnt) AS BIGINT) AS n_tokens,
           ROUND(0.0 / SUM(cnt), 6) AS oov_frac,
           ROUND(list_reduce(
               list_transform(
                   list(struct_pack(w := word, c := c) ORDER BY word),
                   s -> s.c
               ), (a, b) -> a + b) / SUM(cnt), 6) AS mean_nll
    FROM contrib
    GROUP BY doc_id
"""


def q_fluency_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style corpus partition into head/middle/tail perplexity
    terciles: unigram mean-NLL per doc (deterministic sorted fold), then
    exact interpolated tercile thresholds broadcast back over the scored
    table as a one-row aggregate."""
    return text.fluency_buckets(
        _t(spark, sf_dir, "documents", spread=False),
        id_col="doc_id", text_col="text", deterministic=True,
    )


ORACLE_FLUENCY_BUCKETS = f"""
    WITH scored AS ({ORACLE_UNIGRAM_NLL}), cuts AS (
        SELECT ROUND(quantile_cont(mean_nll, 1.0/3.0), 6) AS t_lo,
               ROUND(quantile_cont(mean_nll, 2.0/3.0), 6) AS t_hi
        FROM scored
    )
    SELECT doc_id, mean_nll,
           CASE WHEN mean_nll <= t_lo THEN 'head'
                WHEN mean_nll <= t_hi THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM scored CROSS JOIN cuts
"""


def q_fluency_buckets_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language CCNet terciles: thresholds computed within each lang
    stratum (a fluent-but-rare language must not sink into a global
    tail), attached with a broadcast equi-join on the strata-sized cut
    table."""
    return text.fluency_buckets(
        _t(spark, sf_dir, "documents", spread=False),
        id_col="doc_id", text_col="text", strata_col="lang",
        deterministic=True,
    )


ORACLE_FLUENCY_BUCKETS_LANG = f"""
    WITH scored AS ({ORACLE_UNIGRAM_NLL}), lab AS (
        SELECT s.doc_id, d.lang, s.mean_nll
        FROM scored s JOIN documents d USING (doc_id)
    ), cuts AS (
        SELECT lang,
               ROUND(quantile_cont(mean_nll, 1.0/3.0), 6) AS t_lo,
               ROUND(quantile_cont(mean_nll, 2.0/3.0), 6) AS t_hi
        FROM lab GROUP BY 1
    )
    SELECT lab.doc_id, lab.lang, lab.mean_nll,
           CASE WHEN mean_nll <= t_lo THEN 'head'
                WHEN mean_nll <= t_hi THEN 'middle'
                ELSE 'tail' END AS bucket
    -- NULL-safe like the Spark side: a NULL stratum is a real group
    FROM lab JOIN cuts ON lab.lang IS NOT DISTINCT FROM cuts.lang
"""


def q_strip_html(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML boilerplate extraction: each document's text is wrapped in a
    deterministic HTML template (head/style/script noise, comments,
    entities, block tags), then strip_html recovers the text. The oracle
    builds the identical template and replays the identical regex chain
    in DuckDB — byte-for-byte equality of the extracted text is the
    correctness claim (every pattern is Java-regex/RE2-identical)."""
    from timefence_spark.operators.web import strip_html

    docs = _t(spark, sf_dir, "documents", spread=False).select(
        "doc_id",
        F.concat(
            F.lit(
                '<html><head><title>t</title><style>p{color:red}</style>'
                '</head><body><script>var x="<p>no</p>";</script>'
                "<!-- crawler noise --><h1>"
            ),
            F.col("text"),
            F.lit("</h1><p>"),
            F.col("text"),
            F.lit(" &amp; tail &#39;q&#39;&nbsp;end</p><br><div>id="),
            F.col("doc_id").cast("string"),
            F.lit("</div></body></html>"),
        ).alias("text"),
    )
    return strip_html(docs, id_col="doc_id", text_col="text")


def _strip_html_chain_sql(raw_cte: str, carry: str = "") -> str:
    r"""The DuckDB replay of web.strip_html's exact regex chain, as a WITH
    block over ``raw_cte`` (which must emit ``doc_id``, the html as
    ``h``, and any ``carry`` columns to pass through). Factored so every
    entry that composes strip_html (strip_html itself, the WARC ingest
    chain) replays the IDENTICAL steps."""
    c = ("" if not carry else carry + ", ")
    steps = [
        (r"'(?is)<script\b[^>]*>.*?</script\s*>'", "' '"),
        (r"'(?is)<style\b[^>]*>.*?</style\s*>'", "' '"),
        (r"'(?is)<head\b[^>]*>.*?</head\s*>'", "' '"),
        (r"'(?is)<noscript\b[^>]*>.*?</noscript\s*>'", "' '"),
        (r"'(?is)<template\b[^>]*>.*?</template\s*>'", "' '"),
        (r"'(?s)<!--.*?-->'", "' '"),
        (
            r"'(?is)</?(?:p|div|h1|h2|h3|h4|h5|h6|li|ul|ol|tr|table|"
            r"blockquote|pre|section|article|header|footer|form)\b[^>]*>'",
            "chr(10)",
        ),
        (r"'(?is)<br\s*/?>'", "chr(10)"),
        (r"'(?s)<[^>]*>'", "' '"),
    ]
    sql = f"WITH raw AS ({raw_cte})"
    prev = "raw"
    for i, (pat, rep) in enumerate(steps, start=1):
        sql += (
            f",\n    s{i} AS (SELECT doc_id, {c}"
            f"regexp_replace(h, {pat}, {rep}, 'g') AS h FROM {prev})"
        )
        prev = f"s{i}"
    n = len(steps)
    sql += f""",
    s{n + 1} AS (SELECT doc_id, {c}
        replace(replace(replace(replace(replace(replace(replace(replace(replace(h,
            '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#34;', '"'),
            '&apos;', chr(39)), '&#39;', chr(39)), '&nbsp;', ' '),
            '&#160;', ' '), '&amp;', '&') AS h FROM {prev}),
    s{n + 2} AS (SELECT doc_id, {c}regexp_replace(h, '[ \t\r]*\n[\\s]*', chr(10), 'g') AS h FROM s{n + 1}),
    s{n + 3} AS (SELECT doc_id, {c}regexp_replace(h, '[ \t\r]+', ' ', 'g') AS h FROM s{n + 2})
    SELECT doc_id, {c}regexp_replace(h, '^\\s+|\\s+$', '', 'g') AS text
    FROM s{n + 3}
"""
    return sql


ORACLE_STRIP_HTML = _strip_html_chain_sql(
    r"""
        SELECT doc_id,
               '<html><head><title>t</title><style>p{color:red}</style>'
               || '</head><body><script>var x="<p>no</p>";</script>'
               || '<!-- crawler noise --><h1>' || text || '</h1><p>' || text
               || ' &amp; tail &#39;q&#39;&nbsp;end</p><br><div>id='
               || doc_id::VARCHAR || '</div></body></html>' AS h
        FROM documents
    """
)


def q_warc_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full crawl-ingest chain: each document's text becomes an HTML
    page inside an HTTP response inside a per-record-GZIP WARC blob
    (the Common-Crawl container); parse_warc explodes the records,
    http_body strips the HTTP headers as a pure expression, and
    strip_html recovers the text. The oracle rebuilds the expected
    (uri, byte length, extracted text) straight from the documents
    table — matching proves gzip-member framing, WARC header parsing,
    payload slicing, HTTP splitting AND the HTML strip, end to end."""
    from timefence_spark.operators.web import strip_html
    from timefence_spark.sources import warc as warc_mod

    import pandas as pd

    http_prefix = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"

    def gen(it):
        for pdf in it:
            blobs = []
            for d, t in zip(pdf["doc_id"], pdf["text"]):
                d = int(d)
                html = (
                    f"<html><body><h1>doc {d}</h1><p>"
                    + (t or "")
                    + " &amp; crawl</p></body></html>"
                )
                payload = (http_prefix + html).encode("utf-8")
                blobs.append(
                    warc_mod.build_warc(
                        [("response", f"http://corpus.example/{d}", payload)],
                        gzip_members=True,
                    )
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].values, "blob": blobs}
            )

    blobs = (
        _t(spark, sf_dir, "documents", spread=False)
        .select("doc_id", "text")
        .mapInPandas(gen, "doc_id long, blob binary")
    )
    records = warc_mod.parse_warc(blobs, id_col="doc_id", binary_col="blob")
    pages = records.where(F.col("warc_type") == "response").select(
        "doc_id",
        "target_uri",
        "content_length",
        warc_mod.http_body(F.col("payload")).alias("text"),
    )
    return strip_html(pages, id_col="doc_id", text_col="text").select(
        "doc_id", "target_uri", "content_length", "text"
    )


ORACLE_WARC_INGEST_RAW = r"""
        SELECT doc_id,
               'http://corpus.example/' || doc_id::VARCHAR AS target_uri,
               strlen(  -- DuckDB strlen = BYTE length of a VARCHAR
                   'HTTP/1.1 200 OK' || chr(13) || chr(10)
                   || 'Content-Type: text/html' || chr(13) || chr(10)
                   || chr(13) || chr(10)
                   || '<html><body><h1>doc ' || doc_id::VARCHAR || '</h1><p>'
                   || COALESCE(text, '') || ' &amp; crawl</p></body></html>'
               )::BIGINT AS content_length,
               '<html><body><h1>doc ' || doc_id::VARCHAR || '</h1><p>'
               || COALESCE(text, '') || ' &amp; crawl</p></body></html>' AS h
        FROM documents
    """


def q_bigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-shaped interpolated bigram fluency: mean -ln(0.5 * p_bi +
    0.5 * p_uni) per document over bigram transitions, both LMs the
    corpus's own statistics (add-1 unigram backoff). deterministic=True
    folds contributions in (w_prev, word)-sorted order so the double
    summation is bit-reproducible against the external oracle."""
    return text.bigram_logprob(
        _t(spark, sf_dir, "documents", spread=False),
        id_col="doc_id", text_col="text", lam=0.5, deterministic=True,
    )


ORACLE_BIGRAM_NLL = r"""
    WITH t AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\s+'),
                           tok -> tok <> '') AS toks
        FROM documents
    ), pairs AS (
        SELECT doc_id, toks[i - 1] AS w_prev, toks[i] AS word
        FROM t, unnest(range(2, len(toks) + 1)) AS u(i)
        WHERE len(toks) >= 2
    ), dp AS (
        SELECT doc_id, w_prev, word, COUNT(*) AS cnt
        FROM pairs GROUP BY 1, 2, 3
    ), bi AS (
        SELECT w_prev, word, COUNT(*) AS n_bi FROM pairs GROUP BY 1, 2
    ), ctx AS (
        SELECT w_prev, SUM(n_bi) AS n_ctx FROM bi GROUP BY 1
    ), uni AS (
        SELECT word, COUNT(*) AS n
        FROM (SELECT unnest(string_split_regex(lower(text), '\s+')) AS word
              FROM documents)
        WHERE word <> '' GROUP BY 1
    ), tot AS (
        SELECT CAST(SUM(n) AS DOUBLE) + 1.0 * (COUNT(*) + 1) AS denom
        FROM uni
    ), contrib AS (
        SELECT dp.doc_id, dp.w_prev, dp.word, dp.cnt,
               bi.n_bi IS NULL AS oov,
               dp.cnt * -ln(
                   0.5 * COALESCE(CAST(bi.n_bi AS DOUBLE)
                                  / CAST(ctx.n_ctx AS DOUBLE), 0.0)
                   + 0.5 * ((COALESCE(uni.n, 0) + 1.0) / tot.denom)
               ) AS c
        FROM dp
        LEFT JOIN bi USING (w_prev, word)
        LEFT JOIN ctx USING (w_prev)
        LEFT JOIN uni USING (word)
        CROSS JOIN tot
    )
    SELECT doc_id,
           CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
           ROUND(SUM(CASE WHEN oov THEN cnt ELSE 0 END)::DOUBLE
                 / SUM(cnt), 6) AS oov_frac,
           ROUND(list_reduce(
               list_transform(
                   list(struct_pack(p := w_prev, w := word, c := c)
                        ORDER BY w_prev, word),
                   s -> s.c
               ), (a, b) -> a + b) / SUM(cnt), 6) AS mean_nll
    FROM contrib
    GROUP BY doc_id
"""


def q_trigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated KNESER-NEY trigram fluency (new in round 12, VERDICT
    r11 item 6): mean -ln p3 per document where p3 discounts the
    trigram count (D=0.75) and backs off through continuation-count
    bigram KN to an add-1 continuation unigram — KenLM's smoothing
    family at the trigram rung of the CCNet ladder; see
    operators/text.trigram_logprob for the formula and the
    vocabulary-scale statistics derivation. deterministic=True folds
    contributions in (w1, w2, word)-sorted order so the double
    summation is bit-reproducible against the external oracle."""
    return text.trigram_logprob(
        _t(spark, sf_dir, "documents", spread=False),
        id_col="doc_id", text_col="text", discount=0.75,
        deterministic=True,
    )


ORACLE_TRIGRAM_NLL = r"""
    WITH t AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\s+'),
                           tok -> tok <> '') AS toks
        FROM documents
    ), tris AS (
        SELECT doc_id, toks[i - 2] AS w1, toks[i - 1] AS w2,
               toks[i] AS word
        FROM t, unnest(range(3, len(toks) + 1)) AS u(i)
        WHERE len(toks) >= 3
    ), dp AS (
        SELECT doc_id, w1, w2, word, COUNT(*) AS cnt
        FROM tris GROUP BY 1, 2, 3, 4
    ), tri AS (
        SELECT w1, w2, word, COUNT(*) AS n_tri FROM tris GROUP BY 1, 2, 3
    ), ctx3 AS (
        SELECT w1, w2, SUM(n_tri) AS n_ctx3, COUNT(*) AS t_ctx3
        FROM tri GROUP BY 1, 2
    ), cbi AS (
        SELECT w2, word, COUNT(*) AS n_cbi FROM tri GROUP BY 1, 2
    ), cctx AS (
        SELECT w2, SUM(n_cbi) AS n_cctx, COUNT(*) AS t_cctx
        FROM cbi GROUP BY 1
    ), pairs AS (
        SELECT toks[i - 1] AS w_prev, toks[i] AS word
        FROM t, unnest(range(2, len(toks) + 1)) AS u(i)
        WHERE len(toks) >= 2
    ), bi AS (
        SELECT w_prev, word FROM pairs GROUP BY 1, 2
    ), cuni AS (
        SELECT word, COUNT(*) AS n_cu FROM bi GROUP BY 1
    ), tot AS (
        SELECT CAST(SUM(n_cu) AS DOUBLE) + 1.0 * (COUNT(*) + 1) AS denom1
        FROM cuni
    ), contrib AS (
        SELECT dp.doc_id, dp.w1, dp.w2, dp.word, dp.cnt,
               tri.n_tri IS NULL AS oov,
               dp.cnt * -ln(
                   CASE WHEN ctx3.n_ctx3 IS NOT NULL THEN
                       (GREATEST(COALESCE(tri.n_tri, 0)::DOUBLE - 0.75,
                                 0.0)
                        + 0.75 * ctx3.t_ctx3::DOUBLE * (
                            CASE WHEN cctx.n_cctx IS NOT NULL THEN
                                (GREATEST(COALESCE(cbi.n_cbi, 0)::DOUBLE
                                          - 0.75, 0.0)
                                 + 0.75 * cctx.t_cctx::DOUBLE
                                   * ((COALESCE(cuni.n_cu, 0) + 1.0)
                                      / tot.denom1))
                                / cctx.n_cctx::DOUBLE
                            ELSE (COALESCE(cuni.n_cu, 0) + 1.0)
                                 / tot.denom1 END))
                       / ctx3.n_ctx3::DOUBLE
                   ELSE
                       CASE WHEN cctx.n_cctx IS NOT NULL THEN
                           (GREATEST(COALESCE(cbi.n_cbi, 0)::DOUBLE
                                     - 0.75, 0.0)
                            + 0.75 * cctx.t_cctx::DOUBLE
                              * ((COALESCE(cuni.n_cu, 0) + 1.0)
                                 / tot.denom1))
                           / cctx.n_cctx::DOUBLE
                       ELSE (COALESCE(cuni.n_cu, 0) + 1.0)
                            / tot.denom1 END
                   END
               ) AS c
        FROM dp
        LEFT JOIN tri USING (w1, w2, word)
        LEFT JOIN ctx3 USING (w1, w2)
        LEFT JOIN cbi ON cbi.w2 = dp.w2 AND cbi.word = dp.word
        LEFT JOIN cctx ON cctx.w2 = dp.w2
        LEFT JOIN cuni ON cuni.word = dp.word
        CROSS JOIN tot
    )
    SELECT doc_id,
           CAST(SUM(cnt) AS BIGINT) AS n_trigrams,
           ROUND(SUM(CASE WHEN oov THEN cnt ELSE 0 END)::DOUBLE
                 / SUM(cnt), 6) AS oov_frac,
           ROUND(list_reduce(
               list_transform(
                   list(struct_pack(a := w1, b := w2, w := word, c := c)
                        ORDER BY w1, w2, word),
                   s -> s.c
               ), (a, b) -> a + b) / SUM(cnt), 6) AS mean_nll
    FROM contrib
    GROUP BY doc_id
"""


NGRAM_NLL_N = 5
NGRAM_NLL_MIN_COUNT = 2


def q_ngram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KenLM-grade interpolated Kneser-Ney 5-GRAM fluency (new in round
    13, VERDICT r12 item 5): mean -ln p5 per document, discounted raw
    counts at the top order backing off through three continuation-
    count KN rungs to the add-1 continuation unigram — the published
    CCNet filter's order (Wenzek et al. 2020 filter on a 5-gram KenLM)
    with min_count=2 KenLM-style pruning on every order >= 3 type table
    (the floor that bounds high-order tables at web scale; pruned grams
    score through backoff). See operators/text.ngram_logprob — all
    statistics derive from the 4 gram-TYPE tables with vocabulary-scale
    aggregations. deterministic=True folds contributions gram-sorted so
    the double summation is bit-reproducible against the oracle."""
    return text.ngram_logprob(
        _t(spark, sf_dir, "documents", spread=False),
        id_col="doc_id", text_col="text", n=NGRAM_NLL_N,
        min_count=NGRAM_NLL_MIN_COUNT, deterministic=True,
    )


def q_fluency_buckets_5gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet terciles at the filter's PUBLISHED shape (new in round 13):
    the 5-gram Kneser-Ney scorer (ngram_nll's exact configuration —
    min_count=2 pruning, deterministic fold) feeding the same exact
    interpolated-percentile head/middle/tail cut as the unigram entry.
    One scored subtree + a one-row broadcast threshold aggregate."""
    return text.fluency_buckets(
        _t(spark, sf_dir, "documents", spread=False),
        id_col="doc_id", text_col="text", model=f"{NGRAM_NLL_N}gram",
        min_count=NGRAM_NLL_MIN_COUNT, deterministic=True,
    )


def _oracle_fluency_buckets_5gram_sql() -> str:
    """The ngram_nll replay as the scored CTE + the tercile cut —
    ORACLE_FLUENCY_BUCKETS' shape over the 5-gram KN scorer."""
    scored = _oracle_ngram_nll_sql(NGRAM_NLL_N, NGRAM_NLL_MIN_COUNT)
    return f"""
    WITH scored AS ({scored}), cuts AS (
        SELECT ROUND(quantile_cont(mean_nll, 1.0/3.0), 6) AS t_lo,
               ROUND(quantile_cont(mean_nll, 2.0/3.0), 6) AS t_hi
        FROM scored
    )
    SELECT doc_id, mean_nll,
           CASE WHEN mean_nll <= t_lo THEN 'head'
                WHEN mean_nll <= t_hi THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM scored CROSS JOIN cuts
"""


def _oracle_ngram_nll_sql(n: int, min_count: int) -> str:
    """ORACLE_TRIGRAM_NLL generalized to order n: gram-type CTEs per
    order (HAVING-pruned at >= 3), continuation tables from each
    order-(k+1) TYPE set, and the KN probability chain emitted as a
    nested CASE built bottom-up — the same formula text.ngram_logprob
    evaluates as Spark Columns."""
    names = [f"w{j}" for j in range(1, n)] + ["word"]

    def gram_select(m: int) -> str:
        cols = ", ".join(
            f"toks[i - {m - 1 - j}] AS {c}"
            for j, c in enumerate([f"w{x}" for x in range(1, m)] + ["word"])
        )
        return (
            f"SELECT {cols} FROM t, unnest(range({m}, len(toks) + 1)) "
            f"AS u(i) WHERE len(toks) >= {m}"
        )

    ctes = [
        r"""t AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\s+'),
                           tok -> tok <> '') AS toks
        FROM documents
    )"""
    ]
    dp_cols = ", ".join(names)
    ctes.append(
        f"""dp AS (
        SELECT doc_id, {dp_cols}, COUNT(*) AS cnt
        FROM (SELECT doc_id, {', '.join(
            f'toks[i - {n - 1 - j}] AS {c}' for j, c in enumerate(names)
        )} FROM t, unnest(range({n}, len(toks) + 1)) AS u(i)
              WHERE len(toks) >= {n})
        GROUP BY ALL
    )"""
    )
    # type tables per order (pruned at orders >= 3, like the Spark side)
    for m in range(n, 1, -1):
        mc = f" HAVING COUNT(*) >= {min_count}" if m >= 3 else ""
        cols = ", ".join([f"w{x}" for x in range(1, m)] + ["word"])
        ctes.append(
            f"""tab{m} AS (
        SELECT {cols}, COUNT(*) AS c
        FROM ({gram_select(m)}) GROUP BY ALL{mc}
    )"""
        )
    ctes.append(
        f"""ctxt AS (
        SELECT {', '.join(names[:-1])}, SUM(c) AS n_ctx,
               COUNT(*) AS t_ctx
        FROM tab{n} GROUP BY ALL
    )"""
    )
    for k in range(n - 1, 1, -1):
        src_cols = [f"w{x}" for x in range(2, k + 1)] + ["word"]
        xs = [f"x{j}" for j in range(1, k)] + ["xw"]
        sel = ", ".join(f"{a} AS {b}" for a, b in zip(src_cols, xs))
        ctes.append(
            f"""cont{k} AS (
        SELECT {sel}, COUNT(*) AS n_c
        FROM tab{k + 1} GROUP BY ALL
    )"""
        )
        ctes.append(
            f"""cctx{k} AS (
        SELECT {', '.join(xs[:-1])}, SUM(n_c) AS n_cc,
               COUNT(*) AS t_cc
        FROM cont{k} GROUP BY ALL
    )"""
        )
    ctes.append(
        """cuni AS (
        SELECT word, COUNT(*) AS n_cu FROM tab2 GROUP BY 1
    )"""
    )
    ctes.append(
        """tot AS (
        SELECT CAST(SUM(n_cu) AS DOUBLE) + 1.0 * (COUNT(*) + 1)
               AS denom1
        FROM cuni
    )"""
    )
    # probability chain, bottom-up
    p = "((COALESCE(cuni.n_cu, 0) + 1.0) / tot.denom1)"
    for k in range(2, n):
        seen = (
            f"(GREATEST(COALESCE(cont{k}.n_c, 0)::DOUBLE - 0.75, 0.0) "
            f"+ 0.75 * cctx{k}.t_cc::DOUBLE * {p}) "
            f"/ cctx{k}.n_cc::DOUBLE"
        )
        p = (
            f"(CASE WHEN cctx{k}.n_cc IS NOT NULL THEN {seen} "
            f"ELSE {p} END)"
        )
    top_seen = (
        f"(GREATEST(COALESCE(tab{n}.c, 0)::DOUBLE - 0.75, 0.0) "
        f"+ 0.75 * ctxt.t_ctx::DOUBLE * {p}) / ctxt.n_ctx::DOUBLE"
    )
    p = (
        f"(CASE WHEN ctxt.n_ctx IS NOT NULL THEN {top_seen} "
        f"ELSE {p} END)"
    )
    joins = [
        f"LEFT JOIN tab{n} ON "
        + " AND ".join(f"tab{n}.{c} = dp.{c}" for c in names),
        "LEFT JOIN ctxt ON "
        + " AND ".join(f"ctxt.{c} = dp.{c}" for c in names[:-1]),
    ]
    for k in range(n - 1, 1, -1):
        ctx_names = names[n - k:-1]  # scoring context for order k
        xs = [f"x{j}" for j in range(1, k)]
        joins.append(
            f"LEFT JOIN cont{k} ON "
            + " AND ".join(
                f"cont{k}.{x} = dp.{c}" for x, c in zip(xs, ctx_names)
            )
            + f" AND cont{k}.xw = dp.word"
        )
        joins.append(
            f"LEFT JOIN cctx{k} ON "
            + " AND ".join(
                f"cctx{k}.{x} = dp.{c}" for x, c in zip(xs, ctx_names)
            )
        )
    joins.append("LEFT JOIN cuni ON cuni.word = dp.word")
    joins.append("CROSS JOIN tot")
    dp_refs = ", ".join(f"dp.{c}" for c in names)
    return f"""
    WITH {', '.join(ctes)}, contrib AS (
        SELECT dp.doc_id, {dp_refs}, dp.cnt,
               tab{n}.c IS NULL AS oov,
               dp.cnt * -ln({p}) AS c
        FROM dp
        {' '.join(joins)}
    )
    SELECT doc_id,
           CAST(SUM(cnt) AS BIGINT) AS n_ngrams,
           ROUND(SUM(CASE WHEN oov THEN cnt ELSE 0 END)::DOUBLE
                 / SUM(cnt), 6) AS oov_frac,
           ROUND(list_reduce(
               list_transform(
                   list(struct_pack({', '.join(
                       f'k{j} := w{j}' for j in range(1, n)
                   )}, kw := word, c := c)
                        ORDER BY {', '.join(
                            [f'w{j}' for j in range(1, n)] + ['word']
                        )}),
                   s -> s.c
               ), (a, b) -> a + b) / SUM(cnt), 6) AS mean_nll
    FROM contrib
    GROUP BY doc_id
    """


def q_fit_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Naive-Bayes classifier training: fit (word, weight) log-odds from
    the documents table labeled by lang='en' — the train half of the
    label -> fit -> classifier_score quality loop. One word-keyed
    shuffle with conditional partial sums; class totals attach as a
    one-row broadcast."""
    docs = _t(spark, sf_dir, "documents", spread=False)
    return text.fit_classifier(
        docs.withColumn("__is_en", F.col("lang") == "en"),
        id_col="doc_id", text_col="text", label_col="__is_en",
        smoothing=1.0, min_count=1,
    )


ORACLE_FIT_CLASSIFIER = r"""
    WITH tok AS (
        SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
               unnest(string_split_regex(lower(text), '\s+')) AS word
        FROM documents WHERE lang IS NOT NULL
    ), wc AS (
        SELECT word,
               CAST(SUM(pos) AS BIGINT) AS n_pos,
               CAST(SUM(1 - pos) AS BIGINT) AS n_neg
        FROM tok WHERE word <> '' GROUP BY 1
    ), vocab AS (
        SELECT * FROM wc WHERE n_pos + n_neg >= 1
    ), tot AS (
        SELECT CAST(SUM(n_pos) AS DOUBLE) AS t_pos,
               CAST(SUM(n_neg) AS DOUBLE) AS t_neg,
               CAST(COUNT(*) AS DOUBLE) AS v
        FROM vocab
    )
    SELECT word,
           ROUND(ln((n_pos + 1.0) / (t_pos + 1.0 * v))
                 - ln((n_neg + 1.0) / (t_neg + 1.0 * v)), 6) AS weight,
           n_pos, n_neg
    FROM vocab CROSS JOIN tot
    ORDER BY weight DESC, word ASC
"""


_BM25_QUERY = "spark window join table"
_BM25_K1, _BM25_B = 1.2, 0.75


def q_bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 keyword relevance of every document to a 4-term query
    — corpus subset-pull by topic. Per-term counts are literal
    filter-size expressions in one scan-side projection (zero shuffle);
    corpus stats (N, avgdl, per-term df) reduce to one broadcast row.
    Ordered by doc_id for a deterministic replay."""
    return text.bm25_score(
        _t(spark, sf_dir, "documents", spread=False),
        id_col="doc_id", text_col="text",
        query=_BM25_QUERY, k1=_BM25_K1, b=_BM25_B,
    ).orderBy("doc_id")


def _bm25_oracle() -> str:
    """Build the BM25 oracle for _BM25_QUERY term-by-term in the same
    sorted order the operator folds, so the double summation matches
    bit-for-bit before the 6-place round."""
    terms = sorted({t for t in _BM25_QUERY.lower().split() if t})
    k1, b = _BM25_K1, _BM25_B
    tf_cols = ",\n               ".join(
        "COALESCE(len(list_filter(toks, x -> x = '%s')), 0) AS tf%d"
        % (t, i)
        for i, t in enumerate(terms)
    )
    df_cols = ",\n               ".join(
        "CAST(SUM(CASE WHEN tf%d > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df%d"
        % (i, i)
        for i in range(len(terms))
    )
    matched = " + ".join(
        "(CASE WHEN tf%d > 0 THEN 1 ELSE 0 END)" % i
        for i in range(len(terms))
    )
    score = "\n             + ".join(
        "(CASE WHEN tf%d > 0 THEN"
        " ln(1.0 + (n - df%d + 0.5) / (df%d + 0.5)) * tf%d * %r"
        " / (tf%d + %r * (%r + %r * dl / avgdl)) ELSE 0.0 END)"
        % (i, i, i, i, k1 + 1.0, i, k1, 1.0 - b, b)
        for i in range(len(terms))
    )
    return f"""
    WITH t AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\\s+'),
                           tok -> tok <> '') AS toks
        FROM documents
    ), tf AS (
        SELECT doc_id,
               COALESCE(len(toks), 0) AS dl,
               {tf_cols}
        FROM t
    ), stats AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n,
               AVG(dl) AS avgdl,
               {df_cols}
        FROM tf
    )
    SELECT doc_id,
           CAST({matched} AS INTEGER) AS n_terms_matched,
           ROUND({score}, 6) AS bm25
    FROM tf CROSS JOIN stats
    WHERE {matched} > 0
    ORDER BY doc_id
"""


ORACLE_BM25_RANK = _bm25_oracle()


def q_hybrid_rrf_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE lexical + dense hybrid (new in round 11): seed-document
    expansion — BM25 keyword matches for a topic query fused with the
    exact-cosine neighbors of a seed document (vec_id 0; embeddings and
    documents share the id space), via integer-micros RRF. The shape
    every hybrid search stack runs: a text ranker and a vector ranker
    disagree on scores but agree on ids, and rank fusion needs no score
    calibration."""
    from pyspark.sql.window import Window as W

    from timefence_spark.operators import fusion

    docs = _t(spark, sf_dir, "documents", spread=False)
    lex = text.bm25_score(
        docs, id_col="doc_id", text_col="text",
        query=_BM25_QUERY, k1=_BM25_K1, b=_BM25_B,
    )
    lexr = (
        lex.withColumn(
            "rank",
            F.row_number().over(
                W.orderBy(F.desc("bm25"), F.asc("doc_id"))
            ),
        )
        .where(F.col("rank") <= 10)
        .select(
            F.lit(0).cast("long").alias("query_id"),
            F.col("doc_id").alias("neighbor_id"),
            "rank",
        )
    )
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dense = similarity.cosine_topk(
        emb.where(F.col("vec_id") == 0), emb,
        query_id="vec_id", corpus_id="vec_id", k=10, round_to=4,
        broadcast_queries=True,
    ).select("query_id", "neighbor_id", "rank")
    return fusion.rrf_fuse([lexr, dense], k=60, top_k=5)


ORACLE_HYBRID_RRF_BM25 = f"""
    WITH lex AS (
        SELECT 0::BIGINT AS query_id, doc_id AS neighbor_id,
               ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id ASC) AS rank
        FROM ({_bm25_oracle()})
    ), pairs AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROUND(
                   list_dot_product(q.embedding, c.embedding) /
                   (SQRT(list_dot_product(q.embedding, q.embedding)) *
                    SQRT(list_dot_product(c.embedding, c.embedding))), 4
               ) AS cosine
        FROM embeddings q JOIN embeddings c ON c.vec_id != q.vec_id
        WHERE q.vec_id = 0
    ), dense AS (
        SELECT query_id, neighbor_id, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC
        ) AS rank FROM pairs
    ), terms AS (
        SELECT query_id, neighbor_id,
               CAST(floor(1000000000.0 * 1.0 / (60 + rank) + 0.5)
                    AS BIGINT) AS t
        FROM lex WHERE rank <= 10
        UNION ALL
        SELECT query_id, neighbor_id,
               CAST(floor(1000000000.0 * 1.0 / (60 + rank) + 0.5)
                    AS BIGINT) AS t
        FROM dense WHERE rank <= 10
    ), fused AS (
        SELECT query_id, neighbor_id, SUM(t)::BIGINT AS rrf_micros,
               COUNT(*)::BIGINT AS n_retrievers
        FROM terms GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id, rrf_micros, n_retrievers,
           CAST(rank AS INT) AS rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id
            ORDER BY rrf_micros DESC, neighbor_id ASC) AS rank
        FROM fused)
    WHERE rank <= 5
"""


def q_corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus cleaning — the operators composed the way a real
    pretraining pipeline chains them, under ONE oracle: exact dedup (keep
    min-id per text hash) -> Gopher quality gate -> benchmark
    decontamination (7-gram overlap vs the held-out eval slice) ->
    deterministic train split. Everything stays one lazy DataFrame plan:
    Catalyst sees the whole chain, so column pruning reaches the scan and
    the semi-joins run on ids only.

    The dedup stage reduces to a NARROW id set (`survivor_ids`) before
    fanning out to its three consumers: every consumer then embeds the
    same ids-only aggregation subtree — the canonical form Spark's
    exchange reuse can dedup on a shuffle-sized plan — and even where a
    consumer re-executes it (small inputs broadcast instead), the
    recomputed subtree carries ids, not document text."""
    from timefence_spark.operators import sampling

    docs = _t(spark, sf_dir, "documents", spread=False)
    bench = docs.where(F.col("doc_id") % 50 == 0)
    corpus = docs.where(F.col("doc_id") % 50 != 0)
    survivor_ids = dedup.exact_survivor_ids(
        corpus, id_col="doc_id", content_cols=["text"]
    )
    survivors = corpus.join(survivor_ids, "doc_id", "left_semi")
    quality_ok = (
        text.gopher_quality(
            survivors, id_col="doc_id", text_col="text", min_words=10
        )
        .where(F.col("gopher_pass"))
        .select("doc_id")
    )
    clean_ids = (
        dedup.decontaminate(
            survivors, bench, id_col="doc_id", text_col="text", n=7,
            min_overlap=1, hash_fn="md5",
        )
        .where(~F.col("contaminated"))
        .select("doc_id")
    )
    kept = (
        survivors.join(quality_ok, "doc_id", "left_semi")
        .join(clean_ids, "doc_id", "left_semi")
        .select("doc_id", "lang", "source")
    )
    return sampling.split_by_hash(
        kept,
        id_col="doc_id",
        weights={"train": 0.8, "val": 0.1, "test": 0.1},
        salt="sp",
        hash_fn="md5",
    ).where(F.col("split") == "train")


ORACLE_CORPUS_CLEAN = f"""
    WITH corpus AS (
        SELECT * FROM documents WHERE doc_id % 50 <> 0
    ), survivors AS (
        SELECT c.* FROM corpus c
        JOIN (SELECT md5(text) AS h, MIN(doc_id) AS mid FROM corpus GROUP BY 1) k
          ON md5(c.text) = k.h AND c.doc_id = k.mid
    ), tokq AS (
        SELECT doc_id, text,
               string_split_regex(lower(text), '\\s+') AS toks
        FROM survivors
    ), quality AS (
        SELECT doc_id FROM (
            SELECT doc_id,
                LEN(toks) AS n_words,
                ROUND(list_sum(list_transform(toks, x -> LENGTH(x)))::DOUBLE
                      / LEN(toks), 6) AS mwl,
                ROUND((LENGTH(text) - LENGTH(replace(text, '#', ''))
                       + LEN(regexp_extract_all(text, '\\.\\.\\.|…')))::DOUBLE
                      / LEN(toks), 6) AS sr,
                ROUND(LEN(list_filter(toks,
                      x -> regexp_matches(x, '[a-z]')))::DOUBLE
                      / LEN(toks), 6) AS af,
                LEN(list_filter(list_distinct(toks), x -> list_contains(
                    ['the','and','of','to','in','is','that','it','for','with',
                     'a','an','on','at','by','as','be','are'], x))) AS sh
            FROM tokq)
        WHERE n_words BETWEEN 10 AND 100000
          AND mwl BETWEEN 3.0 AND 10.0 AND sr <= 0.1
          AND af >= 0.8 AND sh >= 2
    ), bg AS (
        SELECT DISTINCT unnest(grams) AS gram FROM (
            SELECT list_distinct([
                array_to_string(toks[i:i+6], ' ')
                FOR i IN range(1, GREATEST(len(toks) - 6, 1) + 1)
            ]) AS grams
            FROM (SELECT string_split_regex(lower(text), '\\s+') AS toks
                  FROM documents WHERE doc_id % 50 = 0))
    ), cg AS (
        SELECT doc_id, list_distinct([
                   array_to_string(toks[i:i+6], ' ')
                   FOR i IN range(1, GREATEST(len(toks) - 6, 1) + 1)
               ]) AS grams
        FROM (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks
              FROM survivors)
    ), contaminated AS (
        SELECT DISTINCT c.doc_id
        FROM (SELECT doc_id,
                     CAST(concat('0x', substr(md5(gram), 1, 15)) AS BIGINT)
                     AS gh
              FROM (SELECT doc_id, unnest(grams) AS gram FROM cg)) c
        JOIN (SELECT DISTINCT
                     CAST(concat('0x', substr(md5(gram), 1, 15)) AS BIGINT)
                     AS gh
              FROM bg) b USING (gh)
    )
    SELECT s.doc_id, s.lang, s.source, 'train' AS split
    FROM survivors s
    JOIN quality USING (doc_id)
    WHERE s.doc_id NOT IN (SELECT doc_id FROM contaminated)
      AND {_duck_md5_hash("s.doc_id", "sp")} % 1000000 >= 100000
      AND {_duck_md5_hash("s.doc_id", "sp")} % 1000000 < 900000
"""


def q_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate kNN via random-hyperplane LSH; fully oracle-checked —
    the DuckDB oracle replays the identical pipeline with the same
    seed-deterministic hyperplanes inlined (see _oracle_knn_lsh_sql)."""
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return similarity.rp_lsh_topk(
        emb.where(F.col("vec_id") < 20), emb,
        query_id="vec_id", corpus_id="vec_id", k=5, bits=4, tables=16,
        dim=64,  # testdata embedding width; skips the per-call dim probe job
        # Default signature_impl='arrow': measured ~2.0s +/- 0.1s warm at
        # sf0.1 vs the expr path's 3-22s JIT-dependent swings. The expr
        # path stays covered by an equality test (tests/test_similarity.py).
    )


def q_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate kNN via an IVF-flat index (portable md5 centroid sample
    -> nearest-centroid assignment -> nprobe probing -> exact re-rank); the
    oracle rebuilds the identical index in DuckDB."""
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return similarity.ivf_topk(
        emb.where(F.col("vec_id") < 20), emb,
        query_id="vec_id", corpus_id="vec_id", k=5, nlist=16, nprobe=4,
        hash_fn="md5",
    )


def q_knn_ivf_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same IVF index through the vectorized kernels: centroid assignment
    is one matmul per Arrow batch (no cross join, no per-id window
    shuffle) and the re-rank scores via einsum. Shares the expr entry's
    DuckDB oracle — verified value-identical at every test SF."""
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return similarity.ivf_topk(
        emb.where(F.col("vec_id") < 20), emb,
        query_id="vec_id", corpus_id="vec_id", k=5, nlist=16, nprobe=4,
        hash_fn="md5", compute="arrow",
    )


def _oracle_knn_ivf_sql(
    k: int = 5, nlist: int = 16, nprobe: int = 4, seed: int = 42,
) -> str:
    cos = (
        "list_dot_product({a}, {b}) / "
        "(SQRT(list_dot_product({a}, {a})) * SQRT(list_dot_product({b}, {b})))"
    )
    return f"""
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), hashed AS (
        SELECT vec_id, v,
               CAST(concat('0x',
                    substr(md5(concat(vec_id::VARCHAR, ':{seed}')), 1, 15))
                    AS BIGINT) AS hh
        FROM e
    ), cent AS (
        SELECT ROW_NUMBER() OVER (ORDER BY hh) - 1 AS centroid_id, v AS cv
        FROM (SELECT * FROM hashed ORDER BY hh LIMIT {nlist})
    ), assigned AS (
        SELECT vec_id, v, centroid_id FROM (
            SELECT e.vec_id, e.v, c.centroid_id,
                   ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
                       {cos.format(a="e.v", b="c.cv")} DESC, c.centroid_id ASC
                   ) AS rn
            FROM e CROSS JOIN cent c
        ) WHERE rn = 1
    ), probes AS (
        SELECT vec_id AS query_id, v AS qv, centroid_id FROM (
            SELECT q.vec_id, q.v, c.centroid_id,
                   ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
                       {cos.format(a="q.v", b="c.cv")} DESC, c.centroid_id ASC
                   ) AS rn
            FROM (SELECT * FROM e WHERE vec_id < 20) q CROSS JOIN cent c
        ) WHERE rn <= {nprobe}
    ), cand AS (
        SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id, p.qv, a.v AS cv
        FROM probes p JOIN assigned a USING (centroid_id)
        WHERE a.vec_id != p.query_id
    ), scored AS (
        SELECT query_id, neighbor_id,
               ROUND({cos.format(a="qv", b="cv")}, 6) AS cosine
        FROM cand
    ), ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC
        ) AS rank FROM scored
    )
    SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= {k}
    """


def q_knn_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantized ANN (the PQ half of FAISS-style IVF-PQ): train
    per-subspace codebooks by portable hash sample, quantize the corpus
    to m=8 4-bit codes, score queries by asymmetric distance over the
    CODES (the compressed representation 100 TB embeddings scan as),
    exact top-5. The oracle replays the whole pipeline — sample, argmin
    encode, LUT scoring — in DuckDB."""
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    book = similarity.pq_train(
        emb, corpus_id="vec_id", m=8, nbits=4, hash_fn="md5",
    )
    codes = similarity.pq_encode(emb, corpus_id="vec_id", codebook=book)
    return similarity.pq_topk(
        emb.where(F.col("vec_id") < 20), codes, book,
        query_id="vec_id", encoded_id="vec_id", k=5,
    )


def _oracle_knn_pq_sql(
    k: int = 5, m: int = 8, nbits: int = 4, seed: int = 42, dim: int = 64,
    rotation: list[list[float]] | None = None,
) -> str:
    dsub = dim // m
    ksub = 2**nbits
    # OPQ-style rotation: a driver-side constant (like the LSH
    # hyperplanes) inlined as a literal matrix; vectors rotate BEFORE
    # the PQ pipeline, mirroring rotate_vectors' validity guard.
    rot_cte = ""
    if rotation is not None:
        mat = "[" + ",".join(
            "[" + ",".join(repr(float(x)) for x in row) + "]"
            for row in rotation
        ) + "]"
        rot_cte = f"""e0 AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), """
        src = f"""(
        SELECT vec_id,
               CASE WHEN v IS NOT NULL AND len(v) = {dim}
                     AND len(list_filter(v, x -> x IS NULL)) = 0
                    THEN list_transform({mat}, r -> list_dot_product(r, v))
               END AS v
        FROM e0
    )"""
    else:
        src = "(SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)"
    cents = []
    for s in range(m):
        a, b = s * dsub + 1, (s + 1) * dsub
        cents.append(f"""h{s} AS (
        SELECT vec_id, v[{a}:{b}] AS sv,
               CAST(concat('0x',
                    substr(md5(concat(vec_id::VARCHAR, ':{seed + s}')), 1, 15))
                    AS BIGINT) AS hh
        FROM ve
    ), c{s} AS (
        SELECT {s} AS sub, ROW_NUMBER() OVER (ORDER BY hh) - 1 AS code,
               sv AS cv
        FROM (SELECT * FROM h{s} ORDER BY hh LIMIT {ksub})
    )""")
    cb_union = " UNION ALL ".join(f"SELECT * FROM c{s}" for s in range(m))
    sl = f"list_slice(v, cb.sub * {dsub} + 1, (cb.sub + 1) * {dsub})"
    slq = f"list_slice(q.v, cb.sub * {dsub} + 1, (cb.sub + 1) * {dsub})"
    return f"""
    WITH {rot_cte}e AS {src}, ve AS (
        -- valid vectors only, mirroring pq_train's filter and
        -- pq_encode's NULL-codes guard (width + no NULL elements)
        SELECT * FROM e
        WHERE v IS NOT NULL AND len(v) = {dim}
          AND len(list_filter(v, x -> x IS NULL)) = 0
    ), {", ".join(cents)}, cb AS (
        {cb_union}
    ), enc AS (
        SELECT vec_id, sub, code FROM (
            SELECT ve.vec_id, cb.sub, cb.code,
                   ROW_NUMBER() OVER (PARTITION BY ve.vec_id, cb.sub ORDER BY
                       0.5 * list_dot_product(cb.cv, cb.cv)
                       - list_dot_product({sl}, cb.cv) ASC,
                       cb.code ASC) AS rn
            FROM ve CROSS JOIN cb
        ) WHERE rn = 1
    ), lut AS (
        SELECT q.vec_id AS query_id,
               SQRT(list_dot_product(q.v, q.v)) AS qn,
               cb.sub, cb.code,
               list_dot_product({slq}, cb.cv) AS d,
               list_dot_product(cb.cv, cb.cv) AS n2
        FROM (SELECT * FROM e WHERE vec_id < 20) q CROSS JOIN cb
    ), contrib AS (
        SELECT l.query_id, l.qn, enc.vec_id AS neighbor_id, l.sub, l.d, l.n2
        FROM enc JOIN lut l USING (sub, code)
        WHERE enc.vec_id != l.query_id
    ), scored AS (
        -- no-init list_reduce over sub-ascending lists == the Spark
        -- left-assoc literal chains (0.0 + x == x).
        SELECT query_id, neighbor_id,
               ROUND(list_reduce(list_transform(
                         list(struct_pack(s := sub, x := d) ORDER BY sub),
                         t -> t.x), (a, b) -> a + b)
                     / (qn * SQRT(list_reduce(list_transform(
                         list(struct_pack(s := sub, x := n2) ORDER BY sub),
                         t -> t.x), (a, b) -> a + b))), 6) AS cosine
        FROM contrib
        GROUP BY query_id, neighbor_id, qn
    ), ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC
        ) AS rank FROM scored
    )
    SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= {k}
    """


def q_knn_pq_opq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPQ-style rotated PQ: a seeded orthogonal rotation (driver-side
    constant, like the LSH hyperplanes) re-mixes coordinates before the
    PQ subspace split — cosine is rotation-invariant, so only the
    quantization geometry changes. The oracle inlines the same rotation
    literals and replays rotate -> train -> encode -> ADC end-to-end."""
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    rot = similarity.opq_train(emb, corpus_id="vec_id", seed=7)
    # No manual pin (VERDICT r10 item 5): the operator owns
    # materialization via its flag — the rotated table feeds three
    # consumers (train, encode, query side), and materialize=True is
    # the documented multi-consumer mode (6.3s unmaterialized vs 3.3s,
    # see rotate_vectors' docstring).
    remb = similarity.rotate_vectors(
        emb, vec_col="embedding", rotation=rot, materialize=True
    )
    book = similarity.pq_train(
        remb, corpus_id="vec_id", m=8, nbits=4, hash_fn="md5",
    )
    codes = similarity.pq_encode(remb, corpus_id="vec_id", codebook=book)
    return similarity.pq_topk(
        remb.where(F.col("vec_id") < 20), codes, book,
        query_id="vec_id", encoded_id="vec_id", k=5,
    )


def q_knn_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full FAISS-style IVF-PQ with RESIDUAL encoding (the default,
    matching faiss.IndexIVFPQ): coarse quantizer prunes candidates to
    nprobe/nlist inverted lists, PQ encodes each row's residual against
    its assigned centroid, ADC scores decompose <q, c_j + r̂> /
    (|q| |c_j + r̂|). Pure ADC (no re-rank) so the composed pipeline —
    coarse sample, list assignment, residual subtract, subspace
    codebooks, argmin encode, LUT + centroid-term scoring — is replayed
    end-to-end by the oracle."""
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return similarity.ivf_pq_topk(
        emb.where(F.col("vec_id") < 20), emb,
        query_id="vec_id", corpus_id="vec_id", k=5, nlist=16, nprobe=4,
        m=8, nbits=4, hash_fn="md5",
    )


def q_knn_ivf_pq_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ with raw-vector encoding (residual=False) — the pre-r10
    geometry, kept oracle-covered because a pre-trained ``codebook=``
    on raw vectors requires it."""
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return similarity.ivf_pq_topk(
        emb.where(F.col("vec_id") < 20), emb,
        query_id="vec_id", corpus_id="vec_id", k=5, nlist=16, nprobe=4,
        m=8, nbits=4, hash_fn="md5", residual=False,
    )


def _oracle_ivf_pq_sql(
    k: int = 5, nlist: int = 16, nprobe: int = 4, m: int = 8,
    nbits: int = 4, seed: int = 42, dim: int = 64,
    residual: bool = True,
) -> str:
    dsub = dim // m
    ksub = 2**nbits
    cos = (
        "list_dot_product({a}, {b}) / "
        "(SQRT(list_dot_product({a}, {a})) * SQRT(list_dot_product({b}, {b})))"
    )
    # Residual mode trains/encodes on rv = v - cv (the row's assigned
    # coarse centroid); raw mode on v itself. Same hash-sample ids.
    enc_tbl = "resid" if residual else "ve"
    enc_vec = "rv" if residual else "v"
    pq_cents = []
    for s in range(m):
        a, b = s * dsub + 1, (s + 1) * dsub
        pq_cents.append(f"""ph{s} AS (
        SELECT vec_id, {enc_vec}[{a}:{b}] AS sv,
               CAST(concat('0x',
                    substr(md5(concat(vec_id::VARCHAR, ':{seed + 101 + s}')),
                           1, 15)) AS BIGINT) AS hh
        FROM {enc_tbl}
    ), pc{s} AS (
        SELECT {s} AS sub, ROW_NUMBER() OVER (ORDER BY hh) - 1 AS code,
               sv AS cv
        FROM (SELECT * FROM ph{s} ORDER BY hh LIMIT {ksub})
    )""")
    cb_union = " UNION ALL ".join(f"SELECT * FROM pc{s}" for s in range(m))
    sl = (
        f"list_slice({enc_vec}, cb.sub * {dsub} + 1, (cb.sub + 1) * {dsub})"
    )
    slq = f"list_slice(q.v, cb.sub * {dsub} + 1, (cb.sub + 1) * {dsub})"
    return f"""
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), ve AS (
        -- valid vectors only, mirroring pq_train's filter and
        -- pq_encode's NULL-codes guard (width + no NULL elements)
        SELECT * FROM e
        WHERE v IS NOT NULL AND len(v) = {dim}
          AND len(list_filter(v, x -> x IS NULL)) = 0
    ), hashed AS (
        SELECT vec_id, v,
               CAST(concat('0x',
                    substr(md5(concat(vec_id::VARCHAR, ':{seed}')), 1, 15))
                    AS BIGINT) AS hh
        FROM e
    ), cent AS (
        SELECT ROW_NUMBER() OVER (ORDER BY hh) - 1 AS centroid_id, v AS cv
        FROM (SELECT * FROM hashed ORDER BY hh LIMIT {nlist})
    ), assigned AS (
        SELECT vec_id, centroid_id FROM (
            SELECT e.vec_id, c.centroid_id,
                   ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
                       {cos.format(a="e.v", b="c.cv")} DESC, c.centroid_id ASC
                   ) AS rn
            FROM e CROSS JOIN cent c
        ) WHERE rn = 1
    ), resid AS (
        -- residual against the ASSIGNED coarse centroid, elementwise in
        -- double (mirrors _RESIDUAL_SQL's zip_with subtract)
        SELECT ve.vec_id,
               list_transform(range(1, {dim + 1}),
                              i -> ve.v[i] - c.cv[i]) AS rv,
               a.centroid_id
        FROM ve JOIN assigned a USING (vec_id) JOIN cent c USING (centroid_id)
    ), probes AS (
        SELECT vec_id AS query_id, centroid_id, qc FROM (
            SELECT q.vec_id, c.centroid_id,
                   list_dot_product(q.v, c.cv) AS qc,
                   ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
                       {cos.format(a="q.v", b="c.cv")} DESC, c.centroid_id ASC
                   ) AS rn
            FROM (SELECT * FROM e WHERE vec_id < 20) q CROSS JOIN cent c
        ) WHERE rn <= {nprobe}
    ), {", ".join(pq_cents)}, cb AS (
        {cb_union}
    ), enc AS (
        SELECT vec_id, sub, code FROM (
            SELECT {enc_tbl}.vec_id, cb.sub, cb.code,
                   ROW_NUMBER() OVER (PARTITION BY {enc_tbl}.vec_id, cb.sub
                       ORDER BY
                       0.5 * list_dot_product(cb.cv, cb.cv)
                       - list_dot_product({sl}, cb.cv) ASC,
                       cb.code ASC) AS rn
            FROM {enc_tbl} CROSS JOIN cb
        ) WHERE rn = 1
    ), centn AS (
        SELECT centroid_id, list_dot_product(cv, cv) AS cn2 FROM cent
    ), cdot AS (
        -- per (coarse list, sub, code) cross term <c_j_sub, r_cent>
        SELECT c.centroid_id, cb.sub, cb.code,
               list_dot_product(
                   list_slice(c.cv, cb.sub * {dsub} + 1,
                              (cb.sub + 1) * {dsub}), cb.cv) AS cd
        FROM cent c CROSS JOIN cb
    ), cand AS (
        SELECT p.query_id, p.qc, a.vec_id AS neighbor_id, a.centroid_id
        FROM probes p JOIN assigned a USING (centroid_id)
        WHERE a.vec_id != p.query_id
    ), lut AS (
        SELECT q.vec_id AS query_id,
               SQRT(list_dot_product(q.v, q.v)) AS qn,
               cb.sub, cb.code,
               list_dot_product({slq}, cb.cv) AS d,
               list_dot_product(cb.cv, cb.cv) AS n2
        FROM (SELECT * FROM e WHERE vec_id < 20) q CROSS JOIN cb
    ), contrib AS (
        SELECT c.query_id, c.qc, l.qn, c.neighbor_id, c.centroid_id,
               l.sub, l.d, l.n2, cd.cd
        FROM cand c
        JOIN enc ON enc.vec_id = c.neighbor_id
        JOIN lut l ON l.query_id = c.query_id
                  AND l.sub = enc.sub AND l.code = enc.code
        JOIN cdot cd ON cd.centroid_id = c.centroid_id
                    AND cd.sub = enc.sub AND cd.code = enc.code
    ), scored AS (
        SELECT query_id, neighbor_id,
               ROUND(({"qc + " if residual else ""}list_reduce(list_transform(
                         list(struct_pack(s := sub, x := d) ORDER BY sub),
                         t -> t.x), (a, b) -> a + b))
                     / (qn * SQRT({"cn.cn2 + 2.0 * "
                         "list_reduce(list_transform("
                         "list(struct_pack(s := sub, x := cd) ORDER BY sub),"
                         " t -> t.x), (a, b) -> a + b) + " if residual
                         else ""}list_reduce(list_transform(
                         list(struct_pack(s := sub, x := n2) ORDER BY sub),
                         t -> t.x), (a, b) -> a + b))), 6) AS cosine
        FROM contrib JOIN centn cn USING (centroid_id)
        GROUP BY query_id, neighbor_id, qn, qc, cn.cn2
    ), ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC
        ) AS rank FROM scored
    )
    SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= {k}
    """


def q_semantic_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic near-dup pairs: deterministic hash-sampled
    centroids (portable md5 mode), shuffle-free literal-centroid
    assignment, within-cluster pairwise cosine >= threshold. The oracle
    rebuilds the identical clustering and pair set in DuckDB. Threshold
    0.4: the synthetic embeddings top out near ~0.51 similarity."""
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return similarity.semantic_dup_pairs(
        emb, id_col="vec_id", n_clusters=16, threshold=0.4, hash_fn="md5",
    )


def q_semantic_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-level benchmark decontamination pairs: the eval slice
    (vec_id % 50 == 0) is held out, centroids sample from the CORPUS
    side only, both sides assign shuffle-free, and the cluster-keyed
    corpus-bench join yields the contamination pairs. The oracle
    replays clustering and pair set exactly (portable md5 sampling)."""
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    corpus = emb.where(F.col("vec_id") % 50 != 0)
    bench = emb.where(F.col("vec_id") % 50 == 0)
    return similarity.semantic_contamination_pairs(
        corpus, bench, id_col="vec_id", n_clusters=16, threshold=0.4,
        hash_fn="md5",
    )


ORACLE_SEMANTIC_DECONTAM = """
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), corpus AS (
        SELECT * FROM e WHERE vec_id % 50 != 0
    ), bench AS (
        SELECT * FROM e WHERE vec_id % 50 = 0
    ), hashed AS (
        SELECT vec_id, v,
               CAST(concat('0x',
                    substr(md5(concat(vec_id::VARCHAR, ':42')), 1, 15))
                    AS BIGINT) AS hh
        FROM corpus
    ), cent AS (
        SELECT ROW_NUMBER() OVER (ORDER BY hh) - 1 AS centroid_id, v AS cv
        FROM (SELECT * FROM hashed ORDER BY hh LIMIT 16)
    ), ac AS (
        SELECT vec_id, v, centroid_id FROM (
            SELECT corpus.vec_id, corpus.v, c.centroid_id,
                   ROW_NUMBER() OVER (PARTITION BY corpus.vec_id ORDER BY
                       list_dot_product(corpus.v, c.cv) /
                       (SQRT(list_dot_product(corpus.v, corpus.v)) *
                        SQRT(list_dot_product(c.cv, c.cv))) DESC,
                       c.centroid_id ASC) AS rn
            FROM corpus CROSS JOIN cent c
        ) WHERE rn = 1
    ), ab AS (
        SELECT vec_id, v, centroid_id FROM (
            SELECT bench.vec_id, bench.v, c.centroid_id,
                   ROW_NUMBER() OVER (PARTITION BY bench.vec_id ORDER BY
                       list_dot_product(bench.v, c.cv) /
                       (SQRT(list_dot_product(bench.v, bench.v)) *
                        SQRT(list_dot_product(c.cv, c.cv))) DESC,
                       c.centroid_id ASC) AS rn
            FROM bench CROSS JOIN cent c
        ) WHERE rn = 1
    )
    SELECT a.vec_id AS corpus_id, b.vec_id AS bench_id,
           a.centroid_id AS cluster_id,
           ROUND(list_dot_product(a.v, b.v) /
                 (SQRT(list_dot_product(a.v, a.v)) *
                  SQRT(list_dot_product(b.v, b.v))), 6) AS cosine
    FROM ac a JOIN ab b ON a.centroid_id = b.centroid_id
    WHERE ROUND(list_dot_product(a.v, b.v) /
                (SQRT(list_dot_product(a.v, a.v)) *
                 SQRT(list_dot_product(b.v, b.v))), 6) >= 0.4
"""


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The survivor set under the pairwise drop-if-smaller-dup policy
    (same canonicalization as minhash_dedup, over semantic pairs)."""
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return similarity.semantic_dedup(
        emb, id_col="vec_id", n_clusters=16, threshold=0.4, hash_fn="md5",
    ).select("vec_id")


def q_semantic_dup_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """semantic_dup_pairs with compute='grouped': the per-cluster
    applyInPandas kernel (vectors cross the wire once per CLUSTER, not
    once per candidate pair; cosine is one in-worker matmul). Shares
    q_semantic_dup_pairs' oracle — producing the identical pair set and
    scores through a different physical kernel IS the correctness claim
    (same pattern as duplicate_spans_hash / line_dedup_hash)."""
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return similarity.semantic_dup_pairs(
        emb, id_col="vec_id", n_clusters=16, threshold=0.4, hash_fn="md5",
        compute="grouped",
    )


def q_semantic_dup_refined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup with ONE Lloyd (k-means) refinement iteration — what the
    paper actually runs (k-means clustering, not a raw sample). The
    oracle replays the ENTIRE refinement deterministically: the sampled
    centroids, the first assignment, the per-(cluster, position) sorted
    0.0-initialized summation that moves each centroid to its cluster
    mean (bit-identical fold order in both engines), the re-assignment
    against the refined centroids, and the within-cluster pair set."""
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return similarity.semantic_dup_pairs(
        emb, id_col="vec_id", n_clusters=8, threshold=0.4, hash_fn="md5",
        refine_iters=1,
    )


def _oracle_semantic_refined_sql(
    *, nlist: int = 8, threshold: float = 0.4, seed: int = 42
) -> str:
    cos = (
        "list_dot_product({a}, {b}) / "
        "(SQRT(list_dot_product({a}, {a})) * SQRT(list_dot_product({b}, {b})))"
    )
    return f"""
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), hashed AS (
        SELECT vec_id, v,
               CAST(concat('0x',
                    substr(md5(concat(vec_id::VARCHAR, ':{seed}')), 1, 15))
                    AS BIGINT) AS hh
        FROM e
    ), cent0 AS (
        SELECT ROW_NUMBER() OVER (ORDER BY hh) - 1 AS centroid_id, v AS cv
        FROM (SELECT * FROM hashed ORDER BY hh LIMIT {nlist})
    ), a0 AS (
        SELECT vec_id, v, centroid_id FROM (
            SELECT e.vec_id, e.v, c.centroid_id,
                   ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
                       {cos.format(a="e.v", b="c.cv")} DESC, c.centroid_id ASC
                   ) AS rn
            FROM e CROSS JOIN cent0 c
        ) WHERE rn = 1
    ), sums AS (
        -- the sorted 0.0-initialized fold replays Spark's
        -- aggregate(array_sort(collect_list(...)), 0.0, +) bit-for-bit
        SELECT centroid_id, u.i AS pos,
               list_reduce(
                   list_prepend(0.0, list(a0.v[u.i] ORDER BY a0.vec_id)),
                   (x, y) -> x + y) AS s,
               COUNT(*) AS c
        FROM a0, unnest(range(1, len(a0.v) + 1)) AS u(i)
        GROUP BY 1, 2
    ), cent1 AS (
        SELECT centroid_id, list(s / c ORDER BY pos) AS mv
        FROM sums GROUP BY 1
    ), cent AS (
        SELECT c0.centroid_id, COALESCE(c1.mv, c0.cv) AS cv
        FROM cent0 c0 LEFT JOIN cent1 c1 USING (centroid_id)
    ), assigned AS (
        SELECT vec_id, v, centroid_id FROM (
            SELECT e.vec_id, e.v, c.centroid_id,
                   ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
                       {cos.format(a="e.v", b="c.cv")} DESC, c.centroid_id ASC
                   ) AS rn
            FROM e CROSS JOIN cent c
        ) WHERE rn = 1
    ), pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               a.centroid_id AS cluster_id,
               ROUND({cos.format(a="a.v", b="b.v")}, 6) AS cosine
        FROM assigned a JOIN assigned b
          ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, cluster_id, cosine FROM pairs
    WHERE cosine >= {threshold}
    """


def _oracle_semantic_sql(
    *, survivors: bool, nlist: int = 16, threshold: float = 0.4, seed: int = 42
) -> str:
    cos = (
        "list_dot_product({a}, {b}) / "
        "(SQRT(list_dot_product({a}, {a})) * SQRT(list_dot_product({b}, {b})))"
    )
    prefix = f"""
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), hashed AS (
        SELECT vec_id, v,
               CAST(concat('0x',
                    substr(md5(concat(vec_id::VARCHAR, ':{seed}')), 1, 15))
                    AS BIGINT) AS hh
        FROM e
    ), cent AS (
        SELECT ROW_NUMBER() OVER (ORDER BY hh) - 1 AS centroid_id, v AS cv
        FROM (SELECT * FROM hashed ORDER BY hh LIMIT {nlist})
    ), assigned AS (
        SELECT vec_id, v, centroid_id FROM (
            SELECT e.vec_id, e.v, c.centroid_id,
                   ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
                       {cos.format(a="e.v", b="c.cv")} DESC, c.centroid_id ASC
                   ) AS rn
            FROM e CROSS JOIN cent c
        ) WHERE rn = 1
    ), pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               a.centroid_id AS cluster_id,
               ROUND({cos.format(a="a.v", b="b.v")}, 6) AS cosine
        FROM assigned a JOIN assigned b
          ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
    )"""
    if survivors:
        return (
            prefix
            + f"""
    SELECT vec_id FROM e
    WHERE vec_id NOT IN (SELECT id_b FROM pairs WHERE cosine >= {threshold})
    """
        )
    return (
        prefix
        + f"""
    SELECT id_a, id_b, cluster_id, cosine FROM pairs
    WHERE cosine >= {threshold}
    """
    )


def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via RP-LSH blocking. The
    hyperplanes are seed-deterministic driver constants, so the oracle
    reproduces the exact blocking + threshold in DuckDB. Threshold 0.4
    because the synthetic embeddings have no pairs above ~0.51."""
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return similarity.embedding_near_dup_pairs(
        emb, id_col="vec_id", threshold=0.4, bits=4, tables=8, dim=64
    )


# ---------------------------------------------------------------------------
# Multimodal (binary-column) plumbing — the payload is synthesized
# deterministically from document text so DuckDB can verify both the pure-
# expression metadata path AND the Arrow-batched mapInPandas decode path.
# ---------------------------------------------------------------------------


def q_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over an opaque binary column (expressions only)."""
    from timefence_spark.operators import multimodal

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    out = multimodal.attach_media_metadata(
        docs, binary_col="payload", media_type="image/png"
    )
    return out.select(
        "doc_id",
        F.col("payload_meta.media_type").alias("media_type"),
        F.col("payload_meta.byte_size").alias("byte_size"),
        F.col("payload_meta.content_sha").alias("content_sha"),
    )


ORACLE_MEDIA_METADATA = """
    SELECT doc_id,
           'image/png' AS media_type,
           octet_length(encode(text)) AS byte_size,
           sha256(text) AS content_sha
    FROM documents
"""


def q_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas decode of binary payloads (deterministic
    stand-in decoder: pseudo-dimensions from the content sha). This puts
    the Python-batch plumbing — schema, batch shape, null handling — under
    the same differential gate as the SQL-expressible operators."""
    from timefence_spark.operators import multimodal

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return multimodal.decode_images(docs, id_col="doc_id", binary_col="payload")


ORACLE_MEDIA_DECODE = """
    SELECT doc_id,
           64 + CAST(concat('0x', substr(sha256(text), 1, 2)) AS INT) % 192 AS width,
           64 + CAST(concat('0x', substr(sha256(text), 3, 2)) AS INT) % 192 AS height,
           3 AS channels,
           'fake' AS format
    FROM documents
"""


def q_media_decode_ppm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL codec under the differential gate: binary Netpbm P6 images
    are planted as expressions (header + uniform 'x' raster, dimensions
    a pure function of doc_id), and the pure-numpy PPM decoder
    (operators/codecs.py) parses them back inside the Arrow-batched
    mapInPandas stage. The oracle recomputes the planted dimensions
    independently — the Spark side must actually parse the bytes to
    match."""
    from timefence_spark.operators import codecs, multimodal

    w = (F.col("doc_id") % 13 + 2).cast("int")
    h = (F.col("doc_id") % 7 + 3).cast("int")
    ppm = F.encode(
        F.concat(
            F.lit("P6\n"),
            w.cast("string"), F.lit(" "), h.cast("string"),
            F.lit("\n255\n"),
            F.repeat(F.lit("x"), w * h * 3),
        ),
        "UTF-8",
    )
    docs = _t(spark, sf_dir, "documents", spread=False).select(
        "doc_id", ppm.alias("payload")
    )
    return multimodal.decode_images(
        docs, id_col="doc_id", binary_col="payload",
        decode_fn=codecs.ppm_decode_info,
    )


ORACLE_MEDIA_DECODE_PPM = """
    SELECT doc_id,
           CAST(doc_id % 13 + 2 AS INT) AS width,
           CAST(doc_id % 7 + 3 AS INT) AS height,
           3 AS channels,
           'ppm' AS format
    FROM documents
"""


def q_media_decode_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMPRESSED format under the differential gate: deterministic
    8-bit RGB PNGs (dimensions and uniform per-channel values pure
    functions of doc_id) are encoded with the Paeth filter in one
    mapInPandas stage, then the stdlib-zlib + numpy PNG decoder
    (operators/codecs.py) inflates, unfilters, and computes per-channel
    stats in the next. The oracle recomputes dimensions AND pixel
    statistics independently — matching proves the inflate+unfilter path
    reconstructed the actual raster, not just the header."""
    import numpy as np
    import pandas as pd

    from timefence_spark.operators import codecs, multimodal

    def gen(it):
        for pdf in it:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = d % 13 + 2, d % 7 + 3
                img = np.empty((h, w, 3), np.uint8)
                img[:, :, 0] = d % 256
                img[:, :, 1] = (d * 3 + 1) % 256
                img[:, :, 2] = (d * 5 + 2) % 256
                payloads.append(codecs.png_encode(img, filter_type=4))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].values, "payload": payloads}
            )

    planted = (
        _t(spark, sf_dir, "documents", spread=False)
        .select("doc_id")
        .mapInPandas(gen, "doc_id long, payload binary")
    )
    info = multimodal.decode_images(
        planted, id_col="doc_id", binary_col="payload",
        decode_fn=codecs.png_decode_info,
    )
    stats = multimodal.image_channel_stats(
        planted, id_col="doc_id", binary_col="payload",
        stats_fn=codecs.png_channel_stats,
    )
    return info.join(stats, "doc_id").select(
        "doc_id", "width", "height", "channels", "format",
        F.round("mean_r", 6).alias("mean_r"),
        F.round("mean_g", 6).alias("mean_g"),
        F.round("mean_b", 6).alias("mean_b"),
        F.round("std_rgb", 6).alias("std_rgb"),
    )


ORACLE_MEDIA_DECODE_PNG = """
    WITH t AS (
        SELECT doc_id,
               CAST(doc_id % 256 AS DOUBLE) AS r,
               CAST((doc_id * 3 + 1) % 256 AS DOUBLE) AS g,
               CAST((doc_id * 5 + 2) % 256 AS DOUBLE) AS b
        FROM documents
    )
    SELECT doc_id,
           CAST(doc_id % 13 + 2 AS INT) AS width,
           CAST(doc_id % 7 + 3 AS INT) AS height,
           3 AS channels,
           'png' AS format,
           ROUND(r, 6) AS mean_r,
           ROUND(g, 6) AS mean_g,
           ROUND(b, 6) AS mean_b,
           ROUND(sqrt((
               (r - (r + g + b) / 3) * (r - (r + g + b) / 3)
             + (g - (r + g + b) / 3) * (g - (r + g + b) / 3)
             + (b - (r + g + b) / 3) * (b - (r + g + b) / 3)
           ) / 3), 6) AS std_rgb
    FROM t
"""


def q_media_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-level media dedup: group payloads by content sha (the
    metadata struct's hash — no decode), survivor = min doc_id. The
    media-column twin of dedup_exact."""
    from timefence_spark.operators import multimodal

    docs = _t(spark, sf_dir, "documents", spread=False).select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    out = multimodal.attach_media_metadata(
        docs, binary_col="payload", media_type="image/png"
    )
    return (
        out.groupBy(F.col("payload_meta.content_sha").alias("content_sha"))
        .agg(F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


ORACLE_MEDIA_DEDUP = """
    SELECT sha256(text) AS content_sha, MIN(doc_id) AS doc_id,
           COUNT(*) AS n_copies
    FROM documents GROUP BY 1
"""


def _hex_chain_frames(data: bytes, _n: int) -> list[bytes]:
    """Portable frame extractor for the oracle-gated entry: frame count and
    frame bytes derive from the payload's sha256 HEX STRING (DuckDB 1.0's
    sha256 only hashes VARCHAR, so the chain must stay in hex-string
    space to be engine-replayable). Production passes an ffmpeg-backed
    extractor; the mapInPandas fan-out shape under test is identical."""
    import hashlib

    hx = hashlib.sha256(data or b"").hexdigest()
    count = 1 + int(hx[4:6], 16) % 4
    return [
        hashlib.sha256((hx + format(i, "02x")).encode()).digest()
        for i in range(count)
    ]


def q_media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling fan-out (one row -> N frame rows via mapInPandas)
    under the differential gate: a hash-chain extractor lets DuckDB replay
    the exact fan-out with a lateral unnest(range(...)). Frames emitted
    as lower-hex for cross-engine comparison."""
    from timefence_spark.operators import multimodal

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    frames = multimodal.sample_frames(
        docs, id_col="doc_id", binary_col="payload",
        extract_fn=_hex_chain_frames,
    )
    return frames.select(
        "doc_id", "frame_idx", F.lower(F.hex("frame")).alias("frame_hex")
    )


ORACLE_MEDIA_FRAMES = """
    WITH h AS (
        SELECT doc_id, sha256(text) AS sha,
               1 + CAST(concat('0x', substr(sha256(text), 5, 2)) AS INT) % 4
                   AS n_frames
        FROM documents
    )
    SELECT doc_id, CAST(i AS INT) AS frame_idx,
           sha256(sha || lpad(to_hex(i), 2, '0')) AS frame_hex
    FROM h, unnest(range(0, n_frames)) AS t(i)
"""


# ---------------------------------------------------------------------------
# LSH oracles — rebuild the seed-deterministic constants (minhash permutation
# pairs, random hyperplanes) in Python and inline them as SQL literals, so
# DuckDB replays the exact candidate generation + verification pipeline.
# ---------------------------------------------------------------------------

# Portable 60-bit md5 hash, bit-identical to the Spark side
# (dedup._content_hash with hash_fn='md5').
_SQL_MD5_60 = "CAST(concat('0x', substr(md5({x}), 1, 15)) AS BIGINT)"
_P31 = (1 << 31) - 1


def _sql_shingles(k: int) -> str:
    """DuckDB expression for dedup.shingles(): word k-shingles, distinct."""
    return (
        "list_distinct([array_to_string(t[i:i+" + str(k - 1) + "], ' ') "
        f"FOR i IN range(1, GREATEST(len(t) - {k - 1}, 1) + 1)])"
    )


def _minhash_pairs_cte(
    num_perm: int = 64, bands: int = 16, shingle_k: int = 3, seed: int = 42,
) -> str:
    """Shared WITH-clause body: documents -> shingles -> portable-hash
    minhash signatures -> banding -> candidate pairs -> exact-Jaccard
    ``verified(id_a, id_b, jaccard)``."""
    from timefence_spark.operators.dedup import _perm_constants

    perms = _perm_constants(num_perm, seed)
    rpb = num_perm // bands
    h = _SQL_MD5_60.format(x="g") + f" % {_P31}"
    sig_terms = ",\n           ".join(
        f"list_min(list_transform(hl, x -> ({a} * x + {b}) % {_P31}))"
        for a, b in perms
    )
    return f"""toks AS (
        SELECT doc_id, string_split_regex(lower(text), '\\s+') AS t FROM documents
    ), sh AS (
        SELECT doc_id, {_sql_shingles(shingle_k)} AS grams FROM toks
    ), hashed AS (
        SELECT doc_id, grams, list_transform(grams, g -> {h}) AS hl FROM sh
    ), sig AS (
        SELECT doc_id, [{sig_terms}] AS sig FROM hashed
    ), bands AS (
        SELECT doc_id,
               concat(b::VARCHAR, ':',
                      array_to_string(sig[b*{rpb}+1 : b*{rpb}+{rpb}], ',')) AS band_key
        FROM sig CROSS JOIN (SELECT unnest(range(0, {bands})) AS b)
    ), cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b
          ON a.band_key = b.band_key AND a.doc_id < b.doc_id
    ), verified AS (
        SELECT c.id_a, c.id_b,
               ROUND(len(list_intersect(ga.grams, gb.grams))::DOUBLE /
                     (len(ga.grams) + len(gb.grams)
                      - len(list_intersect(ga.grams, gb.grams))), 6) AS jaccard
        FROM cand c
        JOIN sh ga ON ga.doc_id = c.id_a
        JOIN sh gb ON gb.doc_id = c.id_b
    )"""


def _oracle_minhash_dedup_sql(
    num_perm: int = 64, bands: int = 16, shingle_k: int = 3,
    threshold: float = 0.7, seed: int = 42,
) -> str:
    return f"""
    WITH {_minhash_pairs_cte(num_perm, bands, shingle_k, seed)}
    SELECT d.doc_id FROM documents d
    WHERE NOT EXISTS (
        SELECT 1 FROM verified v
        WHERE v.jaccard >= {threshold} AND v.id_b = d.doc_id
    )
    """


def _oracle_dedup_components_sql(
    num_perm: int = 64, bands: int = 16, shingle_k: int = 3,
    threshold: float = 0.7, seed: int = 42,
) -> str:
    """Transitive closure over verified pairs via a recursive CTE; the
    component id is the min doc_id reachable (matching the Spark
    min-label-propagation result exactly)."""
    return f"""
    WITH RECURSIVE {_minhash_pairs_cte(num_perm, bands, shingle_k, seed)},
    p AS (
        SELECT id_a, id_b FROM verified WHERE jaccard >= {threshold}
    ), edges AS (
        SELECT id_a AS src, id_b AS dst FROM p
        UNION ALL SELECT id_b, id_a FROM p
    ), reach(src, dst) AS (
        SELECT src, dst FROM edges
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    )
    SELECT d.doc_id,
           LEAST(d.doc_id, COALESCE(MIN(r.dst), d.doc_id)) AS component_id
    FROM documents d LEFT JOIN reach r ON r.src = d.doc_id
    GROUP BY d.doc_id
    """


def _oracle_simhash_pairs_sql(max_hamming: int = 3) -> str:
    h = _SQL_MD5_60.format(x="tok")
    bit_terms = "\n             + ".join(
        f"(CASE WHEN list_sum(list_transform(hl, h -> "
        f"CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END)) > 0 "
        f"THEN {1 << i}::BIGINT ELSE 0::BIGINT END)"
        for i in range(60)
    )
    return f"""
    WITH toks AS (
        SELECT doc_id,
               list_distinct(string_split_regex(lower(text), '\\s+')) AS tk
        FROM documents
    ), hashed AS (
        SELECT doc_id, list_transform(tk, tok -> {h}) AS hl FROM toks
    ), sig AS (
        SELECT doc_id, ({bit_terms}) AS sh FROM hashed
    ), chunks AS (
        SELECT doc_id, sh, c, (sh >> (c * 15)) & 32767 AS chunk
        FROM sig CROSS JOIN (SELECT unnest(range(0, 4)) AS c)
    ), cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                        a.sh AS sa, b.sh AS sb
        FROM chunks a JOIN chunks b
          ON a.c = b.c AND a.chunk = b.chunk AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, bit_count(xor(sa, sb)) AS hamming
    FROM cand WHERE bit_count(xor(sa, sb)) <= {max_hamming}
    """


def _rp_planes(dim: int, bits: int, seed: int) -> list[list[float]]:
    from timefence_spark.operators.similarity import _hyperplanes

    return _hyperplanes(dim, bits, seed)


def _sql_rp_sigs(
    dim: int, bits: int, tables: int, seed: int, src: str = "e"
) -> str:
    """UNION ALL of one bucket-signature SELECT per LSH table, with the
    hyperplane constants inlined (identical floats to the Spark plan)."""
    selects = []
    for t in range(tables):
        planes = _rp_planes(dim, bits, seed + t)
        terms = []
        for i, plane in enumerate(planes):
            lit = "[" + ",".join(repr(float(x)) for x in plane) + "]"
            terms.append(
                f"(CASE WHEN list_dot_product(v, {lit}) >= 0 "
                f"THEN {1 << i} ELSE 0 END)"
            )
        bucket = " + ".join(terms)
        selects.append(
            f"SELECT vec_id, v, {t} AS table_id, {bucket} AS bucket FROM {src}"
        )
    return "\n        UNION ALL ".join(selects)


def _sql_rp_probe_sigs(
    dim: int, bits: int, tables: int, seed: int, probes: int,
    src: str = "e",
) -> str:
    """Query-side MULTIPROBE signatures: per table, the base bucket
    plus the ``probes`` single-bit flips of smallest |margin| (|dot|
    against the flipped plane), ties by bit index — the exact rule of
    similarity._rp_probe_expr / the stable numpy argsort."""
    selects = []
    for t in range(tables):
        planes = _rp_planes(dim, bits, seed + t)
        dots = []
        for i, plane in enumerate(planes):
            lit = "[" + ",".join(repr(float(x)) for x in plane) + "]"
            dots.append(f"list_dot_product(v, {lit}) AS d{i}")
        base = " + ".join(
            f"(CASE WHEN d{i} >= 0 THEN {1 << i} ELSE 0 END)"
            for i in range(bits)
        )
        margs = "[" + ", ".join(
            f"{{'m': abs(d{i}), 'b': {i}}}" for i in range(bits)
        ) + "]"
        buckets = (
            f"list_prepend(base, list_transform("
            f"list_slice(list_sort({margs}), 1, {probes}), "
            "s -> xor(base, (1::BIGINT << s.b))))"
        )
        selects.append(
            f"""SELECT vec_id, v, {t} AS table_id,
                   unnest({buckets}) AS bucket
            FROM (SELECT vec_id, v, CAST(({base}) AS BIGINT) AS base,
                         {', '.join(f'd{i}' for i in range(bits))}
                  FROM (SELECT vec_id, v, {', '.join(dots)}
                        FROM {src}))"""
        )
    return "\n        UNION ALL ".join(selects)


def _oracle_knn_lsh_sql(
    k: int = 5, bits: int = 4, tables: int = 16, dim: int = 64, seed: int = 42,
) -> str:
    return f"""
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), sigs AS (
        {_sql_rp_sigs(dim, bits, tables, seed)}
    ), cand AS (
        SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                        q.v AS qv, c.v AS cv
        FROM sigs q JOIN sigs c
          ON c.table_id = q.table_id AND c.bucket = q.bucket
         AND c.vec_id != q.vec_id
        WHERE q.vec_id < 20
    ), scored AS (
        SELECT query_id, neighbor_id,
               ROUND(list_dot_product(qv, cv) /
                     (SQRT(list_dot_product(qv, qv)) *
                      SQRT(list_dot_product(cv, cv))), 6) AS cosine
        FROM cand
    ), ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC
        ) AS rank FROM scored
    )
    SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= {k}
    """


def q_knn_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiprobe LSH kNN (new in round 11): each query additionally
    probes the 2 buckets reached by flipping its lowest-|margin|
    signature bits per table (Lv et al. 2007, single-bit flips) —
    recall without more tables, and the CORPUS bucket table (the big
    one at scale) is untouched. The oracle replays base + probe bucket
    construction with the same inlined hyperplanes and the same
    (|margin|, bit) tie-break."""
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return similarity.rp_lsh_topk(
        emb.where(F.col("vec_id") < 20), emb,
        query_id="vec_id", corpus_id="vec_id", k=5, bits=6, tables=4,
        dim=64, probes=2,
    )


def _oracle_knn_lsh_multiprobe_sql(
    k: int = 5, bits: int = 6, tables: int = 4, dim: int = 64,
    seed: int = 42, probes: int = 2,
) -> str:
    return f"""
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), qsigs AS (
        {_sql_rp_probe_sigs(dim, bits, tables, seed, probes,
                            src="(SELECT * FROM e WHERE vec_id < 20)")}
    ), csigs AS (
        {_sql_rp_sigs(dim, bits, tables, seed)}
    ), cand AS (
        SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                        q.v AS qv, c.v AS cv
        FROM qsigs q JOIN csigs c
          ON c.table_id = q.table_id AND c.bucket = q.bucket
         AND c.vec_id != q.vec_id
    ), scored AS (
        SELECT query_id, neighbor_id,
               ROUND(list_dot_product(qv, cv) /
                     (SQRT(list_dot_product(qv, qv)) *
                      SQRT(list_dot_product(cv, cv))), 6) AS cosine
        FROM cand
    ), ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC
        ) AS rank FROM scored
    )
    SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= {k}
    """


def _oracle_embedding_near_dup_sql(
    threshold: float = 0.4, bits: int = 4, tables: int = 8, dim: int = 64,
    seed: int = 42,
) -> str:
    return f"""
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), sigs AS (
        {_sql_rp_sigs(dim, bits, tables, seed)}
    ), cand AS (
        SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
                        a.v AS va, b.v AS vb
        FROM sigs a JOIN sigs b
          ON b.table_id = a.table_id AND b.bucket = a.bucket
         AND a.vec_id < b.vec_id
    ), scored AS (
        SELECT id_a, id_b,
               ROUND(list_dot_product(va, vb) /
                     (SQRT(list_dot_product(va, va)) *
                      SQRT(list_dot_product(vb, vb))), 6) AS cosine
        FROM cand
    )
    SELECT id_a, id_b, cosine FROM scored WHERE cosine >= {threshold}
    """


# ---------------------------------------------------------------------------
# Driver contract
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: multi-feature PIT training-set build at sf0.001."""
    return q_pit_multi_feature(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Ordering = the driver's per-round check rotation: the driver
    # verifies a ~50-entry prefix of this dict, so new/changed entries go
    # near the FRONT to land in the checked prefix. Since round 7 this
    # rotation is redundancy, not the only gate — tests/test_oracle.py
    # replays EVERY entry against its DuckDB oracle on each pytest run —
    # but keep the discipline: the driver's run is independent evidence.
    return {
        "hybrid_rrf": q_hybrid_rrf,  # new in round 11
        "hybrid_rrf_bm25": q_hybrid_rrf_bm25,  # new in round 11
        "train_unigram": q_train_unigram,  # new in round 11
        "unigram_encode": q_unigram_encode,  # new in round 11
        "train_wordpiece": q_train_wordpiece,  # new in round 11
        "wordpiece_encode": q_wordpiece_encode,  # new in round 11
        "knn_ivf_pq": q_knn_ivf_pq,  # RESIDUAL encoding since round 10
        "knn_ivf_pq_raw": q_knn_ivf_pq_raw,  # new in round 10
        "knn_pq_opq": q_knn_pq_opq,  # new in round 10
        "dsir_weights": q_dsir_weights,  # new in round 10
        "dsir_sample": q_dsir_sample,  # new in round 10
        "knn_mrl": q_knn_mrl,  # new in round 10
        "knn_rproj": q_knn_rproj,  # new in round 11
        "mmr_rerank": q_mmr_rerank,  # new in round 11
        "knn_lsh_multiprobe": q_knn_lsh_multiprobe,  # new in round 11
        "gram_duplication": q_gram_duplication,  # new in round 10
        "hash_embed": q_hash_embed,  # new in round 12
        "classifier_hashed": q_classifier_hashed,  # new in round 13
        "corpus_stats": q_corpus_stats,  # new in round 10
        "code_signals": q_code_signals,  # new in round 10
        "train_bpe": q_train_bpe,  # new in round 9
        "train_bpe_byte": q_train_bpe_byte,  # new in round 12
        "train_bpe_gpt2": q_train_bpe_gpt2,  # new in round 13
        "bpe_encode": q_bpe_encode,  # new in round 9
        "bpe_encode_trained": q_bpe_encode_trained,  # new in round 9
        "temperature_mix": q_temperature_mix,  # new in round 9
        "streaming_near_dedup": q_streaming_near_dedup,  # new in round 9
        "knn_sq": q_knn_sq,  # new in round 9
        "knn_binary": q_knn_binary,  # new in round 9
        "url_dedup": q_url_dedup,  # new in round 9
        "ngram_freq": q_ngram_freq,  # new in round 9
        "pack_sequences": q_pack_sequences,  # new in round 9
        "knn_ivf_arrow": q_knn_ivf_arrow,
        "media_dedup": q_media_dedup,
        "media_frames": q_media_frames,
        "streaming_dedup": q_streaming_dedup,
        "embedding_near_dup": q_embedding_near_dup,
        "semantic_dup_pairs": q_semantic_dup_pairs,  # new in round 7
        "semantic_dup_grouped": q_semantic_dup_grouped,  # new in round 8
        "semantic_dup_refined": q_semantic_dup_refined,  # new in round 8
        "semantic_decontam": q_semantic_decontam,  # new in round 8
        "bigram_nll": q_bigram_nll,  # new in round 8
        "trigram_nll": q_trigram_nll,  # new in round 12
        "ngram_nll": q_ngram_nll,  # new in round 13 (5-gram KN)
        "fluency_buckets_5gram": q_fluency_buckets_5gram,  # round 13
        "media_decode_jpeg": q_media_decode_jpeg,  # new in round 8
        "media_decode_jpeg_rgb": q_media_decode_jpeg_rgb,  # new in round 8
        "media_decode_jpeg_420": q_media_decode_jpeg_420,  # new in round 8
        "strip_html": q_strip_html,  # new in round 8
        "warc_ingest": q_warc_ingest,  # new in round 8
        "fit_classifier": q_fit_classifier,  # new in round 8
        "bm25_rank": q_bm25_rank,  # new in round 8
        "shuffle_rows": q_shuffle_rows,  # new in round 8
        "fluency_buckets": q_fluency_buckets,  # new in round 8
        "fluency_buckets_lang": q_fluency_buckets_lang,  # new in round 8
        "token_budget": q_token_budget,  # new in round 8
        "knn_pq": q_knn_pq,  # new in round 8
        "semantic_dedup": q_semantic_dedup,  # new in round 7
        "media_metadata": q_media_metadata,
        "media_decode": q_media_decode,
        "streaming_asof": q_streaming_asof,
        "streaming_asof_static": q_streaming_asof_static,
        "token_count_exact": q_token_count_exact,  # new in round 6
        "media_decode_ppm": q_media_decode_ppm,  # new in round 6
        "media_decode_png": q_media_decode_png,  # new in round 7
        # Changed in round 6 (new default/algorithm) — must be in the
        # driver-checked prefix this round:
        "line_dedup": q_line_dedup,
        "dedup_components": q_dedup_components,
        "dedup_components_star": q_dedup_components_star,
        "dedup_keep_best": q_dedup_keep_best,
        "pack_assemble": q_pack_assemble,
        "classifier_score": q_classifier_score,  # new in round 6
        "duplicate_spans": q_duplicate_spans,  # new in round 6
        "duplicate_spans_hash": q_duplicate_spans_hash,  # new in round 7
        "remove_dup_spans": q_remove_dup_spans,  # new in round 7
        "line_dedup_hash": q_line_dedup_hash,  # new in round 7
        "chunk_documents": q_chunk_documents,  # new in round 7
        "pit_strict": q_pit_strict,
        "pit_embargo": q_pit_embargo,
        "pit_inclusive": q_pit_inclusive,
        "pit_staleness": q_pit_staleness,
        "pit_union_strategy": q_pit_union_strategy,
        "pit_skew_bucketed": q_pit_skew_bucketed,
        "pit_composite_keys": q_pit_composite_keys,
        "pit_events_keymap": q_pit_events_keymap,
        "pit_multi_feature": q_pit_multi_feature,
        "pit_multi_single_pass": q_pit_multi_single_pass,
        "rolling_spend_30d": q_rolling_spend_30d,
        "duplicate_pairs": q_duplicate_pairs,
        "audit_temporal_counts": q_audit_temporal_counts,
        "leak_flags": q_leak_flags,
        "dedup_exact": q_dedup_exact,
        "text_token_stats": q_text_token_stats,
        "token_count_bpe": q_token_count_bpe,
        "fingerprint": q_fingerprint,
        "lang_profile": q_lang_profile,
        "knn_cosine": q_knn_cosine,
        "knn_cosine_arrow": q_knn_cosine_arrow,
        "ngram_jaccard": q_ngram_jaccard,
        "quality_score": q_quality_score,
        "lang_id": q_lang_id,
        "gopher_quality": q_gopher_quality,
        "repetition_ngrams": q_repetition_ngrams,
        "decontamination": q_decontamination,
        "corpus_clean": q_corpus_clean,
        "hash_sample": q_hash_sample,
        "stratified_sample": q_stratified_sample,
        "split_by_hash": q_split_by_hash,
        "pii_signals": q_pii_signals,
        "pii_redact": q_pii_redact,
        "pack_stream": q_pack_stream,
        "pack_next_fit": q_pack_next_fit,
        "url_signals": q_url_signals,
        "domain_counts": q_domain_counts,
        "domain_blocklist": q_domain_blocklist,
        "word_freq": q_word_freq,
        "unigram_nll": q_unigram_nll,
        "mixture_sample": q_mixture_sample,
        "normalize_text": q_normalize_text,
        "minhash_dedup": q_minhash_dedup,
        "simhash_pairs": q_simhash_pairs,
        "knn_lsh": q_knn_lsh,
        "knn_ivf": q_knn_ivf,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "hybrid_rrf": ORACLE_HYBRID_RRF.strip(),
        "hybrid_rrf_bm25": ORACLE_HYBRID_RRF_BM25.strip(),
        "train_unigram": ORACLE_TRAIN_UNIGRAM.strip(),
        "unigram_encode": ORACLE_UNIGRAM_ENCODE.strip(),
        "train_wordpiece": ORACLE_TRAIN_WORDPIECE.strip(),
        "wordpiece_encode": ORACLE_WORDPIECE_ENCODE.strip(),
        "train_bpe": ORACLE_TRAIN_BPE,
        "train_bpe_byte": _oracle_train_bpe_byte_sql(),
        "train_bpe_gpt2": _oracle_train_bpe_gpt2_sql(),
        "bpe_encode": _oracle_bpe_encode_sql(),
        "bpe_encode_trained": _oracle_bpe_encode_trained_sql(),
        "temperature_mix": ORACLE_TEMPERATURE_MIX,
        "streaming_near_dedup": _oracle_streaming_near_dedup_sql(),
        "knn_sq": _oracle_knn_sq_sql(),
        "knn_binary": _oracle_knn_binary_sql(),
        "url_dedup": ORACLE_URL_DEDUP,
        "ngram_freq": _oracle_ngram_freq_sql(),
        "pack_sequences": _oracle_pack_sequences_sql(),
        "pit_strict": _pit_orders_oracle(),
        "pit_embargo": _pit_orders_oracle(embargo_d=7),
        "pit_inclusive": _pit_orders_oracle(op="<=", embargo_d=30),
        "pit_staleness": _pit_orders_oracle(staleness_d=90),
        "pit_union_strategy": _pit_orders_oracle(),
        "pit_skew_bucketed": _pit_orders_oracle(),
        "pit_composite_keys": ORACLE_PIT_COMPOSITE,
        "pit_events_keymap": ORACLE_PIT_EVENTS,
        "pit_multi_feature": ORACLE_PIT_MULTI,
        "pit_multi_single_pass": ORACLE_PIT_MULTI,
        "rolling_spend_30d": ORACLE_ROLLING,
        "duplicate_pairs": ORACLE_DUPLICATES,
        "audit_temporal_counts": ORACLE_AUDIT_TEMPORAL,
        "leak_flags": ORACLE_LEAK_FLAGS,
        "dedup_exact": ORACLE_DEDUP_EXACT,
        "text_token_stats": ORACLE_TEXT_TOKENS,
        "token_count_bpe": ORACLE_TOKEN_BPE,
        "token_count_exact": _oracle_token_count_exact_sql(),
        "media_decode_ppm": ORACLE_MEDIA_DECODE_PPM,
        "media_decode_png": ORACLE_MEDIA_DECODE_PNG,
        "media_decode_jpeg": ORACLE_MEDIA_DECODE_JPEG,
        "media_decode_jpeg_rgb": ORACLE_MEDIA_DECODE_JPEG_RGB,
        "media_decode_jpeg_420": ORACLE_MEDIA_DECODE_JPEG_420,
        "fingerprint": ORACLE_FINGERPRINT,
        "lang_profile": ORACLE_LANG_PROFILE,
        "knn_cosine": ORACLE_KNN,
        "knn_cosine_arrow": ORACLE_KNN,
        "ngram_jaccard": ORACLE_NGRAM_JACCARD,
        "quality_score": ORACLE_QUALITY,
        "lang_id": ORACLE_LANG_ID,
        "gopher_quality": ORACLE_GOPHER,
        "repetition_ngrams": ORACLE_REPETITION,
        "decontamination": ORACLE_DECONTAMINATION,
        "corpus_clean": ORACLE_CORPUS_CLEAN,
        "hash_sample": ORACLE_HASH_SAMPLE,
        "stratified_sample": ORACLE_STRATIFIED_SAMPLE,
        "split_by_hash": ORACLE_SPLIT_BY_HASH,
        "pii_signals": _oracle_pii_signals_sql(),
        "pii_redact": _oracle_pii_redact_sql(),
        "pack_stream": _oracle_pack_stream_sql(),
        "pack_next_fit": _oracle_pack_next_fit_sql(),
        "pack_assemble": _oracle_pack_assemble_sql(),
        "url_signals": _oracle_url_signals_sql(),
        "domain_counts": _oracle_domain_counts_sql(),
        "domain_blocklist": _oracle_domain_blocklist_sql(),
        "word_freq": ORACLE_WORD_FREQ,
        "unigram_nll": ORACLE_UNIGRAM_NLL,
        "bigram_nll": ORACLE_BIGRAM_NLL,
        "trigram_nll": ORACLE_TRIGRAM_NLL,
        "ngram_nll": _oracle_ngram_nll_sql(
            NGRAM_NLL_N, NGRAM_NLL_MIN_COUNT
        ),
        "fluency_buckets_5gram": _oracle_fluency_buckets_5gram_sql(),
        "fit_classifier": ORACLE_FIT_CLASSIFIER,
        "bm25_rank": ORACLE_BM25_RANK,
        "shuffle_rows": ORACLE_SHUFFLE_ROWS,
        "fluency_buckets": ORACLE_FLUENCY_BUCKETS,
        "fluency_buckets_lang": ORACLE_FLUENCY_BUCKETS_LANG,
        "token_budget": ORACLE_TOKEN_BUDGET,
        "knn_pq": _oracle_knn_pq_sql(),
        "knn_ivf_pq": _oracle_ivf_pq_sql(),
        "knn_ivf_pq_raw": _oracle_ivf_pq_sql(residual=False),
        "knn_pq_opq": _oracle_knn_pq_sql(
            rotation=similarity.opq_rotation(64, 7)
        ),
        "dsir_weights": ORACLE_DSIR_WEIGHTS,
        "dsir_sample": ORACLE_DSIR_SAMPLE,
        "knn_mrl": ORACLE_KNN_MRL,
        "knn_rproj": _oracle_knn_rproj_sql(),
        "mmr_rerank": ORACLE_MMR_RERANK.strip(),
        "knn_lsh_multiprobe": _oracle_knn_lsh_multiprobe_sql(),
        "gram_duplication": ORACLE_GRAM_DUPLICATION,
        "hash_embed": ORACLE_HASH_EMBED,
        "classifier_hashed": _oracle_classifier_hashed_sql(),
        "corpus_stats": ORACLE_CORPUS_STATS,
        "code_signals": _oracle_code_signals_sql(),
        "strip_html": ORACLE_STRIP_HTML,
        "warc_ingest": _strip_html_chain_sql(
            ORACLE_WARC_INGEST_RAW, carry="target_uri, content_length"
        ),
        "mixture_sample": ORACLE_MIXTURE_SAMPLE,
        "normalize_text": ORACLE_NORMALIZE,
        "line_dedup": ORACLE_LINE_DEDUP,
        # LSH queries run in portable-hash / deterministic-plane mode, so
        # the oracle replays candidate generation + verification exactly.
        "minhash_dedup": _oracle_minhash_dedup_sql(),
        "dedup_components": _oracle_dedup_components_sql(),
        "dedup_components_star": _oracle_dedup_components_sql(),
        "classifier_score": _oracle_classifier_sql(),
        "duplicate_spans": _oracle_duplicate_spans_sql(),
        "duplicate_spans_hash": _oracle_duplicate_spans_sql(),
        "remove_dup_spans": _oracle_remove_dup_spans_sql(),
        "line_dedup_hash": ORACLE_LINE_DEDUP,
        "chunk_documents": ORACLE_CHUNK_DOCUMENTS,
        "dedup_keep_best": _oracle_dedup_keep_best_sql(),
        "simhash_pairs": _oracle_simhash_pairs_sql(),
        "knn_lsh": _oracle_knn_lsh_sql(),
        "knn_ivf": _oracle_knn_ivf_sql(),
        "knn_ivf_arrow": _oracle_knn_ivf_sql(),
        "embedding_near_dup": _oracle_embedding_near_dup_sql(),
        "semantic_dup_pairs": _oracle_semantic_sql(survivors=False),
        "semantic_dup_grouped": _oracle_semantic_sql(survivors=False),
        "semantic_dup_refined": _oracle_semantic_refined_sql(),
        "semantic_decontam": ORACLE_SEMANTIC_DECONTAM,
        "semantic_dedup": _oracle_semantic_sql(survivors=True),
        "media_metadata": ORACLE_MEDIA_METADATA,
        "media_decode": ORACLE_MEDIA_DECODE,
        "media_dedup": ORACLE_MEDIA_DEDUP,
        "media_frames": ORACLE_MEDIA_FRAMES,
        # Streaming replays of the events as-of join: defined to agree with
        # the batch semantics, so both share the batch oracle SQL.
        "streaming_asof": ORACLE_PIT_EVENTS,
        "streaming_asof_static": ORACLE_PIT_EVENTS,
        "streaming_dedup": ORACLE_STREAMING_DEDUP,
    }
