"""Structured Streaming as-of join + audit tests.

Strategy: feed deterministic synthetic label/feature rows through a file
source one file per micro-batch (``maxFilesPerTrigger=1`` +
``availableNow``), with trailing far-future sentinel feature rows that push
the watermark past every label, and compare the emitted rows with the batch
``asof_join`` on the same data — streaming/batch equivalence is the
correctness oracle (same differential approach as the driver harness).
"""

from __future__ import annotations

import shutil
import uuid
from datetime import datetime, timedelta
from pathlib import Path

import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

from timefence_spark.operators.asof import asof_join
from timefence_spark.streaming import (
    flag_leaks,
    leak_counts,
    stream_static_asof_join,
    streaming_asof_join,
)

T0 = datetime(2024, 1, 1)


def ts(h: float) -> datetime:
    return T0 + timedelta(hours=h)


LABEL_SCHEMA = StructType(
    [
        StructField("entity", LongType()),
        StructField("label_time", TimestampNTZType()),
        StructField("target", StringType()),
    ]
)
FEAT_SCHEMA = StructType(
    [
        StructField("entity", LongType()),
        StructField("feature_time", TimestampNTZType()),
        StructField("score", DoubleType()),
    ]
)

# Entity 1: features straddle labels; entity 2: feature at exactly label
# time (strict-boundary case); entity 3: label with no feature at all.
FEATURES = [
    (1, ts(0), 10.0),
    (1, ts(2), 20.0),
    (1, ts(5), 50.0),
    (2, ts(4), 40.0),
]
LABELS = [
    (1, ts(1), "a"),  # -> 10.0
    (1, ts(4), "b"),  # -> 20.0
    (2, ts(4), "c"),  # strict: None; inclusive: 40.0
    (3, ts(6), "d"),  # no features -> None
]
SENTINELS = [(99, ts(1000), 0.0), (99, ts(2000), 0.0)]


def _write_files(root: Path, name: str, schema, batches, spark):
    d = root / name
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(d / f"b{i}"))
    return d


def _run_stream(spark, tmp: Path, joined_builder):
    """Run a streaming query to a memory sink until all input is drained."""
    qname = f"q{uuid.uuid4().hex[:8]}"
    q = (
        joined_builder.writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .option("checkpointLocation", str(tmp / f"ckpt_{qname}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {qname}")


@pytest.fixture()
def stream_dirs(spark, tmp_path):
    # Batch 0: early features; batch 1: labels + late features; batches
    # 2-3: sentinels that advance the watermark past every label, firing
    # the event-time timeouts that flush pending state.
    feat_batches = [FEATURES[:2], FEATURES[2:], [SENTINELS[0]], [SENTINELS[1]]]
    lbl_batches = [LABELS]
    froot = _write_files(tmp_path, "features", FEAT_SCHEMA, feat_batches, spark)
    lroot = _write_files(tmp_path, "labels", LABEL_SCHEMA, lbl_batches, spark)
    yield froot, lroot
    shutil.rmtree(tmp_path, ignore_errors=True)


def _read_stream(spark, root: Path, schema):
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(root / "*"))
    )


@pytest.mark.parametrize("strict", [True, False])
def test_stream_stream_asof_matches_batch(spark, tmp_path, stream_dirs, strict):
    froot, lroot = stream_dirs
    joined = streaming_asof_join(
        _read_stream(spark, lroot, LABEL_SCHEMA),
        _read_stream(spark, froot, FEAT_SCHEMA),
        on="entity",
        left_time="label_time",
        right_time="feature_time",
        value_cols=["score"],
        prefix="f",
        strict=strict,
        max_delay="0 seconds",
    )
    got = _run_stream(spark, tmp_path, joined)

    expected = asof_join(
        spark.createDataFrame(LABELS, LABEL_SCHEMA),
        spark.createDataFrame(FEATURES + SENTINELS, FEAT_SCHEMA),
        on="entity",
        left_time="label_time",
        right_time="feature_time",
        value_cols=["score"],
        prefix="f",
        strict=strict,
    )
    key = lambda r: (r["entity"], r["label_time"])
    got_rows = sorted([r.asDict() for r in got.collect()], key=key)
    exp_rows = sorted([r.asDict() for r in expected.collect()], key=key)
    assert got_rows == exp_rows
    # Spot-check the strict boundary: entity 2's feature is at label time.
    e2 = [r for r in got_rows if r["entity"] == 2][0]
    assert e2["f__score"] == (None if strict else 40.0)


@pytest.mark.slow
def test_stream_stream_embargo_and_lookback(spark, tmp_path, stream_dirs):
    froot, lroot = stream_dirs
    joined = streaming_asof_join(
        _read_stream(spark, lroot, LABEL_SCHEMA),
        _read_stream(spark, froot, FEAT_SCHEMA),
        on="entity",
        left_time="label_time",
        right_time="feature_time",
        embargo="1h",
        lookback="3h",
        prefix="f",
    )
    got = _run_stream(spark, tmp_path, joined)
    expected = asof_join(
        spark.createDataFrame(LABELS, LABEL_SCHEMA),
        spark.createDataFrame(FEATURES + SENTINELS, FEAT_SCHEMA),
        on="entity",
        left_time="label_time",
        right_time="feature_time",
        embargo=3600,
        lookback=3 * 3600,
        prefix="f",
    )
    key = lambda r: (r["entity"], r["label_time"])
    assert sorted([r.asDict() for r in got.collect()], key=key) == sorted(
        [r.asDict() for r in expected.collect()], key=key
    )


def test_stream_stream_asof_rocksdb_state_store(spark, tmp_path, stream_dirs):
    """Same streaming/batch differential oracle under the RocksDB state
    store — the provider for 100 TB-scale state (bounded memory, spill to
    local disk). Pure config flip: applyInPandasWithState semantics and
    emitted rows must be identical to the default HDFS-backed provider
    (VERDICT r4 item 7)."""
    conf_key = "spark.sql.streaming.stateStore.providerClass"
    rocksdb = (
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    )
    try:
        prev = spark.conf.get(conf_key)
    except Exception:
        prev = None
    froot, lroot = stream_dirs
    spark.conf.set(conf_key, rocksdb)
    try:
        joined = streaming_asof_join(
            _read_stream(spark, lroot, LABEL_SCHEMA),
            _read_stream(spark, froot, FEAT_SCHEMA),
            on="entity",
            left_time="label_time",
            right_time="feature_time",
            value_cols=["score"],
            prefix="f",
            strict=True,
            max_delay="0 seconds",
        )
        got = _run_stream(spark, tmp_path, joined)
        got_rows = sorted(
            [r.asDict() for r in got.collect()],
            key=lambda r: (r["entity"], r["label_time"]),
        )
    finally:
        if prev is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prev)
    expected = asof_join(
        spark.createDataFrame(LABELS, LABEL_SCHEMA),
        spark.createDataFrame(FEATURES + SENTINELS, FEAT_SCHEMA),
        on="entity",
        left_time="label_time",
        right_time="feature_time",
        value_cols=["score"],
        prefix="f",
        strict=True,
    )
    exp_rows = sorted(
        [r.asDict() for r in expected.collect()],
        key=lambda r: (r["entity"], r["label_time"]),
    )
    assert got_rows == exp_rows


def test_stream_static_asof(spark, tmp_path, stream_dirs):
    froot, lroot = stream_dirs
    static_feats = spark.createDataFrame(FEATURES, FEAT_SCHEMA)
    joined = stream_static_asof_join(
        _read_stream(spark, lroot, LABEL_SCHEMA),
        static_feats,
        on="entity",
        left_time="label_time",
        right_time="feature_time",
        prefix="f",
    )
    got = _run_stream(spark, tmp_path, joined)
    expected = asof_join(
        spark.createDataFrame(LABELS, LABEL_SCHEMA),
        static_feats,
        on="entity",
        left_time="label_time",
        right_time="feature_time",
        prefix="f",
    )
    key = lambda r: (r["entity"], r["label_time"])
    assert sorted([r.asDict() for r in got.collect()], key=key) == sorted(
        [r.asDict() for r in expected.collect()], key=key
    )


def test_stream_static_asof_map_payload(spark, tmp_path, stream_dirs):
    """Map-typed payloads are unorderable; the static compaction must fall
    back to ft-only array_sort (keep_any) instead of failing analysis."""
    from pyspark.sql.types import MapType

    froot, lroot = stream_dirs
    map_schema = StructType(
        [
            StructField("entity", LongType()),
            StructField("feature_time", TimestampNTZType()),
            StructField("attrs", MapType(StringType(), DoubleType())),
        ]
    )
    static_feats = spark.createDataFrame(
        [(e, t, {"score": s}) for e, t, s in FEATURES], map_schema
    )
    joined = stream_static_asof_join(
        _read_stream(spark, lroot, LABEL_SCHEMA),
        static_feats,
        on="entity",
        left_time="label_time",
        right_time="feature_time",
        prefix="f",
    )
    got = _run_stream(spark, tmp_path, joined)
    expected = asof_join(
        spark.createDataFrame(LABELS, LABEL_SCHEMA),
        static_feats,
        on="entity",
        left_time="label_time",
        right_time="feature_time",
        prefix="f",
    )
    key = lambda r: (r["entity"], r["label_time"])
    assert sorted([r.asDict() for r in got.collect()], key=key) == sorted(
        [r.asDict() for r in expected.collect()], key=key
    )


@pytest.mark.slow
def test_stream_stream_asof_map_payload(spark, tmp_path):
    """Map payloads round-trip the stateful JSON codec too."""
    from pyspark.sql.types import MapType

    map_schema = StructType(
        [
            StructField("entity", LongType()),
            StructField("feature_time", TimestampNTZType()),
            StructField("attrs", MapType(StringType(), DoubleType())),
        ]
    )
    map_feats = [(e, t, {"score": s}) for e, t, s in FEATURES]
    map_sentinels = [(e, t, {"score": s}) for e, t, s in SENTINELS]
    feat_batches = [map_feats[:2], map_feats[2:], [map_sentinels[0]], [map_sentinels[1]]]
    froot = _write_files(tmp_path, "mfeatures", map_schema, feat_batches, spark)
    lroot = _write_files(tmp_path, "mlabels", LABEL_SCHEMA, [LABELS], spark)
    joined = streaming_asof_join(
        _read_stream(spark, lroot, LABEL_SCHEMA),
        _read_stream(spark, froot, map_schema),
        on="entity",
        left_time="label_time",
        right_time="feature_time",
        prefix="f",
    )
    got = _run_stream(spark, tmp_path, joined)
    expected = asof_join(
        spark.createDataFrame(LABELS, LABEL_SCHEMA),
        spark.createDataFrame(map_feats + map_sentinels, map_schema),
        on="entity",
        left_time="label_time",
        right_time="feature_time",
        prefix="f",
    )
    key = lambda r: (r["entity"], r["label_time"])
    assert sorted([r.asDict() for r in got.collect()], key=key) == sorted(
        [r.asDict() for r in expected.collect()], key=key
    )


def test_stream_static_works_on_batch_left(spark):
    """The broadcast lookup path is engine-agnostic: same answer on a plain
    batch DataFrame."""
    labels = spark.createDataFrame(LABELS, LABEL_SCHEMA)
    feats = spark.createDataFrame(FEATURES, FEAT_SCHEMA)
    got = stream_static_asof_join(
        labels,
        feats,
        on="entity",
        left_time="label_time",
        right_time="feature_time",
        prefix="f",
    )
    expected = asof_join(
        labels,
        feats,
        on="entity",
        left_time="label_time",
        right_time="feature_time",
        prefix="f",
    )
    key = lambda r: (r["entity"], r["label_time"])
    assert sorted([r.asDict() for r in got.collect()], key=key) == sorted(
        [r.asDict() for r in expected.collect()], key=key
    )


def test_flag_leaks_and_counts(spark):
    rows = [
        (1, ts(10), ts(9), "ok"),
        (2, ts(10), ts(10), "leak-eq"),
        (3, ts(10), ts(12), "leak-future"),
        (4, ts(10), None, "null-ft"),
    ]
    schema = StructType(
        [
            StructField("entity", LongType()),
            StructField("label_time", TimestampNTZType()),
            StructField("feat__feature_time", TimestampNTZType()),
            StructField("note", StringType()),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    flagged = flag_leaks(
        df,
        feature_time_columns={"feat": "feat__feature_time"},
        label_time="label_time",
    )
    got = {r["note"]: r["__leak_any"] for r in flagged.collect()}
    assert got == {
        "ok": False,
        "leak-eq": True,
        "leak-future": True,
        "null-ft": False,
    }

    counts = leak_counts(
        df,
        feature_time_columns={"feat": "feat__feature_time"},
        label_time="label_time",
        window="1 day",
    ).collect()
    assert len(counts) == 1
    row = counts[0]
    assert row["rows"] == 4
    assert row["feat__leaks"] == 2
    assert row["feat__max_leak_s"] == 2 * 3600.0


def test_flag_leaks_streaming_smoke(spark, tmp_path):
    """flag_leaks must stay a pure projection — assert it is accepted on a
    streaming DataFrame and produces append-mode rows."""
    rows = [(1, ts(10), ts(12), "leak")]
    schema = StructType(
        [
            StructField("entity", LongType()),
            StructField("label_time", TimestampNTZType()),
            StructField("feat__feature_time", TimestampNTZType()),
            StructField("note", StringType()),
        ]
    )
    d = tmp_path / "rows"
    spark.createDataFrame(rows, schema).write.parquet(str(d / "b0"))
    stream = spark.readStream.schema(schema).parquet(str(d / "*"))
    flagged = flag_leaks(
        stream,
        feature_time_columns={"feat": "feat__feature_time"},
        label_time="label_time",
    )
    got = _run_stream(spark, tmp_path, flagged)
    assert [r["__leak_any"] for r in got.collect()] == [True]


def test_stream_static_asof_no_broadcast(spark, tmp_path, stream_dirs):
    """broadcast_features=False (the past-broadcast-scale path) must be
    result-identical to the broadcast plan."""
    froot, lroot = stream_dirs
    static_feats = spark.createDataFrame(FEATURES, FEAT_SCHEMA)
    joined = stream_static_asof_join(
        _read_stream(spark, lroot, LABEL_SCHEMA),
        static_feats,
        on="entity",
        left_time="label_time",
        right_time="feature_time",
        prefix="f",
        broadcast_features=False,
    )
    got = _run_stream(spark, tmp_path, joined)
    expected = asof_join(
        spark.createDataFrame(LABELS, LABEL_SCHEMA),
        static_feats,
        on="entity",
        left_time="label_time",
        right_time="feature_time",
        prefix="f",
    )
    key = lambda r: (r["entity"], r["label_time"])
    assert sorted([r.asDict() for r in got.collect()], key=key) == sorted(
        [r.asDict() for r in expected.collect()], key=key
    )


def test_streaming_exact_dedup_across_batches(spark, tmp_path):
    """First-arrival state must carry across micro-batches: a batch-2 row
    whose content hash appeared in batch 1 is dropped."""
    from timefence_spark.streaming import streaming_exact_dedup

    d = tmp_path / "docs"
    spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "alpha")], "doc_id long, text string"
    ).coalesce(1).write.parquet(str(d / "b0"))
    spark.createDataFrame(
        [(9, "alpha"), (10, "gamma")], "doc_id long, text string"
    ).coalesce(1).write.parquet(str(d / "b1"))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d / "*"))
    )
    got = _run_stream(
        spark, tmp_path, streaming_exact_dedup(stream, content_cols="text")
    ).collect()
    by_text = {r["text"]: r for r in got}
    assert set(by_text) == {"alpha", "beta", "gamma"}
    assert len(got) == 3
    # batch-2 duplicate of "alpha" (doc 9) must have lost to batch 1
    assert by_text["alpha"]["doc_id"] in (1, 3)
    assert by_text["gamma"]["doc_id"] == 10


def test_streaming_exact_dedup_within_watermark(spark, tmp_path):
    """The watermark-bounded variant dedups within the horizon and
    requires time_col."""
    from timefence_spark.streaming import streaming_exact_dedup

    rows = [
        (1, ts(0), "alpha"),
        (2, ts(1), "alpha"),   # inside horizon of row 1 -> dropped
        (3, ts(2), "beta"),
    ]
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("event_time", TimestampNTZType()),
            StructField("text", StringType()),
        ]
    )
    d = tmp_path / "wdocs"
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(d / "b0"))
    stream = spark.readStream.schema(schema).parquet(str(d / "*"))
    got = _run_stream(
        spark,
        tmp_path,
        streaming_exact_dedup(
            stream, content_cols="text", time_col="event_time",
            watermark="1 hour",
        ),
    ).collect()
    assert sorted(r["text"] for r in got) == ["alpha", "beta"]

    with pytest.raises(ValueError):
        streaming_exact_dedup(stream, content_cols="text", watermark="1 hour")


def test_stateless_text_operators_compose_with_streams(spark, tmp_path):
    """The scan-speed text/PII operators are pure projections, so they
    compose with readStream unchanged — quality/PII filtering of a
    document stream needs no operator variants. Streamed output must
    equal the batch run row-for-row."""
    from timefence_spark.operators import pii, text

    rows = [
        (1, "The quick brown fox jumps over the lazy dog near the river bank."),
        (2, "mail me: alice@example.org or call 555-867-5309 twice"),
        (3, "short"),
        (4, None),
    ]
    schema = "doc_id long, text string"
    src = tmp_path / "docs_in"
    batch = spark.createDataFrame(rows, schema)
    for i in (0, 1):
        batch.where(F.col("doc_id") % 2 == i).coalesce(1).write.mode(
            "append"
        ).parquet(str(src / f"b{i}"))

    def chain(df):
        scored = text.quality_score(
            df, id_col="doc_id", text_col="text", keep_cols=["text"]
        )
        return pii.pii_signals(
            scored, id_col="doc_id", text_col="text",
            keep_cols=["n_chars", "quality_score"],
        ).select("doc_id", "n_chars", "quality_score", "n_pii", "has_pii")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    got = _run_stream(spark, tmp_path, chain(stream))
    want = chain(spark.read.parquet(str(src / "*")))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


@pytest.mark.slow
def test_near_dedup_batch_registry_semantics(spark, tmp_path):
    """The batch kernel of streaming near-dedup: within-batch greedy
    keep-smallest-id, cross-batch registry drops, and agreement with a
    Python replay of the SAME band tables (the MinHash math itself is
    oracle-verified elsewhere; this pins the registry logic)."""
    from timefence_spark.operators.dedup import (
        _band_buckets,
        _shingle_df,
        _signature_df,
    )
    from timefence_spark.streaming import near_dedup_batch

    base = "the quick brown fox jumps over the lazy dog on a warm day"
    near = base.replace("warm", "cold")          # near-dup of base
    other = "completely different content about database query planners"
    other2 = "yet another unrelated document discussing parquet readers"
    batches = [
        [(5, base), (2, base), (9, other)],       # 2 wins base; 5 near-drop
        [(11, near), (12, other2)],               # near collides registry
        [(13, other), (14, "short boilerplate words entirely novel here")],
    ]
    kw = dict(num_perm=32, bands=16, shingle_k=3, seed=7)

    # Python replay over the Spark-computed band tables
    registry: set = set()
    expected: list[int] = []
    for rows in batches:
        df = spark.createDataFrame(rows, "doc_id long, text string")
        sh = _shingle_df(df, id_col="doc_id", text_col="text", shingle_k=3)
        sig = _signature_df(sh, id_col="doc_id", num_perm=32, seed=7,
                            hash_fn="xxhash64")
        b = [
            (r["doc_id"], str(r["band_hash"]))
            for r in _band_buckets(sig, id_col="doc_id", num_perm=32,
                                   bands=16, hash_fn="xxhash64").collect()
        ]
        bands_of: dict[int, set] = {}
        for i, h in b:
            bands_of.setdefault(i, set()).add(h)
        band_min: dict[str, int] = {}
        for i, h in b:
            band_min[h] = min(band_min.get(h, i), i)
        for i in sorted(bands_of):
            hits_state = bands_of[i] & registry
            loses_batch = any(band_min[h] < i for h in bands_of[i])
            if not hits_state and not loses_batch:
                expected.append(i)
        for _, h in b:
            registry.add(h)

    state = str(tmp_path / "band_registry")
    got: list[int] = []
    for rows in batches:
        df = spark.createDataFrame(rows, "doc_id long, text string")
        surv = near_dedup_batch(
            df, id_col="doc_id", text_col="text", state_path=state, **kw
        )
        got.extend(r["doc_id"] for r in surv.collect())

    assert sorted(got) == sorted(expected)
    # sanity on the scenario itself: base's smaller id won, its twin and
    # the cross-batch near-dup lost, unrelated docs all survived, and
    # the batch-3 repeat of "other" lost to the registry
    assert 2 in got and 5 not in got and 11 not in got
    assert {9, 12, 14} <= set(got) and 13 not in got


@pytest.mark.slow
def test_streaming_near_dedup_replay_matches_batch_kernel(spark, tmp_path):
    """foreachBatch replay: the streamed survivors equal running the
    batch kernel over the same micro-batches with a fresh registry."""
    from timefence_spark.streaming import near_dedup_batch, streaming_near_dedup

    texts = [
        "the quick brown fox jumps over the lazy dog on a warm day",
        "an entirely different piece of text about spark physical plans",
        "the quick brown fox jumps over the lazy dog on a cold day",
        "more unrelated prose concerning shuffle partitions and skew",
    ]
    d = tmp_path / "nd_in"
    spark.createDataFrame(
        [(1, texts[0]), (2, texts[1])], "doc_id long, text string"
    ).coalesce(1).write.parquet(str(d / "b0"))
    spark.createDataFrame(
        [(3, texts[2]), (4, texts[3])], "doc_id long, text string"
    ).coalesce(1).write.parquet(str(d / "b1"))

    kw = dict(num_perm=32, bands=16, shingle_k=3, seed=7)
    ref_state = str(tmp_path / "ref_registry")
    ref: list[int] = []
    for b in ("b0", "b1"):
        surv = near_dedup_batch(
            spark.read.parquet(str(d / b)),
            id_col="doc_id", text_col="text", state_path=ref_state, **kw,
        )
        ref.extend(r["doc_id"] for r in surv.collect())

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d / "*"))
    )
    q = streaming_near_dedup(
        stream, id_col="doc_id", text_col="text",
        state_path=str(tmp_path / "stream_registry"),
        output_path=str(tmp_path / "nd_out"),
        checkpoint=str(tmp_path / "nd_ckpt"),
        **kw,
    )
    q.awaitTermination(300)
    got = [
        r["doc_id"]
        for r in spark.read.parquet(str(tmp_path / "nd_out")).collect()
    ]
    assert sorted(got) == sorted(ref)
    assert 3 not in got  # the cross-batch near-dup was dropped


def test_plan_near_dedup_crash_replay_is_at_least_once(spark, tmp_path):
    """ADVICE r9 (high): the two-phase API makes crash-replay
    at-least-once. A micro-batch whose sink write succeeded but whose
    registry commit did NOT (crash between the two) must recompute the
    IDENTICAL survivor set on replay — the old registry-first ordering
    dropped every survivor on replay (at-most-once, data loss)."""
    from timefence_spark.streaming import plan_near_dedup_batch

    state = str(tmp_path / "registry")
    kw = dict(id_col="doc_id", text_col="text", state_path=state,
              num_perm=32, bands=16, shingle_k=3, seed=7)
    batch = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog on a warm day"),
            (2, "an entirely different piece of text about spark plans"),
        ],
        "doc_id long, text string",
    )

    surv1, commit1 = plan_near_dedup_batch(batch, **kw)
    first = sorted(r["doc_id"] for r in surv1.collect())
    assert first == [1, 2]
    # CRASH before commit1(): registry untouched. foreachBatch replays.
    surv2, commit2 = plan_near_dedup_batch(batch, **kw)
    replay = sorted(r["doc_id"] for r in surv2.collect())
    assert replay == first  # sink gets duplicates, never loses rows
    commit2()
    # Replay AFTER a completed commit drops everything (sink already has
    # the rows; the registry now contains the batch's own bands).
    surv3, _ = plan_near_dedup_batch(batch, **kw)
    assert surv3.count() == 0
    # The survivors handle pinned before commit still serves its rows.
    assert sorted(r["doc_id"] for r in surv2.collect()) == first


@pytest.mark.slow
def test_near_dedup_ttl_registry_plateaus_and_expires(spark, tmp_path):
    """VERDICT r9 item 5: with ttl_batches set, registry state plateaus
    under a long stream (generation compaction deletes dead rows) and a
    near-dup arriving after the TTL window is re-admitted."""
    from timefence_spark.streaming import near_dedup_batch
    from timefence_spark.streaming.near_dedup import _gen_dirs, _registry

    state = str(tmp_path / "ttl_registry")
    kw = dict(id_col="doc_id", text_col="text", state_path=state,
              num_perm=32, bands=16, shingle_k=3, seed=7,
              ttl_batches=4, compact_every=4)
    base = "the quick brown fox jumps over the lazy dog on a warm day"

    def filler(seq: int) -> str:
        return (
            f"unique filler document number {seq} discussing topic{seq} "
            f"with token{seq} and marker{seq} spread across many words"
        )

    counts: dict[int, int] = {}
    survived: dict[int, list[int]] = {}
    for seq in range(21):
        rows = [(1000 + seq, filler(seq))]
        if seq == 0:
            rows.append((1, base))
        if seq == 2:  # near-dup INSIDE the TTL window -> dropped
            rows.append((2, base.replace("warm", "cold")))
        if seq == 9:  # near-dup AFTER every base band expired -> admitted
            rows.append((3, base.replace("warm", "cold")))
        df = spark.createDataFrame(rows, "doc_id long, text string")
        surv = near_dedup_batch(df, batch_seq=seq, **kw)
        survived[seq] = sorted(r["doc_id"] for r in surv.collect())
        counts[seq] = _registry(spark, state, ttl=True).count()

    assert 1 in survived[0]
    assert 2 not in survived[2]          # within TTL: dropped
    assert 3 in survived[9]              # expired: re-admitted
    # Plateau: the registry after 21 batches is no bigger than shortly
    # after the first compaction — dead generations were deleted. Without
    # TTL it would hold ~16 bands x 24 docs and only ever grow.
    assert counts[20] <= counts[8]
    assert counts[20] < 16 * 10
    # Compaction at seq=20 left exactly one live generation directory.
    assert len(_gen_dirs(spark, state)) == 1
