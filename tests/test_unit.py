"""Fast no-Spark unit layer: durations, data model validation, store
hashing/caching, severity — mirrors the reference's test_duration/test_core/
test_store pyramid (SURVEY.md §5)."""

from __future__ import annotations

import time
from datetime import timedelta
from pathlib import Path

import pytest

from timefence_spark import (
    CSVSource,
    Feature,
    FeatureSet,
    Labels,
    ParquetSource,
    Source,
)
from timefence_spark._duration import (
    duration_seconds,
    format_duration,
    parse_duration,
)
from timefence_spark.core import flatten_features, safe_name
from timefence_spark.errors import TimefenceConfigError, TimefenceValidationError
from timefence_spark.results import classify_severity, format_leakage
from timefence_spark.store import Store


# ---------------------------------------------------------------------------
# Durations
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "text,expected",
    [
        ("30d", timedelta(days=30)),
        ("1d12h", timedelta(days=1, hours=12)),
        ("6h", timedelta(hours=6)),
        ("30m", timedelta(minutes=30)),
        ("15s", timedelta(seconds=15)),
        ("2d3h4m5s", timedelta(days=2, hours=3, minutes=4, seconds=5)),
        ("0", timedelta(0)),
    ],
)
def test_parse_duration(text, expected):
    assert parse_duration(text) == expected


@pytest.mark.parametrize("bad", ["", "abc", "3x", "h6", "1.5d", "-2d", "12"])
def test_parse_duration_rejects(bad):
    with pytest.raises(ValueError):
        parse_duration(bad)


@pytest.mark.parametrize("text", ["30d", "1d12h", "6h", "45m", "15s", "2d3h4m5s"])
def test_duration_round_trip(text):
    assert format_duration(parse_duration(text)) == text


def test_duration_passthrough_and_seconds():
    td = timedelta(hours=2)
    assert parse_duration(td) is td
    assert parse_duration(None) is None
    assert duration_seconds(td) == 7200
    assert format_duration(timedelta(0)) == "0d"


# ---------------------------------------------------------------------------
# Data model
# ---------------------------------------------------------------------------


def test_source_validation_and_format_detection(tmp_path):
    with pytest.raises(TimefenceValidationError):
        Source(keys="k", timestamp="t")  # neither path nor df
    with pytest.raises(TimefenceValidationError):
        Source("x.parquet", keys="k", timestamp="t", df=object())  # both
    with pytest.raises(TimefenceValidationError):
        Source("x.parquet", keys=[], timestamp="t")  # empty keys
    with pytest.raises(TimefenceValidationError):
        Source("x.unknown", keys="k", timestamp="t")  # undetectable format

    s = Source("events.parquet", keys="user_id", timestamp="ts")
    assert (s.name, s.format, s.keys) == ("events", "parquet", ["user_id"])
    assert Source("d.csv", keys="k", timestamp="t").format == "csv"
    # Spark parquet outputs are extensionless directories.
    assert Source("out_dir", keys="k", timestamp="t").format == "parquet"
    assert ParquetSource("x.pq", keys="k", timestamp="t").format == "parquet"
    assert CSVSource("x.csv", keys="k", timestamp="t").format == "csv"


def test_feature_mode_exclusivity_and_names():
    src = Source("events.parquet", keys="user_id", timestamp="ts")
    with pytest.raises(TimefenceConfigError):
        Feature(src)  # no mode
    with pytest.raises(TimefenceConfigError):
        Feature(src, columns="a", sql="SELECT 1")  # two modes
    with pytest.raises(TimefenceConfigError):
        Feature(src, columns=[])  # empty projection
    with pytest.raises(TimefenceConfigError):
        Feature(src, sql="SELECT 1")  # inline SQL requires a name
    with pytest.raises(TimefenceConfigError):
        Feature(src, columns="a", on_duplicate="bogus")

    f = Feature(src, columns={"amount": "spend", "n": "n"})
    assert f.name == "spend_n"  # derived from output names
    assert f.output_columns == ["spend", "n"]
    assert f.embargo == timedelta(0)

    def my_transform(spark, df):
        return df

    t = Feature(src, transform=my_transform, embargo="1d")
    assert t.name == "my_transform"
    assert t.embargo == timedelta(days=1)
    assert "my_transform" in t.definition_hash_input


def test_labels_and_featureset_flatten():
    lbl = Labels(path="labels.parquet", keys="uid", label_time="lt", target="y")
    assert lbl.keys == ["uid"] and lbl.target == ["y"]

    src = Source("e.parquet", keys="k", timestamp="ts")
    f1 = Feature(src, columns="a", name="f1")
    f2 = Feature(src, columns="b", name="f2")
    fs = FeatureSet("grp", [f2])
    flat = flatten_features([f1, fs])
    assert [f.name for f in flat] == ["f1", "f2"]
    assert len(fs) == 1


def test_safe_name():
    assert safe_name("my-feature.v2") == "my_feature_v2"
    assert safe_name("ok_name1") == "ok_name1"
    # Distinct raw names can collide after sanitization — the engine must
    # detect this (it is a build error); safe_name itself is deterministic.
    assert safe_name("a-b") == safe_name("a.b")


# ---------------------------------------------------------------------------
# Store: hashing + cache keys
# ---------------------------------------------------------------------------


def test_content_hash_deterministic_and_mtime_invalidation(tmp_path):
    store = Store(tmp_path / "store")
    f = tmp_path / "data.bin"
    f.write_bytes(b"hello")
    h1 = store.cached_content_hash(f)
    assert h1 == store.cached_content_hash(f) == Store.content_hash(f)

    time.sleep(0.01)  # ensure a new mtime_ns
    f.write_bytes(b"world")
    h2 = store.cached_content_hash(f)
    assert h2 != h1
    assert h2 == Store.content_hash(f)


def test_cache_keys_vary_with_inputs(tmp_path):
    store = Store(tmp_path / "store")
    base = store.feature_cache_key("def1", "src1", "1d")
    assert base == store.feature_cache_key("def1", "src1", "1d")
    assert base != store.feature_cache_key("def2", "src1", "1d")
    assert base != store.feature_cache_key("def1", "src2", "1d")
    assert base != store.feature_cache_key("def1", "src1", "2d")

    bk = store.build_cache_key("lh", ["a", "b"], "365d", None, "strict", "null")
    assert bk == store.build_cache_key("lh", ["b", "a"], "365d", None, "strict", "null")
    assert bk != store.build_cache_key("lh", ["a"], "365d", None, "strict", "null")
    assert bk != store.build_cache_key("lh", ["a", "b"], "365d", None, "inclusive", "null")


def test_store_manifest_roundtrip(tmp_path):
    store = Store(tmp_path / "store")
    p = store.save_build({"build_id": "b1", "output": {"path": "/x"}})
    assert Path(p).exists()
    assert store.get_build("b1")["build_id"] == "b1"
    assert store.get_build("missing") is None
    assert [b["build_id"] for b in store.list_builds()] == ["b1"]


# ---------------------------------------------------------------------------
# Severity / formatting
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "pct,leak,expected",
    [
        (0.06, None, "HIGH"),  # >5% of rows
        (0.005, timedelta(days=8), "HIGH"),  # >7d magnitude
        (0.02, None, "MEDIUM"),  # >1% of rows
        (0.005, timedelta(days=1), "MEDIUM"),  # >=1d magnitude
        (0.005, timedelta(hours=12), "LOW"),
        (0.0, None, "LOW"),
    ],
)
def test_classify_severity(pct, leak, expected):
    assert classify_severity(pct, leak) == expected


def test_format_leakage():
    assert format_leakage(timedelta(days=2)) == "2 days"
    assert format_leakage(timedelta(hours=3)) == "3 hours"
    assert format_leakage(timedelta(minutes=1)) == "1 minute"
    assert format_leakage(timedelta(seconds=42)) == "42 seconds"


def test_from_dbt_stub_raises():
    import timefence_spark as tf

    with pytest.raises(NotImplementedError, match="dbt"):
        tf.from_dbt()


def test_bpe_tokenizer_save_load_roundtrip(tmp_path):
    """Frozen-tokenizer artifact: merges (+ optional vocab) round-trip
    through JSON; foreign files are rejected."""
    import pytest as _pytest

    from timefence_spark.operators import bpe

    m = [("a", "b"), ("ab", "c")]
    v = ["a", "ab", "abc", "b", "c"]
    p = tmp_path / "tok" / "bpe.json"
    bpe.save_tokenizer(p, merges=m, vocab=v)
    assert bpe.load_tokenizer(p) == (m, v, "whitespace")
    bpe.save_tokenizer(p, merges=m)
    assert bpe.load_tokenizer(p) == (m, None, "whitespace")
    # the training mode is part of the model and round-trips (ADVICE r12)
    bpe.save_tokenizer(p, merges=m, vocab=v, pretokenize="byte")
    assert bpe.load_tokenizer(p) == (m, v, "byte")
    bpe.save_tokenizer(p, merges=m, vocab=v, pretokenize="gpt2")
    assert bpe.load_tokenizer(p) == (m, v, "gpt2")
    # version-1 artifacts predate the field and load as whitespace
    import json as _json

    v1 = _json.loads(p.read_text())
    del v1["pretokenize"]
    v1["version"] = 1
    p.write_text(_json.dumps(v1))
    assert bpe.load_tokenizer(p) == (m, v, "whitespace")
    p.write_text('{"format": "other"}')
    with _pytest.raises(ValueError, match="not a timefence-spark BPE"):
        bpe.load_tokenizer(p)


def test_bpe_memo_cap_degrades_to_reencoding(monkeypatch):
    """ADVICE r10 (low): the per-worker word-type memos are capped —
    pathological type cardinality (unique ids, hashes) must clear the
    memo and re-encode, never grow it unboundedly, and the cap must not
    change any count."""
    from timefence_spark.operators import bpe

    words = [f"tokn{i}xy" for i in range(50)]
    text = " ".join(words)
    uncapped = bpe.make_token_counter(bpe.VENDORED_MERGES)(text)
    monkeypatch.setattr(bpe, "_MEMO_CAP", 8)
    capped_counter = bpe.make_token_counter(bpe.VENDORED_MERGES)
    assert capped_counter(text) == uncapped
    assert capped_counter(text) == uncapped  # second pass over cleared memo


def _load_bench():
    """Import bench.py as a throwaway module (it lives outside the
    package, at the repo root)."""
    import importlib.util
    import os
    import sys

    spec = importlib.util.spec_from_file_location(
        "bench_mod",
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "bench.py"),
    )
    bench = importlib.util.module_from_spec(spec)
    sys.modules["bench_mod"] = bench
    try:
        spec.loader.exec_module(bench)
    finally:
        sys.modules.pop("bench_mod", None)
    return bench


def test_bench_suite_validity_gate(tmp_path):
    """bench.py's whole-suite sanity check (VERDICT r11 item 1): a
    uniformly slower run must be marked DEGRADED_RUN and carry the clean
    reference forward; a normal run passes; a missing/corrupt previous
    record degrades to 'no_previous_record' instead of crashing."""
    import json

    bench = _load_bench()

    prev = {
        "suite": "12q@abc",
        "queries": {f"q{i}": 1.0 for i in range(12)},
    }
    p = tmp_path / "BENCH_DETAIL.json"
    p.write_text(json.dumps(prev))

    ok = bench._suite_validity({f"q{i}": 1.05 for i in range(12)}, str(p))
    assert ok["status"] == "ok" and ok["shared_queries"] == 12

    bad = bench._suite_validity({f"q{i}": 1.4 for i in range(12)}, str(p))
    assert bad["status"] == "DEGRADED_RUN"
    assert bad["median_ratio_vs_prev"] == 1.4
    assert bad["reference_queries"] == prev["queries"]

    # A degraded record must NOT become the base: next run compares
    # against the carried-forward clean reference.
    degraded_record = {
        "suite": "12q@abc",
        "queries": {f"q{i}": 1.4 for i in range(12)},
        "suite_validity": bad,
    }
    p.write_text(json.dumps(degraded_record))
    nxt = bench._suite_validity({f"q{i}": 1.02 for i in range(12)}, str(p))
    assert nxt["status"] == "ok"
    assert nxt["median_ratio_vs_prev"] == 1.02  # vs 1.0, not 1.4

    assert bench._suite_validity(
        {f"q{i}": 1.0 for i in range(12)}, str(tmp_path / "missing.json")
    )["status"] == "no_previous_record"
    assert bench._suite_validity({"q0": 1.0}, str(p))[
        "status"
    ] == "insufficient_overlap"


def test_scale_requote_needed():
    """Scale-row requote eligibility (round 13, own test since round 14 —
    ADVICE r13): 2-timed-run scenarios ARE covered — a host-steal window
    landing on one of two runs leaves no third sample for the trim to
    drop, which is exactly the case the backstop exists for. Stable
    pairs and sub-floor gaps must not burn a re-run."""
    bench = _load_bench()

    assert bench._scale_requote_needed([76.709, 19.134])  # steal window
    assert bench._scale_requote_needed([38.849, 16.353])
    # ADVICE r13: 2-sample sets normalize by the FASTER run, so a
    # moderate steal window (slow/fast between 1.5x and 2x — the 10-15%
    # steal the round root-caused) now fires like a 3-run set would.
    assert bench._scale_requote_needed([28.0, 16.0])  # 1.75x
    assert not bench._scale_requote_needed([23.567, 18.294])  # stable
    assert not bench._scale_requote_needed([1.2, 0.9])  # sub-floor gap
    assert not bench._scale_requote_needed([10.0])  # single sample
    # 4-run sets keep the pre-existing behavior (trim of 3 fastest).
    assert bench._scale_requote_needed([121.8, 33.4, 39.5, 96.6])
    assert not bench._scale_requote_needed([13.9, 12.3, 16.1, 20.8])


def test_bench_wall_budget_machinery(monkeypatch):
    """VERDICT r13 item 1: the bench must always deliver its one-line
    JSON — optional scenarios are skipped under budget pressure, core
    ones only when the budget is effectively gone, and the skip is
    always a marked artifact row."""
    bench = _load_bench()

    # Exhausted budget: _budget_left() goes negative, steal sampler
    # still returns an int on this host.
    monkeypatch.setattr(bench, "WALL_BUDGET_SEC", 0.0)
    assert bench._budget_left() <= 0.0
    st = bench._steal_ticks()
    assert st is None or isinstance(st, int)

    # Optional scenarios are classified for skipping; core ones are not.
    assert "1m_x50" in bench.OPTIONAL_SCENARIOS
    assert "clustered_read" in bench.OPTIONAL_SCENARIOS
    assert "1m_x10" not in bench.OPTIONAL_SCENARIOS
    assert "10m_x10" not in bench.OPTIONAL_SCENARIOS
    # Every scale-section label has a budget estimate.
    for label, *_ in bench.SCALE_CONFIGS:
        assert label in bench.SCENARIO_EST_SEC
