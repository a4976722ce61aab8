"""CLI tests via click's CliRunner (reference tests/test_cli.py model)."""

from __future__ import annotations

import json
from pathlib import Path

import pytest
from click.testing import CliRunner

from timefence_spark.cli import cli


@pytest.fixture(scope="module")
def project(tmp_path_factory, spark):
    """A generated quickstart project (smallest usable scale)."""
    import timefence_spark.quickstart as qs

    old_users = qs.N_USERS
    qs.N_USERS = 100
    try:
        target = tmp_path_factory.mktemp("qs")
        qs.create_quickstart(target)
    finally:
        qs.N_USERS = old_users
    return target


def _run(args, cwd: Path):
    runner = CliRunner()
    import os

    old = os.getcwd()
    os.chdir(cwd)
    try:
        return runner.invoke(cli, args, catch_exceptions=False)
    finally:
        os.chdir(old)


def test_init(tmp_path):
    res = _run(["init"], tmp_path)
    assert res.exit_code == 0
    assert (tmp_path / "timefence.yaml").exists()
    res2 = _run(["init"], tmp_path)
    assert res2.exit_code != 0  # already exists


def test_build_dry_run(project):
    res = _run(["build", "--dry-run"], project)
    assert res.exit_code == 0
    assert "JOIN PLAN" in res.output
    assert "rolling_spend_30d" in res.output


def test_build_and_catalog(project, spark):
    res = _run(["build"], project)
    assert res.exit_code == 0, res.output
    assert "Building training set..." in res.output
    assert "Written" in res.output
    assert (project / "train.parquet").exists()

    res = _run(["catalog"], project)
    assert res.exit_code == 0
    assert "audit=PASS" in res.output


def test_audit_strict_exit_code(project, spark):
    res = _run(
        ["audit", "train_LEAKY.parquet", "--keys", "user_id", "--strict"], project
    )
    assert res.exit_code == 1  # leakage detected -> nonzero under --strict
    assert "LEAK" in res.output

    json_path = project / "report.json"
    res = _run(
        ["audit", "train_LEAKY.parquet", "--keys", "user_id", "--json", str(json_path)],
        project,
    )
    assert res.exit_code == 0
    report = json.loads(json_path.read_text())
    assert report["has_leakage"] is True


def test_audit_temporal_mode(project, spark):
    res = _run(
        [
            "audit",
            "train_LEAKY.parquet",
            "--feature-time-column",
            "spend=rolling_spend_30d__feature_time",
        ],
        project,
    )
    assert res.exit_code == 0
    assert "LEAK" in res.output


def _install_fake_rich(monkeypatch):
    """Minimal rich stand-in (rich is not installable in this environment):
    records Console.print calls so tests can assert the rich path ran."""
    import sys
    import types

    printed = []

    class FakeConsole:
        def print(self, *args, **kwargs):
            printed.append(" ".join(str(a) for a in args))

    class FakeTable:
        def __init__(self, *args, **kwargs):
            self.rows = []

        def add_column(self, *args, **kwargs):
            pass

        def add_row(self, *cells):
            self.rows.append(cells)

        def __str__(self):
            return "\n".join(" | ".join(str(c) for c in r) for r in self.rows)

    rich_mod = types.ModuleType("rich")
    console_mod = types.ModuleType("rich.console")
    console_mod.Console = FakeConsole
    table_mod = types.ModuleType("rich.table")
    table_mod.Table = FakeTable
    rich_mod.console = console_mod
    rich_mod.table = table_mod
    for name, mod in [
        ("rich", rich_mod),
        ("rich.console", console_mod),
        ("rich.table", table_mod),
    ]:
        monkeypatch.setitem(sys.modules, name, mod)
    return printed


def test_audit_renders_with_rich_when_available(project, spark, monkeypatch):
    monkeypatch.delenv("TIMEFENCE_SPARK_PLAIN", raising=False)
    printed = _install_fake_rich(monkeypatch)
    res = _run(
        ["audit", "train_LEAKY.parquet", "--keys", "user_id"], project
    )
    assert res.exit_code == 0
    joined = "\n".join(printed)
    assert "TEMPORAL AUDIT REPORT" in joined
    assert "LEAK" in joined
    # click path not used for the report body when rich renders it
    assert "TEMPORAL AUDIT REPORT" not in res.output


def test_audit_plain_env_forces_ansi_fallback(project, spark, monkeypatch):
    printed = _install_fake_rich(monkeypatch)
    monkeypatch.setenv("TIMEFENCE_SPARK_PLAIN", "1")
    res = _run(
        ["audit", "train_LEAKY.parquet", "--keys", "user_id"], project
    )
    assert res.exit_code == 0
    assert "TEMPORAL AUDIT REPORT" in res.output
    assert printed == []


def test_inspect(project):
    res = _run(["inspect", "labels.parquet"], project)
    assert res.exit_code == 0
    assert "Suggested keys: ['user_id']" in res.output


def test_doctor(project):
    res = _run(["doctor"], project)
    assert res.exit_code == 0, res.output
    assert "[OK ] features file" in res.output


def test_explain_command(project):
    res = _run(["explain"], project)
    assert res.exit_code == 0
    assert "JOIN PLAN" in res.output


def test_features_file_selector(project):
    res = _run(
        ["build", "--dry-run", "--features", "features.py:rolling_spend_30d"], project
    )
    assert res.exit_code == 0
    assert "rolling_spend_30d" in res.output
    assert "user_country" not in res.output


def test_build_partition_by_and_skew_bucket(project, spark):
    res = _run(
        ["build", "-o", "train_dir", "--partition-by", "user_country__country",
         "--skew-bucket", "90d"],
        project,
    )
    assert res.exit_code == 0, res.output
    parts = [p.name for p in (project / "train_dir").iterdir() if p.is_dir()]
    assert any(p.startswith("user_country__country=") for p in parts)


def test_parquet_columns_sees_hive_partition_cols(project, spark):
    """Partition columns live in key=value dir names, not footers — schema
    inference over a partitioned output must still report them."""
    from timefence_spark.cli import _parquet_columns

    res = _run(
        ["build", "-o", "train_hive", "--partition-by", "user_country__country"],
        project,
    )
    assert res.exit_code == 0, res.output
    cols = _parquet_columns(project / "train_hive")
    assert "user_country__country" in cols
    assert "user_id" in cols


def test_inspect_profiles_in_one_pass(project):
    res = _run(["inspect", "users.parquet"], project)
    assert res.exit_code == 0, res.output
    assert "rows" in res.output
    assert "user_id" in res.output
    assert "Suggested keys" in res.output
    assert "Suggested timestamp" in res.output


def test_corpus_clean_command(tmp_path, spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog near the river bank today", "en"),
            (2, "the quick brown fox jumps over the lazy dog near the river bank today", "en"),
            (3, "mail me at bob@example.com about the next meeting agenda and notes", "en"),
            (4, "short", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    inp = str(tmp_path / "docs.parquet")
    out = str(tmp_path / "clean.parquet")
    docs.write.parquet(inp)
    res = _run(
        [
            "corpus-clean", "--input", inp, "--output", out,
            "--dedup", "exact", "--redact-pii",
            "--split", "train=0.8,val=0.2", "--json",
        ],
        tmp_path,
    )
    assert res.exit_code == 0, res.output
    summary = json.loads(res.output.strip().splitlines()[-1])
    assert summary["rows_in"] == 4
    assert summary["rows_out"] == 3                      # exact dedup drops one
    assert "dedup_exact" in summary["stages"]
    cleaned = spark.read.parquet(out)
    assert "split" in cleaned.columns
    assert cleaned.where(cleaned.text.contains("@")).count() == 0

    bad = _run(
        ["corpus-clean", "--input", inp, "--output", out, "--split", "oops"],
        tmp_path,
    )
    assert bad.exit_code != 0


def test_corpus_inspect_command(tmp_path, spark):
    docs = spark.createDataFrame(
        [
            (1, "the cat and the dog sat with it for a while in the sun today", "en"),
            (2, "the cat and the dog sat with it for a while in the sun today", "en"),
            (3, "mail bob@x.example.org for details on the plan and the agenda", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    inp = str(tmp_path / "d.parquet")
    docs.write.parquet(inp)
    res = _run(["corpus-inspect", "--input", inp, "--json"], tmp_path)
    assert res.exit_code == 0, res.output
    rep = json.loads(res.output.strip().splitlines()[-1])
    assert rep["n_docs"] == 3 and rep["n_distinct_texts"] == 2
    assert rep["pii_doc_pct"] == pytest.approx(33.33, abs=0.01)


def test_corpus_clean_error_paths(tmp_path, spark):
    docs = spark.createDataFrame([(1, "x", "en")], "doc_id long, text string, lang string")
    inp = str(tmp_path / "e.parquet")
    out = str(tmp_path / "o.parquet")
    docs.write.parquet(inp)
    base = ["corpus-clean", "--input", inp, "--output", out, "--dedup", "none"]
    r1 = _run(base + ["--split", "train=0.5,val=0.3"], tmp_path)  # sums to 0.8
    assert r1.exit_code != 0 and "sum to 1.0" in r1.output
    r2 = _run(base + ["--blocklist", str(tmp_path / "missing.txt")], tmp_path)
    assert r2.exit_code != 0 and "blocklist" in r2.output
    r3 = _run(base + ["--languages", " , "], tmp_path)
    assert r3.exit_code != 0 and "empty" in r3.output


def test_corpus_clean_new_gates(tmp_path, spark):
    """Round-6 gates from the CLI: substring-dup ceiling, classifier
    floor (weights from a JSON file), and their error paths."""
    boiler = "one two three four five six seven eight nine ten"
    rows = [
        (1, boiler + " unique tail one table query data"),
        (2, boiler + " other ending words here table query"),
        (3, "completely different text about slow dup spam spam"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    inp = str(tmp_path / "g.parquet")
    out = str(tmp_path / "go.parquet")
    docs.write.parquet(inp)
    base = ["corpus-clean", "--input", inp, "--output", out, "--dedup", "none"]

    # doc 2 repeats doc 1's 10-token boilerplate head -> high dup fraction
    r = _run(base + ["--max-substring-dup", "0.2", "--json"], tmp_path)
    assert r.exit_code == 0, r.output
    summary = json.loads(r.output.strip().splitlines()[-1])
    assert summary["rows_out"] == 2  # doc 2 dropped

    wfile = tmp_path / "w.json"
    wfile.write_text(json.dumps({"table": 3.0, "query": 2.0, "spam": -3.0}))
    r = _run(
        base + ["--clf-weights", str(wfile), "--min-clf-score", "0.5", "--json"],
        tmp_path,
    )
    assert r.exit_code == 0, r.output
    summary = json.loads(r.output.strip().splitlines()[-1])
    assert summary["rows_out"] == 2  # spammy doc 3 dropped

    r = _run(base + ["--min-clf-score", "0.5"], tmp_path)
    assert r.exit_code != 0 and "--clf-weights" in r.output
    bad = tmp_path / "bad.json"
    bad.write_text("[]")
    r = _run(base + ["--min-clf-score", "0.5", "--clf-weights", str(bad)], tmp_path)
    assert r.exit_code != 0 and "non-empty JSON object" in r.output


def test_corpus_clean_round7_gates(tmp_path, spark):
    """Round-7 stages from the CLI: exact-substring removal rewrites the
    text in place, and --semantic-embeddings drops the planted
    identical-embedding doc."""
    boiler = "one two three four five six seven eight nine ten"
    rows = [
        (1, boiler + " unique tail alpha beta gamma delta"),
        (2, boiler + " other ending words here epsilon zeta"),
        (3, "completely different text with enough tokens to stand alone"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    inp = str(tmp_path / "r7.parquet")
    out = str(tmp_path / "r7o.parquet")
    docs.write.parquet(inp)
    base = ["corpus-clean", "--input", inp, "--output", out, "--dedup", "none"]

    r = _run(base + ["--remove-substring-dups", "--json"], tmp_path)
    assert r.exit_code == 0, r.output
    summary = json.loads(r.output.strip().splitlines()[-1])
    assert summary["rows_out"] == 3  # removal edits text, drops nothing
    assert "remove_substring_dups" in summary["stages"]
    cleaned = {r_["doc_id"]: r_["text"] for r_ in spark.read.parquet(out).collect()}
    assert cleaned[1].startswith(boiler)          # first occurrence intact
    assert not cleaned[2].startswith("one two")   # later occurrence cut

    import numpy as np

    rng = np.random.default_rng(3)
    v1 = [float(x) for x in rng.normal(size=8)]
    v3 = [float(x) for x in rng.normal(size=8)]
    emb = spark.createDataFrame(
        [(1, v1), (2, v1), (3, v3)], "doc_id long, embedding array<double>"
    )
    epath = str(tmp_path / "emb.parquet")
    emb.write.parquet(epath)
    r = _run(
        base
        + [
            "--semantic-embeddings", epath,
            "--semantic-threshold", "0.999",
            "--semantic-clusters", "2",
            "--json",
        ],
        tmp_path,
    )
    assert r.exit_code == 0, r.output
    summary = json.loads(r.output.strip().splitlines()[-1])
    assert summary["rows_out"] == 2  # doc 2 shares doc 1's vector -> dropped
    kept = {r_["doc_id"] for r_ in spark.read.parquet(out).collect()}
    assert kept == {1, 3}


def test_corpus_clean_strip_html_and_bigram_fluency(tmp_path, spark):
    """--strip-html extracts text before every other stage, and
    --fluency-model bigram routes --max-nll through the interpolated
    bigram LM (a huge ceiling keeps all docs; the stage label records
    the model)."""
    docs = spark.createDataFrame(
        [
            (1, "<html><body><script>x()</script><p>the quick brown fox jumps over the lazy dog</p></body></html>"),
            (2, "<p>an entirely different document about rivers and banks today</p>"),
        ],
        "doc_id long, text string",
    )
    inp = str(tmp_path / "docs_html.parquet")
    out = str(tmp_path / "clean_html.parquet")
    docs.write.parquet(inp)
    res = _run(
        [
            "corpus-clean", "--input", inp, "--output", out,
            "--dedup", "none", "--strip-html",
            "--max-nll", "1e9", "--fluency-model", "bigram", "--json",
        ],
        tmp_path,
    )
    assert res.exit_code == 0, res.output
    summary = json.loads(res.output.strip().splitlines()[-1])
    assert "strip_html" in summary["stages"]
    assert "fluency[bigram] nll<=1000000000.0" in summary["stages"]
    assert summary["rows_out"] == 2
    cleaned = {r["doc_id"]: r["text"] for r in spark.read.parquet(out).collect()}
    assert cleaned[1] == "the quick brown fox jumps over the lazy dog"
    assert "<p>" not in cleaned[2]


def test_corpus_clean_semantic_decontamination(tmp_path, spark):
    """--semantic-bench-embeddings drops corpus docs whose embedding
    matches a benchmark item; requires the corpus-side table."""
    docs = spark.createDataFrame(
        [(1, "contaminated text body"), (2, "a clean document body")],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "doc_id long, embedding array<double>",
    )
    bench = spark.createDataFrame(
        [(500, [1.0, 0.0])], "doc_id long, embedding array<double>"
    )
    inp = str(tmp_path / "d.parquet")
    ep = str(tmp_path / "e.parquet")
    bp = str(tmp_path / "b.parquet")
    out = str(tmp_path / "o.parquet")
    docs.write.parquet(inp)
    emb.write.parquet(ep)
    bench.write.parquet(bp)
    res = _run(
        [
            "corpus-clean", "--input", inp, "--output", out,
            "--dedup", "none",
            "--semantic-embeddings", ep,
            "--semantic-bench-embeddings", bp,
            "--semantic-clusters", "1", "--semantic-threshold", "0.99",
            "--json",
        ],
        tmp_path,
    )
    assert res.exit_code == 0, res.output
    summary = json.loads(res.output.strip().splitlines()[-1])
    assert any(s.startswith("semantic_decontam") for s in summary["stages"])
    kept = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert kept == {2}

    bad = _run(
        [
            "corpus-clean", "--input", inp, "--output", out,
            "--dedup", "none", "--semantic-bench-embeddings", bp,
        ],
        tmp_path,
    )
    assert bad.exit_code != 0
    assert "requires --semantic-embeddings" in bad.output


def test_corpus_train_classifier_and_clean_round8_flags(tmp_path, spark):
    """Round-8 CLI surface: train NB weights from a labeled parquet,
    gate a corpus with the weights table, keep fluency buckets, and
    write shuffled JSONL output."""
    rows = [
        (1, "alpha alpha beta common good words here", True),
        (2, "alpha common beta nice words again here", True),
        (3, "zed zed junk common spam words here", False),
        (4, "junk zed common spam again words here", False),
    ]
    labeled = spark.createDataFrame(
        rows, "doc_id long, text string, is_good boolean"
    )
    inp = str(tmp_path / "labeled.parquet")
    wout = str(tmp_path / "weights.parquet")
    labeled.write.parquet(inp)

    r = _run(
        ["corpus-train-classifier", "--input", inp, "--output", wout,
         "--label-col", "is_good", "--json"],
        tmp_path,
    )
    assert r.exit_code == 0, r.output
    summary = json.loads(r.output.strip().splitlines()[-1])
    assert summary["vocab_size"] > 0
    wdf = spark.read.parquet(wout)
    assert {"word", "weight"} <= set(wdf.columns)

    out = str(tmp_path / "clean_out")
    r = _run(
        ["corpus-clean", "--input", inp, "--output", out,
         "--dedup", "none",
         "--clf-weights-table", wout, "--min-clf-score", "0.5",
         "--shuffle-salt", "e0", "--output-format", "jsonl", "--json"],
        tmp_path,
    )
    assert r.exit_code == 0, r.output
    summary = json.loads(r.output.strip().splitlines()[-1])
    assert summary["format"] == "jsonl"
    assert summary["rows_out"] == 2  # NB separates: junk docs gated
    assert any("classifier" in s for s in summary["stages"])
    assert any("shuffle" in s for s in summary["stages"])
    kept = spark.read.json(out)
    assert {r_.doc_id for r_ in kept.collect()} == {1, 2}

    # fluency buckets: keep head+middle drops the least fluent tercile
    out2 = str(tmp_path / "clean_fluency")
    r = _run(
        ["corpus-clean", "--input", inp, "--output", out2,
         "--dedup", "none",
         "--keep-fluency-buckets", "head,middle", "--json"],
        tmp_path,
    )
    assert r.exit_code == 0, r.output
    summary = json.loads(r.output.strip().splitlines()[-1])
    assert 0 < summary["rows_out"] < 4

    # error paths: both weight sources / neither; bad bucket name
    r = _run(
        ["corpus-clean", "--input", inp, "--output", out,
         "--min-clf-score", "0.5"],
        tmp_path,
    )
    assert r.exit_code != 0
    r = _run(
        ["corpus-clean", "--input", inp, "--output", out,
         "--keep-fluency-buckets", "torso"],
        tmp_path,
    )
    assert r.exit_code != 0
    r = _run(
        ["corpus-train-classifier", "--input", inp, "--output", wout,
         "--label-col", "nope"],
        tmp_path,
    )
    assert r.exit_code != 0


def test_corpus_clean_token_budgets(tmp_path, spark):
    """--token-budgets mixes by token quota (whitespace counts computed
    on the fly); bad specs and unknown strata columns fail fast."""
    rows = [
        (i, ("w " * 20).strip(), "big" if i < 30 else "small")
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, src string")
    inp = str(tmp_path / "tb.parquet")
    out = str(tmp_path / "tb_out")
    docs.write.parquet(inp)
    base = ["corpus-clean", "--input", inp, "--output", out, "--dedup", "none"]

    r = _run(
        base + ["--token-budgets", "big=100",
                "--token-budget-strata", "src", "--json"],
        tmp_path,
    )
    assert r.exit_code == 0, r.output
    summary = json.loads(r.output.strip().splitlines()[-1])
    # each doc is exactly 20 tokens; budget 100 keeps 5 'big' docs;
    # 'small' (10 docs) has no quota and keeps everything
    assert summary["rows_out"] == 15
    assert any("token_budgets" in s for s in summary["stages"])
    kept = spark.read.parquet(out)
    assert kept.where("src = 'big'").count() == 5

    r = _run(base + ["--token-budgets", "big=oops"], tmp_path)
    assert r.exit_code != 0
    r = _run(
        base + ["--token-budgets", "big=1", "--token-budget-strata", "nope"],
        tmp_path,
    )
    assert r.exit_code != 0


def test_corpus_clean_token_budgets_with_existing_n_tokens(tmp_path, spark):
    """A corpus that already carries an n_tokens column must not trip an
    ambiguous-column error in --token-budgets (code-review r8 finding)."""
    rows = [(i, ("w " * 10).strip(), "s0", 999) for i in range(10)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, src string, n_tokens long"
    )
    inp = str(tmp_path / "tb2.parquet")
    out = str(tmp_path / "tb2_out")
    docs.write.parquet(inp)
    r = _run(
        ["corpus-clean", "--input", inp, "--output", out, "--dedup", "none",
         "--token-budgets", "s0=50", "--token-budget-strata", "src",
         "--json"],
        tmp_path,
    )
    assert r.exit_code == 0, r.output
    summary = json.loads(r.output.strip().splitlines()[-1])
    assert summary["rows_out"] == 5  # 50-token quota / 10-token docs
    kept = spark.read.parquet(out)
    assert "n_tokens" in kept.columns  # the user's column survives


def test_corpus_train_bpe_cli(tmp_path, spark):
    """Round-9 CLI surface: learn a BPE merge table from a corpus
    parquet; the written merges match the sequential Python trainer on
    the same text and plug back into token counting."""
    from timefence_spark.operators import bpe

    rows = [
        (1, "low lower lowest low low newer newest new"),
        (2, "wider wide widest new newer lower the the the"),
    ]
    inp = str(tmp_path / "docs.parquet")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(inp)
    out = str(tmp_path / "merges.parquet")
    r = _run(
        ["corpus-train-bpe", "--input", inp, "--output", out,
         "--n-merges", "20", "--json"],
        tmp_path,
    )
    assert r.exit_code == 0, r.output
    summary = json.loads(r.output.strip().splitlines()[-1])
    assert 0 < summary["n_merges_learned"] <= 20

    got = [
        (row["lhs"], row["rhs"])
        for row in spark.read.parquet(out).orderBy("merge_rank").collect()
    ]
    ref = bpe.train_bpe(" ".join(t for _, t in rows), n_merges=20)
    assert got == ref

    counter = bpe.make_token_counter(got)
    assert counter("low lower") == len(bpe.encode("low", dict(
        (p, i) for i, p in enumerate(got)
    ))) + len(bpe.encode("lower", dict((p, i) for i, p in enumerate(got))))

    # --save-tokenizer writes the frozen train-once artifact
    tok = str(tmp_path / "tok.json")
    r = _run(
        ["corpus-train-bpe", "--input", inp, "--output", out,
         "--n-merges", "20", "--save-tokenizer", tok, "--json"],
        tmp_path,
    )
    assert r.exit_code == 0, r.output
    merges2, vocab2, pre2 = bpe.load_tokenizer(tok)
    assert pre2 == "whitespace"
    assert merges2 == got
    assert vocab2 == sorted(set(vocab2))  # lexicographic id space
    assert all(a + b in vocab2 for a, b in merges2)


def test_corpus_clean_url_dedup_stage(tmp_path, spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta", "https://a.example.org/p/1"),
            (2, "epsilon zeta eta theta", "HTTPS://A.Example.ORG:443/p/1?utm_source=x#f"),
            (3, "iota kappa lambda mu", "https://a.example.org/p/2"),
            (4, "nu xi omicron pi", None),
        ],
        "doc_id long, text string, url string",
    )
    inp = str(tmp_path / "docs_url.parquet")
    out = str(tmp_path / "clean_url.parquet")
    docs.write.parquet(inp)
    res = _run(
        [
            "corpus-clean", "--input", inp, "--output", out,
            "--dedup", "none", "--dedup-url-col", "url", "--json",
        ],
        tmp_path,
    )
    assert res.exit_code == 0, res.output
    summary = json.loads(res.output.strip().splitlines()[-1])
    assert summary["rows_in"] == 4
    assert summary["rows_out"] == 3            # re-fetch of /p/1 dropped
    assert "dedup_urls(url)" in summary["stages"]
    kept = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert kept == {1, 3, 4}                   # min id kept; NULL url kept


@pytest.mark.slow
def test_cli_embeddings_index_and_search(spark, tmp_path):
    """embeddings-build-index + embeddings-search (round 11): the
    persisted IVF-PQ workflow end-to-end from the CLI, including the
    rerank path and parquet output."""
    import json as _json

    from click.testing import CliRunner

    from timefence_spark.cli import cli
    from timefence_spark.sources.readers import read_parquet

    src = "/root/testdata/sf0.001/embeddings.parquet"
    idx = str(tmp_path / "idx")
    res = CliRunner().invoke(
        cli,
        [
            "embeddings-build-index", "--input", src, "--output", idx,
            "--nlist", "8", "--m", "8", "--nbits", "4", "--json",
        ],
    )
    assert res.exit_code == 0, res.output
    assert _json.loads(res.output.strip().splitlines()[-1])["nlist"] == 8
    out = str(tmp_path / "results")
    res2 = CliRunner().invoke(
        cli,
        [
            "embeddings-search", "--index", idx, "--queries", src,
            "--output", out, "--k", "3", "--nprobe", "4",
            "--rerank", src, "--json",
        ],
    )
    assert res2.exit_code == 0, res2.output
    got = read_parquet(spark, out)
    assert set(got.columns) >= {"query_id", "neighbor_id", "cosine", "rank"}
    assert got.where("rank > 3").count() == 0
    assert got.count() > 0

    # embeddings-append-index (round 12): grow the same index from the
    # CLI against the frozen model; the meta generation bumps and a
    # fresh search still returns rows.
    res3 = CliRunner().invoke(
        cli,
        [
            "embeddings-append-index", "--index", idx, "--input", src,
            "--json",
        ],
    )
    assert res3.exit_code == 0, res3.output
    assert _json.loads(
        res3.output.strip().splitlines()[-1]
    )["generation"] == 2
    out2 = str(tmp_path / "results2")
    res4 = CliRunner().invoke(
        cli,
        [
            "embeddings-search", "--index", idx, "--queries", src,
            "--output", out2, "--k", "3", "--nprobe", "4", "--json",
        ],
    )
    assert res4.exit_code == 0, res4.output
    assert read_parquet(spark, out2).count() > 0


def test_corpus_train_tokenizer_hf_format_and_byte_pretokenize(
    tmp_path, spark
):
    """corpus-train-tokenizer (rounds 12-13): --tokenizer-format hf
    writes a HuggingFace tokenizer.json the generic loader reads back
    (--pretokenize gpt2 -> ByteLevel pre_tokenizer); --pretokenize byte
    still trains + saves natively but is REJECTED for hf export (no
    equivalent pre_tokenizer — ADVICE r12), and byte/gpt2 modes are
    rejected for non-BPE families."""
    import json as _json

    from click.testing import CliRunner

    from timefence_spark.cli import cli
    from timefence_spark.operators.hf_tokenizer import load_hf_tokenizer

    src = tmp_path / "docs.parquet"
    spark.createDataFrame(
        [(i, "héllo wörld héllo wörld pack the rows") for i in range(3)],
        "doc_id long, text string",
    ).write.parquet(str(src))
    out = tmp_path / "model.parquet"
    tok = tmp_path / "tokenizer.json"
    res = CliRunner().invoke(
        cli,
        [
            "corpus-train-tokenizer", "--input", str(src),
            "--output", str(out), "--model", "bpe",
            "--n-merges", "10", "--pretokenize", "gpt2",
            "--save-tokenizer", str(tok),
            "--tokenizer-format", "hf", "--json",
        ],
        catch_exceptions=False,
    )
    assert res.exit_code == 0, res.output
    summary = _json.loads(res.output.strip().splitlines()[-1])
    assert summary["pretokenize"] == "gpt2"
    assert summary["tokenizer_format"] == "hf"
    data = _json.loads(tok.read_text())
    assert data["pre_tokenizer"]["type"] == "ByteLevel"
    loaded = load_hf_tokenizer(tok)
    assert loaded["type"] == "bpe" and len(loaded["merges"]) == 10
    assert loaded["pretokenize"] == "gpt2"
    # byte-level: the non-ASCII chars only ever appear byte-rendered
    assert all("é" not in l + r for l, r in loaded["merges"])
    stored = spark.read.parquet(str(out)).orderBy("merge_rank").collect()
    assert [(r["lhs"], r["rhs"]) for r in stored] == loaded["merges"]

    # --pretokenize byte trains and saves natively...
    tok_b = tmp_path / "tok_byte.json"
    res_b = CliRunner().invoke(
        cli,
        [
            "corpus-train-tokenizer", "--input", str(src),
            "--output", str(tmp_path / "mb.parquet"), "--model", "bpe",
            "--n-merges", "5", "--pretokenize", "byte",
            "--save-tokenizer", str(tok_b), "--json",
        ],
        catch_exceptions=False,
    )
    assert res_b.exit_code == 0, res_b.output
    from timefence_spark.operators import bpe as bpe_ops

    _, _, pre_b = bpe_ops.load_tokenizer(tok_b)
    assert pre_b == "byte"
    # ...but byte + hf export is a usage error
    res_bh = CliRunner().invoke(
        cli,
        [
            "corpus-train-tokenizer", "--input", str(src),
            "--output", str(tmp_path / "mbh.parquet"), "--model", "bpe",
            "--n-merges", "5", "--pretokenize", "byte",
            "--save-tokenizer", str(tmp_path / "t.json"),
            "--tokenizer-format", "hf",
        ],
        catch_exceptions=False,
    )
    assert res_bh.exit_code != 0
    assert "gpt2" in res_bh.output

    res2 = CliRunner().invoke(
        cli,
        [
            "corpus-train-tokenizer", "--input", str(src),
            "--output", str(tmp_path / "m2.parquet"),
            "--model", "unigram", "--pretokenize", "byte",
        ],
        catch_exceptions=False,
    )
    assert res2.exit_code != 0
    assert "bpe only" in res2.output
