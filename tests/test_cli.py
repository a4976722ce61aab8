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
