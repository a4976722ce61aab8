"""Command-line interface.

Same command surface as the reference CLI (cli.py:1-1134): build, audit,
explain, diff, catalog, doctor, inspect, init, quickstart — plus the
``timefence.yaml`` config file and ``features.py`` dynamic-import conventions.

Rendering: if ``rich`` is importable, the build and audit reports render as
rich tables (the reference's presentation, cli.py:638-712); otherwise the
output falls back to plain ANSI via click. ``TIMEFENCE_SPARK_PLAIN=1``
forces the fallback.

Usage: ``python -m timefence_spark.cli <command>`` or the ``timefence-spark``
entry point.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
from pathlib import Path

import click

from timefence_spark.core import Feature, FeatureSet, Labels, Source
from timefence_spark.errors import TimefenceError
from timefence_spark.store import Store

CONFIG_NAME = "timefence.yaml"

CONFIG_TEMPLATE = """\
# timefence-spark project configuration
labels:
  path: labels.parquet
  keys: [user_id]
  label_time: label_time
  target: [churned]

features: features.py

defaults:
  max_lookback: 365d
  join: strict
  on_missing: "null"

output: train.parquet
store: .timefence_spark
"""


def _load_config(path: str | None = None) -> dict:
    """Load timefence.yaml (reference cli.py:103-128)."""
    import yaml

    cfg_path = Path(path) if path else Path(CONFIG_NAME)
    if not cfg_path.exists():
        return {}
    try:
        loaded = yaml.safe_load(cfg_path.read_text())
    except yaml.YAMLError as exc:
        raise click.ClickException(f"Malformed {cfg_path}: {exc}") from exc
    if loaded is None:
        return {}
    if not isinstance(loaded, dict):
        raise click.ClickException(f"{cfg_path} must contain a mapping.")
    return loaded


def _import_features(spec: str) -> list[Feature | FeatureSet]:
    """Dynamic import of features.py; 'file.py:name' selects one object
    (reference cli.py:47-100)."""
    if ":" in spec and not spec.endswith(".py"):
        file_part, obj_name = spec.rsplit(":", 1)
    else:
        file_part, obj_name = spec, None

    path = Path(file_part)
    if not path.exists():
        raise click.ClickException(f"Features file not found: {path}")
    module_spec = importlib.util.spec_from_file_location("__tf_features__", path)
    module = importlib.util.module_from_spec(module_spec)  # type: ignore[arg-type]
    module_spec.loader.exec_module(module)  # type: ignore[union-attr]

    if obj_name is not None:
        obj = getattr(module, obj_name, None)
        if obj is None or not isinstance(obj, (Feature, FeatureSet)):
            raise click.ClickException(
                f"'{obj_name}' in {path} is not a Feature or FeatureSet."
            )
        return [obj]

    found: list[Feature | FeatureSet] = []
    seen: set[int] = set()
    for value in vars(module).values():
        if isinstance(value, (Feature, FeatureSet)) and id(value) not in seen:
            found.append(value)
            seen.add(id(value))
    if not found:
        raise click.ClickException(f"No Feature or FeatureSet objects found in {path}.")
    return found


def _parquet_columns(path) -> list[str]:
    """Column names from the parquet footer via pyarrow — a metadata read,
    no engine involved (replaces the reference's DuckDB DESCRIBE probes,
    cli.py:543-555)."""
    import pyarrow.parquet as pq

    p = Path(path)
    if p.is_dir():
        # Hive-partitioned datasets encode partition columns in key=value
        # directory names — absent from any part-file footer, so discover
        # the schema through pyarrow.dataset with hive partitioning.
        import pyarrow.dataset as ds

        try:
            names = list(
                ds.dataset(str(p), format="parquet", partitioning="hive").schema.names
            )
        except Exception as exc:
            raise click.ClickException(str(exc)) from exc
        if not names:
            raise click.ClickException(f"No parquet files in {p}")
        return names
    try:
        return list(pq.read_schema(p).names)
    except Exception as exc:
        raise click.ClickException(str(exc)) from exc


def _resolve_labels(cfg: dict, labels_path, keys, label_time, target) -> Labels:
    lcfg = cfg.get("labels", {}) or {}
    path = labels_path or lcfg.get("path")
    if path is None:
        raise click.ClickException(
            "No labels specified. Pass --labels or set labels.path in timefence.yaml."
        )
    keys = keys or lcfg.get("keys")
    label_time = label_time or lcfg.get("label_time") or "label_time"
    target = target or lcfg.get("target")

    if keys is None or target is None:
        # Infer from the labels schema: first column = key, everything that is
        # not a key / label_time = target (reference cli.py:543-571).
        cols = _parquet_columns(path)
        if keys is None:
            keys = [cols[0]]
            click.echo(f"Inferred keys: {keys}")
        keys_list = [keys] if isinstance(keys, str) else list(keys)
        if target is None:
            target = [c for c in cols if c not in keys_list and c != label_time]
            if not target:
                raise click.ClickException(
                    "Could not infer target columns; set labels.target."
                )
            click.echo(f"Inferred target: {target}")
    return Labels(path=path, keys=keys, label_time=label_time, target=target)


def _parse_splits(split_args: tuple[str, ...]) -> dict | None:
    """--split name:start:end (reference cli.py:600-611)."""
    if not split_args:
        return None
    splits = {}
    for raw in split_args:
        parts = raw.split(":")
        if len(parts) != 3:
            raise click.ClickException(
                f"Invalid split '{raw}'. Expected name:start:end "
                "(e.g. train:2024-01-01:2024-06-01)."
            )
        splits[parts[0]] = (parts[1], parts[2])
    return splits


@click.group()
@click.option("-v", "--verbose", is_flag=True, help="Verbose logging.")
def cli(verbose: bool) -> None:
    """timefence-spark: temporal correctness for ML training data, on Spark."""
    if verbose:
        import logging

        logging.basicConfig(level=logging.INFO)


@cli.command()
@click.option("--labels", "labels_path", type=str, default=None)
@click.option("--keys", multiple=True)
@click.option("--label-time", default=None)
@click.option("--target", multiple=True)
@click.option("--features", "features_spec", type=str, default=None)
@click.option("--output", "-o", type=str, default=None)
@click.option("--max-lookback", default=None)
@click.option("--max-staleness", default=None)
@click.option("--join", type=click.Choice(["strict", "inclusive"]), default=None)
@click.option("--on-missing", type=click.Choice(["null", "skip"]), default=None)
@click.option("--split", "split_args", multiple=True, help="name:start:end")
@click.option("--flatten-columns", is_flag=True)
@click.option(
    "--partition-by",
    "partition_by",
    multiple=True,
    help="Write a Hive-partitioned parquet directory keyed by these columns.",
)
@click.option(
    "--skew-bucket",
    "skew_bucket",
    default=None,
    help="Time-bucket hot entity keys in the as-of plan (duration, e.g. 30d).",
)
@click.option("--dry-run", is_flag=True, help="Show the join plan, don't execute.")
@click.option("--config", "config_path", default=None)
def build(
    labels_path,
    keys,
    label_time,
    target,
    features_spec,
    output,
    max_lookback,
    max_staleness,
    join,
    on_missing,
    split_args,
    flatten_columns,
    partition_by,
    skew_bucket,
    dry_run,
    config_path,
) -> None:
    """Build a point-in-time correct training set."""
    from timefence_spark import engine

    cfg = _load_config(config_path)
    defaults = cfg.get("defaults", {}) or {}

    features_spec = features_spec or cfg.get("features") or "features.py"
    features = _import_features(features_spec)
    labels = _resolve_labels(
        cfg, labels_path, list(keys) or None, label_time, list(target) or None
    )
    output = output or cfg.get("output") or "train.parquet"

    # Precedence: CLI > config defaults > built-ins (reference cli.py:587-591)
    kwargs = dict(
        max_lookback=max_lookback or defaults.get("max_lookback", "365d"),
        max_staleness=max_staleness or defaults.get("max_staleness"),
        join=join or defaults.get("join", "strict"),
        on_missing=on_missing or defaults.get("on_missing", "null"),
    )
    skew_bucket = skew_bucket or defaults.get("skew_bucket")
    part_cfg = cfg.get("partition_by") or []
    partition_by = list(partition_by) or (
        [part_cfg] if isinstance(part_cfg, str) else list(part_cfg)
    )

    if dry_run:
        result = engine.explain(
            labels, features,
            max_lookback=kwargs["max_lookback"],
            max_staleness=kwargs["max_staleness"],
            join=kwargs["join"],
        )
        click.echo(str(result))
        return

    store = Store(cfg["store"]) if cfg.get("store") else None
    splits = _parse_splits(split_args)

    total_steps = 2 * len(list(features)) + 3

    def progress(msg: str) -> None:
        click.echo(f"  • {msg}")

    click.echo(f"Building ({total_steps} steps):")
    try:
        result = engine.build(
            labels,
            features,
            output,
            splits=splits,
            store=store,
            flatten_columns=flatten_columns,
            output_partition_by=list(partition_by) or None,
            skew_bucket=skew_bucket,
            progress=progress,
            **kwargs,
        )
    except TimefenceError as exc:
        raise click.ClickException(str(exc)) from exc
    _print_build_result(result, labels)
    if not result.validate():
        click.echo("WARNING: post-build temporal verification FAILED", err=True)
        sys.exit(1)


def _rich_console():
    """Optional rich console (the reference renders reports with rich,
    cli.py:638-712). Resolved lazily per call so installing/stubbing rich
    takes effect without a module reload; returns None when rich is absent
    or TIMEFENCE_SPARK_PLAIN is set -> callers use the plain ANSI path."""
    if os.environ.get("TIMEFENCE_SPARK_PLAIN"):
        return None
    try:
        from rich.console import Console
    except Exception:
        return None
    return Console()


def _print_build_result(result, labels_obj) -> None:
    console = _rich_console()
    if console is not None:
        _print_build_result_rich(console, result, labels_obj)
    else:
        _print_build_result_plain(result, labels_obj)


def _build_feature_rows(result) -> list[tuple[str, str, str]]:
    """(name, detail, tag) per feature — shared by both renderers."""
    features_meta = result.manifest.get("features", {})
    rows = []
    for fname, fstats in result.stats.feature_stats.items():
        matched = fstats.get("matched", 0)
        missing = fstats.get("missing", 0)
        total = matched + missing
        tags = []
        if features_meta.get(fname, {}).get("cached"):
            tags.append("cached")
        strat = features_meta.get(fname, {}).get("strategy")
        if strat:
            tags.append(strat)
        detail = (
            f"{matched:,} / {total:,} matched ({missing:,} missing -> null)"
            if missing
            else f"{matched:,} / {total:,} matched"
        )
        rows.append((fname, detail, ", ".join(tags)))
    return rows


def _print_build_result_rich(console, result, labels_obj) -> None:
    from rich.table import Table

    label_rows = result.manifest.get("labels", {}).get(
        "row_count", result.stats.row_count
    )
    join_mode = result.manifest.get("parameters", {}).get("join", "strict")
    op = "<" if join_mode == "strict" else "<="
    console.print()
    console.print("[bold]Building training set...[/bold]")
    console.print(f"  Labels   {label_rows:,} rows from {labels_obj.path}")
    console.print(
        f"  Joining with point-in-time correctness (feature_time {op} label_time)"
    )
    table = Table(show_header=True, header_style="bold")
    table.add_column("feature")
    table.add_column("matched")
    table.add_column("tags")
    for fname, detail, tag in _build_feature_rows(result):
        table.add_row(f"[green]OK[/green] {fname}", detail, tag)
    console.print(table)
    if result.output_path:
        console.print(
            f"  Written   {result.output_path} "
            f"({result.stats.row_count:,} rows, {result.stats.column_count} cols)"
        )
    manifest_path = result.manifest.get("manifest_path")
    if manifest_path:
        console.print(f"  Manifest  {manifest_path}")
    console.print(f"  Time      {result.stats.duration_seconds:.1f}s")
    console.print()


def _print_build_result_plain(result, labels_obj) -> None:
    """Terminal build report (reference cli.py:673-712, rich -> ANSI).

    click strips styling when stdout is not a terminal, so piped output
    stays plain."""
    click.echo()
    click.secho("Building training set...", bold=True)
    click.echo()
    label_rows = result.manifest.get("labels", {}).get("row_count", result.stats.row_count)
    click.echo(f"  Labels     {label_rows:,} rows from {labels_obj.path}")
    click.echo(f"  Features   {len(result.stats.feature_stats)} feature(s)")
    click.echo()
    join_mode = result.manifest.get("parameters", {}).get("join", "strict")
    op = "<" if join_mode == "strict" else "<="
    click.echo(
        f"  Joining with point-in-time correctness (feature_time {op} label_time):"
    )
    click.echo()
    for fname, detail, tags in _build_feature_rows(result):
        tag = f" ({tags})" if tags else ""
        click.echo(
            f"  {click.style('OK', fg='green')}  {fname:<20s} {detail}{tag}"
        )
    click.echo()
    if result.output_path:
        click.echo(
            f"  Written   {result.output_path} "
            f"({result.stats.row_count:,} rows, {result.stats.column_count} cols)"
        )
    manifest_path = result.manifest.get("manifest_path")
    if manifest_path:
        click.echo(f"  Manifest  {manifest_path}")
    click.echo(f"  Time      {result.stats.duration_seconds:.1f}s")
    click.echo()


@cli.command()
@click.argument("data", type=str)
@click.option("--features", "features_spec", default=None)
@click.option("--keys", multiple=True)
@click.option("--label-time", default="label_time")
@click.option(
    "--feature-time-column",
    "ft_columns",
    multiple=True,
    help="feature=column mapping for temporal mode",
)
@click.option("--max-lookback", default="365d")
@click.option("--join", type=click.Choice(["strict", "inclusive"]), default="strict")
@click.option("--json", "json_out", type=str, default=None, help="Write JSON report.")
@click.option("--html", "html_out", type=str, default=None, help="Write HTML report.")
@click.option("--strict", "strict_exit", is_flag=True, help="Exit 1 on leakage.")
@click.option("--config", "config_path", default=None)
def audit(
    data,
    features_spec,
    keys,
    label_time,
    ft_columns,
    max_lookback,
    join,
    json_out,
    html_out,
    strict_exit,
    config_path,
) -> None:
    """Audit a dataset for temporal leakage."""
    from timefence_spark import engine

    cfg = _load_config(config_path)
    try:
        if ft_columns:
            mapping = {}
            for raw in ft_columns:
                if "=" not in raw:
                    raise click.ClickException(
                        f"Invalid --feature-time-column '{raw}'; expected name=column."
                    )
                name, col = raw.split("=", 1)
                mapping[name] = col
            report = engine.audit(
                data, feature_time_columns=mapping, label_time=label_time
            )
        else:
            features_spec = features_spec or cfg.get("features") or "features.py"
            features = _import_features(features_spec)
            keys_list = list(keys) or (cfg.get("labels", {}) or {}).get("keys")
            if not keys_list:
                raise click.ClickException("audit requires --keys (or config labels.keys).")
            report = engine.audit(
                data,
                features,
                keys=keys_list,
                label_time=label_time,
                max_lookback=max_lookback,
                join=join,
            )
    except TimefenceError as exc:
        raise click.ClickException(str(exc)) from exc

    _print_audit_report(report)
    if json_out:
        report.to_json(json_out)
        click.echo(f"JSON report: {json_out}")
    if html_out:
        report.to_html(html_out)
        click.echo(f"HTML report: {html_out}")
    if strict_exit and report.has_leakage:
        sys.exit(1)


def _print_audit_report(report) -> None:
    console = _rich_console()
    if console is not None:
        _print_audit_report_rich(console, report)
    else:
        _print_audit_report_plain(report)


def _print_audit_report_rich(console, report) -> None:
    from rich.table import Table

    console.print()
    console.print("[bold]TEMPORAL AUDIT REPORT[/bold]")
    console.print(f"Scanned {report.total_rows:,} rows")
    if report.has_leakage:
        leaky, total = len(report.leaky_features), len(report.features)
        console.print(
            f"[bold yellow]WARNING[/bold yellow]  LEAKAGE DETECTED "
            f"in {leaky} of {total} features"
        )
    else:
        console.print(
            "[bold green]ALL CLEAN[/bold green] — no temporal leakage detected"
        )
    table = Table(show_header=True, header_style="bold")
    for col in ("status", "feature", "detail", "severity"):
        table.add_column(col)
    for name, detail in report.features.items():
        if detail.clean:
            null_info = f", {detail.null_rows} null" if detail.null_rows else ""
            table.add_row(
                "[green]OK[/green]",
                name,
                f"clean ({detail.total_rows:,} rows{null_info})",
                "",
            )
        else:
            extras = [
                f"{detail.leaky_row_count:,} rows "
                f"({detail.leaky_row_pct:.1%}) from the future"
            ]
            if detail.max_leakage:
                extras.append(f"max {detail.max_leakage}")
            if detail.median_leakage:
                extras.append(f"median {detail.median_leakage}")
            table.add_row(
                "[red]LEAK[/red]", name, "; ".join(extras), str(detail.severity)
            )
    console.print(table)
    if report.has_leakage:
        console.print(
            "Next step: run `timefence-spark build` to rebuild without leakage"
        )
    console.print()


def _print_audit_report_plain(report) -> None:
    """Terminal audit report (reference cli.py:431-471, rich -> ANSI)."""
    click.echo()
    click.secho("TEMPORAL AUDIT REPORT", bold=True)
    click.echo(f"Scanned {report.total_rows:,} rows")
    click.echo()
    if report.has_leakage:
        leaky, total = len(report.leaky_features), len(report.features)
        click.echo(
            f"{click.style('WARNING', fg='yellow', bold=True)}  "
            f"LEAKAGE DETECTED in {leaky} of {total} features"
        )
    else:
        click.echo(
            f"{click.style('ALL CLEAN', fg='green', bold=True)} "
            "— no temporal leakage detected"
        )
    click.echo()
    for name, detail in report.features.items():
        if detail.clean:
            null_info = f", {detail.null_rows} null" if detail.null_rows else ""
            click.echo(
                f"  {click.style('OK', fg='green')}    {name} — clean "
                f"({detail.total_rows:,} rows{null_info})"
            )
        else:
            click.echo(f"  {click.style('LEAK', fg='red')}  {name}")
            click.echo(
                f"        {detail.leaky_row_count:,} rows "
                f"({detail.leaky_row_pct:.1%}) use feature data from the future"
            )
            if detail.max_leakage:
                click.echo(f"        Max leakage: {detail.max_leakage}")
            if detail.median_leakage:
                click.echo(f"        Median leakage: {detail.median_leakage}")
            click.echo(f"        Severity: {detail.severity}")
            click.echo()
    if report.has_leakage:
        click.echo("\nNext step: run `timefence-spark build` to rebuild without leakage")
    click.echo()


@cli.command()
@click.option("--labels", "labels_path", default=None)
@click.option("--keys", multiple=True)
@click.option("--label-time", default=None)
@click.option("--target", multiple=True)
@click.option("--features", "features_spec", default=None)
@click.option("--max-lookback", default="365d")
@click.option("--join", type=click.Choice(["strict", "inclusive"]), default="strict")
@click.option("--config", "config_path", default=None)
def explain(
    labels_path, keys, label_time, target, features_spec, max_lookback, join, config_path
) -> None:
    """Preview the join plan without executing."""
    from timefence_spark import engine

    cfg = _load_config(config_path)
    features_spec = features_spec or cfg.get("features") or "features.py"
    features = _import_features(features_spec)
    labels = _resolve_labels(
        cfg, labels_path, list(keys) or None, label_time, list(target) or None
    )
    click.echo(
        str(
            engine.explain(
                labels, features, max_lookback=max_lookback, join=join
            )
        )
    )


@cli.command()
@click.argument("old", type=str)
@click.argument("new", type=str)
@click.option("--keys", multiple=True, required=True)
@click.option("--label-time", default="label_time")
def diff(old, new, keys, label_time) -> None:
    """Compare two training datasets."""
    from timefence_spark import engine

    click.echo(str(engine.diff(old, new, keys=list(keys), label_time=label_time)))


@cli.command()
@click.option("--store", "store_path", default=".timefence_spark")
@click.option("--json", "json_out", is_flag=True)
def catalog(store_path, json_out) -> None:
    """List builds recorded in the store."""
    store = Store(store_path)
    builds = store.list_builds()
    if json_out:
        click.echo(json.dumps(builds, indent=2, default=str))
        return
    if not builds:
        click.echo("No builds found.")
        return
    for b in builds:
        out = b.get("output", {})
        click.echo(
            f"{b.get('build_id')}  rows={out.get('row_count')}  "
            f"cols={out.get('column_count')}  path={out.get('path')}  "
            f"audit={'PASS' if b.get('audit', {}).get('passed') else 'FAIL'}"
        )


@cli.command()
@click.argument("data", type=str)
def inspect(data) -> None:
    """Profile a dataset: per-column types, null %, uniqueness; suggest keys
    and timestamp columns (reference cli.py:228-334).

    ONE distributed aggregation pass: every column's approx-distinct and
    null count come back in a single agg row, so profiling a 100 TB table
    costs one scan — not a per-column full scan on the driver machine."""
    from pyspark.sql import functions as F

    from timefence_spark.engine import get_spark
    from timefence_spark.sources.readers import read_parquet

    spark = get_spark()
    try:
        df = read_parquet(spark, data)
    except Exception as exc:
        raise click.ClickException(str(exc)) from exc
    from pyspark.sql import types as T

    aggs = [F.count(F.lit(1)).alias("__total")]
    countable = set()
    for field in df.schema.fields:
        c = field.name
        # approx_count_distinct can't hash map columns; profile nulls only.
        if not isinstance(field.dataType, T.MapType):
            countable.add(c)
            aggs.append(F.approx_count_distinct(c, rsd=0.01).alias(f"__u_{c}"))
        aggs.append(
            F.count(F.when(F.col(c).isNull(), F.lit(1))).alias(f"__n_{c}")
        )
    row = df.agg(*aggs).first()
    total = row["__total"]
    click.echo(f"{data}: {total} rows")
    click.echo(f"{'column':<28}{'type':<16}{'nulls':<8}{'unique':<10}note")
    key_sugg, ts_sugg = [], []
    for field in df.schema.fields:
        name = field.name
        uniq = row[f"__u_{name}"] if name in countable else None
        nulls = row[f"__n_{name}"]
        note = ""
        t = field.dataType.simpleString().upper()
        if uniq is None:
            uniq = "-"
        elif "TIMESTAMP" in t or "DATE" in t:
            note = "timestamp candidate"
            ts_sugg.append(name)
        elif total and uniq >= total * 0.99:
            # approx_count_distinct (rsd=1%): >=99% of rows distinct.
            note = "unique — key candidate"
            key_sugg.append(name)
        elif total and uniq / total > 0.001 and ("INT" in t or "STRING" in t):
            note = "possible entity key"
            key_sugg.append(name)
        pct = f"{(nulls / total * 100):.0f}%" if total else "-"
        click.echo(f"{name:<28}{t.lower():<16}{pct:<8}{uniq:<10}{note}")
    if key_sugg:
        click.echo(f"\nSuggested keys: {key_sugg[:3]}")
    if ts_sugg:
        click.echo(f"Suggested timestamp: {ts_sugg[0]}")


@cli.command()
@click.option("--config", "config_path", default=None)
def doctor(config_path) -> None:
    """Check the project setup: config, Spark, features file, sources, labels
    (reference cli.py:922-1090)."""
    ok = True

    def check(name: str, passed: bool, detail: str = "") -> None:
        nonlocal ok
        mark = "OK " if passed else "FAIL"
        click.echo(f"  [{mark}] {name}" + (f" — {detail}" if detail else ""))
        ok = ok and passed

    cfg_path = Path(config_path or CONFIG_NAME)
    cfg: dict = {}
    if cfg_path.exists():
        try:
            cfg = _load_config(config_path)
            check("config", True, str(cfg_path))
        except click.ClickException as exc:
            check("config", False, str(exc))
    else:
        check("config", True, "no timefence.yaml (using defaults)")

    try:
        import pyspark

        check("pyspark", True, pyspark.__version__)
    except ImportError as exc:  # pragma: no cover
        check("pyspark", False, str(exc))

    features_spec = cfg.get("features") or "features.py"
    try:
        features = _import_features(str(features_spec))
        from timefence_spark.core import flatten_features, safe_name

        flat = flatten_features(features)
        check("features file", True, f"{len(flat)} feature(s) in {features_spec}")
        names = [f.name for f in flat]
        dup = {n for n in names if names.count(n) > 1}
        check("feature names unique", not dup, ", ".join(sorted(dup)) or "")
        safe = [safe_name(n) for n in names]
        coll = {s for s in safe if safe.count(s) > 1}
        check("no sanitization collisions", not coll, ", ".join(sorted(coll)) or "")
        for f in flat:
            if isinstance(f.source, Source) and f.source.path is not None:
                check(
                    f"source exists: {f.source.name}",
                    f.source.path.exists(),
                    str(f.source.path),
                )
    except click.ClickException as exc:
        check("features file", False, str(exc))

    lcfg = cfg.get("labels", {}) or {}
    if lcfg.get("path"):
        lp = Path(lcfg["path"])
        check("labels file", lp.exists(), str(lp))
        if lp.exists():
            cols = _parquet_columns(lp)
            for k in lcfg.get("keys", []) or []:
                check(f"labels key '{k}'", k in cols)
            lt = lcfg.get("label_time", "label_time")
            check(f"labels label_time '{lt}'", lt in cols)
    sys.exit(0 if ok else 1)


@cli.command()
def init() -> None:
    """Write a template timefence.yaml into the current directory."""
    path = Path(CONFIG_NAME)
    if path.exists():
        raise click.ClickException(f"{CONFIG_NAME} already exists.")
    path.write_text(CONFIG_TEMPLATE)
    click.echo(f"Wrote {CONFIG_NAME}")


@cli.command()
@click.option("--dir", "target_dir", default="timefence-quickstart")
def quickstart(target_dir) -> None:
    """Create a demo project: synthetic data, features.py, config, and a
    pre-built LEAKY training set to audit (reference quickstart.py)."""
    from timefence_spark.quickstart import create_quickstart

    path = create_quickstart(Path(target_dir))
    click.echo(f"Quickstart project created at {path}")
    click.echo("Try:")
    click.echo(f"  cd {path}")
    click.echo("  python -m timefence_spark.cli build")
    click.echo(
        "  python -m timefence_spark.cli audit train_LEAKY.parquet --keys user_id"
    )


@cli.command("corpus-clean")
@click.option("--input", "input_path", required=True, help="Input documents parquet.")
@click.option("--output", "output_path", required=True, help="Cleaned output parquet.")
@click.option("--id-col", default="doc_id", show_default=True)
@click.option("--text-col", default="text", show_default=True)
@click.option(
    "--strip-html/--no-strip-html", "strip_html_flag", default=False,
    help="Extract boilerplate-free text from raw HTML first (runs "
    "before every other stage).",
)
@click.option(
    "--dedup",
    "dedup_mode",
    type=click.Choice(["none", "exact", "near", "best"]),
    default="exact",
    show_default=True,
    help="exact = content hash; near = MinHash components keep min id; "
    "best = keep highest quality score per component.",
)
@click.option(
    "--dedup-url-col", default=None,
    help="URL column: drop crawl re-fetches first (keep min id per "
    "CANONICAL url — case/ports/tracking params/fragments/slashes "
    "normalized away) before any content-level dedup.",
)
@click.option("--gopher/--no-gopher", default=False, help="Gopher quality rules gate.")
@click.option("--min-quality", type=float, default=None, help="Composite quality-score floor.")
@click.option("--languages", default=None, help="Comma-separated language codes to keep.")
@click.option(
    "--max-substring-dup", type=float, default=None,
    help="Drop docs whose duplicated 8-token-window fraction exceeds this.",
)
@click.option(
    "--remove-substring-dups", is_flag=True,
    help="Cut duplicated 8-token windows from the text instead of "
    "dropping documents (exact-substring removal; first occurrences "
    "keep their text).",
)
@click.option(
    "--semantic-embeddings", default=None,
    help="Parquet of (id, embedding) rows keyed like the corpus: drop "
    "SemDeDup-style semantic near-duplicates.",
)
@click.option(
    "--semantic-threshold", type=float, default=0.9, show_default=True,
    help="Within-cluster cosine floor for --semantic-embeddings.",
)
@click.option(
    "--semantic-clusters", type=int, default=16, show_default=True,
    help="Cluster count for --semantic-embeddings.",
)
@click.option(
    "--semantic-bench-embeddings", default=None,
    help="Parquet of benchmark (id, embedding) rows: drop corpus docs "
    "whose embedding is a semantic near-duplicate of an eval item "
    "(requires --semantic-embeddings for the corpus side).",
)
@click.option(
    "--max-nll", type=float, default=None,
    help="LM fluency ceiling (mean NLL; CCNet-style gate).",
)
@click.option(
    "--fluency-model", type=click.Choice(["unigram", "bigram"]),
    default="unigram", show_default=True,
    help="LM for --max-nll: unigram, or interpolated bigram.",
)
@click.option(
    "--keep-fluency-buckets", default=None,
    help="Comma list of CCNet fluency buckets to keep (head,middle,tail) "
    "— e.g. 'head' trains on the most fluent tercile.",
)
@click.option(
    "--fluency-strata", default=None,
    help="Column to stratify --keep-fluency-buckets thresholds by "
    "(CCNet buckets per language).",
)
@click.option(
    "--clf-weights", default=None,
    help="JSON file of {word: weight} for the linear quality classifier.",
)
@click.option(
    "--clf-weights-table", default=None,
    help="Parquet (word, weight) table for the classifier — e.g. the "
    "output of corpus-train-classifier (production-vocabulary path).",
)
@click.option("--clf-bias", type=float, default=0.0, show_default=True)
@click.option(
    "--min-clf-score", type=float, default=None,
    help="Classifier score floor (requires --clf-weights).",
)
@click.option("--benchmark", default=None, help="Eval-set parquet for decontamination.")
@click.option("--ngram", type=int, default=8, show_default=True, help="Decontamination n-gram size.")
@click.option("--redact-pii/--no-redact-pii", default=False)
@click.option("--blocklist", default=None, help="Domain blocklist file (one domain per line).")
@click.option(
    "--token-budgets", default=None,
    help="Per-stratum token quotas, e.g. 'src0=100000,src1=50000' — "
    "Dolma-style mixing by tokens (whitespace counts computed on the "
    "fly); strata without a quota keep everything.",
)
@click.option(
    "--token-budget-strata", default="source", show_default=True,
    help="Stratum column for --token-budgets.",
)
@click.option("--sample", "sample_fraction", type=float, default=None, help="Deterministic hash-sample fraction.")
@click.option("--split", "split_spec", default=None, help="Split weights, e.g. train=0.9,val=0.1.")
@click.option("--salt", default="", help="Salt for sampling/split hashes.")
@click.option(
    "--shuffle-salt", default=None,
    help="Write in a reproducible epoch order (deterministic global "
    "shuffle keyed on this salt).",
)
@click.option(
    "--output-format", type=click.Choice(["parquet", "jsonl"]),
    default="parquet", show_default=True,
    help="parquet (pipeline-internal) or newline-delimited JSON "
    "(interchange).",
)
@click.option("--json", "json_out", is_flag=True, help="Machine-readable summary.")
def corpus_clean(
    input_path, output_path, id_col, text_col, strip_html_flag,
    dedup_mode, dedup_url_col, gopher,
    min_quality, languages, max_substring_dup, remove_substring_dups,
    semantic_embeddings, semantic_threshold, semantic_clusters,
    semantic_bench_embeddings,
    max_nll, fluency_model, keep_fluency_buckets, fluency_strata,
    clf_weights, clf_weights_table,
    clf_bias, min_clf_score, benchmark, ngram, redact_pii, blocklist,
    token_budgets, token_budget_strata,
    sample_fraction, split_spec, salt, shuffle_salt, output_format,
    json_out,
) -> None:
    """Run a training-data cleaning pipeline over a document corpus.

    Chains the `timefence_spark.Corpus` stages selected by the flags —
    dedup, quality gates, language filter, decontamination, PII redaction,
    domain blocklist, sampling, split assignment — as ONE lazy Spark plan
    and writes the surviving documents to parquet. CLI surface for the
    pipeline-operator extension (the library facade does the work)."""
    from timefence_spark.corpus import Corpus
    from timefence_spark.engine import get_spark
    from timefence_spark.sources.readers import read_parquet

    spark = get_spark()
    df = read_parquet(spark, input_path)
    n_in = df.count()
    c = Corpus(df, id_col=id_col, text_col=text_col)
    stages: list[str] = []
    if strip_html_flag:
        c = c.strip_html()
        stages.append("strip_html")
    if dedup_url_col:
        c = c.dedup_urls(url_col=dedup_url_col)
        stages.append(f"dedup_urls({dedup_url_col})")
    if dedup_mode == "exact":
        c = c.dedup_exact()
        stages.append("dedup_exact")
    elif dedup_mode == "near":
        c = c.dedup_near(keep="min_id")
        stages.append("dedup_near(min_id)")
    elif dedup_mode == "best":
        c = c.dedup_near(keep="best")
        stages.append("dedup_near(best)")
    if gopher:
        c = c.filter_gopher()
        stages.append("gopher")
    if min_quality is not None:
        c = c.filter_quality(min_score=min_quality)
        stages.append(f"quality>={min_quality}")
    if languages:
        langs = [x.strip() for x in languages.split(",") if x.strip()]
        if not langs:
            raise click.ClickException(
                f"--languages {languages!r} parsed to an empty list — it "
                "would drop every document."
            )
        c = c.filter_languages(langs)
        stages.append(f"languages={langs}")
    if max_substring_dup is not None:
        c = c.filter_substring_dup(max_dup_fraction=max_substring_dup)
        stages.append(f"substring_dup<={max_substring_dup}")
    if remove_substring_dups:
        c = c.remove_substring_dups()
        stages.append("remove_substring_dups")
    if semantic_embeddings:
        emb_df = read_parquet(spark, semantic_embeddings)
        c = c.dedup_semantic(
            emb_df, n_clusters=semantic_clusters, threshold=semantic_threshold
        )
        stages.append(
            f"semantic_dedup(k={semantic_clusters},t={semantic_threshold})"
        )
    if semantic_bench_embeddings:
        if not semantic_embeddings:
            raise click.ClickException(
                "--semantic-bench-embeddings requires --semantic-embeddings"
            )
        emb_df = read_parquet(spark, semantic_embeddings)
        bench_emb = read_parquet(spark, semantic_bench_embeddings)
        c = c.decontaminate_semantic(
            emb_df, bench_emb, n_clusters=semantic_clusters,
            threshold=semantic_threshold,
        )
        stages.append(
            f"semantic_decontam(k={semantic_clusters},t={semantic_threshold})"
        )
    if max_nll is not None:
        c = c.filter_fluency(max_nll=max_nll, model=fluency_model)
        stages.append(f"fluency[{fluency_model}] nll<={max_nll}")
    if keep_fluency_buckets:
        buckets = [
            x.strip() for x in keep_fluency_buckets.split(",") if x.strip()
        ]
        try:
            c = c.filter_fluency_buckets(
                tuple(buckets), strata_col=fluency_strata, model=fluency_model
            )
        except ValueError as exc:
            raise click.ClickException(str(exc)) from exc
        strata_note = f" per {fluency_strata}" if fluency_strata else ""
        stages.append(
            f"fluency_buckets[{fluency_model}] keep={buckets}{strata_note}"
        )
    if min_clf_score is not None:
        if bool(clf_weights) == bool(clf_weights_table):
            raise click.ClickException(
                "--min-clf-score requires exactly one of --clf-weights / "
                "--clf-weights-table"
            )
        if clf_weights_table:
            wdf = read_parquet(spark, clf_weights_table)
            if not {"word", "weight"} <= set(wdf.columns):
                raise click.ClickException(
                    f"--clf-weights-table needs (word, weight) columns; "
                    f"got {wdf.columns}"
                )
            c = c.filter_classifier(
                min_score=min_clf_score,
                weights_df=wdf.select("word", "weight"),
                bias=clf_bias,
            )
        else:
            try:
                weights = json.loads(Path(clf_weights).read_text())
            except (OSError, json.JSONDecodeError) as exc:
                raise click.ClickException(
                    f"Cannot read --clf-weights {clf_weights!r}: {exc}"
                ) from exc
            if not isinstance(weights, dict) or not weights:
                raise click.ClickException(
                    "--clf-weights must be a non-empty JSON object of "
                    "word: weight"
                )
            c = c.filter_classifier(
                min_score=min_clf_score, weights=weights, bias=clf_bias
            )
        stages.append(f"classifier>={min_clf_score}")
    if benchmark:
        bench_df = read_parquet(spark, benchmark)
        c = c.decontaminate(bench_df, n=ngram)
        stages.append(f"decontaminate(n={ngram})")
    if redact_pii:
        c = c.redact_pii()
        stages.append("redact_pii")
    if blocklist:
        try:
            blocklist_text = Path(blocklist).read_text()
        except OSError as exc:
            raise click.ClickException(
                f"Cannot read --blocklist file {blocklist!r}: {exc}"
            ) from exc
        domains = [
            line.strip()
            for line in blocklist_text.splitlines()
            if line.strip() and not line.startswith("#")
        ]
        c = c.filter_blocked_domains(domains)
        stages.append(f"blocklist({len(domains)} domains)")
    if token_budgets:
        try:
            quotas = {
                k.strip(): int(v)
                for k, v in (part.split("=") for part in token_budgets.split(","))
            }
        except ValueError as exc:
            raise click.ClickException(
                f"Bad --token-budgets {token_budgets!r} "
                f"(want src0=100000,src1=50000): {exc}"
            ) from exc
        if token_budget_strata not in c.df.columns:
            raise click.ClickException(
                f"--token-budget-strata {token_budget_strata!r} not in "
                f"{c.df.columns}"
            )
        from pyspark.sql import functions as F

        from timefence_spark.operators import text as text_ops

        # Private count column: the corpus may legitimately carry its own
        # n_tokens (token_stats output), which a bare name would clash with.
        counts = text_ops.token_stats(
            c.df, id_col=id_col, text_col=text_col
        ).select(id_col, F.col("n_tokens").alias("__tb_n_tokens"))
        with_counts = Corpus(
            c.df.join(counts, id_col), id_col=id_col, text_col=text_col
        )
        try:
            c = Corpus(
                with_counts.mixture_tokens(
                    quotas, token_col="__tb_n_tokens",
                    strata_col=token_budget_strata, salt=salt,
                ).df.drop("__tb_n_tokens"),
                id_col=id_col, text_col=text_col,
            )
        except ValueError as exc:
            raise click.ClickException(str(exc)) from exc
        stages.append(
            f"token_budgets({token_budgets} per {token_budget_strata})"
        )
    if sample_fraction is not None:
        c = c.sample(sample_fraction, salt=salt)
        stages.append(f"sample({sample_fraction})")
    if split_spec:
        try:
            weights = {
                k.strip(): float(v)
                for k, v in (part.split("=") for part in split_spec.split(","))
            }
            c = c.split(weights, salt=salt)
        except ValueError as exc:
            # covers both parse errors and split_by_hash's weight
            # validation (must sum to 1.0, non-negative)
            raise click.ClickException(
                f"Bad --split spec {split_spec!r} (want train=0.9,val=0.1): {exc}"
            ) from exc
        stages.append(f"split({split_spec})")

    c.write(
        output_path, format=output_format, mode="overwrite",
        shuffle_salt=shuffle_salt,
    )
    if shuffle_salt is not None:
        stages.append(f"shuffle(salt={shuffle_salt!r})")
    out_df = (
        spark.read.parquet(output_path)
        if output_format == "parquet"
        else spark.read.json(output_path)
    )
    n_out = out_df.count()
    summary = {
        "input": input_path,
        "output": output_path,
        "format": output_format,
        "stages": stages,
        "rows_in": n_in,
        "rows_out": n_out,
        "kept_pct": round(100.0 * n_out / n_in, 2) if n_in else 0.0,
    }
    if json_out:
        click.echo(json.dumps(summary))
    else:
        click.echo(f"corpus-clean: {n_in} -> {n_out} rows ({summary['kept_pct']}%)")
        for s in stages:
            click.echo(f"  - {s}")
        click.echo(f"Wrote {output_path}")


@cli.command("corpus-train-classifier")
@click.option("--input", "input_path", required=True,
              help="Labeled documents parquet.")
@click.option("--output", "output_path", required=True,
              help="Output (word, weight, n_pos, n_neg) parquet — feed to "
              "corpus-clean --clf-weights-table.")
@click.option("--label-col", required=True,
              help="Boolean-castable label column (true = positive class).")
@click.option("--id-col", default="doc_id", show_default=True)
@click.option("--text-col", default="text", show_default=True)
@click.option("--smoothing", type=float, default=1.0, show_default=True,
              help="Additive smoothing for the NB log-odds.")
@click.option("--min-count", type=int, default=1, show_default=True,
              help="Vocabulary floor: total occurrences required.")
@click.option("--json", "json_out", is_flag=True,
              help="Machine-readable summary.")
def corpus_train_classifier(
    input_path, output_path, label_col, id_col, text_col, smoothing,
    min_count, json_out,
) -> None:
    """Fit Naive-Bayes classifier weights from a labeled document sample.

    The train half of the quality-classifier loop: label a seed set,
    fit here, then gate the full corpus with
    `corpus-clean --clf-weights-table <output> --min-clf-score ...`."""
    from timefence_spark.corpus import Corpus
    from timefence_spark.engine import get_spark
    from timefence_spark.sources.readers import read_parquet

    spark = get_spark()
    df = read_parquet(spark, input_path)
    if label_col not in df.columns:
        raise click.ClickException(
            f"--label-col {label_col!r} not in {df.columns}"
        )
    try:
        weights = Corpus(df, id_col=id_col, text_col=text_col).train_classifier(
            label_col=label_col, smoothing=smoothing, min_count=min_count
        )
    except ValueError as exc:
        raise click.ClickException(str(exc)) from exc
    weights.write.mode("overwrite").parquet(output_path)
    out = spark.read.parquet(output_path)
    summary = {
        "input": input_path,
        "output": output_path,
        "vocab_size": out.count(),
        "label_col": label_col,
        "smoothing": smoothing,
        "min_count": min_count,
    }
    if json_out:
        click.echo(json.dumps(summary))
    else:
        click.echo(
            f"corpus-train-classifier: {summary['vocab_size']} words -> "
            f"{output_path}"
        )


@cli.command("corpus-train-bpe")
@click.option("--input", "input_path", required=True,
              help="Documents parquet to learn merges from.")
@click.option("--output", "output_path", required=True,
              help="Output (merge_rank, lhs, rhs) parquet.")
@click.option("--id-col", default="doc_id", show_default=True)
@click.option("--text-col", default="text", show_default=True)
@click.option("--n-merges", type=int, default=100, show_default=True,
              help="Maximum merges to learn (stops early when no pair "
              "repeats).")
@click.option("--merges-per-round", type=int, default=1, show_default=True,
              help="Driver round-trips amortization: accept up to B "
              "symbol-disjoint merges per pair-count job (batched-BPE "
              "approximation; 1 = exact sequential).")
@click.option("--save-tokenizer", "tokenizer_path", default=None,
              help="Also write a frozen tokenizer JSON (merges + corpus "
              "vocabulary) for train-once/encode-many pipelines "
              "(bpe.load_tokenizer).")
@click.option("--json", "json_out", is_flag=True,
              help="Machine-readable summary.")
def corpus_train_bpe(
    input_path, output_path, id_col, text_col, n_merges, merges_per_round,
    tokenizer_path, json_out,
) -> None:
    """Learn a BPE merge table from a document corpus (distributed
    Sennrich trainer — one pair-count shuffle over the word-type table
    per merge). The merge parquet feeds exact token counting:
    bpe.make_token_counter(merges) -> Corpus.with_token_counts."""
    from timefence_spark.corpus import Corpus
    from timefence_spark.engine import get_spark
    from timefence_spark.sources.readers import read_parquet

    spark = get_spark()
    df = read_parquet(spark, input_path)
    merges = Corpus(df, id_col=id_col, text_col=text_col).train_bpe(
        n_merges=n_merges, merges_per_round=merges_per_round
    )
    spark.createDataFrame(
        [(i, l, r) for i, (l, r) in enumerate(merges)],
        "merge_rank int, lhs string, rhs string",
    ).coalesce(1).write.mode("overwrite").parquet(output_path)
    if tokenizer_path:
        from timefence_spark.operators import bpe

        vocab = bpe.bpe_vocab(df, text_col=text_col, merges=merges)
        bpe.save_tokenizer(tokenizer_path, merges=merges, vocab=vocab)
    summary = {
        "input": input_path,
        "output": output_path,
        "n_merges_learned": len(merges),
        "n_merges_requested": n_merges,
        "tokenizer": tokenizer_path,
    }
    if json_out:
        click.echo(json.dumps(summary))
    else:
        click.echo(
            f"corpus-train-bpe: {len(merges)} merges -> {output_path}"
        )


@cli.command("corpus-train-tokenizer")
@click.option("--input", "input_path", required=True,
              help="Documents parquet to train on.")
@click.option("--output", "output_path", required=True,
              help="Output model parquet: (merge_rank, lhs, rhs) for "
              "bpe/wordpiece; (token_id, piece, cnt, logp_micro) for "
              "unigram.")
@click.option("--model", "model_kind",
              type=click.Choice(["bpe", "unigram", "wordpiece"]),
              default="bpe", show_default=True,
              help="Tokenizer family: greedy-merge BPE (Sennrich 2016), "
              "unigram-LM (Kudo 2018, SentencePiece-style hard-EM), or "
              "WordPiece (Schuster & Nakajima 2012, likelihood-scored "
              "merges + ##-continuations).")
@click.option("--id-col", default="doc_id", show_default=True)
@click.option("--text-col", default="text", show_default=True)
@click.option("--n-merges", type=int, default=100, show_default=True,
              help="[bpe/wordpiece] Maximum merges to learn.")
@click.option("--merges-per-round", type=int, default=1, show_default=True,
              help="[bpe] Symbol-disjoint merges accepted per "
              "pair-count job.")
@click.option("--vocab-size", type=int, default=200, show_default=True,
              help="[unigram] Target vocabulary size (all corpus "
              "characters are always kept for coverage).")
@click.option("--max-piece-len", type=int, default=4, show_default=True,
              help="[unigram] Longest candidate piece.")
@click.option("--em-iters", type=int, default=2, show_default=True,
              help="[unigram] Hard-EM rounds before pruning.")
@click.option("--save-tokenizer", "tokenizer_path", default=None,
              help="Also write a frozen tokenizer JSON artifact "
              "(bpe.load_tokenizer / unigram.load_unigram_tokenizer / "
              "wordpiece.load_wordpiece_tokenizer).")
@click.option("--tokenizer-format", "tokenizer_format",
              type=click.Choice(["native", "hf"]),
              default="native", show_default=True,
              help="Artifact layout for --save-tokenizer: this "
              "package's JSON, or the HuggingFace tokenizer.json "
              "layout training code consumes "
              "(hf_tokenizer.load_hf_tokenizer reads it back).")
@click.option("--pretokenize",
              type=click.Choice(["whitespace", "byte", "gpt2"]),
              default="whitespace", show_default=True,
              help="[bpe] 'byte' trains byte-level BPE over whitespace "
              "words (merges form over byte-to-unicode renderings; "
              "full byte coverage, no OOV characters); 'gpt2' uses the "
              "published GPT-2 split regex + byte rendering (leading "
              "spaces become the Ġ convention) — the mode whose "
              "--tokenizer-format hf export round-trips through the "
              "HuggingFace tokenizers library.")
@click.option("--json", "json_out", is_flag=True,
              help="Machine-readable summary.")
def corpus_train_tokenizer(
    input_path, output_path, model_kind, id_col, text_col, n_merges,
    merges_per_round, vocab_size, max_piece_len, em_iters,
    tokenizer_path, tokenizer_format, pretokenize, json_out,
) -> None:
    """Train a subword tokenizer from a document corpus — BPE (greedy
    merges; see corpus-train-bpe, which this command supersedes),
    unigram-LM (SentencePiece-style: seed substrings, hard-EM over the
    word-type table, count pruning; Viterbi encoding via
    unigram.encode_documents_unigram), or WordPiece (likelihood-scored
    merges; greedy longest-match encoding via
    wordpiece.encode_documents_wordpiece)."""
    from timefence_spark.corpus import Corpus
    from timefence_spark.engine import get_spark
    from timefence_spark.sources.readers import read_parquet

    spark = get_spark()
    df = read_parquet(spark, input_path)
    corpus = Corpus(df, id_col=id_col, text_col=text_col)
    if pretokenize != "whitespace" and model_kind != "bpe":
        raise click.UsageError(
            "--pretokenize byte/gpt2 applies to --model bpe only"
        )
    if pretokenize == "byte" and tokenizer_format == "hf":
        raise click.UsageError(
            "--pretokenize byte has no HuggingFace pre_tokenizer "
            "equivalent (the exported tokenizer.json would mis-encode "
            "raw text) — use --pretokenize gpt2 for an HF-round-"
            "trippable byte-level model, or --tokenizer-format native"
        )
    if model_kind == "bpe":
        merges = corpus.train_bpe(
            n_merges=n_merges, merges_per_round=merges_per_round,
            pretokenize=pretokenize,
        )
        spark.createDataFrame(
            [(i, l, r) for i, (l, r) in enumerate(merges)],
            "merge_rank int, lhs string, rhs string",
        ).coalesce(1).write.mode("overwrite").parquet(output_path)
        if tokenizer_path:
            from timefence_spark.operators import bpe

            vocab = bpe.bpe_vocab(
                df, text_col=text_col, merges=merges,
                pretokenize=pretokenize,
            )
            bpe.save_tokenizer(
                tokenizer_path, merges=merges, vocab=vocab,
                format=tokenizer_format, pretokenize=pretokenize,
            )
        learned = len(merges)
    elif model_kind == "wordpiece":
        merges = corpus.train_wordpiece(n_merges=n_merges)
        spark.createDataFrame(
            [(i, l, r) for i, (l, r) in enumerate(merges)],
            "merge_rank int, lhs string, rhs string",
        ).coalesce(1).write.mode("overwrite").parquet(output_path)
        if tokenizer_path:
            from timefence_spark.operators import wordpiece

            alphabet = wordpiece.wordpiece_alphabet_spark(
                df, text_col=text_col
            )
            wordpiece.save_wordpiece_tokenizer(
                tokenizer_path, merges=merges, alphabet=alphabet,
                format=tokenizer_format,
            )
        learned = len(merges)
    else:
        model = corpus.train_unigram(
            vocab_size=vocab_size, max_piece_len=max_piece_len,
            em_iters=em_iters,
        )
        spark.createDataFrame(
            [(i, p, c, lp) for i, (p, c, lp) in enumerate(model)],
            "token_id int, piece string, cnt long, logp_micro long",
        ).coalesce(1).write.mode("overwrite").parquet(output_path)
        if tokenizer_path:
            from timefence_spark.operators import unigram

            unigram.save_unigram_tokenizer(
                tokenizer_path, model=model, format=tokenizer_format
            )
        learned = len(model)
    summary = {
        "input": input_path,
        "output": output_path,
        "model": model_kind,
        "n_learned": learned,
        "tokenizer": tokenizer_path,
        "tokenizer_format": tokenizer_format if tokenizer_path else None,
        "pretokenize": pretokenize,
    }
    if json_out:
        click.echo(json.dumps(summary))
    else:
        click.echo(
            f"corpus-train-tokenizer: {model_kind} model with {learned} "
            f"entries -> {output_path}"
        )


@cli.command("corpus-inspect")
@click.option("--input", "input_path", required=True, help="Documents parquet.")
@click.option("--id-col", default="doc_id", show_default=True)
@click.option("--text-col", default="text", show_default=True)
@click.option("--json", "json_out", is_flag=True)
def corpus_inspect(input_path, id_col, text_col, json_out) -> None:
    """Profile a document corpus before cleaning: size/dup/quality/PII/
    language stats (three small Spark actions via Corpus.report())."""
    from timefence_spark.corpus import Corpus
    from timefence_spark.engine import get_spark
    from timefence_spark.sources.readers import read_parquet

    spark = get_spark()
    rep = Corpus(
        read_parquet(spark, input_path), id_col=id_col, text_col=text_col
    ).report()
    if json_out:
        click.echo(json.dumps(rep))
        return
    click.echo(f"Corpus: {input_path}")
    click.echo(
        f"  docs: {rep['n_docs']}  distinct texts: {rep['n_distinct_texts']}"
        f"  exact-dup: {rep['exact_dup_pct']}%"
    )
    click.echo(
        f"  chars avg/median: {rep['avg_chars']}/{rep['median_chars']}"
        f"  tokens avg: {rep['avg_tokens']}"
    )
    click.echo(
        f"  quality avg: {rep['avg_quality']}  >=0.75: {rep['high_quality_pct']}%"
        f"  PII docs: {rep['pii_doc_pct']}%"
    )
    langs = ", ".join(f"{k}={v}" for k, v in sorted(rep["languages"].items()))
    click.echo(f"  languages: {langs}")


@cli.command("embeddings-build-index")
@click.option("--input", "input_path", required=True,
              help="Embeddings parquet (id + vector columns).")
@click.option("--output", "index_path", required=True,
              help="Index directory (centroids/codebook/codes/meta).")
@click.option("--id-col", default="vec_id", show_default=True)
@click.option("--vec-col", default="embedding", show_default=True)
@click.option("--nlist", type=int, default=16, show_default=True,
              help="Coarse-quantizer lists (codes partition by list).")
@click.option("--m", "m_sub", type=int, default=8, show_default=True,
              help="PQ subspaces (bytes per stored vector).")
@click.option("--nbits", type=int, default=4, show_default=True,
              help="Bits per PQ code (2**nbits sub-centroids).")
@click.option("--residual/--no-residual", default=True, show_default=True,
              help="Encode x - centroid (faiss IndexIVFPQ) vs raw.")
@click.option("--opq", "opq_method",
              type=click.Choice(["none", "seeded", "parametric"]),
              default="none", show_default=True,
              help="Train an OPQ rotation and build the index in the "
              "rotated space (persisted; search auto-rotates queries).")
@click.option("--seed", type=int, default=42, show_default=True)
@click.option("--hash-fn", default="xxhash64", show_default=True)
@click.option("--json", "json_out", is_flag=True)
def embeddings_build_index(
    input_path, index_path, id_col, vec_col, nlist, m_sub, nbits,
    residual, opq_method, seed, hash_fn, json_out,
) -> None:
    """Build a persisted IVF-PQ ANN index over an embeddings table
    (similarity.ivf_pq_build_index): k-means coarse lists + product-
    quantized codes partitioned by list, so searches read nprobe/nlist
    of the files and what they read is codes, not vectors."""
    from timefence_spark.engine import get_spark
    from timefence_spark.operators import similarity
    from timefence_spark.sources.readers import read_parquet

    spark = get_spark()
    df = read_parquet(spark, input_path)
    rotation = None
    if opq_method != "none":
        rotation = similarity.opq_train(
            df, corpus_id=id_col, corpus_vec=vec_col, seed=seed,
            method=opq_method, m=m_sub, nbits=nbits,
        )
    similarity.ivf_pq_build_index(
        df, corpus_id=id_col, corpus_vec=vec_col, nlist=nlist, m=m_sub,
        nbits=nbits, seed=seed, hash_fn=hash_fn, residual=residual,
        rotation=rotation, path=index_path,
    )
    summary = {
        "input": input_path,
        "index": index_path,
        "nlist": nlist,
        "m": m_sub,
        "nbits": nbits,
        "residual": bool(residual),
        "opq": opq_method,
    }
    if json_out:
        click.echo(json.dumps(summary))
    else:
        click.echo(
            f"embeddings-build-index: IVF-PQ(nlist={nlist}, m={m_sub}, "
            f"nbits={nbits}, residual={residual}, opq={opq_method}) "
            f"-> {index_path}"
        )


@cli.command("embeddings-append-index")
@click.option("--index", "index_path", required=True,
              help="Index directory from embeddings-build-index.")
@click.option("--input", "input_path", required=True,
              help="NEW embeddings parquet to add (id + vector columns).")
@click.option("--id-col", default="vec_id", show_default=True)
@click.option("--vec-col", default="embedding", show_default=True)
@click.option("--json", "json_out", is_flag=True)
def embeddings_append_index(
    index_path, input_path, id_col, vec_col, json_out
) -> None:
    """Append new rows to a persisted IVF-PQ index without retraining
    (similarity.ivf_pq_append): the new vectors encode against the
    index's FROZEN centroids/codebook/rotation and land as appended
    list-partitioned code files; the meta generation counter bumps.
    Rebuild (embeddings-build-index) when the data distribution has
    drifted from the trained model."""
    from timefence_spark.engine import get_spark
    from timefence_spark.operators import similarity
    from timefence_spark.sources.readers import read_parquet

    spark = get_spark()
    df = read_parquet(spark, input_path)
    generation = similarity.ivf_pq_append(
        spark, index_path, df, corpus_id=id_col, corpus_vec=vec_col
    )
    summary = {
        "index": index_path,
        "appended_from": input_path,
        "generation": generation,
    }
    if json_out:
        click.echo(json.dumps(summary))
    else:
        click.echo(
            f"embeddings-append-index: {input_path} -> {index_path} "
            f"(generation {generation})"
        )


@cli.command("embeddings-search")
@click.option("--index", "index_path", required=True,
              help="Index directory from embeddings-build-index.")
@click.option("--queries", "queries_path", required=True,
              help="Query embeddings parquet.")
@click.option("--output", "output_path", default=None,
              help="Write results parquet; omit to print the top rows.")
@click.option("--id-col", default="vec_id", show_default=True)
@click.option("--vec-col", default="embedding", show_default=True)
@click.option("--k", type=int, default=10, show_default=True)
@click.option("--nprobe", type=int, default=4, show_default=True,
              help="Coarse lists probed per query (recall/cost dial).")
@click.option("--rerank", "rerank_path", default=None,
              help="Raw-vector parquet for exact re-ranking of the "
              "top k*4 ADC candidates.")
@click.option("--json", "json_out", is_flag=True)
def embeddings_search(
    index_path, queries_path, output_path, id_col, vec_col, k, nprobe,
    rerank_path, json_out,
) -> None:
    """Search a persisted IVF-PQ index (similarity.ivf_pq_search):
    queries probe their nprobe nearest lists, the probed list ids prune
    the partitioned codes table at file level, candidates score by
    asymmetric PQ distance, and --rerank re-scores the shortlist
    against raw vectors."""
    from timefence_spark.engine import get_spark
    from timefence_spark.operators import similarity
    from timefence_spark.sources.readers import read_parquet

    spark = get_spark()
    queries = read_parquet(spark, queries_path)
    rerank = rerank_id = None
    if rerank_path is not None:
        rerank = read_parquet(spark, rerank_path)
        rerank_id = id_col
    res = similarity.ivf_pq_search(
        spark, index_path, queries, query_id=id_col, query_vec=vec_col,
        k=k, nprobe=nprobe, rerank=rerank, rerank_id=rerank_id,
        rerank_vec=vec_col,
    )
    if output_path:
        res.write.mode("overwrite").parquet(output_path)
        n = spark.read.parquet(output_path).count()
        if json_out:
            click.echo(json.dumps(
                {"index": index_path, "queries": queries_path,
                 "output": output_path, "rows": n, "k": k,
                 "nprobe": nprobe}
            ))
        else:
            click.echo(
                f"embeddings-search: {n} result rows -> {output_path}"
            )
        return
    rows = res.orderBy("query_id", "rank").limit(50).collect()
    if json_out:
        click.echo(json.dumps(
            {"results": [
                {"query_id": r["query_id"],
                 "neighbor_id": r["neighbor_id"],
                 "cosine": r["cosine"], "rank": r["rank"]}
                for r in rows
            ]}
        ))
        return
    for r in rows:
        click.echo(
            f"  q={r['query_id']} #{r['rank']}: {r['neighbor_id']} "
            f"(cosine={r['cosine']})"
        )


def main() -> None:  # console entry point
    cli()


if __name__ == "__main__":
    main()
