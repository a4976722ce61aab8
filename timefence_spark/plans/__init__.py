"""Physical-plan introspection — ``timefence_spark.plans``.

The reference exposes its generated SQL transcript for inspection
(`BuildResult.sql`, /root/reference/src/timefence/engine.py:1491-1497); the
Spark-native analogue is Catalyst's physical plan. This module turns
``df.explain()`` text into structured facts so plan *health* can be asserted
in tests and monitored in production:

* :func:`physical_summary` — operator counts that matter at scale: shuffle
  exchanges, broadcast vs sort-merge joins, window operators, whole-stage
  codegen spans.
* :func:`scan_details` — per-Parquet-scan pushed filters and read schema
  (is column pruning / predicate pushdown actually reaching the scan?).
* :func:`assert_plan` — a regression guard: fail fast when a code change
  silently adds a shuffle or drops a broadcast. Used by the test suite to
  pin the as-of join's physical shape (one exchange per side).

Everything reads Catalyst's query execution via the private ``_jdf`` bridge;
failures degrade to permissive results (summary of zeros) rather than
breaking user code on API drift.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def _executed_plan_str(df: DataFrame) -> str:
    try:
        text = df._jdf.queryExecution().executedPlan().toString()
    except Exception:  # pragma: no cover - connect mode / API drift
        return ""
    # Post-execution AQE plans append the pre-adaptive plan under an
    # "== Initial Plan ==" header; keep only the current/final plan so
    # operators aren't double-counted.
    return text.split("== Initial Plan ==")[0]


def _full_qe_str(df: DataFrame) -> str:
    try:
        return df._jdf.queryExecution().toString()
    except Exception:  # pragma: no cover
        return ""


def _formatted_plan_str(df: DataFrame) -> str:
    """explain('formatted') text — the only mode that annotates codegen ids
    under AQE (the executed-plan string is pre-adaptive).

    Tries the JVM helper by its fully-qualified name first (the bare
    ``jvm.PythonSQLUtils`` alias is not importable on every Spark build),
    then falls back to capturing ``df.explain('formatted')`` stdout — the
    public API — so the probe never silently degrades to an empty string
    while Spark itself can still explain the plan.
    """
    try:
        jvm = df.sparkSession._jvm
        return jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
    except Exception:
        pass
    import contextlib
    import io

    buf = io.StringIO()
    try:
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
    except Exception:  # pragma: no cover - connect mode / API drift
        return ""
    return buf.getvalue()


@dataclass
class PlanSummary:
    exchanges: int = 0
    broadcast_joins: int = 0
    sort_merge_joins: int = 0
    nested_loop_joins: int = 0
    windows: int = 0
    codegen_spans: int = 0
    scans: list[dict] = field(default_factory=list)

    def __str__(self) -> str:
        lines = [
            f"exchanges={self.exchanges} broadcast_joins={self.broadcast_joins} "
            f"sort_merge_joins={self.sort_merge_joins} "
            f"nested_loop_joins={self.nested_loop_joins} windows={self.windows} "
            f"codegen_spans={self.codegen_spans}"
        ]
        for s in self.scans:
            lines.append(
                f"scan {s['location']}: columns={s['columns']} "
                f"pushed={s['pushed_filters']}"
            )
        return "\n".join(lines)


def physical_summary(df: DataFrame) -> PlanSummary:
    """Structured operator counts from the executed physical plan."""
    plan = _executed_plan_str(df)
    return PlanSummary(
        exchanges=len(re.findall(r"\bExchange\b", plan)),
        broadcast_joins=len(re.findall(r"\bBroadcast(?:Hash|NestedLoop)?Join\b", plan))
        - len(re.findall(r"\bBroadcastNestedLoopJoin\b", plan)),
        sort_merge_joins=len(re.findall(r"\bSortMergeJoin\b", plan)),
        nested_loop_joins=len(re.findall(r"\bBroadcastNestedLoopJoin\b", plan)),
        windows=len(re.findall(r"\bWindow\b", plan)),
        codegen_spans=_codegen_spans(df, plan),
        scans=scan_details(df),
    )


def _codegen_spans(df: DataFrame, executed_plan: str) -> int:
    """Distinct whole-stage-codegen spans in the physical plan.

    Two sources, because AQE only materializes codegen at runtime: the
    ``formatted`` explain annotates ``codegen id : N`` for non-adaptive
    plans, while an executed adaptive plan marks collapsed stages with
    ``*(N)`` in its final-plan string. Take whichever view saw more.
    """
    formatted_ids = set(re.findall(r"codegen id : (\d+)", _formatted_plan_str(df)))
    executed_ids = set(re.findall(r"\*\((\d+)\)", executed_plan))
    return max(len(formatted_ids), len(executed_ids))


_SCAN_RE = re.compile(
    r"FileScan (?P<fmt>\w+) \[(?P<cols>[^\]]*)\].*?"
    r"(?:DataFilters: \[(?P<datafilters>[^\]]*)\])?.*?"
    r"Location: \S+\((?:\d+ paths\))?\[?(?P<loc>[^\],\s]*)",
)
_PUSHED_RE = re.compile(r"PushedFilters: \[(?P<pushed>[^\]]*)\]")


def scan_details(df: DataFrame) -> list[dict]:
    """One dict per file scan: location, read columns, pushed filters."""
    text = _full_qe_str(df)
    out: list[dict] = []
    for line in text.splitlines():
        if "FileScan" not in line:
            continue
        m = _SCAN_RE.search(line)
        if not m:
            continue
        cols = [
            c.split("#")[0].strip() for c in m.group("cols").split(",") if c.strip()
        ]
        pushed_m = _PUSHED_RE.search(line)
        pushed = (
            [p.strip() for p in pushed_m.group("pushed").split(",") if p.strip()]
            if pushed_m
            else []
        )
        entry = {
            "format": m.group("fmt"),
            "columns": cols,
            "pushed_filters": pushed,
            "location": m.group("loc"),
        }
        if entry not in out:  # the QE string repeats plans across sections
            out.append(entry)
    return out


def assert_plan(
    df: DataFrame,
    *,
    max_exchanges: int | None = None,
    require_broadcast_join: bool = False,
    forbid_sort_merge_join: bool = False,
    forbid_nested_loop_join: bool = True,
    max_scan_columns: int | None = None,
) -> PlanSummary:
    """Assert physical-plan health; returns the summary for further checks.

    ``forbid_nested_loop_join`` defaults on: a BroadcastNestedLoopJoin in a
    PIT plan means the equi-key part of the join condition was lost and the
    plan degenerates to O(n*m) — always a bug here.
    """
    s = physical_summary(df)
    problems: list[str] = []
    if max_exchanges is not None and s.exchanges > max_exchanges:
        problems.append(f"{s.exchanges} exchanges (allowed {max_exchanges})")
    if require_broadcast_join and s.broadcast_joins == 0:
        problems.append("no broadcast join in plan")
    if forbid_sort_merge_join and s.sort_merge_joins > 0:
        problems.append(f"{s.sort_merge_joins} sort-merge joins present")
    if forbid_nested_loop_join and s.nested_loop_joins > 0:
        problems.append(f"{s.nested_loop_joins} nested-loop joins present")
    if max_scan_columns is not None:
        for scan in s.scans:
            if len(scan["columns"]) > max_scan_columns:
                problems.append(
                    f"scan of {scan['location']} reads {len(scan['columns'])} "
                    f"columns {scan['columns']} (allowed {max_scan_columns})"
                )
    if problems:
        raise AssertionError(
            "physical plan unhealthy: " + "; ".join(problems) + "\n" + str(s)
        )
    return s


__all__ = ["PlanSummary", "physical_summary", "scan_details", "assert_plan"]
