"""Column-expression library — ``timefence_spark.functions``.

The engine-level entry points live in :mod:`timefence_spark` (build/audit/
explain/diff) and :mod:`timefence_spark.operators`; this module exposes the
reusable *Column* building blocks in one flat namespace, in the spirit of
``pyspark.sql.functions``. Everything here compiles to built-in Catalyst
expressions (JVM-side, whole-stage-codegen-able) — no Python UDFs.

Temporal (the reference's duration/interval surface,
/root/reference/src/timefence/_duration.py:69-87):

* :func:`interval` / :func:`time_minus` — duration strings ("30d", "1d12h")
  as fixed-width day-time interval arithmetic.
* :func:`is_leak` — the temporal-correctness predicate
  ``feature_time >= label_time - embargo`` (audit.temporal's row test,
  engine.py:1577-1581).

Text / similarity (training-data pipeline surface):

* :func:`tokens`, :func:`shingles` — tokenization primitives.
* :func:`dot`, :func:`l2_norm`, :func:`cosine` — embedding math over
  ``array<numeric>`` columns via ``zip_with`` / ``aggregate``.
"""

from __future__ import annotations

from datetime import timedelta

from pyspark.sql import Column
from pyspark.sql import functions as F

from timefence_spark._duration import duration_seconds, parse_duration
from timefence_spark.operators.dedup import shingles
from timefence_spark.operators.similarity import cosine, dot, l2_norm
from timefence_spark.operators.text import _tokens


def tokens(text: Column | str) -> Column:
    """Lowercased whitespace tokens of a text column."""
    col = F.col(text) if isinstance(text, str) else text
    return _tokens(col)


def interval(duration: str | timedelta | int) -> Column:
    """A duration ("30d", "1d12h", timedelta, or seconds) as a fixed-width
    day-time interval literal. Reference durations never contain months, so
    this is exact — no calendar ambiguity (SURVEY.md §7.3 trap 5)."""
    secs = (
        duration
        if isinstance(duration, int)
        else duration_seconds(parse_duration(duration))
    )
    return F.make_dt_interval(secs=F.lit(int(secs or 0)))


def time_minus(ts: Column | str, duration: str | timedelta | int | None) -> Column:
    """``ts - duration`` with the duration grammar above; identity on None/0."""
    col = F.col(ts) if isinstance(ts, str) else ts
    if duration is None:
        return col
    secs = (
        duration
        if isinstance(duration, int)
        else duration_seconds(parse_duration(duration))
    )
    if not secs:
        return col
    return col - F.make_dt_interval(secs=F.lit(int(secs)))


def is_leak(
    feature_time: Column | str,
    label_time: Column | str,
    *,
    embargo: str | timedelta | int = 0,
    strict: bool = True,
) -> Column:
    """True when a row violates ``feature_time < label_time - embargo``
    (strict; ``<=`` inclusive). NULL feature_time is never a leak."""
    ft = F.col(feature_time) if isinstance(feature_time, str) else feature_time
    lt = F.col(label_time) if isinstance(label_time, str) else label_time
    bound = time_minus(lt, embargo)
    cmp = (ft >= bound) if strict else (ft > bound)
    return ft.isNotNull() & cmp


__all__ = [
    "tokens",
    "shingles",
    "dot",
    "l2_norm",
    "cosine",
    "interval",
    "time_minus",
    "is_leak",
]
