"""Streaming temporal audit — the reference's audit.temporal invariant
(/root/reference/src/timefence/engine.py:1561-1632: a row leaks when its
``__feature_time`` is non-null and ``>= label_time [- embargo]``) applied to
live data instead of a finished file.

Both operators are pure projections/aggregations over built-in functions —
no UDFs, no state beyond the standard watermarked streaming aggregation —
so they run identically on batch DataFrames.
"""

from __future__ import annotations

from datetime import timedelta

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from timefence_spark._duration import duration_seconds, parse_duration


def _leak_expr(
    ft_col: str, label_time: str, embargo_s: int, strict: bool
) -> Column:
    """True when the row violates ``feature_time < label_time - embargo``
    (strict mode audits with ``>=``; inclusive mode with ``>``)."""
    bound = F.col(label_time) - F.make_dt_interval(secs=F.lit(embargo_s))
    ft = F.col(ft_col)
    cmp = (ft >= bound) if strict else (ft > bound)
    return ft.isNotNull() & cmp


def flag_leaks(
    df: DataFrame,
    *,
    feature_time_columns: dict[str, str],
    label_time: str,
    embargo: str | timedelta | int = 0,
    strict: bool = True,
) -> DataFrame:
    """Add one boolean ``__leak__{feature}`` column per audited feature plus
    ``__leak_any`` — a row-level leak detector suitable for routing a live
    training-data stream (e.g. leaky rows to a quarantine sink via
    ``.filter("__leak_any")``).
    """
    embargo_s = (
        embargo if isinstance(embargo, int) else duration_seconds(parse_duration(embargo))
    ) or 0
    out = df
    flags = []
    for feat, ft_col in feature_time_columns.items():
        flag = f"__leak__{feat}"
        out = out.withColumn(flag, _leak_expr(ft_col, label_time, embargo_s, strict))
        flags.append(flag)
    any_expr = F.lit(False)
    for flag in flags:
        any_expr = any_expr | F.col(flag)
    return out.withColumn("__leak_any", any_expr)


def leak_counts(
    df: DataFrame,
    *,
    feature_time_columns: dict[str, str],
    label_time: str,
    embargo: str | timedelta | int = 0,
    strict: bool = True,
    window: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Tumbling-window leak counts per feature: one row per event-time
    window with ``rows`` plus ``{feature}__leaks`` / ``{feature}__max_leak_s``
    (worst leakage magnitude, seconds — the streaming analogue of the batch
    audit's MAX(ft - lt) stat, engine.py:1584-1590). Watermarked, so the
    result is an append-mode stream; on a batch DataFrame it is a plain
    windowed aggregation.
    """
    embargo_s = (
        embargo if isinstance(embargo, int) else duration_seconds(parse_duration(embargo))
    ) or 0
    wdf = df
    if wdf.isStreaming:
        wdf = wdf.withWatermark(label_time, watermark)
    aggs = []
    for feat, ft_col in feature_time_columns.items():
        leak = _leak_expr(ft_col, label_time, embargo_s, strict)
        aggs.append(F.count(F.when(leak, 1)).alias(f"{feat}__leaks"))
        magnitude = F.unix_micros(F.col(ft_col).cast("timestamp")) - F.unix_micros(
            F.col(label_time).cast("timestamp")
        )
        aggs.append(
            (F.max(F.when(leak, magnitude)) / 1_000_000.0).alias(f"{feat}__max_leak_s")
        )
    agged = wdf.groupBy(F.window(label_time, window).alias("window")).agg(
        F.count(F.lit(1)).alias("rows"), *aggs
    )
    stat_cols = [c for c in agged.columns if c != "window"]
    return agged.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *stat_cols,
    )
