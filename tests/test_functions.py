"""timefence_spark.functions — column-expression library."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

import timefence_spark.functions as tff


def test_vector_functions(spark):
    df = spark.createDataFrame([([1.0, 0.0], [0.0, 2.0])], "a array<double>, b array<double>")
    row = df.select(
        tff.dot(F.col("a"), F.col("b")).alias("dot"),
        tff.l2_norm(F.col("b")).alias("norm"),
        tff.cosine(F.col("a"), F.col("a")).alias("cos_self"),
    ).first()
    assert row["dot"] == 0.0
    assert row["norm"] == 2.0
    assert abs(row["cos_self"] - 1.0) < 1e-12


def test_tokens_and_shingles(spark):
    df = spark.createDataFrame([("The quick brown fox",)], "text string")
    row = df.select(
        tff.tokens("text").alias("toks"),
        tff.shingles(F.col("text"), k=2).alias("sh"),
    ).first()
    assert row["toks"] == ["the", "quick", "brown", "fox"]
    assert "quick brown" in row["sh"]


def test_time_minus_and_is_leak(spark):
    df = spark.createDataFrame(
        [(datetime(2024, 1, 10), datetime(2024, 1, 8))], "lt timestamp_ntz, ft timestamp_ntz"
    )
    row = df.select(
        tff.time_minus("lt", "1d12h").alias("m"),
        tff.is_leak("ft", "lt").alias("leak0"),
        tff.is_leak("ft", "lt", embargo="3d").alias("leak3d"),
        tff.is_leak("ft", "lt", embargo="2d").alias("leak2d_strict"),
        tff.is_leak("ft", "lt", embargo="2d", strict=False).alias("leak2d_incl"),
    ).first()
    assert row["m"] == datetime(2024, 1, 8, 12)
    assert row["leak0"] is False  # ft two days before lt
    assert row["leak3d"] is True  # embargo pushes the bound before ft
    assert row["leak2d_strict"] is True  # strict: ft == lt - 2d violates ft < bound
    assert row["leak2d_incl"] is False  # inclusive allows ft == lt - 2d
