"""Clustered parquet writing (round 11): range-disjoint file layouts,
footer zone-map tightening vs an unclustered write, record caps, the
Corpus.write(cluster_by=) path, and validation."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from timefence_spark.sources.writers import file_key_ranges, write_clustered


def _ranges_disjoint(ranges) -> bool:
    spans = sorted((lo, hi) for _, lo, hi in ranges if lo is not None)
    return all(
        spans[i][1] <= spans[i + 1][0] for i in range(len(spans) - 1)
    )


def test_write_clustered_roundtrip_and_disjoint_ranges(spark, tmp_path):
    df = spark.range(0, 2000).select(
        (F.col("id") * 7919 % 2000).alias("k"),
        F.col("id").alias("payload"),
    )
    out = str(tmp_path / "clustered")
    write_clustered(df, out, cluster_by="k", num_files=4)
    back = spark.read.parquet(out)
    assert back.count() == 2000
    assert (
        back.groupBy().agg(F.sum("payload")).first()[0]
        == df.groupBy().agg(F.sum("payload")).first()[0]
    )
    ranges = file_key_ranges(out, "k")
    assert len(ranges) == 4
    assert _ranges_disjoint(ranges)
    # each file's footer span covers ~1/4 of the key space, so a point
    # filter can prune 3 of 4 files; the unclustered write cannot
    plain = str(tmp_path / "plain")
    df.repartition(4).write.parquet(plain)
    plain_ranges = file_key_ranges(plain, "k")
    assert not _ranges_disjoint(plain_ranges)
    # pruning arithmetic: files whose [min, max] straddles k=100
    hit = [r for r in ranges if r[1] <= 100 <= r[2]]
    assert len(hit) == 1
    hit_plain = [r for r in plain_ranges if r[1] <= 100 <= r[2]]
    assert len(hit_plain) == 4


def test_write_clustered_sort_and_record_cap(spark, tmp_path):
    df = spark.range(0, 500).select(
        (F.col("id") % 10).alias("k"),
        (F.lit(499) - F.col("id")).alias("ts"),
    )
    out = str(tmp_path / "capped")
    write_clustered(
        df, out, cluster_by="k", sort_by="ts", num_files=2,
        max_records_per_file=100,
    )
    import pyarrow.parquet as pq
    from pathlib import Path

    files = sorted(Path(out).glob("*.parquet"))
    assert len(files) >= 5  # 500 rows / 100-record cap
    for f in files:
        assert pq.ParquetFile(str(f)).metadata.num_rows <= 100
    # within every file rows are (k, ts)-sorted — the tight-row-group
    # property maxRecordsPerFile must not break
    for f in files:
        t = pq.read_table(str(f)).to_pylist()
        keys = [(r["k"], r["ts"]) for r in t]
        assert keys == sorted(keys)


def test_corpus_write_cluster_by(spark, tmp_path):
    from timefence_spark.corpus import Corpus

    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(100)], "doc_id long, text string"
    )
    out = str(tmp_path / "corpus")
    Corpus(df).write(out, cluster_by="doc_id", num_files=3, mode="overwrite")
    assert spark.read.parquet(out).count() == 100
    assert _ranges_disjoint(file_key_ranges(out, "doc_id"))
    with pytest.raises(ValueError, match="mutually exclusive"):
        Corpus(df).write(out, cluster_by="doc_id", partition_by="doc_id")
    with pytest.raises(ValueError, match="parquet"):
        Corpus(df).write(out, cluster_by="doc_id", format="jsonl")


def test_write_clustered_validation(spark, tmp_path):
    df = spark.range(5).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="cluster_by"):
        write_clustered(df, str(tmp_path / "x"), cluster_by=[])
    with pytest.raises(ValueError, match="num_files"):
        write_clustered(df, str(tmp_path / "x"), cluster_by="k", num_files=0)
    with pytest.raises(ValueError, match="max_records_per_file"):
        write_clustered(
            df, str(tmp_path / "x"), cluster_by="k", max_records_per_file=0
        )
