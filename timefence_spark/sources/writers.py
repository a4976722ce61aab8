"""Clustered (sorted) parquet writing — layout for scan-time pruning.

Parquet scans prune by footer zone maps (row-group min/max stats): a
filter on a column whose values are SCATTERED across every file reads
everything, while the same filter over a RANGE-CLUSTERED layout reads
the one or two files whose min/max straddle the predicate. At 100 TB
this is the difference between a full scan and a point lookup — the
write-side half of the pushdown story (the read side is Catalyst's
PushedFilters, which the plan tests pin).

:func:`write_clustered` produces that layout with stock Spark
machinery: ``repartitionByRange`` on the cluster keys (one range
shuffle — Spark samples the keys for balanced cut points, so skew
spreads across files instead of hot-spotting one), then
``sortWithinPartitions`` so row groups WITHIN each file are tight too
(row-group-level pruning + better RLE/dictionary compression on the
clustered column), then a plain parquet write, optionally capped by
``maxRecordsPerFile``. No custom committer, no driver-side data
movement; every engine that reads parquet footers (Spark, DuckDB,
Trino, ...) benefits with zero reader-side changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_clustered(
    df: DataFrame,
    path: str,
    *,
    cluster_by: str | list[str],
    sort_by: str | list[str] | None = None,
    num_files: int | None = None,
    max_records_per_file: int | None = None,
    mode: str = "error",
    compression: str | None = None,
) -> None:
    """Write ``df`` as range-clustered parquet: rows range-partition on
    ``cluster_by`` (ONE shuffle, sampled cut points), sort within each
    file by ``cluster_by`` (+ optional ``sort_by`` tie-breakers, e.g. a
    timestamp under an id), and land as one file per range partition —
    so each file owns a disjoint key range and its footer min/max
    prunes exactly.

    ``num_files`` sets the range partition count (default: Spark's
    current shuffle parallelism — at scale, pick
    ``input_bytes / target_file_bytes``); ``max_records_per_file``
    additionally caps file size (extra files still inherit the sort,
    so their row-group stats stay tight). NULL cluster keys sort first
    (Spark NULLS FIRST default), landing in the lowest range file."""
    cluster = [cluster_by] if isinstance(cluster_by, str) else list(cluster_by)
    if not cluster:
        raise ValueError("cluster_by must name at least one column")
    extra = (
        [sort_by] if isinstance(sort_by, str) else list(sort_by or [])
    )
    if num_files is not None:
        if num_files < 1:
            raise ValueError(f"num_files must be >= 1, got {num_files}")
        ranged = df.repartitionByRange(num_files, *cluster)
    else:
        ranged = df.repartitionByRange(*cluster)
    ordered = ranged.sortWithinPartitions(*cluster, *extra)
    writer = ordered.write.mode(mode)
    if max_records_per_file is not None:
        if max_records_per_file < 1:
            raise ValueError(
                f"max_records_per_file must be >= 1, got "
                f"{max_records_per_file}"
            )
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if compression is not None:
        writer = writer.option("compression", compression)
    writer.parquet(path)


def file_key_ranges(
    path: str, column: str
) -> list[tuple[str, object, object]]:
    """(file, min, max) of ``column`` per parquet file under ``path``,
    from the footer statistics — the pruning metadata a clustered
    write is supposed to tighten. Driver-side pyarrow footer reads
    (no data pages); used by tests and layout audits."""
    from pathlib import Path

    import pyarrow.parquet as pq

    out = []
    for f in sorted(Path(path).glob("*.parquet")):
        md = pq.ParquetFile(str(f)).metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            for ci in range(row_group.num_columns):
                col = row_group.column(ci)
                if col.path_in_schema != column:
                    continue
                st = col.statistics
                if st is None or not st.has_min_max:
                    continue
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
        out.append((f.name, lo, hi))
    return out
