"""Source/Labels loading — every reader surface of the reference
(S1-S4,S6 in SURVEY §2.1; reference engine.py:457-505), Spark-native.

All paths go through ``spark.read`` so Catalyst keeps predicate pushdown,
column pruning and partition pruning on the scans; in-memory inputs go
through ``spark.createDataFrame`` (Arrow-accelerated for pandas).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from timefence_spark.core import Labels, Source, SQLSource, safe_name
from timefence_spark.errors import TimefenceValidationError


def _abs(path: str | Path) -> str:
    """Absolutize local relative paths against the *Python* cwd — Spark's JVM
    resolves relative paths against its own start dir, which diverges from
    the driver process after a chdir (CLI runs inside project dirs)."""
    s = str(path)
    if "://" in s or s.startswith("/"):
        return s
    return str(Path(s).resolve())


def read_parquet(spark: SparkSession, path: str | Path) -> DataFrame:
    """``spark.read.parquet`` that tolerates TIMESTAMP(NANOS) columns.

    Spark's vectorized reader rejects nanosecond parquet timestamps
    (PARQUET_TYPE_ILLEGAL). When the footer declares timestamp[ns] columns we
    flip ``spark.sql.legacy.parquet.nanosAsLong``, read them as long nanos,
    and rebuild TIMESTAMP_NTZ values with integer division (exact — double
    division would lose microseconds at 1e18 nanos).
    """
    path = _abs(path)
    ns_cols: list[str] = []
    try:
        import pyarrow.dataset as ds
        import pyarrow.types as pat

        dataset = ds.dataset(path, format="parquet")
        ns_cols = [
            f.name
            for f in dataset.schema
            if pat.is_timestamp(f.type) and f.type.unit == "ns"
        ]
        if ns_cols:
            # Legacy INT96 timestamps (Spark's own default output type for
            # TIMESTAMP_LTZ) ALSO surface as timestamp[ns] in the Arrow
            # schema, but Spark reads INT96 natively — applying the
            # nanosAsLong rewrite to them breaks the read. Only true INT64
            # nano columns need the legacy flag, so drop any column whose
            # physical type is INT96.
            for frag in dataset.get_fragments():
                md = frag.metadata
                if md is None or not md.num_row_groups:
                    continue  # empty part files carry no row groups
                rg = md.row_group(0)
                int96 = {
                    rg.column(i).path_in_schema
                    for i in range(rg.num_columns)
                    if rg.column(i).physical_type == "INT96"
                }
                ns_cols = [c for c in ns_cols if c not in int96]
                break
    except Exception:  # pragma: no cover - footer probe is best-effort
        pass
    if not ns_cols:
        return spark.read.parquet(path)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in ns_cols:
        df = df.withColumn(
            c,
            F.timestamp_micros(F.expr(f"`{c}` div 1000")).cast("timestamp_ntz"),
        )
    return df


def read_jsonl(
    spark: SparkSession,
    path: str | Path,
    *,
    schema: str | None = None,
    text_col: str | None = None,
) -> DataFrame:
    """Newline-delimited JSON — the interchange format LLM corpora ship
    in (one document object per line). At 100 TB pass ``schema`` (a DDL
    string): without it Spark runs a full inference SCAN of every file
    before the real read, doubling ingest cost; with it the reader
    single-passes and silently NULL-fills missing fields (corrupt lines
    land in Spark's ``_corrupt_record`` convention). ``text_col`` adds a
    cheap presence check so a wrong field name fails fast instead of
    producing an all-NULL corpus."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.json(_abs(path))
    if text_col is not None and text_col not in df.columns:
        raise ValueError(
            f"JSONL at {path} has no field {text_col!r}; found "
            f"{df.columns}"
        )
    return df


def _df_to_spark(spark: SparkSession, df: Any) -> DataFrame:
    """Accept a Spark DataFrame as-is; convert pandas/Arrow via Spark."""
    if isinstance(df, DataFrame):
        return df
    try:
        return spark.createDataFrame(df)
    except Exception as exc:  # pragma: no cover - defensive
        raise TimefenceValidationError(
            f"Cannot ingest DataFrame of type {type(df).__name__}. "
            "Provide a Spark or pandas DataFrame, or save to parquet first."
        ) from exc


def _load_duckdb_sql(spark: SparkSession, source: SQLSource) -> DataFrame:
    """Run a connection-backed SQLSource's query in DuckDB and stage the
    result to parquet for Spark to scan (reference core.py:110-149 attaches
    the database file and runs the query in-process; we do the same on the
    driver, then hand Spark a scannable file instead of a driver-resident
    table). Staging is keyed on (db path, db mtime, query, views) so repeated
    builds against an unchanged database reuse the same parquet."""
    import hashlib
    import tempfile

    import duckdb
    import pyarrow.parquet as pq

    db_path = source.connection
    if not Path(db_path).exists():
        raise TimefenceValidationError(
            f"SQLSource '{source.name}': connection database not found: {db_path}"
        )
    mtime = Path(db_path).stat().st_mtime_ns
    key_src = repr((db_path, mtime, source.query, sorted(source.views.items())))
    digest = hashlib.sha256(key_src.encode()).hexdigest()[:16]
    stage = (
        Path(tempfile.gettempdir())
        / f"tf_sqlsource_{safe_name(source.name)}_{digest}.parquet"
    )
    if not stage.exists():
        con = duckdb.connect(db_path, read_only=True)
        try:
            for view, path in source.views.items():
                p = _abs(path)
                if Path(p).is_dir():  # Spark-style parquet directory
                    p = f"{p}/**/*.parquet"
                con.execute(
                    f"CREATE OR REPLACE TEMP VIEW {view} AS "
                    f"SELECT * FROM read_parquet('{p}')"
                )
            tbl = con.execute(source.query).arrow()
        finally:
            con.close()
        tmp = stage.with_suffix(".parquet.tmp")
        pq.write_table(tbl, tmp)
        tmp.replace(stage)  # atomic publish — concurrent builds see whole files
    return read_parquet(spark, stage)


def load_source_df(spark: SparkSession, source: Source | SQLSource) -> DataFrame:
    """Load a source into a DataFrame (S1 parquet, S2 csv, S3 df, S4 sql)."""
    if isinstance(source, SQLSource):
        if source.connection is not None:
            return _load_duckdb_sql(spark, source)
        for view, path in source.views.items():
            spark.read.parquet(_abs(path)).createOrReplaceTempView(view)
        return spark.sql(source.query)
    if source.df is not None:
        df = _df_to_spark(spark, source.df)
    elif source.format == "parquet":
        df = read_parquet(spark, source.path)
    elif source.format == "csv":
        # Infer timestamps as TIMESTAMP_NTZ (naive) — CSV text carries no
        # zone, and the reference's CSV reader yields naive timestamps too.
        prev = spark.conf.get("spark.sql.timestampType", "TIMESTAMP_LTZ")
        spark.conf.set("spark.sql.timestampType", "TIMESTAMP_NTZ")
        try:
            df = (
                spark.read.option("header", True)
                .option("delimiter", source.delimiter)
                .option("inferSchema", True)
                .csv(_abs(source.path))
            )
            df.schema  # force eager schema inference under this conf
        finally:
            spark.conf.set("spark.sql.timestampType", prev)
    else:
        raise TimefenceValidationError(f"Unsupported source format: {source.format}")

    # S6: declared strftime format for string timestamp columns.
    if source.timestamp_format and source.timestamp in df.columns:
        dtype = df.schema[source.timestamp].dataType
        if isinstance(dtype, T.StringType):
            df = df.withColumn(
                source.timestamp,
                F.to_timestamp(F.col(source.timestamp), source.timestamp_format),
            )
    return df


def load_labels_df(spark: SparkSession, labels: Labels) -> DataFrame:
    """Load the label spine."""
    if labels.df is not None:
        return _df_to_spark(spark, labels.df)
    if labels.path is not None:
        return read_parquet(spark, labels.path)
    raise TimefenceValidationError("Labels must have either path or df.")


def register_view(df: DataFrame, base: str) -> str:
    """Register a temp view with a sanitized name; returns the view name."""
    view = f"__tf_{safe_name(base)}"
    df.createOrReplaceTempView(view)
    return view
