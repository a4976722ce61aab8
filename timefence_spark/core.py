"""Core data model: Source, Feature, Labels, FeatureSet.

Same public surface as the reference data model
(/root/reference/src/timefence/core.py:20-392), re-targeted at Spark:

* ``Source.df`` accepts a Spark DataFrame, a pandas DataFrame, or any
  Arrow-convertible object (``spark.createDataFrame`` handles conversion).
* ``SQLSource.query`` runs through ``spark.sql`` (Spark SQL dialect) after the
  engine registers the referenced inputs as temp views.
* ``Feature.transform`` receives ``(spark, source_df)`` and returns a
  DataFrame — the Spark equivalent of the reference's ``(conn, table)``
  callable (reference core.py:155-297, engine.py:691-695).
"""

from __future__ import annotations

import inspect
from collections.abc import Iterator, Sequence
from datetime import timedelta
from pathlib import Path
from typing import Any, Callable, Literal, Union

from timefence_spark._duration import parse_duration
from timefence_spark.errors import TimefenceConfigError, TimefenceValidationError


def _as_list(value: str | list[str]) -> list[str]:
    return [value] if isinstance(value, str) else list(value)


class Source:
    """A table of historical rows: entity keys + one timestamp + payload.

    Args:
        path: Path to the data (Parquet file/directory or CSV).
        keys: Entity key column name(s).
        timestamp: Temporal key column name.
        name: Human-readable name (defaults to filename stem).
        format: "parquet" or "csv"; auto-detected from the extension.
        delimiter: CSV delimiter.
        timestamp_format: strftime-style format for parsing string timestamps.
        df: In-memory DataFrame (Spark/pandas/Arrow) instead of a path.
    """

    def __init__(
        self,
        path: str | Path | None = None,
        *,
        keys: str | list[str],
        timestamp: str,
        name: str | None = None,
        format: str | None = None,
        delimiter: str = ",",
        timestamp_format: str | None = None,
        df: Any = None,
    ):
        if path is None and df is None:
            raise TimefenceValidationError("Source requires either 'path' or 'df'.")
        if path is not None and df is not None:
            raise TimefenceValidationError("Source accepts either 'path' or 'df', not both.")

        self.path = Path(path) if path is not None else None
        self.df = df
        self.keys = _as_list(keys)
        if not self.keys:
            raise TimefenceValidationError(
                "Source 'keys' cannot be empty. Provide at least one entity key column."
            )
        self.timestamp = timestamp
        self.name = name or (self.path.stem if self.path else "dataframe")
        self.delimiter = delimiter
        self.timestamp_format = timestamp_format

        if format is not None:
            self.format = format
        elif self.path is not None:
            ext = self.path.suffix.lower()
            if ext in (".parquet", ".pq") or ext == "":
                # Spark parquet outputs are directories (no extension);
                # default those to parquet.
                self.format = "parquet"
            elif ext == ".csv":
                self.format = "csv"
            else:
                raise TimefenceValidationError(
                    f"Cannot auto-detect format for '{self.path}'. "
                    "Specify format='parquet' or format='csv'."
                )
        else:
            self.format = "dataframe"

    def __repr__(self) -> str:
        src = str(self.path) if self.path else "DataFrame"
        return (
            f"Source(name='{self.name}', path='{src}', keys={self.keys}, "
            f"timestamp='{self.timestamp}')"
        )


class ParquetSource(Source):
    """Source fixed to format='parquet'."""

    def __init__(self, path: str | Path, **kwargs: Any):
        super().__init__(path=path, format="parquet", **kwargs)


class CSVSource(Source):
    """Source fixed to format='csv'."""

    def __init__(self, path: str | Path, **kwargs: Any):
        super().__init__(path=path, format="csv", **kwargs)


class SQLSource:
    """A source defined by a SQL query.

    Two execution modes, chosen by ``connection``:

    * ``connection=None`` (default): ``query`` is Spark SQL, executed with
      ``spark.sql`` — reference any registered temp views (see ``views``) or
      use path-based readers (``parquet.`path```). Fully distributed.
    * ``connection='/path/to.duckdb'``: ``query`` is DuckDB SQL, executed
      driver-side against the attached database file (same semantics as the
      reference, reference core.py:110-149). The result is staged to parquet
      once and scanned by Spark from there — cheap for the
      dimension-table-sized inputs this mode is for; use parquet/CSV sources
      for data that shouldn't pass through the driver.

    Args:
        query: SQL text (dialect per ``connection`` above).
        keys: Entity key column name(s).
        timestamp: Temporal key column name.
        name: Human-readable name (required; used for temp-view naming).
        views: Optional {view_name: path} parquet inputs registered before the
            query runs — as Spark temp views (connection=None) or DuckDB
            read_parquet views (connection set).
        connection: Optional path to a DuckDB database file.
    """

    def __init__(
        self,
        query: str,
        *,
        keys: str | list[str],
        timestamp: str,
        name: str,
        views: dict[str, str] | None = None,
        connection: str | None = None,
    ):
        self.query = query
        self.keys = _as_list(keys)
        self.timestamp = timestamp
        self.name = name
        self.views = views or {}
        self.connection = str(connection) if connection is not None else None
        self.path = None
        self.df = None
        self.format: Literal["sql"] = "sql"

    def __repr__(self) -> str:
        return f"SQLSource(name='{self.name}', keys={self.keys}, timestamp='{self.timestamp}')"


SourceType = Union[Source, SQLSource]


class Feature:
    """A named, versioned derived table keyed by (keys, feature_time).

    Exactly one of ``columns`` / ``sql`` / ``transform``:

    * columns — project (and optionally rename) payload columns; the source
      timestamp becomes ``feature_time``.
    * sql — Spark SQL with a ``{source}`` placeholder; must emit the source
      keys plus a ``feature_time`` column.
    * transform — ``(spark, source_df) -> DataFrame`` with the same contract.

    Args mirror the reference Feature (core.py:155-297): name, embargo
    (e.g. "1d"), key_mapping (label key -> source key), on_duplicate
    ("error" | "keep_any").
    """

    def __init__(
        self,
        source: SourceType,
        *,
        columns: str | list[str] | dict[str, str] | None = None,
        sql: str | Path | None = None,
        transform: Callable | None = None,
        name: str | None = None,
        embargo: str | timedelta | None = None,
        key_mapping: dict[str, str] | None = None,
        on_duplicate: str = "error",
    ):
        self.source = source

        provided = sum(x is not None for x in (columns, sql, transform))
        if provided != 1:
            raise TimefenceConfigError(
                "Feature requires exactly one of 'columns', 'sql', or 'transform'. "
                f"Got {provided} of them."
            )

        self._columns: dict[str, str] = {}
        self._sql_text: str | None = None
        self._sql_path: Path | None = None
        self._transform: Callable | None = None

        if columns is not None:
            self.mode: str = "columns"
            if isinstance(columns, str):
                self._columns = {columns: columns}
            elif isinstance(columns, list):
                self._columns = {c: c for c in columns}
            else:
                self._columns = dict(columns)
            if not self._columns:
                raise TimefenceConfigError(
                    "Feature 'columns' cannot be empty. Provide at least one column name."
                )
        elif sql is not None:
            self.mode = "sql"
            if isinstance(sql, Path):
                self._sql_path = sql
                self._sql_text = sql.read_text()
            else:
                self._sql_text = sql
        else:
            self.mode = "transform"
            self._transform = transform

        if name is not None:
            self.name = name
        elif self.mode == "columns":
            self.name = "_".join(self._columns.values())
        elif self.mode == "sql" and self._sql_path is not None:
            self.name = self._sql_path.stem
        elif self.mode == "transform":
            self.name = transform.__name__  # type: ignore[union-attr]
        else:
            raise TimefenceConfigError(
                "Feature 'name' is required when using inline SQL — a name cannot "
                "be auto-derived from a SQL string."
            )

        self.embargo = parse_duration(embargo) or timedelta(0)
        self.key_mapping = key_mapping or {}
        self.on_duplicate = on_duplicate
        if on_duplicate not in ("error", "keep_any"):
            raise TimefenceConfigError(
                f"on_duplicate must be 'error' or 'keep_any', got '{on_duplicate}'."
            )

    @property
    def output_columns(self) -> list[str]:
        """Output column names (columns mode only; other modes introspect)."""
        if self.mode == "columns":
            return list(self._columns.values())
        return []

    @property
    def source_keys(self) -> list[str]:
        """Key column names as they appear in the source."""
        return list(self.source.keys)

    @property
    def definition_hash_input(self) -> str:
        """Stable string identifying this feature definition for cache keys
        (same scheme as reference core.py:283-294, incl. transform source
        hashing via inspect.getsource)."""
        if self.mode == "columns":
            return f"columns:{sorted(self._columns.items())}:{self.source.name}:{self.key_mapping}"
        if self.mode == "sql":
            return f"sql:{self._sql_text}:{self.source.name}"
        try:
            src = inspect.getsource(self._transform)  # type: ignore[arg-type]
        except (OSError, TypeError):
            src = "<dynamic>"
        return f"transform:{src}:{self.source.name}"

    def __repr__(self) -> str:
        return f"Feature(name='{self.name}', source='{self.source.name}', mode='{self.mode}')"


class Labels:
    """The label spine: entity keys, label_time, target column(s)."""

    def __init__(
        self,
        *,
        path: str | Path | None = None,
        df: Any = None,
        keys: str | list[str],
        label_time: str,
        target: str | list[str],
    ):
        if path is None and df is None:
            raise TimefenceValidationError("Labels requires either 'path' or 'df'.")
        if path is not None and df is not None:
            raise TimefenceValidationError("Labels accepts either 'path' or 'df', not both.")
        self.path = Path(path) if path is not None else None
        self.df = df
        self.keys = _as_list(keys)
        if not self.keys:
            raise TimefenceValidationError(
                "Labels 'keys' cannot be empty. Provide at least one entity key column."
            )
        self.label_time = label_time
        self.target = _as_list(target)
        if not self.target:
            raise TimefenceValidationError(
                "Labels 'target' cannot be empty. Provide at least one target column."
            )

    def __repr__(self) -> str:
        src = str(self.path) if self.path else "DataFrame"
        return f"Labels(path='{src}', keys={self.keys}, label_time='{self.label_time}')"


class FeatureSet:
    """A flat, named list of Features. No nesting, no inheritance."""

    def __init__(self, name: str, features: Sequence[Feature]):
        self.name = name
        self.features = list(features)

    def __iter__(self) -> Iterator[Feature]:
        return iter(self.features)

    def __len__(self) -> int:
        return len(self.features)

    def __repr__(self) -> str:
        return f"FeatureSet(name='{self.name}', features={[f.name for f in self.features]})"


def flatten_features(features: Sequence[Feature | FeatureSet]) -> list[Feature]:
    """Flatten a mix of Features and FeatureSets into a list of Features."""
    out: list[Feature] = []
    for f in features:
        if isinstance(f, FeatureSet):
            out.extend(f.features)
        else:
            out.append(f)
    return out


def safe_name(name: str) -> str:
    """Sanitize to [A-Za-z0-9_] for internal aliases/view names
    (reference _sql_utils.py:26-31 semantics)."""
    return "".join(c if c.isalnum() or c == "_" else "_" for c in name) or "_unnamed"
