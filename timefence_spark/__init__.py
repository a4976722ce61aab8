"""timefence_spark: a PySpark-native temporal-correctness engine.

Same query and data-processing capabilities as the reference
``gauthierpiarrette/timefence`` (point-in-time joins, leakage audit, explain,
diff, store/caching), built Spark-first: declarative DataFrame plans executed
by Catalyst/Tungsten, designed for 1000-executor / 100 TB scale, plus
large-scale training-data operators (dedup, similarity search, text analysis,
multimodal columns) the reference does not have.
"""

from timefence_spark.corpus import Corpus
from timefence_spark.core import (
    CSVSource,
    Feature,
    FeatureSet,
    Labels,
    ParquetSource,
    Source,
    SQLSource,
)
from timefence_spark.engine import audit, build, diff, explain, get_spark
from timefence_spark.operators import (
    dedup,
    multimodal,
    packing,
    pii,
    sampling,
    similarity,
    text,
    web,
)
from timefence_spark.operators.asof import asof_join, pit_match
from timefence_spark.store import Store

__version__ = "0.1.0"


def from_dbt(manifest_path: str = "target/manifest.json", **kwargs) -> list[Feature]:
    """Import feature definitions from a dbt project.

    API-surface parity with the reference (reference __init__.py:17-37),
    which also ships this as a stub: it raises until a dbt adapter exists,
    so callers get a clear error instead of an AttributeError.

    Raises:
        NotImplementedError: Always, until the dbt integration is shipped.
    """
    raise NotImplementedError(
        "dbt integration is not yet available for timefence-spark. "
        "Define features in a features.py module instead."
    )

__all__ = [
    "Corpus",
    "CSVSource",
    "Feature",
    "FeatureSet",
    "Labels",
    "ParquetSource",
    "SQLSource",
    "Source",
    "Store",
    "__version__",
    "asof_join",
    "audit",
    "build",
    "dedup",
    "diff",
    "explain",
    "from_dbt",
    "get_spark",
    "multimodal",
    "packing",
    "pii",
    "pit_match",
    "sampling",
    "similarity",
    "text",
    "web",
]
