"""timefence_spark: a PySpark-native temporal-correctness engine.

Same query and data-processing capabilities as the reference
``gauthierpiarrette/timefence`` (point-in-time joins, leakage audit, explain,
diff, store/caching), built Spark-first: declarative DataFrame plans executed
by Catalyst/Tungsten, designed for 1000-executor / 100 TB scale, plus
large-scale training-data operators (dedup, similarity search, text analysis,
multimodal columns) the reference does not have.
"""

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
from timefence_spark.operators import dedup, multimodal, similarity, text
from timefence_spark.operators.asof import asof_join, pit_match
from timefence_spark.store import Store

__version__ = "0.1.0"

__all__ = [
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
    "get_spark",
    "multimodal",
    "pit_match",
    "similarity",
    "text",
]
