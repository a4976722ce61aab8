from timefence_spark.operators import dedup, multimodal, sampling, similarity, text
from timefence_spark.operators.asof import asof_join, pit_match

__all__ = [
    "asof_join",
    "pit_match",
    "dedup",
    "sampling",
    "similarity",
    "text",
    "multimodal",
]
