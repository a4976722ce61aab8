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

__all__ = [
    "asof_join",
    "pit_match",
    "dedup",
    "packing",
    "pii",
    "sampling",
    "similarity",
    "text",
    "multimodal",
    "web",
]
