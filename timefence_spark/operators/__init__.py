from timefence_spark.operators import dedup, multimodal, similarity, text
from timefence_spark.operators.asof import asof_join, pit_match

__all__ = ["asof_join", "pit_match", "dedup", "similarity", "text", "multimodal"]
