from timefence_spark.operators.asof import asof_join, pit_match

__all__ = ["asof_join", "pit_match"]
