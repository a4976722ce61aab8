from timefence_spark.sources.readers import load_labels_df, load_source_df
from timefence_spark.sources.writers import file_key_ranges, write_clustered

__all__ = [
    "load_source_df",
    "load_labels_df",
    "write_clustered",
    "file_key_ranges",
]
