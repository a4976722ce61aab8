from timefence_spark.sources.readers import load_labels_df, load_source_df

__all__ = ["load_source_df", "load_labels_df"]
