"""Sources: deterministic corpus synthesis + parquet readers."""
