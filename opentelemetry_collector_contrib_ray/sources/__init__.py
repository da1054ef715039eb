"""Sources: deterministic synthetic tables + parquet readers."""
