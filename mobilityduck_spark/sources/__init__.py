"""Sources: parquet table loaders and temporal-assembly pipelines."""
