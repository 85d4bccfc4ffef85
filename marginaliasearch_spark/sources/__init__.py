"""Table IO (versioned parquet catalog, Iceberg-ready) and deterministic
transcript corpus generators."""
