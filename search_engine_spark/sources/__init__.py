"""Sources / sinks: table loading, derived web-page columns, parquet catalog."""
