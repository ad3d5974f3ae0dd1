"""Table sources/sinks: SparkSession factory, testdata loaders, and the
Iceberg-or-Parquet pluggable writer."""
