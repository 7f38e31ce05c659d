"""Table IO: partitioned-parquet TableIO shim with an Iceberg-shaped API."""
