"""Storage layer: Hive-partitioned Parquet lake + hot staging buffer."""
