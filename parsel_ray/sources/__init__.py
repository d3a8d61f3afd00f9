from .partitioned import write_partitioned_parquet

__all__ = ["write_partitioned_parquet"]
