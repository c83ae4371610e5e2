from beacon_spark.sources.tabular import (
    read_arrow,
    read_arrow_schema,
    read_csv,
    read_csv_schema,
    read_parquet,
    read_parquet_schema,
)

__all__ = [
    "read_parquet",
    "read_parquet_schema",
    "read_csv",
    "read_csv_schema",
    "read_arrow",
    "read_arrow_schema",
]
