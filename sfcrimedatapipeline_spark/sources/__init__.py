"""Sources & sinks: schema-applied CSV ingest, parquet tables, exports."""

from sfcrimedatapipeline_spark.sources.csv import read_dim_csv, read_staging_csv
from sfcrimedatapipeline_spark.sources.tables import (
    TPCH_TABLES,
    read_table,
    register_views,
    write_table,
)

__all__ = [
    "read_staging_csv",
    "read_dim_csv",
    "read_table",
    "register_views",
    "write_table",
    "TPCH_TABLES",
]
