"""Source / sink surface of the engine (SURVEY §2.1 S1–S13)."""

from bigdataproject_spark.sources.readers import (
    load_table,
    load_tables,
    read_csv,
    read_danmaku_csv,
)
from bigdataproject_spark.sources.writers import write_csv, write_json, write_parquet

__all__ = [
    "load_table",
    "load_tables",
    "read_csv",
    "read_danmaku_csv",
    "write_csv",
    "write_json",
    "write_parquet",
]
