"""Sinks: layout-aware parquet writers for pipeline outputs."""

from .parquet import (  # noqa: F401
    joins_are_colocated,
    write_bucketed,
    write_partitioned,
)
