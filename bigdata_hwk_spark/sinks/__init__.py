"""Sinks: layout-aware parquet writers for pipeline outputs."""

from .parquet import write_partitioned  # noqa: F401
