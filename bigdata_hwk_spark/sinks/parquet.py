"""Partitioned parquet sink.

The reference's only sinks are the console report and ``foreachBatch``
(SURVEY.md §2.1 S4/S5); a corpus pipeline also needs a *layout-aware*
batch sink: hive-partitioned parquet whose directory structure gives
downstream readers partition pruning for free.

Scale rationale:

* ``repartition(partition_cols)`` before ``partitionBy``: without it,
  every upstream task holding rows for P partition values writes its own
  file into each of the P directories — tasks × P small files, the
  classic small-files failure. One shuffle co-locates each partition
  value into one task → one (or few) well-sized files per directory.
  AQE coalesces small shuffle partitions so low-volume partition values
  share a task without changing the layout.
* ``sortWithinPartitions``: clusters the file by the given columns so
  parquet row-group min/max statistics become an effective zone map —
  readers filtering on the sort key skip whole row groups.
* ``maxRecordsPerFile`` caps file size where one partition value is
  huge (skewed partition columns), keeping files splittable units.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    sort_cols: list[str] | None = None,
    max_records_per_file: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as hive-partitioned parquet at ``path``."""
    out = df.repartition(*[df[c] for c in partition_cols])
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    writer = out.write.mode(mode)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.partitionBy(*partition_cols).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned dataset back (partition columns re-inferred)."""
    return spark.read.parquet(path)
