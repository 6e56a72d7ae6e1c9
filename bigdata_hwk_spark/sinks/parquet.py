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


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (and optionally sort-clustered) parquet
    table in the session catalog.

    This is the 100 TB co-located-join layout: two tables bucketed on the
    same key with the same bucket count join WITHOUT a shuffle — each
    task zips bucket i with bucket i, so a petabyte fact/fact join moves
    zero rows over the network (``joins_are_colocated`` asserts the
    no-Exchange plan). The same layout makes ``groupBy(bucket_cols)``
    shuffle-free. Bucketing requires the catalog (``saveAsTable``) —
    bucket metadata lives in the table definition, not the files — which
    is exactly how a production deployment persists its hot join keys.

    ``sortWithinPartitions`` on the bucket key additionally enables
    sort-merge joins to skip their sort phase (``sortBy``) and gives
    parquet zone-map row-group skipping on the sort columns.
    """
    writer = (
        df.repartition(n_buckets, *[df[c] for c in bucket_cols])
        .write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def joins_are_colocated(spark: SparkSession, left: str, right: str, on: list[str]) -> bool:
    """True when joining catalog tables ``left`` and ``right`` on ``on``
    plans NO shuffle (both sides read pre-bucketed on the join key).

    Auto-broadcast is disabled for the probe: at fixture sizes the planner
    prefers broadcasting the small side (printing "Bucketed: false
    (disabled by query planner)"), which hides the property under test —
    the 100 TB case is two sides too big to broadcast, where the bucketed
    layout is what removes the shuffle."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = (
            spark.table(left)
            .join(spark.table(right), on)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    return "Exchange hashpartitioning" not in plan
