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


def compaction_plan(
    spark: SparkSession,
    path: str,
    partition_cols: list[str],
    target_rows_per_file: int,
) -> DataFrame:
    """Per-partition small-file report for a hive-partitioned dataset:
    (partition values…, n_files, n_rows, target_files, needs_compaction).

    Long-lived datasets accrete small files (streaming micro-batches,
    incremental appends, skewed writes); at 100 TB the cost is real —
    every file is a task, a footer fetch, and an open/close. The plan is
    computed distributed from the hidden ``_metadata.file_path`` column
    (one pruned scan, no driver directory walk), so it works the same on
    an object store with millions of files. ``target_files`` =
    ceil(n_rows / target_rows_per_file); a partition needs compaction
    when it holds more files than that.
    """
    from pyspark.sql import functions as F

    df = spark.read.parquet(path)
    per_file = df.groupBy(
        *partition_cols, F.col("_metadata.file_path").alias("__file")
    ).agg(F.count(F.lit(1)).alias("__rows"))
    target = F.ceil(F.col("n_rows") / target_rows_per_file).cast("int")
    return (
        per_file.groupBy(*partition_cols)
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("__rows").alias("n_rows"),
        )
        .withColumn("target_files", target)
        .withColumn("needs_compaction", F.col("n_files") > F.col("target_files"))
    )


def compact_partitioned(
    spark: SparkSession,
    path: str,
    partition_cols: list[str],
    target_rows_per_file: int,
    sort_cols: list[str] | None = None,
) -> int:
    """Rewrite ONLY the partitions of ``path`` that hold more files than
    their row count warrants; returns how many partitions were rewritten.

    Partition-selective maintenance is the point: a 100 TB table with a
    handful of fragmented partitions (yesterday's streaming append) must
    not be rewritten whole. The fragmented partitions are identified by
    ``compaction_plan``, read back with a partition-pruning filter (only
    their directories are scanned), co-located with one shuffle per
    partition value, and written COMPLETELY to a temp sibling directory
    before any source file is touched — the rewrite never reads and
    clears the same files in one job (an earlier cache()-based variant
    could recompute evicted blocks from source files mid-overwrite).
    Each rewritten partition directory is then swapped into place via
    the Hadoop ``FileSystem`` API (delete old + rename new), so
    untouched partitions' files are never replaced.

    Crash window, documented honestly: the per-partition swap is not one
    atomic operation, but it is ordered rename-old-ASIDE → rename-new-IN
    → delete-aside (round-8 ADVICE): the live partition is never deleted
    before its replacement is ready to rename in, so the missing-window
    is two metadata renames, not an O(files) delete. A crash mid-swap
    leaves the old data intact under ``<partition>__compact_old`` (and
    the full rewrite under the temp sibling, removed only after ALL
    swaps succeed) — re-running compaction, or renaming the aside dir
    back, repairs it. On object stores "rename" is copy+delete, so the
    window widens with partition size there; that is still strictly
    narrower than the previous dynamic partition-overwrite commit, whose
    clear-then-move window spanned every rewritten partition at once.

    Uses the JVM Hadoop ``FileSystem`` gateway, which Spark Connect does
    not expose — the call fails fast with a clear error there rather
    than an opaque AttributeError.
    """
    from functools import reduce

    from pyspark.sql import functions as F

    plan_rows = (
        compaction_plan(spark, path, partition_cols, target_rows_per_file)
        .filter("needs_compaction")
        .collect()
    )
    if not plan_rows:
        return 0
    # partition-pruning disjunction over the fragmented partition values
    pred = reduce(
        lambda a, b: a | b,
        [
            reduce(
                lambda a, c: a & (F.col(c) == r[c]),
                partition_cols[1:],
                F.col(partition_cols[0]) == r[partition_cols[0]],
            )
            for r in plan_rows
        ],
    )
    frag = spark.read.parquet(path).filter(pred)
    out = frag.repartition(*[F.col(c) for c in partition_cols])
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)

    jvm = getattr(spark, "_jvm", None)
    jsc = getattr(spark, "_jsc", None)
    if jvm is None or jsc is None:
        raise NotImplementedError(
            "compact_partitions needs the JVM Hadoop FileSystem gateway "
            "(spark._jvm), which Spark Connect sessions do not expose — "
            "run it from a classic driver, or rewrite the fragmented "
            "partitions with a dynamic-partition-overwrite write instead"
        )
    hconf = jsc.hadoopConfiguration()
    HPath = jvm.org.apache.hadoop.fs.Path
    root = HPath(path)
    fs = root.getFileSystem(hconf)
    qualified_root = fs.makeQualified(root)
    tmp = HPath(qualified_root.toString() + "__compact_tmp")
    fs.delete(tmp, True)
    (
        out.write.mode("overwrite")
        .option("maxRecordsPerFile", target_rows_per_file)
        .partitionBy(*partition_cols)
        .parquet(tmp.toString())
    )

    # the temp dir holds exactly the fragmented partitions; mirror its
    # leaf partition directories (depth = len(partition_cols)) onto the
    # root so hive value encoding is taken from what Spark wrote, not
    # re-derived. On exception the temp dir survives for manual repair.
    def leaves(p, depth):
        if depth == 0:
            return [p]
        found = []
        for st in fs.listStatus(p):
            if st.isDirectory():
                found.extend(leaves(st.getPath(), depth - 1))
        return found

    tmp_str = fs.makeQualified(tmp).toString()
    for leaf in leaves(tmp, len(partition_cols)):
        rel = fs.makeQualified(leaf).toString()[len(tmp_str) :].lstrip("/")
        target = HPath(qualified_root, rel)
        # rename-old-aside → rename-new-in → delete-aside: the live
        # partition is never deleted before its replacement is in place,
        # and a crash leaves the old data recoverable under __compact_old
        aside = HPath(qualified_root, rel + "__compact_old")
        fs.delete(aside, True)
        had_old = fs.exists(target)
        if had_old and not fs.rename(target, aside):
            raise IOError(f"compaction aside-rename failed for {rel}")
        if not fs.rename(leaf, target):
            # restore the original before failing — no missing partition
            if had_old:
                fs.rename(aside, target)
            raise IOError(f"compaction swap failed for partition {rel}")
        if had_old:
            fs.delete(aside, True)
    fs.delete(tmp, True)
    return len(plan_rows)


def zorder_key(col_x, col_y, stats: dict, bits: int = 12):
    """Codegen Z-order (Morton) key: both columns scaled to ``bits``-bit
    integers by the provided min/max ``stats`` (keys: x_min, x_max,
    y_min, y_max), bits interleaved x-even / y-odd. Pure expression —
    whole-stage codegen, no UDF."""
    from pyspark.sql import functions as F

    span = (1 << bits) - 1

    def scaled(c, lo, hi):
        rng = (hi - lo) or 1
        v = F.floor((c.cast("double") - lo) / rng * span).cast("bigint")
        return F.least(F.lit(span), F.greatest(F.lit(0), v))

    sx = scaled(col_x, stats["x_min"], stats["x_max"])
    sy = scaled(col_y, stats["y_min"], stats["y_max"])
    z = F.lit(0).cast("bigint")
    for b in range(bits):
        z = (
            z
            + (F.shiftright(sx, b) % 2) * F.lit(1 << (2 * b))
            + (F.shiftright(sy, b) % 2) * F.lit(1 << (2 * b + 1))
        )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    col_x: str,
    col_y: str,
    n_files: int = 16,
    bits: int = 12,
) -> None:
    """Write ``df`` as parquet clustered on the Z-order (Morton) curve of
    two columns — the lakehouse multi-dimension layout (Delta's OPTIMIZE
    ZORDER): rows close in EITHER dimension land in the same few files,
    so range predicates on either column touch a small file subset and
    parquet row-group min/max stats skip within them. A single-column
    sort gives perfect pruning on one dimension and none on the other;
    the space-filling curve trades a little of each for both.

    One small agg job reads the two columns' min/max (the key must be
    scaled before interleaving); the key itself is pure codegen
    (``zorder_key``), the layout one range repartition + in-partition
    sort. The key column is dropped before writing — the layout, not the
    schema, carries the clustering.
    """
    from pyspark.sql import functions as F

    s = df.agg(
        F.min(col_x).alias("x_min"),
        F.max(col_x).alias("x_max"),
        F.min(col_y).alias("y_min"),
        F.max(col_y).alias("y_max"),
    ).collect()[0]
    stats = {k: float(s[k]) for k in ("x_min", "x_max", "y_min", "y_max")}
    z = zorder_key(F.col(col_x), F.col(col_y), stats, bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
