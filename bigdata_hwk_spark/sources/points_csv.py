"""CSV / text point-set sources (reference S1/S2 parity).

The reference ingests 2-D point sets as comma-separated text lines and
casts both fields to float (scan: reference HWK_1/G029HW1.py:142,
HWK_2/G029HW2.py:152; parse: HWK_1/G029HW1.py:145). Here that is a
schema-first CSV scan — Catalyst gets column pruning and (for the
standalone-parser form) codegen'd casts; no ``inferSchema`` pass over the
data (SURVEY.md §1.3).

``point_id`` assignment: the reference has no point identity (RDD rows are
anonymous), but deterministic top-K tie-breaking needs one (SURVEY.md
§2.6 T1). Ids are *file-order* (stable for a given file + split settings),
assigned fully JVM-side — see ``with_point_ids``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import local_df

POINTS_SCHEMA = "x double, y double"


def read_points_csv(spark: SparkSession, path: str) -> DataFrame:
    """Schema-first CSV scan → (point_id, x, y).

    Subsumes the reference's textFile+split+cast pipeline in one
    declarative scan (reference HWK_1/G029HW1.py:142-145). Malformed lines
    fail fast (FAILFAST) — the reference would raise on ``float(...)`` the
    same way.
    """
    df = (
        spark.read.schema(POINTS_SCHEMA)
        .option("mode", "FAILFAST")
        .option("ignoreLeadingWhiteSpace", "true")
        .option("ignoreTrailingWhiteSpace", "true")
        .csv(path)
    )
    return with_point_ids(df)


def parse_points_text(lines: DataFrame, value_col: str = "value") -> DataFrame:
    """Standalone parser form (reference S2): split on ',', trim, cast.

    For inputs that arrive as raw lines (e.g. the socket/text streaming
    sources) rather than through the CSV reader. Pure ``F.*`` expressions —
    whole-stage codegen, no Python.
    """
    parts = F.split(F.col(value_col), ",")
    return lines.select(
        F.trim(F.element_at(parts, 1)).cast("double").alias("x"),
        F.trim(F.element_at(parts, 2)).cast("double").alias("y"),
    )


def with_point_ids(points: DataFrame) -> DataFrame:
    """Attach stable file-order ``point_id``, fully JVM-side.

    ``monotonically_increasing_id()`` encodes
    ``(partition_id << 33) | row_in_partition`` (documented layout); the
    low bits are file-order within each split and splits are numbered in
    byte order, so dense global ids are
    ``partition_start_offset + (mid & ((1<<33)-1))``. One light counting
    job gives per-partition row counts, the driver folds them into start
    offsets (L tiny rows), and a broadcast join + integer arithmetic does
    the rest — no shuffle of the data and no Python row round-trip (the
    previous ``rdd.zipWithIndex`` pickled every row in both directions —
    the row-at-a-time anti-pattern on a large CSV ingest). Ids are stable
    for a given (file, split settings): file-order semantics, not value
    semantics. Only used for id-less external inputs — fixture tables
    carry real keys.
    """
    row_mask = (1 << 33) - 1
    df = points.withColumn("__mid", F.monotonically_increasing_id()).withColumn(
        "__pid", F.spark_partition_id()
    )
    counts = df.groupBy("__pid").agg(F.count(F.lit(1)).alias("__cnt")).collect()
    acc = 0
    offsets = []
    for r in sorted(counts, key=lambda r: r["__pid"]):
        offsets.append((r["__pid"], acc))
        acc += r["__cnt"]
    spark = points.sparkSession
    off_df = local_df(spark, offsets, "__pid int, __off bigint")
    return (
        df.join(F.broadcast(off_df), "__pid")
        .withColumn("point_id", F.col("__off") + F.col("__mid").bitwiseAND(row_mask))
        .select("point_id", *points.columns)
    )
