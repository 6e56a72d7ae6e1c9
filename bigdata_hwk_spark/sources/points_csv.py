"""CSV / text point-set sources (reference S1/S2 parity).

The reference ingests 2-D point sets as comma-separated text lines and
casts both fields to float (scan: reference HWK_1/G029HW1.py:142,
HWK_2/G029HW2.py:152; parse: HWK_1/G029HW1.py:145). Here that is a
schema-first CSV scan — Catalyst gets column pruning and (for the
standalone-parser form) codegen'd casts; no ``inferSchema`` pass over the
data (SURVEY.md §1.3).

``point_id`` assignment: the reference has no point identity (RDD rows are
anonymous), but deterministic top-K tie-breaking needs one (SURVEY.md
§2.6 T1). ``zipWithIndex`` order matches textFile's block order, so ids
are stable for a given file — documented as *file-order* ids, not value
semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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
    """Attach stable file-order ``point_id`` via ``zipWithIndex``.

    ``monotonically_increasing_id`` is partition-layout-dependent (ids
    change when the scan re-splits), so the RDD round-trip is the
    deterministic choice; it adds one pass but no shuffle. Only used for
    id-less external inputs — the fixture tables carry real keys.
    """
    schema = "point_id bigint, " + ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in points.schema.fields
    )
    indexed = points.rdd.zipWithIndex().map(lambda t: (t[1], *t[0]))
    return points.sparkSession.createDataFrame(indexed, schema)
