"""Streaming sources (reference S3 parity + test-friendly file replay).

The reference ingests its item stream from a TCP socket via DStreams
(``ssc.socketTextStream`` — reference HWK_3/G029HW3.py:99,103). The
Structured Streaming equivalents here produce an untyped line stream that
is cast to the engine's ``item: long`` shape declaratively, so every
downstream operator (exact histogram, sketches, windowed aggregations)
works identically over a socket, a replayed file directory, or the rate
source — the DataFrame is the interface, the source is a config detail.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def socket_item_stream(spark: SparkSession, host: str, port: int) -> DataFrame:
    """Socket text stream → (item: long), one int per line.

    Mirrors the reference's source contract (one integer per line,
    reference HWK_3/G029HW3.py:44-46,103). The socket source is
    single-receiver and non-replayable — fine for the driver-state sketch
    path, which is sequential by design (SURVEY.md §4.3.3); the scalable
    declarative paths should replay from files/Kafka instead.
    """
    return (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
        .select(F.col("value").cast("long").alias("item"))
    )


def file_item_stream(
    spark: SparkSession, source_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """Deterministic micro-batch replay: each parquet file in ``source_dir``
    is one (seq, item) micro-batch, delivered in file order."""
    return (
        spark.readStream.schema("seq bigint, item bigint")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
