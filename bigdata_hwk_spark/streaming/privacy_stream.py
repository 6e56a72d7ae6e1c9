"""Streaming k-anonymity monitor (the deployment form of
``operators/privacy.py k_anonymity_audit``).

A release pipeline wants the re-identification screen tracking the
table AS IT ACCUMULATES, not once at the end. Distinct-user counts are
NOT additive across micro-batches (the same user in two batches is one
person), so the state is the per-user cell table (event_type, day,
bucket, user_id, n_rows) — additive on n_rows by construction
(``qi_user_cells`` per batch, folded with a sum) — and the census runs
the batch audit's scoring leg verbatim (``census_from_user_cells``).
Bit-equal to the batch audit on the same rows regardless of chunking —
pinned by ``test_k_anonymity_monitor_stream_equals_batch``.

State size: active (cell, user) combinations — bounded by user-days ×
value alphabet, the same information bound the retention cohort tables
carry; at release scale this is the table a privacy review has to hold
SOMEWHERE anyway (it IS the census input). Driver traffic per batch:
none.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.privacy import (
    K_ANON,
    census_from_user_cells,
    qi_user_cells,
)


def run_k_anonymity_monitor_stream(
    spark: SparkSession,
    source_dir: str,
    k: int = K_ANON,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Replay ``source_dir``'s parquet files as micro-batches,
    accumulate the per-user QI-cell table additively, and return the
    k-anonymity census of the accumulated traffic."""
    from .cdc_stream import EVENTS_STREAM_SCHEMA

    cells_schema = (
        "event_type string, day bigint, bucket int, "
        "user_id bigint, n_rows bigint"
    )
    state = {"cells": spark.createDataFrame([], cells_schema)}

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        state["cells"] = (
            state["cells"]
            .union(qi_user_cells(batch_df))
            .groupBy("event_type", "day", "bucket", "user_id")
            .agg(F.sum("n_rows").cast("bigint").alias("n_rows"))
            .localCheckpoint()
        )

    stream = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    query = stream.writeStream.foreachBatch(process_batch).start()
    try:
        query.processAllAvailable()
    finally:
        query.stop()
    return census_from_user_cells(state["cells"], k=k)
