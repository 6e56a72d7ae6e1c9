"""Streaming deployment of the mixture resampler (operators/splits.py).

Not in the reference (SURVEY.md §2.11 north-star extensions): a
production mixing pipeline doesn't rescan the corpus per batch — it
FREEZES the per-source keep rates from a reference corpus window
(``mixture_rates``) and applies them to the ingest stream as a pure
per-row predicate. Freezing matters twice over:

* **chunking-independence** — rates re-derived per micro-batch would
  make a document's fate depend on which batch it arrived in; frozen
  rates + the salted-hash Bernoulli make the decision a function of
  (salt, doc_id, r_ppm) alone, so ANY chunking of the same corpus keeps
  exactly the same rows (pinned by the streaming ≡ batch test);
* **O(batch) work** — each micro-batch does one broadcast join against
  the O(sources) rate table, one codegen'd predicate, and one map-side-
  combined aggregate to O(sources) counter rows. The driver folds those
  counters into a running per-source tally — bounded metadata, the same
  legal driver-side accumulation as the running-checksum stream — and
  never sees a document row. (In production the kept rows would also
  stream to a sink; the counters are the monitoring surface.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.splits import _token_projection, mixture_keep

DOCS_STREAM_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)


def run_mixture_resample_stream(
    spark: SparkSession,
    source_dir: str,
    rates: DataFrame,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Replay the parquet files of ``source_dir`` (one micro-batch per
    file, file order) through the frozen-rate resampler; returns the
    final (source, n_docs, n_kept, kept_tokens) tally as a DataFrame.

    ``rates`` is a (source, r_ppm) table — typically
    ``mixture_rates(reference_corpus)``; sources absent from it are
    dropped entirely (rate 0), the conservative choice for a source that
    appeared after the reference window was frozen.
    """
    rate_tbl = rates.select("source", "r_ppm")
    totals: dict[str, list[int]] = {}

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        keep = mixture_keep()
        counters = (
            _token_projection(batch_df)
            .join(F.broadcast(rate_tbl), "source")
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum(F.when(keep, 1).otherwise(0))
                .cast("bigint")
                .alias("n_kept"),
                F.sum(F.when(keep, F.col("toks")).otherwise(0))
                .cast("bigint")
                .alias("kept_tokens"),
            )
        )
        for r in counters.collect():  # O(sources) rows — bounded metadata
            t = totals.setdefault(r["source"], [0, 0, 0])
            t[0] += r["n_docs"]
            t[1] += r["n_kept"]
            t[2] += r["kept_tokens"]

    stream = (
        spark.readStream.schema(DOCS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    query = stream.writeStream.foreachBatch(process_batch).start()
    try:
        query.processAllAvailable()
    finally:
        query.stop()
    return spark.createDataFrame(
        [(s, *v) for s, v in sorted(totals.items())],
        "source string, n_docs bigint, n_kept bigint, kept_tokens bigint",
    )


def chunk_documents_into_files(
    documents: DataFrame, out_dir: str, n_chunks: int = 4
) -> int:
    """Test/replay helper (same shape as ``chunk_events_by_day``): write
    the corpus as ``n_chunks`` FLAT parquet files — one per doc_id
    residue class, ascending mtimes so the file source replays them as
    separate micro-batches. The tally is order-independent; the mtimes
    only make the batch count deterministic. Returns the chunk count."""
    import os
    import shutil
    import time

    staging = os.path.join(out_dir, "_staging")
    os.makedirs(out_dir, exist_ok=True)
    base = time.time() - 3600
    for i in range(n_chunks):
        documents.filter(
            F.pmod(F.col("doc_id"), F.lit(n_chunks)) == i
        ).coalesce(1).write.mode("overwrite").parquet(staging)
        part = next(f for f in os.listdir(staging) if f.endswith(".parquet"))
        dst = os.path.join(out_dir, f"{i:04d}.parquet")
        shutil.move(os.path.join(staging, part), dst)
        os.utime(dst, (base + i, base + i))
    shutil.rmtree(staging, ignore_errors=True)
    return n_chunks
