"""Greedy submodular coverage selection (diverse-subset picking).

Extension surface (no reference counterpart): the data-SELECTION leg of
the LLM pipeline — given a budget of k documents, pick the subset whose
union of n-gram shingles covers the most corpus vocabulary. Maximum
coverage is the canonical monotone-submodular objective; the greedy
algorithm is (1 − 1/e)-optimal (Nemhauser, Wolsey & Fisher 1978 —
public) and is how "diverse subset" selection is actually run
(facility-location / coverage variants of submodular data selection).

Scale shape per round: ONE anti-join of the persisted shingle index
against the covered set (keyed on the 8-byte shingle hash) + one
map-side-combined per-doc gain count + a TakeOrdered(1) — the argmax
travels to the driver as a SINGLE row per round (bounded driver
traffic, k rows total; the one legal driver-side accumulation). The
covered set grows by the winner's shingles only and is
``localCheckpoint``-ed per round. k is a fixed budget, so the loop is
k bounded rounds — at production scale the standard accelerations
(lazy-greedy priority queues, stochastic-greedy subsampling) drop in
without changing the contract; noted, not implemented.

Determinism: gains are exact integer counts; ties break by doc_id; the
greedy trace is therefore bit-identical under any layout — pinned by an
exact Python-mirror test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

COVERAGE_K = 10
COVERAGE_SHINGLE_W = 3


def greedy_coverage_select(
    documents: DataFrame,
    k: int = COVERAGE_K,
    w: int = COVERAGE_SHINGLE_W,
) -> DataFrame:
    """(rnk, doc_id, marginal_gain, covered_total): the greedy
    max-coverage trace — round i picks the document adding the most
    not-yet-covered distinct word-``w``-gram hashes (ties by doc_id);
    stops early when the best marginal gain hits 0."""
    from ..functions.hashing import md5_hash64
    from .dedup import doc_shingles

    spark = documents.sparkSession
    trace: list[tuple[int, int, int, int]] = []
    total = 0
    # The big shingle index is materialized ONCE and only ever SCANNED
    # after that: each round anti-joins it against the COVERED set —
    # which is at most k winner-docs' worth of hashes, so it broadcasts
    # and the index side never reshuffles or rewrites. (A "shrinking
    # remaining" variant that localCheckpoints the survivor table each
    # round rewrites the whole index k times — strictly worse I/O at
    # scale; at fixture scale both variants are dominated by the fixed
    # ~k·3 sequential-job scheduling cost of any exact greedy loop.)
    sh = (
        doc_shingles(documents, w=w)
        .select("doc_id", md5_hash64(F.col("sh")).alias("h"))
        .localCheckpoint()
    )
    covered = spark.createDataFrame([], "h bigint")
    for i in range(1, k + 1):
        uncovered = sh.join(F.broadcast(covered), "h", "left_anti")
        gain = (
            uncovered.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("g"))
            .orderBy(F.col("g").desc(), F.col("doc_id").asc())
            .limit(1)
            .collect()
        )
        if not gain or gain[0].g == 0:
            break
        doc, g = int(gain[0].doc_id), int(gain[0].g)
        total += g
        trace.append((i, doc, g, total))
        won = sh.filter(F.col("doc_id") == doc).select("h")
        covered = covered.union(won).distinct().localCheckpoint()
    return spark.createDataFrame(
        trace,
        "rnk int, doc_id bigint, marginal_gain bigint, covered_total bigint",
    )
