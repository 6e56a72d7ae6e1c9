"""Deterministic dataset splits for training pipelines.

Not in the reference (SURVEY.md §2.11 north-star extensions): the two
split primitives a 100 TB corpus pipeline needs before any training run.

* **hash split** — train/valid/test by a salted content-stable hash of
  the document key. Unlike ``DataFrame.randomSplit`` (partition-order
  dependent, not reproducible across re-layouts), a hash split is a pure
  per-row projection: no shuffle, no RNG state, stable under
  repartitioning, appends land in consistent splits, and any engine can
  recompute it (the DuckDB oracle does exactly that).
* **leakage-safe split** — same, but hashing the *near-dup cluster id*
  instead of the doc id, so every member of a near-dup cluster lands in
  the same split. Splitting by raw doc id leaks: a train document's
  near-duplicate in the test set inflates eval. Composition:
  MinHash-LSH pairs → connected components (``dedup.connected_
  components``) → left join (docs not in any pair are their own
  cluster) → hash the cluster id. The join is the only shuffle and it
  is on the doc key.

Both emit (doc_id, split) so downstream writers can partition by split;
the registry queries aggregate to per-split counts to keep driver
transfers O(1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_hash64, md5_hash64_sql
from .dedup import JACCARD_TAU, connected_components, minhash_lsh_pairs

SPLIT_SALT = "split-v1"   # version the assignment; bump to reshuffle
TRAIN_PCT = 80
VALID_PCT = 10            # test gets the remainder


def _split_col(key: Column) -> Column:
    bucket = md5_hash64(F.concat(F.lit(SPLIT_SALT + ":"), key)) % 100
    return (
        F.when(bucket < TRAIN_PCT, "train")
        .when(bucket < TRAIN_PCT + VALID_PCT, "valid")
        .otherwise("test")
    )


def split_case_sql(key_expr: str) -> str:
    """DuckDB CASE expression assigning the identical split for a key."""
    salted = "'" + SPLIT_SALT + ":' || " + key_expr
    bucket = f"({md5_hash64_sql(salted)} % 100)"
    return (
        f"CASE WHEN {bucket} < {TRAIN_PCT} THEN 'train' "
        f"WHEN {bucket} < {TRAIN_PCT + VALID_PCT} THEN 'valid' "
        f"ELSE 'test' END"
    )


def hash_split(documents: DataFrame) -> DataFrame:
    """(doc_id, split): salted-hash assignment on the document key."""
    return documents.select(
        "doc_id", _split_col(F.col("doc_id").cast("string")).alias("split")
    )


def leakage_safe_split(
    documents: DataFrame,
    tau: float = JACCARD_TAU,
    comp: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, cluster_id, split): near-dup-cluster-keyed assignment.

    Docs in no near-dup pair are their own cluster (cluster_id = doc_id);
    every member of a cluster hashes identically, so no near-dup pair
    ever straddles a split boundary.

    ``comp`` (node, cluster_id) lets callers inject precomputed
    components — the registry shares one LSH pair/component pipeline
    across its three consumers instead of rebuilding it per query.
    """
    if comp is None:
        comp = connected_components(minhash_lsh_pairs(documents, tau=tau))
    comp = comp.select(F.col("node").alias("doc_id"), "cluster_id")
    return (
        documents.select("doc_id")
        .join(comp, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cluster_id", "doc_id").alias("cluster_id"),
        )
        .select(
            "doc_id",
            "cluster_id",
            _split_col(F.col("cluster_id").cast("string")).alias("split"),
        )
    )


def split_counts(split_df: DataFrame) -> DataFrame:
    """(split, n_docs) — the O(1)-row summary the registry exposes."""
    return split_df.groupBy("split").agg(F.count(F.lit(1)).alias("n_docs"))
