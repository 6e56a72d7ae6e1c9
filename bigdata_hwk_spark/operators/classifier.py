"""Distributed linear document classifier (the quality-filter shape).

Not in the reference (SURVEY.md §2.11 north-star extensions): the
CCNet / LLaMA-pipeline quality filter is a linear model over hashed
bag-of-words features (fastText's model class) trained on a
reference-vs-crawl signal, then swept over the corpus to score every
document. This module is that trainer/scorer re-expressed Spark-first
as a CLOSED-FORM ridge fit — the same one-scan integer-Gram shape as
``pca_fit`` (operators/pca.py), applied to sparse hashed text features:

* **features** — the hashing trick: word → md5 bucket (``CLF_DIM``
  buckets), per-doc counts from one explode + groupBy (codegen; the
  corpus text is touched once, after that everything moves integer
  triples).
* **fit** — w = (XᵀX + λI)⁻¹ Xᵀy with X the count matrix augmented by a
  bias column. XᵀX and Xᵀy are EXACT INTEGER aggregates: the feature
  triples self-join on doc_id (per-doc pair fan-out bounded by the
  hashed dimension, never by vocabulary), map-side-combined into ≤
  (dim+1)² cells; the (dim+1)×(dim+1) solve runs on the driver. No
  learning rate, no iterations, no initialization — gradient descent on
  this objective was measured hyperparameter-fragile (oscillating
  bias/feature scales) where the normal equations are parameter-free.
* **bit-determinism** — Gram/moment cells are exact integers under any
  partitioning, so the driver solve sees identical inputs always; the
  pure-NumPy twin (``ridge_fit_ref``) reproduces the weights
  bit-for-bit (tested). Scoring re-quantizes w to integer micro-units
  (``CLF_SCALE``) so per-doc scores are exact integer dot products
  scaled once — layout-invariant.

At 100 TB: one codegen pass builds triples, one self-join pass builds
the Gram (shuffle volume ≤ corpus pair fan-out, combiner-reduced to ≤
(dim+1)² cells per partition), (dim+1)² tiny rows reach the driver
once. Training twice on the same corpus gives the same model — no RNG,
no state. The dim axis is MEASURED (SCALE_STRESS.json "clf_dim_axis"):
per-doc pair fan-out is min(distinct words, dim)² — bounded by the doc,
not by dim — so distributed cost is flat in dim; the knee at dim ≈ 4k
is the O(dim³) driver solve, the documented boundary where the method
of choice becomes SGD rather than normal equations.
"""

from __future__ import annotations

import numpy as np
from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..session import local_df

from ..functions.hashing import md5_hash64

CLF_DIM = 256           # hashed feature buckets
CLF_LAMBDA = 10.0       # ridge regularizer
CLF_SCALE = 1_000_000   # integer micro-units for scoring weights


def hashed_features(documents: DataFrame, dim: int = CLF_DIM) -> DataFrame:
    """(doc_id, bucket, cnt) — hashed bag-of-words counts; one explode +
    one groupBy, the only pass that ever touches text."""
    words = documents.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("w")
    )
    bucket = (md5_hash64(F.concat(F.lit("clf:"), F.col("w"))) % dim).cast(
        "int"
    )
    return (
        words.select("doc_id", bucket.alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _moments(
    documents: DataFrame, label: Column, dim: int
) -> tuple[np.ndarray, np.ndarray, int]:
    """Exact integer (XᵀX, Xᵀy, n) for the bias-augmented count matrix.

    The Gram comes from a per-doc self-join of the feature triples (only
    buckets that co-occur in a document ever meet — the sparse-Gram
    identity), map-side combined to ≤ (dim+1)² cells; bias row/column
    and Xᵀy are two more single-pass aggregates over the same persisted
    triples. Everything that crosses the wire is an exact integer."""
    feats = hashed_features(documents, dim).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    labels = documents.select("doc_id", label.cast("bigint").alias("y"))
    a, b = feats.alias("a"), feats.alias("b")
    gram_rows = (
        a.join(b, "doc_id")
        .groupBy(
            F.col("a.bucket").alias("i"), F.col("b.bucket").alias("j")
        )
        .agg(F.sum(F.col("a.cnt") * F.col("b.cnt")).alias("v"))
        .collect()
    )
    # bias row/column (Σ x_j) and Xᵀy share one labeled pass
    col_rows = (
        feats.join(labels, "doc_id")
        .groupBy("bucket")
        .agg(
            F.sum("cnt").alias("s"),
            F.sum(F.col("cnt") * F.col("y")).alias("v"),
        )
        .collect()
    )
    n_y = labels.agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("sy")
    ).collect()[0]
    feats.unpersist()

    d1 = dim + 1
    G = np.zeros((d1, d1), dtype=np.int64)
    c = np.zeros(d1, dtype=np.int64)
    for r in gram_rows:
        G[r["i"], r["j"]] = r["v"]
    for r in col_rows:  # bias interactions Σ_docs x_j + the moment Σ x_j·y
        G[dim, r["bucket"]] = r["s"]
        G[r["bucket"], dim] = r["s"]
        c[r["bucket"]] = r["v"]
    G[dim, dim] = n_y["n"]
    c[dim] = n_y["sy"] or 0
    return G, c, int(n_y["n"])


def ridge_fit(
    documents: DataFrame,
    label: Column,
    dim: int = CLF_DIM,
    lam: float = CLF_LAMBDA,
) -> np.ndarray:
    """Fit the ridge classifier; returns float64 weights[dim+1] (last
    entry = bias). ``label`` — a 0/1 Column over ``documents``. The
    moment matrices are exact integers under any layout, so the model is
    reproducible bit-for-bit (pinned against ``ridge_fit_ref``)."""
    G, c, n = _moments(documents, label, dim)
    if n == 0:
        return np.zeros(dim + 1)
    return ridge_solve(G, c, lam)


def ridge_fit_ref(
    counts: np.ndarray, y: np.ndarray, lam: float = CLF_LAMBDA
) -> np.ndarray:
    """Pure-NumPy twin over a dense (n, dim) count matrix: identical
    integer moments, identical solve — the distributed fit must match it
    bit-for-bit."""
    n, dim = counts.shape
    Xa = np.hstack([counts.astype(np.int64), np.ones((n, 1), dtype=np.int64)])
    G = Xa.T @ Xa
    c = Xa.T @ y.astype(np.int64)
    return np.linalg.solve(
        G.astype(np.float64) + lam * np.eye(dim + 1), c.astype(np.float64)
    )


def ridge_score(
    documents: DataFrame, w: np.ndarray, dim: int = CLF_DIM
) -> DataFrame:
    """(doc_id, score, pred) — per-document score x·w + bias under the
    trained weights, computed as ONE exact integer dot product per doc
    (weights quantized to ``CLF_SCALE`` micro-units, one broadcast join +
    one per-doc fold) scaled once; pred = score ≥ 0.5 (y was 0/1)."""
    spark = documents.sparkSession
    wq = [
        (int(j), int(np.floor(w[j] * CLF_SCALE + 0.5))) for j in range(dim)
    ]
    wq_df = local_df(spark, wq, "bucket int, wq bigint")
    bias = float(np.floor(w[dim] * CLF_SCALE + 0.5)) / CLF_SCALE
    margins = (
        hashed_features(documents, dim)
        .join(F.broadcast(wq_df), "bucket")
        .groupBy("doc_id")
        .agg(F.sum(F.col("cnt") * F.col("wq")).alias("mq"))
    )
    score = (
        F.coalesce(F.col("mq"), F.lit(0)).cast("double")
        / F.lit(float(CLF_SCALE))
        + F.lit(bias)
    )
    return (
        documents.select("doc_id")
        .join(margins, "doc_id", "left")
        .select(
            "doc_id",
            score.alias("score"),
            (score >= 0.5).cast("int").alias("pred"),
        )
    )


def classifier_eval(
    documents: DataFrame,
    label: Column,
    dim: int = CLF_DIM,
    lam: float = CLF_LAMBDA,
) -> DataFrame:
    """One row: (n_docs, n_pos, tp, fp, fn, tn, accuracy) — fit the ridge
    classifier on ``label`` and report its confusion counts over the same
    corpus (the fixture-sized demonstration of the quality-filter loop; a
    production run fits on a labeled sample and sweeps the rest with
    ``ridge_score``, which takes any corpus)."""
    w = ridge_fit(documents, label, dim, lam)
    scored = ridge_score(documents, w, dim).join(
        documents.select("doc_id", label.cast("int").alias("y")), "doc_id"
    )
    p, y = F.col("pred"), F.col("y")
    return scored.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(y).cast("bigint").alias("n_pos"),
        F.sum(((p == 1) & (y == 1)).cast("int")).cast("bigint").alias("tp"),
        F.sum(((p == 1) & (y == 0)).cast("int")).cast("bigint").alias("fp"),
        F.sum(((p == 0) & (y == 1)).cast("int")).cast("bigint").alias("fn"),
        F.sum(((p == 0) & (y == 0)).cast("int")).cast("bigint").alias("tn"),
    ).select(
        "n_docs",
        "n_pos",
        "tp",
        "fp",
        "fn",
        "tn",
        ((F.col("tp") + F.col("tn")) / F.col("n_docs")).alias("accuracy"),
    )


def ridge_moments(
    documents: DataFrame, label: Column, dim: int = CLF_DIM
) -> tuple[np.ndarray, np.ndarray, int]:
    """Public handle on the exact-integer moment statistics (XᵀX, Xᵀy, n)
    — the model's sufficient statistics. Because every cell is an exact
    integer, moments are ADDITIVE across corpus slices: fit-on-union ≡
    solve over the cell-wise sum of per-slice moments, bit for bit. That
    is the incremental-maintenance contract (the checksum-delta /
    incremental-ingest discipline applied to model fitting): keep (G, c,
    n) per shard or per ingest batch, add the new batch's moments, and
    re-solve — the corpus is never rescanned."""
    return _moments(documents, label, dim)


def ridge_solve(
    G: np.ndarray, c: np.ndarray, lam: float = CLF_LAMBDA
) -> np.ndarray:
    """Solve the ridge normal equations for accumulated moments — the
    driver-side half of incremental refit."""
    d1 = G.shape[0]
    return np.linalg.solve(
        G.astype(np.float64) + lam * np.eye(d1), c.astype(np.float64)
    )


def classifier_holdout_eval(
    documents: DataFrame,
    label: Column,
    dim: int = CLF_DIM,
    lam: float = CLF_LAMBDA,
) -> DataFrame:
    """One row: (n_train, n_test, test_pos, tp, fp, fn, tn, accuracy) —
    the leakage-safe evaluation loop: fit on the deterministic salted-hash
    'train' split (operators/splits.py — the same assignment every split
    consumer uses), report confusion counts on the held-out 'test' split
    only. The honest generalization number next to ``classifier_eval``'s
    train-set fit; both reuse the identical fit/score paths."""
    from .splits import hash_split

    splits = hash_split(documents)
    with_split = documents.join(splits, "doc_id")
    train = with_split.filter(F.col("split") == "train").drop("split")
    test = with_split.filter(F.col("split") == "test").drop("split")
    w = ridge_fit(train, label, dim, lam)
    n_train = train.count()
    scored = ridge_score(test, w, dim).join(
        test.select("doc_id", label.cast("int").alias("y")), "doc_id"
    )
    p, y = F.col("pred"), F.col("y")
    return scored.agg(
        F.count(F.lit(1)).alias("n_test"),
        F.sum(y).cast("bigint").alias("test_pos"),
        F.sum(((p == 1) & (y == 1)).cast("int")).cast("bigint").alias("tp"),
        F.sum(((p == 1) & (y == 0)).cast("int")).cast("bigint").alias("fp"),
        F.sum(((p == 0) & (y == 1)).cast("int")).cast("bigint").alias("fn"),
        F.sum(((p == 0) & (y == 0)).cast("int")).cast("bigint").alias("tn"),
    ).select(
        F.lit(n_train).cast("bigint").alias("n_train"),
        "n_test",
        "test_pos",
        "tp",
        "fp",
        "fn",
        "tn",
        ((F.col("tp") + F.col("tn")) / F.col("n_test")).alias("accuracy"),
    )


def save_weights(w: np.ndarray, spark, path: str) -> None:
    """Persist a fitted weight vector as a tiny parquet artifact
    (bucket, wq) in CLF_SCALE micro-units plus the bias row at
    bucket = -1 — the model-registry face of the classifier (the PQ
    index's build-once/score-many discipline). Quantization at save time
    IS the scoring contract: ``ridge_score`` quantizes identically, so a
    reloaded model scores bit-for-bit like the in-memory one."""
    rows = [
        (int(j), int(np.floor(w[j] * CLF_SCALE + 0.5)))
        for j in range(len(w) - 1)
    ]
    rows.append((-1, int(np.floor(w[-1] * CLF_SCALE + 0.5))))
    local_df(spark, rows, "bucket int, wq bigint").coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)


def load_weights(spark, path: str, dim: int = CLF_DIM) -> np.ndarray:
    """Reload a ``save_weights`` artifact into the float64[dim+1] vector
    ``ridge_score`` takes. Exact: stored integers divide by the same
    CLF_SCALE the scorer re-multiplies by."""
    w = np.zeros(dim + 1, dtype=np.float64)
    for r in spark.read.parquet(path).collect():
        idx = dim if r["bucket"] == -1 else r["bucket"]
        w[idx] = r["wq"] / CLF_SCALE
    return w
