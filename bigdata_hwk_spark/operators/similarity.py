"""Similarity search over embedding columns (SURVEY.md §2.11 north star).

Brute-force cosine top-k is the correctness baseline (oracle-checked);
random-hyperplane LSH bucketing is the scale path (candidates from an
equi-join on bucket signatures, verified recall in tests).

All cosine arithmetic is double-precision, left-to-right over the 64-dim
arrays (``F.zip_with`` + ``F.aggregate``), matching DuckDB's
``list_dot_product`` on ``DOUBLE[]`` — results agree to the last ULP in
practice and are rounded to 4 decimals at the output boundary.

Scale notes: brute-force top-k against Q query vectors is a broadcast
cross join (no shuffle of the big side) followed by a per-query window —
linear in corpus size, embarrassingly parallel. The LSH path shrinks the
candidate set by ~2^bits; at 100 TB you'd add multi-probe and an IVF
coarse quantizer, both of which keep this module's shape (bucket id →
equi-join → exact re-rank).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

ANN_BITS = 4        # hyperplanes per LSH table
ANN_TABLES = 8      # independent tables (OR-amplification)
ANN_SEED = 42


def _as_double(col) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / F.sqrt(_dot(a, a) * _dot(b, b))


def cosine_topk_bruteforce(
    embeddings: DataFrame, n_queries: int = 5, k: int = 10
) -> DataFrame:
    """Exact top-k cosine neighbors for the first ``n_queries`` vectors.

    Query side is tiny → ``F.broadcast`` cross join (the corpus side never
    shuffles); per-query ranking via a window partitioned by query_id.
    """
    emb = embeddings.select("vec_id", _as_double(F.col("embedding")).alias("v"))
    queries = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    scored = (
        emb.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            _cosine(F.col("qv"), F.col("v")).alias("cos_raw"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_raw"), "neighbor_id"
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cos_raw", 4).alias("cosine"),
            "rk",
        )
    )


def cosine_topk_sql(n_queries: int = 5, k: int = 10) -> str:
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {n_queries}),
scored AS (
  SELECT query_id, e.vec_id AS neighbor_id,
         list_dot_product(qv, v)
           / sqrt(list_dot_product(qv, qv) * list_dot_product(v, v)) AS cos_raw
  FROM e CROSS JOIN q WHERE e.vec_id <> query_id),
ranked AS (
  SELECT query_id, neighbor_id, cos_raw,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_raw DESC, neighbor_id) AS rk
  FROM scored)
SELECT query_id, neighbor_id, round(cos_raw, 4) AS cosine, rk
FROM ranked WHERE rk <= {k}
"""


def similar_pairs_threshold(embeddings: DataFrame, tau: float = 0.4) -> DataFrame:
    """All pairs with cosine ≥ tau (the embedding near-dup predicate).

    Brute-force all-pairs here (correctness baseline / oracle twin);
    ``ann_lsh_pairs`` is the sub-quadratic variant.
    """
    emb = embeddings.select("vec_id", _as_double(F.col("embedding")).alias("v"))
    a = emb.alias("a")
    b = emb.alias("b")
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            _cosine(F.col("a.v"), F.col("b.v")).alias("cos_raw"),
        )
        .filter(F.col("cos_raw") >= tau)
        .select("vec_a", "vec_b", F.round("cos_raw", 4).alias("cosine"))
    )


def similar_pairs_sql(tau: float = 0.4) -> str:
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_dot_product(a.v, b.v)
             / sqrt(list_dot_product(a.v, a.v) * list_dot_product(b.v, b.v)), 4)
         AS cosine
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_dot_product(a.v, b.v)
      / sqrt(list_dot_product(a.v, a.v) * list_dot_product(b.v, b.v)) >= {tau!r}
"""


# ---------------------------------------------------------------------------
# LSH-bucketed ANN (scale path, rows-only — recall-tested vs brute force)
# ---------------------------------------------------------------------------

def _hyperplanes(dim: int, bits: int, tables: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((tables, bits, dim))


def _bucket_cols(planes: np.ndarray) -> list[Column]:
    """One bucket-signature column per table: sign-bit integer of the
    vector's dot products with that table's hyperplanes (pure codegen —
    planes are plan-time literals)."""
    cols = []
    for t in range(planes.shape[0]):
        bucket = F.lit(0)
        for b in range(planes.shape[1]):
            plane = F.array(*[F.lit(float(x)) for x in planes[t, b]])
            bucket = bucket + F.when(_dot(F.col("v"), plane) >= 0, F.lit(1 << b)).otherwise(F.lit(0))
        cols.append(bucket.alias(f"bucket_{t}"))
    return cols


def ann_lsh_pairs(
    embeddings: DataFrame,
    tau: float = 0.4,
    bits: int = ANN_BITS,
    tables: int = ANN_TABLES,
    seed: int = ANN_SEED,
    dim: int = 64,
) -> DataFrame:
    """Approximate near-dup pairs: candidates share an LSH bucket in ≥1 of
    ``tables`` random-hyperplane tables; candidates are exactly re-scored
    and thresholded, so precision is 1.0 and only recall is approximate
    (amplified by OR-ing tables)."""
    planes = _hyperplanes(dim, bits, tables, seed)
    emb = embeddings.select(
        "vec_id", _as_double(F.col("embedding")).alias("v")
    ).select("vec_id", "v", *_bucket_cols(planes))
    # long form: (vec_id, v, table, bucket)
    tb = F.explode(
        F.array(
            *[
                F.struct(F.lit(t).alias("t"), F.col(f"bucket_{t}").alias("bk"))
                for t in range(tables)
            ]
        )
    ).alias("tb")
    long = emb.select("vec_id", "v", tb).select(
        "vec_id", "v", F.col("tb.t").alias("t"), F.col("tb.bk").alias("bk")
    )
    a = long.alias("a")
    b = long.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.t") == F.col("b.t"))
            & (F.col("a.bk") == F.col("b.bk"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.v").alias("va"),
            F.col("b.v").alias("vb"),
        )
        .dropDuplicates(["vec_a", "vec_b"])
    )
    return (
        cand.select(
            "vec_a", "vec_b", _cosine(F.col("va"), F.col("vb")).alias("cos_raw")
        )
        .filter(F.col("cos_raw") >= tau)
        .select("vec_a", "vec_b", F.round("cos_raw", 4).alias("cosine"))
    )
