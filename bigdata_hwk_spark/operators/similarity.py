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
candidate set by ~2^bits and runs multi-probe (lowest-margin bit flips)
so half the tables deliver better recall than single-probe at full
tables; the IVF coarse quantizer keeps the same shape (bucket id →
equi-join → exact re-rank).
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..session import local_df

_LOG = logging.getLogger(__name__)

ANN_BITS = 4        # hyperplanes per LSH table
ANN_TABLES = 4      # independent tables (OR-amplification)
ANN_PROBES = 3      # multi-probe: base bucket + lowest-margin bit flips
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

    Zero-norm vectors are excluded up front on both engines: their cosine
    is undefined, and the division would be an ANSI-mode DIVIDE_BY_ZERO
    crash (Spark 4 default) — one corrupt embedding must not kill a
    corpus-wide query.
    """
    emb = embeddings.select(
        "vec_id", _as_double(F.col("embedding")).alias("v")
    ).filter(_dot(F.col("v"), F.col("v")) > 0)
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
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
           WHERE list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0),
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


def hard_negative_topk(
    embeddings: DataFrame,
    n_queries: int = 5,
    k: int = 10,
    pos_tau: float = 0.6,
    neg_lo: float = 0.05,
) -> DataFrame:
    """Hard-negative mining for embedding/retriever training (the DPR
    recipe — Karpukhin et al. 2020, public): for each anchor, the top-k
    most-similar neighbors whose cosine falls in [``neg_lo``,
    ``pos_tau``) — similar enough to be confusable (that is what makes
    the negative HARD and the contrastive gradient informative), but
    below the positive/near-duplicate threshold so true duplicates are
    never labeled negative. Neighbors at cosine ≥ ``pos_tau`` are the
    positive set and are excluded; neighbors below ``neg_lo`` are easy
    negatives random sampling already provides.

    Plan shape = ``cosine_topk_bruteforce`` (tiny broadcast anchor side,
    corpus side never shuffles, per-anchor window over the band
    survivors only) with the band filter pushed below the rank window.
    This is the oracle-checked baseline; at corpus scale the anchor
    set stays small (training batches), so the broadcast shape IS the
    production shape — for all-anchors mining compose the band filter
    over the ``ann_lsh_pairs`` candidate table instead.

    Determinism: band predicate and ranking run on the RAW double
    cosine (identical IEEE expression in both engines), ties by
    neighbor_id; the emitted cosine is rounded to 4 after ranking.
    """
    emb = embeddings.select(
        "vec_id", _as_double(F.col("embedding")).alias("v")
    ).filter(_dot(F.col("v"), F.col("v")) > 0)
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
        .filter(
            (F.col("cos_raw") >= neg_lo) & (F.col("cos_raw") < pos_tau)
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


def hard_negative_topk_sql(
    n_queries: int = 5,
    k: int = 10,
    pos_tau: float = 0.6,
    neg_lo: float = 0.05,
) -> str:
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
           WHERE list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {n_queries}),
scored AS (
  SELECT query_id, e.vec_id AS neighbor_id,
         list_dot_product(qv, v)
           / sqrt(list_dot_product(qv, qv) * list_dot_product(v, v)) AS cos_raw
  FROM e CROSS JOIN q WHERE e.vec_id <> query_id),
banded AS (
  SELECT * FROM scored
  WHERE cos_raw >= {neg_lo} AND cos_raw < {pos_tau}),
ranked AS (
  SELECT query_id, neighbor_id, cos_raw,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_raw DESC, neighbor_id) AS rk
  FROM banded)
SELECT query_id, neighbor_id, round(cos_raw, 4) AS cosine, rk
FROM ranked WHERE rk <= {k}
"""


# Hard corpus-size gate for the exact all-pairs path. Above it, the O(N²)
# flops and the O(N·dim) driver/executor matrix are both off the table and
# similar_pairs_threshold routes to the sub-quadratic LSH plan instead
# (exact re-scoring keeps precision 1.0 there; only recall is approximate).
# Two limits, both enforced (round-6 VERDICT item 7): a row cap for the
# quadratic flops AND a byte cap for the broadcast float64 matrix itself
# (rows × dim × 8), so a wide-embedding corpus can't ride a generous row
# gate into several GB of driver/executor heap.
SIMILAR_PAIRS_EXACT_MAX = 1_000_000
SIMILAR_PAIRS_MATRIX_MAX_BYTES = 512 * 1024 * 1024


def similar_pairs_threshold(
    embeddings: DataFrame,
    tau: float = 0.4,
    exact_max_rows: int = SIMILAR_PAIRS_EXACT_MAX,
) -> DataFrame:
    """All pairs with cosine ≥ tau (the embedding near-dup predicate).

    Brute-force all-pairs is the correctness baseline / oracle twin
    (``ann_lsh_pairs`` is the sub-quadratic variant), but executed as a
    *blocked matrix product*, not a pair join: each partition's rows are
    scored against the full corpus matrix with one NumPy float64 matmul
    inside ``mapInPandas`` (Arrow-batched), keeping vec_a < vec_b to emit
    each pair once. The quadratic flops are unavoidable for an exact
    answer; this shape makes them BLAS flops spread evenly over
    partitions, with no shuffle at all.

    The corpus matrix is shipped as an ``sc.broadcast`` (torrent — one
    copy per executor, not one per task closure), and the exact path is
    HARD-GATED: above ``exact_max_rows`` rows OR
    ``SIMILAR_PAIRS_MATRIX_MAX_BYTES`` of float64 matrix (rows × dim × 8
    — one gate job computes both) the driver matrix and the quadratic
    flops are scale-killers, so the call transparently degrades to
    ``ann_lsh_pairs`` (same output schema; exact re-scoring → no false
    positives, recall approximate). Set ``exact_max_rows=None`` to force
    the exact path. The matrix is collected as ONE Arrow table and
    reshaped from the flat value buffer — never a Python list-of-lists,
    whose per-element object overhead was the real driver-heap cost at
    the gate boundary (~10× the matrix bytes).
    """
    # One gate/validation job: size caps AND shape invariants. min(size)
    # and the null count guard the Arrow flat-buffer reshape below —
    # ListArray.flatten() silently DROPS null entries, and a ragged
    # column can reshape "successfully" whenever the total element count
    # happens to divide num_rows, pairing vec_ids with the wrong vectors
    # (round-8 ADVICE, medium). Fail loudly instead.
    stats = embeddings.agg(
        F.count(F.lit(1)).alias("n"),
        F.max(F.size("embedding")).alias("dim"),
        F.min(F.size("embedding")).alias("dim_min"),
        F.count(F.when(F.col("embedding").isNull(), 1)).alias("nulls"),
    ).collect()[0]
    n, dim = stats.n, stats.dim or 0
    if stats.nulls:
        raise ValueError(
            f"similar_pairs_threshold: {stats.nulls} null embeddings — "
            "drop or impute them before pairing (the flat-buffer reshape "
            "would silently misalign vec_ids)"
        )
    if n and stats.dim_min != dim:
        raise ValueError(
            f"similar_pairs_threshold: ragged embedding lengths "
            f"[{stats.dim_min}, {dim}] — a fixed dim is required"
        )
    if exact_max_rows is not None:
        matrix_bytes = n * dim * 8
        if n > exact_max_rows or matrix_bytes > SIMILAR_PAIRS_MATRIX_MAX_BYTES:
            # loud degrade (round-2 ADVICE): recall becomes approximate
            # here — callers relying on exhaustive pairs should see it
            _LOG.warning(
                "similar_pairs_threshold: corpus is %d rows × %d dims "
                "(%d matrix bytes) vs gate (rows<=%d, bytes<=%d); degrading "
                "to the sub-quadratic LSH plan (exact re-scoring keeps "
                "precision 1.0, recall is approximate)",
                n,
                dim,
                matrix_bytes,
                exact_max_rows,
                SIMILAR_PAIRS_MATRIX_MAX_BYTES,
            )
            return ann_lsh_pairs(embeddings, tau=tau)

    arrow = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    ).toArrow()
    if arrow.num_rows == 0:  # np reshaping below needs ≥1 row
        return embeddings.sparkSession.createDataFrame(
            [], "vec_a bigint, vec_b bigint, cosine double"
        )
    ids = arrow.column("vec_id").to_numpy().astype(np.int64)
    flat = arrow.column("embedding").combine_chunks().flatten()
    if len(flat) != arrow.num_rows * dim:
        raise ValueError(
            f"similar_pairs_threshold: flat buffer has {len(flat)} elements "
            f"for {arrow.num_rows} rows × dim {dim} — null/ragged embeddings "
            "slipped past the gate agg; refusing to reshape"
        )
    mat = flat.to_numpy(zero_copy_only=False).reshape(arrow.num_rows, dim)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    bc = embeddings.sparkSession.sparkContext.broadcast((ids, mat))

    def score(batches):
        b_ids, b_mat = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            block = np.array(list(pdf["embedding"]), dtype=np.float64)
            block_n = block / np.linalg.norm(block, axis=1, keepdims=True)
            cos = block_n @ b_mat.T
            bids = pdf["vec_id"].to_numpy()
            bi, cj = np.nonzero((cos >= tau) & (bids[:, None] < b_ids[None, :]))
            yield pd.DataFrame(
                {
                    "vec_a": bids[bi],
                    "vec_b": b_ids[cj],
                    "cosine": np.round(cos[bi, cj], 4),
                }
            )

    from ..sources.tables import fan_out

    emb = fan_out(embeddings.select("vec_id", "embedding"))
    out = emb.mapInPandas(
        score, schema="vec_a bigint, vec_b bigint, cosine double"
    )
    # Release executor copies of the corpus broadcast once the caller
    # drops the result DataFrame (round-2 ADVICE: repeated calls were
    # accumulating driver+executor memory). unpersist (not destroy): the
    # driver copy stays, so a still-referenced plan that re-executes
    # later simply re-broadcasts.
    from ..session import finalize_release

    finalize_release(out, bc.unpersist)
    return out


def incremental_embedding_pairs(
    batch: DataFrame, corpus: DataFrame, tau: float = 0.4
) -> DataFrame:
    """(batch_id, corpus_id, cosine) — every (new vector, existing vector)
    pair at cosine ≥ tau: the embedding-side twin of
    ``dedup.incremental_lsh_pairs`` (ingest dedup checks the incoming
    batch against the corpus, never the corpus against itself).

    Exact AND linear in the corpus: an ingest batch is small by
    definition, so it broadcasts as one normalized matrix (torrent, one
    copy per executor) and a single blocked NumPy matmul per corpus
    partition scores it — no shuffle, no quadratic corpus term, and
    recall is 1, which is what makes the DuckDB oracle an equality check
    rather than a recall bound. Per-batch cost is O(|corpus|·|batch|)
    BLAS flops spread evenly across partitions; at 100 TB the corpus
    side stays a pure scan. Zero-norm vectors on either side are
    excluded (cosine undefined).
    """
    pdf_b = batch.select("vec_id", "embedding").toPandas()
    sess = corpus.sparkSession
    empty_schema = "batch_id bigint, corpus_id bigint, cosine double"
    if len(pdf_b) == 0:
        return sess.createDataFrame([], empty_schema)
    b_ids = pdf_b["vec_id"].to_numpy(np.int64)
    b_mat = np.array(list(pdf_b["embedding"]), dtype=np.float64)
    b_norms = np.linalg.norm(b_mat, axis=1)
    keep = b_norms > 0
    b_ids, b_mat = b_ids[keep], b_mat[keep] / b_norms[keep, None]
    if len(b_ids) == 0:
        return sess.createDataFrame([], empty_schema)
    bc = sess.sparkContext.broadcast((b_ids, b_mat))

    def score(batches):
        ids_b, mat_b = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            block = np.array(list(pdf["embedding"]), dtype=np.float64)
            norms = np.linalg.norm(block, axis=1)
            ok = norms > 0
            if not ok.any():
                continue
            block = block[ok] / norms[ok, None]
            cids = pdf["vec_id"].to_numpy()[ok]
            cos = mat_b @ block.T  # (|batch|, |block|)
            bi, cj = np.nonzero(cos >= tau)
            yield pd.DataFrame(
                {
                    "batch_id": ids_b[bi],
                    "corpus_id": cids[cj],
                    "cosine": np.round(cos[bi, cj], 4),
                }
            )

    from ..sources.tables import fan_out

    emb = fan_out(corpus.select("vec_id", "embedding"))
    out = emb.mapInPandas(score, schema=empty_schema)
    from ..session import finalize_release

    finalize_release(out, bc.unpersist)
    return out


def incremental_embedding_pairs_sql(batch_pred: str, tau: float = 0.4) -> str:
    """DuckDB oracle: literal bipartite cross score over the same split.

    ``batch_pred`` — predicate over ``vec_id`` selecting the batch side;
    the corpus is its complement."""
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
           WHERE list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0),
b AS (SELECT * FROM e WHERE {batch_pred}),
c AS (SELECT * FROM e WHERE NOT ({batch_pred}))
SELECT b.vec_id AS batch_id, c.vec_id AS corpus_id,
       round(list_dot_product(b.v, c.v)
             / sqrt(list_dot_product(b.v, b.v) * list_dot_product(c.v, c.v)), 4)
         AS cosine
FROM b, c
WHERE list_dot_product(b.v, c.v)
      / sqrt(list_dot_product(b.v, b.v) * list_dot_product(c.v, c.v)) >= {tau!r}
"""


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


def _cosine_pandas() -> Column:
    """Vectorized (Arrow-batched) cosine over two array columns."""

    @F.pandas_udf("double")
    def cos(a: pd.Series, b: pd.Series) -> pd.Series:
        A = np.array(list(a), dtype=np.float64)
        B = np.array(list(b), dtype=np.float64)
        num = np.einsum("ij,ij->i", A, B)
        den = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
        return pd.Series(num / den)

    return cos


def ann_ivf_topk(
    embeddings: DataFrame,
    n_queries: int = 5,
    k: int = 10,
    nlist: int | None = None,
    nprobe: int | None = None,
    sample_cap: int = 2048,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k cosine search.

    The scale path for similarity *search* (vs ``ann_lsh_pairs`` for pair
    *mining*): a coarse quantizer partitions the corpus into ``nlist``
    inverted lists; each query probes only its ``nprobe`` nearest lists and
    exact-reranks the candidates. Candidate volume is ~``nprobe/nlist`` of
    the corpus per query, and the expensive stages are all equi-joins.

    Parameter defaults derive from corpus size — the standard IVF rule of
    thumb: ``nlist ≈ √N`` (clamped to [16, sample_cap/8] so the FFT
    codebook sample can populate every list with well-spread centroids)
    and ``nprobe = nlist/4``. A fixed (nlist=16, nprobe=8) probed HALF
    the corpus per query and made this the slowest query in the whole
    bench at sf0.1; nlist/4 was measured (NumPy sweep over the fixture)
    as the smallest probe fraction holding recall@10 ≈ 0.6–0.7 on these
    weakly-clustered fixtures — on a genuinely clustered production
    corpus the same code takes nprobe ≪ nlist.

    The quantizer seeds with the engine's FFT k-center kernel
    (``operators/kcenter.sequential_fft`` — reference SequentialFFT,
    HWK_2/G029HW2.py:50-79) on a deterministic sample of normalized
    vectors, then refines with a few Lloyd (k-means) iterations —
    k-center alone spreads centroids to density extremes, which costs
    recall; the refinement pulls them toward cluster mass (measured on
    the fixtures: +0.06–0.10 recall@10 at the same nprobe). All
    driver-side NumPy on ≤ sample_cap rows, deterministic.

    Output schema matches ``cosine_topk_bruteforce`` so recall is directly
    measurable (tests/test_extensions.py).
    """
    from .kcenter import sequential_fft

    if nlist is None:
        n_corpus = embeddings.count()
        # √N, clamped: ≥16 lists so probing is meaningful on tiny corpora,
        # ≤sample_cap/8 so the FFT codebook sample can still populate
        # every list with well-spread centroids
        nlist = int(min(max(16, round(n_corpus**0.5)), sample_cap // 8))
    if nprobe is None:
        nprobe = max(2, nlist // 4)
    nprobe = min(nprobe, nlist)

    # codebook: deterministic sample → normalize → k-center (driver NumPy;
    # sample_cap rows regardless of corpus size; the id filter pushes to
    # the scan — no global sort). Sorted on the driver: collect order
    # follows partition layout, and the FFT seed starts from row 0 —
    # sorting pins the codebook (and so recall) to the DATA, not the
    # layout (kmeans_fit/_pq_sample_books already did; this site's miss
    # made recall swing with the core count).
    sample = sorted(
        embeddings.select("vec_id", "embedding")
        .filter(F.col("vec_id") < sample_cap)
        .collect(),
        key=lambda r: r.vec_id,
    )
    if not sample:  # empty corpus (or no ids under sample_cap): no queries
        return embeddings.sparkSession.createDataFrame(
            [], "query_id bigint, neighbor_id bigint, cosine double, rk int"
        )
    smat = np.array([r.embedding for r in sample], dtype=np.float64)
    smat /= np.linalg.norm(smat, axis=1, keepdims=True)
    centroids = sequential_fft(smat, nlist)  # (nlist, dim), unit-ish rows
    centroids /= np.linalg.norm(centroids, axis=1, keepdims=True)
    # Lloyd refinement (spherical k-means): assign sample → recompute means
    # → renormalize. Empty lists keep their previous centroid. Fixed
    # iteration count → deterministic.
    for _ in range(10):
        assign_s = np.argmax(smat @ centroids.T, axis=1)
        for c in range(nlist):
            members = smat[assign_s == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids /= np.linalg.norm(centroids, axis=1, keepdims=True)

    # inverted lists: argmax-cosine centroid per vector, one matmul per
    # Arrow batch, no shuffle. The embedding rides along so the probe-hit
    # candidates never need a second corpus join — the probe join below is
    # a broadcast (map-side), so the wide column costs no shuffle.
    def assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            block = np.array(list(pdf["embedding"]), dtype=np.float64)
            block /= np.linalg.norm(block, axis=1, keepdims=True)
            out = pdf[["vec_id", "embedding"]].copy()
            out["cid"] = np.argmax(block @ centroids.T, axis=1).astype(np.int32)
            yield out

    from ..sources.tables import fan_out

    emb = fan_out(embeddings.select("vec_id", "embedding"))
    lists = emb.mapInPandas(
        assign, schema="vec_id bigint, embedding array<float>, cid int"
    )

    # probe set: per query, its nprobe nearest centroids (queries are few →
    # driver-side; the (query_id, cid) table is tiny and broadcast).
    # Queries are a prefix of the codebook sample (n_queries < sample_cap),
    # so no second scan/collect is needed.
    spark = embeddings.sparkSession
    assert n_queries <= sample_cap
    qrows = [r for r in sample if r.vec_id < n_queries]
    probes = []
    queries = []
    for r in qrows:
        qv = np.asarray(r.embedding, dtype=np.float64)
        qv /= np.linalg.norm(qv)
        top = np.argsort(-(centroids @ qv))[:nprobe]
        probes.extend((int(r.vec_id), int(c)) for c in top)
        queries.append((int(r.vec_id), [float(x) for x in qv]))
    probe_df = local_df(spark, probes, "query_id bigint, cid int")
    query_df = local_df(spark, queries, "query_id bigint, qv array<double>")

    cos = _cosine_pandas()
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_raw"), "neighbor_id")
    return (
        lists.join(F.broadcast(probe_df), "cid")
        .filter(F.col("vec_id") != F.col("query_id"))
        .join(F.broadcast(query_df), "query_id")
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cos(F.col("embedding"), F.col("qv")).alias("cos_raw"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            "query_id", "neighbor_id", F.round("cos_raw", 4).alias("cosine"), "rk"
        )
    )


def _lsh_signature_table(
    embeddings: DataFrame,
    bits: int,
    tables: int,
    probes: int,
    seed: int,
    dim: int,
) -> DataFrame:
    """(vec_id, t, bk, fl): the multi-probe LSH signature table — base
    bucket per (vector, table) plus the ``probes-1`` flipped-bit probe
    buckets (fl=1). Signatures AND probes come from a single NumPy
    matmul per Arrow batch (``mapInPandas``, no shuffle); persisted
    (MEMORY_AND_DISK) because it feeds both sides of the candidate
    self-join. Shared by ``ann_lsh_pairs`` and the capacity diagnostic
    ``ann_candidate_counts``."""
    planes = _hyperplanes(dim, bits, tables, seed)
    flat = planes.reshape(tables * bits, dim)  # (T*B, dim)
    weights = 1 << np.arange(bits, dtype=np.int64)
    n_flips = max(0, min(probes - 1, bits))

    def bucketize(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            block = np.array(list(pdf["embedding"]), dtype=np.float64)
            proj = (block @ flat.T).reshape(-1, tables, bits)
            signs = proj >= 0
            buckets = (signs * weights).sum(axis=2)  # (n, tables)
            n = len(pdf)
            vec_ids = [np.repeat(pdf["vec_id"].to_numpy(), tables)]
            ts = [np.tile(np.arange(tables, dtype=np.int32), n)]
            bks = [buckets.reshape(-1)]
            fls = [np.zeros(n * tables, dtype=np.int8)]
            if n_flips:
                # flip the n_flips lowest-|margin| bits per (vec, table):
                # cheapest next-nearest buckets, one vectorized argsort
                order = np.argsort(np.abs(proj), axis=2)  # (n, T, B)
                for j in range(n_flips):
                    flipped = buckets ^ np.left_shift(1, order[:, :, j])
                    vec_ids.append(vec_ids[0])
                    ts.append(ts[0])
                    bks.append(flipped.reshape(-1))
                    fls.append(np.ones(n * tables, dtype=np.int8))
            yield pd.DataFrame(
                {
                    "vec_id": np.concatenate(vec_ids),
                    "t": np.concatenate(ts),
                    "bk": np.concatenate(bks),
                    "fl": np.concatenate(fls),
                }
            )

    from ..sources.tables import fan_out

    emb = fan_out(embeddings.select("vec_id", "embedding"))
    # the signature table feeds BOTH sides of the self-join; unpersisted,
    # branched lineage re-runs the bucketize matmul (and the corpus scan)
    # twice. ~20 bytes/row × T·probes rows — MEMORY_AND_DISK spills at
    # scale instead of recomputing.
    # guarded persist: on a repeated run (bench warm + timed) the
    # deterministic closure pickles to the same plan, and re-persisting an
    # already cached plan draws a CacheManager WARN (session.persist_once)
    from ..session import persist_once

    return persist_once(
        emb.mapInPandas(
            bucketize, schema="vec_id bigint, t int, bk bigint, fl tinyint"
        ),
        StorageLevel.MEMORY_AND_DISK,
    )


def ann_candidate_counts(
    embeddings: DataFrame,
    bits: int = ANN_BITS,
    tables: int = ANN_TABLES,
    probes: int = ANN_PROBES,
    seed: int = ANN_SEED,
    dim: int = 64,
) -> DataFrame:
    """One row (n_vectors, n_signature_rows, n_candidates): the
    capacity-planning diagnostic for an LSH config — ``n_candidates`` is
    the pre-dedup candidate-join volume, the engine-scaling quantity the
    pair query's wall follows (~linear per candidate on a cluster;
    occupancy × tables × probes per vector by construction). Counting is
    one map-side-combined aggregate over the join — no distinct, no
    re-scoring — so the diagnostic is far cheaper than the pair query it
    predicts and can be run before committing to a (bits, tables,
    probes) choice at scale."""
    long = _lsh_signature_table(embeddings, bits, tables, probes, seed, dim)
    a = long.alias("a")
    b = long.filter(F.col("fl") == 0).alias("b")
    n_cand = (
        a.join(b, ["t", "bk"])
        .filter(F.col("a.vec_id") != F.col("b.vec_id"))
        .count()
    )
    n_sig = long.count()
    n_vec = embeddings.count()
    spark = embeddings.sparkSession
    return local_df(
        spark, [(n_vec, n_sig, n_cand)],
        "n_vectors bigint, n_signature_rows bigint, n_candidates bigint",
    )


def ann_lsh_pairs(
    embeddings: DataFrame,
    tau: float = 0.4,
    bits: int = ANN_BITS,
    tables: int = ANN_TABLES,
    probes: int = ANN_PROBES,
    seed: int = ANN_SEED,
    dim: int = 64,
) -> DataFrame:
    """Approximate near-dup pairs: candidates share an LSH bucket in ≥1 of
    ``tables`` random-hyperplane tables, under multi-probe (each vector
    also probes the ``probes-1`` buckets reached by flipping its
    lowest-|margin| hyperplane bits — the bits most likely to differ for
    a true neighbor). Candidates are exactly re-scored and thresholded,
    so precision is 1.0 and only recall is approximate.

    Multi-probe is the 100 TB lever: halving ``tables`` halves the
    persisted signature table and the per-bucket join fan-in, while the
    extra probes recover the lost recall — probe rows multiply only the
    probe SIDE of the join, not the indexed side (probe rows join base
    rows, so a pair one flipped bit apart still meets). Recall at
    (tables=4, probes=3) ≥ recall at (tables=8, probes=1) is pinned by
    the recall test.

    Plan shape (the one that survives scale-up): signatures AND probe
    buckets for all tables come from a single NumPy matmul per Arrow
    batch (``mapInPandas``, no shuffle); the candidate join carries ONLY
    (table, bucket, vec_id) — 20 bytes/row — never the vectors; vectors
    re-attach to the deduped candidate pairs via two equi-joins; exact
    re-scoring is a vectorized pandas UDF. Shuffle volume is therefore
    O(candidates), not O(candidates × dim).
    """
    from ..sources.tables import fan_out

    emb = fan_out(embeddings.select("vec_id", "embedding"))
    long = _lsh_signature_table(embeddings, bits, tables, probes, seed, dim)
    a = long.alias("a")  # probe side: base + flipped buckets
    b = long.filter(F.col("fl") == 0).alias("b")  # indexed side: base only
    # base∧base rows of a bucket meet TWICE (x probes y's bucket and y
    # probes x's) and were only collapsed by the pair distinct; keeping
    # just the a<b direction generates each base-base candidate once —
    # fewer rows built, hashed and partially-deduped before the distinct
    # shuffle (guide §2.3; candidate SET unchanged — flip-side rows keep
    # both directions because a flip is not symmetric). Recall pin:
    # test_extensions' (tables=4, probes=3) ≥ (8, 1) test is unchanged.
    cand = (
        a.join(b, ["t", "bk"])
        .filter(
            F.when(
                F.col("a.fl") == 0,
                F.col("a.vec_id") < F.col("b.vec_id"),
            ).otherwise(F.col("a.vec_id") != F.col("b.vec_id"))
        )
        .select(
            F.least(F.col("a.vec_id"), F.col("b.vec_id")).alias("vec_a"),
            F.greatest(F.col("a.vec_id"), F.col("b.vec_id")).alias("vec_b"),
        )
        .distinct()
    )
    va = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    vb = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    cos = _cosine_pandas()
    return (
        cand.join(va, "vec_a")
        .join(vb, "vec_b")
        .select("vec_a", "vec_b", cos(F.col("ea"), F.col("eb")).alias("cos_raw"))
        .filter(F.col("cos_raw") >= tau)
        .select("vec_a", "vec_b", F.round("cos_raw", 4).alias("cosine"))
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup collapse (the dedup family's vector member)
# ---------------------------------------------------------------------------

def embedding_dedup_clusters(
    embeddings: DataFrame, tau: float = 0.4, pairs: DataFrame | None = None
) -> DataFrame:
    """(vec_id, cluster_id, cluster_size, is_canonical) for every vector in
    ≥1 cosine-similarity pair at ``tau``: embedding-space near-dup collapse.

    The vector-space sibling of ``dedup.dedup_clusters`` (shingle space):
    semantic near-duplicates (paraphrases, re-encodes, translations with
    aligned embeddings) that no lexical method catches. Same output
    contract — keep ``is_canonical`` rows plus every vector absent from
    this table and the corpus is cosine-near-dup-free with one survivor
    per cluster.

    Composition, all previously-tested pieces: pair generation via
    ``similar_pairs_threshold`` (exact blocked-matmul under the 1M-row
    gate, transparent LSH degrade above it) → ``dedup.connected_
    components`` (driver union-find for small edge lists, large-star/
    small-star above 1M edges). cluster_id = min vec_id of the component
    on either path. ``pairs`` lets callers inject a precomputed/shared
    pair table (the registry does).
    """
    from .dedup import connected_components

    if pairs is None:
        pairs = similar_pairs_threshold(embeddings, tau=tau)
    comp = connected_components(pairs, src="vec_a", dst="vec_b")
    w = Window.partitionBy("cluster_id")
    return comp.select(
        F.col("node").alias("vec_id"),
        "cluster_id",
        F.count(F.lit(1)).over(w).alias("cluster_size"),
        (F.col("node") == F.col("cluster_id")).alias("is_canonical"),
    )


def embedding_dedup_clusters_sql(tau: float = 0.4) -> str:
    """Oracle: recursive-CTE transitive closure over the exact cosine pair
    set (min reachable id = cluster id), mirroring ``dedup_clusters_sql``."""
    return f"""
WITH RECURSIVE pairs AS ({similar_pairs_sql(tau)}),
edges AS (
  SELECT vec_a AS u, vec_b AS v FROM pairs
  UNION SELECT vec_b AS u, vec_a AS v FROM pairs),
reach(u, v) AS (
  SELECT u, u FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
comp AS (SELECT u AS vec_id, min(v) AS cluster_id FROM reach GROUP BY u)
SELECT vec_id, cluster_id,
       count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
       vec_id = cluster_id AS is_canonical
FROM comp
"""


# ---------------------------------------------------------------------------
# Int8 quantization stats (storage/ANN compression audit; exact parity)
# ---------------------------------------------------------------------------

QUANT_LEVELS = 127  # symmetric int8


def embedding_quantization_stats(embeddings: DataFrame) -> DataFrame:
    """(vec_id, n_dims, max_abs, sum_q, sum_abs_q) — symmetric int8
    quantization audit per vector: scale = max|v|/127, q_i =
    round(v_i/scale). The manifest a 100 TB ANN deployment checks before
    committing to int8 storage (sum_abs_q ≈ 127·Σ|v|/max|v| says how much
    of the dynamic range survives).

    Everything is whole-stage-codegen array expressions — no UDF, no
    shuffle (pure projection). Engine parity is by construction, with NO
    float accumulation anywhere: max|v| is a comparison (exact), scale
    and each v_i/scale are single IEEE double ops (exact rounding),
    round-half-away-from-zero agrees between Spark (HALF_UP) and DuckDB,
    and the only SUMS are over the resulting integers — associative, so
    no summation-order hazard exists at any corpus size.
    """
    v = F.transform("embedding", lambda x: x.cast("double"))
    max_abs = F.array_max(F.transform(v, lambda x: F.abs(x)))
    # nullif: a zero vector has scale 0, and x/0 is an ANSI-mode
    # DIVIDE_BY_ZERO crash (Spark 4 default); NULL propagates through
    # round/cast/sum instead and the output CASE emits explicit zeros
    scale = F.nullif(max_abs, F.lit(0.0)) / QUANT_LEVELS
    q = F.transform(v, lambda x: F.round(x / scale, 0).cast("bigint"))
    zero = F.lit(0).cast("bigint")
    sum_q = F.aggregate(q, zero, lambda a, x: a + x)
    sum_abs_q = F.aggregate(q, zero, lambda a, x: a + F.abs(x))
    nonzero = F.col("__max_abs") > 0
    return (
        embeddings.select(
            "vec_id",
            F.size("embedding").alias("n_dims"),
            max_abs.alias("__max_abs"),
            sum_q.alias("__sum_q"),
            sum_abs_q.alias("__sum_abs_q"),
        )
        .select(
            "vec_id",
            "n_dims",
            F.round(F.col("__max_abs"), 6).alias("max_abs"),
            # zero vectors quantize to all-zero (scale is 0/127 = 0 → q is
            # null from 0/0; emit 0 explicitly on both sides)
            F.when(nonzero, F.col("__sum_q")).otherwise(0).alias("sum_q"),
            F.when(nonzero, F.col("__sum_abs_q")).otherwise(0).alias("sum_abs_q"),
        )
    )


EMBEDDING_QUANTIZATION_SQL = f"""
WITH v AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vd
  FROM embeddings),
m AS (
  SELECT vec_id, len(vd) AS n_dims,
         list_max(list_transform(vd, x -> abs(x))) AS max_abs, vd
  FROM v),
q AS (
  SELECT vec_id, n_dims, max_abs,
         list_transform(vd, x -> CAST(round(x / (nullif(max_abs, 0) / {QUANT_LEVELS}), 0)
                                      AS BIGINT)) AS qs
  FROM m)
SELECT vec_id, n_dims, round(max_abs, 6) AS max_abs,
       CASE WHEN max_abs > 0
            THEN CAST(list_sum(qs) AS BIGINT) ELSE 0 END AS sum_q,
       CASE WHEN max_abs > 0
            THEN CAST(list_sum(list_transform(qs, x -> abs(x))) AS BIGINT)
            ELSE 0 END AS sum_abs_q
FROM q
"""


def embedding_norm_by_lang(documents: DataFrame, embeddings: DataFrame) -> DataFrame:
    """(lang, n_docs, avg_norm, min_norm, max_norm) — text⋈embedding
    fusion: the documents table joined to its embedding table on the
    shared id, L2 norms aggregated per language. The cross-modality
    join every multimodal corpus audit runs (does a language's embedding
    distribution drift?).

    Parity by construction: each element is cast to double BEFORE
    squaring and the fold is left-to-right on BOTH engines
    (``F.aggregate`` ≡ DuckDB ``list_sum`` over the transformed list),
    so per-row norms are bit-identical; only the per-group mean crosses
    a shuffle and it's rounded at the boundary. At scale this is an
    id-keyed equi-join of two co-partitionable tables — bucket both on
    the id (``sinks.write_bucketed``) and it plans shuffle-free.
    """
    norm = F.sqrt(
        F.aggregate(
            F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    e = embeddings.select(F.col("vec_id").alias("doc_id"), norm.alias("norm"))
    return (
        documents.select("doc_id", "lang")
        .join(e, "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("norm"), 6).alias("avg_norm"),
            F.round(F.min("norm"), 6).alias("min_norm"),
            F.round(F.max("norm"), 6).alias("max_norm"),
        )
    )


EMBEDDING_NORM_BY_LANG_SQL = """
WITH norms AS (
  SELECT vec_id AS doc_id,
         sqrt(list_sum(list_transform(embedding,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS norm
  FROM embeddings)
SELECT lang, count(*) AS n_docs,
       round(avg(norm), 6) AS avg_norm,
       round(min(norm), 6) AS min_norm,
       round(max(norm), 6) AS max_norm
FROM documents JOIN norms USING (doc_id)
GROUP BY lang
"""


def embedding_coverage_audit(
    documents: DataFrame, embeddings: DataFrame
) -> DataFrame:
    """One-row referential-integrity audit of the documents↔embeddings
    pairing — the check a pipeline runs BEFORE any embedding-keyed stage
    (dedup, ANN, leakage-safe splits silently degrade when coverage is
    partial): (n_docs, n_vecs, docs_without_vec, vecs_without_doc,
    min_dim, max_dim, nan_vecs, zero_norm_vecs). min_dim != max_dim
    flags a mixed-dimension corpus; NaN and zero-norm vectors poison
    cosine math (0/0) and are counted per VECTOR, not per element.

    Exactness without float parity concerns: the zero-norm predicate is
    sum(x²) = 0, which holds iff every element is ±0.0 regardless of
    accumulation order or precision (squares are non-negative — no
    cancellation), so Spark's double fold and DuckDB's list_sum agree by
    construction; NaN detection is elementwise ``exists``.

    Scale: ONE full-outer equi-join on the id and one map-side-combined
    aggregation to a single row — the join is the audit; there is
    nothing else to shuffle.
    """
    d = documents.select("doc_id")
    e = embeddings.select("vec_id", "embedding")
    j = d.join(e, d["doc_id"] == e["vec_id"], "full_outer")
    sq = F.aggregate(
        "embedding",
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    has_vec = F.col("vec_id").isNotNull()
    return j.agg(
        F.count("doc_id").alias("n_docs"),
        F.count("vec_id").alias("n_vecs"),
        F.sum(
            (F.col("doc_id").isNotNull() & ~has_vec).cast("bigint")
        ).alias("docs_without_vec"),
        F.sum(
            (has_vec & F.col("doc_id").isNull()).cast("bigint")
        ).alias("vecs_without_doc"),
        F.min(F.size("embedding")).cast("bigint").alias("min_dim"),
        F.max(F.size("embedding")).cast("bigint").alias("max_dim"),
        F.sum(
            F.exists("embedding", lambda x: F.isnan(x.cast("double"))).cast(
                "bigint"
            )
        ).alias("nan_vecs"),
        F.sum((has_vec & (sq == 0.0)).cast("bigint")).alias("zero_norm_vecs"),
    )


EMBEDDING_COVERAGE_AUDIT_SQL = """
WITH j AS (
  SELECT d.doc_id, e.vec_id, e.embedding
  FROM documents d FULL OUTER JOIN embeddings e ON d.doc_id = e.vec_id)
SELECT count(doc_id) AS n_docs,
       count(vec_id) AS n_vecs,
       CAST(sum(CASE WHEN doc_id IS NOT NULL AND vec_id IS NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS docs_without_vec,
       CAST(sum(CASE WHEN vec_id IS NOT NULL AND doc_id IS NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS vecs_without_doc,
       CAST(min(len(embedding)) AS BIGINT) AS min_dim,
       CAST(max(len(embedding)) AS BIGINT) AS max_dim,
       CAST(sum(CASE WHEN list_bool_or(list_transform(embedding,
                          x -> isnan(CAST(x AS DOUBLE))))
                     THEN 1 ELSE 0 END) AS BIGINT) AS nan_vecs,
       -- coalesce: DuckDB list_sum([]) is NULL while the Spark fold's
       -- init value makes an empty vector sum 0.0 — align on 0
       CAST(sum(CASE WHEN vec_id IS NOT NULL AND coalesce(list_sum(
                          list_transform(embedding,
                              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 0) = 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS zero_norm_vecs
FROM j
"""


# ---------------------------------------------------------------------------
# Distributed spherical k-means + SemDeDup semantic pruning
# ---------------------------------------------------------------------------

KMEANS_K = 16
KMEANS_ITERS = 4
# integer micro-units for the centroid partial sums: quantizing each
# normalized component to rint(x · 2^20) makes every per-partition sum an
# INTEGER sum — associative and commutative — so the folded centroids are
# bit-identical under any partitioning/AQE re-plan (float partial sums are
# not: addition order varies with layout). 2^20 keeps ~6 significant
# digits per component; the argmax assignment is insensitive far beyond
# that, and determinism is what the downstream prune needs.
KMEANS_QUANT = 1 << 20
SEMDEDUP_TAU = 0.4  # aligned with the corpus near-dup threshold used by
                    # embedding_similar_pairs / embedding_dedup_clusters
# Giant-cluster cap for the per-cluster O(c²) prune: SemDeDup's cost
# model assumes k ~ √N keeps clusters at ~√N, but a pathological corpus
# (one dominant topic) can put most rows in ONE cluster and stall a
# single task. Above this row count the prune deterministically
# SUB-CLUSTERS the group in-place (FFT-seeded spherical Lloyd on the
# vec_id-sorted members — the kmeans_fit recipe run locally) and prunes
# each sub-cluster independently — the paper's own remedy (raise k /
# refine clustering), applied only where needed. Depth-bounded so
# unsplittable groups (near-identical vectors — where greedy is cheap
# anyway: the kept set stays tiny) still terminate.
SEMDEDUP_MAX_CLUSTER = 8192
SEMDEDUP_SPLIT_DEPTH = 4


def kmeans_fit(
    embeddings: DataFrame,
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    sample_cap: int = 2048,
    inertia_out: list | None = None,
    corpus: DataFrame | None = None,
) -> np.ndarray:
    """Distributed spherical k-means (Lloyd) over the embedding column →
    (k, dim) unit-norm float64 centroids.

    The genuinely-distributed twin of the driver-sample refinement inside
    ``ann_ivf_topk``: initialization is the same deterministic FFT
    k-center seeding (reference SequentialFFT, HWK_2/G029HW2.py:50-79) on
    a ≤ ``sample_cap``-row driver sample, but every Lloyd iteration runs
    over the WHOLE corpus — one broadcast-centroid ``mapInPandas`` pass
    per iteration emitting ≤ k tiny partial rows per partition (cluster,
    count, integer component sums), folded on the driver with exact
    integer arithmetic. Per-iteration cost: one corpus scan, zero
    shuffles, L·k·dim bytes to the driver — the canonical scalable
    k-means shape (combine per partition, reduce the combiner outputs).

    Bit-deterministic under any layout: partial sums are integer
    (see KMEANS_QUANT), the driver fold is order-independent, argmax
    ties resolve to the lowest cluster id, and empty clusters keep their
    previous centroid. ``inertia_out``, if given, receives the mean
    max-cosine after each assignment pass (non-decreasing — the spherical
    k-means objective — up to quantization jitter); it is a float
    diagnostic only and never feeds back into the centroids.

    Zero-norm vectors (cosine undefined — ``embedding_coverage_audit``
    counts them precisely because real corpora contain them) are
    excluded from both the FFT seed sample and every partial-sum pass:
    without the filter, 0/0 → NaN rows and ``np.rint(NaN).astype(int64)``
    silently poisons the integer centroid partials.

    ``corpus`` optionally injects a pre-built (vec_id, embedding)
    projection — typically one the caller has already persisted and will
    reuse for its own assignment pass — so clustering pipelines scan the
    parquet input exactly once. When absent, the projection is persisted
    here for the duration of the Lloyd loop (guide §5; r13 VERDICT item
    4): each of the ``iters`` passes otherwise re-reads the corpus from
    storage.
    """
    from .kcenter import sequential_fft
    from ..session import persist_scoped
    from ..sources.tables import fan_out

    release = lambda: None  # noqa: E731
    if corpus is None:
        corpus, release = persist_scoped(
            fan_out(embeddings.select("vec_id", "embedding")),
            StorageLevel.MEMORY_AND_DISK,
        )
    try:
        # sorted on the driver: collect order follows partition layout,
        # and the FFT seed starts from row 0 — sorting pins the init (and
        # so the whole fit) to the DATA, not the layout
        sample = sorted(
            corpus.filter(F.col("vec_id") < sample_cap).collect(),
            key=lambda r: r.vec_id,
        )
        if not sample:
            return np.zeros((0, 0))
        smat = np.array([r.embedding for r in sample], dtype=np.float64)
        snorms = np.linalg.norm(smat, axis=1, keepdims=True)
        smat = smat[snorms[:, 0] > 0] / snorms[snorms[:, 0] > 0]
        if smat.shape[0] == 0:
            return np.zeros((0, 0))
        dim = smat.shape[1]
        centers = sequential_fft(smat, k)
        k = len(centers)  # clamped when the corpus is smaller than k
        centers = centers / np.linalg.norm(centers, axis=1, keepdims=True)

        return _kmeans_lloyd(
            corpus.select("embedding"), centers, k, dim, iters, inertia_out
        )
    finally:
        release()


def _kmeans_lloyd(
    emb: DataFrame,
    centers: np.ndarray,
    k: int,
    dim: int,
    iters: int,
    inertia_out: list | None,
) -> np.ndarray:
    """The Lloyd loop of ``kmeans_fit`` over an (embedding)-only relation
    (typically an InMemoryTableScan projection of the caller's persisted
    corpus): one broadcast-centroid ``mapInPandas`` partial-sum pass per
    iteration, exact integer fold on the driver."""
    for _ in range(iters):
        C = centers  # closure snapshot for this iteration

        def partials(batches):
            cnt = np.zeros(k, dtype=np.int64)
            acc = np.zeros((k, dim), dtype=np.int64)
            cos_sum = 0.0
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                block = np.array(list(pdf["embedding"]), dtype=np.float64)
                norms = np.linalg.norm(block, axis=1, keepdims=True)
                ok = norms[:, 0] > 0
                if not ok.any():
                    continue
                block = block[ok] / norms[ok]
                sims = block @ C.T
                a = np.argmax(sims, axis=1)  # ties -> lowest cid
                cos_sum += float(sims[np.arange(len(a)), a].sum())
                q = np.rint(block * KMEANS_QUANT).astype(np.int64)
                cnt += np.bincount(a, minlength=k)
                for c in np.unique(a):
                    acc[c] += q[a == c].sum(axis=0)
            rows = [
                (int(c), int(cnt[c]), [int(x) for x in acc[c]], cos_sum)
                for c in range(k)
                if cnt[c] > 0
            ]
            # cos_sum rides on the first emitted row only (once per
            # partition) so the driver can form the exact corpus mean
            if rows:
                rows = [rows[0]] + [(c, n, s, 0.0) for c, n, s, _ in rows[1:]]
                yield pd.DataFrame(
                    rows, columns=["cid", "n", "s", "cos_sum"]
                )

        part = emb.mapInPandas(
            partials,
            schema="cid int, n bigint, s array<bigint>, cos_sum double",
        ).collect()
        tot_n = 0
        n_by = [0] * k
        s_by = [[0] * dim for _ in range(k)]
        cos_total = 0.0
        for r in part:
            n_by[r.cid] += r.n
            tot_n += r.n
            cs = s_by[r.cid]
            for i, x in enumerate(r.s):  # exact Python-int fold
                cs[i] += x
            cos_total += r.cos_sum
        if inertia_out is not None and tot_n:
            inertia_out.append(cos_total / tot_n)
        for c in range(k):
            if n_by[c]:
                centers[c] = np.array(s_by[c], dtype=np.float64) / (
                    n_by[c] * KMEANS_QUANT
                )
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    return centers


def semdedup_prune(
    embeddings: DataFrame,
    k: int = KMEANS_K,
    tau: float = SEMDEDUP_TAU,
    iters: int = KMEANS_ITERS,
    max_cluster_rows: int = SEMDEDUP_MAX_CLUSTER,
) -> DataFrame:
    """SemDeDup semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the corpus with k-means, then within each
    cluster greedily drop every vector whose cosine to an already-kept
    vector reaches ``tau`` — near-duplicate MEANING, not near-duplicate
    bytes, which is exactly what MinHash/SimHash cannot see (a paraphrase
    shares no shingles). Output: (vec_id, cluster, kept, nn_cos) where
    ``nn_cos`` is the max cosine to the kept vectors that preceded the
    row in its cluster (−1.0 for the first row of a cluster).

    Deterministic keeper rule: within a cluster, candidates are visited
    in ascending ``vec_id`` (the paper keeps a per-group representative;
    lowest-id is the engine's standard re-layout-stable choice, same as
    every dedup keeper here), so kept rows pairwise satisfy cos < tau and
    every dropped row has a kept earlier neighbor with cos ≥ tau.

    Scale shape: clustering cost is ``kmeans_fit`` (scans, no shuffle);
    the prune is ONE shuffle keyed by cluster id, then per-cluster work
    quadratic only WITHIN a cluster — the whole point of SemDeDup is
    that k ~ √N keeps clusters at ~√N and the per-cluster O(c²) matmul
    sits in cache on one executor (the paper runs 50k clusters for LAION
    precisely so clusters stay small).

    Giant-cluster degrade (``max_cluster_rows``): a cluster that blows
    past the gate is recursively sub-clustered IN TASK (deterministic
    FFT-seeded spherical Lloyd over its vec_id-sorted members) and each
    sub-cluster pruned independently — same remedy the paper prescribes
    (refine the clustering), applied only to the offending group, so a
    one-dominant-topic corpus cannot stall a single task on an O(c²)
    pass. Kept-flag semantics on clusters under the gate are EXACTLY
    the ungated algorithm's (pinned in tests); an over-gate cluster's
    flags are those of SemDeDup run at finer granularity — still
    pairwise-below-tau within each sub-cluster.

    Zero-norm vectors are excluded from the output (cosine undefined,
    same contract as ``similar_pairs_threshold``); the assign pass drops
    them before normalizing so NaN never reaches argmax or the prune.
    """
    from ..session import finalize_release, persist_scoped
    from ..sources.tables import fan_out

    # ONE persisted (vec_id, embedding) projection feeds the FFT sample,
    # every Lloyd iteration AND the assignment pass below (guide §5;
    # r13 VERDICT item 4) — before, each of those was its own parquet
    # scan. Released when the returned frame is garbage collected (the
    # ``similar_pairs_threshold`` finalize_release pattern).
    corpus, release = persist_scoped(
        fan_out(embeddings.select("vec_id", "embedding")),
        StorageLevel.MEMORY_AND_DISK,
    )
    centers = kmeans_fit(embeddings, k=k, iters=iters, corpus=corpus)
    if centers.size == 0:
        release()
        return embeddings.sparkSession.createDataFrame(
            [], "vec_id bigint, cluster int, kept boolean, nn_cos double"
        )

    def assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            block = np.array(list(pdf["embedding"]), dtype=np.float64)
            norms = np.linalg.norm(block, axis=1, keepdims=True)
            ok = norms[:, 0] > 0
            if not ok.any():
                continue
            block = block[ok] / norms[ok]
            out = pdf.loc[ok, ["vec_id", "embedding"]].copy()
            out["cluster"] = np.argmax(block @ centers.T, axis=1).astype(
                np.int32
            )
            yield out

    assigned = corpus.mapInPandas(
        assign, schema="vec_id bigint, embedding array<float>, cluster int"
    )

    def prune(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        block = np.array(list(pdf["embedding"]), dtype=np.float64)
        norms = np.linalg.norm(block, axis=1, keepdims=True)
        ok = norms[:, 0] > 0
        if not ok.all():  # assign() excludes these; guard direct calls
            pdf = pdf.loc[ok].reset_index(drop=True)
            block, norms = block[ok], norms[ok]
        if len(pdf) == 0:
            return pd.DataFrame(
                {
                    "vec_id": pd.Series([], dtype=np.int64),
                    "cluster": pd.Series([], dtype=np.int32),
                    "kept": pd.Series([], dtype=bool),
                    "nn_cos": pd.Series([], dtype=np.float64),
                }
            )
        block = block / norms
        kept_flags = np.empty(len(pdf), dtype=bool)
        nn = np.empty(len(pdf), dtype=np.float64)

        def greedy(idx: np.ndarray) -> None:
            kept_rows: list[int] = []
            for i in idx:
                mx = (
                    float((block[kept_rows] @ block[i]).max())
                    if kept_rows
                    else -1.0
                )
                nn[i] = round(mx, 6)
                keep = mx < tau
                kept_flags[i] = keep
                if keep:
                    kept_rows.append(i)

        def process(idx: np.ndarray, depth: int) -> None:
            if len(idx) <= max_cluster_rows or depth >= SEMDEDUP_SPLIT_DEPTH:
                greedy(idx)
                return
            # deterministic local refine: FFT seed on the vec_id-sorted
            # members (idx is ascending-vec_id by construction), fixed
            # spherical Lloyd rounds, argmax ties -> lowest sub-id —
            # the kmeans_fit recipe without a Spark job
            from .kcenter import sequential_fft

            sub_block = block[idx]
            k_sub = min(
                int(np.ceil(len(idx) / max_cluster_rows)) + 1, 64
            )
            centers = sequential_fft(sub_block, min(k_sub, len(idx)))
            centers = centers / np.linalg.norm(
                centers, axis=1, keepdims=True
            )
            for _ in range(4):
                a = np.argmax(sub_block @ centers.T, axis=1)
                for c in range(len(centers)):
                    members = sub_block[a == c]
                    if len(members):
                        m = members.mean(axis=0)
                        nm = np.linalg.norm(m)
                        if nm > 0:  # else keep previous center
                            centers[c] = m / nm
            a = np.argmax(sub_block @ centers.T, axis=1)
            if len(np.unique(a)) == 1:  # unsplittable (near-identical)
                greedy(idx)
                return
            for c in np.unique(a):
                process(idx[a == c], depth + 1)

        process(np.arange(len(pdf)), 0)
        return pd.DataFrame(
            {
                "vec_id": pdf["vec_id"],
                "cluster": pdf["cluster"],
                "kept": kept_flags,
                "nn_cos": nn,
            }
        )

    out = assigned.groupBy("cluster").applyInPandas(
        prune, schema="vec_id bigint, cluster int, kept boolean, nn_cos double"
    )
    finalize_release(out, release)
    return out


def semdedup_kept_counts(
    embeddings: DataFrame,
    k: int = KMEANS_K,
    tau: float = SEMDEDUP_TAU,
    iters: int = KMEANS_ITERS,
) -> DataFrame:
    """Per-cluster SemDeDup summary (cluster, n_vectors, n_kept): the
    effective-corpus report a curation run reads before committing to
    the prune — and the skew check (a cluster holding most of the corpus
    means k is too small for the O(c²) per-cluster pass). Rows-only
    registry surface: the kept decision depends on k-means iterations,
    which SQL cannot express; its invariants are property-tested."""
    pruned = semdedup_prune(embeddings, k=k, tau=tau, iters=iters)
    out = (
        pruned
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.sum(F.col("kept").cast("bigint")).alias("n_kept"),
        )
        .orderBy("cluster")
    )
    # keep the prune frame (and so its scoped corpus cache — see the
    # finalize_release in semdedup_prune) alive until THIS frame dies,
    # so the assignment pass still reads the cache when the caller
    # finally runs the aggregate
    out._semdedup_pruned_ref = pruned
    return out


# ---------------------------------------------------------------------------
# Product-quantization ADC search (Jégou, Douze & Schmid, TPAMI 2011)
# ---------------------------------------------------------------------------

PQ_M = 16           # subspaces (dim must be divisible by M)
PQ_K = 16           # centroids per subspace -> 4-bit codes, M·log2(K)=64
PQ_LLOYD = 10       # Lloyd iterations per subspace codebook
# bit-budget sweep measured on the weakly-clustered 64-dim fixture
# (recall@10 vs exact): 32 bits 0.26, 48 0.34, 64 0.38, 96 0.50, 128
# 0.62 — monotone in bits, as published. 64-bit codes (32× compression
# vs float32) are the default; corpora with real cluster structure do
# substantially better at the same budget, and an IVF front (ann_ivf_
# topk's coarse quantizer) composes with this for the full IVFPQ stack.
# integer micro-units for ADC partial distances: each LUT entry is
# rint(d² · 2^20), so the per-candidate sum over M entries is an INTEGER
# sum — associative, layout-invariant ranking (same trick as
# KMEANS_QUANT; float partial sums would let AQE re-plans flip near-ties)
PQ_QUANT = 1 << 20


def ann_pq_topk(
    embeddings: DataFrame,
    n_queries: int = 5,
    k: int = 10,
    m_sub: int = PQ_M,
    k_codes: int = PQ_K,
    sample_cap: int = 2048,
) -> DataFrame:
    """(query_id, neighbor_id, adc_dist, rk): product-quantization
    approximate top-k — the memory-bound half of the published ANN stack
    (IVF partitions the corpus; PQ compresses it: M·log2(K) = 64 bits
    per vector here vs 32·dim = 2048 for raw floats — 32× compression).

    Shape: per-subspace codebooks train on the deterministic ≤
    ``sample_cap``-row driver sample (FFT seeding + Lloyd, the
    ``ann_ivf_topk`` precedent); the corpus is ENCODED distributed — one
    broadcast-codebook ``mapInPandas`` pass emitting (vec_id, m, code)
    rows, the only corpus-scale data after which the float vectors are
    never touched again. Each query precomputes its M×K lookup table of
    integer-quantized partial squared distances (tiny, broadcast); ADC
    distance is an equi-join on (m, code) + one integer groupBy sum —
    every stage a hash join or partial-aggregated shuffle on small keys.
    Asymmetric: queries stay full-precision, only the corpus is coded.

    Rows-only (iterative codebook training is not SQL-expressible);
    recall vs ``cosine_topk_bruteforce``, ADC-vs-NumPy exactness, and
    layout determinism are pinned in tests. On normalized vectors
    squared L2 ranks identically to cosine (‖a−b‖² = 2 − 2cos), so the
    output is directly recall-comparable to the brute-force twin.
    """
    spark = embeddings.sparkSession
    out_schema = (
        "query_id bigint, neighbor_id bigint, adc_dist double, rk int"
    )
    fitted = _pq_sample_books(embeddings, sample_cap, m_sub, k_codes)
    if fitted is None:
        return spark.createDataFrame([], out_schema)
    sids, smat, books, dsub = fitted
    codes = _pq_encode_codes(embeddings, books, m_sub, dsub)
    lut_rows = _pq_query_lut_rows(
        [
            (int(qid), qv)
            for qid, qv in zip(sids, smat)
            if qid < n_queries
        ],
        books,
        m_sub,
        dsub,
        k_codes,
    )
    if not lut_rows:
        return spark.createDataFrame([], out_schema)
    lut = local_df(
        spark, lut_rows, "query_id bigint, m int, code int, pd_int bigint"
    )
    return _pq_adc_topk(codes, lut, k)


def _pq_sample_books(
    embeddings: DataFrame, sample_cap: int, m_sub: int, k_codes: int
):
    """Deterministic driver sample + per-subspace codebooks: returns
    (sids, smat, books, dsub), or None on an empty/zero-norm corpus.
    Shared by the in-memory search and the persisted index builder so
    both train bit-identical codebooks."""
    sample = sorted(
        embeddings.select("vec_id", "embedding")
        .filter(F.col("vec_id") < sample_cap)
        .collect(),
        key=lambda r: r.vec_id,
    )
    if not sample:
        return None
    smat = np.array([r.embedding for r in sample], dtype=np.float64)
    norms = np.linalg.norm(smat, axis=1, keepdims=True)
    keep = norms[:, 0] > 0
    smat = smat[keep] / norms[keep]
    sids = [r.vec_id for r, kp in zip(sample, keep) if kp]
    if not len(sids):
        return None
    dim = smat.shape[1]
    assert dim % m_sub == 0, "dim must be divisible by the subspace count"
    dsub = dim // m_sub
    return sids, smat, pq_train_books(smat, m_sub, k_codes), dsub


def _pq_encode_codes(
    embeddings: DataFrame, books: np.ndarray, m_sub: int, dsub: int
) -> DataFrame:
    """Distributed encode: codes in LONG form (vec_id, m, code) — the
    only corpus-scale table downstream, 8-byte rows, no float columns."""
    from ..sources.tables import fan_out

    B = books

    def encode(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            block = np.array(list(pdf["embedding"]), dtype=np.float64)
            bn = np.linalg.norm(block, axis=1, keepdims=True)
            ok = bn[:, 0] > 0
            block, vids = block[ok] / bn[ok], pdf["vec_id"].to_numpy()[ok]
            if not len(block):
                continue
            outs = []
            for m in range(m_sub):
                sub = block[:, m * dsub : (m + 1) * dsub]
                d2 = (
                    (sub[:, None, :] - B[m][None, :, :]) ** 2
                ).sum(axis=2)
                outs.append(
                    pd.DataFrame(
                        {
                            "vec_id": vids,
                            "m": m,
                            "code": np.argmin(d2, axis=1).astype("int32"),
                        }
                    )
                )
            yield pd.concat(outs, ignore_index=True)

    return fan_out(embeddings.select("vec_id", "embedding")).mapInPandas(
        encode, schema="vec_id bigint, m int, code int"
    )


def _pq_query_lut_rows(
    queries: list[tuple[int, np.ndarray]],
    books: np.ndarray,
    m_sub: int,
    dsub: int,
    k_codes: int,
) -> list[tuple[int, int, int, int]]:
    """Per-query integer LUTs (n_queries × M × K rows — tiny, broadcast):
    each entry is the integer-quantized partial squared distance from the
    query's m-th subvector to codebook entry (m, c)."""
    lut_rows = []
    for qid, qv in queries:
        for m in range(m_sub):
            qs = qv[m * dsub : (m + 1) * dsub]
            d2 = ((books[m] - qs[None, :]) ** 2).sum(axis=1)
            for c in range(k_codes):
                lut_rows.append(
                    (int(qid), m, c, int(round(d2[c] * PQ_QUANT)))
                )
    return lut_rows


def _pq_adc_topk(codes: DataFrame, lut: DataFrame, k: int) -> DataFrame:
    """ADC ranking tail: (m, code) equi-join + integer groupBy sum +
    per-query top-k window — layout-invariant (micro-unit integers,
    vec_id tie-break)."""
    adc = (
        codes.join(F.broadcast(lut), ["m", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("pd_int").alias("adc_int"))
    )
    w = Window.partitionBy("query_id").orderBy("adc_int", "vec_id")
    return (
        adc.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(F.col("adc_int") / PQ_QUANT, 6).alias("adc_dist"),
            "rk",
        )
    )


def pq_train_books(
    train: np.ndarray, m_sub: int = PQ_M, k_codes: int = PQ_K
) -> np.ndarray:
    """(M, K, dim/M) per-subspace PQ codebooks: FFT seed + Lloyd on the
    caller's training matrix (plain L2 k-means per subspace —
    deterministic: caller passes sorted rows, fixed iterations, empty
    cells keep their previous centroid, argmin ties → lowest code)."""
    from .kcenter import sequential_fft

    dim = train.shape[1]
    dsub = dim // m_sub
    books = np.zeros((m_sub, k_codes, dsub))
    for m in range(m_sub):
        sub = train[:, m * dsub : (m + 1) * dsub]
        cb = sequential_fft(sub, min(k_codes, len(sub)))
        if len(cb) < k_codes:  # tiny corpus: pad by repeating the seed
            cb = np.vstack([cb] * (k_codes // len(cb) + 1))[:k_codes]
        cb = cb.copy()
        for _ in range(PQ_LLOYD):
            d2 = ((sub[:, None, :] - cb[None, :, :]) ** 2).sum(axis=2)
            a = np.argmin(d2, axis=1)  # ties -> lowest code
            for c in range(k_codes):
                members = sub[a == c]
                if len(members):
                    cb[c] = members.mean(axis=0)
        books[m] = cb
    return books


# ---------------------------------------------------------------------------
# Persisted PQ index: build once, query many (the ANN serving shape)
# ---------------------------------------------------------------------------


def pq_index_build(
    embeddings: DataFrame,
    path: str,
    m_sub: int = PQ_M,
    k_codes: int = PQ_K,
    sample_cap: int = 2048,
) -> dict:
    """Build and PERSIST a PQ index under ``path``: the corpus-scale
    encode pass (the expensive part — one full scan of the float
    vectors) runs ONCE and lands as a parquet codes table
    (vec_id, m, code — 64-bit-code rows, no floats), next to the tiny
    codebook table (m, code, vec). Every later query session reads only
    the codes table; the floats are never touched again — the
    build-once/query-many serving shape the in-memory ``ann_pq_topk``
    (whose codebook recipe this shares, bit-identically) cannot offer.

    Returns build metadata {n_vectors, m_sub, k_codes, dsub}.
    """
    fitted = _pq_sample_books(embeddings, sample_cap, m_sub, k_codes)
    if fitted is None:
        raise ValueError("pq_index_build: empty or all-zero-norm corpus")
    _, _, books, dsub = fitted
    spark = embeddings.sparkSession
    book_rows = [
        (m, c, [float(x) for x in books[m][c]])
        for m in range(m_sub)
        for c in range(k_codes)
    ]
    local_df(
        spark, book_rows, "m int, code int, vec array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/codebooks.parquet")
    codes = _pq_encode_codes(embeddings, books, m_sub, dsub)
    codes.write.mode("overwrite").parquet(f"{path}/codes.parquet")
    n_codes = spark.read.parquet(f"{path}/codes.parquet").count()
    return {
        "n_vectors": n_codes // m_sub,
        "m_sub": m_sub,
        "k_codes": k_codes,
        "dsub": dsub,
    }


def pq_index_topk(
    spark: SparkSession,
    path: str,
    queries: list[tuple[int, list[float]]],
    k: int = 10,
) -> DataFrame:
    """Query a persisted PQ index: ``queries`` is a bounded driver-side
    list of (query_id, raw vector) — per-request data, not corpus data.
    Codebooks load to the driver (M·K rows), per-query integer LUTs
    broadcast, and the search is the same (m, code) equi-join + integer
    sum + top-k window as the in-memory path — over the CODES table
    only. Zero-norm query vectors are excluded (cosine undefined).
    Results are bit-equal to ``ann_pq_topk`` for the same corpus and
    query vectors (pinned in tests): parquet round-trips the integer
    codes exactly and the LUT/ranking arithmetic is shared."""
    brows = sorted(
        spark.read.parquet(f"{path}/codebooks.parquet").collect(),
        key=lambda r: (r.m, r.code),
    )
    m_sub = 1 + max(r.m for r in brows)
    k_codes = 1 + max(r.code for r in brows)
    dsub = len(brows[0].vec)
    books = np.zeros((m_sub, k_codes, dsub))
    for r in brows:
        books[r.m][r.code] = r.vec
    qlist = []
    for qid, vec in queries:
        qv = np.asarray(vec, dtype=np.float64)
        nv = np.linalg.norm(qv)
        if nv > 0:
            qlist.append((int(qid), qv / nv))
    out_schema = (
        "query_id bigint, neighbor_id bigint, adc_dist double, rk int"
    )
    lut_rows = _pq_query_lut_rows(qlist, books, m_sub, dsub, k_codes)
    if not lut_rows:
        return spark.createDataFrame([], out_schema)
    lut = spark.createDataFrame(
        lut_rows, "query_id bigint, m int, code int, pd_int bigint"
    )
    codes = spark.read.parquet(f"{path}/codes.parquet")
    return _pq_adc_topk(codes, lut, k)


def pq_index_roundtrip_profile(
    spark: SparkSession,
    sf_dir: str,
    work_dir: str | None = None,
    n_queries: int = 5,
    k: int = 10,
) -> DataFrame:
    """One-row profile proving the persisted-index path is lossless:
    build the index from the fixture embeddings into a per-invocation
    temp dir, query it with the same first-``n_queries`` vectors the
    in-memory path uses, and count exact row agreement against
    ``ann_pq_topk`` — (n_vectors, n_code_rows, topk_rows, n_agree).
    ``n_agree == topk_rows`` certifies build→parquet→query ≡ in-memory
    end to end. Rows-only registry surface (iterative training)."""
    import tempfile

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = work_dir or tempfile.mkdtemp(prefix="pq_index_")
    meta = pq_index_build(emb, out)
    queries = [
        (r.vec_id, list(r.embedding))
        for r in emb.filter(F.col("vec_id") < n_queries)
        .select("vec_id", "embedding")
        .collect()
    ]
    idx = {
        tuple(r)
        for r in pq_index_topk(spark, out, queries, k=k).collect()
    }
    mem = {
        tuple(r)
        for r in ann_pq_topk(emb, n_queries=n_queries, k=k).collect()
    }
    return spark.createDataFrame(
        [
            (
                meta["n_vectors"],
                meta["n_vectors"] * meta["m_sub"],
                len(mem),
                len(idx & mem),
            )
        ],
        "n_vectors bigint, n_code_rows bigint, topk_rows bigint, "
        "n_agree bigint",
    )


# ---------------------------------------------------------------------------
# IVFPQ: coarse inverted lists + residual product quantization
# ---------------------------------------------------------------------------


def ann_ivfpq_topk(
    embeddings: DataFrame,
    n_queries: int = 5,
    k: int = 10,
    nlist: int | None = None,
    nprobe: int | None = None,
    m_sub: int = PQ_M,
    k_codes: int = PQ_K,
    sample_cap: int = 2048,
) -> DataFrame:
    """(query_id, neighbor_id, adc_dist, rk): the full published ANN
    stack (Jégou et al. TPAMI 2011, §IV — IVFADC): the IVF coarse
    quantizer bounds WORK (each query scans ~nprobe/nlist of the corpus)
    and PQ bounds MEMORY (the probed candidates are ranked from 64-bit
    RESIDUAL codes, never from raw floats).

    Construction: coarse centroids = the ann_ivf_topk codebook recipe
    (FFT seed + spherical Lloyd on the deterministic driver sample); PQ
    codebooks train on the sample's coarse RESIDUALS pooled across lists
    (the published default). Corpus pass: ONE broadcast-codebook
    ``mapInPandas`` emitting (vec_id, cid, m, code) — the corpus floats
    are read once and never shuffled. Query side: each query's nprobe
    nearest lists define a per-(query, list) LUT over residual space —
    n_queries × nprobe × M × K integer-quantized entries, broadcast; the
    probe restriction lives IN the LUT, so the search is one (cid, m,
    code) equi-join + one INTEGER groupBy sum + a top-k window. Layout-
    invariant ranking for the same reason as ``ann_pq_topk``
    (micro-unit integers, hash-free tie-break on vec_id).

    Rows-only (iterative training); recall vs brute force, probed-list
    containment, ADC ≡ NumPy reimplementation, and layout determinism
    are pinned in tests.
    """
    from .kcenter import sequential_fft
    from ..sources.tables import fan_out

    spark = embeddings.sparkSession
    out_schema = (
        "query_id bigint, neighbor_id bigint, adc_dist double, rk int"
    )
    sample = sorted(
        embeddings.select("vec_id", "embedding")
        .filter(F.col("vec_id") < sample_cap)
        .collect(),
        key=lambda r: r.vec_id,
    )
    if not sample:
        return spark.createDataFrame([], out_schema)
    smat = np.array([r.embedding for r in sample], dtype=np.float64)
    norms = np.linalg.norm(smat, axis=1, keepdims=True)
    keep = norms[:, 0] > 0
    smat = smat[keep] / norms[keep]
    sids = [r.vec_id for r, kp in zip(sample, keep) if kp]
    dim = smat.shape[1]
    assert dim % m_sub == 0, "dim must be divisible by the subspace count"
    dsub = dim // m_sub

    if nlist is None:
        n_corpus = embeddings.count()
        nlist = int(min(max(16, round(n_corpus**0.5)), sample_cap // 8))
    if nprobe is None:
        nprobe = max(2, nlist // 4)
    nprobe = min(nprobe, nlist)

    # coarse quantizer: the ann_ivf_topk recipe verbatim
    coarse = sequential_fft(smat, min(nlist, len(smat)))
    nlist = len(coarse)
    nprobe = min(nprobe, nlist)
    coarse = coarse / np.linalg.norm(coarse, axis=1, keepdims=True)
    for _ in range(10):
        assign_s = np.argmax(smat @ coarse.T, axis=1)
        for c in range(nlist):
            members = smat[assign_s == c]
            if len(members):
                coarse[c] = members.mean(axis=0)
        coarse /= np.linalg.norm(coarse, axis=1, keepdims=True)

    # PQ codebooks on the sample's coarse residuals (pooled across lists)
    assign_s = np.argmax(smat @ coarse.T, axis=1)
    books = pq_train_books(smat - coarse[assign_s], m_sub, k_codes)

    C, B = coarse, books

    def encode(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            block = np.array(list(pdf["embedding"]), dtype=np.float64)
            bn = np.linalg.norm(block, axis=1, keepdims=True)
            ok = bn[:, 0] > 0
            block, vids = block[ok] / bn[ok], pdf["vec_id"].to_numpy()[ok]
            if not len(block):
                continue
            cid = np.argmax(block @ C.T, axis=1)
            resid = block - C[cid]
            outs = []
            for m in range(m_sub):
                sub = resid[:, m * dsub : (m + 1) * dsub]
                d2 = ((sub[:, None, :] - B[m][None, :, :]) ** 2).sum(axis=2)
                outs.append(
                    pd.DataFrame(
                        {
                            "vec_id": vids,
                            "cid": cid.astype("int32"),
                            "m": m,
                            "code": np.argmin(d2, axis=1).astype("int32"),
                        }
                    )
                )
            yield pd.concat(outs, ignore_index=True)

    codes = fan_out(embeddings.select("vec_id", "embedding")).mapInPandas(
        encode, schema="vec_id bigint, cid int, m int, code int"
    )

    # per-(query, probed-list) integer LUTs over residual space
    lut_rows = []
    for qid, qv in zip(sids, smat):
        if qid >= n_queries:
            continue
        probes = np.argsort(-(C @ qv))[:nprobe]
        for cid in probes:
            qr = qv - C[cid]
            for m in range(m_sub):
                qs = qr[m * dsub : (m + 1) * dsub]
                d2 = ((B[m] - qs[None, :]) ** 2).sum(axis=1)
                for c in range(k_codes):
                    lut_rows.append(
                        (
                            int(qid),
                            int(cid),
                            m,
                            c,
                            int(round(d2[c] * PQ_QUANT)),
                        )
                    )
    if not lut_rows:
        return spark.createDataFrame([], out_schema)
    lut = local_df(
        spark, lut_rows, "query_id bigint, cid int, m int, code int, pd_int bigint"
    )
    adc = (
        codes.join(F.broadcast(lut), ["cid", "m", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("pd_int").alias("adc_int"))
    )
    w = Window.partitionBy("query_id").orderBy("adc_int", "vec_id")
    return (
        adc.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(F.col("adc_int") / PQ_QUANT, 6).alias("adc_dist"),
            "rk",
        )
    )


def _exact_rerank(
    embeddings: DataFrame,
    shortlist: DataFrame,
    n_queries: int,
    k: int,
) -> DataFrame:
    """Shared +R tail (Jégou, Douze & Schmid, TPAMI 2011 §V, IVFADC+R):
    re-rank a compressed-domain shortlist with EXACT distances.

    The shortlist (top ~rerank_factor·k per query by ADC) is bounded by
    PARAMETERS — n_queries × factor·k rows, never corpus-sized — so it
    collects, and the float vectors for exactly those candidates (the
    query vectors ride along in the same id set) are recovered by ONE
    ``In(...)``-pushed-down pruned read of the column-pruned
    (vec_id, embedding) corpus. At 100 TB that reads the row groups
    holding a few hundred vectors instead of scanning the whole table
    to broadcast-join it — the same In-pushdown candidate-fetch
    precedent as ``coverage_select_topk_lazy``; at bench scale it also
    drops the mapInPandas tail whose Python-worker startup dominated
    the leg (r12 watchlist close-out). The rerank itself is one NumPy
    matmul over the bounded shortlist on the driver (the sanctioned
    bounded-collect pattern: MMR, greedy selection). Exact squared L2
    on normalized vectors (= 2 − 2·cos, rank-identical to cosine) is
    integer-quantized to micro-units like the ADC sums and the display
    division stays a Spark ``F.round`` so the output is bit-identical
    to the pre-r13 distributed tail, with the same (dist, vec_id) tie
    order as every ANN variant here. ``n_queries`` is retained for API
    symmetry with the ADC legs; the shortlist's query ids are
    authoritative.
    """
    spark = embeddings.sparkSession
    out_schema = (
        "query_id bigint, neighbor_id bigint, exact_dist double, rk int"
    )
    pairs = [
        (int(r.query_id), int(r.neighbor_id))
        for r in shortlist.select("query_id", "neighbor_id").collect()
    ]
    if not pairs:
        return spark.createDataFrame([], out_schema)
    need = sorted({q for q, _ in pairs} | {v for _, v in pairs})
    vrows = (
        embeddings.select("vec_id", "embedding")
        .filter(F.col("vec_id").isin(need))
        .collect()
    )
    vecs = {}
    for r in vrows:
        v = np.asarray(r.embedding, dtype=np.float64)
        n = np.linalg.norm(v)
        if n > 0:  # encode() excludes these; guard anyway
            vecs[int(r.vec_id)] = v / n
    by_q: dict[int, set[int]] = {}
    for qid, vid in pairs:
        by_q.setdefault(qid, set()).add(vid)
    out_rows = []
    for qid in sorted(by_q):
        qv = vecs.get(qid)
        if qv is None:
            continue
        cands = sorted(v for v in by_q[qid] if v in vecs)
        if not cands:
            continue
        mat = np.stack([vecs[v] for v in cands])
        d2 = 2.0 - 2.0 * (mat @ qv)
        d2i = np.rint(np.maximum(d2, 0.0) * PQ_QUANT).astype(np.int64)
        top = sorted(zip(d2i.tolist(), cands))[:k]
        for rk, (di, vid) in enumerate(top, start=1):
            out_rows.append((qid, vid, di, rk))
    if not out_rows:
        return spark.createDataFrame([], out_schema)
    return local_df(
        spark, out_rows, "query_id bigint, vec_id bigint, d2_int bigint, rk int"
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(F.col("d2_int") / PQ_QUANT, 6).alias("exact_dist"),
        "rk",
    )


def ann_pq_rerank_topk(
    embeddings: DataFrame,
    n_queries: int = 5,
    k: int = 10,
    rerank_factor: int = 10,
    **kw,
) -> DataFrame:
    """(query_id, neighbor_id, exact_dist, rk): PQ-ADC search completed
    with exact re-ranking — the ADC pass cheaply ranks the WHOLE corpus
    from 64-bit codes, the top rerank_factor·k shortlist is re-scored
    with exact distances (see ``_exact_rerank``), and recall@k is then
    bounded only by ADC's recall@(rerank_factor·k), which is far higher
    than its recall@k (the published +R observation)."""
    short = ann_pq_topk(embeddings, n_queries, k * rerank_factor, **kw)
    return _exact_rerank(embeddings, short, n_queries, k)


def ann_ivfpq_rerank_topk(
    embeddings: DataFrame,
    n_queries: int = 5,
    k: int = 10,
    rerank_factor: int = 10,
    **kw,
) -> DataFrame:
    """(query_id, neighbor_id, exact_dist, rk): the full IVFADC+R stack
    — IVF bounds work (probe ~nprobe/nlist of the corpus), PQ bounds
    memory (64-bit residual codes), and the +R pass re-ranks the ADC
    shortlist with exact distances so quantization error stops costing
    recall. Residual recall is capped by list coverage: a true neighbor
    in an unprobed list is unrecoverable at any rerank_factor, so
    accuracy-critical deployments raise ``nprobe`` (the published knob)
    together with the rerank factor."""
    short = ann_ivfpq_topk(embeddings, n_queries, k * rerank_factor, **kw)
    return _exact_rerank(embeddings, short, n_queries, k)


# ---------------------------------------------------------------------------
# Semantic decontamination (embedding-space eval overlap)
# ---------------------------------------------------------------------------

SEMDECON_TAU = 0.4
# fixture stand-in for the fixed eval set; production passes a real,
# corpus-independent benchmark table. A FIXED-SIZE predicate (not a
# modulus) is load-bearing: eval sets do not grow with the corpus, so
# the broadcast side — and the bipartite flop count per corpus row —
# stays constant as the corpus scales (scale-stress measures this
# linearity; a % k pred would grow both sides and measure an artifact)
SEMDECON_EVAL_PRED = "vec_id < 64"


def semantic_decontamination(
    embeddings: DataFrame,
    tau: float = SEMDECON_TAU,
    eval_pred: str = SEMDECON_EVAL_PRED,
) -> DataFrame:
    """(vec_id, n_eval_hits, max_cosine): corpus vectors whose embedding
    sits within cosine ≥ tau of ANY eval vector — the semantic twin of
    ``dedup.decontamination_check``: the n-gram check catches verbatim
    benchmark copies, this catches the paraphrase/translation-level
    leakage that shares no 8-gram (the documented blind spot of verbatim
    decontamination).

    Pure composition: the bipartite eval×corpus scoring IS
    ``incremental_embedding_pairs`` (eval set broadcast as one
    normalized matrix, one blocked BLAS matmul per corpus partition,
    zero shuffle, recall 1 — exact, so the oracle is an equality), plus
    one per-corpus-doc aggregation. Cost is O(|corpus|·|eval|) flops on
    a pure corpus scan — at 100 TB the eval side stays a fixed few
    thousand rows, so this is a linear pass.
    """
    ev = embeddings.filter(F.expr(eval_pred))
    corpus = embeddings.filter(~F.expr(eval_pred))
    pairs = incremental_embedding_pairs(ev, corpus, tau)
    return (
        pairs.groupBy("corpus_id")
        .agg(
            F.count(F.lit(1)).alias("n_eval_hits"),
            F.max("cosine").alias("max_cosine"),
        )
        .select(
            F.col("corpus_id").alias("vec_id"),
            F.col("n_eval_hits").cast("bigint").alias("n_eval_hits"),
            "max_cosine",
        )
    )


def semantic_decontamination_sql(
    tau: float = SEMDECON_TAU, eval_pred: str = SEMDECON_EVAL_PRED
) -> str:
    """Oracle: the incremental-pairs bipartite score (same zero-norm
    exclusion, same unrounded threshold, same round-4 display) folded
    per corpus vector — max over the ROUNDED cosines exactly as the
    Spark side aggregates the pair table's rounded column."""
    return f"""
WITH p AS ({incremental_embedding_pairs_sql(eval_pred, tau)})
SELECT corpus_id AS vec_id,
       CAST(count(*) AS BIGINT) AS n_eval_hits,
       max(cosine) AS max_cosine
FROM p GROUP BY corpus_id
"""


# ---------------------------------------------------------------------------
# Cluster-balanced sampling (semantic topic balancing)
# ---------------------------------------------------------------------------

BALANCE_FRAC = 0.5


def cluster_balanced_counts(
    embeddings: DataFrame,
    k: int = KMEANS_K,
    frac: float = BALANCE_FRAC,
    iters: int = KMEANS_ITERS,
) -> DataFrame:
    """(cluster, n_vecs, quota, n_kept): realized cluster-balanced
    downsampling — cap every semantic cluster at the SAME quota
    (⌈frac·N/k⌉), so over-represented topics (boilerplate genres, SEO
    farms) stop dominating the training mix while rare topics survive
    whole. The embedding-space complement of the provenance-based
    ``source_mix_weights``: that balances WHERE data came from, this
    balances what it's ABOUT.

    Selection inside a cluster is deterministic and layout-stable: rows
    rank by the salted 64-bit hash of vec_id (ties impossible — the id
    is hashed injectively mod collisions), the same order-by-hash
    contract as the split family, so re-partitioning or growing the
    corpus never flips which of two surviving vectors is kept except
    where the quota boundary genuinely moves.

    Scale shape: ``kmeans_fit`` scans (no shuffle), assignment is one
    broadcast-centroid map, and the quota rank is ONE shuffle keyed by
    cluster id. Rows-only (iterative k-means); quota arithmetic,
    keep-all-below-quota, determinism, and conservation are pinned in
    tests.
    """
    from ..functions.hashing import md5_hash64
    from ..session import finalize_release, persist_scoped
    from ..sources.tables import fan_out

    spark = embeddings.sparkSession
    out_schema = "cluster int, n_vecs bigint, quota bigint, n_kept bigint"
    # ONE persisted projection for the whole pipeline: FFT sample, every
    # Lloyd iteration, the corpus count AND the assignment pass (guide
    # §5; r13 VERDICT item 4) — before, each was its own parquet scan
    # (iters + 3 scans per run, the family's measured wall).
    corpus, release = persist_scoped(
        fan_out(embeddings.select("vec_id", "embedding")),
        StorageLevel.MEMORY_AND_DISK,
    )
    centers = kmeans_fit(embeddings, k=k, iters=iters, corpus=corpus)
    if centers.size == 0:
        release()
        return spark.createDataFrame([], out_schema)
    n_total = corpus.count()
    k_eff = len(centers)
    quota = -(-int(n_total * frac) // k_eff)  # ceil

    def assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            block = np.array(list(pdf["embedding"]), dtype=np.float64)
            norms = np.linalg.norm(block, axis=1, keepdims=True)
            ok = norms[:, 0] > 0
            if not ok.any():
                continue
            block = block[ok] / norms[ok]
            out = pdf.loc[ok, ["vec_id"]].copy()
            out["cluster"] = np.argmax(block @ centers.T, axis=1).astype(
                np.int32
            )
            yield out

    assigned = corpus.mapInPandas(
        assign, schema="vec_id bigint, cluster int"
    )
    w = Window.partitionBy("cluster").orderBy(
        md5_hash64(F.concat(F.lit("balance|"), F.col("vec_id").cast("string"))),
        "vec_id",
    )
    ranked = assigned.withColumn("rk", F.row_number().over(w))
    out = (
        ranked.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum((F.col("rk") <= quota).cast("bigint")).alias("n_kept"),
        )
        .select(
            "cluster",
            F.col("n_vecs").cast("bigint").alias("n_vecs"),
            F.lit(quota).cast("bigint").alias("quota"),
            F.col("n_kept").cast("bigint").alias("n_kept"),
        )
        .orderBy("cluster")
    )
    finalize_release(out, release)
    return out


# ---------------------------------------------------------------------------
# MMR diversified reranking
# ---------------------------------------------------------------------------

MMR_LAMBDA = 0.7
MMR_POOL = 32


def mmr_rerank_topk(
    embeddings: DataFrame,
    n_queries: int = 5,
    k: int = 10,
    pool: int = MMR_POOL,
    lam: float = MMR_LAMBDA,
) -> DataFrame:
    """(query_id, doc_id, relevance, mmr_score, rnk): Maximal Marginal
    Relevance reranking (Carbonell & Goldstein 1998 — public): from each
    query's top-``pool`` cosine candidates, pick ``k`` iteratively by

        argmax_d  lam * sim(q, d) - (1 - lam) * max_{s in S} sim(d, s)

    so every next pick trades relevance against redundancy with the
    already-selected set S — the standard de-duplicating reranker a RAG
    stack runs after retrieval (near-identical chunks waste context).

    Determinism: all similarities are rounded to 6 BEFORE selection and
    ties break by doc_id, so the selection trace is engine- and
    layout-independent. First pick is always the relevance argmax.

    Scale shape: candidate generation is the broadcast-queries corpus
    scan + per-query top-``pool`` window (the knn plan); the selection
    needs pairwise sims WITHIN each pool only — ``n_queries·pool²``
    bounded rows — computed distributed (pool self-join keyed by query)
    and collected as one ``n_queries·pool·(pool+1)`` table; the MMR loop
    itself is O(q·k·pool) driver arithmetic on that bounded table (the
    SequentialFFT driver-step precedent). The corpus never reaches the
    driver.

    Iterative argmax is not SQL-expressible — rows-only registry entry
    (property- and hand-case-tested like the other iterative ops).
    """
    spark = embeddings.sparkSession
    emb = embeddings.select(
        "vec_id", _as_double(F.col("embedding")).alias("v")
    ).filter(_dot(F.col("v"), F.col("v")) > 0)
    queries = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    scored = (
        emb.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("doc_id"),
            F.round(_cosine(F.col("qv"), F.col("v")), 6).alias("rel"),
            "v",
        )
    )
    wp = Window.partitionBy("query_id").orderBy(
        F.col("rel").desc(), F.col("doc_id").asc()
    )
    cands = (
        scored.withColumn("rk", F.row_number().over(wp))
        .filter(F.col("rk") <= pool)
        .select("query_id", "doc_id", "rel", "v")
        .localCheckpoint()
    )
    # pairwise sims within each pool: n_queries * pool^2 rows, bounded
    a = cands.select("query_id", F.col("doc_id").alias("da"), F.col("v").alias("va"))
    b = cands.select("query_id", F.col("doc_id").alias("db"), F.col("v").alias("vb"))
    pair_rows = (
        a.join(b, "query_id")
        .filter(F.col("da") < F.col("db"))
        .select(
            "query_id",
            "da",
            "db",
            F.round(_cosine(F.col("va"), F.col("vb")), 6).alias("s"),
        )
        .collect()
    )
    rel_rows = cands.select("query_id", "doc_id", "rel").collect()

    sims: dict[tuple[int, int, int], float] = {}
    for r in pair_rows:
        sims[(int(r.query_id), int(r.da), int(r.db))] = float(r.s)

    def sim(q: int, x: int, y: int) -> float:
        if x == y:
            return 1.0
        key = (q, min(x, y), max(x, y))
        return sims.get(key, 0.0)

    rels: dict[int, dict[int, float]] = {}
    for r in rel_rows:
        rels.setdefault(int(r.query_id), {})[int(r.doc_id)] = float(r.rel)

    out = []
    for q, pool_rels in sorted(rels.items()):
        selected: list[int] = []
        remaining = dict(pool_rels)
        for i in range(1, min(k, len(pool_rels)) + 1):
            best = None
            for d, rel in remaining.items():
                red = max(
                    (sim(q, d, s) for s in selected), default=0.0
                )
                score = round(lam * rel - (1.0 - lam) * red, 6)
                cand = (-score, d)
                if best is None or cand < best:
                    best = cand
                    best_score, best_doc, best_rel = score, d, rel
            selected.append(best_doc)
            del remaining[best_doc]
            out.append((q, best_doc, best_rel, best_score, i))
    return local_df(
        spark, out,
        "query_id bigint, doc_id bigint, relevance double, "
        "mmr_score double, rnk int",
    )
