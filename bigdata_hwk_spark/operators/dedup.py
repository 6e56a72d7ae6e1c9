"""Document deduplication operators for large-scale training-data pipelines.

Not present in the reference (SURVEY.md §2.11 north-star extensions) —
these are the dedup family a 100 TB corpus pipeline needs, built
Spark-first over the ``documents`` fixture table:

* **exact** — hash-groupBy on content (one shuffle on a 64-bit key);
* **n-gram Jaccard** — exact near-dup pairs via a distributed inverted
  index on word-3-gram shingles (explode → equi-join on shingle →
  per-pair common counts → Jaccard). No O(N²) anywhere: only documents
  sharing ≥1 shingle ever meet in the join.
* **MinHash + LSH** — H minhashes per doc from ONE md5 per shingle plus
  H universal-hash derivations (a·h+b mod 2³¹−1), banded into B bands of
  R rows; docs equi-join on an 8-byte hashed band key so only LSH
  candidates are generated, then candidates are *verified* with the
  exact shingle Jaccard. This is the scale path: candidate generation is
  linear in corpus size for fixed collision rate.
* **SimHash** — 60-bit fingerprints from word hashes; near-dup iff
  Hamming distance ≤ k. Candidate generation by the pigeonhole band
  trick: split the fingerprint into k+1 chunks — any pair within
  Hamming ≤ k agrees on ≥1 chunk, so a (chunk_id, chunk_value)
  equi-join finds all candidates without a cross join.

All hash arithmetic uses the engine-portable md5 hash (functions/
hashing.py), so every operator here is fully oracle-checkable in DuckDB —
including the LSH banding itself, not just the final pair set.

Scale notes: the shingle inverted index applies a document-frequency cut
on ultra-hot shingles (``shingle_df_cut``) before every candidate join —
they generate quadratic candidates but can't push Jaccard above the
threshold on their own; the banded joins here shuffle on
(band, signature) / (chunk, value) keys whose cardinality grows with the
corpus, so AQE skew splitting handles pathological buckets.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..session import local_df

from ..functions.hashing import md5_hash64, md5_hash64_sql

SHINGLE_W = 3          # words per shingle
MINHASH_H = 16         # hash functions
MINHASH_BANDS = 4      # bands of R = H/B rows
JACCARD_TAU = 0.5      # near-dup threshold
SIMHASH_BITS = 60      # md5_hash64 yields 60 usable bits
SIMHASH_K = 3          # max Hamming distance
SIMHASH_CHUNKS = SIMHASH_K + 1  # pigeonhole: k diffs can't hit all k+1 chunks


# ---------------------------------------------------------------------------
# Shingling (shared by Jaccard + MinHash)
# ---------------------------------------------------------------------------

def doc_shingles(
    documents: DataFrame, w: int = SHINGLE_W, distinct: bool = True
) -> DataFrame:
    """(doc_id, sh) — exploded word-``w``-gram shingles; docs shorter
    than one shingle drop out (same in the oracle). ``distinct=True``
    (the Jaccard family) dedups per doc; ``distinct=False`` keeps the
    multiset for frequency-weighted consumers (TF-IDF cosine).

    The split word array is materialized into its own projection before the
    shingle transform: referencing the raw ``split(text)`` expression from
    inside the lambda makes Catalyst re-evaluate the split per element
    (O(words²) per doc — measured 2.5× slower end-to-end).

    Short-doc safety (r13 rewrite): Spark's ``sequence(1, n)`` runs
    DESCENDING for n < 1, making ``slice(ws, 0, ...)`` throw
    INVALID_PARAMETER_VALUE.START on any 1–2-word doc, and the row filter
    alone is NOT enough — InferFiltersFromGenerate copies the shingle
    expression into a pushed-down predicate that runs on unfiltered rows
    (reproduced: a single short doc crashed the job through the filter).
    The r12 fix wrapped the array in a CASE WHEN and aliased it through a
    second projection; measured at sf0.1 that made Catalyst materialize
    the transform THREE times (generator + the inferred filter's inlined
    copies — 3.75 s vs 0.34 s for the whole shingle pass, the single
    largest leg of every dedup-family query). Now the POSITION LIST is
    armored instead — ``slice(sequence(1, greatest(n−w+1, 1)), 1,
    greatest(n−w+1, 0))`` is ascending and empty for short docs, so the
    expression is total (never throws wherever the optimizer copies it),
    needs no CASE WHEN, and the explode stays in the SAME projection —
    one evaluation per row (pinned: the executed plan carries exactly one
    ``transform(``). DuckDB's ``generate_series`` is empty for n < 1, so
    short docs yield no rows on both sides. All array-local (no shuffle),
    whole-stage codegen.
    """
    ws_df = documents.select(
        "doc_id", F.split(F.col("text"), " ").alias("ws")
    ).filter(F.size("ws") >= w)
    npos = F.size("ws") - (w - 1)
    positions = F.slice(
        F.sequence(F.lit(1), F.greatest(npos, F.lit(1))),
        1,
        F.greatest(npos, F.lit(0)),
    )
    grams = F.transform(
        positions,
        lambda i: F.array_join(F.slice(F.col("ws"), i, w), " "),
    )
    shingles = F.array_distinct(grams) if distinct else grams
    return ws_df.select("doc_id", F.explode(shingles).alias("sh"))


# Document-frequency cut: shingles appearing in more than this many docs are
# dropped from the inverted index before any pair join. An ultra-hot shingle
# generates O(df²) candidate pairs; a handful of boilerplate shingles can't
# push a pair's Jaccard above the threshold on their own, so cutting them is
# the standard recall-safe-in-practice guard at corpus scale. The default is
# far above any fixture document frequency, so every DuckDB oracle (which
# has no cut) stays exact at test SFs while the plan carries the filter.
SHINGLE_DF_CUT = 100_000


def shingle_df_cut(ex: DataFrame, cut: int = SHINGLE_DF_CUT) -> DataFrame:
    """Drop ultra-hot shingles (document frequency > ``cut``) from the
    inverted index. Implemented as a count-over-window on ``sh`` — one
    shuffle that also co-locates the index by shingle, the very key the
    downstream candidate equi-join needs."""
    w = Window.partitionBy("sh")
    return (
        ex.withColumn("__df", F.count(F.lit(1)).over(w))
        .filter(F.col("__df") <= cut)
        .drop("__df")
    )


def shingles_sql(
    w: int = SHINGLE_W, table: str = "documents", distinct: bool = True
) -> str:
    """DuckDB CTE body producing the identical (doc_id, sh) rows."""
    concat = " || ' ' || ".join(
        f"string_split(text, ' ')[i+{k}]" if k else "string_split(text, ' ')[i]"
        for k in range(w)
    )
    return f"""
SELECT {"DISTINCT " if distinct else ""}doc_id, sh FROM (
  SELECT doc_id,
         unnest(list_transform(
           generate_series(1, len(string_split(text, ' ')) - {w - 1}),
           i -> {concat})) AS sh
  FROM {table})
"""


# ---------------------------------------------------------------------------
# Exact dedup (hash-groupBy)
# ---------------------------------------------------------------------------

def exact_dedup_groups(documents: DataFrame) -> DataFrame:
    """Content-identical groups: (canonical_id, n_copies) per distinct text,
    keyed by a 64-bit content hash so the shuffle key is 8 bytes, not the
    document body. Groups with n_copies > 1 are duplicates to drop."""
    return (
        documents.select("doc_id", md5_hash64(F.col("text")).alias("h"))
        .groupBy("h")
        .agg(
            F.min("doc_id").alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select("canonical_id", "n_copies")
    )


EXACT_DEDUP_SQL = f"""
SELECT min(doc_id) AS canonical_id, count(*) AS n_copies
FROM (SELECT doc_id, {md5_hash64_sql('text')} AS h FROM documents)
GROUP BY h
"""


def exact_dedup_summary(documents: DataFrame) -> DataFrame:
    """One row: total docs, distinct contents, duplicates removable."""
    g = exact_dedup_groups(documents)
    return g.agg(
        F.sum("n_copies").alias("n_docs"),
        F.count(F.lit(1)).alias("n_distinct"),
        (F.sum("n_copies") - F.count(F.lit(1))).alias("n_duplicates"),
    )


EXACT_DEDUP_SUMMARY_SQL = f"""
WITH g AS ({EXACT_DEDUP_SQL})
SELECT CAST(sum(n_copies) AS BIGINT) AS n_docs,
       count(*) AS n_distinct,
       CAST(sum(n_copies) - count(*) AS BIGINT) AS n_duplicates
FROM g
"""


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard near-dup pairs (inverted-index join)
# ---------------------------------------------------------------------------

def _pair_jaccard(ex: DataFrame) -> DataFrame:
    """(doc_a, doc_b, jaccard) for every pair sharing ≥1 shingle."""
    sizes = ex.groupBy("doc_id").agg(F.count(F.lit(1)).alias("nsh"))
    a = ex.alias("a")
    b = ex.alias("b")
    common = (
        a.join(b, "sh")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("nsh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("nsh").alias("nb"))
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("common")
                / (F.col("na") + F.col("nb") - F.col("common"))
            ).alias("jaccard"),
        )
    )


def _shingle_index(
    documents: DataFrame, cut: int = SHINGLE_DF_CUT
) -> tuple[DataFrame, DataFrame | None]:
    """(cut_table, verify_table) for candidate generation / verification.

    ``cut_table`` (persisted) is the hot-shingle-cut inverted index — its
    window shuffle co-locates rows by shingle, exactly the partitioning
    every downstream candidate equi-join wants, so self-joins on it are
    exchange-free. ``verify_table`` is None when the cut dropped ZERO
    rows (probed with two counts on persisted data): then the cut table
    IS the full table and verification on it is provably exact — the
    common case, and every fixture SF. When the cut is active,
    ``verify_table`` is the persisted UNCUT table so reported Jaccard is
    true full-set Jaccard, not truncated-set Jaccard (round-2 ADVICE) —
    the honest 2× cost is paid only when hot shingles actually exist.
    """
    sh_all = doc_shingles(documents).persist(StorageLevel.MEMORY_AND_DISK)
    ex_cut = shingle_df_cut(sh_all, cut).persist(StorageLevel.MEMORY_AND_DISK)
    if ex_cut.count() == sh_all.count():
        # ex_cut is materialized; the raw table's cache is no longer needed
        sh_all.unpersist()
        return ex_cut, None
    return ex_cut, sh_all


def ngram_jaccard_pairs(
    documents: DataFrame,
    tau: float = JACCARD_TAU,
    cut: int = SHINGLE_DF_CUT,
    index: tuple[DataFrame, DataFrame | None] | None = None,
) -> DataFrame:
    """Near-dup pairs with shingle-set Jaccard ≥ tau (rounded to 6).

    Cut/verify separation (round-2 ADVICE): the hot-shingle DF cut is a
    *candidate-generation* device — candidate pairs come from the cut
    inverted index (bounded fan-out at scale) — but the Jaccard that
    decides and is reported is computed over the FULL shingle sets. When
    the cut is a no-op (``_shingle_index`` probes this), the single
    inverted-index join is already exact and runs exchange-free on the
    shingle-partitioned persisted table; only an active cut pays the
    two-phase candidates→uncut-verify cost.

    ``index`` injects a precomputed ``_shingle_index`` result — the
    registry builds ONE persisted shingle table per (session, corpus)
    and shares it between the Jaccard and MinHash families (each call
    otherwise re-shingles and re-persists the corpus)."""
    ex_cut, sh_all = index if index is not None else _shingle_index(documents, cut)
    if sh_all is None:
        return (
            _pair_jaccard(ex_cut)
            .filter(F.col("jaccard") >= tau)
            .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
        )
    a = ex_cut.alias("a")
    b = ex_cut.alias("b")
    cand = (
        a.join(b, "sh")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    return (
        _verify_candidates(sh_all, cand, tau)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )


def _verify_candidates(
    verify_ex: DataFrame, cand: DataFrame, tau: float
) -> DataFrame:
    """Exact-Jaccard verification of candidate (doc_a, doc_b) pairs
    against ``verify_ex`` (the full shingle table, or the cut table when
    the cut is a proven no-op): restrict the index to candidate docs
    (left-semi, no row widening), compute full-set pair Jaccard there,
    keep candidates meeting tau. Shared by the inverted-index and LSH
    candidate generators.

    ``cand`` is persisted here — it has three consumers (both sides of
    the doc union + the final pair join); unpersisted, each replans the
    full candidate-generation pipeline from scratch (measured 3× wall on
    the inverted-index path)."""
    from ..session import persist_once

    cand = persist_once(cand, StorageLevel.MEMORY_AND_DISK)
    cand_docs = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .union(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    # no broadcast hint: AQE auto-broadcasts when the candidate set is
    # small, falls back to a shuffled semi-join when it isn't
    ex = verify_ex.join(cand_docs, "doc_id", "left_semi")
    jac = _pair_jaccard(ex)
    return cand.join(jac, ["doc_a", "doc_b"]).filter(F.col("jaccard") >= tau)


def _pair_jaccard_sql() -> str:
    return f"""
ex AS ({shingles_sql()}),
sizes AS (SELECT doc_id, count(*) AS nsh FROM ex GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
  FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id),
jac AS (
  SELECT doc_a, doc_b,
         common::DOUBLE / (sa.nsh + sb.nsh - common) AS jaccard
  FROM common
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b)
"""


# ---------------------------------------------------------------------------
# Asymmetric shingle containment (quote / subset detection)
# ---------------------------------------------------------------------------

# Jaccard misses the "document A is a fragment of document B" case: a
# short quote inside a long page has tiny Jaccard but containment ≈ 1.
# Containment C(A→B) = |sh(A) ∩ sh(B)| / |sh(A)| is the standard
# asymmetric complement (Broder's resemblance/containment pair, 1997,
# public). tau sits in the fixtures' measured bimodal gap (planted
# near-dups ≥ 0.9, background < 0.3 at sf0.01 — margin ≥ 0.3 either
# side of 0.6).
CONTAINMENT_TAU = 0.6


def _pair_containment(ex: DataFrame) -> DataFrame:
    """(src_doc, dst_doc, containment) for every ORDERED pair sharing
    ≥ 1 shingle: the share of src's distinct shingles present in dst.
    One undirected common-count join emits both directions (no second
    self-join)."""
    sizes = ex.groupBy("doc_id").agg(F.count(F.lit(1)).alias("nsh"))
    a = ex.alias("a")
    b = ex.alias("b")
    common = (
        a.join(b, "sh")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("nsh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("nsh").alias("nb"))
    both = common.join(sa, "doc_a").join(sb, "doc_b")
    fwd = both.select(
        F.col("doc_a").alias("src_doc"),
        F.col("doc_b").alias("dst_doc"),
        (F.col("common") / F.col("na")).alias("containment"),
    )
    rev = both.select(
        F.col("doc_b").alias("src_doc"),
        F.col("doc_a").alias("dst_doc"),
        (F.col("common") / F.col("nb")).alias("containment"),
    )
    return fwd.union(rev)


def containment_pairs(
    documents: DataFrame,
    tau: float = CONTAINMENT_TAU,
    cut: int = SHINGLE_DF_CUT,
    index: tuple[DataFrame, DataFrame | None] | None = None,
) -> DataFrame:
    """Directed near-containment pairs: C(src→dst) ≥ tau, rounded to 6.

    Same cut/verify split as ``ngram_jaccard_pairs`` (and the same shared
    persisted shingle ``index``): candidates come from the hot-shingle-cut
    inverted index, the containment that decides is computed over FULL
    shingle sets. A containment filter can only widen under the cut
    (the denominator |sh(src)| shrinks), so cut-phase pruning at tau is
    NOT lossless for containment the way the prefix filter is for
    Jaccard — hence candidates are every co-shingled pair and tau is
    applied only at verify time, on full sets.
    """
    ex_cut, sh_all = index if index is not None else _shingle_index(documents, cut)
    if sh_all is None:
        return (
            _pair_containment(ex_cut)
            .filter(F.col("containment") >= tau)
            .select(
                "src_doc", "dst_doc",
                F.round("containment", 6).alias("containment"),
            )
        )
    a = ex_cut.alias("a")
    b = ex_cut.alias("b")
    cand = (
        a.join(b, "sh")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    from ..session import persist_once

    cand = persist_once(cand, StorageLevel.MEMORY_AND_DISK)
    cand_docs = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .union(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    ex = sh_all.join(cand_docs, "doc_id", "left_semi")
    return (
        _pair_containment(ex)
        .join(
            cand.select("doc_a", "doc_b")
            .union(cand.select(F.col("doc_b"), F.col("doc_a")))
            .toDF("src_doc", "dst_doc"),
            ["src_doc", "dst_doc"],
            "left_semi",
        )
        .filter(F.col("containment") >= tau)
        .select(
            "src_doc", "dst_doc",
            F.round("containment", 6).alias("containment"),
        )
    )


def containment_pairs_sql(tau: float = CONTAINMENT_TAU) -> str:
    return f"""
WITH ex AS ({shingles_sql()}),
sizes AS (SELECT doc_id, count(*) AS nsh FROM ex GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
  FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id),
directed AS (
  SELECT doc_a AS src_doc, doc_b AS dst_doc,
         common::DOUBLE / sa.nsh AS containment
  FROM common JOIN sizes sa ON sa.doc_id = doc_a
  UNION ALL
  SELECT doc_b, doc_a, common::DOUBLE / sb.nsh
  FROM common JOIN sizes sb ON sb.doc_id = doc_b)
SELECT src_doc, dst_doc, round(containment, 6) AS containment
FROM directed WHERE containment >= {tau!r}
"""


# TF-IDF shingle cosine: the weighted lexical near-dup scorer. Jaccard
# treats every shared shingle equally; TF-IDF cosine discounts common
# boilerplate and rewards rare shared content — the standard soft
# complement (pairwise document similarity via inverted-index sparse
# dot products, e.g. Elsayed et al. 2008, public). tau sits in the
# measured bimodal gap of the fixtures (near-dups ≥ 0.93, background
# < 0.21 at sf0.01 — margin ≥ 0.33 on either side of 0.5).
TFIDF_COS_TAU = 0.5


def tfidf_doc_similarity(
    documents: DataFrame,
    tau: float = TFIDF_COS_TAU,
    w: int = SHINGLE_W,
    cut: int = SHINGLE_DF_CUT,
) -> DataFrame:
    """(doc_a, doc_b, cosine) for pairs with TF-IDF shingle cosine ≥ tau.

    Representation: word-``w``-gram shingle MULTISET per doc, weighted
    ``tf · ln(N/df)``, restricted to shingles with ``df·2 ≤ N`` (the
    median-df cap — integer comparison, so both engines prune the exact
    same vocabulary) and ``df ≤ cut`` (the hot-shingle guard, mirrored
    verbatim in the DuckDB oracle so both predicates are definitionally
    identical — same contract as SHINGLE_DF_CUT). The cap is
    semantic, not just protective: idf of a shingle in most documents is
    ~0, so dropping the hot half of the vocabulary changes scores only
    at the 3rd decimal while bounding every posting list.

    Plan: explode → tf groupBy (map-side combine) → vocabulary-sized df
    groupBy → weight join (AQE broadcasts the pruned vocabulary) → the
    inverted-index pair join on ``sh`` (per-shingle fan-out ≤
    min(N/2, cut)² — the DISCO-style sparse matmul) → pair groupBy-sum →
    two norm joins (doc-count-sized, AQE-broadcast). Every join is an
    equi-join; no distinct shuffle (pair dedup falls out of the groupBy).

    Determinism: doc ids and the 4-decimal-rounded cosine only; the tau
    comparison is on raw doubles but the fixture gap is ~10¹¹ ulps wide.
    """
    n_docs = documents.count()  # one column-pruned count job (tfidf_top_terms)
    grams = doc_shingles(documents, w, distinct=False)
    tf = grams.groupBy("doc_id", "sh").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    kept = df.filter((F.col("df") * 2 <= F.lit(n_docs)) & (F.col("df") <= cut))
    wt = tf.join(kept, "sh").select(
        "doc_id",
        "sh",
        (F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))).alias("wt"),
    )
    from ..session import persist_once

    # Three consumers (norms + both sides of the pair join) — one
    # materialization instead of three explode→agg→join replays.
    wt = persist_once(wt, StorageLevel.MEMORY_AND_DISK)
    nrm = wt.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("wt") * F.col("wt"))).alias("nrm")
    )
    a = wt.select(F.col("doc_id").alias("doc_a"), "sh", F.col("wt").alias("wa"))
    b = wt.select(F.col("doc_id").alias("doc_b"), "sh", F.col("wt").alias("wb"))
    dots = (
        a.join(b, "sh")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    na = nrm.select(F.col("doc_id").alias("doc_a"), F.col("nrm").alias("na"))
    nb = nrm.select(F.col("doc_id").alias("doc_b"), F.col("nrm").alias("nb"))
    return (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .withColumn("cos_raw", F.col("dot") / (F.col("na") * F.col("nb")))
        .filter(F.col("cos_raw") >= tau)
        .select("doc_a", "doc_b", F.round("cos_raw", 4).alias("cosine"))
    )


def tfidf_doc_similarity_sql(
    tau: float = TFIDF_COS_TAU,
    w: int = SHINGLE_W,
    cut: int = SHINGLE_DF_CUT,
) -> str:
    # The kept CTE mirrors BOTH Spark-side prunes — the median-df cap AND
    # the hot-shingle cut — as the same exact integer predicates, so the
    # oracle is definitionally identical rather than coincidentally so at
    # fixture scale (round-8 ADVICE).
    return f"""
WITH grams AS ({shingles_sql(w, distinct=False)}),
tf AS (SELECT doc_id, sh, count(*) AS tf FROM grams GROUP BY doc_id, sh),
df AS (SELECT sh, count(*) AS df FROM tf GROUP BY sh),
ncnt AS (SELECT count(*) AS cnt FROM documents),
kept AS (SELECT sh, df FROM df
         WHERE df * 2 <= (SELECT cnt FROM ncnt) AND df <= {cut}),
w AS (SELECT tf.doc_id, tf.sh,
             tf.tf * ln((SELECT cnt FROM ncnt)::DOUBLE / kept.df) AS wt
      FROM tf JOIN kept USING (sh)),
nrm AS (SELECT doc_id, sqrt(sum(wt * wt)) AS nrm FROM w GROUP BY doc_id),
dots AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, sum(a.wt * b.wt) AS dot
         FROM w a JOIN w b ON a.sh = b.sh AND a.doc_id < b.doc_id
         GROUP BY 1, 2)
SELECT doc_a, doc_b, round(dot / (na.nrm * nb.nrm), 4) AS cosine
FROM dots
JOIN nrm na ON dots.doc_a = na.doc_id
JOIN nrm nb ON dots.doc_b = nb.doc_id
WHERE dot / (na.nrm * nb.nrm) >= {tau!r}
"""


def duplication_profile(
    documents: DataFrame,
    index: tuple[DataFrame, DataFrame | None] | None = None,
) -> DataFrame:
    """(doc_id, n_shingles, n_dup_shingles, dup_fraction) — per-document
    boilerplate measure: the fraction of a doc's distinct word-shingles
    that also appear in at least one *other* document. The C4/RefinedWeb
    "duplicated n-gram fraction" filter signal, as a first-class operator
    (pair-level near-dup detection says WHICH docs collide; this says HOW
    MUCH of each doc is corpus boilerplate, feeding quality filtering).

    Plan: one count-over-window on ``sh`` (the same shuffle shape as
    ``shingle_df_cut`` — co-locates by shingle), then a per-doc hash
    aggregation. Two shuffles total, no joins, no pair explosion — cost
    is O(total shingles) regardless of how duplicated the corpus is, so
    the shape survives 100 TB where any pair-based formulation would
    blow up on heavy boilerplate.

    ``index`` injects the registry's shared ``_shingle_index`` result; the
    UNCUT table is used (duplication of a hot shingle is exactly the
    signal here). When the shared table is the persisted cut table with
    no active cut, it is already shingle-partitioned, so the window runs
    exchange-free.
    """
    if index is not None:
        ex_cut, sh_all = index
        sh = sh_all if sh_all is not None else ex_cut
    else:
        sh = doc_shingles(documents)
    w = Window.partitionBy("sh")
    # df counts DOCS per shingle (doc_shingles is distinct per doc), so
    # df >= 2 ⇔ the shingle exists in some other document.
    flagged = sh.withColumn("__df", F.count(F.lit(1)).over(w))
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.when(F.col("__df") >= 2, 1).otherwise(0))
            .cast("bigint")
            .alias("n_dup_shingles"),
        )
        .withColumn(
            "dup_fraction",
            F.round(F.col("n_dup_shingles") / F.col("n_shingles"), 6),
        )
    )


def duplication_profile_sql() -> str:
    """DuckDB oracle: identical distinct-shingle frequency flagging."""
    return f"""
WITH sh AS ({shingles_sql()}),
f AS (SELECT doc_id, count(*) OVER (PARTITION BY sh) AS df FROM sh)
SELECT doc_id,
       count(*) AS n_shingles,
       CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_shingles,
       round(CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
         AS dup_fraction
FROM f GROUP BY doc_id
"""


def ngram_jaccard_pairs_sql(tau: float = JACCARD_TAU) -> str:
    return f"""
WITH {_pair_jaccard_sql()}
SELECT doc_a, doc_b, round(jaccard, 6) AS jaccard
FROM jac WHERE jaccard >= {tau!r}
"""


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

# Universal-hash family over the Mersenne prime 2^31−1: the i-th minhash
# of a shingle is (aᵢ·(md5₆₀(sh) mod P) + bᵢ) mod P. ONE md5 per shingle
# (the expensive part — the previous form computed H md5s per shingle and
# exploded H× rows before aggregating); the H derived hashes are two
# integer ops each and fold into H min-aggregates in a single groupBy of
# one row per doc, so the shuffle carries |docs|·H ints, not
# |shingles|·H rows. All operands stay < 2^62 (a, b, base < 2^31), so
# 64-bit arithmetic is exact and identical in DuckDB — the oracle uses
# the same (aᵢ, bᵢ) literals.
MINHASH_P = (1 << 31) - 1


def _uhash_params(h: int) -> list[tuple[int, int]]:
    """Deterministic (aᵢ, bᵢ) pairs, derived from md5 of the index so both
    engines inline the same literals (no RNG state anywhere)."""
    import hashlib

    out = []
    for i in range(h):
        a = int(hashlib.md5(f"minhash-a:{i}".encode()).hexdigest()[:15], 16)
        b = int(hashlib.md5(f"minhash-b:{i}".encode()).hexdigest()[:15], 16)
        out.append((a % (MINHASH_P - 1) + 1, b % MINHASH_P))
    return out


def minhash_signatures(documents: DataFrame, h: int = MINHASH_H) -> DataFrame:
    """(doc_id, i, mh): the i-th minhash = min over shingles of the i-th
    universal hash of the shingle's 60-bit md5."""
    return _minhash_from_shingles(doc_shingles(documents), h)


def _minhash_wide(ex: DataFrame, h: int = MINHASH_H) -> DataFrame:
    """(doc_id, __mh0..__mh{h-1}): the per-doc minhash vector as one
    wide row — ONE map-side-combined aggregate over the shingle table."""
    base = md5_hash64(F.col("sh")) % MINHASH_P
    return ex.select("doc_id", base.alias("hb")).groupBy("doc_id").agg(
        *[
            F.min((F.lit(a) * F.col("hb") + F.lit(b)) % MINHASH_P).alias(
                f"__mh{i}"
            )
            for i, (a, b) in enumerate(_uhash_params(h))
        ]
    )


def _minhash_from_shingles(ex: DataFrame, h: int = MINHASH_H) -> DataFrame:
    wide = _minhash_wide(ex, h)
    # long form (doc_id, i, mh) for banding/consumers — exploded AFTER the
    # aggregation, so the H× fan-out touches one row per doc
    structs = F.array(
        *[
            F.struct(F.lit(i).alias("i"), F.col(f"__mh{i}").alias("mh"))
            for i in range(h)
        ]
    )
    return wide.select("doc_id", F.explode(structs).alias("s")).select(
        "doc_id", F.col("s.i").alias("i"), F.col("s.mh").alias("mh")
    )


def _band_keys(sig: DataFrame, r: int) -> DataFrame:
    """(doc_id, bk): per-band 8-byte LSH bucket keys from a (doc_id, i,
    mh) signature table. Band key = xxhash64(band, ordered minhash
    slice) — constant-width shuffle keys at any H.

    Long-form reference shape (kept as the semantic spec and for
    callers holding a signature table); the pipeline hot path uses
    ``_band_keys_from_shingles``, which produces bit-identical keys
    without the explode→re-group round trip (pinned equal in
    tests/test_round13_ops.py)."""
    return (
        sig.withColumn("band", (F.col("i") / r).cast("int"))
        .groupBy("doc_id", "band")
        .agg(F.array_sort(F.collect_list(F.struct("i", "mh"))).alias("slice_"))
        .select("doc_id", F.xxhash64("band", F.col("slice_.mh")).alias("bk"))
    )


def _band_keys_from_shingles(ex: DataFrame, h: int, r: int) -> DataFrame:
    """(doc_id, bk) fused: the wide per-doc minhash aggregate already
    holds ``__mh0..__mh{h-1}`` as ADJACENT COLUMNS in i-order, so each
    band's slice is a literal column selection —
    ``xxhash64(band, array(__mh_{b·r} .. __mh_{b·r+r−1}))`` — and the
    long form's explode → groupBy(doc_id, band) →
    array_sort(collect_list(struct(i, mh))) round trip (a SECOND full
    shuffle of H rows per doc, guide §2.4 "remove shuffles outright")
    disappears. Bit-identical keys to ``_band_keys`` ∘
    ``_minhash_from_shingles``: the sorted struct list's ``.mh``
    projection IS the i-ordered slice, and the xxhash64 input types
    (int band, array<bigint> slice) are unchanged. One shuffle total
    (the per-doc min aggregate), ceil(H/r) struct entries exploded per
    doc — including the TRAILING PARTIAL band when r does not divide h
    (r13 ADVICE: the first cut iterated range(h // r) and silently
    dropped minhash rows h−(h%r)..h−1 for non-divisible configs, while
    the long form emits them as band h//r; pinned equal at (16, 5) in
    tests/test_round14_ops.py)."""
    wide = _minhash_wide(ex, h)
    structs = F.array(
        *[
            F.struct(
                F.lit(bnd).cast("int").alias("band"),
                F.array(
                    *[
                        F.col(f"__mh{i}")
                        for i in range(bnd * r, min((bnd + 1) * r, h))
                    ]
                ).alias("slice_"),
            )
            for bnd in range(-(-h // r))
        ]
    )
    return wide.select("doc_id", F.explode(structs).alias("s")).select(
        "doc_id", F.xxhash64(F.col("s.band"), F.col("s.slice_")).alias("bk")
    )


def minhash_lsh_pairs(
    documents: DataFrame,
    tau: float = JACCARD_TAU,
    h: int = MINHASH_H,
    bands: int = MINHASH_BANDS,
    cut: int = SHINGLE_DF_CUT,
    index: tuple[DataFrame, DataFrame | None] | None = None,
) -> DataFrame:
    """LSH candidates verified with exact Jaccard.

    Banding: rows i of band b are i ∈ [b·R, (b+1)·R); the band key is
    ``xxhash64(band, ordered minhash slice)`` — an 8-byte shuffle key
    instead of an R-element array, so the candidate self-join moves
    constant-width keys at any H. A 2^-64 hash collision can only ADD a
    candidate pair, and every candidate is verified against the exact
    shingle Jaccard downstream, so the output has no false positives
    (LSH only affects recall, tuned by (H, bands, tau)).
    """
    r = h // bands
    # One persisted shingle table feeds signature building, candidate
    # banding AND exact verification; without an explicit persist Spark
    # replans each consumer as its own scan→shingle subtree (measured: 23
    # parquet scans of `documents` in one query, exchange reuse
    # recovering only a few). MEMORY_AND_DISK: at corpus scale the
    # shingle table spills instead of re-reading + re-hashing the corpus
    # per consumer. The hot-shingle cut applies to the signature /
    # candidate side only — when it actually drops rows, verification
    # runs against the uncut table so reported Jaccard is true full-set
    # Jaccard (round-2 ADVICE); ``_shingle_index`` probes for the no-op
    # case and then verifies on the (identical) cut table.
    ex_cut, sh_all = index if index is not None else _shingle_index(documents, cut)
    verify_ex = ex_cut if sh_all is None else sh_all
    band_sig = _band_keys_from_shingles(ex_cut, h, r)
    a = band_sig.alias("a")
    b = band_sig.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.bk") == F.col("b.bk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
        # _verify_candidates persists cand (three consumers there)
    )
    # Verify ONLY the LSH candidates, against the full shingle sets —
    # at corpus scale the full pair-Jaccard table is quadratic and would
    # defeat the point of LSH banding.
    return (
        _verify_candidates(verify_ex, cand, tau)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )


def minhash_lsh_pairs_sql(
    tau: float = JACCARD_TAU, h: int = MINHASH_H, bands: int = MINHASH_BANDS
) -> str:
    r = h // bands
    params_rows = ", ".join(
        f"({i}, {a}, {b})" for i, (a, b) in enumerate(_uhash_params(h))
    )
    base = f"({md5_hash64_sql('sh')} % {MINHASH_P})"
    return f"""
WITH {_pair_jaccard_sql()},
params(i, a, b) AS (VALUES {params_rows}),
mh AS (
  SELECT doc_id, p.i, min((p.a * {base} + p.b) % {MINHASH_P}) AS mh
  FROM ex CROSS JOIN params p
  GROUP BY doc_id, p.i),
band_sig AS (
  SELECT doc_id, CAST(i // {r} AS INTEGER) AS band,
         list(mh ORDER BY i) AS sig
  FROM mh GROUP BY doc_id, CAST(i // {r} AS INTEGER)),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM band_sig a JOIN band_sig b
    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id)
SELECT c.doc_a, c.doc_b, round(j.jaccard, 6) AS jaccard
FROM cand c JOIN jac j ON j.doc_a = c.doc_a AND j.doc_b = c.doc_b
WHERE j.jaccard >= {tau!r}
"""


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_fingerprints(documents: DataFrame) -> DataFrame:
    """(doc_id, simhash): 60-bit fingerprint over distinct word hashes.

    For each bit position b, the bit is 1 iff more word-hashes have bit b
    set than unset. Computed as an explode over (word, bit) — 60× word
    count, all in codegen — then two groupBys with map-side partial sums.
    """
    ws = F.array_distinct(F.split(F.col("text"), " "))
    words = documents.select("doc_id", F.explode(ws).alias("w")).select(
        "doc_id", md5_hash64(F.col("w")).alias("wh")
    )
    bits = words.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1))).alias("b"),
        F.col("wh"),
    ).select(
        "doc_id",
        "b",
        # shiftright/shiftleft builders need a literal shift — use expr for
        # the column-valued bit position
        F.when(F.expr("shiftright(wh, b) & 1") == 1, 1).otherwise(-1).alias("s"),
    )
    return (
        bits.groupBy("doc_id", "b")
        .agg(F.sum("s").alias("net"))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.when(
                    F.col("net") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), b)")
                ).otherwise(F.lit(0).cast("bigint"))
            ).alias("simhash")
        )
    )


def simhash_pairs(documents: DataFrame, k: int = SIMHASH_K) -> DataFrame:
    """Pairs with Hamming(simhash_a, simhash_b) ≤ k.

    Candidate generation without a cross join: split the 60-bit
    fingerprint into k+1 15-bit chunks; by pigeonhole any pair within
    Hamming ≤ k agrees on at least one chunk, so a (chunk_id, value)
    equi-join finds every qualifying pair. Verification recomputes the
    exact Hamming distance with bit_count(xor).
    """
    chunk_bits = SIMHASH_BITS // SIMHASH_CHUNKS
    fp = simhash_fingerprints(documents)
    chunks = fp.select(
        "doc_id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_CHUNKS - 1))).alias("c"),
    ).select(
        "doc_id",
        "simhash",
        "c",
        F.expr(f"shiftright(simhash, c * {chunk_bits}) & {(1 << chunk_bits) - 1}")
        .alias("chunk_val"),
    )
    a = chunks.alias("a")
    b = chunks.alias("b")
    ham = F.bit_count(
        F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    )
    return (
        a.join(
            b,
            (F.col("a.c") == F.col("b.c"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= k)
        .distinct()
    )


def simhash_pairs_sql(k: int = SIMHASH_K) -> str:
    """Oracle: brute-force pair scan with the same fingerprint arithmetic
    (candidate banding is an execution strategy, not a semantics change —
    the pigeonhole argument guarantees identical output)."""
    wh = md5_hash64_sql("w")
    return f"""
WITH words AS (
  SELECT doc_id, {wh} AS wh
  FROM (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS w
        FROM documents)),
bits AS (
  SELECT doc_id, b,
         sum(CASE WHEN (wh >> b) & 1 = 1 THEN 1 ELSE -1 END) AS net
  FROM words, generate_series(0, {SIMHASH_BITS - 1}) AS t(b)
  GROUP BY doc_id, b),
fp AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN net > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT)
           AS simhash
  FROM bits GROUP BY doc_id)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {k}
"""


# ---------------------------------------------------------------------------
# Cluster collapse (connected components over the near-dup pair graph)
# ---------------------------------------------------------------------------

def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
    driver_max_edges: int = 1_000_000,
) -> DataFrame:
    """(node, cluster_id) — connected components of an undirected pair
    graph, entirely in DataFrame ops above ``driver_max_edges``.

    A dedup pipeline can't stop at PAIRS: dropping one doc per pair
    over-deletes (A~B, B~C drops two of three docs), so pairs must
    collapse into clusters first and keep one canonical doc per cluster.

    Size-adaptive strategy (same pattern as the exact-path gates in
    ``similarity.similar_pairs_threshold`` and ``outliers.outliers_auto``):
    the edge list here is the *output* of LSH dedup — usually a tiny
    fraction of the corpus — so up to ``driver_max_edges`` edges a driver
    union-find answers in one collect (an 8-byte-pair collect, ~16 MB at
    the gate). Above the gate, the large-star/small-star alternation
    (Kiveris et al., "Connected Components in MapReduce and Beyond" —
    public algorithm) runs fully distributed: each round hangs every
    node's larger neighbors onto its minimum neighbor (large-star), then
    contracts the remaining parent pointers (small-star). Rounds are
    O(log n) even on adversarial chains — unlike min-label propagation,
    whose round count is the graph DIAMETER (a 1M-long chain would need
    1M shuffling rounds; the alternation needs ~20). Convergence = the
    edge multiset reaching a fixpoint (count + hash-sum signature, one
    cheap agg per round); ``localCheckpoint`` truncates lineage each
    round (plans nest two join layers per round otherwise) — on a
    cluster with dynamic executors, swap for a reliable ``checkpoint()``
    directory.

    Labels are node ids, so cluster_id = min doc_id in the component —
    deterministic, identical on both paths, and directly usable as the
    canonical document id.
    """
    edges = (
        pairs.select(
            F.greatest(F.col(src), F.col(dst)).alias("u"),
            F.least(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    # Scoped cache (round-8 ADVICE): release() is a no-op when an outer
    # consumer already cached this exact plan, so we can't yank a shared
    # CacheManager entry out from under it mid-use.
    from ..session import persist_scoped

    edges, release_edges = persist_scoped(edges, StorageLevel.MEMORY_AND_DISK)
    n_edges = edges.count()  # also materializes the persist
    spark = pairs.sparkSession
    if n_edges <= driver_max_edges:
        parent: dict = {}

        def find(x):
            parent.setdefault(x, x)
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:  # path compression
                parent[x], x = root, parent[x]
            return root

        for r in edges.collect():
            ra, rb = find(r.u), find(r.v)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        rows = [(n, find(n)) for n in parent]
        release_edges()
        if not rows:
            return spark.createDataFrame([], "node bigint, cluster_id bigint")
        return local_df(spark, rows, "node bigint, cluster_id bigint")
    e = edges
    prev_sig = None
    converged = False
    for _ in range(max_iter):
        e = _star_round(e).localCheckpoint()
        sig = tuple(
            e.agg(
                F.count(F.lit(1)),
                # decimal sum: exact, order-independent, and immune to the
                # ANSI long-overflow a bigint sum of 64-bit hashes hits
                F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")),
            ).first()
        )
        if sig == prev_sig:
            converged = True
            break
        prev_sig = sig
    release_edges()
    if not converged:
        # Partial pointers are WRONG labels: a downstream leakage-safe
        # split would place near-dup docs in different train/test splits
        # with no signal. Fail loudly rather than return silently-bad
        # clusters (round-2 ADVICE).
        raise RuntimeError(
            f"connected_components: star alternation did not converge in "
            f"{max_iter} rounds"
        )
    # fixpoint is a star per component: every non-min node points at the
    # component min; add the (min, min) self-labels the callers expect
    return e.select(F.col("u").alias("node"), F.col("v").alias("cluster_id")).union(
        e.select(F.col("v").alias("node"), F.col("v").alias("cluster_id")).distinct()
    )


def _star_round(e: DataFrame) -> DataFrame:
    """One large-star + small-star round over a canonical (u > v) edge
    list; output is canonical again and equals the input iff the graph is
    already a per-component star (the convergence fixpoint).

    Large-star: for each center c with neighborhood N(c), hang every
    neighbor n > c onto m = min(N(c) ∪ {c}) — long chains fold onto
    their local minima, doubling the "reach" of small ids each round.
    Small-star: for each c, point every remaining small neighbor (and c
    itself) at m = min of c's small neighbors — contracts the parent
    pointers built by large-star. Both phases are groupBy(u) + equi-join
    on u: the aggregation's hash partitioning is exactly the join's, so
    each phase costs one shuffle of the edge list plus one of the
    (node, min) table — per-round shuffle count is constant and
    plan-asserted in tests.
    """
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    lmins = sym.groupBy("u").agg(F.min("v").alias("mv"))
    ls = (
        sym.join(lmins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(
            F.col("v").alias("n"), F.least(F.col("mv"), F.col("u")).alias("m")
        )
        .filter(F.col("n") != F.col("m"))
        .select(F.col("n").alias("u"), F.col("m").alias("v"))
        .distinct()
    )
    smins = ls.groupBy("u").agg(F.min("v").alias("mv"))
    return (
        ls.join(smins, "u")
        .select(F.col("v").alias("n"), F.col("mv").alias("m"))
        .union(smins.select(F.col("u").alias("n"), F.col("mv").alias("m")))
        .filter(F.col("n") != F.col("m"))
        .select(F.col("n").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def dedup_clusters(
    documents: DataFrame,
    tau: float = JACCARD_TAU,
    comp: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, cluster_id, cluster_size, is_canonical) for every document
    in ≥1 MinHash-LSH near-dup pair: the end-to-end dedup collapse. Keep
    rows with ``is_canonical`` (plus every doc absent from this table) and
    the corpus is near-dup-free with one survivor per cluster.

    ``comp`` (node, cluster_id) lets callers inject precomputed
    components — the registry shares ONE pair/component pipeline across
    the three LSH consumers instead of rebuilding the ~equal-cost
    shingle→MinHash→LSH→verify chain per query.
    """
    if comp is None:
        comp = connected_components(minhash_lsh_pairs(documents, tau=tau))
    w = Window.partitionBy("cluster_id")
    return comp.select(
        F.col("node").alias("doc_id"),
        "cluster_id",
        F.count(F.lit(1)).over(w).alias("cluster_size"),
        (F.col("node") == F.col("cluster_id")).alias("is_canonical"),
    )


def dedup_clusters_sql(tau: float = JACCARD_TAU) -> str:
    """Oracle: transitive closure by recursive CTE (min reachable id =
    cluster id). O(component² ) closure rows — fine at oracle SF, which is
    exactly why the engine side uses label propagation instead."""
    return f"""
WITH RECURSIVE pairs AS ({minhash_lsh_pairs_sql(tau)}),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION SELECT doc_b AS u, doc_a AS v FROM pairs),
reach(u, v) AS (
  SELECT u, u FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
comp AS (SELECT u AS doc_id, min(v) AS cluster_id FROM reach GROUP BY u)
SELECT doc_id, cluster_id,
       count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
       doc_id = cluster_id AS is_canonical
FROM comp
"""


def dedup_quality_keeper(
    documents: DataFrame,
    tau: float = JACCARD_TAU,
    comp: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, cluster_id, cluster_size, quality_score, is_keeper) —
    near-dup collapse keeping the HIGHEST-QUALITY document per cluster
    instead of the lowest id: the RefinedWeb/CCNet-style policy (when
    near-duplicates differ — one clean extraction, one boilerplate-ridden
    mirror — dropping by id throws away the better copy about half the
    time). Keeper = max quality_score, doc_id as the deterministic
    tiebreak; scores are the engine's rounded-to-6 quality metric, so
    the ordering is engine-portable by the same contract every gate
    query relies on.

    Sixth consumer of the registry's shared pair/component pipeline
    (``comp`` injection, same as ``dedup_clusters``/``soft_dedup_weights``).
    Scale: the component table covers only clustered docs (orders of
    magnitude smaller than the corpus), so its join against the score
    projection broadcasts; the two windows share one cluster-keyed
    exchange.
    """
    from ..functions.text import quality_scores

    if comp is None:
        comp = connected_components(minhash_lsh_pairs(documents, tau=tau))
    q = quality_scores(documents).select("doc_id", "quality_score")
    labeled = q.join(
        F.broadcast(comp.select(F.col("node").alias("doc_id"), "cluster_id")),
        "doc_id",
    )
    w = Window.partitionBy("cluster_id")
    wr = Window.partitionBy("cluster_id").orderBy(
        F.desc("quality_score"), "doc_id"
    )
    return labeled.select(
        "doc_id",
        "cluster_id",
        F.count(F.lit(1)).over(w).alias("cluster_size"),
        "quality_score",
        (F.row_number().over(wr) == 1).alias("is_keeper"),
    )


def dedup_quality_keeper_sql(tau: float = JACCARD_TAU) -> str:
    """Oracle: the dedup_clusters recursive-CTE closure joined to the
    quality-score twin, identical (score DESC, doc_id) keeper window."""
    from ..functions.text import QUALITY_SCORES_SQL

    return f"""
WITH RECURSIVE pairs AS ({minhash_lsh_pairs_sql(tau)}),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION SELECT doc_b AS u, doc_a AS v FROM pairs),
reach(u, v) AS (
  SELECT u, u FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
comp AS (SELECT u AS doc_id, min(v) AS cluster_id FROM reach GROUP BY u),
q AS ({QUALITY_SCORES_SQL}),
labeled AS (
  SELECT c.doc_id, c.cluster_id, q.quality_score
  FROM comp c JOIN q USING (doc_id))
SELECT doc_id, cluster_id,
       count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
       quality_score,
       row_number() OVER (PARTITION BY cluster_id
                          ORDER BY quality_score DESC, doc_id) = 1
         AS is_keeper
FROM labeled
"""


# ---------------------------------------------------------------------------
# Incremental ingest dedup (new batch vs existing corpus)
# ---------------------------------------------------------------------------

def incremental_lsh_pairs(
    incoming: DataFrame,
    corpus: DataFrame,
    tau: float = JACCARD_TAU,
    h: int = MINHASH_H,
    bands: int = MINHASH_BANDS,
    cut: int = SHINGLE_DF_CUT,
    index: tuple[DataFrame, DataFrame | None] | None = None,
) -> DataFrame:
    """(new_doc, corpus_doc, jaccard) — near-dups of an INCOMING batch
    against an EXISTING corpus, without re-pairing the corpus with
    itself.

    ``index`` injects a precomputed ``_shingle_index`` — valid ONLY when
    it was built over exactly ``incoming ∪ corpus`` (the registry passes
    the session-shared index because its incoming/corpus split partitions
    the full ``documents`` table).

    The batch-ingest sibling of ``streaming.windowed.dedup_stream``
    (which handles exact re-delivery): every refresh of a 100 TB corpus
    asks "which new docs near-duplicate something we already have?", and
    running ``minhash_lsh_pairs`` on the union wastes almost all its
    candidate volume on corpus×corpus pairs that were already
    adjudicated. Here the LSH band join is *bipartite* — incoming band
    keys against corpus band keys only — so candidate volume scales with
    the batch, not the corpus. In production the corpus side of the band
    table is a materialized index, append-only across ingests; this
    function recomputes it (same plan shape) since the fixture has no
    index store.

    Semantics: exactly the full pipeline on ``incoming ∪ corpus``
    restricted to cross pairs — shingles, the hot-shingle DF cut, and
    minhash parameters are all computed over the union, so the oracle
    (full-corpus SQL filtered to cross pairs) matches by construction.
    Doc ids must be disjoint across the two inputs.
    """
    r = h // bands
    tagged = incoming.select("doc_id", "text").withColumn(
        "is_new", F.lit(True)
    ).unionByName(
        corpus.select("doc_id", "text").withColumn("is_new", F.lit(False))
    )
    ex_cut, sh_all = (
        index if index is not None
        else _shingle_index(tagged.select("doc_id", "text"), cut)
    )
    verify_ex = ex_cut if sh_all is None else sh_all
    band_sig = _band_keys_from_shingles(ex_cut, h, r).join(
        tagged.select("doc_id", "is_new"), "doc_id"
    )
    a = band_sig.filter(F.col("is_new")).alias("a")
    b = band_sig.filter(~F.col("is_new")).alias("b")
    cand = (
        a.join(b, F.col("a.bk") == F.col("b.bk"))
        .select(
            F.least(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_a"),
            F.greatest(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_b"),
            F.col("a.doc_id").alias("new_doc"),
            F.col("b.doc_id").alias("corpus_doc"),
        )
        .distinct()
    )
    return (
        _verify_candidates(verify_ex, cand, tau)
        .select("new_doc", "corpus_doc", F.round("jaccard", 6).alias("jaccard"))
    )


def incremental_lsh_pairs_sql(
    incoming_pred: str, tau: float = JACCARD_TAU
) -> str:
    """Oracle: the full-union LSH pair SQL restricted to pairs that cross
    the ``incoming_pred`` boundary, re-oriented (new first)."""
    return f"""
WITH full_pairs AS ({minhash_lsh_pairs_sql(tau)})
SELECT CASE WHEN ({incoming_pred.replace('doc_id', 'doc_a')}) THEN doc_a ELSE doc_b END
         AS new_doc,
       CASE WHEN ({incoming_pred.replace('doc_id', 'doc_a')}) THEN doc_b ELSE doc_a END
         AS corpus_doc,
       jaccard
FROM full_pairs
WHERE ({incoming_pred.replace('doc_id', 'doc_a')})
      <> ({incoming_pred.replace('doc_id', 'doc_b')})
"""


# ---------------------------------------------------------------------------
# Benchmark decontamination (eval-set n-gram overlap)
# ---------------------------------------------------------------------------

DECONTAM_W = 8  # overlap n-gram width (longer than dedup shingles: a hit
                # must be verbatim benchmark text, not shared phrasing)


def contamination_check(
    corpus: DataFrame, eval_docs: DataFrame, w: int = DECONTAM_W
) -> DataFrame:
    """(doc_id, n_overlap_shingles, n_eval_docs_hit) — training docs that
    share ≥1 verbatim word-``w``-gram with any eval/benchmark document:
    the decontamination pass run before training so eval numbers aren't
    inflated by memorized test items.

    Same bipartite inverted-index shape as ``incremental_lsh_pairs``:
    both sides shingle (distinct per doc), equi-join on the shingle, so
    only docs sharing an exact n-gram ever meet — candidate volume scales
    with the eval set, which is tiny by construction. At 100 TB the
    corpus side streams through the join against a broadcast-or-shuffled
    eval index; a DF cut is deliberately NOT applied — at ``w`` = 8 a
    hot shingle IS the contamination signal, and dropping it would hide
    hits.
    """
    c = doc_shingles(corpus, w=w)
    e = doc_shingles(eval_docs, w=w).select(
        F.col("doc_id").alias("eval_id"), "sh"
    )
    return (
        c.join(e, "sh")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("sh").alias("n_overlap_shingles"),
            F.countDistinct("eval_id").alias("n_eval_docs_hit"),
        )
    )


def contamination_check_sql(eval_pred: str, w: int = DECONTAM_W) -> str:
    """Oracle: same join over the same shingle CTE, the corpus/eval sides
    selected by ``eval_pred`` over doc_id."""
    return f"""
WITH sh AS ({shingles_sql(w)}),
c AS (SELECT doc_id, sh FROM sh WHERE NOT ({eval_pred})),
e AS (SELECT doc_id AS eval_id, sh FROM sh WHERE {eval_pred})
SELECT c.doc_id,
       count(DISTINCT c.sh) AS n_overlap_shingles,
       count(DISTINCT e.eval_id) AS n_eval_docs_hit
FROM c JOIN e USING (sh)
GROUP BY c.doc_id
"""


# ---------------------------------------------------------------------------
# Corpus-level repeated-span removal (C4-style boilerplate dedup)
# ---------------------------------------------------------------------------

SPAN_W = 4          # words per span (C4 used three-sentence spans;
                    # the fixture's texts are single-line word streams,
                    # so the span unit is a word w-gram)
SPAN_MIN_COUNT = 2  # C4's rule: a span "occurring more than once"


def _span_occurrences(documents: DataFrame, w: int = SPAN_W) -> DataFrame:
    """(doc_id, pos, gh): every word-``w``-gram occurrence with its
    0-based start position and engine-portable 60-bit hash. Docs shorter
    than ``w`` words contribute nothing (guarded — F.sequence would
    otherwise count DOWN for a negative stop)."""
    arr = F.split(F.col("text"), " ")
    # armored position list (the doc_shingles r13 device): ascending and
    # empty for docs shorter than w, so the expression is total and needs
    # no CASE WHEN (whose inferred-filter copies re-evaluated the
    # transform — measured 2× on the shingle pass)
    positions = F.slice(
        F.sequence(F.lit(0), F.greatest(F.size(arr) - w, F.lit(0))),
        1,
        F.greatest(F.size(arr) - w + 1, F.lit(0)),
    )
    gram_arr = F.transform(
        positions,
        lambda i: F.concat_ws(" ", F.slice(arr, i + F.lit(1), F.lit(w))),
    )
    return documents.select(
        "doc_id", F.posexplode(gram_arr).alias("pos", "g")
    ).select("doc_id", "pos", md5_hash64(F.col("g")).alias("gh"))


def repeated_span_removal(
    documents: DataFrame, w: int = SPAN_W, min_count: int = SPAN_MIN_COUNT
) -> DataFrame:
    """(doc_id, clean_text, n_words, n_dropped): the corpus with every
    repeated word-``w``-gram span removed EXCEPT its first occurrence.

    C4's boilerplate rule (Raffel et al., "Exploring the Limits of
    Transfer Learning with a Unified Text-to-Text Transformer", JMLR
    2020, §2.2: "we discarded all but one of any three-sentence span
    occurring more than once in the data set"; RefinedWeb and CCNet
    apply the same idea at line granularity). Semantics here, stated
    exactly: a word position is dropped iff it is covered by a
    NON-KEEPER occurrence of some span whose corpus-wide occurrence
    count is ≥ ``min_count``; the keeper is the occurrence with the
    smallest (doc_id, pos) — deterministic, so both engines agree.

    100 TB shape — the text column never shuffles:

    * span occurrences are a projection (split + slide) shuffled ONCE as
      8-byte md5 hashes for the count/keeper aggregation (map-side
      combined: hot spans collapse to one partial row per partition —
      the hotter the boilerplate, the cheaper its shuffle);
    * the hot-span table (count ≥ min_count) is the BOILERPLATE — a
      vanishing fraction of distinct spans at corpus scale, so the
      occurrence→hot join broadcasts under AQE;
    * dropped positions aggregate per doc (`collect_set`, bounded by
      w × hot occurrences) and broadcast-join back to the corpus, where
      a codegen'd indexed `filter` + `array_join` rebuilds each text in
      place — no per-word explode of the corpus, no re-sort, no second
      full-data shuffle.
    """
    occ = _span_occurrences(documents, w)
    hot = (
        occ.groupBy("gh")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.min(F.struct("doc_id", "pos")).alias("keeper"),
        )
        .filter(F.col("c") >= min_count)
    )
    drop_pos = (
        occ.join(hot, "gh")
        .filter(
            ~(
                (F.col("doc_id") == F.col("keeper.doc_id"))
                & (F.col("pos") == F.col("keeper.pos"))
            )
        )
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.lit(w - 1))
            ).alias("p"),
        )
        .groupBy("doc_id")
        .agg(F.collect_set("p").alias("drop_pos"))
    )
    arr = F.split(F.col("text"), " ")
    dp = F.coalesce(
        F.col("drop_pos"), F.array().cast("array<int>")
    )
    return (
        documents.join(drop_pos, "doc_id", "left")
        .select(
            "doc_id",
            F.array_join(
                F.filter(arr, lambda x, i: ~F.array_contains(dp, i)),
                " ",
            ).alias("clean_text"),
            F.size(arr).cast("bigint").alias("n_words"),
            F.size(dp).cast("bigint").alias("n_dropped"),
        )
    )


def repeated_span_removal_sql(
    w: int = SPAN_W, min_count: int = SPAN_MIN_COUNT
) -> str:
    """DuckDB oracle: identical span unit, hash, keeper rule, and
    reassembly (string_agg over surviving 0-based positions)."""
    gh = md5_hash64_sql(f"array_to_string(w[i:i+{w - 1}], ' ')")
    offsets = ", ".join(str(u) for u in range(w))
    return f"""
WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
gi AS (SELECT doc_id, w,
              unnest(range(1, greatest(len(w) - {w - 1}, 0) + 1)) AS i
       FROM ws),
occ AS (SELECT doc_id, i - 1 AS pos, {gh} AS gh FROM gi),
cnt AS (SELECT doc_id, pos, gh,
               count(*) OVER (PARTITION BY gh) AS c,
               row_number() OVER (PARTITION BY gh
                                  ORDER BY doc_id, pos) AS rn
        FROM occ),
cover AS (SELECT DISTINCT doc_id, pos + u AS pos
          FROM cnt CROSS JOIN (SELECT unnest([{offsets}]) AS u) t
          WHERE c >= {min_count} AND rn > 1),
wi AS (SELECT doc_id, w, unnest(range(1, len(w) + 1)) AS i FROM ws),
words AS (SELECT doc_id, i - 1 AS pos, w[i] AS word FROM wi),
kept AS (SELECT a.doc_id, a.pos, a.word FROM words a
         WHERE NOT EXISTS (SELECT 1 FROM cover c
                           WHERE c.doc_id = a.doc_id AND c.pos = a.pos)),
agg AS (SELECT doc_id, string_agg(word, ' ' ORDER BY pos) AS clean_text,
               count(*) AS n_kept
        FROM kept GROUP BY doc_id),
dc AS (SELECT doc_id, count(*) AS n_drop FROM cover GROUP BY doc_id)
SELECT d.doc_id,
       coalesce(a.clean_text, '') AS clean_text,
       CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_words,
       CAST(coalesce(dc.n_drop, 0) AS BIGINT) AS n_dropped
FROM documents d
LEFT JOIN agg a USING (doc_id)
LEFT JOIN dc USING (doc_id)
"""


def repeated_span_profile(
    documents: DataFrame, w: int = SPAN_W, min_count: int = SPAN_MIN_COUNT
) -> DataFrame:
    """One row: corpus-level boilerplate accounting for the removal —
    how much of the corpus the repeated-span rule would drop. Same
    pipeline, final fold only (the per-doc output never materializes
    driver-side)."""
    out = repeated_span_removal(documents, w, min_count)
    return out.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").cast("bigint").alias("total_words"),
        F.sum("n_dropped").cast("bigint").alias("dropped_words"),
        F.round(F.sum("n_dropped") / F.sum("n_words"), 6).alias(
            "drop_share"
        ),
    )


def repeated_span_profile_sql(
    w: int = SPAN_W, min_count: int = SPAN_MIN_COUNT
) -> str:
    return f"""
WITH per_doc AS ({repeated_span_removal_sql(w, min_count)})
SELECT count(*) AS n_docs,
       CAST(sum(n_words) AS BIGINT) AS total_words,
       CAST(sum(n_dropped) AS BIGINT) AS dropped_words,
       round(sum(n_dropped)::DOUBLE / sum(n_words), 6) AS drop_share
FROM per_doc
"""


# ---------------------------------------------------------------------------
# Soft dedup: duplication-aware loss weights
# ---------------------------------------------------------------------------

def soft_dedup_weights(
    documents: DataFrame,
    tau: float = JACCARD_TAU,
    comp: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, cluster_size, weight): down-weight near-duplicates instead
    of dropping them — weight = 1/|cluster| so each near-dup cluster
    contributes one document's worth of gradient in total (the "soft
    deduplication" alternative to hard removal, e.g. SoftDedup, He et al.
    2024; sum(weight) is the corpus's effective size).

    Scale shape: the clustered-docs table (only docs in ≥1 LSH pair — the
    near-dup share of the corpus, a small fraction at scale) LEFT-joins
    onto the corpus by doc_id and broadcasts under AQE; everything else
    defaults to weight 1 without shuffling. Reuses the shared LSH
    pair/component pipeline via ``comp`` like the other cluster consumers.
    """
    clusters = dedup_clusters(documents, tau=tau, comp=comp).select(
        "doc_id", "cluster_size"
    )
    return documents.select("doc_id").join(clusters, "doc_id", "left").select(
        "doc_id",
        F.coalesce("cluster_size", F.lit(1)).cast("bigint").alias(
            "cluster_size"
        ),
        F.round(
            F.lit(1.0) / F.coalesce("cluster_size", F.lit(1)), 6
        ).alias("weight"),
    )


def soft_dedup_weights_sql(tau: float = JACCARD_TAU) -> str:
    return f"""
WITH clusters AS ({dedup_clusters_sql(tau)})
SELECT d.doc_id,
       CAST(coalesce(c.cluster_size, 1) AS BIGINT) AS cluster_size,
       round(1.0 / coalesce(c.cluster_size, 1), 6) AS weight
FROM documents d LEFT JOIN clusters c USING (doc_id)
"""


def source_overlap_matrix(
    documents: DataFrame,
    pairs: DataFrame | None = None,
    tau: float = JACCARD_TAU,
) -> DataFrame:
    """(source_a, source_b, n_pairs) — cross-source near-duplicate
    containment: how many verified MinHash-LSH pairs land on each
    unordered source pair. The provenance diagnostic a corpus curator
    reads before mixing sources — a hot off-diagonal cell means source B
    is largely a re-crawl/mirror of source A, so keeping both at full
    ``source_mix_weights`` weight double-counts that content.

    Composition, not new machinery: the verified pair table (shared,
    persisted — same candidates every registry consumer sees) joined
    twice to the O(corpus) (doc_id, source) projection, then normalized
    with least/greatest so (A,B) and (B,A) count as one cell and
    intra-source duplication shows on the diagonal.

    Scale: both joins are equi-joins on the doc key; the pair table is
    orders of magnitude smaller than the corpus (near-dup pairs, not all
    pairs), so AQE picks a broadcast of the pair side when it fits and a
    keyed shuffle otherwise; the final agg is map-side combined over
    O(sources²) cells.
    """
    if pairs is None:
        pairs = minhash_lsh_pairs(documents, tau=tau)
    lab = documents.select("doc_id", "source")
    j = (
        pairs.select("doc_a", "doc_b")
        .join(
            lab.select(
                F.col("doc_id").alias("doc_a"), F.col("source").alias("sa")
            ),
            "doc_a",
        )
        .join(
            lab.select(
                F.col("doc_id").alias("doc_b"), F.col("source").alias("sb")
            ),
            "doc_b",
        )
    )
    return (
        j.select(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


def source_overlap_matrix_sql(tau: float = JACCARD_TAU) -> str:
    """DuckDB oracle: the LSH pair query labelled and folded identically."""
    return f"""
WITH pairs AS ({minhash_lsh_pairs_sql(tau)})
SELECT least(la.source, lb.source) AS source_a,
       greatest(la.source, lb.source) AS source_b,
       count(*) AS n_pairs
FROM pairs p
JOIN documents la ON la.doc_id = p.doc_a
JOIN documents lb ON lb.doc_id = p.doc_b
GROUP BY 1, 2
"""


def prefix_filter_pairs(
    documents: DataFrame,
    tau: float = JACCARD_TAU,
    index: tuple[DataFrame, DataFrame | None] | None = None,
) -> DataFrame:
    """EXACT near-dup pairs (Jaccard ≥ tau) via df-ordered prefix
    filtering — the PPJoin-family set-similarity join (Chaudhuri et al.
    ICDE 2006; Xiao et al. WWW 2008), public literature.

    The third candidate generator next to the full inverted index
    (``ngram_jaccard_pairs``) and MinHash banding (``minhash_lsh_pairs``),
    with a different contract: exact like the former (100% recall
    GUARANTEED, unlike LSH) but with candidate fan-out bounded like the
    latter. Sort each doc's shingles rarest-first (ascending document
    frequency — one global order shared by all docs); if J(A,B) ≥ τ, the
    first |S| − ⌈τ·|S|⌉ + 1 shingles of A and of B must share one
    (prefix-filter lemma: were the prefixes disjoint, the smallest common
    shingle sits in one side's suffix, forcing ALL common shingles into
    that suffix of size ⌈τ|S|⌉ − 1 < τ|S| ≤ required overlap). So the
    self-join probes only prefixes — at τ=0.5, half of each posting
    list, and crucially the RAREST half: boilerplate shingles with huge
    posting lists sort last and never enter a prefix, which is exactly
    the fan-out the hot-shingle cut fights, obtained here without
    sacrificing exactness. A length filter (τ·|A| ≤ |B| ≤ |A|/τ) prunes
    candidates before the distinct.

    Because exactness is the contract, prefixes and verification both run
    on the FULL shingle table even when the hot-shingle cut is active —
    the df-ascending prefix is this operator's own fan-out bound. Oracle:
    ``ngram_jaccard_pairs_sql`` — an independent formulation (full
    inverted-index join) that must produce the identical pair set.

    Shuffle ledger: df agg on sh (map-side combined), index⋈df
    co-partitioned on sh, one per-doc window on doc_id, prefix self-join
    on sh, then the shared candidate verification. Every join is keyed.
    """
    ex_cut, sh_all = (
        index if index is not None else _shingle_index(documents, SHINGLE_DF_CUT)
    )
    ex = ex_cut if sh_all is None else sh_all
    df_tbl = ex.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    w_ord = Window.partitionBy("doc_id").orderBy("df", "sh")
    w_doc = Window.partitionBy("doc_id")
    pref = (
        ex.join(df_tbl, "sh")
        .withColumn("nsh", F.count(F.lit(1)).over(w_doc))
        .withColumn("pos", F.row_number().over(w_ord))
        .filter(
            F.col("pos")
            <= F.col("nsh") - F.ceil(F.lit(tau) * F.col("nsh")) + 1
        )
        .select("doc_id", "sh", "nsh")
    )
    a, b = pref.alias("a"), pref.alias("b")
    cand = (
        a.join(b, "sh")
        .filter(
            (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.lit(tau) * F.col("a.nsh") <= F.col("b.nsh"))
            & (F.lit(tau) * F.col("b.nsh") <= F.col("a.nsh"))
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    return (
        _verify_candidates(ex, cand, tau)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )


def chunk_dedup_docs(documents: DataFrame, w: int = 64) -> DataFrame:
    """(doc_id, n_chunks, n_dropped, clean_text) — corpus-wide CHUNK
    dedup: split every document into consecutive ``w``-token chunks, keep
    only the FIRST occurrence (smallest (doc_id, chunk_id)) of each
    distinct chunk corpus-wide, and rebuild each document from its
    surviving chunks in order. The chunk-granularity sibling of
    ``repeated_span_removal`` (which keys on sliding word-4-grams):
    coarser and cheaper — one key per w tokens instead of one per token —
    the trade production pipelines take when deduplicating partially-
    copied documents that whole-doc dedup misses (MassiveText, Rae et al.
    2021 §A.2, dedups exact n-gram chunks; RefinedWeb, Penedo et al.
    2023, drops duplicated spans).

    The text column never shuffles: chunk occurrences travel as 8-byte
    md5 keys; the keeper per key is a map-side-combinable min(struct)
    aggregate (no window over a possibly-enormous hot-chunk group); only
    DUPLICATED keys (typically a small share of the corpus) join back to
    the occurrence list, collapse to a per-doc drop-position array, and
    equi-join onto the corpus on the doc key — docs with nothing to drop
    take the left-join fast path. Rebuilding is a codegen'd positional
    ``filter`` + ``array_join`` over the re-derived chunk array, in
    place, in the scan stage. A 2^-60 chunk-hash collision can only
    over-drop; the oracle hashes identically so both engines agree.
    """
    from ..functions.hashing import md5_hash64
    from ..functions.text import chunk_documents

    ch = chunk_documents(documents, w).select(
        "doc_id", "chunk_id", md5_hash64(F.col("chunk_text")).alias("h")
    )
    dup = (
        ch.groupBy("h")
        .agg(
            F.min(F.struct("doc_id", "chunk_id")).alias("keep"),
            F.count(F.lit(1)).alias("c"),
        )
        .filter(F.col("c") > 1)
        .select("h", "keep")
    )
    drops = (
        ch.join(dup, "h")
        .filter(
            (F.col("doc_id") != F.col("keep.doc_id"))
            | (F.col("chunk_id") != F.col("keep.chunk_id"))
        )
        .groupBy("doc_id")
        .agg(F.collect_list("chunk_id").alias("__drop"))
    )
    ws = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    n_chunks = F.ceil(F.size(ws) / F.lit(w)).cast("bigint")
    chunks = F.when(n_chunks > 0, F.transform(
        F.sequence(F.lit(0), (n_chunks - 1).cast("int")),
        lambda i: F.array_join(F.slice(ws, i * w + 1, w), " "),
    )).otherwise(F.array().cast("array<string>"))
    no_drop = F.array().cast("array<int>")
    kept = F.filter(
        chunks,
        lambda c, i: ~F.array_contains(
            F.coalesce(F.col("__drop"), no_drop), i.cast("int")
        ),
    )
    return documents.join(drops, "doc_id", "left").select(
        "doc_id",
        n_chunks.alias("n_chunks"),
        F.coalesce(F.size("__drop"), F.lit(0)).cast("bigint").alias("n_dropped"),
        F.array_join(kept, " ").alias("clean_text"),
    )


def chunk_dedup_docs_sql(w: int = 64) -> str:
    """DuckDB oracle: identical chunking/hash/keeper; rebuilds by
    string-aggregating kept occurrences in chunk order."""
    from ..functions.hashing import md5_hash64_sql
    from ..functions.text import chunk_documents_sql

    h = md5_hash64_sql("chunk_text")
    return f"""
WITH ch AS (
  SELECT doc_id, chunk_id, chunk_text, {h} AS h
  FROM ({chunk_documents_sql(w)})),
ranked AS (
  SELECT doc_id, chunk_id, chunk_text,
         row_number() OVER (PARTITION BY h ORDER BY doc_id, chunk_id) AS rk
  FROM ch),
per AS (
  SELECT doc_id,
         count(*) AS n_chunks,
         CAST(sum(CASE WHEN rk > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
         coalesce(string_agg(CASE WHEN rk = 1 THEN chunk_text END,
                             ' ' ORDER BY chunk_id), '') AS clean_text
  FROM ranked GROUP BY doc_id)
SELECT d.doc_id,
       CAST(coalesce(p.n_chunks, 0) AS BIGINT) AS n_chunks,
       coalesce(p.n_dropped, 0) AS n_dropped,
       coalesce(p.clean_text, '') AS clean_text
FROM documents d LEFT JOIN per p USING (doc_id)
"""


# ---------------------------------------------------------------------------
# Cross-document maximal shared spans (ExactSubstr-style)
# ---------------------------------------------------------------------------

SPAN_GRAM_K = 8
SPAN_MIN_TOKENS = 12
SPAN_GRAM_CUT = 100_000


def crossdoc_shared_spans(
    documents: DataFrame,
    k: int = SPAN_GRAM_K,
    min_span: int = SPAN_MIN_TOKENS,
    cut: int = SPAN_GRAM_CUT,
) -> DataFrame:
    """(doc_a, doc_b, a_start, b_start, span_tokens) — every MAXIMAL
    token span of >= ``min_span`` tokens shared verbatim between two
    different documents: the ExactSubstr signal of Lee et al. 2022
    ("Deduplicating Training Data Makes Language Models Better"), which
    catches partial copies that whole-doc and chunk dedup both miss
    (their suffix-array single-machine algorithm re-expressed as a
    distributed inverted-index + diagonal-run merge).

    Method: slide a width-``k`` token window over every document
    (one codegen'd ``transform`` + ``posexplode``, 8-byte md5-prefix
    keys — the text itself never shuffles); self-join the gram index on
    the key with ``doc_a < doc_b``; merge matches into maximal runs per
    (pair, diagonal) with the classic gap-and-island ``pos − row_number``
    trick — ``r`` consecutive matching k-grams on one diagonal certify a
    shared span of exactly ``r + k − 1`` tokens, and run-maximality IS
    span-maximality because overlapping k-grams chain equality.

    Scale: the pair explosion is bounded by the posting-list cut
    (``count(*) <= cut`` per gram — boilerplate grams shared by half the
    corpus never enter the join; mirrored exactly in the oracle); match
    volume is then Σ postings², the same budget shape as
    ``decontamination_check``. The run merge is one window per
    (pair, diagonal) group over an exchange already keyed by the pair.
    A 2^-60 gram-key collision can only merge unrelated grams; the
    oracle hashes identically so both engines agree bit-for-bit.

    The gram index persists once (``persist_once``): it feeds the
    posting-count cut AND both sides of the pair join, and the md5
    projection over every token position is the single most expensive
    map stage here — recomputing it three times would triple it.
    """
    from ..functions.hashing import md5_hash64
    from ..session import persist_once

    ws = F.split(F.col("text"), " ")
    grams = persist_once(
        documents.filter(F.size(ws) >= k)
        .select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), F.size(ws) - k + 1),
                    lambda i: md5_hash64(
                        F.array_join(F.slice(ws, i, k), " ")
                    ),
                )
            ).alias("pos0", "gh"),
        )
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "gh")
    )
    keep = (
        grams.groupBy("gh")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") <= cut)
        .select("gh")
    )
    g = grams.join(keep, "gh")
    a, b = g.alias("a"), g.alias("b")
    m = (
        a.join(b, "gh")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.pos").alias("pa"),
            F.col("b.pos").alias("pb"),
        )
    )
    w = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pa")
    runs = m.withColumn("diag", F.col("pa") - F.col("pb")).withColumn(
        "rk", F.col("pa") - F.row_number().over(w)
    )
    return (
        runs.groupBy("doc_a", "doc_b", "diag", "rk")
        .agg(
            F.min("pa").alias("a_start"),
            F.min("pb").alias("b_start"),
            (F.count(F.lit(1)) + k - 1).alias("span_tokens"),
        )
        .filter(F.col("span_tokens") >= min_span)
        .select(
            "doc_a",
            "doc_b",
            F.col("a_start").cast("bigint").alias("a_start"),
            F.col("b_start").cast("bigint").alias("b_start"),
            F.col("span_tokens").cast("bigint").alias("span_tokens"),
        )
    )


def crossdoc_shared_spans_sql(
    k: int = SPAN_GRAM_K,
    min_span: int = SPAN_MIN_TOKENS,
    cut: int = SPAN_GRAM_CUT,
) -> str:
    """Oracle: identical gram keys, posting cut, and diagonal-run merge."""
    from ..functions.hashing import md5_hash64_sql

    gh = md5_hash64_sql(f"array_to_string(w[i:i+{k}-1], ' ')")
    return f"""
WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
grams AS (
  SELECT doc_id, u.pos, u.gh FROM (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, len(w) - {k} + 1),
                  i -> struct_pack(pos := i, gh := {gh}))) AS u
    FROM ws WHERE len(w) >= {k})),
occ AS (SELECT gh FROM grams GROUP BY gh HAVING count(*) <= {cut}),
g AS (SELECT grams.* FROM grams JOIN occ USING (gh)),
m AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pa, b.pos AS pb
      FROM g a JOIN g b USING (gh) WHERE a.doc_id < b.doc_id),
runs AS (SELECT doc_a, doc_b, pa - pb AS diag, pa, pb,
                pa - row_number() OVER (PARTITION BY doc_a, doc_b, pa - pb
                                        ORDER BY pa) AS rk
         FROM m)
SELECT doc_a, doc_b,
       CAST(min(pa) AS BIGINT) AS a_start,
       CAST(min(pb) AS BIGINT) AS b_start,
       CAST(count(*) + {k} - 1 AS BIGINT) AS span_tokens
FROM runs GROUP BY doc_a, doc_b, diag, rk
HAVING count(*) + {k} - 1 >= {min_span}
"""


def crossdoc_span_scrub(
    documents: DataFrame,
    k: int = SPAN_GRAM_K,
    min_span: int = SPAN_MIN_TOKENS,
    cut: int = SPAN_GRAM_CUT,
) -> DataFrame:
    """(doc_id, n_tokens, n_dropped_tokens, clean_text) — the APPLY side
    of ExactSubstr dedup (Lee et al. 2022 drop one copy of every
    duplicated substring): for each maximal shared span found by
    ``crossdoc_shared_spans``, the LOWEST-id document keeps its copy and
    every other occurrence is deleted from its host; documents touching
    no span pass through verbatim. One-pass policy, as in the published
    implementation — deletions are not re-mined for adjacencies they
    create.

    Scale: the span table covers only overlapping doc pairs (≪ corpus),
    so its per-doc interval collapse is tiny and the interval arrays
    equi-join back onto the corpus on the doc key — docs with nothing to
    drop take the left-join fast path, and the rebuild is a codegen'd
    positional ``filter`` + ``array_join`` in the scan stage; the text
    column itself never shuffles.
    """
    spans = crossdoc_shared_spans(documents, k, min_span, cut)
    iv = (
        spans.select(
            F.col("doc_b").alias("doc_id"),
            F.struct(
                F.col("b_start").alias("s"),
                (F.col("b_start") + F.col("span_tokens") - 1).alias("e"),
            ).alias("iv"),
        )
        .groupBy("doc_id")
        .agg(F.collect_list("iv").alias("__iv"))
    )
    ws = F.split(F.col("text"), " ")
    no_iv = F.array().cast("array<struct<s:bigint,e:bigint>>")
    ivs = F.coalesce(F.col("__iv"), no_iv)
    kept = F.filter(
        ws,
        lambda t, i: ~F.exists(
            ivs, lambda s: (i + 1 >= s["s"]) & (i + 1 <= s["e"])
        ),
    )
    return documents.join(iv, "doc_id", "left").select(
        "doc_id",
        F.size(ws).cast("bigint").alias("n_tokens"),
        (F.size(ws) - F.size(kept)).cast("bigint").alias("n_dropped_tokens"),
        F.array_join(kept, " ").alias("clean_text"),
    )


def crossdoc_span_scrub_sql(
    k: int = SPAN_GRAM_K,
    min_span: int = SPAN_MIN_TOKENS,
    cut: int = SPAN_GRAM_CUT,
) -> str:
    """Oracle: the span CTE, per-token dropped mark via interval EXISTS,
    ordered string_agg rebuild."""
    return f"""
WITH spans AS ({crossdoc_shared_spans_sql(k, min_span, cut)}),
iv AS (SELECT doc_b AS doc_id, b_start AS s,
              b_start + span_tokens - 1 AS e
       FROM spans),
toks AS (
  SELECT doc_id, u.pos, u.tok FROM (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, len(w)),
                  i -> struct_pack(pos := i, tok := w[i]))) AS u
    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents))),
marked AS (
  SELECT t.doc_id, t.pos, t.tok,
         EXISTS(SELECT 1 FROM iv
                WHERE iv.doc_id = t.doc_id
                  AND t.pos BETWEEN iv.s AND iv.e) AS dropped
  FROM toks t)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN dropped THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dropped_tokens,
       coalesce(string_agg(CASE WHEN NOT dropped THEN tok END,
                           ' ' ORDER BY pos), '') AS clean_text
FROM marked GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# Sorted-neighborhood blocking (entity-resolution windowing)
# ---------------------------------------------------------------------------

SNB_W = 8          # neighborhood width: pairs within w positions of the sort
SNB_TAU = 0.9      # word-set Jaccard verify threshold (word sets of the
                   # small-vocab fixture overlap heavily by chance; 0.9
                   # keeps the verified set at genuine near-dup density)
SNB_KEY_WORDS = 4  # blocking key = the 4 smallest-by-hash distinct words


def _snb_ranked(documents: DataFrame, key_words: int = SNB_KEY_WORDS) -> DataFrame:
    """(doc_id, wset, rnk) — every document's global rank in
    (blocking-key, doc_id) order, computed WITHOUT a single-task global
    window.

    The blocking key joins the md5 digests of the ``key_words``
    smallest-BY-HASH distinct words — i.e. the sort order is MinHash
    order: two documents agree on their minimum-hash word with
    probability equal to their word-set Jaccard, so near-duplicates sort
    adjacently (word-order-insensitive), while the key's *leading
    characters* are uniform hex. That uniformity is what makes the rank
    distributable: the global rank uses the driver-folded-offsets
    pattern of ``training_shard_manifest`` (splits.py), whose bucket must
    be a *weakly order-preserving* function of the key (hash buckets
    would scramble the sort) — here bucket = int(first two hex chars),
    valid because hex-string lexicographic order equals its numeric
    order, and balanced because min-hash digests are uniform (a lexical
    key like "the 4 smallest words" measured 77% of the fixture in one
    bucket — every corpus shares its alphabetically-first stopword; the
    hashed key spreads the same corpus across all 256). Per-bucket counts
    (256 tiny rows) fold to start offsets on the driver; each bucket then
    ranks independently. Residual skew = groups with identical 4-word
    min-hash keys, i.e. actual duplicate clusters — bounded by dup-group
    size, not corpus size.

    Everything is a pure projection of row values (no persist, no sampled
    range partitioner), so re-execution reproduces ranks bit-identically.
    """
    wset = F.array_sort(F.array_distinct(F.split(F.col("text"), " ")))
    hkey = F.array_join(
        F.slice(
            F.array_sort(F.transform(F.col("wset"), lambda x: F.md5(x))),
            1,
            key_words,
        ),
        " ",
    )
    t = documents.select("doc_id", wset.alias("wset")).withColumn(
        "bkey", hkey
    )
    bucket = F.conv(F.substring("bkey", 1, 2), 16, 10).cast("int")
    t = t.withColumn("__b", bucket)
    counts = t.groupBy("__b").count().collect()
    acc = 0
    offsets = []
    for r in sorted(counts, key=lambda r: r["__b"]):
        offsets.append((r["__b"], acc))
        acc += r["count"]
    off_df = local_df(t.sparkSession, offsets, "__b int, __off bigint")
    w = Window.partitionBy("__b").orderBy("bkey", "doc_id")
    return (
        t.join(F.broadcast(off_df), "__b")
        .withColumn("rnk", F.col("__off") + F.row_number().over(w))
        .select("doc_id", "wset", "rnk")
    )


def sorted_neighborhood_pairs(
    documents: DataFrame, w: int = SNB_W, tau: float = SNB_TAU
) -> DataFrame:
    """(doc_a, doc_b, gap, jaccard) — the classic sorted-neighborhood
    blocking method (Hernández & Stolfo, SIGMOD '95): sort the corpus by a
    content-derived blocking key, compare only documents within ``w``
    positions of each other, verify candidates with exact word-set
    Jaccard ≥ ``tau``.

    Complements the existing candidate generators (LSH bands, SimHash
    chunks, PPJoin prefixes): sorted-neighborhood bounds the *comparison
    count* at exactly N·w regardless of key skew — no bucket can go
    quadratic, the trade being recall limited to key-adjacent pairs (the
    standard multi-pass answer is a second key; the fixture's shuffled
    near-dups share the full word set, so one key suffices there).

    Spark shape: global ranks from ``_snb_ranked`` (driver-folded bucket
    offsets, no global window), then the band trick turns |rnk_a − rnk_b|
    ≤ w into an *equi*-join — band = (rnk−1) div w; any qualifying pair
    has band_b ∈ {band_a, band_a+1}, so the left side explodes into those
    two keys and the join matches each pair exactly once. Word-set arrays
    ride the candidate join so verification is an array intersect in
    whole-stage codegen — no second pass over the corpus.
    """
    r = _snb_ranked(documents)
    band_a = F.expr(f"(rnk - 1) div {w}")
    left = (
        r.select(
            F.col("doc_id").alias("doc_a"),
            F.col("rnk").alias("rnk_a"),
            F.col("wset").alias("wset_a"),
        )
        .withColumn(
            "__band",
            F.explode(
                F.array(
                    F.expr(f"(rnk_a - 1) div {w}"),
                    F.expr(f"(rnk_a - 1) div {w} + 1"),
                )
            ),
        )
    )
    right = r.select(
        F.col("doc_id").alias("doc_b"),
        F.col("rnk").alias("rnk_b"),
        F.col("wset").alias("wset_b"),
        F.expr(f"(rnk - 1) div {w}").alias("__band"),
    )
    inter = F.size(F.array_intersect("wset_a", "wset_b"))
    jac = inter / (F.size("wset_a") + F.size("wset_b") - inter)
    return (
        left.join(right, "__band")
        .filter(
            (F.col("rnk_b") > F.col("rnk_a"))
            & (F.col("rnk_b") <= F.col("rnk_a") + w)
        )
        .select(
            "doc_a",
            "doc_b",
            (F.col("rnk_b") - F.col("rnk_a")).cast("bigint").alias("gap"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= tau)
    )


def sorted_neighborhood_pairs_sql(
    w: int = SNB_W, tau: float = SNB_TAU, key_words: int = SNB_KEY_WORDS
) -> str:
    """DuckDB oracle: the same key, a literal global ROW_NUMBER (fine at
    oracle SF — the sequential sort is exactly what the engine avoids),
    a rank-distance theta join, and the identical Jaccard arithmetic
    (integer intersect/union sizes, one double division on each side)."""
    return f"""
WITH t AS (
  SELECT doc_id,
         list_sort(list_distinct(string_split(text, ' '))) AS wset
  FROM documents),
r AS (
  SELECT doc_id, wset,
         ROW_NUMBER() OVER (
           ORDER BY array_to_string(
             list_sort(list_transform(wset, x -> md5(x)))[1:{key_words}],
             ' '), doc_id) AS rnk
  FROM t),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         b.rnk - a.rnk AS gap,
         len(list_intersect(a.wset, b.wset)) AS inter,
         len(a.wset) + len(b.wset) AS stot
  FROM r a JOIN r b ON b.rnk > a.rnk AND b.rnk <= a.rnk + {w})
SELECT doc_a, doc_b, CAST(gap AS BIGINT) AS gap,
       inter / (stot - inter) AS jaccard
FROM cand
WHERE inter / (stot - inter) >= {tau!r}
"""
