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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..session import local_df

from ..functions.hashing import HASH_BITS, md5_hash64, md5_hash64_sql
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


SAMPLE_SALT = "sample-v1"


def stratified_sample(
    documents: DataFrame,
    group_col: str = "lang",
    n_per_group: int = 20,
    n_salts: int = 16,
) -> DataFrame:
    """(doc_id, <group_col>, rk) — deterministic equal-size per-stratum
    sample: the ``n_per_group`` docs with the smallest salted hash in each
    group (all of them when a group is smaller).

    Why not ``df.sampleBy``: its strata fractions are partition-order- and
    RNG-state-dependent, so two runs (or a re-layout) sample different
    docs. Ordering each stratum by a salted md5 of the key is a pure
    projection — reproducible across runs, re-layouts, engines (the
    DuckDB oracle recomputes it), and appends (a new doc displaces at
    most one sampled doc in its own stratum).

    Two-phase top-n so a pathologically hot stratum never sorts in one
    task: phase 1 ranks within (stratum, salt) — ``n_salts``-way parallel
    per stratum, keeping ≤ n_salts·n_per_group candidates per stratum —
    and phase 2 ranks the surviving candidates per stratum. Top-n-by-hash
    is associative (every global top-n row is in its salt's top-n), so
    the result — ranks included — is identical to the single-phase form
    and the same DuckDB oracle checks it. The salt is xxhash64 (JVM-fast;
    it never reaches the output, so engine portability doesn't apply).
    """
    hk = md5_hash64(
        F.concat(F.lit(SAMPLE_SALT + ":"), F.col("doc_id").cast("string"))
    )
    salt = F.pmod(F.xxhash64(F.col("doc_id")), F.lit(n_salts))
    w1 = Window.partitionBy(group_col, "__salt").orderBy("__hk", "doc_id")
    w2 = Window.partitionBy(group_col).orderBy("__hk", "doc_id")
    candidates = (
        documents.select(
            "doc_id", group_col, hk.alias("__hk"), salt.alias("__salt")
        )
        .withColumn("__rk1", F.row_number().over(w1))
        .filter(F.col("__rk1") <= n_per_group)
    )
    return (
        candidates.select(
            "doc_id", group_col, F.row_number().over(w2).alias("rk")
        )
        .filter(F.col("rk") <= n_per_group)
    )


def stratified_sample_sql(
    group_col: str = "lang", n_per_group: int = 20
) -> str:
    """DuckDB oracle: identical salted-hash ranking."""
    hk = md5_hash64_sql(f"'{SAMPLE_SALT}:' || doc_id::VARCHAR")
    return f"""
WITH ranked AS (
  SELECT doc_id, {group_col},
         row_number() OVER (PARTITION BY {group_col}
                            ORDER BY {hk}, doc_id) AS rk
  FROM documents)
SELECT doc_id, {group_col}, rk FROM ranked WHERE rk <= {n_per_group}
"""


# Temperature exponent for source mixing. Fixed at 0.5 so the weight is
# sqrt(p): IEEE-754 sqrt is correctly rounded on every platform, making the
# Spark and DuckDB doubles bit-identical (a general pow(p, α) can differ by
# an ulp across libm implementations and break the oracle hash).
MIX_ALPHA = 0.5
_MIX_QUANT = 1_000_000_000_000  # quantize weights to ints before summing


def source_mix_weights(documents: DataFrame) -> DataFrame:
    """(source, n_docs, sum_tokens, p_tokens, mix_weight) — temperature-
    smoothed multinomial sampling weights per corpus source: w_i ∝
    p_i^0.5, the standard upsampling of low-resource sources when mixing
    heterogeneous corpora into one training stream.

    Numeric parity is by construction, not tolerance: p_i is an exact
    BIGINT/BIGINT double division; sqrt is correctly rounded; the weight
    is quantized to an integer (×1e12, round-half-up — same rule both
    engines) BEFORE normalization so the cross-source sum is exact
    integer arithmetic — double-summation order, which differs between
    engines and across Spark shuffle arrivals, can never move the hash.

    Scale: two global windows, but over the per-SOURCE aggregate — its
    cardinality is the number of corpus sources (thousands at worst),
    not documents, so the single-partition exchange moves O(sources)
    rows after a map-side-combined aggregation of the corpus.
    """
    per = documents.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split(F.col("text"), " "))).cast("bigint").alias("sum_tokens"),
    )
    # Constant partition key: same single-partition exchange over the
    # O(sources)-row aggregate, but a non-empty partitionSpec keeps Spark
    # from printing "No Partition Defined for Window" into the bench tail
    # (the stdout contract allows exactly one JSON line). A literal key
    # won't do — EliminateWindowPartitions folds it away and the warning
    # returns — so the key is substring(source, 1, 0): always '' but
    # non-foldable.
    wall = Window.partitionBy(F.substring(F.col("source"), 1, 0))
    p = F.col("sum_tokens") / F.sum("sum_tokens").over(wall)
    quant = per.withColumn(
        "p_tokens", F.round(p, 6)
    ).withColumn(
        "__wq", F.round(F.sqrt(p) * _MIX_QUANT, 0).cast("bigint")
    )
    return quant.select(
        "source",
        "n_docs",
        "sum_tokens",
        "p_tokens",
        F.round(F.col("__wq") / F.sum("__wq").over(wall), 6).alias("mix_weight"),
    )


def source_mix_weights_sql() -> str:
    """DuckDB oracle: identical exact-integer normalization."""
    return f"""
WITH per AS (
  SELECT source, count(*) AS n_docs,
         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS sum_tokens
  FROM documents GROUP BY source),
q AS (
  SELECT source, n_docs, sum_tokens,
         round(CAST(sum_tokens AS DOUBLE) / sum(sum_tokens) OVER (), 6) AS p_tokens,
         CAST(round(sqrt(CAST(sum_tokens AS DOUBLE) / sum(sum_tokens) OVER ())
                    * {_MIX_QUANT}, 0) AS BIGINT) AS wq
  FROM per)
SELECT source, n_docs, sum_tokens, p_tokens,
       round(CAST(wq AS DOUBLE) / sum(wq) OVER (), 6) AS mix_weight
FROM q
"""


SHARD_SALT = "shard-v1"
SHARD_TOKEN_BUDGET = 2500


def training_shard_manifest(
    documents: DataFrame, token_budget: int = SHARD_TOKEN_BUDGET
) -> DataFrame:
    """(shard_id, n_docs, sum_tokens) — contiguous token-budget packing of
    the corpus in a deterministic shuffled order: the manifest a training
    run reads to pull ~equal-token shards.

    Two training-pipeline needs in one pass: a *global deterministic
    shuffle* (order by salted md5 of the doc key — reproducible across
    runs/re-layouts, no RNG state) and *token-aware sharding* (shard i =
    docs whose cumulative-token start offset falls in
    [i·budget, (i+1)·budget)).

    The cumulative sum is a distributed scan, NOT a single-task global
    window, and every intermediate is a *pure projection of row values*
    so any re-execution reproduces it bit-identically (no sampled range
    partitioner, no persist to pin, no GC coupling): bucket each row by
    the top bits of its order key ``hk`` (md5-uniform, so buckets are
    balanced; bucket ranges are contiguous in hk, so (bucket, hk,
    doc_id) order ≡ global (hk, doc_id) order), fold the per-bucket
    token sums into start offsets on the driver (B tiny rows), then a
    per-bucket running-sum window plus the broadcast offset. Every task
    touches ~1/B of the data; nothing sequential anywhere. Costs one
    extra pruned 3-column scan instead of materializing the whole corpus
    in executor storage — the right trade at 100 TB.
    """
    sc = documents.sparkSession.sparkContext
    n_buckets = 1
    while n_buckets < max(sc.defaultParallelism, 64):
        n_buckets *= 2
    # hk is non-negative and spans [0, 2**HASH_BITS) (60 bits, not signed
    # 64) — shifting within that domain yields bucket ids covering the
    # full [0, n_buckets) range, so the prefix-sum agg and per-bucket
    # window genuinely run B-way parallel.
    shift = HASH_BITS - (n_buckets.bit_length() - 1)

    hk = md5_hash64(
        F.concat(F.lit(SHARD_SALT + ":"), F.col("doc_id").cast("string"))
    )
    t = documents.select(
        "doc_id",
        hk.alias("hk"),
        F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
    ).withColumn(
        "__b", F.shiftright(F.col("hk"), shift).cast("int")
    )
    psums = t.groupBy("__b").agg(F.sum("n_tokens").alias("__t")).collect()
    acc = 0
    offsets = []
    for r in sorted(psums, key=lambda r: r["__b"]):
        offsets.append((r["__b"], acc))
        acc += r["__t"]
    off_df = local_df(documents.sparkSession, offsets, "__b int, __off bigint")
    w = (
        Window.partitionBy("__b")
        .orderBy("hk", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.col("__off") + F.sum("n_tokens").over(w) - F.col("n_tokens")
    return (
        t.join(F.broadcast(off_df), "__b")
        .select("doc_id", "n_tokens", start.alias("start_tok"))
        .select(
            "doc_id",
            "n_tokens",
            F.expr(f"start_tok div {token_budget}").alias("shard_id"),
        )
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("sum_tokens"),
        )
    )


def training_shard_manifest_sql(token_budget: int = SHARD_TOKEN_BUDGET) -> str:
    """DuckDB oracle: the same packing via a global window cumsum (fine at
    oracle SF — the sequential scan is exactly what the engine avoids)."""
    hk = md5_hash64_sql(f"'{SHARD_SALT}:' || doc_id::VARCHAR")
    return f"""
WITH t AS (
  SELECT doc_id, {hk} AS hk,
         len(string_split(text, ' ')) AS n_tokens
  FROM documents),
c AS (
  SELECT n_tokens,
         sum(n_tokens) OVER (ORDER BY hk, doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM t)
SELECT CAST((cum - n_tokens) // {token_budget} AS BIGINT) AS shard_id,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
FROM c GROUP BY 1
"""


MIX_RESAMPLE_SALT = "mix-v1"   # version the resample; bump to redraw
_PPM = 1_000_000               # keep-rate resolution (parts per million)


def _token_projection(documents: DataFrame) -> DataFrame:
    """(doc_id, source, toks) — the 3-column projection every mixture
    operator works from."""
    return documents.select(
        "doc_id",
        "source",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("toks"),
    )


def mixture_rates(
    documents: DataFrame, tok: DataFrame | None = None
) -> DataFrame:
    """(source, n_docs, r_ppm) — the α=0.5 downsampling rate table
    (sqrt(t_min/t_i) in integer ppm; see ``mixture_resample_counts`` for
    the exactness discipline). Exposed separately so a deployment can
    FREEZE rates from a reference corpus window and apply them to later
    batches/streams — rates that drift batch-to-batch would make the
    realized mixture depend on chunking."""
    tok = tok if tok is not None else _token_projection(documents)
    per = tok.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("toks").alias("t")
    )
    # Same non-foldable empty partition key as source_mix_weights: the
    # window input is the O(sources) aggregate, not the corpus.
    wall = Window.partitionBy(F.substring(F.col("source"), 1, 0))
    return per.select(
        "source",
        "n_docs",
        F.round(
            F.lit(_PPM)
            * F.sqrt(F.min("t").over(wall).cast("double") / F.col("t")),
            0,
        )
        .cast("bigint")
        .alias("r_ppm"),
    )


def mixture_keep() -> Column:
    """The pure per-row keep predicate: salted hash bucket < r_ppm.
    Depends only on (salt, doc_id, r_ppm) — no RNG state, no partition
    order — so batch and streaming deployments decide identically."""
    return (
        md5_hash64(
            F.concat(
                F.lit(MIX_RESAMPLE_SALT + ":"), F.col("doc_id").cast("string")
            )
        )
        % _PPM
    ) < F.col("r_ppm")


def mixture_resample_counts(documents: DataFrame) -> DataFrame:
    """(source, n_docs, r_ppm, n_kept, kept_tokens) — MATERIALIZE the
    temperature-smoothed source mixture that ``source_mix_weights`` only
    plans: deterministically downsample every source so realized token
    shares match the α=0.5 target, relative to the rarest source (which
    keeps everything).

    Target share ∝ p_i^0.5 ⇒ per-row keep rate ∝ p_i^-0.5, normalized so
    max rate = 1 ⇒ r_i = sqrt(t_min / t_i) where t_i is source i's token
    count. The keep decision is a salted-hash Bernoulli in integer ppm —
    a pure per-row projection like ``hash_split``: reproducible across
    runs, re-layouts and engines, appends don't redraw existing docs, and
    the DuckDB oracle recomputes the identical decision per row.

    Exactness discipline (same as ``source_mix_weights``): t_min/t_i is
    one exact BIGINT/BIGINT double division, sqrt is correctly rounded,
    and the rate is quantized to an integer ppm with the same
    round-half-up rule in both engines BEFORE any row is judged — the
    keep predicate compares two BIGINTs, so no float ever crosses an
    engine boundary.

    Scale: one map-side-combined agg to O(sources) rows; the single-
    partition window runs over that tiny aggregate; the rate table
    broadcasts back onto the corpus (equi-join on source, build side
    O(sources)); the keep predicate and final per-source agg are
    projection + map-side combine. The 3-column token projection is
    persisted once for its two consumers instead of re-splitting the
    text column.
    """
    from ..session import persist_once

    tok = persist_once(_token_projection(documents))
    rate = mixture_rates(documents, tok=tok)
    keep = mixture_keep()
    return (
        tok.join(F.broadcast(rate), "source")
        .groupBy("source", "n_docs", "r_ppm")
        .agg(
            F.sum(F.when(keep, 1).otherwise(0)).cast("bigint").alias("n_kept"),
            F.sum(F.when(keep, F.col("toks")).otherwise(0))
            .cast("bigint")
            .alias("kept_tokens"),
        )
    )


def mixture_resample_counts_sql() -> str:
    """DuckDB oracle: identical integer-ppm rate and per-row decision."""
    hk = md5_hash64_sql(f"'{MIX_RESAMPLE_SALT}:' || doc_id::VARCHAR")
    return f"""
WITH tok AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
  FROM documents),
per AS (
  SELECT source, count(*) AS n_docs, sum(toks) AS t
  FROM tok GROUP BY source),
rate AS (
  SELECT source, n_docs,
         CAST(round({_PPM} * sqrt(CAST(min(t) OVER () AS DOUBLE) / t), 0)
              AS BIGINT) AS r_ppm
  FROM per)
SELECT r.source, r.n_docs, r.r_ppm,
       CAST(sum(CASE WHEN ({hk} % {_PPM}) < r.r_ppm THEN 1 ELSE 0 END)
            AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN ({hk} % {_PPM}) < r.r_ppm THEN toks ELSE 0 END)
            AS BIGINT) AS kept_tokens
FROM tok t JOIN rate r USING (source)
GROUP BY 1, 2, 3
"""


UPSAMPLE_SALT = "mix-up-v1"    # independent of the downsampler's draw


def mixture_upsample(documents: DataFrame) -> DataFrame:
    """(doc_id, source, toks, copy) — the UPSAMPLING materialization of
    the α=0.5 mixture: instead of dropping rows from common sources
    (``mixture_resample_counts``), repeat rows of rare sources so one
    training epoch sees source i sqrt(t_max/t_i) times on average — the
    standard low-resource upsampling when epoch size may grow. The
    commonest source keeps exactly one copy.

    Deterministic fractional repeats: with r_i = sqrt(t_max/t_i)
    quantized to integer ppm, every doc gets ⌊r_ppm/1e6⌋ copies plus one
    more iff its salted hash bucket < r_ppm mod 1e6 — so per-doc copy
    counts are reproducible across runs/re-layouts/engines and the
    realized expectation is exactly r_i. The expansion is a codegen'd
    ``explode(sequence(1, rep))`` — no shuffle: rate broadcast + per-row
    projection, rows multiply in place in the scan stage.

    Scale: identical shape to the downsampler (one O(sources) agg, one
    broadcast back) plus the explode, whose output is bounded by
    r_max·|rarest source| — upsampling a tiny source is cheap by
    construction; a LARGE source never has r > 1.
    """
    from ..session import persist_once

    tok = persist_once(
        documents.select(
            "doc_id",
            "source",
            F.size(F.split(F.col("text"), " ")).cast("bigint").alias("toks"),
        )
    )
    per = tok.groupBy("source").agg(F.sum("toks").alias("t"))
    wall = Window.partitionBy(F.substring(F.col("source"), 1, 0))
    rate = per.select(
        "source",
        F.round(
            F.lit(_PPM)
            * F.sqrt(F.max("t").over(wall).cast("double") / F.col("t")),
            0,
        )
        .cast("bigint")
        .alias("r_ppm"),
    )
    bucket = md5_hash64(
        F.concat(F.lit(UPSAMPLE_SALT + ":"), F.col("doc_id").cast("string"))
    ) % _PPM
    rep = (F.col("r_ppm") / _PPM).cast("bigint") + F.when(
        bucket < F.col("r_ppm") % _PPM, 1
    ).otherwise(0)
    return (
        tok.join(F.broadcast(rate), "source")
        .withColumn("__rep", rep)
        .filter(F.col("__rep") > 0)
        .select(
            "doc_id",
            "source",
            "toks",
            F.explode(F.sequence(F.lit(1), F.col("__rep"))).alias("copy"),
        )
    )


def mixture_upsample_counts(documents: DataFrame) -> DataFrame:
    """(source, n_docs, sum_repeats, upsampled_tokens) — the O(sources)
    summary of ``mixture_upsample``: docs seen, total copies emitted, and
    the epoch's realized token count per source."""
    return mixture_upsample(documents).groupBy("source").agg(
        F.count_distinct(F.col("doc_id")).alias("n_docs"),
        F.count(F.lit(1)).alias("sum_repeats"),
        F.sum("toks").alias("upsampled_tokens"),
    )


def mixture_upsample_counts_sql() -> str:
    """DuckDB oracle: per-row repeat counts computed arithmetically (no
    explode), so the hash match proves the Spark explode emits exactly
    ⌊r/1e6⌋ + [bucket < r mod 1e6] copies per doc."""
    hk = md5_hash64_sql(f"'{UPSAMPLE_SALT}:' || doc_id::VARCHAR")
    return f"""
WITH tok AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
  FROM documents),
per AS (SELECT source, sum(toks) AS t FROM tok GROUP BY source),
rate AS (
  SELECT source,
         CAST(round({_PPM} * sqrt(CAST(max(t) OVER () AS DOUBLE) / t), 0)
              AS BIGINT) AS r_ppm
  FROM per),
reps AS (
  SELECT t.source, t.doc_id, t.toks,
         (r.r_ppm // {_PPM})
         + CASE WHEN ({hk} % {_PPM}) < (r.r_ppm % {_PPM}) THEN 1 ELSE 0 END
           AS rep
  FROM tok t JOIN rate r USING (source))
SELECT source,
       count(DISTINCT CASE WHEN rep > 0 THEN doc_id END) AS n_docs,
       CAST(sum(rep) AS BIGINT) AS sum_repeats,
       CAST(sum(toks * rep) AS BIGINT) AS upsampled_tokens
FROM reps GROUP BY source
"""


# ---------------------------------------------------------------------------
# Weighted sample without replacement (A-ES priority sampling)
# ---------------------------------------------------------------------------

WSAMPLE_SALT = "wsample-v1"  # version the draw; bump to redraw
WSAMPLE_K = 100


def weighted_doc_sample(documents: DataFrame, k: int = WSAMPLE_K) -> DataFrame:
    """(doc_id, n_tokens) — a fixed-size weighted sample WITHOUT
    replacement, weights = token counts: the A-ES priority scheme
    (Efraimidis & Spirakis 2006) derandomized. Each doc gets
    u = (h+1)/2^60 from its salted portable hash and priority
    key = ln(u)/w (the log of u^(1/w)); the k LARGEST keys are the
    sample, so inclusion probability rises with weight exactly as the
    sequential weighted reservoir's would — but as a pure projection:
    reproducible across runs, re-layouts, engines, and appends (a new
    doc displaces at most one sampled doc). Token-mass-proportional
    document samples are the standard way to build a calibration /
    eval slice whose TOKEN budget, not doc count, mirrors the corpus.

    Float discipline: u is a dyadic rational (the bigint→double convert
    and the 2^60 division are both single IEEE operations), w is an
    integer, and the key never reaches the output — only MEMBERSHIP
    depends on it, which flips only if two docs' keys collide within an
    engine-libm ulp (≈2^-52 relative; no observed case). ``doc_id``
    breaks exact ties deterministically.

    Scale: orderBy(...).limit(k) plans TakeOrderedAndProject —
    per-partition top-k heaps + a k·P driver merge, no global sort, no
    shuffle of the corpus. The weight column is any projection; swap
    token counts for quality scores to sample by quality mass.
    """
    h = md5_hash64(
        F.concat(F.lit(WSAMPLE_SALT + ":"), F.col("doc_id").cast("string"))
    )
    toks = F.size(F.split(F.col("text"), " "))
    u = (h + F.lit(1)) / F.lit(float(1 << HASH_BITS))
    key = F.log(u) / toks.cast("double")
    return (
        documents.select(
            "doc_id",
            toks.cast("bigint").alias("n_tokens"),
            key.alias("__key"),
        )
        .orderBy(F.desc("__key"), "doc_id")
        .limit(k)
        .select("doc_id", "n_tokens")
    )


def weighted_doc_sample_sql(k: int = WSAMPLE_K) -> str:
    """DuckDB oracle: identical hash, dyadic u, key arithmetic, and
    (key DESC, doc_id) selection order."""
    h = md5_hash64_sql(f"'{WSAMPLE_SALT}:' || doc_id::VARCHAR")
    return f"""
WITH scored AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         ln(({h} + 1) / {float(1 << HASH_BITS)!r})
           / CAST(len(string_split(text, ' ')) AS DOUBLE) AS key
  FROM documents)
SELECT doc_id, n_tokens
FROM scored ORDER BY key DESC, doc_id LIMIT {k}
"""


# ---------------------------------------------------------------------------
# Epoch shuffle: deterministic per-epoch permutation for the data loader
# ---------------------------------------------------------------------------

EPOCH_SHUFFLE_SEED = "epoch0"   # bump per epoch to redraw the permutation
EPOCH_SHARDS = 16               # fixture-sized; production ~ O(writer count)


def epoch_shuffle_assignment(
    documents: DataFrame,
    n_shards: int = EPOCH_SHARDS,
    seed: str = EPOCH_SHUFFLE_SEED,
) -> DataFrame:
    """(doc_id, shard, pos) — the data-loader view of a deterministic
    global shuffle: each epoch seed induces a fresh pseudo-random
    permutation of the corpus; a document lands in shard
    ``md5(seed, doc_id) mod n_shards`` at position ``pos`` within the
    shard's hash order.

    Complements ``training_shard_manifest`` (token-budget packing of ONE
    canonical order): this is the per-epoch reshuffle a training run
    applies on top — reproducible across runs and re-layouts because the
    permutation is a pure projection of (seed, doc_id), no RNG state, no
    sampled partitioner. Map-only shard assignment (no global sort
    anywhere); positions need one window per shard partition, so
    parallelism = n_shards — exactly the writer fan-out a loader
    provisions (hundreds to thousands at 100 TB), and only the 8-byte
    keys shuffle, never the text.
    """
    hk = md5_hash64(
        F.concat(F.lit(f"shuffle:{seed}:"), F.col("doc_id").cast("string"))
    )
    t = documents.select("doc_id", hk.alias("hk")).withColumn(
        "shard", (F.col("hk") % n_shards).cast("int")
    )
    w = Window.partitionBy("shard").orderBy("hk", "doc_id")
    return t.select(
        "doc_id",
        "shard",
        F.row_number().over(w).cast("bigint").alias("pos"),
    )


def epoch_shuffle_assignment_sql(
    n_shards: int = EPOCH_SHARDS, seed: str = EPOCH_SHUFFLE_SEED
) -> str:
    """DuckDB oracle: the identical hash, shard, and within-shard rank."""
    hk = md5_hash64_sql(f"'shuffle:{seed}:' || doc_id::VARCHAR")
    return f"""
WITH t AS (SELECT doc_id, {hk} AS hk FROM documents)
SELECT doc_id,
       CAST(hk % {n_shards} AS INTEGER) AS shard,
       ROW_NUMBER() OVER (PARTITION BY hk % {n_shards}
                          ORDER BY hk, doc_id) AS pos
FROM t
"""


# ---------------------------------------------------------------------------
# Neyman-allocated stratified sampling design
# ---------------------------------------------------------------------------

NEYMAN_TOTAL = 1000
# weight quantization: one correctly-rounded sqrt per stratum, floored to
# integer micro-units BEFORE the cross-strata sum — the _MIX_QUANT device:
# partial-sum order can never flip a double bit because nothing sums doubles
_NEYMAN_QUANT = 1_000_000


def neyman_stratified_allocation(
    documents: DataFrame,
    total_n: int = NEYMAN_TOTAL,
    group_col: str = "lang",
    value_col: str = "n_chars",
) -> DataFrame:
    """(stratum, n_docs, weight_q, alloc): optimal (Neyman 1934, public)
    sample-size allocation across strata — n_h ∝ N_h·S_h, so variable
    strata get proportionally more of the ``total_n`` budget than
    uniform ones; the design every survey/eval-set sampler uses when
    per-stratum measurement cost is equal.

    Integer-exact allocation (no float flap): per stratum the exact
    integer six-sums give var_num_h = N_h·Σv² − (Σv)², and N_h·S_h =
    sqrt(var_num_h) — ONE correctly-rounded sqrt — which is floored to
    ``_NEYMAN_QUANT`` micro-units (weight_q, min 1 so zero-variance
    strata stay allocatable and the total weight is never 0). The
    split of ``total_n`` is then Hamilton's largest-remainder method in
    exact integer arithmetic: base_h = (total·wq_h) div W, and the
    leftover seats go to the largest exact remainders (total·wq_h −
    base_h·W), ties by stratum — bit-identical in both engines by
    construction. Capping at N_h (true Neyman redistributes iteratively)
    is deliberately NOT applied: the report is the design, and a stratum
    allocated past its size is visible as alloc > n_docs.

    Overflow headroom (r11 ADVICE — the event_type_bursts class): Σv²
    and N_h·Σv² − (Σv)² are computed in DECIMAL(38,0) (Spark) /
    HUGEINT (DuckDB), NOT raw BIGINT — a stratum of 1e9 docs × 1e5
    chars already puts Σv² at 1e19 > 2^63, where Spark used to wrap
    silently while DuckDB promoted. Likewise total·wq_h and the
    remainder arithmetic run in DECIMAL(38,0)/HUGEINT (wq can reach
    9.2e18, so 1000·wq overflows BIGINT). The one remaining BIGINT
    bound is weight_q itself: floor(sqrt(var_num)·1e6) ≤ 2^63 ⇔
    N_h·S_h ≤ 9.2e12 char-units — past that the ANSI cast errors
    loudly (never wraps), and the quant constant is the knob to drop.

    Scale shape: one map-side-combined six-sum fold to |strata| rows,
    one broadcast-back one-row total, one bounded window for the
    remainder ranking — nothing corpus-sized after the first fold.
    """
    dec = "decimal(38,0)"
    v_dec = F.col(value_col).cast("decimal(19,0)")
    per = documents.groupBy(F.col(group_col).alias("stratum")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.col(value_col).cast("bigint")).alias("s"),
        # Σv² in DECIMAL(38,0): BIGINT wraps at stratum char-mass ~3e9²
        F.sum((v_dec * v_dec).cast(dec)).alias("ss"),
    )
    var_num = (
        F.col("n_docs").cast(dec) * F.col("ss")
        - F.col("s").cast(dec) * F.col("s").cast(dec)
    )
    wq = F.greatest(
        F.floor(F.sqrt(var_num.cast("double")) * _NEYMAN_QUANT)
        .cast("bigint"),
        F.lit(1).cast("bigint"),
    )
    weighted = per.select("stratum", "n_docs", wq.alias("weight_q"))
    tot = weighted.agg(
        F.sum("weight_q").alias("w_total"),
    )
    based = (
        weighted.crossJoin(F.broadcast(tot))
        .select(
            "stratum",
            "n_docs",
            "weight_q",
            # DECIMAL(38,0): total·wq overflows BIGINT once wq > 9.2e15
            (F.lit(total_n).cast(dec) * F.col("weight_q").cast(dec))
            .cast(dec)
            .alias("num"),
            F.col("w_total").cast(dec).alias("w_total"),
        )
        .select(
            "stratum",
            "n_docs",
            "weight_q",
            # `div`, not `/`: Spark's true division routes through
            # DOUBLE and num exceeds 2^53 here — a rounded quotient
            # truncates to the WRONG integer near boundaries; `div` is
            # exact integer division on decimals too (the oracle's `//`)
            F.expr("num div w_total").alias("base"),
            (
                F.col("num")
                - F.expr("num div w_total").cast(dec) * F.col("w_total")
            ).alias("rem"),
        )
    )
    # leftover seats: total_n − Σ base, assigned to the largest exact
    # remainders (ties by stratum) — |strata| rows, bounded window
    from ..session import bounded_window

    wsum = based.agg(F.sum("base").alias("base_total"))
    wrk = bounded_window(F.col("rem").desc(), F.col("stratum").asc())
    return (
        based.crossJoin(F.broadcast(wsum))
        .withColumn("rk", F.row_number().over(wrk))
        .select(
            "stratum",
            "n_docs",
            "weight_q",
            (
                F.col("base")
                + F.when(
                    F.col("rk") <= F.lit(total_n) - F.col("base_total"), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("alloc"),
        )
    )


def neyman_stratified_allocation_sql(
    total_n: int = NEYMAN_TOTAL,
    group_col: str = "lang",
    value_col: str = "n_chars",
) -> str:
    """Oracle: identical six-sums, quantized sqrt weight, and exact
    largest-remainder split. Spark's ``CAST(num/den AS BIGINT)`` on two
    integers is integer division (truncation); DuckDB's ``/`` promotes
    to double, so the oracle uses ``//`` (floor division — equal for
    the non-negative operands here). Squares and total·wq go through
    HUGEINT, the DuckDB twin of the Spark side's DECIMAL(38,0)
    promotion (see the operator docstring's headroom note)."""
    return f"""
WITH per AS (
  SELECT {group_col} AS stratum,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum({value_col}) AS BIGINT) AS s,
         sum(CAST({value_col} AS HUGEINT) * {value_col}) AS ss
  FROM documents GROUP BY 1),
weighted AS (
  SELECT stratum, n_docs,
         greatest(CAST(floor(sqrt(CAST(CAST(n_docs AS HUGEINT) * ss
                                       - CAST(s AS HUGEINT) * s AS DOUBLE))
                             * {_NEYMAN_QUANT}) AS BIGINT),
                  1) AS weight_q
  FROM per),
based AS (
  SELECT stratum, n_docs, weight_q,
         (CAST({total_n} AS HUGEINT) * weight_q)
           // (SELECT sum(weight_q) FROM weighted) AS base,
         (CAST({total_n} AS HUGEINT) * weight_q)
           - ((CAST({total_n} AS HUGEINT) * weight_q)
              // (SELECT sum(weight_q) FROM weighted))
             * (SELECT sum(weight_q) FROM weighted) AS rem
  FROM weighted),
ranked AS (
  SELECT stratum, n_docs, weight_q, base, rem,
         row_number() OVER (ORDER BY rem DESC, stratum) AS rk,
         (SELECT sum(base) FROM based) AS base_total
  FROM based)
SELECT stratum, n_docs, weight_q,
       CAST(base + CASE WHEN rk <= {total_n} - base_total
                        THEN 1 ELSE 0 END AS BIGINT) AS alloc
FROM ranked
"""
