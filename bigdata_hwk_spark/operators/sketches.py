"""Count-min sketch as a DataFrame (declarative, mergeable, oracle-checked).

The reference's approximate-frequency operators (Reservoir, Sticky
Sampling — SURVEY.md §2.5, reference HWK_3/G029HW3.py:10-29) are
driver-state algorithms; the Spark-native sibling is a *distributed*
frequency sketch: a (row, bucket) → count table built with one
explode + groupBy, additive under union (merge two sketches by summing
matching cells — the property that lets every executor sketch its
partition and the shuffle combine them, which is exactly what the
partial/final hash aggregate already does here), with point queries as a
min over d cells.

Width/depth give the classic guarantee: est ≥ true, and
est ≤ true + εN with probability 1−δ for w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉.
Hashing is the engine-portable md5 (functions/hashing.py), so sketch
AND estimates are bit-reproducible in DuckDB — the registry query
hash-matches estimates joined against true counts, making the
overestimate directly visible (and test-bounded).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..session import local_df

from ..functions.hashing import md5_hash64, md5_hash64_sql

CMS_D = 4     # depth (independent hash rows): δ = e^-4 ≈ 1.8%
CMS_W = 512   # width (buckets per row): ε = e/512 ≈ 0.53%


def cms_sketch(
    items: DataFrame, item_col: str = "item", d: int = CMS_D, w: int = CMS_W
) -> DataFrame:
    """(r, b, cnt) — the sketch table: d·w cells max, built in ONE
    explode + groupBy pass (map-side combined; the shuffle carries at
    most d·w rows per partition regardless of stream length)."""
    rows = items.select(
        F.col(item_col).cast("string").alias("it"),
        F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("r"),
    )
    bucket = (
        md5_hash64(F.concat(F.lit("cms"), F.col("r"), F.lit(":"), F.col("it")))
        % w
    )
    return (
        rows.select("r", bucket.alias("b"))
        .groupBy("r", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimates(
    items: DataFrame,
    query: DataFrame,
    item_col: str = "item",
    d: int = CMS_D,
    w: int = CMS_W,
) -> DataFrame:
    """(item, est_cnt, true_cnt) for every item in ``query`` — point
    queries (min over the d matching cells) side-by-side with the exact
    count, so the CM overestimate is directly observable. The probe is a
    broadcast-able equi-join of d·|query| probe rows against the ≤ d·w
    cell table; the exact counts reuse the same aggregation shuffle
    shape. Items absent from the stream estimate 0 only when ALL their
    cells are empty (CM never underestimates)."""
    sk = cms_sketch(items, item_col, d, w)
    probes = query.select(F.col(item_col).cast("string").alias("it")).distinct()
    probes = probes.select(
        "it", F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("r")
    )
    bucket = (
        md5_hash64(F.concat(F.lit("cms"), F.col("r"), F.lit(":"), F.col("it")))
        % w
    )
    probed = (
        probes.select("it", "r", bucket.alias("b"))
        .join(sk, ["r", "b"], "left")
        .groupBy("it")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_cnt"))
    )
    true_cnt = (
        items.select(F.col(item_col).cast("string").alias("it"))
        .groupBy("it")
        .agg(F.count(F.lit(1)).alias("true_cnt"))
    )
    return (
        probed.join(true_cnt, "it", "left")
        .select(
            F.col("it").alias("item"),
            "est_cnt",
            F.coalesce("true_cnt", F.lit(0)).alias("true_cnt"),
        )
    )


def cms_estimates_sql(
    items_body: str,
    query_pred: str,
    d: int = CMS_D,
    w: int = CMS_W,
) -> str:
    """DuckDB oracle: identical sketch construction and probe.

    ``items_body`` — SQL body yielding (it VARCHAR); ``query_pred`` — a
    predicate over ``it`` selecting the probed items."""
    h = md5_hash64_sql("'cms' || r || ':' || it")
    return f"""
WITH its AS ({items_body}),
cells AS (
  SELECT r, {h} % {w} AS b, count(*) AS cnt
  FROM its, generate_series(0, {d - 1}) AS t(r)
  GROUP BY 1, 2),
probes AS (
  SELECT DISTINCT it FROM its WHERE {query_pred}),
probed AS (
  SELECT p.it, min(coalesce(c.cnt, 0)) AS est_cnt
  FROM (SELECT it, r, {h} % {w} AS b
        FROM probes p, generate_series(0, {d - 1}) AS t(r)) p
  LEFT JOIN cells c ON c.r = p.r AND c.b = p.b
  GROUP BY p.it),
truth AS (SELECT it, count(*) AS true_cnt FROM its GROUP BY it)
SELECT p.it AS item, p.est_cnt,
       coalesce(t.true_cnt, 0) AS true_cnt
FROM probed p LEFT JOIN truth t USING (it)
"""


# ---------------------------------------------------------------------------
# Bloom filter as a DataFrame (membership twin of the CM sketch)
# ---------------------------------------------------------------------------

BLOOM_K = 5       # hash functions: fp ≈ (1 - e^{-kn/m})^k
BLOOM_M = 8192    # bits


def bloom_bits(
    keys: DataFrame, key_col: str = "key", k: int = BLOOM_K, m: int = BLOOM_M
) -> DataFrame:
    """(bit,) — the set bit positions of a Bloom filter over ``keys``.

    The distributed form of the filter is the distinct set-bit table: at
    most ``m`` rows regardless of corpus size, built in one
    explode + distinct pass (map-side partial dedup; the shuffle carries
    ≤ m rows per partition). Mergeable by construction — the union of two
    filters is the DISTINCT of their bit tables (a bitwise OR), so
    per-partition filters combine exactly like the CM sketch's cells.
    Spark's own ``df.stat.bloomFilter`` collects a driver-side object;
    this stays a DataFrame end-to-end and is engine-portable (md5).
    """
    probes = keys.select(
        F.col(key_col).cast("string").alias("kk"),
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("h"),
    )
    bit = (
        md5_hash64(F.concat(F.lit("bloom"), F.col("h"), F.lit(":"), F.col("kk")))
        % m
    )
    return probes.select(bit.alias("bit")).distinct()


def bloom_membership(
    corpus_keys: DataFrame,
    probe_keys: DataFrame,
    key_col: str = "key",
    k: int = BLOOM_K,
    m: int = BLOOM_M,
) -> DataFrame:
    """(key, claimed_present, actually_present) for every probe key —
    Bloom membership (ALL k bits set) next to ground truth, so false
    positives are directly observable (false negatives are impossible,
    which the tests pin).

    The probe is an equi-join of k·|probes| rows against the ≤ m set-bit
    table — broadcast-able at any corpus size since the filter is bounded
    by m, the whole point of shipping a Bloom filter instead of the key
    set. The 100 TB use: membership pre-filter before an expensive join
    (e.g. "was this URL already crawled"), where a false-positive rate of
    ~1% trades a bounded recheck for not shuffling the key universe.
    """
    bits = bloom_bits(corpus_keys, key_col, k, m)
    probes = probe_keys.select(
        F.col(key_col).cast("string").alias("kk")
    ).distinct()
    exploded = probes.select(
        "kk", F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("h")
    )
    bit = (
        md5_hash64(F.concat(F.lit("bloom"), F.col("h"), F.lit(":"), F.col("kk")))
        % m
    )
    claimed = (
        exploded.select("kk", bit.alias("bit"))
        .join(F.broadcast(bits.withColumn("__set", F.lit(1))), "bit", "left")
        .groupBy("kk")
        .agg((F.count(F.lit(1)) == F.sum(F.coalesce("__set", F.lit(0)))).alias(
            "claimed_present"
        ))
    )
    truth = corpus_keys.select(
        F.col(key_col).cast("string").alias("kk")
    ).distinct().withColumn("__in", F.lit(True))
    return (
        claimed.join(truth, "kk", "left")
        .select(
            F.col("kk").alias("key"),
            "claimed_present",
            F.coalesce("__in", F.lit(False)).alias("actually_present"),
        )
    )


# ---------------------------------------------------------------------------
# HyperLogLog as a DataFrame (cardinality leg of the sketch family)
# ---------------------------------------------------------------------------

HLL_P = 5                     # m = 2^p registers; rel err ≈ 1.04/√m ≈ 18% at m=32
_HLL_ALPHA = {16: 0.673, 32: 0.697, 64: 0.709}


def _hll_alpha(m: int) -> float:
    return _HLL_ALPHA.get(m, 0.7213 / (1 + 1.079 / m))


def hll_bucket_rho(item, p: int = HLL_P):
    """(bucket, rho) Columns for one item expression — the per-row HLL
    projection shared by the batch register table, the grouped
    cardinality estimator, and the streaming windowed register table.
    bucket = low p hash bits (= h % 2^p), rho = leading-zero count of the
    remaining 60-p bits + 1, integer-only (binary-string bit length)."""
    rho_max = 61 - p
    h = md5_hash64(F.concat(F.lit("hll:"), item.cast("string")))
    bucket = h.bitwiseAND((1 << p) - 1)
    w = F.shiftright(h, p)
    bitlen = F.length(F.conv(w.cast("string"), 10, 2))
    rho = F.when(w == 0, F.lit(rho_max)).otherwise(F.lit(rho_max) - bitlen)
    return bucket, rho


def hll_registers(
    items: DataFrame,
    item_col: str = "item",
    p: int = HLL_P,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(*group_cols, bucket, max_rho) — the HLL register table: ≤ 2^p rows
    per group, mergeable via ``groupBy(bucket).max(max_rho)`` (register-
    max is idempotent/commutative/associative, so per-partition sketches
    combine exactly like the CM sketch's cells — the 100 TB shape, and
    what Spark's partial/final max aggregate already does here).

    Engine-portable: bucket = low p bits of the md5 hash, rho = leading-
    zero count of the remaining 60-p bits + 1, computed integer-only via
    binary-string bit length (no fp log), so DuckDB reproduces the table
    bit-for-bit. Completes the sketch family next to CMS (frequency) and
    Bloom (membership); the built-in ``approx_count_distinct`` twin lacks
    an engine-portable register table.
    """
    bucket, rho = hll_bucket_rho(F.col(item_col), p)
    return (
        items.select(*group_cols, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_cardinality(
    items: DataFrame,
    item_col: str = "item",
    p: int = HLL_P,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(*group_cols, n_exact, n_est, v_zero) — HLL cardinality estimate
    next to the exact distinct count, so the sketch error is directly
    observable (and oracle-checked: all arithmetic is either exact
    integer or identical-order IEEE double ops in both engines).

    One shuffle: per-(group, bucket) max-rho + exact-distinct partials
    (distinct items never straddle buckets — the bucket is a function of
    the item — so summing per-bucket distincts IS the exact global
    count; no second pass, no join). The harmonic-mean denominator is
    folded to exact integers (Σ 2^(rho_max−M_j) ≤ 2^61 fits BIGINT), so
    summation order can never move the oracle hash; the standard
    small-range linear-counting correction applies when E ≤ 2.5m with
    empty registers.
    """
    m = 1 << p
    rho_max = 61 - p
    bucket, rho = hll_bucket_rho(F.col(item_col), p)
    per_bucket = (
        items.select(
            *group_cols,
            bucket.alias("bucket"),
            rho.alias("rho"),
            F.col(item_col).cast("string").alias("it"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("max_rho"), F.countDistinct("it").alias("nd"))
    )
    one = per_bucket.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_present"),
        F.sum(
            F.pow(F.lit(2.0), F.lit(rho_max) - F.col("max_rho")).cast("bigint")
        ).alias("s_present"),
        F.sum("nd").cast("bigint").alias("n_exact"),
    )
    v = F.lit(m) - F.col("n_present")
    s_scaled = F.col("s_present") + v * F.lit(1 << rho_max)
    e_raw = F.lit(_hll_alpha(m) * m * m * (1 << rho_max)) / s_scaled
    est = F.when(
        (v > 0) & (e_raw <= 2.5 * m),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v),
    ).otherwise(e_raw)
    return one.select(
        *group_cols,
        "n_exact",
        F.round(est, 2).alias("n_est"),
        v.cast("int").alias("v_zero"),
    )


def hll_cardinality_sql(
    items_body: str,
    p: int = HLL_P,
    group_cols: tuple[str, ...] = (),
) -> str:
    """DuckDB oracle: identical registers, denominator, and estimator.

    ``items_body`` — SQL body yielding (*group_cols, it VARCHAR)."""
    m = 1 << p
    rho_max = 61 - p
    alpha_c = repr(_hll_alpha(m) * m * m * (1 << rho_max))
    h = md5_hash64_sql("'hll:' || it")
    gcp = "".join(c + ", " for c in group_cols)
    gb1 = ", ".join([*group_cols, "bucket"])
    gb2 = ", ".join(group_cols)
    gb2_clause = f"GROUP BY {gb2}" if group_cols else ""
    e_raw = f"({alpha_c} / (s_present + ({m} - n_present) * {1 << rho_max}))"
    return f"""
WITH its AS ({items_body}),
hashed AS (SELECT {gcp}it, {h} AS h FROM its),
regs AS (
  SELECT {gcp}h % {m} AS bucket,
         max(CASE WHEN h // {m} = 0 THEN {rho_max}
                  ELSE {rho_max} - length(bin(h // {m})) END) AS max_rho,
         count(DISTINCT it) AS nd
  FROM hashed GROUP BY {gb1}),
one AS (
  SELECT {gcp}count(*) AS n_present,
         CAST(sum(CAST(power(2.0, {rho_max} - max_rho) AS BIGINT)) AS BIGINT)
           AS s_present,
         CAST(sum(nd) AS BIGINT) AS n_exact
  FROM regs {gb2_clause})
SELECT {gcp}n_exact,
       round(CASE WHEN ({m} - n_present) > 0 AND {e_raw} <= {2.5 * m!r}
                  THEN {float(m)!r} * ln({float(m)!r} / ({m} - n_present))
                  ELSE {e_raw} END, 2) AS n_est,
       CAST({m} - n_present AS INTEGER) AS v_zero
FROM one
"""


# ---------------------------------------------------------------------------
# Histogram quantile sketch (quantile leg of the sketch family)
# ---------------------------------------------------------------------------

QSK_LO = 0.0        # bin range [lo, hi): fixed a priori so shard sketches merge
QSK_HI = 1024.0
QSK_BINS = 1024     # width 1.0 → estimate error ≤ width/2 per side


def histogram_sketch(
    df: DataFrame,
    value_col: str = "value",
    lo: float = QSK_LO,
    hi: float = QSK_HI,
    bins: int = QSK_BINS,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(*group_cols, bin, cnt) — fixed-bin histogram: ≤ ``bins`` rows per
    group, mergeable by ``groupBy(bin).sum(cnt)`` (bin edges are fixed a
    priori, not data-dependent, which is exactly what makes per-shard
    histograms combinable at 100 TB — the quantile leg of the sketch
    family next to CMS/Bloom/HLL). Values outside [lo, hi) clamp to the
    edge bins. One map-side-combined aggregation; no value ever reaches
    the driver."""
    width = (hi - lo) / bins
    b = F.floor((F.col(value_col) - lo) / width).cast("int")
    b = F.least(F.lit(bins - 1), F.greatest(F.lit(0), b))
    return (
        df.groupBy(*group_cols, b.alias("bin"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def histogram_quantiles(
    df: DataFrame,
    value_col: str = "value",
    lo: float = QSK_LO,
    hi: float = QSK_HI,
    bins: int = QSK_BINS,
    group_cols: tuple[str, ...] = (),
    qs: tuple[float, ...] = (0.5, 0.95),
) -> DataFrame:
    """(*group_cols, n_events, p<q>_est ...) — bin-midpoint quantile
    estimates off the histogram sketch: for each q, the midpoint of the
    first bin whose cumulative count reaches q·n. Error is bounded by the
    bin width (test-pinned against the exact percentile twin,
    ``event_value_quantiles``). The cumulative walk runs over ≤ ``bins``
    rows per group — a per-group window on the aggregate, never the data.

    Engine parity by construction: bin/cum/n are exact integers; q·n is
    one double multiply and the midpoint one multiply-add, identical ops
    both sides; outputs rounded at the boundary."""
    width = (hi - lo) / bins
    hist = histogram_sketch(df, value_col, lo, hi, bins, group_cols)
    # constant partition key when ungrouped (see source_mix_weights: a
    # literal would be folded away by EliminateWindowPartitions)
    part = list(group_cols) or [F.substring(F.col("bin").cast("string"), 1, 0)]
    wcum = (
        Window.partitionBy(*part)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy(*part)
    aug = hist.withColumn("cum", F.sum("cnt").over(wcum)).withColumn(
        "n", F.sum("cnt").over(wall)
    )
    aggs = [F.max("n").alias("n_events")]
    for q in qs:
        bq = F.min(F.when(F.col("cum") >= q * F.col("n"), F.col("bin")))
        aggs.append(
            F.round(lo + width * (bq + F.lit(0.5)), 6).alias(
                f"p{int(q * 100)}_est"
            )
        )
    return aug.groupBy(*group_cols).agg(*aggs)


def histogram_quantiles_sql(
    items_body: str,
    value_expr: str = "value",
    lo: float = QSK_LO,
    hi: float = QSK_HI,
    bins: int = QSK_BINS,
    group_cols: tuple[str, ...] = (),
    qs: tuple[float, ...] = (0.5, 0.95),
) -> str:
    """DuckDB oracle: identical binning, cumulative walk, and midpoint
    arithmetic. ``items_body`` yields (*group_cols, the value column)."""
    width = (hi - lo) / bins
    gcp = "".join(c + ", " for c in group_cols)
    gb = ", ".join([*group_cols, "bin"])
    gb2 = ", ".join(group_cols) if group_cols else ""
    gb2_clause = f"GROUP BY {gb2}" if group_cols else ""
    part = f"PARTITION BY {gb2} " if group_cols else ""
    # ::DOUBLE on every literal: DuckDB parses bare decimal literals as
    # DECIMAL and would return a DECIMAL column (driver-hash type drift)
    # computed under different rounding than Spark's double ops
    sels = []
    for q in qs:
        sels.append(
            f"round({lo!r}::DOUBLE + {width!r}::DOUBLE * "
            f"(min(CASE WHEN cum >= {q!r}::DOUBLE * n THEN bin END) "
            f"+ 0.5::DOUBLE), 6) "
            f"AS p{int(q * 100)}_est"
        )
    sel = ",\n       ".join(sels)
    return f"""
WITH its AS ({items_body}),
hist AS (
  SELECT {gcp}least({bins - 1}, greatest(0,
           CAST(floor(({value_expr} - {lo!r}::DOUBLE) / {width!r}::DOUBLE)
                AS INTEGER))) AS bin,
         count(*) AS cnt
  FROM its GROUP BY {gb}),
aug AS (
  SELECT {gcp}bin,
         CAST(sum(cnt) OVER ({part}ORDER BY bin
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
         CAST(sum(cnt) OVER ({part}) AS BIGINT) AS n
  FROM hist)
SELECT {gcp}CAST(max(n) AS BIGINT) AS n_events,
       {sel}
FROM aug {gb2_clause}
"""


def bloom_membership_sql(
    corpus_body: str, probe_body: str, k: int = BLOOM_K, m: int = BLOOM_M
) -> str:
    """DuckDB oracle: identical bit construction and probe.

    ``corpus_body`` / ``probe_body`` — SQL bodies yielding (kk VARCHAR).
    """
    h = md5_hash64_sql("'bloom' || h || ':' || kk")
    return f"""
WITH corpus AS ({corpus_body}),
probes AS (SELECT DISTINCT kk FROM ({probe_body})),
bits AS (
  SELECT DISTINCT {h} % {m} AS bit
  FROM corpus, generate_series(0, {k - 1}) AS t(h)),
claimed AS (
  SELECT p.kk,
         count(*) = sum(CASE WHEN b.bit IS NOT NULL THEN 1 ELSE 0 END)
           AS claimed_present
  FROM (SELECT kk, {h} % {m} AS bit
        FROM probes, generate_series(0, {k - 1}) AS t(h)) p
  LEFT JOIN bits b USING (bit)
  GROUP BY p.kk),
truth AS (SELECT DISTINCT kk, TRUE AS act FROM corpus)
SELECT c.kk AS key, c.claimed_present,
       coalesce(t.act, FALSE) AS actually_present
FROM claimed c LEFT JOIN truth t USING (kk)
"""


def bloom_prune(
    fact: DataFrame,
    bits: DataFrame,
    key_col: str,
    k: int = BLOOM_K,
    m: int = BLOOM_M,
) -> DataFrame:
    """Filter ``fact`` to rows whose ``key_col`` PASSES the Bloom filter
    given by ``bits`` (a set-bit table from ``bloom_bits``): the
    semi-join-reduction pattern — prune the 100 TB fact side map-side
    BEFORE any shuffle toward the real join.

    No false negatives (every true match survives), bounded false
    positives (the later exact join removes them), so composing
    ``bloom_prune`` + exact join returns exactly the plain join's result
    while the shuffle carries only candidates. This is the engine-portable
    DataFrame twin of Spark's runtime bloom-filter join
    (``spark.sql.optimizer.runtime.bloomFilter.enabled``), with the
    filter state visible and mergeable like the rest of this module.

    The ≤ m-row bit table is fetched to the driver once (m bits ≈ 1 KB at
    the default m=8192 — a bounded metadata transfer, same class as the
    module's other sketch fetches) and folded into a literal array of
    32-bit words; each row's k probes are then O(1) whole-stage-codegen
    lookups — ``element_at`` on the constant word array plus an exact
    power-of-two division bit test (32-bit words stay nonnegative and
    exact in doubles) — no explode, no join, no shuffle, and no
    O(position) string scan (a '0'/'1'-string ``substr`` probe measured
    ~10× slower: UTF8 substring walks the literal per row).
    """
    return bloom_prune_bits(fact, (r.bit for r in bits.collect()), key_col, k=k, m=m)


def bloom_prune_bits(
    fact: DataFrame,
    bit_positions,
    key_col: str,
    k: int = BLOOM_K,
    m: int = BLOOM_M,
) -> DataFrame:
    """``bloom_prune`` with the set-bit positions already on the driver
    (any iterable of ints in [0, m)). Lets a caller that sized ``m`` from
    the same small job that produced the bits (see the registry's
    ``bloom_pruned_revenue``) build the probe without a second collect.
    """
    words = [0] * ((m + 31) // 32)
    for b in bit_positions:
        words[b // 32] |= 1 << (b % 32)
    arr = F.array(*[F.lit(w) for w in words])
    kk = F.col(key_col).cast("string")
    cond = None
    for h in range(k):
        bit = (
            md5_hash64(F.concat(F.lit("bloom"), F.lit(h), F.lit(":"), kk)) % m
        )
        word = F.element_at(arr, F.floor(bit / 32).cast("int") + 1)
        off = F.pmod(bit, F.lit(32)).cast("double")
        ok = (
            F.floor(word / F.pow(F.lit(2.0), off)).cast("bigint") % 2 == 1
        )
        cond = ok if cond is None else (cond & ok)
    return fact.filter(cond)


# ---------------------------------------------------------------------------
# HLL set algebra: union / intersection across segments by register merge
# ---------------------------------------------------------------------------

# All-pairs overlap is quadratic in the number of groups by definition;
# the operator is for enum-sized dimensions (event types, sources, a
# bounded window slice). Past this cap it refuses loudly instead of
# broadcasting a quadratic pair table (the similar_pairs gate discipline).
HLL_OVERLAP_MAX_GROUPS = 64


def _hll_estimate_expr(m: int, rho_max: int):
    """The HLL estimate as a Column over a fold row with (n_present,
    s_present) — the identical expression ``hll_cardinality`` inlines,
    factored so the union estimator below is guaranteed to apply the same
    arithmetic (including the small-range linear-counting branch)."""
    v = F.lit(m) - F.col("n_present")
    s_scaled = F.col("s_present") + v * F.lit(1 << rho_max)
    e_raw = F.lit(_hll_alpha(m) * m * m * (1 << rho_max)) / s_scaled
    return F.when(
        (v > 0) & (e_raw <= 2.5 * m),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v),
    ).otherwise(e_raw)


def _hll_fold(regs: DataFrame, keys: tuple[str, ...], rho_max: int) -> DataFrame:
    """Register table → one fold row per key group: (n_present,
    s_present), both exact integers so summation order can never move
    the oracle hash (same invariant as ``hll_cardinality``)."""
    return regs.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_present"),
        F.sum(
            F.pow(F.lit(2.0), F.lit(rho_max) - F.col("max_rho")).cast("bigint")
        ).alias("s_present"),
    )


def hll_overlap(
    items: DataFrame,
    item_col: str = "item",
    group_col: str = "grp",
    p: int = HLL_P,
) -> DataFrame:
    """(ga, gb, n_a_est, n_b_est, n_union_est, n_inter_est, n_inter_exact)
    for every unordered pair of groups — HLL *set algebra*: the union
    cardinality comes from merging the two groups' register tables
    (bucket-wise max — no rescan of the data), the intersection from
    inclusion–exclusion (|A∩B| ≈ E(A) + E(B) − E(A∪B)), next to the
    exact intersection so the sketch error is directly observable.

    This is the sketch property that matters at 100 TB: every segment /
    shard / day sketches once (one shuffle on (group, bucket), ≤ 2^p rows
    per group), and any cross-segment distinct-count question afterwards
    is answered from the register tables alone — max is idempotent,
    commutative, and associative, so merging sketches of overlapping data
    is still exact over the registers. Group values are collected once
    (bounded metadata — groups are an enum-sized dimension by contract,
    like the mixture-rate and source-mix tables) to build the tiny
    broadcast pair list; registers reach each pair via two broadcast
    equi-joins, never a cartesian. The exact-intersection twin is one
    distinct + self-equi-join on the item key, the usual observability
    cost the estimate exists to avoid.
    """
    regs = hll_registers(items, item_col, p, (group_col,))
    est_pairs = hll_overlap_from_registers(regs, group_col, p)
    d = items.select(
        F.col(group_col).alias("g"), F.col(item_col).cast("string").alias("it")
    ).distinct()
    inter_exact = (
        d.alias("x")
        .join(d.alias("y"), "it")
        .filter(F.col("x.g") < F.col("y.g"))
        .groupBy(F.col("x.g").alias("ga"), F.col("y.g").alias("gb"))
        .agg(F.count(F.lit(1)).alias("n_inter_exact"))
    )
    return est_pairs.join(inter_exact, ["ga", "gb"], "left").select(
        "ga",
        "gb",
        "n_a_est",
        "n_b_est",
        "n_union_est",
        "n_inter_est",
        F.coalesce(F.col("n_inter_exact"), F.lit(0))
        .cast("bigint")
        .alias("n_inter_exact"),
    )


def hll_overlap_from_registers(
    regs: DataFrame, group_col: str = "grp", p: int = HLL_P
) -> DataFrame:
    """(ga, gb, n_a_est, n_b_est, n_union_est, n_inter_est) for every
    unordered group pair, computed from a REGISTER TABLE alone —
    (group_col, bucket, max_rho), with no access to the underlying
    items. This is the composition point of the sketch family: any
    register producer plugs in — the per-segment batch table
    (``hll_registers``), the per-event-time-window STREAMING table
    (``streaming.windowed.windowed_hll_registers``, whose output schema
    is exactly this contract with group_col = win_start), or registers
    merged across days/shards — and cross-group distinct union /
    intersection questions are answered without revisiting the data.
    Group values are collected once (groups are an enum-sized dimension
    by contract); registers reach each pair via two broadcast equi-joins.
    """
    m = 1 << p
    rho_max = 61 - p
    groups = sorted(
        r[0] for r in regs.select(group_col).distinct().collect()
    )
    if len(groups) > HLL_OVERLAP_MAX_GROUPS:
        raise ValueError(
            f"hll_overlap: {len(groups)} groups -> "
            f"{len(groups) * (len(groups) - 1) // 2} pairs; the all-pairs "
            f"register merge is meant for enum-sized dimensions "
            f"(<= {HLL_OVERLAP_MAX_GROUPS}). Slice the group axis first "
            "(e.g. a bounded window range) or merge registers toward a "
            "coarser grouping before asking for pairwise overlap."
        )
    pairs = [(a, b) for i, a in enumerate(groups) for b in groups[i + 1:]]
    spark = regs.sparkSession
    gtype = dict(regs.dtypes)[group_col]
    pair_df = local_df(spark, pairs, f"ga {gtype}, gb {gtype}")

    ra = regs.join(
        F.broadcast(pair_df), F.col(group_col) == F.col("ga")
    ).select("ga", "gb", "bucket", "max_rho")
    rb = regs.join(
        F.broadcast(pair_df), F.col(group_col) == F.col("gb")
    ).select("ga", "gb", "bucket", "max_rho")
    u = (
        ra.unionByName(rb)
        .groupBy("ga", "gb", "bucket")
        .agg(F.max("max_rho").alias("max_rho"))
    )
    est = F.round(_hll_estimate_expr(m, rho_max), 2)
    singles = _hll_fold(regs, (group_col,), rho_max).select(
        F.col(group_col).alias("g"), est.alias("n_est")
    )
    union_est = _hll_fold(u, ("ga", "gb"), rho_max).select(
        "ga", "gb", est.alias("n_union_est")
    )
    sa = singles.select(F.col("g").alias("ga"), F.col("n_est").alias("n_a_est"))
    sb = singles.select(F.col("g").alias("gb"), F.col("n_est").alias("n_b_est"))
    return (
        union_est.join(F.broadcast(sa), "ga")
        .join(F.broadcast(sb), "gb")
        .select(
            "ga",
            "gb",
            "n_a_est",
            "n_b_est",
            "n_union_est",
            F.round(
                F.col("n_a_est") + F.col("n_b_est") - F.col("n_union_est"), 2
            ).alias("n_inter_est"),
        )
    )


def hll_overlap_sql(items_body: str, p: int = HLL_P) -> str:
    """DuckDB oracle: identical registers, pair list, register-max merge,
    estimator (with the same small-range branch), inclusion–exclusion,
    and exact-intersection twin.

    ``items_body`` — SQL body yielding (g, it VARCHAR)."""
    m = 1 << p
    rho_max = 61 - p
    alpha_c = repr(_hll_alpha(m) * m * m * (1 << rho_max))
    h = md5_hash64_sql("'hll:' || it")
    e_raw = f"({alpha_c} / (s_present + ({m} - n_present) * {1 << rho_max}))"
    est = (
        f"round(CASE WHEN ({m} - n_present) > 0 AND {e_raw} <= {2.5 * m!r} "
        f"THEN {float(m)!r} * ln({float(m)!r} / ({m} - n_present)) "
        f"ELSE {e_raw} END, 2)"
    )
    return f"""
WITH its AS ({items_body}),
hashed AS (SELECT g, it, {h} AS h FROM its),
regs AS (
  SELECT g, h % {m} AS bucket,
         max(CASE WHEN h // {m} = 0 THEN {rho_max}
                  ELSE {rho_max} - length(bin(h // {m})) END) AS max_rho
  FROM hashed GROUP BY 1, 2),
grps AS (SELECT DISTINCT g FROM its),
pairs AS (SELECT a.g AS ga, b.g AS gb FROM grps a JOIN grps b ON a.g < b.g),
u AS (
  SELECT ga, gb, bucket, max(max_rho) AS max_rho FROM (
    SELECT p.ga, p.gb, r.bucket, r.max_rho FROM regs r JOIN pairs p ON r.g = p.ga
    UNION ALL
    SELECT p.ga, p.gb, r.bucket, r.max_rho FROM regs r JOIN pairs p ON r.g = p.gb)
  GROUP BY 1, 2, 3),
sfold AS (
  SELECT g, count(*) AS n_present,
         CAST(sum(CAST(power(2.0, {rho_max} - max_rho) AS BIGINT)) AS BIGINT)
           AS s_present
  FROM regs GROUP BY 1),
ufold AS (
  SELECT ga, gb, count(*) AS n_present,
         CAST(sum(CAST(power(2.0, {rho_max} - max_rho) AS BIGINT)) AS BIGINT)
           AS s_present
  FROM u GROUP BY 1, 2),
sing AS (SELECT g, {est} AS n_est FROM sfold),
uest AS (SELECT ga, gb, {est} AS n_union_est FROM ufold),
dd AS (SELECT DISTINCT g, it FROM its),
ex AS (
  SELECT x.g AS ga, y.g AS gb, count(*) AS n_inter_exact
  FROM dd x JOIN dd y ON x.it = y.it AND x.g < y.g
  GROUP BY 1, 2)
SELECT u.ga, u.gb, a.n_est AS n_a_est, b.n_est AS n_b_est, u.n_union_est,
       round(a.n_est + b.n_est - u.n_union_est, 2) AS n_inter_est,
       CAST(COALESCE(ex.n_inter_exact, 0) AS BIGINT) AS n_inter_exact
FROM uest u
JOIN sing a ON a.g = u.ga
JOIN sing b ON b.g = u.gb
LEFT JOIN ex ON ex.ga = u.ga AND ex.gb = u.gb
"""


# ---------------------------------------------------------------------------
# CMS inner product: join-size estimation from two sketches
# ---------------------------------------------------------------------------

def cms_join_size(
    a_items: DataFrame,
    b_items: DataFrame,
    item_col: str = "item",
    d: int = CMS_D,
    w: int = CMS_W,
) -> DataFrame:
    """(est_join_size, true_join_size, n_a, n_b) — one row: the size of
    the equi-join A ⋈ B on the item key, estimated from the two CM
    sketches alone via the inner-product identity (Cormode &
    Muthukrishnan 2005, §4.2): per depth row, Σ_b cntA[b]·cntB[b]
    overestimates Σ_k fA(k)·fB(k) (colliding keys only ADD), so the min
    over the d rows is an upper-bound estimate with error ≤ ε·|A|·|B|
    w.h.p.

    The planner quantity this answers at 100 TB: "how big is this join
    going to be?" from two ≤ d·w-cell tables, no scan of either input —
    the same sketches the point-query estimator already maintains. The
    exact twin (one count per key per side + an equi-join on keys) rides
    along so the overestimate is observable and oracle-checked; all
    arithmetic is exact integers on both engines.
    """
    sa = cms_sketch(a_items, item_col, d, w)
    sb = cms_sketch(b_items, item_col, d, w)
    ip_rows = (
        sa.alias("a")
        .join(sb.alias("b"), ["r", "b"])
        .groupBy("r")
        .agg(F.sum(F.col("a.cnt") * F.col("b.cnt")).alias("ip"))
    )
    # a depth row with zero shared buckets must contribute ip = 0 (the
    # true inner product is 0 there), not vanish from the min
    depth = a_items.sparkSession.range(d).select(
        F.col("id").cast("int").alias("r")
    )
    est = (
        depth.join(ip_rows, "r", "left")
        .agg(
            F.min(F.coalesce(F.col("ip"), F.lit(0)))
            .cast("bigint")
            .alias("est_join_size")
        )
    )
    fa = (
        a_items.select(F.col(item_col).cast("string").alias("it"))
        .groupBy("it")
        .agg(F.count(F.lit(1)).alias("ca"))
    )
    fb = (
        b_items.select(F.col(item_col).cast("string").alias("it"))
        .groupBy("it")
        .agg(F.count(F.lit(1)).alias("cb"))
    )
    truth = fa.join(fb, "it").agg(
        F.coalesce(F.sum(F.col("ca") * F.col("cb")), F.lit(0))
        .cast("bigint")
        .alias("true_join_size")
    )
    counts = a_items.agg(F.count(F.lit(1)).alias("n_a")).crossJoin(
        b_items.agg(F.count(F.lit(1)).alias("n_b"))
    )
    return est.crossJoin(truth).crossJoin(counts)


def cms_join_size_sql(
    a_body: str, b_body: str, d: int = CMS_D, w: int = CMS_W
) -> str:
    """DuckDB oracle: identical sketches, per-depth inner products
    (missing depth rows pinned to 0), min fold, and exact twin.

    ``a_body``/``b_body`` — SQL bodies yielding (it VARCHAR)."""
    h = md5_hash64_sql("'cms' || r || ':' || it")
    return f"""
WITH a AS ({a_body}), b AS ({b_body}),
ca AS (
  SELECT r, {h} % {w} AS b, count(*) AS cnt
  FROM a, generate_series(0, {d - 1}) AS t(r) GROUP BY 1, 2),
cb AS (
  SELECT r, {h} % {w} AS b, count(*) AS cnt
  FROM b, generate_series(0, {d - 1}) AS t(r) GROUP BY 1, 2),
ip AS (
  SELECT ca.r, CAST(sum(ca.cnt * cb.cnt) AS BIGINT) AS ip
  FROM ca JOIN cb ON ca.r = cb.r AND ca.b = cb.b GROUP BY 1),
est AS (
  SELECT CAST(min(coalesce(ip.ip, 0)) AS BIGINT) AS est_join_size
  FROM generate_series(0, {d - 1}) AS t(r) LEFT JOIN ip ON ip.r = t.r),
fa AS (SELECT it, count(*) AS ca FROM a GROUP BY 1),
fb AS (SELECT it, count(*) AS cb FROM b GROUP BY 1),
truth AS (
  SELECT CAST(coalesce(sum(fa.ca * fb.cb), 0) AS BIGINT) AS true_join_size
  FROM fa JOIN fb USING (it)),
counts AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM a) AS n_a,
         (SELECT CAST(count(*) AS BIGINT) FROM b) AS n_b)
SELECT est.est_join_size, truth.true_join_size, counts.n_a, counts.n_b
FROM est, truth, counts
"""


# ---------------------------------------------------------------------------
# Misra-Gries mergeable heavy hitters
# ---------------------------------------------------------------------------

MG_K = 64          # counter budget (error ≤ n_dropped / (k+1))
MG_CHUNK = 4096    # base chunk: event_id // MG_CHUNK
MG_FANIN = 16      # merge-tree fan-in per round


def _mg_compress(cells: DataFrame, k: int) -> DataFrame:
    """COMPRESS(summary, k): subtract the (k+1)-th largest count from
    every counter in the chunk and drop non-positives — the mergeable-
    summaries reduction (Agarwal et al., PODS 2012). Ties order by
    (cnt desc, item asc) so the subtracted pivot is deterministic.
    Pure window + filter: whole-stage codegen, no Python."""
    w = Window.partitionBy("chunk").orderBy(
        F.col("cnt").desc(), F.col("item").asc()
    )
    wc = Window.partitionBy("chunk")
    ranked = cells.withColumn("rn", F.row_number().over(w))
    d = F.max(
        F.when(F.col("rn") == k + 1, F.col("cnt")).otherwise(F.lit(0))
    ).over(wc)
    return (
        ranked.withColumn("d", d)
        .filter(F.col("cnt") > F.col("d"))
        .select("chunk", "item", (F.col("cnt") - F.col("d")).alias("cnt"))
    )


def misra_gries_summary(
    items: DataFrame,
    item_col: str = "item",
    seq_col: str = "seq",
    k: int = MG_K,
    chunk: int = MG_CHUNK,
    fanin: int = MG_FANIN,
) -> DataFrame:
    """(item, est_count): a ≤ k-row Misra-Gries heavy-hitter summary of
    the whole stream, built as a MERGEABLE SUMMARY (Agarwal et al.,
    PODS 2012 — public): exact per-chunk histograms (any exact
    histogram is a perfect summary) are compressed to k counters, then
    folded up a deterministic ``fanin``-ary tree keyed by
    ``seq_col // chunk`` — NOT by partition id, so the result is
    bit-identical under any data layout, unlike a naive
    per-partition-then-driver fold.

    Deterministic guarantee (test-pinned, no probability): for every
    item, ``est ≤ true`` and ``true − est ≤ (n − Σ est)/(k+1)`` — each
    compress subtracts its pivot d from ≤ all survivors while removing
    ≥ (k+1)·d total mass, so the per-item deficit telescopes into the
    dropped-mass bound. Any item with true count > (n − Σ est)/(k+1)
    is necessarily PRESENT in the summary (the heavy-hitter superset
    property the sticky/true-frequent family gives only
    probabilistically).

    Scale shape: the only corpus-sized work is the base (chunk, item)
    hash aggregate (map-side combined). Every later round operates on
    ≤ k·n_chunks rows that shrink by ``fanin``× per round —
    ⌈log_fanin(n/chunk)⌉ rounds total (4 rounds for a trillion-row
    stream at the defaults), each one small shuffle +
    ``localCheckpoint``. The per-round driver probe is a one-row count.
    """
    base = (
        items.select(
            # integer division (no double round-trip: exact past 2^53)
            F.expr(f"CAST({seq_col} AS BIGINT) div {chunk}").alias("chunk"),
            F.col(item_col).cast("bigint").alias("item"),
        )
        .groupBy("chunk", "item")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return mg_tree_fold(_mg_compress(base, k).localCheckpoint(), k, fanin)


def mg_tree_fold(leaves: DataFrame, k: int = MG_K, fanin: int = MG_FANIN) -> DataFrame:
    """Fold compressed per-chunk summaries (chunk, item, cnt) up the
    deterministic ``fanin``-ary tree; exposed separately so the
    streaming ingest deployment can run the identical fold over its
    accumulated leaf state."""
    cur = leaves
    while cur.select("chunk").distinct().limit(2).count() > 1:
        folded = (
            cur.groupBy(
                F.expr(f"chunk div {fanin}").alias("chunk"), "item"
            )
            .agg(F.sum("cnt").alias("cnt"))
        )
        cur = _mg_compress(folded, k).localCheckpoint()
    return cur.select("item", F.col("cnt").cast("bigint").alias("est_count"))


def user_heavy_hitters_mg(events: DataFrame, k: int = MG_K) -> DataFrame:
    """Misra-Gries heavy users over the event stream (item = user_id,
    chunk sequence = event_id)."""
    return misra_gries_summary(
        events, item_col="user_id", seq_col="event_id", k=k
    )
