"""Robust per-group anomaly statistics (median / MAD / IQR fences).

Extension surface (no reference counterpart): the spatial outlier
family (``operators/outliers.py``) finds points isolated in R²; a data
pipeline ALSO needs distributional anomaly screens over plain value
columns — telemetry spikes, corrupt measurements, fat-finger prices.
Mean/stddev fences break down under the very outliers they hunt, so the
standard screens are median-based: the modified z-score
``0.6745·|x − med| / MAD > 3.5`` (Iglewicz & Hoaglin 1993, public) and
Tukey's IQR fences ``[p25 − 1.5·IQR, p75 + 1.5·IQR]``.

Shape at 100 TB: exact interpolated percentiles per group are one
map-side-combined groupBy (Spark's ``percentile`` aggregate); the MAD
needs a second pass over the values with the group median joined back —
the group-stats side is |groups| rows and broadcasts, so the fact table
is scanned twice and shuffled never (the join is broadcast, the final
count re-aggregates per group map-side). For a 100 TB column where two
exact passes are too dear, the sketches module's mergeable histogram
gives an approximate single-pass quantile — this operator is the exact
twin the audits call when the answer must be right.

Cross-engine determinism: the fence predicates compare against the
6-decimal-ROUNDED med/mad/p25/p75 on both engines (an interpolated
percentile differs in the last ulp between implementations; rounding
first makes the comparison identical arithmetic — the round-before-rank
device the BM25/TF-IDF rankers use).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAD_Z_CUT = 3.5       # modified z-score fence (Iglewicz & Hoaglin)
MAD_CONSISTENCY = 0.6745  # Φ⁻¹(0.75): MAD→σ consistency constant
IQR_WHISKER = 1.5     # Tukey fence multiplier


def robust_value_outliers(events: DataFrame) -> DataFrame:
    """Per event_type robust anomaly summary over ``value``.

    Returns one row per event_type: n, med, mad, p25, p75 (rounded to
    6) and the two fence counts ``n_mad_outliers`` / ``n_iqr_outliers``.
    NULL values are excluded from both the percentiles and the counts
    (identical semantics in DuckDB's ``quantile_cont``).
    """
    vals = events.filter(F.col("value").isNotNull()).select(
        "event_type", "value"
    )
    stats = vals.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("med"),
        F.round(F.percentile("value", F.lit(0.25)), 6).alias("p25"),
        F.round(F.percentile("value", F.lit(0.75)), 6).alias("p75"),
    )
    with_med = vals.join(F.broadcast(stats), "event_type")
    mad = with_med.groupBy("event_type").agg(
        F.round(
            F.percentile(F.abs(F.col("value") - F.col("med")), F.lit(0.5)), 6
        ).alias("mad")
    )
    full = vals.join(F.broadcast(stats.join(mad, "event_type")), "event_type")
    iqr = F.col("p75") - F.col("p25")
    is_mad_out = (
        F.lit(MAD_CONSISTENCY) * F.abs(F.col("value") - F.col("med"))
        > F.lit(MAD_Z_CUT) * F.col("mad")
    )
    is_iqr_out = (F.col("value") < F.col("p25") - F.lit(IQR_WHISKER) * iqr) | (
        F.col("value") > F.col("p75") + F.lit(IQR_WHISKER) * iqr
    )
    return (
        full.groupBy("event_type")
        .agg(
            F.min("n").alias("n"),
            F.min("med").alias("med"),
            F.min("mad").alias("mad"),
            F.min("p25").alias("p25"),
            F.min("p75").alias("p75"),
            F.sum(is_mad_out.cast("bigint")).alias("n_mad_outliers"),
            F.sum(is_iqr_out.cast("bigint")).alias("n_iqr_outliers"),
        )
        .select(
            "event_type", "n", "med", "mad", "p25", "p75",
            "n_mad_outliers", "n_iqr_outliers",
        )
    )


WINSOR_LO = 0.01
WINSOR_HI = 0.99


def winsorized_value_stats(
    events: DataFrame, lo: float = WINSOR_LO, hi: float = WINSOR_HI
) -> DataFrame:
    """Per event_type mean/stddev before vs after winsorizing ``value``
    at the [p_lo, p_hi] percentile fences — the standard tail-robust
    moment estimate (clip, don't drop: sample size is preserved).

    Same two-pass broadcast shape as ``robust_value_outliers``: exact
    percentiles per group (one map-side-combined groupBy), |groups|-row
    fence table broadcast back, clip + re-aggregate map-side. Fences are
    6-decimal-rounded BEFORE clipping on both engines (percentile ulp
    drift would otherwise flip boundary rows' clip decision).

    Columns: n, mean_raw/mean_wins, sd_raw/sd_wins (sample stddev,
    rounded to 6), n_clipped_lo/n_clipped_hi.
    """
    vals = events.filter(F.col("value").isNotNull()).select(
        "event_type", "value"
    )
    fences = vals.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(lo)), 6).alias("p_lo"),
        F.round(F.percentile("value", F.lit(hi)), 6).alias("p_hi"),
    )
    j = vals.join(F.broadcast(fences), "event_type")
    clipped = F.least(F.greatest(F.col("value"), F.col("p_lo")), F.col("p_hi"))
    return (
        j.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("value"), 6).alias("mean_raw"),
            F.round(F.avg(clipped), 6).alias("mean_wins"),
            F.round(F.stddev_samp("value"), 6).alias("sd_raw"),
            F.round(F.stddev_samp(clipped), 6).alias("sd_wins"),
            F.sum((F.col("value") < F.col("p_lo")).cast("bigint")).alias(
                "n_clipped_lo"
            ),
            F.sum((F.col("value") > F.col("p_hi")).cast("bigint")).alias(
                "n_clipped_hi"
            ),
        )
    )


WINSORIZED_VALUE_STATS_SQL = f"""
WITH vals AS (
  SELECT event_type, value FROM events WHERE value IS NOT NULL),
fences AS (
  SELECT event_type,
         round(quantile_cont(value, {WINSOR_LO!r}), 6) AS p_lo,
         round(quantile_cont(value, {WINSOR_HI!r}), 6) AS p_hi
  FROM vals GROUP BY event_type)
SELECT v.event_type, count(*) AS n,
       round(avg(v.value), 6) AS mean_raw,
       round(avg(least(greatest(v.value, f.p_lo), f.p_hi)), 6) AS mean_wins,
       round(stddev_samp(v.value), 6) AS sd_raw,
       round(stddev_samp(least(greatest(v.value, f.p_lo), f.p_hi)), 6)
         AS sd_wins,
       CAST(sum(CASE WHEN v.value < f.p_lo THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clipped_lo,
       CAST(sum(CASE WHEN v.value > f.p_hi THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clipped_hi
FROM vals v JOIN fences f USING (event_type)
GROUP BY v.event_type
"""


def lang_source_independence(documents: DataFrame) -> DataFrame:
    """Pearson chi-square independence audit of the lang × source
    contingency table — "did the language mix shift per source?" is the
    first drift question a multi-source corpus audit asks.

    One map-side-combined groupBy builds the (lang, source, count)
    table (vocabulary-bounded: langs × sources cells); marginals come
    from two window sums over those CELLS (not the corpus), and the
    statistic folds the cells into one row:
    χ² = Σ (O − E)² / E with E = row_total · col_total / N.
    Returns (n_cells, n_langs, n_sources, dof, chi2) — chi2 rounded to
    6; the cell fold is a ≤ |langs·sources|-term double sum, far inside
    round-6 stability.
    """
    from pyspark.sql import Window

    cells = documents.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("o")
    )
    wl = Window.partitionBy("lang")
    ws = Window.partitionBy("source")
    wall = Window.partitionBy()
    e = (
        F.sum("o").over(wl).cast("double")
        * F.sum("o").over(ws).cast("double")
        / F.sum("o").over(wall).cast("double")
    )
    per_cell = cells.select(
        "lang",
        "source",
        ((F.col("o") - e) * (F.col("o") - e) / e).alias("contrib"),
    )
    return per_cell.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        (
            (F.countDistinct("lang") - F.lit(1))
            * (F.countDistinct("source") - F.lit(1))
        ).alias("dof"),
        F.round(F.sum("contrib"), 6).alias("chi2"),
    )


LANG_SOURCE_INDEPENDENCE_SQL = """
WITH cells AS (
  SELECT lang, source, count(*) AS o
  FROM documents GROUP BY lang, source),
x AS (
  SELECT lang, source, o,
         sum(o) OVER (PARTITION BY lang)::DOUBLE
           * sum(o) OVER (PARTITION BY source)::DOUBLE
           / sum(o) OVER ()::DOUBLE AS e
  FROM cells)
SELECT count(*) AS n_cells,
       count(DISTINCT lang) AS n_langs,
       count(DISTINCT source) AS n_sources,
       (count(DISTINCT lang) - 1) * (count(DISTINCT source) - 1) AS dof,
       round(sum((o - e) * (o - e) / e), 6) AS chi2
FROM x
"""


ROBUST_VALUE_OUTLIERS_SQL = f"""
WITH vals AS (
  SELECT event_type, value FROM events WHERE value IS NOT NULL),
stats AS (
  SELECT event_type, count(*) AS n,
         round(quantile_cont(value, 0.5), 6) AS med,
         round(quantile_cont(value, 0.25), 6) AS p25,
         round(quantile_cont(value, 0.75), 6) AS p75
  FROM vals GROUP BY event_type),
mad AS (
  SELECT v.event_type,
         round(quantile_cont(abs(v.value - s.med), 0.5), 6) AS mad
  FROM vals v JOIN stats s USING (event_type)
  GROUP BY v.event_type)
SELECT s.event_type, s.n, s.med, m.mad, s.p25, s.p75,
       CAST(sum(CASE WHEN {MAD_CONSISTENCY!r} * abs(v.value - s.med)
                          > {MAD_Z_CUT!r} * m.mad
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_mad_outliers,
       CAST(sum(CASE WHEN v.value < s.p25 - {IQR_WHISKER!r} * (s.p75 - s.p25)
                       OR v.value > s.p75 + {IQR_WHISKER!r} * (s.p75 - s.p25)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_iqr_outliers
FROM vals v JOIN stats s USING (event_type) JOIN mad m USING (event_type)
GROUP BY s.event_type, s.n, s.med, m.mad, s.p25, s.p75
"""


# ---------------------------------------------------------------------------
# PSI distribution drift (population stability index)
# ---------------------------------------------------------------------------

PSI_BUCKET_WIDTH = 5.0   # value-histogram bin width
PSI_BUCKET_CAP = 20      # top bucket absorbs the tail (21 ids: 0..20)


def value_drift_psi(events: DataFrame) -> DataFrame:
    """(event_type, n_ref, n_cur, n_buckets, psi): population stability
    index of the ``value`` distribution per event type, comparing the
    stream's first time-half (reference window) against its second
    (current window) — the standard ML-monitoring drift metric
    (PSI = Σ_b (p_b − q_b)·ln(p_b/q_b); rule of thumb: < 0.1 stable,
    > 0.25 shifted). The chi-square audit (`lang_source_independence`)
    answers "are two CATEGORICALS independent"; PSI answers "did this
    NUMERIC column's distribution move between two windows", the
    question a training-data refresh asks before trusting a new crawl
    snapshot.

    Windowing is data-derived but scalar: the split day is the midpoint
    of the observed epoch-day span (min + floor(span/2)), one exact
    integer computed by a one-row aggregate that broadcasts. Buckets are
    fixed-width value bins (width 5, top bucket capped at id 20), and
    the PSI sum runs over buckets OBSERVED for the type (in either
    half); both halves are add-one smoothed over those n_buckets cells,
    so an empty half-cell contributes a finite term instead of ln(0).

    Cross-engine determinism: bucket ids and the split day are exact
    integer arithmetic; p and q are single divisions of exact integers;
    ln arguments are exact integers (c+1, n+B — the proven bit-stable
    transcendental shape); the per-type fold is ≤ 21 double terms,
    rounded to 6.

    Scale shape: one scan folds to (type × bucket × half) cells
    map-side (alphabet-bounded: |types|·21 rows); the split-day scalar
    is a one-row broadcast; marginals are window sums over the CELLS;
    the finale is a per-type aggregate of ≤ 21 rows. Nothing
    corpus-sized ever shuffles.
    """
    from pyspark.sql import Window

    ev = events.filter(F.col("value").isNotNull()).select(
        "event_type",
        F.floor(F.col("ts").cast("long") / 86400).alias("day"),
        F.least(
            F.greatest(
                F.floor(F.col("value") / PSI_BUCKET_WIDTH), F.lit(0)
            ),
            F.lit(PSI_BUCKET_CAP),
        )
        .cast("int")
        .alias("bucket"),
    )
    split = ev.agg(
        (
            F.min("day")
            + F.floor((F.max("day") - F.min("day")) / 2)
        ).alias("mid_day")
    )
    cells = (
        ev.crossJoin(F.broadcast(split))
        .groupBy("event_type", "bucket")
        .agg(
            F.sum(F.when(F.col("day") <= F.col("mid_day"), 1).otherwise(0))
            .cast("bigint")
            .alias("cr"),
            F.sum(F.when(F.col("day") > F.col("mid_day"), 1).otherwise(0))
            .cast("bigint")
            .alias("cc"),
        )
    )
    return psi_fold(cells)


def psi_fold(cells: DataFrame) -> DataFrame:
    """The PSI window fold over (event_type, bucket, cr, cc) cells —
    shared by the batch two-half query and the streaming drift monitor
    (which accumulates the ``cc`` side additively at ingest and freezes
    ``cr`` from a reference window)."""
    from pyspark.sql import Window

    wt = Window.partitionBy("event_type")
    x = cells.select(
        "event_type",
        "cr",
        "cc",
        F.sum("cr").over(wt).alias("nr"),
        F.sum("cc").over(wt).alias("nc"),
        F.count(F.lit(1)).over(wt).alias("b"),
    )
    p = (F.col("cr") + 1).cast("double") / (F.col("nr") + F.col("b")).cast(
        "double"
    )
    q = (F.col("cc") + 1).cast("double") / (F.col("nc") + F.col("b")).cast(
        "double"
    )
    lnr = (
        F.log(F.col("cr") + 1)
        - F.log(F.col("nr") + F.col("b"))
        - F.log(F.col("cc") + 1)
        + F.log(F.col("nc") + F.col("b"))
    )
    return x.groupBy("event_type").agg(
        F.max("nr").cast("bigint").alias("n_ref"),
        F.max("nc").cast("bigint").alias("n_cur"),
        F.max("b").cast("bigint").alias("n_buckets"),
        F.round(F.sum((p - q) * lnr), 6).alias("psi"),
    )


def psi_value_buckets(events: DataFrame) -> DataFrame:
    """(event_type, bucket, n): the alphabet-bounded bucket histogram a
    drift monitor accumulates (same bucketing as ``value_drift_psi``)."""
    return (
        events.filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.least(
                F.greatest(
                    F.floor(F.col("value") / PSI_BUCKET_WIDTH), F.lit(0)
                ),
                F.lit(PSI_BUCKET_CAP),
            )
            .cast("int")
            .alias("bucket"),
        )
        .groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def psi_report(ref_cells: DataFrame, cur_cells: DataFrame) -> DataFrame:
    """PSI between two frozen (event_type, bucket, n) histograms — the
    report shape the streaming monitor emits. Identical fold (and thus
    identical output) to ``value_drift_psi`` when the histograms are the
    two time-halves, which is how the stream twin is test-pinned."""
    r = ref_cells.select("event_type", "bucket", F.col("n").alias("cr"))
    c = cur_cells.select("event_type", "bucket", F.col("n").alias("cc"))
    joined = (
        r.join(c, ["event_type", "bucket"], "full_outer")
        .fillna(0, ["cr", "cc"])
    )
    return psi_fold(joined)


VALUE_DRIFT_PSI_SQL = f"""
WITH ev AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         CAST(least(greatest(floor(value / {PSI_BUCKET_WIDTH!r}), 0),
                    {PSI_BUCKET_CAP}) AS INT) AS bucket
  FROM events WHERE value IS NOT NULL),
split AS (
  SELECT min(day) + CAST(floor((max(day) - min(day)) / 2) AS BIGINT)
           AS mid_day
  FROM ev),
cells AS (
  SELECT event_type, bucket,
         sum(CASE WHEN day <= (SELECT mid_day FROM split)
                  THEN 1 ELSE 0 END) AS cr,
         sum(CASE WHEN day > (SELECT mid_day FROM split)
                  THEN 1 ELSE 0 END) AS cc
  FROM ev GROUP BY 1, 2),
x AS (
  SELECT event_type, cr, cc,
         sum(cr) OVER (PARTITION BY event_type) AS nr,
         sum(cc) OVER (PARTITION BY event_type) AS nc,
         count(*) OVER (PARTITION BY event_type) AS b
  FROM cells)
SELECT event_type,
       CAST(max(nr) AS BIGINT) AS n_ref,
       CAST(max(nc) AS BIGINT) AS n_cur,
       CAST(max(b) AS BIGINT) AS n_buckets,
       round(sum(
         ((cr + 1)::DOUBLE / (nr + b)::DOUBLE
          - (cc + 1)::DOUBLE / (nc + b)::DOUBLE)
         * (ln(cr + 1) - ln(nr + b) - ln(cc + 1) + ln(nc + b))), 6) AS psi
FROM x GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# Two-sample Kolmogorov–Smirnov drift (the UNBINNED complement of PSI)
# ---------------------------------------------------------------------------

# Smirnov asymptotic critical coefficient at α = 0.05: reject equality
# when D > c(α)·sqrt((n1+n2)/(n1·n2)), c(0.05) = 1.358 (public tables).
KS_COEF_05 = 1.358


def ks_source_length_drift(documents: DataFrame) -> DataFrame:
    """(source_a, source_b, n_a, n_b, d_num, ks_d, significant_05):
    exact two-sample Kolmogorov–Smirnov distance between every pair of
    sources' document-length (``n_chars``) distributions — the
    UNBINNED drift test completing the monitoring family: chi-square
    (``lang_source_independence``) answers categorical independence,
    PSI (``value_drift_psi``) answers binned numeric drift with a
    bucket-width choice, KS answers numeric drift with NO binning
    parameter at all (sup-distance between the two empirical CDFs —
    Kolmogorov 1933 / Smirnov 1939, public).

    Exactness: D = max_v |A(v)/n_a − B(v)/n_b| is computed as the exact
    INTEGER numerator ``d_num = max_v |A(v)·n_b − B(v)·n_a|`` over the
    union of observed values (post-step ECDF at each distinct value
    handles cross-sample ties exactly); ``ks_d = d_num/(n_a·n_b)``
    rounded to 6 is display only, so both engines agree bit-for-bit.
    The α=0.05 significance flag compares doubles both engines derive
    from the same exact integers (division, sqrt, one literal
    coefficient) — identical IEEE operations, identical verdicts.

    Scale shape: the corpus folds ONCE to the (source, n_chars) value
    histogram (map-side combinable; distinct-value-bounded, NOT
    corpus-sized); the pair table is sources², a broadcast sliver; the
    histogram expands only per PAIRING of its source (≤ sources−1
    copies of a histogram row, never of a corpus row); cumsums are
    windows over per-pair distinct values. Nothing corpus-sized
    shuffles twice.
    """
    from pyspark.sql import Window

    from ..session import persist_once

    # persist: the value histogram feeds both pair sides plus the
    # totals (4 consumers) — without it the CORPUS scan re-runs per
    # consumer (measured: 6 parquet scans at sf0.001); cached it is one
    # scan + a distinct-value-bounded table. The sources² pair join is
    # a broadcast nested-loop over the per-source TOTALS sliver —
    # source catalogs are nation-like bounded dimensions, never
    # corpus-sized, so the BNLJ operands stay tiny at any SF.
    hist = persist_once(
        documents.groupBy("source", F.col("n_chars").alias("v"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    totals = hist.groupBy("source").agg(
        F.sum("cnt").cast("bigint").alias("n")
    )
    a = totals.select(
        F.col("source").alias("source_a"), F.col("n").alias("n_a")
    )
    b = totals.select(
        F.col("source").alias("source_b"), F.col("n").alias("n_b")
    )
    pairs = a.crossJoin(F.broadcast(b)).filter(
        F.col("source_a") < F.col("source_b")
    )
    side_a = pairs.join(
        hist, F.col("source") == F.col("source_a")
    ).select(
        "source_a", "source_b", "n_a", "n_b", "v",
        F.col("cnt").alias("da"), F.lit(0).cast("bigint").alias("db"),
    )
    side_b = pairs.join(
        hist, F.col("source") == F.col("source_b")
    ).select(
        "source_a", "source_b", "n_a", "n_b", "v",
        F.lit(0).cast("bigint").alias("da"), F.col("cnt").alias("db"),
    )
    merged = (
        side_a.unionByName(side_b)
        .groupBy("source_a", "source_b", "n_a", "n_b", "v")
        .agg(F.sum("da").alias("da"), F.sum("db").alias("db"))
    )
    w = (
        Window.partitionBy("source_a", "source_b")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    stepped = merged.select(
        "source_a", "source_b", "n_a", "n_b",
        F.abs(
            F.sum("da").over(w) * F.col("n_b")
            - F.sum("db").over(w) * F.col("n_a")
        ).alias("gap"),
    )
    out = (
        stepped.groupBy("source_a", "source_b", "n_a", "n_b")
        .agg(F.max("gap").cast("bigint").alias("d_num"))
    )
    ks = F.col("d_num") / (F.col("n_a") * F.col("n_b")).cast("double")
    crit = F.lit(KS_COEF_05) * F.sqrt(
        (F.col("n_a") + F.col("n_b")).cast("double")
        / (F.col("n_a") * F.col("n_b")).cast("double")
    )
    return out.select(
        "source_a", "source_b", "n_a", "n_b", "d_num",
        F.round(ks, 6).alias("ks_d"),
        (ks > crit).alias("significant_05"),
    ).orderBy(F.desc("d_num"), "source_a", "source_b")


KS_SOURCE_LENGTH_SQL = f"""
WITH hist AS (
  SELECT source, n_chars AS v, count(*) AS cnt
  FROM documents GROUP BY source, n_chars),
totals AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS n
           FROM hist GROUP BY source),
pairs AS (
  SELECT a.source AS source_a, b.source AS source_b,
         a.n AS n_a, b.n AS n_b
  FROM totals a CROSS JOIN totals b
  WHERE a.source < b.source),
merged AS (
  SELECT source_a, source_b, n_a, n_b, v,
         sum(da) AS da, sum(db) AS db
  FROM (
    SELECT p.source_a, p.source_b, p.n_a, p.n_b, h.v,
           h.cnt AS da, 0 AS db
    FROM pairs p JOIN hist h ON h.source = p.source_a
    UNION ALL
    SELECT p.source_a, p.source_b, p.n_a, p.n_b, h.v,
           0 AS da, h.cnt AS db
    FROM pairs p JOIN hist h ON h.source = p.source_b)
  GROUP BY source_a, source_b, n_a, n_b, v),
stepped AS (
  SELECT source_a, source_b, n_a, n_b,
         abs(sum(da) OVER wv * n_b - sum(db) OVER wv * n_a) AS gap
  FROM merged
  WINDOW wv AS (PARTITION BY source_a, source_b ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
agg AS (
  SELECT source_a, source_b, n_a, n_b,
         CAST(max(gap) AS BIGINT) AS d_num
  FROM stepped GROUP BY source_a, source_b, n_a, n_b)
SELECT source_a, source_b, n_a, n_b, d_num,
       round(d_num / (n_a * n_b)::DOUBLE, 6) AS ks_d,
       d_num / (n_a * n_b)::DOUBLE
         > {KS_COEF_05} * sqrt((n_a + n_b)::DOUBLE
                               / (n_a * n_b)::DOUBLE) AS significant_05
FROM agg
ORDER BY d_num DESC, source_a, source_b
"""
