"""Distance-based outlier detection, Spark-first.

Re-expresses the reference's two outlier detectors (reference
HWK_1/G029HW1.py) as fully-distributed DataFrame pipelines:

* **MRApproxOutliers** (reference ``MRApproxOutliers``,
  HWK_1/G029HW1.py:96-120; HWK_2/G029HW2.py:110-129): grid-quantize points
  to cells of side Λ = D/(2√2), build the cell histogram, compute N3/N7
  neighborhood sums, classify cells as sure-outlier / uncertain. The
  reference collects the histogram to a driver dict and probes it in a
  Python loop (HWK_1/G029HW1.py:108,71-93); we instead keep it distributed
  with the **offset-explode equi-join**: each cell contributes its count to
  the 49 cells of its 7×7 window via an exploded (di,dj) array, then one
  ``groupBy`` computes cell size, N3 and N7 in a single shuffle whose input
  is 49×|cells| rows — |cells| ≪ N, so this scales to arbitrary point
  counts where the driver dict would OOM.

* **ExactOutliers** (reference ``exactOutliers``, HWK_1/G029HW1.py:7-49):
  the reference runs an O(N²) driver-local pair loop capped at 200k points
  (HWK_1/G029HW1.py:155). We rewrite the distance theta-join as an
  equi-join: bin both sides to cells of side D, explode the 3×3 neighbor
  offsets on one side, equi-join on the cell key, then apply the exact
  squared-distance predicate. Catalyst plans a shuffled hash join (verified
  in tests via ``explain``) instead of the BroadcastNestedLoopJoin a raw
  ``|Δx|≤D``-style predicate would force; AQE's skew-join splitting handles
  hot cells at scale.

All arithmetic sticks to IEEE-754 double ops in a deterministic order so
the DuckDB oracles reproduce results bit-for-bit (squared distances are
compared against D² — no sqrt in any predicate).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame

from ..session import bounded_window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Grid binning (reference get_cell, HWK_1/G029HW1.py:52-57)
# ---------------------------------------------------------------------------


def cell_side(d: float) -> float:
    """Λ = D / (2√2) — reference HWK_1/G029HW1.py:99.

    D must be positive: Λ = 0 makes the ⌊x/Λ⌋ projection divide by zero
    (the reference crashes the same way; we fail with a clear message).
    D = 0 arises in practice when an MRFFT radius over ≤1 distinct point
    feeds ``hw2_pipeline``."""
    if d <= 0:
        raise ValueError(f"grid outlier detection needs D > 0, got {d!r}")
    return d / (2 * math.sqrt(2))


def with_cell(points: DataFrame, side: float) -> DataFrame:
    """Project (x, y) → integer cell coords (⌊x/side⌋, ⌊y/side⌋)."""
    if side <= 0:
        raise ValueError(f"grid binning needs a positive cell side, got {side!r}")
    return points.withColumns(
        {
            "cx": F.floor(F.col("x") / F.lit(side)).cast("int"),
            "cy": F.floor(F.col("y") / F.lit(side)).cast("int"),
        }
    )


def _offsets_col(radius: int):
    """Literal array<struct<di,dj>> of the (2r+1)² neighbor offsets.

    A plan-time constant, so the 49-way (or 9-way) expansion happens
    JVM-side inside whole-stage codegen — no Python round-trip and no
    second input scan.
    """
    return F.array(
        *[
            F.struct(F.lit(di).alias("di"), F.lit(dj).alias("dj"))
            for di in range(-radius, radius + 1)
            for dj in range(-radius, radius + 1)
        ]
    )


# ---------------------------------------------------------------------------
# MRApproxOutliers (G3)
# ---------------------------------------------------------------------------


def cell_histogram(points: DataFrame, d: float) -> DataFrame:
    """Non-empty cell → point count (reference Step A,
    HWK_1/G029HW1.py:102-105). Catalyst plans partial+final hash
    aggregation automatically (the reference hand-writes the combiner at
    HWK_1/G029HW1.py:60-69)."""
    return (
        with_cell(points, cell_side(d))
        .groupBy("cx", "cy")
        .agg(F.count(F.lit(1)).alias("cell_cnt"))
    )


def cell_stats(points: DataFrame, d: float) -> DataFrame:
    """Per-cell (cx, cy, cell_cnt, n3, n7).

    N3/N7 = total points in the 3×3 / 7×7 cell windows (reference
    calculate_N3_N7, HWK_1/G029HW1.py:71-93). Single extra shuffle over
    49×|cells| rows; empty target cells are dropped by the
    ``cell_cnt IS NOT NULL`` filter (the reference iterates only non-empty
    keys of the driver dict).
    """
    hist = cell_histogram(points, d)
    contrib = hist.select(
        F.explode(_offsets_col(3)).alias("o"), F.col("cx"), F.col("cy"), F.col("cell_cnt")
    ).select(
        (F.col("cx") + F.col("o.di")).alias("cx"),
        (F.col("cy") + F.col("o.dj")).alias("cy"),
        F.col("o.di").alias("di"),
        F.col("o.dj").alias("dj"),
        F.col("cell_cnt").alias("cnt"),
    )
    is_self = (F.col("di") == 0) & (F.col("dj") == 0)
    in_3x3 = (F.abs(F.col("di")) <= 1) & (F.abs(F.col("dj")) <= 1)
    return (
        contrib.groupBy("cx", "cy")
        .agg(
            F.sum(F.when(is_self, F.col("cnt"))).alias("cell_cnt"),
            F.sum(F.when(in_3x3, F.col("cnt"))).alias("n3"),
            F.sum("cnt").alias("n7"),
        )
        .filter(F.col("cell_cnt").isNotNull())
    )


def mr_approx_outliers_summary(points: DataFrame, d: float, m: int) -> DataFrame:
    """One-row summary: sure outliers / uncertain points.

    sure = Σ cell_cnt where N7 ≤ M (all points in such cells are certainly
    outliers — reference HWK_1/G029HW1.py:112); uncertain = Σ cell_cnt where
    N3 ≤ M < N7 (HWK_1/G029HW1.py:113).
    """
    stats = cell_stats(points, d)
    return stats.agg(
        F.coalesce(
            F.sum(F.when(F.col("n7") <= m, F.col("cell_cnt"))), F.lit(0)
        ).alias("sure_outliers"),
        F.coalesce(
            F.sum(F.when((F.col("n3") <= m) & (F.col("n7") > m), F.col("cell_cnt"))),
            F.lit(0),
        ).alias("uncertain_points"),
    )


def smallest_cells(points: DataFrame, d: float, k: int) -> DataFrame:
    """First K non-empty cells by ascending size (reference
    HWK_1/G029HW1.py:114,119-120), with (cx, cy) tiebreak for determinism
    (the reference's sort is driver-side and input-order-stable; a total
    order is required for a reproducible distributed top-K)."""
    return (
        cell_histogram(points, d)
        .orderBy("cell_cnt", "cx", "cy")
        .limit(k)
    )


# ---------------------------------------------------------------------------
# ExactOutliers (G4) — grid-bucketed distance self-join
# ---------------------------------------------------------------------------


def exact_outlier_counts(points: DataFrame, d: float) -> DataFrame:
    """(point_id, x, y, neighbor_cnt) where neighbor_cnt = |B(p, D)|.

    Counts every q (including p itself — the reference initializes each
    counter to 1, HWK_1/G029HW1.py:16) with dist(p, q) ≤ D. Theta→equi
    rewrite: cells of side D guarantee any pair within D is in adjacent
    cells, so the 9-offset explode + equi-join on (cx, cy) covers exactly
    the candidate set; the exact predicate compares squared distance to D².
    """
    binned = with_cell(points, d)
    probe = binned.select(
        F.explode(_offsets_col(1)).alias("o"), "point_id", "x", "y", "cx", "cy"
    ).select(
        F.col("point_id").alias("q_id"),
        F.col("x").alias("qx"),
        F.col("y").alias("qy"),
        (F.col("cx") + F.col("o.di")).alias("cx"),
        (F.col("cy") + F.col("o.dj")).alias("cy"),
    )
    dx = F.col("x") - F.col("qx")
    dy = F.col("y") - F.col("qy")
    d2 = F.lit(d) * F.lit(d)
    return (
        binned.join(probe, ["cx", "cy"])
        .filter(dx * dx + dy * dy <= d2)
        .groupBy("point_id", "x", "y")
        .agg(F.count(F.lit(1)).alias("neighbor_cnt"))
    )


def exact_outliers(points: DataFrame, d: float, m: int) -> DataFrame:
    """Points p with |B(p, D)| ≤ M (reference outlier predicate,
    HWK_1/G029HW1.py:35-39; self-inclusive count)."""
    return exact_outlier_counts(points, d).filter(F.col("neighbor_cnt") <= m)


def exact_outliers_topk(points: DataFrame, d: float, m: int, k: int) -> DataFrame:
    """First K outliers by ascending |B(p, D)| (reference
    HWK_1/G029HW1.py:45-49), point_id tiebreak for determinism."""
    return (
        exact_outliers(points, d, m)
        .orderBy("neighbor_cnt", "point_id")
        .limit(k)
        .select("point_id", "x", "y", "neighbor_cnt")
    )


# P7 size guard (reference HWK_1/G029HW1.py:155): the reference runs the
# exact path only when the input fits its driver-local O(N²) loop. Our
# exact path is distributed and doesn't share that hard limit, but the
# policy itself is part of the reference's contract: small inputs get the
# exact per-point answer, large ones the grid approximation.
EXACT_PATH_MAX_POINTS = 200_000


def outliers_auto(
    points: DataFrame, d: float, m: int, cap: int = EXACT_PATH_MAX_POINTS
) -> tuple[str, DataFrame]:
    """P7 policy branch: ('exact', per-point outliers) iff the input has at
    most ``cap`` rows, else ('approx', MRApproxOutliers one-row summary).
    The count is one metadata-cheap job; callers that already know N can
    branch themselves."""
    n = points.count()
    if n <= cap:
        return "exact", exact_outliers(points, d, m)
    return "approx", mr_approx_outliers_summary(points, d, m)


# ---------------------------------------------------------------------------
# Grid hotspot detection (spatial-statistics face of the grid machinery)
# ---------------------------------------------------------------------------

HOTSPOT_FACTOR = 3
HOTSPOT_TOPK = 20


def grid_hotspots(
    points: DataFrame,
    d: float,
    factor: int = HOTSPOT_FACTOR,
    topk: int = HOTSPOT_TOPK,
) -> DataFrame:
    """Top-``topk`` local density hotspots: non-empty cells whose count
    exceeds ``factor`` × the mean of their non-empty 3×3 neighbors — the
    Getis-Ord hot-spot idea reduced to an EXACT INTEGER inequality
    (``cell_cnt · nbr_cells > factor · nbr_sum``; no float mean reaches
    the decision, the ``windowed_count_anomalies`` device), so the flag
    set is identical in both engines.

    Where the outlier pipeline (P1–P4) flags SPARSITY (few neighbors =
    isolated points), this flags the opposite tail — local density
    spikes: crawl traps, bot bursts, duplicated coordinate clusters.
    Same plan skeleton as ``cell_stats``: one cell histogram + the
    offset-explode neighborhood aggregate (radius 1 → 9-way, plan-time
    constant), then TakeOrderedAndProject + a window over the k
    survivors. A cell with NO non-empty neighbors is not a hotspot (no
    baseline to spike against; the inequality's nbr_cells factor makes
    that explicit rather than dividing by zero).

    Output: (rnk, cx, cy, cell_cnt, nbr_cells, nbr_sum, ratio) with
    ``ratio`` = cell_cnt·nbr_cells/nbr_sum rounded to 6 — reported for
    humans, never compared.
    """
    from pyspark.sql import Window

    hist = cell_histogram(points, d)
    contrib = hist.select(
        F.explode(_offsets_col(1)).alias("o"),
        F.col("cx"),
        F.col("cy"),
        F.col("cell_cnt"),
    ).select(
        (F.col("cx") + F.col("o.di")).alias("cx"),
        (F.col("cy") + F.col("o.dj")).alias("cy"),
        F.col("o.di").alias("di"),
        F.col("o.dj").alias("dj"),
        F.col("cell_cnt").alias("cnt"),
    )
    is_self = (F.col("di") == 0) & (F.col("dj") == 0)
    stats = (
        contrib.groupBy("cx", "cy")
        .agg(
            F.sum(F.when(is_self, F.col("cnt"))).alias("cell_cnt"),
            F.coalesce(
                F.sum(F.when(~is_self, F.col("cnt"))), F.lit(0)
            ).alias("nbr_sum"),
            F.coalesce(
                F.count(F.when(~is_self, F.lit(1))), F.lit(0)
            ).alias("nbr_cells"),
        )
        .filter(F.col("cell_cnt").isNotNull())
    )
    hot = stats.filter(
        (F.col("nbr_cells") > 0)
        & (
            F.col("cell_cnt") * F.col("nbr_cells")
            > F.lit(factor) * F.col("nbr_sum")
        )
    ).select(
        "cx",
        "cy",
        "cell_cnt",
        "nbr_cells",
        "nbr_sum",
        F.round(
            F.col("cell_cnt") * F.col("nbr_cells") / F.col("nbr_sum"), 6
        ).alias("ratio"),
    )
    order = [F.col("cell_cnt").desc(), F.col("cx").asc(), F.col("cy").asc()]
    top = hot.orderBy(*order).limit(topk)
    w = bounded_window(*order)
    return top.withColumn("rnk", F.row_number().over(w)).select(
        "rnk", "cx", "cy", "cell_cnt", "nbr_cells", "nbr_sum", "ratio"
    )
