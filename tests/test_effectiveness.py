"""Effectiveness parity with the reference's published HW2 TEST 2.

BASELINE.md's effectiveness table (Artificial10M_9_100: ~9 clusters + 100
planted outliers; K ∈ {50..130}) shows two qualitative invariants of the
MRFFT → MRApproxOutliers pipeline:

* the k-center radius R decreases monotonically as K grows;
* with D = R, the outlier sweep recovers the planted outliers — at the
  largest K every planted outlier is flagged (sure or uncertain), with
  few cluster points mixed in.

This module replays the same experiment shape on a deterministic
9-cluster + 100-planted-outlier point set (scaled down ~500×; the
qualitative invariants are scale-free) through the full engine path.
"""

from __future__ import annotations

import numpy as np
import pytest

from bigdata_hwk_spark.operators import kcenter as KC
from bigdata_hwk_spark.operators import outliers as O

N_CLUSTER_POINTS = 20_000
N_OUTLIERS = 100
M = 3


@pytest.fixture(scope="module")
def planted(spark):
    rng = np.random.default_rng(929)
    centers = rng.uniform(-50, 50, size=(9, 2))
    assign = rng.integers(0, 9, size=N_CLUSTER_POINTS)
    pts = centers[assign] + rng.normal(0, 0.8, size=(N_CLUSTER_POINTS, 2))
    # planted outliers: far ring, well outside every cluster
    theta = rng.uniform(0, 2 * np.pi, size=N_OUTLIERS)
    radius = rng.uniform(150, 200, size=N_OUTLIERS)
    outl = np.stack([radius * np.cos(theta), radius * np.sin(theta)], axis=1)
    allp = np.vstack([pts, outl])
    df = spark.createDataFrame(
        [(int(i), float(x), float(y)) for i, (x, y) in enumerate(allp)],
        "point_id long, x double, y double",
    ).repartition(16).cache()
    df.count()
    return df


def test_radius_decreases_with_k(planted):
    """BASELINE TEST 2 column 2: R strictly shrinks as K grows."""
    radii = []
    for k in (9, 20, 40, 80):
        _, r, _ = KC.mrfft_timed(planted, k, l=8)
        radii.append(r)
    assert all(a > b for a, b in zip(radii, radii[1:])), radii


def test_outlier_sweep_recovers_planted(planted):
    """BASELINE TEST 2 columns 3-4: with D from a large-K MRFFT radius,
    the grid sweep flags every planted outlier (they are the N_OUTLIERS
    most isolated points) and almost nothing else."""
    _, r, _ = KC.mrfft_timed(planted, 80, l=8)
    row = O.mr_approx_outliers_summary(planted, r, M).collect()[0]
    flagged = row.sure_outliers + row.uncertain_points
    assert flagged >= N_OUTLIERS  # no planted outlier escapes
    assert flagged <= N_OUTLIERS * 2  # and clusters stay unflagged
    # exact path agrees: the planted ids are exactly the trailing 100
    exact = O.exact_outliers(planted, r, M).collect()
    exact_ids = {e.point_id for e in exact}
    planted_ids = set(range(N_CLUSTER_POINTS, N_CLUSTER_POINTS + N_OUTLIERS))
    assert planted_ids <= exact_ids
    assert len(exact_ids - planted_ids) <= N_OUTLIERS
