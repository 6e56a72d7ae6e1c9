"""Slice 3 correctness: FFT k-center properties (no SQL oracle — iterative)."""

from __future__ import annotations

import itertools
import math

import numpy as np
import pytest

from bigdata_hwk_spark.operators import kcenter as KC

from .conftest import SF_SMOKE
from .test_outliers import N15


def _rng_points(n, seed=7):
    rng = np.random.default_rng(seed)
    return rng.uniform(0, 100, size=(n, 2))


def _radius(pts: np.ndarray, centers: np.ndarray) -> float:
    d2 = ((pts[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
    return math.sqrt(d2.min(axis=1).max())


def test_fft_radius_nonincreasing_in_k():
    pts = _rng_points(300)
    radii = [_radius(pts, KC.sequential_fft(pts, k)) for k in range(2, 12)]
    assert all(a >= b - 1e-12 for a, b in zip(radii, radii[1:]))


def test_fft_is_2_approximation():
    """Gonzalez guarantee: R_FFT ≤ 2·R_opt (brute-force opt on tiny input)."""
    pts = _rng_points(14, seed=3)
    k = 3
    r_fft = _radius(pts, KC.sequential_fft(pts, k))
    r_opt = min(
        _radius(pts, pts[list(idx)])
        for idx in itertools.combinations(range(len(pts)), k)
    )
    assert r_fft <= 2 * r_opt + 1e-12


def test_fft_centers_are_input_points():
    pts = _rng_points(50)
    centers = KC.sequential_fft(pts, 5)
    assert all(any(np.array_equal(c, p) for p in pts) for c in centers)


@pytest.fixture()
def n15_df(spark):
    return spark.createDataFrame(N15, "point_id bigint, x double, y double")


def test_mrfft_single_partition_equals_sequential(spark, n15_df):
    """With L=1 the coreset is FFT of all (sorted) points, so R2 re-runs FFT
    on its own output → MRFFT centers ≡ SequentialFFT centers."""
    pts = np.array([[x, y] for _, x, y in N15])
    seq = KC.sequential_fft(pts, 4)
    centers, radius = KC.mrfft(n15_df, k=4, l=1)
    assert {tuple(c) for c in centers} == {tuple(c) for c in seq}
    assert radius == pytest.approx(_radius(pts, seq))


def test_mrfft_radius_bounds_and_determinism(spark):
    from bigdata_hwk_spark.sources.tables import points_from_lineitem

    pts_df = points_from_lineitem(spark, SF_SMOKE).cache()
    pts = np.array([[r.x, r.y] for r in pts_df.select("x", "y").collect()])
    c1, r1 = KC.mrfft(pts_df, k=8, l=4)
    c2, r2 = KC.mrfft(pts_df, k=8, l=4)
    assert np.array_equal(c1, c2) and r1 == r2  # deterministic
    # radius really is max-min distance to the returned centers
    assert r1 == pytest.approx(_radius(pts, c1), rel=1e-12)
    # coreset-based FFT can't beat more centers: sanity vs k=2
    _, r_small = KC.mrfft(pts_df, k=2, l=4)
    assert r1 <= r_small + 1e-12
    pts_df.unpersist()


def test_hw2_pipeline_smoke(spark):
    from bigdata_hwk_spark.sources.tables import points_from_lineitem

    row = KC.hw2_pipeline(
        points_from_lineitem(spark, SF_SMOKE), k=8, l=4, m=3
    ).collect()[0]
    assert row.radius > 0
    assert row.sure_outliers >= 0 and row.uncertain_points >= 0
