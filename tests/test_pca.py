"""Distributed PCA correctness (operators/pca.py).

No SQL oracle exists for an eigendecomposition, so the pins are:

* fit ≡ an exact NumPy recompute of the same corpus (eigenvalues close,
  components aligned up to the pinned sign);
* BIT-determinism under re-layout (the integer-partials contract the
  module shares with kmeans_fit);
* whitening really whitens: projected covariance ≈ I, reconstruction
  residual equals the dropped eigenvalue mass;
* monotonicity: cumulative explained variance is non-decreasing in the
  component index and the residual shrinks as components are added.
"""

from __future__ import annotations

import numpy as np
import pytest

from bigdata_hwk_spark.operators import pca as P
from bigdata_hwk_spark.sources.tables import load_table

from .conftest import SF_CORRECT, SF_SMOKE


def _np_fit(rows, m):
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    mean = X.mean(axis=0)
    cov = np.cov(X, rowvar=False, ddof=1)
    eigvals, eigvecs = np.linalg.eigh(cov)
    order = np.argsort(eigvals)[::-1][:m]
    return X, mean, eigvals[order], eigvecs[:, order]


@pytest.fixture(scope="module")
def embs(spark):
    return load_table(spark, SF_SMOKE, "embeddings")


def test_fit_matches_numpy_recompute(spark, embs):
    mean, comps, eigvals, n, total = P.pca_fit(embs, 8)
    rows = embs.select("embedding").collect()
    X, w_mean, w_eigs, w_vecs = _np_fit(rows, 8)
    assert n == len(rows)
    assert np.allclose(mean, w_mean, atol=1e-3)
    assert np.allclose(eigvals, w_eigs, rtol=1e-3, atol=1e-4)
    assert abs(total - float(np.cov(X, rowvar=False, ddof=1).trace())) < 1e-3
    # components match up to sign — compare |cosine| per column
    for j in range(8):
        c = abs(float(comps[:, j] @ w_vecs[:, j]))
        assert c > 0.999, f"component {j} misaligned: |cos|={c}"


def test_fit_is_layout_deterministic(spark, embs):
    a = P.pca_fit(embs.repartition(1), 6)
    b = P.pca_fit(embs.repartition(13), 6)
    assert a[3] == b[3]
    assert np.array_equal(a[0], b[0])  # mean bit-identical
    assert np.array_equal(a[1], b[1])  # components bit-identical
    assert np.array_equal(a[2], b[2])  # eigenvalues bit-identical


def test_whitened_audit_is_identity_covariance(spark, embs):
    row = P.pca_whitened_audit(embs, 8).collect()[0]
    assert row.n_rows == embs.count()
    assert row.n_components == 8
    assert row.max_abs_offdiag < 0.01, "whitened covariance not diagonal"
    assert row.max_diag_dev < 0.01, "whitened variance not unit"
    assert row.mean_recon_err >= 0


def test_recon_error_equals_dropped_eigenvalue_mass(spark, embs):
    """Pythagoras of PCA: mean squared residual after keeping m
    components = (n-1)/n * sum of dropped eigenvalues."""
    rows = embs.select("embedding").collect()
    X, mean, eigs_all, _ = _np_fit(rows, 64)
    m = 8
    want = eigs_all[m:].sum() * (len(rows) - 1) / len(rows)
    got = P.pca_whitened_audit(embs, m).collect()[0].mean_recon_err
    assert abs(got - want) < 1e-3 * max(1.0, want)


def test_recon_error_monotone_in_components(spark, embs):
    errs = [
        P.pca_whitened_audit(embs, m).collect()[0].mean_recon_err
        for m in (2, 8, 16)
    ]
    assert errs[0] >= errs[1] >= errs[2]


def test_variance_query_shape_and_monotone(spark, embs):
    df = P.embedding_pca_variance(embs, 8)
    rows = sorted(df.collect(), key=lambda r: r.component)
    assert [r.component for r in rows] == list(range(8))
    evs = [r.eigenvalue for r in rows]
    assert evs == sorted(evs, reverse=True)
    cums = [r.cum_explained_pct for r in rows]
    assert cums == sorted(cums) and 0 < cums[-1] <= 100.0001


def test_projection_is_map_only_no_shuffle(spark, embs):
    mean, comps, eigvals, _, _ = P.pca_fit(embs, 4)
    df = P.pca_project(embs, mean, comps, eigvals)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    out = df.limit(5).collect()
    assert all(len(r.pca) == 4 for r in out)


def test_null_embeddings_skipped(spark, embs):
    from pyspark.sql import functions as F

    with_null = embs.withColumn(
        "embedding",
        F.when(F.col("vec_id") % 7 == 0, F.lit(None)).otherwise(
            F.col("embedding")
        ),
    )
    mean, comps, eigvals, n, _ = P.pca_fit(with_null, 4)
    kept = with_null.filter(F.col("embedding").isNotNull()).count()
    assert n == kept and comps.shape == (64, 4)


def test_registry_queries_run_at_gate_sf(spark):
    from bigdata_hwk_spark import registry

    var = registry.QUERIES["embedding_pca_variance"](spark, SF_CORRECT)
    aud = registry.QUERIES["embedding_pca_whitened_audit"](spark, SF_CORRECT)
    assert var.count() == 8
    assert aud.count() == 1
