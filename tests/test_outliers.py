"""Slice 1+2 correctness: outlier detectors vs DuckDB oracles + golden N15 case."""

from __future__ import annotations

import pytest

from bigdata_hwk_spark import registry
from bigdata_hwk_spark.operators import outliers as O

from .conftest import SF_CORRECT, SF_SMOKE, assert_matches_oracle

ORACLE_QUERIES = sorted(registry.ORACLES)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle_smoke(spark, name):
    assert_matches_oracle(
        registry.QUERIES[name](spark, SF_SMOKE), registry.ORACLES[name], SF_SMOKE
    )


@pytest.mark.parametrize(
    "name", ["mr_approx_outliers_summary", "exact_outliers_topk"]
)
def test_query_matches_oracle_sf001(spark, name):
    """Driver-scale check on the two headline outlier queries."""
    assert_matches_oracle(
        registry.QUERIES[name](spark, SF_CORRECT), registry.ORACLES[name], SF_CORRECT
    )


# ---------------------------------------------------------------------------
# Golden hand-checkable case: the reference's own 15-point test input
# (/root/reference/HWK_1/TestN15-input.txt, FIXTURES.md §1) with D=1, M=3.
# ---------------------------------------------------------------------------
N15 = [
    (0, 0.4, 0.9), (1, 0.5, 4.1), (2, 0.8, 0.91), (3, 0.81, 1.1), (4, 1.1, 5.0),
    (5, 1.11, 5.1), (6, 1.5, 1.1), (7, 1.52, 1.11), (8, 1.53, 1.12),
    (9, 1.54, 1.13), (10, 1.51, 3.2), (11, 1.52, 3.6), (12, 3.21, 4.6),
    (13, 4.11, 4.11), (14, 4.32, 4.3),
]


def _n15_df(spark):
    return spark.createDataFrame(N15, "point_id bigint, x double, y double")


def _brute_counts(d):
    import math

    counts = {}
    for pid, x, y in N15:
        counts[pid] = sum(
            1 for _, qx, qy in N15 if math.dist((x, y), (qx, qy)) <= d
        )
    return counts


def test_exact_outliers_n15_matches_bruteforce(spark):
    d, m = 1.0, 3
    got = {
        r.point_id: r.neighbor_cnt
        for r in O.exact_outlier_counts(_n15_df(spark), d).collect()
    }
    assert got == _brute_counts(d)
    outliers = {r.point_id for r in O.exact_outliers(_n15_df(spark), d, m).collect()}
    brute = {pid for pid, c in _brute_counts(d).items() if c <= m}
    assert outliers == brute


def test_approx_summary_n15_bounds_exact(spark):
    """Grid guarantees: sure-outlier cells contain only true outliers, and
    every true outlier is in a sure or uncertain cell."""
    d, m = 1.0, 3
    row = O.mr_approx_outliers_summary(_n15_df(spark), d, m).collect()[0]
    n_true = sum(1 for c in _brute_counts(d).values() if c <= m)
    assert row.sure_outliers <= n_true
    assert row.sure_outliers + row.uncertain_points >= n_true


def test_exact_join_is_hash_not_nested_loop(spark):
    """The theta→equi rewrite must plan a hash/sort-merge join, never
    BroadcastNestedLoopJoin (SURVEY.md §4.3.1)."""
    pts = registry._points_subset(spark, SF_SMOKE)
    plan = O.exact_outlier_counts(pts, registry.EXACT_D)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("SortMergeJoin" in plan) or ("HashJoin" in plan) or ("BroadcastHashJoin" in plan)
