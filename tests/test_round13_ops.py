"""Round-13 operators: two-sample Kolmogorov–Smirnov drift.

Hand cases with fully hand-derived integer numerators, a brute-force
Python ECDF replication over the real fixture, and the oracle sweep —
the same three-legged strategy the PSI/chi-square monitors use.
"""

from __future__ import annotations

import pytest

from bigdata_hwk_spark import registry
from bigdata_hwk_spark.operators import robust as RB

from .conftest import SF_CORRECT, SF_SMOKE, assert_matches_oracle


def _docs(spark, rows):
    return spark.createDataFrame(rows, "source string, n_chars bigint")


def test_ks_disjoint_supports_is_one(spark):
    """A entirely below B → the ECDF gap hits 1 exactly once A is
    exhausted: d_num = n_a·n_b, ks_d = 1. With n=3 per side the α=0.05
    critical value (1.358·sqrt(6/9) ≈ 1.109) exceeds 1, so even a
    maximal distance is NOT significant at these sample sizes — the
    flag must encode the n-dependence, not just the distance."""
    rows = [("a", v) for v in (1, 2, 3)] + [("b", v) for v in (4, 5, 6)]
    out = RB.ks_source_length_drift(_docs(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.source_a, r.source_b) == ("a", "b")
    assert (r.n_a, r.n_b) == (3, 3)
    assert r.d_num == 9 and r.ks_d == 1.0
    assert r.significant_05 is False


def test_ks_partial_overlap_hand_derived(spark):
    """A = {1,2,3,4}, B = {3,4,5,6}: post-step gaps are
    |A(v)·4 − B(v)·4| = 4, 8, 8, 4, 4 at v = 1,2,3,4,5 → d_num 8,
    D = 0.5."""
    rows = [("a", v) for v in (1, 2, 3, 4)] + [
        ("b", v) for v in (3, 4, 5, 6)
    ]
    r = RB.ks_source_length_drift(_docs(spark, rows)).collect()[0]
    assert r.d_num == 8 and r.ks_d == 0.5


def test_ks_identical_samples_is_zero(spark):
    """Identical multisets (ties included) → every post-step gap is 0."""
    rows = [(s, v) for s in ("a", "b") for v in (5, 5, 7, 9)]
    r = RB.ks_source_length_drift(_docs(spark, rows)).collect()[0]
    assert r.d_num == 0 and r.ks_d == 0.0 and r.significant_05 is False


def test_ks_matches_bruteforce_ecdf_on_fixture(spark):
    """Every pair's d_num must equal the brute-force two-pointer ECDF
    sup-distance computed in plain Python from the same fixture rows."""
    from bigdata_hwk_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    by_src: dict[str, list[int]] = {}
    for row in docs.select("source", "n_chars").collect():
        by_src.setdefault(row.source, []).append(row.n_chars)

    def brute(xs, ys):
        pts = sorted(set(xs) | set(ys))
        na, nb = len(xs), len(ys)
        return max(
            abs(sum(v <= p for v in xs) * nb - sum(v <= p for v in ys) * na)
            for p in pts
        )

    got = {
        (r.source_a, r.source_b): (r.d_num, r.n_a, r.n_b)
        for r in RB.ks_source_length_drift(docs).collect()
    }
    srcs = sorted(by_src)
    expected_pairs = {(a, b) for a in srcs for b in srcs if a < b}
    assert set(got) == expected_pairs
    for (sa, sb), (d_num, n_a, n_b) in got.items():
        assert (n_a, n_b) == (len(by_src[sa]), len(by_src[sb]))
        assert d_num == brute(by_src[sa], by_src[sb]), (sa, sb)
        assert 0 <= d_num <= n_a * n_b


@pytest.mark.parametrize("sf", [SF_SMOKE, SF_CORRECT])
def test_ks_oracle(spark, sf):
    assert_matches_oracle(
        registry.QUERIES["ks_source_length_drift"](spark, sf),
        registry.ORACLES["ks_source_length_drift"],
        sf,
    )
