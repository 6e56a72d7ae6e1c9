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


# ---------------------------------------------------------------------------
# Winnowed fingerprints (MOSS)


from bigdata_hwk_spark.functions import text as TX


def _tdocs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _py_winnow(text: str):
    """Plain-Python robust winnowing — the independent replication the
    Spark/window formulation is checked against."""
    import hashlib
    import re

    tx = re.sub(" +", " ", text.strip().lower())
    k, w = TX.WINNOW_K, TX.WINNOW_W
    if len(tx) < k:
        return set()
    hs = [
        int(hashlib.md5(tx[i : i + k].encode()).hexdigest()[:15], 16)
        for i in range(len(tx) - k + 1)
    ]
    out = set()
    n = len(hs)
    for q in range(max(n - w + 1, 1)):
        window = hs[q : q + w]
        m = min(window)
        # rightmost minimum
        p = q + max(i for i, h in enumerate(window) if h == m)
        out.add((p, hs[p]))
    return out


def test_winnow_matches_python_replication_on_fixture(spark):
    """Every fixture document's selected (pos, hash) set must equal the
    plain-Python winnow — pins the window/struct-min formulation
    (including the rightmost-tie rule and both boundary windows)."""
    from bigdata_hwk_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    texts = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    got: dict[int, set] = {}
    for r in TX.winnowed_fingerprints(docs).collect():
        got.setdefault(r.doc_id, set()).add((r.fp_pos, r.fp_hash))
    for doc_id, text in texts.items():
        want = _py_winnow(text)
        assert got.get(doc_id, set()) == want, doc_id


def test_winnow_guarantee_shared_substring(spark):
    """Two docs sharing a >= K+W-1 (= 23) char stretch in different
    contexts MUST share at least one selected hash — the paper's
    detection guarantee (a full window of W grams fits inside the
    match, both docs see the identical hash run, the rightmost-min
    pick is the same gram)."""
    shared = "the quick brown fox jumps over it"  # 33 chars
    assert len(shared) >= TX.WINNOW_GUARANTEE
    rows = [
        (1, f"AAAA bbbb cccc {shared} dddd eeee"),
        (2, f"zzzz {shared} qqqq wwww rrrr tttt yyyy"),
    ]
    fps = TX.winnowed_fingerprints(_tdocs(spark, rows)).collect()
    by_doc: dict[int, set] = {}
    for r in fps:
        by_doc.setdefault(r.doc_id, set()).add(r.fp_hash)
    assert by_doc[1] & by_doc[2]


def test_winnow_density_and_short_docs(spark):
    """Density must sit near the published 2/(W+1) expectation on the
    fixture (loose band), and docs shorter than K grams-out entirely."""
    from bigdata_hwk_spark.sources.tables import load_table

    stats = registry.QUERIES["winnowed_fingerprint_stats"](
        spark, SF_SMOKE
    ).collect()
    assert stats, "fixture docs all shorter than K?"
    for r in stats:
        density = r.n_fps / r.n_grams
        assert 0.05 <= density <= 0.6, (r.doc_id, density)
    short = TX.winnowed_fingerprints(
        _tdocs(spark, [(1, "tiny")])
    ).collect()
    assert short == []


def test_winnow_copy_candidates_are_real_overlaps(spark):
    """Candidate pairs must actually share the claimed number of
    fingerprint hashes (recomputed from the fingerprint table)."""
    from bigdata_hwk_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    fps: dict[int, set] = {}
    for r in TX.winnowed_fingerprints(docs).collect():
        fps.setdefault(r.doc_id, set()).add(r.fp_hash)
    cands = TX.winnowed_copy_candidates(docs).collect()
    assert cands, "no candidate pairs on the fixture"
    for r in cands:
        assert r.n_shared_fps >= 2
        assert len(fps[r.doc_a] & fps[r.doc_b]) == r.n_shared_fps


@pytest.mark.parametrize(
    "name", ["winnowed_fingerprint_stats", "winnowed_copy_candidates"]
)
@pytest.mark.parametrize("sf", [SF_SMOKE, SF_CORRECT])
def test_winnow_oracle(spark, name, sf):
    assert_matches_oracle(
        registry.QUERIES[name](spark, sf), registry.ORACLES[name], sf
    )


def test_fused_band_keys_equal_long_form(spark):
    """r13 optimization pin: `_band_keys_from_shingles` (wide fused, no
    explode→re-group shuffle) must produce the BIT-IDENTICAL (doc_id,
    bk) set as the long-form `_band_keys(_minhash_from_shingles(...))`
    reference shape — on the real fixture corpus, so every LSH-family
    candidate set is unchanged by the fusion."""
    from bigdata_hwk_spark.operators import dedup as D
    from bigdata_hwk_spark.sources.tables import load_table

    docs = load_table(spark, SF_CORRECT, "documents")
    ex = D.doc_shingles(docs)
    r = D.MINHASH_H // D.MINHASH_BANDS
    ref = {
        (x.doc_id, x.bk)
        for x in D._band_keys(D._minhash_from_shingles(ex, D.MINHASH_H), r)
        .collect()
    }
    fused = {
        (x.doc_id, x.bk)
        for x in D._band_keys_from_shingles(ex, D.MINHASH_H, r).collect()
    }
    assert fused == ref and len(fused) > 0
