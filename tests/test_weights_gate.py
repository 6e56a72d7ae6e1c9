"""Soft-dedup weights and the percentile quality gate: own-contract tests.

Cross-engine equality is pinned by the registry oracles; these pin the
properties the operators promise — per-cluster unit mass, the at-most-q
drop bound, and threshold consistency — on the fixture corpus.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from bigdata_hwk_spark.functions.text import quality_percentile_gate
from bigdata_hwk_spark.operators.dedup import (
    dedup_clusters,
    soft_dedup_weights,
)
from bigdata_hwk_spark.sources.tables import load_table

from .conftest import SF_CORRECT


def test_soft_dedup_cluster_mass_is_one(spark):
    """Every near-dup cluster contributes exactly one doc's worth of
    weight (up to the 6-decimal rounding of each member's share), and
    unclustered docs keep weight 1."""
    docs = load_table(spark, SF_CORRECT, "documents")
    w = soft_dedup_weights(docs)
    clusters = dedup_clusters(docs).select("doc_id", "cluster_id")
    mass = (
        w.join(clusters, "doc_id")
        .groupBy("cluster_id")
        .agg(F.sum("weight").alias("mass"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert len(mass) > 0  # fixture-validity: near-dup clusters exist
    for r in mass:
        # n members × round(1/n, 6) each
        assert abs(r.mass - r.n * round(1.0 / r.n, 6)) < 1e-9
    solo = w.join(clusters, "doc_id", "left_anti")
    assert solo.filter(F.col("weight") != 1.0).count() == 0
    # effective size = docs - (duplicated mass); strictly less than N here
    n = docs.count()
    eff = w.agg(F.sum("weight")).collect()[0][0]
    assert eff < n


def test_quality_gate_drop_bound_and_consistency(spark):
    docs = load_table(spark, SF_CORRECT, "documents")
    out = quality_percentile_gate(docs, q=0.25).collect()
    n = len(out)
    dropped = [r for r in out if not r.kept]
    kept = [r for r in out if r.kept]
    # at most the bottom quartile leaves (strictly fewer when the
    # threshold score is tied across the boundary)
    assert 0 < len(dropped) < 0.25 * n + 1
    thr = out[0].threshold
    assert all(r.threshold == thr for r in out)
    assert all(r.quality_score < thr for r in dropped)
    assert all(r.quality_score >= thr for r in kept)
    # t is the k-th smallest score of the multiset
    k = max(math.floor(0.25 * n), 1)
    scores = sorted(r.quality_score for r in out)
    assert thr == scores[k - 1]


def test_quality_gate_q_zero_keeps_all(spark):
    docs = load_table(spark, SF_CORRECT, "documents")
    out = quality_percentile_gate(docs, q=0.0)
    assert out.filter(~F.col("kept")).count() == 0


def test_unigram_surprise_hand_case(spark):
    """Exact hand computation: corpus 'a a' + 'a b' has counts a=3, b=1,
    total=4 — doc 0 averages -ln(3/4), doc 1 averages the mean of
    -ln(3/4) and -ln(1/4); common-word docs score LOWER."""
    from bigdata_hwk_spark.functions.text import unigram_surprise_scores

    docs = spark.createDataFrame(
        [(0, "a a"), (1, "a b")], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_tokens, r.avg_neg_logprob)
        for r in unigram_surprise_scores(docs).collect()
    }
    ln = math.log
    assert got[0] == (2, round(ln(4) - ln(3), 6))
    assert got[1] == (2, round(ln(4) - (ln(3) + ln(1)) / 2, 6))
    assert got[0][1] < got[1][1]


def test_unigram_surprise_fixture_shape(spark):
    from bigdata_hwk_spark.functions.text import unigram_surprise_scores
    from bigdata_hwk_spark.functions.text import token_stats

    docs = load_table(spark, SF_CORRECT, "documents")
    out = unigram_surprise_scores(docs)
    rows = out.collect()
    assert len(rows) == docs.count()
    assert all(r.avg_neg_logprob > 0 for r in rows)
    # token accounting agrees with the whitespace tokenizer
    ts = {r.doc_id: r.n_tokens for r in token_stats(docs).collect()}
    assert all(ts[r.doc_id] == r.n_tokens for r in rows)
