"""Registry-wide physical-plan lint: the scale smells that must never
appear in ANY query's plan, asserted in one sweep so a future operator
can't quietly regress to a quadratic join.

* ``CartesianProduct`` — always wrong here: every pairwise operator in
  the engine is banded/bucketed/broadcast by design.
* ``BroadcastNestedLoopJoin`` — allowed only where a tiny side is
  deliberately broadcast against a non-equi predicate (the brute-force
  cosine top-k probe: Q query vectors against the corpus, the documented
  correctness baseline). Everything else must plan hash or sort-merge
  joins on equi-keys.
"""

from __future__ import annotations

import pytest

from bigdata_hwk_spark import registry

SF = "/root/testdata/sf0.001"

# name -> reason a BroadcastNestedLoopJoin is the intended plan
BNLJ_ALLOWED = {
    "knn_cosine_topk": "Q fixed query vectors broadcast against the corpus "
                       "(correctness baseline; scale path is ann_*)",
    "hard_negative_topk": "same shape as knn_cosine_topk: Q fixed anchor "
                          "vectors broadcast against the corpus (band "
                          "filter below the rank window; all-anchors "
                          "mining composes over ann_lsh_pairs instead)",
    "rrf_hybrid_topk": "the knn_cosine_topk shape (Q fixed query vectors "
                       "broadcast against the corpus) on the semantic "
                       "leg plus bm25's ONE-ROW (n, avgdl) scalar side "
                       "on the lexical leg; the fusion itself joins two "
                       "|queries|*topk tables hash-wise",
    "dense_retrieval_topk": "the rrf semantic leg standalone (r13): the "
                            "same Q fixed query vectors broadcast "
                            "against the corpus as knn_cosine_topk",
    "ks_source_length_drift": "sources x sources pair table built from "
                              "the per-source TOTALS sliver — source "
                              "catalogs are nation-like bounded "
                              "dimensions, both cross sides tiny at "
                              "any SF; the corpus itself folds once "
                              "to the persisted value histogram",
    "neyman_allocation": "two ONE-ROW scalar sides (total weight, total "
                         "base allocation) broadcast against the "
                         "|strata|-row table — the scalar-subquery "
                         "shape; both build sides are a single row by "
                         "construction",
    "windowed_counts_gapfilled": "generated hour spine × 5-row type "
                                 "dictionary — two tiny generated sides, "
                                 "no fact data in the cross join",
    "quality_gated_docs": "two ONE-ROW scalar sides (corpus count, "
                          "order-statistic threshold) broadcast against "
                          "the histogram/corpus — the scalar-subquery "
                          "shape; build side is a single row by "
                          "construction",
    "unigram_surprise_scores": "ONE-ROW corpus-total side broadcast "
                               "against the per-doc aggregate — the "
                               "same scalar-subquery shape",
    "curriculum_tiers": "two ONE-ROW scalar sides (corpus count, the "
                        "folded quantile-threshold row) broadcast "
                        "against the histogram/corpus — the same "
                        "scalar-subquery shape as quality_gated_docs",
    "copurchase_degree_mixing": "two ONE-ROW aggregate sides (six-sum "
                                "correlation row × degree-totals row) "
                                "cross-joined — the zipf_head_fit "
                                "scalar-subquery shape; both sides "
                                "single rows by construction",
    "value_drift_psi": "ONE-ROW split-day scalar side broadcast against "
                       "the event scan — the same scalar-subquery shape "
                       "as unigram_surprise_scores",
    "trigram_backoff_scores": "ONE-ROW (N, V) train-totals side broadcast "
                              "against the position table — the same "
                              "scalar-subquery shape as "
                              "unigram_surprise_scores",
    "dsir_importance_weights": "ONE-ROW (Nr, Nt) scalar side broadcast "
                               "against the per-doc aggregate — the "
                               "same scalar-subquery shape as "
                               "unigram_surprise_scores",
    "dsir_resample_counts": "the DSIR scalar side plus the gate's "
                            "ONE-ROW corpus-count/threshold sides — "
                            "the quality_gated_docs scalar-subquery "
                            "shape applied to DSIR scores",
    "zipf_head_fit": "two ONE-ROW aggregate sides (six-sum OLS row × "
                     "vocab-totals row) cross-joined — the same "
                     "scalar-subquery shape; both sides single rows "
                     "by construction",
    "heaps_law_fit": "ONE-ROW max(doc_id) side broadcast against the "
                     "token/first-appearance aggregates, then two "
                     "one-row aggregate sides cross-joined — the same "
                     "scalar-subquery shape",
    "pmi_top_bigrams": "ONE-ROW (Nt, Nb) totals side broadcast against "
                       "the support-cut bigram join — the same "
                       "scalar-subquery shape",
    "important_part_values": "ONE-ROW global-total side (Q11's scalar "
                             "subquery) broadcast against the per-part "
                             "aggregate — single row by construction",
    "bm25_doc_topk": "ONE-ROW (N, avgdl) corpus-stats side broadcast "
                     "against the query⋈posting join — the same "
                     "scalar-subquery shape as unigram_surprise_scores",
    "cms_view_purchase_joinsize": "four ONE-ROW aggregate sides (sketch "
                                  "min-fold, exact twin, two input "
                                  "counts) cross-joined into the single "
                                  "output row — every side is one row "
                                  "by construction",
    "assoc_triples_topk": "ONE-ROW basket-total side broadcast against "
                          "the triple aggregate — the same scalar-"
                          "subquery shape as assoc_rules_topk",
    "assoc_rules_topk": "ONE-ROW basket-total side broadcast against "
                        "the support-cut pair aggregate — the same "
                        "scalar-subquery shape as pmi_top_bigrams",
}


@pytest.mark.parametrize("name", sorted(registry.QUERIES))
def test_no_quadratic_join_shapes(spark, name):
    plan = (
        registry.QUERIES[name](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"
    if name not in BNLJ_ALLOWED:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name} plans a nested-loop join"
        )


# Representative filtered queries: the filter must reach the parquet scan
# (PushedFilters) and the scan must not read a column the query never
# touches (ReadSchema pruning). name -> (pushed-filter fragment, a column
# that must be pruned out of the whole plan)
PUSHDOWN_EXPECTED = {
    "tpch_q1": ("LessThanOrEqual(l_shipdate", "l_partkey"),
    "conversion_funnel": ("LessThan(ts", "props"),
    "orders_with_heavy_items": ("GreaterThan(l_quantity", "l_extendedprice"),
    "customers_without_orders": ("EqualTo(o_orderstatus", "o_totalprice"),
}


@pytest.mark.parametrize("name", sorted(PUSHDOWN_EXPECTED))
def test_filters_reach_the_scan_and_columns_prune(spark, name):
    frag, pruned_col = PUSHDOWN_EXPECTED[name]
    plan = (
        registry.QUERIES[name](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert frag in plan, f"{name}: filter not pushed to the scan"
    assert pruned_col not in plan, f"{name}: scan reads unused column {pruned_col}"


def test_global_windows_only_via_bounded_window():
    """Every unpartitioned ``Window.orderBy`` must route through
    ``session.bounded_window`` — the single annotated origin for
    WindowExec's move-all-data-to-one-partition warning, whose contract
    is a bounded (post-limit / histogram-sized) input. A raw global
    window anywhere else is either an unaudited scale bug or an
    unannotated bounded site; both fail here."""
    import os
    import re

    pkg = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bigdata_hwk_spark",
    )
    offenders = []
    for root, _, files in os.walk(pkg):
        for fname in files:
            if not fname.endswith(".py"):
                continue
            path = os.path.join(root, fname)
            rel = os.path.relpath(path, pkg)
            with open(path, encoding="utf-8") as fh:
                for lineno, line in enumerate(fh, start=1):
                    if re.search(r"\bWindow\.orderBy\(", line):
                        if rel == "session.py":  # the helper itself
                            continue
                        offenders.append(f"{rel}:{lineno}: {line.strip()}")
    assert offenders == [], (
        "raw global Window.orderBy outside session.bounded_window:\n"
        + "\n".join(offenders)
    )
