"""Repeated-span (C4-style boilerplate) removal: hand-checkable semantics.

The registry oracle rows pin cross-engine equality on the fixture corpus;
these tests pin the rule itself on inputs small enough to verify by hand:
keeper survival, non-keeper coverage, overlap unions, short-doc and
clean-corpus no-ops, and repartition determinism.
"""

from __future__ import annotations

from bigdata_hwk_spark.operators.dedup import repeated_span_removal


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _run(spark, rows):
    out = repeated_span_removal(_docs(spark, rows)).collect()
    return {r.doc_id: (r.clean_text, r.n_words, r.n_dropped) for r in out}


def test_keeper_survives_nonkeeper_dropped(spark):
    got = _run(
        spark,
        [
            (0, "a b c d x"),   # "a b c d" at (0,0) — the keeper
            (1, "z a b c d"),   # "a b c d" at (1,1) — dropped
            (2, "q r"),         # shorter than the span width: untouched
        ],
    )
    assert got[0] == ("a b c d x", 5, 0)
    assert got[1] == ("z", 5, 4)
    assert got[2] == ("q r", 2, 0)


def test_overlapping_occurrences_union_their_coverage(spark):
    # doc 3 contains the hot span twice (positions 0 and 4); both are
    # non-keepers (the keeper is doc 0's occurrence), so their coverage
    # [0,3] ∪ [4,7] erases the whole doc.
    got = _run(
        spark,
        [
            (0, "a b c d x"),
            (3, "a b c d a b c d"),
        ],
    )
    assert got[0] == ("a b c d x", 5, 0)
    assert got[3] == ("", 8, 8)


def test_clean_corpus_is_untouched(spark):
    rows = [(0, "p q r s t"), (1, "u v w x y z")]
    got = _run(spark, rows)
    for doc_id, text in rows:
        n = len(text.split(" "))
        assert got[doc_id] == (text, n, 0)


def test_repartition_invariant(spark):
    rows = [
        (0, "a b c d x"),
        (1, "z a b c d"),
        (3, "a b c d a b c d"),
    ]
    base = _run(spark, rows)
    df = _docs(spark, rows).repartition(7)
    out = repeated_span_removal(df).collect()
    assert {r.doc_id: (r.clean_text, r.n_words, r.n_dropped) for r in out} == base
