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


def test_bigram_surprise_hand_case(spark):
    """Exact hand computation. Corpus 'a b a b' + 'a b c' has bigram
    counts (a,b)=3, (b,a)=1, (b,c)=1 and prefix-position counts a=3,
    b=2, so the per-pair surprises are 0, ln 2, 0, 0, ln 2 — doc 0
    averages ln(2)/3, doc 1 averages ln(2)/2. A single-token doc has no
    bigrams and drops from the output."""
    from bigdata_hwk_spark.functions.text import bigram_surprise_scores

    docs = spark.createDataFrame(
        [(0, "a b a b"), (1, "a b c"), (2, "x")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_bigrams, r.avg_neg_logprob)
        for r in bigram_surprise_scores(docs).collect()
    }
    ln = math.log
    assert set(got) == {0, 1}
    assert got[0] == (3, round(ln(2) / 3, 6))
    assert got[1] == (2, round(ln(2) / 2, 6))


def test_bigram_surprise_flags_word_salad(spark):
    """The signal bigram surprise adds over unigram: shuffling a doc's
    tokens leaves its unigram score UNCHANGED (same token multiset) but
    raises its bigram score when the shuffled transitions are
    corpus-novel. Background docs pin the common transitions."""
    from bigdata_hwk_spark.functions.text import (
        bigram_surprise_scores,
        unigram_surprise_scores,
    )

    rows = [(i, "the quick fox runs") for i in range(10)]
    rows.append((100, "quick the runs fox"))  # same tokens, salad order
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    uni = {
        r.doc_id: r.avg_neg_logprob
        for r in unigram_surprise_scores(docs).collect()
    }
    big = {
        r.doc_id: r.avg_neg_logprob
        for r in bigram_surprise_scores(docs).collect()
    }
    assert uni[100] == uni[0]  # unigram model can't see the shuffle
    assert big[100] > big[0]  # bigram model flags it


def test_bigram_surprise_fixture_shape(spark):
    from bigdata_hwk_spark.functions.text import bigram_surprise_scores
    from bigdata_hwk_spark.functions.text import token_stats

    docs = load_table(spark, SF_CORRECT, "documents")
    rows = bigram_surprise_scores(docs).collect()
    ts = {r.doc_id: r.n_tokens for r in token_stats(docs).collect()}
    # every multi-token doc present, with exactly n_tokens-1 bigrams
    assert len(rows) == sum(1 for n in ts.values() if n >= 2)
    assert all(r.n_bigrams == ts[r.doc_id] - 1 for r in rows)
    assert all(r.avg_neg_logprob >= 0 for r in rows)


def test_dsir_hand_case(spark):
    """Exact mirror computation (same md5 bucketing in Python), and the
    sign structure: the target-language doc's features all appear in
    the target distribution, the other doc's novel feature does not, so
    the target doc scores strictly higher."""
    import hashlib

    from bigdata_hwk_spark.functions.text import (
        DSIR_BUCKETS,
        dsir_importance_weights,
    )

    docs = spark.createDataFrame(
        [(0, "a b", "en"), (1, "a c", "fr")],
        "doc_id long, text string, lang string",
    )

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % DSIR_BUCKETS

    feats = {
        0: ["a", "b", "a b"],
        1: ["a", "c", "a c"],
    }
    raw, tgt = {}, {}
    for d, fs in feats.items():
        for g in fs:
            b = bucket(g)
            raw[b] = raw.get(b, 0) + 1
            if d == 0:
                tgt[b] = tgt.get(b, 0) + 1
    nr, nt = sum(raw.values()), sum(tgt.values())
    ln = math.log
    exp = {}
    for d, fs in feats.items():
        s = sum(
            ln(tgt.get(bucket(g), 0) + 1) - ln(raw[bucket(g)] + 1) for g in fs
        ) / len(fs)
        exp[d] = round(s + ln(nr + DSIR_BUCKETS) - ln(nt + DSIR_BUCKETS), 6)
    got = {
        r.doc_id: (r.n_feats, r.dsir_logratio)
        for r in dsir_importance_weights(docs).collect()
    }
    assert got == {0: (3, exp[0]), 1: (3, exp[1])}
    assert got[0][1] > got[1][1]


def test_dsir_fixture_separates_target_language(spark):
    """On the real fixture the en slice IS the target distribution, so
    en documents must average a higher importance score than every
    other language — the domain-matching property DSIR exists for."""
    from bigdata_hwk_spark.functions.text import (
        dsir_importance_weights,
        token_stats,
    )

    docs = load_table(spark, SF_CORRECT, "documents")
    out = dsir_importance_weights(docs)
    joined = out.join(docs.select("doc_id", "lang"), "doc_id")
    means = {
        r.lang: r.m
        for r in joined.groupBy("lang")
        .agg(F.avg("dsir_logratio").alias("m"))
        .collect()
    }
    assert all(means["en"] > v for lang, v in means.items() if lang != "en")
    # feature accounting: unigrams + bigrams = 2n-1 per multi-token doc
    ts = {r.doc_id: r.n_tokens for r in token_stats(docs).collect()}
    rows = out.collect()
    assert len(rows) == len(ts)
    assert all(
        r.n_feats == (2 * ts[r.doc_id] - 1 if ts[r.doc_id] >= 2 else 1)
        for r in rows
    )


def test_dsir_stream_equals_batch_with_frozen_dist(spark, tmp_path):
    """The deployment property: scoring the corpus in 4 micro-batches
    against a FROZEN distribution table produces byte-identical per-doc
    rows to scoring it in one batch — a document's score is a function
    of (its features, the frozen table) alone, never of its chunking."""
    from bigdata_hwk_spark.functions.text import (
        dsir_feature_dist,
        dsir_score_against_dist,
    )
    from bigdata_hwk_spark.streaming.dsir_stream import run_dsir_score_stream
    from bigdata_hwk_spark.streaming.mixture_stream import (
        chunk_documents_into_files,
    )

    docs = load_table(spark, SF_CORRECT, "documents")
    dist = dsir_feature_dist(docs)
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    chunk_documents_into_files(docs, src, n_chunks=4)
    streamed = run_dsir_score_stream(spark, src, dist, sink)
    want = {
        r.doc_id: (r.n_feats, r.dsir_logratio)
        for r in dsir_score_against_dist(docs, dist).collect()
    }
    got = {
        r.doc_id: (r.n_feats, r.dsir_logratio) for r in streamed.collect()
    }
    assert got == want


def test_dsir_frozen_dist_neutral_on_unseen_features(spark):
    """Freeze semantics: a NEW document whose features never occurred in
    the reference window scores exactly the scalar correction (every
    per-occurrence contribution is the ln(1)−ln(1)=0 neutral element) —
    the conservative 'no evidence either way' score."""
    import math

    from bigdata_hwk_spark.functions.text import (
        DSIR_BUCKETS,
        dsir_feature_dist,
        dsir_score_against_dist,
    )

    ref = spark.createDataFrame(
        [(0, "alpha beta", "en"), (1, "alpha gamma", "fr")],
        "doc_id long, text string, lang string",
    )
    dist = dsir_feature_dist(ref)
    new = spark.createDataFrame(
        [(99, "zzznovel wordsalad", "de")], "doc_id long, text string, lang string"
    )
    [row] = dsir_score_against_dist(new, dist).collect()
    nr, nt = 6, 3  # ref corpus: 3 features per doc, doc 0 is the target
    expect = round(
        math.log(nr + DSIR_BUCKETS) - math.log(nt + DSIR_BUCKETS), 6
    )
    assert row.n_feats == 3
    assert row.dsir_logratio == expect


def test_dsir_resample_counts_gate_bounds(spark):
    """The realized resampling drops at most the bottom q of the corpus
    (exact order-statistic contract) and conserves per-language totals;
    the en slice — the target domain itself — survives at a higher rate
    than the corpus average."""
    from bigdata_hwk_spark.functions.text import (
        DSIR_RESAMPLE_Q,
        dsir_resample_counts,
    )

    docs = load_table(spark, SF_CORRECT, "documents")
    rows = dsir_resample_counts(docs).collect()
    n = docs.count()
    by_lang = {r.lang: r for r in rows}
    assert sum(r.n_docs for r in rows) == n
    per_lang_truth = {
        r.lang: r.c
        for r in docs.groupBy("lang").agg(F.count("*").alias("c")).collect()
    }
    assert {k: v.n_docs for k, v in by_lang.items()} == per_lang_truth
    kept = sum(r.n_kept for r in rows)
    assert kept >= n - math.floor(DSIR_RESAMPLE_Q * n)
    en_rate = by_lang["en"].n_kept / by_lang["en"].n_docs
    assert en_rate > kept / n


def test_dedup_quality_keeper_hand_case(spark):
    """Three byte-identical copies with doctored quality signals: the
    keeper must be the highest-quality member, NOT the lowest id (the
    policy difference from dedup_clusters), with doc_id only breaking
    exact score ties."""
    from bigdata_hwk_spark.functions.text import quality_scores
    from bigdata_hwk_spark.operators.dedup import dedup_quality_keeper

    # near-dup cluster: same long text (identical shingles -> Jaccard 1);
    # doc 2's copy carries extra stopwords, raising its quality score
    base = " ".join(f"tok{i}" for i in range(40))
    rich = "the of and is " + " ".join(f"tok{i}" for i in range(40))
    docs = spark.createDataFrame(
        [
            (0, base + " x", "en"),
            (1, base + " x", "en"),
            (2, rich + " x", "en"),
            # far-away singleton: no pairs, must be absent from output
            (9, "zz qq ww", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    q = {r.doc_id: r.quality_score for r in quality_scores(docs).collect()}
    assert q[2] > q[0] == q[1]
    out = dedup_quality_keeper(docs, tau=0.5).collect()
    ids = {r.doc_id for r in out}
    assert 9 not in ids and {0, 1, 2} <= ids
    keepers = {r.doc_id for r in out if r.is_keeper}
    cluster_of = {r.doc_id: r.cluster_id for r in out}
    assert cluster_of[0] == cluster_of[1] == cluster_of[2]
    assert 2 in keepers  # highest quality wins, despite the higher id
    assert keepers.isdisjoint({0, 1})


def test_dedup_quality_keeper_one_keeper_per_cluster(spark):
    from bigdata_hwk_spark.operators.dedup import dedup_quality_keeper

    docs = load_table(spark, SF_CORRECT, "documents")
    out = dedup_quality_keeper(docs).collect()
    per_cluster: dict[int, list] = {}
    for r in out:
        per_cluster.setdefault(r.cluster_id, []).append(r)
    for cid, rows in per_cluster.items():
        assert sum(1 for r in rows if r.is_keeper) == 1
        best = max(rows, key=lambda r: (r.quality_score, -r.doc_id))
        [keeper] = [r for r in rows if r.is_keeper]
        assert keeper.quality_score == best.quality_score
        assert len(rows) == rows[0].cluster_size


def _gopher_docs():
    """One doc per rule: index 0 passes everything; each subsequent doc
    fails exactly one rule (word count, mean word length, symbol ratio,
    bullet lines, ellipsis lines, alpha words, stopwords)."""
    good = "the with " + " ".join(f"word{i:02d}" for i in range(58))
    return [
        (0, good),
        (1, "the with " + " ".join(f"word{i:02d}" for i in range(8))),
        (2, "the with " + " ".join("x" * 12 for _ in range(58))),
        (3, "the with " + " ".join(f"word{i:02d}" for i in range(48))
            + " " + " ".join("#" for _ in range(10))),
        (4, good + "\n- item"),
        (5, good + "\nword word..."),
        (6, "the with " + " ".join(f"word{i:02d}" for i in range(44))
            + " " + " ".join(str(i) for i in range(14))),
        (7, "the " + " ".join(f"word{i:02d}" for i in range(59))),
    ]


def test_gopher_flags_flip_each_rule(spark):
    from bigdata_hwk_spark.functions.text import gopher_quality_flags

    docs = spark.createDataFrame(_gopher_docs(), "doc_id long, text string")
    rows = {r.doc_id: r for r in gopher_quality_flags(docs).collect()}
    fails = {
        1: "flag_word_count",
        2: "flag_mean_word_len",
        3: "flag_symbol_ratio",
        4: "flag_bullet_lines",
        5: "flag_ellipsis_lines",
        6: "flag_alpha_words",
        7: "flag_stopwords",
    }
    flag_cols = list(fails.values())
    assert rows[0].pass_gopher and all(
        getattr(rows[0], c) for c in flag_cols
    )
    for doc_id, failing in fails.items():
        r = rows[doc_id]
        assert not r.pass_gopher
        for c in flag_cols:
            assert getattr(r, c) == (c != failing), (doc_id, c)


def test_gopher_flags_cross_engine_on_discriminating_docs(spark):
    """The fixture can't exercise the symbol/bullet/ellipsis/stopword
    rules (its vocabulary has none of those shapes), so pin the DuckDB
    twin against Spark on the constructed rule-flipping docs too."""
    import duckdb

    from bigdata_hwk_spark.functions.text import (
        GOPHER_QUALITY_FLAGS_SQL,
        gopher_quality_flags,
    )

    data = _gopher_docs()
    docs = spark.createDataFrame(data, "doc_id long, text string")
    got = {
        r.doc_id: tuple(r)[1:]
        for r in gopher_quality_flags(docs).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents(doc_id BIGINT, text VARCHAR)"
    )
    con.executemany("INSERT INTO documents VALUES (?, ?)", data)
    want = {
        r[0]: tuple(r)[1:]
        for r in con.execute(GOPHER_QUALITY_FLAGS_SQL).fetchall()
    }
    assert got == want
