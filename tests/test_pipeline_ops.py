"""Training-pipeline additions: cluster collapse (connected components),
deterministic splits, TF-IDF, partitioned parquet sink."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from bigdata_hwk_spark.functions import text as TX
from bigdata_hwk_spark.operators import dedup as D
from bigdata_hwk_spark.operators import splits as SP
from bigdata_hwk_spark.sinks import write_partitioned
from bigdata_hwk_spark.sources.tables import fan_out, load_table

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


def _docs(spark, sf):
    return fan_out(load_table(spark, sf, "documents"))


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # normalize: every node -> min of its component
    return {x: find(x) for x in parent}


def test_connected_components_vs_union_find(spark):
    """The DISTRIBUTED large-star/small-star path (forced via
    driver_max_edges=0) must equal a driver union-find on a random graph
    with chains, a star, and noise edges."""
    rng = random.Random(7)
    pairs = set()
    # chain 0-1-2-...-9 (diameter 9 exercises multiple rounds)
    pairs.update((i, i + 1) for i in range(9))
    # star around 100
    pairs.update((100, 100 + i) for i in range(1, 6))
    # random noise edges in [200, 260)
    while len(pairs) < 40:
        a, b = rng.randrange(200, 260), rng.randrange(200, 260)
        if a != b:
            pairs.add((min(a, b), max(a, b)))
    pdf = spark.createDataFrame(
        [(a, b) for a, b in sorted(pairs)], "doc_a long, doc_b long"
    )
    got = {
        r.node: r.cluster_id
        for r in D.connected_components(pdf, driver_max_edges=0).collect()
    }
    want = _union_find(sorted(pairs))
    assert got == want
    # and the gated driver path gives the identical answer
    got_driver = {
        r.node: r.cluster_id for r in D.connected_components(pdf).collect()
    }
    assert got_driver == want


def test_dedup_clusters_invariants(spark):
    """Cluster collapse on the real corpus: every LSH pair co-clustered,
    exactly one canonical per cluster (the min id), sizes consistent."""
    docs = _docs(spark, SF_CORRECT)
    rows = D.dedup_clusters(docs).collect()
    cluster_of = {r.doc_id: r.cluster_id for r in rows}
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    for cid, members in by_cluster.items():
        assert cid == min(m.doc_id for m in members)
        assert sum(m.is_canonical for m in members) == 1
        assert all(m.cluster_size == len(members) for m in members)
    for p in D.minhash_lsh_pairs(docs).collect():
        assert cluster_of[p.doc_a] == cluster_of[p.doc_b]


def test_leakage_safe_split_never_straddles_pairs(spark):
    docs = _docs(spark, SF_CORRECT)
    split_of = {
        r.doc_id: r.split for r in SP.leakage_safe_split(docs).collect()
    }
    assert len(split_of) == docs.count()  # every doc assigned
    pairs = D.minhash_lsh_pairs(docs).collect()
    assert pairs  # fixture has near-dups; vacuous otherwise
    for p in pairs:
        assert split_of[p.doc_a] == split_of[p.doc_b]


def test_hash_split_deterministic_proportions(spark):
    docs = _docs(spark, SF_CORRECT)
    a = {r.doc_id: r.split for r in SP.hash_split(docs).collect()}
    b = {r.doc_id: r.split for r in SP.hash_split(docs).collect()}
    assert a == b  # pure projection, no RNG
    n = len(a)
    train = sum(1 for s in a.values() if s == "train")
    test = sum(1 for s in a.values() if s == "test")
    assert 0.7 * n <= train <= 0.9 * n
    assert 0.03 * n <= test <= 0.18 * n


def test_tfidf_top_terms_ranking(spark):
    """rk is dense 1..k per doc; ordering follows (tf desc, df asc, term)."""
    out = TX.tfidf_top_terms(_docs(spark, SF_SMOKE), k=5).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert by_doc
    for doc, rows in by_doc.items():
        rows.sort(key=lambda r: r.rk)
        assert [r.rk for r in rows] == list(range(1, len(rows) + 1))
        keys = [(-r.tf, r.df, r.term) for r in rows]
        assert keys == sorted(keys)
        assert all(r.tfidf >= 0 for r in rows)


def test_write_bucketed_join_is_shuffle_free(spark):
    """Two tables bucketed on the same key and count must join with NO
    Exchange in the plan (each task zips bucket i with bucket i) — the
    co-located fact/fact join layout a 100 TB deployment persists its hot
    join keys in. Also checks the join result against the plain join."""
    from bigdata_hwk_spark.sinks import joins_are_colocated, write_bucketed

    docs = _docs(spark, SF_CORRECT).select("doc_id", "lang", "source")
    tok = _docs(spark, SF_CORRECT).select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    try:
        write_bucketed(docs, "t_docs_bkt", ["doc_id"], 8, sort_cols=["doc_id"])
        write_bucketed(tok, "t_tok_bkt", ["doc_id"], 8, sort_cols=["doc_id"])
        assert joins_are_colocated(spark, "t_docs_bkt", "t_tok_bkt", ["doc_id"])
        got = {
            (r.doc_id, r.lang, r.n_tokens)
            for r in spark.table("t_docs_bkt")
            .join(spark.table("t_tok_bkt"), "doc_id")
            .collect()
        }
        want = {
            (r.doc_id, r.lang, r.n_tokens) for r in docs.join(tok, "doc_id").collect()
        }
        assert got == want and got
        # sanity: the UNbucketed join of the same data does shuffle under
        # the same no-broadcast conditions the co-location probe uses
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            plan = (
                docs.join(tok, "doc_id")
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        assert "Exchange hashpartitioning" in plan
    finally:
        spark.sql("DROP TABLE IF EXISTS t_docs_bkt")
        spark.sql("DROP TABLE IF EXISTS t_tok_bkt")


def test_dynamic_partition_pruning_through_partitioned_sink(spark, tmp_path):
    """Joining the hive-partitioned layout against a filtered dimension on
    the partition column must insert a dynamicpruningexpression into the
    fact scan's PartitionFilters — at 100 TB this is the lever that turns
    a full-fact-scan join into a read of only the partitions the filtered
    dim actually references. Pins that the sink's layout composes with
    Spark's DPP, not just static pruning."""
    from bigdata_hwk_spark.sinks import write_partitioned
    from bigdata_hwk_spark.sources.tables import load_table

    ev = load_table(spark, SF_CORRECT, "events")
    path = str(tmp_path / "ev_part")
    write_partitioned(ev, path, ["event_type"])
    fact = spark.read.parquet(path)
    dim = spark.createDataFrame(
        [("click", 1), ("view", 0), ("purchase", 0), ("error", 0), ("signup", 0)],
        "event_type string, flag int",
    ).filter("flag = 1")
    joined = fact.join(dim, "event_type")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruningexpression" in plan.lower()
    # and the pruned join computes the right thing
    assert joined.count() == ev.filter("event_type = 'click'").count()


def test_write_partitioned_layout_and_pruning(spark, tmp_path):
    """Hive layout on disk, lossless round-trip, and partition pruning
    visible in the read plan."""
    import os

    docs = _docs(spark, SF_SMOKE).select("doc_id", "lang", "text")
    path = str(tmp_path / "docs_by_lang")
    write_partitioned(docs, path, ["lang"], sort_cols=["doc_id"])
    subdirs = {d for d in os.listdir(path) if d.startswith("lang=")}
    langs = {r.lang for r in docs.select("lang").distinct().collect()}
    assert subdirs == {f"lang={lg}" for lg in langs}
    back = spark.read.parquet(path)
    assert back.count() == docs.count()
    one_lang = sorted(langs)[0]
    plan = (
        back.filter(F.col("lang") == one_lang)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan and "lang" in plan.split("PartitionFilters")[1][:200]


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_fan_out_estimator_uses_public_file_api(spark):
    """fan_out's scan-width probe must not convert the plan to an RDD
    (round-7 VERDICT item 6): the estimate comes from inputFiles() +
    Spark's split math. Pin its behavior on the three input shapes."""
    from bigdata_hwk_spark.sources.tables import (
        _estimated_scan_partitions,
        fan_out,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    est = _estimated_scan_partitions(docs)
    assert est is not None and est >= 1
    target = spark.sparkContext.defaultParallelism
    if est < target:  # fixture scans are narrow → fan-out fires
        assert "Repartition" in fan_out(docs)._jdf.queryExecution().analyzed().toString()
    # a projection over the scan still resolves its files
    assert _estimated_scan_partitions(docs.select("doc_id")) == est
    # in-memory frames (no files) are a deliberate no-op
    mem = spark.createDataFrame([(1,)], "a long")
    assert _estimated_scan_partitions(mem) is None
    assert fan_out(mem) is mem


def test_hash_split_is_shuffle_free(spark):
    """The salted-hash split is a pure per-row projection: its physical
    plan must contain NO Exchange — the property that makes it free at
    100 TB (no data movement, no RNG state, appends stay consistent)."""
    # raw table, not _docs: fan_out deliberately repartitions narrow
    # fixture scans (an Exchange of its own) — the claim under test is
    # about the split operator
    plan = _plan(SP.hash_split(load_table(spark, SF_SMOKE, "documents")))
    assert "Exchange" not in plan, plan


def test_tfidf_and_lsh_plans_avoid_nested_loops(spark):
    """Candidate joins must stay equi-joins: a nested-loop/cartesian in
    any of these pipelines means the theta->equi rewrite regressed."""
    docs = _docs(spark, SF_SMOKE)
    for df in (
        TX.tfidf_top_terms(docs),
        D.minhash_lsh_pairs(docs),
        D.ngram_jaccard_pairs(docs),
    ):
        plan = _plan(df)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


def test_connected_components_long_chain_logarithmic_rounds(spark):
    """Adversarial chain (diameter ≫ max_iter): the large-star/small-star
    alternation must converge in O(log n) rounds — max_iter=25 on an
    800-node path would be impossible for diameter-bound label
    propagation. Ids are permuted so the minimum sits at a random chain
    position, not an endpoint."""
    rng = random.Random(3)
    perm = list(range(800))
    rng.shuffle(perm)
    pairs = [
        (min(perm[i], perm[i + 1]), max(perm[i], perm[i + 1]))
        for i in range(799)
    ]
    pdf = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    got = {
        r.node: r.cluster_id
        for r in D.connected_components(
            pdf, driver_max_edges=0, max_iter=25
        ).collect()
    }
    assert got == {n: 0 for n in range(800)}


def test_star_round_constant_shuffle_count(spark):
    """One large-star + small-star round compiles to a CONSTANT number of
    exchanges — the property that makes total shuffle volume
    O(E · log n), independent of graph diameter."""
    from pyspark.sql import functions as F

    e = spark.createDataFrame(
        [(3, 1), (5, 2), (9, 4)], "u long, v long"
    )
    plan = D._star_round(e)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 12, plan


def test_embedding_dedup_clusters_synthetic(spark):
    """Embedding near-dup collapse on a constructed corpus: two tight
    cosine clusters plus orthogonal singletons. Singletons must not
    appear; each cluster collapses to its min vec_id."""
    from bigdata_hwk_spark.operators import similarity as SIM

    def unit(i, eps=0.0):
        v = [0.0] * 8
        v[i] = 1.0
        v[(i + 1) % 8] = eps
        return v

    rows = [
        # cluster A: three tiny perturbations of e0
        (0, unit(0)), (1, unit(0, 0.01)), (2, unit(0, 0.02)),
        # cluster B: two perturbations of e3
        (10, unit(3)), (11, unit(3, 0.01)),
        # singletons: orthogonal axes
        (20, unit(5)), (21, unit(6)),
    ]
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id bigint, embedding array<float>",
    )
    got = {r.vec_id: r for r in SIM.embedding_dedup_clusters(emb, tau=0.9).collect()}
    assert set(got) == {0, 1, 2, 10, 11}
    assert {got[i].cluster_id for i in (0, 1, 2)} == {0}
    assert {got[i].cluster_id for i in (10, 11)} == {10}
    assert got[0].is_canonical and got[10].is_canonical
    assert not any(got[i].is_canonical for i in (1, 2, 11))
    assert all(got[i].cluster_size == 3 for i in (0, 1, 2))
    assert all(got[i].cluster_size == 2 for i in (10, 11))


def test_repetition_stats_known_values(spark):
    """Hand-computed Gopher repetition metrics on a constructed doc."""
    docs = spark.createDataFrame(
        [
            # tokens: a a a b  -> top token 3/4; bigrams: "a a" x2, "a b"
            # -> top 2/3; trigrams: "a a a", "a a b" all unique -> dup 0
            (1, "a a a b"),
            # one token: bigram/trigram fracs must be 0, top token 1.0
            (2, "solo"),
            # a b a b a b: top token 3/6; bigrams "a b" x3 "b a" x2 -> 3/5;
            # trigrams: "a b a" x2, "b a b" x2 -> all 4 duplicated -> 1.0
            (3, "a b a b a b"),
        ],
        "doc_id bigint, text string",
    )
    got = {r.doc_id: r for r in TX.repetition_stats(docs).collect()}
    assert got[1].n_tokens == 4
    assert got[1].top_token_frac == 0.75
    assert got[1].top_bigram_frac == round(2 / 3, 6)
    assert got[1].dup_trigram_frac == 0.0
    assert got[2].n_tokens == 1
    assert (got[2].top_token_frac, got[2].top_bigram_frac,
            got[2].dup_trigram_frac) == (1.0, 0.0, 0.0)
    assert got[3].top_token_frac == 0.5
    assert got[3].top_bigram_frac == 0.6
    assert got[3].dup_trigram_frac == 1.0


def test_stratified_sample_invariants(spark):
    docs = _docs(spark, SF_CORRECT)
    group_sizes = {r.lang: r.n for r in
                   docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    rows = SP.stratified_sample(docs, n_per_group=20).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, size in group_sizes.items():
        assert len(by_lang.get(lang, [])) == min(20, size)
        rks = sorted(r.rk for r in by_lang[lang])
        assert rks == list(range(1, len(rks) + 1))
    # pure projection of a salted hash: two runs pick identical docs
    again = {(r.lang, r.doc_id) for r in
             SP.stratified_sample(docs, n_per_group=20).collect()}
    assert {(r.lang, r.doc_id) for r in rows} == again


def test_stratified_sample_two_phase_topn(spark):
    """The physical plan must run the partial (stratum, salt) top-n before
    the per-stratum rank — no single-task sort of a hot stratum — and the
    two-phase result must be identical (ranks included) to the
    single-phase form, here modeled by n_salts=1."""
    docs = _docs(spark, SF_CORRECT)
    df = SP.stratified_sample(docs, n_per_group=20)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan  # phase-1 partial rank is in the plan
    assert plan.count("Window") >= 2
    single = {(r.lang, r.doc_id, r.rk) for r in
              SP.stratified_sample(docs, n_per_group=20, n_salts=1).collect()}
    assert {(r.lang, r.doc_id, r.rk) for r in df.collect()} == single


def test_training_shard_manifest_packing_invariants(spark):
    docs = _docs(spark, SF_CORRECT)
    budget = 2500
    rows = SP.training_shard_manifest(docs, token_budget=budget).collect()
    n_docs_total = docs.count()
    tok_total = docs.select(
        F.sum(F.size(F.split("text", " ")))
    ).first()[0]
    max_doc = docs.select(
        F.max(F.size(F.split("text", " ")))
    ).first()[0]
    assert sum(r.n_docs for r in rows) == n_docs_total
    assert sum(r.sum_tokens for r in rows) == tok_total
    sids = sorted(r.shard_id for r in rows)
    assert sids == list(range(len(rows)))  # contiguous, 0-based
    by_id = {r.shard_id: r for r in rows}
    for sid in sids[:-1]:
        # a full shard holds at least budget - (max_doc - 1) tokens (its
        # last doc starts before the boundary) and at most
        # budget + (max_doc - 1) (it may overhang)
        assert budget - max_doc < by_id[sid].sum_tokens < budget + max_doc
    # deterministic: same manifest on a re-run
    again = sorted(
        (r.shard_id, r.n_docs, r.sum_tokens)
        for r in SP.training_shard_manifest(docs, token_budget=budget).collect()
    )
    assert again == sorted((r.shard_id, r.n_docs, r.sum_tokens) for r in rows)


def test_curation_funnel_consistent_with_components(spark):
    """Funnel totals must equal the corpus; the kept predicate must agree
    with applying the thresholds to the component per-doc tables."""
    docs = _docs(spark, SF_CORRECT)
    rows = TX.curation_funnel(docs).collect()
    assert sum(r.n_docs for r in rows) == docs.count()
    assert {r.kept for r in rows} == {True, False}  # non-trivial split
    q = {r.doc_id: r.quality_score for r in TX.quality_scores(docs).collect()}
    rep = {r.doc_id: r for r in TX.repetition_stats(docs).collect()}
    want_kept = sum(
        1
        for d in q
        if q[d] >= TX.CURATION_MIN_QUALITY
        and rep[d].top_token_frac <= TX.CURATION_MAX_TOP_TOKEN
        and rep[d].dup_trigram_frac <= TX.CURATION_MAX_DUP_TRIGRAM
        and rep[d].n_tokens >= TX.CURATION_MIN_TOKENS
    )
    assert sum(r.n_docs for r in rows if r.kept) == want_kept


def test_pii_scrub_known_values(spark):
    docs = spark.createDataFrame(
        [
            (1, "write to bob.smith+x@mail.example.org today"),
            (2, "docs at https://ex.com/a?b=1 and http://y.io/z"),
            (3, "call +1-555-0100200 or +49-30-1234567 now"),
            # an email-shaped string inside a URL must scrub as URL only
            (4, "https://ex.com/u@example.com rest"),
            (5, "no pii here"),
        ],
        "doc_id bigint, text string",
    )
    got = {r.doc_id: r for r in TX.pii_scrub(docs).collect()}
    assert (got[1].n_emails, got[1].n_urls, got[1].n_phones) == (1, 0, 0)
    assert (got[2].n_emails, got[2].n_urls, got[2].n_phones) == (0, 2, 0)
    assert (got[3].n_emails, got[3].n_urls, got[3].n_phones) == (0, 0, 2)
    assert (got[4].n_emails, got[4].n_urls) == (0, 1)
    assert (got[5].n_emails, got[5].n_urls, got[5].n_phones) == (0, 0, 0)
    # nothing PII-shaped survives a scrub
    import hashlib

    assert got[5].clean_hash == hashlib.md5(b"no pii here").hexdigest()


def test_incremental_lsh_matches_full_pipeline_cross_pairs(spark):
    """Bipartite ingest dedup must equal the full-union LSH pair set
    restricted to pairs crossing the incoming/corpus boundary."""
    docs = _docs(spark, SF_CORRECT)
    incoming = docs.filter("doc_id % 5 = 0")
    corpus = docs.filter("doc_id % 5 != 0")
    got = {
        (r.new_doc, r.corpus_doc, r.jaccard)
        for r in D.incremental_lsh_pairs(incoming, corpus).collect()
    }
    full = D.minhash_lsh_pairs(docs).collect()
    want = {
        (p.doc_a, p.doc_b, p.jaccard) if p.doc_a % 5 == 0
        else (p.doc_b, p.doc_a, p.jaccard)
        for p in full
        if (p.doc_a % 5 == 0) != (p.doc_b % 5 == 0)
    }
    assert got == want
    assert all(n % 5 == 0 and c % 5 != 0 for n, c, _ in got)


def test_shard_manifest_plan_has_no_single_partition_stage(spark):
    """The prefix-sum must never degrade to a single-task global window
    (the scale-killer the distributed scan exists to avoid)."""
    docs = _docs(spark, SF_CORRECT)
    plan = (
        SP.training_shard_manifest(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" not in plan
    assert "windowspecdefinition(__b" in plan  # cumsum is per-bucket


def test_shard_manifest_stable_after_gc(spark):
    """Re-execution stability: a derived plan evaluated after the original
    result is dropped and GC has run must reproduce the same manifest.
    (The old persist+weakref scheme could re-sample range-partitioner
    bounds on re-execution while the collected offsets described the old
    layout — silently wrong shard_ids.)"""
    import gc

    docs = _docs(spark, SF_CORRECT)
    manifest = SP.training_shard_manifest(docs)
    baseline = {(r.shard_id, r.n_docs, r.sum_tokens) for r in manifest.collect()}
    derived = manifest.filter("n_docs > 0")  # unevaluated derived plan
    del manifest
    gc.collect()
    again = {(r.shard_id, r.n_docs, r.sum_tokens) for r in derived.collect()}
    assert again == baseline


def test_contamination_check_known_values(spark):
    """A corpus doc quoting an eval doc's 8-gram verbatim is flagged with
    the right overlap counts; clean docs are absent."""
    eight = "alpha beta gamma delta epsilon zeta eta theta"
    evals = spark.createDataFrame(
        [(100, f"{eight} iota kappa"), (101, "totally different benchmark words here ok fine yes")],
        "doc_id bigint, text string",
    )
    corpus = spark.createDataFrame(
        [
            # quotes the full 8-gram once (plus one shifted 8-gram from
            # the 9-word overlap region: 'beta..iota')
            (1, f"intro words {eight} iota outro"),
            (2, "clean document with no overlap at all whatsoever truly"),
        ],
        "doc_id bigint, text string",
    )
    got = {r.doc_id: r for r in D.contamination_check(corpus, evals).collect()}
    assert set(got) == {1}
    assert got[1].n_overlap_shingles == 2
    assert got[1].n_eval_docs_hit == 1


def test_cms_never_underestimates_and_bounds(spark):
    """Count-min guarantees: est ≥ true always; overestimate within the
    εN bound on the (deterministic) fixture; sketches merge additively."""
    import math

    from bigdata_hwk_spark.operators import sketches as SK
    from bigdata_hwk_spark.sources.tables import load_table

    items = load_table(spark, SF_CORRECT, "events").select(
        F.col("user_id").alias("item")
    )
    n = items.count()
    rows = SK.cms_estimates(items, items.filter("item % 9 = 0")).collect()
    assert rows
    eps_n = math.e / SK.CMS_W * n
    for r in rows:
        assert r.est_cnt >= r.true_cnt
        assert r.est_cnt - r.true_cnt <= eps_n
    # mergeability: sketch(A ∪ B) == cell-wise sum of the two sketches
    a = items.filter("item % 2 = 0")
    b = items.filter("item % 2 != 0")
    merged = {
        (r.r, r.b): r.cnt
        for r in SK.cms_sketch(a)
        .unionByName(SK.cms_sketch(b))
        .groupBy("r", "b")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()
    }
    whole = {(r.r, r.b): r.cnt for r in SK.cms_sketch(items).collect()}
    assert merged == whole


def test_duplication_profile_known_values(spark):
    """Docs sharing a 3-gram verbatim get it flagged; unique docs score 0."""
    shared = "alpha beta gamma"
    docs = spark.createDataFrame(
        [
            (1, f"{shared} one two three"),       # 6 words -> 4 shingles
            (2, f"intro {shared} outro"),         # 5 words -> 3 shingles
            (3, "totally unique words here only"),  # 5 words -> 3 shingles
            (4, "xy zz"),                          # too short: drops out
        ],
        "doc_id bigint, text string",
    )
    got = {r.doc_id: r for r in D.duplication_profile(docs).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1].n_shingles == 4 and got[1].n_dup_shingles == 1
    assert got[2].n_shingles == 3 and got[2].n_dup_shingles == 1
    assert got[3].n_shingles == 3 and got[3].n_dup_shingles == 0
    assert got[3].dup_fraction == 0.0
    assert got[1].dup_fraction == 0.25


def test_duplication_profile_counts_docs_not_occurrences(spark):
    """A shingle repeated WITHIN one doc is not a duplicate (distinct
    per-doc shingling): only cross-document sharing flags it."""
    docs = spark.createDataFrame(
        [(1, "a b c x a b c"), (2, "unrelated words entirely different here")],
        "doc_id bigint, text string",
    )
    got = {r.doc_id: r for r in D.duplication_profile(docs).collect()}
    assert got[1].n_dup_shingles == 0


def test_source_mix_weights_properties(spark):
    """Weights are a distribution, temperature-flattened toward uniform:
    every source's weight share sits between its token share and 1/N."""
    docs = _docs(spark, SF_CORRECT)
    rows = SP.source_mix_weights(docs).collect()
    n = len(rows)
    assert abs(sum(r.mix_weight for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.p_tokens for r in rows) - 1.0) < 1e-4
    for r in rows:
        lo, hi = sorted((r.p_tokens, 1.0 / n))
        assert lo - 1e-6 <= r.mix_weight <= hi + 1e-6
    # deterministic across evaluations (no RNG, no layout dependence)
    again = SP.source_mix_weights(docs).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_compaction_is_partition_selective(spark, tmp_path):
    """compact_partitioned must (1) shrink fragmented partitions to their
    target file count, (2) preserve content exactly, and (3) leave
    already-healthy partitions' files untouched on disk."""
    import glob
    import os

    from bigdata_hwk_spark.sinks.parquet import compaction_plan, compact_partitioned

    d = str(tmp_path / "ds")
    docs = spark.range(900).select(
        F.col("id").alias("doc_id"),
        F.element_at(
            F.array(F.lit("en"), F.lit("de"), F.lit("fr")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("lang"),
        F.md5(F.col("id").cast("string")).alias("text"),
    )
    # healthy partition first: lang=en written compact (1 file)
    docs.filter("lang = 'en'").coalesce(1).write.partitionBy("lang").parquet(d)
    # fragmented partitions: lang=de,fr appended as 10 files each
    docs.filter("lang != 'en'").repartition(10).write.mode("append").partitionBy(
        "lang"
    ).parquet(d)

    healthy_before = sorted(glob.glob(f"{d}/lang=en/*.parquet"))
    mtimes_before = [os.path.getmtime(p) for p in healthy_before]
    before = sorted(
        (r.doc_id, r.lang, r.text) for r in spark.read.parquet(d).collect()
    )

    plan = {
        r.lang: (r.n_files, r.target_files, r.needs_compaction)
        for r in compaction_plan(spark, d, ["lang"], 1000).collect()
    }
    assert plan["en"] == (1, 1, False)
    assert plan["de"][0] == 10 and plan["de"][2]
    assert plan["fr"][0] == 10 and plan["fr"][2]

    assert compact_partitioned(spark, d, ["lang"], 1000) == 2

    # fragmented partitions now at their target; healthy files untouched
    assert len(glob.glob(f"{d}/lang=de/*.parquet")) == 1
    assert len(glob.glob(f"{d}/lang=fr/*.parquet")) == 1
    assert sorted(glob.glob(f"{d}/lang=en/*.parquet")) == healthy_before
    assert [os.path.getmtime(p) for p in healthy_before] == mtimes_before

    after = sorted(
        (r.doc_id, r.lang, r.text) for r in spark.read.parquet(d).collect()
    )
    assert after == before

    # the swap staging directory must not survive a successful run
    assert not os.path.exists(f"{d}__compact_tmp")

    # idempotent: a second pass finds nothing to do
    assert compact_partitioned(spark, d, ["lang"], 1000) == 0


def test_zorder_layout_prunes_both_dimensions(spark, tmp_path):
    """Z-order clustering must (1) preserve content exactly, and (2)
    concentrate BOTH dimensions' range predicates into a small file
    subset — where a single-column sort layout prunes only its own
    column and leaves the other's predicate touching every file. Files
    'touched' = files contributing matching rows (input_file_name), the
    clustering property parquet row-group stats then exploit."""
    from bigdata_hwk_spark.sinks.parquet import write_zordered

    n, n_files = 64_000, 16
    df = spark.range(n).select(
        F.col("id"),
        (F.col("id") % 253).cast("double").alias("x"),
        ((F.col("id") * 2654435761) % 251).cast("double").alias("y"),
    )
    zdir = str(tmp_path / "zord")
    ldir = str(tmp_path / "linear")
    write_zordered(df, zdir, "x", "y", n_files=n_files)
    (
        df.repartitionByRange(n_files, "x")
        .sortWithinPartitions("x")
        .write.parquet(ldir)
    )

    zread, lread = spark.read.parquet(zdir), spark.read.parquet(ldir)
    assert sorted(r.id for r in zread.collect()) == list(range(n))

    def files_touched(read_df, pred):
        return (
            read_df.filter(pred)
            .select(F.input_file_name().alias("f"))
            .distinct()
            .count()
        )

    total_z = zread.select(F.input_file_name()).distinct().count()
    assert total_z == n_files
    # a ~1/8 range on EITHER dimension touches a strict subset of z files
    zx = files_touched(zread, "x < 32")
    zy = files_touched(zread, "y < 32")
    assert zx <= total_z // 2, zx
    assert zy <= total_z // 2, zy
    # the single-column layout prunes x but y touches every file
    lx = files_touched(lread, "x < 32")
    ly = files_touched(lread, "y < 32")
    assert lx <= total_z // 4
    assert ly == n_files
    # and the z layout beats the linear layout on the unsorted dimension
    assert zy < ly


def test_zorder_degenerate_ranges(spark, tmp_path):
    """Constant columns (zero range) must not divide by zero or lose rows;
    the key collapses and the write still round-trips exactly."""
    from bigdata_hwk_spark.sinks.parquet import write_zordered

    df = spark.range(1000).select(
        "id", F.lit(5.0).alias("x"), (F.col("id") % 7).cast("double").alias("y")
    )
    d = str(tmp_path / "zdeg")
    write_zordered(df, d, "x", "y", n_files=4)
    assert sorted(r.id for r in spark.read.parquet(d).collect()) == list(range(1000))


# ---------------------------------------------------------------------------
# A-ES weighted sample
# ---------------------------------------------------------------------------

def _aes_mirror(ids_weights, k, salt):
    """Pure-Python mirror of the A-ES priority draw (same md5 domain)."""
    import hashlib
    import math

    scored = []
    for doc_id, w in ids_weights:
        h = int(
            hashlib.md5(f"{salt}:{doc_id}".encode()).hexdigest()[:15], 16
        )
        u = (h + 1) / float(1 << 60)
        scored.append((math.log(u) / w, -doc_id, doc_id))
    scored.sort(reverse=True)
    return {doc_id for _, _, doc_id in scored[:k]}


def test_weighted_sample_inclusion_tracks_weight():
    """Statistical property of the MATH (python mirror over many salt
    versions — the Spark plan itself is pinned by the DuckDB oracle):
    a doc with 10× the weight must be included substantially more often
    than a unit-weight doc, and inclusion frequency must be monotone in
    weight on average."""
    pop = [(i, 1) for i in range(200)] + [(1000 + i, 10) for i in range(200)]
    heavy_hits = light_hits = 0
    trials = 150
    for t in range(trials):
        got = _aes_mirror(pop, k=40, salt=f"wsample-trial{t}")
        heavy_hits += sum(1 for d in got if d >= 1000)
        light_hits += sum(1 for d in got if d < 1000)
    # heavy docs are 10x-weighted and half the population: they must take
    # the overwhelming share of a 10%-of-population sample
    assert heavy_hits > 4 * light_hits, (heavy_hits, light_hits)


def test_weighted_sample_k_covers_all(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    n = docs.count()
    out = SP.weighted_doc_sample(docs, k=n + 50)
    assert out.count() == n


def test_weighted_sample_deterministic_and_sized(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    a = sorted(r.doc_id for r in SP.weighted_doc_sample(docs).collect())
    b = sorted(
        r.doc_id
        for r in SP.weighted_doc_sample(docs.repartition(7)).collect()
    )
    assert a == b
    assert len(a) == SP.WSAMPLE_K


def test_weighted_sample_plan_is_take_ordered(spark):
    """The selection must plan TakeOrderedAndProject (per-partition
    top-k + driver merge), never a global Sort of the corpus."""
    docs = load_table(spark, SF_SMOKE, "documents")
    plan = (
        SP.weighted_doc_sample(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
