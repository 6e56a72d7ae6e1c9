"""Round-10c operators: trigram stupid-backoff, PSI drift (+ streaming
monitor), grid DBSCAN, BFS hop distances, Misra-Gries (+ streaming
ingest), item-item CF, per-type daily OLS trend, the oracle-checked
release funnel, event debounce, degree assortativity, k-core, Apriori
triples, and greedy coverage selection. The registry oracle sweep
(test_outliers.py / test_extensions.py) proves hash equality vs DuckDB
at the gate SFs; these tests pin operator-level semantics on hand-built
inputs where every branch is computed by hand, plus the
streaming ≡ batch equality pins."""

from __future__ import annotations

import math

from bigdata_hwk_spark.functions import text as TX


def test_trigram_backoff_hand_case(spark):
    # train (doc 0): positions N=6, vocab V={a,b,c,d} (4)
    # trigrams: {a b c, b c a, c a b, a b d}; bigrams: {a b:2, b c, c a, b d}
    # unigrams: a:2 b:2 c:1 d:1
    docs = spark.createDataFrame(
        [(0, "a b c a b d"), (1, "c a b x b d")],
        "doc_id bigint, text string",
    )
    rows = TX.trigram_backoff_scores(docs).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.doc_id == 1
    # test positions: (c,a,b) tri hit; (a,b,x) uni floor (x unseen);
    # (b,x,b) uni floor (b seen: c=2); (x,b,d) bigram backoff ("b d" seen)
    assert r.n_trigrams == 4
    assert r.n_backoff_bi == 1
    assert r.n_backoff_uni == 2
    d = math.log(2) - math.log(5)  # ln(0.4)
    lnp = [
        math.log(1) - math.log(1),                     # c(cab)=1 / c(ca)=1
        2 * d + math.log(0 + 1) - math.log(6 + 4),     # x unseen
        2 * d + math.log(2 + 1) - math.log(6 + 4),     # c(b)=2
        d + math.log(1) - math.log(2),                 # c(bd)=1 / c(b)=2
    ]
    expect = round(-sum(lnp) / 4, 6)
    assert r.avg_neg_logprob == expect


def test_trigram_backoff_short_and_train_docs_drop(spark):
    # docs with <3 tokens produce no trigram positions; train (even ids)
    # never appear in the output
    docs = spark.createDataFrame(
        [(0, "a b c d"), (1, "a b"), (3, "a b c")],
        "doc_id bigint, text string",
    )
    rows = {r.doc_id: r for r in TX.trigram_backoff_scores(docs).collect()}
    assert set(rows) == {3}
    assert rows[3].n_trigrams == 1


def _psi_events(spark):
    from pyspark.sql import functions as F

    # days 0..3 -> mid_day = 1 (ref: days 0-1, cur: days 2-3)
    rows = []
    # type a: ref all bucket 0 (value 1.0), cur all bucket 1 (value 6.0)
    for d in (0, 1):
        rows += [(d * 86400 + 10, "a", 1.0), (d * 86400 + 20, "a", 1.0)]
    for d in (2, 3):
        rows += [(d * 86400 + 10, "a", 6.0), (d * 86400 + 20, "a", 6.0)]
    # type b: identical distribution in both halves -> PSI exactly 0
    for d in (0, 1, 2, 3):
        rows.append((d * 86400 + 30, "b", 1.0))
    df = spark.createDataFrame(rows, "epoch bigint, event_type string, value double")
    return df.select(
        F.col("epoch").cast("timestamp").alias("ts"), "event_type", "value"
    )


def test_value_drift_psi_hand_case(spark):
    import math

    from bigdata_hwk_spark.operators import robust as RB

    got = {r.event_type: r for r in RB.value_drift_psi(_psi_events(spark)).collect()}
    assert set(got) == {"a", "b"}
    a, b = got["a"], got["b"]
    assert (a.n_ref, a.n_cur, a.n_buckets) == (4, 4, 2)
    # cells (cr, cc): bucket0 (4,0), bucket1 (0,4); add-one over b=2:
    # term0 = (5/6 - 1/6)·ln(5/1); term1 = (1/6 - 5/6)·ln(1/5) — equal
    assert a.psi == round(2 * (4 / 6) * math.log(5), 6)
    # identical halves: p == q in every cell -> every term exactly 0
    assert (b.n_ref, b.n_cur, b.n_buckets) == (2, 2, 1)
    assert b.psi == 0.0


def test_grid_dbscan_hand_case(spark):
    from bigdata_hwk_spark.operators import clustering as CL

    def cell_pts(cx, cy, n, side=1.0):
        # n points strictly inside cell (cx, cy)
        return [(cx * side + 0.1 + 0.01 * i, cy * side + 0.5) for i in range(n)]

    pts = (
        cell_pts(0, 0, 3)        # dense, adjacent to (0,1)
        + cell_pts(0, 1, 3)      # dense -> cluster {(0,0),(0,1)}
        + cell_pts(5, 5, 4)      # isolated dense -> singleton cluster
        + cell_pts(2, 8, 2)      # sparse: excluded
        + cell_pts(10, 10, 3)    # dense, diagonal neighbor of (11,11)
        + cell_pts(11, 11, 3)    # dense -> diagonal adjacency joins them
    )
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(pts)], "point_id bigint, x double, y double"
    )
    out = CL.grid_dbscan_clusters(df, side=1.0, minpts=3)
    rows = {r.cluster_id: (r.n_cells, r.n_points) for r in out.collect()}
    key = lambda cx, cy: cx * (1 << 22) + cy
    assert rows == {
        key(0, 0): (2, 6),
        key(5, 5): (1, 4),
        key(10, 10): (2, 6),
    }
    # partition-layout invariance (labels are min keys, not partition ids)
    rows_rep = {
        r.cluster_id: (r.n_cells, r.n_points)
        for r in CL.grid_dbscan_clusters(
            df.repartition(7), side=1.0, minpts=3
        ).collect()
    }
    assert rows_rep == rows


def test_bfs_hop_distances_hand_case(spark):
    from bigdata_hwk_spark.operators import graph as GR

    # chain 0 - 5 - 7 - 9 - 11 - 13 plus a disconnected pair {3, 4};
    # seeds (pk % 5 == 0): {0, 5}
    orders = [(1, 0), (1, 5), (2, 5), (2, 7), (3, 7), (3, 9),
              (4, 9), (4, 11), (5, 11), (5, 13), (6, 3), (6, 4),
              (2, 7)]  # duplicate line: must not affect distances
    li = spark.createDataFrame(orders, "l_orderkey bigint, l_partkey bigint")
    got = {
        r.part_id: r.hops
        for r in GR.copurchase_hop_distances(li, seed_mod=5, max_hops=4).collect()
    }
    assert got == {0: 0, 5: 0, 7: 1, 9: 2, 11: 3, 13: 4}
    # early exit: raising max_hops adds nothing once the frontier drains
    got10 = {
        r.part_id: r.hops
        for r in GR.copurchase_hop_distances(li, seed_mod=5, max_hops=10).collect()
    }
    assert got10 == got
    # tighter budget drops the far tail
    got2 = {
        r.part_id: r.hops
        for r in GR.copurchase_hop_distances(li, seed_mod=5, max_hops=2).collect()
    }
    assert got2 == {0: 0, 5: 0, 7: 1, 9: 2}


def _mg_stream(spark, items):
    return spark.createDataFrame(
        [(i, it) for i, it in enumerate(items)], "seq bigint, item bigint"
    )


def test_misra_gries_hand_case(spark):
    from bigdata_hwk_spark.operators import sketches as SK

    # chunk0 [1,1,1,2] -> {1:3,2:1} (<=k, no compress)
    # chunk1 [3,1,2,2] -> {2:2,1:1,3:1} -> pivot d=1 -> {2:1}
    # merge: {1:3, 2:2}
    df = _mg_stream(spark, [1, 1, 1, 2, 3, 1, 2, 2])
    got = {
        r.item: r.est_count
        for r in SK.misra_gries_summary(df, k=2, chunk=4, fanin=2).collect()
    }
    assert got == {1: 3, 2: 2}
    # layout invariance: chunking is keyed by seq, not partition
    got_rep = {
        r.item: r.est_count
        for r in SK.misra_gries_summary(
            df.repartition(5), k=2, chunk=4, fanin=2
        ).collect()
    }
    assert got_rep == got


def test_misra_gries_deterministic_bounds_on_fixture(spark):
    from pyspark.sql import functions as F

    from bigdata_hwk_spark.operators import sketches as SK
    from bigdata_hwk_spark.sources.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    k = 16
    est = {
        r.item: r.est_count
        for r in SK.user_heavy_hitters_mg(ev, k=k).collect()
    }
    assert 0 < len(est) <= k
    true = {
        r.user_id: r.c
        for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    n = sum(true.values())
    bound = (n - sum(est.values())) / (k + 1)
    for item, e in est.items():
        assert e <= true[item], (item, e, true[item])
    for item, t in true.items():
        assert t - est.get(item, 0) <= bound, (item, t, est.get(item, 0), bound)
    # superset property: anything heavier than the dropped-mass bound
    # must be present
    for item, t in true.items():
        if t > bound:
            assert item in est


def _cf_events(spark, interactions):
    # interactions: list of (user_id, item)
    rows = [
        (i, u, '{"k": %d}' % it) for i, (u, it) in enumerate(interactions)
    ]
    return spark.createDataFrame(rows, "event_id bigint, user_id bigint, props string")


def test_item_cf_neighbors_hand_case(spark):
    import math

    from bigdata_hwk_spark.operators import recsys as CF

    ev = _cf_events(
        spark,
        [(1, 1), (1, 2), (2, 1), (2, 2), (3, 1), (3, 3),
         (1, 1)],  # duplicate interaction: distinct'd away
    )
    out = {(r.item, r.neighbor): r for r in CF.item_cf_neighbors(ev).collect()}
    # c1=3, c2=2, c3=1; common(1,2)=2, common(1,3)=1, no (2,3)
    assert set(out) == {(1, 2), (1, 3), (2, 1), (3, 1)}
    assert out[(1, 2)].n_common == 2
    assert out[(1, 2)].cosine == round(2 / math.sqrt(6), 6)
    assert out[(1, 2)].rnk == 1 and out[(1, 3)].rnk == 2
    assert out[(1, 3)].cosine == round(1 / math.sqrt(3), 6)
    assert out[(2, 1)].cosine == out[(1, 2)].cosine  # symmetric score


def test_item_cf_user_cap(spark):
    from bigdata_hwk_spark.operators import recsys as CF

    # one user with 3 items, cap=2: item 3 is cut, so no pair involves it
    ev = _cf_events(spark, [(1, 1), (1, 2), (1, 3)])
    out = CF.item_cf_neighbors(ev, cap=2).collect()
    items = {(r.item, r.neighbor) for r in out}
    assert items == {(1, 2), (2, 1)}


def test_mg_ingest_stream_equals_batch(spark, tmp_path):
    """The streaming MG deployment (additive active-chunk state,
    compress-on-complete leaves, final tree fold) must land bit-equal on
    the batch twin over the same rows."""
    from bigdata_hwk_spark.operators import sketches as SK
    from bigdata_hwk_spark.sources.tables import load_table
    from bigdata_hwk_spark.streaming.cdc_stream import chunk_events_by_day
    from bigdata_hwk_spark.streaming.frequent_items import run_mg_ingest_stream

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    n_days = chunk_events_by_day(events, str(tmp_path / "days"))
    assert n_days > 3
    k, chunk = 16, 512
    got = {
        r.item: r.est_count
        for r in run_mg_ingest_stream(
            spark, str(tmp_path / "days"), k=k, chunk=chunk
        ).collect()
    }
    want = {
        r.item: r.est_count
        for r in SK.misra_gries_summary(
            events, item_col="user_id", seq_col="event_id", k=k, chunk=chunk
        ).collect()
    }
    assert got == want and len(got) > 0


def test_event_type_daily_trend_hand_case(spark):
    from pyspark.sql import functions as F

    from bigdata_hwk_spark.operators import behavior as BH

    rows = []
    def add(t, day, n):
        rows.extend([(day * 86400 + i, t) for i in range(n)])

    add("up", 0, 1); add("up", 1, 2); add("up", 2, 3)      # perfect line
    add("flat", 0, 2); add("flat", 1, 2)                   # constant counts
    add("one", 0, 5)                                       # single day
    add("noisy", 0, 1); add("noisy", 1, 3); add("noisy", 2, 2)
    ev = spark.createDataFrame(
        rows, "epoch bigint, event_type string"
    ).select(F.col("epoch").cast("timestamp").alias("ts"), "event_type")
    got = {r.event_type: r for r in BH.event_type_daily_trend(ev).collect()}
    up = got["up"]
    assert (up.n_days, up.total_events) == (3, 6)
    assert (up.slope, up.intercept, up.r2) == (1.0, 1.0, 1.0)
    flat = got["flat"]
    assert (flat.slope, flat.intercept, flat.r2) == (0.0, 2.0, 1.0)
    one = got["one"]
    assert (one.n_days, one.slope, one.intercept, one.r2) == (1, 0.0, 5.0, 1.0)
    noisy = got["noisy"]
    # sums: sx=3 sy=6 sxy=7 sxx=5 syy=14 -> slope 0.5, intercept 1.5,
    # r2 = 3^2 / (6 * 6) = 0.25
    assert (noisy.slope, noisy.intercept, noisy.r2) == (0.5, 1.5, 0.25)


def test_release_funnel_python_mirror(spark):
    """Funnel stage counts must equal an independent Python replay of the
    recipe (exact dup keeper, quality+length gate, 8-gram contamination)."""
    from bigdata_hwk_spark.pipeline import (
        RELEASE_EVAL_MOD,
        RELEASE_MIN_TOKENS,
        release_funnel_report,
    )

    long_tail = " ".join(f"tok{i}" for i in range(30))
    eval_gram = "e1 e2 e3 e4 e5 e6 e7 e8"
    rows = [
        (0, f"{eval_gram} {long_tail}"),                    # eval split
        (1, f"alpha beta {long_tail}"),                     # clean survivor
        (2, f"dup body {long_tail}"),                       # exact dup keeper
        (9, f"dup body {long_tail}"),                       # exact dup dropped
        (3, f"{eval_gram} stolen {long_tail}"),             # contaminated
        (4, "short doc"),                                   # token-floor cut
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r.stage_ord: (r.stage, r.n_docs, r.n_tokens)
        for r in release_funnel_report(docs).collect()
    }

    # independent python replay
    toks = {i: len(t.split(" ")) for i, t in rows}
    q = {
        r.doc_id: r.quality_score
        for r in TX.quality_scores(docs).collect()
    }
    corpus = [i for i, _ in rows if i % RELEASE_EVAL_MOD != 0]
    seen, s2 = set(), []
    for i in sorted(corpus):
        t = dict(rows)[i]
        if t not in seen:
            seen.add(t)
            s2.append(i)
    s3 = [
        i for i in s2
        if q[i] >= 0.45 and toks[i] >= RELEASE_MIN_TOKENS
    ]

    def grams(t, w=8):
        ws = t.split(" ")
        return {" ".join(ws[j:j + w]) for j in range(len(ws) - w + 1)}

    eval_sh = set().union(
        *(grams(t) for i, t in rows if i % RELEASE_EVAL_MOD == 0)
    )
    s4 = [i for i in s3 if not (grams(dict(rows)[i]) & eval_sh)]

    def tot(ids):
        return (len(ids), sum(toks[i] for i in ids))

    assert got[0] == ("ingest", len(rows), sum(toks.values()))
    assert got[1] == ("train_side",) + tot(corpus)
    assert got[2] == ("exact_dedup",) + tot(s2)
    assert got[3] == ("quality_gate",) + tot(s3)
    assert got[4] == ("decontaminated",) + tot(s4)
    # the fixture exercises every stage: each cut is non-trivial
    assert len(corpus) < len(rows)
    assert len(s2) < len(corpus)
    assert len(s3) < len(s2)
    assert len(s4) < len(s3)


def test_event_debounce_hand_case(spark):
    from pyspark.sql import functions as F

    from bigdata_hwk_spark.operators import behavior as BH

    rows = [
        # (event_id, epoch, user, type)
        (0, 0, 1, "a"),     # first -> kept
        (1, 30, 1, "a"),    # gap 30 < 60 -> dropped
        (2, 100, 1, "a"),   # gap 70 from the RAW previous -> kept
        (3, 0, 2, "a"),     # other user independent -> kept
        (4, 0, 1, "b"),     # other type independent -> kept
        (5, 59, 1, "b"),    # gap 59 -> dropped
    ]
    ev = spark.createDataFrame(
        rows, "event_id bigint, epoch bigint, user_id bigint, event_type string"
    ).select(
        "event_id", F.col("epoch").cast("timestamp").alias("ts"),
        "user_id", "event_type",
    )
    got = {r.event_type: r for r in BH.event_debounce_stats(ev).collect()}
    assert (got["a"].n_events, got["a"].n_kept, got["a"].n_dropped) == (4, 3, 1)
    assert (got["b"].n_events, got["b"].n_kept, got["b"].n_dropped) == (2, 1, 1)


def test_degree_mixing_star_graph(spark):
    from bigdata_hwk_spark.operators import graph as GR

    # star K1,3: center 0 paired with leaves 1..3 (one order per edge)
    li = spark.createDataFrame(
        [(1, 0), (1, 1), (2, 0), (2, 2), (3, 0), (3, 3)],
        "l_orderkey bigint, l_partkey bigint",
    )
    r = GR.copurchase_degree_mixing(li).collect()[0]
    assert (r.n_nodes, r.n_edges, r.max_degree) == (4, 3, 3)
    assert r.mean_degree == 1.5
    assert r.assortativity == -1.0  # a star is perfectly disassortative


def test_degree_mixing_regular_graph_degenerate(spark):
    from bigdata_hwk_spark.operators import graph as GR

    # triangle: every degree 2 -> zero variance -> pinned 0.0
    li = spark.createDataFrame(
        [(1, 0), (1, 1), (2, 1), (2, 2), (3, 2), (3, 0)],
        "l_orderkey bigint, l_partkey bigint",
    )
    r = GR.copurchase_degree_mixing(li).collect()[0]
    assert (r.n_nodes, r.n_edges, r.max_degree) == (3, 3, 2)
    assert r.assortativity == 0.0


def test_psi_monitor_stream_equals_batch(spark, tmp_path):
    """Frozen-reference streaming PSI (additive alphabet-bounded state)
    must reproduce the batch two-half query exactly."""
    from pyspark.sql import functions as F

    from bigdata_hwk_spark.operators import robust as RB
    from bigdata_hwk_spark.sources.tables import load_table
    from bigdata_hwk_spark.streaming.cdc_stream import chunk_events_by_day
    from bigdata_hwk_spark.streaming.drift_stream import run_psi_monitor_stream

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    day = F.floor(F.col("ts").cast("long") / 86400)
    lo, hi = events.agg(F.min(day), F.max(day)).first()
    mid = lo + (hi - lo) // 2
    ref = RB.psi_value_buckets(events.filter(day <= mid))
    # batch twin on the whole table
    want = {r.event_type: tuple(r) for r in RB.value_drift_psi(events).collect()}
    # batch psi_report path over the same two halves (refactor pin)
    cur = RB.psi_value_buckets(events.filter(day > mid))
    got_batch = {
        r.event_type: tuple(r) for r in RB.psi_report(ref, cur).collect()
    }
    assert got_batch == want
    # streaming path: replay the second half in day files
    n_days = chunk_events_by_day(
        events.filter(day > mid), str(tmp_path / "days")
    )
    assert n_days > 2
    got = {
        r.event_type: tuple(r)
        for r in run_psi_monitor_stream(
            spark, str(tmp_path / "days"), ref
        ).collect()
    }
    assert got == want


def test_kcore_clique_and_pendant(spark):
    from bigdata_hwk_spark.operators import graph as GR

    # K4 clique (order 1 holds parts 1..4) + pendant path 4-5-6
    li = spark.createDataFrame(
        [(1, 1), (1, 2), (1, 3), (1, 4), (2, 4), (2, 5), (3, 5), (3, 6)],
        "l_orderkey bigint, l_partkey bigint",
    )
    got = {
        r.part_id: r.core_degree
        for r in GR.copurchase_kcore(li, k=3).collect()
    }
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_kcore_cascading_peel(spark):
    from bigdata_hwk_spark.operators import graph as GR

    # triangle 1-2-3 with a tail 3-4-5: k=2 peels 5 then 4 (two rounds)
    li = spark.createDataFrame(
        [(1, 1), (1, 2), (2, 2), (2, 3), (3, 3), (3, 1),
         (4, 3), (4, 4), (5, 4), (5, 5)],
        "l_orderkey bigint, l_partkey bigint",
    )
    got = {
        r.part_id: r.core_degree
        for r in GR.copurchase_kcore(li, k=2).collect()
    }
    assert got == {1: 2, 2: 2, 3: 2}
    # empty core when k exceeds the densest region
    assert GR.copurchase_kcore(li, k=3).count() == 0


def test_kcore_fixture_invariant(spark):
    from pyspark.sql import functions as F

    from bigdata_hwk_spark.operators import graph as GR
    from bigdata_hwk_spark.sources.tables import load_table

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem").filter(
        F.col("l_orderkey") % 7 == 0
    )
    k = 4
    core = GR.copurchase_kcore(li, k=k)
    rows = core.collect()
    assert len(rows) > 0
    # invariant: every member's degree WITHIN the core is >= k
    assert all(r.core_degree >= k for r in rows)
    # layout invariance
    rows_rep = GR.copurchase_kcore(li.repartition(9), k=k).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows_rep))


def test_frequent_triples_hand_case(spark):
    from bigdata_hwk_spark.operators import assoc as ARL

    li = spark.createDataFrame(
        [(1, 1), (1, 2), (1, 3),
         (2, 1), (2, 2), (2, 3),
         (3, 1), (3, 2), (3, 4),
         (3, 4)],  # duplicate line: distinct'd away
        "l_orderkey bigint, l_partkey bigint",
    )
    rows = ARL.frequent_triples_topk(li, min_count=2, topk=5).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.rnk, r.item_a, r.item_b, r.item_c, r.triple_cnt) == (1, 1, 2, 3, 2)
    assert r.support == round(2 / 3, 6)


def test_greedy_coverage_python_mirror(spark):
    """The greedy max-coverage trace must equal an exact Python replay
    (same shingles, same tie-break), and be layout-invariant."""
    from bigdata_hwk_spark.operators.select import greedy_coverage_select

    texts = {
        1: "a b c d e f",        # 4 3-grams
        2: "a b c d e f",        # exact dup of 1: gain 0 after 1 picked
        3: "x y z w",            # 2 fresh 3-grams
        4: "a b c q r s t",      # overlaps 1 on "a b c"
        5: "m n",                # too short for a 3-gram: never selected
    }
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id bigint, text string"
    )
    got = [
        (r.rnk, r.doc_id, r.marginal_gain, r.covered_total)
        for r in greedy_coverage_select(docs, k=10, w=3)
        .orderBy("rnk")
        .collect()
    ]

    def grams(t, w=3):
        ws = t.split(" ")
        return {" ".join(ws[i:i + w]) for i in range(len(ws) - w + 1)}

    sets = {d: grams(t) for d, t in texts.items() if len(t.split()) >= 3}
    covered: set = set()
    want = []
    for i in range(1, 11):
        best = max(
            sorted(sets),
            key=lambda d: (len(sets[d] - covered), -d),
        )
        g = len(sets[best] - covered)
        if g == 0:
            break
        covered |= sets[best]
        want.append((i, best, g, len(covered)))
    assert got == want
    # layout invariance
    got_rep = [
        (r.rnk, r.doc_id, r.marginal_gain, r.covered_total)
        for r in greedy_coverage_select(docs.repartition(7), k=10, w=3)
        .orderBy("rnk")
        .collect()
    ]
    assert got_rep == want


def test_multitouch_credit_hand_case(spark):
    from pyspark.sql import functions as F

    from bigdata_hwk_spark.operators import behavior as BH

    D = 86400
    rows = [
        # (event_id, epoch, user, type, value, campaign-or-None)
        (1, 10, 1, "click", 0.0, 5),
        (2, 20, 1, "click", 0.0, 7),
        (3, 100, 1, "purchase", 2.00, None),   # 200c over 2 clicks
        (4, 50, 1, "purchase", 1.01, None),    # 101c over 2 clicks (floor)
        (5, 0, 2, "click", 0.0, 5),
        (6, 8 * D, 2, "purchase", 5.0, None),  # click out of window: drops
        (7, 1, 3, "click", 0.0, 5),
        (8, 2, 3, "click", 0.0, 5),
        (9, 3, 3, "click", 0.0, 7),
        (10, 10, 3, "purchase", 0.01, None),   # 1c over 3 clicks: 3333 each
    ]
    ev = spark.createDataFrame(
        [
            (e, t, u, ty, v, '{"k": %d}' % c if c is not None else "{}")
            for e, t, u, ty, v, c in rows
        ],
        "event_id bigint, epoch bigint, user_id bigint, "
        "event_type string, value double, props string",
    ).select(
        "event_id", F.col("epoch").cast("timestamp").alias("ts"),
        "user_id", "event_type", "value", "props",
    )
    got = {r.campaign: r for r in BH.multitouch_credit(ev).collect()}
    assert set(got) == {5, 7}
    c5, c7 = got[5], got[7]
    # camp 5: u1 click credited by both purchases + u3's two clicks
    assert (c5.n_touches, c5.n_purchases) == (4, 3)
    assert c5.credit_micros == 1_000_000 + 505_000 + 2 * 3333
    assert (c7.n_touches, c7.n_purchases) == (3, 3)
    assert c7.credit_micros == 1_000_000 + 505_000 + 3333


def test_unigram_estep_hand_posterior():
    from bigdata_hwk_spark.operators import unigram_lm as UL

    # word "ab", pieces {a: .25, b: .25, ab: .5}:
    # segs: [ab] p=.5, [a b] p=.0625, Z=.5625 -> E[ab]=8/9, E[a]=E[b]=1/9
    ec = UL.expected_counts_word("ab", {"a": 0.25, "b": 0.25, "ab": 0.5}, 6)
    assert abs(ec["ab"] - 8 / 9) < 1e-12
    assert abs(ec["a"] - 1 / 9) < 1e-12
    assert abs(ec["b"] - 1 / 9) < 1e-12
    # uncoverable word -> {}
    assert UL.expected_counts_word("xz", {"a": 1.0}, 6) == {}


def test_unigram_viterbi_hand_cases():
    from bigdata_hwk_spark.operators import unigram_lm as UL

    probs = {"a": 0.25, "b": 0.25, "c": 0.1, "ab": 0.4}
    assert UL.viterbi_segment("abc", probs, 6) == ["ab", "c"]
    # exact tie ([aa] vs [a,a] both .25): longer piece wins
    assert UL.viterbi_segment("aa", {"a": 0.5, "aa": 0.25}, 6) == ["aa"]
    assert UL.viterbi_segment("qq", {"a": 1.0}, 6) == []


def _uni_word_freqs(texts):
    from collections import Counter

    c = Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                c[w] += 1
    return dict(c)


def _uni_seed_ref(word_freqs, seed_size, max_len):
    from collections import Counter

    c = Counter()
    for w, f in word_freqs.items():
        for i in range(len(w)):
            for n in range(1, min(max_len, len(w) - i) + 1):
                c[w[i:i + n]] += f
    top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:seed_size]
    kept = dict(top)
    for p, cnt in c.items():
        if len(p) == 1:
            kept[p] = cnt
    return sorted(kept.items(), key=lambda kv: (-kv[1], kv[0]))


def test_unigram_lm_distributed_equals_reference(spark):
    from bigdata_hwk_spark.operators import unigram_lm as UL

    texts = [
        "spark spark scan table scan",
        "sparkle table tablet scan",
        "spar spars sparkle spark",
    ]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id bigint, text string"
    )
    wf = _uni_word_freqs(texts)
    seed_size, max_len, keep = 64, 4, 32
    # seed stage equality (distributed substring counts vs python)
    from bigdata_hwk_spark.operators.unigram_lm import _seed_pieces, _word_histogram

    seed_dist = _seed_pieces(_word_histogram(docs), seed_size, max_len)
    seed_ref = _uni_seed_ref(wf, seed_size, max_len)
    assert seed_dist == seed_ref
    # full train equality, bit-for-bit on quantized counts
    want = UL.unigram_train_reference(
        wf, seed_ref, n_iters=2, max_len=max_len, keep=keep
    )
    got = [
        (r.rnk, r.piece, r.prob, r.expected_q)
        for r in UL.unigram_lm_vocab(
            docs, seed_size=seed_size, n_iters=2, max_len=max_len, keep=keep
        ).orderBy("rnk").collect()
    ]
    assert got == [(r, p, round(pr, 12), q) for r, p, pr, q in want]
    # layout invariance
    got_rep = [
        (r.rnk, r.piece, r.prob, r.expected_q)
        for r in UL.unigram_lm_vocab(
            docs.repartition(7), seed_size=seed_size, n_iters=2,
            max_len=max_len, keep=keep,
        ).orderBy("rnk").collect()
    ]
    assert got_rep == got


def test_unigram_lm_encode_stats_matches_python(spark):
    from bigdata_hwk_spark.operators import unigram_lm as UL

    texts = ["spark scan spark", "sparkle scan table"]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id bigint, text string"
    )
    r = UL.unigram_lm_encode_stats(
        docs, seed_size=64, n_iters=2, max_len=4, keep=32
    ).collect()[0]
    # python replay: same train (reference), same viterbi, weighted sums
    wf = _uni_word_freqs(texts)
    seed = _uni_seed_ref(wf, 64, 4)
    ranked = UL.unigram_train_reference(wf, seed, n_iters=2, max_len=4, keep=32)
    probs = {p: pr for _, p, pr, _ in ranked}
    n_words = sum(wf.values())
    n_pieces = sum(len(UL.viterbi_segment(w, probs, 4)) * f for w, f in wf.items())
    n_chars = sum(len(w) * f for w, f in wf.items())
    assert r.vocab_size == len(ranked)
    assert (r.n_words, r.n_pieces) == (n_words, n_pieces)
    assert r.avg_pieces_per_word == round(n_pieces / n_words, 6)
    assert r.compression_pct == round(100.0 * (1.0 - n_pieces / n_chars), 6)


def test_mg_ingest_stream_rejects_out_of_order_chunks(spark, tmp_path):
    """The streaming MG twin's bit-equality with the batch path rides on
    event-id-monotone file delivery; that contract is ENFORCED — a late
    batch carrying cells for an already-closed chunk must raise loudly
    (duplicate leaf = silent divergence), not diverge silently."""
    import os
    import time

    import pytest

    from bigdata_hwk_spark.streaming.frequent_items import run_mg_ingest_stream

    chunk = 512
    src = tmp_path / "ooo"
    os.makedirs(src)

    def write_file(name, ids, mtime):
        df = spark.createDataFrame(
            [(int(i), None, int(i) % 7, "t", 0.0, None) for i in ids],
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double, props string",
        )
        staging = str(tmp_path / "staging")
        df.coalesce(1).write.mode("overwrite").parquet(staging)
        part = next(f for f in os.listdir(staging) if f.endswith(".parquet"))
        dst = str(src / name)
        os.rename(os.path.join(staging, part), dst)
        os.utime(dst, (mtime, mtime))

    base = time.time() - 3600
    # file 0 (delivered first): events in chunk 5; file 1 (later mtime,
    # second micro-batch): a LATE event for chunk 1 — already closed.
    write_file("0000.parquet", range(5 * chunk, 5 * chunk + 20), base)
    write_file("0001.parquet", range(1 * chunk, 1 * chunk + 20), base + 1)

    with pytest.raises(Exception, match="out-of-order stream delivery"):
        run_mg_ingest_stream(spark, str(src), k=8, chunk=chunk)


def test_unigram_seed_char_coverage_floor():
    """A single char whose quantized expected count rounds to 0 must NOT
    vanish from the vocabulary: every seed single-char piece is carried
    through pruning with a floor count of 1, so every corpus word stays
    segmentable (char-by-char fallback always exists)."""
    from bigdata_hwk_spark.operators import unigram_lm as UL

    # planted: 'z' occurs once in a corpus dominated by a huge-count
    # word, and its seed count is adversarially tiny relative to _SCALE
    # quantization — the pre-fix path drops it when EM mass concentrates.
    qcounts = {"ab": 100, "a": 50, "b": 40}          # 'z' absent entirely
    seed_chars = {"a", "b", "z"}
    floored = UL._floor_seed_chars(dict(qcounts), seed_chars)
    assert floored["z"] == 1 and floored["a"] == 50

    # end-to-end: train on a corpus containing one 'z'; the trained
    # vocab must contain 'z' and Viterbi must segment 'za'.
    wf = {"aaaa": 1000, "aab": 500, "za": 1}
    seed = [("aa", 3000), ("a", 4500), ("b", 500), ("z", 1)]
    out = UL.unigram_train_reference(wf, seed, n_iters=3, max_len=4, keep=3)
    pieces = {p for _, p, _, _ in out}
    assert "z" in pieces and "a" in pieces and "b" in pieces
    probs = {p: pr for _, p, pr, _ in out}
    assert UL.viterbi_segment("za", probs, 4) != []


def _coverage_trace(df):
    return [
        (r.rnk, r.doc_id, r.marginal_gain, r.covered_total)
        for r in df.orderBy("rnk").collect()
    ]


def test_lazy_greedy_coverage_bit_identical_and_lazy(spark):
    """Lazy greedy must produce the exact greedy trace BIT-IDENTICALLY
    (strict-dominance acceptance) while recomputing far fewer gains
    than exact greedy's rounds×docs — the laziness evidence."""
    from bigdata_hwk_spark.operators.select import (
        greedy_coverage_select,
        lazy_greedy_coverage_select,
    )

    # 20 docs with well-separated vocabularies: doc i contributes i
    # unique 3-grams plus a shared prefix, so gains are distinct and
    # lazy probing settles each round in one top-B probe.
    texts = {}
    for i in range(1, 21):
        toks = [f"w{i}_{j}" for j in range(i + 2)]  # i distinct 3-grams
        texts[i] = " ".join(toks)
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id bigint, text string"
    )
    want = _coverage_trace(greedy_coverage_select(docs, k=8, w=3))
    stats: dict = {}
    got = _coverage_trace(
        lazy_greedy_coverage_select(docs, k=8, w=3, probe_batch=2, stats=stats)
    )
    assert got == want and len(got) == 8
    # disjoint vocabularies: stale bounds are exact, so after the
    # seeding round every round recomputes at most probe_batch docs
    assert stats["rounds"] == 8
    assert stats["recomputes"] <= 2 * 8
    assert stats["escalations"] == 0


def test_lazy_greedy_tie_at_threshold_escalates_not_guesses(spark):
    """Two equal-gain docs with probe_batch=1: the first probe's best
    recomputed gain TIES the excluded stale bound — the lazy path must
    escalate (recompute both) and keep the doc_id tie-break, never
    accept on a tie."""
    from bigdata_hwk_spark.operators.select import (
        greedy_coverage_select,
        lazy_greedy_coverage_select,
    )

    texts = {
        2: "z1 z2 z3 z4 z5 z6 z7 z8",  # 6 grams: clear round-1 winner
        7: "a1 a2 a3 a4 a5",   # 3 grams
        3: "b1 b2 b3 b4 b5",   # 3 grams, equal gain, smaller id wins
        9: "c1 c2 c3",         # 1 gram
    }
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id bigint, text string"
    )
    want = _coverage_trace(greedy_coverage_select(docs, k=5, w=3))
    stats: dict = {}
    got = _coverage_trace(
        lazy_greedy_coverage_select(docs, k=5, w=3, probe_batch=1, stats=stats)
    )
    assert got == want
    # round 2: probe sees only doc 3, its gain TIES doc 7's stale bound
    # → must escalate and resolve the tie by doc_id, picking 3 before 7
    assert got[1][1] == 3 and got[2][1] == 7
    assert stats["escalations"] >= 1


def test_lazy_greedy_fixture_trace_matches_exact(spark):
    """On the real sf0.001 documents table the lazy path must reproduce
    the registry row's exact trace."""
    from bigdata_hwk_spark.operators.select import (
        greedy_coverage_select,
        lazy_greedy_coverage_select,
    )
    from bigdata_hwk_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    want = _coverage_trace(greedy_coverage_select(docs, k=10, w=3))
    got = _coverage_trace(lazy_greedy_coverage_select(docs, k=10, w=3))
    assert got == want and len(got) > 0


def test_greedy_coverage_gate_delegates_to_lazy(spark, monkeypatch):
    """Budgets above COVERAGE_LAZY_GATE_K must route through the lazy
    path (the round-10 'ship it behind a gate' contract)."""
    from bigdata_hwk_spark.operators import select as SEL

    called = {}

    def spy(documents, k, w):
        called["k"] = k
        return "LAZY"

    monkeypatch.setattr(SEL, "lazy_greedy_coverage_select", spy)
    docs = spark.createDataFrame([(1, "a b c")], "doc_id bigint, text string")
    assert SEL.greedy_coverage_select(docs, k=SEL.COVERAGE_LAZY_GATE_K + 1) == "LAZY"
    assert called["k"] == SEL.COVERAGE_LAZY_GATE_K + 1


def test_lazy_greedy_pruned_index_trace_and_pushdown(spark, tmp_path):
    """index_dir mode: the doc-sorted parquet index must (a) leave the
    trace bit-identical, and (b) push the candidate doc_id IN-filter
    into the parquet scan so row-group stats can prune I/O."""
    from pyspark.sql import functions as F

    from bigdata_hwk_spark.operators.select import (
        greedy_coverage_select,
        lazy_greedy_coverage_select,
    )
    from bigdata_hwk_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    want = _coverage_trace(greedy_coverage_select(docs, k=6, w=3))
    idx = str(tmp_path / "cov_index")
    got = _coverage_trace(
        lazy_greedy_coverage_select(docs, k=6, w=3, index_dir=idx)
    )
    assert got == want and len(got) == 6
    # the pruned-read shape: an IN(doc_id ...) filter must reach the scan
    plan = (
        spark.read.parquet(idx)
        .filter(F.col("doc_id").isin([1, 2, 3]))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [In(doc_id" in plan, plan


def test_hard_negative_topk_hand_case(spark):
    """Band semantics by hand: positives (cos >= pos_tau) and easy
    negatives (cos < neg_lo) are excluded; survivors rank by cosine
    desc with neighbor_id ties."""
    from bigdata_hwk_spark.operators import similarity as SIM

    rows = [
        (0, [1.0, 0.0]),    # anchor
        (1, [1.0, 0.0]),    # duplicate: cos=1.0 -> positive, excluded
        (2, [1.0, 0.2]),    # cos~0.981 -> positive (>= 0.6), excluded
        (3, [1.0, 1.0]),    # cos~0.707 -> positive, excluded
        (4, [1.0, 2.0]),    # cos~0.447 -> hard negative
        (5, [2.0, 4.0]),    # cos~0.447 (same) -> tie by neighbor_id
        (6, [0.1, 1.0]),    # cos~0.0995 -> hard negative (lower rank)
        (7, [0.0, 1.0]),    # cos=0.0 -> below neg_lo, excluded
        (8, [-1.0, 0.0]),   # cos=-1 -> excluded
        (9, [0.0, 0.0]),    # zero norm -> excluded up front
    ]
    embs = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    got = [
        (r.query_id, r.neighbor_id, r.cosine, r.rk)
        for r in SIM.hard_negative_topk(
            embs, n_queries=1, k=10, pos_tau=0.6, neg_lo=0.05
        ).orderBy("rk").collect()
    ]
    import math

    c45 = round(1 / math.sqrt(5), 4)
    c6 = round(0.1 / math.sqrt(0.1 ** 2 + 1.0), 4)
    assert got == [(0, 4, c45, 1), (0, 5, c45, 2), (0, 6, c6, 3)]


def test_event_type_bursts_hand_case(spark):
    """Integer-exact burst predicate by hand: flat baseline then a
    spike; warmup days (< w trailing days) excluded; a mild bump below
    3 sigma stays unflagged."""
    from pyspark.sql import functions as F

    from bigdata_hwk_spark.operators import behavior as BH

    rows = []
    def day(d, n, t="a"):
        rows.extend([(d * 86400 + i, t) for i in range(n)])

    # type a: 3-day trail (w=3): days 0-2 = 10 each; day 3 = 10 (no
    # burst, dev=0); day 4 = 11 (dev=1*3-(10+10+11)=... compute below);
    # day 5 = 40 (clear burst)
    for d in range(3):
        day(d, 10)
    day(3, 10); day(4, 11); day(5, 40)
    df = spark.createDataFrame(rows, "epoch bigint, event_type string").select(
        F.col("epoch").cast("timestamp").alias("ts"),
        "event_type",
        F.lit(0).alias("user_id"),
        F.lit(0.0).alias("value"),
        F.lit(None).cast("string").alias("props"),
        F.monotonically_increasing_id().alias("event_id"),
    )
    got = {
        r.day: (r.y, r.trail_sum, r.burst)
        for r in BH.event_type_bursts(df, w=3, sigmas=3).collect()
    }
    # days 0-2 excluded (fewer than 3 trailing days)
    assert set(got) == {3, 4, 5}
    # day 3: trail {10,10,10}: dev = 10*3-30 = 0 -> no burst
    assert got[3] == (10, 30, 0)
    # day 4: trail {10,10,10}: dev = 11*3-30 = 3; var_n2 = 3*300-900 = 0
    #        -> 9 > 9*0 -> burst (any rise over a ZERO-variance baseline)
    assert got[4] == (11, 30, 1)
    # day 5: trail {10,10,11}: s=31, ss=321; dev = 40*3-31 = 89;
    #        var_n2 = 3*321-961 = 2; 89^2=7921 > 9*2 -> burst
    assert got[5] == (40, 31, 1)

    # mild bump below 3 sigma: noisy trail {8,12,10}: s=30, ss=308,
    # var_n2 = 3*308-900 = 24; day value 12: dev = 36-30 = 6; 36 <= 216?
    # 36 <= 9*24=216 -> NOT a burst
    rows2 = []
    def day2(d, n):
        rows2.extend([(d * 86400 + i, "b") for i in range(n)])
    day2(0, 8); day2(1, 12); day2(2, 10); day2(3, 12)
    df2 = spark.createDataFrame(rows2, "epoch bigint, event_type string").select(
        F.col("epoch").cast("timestamp").alias("ts"), "event_type"
    )
    got2 = {r.day: r.burst for r in BH.event_type_bursts(df2, w=3).collect()}
    assert got2 == {3: 0}


def test_burst_monitor_stream_equals_batch(spark, tmp_path):
    """The streaming burst monitor (additive daily state + the shared
    scoring leg) must reproduce the batch query BIT-EQUAL on the same
    rows, regardless of micro-batch chunking."""
    from bigdata_hwk_spark.operators import behavior as BH
    from bigdata_hwk_spark.sources.tables import load_table
    from bigdata_hwk_spark.streaming.burst_stream import run_burst_monitor_stream
    from bigdata_hwk_spark.streaming.cdc_stream import chunk_events_by_day

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    want = {
        (r.event_type, r.day): tuple(r)
        for r in BH.event_type_bursts(events).collect()
    }
    assert len(want) > 0
    n_days = chunk_events_by_day(events, str(tmp_path / "days"))
    assert n_days > 3
    got = {
        (r.event_type, r.day): tuple(r)
        for r in run_burst_monitor_stream(
            spark, str(tmp_path / "days")
        ).collect()
    }
    assert got == want


def test_neyman_allocation_hand_case(spark):
    """Largest-remainder arithmetic by hand: two strata with known
    variances; allocations sum exactly to the budget; the zero-variance
    stratum floors at weight 1 (allocatable, near-zero share)."""
    from bigdata_hwk_spark.operators import splits as SP

    rows = []
    # stratum 'a': values 0, 10 repeated 4x -> var_num = 8*200-40^2=0?
    # values [0,10,0,10,0,10,0,10]: n=8 s=40 ss=400 -> 8*400-1600=1600
    rows += [(i, "a", v) for i, v in enumerate([0, 10] * 4)]
    # stratum 'b': constant 7 -> var_num = 0 -> weight floors at 1
    rows += [(100 + i, "b", 7) for i in range(4)]
    docs = spark.createDataFrame(rows, "doc_id bigint, lang string, n_chars bigint")
    got = {
        r.stratum: (r.n_docs, r.weight_q, r.alloc)
        for r in SP.neyman_stratified_allocation(docs, total_n=10).collect()
    }
    # a: sqrt(1600)=40 -> wq = 40_000_000; b: wq = 1
    W = 40_000_000 + 1
    base_a, rem_a = (10 * 40_000_000) // W, (10 * 40_000_000) % W
    base_b, rem_b = 10 // W, 10 % W
    leftover = 10 - base_a - base_b
    # remainder ranking: rem_a vs rem_b
    alloc_a = base_a + (1 if (rem_a, "a") >= (rem_b, "b") and leftover >= 1 else 0)
    alloc_b = 10 - alloc_a
    assert got == {"a": (8, 40_000_000, alloc_a), "b": (4, 1, alloc_b)}
    assert sum(v[2] for v in got.values()) == 10


def test_k_anonymity_audit_hand_case(spark):
    """Violation census by hand: distinct USERS decide (one chatty user
    is still one person), rows-at-risk counts rows."""
    from pyspark.sql import functions as F

    from bigdata_hwk_spark.operators import privacy as PV

    rows = []
    # type 'a', day 0, bucket 0: users 1,2,3 (k=3 distinct) -> safe at k=3
    rows += [(10 + i, 0, "a", 1.0, u) for i, u in enumerate([1, 2, 3])]
    # type 'a', day 0, bucket 1 (value 6.0): user 9 five times -> 1
    # distinct user, 5 rows -> violating, all 5 rows at risk
    rows += [(20 + i, 0, "a", 6.0, 9) for i in range(5)]
    # type 'b', day 1, bucket 0: users 1,2 -> violating at k=3
    rows += [(30 + i, 86400, "b", 2.0, u) for i, u in enumerate([1, 2])]
    df = spark.createDataFrame(
        [(e, t, ty, v, u) for e, t, ty, v, u in rows],
        "event_id bigint, epoch bigint, event_type string, value double, user_id bigint",
    ).select(
        "event_id",
        F.col("epoch").cast("timestamp").alias("ts"),
        "event_type", "value", "user_id",
    )
    got = {
        r.event_type: (
            r.n_cells, r.n_violating_cells, r.n_rows, r.n_rows_at_risk,
            r.risk_pct,
        )
        for r in PV.k_anonymity_audit(df, k=3).collect()
    }
    assert got == {
        "a": (2, 1, 8, 5, 62.5),
        "b": (1, 1, 2, 2, 100.0),
    }


def test_k_anonymity_monitor_stream_equals_batch(spark, tmp_path):
    """The streaming k-anonymity monitor (additive per-user cell state —
    distinct users are NOT additive, so the state carries the user
    granularity — plus the batch scoring leg) must reproduce the batch
    audit bit-equal on the same rows."""
    from bigdata_hwk_spark.operators import privacy as PV
    from bigdata_hwk_spark.sources.tables import load_table
    from bigdata_hwk_spark.streaming.cdc_stream import chunk_events_by_day
    from bigdata_hwk_spark.streaming.privacy_stream import (
        run_k_anonymity_monitor_stream,
    )

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    want = {
        r.event_type: tuple(r) for r in PV.k_anonymity_audit(events).collect()
    }
    assert len(want) > 0
    n_days = chunk_events_by_day(events, str(tmp_path / "days"))
    assert n_days > 3  # users recur across day files: additivity is exercised
    got = {
        r.event_type: tuple(r)
        for r in run_k_anonymity_monitor_stream(
            spark, str(tmp_path / "days")
        ).collect()
    }
    assert got == want
