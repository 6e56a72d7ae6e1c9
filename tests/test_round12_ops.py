"""Round-12 operator tests: overflow-class closures and new operators.

Covers the round-11 VERDICT item 4 (burst-predicate DECIMAL promotion,
red-before/green-after) and the ADVICE items landed this round.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from bigdata_hwk_spark.operators import behavior as BH


def _true_burst(y: int, trail: list[int], sigmas: int = 3) -> int:
    """Arbitrary-precision Python reference for the burst predicate."""
    n, s, ss = len(trail), sum(trail), sum(t * t for t in trail)
    dev = y * n - s
    return int(dev > 0 and dev * dev > sigmas * sigmas * (n * ss - s * s))


def _wrapped_burst(y: int, trail: list[int], sigmas: int = 3) -> int:
    """The OLD raw-BIGINT semantics (mod-2^64 wrap) — what Spark computed
    before the DECIMAL(38,0) promotion. Kept so the planted cases are
    provably divergence-exercising, not just big."""
    M = 1 << 64

    def wrap(x: int) -> int:
        x %= M
        return x - M if x >= (1 << 63) else x

    n = len(trail)
    s = wrap(sum(trail))
    ss = wrap(sum(wrap(t * t) for t in trail))
    dev = wrap(wrap(y * n) - s)
    var = wrap(wrap(n * ss) - wrap(s * s))
    return int(dev > 0 and wrap(dev * dev) > wrap(sigmas * sigmas * var))


# Two planted cases at per-day counts ~5e9-1e10 (beyond the BIGINT y*y
# wrap at 3.04e9), one in each direction: the true decision and the old
# wrapped decision DISAGREE, so this test was red before the promotion.
BIG_CASES = [
    # (trail days y0,y1,y2, scored-day y, true burst)
    ([5847159444, 5442907182, 5383560419], 8028321105, 1),
    ([7955692390, 7702350753, 5157271462], 10513072689, 0),
]


def test_burst_decimal_promotion_big_counts(spark):
    """VERDICT r11 item 4: dev² > σ²·(n·ss − s²) computed in raw BIGINT
    wraps silently at per-day counts ≳1e9; the DECIMAL(38,0) (Spark) /
    HUGEINT (DuckDB) promotion keeps the decision exact. Planted counts
    where wrap and truth disagree, checked on BOTH engines."""
    for trail, y, want in BIG_CASES:
        assert _true_burst(y, trail) == want
        # guard: the planted case genuinely exercises the divergence
        assert _wrapped_burst(y, trail) != want

    rows = []
    for i, (trail, y, _) in enumerate(BIG_CASES):
        t = f"type{i}"
        for d, v in enumerate(trail + [y]):
            rows.append((t, d, v))
    daily = spark.createDataFrame(
        rows, "event_type string, day bigint, y bigint"
    )
    got = {
        r.event_type: (r.burst, r.trail_sum, r.trail_sumsq)
        for r in BH.bursts_from_daily(daily, w=3, sigmas=3).collect()
    }
    for i, (trail, y, want) in enumerate(BIG_CASES):
        burst, trail_sum, trail_sumsq = got[f"type{i}"]
        assert burst == want, f"case {i}: spark burst {burst} != {want}"
        assert trail_sum == sum(trail)
        # Σy² ≈ 9e19 exceeds BIGINT: the diagnostic column is NULL (via
        # try_cast) on both engines, never a silent wrap
        assert trail_sumsq is None

    # DuckDB twin: identical scoring SQL over the same planted daily
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE daily (event_type VARCHAR, day BIGINT, y BIGINT)"
    )
    con.executemany("INSERT INTO daily VALUES (?, ?, ?)", rows)
    sql = "WITH " + BH.bursts_scoring_sql("daily", w=3, sigmas=3)
    duck = {
        r[0]: (r[5], r[3], r[4])
        for r in con.execute(sql).fetchall()
    }
    assert duck == got


def test_neyman_big_strata_decimal_promotion(spark):
    """r11 ADVICE: Σv² and N·Σv² − (Σv)² in raw BIGINT overflow on
    strata with char-mass ≳3e9 per doc (ANSI error in Spark, HUGEINT
    promotion in DuckDB — a crash-vs-answer divergence). Planted strata
    past the old edge must now produce the exact Python-int allocation
    on BOTH engines."""
    import math

    from bigdata_hwk_spark.operators import splits as SP

    # stratum "big": 3 docs × ~3.1e9 chars (Σv² ≈ 2.9e19 > 2^63);
    # stratum "small": ordinary sizes
    docs = [
        ("big", 3_100_000_000),
        ("big", 3_100_000_007),
        ("big", 2_999_999_999),
        ("small", 1000),
        ("small", 4000),
        ("small", 2500),
    ]
    total_n = 100

    # arbitrary-precision reference (same one-sqrt-then-floor device)
    strata: dict[str, list[int]] = {}
    for g, v in docs:
        strata.setdefault(g, []).append(v)
    wq = {}
    for g, vs in strata.items():
        n, s, ss = len(vs), sum(vs), sum(v * v for v in vs)
        assert g != "big" or ss > (1 << 63)  # guard: exercises the edge
        wq[g] = max(math.floor(math.sqrt(float(n * ss - s * s)) * 1e6), 1)
    w_total = sum(wq.values())
    base = {g: (total_n * q) // w_total for g, q in wq.items()}
    rem = {g: total_n * q - base[g] * w_total for g, q in wq.items()}
    leftover = total_n - sum(base.values())
    order = sorted(wq, key=lambda g: (-rem[g], g))
    want = {
        g: (len(strata[g]), wq[g], base[g] + (1 if i < leftover else 0))
        for i, g in enumerate(order)
    }

    df = spark.createDataFrame(docs, "lang string, n_chars bigint")
    got = {
        r.stratum: (r.n_docs, r.weight_q, r.alloc)
        for r in SP.neyman_stratified_allocation(df, total_n=total_n).collect()
    }
    assert got == want
    assert sum(a for _, _, a in got.values()) == total_n

    con = duckdb.connect()
    con.execute("CREATE TABLE documents (lang VARCHAR, n_chars BIGINT)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", docs)
    duck = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(
            SP.neyman_stratified_allocation_sql(total_n=total_n)
        ).fetchall()
    }
    assert duck == want


def test_lazy_greedy_escalation_carries_truth(spark):
    """r11 ADVICE: escalation (b *= 2) must not re-recompute candidates
    already recomputed earlier in the same round. On the planted
    tie-at-threshold fixture the escalating round recomputes doc 3 once
    (b=1) then ONLY doc 7 at b=2 — total 4 recomputes across all
    rounds, not the 5 the un-carried version paid."""
    from bigdata_hwk_spark.operators.select import (
        greedy_coverage_select,
        lazy_greedy_coverage_select,
    )

    texts = {
        2: "z1 z2 z3 z4 z5 z6 z7 z8",
        7: "a1 a2 a3 a4 a5",
        3: "b1 b2 b3 b4 b5",
        9: "c1 c2 c3",
    }
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id bigint, text string"
    )
    stats: dict = {}
    got = [
        tuple(r)
        for r in lazy_greedy_coverage_select(
            docs, k=5, w=3, probe_batch=1, stats=stats
        ).collect()
    ]
    want = [
        tuple(r) for r in greedy_coverage_select(docs, k=5, w=3).collect()
    ]
    assert got == want
    assert stats["escalations"] == 1
    # seeding round free; round 2 = {3} then {7 only}; rounds 3,4 = 1 each
    assert stats["recomputes"] == 4


def test_symmetric_edge_probe_rejects_one_direction_list(spark):
    """r11 ADVICE: hop_distances/kcore_members enforce (not assume) the
    symmetric-edge-list precondition via a sampled probe — a
    one-direction undirected list fails loudly instead of silently
    miscounting degrees / missing seeds."""
    from bigdata_hwk_spark.operators import graph as G

    one_way = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "src bigint, dst bigint"
    )
    sym = one_way.union(
        one_way.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    with pytest.raises(ValueError, match="not symmetric"):
        G.hop_distances(one_way, seed_mod=1, max_hops=2)
    with pytest.raises(ValueError, match="not symmetric"):
        G.kcore_members(one_way, k=1)

    # symmetric lists pass the probe and still compute correctly
    hops = {
        r.part_id: r.hops
        for r in G.hop_distances(sym, seed_mod=2, max_hops=3).collect()
    }
    assert hops == {2: 0, 4: 0, 1: 1, 3: 1}
    core = {
        r.part_id: r.core_degree
        for r in G.kcore_members(sym, k=1).collect()
    }
    assert core == {1: 1, 2: 2, 3: 2, 4: 1}


def test_burst_fixture_rows_unchanged_by_promotion(spark):
    """The promotion is value-neutral at fixture scale: the hand case
    from test_event_type_bursts_hand_case still holds bit-for-bit."""
    rows = []
    for d, n in [(0, 10), (1, 10), (2, 10), (3, 10), (4, 11), (5, 40)]:
        rows.extend([(d * 86400 + i, "a") for i in range(n)])
    df = spark.createDataFrame(
        rows, "epoch bigint, event_type string"
    ).select(F.col("epoch").cast("timestamp").alias("ts"), "event_type")
    got = {
        r.day: (r.y, r.trail_sum, r.trail_sumsq, r.burst)
        for r in BH.event_type_bursts(df, w=3, sigmas=3).collect()
    }
    assert got == {
        3: (10, 30, 300, 0),
        4: (11, 30, 300, 1),
        5: (40, 31, 321, 1),
    }
