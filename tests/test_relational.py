"""Slice 5 correctness: relational surface vs DuckDB oracles."""

from __future__ import annotations

import pytest

from bigdata_hwk_spark import registry
from pyspark.sql import functions as F

from .conftest import SF_CORRECT, SF_SMOKE, assert_matches_oracle

RELATIONAL = [
    "tpch_q1",
    "top_customers_by_revenue",
    "orders_with_heavy_items",
    "customers_without_orders",
    "revenue_by_region",
    "top_orders_per_customer",
    "user_sessions",
    "event_props_stats",
    "nations_with_both",
    "lineitem_rollup",
    # the designated gate-window overflow query: its driver correctness row
    # is sacrificed (50-row cap), so pytest carries its oracle check
    "lineitem_cube",
    "purchase_attribution",
    "disjunctive_promo_revenue",
    "wealthy_inactive_customers",
    "conversion_funnel",
    "user_event_pivot",
    "user_event_unpivot",
    "event_props_variant",
    "top_suppliers_by_revenue",
    "events_rolling_value",
    "windowed_counts_gapfilled",
    "user_sessions_native",
    "salted_segment_value",
]


@pytest.mark.parametrize("name", RELATIONAL)
def test_relational_oracle_smoke(spark, name):
    assert_matches_oracle(
        registry.QUERIES[name](spark, SF_SMOKE), registry.ORACLES[name], SF_SMOKE
    )


@pytest.mark.parametrize("name", RELATIONAL)
def test_relational_oracle_sf001(spark, name):
    assert_matches_oracle(
        registry.QUERIES[name](spark, SF_CORRECT), registry.ORACLES[name], SF_CORRECT
    )


def test_region_join_is_broadcast(spark):
    """Dimension joins must broadcast — no shuffle of the fact side."""
    plan = (
        registry.QUERIES["revenue_by_region"](spark, SF_SMOKE)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


def test_disjunctive_join_is_hash_not_nested_loop(spark):
    """An OR-of-ANDs join condition spanning both sides must still plan as
    a broadcast hash join on the extracted common equi-key (l_partkey =
    p_partkey), with the disjunction as a residual — never a nested loop
    over the fact side."""
    plan = (
        registry.QUERIES["disjunctive_promo_revenue"](spark, SF_SMOKE)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_scalar_subquery_is_planned_once(spark):
    """The Q22-style balance threshold must plan as a Catalyst scalar
    subquery (one independent 1-row aggregate stage), not a per-row
    re-evaluation or a rewritten cross join of the full table."""
    plan = (
        registry.QUERIES["wealthy_inactive_customers"](spark, SF_SMOKE)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Subquery" in plan or "subquery" in plan
    # anti join present for the NOT EXISTS
    assert "LeftAnti" in plan


def test_funnel_windows_share_one_exchange(spark):
    """The three chained conditional-min windows all partition by user_id,
    so the whole funnel must plan exactly ONE hash-partitioning exchange
    on user_id (Catalyst reuses the partitioning across window passes and
    the per-user aggregation)."""
    plan = (
        registry.QUERIES["conversion_funnel"](spark, SF_SMOKE)
        ._jdf.queryExecution().executedPlan().toString()
    )
    import re

    n_user_exchanges = len(
        re.findall(r"Exchange hashpartitioning\(user_id", plan)
    )
    assert n_user_exchanges == 1, plan


def test_funnel_ordered_semantics_planted(spark):
    """Planted sequences: out-of-order stages must NOT count — a purchase
    before the first view-then-click chain is not a conversion."""
    from bigdata_hwk_spark.plans.relational import conversion_funnel
    import bigdata_hwk_spark.sources.tables as T

    rows = [
        # u1: full ordered funnel
        (1, "2024-01-01 10:00:00", "view"),
        (1, "2024-01-01 10:05:00", "click"),
        (1, "2024-01-01 10:10:00", "purchase"),
        # u2: purchase BEFORE click → stages 1-2 only
        (2, "2024-01-01 10:00:00", "view"),
        (2, "2024-01-01 10:01:00", "purchase"),
        (2, "2024-01-01 10:02:00", "click"),
        # u3: click before any view → stage 1 only
        (3, "2024-01-01 10:00:00", "click"),
        (3, "2024-01-01 10:01:00", "view"),
        # u4: never viewed → no stage
        (4, "2024-01-01 10:00:00", "purchase"),
    ]
    ev = spark.createDataFrame(
        [(u, ts, et) for u, ts, et in rows],
        "user_id bigint, ts string, event_type string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    import unittest.mock as mock

    with mock.patch.object(T, "load_table", return_value=ev):
        from bigdata_hwk_spark.plans import relational as R

        with mock.patch.object(R, "load_table", return_value=ev):
            out = conversion_funnel(spark, "unused").collect()[0]
    assert (out.n_viewed, out.n_clicked_after_view, out.n_purchased_after_click) == (
        3,
        2,
        1,
    )


def test_sqltext_and_salted_match_oracles(spark):
    for name in ("shipping_priority_sqltext", "salted_item_counts"):
        assert_matches_oracle(
            registry.QUERIES[name](spark, SF_CORRECT),
            registry.ORACLES[name],
            SF_CORRECT,
        )


def test_salted_agg_has_two_aggregate_phases(spark):
    """The salted plan must contain the salt-key pre-aggregation (four
    HashAggregate nodes: partial+final per phase)."""
    plan = (
        registry.QUERIES["salted_item_counts"](spark, SF_SMOKE)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("HashAggregate") >= 4


def test_approx_event_stats_error_bounds(spark):
    """Sketch answers must land near the exact ones: HLL++ within 3·rsd,
    approx percentiles within the value range's coarse tolerance."""
    from bigdata_hwk_spark.sources.tables import load_table

    row = registry.QUERIES["approx_event_stats"](spark, SF_CORRECT).collect()[0]
    ev = load_table(spark, SF_CORRECT, "events")
    import pyspark.sql.functions as F

    exact = ev.agg(
        F.countDistinct("user_id").alias("users"),
        F.expr("percentile(value, 0.5)").alias("p50"),
        F.expr("percentile(value, 0.95)").alias("p95"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    assert row.n_events == exact.n
    assert abs(row.approx_users - exact.users) <= max(3, 0.06 * exact.users)
    assert abs(row.p50_value - exact.p50) <= 0.05 * (abs(exact.p95) + 1)
    assert abs(row.p95_value - exact.p95) <= 0.05 * (abs(exact.p95) + 1)


def test_bucketed_join_is_colocated_no_exchange(spark, tmp_path):
    """Bucketing both join sides on the key pre-partitions the data at
    write time, so the sort-merge join needs NO Exchange — the co-location
    strategy for repeated fact-to-fact joins at scale."""
    from bigdata_hwk_spark.sources.tables import load_table

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = load_table(spark, SF_SMOKE, "orders")
        li = load_table(spark, SF_SMOKE, "lineitem")
        loc = f"file://{tmp_path}/wh"
        spark.sql(f"CREATE DATABASE IF NOT EXISTS bkt LOCATION '{loc}'")
        for df, name, key in ((orders, "orders_b", "o_orderkey"),
                              (li, "lineitem_b", "l_orderkey")):
            (df.write.bucketBy(8, key).sortBy(key)
               .mode("overwrite").saveAsTable(f"bkt.{name}"))
        joined = spark.table("bkt.orders_b").join(
            spark.table("bkt.lineitem_b"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        ).groupBy("o_orderpriority").count()
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        join_part = plan[: plan.find("HashAggregate")] if "HashAggregate" in plan else plan
        assert "SortMergeJoin" in plan
        # the join inputs must come straight from the bucketed scans
        assert "Exchange hashpartitioning" not in join_part
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP DATABASE IF EXISTS bkt CASCADE")


def test_text_ops_prune_document_columns(spark):
    """Projection pushdown: text operators must scan only (doc_id, text),
    never the full documents schema."""
    plan = (
        registry.QUERIES["text_token_stats"](spark, SF_SMOKE)
        ._jdf.queryExecution().executedPlan().toString()
    )
    import re

    schemas = set(re.findall(r"ReadSchema: (struct<[^>]*>)", plan))
    assert schemas, "no parquet scan found"
    for s in schemas:
        assert "lang" not in s and "source" not in s, s


def test_asof_join_matches_duckdb_asof(spark):
    """The union+window as-of rewrite must equal DuckDB's native ASOF JOIN
    (inclusive boundary, NULL on no-match) — and must plan a single hash
    shuffle, not a nested-loop range join."""
    for sf in (SF_SMOKE, SF_CORRECT):
        assert_matches_oracle(
            registry.QUERIES["events_last_click_asof"](spark, sf),
            registry.ORACLES["events_last_click_asof"],
            sf,
        )
    plan = (
        registry.QUERIES["events_last_click_asof"](spark, SF_SMOKE)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_asof_join_tie_determinism(spark):
    """Right rows tied on (key, right_time) with DIFFERENT values must
    resolve deterministically: the greatest value tuple wins (tertiary
    sort key), identically across repeated runs and partitionings."""
    from bigdata_hwk_spark.plans.relational import asof_join

    left = spark.createDataFrame(
        [(1, 10), (1, 5), (2, 10)], "k int, t int"
    )
    right_rows = [(1, 10, "b"), (1, 10, "a"), (1, 10, "c"), (2, 3, "z"), (2, 3, "y")]
    for nparts in (1, 3, 7):
        right = spark.createDataFrame(
            right_rows, "k int, rt int, v string"
        ).repartition(nparts)
        got = {
            (r.k, r.t): r.asof_v
            for r in asof_join(left, right, "k", "t", "rt", ["v"]).collect()
        }
        assert got == {(1, 10): "c", (1, 5): None, (2, 10): "z"}


def test_purchase_attribution_known_values(spark):
    """Clicks inside the 7-day lookback count; older or later ones don't;
    purchases with no clicks survive the left join with a zero count."""
    from bigdata_hwk_spark.plans import relational as R

    rows = [
        # user 1: purchase at day 10; clicks at day 9 (in), day 10 (in,
        # same instant), day 2 (out: > 7 days before), day 11 (out: after)
        (1, 1, "2024-01-10 12:00:00", "purchase"),
        (2, 1, "2024-01-09 12:00:00", "click"),
        (3, 1, "2024-01-10 12:00:00", "click"),
        (4, 1, "2024-01-02 12:00:00", "click"),
        (5, 1, "2024-01-11 12:00:00", "click"),
        # user 2: purchase with no clicks at all
        (6, 2, "2024-01-05 00:00:00", "purchase"),
        # user 3: clicks only — no purchase row comes out
        (7, 3, "2024-01-05 00:00:00", "click"),
    ]
    import datetime as dt

    ev = spark.createDataFrame(
        [
            (eid, uid, dt.datetime.fromisoformat(ts), et, 0.0, "{}")
            for eid, uid, ts, et in rows
        ],
        "event_id bigint, user_id bigint, ts timestamp, event_type string, "
        "value double, props string",
    )
    import bigdata_hwk_spark.sources.tables as T

    orig = T.load_table
    try:
        T.load_table = lambda spark_, sf_, name_: ev
        R.load_table = T.load_table
        got = {r.event_id: r for r in R.purchase_attribution(spark, "ignored").collect()}
    finally:
        T.load_table = orig
        R.load_table = orig
    assert set(got) == {1, 6}
    assert got[1].n_clicks_7d == 2
    assert got[1].last_click_ts == dt.datetime.fromisoformat("2024-01-10 12:00:00")
    assert got[6].n_clicks_7d == 0 and got[6].last_click_ts is None


def test_purchase_attribution_plan_is_keyed_join(spark):
    """The interval join must plan as a join keyed on user_id (hash or
    sort-merge), never a nested-loop/cartesian over purchases x clicks."""
    from bigdata_hwk_spark.plans import relational as R

    plan = (
        R.purchase_attribution(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_join_strategy_hints_honored(spark):
    """The engine's join-strategy controls must reach the physical plan:
    `merge` → SortMergeJoin, `shuffle_hash` → ShuffledHashJoin (with
    auto-broadcast off so the planner can't shortcut either) — the knobs
    a 100 TB deployment turns when the stats-based default picks wrong
    (e.g. forcing shuffle-hash when one side is modest but above the
    broadcast threshold, sparing both sides the sort)."""
    from bigdata_hwk_spark.sources.tables import load_table

    li = load_table(spark, SF_SMOKE, "lineitem")
    orders = load_table(spark, SF_SMOKE, "orders")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        merge_plan = (
            li.hint("merge")
            .join(orders, li.l_orderkey == orders.o_orderkey)
            ._jdf.queryExecution().executedPlan().toString()
        )
        hash_plan = (
            li.hint("shuffle_hash")
            .join(orders, li.l_orderkey == orders.o_orderkey)
            ._jdf.queryExecution().executedPlan().toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in merge_plan
    assert "ShuffledHashJoin" in hash_plan


def test_native_session_window_exact_gap_boundary(spark):
    """Planted exact-gap boundary: two events EXACTLY SESSION_GAP apart must
    land in ONE session under Spark's native session_window (touching
    [start, last+gap) spans merge — verified here, not assumed), which is
    the same rule as the cumsum twin's strict `gap >` new-session flag and
    the rule USER_SESSIONS_NATIVE_SQL's oracle now encodes. A gap one
    second past the boundary must split into two sessions."""
    from datetime import datetime

    from bigdata_hwk_spark.plans.relational import SESSION_GAP_MIN

    t0 = datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        # user A: second event exactly gap after the first → ONE session
        ("a", t0),
        ("a", datetime(2024, 1, 1, 10 + SESSION_GAP_MIN // 60,
                       SESSION_GAP_MIN % 60, 0)),
        # user B: gap + 1s → TWO sessions
        ("b", t0),
        ("b", datetime(2024, 1, 1, 10 + SESSION_GAP_MIN // 60,
                       SESSION_GAP_MIN % 60, 1)),
    ]
    ev = spark.createDataFrame(rows, "user_id string, ts timestamp")
    native = (
        ev.groupBy(
            F.session_window("ts", f"{SESSION_GAP_MIN} minutes").alias("w"),
            "user_id",
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", "n_events")
        .collect()
    )
    by_user = {}
    for r in native:
        by_user.setdefault(r.user_id, []).append(r.n_events)
    assert by_user["a"] == [2], f"exact-gap events must merge: {by_user}"
    assert sorted(by_user["b"]) == [1, 1], f"gap+1s must split: {by_user}"

    # the cumsum twin (strict >) agrees on both planted users
    w = __import__("pyspark.sql.window", fromlist=["Window"]).Window.partitionBy(
        "user_id"
    ).orderBy("ts")
    gap_us = SESSION_GAP_MIN * 60 * 1_000_000
    tus = F.unix_micros(F.col("ts"))
    twin = (
        ev.withColumn(
            "new_sess",
            F.when(
                (tus - F.lag(tus).over(w)).isNull()
                | (tus - F.lag(tus).over(w) > gap_us),
                1,
            ).otherwise(0),
        )
        .groupBy("user_id")
        .agg(F.sum("new_sess").alias("n_sessions"))
        .collect()
    )
    twin_map = {r.user_id: r.n_sessions for r in twin}
    assert twin_map == {"a": 1, "b": 2}


def test_scd2_invariants_and_known_values(spark):
    """SCD2 history invariants on the fixture log: per key, intervals
    chain exactly (valid_to == next valid_from), exactly one open
    (is_current) row, run event counts conserve the log, and consecutive
    states actually differ (maximal runs). Plus a hand-checked log."""
    from datetime import datetime

    from bigdata_hwk_spark.plans.relational import scd2_from_events
    from bigdata_hwk_spark.sources.tables import load_table

    hist = scd2_from_events(load_table(spark, SF_SMOKE, "events")).collect()
    by_key = {}
    for r in hist:
        by_key.setdefault(r.user_id, []).append(r)
    n_events_log = load_table(spark, SF_SMOKE, "events").count()
    assert sum(r.n_events for r in hist) == n_events_log
    for rows in by_key.values():
        rows.sort(key=lambda r: r.valid_from)
        assert sum(1 for r in rows if r.is_current) == 1
        assert rows[-1].is_current and rows[-1].valid_to is None
        for a, b in zip(rows, rows[1:]):
            assert a.valid_to == b.valid_from  # intervals chain half-open
            assert a.state != b.state  # runs are maximal

    t = lambda m: datetime(2024, 1, 1, 10, m)
    log = spark.createDataFrame(
        [
            (1, "view", t(0), 100),
            (1, "view", t(1), 101),
            (1, "click", t(2), 102),
            (1, "view", t(3), 103),
            (2, "buy", t(0), 200),
        ],
        "user_id bigint, event_type string, ts timestamp, event_id bigint",
    )
    got = {
        (r.user_id, r.state, r.valid_from, r.valid_to, r.is_current, r.n_events)
        for r in scd2_from_events(log).collect()
    }
    assert got == {
        (1, "view", t(0), t(2), False, 2),
        (1, "click", t(2), t(3), False, 1),
        (1, "view", t(3), None, True, 1),
        (2, "buy", t(0), None, True, 1),
    }


def test_interval_overlap_join_exact_and_hash_planned(spark):
    """The bin-bucketed interval join must (1) emit exactly the brute-force
    overlap pair set, each pair ONCE (first-shared-bin dedup, no
    distinct), including intervals spanning many bins and bin-boundary
    touches, and (2) plan as a hash join on the bin — never a nested
    loop. The registry query must return a non-trivial pair set."""
    from bigdata_hwk_spark.plans.relational import interval_overlap_join

    a = spark.createDataFrame(
        [(1, 0.0, 10.0), (2, 5.0, 6.0), (3, 40.0, 90.0), (4, 100.0, 100.0)],
        "a_id bigint, a_lo double, a_hi double",
    )
    b = spark.createDataFrame(
        [(10, 9.0, 12.0), (11, 0.0, 200.0), (12, 91.0, 99.0), (13, 100.0, 150.0)],
        "b_id bigint, b_lo double, b_hi double",
    )
    got = sorted(
        (r.a_id, r.b_id)
        for r in interval_overlap_join(
            a, b, "a_lo", "a_hi", "b_lo", "b_hi", bin_width=7.0
        ).collect()
    )
    brute = sorted(
        (ra.a_id, rb.b_id)
        for ra in a.collect()
        for rb in b.collect()
        if ra.a_lo <= rb.b_hi and rb.b_lo <= ra.a_hi
    )
    assert got == brute  # exactly once, incl. the (4,13) point-touch pair
    assert (4, 13) in got and (1, 10) in got and (3, 11) in got

    plan = (
        registry.QUERIES["concurrent_view_purchase_windows"](spark, SF_CORRECT)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    n = registry.QUERIES["concurrent_view_purchase_windows"](
        spark, SF_CORRECT
    ).count()
    assert n > 50, n


def test_interval_overlap_join_invariant_to_bin_width(spark):
    """The bin width is a performance knob, never a semantics knob: any
    width must yield the identical pair set (incl. widths far larger and
    far smaller than the intervals)."""
    import random

    from bigdata_hwk_spark.plans.relational import interval_overlap_join

    rng = random.Random(11)
    mk = lambda n, pre: [
        (i, (lo := rng.uniform(0, 500)), lo + rng.uniform(0, 60))
        for i in range(n)
    ]
    a = spark.createDataFrame(mk(40, "a"), "a_id bigint, a_lo double, a_hi double")
    b = spark.createDataFrame(mk(40, "b"), "b_id bigint, b_lo double, b_hi double")
    results = {
        w: sorted(
            (r.a_id, r.b_id)
            for r in interval_overlap_join(
                a, b, "a_lo", "a_hi", "b_lo", "b_hi", bin_width=w
            ).collect()
        )
        for w in (3.0, 37.0, 1000.0)
    }
    assert results[3.0] == results[37.0] == results[1000.0]
    assert results[3.0]  # non-vacuous


def test_scd2_matches_python_model_random_logs(spark):
    """Randomized logs vs a sequential python run-length model."""
    import random
    from datetime import datetime, timedelta

    from bigdata_hwk_spark.plans.relational import scd2_from_events

    rng = random.Random(23)
    rows = []
    eid = 0
    for u in range(12):
        t = datetime(2024, 1, 1)
        for _ in range(rng.randrange(1, 25)):
            t += timedelta(minutes=rng.randrange(1, 300))
            rows.append((u, rng.choice("abc"), t, eid))
            eid += 1
    ev = spark.createDataFrame(
        rows, "user_id bigint, event_type string, ts timestamp, event_id bigint"
    )
    got = sorted(
        (r.user_id, r.state, r.valid_from, r.valid_to, r.is_current, r.n_events)
        for r in scd2_from_events(ev).collect()
    )
    model = []
    by_user = {}
    for u, st, t, _ in sorted(rows, key=lambda r: (r[0], r[2], r[3])):
        by_user.setdefault(u, []).append((st, t))
    for u, seq in by_user.items():
        runs = []
        for st, t in seq:
            if runs and runs[-1][0] == st:
                runs[-1][2] += 1
            else:
                runs.append([st, t, 1])
        for i, (st, t0, n) in enumerate(runs):
            nxt = runs[i + 1][1] if i + 1 < len(runs) else None
            model.append((u, st, t0, nxt, nxt is None, n))
    assert got == sorted(model)
