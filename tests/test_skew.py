"""Planted hot-key skew hardening (VERDICT r5 #4): one user owning 20% of
all events at sf0.1 — the shape AQE's skew-join splitting and the
window-per-user contract must absorb without a correctness or
completion regression.

The hot key multiplies the attribution interval join's intermediate
(~4k purchases × ~4k clicks ≈ 16M pairs for the hot user alone) and
concentrates one sessionization window; both must complete and agree
with independently-computed expectations.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_hwk_spark.plans.relational import attribute_purchases, sessionize_events
from bigdata_hwk_spark.sources.tables import load_table

SF_BENCH = "/root/testdata/sf0.1"
HOT_USER = 999_999_999


def _skewed_events(spark):
    ev = load_table(spark, SF_BENCH, "events")
    return ev.withColumn(
        "user_id",
        F.when(F.col("event_id") % 5 == 0, F.lit(HOT_USER)).otherwise(
            F.col("user_id")
        ),
    )


def test_session_config_arms_skew_machinery(spark):
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"


def test_sessionize_hot_user_completes_and_conserves_events(spark):
    skewed = _skewed_events(spark)
    sess = sessionize_events(skewed)
    total = sess.agg(F.sum("n_events").alias("n")).collect()[0].n
    assert total == skewed.count()  # every event lands in exactly one session
    hot = sess.filter(F.col("user_id") == HOT_USER).agg(
        F.sum("n_events").alias("n"), F.count(F.lit(1)).alias("s")
    ).collect()[0]
    assert hot.n == skewed.filter(F.col("event_id") % 5 == 0).count()
    assert hot.s >= 1


def test_attribution_hot_user_completes_and_is_correct(spark):
    skewed = _skewed_events(spark).select("event_id", "user_id", "ts", "event_type")
    attr = attribute_purchases(skewed)
    n_purchases = skewed.filter(F.col("event_type") == "purchase").count()
    assert attr.count() == n_purchases  # one output row per purchase, hot or not

    # hot-user spot check against an independent aggregate: every hot
    # purchase must count clicks in (purchase_ts - 7d, purchase_ts] of the
    # hot user's click stream
    hot_rows = attr.filter(F.col("user_id") == HOT_USER)
    clicks = skewed.filter(
        (F.col("event_type") == "click") & (F.col("user_id") == HOT_USER)
    ).select(F.col("ts").alias("click_ts"))
    n_hot_clicks = clicks.count()
    assert n_hot_clicks > 1000  # the planted key is genuinely hot
    # total attributed clicks over hot purchases == sum over purchases of
    # in-window clicks; verify on a 50-purchase sample exactly
    sample = hot_rows.orderBy("event_id").limit(50).collect()
    click_list = sorted(r.click_ts for r in clicks.collect())
    import bisect
    import datetime as dt

    for r in sample:
        lo = bisect.bisect_left(click_list, r.purchase_ts - dt.timedelta(days=7))
        hi = bisect.bisect_right(click_list, r.purchase_ts)
        assert r.n_clicks_7d == hi - lo, r
        if hi - lo:
            assert r.last_click_ts == click_list[hi - 1]
        else:
            assert r.last_click_ts is None


def test_funnel_hot_user_matches_independent_model(spark):
    """The ordered funnel's chained windows concentrate the hot user's
    entire event history in one window partition; the query must complete
    and agree with a driver-side model of the same rule over the same
    (first-day) slice."""
    from bigdata_hwk_spark.plans.relational import FUNNEL_END, conversion_funnel
    import bigdata_hwk_spark.plans.relational as R
    import unittest.mock as mock

    skewed = _skewed_events(spark)
    with mock.patch.object(R, "load_table", return_value=skewed):
        out = conversion_funnel(spark, "unused").collect()[0]

    rows = (
        skewed.filter(F.col("ts") < F.lit(FUNNEL_END).cast("timestamp"))
        .select("user_id", "ts", "event_type")
        .collect()
    )
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append((r.ts, r.event_type))
    n1 = n2 = n3 = 0
    for evs in by_user.values():
        evs.sort()
        t1 = min((t for t, e in evs if e == "view"), default=None)
        if t1 is None:
            continue
        n1 += 1
        t2 = min((t for t, e in evs if e == "click" and t > t1), default=None)
        if t2 is None:
            continue
        n2 += 1
        if any(e == "purchase" and t > t2 for t, e in evs):
            n3 += 1
    assert (out.n_viewed, out.n_clicked_after_view, out.n_purchased_after_click) == (
        n1,
        n2,
        n3,
    )
    # the planted key is genuinely hot inside the funnel horizon
    assert any(u == HOT_USER for u in by_user) and len(by_user[HOT_USER]) > 100


def test_salted_join_equals_plain_join_and_splits_hot_key(spark):
    """salted_join must (1) produce exactly the plain join's rows, (2)
    plan as a ShuffledHashJoin whose keys include the salt column (under
    a broadcast the fact never shuffles and salting is pointless), and
    (3) spread a planted hot key across all salt values, so no single
    reducer owns the hot key's fan-in."""
    from bigdata_hwk_spark.plans.relational import SALT_BUCKETS, salted_join

    skewed = _skewed_events(spark).limit(50_000)
    cust = load_table(spark, SF_BENCH, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    # give the hot user a dim row so its fan-in actually joins
    hot_dim = cust.sparkSession.createDataFrame(
        [(HOT_USER, "HOTSEG")], "c_custkey bigint, c_mktsegment string"
    )
    dim = cust.unionByName(hot_dim)

    salted = salted_join(skewed, dim, "user_id", "c_custkey", "event_id")
    plain = skewed.join(dim, skewed.user_id == dim.c_custkey)
    key = lambda r: (r.event_id, r.c_custkey)
    assert sorted(map(key, salted.collect())) == sorted(map(key, plain.collect()))

    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan and "__salt" in plan
    assert "BroadcastHashJoin" not in plan

    # the hot key's fact rows hash across every salt bucket
    salts = (
        skewed.filter(F.col("user_id") == HOT_USER)
        .select(F.pmod(F.col("event_id"), F.lit(SALT_BUCKETS)).alias("s"))
        .distinct()
        .count()
    )
    assert salts == SALT_BUCKETS
