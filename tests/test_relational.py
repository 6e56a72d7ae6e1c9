"""Slice 5 correctness: relational surface vs DuckDB oracles."""

from __future__ import annotations

import pytest

from bigdata_hwk_spark import registry

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
