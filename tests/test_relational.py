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
