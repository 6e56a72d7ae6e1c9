"""Deequ-style constraint audit: oracle parity, hand-computed known
values on a doctored table, one-scan plan shape, empty-table edge."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_hwk_spark.operators import audit as AU
from bigdata_hwk_spark.sources.tables import load_table
from tests.conftest import SF_CORRECT, SF_SMOKE, assert_matches_oracle


def _audit(spark, sf_dir):
    return AU.lineitem_constraint_audit(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
    )


def test_audit_matches_oracle_smoke(spark):
    assert_matches_oracle(
        _audit(spark, SF_SMOKE), AU.lineitem_constraint_audit_sql(), SF_SMOKE
    )


def test_audit_matches_oracle_gate_sf(spark):
    assert_matches_oracle(
        _audit(spark, SF_CORRECT),
        AU.lineitem_constraint_audit_sql(),
        SF_CORRECT,
    )


def test_audit_reports_fixture_duplicate_keys(spark):
    """The synthetic fixture genuinely has duplicate (orderkey,
    linenumber) pairs — the audit must REPORT that, not assume TPC-H
    shape (round-8 lesson as an operator contract)."""
    rows = {r["constraint"]: r for r in _audit(spark, SF_CORRECT).collect()}
    li = load_table(spark, SF_CORRECT, "lineitem")
    n = li.count()
    nkey = li.select(*AU.LINEITEM_KEY).distinct().count()
    dup = rows["unique_orderkey_linenumber"]
    assert dup["violations"] == n - nkey and n > nkey
    assert dup["passed"] is False
    # and the fixture's clean constraints come back clean
    assert rows["fk_orderkey_in_orders"]["violations"] == 0
    assert rows["complete_orderkey"]["passed"] is True


def test_audit_known_values_on_doctored_table(spark):
    """Every constraint fails at least once, with an exact hand count."""
    li = spark.createDataFrame(
        [
            # orderkey, partkey, suppkey, linenum, qty, price, disc, tax,
            # rflag, lstatus, shipdate
            (1, 1, 1, 1, 5.0, 100.0, 0.05, 0.0, "A", "O", "2024-01-01"),
            (1, 1, 1, 1, 5.0, 100.0, 0.05, 0.0, "A", "O", "2024-01-01"),
            (2, 1, 1, 1, 0.0, 100.0, 0.05, 0.0, "N", "F", "2024-01-01"),
            (3, 1, 1, 1, 5.0, -1.0, 0.2, 0.0, "X", "Z", "2024-01-01"),
            (None, 1, 1, 2, 99.0, 100.0, -0.1, 0.0, None, "O", None),
            (9, 1, 1, 1, 5.0, 100.0, 0.05, 0.0, "R", "F", "2024-01-01"),
        ],
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate string",
    ).withColumn("l_shipdate", F.col("l_shipdate").cast("timestamp"))
    orders = spark.createDataFrame(
        [(1,), (2,), (3,)], "o_orderkey bigint"
    )
    got = {
        r["constraint"]: r["violations"]
        for r in AU.lineitem_constraint_audit(li, orders).collect()
    }
    assert got == {
        "complete_orderkey": 1,
        "complete_returnflag": 1,
        "complete_shipdate": 1,
        "range_quantity_1_50": 2,  # 0.0 and 99.0
        "range_discount_0_0p1": 2,  # 0.2 and -0.1
        "nonnegative_extendedprice": 1,
        "returnflag_domain": 1,  # 'X' (NULL counts as incomplete, not domain)
        "linestatus_domain": 1,  # 'Z'
        "unique_orderkey_linenumber": 1,  # the doubled (1, 1) key
        "fk_orderkey_in_orders": 2,  # orderkey 9 and the NULL key
    }


def test_audit_empty_table_violates_nothing(spark):
    li = spark.createDataFrame(
        [],
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp",
    )
    orders = spark.createDataFrame([(1,)], "o_orderkey bigint")
    rows = AU.lineitem_constraint_audit(li, orders).collect()
    assert len(rows) == len(AU.LINEITEM_ROW_CHECKS) + 2
    assert all(r["violations"] == 0 and r["passed"] for r in rows)


def test_audit_row_checks_share_one_scan(spark):
    """All row-local constraints + key uniqueness compile into a single
    aggregate over ONE lineitem scan; only the FK check may add a second
    scan. Plan-shape pin for the Deequ one-pass claim."""
    plan = _audit(spark, SF_SMOKE)._jdf.queryExecution().optimizedPlan().toString()
    # the lineitem relation appears at most twice (one-pass agg + FK side)
    assert plan.count("lineitem.parquet") <= 2
