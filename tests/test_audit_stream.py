"""Incremental (streaming) constraint audit: additive constraints equal
the batch audit exactly under any chunking; the uniqueness sketch's
merged registers equal the one-shot batch registers bit-for-bit; the
HLL duplicate estimate sits inside its documented error envelope."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_hwk_spark.operators import audit as AU
from bigdata_hwk_spark.operators.sketches import hll_registers
from bigdata_hwk_spark.sources.tables import load_table
from bigdata_hwk_spark.streaming import audit_stream as AS
from tests.conftest import SF_SMOKE


@pytest.fixture()
def li_files(spark, tmp_path):
    """sf0.001 lineitem split into 4 parquet files (one micro-batch
    each), plus the orders dim."""
    li = load_table(spark, SF_SMOKE, "lineitem")
    src = str(tmp_path / "src")
    li.repartition(4).write.parquet(src)
    return li, load_table(spark, SF_SMOKE, "orders"), src


def _run(spark, tmp_path, src, orders, tag):
    counts = str(tmp_path / f"counts_{tag}")
    regs = str(tmp_path / f"regs_{tag}")
    AS.run_audit_stream(spark, src, orders, counts, regs)
    return AS.audit_stream_result(spark, counts, regs)


def test_additive_constraints_equal_batch_audit(spark, tmp_path, li_files):
    li, orders, src = li_files
    got = {
        r["constraint"]: r
        for r in _run(spark, tmp_path, src, orders, "a").collect()
    }
    want = {
        r["constraint"]: r["violations"]
        for r in AU.lineitem_constraint_audit(li, orders).collect()
    }
    for name, _ in AU.LINEITEM_ROW_CHECKS:
        assert got[name]["violations"] == want[name], name
        assert got[name]["exact"] is True
    assert (
        got["fk_orderkey_in_orders"]["violations"]
        == want["fk_orderkey_in_orders"]
    )


def test_merged_registers_equal_batch_registers(spark, tmp_path, li_files):
    li, orders, src = li_files
    counts = str(tmp_path / "counts_r")
    regs = str(tmp_path / "regs_r")
    AS.run_audit_stream(spark, src, orders, counts, regs)
    streamed = {
        (r["bucket"], r["max_rho"])
        for r in AS.merged_registers(spark, regs).collect()
    }
    batch = {
        (r["bucket"], r["max_rho"])
        for r in hll_registers(
            li.select(AS._pk_item().alias("item")), "item"
        ).collect()
    }
    assert streamed == batch


def test_result_is_chunking_invariant(spark, tmp_path, li_files):
    li, orders, src2dir = li_files
    # a second chunking: 2 files instead of 4
    src2 = str(tmp_path / "src2")
    li.repartition(2).write.parquet(src2)
    a = [
        tuple(r)
        for r in _run(spark, tmp_path, src2dir, orders, "c4").collect()
    ]
    b = [tuple(r) for r in _run(spark, tmp_path, src2, orders, "c2").collect()]
    assert a == b


def test_uniqueness_estimate_within_hll_envelope(spark, tmp_path, li_files):
    li, orders, src = li_files
    got = {
        r["constraint"]: r
        for r in _run(spark, tmp_path, src, orders, "u").collect()
    }
    row = got[AS.UNIQUE_APPROX]
    assert row["exact"] is False
    n = li.count()
    n_distinct = li.select(*AU.LINEITEM_KEY).distinct().count()
    true_dups = n - n_distinct
    # p=5 -> ~18% rel err on the distinct estimate; allow a loose 3-sigma
    # envelope on the implied duplicate count
    slack = int(0.6 * n_distinct) + 1
    assert abs(row["violations"] - true_dups) <= slack


def test_rerun_over_same_sinks_is_idempotent(spark, tmp_path, li_files):
    """Epoch-keyed overwrite partials: replaying the SAME source into the
    SAME sinks twice (epoch numbering restarts at 0) must leave the final
    result unchanged — the retry/restart discipline additive state
    requires. An append-mode sink would double every violation count."""
    li, orders, src = li_files
    counts = str(tmp_path / "counts_i")
    regs = str(tmp_path / "regs_i")
    AS.run_audit_stream(spark, src, orders, counts, regs)
    first = [
        tuple(r)
        for r in AS.audit_stream_result(spark, counts, regs).collect()
    ]
    AS.run_audit_stream(spark, src, orders, counts, regs)
    second = [
        tuple(r)
        for r in AS.audit_stream_result(spark, counts, regs).collect()
    ]
    assert first == second
