"""Skyline (Pareto-frontier) operators.

Extension surface (no reference counterpart): the skyline — rows not
dominated by any other row across several criteria — is the classic
multi-objective selection operator (Börzsönyi, Kossmann & Stocker, ICDE
2001, public). In a curation pipeline it is the "best tradeoff" picker:
quality-vs-length document selection, cost-vs-recall config sweeps,
price-vs-size catalog fronts.

Two implementations, matched to dimensionality:

* **2-D** (``price_size_skyline``): the sort-based rewrite. Group to
  per-``size`` min ``price`` (one map-side-combined shuffle on a
  ≤-few-dozen-key column), then one window pass in size-descending order
  gives each size the min price over all STRICTLY larger sizes; a row is
  on the frontier iff its price beats that running min (size-dominance)
  and equals its own size's min (intra-size dominance; price TIES are
  kept — neither dominates without a strict coordinate). O(N) + a
  dictionary-sized sort instead of the O(N²) dominance join the oracle
  runs — the oracle's NOT EXISTS is the literal definition, so equality
  proves the rewrite.

* **d-D** (``customer_value_skyline``): the local→global
  divide-and-conquer of the distributed-skyline literature. Each
  partition prunes to its LOCAL skyline with a lex-sorted scan (a row is
  only ever tested against already-kept rows: in full lexicographic
  descending order a later row can never dominate an earlier keeper, so
  one forward pass with an O(|local skyline|) vectorized dominance test
  per row is exact); the union of local skylines — the only rows that can
  be globally nondominated — then takes the same kernel on one partition.
  Data volume after the local pass is Σ|local skylines|: for the
  anti-correlated worst case that can be large, but for real tradeoff
  data it is tiny (measured: dozens of rows from 15k customers); the
  global pass is deliberately a ``coalesce(1)`` so the shape is explicit
  in the plan.

Determinism: every compared value is exact — ``spend_cents`` rounds each
order's price to integer cents BEFORE the sum (identical IEEE
multiply+round in both engines, then an associative integer sum — the
decimal-sum device at plans/relational.py), counts are integers, and
``c_acctbal`` is the raw parquet double. No float aggregate ever enters a
dominance comparison, so skyline membership cannot flap on partial-sum
order.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, Window

from ..session import bounded_window
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# 2-D: sort-based skyline (maximize p_size, minimize p_retailprice)
# ---------------------------------------------------------------------------

def price_size_skyline(part: DataFrame) -> DataFrame:
    """Parts on the (max ``p_size``, min ``p_retailprice``) frontier.

    The unpartitioned window runs over the per-size aggregate only (≤ the
    number of DISTINCT sizes — a bounded dictionary, the
    ``part_pagerank_topk`` single-partition-tail device), never over the
    part table itself; parts join back to that dictionary broadcast.
    """
    per_size = part.groupBy("p_size").agg(
        F.min("p_retailprice").alias("size_min_price")
    )
    w = bounded_window(F.col("p_size").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    frontier_sizes = per_size.withColumn(
        "larger_min_price", F.min("size_min_price").over(w)
    ).filter(
        F.col("larger_min_price").isNull()
        | (F.col("size_min_price") < F.col("larger_min_price"))
    )
    return part.join(
        F.broadcast(frontier_sizes), "p_size"
    ).filter(F.col("p_retailprice") == F.col("size_min_price")).select(
        "p_partkey", "p_name", "p_size", "p_retailprice"
    )


PRICE_SIZE_SKYLINE_SQL = """
SELECT p.p_partkey, p.p_name, p.p_size, p.p_retailprice
FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM part q
  WHERE q.p_size >= p.p_size AND q.p_retailprice <= p.p_retailprice
    AND (q.p_size > p.p_size OR q.p_retailprice < p.p_retailprice))
"""


# ---------------------------------------------------------------------------
# d-D: local→global skyline (maximize spend, order count, account balance)
# ---------------------------------------------------------------------------

_SKY_COLS = ["spend_cents", "n_orders", "c_acctbal"]


def _build_prune_kernel(sky_cols: list[str]):
    """Exact block skyline, built as a CLOSURE so cloudpickle ships it by
    value (the engine package is not importable on the driver's Python
    workers — the ``semdedup_prune`` nested-kernel device). Lex-desc scan:
    each row is tested (vectorized) only against already-kept rows — in
    full lexicographic descending order a later row can never dominate an
    earlier keeper. Ties on all coordinates are kept — dominance needs a
    strict coordinate."""
    import numpy as np

    def pareto_prune(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) <= 1:
            return pdf
        # integer cents ≪ 2^53 and raw parquet doubles: exact in float64
        arr = pdf[sky_cols].to_numpy(dtype="float64")
        order = np.lexsort(tuple(-arr[:, d] for d in range(arr.shape[1] - 1, -1, -1)))
        kept: list[int] = []
        for i in order:
            p = arr[i]
            if kept:
                k = arr[kept]
                if bool(np.any((k >= p).all(axis=1) & (k > p).any(axis=1))):
                    continue
            kept.append(i)
        return pdf.iloc[sorted(kept)]

    return pareto_prune


SKYLINE_GLOBAL_MAX_ROWS = 1_000_000


def skyline_max(
    points: DataFrame,
    sky_cols: list[str] = _SKY_COLS,
    global_max_rows: int = SKYLINE_GLOBAL_MAX_ROWS,
) -> DataFrame:
    """Skyline of ``points`` maximizing every column in ``sky_cols``
    (other columns ride along as identifiers).

    ``global_max_rows`` is the loud degrade gate (the
    ``similar_pairs_threshold`` device): the global stage deliberately
    runs on ONE partition, which is only sound because real tradeoff
    data prunes locally to a tiny frontier. Anti-correlated data (every
    row on the frontier) defeats ANY skyline algorithm's output bound —
    if the union of local skylines exceeds the gate, refuse with the
    remedy named instead of stalling one task. The count runs on the
    already-pruned intermediate, so the check costs one job over
    frontier-sized data, not a corpus scan."""
    prune = _build_prune_kernel(list(sky_cols))

    def prune_partition(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        # incremental fold: memory stays O(|local skyline| + batch)
        acc: pd.DataFrame | None = None
        for pdf in batches:
            acc = (
                pdf
                if acc is None
                else pd.concat([acc, pdf], ignore_index=True)
            )
            acc = prune(acc)
        if acc is not None and len(acc):
            yield acc

    schema = points.schema
    local = points.mapInPandas(prune_partition, schema=schema)
    local = local.localCheckpoint()  # prune once; count + global reuse it
    n_local = local.count()
    if n_local > global_max_rows:
        raise ValueError(
            f"skyline_max: {n_local} local-frontier rows exceed the "
            f"single-partition gate ({global_max_rows}) — the criteria "
            "are anti-correlated at this scale; reduce dimensions, "
            "pre-filter, or raise global_max_rows knowingly"
        )
    return local.coalesce(1).mapInPandas(prune_partition, schema=schema)


def customer_value_skyline(
    customer: DataFrame, orders: DataFrame
) -> DataFrame:
    """Customers on the (total spend, order count, account balance)
    maximization frontier — the "best customer tradeoffs" report.

    ``spend_cents`` = Σ round(o_totalprice·100): per-row rounding BEFORE
    an integer sum, so the aggregate is exact and order-independent (the
    dominance input must never be a float partial sum).
    """
    agg = orders.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.sum(
            F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
        ).alias("spend_cents"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    pts = agg.join(
        customer.select("c_custkey", "c_acctbal"), "c_custkey"
    ).select("c_custkey", "spend_cents", "n_orders", "c_acctbal")
    return skyline_max(pts)


CUSTOMER_VALUE_SKYLINE_SQL = """
WITH agg AS (
  SELECT o_custkey AS c_custkey,
         CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS spend_cents,
         count(*) AS n_orders
  FROM orders GROUP BY 1),
pts AS (
  SELECT a.c_custkey, a.spend_cents, a.n_orders, c.c_acctbal
  FROM agg a JOIN customer c USING (c_custkey))
SELECT p.c_custkey, p.spend_cents, p.n_orders, p.c_acctbal
FROM pts p
WHERE NOT EXISTS (
  SELECT 1 FROM pts q
  WHERE q.spend_cents >= p.spend_cents AND q.n_orders >= p.n_orders
    AND q.c_acctbal >= p.c_acctbal
    AND (q.spend_cents > p.spend_cents OR q.n_orders > p.n_orders
         OR q.c_acctbal > p.c_acctbal))
"""
