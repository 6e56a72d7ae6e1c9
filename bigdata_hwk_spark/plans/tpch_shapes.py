"""Decision-support archetypes (TPC-H Q2/Q3/Q4/Q5/Q7/Q8/Q9/Q10/Q11/Q13/
Q14/Q16/Q17/Q18/Q19/Q20/Q21 and the Q6 scan-only shape) adapted to the
fixture star schema.

The reference engine has no multi-table relational surface at all
(SURVEY.md §2.3 — its joins are the spatial grid self-joins); this module
completes the engine's RELATIONAL coverage with the canonical
decision-support query shapes a warehouse user would expect, each
expressed DataFrame-first so Catalyst plans the join strategy:

* correlated scalar subqueries      → aggregate-then-join-back (Q2/Q17/Q20)
* EXISTS / NOT-EXISTS correlation   → semi-joins / per-key set aggregates (Q4/Q21)
* left-outer two-level aggregation  → aggregate-then-join (Q13)
* conditional-ratio aggregates      → one-pass CASE sums (Q8/Q14)
* global-scalar threshold           → one-row broadcast scalar subquery (Q11)
* symmetric pair joins              → pre-filtered dimension pushdown (Q7)
* multi-fact top-k                  → pruned scans + TakeOrdered (Q3)
* join-order chains                 → region sliver broadcast-first (Q5)
* OR-of-ANDs disjunctions           → band predicate post-equi-join (Q19)

Fixture adaptations (the driver schema has no partsupp table and no
l_commitdate / l_receiptdate / l_shipmode columns):
* "late" = shipped more than 60 days after o_orderdate (Q4/Q21);
* part-supplier links go through lineitem's (l_partkey, l_suppkey)
  instead of partsupp (Q2/Q11/Q16/Q20);
* supply cost is modeled as 0.6 × p_retailprice (Q9).

Scale notes (100 TB thinking):
- nation/region are FIXED-SIZE dimensions (25/5 rows at every SF) and are
  explicitly ``F.broadcast``; part/supplier/customer SCALE with SF so they
  are never force-broadcast — AQE picks broadcast at bench SFs and falls
  back to shuffle hash joins on a cluster.
- Correlated subqueries are rewritten as map-side-combinable aggregates
  joined back on the correlation key — never a per-row re-scan.
- Selective dimension predicates (brand/type/size/nation) are applied
  BEFORE the fact join so the pushed filter prunes the fact early.
- Doubles are rounded at the output boundary (comparison-stable vs the
  DuckDB oracles; partial-aggregation order may differ in the last ULP).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table

LATE_DAYS = 60  # "late" = shipped more than this many days after order date


def _ts(s: str):
    return F.lit(s).cast("timestamp")


# ---------------------------------------------------------------------------
# Q4 shape — EXISTS with a correlated predicate crossing both tables
# ---------------------------------------------------------------------------

def order_priority_late_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders placed in 1996Q1 having >= 1 late lineitem, counted by
    priority. The EXISTS predicate (l_shipdate > o_orderdate + 60 days)
    references BOTH tables, so it rides inside the semi-join condition —
    Catalyst plans a hash semi-join on orderkey with the non-equi
    residual, never a per-order re-scan."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1996-04-01"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    cond = (orders.o_orderkey == li.l_orderkey) & (
        li.l_shipdate > orders.o_orderdate + F.expr(f"INTERVAL {LATE_DAYS} DAYS")
    )
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


ORDER_PRIORITY_LATE_SQL = f"""
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL {LATE_DAYS} DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Q17 shape — correlated scalar AVG per group, joined back
# ---------------------------------------------------------------------------

def small_quantity_part_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly revenue lost if small-quantity orders (below 20% of the
    part's average quantity) for one brand were dropped. The correlated
    ``0.2 * avg(l_quantity) WHERE l_partkey = p_partkey`` is rewritten as
    a map-side-combined per-part aggregate joined back on partkey — the
    avg table is |parts-of-brand| rows, so the join-back is tiny relative
    to the fact."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#4")
    li = load_table(spark, sf_dir, "lineitem")
    brand_li = li.join(part.select("p_partkey"), li.l_partkey == F.col("p_partkey")).drop(
        "p_partkey"
    )
    per_part_avg = brand_li.groupBy("l_partkey").agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        brand_li.join(per_part_avg, "l_partkey")
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_weekly_loss"))
    )


SMALL_QTY_REVENUE_SQL = """
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_weekly_loss
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand = 'Brand#4'
  AND l_quantity < 0.2 * (SELECT avg(l_quantity) FROM lineitem l2
                          WHERE l2.l_partkey = p_partkey)
"""


# ---------------------------------------------------------------------------
# Q18 shape — HAVING-filtered subquery + join to parents (large orders)
# ---------------------------------------------------------------------------

def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers who placed orders totalling > 300 units. The order-level
    sum is aggregated FIRST (map-side combine on orderkey), the >300
    filter shrinks the set to a sliver, and only then do orders/customer
    join — the classic aggregate-before-join rewrite of Q18's IN
    subquery."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("raw_qty"))
        .filter(F.col("raw_qty") > 300)  # filter the RAW sum (oracle's HAVING
        # is unrounded; rounding first could flip rows at the boundary)
        .select("l_orderkey", F.round("raw_qty", 2).alias("total_qty"))
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_orderdate"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


LARGE_VOLUME_SQL = """
SELECT c_custkey, c_name, o_orderkey, o_orderdate,
       round(o_totalprice, 2) AS o_totalprice, total_qty
FROM (SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300) big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
"""


# ---------------------------------------------------------------------------
# Q13 shape — left-outer join + two-level aggregation (count distribution)
# ---------------------------------------------------------------------------

def customer_order_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of customers by order count (urgent orders excluded),
    INCLUDING zero-order customers. Aggregate-then-join: per-customer
    counts come from a map-side-combined groupBy on orders alone, then a
    left join from customer fills the zeroes — the raw fact never joins
    row-by-row against customer rows."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("c_count")
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    return (
        cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "left")
        .select(F.coalesce("c_count", F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


CUSTOMER_ORDER_HISTOGRAM_SQL = """
SELECT c_count, count(*) AS custdist
FROM (SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# ---------------------------------------------------------------------------
# Q14 shape — conditional-ratio aggregate over a dimension attribute
# ---------------------------------------------------------------------------

def promo_revenue_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of March-1996 revenue from PROMO parts: one CASE-sum pass
    over the month's lineitems joined to part. part scales with SF so it
    is NOT force-broadcast — AQE broadcasts at bench SFs, shuffles on a
    cluster. The ship-month filter is pushed to the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-03-01"))
        & (F.col("l_shipdate") < _ts("1996-04-01"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_revenue_pct")
        )
    )


PROMO_REVENUE_SQL = """
SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0.0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01'
  AND l_shipdate < TIMESTAMP '1996-04-01'
"""


# ---------------------------------------------------------------------------
# Q7 shape — symmetric nation-pair trade volume
# ---------------------------------------------------------------------------

def nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping volume between NATION_1 and NATION_2 (both directions) by
    year. The two-nation filter is applied to supplier and customer
    BEFORE the fact joins — ~2/25 of each dimension survives, so the fact
    is pruned by two selective hash joins instead of filtering a 4-way
    join product. nation (25 rows, fixed) is broadcast."""
    pair = ("NATION_1", "NATION_2")
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name").isin(*pair))
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("s_nk"),
                                  F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("s_nk"),
    ).select("s_suppkey", "supp_nation")
    cust = load_table(spark, sf_dir, "customer").join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("c_nk"),
                                  F.col("n_name").alias("cust_nation"))),
        F.col("c_nationkey") == F.col("c_nk"),
    ).select("c_custkey", "cust_nation")
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


NATION_TRADE_SQL = """
SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE n1.n_name IN ('NATION_1', 'NATION_2')
        AND n2.n_name IN ('NATION_1', 'NATION_2')
        AND n1.n_name <> n2.n_name)
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


# ---------------------------------------------------------------------------
# Q8 shape — national market share within a region/type slice
# ---------------------------------------------------------------------------

def market_share_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATION_2's share of ECONOMY-part revenue sold into ASIA, by year.
    CASE-sum ratio in ONE aggregation pass; the region restriction rides
    a broadcast nation⋈region chain applied to customer before the fact
    join; the p_type filter prunes part before its join."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_nk = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select(F.col("n_nationkey").alias("c_nk"))
    cust = load_table(spark, sf_dir, "customer").join(
        F.broadcast(asia_nk), F.col("c_nationkey") == F.col("c_nk")
    ).select("c_custkey")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "ECONOMY"
    ).select("p_partkey")
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("s_nk"),
                                  F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("s_nk"),
    ).select("s_suppkey", "supp_nation")
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(F.year("l_shipdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_2", vol).otherwise(0.0))
                / F.sum(vol),
                4,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


MARKET_SHARE_SQL = """
SELECT o_year, round(sum(CASE WHEN supp_nation = 'NATION_2' THEN volume
                              ELSE 0.0 END) / sum(volume), 4) AS mkt_share
FROM (SELECT CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n1.n_name AS supp_nation
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      JOIN region ON n2.n_regionkey = r_regionkey
      WHERE r_name = 'ASIA' AND p_type = 'ECONOMY')
GROUP BY o_year
ORDER BY o_year
"""


# ---------------------------------------------------------------------------
# Q9 shape — product-line profit by supplier nation and year
# ---------------------------------------------------------------------------

def nation_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit on 'red'-named parts by supplier nation and year. Supply
    cost is modeled as 0.6 x p_retailprice (the fixture has no partsupp;
    the join/agg SHAPE — fact x 2 scaling dims x broadcast nation, then a
    two-key groupBy over an arithmetic expression — is Q9's)."""
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").contains("red")
    ).select("p_partkey", "p_retailprice")
    nation = load_table(spark, sf_dir, "nation")
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("s_nk"),
                                  F.col("n_name").alias("nation"))),
        F.col("s_nationkey") == F.col("s_nk"),
    ).select("s_suppkey", "nation")
    li = load_table(spark, sf_dir, "lineitem")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .groupBy("nation", F.year("l_shipdate").alias("o_year"))
        .agg(F.round(F.sum(profit), 2).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


NATION_PROFIT_SQL = """
SELECT nation, o_year, round(sum(amount), 2) AS sum_profit
FROM (SELECT n_name AS nation,
             CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS o_year,
             l_extendedprice * (1 - l_discount)
               - 0.6 * p_retailprice * l_quantity AS amount
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%red%')
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""


# ---------------------------------------------------------------------------
# Q10 shape — returned-item revenue by customer (top N)
# ---------------------------------------------------------------------------

def returned_item_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top 20 customers by revenue lost to returns for orders placed in
    1996Q2. The returnflag filter prunes the fact at the scan; customer
    and nation join AFTER the per-customer aggregate would be ideal, but
    the output needs customer attributes in the grouping key — so the
    orders->customer join happens pre-agg on the (already filtered)
    sliver, and the fixed-size nation is broadcast."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-04-01"))
        & (F.col("o_orderdate") < _ts("1996-07-01"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


RETURNED_ITEM_SQL = """
SELECT c_custkey, c_name, n_name AS nation,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-04-01'
  AND o_orderdate < TIMESTAMP '1996-07-01'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey LIMIT 20
"""


# ---------------------------------------------------------------------------
# Q11 shape — per-group value vs a GLOBAL scalar threshold
# ---------------------------------------------------------------------------

def important_part_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose shipped value exceeds 1.5x the AVERAGE part's value.
    (Q11 uses ``0.0001 / SF`` so the threshold tracks the table size;
    expressing it as a multiple of the mean part value is the same
    self-scaling idea without needing SF as an input — non-degenerate at
    every fixture SF.) The global mean is a ONE-ROW aggregate
    cross-joined (broadcast) against the per-part aggregate — the
    scalar-subquery shape; both sides are map-side-combined. The mean is
    derived from the per-part aggregate itself, so the second pass
    re-aggregates |parts| rows, not the fact."""
    li = load_table(spark, sf_dir, "lineitem")
    val = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_part = li.groupBy("l_partkey").agg(F.sum(val).alias("part_value"))
    threshold = per_part.agg((F.avg("part_value") * 1.5).alias("threshold"))
    return (
        per_part.join(F.broadcast(threshold))
        .filter(F.col("part_value") > F.col("threshold"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round("part_value", 2).alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "p_partkey")
    )


IMPORTANT_PARTS_SQL = """
WITH pv AS (SELECT l_partkey, sum(l_extendedprice * (1 - l_discount)) AS v
            FROM lineitem GROUP BY l_partkey)
SELECT l_partkey AS p_partkey, round(v, 2) AS part_value
FROM pv
WHERE v > (SELECT avg(v) * 1.5 FROM pv)
ORDER BY part_value DESC, p_partkey
"""


# ---------------------------------------------------------------------------
# Q2 shape — min-cost supplier per part (correlated MIN + tiebreak)
# ---------------------------------------------------------------------------

def min_cost_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each size-15 part, the EUROPE supplier with the lowest average
    unit price (ties broken by s_acctbal desc, s_suppkey). The correlated
    ``MIN(unit price) WHERE partkey = p_partkey`` becomes a ranking
    window over the per-(part, supplier) aggregate — one shuffle on
    partkey serves both the min and the tiebreak."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    nation = load_table(spark, sf_dir, "nation")
    eu_nk = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("nation"))
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(eu_nk), F.col("s_nationkey") == F.col("s_nk")
    ).select("s_suppkey", "s_name", "s_acctbal", "nation")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") == 15).select(
        "p_partkey", "p_name"
    )
    li = load_table(spark, sf_dir, "lineitem")
    offers = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .groupBy("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal", "nation")
        .agg(
            F.round(F.avg(F.col("l_extendedprice") / F.col("l_quantity")), 4).alias(
                "unit_price"
            )
        )
    )
    w = Window.partitionBy("p_partkey").orderBy(
        "unit_price", F.desc("s_acctbal"), "s_suppkey"
    )
    return (
        offers.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "nation",
            "unit_price",
        )
        .orderBy("p_partkey")
    )


MIN_COST_SUPPLIER_SQL = """
SELECT p_partkey, p_name, s_name, round(s_acctbal, 2) AS s_acctbal, nation,
       unit_price
FROM (SELECT p_partkey, p_name, s_name, s_acctbal, n_name AS nation,
             round(avg(l_extendedprice / l_quantity), 4) AS unit_price,
             row_number() OVER (
               PARTITION BY p_partkey
               ORDER BY round(avg(l_extendedprice / l_quantity), 4),
                        s_acctbal DESC, s_suppkey) AS rn
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE p_size = 15 AND r_name = 'EUROPE'
      GROUP BY p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name)
WHERE rn = 1
ORDER BY p_partkey
"""


# ---------------------------------------------------------------------------
# Q21 shape — EXISTS + NOT-EXISTS double correlation (sole late supplier)
# ---------------------------------------------------------------------------

def late_sole_supplier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers in NATION_3 who were the ONLY late shipper on a
    multi-supplier order. Q21's EXISTS (another supplier shipped) +
    NOT-EXISTS (another supplier shipped late) pair collapses into per-
    order set aggregates: n_suppliers > 1 AND late-supplier set == {s} —
    one shuffle on orderkey replaces two correlated sub-scans."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    flagged = li.join(orders, li.l_orderkey == orders.o_orderkey).withColumn(
        "is_late",
        (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {LATE_DAYS} DAYS")
        ).cast("int"),
    )
    per_order = flagged.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct(
            F.when(F.col("is_late") == 1, F.col("l_suppkey"))
        ).alias("n_late_supps"),
        F.max(F.when(F.col("is_late") == 1, F.col("l_suppkey"))).alias(
            "late_suppkey"
        ),
        # Q21 counts qualifying LINEITEM rows, not orders: a supplier with
        # two late lines on one order scores 2. When the late-supplier set
        # is a singleton, every late line on the order is theirs.
        F.sum("is_late").alias("late_lines"),
    )
    sole_late = per_order.filter(
        (F.col("n_supps") > 1) & (F.col("n_late_supps") == 1)
    ).select("late_suppkey", "late_lines")
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_name")
    return (
        sole_late.join(supp, sole_late.late_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.sum("late_lines").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


LATE_SOLE_SUPPLIER_SQL = f"""
SELECT s_name, count(*) AS numwait
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON l1.l_orderkey = o_orderkey
WHERE n_name = 'NATION_3'
  AND l1.l_shipdate > o_orderdate + INTERVAL {LATE_DAYS} DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3 JOIN orders o3
                    ON l3.l_orderkey = o3.o_orderkey
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o3.o_orderdate + INTERVAL {LATE_DAYS} DAY)
GROUP BY s_name
ORDER BY numwait DESC, s_name LIMIT 20
"""


# ---------------------------------------------------------------------------
# Q16 shape — NOT-IN exclusion + COUNT DISTINCT breadth
# ---------------------------------------------------------------------------

def part_supplier_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-supplier breadth per (brand, type, size) for a part slice,
    excluding suppliers with negative account balance (the fixture's
    stand-in for Q16's complaint comment). NOT IN becomes a left-anti
    join of the DISTINCT (part, supplier) link pairs against the
    excluded-supplier keys; lineitem is the partsupp surrogate so the
    pair set is deduplicated BEFORE the dimension joins."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#2")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 5, 10, 15, 20))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    links = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    bad_supp = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        links.join(bad_supp, links.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(part, links.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


PART_SUPPLIER_BREADTH_SQL = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#2' AND p_type <> 'PROMO'
  AND p_size IN (1, 5, 10, 15, 20)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# ---------------------------------------------------------------------------
# Q20 shape — nested correlated aggregate threshold (dominant suppliers)
# ---------------------------------------------------------------------------

def dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers shipping more than 2x their FAIR SHARE of a 'red' part's
    volume (fair share = part total / number of suppliers shipping it),
    with how many parts they dominate. Q20's nested correlated ``> 0.5 *
    sum(...) WHERE partkey = ...`` shape — an absolute share degenerates
    as per-part supplier counts grow with SF, so the threshold is a
    multiple of the per-part mean, which stays non-degenerate at every
    SF. Both correlated aggregates (total, supplier count) become ONE
    window over the per-(part, supplier) aggregate — the fact is touched
    once, the correlation key is the window partition."""
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").contains("red")
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem")
    per_ps = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("supp_qty"))
    )
    w = Window.partitionBy("l_partkey")
    dominant = (
        per_ps.withColumn("part_qty", F.sum("supp_qty").over(w))
        .withColumn("n_supps", F.count(F.lit(1)).over(w))
        .filter(
            F.col("supp_qty") > 2.0 * F.col("part_qty") / F.col("n_supps")
        )
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        dominant.join(supp, dominant.l_suppkey == supp.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("n_dominated_parts"))
        .orderBy(F.desc("n_dominated_parts"), "s_suppkey")
    )


DOMINANT_SUPPLIERS_SQL = """
WITH ps AS (SELECT l_partkey, l_suppkey, sum(l_quantity) AS supp_qty
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_name LIKE '%red%'
            GROUP BY l_partkey, l_suppkey)
SELECT s_suppkey, s_name, count(*) AS n_dominated_parts
FROM ps JOIN supplier ON l_suppkey = s_suppkey
WHERE supp_qty > 2.0 * (SELECT avg(p2.supp_qty) FROM ps p2
                        WHERE p2.l_partkey = ps.l_partkey)
GROUP BY s_suppkey, s_name
ORDER BY n_dominated_parts DESC, s_suppkey
"""


# ---------------------------------------------------------------------------
# Q6 shape — tight-band scan-only aggregate (the pushdown showcase)
# ---------------------------------------------------------------------------

def forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6's forecasting-revenue-change shape: one-row sum of
    extendedprice·discount over a shipdate year × discount band ×
    quantity ceiling — the canonical scan-only aggregate whose entire
    predicate PUSHES DOWN to the parquet scan (no join, no shuffle past
    the partial agg).

    Exact money: revenue folds as cents × discount-percent — two
    per-row integer roundings (the skyline/Gini convention applied to
    both factors), so the sum is an exact BIGINT in cent·percent units
    and the displayed double is a single final division. A float
    extendedprice·discount sum would be summation-order-dependent.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("2000-01-01"))
        & (F.col("l_shipdate") < _ts("2001-01-01"))
        & (F.col("l_discount") >= 0.02)
        & (F.col("l_discount") <= 0.04)
        & (F.col("l_quantity") < 24)
    )
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")
    pct = F.round(F.col("l_discount") * 100, 0).cast("bigint")
    return li.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lineitems"),
        F.coalesce(F.sum(cents * pct), F.lit(0))
        .cast("bigint")
        .alias("revenue_cents_pct"),
        F.round(
            F.coalesce(F.sum(cents * pct), F.lit(0)) / F.lit(10000.0), 2
        ).alias("revenue"),
    )


FORECAST_REVENUE_CHANGE_SQL = """
SELECT CAST(count(*) AS BIGINT) AS n_lineitems,
       CAST(coalesce(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                         * CAST(round(l_discount * 100, 0) AS BIGINT)), 0)
            AS BIGINT) AS revenue_cents_pct,
       round(coalesce(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                          * CAST(round(l_discount * 100, 0) AS BIGINT)), 0)
             / 10000.0, 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '2000-01-01'
  AND l_shipdate < TIMESTAMP '2001-01-01'
  AND l_discount >= 0.02 AND l_discount <= 0.04
  AND l_quantity < 24
"""


# ---------------------------------------------------------------------------
# Q3 shape — shipping-priority top-k: two fact joins + TakeOrdered
# ---------------------------------------------------------------------------

def shipping_priority_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top 10 unshipped-revenue orders for one market segment at a
    cutoff date: orders placed BEFORE the cutoff with lineitems shipped
    AFTER it. Both date predicates and the segment predicate are
    single-table and push to the scans (the segment filter prunes
    customer before the join; the two date slivers prune both facts);
    the revenue ranking plans TakeOrderedAndProject — per-partition
    heaps, no global sort."""
    cutoff = _ts("1997-03-15")
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < cutoff
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > cutoff
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


SHIPPING_PRIORITY_SQL = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-03-15'
  AND l_shipdate > TIMESTAMP '1997-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10
"""


# ---------------------------------------------------------------------------
# Q5 shape — local-supplier volume: the classic join-ordering stress
# ---------------------------------------------------------------------------

def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue from orders where the CUSTOMER and the SUPPLIER sit in
    the same nation, per nation of one region and one order year — the
    six-table chain whose join ORDER is the whole game. The region →
    nation sliver broadcasts into both entity dims BEFORE the fact
    joins (pruning customer and supplier to one region's nations); the
    same-nation equality (c_nationkey = s_nationkey) rides INSIDE the
    supplier join condition, not as a post-join filter, so mismatched
    pairs never materialize."""
    nations = (
        load_table(spark, sf_dir, "nation")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "region").filter(
                    F.col("r_name") == "ASIA"
                )
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    cust = load_table(spark, sf_dir, "customer").join(
        F.broadcast(nations), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", "c_nationkey", "n_name")
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1997-01-01"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
    )
    return (
        j.groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


LOCAL_SUPPLIER_VOLUME_SQL = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


# ---------------------------------------------------------------------------
# Q19 shape — disjunction of conjunctive bands (OR-of-ANDs pushdown)
# ---------------------------------------------------------------------------

def brand_band_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row discounted revenue over an OR of three (brand, size,
    quantity-band) conjunctions — the disjunctive-predicate shape. The
    part-side conjuncts (brand, size) evaluate on the broadcast-joined
    dimension and the quantity band on the fact, so the OR never blocks
    the equi-join itself; common conjunct factoring (size >= 1) stays
    with the optimizer. Fixture adaptation: no p_container, so the
    bands pair brand with a size range instead."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    j = li.join(part, li.l_partkey == part.p_partkey)
    band = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.filter(band).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
    )


BRAND_BAND_REVENUE_SQL = """
SELECT CAST(count(*) AS BIGINT) AS n_lines,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""


# ---------------------------------------------------------------------------
# Correlated-SQL twins (r13, VERDICT r12 item 7) — same semantics as the
# hand-decorrelated shapes above, but the CORRELATED text is handed to
# spark.sql() so CATALYST performs the decorrelation. Every shape above
# pre-chews the correlation into windows/aggregate-join-backs at the
# DataFrame layer, which means the optimizer plan classes a SQL user
# would actually exercise — RewriteCorrelatedScalarSubquery, null-aware
# anti join for NOT IN, EXISTS/NOT-EXISTS chains into semi/anti joins —
# were never witnessed by the registry. These twins are that witness:
# tests/test_tpch_shapes.py asserts each optimized plan is join-based
# (no per-row re-scan, no BroadcastNestedLoopJoin on the hot path) and
# the DuckDB oracles pin that Catalyst's rewrite preserves semantics.
# Dimension pre-filters still happen DataFrame-side before the SQL
# (broadcast nation⋈region slivers, p_size/brand pruning) so the scans
# the decorrelated joins consume stay pruned at 100 TB.
# ---------------------------------------------------------------------------


def _eu_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """supplier ⋈ broadcast(EUROPE nation sliver) — shared by the Q2
    twins; the region restriction rides the fixed 25/5-row dims."""
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    nation = load_table(spark, sf_dir, "nation")
    eu_nk = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("nation")
    )
    return (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(eu_nk), F.col("s_nationkey") == F.col("s_nk"))
        .select("s_suppkey", "s_name", "s_acctbal", "nation")
    )


def min_cost_supplier_correlated(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Q2's correlated scalar subquery, verbatim: every EUROPE supplier
    whose unit price EQUALS the per-part minimum — ``WHERE unit_price =
    (SELECT min(unit_price) ... WHERE i.p_partkey = o.p_partkey)`` fed
    to Catalyst, which must decorrelate it into an aggregate joined
    back on the correlation key (the rewrite
    ``min_cost_supplier_per_part`` performs by hand with a window).
    Unlike the windowed twin it returns ALL tied minimum-cost suppliers
    (TPC-H Q2's actual multiplicity), so the two rows are distinct
    queries, not aliases. Ref: HWK has no relational surface; shape
    from the public TPC-H spec Q2."""
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_size") == 15)
        .select("p_partkey", "p_name")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    return spark.sql(
        """
        WITH offers AS (
          SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, nation,
                 round(avg(l_extendedprice / l_quantity), 4) AS unit_price
          FROM {li} JOIN {part} ON l_partkey = p_partkey
          JOIN {supp} ON l_suppkey = s_suppkey
          GROUP BY p_partkey, p_name, s_suppkey, s_name, s_acctbal, nation)
        SELECT p_partkey, p_name, s_name,
               round(s_acctbal, 2) AS s_acctbal, nation, unit_price
        FROM offers o
        WHERE unit_price = (SELECT min(i.unit_price) FROM offers i
                            WHERE i.p_partkey = o.p_partkey)
        ORDER BY p_partkey, s_name
        """,
        li=li,
        part=part,
        supp=_eu_suppliers(spark, sf_dir),
    )


MIN_COST_CORRELATED_SQL = """
WITH offers AS (
  SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal,
         n_name AS nation,
         round(avg(l_extendedprice / l_quantity), 4) AS unit_price
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE p_size = 15 AND r_name = 'EUROPE'
  GROUP BY p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name)
SELECT p_partkey, p_name, s_name, round(s_acctbal, 2) AS s_acctbal,
       nation, unit_price
FROM offers o
WHERE unit_price = (SELECT min(i.unit_price) FROM offers i
                    WHERE i.p_partkey = o.p_partkey)
ORDER BY p_partkey, s_name
"""


def supplier_breadth_notin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16's NOT IN, verbatim: Catalyst must plan the subquery as a
    null-aware anti join (broadcast LeftAnti with the isnull-or-equal
    condition) — the plan class the hand-built ``left_anti`` in
    ``part_supplier_breadth`` never exercises, because a plain anti
    join and a NOT IN differ exactly when the right side can hold
    NULLs. Same output as the hand-built twin (s_suppkey is never null
    in the fixture)."""
    part = (
        load_table(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#2")
            & (F.col("p_type") != "PROMO")
            & (F.col("p_size").isin(1, 5, 10, 15, 20))
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey"
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_acctbal"
    )
    return spark.sql(
        """
        SELECT p_brand, p_type, p_size,
               count(DISTINCT l_suppkey) AS supplier_cnt
        FROM (SELECT DISTINCT l_partkey, l_suppkey FROM {li}) links
        JOIN {part} ON l_partkey = p_partkey
        WHERE l_suppkey NOT IN (SELECT s_suppkey FROM {supp}
                                WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        """,
        li=li,
        part=part,
        supp=supp,
    )


SUPPLIER_BREADTH_NOTIN_SQL = PART_SUPPLIER_BREADTH_SQL


def dominant_suppliers_correlated(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Q20's nested correlated aggregate threshold, verbatim: the
    ``supp_qty > 2 * (SELECT avg(...) WHERE p2.l_partkey =
    ps.l_partkey)`` correlated scalar goes to Catalyst instead of the
    hand-built window in ``dominant_part_suppliers`` — the decorrelated
    plan is an aggregate over the CTE joined back on the correlation
    key (anti-join-free, re-scan-free), asserted in tests. Output
    identical to the windowed twin."""
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").contains("red"))
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    )
    return spark.sql(
        """
        WITH ps AS (SELECT l_partkey, l_suppkey,
                           sum(l_quantity) AS supp_qty
                    FROM {li} JOIN {part} ON l_partkey = p_partkey
                    GROUP BY l_partkey, l_suppkey)
        SELECT s_suppkey, s_name, count(*) AS n_dominated_parts
        FROM ps JOIN {supp} ON l_suppkey = s_suppkey
        WHERE supp_qty > 2.0 * (SELECT avg(p2.supp_qty) FROM ps p2
                                WHERE p2.l_partkey = ps.l_partkey)
        GROUP BY s_suppkey, s_name
        ORDER BY n_dominated_parts DESC, s_suppkey
        """,
        li=li,
        part=part,
        supp=supp,
    )


DOMINANT_CORRELATED_SQL = DOMINANT_SUPPLIERS_SQL


def sole_late_supplier_exists(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Q21's EXISTS + NOT-EXISTS double correlation, verbatim: Catalyst
    must turn the EXISTS into a left-semi and the NOT EXISTS into a
    left-anti join — each with an equi key (orderkey) plus a non-equi
    residual (suppkey <>, shipdate-late predicate) — where
    ``late_sole_supplier_orders`` hand-collapses both into per-order
    set aggregates. Same output as the hand-built twin."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_3"
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name")
    )
    return spark.sql(
        f"""
        SELECT s_name, count(*) AS numwait
        FROM {{supp}}
        JOIN {{li}} l1 ON s_suppkey = l1.l_suppkey
        JOIN {{orders}} ON l1.l_orderkey = o_orderkey
        WHERE l1.l_shipdate > o_orderdate + INTERVAL {LATE_DAYS} DAY
          AND EXISTS (SELECT 1 FROM {{li}} l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (
                SELECT 1 FROM {{li}} l3 JOIN {{orders}} o3
                  ON l3.l_orderkey = o3.o_orderkey
                WHERE l3.l_orderkey = l1.l_orderkey
                  AND l3.l_suppkey <> l1.l_suppkey
                  AND l3.l_shipdate >
                      o3.o_orderdate + INTERVAL {LATE_DAYS} DAY)
        GROUP BY s_name
        ORDER BY numwait DESC, s_name LIMIT 20
        """,
        supp=supp,
        li=li,
        orders=orders,
    )


SOLE_LATE_EXISTS_SQL = LATE_SOLE_SUPPLIER_SQL


def market_share_sql_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 through the SQL entry point: the 7-relation join tree plus
    conditional share-of-sum handed to the parser/optimizer as ONE
    statement, so join REORDERING over the raw star (not the
    DataFrame-author's pre-ordered chain in ``market_share_by_year``)
    is what gets planned. The twins' equality pins that Catalyst's
    reordering preserves the ratio semantics."""
    tables = {
        t: load_table(spark, sf_dir, t)
        for t in (
            "lineitem",
            "part",
            "supplier",
            "orders",
            "customer",
            "nation",
            "region",
        )
    }
    return spark.sql(
        """
        SELECT o_year,
               round(sum(CASE WHEN supp_nation = 'NATION_2' THEN volume
                              ELSE 0.0 END) / sum(volume), 4) AS mkt_share
        FROM (SELECT year(l_shipdate) AS o_year,
                     l_extendedprice * (1 - l_discount) AS volume,
                     n1.n_name AS supp_nation
              FROM {lineitem}
              JOIN {part} ON l_partkey = p_partkey
              JOIN {supplier} ON l_suppkey = s_suppkey
              JOIN {orders} ON l_orderkey = o_orderkey
              JOIN {customer} ON o_custkey = c_custkey
              JOIN {nation} n1 ON s_nationkey = n1.n_nationkey
              JOIN {nation2} n2 ON c_nationkey = n2.n_nationkey
              JOIN {region} ON n2.n_regionkey = r_regionkey
              WHERE r_name = 'ASIA' AND p_type = 'ECONOMY')
        GROUP BY o_year
        ORDER BY o_year
        """,
        nation2=tables["nation"],
        **tables,
    )


MARKET_SHARE_SQL_ENTRY = MARKET_SHARE_SQL
