"""General relational operator surface: joins, aggs, windows, set ops, JSON.

The reference contains no equi-joins, window functions or set operations
(SURVEY.md §2.3/§2.7/§2.8) — Spark supplies them natively, and this module
pins the full surface with oracle-checked queries over the fixture star
schema: hash/broadcast equi-joins, semi/anti joins, multi-way joins,
grouped/rollup aggregation, ranking windows, sessionization (lag + running
sum), JSON extraction, distinct/intersect.

Scale notes (100 TB thinking):
- Fact-to-fact joins (lineitem⋈orders) shuffle on the join key; dimension
  joins (nation, region, customer-at-small-SF) are explicitly
  ``F.broadcast`` so no shuffle of the big side occurs.
- Double-typed aggregates are rounded at the output boundary (both engines
  compute IEEE sums whose last-ULP may differ with partial-aggregation
  order; rounding to 2 decimals makes results comparison-stable).
- Windows partition by high-cardinality keys (user_id, c_custkey) — no
  global windows, so state per partition stays bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table

SESSION_GAP_MIN = 30  # sessionization inactivity gap (minutes)


# ---------------------------------------------------------------------------
# TPC-H Q1-style grouped aggregation (A1/A2/A4 surface on the star schema)
# ---------------------------------------------------------------------------

def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


TPCH_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_extendedprice), 4) AS avg_price,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# Equi-join + top-K (hash join on the fact side, deterministic tiebreak)
# ---------------------------------------------------------------------------

def top_customers_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(10)
    )


TOP_CUSTOMERS_SQL = """
SELECT c_custkey, c_name, round(sum(o_totalprice), 2) AS revenue,
       count(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
ORDER BY revenue DESC, c_custkey LIMIT 10
"""


# ---------------------------------------------------------------------------
# Semi / anti joins (§2.7 membership-test semantics)
# ---------------------------------------------------------------------------

def orders_with_heavy_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders having ≥1 lineitem with quantity > 45, counted by priority —
    left-semi join (EXISTS)."""
    orders = load_table(spark, sf_dir, "orders")
    heavy = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        orders.join(heavy, orders.o_orderkey == heavy.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


ORDERS_HEAVY_SQL = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
GROUP BY o_orderpriority
"""


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers with no finalized ('F')
    order. (Every fixture customer has ≥1 order of some status, so the
    unrestricted anti-join would be the empty set at every SF — a
    trivially-passing oracle; the status filter keeps the result
    non-trivial while exercising the same plan shape.)"""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_mktsegment")
    )


CUSTOMERS_NO_ORDERS_SQL = """
SELECT c_custkey, c_mktsegment FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
"""


# ---------------------------------------------------------------------------
# Multi-way broadcast join (dimension chain customer→nation→region)
# ---------------------------------------------------------------------------

def revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


REVENUE_BY_REGION_SQL = """
SELECT r_name, round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


# ---------------------------------------------------------------------------
# Window functions: ranking top-K per group (§2.8)
# ---------------------------------------------------------------------------

def top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by price per customer — row_number window, deterministic
    (o_orderkey tiebreak). Partitioned by customer → bounded state per key."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
    )


TOP_ORDERS_PER_CUSTOMER_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rk
  FROM orders) t
WHERE rk <= 3
"""


# ---------------------------------------------------------------------------
# Sessionization over events (lag + cumulative sum — SURVEY.md §2.11)
# ---------------------------------------------------------------------------

def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sessionize_events(load_table(spark, sf_dir, "events"))


def sessionize_events(ev: DataFrame) -> DataFrame:
    """Sessions per user with a 30-min inactivity gap: classic
    lag→gap-flag→running-sum pattern. Output: one row per session.

    Engine-version-proof parity contract (both sides, by construction):

    * **Time is a pure integer**: Spark orders and differences
      ``unix_micros(ts)`` — by construction exactly ``raw_ns div 1000``
      (``sources/tables.py`` builds ts that way); the oracle computes
      ``epoch_ns(ts) // 1000`` straight off the parquet value, never
      casting through a timestamp type. DuckDB builds differ in whether
      the parquet TIMESTAMP_NS survives the scan (≥1.1) or is truncated
      to µs at read (1.0); floor-division of the ns count is identical
      under both behaviors, so no cast semantics can shift a session
      boundary. Both window ORDER BYs use the same (µs, event_id) key —
      ordering by raw ns would tiebreak sub-µs neighbors differently.
    * **Sums are exact**: ``value`` is summed as DECIMAL(18,6) on both
      sides — decimal addition is associative/order-independent, so
      shuffle order and fp-summation algorithm differences can't move a
      rounded 2-decimal total across a half-boundary. Cast back to
      DOUBLE before the final round for a schema-stable output.

    Skew posture: the per-user window is the semantic unit (a running
    sum over one user's ordered history can't split mid-stream), so a
    hot user costs one task sorting that user's rows — linear, and
    pinned by the planted-hot-key test in tests/test_skew.py."""
    tus = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy(tus, "event_id")
    gap = tus - F.lag(tus).over(w)
    with_flag = ev.withColumn(
        "new_sess",
        F.when(gap.isNull() | (gap > SESSION_GAP_MIN * 60 * 1_000_000), 1).otherwise(0),
    )
    sess = with_flag.withColumn("session_id", F.sum("new_sess").over(w))
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 2
        ).alias("session_value"),
    )


USER_SESSIONS_SQL = f"""
WITH ev AS (
  SELECT user_id, epoch_ns(ts) // 1000 AS tus, event_id, value FROM events
),
flagged AS (
  SELECT user_id, tus, event_id, value,
         CASE WHEN tus - lag(tus) OVER w IS NULL
                OR tus - lag(tus) OVER w > {SESSION_GAP_MIN * 60 * 1_000_000}
              THEN 1 ELSE 0 END AS new_sess
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)
),
sess AS (
  SELECT user_id, value,
         -- DuckDB window sum(INTEGER) yields HUGEINT (int128); Spark emits
         -- BIGINT — cast so the driver's value-hash sees identical types.
         CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY tus, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM flagged)
SELECT user_id, session_id, count(*) AS n_events,
       round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 2) AS session_value
FROM sess GROUP BY user_id, session_id
"""


# ---------------------------------------------------------------------------
# JSON extraction (events.props — §2.11 extension surface)
# ---------------------------------------------------------------------------

def event_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extract props.k (JSON-in-string) and aggregate per event_type."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


EVENT_PROPS_SQL = """
SELECT event_type, count(*) AS n,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# Set operations (§2.7: free in Spark, pinned by oracle)
# ---------------------------------------------------------------------------

def nations_with_both(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nation keys present in BOTH customer and supplier — INTERSECT."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return cust.intersect(supp)


NATIONS_BOTH_SQL = """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
"""


# ---------------------------------------------------------------------------
# Rollup (grouping-sets surface; absent in reference — SURVEY.md §2.4)
# ---------------------------------------------------------------------------

def lineitem_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


LINEITEM_ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus, count(*) AS n,
       round(sum(l_quantity), 2) AS sum_qty
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def lineitem_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE — all 2^k grouping sets in one pass (rollup's superset;
    completes the §2.4 grouping-sets surface). One shuffle: Spark expands
    the grouping sets map-side and aggregates once, same as rollup."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


LINEITEM_CUBE_SQL = """
SELECT l_returnflag, l_linestatus, count(*) AS n,
       round(sum(l_quantity), 2) AS sum_qty
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def order_status_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the general form rollup/cube specialize:
    totals per status, per priority, and a grand total in ONE pass (one
    shuffle; Spark expands the listed sets map-side, never the 2^k cube).
    At 100 TB a dashboard wants exactly its sets, not the cube's blowup.
    Spelled in SQL because the DataFrame API has no grouping-sets
    method; same Catalyst plan either way."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("t_ogs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS total_price
        FROM t_ogs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


ORDER_STATUS_GROUPING_SETS_SQL = """
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, event_id, ts, event_type, value) — each user's most
    recent event: the QUALIFY row_number() = 1 idiom, THE most common
    warehouse dedup ("latest record per key"). One window on the single
    per-key exchange; ties broken by event_id desc so both engines pick
    the same row. At scale this beats a groupBy(max) + self-join (one
    shuffle, no re-join) and is the pattern CDC snapshot reads use."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        ev.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .select("user_id", "event_id", "ts", "event_type", "value")
    )


LATEST_EVENT_PER_USER_SQL = """
SELECT user_id, event_id, ts, event_type, value
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id
                           ORDER BY ts DESC, event_id DESC) = 1
"""


# ---------------------------------------------------------------------------
# Interval-overlap join (bin-bucketed theta→equi rewrite)
# ---------------------------------------------------------------------------


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    a_lo: str,
    a_hi: str,
    b_lo: str,
    b_hi: str,
    bin_width: float,
) -> DataFrame:
    """All (a, b) row pairs whose closed intervals [a_lo, a_hi] and
    [b_lo, b_hi] overlap — the 1-D generalization of the reference's
    grid trick (J1, SURVEY.md §2.3): a raw ``a_lo <= b_hi AND b_lo <=
    a_hi`` theta-join plans as a nested loop; binning both sides to
    ``bin_width`` buckets and equi-joining on the bin makes it a hash
    join whose candidates are only bin-cohabitants.

    Exactly-once emission WITHOUT a distinct: two overlapping intervals
    share every bin their intersection touches, so each pair is kept
    only at the FIRST shared bin (``bin == max(⌊a_lo/W⌋, ⌊b_lo/W⌋)``) —
    a codegen residual, no dedup shuffle. Pick ``bin_width`` near the
    typical interval length: candidates per pair ≈ interval/bin ratio,
    and the bin explode multiplies rows by ≈ (len/W + 1).

    Column names must be disjoint across ``a`` and ``b`` (pre-alias).
    Output: all columns of both sides for every overlapping pair.
    """
    def binned(df, lo, hi):
        b0 = F.floor(df[lo] / bin_width).cast("bigint")
        b1 = F.floor(df[hi] / bin_width).cast("bigint")
        return df.withColumn("__bin", F.explode(F.sequence(b0, b1)))

    A = binned(a, a_lo, a_hi)
    B = binned(b, b_lo, b_hi)
    first_shared = F.greatest(
        F.floor(F.col(a_lo) / bin_width), F.floor(F.col(b_lo) / bin_width)
    ).cast("bigint")
    return (
        A.join(B, "__bin")
        .filter(
            (F.col(a_lo) <= F.col(b_hi))
            & (F.col(b_lo) <= F.col(a_hi))
            & (F.col("__bin") == first_shared)
        )
        .drop("__bin")
    )


OVERLAP_DAY = "2024-01-02"  # one fixture day bounds the pair volume
VIEW_WIN_MIN = 30
PURCHASE_WIN_MIN = 10


def concurrent_view_purchase_windows(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """(view_id, purchase_id, overlap_sec) — every (view, purchase) pair
    on one fixture day whose activity windows ([ts, ts+30min] for views,
    [ts, ts+10min] for purchases) overlap in wall-clock time, regardless
    of user: the concurrency-analysis shape (capacity planning, ad
    co-visibility) where NO equi-key exists and the bin rewrite is what
    keeps the join hash-based. Overlap length emitted for downstream
    weighting; pair order pinned by ids."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.to_date("ts") == F.lit(OVERLAP_DAY)
    )
    us = lambda c: F.unix_micros(F.col(c))
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        us("ts").alias("v_lo"),
        (us("ts") + VIEW_WIN_MIN * 60_000_000).alias("v_hi"),
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        us("ts").alias("p_lo"),
        (us("ts") + PURCHASE_WIN_MIN * 60_000_000).alias("p_hi"),
    )
    pairs = interval_overlap_join(
        views, buys, "v_lo", "v_hi", "p_lo", "p_hi",
        bin_width=VIEW_WIN_MIN * 60_000_000,
    )
    overlap = (
        F.least(F.col("v_hi"), F.col("p_hi"))
        - F.greatest(F.col("v_lo"), F.col("p_lo"))
    ) / 1_000_000
    return pairs.select(
        "view_id", "purchase_id", F.round(overlap, 6).alias("overlap_sec")
    )


CONCURRENT_WINDOWS_SQL = f"""
WITH day AS (
  SELECT event_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us
  FROM events WHERE CAST(ts AS DATE) = DATE '{OVERLAP_DAY}'),
v AS (SELECT event_id AS view_id, us AS v_lo,
             us + {VIEW_WIN_MIN} * 60000000 AS v_hi
      FROM day WHERE event_type = 'view'),
p AS (SELECT event_id AS purchase_id, us AS p_lo,
             us + {PURCHASE_WIN_MIN} * 60000000 AS p_hi
      FROM day WHERE event_type = 'purchase')
SELECT view_id, purchase_id,
       round((least(v_hi, p_hi) - greatest(v_lo, p_lo)) / 1000000.0, 6)
         AS overlap_sec
FROM v JOIN p ON v_lo <= p_hi AND p_lo <= v_hi
"""


# ---------------------------------------------------------------------------
# SQL-text interface (spark.sql over registered views) — same engine, the
# other front door; Catalyst plans text and DataFrame calls identically
# ---------------------------------------------------------------------------

SHIPPING_PRIORITY_SQL = """
SELECT o.o_orderkey,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       o.o_orderdate, o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1995-03-15'
  AND l.l_shipdate > TIMESTAMP '1995-03-15'
GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


def shipping_priority_sqltext(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape executed from SQL TEXT (``spark.sql``), not the
    DataFrame API — pins the engine's second front door. The identical
    string runs on DuckDB as the oracle (ANSI subset both parse)."""
    for name in ("customer", "orders", "lineitem"):
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(SHIPPING_PRIORITY_SQL)


# ---------------------------------------------------------------------------
# Key-skew profiler — the diagnostic you run BEFORE picking a salting /
# AQE-skew-join strategy
# ---------------------------------------------------------------------------

def key_skew_profile(df: DataFrame, key: str) -> DataFrame:
    """One-row skew summary of ``key``'s distribution in ``df``.

    Every skew mitigation below (two-phase salting, salted joins, AQE
    skew splitting) starts from the same question: HOW skewed is this
    key? This operator answers it in two map-side-combined aggregations
    (per-key counts, then one row over the counts) — no scalar-subquery
    cross join: the Shannon entropy over key shares rewrites to
    ``ln T − (Σ c·ln c)/T``, so the total never has to be joined back.

    Columns: n_keys, n_rows, max_count, top1_share (heaviest key's row
    share), p50/p99_count (exact interpolated percentiles of the per-key
    counts), entropy (nats), entropy_uniform_ratio (1.0 = perfectly
    uniform keys; → 0 as one key dominates). Floats rounded to 6 for
    cross-engine hash equality (percentile/ln ulp drift — the
    round-before-compare device used engine-wide).
    """
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("cnt"))
    c = F.col("cnt").cast("double")
    agg = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").alias("n_rows"),
        F.max("cnt").alias("max_count"),
        F.percentile("cnt", F.lit(0.5)).alias("p50_raw"),
        F.percentile("cnt", F.lit(0.99)).alias("p99_raw"),
        F.sum(c * F.log(c)).alias("clnc"),
    )
    total = F.col("n_rows").cast("double")
    entropy = F.log(total) - F.col("clnc") / total
    return agg.select(
        "n_keys",
        "n_rows",
        "max_count",
        F.round(F.col("max_count") / total, 6).alias("top1_share"),
        F.round("p50_raw", 6).alias("p50_count"),
        F.round("p99_raw", 6).alias("p99_count"),
        F.round(entropy, 6).alias("entropy"),
        F.round(entropy / F.log(F.col("n_keys").cast("double")), 6).alias(
            "entropy_uniform_ratio"
        ),
    )


def event_user_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return key_skew_profile(load_table(spark, sf_dir, "events"), "user_id")


EVENT_USER_SKEW_PROFILE_SQL = """
WITH c AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id),
a AS (
  SELECT count(*) AS n_keys, sum(cnt) AS n_rows, max(cnt) AS max_count,
         quantile_cont(cnt, 0.5) AS p50_raw,
         quantile_cont(cnt, 0.99) AS p99_raw,
         sum(cnt::DOUBLE * ln(cnt::DOUBLE)) AS clnc
  FROM c)
SELECT n_keys, CAST(n_rows AS BIGINT) AS n_rows, max_count,
       round(max_count / n_rows::DOUBLE, 6) AS top1_share,
       round(p50_raw, 6) AS p50_count,
       round(p99_raw, 6) AS p99_count,
       round(ln(n_rows::DOUBLE) - clnc / n_rows::DOUBLE, 6) AS entropy,
       round((ln(n_rows::DOUBLE) - clnc / n_rows::DOUBLE)
             / ln(n_keys::DOUBLE), 6) AS entropy_uniform_ratio
FROM a
"""


# ---------------------------------------------------------------------------
# Skew-aware two-phase (salted) aggregation
# ---------------------------------------------------------------------------

SALT_BUCKETS = 8


def salted_item_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top event items by count via explicit two-phase salted aggregation.

    The skew pattern for hot grouping keys at cluster scale: phase 1
    aggregates on (item, salt) — hot keys split across SALT_BUCKETS
    reducers — phase 2 merges the partials per item. For plain counts
    Spark's own partial aggregation already does this (the oracle is a
    bare GROUP BY), so this operator exists to pin the *pattern* the
    engine applies when partial aggregation can't help (e.g.
    collect_list/exact-distinct states too big for one reducer).
    """
    ev = load_table(spark, sf_dir, "events")
    phase1 = (
        ev.withColumn("salt", (F.pmod(F.col("event_id"), F.lit(SALT_BUCKETS))).cast("int"))
        .groupBy("user_id", "salt")
        .agg(F.count(F.lit(1)).alias("partial_cnt"))
    )
    return (
        phase1.groupBy("user_id")
        .agg(F.sum("partial_cnt").alias("cnt"))
        .orderBy(F.desc("cnt"), "user_id")
        .limit(20)
    )


SALTED_ITEM_COUNTS_SQL = """
SELECT user_id, count(*) AS cnt FROM events
GROUP BY user_id ORDER BY cnt DESC, user_id LIMIT 20
"""


# ---------------------------------------------------------------------------
# Skew-hardened (salted) equi-join
# ---------------------------------------------------------------------------


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    fact_row_id: str,
    salt: int = SALT_BUCKETS,
) -> DataFrame:
    """Exact inner equi-join with the fact side's hot keys split across
    ``salt`` shuffle partitions — the manual skew-join pattern for when a
    shuffled join's hottest key exceeds one reducer (AQE's skew split
    handles sorted-bytes skew; this handles it at the partitioning level
    and also applies to shuffled-hash joins and to engines without AQE).

    Mechanics: each fact row gets a DETERMINISTIC salt derived from its
    unique ``fact_row_id`` (pmod of the id — no RNG, so retries/replays
    land identically); the dim side explodes into ``salt`` replicas, one
    per salt value; the join key becomes (key, salt). Every fact row
    meets exactly the one dim replica carrying its salt, so the result
    is EXACTLY the plain join's — which is what the registry oracle
    checks — while a key owning 20% of the fact now occupies ``salt``
    reducers instead of one. Cost: dim shuffle volume × salt (dims are
    small relative to facts by assumption; do NOT use this on fact-fact
    joins — bucket those instead, `sinks/parquet.py write_bucketed`).

    The dim side carries an explicit ``shuffle_hash`` hint: under a
    broadcast join there is no fact shuffle and salting is pointless —
    the operator pins the shuffled regime it is designed for (the 100 TB
    case where the dim outgrew the broadcast threshold).
    """
    salted_fact = fact.withColumn(
        "__salt", F.pmod(F.col(fact_row_id), F.lit(salt)).cast("int")
    )
    salted_dim = (
        dim.withColumn(
            "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
        )
        .withColumn("__salt", F.col("__salt").cast("int"))
        .hint("shuffle_hash")
    )
    out = salted_fact.join(
        salted_dim,
        (salted_fact[fact_key] == salted_dim[dim_key])
        & (salted_fact["__salt"] == salted_dim["__salt"]),
    )
    return out.drop("__salt")


def salted_segment_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(mktsegment, n_events, total_value) — events joined to the customer
    dimension through ``salted_join`` (user_id is the fixtures' skewed
    key), then aggregated per market segment. The oracle is the PLAIN
    join + aggregation: salting must be invisible in the result."""
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    joined = salted_join(ev, cust, "user_id", "c_custkey", "event_id")
    return joined.groupBy(F.col("c_mktsegment").alias("mktsegment")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 6).alias("total_value"),
    )


SALTED_SEGMENT_VALUE_SQL = """
SELECT c_mktsegment AS mktsegment,
       count(*) AS n_events,
       round(sum(value), 6) AS total_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# SCD2 history (slowly-changing-dimension type 2 from an event log)
# ---------------------------------------------------------------------------


def scd2_from_events(
    events: DataFrame,
    key: str = "user_id",
    attr: str = "event_type",
    ts: str = "ts",
    tiebreak: str = "event_id",
) -> DataFrame:
    """(key, state, valid_from, valid_to, is_current, n_events) — the
    type-2 slowly-changing-dimension history of ``attr`` per ``key``:
    one row per maximal run of consecutive identical values, half-open
    validity [valid_from, valid_to) with ``valid_to`` = the next run's
    start (NULL on the current row). The warehouse dim-maintenance
    shape, built declaratively: lag→change-flag→running-sum assigns run
    ids (the sessionization pattern with value-change instead of
    time-gap), one aggregation per run, and a lead() closes each
    interval. An incremental MERGE ingest is this same operator over
    history ∪ batch restricted to keys present in the batch — the
    log-derived form is the semantics, checked exactly by the oracle.

    Scale: two window passes and one aggregation, all partitioned by
    ``key`` — the single hash exchange any per-key history needs; no
    self-join, no range join, state bounded per key.
    """
    w = Window.partitionBy(key).orderBy(ts, tiebreak)
    changed = F.when(
        F.lag(attr).over(w).isNull() | (F.col(attr) != F.lag(attr).over(w)),
        1,
    ).otherwise(0)
    runs = events.select(key, attr, ts, tiebreak).withColumn(
        "__run", F.sum(changed).over(w)
    )
    per_run = runs.groupBy(key, "__run").agg(
        F.first(attr).alias("state"),
        F.min(ts).alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w_runs = Window.partitionBy(key).orderBy("__run")
    return (
        per_run.withColumn("valid_to", F.lead("valid_from").over(w_runs))
        .withColumn("is_current", F.col("valid_to").isNull())
        .select(key, "state", "valid_from", "valid_to", "is_current", "n_events")
    )


SCD2_SQL = """
WITH ordered AS (
  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id,
         CASE WHEN lag(event_type) OVER w IS NULL
                OR event_type <> lag(event_type) OVER w
              THEN 1 ELSE 0 END AS changed
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
runs AS (
  SELECT user_id, event_type, ts,
         sum(changed) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS run
  FROM ordered),
per_run AS (
  SELECT user_id, run, any_value(event_type) AS state,
         min(ts) AS valid_from, count(*) AS n_events
  FROM runs GROUP BY user_id, run)
SELECT user_id, state, valid_from,
       lead(valid_from) OVER (PARTITION BY user_id ORDER BY run) AS valid_to,
       lead(valid_from) OVER (PARTITION BY user_id ORDER BY run) IS NULL
         AS is_current,
       n_events
FROM per_run
"""


# ---------------------------------------------------------------------------
# Sketch aggregates (HLL++ / KLL-style) — the built-in approximate surface
# ---------------------------------------------------------------------------

def approx_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct users (HyperLogLog++) and value percentiles
    (approx quantile sketch) over events — the constant-memory analogues of
    the reference's sampling sketches (SURVEY.md §2.5). No SQL oracle
    (sketch internals differ across engines); property tests bound the
    error against the exact answers instead."""
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.percentile_approx("value", 0.5, 10000).alias("p50_value"),
        F.percentile_approx("value", 0.95, 10000).alias("p95_value"),
        F.count(F.lit(1)).alias("n_events"),
    )


# ---------------------------------------------------------------------------
# As-of join (point-in-time lookup) — union + window, no range join
# ---------------------------------------------------------------------------

def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
) -> DataFrame:
    """Generic as-of join: for each left row, the right row with the
    greatest ``right_time`` ≤ ``left_time`` within the same ``on`` key
    (inclusive), NULL-padding misses.

    Spark has no as-of primitive, and the naive formulation
    (``right_time <= left_time`` join + max) is an inequality join that
    Catalyst plans as a nested loop. This is the scalable rewrite: tag and
    union both sides, ONE hash shuffle on the key, sort within partitions
    by (time, side), and carry the latest right values forward with
    ``last(..., ignorenulls)`` over an unbounded-preceding row frame —
    O(n log n) per partition, no pair blow-up, AQE-splittable on hot keys.
    Right rows sort before left rows at equal timestamps, making the
    boundary inclusive. Ties among right rows on (key, right_time) are
    broken by the value tuple itself (tertiary sort key, ascending —
    NULLS FIRST), so the greatest value tuple wins and the output is
    deterministic even for duplicate-timestamp right rows; value columns
    must therefore be of orderable types (no maps).
    """
    lcols = left.columns
    tagged_l = left.select(
        F.col(on).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__v_{c}") for c in value_cols],
    )
    tagged_r = right.select(
        F.col(on).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__side", *[f"__v_{c}" for c in value_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # one select: every windowed column resolves against the ORIGINAL
    # __v_* columns (sequential withColumn would make later windows order
    # by already-rewritten values)
    u = tagged_l.unionByName(tagged_r).select(
        "__side",
        *lcols,
        *[
            F.last(f"__v_{c}", ignorenulls=True).over(w).alias(f"__v_{c}")
            for c in value_cols
        ],
    )
    return u.filter(F.col("__side") == 1).select(
        *lcols, *[F.col(f"__v_{c}").alias(f"asof_{c}") for c in value_cols]
    )


def events_last_click_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time feature: for every event, the same user's most recent
    'click' at or before it (self as-of). The canonical shape of
    leakage-free training-feature joins ("state of X as of event time")."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    return asof_join(
        ev.select("event_id", "user_id", "ts"),
        clicks,
        on="user_id",
        left_time="ts",
        right_time="click_ts",
        value_cols=["click_ts"],
    ).select(
        "event_id",
        "user_id",
        "ts",
        F.col("asof_click_ts").alias("last_click_ts"),
    )


# DuckDB has a native ASOF JOIN — the oracle for the union-window rewrite.
# Casts: the driver's events view is TIMESTAMP_NS parquet; Spark reads µs.
EVENTS_ASOF_SQL = """
SELECT e.event_id, e.user_id, CAST(e.ts AS TIMESTAMP) AS ts,
       CAST(c.ts AS TIMESTAMP) AS last_click_ts
FROM events e ASOF LEFT JOIN
     (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
      FROM events WHERE event_type = 'click') c
  ON e.user_id = c.user_id AND c.ts <= CAST(e.ts AS TIMESTAMP)
"""


ATTRIB_DAYS = 7


def purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    return attribute_purchases(ev)


def attribute_purchases(ev: DataFrame) -> DataFrame:
    """Interval join: for every purchase, the same user's click count and
    most recent click in the preceding 7 days. The windowed-attribution
    shape (range join on time) that complements the as-of join's
    nearest-one semantics.

    Plan shape: equi-join on ``user_id`` with the time range as a join
    residual — Catalyst plans a hash/sort-merge join keyed on user, so
    per-task work is bounded by per-user event counts (no interval
    explosion, no nested loop). A left join keeps zero-click purchases
    with n_clicks_7d = 0, matching SQL count(col) semantics. Join-key
    skew (a hot user) is AQE's skew-split territory — the session
    enables it (session.py) and tests/test_skew.py plants a 20% hot key.
    """
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("purchase_ts")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts")
    )
    joined = purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {ATTRIB_DAYS} DAYS")),
        "left",
    )
    return joined.groupBy("event_id", "user_id", "purchase_ts").agg(
        F.count("click_ts").alias("n_clicks_7d"),
        F.max("click_ts").alias("last_click_ts"),
    )


# CASTs keep the oracle unit-robust: on a TIMESTAMP_NS fixture DuckDB ≥1.1
# scans ns-typed values; casting to TIMESTAMP truncates to µs exactly like
# Spark's loader.
PURCHASE_ATTRIBUTION_SQL = f"""
SELECT p.event_id, p.user_id, CAST(p.ts AS TIMESTAMP) AS purchase_ts,
       count(CAST(c.ts AS TIMESTAMP)) AS n_clicks_7d,
       max(CAST(c.ts AS TIMESTAMP)) AS last_click_ts
FROM events p LEFT JOIN events c
  ON p.user_id = c.user_id AND c.event_type = 'click'
 AND CAST(c.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP)
 AND CAST(c.ts AS TIMESTAMP) >= CAST(p.ts AS TIMESTAMP) - INTERVAL {ATTRIB_DAYS} DAY
WHERE p.event_type = 'purchase'
GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# Exact grouped quantiles — the exact twin of approx_event_stats
# ---------------------------------------------------------------------------

def event_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p25/p50/p75 of event value per event_type.

    ``percentile`` (exact, linearly interpolated) is the ground-truth
    twin of the ``percentile_approx`` sketch in ``approx_event_stats``:
    it shuffles every value to its group (one hash aggregation holding a
    per-group sorted buffer), which is exactly the cost the sketch
    avoids — keeping both on the menu documents the trade. DuckDB's
    ``quantile_cont`` uses the same (n-1)·p linear interpolation, so the
    oracle matches bit-for-bit after output rounding.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.25)"), 6).alias("p25_value"),
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50_value"),
        F.round(F.expr("percentile(value, 0.75)"), 6).alias("p75_value"),
        F.count(F.lit(1)).alias("n_events"),
    )


EVENT_VALUE_QUANTILES_SQL = """
SELECT event_type,
       round(quantile_cont(value, 0.25), 6) AS p25_value,
       round(quantile_cont(value, 0.5), 6) AS p50_value,
       round(quantile_cont(value, 0.75), 6) AS p75_value,
       count(*) AS n_events
FROM events
GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# Disjunctive join predicate (TPC-H Q19 shape) — OR-of-ANDs spanning both
# join sides must still plan as a single hash join, not a nested loop
# ---------------------------------------------------------------------------

def disjunctive_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row discounted-revenue total over lineitem⋈part where the join
    carries an OR-of-ANDs mixing columns from BOTH sides (TPC-H Q19's
    signature shape; the reference has no joins at all — SURVEY.md §2.3).

    The plan hazard this query pins: a disjunction spanning both sides
    can't be pushed to either scan, and a naive planner falls back to a
    nested loop. Catalyst instead extracts the common equi-conjunct
    (l_partkey = p_partkey) as the hash-join key and keeps the OR as a
    post-join residual — so the 100 TB fact side is joined hash-wise
    against the broadcast dimension and the disjunction costs one
    vectorized filter over matched rows. tests/test_plan_lint.py's
    no-cartesian sweep plus the dedicated plan test pin that shape.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    arm1 = (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    )
    arm2 = (
        (F.col("p_brand") == "Brand#17")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 40)
    )
    arm3 = (F.col("p_type") == "ECONOMY") & (F.col("l_quantity") >= 30)
    return (
        li.join(
            F.broadcast(part),
            (li.l_partkey == part.p_partkey) & (arm1 | arm2 | arm3),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("promo_revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


DISJUNCTIVE_PROMO_SQL = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS promo_revenue,
       count(*) AS n_lineitems
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#17' AND p_size BETWEEN 10 AND 30
       AND l_quantity BETWEEN 10 AND 40)
   OR (p_type = 'ECONOMY' AND l_quantity >= 30)
"""


# ---------------------------------------------------------------------------
# Scalar subquery + anti join (TPC-H Q22 shape) — a 1-row aggregate used
# as a comparison threshold inside the main query's filter
# ---------------------------------------------------------------------------

WEALTHY_INACTIVE_SQL = """
SELECT c_mktsegment,
       count(*) AS n_customers,
       round(sum(c_acctbal), 2) AS total_bal
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
GROUP BY c_mktsegment
"""


def wealthy_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Above-average-balance customers with no finalized order, by segment
    (TPC-H Q22's shape), executed from SQL TEXT so Catalyst plans the
    scalar subquery itself.

    Two plan features in one query: the 1-row scalar subquery becomes an
    independent broadcast stage reused as a literal in the scan filter
    (NOT a per-row re-evaluation), and the NOT EXISTS becomes a left-anti
    hash join. At 100 TB the threshold subquery costs one map-side-
    combined aggregation of the balance column; the anti join shuffles on
    the customer key only. The identical ANSI string is the DuckDB
    oracle. (The o_orderstatus = 'F' restriction keeps the anti side
    non-trivial — see ``customers_without_orders``.)
    """
    for name in ("customer", "orders"):
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(WEALTHY_INACTIVE_SQL)


# ---------------------------------------------------------------------------
# Ordered funnel (sequence matching): view → click → purchase, in order
# ---------------------------------------------------------------------------

# Funnel window: first fixture day only. Over the whole 30-day fixture
# every user completes every stage (150/150/150 — a trivially-passing
# oracle); one day yields distinct per-stage counts at every SF.
FUNNEL_END = "2024-01-02 00:00:00"


def conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row (n_viewed, n_clicked_after_view, n_purchased_after_click):
    how many users completed each prefix of the ordered funnel
    view → click → purchase within the first fixture day — each later
    stage strictly AFTER the user's first qualifying earlier stage.

    Sequence matching without a self-join: stage k's timestamp is a
    conditional ``min`` window over the user partition referencing stage
    k-1's column, so the three chained windows share ONE hash partition
    by user_id (Catalyst reuses the exchange; ``.explain`` shows a single
    shuffle). The alternative — k-way self-join on user with time
    predicates — shuffles the fact table k times and explodes on hot
    users. Timestamps are compared at µs (the loader's unit), keeping the
    strict inequalities engine-portable on ns-typed fixtures.
    """
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_type")
        .filter(F.col("ts") < F.lit(FUNNEL_END).cast("timestamp"))
    )
    w = Window.partitionBy("user_id")
    t1 = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    step1 = ev.withColumn("t1", t1)
    t2 = F.min(
        F.when(
            (F.col("event_type") == "click") & (F.col("ts") > F.col("t1")),
            F.col("ts"),
        )
    ).over(w)
    step2 = step1.withColumn("t2", t2)
    t3 = F.min(
        F.when(
            (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t2")),
            F.col("ts"),
        )
    ).over(w)
    per_user = (
        step2.withColumn("t3", t3)
        .groupBy("user_id")
        .agg(
            F.min("t1").alias("t1"),
            F.min("t2").alias("t2"),
            F.min("t3").alias("t3"),
        )
    )
    return per_user.agg(
        F.count("t1").alias("n_viewed"),
        F.count("t2").alias("n_clicked_after_view"),
        F.count("t3").alias("n_purchased_after_click"),
    )


CONVERSION_FUNNEL_SQL = f"""
WITH e AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events
  WHERE CAST(ts AS TIMESTAMP) < TIMESTAMP '{FUNNEL_END}'),
s1 AS (
  SELECT user_id, ts, event_type,
         min(CASE WHEN event_type = 'view' THEN ts END)
           OVER (PARTITION BY user_id) AS t1
  FROM e),
s2 AS (
  SELECT user_id, ts, event_type, t1,
         min(CASE WHEN event_type = 'click' AND ts > t1 THEN ts END)
           OVER (PARTITION BY user_id) AS t2
  FROM s1),
s3 AS (
  SELECT user_id, t1, t2,
         min(CASE WHEN event_type = 'purchase' AND ts > t2 THEN ts END)
           OVER (PARTITION BY user_id) AS t3
  FROM s2),
pu AS (
  SELECT user_id, min(t1) AS t1, min(t2) AS t2, min(t3) AS t3
  FROM s3 GROUP BY user_id)
SELECT count(t1) AS n_viewed,
       count(t2) AS n_clicked_after_view,
       count(t3) AS n_purchased_after_click
FROM pu
"""


# ---------------------------------------------------------------------------
# Pivot / unpivot — the wide↔long reshaping surface
# ---------------------------------------------------------------------------

EVENT_TYPES = ("view", "click", "purchase", "signup", "error")


def user_event_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, n_view, n_click, n_purchase, n_signup, n_error) — the
    per-user event-type matrix via ``groupBy().pivot()``.

    The pivot value list is EXPLICIT (the five fixture event types): with
    it, Spark plans one pass (pivot compiles to conditional aggregates —
    the same plan as the DuckDB oracle's CASE sums); without it, Spark
    must first run a distinct scan to discover values, an extra job a
    100 TB pipeline should never pay for a known vocabulary. Missing
    combinations surface as 0 (count semantics), not null.
    """
    ev = load_table(spark, sf_dir, "events")
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
    )
    return out.select(
        "user_id",
        *[
            F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}")
            for t in EVENT_TYPES
        ],
    )


# NOTE: the conditional counts are CAST to BIGINT on the oracle side.
# DuckDB types sum(CASE ... 1 ELSE 0 END) as HUGEINT, and its pandas
# fetch path (fetchdf) renders HUGEINT as float64 — so a driver that
# compares via pandas hashes 4.0 against Spark's 4 and reds the row
# even though every tuple is identical.  count(*) FILTER would also
# work (BIGINT natively); the explicit CAST keeps the CASE shape that
# mirrors the Spark pivot plan.  tests/test_oracle_types.py lints every
# registered oracle for this class of portability bug.
USER_EVENT_PIVOT_SQL = """
SELECT user_id,
       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
       CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error
FROM events GROUP BY user_id
"""


def user_event_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, event_type, n_events) — the long form back out of the
    pivoted matrix via ``DataFrame.unpivot`` (wide→long melt), zero rows
    dropped: the round-trip ``pivot |> unpivot`` preserves every nonzero
    count, which is what the oracle (a plain GROUP BY of the base table)
    checks. Unpivot is a zero-shuffle projection (each input row explodes
    to V output rows map-side).
    """
    wide = user_event_pivot(spark, sf_dir)
    return (
        wide.unpivot(
            "user_id",
            [f"n_{t}" for t in EVENT_TYPES],
            "event_type",
            "n_events",
        )
        .filter(F.col("n_events") > 0)
        .withColumn("event_type", F.expr("substring(event_type, 3)"))
    )


USER_EVENT_UNPIVOT_SQL = """
SELECT user_id, event_type, count(*) AS n_events
FROM events GROUP BY user_id, event_type
"""


# ---------------------------------------------------------------------------
# Variant semi-structured surface (Spark 4): parse once, extract many
# ---------------------------------------------------------------------------

def event_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(k_decile, n_events, n_event_types, max_k) — props decoded through
    the VARIANT type: ``parse_json`` parses each JSON string ONCE into
    Spark's binary-encoded variant; ``variant_get`` then extracts typed
    paths without re-parsing. That's the semi-structured contract at
    100 TB — ``get_json_object`` (the `event_props_stats` twin) re-parses
    the string per extraction, so a query touching f fields pays f parses
    per row; variant pays one. Grouping by the extracted value's decile
    exercises the typed path end-to-end (cast inside the engine, not at
    the output boundary).
    """
    ev = load_table(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json(F.col("props")), "$.k", "bigint")
    return (
        ev.select(k.alias("k"), "event_type")
        .groupBy(F.floor(F.col("k") / 10).cast("bigint").alias("k_decile"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("event_type").alias("n_event_types"),
            F.max("k").alias("max_k"),
        )
    )


EVENT_PROPS_VARIANT_SQL = """
WITH k AS (
  SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, event_type
  FROM events)
SELECT CAST(floor(k / 10.0) AS BIGINT) AS k_decile,
       count(*) AS n_events,
       count(DISTINCT event_type) AS n_event_types,
       max(k) AS max_k
FROM k GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Supplier-side revenue (completes fixture-table coverage: supplier was
# the one table no query touched)
# ---------------------------------------------------------------------------

def top_suppliers_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 suppliers by lineitem revenue with their nation (TPC-H
    Q15's shape): aggregate the fact FIRST (map-side-combined groupBy on
    l_suppkey — the shuffle carries per-supplier partials, not line
    items), THEN join the small per-supplier aggregate to the broadcast
    supplier/nation dims. Joining before aggregating would shuffle the
    whole fact table through the join; at 100 TB the agg-then-join order
    is the difference between moving partials and moving the corpus.
    """
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    rev = (
        li.groupBy("l_suppkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )
    return (
        rev.join(F.broadcast(sup), rev.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .select("s_suppkey", "s_name", "n_name", "revenue", "n_lineitems")
        .orderBy(F.desc("revenue"), "s_suppkey")
        .limit(10)
    )


TOP_SUPPLIERS_SQL = """
WITH rev AS (
  SELECT l_suppkey,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
         count(*) AS n_lineitems
  FROM lineitem GROUP BY l_suppkey)
SELECT s_suppkey, s_name, n_name, revenue, n_lineitems
FROM rev
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
ORDER BY revenue DESC, s_suppkey LIMIT 10
"""


# ---------------------------------------------------------------------------
# Range-frame rolling window (event-time moving aggregate)
# ---------------------------------------------------------------------------

ROLLING_SECONDS = 3600


def events_rolling_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_id, user_id, ts, n_1h, sum_1h) — per event, the count and
    value sum of the SAME user's events in the trailing hour (current row
    included): the RANGE window frame, bounded by the ORDER-BY value
    rather than a row count — the event-time rolling metric shape
    (rolling spend, rate limiting, burst detection).

    Row frames (``rowsBetween``) are pinned elsewhere (`user_sessions`);
    this pins the range frame: frame membership follows event-time
    spacing, so the same plan serves sparse and bursty users. Partitioned
    by user_id — bounded state per key, no global window. Both engines
    order by epoch SECONDS (Spark's long cast and DuckDB's floored epoch
    agree at the loader's µs precision).
    """
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").cast("long"))
        .rangeBetween(-(ROLLING_SECONDS - 1), 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.count(F.lit(1)).over(w).alias("n_1h"),
        F.round(F.sum("value").over(w), 6).alias("sum_1h"),
    )


EVENTS_ROLLING_SQL = f"""
SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
       count(*) OVER w AS n_1h,
       round(sum(value) OVER w, 6) AS sum_1h
FROM events
WINDOW w AS (PARTITION BY user_id
             ORDER BY CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
             RANGE BETWEEN {ROLLING_SECONDS - 1} PRECEDING AND CURRENT ROW)
"""


# ---------------------------------------------------------------------------
# Gap-filled time series (spine join): empty windows surface as zeros
# ---------------------------------------------------------------------------

def windowed_counts_gapfilled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(win_start, event_type, n_events) — hourly counts per type with an
    EXPLICIT zero row for every (hour, type) that saw no events: the
    gap-filling pattern every time-series consumer needs (a monitoring
    chart that silently skips empty hours hides outages).

    The spine is generated, not scanned: the min/max hour come from one
    1-row aggregate, ``sequence`` explodes the complete hour range, and
    the 5-row type dictionary cross-joins onto it — a broadcast of two
    tiny generated sides, NOT a join of fact data (the fact table joins
    once, by (hour, type) against the spine). Spine size = hours × types,
    independent of event volume.
    """
    ev = load_table(spark, sf_dir, "events")
    hour = F.date_trunc("hour", F.col("ts"))
    counts = ev.groupBy(
        hour.alias("win_start"), "event_type"
    ).agg(F.count(F.lit(1)).alias("cnt"))
    spine_hours = (
        ev.agg(
            F.min(hour).alias("lo"),
            F.max(hour).alias("hi"),
        )
        .select(
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
            ).alias("win_start")
        )
    )
    types = ev.select("event_type").distinct()
    spine = spine_hours.crossJoin(F.broadcast(types))
    return (
        spine.join(counts, ["win_start", "event_type"], "left")
        .select(
            "win_start",
            "event_type",
            F.coalesce("cnt", F.lit(0)).alias("n_events"),
        )
    )


WINDOWED_GAPFILL_SQL = """
WITH bounds AS (
  SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
  FROM events),
hours AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS win_start
  FROM bounds),
types AS (SELECT DISTINCT event_type FROM events),
counts AS (
  SELECT date_trunc('hour', ts) AS win_start, event_type, count(*) AS cnt
  FROM events GROUP BY 1, 2)
SELECT h.win_start, t.event_type,
       CAST(coalesce(c.cnt, 0) AS BIGINT) AS n_events
FROM hours h CROSS JOIN types t
LEFT JOIN counts c ON c.win_start = h.win_start AND c.event_type = t.event_type
"""


def user_sessions_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, session_start, session_end, n_events) — the same 30-min
    inactivity sessions via Spark's NATIVE ``session_window`` aggregate
    (the one-liner form; the lag→cumsum twin above is the portable
    construction). Boundary semantics (verified empirically on Spark
    4.1.2 and pinned in ``tests/test_extensions.py``'s exact-gap test):
    two events EXACTLY ``gap`` apart land in ONE session — the native
    aggregate merges windows whose [start, last+gap) spans touch —
    which is the same rule as the cumsum twin's strict ``gap >`` flag.
    ``session_end`` is last event + gap, per the native definition.
    Same body runs in streaming with a watermark —
    the state-store-native alternative to ``applyInPandasWithState``
    sessionization (`streaming/sessions.py`).
    """
    ev = load_table(spark, sf_dir, "events")
    w = F.session_window("ts", f"{SESSION_GAP_MIN} minutes")
    return (
        ev.groupBy(w.alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


USER_SESSIONS_NATIVE_SQL = f"""
WITH ev AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id FROM events),
flagged AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL {SESSION_GAP_MIN} MINUTE
              THEN 1 ELSE 0 END AS new_sess
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sess AS (
  SELECT user_id, ts,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_id
  FROM flagged)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL {SESSION_GAP_MIN} MINUTE AS session_end,
       count(*) AS n_events
FROM sess GROUP BY user_id, session_id
"""


# ---------------------------------------------------------------------------
# Bag-semantics set operators (§2.7 completion: EXCEPT ALL / INTERSECT ALL)
# ---------------------------------------------------------------------------

def returned_month_bag_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset comparison of the ship-month bags of RETURNED (flag R)
    vs ACCEPTED (flag A) lineitems: per month, ``n_excess_returns`` =
    bag difference (how many R occurrences have no matching A occurrence
    — ``exceptAll``, duplicates significant) and ``n_matched`` = bag
    intersection (``intersectAll``). The distinct-set ops at §2.7 can't
    see multiplicity; these are their bag twins, planned by Catalyst as
    aggregate-count + generate (no join explosion: both rewrites carry
    (value, count) pairs, so the shuffle is month-cardinality-bounded).

    Months with zero in both outputs vanish from the union by
    definition; a full-outer join re-aligns the two aggregates with
    zero-fill so the report is one row per month that has either."""
    from ..sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    month = F.date_format("l_shipdate", "yyyy-MM").alias("ship_month")
    r = li.filter(F.col("l_returnflag") == "R").select(month)
    a = li.filter(F.col("l_returnflag") == "A").select(month)
    exc = (
        r.exceptAll(a)
        .groupBy("ship_month")
        .agg(F.count(F.lit(1)).alias("n_excess_returns"))
    )
    inter = (
        r.intersectAll(a)
        .groupBy("ship_month")
        .agg(F.count(F.lit(1)).alias("n_matched"))
    )
    return (
        exc.join(inter, "ship_month", "full_outer")
        .select(
            "ship_month",
            F.coalesce("n_excess_returns", F.lit(0)).alias(
                "n_excess_returns"
            ),
            F.coalesce("n_matched", F.lit(0)).alias("n_matched"),
        )
    )


RETURNED_MONTH_BAG_DIFF_SQL = """
WITH r AS (SELECT strftime(l_shipdate, '%Y-%m') AS ship_month
           FROM lineitem WHERE l_returnflag = 'R'),
a AS (SELECT strftime(l_shipdate, '%Y-%m') AS ship_month
      FROM lineitem WHERE l_returnflag = 'A'),
exc AS (
  SELECT ship_month, count(*) AS n_excess_returns
  FROM (SELECT ship_month FROM r EXCEPT ALL SELECT ship_month FROM a)
  GROUP BY 1),
inter AS (
  SELECT ship_month, count(*) AS n_matched
  FROM (SELECT ship_month FROM r INTERSECT ALL SELECT ship_month FROM a)
  GROUP BY 1)
SELECT coalesce(exc.ship_month, inter.ship_month) AS ship_month,
       coalesce(n_excess_returns, 0) AS n_excess_returns,
       coalesce(n_matched, 0) AS n_matched
FROM exc FULL OUTER JOIN inter ON exc.ship_month = inter.ship_month
"""


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
) -> DataFrame:
    """Forward as-of join: for each left row, the right row with the
    SMALLEST ``right_time`` ≥ ``left_time`` within the same ``on`` key
    (inclusive), NULL-padding misses — the mirror of ``asof_join``
    ("next event after", escalation/repair/next-restock semantics).

    Same union-window rewrite, mirrored: left rows sort BEFORE right
    rows at equal timestamps (side 0 < 1) so the boundary stays
    inclusive, and the carried value is ``first(..., ignorenulls)`` over
    the current-row→unbounded-FOLLOWING frame. Ties among right rows on
    (key, right_time) break by the value tuple ascending, so the
    smallest value tuple wins deterministically.
    """
    lcols = left.columns
    tagged_l = left.select(
        F.col(on).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.col(c) for c in lcols],
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"__v_{c}")
            for c in value_cols
        ],
    )
    tagged_r = right.select(
        F.col(on).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__side", *[f"__v_{c}" for c in value_cols])
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    u = tagged_l.unionByName(tagged_r).select(
        "__side",
        *lcols,
        *[
            F.first(f"__v_{c}", ignorenulls=True).over(w).alias(f"__v_{c}")
            for c in value_cols
        ],
    )
    return u.filter(F.col("__side") == 0).select(
        *lcols, *[F.col(f"__v_{c}").alias(f"asof_{c}") for c in value_cols]
    )


PURCHASE_ERROR_TOLERANCE_SEC = 3600


def purchase_next_error_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of with tolerance: for every purchase, the same user's
    NEXT 'error' event within one hour (NULL past the tolerance — "did
    this purchase hit a failure right after?"). The tolerance is an
    integer epoch-second comparison applied AFTER the as-of resolve, so
    the matched row is always the nearest-following one, not the
    nearest-within-window one — ASOF semantics, identical in the DuckDB
    oracle's native ASOF JOIN + CASE."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", F.col("ts").alias("error_ts")
    )
    joined = asof_join_forward(
        purchases,
        errors,
        on="user_id",
        left_time="ts",
        right_time="error_ts",
        value_cols=["error_ts"],
    )
    within = (
        F.col("asof_error_ts").cast("long") - F.col("ts").cast("long")
        <= PURCHASE_ERROR_TOLERANCE_SEC
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.when(within, F.col("asof_error_ts")).alias("next_error_ts"),
    )


PURCHASE_NEXT_ERROR_SQL = f"""
SELECT p.event_id, p.user_id, CAST(p.ts AS TIMESTAMP) AS ts,
       CASE WHEN CAST(epoch(x.ts) AS BIGINT)
                 - CAST(epoch(p.ts) AS BIGINT)
                 <= {PURCHASE_ERROR_TOLERANCE_SEC}
            THEN CAST(x.ts AS TIMESTAMP) END AS next_error_ts
FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN
     (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
      FROM events WHERE event_type = 'error') x
  ON p.user_id = x.user_id AND x.ts >= p.ts
"""


def order_value_distribution_profile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Windowed distribution profile completing the ranking-function
    surface (§2.8): per (priority, quartile) — quartile by NTILE(4) over
    o_totalprice within each o_orderpriority — the row count and the
    min/max percent_rank and cume_dist (rounded to 6). Orders within a
    window sort by (o_totalprice, o_orderkey): the unique key tie-break
    makes every rank function deterministic and engine-identical."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    ranked = orders.select(
        "o_orderpriority",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )
    return ranked.groupBy("o_orderpriority", "quartile").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.min("pr"), 6).alias("min_pct_rank"),
        F.round(F.max("pr"), 6).alias("max_pct_rank"),
        F.round(F.max("cd"), 6).alias("max_cume_dist"),
    )


ORDER_VALUE_DISTRIBUTION_SQL = """
WITH ranked AS (
  SELECT o_orderpriority,
         ntile(4) OVER w AS quartile,
         percent_rank() OVER w AS pr,
         cume_dist() OVER w AS cd
  FROM orders
  WINDOW w AS (PARTITION BY o_orderpriority
               ORDER BY o_totalprice, o_orderkey))
SELECT o_orderpriority, quartile, count(*) AS n_orders,
       round(min(pr), 6) AS min_pct_rank,
       round(max(pr), 6) AS max_pct_rank,
       round(max(cd), 6) AS max_cume_dist
FROM ranked
GROUP BY 1, 2
"""


def revenue_gini_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-market-segment Gini coefficient of customer spend — the
    inequality/concentration audit ("how head-heavy is this segment?"):
    the same question a data curator asks of source or domain token
    shares before fixing mixture weights.

    Exact and order-independent: spend is integer cents (per-row round
    THEN sum — the ``customer_value_skyline`` device), ranks come from a
    per-segment window ordered by (spend_cents, custkey) (unique key ⇒
    deterministic), and the classic identity
    ``G = (2·Σ rank·x) / (n·Σx) − (n+1)/n`` is evaluated from three
    integer sums per segment, rounded to 6 at the very end. One
    customer-keyed aggregate + one segment-keyed window/aggregate pair;
    zero-spend customers (no orders) are excluded by the inner join —
    documented contract (Gini over BUYERS, not the population)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    spend = orders.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.sum(
            F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
        ).alias("cents")
    )
    pts = spend.join(
        customer.select("c_custkey", "c_mktsegment"), "c_custkey"
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("cents").asc(), F.col("c_custkey").asc()
    )
    ranked = pts.select(
        "c_mktsegment",
        "cents",
        F.row_number().over(w).alias("rk"),
    )
    return ranked.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_buyers"),
        F.sum("cents").alias("total_cents"),
        F.round(
            F.lit(2.0)
            * F.sum(F.col("rk") * F.col("cents"))
            / (F.count(F.lit(1)) * F.sum("cents"))
            - (F.count(F.lit(1)) + F.lit(1.0)) / F.count(F.lit(1)),
            6,
        ).alias("gini"),
    )


REVENUE_GINI_SQL = """
WITH spend AS (
  SELECT o_custkey AS c_custkey,
         SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS cents
  FROM orders GROUP BY 1),
ranked AS (
  SELECT c.c_mktsegment, s.cents,
         row_number() OVER (PARTITION BY c.c_mktsegment
                            ORDER BY s.cents, s.c_custkey) AS rk
  FROM spend s JOIN customer c USING (c_custkey))
SELECT c_mktsegment,
       count(*) AS n_buyers,
       CAST(sum(cents) AS BIGINT) AS total_cents,
       round(2.0 * sum(rk * cents) / (count(*) * CAST(sum(cents) AS DOUBLE))
             - (count(*) + 1.0) / count(*), 6) AS gini
FROM ranked
GROUP BY 1
"""
