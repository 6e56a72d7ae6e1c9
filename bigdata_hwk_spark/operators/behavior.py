"""Behavioral sequence analytics over the event stream: Markov
transition matrix and cohort retention.

Extension surface (no reference counterpart): the two reports every
product/telemetry pipeline asks of an events table — "what follows
what" (first-order Markov transitions, the input to journey mining and
next-event prediction) and "who comes back" (cohort retention curves).
Both are pure window + aggregate plans; both oracles are the literal
definitions in DuckDB SQL.

Determinism: event order within a user is (ts, event_id) — event_id is
unique, so ``lead`` is well-defined under any partitioning; week
arithmetic is integer epoch-day division (identical in both engines, no
timezone dependence — the session pins UTC); probabilities are ratios of
exact integer counts rounded to 6.

Scale shape: transitions are ONE shuffle (hash by user for the window)
plus a map-side-combined (from, to) tally whose size is |event-type
alphabet|²; retention is the same user-keyed shuffle, a distinct on
(user, cohort, offset) — bounded by active user-weeks, the table's
information content — and a cohort-keyed aggregate of at most
cohorts × offsets rows. Nothing driver-side, no Python row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def event_transition_matrix(events: DataFrame) -> DataFrame:
    """(from_type, to_type, n_transitions, prob): first-order Markov
    transition counts per user journey; ``prob`` row-normalizes each
    ``from_type`` (rounded to 6). Terminal events (a user's last) emit
    no transition."""
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    seq = events.select(
        "user_id",
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    counts = seq.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    wf = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n_transitions",
        F.round(
            F.col("n_transitions") / F.sum("n_transitions").over(wf), 6
        ).alias("prob"),
    )


EVENT_TRANSITION_MATRIX_SQL = """
WITH seq AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS to_type
  FROM events),
counts AS (
  SELECT from_type, to_type, count(*) AS n_transitions
  FROM seq WHERE to_type IS NOT NULL
  GROUP BY 1, 2)
SELECT from_type, to_type, n_transitions,
       round(n_transitions / CAST(
         sum(n_transitions) OVER (PARTITION BY from_type) AS DOUBLE),
         6) AS prob
FROM counts
"""


def user_retention_cohorts(events: DataFrame) -> DataFrame:
    """(cohort_week, week_offset, n_users, retention): users grouped by
    the absolute epoch-week of their FIRST event; ``retention`` is the
    share of the cohort active again ``week_offset`` weeks later
    (offset 0 is the cohort itself, retention 1.0 by definition)."""
    wk = F.floor(F.col("ts").cast("long") / (7 * 86400)).alias("w")
    uw = events.select("user_id", wk)
    first = Window.partitionBy("user_id")
    active = uw.select(
        "user_id",
        F.min("w").over(first).alias("cohort_week"),
        (F.col("w") - F.min("w").over(first)).alias("week_offset"),
    ).distinct()
    per_cell = active.groupBy("cohort_week", "week_offset").agg(
        F.countDistinct("user_id").alias("n_users")
    )
    wc = Window.partitionBy("cohort_week")
    return per_cell.select(
        "cohort_week",
        "week_offset",
        "n_users",
        F.round(
            F.col("n_users")
            / F.max(
                F.when(F.col("week_offset") == 0, F.col("n_users"))
            ).over(wc),
            6,
        ).alias("retention"),
    )


USER_RETENTION_COHORTS_SQL = """
WITH uw AS (
  SELECT user_id,
         CAST(floor(epoch(ts) / (7 * 86400)) AS BIGINT) AS w
  FROM events),
active AS (
  SELECT DISTINCT user_id,
         min(w) OVER (PARTITION BY user_id) AS cohort_week,
         w - min(w) OVER (PARTITION BY user_id) AS week_offset
  FROM uw),
per_cell AS (
  SELECT cohort_week, week_offset, count(DISTINCT user_id) AS n_users
  FROM active GROUP BY 1, 2)
SELECT cohort_week, week_offset, n_users,
       round(n_users / CAST(max(CASE WHEN week_offset = 0 THEN n_users END)
         OVER (PARTITION BY cohort_week) AS DOUBLE), 6) AS retention
FROM per_cell
"""


# ---------------------------------------------------------------------------
# Hash-assigned A/B experiment report
# ---------------------------------------------------------------------------

AB_ACTIVATION_WINDOW_SEC = 24 * 3600


def ab_test_report(
    events: DataFrame,
    salt: str = "ab1",
    activation_window_sec: int = AB_ACTIVATION_WINDOW_SEC,
) -> DataFrame:
    """One-row A/B readout with deterministic hash assignment: users land
    in control/treatment by the engine-portable salted md5 (the
    ``hash_split`` device — assignment is a pure function of user_id, so
    re-runs, backfills, and the DuckDB oracle agree bit-for-bit), a user
    CONVERTS by purchasing within ``activation_window_sec`` of their
    FIRST event (an activation metric — "ever purchased" saturates to 1.0
    on any long-horizon fixture and reads out nothing, measured), and the
    report is conversion counts, rates, and absolute uplift (ratios of
    exact integers, rounded to 6; window arithmetic is integer epoch
    seconds in both engines).

    Scale shape: one user-keyed shuffle shared by the first-event window
    and the conversion flag (both map-side-combinable per user), then a
    ≤2-row conditional fold to one row. Nothing driver-side."""
    from ..functions.hashing import md5_hash64

    arm = (
        md5_hash64(F.concat(F.lit(salt + ":"), F.col("user_id"))) % 2
    ).alias("arm")
    wu = Window.partitionBy("user_id")
    flagged = events.select(
        "user_id",
        arm,
        F.when(
            (F.col("event_type") == "purchase")
            & (
                F.col("ts").cast("long")
                - F.min(F.col("ts").cast("long")).over(wu)
                <= activation_window_sec
            ),
            1,
        )
        .otherwise(0)
        .alias("is_conv_event"),
    )
    per_user = flagged.groupBy("user_id", "arm").agg(
        F.max("is_conv_event").alias("converted")
    )
    return per_user.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n_control"),
        F.sum(
            F.when(F.col("arm") == 0, F.col("converted")).otherwise(0)
        ).alias("conv_control"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n_treatment"),
        F.sum(
            F.when(F.col("arm") == 1, F.col("converted")).otherwise(0)
        ).alias("conv_treatment"),
    ).select(
        "n_control",
        "conv_control",
        "n_treatment",
        "conv_treatment",
        F.round(F.col("conv_control") / F.col("n_control"), 6).alias(
            "rate_control"
        ),
        F.round(F.col("conv_treatment") / F.col("n_treatment"), 6).alias(
            "rate_treatment"
        ),
        F.round(
            F.col("conv_treatment") / F.col("n_treatment")
            - F.col("conv_control") / F.col("n_control"),
            6,
        ).alias("uplift_abs"),
    )


def ab_test_report_sql(
    salt: str = "ab1",
    activation_window_sec: int = AB_ACTIVATION_WINDOW_SEC,
) -> str:
    from ..functions.hashing import md5_hash64_sql

    h = md5_hash64_sql(f"'{salt}:' || CAST(user_id AS VARCHAR)")
    return f"""
WITH flagged AS (
  SELECT user_id, ({h}) % 2 AS arm,
         CASE WHEN event_type = 'purchase'
                AND CAST(epoch(ts) AS BIGINT)
                    - min(CAST(epoch(ts) AS BIGINT))
                        OVER (PARTITION BY user_id)
                    <= {activation_window_sec}
              THEN 1 ELSE 0 END AS is_conv_event
  FROM events),
per_user AS (
  SELECT user_id, arm, max(is_conv_event) AS converted
  FROM flagged GROUP BY 1, 2),
folded AS (
  SELECT
    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_control,
    CAST(sum(CASE WHEN arm = 0 THEN converted ELSE 0 END) AS BIGINT)
      AS conv_control,
    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
      AS n_treatment,
    CAST(sum(CASE WHEN arm = 1 THEN converted ELSE 0 END) AS BIGINT)
      AS conv_treatment
  FROM per_user)
SELECT n_control, conv_control, n_treatment, conv_treatment,
       round(conv_control / CAST(n_control AS DOUBLE), 6) AS rate_control,
       round(conv_treatment / CAST(n_treatment AS DOUBLE), 6)
         AS rate_treatment,
       round(conv_treatment / CAST(n_treatment AS DOUBLE)
             - conv_control / CAST(n_control AS DOUBLE), 6) AS uplift_abs
FROM folded
"""


def event_type_daily_trend(events: DataFrame) -> DataFrame:
    """(event_type, n_days, total_events, slope, intercept, r2): per-type
    closed-form OLS of daily event count on the day index — the grouped
    sibling of the global six-sum fits (`zipf_head_fit`/`heaps_law_fit`):
    the trend screen a telemetry audit reads per stream ("which event
    types are growing/decaying, and how linearly").

    Exactness: x = day − min(day per type) (window-normalized integer,
    keeps products small), y = daily count — BOTH exact integers, so all
    six OLS sums and the slope numerator/denominator are exact BIGINT
    arithmetic; the only floats are the final divisions, identical
    single IEEE ops in both engines, rounded to 6. (At a per-day count
    scale of ~1e12 × multi-year windows the BIGINT num/den would need a
    DECIMAL promotion; the shapes stay identical.) Degenerate groups
    (one day, or constant counts — where the r² ratio is 0/0) pin to the
    exact-fit convention slope 0 / intercept ȳ / r² 1 on an exact
    integer predicate, the zipf_head_fit device.

    Scale shape: one map-side-combined (type, day) fold, a per-type
    window min over those CELLS (day-bounded, not corpus-bounded), one
    per-type six-sum aggregate. Nothing corpus-sized shuffles twice.
    """
    daily = events.groupBy(
        "event_type",
        F.floor(F.col("ts").cast("long") / 86400).alias("day"),
    ).agg(F.count(F.lit(1)).alias("y"))
    wt = Window.partitionBy("event_type")
    xy = daily.select(
        "event_type",
        (F.col("day") - F.min("day").over(wt)).cast("bigint").alias("x"),
        F.col("y").cast("bigint").alias("y"),
    )
    s = xy.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.min("y").alias("y_min"),
        F.max("y").alias("y_max"),
    )
    num = F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")
    den_x = F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")
    den_y = F.col("k") * F.col("syy") - F.col("sy") * F.col("sy")
    slope = num.cast("double") / den_x.cast("double")
    # r² = (num/√den_x/√den_y)² in DOUBLE: num·num and den_x·den_y as
    # raw BIGINTs wrap silently in Spark on large day-count groups while
    # DuckDB promotes to HUGEINT — the sqrt-factored denominator is the
    # same cross-engine overflow device degree_mixing_profile uses.
    r_corr = num.cast("double") / (
        F.sqrt(den_x.cast("double")) * F.sqrt(den_y.cast("double"))
    )
    degenerate = (F.col("k") == 1) | (F.col("y_min") == F.col("y_max"))
    return s.select(
        "event_type",
        F.col("k").alias("n_days"),
        F.col("sy").alias("total_events"),
        F.round(F.when(degenerate, F.lit(0.0)).otherwise(slope), 6).alias(
            "slope"
        ),
        F.round(
            F.when(
                degenerate, F.col("sy").cast("double") / F.col("k")
            ).otherwise(
                (F.col("sy") - slope * F.col("sx")) / F.col("k")
            ),
            6,
        ).alias("intercept"),
        F.round(
            F.when(degenerate, F.lit(1.0)).otherwise(r_corr * r_corr),
            6,
        ).alias("r2"),
    )


EVENT_TYPE_DAILY_TREND_SQL = """
WITH daily AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2),
xy AS (
  SELECT event_type,
         day - min(day) OVER (PARTITION BY event_type) AS x, y
  FROM daily),
s AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS k,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy,
         min(y) AS y_min, max(y) AS y_max
  FROM xy GROUP BY event_type)
SELECT event_type,
       k AS n_days,
       sy AS total_events,
       round(CASE WHEN k = 1 OR y_min = y_max THEN 0.0
                  ELSE (k * sxy - sx * sy)::DOUBLE
                       / (k * sxx - sx * sx)::DOUBLE END, 6) AS slope,
       round(CASE WHEN k = 1 OR y_min = y_max THEN sy::DOUBLE / k
                  ELSE (sy - (k * sxy - sx * sy)::DOUBLE
                             / (k * sxx - sx * sx)::DOUBLE * sx) / k
             END, 6) AS intercept,
       round(CASE WHEN k = 1 OR y_min = y_max THEN 1.0
                  ELSE ((k * sxy - sx * sy)::DOUBLE
                        / (sqrt((k * sxx - sx * sx)::DOUBLE)
                           * sqrt((k * syy - sy * sy)::DOUBLE)))
                       * ((k * sxy - sx * sy)::DOUBLE
                          / (sqrt((k * sxx - sx * sx)::DOUBLE)
                             * sqrt((k * syy - sy * sy)::DOUBLE)))
             END, 6) AS r2
FROM s
"""


DEBOUNCE_SECONDS = 60


def event_debounce_stats(
    events: DataFrame, gap_s: int = DEBOUNCE_SECONDS
) -> DataFrame:
    """(event_type, n_events, n_kept, n_dropped): burst-suppression
    (debounce) audit — an event is DROPPED when the same user emitted
    the same event type less than ``gap_s`` seconds earlier (lag against
    the previous RAW event, the stateless form every telemetry pipeline
    ships; the chained keep-dependent form is a stateful stream op, not
    a window). The first event of a (user, type) stream is always kept.

    Exactness: the gap compares integer epoch-seconds; order within a
    (user, type) partition is (ts, event_id) with event_id unique, so
    ``lag`` is well-defined under any layout. One user-keyed window
    shuffle plus an alphabet-bounded tally.
    """
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    kept = gap.isNull() | (gap >= gap_s)
    return (
        events.select("event_type", kept.alias("kept"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.when(F.col("kept"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_kept"),
            F.sum(F.when(F.col("kept"), 0).otherwise(1))
            .cast("bigint")
            .alias("n_dropped"),
        )
    )


def event_debounce_stats_sql(gap_s: int = DEBOUNCE_SECONDS) -> str:
    return f"""
WITH g AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT)
           - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
               PARTITION BY user_id, event_type
               ORDER BY ts, event_id) AS gap
  FROM events)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN gap IS NULL OR gap >= {gap_s}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN gap IS NULL OR gap >= {gap_s}
                THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped
FROM g GROUP BY event_type
"""


MULTITOUCH_WINDOW_S = 7 * 86400


def multitouch_credit(
    events: DataFrame, window_s: int = MULTITOUCH_WINDOW_S
) -> DataFrame:
    """(campaign, n_touches, n_purchases, credit_micros): linear
    multi-touch attribution — each purchase's value splits EQUALLY
    across the same user's clicks in the preceding ``window_s`` (the
    complement of the last-click as-of and click-count interval joins:
    those answer "which click/how many", this answers "how much credit
    does each CAMPAIGN earn"). Campaign = the click's ``props.k``.
    Purchases with zero in-window clicks have no campaign to credit and
    drop (documented; the count join keeps them with n=0).

    Integer-exact money: value → cents by per-row round (the
    skyline/Gini convention), per-touch share = cents·10⁴ div n_touches
    (micro-cents, floor division — the ≤(n−1)-micro-cent residual per
    purchase is the documented cost of an integer-exact, order-free
    fold; a float share would make every campaign sum depend on
    summation order).

    Plan shape: user-keyed equi-join with the time range as a residual
    (the `attribute_purchases` shape — per-task work bounded by per-user
    event counts), one per-purchase count window, one alphabet-bounded
    campaign aggregate.
    """
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.get_json_object(F.col("props"), "$.k")
        .cast("bigint")
        .alias("campaign"),
    )
    j = purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (
            F.col("c_ts").cast("long")
            >= F.col("p_ts").cast("long") - window_s
        ),
    )
    wp = Window.partitionBy("p_id")
    credited = j.select(
        "campaign",
        "p_id",
        F.col("cents"),
        F.count(F.lit(1)).over(wp).alias("n"),
    ).select(
        "campaign",
        "p_id",
        # integer floor division on both engines (a double round-trip
        # would round-to-nearest in one engine and truncate in the other)
        F.expr("(cents * 10000) div n").alias("share_micros"),
    )
    return credited.groupBy("campaign").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_touches"),
        F.countDistinct("p_id").cast("bigint").alias("n_purchases"),
        F.sum("share_micros").cast("bigint").alias("credit_micros"),
    )


def multitouch_credit_sql(window_s: int = MULTITOUCH_WINDOW_S) -> str:
    return f"""
WITH p AS (
  SELECT event_id AS p_id, user_id, ts AS p_ts,
         CAST(round(value * 100, 0) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'),
c AS (
  SELECT user_id AS c_user, ts AS c_ts,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS campaign
  FROM events WHERE event_type = 'click'),
j AS (
  SELECT campaign, p_id, cents,
         count(*) OVER (PARTITION BY p_id) AS n
  FROM p JOIN c
    ON p.user_id = c.c_user
   AND c.c_ts <= p.p_ts
   AND CAST(floor(epoch(c.c_ts)) AS BIGINT)
       >= CAST(floor(epoch(p.p_ts)) AS BIGINT) - {window_s})
SELECT campaign,
       CAST(count(*) AS BIGINT) AS n_touches,
       CAST(count(DISTINCT p_id) AS BIGINT) AS n_purchases,
       CAST(sum((cents * 10000) // n) AS BIGINT) AS credit_micros
FROM j GROUP BY campaign
"""


BURST_TRAIL_DAYS = 7
BURST_SIGMAS = 3


def event_type_bursts(
    events: DataFrame,
    w: int = BURST_TRAIL_DAYS,
    sigmas: int = BURST_SIGMAS,
) -> DataFrame:
    """(event_type, day, y, trail_sum, trail_sumsq, burst): trailing-
    window burst detection per event type — the volume-anomaly screen a
    telemetry pipeline runs before trusting a day's data (a crawler
    loop, a replayed shard, a bot flood all show as bursts). A day is a
    BURST when its count exceeds the trailing ``w``-day mean by more
    than ``sigmas`` trailing population standard deviations; days with
    fewer than ``w`` prior days are excluded (no partial baselines).

    Exactness — the integer-exact-decision device: with n=w, s=Σy,
    ss=Σy² over the trailing frame (exact BIGINTs from a ROWS window),

        y > s/n + σ·sqrt((n·ss − s²)/n²)
      ⇔ (y·n − s) > 0  AND  (y·n − s)² > σ²·(n·ss − s²)

    — every quantity in the rewritten predicate is an exact integer, so
    the burst flag cannot flap on float rounding in either engine (the
    same algebra degree_mixing/zipf pin for their degenerate guards).
    The squares are computed in DECIMAL(38,0) (Spark) / HUGEINT
    (DuckDB), NOT raw BIGINT: at per-day counts ≳1.1e9 a BIGINT Σy²
    wraps silently in Spark while DuckDB promotes/errors — the exact
    cross-engine divergence class ``event_type_daily_trend``'s r²
    already dodges. The decimal device keeps the decision exact to
    per-day counts ~4.5e17 (where dev² meets the 1e38 decimal edge) —
    beyond any physical row count, since y is itself a BIGINT row
    count. Pinned red-before/green-after by
    ``test_burst_decimal_promotion_big_counts``.

    Scale shape: one map-side-combined (type, day) fold (the
    ``event_type_daily_trend`` input), then a per-type ROWS window over
    DAY CELLS (alphabet × days, not corpus rows) — nothing corpus-sized
    shuffles twice.
    """
    return bursts_from_daily(burst_daily_counts(events), w=w, sigmas=sigmas)


def burst_daily_counts(events: DataFrame) -> DataFrame:
    """(event_type, day, y): the alphabet-x-days daily fold — exact
    integers, map-side combined, ADDITIVE across row subsets (the
    property the streaming monitor's per-batch fold rides on)."""
    return events.groupBy(
        "event_type",
        F.floor(F.col("ts").cast("long") / 86400).cast("bigint").alias("day"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("y"))


def bursts_from_daily(
    daily: DataFrame,
    w: int = BURST_TRAIL_DAYS,
    sigmas: int = BURST_SIGMAS,
) -> DataFrame:
    """The scoring leg of ``event_type_bursts`` over an already-folded
    daily table — shared verbatim by the batch query and the streaming
    monitor, so their equality reduces to the daily fold's additivity."""
    trail = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-w, -1)
    )
    # Σy² in DECIMAL(38,0), not BIGINT: y² wraps BIGINT at y ≳ 3.04e9
    # and the window sum at y ≳ 1.1e9 (7-day frame), silently in Spark.
    y_dec = F.col("y").cast("decimal(19,0)")
    scored = daily.select(
        "event_type",
        "day",
        "y",
        F.count(F.lit(1)).over(trail).cast("bigint").alias("n"),
        F.sum("y").over(trail).cast("bigint").alias("trail_sum"),
        F.sum((y_dec * y_dec).cast("decimal(38,0)"))
        .over(trail)
        .alias("ss_dec"),
    ).filter(F.col("n") == w)
    # All predicate arithmetic in DECIMAL(38,0): exact (no float flap),
    # no silent wrap — overflow past 1e38 errors loudly under ANSI,
    # which would need a per-day count > 4.5e17 (impossible: y counts
    # rows, itself a BIGINT).
    dec = "decimal(38,0)"
    dev = (
        y_dec * F.col("n").cast("decimal(19,0)")
        - F.col("trail_sum").cast("decimal(19,0)")
    ).cast(dec)
    var_n2 = (
        F.col("n").cast(dec) * F.col("ss_dec")
        - F.col("trail_sum").cast(dec) * F.col("trail_sum").cast(dec)
    ).cast(dec)
    return scored.select(
        "event_type",
        "day",
        "y",
        "trail_sum",
        # diagnostic raw sum: exact-valued BIGINT up to y≈1.1e9/day;
        # beyond that try_cast nulls (mirrored by the oracle's TRY_CAST)
        # instead of the old silent wrap — the burst DECISION stays
        # exact either way because it reads ss_dec, not this cast
        F.col("ss_dec").try_cast("bigint").alias("trail_sumsq"),
        F.when(
            (dev > F.lit(0).cast(dec))
            & (
                dev * dev
                > F.lit(sigmas * sigmas).cast(dec) * var_n2
            ),
            1,
        ).otherwise(0).cast("int").alias("burst"),
    )


def bursts_scoring_sql(
    daily_rel: str, w: int = BURST_TRAIL_DAYS, sigmas: int = BURST_SIGMAS
) -> str:
    """The scoring leg as SQL over an already-folded (event_type, day,
    y) relation — the DuckDB twin of ``bursts_from_daily``. Squares go
    through HUGEINT (128-bit, exact to 1.7e38), the DuckDB counterpart
    of the Spark side's DECIMAL(38,0) promotion: raw BIGINT ``y*y``
    would error in DuckDB past y≈3e9 while Spark wraps — the divergence
    the promotion closes on both sides. Factored out of
    ``event_type_bursts_sql`` so the planted big-count test can run the
    identical predicate over a synthetic daily table."""
    return f"""
trail AS (
  SELECT event_type, day, y,
         CAST(count(*) OVER f AS BIGINT) AS n,
         CAST(sum(y) OVER f AS BIGINT) AS s,
         sum(CAST(y AS HUGEINT) * y) OVER f AS ss
  FROM {daily_rel}
  WINDOW f AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN {w} PRECEDING AND 1 PRECEDING))
SELECT event_type, day, y,
       s AS trail_sum, TRY_CAST(ss AS BIGINT) AS trail_sumsq,
       CAST(CASE WHEN (CAST(y AS HUGEINT) * n - s) > 0
                  AND (CAST(y AS HUGEINT) * n - s)
                      * (CAST(y AS HUGEINT) * n - s)
                      > {sigmas * sigmas}
                        * (CAST(n AS HUGEINT) * ss
                           - CAST(s AS HUGEINT) * s)
             THEN 1 ELSE 0 END AS INT) AS burst
FROM trail WHERE n = {w}
"""


def event_type_bursts_sql(
    w: int = BURST_TRAIL_DAYS, sigmas: int = BURST_SIGMAS
) -> str:
    """Oracle: identical daily fold, trailing ROWS frame, and the same
    HUGEINT-exact squared-deviation predicate (see
    ``bursts_scoring_sql`` for the promotion rationale)."""
    return f"""
WITH daily AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2),
{bursts_scoring_sql("daily", w=w, sigmas=sigmas)}
"""
