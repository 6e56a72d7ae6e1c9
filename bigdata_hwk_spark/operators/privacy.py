"""k-anonymity release audit over the event table.

Extension surface (no reference counterpart): before releasing an
event-level table, a privacy review asks whether any quasi-identifier
combination isolates fewer than ``k`` users (Sweeney 2002; Samarati
2001 — public): a row whose (type, day, value-bucket) cell is shared by
only one or two users re-identifies them by linkage even with the id
column dropped. This audit reports, per event type, the equivalence-
class census of the released projection: how many QI cells exist, how
many violate k, and how many rows sit in violating cells (the rows a
release would have to suppress or generalize).

Determinism & exactness: the QI projection is pure integer arithmetic —
epoch-day and the PSI monitor's clamped fixed-width value bucket (no
data-dependent quantiles, so two runs and two engines bucket
identically); every census number is an exact BIGINT count.

Scale shape: one map-side-combined groupBy to the QI-cell census
(|types|·|days|·|buckets| cells — calendar-and-alphabet bounded, not
corpus bounded), then an alphabet-sized per-type fold. Nothing
corpus-sized shuffles twice, nothing driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .robust import PSI_BUCKET_CAP, PSI_BUCKET_WIDTH

K_ANON = 5


def k_anonymity_audit(events: DataFrame, k: int = K_ANON) -> DataFrame:
    """(event_type, n_cells, n_violating_cells, n_rows, n_rows_at_risk,
    risk_pct): per-type k-anonymity census of the released projection
    (event_type, epoch-day, clamped value bucket). A cell VIOLATES when
    it contains fewer than ``k`` distinct users — distinct, not rows:
    one chatty user filling a cell is still one re-identifiable person.
    ``risk_pct`` = share of rows in violating cells, rounded to 6."""
    return census_from_user_cells(qi_user_cells(events), k=k)


def qi_user_cells(events: DataFrame) -> DataFrame:
    """(event_type, day, bucket, user_id, n_rows): the per-user QI-cell
    fold. ADDITIVE on n_rows across row subsets — the granularity the
    streaming monitor accumulates, because distinct-user counts are NOT
    additive (the same user in two micro-batches is still one person)."""
    return (
        events.filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.floor(F.col("ts").cast("long") / 86400)
            .cast("bigint")
            .alias("day"),
            F.least(
                F.greatest(
                    F.floor(F.col("value") / PSI_BUCKET_WIDTH), F.lit(0)
                ),
                F.lit(PSI_BUCKET_CAP),
            )
            .cast("int")
            .alias("bucket"),
            "user_id",
        )
        .groupBy("event_type", "day", "bucket", "user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
    )


def cells_census(user_cells: DataFrame) -> DataFrame:
    """(event_type, day, bucket, n_rows, n_users): collapse the per-user
    cell table to its cell census. Exactly the information a CLOSED day
    needs to keep — once no future row can add a user to the cell, the
    user set is redundant with its count (the streaming monitor's
    watermark compaction rides on this)."""
    return user_cells.groupBy("event_type", "day", "bucket").agg(
        F.sum("n_rows").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
    )


def census_from_user_cells(
    user_cells: DataFrame, k: int = K_ANON
) -> DataFrame:
    """The scoring leg over the per-user cell table — shared verbatim by
    the batch audit and the streaming monitor."""
    return census_from_cells(cells_census(user_cells), k=k)


def census_from_cells(cells: DataFrame, k: int = K_ANON) -> DataFrame:
    """Per-type audit fold over an already-censused cell table."""
    viol = F.col("n_users") < k
    return (
        cells.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_cells"),
            F.sum(F.when(viol, 1).otherwise(0))
            .cast("bigint")
            .alias("n_violating_cells"),
            F.sum("n_rows").cast("bigint").alias("n_rows"),
            F.sum(F.when(viol, F.col("n_rows")).otherwise(0))
            .cast("bigint")
            .alias("n_rows_at_risk"),
        )
        .select(
            "event_type",
            "n_cells",
            "n_violating_cells",
            "n_rows",
            "n_rows_at_risk",
            F.round(
                F.col("n_rows_at_risk") / F.col("n_rows").cast("double") * 100,
                6,
            ).alias("risk_pct"),
        )
    )


# generalization ladder (full-domain recoding, Samarati 2001 — public):
# L0 = (day, bucket); L1 = (week, bucket); L2 = (week, coarse bucket).
# Each step is a data-independent integer coarsening, so both engines
# (and any two runs) generalize identically — PROVIDED day and bucket
# are non-negative: Spark's `div` truncates toward zero while DuckDB's
# `//` floors, so the two engines would disagree on negative operands
# (pre-1970 day numbers). The events fixture derives day from epoch
# timestamps (>= 0) and bucket from a non-negative modulus, and the
# audit/enforce oracles share that domain; the same precondition is
# documented on the Neyman/splits hash paths (splits.py). Callers with
# pre-1970 data must shift days to a non-negative origin first.
GEN_WEEK_DAYS = 7
GEN_BUCKET_COARSE = 4
GEN_MAX_LEVEL = 2


def k_anonymity_enforce(events: DataFrame, k: int = K_ANON) -> DataFrame:
    """(event_type, level, qi_day, qi_bucket, user_id, n_rows): the
    RELEASED user-cell table after k-anonymity enforcement — the apply
    side of ``k_anonymity_audit``, completing the audit→enforce pattern
    (``pii_scrub``/``crossdoc_span_scrub``).

    Policy — full-domain generalization + cell suppression (Samarati
    2001; Sweeney 2002 — public): per event type, pick the SMALLEST
    ladder level at which NO QI cell isolates fewer than ``k`` distinct
    users (day→week, then bucket→4-wide coarse bucket); a type that
    still violates at the top level releases at the top level with its
    violating cells SUPPRESSED (dropped rows, visible as missing
    cells). Generalizing every row of a type to one common level —
    rather than per-row minimal recoding — is what makes the invariant
    checkable: the released cells ARE the census cells at that level,
    so ``released k-audit ⇒ zero violations`` holds by construction
    (cells partition rows; suppression never shrinks another cell).

    Determinism & exactness: ladder cut points are fixed integers (no
    data-dependent quantiles); level choice reads exact BIGINT
    violation counts; suppression is an exact integer predicate.

    Scale shape: the corpus folds ONCE into the per-user cell table
    (persisted — it feeds three level censuses plus the release
    regroup, and is calendar×alphabet×user-bounded, the same size class
    the streaming monitor holds as state); the censuses, the |types|-row
    broadcast of chosen levels, the regroup, and the suppression
    semi-join are all cell-sized. Nothing corpus-sized shuffles twice,
    nothing driver-side.
    """
    from ..session import persist_once

    uc = persist_once(qi_user_cells(events))
    viols = []
    for lv in range(GEN_MAX_LEVEL + 1):
        cells = (
            uc.select("event_type", *_gen_qi(lv), "user_id")
            .groupBy("event_type", "qi_day", "qi_bucket")
            .agg(F.countDistinct("user_id").alias("n_users"))
        )
        viols.append(
            cells.groupBy("event_type").agg(
                F.sum(F.when(F.col("n_users") < k, 1).otherwise(0))
                .cast("bigint")
                .alias(f"viol{lv}")
            )
        )
    lv_tab = viols[0].join(viols[1], "event_type").join(viols[2], "event_type")
    levels = lv_tab.select(
        "event_type",
        F.when(F.col("viol0") == 0, 0)
        .when(F.col("viol1") == 0, 1)
        .otherwise(GEN_MAX_LEVEL)
        .cast("int")
        .alias("level"),
    )
    g = uc.join(F.broadcast(levels), "event_type")
    qi_day = (
        F.when(F.col("level") == 0, F.col("day"))
        .otherwise(
            F.expr(f"day div {GEN_WEEK_DAYS}") * GEN_WEEK_DAYS
        )
        .cast("bigint")
    )
    qi_bucket = (
        F.when(F.col("level") < 2, F.col("bucket"))
        .otherwise(
            F.expr(f"bucket div {GEN_BUCKET_COARSE}") * GEN_BUCKET_COARSE
        )
        .cast("int")
    )
    merged = (
        g.select(
            "event_type",
            "level",
            qi_day.alias("qi_day"),
            qi_bucket.alias("qi_bucket"),
            "user_id",
            "n_rows",
        )
        .groupBy("event_type", "level", "qi_day", "qi_bucket", "user_id")
        .agg(F.sum("n_rows").cast("bigint").alias("n_rows"))
    )
    # suppression: merged is one row per (cell, user), so count(*) per
    # cell IS the distinct-user census; only forced-top-level types can
    # still have cells below k — drop exactly those
    ok_cells = (
        merged.groupBy("event_type", "qi_day", "qi_bucket")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .filter(F.col("n_users") >= k)
        .select("event_type", "qi_day", "qi_bucket")
    )
    return merged.join(
        ok_cells, ["event_type", "qi_day", "qi_bucket"], "semi"
    ).select("event_type", "level", "qi_day", "qi_bucket", "user_id", "n_rows")


def _gen_qi(level: int):
    """The ladder's (qi_day, qi_bucket) expressions at ``level``."""
    day = (
        F.col("day")
        if level == 0
        else F.expr(f"day div {GEN_WEEK_DAYS}") * GEN_WEEK_DAYS
    )
    bucket = (
        F.col("bucket")
        if level < 2
        else F.expr(f"bucket div {GEN_BUCKET_COARSE}") * GEN_BUCKET_COARSE
    )
    return (
        day.cast("bigint").alias("qi_day"),
        bucket.cast("int").alias("qi_bucket"),
    )


def k_anonymity_enforce_sql(k: int = K_ANON) -> str:
    """Oracle: identical QI fold, per-level censuses, minimal-level
    choice, generalization, and suppression semi-join."""
    wk, cb = GEN_WEEK_DAYS, GEN_BUCKET_COARSE
    return f"""
WITH qi AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         CAST(least(greatest(floor(value / {PSI_BUCKET_WIDTH}), 0),
                    {PSI_BUCKET_CAP}) AS INT) AS bucket,
         user_id,
         CAST(count(*) AS BIGINT) AS n_rows
  FROM events WHERE value IS NOT NULL
  GROUP BY 1, 2, 3, 4),
v0 AS (
  SELECT event_type,
         sum(CASE WHEN n_users < {k} THEN 1 ELSE 0 END) AS viol
  FROM (SELECT event_type, day, bucket,
               count(DISTINCT user_id) AS n_users
        FROM qi GROUP BY 1, 2, 3) GROUP BY 1),
v1 AS (
  SELECT event_type,
         sum(CASE WHEN n_users < {k} THEN 1 ELSE 0 END) AS viol
  FROM (SELECT event_type, (day // {wk}) * {wk} AS qi_day, bucket,
               count(DISTINCT user_id) AS n_users
        FROM qi GROUP BY 1, 2, 3) GROUP BY 1),
v2 AS (
  SELECT event_type,
         sum(CASE WHEN n_users < {k} THEN 1 ELSE 0 END) AS viol
  FROM (SELECT event_type, (day // {wk}) * {wk} AS qi_day,
               (bucket // {cb}) * {cb} AS qi_bucket,
               count(DISTINCT user_id) AS n_users
        FROM qi GROUP BY 1, 2, 3) GROUP BY 1),
levels AS (
  SELECT v0.event_type,
         CAST(CASE WHEN v0.viol = 0 THEN 0
                   WHEN v1.viol = 0 THEN 1
                   ELSE {GEN_MAX_LEVEL} END AS INT) AS level
  FROM v0 JOIN v1 USING (event_type) JOIN v2 USING (event_type)),
merged AS (
  SELECT q.event_type, l.level,
         CAST(CASE WHEN l.level = 0 THEN q.day
                   ELSE (q.day // {wk}) * {wk} END AS BIGINT) AS qi_day,
         CAST(CASE WHEN l.level < 2 THEN q.bucket
                   ELSE (q.bucket // {cb}) * {cb} END AS INT) AS qi_bucket,
         q.user_id,
         CAST(sum(q.n_rows) AS BIGINT) AS n_rows
  FROM qi q JOIN levels l USING (event_type)
  GROUP BY 1, 2, 3, 4, 5),
cu AS (
  SELECT event_type, qi_day, qi_bucket, count(*) AS n_users
  FROM merged GROUP BY 1, 2, 3)
SELECT m.event_type, m.level, m.qi_day, m.qi_bucket, m.user_id, m.n_rows
FROM merged m JOIN cu USING (event_type, qi_day, qi_bucket)
WHERE cu.n_users >= {k}
"""


L_DIVERSE = 3


def l_diversity_audit(events: DataFrame, l_min: int = L_DIVERSE) -> DataFrame:
    """(day, n_cells, n_violating_cells, n_rows, n_rows_at_risk,
    risk_pct): distinct l-diversity audit (Machanavajjhala et al. 2006 —
    public), the attribute-disclosure complement of ``k_anonymity_audit``:
    k-anonymity stops an attacker from singling a person OUT of a QI
    cell, but a cell whose rows all share one SENSITIVE value still
    discloses that value for everyone linkable to the cell. Here the QI
    is (day, value-bucket) and the sensitive attribute is event_type: a
    (day, bucket) cell violates when its rows span fewer than ``l_min``
    distinct event types. Reported per day (the release calendar's
    review unit).

    Determinism & exactness: same integer QI projection as the k-audit;
    every census number is an exact BIGINT count.

    Scale shape: one map-side-combined fold to (day, bucket, event_type)
    cells (calendar×buckets×alphabet-bounded), a cell-level census, one
    per-day fold. Nothing corpus-sized shuffles twice.
    """
    return l_census_from_type_cells(qi_type_cells(events), l_min=l_min)


def qi_type_cells(events: DataFrame) -> DataFrame:
    """(day, bucket, event_type, n_rows): the sensitive-attribute cell
    fold. FULLY ADDITIVE across row subsets (row counts, no distincts) —
    so the streaming monitor's accumulated state is exact under any
    chunking, unlike the k-audit's per-user table."""
    return (
        events.filter(F.col("value").isNotNull())
        .select(
            F.floor(F.col("ts").cast("long") / 86400)
            .cast("bigint")
            .alias("day"),
            F.least(
                F.greatest(
                    F.floor(F.col("value") / PSI_BUCKET_WIDTH), F.lit(0)
                ),
                F.lit(PSI_BUCKET_CAP),
            )
            .cast("int")
            .alias("bucket"),
            "event_type",
        )
        .groupBy("day", "bucket", "event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
    )


def l_census_from_type_cells(
    tri: DataFrame, l_min: int = L_DIVERSE
) -> DataFrame:
    """The scoring leg over the (day, bucket, event_type) cell table —
    shared verbatim by the batch audit and the streaming monitor."""
    cells = tri.groupBy("day", "bucket").agg(
        F.sum("n_rows").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_sensitive"),
    )
    viol = F.col("n_sensitive") < l_min
    return (
        cells.groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_cells"),
            F.sum(F.when(viol, 1).otherwise(0))
            .cast("bigint")
            .alias("n_violating_cells"),
            F.sum("n_rows").cast("bigint").alias("n_rows"),
            F.sum(F.when(viol, F.col("n_rows")).otherwise(0))
            .cast("bigint")
            .alias("n_rows_at_risk"),
        )
        .select(
            "day",
            "n_cells",
            "n_violating_cells",
            "n_rows",
            "n_rows_at_risk",
            F.round(
                F.col("n_rows_at_risk") / F.col("n_rows").cast("double") * 100,
                6,
            ).alias("risk_pct"),
        )
    )


def l_diversity_audit_sql(l_min: int = L_DIVERSE) -> str:
    """Oracle: identical QI projection, sensitive census, and predicate."""
    return f"""
WITH tri AS (
  SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         CAST(least(greatest(floor(value / {PSI_BUCKET_WIDTH}), 0),
                    {PSI_BUCKET_CAP}) AS INT) AS bucket,
         event_type,
         CAST(count(*) AS BIGINT) AS n_rows
  FROM events WHERE value IS NOT NULL
  GROUP BY 1, 2, 3),
cells AS (
  SELECT day, bucket,
         CAST(sum(n_rows) AS BIGINT) AS n_rows,
         CAST(count(*) AS BIGINT) AS n_sensitive
  FROM tri GROUP BY 1, 2)
SELECT day,
       CAST(count(*) AS BIGINT) AS n_cells,
       CAST(sum(CASE WHEN n_sensitive < {l_min} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violating_cells,
       CAST(sum(n_rows) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN n_sensitive < {l_min} THEN n_rows ELSE 0 END)
            AS BIGINT) AS n_rows_at_risk,
       round(sum(CASE WHEN n_sensitive < {l_min} THEN n_rows ELSE 0 END)
             / CAST(sum(n_rows) AS DOUBLE) * 100, 6) AS risk_pct
FROM cells GROUP BY day
"""


def k_anonymity_audit_sql(k: int = K_ANON) -> str:
    """Oracle: identical QI projection, census, and violation predicate."""
    return f"""
WITH qi AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         CAST(least(greatest(floor(value / {PSI_BUCKET_WIDTH}), 0),
                    {PSI_BUCKET_CAP}) AS INT) AS bucket,
         user_id
  FROM events WHERE value IS NOT NULL),
cells AS (
  SELECT event_type, day, bucket,
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
  FROM qi GROUP BY 1, 2, 3)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_cells,
       CAST(sum(CASE WHEN n_users < {k} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violating_cells,
       CAST(sum(n_rows) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN n_users < {k} THEN n_rows ELSE 0 END) AS BIGINT)
         AS n_rows_at_risk,
       round(sum(CASE WHEN n_users < {k} THEN n_rows ELSE 0 END)
             / CAST(sum(n_rows) AS DOUBLE) * 100, 6) AS risk_pct
FROM cells GROUP BY event_type
"""
