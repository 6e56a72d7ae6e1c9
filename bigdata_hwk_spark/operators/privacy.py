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


def census_from_user_cells(
    user_cells: DataFrame, k: int = K_ANON
) -> DataFrame:
    """The scoring leg over the per-user cell table — shared verbatim by
    the batch audit and the streaming monitor."""
    cells = user_cells.groupBy("event_type", "day", "bucket").agg(
        F.sum("n_rows").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
    )
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
