"""Declarative data-quality constraint audit — k constraints, ONE scan.

Not in the reference (SURVEY.md §2.11 north-star extensions): before a
100 TB table feeds a training run, it gets validated — completeness,
key uniqueness, value ranges, row-level logic, referential integrity.
The published large-scale design (Schelter et al., "Automating
Large-Scale Data Quality Verification", VLDB 2018 — Deequ) compiles the
whole constraint suite into shared aggregation passes instead of one
scan per check; this module is that design on Catalyst:

* every ROW-LOCAL constraint (null counts, range violations, logic
  predicates) is a conditional ``sum`` in a single ``agg`` — one
  map-side-combined scan whatever k is;
* KEY UNIQUENESS rides the same pass as ``count - count_distinct`` over
  the key struct (a partial-aggregatable pair at scale; exact here);
* REFERENTIAL INTEGRITY is the one constraint that genuinely needs a
  second relation: a column-pruned left-anti equi-join on the key only
  (the dim side projects to its key → broadcasts when small, AQE picks
  a shuffle hash join otherwise). The fact table's text/payload columns
  never enter the join.

Output is a tidy (constraint, violations, passed) table — all-integer
violation counts so two engines cannot disagree in a float ulp, and
``passed`` is derived, not asserted: the fixture's lineitem genuinely
carries duplicate (orderkey, linenumber) pairs, and the audit REPORTS
that rather than assuming TPC-H shape (the round-8 fixture-assumption
lesson applied to operator design).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (constraint name, SQL predicate counting a VIOLATION when true) —
# shared verbatim by the Spark plan and the DuckDB oracle, so the two
# engines run definitionally identical checks. Every predicate is
# row-local and null-safe (IS DISTINCT FROM semantics via explicit
# NULL branches where needed).
LINEITEM_ROW_CHECKS: list[tuple[str, str]] = [
    ("complete_orderkey", "l_orderkey IS NULL"),
    ("complete_returnflag", "l_returnflag IS NULL"),
    ("complete_shipdate", "l_shipdate IS NULL"),
    (
        "range_quantity_1_50",
        "l_quantity IS NULL OR l_quantity < 1 OR l_quantity > 50",
    ),
    (
        "range_discount_0_0p1",
        "l_discount IS NULL OR l_discount < 0 OR l_discount > 0.1",
    ),
    (
        "nonnegative_extendedprice",
        "l_extendedprice IS NULL OR l_extendedprice < 0",
    ),
    (
        "returnflag_domain",
        "l_returnflag NOT IN ('A', 'N', 'R')",
    ),
    (
        "linestatus_domain",
        "l_linestatus NOT IN ('O', 'F')",
    ),
]
LINEITEM_KEY = ["l_orderkey", "l_linenumber"]


def lineitem_constraint_audit(
    lineitem: DataFrame, orders: DataFrame
) -> DataFrame:
    """(constraint, violations, passed): the full declarative suite over
    lineitem — row-local checks + PK uniqueness in ONE aggregation scan,
    plus FK containment (lineitem.l_orderkey ⊆ orders.o_orderkey) as a
    key-only left-anti join. ``violations`` is an exact count; ``passed``
    = violations == 0."""
    row_sums = [
        F.sum(F.expr(pred).cast("bigint")).alias(name)
        for name, pred in LINEITEM_ROW_CHECKS
    ]
    one_pass = lineitem.agg(
        F.count(F.lit(1)).alias("__n"),
        F.count_distinct(F.struct(*LINEITEM_KEY)).alias("__nkey"),
        *row_sums,
    )
    # tidy pivot of the single result row: a stack over k name/value
    # pairs — driver never sees the row, the unpivot is a projection
    names = [name for name, _ in LINEITEM_ROW_CHECKS]
    stacked = one_pass.select(
        F.expr(
            "stack({}, {}) as (constraint, violations)".format(
                len(names) + 1,
                ", ".join(
                    [f"'{n}', {n}" for n in names]
                    + ["'unique_orderkey_linenumber', __n - __nkey"]
                ),
            )
        )
    )
    orphans = (
        lineitem.select("l_orderkey")
        .join(
            orders.select("o_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("violations"))
        .select(
            F.lit("fk_orderkey_in_orders").alias("constraint"),
            "violations",
        )
    )
    return (
        stacked.unionByName(orphans)
        .select(
            "constraint",
            # sum() over an empty table is NULL in both engines: an empty
            # table violates nothing
            F.coalesce(F.col("violations"), F.lit(0))
            .cast("bigint")
            .alias("violations"),
            (F.coalesce(F.col("violations"), F.lit(0)) == 0).alias("passed"),
        )
        .orderBy("constraint")
    )


def lineitem_constraint_audit_sql() -> str:
    """Oracle: the same predicates verbatim, the same one-pass shape
    (DuckDB aggregates + UNION ALL), the same derived ``passed``."""
    row_rows = "\nUNION ALL\n".join(
        f"SELECT '{name}' AS \"constraint\","
        f" sum(CASE WHEN {pred} THEN 1 ELSE 0 END) AS violations"
        f" FROM lineitem"
        for name, pred in LINEITEM_ROW_CHECKS
    )
    key = ", ".join(LINEITEM_KEY)
    return f"""
WITH raw AS (
{row_rows}
UNION ALL
SELECT 'unique_orderkey_linenumber' AS "constraint",
       count(*) - count(DISTINCT ({key})) AS violations
FROM lineitem
UNION ALL
SELECT 'fk_orderkey_in_orders' AS "constraint", count(*) AS violations
FROM lineitem l
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
)
SELECT "constraint", CAST(COALESCE(violations, 0) AS BIGINT) AS violations,
       COALESCE(violations, 0) = 0 AS passed
FROM raw ORDER BY "constraint"
"""


# ---------------------------------------------------------------------------
# Functional-dependency audit
# ---------------------------------------------------------------------------

# (fd name, lhs column, rhs column) over the documents table: doc_id is a
# key so doc_id→lang must HOLD (zero violating groups certifies the check
# itself); source→lang is genuinely violated in the fixture (sources mix
# languages), so the report carries non-trivial counts in both states.
DOCUMENT_FDS: list[tuple[str, str, str]] = [
    ("doc_id_determines_lang", "doc_id", "lang"),
    ("source_determines_lang", "source", "lang"),
]


def functional_dependency_audit(
    documents: DataFrame,
    fds: list[tuple[str, str, str]] = DOCUMENT_FDS,
) -> DataFrame:
    """FD conformance report: for each candidate dependency lhs → rhs,
    (fd, n_lhs_groups, n_violating_groups, n_rows_in_violation, holds) —
    a violating group is an lhs value mapping to >1 distinct rhs, and
    rows-in-violation counts EVERY row of such groups (the repair
    surface a cleaner would have to touch).

    The schema-profiling face of the Deequ-style audit: uniqueness and
    ranges say "is each row sane"; FDs say "is the table's SHAPE sane"
    (an id that stops determining its attributes is how silent join
    fan-outs and bad backfills surface). One map-side-combined
    (lhs, rhs)-distinct aggregate per FD, folded to per-lhs group stats,
    then to one row — never a self-join."""
    spark = documents.sparkSession
    out = None
    for name, lhs, rhs in fds:
        groups = (
            documents.groupBy(F.col(lhs).alias("k"))
            .agg(
                F.countDistinct(F.col(rhs)).alias("n_rhs"),
                F.count(F.lit(1)).alias("n_rows"),
            )
        )
        row = groups.agg(
            F.lit(name).alias("fd"),
            F.count(F.lit(1)).alias("n_lhs_groups"),
            F.sum(F.when(F.col("n_rhs") > 1, 1).otherwise(0)).alias(
                "n_violating_groups"
            ),
            F.sum(
                F.when(F.col("n_rhs") > 1, F.col("n_rows")).otherwise(0)
            ).alias("n_rows_in_violation"),
            (F.sum(F.when(F.col("n_rhs") > 1, 1).otherwise(0)) == 0).alias(
                "holds"
            ),
        )
        out = row if out is None else out.unionByName(row)
    return out


def functional_dependency_audit_sql(
    fds: list[tuple[str, str, str]] = DOCUMENT_FDS,
) -> str:
    parts = []
    for name, lhs, rhs in fds:
        parts.append(f"""
SELECT '{name}' AS fd,
       count(*) AS n_lhs_groups,
       CAST(sum(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violating_groups,
       CAST(sum(CASE WHEN n_rhs > 1 THEN n_rows ELSE 0 END) AS BIGINT)
         AS n_rows_in_violation,
       sum(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) = 0 AS holds
FROM (SELECT {lhs} AS k, count(DISTINCT {rhs}) AS n_rhs,
             count(*) AS n_rows
      FROM documents GROUP BY 1)""")
    return "\nUNION ALL\n".join(parts)
