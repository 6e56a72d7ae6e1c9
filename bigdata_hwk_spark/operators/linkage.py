"""Fuzzy record linkage: edit-distance-1 join via deletion-neighborhood
blocking (the SymSpell device, public: Garbe 2012; same family as the
FastSS dictionary of Bocek et al. 2007).

Extension surface (no reference counterpart): entity resolution — "this
corrupted/OCR'd/typo'd record is THAT canonical record" — is a standard
pre-training curation step (merging crawl records that differ by one
keystroke). The naive form is a string theta-join (levenshtein(a, b) ≤ 1
over all pairs): quadratic, never acceptable. The rewrite here is exact
for distance ≤ 1 and is pure equi-join algebra:

    keys(s) = {s} ∪ {s with one character deleted}
    ed(a, b) ≤ 1  ⇒  keys(a) ∩ keys(b) ≠ ∅

(equality shares the identity key; a substitution shares the deletion at
the differing offset; an insertion/deletion shares the shorter string
itself). The converse does not hold — sharing a key bounds ed ≤ 2 — so
candidates are verified with the built-in codegen ``levenshtein`` before
aggregation. The DuckDB oracle runs the LITERAL length-banded
levenshtein join, so hash equality per round proves the deletion
blocking lossless (the ``dedup_prefix_filter`` proof device).

Scale shape: the key inventory is |records| × (name length + 1) rows of
short strings — linear, explode-generated, no Python. The candidate join
is a key equi-join whose per-key fan-out is the number of records within
one deletion of a given pattern (bounded by alphabet × length for
synthetic keys; for natural-language names the hot-key bound is the
modal-name frequency — a data property, not a plan property, and the
verification filter runs INSIDE the join's mapPartitions so no
unverified pair is ever materialized to a shuffle). The final summary is
two map-side-combined aggregates.

The "dirty" side is derived deterministically from the fixture (delete
the character at offset ``c_custkey mod len`` — the PII-scrub
derivation device at functions/text.py): identical expression in both
engines, and it guarantees every dirty record is at ed=1 from its own
canonical row, so blocking recall is testable as an invariant
(``n_self_matched == n_dirty`` in every bucket).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# delete the character at 0-based offset (c_custkey mod length)
_DIRTY_EXPR = (
    "concat(substring(c_name, 1, c_custkey % length(c_name)), "
    "substring(c_name, (c_custkey % length(c_name)) + 2))"
)

# {s} ∪ all 1-deletions of s, deduplicated (repeated characters collapse)
_DELETION_KEYS_EXPR = (
    "array_union(array({s}), transform(sequence(1, length({s})), "
    "i -> concat(substring({s}, 1, i - 1), substring({s}, i + 1, length({s})))))"
)


def _with_keys(df: DataFrame, name_col: str) -> DataFrame:
    return df.withColumn(
        "bkey",
        F.explode(F.expr(_DELETION_KEYS_EXPR.format(s=name_col))),
    )


def fuzzy_link_summary(customer: DataFrame) -> DataFrame:
    """Histogram of the linkage outcome: for each dirty record count its
    verified ed≤1 canonical candidates; report (n_candidates → n_dirty,
    n_self_matched). Self-recovery must be total by construction."""
    dirty = customer.select(
        F.col("c_custkey").alias("dirty_id"),
        F.expr(_DIRTY_EXPR).alias("dirty_name"),
    )
    dkeys = _with_keys(dirty, "dirty_name")
    ckeys = _with_keys(
        customer.select("c_custkey", "c_name"), "c_name"
    )
    candidates = (
        dkeys.join(ckeys, "bkey")
        .select("dirty_id", "dirty_name", "c_custkey", "c_name")
        .distinct()
    )
    matches = candidates.filter(
        F.levenshtein(F.col("dirty_name"), F.col("c_name")) <= 1
    )
    per_dirty = matches.groupBy("dirty_id").agg(
        F.count(F.lit(1)).alias("n_candidates"),
        F.max(
            F.when(F.col("c_custkey") == F.col("dirty_id"), 1).otherwise(0)
        ).alias("selfm"),
    )
    return per_dirty.groupBy("n_candidates").agg(
        F.count(F.lit(1)).alias("n_dirty"),
        F.sum("selfm").alias("n_self_matched"),
    )


FUZZY_LINK_SUMMARY_SQL = """
WITH dirty AS (
  SELECT c_custkey AS dirty_id,
         substr(c_name, 1, c_custkey % length(c_name)) ||
         substr(c_name, (c_custkey % length(c_name)) + 2) AS dirty_name
  FROM customer),
m AS (
  SELECT d.dirty_id, c.c_custkey
  FROM dirty d JOIN customer c
    ON abs(length(d.dirty_name) - length(c.c_name)) <= 1
   AND levenshtein(d.dirty_name, c.c_name) <= 1),
per AS (
  SELECT dirty_id, count(*) AS n_candidates,
         max(CASE WHEN c_custkey = dirty_id THEN 1 ELSE 0 END) AS selfm
  FROM m GROUP BY 1)
SELECT n_candidates, count(*) AS n_dirty,
       CAST(sum(selfm) AS BIGINT) AS n_self_matched
FROM per GROUP BY 1
"""
