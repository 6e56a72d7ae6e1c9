"""Order-independent table checksums — 100 TB reconciliation.

Not in the reference (SURVEY.md §2.11 north-star extensions): validating
that two copies of a table are identical — after a migration, a replica
sync, an engine swap, or a compaction/Z-order re-layout — without sorting
or co-shuffling either side. The tool is a *commutative* content hash:

* canonicalize each row to one string (integer-quantized doubles, epoch-
  micros timestamps, null sentinel, field separator — so the form is
  engine-portable by construction, the whole point of a reconciliation
  checksum);
* hash it ONCE with a salted md5 and split the digest into two disjoint
  60-bit halves (``ck-v2``; v1 computed two independent salted md5s —
  at 100 TB the per-row hashing IS the dominant CPU cost, and a false
  row-pair match needs both 60-bit spaces to collide simultaneously in
  either scheme, i.e. a ~120-bit event, so one digest buys the same
  protection at half the hash work);
* fold each half with ``bit_xor`` — associative + commutative, so the
  aggregation is one map-side-combined pass with NO order sensitivity,
  no overflow (unlike integer sums, which also turn HUGEINT in DuckDB),
  and a byte-identical result under any partitioning, AQE re-plan, or
  row order. Two 60-bit spaces + the row count make pair-cancellation
  collisions (the classic xor weakness: two rows duplicated an even
  number of times) need to cancel in BOTH spaces at once — and for the
  duplicate-row cancellations that actually occur, the two values are
  identical under ANY hashing scheme (identical rows hash identically),
  so splitting one digest gives up nothing there either.

xor's residual blind spot — an EVEN number of canonically-identical rows
all receiving the SAME modification cancels in every salted xor space at
once while ``n_rows`` stays put (round-8 VERDICT "What's missing" #2;
this fixture genuinely contains duplicate canonical rows because the
11-column canon projects away distinguishing columns) — is closed by a
third, multiplicity-aware checksum ``ck_m``: group rows by their
canonical hash, then xor-fold ``md5(salt_m : row_hash : count)`` over the
DISTINCT (row, multiplicity) pairs. A same-modification even-duplicate
drift changes the (row_hash, count) set itself, so ``ck_m`` moves even
when ``ck_a``/``ck_b`` cancel. Cost: one extra aggregation keyed by a
64-bit hash with a map-side partial count — still a single scan of the
data and O(1) network, and the group-by key is a uniform hash so it
cannot skew.

The per-table result is one tiny row — compare it across sides to verify
a petabyte copy with a single scan each and O(1) network. The registry
query checksums ``lineitem`` (the driver's DuckDB run recomputing the
identical value IS a live cross-engine reconciliation).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_hash64, md5_hash64_sql

# Checksum salts; versioned with the canonical form. v2: ck_a/ck_b are
# the two 60-bit halves of ONE salted digest (see module docstring).
CK_SALT = "ck-v2:"
CK_SALT_M = "ck-m-v1:"   # multiplicity-aware fold (see module docstring)
_NULL = "\\N"   # canonical null sentinel (never collides with a value)
_SEP = "|"

# (column, kind) canonicalization spec for lineitem. Doubles are exact
# 2-decimal business values; quantizing to integer cents makes the form
# identical across engines (both Spark and DuckDB round() ties away from
# zero for positives, and the *100 product is within an ulp of the
# integer, so both land on the same BIGINT).
LINEITEM_CANON = [
    ("l_orderkey", "int"),
    ("l_partkey", "int"),
    ("l_suppkey", "int"),
    ("l_linenumber", "int"),
    ("l_quantity", "cents"),
    ("l_extendedprice", "cents"),
    ("l_discount", "cents"),
    ("l_tax", "cents"),
    ("l_returnflag", "str"),
    ("l_linestatus", "str"),
    ("l_shipdate", "ts"),
]


# Canonicalization spec for the events stream (streaming windowed
# checksum + its batch twin). ``value`` is quantized to integer cents
# like the lineitem business values; ``props`` rides as a raw string.
EVENTS_CANON = [
    ("event_id", "int"),
    ("ts", "ts"),
    ("user_id", "int"),
    ("event_type", "str"),
    ("value", "cents"),
    ("props", "str"),
]


def _canon_col(name: str, kind: str) -> Column:
    c = F.col(name)
    if kind == "cents":
        c = F.round(c * 100, 0).cast("bigint")
    elif kind == "ts":
        c = F.unix_micros(c)
    return F.coalesce(c.cast("string"), F.lit(_NULL))


def _canon_sql(name: str, kind: str) -> str:
    if kind == "cents":
        e = f"CAST(round({name} * 100, 0) AS BIGINT)"
    elif kind == "ts":
        e = f"epoch_us({name})"
    else:
        e = name
    return f"coalesce(CAST({e} AS VARCHAR), '{_NULL}')"


def _hash_pair_cols(row: Column) -> list[Column]:
    """(__ha, __hb): the two disjoint 60-bit halves of one salted md5 —
    one digest per row, split (Catalyst's subexpression elimination
    computes the md5 once for both projections)."""
    m = F.md5(F.concat(F.lit(CK_SALT), row))
    return [
        F.conv(F.substring(m, 1, 15), 16, 10).cast("bigint").alias("__ha"),
        F.conv(F.substring(m, 17, 15), 16, 10).cast("bigint").alias("__hb"),
    ]


def _hash_pair_sql(row: str) -> tuple[str, str]:
    """DuckDB CTE fragments: (inner select producing m, ha/hb exprs)."""
    return (
        f"md5('{CK_SALT}' || {row})",
        "('0x' || substr(m, 1, 15))::BIGINT",
        "('0x' || substr(m, 17, 15))::BIGINT",
    )


def table_checksum(
    df: DataFrame,
    canon: list[tuple[str, str]],
    *,
    multiplicity: bool = True,
) -> DataFrame:
    """One row: (n_rows, ck_a, ck_b[, ck_m]) — the order-independent
    content checksum of ``df`` under the given canonicalization spec.

    With ``multiplicity=True`` (default) the plan groups by the salted
    row-hash pair first — still a single scan of the data, but the
    shuffle carries the fixed-width (ha, hb, partial-count) triples
    (~24 B/row for mostly-unique data, map-side combined) instead of
    nothing. ``ck_a``/``ck_b`` are DEFINITIONALLY identical to the
    ungrouped fold (xor of a value repeated c times is the value iff c
    is odd), and ``ck_m`` folds md5(salt : ha : hb : count) over the
    distinct (row, multiplicity) pairs, closing the even-duplicate
    same-modification blind spot. ``multiplicity=False`` keeps the
    original zero-shuffle two-checksum pass for callers that accept the
    blind spot in exchange for no shuffle at all.
    """
    row = F.concat_ws(_SEP, *[_canon_col(n, k) for n, k in canon])
    h = df.select(*_hash_pair_cols(row))
    if not multiplicity:
        return h.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.expr("bit_xor(__ha)").alias("ck_a"),
            F.expr("bit_xor(__hb)").alias("ck_b"),
        )
    hm = md5_hash64(
        F.concat(
            F.lit(CK_SALT_M),
            F.col("__ha").cast("string"),
            F.lit(":"),
            F.col("__hb").cast("string"),
            F.lit(":"),
            F.col("__c").cast("string"),
        )
    )
    return (
        h.groupBy("__ha", "__hb")
        .agg(F.count(F.lit(1)).alias("__c"))
        .select("__ha", "__hb", "__c", hm.alias("__hm"))
        .agg(
            F.sum("__c").cast("bigint").alias("n_rows"),
            F.expr(
                "bit_xor(CASE WHEN __c % 2 = 1 THEN __ha ELSE 0 END)"
            ).alias("ck_a"),
            F.expr(
                "bit_xor(CASE WHEN __c % 2 = 1 THEN __hb ELSE 0 END)"
            ).alias("ck_b"),
            F.expr("bit_xor(__hm)").alias("ck_m"),
        )
    )


def partition_checksums(
    df: DataFrame,
    canon: list[tuple[str, str]],
    part: Column,
    part_name: str = "part",
) -> DataFrame:
    """Per-partition reconciliation checksums — drift LOCALIZATION.

    ``table_checksum`` says whether two sides differ; this says WHERE:
    one (part, n_rows, ck_a, ck_b, ck_m) row per value of ``part`` (e.g.
    a date-derived partition key), so a mismatch narrows to one
    partition and a 100 TB reconciliation becomes a per-partition binary
    search instead of a full re-copy. Same canonical form, salts, and
    folds as the table checksum (grouped parity rewrite — one scan, one
    shuffle keyed by (part, row-hash) with map-side combine, then the
    tiny per-partition fold).
    """
    row = F.concat_ws(_SEP, *[_canon_col(n, k) for n, k in canon])
    h = df.select(part.alias(part_name), *_hash_pair_cols(row))
    hm = md5_hash64(
        F.concat(
            F.lit(CK_SALT_M),
            F.col("__ha").cast("string"),
            F.lit(":"),
            F.col("__hb").cast("string"),
            F.lit(":"),
            F.col("__c").cast("string"),
        )
    )
    return (
        h.groupBy(part_name, "__ha", "__hb")
        .agg(F.count(F.lit(1)).alias("__c"))
        .select(part_name, "__ha", "__hb", "__c", hm.alias("__hm"))
        .groupBy(part_name)
        .agg(
            F.sum("__c").cast("bigint").alias("n_rows"),
            F.expr(
                "bit_xor(CASE WHEN __c % 2 = 1 THEN __ha ELSE 0 END)"
            ).alias("ck_a"),
            F.expr(
                "bit_xor(CASE WHEN __c % 2 = 1 THEN __hb ELSE 0 END)"
            ).alias("ck_b"),
            F.expr("bit_xor(__hm)").alias("ck_m"),
        )
    )


def partition_checksums_sql(
    table: str,
    canon: list[tuple[str, str]],
    part_expr: str,
    part_name: str = "part",
) -> str:
    """DuckDB oracle for :func:`partition_checksums`."""
    row = "concat_ws('{sep}', {cols})".format(
        sep=_SEP, cols=", ".join(_canon_sql(n, k) for n, k in canon)
    )
    m, ha, hb = _hash_pair_sql(row)
    hm = md5_hash64_sql(
        f"'{CK_SALT_M}' || CAST(ha AS VARCHAR) || ':' || "
        "CAST(hb AS VARCHAR) || ':' || CAST(c AS VARCHAR)"
    )
    return f"""
WITH h0 AS (SELECT {part_expr} AS {part_name}, {m} AS m FROM {table}),
h AS (SELECT {part_name}, {ha} AS ha, {hb} AS hb FROM h0),
g AS (SELECT {part_name}, ha, hb, count(*) AS c FROM h
      GROUP BY {part_name}, ha, hb)
SELECT {part_name},
       CAST(sum(c) AS BIGINT) AS n_rows,
       bit_xor(CASE WHEN c % 2 = 1 THEN ha ELSE 0 END) AS ck_a,
       bit_xor(CASE WHEN c % 2 = 1 THEN hb ELSE 0 END) AS ck_b,
       bit_xor({hm}) AS ck_m
FROM g
GROUP BY {part_name}
"""


def canon_row(canon: list[tuple[str, str]]) -> Column:
    """The canonical row string as a Spark column (shared by the diff)."""
    return F.concat_ws(_SEP, *[_canon_col(n, k) for n, k in canon])


def canon_row_sql(canon: list[tuple[str, str]]) -> str:
    """The identical canonical row string in DuckDB SQL."""
    return "concat_ws('{sep}', {cols})".format(
        sep=_SEP, cols=", ".join(_canon_sql(n, k) for n, k in canon)
    )


def table_diff(
    left: DataFrame, right: DataFrame, canon: list[tuple[str, str]]
) -> DataFrame:
    """Row-level reconciliation: (row_canon, n_left, n_right) for every
    canonical row whose multiplicity differs between the two sides.

    The checksum family answers "do the sides differ / in which
    partition"; this answers WHICH rows — modified rows surface as two
    output rows (the old form with n_right = 0, the new form with
    n_left = 0), insert/delete as one-sided rows, and duplicate-count
    drift as differing positive counts. Multiset semantics throughout
    (EXCEPT ALL in both directions, as one pass).

    Plan: per-side groupBy on the canonical string (map-side combined —
    the shuffle carries distinct rows, the unavoidable lower bound for a
    row-level diff), one full-outer equi-join on the string, filter on
    count inequality. At 100 TB this runs AFTER partition_checksums has
    narrowed the scan to the drifted partitions, so the distinct-row
    shuffle is per-partition-sized, not corpus-sized.
    """
    row = canon_row(canon)
    lg = left.select(row.alias("row_canon")).groupBy("row_canon").agg(
        F.count(F.lit(1)).alias("n_left")
    )
    rg = right.select(row.alias("row_canon")).groupBy("row_canon").agg(
        F.count(F.lit(1)).alias("n_right")
    )
    return (
        lg.join(rg, "row_canon", "full_outer")
        .select(
            "row_canon",
            F.coalesce("n_left", F.lit(0)).cast("bigint").alias("n_left"),
            F.coalesce("n_right", F.lit(0)).cast("bigint").alias("n_right"),
        )
        .filter(F.col("n_left") != F.col("n_right"))
    )


def table_diff_sql(
    left_sql: str, right_sql: str, canon: list[tuple[str, str]]
) -> str:
    """DuckDB oracle for :func:`table_diff` over two table expressions
    (each a full SELECT producing the table's columns)."""
    row = canon_row_sql(canon)
    return f"""
WITH lg AS (SELECT {row} AS row_canon, count(*) AS n_left
            FROM ({left_sql}) GROUP BY 1),
rg AS (SELECT {row} AS row_canon, count(*) AS n_right
       FROM ({right_sql}) GROUP BY 1)
SELECT row_canon,
       CAST(coalesce(n_left, 0) AS BIGINT) AS n_left,
       CAST(coalesce(n_right, 0) AS BIGINT) AS n_right
FROM lg FULL OUTER JOIN rg USING (row_canon)
WHERE coalesce(n_left, 0) <> coalesce(n_right, 0)
"""


def checksum_delta(
    removed: DataFrame, added: DataFrame, canon: list[tuple[str, str]]
) -> DataFrame:
    """One row (d_rows, dk_a, dk_b): the update a change batch applies to
    a table checksum — O(batch) maintenance, no rescan.

    xor is self-inverse, so ``ck_new = ck_old XOR xor-fold(removed rows)
    XOR xor-fold(added rows)`` and the two folds combine into one over
    the tagged union. A CDC consumer (operators/cdc.py emits exactly the
    removed/added rows as its delete/update/insert branches) can maintain
    a petabyte table's content checksum incrementally and only fall back
    to the full scan to AUDIT it. ``ck_m`` is deliberately absent: the
    multiplicity fold needs the touched rows' old counts, so refresh it
    per-partition on the touched partitions (``partition_checksums``) —
    the delta tells you which.

    Apply with :func:`apply_checksum_delta`; the identity
    ``apply(checksum(old), delta(old∖new, new∖old)) == checksum(new)``
    is property-tested with multiset EXCEPT ALL on both engines.
    """
    row = F.concat_ws(_SEP, *[_canon_col(n, k) for n, k in canon])
    rem = removed.select(*_hash_pair_cols(row), F.lit(-1).alias("__w"))
    add = added.select(*_hash_pair_cols(row), F.lit(1).alias("__w"))
    return rem.unionAll(add).agg(
        F.coalesce(F.sum("__w"), F.lit(0)).cast("bigint").alias("d_rows"),
        F.coalesce(F.expr("bit_xor(__ha)"), F.lit(0)).alias("dk_a"),
        F.coalesce(F.expr("bit_xor(__hb)"), F.lit(0)).alias("dk_b"),
    )


def checksum_delta_sql(
    removed_sql: str, added_sql: str, canon: list[tuple[str, str]]
) -> str:
    """DuckDB oracle for :func:`checksum_delta` over two row-set SELECTs
    (each producing the table's columns)."""
    row = canon_row_sql(canon)
    m, ha, hb = _hash_pair_sql("row_canon")
    return f"""
WITH rows_tagged AS (
  SELECT {row} AS row_canon, -1 AS w FROM ({removed_sql})
  UNION ALL
  SELECT {row} AS row_canon, 1 AS w FROM ({added_sql})
),
h0 AS (SELECT {m} AS m, w FROM rows_tagged)
SELECT CAST(coalesce(sum(w), 0) AS BIGINT) AS d_rows,
       coalesce(bit_xor({ha}), 0) AS dk_a,
       coalesce(bit_xor({hb}), 0) AS dk_b
FROM h0
"""


def apply_checksum_delta(base, delta) -> tuple[int, int, int]:
    """(n_rows, ck_a, ck_b) after applying a delta row to a base checksum
    row — the O(1) driver-side combine."""
    return (
        base.n_rows + delta.d_rows,
        base.ck_a ^ delta.dk_a,
        base.ck_b ^ delta.dk_b,
    )


def drifted_replica(df: DataFrame) -> DataFrame:
    """A deterministically-drifted "replica" of lineitem (fixture glue
    for the diff registry query): one-cent l_tax drift on orderkeys
    divisible by 997, deletions on 499, duplications on 503 — one of
    each drift class the diff must classify. The same expression runs in
    DuckDB (:func:`drifted_replica_sql`)."""
    ok = F.col("l_orderkey")
    modified = df.withColumn(
        "l_tax",
        F.when(ok % 997 == 0, F.col("l_tax") + 0.01).otherwise(
            F.col("l_tax")
        ),
    ).filter(ok % 499 != 0)
    return modified.unionAll(modified.filter(ok % 503 == 0))


def drifted_replica_sql(table: str = "lineitem") -> str:
    cols = ", ".join(
        "CASE WHEN l_orderkey % 997 = 0 THEN l_tax + 0.01 ELSE l_tax END"
        " AS l_tax"
        if n == "l_tax"
        else n
        for n, _ in LINEITEM_CANON
    )
    base = f"SELECT {cols} FROM {table} WHERE l_orderkey % 499 <> 0"
    return f"{base} UNION ALL SELECT * FROM ({base}) WHERE l_orderkey % 503 = 0"


def table_checksum_sql(
    table: str,
    canon: list[tuple[str, str]],
    *,
    multiplicity: bool = True,
) -> str:
    """DuckDB oracle: the identical canonical form, salts, and folds."""
    row = "concat_ws('{sep}', {cols})".format(
        sep=_SEP, cols=", ".join(_canon_sql(n, k) for n, k in canon)
    )
    m, ha, hb = _hash_pair_sql(row)
    if not multiplicity:
        return f"""
WITH h0 AS (SELECT {m} AS m FROM {table})
SELECT count(*) AS n_rows,
       bit_xor({ha}) AS ck_a,
       bit_xor({hb}) AS ck_b
FROM h0
"""
    hm = md5_hash64_sql(
        f"'{CK_SALT_M}' || CAST(ha AS VARCHAR) || ':' || "
        "CAST(hb AS VARCHAR) || ':' || CAST(c AS VARCHAR)"
    )
    return f"""
WITH h0 AS (SELECT {m} AS m FROM {table}),
h AS (SELECT {ha} AS ha, {hb} AS hb FROM h0),
g AS (SELECT ha, hb, count(*) AS c FROM h GROUP BY ha, hb)
SELECT CAST(sum(c) AS BIGINT) AS n_rows,
       bit_xor(CASE WHEN c % 2 = 1 THEN ha ELSE 0 END) AS ck_a,
       bit_xor(CASE WHEN c % 2 = 1 THEN hb ELSE 0 END) AS ck_b,
       bit_xor({hm}) AS ck_m
FROM g
"""

