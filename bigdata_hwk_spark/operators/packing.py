"""Sequence packing — laying a token stream into fixed-budget contexts.

Not in the reference (SURVEY.md §2.11 north-star extensions): the last
step of an LLM pretraining data pipeline is concatenating documents into
fixed-length training sequences (the GPT-style "packing" layout: docs
are laid end-to-end in a deterministic order and the stream is cut every
``budget`` tokens; a document whose tokens straddle a cut simply spans
two sequences). The operator assigns every document its (shard, seq_id,
offset) coordinates WITHOUT materializing the token stream.

Scale shape: a single global document order would serialize the window
into one partition, so documents are first sharded by a salted hash of
``doc_id`` (the same content-stable projection the split operators use —
no data-dependent skew, appends land deterministically), and the
cumulative token sum runs per shard: ``Window.partitionBy(shard)
.orderBy(doc_id)`` — N_SHARDS independent sorted windows, each the size
of corpus/N_SHARDS, exactly how a 1000-executor run wants it. Each
shard yields its own independent sequence stream (standard practice —
parallel writers each produce whole sequences).

Everything is integer arithmetic on (doc_id, n_tokens): deterministic,
engine-portable, and fully SQL-expressible — the DuckDB oracle runs the
identical window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import md5_hash64, md5_hash64_sql

PACK_SALT = "pack-v1"
PACK_BUDGET = 512       # tokens per training sequence
PACK_SHARDS = 8         # independent packing streams


def _shard_col():
    return (
        md5_hash64(
            F.concat(F.lit(PACK_SALT + ":"), F.col("doc_id").cast("string"))
        )
        % PACK_SHARDS
    ).cast("bigint")


def _shard_sql() -> str:
    h = md5_hash64_sql(f"'{PACK_SALT}:' || CAST(doc_id AS VARCHAR)")
    return f"({h} % {PACK_SHARDS})"


def pack_sequences(
    documents: DataFrame,
    budget: int = PACK_BUDGET,
    shards: int = PACK_SHARDS,
) -> DataFrame:
    """(doc_id, shard, n_tokens, seq_id, seq_offset, spans_boundary):
    the packing coordinates of every document.

    * ``seq_id`` — which fixed-``budget`` sequence (within the shard)
      the document's FIRST token lands in;
    * ``seq_offset`` — the token offset of the document inside that
      sequence;
    * ``spans_boundary`` — whether the document crosses one or more
      sequence cuts (its tail continues in the next sequence(s)).

    Whitespace token counts (``size(split(text))``) keep the whole plan
    in whole-stage codegen; swap in ``token_count_bpe``'s regex for BPE
    budgets.
    """
    toks = F.size(F.split(F.col("text"), " ")).cast("bigint")
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    docs = documents.select(
        "doc_id", _shard_col().alias("shard"), toks.alias("n_tokens")
    ).withColumn(
        "cum_prev", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    )
    return docs.select(
        "doc_id",
        "shard",
        "n_tokens",
        F.floor(F.col("cum_prev") / budget).cast("bigint").alias("seq_id"),
        (F.col("cum_prev") % budget).alias("seq_offset"),
        (
            (F.col("cum_prev") % budget) + F.col("n_tokens") > budget
        ).alias("spans_boundary"),
    )


def pack_sequences_sql(
    budget: int = PACK_BUDGET, shards: int = PACK_SHARDS
) -> str:
    return f"""
WITH d AS (
  SELECT doc_id, {_shard_sql()} AS shard,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, shard, n_tokens,
         CAST(coalesce(sum(n_tokens) OVER (
            PARTITION BY shard ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS cum_prev
  FROM d
)
SELECT doc_id, shard, n_tokens,
       CAST(floor(cum_prev / {budget}) AS BIGINT) AS seq_id,
       cum_prev % {budget} AS seq_offset,
       (cum_prev % {budget}) + n_tokens > {budget} AS spans_boundary
FROM c
"""


def packing_stats(
    documents: DataFrame,
    budget: int = PACK_BUDGET,
    shards: int = PACK_SHARDS,
) -> DataFrame:
    """Per-shard packing summary: documents, tokens, sequences produced,
    boundary-spanning docs, and the fill ratio of the final (ragged)
    sequence — the O(shards) health check a petabyte packing run reports
    instead of the per-doc layout."""
    packed = pack_sequences(documents, budget, shards)
    return (
        packed.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            (
                F.ceil(F.sum("n_tokens") / F.lit(float(budget)))
            ).cast("bigint").alias("n_sequences"),
            F.sum(F.col("spans_boundary").cast("bigint")).alias(
                "n_spanning_docs"
            ),
        )
        .orderBy("shard")
    )


def packing_stats_sql(
    budget: int = PACK_BUDGET, shards: int = PACK_SHARDS
) -> str:
    return f"""
WITH packed AS ({pack_sequences_sql(budget, shards)})
SELECT shard,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       CAST(ceil(sum(n_tokens) / {float(budget)!r}) AS BIGINT) AS n_sequences,
       CAST(sum(CAST(spans_boundary AS BIGINT)) AS BIGINT) AS n_spanning_docs
FROM packed
GROUP BY shard
ORDER BY shard
"""


# ---------------------------------------------------------------------------
# Release manifest: the packing layout, checksum-certified per shard
# ---------------------------------------------------------------------------

MANIFEST_SALT = "pack-manifest-v1:"


def shard_release_manifest(
    documents: DataFrame,
    budget: int = PACK_BUDGET,
    shards: int = PACK_SHARDS,
) -> DataFrame:
    """Per-shard release manifest with an order-independent checksum of
    the LAYOUT: (shard, n_docs, n_tokens, n_sequences, ck_a, ck_b).

    A training-data release hands downstream consumers shard files plus
    a manifest; the consumer must be able to verify "the layout I read
    is the layout you packed" without re-deriving it. The xor fold of
    the salted (doc_id : n_tokens : seq_id : seq_offset) rows is the
    reconciliation-family construction applied to the packing
    coordinates — two independent packing runs (or the producer and a
    consumer's audit, or Spark and the DuckDB oracle here) certify each
    other by comparing O(shards) tiny rows. Deterministic because the
    packing itself is (salted shard hash + doc_id order + integer
    sums).
    """
    from .reconcile import _hash_pair_cols

    packed = pack_sequences(documents, budget, shards)
    row = F.concat_ws(
        ":",
        F.col("doc_id").cast("string"),
        F.col("n_tokens").cast("string"),
        F.col("seq_id").cast("string"),
        F.col("seq_offset").cast("string"),
    )
    h = packed.select(
        "shard", "n_tokens",
        *_hash_pair_cols(F.concat(F.lit(MANIFEST_SALT), row)),
    )
    return (
        h.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.ceil(F.sum("n_tokens") / F.lit(float(budget)))
            .cast("bigint")
            .alias("n_sequences"),
            F.expr("bit_xor(__ha)").alias("ck_a"),
            F.expr("bit_xor(__hb)").alias("ck_b"),
        )
        .orderBy("shard")
    )


def shard_release_manifest_sql(
    budget: int = PACK_BUDGET, shards: int = PACK_SHARDS
) -> str:
    from .reconcile import _hash_pair_sql

    row = (
        "CAST(doc_id AS VARCHAR) || ':' || CAST(n_tokens AS VARCHAR)"
        " || ':' || CAST(seq_id AS VARCHAR)"
        " || ':' || CAST(seq_offset AS VARCHAR)"
    )
    m, ha, hb = _hash_pair_sql(f"'{MANIFEST_SALT}' || {row}")
    # _hash_pair_sql salts with CK_SALT internally on top of our salt —
    # identical on the Spark side, where _hash_pair_cols does the same
    return f"""
WITH packed AS ({pack_sequences_sql(budget, shards)}),
h AS (SELECT shard, n_tokens, {m} AS m FROM packed)
SELECT shard,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       CAST(ceil(sum(n_tokens) / {float(budget)!r}) AS BIGINT) AS n_sequences,
       bit_xor({ha}) AS ck_a,
       bit_xor({hb}) AS ck_b
FROM h
GROUP BY shard
ORDER BY shard
"""


# ---------------------------------------------------------------------------
# Length-bucketed batching: padding-waste accounting for inference
# ---------------------------------------------------------------------------

def length_bucket_padding_stats(documents: DataFrame) -> DataFrame:
    """(bucket, n_docs, max_tokens, sum_tokens, padded_tokens, waste_pct)
    — the inference-side twin of training packing: batched inference pads
    every sequence in a batch to the batch max, so batching docs of
    wildly different lengths burns compute on pad tokens. Bucketing by
    power-of-two token length (bucket = bit length of n_tokens, i.e.
    ⌊log2⌋+1) bounds within-bucket padding waste below 50% by
    construction; this operator reports the actual per-bucket waste a
    scheduler would see if each bucket padded to its own max.

    Map-only projection + one ≤64-group aggregation — nothing here grows
    with corpus size except the scan. All integer arithmetic except the
    final display ratio (one division of two exact integers, identical
    IEEE on both engines).
    """
    n = F.size(F.split(F.col("text"), " "))
    t = documents.select(
        F.length(F.conv((n - 1).cast("string"), 10, 2)).alias("bucket"),
        n.alias("n_tokens"),
    )
    agg = t.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.max("n_tokens").cast("bigint").alias("max_tokens"),
        F.sum("n_tokens").cast("bigint").alias("sum_tokens"),
    )
    padded = F.col("n_docs") * F.col("max_tokens")
    return agg.select(
        "bucket",
        "n_docs",
        "max_tokens",
        "sum_tokens",
        padded.alias("padded_tokens"),
        ((padded - F.col("sum_tokens")) / padded).alias("waste_pct"),
    )


def length_bucket_padding_stats_sql() -> str:
    """DuckDB oracle: identical bucketing (bit length via bin string of
    n_tokens − 1, matching Spark's conv-to-base-2 length) and arithmetic."""
    return """
WITH t AS (
  SELECT CAST(length(bin(len(string_split(text, ' ')) - 1)) AS INTEGER)
           AS bucket,
         len(string_split(text, ' ')) AS n_tokens
  FROM documents),
agg AS (
  SELECT bucket, count(*) AS n_docs,
         CAST(max(n_tokens) AS BIGINT) AS max_tokens,
         CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
  FROM t GROUP BY 1)
SELECT bucket, n_docs, max_tokens, sum_tokens,
       n_docs * max_tokens AS padded_tokens,
       (n_docs * max_tokens - sum_tokens)
         / CAST(n_docs * max_tokens AS DOUBLE) AS waste_pct
FROM agg
"""
