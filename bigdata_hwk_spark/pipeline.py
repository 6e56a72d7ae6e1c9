"""End-to-end corpus curation pipeline (the integration artifact).

Not a new operator: a composition of the oracle-checked extension
families into the one pass a training-data owner actually runs —
scrub → exact dedup → near-dup collapse → quality funnel →
leakage-safe split → partitioned parquet. Each stage's count lands in a
deterministic report (the per-stage "funnel" a curation run is judged
by), and every stage is the library operator the registry already
verifies, so the pipeline inherits their correctness and scale posture:
nothing here collects more than O(stages) numbers to the driver, and the
only writes are the hive-partitioned split directories.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions import text as TX
from .operators import dedup as D
from .operators import splits as SP
from .sinks import write_partitioned
from .sources.tables import fan_out, load_table


def curate_corpus(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str | None = None,
    tau: float = D.JACCARD_TAU,
) -> tuple[DataFrame, list[str]]:
    """Run the full curation pass; returns (kept_docs, report_lines).

    ``kept_docs`` is (doc_id, split): the surviving corpus with its
    leakage-safe train/valid/test assignment. When ``out_dir`` is given
    it is also written as parquet partitioned by split.

    Survival = scrubbed doc that is (a) the canonical copy of its exact
    content group, (b) the canonical member of its near-dup cluster (or
    in no cluster), and (c) kept by the quality funnel. The dedup keep
    sets come from anti-joining the non-canonical ids — one shuffle per
    stage, each on doc_id.
    """
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    n_total = docs.count()

    # 1. PII scrub (counts only — the fixture corpus is synthetic; the
    # scrubbed text itself stays distributed and unused downstream here)
    pii = TX.pii_scrub(docs).agg(
        F.sum("n_urls") + F.sum("n_emails") + F.sum("n_phones")
    ).first()[0]

    # 2. exact dedup: keep one doc per identical content
    exact_losers = (
        docs.select("doc_id", D.md5_hash64(F.col("text")).alias("h"))
        .withColumn("keep_id", F.min("doc_id").over(Window.partitionBy("h")))
        .filter(F.col("doc_id") != F.col("keep_id"))
        .select("doc_id")
    )
    docs1 = docs.join(exact_losers, "doc_id", "left_anti")
    n_after_exact = docs1.count()

    # 3. near-dup collapse: keep canonical cluster members only
    clusters = D.dedup_clusters(docs1, tau=tau)
    neardup_losers = clusters.filter(~F.col("is_canonical")).select("doc_id")
    docs2 = docs1.join(neardup_losers, "doc_id", "left_anti")
    n_after_neardup = docs2.count()

    # 4. quality funnel on the survivors
    metrics = (
        TX.quality_scores(docs2)
        .select("doc_id", "quality_score")
        .join(
            TX.repetition_stats(docs2).select(
                "doc_id", "n_tokens", "top_token_frac", "dup_trigram_frac"
            ),
            "doc_id",
        )
    )
    kept_ids = metrics.filter(
        (F.col("quality_score") >= TX.CURATION_MIN_QUALITY)
        & (F.col("top_token_frac") <= TX.CURATION_MAX_TOP_TOKEN)
        & (F.col("dup_trigram_frac") <= TX.CURATION_MAX_DUP_TRIGRAM)
        & (F.col("n_tokens") >= TX.CURATION_MIN_TOKENS)
    ).select("doc_id")
    docs3 = docs2.join(kept_ids, "doc_id", "left_semi")
    n_kept = docs3.count()

    # 5. leakage-safe split of the kept corpus
    split = SP.leakage_safe_split(docs3, tau=tau).select("doc_id", "split")
    split_counts = {
        r.split: r.n for r in
        split.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }

    if out_dir is not None:
        write_partitioned(split, out_dir, ["split"], sort_cols=["doc_id"])

    report = [
        f"Docs in corpus = {n_total}",
        f"PII spans redacted = {int(pii or 0)}",
        f"After exact dedup = {n_after_exact}",
        f"After near-dup collapse = {n_after_neardup}",
        f"After quality funnel = {n_kept}",
        *(
            f"Split {name} = {split_counts.get(name, 0)}"
            for name in ("train", "valid", "test")
        ),
    ]
    return split, report


# ---------------------------------------------------------------------------
# Oracle-checked release funnel (staged attrition report)
# ---------------------------------------------------------------------------

RELEASE_EVAL_MOD = 7          # doc_id % 7 == 0 is the held-out eval split
RELEASE_MIN_TOKENS = TX.CURATION_MIN_TOKENS


def release_funnel_report(documents: DataFrame) -> DataFrame:
    """(stage_ord, stage, n_docs, n_tokens): the staged attrition report
    of a pre-training data release — held-out eval cut → exact dedup →
    quality gate → 8-gram decontamination — each stage the library
    operator the registry already verifies, composed into ONE
    hash-checked plan (``curate_corpus`` is the imperative integration
    twin with near-dup collapse and the parquet sink; THIS is the
    declarative, DuckDB-provable recipe a release audit signs off on —
    near-dup collapse is deliberately left to its own oracle-checked
    family, whose recursive-closure oracle doesn't belong inside a
    mega-CTE).

    Stages: 0 ingest (everything); 1 train side (eval split held out by
    id hash-mod contract); 2 exact dedup (min doc_id per md5(text) —
    the window keeper); 3 quality gate (rounded score ≥ τ AND token
    floor); 4 decontaminated (drop survivors sharing a verbatim 8-gram
    with ANY eval doc — ``contamination_check``'s bipartite index).

    Scale shape: every stage is a projection/window/anti-join on doc_id
    or an alphabet-bounded aggregate; the one corpus-scale exchange new
    to this query is the md5-content window (the exact-dedup shuffle
    every dedup pipeline pays once); the funnel rows are five one-row
    aggregates unioned. Determinism: counts are exact integers; the
    quality threshold compares the 6-rounded score (curation_funnel's
    contract); md5 strings are identical across engines.
    """
    from .session import persist_once

    tok = documents.select(
        "doc_id",
        "text",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("toks"),
    )
    corpus = persist_once(tok.filter(F.col("doc_id") % RELEASE_EVAL_MOD != 0))
    evals = tok.filter(F.col("doc_id") % RELEASE_EVAL_MOD == 0).select(
        "doc_id", "text"
    )
    w = Window.partitionBy(F.md5(F.col("text"))).orderBy("doc_id")
    s2 = persist_once(
        corpus.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "text", "toks")
    )
    q = TX.quality_scores(documents).select("doc_id", "quality_score")
    s3 = persist_once(
        s2.join(q, "doc_id")
        .filter(
            (F.col("quality_score") >= TX.CURATION_MIN_QUALITY)
            & (F.col("toks") >= RELEASE_MIN_TOKENS)
        )
        .select("doc_id", "text", "toks")
    )
    contaminated = D.contamination_check(s3, evals).select("doc_id")
    s4 = s3.join(contaminated, "doc_id", "left_anti")

    def stage(ord_, name, df):
        return df.agg(
            F.lit(ord_).cast("int").alias("stage_ord"),
            F.lit(name).alias("stage"),
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.coalesce(F.sum("toks"), F.lit(0)).cast("bigint").alias(
                "n_tokens"
            ),
        )

    return (
        stage(0, "ingest", tok)
        .union(stage(1, "train_side", corpus))
        .union(stage(2, "exact_dedup", s2))
        .union(stage(3, "quality_gate", s3))
        .union(stage(4, "decontaminated", s4))
    )


def release_funnel_report_sql() -> str:
    """Oracle: the identical staged recipe as one CTE chain."""
    from .operators.dedup import shingles_sql

    return f"""
WITH tok AS (
  SELECT doc_id, text,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
  FROM documents),
corpus AS (SELECT * FROM tok WHERE doc_id % {RELEASE_EVAL_MOD} != 0),
s2 AS (
  SELECT doc_id, text, toks FROM (
    SELECT doc_id, text, toks,
           row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM corpus) WHERE rn = 1),
q AS ({TX.QUALITY_SCORES_SQL}),
s3 AS (
  SELECT s2.doc_id, s2.text, s2.toks
  FROM s2 JOIN q USING (doc_id)
  WHERE q.quality_score >= {TX.CURATION_MIN_QUALITY!r}
    AND s2.toks >= {RELEASE_MIN_TOKENS}),
sh AS ({shingles_sql(8)}),
contaminated AS (
  SELECT DISTINCT c.doc_id
  FROM (SELECT doc_id, sh FROM sh
        WHERE doc_id IN (SELECT doc_id FROM s3)) c
  JOIN (SELECT sh FROM sh WHERE doc_id % {RELEASE_EVAL_MOD} = 0) e
    USING (sh)),
s4 AS (
  SELECT * FROM s3
  WHERE doc_id NOT IN (SELECT doc_id FROM contaminated))
SELECT CAST(0 AS INT) AS stage_ord, 'ingest' AS stage,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(coalesce(sum(toks), 0) AS BIGINT) AS n_tokens FROM tok
UNION ALL
SELECT CAST(1 AS INT), 'train_side', CAST(count(*) AS BIGINT),
       CAST(coalesce(sum(toks), 0) AS BIGINT) FROM corpus
UNION ALL
SELECT CAST(2 AS INT), 'exact_dedup', CAST(count(*) AS BIGINT),
       CAST(coalesce(sum(toks), 0) AS BIGINT) FROM s2
UNION ALL
SELECT CAST(3 AS INT), 'quality_gate', CAST(count(*) AS BIGINT),
       CAST(coalesce(sum(toks), 0) AS BIGINT) FROM s3
UNION ALL
SELECT CAST(4 AS INT), 'decontaminated', CAST(count(*) AS BIGINT),
       CAST(coalesce(sum(toks), 0) AS BIGINT) FROM s4
"""
