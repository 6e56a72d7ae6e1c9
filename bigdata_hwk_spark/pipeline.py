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
