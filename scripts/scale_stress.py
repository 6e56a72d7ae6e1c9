#!/usr/bin/env python3
"""Self-scaled stress run: measure how the slowest queries actually scale.

Every "survives 100x" claim in the docstrings is a plan-shape argument;
this script converts it into data (round-6 VERDICT #1). It
union-replicates the sf0.1 documents/embeddings/events fixtures N times
with shifted ids and decorrelated content, times the slowest document-
and events-grain queries at 1x and Nx (warm pass then timed pass, noop
sink — the bench.py methodology), and records the wall-time ratio and
scaling exponent log(tN/t1)/log(N) into SCALE_STRESS.json at the repo
root. Events replicate by shifting user_id — horizontal growth (N× users
at constant per-user density), the shape a bigger cluster actually sees
for the interval-join/window family.

Replication preserves workload character instead of planting adversarial
duplicates:

* documents: doc_id shifted by a stride divisible by every registry
  filter modulus (so each replica reproduces the original eval/batch
  splits); text passed through a per-replica caesar rotation — token
  lengths, shingle counts, and duplicate structure are preserved WITHIN
  a replica, while shingles never collide ACROSS replicas (an exact N-way
  text copy would quadratically inflate every inverted-index bucket and
  measure an artifact, not scaling).
* embeddings: vec_id shifted; the vector cyclically rotated per replica
  (norm-preserving, decorrelates cross-replica cosines).

ann_lsh_pairs is measured twice: at fixture bits (expected to go
superlinear — with 2^bits buckets fixed, per-bucket occupancy grows with
n and the candidate join is quadratic per bucket) and at the documented
scale knob bits + ceil(log2(N)) (constant occupancy — the configuration
a 100 TB deployment runs). Recording both makes the knob's necessity
measurable rather than asserted.

Usage: python scripts/scale_stress.py   (env: SPARK_GRAFT_SF_DIR,
SPARK_GRAFT_CPUS, SCALE_STRESS_N, SCALE_STRESS_WORKDIR)
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Observation, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

# divisible by 4, 5, 7 (registry filter moduli) and far above any fixture id
ID_STRIDE = 14_000_000
LOWER = "abcdefghijklmnopqrstuvwxyz"
UPPER = LOWER.upper()

QUERIES = [
    "decontamination_check",
    "text_repetition_stats",
    "curation_funnel",
    "text_tfidf_top_terms",
    "dedup_incremental_ingest",
    "ann_lsh_pairs",
    # round-6 additions: the heaviest new document-grain operators — the
    # chained-window trim and the pigeonhole simhash join
    "text_trim_repeated_ngrams",
    "dedup_simhash",
    # the events-grain interval/window family — where join-state and
    # window-partition growth live; replication shifts user_id, so growth
    # is horizontal (N× users of constant per-user density), the shape a
    # bigger cluster actually sees
    "purchase_attribution",
    "user_sessions",
    "events_last_click_asof",
    "windowed_event_counts",
    "conversion_funnel",
]
LINEAR_BUDGET = 1.3  # tN <= LINEAR_BUDGET * N * t1 counts as "scales linearly"


def _rotate(s: str, r: int) -> str:
    r %= 26
    return s[r:] + s[:r]


def build_scaled_dir(
    spark: SparkSession, src_dir: str, out_dir: str, n_replicas: int
) -> None:
    """Write documents/embeddings replicated ``n_replicas`` times (replica 0
    is the identity transform, so n_replicas=1 re-writes the original
    through the same path — both measurement points read parquet of
    identical layout/compression)."""
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir)
    docs = spark.read.parquet(f"{src_dir}/documents.parquet")
    embs = spark.read.parquet(f"{src_dir}/embeddings.parquet")
    evs = spark.read.parquet(f"{src_dir}/events.parquet")
    doc_parts = []
    emb_parts = []
    ev_parts = []
    for r in range(n_replicas):
        doc_parts.append(
            docs.select(
                (F.col("doc_id") + r * ID_STRIDE).alias("doc_id"),
                F.translate(
                    F.col("text"), LOWER + UPPER, _rotate(LOWER, r) + _rotate(UPPER, r)
                ).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
        rot = r % 64
        emb = F.col("embedding")
        if rot:
            emb = F.concat(
                F.slice("embedding", rot + 1, 64 - rot), F.slice("embedding", 1, rot)
            )
        emb_parts.append(
            embs.select(
                (F.col("vec_id") + r * ID_STRIDE).alias("vec_id"),
                emb.alias("embedding"),
                "label",
            )
        )
        ev_parts.append(
            evs.select(
                (F.col("event_id") + r * ID_STRIDE).alias("event_id"),
                "ts",
                (F.col("user_id") + r * ID_STRIDE).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
        )
    u_docs, u_embs, u_evs = doc_parts[0], emb_parts[0], ev_parts[0]
    for d in doc_parts[1:]:
        u_docs = u_docs.unionByName(d)
    for e in emb_parts[1:]:
        u_embs = u_embs.unionByName(e)
    for e in ev_parts[1:]:
        u_evs = u_evs.unionByName(e)
    u_docs.write.parquet(f"{out_dir}/documents.parquet")
    u_embs.write.parquet(f"{out_dir}/embeddings.parquet")
    u_evs.write.parquet(f"{out_dir}/events.parquet")


def time_query(df: DataFrame) -> tuple[float, int]:
    obs = Observation()
    out = df.observe(obs, F.count(F.lit(1)).alias("n"))
    t0 = time.perf_counter()
    out.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3), int(obs.get["n"])


def run_point(spark: SparkSession, sf_dir: str, scaled_bits: int) -> dict:
    from bigdata_hwk_spark import registry
    from bigdata_hwk_spark.operators import similarity as SIM
    from bigdata_hwk_spark.sources.tables import fan_out

    def frames():
        for name in QUERIES:
            yield name, registry.QUERIES[name](spark, sf_dir)
        embs = fan_out(spark.read.parquet(f"{sf_dir}/embeddings.parquet"))
        yield "ann_lsh_pairs_bits_scaled", SIM.ann_lsh_pairs(embs, bits=scaled_bits)

    for _name, df in frames():  # warm: JIT, page cache, shared shingle index
        df.write.format("noop").mode("overwrite").save()
    result = {}
    for name, df in frames():
        secs, rows = time_query(df)
        result[name] = {"sec": secs, "rows": rows}
        print(f"# {sf_dir} {name}: {secs:.3f}s rows={rows}", file=sys.stderr)
    return result


def main() -> None:
    from bigdata_hwk_spark.operators.similarity import ANN_BITS
    from bigdata_hwk_spark.session import get_spark

    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n = int(os.environ.get("SCALE_STRESS_N", "8"))
    work = os.environ.get("SCALE_STRESS_WORKDIR", "/tmp/scale_stress")
    scaled_bits = ANN_BITS + max(1, math.ceil(math.log2(n)))

    # N× fixtures + persisted signature/shingle caches for two dirs blow
    # past the 1g default local-mode heap; this box has plenty.
    mem = os.environ.get("SCALE_STRESS_MEM", "24g")
    spark = get_spark(
        app_name="bigdata_hwk_spark-scale-stress",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.driver.memory": mem},
    )
    dir1 = os.path.join(work, "x1")
    dirn = os.path.join(work, f"x{n}")
    build_scaled_dir(spark, src, dir1, 1)
    build_scaled_dir(spark, src, dirn, n)

    r1 = run_point(spark, dir1, scaled_bits)
    rn = run_point(spark, dirn, scaled_bits)

    queries = {}
    worst = ("", 0.0)
    for name in r1:
        t1, tn = max(r1[name]["sec"], 1e-3), rn[name]["sec"]
        ratio = round(tn / t1, 2)
        queries[name] = {
            "t1_sec": r1[name]["sec"],
            "tN_sec": tn,
            "ratio": ratio,
            "exponent": round(math.log(max(ratio, 1e-9)) / math.log(n), 3),
            "rows_1": r1[name]["rows"],
            "rows_N": rn[name]["rows"],
            "within_linear_budget": ratio <= LINEAR_BUDGET * n,
        }
        if name != "ann_lsh_pairs" and ratio > worst[1]:
            worst = (name, ratio)
    out = {
        "n_replicas": n,
        "base_sf_dir": src,
        "cpus": cpus,
        "linear_budget": LINEAR_BUDGET,
        "ann_bits_scaled_to": scaled_bits,
        "queries": queries,
        "worst_scaled_query": worst[0],
        "worst_ratio_over_n": round(worst[1] / n, 2),
        "notes": (
            "ann_lsh_pairs at fixture bits is EXPECTED to break the linear "
            "budget: 2^bits buckets are fixed, so per-bucket occupancy grows "
            "with n and the candidate join is quadratic per bucket. The "
            "deployment config scales bits with log2(n) — measured here as "
            "ann_lsh_pairs_bits_scaled, which must stay within budget. "
            "worst_scaled_query therefore excludes the fixed-bits ann entry "
            "and covers every query as it would actually be deployed."
        ),
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALE_STRESS.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    spark.stop()
    print(json.dumps({"worst": worst[0], "worst_ratio_over_n": out["worst_ratio_over_n"],
                      "n": n, "written": path}))


if __name__ == "__main__":
    main()
