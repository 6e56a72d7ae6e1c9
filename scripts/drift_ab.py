#!/usr/bin/env python3
"""Isolated A/B timings for queries the round-9 bench diff flagged.

The cross-round diff (scripts/bench_diff.py over BENCH_DETAIL_r08/r09)
flagged, after drift normalization, one regression (tfidf_doc_similarity
2.03 -> 2.68s) and kept dedup_incremental_ingest on the watchlist (2.59s
vs its 2.20s pre-regression level). Both flags come from ONE timed pass
inside a 99-query suite, where neighbors' cache pressure and JIT state
leak into individual walls. This script re-times each flagged query in
ISOLATION — clearCache, warm once, then min/median of 3 — which is the
right estimator for "did the query's own plan get slower" (min discards
GC/compilation one-offs; the suite's single sample cannot).

Also stage-times lineitem_month_checksums (4.03s, the most expensive
r9 query): table_checksum on the same scan is the floor, a variant
grouping by an integer yyyymm key isolates the date_format() cost, and
the full query adds the per-partition fold — so the wall splits into
scan+hash / month-derivation / grouped-fold parts.

Merges an "isolated_ab" section into BENCH_REGRESSION_NOTES_r{N}.json
(round from the committed ROUND file). Env: SPARK_GRAFT_SF_DIR,
SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Observation  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _noop(df) -> float:
    t0 = time.perf_counter()
    obs = Observation()
    df.observe(obs, F.count(F.lit(1)).alias("n")).write.format("noop").mode(
        "overwrite"
    ).save()
    return round(time.perf_counter() - t0, 3)


def isolated(spark, build, runs: int = 3) -> dict:
    spark.catalog.clearCache()
    _noop(build())  # warm: JIT, page cache, persisted intermediates
    samples = [_noop(build()) for _ in range(runs)]
    return {
        "warm_samples_sec": samples,
        "min_sec": min(samples),
        "median_sec": round(statistics.median(samples), 3),
    }


def main() -> None:
    from bigdata_hwk_spark import registry
    from bigdata_hwk_spark.operators import reconcile as RC
    from bigdata_hwk_spark.session import get_spark
    from bigdata_hwk_spark.sources.tables import fan_out, load_table

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="bigdata_hwk_spark-drift-ab",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )

    names = sys.argv[1:] or ["tfidf_doc_similarity", "dedup_incremental_ingest"]
    unknown = sorted(set(names) - set(registry.QUERIES))
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    out: dict = {
        "sf_dir": sf_dir,
        "runs": 3,
        "note": (
            "isolated warm min/median vs the suite's single-sample wall: "
            "a query whose isolated floor sits at or below its previous "
            "suite wall has NOT regressed — the suite number moved with "
            "neighbors' cache pressure, not its own plan"
        ),
        "queries": {},
    }
    for name in names:
        out["queries"][name] = isolated(
            spark, lambda n=name: registry.QUERIES[n](spark, sf_dir)
        )
        print(f"# {name}: {out['queries'][name]}", file=sys.stderr)

    li = lambda: fan_out(  # noqa: E731  — registry _li's exact shape
        load_table(spark, sf_dir, "lineitem")
    )
    month_str = F.date_format("l_shipdate", "yyyy-MM")
    month_int = (F.year("l_shipdate") * 100 + F.month("l_shipdate")).cast(
        "int"
    )
    stages = {
        "floor_table_checksum": lambda: RC.table_checksum(
            li(), RC.LINEITEM_CANON
        ),
        "int_month_key": lambda: RC.partition_checksums(
            li(), RC.LINEITEM_CANON, month_int, "ship_month"
        ),
        "full_date_format": lambda: RC.partition_checksums(
            li(), RC.LINEITEM_CANON, month_str, "ship_month"
        ),
    }
    if not sys.argv[1:]:  # stage decomposition only on the default run
        decomp = {k: isolated(spark, b) for k, b in stages.items()}
        out["lineitem_month_checksums_stages"] = decomp
        print(f"# month_checksums stages: {decomp}", file=sys.stderr)

    with open(os.path.join(REPO, "ROUND"), encoding="utf-8") as fh:
        round_no = int(fh.read().strip())
    notes_path = os.path.join(
        REPO, f"BENCH_REGRESSION_NOTES_r{round_no:02d}.json"
    )
    notes = {}
    if os.path.exists(notes_path):
        with open(notes_path) as fh:
            notes = json.load(fh)
    # merge: argv-subset runs add/refresh entries without clobbering the
    # rest of the section (conclusions, stage decompositions)
    prev_ab = notes.get("isolated_ab", {})
    prev_ab.setdefault("queries", {}).update(out.pop("queries"))
    prev_ab.update(out)
    notes["isolated_ab"] = prev_ab
    with open(notes_path, "w") as fh:
        json.dump(notes, fh, indent=1, sort_keys=True)
    spark.stop()
    print(json.dumps({"written": notes_path, "isolated_ab": prev_ab}))


if __name__ == "__main__":
    main()
