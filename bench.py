#!/usr/bin/env python3
"""Benchmark harness: run every registered headline query at the target SF.

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec", "queries": {name: sec},
   "sf": sf, "rows": {name: row_count}}

Each query is forced end-to-end with the noop sink (full materialization,
no driver collect). Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bigdata_hwk_spark import registry  # noqa: E402
from bigdata_hwk_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark(
        app_name="bigdata_hwk_spark-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )

    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name, fn in registry.QUERIES.items():
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        # noop sink: full end-to-end materialization of every output column.
        # (A bare count() would let Catalyst prune the expensive projections
        # — hashes, distances — and under-report the real work.)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
        rows[name] = df.count()
        print(f"# {name}: {timings[name]:.3f}s rows={rows[name]}", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "rows": rows,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
