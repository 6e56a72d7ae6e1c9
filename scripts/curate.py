#!/usr/bin/env python3
"""End-to-end corpus curation: scrub -> dedup -> funnel -> split -> write.

Usage: python scripts/curate.py <sf_dir> [out_dir]
Prints the per-stage funnel report; writes split-partitioned parquet when
out_dir is given.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdata_hwk_spark.pipeline import curate_corpus  # noqa: E402
from bigdata_hwk_spark.session import get_spark  # noqa: E402


def main(argv: list[str]) -> int:
    if not 1 <= len(argv) <= 2:
        print(__doc__.strip(), file=sys.stderr)
        return 2
    sf_dir = argv[0]
    out_dir = argv[1] if len(argv) == 2 else None
    spark = get_spark(app_name="bigdata_hwk_spark-curate")
    _, report = curate_corpus(spark, sf_dir, out_dir)
    for line in report:
        print(line)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
