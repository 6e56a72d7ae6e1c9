#!/usr/bin/env python3
"""Reference-parity HW1 entrypoint: ExactOutliers + MRApproxOutliers.

Usage: python scripts/hw1.py <path_to_points_csv> <D> <M> <K> <L>
(argv contract: reference HWK_1/G029HW1.py:125-141)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdata_hwk_spark.cli import hw1_main  # noqa: E402

if __name__ == "__main__":
    raise SystemExit(hw1_main(sys.argv[1:]))
