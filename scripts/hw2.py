#!/usr/bin/env python3
"""Reference-parity HW2 entrypoint: MRFFT (per-round timing) + MRApproxOutliers.

Usage: python scripts/hw2.py <path_to_points_csv> <M> <K> <L>
(argv contract: reference HWK_2/G029HW2.py:133-149)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdata_hwk_spark.cli import hw2_main  # noqa: E402

if __name__ == "__main__":
    raise SystemExit(hw2_main(sys.argv[1:]))
