#!/usr/bin/env python3
"""Reference-parity HW3 entrypoint: streaming frequent items over a socket.

Usage: python scripts/hw3.py <n> <phi> <epsilon> <delta> <portExp>
(argv contract: reference HWK_3/G029HW3.py:70-78; set HW3_HOST to point
the socket source somewhere other than the reference's course server)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdata_hwk_spark.cli import HW3_DEFAULT_HOST, hw3_main  # noqa: E402

if __name__ == "__main__":
    raise SystemExit(
        hw3_main(sys.argv[1:], host=os.environ.get("HW3_HOST", HW3_DEFAULT_HOST))
    )
