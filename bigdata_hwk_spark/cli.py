"""Reference-parity CLI front doors for the HW1/HW2 pipelines.

The reference programs are argv scripts printing a fixed report
(HWK_1/G029HW1.py:125-170, HWK_2/G029HW2.py:133-180); these front-ends
reproduce the argv contract and the output format line-for-line on top of
the DataFrame engine, so a user of the reference can run the same command
shapes against this repo:

    python scripts/hw1.py <path_to_points_csv> <D> <M> <K> <L>
    python scripts/hw2.py <path_to_points_csv> <M> <K> <L>
    python scripts/hw3.py <n> <phi> <epsilon> <delta> <portExp>

Report-format sources: HW1 header/argv HWK_1/G029HW1.py:125-141, point
count :152-153, the N ≤ 200000 exact-path guard :155 (P7 — see
``operators.outliers.EXACT_PATH_MAX_POINTS``), ExactOutliers prints
:42-49,160-166, MRApproxOutliers prints :116-120,167-170. HW2
header/argv HWK_2/G029HW2.py:133-149, per-round MRFFT timing prints
:83-105 (via ``operators.kcenter.mrfft_timed``), radius :169, summary +
timing :127-131,171-180.

HW3 header/argv HWK_3/G029HW3.py:70-78, socket source :103, first-n
cutoff :37-66, report :121-156 (via ``hw3_main`` below).
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import SparkSession

from .operators import kcenter as KC
from .operators import outliers as O
from .sources.points_csv import read_points_csv


def _default_spark() -> SparkSession:
    from .session import get_spark

    return get_spark(app_name="bigdata_hwk_spark-cli")


def _load_points(spark: SparkSession, path: str, l: int):
    """CSV scan → (point_id, x, y), spread over L partitions (the
    reference repartitions to L, HWK_1/G029HW1.py:149-150). Cached: every
    report below makes several passes (count, exact, approx)."""
    pts = read_points_csv(spark, path).repartition(l, "point_id").cache()
    return pts


def hw1_main(argv: list[str], spark: SparkSession | None = None, out=None) -> int:
    """ExactOutliers + MRApproxOutliers report (reference HW1 main)."""
    out = out or sys.stdout
    if len(argv) != 5:
        print("Usage: hw1 <path_to_file> <D> <M> <K> <L>", file=out)
        return 1
    path, d, m, k, l = argv[0], float(argv[1]), int(argv[2]), int(argv[3]), int(argv[4])
    spark = spark or _default_spark()

    print(f"{path} D={d} M={m} K={k} L={l}", file=out)
    pts = _load_points(spark, path, l)
    total = pts.count()
    print("Number of points =", total, file=out)

    # P7 size guard: exact path only for inputs the reference would accept
    # (HWK_1/G029HW1.py:155). Our exact operator is distributed and would
    # scale past the cap, but the report contract is the reference's.
    if total <= O.EXACT_PATH_MAX_POINTS:
        t0 = time.perf_counter()
        outliers = (
            O.exact_outliers(pts, d, m)
            .orderBy("neighbor_cnt", "point_id")
            .collect()
        )
        ms = (time.perf_counter() - t0) * 1000
        print("Number of Outliers =", len(outliers), file=out)
        for r in outliers[:k]:
            print("Point:", f"({r.x}, {r.y})", file=out)
        print("Running time of ExactOutliers =", ms, "ms", file=out)

    t0 = time.perf_counter()
    summary = O.mr_approx_outliers_summary(pts, d, m).collect()[0]
    cells = O.smallest_cells(pts, d, k).collect()
    ms = (time.perf_counter() - t0) * 1000
    print("Number of sure outliers=", summary.sure_outliers, file=out)
    print("Number of uncertain points=", summary.uncertain_points, file=out)
    for c in cells:
        print("Cell:", (c.cx, c.cy), "Size =", c.cell_cnt, file=out)
    print("Running time of MRApproxOutliers =", ms, "ms", file=out)
    pts.unpersist()
    return 0


def hw2_main(argv: list[str], spark: SparkSession | None = None, out=None) -> int:
    """MRFFT (per-round timing) + MRApproxOutliers report (reference HW2
    main). The radius from MRFFT feeds MRApproxOutliers as D
    (HWK_2/G029HW2.py:167-176)."""
    out = out or sys.stdout
    if len(argv) != 4:
        print("Usage: hw2 <path_to_file> <M> <K> <L>", file=out)
        return 1
    path, m, k, l = argv[0], int(argv[1]), int(argv[2]), int(argv[3])
    spark = spark or _default_spark()

    print(f"{path} M={m} K={k} L={l}", file=out)
    pts = _load_points(spark, path, l)
    print("Number of points =", pts.count(), file=out)

    centers, radius, t = KC.mrfft_timed(pts, k, l)
    print("Running time of MRFFT Round 1 =", t["r1_ms"], "ms", file=out)
    print("Running time of MRFFT Round 2 =", t["r2_ms"], "ms", file=out)
    print("Running time of MRFFT Round 3 =", t["r3_ms"], "ms", file=out)
    print("Radius =", radius, file=out)

    t0 = time.perf_counter()
    summary = O.mr_approx_outliers_summary(pts, radius, m).collect()[0]
    ms = (time.perf_counter() - t0) * 1000
    print("Number of sure outliers=", summary.sure_outliers, file=out)
    print("Number of uncertain points=", summary.uncertain_points, file=out)
    print("Running time of MRApproxOutliers =", ms, "ms", file=out)
    pts.unpersist()
    return 0


HW3_DEFAULT_HOST = "algo.dei.unipd.it"  # reference HWK_3/G029HW3.py:103


def hw3_main(
    argv: list[str],
    spark: SparkSession | None = None,
    out=None,
    host: str = HW3_DEFAULT_HOST,
    timeout_s: float = 60.0,
) -> int:
    """Streaming frequent-items report (reference HW3 main).

    argv contract ``<n> <phi> <epsilon> <delta> <portExp>`` (reference
    HWK_3/G029HW3.py:70-78); wires the socket source →
    ``run_sketches_on_stream`` (foreachBatch + first-n cutoff, the
    Structured-Streaming analogue of the reference's foreachRDD driver
    state, :103-114) → the golden-tested report format (:121-156).
    ``host`` is overridable for tests / local replay servers; the
    reference hard-codes its course server.
    """
    from .streaming.frequent_items import run_sketches_on_stream
    from .streaming.sources import socket_item_stream

    out = out or sys.stdout
    if len(argv) != 5:
        print("Usage: hw3 <n> <phi> <epsilon> <delta> <portExp>", file=out)
        return 1
    n, phi, eps, delta = int(argv[0]), float(argv[1]), float(argv[2]), float(argv[3])
    port = int(argv[4])
    spark = spark or _default_spark()

    report = run_sketches_on_stream(
        socket_item_stream(spark, host, port),
        n=n,
        phi=phi,
        eps=eps,
        delta=delta,
        timeout_s=timeout_s,
    )
    for line in report.report_lines(port=port):
        print(line, file=out)
    return 0


if __name__ == "__main__":
    prog, *rest = sys.argv[1:] or ["help"]
    if prog == "hw1":
        raise SystemExit(hw1_main(rest))
    if prog == "hw2":
        raise SystemExit(hw2_main(rest))
    if prog == "hw3":
        raise SystemExit(hw3_main(rest))
    print("Usage: python -m bigdata_hwk_spark.cli {hw1|hw2|hw3} <args...>")
    raise SystemExit(1)
