"""Reference-parity CLI front doors (HW1/HW2 argv + report format) and the
P7 exact-vs-approx size-guard policy."""

from __future__ import annotations

import io
import re

import duckdb

from bigdata_hwk_spark import cli
from bigdata_hwk_spark.operators import outliers as O
from bigdata_hwk_spark.sources.points_csv import read_points_csv

N15 = "tests/data/points_n15.csv"
UBER = "tests/data/points_uber.csv"


def _duck_exact_outlier_count(path: str, d: float, m: int) -> int:
    return duckdb.sql(
        f"""
        WITH pts AS (SELECT * FROM read_csv('{path}', header=false,
                     columns={{'x':'DOUBLE','y':'DOUBLE'}})),
        cnts AS (SELECT a.x, a.y, count(*) AS c FROM pts a, pts b
                 WHERE (a.x-b.x)*(a.x-b.x)+(a.y-b.y)*(a.y-b.y) <= {d * d!r}
                 GROUP BY a.x, a.y)
        SELECT count(*) FROM cnts WHERE c <= {m}
        """
    ).fetchone()[0]


def test_hw1_cli_report_format_and_values(spark):
    """hw1 on the reference's own TestN15 input (D=1.0, M=3, K=5, L=2):
    report lines match the reference format byte-shape, and the outlier
    count matches an independent DuckDB O(N²) oracle."""
    buf = io.StringIO()
    rc = cli.hw1_main([N15, "1.0", "3", "5", "2"], spark=spark, out=buf)
    assert rc == 0
    lines = buf.getvalue().splitlines()
    assert lines[0] == f"{N15} D=1.0 M=3 K=5 L=2"
    assert lines[1] == "Number of points = 15"
    want_outliers = _duck_exact_outlier_count(N15, 1.0, 3)
    assert lines[2] == f"Number of Outliers = {want_outliers}"
    point_lines = [ln for ln in lines if ln.startswith("Point: ")]
    assert len(point_lines) == min(5, want_outliers)
    assert all(re.fullmatch(r"Point: \([-\d.]+, [-\d.]+\)", ln) for ln in point_lines)
    assert any(re.fullmatch(r"Running time of ExactOutliers = [\d.]+ ms", ln) for ln in lines)
    assert any(ln.startswith("Number of sure outliers= ") for ln in lines)
    assert any(ln.startswith("Number of uncertain points= ") for ln in lines)
    cell_lines = [ln for ln in lines if ln.startswith("Cell: ")]
    assert 1 <= len(cell_lines) <= 5
    assert all(re.fullmatch(r"Cell: \(-?\d+, -?\d+\) Size = \d+", ln) for ln in cell_lines)
    assert re.fullmatch(r"Running time of MRApproxOutliers = [\d.]+ ms", lines[-1])


def test_hw2_cli_report_format(spark):
    """hw2 on the N15 input: per-round MRFFT timing lines + radius +
    MRApprox summary, in the reference's order."""
    buf = io.StringIO()
    rc = cli.hw2_main([N15, "3", "4", "2"], spark=spark, out=buf)
    assert rc == 0
    lines = buf.getvalue().splitlines()
    assert lines[0] == f"{N15} M=3 K=4 L=2"
    assert lines[1] == "Number of points = 15"
    for i, rnd in enumerate(("1", "2", "3")):
        assert re.fullmatch(
            rf"Running time of MRFFT Round {rnd} = [\d.]+ ms", lines[2 + i]
        )
    m = re.fullmatch(r"Radius = ([\d.]+)", lines[5])
    assert m and float(m.group(1)) > 0
    assert lines[6].startswith("Number of sure outliers= ")
    assert lines[7].startswith("Number of uncertain points= ")
    assert re.fullmatch(r"Running time of MRApproxOutliers = [\d.]+ ms", lines[8])


def test_hw1_skips_exact_path_above_cap(spark):
    """P7 in the CLI: above the 200k cap the ExactOutliers section must not
    appear (reference HWK_1/G029HW1.py:155). Exercised by shrinking the cap
    via monkeypatch-free arithmetic — run on uber (10k > tiny cap)."""
    import unittest.mock as mock

    buf = io.StringIO()
    with mock.patch.object(O, "EXACT_PATH_MAX_POINTS", 100):
        rc = cli.hw1_main([UBER, "0.02", "10", "5", "4"], spark=spark, out=buf)
    assert rc == 0
    text = buf.getvalue()
    assert "Number of Outliers =" not in text
    assert "Running time of ExactOutliers" not in text
    assert "Number of sure outliers= " in text


def test_outliers_auto_policy_branches(spark):
    """P7 engine knob: exact iff N ≤ cap, approx summary otherwise."""
    pts = read_points_csv(spark, N15)
    mode_small, df_small = O.outliers_auto(pts, 1.0, 3, cap=200_000)
    assert mode_small == "exact"
    assert "neighbor_cnt" in df_small.columns
    mode_big, df_big = O.outliers_auto(pts, 1.0, 3, cap=10)
    assert mode_big == "approx"
    assert df_big.columns == ["sure_outliers", "uncertain_points"]
    assert df_big.count() == 1


def test_with_point_ids_are_dense_file_order(spark):
    """JVM-side id assignment: dense 0..N-1, matching file order (first
    column strictly equals DuckDB's row_number over the same file)."""
    pts = read_points_csv(spark, UBER)
    got = pts.orderBy("point_id").collect()
    assert [r.point_id for r in got] == list(range(10_000))
    want = duckdb.sql(
        f"""SELECT x, y FROM read_csv('{UBER}', header=false,
            columns={{'x':'DOUBLE','y':'DOUBLE'}})"""
    ).fetchall()
    assert [(r.x, r.y) for r in got] == want


def test_hw3_cli_report_format_and_values(spark):
    """hw3 argv contract (<n> <phi> <epsilon> <delta> <portExp>, reference
    HWK_3/G029HW3.py:70-78) over a local TCP server: report sections in
    the reference's order, exact section matching an independent
    histogram of the fed items."""
    import collections
    import math
    import socket
    import threading

    import random as _random

    items = [_random.Random(11).randrange(40) for _ in range(500)]
    n, phi, eps, delta = 500, 0.05, 0.02, 0.1

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    stop = threading.Event()

    def serve():
        conn, _ = srv.accept()
        with conn:
            conn.sendall("".join(f"{i}\n" for i in items).encode())
            stop.wait(30)

    threading.Thread(target=serve, daemon=True).start()
    buf = io.StringIO()
    try:
        rc = cli.hw3_main(
            [str(n), str(phi), str(eps), str(delta), str(port)],
            spark=spark, out=buf, host="127.0.0.1", timeout_s=30,
        )
    finally:
        stop.set()
        srv.close()
    assert rc == 0
    lines = buf.getvalue().splitlines()
    assert lines[0] == "INPUT PROPERTIES"
    assert lines[1] == f"n = {n} phi = {phi} epsilon = {eps} delta = {delta} port = {port}"
    assert lines[2] == "EXACT ALGORITHM"
    hist = collections.Counter(items)
    want_tf = sorted(i for i, c in hist.items() if c >= phi * n)
    assert lines[3] == f"Number of items in the data structure = {len(hist)}"
    assert lines[4] == f"Number of true frequent items = {len(want_tf)}"
    assert lines[5] == "True frequent items:"
    assert lines[6 : 6 + len(want_tf)] == [str(i) for i in want_tf]
    ri = lines.index("RESERVOIR SAMPLING")
    assert lines[ri + 1] == f"Size m of the sample = {math.ceil(1 / phi)}"
    si = lines.index("STICKY SAMPLING")
    assert si > ri
    # +/- markers agree with the true-frequent set on every estimate line
    for ln in lines[ri + 3 :]:
        m = re.fullmatch(r"(\d+) ([+-])", ln)
        if m:
            assert (int(m.group(1)) in want_tf) == (m.group(2) == "+")


def test_hw3_cli_usage():
    buf = io.StringIO()
    assert cli.hw3_main(["1", "2"], out=buf) == 1
    assert buf.getvalue().startswith("Usage: hw3 ")


def test_curate_pipeline_funnel_and_write(spark, tmp_path):
    """End-to-end curation: counts must be monotone down the funnel, the
    split sum must equal the kept corpus, and the parquet output must be
    hive-partitioned by split and round-trip to the same assignment."""
    from bigdata_hwk_spark.pipeline import curate_corpus

    out = str(tmp_path / "curated")
    split, report = curate_corpus(spark, "/root/testdata/sf0.001", out)
    vals = {l.split(" = ")[0]: int(l.split(" = ")[1]) for l in report}
    assert (
        vals["Docs in corpus"]
        >= vals["After exact dedup"]
        >= vals["After near-dup collapse"]
        >= vals["After quality funnel"]
        > 0
    )
    assert (
        vals["Split train"] + vals["Split valid"] + vals["Split test"]
        == vals["After quality funnel"]
    )
    back = spark.read.parquet(out)
    assert sorted(back.columns) == ["doc_id", "split"]
    got = {(r.doc_id, r.split) for r in back.collect()}
    assert got == {(r.doc_id, r.split) for r in split.collect()}
    import os

    assert {d for d in os.listdir(out) if d.startswith("split=")} == {
        "split=train", "split=valid", "split=test"
    }


def test_analyze_cli_lists_and_validates(spark, capsys):
    """scripts/analyze.py: --list prints every registry query with its
    check kind; an unknown name exits 2 without starting work."""
    import importlib.util
    import os

    from bigdata_hwk_spark import registry

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts",
        "analyze.py",
    )
    spec = importlib.util.spec_from_file_location("analyze_cli", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    assert mod.main(["--list"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == len(registry.QUERIES)
    kinds = dict(line.split("\t") for line in out)
    assert kinds["tpch_q1"] == "oracle"
    assert kinds["mrfft_radius"] == "rows-only"

    assert mod.main(["not_a_query"]) == 2
