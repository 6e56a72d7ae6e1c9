#!/usr/bin/env python3
"""Benchmark harness: run every registered headline query at the target SF.

Prints ONE compact JSON line (< 1 KB — the driver captures only a short
stdout tail, so the full per-query detail goes to ``BENCH_DETAIL.json``
next to this script instead):
  {"metric": ..., "value": total_sec, "unit": "sec", "sf": sf,
   "n_queries": N, "queries": {top-5 slowest only}, "mrfft_*_ms": ...}

The line is printed as the absolute last action, after ``spark.stop()``
and a forced ``gc.collect()``, so no finalizer traceback can land after
it (BENCH_r01–r04 were all unparseable: the 3 KB line overflowed the tail
capture and a post-stop Py4J NPE clobbered what remained).

Each query is forced end-to-end with the noop sink (full materialization,
no driver collect); the row count comes from an ``Observation`` attached to
the same materialization, so nothing executes twice. By default the whole
suite runs once untimed to warm JIT/page-cache/Python workers and the
SECOND pass is reported (run-to-run variance on the ANN queries was
measured at up to 3× cold vs warm); set SPARK_GRAFT_WARM=0 for a
single-pass cold run. Env: SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1), SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import Observation  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from bigdata_hwk_spark import registry  # noqa: E402
from bigdata_hwk_spark.session import get_spark  # noqa: E402


def run_suite(spark, sf_dir: str, label: str) -> tuple[dict[str, float], dict[str, int]]:
    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name, fn in registry.QUERIES.items():
        t0 = time.perf_counter()
        obs = Observation()
        # noop sink: full end-to-end materialization of every output column.
        # (A bare count() would let Catalyst prune the expensive projections
        # — hashes, distances — and under-report the real work.)
        df = fn(spark, sf_dir).observe(obs, F.count(F.lit(1)).alias("n"))
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
        rows[name] = int(obs.get["n"])
        print(
            f"# [{label}] {name}: {timings[name]:.3f}s rows={rows[name]}",
            file=sys.stderr,
        )
    return timings, rows


def _tee_stderr(log_path: str):
    """Mirror fd 2 through ``tee`` into ``log_path`` so the JVM's log4j
    lines (which bypass Python's sys.stderr entirely) are captured for
    the post-run cache-health scan while still streaming to the console.
    Must run BEFORE the JVM launches (it inherits fd 2)."""
    import subprocess

    proc = subprocess.Popen(
        ["tee", log_path], stdin=subprocess.PIPE, stdout=sys.stderr.fileno()
    )
    os.dup2(proc.stdin.fileno(), 2)
    return proc


def _drain_tee(log_path: str, timeout: float = 10.0) -> bool:
    """Deterministically sync the tee'd stderr log before scanning it.

    A flush+sleep is a race: log4j lines sitting in the tee pipe may not
    have reached the file yet, letting a WARN slip past the gate. A pipe
    is FIFO and tee writes in order, so writing a sentinel to fd 2 and
    polling the file for it guarantees every byte written BEFORE the
    sentinel (all JVM log lines included — log4j's console appender
    flushes per event) is on disk once the sentinel appears. EOF-based
    draining (close + tee exit) is NOT available here: the JVM inherited
    the pipe's write end at launch and holds it until process exit.
    Returns True when the sentinel was observed, False on timeout."""
    token = f"# bench-stderr-drain {os.getpid()} {time.time_ns()}"
    sys.stderr.flush()
    os.write(2, (token + "\n").encode())
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        try:
            with open(log_path, errors="replace") as fh:
                if token in fh.read():
                    return True
        except OSError:
            pass
        time.sleep(0.05)
    return False


def scan_cache_warnings(log_path: str) -> list[str]:
    """Cache-health scan over a captured stderr log: the WARN lines that
    indicate a persist regression (double-persist → CacheManager,
    eviction churn → MemoryStore). Benign startup warnings
    (NativeCodeLoader, incubator modules) don't match."""
    try:
        with open(log_path, errors="replace") as fh:
            return [
                ln.rstrip()
                for ln in fh
                if "WARN CacheManager" in ln or "WARN MemoryStore" in ln
            ]
    except OSError:
        return []


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    warm = os.environ.get("SPARK_GRAFT_WARM", "1") != "0"
    # Cache-health gate (round-8 VERDICT item 6): a persist regression
    # (double-persist, eviction churn) surfaces as `WARN CacheManager` /
    # `WARN MemoryStore` lines in the JVM's stderr. Capture stderr for
    # the whole run and REFUSE to emit the metric line if any appear, so
    # a future regression is caught by the missing artifact — loudly —
    # instead of by a judge reading the tail.
    stderr_log = os.path.join("/tmp", f"bench_stderr_{os.getpid()}.log")
    _tee_stderr(stderr_log)
    m = re.search(r"sf(\d+(?:\.\d+)?)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark(
        app_name="bigdata_hwk_spark-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )

    def canary() -> float:
        # min-of-3 warm tpch_q1: a scan-bound box-health probe bracketing
        # the timed pass, so cross-round diffs (scripts/bench_diff.py) can
        # tell a real regression from thermal/co-tenant host drift — the
        # same discipline the scale-stress sweeps use.
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            registry.QUERIES["tpch_q1"](spark, sf_dir).write.format(
                "noop"
            ).mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    if warm:
        run_suite(spark, sf_dir, "warmup")
    canary_start = canary()
    timings, rows = run_suite(spark, sf_dir, "timed")
    canary_end = canary()

    # per-round MRFFT wall-clock, comparable to BASELINE.md's per-round
    # table (the reference prints R1/R2/R3 ms — HWK_2/G029HW2.py:83-105)
    from bigdata_hwk_spark.operators import kcenter as KC  # noqa: E402

    from bigdata_hwk_spark.sources.tables import fan_out  # noqa: E402

    # fan_out BEFORE caching: the narrow fixture scan would otherwise cache
    # as 1-3 partitions and every round would pay a repartition — R1/R3
    # should time the rounds' compute, as the reference's cluster runs do
    pts = fan_out(registry._points(spark, sf_dir)).cache()
    pts.count()  # materialize the cache so R1/R3 time the rounds, not the scan
    _, _, mr = KC.mrfft_timed(pts, registry.FFT_K, registry.FFT_L)
    pts.unpersist()
    print(f"# mrfft rounds: {mr}", file=sys.stderr)

    # cache-health gate: scan the captured stderr BEFORE writing any
    # artifact, after a deterministic sentinel-based drain of the tee
    # pipe (a WARN that slipped past the scan would defeat the gate).
    if not _drain_tee(stderr_log):
        print(
            "# CACHE-HEALTH GATE: stderr drain sentinel not observed "
            "within timeout — scanning anyway (gate may be incomplete)",
            file=sys.stderr,
        )
    bad = scan_cache_warnings(stderr_log)
    if bad:
        print(
            f"# CACHE-HEALTH GATE FAILED: {len(bad)} cache warnings — "
            "refusing to emit the metric line. First offenders:",
            file=sys.stderr,
        )
        for ln in bad[:10]:
            print(f"#   {ln}", file=sys.stderr)
        spark.stop()
        raise SystemExit(2)

    total = round(sum(timings.values()), 3)
    top5 = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:5])
    detail = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "rows": rows,
        "sf": sf,
        "mrfft_r1_ms": mr["r1_ms"],
        "mrfft_r2_ms": mr["r2_ms"],
        "mrfft_r3_ms": mr["r3_ms"],
        "canary": {
            "query": "tpch_q1",
            "runs": 3,
            "start_sec": canary_start,
            "end_sec": canary_end,
            "drift_ratio": round(canary_end / max(canary_start, 1e-3), 2),
        },
    }
    repo_dir = os.path.dirname(os.path.abspath(__file__))
    detail_path = os.path.join(repo_dir, "BENCH_DETAIL.json")
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)
    # round-keyed copy for the repo history (BENCH_DETAIL.json is
    # gitignored, so per-query tables were lost each round — VERDICT r6
    # item 5). Round source: the committed ROUND file (same versioned
    # source the registry's gate rotation uses); fallback to inferring
    # from the driver's BENCH_r{N}.json artifacts.
    try:
        with open(os.path.join(repo_dir, "ROUND"), encoding="utf-8") as fh:
            round_no = int(fh.read().strip())
    except (OSError, ValueError):
        rounds = [
            int(m.group(1))
            for f_ in os.listdir(repo_dir)
            if (m := re.match(r"BENCH_r(\d+)\.json$", f_))
        ]
        round_no = (max(rounds) + 1) if rounds else 1
    # Only round-stamp runs at the driver's SF (0.1): a local smoke at
    # another SF must not clobber the committed per-round history (it
    # did, twice, in round 9 — each needed a git checkout to repair).
    round_detail = os.path.join(repo_dir, f"BENCH_DETAIL_r{round_no:02d}.json")
    if sf == 0.1 or not os.path.exists(round_detail):
        with open(round_detail, "w") as f:
            json.dump(detail, f, indent=1, sort_keys=True)
    line = json.dumps(
        {
            "metric": "headline_queries_total_wall",
            "value": total,
            "unit": "sec",
            "sf": sf,
            "n_queries": len(timings),
            "queries": top5,
            "mrfft_r1_ms": mr["r1_ms"],
            "mrfft_r2_ms": mr["r2_ms"],
            "mrfft_r3_ms": mr["r3_ms"],
            "canary_drift": round(canary_end / max(canary_start, 1e-3), 2),
        }
    )

    # Flush any pending broadcast/persist finalizers while their guard can
    # still see the stopped context, THEN emit the one parseable line. The
    # print must run even if stop() raises (a dead JVM after a long run
    # would otherwise cost the round's only parseable metric line).
    try:
        spark.stop()
        import gc

        gc.collect()
        sys.stderr.flush()
    except Exception as exc:  # pragma: no cover - JVM teardown failure
        print(f"# teardown failed: {exc!r}", file=sys.stderr)
    print(line, flush=True)


if __name__ == "__main__":
    main()
