#!/usr/bin/env python3
"""Benchmark harness: run every registered headline query at the target SF.

Prints ONE compact JSON line (< 1 KB — the driver captures only a short
stdout tail, so the full per-query detail goes to ``BENCH_DETAIL.json``
next to this script instead):
  {"metric": ..., "value": total_sec, "unit": "sec", "sf": sf,
   "n_queries": N, "queries": {top-5 slowest only}, "mrfft_*_ms": ...}

KNOWN SENSITIVITY (measured r12, BENCH_REGRESSION_NOTES_r12
``flag_adjudication``): per-query walls remain sensitive to BATCH
COMPOSITION — which 15 neighbors share the JVM still moves some walls
2-3× in either direction through JIT/codegen state and shared-memo
availability, even though the per-query cache state is equalized.
Cross-round per-query deltas should be read against the variance band
(VARIANCE_BAND artifacts) and adjudicated with single-query fresh-JVM
floors when flagged; suite TOTALS and the canary are stable (r11→r12
median_shift 1.006).

COMPOSITION STABILITY (round-13, VERDICT r12 item 1): full runs assign
queries to batches by md5(name) mod N_BUCKETS FIXED buckets
(name-sorted within bucket), so registry growth changes exactly the new
query's bucket instead of shifting membership for every later batch;
and each query's wall is the MIN of SPARK_GRAFT_SAMPLES (default 2)
timed runs after its warm run, so a single GC pause or co-tenant hiccup
can't move a wall — identical code had measured 352.9 s vs 307.1 s
suite walls from one-sample noise compounding over 225 queries.

ISOLATION (round-10 VERDICT item 1): the one-JVM suite measurably
contaminated its own per-query walls as it grew — the 135 queries shared
between r9 and r10 inflated +22.8 % on untouched code, and regressions
could only be adjudicated via ad-hoc isolated A/Bs. The suite now runs
in BATCHES of ``SPARK_GRAFT_BATCH`` queries (default 16), each batch in
a FRESH subprocess JVM, and inside a batch every query runs as a
(clearCache → warm-own → time) triple: the clear equalizes the starting
cache state regardless of batch membership, the untimed warm run
rebuilds the query's OWN inputs, and the timed run reports the query's
warm steady-state — the same per-query discipline the scale-stress pair
sweep uses, so bench walls and stress/drift floors are finally the same
quantity. (The first isolated cut cleared AFTER each timed query
instead; batch-order reshuffles still swung individual walls 2-4× —
see run_suite.) The canary and MRFFT legs run in their own subprocess
JVMs for the same reason. ``BENCH_DETAIL.json`` records the isolation
parameters so cross-round diffs (scripts/bench_diff.py) can tell
like-for-like from methodology-change rounds.

The final line is printed as the absolute last action of the PARENT
process, which never starts a JVM — no finalizer traceback can land
after it (BENCH_r01–r04 were all unparseable: a post-stop Py4J NPE
clobbered the tail).

Each query is forced end-to-end with the noop sink (full materialization,
no driver collect); the row count comes from an ``Observation`` attached
to the same materialization, so nothing executes twice. Set
SPARK_GRAFT_WARM=0 to skip the per-batch warmup pass (cold walls).
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_BATCH (default 16),
SPARK_GRAFT_ONLY (comma-separated query subset for verify loops — skips
the canary/MRFFT legs and all detail/round-stamped files; emits a
"subset_queries_total_wall" line that can't be mistaken for a round).
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import tempfile
import time

REPO_DIR = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO_DIR)

DEFAULT_BATCH = 16

# the driver's main bench runs at 32 cores; its scaling probe re-runs at a
# lower count. Only the default-cpus run may own the round's per-query
# detail file (see round_detail_path).
DEFAULT_CPUS = "32"


def round_detail_path(repo_dir: str, round_no: int, cpus: str) -> str:
    """Path of the round-stamped per-query detail file for a run at
    ``cpus`` cores.

    Keyed on the core count (r14, VERDICT r13 item 1): the unsuffixed
    ``BENCH_DETAIL_r{N}.json`` is the round's canonical 32-core record;
    a run at any other core count — e.g. the driver's 8-core scaling
    probe, which in r13 clobbered the 32-core AFTER detail — writes a
    ``_c{cpus}``-suffixed sibling instead."""
    if str(cpus) == DEFAULT_CPUS:
        return os.path.join(repo_dir, f"BENCH_DETAIL_r{round_no:02d}.json")
    return os.path.join(
        repo_dir, f"BENCH_DETAIL_r{round_no:02d}_c{cpus}.json"
    )

# fixed bucket count for stable batch assignment (full runs): a query's
# batch is md5(name) mod N_BUCKETS, so registry growth touches exactly
# the new query's bucket instead of shifting membership for every batch
# after the insertion point (VERDICT r12 item 1 — batch membership
# moves walls via JIT/page-cache neighborhood even under the per-query
# clearCache discipline). The count is a FROZEN constant: changing it
# reshuffles every bucket and is a methodology change by definition.
N_BUCKETS = 16


def stable_batches(names: list[str]) -> list[list[str]]:
    """Composition-stable batch assignment: md5(name) mod N_BUCKETS,
    name-sorted within each bucket (insertion order in registry.py must
    not matter), empty buckets dropped. Pure function of the name SET —
    two registries with the same queries get identical batches no
    matter how the source file orders them."""
    import hashlib

    buckets: list[list[str]] = [[] for _ in range(N_BUCKETS)]
    for n in names:
        b = int(hashlib.md5(n.encode()).hexdigest(), 16) % N_BUCKETS
        buckets[b].append(n)
    return [sorted(b) for b in buckets if b]


# ---------------------------------------------------------------------------
# Shared helpers (worker side; also unit-pinned by tests/test_bench_gate.py)
# ---------------------------------------------------------------------------

def run_suite(
    spark, sf_dir: str, label: str, names: list[str] | None = None,
    warm: bool = True, samples: int = 1,
) -> tuple[dict[str, float], dict[str, int]]:
    """Per-query (clearCache → warm-own → time×samples, min) runs.

    The clear makes every query's starting cache state IDENTICAL (empty)
    regardless of which 15 neighbors share its batch JVM — the first cut
    of the isolated bench cleared AFTER each timed query instead, which
    left each batch's FIRST timed query riding the whole warmup pass's
    caches while the rest ran fully cold, and walls still swung 2-4×
    when the registry order reshuffled batch membership (measured on
    dedup_prefix_filter: 5.5 s vs 13 s across orderings). The untimed
    warm run then rebuilds the query's OWN inputs (shared-memo tables,
    JIT, page cache), so the timed wall is the query's warm steady-state
    with nobody else's state — the same per-query discipline the
    scale-stress pair sweep and the drift_ab isolated A/Bs use, and the
    number their floors are quoted in.

    ``samples`` > 1 times the query that many times after the single
    warm run and records the MIN — the estimator drift_ab always used
    for "did the plan get slower": a one-sample wall folds in GC pauses
    and co-tenant hiccups that min-of-2 discards. Identical code
    measured suite walls of 352.9 s and 307.1 s in back-to-back r12
    runs purely from such one-off noise compounding over 225 single
    samples (VERDICT r12 item 1); full rounds therefore run min-of-2
    since r13. Cache state is identical across samples: the SQL cache
    was cleared once before the warm run and every persist_once memo
    the query builds is already warm from it, so sample 2 re-executes
    the same plan against the same state sample 1 saw.
    """
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from bigdata_hwk_spark import registry

    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name in names if names is not None else list(registry.QUERIES):
        fn = registry.QUERIES[name]
        spark.catalog.clearCache()
        if warm:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = float("inf")
        for _ in range(max(1, samples)):
            t0 = time.perf_counter()
            obs = Observation()
            # noop sink: full end-to-end materialization of every output
            # column. (A bare count() would let Catalyst prune the
            # expensive projections — hashes, distances — and
            # under-report the real work.)
            df = fn(spark, sf_dir).observe(
                obs, F.count(F.lit(1)).alias("n")
            )
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            rows[name] = int(obs.get["n"])
        timings[name] = round(best, 3)
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


# ---------------------------------------------------------------------------
# Worker: one fresh JVM per invocation (a query batch, the canary, or MRFFT)
# ---------------------------------------------------------------------------

def _worker(spec_path: str) -> int:
    with open(spec_path, encoding="utf-8") as fh:
        spec = json.load(fh)
    stderr_log = spec["stderr_log"]
    _tee_stderr(stderr_log)

    from bigdata_hwk_spark import registry
    from bigdata_hwk_spark.session import get_spark

    spark = get_spark(
        app_name=f"bigdata_hwk_spark-bench-{spec['label']}",
        master=f"local[{spec['cpus']}]",
        shuffle_partitions=int(spec["cpus"]),
    )
    sf_dir = spec["sf_dir"]
    out: dict = {"label": spec["label"]}

    if spec["mode"] == "queries":
        names = spec["names"]
        # batch warmup PASS first (one untimed run of every batch query):
        # a fresh JVM's first executions pay whole-stage-codegen and JIT
        # compilation that a single per-query warm run does not amortize
        # — measured: without this pass the batch's first queries read
        # 4-7x their floors (mr_approx 12.1s vs 1.8s standalone). The
        # per-query (clearCache → warm-own → time) triples then make the
        # cache state identical for every query regardless of neighbors.
        if spec["warm"]:
            run_suite(
                spark, sf_dir, f"warmup:{spec['label']}", names, warm=False
            )
        timings, rows = run_suite(
            spark, sf_dir, f"timed:{spec['label']}", names,
            warm=spec["warm"], samples=int(spec.get("samples", 1)),
        )
        out["timings"], out["rows"] = timings, rows
    elif spec["mode"] == "canary":
        # min-of-3 warm tpch_q1 (one untimed warm run first): a
        # scan-bound box-health probe bracketing the whole run, so
        # cross-round diffs can tell a real regression from
        # thermal/co-tenant host drift
        fn = registry.QUERIES["tpch_q1"]
        if spec["warm"]:
            # gate the untimed warm save like the query batches do, so
            # SPARK_GRAFT_WARM=0 cold rounds keep the canary and the
            # batch walls on the same methodology (r11 ADVICE)
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        out["canary_sec"] = round(best, 3)
    elif spec["mode"] == "mrfft":
        # per-round MRFFT wall-clock, comparable to BASELINE.md's
        # per-round table (the reference prints R1/R2/R3 ms —
        # HWK_2/G029HW2.py:83-105). fan_out BEFORE caching: the narrow
        # fixture scan would otherwise cache as 1-3 partitions and every
        # round would pay a repartition — R1/R3 should time the rounds'
        # compute, as the reference's cluster runs do.
        from bigdata_hwk_spark.operators import kcenter as KC
        from bigdata_hwk_spark.sources.tables import fan_out

        pts = fan_out(registry._points(spark, sf_dir)).cache()
        pts.count()
        if spec["warm"]:
            # warm pass: this worker's JVM is fresh (isolation), so the
            # first MRFFT run pays JIT/codegen — the reported per-round
            # ms should measure the rounds, as the suite-warmed JVM
            # used to
            KC.mrfft_timed(pts, registry.FFT_K, registry.FFT_L)
        _, _, mr = KC.mrfft_timed(pts, registry.FFT_K, registry.FFT_L)
        pts.unpersist()
        print(f"# mrfft rounds: {mr}", file=sys.stderr)
        out["mrfft"] = mr
    else:  # pragma: no cover - spec is written by main() below
        raise SystemExit(f"unknown worker mode: {spec['mode']}")

    # cache-health gate (round-8 VERDICT item 6): scan the captured
    # stderr BEFORE writing the result, after a deterministic
    # sentinel-based drain of the tee pipe. A failed gate writes the
    # offenders and exits 2 — the parent refuses to emit the metric line.
    if not _drain_tee(stderr_log):
        print(
            "# CACHE-HEALTH GATE: stderr drain sentinel not observed "
            "within timeout — scanning anyway (gate may be incomplete)",
            file=sys.stderr,
        )
    bad = scan_cache_warnings(stderr_log)
    spark.stop()
    if bad:
        out["cache_gate_failed"] = bad[:20]
        with open(spec["out"], "w") as fh:
            json.dump(out, fh)
        return 2
    with open(spec["out"], "w") as fh:
        json.dump(out, fh)
    return 0


# ---------------------------------------------------------------------------
# Parent orchestrator (never starts a JVM)
# ---------------------------------------------------------------------------

def _spawn(spec: dict, tmpdir: str) -> dict:
    """Run one worker subprocess; return its result JSON. Exits the
    parent (without a metric line) if the worker's cache gate fails or
    the worker dies."""
    spec_path = os.path.join(tmpdir, f"spec_{spec['label']}.json")
    spec["out"] = os.path.join(tmpdir, f"out_{spec['label']}.json")
    spec["stderr_log"] = os.path.join(tmpdir, f"stderr_{spec['label']}.log")
    with open(spec_path, "w") as fh:
        json.dump(spec, fh)
    t0 = time.perf_counter()
    # worker stdout → parent stderr: the parent's stdout must carry
    # exactly one JSON line at the very end, nothing else
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--worker", spec_path],
        stdout=sys.stderr,
        cwd=REPO_DIR,
    )
    wall = time.perf_counter() - t0
    result = None
    try:
        with open(spec["out"], encoding="utf-8") as fh:
            result = json.load(fh)
    except (OSError, ValueError):
        pass
    if proc.returncode == 2 and result and result.get("cache_gate_failed"):
        print(
            f"# CACHE-HEALTH GATE FAILED in {spec['label']}: refusing to "
            "emit the metric line. First offenders:",
            file=sys.stderr,
        )
        for ln in result["cache_gate_failed"][:10]:
            print(f"#   {ln}", file=sys.stderr)
        raise SystemExit(2)
    if proc.returncode != 0 or result is None:
        print(
            f"# worker {spec['label']} failed (rc={proc.returncode}) — "
            "refusing to emit the metric line",
            file=sys.stderr,
        )
        raise SystemExit(proc.returncode or 1)
    print(
        f"# [{spec['label']}] worker wall {wall:.1f}s", file=sys.stderr
    )
    return result


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    warm = os.environ.get("SPARK_GRAFT_WARM", "1") != "0"
    batch_size = int(os.environ.get("SPARK_GRAFT_BATCH", str(DEFAULT_BATCH)))
    m = re.search(r"sf(\d+(?:\.\d+)?)", sf_dir)
    sf = float(m.group(1)) if m else None

    # registry import only enumerates query names — no JVM in the parent
    from bigdata_hwk_spark import registry

    names = list(registry.QUERIES)
    # SPARK_GRAFT_ONLY: comma-separated subset for fast verify loops.
    # A subset run skips the canary/MRFFT legs and tags the detail JSON
    # so it can never be mistaken for (or diffed against) a full round.
    only = os.environ.get("SPARK_GRAFT_ONLY")
    if only:
        wanted = [n.strip() for n in only.split(",") if n.strip()]
        unknown = [n for n in wanted if n not in registry.QUERIES]
        if unknown:
            raise SystemExit(f"SPARK_GRAFT_ONLY unknown queries: {unknown}")
        names = wanted
    samples = int(os.environ.get("SPARK_GRAFT_SAMPLES", "2"))
    if only:
        # subset verify runs keep the caller's order and plain chunking
        # — composition stability is a full-round property
        batches = [
            names[i : i + batch_size]
            for i in range(0, len(names), batch_size)
        ]
    else:
        batches = stable_batches(names)

    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    with tempfile.TemporaryDirectory(prefix="bench_iso_") as tmpdir:
        base = {
            "sf_dir": sf_dir, "cpus": cpus, "warm": warm,
            "samples": samples,
        }
        canary_start = canary_end = None
        if not only:
            canary_start = _spawn(
                dict(base, mode="canary", label="canary-start"), tmpdir
            )["canary_sec"]
        for i, chunk in enumerate(batches):
            res = _spawn(
                dict(
                    base,
                    mode="queries",
                    names=chunk,
                    label=f"batch{i:02d}",
                ),
                tmpdir,
            )
            timings.update(res["timings"])
            rows.update(res["rows"])
        if only:
            # subset verify run: no canary/MRFFT legs, no detail files,
            # no round stamping — one honest JSON line and out
            print(
                json.dumps(
                    {
                        "metric": "subset_queries_total_wall",
                        "value": round(sum(timings.values()), 3),
                        "unit": "sec",
                        "sf": sf,
                        "n_queries": len(timings),
                        "queries": timings,
                        "rows": rows,
                        "subset": True,
                    }
                ),
                flush=True,
            )
            return
        mr = _spawn(dict(base, mode="mrfft", label="mrfft"), tmpdir)["mrfft"]
        canary_end = _spawn(
            dict(base, mode="canary", label="canary-end"), tmpdir
        )["canary_sec"]

    total = round(sum(timings.values()), 3)
    top5 = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:5])
    detail = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "rows": rows,
        "sf": sf,
        "cpus": int(cpus),
        "mrfft_r1_ms": mr["r1_ms"],
        "mrfft_r2_ms": mr["r2_ms"],
        "mrfft_r3_ms": mr["r3_ms"],
        "isolation": {
            "mode": "fresh-jvm-per-batch",
            "batch_size": f"md5-bucket-{N_BUCKETS}",
            "assignment": (
                f"md5(name) mod {N_BUCKETS} fixed buckets, name-sorted "
                "within bucket — registry growth touches one bucket"
            ),
            "n_batches": len(batches),
            "per_query": (
                f"clearCache -> warm-own -> min-of-{max(1, samples)}"
            ),
            "timed_samples": max(1, samples),
        },
        "canary": {
            "query": "tpch_q1",
            "runs": 3,
            "start_sec": canary_start,
            "end_sec": canary_end,
            "drift_ratio": round(canary_end / max(canary_start, 1e-3), 2),
        },
    }
    detail_path = os.path.join(REPO_DIR, "BENCH_DETAIL.json")
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)
    # round-keyed copy for the repo history (BENCH_DETAIL.json is
    # gitignored, so per-query tables were lost each round — VERDICT r6
    # item 5). Round source: the committed ROUND file (same versioned
    # source the registry's gate rotation uses); fallback to inferring
    # from the driver's BENCH_r{N}.json artifacts.
    try:
        with open(os.path.join(REPO_DIR, "ROUND"), encoding="utf-8") as fh:
            round_no = int(fh.read().strip())
    except (OSError, ValueError):
        rounds = [
            int(mm.group(1))
            for f_ in os.listdir(REPO_DIR)
            if (mm := re.match(r"BENCH_r(\d+)\.json$", f_))
        ]
        round_no = (max(rounds) + 1) if rounds else 1
    # Only round-stamp runs at the driver's SF (0.1): a local smoke at
    # another SF must not clobber the committed per-round history (it
    # did, twice, in round 9 — each needed a git checkout to repair).
    # The file is additionally keyed on the core count so the driver's
    # low-cpu scaling probe cannot clobber the 32-core record
    # (round_detail_path; VERDICT r13 item 1).
    round_detail = round_detail_path(REPO_DIR, round_no, cpus)
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
    print(line, flush=True)


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--worker":
        raise SystemExit(_worker(sys.argv[2]))
    main()
