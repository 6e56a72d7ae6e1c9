"""The bench cache-health gate's scan: what trips it and what doesn't.

bench.py refuses to emit its metric line when the captured stderr shows
cache-regression warnings (round-8 VERDICT item 6). The refusal path
needs a live regression to exercise end-to-end, so the decision function
is pinned here on synthetic logs instead: the two real warning shapes
trip it, the benign startup warnings every run produces don't, and a
missing log (capture failed) degrades to "no evidence" rather than a
crash before the metric line.
"""

from __future__ import annotations

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "bench",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py"),
)
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)


def _scan(tmp_path, text: str):
    p = tmp_path / "stderr.log"
    p.write_text(text)
    return bench.scan_cache_warnings(str(p))


def test_trips_on_cachemanager_and_memorystore(tmp_path):
    log = (
        "25/08/14 10:00:01 WARN CacheManager: Asked to cache already "
        "cached data.\n"
        "# [timed] tpch_q1: 0.2s rows=6\n"
        "25/08/14 10:00:05 WARN MemoryStore: Not enough space to cache "
        "rdd_42_7 in memory!\n"
    )
    bad = _scan(tmp_path, log)
    assert len(bad) == 2
    assert any("CacheManager" in ln for ln in bad)
    assert any("MemoryStore" in ln for ln in bad)


def test_benign_startup_warnings_pass(tmp_path):
    log = (
        "WARNING: Using incubator modules: jdk.incubator.vector\n"
        "25/08/14 10:00:00 WARN NativeCodeLoader: Unable to load "
        "native-hadoop library for your platform...\n"
        "25/08/14 10:00:02 WARN SparkStringUtils: Truncated the string "
        "representation of a plan since it was too large.\n"
        "# [timed] exact_outliers: 0.4s rows=48\n"
    )
    assert _scan(tmp_path, log) == []


def test_missing_log_is_no_evidence(tmp_path):
    assert bench.scan_cache_warnings(str(tmp_path / "absent.log")) == []


# ---------------------------------------------------------------------------
# Composition-stable batch assignment (r13, VERDICT r12 item 1)


def test_stable_batches_partition_and_order_independence():
    names = [f"query_{i}" for i in range(225)]
    a = bench.stable_batches(names)
    b = bench.stable_batches(list(reversed(names)))
    # registry insertion order must not matter — batches are a pure
    # function of the name SET
    assert a == b
    flat = sorted(n for batch in a for n in batch)
    assert flat == sorted(names)
    assert len(a) <= bench.N_BUCKETS


# ---------------------------------------------------------------------------
# Round-detail file is keyed on the core count (r14, VERDICT r13 item 1):
# the driver's 8-core scaling probe clobbered r13's 32-core per-query
# record because any sf0.1 run wrote the same BENCH_DETAIL_r{N}.json.


def test_round_detail_path_keyed_on_cpus():
    base = bench.round_detail_path("/repo", 14, "32")
    assert base.endswith("BENCH_DETAIL_r14.json")
    probe = bench.round_detail_path("/repo", 14, "8")
    assert probe.endswith("BENCH_DETAIL_r14_c8.json")
    # the scaling probe can never resolve to the canonical record
    assert probe != base
    # int-vs-str cpus spelling must not fork the path
    assert bench.round_detail_path("/repo", 14, 32) == base


def test_stable_batches_growth_touches_one_bucket():
    names = [f"query_{i}" for i in range(225)]
    before = bench.stable_batches(names)
    after = bench.stable_batches(names + ["brand_new_query"])
    changed = sum(1 for x, y in zip(before, after) if x != y)
    assert changed == 1
    assert len(before) == len(after)
