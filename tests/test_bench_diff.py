"""bench_diff's methodology banner: tripped by methodology, not by size.

Round-12 shipped a false ``methodology_change`` banner because the
isolation dicts were compared wholesale — including the *derived*
``n_batches`` (15 vs 14), which changes whenever the registry grows.
The banner exists to stop readers from treating cross-methodology
per-query deltas as regressions; firing it on a like-for-like pair is
the exact misreading it guards against, inverted (VERDICT r12 item 3).
These tests pin the fingerprint: only ``mode`` / ``batch_size`` /
``per_query`` participate.
"""

from __future__ import annotations

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "bench_diff",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts",
        "bench_diff.py",
    ),
)
bench_diff = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench_diff)

_R11 = {
    "mode": "fresh-jvm-per-batch",
    "batch_size": 16,
    "n_batches": 14,
    "per_query": "clearCache -> warm-own -> time",
}
_R12 = dict(_R11, n_batches=15)  # registry grew 219 -> 225 queries


def test_n_batches_growth_is_not_a_methodology_change():
    assert bench_diff.methodology_fingerprint(
        _R11
    ) == bench_diff.methodology_fingerprint(_R12)


def test_real_methodology_changes_still_fire():
    for changed in (
        dict(_R12, mode="one-jvm-suite"),
        dict(_R12, batch_size=8),
        dict(_R12, per_query="warm-shared -> time"),
    ):
        assert bench_diff.methodology_fingerprint(
            _R11
        ) != bench_diff.methodology_fingerprint(changed)


def test_missing_isolation_section_reads_as_change():
    # pre-r11 details have no isolation dict at all; None vs a real
    # fingerprint must still register as a methodology change.
    assert bench_diff.methodology_fingerprint(None) != (
        bench_diff.methodology_fingerprint(_R12)
    )
