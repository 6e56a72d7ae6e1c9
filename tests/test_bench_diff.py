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


def test_per_query_bands_pad_and_floor(tmp_path):
    import json

    doc = {
        "queries": {
            "noisy_heavy": {"abs_spread_sec": 0.8, "rel_spread": 0.30},
            "tight_cheap": {"abs_spread_sec": 0.02, "rel_spread": 0.01},
        }
    }
    (tmp_path / "VARIANCE_BAND_r13.json").write_text(json.dumps(doc))
    bands = bench_diff.per_query_bands(str(tmp_path))
    # spread x1.25 where above the floor...
    assert bands["noisy_heavy"]["abs_sec"] == 1.0
    assert bands["noisy_heavy"]["rel"] == 0.375
    # ...floored where a lucky tight sample would hair-trigger
    assert bands["tight_cheap"]["abs_sec"] == bench_diff.PQ_BAND_MIN_ABS
    assert bands["tight_cheap"]["rel"] == bench_diff.PQ_BAND_MIN_REL


def test_per_query_bands_newest_file_wins(tmp_path):
    import json

    for rnd, spread in ((12, 0.8), (13, 0.4)):
        (tmp_path / f"VARIANCE_BAND_r{rnd}.json").write_text(
            json.dumps(
                {"queries": {"q": {"abs_spread_sec": spread, "rel_spread": 0.2}}}
            )
        )
    bands = bench_diff.per_query_bands(str(tmp_path))
    assert bands["q"]["source"] == "VARIANCE_BAND_r13.json"
    assert bands["q"]["abs_sec"] == 0.5


def test_per_query_bands_empty_without_artifact(tmp_path):
    assert bench_diff.per_query_bands(str(tmp_path)) == {}


def test_missing_isolation_section_reads_as_change():
    # pre-r11 details have no isolation dict at all; None vs a real
    # fingerprint must still register as a methodology change.
    assert bench_diff.methodology_fingerprint(None) != (
        bench_diff.methodology_fingerprint(_R12)
    )
