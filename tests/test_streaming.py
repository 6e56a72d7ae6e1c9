"""Slice 4 correctness: streaming frequent items (exact oracle + sketch
properties + Structured Streaming ≡ batch replay)."""

from __future__ import annotations

import random

import pytest

from bigdata_hwk_spark import registry
from bigdata_hwk_spark.sources.tables import stream_from_events
from bigdata_hwk_spark.streaming import frequent_items as FI

from .conftest import SF_CORRECT, SF_SMOKE, assert_matches_oracle


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_CORRECT])
def test_true_frequent_matches_oracle(spark, sf_dir):
    assert_matches_oracle(
        registry.QUERIES["stream_true_frequent"](spark, sf_dir),
        registry.ORACLES["stream_true_frequent"],
        sf_dir,
    )


def test_replay_deterministic_and_exact_section(spark):
    stream = stream_from_events(spark, SF_SMOKE)
    r1 = FI.replay_frequent_items(stream, n=500, phi=0.02, eps=0.01, delta=0.1)
    r2 = FI.replay_frequent_items(stream, n=500, phi=0.02, eps=0.01, delta=0.1)
    assert r1 == r2  # same seed → identical report
    # exact section agrees with the declarative query
    declarative = {
        r.item: r.cnt
        for r in FI.true_frequent_items(stream, 500, 0.02).collect()
    }
    assert set(r1.true_frequent) == set(declarative)
    assert sum(r1.histogram.values()) == 500


def test_reservoir_full_coverage_when_m_ge_n():
    res = FI.ReservoirSample(m=100, seed=1)
    res.add_batch(range(50))
    assert res.sample == list(range(50))


def test_reservoir_uniformity():
    """Inclusion probability of each item ≈ m/n over many seeded runs."""
    n, m, runs = 100, 10, 300
    hits = [0] * n
    for s in range(runs):
        res = FI.ReservoirSample(m=m, seed=s)
        res.add_batch(range(n))
        for it in set(res.sample):
            hits[it] += 1
    expected = runs * m / n  # 30
    assert all(10 <= h <= 60 for h in hits), hits


def test_sticky_recall_and_undercount(spark):
    """ε/δ guarantee: every true frequent item is reported w.h.p. (fixed
    seed → deterministic); sticky counts never exceed true counts."""
    stream = stream_from_events(spark, SF_SMOKE)
    rep = FI.replay_frequent_items(
        stream, n=1000, phi=0.05, eps=0.02, delta=0.1, seed=7
    )
    assert set(rep.true_frequent) <= set(rep.sticky_estimate)
    # estimates only undercount (admission delay), never overcount
    sticky = FI.StickySampling(n=1000, phi=0.05, eps=0.02, delta=0.1, seed=7)
    items = [r.item for r in stream.orderBy("seq").limit(1000).collect()]
    sticky.add_batch(items)
    exact = {}
    for it in items:
        exact[it] = exact.get(it, 0) + 1
    assert all(c <= exact[k] for k, c in sticky.counts.items())


def test_first_n_cutoff(spark):
    stream = stream_from_events(spark, SF_SMOKE)
    rep = FI.replay_frequent_items(stream, n=550, phi=0.02, eps=0.01, delta=0.1)
    assert sum(rep.histogram.values()) == 550


def test_structured_stream_equals_batch_replay(spark, tmp_path):
    """The foreachBatch Structured Streaming driver must produce the exact
    same report as the batch-replay harness when micro-batch boundaries
    coincide (one file per 100-row chunk, maxFilesPerTrigger=1)."""
    stream = stream_from_events(spark, SF_SMOKE)
    rows = stream.orderBy("seq").limit(1000).collect()
    src = tmp_path / "stream_src"
    src.mkdir()
    for i in range(0, 1000, 100):
        chunk = spark.createDataFrame(
            [(r.seq, r.item) for r in rows[i : i + 100]], "seq bigint, item bigint"
        )
        chunk.coalesce(1).write.mode("overwrite").parquet(str(src / f"chunk_{i:05d}"))
    # flatten: move part files up so the file source sees one file per chunk
    import shutil

    flat = tmp_path / "flat"
    flat.mkdir()
    import os
    import time

    base = time.time() - 3600
    for i, d in enumerate(sorted(src.iterdir())):
        part = next(p for p in d.iterdir() if p.name.endswith(".parquet"))
        dst = flat / f"{d.name}.parquet"
        shutil.copy(part, dst)
        # the file source orders micro-batches by mtime — pin it so batch
        # order is the chunk order
        os.utime(dst, (base + i, base + i))

    got = FI.run_structured_stream(
        spark, str(flat), n=950, phi=0.02, eps=0.01, delta=0.1, seed=9
    )
    want = FI.replay_frequent_items(
        stream, n=950, phi=0.02, eps=0.01, delta=0.1, batch_size=100, seed=9
    )
    assert got == want


def test_report_lines_shape(spark):
    rep = FI.replay_frequent_items(
        stream_from_events(spark, SF_SMOKE), n=300, phi=0.05, eps=0.02, delta=0.1
    )
    lines = rep.report_lines()
    assert any(line.startswith("Number of items in the data structure") for line in lines)
    assert "EXACT ALGORITHM" in lines and "STICKY SAMPLING" in lines
