"""HW3 golden-scale replay: the reference's acceptance artifact regime.

The reference's acceptance output (HWK_3/output_examples/
Output1M_007_003_01_8888.txt) is n=1,000,000, phi=0.07, epsilon=0.03,
delta=0.1 fed from a remote random-stream server — the exact item values
are not reproducible offline. What IS checkable at that scale:

* the report format, line-for-line (section order, "Size m of the
  sample", the two-line INPUT PROPERTIES header with the port, the
  "+"/"-" true-frequent markers);
* the sketch-theoretic invariants the golden file exhibits: m = ceil(1/phi)
  = 15, sticky recall 1.0 over the true-frequent set, sticky precision at
  the (phi-eps) level, the expected-size bound on the sticky table;
* exact-algorithm correctness vs an in-test histogram of the same stream.

So this module replays a deterministic synthetic 1M-item stream with the
same shape as the reference's (a few heavy hitters above phi*n over a
large uniform tail) through the full engine path (DataFrame -> ordered
first-n replay -> sketches) at the reference's exact parameters.
"""

from __future__ import annotations

import math
import random
from collections import Counter

import pandas as pd
import pytest

from bigdata_hwk_spark.streaming import frequent_items as FI

N = 1_000_000
PHI = 0.07
EPS = 0.03
DELTA = 0.1
SEED = 8888

# ~10 planted heavy hitters (>= phi*n = 70k each), like the golden file's 10
HOT = [195773912, 339323283, 434415286, 641486445, 819911327,
       870070186, 1472610405, 1590293530, 1690049656, 1936875793]
HOT_COUNT = 75_000  # 10 * 75k = 750k; 250k uniform tail


def _synthetic_stream() -> list[int]:
    rng = random.Random(SEED)
    items = [h for h in HOT for _ in range(HOT_COUNT)]
    items += [rng.randrange(1, 2**31) for _ in range(N - len(items))]
    rng.shuffle(items)
    return items


@pytest.fixture(scope="module")
def golden_report(spark):
    items = _synthetic_stream()
    stream = spark.createDataFrame(
        pd.DataFrame({"seq": range(N), "item": items})
    )
    rep = FI.replay_frequent_items(
        stream, n=N, phi=PHI, eps=EPS, delta=DELTA, batch_size=10_000, seed=SEED
    )
    return items, rep


def test_golden_scale_exact_section(golden_report):
    items, rep = golden_report
    hist = Counter(items)
    assert rep.n == N
    assert rep.distinct_items == len(hist)
    # the 10 planted hitters are exactly the true-frequent set
    assert rep.true_frequent == sorted(HOT)
    assert all(hist[i] >= PHI * N for i in rep.true_frequent)


def test_golden_scale_reservoir_section(golden_report):
    items, rep = golden_report
    m = math.ceil(1 / PHI)
    assert m == 15  # the golden file's "Size m of the sample = 15"
    # estimate is the distinct sample; <= m items, sorted
    assert len(rep.reservoir_estimate) <= m
    assert rep.reservoir_estimate == sorted(rep.reservoir_estimate)
    # heavy hitters are 75% of the stream, so a majority of the 15-slot
    # sample is hot (the golden file shows the same shape: 8 of its 11
    # estimates are "+"). Deterministic for the pinned seed.
    hot = set(HOT)
    hits = sum(1 for i in rep.reservoir_estimate if i in hot)
    assert hits * 2 >= len(rep.reservoir_estimate)
    assert hits >= 7  # most of the 10 planted hitters surface


def test_golden_scale_sticky_section(golden_report):
    items, rep = golden_report
    hist = Counter(items)
    # epsilon-deficiency guarantees (deterministic for the pinned seed):
    # recall 1.0 on true-frequent, no estimate below (phi-eps)*n
    assert set(rep.true_frequent) <= set(rep.sticky_estimate)
    assert all(hist[i] >= (PHI - EPS) * N for i in rep.sticky_estimate)
    # expected table size is O(log(1/(phi*delta))/eps) ~= 331 here; the
    # golden file shows 20. Allow the theoretical bound with slack.
    bound = 2 / EPS * math.log(1 / (PHI * DELTA))
    assert rep.sticky_table_size <= 2 * bound


def test_golden_scale_report_format(golden_report):
    """Line-for-line format parity with the reference's golden file."""
    _, rep = golden_report
    lines = rep.report_lines(port=8888)
    assert lines[0] == "INPUT PROPERTIES"
    assert lines[1] == "n = 1000000 phi = 0.07 epsilon = 0.03 delta = 0.1 port = 8888"
    assert lines[2] == "EXACT ALGORITHM"
    assert lines[3] == f"Number of items in the data structure = {rep.distinct_items}"
    assert lines[4] == "Number of true frequent items = 10"
    assert lines[5] == "True frequent items:"
    body = lines[6:16]
    assert body == [str(i) for i in sorted(HOT)]
    i = lines.index("RESERVOIR SAMPLING")
    assert lines[i + 1] == "Size m of the sample = 15"
    assert lines[i + 2] == (
        f"Number of estimated frequent items = {len(rep.reservoir_estimate)}"
    )
    assert lines[i + 3] == "Estimated frequent items:"
    j = lines.index("STICKY SAMPLING")
    assert lines[j + 1] == f"Number of items in the Hash Table = {rep.sticky_table_size}"
    assert lines[j + 2] == (
        f"Number of estimated frequent items = {len(rep.sticky_estimate)}"
    )
    # every estimate line carries the reference's +/- true-frequent marker
    hot = set(rep.true_frequent)
    for ln in lines[i + 4 : j] + lines[j + 4 :]:
        val, mark = ln.split(" ")
        assert mark == ("+" if int(val) in hot else "-")


def test_golden_scale_sticky_epsilon_sweep(golden_report):
    """BASELINE.md HW3 TEST 2: at n=1M, phi=0.07 the reference measured
    sticky estimates of ~14/10 at eps=0.06 tightening to exactly 10/10 at
    eps=0.03 — shrinking eps raises the report threshold (phi-eps)n and
    sheds false positives while never losing a true frequent item. Same
    sweep, same invariants, on the deterministic synthetic stream."""
    items, _ = golden_report
    hot = set(HOT)
    sizes = []
    for eps in (0.06, 0.05, 0.04, 0.03):
        sk = FI.StickySampling(N, PHI, eps, DELTA, seed=SEED + 1)
        for i in range(0, N, 10_000):
            sk.add_batch(items[i : i + 10_000])
        est = set(sk.estimate())
        assert hot <= est          # recall 1.0 at every eps (ref: x/10 ≥ 10)
        sizes.append(len(est))
    assert sizes[-1] >= 10
    assert sizes[-1] <= sizes[0]   # tighter eps → fewer false positives
    assert sizes[-1] <= 12         # near-exact at eps=0.03 (ref: 10/10)
