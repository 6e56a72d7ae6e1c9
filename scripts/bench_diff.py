#!/usr/bin/env python3
"""Mechanical per-round bench diff: BENCH_DETAIL_r{N-1} vs BENCH_DETAIL_r{N}.

Round-7 VERDICT item 5 closes by diffing, not re-arguing: with per-round
bench detail now committed every round, "did the two small r7 wall
regressions revert" is a table lookup. This script generalizes that into
the per-round discipline:

* reads the two most recent committed ``BENCH_DETAIL_r*.json`` files
  (or the pair given as argv),
* computes per-query deltas,
* flags queries whose wall moved more than the variance band
  (max(VARIANCE_ABS_SEC, VARIANCE_REL * previous wall)) in either
  direction,
* writes ``BENCH_REGRESSION_NOTES_r{N}.json`` with the full diff table,
  the flagged set, and a ``watchlist`` section that tracks the queries
  the previous round's verdict called out explicitly.

The variance band is taken from the measured run-to-run spread in
``BENCH_REGRESSION_NOTES_r07.json`` (same-session A/B repeats showed
~±0.2-0.25s swings on 1.5-3s queries, i.e. ~10-15%): a delta inside the
band is noise by measurement, not by assertion.

Usage: python scripts/bench_diff.py [prev.json cur.json]
"""

from __future__ import annotations

import json
import os
import re
import sys

VARIANCE_ABS_SEC = 0.25
VARIANCE_REL = 0.15

# Queries the round-7 verdict explicitly asked round 8 to confirm
# revert (r6 walls are the revert targets).
WATCHLIST = {
    "ann_ivf_topk": {"r6_wall_sec": 1.52, "r7_wall_sec": 1.762},
    "decontamination_check": {"r6_wall_sec": 2.96, "r7_wall_sec": 3.156},
}


def _repo_dir() -> str:
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _detail_files() -> list[tuple[int, str]]:
    out = []
    for f in os.listdir(_repo_dir()):
        m = re.match(r"BENCH_DETAIL_r(\d+)\.json$", f)
        if m:
            out.append((int(m.group(1)), os.path.join(_repo_dir(), f)))
    return sorted(out)


def _load(path: str) -> dict[str, float]:
    with open(path) as f:
        d = json.load(f)
    qs = d.get("queries", d)
    return {k: float(v) for k, v in qs.items() if isinstance(v, (int, float))}


def main() -> None:
    if len(sys.argv) == 3:
        prev_path, cur_path = sys.argv[1], sys.argv[2]
        round_no = 0
        m = re.search(r"r(\d+)\.json$", cur_path)
        if m:
            round_no = int(m.group(1))
    else:
        files = _detail_files()
        if len(files) < 2:
            sys.exit("need two BENCH_DETAIL_r*.json files to diff")
        (_, prev_path), (round_no, cur_path) = files[-2], files[-1]

    prev, cur = _load(prev_path), _load(cur_path)
    shared = sorted(set(prev) & set(cur))
    diff = {}
    flagged = {}
    for q in shared:
        delta = round(cur[q] - prev[q], 3)
        band = max(VARIANCE_ABS_SEC, VARIANCE_REL * prev[q])
        entry = {
            "prev_sec": prev[q],
            "cur_sec": cur[q],
            "delta_sec": delta,
            "band_sec": round(band, 3),
            "within_band": abs(delta) <= band,
        }
        diff[q] = entry
        if not entry["within_band"]:
            flagged[q] = entry

    watch = {}
    for q, targets in WATCHLIST.items():
        if q in cur:
            reverted = cur[q] <= targets["r6_wall_sec"] + VARIANCE_ABS_SEC
            watch[q] = {
                **targets,
                "cur_wall_sec": cur[q],
                "reverted_to_r6_level": reverted,
            }

    payload = {
        "prev_file": os.path.basename(prev_path),
        "cur_file": os.path.basename(cur_path),
        "n_shared": len(shared),
        "n_prev_only": len(set(prev) - set(cur)),
        "n_cur_only": len(set(cur) - set(prev)),
        "variance_band": {
            "abs_sec": VARIANCE_ABS_SEC,
            "rel": VARIANCE_REL,
            "source": "same-session A/B repeats in BENCH_REGRESSION_NOTES_r07.json",
        },
        "watchlist": watch,
        "flagged_outside_band": flagged,
        "diff": diff,
    }
    out_path = os.path.join(
        _repo_dir(), f"BENCH_REGRESSION_NOTES_r{round_no:02d}.json"
    )
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    print(
        json.dumps(
            {
                "written": out_path,
                "shared": len(shared),
                "flagged": sorted(flagged),
                "watchlist": {
                    q: w["reverted_to_r6_level"] for q, w in watch.items()
                },
            }
        )
    )


if __name__ == "__main__":
    main()
