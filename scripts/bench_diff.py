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
  the flagged set, and a ``watchlist`` section that tracks whether the
  queries the PREVIOUS round's notes flagged as regressions have
  reverted to their pre-regression walls. The watchlist is sourced from
  the previous round's committed notes file — not a hard-coded constant
  — so it can never go stale (round-8 ADVICE).

The GLOBAL variance band is taken from the measured run-to-run spread
in ``VARIANCE_BAND_r13.json`` (scripts/variance_band_ab.py: 5 full
fresh-JVM bench.py subset runs over a 14-query sample at sf0.1 under
the min-of-2 per-query discipline — the SAME methodology the round
details are produced under; abs 1.155 s from lineitem_checksum, rel
49.7% from the heaviest-median queries only — sub-1.5 s queries are
excluded from the rel maximum because the abs band governs their flag
anyway — each padded ×1.25 → 1.444 s / 0.621). The global numbers are
only the FALLBACK: every query measured in the variance sample gets
its OWN per-query band (see per_query_bands). A delta inside the band
is noise by measurement, not by assertion.

Usage: python scripts/bench_diff.py [prev.json cur.json] [--round N]

With explicit file paths the round number is parsed from the current
file's ``r(\\d+).json`` suffix; if it doesn't match, ``--round N`` is
REQUIRED — the script errors out rather than silently writing
``BENCH_REGRESSION_NOTES_r00.json`` (round-8 ADVICE).
"""

from __future__ import annotations

import argparse
import json
import os
import re

VARIANCE_ABS_SEC = 1.444
VARIANCE_REL = 0.621

# Methodology comparison uses only the methodology-BEARING keys. The
# isolation dict also records derived facts (``n_batches`` =
# ceil(n_queries / batch_size)) that change whenever the registry grows
# — r12 shipped a false ``methodology_change`` banner purely because
# 225 vs 219 queries meant 15 vs 14 batches (VERDICT r12 item 3). Two
# details produced under the same mode / batch size / per-query
# discipline ARE like-for-like regardless of suite size.
METHODOLOGY_KEYS = ("mode", "batch_size", "per_query")


def methodology_fingerprint(iso):
    """The methodology-bearing subset of an ``isolation`` dict.

    Non-dict inputs (older details had no isolation section) pass
    through unchanged so ``None != {...}`` still reads as a change.
    """
    if not isinstance(iso, dict):
        return iso
    return {k: iso.get(k) for k in METHODOLOGY_KEYS}


# Per-query band floors: a lucky tight sample (5 runs landing close)
# must not produce a hair-trigger band that flags ordinary noise; the
# floors are roughly the r07 one-JVM band, the tightest spread any
# methodology here has ever measured.
PQ_BAND_MIN_ABS = 0.25
PQ_BAND_MIN_REL = 0.10


def per_query_bands(repo_dir: str | None = None) -> dict[str, dict]:
    """Per-query variance bands from the newest committed
    VARIANCE_BAND_r*.json (r12 ADVICE: one global max band — 1.206 s /
    33.9%, driven by the noisiest heavy queries — let real regressions
    of up to a third of a wall pass unflagged on every cheap stable
    query). A query measured in the variance sample gets its OWN
    spread x1.25 (floored at PQ_BAND_MIN_*); unmeasured queries keep
    the global band.
    """
    d = repo_dir or _repo_dir()
    files = []
    for f in os.listdir(d):
        m = re.match(r"VARIANCE_BAND_r(\d+)\.json$", f)
        if m:
            files.append((int(m.group(1)), os.path.join(d, f)))
    if not files:
        return {}
    _, path = max(files)
    try:
        with open(path) as f:
            doc = json.load(f)
    except (OSError, ValueError):
        return {}
    out = {}
    for q, e in doc.get("queries", {}).items():
        if "abs_spread_sec" not in e or "rel_spread" not in e:
            continue
        out[q] = {
            "abs_sec": max(round(e["abs_spread_sec"] * 1.25, 3), PQ_BAND_MIN_ABS),
            "rel": max(round(e["rel_spread"] * 1.25, 4), PQ_BAND_MIN_REL),
            "source": os.path.basename(path),
        }
    return out


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


def _prev_watchlist(round_no: int) -> dict[str, dict]:
    """Regressions flagged in the previous round's committed notes file:
    each maps to its pre-regression wall (that note's prev_sec) as the
    revert target. Empty if no notes file exists for round_no - 1.

    When the previous round carried a ``methodology_change`` banner, its
    ``flagged_outside_band`` compares walls across two different bench
    methodologies — declared informational there, so it must NOT seed
    new watchlist entries. Instead the previous round's own UNRESOLVED
    watchlist entries carry forward (marked), so the first
    like-for-like round adjudicates them (r11 VERDICT item 1)."""
    path = os.path.join(
        _repo_dir(), f"BENCH_REGRESSION_NOTES_r{round_no - 1:02d}.json"
    )
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        notes = json.load(f)
    out = {}
    if "methodology_change" in notes:
        for q, e in notes.get("watchlist", {}).items():
            if not e.get("reverted_to_pre_regression_level"):
                out[q] = {
                    "source": e.get("source", os.path.basename(path)),
                    "pre_regression_sec": e["pre_regression_sec"],
                    "regressed_to_sec": e["regressed_to_sec"],
                    "floor_is_pre_isolation": True,
                }
        return out
    for q, e in notes.get("flagged_outside_band", {}).items():
        if e.get("delta_sec", 0) > 0:  # regressions only, not improvements
            out[q] = {
                "source": os.path.basename(path),
                "pre_regression_sec": e["prev_sec"],
                "regressed_to_sec": e["cur_sec"],
            }
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("files", nargs="*", help="explicit prev.json cur.json pair")
    ap.add_argument("--round", type=int, default=None, dest="round_no")
    args = ap.parse_args()

    if args.files and len(args.files) != 2:
        ap.error("give both prev.json and cur.json, or neither")
    if args.files:
        prev_path, cur_path = args.files
        round_no = args.round_no
        if round_no is None:
            m = re.search(r"r(\d+)\.json$", cur_path)
            if not m:
                ap.error(
                    f"cannot parse round number from {cur_path!r}; "
                    "pass --round N explicitly"
                )
            round_no = int(m.group(1))
    else:
        files = _detail_files()
        if len(files) < 2:
            ap.error("need two BENCH_DETAIL_r*.json files to diff")
        (_, prev_path), (round_no, cur_path) = files[-2], files[-1]
        if args.round_no is not None:
            round_no = args.round_no

    prev, cur = _load(prev_path), _load(cur_path)
    shared = sorted(set(prev) & set(cur))
    # Host-drift indicator: the median cur/prev ratio over the shared
    # non-trivial queries. A real regression moves ONE query; thermal or
    # co-tenant drift moves ALL of them — flags should be read against
    # the median, and each entry also carries its drift-normalized delta
    # (cur/median vs prev) so a uniform 1.2x run doesn't read as twenty
    # regressions.
    import statistics

    ratios = [cur[q] / prev[q] for q in shared if prev[q] >= 0.5]
    median_shift = round(statistics.median(ratios), 3) if ratios else 1.0
    pq_bands = per_query_bands()
    diff = {}
    flagged = {}
    for q in shared:
        delta = round(cur[q] - prev[q], 3)
        if q in pq_bands:
            band = max(
                pq_bands[q]["abs_sec"], pq_bands[q]["rel"] * prev[q]
            )
            band_source = pq_bands[q]["source"]
        else:
            band = max(VARIANCE_ABS_SEC, VARIANCE_REL * prev[q])
            band_source = "global"
        norm_cur = cur[q] / median_shift
        norm_delta = round(norm_cur - prev[q], 3)
        entry = {
            "prev_sec": prev[q],
            "cur_sec": cur[q],
            "delta_sec": delta,
            "band_sec": round(band, 3),
            "band_source": band_source,
            "within_band": abs(delta) <= band,
            "drift_normalized_delta_sec": norm_delta,
            "within_band_drift_normalized": abs(norm_delta) <= band,
        }
        diff[q] = entry
        if not entry["within_band"]:
            flagged[q] = entry

    # isolated floors (scripts/drift_ab.py) from THIS round's notes: a
    # watchlist query whose cache-isolated floor is at or below its
    # revert target has reverted even when the suite's single-sample
    # wall — which carries neighbors' cache pressure — still reads high.
    floors = {}
    this_notes = os.path.join(
        _repo_dir(), f"BENCH_REGRESSION_NOTES_r{round_no:02d}.json"
    )
    if os.path.exists(this_notes):
        try:
            with open(this_notes) as f:
                ab = json.load(f).get("isolated_ab", {}).get("queries", {})
            floors = {q: e.get("min_sec") for q, e in ab.items()}
        except (OSError, ValueError):
            pass

    watch = {}
    for q, targets in _prev_watchlist(round_no).items():
        if q in cur:
            reverted = (
                cur[q] <= targets["pre_regression_sec"] + VARIANCE_ABS_SEC
            )
            watch[q] = {
                **targets,
                "cur_wall_sec": cur[q],
                "reverted_to_pre_regression_level": reverted,
            }
            if floors.get(q) is not None:
                watch[q]["isolated_floor_sec"] = floors[q]
                watch[q]["reverted_via_isolated_floor"] = (
                    floors[q]
                    <= targets["pre_regression_sec"] + VARIANCE_ABS_SEC
                )
            # adjudication for entries whose floor predates the bench
            # isolation rewrite: the old one-JVM floor carried suite
            # subsidies and is not achievable under isolation BY DESIGN
            # (BENCH_BRIDGE_NOTES_r11.json). If the query's wall is
            # stable across the first pair of like-for-like isolated
            # rounds, the isolated wall IS the honest new floor and the
            # entry RETIRES; if it drifted further, it stays live as a
            # real regression candidate.
            if targets.get("floor_is_pre_isolation") and q in prev:
                band = max(VARIANCE_ABS_SEC, VARIANCE_REL * prev[q])
                stable = abs(cur[q] - prev[q]) <= band
                watch[q]["like_for_like_prev_sec"] = prev[q]
                watch[q]["retired"] = stable
                watch[q]["retirement_note"] = (
                    (
                        "stable across the first like-for-like isolated "
                        "rounds; the pre-regression floor was quoted "
                        "under the one-JVM methodology and is superseded "
                        "by the isolated wall (see "
                        "BENCH_BRIDGE_NOTES_r11.json)"
                    )
                    if stable
                    else (
                        "NOT stable under like-for-like isolation — "
                        "treat as a live regression against the "
                        "previous isolated wall"
                    )
                )

    def _canary(path):
        with open(path) as f:
            return json.load(f).get("canary")

    def _isolation(path):
        with open(path) as f:
            return json.load(f).get("isolation")

    iso_prev, iso_cur = _isolation(prev_path), _isolation(cur_path)
    payload = {
        "prev_file": os.path.basename(prev_path),
        "cur_file": os.path.basename(cur_path),
        "canaries": {"prev": _canary(prev_path), "cur": _canary(cur_path)},
        "isolation": {"prev": iso_prev, "cur": iso_cur},
        "median_shift": median_shift,
        "host_drift_suspected": abs(median_shift - 1.0) > VARIANCE_REL,
        "n_shared": len(shared),
        "n_prev_only": len(set(prev) - set(cur)),
        "n_cur_only": len(set(cur) - set(prev)),
        "variance_band": {
            "abs_sec": VARIANCE_ABS_SEC,
            "rel": VARIANCE_REL,
            "source": (
                "same-methodology fresh-JVM repeats in "
                "VARIANCE_BAND_r12.json (scripts/variance_band_ab.py)"
            ),
        },
        "watchlist": watch,
        "flagged_outside_band": flagged,
        "diff": diff,
    }
    if methodology_fingerprint(iso_prev) != methodology_fingerprint(iso_cur):
        payload["methodology_change"] = (
            "the two details were produced under DIFFERENT bench "
            "methodologies (isolation params differ) — per-query deltas "
            "compare a suite-contaminated wall against an isolated one "
            "and are NOT evidence of code-level regressions or "
            "improvements; see the round's BENCH_BRIDGE_NOTES for the "
            "one-time old->new mapping. Flags below should be read as "
            "informational until the next same-methodology round."
        )
    out_path = os.path.join(
        _repo_dir(), f"BENCH_REGRESSION_NOTES_r{round_no:02d}.json"
    )
    # merge-write: other tools (scripts/drift_ab.py) add their own
    # sections to the same notes file — refreshing the diff must not
    # clobber them
    existing = {}
    if os.path.exists(out_path):
        try:
            with open(out_path) as f:
                existing = json.load(f)
        except (OSError, ValueError):
            existing = {}
    # the banner is authoritatively decided by THIS diff — a stale one
    # left by a previous (pre-fingerprint-fix) run must not survive the
    # merge when the payload omits it
    existing.pop("methodology_change", None)
    existing.update(payload)
    with open(out_path, "w") as f:
        json.dump(existing, f, indent=1, sort_keys=True)
    print(
        json.dumps(
            {
                "written": out_path,
                "shared": len(shared),
                "flagged": sorted(flagged),
                "watchlist": {
                    q: w["reverted_to_pre_regression_level"]
                    for q, w in watch.items()
                },
            }
        )
    )


if __name__ == "__main__":
    main()
