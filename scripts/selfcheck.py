"""Driver-mimicking correctness self-check.

Runs every ``queries()`` entry from ``__spark_entry__`` at a given SF dir,
and for those with an ``oracle_sql()`` twin, runs the SQL in DuckDB over the
same parquet tables and compares row count, column names, and an
order-insensitive value hash (floats rounded to 6 decimals, columns sorted
by name — matching the driver contract described in the task brief).

Usage: python scripts/selfcheck.py [sf_dir] [query ...]

A FULL run (no query args) also writes the committed round artifact
SELFCHECK_r{N}.json — per-query verdict/rows/value-hash for the whole
pool — since r13 (VERDICT r12 item 4: the driver gates 50/round, so
the other ~145 oracle verdicts otherwise live only in pytest logs).
Subset runs never write it.
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _norm(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6f}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    # numpy arrays arrive from the pandas fetch path for LIST columns;
    # .tolist() also unboxes numpy scalars so elements normalize like
    # their Python twins.
    if hasattr(v, "tolist") and not isinstance(v, (str, bytes)):
        unboxed = v.tolist()
        if isinstance(unboxed, (list, tuple)):
            return "[" + ",".join(_norm(x) for x in unboxed) + "]"
        return _norm(unboxed)
    return str(v)


def value_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted("|".join(_norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as entrymod
    from bigdata_hwk_spark.session import get_spark

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    # Fixture-drift canary: before any query, assert Spark and DuckDB read
    # the same table (row count + min/max ts where present). Catches silent
    # environment drift — e.g. round 4's events.ts regeneration from
    # TIMESTAMP(NANOS) to TIMESTAMP(MICROS) — as one clear line naming the
    # parquet footer type, instead of N red query rows downstream.
    from bigdata_hwk_spark.sources.tables import load_table

    drift = []
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if not os.path.exists(p):
            continue
        sdf = load_table(spark, sf_dir, t)
        probes = ["count(*) AS n"]
        if t == "events":
            probes += ["min(epoch_us(CAST(ts AS TIMESTAMP))) AS lo",
                       "max(epoch_us(CAST(ts AS TIMESTAMP))) AS hi"]
        orow = con.execute(f"SELECT {', '.join(probes)} FROM {t}").fetchone()
        if t == "events":
            from pyspark.sql import functions as F

            srow = sdf.agg(
                F.count(F.lit(1)), F.min(F.unix_micros("ts")), F.max(F.unix_micros("ts"))
            ).first()
        else:
            srow = (sdf.count(),)
        if tuple(srow) != tuple(orow):
            import pyarrow.parquet as pq

            footer = pq.read_schema(p)
            drift.append(t)
            print(f"DRIFT {t}: spark={tuple(srow)} duckdb={tuple(orow)} footer={footer}")
    if drift:
        print(f"\nfixture drift in {drift} — fix the loaders before trusting query rows")
        return 1

    qs = entrymod.queries()
    # Per-SF oracle view: identical to entrymod.oracle_sql() at the gate
    # SF, but re-parameterizes the stream oracles whose SQL bakes in
    # (n, φ, ε) so off-gate runs compare against the right thresholds.
    from bigdata_hwk_spark import registry as _registry

    oracles = _registry.oracles_for(sf_dir)
    failures = []
    results: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            # Collect the Spark side through pandas as well — the driver
            # compares pandas-to-pandas, so nulls must normalize the same
            # way on both sides (a null timestamp is NaT via toPandas AND
            # via fetchdf; collect() would yield None against the
            # oracle's NaT and red a correct answer).
            spdf = sdf.toPandas()
            srows = [tuple(r) for r in spdf.itertuples(index=False, name=None)]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            results[name] = {"verdict": "spark-error", "error": str(e)[:200]}
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok*   {name}: rows={len(srows)} ({dt:.1f}s, rows-only)")
            results[name] = {
                "verdict": "rows-only",
                "rows": len(srows),
                "sec": round(dt, 1),
            }
            continue
        try:
            # Fetch through the PANDAS path — the same route the external
            # driver takes. fetchall() returns Python ints for every DuckDB
            # integer type, which HID a real portability bug in round 7:
            # HUGEINT (the type of sum(CASE…)) renders as float64 under
            # fetchdf(), so the driver hashed 4.0 against Spark's 4 while
            # this script saw 4 == 4. Fetching via fetchdf() makes this
            # harness fail exactly when the driver would.
            res = con.execute(oracles[name])
            odf = res.fetchdf()
            ocols = list(odf.columns)
            orows = [tuple(r) for r in odf.itertuples(index=False, name=None)]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: oracle error: {e}")
            failures.append(name)
            results[name] = {"verdict": "oracle-error", "error": str(e)[:200]}
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount {len(srows)} vs {len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols {sorted(scols)} vs {sorted(ocols)}")
        if not problems:
            sh = value_hash(srows, scols)
            oh = value_hash(orows, ocols)
            if sh != oh:
                problems.append(f"value-hash {sh} vs {oh}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)} ({dt:.1f}s)")
            failures.append(name)
            results[name] = {
                "verdict": "mismatch",
                "problems": problems,
                "sec": round(dt, 1),
            }
        else:
            print(f"ok    {name}: rows={len(srows)} hash-match ({dt:.1f}s)")
            results[name] = {
                "verdict": "hash-match",
                "rows": len(srows),
                "hash": value_hash(srows, scols),
                "sec": round(dt, 1),
            }
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))

    # Committed full-pool artifact (r12 VERDICT item 4): the driver gate
    # rotates 50 queries/round, so most oracle evidence lived only in
    # pytest run logs. A FULL run (no query-name argv) at the gate SF
    # writes SELFCHECK_r{N}.json — name, verdict, rows, value hash per
    # query — next to the driver's CORRECTNESS artifact each round.
    # Subset runs never write it (a 3-query verify loop must not
    # masquerade as full-pool evidence).
    if not only:
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        try:
            with open(os.path.join(repo, "ROUND"), encoding="utf-8") as fh:
                round_no = int(fh.read().strip())
        except (OSError, ValueError):
            round_no = 0
        counts: dict[str, int] = {}
        for e in results.values():
            counts[e["verdict"]] = counts.get(e["verdict"], 0) + 1
        artifact = {
            "sf_dir": sf_dir,
            "n_queries": len(results),
            "verdict_counts": counts,
            "failures": sorted(failures),
            "queries": results,
        }
        path = os.path.join(repo, f"SELFCHECK_r{round_no:02d}.json")
        import json

        with open(path, "w") as fh:
            json.dump(artifact, fh, indent=1, sort_keys=True)
        print(f"wrote {path}: {counts}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
