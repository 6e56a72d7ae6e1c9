#!/usr/bin/env python3
"""Run any registry query from the command line.

The front door for the full query surface: every operator the engine
implements is a named entry in ``bigdata_hwk_spark.registry``; this CLI
lists them, runs one against a fixture (or production) directory, and
optionally prints the physical plan instead of rows — the first tool to
reach for when auditing what a query does and how it executes.

    python scripts/analyze.py --list
    python scripts/analyze.py tpch_q1
    python scripts/analyze.py conversion_funnel --sf-dir /root/testdata/sf0.1
    python scripts/analyze.py dedup_minhash_lsh --explain
    python scripts/analyze.py user_type_scd2 --oracle
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("query", nargs="?", help="registry query name")
    ap.add_argument("--list", action="store_true", help="list all queries")
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"),
    )
    ap.add_argument("--limit", type=int, default=20, help="rows to print")
    ap.add_argument(
        "--explain", action="store_true", help="print the formatted plan, no rows"
    )
    ap.add_argument(
        "--oracle",
        action="store_true",
        help="run the DuckDB oracle side-by-side and compare (rows, schema, "
        "value hash) — the driver-shaped check, one query at a time",
    )
    args = ap.parse_args(argv)

    from bigdata_hwk_spark import registry

    if args.list or not args.query:
        for name in registry.QUERIES:
            kind = "oracle" if name in registry.ORACLES else "rows-only"
            print(f"{name}\t{kind}")
        return 0
    if args.query not in registry.QUERIES:
        print(f"unknown query: {args.query} (see --list)", file=sys.stderr)
        return 2

    if args.oracle:
        # delegate to the driver-mimicking harness (same comparison the
        # correctness gate applies), scoped to this one query
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        import selfcheck

        sys.argv = ["selfcheck", args.sf_dir, args.query]
        return selfcheck.main()

    from bigdata_hwk_spark.session import get_spark

    spark = get_spark(app_name=f"analyze-{args.query}")
    df = registry.QUERIES[args.query](spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
    else:
        df.show(args.limit, truncate=60)
        print(f"# {args.query}: showing up to {args.limit} rows", file=sys.stderr)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
