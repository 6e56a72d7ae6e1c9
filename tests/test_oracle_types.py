"""Oracle-SQL portability lint (round-7 VERDICT item 2).

Round 7's only red driver row (`user_event_pivot`) was not an engine bug:
the Spark rows were bit-identical to the oracle's, but the oracle SQL's
``sum(CASE…)`` types as HUGEINT in DuckDB, and the driver's pandas fetch
path (``fetchdf``) renders HUGEINT as float64 — so the driver hashed
``4.0`` against Spark's ``4``. ``fetchall()``-based harnesses (Python
ints) and ``check_dtype=False`` pandas comparisons both pass the same
query, which is exactly how it slipped through three rounds of local
checks.

This module closes the CLASS, not the instance:

* a static lint runs ``DESCRIBE`` over every registered oracle and fails
  on any output column whose DuckDB type is pandas-lossy (HUGEINT,
  UHUGEINT, DECIMAL → float64/object under ``fetchdf``);
* a harness regression test re-creates the round-7 failure with the
  un-cast SQL and asserts the pandas-path value hash DIFFERS while the
  fetchall-path hash MATCHES — proving the selfcheck fetch-path change
  actually sees what the driver sees.
"""

from __future__ import annotations

import importlib.util
import os
import re

import pytest

from bigdata_hwk_spark import registry

from .conftest import SF_CORRECT, duck_con

# DuckDB types whose pandas rendering does not round-trip the value
# representation Spark produces: HUGEINT/UHUGEINT become float64 (so an
# integer count hashes as "4.000000"), DECIMAL becomes float64 or
# decimal.Decimal objects depending on version/width. Any oracle emitting
# one of these will hash-mismatch a correct Spark answer under the
# driver's pandas comparison.
_LOSSY = re.compile(r"\b(U?HUGEINT|DECIMAL)\b", re.IGNORECASE)


def _selfcheck_mod():
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts",
        "selfcheck.py",
    )
    spec = importlib.util.spec_from_file_location("selfcheck_under_test", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_every_oracle_output_type_is_pandas_portable():
    """DESCRIBE (bind-only, no execution) every oracle at the gate SF and
    fail on any pandas-lossy output column type."""
    offenders = {}
    with duck_con(SF_CORRECT) as con:
        for name, sql in registry.ORACLES.items():
            desc = con.execute(f"DESCRIBE ({sql})").fetchall()
            bad = [(col, typ) for col, typ, *_ in desc if _LOSSY.search(typ)]
            if bad:
                offenders[name] = bad
    assert not offenders, (
        "oracles emitting pandas-lossy DuckDB types (HUGEINT/DECIMAL): "
        f"{offenders} — CAST the offending columns (e.g. AS BIGINT / AS "
        "DOUBLE) so the driver's fetchdf path renders them like Spark does"
    )


def test_oracles_for_offgate_sf_are_pandas_portable_too():
    """The per-SF regenerated oracles (selfcheck path) obey the same lint —
    the parameterized stream SQLs must not reintroduce the class at other
    SFs."""
    with duck_con("/root/testdata/sf0.001") as con:
        for name, sql in registry.oracles_for("/root/testdata/sf0.001").items():
            desc = con.execute(f"DESCRIBE ({sql})").fetchall()
            bad = [(col, typ) for col, typ, *_ in desc if _LOSSY.search(typ)]
            assert not bad, f"{name}: lossy output types {bad}"


# The round-7 oracle, verbatim (pre-fix): sum(CASE…) with no CAST.
_UNFIXED_PIVOT_SQL = """
SELECT user_id,
       sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS n_view,
       sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS n_click,
       sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n_purchase,
       sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS n_signup,
       sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS n_error
FROM events GROUP BY user_id
"""


def test_harness_reproduces_round7_driver_failure_on_unfixed_sql():
    """Regression-test the HARNESS: on the un-cast SQL, the pandas fetch
    path (what the driver and the fixed selfcheck use) must produce a
    DIFFERENT value hash than the integer rows Spark would produce, while
    the old fetchall path produces the SAME hash — i.e. the round-7 bug
    is visible to the new harness and was invisible to the old one."""
    sc = _selfcheck_mod()
    with duck_con(SF_CORRECT) as con:
        res = con.execute(_UNFIXED_PIVOT_SQL)
        cols = [d[0] for d in res.description]
        int_rows = res.fetchall()  # old path: Python ints
        pdf = con.execute(_UNFIXED_PIVOT_SQL).fetchdf()  # driver path
    assert str(pdf.dtypes["n_view"]) == "float64", (
        "expected DuckDB to render HUGEINT as float64 via fetchdf — if this "
        "changed, the lint's premise needs re-checking"
    )
    pandas_rows = [tuple(r) for r in pdf.itertuples(index=False, name=None)]
    h_spark_like = sc.value_hash(int_rows, cols)  # Spark collects ints
    h_pandas = sc.value_hash(pandas_rows, list(pdf.columns))
    assert h_pandas != h_spark_like, (
        "pandas path no longer distinguishes HUGEINT floats from ints — "
        "harness regression"
    )


def test_fixed_pivot_oracle_hash_matches_across_fetch_paths():
    """With the CAST in place, both fetch paths hash identically — the
    green-row condition the driver checks."""
    sc = _selfcheck_mod()
    from bigdata_hwk_spark.plans.relational import USER_EVENT_PIVOT_SQL

    with duck_con(SF_CORRECT) as con:
        res = con.execute(USER_EVENT_PIVOT_SQL)
        cols = [d[0] for d in res.description]
        int_rows = res.fetchall()
        pdf = con.execute(USER_EVENT_PIVOT_SQL).fetchdf()
    pandas_rows = [tuple(r) for r in pdf.itertuples(index=False, name=None)]
    assert sc.value_hash(int_rows, cols) == sc.value_hash(
        pandas_rows, list(pdf.columns)
    )


def test_gate_rotation_reads_committed_round_file():
    """The gate window derives from the committed ROUND file, not from
    whatever CORRECTNESS_r*.json artifacts happen to sit in the working
    tree (round-8 ADVICE fix)."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "ROUND"), encoding="utf-8") as fh:
        committed = int(fh.read().strip())
    assert registry._gate_round_number() == committed
