"""Zipf head fit: oracle parity + a hand-constructed corpus with a known
exact power law (freq = C / rank -> slope exactly -1, r2 exactly 1 up to
float rounding) + tie-determinism across layouts."""

from __future__ import annotations

from bigdata_hwk_spark.functions import text as TX
from tests.conftest import SF_CORRECT, SF_SMOKE, assert_matches_oracle


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_zipf_matches_oracle_smoke(spark):
    assert_matches_oracle(
        TX.zipf_head_fit(_docs(spark, SF_SMOKE)),
        TX.zipf_head_fit_sql(),
        SF_SMOKE,
        float_round=6,
    )


def test_zipf_matches_oracle_gate_sf(spark):
    assert_matches_oracle(
        TX.zipf_head_fit(_docs(spark, SF_CORRECT)),
        TX.zipf_head_fit_sql(),
        SF_CORRECT,
        float_round=6,
    )


def test_zipf_exact_power_law_recovers_slope_minus_one(spark):
    # word w_r appears exactly 840/r times for r in 1..8 -> a perfect
    # ln-ln line with slope -1 through (0, ln 840)
    words = []
    for r in range(1, 9):
        words += [f"w{r:02d}"] * (840 // r)
    docs = spark.createDataFrame(
        [(0, " ".join(words))], "doc_id bigint, text string"
    )
    row = TX.zipf_head_fit(docs, top_k=8).collect()[0]
    assert row["n_vocab"] == 8 and row["head_k"] == 8
    assert row["n_tokens"] == sum(840 // r for r in range(1, 9))
    assert abs(row["zipf_slope"] + 1.0) < 1e-6
    assert abs(row["r2"] - 1.0) < 1e-6
    import math

    assert abs(row["zipf_intercept"] - math.log(840)) < 1e-6


def test_zipf_deterministic_across_layouts(spark):
    a = TX.zipf_head_fit(_docs(spark, SF_SMOKE)).collect()
    b = TX.zipf_head_fit(_docs(spark, SF_SMOKE).repartition(13)).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_zipf_fixture_slope_is_negative_and_fit_reasonable(spark):
    row = TX.zipf_head_fit(_docs(spark, SF_SMOKE)).collect()[0]
    assert row["zipf_slope"] < 0
    assert 0.0 <= row["r2"] <= 1.0
    assert row["head_k"] <= TX.ZIPF_HEAD_K
    assert row["n_vocab"] >= row["head_k"]
