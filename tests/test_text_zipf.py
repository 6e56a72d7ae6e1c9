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


def test_heaps_matches_oracle_smoke(spark):
    assert_matches_oracle(
        TX.heaps_law_fit(_docs(spark, SF_SMOKE)),
        TX.heaps_law_fit_sql(),
        SF_SMOKE,
        float_round=6,
    )


def test_heaps_matches_oracle_gate_sf(spark):
    assert_matches_oracle(
        TX.heaps_law_fit(_docs(spark, SF_CORRECT)),
        TX.heaps_law_fit_sql(),
        SF_CORRECT,
        float_round=6,
    )


def test_heaps_all_unique_words_gives_beta_one(spark):
    # every token is globally unique -> V(n) = n exactly -> beta = 1,
    # ln K = 0, r2 = 1
    docs = spark.createDataFrame(
        [(i, " ".join(f"u{i}_{j}" for j in range(10))) for i in range(16)],
        "doc_id bigint, text string",
    )
    row = TX.heaps_law_fit(docs).collect()[0]
    assert row["n_vocab"] == row["n_tokens"] == 160
    assert abs(row["heaps_beta"] - 1.0) < 1e-6
    assert abs(row["heaps_ln_k"]) < 1e-6
    assert abs(row["r2"] - 1.0) < 1e-6


def test_heaps_constant_vocab_gives_beta_zero(spark):
    # the same 5 words in every doc -> V(n) flat after the first doc;
    # with every checkpoint >= doc 0 the fitted beta is exactly 0 and
    # the zero-variance convention gives r2 = 1
    docs = spark.createDataFrame(
        [(i, "a b c d e") for i in range(16)],
        "doc_id bigint, text string",
    )
    row = TX.heaps_law_fit(docs).collect()[0]
    assert row["n_vocab"] == 5
    assert row["r2"] == 1.0
    assert abs(row["heaps_beta"]) < 1e-6
    import math

    assert abs(row["heaps_ln_k"] - math.log(5)) < 1e-6


def test_heaps_fixture_beta_in_natural_range(spark):
    # the synthetic fixture's text draws from a 31-word vocabulary, so
    # V(n) saturates before the first checkpoint: beta is EXACTLY 0 and
    # the zero-variance convention pins r2 = 1 (constant model, exact)
    row = TX.heaps_law_fit(_docs(spark, SF_SMOKE)).collect()[0]
    assert 0.0 <= row["heaps_beta"] < 1.0
    assert row["heaps_beta"] == 0.0
    assert row["r2"] == 1.0
    assert row["n_vocab"] == 31
    assert row["n_checkpoints"] == TX.HEAPS_CHECKPOINTS
    assert row["n_vocab"] <= row["n_tokens"]


# --- PMI collocations ---


def test_pmi_matches_oracle_smoke(spark):
    assert_matches_oracle(
        TX.pmi_top_bigrams(_docs(spark, SF_SMOKE)),
        TX.pmi_top_bigrams_sql(),
        SF_SMOKE,
        float_round=6,
    )


def test_pmi_matches_oracle_gate_sf(spark):
    assert_matches_oracle(
        TX.pmi_top_bigrams(_docs(spark, SF_CORRECT)),
        TX.pmi_top_bigrams_sql(),
        SF_CORRECT,
        float_round=6,
    )


def test_pmi_hand_corpus_ranks_exclusive_pair_first(spark):
    """'alpha beta' always co-occur exclusively (perfect collocation);
    'the x'/'the y'... spread 'the' thin. With every pair at the same
    support, the exclusive pair must rank 1 with the hand-computed PMI."""
    import math

    doc = " ".join(["alpha beta"] * 6 + ["the cat", "the dog", "the fox"] * 6)
    docs = spark.createDataFrame(
        [(0, doc)], "doc_id bigint, text string"
    )
    rows = TX.pmi_top_bigrams(docs, k=50, min_count=2).collect()
    assert rows[0]["left_word"] == "alpha" and rows[0]["right_word"] == "beta"
    r0 = rows[0]
    nt = 6 * 2 + 18 * 2  # 48 tokens
    nb = nt - 1  # single doc: every adjacency counts, pre-cut total
    cxy, cl, cr = r0["pair_count"], r0["left_count"], r0["right_count"]
    want = math.log(cxy * nt * nt / (nb * cl * cr))
    assert abs(r0["pmi"] - want) < 1e-6
    # support cut honored
    assert all(r["pair_count"] >= 2 for r in rows)
    # ranks dense from 1
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))


def test_pmi_empty_token_adjacency_convention(spark):
    """Doubled spaces collapse BEFORE adjacency: 'a  b' yields the
    (a, b) bigram in both engines."""
    docs = spark.createDataFrame(
        [(0, "a  b a b a b a b a b")], "doc_id bigint, text string"
    )
    rows = TX.pmi_top_bigrams(docs, k=10, min_count=5).collect()
    pairs = {(r["left_word"], r["right_word"]) for r in rows}
    assert ("a", "b") in pairs
    ab = [r for r in rows if (r["left_word"], r["right_word"]) == ("a", "b")][0]
    assert ab["pair_count"] == 5
