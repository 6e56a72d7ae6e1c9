"""Perceptual-hash image dedup: planted near-dups found, pigeonhole
candidate generation proven lossless vs brute force, real-decoder
round-trip, layout determinism, undecodable payloads dropped."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_hwk_spark.operators import multimodal as MM
from tests.conftest import SF_SMOKE


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _media(spark, n=70):
    docs = spark.createDataFrame(
        [(i, "") for i in range(n)], "doc_id bigint, text string"
    )
    return MM.synth_png_media(docs)


def test_dhash_roundtrip_stable_and_nudge_small(spark):
    """dhash64 over the module encoder's real PNGs: identical pixels give
    identical hashes; the planted one-pixel nudge moves ≤ 2 bits."""
    pa = MM._synth_png_pixels(2)
    pb = MM._synth_png_pixels(3)  # 3 % 7 == 3 -> nudged copy of seed 2
    assert pa != pb
    ha = MM.dhash64(MM.png_encode_gray(16, 16, pa))
    hb = MM.dhash64(MM.png_encode_gray(16, 16, pb))
    assert ha is not None and hb is not None
    assert bin((ha ^ hb) & ((1 << 64) - 1)).count("1") <= 2
    assert MM.dhash64(MM.png_encode_gray(16, 16, pa)) == ha


def test_phash_pairs_find_planted_near_dups(spark):
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in MM.image_phash_pairs(_media(spark)).collect()
    }
    planted = {(i - 1, i) for i in range(70) if i % 7 == 3}
    assert planted <= set(pairs)
    for p in planted:
        assert pairs[p] <= 2
    # unrelated sha256-stream images don't collide at Hamming <= 6
    assert set(pairs) == planted


def test_phash_banding_is_lossless_vs_brute_force(spark):
    """Pigeonhole exactness: the banded equi-join finds EXACTLY the pairs
    a brute-force Hamming scan finds."""
    fp = {
        r["media_id"]: r["dhash"]
        for r in MM.image_dhash(_media(spark, n=60)).collect()
    }
    brute = {
        (a, b): bin((fp[a] ^ fp[b]) & ((1 << 64) - 1)).count("1")
        for a in fp
        for b in fp
        if a < b
        and bin((fp[a] ^ fp[b]) & ((1 << 64) - 1)).count("1")
        <= MM.DHASH_MAX_HAMMING
    }
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in MM.image_phash_pairs(_media(spark, n=60)).collect()
    }
    assert got == brute


def test_phash_deterministic_across_layouts(spark):
    a = sorted(
        tuple(r) for r in MM.image_phash_pairs(_media(spark)).collect()
    )
    b = sorted(
        tuple(r)
        for r in MM.image_phash_pairs(_media(spark).repartition(9)).collect()
    )
    assert a == b


def test_undecodable_payloads_drop_out(spark):
    media = spark.createDataFrame(
        [(1, bytearray(b"not a png")), (2, bytearray(b""))],
        "media_id bigint, payload binary",
    )
    assert MM.image_dhash(media).collect() == []
    assert MM.image_phash_pairs(media).collect() == []


def test_phash_runs_on_fixture_docs(spark):
    """End-to-end over the fixture-derived synthetic PNG table: every
    planted pair present, nothing spurious (registry rows-only query)."""
    out = MM.image_phash_pairs(MM.synth_png_media(_docs(spark, SF_SMOKE)))
    n_docs = _docs(spark, SF_SMOKE).count()
    planted = {
        (i - 1, i)
        for i in range(n_docs)
        if i % 7 == 3  # doc_ids are 0..n-1 in the fixture
    }
    got = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert got == planted
