"""Audio content stats: encoder→decoder round-trip against an
independent Python reference, planted-clipping detection, layout
determinism, undecodable payloads dropped."""

from __future__ import annotations

from bigdata_hwk_spark.operators import multimodal as MM
from tests.conftest import SF_SMOKE


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _media(spark, n=40):
    docs = spark.createDataFrame(
        [(i, "") for i in range(n)], "doc_id bigint, text string"
    )
    return MM.synth_wav_media(docs)


def _reference_stats(media_id, n=MM.WAV_SAMPLES):
    xs = MM._synth_wav_samples(media_id, n)
    return (
        MM.WAV_RATE,
        len(xs),
        sum(v * v for v in xs),
        max(abs(v) for v in xs),
        sum(1 for v in xs if abs(v) >= MM.CLIP_ABS),
    )


def test_audio_stats_match_python_reference(spark):
    """End-to-end WAV encode → Spark decode map → integer stats equals
    the sample-level reference computed WITHOUT the WAV round-trip —
    proving the container encode/decode is lossless and the stats
    exact."""
    got = {
        r["media_id"]: (
            r["sample_rate"],
            r["n_samples"],
            r["sum_sq"],
            r["max_abs"],
            r["clip_count"],
        )
        for r in MM.audio_pcm_stats(_media(spark)).collect()
    }
    assert set(got) == set(range(40))
    for i in range(40):
        assert got[i] == _reference_stats(i), i


def test_audio_planted_clipping_detected(spark):
    rows = {
        r["media_id"]: r
        for r in MM.audio_pcm_stats(_media(spark)).collect()
    }
    for i in range(40):
        if i % 5 == 0:
            assert rows[i]["clip_count"] == 16
            assert rows[i]["max_abs"] == 32768
        else:
            assert rows[i]["clip_count"] == 0
            assert rows[i]["max_abs"] < MM.CLIP_ABS


def test_audio_stats_deterministic_across_layouts(spark):
    a = sorted(tuple(r) for r in MM.audio_pcm_stats(_media(spark)).collect())
    b = sorted(
        tuple(r)
        for r in MM.audio_pcm_stats(_media(spark).repartition(9)).collect()
    )
    assert a == b


def test_audio_undecodable_payloads_drop(spark):
    media = spark.createDataFrame(
        [(1, bytearray(b"RIFFgarbage")), (2, bytearray(b""))],
        "media_id bigint, payload binary",
    )
    assert MM.audio_pcm_stats(media).collect() == []


def test_audio_runs_on_fixture_docs(spark):
    out = MM.audio_pcm_stats(MM.synth_wav_media(_docs(spark, SF_SMOKE)))
    n_docs = _docs(spark, SF_SMOKE).count()
    rows = out.collect()
    assert len(rows) == n_docs
    assert all(r["n_samples"] == MM.WAV_SAMPLES for r in rows)
    assert all(r["sample_rate"] == MM.WAV_RATE for r in rows)
