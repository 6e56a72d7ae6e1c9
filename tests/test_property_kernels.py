"""Hypothesis property pins for the pure-Python kernels that anchor the
distributed operators: BPE train/encode, PNG and WAV codec round-trips,
and the dHash locality bound. All driver-side (no Spark session), so
hundreds of randomized examples run in seconds."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from bigdata_hwk_spark.operators import bpe
from bigdata_hwk_spark.operators import multimodal as MM

_words = st.text(
    alphabet=st.characters(min_codepoint=97, max_codepoint=110),
    min_size=1,
    max_size=8,
)


@settings(max_examples=200, deadline=None)
@given(
    freqs=st.dictionaries(_words, st.integers(1, 50), min_size=1, max_size=25),
    n_merges=st.integers(0, 10),
)
def test_bpe_reference_trainer_invariants(freqs, n_merges):
    merges = bpe.bpe_train_reference(freqs, n_merges=n_merges, min_count=1)
    assert len(merges) <= n_merges
    ranks = [m[0] for m in merges]
    assert ranks == list(range(1, len(merges) + 1))
    counts = [m[4] for m in merges]
    # greedy argmax: best-pair support never increases round-over-round
    assert counts == sorted(counts, reverse=True)
    for _, l, r, merged, c in merges:
        assert merged == l + r and c >= 1
    # determinism: same histogram -> identical table
    assert merges == bpe.bpe_train_reference(
        freqs, n_merges=n_merges, min_count=1
    )


@settings(max_examples=200, deadline=None)
@given(
    freqs=st.dictionaries(_words, st.integers(1, 50), min_size=1, max_size=25),
    n_merges=st.integers(0, 10),
)
def test_bpe_encode_conserves_text(freqs, n_merges):
    """Tokenization must be a PARTITION of the word: concatenating the
    encoded tokens reproduces the input exactly, for any learned merge
    table and any word (including words unseen during training)."""
    merges = bpe.bpe_train_reference(freqs, n_merges=n_merges, min_count=1)
    for w in list(freqs) + ["zzzz", "a"]:
        toks = bpe.bpe_apply_reference(w, merges)
        assert "".join(toks) == w
        assert all(toks)


@settings(max_examples=100, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 20),
    data=st.data(),
)
def test_png_gray_roundtrip(w, h, data):
    pixels = bytes(
        data.draw(
            st.lists(
                st.integers(0, 255), min_size=w * h, max_size=w * h
            )
        )
    )
    decoded_w, decoded_h, raw = MM._png_decode(
        MM.png_encode_gray(w, h, pixels)
    )
    assert (decoded_w, decoded_h) == (w, h)
    assert raw == pixels


@settings(max_examples=100, deadline=None)
@given(
    samples=st.lists(
        st.integers(-32768, 32767), min_size=1, max_size=512
    ),
    rate=st.sampled_from([8000, 16000, 44100]),
)
def test_wav_pcm16_roundtrip(samples, rate):
    import io
    import struct
    import wave

    payload = MM.wav_encode_pcm16(rate, samples)
    with wave.open(io.BytesIO(payload), "rb") as r:
        assert r.getframerate() == rate
        assert r.getnchannels() == 1 and r.getsampwidth() == 2
        raw = r.readframes(r.getnframes())
    assert list(struct.unpack(f"<{len(samples)}h", raw)) == samples


@settings(max_examples=60, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    x=st.integers(0, 15),
    y=st.integers(0, 15),
    delta=st.integers(1, 255),
)
def test_dhash_single_pixel_locality(seed, x, y, delta):
    """On a 16×16 image every pixel backs at most one 9×8 grid point, and
    a grid point enters at most two adjacent comparisons — so ANY
    single-pixel change moves the dHash by at most 2 bits (the bound the
    planted-near-dup fixture relies on)."""
    base = bytearray(MM._synth_png_pixels(int(seed)))
    ha = MM.dhash64(MM.png_encode_gray(16, 16, bytes(base)))
    mod = bytearray(base)
    mod[y * 16 + x] = (mod[y * 16 + x] + delta) % 256
    hb = MM.dhash64(MM.png_encode_gray(16, 16, bytes(mod)))
    assert ha is not None and hb is not None
    assert bin((ha ^ hb) & ((1 << 64) - 1)).count("1") <= 2
