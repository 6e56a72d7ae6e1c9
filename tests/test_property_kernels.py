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


@settings(max_examples=200, deadline=None)
@given(
    freqs=st.dictionaries(_words, st.integers(1, 50), min_size=1, max_size=25),
    n_merges=st.integers(0, 30),
)
def test_bpe_incremental_trainer_equals_reference(freqs, n_merges):
    """The inverted-index + lazy-heap trainer is bit-identical to the
    full-rescan reference on arbitrary histograms — the equivalence the
    merge-count-safe path rests on (same argmax, same tie order, same
    greedy application, same min_count stop)."""
    assert bpe.bpe_train_incremental(
        freqs, n_merges=n_merges, min_count=1
    ) == bpe.bpe_train_reference(freqs, n_merges=n_merges, min_count=1)


@settings(max_examples=200, deadline=None)
@given(
    freqs=st.dictionaries(_words, st.integers(1, 50), min_size=1, max_size=25),
    n_merges=st.integers(0, 30),
)
def test_bpe_apply_batch_equals_reference_encoder(freqs, n_merges):
    """The shared-index batch encoder segments every word exactly as the
    per-word reference encoder does (rank-order semantics), including
    words unseen during training, and conserves the text."""
    merges = bpe.bpe_train_reference(freqs, n_merges=n_merges, min_count=1)
    words = sorted(freqs) + ["zzzz", "a"]
    segs = bpe.bpe_apply_batch(words, merges)
    for w, seg in zip(words, segs):
        assert seg == bpe.bpe_apply_reference(w, merges)
        assert "".join(seg) == w


# ---------------------------------------------------------------------------
# PQ codebook trainer pins (r9 verdict item 8)

import numpy as np

from bigdata_hwk_spark.operators import similarity as SIM


def _rand_matrix(seed: int, n: int, dim: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    m = rng.normal(size=(n, dim))
    return m / np.linalg.norm(m, axis=1, keepdims=True)


@settings(max_examples=50, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    n=st.integers(8, 64),
)
def test_pq_codebooks_deterministic(seed, n):
    """Same training matrix -> bit-identical codebooks (FFT seeding on
    sorted rows + fixed Lloyd iterations leaves no RNG anywhere)."""
    train = _rand_matrix(seed, n, 16)
    a = SIM.pq_train_books(train, m_sub=4, k_codes=4)
    b = SIM.pq_train_books(train.copy(), m_sub=4, k_codes=4)
    assert a.shape == (4, 4, 4)
    assert np.array_equal(a, b)


@settings(max_examples=50, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    qseed=st.integers(0, 10_000),
)
def test_pq_adc_exact_on_codebook_points(seed, qseed):
    """ADC distance is EXACT (not approximate) whenever the database
    vector coincides with its per-subspace centroids: for v built by
    concatenating codebook entries, sum_m ||q_m - c_code||^2 equals
    ||q - v||^2 to float precision — the anchor that separates a wrong
    LUT from honest quantization error."""
    train = _rand_matrix(seed, 32, 16)
    m_sub, k_codes, dsub = 4, 4, 4
    books = SIM.pq_train_books(train, m_sub=m_sub, k_codes=k_codes)
    rng = np.random.default_rng(qseed)
    codes = rng.integers(0, k_codes, size=m_sub)
    v = np.concatenate([books[m][codes[m]] for m in range(m_sub)])
    q = rng.normal(size=16)
    # encode v: argmin per subspace must recover the constructed codes
    # (ties -> lowest code, as the distributed encoder does)
    adc = 0.0
    for m in range(m_sub):
        qs = q[m * dsub : (m + 1) * dsub]
        vs = v[m * dsub : (m + 1) * dsub]
        d2 = ((books[m] - vs[None, :]) ** 2).sum(axis=1)
        code = int(np.argmin(d2))
        assert d2[code] < 1e-18  # v's subvector IS a centroid
        adc += float(((qs - books[m][code]) ** 2).sum())
    exact = float(((q - v) ** 2).sum())
    assert abs(adc - exact) < 1e-9


def test_pq_reconstruction_error_shrinks_with_codes():
    """More centroids per subspace -> lower quantization error on the
    training set (fixed seed; the bit-budget half of the recall sweep
    documented at the PQ constants)."""
    train = _rand_matrix(7, 256, 16)

    def mse(k_codes: int) -> float:
        books = SIM.pq_train_books(train, m_sub=4, k_codes=k_codes)
        err = 0.0
        for m in range(4):
            sub = train[:, m * 4 : (m + 1) * 4]
            d2 = ((sub[:, None, :] - books[m][None, :, :]) ** 2).sum(axis=2)
            err += float(d2.min(axis=1).sum())
        return err / len(train)

    errs = [mse(k) for k in (2, 4, 8, 16)]
    assert all(b <= a + 1e-12 for a, b in zip(errs, errs[1:]))
    assert errs[-1] < errs[0]
