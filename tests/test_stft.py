"""STFT numerical-contract tests.

The authority here is an independent numpy transcription of the Rust pipeline
(reference src/fourier/fft.rs:43-99), written directly from the source, plus
cross-checks against plain real FFTs (the conjugate-symmetry unpack of the
stereo-packed transform must equal per-channel real FFT magnitudes exactly in
exact arithmetic).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from spectrogram_tpu.config import SpectrogramConfig
from spectrogram_tpu.ops import stft


def rust_fft_process(samples_lr: np.ndarray, window_size: int) -> np.ndarray:
    """Line-by-line numpy transcription of FastFourierTransform::process
    (fft.rs:43-99) for one window.  samples_lr: [W, 2] f32."""
    w = window_size
    n = 2 * w
    l, r = samples_lr[:, 0].astype(np.float64), samples_lr[:, 1].astype(np.float64)
    z = l + 1j * r
    i = np.arange(w)
    hann = 0.5 * (1.0 - np.cos(2.0 * np.pi * i / w))  # fft.rs:60-63
    z = z * hann
    buf = np.zeros(n, dtype=np.complex128)
    buf[:w] = z  # fft.rs:65 pad
    x = np.fft.fft(buf)  # fft.rs:77
    a = x[1 : 1 + (w - 1)]  # skip(1).take(W-1), fft.rs:81
    b = x[::-1][: w - 1]  # rev().take(W-1), fft.rs:82
    left = np.abs(a + np.conj(b)) / 2.0  # fft.rs:85
    right = np.abs(a - np.conj(b)) / 2.0  # fft.rs:86
    scale = 2.0 / w  # fft.rs:92
    return np.stack([left, right], axis=-1) * scale


def test_matches_rust_transcription(rng):
    cfg = SpectrogramConfig(sample_rate=8000.0, window_period=0.016)  # W=128
    w = cfg.window_size
    pcm = rng.standard_normal((w, 2)).astype(np.float32)
    ours = np.asarray(stft.stft_frame(jnp.asarray(pcm), cfg))
    ref = rust_fft_process(pcm, w)
    assert ours.shape == (w - 1, 2)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-6)


def test_equals_per_channel_real_fft(rng):
    """The packed-complex trick must equal two independent real FFTs:
    |X_k + conj(X_{N-k})|/2 = |FFT(l*h)[k]|, |X_k - conj(X_{N-k})|/2 = |FFT(r*h)[k]|."""
    cfg = SpectrogramConfig(sample_rate=48000.0, window_period=512 / 48000.0)
    w, n = cfg.window_size, cfg.padded_size
    pcm = rng.standard_normal((w, 2)).astype(np.float32)
    ours = np.asarray(stft.stft_frame(jnp.asarray(pcm), cfg))
    hann = 0.5 * (1 - np.cos(2 * np.pi * np.arange(w) / w))
    for ch in range(2):
        spec = np.fft.rfft(pcm[:, ch] * hann, n)
        expected = np.abs(spec[1:w]) * 2.0 / w
        np.testing.assert_allclose(ours[:, ch], expected, rtol=2e-4, atol=2e-6)


def test_bin_frequencies_and_sine_peak():
    """A pure tone at an exact padded-FFT bin lands in the right output bin
    with amplitude ~its peak (Hann coherent gain = 0.5, scale 2/W, pad x2
    halves it again -> amplitude/2)."""
    cfg = SpectrogramConfig(sample_rate=48000.0, window_period=1024 / 48000.0)
    w, n = cfg.window_size, cfg.padded_size
    k = 100  # padded-FFT bin
    freq = k * cfg.sample_rate / n
    t = np.arange(w) / cfg.sample_rate
    tone = np.sin(2 * np.pi * freq * t).astype(np.float32)
    pcm = np.stack([tone, np.zeros_like(tone)], axis=-1)
    out = np.asarray(stft.stft_frame(jnp.asarray(pcm), cfg))
    j = int(np.argmax(out[:, 0]))
    assert j == k - 1  # output bin j maps to padded bin k = j+1
    assert out[j, 0] == pytest.approx(0.5, rel=1e-3)
    assert np.max(out[:, 1]) < 1e-4  # right channel silent


def test_stereo_separation():
    """Left-only and right-only tones at different bins separate cleanly."""
    cfg = SpectrogramConfig(sample_rate=48000.0, window_period=1024 / 48000.0)
    w, n = cfg.window_size, cfg.padded_size
    t = np.arange(w) / cfg.sample_rate
    fl = 64 * cfg.sample_rate / n
    fr = 200 * cfg.sample_rate / n
    pcm = np.stack(
        [np.sin(2 * np.pi * fl * t), np.cos(2 * np.pi * fr * t)], axis=-1
    ).astype(np.float32)
    out = np.asarray(stft.stft_frame(jnp.asarray(pcm), cfg))
    assert int(np.argmax(out[:, 0])) == 63
    assert int(np.argmax(out[:, 1])) == 199
    # cross-talk at the other tone's bin is tiny
    assert out[199, 0] < 1e-3
    assert out[63, 1] < 1e-3


def test_framing_peek_then_hop(rng):
    """Framing = window at i*hop for i in 0..n, n = (T - W)//hop + 1
    (audio_transform.rs:34-42 peek-window / skip-hop)."""
    cfg = SpectrogramConfig(
        sample_rate=1000.0, window_period=0.064, hop_period=0.017
    )  # W=64, hop=17
    w, h = cfg.window_size, cfg.hop_size
    assert (w, h) == (64, 17)
    t = 200
    pcm = rng.standard_normal((t, 2)).astype(np.float32)
    frames = np.asarray(stft.frame_signal(jnp.asarray(pcm), cfg))
    n = (t - w) // h + 1
    assert frames.shape == (n, w, 2)
    for i in range(n):
        np.testing.assert_array_equal(frames[i], pcm[i * h : i * h + w])
    # underfull input yields zero rows
    assert stft.num_rows(w - 1, cfg) == 0


def test_default_geometry_is_reference_geometry():
    cfg = SpectrogramConfig()
    assert cfg.window_size == 2400  # 0.05 s @ 48 kHz (gpu_spectrogram.rs:323)
    assert cfg.padded_size == 4800  # fft.rs:44
    assert cfg.num_bins == 2399  # fft.rs:33
    assert cfg.hop_size == 58  # 48000/819.2 truncated (audio_transform.rs:35)


def test_batched_over_streams(rng):
    cfg = SpectrogramConfig(sample_rate=4000.0, window_period=0.032, hop_period=0.008)
    pcm = rng.standard_normal((3, 300, 2)).astype(np.float32)
    batched = np.asarray(stft.stft_rows(jnp.asarray(pcm), cfg))
    for s in range(3):
        single = np.asarray(stft.stft_rows(jnp.asarray(pcm[s]), cfg))
        np.testing.assert_allclose(batched[s], single, rtol=1e-6, atol=1e-7)
