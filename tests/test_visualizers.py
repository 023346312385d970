"""Oscilloscope and spectrum-analyzer model tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from spectrogram_tpu.color.colorscheme import scheme_by_name
from spectrogram_tpu.config import SpectrogramConfig
from spectrogram_tpu.models.oscilloscope import Oscilloscope
from spectrogram_tpu.models.spectrum_analyzer import SpectrumAnalyzer
from spectrogram_tpu.ops import stft as stft_ops

CFG = SpectrogramConfig(
    sample_rate=8000.0, window_period=0.032, hop_period=0.008
)


def test_scope_push_and_envelope():
    scope = Oscilloscope(push_size=64, buffer_size=256)
    s = scope.init_state(2)
    ramp = np.linspace(-1, 1, 64, dtype=np.float32)
    chunk = np.stack(
        [np.stack([ramp, -ramp], -1), np.stack([ramp * 0.5, ramp * 0.0], -1)]
    )
    s = scope.push(s, jnp.asarray(chunk))
    assert int(s.cursor) == 64
    env = np.asarray(scope.envelope(s, width=8))
    assert env.shape == (2, 8, 2, 2)
    # chronological: cursor=64, so columns 0..5 are the (zero) unwritten tail,
    # columns 6..7 hold the ramp
    np.testing.assert_allclose(env[:, :6], 0.0)
    assert env[0, 6, 0, 0] == pytest.approx(-1.0)   # left min of first half
    assert env[0, 7, 0, 1] == pytest.approx(1.0)    # left max of second half
    assert env[0, 6, 1, 1] == pytest.approx(1.0)    # right = -ramp
    # wrap: 3 more pushes fills the ring; cursor returns to 0
    for _ in range(3):
        s = scope.push(s, jnp.asarray(chunk))
    assert int(s.cursor) == 0


def test_scope_validation():
    # buffer rounds up to a push_size multiple
    assert Oscilloscope(push_size=100, buffer_size=256).buffer_size == 300
    scope = Oscilloscope(push_size=64, buffer_size=256)
    with pytest.raises(ValueError):
        scope.envelope(scope.init_state(1), width=7)


def test_scope_line_colors():
    scheme = scheme_by_name("Blue-Yellow-Red (Stereo)")
    left, right = Oscilloscope.line_colors(scheme)
    assert not np.array_equal(left, right)


def test_analyzer_tone_hits_expected_band(rng):
    ana = SpectrumAnalyzer(CFG, n_bands=64)
    w = CFG.window_size
    t = np.arange(w) / CFG.sample_rate
    tone = (0.5 * np.sin(2 * np.pi * 1000.0 * t)).astype(np.float32)
    pcm = np.stack([tone, tone], axis=-1)
    rows = stft_ops.stft_rows(jnp.asarray(pcm[None]), CFG)  # [1, 1, B, 2]
    levels = ana.init_levels(1)
    levels = np.asarray(ana.push_rows(levels, rows))
    assert levels.shape == (1, 64)
    # the peak band should correspond to ~1000 Hz on the log axis
    from spectrogram_tpu.ops.resample import log_space_edges

    edges = log_space_edges(32.0, max(CFG.sample_rate / 2, 22050.0), 64)
    peak = int(np.argmax(levels[0]))
    assert edges[peak] <= 1000.0 <= edges[peak + 2]  # within a band of slack


def test_analyzer_peak_decay():
    """Silence decays levels by 0.99 per row (spectrum_analyzer.rs:67)."""
    ana = SpectrumAnalyzer(CFG, n_bands=16)
    levels = jnp.full((1, 16), 0.8, jnp.float32)
    silent_rows = jnp.zeros((1, 3, CFG.num_bins, 2), jnp.float32)
    out = np.asarray(ana.push_rows(levels, silent_rows))
    # silence maps to 10*log10(1e-7) = -70 dB -> 0 after normalization;
    # decay applies once per row: 0.8 * 0.99^3
    np.testing.assert_allclose(out, 0.8 * 0.99**3, rtol=1e-5)


def test_analyzer_rows_order_matters_like_sequential():
    """Batch push of k rows == k sequential pushes (scan ordering)."""
    rng = np.random.default_rng(3)
    ana = SpectrumAnalyzer(CFG, n_bands=16)
    rows = jnp.asarray(rng.random((2, 4, CFG.num_bins, 2)).astype(np.float32) * 0.1)
    batched = np.asarray(ana.push_rows(ana.init_levels(2), rows))
    seq = ana.init_levels(2)
    for k in range(4):
        seq = ana.push_rows(seq, rows[:, k : k + 1])
    np.testing.assert_allclose(batched, np.asarray(seq), rtol=1e-5, atol=1e-6)
