"""Golden model (CPU-path law) tests + band-matrix equivalence."""

import numpy as np
import pytest

from spectrogram_tpu.config import SpectrogramConfig
from spectrogram_tpu.models import golden
from spectrogram_tpu.ops import resample

CFG = SpectrogramConfig(
    sample_rate=8000.0, window_period=0.032, hop_period=0.008, viewport_height=64
)


def test_cubic_interpolate_exact_at_integers(rng):
    data = rng.standard_normal((20, 2))
    idx = np.arange(1, 19, dtype=np.float64)
    out = golden.cubic_interpolate(data, idx)
    np.testing.assert_allclose(out, data[1:19], atol=1e-12)


def test_cubic_interpolate_midpoint_matches_formula():
    data = np.array([[0.0], [1.0], [2.0], [3.0]])
    # linear data -> cubic reproduces linear interior values
    out = golden.cubic_interpolate(data, np.array([1.5]))
    assert out[0, 0] == pytest.approx(1.5)


def test_cosine_interpolate_endpoints():
    data = np.array([[0.0], [10.0], [4.0]])
    np.testing.assert_allclose(
        golden.cosine_interpolate(data, np.array([0.0, 1.0]))[:, 0], [0.0, 10.0]
    )
    # midpoint of cosine interp = average
    assert golden.cosine_interpolate(data, np.array([0.5]))[0, 0] == pytest.approx(5.0)


def test_band_matrix_equals_scalar_magnitude_in(rng):
    """ops.resample.cubic_band_matrix must reproduce the scalar
    InterpolatedFrequencySample.magnitude_in exactly."""
    mags = rng.standard_normal((CFG.num_bins, 2)) * 0.1
    sample = golden.InterpolatedFrequencySample(mags, CFG.sample_rate)
    edges = resample.log_space_edges(32.0, max(CFG.sample_rate / 2, 22050.0), 16)
    m = resample.cubic_band_matrix(edges, CFG.num_bins, CFG.sample_rate)
    via_matrix = m @ mags
    for band in range(16):
        scalar = sample.magnitude_in(edges[band], edges[band + 1])
        np.testing.assert_allclose(via_matrix[band], scalar, rtol=1e-4, atol=1e-6)


def test_golden_pixel_matrix_matches_render_spectrum(rng):
    """The [H, bins] golden pixel matrix reproduces the per-pixel band means
    of GoldenSpectrogram.render_spectrum's magnitude stage."""
    mags = np.abs(rng.standard_normal((CFG.num_bins, 2))) * 0.05
    m = resample.golden_pixel_matrix(CFG)
    via_matrix = m @ mags
    sample = golden.InterpolatedFrequencySample(mags, CFG.sample_rate)
    edges = golden.pixel_band_edges(CFG, CFG.viewport_height)
    for py in range(0, CFG.viewport_height, 7):
        scalar = sample.magnitude_in(edges[py], edges[py + 1])
        np.testing.assert_allclose(via_matrix[py], scalar, rtol=1e-4, atol=1e-6)


def test_golden_render_sine_peak():
    """A 440 Hz tone renders a bright band at the expected pixel row."""
    cfg = golden.default_golden_config(8000.0)
    cfg = SpectrogramConfig(
        sample_rate=8000.0,
        window_period=0.064,
        hop_period=0.032,
        viewport_height=128,
    )
    g = golden.GoldenSpectrogram(cfg)
    t = np.arange(int(0.3 * cfg.sample_rate)) / cfg.sample_rate
    tone = (0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
    pcm = np.stack([tone, tone], axis=-1)
    cols = g.render(pcm)
    assert cols.shape[1:] == (128, 4)
    # brightest row (alpha=1 for mono; use luminance) vs expected log position
    lum = cols[2, :, :3].astype(int).sum(axis=-1)
    peak_row = int(np.argmax(lum))
    import math
    expected = (
        (math.log(440.0) - math.log(cfg.min_frequency))
        / (math.log(cfg.max_frequency) - math.log(cfg.min_frequency))
        * 128
    )
    assert abs(peak_row - expected) <= 2


def test_golden_composite():
    g = golden.GoldenSpectrogram(CFG)
    rgba = np.zeros((2, 4, 4), np.uint8)
    rgba[..., 3] = 0  # fully transparent -> background
    out = g.composite(rgba)
    np.testing.assert_array_equal(out[0, 0], g.scheme.background_color())
