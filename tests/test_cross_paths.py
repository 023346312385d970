"""Cross-path consistency: golden CPU-law model vs production pipeline.

The two paths use different resampling laws (cubic band-mean vs shader
bilinear) and different pan laws by design (DESIGN.md), so pixel values
differ — but physical content must agree: a tone must light the same
log-frequency row, silence must floor, and left/right separation must hold
in both.
"""

import math

import numpy as np
import jax.numpy as jnp

from spectrogram_tpu.config import SpectrogramConfig
from spectrogram_tpu.models.golden import GoldenSpectrogram
from spectrogram_tpu.models.spectrogram import SpectrogramPipeline

CFG = SpectrogramConfig(
    sample_rate=16_000.0,
    window_period=0.064,      # W=1024
    hop_period=0.032,
    viewport_height=128,
)


def tone(freq, seconds=0.4, amp=0.5):
    t = np.arange(int(seconds * CFG.sample_rate)) / CFG.sample_rate
    x = (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)
    return np.stack([x, x], axis=-1)


def expected_row(freq):
    lo, hi = math.log(CFG.min_frequency), math.log(CFG.max_frequency)
    return (math.log(freq) - lo) / (hi - lo) * CFG.viewport_height


def production_peak_row(pcm):
    p = SpectrogramPipeline(CFG, store_ring=False)
    rgba = np.asarray(p.process(jnp.asarray(pcm), palette_id=2))  # viridis
    lum = rgba[rgba.shape[0] // 2, :, :3].astype(int).sum(axis=-1)
    return int(np.argmax(lum))


def golden_peak_row(pcm):
    g = GoldenSpectrogram(CFG)
    cols = g.render(pcm[: CFG.window_size + CFG.hop_size])
    lum = cols[0, :, :3].astype(int).sum(axis=-1)
    return int(np.argmax(lum))


def test_tone_peak_rows_agree():
    for freq in [220.0, 1000.0, 4000.0]:
        pcm = tone(freq)
        prod = production_peak_row(pcm)
        gold = golden_peak_row(pcm)
        exp = expected_row(freq)
        assert abs(prod - exp) <= 2, (freq, prod, exp)
        assert abs(gold - exp) <= 2, (freq, gold, exp)
        assert abs(prod - gold) <= 2, (freq, prod, gold)


def test_stereo_separation_both_paths():
    t = np.arange(int(0.3 * CFG.sample_rate)) / CFG.sample_rate
    pcm = np.stack(
        [0.5 * np.sin(2 * np.pi * 500.0 * t), np.zeros_like(t)], axis=-1
    ).astype(np.float32)
    # production, stereo palette 0: left-only -> pan=0 -> LUT right edge color
    p = SpectrogramPipeline(CFG, store_ring=False)
    rgba = np.asarray(p.process(jnp.asarray(pcm), palette_id=0))
    row = int(round(expected_row(500.0)))
    peak_px = rgba[rgba.shape[0] // 2, row]
    # golden path at same frequency band
    g = GoldenSpectrogram(CFG)
    from spectrogram_tpu.color.colorscheme import DEFAULT_COLOR_SCHEMES

    g.scheme = DEFAULT_COLOR_SCHEMES[0]
    cols = g.render(pcm[: CFG.window_size + 1])
    gold_px = cols[0, row]
    # both must be strongly alpha'd (tone present) at the tone row
    assert peak_px[3] > 100
    assert gold_px[3] > 100
    # and both must show the left-channel extreme hue (red-ish for RdYlBu
    # reversed pan in production; the golden path uses l/(|l|+|r|)=1 -> the
    # gradient's 1.0 end)
    assert peak_px[0] != peak_px[2]  # not gray
    assert gold_px[0] != gold_px[2]


def test_structural_similarity_golden_vs_production():
    """A music-like signal (chord + sweep) renders structurally similar
    luminance maps through both laws — the automated replacement for the
    reference's screenshot eyeballing (SURVEY.md §4c)."""
    fs = CFG.sample_rate
    t = np.arange(int(0.5 * fs)) / fs
    sweep = np.sin(2 * np.pi * (200 + 1500 * t / t[-1]) * t)
    chord = sum(np.sin(2 * np.pi * f * t) for f in (330.0, 440.0, 550.0))
    x = (0.3 * sweep + 0.15 * chord).astype(np.float32)
    pcm = np.stack([x, x], axis=-1)

    p = SpectrogramPipeline(CFG, store_ring=False)
    prod = np.asarray(p.process(jnp.asarray(pcm), palette_id=2))
    prod_lum = prod[..., :3].astype(np.float64).sum(-1)  # [rows, H]

    g = GoldenSpectrogram(CFG)
    n_cols = 4
    cols = g.render(pcm[: CFG.window_size + (n_cols - 1) * CFG.hop_size + 1])
    gold_lum = cols[..., :3].astype(np.float64).sum(-1)  # [cols, H]

    # compare per-row luminance profiles at matching times
    for i in range(n_cols):
        a = prod_lum[i] - prod_lum[i].mean()
        b = gold_lum[i] - gold_lum[i].mean()
        corr = (a * b).sum() / np.sqrt((a * a).sum() * (b * b).sum())
        assert corr > 0.8, (i, corr)
