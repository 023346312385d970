"""Fused Pallas STFT kernel vs the golden model (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from spectrogram_tpu.config import SpectrogramConfig
from spectrogram_tpu.ops import stft
from spectrogram_tpu.ops.pallas import stft_kernel

CFG = SpectrogramConfig(sample_rate=8000.0, window_period=0.032, hop_period=0.008)
# W=256, plan should factor 512


def test_fused_stft_matches_golden(rng):
    n = 8
    w = CFG.window_size
    pcm = (rng.standard_normal((n, w, 2)) * 0.3).astype(np.float32)
    golden = np.asarray(stft.stft_frame_planar(jnp.asarray(pcm), CFG))  # [n,2,B]
    mag_l, mag_r = stft_kernel.stft_mag_fused(
        jnp.asarray(pcm[:, :, 0]),
        jnp.asarray(pcm[:, :, 1]),
        CFG,
        block_rows=4,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(mag_l), golden[:, 0], atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(mag_r), golden[:, 1], atol=3e-5, rtol=1e-4)


def test_fused_stft_pads_ragged(rng):
    n = 5
    w = CFG.window_size
    pcm = (rng.standard_normal((n, w, 2)) * 0.2).astype(np.float32)
    golden = np.asarray(stft.stft_frame_planar(jnp.asarray(pcm), CFG))
    mag_l, _ = stft_kernel.stft_mag_fused(
        jnp.asarray(pcm[:, :, 0]),
        jnp.asarray(pcm[:, :, 1]),
        CFG,
        block_rows=4,
        interpret=True,
    )
    assert mag_l.shape == (n, CFG.num_bins)
    np.testing.assert_allclose(np.asarray(mag_l), golden[:, 0], atol=3e-5, rtol=1e-4)


def test_fused2_stft_matches_golden(rng):
    n = 8
    w = CFG.window_size
    pcm = (rng.standard_normal((n, w, 2)) * 0.3).astype(np.float32)
    golden = np.asarray(stft.stft_frame_planar(jnp.asarray(pcm), CFG))
    mag_l, mag_r = stft_kernel.stft_mag_fused2(
        jnp.asarray(pcm[:, :, 0]),
        jnp.asarray(pcm[:, :, 1]),
        CFG,
        block_rows=4,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(mag_l), golden[:, 0], atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(mag_r), golden[:, 1], atol=3e-5, rtol=1e-4)
