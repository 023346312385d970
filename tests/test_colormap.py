"""Colormap stage tests: the jnp implementation vs an independent numpy
transcription of the fragment shader (gpu_spectrogram.rs:150-190)."""

import numpy as np
import jax.numpy as jnp

from spectrogram_tpu.config import SpectrogramConfig
from spectrogram_tpu.color.colorscheme import scheme_by_name
from spectrogram_tpu.ops import colormap

CFG = SpectrogramConfig(sample_rate=8000.0, window_period=0.032, viewport_height=64)
# W=256, bins=255


def shader_reference(rows_lr: np.ndarray, lut: np.ndarray, cfg) -> np.ndarray:
    """Per-pixel numpy transcription of the GLSL fragment shader."""
    h = cfg.viewport_height
    b = cfg.num_bins
    r_lut = lut.shape[0]
    out = np.zeros((h, 4), dtype=np.float64)
    for py in range(h):
        uv_y = (py + 0.5) / h
        log_f = np.log(cfg.min_frequency) + uv_y * (
            np.log(cfg.max_frequency) - np.log(cfg.min_frequency)
        )
        mapped = np.exp(log_f) / cfg.max_frequency
        # bilinear fetch on the bin axis (clamp-to-edge, see resample_matrix)
        p = mapped * b - 0.5
        base = np.floor(p)
        w = p - base
        j0 = int(np.clip(base, 0, b - 1))
        j1 = int(np.clip(base + 1, 0, b - 1))
        l = rows_lr[j0, 0] * (1 - w) + rows_lr[j1, 0] * w
        r = rows_lr[j0, 1] * (1 - w) + rows_lr[j1, 1] * w
        power = l * l + r * r
        db = 10.0 * np.log10(power + 1e-7)
        mag = (db - cfg.min_db) / (cfg.max_db - cfg.min_db)
        pan = r / (l + r) if (l + r) != 0 else 0.5
        # clamped bilinear LUT sample at (x=pan, y=mag)
        def texpos(c):
            return np.clip(np.clip(c, 0.0, 1.0) * r_lut - 0.5, 0, r_lut - 1)
        py_l, px_l = texpos(mag), texpos(pan)
        y0, x0 = int(np.floor(py_l)), int(np.floor(px_l))
        y1, x1 = min(y0 + 1, r_lut - 1), min(x0 + 1, r_lut - 1)
        wy, wx = py_l - y0, px_l - x0
        top = lut[y0, x0] * (1 - wx) + lut[y0, x1] * wx
        bot = lut[y1, x0] * (1 - wx) + lut[y1, x1] * wx
        out[py] = top * (1 - wy) + bot * wy
    return out


def test_matches_shader_transcription(rng):
    lut = scheme_by_name("Blue-Yellow-Red (Stereo)").lookup_table(32)
    rows = (rng.random((CFG.num_bins, 2)) * 0.2).astype(np.float32)
    m = jnp.asarray(colormap.resample_matrix(CFG, shader_compat=True))
    ours = np.asarray(colormap.colormap_rows(jnp.asarray(rows), m, jnp.asarray(lut), CFG))
    ref = shader_reference(rows, lut, CFG)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_matches_shader_transcription_mono(rng):
    lut = scheme_by_name("Viridis").lookup_table(32)
    rows = (rng.random((CFG.num_bins, 2)) * 0.1).astype(np.float32)
    m = jnp.asarray(colormap.resample_matrix(CFG, shader_compat=True))
    ours = np.asarray(colormap.colormap_rows(jnp.asarray(rows), m, jnp.asarray(lut), CFG))
    ref = shader_reference(rows, lut, CFG)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_resample_matrix_properties():
    m = colormap.resample_matrix(CFG)
    _check_matrix(m)
    _check_matrix(colormap.resample_matrix(CFG, shader_compat=True))


def _check_matrix(m):
    assert m.shape == (CFG.viewport_height, CFG.num_bins)
    # partition of unity: each output pixel blends exactly two bins
    np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-6)
    assert np.count_nonzero(m, axis=1).max() <= 2
    # monotone frequency mapping
    centers = m @ np.arange(CFG.num_bins)
    assert np.all(np.diff(centers) >= -1e-6)


def test_silence_maps_to_floor():
    """Zero magnitudes: power = 0 -> db = 10*log10(1e-7) = -70 = min_db -> LUT row 0."""
    lut = scheme_by_name("Viridis").lookup_table(32)
    rows = np.zeros((CFG.num_bins, 2), dtype=np.float32)
    m = jnp.asarray(colormap.resample_matrix(CFG))
    out = np.asarray(colormap.colormap_rows(jnp.asarray(rows), m, jnp.asarray(lut), CFG))
    np.testing.assert_allclose(out, np.broadcast_to(lut[0, 0], out.shape), atol=1e-5)


def test_composite_and_u8():
    rgba = jnp.asarray(np.array([[[0.5, 0.25, 1.0, 0.5]]], dtype=np.float32))
    bg = jnp.asarray(np.array([0, 0, 0], dtype=np.uint8))
    rgb = np.asarray(colormap.composite_over_background(rgba, bg))
    np.testing.assert_array_equal(rgb[0, 0], [64, 32, 128])
    u8 = np.asarray(colormap.rgba_f32_to_u8(rgba))
    np.testing.assert_array_equal(u8[0, 0], [128, 64, 255, 128])


def test_batched_shapes(rng):
    lut = jnp.asarray(scheme_by_name("Magma").lookup_table(32))
    m = jnp.asarray(colormap.resample_matrix(CFG))
    rows = jnp.asarray(rng.random((4, 3, CFG.num_bins, 2)).astype(np.float32))
    out = colormap.colormap_rows(rows, m, lut, CFG)
    assert out.shape == (4, 3, CFG.viewport_height, 4)


def test_factored_lut_equals_bilinear(rng):
    """The rank-1 factorization must reproduce 2D bilinear sampling exactly
    (bilinear is separable; all default LUTs are outer products)."""
    import jax.numpy as jnp
    from spectrogram_tpu.color.colorscheme import DEFAULT_COLOR_SCHEMES

    pan = jnp.asarray(rng.random((50,)).astype(np.float32) * 1.4 - 0.2)  # incl. OOB
    mag = jnp.asarray(rng.random((50,)).astype(np.float32) * 1.4 - 0.2)
    for scheme in DEFAULT_COLOR_SCHEMES:
        lut = jnp.asarray(scheme.lookup_table(32))
        u, v = scheme.factored_tables(32)
        ref = np.asarray(colormap.sample_lut_bilinear(lut, pan, mag))
        fac = np.asarray(
            colormap.sample_lut_factored(jnp.asarray(u), jnp.asarray(v), pan, mag)
        )
        np.testing.assert_allclose(fac, ref, atol=2e-6, err_msg=scheme.name)


def test_factored_lut_batched_streams(rng):
    import jax.numpy as jnp
    from spectrogram_tpu.color.colorscheme import stacked_factored_tables

    u, v = stacked_factored_tables(32)
    pid = np.array([1, 3, 7])
    pan = jnp.asarray(rng.random((3, 5, 9)).astype(np.float32))
    mag = jnp.asarray(rng.random((3, 5, 9)).astype(np.float32))
    batched = np.asarray(
        colormap.sample_lut_factored(
            jnp.asarray(u[pid]), jnp.asarray(v[pid]), pan, mag
        )
    )
    for s in range(3):
        single = np.asarray(
            colormap.sample_lut_factored(
                jnp.asarray(u[pid[s]]), jnp.asarray(v[pid[s]]), pan[s], mag[s]
            )
        )
        np.testing.assert_allclose(batched[s], single, atol=1e-6)
