"""User-defined palettes through the device pipeline.

The reference accepts any scheme built with the public constructors
(colorscheme.rs:24-39) and uploads any scheme's lookup_table to the GPU
(gpu_spectrogram.rs:232-239).  Parity here: `SpectrogramPipeline(schemes=…)`
accepts ColorScheme (custom gradients included) and FactoredScheme
(arbitrary separable LUTs); both must produce correct rows through the
fused Pallas path, not just the XLA fallback."""

import numpy as np
import pytest
import jax.numpy as jnp

from spectrogram_tpu.color.colorscheme import (
    DEFAULT_COLOR_SCHEMES,
    ColorScheme,
    FactoredScheme,
)
from spectrogram_tpu.config import SpectrogramConfig
from spectrogram_tpu.models.spectrogram import SpectrogramPipeline
from spectrogram_tpu.ops.pallas import colormap_kernel as ck

CFG = SpectrogramConfig(
    sample_rate=8000.0, window_period=0.032, hop_period=0.008,
    viewport_height=128,
)


def _amber(t):
    """A custom vectorized gradient: black -> amber -> white."""
    t = np.clip(np.asarray(t, dtype=np.float64), 0.0, 1.0)
    r = np.minimum(1.0, 1.6 * t)
    g = np.clip(1.4 * t - 0.2, 0.0, 1.0)
    b = np.clip(2.5 * t - 1.5, 0.0, 1.0)
    return np.stack([r, g, b], axis=-1)


CUSTOM_MONO = ColorScheme("Amber (custom)", "", gradient_fn=_amber)
CUSTOM_STEREO = ColorScheme(
    "Amber (custom stereo)", "", background=(10, 0, 30), gradient_fn=_amber
)


def _nonseparable_builtin_scheme():
    """A FactoredScheme OUTSIDE the built-in structure: rgb varies along the
    magnitude axis AND alpha varies along the pan axis."""
    res = 32
    i = np.arange(res) / (res - 1)
    u = np.ones((res, 4), np.float32)
    v = np.ones((res, 4), np.float32)
    u[:, :3] = _amber(i).astype(np.float32)     # rgb = f(mag)
    v[:, 3] = (0.25 + 0.75 * i).astype(np.float32)  # alpha = g(pan): not builtin
    return FactoredScheme("MagColor-PanAlpha", u, v, background=(0, 0, 0))


def _pipes(schemes, chunk_hops=1):
    """(pallas, xla) pipelines over the same scheme registry."""
    kw = dict(chunk_hops=chunk_hops, viewport_rows=8, schemes=schemes)
    pallas = SpectrogramPipeline(
        CFG, colormap_backend="pallas", kernel_interpret=True,
        stft_backend="xla", **kw,
    )
    xla = SpectrogramPipeline(
        CFG, colormap_backend="xla", stft_backend="xla", **kw,
    )
    return pallas, xla


def _compare(pallas, xla, rng, n=4, pid=None):
    pcm = jnp.asarray(
        rng.standard_normal((n, 4 * pallas.chunk_size, 2)).astype(np.float32)
        * 0.3
    )
    pid = len(pallas.schemes) - 1 if pid is None else pid
    out_p = np.asarray(pallas.process(pcm, palette_id=pid))
    out_x = np.asarray(xla.process(pcm, palette_id=pid))
    diff = np.abs(out_p.astype(int) - out_x.astype(int))
    assert diff.max() <= 1, diff.max()
    return out_p


def test_custom_gradient_scheme_rides_builtin_kernel(rng):
    """A 20th scheme from a user gradient_fn still fits the specialized
    kernel (structural detection) and matches the XLA path."""
    schemes = DEFAULT_COLOR_SCHEMES + (CUSTOM_MONO,)
    pallas, xla = _pipes(schemes)
    assert pallas.builtin_tables is not None          # detected as builtin
    assert pallas.builtin_tables.shape[0] == 20
    out = _compare(pallas, xla, rng)
    assert out[..., 3].min() == 255                   # mono: alpha = 1


def test_custom_stereo_scheme(rng):
    schemes = DEFAULT_COLOR_SCHEMES + (CUSTOM_STEREO,)
    pallas, xla = _pipes(schemes)
    assert pallas.builtin_tables is not None
    _compare(pallas, xla, rng)
    # background flows into composite
    np.testing.assert_array_equal(
        np.asarray(pallas.backgrounds[-1]), [10, 0, 30]
    )


def test_factored_scheme_takes_generic_kernel(rng):
    """A scheme outside the built-in mono/stereo structure routes the
    registry through the generic two-table kernel and still matches the
    XLA factored-LUT path."""
    schemes = DEFAULT_COLOR_SCHEMES + (_nonseparable_builtin_scheme(),)
    pallas, xla = _pipes(schemes)
    assert pallas.builtin_tables is None              # generic path engaged
    assert pallas.generic_tables is not None
    _compare(pallas, xla, rng)
    # built-ins still correct through the generic kernel (mixed batch)
    _compare(pallas, xla, rng, pid=2)


def test_factored_scheme_fused_chain(rng):
    """Generic tables through the FUSED Pallas chain (stft kernel ->
    banded/dense colormap) with chunk_hops > 1 — the production path a
    custom-palette deployment would run."""
    schemes = (CUSTOM_MONO, _nonseparable_builtin_scheme())
    kw = dict(chunk_hops=2, viewport_rows=8, schemes=schemes, store_ring=False)
    fused = SpectrogramPipeline(
        CFG, stft_backend="pallas", colormap_backend="pallas",
        kernel_interpret=True, **kw,
    )
    xla = SpectrogramPipeline(
        CFG, stft_backend="xla", colormap_backend="xla", **kw,
    )
    assert fused.builtin_tables is None
    s_f = fused.init_state(3, palette_id=1)
    s_x = xla.init_state(3, palette_id=1)
    chunk = jnp.asarray(
        rng.standard_normal((3, fused.chunk_size, 2)).astype(np.float32) * 0.3
    )
    for _ in range(3):
        s_f, rows_f = fused.push(s_f, chunk)
        s_x, rows_x = xla.push(s_x, chunk)
    diff = np.abs(
        np.asarray(rows_f).astype(int) - np.asarray(rows_x).astype(int)
    )
    assert diff.max() <= 1


def test_builtin_structure_detection():
    res = 32
    for s in DEFAULT_COLOR_SCHEMES + (CUSTOM_MONO, CUSTOM_STEREO):
        u, v = s.factored_tables(res)
        assert ck._builtin_table_row(u, v, res) is not None, s.name
    gu, gv = _nonseparable_builtin_scheme().factored_tables(res)
    assert ck._builtin_table_row(gu, gv, res) is None
    with pytest.raises(ValueError, match="structure"):
        ck.builtin_color_tables(
            res, (DEFAULT_COLOR_SCHEMES[0], _nonseparable_builtin_scheme())
        )


def test_factored_scheme_validation():
    with pytest.raises(ValueError, match="res"):
        # table resolution must match the pipeline's LUT resolution
        bad = FactoredScheme(
            "tiny", np.ones((8, 4), np.float32), np.ones((8, 4), np.float32)
        )
        bad.factored_tables(32)
    with pytest.raises(ValueError, match="4"):
        FactoredScheme(
            "misshapen", np.ones((32, 3), np.float32),
            np.ones((32, 3), np.float32),
        )
    s = _nonseparable_builtin_scheme()
    assert s.is_stereo                      # v varies along pan
    lut = s.lookup_table(32)
    u, v = s.factored_tables(32)
    np.testing.assert_allclose(lut, u[:, None, :] * v[None, :, :])


def test_static_palette_generic_scheme(rng):
    """static_palette works for a registry containing a FactoredScheme
    outside the built-in structure (the static GENERIC kernel: both LUT
    factor rows baked as compile-time scalars), matching the dynamic
    per-row generic path byte for byte."""
    schemes = DEFAULT_COLOR_SCHEMES + (_nonseparable_builtin_scheme(),)
    pid = len(schemes) - 1
    kw = dict(chunk_hops=2, viewport_rows=8, schemes=schemes,
              store_ring=False, packed_output=True, colormap_backend="pallas",
              kernel_interpret=True)
    dyn = SpectrogramPipeline(CFG, **kw)
    st = SpectrogramPipeline(CFG, static_palette=pid, **kw)
    assert dyn.builtin_tables is None
    assert isinstance(st.static_table, tuple) and len(st.static_table) == 2
    chunk = jnp.asarray(
        rng.standard_normal((2, dyn.chunk_size, 2)).astype(np.float32) * 0.3
    )
    s_d = dyn.init_state(2, palette_id=pid)
    s_s = st.init_state(2)
    _, out_d = dyn.push(s_d, chunk)
    _, out_s = st.push(s_s, chunk)
    np.testing.assert_array_equal(np.asarray(out_d), np.asarray(out_s))


def test_uniform_generic_palette_matches_per_stream(rng):
    """Scalar set_palette on a GENERIC (user FactoredScheme) registry takes
    the uniform two-table SMEM kernel; bitwise vs per-stream."""
    import jax
    import jax.numpy as jnp

    from spectrogram_tpu.color.colorscheme import DEFAULT_COLOR_SCHEMES

    schemes = (_nonseparable_builtin_scheme(),) + tuple(DEFAULT_COLOR_SCHEMES[:2])
    p = SpectrogramPipeline(CFG, chunk_hops=2, packed_output=True,
                            stft_backend="pallas", colormap_backend="pallas",
                            kernel_interpret=True, schemes=schemes)
    assert p.generic_tables is not None
    s_uni = p.set_palette(p.init_state(2), 1)
    assert len(s_uni.tables) == 2 and s_uni.tables[0].shape[0] == 1
    s_per = p.set_palette(p.init_state(2), jnp.asarray([1, 1]))
    chunk = jnp.asarray(
        rng.standard_normal((2, p.chunk_size, 2)).astype(np.float32) * 0.2
    )
    s_uni, out_u = p.push(s_uni, chunk)
    s_per, out_p = p.push(s_per, chunk)
    np.testing.assert_array_equal(np.asarray(out_u), np.asarray(out_p))
