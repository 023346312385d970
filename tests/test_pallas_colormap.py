"""Fused Pallas colormap kernel vs the XLA-composed path (interpret mode on
the CPU backend; the real-hardware run is exercised by bench/verify)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from spectrogram_tpu.config import SpectrogramConfig
from spectrogram_tpu.color.colorscheme import stacked_factored_tables
from spectrogram_tpu.ops import colormap as cm
from spectrogram_tpu.ops.pallas import colormap_kernel as ck

CFG = SpectrogramConfig(
    sample_rate=8000.0, window_period=0.032, hop_period=0.008, viewport_height=128
)


def reference_path(rows_planar, u_sel, v_sel, mat):
    rows = jnp.moveaxis(rows_planar, -2, -1)  # planar -> interleaved
    pixels = cm.resample_rows(rows, mat)
    mag = cm.db_normalize(pixels[..., 0], pixels[..., 1], CFG)
    pan = cm.pan_fraction(pixels[..., 0], pixels[..., 1])
    rgba = cm.sample_lut_factored(u_sel, v_sel, pan, mag)
    return np.asarray(cm.rgba_f32_to_u8(rgba))


def run_fused(rows, u_sel, v_sel, mat_t, **kw):
    return np.asarray(
        ck.colormap_rows_fused(
            rows, u_sel, v_sel, mat_t, CFG, interpret=True, **kw
        )
    )


def test_fused_matches_reference(rng):
    n = 8
    u, v = stacked_factored_tables(32)
    pid = rng.integers(0, 19, n)
    rows = jnp.asarray(rng.random((n, 2, CFG.num_bins)).astype(np.float32) * 0.1)
    mat = jnp.asarray(cm.resample_matrix(CFG))
    u_sel = jnp.asarray(u[pid])
    v_sel = jnp.asarray(v[pid])
    ref = reference_path(rows, u_sel, v_sel, mat)
    out = run_fused(rows, u_sel, v_sel, mat.T, block_rows=8, block_cols=64)
    assert out.shape == ref.shape == (n, CFG.viewport_height, 4)
    # u8 after identical math: allow off-by-one from fp association order
    diff = np.abs(out.astype(int) - ref.astype(int))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.01


def test_fused_pads_ragged_shapes(rng):
    n = 5  # not a multiple of the block
    u, v = stacked_factored_tables(32)
    pid = np.ones(n, np.int64)
    rows = jnp.asarray(rng.random((n, 2, CFG.num_bins)).astype(np.float32) * 0.05)
    mat = jnp.asarray(cm.resample_matrix(CFG))
    ref = reference_path(rows, jnp.asarray(u[pid]), jnp.asarray(v[pid]), mat)
    out = run_fused(
        rows, jnp.asarray(u[pid]), jnp.asarray(v[pid]), mat.T,
        block_rows=4, block_cols=128,
    )
    diff = np.abs(out.astype(int) - ref.astype(int))
    assert diff.max() <= 1


def test_fused_silence_floor():
    n = 4
    u, v = stacked_factored_tables(32)
    pid = np.full(n, 2)  # Viridis
    rows = jnp.zeros((n, 2, CFG.num_bins), jnp.float32)
    mat = jnp.asarray(cm.resample_matrix(CFG))
    out = run_fused(
        rows, jnp.asarray(u[pid]), jnp.asarray(v[pid]), mat.T,
        block_rows=4, block_cols=128,
    )
    expected = np.round(np.array([68, 1, 84]) / 256.0 * 255.0)
    np.testing.assert_array_equal(out[..., :3], np.broadcast_to(expected, out[..., :3].shape))
    np.testing.assert_array_equal(out[..., 3], 255)


def test_builtin_kernel_matches_generic(rng):
    """The specialized builtin-palette kernel must equal the generic factored
    path for every default scheme (their LUTs all have the exploited
    structure)."""
    n = 19
    u, v = stacked_factored_tables(32)
    pid = np.arange(19)
    rows = jnp.asarray(rng.random((n, 2, CFG.num_bins)).astype(np.float32) * 0.1)
    mat = jnp.asarray(cm.resample_matrix(CFG))
    ref = reference_path(rows, jnp.asarray(u[pid]), jnp.asarray(v[pid]), mat)
    tabs = jnp.asarray(ck.builtin_color_tables(32)[pid])
    packed = np.asarray(
        ck.colormap_rows_builtin(
            rows, tabs, jnp.asarray(mat.T), CFG,
            block_rows=19, block_cols=64, interpret=True,
        )
    )
    out = ck.unpack_rgba(packed)
    diff = np.abs(out.astype(int) - ref.astype(int))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.01


def test_unpack_rgba_layout():
    packed = np.array([[0x04030201]], dtype=np.int32)
    np.testing.assert_array_equal(ck.unpack_rgba(packed)[0, 0], [1, 2, 3, 4])


def test_auto_block_tiers(rng):
    """The adaptive VMEM tiers (finding from self-review): every tier's code
    path runs in interpret mode, and the tiered outputs match the XLA path."""
    for b_bins, exp in [(2048, (128, 128)), (4095, (64, 128)),
                        (8191, (32, 64)), (16383, (16, 32))]:
        assert ck._auto_blocks(b_bins, None, None) == exp
    assert ck._auto_blocks(4095, 8, None) == (8, 128)  # explicit override
    with pytest.raises(ValueError):
        ck._auto_blocks(30_000, None, None)

    # run a big-bin geometry through the auto default (tier 64) end to end
    big = SpectrogramConfig(
        sample_rate=8000.0, window_period=4096 / 8000.0,
        hop_period=1024 / 8000.0, viewport_height=128,
    )
    n = 4
    rows = jnp.asarray(rng.random((n, 2, big.num_bins)).astype(np.float32) * 0.05)
    u, v = stacked_factored_tables(32)
    pid = np.ones(n, np.int64)
    mat = jnp.asarray(cm.resample_matrix(big))
    ref = np.asarray(
        cm.rgba_f32_to_u8(
            cm.sample_lut_factored(
                jnp.asarray(u[pid]), jnp.asarray(v[pid]),
                cm.pan_fraction(
                    cm.resample_rows(jnp.moveaxis(rows, -2, -1), mat)[..., 0],
                    cm.resample_rows(jnp.moveaxis(rows, -2, -1), mat)[..., 1],
                ),
                cm.db_normalize(
                    cm.resample_rows(jnp.moveaxis(rows, -2, -1), mat)[..., 0],
                    cm.resample_rows(jnp.moveaxis(rows, -2, -1), mat)[..., 1],
                    big,
                ),
            )
        )
    )
    tabs = jnp.asarray(ck.builtin_color_tables(32)[pid])
    packed = np.asarray(
        ck.colormap_rows_builtin(rows, tabs, jnp.asarray(mat.T), big, interpret=True)
    )
    out = ck.unpack_rgba(packed)
    diff = np.abs(out.astype(int) - ref.astype(int))
    assert diff.max() <= 1


def test_banded_matches_dense_bitwise(rng):
    """Banded colormap (band_segments over the two-tap resample matrix) must
    be BITWISE identical to the dense kernel: the skipped entries are exact
    zeros, so every pixel's surviving partial sums are unchanged."""
    big = SpectrogramConfig(
        sample_rate=48000.0, window_period=2048 / 48000.0, viewport_height=512
    )
    mt_np = cm.resample_matrix_full(big).T
    segs = ck.band_segments(mt_np)
    assert len(segs) > 1                     # plan actually splits
    assert segs[0][0] == 0 and segs[-1][1] == mt_np.shape[1]
    banded_work = sum((hi - lo) * (p1 - p0) for p0, p1, lo, hi in segs)
    assert banded_work < 0.5 * mt_np.shape[0] * mt_np.shape[1]
    n, b = 96, mt_np.shape[0]               # n not a multiple of block_rows
    left = jnp.asarray(np.abs(rng.standard_normal((n, b))).astype(np.float32) * 0.01)
    right = jnp.asarray(np.abs(rng.standard_normal((n, b))).astype(np.float32) * 0.01)
    tabs = jnp.asarray(ck.builtin_color_tables(32))[rng.integers(0, 19, n)]
    mt = jnp.asarray(mt_np)
    dense = np.asarray(ck.colormap_planes_builtin(left, right, tabs, mt, big,
                                                  interpret=True))
    band = np.asarray(ck.colormap_planes_banded(left, right, tabs, mt, big,
                                                segs, interpret=True))
    np.testing.assert_array_equal(dense, band)


def test_banded_plan_rejects_bad_inputs():
    big = SpectrogramConfig(
        sample_rate=48000.0, window_period=2048 / 48000.0, viewport_height=512
    )
    mt = jnp.asarray(cm.resample_matrix_full(big).T)
    segs = ck.band_segments(np.asarray(mt))
    tabs = jnp.zeros((4, 128), jnp.float32)
    with pytest.raises(ValueError, match="bins"):
        ck.colormap_planes_banded(
            jnp.zeros((4, 100)), jnp.zeros((4, 100)), tabs, mt, big, segs,
            interpret=True)
    with pytest.raises(ValueError, match="tile"):
        ck.colormap_planes_banded(
            jnp.zeros((4, mt.shape[0])), jnp.zeros((4, mt.shape[0])), tabs,
            mt, big, segs[:-1], interpret=True)


def test_merged_push_kernel_matches_chain(rng):
    """push_kernel.push_fused_single (the measured-slower single-call merge,
    kept as evidence per its module docstring) must stay bitwise-equal to
    the production two-kernel chain."""
    from spectrogram_tpu.ops.pallas import push_kernel as pk
    from spectrogram_tpu.ops.pallas import stft_kernel as sk

    cfg = SpectrogramConfig(sample_rate=8000.0, window_period=0.032,
                            hop_period=0.008, viewport_height=128,
                            max_frequency=3600.0)
    mt = jnp.asarray(cm.resample_matrix_full(cfg).T)
    segs = ck.band_segments(np.asarray(mt))
    n, w = 5, cfg.window_size
    left = jnp.asarray(rng.standard_normal((n, w)).astype(np.float32) * 0.3)
    right = jnp.asarray(rng.standard_normal((n, w)).astype(np.float32) * 0.3)
    tabs = jnp.asarray(ck.builtin_color_tables(32))[rng.integers(0, 19, n)]

    packed, magl, magr = pk.push_fused_single(
        left, right, tabs, mt, cfg, segs, block_rows=4, interpret=True,
        emit_mags=True)
    rl, rr = sk.stft_mag_fused2(left, right, cfg, block_rows=4,
                                interpret=True, slice_bins=False)
    chain = ck.colormap_planes_banded(rl, rr, tabs, mt, cfg, segs,
                                      interpret=True)
    np.testing.assert_array_equal(np.asarray(packed), np.asarray(chain))
    np.testing.assert_array_equal(np.asarray(magl), np.asarray(rl))


def test_banded_awkward_geometry_fallback(rng):
    """Non-lane-multiple bin counts (e.g. 1023 bins from a 1024-pt window)
    and sub-8 row counts must take the sliced fallback and stay exact
    (regression: the Element path rejected band=895 on real TPUs)."""
    cfg = SpectrogramConfig(
        sample_rate=44100.0, window_period=1024 / 44100.0,
        hop_period=256 / 44100.0, viewport_height=256,
        max_frequency=20000.0,
    )
    mt_np = cm.resample_matrix(cfg).T        # [1023, 256]
    assert mt_np.shape[0] % 128 != 0
    segs = ck.band_segments(mt_np)
    n = 83                                    # odd row count too
    left = jnp.asarray(np.abs(rng.standard_normal((n, mt_np.shape[0]))).astype(np.float32) * 0.01)
    right = left * 0.7
    tabs = jnp.asarray(ck.builtin_color_tables(32))[rng.integers(0, 19, n)]
    mt = jnp.asarray(mt_np)
    dense = np.asarray(ck.colormap_planes_builtin(left, right, tabs, mt, cfg,
                                                  interpret=True))
    band = np.asarray(ck.colormap_planes_banded(left, right, tabs, mt, cfg,
                                                segs, interpret=True))
    np.testing.assert_array_equal(dense, band)


def test_static_table_kernel_matches_per_row(rng):
    """static_table (palette baked as compile-time scalars) must be
    byte-identical to the per-row kernel with a uniform palette — for a
    mono and a stereo scheme, dense and banded, interpret mode."""
    mt_np = cm.resample_matrix(CFG).T
    segs = ck.band_segments(mt_np)
    n, b = 16, mt_np.shape[0]
    left = jnp.asarray(np.abs(rng.standard_normal((n, b))).astype(np.float32) * 0.01)
    right = jnp.asarray(np.abs(rng.standard_normal((n, b))).astype(np.float32) * 0.01)
    mt = jnp.asarray(mt_np)
    all_tabs = ck.builtin_color_tables(32)
    for pid in (1, 17):       # Magma (mono), a stereo scheme
        tabs = jnp.asarray(all_tabs)[np.full(n, pid)]
        static = tuple(float(v) for v in all_tabs[pid])
        ref_d = np.asarray(ck.colormap_planes_builtin(
            left, right, tabs, mt, CFG, interpret=True))
        got_d = np.asarray(ck.colormap_planes_builtin(
            left, right, None, mt, CFG, interpret=True, static_table=static))
        np.testing.assert_array_equal(ref_d, got_d)
        ref_b = np.asarray(ck.colormap_planes_banded(
            left, right, tabs, mt, CFG, segs, interpret=True))
        got_b = np.asarray(ck.colormap_planes_banded(
            left, right, None, mt, CFG, segs, interpret=True,
            static_table=static))
        np.testing.assert_array_equal(ref_b, got_b)
