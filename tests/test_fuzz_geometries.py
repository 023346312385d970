"""Geometry fuzz: random (rate, window, hop, height, pad) configs must
construct, stream, and match the one-shot path — whatever backend the
resolver picks (this is the class of bug the round-1 advisor caught: a
valid config whose factorization was unusable crashed push())."""

import numpy as np
import jax.numpy as jnp
import pytest

from spectrogram_tpu.config import SpectrogramConfig
from spectrogram_tpu.models.spectrogram import SpectrogramPipeline


def _random_cfg(rng) -> SpectrogramConfig:
    fs = float(rng.choice([8000, 11025, 16000, 22050, 44100, 48000]))
    # window 96..~700 samples (CPU-testable), any parity/factorization
    window = int(rng.integers(96, 700))
    hop = int(rng.integers(16, max(window // 2, 17)))
    return SpectrogramConfig(
        sample_rate=fs,
        window_period=window / fs,
        hop_period=hop / fs,
        pad_factor=int(rng.choice([1, 2, 3])),
        viewport_height=int(rng.choice([64, 100, 128])),
        viewport_rows=16,
        max_frequency=min(fs / 2 - 50.0, 22030.0),
    )


@pytest.mark.parametrize("seed", range(10))
def test_random_geometry_streams_and_matches(seed):
    rng = np.random.default_rng(1000 + seed)
    cfg = _random_cfg(rng)
    try:
        cfg.validate()
    except ValueError:
        pytest.skip(f"invalid random config {cfg}")
    k = int(rng.choice([1, 2, 3]))
    p = SpectrogramPipeline(cfg, chunk_hops=k)
    n_streams = 2
    pcm = rng.standard_normal(
        (n_streams, p.chunk_size * 2, 2)
    ).astype(np.float32) * 0.3
    s = p.init_state(n_streams)
    emitted = []
    for i in range(2):
        s, rgba = p.push(
            s, jnp.asarray(pcm[:, i * p.chunk_size : (i + 1) * p.chunk_size])
        )
        emitted.append(np.asarray(rgba))
    streamed = np.concatenate(emitted, axis=1)
    assert streamed.shape == (n_streams, 2 * k, cfg.viewport_height, 4)
    padded = np.concatenate(
        [np.zeros((n_streams, p.carry_size, 2), np.float32), pcm], axis=1
    )
    oneshot = np.asarray(p.process(jnp.asarray(padded)))
    # Bitwise equality holds when the two paths compile to the same batch
    # shape (the standard parity tests); across RANDOM geometries the
    # one-shot call batches more rows per matmul, and XLA may tile that
    # contraction differently — <=1 ulp of f32 association, <=1 u8 after
    # rounding (observed at seed 2: single pixels straddling a .5 boundary).
    diff = np.abs(streamed.astype(np.int32) - oneshot.astype(np.int32))
    assert diff.max() <= 1, diff.max()
    # viewport renders without error at this geometry too
    vp = np.asarray(p.render_viewport(s))
    assert vp.shape[1:] == (p.viewport_rows, cfg.viewport_height, 4)


def test_large_and_reference_geometries_fused_interpret(rng):
    """The random fuzz caps windows at ~700 samples; this pins the two
    geometry classes that have actually broken kernels on hardware: the
    reference-native 2400/4800 (48x100 plan — the NO-FLIP v4 path, the
    Mosaic-gate regression of round 3) and a large 4096/8192 window
    (64x128 plan).  Interpret mode, tiny batches, fused chain vs the
    mxu+xla reference path."""
    import spectrogram_tpu.ops.pallas.colormap_kernel as ck
    import spectrogram_tpu.ops.pallas.stft_kernel as sk
    from spectrogram_tpu.models.spectrogram import SpectrogramPipeline
    from spectrogram_tpu.ops.mxu_fft import make_plan

    geoms = [
        SpectrogramConfig(sample_rate=48000.0, viewport_height=64),   # 2400/4800
        SpectrogramConfig(sample_rate=48000.0,                        # 4096/8192
                          window_period=4096 / 48000.0, viewport_height=64),
    ]
    orig = (ck.colormap_planes_builtin, ck.colormap_planes_banded,
            sk.stft_mag_fused2)
    ck.colormap_planes_builtin = lambda *a, **kw: orig[0](*a, **{**kw, "interpret": True})
    ck.colormap_planes_banded = lambda *a, **kw: orig[1](*a, **{**kw, "interpret": True})
    sk.stft_mag_fused2 = lambda *a, **kw: orig[2](*a, **{**kw, "interpret": True})
    try:
        for cfg in geoms:
            plan = make_plan(cfg)
            assert plan is not None and plan.n1 % 2 == 0, (cfg, plan)
            p_ref = SpectrogramPipeline(cfg, chunk_hops=1, store_ring=False,
                                        packed_output=True, colormap_backend="xla")
            p_fus = SpectrogramPipeline(cfg, chunk_hops=1, store_ring=False,
                                        packed_output=True, stft_backend="pallas")
            chunk = jnp.asarray(
                rng.standard_normal((2, p_ref.chunk_size, 2)).astype(np.float32) * 0.2
            )
            _, out_ref = p_ref.push(p_ref.init_state(2), chunk)
            _, out_fus = p_fus.push(p_fus.init_state(2), chunk)
            a = np.asarray(out_ref).view(np.uint8).astype(int)
            b = np.asarray(out_fus).view(np.uint8).astype(int)
            assert np.abs(a - b).max() <= 1, (cfg, np.abs(a - b).max())
    finally:
        (ck.colormap_planes_builtin, ck.colormap_planes_banded,
         sk.stft_mag_fused2) = orig
