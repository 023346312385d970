"""Fused Pallas STFT kernel vs the golden model (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from spectrogram_tpu.config import SpectrogramConfig
from spectrogram_tpu.ops import stft
from spectrogram_tpu.ops.pallas import stft_kernel

CFG = SpectrogramConfig(sample_rate=8000.0, window_period=0.032, hop_period=0.008)
# W=256, plan should factor 512


def test_fused2_small_blocks_match_golden(rng):
    n = 8
    w = CFG.window_size
    pcm = (rng.standard_normal((n, w, 2)) * 0.3).astype(np.float32)
    golden = np.asarray(stft.stft_frame_planar(jnp.asarray(pcm), CFG))  # [n,2,B]
    mag_l, mag_r = stft_kernel.stft_mag_fused2(
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
    mag_l, _ = stft_kernel.stft_mag_fused2(
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


def test_buf_framing_matches_plane_path(rng):
    """Element-indexed buffer framing (k windows DMA'd straight from the
    planar buffer) must equal the window-plane path bit-for-bit."""
    # hop/n1 must be a multiple of 8 for k>1 (Mosaic sublane alignment):
    # W=256 -> plan n1=16; hop 128 -> hop_rows=8.
    cfg = SpectrogramConfig(sample_rate=8000.0, window_period=0.032,
                            hop_period=0.016)
    assert stft_kernel.buf_framing_supported(cfg, k=2)
    k, n = 2, 5
    w, h = cfg.window_size, cfg.hop_size
    buf = (rng.standard_normal((n, 2, w + (k - 1) * h)) * 0.3).astype(np.float32)
    ml, mr = stft_kernel.stft_mag_fused2_buf(
        jnp.asarray(buf[:, 0]), jnp.asarray(buf[:, 1]), cfg, k=k,
        block_rows=4, interpret=True)
    lefts = np.concatenate([buf[:, 0, r * h : r * h + w] for r in range(k)])
    rights = np.concatenate([buf[:, 1, r * h : r * h + w] for r in range(k)])
    rl, rr = stft_kernel.stft_mag_fused2(
        jnp.asarray(lefts), jnp.asarray(rights), cfg, block_rows=4,
        interpret=True, slice_bins=False)
    np.testing.assert_array_equal(np.asarray(ml), np.asarray(rl))
    np.testing.assert_array_equal(np.asarray(mr), np.asarray(rr))
    # unaligned-hop geometries report unsupported instead of miscompiling
    bad = SpectrogramConfig(sample_rate=8000.0, window_period=0.032,
                            hop_period=0.008)
    assert not stft_kernel.buf_framing_supported(bad, k=2)
    assert stft_kernel.buf_framing_supported(bad, k=1)


def test_flip_gate_and_block_defaults():
    """Mosaic capability gate (probed on hardware 2026-08-16): the flipped
    stage-2 orientation requires n2 % 128 == 0; default block sizes are 64
    only for the small-block flip shapes.  Both orientations must agree
    numerically (interpret mode)."""
    from spectrogram_tpu.config import SpectrogramConfig
    from spectrogram_tpu.ops.mxu_fft import make_plan

    bench = make_plan(SpectrogramConfig(
        sample_rate=48000.0, window_period=2048 / 48000.0))
    ref = make_plan(SpectrogramConfig(sample_rate=48000.0))
    assert stft_kernel.flip_supported(bench)          # 32x128
    assert not stft_kernel.flip_supported(ref)        # 48x100
    assert stft_kernel.default_block_rows(bench) == 64
    assert stft_kernel.default_block_rows(ref) == 32

    # numeric agreement of the two stage-2 orientations on the SAME plan
    cfg = SpectrogramConfig(sample_rate=48000.0, window_period=2048 / 48000.0)
    rng = np.random.default_rng(5)
    x = rng.standard_normal((8, cfg.window_size)).astype(np.float32) * 0.1
    import functools
    import jax

    outs = []
    for force_noflip in (False, True):
        # identical static args would hit the jit cache and compare the
        # first result to itself; drop the cache so the patched gate
        # actually traces.  Patching flip_supported() flips BOTH the
        # stage-2 orientation and the round-4 flat-2D output path.
        jax.clear_caches()
        orig = stft_kernel.flip_supported
        if force_noflip:
            stft_kernel.flip_supported = lambda plan: False
        try:
            ml, _ = stft_kernel.stft_mag_fused2(
                jnp.asarray(x), jnp.asarray(x), cfg, interpret=True)
            outs.append(np.asarray(ml))
        finally:
            stft_kernel.flip_supported = orig
    assert not np.array_equal(outs[0], outs[1])  # orientations re-associate
    np.testing.assert_allclose(outs[0], outs[1], rtol=2e-5, atol=1e-7)


def test_lane_pad_flip_matches_unpadded(rng):
    """Round-4 padded-lane flip (n2 % 128 != 0 plans): padded positions are
    exact zeros, true bins match the unpadded orientation to ~2 ulp (the dT
    stage-2 association), and the default gate engages exactly when the pad
    is physically free."""
    from spectrogram_tpu.ops.mxu_fft import FftPlan

    cfg = SpectrogramConfig(sample_rate=48000.0, window_period=0.05)
    assert cfg.window_size == 2400 and cfg.padded_size == 4800
    plan = stft_kernel.make_plan(cfg)
    assert not stft_kernel.flip_supported(plan)
    assert stft_kernel.lane_pad_default(plan)
    assert stft_kernel.padded_n2(plan) == 128
    n = 12
    left = rng.standard_normal((n, 2400)).astype(np.float32) * 0.3
    right = rng.standard_normal((n, 2400)).astype(np.float32) * 0.3
    l0, r0 = stft_kernel.stft_mag_fused2(
        jnp.asarray(left), jnp.asarray(right), cfg, interpret=True,
        slice_bins=False, lane_pad=False)
    l1, r1 = stft_kernel.stft_mag_fused2(
        jnp.asarray(left), jnp.asarray(right), cfg, interpret=True,
        slice_bins=False, lane_pad=True)
    for a, b in ((l0, l1), (r0, r1)):
        a, b = np.asarray(a), np.asarray(b)
        # dT association shift: ~2 ulp relative, plus absolute floor for
        # near-cancelled bins (relative error is meaningless at ~1e-7 mags)
        np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-6)
    lp, _ = stft_kernel.stft_mag_fused2(
        jnp.asarray(left), jnp.asarray(right), cfg, interpret=True,
        slice_bins=False, lane_pad=True, padded_layout=True)
    n2, n2p, k1h = plan.n2, stft_kernel.padded_n2(plan), plan.n1 // 2
    lp3 = np.asarray(lp).reshape(n, k1h, n2p)
    np.testing.assert_array_equal(lp3[:, :, n2:], 0.0)
    np.testing.assert_array_equal(
        lp3[:, :, :n2].reshape(n, -1), np.asarray(l1))
    # free-pad gate: n2=64-class plans (pad would double stage-1 tiles) stay off
    assert not stft_kernel.lane_pad_default(
        FftPlan(n=2048, n1=32, n2=64, m=32))


def test_allk_framing_matches_plane_path(rng):
    """Round-4 all-windows kernel (stft_mag_fused2_allk): in-kernel window
    slices off the carry+chunk planes must be BITWISE equal to the
    materialized-plane path, at an unaligned hop_rows (the gate the
    element-offset buf form cannot pass)."""
    cfg = CFG  # window 256, hop 64
    plan = stft_kernel.make_plan(cfg)
    for k in (1, 3, 4):
        assert stft_kernel.split_framing_supported(cfg, k, plan)
        w, h = cfg.window_size, cfg.hop_size
        tlen = w + (k - 1) * h
        buf_l = rng.standard_normal((5, tlen)).astype(np.float32) * 0.3
        buf_r = rng.standard_normal((5, tlen)).astype(np.float32) * 0.3
        al, ar = stft_kernel.stft_mag_fused2_allk(
            jnp.asarray(buf_l), jnp.asarray(buf_r), cfg, k=k, interpret=True)
        lefts = np.concatenate([buf_l[:, r*h:r*h+w] for r in range(k)], axis=0)
        rights = np.concatenate([buf_r[:, r*h:r*h+w] for r in range(k)], axis=0)
        rl, rr = stft_kernel.stft_mag_fused2(
            jnp.asarray(lefts), jnp.asarray(rights), cfg, interpret=True,
            slice_bins=False, plan=plan)
        np.testing.assert_array_equal(np.asarray(al), np.asarray(rl))
        np.testing.assert_array_equal(np.asarray(ar), np.asarray(rr))
    # emit_carry returns the buffer tail in state layout
    k = 4
    tlen = cfg.window_size + (k - 1) * cfg.hop_size
    buf_l = rng.standard_normal((3, tlen)).astype(np.float32)
    buf_r = rng.standard_normal((3, tlen)).astype(np.float32)
    _, _, nc = stft_kernel.stft_mag_fused2_allk(
        jnp.asarray(buf_l), jnp.asarray(buf_r), cfg, k=k, interpret=True,
        emit_carry=True)
    c = cfg.window_size - cfg.hop_size
    np.testing.assert_array_equal(
        np.asarray(nc), np.stack([buf_l[:, -c:], buf_r[:, -c:]], axis=1))


def test_split_operand_kernel_matches(rng):
    """The split-operand form (stft_mag_fused2_split) — a MEASURED NEGATIVE
    end-to-end (DESIGN.md round-4 ledger) kept as evidence — still has to
    be numerically right: <= 1 ulp of the plane path (the carry/chunk
    boundary splits one stage-1 dot into two partial sums)."""
    cfg = CFG
    plan = stft_kernel.make_plan(cfg)
    k = 2
    w, h, c = cfg.window_size, cfg.hop_size, cfg.window_size - cfg.hop_size
    carry = rng.standard_normal((4, 2, c)).astype(np.float32) * 0.3
    chunk = rng.standard_normal((4, 2, k * h)).astype(np.float32) * 0.3
    ml, mr, nc = stft_kernel.stft_mag_fused2_split(
        jnp.asarray(carry), jnp.asarray(chunk), cfg, k=k, interpret=True)
    buf = np.concatenate([carry, chunk], axis=2)
    lefts = np.concatenate([buf[:, 0, r*h:r*h+w] for r in range(k)], axis=0)
    rights = np.concatenate([buf[:, 1, r*h:r*h+w] for r in range(k)], axis=0)
    rl, rr = stft_kernel.stft_mag_fused2(
        jnp.asarray(lefts), jnp.asarray(rights), cfg, interpret=True,
        slice_bins=False, plan=plan)
    np.testing.assert_allclose(np.asarray(ml), np.asarray(rl),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(mr), np.asarray(rr),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(nc), buf[:, :, -c:])


def test_tsplit_kernel_matches(rng):
    """Round-4-late split-state framing (stft_mag_fused2_tsplit): carry+chunk
    consumed directly, stage 1 as two accumulating dots — must be within
    1-ulp-scale tolerance of the plane path (partial-sum re-association at
    the carry/chunk boundary) and the emitted carry bitwise."""
    cfg = SpectrogramConfig(sample_rate=48000.0, window_period=2048 / 48000.0,
                            hop_period=800 / 48000.0)
    plan = stft_kernel.make_plan(cfg)
    assert stft_kernel.tsplit_supported(cfg, 1, plan)
    n1 = plan.n1
    w, h = cfg.window_size, cfg.hop_size
    c = w - h
    n = 4
    carry = rng.standard_normal((n, 2, c)).astype(np.float32) * 0.3
    chunk = rng.standard_normal((n, 2, h)).astype(np.float32) * 0.3
    carry_t = jnp.swapaxes(
        jnp.asarray(carry).reshape(n, 2, c // n1, n1), 2, 3)
    chunk_t = jnp.swapaxes(
        jnp.asarray(chunk).reshape(n, 2, h // n1, n1), 2, 3)
    ml, mr, nc = stft_kernel.stft_mag_fused2_tsplit(
        carry_t, chunk_t, cfg, block_rows=4, interpret=True, plan=plan)
    buf = np.concatenate([carry, chunk], axis=2)
    rl, rr = stft_kernel.stft_mag_fused2(
        jnp.asarray(buf[:, 0]), jnp.asarray(buf[:, 1]), cfg, block_rows=4,
        interpret=True, slice_bins=False, plan=plan)
    np.testing.assert_allclose(np.asarray(ml), np.asarray(rl),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(mr), np.asarray(rr),
                               rtol=1e-4, atol=1e-6)
    nc_pl = np.asarray(jnp.swapaxes(nc, 2, 3)).reshape(n, 2, c)
    np.testing.assert_array_equal(nc_pl, buf[:, :, -c:])


def test_tsplit_kernel_big_hop_carry(rng):
    """hop >= carry: the next carry comes entirely from the chunk tail."""
    cfg = SpectrogramConfig(sample_rate=48000.0, window_period=2048 / 48000.0,
                            hop_period=1536 / 48000.0)
    plan = stft_kernel.make_plan(cfg)
    assert stft_kernel.tsplit_supported(cfg, 1, plan)
    n1 = plan.n1
    w, h = cfg.window_size, cfg.hop_size
    c = w - h
    assert h >= c
    n = 3
    carry = rng.standard_normal((n, 2, c)).astype(np.float32) * 0.3
    chunk = rng.standard_normal((n, 2, h)).astype(np.float32) * 0.3
    carry_t = jnp.swapaxes(
        jnp.asarray(carry).reshape(n, 2, c // n1, n1), 2, 3)
    chunk_t = jnp.swapaxes(
        jnp.asarray(chunk).reshape(n, 2, h // n1, n1), 2, 3)
    ml, _, nc = stft_kernel.stft_mag_fused2_tsplit(
        carry_t, chunk_t, cfg, block_rows=4, interpret=True, plan=plan)
    buf = np.concatenate([carry, chunk], axis=2)
    rl, _ = stft_kernel.stft_mag_fused2(
        jnp.asarray(buf[:, 0]), jnp.asarray(buf[:, 1]), cfg, block_rows=4,
        interpret=True, slice_bins=False, plan=plan)
    np.testing.assert_allclose(np.asarray(ml), np.asarray(rl),
                               rtol=1e-4, atol=1e-6)
    nc_pl = np.asarray(jnp.swapaxes(nc, 2, 3)).reshape(n, 2, c)
    np.testing.assert_array_equal(nc_pl, buf[:, :, -c:])


def test_tsplit_lane_pad_matches(rng):
    """tsplit with the padded-lane flip (reference-native plan family,
    n2 % 128 != 0): padded-layout magnitudes must match the lane_pad plane
    path; the gate refuses unaligned hops instead of miscompiling."""
    cfg = SpectrogramConfig(sample_rate=48000.0, window_period=0.05,
                            hop_period=96 / 48000.0)
    plan = stft_kernel.make_plan(cfg)
    assert not stft_kernel.flip_supported(plan)
    assert stft_kernel.tsplit_supported(cfg, 1, plan, lane_pad=True)
    assert not stft_kernel.tsplit_supported(cfg, 1, plan, lane_pad=False)
    n1 = plan.n1
    w, h = cfg.window_size, cfg.hop_size
    c = w - h
    n = 3
    carry = rng.standard_normal((n, 2, c)).astype(np.float32) * 0.3
    chunk = rng.standard_normal((n, 2, h)).astype(np.float32) * 0.3
    carry_t = jnp.swapaxes(
        jnp.asarray(carry).reshape(n, 2, c // n1, n1), 2, 3)
    chunk_t = jnp.swapaxes(
        jnp.asarray(chunk).reshape(n, 2, h // n1, n1), 2, 3)
    ml, mr, nc = stft_kernel.stft_mag_fused2_tsplit(
        carry_t, chunk_t, cfg, block_rows=4, interpret=True, plan=plan,
        lane_pad=True)
    buf = np.concatenate([carry, chunk], axis=2)
    rl, rr = stft_kernel.stft_mag_fused2(
        jnp.asarray(buf[:, 0]), jnp.asarray(buf[:, 1]), cfg, block_rows=4,
        interpret=True, slice_bins=False, plan=plan, lane_pad=True,
        padded_layout=True)
    np.testing.assert_allclose(np.asarray(ml), np.asarray(rl),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(mr), np.asarray(rr),
                               rtol=1e-4, atol=1e-6)
    nc_pl = np.asarray(jnp.swapaxes(nc, 2, 3)).reshape(n, 2, c)
    np.testing.assert_array_equal(nc_pl, buf[:, :, -c:])
    # unaligned hop (the reference's own hop 58): unsupported, not wrong
    ref = SpectrogramConfig(sample_rate=48000.0, window_period=0.05)
    assert not stft_kernel.tsplit_supported(
        ref, 1, stft_kernel.make_plan(ref), lane_pad=True)


def test_packed_matches_golden(rng):
    """Packed-complex formulation (round-4 final, exp_stft_packed): the
    stereo-packed four-step + conjugate unpack must match the golden model
    to float tolerance, and the plane/allk packed paths must be BITWISE
    equal to each other (same sums, different operand layouts)."""
    from spectrogram_tpu.ops.mxu_fft import FftPlan

    plan = FftPlan(n=512, n1=4, n2=128, m=64)   # flip-capable at W=256
    assert stft_kernel.packed_supported(plan)
    n = 8
    w = CFG.window_size
    pcm = (rng.standard_normal((n, w, 2)) * 0.3).astype(np.float32)
    golden = np.asarray(stft.stft_frame_planar(jnp.asarray(pcm), CFG))
    mag_l, mag_r = stft_kernel.stft_mag_fused2(
        jnp.asarray(pcm[:, :, 0]), jnp.asarray(pcm[:, :, 1]), CFG,
        block_rows=4, interpret=True, plan=plan, packed=True,
    )
    np.testing.assert_allclose(np.asarray(mag_l), golden[:, 0],
                               atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(mag_r), golden[:, 1],
                               atol=3e-5, rtol=1e-4)
    # allk packed vs plane packed: bitwise
    k, h = 3, CFG.hop_size
    tlen = w + (k - 1) * h
    buf_l = rng.standard_normal((5, tlen)).astype(np.float32) * 0.3
    buf_r = rng.standard_normal((5, tlen)).astype(np.float32) * 0.3
    al, ar = stft_kernel.stft_mag_fused2_allk(
        jnp.asarray(buf_l), jnp.asarray(buf_r), CFG, k=k, interpret=True,
        plan=plan, packed=True)
    lefts = np.concatenate([buf_l[:, r*h:r*h+w] for r in range(k)], axis=0)
    rights = np.concatenate([buf_r[:, r*h:r*h+w] for r in range(k)], axis=0)
    rl, rr = stft_kernel.stft_mag_fused2(
        jnp.asarray(lefts), jnp.asarray(rights), CFG, interpret=True,
        slice_bins=False, plan=plan, packed=True)
    np.testing.assert_array_equal(np.asarray(al), np.asarray(rl))
    np.testing.assert_array_equal(np.asarray(ar), np.asarray(rr))
    # allk packed vs split-real: float-level (different association)
    sl, sr = stft_kernel.stft_mag_fused2_allk(
        jnp.asarray(buf_l), jnp.asarray(buf_r), CFG, k=k, interpret=True,
        plan=plan)
    np.testing.assert_allclose(np.asarray(al), np.asarray(sl),
                               rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ar), np.asarray(sr),
                               rtol=1e-3, atol=1e-6)


def test_packed_lane_pad_matches(rng):
    """Packed + padded-lane flip on the reference-native 2400/4800 plan:
    padded positions exact zeros, true bins match the split-real lane_pad
    path to float tolerance."""
    cfg = SpectrogramConfig(sample_rate=48000.0, window_period=0.05)
    plan = stft_kernel.make_plan(cfg)
    assert not stft_kernel.flip_supported(plan)
    assert stft_kernel.packed_supported(plan, lane_pad=True)
    assert not stft_kernel.packed_supported(plan, lane_pad=False)
    n = 6
    left = rng.standard_normal((n, 2400)).astype(np.float32) * 0.3
    right = rng.standard_normal((n, 2400)).astype(np.float32) * 0.3
    a_l, a_r = stft_kernel.stft_mag_fused2(
        jnp.asarray(left), jnp.asarray(right), cfg, interpret=True,
        slice_bins=False, lane_pad=True)
    p_l, p_r = stft_kernel.stft_mag_fused2(
        jnp.asarray(left), jnp.asarray(right), cfg, interpret=True,
        slice_bins=False, lane_pad=True, packed=True)
    for a, b in ((a_l, p_l), (a_r, p_r)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=1e-6)
    # padded layout: pad lanes exact zeros
    lp, _ = stft_kernel.stft_mag_fused2(
        jnp.asarray(left), jnp.asarray(right), cfg, interpret=True,
        slice_bins=False, lane_pad=True, padded_layout=True, packed=True)
    n2, n2p, k1h = plan.n2, stft_kernel.padded_n2(plan), plan.n1 // 2
    lp3 = np.asarray(lp).reshape(n, k1h, n2p)
    np.testing.assert_array_equal(lp3[:, :, n2:], 0.0)
    np.testing.assert_array_equal(
        lp3[:, :, :n2].reshape(n, -1), np.asarray(p_l))


def test_packed_gates():
    """packed_supported mirrors the flat-2D orientation gate; unsupported
    plans raise instead of silently falling back."""
    import pytest
    from spectrogram_tpu.ops.mxu_fft import FftPlan

    plan = stft_kernel.make_plan(CFG)       # 16x32: no flip, no free pad
    assert not stft_kernel.packed_supported(plan)
    with pytest.raises(ValueError, match="packed"):
        stft_kernel.stft_mag_fused2(
            jnp.zeros((4, CFG.window_size)), jnp.zeros((4, CFG.window_size)),
            CFG, interpret=True, packed=True)
    # odd n1 never packs
    assert not stft_kernel.packed_supported(
        FftPlan(n=512, n1=3, n2=171, m=85), lane_pad=True)


def test_pipeline_packed_auto_routing(rng):
    """stft_packed='auto' engages exactly where the plan supports the
    flat-2D orientation; the packed pipeline matches the split-real one at
    float tolerance end-to-end."""
    from spectrogram_tpu.config import BENCH_CONFIG
    from spectrogram_tpu.models.spectrogram import SpectrogramPipeline

    pipe = SpectrogramPipeline(CFG, chunk_hops=2, kernel_interpret=True)
    assert not pipe.stft_packed      # 16x32 plan: no flat-2D orientation
    on = SpectrogramPipeline(BENCH_CONFIG, chunk_hops=1,
                             stft_backend="pallas",
                             kernel_interpret=True, viewport_rows=4)
    assert on.stft_packed            # 32x128: direct flip
    off = SpectrogramPipeline(BENCH_CONFIG, chunk_hops=1,
                              stft_backend="pallas",
                              kernel_interpret=True, viewport_rows=4,
                              stft_packed=False)
    s_on = on.init_state(2)
    s_off = off.init_state(2)
    chunk = (rng.standard_normal((2, on.chunk_size, 2)) * 0.3).astype(
        np.float32)
    _, rgba_on = on.push(s_on, jnp.asarray(chunk))
    _, rgba_off = off.push(s_off, jnp.asarray(chunk))
    # packed RGBA int32 words: unpack to bytes for a per-channel bound
    a = np.asarray(rgba_on).view(np.uint8).reshape(-1, 4).astype(np.int32)
    b = np.asarray(rgba_off).view(np.uint8).reshape(-1, 4).astype(np.int32)
    assert np.abs(a - b).max() <= 1   # ulp-level mag shift -> <= 1 u8 step


def test_unpack_split_parity(rng):
    """bf16-split `prev` dot (exp_unpack_split): split3 is BITWISE equal
    to the HIGHEST permutation dot (the 3-term bf16 split reconstructs
    f32 exactly when the coefficient operand is 0/1); split2 stays well
    below the u8 quantum.  Covers both the plane and allk entry points."""
    from spectrogram_tpu.ops.mxu_fft import FftPlan

    plan = FftPlan(n=512, n1=4, n2=128, m=64)   # flip-capable at W=256
    assert stft_kernel.packed_supported(plan)
    n = 8
    w = CFG.window_size
    pcm = (rng.standard_normal((n, w, 2)) * 0.3).astype(np.float32)
    l, r = jnp.asarray(pcm[:, :, 0]), jnp.asarray(pcm[:, :, 1])
    base = stft_kernel.stft_mag_fused2(
        l, r, CFG, block_rows=4, interpret=True, plan=plan, packed=True,
        slice_bins=False)
    s3 = stft_kernel.stft_mag_fused2(
        l, r, CFG, block_rows=4, interpret=True, plan=plan, packed=True,
        slice_bins=False, unpack_split=3)
    s2 = stft_kernel.stft_mag_fused2(
        l, r, CFG, block_rows=4, interpret=True, plan=plan, packed=True,
        slice_bins=False, unpack_split=2)
    for a, b in zip(s3, base):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(s2, base):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-6)
    # allk entry point threads the knob identically
    k, h = 2, CFG.hop_size
    tlen = w + (k - 1) * h
    buf_l = jnp.asarray(rng.standard_normal((5, tlen)).astype(np.float32))
    buf_r = jnp.asarray(rng.standard_normal((5, tlen)).astype(np.float32))
    a0 = stft_kernel.stft_mag_fused2_allk(
        buf_l, buf_r, CFG, k=k, interpret=True, plan=plan, packed=True)
    a3 = stft_kernel.stft_mag_fused2_allk(
        buf_l, buf_r, CFG, k=k, interpret=True, plan=plan, packed=True,
        unpack_split=3)
    for a, b in zip(a3, a0):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_unpack_split_pipeline_gate():
    """Pipeline knob: auto -> 3 wherever packed engages, 0 otherwise;
    explicit split without packed raises."""
    import pytest
    from spectrogram_tpu.models.spectrogram import SpectrogramPipeline

    p = SpectrogramPipeline(CFG, stft_backend="mxu")   # not fused: no pack
    assert p.stft_unpack_split == 0
    with pytest.raises(ValueError, match="unpack_split"):
        SpectrogramPipeline(CFG, stft_backend="mxu", stft_unpack_split=3)
