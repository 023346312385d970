"""Fused Pallas STFT kernel: windowed PCM planes -> magnitude rows.

The four-step FFT (ops/mxu_fft.py) expressed as one Pallas kernel per
stream-block, eliminating the XLA glue passes (operand re-layouts, fusion
boundaries) that the device profiler showed dominate the composed version:

  per [TS, W] input plane (one channel):
    1. Hann multiply (constant vector, fused)
    2. reshape to [TS, m, n1] outside the kernel — a free view (Mosaic
       cannot split the lane dim in-kernel; the zero-padded rows never exist)
    3. stage 1: ONE middle-axis MXU dot against the block n2-DFT (real input)
    4. twiddle multiply (elementwise, 3D)
    5. stage 2: ONE middle-axis MXU dot against the HALF-spectrum block
       n1-DFT (bins k < N/2 only — all the reference emits)
    6. |X|, with the 2/W scale pre-folded into the Hann constant and power
       computed before the single output transpose (see _fft_mag_value)

  The "transpose" steps of the classical four-step are folded into the
  dot_general contraction dimensions (see _kernel2).

Split-real formulation: each channel is its own real-input FFT — exactly
equal to the reference's packed-complex + conjugate unpack (fft.rs:57,81-92)
in exact arithmetic, with none of its reverse/unpack passes.

Formulation history (negative results preserved in _kernel2's docstring):
v1 batched dots (4x slower than XLA; deleted in round 2), v2 all-2D-dot
with 4 swapaxes/channel (3.96 ms standalone at 4096 streams), v3
middle-axis dot_general with no pre-dot transposes (3.30 ms), v3c/v3d:
power before the output transpose + scale folded into Hann (2.86 ms),
v4 (current): transposed window planes + flipped stage 2 (1.39 ms at
ts=64; exp_stft_r3).  Stage 2 as 4 separate dots (no concat) VMEM-OOMs;
2 accumulating dots measured -25% (exp_stft_nocat).  A k2-major
permuted-output variant was tried and reverted: minor dim n1/2=16 pads
8x in (8,128) lane tiles.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spectrogram_tpu.config import SpectrogramConfig
from spectrogram_tpu.ops import stft as stft_ops
from spectrogram_tpu.ops.mxu_fft import FftPlan, make_plan


def flip_supported(plan: FftPlan) -> bool:
    """True when the flipped stage-2 orientation (dT) compiles DIRECTLY:
    Mosaic's leading-axis transpose of the [2k1h, TS, n2] product needs the
    lane dim to be a whole number of 128-lane tiles (probed on hardware
    across six geometries, 2026-08-16: n2=128 OK, n2 in {64, 100} ->
    infer-vector-layout 'unsupported shape cast').  Plans that fail this
    gate take the padded-lane flip instead (`padded_n2`) — round 4."""
    return plan.n2 % 128 == 0


def padded_n2(plan: FftPlan) -> int:
    """The lane-padded stage-1 width n2p: n2 rounded up to a full 128-lane
    tile.  A [*, n2] vector occupies ceil(n2/128) physical lane tiles
    regardless, so computing at n2p with zero-padded DFT/twiddle constants
    costs no extra vector work — and makes the flipped stage-2 transpose
    legal for ANY plan (the reference-native 2400/4800 geometry's n2=100
    was the round-3 gap: no factorization of 4800 has n2 % 128 == 0,
    /root/reference/src/fourier/fft.rs:33,44)."""
    return -(-plan.n2 // 128) * 128


def default_block_rows(plan: FftPlan) -> int:
    """Default stream-block size: 64 only where measured to compile AND win
    (the bench-class small-block shapes); 32 is the universal safe size.
    The autotuner explores {16, 32, 64} per geometry regardless."""
    if flip_supported(plan) and plan.n1 <= 32 and plan.m <= 64:
        return 64
    return 32


def _kernel2(
    left_ref, right_ref, hann_ref, f2cat_ref, twcat_ref, f1blk_ref,
    out_l_ref, out_r_ref,
    *, plan, precision, transposed=False, lane_pad=False,
):
    """v4 kernel body (exp_stft_r3, 2.89 -> 1.39 ms standalone at 4096
    rows): stage 2 contracts FLIPPED (constant first), and with
    `transposed` inputs ([TS, n1, m]) stage 1 contracts the LAST axis.

    History: v1 batched dots were 4x slower than XLA (batch-TS small dots);
    v2 flattened (rows x n1) into the matmul M with 4 swapaxes/channel
    (3.96 ms standalone at 4096 streams); v3 middle-axis dot_general
    (3.30 ms); v3c/d power-before-swap + scale-in-Hann (2.86 ms); v4
    tw (transposed windows: m on lanes pads 1.7x instead of n1's 4x,
    last-axis contraction; bitwise-equal, -12%) + dT (flipped stage 2:
    Mosaic lowers the leading-axis output transpose cheaper than the
    lane-dim swapaxes, ~2 ulp; -36%) = -52% combined.
    """
    def channel(x_ref, out_ref):
        _fft_channel(x_ref[:], hann_ref, f2cat_ref, twcat_ref, f1blk_ref,
                     out_ref, plan=plan, precision=precision,
                     transposed=transposed, lane_pad=lane_pad)

    channel(left_ref, out_l_ref)
    channel(right_ref, out_r_ref)


def _fft_mag_value(x, hann_ref, f2cat_ref, twcat_ref, f1blk_ref,
                   *, plan, precision, transposed=False, flip=None,
                   lane_pad=False):
    """One channel's four-step on a window block ([TS, n1, m] when
    `transposed`, else [TS, m, n1]); returns the [TS, k1h, n2] magnitude
    value (flat bin k = k1*n2 + k2).

    Expects the 2/W output scale PRE-FOLDED into the Hann constant (see
    _scaled_hann): an exact exponent shift for power-of-two windows, <=1 ulp
    otherwise, and it deletes one full elementwise pass.  Stage 2 runs in
    the FLIPPED orientation (dT): d = f1blk^T-contraction emits
    [2k1h, TS, n2] and the output transpose is leading-axis (sublane
    copies), which Mosaic lowers ~2x cheaper than the lane-dim swapaxes of
    the [TS, n2, 2k1h] orientation (exp_stft_r3).  The two stage-1 layouts
    are bitwise-identical; dT moves bits by ~2 ulp (MXU pass association).

    `lane_pad`: the f2cat/twcat constants arrive zero-padded to
    n2p = padded_n2(plan) lanes, every intermediate runs at n2p width (free:
    the physical lane tiles are the same), flip is always legal, and the
    output block is [TS, k1h, n2p] — padded positions carry exact zeros
    (|0 + 0i| = 0) for the caller to slice or feed to a padded-layout
    resample matrix.  True-bin values are BITWISE identical to the unpadded
    path: appending zero columns changes no partial sum."""
    n1, m = plan.n1, plan.m
    n2 = padded_n2(plan) if lane_pad else plan.n2
    if flip is None:
        flip = True if lane_pad else flip_supported(plan)
    kw = dict(preferred_element_type=jnp.float32, precision=precision)
    twr_t = twcat_ref[:, :n2]                             # [n1, n2]
    twi_t = twcat_ref[:, n2:]
    x = x * hann_ref[:]
    contract = ((2,), (0,)) if transposed else ((1,), (0,))
    b = jax.lax.dot_general(
        x, f2cat_ref[:], (contract, ((), ())), **kw
    )                                                     # [TS, n1, 2n2]
    br, bi = b[..., :n2], b[..., n2:]
    cr = br * twr_t - bi * twi_t                          # [TS, n1, n2]
    ci = br * twi_t + bi * twr_t
    c_cat = jnp.concatenate([cr, ci], axis=1)             # [TS, 2n1, n2]
    k1h = n1 // 2
    if flip:
        d = jax.lax.dot_general(
            f1blk_ref[:], c_cat, (((0,), (1,)), ((), ())), **kw
        )                                                 # [2k1h, TS, n2]
        dr, di = d[:k1h], d[k1h:]
        p = dr * dr + di * di                             # power, pre-transpose
        return jnp.transpose(jnp.sqrt(p), (1, 0, 2))      # [TS, k1h, n2]
    # v3c orientation for plans where dT cannot compile (see flip_supported)
    d = jax.lax.dot_general(
        c_cat, f1blk_ref[:], (((1,), (0,)), ((), ())), **kw
    )                                                     # [TS, n2, 2k1h]
    dr, di = d[..., :k1h], d[..., k1h:]
    p = dr * dr + di * di
    return jnp.sqrt(jnp.swapaxes(p, 1, 2))                # [TS, k1h, n2]


def _scaled_hann(w: int, m: int, n1: int) -> "np.ndarray":
    """Hann window with the 2/W magnitude scale folded in, shaped [m, n1]."""
    return (stft_ops.hann_window_np(w) * (2.0 / w)).reshape(m, n1)


def _fft_channel(x, hann_ref, f2cat_ref, twcat_ref, f1blk_ref, out_ref,
                 *, plan, precision, transposed=False, lane_pad=False):
    """Ref-writing wrapper around _fft_mag_value (see _kernel2)."""
    out_ref[:] = _fft_mag_value(
        x, hann_ref, f2cat_ref, twcat_ref, f1blk_ref,
        plan=plan, precision=precision, transposed=transposed,
        lane_pad=lane_pad,
    )


def _padded_stage1_constants(plan: FftPlan):
    """(f2cat, twcat) zero-padded from n2 to padded_n2(plan) lanes per half
    (real | imag concatenation preserved).  The pad columns are exact zeros:
    stage-1 emits 0 there, the twiddle multiplies 0*0, and stage-2's extra
    columns contribute |0| = 0 magnitudes at the padded bin positions."""
    from spectrogram_tpu.ops.mxu_fft import _block_plan_constants

    f2cat, twr, twi, f1blk = _block_plan_constants(plan)
    n2, n2p = plan.n2, padded_n2(plan)
    m, n1 = f2cat.shape[0], twr.shape[0]
    f2p = np.zeros((m, 2 * n2p), np.float32)
    f2p[:, :n2] = f2cat[:, :n2]
    f2p[:, n2p : n2p + n2] = f2cat[:, n2:]
    twp = np.zeros((n1, 2 * n2p), np.float32)
    twp[:, :n2] = twr
    twp[:, n2p : n2p + n2] = twi
    return f2p, twp, f1blk


def lane_pad_default(plan: FftPlan) -> bool:
    """Default for the padded-lane flip: on when the direct flip gate fails
    AND the padding is physically free — both stage-1 halves already
    straddle the lane tile the pad rounds up to (2 * (n2 % 128) > 128,
    e.g. n2=100 -> 128 costs nothing; n2=64 -> 128 would double the
    stage-1 lane tiles, so those plans keep the unflipped v3c stage 2
    unless the autotuner measures otherwise)."""
    return not flip_supported(plan) and 2 * (plan.n2 % 128) > 128


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "block_rows", "precision", "interpret", "slice_bins", "plan",
        "lane_pad", "padded_layout",
    ),
)
def stft_mag_fused2(
    left: jax.Array,   # [N, W] f32 full-window plane, left channel
    right: jax.Array,  # [N, W] f32, right channel
    cfg: SpectrogramConfig,
    block_rows: int | None = None,
    precision=jax.lax.Precision.HIGHEST,
    interpret: bool = False,
    slice_bins: bool = True,
    plan: FftPlan | None = None,
    lane_pad: bool | None = None,
    padded_layout: bool = False,
):
    """Fused four-step STFT: (magL, magR) each [N, num_bins], or the full
    [N, N/2] half-spectrum (bin index k = padded-FFT bin k, DC included)
    with slice_bins=False — the layout colormap_planes_builtin consumes
    against resample_matrix_full with zero copies in between.

    v4: window planes feed the kernel TRANSPOSED per stream ([N, n1, m]:
    the m axis rides the lanes, 1.7x tile padding instead of n1's 4x, and
    stage 1 becomes a last-axis contraction; probed OK on every geometry).
    Stage 2 uses the flipped (dT) orientation where it compiles directly
    (`flip_supported`: n2 % 128 == 0) — or, round 4, via the PADDED-LANE
    flip (`lane_pad`): DFT/twiddle constants zero-padded to n2p =
    padded_n2(plan) lanes make dT legal for any plan at no physical vector
    cost (the reference-native 2400/4800 geometry, fft.rs:33,44, whose
    n2=100 admits no 128-multiple factorization).  With `padded_layout`
    the [N, (n1/2)*n2p] output keeps the padded positions (exact zeros)
    for a padded-layout resample matrix to consume with zero slicing;
    otherwise the true-bin layout is sliced out.

    `plan` overrides the static-cost-model factorization (autotuner hook;
    must be an even-n1 plan for this geometry)."""
    from spectrogram_tpu.ops.mxu_fft import _block_plan_constants

    plan = plan or make_plan(cfg)
    if plan is None or plan.n1 % 2:
        raise ValueError(f"no even-n1 factorization for {cfg}")
    if block_rows is None:
        block_rows = default_block_rows(plan)
    if plan.n != cfg.padded_size or plan.m * plan.n1 != cfg.window_size:
        raise ValueError(f"plan {plan} does not fit geometry {cfg}")
    if cfg.pad_factor < 2:
        # half-spectrum covers bins 1..W-1 only when W <= N/2
        raise ValueError(f"fused STFT requires pad_factor >= 2, got {cfg}")
    if lane_pad is None:
        lane_pad = lane_pad_default(plan)
    if padded_layout and not lane_pad:
        raise ValueError("padded_layout requires lane_pad")
    if padded_layout and slice_bins:
        raise ValueError("padded_layout is a full-half-spectrum format")
    n, w = left.shape
    assert w == cfg.window_size, (w, cfg.window_size)
    ts = min(block_rows, n) if n % block_rows else block_rows
    if n % ts:
        pad = ts - n % ts
        left = jnp.pad(left, ((0, pad), (0, 0)))
        right = jnp.pad(right, ((0, pad), (0, 0)))
    n_pad = left.shape[0]
    n1, n2, m = plan.n1, plan.n2, plan.m
    half = (n1 // 2) * n2
    n2o = padded_n2(plan) if lane_pad else n2  # kernel output lane width
    half_o = (n1 // 2) * n2o
    left3 = jnp.swapaxes(left.reshape(n_pad, m, n1), 1, 2)   # [N, n1, m]
    right3 = jnp.swapaxes(right.reshape(n_pad, m, n1), 1, 2)
    hann2 = np.ascontiguousarray(_scaled_hann(w, m, n1).T)   # [n1, m]
    if lane_pad:
        f2cat, twcat, f1blk = _padded_stage1_constants(plan)
    else:
        f2cat, twr, twi, f1blk = _block_plan_constants(plan)
        twcat = np.concatenate([twr, twi], axis=1).astype(np.float32)  # [n1, 2n2]

    def const_spec(arr):
        return pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim, memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _kernel2, plan=plan, precision=precision, transposed=True,
        lane_pad=lane_pad,
    )
    mag_l, mag_r = pl.pallas_call(
        kernel,
        grid=(n_pad // ts,),
        in_specs=[
            pl.BlockSpec((ts, n1, m), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ts, n1, m), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            const_spec(hann2),
            const_spec(f2cat),
            const_spec(twcat),
            const_spec(f1blk),
        ],
        out_specs=[
            pl.BlockSpec(
                (ts, n1 // 2, n2o), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (ts, n1 // 2, n2o), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, n1 // 2, n2o), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, n1 // 2, n2o), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * 2 * (plan.complex_macs * 2),
            bytes_accessed=2 * n_pad * (w + half_o) * 4,
            transcendentals=2 * n_pad * half_o,
        ),
        interpret=interpret,
    )(left3, right3, jnp.asarray(hann2), jnp.asarray(f2cat), jnp.asarray(twcat),
      jnp.asarray(f1blk))
    if padded_layout:
        return mag_l.reshape(n_pad, half_o)[:n], mag_r.reshape(n_pad, half_o)[:n]
    if lane_pad:
        mag_l = mag_l[:, :, :n2]
        mag_r = mag_r[:, :, :n2]
    mag_l = mag_l.reshape(n_pad, half)[:n]
    mag_r = mag_r.reshape(n_pad, half)[:n]
    if slice_bins:
        return mag_l[:, 1:w], mag_r[:, 1:w]  # bins k = 1..W-1 (fft.rs:81)
    return mag_l, mag_r


def _kernel2_t(
    x_ref, hann_ref, f2cat_ref, twcat_ref, f1blk_ref, out_l_ref, out_r_ref,
    *, plan, precision,
):
    """Combined-channel v4 body: ONE [TS, 2, n1, m] operand; the channel
    split happens on the loaded VMEM value, so the XLA-side per-channel
    slice copies of the two-operand entry point never exist (the 10k-scale
    framing-glue fix, HLO-verified)."""
    x = x_ref[:]
    _fft_channel(x[:, 0], hann_ref, f2cat_ref, twcat_ref, f1blk_ref,
                 out_l_ref, plan=plan, precision=precision, transposed=True)
    _fft_channel(x[:, 1], hann_ref, f2cat_ref, twcat_ref, f1blk_ref,
                 out_r_ref, plan=plan, precision=precision, transposed=True)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "block_rows", "precision", "interpret", "plan"),
)
def stft_mag_fused2_t(
    x: jax.Array,  # [N, 2, n1, m] f32 TRANSPOSED stereo window blocks
    cfg: SpectrogramConfig,
    block_rows: int | None = None,
    precision=jax.lax.Precision.HIGHEST,
    interpret: bool = False,
    plan: FftPlan | None = None,
):
    """Fused STFT on combined-channel transposed window blocks.

    The operand layout IS the pipeline's transposed-carry buffer
    (x[n, c, j1, t] = window sample t*n1+j1 of channel c), so framing is
    concat + slice only — no channel splits, no [m, n1] -> [n1, m]
    transpose pass (models/spectrogram.py builds it incrementally).
    Returns (magL, magR) each [N, N_fft/2] (DC included), identical bits
    to `stft_mag_fused2` on the same plan."""
    from spectrogram_tpu.ops.mxu_fft import _block_plan_constants

    plan = plan or make_plan(cfg)
    if plan is None or plan.n1 % 2:
        raise ValueError(f"no even-n1 factorization for {cfg}")
    if plan.n != cfg.padded_size or plan.m * plan.n1 != cfg.window_size:
        raise ValueError(f"plan {plan} does not fit geometry {cfg}")
    if cfg.pad_factor < 2:
        raise ValueError(f"fused STFT requires pad_factor >= 2, got {cfg}")
    n1, n2, m = plan.n1, plan.n2, plan.m
    n = x.shape[0]
    if x.shape[1:] != (2, n1, m):
        raise ValueError(f"expected [N, 2, {n1}, {m}] blocks, got {x.shape}")
    if block_rows is None:
        block_rows = default_block_rows(plan)
    half = (n1 // 2) * n2
    ts = min(block_rows, n) if n % block_rows else block_rows
    if n % ts:
        x = jnp.pad(x, ((0, ts - n % ts), (0, 0), (0, 0), (0, 0)))
    n_pad = x.shape[0]
    hann2 = np.ascontiguousarray(_scaled_hann(cfg.window_size, m, n1).T)
    f2cat, twr, twi, f1blk = _block_plan_constants(plan)
    twcat = np.concatenate([twr, twi], axis=1).astype(np.float32)

    def const_spec(arr):
        return pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(_kernel2_t, plan=plan, precision=precision)
    mag_l, mag_r = pl.pallas_call(
        kernel,
        grid=(n_pad // ts,),
        in_specs=[
            pl.BlockSpec((ts, 2, n1, m), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            const_spec(hann2),
            const_spec(f2cat),
            const_spec(twcat),
            const_spec(f1blk),
        ],
        out_specs=[
            pl.BlockSpec((ts, n1 // 2, n2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ts, n1 // 2, n2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, n1 // 2, n2), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, n1 // 2, n2), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * 2 * (plan.complex_macs * 2),
            bytes_accessed=2 * n_pad * (cfg.window_size + half) * 4,
            transcendentals=2 * n_pad * half,
        ),
        interpret=interpret,
    )(x, jnp.asarray(hann2), jnp.asarray(f2cat), jnp.asarray(twcat),
      jnp.asarray(f1blk))
    return mag_l.reshape(n_pad, half)[:n], mag_r.reshape(n_pad, half)[:n]


def carry_transposed_supported(cfg: SpectrogramConfig,
                               plan: FftPlan | None = None) -> bool:
    """True when the transposed-carry state format applies: hop a multiple
    of the plan's n1, so every hop boundary falls between whole
    [n1]-columns of the transposed buffer."""
    plan = plan or make_plan(cfg)
    return (
        plan is not None
        and plan.n1 % 2 == 0
        and cfg.pad_factor >= 2
        and cfg.hop_size % plan.n1 == 0
    )


def buf_framing_supported(cfg: SpectrogramConfig, k: int = 1,
                          plan: FftPlan | None = None) -> bool:
    """True when the zero-copy buffer-window entry point applies: window and
    hop both multiples of the plan's n1, so every hop-shifted window is a
    whole-row slice of the [T/n1, n1]-viewed sample buffer.

    For k > 1 the window start rows r*(hop/n1) must additionally be
    sublane-aligned (multiples of 8) — Mosaic requires provable tiling
    divisibility for element-offset DMA on the second-minor dim."""
    plan = plan or make_plan(cfg)
    ok = (
        plan is not None
        and plan.n1 % 2 == 0
        and cfg.pad_factor >= 2
        and cfg.window_size % plan.n1 == 0
        and cfg.hop_size % plan.n1 == 0
    )
    if not ok:
        return False
    return k == 1 or (cfg.hop_size // plan.n1) % 8 == 0


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "k", "block_rows", "precision", "interpret", "plan"),
)
def stft_mag_fused2_buf(
    buf_l: jax.Array,  # [N, W + (k-1)*hop] f32 sample buffer, left channel
    buf_r: jax.Array,  # [N, W + (k-1)*hop] f32, right channel
    cfg: SpectrogramConfig,
    k: int = 1,
    block_rows: int = 32,
    precision=jax.lax.Precision.HIGHEST,
    interpret: bool = False,
    plan: FftPlan | None = None,
):
    """Fused STFT straight off per-channel carry+chunk sample planes: the k
    hop-shifted windows per stream are extracted by Element-indexed
    BlockSpecs (DMA offsets), eliminating the per-window slice copies the
    plane-input entry point forces.

    Round-3 change: operands are split per channel (2D [N, tlen] planes
    built by the pipeline's split-channel framing) instead of the 3D
    [N, 2, tlen] planar buffer — the channel-axis DMA stride that made this
    path a wash at k=1 in round 2 (DESIGN.md kernel ledger) is gone.

    Returns (magL, magR) each [k*N, N_fft/2] (DC included), window r of
    stream s at row r*N + s — the fused chain's native row order.
    Requires `buf_framing_supported(cfg)` (window and hop both multiples of
    the plan's n1).
    """
    plan = plan or make_plan(cfg)
    if not buf_framing_supported(cfg, k, plan):
        raise ValueError(
            f"buffer framing unsupported for {cfg} k={k} (plan={plan})"
        )
    w, h = cfg.window_size, cfg.hop_size
    n, tlen = buf_l.shape
    assert buf_r.shape == buf_l.shape and tlen == w + (k - 1) * h, (
        buf_l.shape, buf_r.shape, w, h, k)
    n1, n2, m = plan.n1, plan.n2, plan.m
    half = (n1 // 2) * n2
    ts = min(block_rows, n) if n % block_rows else block_rows
    if n % ts:
        pad = ((0, ts - n % ts), (0, 0))
        buf_l = jnp.pad(buf_l, pad)
        buf_r = jnp.pad(buf_r, pad)
    n_pad = buf_l.shape[0]
    buf_l3 = buf_l.reshape(n_pad, tlen // n1, n1)  # free view
    buf_r3 = buf_r.reshape(n_pad, tlen // n1, n1)
    hop_rows = h // n1

    hann2 = _scaled_hann(w, m, n1)
    from spectrogram_tpu.ops.mxu_fft import _block_plan_constants

    f2cat, twr, twi, f1blk = _block_plan_constants(plan)
    twcat = np.concatenate([twr, twi], axis=1).astype(np.float32)

    def const_spec(arr):
        return pl.BlockSpec(
            arr.shape, lambda r, i: (0,) * arr.ndim, memory_space=pltpu.VMEM
        )

    window_spec = pl.BlockSpec(
        (pl.Element(ts), pl.Element(m), pl.Element(n1)),
        lambda r, i: (i * ts, r * hop_rows, 0),
        memory_space=pltpu.VMEM,
    )

    kernel = functools.partial(_kernel2, plan=plan, precision=precision)
    blocks_per_k = n_pad // ts
    mag_l, mag_r = pl.pallas_call(
        kernel,
        grid=(k, blocks_per_k),
        in_specs=[
            window_spec,
            window_spec,
            const_spec(hann2),
            const_spec(f2cat),
            const_spec(twcat),
            const_spec(f1blk),
        ],
        out_specs=[
            pl.BlockSpec(
                (ts, n1 // 2, n2),
                lambda r, i: (r * blocks_per_k + i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (ts, n1 // 2, n2),
                lambda r, i: (r * blocks_per_k + i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((k * n_pad, n1 // 2, n2), jnp.float32),
            jax.ShapeDtypeStruct((k * n_pad, n1 // 2, n2), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * k * n_pad * 2 * (plan.complex_macs * 2),
            bytes_accessed=k * n_pad * (2 * w + 2 * half) * 4,
            transcendentals=2 * k * n_pad * half,
        ),
        interpret=interpret,
    )(buf_l3, buf_r3, jnp.asarray(hann2), jnp.asarray(f2cat),
      jnp.asarray(twcat), jnp.asarray(f1blk))
    if n_pad != n:
        # un-pad per window block: [k, n_pad, ...] -> [k, n, ...] -> flat
        mag_l = mag_l.reshape(k, n_pad, half)[:, :n].reshape(k * n, half)
        mag_r = mag_r.reshape(k, n_pad, half)[:, :n].reshape(k * n, half)
    else:
        mag_l = mag_l.reshape(k * n, half)
        mag_r = mag_r.reshape(k * n, half)
    return mag_l, mag_r
