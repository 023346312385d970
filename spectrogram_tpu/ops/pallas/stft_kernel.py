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
v4: transposed window planes + flipped stage 2 (1.39 ms at ts=64;
exp_stft_r3), v5 (current default where the flat-2D orientation applies):
PACKED-COMPLEX — both channels as one complex input, stage 1 a dense
K=2m dot, conjugate unpack in-kernel with a permutation-matmul lane
reversal (1.06 ms at ts=64, -16%; exp_stft_packed; split-real v4 stays
the fallback).  Stage 2 as 4 separate dots (no concat) VMEM-OOMs;
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
    k1h = n1 // 2
    if flip:
        d = _fft_stage2_flip(
            x, hann_ref, f2cat_ref, twcat_ref, f1blk_ref,
            plan=plan, precision=precision, transposed=transposed,
            lane_pad=lane_pad,
        )                                                 # [2k1h, TS, n2]
        dr, di = d[:k1h], d[k1h:]
        p = dr * dr + di * di                             # power, pre-transpose
        return jnp.transpose(jnp.sqrt(p), (1, 0, 2))      # [TS, k1h, n2]
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


def _fft_stage2_flip(x, hann_ref, f2cat_ref, twcat_ref, f1blk_ref,
                     *, plan, precision, transposed, lane_pad):
    """Shared front (Hann + stage 1 + twiddle + flipped stage 2) of the
    flip-orientation paths; returns d = [2k1h, TS, n2o]."""
    n1, m = plan.n1, plan.m
    n2 = padded_n2(plan) if lane_pad else plan.n2
    kw = dict(preferred_element_type=jnp.float32, precision=precision)
    twr_t = twcat_ref[:, :n2]
    twi_t = twcat_ref[:, n2:]
    x = x * hann_ref[:]
    contract = ((2,), (0,)) if transposed else ((1,), (0,))
    b = jax.lax.dot_general(x, f2cat_ref[:], (contract, ((), ())), **kw)
    br, bi = b[..., :n2], b[..., n2:]
    cr = br * twr_t - bi * twi_t
    ci = br * twi_t + bi * twr_t
    c_cat = jnp.concatenate([cr, ci], axis=1)
    return jax.lax.dot_general(
        f1blk_ref[:], c_cat, (((0,), (1,)), ((), ())), **kw
    )                                                     # [2k1h, TS, n2]


def _fft_channel_2d(x, hann_ref, f2cat_ref, twcat_ref, f1blk_ref, out_ref,
                    *, plan, precision, transposed=False, lane_pad=False):
    """Flip-path channel writing a FLAT [TS, k1h*n2o] output: per-k1
    magnitude rows store as 128-aligned lane-dim slices, so (a) the
    leading-axis output transpose disappears (d[k1] is already [TS, n2])
    and (b) the kernel's output tiling IS the [N, half] 2D layout the
    colormap kernel reads — deleting the XLA relayout copies between the
    two kernels (0.37 ms/push at 10,240 streams, HLO/profiler-identified:
    copy_bitcast_fusion on the 'stft_mag_fused2/reshape' edge).  Requires
    the flip orientation (direct or lane-padded) and n2o % 128 == 0."""
    n2o = padded_n2(plan) if lane_pad else plan.n2
    k1h = plan.n1 // 2
    d = _fft_stage2_flip(
        x, hann_ref, f2cat_ref, twcat_ref, f1blk_ref,
        plan=plan, precision=precision, transposed=transposed,
        lane_pad=lane_pad,
    )
    dr, di = d[:k1h], d[k1h:]
    for k1 in range(k1h):
        p = dr[k1] * dr[k1] + di[k1] * di[k1]             # [TS, n2o]
        out_ref[:, k1 * n2o : (k1 + 1) * n2o] = jnp.sqrt(p)


def _kernel2_2d(
    left_ref, right_ref, hann_ref, f2cat_ref, twcat_ref, f1blk_ref,
    out_l_ref, out_r_ref,
    *, plan, precision, transposed=False, lane_pad=False,
):
    """v4 kernel body with flat 2D outputs (see _fft_channel_2d)."""
    for ref, out_ref in ((left_ref, out_l_ref), (right_ref, out_r_ref)):
        _fft_channel_2d(ref[:], hann_ref, f2cat_ref, twcat_ref, f1blk_ref,
                        out_ref, plan=plan, precision=precision,
                        transposed=transposed, lane_pad=lane_pad)


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


def packed_supported(plan: FftPlan, lane_pad: bool = False) -> bool:
    """True when the packed-complex (stereo-packed) kernel formulation
    applies: even n1 and a flat-2D-capable output (direct flip gate or the
    padded-lane flip), since the conjugate unpack writes per-k1 128-aligned
    lane slices exactly like `_fft_channel_2d`.

    The formulation is the reference's own stereo packing (z = l + i*r,
    one complex FFT, conjugate-symmetry unpack; fft.rs:57,81-92), rebuilt
    as MXU structure: stage 1 contracts BOTH channels in one K=2m dot
    (dense 128-wide at the bench plan vs split-real's two half-empty K=m
    dots), stage 2 runs the full n1-point DFT once, and the unpack's
    index reversal is one batched [*, n2o] x [n2o, n2o] permutation
    matmul over VMEM values.  Pass-count model per TS row block:
    split-real 192 MXU passes -> packed 160 (prediction -17%; measured
    better, see exp_stft_packed).  Round-1 rejected stereo packing as an
    XLA-level path because the unpack reverse cost HBM passes
    (mxu_fft.stft_rows_split_planar); in-kernel the economics invert."""
    return plan.n1 % 2 == 0 and (lane_pad or flip_supported(plan))


@functools.lru_cache(maxsize=32)
def _packed_plan_constants(plan: FftPlan, lane_pad: bool = False):
    """(f2p, twcat, f1full, prev) for the packed-complex kernel.

    f2p [2m, 2*n2o]: [[f2r | f2i], [-f2i | f2r]] — the complex stage-1 DFT
        on z = l + i*r as ONE dense contraction over both channel windows.
    twcat [n1, 2*n2o]: the usual twiddle (applied once, not per channel).
    f1full [2n1, 2n1]: [[f1r, f1i], [-f1i, f1r]] with the FULL n1-point
        stage-2 DFT — the unpack needs all k1 rows of Z, not the half
        spectrum (Z[-k] lives in the upper rows).
    prev [n2o, n2o]: lane-reversal permutation, prev[n2-k2, k2] = 1 for
        k2 = 1..n2-1; column 0 zero — bin (k1, 0)'s conjugate partner sits
        at row (n1-k1) % n1 lane 0 and is patched in with a mask.  Under
        lane_pad the wrap is at the LOGICAL n2 (e.g. 120 inside 128 lanes,
        the tuned 2400/4800 plan), which a matmul expresses for free and a
        vector roll cannot.
    """
    n2, n2o = plan.n2, padded_n2(plan) if lane_pad else plan.n2
    m, n1 = plan.m, plan.n1
    i2 = np.arange(m)[:, None] * np.arange(n2)[None, :]
    f2 = np.exp(-2j * np.pi * i2 / n2)
    f2r = np.zeros((m, n2o), np.float32)
    f2i = np.zeros((m, n2o), np.float32)
    f2r[:, :n2] = f2.real
    f2i[:, :n2] = f2.imag
    f2p = np.block([[f2r, f2i], [-f2i, f2r]]).astype(np.float32)
    it = np.arange(n1)[:, None] * np.arange(n2)[None, :]
    tw = np.exp(-2j * np.pi * it / plan.n)
    twcat = np.zeros((n1, 2 * n2o), np.float32)
    twcat[:, :n2] = tw.real
    twcat[:, n2o : n2o + n2] = tw.imag
    i1 = np.arange(n1)[:, None] * np.arange(n1)[None, :]
    f1 = np.exp(-2j * np.pi * i1 / n1)
    f1full = np.block(
        [[f1.real, f1.imag], [-f1.imag, f1.real]]
    ).astype(np.float32)                                     # [2n1, 2n1]
    prev = np.zeros((n2o, n2o), np.float32)
    for k2 in range(1, n2):
        prev[n2 - k2, k2] = 1.0
    return f2p, twcat, f1full, prev


def _packed_hann(w: int, m: int, n1: int, transposed: bool) -> "np.ndarray":
    """Hann with 1/w folded (the 2/w output scale times the unpack's 1/2 —
    an exact exponent shift for power-of-two windows), doubled over the
    channel halves: [n1, 2m] for transposed operands, [2m, n1] otherwise."""
    h = _scaled_hann(w, m, n1) * 0.5                         # [m, n1]
    if transposed:
        return np.ascontiguousarray(np.concatenate([h.T, h.T], axis=1))
    return np.concatenate([h, h], axis=0)


def _packed_mag_rows(zcat, f2p_ref, twcat_ref, f1full_ref, prev_ref,
                     *, plan, precision, transposed, lane_pad,
                     unpack_split=0, ablate=None, s1_flat=False):
    """Packed-complex four-step + conjugate unpack on an already-Hann'd
    zcat ([ts, n1, 2m] when transposed, else [ts, 2m, n1]); returns
    (rows_l, rows_r): k1h [ts, n2o] magnitude rows each (flat bin
    k = k1*n2 + k2; padded lanes exact zeros under lane_pad).

    Unpack index map (mxu_fft._plan_constants: flat bin k = n2*k1 + k2):
    -k mod N = (n1-1-k1, n2-k2) for k2 >= 1 and ((n1-k1) % n1, 0) for
    k2 = 0 — the k2 reversal is the `prev` matmul batched over the rows
    that feed it, the k2=0 column is patched from row (n1-k1) % n1 = the
    reversal row + 1 mod n1, and conj() folds into the unpack signs:
      L = |Z[k] + conj(Z[-k])| / 2,  R = |Z[k] - conj(Z[-k])| / 2
    (fft.rs:81-92; the 1/2 lives in the Hann constant).

    `unpack_split` (0 | 2 | 3): MXU pass count for the `prev` permutation
    dot.  0 = plain f32 dot at `precision` (HIGHEST = 6 bf16 passes).
    n >= 2 = the data operand split into n bf16 terms (h = bf16(r);
    r -= h), each contracted against the bf16 permutation matrix in ONE
    DEFAULT pass and summed in f32.  The permutation operand is EXACT in
    bf16 (entries 0/1) and each output lane sums exactly one product, so
    the only error is the split residual: <= 2^-18 relative at n=2,
    <= 2^-27 (below f32 eps scale) at n=3 — the prev dot's 32 passes drop
    to n*32/6.  This is NOT legal for the FFT stages themselves (their
    coefficient operands are irrational; bf16 rounding of cancelling
    sums raises tonal leakage floors — round-3 lesson), but prev does no
    arithmetic, only movement."""
    n1, n2 = plan.n1, plan.n2
    n2o = padded_n2(plan) if lane_pad else n2
    k1h = n1 // 2
    kw = dict(preferred_element_type=jnp.float32, precision=precision)
    contract = ((2,), (0,)) if transposed else ((1,), (0,))
    if ablate == "hann":
        # pre-dot prefix: operand DMA + lane concat + Hann multiply only
        # (rows fabricated from zcat — needs 2m >= n2o lanes, true on the
        # production plans)
        rows = [zcat[:, k1 % zcat.shape[1], :n2o] for k1 in range(k1h)]
        return rows, [r * 0.5 for r in rows]
    if s1_flat and transposed:
        # Round-5 (exp_stft_ablate): the 3D [ts, n1, 2m] x [2m, 2n2o] form
        # measured ~2.2x worse per MXU pass than stage 2 — the leading
        # dims lower as n1-row-tall sub-matmuls that underfill the 128-row
        # MXU.  Collapsing [ts, n1] into one flat M makes stage 1 a single
        # fully-tiled [ts*n1, 2m] x [2m, 2n2o] dot.  Bitwise: the per-row
        # contraction (K order included) is unchanged; only the M tiling
        # differs.
        ts_, n1_, k2m = zcat.shape
        b = jax.lax.dot_general(
            zcat.reshape(ts_ * n1_, k2m), f2p_ref[:],
            (((1,), (0,)), ((), ())), **kw
        ).reshape(ts_, n1_, -1)
    else:
        b = jax.lax.dot_general(zcat, f2p_ref[:], (contract, ((), ())), **kw)
    br, bi = b[..., :n2o], b[..., n2o:]                # [ts, n1, n2o]
    # `ablate` (TIMING-ONLY, never bitwise, never a production path): stop
    # after a stage prefix and emit rows fabricated from the deepest
    # computed tensor — every element of that tensor feeds an output, so
    # nothing is DCE'd.  Stage wall shares = deltas between consecutive
    # prefixes; the relay-compatible substitute for in-kernel timers
    # (VERDICT r4 #2).  Stages: "s1" (stage-1 dot), "tw" (+twiddle),
    # "s2" (+stage-2 dot), "noprev" (full unpack minus the prev
    # permutation dot), "nounpack" (everything but the magnitude
    # sqrt/squares), None = the real kernel.
    if ablate == "s1":
        return (
            [br[:, k1] + bi[:, k1] for k1 in range(k1h)],
            [br[:, k1h + k1] - bi[:, k1h + k1] for k1 in range(k1h)],
        )
    twr, twi = twcat_ref[:, :n2o], twcat_ref[:, n2o:]
    cr = br * twr - bi * twi
    ci = br * twi + bi * twr
    if ablate == "tw":
        return (
            [cr[:, k1] + ci[:, k1] for k1 in range(k1h)],
            [cr[:, k1h + k1] - ci[:, k1h + k1] for k1 in range(k1h)],
        )
    c_cat = jnp.concatenate([cr, ci], axis=1)          # [ts, 2n1, n2o]
    d = jax.lax.dot_general(
        f1full_ref[:], c_cat, (((0,), (1,)), ((), ())), **kw
    )                                                  # [2n1, ts, n2o]
    if ablate == "s2":
        return (
            [d[k1] + d[n1 + k1] for k1 in range(k1h)],
            [d[k1h + k1] + d[n1 + k1h + k1] for k1 in range(k1h)],
        )
    # Reversed-lane rows for the unpack: rows k1h..n1-1 of both components
    # through the permutation matmul (ONE batched dot: 32 MXU passes/row
    # at the bench plan vs 128 for the two stages).
    d_hi = jnp.concatenate([d[k1h:n1], d[n1 + k1h :]], axis=0)
    if ablate == "noprev":
        zm_all = d_hi * 0.5  # keep d_hi live without the permutation dot
    elif unpack_split:
        pbf = prev_ref[:].astype(jnp.bfloat16)         # exact: entries 0/1
        dims = (((2,), (0,)), ((), ()))
        kw1 = dict(preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.DEFAULT)
        r = d_hi
        zm_all = None
        for i in range(unpack_split):
            h = r.astype(jnp.bfloat16)
            t = jax.lax.dot_general(h, pbf, dims, **kw1)
            zm_all = t if zm_all is None else zm_all + t
            if i + 1 < unpack_split:
                r = r - h.astype(jnp.float32)
    else:
        zm_all = jax.lax.dot_general(
            d_hi, prev_ref[:], (((2,), (0,)), ((), ())), **kw
        )                                              # [n1, ts, n2o]
    e0 = (jax.lax.broadcasted_iota(jnp.int32, (1, n2o), 1) == 0).astype(
        jnp.float32
    )
    rows_l, rows_r = [], []
    for k1 in range(k1h):
        ar, ai = d[k1], d[n1 + k1]                     # Z[k1]
        j2 = (n1 - k1) % n1                            # lane-0 source row
        zmr = zm_all[k1h - 1 - k1] + d[j2] * e0        # Z[-k] (pre-conj)
        zmi = zm_all[n1 - 1 - k1] + d[n1 + j2] * e0
        if ablate == "nounpack":
            rows_l.append(ar + zmr)
            rows_r.append(ai + zmi)
            continue
        rows_l.append(jnp.sqrt((ar + zmr) ** 2 + (ai - zmi) ** 2))
        rows_r.append(jnp.sqrt((ar - zmr) ** 2 + (ai + zmi) ** 2))
    return rows_l, rows_r


def _kernel_packed_2d(
    left_ref, right_ref, hann_ref, f2p_ref, twcat_ref, f1full_ref, prev_ref,
    out_l_ref, out_r_ref, *, plan, precision, lane_pad=False,
    unpack_split=0, ablate=None, s1_flat=False,
):
    """Packed-complex kernel body, transposed window planes ([TS, n1, m]
    per channel — the production operand layout; the lane concat into
    [TS, n1, 2m] happens on loaded VMEM values and measured free,
    exp_stft_packed pk_ik), flat 2D outputs.

    int16 operands (i16_planes wire mode): the cast to f32 happens here
    on VMEM values (VPU, fully overlapped with the DMA-bound operand
    leg) and the caller pre-folds the exact 2^-15 wire scale into
    hann_ref — bitwise equal to the f32 path fed int16/32768, at HALF
    the operand DMA bytes (exp_stft_dma: 1.95 -> 1.21 ms at 16,384
    rows for the two-operand leg)."""
    n2o = padded_n2(plan) if lane_pad else plan.n2
    zcat = jnp.concatenate([left_ref[:], right_ref[:]], axis=2)
    if zcat.dtype != jnp.float32:
        zcat = zcat.astype(jnp.float32)
    zcat = zcat * hann_ref[:]
    rows_l, rows_r = _packed_mag_rows(
        zcat, f2p_ref, twcat_ref, f1full_ref, prev_ref,
        plan=plan, precision=precision, transposed=True, lane_pad=lane_pad,
        unpack_split=unpack_split, ablate=ablate, s1_flat=s1_flat,
    )
    for k1, (ol, orr) in enumerate(zip(rows_l, rows_r)):
        out_l_ref[:, k1 * n2o : (k1 + 1) * n2o] = ol
        out_r_ref[:, k1 * n2o : (k1 + 1) * n2o] = orr


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
        "lane_pad", "padded_layout", "out_2d", "packed", "unpack_split",
        "ablate_stage", "s1_flat",
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
    out_2d: bool | None = None,
    packed: bool = False,
    unpack_split: int = 0,
    ablate_stage: str | None = None,
    s1_flat: bool = False,
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
    i16_in = left.dtype == jnp.int16
    if i16_in and not packed:
        raise ValueError(
            "int16 sample planes are supported on the packed formulation "
            "only (i16_planes wire mode)"
        )
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

    # Flat 2D outputs whenever the flip orientation runs: the kernel's
    # output tiling then IS the [N, half] layout the colormap kernel
    # reads, deleting the XLA relayout copies between the two kernels
    # (0.37 ms/push at 10,240 streams) AND the in-kernel output
    # transpose (see _fft_channel_2d).
    if out_2d is None:
        out_2d = lane_pad or flip_supported(plan)
    out_2d = out_2d and (lane_pad or flip_supported(plan))
    if ablate_stage is not None and not packed:
        raise ValueError(
            "ablate_stage is a packed-kernel timing probe (never bitwise); "
            "it requires packed=True"
        )
    if packed:
        if not packed_supported(plan, lane_pad):
            raise ValueError(
                f"packed formulation unsupported for plan {plan} "
                f"(lane_pad={lane_pad})"
            )
        out_2d = True
        hann2 = _packed_hann(w, m, n1, transposed=True)      # [n1, 2m]
        if i16_in:
            # exact exponent shift: the int16 wire scale rides the window
            hann2 = hann2 * np.float32(2.0 ** -15)
        f2cat, twcat, f1full, prev = _packed_plan_constants(plan, lane_pad)
        kernel = functools.partial(
            _kernel_packed_2d, plan=plan, precision=precision,
            lane_pad=lane_pad, unpack_split=unpack_split,
            ablate=ablate_stage, s1_flat=s1_flat,
        )
        extra_consts = (f1full, prev)
    else:
        extra_consts = None
        kernel = functools.partial(
            _kernel2_2d if out_2d else _kernel2,
            plan=plan, precision=precision, transposed=True,
            lane_pad=lane_pad,
        )
    if out_2d:
        out_spec = pl.BlockSpec((ts, half_o), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        out_sds = jax.ShapeDtypeStruct((n_pad, half_o), jnp.float32)
    else:
        out_spec = pl.BlockSpec((ts, n1 // 2, n2o), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        out_sds = jax.ShapeDtypeStruct((n_pad, n1 // 2, n2o), jnp.float32)
    consts = (
        [hann2, f2cat, twcat, *extra_consts]
        if packed
        else [hann2, f2cat, twcat, f1blk]
    )
    mag_l, mag_r = pl.pallas_call(
        kernel,
        grid=(n_pad // ts,),
        in_specs=[
            pl.BlockSpec((ts, n1, m), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ts, n1, m), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ] + [const_spec(c) for c in consts],
        out_specs=[out_spec, out_spec],
        out_shape=[out_sds, out_sds],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * 2 * (plan.complex_macs * 2),
            bytes_accessed=2 * n_pad * (w + half_o) * 4,
            transcendentals=2 * n_pad * half_o,
        ),
        interpret=interpret,
    )(left3, right3, *[jnp.asarray(c) for c in consts])
    if padded_layout:
        return mag_l.reshape(n_pad, half_o)[:n], mag_r.reshape(n_pad, half_o)[:n]
    if lane_pad:
        mag_l = mag_l.reshape(n_pad, n1 // 2, n2o)[:, :, :n2]
        mag_r = mag_r.reshape(n_pad, n1 // 2, n2o)[:, :, :n2]
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


def split_framing_supported(cfg: SpectrogramConfig, k: int = 1,
                            plan: FftPlan | None = None) -> bool:
    """True when the split-operand framing kernel applies: hop a multiple of
    the plan's n1, so every window's carry/chunk boundary (and every
    hop-shifted window start) falls between whole n1-rows of the
    [rows, n1]-viewed operands.  Much weaker than `buf_framing_supported`'s
    sublane-alignment gate — in-kernel VALUE slices carry no Mosaic DMA
    divisibility proof obligation (probed 2026-08-17, exp_stft_allk:
    bitwise-equal at hop_rows=25)."""
    plan = plan or make_plan(cfg)
    return (
        plan is not None
        and plan.n1 % 2 == 0
        and cfg.pad_factor >= 2
        and cfg.hop_size % plan.n1 == 0
    )


def _allk_kernel(
    bl_ref,      # [TS, R, n1] f32 — left-channel carry+chunk buffer rows
    br_ref,      # [TS, R, n1] f32 — right channel
    hann_ref, f2cat_ref, twcat_ref, f1blk_ref,
    out_l_ref,   # [k, TS, k1h, n2o]
    out_r_ref,
    *, plan, k, hop_rows, precision, lane_pad, carry_rows=0,
    out_carry_ref=None,
):
    """All-windows STFT body (round-4 framing-glue kill, exp_stft_allk B).

    One grid step loads a stream block of the WHOLE carry+chunk buffer and
    extracts the k hop-shifted windows as in-kernel STATIC value slices
    (sublane offsets r*hop_rows — legal on values for ANY hop alignment,
    unlike the element-offset DMA form's %8 gate).  Unique sample bytes are
    read once instead of the W/hop overlap factor, and the materialized
    window planes (1.3 GB of HBM write+read at 10,240 streams, k=8) never
    exist.  Measured bitwise-equal to the plane path, 14.36 -> 11.63 ms
    at 4096 streams k=8 including the deleted copies.

    `out_carry_ref` ([TS, 2, carry_rows, n1]) optionally emits next-push
    carry (the buffer's last carry_rows rows) — two static VMEM writes that
    delete the XLA new-carry pass."""
    m = plan.m
    out_2d = lane_pad or flip_supported(plan)
    n2o = padded_n2(plan) if lane_pad else plan.n2
    k1h = plan.n1 // 2

    for ch, (ref, out_ref) in enumerate(
        ((bl_ref, out_l_ref), (br_ref, out_r_ref))
    ):
        v = ref[:]                                   # [ts, R, n1]
        if out_carry_ref is not None:
            out_carry_ref[:, ch] = v[:, v.shape[1] - carry_rows :]
        for r in range(k):
            x = v[:, r * hop_rows : r * hop_rows + m, :]
            if out_2d:
                # flat [ts, half] output: no in-kernel transpose, and the
                # output tiling matches the colormap operand layout (see
                # _fft_channel_2d)
                d = _fft_stage2_flip(
                    x, hann_ref, f2cat_ref, twcat_ref, f1blk_ref,
                    plan=plan, precision=precision, transposed=False,
                    lane_pad=lane_pad,
                )
                dr, di = d[:k1h], d[k1h:]
                for k1 in range(k1h):
                    p = dr[k1] * dr[k1] + di[k1] * di[k1]
                    out_ref[r, :, k1 * n2o : (k1 + 1) * n2o] = jnp.sqrt(p)
                continue
            # same orientation selection as the plane path (flip where
            # Mosaic supports it, v3c otherwise, padded flip under
            # lane_pad) -> bitwise-equal across ALL plan classes
            out_ref[r] = _fft_mag_value(
                x, hann_ref, f2cat_ref, twcat_ref, f1blk_ref,
                plan=plan, precision=precision, transposed=False,
                flip=True if lane_pad else None, lane_pad=lane_pad,
            )


def _allk_kernel_packed(
    bl_ref,      # [TS, R, n1] f32 — left-channel carry+chunk buffer rows
    br_ref,      # [TS, R, n1] f32 — right channel
    hann_ref, f2p_ref, twcat_ref, f1full_ref, prev_ref,
    out_l_ref,   # [k, TS, half_o] flat per-window magnitude rows
    out_r_ref,
    *, plan, k, hop_rows, precision, lane_pad, carry_rows=0,
    out_carry_ref=None, unpack_split=0,
):
    """Packed-complex all-windows body: the _allk_kernel window slicing
    with the stereo-packed four-step per window (see _packed_mag_rows) —
    stage 1 contracts both channels in one dense K=2m dot.  Requires the
    flat-2D output layout (packed_supported)."""
    m = plan.m
    n2o = padded_n2(plan) if lane_pad else plan.n2
    vl = bl_ref[:]                                   # [ts, R, n1]
    vr = br_ref[:]
    if out_carry_ref is not None:
        out_carry_ref[:, 0] = vl[:, vl.shape[1] - carry_rows :]
        out_carry_ref[:, 1] = vr[:, vr.shape[1] - carry_rows :]
    hann = hann_ref[:]                               # [2m, n1]
    for r in range(k):
        xl = vl[:, r * hop_rows : r * hop_rows + m, :]
        xr = vr[:, r * hop_rows : r * hop_rows + m, :]
        zcat = jnp.concatenate([xl, xr], axis=1)          # [ts, 2m, n1]
        if zcat.dtype != jnp.float32:
            # i16_planes wire mode: cast in-VMEM; the 2^-15 scale is
            # folded into hann by the caller (see _kernel_packed_2d)
            zcat = zcat.astype(jnp.float32)
        zcat = zcat * hann
        rows_l, rows_r = _packed_mag_rows(
            zcat, f2p_ref, twcat_ref, f1full_ref, prev_ref,
            plan=plan, precision=precision, transposed=False,
            lane_pad=lane_pad, unpack_split=unpack_split,
        )
        for k1, (ol, orr) in enumerate(zip(rows_l, rows_r)):
            out_l_ref[r, :, k1 * n2o : (k1 + 1) * n2o] = ol
            out_r_ref[r, :, k1 * n2o : (k1 + 1) * n2o] = orr


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "k", "block_rows", "precision", "interpret", "plan",
        "lane_pad", "padded_layout", "emit_carry", "packed", "unpack_split",
    ),
)
def stft_mag_fused2_allk(
    buf_l: jax.Array,   # [S, W + (k-1)*hop] f32 carry+chunk plane, left
    buf_r: jax.Array,   # [S, W + (k-1)*hop] f32, right
    cfg: SpectrogramConfig,
    k: int = 1,
    block_rows: int | None = None,
    precision=jax.lax.Precision.HIGHEST,
    interpret: bool = False,
    plan: FftPlan | None = None,
    lane_pad: bool | None = None,
    padded_layout: bool = False,
    emit_carry: bool = False,
    packed: bool = False,
    unpack_split: int = 0,
):
    """All-windows fused STFT off per-channel carry+chunk planes (see
    _allk_kernel).  Requires `split_framing_supported` (hop % n1 == 0 —
    the weak gate; works at ANY hop_rows alignment incl. the bench
    geometry's 25).  Returns (magL, magR[, new_carry]) with magnitudes
    [k*S, N_fft/2] in window-major row order (r*S + s) and new_carry
    [S, 2, W-hop] when `emit_carry`."""
    plan = plan or make_plan(cfg)
    if not split_framing_supported(cfg, k, plan):
        raise ValueError(f"allk framing unsupported for {cfg} (plan={plan})")
    if lane_pad is None:
        lane_pad = lane_pad_default(plan)
    if padded_layout and not lane_pad:
        raise ValueError("padded_layout requires lane_pad")
    n1, n2, m = plan.n1, plan.n2, plan.m
    w, h = cfg.window_size, cfg.hop_size
    s, tlen = buf_l.shape
    assert buf_r.shape == buf_l.shape and tlen == w + (k - 1) * h, (
        buf_l.shape, buf_r.shape, w, h, k)
    k1h = n1 // 2
    n2o = padded_n2(plan) if lane_pad else n2
    half_o = k1h * n2o
    c_rows = (w - h) // n1
    if buf_l.dtype == jnp.int16 and not packed:
        raise ValueError(
            "int16 sample planes are supported on the packed formulation "
            "only (i16_planes wire mode)"
        )
    if block_rows is None:
        block_rows = 16
    ts = min(block_rows, s) if s % block_rows else block_rows
    if s % ts:
        pad = ((0, ts - s % ts), (0, 0))
        buf_l = jnp.pad(buf_l, pad)
        buf_r = jnp.pad(buf_r, pad)
    s_pad = buf_l.shape[0]
    r_rows = tlen // n1
    bl3 = buf_l.reshape(s_pad, r_rows, n1)
    br3 = buf_r.reshape(s_pad, r_rows, n1)
    if packed:
        if not packed_supported(plan, lane_pad):
            raise ValueError(
                f"packed formulation unsupported for plan {plan} "
                f"(lane_pad={lane_pad})"
            )
        hann2 = _packed_hann(w, m, n1, transposed=False)     # [2m, n1]
        if buf_l.dtype == jnp.int16:
            hann2 = hann2 * np.float32(2.0 ** -15)  # exact wire-scale fold
        f2cat, twcat, f1full, prev = _packed_plan_constants(plan, lane_pad)
        consts = [hann2, f2cat, twcat, f1full, prev]
        kernel = functools.partial(
            _allk_kernel_packed, plan=plan, k=k, hop_rows=h // n1,
            precision=precision, lane_pad=lane_pad, carry_rows=c_rows,
            unpack_split=unpack_split,
        )
    else:
        hann2 = _scaled_hann(w, m, n1)
        if lane_pad:
            f2cat, twcat, f1blk = _padded_stage1_constants(plan)
        else:
            from spectrogram_tpu.ops.mxu_fft import _block_plan_constants

            f2cat, twr, twi, f1blk = _block_plan_constants(plan)
            twcat = np.concatenate([twr, twi], axis=1).astype(np.float32)
        consts = [hann2, f2cat, twcat, f1blk]
        kernel = functools.partial(
            _allk_kernel, plan=plan, k=k, hop_rows=h // n1,
            precision=precision, lane_pad=lane_pad, carry_rows=c_rows,
        )

    def const_spec(arr):
        return pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                            memory_space=pltpu.VMEM)

    if lane_pad or flip_supported(plan):
        # flat per-window rows (see _allk_kernel's out_2d path)
        out_spec = pl.BlockSpec((k, ts, half_o), lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM)
        out_sds = jax.ShapeDtypeStruct((k, s_pad, half_o), jnp.float32)
    else:
        out_spec = pl.BlockSpec((k, ts, k1h, n2o), lambda i: (0, i, 0, 0),
                                memory_space=pltpu.VMEM)
        out_sds = jax.ShapeDtypeStruct((k, s_pad, k1h, n2o), jnp.float32)
    out_specs = [out_spec, out_spec]
    out_shape = [out_sds, out_sds]
    if emit_carry:
        body = lambda *refs: kernel(*refs[:-1], out_carry_ref=refs[-1])
        out_specs.append(
            pl.BlockSpec((ts, 2, c_rows, n1), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        out_shape.append(
            jax.ShapeDtypeStruct((s_pad, 2, c_rows, n1), buf_l.dtype)
        )
    else:
        body = kernel
    outs = pl.pallas_call(
        body,
        grid=(s_pad // ts,),
        in_specs=[
            pl.BlockSpec((ts, r_rows, n1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ts, r_rows, n1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [const_spec(c) for c in consts],
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=2 * k * s_pad * 2 * (plan.complex_macs * 2),
            bytes_accessed=s_pad * 2 * (tlen + k * half_o) * 4,
            transcendentals=2 * k * s_pad * half_o,
        ),
        interpret=interpret,
    )(bl3, br3, *[jnp.asarray(c) for c in consts])
    mag_l, mag_r = outs[0], outs[1]
    if s_pad != s:
        mag_l, mag_r = mag_l[:, :s], mag_r[:, :s]
    mag_l = mag_l.reshape(k * s, half_o)
    mag_r = mag_r.reshape(k * s, half_o)
    if lane_pad and not padded_layout:
        def unpad(mag):
            return mag.reshape(-1, k1h, n2o)[:, :, :n2].reshape(
                mag.shape[0], k1h * n2
            )
        mag_l, mag_r = unpad(mag_l), unpad(mag_r)
    if emit_carry:
        new_carry = outs[2]
        if s_pad != s:
            new_carry = new_carry[:s]
        return mag_l, mag_r, new_carry.reshape(s, 2, w - h)
    return mag_l, mag_r


def _split_kernel(
    carry_ref,   # [TS, 2, c_rows, n1] f32 — the state's planar carry, viewed
    chunk_ref,   # [TS, 2, t_rows, n1] f32 — the pushed chunk, viewed
    hann_ref, f2cat_ref, twcat_ref, f1blk_ref,
    out_l_ref,   # [k, TS, k1h, n2o]
    out_r_ref,
    out_carry_ref,  # [TS, 2, c_rows, n1] — next push's carry
    *, plan, k, precision, lane_pad,
):
    """Split-operand all-windows STFT body (round-4 framing-glue kill).

    Consumes carry + chunk DIRECTLY: window r's rows [r*hop_rows,
    r*hop_rows + m) are assembled as up-to-two in-kernel VALUE slices (the
    carry part and the chunk part), each Hann'd with the matching row range
    and contracted against the matching rows of the stage-1 DFT — stage 1
    becomes up to two ACCUMULATING dots, so the carry/chunk concat never
    exists in HBM or VMEM.  Next-push carry is emitted as two static VMEM
    writes.  Bitwise-equal to the materialized-plane path when the dot
    split is avoided (nc in {0, m}); <= 1 ulp otherwise (the two partial
    sums associate at the boundary exactly where f32 addition would)."""
    n1, m = plan.n1, plan.m
    n2 = padded_n2(plan) if lane_pad else plan.n2
    kw = dict(preferred_element_type=jnp.float32, precision=precision)
    twr_t = twcat_ref[:, :n2]
    twi_t = twcat_ref[:, n2:]
    k1h = n1 // 2
    hann = hann_ref[:]
    f2 = f2cat_ref[:]
    c_rows = carry_ref.shape[2]
    t_rows = chunk_ref.shape[2]
    hop_rows = t_rows // k

    for ch, out_ref in ((0, out_l_ref), (1, out_r_ref)):
        cv = carry_ref[:, ch]          # [ts, c_rows, n1]
        kv = chunk_ref[:, ch]          # [ts, t_rows, n1]
        keep = c_rows - t_rows
        if keep > 0:
            out_carry_ref[:, ch, :keep] = cv[:, t_rows:]
            out_carry_ref[:, ch, keep:] = kv
        else:
            out_carry_ref[:, ch] = kv[:, t_rows - c_rows :]
        for r in range(k):
            s0 = r * hop_rows
            nc = max(0, min(c_rows - s0, m))
            parts = []
            if nc > 0:
                parts.append((cv[:, s0 : s0 + nc], 0))
            if nc < m:
                k0 = max(0, s0 - c_rows)
                parts.append((kv[:, k0 : k0 + (m - nc)], nc))
            b = None
            for seg, h0 in parts:
                x = seg * hann[h0 : h0 + seg.shape[1]]
                d_ = jax.lax.dot_general(
                    x, f2[h0 : h0 + seg.shape[1]],
                    (((1,), (0,)), ((), ())), **kw
                )
                b = d_ if b is None else b + d_
            br_, bi_ = b[..., :n2], b[..., n2:]
            cr = br_ * twr_t - bi_ * twi_t
            ci = br_ * twi_t + bi_ * twr_t
            c_cat = jnp.concatenate([cr, ci], axis=1)     # [ts, 2n1, n2]
            d = jax.lax.dot_general(
                f1blk_ref[:], c_cat, (((0,), (1,)), ((), ())), **kw
            )                                             # [2k1h, ts, n2]
            dr, di = d[:k1h], d[k1h:]
            p = dr * dr + di * di
            out_ref[r] = jnp.transpose(jnp.sqrt(p), (1, 0, 2))


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "k", "block_rows", "precision", "interpret", "plan",
        "lane_pad", "padded_layout",
    ),
)
def stft_mag_fused2_split(
    carry: jax.Array,     # [S, 2, C] f32 planar sample history (C = W - hop)
    chunk_pl: jax.Array,  # [S, 2, k*hop] f32 planar chunk
    cfg: SpectrogramConfig,
    k: int = 1,
    block_rows: int | None = None,
    precision=jax.lax.Precision.HIGHEST,
    interpret: bool = False,
    plan: FftPlan | None = None,
    lane_pad: bool | None = None,
    padded_layout: bool = False,
):
    """Fused STFT straight off the state carry + pushed chunk — the round-4
    framing formulation (VERDICT r4 item 1): no carry+chunk concat, no
    materialized window planes, and next-push carry emitted by the kernel.

    Per channel, stage 1 of every hop-shifted window runs as up-to-two
    accumulating dots over in-kernel value slices of the two operands (see
    _split_kernel).  Requires `split_framing_supported` (hop % n1 == 0).

    Returns (magL, magR, new_carry): magnitudes [k*S, N_fft/2] (window r of
    stream s at row r*S + s — the fused chain's native order; padded bin
    layout when `padded_layout`), new_carry [S, 2, C].

    Measured (exp_stft_allk, 4096 streams k=8 vs materialize+fused2):
    14.36 -> ~11 ms including the deleted copies, bitwise-equal output."""
    plan = plan or make_plan(cfg)
    if not split_framing_supported(cfg, k, plan):
        raise ValueError(f"split framing unsupported for {cfg} (plan={plan})")
    if lane_pad is None:
        lane_pad = lane_pad_default(plan)
    if padded_layout and not lane_pad:
        raise ValueError("padded_layout requires lane_pad")
    n1, n2, m = plan.n1, plan.n2, plan.m
    w, h = cfg.window_size, cfg.hop_size
    s = carry.shape[0]
    c = w - h
    if carry.shape[1:] != (2, c):
        raise ValueError(f"carry must be [S, 2, {c}], got {carry.shape}")
    if chunk_pl.shape != (s, 2, k * h):
        raise ValueError(
            f"chunk must be [{s}, 2, {k * h}], got {chunk_pl.shape}"
        )
    c_rows, t_rows = c // n1, (k * h) // n1
    k1h = n1 // 2
    n2o = padded_n2(plan) if lane_pad else n2
    half_o = k1h * n2o
    if block_rows is None:
        block_rows = 16 if k > 1 else 32
    ts = min(block_rows, s) if s % block_rows else block_rows
    carry4 = carry.reshape(s, 2, c_rows, n1)
    chunk4 = chunk_pl.reshape(s, 2, t_rows, n1)
    if s % ts:
        pad = ((0, ts - s % ts), (0, 0), (0, 0), (0, 0))
        carry4 = jnp.pad(carry4, pad)
        chunk4 = jnp.pad(chunk4, pad)
    s_pad = carry4.shape[0]
    hann2 = _scaled_hann(w, m, n1)                        # [m, n1]
    if lane_pad:
        f2cat, twcat, f1blk = _padded_stage1_constants(plan)
    else:
        from spectrogram_tpu.ops.mxu_fft import _block_plan_constants

        f2cat, twr, twi, f1blk = _block_plan_constants(plan)
        twcat = np.concatenate([twr, twi], axis=1).astype(np.float32)

    def const_spec(arr):
        return pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _split_kernel, plan=plan, k=k, precision=precision, lane_pad=lane_pad
    )
    mag_l, mag_r, new_carry4 = pl.pallas_call(
        kernel,
        grid=(s_pad // ts,),
        in_specs=[
            pl.BlockSpec((ts, 2, c_rows, n1), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ts, 2, t_rows, n1), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            const_spec(hann2),
            const_spec(f2cat),
            const_spec(twcat),
            const_spec(f1blk),
        ],
        out_specs=[
            pl.BlockSpec((k, ts, k1h, n2o), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, ts, k1h, n2o), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ts, 2, c_rows, n1), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((k, s_pad, k1h, n2o), jnp.float32),
            jax.ShapeDtypeStruct((k, s_pad, k1h, n2o), jnp.float32),
            jax.ShapeDtypeStruct((s_pad, 2, c_rows, n1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * k * s_pad * 2 * (plan.complex_macs * 2),
            bytes_accessed=s_pad * 2 * (c + k * h + c + k * half_o) * 4,
            transcendentals=2 * k * s_pad * half_o,
        ),
        interpret=interpret,
    )(carry4, chunk4, jnp.asarray(hann2), jnp.asarray(f2cat),
      jnp.asarray(twcat), jnp.asarray(f1blk))
    if s_pad != s:
        mag_l = mag_l[:, :s]
        mag_r = mag_r[:, :s]
        new_carry4 = new_carry4[:s]
    mag_l = mag_l.reshape(k * s, half_o)
    mag_r = mag_r.reshape(k * s, half_o)
    if lane_pad and not padded_layout:
        def unpad(mag):
            return mag.reshape(-1, k1h, n2o)[:, :, :n2].reshape(
                mag.shape[0], k1h * n2
            )
        mag_l, mag_r = unpad(mag_l), unpad(mag_r)
    return mag_l, mag_r, new_carry4.reshape(s, 2, c)


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


def tsplit_supported(cfg: SpectrogramConfig, k: int = 1,
                     plan: FftPlan | None = None,
                     lane_pad: bool = False) -> bool:
    """True when the split-state transposed framing kernel applies (k=1
    streaming): hop a multiple of the plan's n1 (the carry/chunk boundary
    falls between whole m-columns of the transposed window, so stage 1
    splits into two accumulating dots), a nonzero carry, and a flip-capable
    stage 2 (direct or lane-padded) for the flat 2D output stores."""
    plan = plan or make_plan(cfg)
    return (
        plan is not None
        and k == 1
        and plan.n1 % 2 == 0
        and cfg.pad_factor >= 2
        and cfg.hop_size % plan.n1 == 0
        and cfg.hop_size < cfg.window_size
        and (lane_pad or flip_supported(plan))
    )


def _tsplit_kernel(c_ref, k_ref, hann_ref, f2cat_ref, twcat_ref, f1blk_ref,
                   out_l_ref, out_r_ref, nc_ref,
                   *, plan, precision, lane_pad, c_cols, t_cols):
    """Split-state body: combined-channel transposed carry [ts, 2, n1,
    c_cols] + chunk [ts, 2, n1, t_cols] operands; the carry/chunk concat
    NEVER exists — stage 1 runs as TWO ACCUMULATING DOTS whose contraction
    ranges meet exactly at the carry/chunk column boundary (the m axis is
    buffer columns in the tw orientation, so splitting the contraction
    re-associates only the partial-sum order: <= 1 ulp).  The next-push
    carry is emitted in-kernel via static lane-dim value stores (no Mosaic
    alignment gate — probed on hardware, exp_stft_tsplit), deleting the
    XLA-side carry concat as well.  Channel split happens on the loaded
    VMEM value (the _kernel2_t trick): no XLA channel-slice copies."""
    n1 = plan.n1
    n2o = padded_n2(plan) if lane_pad else plan.n2
    k1h = n1 // 2
    kw = dict(preferred_element_type=jnp.float32, precision=precision)
    twr_t = twcat_ref[:, :n2o]
    twi_t = twcat_ref[:, n2o:]
    hann = hann_ref[:]                          # [n1, m] (transposed)
    f2 = f2cat_ref[:]                           # [m, 2*n2o]
    cboth = c_ref[:]                            # [ts, 2, n1, c_cols]
    kboth = k_ref[:]                            # [ts, 2, n1, t_cols]
    if t_cols >= c_cols:
        nc_ref[:] = kboth[:, :, :, t_cols - c_cols:]
    else:
        keep = c_cols - t_cols
        nc_ref[:, :, :, :keep] = cboth[:, :, :, t_cols:]
        nc_ref[:, :, :, keep:] = kboth
    for ch, out_ref in ((0, out_l_ref), (1, out_r_ref)):
        cv = cboth[:, ch]                       # [ts, n1, c_cols]
        kv = kboth[:, ch]                       # [ts, n1, t_cols]
        xc = cv * hann[:, :c_cols]
        xk = kv * hann[:, c_cols:]
        b = (
            jax.lax.dot_general(xc, f2[:c_cols], (((2,), (0,)), ((), ())), **kw)
            + jax.lax.dot_general(xk, f2[c_cols:], (((2,), (0,)), ((), ())), **kw)
        )                                       # [ts, n1, 2*n2o]
        br, bi = b[..., :n2o], b[..., n2o:]
        cr = br * twr_t - bi * twi_t
        ci = br * twi_t + bi * twr_t
        c_cat = jnp.concatenate([cr, ci], axis=1)
        d = jax.lax.dot_general(
            f1blk_ref[:], c_cat, (((0,), (1,)), ((), ())), **kw
        )                                       # [2*k1h, ts, n2o]
        dr, di = d[:k1h], d[k1h:]
        for k1 in range(k1h):
            p = dr[k1] * dr[k1] + di[k1] * di[k1]
            out_ref[:, k1 * n2o : (k1 + 1) * n2o] = jnp.sqrt(p)


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "block_rows", "precision", "interpret", "plan", "lane_pad",
    ),
)
def stft_mag_fused2_tsplit(
    carry_t: jax.Array,  # [N, 2, n1, c_cols] f32 transposed carry state
    chunk_t: jax.Array,  # [N, 2, n1, t_cols] f32 transposed hop chunk
    cfg: SpectrogramConfig,
    block_rows: int | None = None,
    precision=jax.lax.Precision.HIGHEST,
    interpret: bool = False,
    plan: FftPlan | None = None,
    lane_pad: bool = False,
):
    """Fused k=1 STFT consuming the CARRY STATE and HOP CHUNK directly —
    the framing formulation where the per-push carry+chunk concat and the
    full-buffer [m, n1] -> [n1, m] operand transposes never exist; the
    only per-push data movement outside the kernel is the caller's small
    chunk transpose.

    MEASURED NEGATIVE on v5e (exp_stft_tsplit, round 4 late), kept opt-in as
    evidence: at 10,240 streams this combined-channel form runs 5.33
    ms/push vs the production concat+transpose path's 4.87 (the
    per-channel-operand form 6.72 — strided channel slices cost another
    1.4 ms); at 4,096 it is 2.78 vs 1.92.  Mechanism: splitting stage 1
    at the carry/chunk boundary turns ONE 64-lane-deep dot into TWO dots
    over 39- and 25-lane operands, each padded to a full 128-lane tile —
    roughly doubling stage-1 MXU work, which costs more than the ~2 ms of
    XLA concat+transpose glue it deletes.  Completes the k=1 framing
    negative set: lane-axis concat (round 3), untransposed split operands
    (round 4), in-kernel VMEM concat (round 2), and now boundary-split
    accumulating dots.

    carry_t[s, c, j1, t] = buffer sample t*n1 + j1 of channel c (the
    transposed window layout restricted to the carry columns); chunk_t
    likewise over hop columns.  Returns (magL, magR, new_carry_t) with
    mags [N, (n1/2)*n2o] in the flat-2D layout the colormap kernels read
    (padded bin positions when lane_pad) and new_carry_t in the same
    format as carry_t — store it back as the next push's state.

    Numerics: <= 1 ulp vs `stft_mag_fused2` on the same plan (stage-1
    partial sums re-associate at the carry/chunk boundary); the emitted
    carry is bitwise (pure data movement).  Reference spec: one texture
    write per row batch, gpu_spectrogram.rs:260-273 — this is its device
    analog: one kernel pass per push, state updated in place.
    """
    plan = plan or make_plan(cfg)
    if not tsplit_supported(cfg, 1, plan, lane_pad=lane_pad):
        raise ValueError(
            f"tsplit framing unsupported for {cfg} (plan={plan}, "
            f"lane_pad={lane_pad})"
        )
    n1, n2, m = plan.n1, plan.n2, plan.m
    w, h = cfg.window_size, cfg.hop_size
    c_cols = (w - h) // n1
    t_cols = h // n1
    n = carry_t.shape[0]
    if carry_t.shape[1:] != (2, n1, c_cols):
        raise ValueError(
            f"expected carry [N, 2, {n1}, {c_cols}], got {carry_t.shape}"
        )
    if chunk_t.shape != (n, 2, n1, t_cols):
        raise ValueError(
            f"expected chunk [{n}, 2, {n1}, {t_cols}], got {chunk_t.shape}"
        )
    if block_rows is None:
        block_rows = default_block_rows(plan)
    ts = min(block_rows, n) if n % block_rows else block_rows
    if n % ts:
        pad = ts - n % ts
        carry_t = jnp.pad(carry_t, ((0, pad), (0, 0), (0, 0), (0, 0)))
        chunk_t = jnp.pad(chunk_t, ((0, pad), (0, 0), (0, 0), (0, 0)))
    n_pad = carry_t.shape[0]
    n2o = padded_n2(plan) if lane_pad else n2
    half_o = (n1 // 2) * n2o
    hann2 = np.ascontiguousarray(_scaled_hann(w, m, n1).T)   # [n1, m]
    if lane_pad:
        f2cat, twcat, f1blk = _padded_stage1_constants(plan)
    else:
        from spectrogram_tpu.ops.mxu_fft import _block_plan_constants

        f2cat, twr, twi, f1blk = _block_plan_constants(plan)
        twcat = np.concatenate([twr, twi], axis=1).astype(np.float32)

    def const_spec(arr):
        return pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _tsplit_kernel, plan=plan, precision=precision, lane_pad=lane_pad,
        c_cols=c_cols, t_cols=t_cols,
    )
    mag_spec = pl.BlockSpec((ts, half_o), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    mag_l, mag_r, new_carry = pl.pallas_call(
        kernel,
        grid=(n_pad // ts,),
        in_specs=[
            pl.BlockSpec((ts, 2, n1, c_cols), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ts, 2, n1, t_cols), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            const_spec(hann2),
            const_spec(f2cat),
            const_spec(twcat),
            const_spec(f1blk),
        ],
        out_specs=[
            mag_spec,
            mag_spec,
            pl.BlockSpec((ts, 2, n1, c_cols), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, half_o), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, half_o), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 2, n1, c_cols), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * 2 * (plan.complex_macs * 2),
            bytes_accessed=2 * n_pad * (w + h + half_o) * 4,
            transcendentals=2 * n_pad * half_o,
        ),
        interpret=interpret,
    )(carry_t, chunk_t, jnp.asarray(hann2), jnp.asarray(f2cat),
      jnp.asarray(twcat), jnp.asarray(f1blk))
    return mag_l[:n], mag_r[:n], new_carry[:n]
