"""Fused Pallas STFT kernel: windowed PCM planes -> magnitude rows.

The four-step FFT (ops/mxu_fft.py) expressed as one Pallas kernel per
stream-block, eliminating the XLA glue passes (operand re-layouts, fusion
boundaries) that the device profiler showed dominate the composed version:

  per [TS, W] input plane (one channel):
    1. Hann multiply (constant vector, fused)
    2. reshape to [TS, m, n1] (the zero-padded rows never exist)
    3. stage 1: two batched MXU dots against the n2-DFT (real input)
    4. twiddle multiply (elementwise, 3D)
    5. stage 2: four batched MXU dots against the HALF-spectrum n1-DFT
       (bins k < N/2 only — all the reference emits)
    6. |X| * 2/W

  The "transpose" step of the classical four-step runs as in-VMEM
  swapaxes (Mosaic lowers 2D tile transposes natively; verified).

Split-real formulation: each channel is its own real-input FFT — exactly
equal to the reference's packed-complex + conjugate unpack (fft.rs:57,81-92)
in exact arithmetic, with none of its reverse/unpack passes.

Two variants:
* `stft_mag_fused` (v1, _kernel): batched-dot formulation.  Correct but 4x
  slower than the XLA composition — Mosaic lowers batch-TS small dots
  poorly and keeps 3D temps live (blocks > 16 rows OOM the 16 MB VMEM
  scope).  Kept as a negative result with tests.
* `stft_mag_fused2` (v2, _kernel2): all-2D-dot formulation — (rows x n1)
  flattened into the matmul M dimension.  THE PRODUCTION PATH: chained
  into colormap_planes_builtin it holds the bench record (1.19x north
  star).  ts=32 blocks; 64 OOMs VMEM.  A k2-major permuted-output variant
  (skipping the final transposes) was tried and reverted: minor dim
  n1/2=16 pads 8x in (8,128) lane tiles.
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
from spectrogram_tpu.ops.mxu_fft import FftPlan, _half_plan_constants, make_plan


def _fft_mag(x3, plan: FftPlan, consts, scale, precision):
    """[TS, m, n1] real windowed samples (already window-shaped; Mosaic
    cannot split the lane dim in-kernel) -> [TS, n1/2, n2] magnitudes
    (k = n2*k1 + k2; the flat view happens outside)."""
    f2r, f2i, twr_t, twi_t, f1r, f1i = consts
    kw = dict(preferred_element_type=jnp.float32, precision=precision)
    a = jnp.swapaxes(x3, 1, 2)                             # [TS, n1, m]
    br = jnp.einsum("bim,mk->bik", a, f2r, **kw)          # [TS, n1, k2]
    bi = jnp.einsum("bim,mk->bik", a, f2i, **kw)
    cr = br * twr_t - bi * twi_t                           # twiddle [n1, k2]
    ci = br * twi_t + bi * twr_t
    cr = jnp.swapaxes(cr, 1, 2)                            # [TS, k2, n1]
    ci = jnp.swapaxes(ci, 1, 2)
    dr = jnp.einsum("bki,il->bkl", cr, f1r, **kw) - jnp.einsum(
        "bki,il->bkl", ci, f1i, **kw
    )                                                      # [TS, k2, k1h]
    di = jnp.einsum("bki,il->bkl", cr, f1i, **kw) + jnp.einsum(
        "bki,il->bkl", ci, f1r, **kw
    )
    dr = jnp.swapaxes(dr, 1, 2)                            # [TS, k1h, k2]
    di = jnp.swapaxes(di, 1, 2)
    return jnp.sqrt(dr * dr + di * di) * scale


def _kernel(
    left_ref, right_ref, hann_ref,
    f2r_ref, f2i_ref, twr_ref, twi_ref, f1r_ref, f1i_ref,
    out_l_ref, out_r_ref,
    *, plan, precision,
):
    consts = (
        f2r_ref[:], f2i_ref[:], twr_ref[:], twi_ref[:], f1r_ref[:], f1i_ref[:]
    )
    scale = 2.0 / (plan.m * plan.n1)
    window = hann_ref[:]                                   # [m, n1]
    out_l_ref[:] = _fft_mag(left_ref[:] * window, plan, consts, scale, precision)
    out_r_ref[:] = _fft_mag(right_ref[:] * window, plan, consts, scale, precision)


def _kernel2(
    left_ref, right_ref, hann_ref, f2cat_ref, twcat_ref, f1blk_ref,
    out_l_ref, out_r_ref,
    *, plan, precision,
):
    """All-2D-dot variant: flatten (rows x n1) into the matmul M dimension so
    the MXU sees two large plain matmuls instead of many batch-TS small ones
    (Mosaic lowers batched dot_general poorly — v1 was 4x slower than XLA).
    """
    n1, n2, m = plan.n1, plan.n2, plan.m
    ts = left_ref.shape[0]
    kw = dict(preferred_element_type=jnp.float32, precision=precision)
    window = hann_ref[:]                                  # [m, n1]
    twr_t = twcat_ref[:, :n2]                             # [n1, n2]
    twi_t = twcat_ref[:, n2:]

    def channel(x_ref, out_ref):
        x = x_ref[:] * window                             # [TS, m, n1]
        a = jnp.swapaxes(x, 1, 2)                         # [TS, n1, m]
        a2 = a.reshape(ts * n1, m)                        # leading-dim merge
        b2 = jnp.dot(a2, f2cat_ref[:], **kw)              # [(TS n1), 2n2]
        b = b2.reshape(ts, n1, 2 * n2)
        br, bi = b[..., :n2], b[..., n2:]
        cr = br * twr_t - bi * twi_t                      # [TS, n1, n2]
        ci = br * twi_t + bi * twr_t
        c_cat = jnp.concatenate(
            [jnp.swapaxes(cr, 1, 2), jnp.swapaxes(ci, 1, 2)], axis=-1
        )                                                 # [TS, n2, 2n1]
        c2 = c_cat.reshape(ts * n2, 2 * n1)
        d2 = jnp.dot(c2, f1blk_ref[:], **kw)              # [(TS n2), 2k1h]
        k1h = n1 // 2
        d = d2.reshape(ts, n2, 2 * k1h)
        dr = jnp.swapaxes(d[..., :k1h], 1, 2)             # [TS, k1h, n2]
        di = jnp.swapaxes(d[..., k1h:], 1, 2)
        scale = 2.0 / (m * n1)
        out_ref[:] = jnp.sqrt(dr * dr + di * di) * scale

    channel(left_ref, out_l_ref)
    channel(right_ref, out_r_ref)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "block_rows", "precision", "interpret", "slice_bins"),
)
def stft_mag_fused2(
    left: jax.Array,   # [N, W] f32 full-window plane, left channel
    right: jax.Array,  # [N, W] f32, right channel
    cfg: SpectrogramConfig,
    block_rows: int = 32,
    precision=jax.lax.Precision.HIGHEST,
    interpret: bool = False,
    slice_bins: bool = True,
):
    """2D-dot fused STFT: (magL, magR) each [N, num_bins], or the full
    [N, N/2] half-spectrum (bin index k = padded-FFT bin k, DC included)
    with slice_bins=False — the layout colormap_planes_builtin consumes
    against resample_matrix_full with zero copies in between."""
    from spectrogram_tpu.ops.mxu_fft import _block_plan_constants

    plan = make_plan(cfg)
    if plan is None or plan.n1 % 2:
        raise ValueError(f"no even-n1 factorization for {cfg}")
    if cfg.pad_factor < 2:
        # half-spectrum covers bins 1..W-1 only when W <= N/2
        raise ValueError(f"fused STFT requires pad_factor >= 2, got {cfg}")
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
    left3 = left.reshape(n_pad, m, n1)
    right3 = right.reshape(n_pad, m, n1)
    hann2 = stft_ops.hann_window_np(w).reshape(m, n1)
    f2cat, twr, twi, f1blk = _block_plan_constants(plan)
    twcat = np.concatenate([twr, twi], axis=1).astype(np.float32)  # [n1, 2n2]

    def const_spec(arr):
        return pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim, memory_space=pltpu.VMEM)

    kernel = functools.partial(_kernel2, plan=plan, precision=precision)
    mag_l, mag_r = pl.pallas_call(
        kernel,
        grid=(n_pad // ts,),
        in_specs=[
            pl.BlockSpec((ts, m, n1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ts, m, n1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            const_spec(hann2),
            const_spec(f2cat),
            const_spec(twcat),
            const_spec(f1blk),
        ],
        out_specs=[
            pl.BlockSpec(
                (ts, n1 // 2, n2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (ts, n1 // 2, n2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, n1 // 2, n2), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, n1 // 2, n2), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * 2 * (plan.complex_macs * 2),
            bytes_accessed=2 * n_pad * (w + half) * 4,
            transcendentals=2 * n_pad * half,
        ),
        interpret=interpret,
    )(left3, right3, jnp.asarray(hann2), jnp.asarray(f2cat), jnp.asarray(twcat),
      jnp.asarray(f1blk))
    mag_l = mag_l.reshape(n_pad, half)[:n]
    mag_r = mag_r.reshape(n_pad, half)[:n]
    if slice_bins:
        return mag_l[:, 1:w], mag_r[:, 1:w]  # bins k = 1..W-1 (fft.rs:81)
    return mag_l, mag_r


@functools.partial(
    jax.jit, static_argnames=("cfg", "block_rows", "precision", "interpret")
)
def stft_mag_fused(
    left: jax.Array,   # [N, W] f32 windowed-signal plane, left channel
    right: jax.Array,  # [N, W] f32, right channel
    cfg: SpectrogramConfig,
    block_rows: int = 64,
    precision=jax.lax.Precision.HIGHEST,
    interpret: bool = False,
):
    """One full window per row -> (magL, magR) each [N, num_bins].

    Rows are single windows (the streaming k=1 case); multi-hop pushes pass
    each hop's window as its own row.
    """
    plan = make_plan(cfg)
    if plan is None or plan.n1 % 2:
        raise ValueError(f"no even-n1 factorization for {cfg}")
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
    # Window-shape the inputs OUTSIDE the kernel (a free view in XLA; Mosaic
    # cannot split the lane dimension).
    left3 = left.reshape(n_pad, m, n1)
    right3 = right.reshape(n_pad, m, n1)
    # Constants travel as pallas inputs with constant index maps (Pallas
    # rejects captured array constants).
    hann2 = stft_ops.hann_window_np(w).reshape(m, n1)
    (f2r, f2i), (twr, twi), (f1r, f1i) = _half_plan_constants(plan)
    twr_t, twi_t = np.ascontiguousarray(twr.T), np.ascontiguousarray(twi.T)

    def const_spec(arr):
        shape = arr.shape
        zero = (lambda i: (0, 0)) if len(shape) == 2 else (lambda i: (0, 0, 0))
        return pl.BlockSpec(shape, zero, memory_space=pltpu.VMEM)

    kernel = functools.partial(_kernel, plan=plan, precision=precision)
    mag_l, mag_r = pl.pallas_call(
        kernel,
        grid=(n_pad // ts,),
        in_specs=[
            pl.BlockSpec((ts, m, n1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ts, m, n1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            const_spec(hann2),
            const_spec(f2r), const_spec(f2i),
            const_spec(twr_t), const_spec(twi_t),
            const_spec(f1r), const_spec(f1i),
        ],
        out_specs=[
            pl.BlockSpec(
                (ts, n1 // 2, n2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (ts, n1 // 2, n2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, n1 // 2, n2), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, n1 // 2, n2), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * 2 * (plan.complex_macs * 2),
            bytes_accessed=2 * n_pad * (w + half) * 4,
            transcendentals=2 * n_pad * half,
        ),
        interpret=interpret,
    )(
        left3, right3,
        jnp.asarray(hann2),
        jnp.asarray(f2r), jnp.asarray(f2i),
        jnp.asarray(twr_t), jnp.asarray(twi_t),
        jnp.asarray(f1r), jnp.asarray(f1i),
    )
    # flatten k = n2*k1 + k2 and keep bins 1..W-1 (fft.rs:81)
    return (
        mag_l.reshape(n_pad, half)[:n, 1:w],
        mag_r.reshape(n_pad, half)[:n, 1:w],
    )
