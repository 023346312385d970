"""Single-kernel push: fused STFT -> banded colormap in ONE pallas_call.

MEASURED NEGATIVE RESULT (round 2) — kept with tests as evidence, NOT the
production path.  The two-kernel chain (stft_mag_fused2 ->
colormap_planes_banded) measured 3.55 ms/push at 4096 streams on v5e; this
merged kernel measured 3.75 ms (and VMEM-OOMs at DEFAULT precision,
17.8 M > 16 M scoped).  Root cause: the merge locks the colormap dots to
the FFT stage's ts=32 stream blocks (VMEM-bound), while the standalone
colormap kernel runs ts=128 row blocks — 4x the MXU M-dim and 4x fewer
matrix-tile refetches.  The ~0.2 ms HBM round-trip of the magnitude planes
it saves does not cover that.  Same conclusion as round 1's dense-merge
analysis, now re-proven with the banded contraction.

Design (what was built): the reference runs its entire hot loop B in one
fragment shader (reference src/widgets/gpu_spectrogram.rs:150-190).  The
TPU analog holds each stream block's full half-spectrum in VMEM
([ts, N/2] f32 per channel, 512 KB at the default geometry) and feeds the
banded colormap straight from it; each pixel segment contracts a narrow,
lane-aligned slice of the in-VMEM magnitudes — exactly the layout the FFT
stage produces (flat bin k = k1*n2 + k2).  `emit_mags` optionally writes
the magnitude planes for the viewport ring.  Bitwise-equal to the chain.
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
from spectrogram_tpu.ops.pallas.colormap_kernel import _builtin_word_tile
from spectrogram_tpu.ops.pallas.stft_kernel import _fft_mag_value, _scaled_hann


def _push_kernel(
    left_ref, right_ref,            # [TS, m, n1] window blocks
    hann_ref, f2cat_ref, twcat_ref, f1blk_ref,
    tab_ref,                        # [TS, R*4] per-stream color tables
    *rest,
    plan, segments, emit_mags, min_db, max_db, db_eps, res,
    precision_stft, precision_cmap, subtile,
):
    seg_refs = rest[: len(segments)]
    out_ref, *mag_refs = rest[len(segments):]
    ts = left_ref.shape[0]
    half = (plan.n1 // 2) * plan.n2

    mags = []
    for x_ref in (left_ref, right_ref):
        mag3 = _fft_mag_value(
            x_ref[:], hann_ref, f2cat_ref, twcat_ref, f1blk_ref,
            plan=plan, precision=precision_stft,
        )                                           # [TS, k1h, n2]
        mags.append(mag3.reshape(ts, half))         # flat bins, stays in VMEM
    magl, magr = mags
    if emit_mags:
        mag_refs[0][:] = magl
        mag_refs[1][:] = magr

    stereo = tab_ref[:, 3][:, None]
    for seg_ref, (p0, p1, lo, hi) in zip(seg_refs, segments):
        l_band = magl[:, lo:hi]                     # lane-aligned VMEM slice
        r_band = magr[:, lo:hi]
        width = p1 - p0
        step = min(subtile, width)
        for hc in range(0, width, step):
            w = min(step, width - hc)
            out_ref[:, p0 + hc : p0 + hc + w] = _builtin_word_tile(
                l_band, r_band, seg_ref[:, hc : hc + w], tab_ref, stereo,
                min_db=min_db, max_db=max_db, db_eps=db_eps, res=res,
                precision=precision_cmap,
            )


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "segments", "block_rows", "precision_stft", "precision_cmap",
        "interpret", "plan", "emit_mags",
    ),
)
def push_fused_single(
    left: jax.Array,          # [N, W] f32 full-window plane, left channel
    right: jax.Array,         # [N, W] f32, right channel
    color_tables: jax.Array,  # [N, R*4] per-stream built-in tables
    matrix_t: jax.Array,      # [B=N_fft/2, H] full resample matrix (transposed)
    cfg: SpectrogramConfig,
    segments: tuple[tuple[int, int, int, int], ...],
    block_rows: int = 32,
    precision_stft=jax.lax.Precision.HIGHEST,
    precision_cmap=jax.lax.Precision.HIGHEST,
    interpret: bool = False,
    plan: FftPlan | None = None,
    emit_mags: bool = False,
):
    """One pallas_call: windows -> packed RGBA8888 rows [N, H] (int32).

    With emit_mags=True additionally returns the two [N, N_fft/2] magnitude
    planes (for the viewport ring).  Bitwise-equal to the two-kernel chain
    stft_mag_fused2 -> colormap_planes_banded (tested).
    """
    plan = plan or make_plan(cfg)
    if plan is None or plan.n1 % 2:
        raise ValueError(f"no even-n1 factorization for {cfg}")
    if cfg.pad_factor < 2:
        raise ValueError(f"fused push requires pad_factor >= 2, got {cfg}")
    n, w = left.shape
    assert w == cfg.window_size, (w, cfg.window_size)
    n1, n2, m = plan.n1, plan.n2, plan.m
    half = (n1 // 2) * n2
    h = matrix_t.shape[1]
    if matrix_t.shape[0] != half:
        raise ValueError(
            f"resample matrix expects {matrix_t.shape[0]} bins, FFT emits {half}"
        )
    if segments[0][0] != 0 or segments[-1][1] != h:
        raise ValueError(f"segments {segments} do not tile H={h}")
    res = color_tables.shape[1] // 4

    ts = min(block_rows, n) if n % block_rows else block_rows
    if n % ts:
        pad = ts - n % ts
        left = jnp.pad(left, ((0, pad), (0, 0)))
        right = jnp.pad(right, ((0, pad), (0, 0)))
        color_tables = jnp.pad(color_tables, ((0, pad), (0, 0)))
    n_pad = left.shape[0]
    left3 = left.reshape(n_pad, m, n1)
    right3 = right.reshape(n_pad, m, n1)
    hann2 = _scaled_hann(w, m, n1)
    from spectrogram_tpu.ops.mxu_fft import _block_plan_constants

    f2cat, twr, twi, f1blk = _block_plan_constants(plan)
    twcat = np.concatenate([twr, twi], axis=1).astype(np.float32)
    seg_mats = [
        jnp.asarray(matrix_t[lo:hi, p0:p1]) for p0, p1, lo, hi in segments
    ]

    def const_spec(arr):
        return pl.BlockSpec(
            arr.shape, lambda i: (0,) * arr.ndim, memory_space=pltpu.VMEM
        )

    kernel = functools.partial(
        _push_kernel,
        plan=plan,
        segments=segments,
        emit_mags=emit_mags,
        min_db=cfg.min_db,
        max_db=cfg.max_db,
        db_eps=cfg.db_epsilon,
        res=res,
        precision_stft=precision_stft,
        precision_cmap=precision_cmap,
        subtile=128,
    )
    out_specs = [pl.BlockSpec((ts, h), lambda i: (i, 0), memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((n_pad, h), jnp.int32)]
    if emit_mags:
        mag_spec = pl.BlockSpec((ts, half), lambda i: (i, 0), memory_space=pltpu.VMEM)
        out_specs += [mag_spec, mag_spec]
        out_shape += [jax.ShapeDtypeStruct((n_pad, half), jnp.float32)] * 2
    banded_units = sum((hi - lo) * (p1 - p0) for p0, p1, lo, hi in segments)
    outs = pl.pallas_call(
        kernel,
        grid=(n_pad // ts,),
        in_specs=[
            pl.BlockSpec((ts, m, n1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ts, m, n1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            const_spec(hann2),
            const_spec(f2cat),
            const_spec(twcat),
            const_spec(f1blk),
            pl.BlockSpec((ts, res * 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *[const_spec(sm) for sm in seg_mats],
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * 2 * (plan.complex_macs * 2)
            + 2 * 2 * n_pad * banded_units
            + 6 * res * n_pad * h,
            bytes_accessed=n_pad * (2 * w + 4 * h) * 4,
            transcendentals=2 * n_pad * half + n_pad * h,
        ),
        interpret=interpret,
    )(left3, right3, jnp.asarray(hann2), jnp.asarray(f2cat),
      jnp.asarray(twcat), jnp.asarray(f1blk), color_tables, *seg_mats)
    if not emit_mags:
        outs = [outs] if not isinstance(outs, (list, tuple)) else outs
        return outs[0][:n]
    packed, magl, magr = outs
    return packed[:n], magl[:n], magr[:n]
