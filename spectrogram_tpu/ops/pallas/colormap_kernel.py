"""Fused Pallas colormap kernel: magnitude rows -> RGBA pixels in one pass.

This is the TPU kernel equivalent of the reference's fragment shader
(src/widgets/gpu_spectrogram.rs:150-190) — the whole "hot loop B".  The
XLA-composed path (ops/colormap.py + sample_lut_factored) materializes the
[N, H, 32] tent-weight tensors in HBM (~2 GB of traffic per 4k-stream push);
here everything after the row read lives in VMEM:

  grid (row blocks x pixel-column blocks); per block:
    1. two MXU dots: left/right magnitude tiles x resample-matrix tile
       (the log-frequency warp + bilinear fetch as a matmul)
    2. VPU: dB law, pan law (shader :177-182)
    3. factored-LUT evaluation against per-row U/V tables (exact
       clamped-bilinear palette sample) via the 4-segment two-tap tent
       scheme (_tent_lut_channels: res/4+1 passes instead of res)
    4. u8 pack, one output plane per channel

Layout choices (TPU tiling constraints): channel planes are separated so
every ref keeps a >=128 minor dimension; per-row LUT tables arrive flattened
[N, R*4] so their minor dim is 128.

Parity: bit-compatible with ops.colormap.sample_lut_factored o resample_rows
(tested in tests/test_pallas_colormap.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spectrogram_tpu.config import SpectrogramConfig

LUT_RES = 32  # table resolution; R*4 = 128 = one lane tile


def _subtile_for(th: int) -> int:
    """In-kernel pixel-axis subtile: <=128 and must divide th exactly (a
    non-dividing subtile would leave tail columns UNWRITTEN — VMEM garbage)."""
    if th <= 128:
        return th
    if th % 128 == 0:
        return 128
    raise ValueError(
        f"block_cols={th} not supported: must be <= 128 or a multiple of 128"
    )


def _auto_blocks(b: int, block_rows, block_cols) -> tuple[int, int]:
    """VMEM-aware default tile sizes for the colormap kernels.

    Budget model: double-buffered row planes cost ~2*ts*b*4*2 bytes and the
    double-buffered matrix tile b*th*4*2 — both scale with the bin count, so
    BOTH tile dims shrink as b grows (a 4096-pt-window geometry, b=4095,
    overflows the 16 MB scope by ~192 KB at the old fixed 128x128).
    Explicit callers override either dim independently.
    """
    if b <= 2560:
        auto = (128, 128)
    elif b <= 5120:
        auto = (64, 128)
    elif b <= 10240:
        auto = (32, 64)
    elif b <= 20480:
        auto = (16, 32)
    else:
        raise ValueError(
            f"{b} bins exceeds the supported colormap-kernel tiling; "
            "reduce the window size or use the XLA colormap backend"
        )
    return (block_rows or auto[0], block_cols or auto[1])


def _resample_and_laws(left, right, mat_tile, *, min_db, max_db, db_eps,
                       res, precision):
    """Shared front half of every colormap kernel: the two resample dots
    (MXU), the dB + pan laws (shader :177-182), and the texel-space LUT
    coordinates.  One definition so the law stays bit-identical across the
    per-row, generic, and static kernel variants.  Returns (xu, xv)."""
    pl_ = jnp.dot(
        left, mat_tile, preferred_element_type=jnp.float32,
        precision=precision,
    )
    pr_ = jnp.dot(
        right, mat_tile, preferred_element_type=jnp.float32,
        precision=precision,
    )
    power = pl_ * pl_ + pr_ * pr_
    db = 10.0 * jnp.log10(power + db_eps)
    mag = (db - min_db) / (max_db - min_db)
    denom = pl_ + pr_
    pan = jnp.where(denom != 0.0, pr_ / jnp.where(denom != 0.0, denom, 1.0), 0.5)
    xu = jnp.clip(jnp.clip(mag, 0.0, 1.0) * res - 0.5, 0.0, res - 1.0)
    xv = jnp.clip(jnp.clip(pan, 0.0, 1.0) * res - 0.5, 0.0, res - 1.0)
    return xu, xv


def _kernel(
    left_ref,    # [TS, B] f32 magnitude rows, left channel
    right_ref,   # [TS, B] f32, right channel
    mat_ref,     # [B, TH] f32 resample matrix tile (transposed)
    u_ref,       # [TS, R*4] f32 per-row mag-axis table, col = t*4 + c
    v_ref,       # [TS, R*4] f32 per-row pan-axis table
    out_ref,     # [TS, TH] i32 packed RGBA8888, or [4, TS, TH] u8 planes
    *,
    min_db: float,
    max_db: float,
    db_eps: float,
    res: int,
    precision,
    packed: bool,
):
    # resample matmul (MXU) + dB/pan laws + texel coords, then the
    # factored-LUT segment-tent evaluation
    xu, xv = _resample_and_laws(
        left_ref[:], right_ref[:], mat_ref[:], min_db=min_db, max_db=max_db,
        db_eps=db_eps, res=res, precision=precision,
    )
    cu = _tent_lut_channels(xu, u_ref, (0, 1, 2, 3), res)
    cv = _tent_lut_channels(xv, v_ref, (0, 1, 2, 3), res)
    # 4. combine + quantize
    def quantize(c):
        rgba = cu[c] * cv[c]
        return jnp.clip(jnp.round(rgba * 255.0), 0.0, 255.0).astype(jnp.int32)

    if packed:
        # RGBA8888 little-endian: byte 0 = R.  One i32 lane per pixel — no
        # minor-dim-4 u8 layout anywhere (TPU transposes of those are slow).
        word = (
            quantize(0)
            | (quantize(1) << 8)
            | (quantize(2) << 16)
            | (quantize(3) << 24)
        )
        out_ref[:, :] = word
    else:
        for c in range(4):
            # Mosaic has no f32->u8 cast; hop through int32.
            out_ref[c] = quantize(c).astype(jnp.uint8)


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "block_rows", "block_cols", "precision", "interpret", "packed"
    ),
)
def colormap_rows_fused(
    rows: jax.Array,       # [N, 2, B] f32 planar magnitude rows (N = streams*hops)
    u_tables: jax.Array,   # [N, R, 4] f32 per-row mag-axis tables
    v_tables: jax.Array,   # [N, R, 4] f32 per-row pan-axis tables
    matrix_t: jax.Array,   # [B, H] f32 resample matrix, transposed
    cfg: SpectrogramConfig,
    block_rows: int | None = None,
    block_cols: int | None = None,
    precision=jax.lax.Precision.HIGHEST,
    interpret: bool = False,
    packed: bool = False,
) -> jax.Array:
    """Fused colormap: [N, H, 4] u8 RGBA, or with packed=True [N, H] i32
    RGBA8888 (little-endian byte 0 = R; `np.asarray(x).view(np.uint8)`
    reshapes to [N, H, 4] on host for free).

    Rows arrive channels-planar ([N, 2, B]) so the left/right planes are
    contiguous slices — the interleaved [N, B, 2] layout would cost a
    stride-2 gather (~1 ms at 4k streams) just to feed the kernel.
    """
    n, _, b = rows.shape
    if matrix_t.shape[0] != b:
        raise ValueError(
            f"rows have {b} bins but resample matrix expects "
            f"{matrix_t.shape[0]}"
        )
    h = matrix_t.shape[1]
    res = u_tables.shape[1]

    block_rows, block_cols = _auto_blocks(b, block_rows, block_cols)
    ts = min(block_rows, n) if n % block_rows else block_rows
    if n % ts:
        pad = ts - n % ts
        rows = jnp.pad(rows, ((0, pad), (0, 0), (0, 0)))
        u_tables = jnp.pad(u_tables, ((0, pad), (0, 0), (0, 0)))
        v_tables = jnp.pad(v_tables, ((0, pad), (0, 0), (0, 0)))
    n_pad = rows.shape[0]
    th = block_cols
    if h % th:
        matrix_t = jnp.pad(matrix_t, ((0, 0), (0, th - h % th)))
    h_pad = matrix_t.shape[1]

    left = rows[:, 0, :]
    right = rows[:, 1, :]
    u_flat = u_tables.reshape(n_pad, res * 4)
    v_flat = v_tables.reshape(n_pad, res * 4)

    grid = (n_pad // ts, h_pad // th)
    kernel = functools.partial(
        _kernel,
        min_db=cfg.min_db,
        max_db=cfg.max_db,
        db_eps=cfg.db_epsilon,
        res=res,
        precision=precision,
        packed=packed,
    )
    if packed:
        out_specs = pl.BlockSpec((ts, th), lambda i, j: (i, j), memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((n_pad, h_pad), jnp.int32)
    else:
        out_specs = pl.BlockSpec(
            (4, ts, th), lambda i, j: (0, i, j), memory_space=pltpu.VMEM
        )
        out_shape = jax.ShapeDtypeStruct((4, n_pad, h_pad), jnp.uint8)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((ts, b), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ts, b), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, th), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((ts, res * 4), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ts, res * 4), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * n_pad * b * h_pad + 10 * res * n_pad * h_pad,
            bytes_accessed=2 * n_pad * b * 4 + b * h_pad * 4 + 4 * n_pad * h_pad,
            transcendentals=n_pad * h_pad,
        ),
        interpret=interpret,
    )(left, right, matrix_t, u_flat, v_flat)
    if packed:
        return out[:n, :h]
    return jnp.moveaxis(out, 0, -1)[:n, :h]


def _builtin_kernel(
    left_ref,    # [TS, B] f32
    right_ref,   # [TS, B] f32
    mat_ref,     # [B, H] f32 (FULL pixel axis, resident across the grid)
    tab_ref,     # [TS, R*4] f32: cols t*4+c, c<3 = rgb table, col 3 = stereo flag
    out_ref,     # [TS, H] i32 packed RGBA8888
    *,
    min_db: float,
    max_db: float,
    db_eps: float,
    res: int,
    precision,
    subtile: int,
):
    """Specialized colormap for the built-in palette structure.

    Every default scheme's factored LUT has half its channels constant
    (colorscheme.factored_tables): mono -> rgb = T(mag), alpha = 1; stereo ->
    rgb = T(pan), alpha = ramp(mag) which is pure arithmetic
    (x_mag / (R-1)).  So one 3-channel tent interpolation replaces the
    two 4-channel ones of the generic kernel — the LUT stage is the VPU
    bottleneck, and this halves it.  Exact-equal to the generic path for
    all 19 built-in palettes (tested).
    """
    left = left_ref[:]
    right = right_ref[:]
    stereo = tab_ref[:, 3][:, None]  # 1.0 for stereo rows, 0.0 for mono
    h = mat_ref.shape[1]
    # Subtile the pixel axis inside the kernel so elementwise temporaries
    # stay [TS, subtile]-sized regardless of the grid tile width (VMEM
    # pressure comes from the unrolled LUT loop's live temps).
    for hc in range(h // subtile):
        sl = slice(hc * subtile, (hc + 1) * subtile)
        out_ref[:, sl] = _builtin_word_tile(
            left, right, mat_ref[:, sl], tab_ref, stereo,
            min_db=min_db, max_db=max_db, db_eps=db_eps, res=res,
            precision=precision,
        )


def _tent_lut_channels(x, tab_ref, cols, res):
    """Tent-basis LUT evaluation: for each column group c in `cols`, returns
    sum_t clip(1-|x-t|, 0, 1) * tab_ref[:, t*4+c] — the exact clamped-linear
    palette sample — as a list of [TS, P] arrays.

    Two formulations, bitwise-identical (VERDICT r2 weak #3):

    * res = 4 * 2^k (every production resolution): 4-SEGMENT TWO-TAP.  Only
      taps floor(x) and floor(x)+1 have nonzero weight, and both lie in the
      sub+1 taps of segment floor(x)//sub (sub = res//4).  Evaluating
      sub+1 taps with a 3-select segment mux does ~res/(sub+1) times less
      VPU work than the full unrolled loop (32 -> 9 passes at res=32).
      Exactness argument: x/sub is a power-of-two multiply (exact), so the
      segment index is the true floor; xl = x - 8*seg is exact (Sterbenz);
      IEEE subtraction rounds the exact difference, so every tent weight is
      bit-identical to the full-loop weight; skipped taps contributed an
      exact +0.0 in the full loop; the segment-boundary spill tap (seg 3,
      tl=sub -> clamped index) always carries weight exactly 0.
    * otherwise: the original res-pass unrolled accumulation.
    """
    sub = res // 4
    shape = x.shape
    if res % 4 or sub & (sub - 1):
        # non-power-of-two sub-resolution: exactness argument breaks; keep
        # the full unrolled loop
        acc = [jnp.zeros(shape, jnp.float32) for _ in cols]
        for t in range(res):
            w = jnp.clip(1.0 - jnp.abs(x - t), 0.0, 1.0)
            for i, c in enumerate(cols):
                acc[i] = acc[i] + w * tab_ref[:, t * 4 + c][:, None]
        return acc
    seg = jnp.minimum((x * (1.0 / sub)).astype(jnp.int32), 3)
    xl = x - seg.astype(jnp.float32) * sub
    is0 = seg == 0
    is2 = seg == 2
    lo_half = seg <= 1
    acc = [jnp.zeros(shape, jnp.float32) for _ in cols]
    for tl in range(sub + 1):
        w = jnp.clip(1.0 - jnp.abs(xl - tl), 0.0, 1.0)
        for i, c in enumerate(cols):
            def ent(s):
                return tab_ref[:, min(s * sub + tl, res - 1) * 4 + c][:, None]

            v = jnp.where(
                lo_half,
                jnp.where(is0, ent(0), ent(1)),
                jnp.where(is2, ent(2), ent(3)),
            )
            acc[i] = acc[i] + w * v
    return acc


def _builtin_word_tile(left, right, mat_tile, tab_ref, stereo, *,
                       min_db, max_db, db_eps, res, precision):
    """[TS, B] magnitude planes x [B, P] matrix tile -> [TS, P] packed RGBA
    words (pure value math; shared by the standalone colormap kernels and
    the merged STFT+colormap push kernel)."""
    xu, xv = _resample_and_laws(
        left, right, mat_tile, min_db=min_db, max_db=max_db,
        db_eps=db_eps, res=res, precision=precision,
    )
    x_color = stereo * xv + (1.0 - stereo) * xu
    rgb = _tent_lut_channels(x_color, tab_ref, (0, 1, 2), res)
    alpha = stereo * (xu * (1.0 / (res - 1))) + (1.0 - stereo)

    def q(x):
        return jnp.clip(jnp.round(x * 255.0), 0.0, 255.0).astype(jnp.int32)

    return q(rgb[0]) | (q(rgb[1]) << 8) | (q(rgb[2]) << 16) | (q(alpha) << 24)


def _generic_kernel(
    left_ref,    # [TS, B] f32
    right_ref,   # [TS, B] f32
    mat_ref,     # [B, H] f32 (FULL pixel axis, resident across the grid)
    u_ref,       # [TS, R*4] f32 per-row mag-axis table (cols t*4+c)
    v_ref,       # [TS, R*4] f32 per-row pan-axis table
    out_ref,     # [TS, H] i32 packed RGBA8888
    *,
    min_db: float,
    max_db: float,
    db_eps: float,
    res: int,
    precision,
    subtile: int,
):
    """Generic two-table colormap (planes in, packed out, subtiled like
    `_builtin_kernel`): serves ANY rank-1-factored palette — the device path
    for user-defined schemes outside the built-in mono/stereo structure
    (reference uploads any scheme's LUT, gpu_spectrogram.rs:232-239)."""
    left = left_ref[:]
    right = right_ref[:]
    h = mat_ref.shape[1]
    for hc in range(h // subtile):
        sl = slice(hc * subtile, (hc + 1) * subtile)
        out_ref[:, sl] = _generic_word_tile(
            left, right, mat_ref[:, sl], u_ref, v_ref,
            min_db=min_db, max_db=max_db, db_eps=db_eps, res=res,
            precision=precision,
        )


def _generic_word_tile(left, right, mat_tile, u_ref, v_ref, *,
                       min_db, max_db, db_eps, res, precision):
    """[TS, B] planes x [B, P] matrix tile -> [TS, P] packed RGBA words via
    the full two-axis factored LUT (exact clamped-bilinear sample of
    LUT[i,j,c] = U[i,c]*V[j,c]; same math as `_kernel`, packed-only)."""
    xu, xv = _resample_and_laws(
        left, right, mat_tile, min_db=min_db, max_db=max_db,
        db_eps=db_eps, res=res, precision=precision,
    )
    cu = _tent_lut_channels(xu, u_ref, (0, 1, 2, 3), res)
    cv = _tent_lut_channels(xv, v_ref, (0, 1, 2, 3), res)

    def q(c):
        return jnp.clip(
            jnp.round(cu[c] * cv[c] * 255.0), 0.0, 255.0
        ).astype(jnp.int32)

    return q(0) | (q(1) << 8) | (q(2) << 16) | (q(3) << 24)


def _uniform_builtin_kernel(
    left_ref,    # [TS, B] f32
    right_ref,   # [TS, B] f32
    mat_ref,     # [B, H] f32
    tab_ref,     # [1, R*4] f32 in SMEM — ONE runtime table for every row
    out_ref,     # [TS, H] i32 packed RGBA8888
    *,
    min_db: float,
    max_db: float,
    db_eps: float,
    res: int,
    precision,
    subtile: int,
):
    """Uniform-palette colormap: every row shares ONE RUNTIME table, read
    as SMEM scalars.

    Between the per-row kernel (tables in VMEM, [TS,1]->[TS,P] lane
    broadcasts per tent tap — the ~0.37 ms/push VPU cost the round-3
    ablation isolated) and the static kernel (table baked at compile time,
    zero-weight elision, but palette switch = recompile) sits this one:
    scalar table reads broadcast for free and the palette is still a pure
    STATE update (set_palette with a scalar id re-picks the [1, R*4] row;
    no recompile once both modes are traced).  The reference's actual
    operating mode — one palette per widget, switched at runtime
    (gpu_spectrogram.rs:88, main.rs:102-104)."""
    left = left_ref[:]
    right = right_ref[:]
    stereo = tab_ref[0, 3]
    h = mat_ref.shape[1]
    sub = res // 4
    segment_ok = res % 4 == 0 and sub & (sub - 1) == 0
    for hc in range(h // subtile):
        sl = slice(hc * subtile, (hc + 1) * subtile)
        xu, xv = _resample_and_laws(
            left, right, mat_ref[:, sl], min_db=min_db, max_db=max_db,
            db_eps=db_eps, res=res, precision=precision,
        )
        x_color = stereo * xv + (1.0 - stereo) * xu
        rgb = [jnp.zeros(xu.shape, jnp.float32) for _ in range(3)]
        if segment_ok:
            seg = jnp.minimum((x_color * (1.0 / sub)).astype(jnp.int32), 3)
            xl = x_color - seg.astype(jnp.float32) * sub
            is0 = seg == 0
            is2 = seg == 2
            lo_half = seg <= 1
            for tl in range(sub + 1):
                w = jnp.clip(1.0 - jnp.abs(xl - tl), 0.0, 1.0)
                for c in range(3):
                    def ent(s):
                        return tab_ref[0, min(s * sub + tl, res - 1) * 4 + c]

                    v = jnp.where(
                        lo_half,
                        jnp.where(is0, ent(0), ent(1)),
                        jnp.where(is2, ent(2), ent(3)),
                    )
                    rgb[c] = rgb[c] + w * v
        else:
            for t in range(res):
                w = jnp.clip(1.0 - jnp.abs(x_color - t), 0.0, 1.0)
                for c in range(3):
                    rgb[c] = rgb[c] + w * tab_ref[0, t * 4 + c]
        alpha = stereo * (xu * (1.0 / (res - 1))) + (1.0 - stereo)

        def q(x):
            return jnp.clip(jnp.round(x * 255.0), 0.0, 255.0).astype(jnp.int32)

        out_ref[:, sl] = (
            q(rgb[0]) | (q(rgb[1]) << 8) | (q(rgb[2]) << 16) | (q(alpha) << 24)
        )


def _uniform_generic_kernel(
    left_ref, right_ref, mat_ref, u_ref, v_ref, out_ref, *,
    min_db: float, max_db: float, db_eps: float, res: int,
    precision, subtile: int,
):
    """Uniform-palette GENERIC (two-axis factored) colormap: both factor
    rows arrive [1, R*4] in SMEM and are read as scalars — the
    runtime-switchable single-palette mode for user-defined FactoredSchemes
    outside the built-in mono/stereo shape (same idea as
    _uniform_builtin_kernel; full bilinear LUT[i,j,c] = U[i,c]*V[j,c])."""
    left = left_ref[:]
    right = right_ref[:]
    h = mat_ref.shape[1]
    sub = res // 4
    segment_ok = res % 4 == 0 and sub & (sub - 1) == 0
    for hc in range(h // subtile):
        sl = slice(hc * subtile, (hc + 1) * subtile)
        xu, xv = _resample_and_laws(
            left, right, mat_ref[:, sl], min_db=min_db, max_db=max_db,
            db_eps=db_eps, res=res, precision=precision,
        )
        cu = [jnp.zeros(xu.shape, jnp.float32) for _ in range(4)]
        cv = [jnp.zeros(xu.shape, jnp.float32) for _ in range(4)]

        def accumulate(x, tab_ref, acc):
            if segment_ok:
                seg = jnp.minimum((x * (1.0 / sub)).astype(jnp.int32), 3)
                xl = x - seg.astype(jnp.float32) * sub
                is0 = seg == 0
                is2 = seg == 2
                lo_half = seg <= 1
                for tl in range(sub + 1):
                    w = jnp.clip(1.0 - jnp.abs(xl - tl), 0.0, 1.0)
                    for c in range(4):
                        def ent(s):
                            return tab_ref[0, min(s * sub + tl, res - 1) * 4 + c]

                        val = jnp.where(
                            lo_half,
                            jnp.where(is0, ent(0), ent(1)),
                            jnp.where(is2, ent(2), ent(3)),
                        )
                        acc[c] = acc[c] + w * val
            else:
                for t in range(res):
                    w = jnp.clip(1.0 - jnp.abs(x - t), 0.0, 1.0)
                    for c in range(4):
                        acc[c] = acc[c] + w * tab_ref[0, t * 4 + c]

        accumulate(xu, u_ref, cu)
        accumulate(xv, v_ref, cv)

        def q(c):
            return jnp.clip(
                jnp.round(cu[c] * cv[c] * 255.0), 0.0, 255.0
            ).astype(jnp.int32)

        out_ref[:, sl] = q(0) | (q(1) << 8) | (q(2) << 16) | (q(3) << 24)


def _blockwise_builtin_kernel(
    flag_ref,    # [nb] i32 scalar-prefetch: 1 = block is single-palette
    btab_ref,    # [nb, R*4] f32 scalar-prefetch: block's first-row table
    left_ref,    # [TS, B] f32
    right_ref,   # [TS, B] f32
    mat_ref,     # [B, H] f32
    rowtab_ref,  # [TS, R*4] f32 per-row tables (VMEM) — the fallback
    out_ref,     # [TS, H] i32 packed RGBA8888
    *,
    min_db: float,
    max_db: float,
    db_eps: float,
    res: int,
    precision,
    subtile: int,
    nb_period: int,
):
    """Per-BLOCK palette uniformity (the round-4 builder lead): most
    multi-tenant batches cluster palettes in contiguous stream ranges, so
    most ts-row blocks are single-palette — those take the SMEM-scalar
    path (zero per-row broadcasts, like _uniform_builtin_kernel); mixed
    blocks fall back to the per-row tables.  Flags + block tables arrive
    via SCALAR PREFETCH (whole arrays SMEM-resident, indexed by the row
    program id) — grid-blocked (1, x) SMEM operands fail Mosaic's
    block-tiling rule, found on hardware by the smoke gate.  The branch
    costs one scalar test per grid step; the resample dots + laws are
    shared by both arms."""
    bi = pl.program_id(0) % nb_period
    left = left_ref[:]
    right = right_ref[:]
    h = mat_ref.shape[1]
    uniform = flag_ref[bi] == 1
    stereo_u = btab_ref[bi, 3]
    stereo_p = rowtab_ref[:, 3][:, None]
    sub = res // 4
    segment_ok = res % 4 == 0 and sub & (sub - 1) == 0
    for hc in range(h // subtile):
        sl = slice(hc * subtile, (hc + 1) * subtile)
        xu, xv = _resample_and_laws(
            left, right, mat_ref[:, sl], min_db=min_db, max_db=max_db,
            db_eps=db_eps, res=res, precision=precision,
        )

        @pl.when(uniform)
        def _uniform_arm():
            x_color = stereo_u * xv + (1.0 - stereo_u) * xu
            rgb = [jnp.zeros(xu.shape, jnp.float32) for _ in range(3)]
            if segment_ok:
                seg = jnp.minimum((x_color * (1.0 / sub)).astype(jnp.int32), 3)
                xl = x_color - seg.astype(jnp.float32) * sub
                is0 = seg == 0
                is2 = seg == 2
                lo_half = seg <= 1
                for tl in range(sub + 1):
                    w = jnp.clip(1.0 - jnp.abs(xl - tl), 0.0, 1.0)
                    for c in range(3):
                        def ent(s):
                            return btab_ref[
                                bi, min(s * sub + tl, res - 1) * 4 + c
                            ]

                        v = jnp.where(
                            lo_half,
                            jnp.where(is0, ent(0), ent(1)),
                            jnp.where(is2, ent(2), ent(3)),
                        )
                        rgb[c] = rgb[c] + w * v
            else:
                for t in range(res):
                    w = jnp.clip(1.0 - jnp.abs(x_color - t), 0.0, 1.0)
                    for c in range(3):
                        rgb[c] = rgb[c] + w * btab_ref[bi, t * 4 + c]
            alpha = stereo_u * (xu * (1.0 / (res - 1))) + (1.0 - stereo_u)

            def q(x):
                return jnp.clip(
                    jnp.round(x * 255.0), 0.0, 255.0
                ).astype(jnp.int32)

            out_ref[:, sl] = (
                q(rgb[0]) | (q(rgb[1]) << 8) | (q(rgb[2]) << 16)
                | (q(alpha) << 24)
            )

        @pl.when(jnp.logical_not(uniform))
        def _per_row_arm():
            x_color = stereo_p * xv + (1.0 - stereo_p) * xu
            rgb = _tent_lut_channels(x_color, rowtab_ref, (0, 1, 2), res)
            alpha = stereo_p * (xu * (1.0 / (res - 1))) + (1.0 - stereo_p)

            def q(x):
                return jnp.clip(
                    jnp.round(x * 255.0), 0.0, 255.0
                ).astype(jnp.int32)

            out_ref[:, sl] = (
                q(rgb[0]) | (q(rgb[1]) << 8) | (q(rgb[2]) << 16)
                | (q(alpha) << 24)
            )


def _static_builtin_kernel(
    left_ref,    # [TS, B] f32
    right_ref,   # [TS, B] f32
    mat_ref,     # [B, H] f32
    out_ref,     # [TS, H] i32 packed RGBA8888
    *,
    table: tuple,   # R*4 floats, baked at trace time
    min_db: float,
    max_db: float,
    db_eps: float,
    res: int,
    precision,
    subtile: int,
):
    """Single-palette colormap with the LUT baked as COMPILE-TIME scalars.

    When every row shares one scheme — the reference's own operating mode,
    one palette per widget (gpu_spectrogram.rs:88) — the per-row table
    operand, its [TS,1]->[TS,P] broadcasts, and the tent mux all collapse
    into scalar-constant FMAs (zero-weight terms elided exactly: they
    contributed +0.0).  Measured 2.3x the per-row banded kernel at 4096
    rows with EXACT output parity (exp_colormap_static_palette)."""
    left = left_ref[:]
    right = right_ref[:]
    stereo = bool(table[3])
    h = mat_ref.shape[1]
    for hc in range(h // subtile):
        sl = slice(hc * subtile, (hc + 1) * subtile)
        xu, xv = _resample_and_laws(
            left, right, mat_ref[:, sl], min_db=min_db, max_db=max_db,
            db_eps=db_eps, res=res, precision=precision,
        )
        x_color = xv if stereo else xu
        rgb = [jnp.zeros(xu.shape, jnp.float32) for _ in range(3)]
        for t in range(res):
            w = jnp.clip(1.0 - jnp.abs(x_color - t), 0.0, 1.0)
            for c in range(3):
                v = float(table[t * 4 + c])
                if v != 0.0:
                    rgb[c] = rgb[c] + w * v
        alpha = (xu * (1.0 / (res - 1))) if stereo else 1.0

        def q(x):
            if isinstance(x, float):
                return jnp.full(xu.shape, int(round(x * 255.0)), jnp.int32)
            return jnp.clip(jnp.round(x * 255.0), 0.0, 255.0).astype(jnp.int32)

        out_ref[:, sl] = (
            q(rgb[0]) | (q(rgb[1]) << 8) | (q(rgb[2]) << 16) | (q(alpha) << 24)
        )


def _static_generic_kernel(
    left_ref, right_ref, mat_ref, out_ref, *,
    u_row: tuple, v_row: tuple,
    min_db: float, max_db: float, db_eps: float, res: int,
    precision, subtile: int,
):
    """Single-palette GENERIC (two-axis factored) colormap with both LUT
    factors baked as compile-time scalars — the static fast path for
    user-defined FactoredSchemes outside the built-in mono/stereo shape."""
    left = left_ref[:]
    right = right_ref[:]
    h = mat_ref.shape[1]
    for hc in range(h // subtile):
        sl = slice(hc * subtile, (hc + 1) * subtile)
        xu, xv = _resample_and_laws(
            left, right, mat_ref[:, sl], min_db=min_db, max_db=max_db,
            db_eps=db_eps, res=res, precision=precision,
        )
        cu = [jnp.zeros(xu.shape, jnp.float32) for _ in range(4)]
        cv = [jnp.zeros(xu.shape, jnp.float32) for _ in range(4)]
        for t in range(res):
            wu = jnp.clip(1.0 - jnp.abs(xu - t), 0.0, 1.0)
            wv = jnp.clip(1.0 - jnp.abs(xv - t), 0.0, 1.0)
            for c in range(4):
                if (uv := float(u_row[t * 4 + c])) != 0.0:
                    cu[c] = cu[c] + wu * uv
                if (vv := float(v_row[t * 4 + c])) != 0.0:
                    cv[c] = cv[c] + wv * vv

        def q(c):
            return jnp.clip(
                jnp.round(cu[c] * cv[c] * 255.0), 0.0, 255.0
            ).astype(jnp.int32)

        out_ref[:, sl] = q(0) | (q(1) << 8) | (q(2) << 16) | (q(3) << 24)


def _tables_kernel_and_operands(color_tables, *, kw, subtile):
    """Dispatch on the table format: a single [N, R*4] array selects the
    specialized built-in kernel ([1, R*4] = the UNIFORM single-runtime-
    palette kernel, tables in SMEM); a (u_flat, v_flat) JAX-array tuple
    selects the generic two-table kernel; a plain PYTHON tuple of floats
    (length R*4) selects the static single-palette kernel with no table
    operand; a pair of float tuples selects the static GENERIC kernel.
    Returns (kernel_fn, [table operands], res, uniform)."""
    if isinstance(color_tables, tuple) and color_tables and isinstance(
        color_tables[0], float
    ):
        res = len(color_tables) // 4
        kernel = functools.partial(
            _static_builtin_kernel, table=color_tables, res=res,
            subtile=subtile, **kw
        )
        return kernel, [], res, False
    if (
        isinstance(color_tables, tuple)
        and len(color_tables) == 2
        and isinstance(color_tables[0], tuple)
        and color_tables[0]
        and isinstance(color_tables[0][0], float)
    ):
        u_row, v_row = color_tables
        res = len(u_row) // 4
        kernel = functools.partial(
            _static_generic_kernel, u_row=u_row, v_row=v_row, res=res,
            subtile=subtile, **kw
        )
        return kernel, [], res, False
    if isinstance(color_tables, (tuple, list)):
        u_flat, v_flat = color_tables
        res = u_flat.shape[1] // 4
        if u_flat.shape[0] == 1:
            kernel = functools.partial(
                _uniform_generic_kernel, res=res, subtile=subtile, **kw
            )
            return kernel, [u_flat, v_flat], res, True
        kernel = functools.partial(
            _generic_kernel, res=res, subtile=subtile, **kw
        )
        return kernel, [u_flat, v_flat], res, False
    res = color_tables.shape[1] // 4
    if color_tables.shape[0] == 1:
        kernel = functools.partial(
            _uniform_builtin_kernel, res=res, subtile=subtile, **kw
        )
        return kernel, [color_tables], res, True
    kernel = functools.partial(
        _builtin_kernel, res=res, subtile=subtile, **kw
    )
    return kernel, [color_tables], res, False


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "block_rows", "block_cols", "precision", "interpret"),
)
def colormap_rows_builtin(
    rows: jax.Array,        # [N, 2, B] f32 planar magnitude rows
    color_tables: jax.Array,  # [N, R*4] f32 (col t*4+c: rgb, col 3: stereo flag)
    matrix_t: jax.Array,    # [B, H] f32
    cfg: SpectrogramConfig,
    block_rows: int | None = None,
    block_cols: int | None = None,
    precision=jax.lax.Precision.HIGHEST,
    interpret: bool = False,
) -> jax.Array:
    """Built-in-palette fused colormap: returns [N, H] i32 packed RGBA8888."""
    return colormap_planes_builtin(
        rows[:, 0, :], rows[:, 1, :], color_tables, matrix_t, cfg,
        block_rows=block_rows, block_cols=block_cols,
        precision=precision, interpret=interpret,
    )


def _blockwise_operands(t: jax.Array, ts: int):
    """(block_tables [nb, R*4], flags [nb] i32) for the per-block
    uniformity kernel: flag = every row of the ts-row block carries the
    same table (compared on table BYTES, so registry identity is
    irrelevant); block_tables = each block's first row.  One cheap
    elementwise pass per push over [rows, R*4]."""
    nb = t.shape[0] // ts
    t3 = t.reshape(nb, ts, t.shape[1])
    flags = jnp.all(t3 == t3[:, :1], axis=(1, 2)).astype(jnp.int32)
    return t3[:, 0], flags


def _maybe_blockwise(kernel, tables, res, uniform, static_table,
                     color_tables, blockwise, ts, *, kw, subtile):
    """Swap the per-row builtin kernel for the per-block-uniformity kernel
    when requested and applicable (single-array builtin tables only).
    Returns (kernel, tables, blockwise_active)."""
    applicable = (
        blockwise
        and not uniform
        and static_table is None
        and len(tables) == 1
        and not isinstance(color_tables, (tuple, list))
    )
    if not applicable:
        return kernel, tables, False
    btab, flags = _blockwise_operands(tables[0], ts)
    kernel = functools.partial(
        _blockwise_builtin_kernel, res=res, subtile=subtile,
        nb_period=tables[0].shape[0] // ts, **kw
    )
    return kernel, [tables[0], btab, flags], True


def _normalize_period_tables(tables, n: int, ts: int, table_period):
    """Resolve the table-period layout for a kernel call.

    With `table_period=S` the caller's rows are window-major over S streams
    (row r*S + s_) and the tables arrive UNexpanded as [S, R*4]; when the
    row-block size ts divides S, every ts-row block maps onto one aligned
    block of the small table array, so a modular index map (i % (S // ts))
    re-reads it per window with zero expansion copies.  Falls back to an
    explicit jnp.tile when ts does not divide S.  Returns (tables,
    tb_blocks) with tb_blocks=None meaning the identity map."""
    if table_period is None or not tables:
        return tables, None
    if tables[0].shape[0] == 1:
        return tables, None  # uniform single-table mode: no expansion ever
    if n % table_period or tables[0].shape[0] != table_period:
        raise ValueError(
            f"table_period={table_period} does not tile {n} rows of "
            f"{tables[0].shape[0]}-row tables"
        )
    if table_period % ts == 0:
        return tables, table_period // ts
    return [jnp.tile(t, (n // table_period, 1)) for t in tables], None


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "block_rows", "block_cols", "precision", "interpret",
        "static_table", "table_period", "blockwise",
    ),
)
def colormap_planes_builtin(
    left: jax.Array,        # [N, B] f32 left magnitude plane
    right: jax.Array,       # [N, B] f32 right magnitude plane
    color_tables,           # [N, R*4] array | (u, v) arrays | None (static)
    matrix_t: jax.Array,    # [B, H] f32 (B may include the DC column with
                            # zero weight — lets the fused STFT hand its full
                            # half-spectrum over without a slicing pass)
    cfg: SpectrogramConfig,
    block_rows: int | None = None,
    block_cols: int | None = None,
    precision=jax.lax.Precision.HIGHEST,
    interpret: bool = False,
    static_table: tuple | None = None,
    table_period: int | None = None,
    blockwise: bool = False,
) -> jax.Array:
    """As colormap_rows_builtin but taking separate channel planes.

    `color_tables` selects the kernel: a single [N, R*4] array = the
    specialized built-in kernel; a (u_flat, v_flat) tuple (each [N, R*4]) =
    the generic two-table kernel serving arbitrary factored palettes.
    `static_table` (a hashable tuple of R*4 floats) instead bakes ONE
    palette into the kernel as compile-time scalars — the single-palette
    fast path (2.3x; exp_colormap_static_palette).  `table_period=S` feeds
    window-major rows (r*S + s_) from [S, R*4] tables via a modular block
    index map (see _normalize_period_tables)."""
    n, b = left.shape
    if matrix_t.shape[0] != b:
        raise ValueError(
            f"rows have {b} bins but resample matrix expects "
            f"{matrix_t.shape[0]} (a mismatch would silently read only the "
            f"first {b} matrix rows)"
        )
    h = matrix_t.shape[1]

    block_rows, block_cols = _auto_blocks(b, block_rows, block_cols)
    ts = min(block_rows, n) if n % block_rows else block_rows
    if static_table is not None:
        tables = []
    else:
        tables = (
            list(color_tables)
            if isinstance(color_tables, (tuple, list))
            else [color_tables]
        )
    tables, tb_blocks = _normalize_period_tables(tables, n, ts, table_period)
    if n % ts:
        pad = ts - n % ts
        left = jnp.pad(left, ((0, pad), (0, 0)))
        right = jnp.pad(right, ((0, pad), (0, 0)))
        if tb_blocks is None:
            tables = [
                t if t.shape[0] == 1 else jnp.pad(t, ((0, pad), (0, 0)))
                for t in tables
            ]
    n_pad = left.shape[0]
    th = block_cols
    if h % th:
        matrix_t = jnp.pad(matrix_t, ((0, 0), (0, th - h % th)))
    h_pad = matrix_t.shape[1]

    kw = dict(
        min_db=cfg.min_db,
        max_db=cfg.max_db,
        db_eps=cfg.db_epsilon,
        precision=precision,
    )
    kernel, tables, res, uniform = _tables_kernel_and_operands(
        static_table
        if static_table is not None
        else (tables if len(tables) > 1 else tables[0]),
        kw=kw, subtile=_subtile_for(th),
    )
    kernel, tables, bw = _maybe_blockwise(
        kernel, tables, res, uniform, static_table, color_tables,
        blockwise, ts, kw=kw, subtile=_subtile_for(th),
    )
    tmap = (
        (lambda i, j: (i, 0))
        if tb_blocks is None
        else (lambda i, j: (i % tb_blocks, 0))
    )
    if uniform:
        table_specs = [
            pl.BlockSpec((1, res * 4), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM)
            for _ in tables
        ]
    elif bw:
        # scalar-prefetch call: flags + block tables ride SMEM whole-array
        # (grid-blocked (1, x) SMEM operands fail Mosaic's tiling rule)
        rowtab, btab, flags = tables
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_pad // ts, h_pad // th),
            in_specs=[
                pl.BlockSpec((ts, b), lambda i, j, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ts, b), lambda i, j, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((b, th), lambda i, j, *_: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (ts, res * 4),
                    (lambda i, j, *_: (i, 0)) if tb_blocks is None
                    else (lambda i, j, *_: (i % tb_blocks, 0)),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec((ts, th), lambda i, j, *_: (i, j),
                                   memory_space=pltpu.VMEM),
        )
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_pad, h_pad), jnp.int32),
            interpret=interpret,
        )(flags, btab, left, right, matrix_t, rowtab)
        return out[:n, :h]
    else:
        table_specs = [
            pl.BlockSpec((ts, res * 4), tmap, memory_space=pltpu.VMEM)
            for _ in tables
        ]
    # 2-D grid (row blocks x pixel-column tiles).  Between consecutive grid
    # steps the row-block index map is unchanged while j sweeps, so Pallas
    # skips re-fetching the row planes; the matrix tiles stream.
    out = pl.pallas_call(
        kernel,
        grid=(n_pad // ts, h_pad // th),
        in_specs=[
            pl.BlockSpec((ts, b), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ts, b), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, th), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ] + table_specs,
        out_specs=pl.BlockSpec((ts, th), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, h_pad), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * n_pad * b * h_pad + 6 * res * n_pad * h_pad,
            bytes_accessed=2 * n_pad * b * 4 + b * h_pad * 4 + 4 * n_pad * h_pad,
            transcendentals=n_pad * h_pad,
        ),
        interpret=interpret,
    )(left, right, matrix_t, *tables)
    return out[:n, :h]


def band_segments(
    matrix_t: "np.ndarray",   # [B, H] numpy resample matrix (transposed)
    tile_px: int = 128,
    lane: int = 128,
) -> tuple[tuple[int, int, int, int], ...]:
    """Static banding plan for the resample contraction.

    The log-frequency resample matrix is two-tap (<=2 nonzero bins per pixel
    column) with monotone tap positions — the matmul form of the reference
    shader's bilinear fetch (gpu_spectrogram.rs:158-174).  Each `tile_px`-wide
    pixel tile therefore touches one contiguous bin band; at the default
    geometry the bands sum to ~17% of the dense [B, H] product.

    Returns ((px_lo, px_hi, bin_lo, bin_hi), ...) segments: per pixel tile,
    the lane-aligned band of bins with any nonzero weight; adjacent tiles are
    merged greedily whenever merging does not increase total band*pixels work
    (fewer kernel launches at equal FLOPs).
    """
    b, h = matrix_t.shape
    nz_any = matrix_t != 0.0
    tiles = []
    for p0 in range(0, h, tile_px):
        p1 = min(p0 + tile_px, h)
        nz = np.nonzero(nz_any[:, p0:p1].any(axis=1))[0]
        if nz.size == 0:
            lo, hi = 0, min(lane, b)
        else:
            lo = int(nz.min()) // lane * lane
            hi = min(-(-int(nz.max() + 1) // lane) * lane, b)
        tiles.append((p0, p1, lo, hi))
    segs = [tiles[0]]
    for p0, p1, lo, hi in tiles[1:]:
        sp0, sp1, slo, shi = segs[-1]
        mlo, mhi = min(slo, lo), max(shi, hi)
        merged = (mhi - mlo) * (p1 - sp0)
        split = (shi - slo) * (sp1 - sp0) + (hi - lo) * (p1 - p0)
        if merged <= split:
            segs[-1] = (sp0, p1, mlo, mhi)
        else:
            segs.append((p0, p1, lo, hi))
    return tuple(segs)


def _banded_worthwhile(segments, b: int, h: int, threshold: float = 0.75) -> bool:
    """True when the banding plan saves enough work to justify multiple
    kernel launches (sum of band*pixels < threshold * dense B*H)."""
    banded = sum((hi - lo) * (p1 - p0) for p0, p1, lo, hi in segments)
    return banded < threshold * b * h


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "segments", "block_rows", "block_cols", "precision",
        "interpret", "static_table", "table_period", "blockwise",
    ),
)
def colormap_planes_banded(
    left: jax.Array,        # [N, B] f32 left magnitude plane
    right: jax.Array,       # [N, B] f32 right magnitude plane
    color_tables,           # [N, R*4] array | (u, v) arrays | None (static)
    matrix_t: jax.Array,    # [B, H] f32 full resample matrix (transposed)
    cfg: SpectrogramConfig,
    segments: tuple[tuple[int, int, int, int], ...],
    block_rows: int | None = None,
    block_cols: int | None = None,
    precision=jax.lax.Precision.HIGHEST,
    interpret: bool = False,
    static_table: tuple | None = None,
    table_period: int | None = None,
    blockwise: bool = False,
) -> jax.Array:
    """Banded colormap: one kernel launch per `band_segments` segment, each
    contracting only the bin band its pixel columns actually read.

    The magnitude planes are never sliced in HBM: per segment the kernel's
    row-plane BlockSpecs use element-offset indexing (`pl.Element`) to DMA
    the [ts, band] window straight out of the full plane.  Output is bitwise
    identical to `colormap_planes_builtin` — the skipped matrix entries are
    exact zeros, so the remaining partial sums are unchanged.
    """
    n, b = left.shape
    if matrix_t.shape[0] != b:
        raise ValueError(
            f"rows have {b} bins but resample matrix expects {matrix_t.shape[0]}"
        )
    h = matrix_t.shape[1]
    if segments[-1][1] != h or segments[0][0] != 0:
        raise ValueError(f"segments {segments} do not tile H={h}")

    max_band = max(hi - lo for _, _, lo, hi in segments)
    block_rows, block_cols = _auto_blocks(max_band, block_rows, block_cols)
    ts = min(block_rows, n) if n % block_rows else block_rows
    if static_table is not None:
        tables = []
    else:
        tables = (
            list(color_tables)
            if isinstance(color_tables, (tuple, list))
            else [color_tables]
        )
    tables, tb_blocks = _normalize_period_tables(tables, n, ts, table_period)
    if n % ts:
        pad = ts - n % ts
        left = jnp.pad(left, ((0, pad), (0, 0)))
        right = jnp.pad(right, ((0, pad), (0, 0)))
        if tb_blocks is None:
            tables = [
                t if t.shape[0] == 1 else jnp.pad(t, ((0, pad), (0, 0)))
                for t in tables
            ]
    n_pad = left.shape[0]
    th = block_cols
    tmap = (
        (lambda i, j: (i, 0))
        if tb_blocks is None
        else (lambda i, j: (i % tb_blocks, 0))
    )

    outs = []
    for p0, p1, lo, hi in segments:
        band = hi - lo
        mat_seg = matrix_t[lo:hi, p0:p1]  # constant fold (matrix is static)
        h_seg = p1 - p0
        if h_seg % th:
            mat_seg = jnp.pad(mat_seg, ((0, 0), (0, th - h_seg % th)))
        h_pad = mat_seg.shape[1]
        kernel, seg_tables, res, uniform = _tables_kernel_and_operands(
            static_table
            if static_table is not None
            else (tables if len(tables) > 1 else tables[0]),
            kw=dict(
                min_db=cfg.min_db,
                max_db=cfg.max_db,
                db_eps=cfg.db_epsilon,
                precision=precision,
            ),
            subtile=_subtile_for(th),
        )
        kernel, seg_tables, bw = _maybe_blockwise(
            kernel, seg_tables, res, uniform, static_table, color_tables,
            blockwise, ts,
            kw=dict(
                min_db=cfg.min_db,
                max_db=cfg.max_db,
                db_eps=cfg.db_epsilon,
                precision=precision,
            ),
            subtile=_subtile_for(th),
        )
        # Element-offset DMA straight out of the full planes (zero slice
        # copies) needs Mosaic-provable tiling: block dims divisible by
        # (8, 128) or equal to the array dims.  Segments that fail that
        # (e.g. the last band clipped to a non-lane-multiple bin count, or
        # a sub-8 row block) fall back to materialized slices — correctness
        # first, the copy costs only on awkward geometries.
        # Mosaic proves divisibility on the index EXPRESSION (i*ts), so ts
        # must be sublane-aligned even when the grid has one step.
        elem_ok = (
            ts % 8 == 0
            and lo % 128 == 0
            and (band % 128 == 0 or (lo == 0 and band == b))
        )
        if elem_ok:
            plane_spec = pl.BlockSpec(
                (pl.Element(ts), pl.Element(band)),
                lambda i, j, lo=lo: (i * ts, lo),
                memory_space=pltpu.VMEM,
            )
            plane_l, plane_r = left, right
        else:
            plane_spec = pl.BlockSpec(
                (ts, band), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            )
            plane_l, plane_r = left[:, lo:hi], right[:, lo:hi]
        if bw:
            # scalar-prefetch call (see colormap_planes_builtin's bw branch)
            rowtab, btab, flags = seg_tables
            if elem_ok:
                bw_plane_spec = pl.BlockSpec(
                    (pl.Element(ts), pl.Element(band)),
                    lambda i, j, *_, lo=lo: (i * ts, lo),
                    memory_space=pltpu.VMEM,
                )
            else:
                bw_plane_spec = pl.BlockSpec(
                    (ts, band), lambda i, j, *_: (i, 0),
                    memory_space=pltpu.VMEM,
                )
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(n_pad // ts, h_pad // th),
                in_specs=[
                    bw_plane_spec,
                    bw_plane_spec,
                    pl.BlockSpec((band, th), lambda i, j, *_: (0, j),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(
                        (ts, res * 4),
                        (lambda i, j, *_: (i, 0)) if tb_blocks is None
                        else (lambda i, j, *_: (i % tb_blocks, 0)),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_specs=pl.BlockSpec((ts, th), lambda i, j, *_: (i, j),
                                       memory_space=pltpu.VMEM),
            )
            out = pl.pallas_call(
                kernel,
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((n_pad, h_pad), jnp.int32),
                interpret=interpret,
            )(flags, btab, plane_l, plane_r, mat_seg, rowtab)
            outs.append(out[:, :h_seg])
            continue
        if uniform:
            table_specs = [
                pl.BlockSpec((1, res * 4), lambda i, j: (0, 0),
                             memory_space=pltpu.SMEM)
                for _ in seg_tables
            ]
        else:
            table_specs = [
                pl.BlockSpec((ts, res * 4), tmap, memory_space=pltpu.VMEM)
                for _ in seg_tables
            ]
        out = pl.pallas_call(
            kernel,
            grid=(n_pad // ts, h_pad // th),
            in_specs=[
                plane_spec,
                plane_spec,
                pl.BlockSpec((band, th), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ] + table_specs,
            out_specs=pl.BlockSpec(
                (ts, th), lambda i, j: (i, j), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((n_pad, h_pad), jnp.int32),
            cost_estimate=pl.CostEstimate(
                flops=2 * 2 * n_pad * band * h_pad + 6 * res * n_pad * h_pad,
                bytes_accessed=(
                    2 * n_pad * band * 4 + band * h_pad * 4 + 4 * n_pad * h_pad
                ),
                transcendentals=n_pad * h_pad,
            ),
            interpret=interpret,
        )(plane_l, plane_r, mat_seg, *seg_tables)
        outs.append(out[:, :h_seg])
    return jnp.concatenate(outs, axis=1)[:n]


def _builtin_table_row(
    u: "np.ndarray", v: "np.ndarray", resolution: int
) -> "np.ndarray | None":
    """If factored tables (U, V) match the built-in mono/stereo structure
    (mono: rgb = U(mag), alpha = 1; stereo: rgb = V(pan), alpha = mag ramp —
    the shape `_builtin_kernel` hardcodes), return its [R*4] table row (rgb
    cols + stereo flag in col 3); else None (use the generic kernel).

    Detection is STRUCTURAL, so user-defined `FactoredScheme`s that happen
    to fit still take the halved-work specialized kernel."""
    ramp = (np.arange(resolution) / (resolution - 1)).astype(np.float32)
    mono = bool(np.all(v == 1.0) and np.all(u[:, 3] == 1.0))
    stereo = bool(
        np.all(u[:, :3] == 1.0)
        and np.all(v[:, 3] == 1.0)
        and np.array_equal(u[:, 3].astype(np.float32), ramp)
    )
    if not (mono or stereo):
        return None
    row = np.zeros(resolution * 4, np.float32)
    rgb = u[:, :3] if mono else v[:, :3]
    for t in range(resolution):
        row[t * 4 : t * 4 + 3] = rgb[t]
    row[3] = 0.0 if mono else 1.0
    return row


def builtin_color_tables(resolution: int = 32, schemes=None) -> "np.ndarray":
    """[P, R*4] per-palette tables for colormap_rows_builtin: cols t*4+c hold
    the rgb table (mono: mag-axis gradient, stereo: reversed pan-axis
    gradient, both /256 like the 2D LUT); col 3 is the stereo flag.

    Raises ValueError if any scheme does not fit the built-in structure —
    callers should fall back to the generic two-table kernel
    (`generic_color_tables` + tuple-table `colormap_planes_*`)."""
    from spectrogram_tpu.color.colorscheme import DEFAULT_COLOR_SCHEMES

    schemes = DEFAULT_COLOR_SCHEMES if schemes is None else schemes
    tables = np.zeros((len(schemes), resolution * 4), np.float32)
    for p, scheme in enumerate(schemes):
        u, v = scheme.factored_tables(resolution)
        row = _builtin_table_row(
            np.asarray(u, np.float32), np.asarray(v, np.float32), resolution
        )
        if row is None:
            raise ValueError(
                f"scheme {getattr(scheme, 'name', p)!r} does not fit the "
                f"built-in mono/stereo LUT structure; use the generic tables"
            )
        tables[p] = row
    return tables


def generic_color_tables(
    resolution: int = 32, schemes=None
) -> tuple["np.ndarray", "np.ndarray"]:
    """(U, V) each [P, R*4] flattened rank-1 factors (cols t*4+c) for the
    generic two-table kernels — serves ANY separable palette, including
    user `FactoredScheme`s the built-in kernel cannot express."""
    from spectrogram_tpu.color.colorscheme import stacked_factored_tables

    u, v = stacked_factored_tables(resolution, schemes)
    p = u.shape[0]
    return (
        u.reshape(p, resolution * 4).astype(np.float32),
        v.reshape(p, resolution * 4).astype(np.float32),
    )


def unpack_rgba(packed) -> "np.ndarray":
    """Host-side: [..., H] i32 RGBA8888 -> [..., H, 4] u8 (zero-copy view)."""
    arr = np.asarray(packed)
    return arr.view(np.uint8).reshape(*arr.shape, 4)


def default_interpret() -> bool:
    """Pallas TPU kernels need interpret mode off-TPU (tests on CPU)."""
    return jax.default_backend() not in ("tpu", "axon")
