"""Ablate the banded colormap kernel: dots vs laws vs LUT vs overhead.

Variants (same grid/BlockSpecs/banding as production, DEFAULT precision):
  full     — production _builtin_kernel
  nolut    — dots + dB/pan laws + quantize of mag (LUT replaced by ramp)
  dotsonly — dots + bit-pack of the raw resample output (no laws, no LUT)
  nodots   — laws + LUT on the RAW plane slice broadcast (dots replaced by
             a [ts, th] slice of the left plane; isolates VPU+overhead)

Run on the real chip; differences localize the 0.95 ms.

MEASURED (v5e, 2026-08-16), 4096 rows, b=2047, ts=128 th=128, DEFAULT:
  full     0.961 ms
  nolut    0.590 ms   -> LUT stage ~0.37 ms (even with segment-tent)
  dotsonly 0.549 ms   -> laws ~0.04 ms
  nodots   0.945 ms   -> dots ~free at DEFAULT; floor is DMA + grid-step
                         overhead (~0.55 ms for 256 steps over 5 launches)
Conclusion: the banded colormap is NOT math-bound.  Remaining levers are
fewer/bigger grid steps (ts=256 measured within relay noise: 0.95-1.06
across harnesses — not adopted) and a fundamentally cheaper LUT select;
both measured at <10% end-to-end.  Recorded as the kernel's current floor.
"""
import sys, pathlib, time, functools
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from spectrogram_tpu.config import SpectrogramConfig
from spectrogram_tpu.ops import colormap as co
from spectrogram_tpu.ops.pallas import colormap_kernel as ck

CFG = SpectrogramConfig(
    sample_rate=48000.0, window_period=2048 / 48000.0, viewport_height=1024
)
N = 4096
MT_NP = co.resample_matrix_full(CFG).T
SEGS = ck.band_segments(MT_NP)
rng = np.random.default_rng(0)
B = MT_NP.shape[0]
LEFT = jnp.asarray(np.abs(rng.standard_normal((N, B))).astype(np.float32) * 0.01)
RIGHT = jnp.asarray(np.abs(rng.standard_normal((N, B))).astype(np.float32) * 0.01)
TABS = jnp.asarray(ck.builtin_color_tables(32))[rng.integers(0, 19, N)]
MT = jnp.asarray(MT_NP)
PREC = jax.lax.Precision.DEFAULT


def make_kernel(variant, res, subtile):
    def kern(left_ref, right_ref, mat_ref, tab_ref, out_ref):
        left = left_ref[:]
        right = right_ref[:]
        stereo = tab_ref[:, 3][:, None]
        h = mat_ref.shape[1]
        for hc in range(h // subtile):
            sl = slice(hc * subtile, (hc + 1) * subtile)
            mat_tile = mat_ref[:, sl]
            if variant == "nodots":
                pl_ = left[:, : subtile]
                pr_ = right[:, : subtile]
            else:
                pl_ = jnp.dot(left, mat_tile, preferred_element_type=jnp.float32,
                              precision=PREC)
                pr_ = jnp.dot(right, mat_tile, preferred_element_type=jnp.float32,
                              precision=PREC)
            if variant == "dotsonly":
                w = (pl_ * 255.0).astype(jnp.int32)
                out_ref[:, sl] = w | (w << 8)
                continue
            power = pl_ * pl_ + pr_ * pr_
            db = 10.0 * jnp.log10(power + CFG.db_epsilon)
            mag = (db - CFG.min_db) / (CFG.max_db - CFG.min_db)
            denom = pl_ + pr_
            pan = jnp.where(denom != 0.0, pr_ / jnp.where(denom != 0.0, denom, 1.0), 0.5)
            xu = jnp.clip(jnp.clip(mag, 0.0, 1.0) * res - 0.5, 0.0, res - 1.0)
            xv = jnp.clip(jnp.clip(pan, 0.0, 1.0) * res - 0.5, 0.0, res - 1.0)
            x_color = stereo * xv + (1.0 - stereo) * xu
            if variant == "nolut":
                rgb = [x_color * (1.0 / (res - 1))] * 3
            else:
                rgb = ck._tent_lut_channels(x_color, tab_ref, (0, 1, 2), res)
            alpha = stereo * (xu * (1.0 / (res - 1))) + (1.0 - stereo)

            def q(x):
                return jnp.clip(jnp.round(x * 255.0), 0.0, 255.0).astype(jnp.int32)

            out_ref[:, sl] = q(rgb[0]) | (q(rgb[1]) << 8) | (q(rgb[2]) << 16) | (q(alpha) << 24)
    return kern


def banded(variant, left, right, tabs, ts=128, th=128):
    n, b = left.shape
    outs = []
    for p0, p1, lo, hi in SEGS:
        band = hi - lo
        h_seg = p1 - p0
        mat_seg = MT[lo:hi, p0:p1]
        if h_seg % th:
            mat_seg = jnp.pad(mat_seg, ((0, 0), (0, th - h_seg % th)))
        h_pad = mat_seg.shape[1]
        kernel = make_kernel(variant, 32, ck._subtile_for(th))
        elem_ok = ts % 8 == 0 and lo % 128 == 0 and (band % 128 == 0 or (lo == 0 and band == b))
        if elem_ok:
            plane_spec = pl.BlockSpec((pl.Element(ts), pl.Element(band)),
                                      lambda i, j, lo=lo: (i * ts, lo),
                                      memory_space=pltpu.VMEM)
            pl_l, pl_r = left, right
        else:
            plane_spec = pl.BlockSpec((ts, band), lambda i, j: (i, 0),
                                      memory_space=pltpu.VMEM)
            pl_l, pl_r = left[:, lo:hi], right[:, lo:hi]
        out = pl.pallas_call(
            kernel, grid=(n // ts, h_pad // th),
            in_specs=[plane_spec, plane_spec,
                      pl.BlockSpec((band, th), lambda i, j: (0, j), memory_space=pltpu.VMEM),
                      pl.BlockSpec((ts, 128), lambda i, j: (i, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((ts, th), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, h_pad), jnp.int32),
        )(pl_l, pl_r, mat_seg, tabs)
        outs.append(out[:, :h_seg])
    return jnp.concatenate(outs, axis=1)


def scan_bench(fn, iters=100):
    @jax.jit
    def run(l):
        def body(c, _):
            out = fn(c, RIGHT)
            c2 = c + (out[:1, :1] & 1).astype(jnp.float32) * 1e-12
            return c2, out[0, 0]
        return jax.lax.scan(body, l, None, length=iters)
    c, outs = run(LEFT)
    np.asarray(c[0, 0]); np.asarray(outs)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        c, outs = run(LEFT)
        np.asarray(c[0, 0]); np.asarray(outs)
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e3


def main():
    for variant in ("full", "nolut", "dotsonly", "nodots"):
        try:
            f = functools.partial(banded, variant, tabs=TABS)
            fn = lambda l, r: f(l, r)
            np.asarray(fn(LEFT, RIGHT))
            t = scan_bench(fn)
            print(f"{variant}: {t:.3f} ms", flush=True)
        except Exception as e:
            print(f"{variant}: FAILED {type(e).__name__} {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
