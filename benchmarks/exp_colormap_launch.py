"""Banded-colormap bottleneck hunt: grid-step/launch overhead vs math.

bench_banded_colormap measured the banded kernel ~equal at DEFAULT and
HIGHEST precision (0.95 ms) — it is NOT MXU- or LUT-bound.  Hypothesis:
with (128, 128) tiles the 5 segment launches run 32 row-blocks x 8 px
tiles = 256 grid steps, and per-step overhead dominates.  Variants:

  ts/th sweep   — fewer, bigger blocks (VMEM allowing)
  perseg        — per-segment th = min(h_seg, 512): each segment becomes
                  one px tile (32 x 5 steps total), no padding waste

Run: python benchmarks/exp_colormap_launch.py  (real TPU)

MEASURED (v5e, 2026-08-16), 4096 rows, DEFAULT precision:
  banded ts=128 th=128: 1.028 ms   (production tiling, this harness)
  banded ts=256 th=128: 0.948 ms
  banded ts=128 th=256: 0.969 ms
  banded ts=256 th=256: 0.947 ms
  banded ts=512: compile OOM;  perseg ts=256 max_th=512: 0.923 ms
  BUT bench_banded_colormap with ts=256 measured 1.063 vs 0.946 at ts=128
  — the ts=256 gain does not replicate across harnesses (relay variance
  ~10%), so the production auto-tiling stays (128, 128).  exact=False rows
  are the DEFAULT-vs-HIGHEST reference comparison, not an error.
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


@functools.partial(jax.jit, static_argnames=("block_rows", "max_th", "precision"))
def banded_perseg(left, right, tabs, block_rows=128, max_th=512,
                  precision=jax.lax.Precision.DEFAULT):
    """colormap_planes_banded with PER-SEGMENT pixel-tile width."""
    n, b = left.shape
    ts = block_rows
    n_pad = n
    outs = []
    for p0, p1, lo, hi in SEGS:
        band = hi - lo
        h_seg = p1 - p0
        th = min(h_seg, max_th)
        mat_seg = MT[lo:hi, p0:p1]
        if h_seg % th:
            mat_seg = jnp.pad(mat_seg, ((0, 0), (0, th - h_seg % th)))
        h_pad = mat_seg.shape[1]
        kernel = functools.partial(
            ck._builtin_kernel, res=32, subtile=ck._subtile_for(th),
            min_db=CFG.min_db, max_db=CFG.max_db, db_eps=CFG.db_epsilon,
            precision=precision,
        )
        elem_ok = ts % 8 == 0 and lo % 128 == 0 and (band % 128 == 0 or (lo == 0 and band == b))
        if elem_ok:
            plane_spec = pl.BlockSpec(
                (pl.Element(ts), pl.Element(band)),
                lambda i, j, lo=lo: (i * ts, lo), memory_space=pltpu.VMEM,
            )
            pl_l, pl_r = left, right
        else:
            plane_spec = pl.BlockSpec((ts, band), lambda i, j: (i, 0),
                                      memory_space=pltpu.VMEM)
            pl_l, pl_r = left[:, lo:hi], right[:, lo:hi]
        out = pl.pallas_call(
            kernel, grid=(n_pad // ts, h_pad // th),
            in_specs=[plane_spec, plane_spec,
                      pl.BlockSpec((band, th), lambda i, j: (0, j), memory_space=pltpu.VMEM),
                      pl.BlockSpec((ts, 128), lambda i, j: (i, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((ts, th), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_pad, h_pad), jnp.int32),
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
    print("segments:", SEGS, flush=True)
    ref = np.asarray(ck.colormap_planes_banded(LEFT, RIGHT, TABS, MT, CFG, SEGS))
    prec = jax.lax.Precision.DEFAULT
    for ts, th in ((128, 128), (256, 128), (128, 256), (256, 256), (512, 128)):
        try:
            f = lambda l, r: ck.colormap_planes_banded(
                l, r, TABS, MT, CFG, SEGS, block_rows=ts, block_cols=th,
                precision=prec)
            out = np.asarray(f(LEFT, RIGHT))
            eq = bool((out == ref).all())
            t = scan_bench(f)
            print(f"banded ts={ts} th={th}: {t:.3f} ms  exact={eq}", flush=True)
        except Exception as e:
            print(f"banded ts={ts} th={th}: FAILED {type(e).__name__} {str(e)[:100]}",
                  flush=True)
    for ts, mth in ((128, 512), (256, 512), (128, 1024)):
        try:
            f = lambda l, r: banded_perseg(l, r, TABS, block_rows=ts, max_th=mth)
            out = np.asarray(f(LEFT, RIGHT))
            eq = bool((out == ref).all())
            t = scan_bench(f)
            print(f"perseg ts={ts} max_th={mth}: {t:.3f} ms  exact={eq}", flush=True)
        except Exception as e:
            print(f"perseg ts={ts} max_th={mth}: FAILED {type(e).__name__} {str(e)[:100]}",
                  flush=True)


if __name__ == "__main__":
    main()
