"""Merged single-kernel push vs two-kernel chain on the real TPU."""
import sys, pathlib, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np, jax, jax.numpy as jnp
from spectrogram_tpu.config import BENCH_CONFIG as CFG
from spectrogram_tpu.ops import colormap as co
from spectrogram_tpu.ops.pallas import colormap_kernel as ck
from spectrogram_tpu.ops.pallas import stft_kernel as sk
from spectrogram_tpu.ops.pallas import push_kernel as pk

mt_np = co.resample_matrix_full(CFG).T
segs = ck.band_segments(mt_np)
rng = np.random.default_rng(0)
N, w = 4096, CFG.window_size
left = jnp.asarray(rng.standard_normal((N, w)).astype(np.float32) * 0.1)
right = jnp.asarray(rng.standard_normal((N, w)).astype(np.float32) * 0.1)
tabs = jnp.asarray(ck.builtin_color_tables(32))[rng.integers(0, 19, N)]
mt = jnp.asarray(mt_np)
HI = jax.lax.Precision.HIGHEST
DE = jax.lax.Precision.DEFAULT

merged = pk.push_fused_single(left, right, tabs, mt, CFG, segs)
rl, rr = sk.stft_mag_fused2(left, right, CFG, slice_bins=False)
chain = ck.colormap_planes_banded(rl, rr, tabs, mt, CFG, segs)
print("TPU parity:", bool((np.asarray(merged) == np.asarray(chain)).all()), flush=True)

def scan_bench(fn, iters=100):
    @jax.jit
    def run(l):
        def body(c, _):
            out = fn(c)
            return c + (out[:, :1] & 1).astype(jnp.float32) * 1e-20, out[0, 0]
        return jax.lax.scan(body, l, None, length=iters)
    c, outs = run(left); np.asarray(outs)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter(); c, outs = run(left)
        np.asarray(c[0, 0]); np.asarray(outs)
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e3

def chain_fn(pc):
    def f(l):
        ml, mr = sk.stft_mag_fused2(l, right, CFG, slice_bins=False)
        return ck.colormap_planes_banded(ml, mr, tabs, mt, CFG, segs, precision=pc)
    return f

for name, pc in (("exact/HIGHEST", HI), ("fast/DEFAULT", DE)):
    t_chain = scan_bench(chain_fn(pc))
    t_merged = scan_bench(lambda l: pk.push_fused_single(
        l, right, tabs, mt, CFG, segs, precision_cmap=pc))
    t_merged_m = scan_bench(lambda l: pk.push_fused_single(
        l, right, tabs, mt, CFG, segs, precision_cmap=pc, emit_mags=True)[0])
    print(f"{name}: chain {t_chain:.3f}  merged {t_merged:.3f}  "
          f"merged+mags {t_merged_m:.3f} ms/push", flush=True)
