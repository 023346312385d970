"""stft kernel v3 vs v3c/v3d on the real TPU.

v3c: compute power in the pre-swap [TS, n2, 2k1h] layout (one swapaxes of
     the power plane instead of two of dr/di), sqrt after the swap.
v3d: v3c + the 2/W scale folded into the Hann constant (removes the final
     elementwise scale pass; changes rounding by <=1 ulp).
"""
import sys, pathlib, time, functools
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from spectrogram_tpu.config import BENCH_CONFIG as CFG
from spectrogram_tpu.ops import stft as stft_ops
from spectrogram_tpu.ops.mxu_fft import make_plan, _block_plan_constants
from spectrogram_tpu.ops.pallas import stft_kernel as sk

PLAN = make_plan(CFG)
N, W = 4096, CFG.window_size
rng = np.random.default_rng(0)
LEFT = jnp.asarray(rng.standard_normal((N, W)).astype(np.float32) * 0.1)
RIGHT = jnp.asarray(rng.standard_normal((N, W)).astype(np.float32) * 0.1)


def make_kernel(variant):
    def kern(left_ref, right_ref, hann_ref, f2cat_ref, twcat_ref, f1blk_ref,
             out_l_ref, out_r_ref, *, plan, precision):
        n1, n2, m = plan.n1, plan.n2, plan.m
        kw = dict(preferred_element_type=jnp.float32, precision=precision)
        window = hann_ref[:]
        twr_t = twcat_ref[:, :n2]
        twi_t = twcat_ref[:, n2:]
        k1h = n1 // 2

        def dg(a, b):
            return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())), **kw)

        def channel(x_ref, out_ref):
            x = x_ref[:] * window
            b = dg(x, f2cat_ref[:])
            br, bi = b[..., :n2], b[..., n2:]
            cr = br * twr_t - bi * twi_t
            ci = br * twi_t + bi * twr_t
            c_cat = jnp.concatenate([cr, ci], axis=1)
            d = dg(c_cat, f1blk_ref[:])                  # [TS, n2, 2k1h]
            dr, di = d[..., :k1h], d[..., k1h:]
            p = dr * dr + di * di                        # power pre-swap
            p = jnp.swapaxes(p, 1, 2)                    # ONE swap
            if variant == "v3c":
                out_ref[:] = jnp.sqrt(p) * (2.0 / (m * n1))
            else:                                        # v3d: scale in hann
                out_ref[:] = jnp.sqrt(p)

        channel(left_ref, out_l_ref)
        channel(right_ref, out_r_ref)

    return kern


def build(variant, ts=32):
    plan = PLAN
    n1, n2, m = plan.n1, plan.n2, plan.m
    hann2 = stft_ops.hann_window_np(W).reshape(m, n1)
    if variant == "v3d":
        hann2 = (hann2 * (2.0 / W)).astype(np.float32)
    f2cat, twr, twi, f1blk = _block_plan_constants(plan)
    twcat = np.concatenate([twr, twi], axis=1).astype(np.float32)

    def const_spec(arr):
        return pl.BlockSpec(arr.shape, lambda i: (0,)*arr.ndim, memory_space=pltpu.VMEM)

    body = sk._kernel2 if variant == "v3" else make_kernel(variant)
    kernel = functools.partial(body, plan=plan, precision=jax.lax.Precision.HIGHEST)

    def run(l3, r3):
        return pl.pallas_call(
            kernel, grid=(N // ts,),
            in_specs=[pl.BlockSpec((ts, m, n1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)]*2
                     + [const_spec(hann2), const_spec(f2cat), const_spec(twcat), const_spec(f1blk)],
            out_specs=[pl.BlockSpec((ts, n1//2, n2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)]*2,
            out_shape=[jax.ShapeDtypeStruct((N, n1//2, n2), jnp.float32)]*2,
        )(l3, r3, jnp.asarray(hann2), jnp.asarray(f2cat), jnp.asarray(twcat), jnp.asarray(f1blk))
    return run


def scan_bench(fn, l3, r3, iters=150):
    @jax.jit
    def runb(x):
        def body(c, _):
            ol, _ = fn(c, r3)
            return c + ol[:1, :1, :1] * 1e-20, ol[0, 0, 0]
        return jax.lax.scan(body, x, None, length=iters)
    c, outs = runb(l3); np.asarray(outs)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter(); c, outs = runb(l3)
        np.asarray(c[0, 0, 0]); np.asarray(outs)
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e3


def main():
    l3 = LEFT.reshape(N, PLAN.m, PLAN.n1)
    r3 = RIGHT.reshape(N, PLAN.m, PLAN.n1)
    ref = None
    for variant in ("v3", "v3c", "v3d"):
        fn = build(variant)
        ml, _ = fn(l3, r3)
        if ref is None:
            ref = np.asarray(ml)
            ok = "ref"
        else:
            d = np.abs(np.asarray(ml) - ref)
            rel = d / (np.abs(ref) + 1e-12)
            ok = f"maxrel={rel.max():.2e}"
        t = scan_bench(fn, l3, r3)
        print(f"{variant}: {t:.3f} ms/push  {ok}", flush=True)


if __name__ == "__main__":
    main()
