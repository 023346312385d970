"""Throwaway experiment harness: stft kernel variants on the real TPU.

Variants:
  A: production stft_mag_fused2 (ts=32)             [control]
  B: A + vmem_limit raised, ts=64 / 128
  C: middle-axis dot_general (no pre-dot swapaxes), ts=32
  D: C + raised vmem, ts=64
Each measured with the scalar-checksum scan bench.
"""

import sys, pathlib, time, functools

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spectrogram_tpu.config import BENCH_CONFIG as CFG
from spectrogram_tpu.ops import stft as stft_ops
from spectrogram_tpu.ops.mxu_fft import make_plan, _block_plan_constants
from spectrogram_tpu.ops.pallas import stft_kernel as sk

PLAN = make_plan(CFG)
N = 4096
W = CFG.window_size
rng = np.random.default_rng(0)
LEFT = jnp.asarray(rng.standard_normal((N, W)).astype(np.float32) * 0.1)
RIGHT = jnp.asarray(rng.standard_normal((N, W)).astype(np.float32) * 0.1)


def _kernel3(left_ref, right_ref, hann_ref, f2cat_ref, twcat_ref, f1blk_ref,
             out_l_ref, out_r_ref, *, plan, precision):
    n1, n2, m = plan.n1, plan.n2, plan.m
    kw = dict(preferred_element_type=jnp.float32, precision=precision)
    window = hann_ref[:]
    twr_t = twcat_ref[:, :n2]
    twi_t = twcat_ref[:, n2:]

    def channel(x_ref, out_ref):
        x = x_ref[:] * window                                  # [TS, m, n1]
        # contract the MIDDLE axis directly: no swapaxes, no reshape
        b = jax.lax.dot_general(
            x, f2cat_ref[:], (((1,), (0,)), ((), ())), **kw
        )                                                      # [TS, n1, 2n2]
        br, bi = b[..., :n2], b[..., n2:]
        cr = br * twr_t - bi * twi_t
        ci = br * twi_t + bi * twr_t
        c_cat = jnp.concatenate([cr, ci], axis=1)              # [TS, 2n1, n2]
        d = jax.lax.dot_general(
            c_cat, f1blk_ref[:], (((1,), (0,)), ((), ())), **kw
        )                                                      # [TS, n2, 2k1h]
        k1h = n1 // 2
        dr = jnp.swapaxes(d[..., :k1h], 1, 2)
        di = jnp.swapaxes(d[..., k1h:], 1, 2)
        out_ref[:] = jnp.sqrt(dr * dr + di * di) * (2.0 / (m * n1))

    channel(left_ref, out_l_ref)
    channel(right_ref, out_r_ref)


def fused_variant(kernel_body, ts, vmem=None, precision=jax.lax.Precision.HIGHEST):
    plan = PLAN
    n1, n2, m = plan.n1, plan.n2, plan.m
    half = (n1 // 2) * n2
    n_pad = N
    left3 = LEFT.reshape(n_pad, m, n1)
    right3 = RIGHT.reshape(n_pad, m, n1)
    hann2 = stft_ops.hann_window_np(W).reshape(m, n1)
    f2cat, twr, twi, f1blk = _block_plan_constants(plan)
    twcat = np.concatenate([twr, twi], axis=1).astype(np.float32)

    def const_spec(arr):
        return pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(kernel_body, plan=plan, precision=precision)
    params = {}
    if vmem:
        params["compiler_params"] = pltpu.CompilerParams(vmem_limit_bytes=vmem)

    @jax.jit
    def run(left3, right3):
        return pl.pallas_call(
            kernel,
            grid=(n_pad // ts,),
            in_specs=[
                pl.BlockSpec((ts, m, n1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((ts, m, n1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                const_spec(hann2), const_spec(f2cat), const_spec(twcat),
                const_spec(f1blk),
            ],
            out_specs=[
                pl.BlockSpec((ts, n1 // 2, n2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((ts, n1 // 2, n2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n_pad, n1 // 2, n2), jnp.float32),
                jax.ShapeDtypeStruct((n_pad, n1 // 2, n2), jnp.float32),
            ],
            **params,
        )(left3, right3, jnp.asarray(hann2), jnp.asarray(f2cat),
          jnp.asarray(twcat), jnp.asarray(f1blk))

    return run


def scan_bench(fn, iters=100):
    @jax.jit
    def run(l, r):
        def body(c, _):
            ol, orr = fn(c, r)
            c2 = c + ol[:, :1, :1] * 1e-20
            return c2, ol[0, 0, 0]
        return jax.lax.scan(body, l, None, length=iters)

    c, outs = run(LEFT.reshape(N, PLAN.m, PLAN.n1), RIGHT.reshape(N, PLAN.m, PLAN.n1))
    np.asarray(outs)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        c, outs = run(LEFT.reshape(N, PLAN.m, PLAN.n1), RIGHT.reshape(N, PLAN.m, PLAN.n1))
        np.asarray(c[0, 0, 0]); np.asarray(outs)
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e3


def ref_mags():
    ml, mr = sk.stft_mag_fused2(LEFT, RIGHT, CFG, slice_bins=False)
    return np.asarray(ml), np.asarray(mr)


def main():
    print("plan:", PLAN, flush=True)
    ref_l, ref_r = ref_mags()
    half = (PLAN.n1 // 2) * PLAN.n2

    variants = [
        ("A ts=32 (prod)", sk._kernel2, 32, None),
        ("B ts=64 vmem=96M", sk._kernel2, 64, 96 * 1024 * 1024),
        ("B2 ts=128 vmem=96M", sk._kernel2, 128, 96 * 1024 * 1024),
        ("C dotgen ts=32", _kernel3, 32, None),
        ("D dotgen ts=64 vmem=96M", _kernel3, 64, 96 * 1024 * 1024),
    ]
    for name, body, ts, vmem in variants:
        try:
            fn = fused_variant(body, ts, vmem)
            def wrapped(l3, r3, fn=fn):
                return fn(l3, r3)
            ml, mr = fn(LEFT.reshape(N, PLAN.m, PLAN.n1),
                        RIGHT.reshape(N, PLAN.m, PLAN.n1))
            ok = np.allclose(np.asarray(ml).reshape(N, half), ref_l,
                             rtol=1e-5, atol=1e-7)
            t = scan_bench(wrapped)
            print(f"{name}: {t:.3f} ms/push  parity={ok}", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
