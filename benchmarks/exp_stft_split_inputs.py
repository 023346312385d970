"""Can the window-plane copies die? v3d (one plane operand per channel)
vs v4 (carry plane + chunk plane per channel, concat in VMEM).

If v4's kernel time matches v3d, the pipeline can feed carry/chunk planes
directly (channel-major ingest) and skip the 0.42 ms/push concat+slice
copies entirely.  Requires (W-hop) % n1 == 0 and hop % n1 == 0.
"""
import sys, pathlib, time, functools
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from spectrogram_tpu.config import BENCH_CONFIG as CFG
from spectrogram_tpu.ops.mxu_fft import make_plan, _block_plan_constants
from spectrogram_tpu.ops.pallas import stft_kernel as sk

PLAN = make_plan(CFG)
N, W, H = 4096, CFG.window_size, CFG.hop_size
C = W - H  # carry length (k=1)
rng = np.random.default_rng(0)
FULL_L = rng.standard_normal((N, W)).astype(np.float32) * 0.1
FULL_R = rng.standard_normal((N, W)).astype(np.float32) * 0.1


def _kernel4(cl_ref, ck_ref, rl_ref, rk_ref, hann_ref, f2cat_ref, twcat_ref,
             f1blk_ref, out_l_ref, out_r_ref, *, plan, precision):
    def channel(carry_ref, chunk_ref, out_ref):
        x = jnp.concatenate([carry_ref[:], chunk_ref[:]], axis=1)
        out_ref[:] = sk._fft_mag_value(
            x, hann_ref, f2cat_ref, twcat_ref, f1blk_ref,
            plan=plan, precision=precision)

    channel(cl_ref, ck_ref, out_l_ref)
    channel(rl_ref, rk_ref, out_r_ref)


def build(variant, ts=32):
    plan = PLAN
    n1, n2, m = plan.n1, plan.n2, plan.m
    hann2 = sk._scaled_hann(W, m, n1)
    f2cat, twr, twi, f1blk = _block_plan_constants(plan)
    twcat = np.concatenate([twr, twi], axis=1).astype(np.float32)
    consts = [hann2, f2cat, twcat, f1blk]

    def const_spec(arr):
        return pl.BlockSpec(arr.shape, lambda i: (0,)*arr.ndim, memory_space=pltpu.VMEM)

    if variant == "v3d":
        kernel = functools.partial(sk._kernel2, plan=plan, precision=jax.lax.Precision.HIGHEST)

        def run(cl, ckk, rl, rk):
            l3 = jnp.concatenate([cl, ckk], axis=1).reshape(N, m, n1)
            r3 = jnp.concatenate([rl, rk], axis=1).reshape(N, m, n1)
            return pl.pallas_call(
                kernel, grid=(N // ts,),
                in_specs=[pl.BlockSpec((ts, m, n1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)]*2
                         + [const_spec(c) for c in consts],
                out_specs=[pl.BlockSpec((ts, n1//2, n2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)]*2,
                out_shape=[jax.ShapeDtypeStruct((N, n1//2, n2), jnp.float32)]*2,
            )(l3, r3, *[jnp.asarray(c) for c in consts])
    else:
        kernel = functools.partial(_kernel4, plan=plan, precision=jax.lax.Precision.HIGHEST)
        mc, mk = C // n1, H // n1

        def run(cl, ckk, rl, rk):
            specs = [
                pl.BlockSpec((ts, mc, n1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((ts, mk, n1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((ts, mc, n1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((ts, mk, n1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ] + [const_spec(c) for c in consts]
            return pl.pallas_call(
                kernel, grid=(N // ts,),
                in_specs=specs,
                out_specs=[pl.BlockSpec((ts, n1//2, n2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)]*2,
                out_shape=[jax.ShapeDtypeStruct((N, n1//2, n2), jnp.float32)]*2,
            )(cl.reshape(N, mc, n1), ckk.reshape(N, mk, n1),
              rl.reshape(N, mc, n1), rk.reshape(N, mk, n1),
              *[jnp.asarray(c) for c in consts])
    return run


def scan_bench(fn, args, iters=150):
    @jax.jit
    def runb(a0, rest):
        def body(c, _):
            ol, _ = fn(c, *rest)
            return c + ol[:1, :1, 0] * 1e-20, ol[0, 0, 0]
        return jax.lax.scan(body, a0, None, length=iters)
    a0, rest = args[0], args[1:]
    c, outs = runb(a0, rest); np.asarray(outs)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter(); c, outs = runb(a0, rest)
        np.asarray(c[0, 0]); np.asarray(outs)
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e3


def main():
    cl = jnp.asarray(FULL_L[:, :C]); ckk = jnp.asarray(FULL_L[:, C:])
    rl = jnp.asarray(FULL_R[:, :C]); rk = jnp.asarray(FULL_R[:, C:])
    ref = None
    for variant in ("v3d", "v4"):
        fn = build(variant)
        ml, _ = fn(cl, ckk, rl, rk)
        if ref is None:
            ref, ok = np.asarray(ml), "ref"
        else:
            ok = f"bitwise={bool((np.asarray(ml) == ref).all())}"
        t = scan_bench(fn, (cl, ckk, rl, rk))
        print(f"{variant}: {t:.3f} ms/push (incl. any XLA-side concat)  {ok}",
              flush=True)


if __name__ == "__main__":
    main()
