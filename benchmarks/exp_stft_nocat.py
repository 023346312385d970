"""STFT kernel stage-2 concat elimination, measured on the real TPU.

v3d (current production): twiddle -> c_cat = concat([cr, ci], axis=1) in
VMEM -> ONE middle-axis dot against f1blk [2n1, 2k1h].  The concat writes a
[TS, 2n1, n2] f32 plane (512 KB at ts=32) every invocation — pure VMEM
copy, no math.

nocat: split f1blk into its two row blocks (f1top = [f1r | f1i],
fbot = [-f1i | f1r]) and issue TWO middle-axis dots summed:
d = cr @ f1top + ci @ f1bot.  Same FLOPs, no concat; reassociates the
contraction (sum over n1 halves then add) so parity is ~1 ulp, not bitwise.

nocat64: nocat at ts=64 (the freed VMEM may admit the bigger block that
OOM'd for v3; measured, not assumed).

MEASURED (v5e, 2026-08-16) — NEGATIVE RESULT, v3d stays production:
  v3d   ts=32: 2.845 ms/push  (ref)
  nocat ts=32: 3.566 ms/push  maxrel=4.9e-05   (-25%: two K=n1 dots + an
        elementwise add lose to one K=2n1 dot; the VMEM concat is cheaper
        than the halved contraction depth)
  nocat ts=64: compile FAILED (VMEM)
  nocat ts=16: 3.652 ms/push
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


def nocat_kernel(left_ref, right_ref, hann_ref, f2cat_ref, twcat_ref,
                 f1top_ref, f1bot_ref, out_l_ref, out_r_ref,
                 *, plan, precision):
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
        d = dg(cr, f1top_ref[:]) + dg(ci, f1bot_ref[:])   # [TS, n2, 2k1h]
        dr, di = d[..., :k1h], d[..., k1h:]
        p = dr * dr + di * di
        out_ref[:] = jnp.sqrt(jnp.swapaxes(p, 1, 2))

    channel(left_ref, out_l_ref)
    channel(right_ref, out_r_ref)


def build(variant, ts=32):
    plan = PLAN
    n1, n2, m = plan.n1, plan.n2, plan.m
    hann2 = sk._scaled_hann(W, m, n1)
    f2cat, twr, twi, f1blk = _block_plan_constants(plan)
    twcat = np.concatenate([twr, twi], axis=1).astype(np.float32)
    f1top, f1bot = f1blk[:n1], f1blk[n1:]

    def const_spec(arr):
        return pl.BlockSpec(arr.shape, lambda i: (0,)*arr.ndim, memory_space=pltpu.VMEM)

    if variant == "v3d":
        kernel = functools.partial(sk._kernel2, plan=plan,
                                   precision=jax.lax.Precision.HIGHEST)
        consts = [hann2, f2cat, twcat, f1blk]
    else:
        kernel = functools.partial(nocat_kernel, plan=plan,
                                   precision=jax.lax.Precision.HIGHEST)
        consts = [hann2, f2cat, twcat, f1top, f1bot]

    def run(l3, r3):
        return pl.pallas_call(
            kernel, grid=(N // ts,),
            in_specs=[pl.BlockSpec((ts, m, n1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)]*2
                     + [const_spec(c) for c in consts],
            out_specs=[pl.BlockSpec((ts, n1//2, n2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)]*2,
            out_shape=[jax.ShapeDtypeStruct((N, n1//2, n2), jnp.float32)]*2,
        )(l3, r3, *[jnp.asarray(c) for c in consts])
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
    for variant, ts in (("v3d", 32), ("nocat", 32), ("nocat", 64), ("nocat", 16)):
        try:
            fn = build(variant, ts)
            ml, _ = fn(l3, r3)
        except Exception as e:
            print(f"{variant} ts={ts}: FAILED {type(e).__name__}: {str(e)[:120]}",
                  flush=True)
            continue
        if ref is None:
            ref = np.asarray(ml)
            ok = "ref"
        else:
            d = np.abs(np.asarray(ml) - ref)
            rel = d / (np.abs(ref) + 1e-12)
            ok = f"maxabs={d.max():.2e} maxrel={rel.max():.2e}"
        t = scan_bench(fn, l3, r3)
        print(f"{variant} ts={ts}: {t:.3f} ms/push  {ok}", flush=True)


if __name__ == "__main__":
    main()
