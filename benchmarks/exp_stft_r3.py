"""Round-3 STFT kernel experiments: window-plane layout + stage-2 orientation.

Hypotheses (VERDICT r2 weak #2: kernel 2.06 ms vs ~1.4 ms floor):

tw  — the production input view [TS, m, n1] puts n1=32 on the LANE dim
      (pads 4x in (8,128) f32 tiles) and contracts the MIDDLE axis.
      Feeding windows TRANSPOSED per stream ([TS, n1, m]: lanes hold the m
      axis, 75 -> 128 pad = 1.7x) turns stage 1 into a LAST-axis
      contraction (the MXU-natural orientation) at 2.4x smaller block
      footprints.  The extra [m, n1] -> [n1, m] transpose moves OUTSIDE the
      kernel where XLA can fuse it into the framing copy.
tw64 — tw at ts=64 (the smaller blocks may admit what OOM'd for v3).
dT  — stage 2 flipped: dot_general(f1blk, c_cat) emits [2k1h, TS, n2], so
      the final LANE-dim swapaxes (n2 <-> k1h) becomes a leading-axis
      transpose (sublane copies only).
tw_dT — both.

MEASURED (v5e, 2026-08-16), N=4096 streams, bench geometry (W=2400, pad
4096, plan n1=32 n2=128 m=75), 150-iter scan, best of 3, two runs:

  v3d   ts=32: 2.885 / 2.810 ms/push   (production reference)
  tw    ts=32: 2.553 ms  maxabs=0.0    <- BITWISE equal; -12%
  tw    ts=64/128: compile failed (VMEM)
  dT    ts=32: 1.842 ms  maxrel=3.2e-07  <- -36%! (prediction wrong: the
        flipped orientation LOWERS better than the lane-dim swapaxes)
  dT    ts=64: compile failed
  tw_dT ts=32: 1.422 ms  maxrel=3.2e-07
  tw_dT ts=64: 1.391 / 1.421 ms        <- WINNER, -52%, at the estimated
        ~1.4 ms floor; ts=128 OOMs
  (maxrel 3.2e-07 = ~2 ulp from the stage-2 MXU pass association; stage 1
  via tw is bit-identical)

Adopted in production as v4 (stft_kernel.py): plane entry point = tw_dT
(transposed windows, ts default 64); buf entry point = dT only (lane-dim
element offsets forbid the transposed view), keeping the two entry points
bitwise-equal to EACH OTHER.
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
N, W = 4096, CFG.window_size
rng = np.random.default_rng(0)
LEFT = jnp.asarray(rng.standard_normal((N, W)).astype(np.float32) * 0.1)
RIGHT = jnp.asarray(rng.standard_normal((N, W)).astype(np.float32) * 0.1)
HIGH = jax.lax.Precision.HIGHEST


def tw_kernel(left_ref, right_ref, hann_ref, f2cat_ref, twcat_ref, f1blk_ref,
              out_l_ref, out_r_ref, *, plan, d_t):
    """Inputs [TS, n1, m]; stage 1 contracts the LAST axis."""
    n1, n2, m = plan.n1, plan.n2, plan.m
    kw = dict(preferred_element_type=jnp.float32, precision=HIGH)
    twr_t = twcat_ref[:, :n2]
    twi_t = twcat_ref[:, n2:]
    k1h = n1 // 2

    def channel(x_ref, out_ref):
        x = x_ref[:] * hann_ref[:]                             # [TS, n1, m]
        b = jax.lax.dot_general(
            x, f2cat_ref[:], (((2,), (0,)), ((), ())), **kw
        )                                                      # [TS, n1, 2n2]
        br, bi = b[..., :n2], b[..., n2:]
        cr = br * twr_t - bi * twi_t
        ci = br * twi_t + bi * twr_t
        c_cat = jnp.concatenate([cr, ci], axis=1)              # [TS, 2n1, n2]
        if d_t:
            d = jax.lax.dot_general(
                f1blk_ref[:], c_cat, (((0,), (1,)), ((), ())), **kw
            )                                                  # [2k1h, TS, n2]
            dr, di = d[:k1h], d[k1h:]
            p = dr * dr + di * di
            out_ref[:] = jnp.transpose(jnp.sqrt(p), (1, 0, 2))
        else:
            d = jax.lax.dot_general(
                c_cat, f1blk_ref[:], (((1,), (0,)), ((), ())), **kw
            )                                                  # [TS, n2, 2k1h]
            dr, di = d[..., :k1h], d[..., k1h:]
            p = dr * dr + di * di
            out_ref[:] = jnp.sqrt(jnp.swapaxes(p, 1, 2))

    channel(left_ref, out_l_ref)
    channel(right_ref, out_r_ref)


def v3d_dT_kernel(left_ref, right_ref, hann_ref, f2cat_ref, twcat_ref,
                  f1blk_ref, out_l_ref, out_r_ref, *, plan):
    """Production layout but stage-2 flipped (dT alone)."""
    n1, n2, m = plan.n1, plan.n2, plan.m
    kw = dict(preferred_element_type=jnp.float32, precision=HIGH)
    twr_t = twcat_ref[:, :n2]
    twi_t = twcat_ref[:, n2:]
    k1h = n1 // 2

    def channel(x_ref, out_ref):
        x = x_ref[:] * hann_ref[:]
        b = jax.lax.dot_general(x, f2cat_ref[:], (((1,), (0,)), ((), ())), **kw)
        br, bi = b[..., :n2], b[..., n2:]
        cr = br * twr_t - bi * twi_t
        ci = br * twi_t + bi * twr_t
        c_cat = jnp.concatenate([cr, ci], axis=1)
        d = jax.lax.dot_general(
            f1blk_ref[:], c_cat, (((0,), (1,)), ((), ())), **kw
        )                                                      # [2k1h, TS, n2]
        dr, di = d[:k1h], d[k1h:]
        p = dr * dr + di * di
        out_ref[:] = jnp.transpose(jnp.sqrt(p), (1, 0, 2))

    channel(left_ref, out_l_ref)
    channel(right_ref, out_r_ref)


def build(variant, ts=32):
    plan = PLAN
    n1, n2, m = plan.n1, plan.n2, plan.m
    hann2 = sk._scaled_hann(W, m, n1)
    f2cat, twr, twi, f1blk = _block_plan_constants(plan)
    twcat = np.concatenate([twr, twi], axis=1).astype(np.float32)
    transposed = variant.startswith("tw")
    if transposed:
        hann_c = hann2.T.copy()                                # [n1, m]
        in_block = (ts, n1, m)
    else:
        hann_c = hann2
        in_block = (ts, m, n1)
    consts = [hann_c, f2cat, twcat, f1blk]

    if variant == "v3d":
        kernel = functools.partial(sk._kernel2, plan=plan, precision=HIGH)
    elif variant == "dT":
        kernel = functools.partial(v3d_dT_kernel, plan=plan)
    elif variant in ("tw", "tw_dT"):
        kernel = functools.partial(tw_kernel, plan=plan, d_t=variant == "tw_dT")
    else:
        raise ValueError(variant)

    def const_spec(arr):
        return pl.BlockSpec(arr.shape, lambda i: (0,)*arr.ndim, memory_space=pltpu.VMEM)

    def run(l3, r3):
        return pl.pallas_call(
            kernel, grid=(N // ts,),
            in_specs=[pl.BlockSpec(in_block, lambda i: (i, 0, 0), memory_space=pltpu.VMEM)]*2
                     + [const_spec(c) for c in consts],
            out_specs=[pl.BlockSpec((ts, n1//2, n2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)]*2,
            out_shape=[jax.ShapeDtypeStruct((N, n1//2, n2), jnp.float32)]*2,
        )(l3, r3, *[jnp.asarray(c) for c in consts])
    return run, transposed


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
    m, n1 = PLAN.m, PLAN.n1
    l3 = LEFT.reshape(N, m, n1)
    r3 = RIGHT.reshape(N, m, n1)
    l3t = jnp.swapaxes(l3, 1, 2).copy()
    r3t = jnp.swapaxes(r3, 1, 2).copy()
    ref = None
    for variant, ts in (("v3d", 32), ("tw_dT", 32), ("tw_dT", 64),
                        ("tw_dT", 128), ("dT", 64)):
        try:
            fn, transposed = build(variant, ts)
            a, b = (l3t, r3t) if transposed else (l3, r3)
            ml, _ = fn(a, b)
            ml = np.asarray(ml)
        except Exception as e:
            print(f"{variant} ts={ts}: FAILED {type(e).__name__}: {str(e)[:140]}",
                  flush=True)
            continue
        if ref is None:
            ref = ml
            ok = "ref"
        else:
            d = np.abs(ml - ref)
            rel = d / (np.abs(ref) + 1e-12)
            ok = f"maxabs={d.max():.2e} maxrel={rel.max():.2e}"
        t = scan_bench(fn, a, b)
        print(f"{variant} ts={ts}: {t:.3f} ms/push  {ok}", flush=True)


if __name__ == "__main__":
    main()
