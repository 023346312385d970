"""E14 (round 4, late): in-kernel operand transpose — kill the k=1 XLA
[S, m, n1] -> [S, n1, m] relayout copies by transposing the LOADED VMEM
value instead.

Context: the k=1 push pays ~2.3 ms at 10,240 streams between the concat
and the kernel (A = 4.87 ms total vs ~2.56 ms kernel).  E13 (split-state
operands, exp_stft_tsplit) measured NEGATIVE: splitting stage 1 into two
narrow dots (39/25-lane operands, both padded to 128 lanes) costs more
MXU work than the glue it deletes (C combined-channel 5.33 ms, B
per-channel 6.72 ms vs A 4.87 ms at 10k).  E14 keeps ONE full-width
stage-1 dot and instead deletes only the transpose copies: operands
arrive [ts, m, n1] (a FREE reshape view of the concat buffer — no XLA
transpose pass), and the kernel runs jnp.swapaxes(x, 1, 2) on the loaded
value before the identical v4 tw math.

Open question this probes: does Mosaic lower a last-two-dims VMEM
transpose (m=64 x n1=32 per row) cheaply, or at all ('unsupported shape
cast' is the known failure class for layout casts)?

A = production k=1 path; G = E14.  Parity must be BITWISE (same dots,
same order — only the operand movement differs).
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
S = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
W, H = CFG.window_size, CFG.hop_size
C = W - H
N1, N2, M = PLAN.n1, PLAN.n2, PLAN.m
HIGH = jax.lax.Precision.HIGHEST

rng = np.random.default_rng(0)
CARRY = jnp.asarray(rng.standard_normal((S, 2, C)).astype(np.float32) * 0.1)
CHUNK = jnp.asarray(rng.standard_normal((S, 2, H)).astype(np.float32) * 0.1)


def ktrans_kernel(l_ref, r_ref, hann_ref, f2cat_ref, twcat_ref, f1blk_ref,
                  out_l_ref, out_r_ref, *, plan, precision):
    """Untransposed [ts, m, n1] operands; swapaxes on the VMEM value, then
    the EXACT v4 tw math + flat 2D out (bitwise vs production)."""
    for x_ref, out_ref in ((l_ref, out_l_ref), (r_ref, out_r_ref)):
        x = jnp.swapaxes(x_ref[:], 1, 2)          # [ts, n1, m] in VMEM
        sk._fft_channel_2d(
            x, hann_ref, f2cat_ref, twcat_ref, f1blk_ref, out_ref,
            plan=plan, precision=precision, transposed=True)


@functools.partial(jax.jit, static_argnames=("ts",))
def stft_ktrans(carry, chunk_pl, ts=64):
    """Planar state format (production) but NO XLA operand transpose: the
    concat buffer reshapes (free) to [S, m, n1] and the kernel transposes
    in VMEM."""
    half = (N1 // 2) * N2
    hann2 = np.ascontiguousarray(sk._scaled_hann(W, M, N1).T)
    f2cat, twr, twi, f1blk = _block_plan_constants(PLAN)
    twcat = np.concatenate([twr, twi], axis=1).astype(np.float32)
    buf_l = jnp.concatenate([carry[:, 0], chunk_pl[:, 0]], axis=1)
    buf_r = jnp.concatenate([carry[:, 1], chunk_pl[:, 1]], axis=1)
    new_carry = jnp.concatenate([carry[:, :, H:], chunk_pl], axis=2)
    l3 = buf_l.reshape(S, M, N1)                  # free views
    r3 = buf_r.reshape(S, M, N1)

    def const_spec(arr):
        return pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(ktrans_kernel, plan=PLAN, precision=HIGH)
    out_l, out_r = pl.pallas_call(
        kernel,
        grid=(S // ts,),
        in_specs=[
            pl.BlockSpec((ts, M, N1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ts, M, N1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            const_spec(hann2),
            const_spec(f2cat),
            const_spec(twcat),
            const_spec(f1blk),
        ],
        out_specs=[
            pl.BlockSpec((ts, half), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ts, half), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((S, half), jnp.float32),
            jax.ShapeDtypeStruct((S, half), jnp.float32),
        ],
        interpret=jax.default_backend() not in ("tpu", "axon"),
    )(l3, r3, jnp.asarray(hann2), jnp.asarray(f2cat), jnp.asarray(twcat),
      jnp.asarray(f1blk))
    return out_l, out_r, new_carry


@jax.jit
def stft_prod(carry, chunk_pl):
    buf_l = jnp.concatenate([carry[:, 0], chunk_pl[:, 0]], axis=1)
    buf_r = jnp.concatenate([carry[:, 1], chunk_pl[:, 1]], axis=1)
    new_carry = jnp.concatenate([carry[:, :, H:], chunk_pl], axis=2)
    ml, mr = sk.stft_mag_fused2(buf_l, buf_r, CFG, slice_bins=False, plan=PLAN)
    return ml, mr, new_carry


def main():
    rl, rr, rc = stft_prod(CARRY, CHUNK)
    rl = np.asarray(rl)
    gl, gr, gc = stft_ktrans(CARRY, CHUNK, ts=64)
    gl = np.asarray(gl)
    np.testing.assert_allclose(gl, rl, rtol=1e-4, atol=1e-6)
    exact = "BITWISE" if (gl == rl).all() else f"maxabs {np.abs(gl-rl).max():.2e}"
    print(f"S={S}: G parity OK ({exact})", flush=True)

    import time as _t
    for name, fn in (
        ("A prod", stft_prod),
        ("G ktrans ts=64", functools.partial(stft_ktrans, ts=64)),
        ("G ktrans ts=32", functools.partial(stft_ktrans, ts=32)),
    ):
        @jax.jit
        def runb(c0, f=fn):
            def body(c, _):
                ml, mr, nc = f(c, CHUNK)
                return nc, ml[0, 0]
            return jax.lax.scan(body, c0, None, length=100)
        c, outs = runb(CARRY); np.asarray(outs)
        best = np.inf
        for _ in range(3):
            t0 = _t.perf_counter(); c, outs = runb(CARRY)
            np.asarray(outs); best = min(best, _t.perf_counter() - t0)
        print(f"{name}: {best / 100 * 1e3:.3f} ms/push (STFT+framing+carry)",
              flush=True)


if __name__ == "__main__":
    main()
