"""E13 (round-4 design + measurement (late round)): transposed split-operand
STFT — the k=1 framing formulation that avoids every prior negative's
MECHANISM.

RESULT (v5e, 2026-08-17): MEASURED NEGATIVE, both variants.
  S=4096:  A prod 1.917 ms | B per-channel 2.779 (ts=32) / 2.841 (ts=16)
  S=10240: A prod 4.866 ms | B 6.719 / 6.830 | C combined 5.325 / 5.439
Parity held (<= 1 ulp, carry bitwise; the in-kernel unaligned static
lane-dim carry stores DO compile and run on hardware — that part of the
probe succeeded).  Mechanism of the loss: stage 1 split at the
carry/chunk boundary = TWO dots over 39- and 25-lane operands, each
lane-padded to 128 — ~2x the stage-1 MXU work of production's single
64-lane dot, which outweighs the ~2 ms of concat+transpose glue it
deletes; B additionally pays ~1.4 ms for the strided per-channel
slices.  Productionized opt-in as framing="tsplit" (ledger evidence).

The k=1 push still pays ~1.2 ms at 10,240 streams in framing glue:
buf concat (pad_maximum fusions), the [S, m, n1] -> [S, n1, m] operand
transposes (copy.6/7), and the chunk channel split.  Three prior attempts
each failed for a specific reason:
  * transposed-carry state (round 3): LANE-axis concat at unaligned
    offsets — poison.  E13 has NO concat anywhere.
  * split operands in untransposed layout (round 4, exp_stft_allk
    --split): 4D combined-channel [ts, 2, rows, n1] operand layout cost
    more than the concat it deleted.  E13 feeds PER-CHANNEL 3D operands.
  * in-kernel VMEM concat (round 2): costs what the XLA copy costs.
    E13 replaces the concat with TWO ACCUMULATING DOTS: in the tw
    orientation stage 1 contracts the m axis (buffer columns), and the
    carry/chunk boundary at column C/n1 splits the contraction exactly —
    b = dot(carry_t, f2cat[:c_cols]) + dot(chunk_t, f2cat[c_cols:]).

State format: carry stored transposed per channel [S, n1, C/n1] (lane
dim = buffer columns).  Next-push carry comes OUT of the kernel as two
static lane-offset writes (columns 25.. of carry ++ all chunk columns) —
probing whether Mosaic accepts unaligned static lane-dim ref stores is
part of the experiment.  The chunk arrives planar and pays ONE small
transpose ([S, 800] -> [S, 32, 25] per channel) — 2.56x less data than
the full-buffer transpose it replaces.

Measures: A = production k=1 path (concat + transpose + tw kernel) vs
B = E13, at 4096/10240 streams; parity must be bitwise (same dot order
per column range? NO — the split re-associates stage-1 partial sums at
the boundary: expect <= 1 ulp, like the round-4 split kernel).
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
C_COLS, T_COLS = C // N1, H // N1           # 39, 25
HIGH = jax.lax.Precision.HIGHEST

rng = np.random.default_rng(0)
CARRY = jnp.asarray(rng.standard_normal((S, 2, C)).astype(np.float32) * 0.1)
CHUNK = jnp.asarray(rng.standard_normal((S, 2, H)).astype(np.float32) * 0.1)


def tsplit_kernel(cl_ref, cr_ref, kl_ref, kr_ref, hann_ref, f2cat_ref,
                  twcat_ref, f1blk_ref, out_l_ref, out_r_ref,
                  ncl_ref, ncr_ref, *, plan, precision):
    """Per-channel: carry_t [ts, n1, C_COLS] + chunk_t [ts, n1, T_COLS];
    stage 1 = two accumulating last-axis dots; flip stage 2; 2D out;
    next carry written as two static lane-offset stores."""
    n1, n2 = plan.n1, plan.n2
    k1h = n1 // 2
    kw = dict(preferred_element_type=jnp.float32, precision=precision)
    twr_t = twcat_ref[:, :n2]
    twi_t = twcat_ref[:, n2:]
    hann = hann_ref[:]                       # [n1, m]
    f2 = f2cat_ref[:]                        # [m, 2n2]
    keep = C_COLS - T_COLS                   # carry columns surviving

    for cv_ref, kv_ref, out_ref, nc_ref in (
        (cl_ref, kl_ref, out_l_ref, ncl_ref),
        (cr_ref, kr_ref, out_r_ref, ncr_ref),
    ):
        cv = cv_ref[:]                       # [ts, n1, C_COLS]
        kv = kv_ref[:]                       # [ts, n1, T_COLS]
        nc_ref[:, :, :keep] = cv[:, :, T_COLS:]
        nc_ref[:, :, keep:] = kv
        xc = cv * hann[:, :C_COLS]
        xk = kv * hann[:, C_COLS:]
        b = (
            jax.lax.dot_general(xc, f2[:C_COLS], (((2,), (0,)), ((), ())), **kw)
            + jax.lax.dot_general(xk, f2[C_COLS:], (((2,), (0,)), ((), ())), **kw)
        )                                    # [ts, n1, 2n2]
        br, bi = b[..., :n2], b[..., n2:]
        crr = br * twr_t - bi * twi_t
        cii = br * twi_t + bi * twr_t
        c_cat = jnp.concatenate([crr, cii], axis=1)
        d = jax.lax.dot_general(
            f1blk_ref[:], c_cat, (((0,), (1,)), ((), ())), **kw)
        dr, di = d[:k1h], d[k1h:]
        for k1 in range(k1h):
            p = dr[k1] * dr[k1] + di[k1] * di[k1]
            out_ref[:, k1 * n2 : (k1 + 1) * n2] = jnp.sqrt(p)


@functools.partial(jax.jit, static_argnames=("ts",))
def stft_tsplit(carry_t, chunk_pl, ts=64):
    """carry_t: [S, 2, n1, C_COLS] (the E13 state format);
    chunk_pl: [S, 2, H] planar (wire format).  Returns (magL, magR,
    new_carry_t)."""
    half = (N1 // 2) * N2
    hann2 = np.ascontiguousarray(sk._scaled_hann(W, M, N1).T)   # [n1, m]
    f2cat, twr, twi, f1blk = _block_plan_constants(PLAN)
    twcat = np.concatenate([twr, twi], axis=1).astype(np.float32)
    # the ONLY per-push transpose: the small chunk, per channel
    chunk_t = jnp.swapaxes(chunk_pl.reshape(S, 2, T_COLS, N1), 2, 3)

    def const_spec(arr):
        return pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                            memory_space=pltpu.VMEM)

    ch_spec = lambda cols: pl.BlockSpec((ts, 1, N1, cols),
                                        lambda i: (i, 0, 0, 0),
                                        memory_space=pltpu.VMEM)
    kernel = functools.partial(tsplit_kernel, plan=PLAN, precision=HIGH)

    def chan(x, c):
        return x[:, c]                       # [S, n1, cols] strided view

    out_l, out_r, ncl, ncr = pl.pallas_call(
        kernel,
        grid=(S // ts,),
        in_specs=[
            pl.BlockSpec((ts, N1, C_COLS), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ts, N1, C_COLS), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ts, N1, T_COLS), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ts, N1, T_COLS), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            const_spec(hann2),
            const_spec(f2cat),
            const_spec(twcat),
            const_spec(f1blk),
        ],
        out_specs=[
            pl.BlockSpec((ts, half), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ts, half), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ts, N1, C_COLS), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ts, N1, C_COLS), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((S, half), jnp.float32),
            jax.ShapeDtypeStruct((S, half), jnp.float32),
            jax.ShapeDtypeStruct((S, N1, C_COLS), jnp.float32),
            jax.ShapeDtypeStruct((S, N1, C_COLS), jnp.float32),
        ],
        interpret=jax.default_backend() not in ("tpu", "axon"),
    )(chan(carry_t, 0), chan(carry_t, 1), chan(chunk_t, 0), chan(chunk_t, 1),
      jnp.asarray(hann2), jnp.asarray(f2cat), jnp.asarray(twcat),
      jnp.asarray(f1blk))
    return out_l, out_r, jnp.stack([ncl, ncr], axis=1)


def tsplit_kernel_c(c_ref, k_ref, hann_ref, f2cat_ref, twcat_ref,
                    f1blk_ref, out_l_ref, out_r_ref, nc_ref,
                    *, plan, precision):
    """Variant C: combined-channel [ts, 2, n1, cols] operands, channel split
    on the LOADED VMEM VALUE (the _kernel2_t trick) — no XLA-side channel
    slices, grid over streams only, next carry as one 4D output."""
    n1, n2 = plan.n1, plan.n2
    k1h = n1 // 2
    kw = dict(preferred_element_type=jnp.float32, precision=precision)
    twr_t = twcat_ref[:, :n2]
    twi_t = twcat_ref[:, n2:]
    hann = hann_ref[:]                       # [n1, m]
    f2 = f2cat_ref[:]                        # [m, 2n2]
    keep = C_COLS - T_COLS
    cboth = c_ref[:]                         # [ts, 2, n1, C_COLS]
    kboth = k_ref[:]                         # [ts, 2, n1, T_COLS]
    nc_ref[:, :, :, :keep] = cboth[:, :, :, T_COLS:]
    nc_ref[:, :, :, keep:] = kboth

    for ch, out_ref in ((0, out_l_ref), (1, out_r_ref)):
        cv = cboth[:, ch]
        kv = kboth[:, ch]
        xc = cv * hann[:, :C_COLS]
        xk = kv * hann[:, C_COLS:]
        b = (
            jax.lax.dot_general(xc, f2[:C_COLS], (((2,), (0,)), ((), ())), **kw)
            + jax.lax.dot_general(xk, f2[C_COLS:], (((2,), (0,)), ((), ())), **kw)
        )
        br, bi = b[..., :n2], b[..., n2:]
        crr = br * twr_t - bi * twi_t
        cii = br * twi_t + bi * twr_t
        c_cat = jnp.concatenate([crr, cii], axis=1)
        d = jax.lax.dot_general(
            f1blk_ref[:], c_cat, (((0,), (1,)), ((), ())), **kw)
        dr, di = d[:k1h], d[k1h:]
        for k1 in range(k1h):
            p = dr[k1] * dr[k1] + di[k1] * di[k1]
            out_ref[:, k1 * n2 : (k1 + 1) * n2] = jnp.sqrt(p)


@functools.partial(jax.jit, static_argnames=("ts",))
def stft_tsplit_c(carry_t, chunk_pl, ts=32):
    """Variant C wrapper: carry_t [S, 2, n1, C_COLS] (the EXISTING
    carry_transposed state format), chunk planar [S, 2, H].  Returns
    (magL, magR, new_carry_t [S, 2, n1, C_COLS])."""
    half = (N1 // 2) * N2
    hann2 = np.ascontiguousarray(sk._scaled_hann(W, M, N1).T)
    f2cat, twr, twi, f1blk = _block_plan_constants(PLAN)
    twcat = np.concatenate([twr, twi], axis=1).astype(np.float32)
    chunk_t = jnp.swapaxes(chunk_pl.reshape(S, 2, T_COLS, N1), 2, 3)

    def const_spec(arr):
        return pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(tsplit_kernel_c, plan=PLAN, precision=HIGH)
    out_l, out_r, nc = pl.pallas_call(
        kernel,
        grid=(S // ts,),
        in_specs=[
            pl.BlockSpec((ts, 2, N1, C_COLS), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ts, 2, N1, T_COLS), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            const_spec(hann2),
            const_spec(f2cat),
            const_spec(twcat),
            const_spec(f1blk),
        ],
        out_specs=[
            pl.BlockSpec((ts, half), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ts, half), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ts, 2, N1, C_COLS), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((S, half), jnp.float32),
            jax.ShapeDtypeStruct((S, half), jnp.float32),
            jax.ShapeDtypeStruct((S, 2, N1, C_COLS), jnp.float32),
        ],
        interpret=jax.default_backend() not in ("tpu", "axon"),
    )(carry_t, chunk_t, jnp.asarray(hann2), jnp.asarray(f2cat),
      jnp.asarray(twcat), jnp.asarray(f1blk))
    return out_l, out_r, nc


@jax.jit
def stft_prod(carry, chunk_pl):
    buf_l = jnp.concatenate([carry[:, 0], chunk_pl[:, 0]], axis=1)
    buf_r = jnp.concatenate([carry[:, 1], chunk_pl[:, 1]], axis=1)
    new_carry = jnp.concatenate([carry[:, :, H:], chunk_pl], axis=2)
    ml, mr = sk.stft_mag_fused2(buf_l, buf_r, CFG, slice_bins=False, plan=PLAN)
    return ml, mr, new_carry


def main():
    carry_t = jnp.swapaxes(CARRY.reshape(S, 2, C_COLS, N1), 2, 3).copy()
    rl, rr, rc = stft_prod(CARRY, CHUNK)
    rl = np.asarray(rl)
    tl, tr, tc = stft_tsplit(carry_t, CHUNK, ts=32)
    tl = np.asarray(tl)
    np.testing.assert_allclose(tl, rl, rtol=1e-4, atol=1e-6)
    # carry round-trip: transposed new carry must equal planar new carry
    tc_pl = np.asarray(jnp.swapaxes(tc, 2, 3).reshape(S, 2, C))
    np.testing.assert_array_equal(tc_pl, np.asarray(rc))
    print(f"S={S}: B parity OK (maxabs {np.abs(tl - rl).max():.2e})", flush=True)
    cl, cr, cc = stft_tsplit_c(carry_t, CHUNK, ts=32)
    np.testing.assert_allclose(np.asarray(cl), rl, rtol=1e-4, atol=1e-6)
    cc_pl = np.asarray(jnp.swapaxes(cc, 2, 3).reshape(S, 2, C))
    np.testing.assert_array_equal(cc_pl, np.asarray(rc))
    print(f"S={S}: C parity OK", flush=True)

    import time as _t
    for name, fn, state0 in (
        ("A prod", stft_prod, CARRY),
        ("B tsplit ts=32", functools.partial(stft_tsplit, ts=32), carry_t),
        ("B tsplit ts=16", functools.partial(stft_tsplit, ts=16), carry_t),
        ("C comb ts=32", functools.partial(stft_tsplit_c, ts=32), carry_t),
        ("C comb ts=16", functools.partial(stft_tsplit_c, ts=16), carry_t),
    ):
        @jax.jit
        def runb(c0, f=fn):
            def body(c, _):
                ml, mr, nc = f(c, CHUNK)
                return nc, ml[0, 0]
            return jax.lax.scan(body, c0, None, length=100)
        c, outs = runb(state0); np.asarray(outs)
        best = np.inf
        for _ in range(3):
            t0 = _t.perf_counter(); c, outs = runb(state0)
            np.asarray(outs); best = min(best, _t.perf_counter() - t0)
        print(f"{name}: {best / 100 * 1e3:.3f} ms/push (STFT+framing+carry)",
              flush=True)


if __name__ == "__main__":
    main()
