"""Round-4 framing-glue kill (VERDICT r4 item 1): all-k-windows STFT kernel.

At the bench geometry, hop_rows = hop/n1 = 25 is not sublane-aligned, so
k=8 pushes cannot use element-offset buf framing and instead MATERIALIZE
k overlapping [S, W] window planes per channel — ~1.3 GB of redundant HBM
write+read traffic at 10,240 streams (the 1.45 ms framing + part of the
1.00 ms glue in BASELINE.md's decomposition).

Hypothesis (E1): a kernel whose grid step loads one stream block of the
WHOLE carry+chunk buffer ([ts, R, n1] view, R = tlen/n1) and extracts the
k hop-shifted windows as in-kernel STATIC value slices (sublane offsets
25*r — legal on values, unlike the element-offset DMA form) never
materializes window planes at all: unique bytes are read once instead of
the 2.56x overlap, and the 1.3 GB write never exists.

Measures A (production: materialize k planes + stft_mag_fused2) vs
B (allk kernel) on identical buf planes; parity must be exact.
"""
import sys, pathlib, time, functools
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from spectrogram_tpu.config import BENCH_CONFIG as CFG
from spectrogram_tpu.ops.mxu_fft import make_plan, _block_plan_constants
from spectrogram_tpu.ops.pallas import stft_kernel as sk

K = 8
PLAN = make_plan(CFG)
S = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
W, H = CFG.window_size, CFG.hop_size
TLEN = W + (K - 1) * H
HIGH = jax.lax.Precision.HIGHEST

rng = np.random.default_rng(0)
BUF_L = jnp.asarray(rng.standard_normal((S, TLEN)).astype(np.float32) * 0.1)
BUF_R = jnp.asarray(rng.standard_normal((S, TLEN)).astype(np.float32) * 0.1)


def allk_kernel(bl_ref, br_ref, hann_ref, f2cat_ref, twcat_ref, f1blk_ref,
                out_l_ref, out_r_ref, *, plan, k, hop_rows):
    n1, n2, m = plan.n1, plan.n2, plan.m
    kw = dict(preferred_element_type=jnp.float32, precision=HIGH)
    twr_t = twcat_ref[:, :n2]
    twi_t = twcat_ref[:, n2:]
    k1h = n1 // 2

    def channel(ref, out_ref):
        v = ref[:]                                  # [ts, R, n1]
        for r in range(k):
            x = v[:, r * hop_rows : r * hop_rows + m, :] * hann_ref[:]
            b = jax.lax.dot_general(
                x, f2cat_ref[:], (((1,), (0,)), ((), ())), **kw
            )                                       # [ts, n1, 2n2]
            br_, bi_ = b[..., :n2], b[..., n2:]
            cr = br_ * twr_t - bi_ * twi_t
            ci = br_ * twi_t + bi_ * twr_t
            c_cat = jnp.concatenate([cr, ci], axis=1)     # [ts, 2n1, n2]
            d = jax.lax.dot_general(
                f1blk_ref[:], c_cat, (((0,), (1,)), ((), ())), **kw
            )                                       # [2k1h, ts, n2]
            dr, di = d[:k1h], d[k1h:]
            p = dr * dr + di * di
            out_ref[r] = jnp.transpose(jnp.sqrt(p), (1, 0, 2))

    channel(bl_ref, out_l_ref)
    channel(br_ref, out_r_ref)


@functools.partial(jax.jit, static_argnames=("ts",))
def stft_allk(buf_l, buf_r, ts=16):
    plan = PLAN
    n1, n2, m = plan.n1, plan.n2, plan.m
    k1h = n1 // 2
    r_rows = TLEN // n1
    hop_rows = H // n1
    hann2 = sk._scaled_hann(W, m, n1)               # [m, n1]
    f2cat, twr, twi, f1blk = _block_plan_constants(plan)
    twcat = np.concatenate([twr, twi], axis=1).astype(np.float32)
    bl3 = buf_l.reshape(S, r_rows, n1)
    br3 = buf_r.reshape(S, r_rows, n1)

    def const_spec(arr):
        return pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(allk_kernel, plan=plan, k=K, hop_rows=hop_rows)
    out_l, out_r = pl.pallas_call(
        kernel,
        grid=(S // ts,),
        in_specs=[
            pl.BlockSpec((ts, r_rows, n1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ts, r_rows, n1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            const_spec(hann2),
            const_spec(f2cat),
            const_spec(twcat),
            const_spec(f1blk),
        ],
        out_specs=[
            pl.BlockSpec((K, ts, k1h, n2), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, ts, k1h, n2), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((K, S, k1h, n2), jnp.float32),
            jax.ShapeDtypeStruct((K, S, k1h, n2), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * K * S * 2 * (plan.complex_macs * 2),
            bytes_accessed=2 * S * (TLEN + K * (k1h * n2)) * 4,
            transcendentals=2 * K * S * k1h * n2,
        ),
    )(bl3, br3, jnp.asarray(hann2), jnp.asarray(f2cat), jnp.asarray(twcat),
      jnp.asarray(f1blk))
    half = k1h * n2
    return out_l.reshape(K * S, half), out_r.reshape(K * S, half)


@jax.jit
def stft_prod(buf_l, buf_r):
    lefts = [buf_l[:, r * H : r * H + W] for r in range(K)]
    rights = [buf_r[:, r * H : r * H + W] for r in range(K)]
    return sk.stft_mag_fused2(
        jnp.concatenate(lefts, axis=0), jnp.concatenate(rights, axis=0),
        CFG, slice_bins=False, plan=PLAN,
    )


def scan_bench(fn, iters=60):
    @jax.jit
    def runb(x):
        def body(c, _):
            ol, _ = fn(c, BUF_R)
            return c + ol[:1, :1] * 1e-20, ol[0, 0]
        return jax.lax.scan(body, x, None, length=iters)
    c, outs = runb(BUF_L); np.asarray(outs)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter(); c, outs = runb(BUF_L)
        np.asarray(c[0, 0]); np.asarray(outs)
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e3


def main():
    print(f"S={S} plan={PLAN} tlen={TLEN} hop_rows={H // PLAN.n1}", flush=True)
    ref_l, _ = stft_prod(BUF_L, BUF_R)
    ref_l = np.asarray(ref_l)
    t_a = scan_bench(lambda l, r: stft_prod(l, r))
    print(f"A prod (materialized planes + fused2): {t_a:.3f} ms", flush=True)
    for ts in (8, 16, 32):
        try:
            al, _ = stft_allk(BUF_L, BUF_R, ts=ts)
            al = np.asarray(al)
        except Exception as e:
            print(f"B allk ts={ts}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            continue
        d = np.abs(al - ref_l).max()
        t_b = scan_bench(lambda l, r, t=ts: stft_allk(l, r, ts=t))
        print(f"B allk ts={ts}: {t_b:.3f} ms  maxabs={d:.2e}", flush=True)




# ---- variants C/D: split carry+chunk operands (round-4 item-1 design) ----
#
# The buf planes above are CONCAT(carry, chunk) — an XLA copy of
# (C+T)*2ch bytes per push that exists only to give the kernel one
# contiguous operand.  When n1 | hop (bench: 800 % 32 == 0), every
# window's carry/chunk boundary falls between whole n1-rows, so stage 1
# evaluates as up-to-two ACCUMULATING dots over the separate operands:
# no concat in HBM, no concat in VMEM.  D additionally emits next-push
# carry as a kernel output (two static VMEM writes), deleting the XLA
# new-carry pass too.

CARRY_ROWS = (W - H) // PLAN.n1    # 39
CHUNK_ROWS = (TLEN - (W - H)) // PLAN.n1


def allk_split_kernel(carry_ref, chunk_ref, hann_ref, f2cat_ref, twcat_ref,
                      f1blk_ref, out_l_ref, out_r_ref, *, plan, k, hop_rows,
                      c_rows, out_carry_ref=None):
    n1, n2, m = plan.n1, plan.n2, plan.m
    kw = dict(preferred_element_type=jnp.float32, precision=HIGH)
    twr_t = twcat_ref[:, :n2]
    twi_t = twcat_ref[:, n2:]
    k1h = n1 // 2
    hann = hann_ref[:]
    f2 = f2cat_ref[:]

    for ch, out_ref in ((0, out_l_ref), (1, out_r_ref)):
        cv = carry_ref[:, ch]          # [ts, c_rows, n1]
        kv = chunk_ref[:, ch]          # [ts, t_rows, n1]
        if out_carry_ref is not None:
            t_rows = kv.shape[1]
            keep = c_rows - t_rows     # carry rows surviving to next push
            if keep > 0:
                out_carry_ref[:, ch, :keep] = cv[:, t_rows:]
                out_carry_ref[:, ch, keep:] = kv
            else:
                out_carry_ref[:, ch] = kv[:, t_rows - c_rows:]
        for r in range(k):
            s0 = r * hop_rows
            nc = max(0, min(c_rows - s0, m))   # carry rows in this window
            parts = []
            if nc > 0:
                parts.append((cv[:, s0 : s0 + nc], 0))
            if nc < m:
                k0 = max(0, s0 - c_rows)
                parts.append((kv[:, k0 : k0 + (m - nc)], nc))
            b = None
            for seg, h0 in parts:
                x = seg * hann[h0 : h0 + seg.shape[1]]
                d_ = jax.lax.dot_general(
                    x, f2[h0 : h0 + seg.shape[1]], (((1,), (0,)), ((), ())),
                    **kw)
                b = d_ if b is None else b + d_
            br_, bi_ = b[..., :n2], b[..., n2:]
            cr = br_ * twr_t - bi_ * twi_t
            ci = br_ * twi_t + bi_ * twr_t
            c_cat = jnp.concatenate([cr, ci], axis=1)
            d = jax.lax.dot_general(
                f1blk_ref[:], c_cat, (((0,), (1,)), ((), ())), **kw)
            dr, di = d[:k1h], d[k1h:]
            p = dr * dr + di * di
            out_ref[r] = jnp.transpose(jnp.sqrt(p), (1, 0, 2))


@functools.partial(jax.jit, static_argnames=("ts", "fuse_carry"))
def stft_allk_split(carry, chunk, ts=8, fuse_carry=False):
    """carry [S, 2, C] f32 (state), chunk [S, 2, T] f32 (planar H2D)."""
    plan = PLAN
    n1, n2, m = plan.n1, plan.n2, plan.m
    k1h = n1 // 2
    hop_rows = H // n1
    c_rows, t_rows = CARRY_ROWS, CHUNK_ROWS
    hann2 = sk._scaled_hann(W, m, n1)
    f2cat, twr, twi, f1blk = _block_plan_constants(plan)
    twcat = np.concatenate([twr, twi], axis=1).astype(np.float32)
    carry4 = carry.reshape(S, 2, c_rows, n1)
    chunk4 = chunk.reshape(S, 2, t_rows, n1)

    def const_spec(arr):
        return pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(
        allk_split_kernel, plan=plan, k=K, hop_rows=hop_rows, c_rows=c_rows)
    if fuse_carry:
        body = lambda *refs: kernel(*refs[:-1], out_carry_ref=refs[-1])
    else:
        body = kernel
    out_specs = [
        pl.BlockSpec((K, ts, k1h, n2), lambda i: (0, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((K, ts, k1h, n2), lambda i: (0, i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((K, S, k1h, n2), jnp.float32),
        jax.ShapeDtypeStruct((K, S, k1h, n2), jnp.float32),
    ]
    if fuse_carry:
        out_specs.append(pl.BlockSpec((ts, 2, c_rows, n1),
                                      lambda i: (i, 0, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((S, 2, c_rows, n1), jnp.float32))
    outs = pl.pallas_call(
        body,
        grid=(S // ts,),
        in_specs=[
            pl.BlockSpec((ts, 2, c_rows, n1), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ts, 2, t_rows, n1), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            const_spec(hann2),
            const_spec(f2cat),
            const_spec(twcat),
            const_spec(f1blk),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=2 * K * S * 2 * (plan.complex_macs * 2),
            bytes_accessed=2 * S * (TLEN + K * (k1h * n2)) * 4,
            transcendentals=2 * K * S * k1h * n2,
        ),
    )(carry4, chunk4, jnp.asarray(hann2), jnp.asarray(f2cat),
      jnp.asarray(twcat), jnp.asarray(f1blk))
    half = k1h * n2
    if fuse_carry:
        ol, orr, nc = outs
        return ol.reshape(K * S, half), orr.reshape(K * S, half), nc
    ol, orr = outs
    return ol.reshape(K * S, half), orr.reshape(K * S, half)


def main_split():
    c_len = W - H
    carry = jnp.stack([BUF_L[:, :c_len], BUF_R[:, :c_len]], axis=1)  # [S,2,C]
    chunk = jnp.stack([BUF_L[:, c_len:], BUF_R[:, c_len:]], axis=1)
    ref_l, _ = stft_prod(BUF_L, BUF_R)
    ref_l = np.asarray(ref_l)
    for ts, fuse in ((8, False), (16, False), (8, True), (16, True)):
        label = f"C split ts={ts} fuse_carry={int(fuse)}"
        try:
            res = stft_allk_split(carry, chunk, ts=ts, fuse_carry=fuse)
            al = np.asarray(res[0])
        except Exception as e:
            print(f"{label}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            continue
        d = np.abs(al - ref_l).max()
        if fuse:
            nc = np.asarray(res[2]).reshape(S, 2, c_len)
            exp = np.stack([BUF_L[:, -c_len:], BUF_R[:, -c_len:]], axis=1)
            assert np.array_equal(nc, np.asarray(exp)), "carry out mismatch"

        def fn(l, r, t=ts, f=fuse):
            res = stft_allk_split(carry, jnp.stack(
                [l[:, c_len:], r[:, c_len:]], axis=1), ts=t, fuse_carry=f)
            return res[0], res[1]
        t = scan_bench(fn)
        print(f"{label}: {t:.3f} ms  maxabs={d:.2e}", flush=True)


if __name__ == "__main__":
    if "--split" in sys.argv:
        main_split()
    else:
        main()
