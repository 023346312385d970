"""Round-5 STFT kernel experiment: packed-complex (stereo-packed) four-step.

THE remaining perf lever (BASELINE.md SOL analysis): the split-real v4
kernel runs both MXU stages at K=64 contraction width on the 128-wide MXU
-> 50% structural ceiling, measured 38%.  Pass-count model per TS-row
(bench plan n1=32, n2=128, m=64; one MXU pass = 1 cycle per M-row per
128-lane output tile):

  split-real v4:   stage1 2ch x 64 + stage2 2ch x 32            = 192
  packed complex:  stage1 64 (K=2m=128 DENSE) + stage2 64 + rev = 160
  packed + free lane-reversal (if Mosaic lowers one)            = 128

128 is the structural floor of ANY two-stage factorization (each stage
must write 2N intermediate reals per row through the 128-lane MXU output
port).  The packed trick is the reference's own stereo packing
(fft.rs:57,81-92): z = l + i*r, one complex FFT, conjugate-symmetry
unpack L_k = |Z_k + conj(Z_{N-k})|/2, R_k = |Z_k - conj(Z_{N-k})|/2.
Round-1 rejected it as an XLA-level path (the unpack reverse cost HBM
passes, mxu_fft.stft_rows_split_planar docstring); in-kernel the reverse
is one batched [*,128]x[128,128] permutation matmul over VMEM values
(32/row model cost) and the economics invert.

Index map (mxu_fft._plan_constants): flat bin k = n2*k1 + k2, so
-k mod N = (n1-1-k1, n2-k2) for k2 >= 1 and ((n1-k1)%n1, 0) for k2 = 0:
row j1 = n1-1-k1 via the reversal matmul (P column 0 zeroed), row
j1+1 mod n1 patched into lane 0 with a mask.

Variants:
  v4     — production split-real body (_kernel2_2d), the baseline
  pk     — packed, zcat [N, n1, 2m] prebuilt outside (lane concat in XLA)
  pk_ik  — packed, lane concat IN-KERNEL from the v4 operands (integration
           form: same entry-point operands as production)
  pk_rev — packed with jax.lax.rev lane reversal instead of the P matmul
           (probe: Mosaic may refuse; if it compiles AND wins, the 128
           floor is reachable)

MEASURED (v5e, 2026-08-19, bench geometry W=2048/N=4096 plan 32x128x64,
150-iter scan best-of-3, vs-v4 numerics maxabs 2.8e-9 / maxrel 3.7e-4 on
near-zero bins — the unpack's expected cancellation, 6 orders below the
1/255 u8 quantum):

  ROWS=4096:   v4 ts=64 1.265 ms | pk ts=64 1.077 (-14.9%) |
               pk ts=32 1.104 | pk_ik ts=64 1.062 (-16.0%)
  ROWS=16384:  v4 ts=64 5.089 ms | pk_ik ts=64 4.459 (-12.4%) |
               pk_ik ts=32 4.536 | pk_ik ts=128 compile FAILED (VMEM:
               remote compile helper subprocess exit 1)
  pk_rev: FAILED — Mosaic has NO lowering for lax.rev ("Unimplemented
  primitive in Pallas TPU lowering: rev"), so the 128-pass floor is
  unreachable until Mosaic grows a vector reversal; the P-matmul (160
  passes) is the right form, and it also covers lane_pad plans' mod-n2
  wrap.  pk_ik within noise of pk: the in-kernel lane concat is free ->
  production integration keeps the v4 operand layout (stft_kernel.py
  `packed=`).  -16.0% at 4k matches the 160/192 = -16.7% model almost
  exactly.
"""
import sys, pathlib, time, functools, os
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from spectrogram_tpu.config import BENCH_CONFIG as CFG
from spectrogram_tpu.ops.mxu_fft import make_plan, _block_plan_constants
from spectrogram_tpu.ops.pallas import stft_kernel as sk

PLAN = make_plan(CFG)
ROWS = int(os.environ.get("ROWS", "4096"))
INTERP = bool(int(os.environ.get("INTERP", "0")))  # CPU shape-check mode
W = CFG.window_size
HIGH = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------- constants

def packed_constants(plan):
    """(hann_half, f2p, twcat, f1full, prev) for the packed kernel.

    hann_half: [n1, 2m] — hann * (1/w) tiled over both channel halves
               (the unpack's 1/2 folded into the window: exact exponent
               shift, deletes the per-bin scale pass).
    f2p:  [2m, 2n2] = [[f2r | f2i], [-f2i | f2r]] — complex stage-1 DFT on
          z = l + i*r as ONE dense K=2m matmul.
    twcat: [n1, 2n2] — same twiddle as production (applied once, not per
          channel).
    f1full: [2n1, 2n1] = [[f1r, f1i], [-f1i, f1r]] with the FULL n1-point
          stage-2 DFT (packed unpack needs all k1 rows, not the half
          spectrum).
    prev: [n2, n2] lane-reversal permutation, prev[a, k2] = 1 iff k2 >= 1
          and a == n2 - k2 (column 0 zero — lane 0 takes the j1+1 row via
          the e0 mask patch).
    """
    n, n1, n2, m = plan.n, plan.n1, plan.n2, plan.m
    i2 = np.arange(m)[:, None] * np.arange(n2)[None, :]
    f2 = np.exp(-2j * np.pi * i2 / n2)
    f2r = f2.real.astype(np.float32)
    f2i = f2.imag.astype(np.float32)
    f2p = np.block([[f2r, f2i], [-f2i, f2r]]).astype(np.float32)   # [2m, 2n2]
    it = np.arange(n1)[:, None] * np.arange(n2)[None, :]
    tw = np.exp(-2j * np.pi * it / n)
    twcat = np.concatenate(
        [tw.real.astype(np.float32), tw.imag.astype(np.float32)], axis=1
    )
    i1 = np.arange(n1)[:, None] * np.arange(n1)[None, :]
    f1 = np.exp(-2j * np.pi * i1 / n1)
    f1full = np.block(
        [[f1.real, f1.imag], [-f1.imag, f1.real]]
    ).astype(np.float32)                                           # [2n1, 2n1]
    prev = np.zeros((n2, n2), np.float32)
    for k2 in range(1, n2):
        prev[n2 - k2, k2] = 1.0
    hann = sk._scaled_hann(W, m, n1) * 0.5                         # 1/w scale
    hann_half = np.concatenate([hann.T, hann.T], axis=1)           # [n1, 2m]
    return hann_half.astype(np.float32), f2p, twcat, f1full, prev


def packed_mag_value(zcat, hann_ref, f2p_ref, twcat_ref, f1full_ref,
                     prev_ref, *, plan, use_rev=False):
    """zcat [ts, n1, 2m] (lanes = left | right windows) -> (magL, magR)
    lists of k1h [ts, n2] rows."""
    n1, n2 = plan.n1, plan.n2
    k1h = n1 // 2
    kw = dict(preferred_element_type=jnp.float32, precision=HIGH)
    x = zcat * hann_ref[:]
    b = jax.lax.dot_general(x, f2p_ref[:], (((2,), (0,)), ((), ())), **kw)
    br, bi = b[..., :n2], b[..., n2:]                  # [ts, n1, n2] complex b
    twr, twi = twcat_ref[:, :n2], twcat_ref[:, n2:]
    cr = br * twr - bi * twi
    ci = br * twi + bi * twr
    c_cat = jnp.concatenate([cr, ci], axis=1)          # [ts, 2n1, n2]
    d = jax.lax.dot_general(
        f1full_ref[:], c_cat, (((0,), (1,)), ((), ())), **kw
    )                                                  # [2n1, ts, n2]
    # reversed-lane rows for the conjugate unpack: rows k1h..n1-1 of both
    # components, lanes k2 -> n2-k2 (k2>=1)
    d_hi = jnp.concatenate([d[k1h:n1], d[n1 + k1h :]], axis=0)  # [n1, ts, n2]
    if use_rev:
        zm_all = jnp.flip(d_hi, axis=2)
        zm_all = pltpu.roll(zm_all, 1, 2)
        e0 = (jax.lax.broadcasted_iota(jnp.int32, (1, n2), 1) == 0)
        zm_all = jnp.where(e0[None], 0.0, zm_all)
    else:
        zm_all = jax.lax.dot_general(
            d_hi, prev_ref[:], (((2,), (0,)), ((), ())), **kw
        )                                              # [n1, ts, n2]
    e0 = (jax.lax.broadcasted_iota(jnp.int32, (1, n2), 1) == 0).astype(
        jnp.float32
    )
    outs_l, outs_r = [], []
    for k1 in range(k1h):
        ar, ai = d[k1], d[n1 + k1]                     # Z[k1] rows [ts, n2]
        j2 = (n1 - k1) % n1                            # lane-0 source row
        zmr = zm_all[k1h - 1 - k1] + d[j2] * e0
        zmi = zm_all[n1 - 1 - k1] + d[n1 + j2] * e0
        outs_l.append(jnp.sqrt((ar + zmr) ** 2 + (ai - zmi) ** 2))
        outs_r.append(jnp.sqrt((ar - zmr) ** 2 + (ai + zmi) ** 2))
    return outs_l, outs_r


def pk_kernel(zcat_ref, hann_ref, f2p_ref, twcat_ref, f1full_ref, prev_ref,
              out_l_ref, out_r_ref, *, plan, use_rev=False, in_kernel_cat=False,
              right_ref=None):
    n2 = plan.n2
    if in_kernel_cat:
        zcat = jnp.concatenate([zcat_ref[:], right_ref[:]], axis=2)
    else:
        zcat = zcat_ref[:]
    outs_l, outs_r = packed_mag_value(
        zcat, hann_ref, f2p_ref, twcat_ref, f1full_ref, prev_ref,
        plan=plan, use_rev=use_rev,
    )
    for k1, (ol, orr) in enumerate(zip(outs_l, outs_r)):
        out_l_ref[:, k1 * n2 : (k1 + 1) * n2] = ol
        out_r_ref[:, k1 * n2 : (k1 + 1) * n2] = orr


def pk_ik_kernel(left_ref, right_ref, hann_ref, f2p_ref, twcat_ref,
                 f1full_ref, prev_ref, out_l_ref, out_r_ref, *, plan,
                 use_rev=False):
    pk_kernel(left_ref, hann_ref, f2p_ref, twcat_ref, f1full_ref, prev_ref,
              out_l_ref, out_r_ref, plan=plan, use_rev=use_rev,
              in_kernel_cat=True, right_ref=right_ref)


# ------------------------------------------------------------------- builds

def build_v4(ts):
    plan = PLAN
    n1, n2, m = plan.n1, plan.n2, plan.m
    hann2 = np.ascontiguousarray(sk._scaled_hann(W, m, n1).T)
    f2cat, twr, twi, f1blk = _block_plan_constants(plan)
    twcat = np.concatenate([twr, twi], axis=1).astype(np.float32)
    consts = [hann2, f2cat, twcat, f1blk]
    kernel = functools.partial(sk._kernel2_2d, plan=plan, precision=HIGH,
                               transposed=True)
    half = (n1 // 2) * n2

    def const_spec(arr):
        return pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                            memory_space=pltpu.VMEM)

    def run(l3t, r3t):
        return pl.pallas_call(
            kernel, grid=(ROWS // ts,),
            in_specs=[pl.BlockSpec((ts, n1, m), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)] * 2
                     + [const_spec(c) for c in consts],
            out_specs=[pl.BlockSpec((ts, half), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)] * 2,
            out_shape=[jax.ShapeDtypeStruct((ROWS, half), jnp.float32)] * 2,
            interpret=INTERP,
        )(l3t, r3t, *[jnp.asarray(c) for c in consts])

    return run


def build_pk(ts, variant="pk"):
    plan = PLAN
    n1, n2, m = plan.n1, plan.n2, plan.m
    consts = list(packed_constants(plan))
    half = (n1 // 2) * n2
    use_rev = variant == "pk_rev"
    in_kernel = variant == "pk_ik"

    def const_spec(arr):
        return pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                            memory_space=pltpu.VMEM)

    if in_kernel:
        kernel = functools.partial(pk_ik_kernel, plan=plan, use_rev=use_rev)
        in_specs = [pl.BlockSpec((ts, n1, m), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)] * 2

        def run(l3t, r3t):
            return pl.pallas_call(
                kernel, grid=(ROWS // ts,),
                in_specs=in_specs + [const_spec(c) for c in consts],
                out_specs=[pl.BlockSpec((ts, half), lambda i: (i, 0),
                                        memory_space=pltpu.VMEM)] * 2,
                out_shape=[jax.ShapeDtypeStruct((ROWS, half), jnp.float32)] * 2,
                interpret=INTERP,
            )(l3t, r3t, *[jnp.asarray(c) for c in consts])
    else:
        kernel = functools.partial(pk_kernel, plan=plan, use_rev=use_rev)

        def run(zcat, _unused):
            return pl.pallas_call(
                kernel, grid=(ROWS // ts,),
                in_specs=[pl.BlockSpec((ts, n1, 2 * m), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM)]
                         + [const_spec(c) for c in consts],
                out_specs=[pl.BlockSpec((ts, half), lambda i: (i, 0),
                                        memory_space=pltpu.VMEM)] * 2,
                out_shape=[jax.ShapeDtypeStruct((ROWS, half), jnp.float32)] * 2,
                interpret=INTERP,
            )(zcat, *[jnp.asarray(c) for c in consts])

    return run


# -------------------------------------------------------------- numpy check

def numpy_check():
    """Validate the packed unpack algebra vs the golden formula on tiny
    random windows (pure numpy, no device)."""
    plan = PLAN
    n, n1, n2, m = plan.n, plan.n1, plan.n2, plan.m
    rng = np.random.default_rng(1)
    l = rng.standard_normal(W)
    r = rng.standard_normal(W)
    hann = sk._scaled_hann(W, m, n1).reshape(-1) / (2.0 / W)  # plain hann
    z = np.zeros(n, np.complex128)
    z[:W] = (l + 1j * r) * hann
    Z = np.fft.fft(z)
    scale = 2.0 / W
    # golden unpack (ops/stft.py:96-103), bins k = 0..N/2-1
    ks = np.arange(n // 2)
    gl = np.abs(Z[ks] + np.conj(Z[(-ks) % n])) * (0.5 * scale)
    gr = np.abs(Z[ks] - np.conj(Z[(-ks) % n])) * (0.5 * scale)
    # packed-kernel algebra
    zr = (l * hann).reshape(m, n1)
    zi = (r * hann).reshape(m, n1)
    hannless = packed_constants(plan)
    _, f2p, twcat, f1full, prev = hannless
    zcat = np.concatenate([zr.T, zi.T], axis=1) * (scale * 0.5)  # [n1, 2m]
    b = zcat @ f2p                                     # [n1, 2n2]
    br, bi = b[:, :n2], b[:, n2:]
    twr, twi = twcat[:, :n2], twcat[:, n2:]
    cr = br * twr - bi * twi
    ci = br * twi + bi * twr
    c_cat = np.concatenate([cr, ci], axis=0)           # [2n1, n2]
    d = f1full.T @ c_cat                               # [2n1, n2]
    dr, di = d[:n1], d[n1:]
    k1h = n1 // 2
    e0 = np.zeros(n2); e0[0] = 1.0
    L = np.zeros((k1h, n2)); R = np.zeros((k1h, n2))
    for k1 in range(k1h):
        ar, ai = dr[k1], di[k1]
        j1 = n1 - 1 - k1
        j2 = (n1 - k1) % n1
        zmr = dr[j1] @ prev + dr[j2] * e0
        zmi = di[j1] @ prev + di[j2] * e0
        L[k1] = np.sqrt((ar + zmr) ** 2 + (ai - zmi) ** 2)
        R[k1] = np.sqrt((ar - zmr) ** 2 + (ai + zmi) ** 2)
    dl = np.abs(L.reshape(-1) - gl).max()
    drr = np.abs(R.reshape(-1) - gr).max()
    print(f"numpy check: maxabs L {dl:.3e}  R {drr:.3e} "
          f"(vs |golden| max {gl.max():.3e})", flush=True)
    assert dl < 1e-6 * max(1.0, gl.max()) and drr < 1e-6 * max(1.0, gr.max())


# ------------------------------------------------------------------- timing

def scan_bench(fn, a, b, iters=150):
    @jax.jit
    def runb(x):
        def body(c, _):
            ol, _ = fn(c, b)
            return c + ol[:1, :1].reshape((1,) + (1,) * (x.ndim - 1)) * 1e-20, ol[0, 0]
        return jax.lax.scan(body, x, None, length=iters)
    c, outs = runb(a); np.asarray(outs)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter(); c, outs = runb(a)
        np.asarray(outs)
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e3


def main():
    numpy_check()
    plan = PLAN
    m, n1 = plan.m, plan.n1
    rng = np.random.default_rng(0)
    left = rng.standard_normal((ROWS, W)).astype(np.float32) * 0.1
    right = rng.standard_normal((ROWS, W)).astype(np.float32) * 0.1
    l3t = jnp.asarray(np.ascontiguousarray(
        left.reshape(ROWS, m, n1).transpose(0, 2, 1)))
    r3t = jnp.asarray(np.ascontiguousarray(
        right.reshape(ROWS, m, n1).transpose(0, 2, 1)))
    zcat = jnp.concatenate([l3t, r3t], axis=2)
    ref = None
    cases_env = os.environ.get("CASES")
    if cases_env:
        cases = [(v, int(t)) for v, t in
                 (c.split(":") for c in cases_env.split(","))]
    else:
        cases = [("v4", 64), ("pk", 64), ("pk", 32), ("pk_ik", 64),
                 ("pk_rev", 64)]
    for variant, ts in cases:
        try:
            if variant == "v4":
                fn, a, b = build_v4(ts), l3t, r3t
            elif variant == "pk_ik":
                fn, a, b = build_pk(ts, variant), l3t, r3t
            else:
                fn, a, b = build_pk(ts, variant), zcat, None
            ml, mr = fn(a, b)
            ml = np.asarray(ml)
        except Exception as e:
            print(f"{variant} ts={ts}: FAILED {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)
            continue
        if ref is None:
            ref = ml
            ok = "ref"
        else:
            dabs = np.abs(ml - ref)
            rel = dabs / (np.abs(ref) + 1e-12)
            ok = f"maxabs={dabs.max():.2e} maxrel={rel.max():.2e}"
        if INTERP:
            print(f"{variant} ts={ts}: interpret OK  {ok}", flush=True)
            continue
        t = scan_bench(fn, a, b)
        print(f"{variant} ts={ts}: {t:.3f} ms/push  {ok}", flush=True)


if __name__ == "__main__":
    main()
