"""E31 (round 5): decompose the packed kernel's pre-dot leg.

exp_stft_ablate (extended) showed the packed kernel is NOT MXU-bound:
the pre-dot prefix (operand DMA + lane concat + Hann) is 59.4% of
kernel wall at 16,384 rows while the stage-1 dot adds 1.7%.  This
harness times four minimal standalone kernels over the same operand
block structure to split that leg:

  two_op       — read left3/right3 [ts, n1, m] (m=64 lanes: HALF-EMPTY
                 VMEM tiles), emit slices.  Pure two-operand DMA floor.
  two_op_hann  — + in-kernel lane concat + Hann multiply (the
                 production pre-dot leg exactly).
  one_op       — read ONE fused zcat [ts, n1, 2m] (full 128-lane
                 tiles, same total bytes).  Pure fused-operand DMA.
  one_op_hann  — + Hann multiply (no concat needed).

If one_op << two_op: the half-empty lane tiles tax the DMA -> fuse the
channel concat into the XLA-side framing copies and feed one operand.
If two_op_hann - two_op >> 0: the concat/Hann VPU work is the cost ->
different fix (fold Hann into the stage-1 constants is impossible —
it varies per (n1 row, m lane) — but bf16 operands or reshaped
multiplies may be).

Usage: python benchmarks/exp_stft_dma.py [ROWS] (default 16384)

RESULTS (v5e-1, 2026-08-20, ROWS=16,384, scan-150 best-of-3):
  two_op      1.952 ms   (pure two-operand DMA floor)
  two_op_hann 1.953      (concat + Hann FREE — fully overlapped)
  one_op      1.604      (fused f32 operand: -18%)
  one_op_hann 1.607
  one_op_i16  1.011      (int16 fused: -48% vs production)
  two_op_i16  1.207      (int16 two-operand: -38% -> the shipped
                          i16_planes mode, no operand-layout change)
The kernel is DMA-bound on this leg (exp_stft_ablate: 59.4% of kernel
wall); conclusion -> i16_planes (models/spectrogram.py).
"""
import os
import sys
import pathlib
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spectrogram_tpu.config import BENCH_CONFIG
from spectrogram_tpu.ops.mxu_fft import make_plan
from spectrogram_tpu.ops.pallas.stft_kernel import _packed_hann

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
SCAN_LEN = int(os.environ.get("DMA_SCAN", "150"))
ROUNDS = 3
TS = 64

cfg = BENCH_CONFIG
plan = make_plan(cfg)
n1, m, n2 = plan.n1, plan.m, plan.n2
k1h = n1 // 2
half = k1h * n2
W = cfg.window_size


def out_spec():
    return pl.BlockSpec((TS, half), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


def op_spec(shape):
    return pl.BlockSpec((TS,) + shape, lambda i: (i,) + (0,) * len(shape),
                        memory_space=pltpu.VMEM)


def const_spec(arr):
    return pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                        memory_space=pltpu.VMEM)


def emit(rows_src, out_ref):
    # fabricate the production-shaped output from the deepest tensor so
    # nothing is DCE'd (n2 == 2m == 128 at the bench plan)
    for k1 in range(k1h):
        out_ref[:, k1 * n2:(k1 + 1) * n2] = rows_src(k1)


def k_two_op(l_ref, r_ref, out_ref):
    l, r = l_ref[:], r_ref[:]
    emit(lambda k1: jnp.concatenate(
        [l[:, k1 % n1, :], r[:, k1 % n1, :]], axis=1), out_ref)


def k_two_op_hann(l_ref, r_ref, hann_ref, out_ref):
    zcat = jnp.concatenate([l_ref[:], r_ref[:]], axis=2) * hann_ref[:]
    emit(lambda k1: zcat[:, k1 % n1, :], out_ref)


def k_one_op(z_ref, out_ref):
    z = z_ref[:]
    emit(lambda k1: z[:, k1 % n1, :], out_ref)


def k_one_op_hann(z_ref, hann_ref, out_ref):
    z = z_ref[:] * hann_ref[:]
    emit(lambda k1: z[:, k1 % n1, :], out_ref)


def k_one_op_i16(z_ref, hann_ref, out_ref):
    # int16 wire planes: cast + Hann in-kernel (the 1/32768 folds exactly
    # into the Hann constant — power-of-two, bit-identical); HALF the
    # input DMA bytes of the f32 operand
    z = z_ref[:].astype(jnp.float32) * hann_ref[:]
    emit(lambda k1: z[:, k1 % n1, :], out_ref)


def k_two_op_i16(l_ref, r_ref, hann_ref, out_ref):
    zcat = jnp.concatenate(
        [l_ref[:], r_ref[:]], axis=2
    ).astype(jnp.float32) * hann_ref[:]
    emit(lambda k1: zcat[:, k1 % n1, :], out_ref)


def main():
    rng = np.random.default_rng(0)
    left = rng.standard_normal((ROWS, W)).astype(np.float32) * 0.1
    right = rng.standard_normal((ROWS, W)).astype(np.float32) * 0.1
    l3 = jnp.asarray(np.ascontiguousarray(
        np.swapaxes(left.reshape(ROWS, m, n1), 1, 2)))
    r3 = jnp.asarray(np.ascontiguousarray(
        np.swapaxes(right.reshape(ROWS, m, n1), 1, 2)))
    z3 = jnp.concatenate([l3, r3], axis=2)
    l3_i16 = (l3 * 32768).astype(jnp.int16)
    r3_i16 = (r3 * 32768).astype(jnp.int16)
    z3_i16 = jnp.concatenate([l3_i16, r3_i16], axis=2)
    hann = _packed_hann(W, m, n1, transposed=True)  # [n1, 2m]
    hann_j = jnp.asarray(hann)
    out_sds = jax.ShapeDtypeStruct((ROWS, half), jnp.float32)
    grid = (ROWS // TS,)

    def call(kernel, specs, args):
        return pl.pallas_call(
            kernel, grid=grid, in_specs=specs, out_specs=out_spec(),
            out_shape=out_sds,
        )(*args)

    # the scanned carry IS the primary operand (perturbed each step by a
    # ~0 term of the output) so the pallas_call cannot be hoisted out of
    # the loop as a constant expression
    cases = {
        "two_op": (l3, lambda c: call(
            k_two_op, [op_spec((n1, m))] * 2, (c, r3))),
        "two_op_hann": (l3, lambda c: call(
            k_two_op_hann, [op_spec((n1, m))] * 2 + [const_spec(hann)],
            (c, r3, hann_j))),
        "one_op": (z3, lambda c: call(
            k_one_op, [op_spec((n1, 2 * m))], (c,))),
        "one_op_hann": (z3, lambda c: call(
            k_one_op_hann, [op_spec((n1, 2 * m)), const_spec(hann)],
            (c, hann_j))),
        "one_op_i16": (z3_i16, lambda c: call(
            k_one_op_i16, [op_spec((n1, 2 * m)), const_spec(hann)],
            (c, hann_j))),
        "two_op_i16": (l3_i16, lambda c: call(
            k_two_op_i16, [op_spec((n1, m))] * 2 + [const_spec(hann)],
            (c, r3_i16, hann_j))),
    }

    scans = {}
    for name, (op0, fn) in cases.items():
        def scan(carry, fn=fn):
            def body(c, _):
                o = fn(c)
                # dtype-preserving ~0 perturbation (int16 carries included)
                return c + (o[:1, :1, None] * 1e-20).astype(c.dtype), o[0, 0]
            return jax.lax.scan(body, carry, None, length=SCAN_LEN)
        scans[name] = jax.jit(scan)
        t0 = time.perf_counter()
        _, outs = scans[name](op0)
        np.asarray(outs[:4])
        print(f"  [{name}] compile+warm {time.perf_counter()-t0:.1f}s",
              flush=True)

    times = {n: np.inf for n in cases}
    for r_ in range(ROUNDS):
        for name in cases:
            t0 = time.perf_counter()
            _, outs = scans[name](cases[name][0])
            np.asarray(outs[:4])
            dt = (time.perf_counter() - t0) / SCAN_LEN
            times[name] = min(times[name], dt)
            print(f"  round {r_} [{name}] {dt*1e3:.3f} ms", flush=True)
    print(f"\nROWS={ROWS} RESULT:", flush=True)
    for name, t in times.items():
        print(f"  {name:12s} {t*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
