"""Round-4 continuation: bf16-split unpack permutation dot (unpack_split).

The packed kernel's `prev` permutation matmul is 32 of its 160 MXU passes
(BASELINE.md pass model) and runs at HIGHEST = 6 bf16 passes per f32 dot.
But `prev` is a 0/1 permutation: it does NO arithmetic, only lane
movement, so the coefficient operand is EXACT in bf16 and each output
lane accumulates exactly one product.  Splitting the DATA operand into n
bf16 terms (h = bf16(r); r -= h) and summing n single-pass DEFAULT dots
gives:

  n=3: EXACT f32 (residual < 2^-27 relative, below the f32 rounding of
       the reconstruction sum) — measured BITWISE vs the HIGHEST dot in
       interpret mode; prev cost 32 -> 16 passes, kernel 160 -> 144
       (model -10%).
  n=2: residual ~2^-18 relative (max dB delta 5.7e-5 at the bench
       geometry, crosstalk floor -132 dB vs the -70 dB display window);
       prev cost 32 -> 10.7, kernel -> ~139 (model -13%).

This is NOT legal for the FFT stages (their operands are irrational and
their sums cancel — the round-3 bf16 tonal-floor lesson); prev is pure
data movement.

Cases: production `stft_mag_fused2(packed=True, unpack_split=s)` for
s in {0, 2, 3}, interleaved in ONE process (official-bench windows drift
~8%; CLAUDE.md).  ROWS env selects the population.

MEASURED (v5e, 2026-08-19, W=2048 plan 32x128x64 ts=64, 150-iter scan
best-of-3, one process; CPU interpret numerics: split3 BITWISE, split2
maxabs 2.2e-7 at peak 0.25 / max dB delta 5.7e-5 / silent-channel
crosstalk floor -132 dB):

  ROWS=4096:  split0 1.152 ms | split3 1.103 (-4.3%, BITWISE on
              hardware) | split2 1.074 (-6.8%, maxabs 4.7e-8)
  ROWS=16384: split0 4.669 ms | split3 4.497 (-3.7%, BITWISE) |
              split2 4.355 (-6.7%, maxabs 3.9e-8)

The win is real but HALF the pass model's (-10%/-13.3%): saved prev
passes convert to wall time at ~50%, i.e. the prev dot partially
overlaps non-MXU work — consistent with the kernel sitting at ~94% of
the 160-pass floor rather than 100%.  DECISION: split3 is the default
(auto) wherever packed engages — bitwise, free; split2 stays opt-in
(its error is 6 orders below the u8 quantum, but the marginal 2.6% is
not worth weakening the "FFT output is exact f32" invariant the exact
profile promises).  XLA-level control: a plain DEFAULT f32 dot errs
7.7e-3 (one-pass bf16 operand rounding) — the split structure, not the
precision flag, is what makes this free.
"""
import sys, pathlib, time, os
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np, jax, jax.numpy as jnp
from spectrogram_tpu.config import BENCH_CONFIG as CFG
from spectrogram_tpu.ops.mxu_fft import make_plan
from spectrogram_tpu.ops.pallas import stft_kernel as sk

PLAN = make_plan(CFG)
ROWS = int(os.environ.get("ROWS", "4096"))
INTERP = bool(int(os.environ.get("INTERP", "0")))
ITERS = int(os.environ.get("ITERS", "150"))
W = CFG.window_size


def build(split):
    def run(l, r):
        return sk.stft_mag_fused2(
            l, r, CFG, block_rows=64, interpret=INTERP, slice_bins=False,
            plan=PLAN, packed=True, unpack_split=split,
        )
    return run


def scan_bench(fn, a, b, iters=ITERS):
    @jax.jit
    def runb(x):
        def body(c, _):
            ol, _ = fn(c, b)
            return c + ol[:1, :1] * 1e-20, ol[0, 0]
        return jax.lax.scan(body, x, None, length=iters)
    c, outs = runb(a); np.asarray(outs)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter(); c, outs = runb(a)
        np.asarray(outs)
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e3


def main():
    rng = np.random.default_rng(0)
    left = jnp.asarray(rng.standard_normal((ROWS, W)).astype(np.float32) * 0.1)
    right = jnp.asarray(rng.standard_normal((ROWS, W)).astype(np.float32) * 0.1)
    ref = None
    for split in (0, 3, 2):
        fn = build(split)
        ml, mr = fn(left, right)
        ml = np.asarray(ml)
        if ref is None:
            ref, ok = ml, "ref"
        else:
            d = np.abs(ml - ref).max()
            ok = "BITWISE" if d == 0.0 else f"maxabs={d:.2e}"
        if INTERP:
            print(f"split{split}: interpret OK  {ok}", flush=True)
            continue
        t = scan_bench(fn, left, right)
        print(f"split{split}: {t:.3f} ms/push  {ok}", flush=True)


if __name__ == "__main__":
    main()
