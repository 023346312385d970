"""E25 (round 5): stage-ablated STFT kernel timing — localize the
utilization gap without in-kernel timers.

The packed kernel sits at ~94% of its 864-bf16-pass-unit formulation
floor yet ~38% of the fp32-HIGHEST MXU roofline at 16k rows, and pass
savings historically convert to wall at only ~50% (BASELINE.md SOL) —
the losses are real but unlocalized, and the dev relay admits no
in-kernel timers.  Substitute: TIMING-ONLY kernel prefixes
(`stft_mag_fused2(..., ablate_stage=...)` — same operands, same grid,
same output shapes; rows fabricated from the deepest computed tensor so
nothing is DCE'd).  The deltas between consecutive prefixes are each
stage's wall share, compared against its pass-model share:

  stage     pass units   model share of MXU time
  s1 dot    384          44.4%
  twiddle   0 (VPU)      ~0 if overlapped with MXU
  s2 dot    384          44.4%
  prev dot  96 (split3)  11.1%
  unpack    0 (VPU)      ~0 if overlapped

A stage whose wall delta exceeds its model share is where utilization
dies (VPU not overlapping, layout/relayout stalls, VMEM pressure).

Caveat: a prefix kernel's VPU/MXU overlap differs from the full
kernel's (later stages can hide earlier VPU work), so deltas are an
upper bound on pure-stage cost and the LAST stages absorb the overlap
credit.  Read the table as attribution, not gospel.

Usage: python benchmarks/exp_stft_ablate.py [ROWS ...] (default 16384 4096)

RESULTS (v5e-1, 2026-08-20; full table in BASELINE.md): the kernel is
NOT MXU-bound — the pre-dot prefix (operand DMA + lane concat + Hann,
stage "hann") is 59.4% of kernel wall at 16,384 rows; the stage-1 dot
adds 1.7%, twiddle/prev are FREE (overlapped), stage-2 26.6%,
magnitude 9.9%.  The follow-ups: s1_flat a WASH (exp_stft_s1flat,
+0.1% — Mosaic already tiles the 3D dot); operand decomposition in
exp_stft_dma -> the shipped i16_planes mode.
"""
import os
import sys
import pathlib
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np
import jax

INTERPRET = os.environ.get("ABLATE_INTERPRET", "0") == "1"
if INTERPRET:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from spectrogram_tpu.config import BENCH_CONFIG
from spectrogram_tpu.ops.pallas import stft_kernel as sk

SIZES = [int(a) for a in sys.argv[1:]] or [16384, 4096]
SCAN_LEN = int(os.environ.get("ABLATE_SCAN", "150"))
ROUNDS = int(os.environ.get("ABLATE_ROUNDS", "3"))
# cumulative prefixes, in execution order; "full" = production kernel
# ("hann" = operand DMA + lane concat + Hann only — the pre-dot floor)
STAGES = ["hann", "s1", "tw", "s2", "noprev", "nounpack", "full"]
# pass-model cumulative shares of MXU work (s1 384 / s2 +384 / prev +96)
MODEL_UNITS = {"hann": 0, "s1": 384, "tw": 384, "s2": 768, "noprev": 768,
               "nounpack": 864, "full": 864}

W = BENCH_CONFIG.window_size


def bench_rows(rows):
    rng = np.random.default_rng(0)
    left = jnp.asarray(rng.standard_normal((rows, W)).astype(np.float32) * 0.1)
    right = jnp.asarray(rng.standard_normal((rows, W)).astype(np.float32) * 0.1)

    fns = {}
    for st in STAGES:
        def fn(l, r, st=st):
            return sk.stft_mag_fused2(
                l, r, BENCH_CONFIG, packed=True, unpack_split=3,
                ablate_stage=None if st == "full" else st,
                interpret=INTERPRET,
            )
        fns[st] = fn

    scans = {}
    for st in STAGES:
        def scan(l, r, st=st):
            def body(c, _):
                ml, mr = fns[st](c, r)
                return c + ml[:1, :1] * 1e-20, ml[0, 0]
            return jax.lax.scan(body, l, None, length=SCAN_LEN)
        scans[st] = jax.jit(scan)
        t0 = time.perf_counter()
        _, outs = scans[st](left, right)
        np.asarray(outs[:4])
        print(f"  [{st}] compile+warm {time.perf_counter()-t0:.1f}s",
              flush=True)

    times = {st: np.inf for st in STAGES}
    for r_ in range(ROUNDS):
        for st in STAGES:
            t0 = time.perf_counter()
            _, outs = scans[st](left, right)
            np.asarray(outs[:4])
            dt = (time.perf_counter() - t0) / SCAN_LEN
            times[st] = min(times[st], dt)
            print(f"  round {r_} [{st}] {dt*1e3:.3f} ms", flush=True)

    full = times["full"]
    print(f"\nROWS={rows}  full kernel {full*1e3:.3f} ms "
          f"(scan best-of-{ROUNDS})", flush=True)
    print(f"{'stage':10} {'cum ms':>8} {'delta ms':>9} {'wall %':>7} "
          f"{'model %':>8}", flush=True)
    prev_t, prev_u = 0.0, 0
    for st in STAGES:
        dt_ms = times[st] * 1e3
        delta = dt_ms - prev_t
        du = MODEL_UNITS[st] - prev_u
        print(f"{st:10} {dt_ms:8.3f} {delta:9.3f} "
              f"{100*delta/(full*1e3):6.1f}% {100*du/864:7.1f}%",
              flush=True)
        prev_t, prev_u = dt_ms, MODEL_UNITS[st]


for rows in SIZES:
    bench_rows(rows)
