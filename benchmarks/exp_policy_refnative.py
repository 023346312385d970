"""E29 (round 5): validate the layout-policy constants OFF the bench
geometry (VERDICT r4 #9).

Both auto-policy constants were measured at the 2048/4096 bench geometry
and hardcoded; at the tuned 40x120 reference-native 2400/4800 plan the
gate-threshold A/B showed opposite-sign deltas, so they are unvalidated
exactly where the reference's own workload runs.  Interleaved (one
process, alternating rounds — window drift is ~8%):

  A/B 1 `_BW_AUTO_FRAC` (0.5): S=4096 scattered 19-palette layout,
        sorted-engaged (frac 0.25) vs gate-refused (default -> per-row).
  A/B 2 `_STREAM_BLOCK_AUTO_MIN` (12288): S in {12288, 16384},
        stream_blocks=0 (flat) vs 4096 (blocked), palette_sort default.

Usage: python benchmarks/exp_policy_refnative.py
Env: POLICY_SCAN=100 POLICY_ROUNDS=3
"""
import os
import sys
import pathlib
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np
import jax
import jax.numpy as jnp

from spectrogram_tpu.config import SpectrogramConfig
from spectrogram_tpu.models.spectrogram import SpectrogramPipeline
from spectrogram_tpu.ops.mxu_fft import FftPlan

SCAN_LEN = int(os.environ.get("POLICY_SCAN", "100"))
ROUNDS = int(os.environ.get("POLICY_ROUNDS", "3"))
N_P = 19
CFG = SpectrogramConfig(sample_rate=48_000.0, window_period=0.05)
PLAN = FftPlan(n=4800, n1=40, n2=120, m=60)

rng = np.random.default_rng(0)


def make(frac=None, sort=True, blocks="auto"):
    p = SpectrogramPipeline(
        CFG, chunk_hops=1, store_ring=False, packed_output=True,
        precision_profile="fast", palette_sort=sort, stream_blocks=blocks)
    p.override_plan(PLAN, 64)
    if frac is not None:
        p._BW_AUTO_FRAC = frac
    return p


def run_cases(title, cases, s):
    scattered = (np.arange(s) % N_P).astype(np.int32)
    chunk = jnp.asarray(
        rng.standard_normal(
            (s, next(iter(cases.values())).chunk_size, 2)
        ).astype(np.float32) * 0.1)
    scans = {}
    for name, p in cases.items():
        def scan(state, ch, p=p):
            def body(st, _):
                st, rgba = p.push_impl(st, ch)
                return st, rgba[:, 0, 0]
            return jax.lax.scan(body, state, None, length=SCAN_LEN)
        scans[name] = jax.jit(scan, donate_argnums=0)
        st = p.set_palette(p.init_state(s), scattered)
        t0 = time.perf_counter()
        st, sums = scans[name](st, chunk)
        np.asarray(sums[-1, :8])
        print(f"  [{title}/{name}] S={s} compile+warm "
              f"{time.perf_counter()-t0:.1f}s "
              f"(sorted={cases[name]._state_perm(st) is not None})",
              flush=True)
        del st
    times = {n: [] for n in cases}
    for r_ in range(ROUNDS):
        for name, p in cases.items():
            st = p.set_palette(p.init_state(s), scattered)
            t0 = time.perf_counter()
            st, sums = scans[name](st, chunk)
            np.asarray(sums[-1, :8])
            dt = (time.perf_counter() - t0) / SCAN_LEN
            times[name].append(dt)
            print(f"  round {r_} [{title}/{name}] {dt*1e3:.3f} ms/push",
                  flush=True)
            del st
    names = list(cases)
    a, b = (min(times[n]) for n in names)
    print(f"RESULT {title} S={s}: {names[0]} {a*1e3:.3f} vs "
          f"{names[1]} {b*1e3:.3f} ms ({100*(b-a)/a:+.1f}%)", flush=True)


# A/B 1: _BW_AUTO_FRAC at S=4096
run_cases(
    "bw_frac",
    {"refuse05": make(frac=0.5), "engage025": make(frac=0.25)},
    4096,
)

# A/B 2: _STREAM_BLOCK_AUTO_MIN at the threshold and above
for s in (12288, 16384):
    run_cases(
        "stream_blocks",
        {"flat": make(blocks=0), "blocked4096": make(blocks=4096)},
        s,
    )
