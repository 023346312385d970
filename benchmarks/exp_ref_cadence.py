"""E26 (round 5): real-time capacity at the REFERENCE'S OWN cadence.

The reference's operating point is hop ~58 samples at 48 kHz -> 827.6
rows/s/stream (gpu_spectrogram.rs:21-23 viewport maths, fft.rs:33,44
window 2400 zero-padded to 4800; audio_transform.rs:35 stride).  Every
published capacity bracket (~29k/~35k) is at the self-chosen 60 rows/s
bench cadence; "matching on the reference's own terms" needs the first
failing population bracketed against the k*1.208 ms/push budget at the
tuned 40x120 plan.

Method: per (chunk_hops k, palette mode), walk a 256-stream grid from a
seed population — up while inside the budget, down while over — until
two adjacent grid points straddle it; run both boundary points TWICE
(the exp_capacity_r4 rigor; single boundary readings carry +-1k-stream
spread).  All cases share one process so the relay compile helper warms
once; tiny-slice readback.

Usage: python benchmarks/exp_ref_cadence.py [k ...]  (default 1 8 16)
Env: REFCAD_MODES=scattered,uniform  REFCAD_SCAN=100

RESULTS (v5e-1, 2026-08-20; BASELINE.md table): k=16 (~one push per
display frame, the reference's real dispatch shape) ~2,304 uniform /
~1,792 scattered; k=8 ~2,048 / ~1,792; k=1 ~1,280 scattered (budget
1.2 ms ~ relay jitter — trust the k>=8 rows).  All brackets 256-stream
grid, boundary points twice.
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

KS = [int(a) for a in sys.argv[1:]] or [1, 8, 16]
MODES = os.environ.get("REFCAD_MODES", "scattered,uniform").split(",")
SCAN_LEN = int(os.environ.get("REFCAD_SCAN", "100"))
STEP = 256
N_P = 19

HOP = 58  # audio_transform.rs:35: stride = viewport speed * rate ~ 58
CFG = SpectrogramConfig(
    sample_rate=48_000.0,
    window_period=2400 / 48_000.0,
    hop_period=HOP / 48_000.0,
)
PLAN = FftPlan(n=4800, n1=40, n2=120, m=60)  # round-4 tuned (wisdom v7)
BUDGET_1 = HOP / 48_000.0  # 1.208 ms of audio per hop

# seed guesses from the 60 rows/s ref-native throughput (~1.4M rows/s
# -> ~1.7k streams at 827.6 rows/s/stream)
SEED = {1: 1024, 4: 1280, 8: 1536, 16: 1536}

rng = np.random.default_rng(0)
_cache = {}


def measure(k, mode, s):
    """Best-of-2 scan ms/push for (chunk_hops, palette mode, streams)."""
    key = (k, mode, s)
    if key in _cache:
        return _cache[key]
    p = SpectrogramPipeline(
        CFG, chunk_hops=k, store_ring=False, packed_output=True,
        precision_profile="fast",
    )
    p.override_plan(PLAN, block_rows=64)
    assert p.stft_packed and p.stft_lane_pad, (p.stft_packed, p.stft_lane_pad)

    def init():
        st = p.init_state(s)
        if mode == "uniform":
            return p.set_palette(st, 1)
        return p.set_palette(st, (np.arange(s) % N_P).astype(np.int32))

    chunk = jnp.asarray(
        rng.standard_normal((s, p.chunk_size, 2)).astype(np.float32) * 0.1)

    def scan(state, ch):
        def body(st, _):
            st, rgba = p.push_impl(st, ch)
            return st, rgba[:, 0, 0]
        return jax.lax.scan(body, state, None, length=SCAN_LEN)

    scan_fn = jax.jit(scan, donate_argnums=0)
    st = init()
    t0 = time.perf_counter()
    st, sums = scan_fn(st, chunk)
    np.asarray(sums[-1, :8])
    print(f"    k={k} {mode} S={s}: compile+warm "
          f"{time.perf_counter()-t0:.1f}s", flush=True)
    best = np.inf
    for _ in range(2):
        st = init()
        t0 = time.perf_counter()
        st, sums = scan_fn(st, chunk)
        np.asarray(sums[-1, :8])
        best = min(best, (time.perf_counter() - t0) / SCAN_LEN)
    del st
    print(f"    k={k} {mode} S={s}: {best*1e3:.3f} ms/push "
          f"(budget {k*BUDGET_1*1e3:.3f})", flush=True)
    _cache[key] = best
    return best


def bracket(k, mode):
    budget = k * BUDGET_1
    s = SEED.get(k, 1024)
    inside = measure(k, mode, s) <= budget
    step = STEP if inside else -STEP
    while True:
        s2 = s + step
        if s2 < STEP:
            print(f"  k={k} {mode}: below {STEP} streams?!", flush=True)
            return
        ok2 = measure(k, mode, s2) <= budget
        if ok2 != inside:
            lo, hi = (s, s2) if inside else (s2, s)
            break
        s = s2
    # boundary points twice (second, independent measurement)
    t_lo = [measure(k, mode, lo), None]
    t_hi = [measure(k, mode, hi), None]
    _cache.pop((k, mode, lo)), _cache.pop((k, mode, hi))
    t_lo[1] = measure(k, mode, lo)
    t_hi[1] = measure(k, mode, hi)
    ok_lo = all(t <= budget for t in t_lo)
    ok_hi = all(t > budget for t in t_hi)
    print(
        f"RESULT k={k} {mode}: capacity ~{lo} streams at 827.6 rows/s/"
        f"stream (last inside {lo} @ {t_lo[0]*1e3:.2f}/{t_lo[1]*1e3:.2f} "
        f"ms vs {budget*1e3:.2f} budget [{'clean' if ok_lo else 'NOISY'}], "
        f"first over {hi} @ {t_hi[0]*1e3:.2f}/{t_hi[1]*1e3:.2f} "
        f"[{'clean' if ok_hi else 'NOISY'}])",
        flush=True,
    )


for mode in MODES:
    for k in KS:
        print(f"-- bracket k={k} mode={mode}", flush=True)
        bracket(k, mode)
