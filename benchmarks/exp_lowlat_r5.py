"""E34 (round 5): refresh the low-latency 512/1024 row (stale since
round 3 — the small-N compile blowup kept it off the round-4 re-tunes;
exp_smalln_compile attributed that blowup to the relay helper's state,
N=1024 compiles in ~1.4 s warm, so the row can finally be re-measured
under the packed/wisdom-v7 era).

Geometry: window 512, padded 1024 (W/2 low-latency mode), 4,096
streams, k=1 streaming config.  Plans: the round-3 tuned 8x128 (flip
orientation — packed now auto-engages on it) vs the static-model
default.  Scattered + uniform palettes, interleaved.

Usage: python benchmarks/exp_lowlat_r5.py
"""
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

S = 4096
SCAN_LEN = 150
ROUNDS = 3
CFG = SpectrogramConfig(
    sample_rate=48_000.0,
    window_period=512 / 48_000.0,
    hop_period=128 / 48_000.0,
)

rng = np.random.default_rng(0)
scattered = (np.arange(S) % 19).astype(np.int32)


def make(plan, ts, uniform):
    p = SpectrogramPipeline(
        CFG, chunk_hops=1, store_ring=False, packed_output=True,
        precision_profile="fast")
    if plan is not None:
        p.override_plan(plan, ts)
    return p


CASES = {
    "8x128_scat": (FftPlan(n=1024, n1=8, n2=128, m=64), 32, False),
    "8x128_unif": (FftPlan(n=1024, n1=8, n2=128, m=64), 32, True),
    "default_scat": (None, None, False),
}

pipes = {n: make(*c) for n, c in CASES.items()}
for n, p in pipes.items():
    print(f"{n}: plan {p.fft_plan} packed={p.stft_packed}", flush=True)
chunk = jnp.asarray(
    rng.standard_normal((S, pipes["8x128_scat"].chunk_size, 2))
    .astype(np.float32) * 0.1)


def init(n):
    p = pipes[n]
    st = p.init_state(S)
    return p.set_palette(st, 1 if CASES[n][2] else scattered)


scans = {}
for n, p in pipes.items():
    def scan(state, ch, p=p):
        def body(st, _):
            st, rgba = p.push_impl(st, ch)
            return st, rgba[:, 0, 0]
        return jax.lax.scan(body, state, None, length=SCAN_LEN)
    scans[n] = jax.jit(scan, donate_argnums=0)
    st = init(n)
    t0 = time.perf_counter()
    st, sums = scans[n](st, chunk)
    np.asarray(sums[-1, :8])
    print(f"  [{n}] compile+warm {time.perf_counter()-t0:.1f}s", flush=True)
    del st

times = {n: np.inf for n in pipes}
for r_ in range(ROUNDS):
    for n in pipes:
        st = init(n)
        t0 = time.perf_counter()
        st, sums = scans[n](st, chunk)
        np.asarray(sums[-1, :8])
        dt = (time.perf_counter() - t0) / SCAN_LEN
        times[n] = min(times[n], dt)
        print(f"  round {r_} [{n}] {dt*1e3:.3f} ms/push", flush=True)
        del st
print("RESULT:", flush=True)
for n, t in times.items():
    print(f"  {n:14s} {t*1e3:8.3f} ms/push  {S/t:>12,.0f} rows/s",
          flush=True)
