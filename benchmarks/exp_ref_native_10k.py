"""E21: reference-native 2400/4800 geometry at the north-star population.

The reference app's own STFT geometry (window 2400, zero-padded 4800,
fft.rs:33,44) measured 1,155,748 rows/s per-stream at 4096 streams
(BASELINE.md tuned table).  At the 10,240-stream north-star population
the 19-palette scattered layout sorts into 539-stream runs, so
palette_sort engages (block-relative, flat push) where it could not at
4096 — this harness measures the default-vs-per-row pair with the tuned
40x120 ts=64 plan.

RESULTS (TPU v5e-1 via dev harness, 2026-08-19, scan 50, best of 3,
bitwise parity):
  pre-packed (split-real v4 STFT):
    per_row (BENCH_PALETTE_SORT=0 class): 9.936 ms/push  1,030,566 rows/s
    sorted  (library default):            8.939 ms/push  1,145,485 rows/s
    (+11.2%; throughput holds flat from 4096 -> 10,240 streams at the
    reference geometry — no population droop.)
  round-4 closeout (packed-complex STFT default, engages at 40x120):
    per_row: 9.277 ms/push  1,103,795 rows/s
    sorted : 8.396 ms/push  1,219,648 rows/s   (+6.5% from packed)
  round-4 wrap (2026-08-20, tiny-slice readback — post-tax; parity 0 u8):
    per_row: 8.873 ms/push  1,154,013 rows/s
    sorted : 7.468 ms/push  1,371,200 rows/s   (the number of record)

Usage: python benchmarks/exp_ref_native_10k.py
"""
import sys, time, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np, jax, jax.numpy as jnp
from spectrogram_tpu.config import SpectrogramConfig
from spectrogram_tpu.models.spectrogram import SpectrogramPipeline
from spectrogram_tpu.ops.mxu_fft import FftPlan

S, SCAN = 10240, 50
cfg = SpectrogramConfig(sample_rate=48000.0, window_period=0.05)
ids = (np.arange(S) % 19).astype(np.int32)

def make(sort):
    p = SpectrogramPipeline(cfg, chunk_hops=1, store_ring=False,
                            packed_output=True, precision_profile="fast",
                            palette_sort=sort)
    p.override_plan(FftPlan(n=4800, n1=40, n2=120, m=60), 64)
    return p

pipes = {"per_row": make(False), "sorted": make(True)}
import os
if os.environ.get("E21_UNIFORM", "0") == "1":
    # scalar set_palette -> SMEM-scalar uniform colormap kernel: the one
    # published cell still missing for this geometry (uniform at the
    # north-star population; 4096-stream uniform is in BASELINE.md)
    pipes = {"uniform": make(True)}
    ids = 1
chunk = jnp.asarray(np.random.default_rng(0).standard_normal(
    (S, pipes[next(iter(pipes))].chunk_size, 2)).astype(np.float32) * 0.1)
st_s = pipes["sorted"].set_palette(pipes["sorted"].init_state(S), ids) \
    if "sorted" in pipes else None
if st_s is not None:
    print("sorted engaged =", pipes["sorted"]._state_perm(st_s) is not None,
          "global =", pipes["sorted"]._tables_perm_global(st_s.tables),
          flush=True)
    outs = {}
    for n, p in pipes.items():
        _, r = jax.jit(p.push_impl)(p.set_palette(p.init_state(S), ids), chunk)
        outs[n] = np.asarray(r)
    d = int(np.abs(outs["sorted"].view(np.uint8).astype(int)
                   - outs["per_row"].view(np.uint8).astype(int)).max())
    print("parity max u8 diff =", d, flush=True)
    assert d == 0
for n, p in pipes.items():
    def scan(state, ch):
        def body(s_, _):
            s_, rgba = p.push_impl(s_, ch)
            return s_, rgba[:, 0, 0]
        return jax.lax.scan(body, state, None, length=SCAN)
    f = jax.jit(scan, donate_argnums=0)
    st = p.set_palette(p.init_state(S), ids)
    t0 = time.perf_counter(); st, sums = f(st, chunk); np.asarray(sums[-1, :8])
    print(f"  [{n}] compile {time.perf_counter()-t0:.1f}s", flush=True)
    best = 1e9
    for _ in range(3):
        st = p.set_palette(p.init_state(S), ids)
        t0 = time.perf_counter(); st, sums = f(st, chunk); np.asarray(sums[-1, :8])
        best = min(best, (time.perf_counter()-t0)/SCAN)
    print(f"{n}: {best*1e3:.3f} ms/push  {S/best:,.0f} rows/s", flush=True)
