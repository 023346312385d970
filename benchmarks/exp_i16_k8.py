"""E35 (round 5): int16 planes in the k=8 DISPLAY mode (allk kernel).

The k=1 i16_planes win (-13/-14% e2e) extends to the display path: the
all-windows packed kernel reads the whole carry+chunk buffer per grid
step, so its operand DMA share is even larger than the k=1 kernel's.
Interleaved f32-vs-i16 at chunk_hops=8, per-stream scattered layout.

Usage: python benchmarks/exp_i16_k8.py [S ...]  (default 4096 10240)

RESULTS (v5e-1, 2026-08-20, interleaved, bitwise at 4,096):
  S=4,096:  f32 20.227 -> i16 17.777 ms/8-hop (-12.1%, 1,843,283 rows/s)
  S=10,240: f32 53.407 -> i16 39.595 (-25.9%, 2,068,928 rows/s)
(this harness's f32 baselines read above the official scan-150 rows
— window drift; the interleaved deltas are the evidence)
"""
import sys
import pathlib
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np
import jax
import jax.numpy as jnp

from spectrogram_tpu.config import BENCH_CONFIG
from spectrogram_tpu.models.spectrogram import SpectrogramPipeline

SIZES = [int(a) for a in sys.argv[1:]] or [4096, 10240]
SCAN_LEN = 30
ROUNDS = 3
N_P = 19
K = 8

rng = np.random.default_rng(0)


def make(i16):
    return SpectrogramPipeline(
        BENCH_CONFIG, chunk_hops=K, store_ring=False, packed_output=True,
        precision_profile="fast", i16_planes=i16)


def bench_one(s, check_parity):
    scattered = (np.arange(s) % N_P).astype(np.int32)
    pipes = {"f32": make(False), "i16": make(True)}
    assert pipes["i16"].allk_framing
    chunk = jnp.asarray(
        (rng.standard_normal((s, pipes["f32"].chunk_size, 2)) * 3276)
        .astype(np.int16))

    if check_parity:
        outs = {}
        for n, p in pipes.items():
            st = p.set_palette(p.init_state(s), scattered)
            t0 = time.perf_counter()
            _, r = jax.jit(p.push_impl)(st, chunk)
            outs[n] = np.asarray(r)
            print(f"  parity push [{n}] {time.perf_counter()-t0:.1f}s",
                  flush=True)
        d = int(np.abs(outs["i16"].view(np.uint8).astype(int)
                       - outs["f32"].view(np.uint8).astype(int)).max())
        print(f"S={s} k={K} parity i16 vs f32: max u8 diff = {d}",
              flush=True)
        assert d == 0

    scan_fns = {}
    for n, p in pipes.items():
        def scan(state, ch, p=p):
            def body(st, _):
                st, rgba = p.push_impl(st, ch)
                return st, rgba[:, 0, 0]
            return jax.lax.scan(body, state, None, length=SCAN_LEN)
        scan_fns[n] = jax.jit(scan, donate_argnums=0)
        st = p.set_palette(p.init_state(s), scattered)
        t0 = time.perf_counter()
        st, sums = scan_fns[n](st, chunk)
        np.asarray(sums[-1, :8])
        print(f"  [{n}] compile+warm {time.perf_counter()-t0:.1f}s",
              flush=True)
        del st

    times = {n: [] for n in pipes}
    for r_ in range(ROUNDS):
        for n, p in pipes.items():
            st = p.set_palette(p.init_state(s), scattered)
            t0 = time.perf_counter()
            st, sums = scan_fns[n](st, chunk)
            np.asarray(sums[-1, :8])
            dt = (time.perf_counter() - t0) / SCAN_LEN
            times[n].append(dt)
            print(f"  round {r_} [{n}] {dt*1e3:.3f} ms/push", flush=True)
            del st
    a, b = min(times["f32"]), min(times["i16"])
    print(f"S={s} k={K} RESULT: i16 vs f32 {100*(b-a)/a:+.1f}% "
          f"({a*1e3:.3f} -> {b*1e3:.3f} ms/{K}-hop push; "
          f"{s*K/b:,.0f} rows/s)", flush=True)


for i, s_ in enumerate(SIZES):
    bench_one(s_, check_parity=(i == 0))
