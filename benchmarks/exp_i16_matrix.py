"""E33 (round 5): the serving-mode matrix — wire dtype x host-sorted drain.

exp_i16_e2e measured i16_planes -27% at 16,384 vs the f32 pipeline fed
the SAME int16 wire (whose edge cast turns out to be expensive at 16k+:
the converted chunk copy re-enters HBM in the blocked regime), and
exp_presorted measured the host-sorted drain -9%.  This harness runs
the full 2x2 in ONE process so every pair shares a window:

  f32     — f32 chunks (the official-bench baseline wire)
  f32_ps  — f32 chunks + presorted_input
  i16     — i16_planes (int16 wire end-to-end)
  i16_ps  — i16_planes + presorted_input (the full round-5 serving mode)

All four are fed bit-identical sample values (f32 = int16/32768) and
parity-checked against each other at the first population.

Usage: python benchmarks/exp_i16_matrix.py [S ...] (default 16384 10240)

RESULTS (v5e-1, 2026-08-20, ALL FOUR CASES BITWISE vs f32 on hardware):
  S=16,384: f32 9.323 / f32_ps 9.160 / i16 8.322 / i16_ps 8.105 ms
            (i16_ps = 2,021,449 rows/s, -13.1%)
  S=10,240: f32 5.682 / f32_ps 5.359 / i16 4.888 / i16_ps 4.940
            (i16 = 2,094,801 rows/s, -14.0%; presorted a wash on top
            at flat-push populations — the int16 gather is half-cost
            and fuses)
Capacity brackets with the serving modes in BASELINE.md (round 5).
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

SIZES = [int(a) for a in sys.argv[1:]] or [16384, 10240]
SCAN_LEN = 50
ROUNDS = 3
N_P = 19

rng = np.random.default_rng(0)


def make(i16, ps):
    return SpectrogramPipeline(
        BENCH_CONFIG, chunk_hops=1, store_ring=False, packed_output=True,
        precision_profile="fast", i16_planes=i16, presorted_input=ps)


CASES = {
    "f32": (False, False),
    "f32_ps": (False, True),
    "i16": (True, False),
    "i16_ps": (True, True),
}


def bench_one(s, check_parity):
    scattered = (np.arange(s) % N_P).astype(np.int32)
    pcm16 = (rng.standard_normal((s, 800, 2)) * 3276).astype(np.int16)
    pcm32 = pcm16.astype(np.float32) * np.float32(2.0 ** -15)
    pipes = {n: make(i, p) for n, (i, p) in CASES.items()}
    state0 = pipes["f32"].set_palette(pipes["f32"].init_state(s), scattered)
    perm = pipes["f32_ps"].input_perm(state0)
    assert perm is not None
    del state0
    chunks = {
        "f32": jnp.asarray(pcm32),
        "f32_ps": jnp.asarray(pcm32[perm]),
        "i16": jnp.asarray(pcm16),
        "i16_ps": jnp.asarray(pcm16[perm]),
    }

    if check_parity:
        outs = {}
        for n, p in pipes.items():
            st = p.set_palette(p.init_state(s), scattered)
            t0 = time.perf_counter()
            _, r = jax.jit(p.push_impl)(st, chunks[n])
            outs[n] = np.asarray(r)
            print(f"  parity push [{n}] {time.perf_counter()-t0:.1f}s",
                  flush=True)
        base = outs["f32"]
        for n in CASES:
            d = int(np.abs(outs[n].view(np.uint8).astype(int)
                           - base.view(np.uint8).astype(int)).max())
            print(f"S={s} parity {n} vs f32: max u8 diff = {d}", flush=True)
            assert d == 0, n

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
        st, sums = scan_fns[n](st, chunks[n])
        np.asarray(sums[-1, :8])
        print(f"  [{n}] compile+warm {time.perf_counter()-t0:.1f}s",
              flush=True)
        del st

    times = {n: [] for n in pipes}
    for r_ in range(ROUNDS):
        for n, p in pipes.items():
            st = p.set_palette(p.init_state(s), scattered)
            t0 = time.perf_counter()
            st, sums = scan_fns[n](st, chunks[n])
            np.asarray(sums[-1, :8])
            dt = (time.perf_counter() - t0) / SCAN_LEN
            times[n].append(dt)
            print(f"  round {r_} [{n}] {dt*1e3:.3f} ms/push", flush=True)
            del st
    base = min(times["f32"])
    print(f"S={s} RESULT:", flush=True)
    for n in CASES:
        t = min(times[n])
        print(f"  {n:8s} {t*1e3:8.3f} ms/push  {s/t:>12,.0f} rows/s  "
              f"({100*(t-base)/base:+.1f}% vs f32)", flush=True)


for i, s_ in enumerate(SIZES):
    bench_one(s_, check_parity=(i == 0))
