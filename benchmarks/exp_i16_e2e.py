"""E32 (round 5): int16 sample planes end-to-end — the DMA-bottleneck fix.

exp_stft_ablate/exp_stft_dma localized the packed kernel's cost: it is
DMA-bound on its operand leg (59% of kernel wall; the stage-1 dot is
1.7%), and int16 operands halve those bytes (1.95 -> 1.21 ms standalone
at 16,384 rows).  `i16_planes=True` keeps the wire dtype through carry,
framing, and kernel operands; the cast runs in-VMEM (VPU, overlapped)
with the exact 2^-15 scale folded into the Hann constant — BITWISE
equal to the f32 path fed the same int16 chunks (tests prove equality;
re-checked on hardware here).

Cases interleaved in ONE process (window drift ~8%):
  f32 — production defaults, int16 chunk converted at the edge
        (_chunk_f32: the round-4 wire path)
  i16 — i16_planes=True, same int16 chunk raw

Usage: python benchmarks/exp_i16_e2e.py [S ...]   (default 16384 10240)
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


def make(i16):
    return SpectrogramPipeline(
        BENCH_CONFIG, chunk_hops=1, store_ring=False, packed_output=True,
        precision_profile="fast", i16_planes=i16)


def bench_one(s, check_parity):
    scattered = (np.arange(s) % N_P).astype(np.int32)
    pcm16 = (rng.standard_normal((s, 800, 2)) * 3276).astype(np.int16)
    chunk = jnp.asarray(pcm16)
    pipes = {"f32": make(False), "i16": make(True)}

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
        print(f"S={s} parity i16 vs f32: max u8 diff = {d}", flush=True)
        assert d == 0, "i16 planes must be bitwise-invisible"

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
    print(f"S={s} RESULT: i16 vs f32 {100*(b-a)/a:+.1f}% ms "
          f"({a*1e3:.3f} -> {b*1e3:.3f}; {s/b:,.0f} rows/s)", flush=True)


for i, s_ in enumerate(SIZES):
    bench_one(s_, check_parity=(i == 0))
