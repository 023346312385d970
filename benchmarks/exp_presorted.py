"""E24 (round 5): host-sorted drain — delete the device-side chunk gather.

In carry-sort mode the state is at rest in sorted stream order, yet every
push gathers the incoming chunk on device (`_push_global_sorted` /
`_push_one_block`: jnp.take(chunk_pl, perm)).  The host drain can deliver
the chunk already sorted for free — the RingBank pop scatters per stream
anyway, so permuting each stream's DESTINATION row (`pop_matrix_*`'s dest
parameter, fed by `pipeline.input_dest(state)`) costs nothing — and the
pipeline's `presorted_input=True` then skips the gather entirely.
Reference anchor: stream order at the transport boundary is a host-side
free choice (audio_transform.rs:38-39).

Cases (scattered 19-palette layout, the official-bench headline config):
  gather    — presorted_input=False (the device gather, round-4 default)
  presorted — presorted_input=True, chunk pre-permuted outside the timed
              region (the exact bytes the host-sorted drain delivers)

Interleaved in ONE process (gather/presorted alternating per round —
official-bench windows drift ~8%, CLAUDE.md); tiny-slice readback;
bitwise parity checked at the first population.

Usage: python benchmarks/exp_presorted.py [S ...]   (default 20480 24576)

RESULTS (v5e-1, 2026-08-20, interleaved, bitwise parity on hardware at
20,480): S=20,480 gather 11.497 -> presorted 10.481 ms/push (-8.8%,
1,954,026 rows/s); S=24,576 13.958 -> 12.582 (-9.9%, 1,953,323).
Official-bench follow-ups: 10,240 = 2,014,868 rows/s @ 5.082 (3.36x);
per-stream capacity re-bracketed ~32k (BASELINE.md round-5 section).
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

SIZES = [int(a) for a in sys.argv[1:]] or [20480, 24576]
SCAN_LEN = 50
ROUNDS = 3
N_P = 19

rng = np.random.default_rng(0)


def make(presorted):
    return SpectrogramPipeline(
        BENCH_CONFIG, chunk_hops=1, store_ring=False, packed_output=True,
        precision_profile="fast", presorted_input=presorted)


def bench_one(s, check_parity):
    scattered = (np.arange(s) % N_P).astype(np.int32)
    pcm = rng.standard_normal((s, 800, 2)).astype(np.float32) * 0.1
    pipes = {"gather": make(False), "presorted": make(True)}
    state0 = pipes["gather"].set_palette(
        pipes["gather"].init_state(s), scattered)
    assert SpectrogramPipeline._tables_perm_global(state0.tables), (
        "expected the global sort at this population")
    perm = pipes["presorted"].input_perm(state0)
    assert perm is not None
    chunks = {
        "gather": jnp.asarray(pcm),
        "presorted": jnp.asarray(pcm[perm]),
    }
    del state0

    if check_parity:
        outs = {}
        for n, p in pipes.items():
            st = p.set_palette(p.init_state(s), scattered)
            t0 = time.perf_counter()
            _, r = jax.jit(p.push_impl)(st, chunks[n])
            outs[n] = np.asarray(r)
            print(f"  parity push [{n}] {time.perf_counter()-t0:.1f}s",
                  flush=True)
        d = int(np.abs(outs["presorted"].view(np.uint8).astype(int)
                       - outs["gather"].view(np.uint8).astype(int)).max())
        print(f"S={s} parity presorted vs gather: max u8 diff = {d}",
              flush=True)
        assert d == 0, "the host-sorted drain must be bitwise-invisible"

    scan_fns, states = {}, {}
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
    for n in pipes:
        best = min(times[n])
        print(f"S={s} {n}: best {best*1e3:.3f} ms/push  "
              f"{s/best:,.0f} rows/s", flush=True)
    g, ps = min(times["gather"]), min(times["presorted"])
    print(f"S={s} RESULT: presorted vs gather {100*(ps-g)/g:+.1f}% ms "
          f"({g*1e3:.3f} -> {ps*1e3:.3f})", flush=True)


for i, s_ in enumerate(SIZES):
    bench_one(s_, check_parity=(i == 0))
