"""Packed-complex STFT, END-TO-END interleaved A/B on the production push.

The standalone kernel A/B (exp_stft_packed) measured -16.0%/-12.4% at
4096/16,384 rows, and the official 4096-stream bench improved 2.81 ->
2.659 ms/push — but the first 16,384-stream official run after the switch
read 11.945 ms vs the round-4-final record 11.04, an apparent +8%
REGRESSION... measured in a degraded-relay window (two sibling bench runs
timed out compiling in the same sweep).  Cross-run official-bench deltas
under ~10% are coin flips (CLAUDE.md, repeated lesson); this harness
settles it the right way: BOTH pipelines compiled in ONE process, scans
alternated A/B/A/B, same state layout as the official bench (scattered
19-palette set_palette -> global palette sort at 16k).

Usage: python benchmarks/exp_packed_e2e.py [S ...]   (default 16384 10240)

RESULT (v5e, 2026-08-19, SCAN_LEN=60, 3 interleaved reps, parity max
1 u8 rgba / carry bitwise at both sizes):

  S=16384: split 11.955 | packed 11.312 ms/push  -> packed -5.4%
  S=10240: split  7.214 | packed  6.908 ms/push  -> packed -4.2%

The 11.945 official reading WAS window noise: split-real itself measured
11.955 in this same window (the round-4-final record window had split at
11.04 — the whole machine drifts ~8% between windows, and two sibling
bench runs timed out compiling in the degraded one).  The end-to-end
deltas are exactly the kernel-level wins (-12.4%/-16%) scaled by the
STFT's share of the push (~37-39%).  Packed stays the default.
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
SCAN_LEN = 60
REPS = 3


def build(packed: bool, s: int):
    p = SpectrogramPipeline(
        BENCH_CONFIG, chunk_hops=1, store_ring=False, packed_output=True,
        precision_profile="fast", stft_packed=packed,
    )
    ids = (np.arange(s, dtype=np.int32) % len(p.schemes))

    def init():
        return p.set_palette(p.init_state(s), ids)

    def scan(state, chunk):
        def body(st, _):
            st, rgba = p.push_impl(st, chunk)
            return st, rgba[:, 0, 0]
        return jax.lax.scan(body, state, None, length=SCAN_LEN)

    return p, init, jax.jit(scan, donate_argnums=0)


def main():
    rng = np.random.default_rng(0)
    for s in SIZES:
        chunk = None
        runs = {}
        states = {}
        pipes = {}
        for name, packed in (("split", False), ("packed", True)):
            p, init, scan_fn = build(packed, s)
            if chunk is None:
                pcm = rng.standard_normal(
                    (s, p.chunk_size, 2)).astype(np.float32) * 0.1
                chunk = jnp.asarray(pcm)
            pipes[name] = (p, init, scan_fn)
        # parity first (single push, un-donated)
        outs = {}
        for name, (p, init, _) in pipes.items():
            st, rgba = p.push_impl(init(), chunk)
            outs[name] = (np.asarray(rgba), np.asarray(st.carry))
        dr = np.abs(outs["split"][0].view(np.uint8).astype(np.int16)
                    - outs["packed"][0].view(np.uint8).astype(np.int16))
        dc = np.abs(outs["split"][1] - outs["packed"][1]).max()
        print(f"S={s}: parity rgba max u8 diff {dr.max()}  carry {dc:.1e}",
              flush=True)
        # warm both scans
        for name, (p, init, scan_fn) in pipes.items():
            st, sums = scan_fn(init(), chunk)
            np.asarray(sums)
            runs[name] = []
        for rep in range(REPS):
            for name, (p, init, scan_fn) in pipes.items():
                st = init()
                t0 = time.perf_counter()
                st, sums = scan_fn(st, chunk)
                np.asarray(sums)
                runs[name].append((time.perf_counter() - t0) / SCAN_LEN * 1e3)
        for name in ("split", "packed"):
            best = min(runs[name])
            print(f"S={s}: {name:6s} {best:.3f} ms/push  "
                  f"(reps {['%.3f' % r for r in runs[name]]})", flush=True)


if __name__ == "__main__":
    main()
