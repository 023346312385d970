"""E19: GLOBAL palette sort at the stream-blocked populations.

The block-relative palette_sort (exp_palette_sort, +13% at 10,240
scattered) silently DISENGAGES at S >= 12,288: stream_blocks="auto"
slices 4096-stream blocks, the per-block sort shrinks the 19-palette
runs to ~215 streams against the ts=128 colormap block, and the
blockwise economics gate refuses — so the priciest populations paid
full per-row colormap rates.  The GLOBAL sort (length-4 tables tuple)
sorts the whole state once at set_palette; `_push_core` permutes the
chunk above the block slicing and unpermutes the packed rows after
reassembly, so every 4096-block sees contiguous ~860-stream palette
runs and takes the blockwise kernel.

Cases (scattered 19-palette layout, the official-bench headline
configuration):
  per_row — palette_sort=False (what S >= 12,288 paid before this)
  global  — palette_sort=True (the global sort auto-engages)

Parity-checked bitwise (the sort must be invisible in the bytes).

Usage: python benchmarks/exp_global_sort.py [S ...]
Defaults: S in (16384, 20480).

RESULTS (TPU v5e-1 via dev harness, 2026-08-18, scan 30, best of 3,
bitwise parity both sizes):
  S=16,384: per_row 13.563 ms (1,208,025 rows/s)
            global  11.785 ms (1,390,293 rows/s)   -13.1% ms (+15.1%)
  S=20,480: per_row 16.600 ms (1,233,718 rows/s)
            global  14.566 ms (1,406,038 rows/s)   -12.3% ms (+14.0%)
Official bench.py numbers at these populations are recorded in
BASELINE.md's batch-curve table (this harness's per_row baselines read
~5% worse than the official scan-150 harness — same relay-noise class).
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

SIZES = [int(a) for a in sys.argv[1:]] or [16384, 20480]
SCAN_LEN = 30
N_P = 19

rng = np.random.default_rng(0)


def make(sort):
    return SpectrogramPipeline(
        BENCH_CONFIG, chunk_hops=1, store_ring=False, packed_output=True,
        precision_profile="fast", palette_sort=sort)


def bench_one(s):
    scattered = (np.arange(s) % N_P).astype(np.int32)
    chunk = jnp.asarray(
        rng.standard_normal((s, 800, 2)).astype(np.float32) * 0.1)
    pipes = {"per_row": make(False), "global": make(True)}
    states = {
        n: p.set_palette(p.init_state(s), scattered)
        for n, p in pipes.items()
    }
    gmode = SpectrogramPipeline._tables_perm_global(states["global"].tables)
    print(f"S={s}: global mode engaged = {gmode}", flush=True)
    assert gmode, "expected the global sort to engage at this population"

    # parity: one push, bitwise
    outs = {}
    for n, p in pipes.items():
        _, r = jax.jit(p.push_impl)(states[n], chunk)
        outs[n] = np.asarray(r)
    d = int(np.abs(outs["global"].view(np.uint8).astype(int)
                   - outs["per_row"].view(np.uint8).astype(int)).max())
    print(f"S={s} parity global vs per_row: max u8 diff = {d}", flush=True)
    assert d == 0, "global sort must be bitwise-invisible"

    for n, p in pipes.items():
        def scan(state, ch):
            def body(st, _):
                st, rgba = p.push_impl(st, ch)
                return st, rgba[:, 0, 0]
            return jax.lax.scan(body, state, None, length=SCAN_LEN)

        scan_fn = jax.jit(scan, donate_argnums=0)
        st = p.set_palette(p.init_state(s), scattered)
        t0 = time.perf_counter()
        st, sums = scan_fn(st, chunk)
        np.asarray(sums)
        print(f"  [{n}] compile+warm {time.perf_counter()-t0:.1f}s",
              flush=True)
        best = 1e9
        for _ in range(3):
            st = p.set_palette(p.init_state(s), scattered)
            t0 = time.perf_counter()
            st, sums = scan_fn(st, chunk)
            np.asarray(sums)
            best = min(best, (time.perf_counter() - t0) / SCAN_LEN)
        print(f"S={s} {n}: {best*1e3:.3f} ms/push  {s/best:,.0f} rows/s",
              flush=True)


for s_ in SIZES:
    bench_one(s_)
