"""E20: blockwise economics threshold at the 4096-stream headline.

The blockwise-auto gate engages at >= 50% single-palette colormap blocks
(`_BW_AUTO_FRAC`), a wide margin over the measured ~12% raw breakeven
(exp_colormap_blockwise: -29% uniform blocks, +4% mixed).  A sorted
19-palette scattered layout at 4096 streams lands at 43.8% uniform
(215-stream runs vs ts=128) — refused by the default gate at BOTH the
bench geometry and the reference-native 2400/4800, so the headline and
the reference-workload rows pay full per-row colormap rates.  Expected
value at 43.8%: ~ +10% on the colormap stage.  This harness measures the
real pipelines with the gate lowered to 0.25 (per-instance override)
against the per-row baseline, bitwise-parity-checked.

Usage: python benchmarks/exp_gate_threshold.py [S] [scan_len]
Defaults: S=4096, scan 100, both geometries.
"""
import sys
import pathlib
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np
import jax
import jax.numpy as jnp

from spectrogram_tpu.config import BENCH_CONFIG, SpectrogramConfig
from spectrogram_tpu.models.spectrogram import SpectrogramPipeline

S = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
SCAN_LEN = int(sys.argv[2]) if len(sys.argv) > 2 else 100
N_P = 19

rng = np.random.default_rng(0)
scattered = (np.arange(S) % N_P).astype(np.int32)

GEOMETRIES = {
    "bench": BENCH_CONFIG,
    "ref2400": SpectrogramConfig(sample_rate=48000.0, window_period=0.05),
}


def bench_geometry(name, cfg):
    def make(sort, frac=None):
        p = SpectrogramPipeline(
            cfg, chunk_hops=1, store_ring=False, packed_output=True,
            precision_profile="fast", palette_sort=sort)
        if frac is not None:
            p._BW_AUTO_FRAC = frac
        return p

    pipes = {"per_row": make(False), "sorted25": make(True, 0.25)}
    chunk = jnp.asarray(
        rng.standard_normal(
            (S, pipes["per_row"].chunk_size, 2)
        ).astype(np.float32) * 0.1)
    states = {n: p.set_palette(p.init_state(S), scattered)
              for n, p in pipes.items()}
    engaged = pipes["sorted25"]._state_perm(states["sorted25"]) is not None
    print(f"[{name}] sorted25 engaged = {engaged}", flush=True)
    assert engaged

    outs = {}
    for n, p in pipes.items():
        _, r = jax.jit(p.push_impl)(states[n], chunk)
        outs[n] = np.asarray(r)
    d = int(np.abs(outs["sorted25"].view(np.uint8).astype(int)
                   - outs["per_row"].view(np.uint8).astype(int)).max())
    print(f"[{name}] parity: max u8 diff = {d}", flush=True)
    assert d == 0

    for n, p in pipes.items():
        def scan(state, ch):
            def body(st, _):
                st, rgba = p.push_impl(st, ch)
                return st, rgba[:, 0, 0]
            return jax.lax.scan(body, state, None, length=SCAN_LEN)

        scan_fn = jax.jit(scan, donate_argnums=0)
        st = p.set_palette(p.init_state(S), scattered)
        t0 = time.perf_counter()
        st, sums = scan_fn(st, chunk)
        np.asarray(sums)
        print(f"  [{name}/{n}] compile+warm {time.perf_counter()-t0:.1f}s",
              flush=True)
        best = 1e9
        for _ in range(3):
            st = p.set_palette(p.init_state(S), scattered)
            t0 = time.perf_counter()
            st, sums = scan_fn(st, chunk)
            np.asarray(sums)
            best = min(best, (time.perf_counter() - t0) / SCAN_LEN)
        print(f"[{name}] {n}: {best*1e3:.3f} ms/push  {S/best:,.0f} rows/s",
              flush=True)


for name, cfg in GEOMETRIES.items():
    bench_geometry(name, cfg)
