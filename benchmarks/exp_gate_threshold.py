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

Usage: python benchmarks/exp_gate_threshold.py [S] [scan_len] [--tuned-ref]
Defaults: S=4096, scan 100, both geometries.

RESULTS (TPU v5e-1 via dev harness, 2026-08-18, scan 100, best of 3,
bitwise parity everywhere; sorted uniform fraction 43.8% in all cases):
  bench 2048/4096:         per_row 2.999 ms -> sorted25 2.941  (+2.0%)
  ref 2400/4800 (default): per_row 4.578 ms -> sorted25 4.170  (+9.8%)
  ref 2400/4800 (tuned 40x120 ts=64, --tuned-ref):
                           per_row 4.090 ms -> sorted25 4.459  (-8.3%)
VERDICT: a WASH — the three readings sit inside the documented ~10%
single-harness noise band with opposite signs at the SAME uniform
fraction (ts=128 for all three; the plan does not change the colormap
structure).  The sort's fixed per-push costs (chunk gather + packed-row
unpermute, ~0.2 ms at 4096 streams) cancel the 44%-fraction colormap
EV at headline populations.  `_BW_AUTO_FRAC` stays 0.5; the 16k+
populations get their win from the GLOBAL sort (exp_global_sort), where
the fraction is ~86% and the fixed costs amortize over 4x the rows.
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

_args = [a for a in sys.argv[1:] if not a.startswith("--")]
S = int(_args[0]) if _args else 4096
SCAN_LEN = int(_args[1]) if len(_args) > 1 else 100
N_P = 19

rng = np.random.default_rng(0)
scattered = (np.arange(S) % N_P).astype(np.int32)

GEOMETRIES = {
    "bench": BENCH_CONFIG,
    "ref2400": SpectrogramConfig(sample_rate=48000.0, window_period=0.05),
}


def bench_geometry(name, cfg, plan=None, block_rows=None):
    def make(sort, frac=None):
        p = SpectrogramPipeline(
            cfg, chunk_hops=1, store_ring=False, packed_output=True,
            precision_profile="fast", palette_sort=sort)
        if plan is not None:
            p.override_plan(plan, block_rows)
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


if "--tuned-ref" in sys.argv:
    # reference-native geometry with the TUNED 40x120 ts=64 plan (the
    # BASELINE.md tuned-table configuration) — the publication-grade A/B
    from spectrogram_tpu.ops.mxu_fft import FftPlan

    cfg = GEOMETRIES["ref2400"]
    bench_geometry("ref2400-tuned", cfg,
                   plan=FftPlan(n=4800, n1=40, n2=120, m=2400 // 40),
                   block_rows=64)
else:
    for name, cfg in GEOMETRIES.items():
        bench_geometry(name, cfg)
