"""E30 (round 5): flat-M stage-1 dot — the ablation-guided utilization fix.

exp_stft_ablate localized the packed kernel's utilization gap: stage 1
takes 59-62% of kernel wall against a 44.4% pass-model share while
stage 2 (same pass count) takes 27-30% — the 3D [ts, n1, 2m] x
[2m, 2n2o] dot lowers as n1-row-tall sub-matmuls that underfill the
128-row MXU.  `s1_flat=True` collapses [ts, n1] into one flat M
([ts*n1, 2m] x [2m, 2n2o], fully tiled) — bitwise (the per-row
contraction, K order included, is unchanged; interpret-mode equality
proven on the 32x128 and 40x120 plans).

Cases, interleaved in one process, parity re-checked on hardware:
  base — production packed kernel (s1_flat=False)
  flat — s1_flat=True
  s1_base / s1_flat — the stage-1-only ablation prefixes, to confirm
  the win lands where the ablation said the loss was.

Usage: python benchmarks/exp_stft_s1flat.py [ROWS ...] (default 16384 4096)
"""
import os
import sys
import pathlib
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np
import jax
import jax.numpy as jnp

from spectrogram_tpu.config import BENCH_CONFIG
from spectrogram_tpu.ops.pallas import stft_kernel as sk

SIZES = [int(a) for a in sys.argv[1:]] or [16384, 4096]
SCAN_LEN = int(os.environ.get("S1FLAT_SCAN", "150"))
ROUNDS = 3
W = BENCH_CONFIG.window_size

CASES = {
    "base": dict(s1_flat=False),
    "flat": dict(s1_flat=True),
    "s1_base": dict(s1_flat=False, ablate_stage="s1"),
    "s1_flat": dict(s1_flat=True, ablate_stage="s1"),
}


def bench_rows(rows, check_parity):
    rng = np.random.default_rng(0)
    left = jnp.asarray(rng.standard_normal((rows, W)).astype(np.float32) * 0.1)
    right = jnp.asarray(rng.standard_normal((rows, W)).astype(np.float32) * 0.1)

    if check_parity:
        outs = {}
        for name in ("base", "flat"):
            ml, mr = sk.stft_mag_fused2(
                left, right, BENCH_CONFIG, packed=True, unpack_split=3,
                **CASES[name])
            outs[name] = (np.asarray(ml), np.asarray(mr))
        eq = all((a == b).all() for a, b in zip(outs["base"], outs["flat"]))
        print(f"ROWS={rows} hardware parity base vs flat: "
              f"{'BITWISE' if eq else 'DIFFERS'}", flush=True)
        assert eq

    scans = {}
    for name, kw in CASES.items():
        def scan(l, r, kw=kw):
            def body(c, _):
                ml, mr = sk.stft_mag_fused2(
                    c, r, BENCH_CONFIG, packed=True, unpack_split=3, **kw)
                return c + ml[:1, :1] * 1e-20, ml[0, 0]
            return jax.lax.scan(body, l, None, length=SCAN_LEN)
        scans[name] = jax.jit(scan)
        t0 = time.perf_counter()
        _, outs_ = scans[name](left, right)
        np.asarray(outs_[:4])
        print(f"  [{name}] compile+warm {time.perf_counter()-t0:.1f}s",
              flush=True)

    times = {n: np.inf for n in CASES}
    for r_ in range(ROUNDS):
        for name in CASES:
            t0 = time.perf_counter()
            _, outs_ = scans[name](left, right)
            np.asarray(outs_[:4])
            dt = (time.perf_counter() - t0) / SCAN_LEN
            times[name] = min(times[name], dt)
            print(f"  round {r_} [{name}] {dt*1e3:.3f} ms", flush=True)
    b, f = times["base"], times["flat"]
    print(f"ROWS={rows} RESULT: full {b*1e3:.3f} -> {f*1e3:.3f} ms "
          f"({100*(f-b)/b:+.1f}%); s1-only {times['s1_base']*1e3:.3f} -> "
          f"{times['s1_flat']*1e3:.3f}", flush=True)


for i, rows in enumerate(SIZES):
    bench_rows(rows, check_parity=(i == 0))
