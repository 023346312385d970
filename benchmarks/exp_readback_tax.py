"""E23: quantify the harness readback tax in the official bench timing.

Hypothesis (from the 24,576-stream profile, /tmp/prof24k): the official
bench's forced materialization `np.asarray(sums)` pulls the FULL
[scan_len, S] i32 checksum stack through the relay's ~53 MB/s D2H leg
INSIDE the timed region, so the published ms/push carries a harness
transfer term that grows with S x scan_len:

    tax/push ~= (scan_len*S*4 / 52.7e3 ms + 12.4 ms) / scan_len

  - 4,096 streams, scan 150:  ~0.39 ms/push  (of the 2.659 published!)
  - 24,576 streams, scan 60:  ~2.07 ms/push  (of 16.38)

which also explains why the packed-STFT e2e win (-5.4% device at 16k)
read as 0% at the 24,576 capacity point: a constant ~2 ms harness term
dilutes device-side deltas near the boundary.

The fix candidate: force completion via a TINY dependent slice —
`np.asarray(sums[-1, :8])` — which still blocks on the WHOLE scan
program (the slice depends on its output; the scan is one XLA program,
no partial completion exists) and still materializes every per-push
checksum ON DEVICE, but moves 32 bytes over the relay instead of
megabytes.  Device work is bit-identical; only the harness D2H leg
shrinks.

This harness A/Bs full-readback vs tiny-slice in ONE process,
interleaved (same executable, same buffers), at the headline and
boundary populations.

RESULT (TPU v5e-1 via dev relay, 2026-08-19, 4 interleaved rounds,
best-of per arm, same executable and buffers):

  S= 4096 scan=150: full 3.133 ms/push | tiny 2.451 | delta 0.682
  S=24576 scan= 60: full 17.494       | tiny 13.895 | delta 3.599

Hypothesis CONFIRMED — the delta even exceeds the linear-fit
prediction (0.39 / 2.07: the D2H leg is slower than the bench_readback
fit in this window), and the tiny arm at 24,576 (13.90) sits right on
the profiler's device total (13.0 + dispatch/sync residue ~0.9).  The
published official-bench numbers carried a pure harness-transfer term:
~0.4-0.7 ms/push at the 4096 headline, ~2-3.6 ms/push at the capacity
boundary — which is also why the packed-STFT device win read as 0% at
24,576.  bench.py and exp_capacity_r4 now force completion with the
tiny dependent slice; device work and forced-completion semantics are
unchanged.
"""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np
import jax
import jax.numpy as jnp

from spectrogram_tpu.config import BENCH_CONFIG
from spectrogram_tpu.models.spectrogram import SpectrogramPipeline

CASES = [(4096, 150), (24576, 60)]
ROUNDS = 4
rng = np.random.default_rng(0)

for s, scan_len in CASES:
    p = SpectrogramPipeline(BENCH_CONFIG, chunk_hops=1, store_ring=False,
                            packed_output=True, precision_profile="fast")
    chunk = jnp.asarray(
        rng.standard_normal((s, p.chunk_size, 2)).astype(np.float32) * 0.1)

    def scan(state, c):
        def body(st, _):
            st, rgba = p.push_impl(st, c)
            return st, rgba[:, 0, 0]
        return jax.lax.scan(body, state, None, length=scan_len)

    scan_fn = jax.jit(scan, donate_argnums=0)

    def fresh():
        st = p.init_state(s)
        return p.set_palette(st, (np.arange(s, dtype=np.int32)
                                  % len(p.schemes)))

    t0 = time.perf_counter()
    st, sums = scan_fn(fresh(), chunk)
    np.asarray(sums)
    del st, sums
    print(f"[S={s}] compile+warm {time.perf_counter()-t0:.1f}s", flush=True)

    best = {"full": 1e9, "tiny": 1e9}
    for r in range(ROUNDS):
        for arm in ("full", "tiny"):
            st = fresh()
            t0 = time.perf_counter()
            st, sums = scan_fn(st, chunk)
            if arm == "full":
                np.asarray(sums)          # official-bench materialization
            else:
                np.asarray(sums[-1, :8])  # tiny dependent slice: 32 bytes
            best[arm] = min(best[arm], (time.perf_counter() - t0) / scan_len)
            del st, sums
    d = best["full"] - best["tiny"]
    print(f"S={s:>6} scan={scan_len}: full {best['full']*1e3:.3f} ms/push"
          f" | tiny {best['tiny']*1e3:.3f} ms/push | delta {d*1e3:.3f}",
          flush=True)
    del scan_fn, chunk
