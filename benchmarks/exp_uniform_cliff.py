"""E17: the uniform-palette 26,624 cliff — block structure or bytes?

Round-4-late capacity bracketing (official bench, stream-blocked code,
uniform palette): 25,600 streams 14.89 ms/push INSIDE budget, 26,624
17.53 OVER — a 2.6 ms step for +1,024 streams (+4%), far steeper than
the regime slope anywhere else on the curve.  Under the auto policy the
two populations compile to different block structures (6x4096 + 1,024
tail vs 6x4096 + 2,048 tail), so the step could be:

  (a) block-structure/tail-shape: the 2,048-stream tail sub-push or the
      7-block reassembly concat hits a bad compile — then EVEN blockings
      of 26,624 (8x3,328 or 13x2,048) should erase the step;
  (b) a global-bytes regime (allocator/HBM layout of the [S, ...] state
      leaves and reassembly concat outputs) — then every blocking of
      26,624 pays it and only shrinking S helps.

This harness scans the production pipeline (explicit stream_blocks) at
the bracketing populations x block structures, uniform palette, same
scan methodology as the official bench.

Usage: python benchmarks/exp_uniform_cliff.py [S:bs ...]
Default matrix: 25600:4096 26624:4096 26624:3328 26624:2048 26624:0

RESULT (v5e, round 4 late; this harness, one process, uniform palette):
  S=25600 bs=4096 (7 blocks, tail 1024): 15.50 ms  1,651,913 rows/s
  S=26624 bs=4096 (7 blocks, tail 2048): 16.29     1,634,707
  S=26624 bs=3328 (8 even):              16.13     1,650,449
  S=26624 bs=2048 (13 even):             15.97     1,667,184
  S=26624 flat:                          17.76     1,498,734
Verdict: NEITHER (a) nor (b) — the "cliff" itself does not reproduce.
The 25,600 -> 26,624 slope inside one interleaved harness is +0.8 ms
(linear); the official-bench pair that looked like a 2.6 ms step
(14.89 vs 17.53) was inter-run relay spread, confirmed by an official
bench re-run at 26,624 = 15.94 ms INSIDE budget.  Even block structures
are within 2% of the production 4096+tail policy (noise band — no
change made); flat loses 8%, re-confirming stream blocking at this
scale.  Follow-up official runs bracket the true uniform boundary at
~27.6-28k (27,648 @ 16.59 inside, 28,672 @ 17.14 over).
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

DEFAULT = ["25600:4096", "26624:4096", "26624:3328", "26624:2048",
           "26624:0"]
CASES = [(int(a.split(":")[0]), int(a.split(":")[1]))
         for a in (sys.argv[1:] or DEFAULT)]
SCAN_LEN = 60

rng = np.random.default_rng(0)


def bench(s, bs):
    p = SpectrogramPipeline(BENCH_CONFIG, chunk_hops=1, store_ring=False,
                            packed_output=True, precision_profile="fast",
                            stream_blocks=bs)
    chunk = jnp.asarray(
        rng.standard_normal((s, p.chunk_size, 2)).astype(np.float32) * 0.1)

    def scan(state, c):
        def body(st, _):
            st, rgba = p.push_impl(st, c)
            return st, rgba[:, 0, 0]
        return jax.lax.scan(body, state, None, length=SCAN_LEN)

    scan_fn = jax.jit(scan, donate_argnums=0)
    state = p.set_palette(p.init_state(s), 1)  # scalar -> uniform kernel
    t0 = time.perf_counter()
    state, sums = scan_fn(state, chunk)
    np.asarray(sums)
    print(f"  [S={s} bs={bs}] compile+warm {time.perf_counter()-t0:.1f}s",
          flush=True)
    best = 1e9
    for _ in range(3):
        state = p.set_palette(p.init_state(s), 1)
        t0 = time.perf_counter()
        state, sums = scan_fn(state, chunk)
        np.asarray(sums)
        best = min(best, (time.perf_counter() - t0) / SCAN_LEN)
    nb = -(-s // bs) if 0 < bs < s else 1
    tail = s - (nb - 1) * bs if nb > 1 else s
    print(f"S={s} bs={bs} ({nb} blocks, tail {tail}): "
          f"{best*1e3:.3f} ms/push  {s/best:,.0f} rows/s", flush=True)


for s, bs in CASES:
    bench(s, bs)
