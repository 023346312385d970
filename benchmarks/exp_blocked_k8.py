"""E16: does stream blocking help the k=8 display mode at 10k+ streams?

The round-4-late stream-blocked push (exp_blocked_push, production
`stream_blocks="auto"`) recovers the S(1) scoped-memory regime for the
k=1 fused streaming config at S >= 12,288.  The k=8 all-windows display
mode has ~8x the per-push intermediate footprint per stream (rows and
framing buffers scale with chunk_hops), so if the regime boundary is a
bytes threshold it should bind at ~S/8 — but the k=8 path also builds a
[S, W + 7H] carry+chunk buffer whose concat may behave differently.
This harness measures the production pipeline flat vs explicit
stream_blocks at display-mode populations, parity-checked bitwise.

Usage: python benchmarks/exp_blocked_k8.py [S] [bs ...]
Defaults: S=10240, bs 0 4096 (0 = flat).

RESULT (v5e, S=10,240): first measurement +2.9% for bs=4096 (BASELINE.md
display-mode row); independent replication flat 41.279 ms vs bs=4096
39.808 (+3.7%) — neutral-to-mildly-positive, inside the noise band, so
`stream_blocks="auto"` stays k=1-only.
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

S = int(sys.argv[1]) if len(sys.argv) > 1 else 10240
BSS = [int(a) for a in sys.argv[2:]] or [0, 4096]
K = 8
SCAN_LEN = 30

rng = np.random.default_rng(0)


def make(bs):
    return SpectrogramPipeline(
        BENCH_CONFIG, chunk_hops=K, store_ring=False, packed_output=True,
        precision_profile="fast", stream_blocks=bs)


pipe0 = make(BSS[0])
pcm = rng.standard_normal((S, pipe0.chunk_size, 2)).astype(np.float32) * 0.1
CHUNK = jnp.asarray(pcm)


def scan_bench(p, label):
    def scan(state, chunk):
        def body(s, _):
            s, rgba = p.push_impl(s, chunk)
            return s, rgba[:, 0, 0]
        return jax.lax.scan(body, state, None, length=SCAN_LEN)

    scan_fn = jax.jit(scan, donate_argnums=0)
    state = p.init_state(S)
    t0 = time.perf_counter()
    state, sums = scan_fn(state, CHUNK)
    np.asarray(sums)
    print(f"  [{label}] compile+warm {time.perf_counter()-t0:.1f}s",
          flush=True)
    best = 1e9
    for _ in range(3):
        state = p.init_state(S)
        t0 = time.perf_counter()
        state, sums = scan_fn(state, CHUNK)
        np.asarray(sums)
        best = min(best, (time.perf_counter() - t0) / SCAN_LEN)
    return best


pipes = {bs: make(bs) for bs in BSS}
# parity: one push, every bs vs the first
st = pipe0.init_state(S)
_, r0 = jax.jit(pipe0.push_impl)(st, CHUNK)
for bs, p in pipes.items():
    if bs == BSS[0]:
        continue
    _, rb = jax.jit(p.push_impl)(p.init_state(S), CHUNK)
    d = int(np.abs(np.asarray(r0).view(np.uint8).astype(int)
                   - np.asarray(rb).view(np.uint8).astype(int)).max())
    print(f"parity bs={bs}: max u8 diff = {d}", flush=True)
    assert d == 0, "blocked k=8 push must be bitwise"

for bs, p in pipes.items():
    dt = scan_bench(p, f"bs={bs}")
    print(f"S={S} k={K} bs={bs}: {dt*1e3:.3f} ms/push  "
          f"{S*K/dt:,.0f} rows/s", flush=True)
