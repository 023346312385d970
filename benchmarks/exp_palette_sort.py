"""E18: end-to-end palette_sort A/B at serving scale.

The bridge (commit 'palette_sort: argsort scattered palette layouts')
permutes the mag planes into sorted order, runs the blockwise colormap,
and unpermutes the packed rows.  exp_permute_gather measured the raw
takes at 230-310 GB/s on v5e (NOT scalarized, ~half copy speed), which
prices the bridge at ~1.4 ms/push at 10,240 streams against the ~2 ms
per-row-vs-blockwise colormap gap.  This harness measures the real
pipeline:

  per_row   — scattered ids, palette_sort=False (today's scattered cost)
  sorted    — SAME scattered ids, palette_sort=True (the bridge)
  clustered — pre-clustered ids, blockwise auto (upper bound, no gathers)

All three parity-check bitwise against per_row (the sort must be
invisible in the bytes).

Usage: python benchmarks/exp_palette_sort.py [S] [scan_len]
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
SCAN_LEN = int(sys.argv[2]) if len(sys.argv) > 2 else 100

rng = np.random.default_rng(0)
pcm = rng.standard_normal((S, 800, 2)).astype(np.float32) * 0.1
CHUNK = jnp.asarray(pcm)


def make(**kw):
    return SpectrogramPipeline(
        BENCH_CONFIG, chunk_hops=1, store_ring=False, packed_output=True,
        precision_profile="fast", **kw)


N_P = 19
scattered = (np.arange(S) % N_P).astype(np.int32)
clustered = np.sort(scattered)

CASES = {
    # palette_sort defaults ON since the sorted-carry measurement — pin it
    # OFF for the per-row baseline (blockwise off alone no longer disables
    # the sort)
    "per_row": (make(blockwise_palettes=False, palette_sort=False),
                scattered),
    "sorted": (make(palette_sort=True), scattered),
    # sorted_out: rows leave the device in sorted order (host drain
    # reindexes via output_perm) — measures the serving-mode ceiling
    "sorted_out": (make(palette_sort=True, sorted_output=True), scattered),
    "clustered": (make(), clustered),
}
if S >= 12288:
    # At stream-blocked populations the auto policy blocks at 4096 streams,
    # where a 19-palette per-block sort fails the blockwise economics — so
    # "sorted" above silently measures the BLOCKED PER-ROW push.  The flat
    # variant keeps the global sort alive: does sort-without-blocking beat
    # block-without-sorting past the scoped-memory crossover?
    CASES["sorted_flat"] = (make(palette_sort=True, stream_blocks=0),
                            scattered)


def bench(p, ids, label):
    def scan(state, chunk):
        def body(s, _):
            s, rgba = p.push_impl(s, chunk)
            return s, rgba[:, 0, 0]
        return jax.lax.scan(body, state, None, length=SCAN_LEN)

    scan_fn = jax.jit(scan, donate_argnums=0)

    def init():
        return p.set_palette(p.init_state(S), ids)

    t0 = time.time()
    state, sums = scan_fn(init(), CHUNK)
    np.asarray(sums)
    print(f"  [{label}] compile+warm {time.time()-t0:.1f}s", flush=True)
    best = 1e9
    for _ in range(3):
        state = init()
        t0 = time.perf_counter()
        state, sums = scan_fn(state, CHUNK)
        np.asarray(sums)
        best = min(best, (time.perf_counter() - t0) / SCAN_LEN)
    return best


# parity first: one push each vs per_row (clustered compares after
# un-clustering is impossible — instead check sorted vs per_row only,
# both on the SAME scattered ids)
p0, ids0 = CASES["per_row"]
print("parity: per_row set_palette...", flush=True)
s0 = p0.set_palette(p0.init_state(S), ids0)
print("parity: per_row push compile...", flush=True)
_, r0 = jax.jit(p0.push_impl)(s0, CHUNK)
# at S >= 12,288 "sorted" is auto-blocked and refuses to sort — parity-
# check the case where the sort actually engages
ps, _ = CASES.get("sorted_flat", CASES["sorted"])
print("parity: sorted set_palette...", flush=True)
ss = ps.set_palette(ps.init_state(S), ids0)
assert ps._state_perm(ss) is not None, "sort did not engage"
print("parity: sorted push compile...", flush=True)
_, rs = jax.jit(ps.push_impl)(ss, CHUNK)
d = int(np.abs(np.asarray(r0).view(np.uint8).astype(int)
               - np.asarray(rs).view(np.uint8).astype(int)).max())
print(f"parity sorted vs per_row: max u8 diff = {d}", flush=True)
assert d == 0, "palette_sort must be bitwise"

for label, (p, ids) in CASES.items():
    dt = bench(p, ids, label)
    print(f"S={S} {label:9s}: {dt*1e3:.3f} ms/push  {S/dt:,.0f} rows/s",
          flush=True)
