"""E15: stream-blocked push — does splitting a big-S push into lax.map
sub-blocks recover the 10k-scale glue regime at 16k+?

Finding behind it (exp_glue_16k, round 4 late): the compiled HLO at
10,240 and 16,384 streams is instruction-identical EXCEPT memory-space
assignment — at 10,240 the framing pad_maximum fusion outputs and the
chunk slice_bitcast live in S(1) (scoped fast memory), so the operand
transpose copies read from fast memory; at 16,384 the same outputs fall
back to HBM (f32[16384,2048] = 128 MB exceeds the scoped budget) and
every glue copy pays HBM round trips — the measured 2.4x-per-1.6x
super-linear copy scaling that sets the per-stream capacity boundary.

Hypothesis: lax.map over nb stream blocks of S/nb keeps each block's
intermediates under the scoped-memory threshold, restoring the linear
regime at the cost of nb serialized kernel launches (same total work).

Usage: python benchmarks/exp_blocked_push.py [S] [nb ...]
Defaults: S=16384, nb 1 2.  Parity-checked vs the flat push.
Negative nb = UNROLLED blocks (straight-line calls on sliced halves, no
lax.map loop machinery — MSA sees disjoint live ranges it can scope).

RESULT (v5e, round 4 late; this harness, interleaved, parity bitwise
everywhere):
  lax.map nb=2, S=16384:  14.76 ms vs flat 13.19 — MEASURED NEGATIVE
    (+12%: while-loop machinery costs more than the regime recovery).
  UNROLLED blocks WIN from ~12k streams up, best block size 4096:
    S=16384: flat 13.19 | -2 12.73 | -4 (4096) 12.01 (+10%) | -8 12.25
    S=20480: flat 16.25 | -2 15.96 | -5 (4096) 15.30 — INSIDE the
             16.67 ms real-time budget (flat was the capacity boundary)
    S=12288: flat 9.74  | -3 (4096) 9.68 — wash (crossover point)
    S=10240: flat 8.06  | -2 8.61 — flat wins (scoped regime holds)
Productionized as SpectrogramPipeline(stream_blocks="auto"): 4096-stream
unrolled blocks on the k=1 fused streaming config at S >= 12,288.
"""
import sys
import pathlib
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np
import jax
import jax.numpy as jnp
import jax.tree_util as jtu

from spectrogram_tpu.config import BENCH_CONFIG
from spectrogram_tpu.models.spectrogram import SpectrogramPipeline

S = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
NBS = [int(a) for a in sys.argv[2:]] or [1, 2]
SCAN_LEN = 60

pipeline = SpectrogramPipeline(BENCH_CONFIG, chunk_hops=1, store_ring=False,
                               packed_output=True, precision_profile="fast")
rng = np.random.default_rng(0)
pcm = rng.standard_normal((S, pipeline.chunk_size, 2)).astype(np.float32) * 0.1
CHUNK = jnp.asarray(pcm)


def make_blocked(nb: int):
    """Blocked push: batched state leaves reshaped [nb, S/nb, ...] and the
    existing push body lax.map'd over the blocks (nb=1 = the flat push).
    Negative nb = |nb| UNROLLED straight-line block calls on sliced
    leaves, concatenated — no loop machinery, MSA sees disjoint live
    ranges."""
    unroll = nb < 0
    nb = abs(nb)
    bs = S // nb
    assert bs * nb == S

    def blocked(state, chunk):
        if nb == 1:
            return pipeline.push_impl(state, chunk)
        if unroll:
            leaves, treedef = jtu.tree_flatten(state)
            outs = []
            nstates = []
            for b in range(nb):
                ls = [l[b * bs:(b + 1) * bs]
                      if hasattr(l, "ndim") and l.ndim >= 1
                      and l.shape[0] == S else l
                      for l in leaves]
                nst, rgba = pipeline.push_impl(
                    jtu.tree_unflatten(treedef, ls),
                    chunk[b * bs:(b + 1) * bs])
                nstates.append(nst)
                outs.append(rgba)
            nleaves = [jtu.tree_flatten(n)[0] for n in nstates]
            ls = []
            for i, l in enumerate(leaves):
                if hasattr(l, "ndim") and l.ndim >= 1 and l.shape[0] == S:
                    ls.append(jnp.concatenate(
                        [nl[i] for nl in nleaves], axis=0))
                else:
                    ls.append(nleaves[0][i])
            return (jtu.tree_unflatten(treedef, ls),
                    jnp.concatenate(outs, axis=0))
        leaves, treedef = jtu.tree_flatten(state)
        bidx = [i for i, l in enumerate(leaves)
                if hasattr(l, "ndim") and l.ndim >= 1 and l.shape[0] == S]

        def body(args):
            bleaves, chunk_b = args
            ls = list(leaves)
            for i, bl in zip(bidx, bleaves):
                ls[i] = bl
            nst, rgba = pipeline.push_impl(
                jtu.tree_unflatten(treedef, ls), chunk_b)
            nl = jtu.tree_flatten(nst)[0]
            return ([nl[i] for i in bidx],
                    [nl[i] for i in range(len(nl)) if i not in bidx]), rgba

        bleaves = [leaves[i].reshape(nb, bs, *leaves[i].shape[1:])
                   for i in bidx]
        chunk_b = chunk.reshape(nb, bs, *chunk.shape[1:])
        (nb_leaves, ns_leaves), rgba_b = jax.lax.map(
            body, (bleaves, chunk_b))
        ls = list(leaves)
        for i, bl in zip(bidx, nb_leaves):
            ls[i] = bl.reshape(S, *bl.shape[2:])
        sidx = [i for i in range(len(ls)) if i not in bidx]
        for i, sl in zip(sidx, ns_leaves):
            ls[i] = sl[0]
        rgba = rgba_b.reshape(S, *rgba_b.shape[2:])
        return jtu.tree_unflatten(treedef, ls), rgba

    return blocked


def scan_bench(push_fn, label):
    def scan(state, chunk):
        def body(s, _):
            s, rgba = push_fn(s, chunk)
            return s, rgba[:, 0, 0]
        return jax.lax.scan(body, state, None, length=SCAN_LEN)

    scan_fn = jax.jit(scan, donate_argnums=0)
    state = pipeline.init_state(S)
    t0 = time.perf_counter()
    state, sums = scan_fn(state, CHUNK)
    np.asarray(sums)
    print(f"  [{label}] compile+warm {time.perf_counter()-t0:.1f}s",
          flush=True)
    best = 1e9
    for _ in range(3):
        state = pipeline.init_state(S)
        t0 = time.perf_counter()
        state, sums = scan_fn(state, CHUNK)
        np.asarray(sums)
        best = min(best, (time.perf_counter() - t0) / SCAN_LEN)
    return best


# parity first (one push, nb=2 vs flat)
st = pipeline.init_state(S)
_, r_flat = jax.jit(pipeline.push_impl)(st, CHUNK)
for nb in NBS:
    if nb == 1:
        continue
    _, r_b = jax.jit(make_blocked(nb))(pipeline.init_state(S), CHUNK)
    d = int(np.abs(np.asarray(r_flat).view(np.uint8).astype(int)
                   - np.asarray(r_b).view(np.uint8).astype(int)).max())
    print(f"parity nb={nb}: max u8 diff = {d}", flush=True)
    assert d == 0, "blocked push must be bitwise"

for nb in NBS:
    dt = scan_bench(make_blocked(nb), f"nb={nb}")
    print(f"S={S} nb={nb}: {dt*1e3:.3f} ms/push  "
          f"{S/dt:,.0f} rows/s", flush=True)
