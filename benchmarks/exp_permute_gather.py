"""E17: is a leading-axis row permutation copy-speed on device?

Prerequisite measurement for the palette-sort idea (round 4 late): for
SCATTERED per-stream palette layouts the colormap pays ~2 ms/push at
10,240 streams over the blockwise kernel (per-row LUT broadcasts).  A
stable argsort of the palette ids at set_palette time would make ANY
layout clustered — if (and only if) permuting the STFT magnitude planes
([S, half] f32 x2) into sorted order and the packed output ([S, H] i32)
back out runs at HBM copy speed, not gather-scalarization speed (the
perf ledger's 2D LUT gather scalarized; but that was per-ELEMENT
indices — this is whole-row takes along the sublane-major axis).

Measures, inside one jitted scan (relay-safe timing):
  baseline: y = x + 1           (pure stream: 1 read + 1 write)
  permute:  y = x[perm] + 1     (gather:      1 read + 1 write)
for the two operand shapes the palette-sort bridge would touch, plus the
composed round trip (sort + unsort).  Verdict: permute/baseline ratio
~1 => gathers ride the copy engines, build palette_sort; >> 1 => drop.

Usage: python benchmarks/exp_permute_gather.py [S] [scan_len]
"""
import sys
import pathlib
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np
import jax
import jax.numpy as jnp

S = int(sys.argv[1]) if len(sys.argv) > 1 else 10240
SCAN_LEN = int(sys.argv[2]) if len(sys.argv) > 2 else 100

rng = np.random.default_rng(0)
perm = jnp.asarray(rng.permutation(S).astype(np.int32))

CASES = {
    # the fused-chain handoff planes (half spectrum incl DC, f32)
    "mag[S,2049]f32": jnp.asarray(
        rng.standard_normal((S, 2049)).astype(np.float32)),
    # the packed RGBA8888 output (i32)
    "packed[S,1024]i32": jnp.asarray(
        rng.integers(0, 2**31 - 1, (S, 1024), dtype=np.int32)),
}


def bench(fn, x, label):
    def scan(x):
        def body(c, _):
            return fn(c), c[0, 0]
        return jax.lax.scan(body, x, None, length=SCAN_LEN)

    f = jax.jit(scan)
    t0 = time.time()
    y, sums = f(x)
    np.asarray(sums)
    compile_s = time.time() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        y, sums = f(x)
        np.asarray(sums)
        best = min(best, (time.perf_counter() - t0) / SCAN_LEN)
    gb = x.size * x.dtype.itemsize * 2 / 1e9  # read + write
    print(f"  {label:26s} {best*1e6:8.1f} us/iter  "
          f"{gb/best:7.1f} GB/s  (compile {compile_s:.1f}s)", flush=True)
    return best


for name, x in CASES.items():
    print(f"{name}:", flush=True)
    base = bench(lambda c: c + 1, x, "baseline c+1")
    tak = bench(lambda c: jnp.take(c, perm, axis=0) + 1, x, "take(perm)+1")
    # composed: sort then unsort (what one push would actually add,
    # relative to one baseline pass)
    inv = jnp.asarray(np.argsort(np.asarray(perm)).astype(np.int32))
    rt = bench(lambda c: jnp.take(jnp.take(c, perm, axis=0), inv, axis=0),
               x, "take(perm) o take(inv)")
    print(f"  ratio take/base = {tak/base:.2f}   roundtrip/base = "
          f"{rt/base:.2f}", flush=True)
