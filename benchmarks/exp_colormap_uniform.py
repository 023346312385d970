"""Round-4: uniform-palette (SMEM-scalar table) colormap vs per-row vs
static — the runtime-switchable single-palette mode (VERDICT r4 item 3's
remaining gap: per-row LUT broadcasts ~0.37 ms at 4k rows)."""
import sys, pathlib, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np, jax, jax.numpy as jnp
from spectrogram_tpu.config import BENCH_CONFIG as CFG
from spectrogram_tpu.ops import colormap as cmap_ops
from spectrogram_tpu.ops.pallas import colormap_kernel as ck

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
MAT = cmap_ops.resample_matrix_full(CFG).T
B, H = MAT.shape
rng = np.random.default_rng(0)
LEFT = jnp.asarray(rng.standard_normal((N, B)).astype(np.float32) ** 2 * 0.01)
RIGHT = jnp.asarray(rng.standard_normal((N, B)).astype(np.float32) ** 2 * 0.01)
ALLTAB = ck.builtin_color_tables(32)
PER_ROW = jnp.asarray(np.broadcast_to(ALLTAB[1], (N, 128)).copy())
UNIFORM = jnp.asarray(ALLTAB[1][None])                 # [1, R*4]
STATIC = tuple(float(v) for v in ALLTAB[1])
MATJ = jnp.asarray(MAT)
SEGS = ck.band_segments(MAT)


def scan_bench(fn, iters=100):
    @jax.jit
    def runb(x):
        def body(c, _):
            o = fn(c, RIGHT)
            return c + o[:1, :1].astype(jnp.float32) * 1e-20, o[0, 0]
        return jax.lax.scan(body, x, None, length=iters)
    c, outs = runb(LEFT); np.asarray(outs)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter(); c, outs = runb(LEFT)
        np.asarray(c[0, 0]); np.asarray(outs)
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e3


def main():
    variants = [
        ("per-row", lambda l, r: ck.colormap_planes_banded(
            l, r, PER_ROW, MATJ, CFG, SEGS)),
        ("uniform-smem", lambda l, r: ck.colormap_planes_banded(
            l, r, UNIFORM, MATJ, CFG, SEGS)),
        ("static-baked", lambda l, r: ck.colormap_planes_banded(
            l, r, None, MATJ, CFG, SEGS, static_table=STATIC)),
    ]
    ref = None
    for label, fn in variants:
        try:
            out = np.asarray(fn(LEFT, RIGHT))
        except Exception as e:
            print(f"{label}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
            continue
        ok = "ref" if ref is None else (
            "BITWISE" if np.array_equal(out, ref) else "MISMATCH!")
        if ref is None:
            ref = out
        t = scan_bench(fn)
        print(f"{label}: {t:.3f} ms  {ok}", flush=True)


if __name__ == "__main__":
    main()
