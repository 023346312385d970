"""Round-4: per-block palette uniformity kernel vs per-row vs uniform,
across palette layouts (all-uniform / clustered / scattered)."""
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
MATJ = jnp.asarray(MAT)
SEGS = ck.band_segments(MAT)

LAYOUTS = {
    "all-uniform": np.full(N, 1),
    "clustered(4 tenants)": np.repeat(np.arange(4) % 19, N // 4),
    "scattered": np.arange(N) % 19,
}


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
    for lname, pids in LAYOUTS.items():
        tabs = jnp.asarray(ALLTAB[pids])
        ref = np.asarray(ck.colormap_planes_banded(LEFT, RIGHT, tabs, MATJ, CFG, SEGS))
        for mode, fn in (
            ("per-row", lambda l, r, t=tabs: ck.colormap_planes_banded(
                l, r, t, MATJ, CFG, SEGS)),
            ("blockwise", lambda l, r, t=tabs: ck.colormap_planes_banded(
                l, r, t, MATJ, CFG, SEGS, blockwise=True)),
        ):
            try:
                out = np.asarray(fn(LEFT, RIGHT))
            except Exception as e:
                print(f"{lname} {mode}: FAILED {type(e).__name__}: {str(e)[:160]}",
                      flush=True)
                continue
            ok = "BITWISE" if np.array_equal(out, ref) else "MISMATCH!"
            t = scan_bench(fn)
            print(f"{lname:22s} {mode:10s}: {t:.3f} ms  {ok}", flush=True)


if __name__ == "__main__":
    main()
