"""Dense vs banded colormap kernel on the real TPU (scan-measured).

The banded variant (colormap_kernel.band_segments) exploits the two-tap
structure of the resample matrix: ~17% of the dense contraction's FLOPs at
the default geometry, bitwise-identical output.  Run on a TPU host:
    python benchmarks/bench_banded_colormap.py
"""

import sys, pathlib, time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from spectrogram_tpu.config import SpectrogramConfig
from spectrogram_tpu.ops import colormap as co
from spectrogram_tpu.ops.pallas import colormap_kernel as ck


def main():
    cfg = SpectrogramConfig(
        sample_rate=48000.0, window_period=2048 / 48000.0, viewport_height=1024
    )
    mt_np = co.resample_matrix_full(cfg).T
    segs = ck.band_segments(mt_np)
    print("segments:", segs, flush=True)

    rng = np.random.default_rng(0)
    n, b = 4096, mt_np.shape[0]
    left = jnp.asarray(np.abs(rng.standard_normal((n, b))).astype(np.float32) * 0.01)
    right = jnp.asarray(np.abs(rng.standard_normal((n, b))).astype(np.float32) * 0.01)
    tabs = jnp.asarray(ck.builtin_color_tables(32))[rng.integers(0, 19, n)]
    mt = jnp.asarray(mt_np)

    ref = ck.colormap_planes_builtin(left, right, tabs, mt, cfg)
    band = ck.colormap_planes_banded(left, right, tabs, mt, cfg, segs)
    print("TPU parity:", bool((np.asarray(ref) == np.asarray(band)).all()), flush=True)

    def scan_bench(fn, iters=100):
        @jax.jit
        def run(l):
            def body(c, _):
                out = fn(c, right)
                # cheap carry dependency; per-iter output is ONE scalar so the
                # relay D2H does not dominate the measurement
                c2 = c + (out[:, :1] & 1).astype(jnp.float32) * 1e-12
                return c2, out[0, 0]

            return jax.lax.scan(body, l, None, length=iters)

        c, outs = run(left)
        np.asarray(c[0, 0]); np.asarray(outs)
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            c, outs = run(left)
            np.asarray(c[0, 0]); np.asarray(outs)
            best = min(best, time.perf_counter() - t0)
        return best / iters * 1e3

    for prec_name, prec in [
        ("HIGHEST", jax.lax.Precision.HIGHEST),
        ("DEFAULT", jax.lax.Precision.DEFAULT),
    ]:
        t_ref = scan_bench(
            lambda l, r: ck.colormap_planes_builtin(l, r, tabs, mt, cfg, precision=prec)
        )
        t_band = scan_bench(
            lambda l, r: ck.colormap_planes_banded(l, r, tabs, mt, cfg, segs, precision=prec)
        )
        print(
            f"{prec_name}: dense {t_ref:.3f} ms  banded {t_band:.3f} ms  "
            f"speedup {t_ref/t_band:.2f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
