"""Profiler-measured (device-time) A/B of banded-colormap tile sizes.

Wall-scan A/Bs of the ts=256 row block disagreed across harnesses by ~10%
(relay variance); this measures DEVICE time from jax.profiler traces of a
scan over the standalone banded colormap — the same methodology that
settles the per-stage decomposition.

Run: python benchmarks/exp_colormap_ts_profiled.py   (real TPU)
"""
import sys, pathlib, functools
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np, jax, jax.numpy as jnp
from spectrogram_tpu.config import SpectrogramConfig
from spectrogram_tpu.ops import colormap as co
from spectrogram_tpu.ops.pallas import colormap_kernel as ck
from benchmarks.profile_push import parse_trace

CFG = SpectrogramConfig(
    sample_rate=48000.0, window_period=2048 / 48000.0, viewport_height=1024
)
N, ITERS = 4096, 50
MT_NP = co.resample_matrix_full(CFG).T
SEGS = ck.band_segments(MT_NP)
rng = np.random.default_rng(0)
B = MT_NP.shape[0]
LEFT = jnp.asarray(np.abs(rng.standard_normal((N, B))).astype(np.float32) * 0.01)
RIGHT = jnp.asarray(np.abs(rng.standard_normal((N, B))).astype(np.float32) * 0.01)
TABS = jnp.asarray(ck.builtin_color_tables(32))[rng.integers(0, 19, N)]
MT = jnp.asarray(MT_NP)


def run_case(name, ts, th):
    fn = functools.partial(
        ck.colormap_planes_banded, color_tables=TABS, matrix_t=MT, cfg=CFG,
        segments=SEGS, block_rows=ts, block_cols=th,
        precision=jax.lax.Precision.DEFAULT,
    )

    @jax.jit
    def scan(l):
        def body(c, _):
            out = fn(c, RIGHT)
            return c + (out[:1, :1] & 1).astype(jnp.float32) * 1e-12, out[0, 0]
        return jax.lax.scan(body, l, None, length=ITERS)

    c, outs = scan(LEFT)
    np.asarray(c[0, 0]); np.asarray(outs)
    log_dir = f"/tmp/cmap_ts_{name}"
    jax.profiler.start_trace(log_dir)
    c, outs = scan(LEFT)
    np.asarray(c[0, 0]); np.asarray(outs)
    jax.profiler.stop_trace()
    op_total, _ = parse_trace(log_dir, ITERS)
    cmap_ms = sum(v for k, v in op_total.items()
                  if "colormap_planes_banded" in k) / ITERS
    total_ms = sum(v for k, v in op_total.items() if "while" in k) / ITERS
    print(f"{name}: colormap {cmap_ms:.3f} ms/iter  (scan body {total_ms:.3f})",
          flush=True)


def main():
    for name, ts, th in (("ts128_th128", 128, 128), ("ts256_th128", 256, 128),
                         ("ts256_th256", 256, 256), ("ts128_th128_b", 128, 128)):
        try:
            run_case(name, ts, th)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__} {str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()
