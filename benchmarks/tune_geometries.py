"""Autotune + measure the three headline geometries on the real TPU.

Geometries: the bench 2048/4096 config, the reference's native 2400/4800
(reference src/fourier/fft.rs:33,44), and a 512/1024 low-latency config.
For each: run the tuner (cached wisdom), then scan-measure the full push
pipeline with the tuned plan.  Appends a JSON line per geometry to stdout.
"""

import sys, pathlib, time, json

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from spectrogram_tpu.config import SpectrogramConfig, BENCH_CONFIG
from spectrogram_tpu.models.spectrogram import SpectrogramPipeline
from spectrogram_tpu.utils import autotune

GEOMETRIES = {
    "bench_2048/4096": BENCH_CONFIG,
    "reference_2400/4800": SpectrogramConfig(
        sample_rate=48_000.0, window_period=0.05, hop_period=800 / 48_000.0
    ),
    "lowlat_512/1024": SpectrogramConfig(
        sample_rate=48_000.0, window_period=512 / 48_000.0,
        hop_period=800 / 48_000.0, viewport_height=512,
    ),
}


def measure_pipeline(cfg, n_streams=4096, iters=100, autotune_on=True,
                     layout="scattered"):
    """layout: "scattered" = per-stream 19-palette tables (the headline
    per-row/per-stream configuration — blockwise_palettes="auto" would
    otherwise flip init_state's all-one-palette default to the blockwise
    kernel and quietly inflate this row); "uniform" = scalar set_palette
    (SMEM-scalar kernel); "default" = init_state layout (blockwise under
    auto)."""
    pipeline = SpectrogramPipeline(
        cfg, chunk_hops=1, store_ring=False, packed_output=True,
        precision_profile="fast", autotune=autotune_on,
    )
    rng = np.random.default_rng(0)
    chunk = jnp.asarray(
        rng.standard_normal((n_streams, pipeline.chunk_size, 2)).astype(np.float32)
        * 0.1
    )

    def init_state():
        state = pipeline.init_state(n_streams)
        if layout == "uniform":
            return pipeline.set_palette(state, 1)
        if layout == "scattered":
            ids = (np.arange(n_streams) % len(pipeline.schemes)).astype(np.int32)
            return pipeline.set_palette(state, ids)
        return state

    def scan(state, chunk):
        def body(s, _):
            s, rgba = pipeline.push_impl(s, chunk)
            return s, rgba[:, 0, 0]

        return jax.lax.scan(body, state, None, length=iters)

    fn = jax.jit(scan, donate_argnums=0)
    state = init_state()
    state, sums = fn(state, chunk)
    np.asarray(sums[-1, :8])
    best = np.inf
    for _ in range(3):
        state = init_state()
        t0 = time.perf_counter()
        state, sums = fn(state, chunk)
        np.asarray(sums[-1, :8])
        best = min(best, time.perf_counter() - t0)
    dt = best / iters
    return {
        "rows_per_sec": round(n_streams / dt, 1),
        "ms_per_push": round(dt * 1e3, 3),
        "plan": f"{pipeline.fft_plan.n1}x{pipeline.fft_plan.n2}"
        if pipeline.fft_plan else "xla",
        "block_rows": pipeline.stft_block_rows,
        "backend": "pallas" if pipeline.fused_chain else "mxu/xla",
    }


def main():
    # CLI: substring filters over geometry names (e.g. `reference` or
    # `bench reference`).  Default runs all EXCEPT lowlat: its N=1024
    # kernels hit the relay's small-N compile blowup (CLAUDE.md protocol —
    # never compile N < 2048 on the relay without a 10+ min/candidate
    # budget); pass `lowlat` explicitly to include it.
    picks = sys.argv[1:] or ["bench", "reference"]
    selected = {
        name: cfg for name, cfg in GEOMETRIES.items()
        if any(p in name for p in picks)
    }
    if not selected:
        raise SystemExit(f"no geometry matches {picks}; have {list(GEOMETRIES)}")
    # The cache key includes the deployment kwargs (they change the
    # measured graph), so the warm-up MUST tune under the exact kwargs the
    # measured pipelines construct with — a bare tune(cfg) caches under a
    # key no production pipeline ever reads, and measure_pipeline's
    # autotune=True constructor then silently RE-tunes (caught live: the
    # re-tune's 1024-stream rankings are noisy enough to pick a different,
    # slower plan than the verbose run 15 minutes earlier).
    pipeline_kwargs = dict(chunk_hops=1, store_ring=False,
                           packed_output=True, precision_profile="fast")
    for name, cfg in selected.items():
        t0 = time.perf_counter()
        plan, ts = autotune.tune(cfg, verbose=True,
                                 pipeline_kwargs=pipeline_kwargs)
        tune_s = time.perf_counter() - t0
        for layout in ("scattered", "uniform"):
            r = measure_pipeline(cfg, layout=layout)
            r.update({
                "geometry": name,
                "layout": layout,
                "window": cfg.window_size,
                "fft": cfg.padded_size,
                "tuned_plan": f"{plan.n1}x{plan.n2}" if plan else None,
                "tuned_block_rows": ts,
                "tune_seconds": round(tune_s, 1),
            })
            print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
