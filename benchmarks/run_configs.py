"""Run every BASELINE.json config through the framework and report.

The driver's headline bench (bench.py) measures the 4096-pt-FFT north-star
geometry; this runner demonstrates the full config matrix from
/root/repo/BASELINE.json:

  0. Mono 44.1 kHz WAV -> 1024-pt Hann STFT, hop 256, magma, single stream
  1. Stereo 48 kHz, 2048-pt zero-padded FFT + log resample, viridis
  2. 4096-pt high-res FFT, dB scaling, scrolling retained-buffer rows
  3. 64 parallel streams, 1024-pt STFT, per-stream colorscheme LUTs
  4. 10k-stream live pipeline geometry (throughput-mode, ring off)

Usage: python benchmarks/run_configs.py [--quick]
Prints one JSON line per config.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from spectrogram_tpu.config import SpectrogramConfig
from spectrogram_tpu.color.colorscheme import scheme_index
from spectrogram_tpu.io.sources import SineSource, write_wav, WavSource
from spectrogram_tpu.models.spectrogram import SpectrogramPipeline


def measure_push_rate(pipeline, n_streams, scan_len=20, trials=3):
    rng = np.random.default_rng(0)
    chunk = jnp.asarray(
        rng.standard_normal((n_streams, pipeline.chunk_size, 2)).astype(np.float32)
        * 0.1
    )

    def scan(state):
        def body(s, _):
            s, rgba = pipeline.push_impl(s, chunk)
            return s, rgba.reshape(-1)[0]

        return jax.lax.scan(body, state, None, length=scan_len)

    f = jax.jit(scan, donate_argnums=0)
    st, out = f(pipeline.init_state(n_streams))
    np.asarray(out)
    best = 1e9
    for _ in range(trials):
        st = pipeline.init_state(n_streams)
        t0 = time.perf_counter()
        st, out = f(st)
        np.asarray(out)
        best = min(best, (time.perf_counter() - t0) / scan_len)
    return n_streams * pipeline.chunk_hops / best, best


def report(name, **kw):
    print(json.dumps({"config": name, **kw}), flush=True)


def main(quick: bool = False):
    # --- config 0: mono 44.1 kHz WAV, 1024-pt window, hop 256, magma -------
    cfg0 = SpectrogramConfig(
        sample_rate=44_100.0,
        window_period=1024 / 44_100.0,
        hop_period=256 / 44_100.0,
        pad_factor=2,
        viewport_height=512,
    )
    tone = SineSource(44_100.0, 440.0, 440.0).next_block(int(44_100 * 0.5))
    wav = pathlib.Path("/tmp/baseline_cfg0.wav")
    write_wav(wav, tone[:, :1], 44_100)  # mono file; reader duplicates
    pcm = WavSource(wav).read_all()
    p0 = SpectrogramPipeline(cfg0, store_ring=False)
    rgba = np.asarray(p0.process(jnp.asarray(pcm), palette_id=scheme_index("Magma")))
    peak = int(np.argmax(rgba[rgba.shape[0] // 2, :, :3].astype(int).sum(-1)))
    report(
        "0: mono 44.1k WAV / 1024-pt / hop 256 / magma",
        rows=int(rgba.shape[0]), height=int(rgba.shape[1]),
        window=cfg0.window_size, hop=cfg0.hop_size, peak_row=peak,
    )

    # --- config 1: stereo 48 kHz, 2048-pt zero-padded, viridis -------------
    cfg1 = SpectrogramConfig(
        sample_rate=48_000.0, window_period=2048 / 48_000.0,
        hop_period=512 / 48_000.0, viewport_height=1024,
    )
    p1 = SpectrogramPipeline(cfg1, store_ring=False)
    rate1, dt1 = measure_push_rate(p1, 256 if quick else 1024)
    report(
        "1: stereo 48k / 2048-pt zero-padded / viridis",
        rows_per_sec=round(rate1), ms_per_push=round(dt1 * 1e3, 3),
        padded_fft=cfg1.padded_size,
    )

    # --- config 2: 4096-pt high-res + scrolling retained buffer ------------
    cfg2 = SpectrogramConfig(
        sample_rate=48_000.0, window_period=4096 / 48_000.0,
        hop_period=1024 / 48_000.0, viewport_height=1024, viewport_rows=512,
    )
    p2 = SpectrogramPipeline(cfg2, chunk_hops=4, store_ring=True)
    s2 = p2.init_state(8)
    rng = np.random.default_rng(1)
    for _ in range(4):
        s2, _ = p2.push(
            s2,
            jnp.asarray(rng.standard_normal((8, p2.chunk_size, 2)).astype(np.float32)),
        )
    vp = p2.render_viewport(s2)
    np.asarray(vp.reshape(-1)[0])
    report(
        "2: 4096-pt high-res / scrolling retained rows",
        padded_fft=cfg2.padded_size, ring_rows=p2.viewport_rows,
        rows_written=int(s2.row_count), viewport=list(vp.shape),
    )

    # --- config 3: 64 parallel streams, per-stream LUT selection -----------
    cfg3 = SpectrogramConfig(
        sample_rate=48_000.0, window_period=1024 / 48_000.0,
        hop_period=256 / 48_000.0, viewport_height=512,
    )
    p3 = SpectrogramPipeline(cfg3, chunk_hops=2, store_ring=False)
    s3 = p3.init_state(64)
    s3 = p3.set_palette(s3, jnp.arange(64) % 19)
    chunk = jnp.asarray(
        np.random.default_rng(2)
        .standard_normal((64, p3.chunk_size, 2))
        .astype(np.float32)
        * 0.2
    )
    s3, rgba3 = p3.push(s3, chunk)
    rgba3 = np.asarray(rgba3)
    distinct = len({rgba3[s, 0, 100].tobytes() for s in range(19)})
    report(
        "3: 64 streams vmap / per-stream palettes",
        streams=64, distinct_colors_19_palettes=distinct,
        rows_shape=list(rgba3.shape),
    )

    # --- config 4: 10k-stream live geometry (throughput mode) --------------
    cfg4 = SpectrogramConfig(
        sample_rate=48_000.0, window_period=2048 / 48_000.0,
        hop_period=800 / 48_000.0,
    )
    n4 = 2048 if quick else 10240  # the full north-star population, measured
    p4 = SpectrogramPipeline(cfg4, chunk_hops=1, store_ring=False, packed_output=True)
    rate4, dt4 = measure_push_rate(p4, n4, scan_len=10 if quick else 20)
    report(
        "4: 10k-stream live geometry (60 rows/s/stream)",
        streams_measured=n4, rows_per_sec=round(rate4),
        ms_per_push=round(dt4 * 1e3, 3),
        realtime_stream_capacity=round(rate4 / cfg4.rows_per_second),
        hop_budget_ms=round(1000 / cfg4.rows_per_second, 2),
    )


if __name__ == "__main__":
    main(quick="--quick" in sys.argv)
