"""TPU precision regression check: fast profile vs exact on TONAL content.

Noise-based checks cannot see cancellation error (noise has no leakage
floors); this script renders a chirp + tone through both precision profiles
on the attached TPU and asserts the u8 difference bound that the 'fast'
profile's documentation claims.  Run manually or from CI-with-TPU:

    python benchmarks/precision_check.py

Exits nonzero if the bound is violated.  (The CPU test suite cannot cover
this: on CPU, DEFAULT precision is already f32.)
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax.numpy as jnp

import spectrogram_tpu as sg
from spectrogram_tpu.ops.pallas.colormap_kernel import unpack_rgba

MAX_U8_DIFF = 2  # documented bound for the fast profile


def render(profile: str, pcm: np.ndarray, cfg) -> np.ndarray:
    p = sg.SpectrogramPipeline(
        cfg, chunk_hops=1, store_ring=False, packed_output=True,
        precision_profile=profile,
    )
    s = p.init_state(1, palette_id=0)
    outs = []
    for i in range(len(pcm) // p.chunk_size):
        s, packed = p.push(
            s, jnp.asarray(pcm[None, i * p.chunk_size : (i + 1) * p.chunk_size])
        )
        outs.append(unpack_rgba(np.asarray(packed))[0])
    return np.concatenate(outs, axis=0)


def main() -> int:
    cfg = sg.SpectrogramConfig(
        sample_rate=48_000.0,
        window_period=2048 / 48_000.0,
        hop_period=800 / 48_000.0,
        viewport_height=512,
    )
    fs = cfg.sample_rate
    t = np.arange(int(1.0 * fs)) / fs
    phase = 2 * np.pi * 100.0 * (np.exp(t * np.log(80) / t[-1]) - 1) * t[-1] / np.log(80)
    pcm = np.stack(
        [0.5 * np.sin(phase), 0.2 * np.sin(2 * np.pi * 440 * t)], axis=-1
    ).astype(np.float32)

    exact = render("exact", pcm, cfg)
    fast = render("fast", pcm, cfg)
    diff = np.abs(exact.astype(int) - fast.astype(int))
    print(
        f"fast vs exact on tonal content: max u8 diff {diff.max()}, "
        f"mean {diff.mean():.4f}, frac>{MAX_U8_DIFF}: {(diff > MAX_U8_DIFF).mean():.2e}"
    )
    if diff.max() > MAX_U8_DIFF:
        print(f"FAIL: exceeds the documented +-{MAX_U8_DIFF} bound")
        return 1
    print("OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
