"""The flagship model: batched streaming spectrogram pipeline.

TPU-native redesign of the reference's `GPUSpectrogram` widget
(src/widgets/gpu_spectrogram.rs), which per vsync tick pulls all ready STFT
rows into a scrolling F16F16 ring texture (:254-275) and renders it with a
log-frequency/dB/palette fragment shader (:135-191).  Here:

* the ring texture becomes a device-resident `[streams, rows, bins, 2]`
  bfloat16 array, donated across pushes; "scrolling" is a modular row cursor
  (gpu_spectrogram.rs:274's `offset` arithmetic), shared by all streams in a
  batch because they advance in lockstep;
* hot loop A (STFT production) is `ops.stft` batched over streams;
* hot loop B (the fragment shader) is the colormap stage: one precomputed
  resample matmul + dB/pan + per-stream palette LUT lookup, vmapped over the
  stream axis so every stream can use a different palette without re-upload
  (the TPU equivalent of swapping the palette texture, :232-239);
* runtime palette switching is a state update (`set_palette`), no recompile;
  sample-rate switching re-specializes the jit like the reference rebuilds
  its FFTW plan (gpu_spectrogram.rs:320-327).

Push contract: each `push` carries `chunk_hops * hop_size` new samples per
stream and emits exactly `chunk_hops` rows per stream.  Fixed chunk size keeps
all shapes static for XLA; the host ingest layer (io/) does the re-chunking.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from spectrogram_tpu.color.colorscheme import (
    stacked_backgrounds,
    stacked_factored_tables,
    stacked_lookup_tables,
)
from spectrogram_tpu.config import SpectrogramConfig
from spectrogram_tpu.ops import colormap as cmap_ops
from spectrogram_tpu.ops import mxu_fft
from spectrogram_tpu.ops import stft as stft_ops


class StreamState(NamedTuple):
    """Per-batch device state. All arrays lead with the stream axis except
    the scalars shared by the lockstep batch."""

    carry: jax.Array      # [S, window-hop, 2] f32 — sample history between pushes
    ring: jax.Array       # [S, R, B, 2] bf16 — scrolling row ring (f16 texture analog)
    cursor: jax.Array     # [] int32 — next write row (gpu_spectrogram.rs `offset`)
    palette_id: jax.Array # [S] int32 — per-stream palette index
    row_count: jax.Array  # [] int32 — total rows produced since init


class SpectrogramPipeline:
    """Streaming STFT -> colormap pipeline over a batch of S streams.

    Args:
      cfg: geometry/presentation config (static under jit).
      chunk_hops: rows emitted per push; chunk = chunk_hops * hop samples.
      viewport_rows: ring length (rounded up to a multiple of chunk_hops so
        the write slice never wraps — cursor stays a multiple of chunk_hops).
      ring_dtype: storage dtype of the row ring. bfloat16 mirrors the
        reference's F16F16 texture (gpu_spectrogram.rs:222) in TPU-native form.
    """

    def __init__(
        self,
        cfg: SpectrogramConfig,
        chunk_hops: int = 8,
        viewport_rows: Optional[int] = None,
        ring_dtype=jnp.bfloat16,
        lut_resolution: Optional[int] = None,
        store_ring: bool = True,
        stft_backend: str = "auto",
    ):
        cfg.validate()
        self.cfg = cfg
        self.chunk_hops = int(chunk_hops)
        rows = viewport_rows or cfg.viewport_rows
        # Round the ring up so cursor never wraps mid-write.
        self.viewport_rows = -(-rows // self.chunk_hops) * self.chunk_hops
        self.ring_dtype = ring_dtype
        # Streaming mode: at 10k-stream scale a full per-stream viewport ring
        # does not fit HBM (SURVEY.md §6); rows are emitted to the consumer
        # instead of retained. store_ring=False keeps a zero-length ring.
        self.store_ring = bool(store_ring)
        res = lut_resolution or cfg.lut_resolution
        self.lut_stack = jnp.asarray(stacked_lookup_tables(res))        # [P,r,r,4]
        u, v = stacked_factored_tables(res)
        self.lut_u = jnp.asarray(u)                                     # [P,r,4]
        self.lut_v = jnp.asarray(v)                                     # [P,r,4]
        self.backgrounds = jnp.asarray(stacked_backgrounds())           # [P,3] u8
        self.resample = jnp.asarray(cmap_ops.resample_matrix(cfg))      # [H,B]
        self.chunk_size = self.chunk_hops * cfg.hop_size
        self.carry_size = stft_ops.carry_size(cfg)
        # STFT backend: "mxu" = four-step matmul FFT (ops/mxu_fft.py, the
        # production path), "xla" = jnp.fft golden path, "auto" = mxu when a
        # factorization exists for the geometry.
        if stft_backend not in ("auto", "mxu", "xla"):
            raise ValueError(f"unknown stft_backend {stft_backend!r}")
        self.fft_plan = mxu_fft.make_plan(cfg) if stft_backend != "xla" else None
        if stft_backend == "mxu" and self.fft_plan is None:
            raise ValueError(f"no MXU factorization for geometry {cfg}")

    # ------------------------------------------------------------------ state

    def init_state(self, n_streams: int, palette_id: int = 1) -> StreamState:
        """Fresh state for S streams. Default palette 1 = Magma, the
        reference widget's default (gpu_spectrogram.rs:88)."""
        cfg = self.cfg
        ring_rows = self.viewport_rows if self.store_ring else 0
        return StreamState(
            carry=jnp.zeros((n_streams, self.carry_size, 2), jnp.float32),
            ring=jnp.zeros(
                (n_streams, ring_rows, cfg.num_bins, 2), self.ring_dtype
            ),
            cursor=jnp.zeros((), jnp.int32),
            palette_id=jnp.full((n_streams,), palette_id, jnp.int32),
            row_count=jnp.zeros((), jnp.int32),
        )

    def set_palette(self, state: StreamState, palette_id) -> StreamState:
        """Runtime palette switch (per stream or broadcast) — a pure state
        update, the analog of the `palette` GObject property (main.rs:102-104)."""
        pid = jnp.broadcast_to(
            jnp.asarray(palette_id, jnp.int32), state.palette_id.shape
        )
        return state._replace(palette_id=pid)

    # ------------------------------------------------------------------- push

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def push(self, state: StreamState, chunk: jax.Array):
        """Jitted `push_impl`; the state is donated so the ring updates in
        place in HBM."""
        return self.push_impl(state, chunk)

    def push_impl(self, state: StreamState, chunk: jax.Array):
        """Advance all streams by one chunk (pure, untraced — used directly
        by `push` and by `parallel.mesh` under shard_map/pjit).

        chunk: [S, chunk_size, 2] f32 PCM.
        Returns (new_state, rgba) with rgba [S, chunk_hops, H, 4] u8 — the
        freshly produced colormapped rows (streaming product).
        """
        cfg = self.cfg
        k = self.chunk_hops
        buf = jnp.concatenate([state.carry, chunk.astype(jnp.float32)], axis=1)
        rows = self._stft(buf)  # [S, k, B, 2] f32
        new_carry = buf[:, buf.shape[1] - self.carry_size :, :]

        if self.store_ring:
            ring = jax.lax.dynamic_update_slice(
                state.ring,
                rows.astype(self.ring_dtype),
                (0, state.cursor, 0, 0),
            )
        else:
            ring = state.ring
        cursor = (state.cursor + k) % self.viewport_rows

        rgba = self._colormap(rows, state.palette_id)
        new_state = StreamState(
            carry=new_carry,
            ring=ring,
            cursor=cursor,
            palette_id=state.palette_id,
            row_count=state.row_count + k,
        )
        return new_state, cmap_ops.rgba_f32_to_u8(rgba)

    def _stft(self, pcm: jax.Array) -> jax.Array:
        """Framing + STFT via the selected backend."""
        if self.fft_plan is not None:
            return mxu_fft.stft_rows_mxu(pcm, self.cfg, self.fft_plan)
        return stft_ops.stft_rows(pcm, self.cfg)

    def _colormap(self, rows: jax.Array, palette_id: jax.Array) -> jax.Array:
        """[S, k, B, 2] magnitude rows -> [S, k, H, 4] f32 RGBA with a
        per-stream palette."""
        cfg = self.cfg
        pixels = cmap_ops.resample_rows(rows, self.resample)  # [S, k, H, 2]
        left, right = pixels[..., 0], pixels[..., 1]
        mag = cmap_ops.db_normalize(left, right, cfg)
        pan = cmap_ops.pan_fraction(left, right)
        # Per-stream palettes via the rank-1 LUT factorization: a per-pixel
        # gather from [S, r, r, 4] scalarizes on TPU (~20x the whole push
        # cost); two tent-basis matmuls against [S, r, 4] tables are exact
        # and ride the MXU.
        return cmap_ops.sample_lut_factored(
            self.lut_u[palette_id], self.lut_v[palette_id], pan, mag
        )

    # ----------------------------------------------------------------- render

    @functools.partial(jax.jit, static_argnums=0)
    def render_viewport(self, state: StreamState) -> jax.Array:
        """Full scrolling viewport per stream: [S, R, H, 4] u8 RGBA,
        chronological (oldest row first) — the batch analog of the fragment
        shader's `(uv.x * rows + offset) / rows` time wrap
        (gpu_spectrogram.rs:166-171).

        Reads the bf16 ring, so output precision matches the texture path,
        not the f32 streaming path.
        """
        ordered = jnp.roll(state.ring, -state.cursor, axis=1).astype(jnp.float32)
        rgba = self._colormap(ordered, state.palette_id)
        return cmap_ops.rgba_f32_to_u8(rgba)

    @functools.partial(jax.jit, static_argnums=0)
    def composite(self, rgba_u8: jax.Array, palette_id: jax.Array) -> jax.Array:
        """Blend [S, ..., 4] u8 RGBA rows over each stream's palette
        background (frame clear + alpha blend, gpu_spectrogram.rs:278-293)."""
        bg = self.backgrounds[palette_id]  # [S, 3] u8
        rgba = rgba_u8.astype(jnp.float32) / 255.0
        shape = (rgba.shape[0],) + (1,) * (rgba.ndim - 2) + (3,)
        return cmap_ops.composite_over_background(rgba, bg.reshape(shape) * 1.0)

    # ------------------------------------------------------------ one-shot API

    def process(self, pcm: jax.Array, palette_id: int = 1):
        """Non-streaming convenience: [S, T, 2] (or [T, 2]) PCM -> u8 RGBA
        rows for all complete windows. Matches push()-ing the same samples
        in hop-multiple chunks."""
        squeeze = pcm.ndim == 2
        if squeeze:
            pcm = pcm[None]
        rows = self._stft(pcm)
        pid = jnp.full((pcm.shape[0],), palette_id, jnp.int32)
        rgba = cmap_ops.rgba_f32_to_u8(self._colormap(rows, pid))
        return rgba[0] if squeeze else rgba


def reference_pipeline(**overrides) -> SpectrogramPipeline:
    """Pipeline with the exact reference geometry (48 kHz, window 0.05 s,
    819.2 rows/s, 2048-row viewport)."""
    return SpectrogramPipeline(SpectrogramConfig(**overrides))
