"""Checkpoint / resume for streaming state.

The reference persists nothing — its scrolling texture is rebuilt empty on
every sample-rate change (gpu_spectrogram.rs:326) and all history dies with
the process (SURVEY.md §5).  Here the device row-ring + cursors + palette ids
form real resumable state: a long-running 10k-stream service should survive
restarts without blanking every client's viewport.

Two formats:
* .npz + JSON sidecar (`save_state`/`load_state`): single-process; sharded
  states are gathered to host and re-sharded on load.
* orbax (`save_sharded`/`load_sharded`): distributed-native — every process
  writes only its own shards and restore places them straight onto the mesh
  (no host gather, works across multi-host deployments where non-addressable
  shards make device_get impossible).
"""

from __future__ import annotations

import dataclasses
import json
import pathlib

import jax
import numpy as np

from spectrogram_tpu.config import SpectrogramConfig
from spectrogram_tpu.models.spectrogram import SpectrogramPipeline, StreamState


def save_state(path, state: StreamState, cfg: SpectrogramConfig) -> None:
    """Write state + config. `path` gets `.npz`; a `.json` sidecar holds the
    geometry."""
    path = pathlib.Path(path)
    host = jax.device_get(state)
    np.savez_compressed(
        path.with_suffix(".npz"),
        carry=np.asarray(host.carry),
        ring=np.asarray(host.ring, dtype=np.float32),  # bf16 -> f32 container
        cursor=np.asarray(host.cursor),
        palette_id=np.asarray(host.palette_id),
        row_count=np.asarray(host.row_count),
        ring_dtype=str(state.ring.dtype),
    )
    path.with_suffix(".json").write_text(
        json.dumps(dataclasses.asdict(cfg), sort_keys=True)
    )


def load_config(path) -> SpectrogramConfig:
    path = pathlib.Path(path)
    return SpectrogramConfig(**json.loads(path.with_suffix(".json").read_text()))


def load_state(path, pipeline: SpectrogramPipeline) -> StreamState:
    """Restore state for `pipeline`; raises if the checkpoint geometry is
    incompatible (the analog of the reference's forced texture realloc on
    rate change — a changed geometry means a fresh state, not a bad load)."""
    import jax.numpy as jnp

    path = pathlib.Path(path)
    saved_cfg = load_config(path)
    if (
        saved_cfg.window_size != pipeline.cfg.window_size
        or saved_cfg.sample_rate != pipeline.cfg.sample_rate
        or saved_cfg.pad_factor != pipeline.cfg.pad_factor
    ):
        raise ValueError(
            f"checkpoint geometry {saved_cfg} incompatible with pipeline "
            f"{pipeline.cfg}; start a fresh state instead"
        )
    z = np.load(path.with_suffix(".npz"))
    ring_dtype = jnp.dtype(str(z["ring_dtype"]))
    state = StreamState(
        carry=jnp.asarray(z["carry"]),
        ring=jnp.asarray(z["ring"]).astype(ring_dtype),
        cursor=jnp.asarray(z["cursor"]),
        palette_id=jnp.asarray(z["palette_id"]),
        row_count=jnp.asarray(z["row_count"]),
    )
    import functools

    expected = jax.eval_shape(
        functools.partial(pipeline.init_state, state.palette_id.shape[0])
    )
    for name, got, want in zip(
        StreamState._fields, state, expected
    ):
        if got.shape != want.shape:
            raise ValueError(
                f"checkpoint field {name} shape {got.shape} != pipeline "
                f"expectation {want.shape}"
            )
    _check_cursor_alignment(state, pipeline)
    return state


def save_sharded(path, state: StreamState, cfg: SpectrogramConfig) -> None:
    """Orbax save of a (possibly multi-host) sharded state: each process
    persists only its addressable shards; the config sidecar travels in the
    same directory.  `path` is a directory."""
    import orbax.checkpoint as ocp

    path = pathlib.Path(path).resolve()
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path / "state", state._asdict(), force=True)
    if jax.process_index() == 0:
        (path / "config.json").write_text(
            json.dumps(dataclasses.asdict(cfg), sort_keys=True)
        )


def load_sharded(path, pipeline: SpectrogramPipeline, mesh=None) -> StreamState:
    """Restore straight onto the mesh: shapes/shardings come from an
    ABSTRACT template (jax.eval_shape — no HBM is allocated for a throwaway
    zero state, restore peaks at 1x the state size), so every process reads
    only the shards it owns.  `mesh=None` restores unsharded."""
    import functools

    import orbax.checkpoint as ocp

    path = pathlib.Path(path).resolve()
    saved_cfg = SpectrogramConfig(
        **json.loads((path / "config.json").read_text())
    )
    if (
        saved_cfg.window_size != pipeline.cfg.window_size
        or saved_cfg.sample_rate != pipeline.cfg.sample_rate
        or saved_cfg.pad_factor != pipeline.cfg.pad_factor
    ):
        raise ValueError(
            f"checkpoint geometry {saved_cfg} incompatible with pipeline "
            f"{pipeline.cfg}; start a fresh state instead"
        )
    with ocp.StandardCheckpointer() as ckptr:
        meta = ckptr.metadata(path / "state")
        n_streams = meta.item_metadata["palette_id"].shape[0]
        template = jax.eval_shape(
            functools.partial(pipeline.init_state, n_streams)
        )
        for name, got in meta.item_metadata.items():
            want = getattr(template, name)
            if tuple(got.shape) != tuple(want.shape):
                raise ValueError(
                    f"checkpoint field {name} shape {tuple(got.shape)} != "
                    f"pipeline expectation {tuple(want.shape)} (viewport/"
                    f"chunk geometry changed; start a fresh state)"
                )
        if mesh is not None:
            from spectrogram_tpu.parallel.mesh import state_shardings

            shardings = state_shardings(mesh)
        else:
            shardings = jax.tree.map(lambda _: None, template)
        abstract = {
            name: jax.ShapeDtypeStruct(
                getattr(template, name).shape,
                getattr(template, name).dtype,
                sharding=getattr(shardings, name),
            )
            for name in StreamState._fields
        }
        restored = ckptr.restore(path / "state", abstract)
    state = StreamState(**restored)
    _check_cursor_alignment(state, pipeline)
    return state


def _check_cursor_alignment(state: StreamState, pipeline) -> None:
    """A restored cursor must sit on the restoring pipeline's chunk grid:
    chunk_hops is not part of the array shapes, and a misaligned cursor
    silently corrupts the ring (the write slice clamps at the wrap)."""
    cursor = int(state.cursor)
    if cursor % pipeline.chunk_hops:
        raise ValueError(
            f"checkpoint cursor {cursor} is not a multiple of this "
            f"pipeline's chunk_hops={pipeline.chunk_hops}; it was saved "
            f"under a different chunking — start a fresh state"
        )
