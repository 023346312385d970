"""Multi-rate stream management: ragged stream populations.

SURVEY.md §7 "Hard parts / Ragged time": per-stream sample rates and hops
make row production rates differ across a batch, but XLA wants static shapes
and lockstep batches.  The resolution is the standard TPU serving pattern:
**group streams by geometry** — every stream with the same (sample_rate,
window, hop, height) config shares one `SpectrogramPipeline` and one lockstep
state batch; groups advance independently, each at its own hop cadence.

`StreamGroupManager` owns the groups: adding a stream with a new config spins
up a pipeline for that geometry (the FFTW-plan-cache analog); pushes are
per-group; global metrics aggregate across groups.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, Optional

import jax
import numpy as np

from spectrogram_tpu.config import SpectrogramConfig
from spectrogram_tpu.models.spectrogram import SpectrogramPipeline, StreamState


@dataclasses.dataclass
class StreamGroup:
    """One geometry bucket: a pipeline + its lockstep state + the global ids
    of its member streams."""

    cfg: SpectrogramConfig
    pipeline: SpectrogramPipeline
    state: StreamState
    stream_ids: list[int]

    @property
    def n_streams(self) -> int:
        return len(self.stream_ids)


class StreamGroupManager:
    """Routes a heterogeneous stream population onto uniform device batches.

    Capacity model: each group is created with a fixed capacity (static
    shapes); attach/detach flips slots within it.  Detached slots keep
    running on silence — the cost of a dead slot is one row of background
    color, which beats a recompile (the reference analog: the GTK widget
    keeps rendering when the input pauses).
    """

    def __init__(self, group_capacity: int = 256, **pipeline_kwargs):
        self.group_capacity = int(group_capacity)
        self.pipeline_kwargs = dict(pipeline_kwargs)
        self._groups: dict[SpectrogramConfig, StreamGroup] = {}
        self._locations: dict[int, tuple[SpectrogramConfig, int]] = {}
        self._next_id = 0

    # -- membership -------------------------------------------------------------

    def add_stream(self, cfg: SpectrogramConfig, palette_id: int = 1) -> int:
        """Register a stream; returns its global id.  Creates the geometry
        group on first use."""
        group = self._groups.get(cfg)
        if group is None:
            pipeline = SpectrogramPipeline(cfg, **self.pipeline_kwargs)
            state = pipeline.init_state(self.group_capacity, palette_id=palette_id)
            group = StreamGroup(cfg, pipeline, state, [])
            self._groups[cfg] = group
        # Reuse a tombstoned slot before growing (long-running services churn
        # streams; leaking slots would exhaust the group at low occupancy).
        if -1 in group.stream_ids:
            slot = group.stream_ids.index(-1)
            # Zero the slot's device state: the new tenant must not inherit
            # the dead stream's carry samples or retained viewport rows
            # (cross-stream data leakage in a multi-tenant service).
            st = group.state
            group.state = st._replace(
                carry=st.carry.at[slot].set(0.0),
                ring=st.ring.at[slot].set(0) if st.ring.shape[1] else st.ring,
            )
        elif group.n_streams < self.group_capacity:
            slot = group.n_streams
            group.stream_ids.append(-1)  # placeholder, set below
        else:
            raise RuntimeError(
                f"group for {cfg.sample_rate:.0f} Hz full "
                f"({self.group_capacity} slots); create a second manager shard"
            )
        stream_id = self._next_id
        self._next_id += 1
        group.stream_ids[slot] = stream_id
        self._locations[stream_id] = (cfg, slot)
        pid = group.state.palette_id.at[slot].set(palette_id)
        group.state = group.state._replace(palette_id=pid)
        return stream_id

    def remove_stream(self, stream_id: int) -> None:
        """Detach: the slot keeps computing silence until reused (no
        recompile, no reshuffle of live neighbors)."""
        cfg, slot = self._locations.pop(stream_id)
        group = self._groups[cfg]
        group.stream_ids[slot] = -1  # tombstone

    def location(self, stream_id: int) -> tuple[SpectrogramConfig, int]:
        return self._locations[stream_id]

    # -- processing ---------------------------------------------------------------

    def groups(self) -> Iterator[StreamGroup]:
        return iter(self._groups.values())

    def push_group(self, cfg: SpectrogramConfig, chunk) -> "np.ndarray":
        """Advance one geometry group by one chunk.

        chunk: [capacity, chunk_size, 2] — the host ring bank for this group
        supplies silence for unattached slots (RingBank.pop_matrix zero-fill).
        Returns the group's RGBA rows.
        """
        group = self._groups[cfg]
        group.state, rgba = group.pipeline.push(group.state, chunk)
        return rgba

    def set_palette(self, stream_id: int, palette_id: int) -> None:
        cfg, slot = self._locations[stream_id]
        group = self._groups[cfg]
        pid = group.state.palette_id.at[slot].set(palette_id)
        group.state = group.state._replace(palette_id=pid)

    def metrics(self) -> dict:
        return {
            "groups": len(self._groups),
            "streams": len(self._locations),
            "rows_produced": {
                f"{cfg.sample_rate:.0f}Hz/w{cfg.window_size}": int(g.state.row_count)
                for cfg, g in self._groups.items()
            },
        }
