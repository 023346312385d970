"""Feature-composition fuzz: random combinations of the round-4 feature
matrix — palette layouts (scalar / clustered / scattered / wild),
palette_sort + blockwise auto, explicit/auto stream blocking, chunk_hops,
ring storage, wire format (f32 / planar / int16), and mid-stream
set_palette transitions — must all push BITWISE identical bytes to the
plain per-row pipeline.

The targeted tests pin each feature pair; this sweep is the backstop for
the compositions nobody wrote down (the class of bug where e.g. the
global-sort chunk permute and the int16 on-device scaling disagree about
ordering).  Every pipeline runs the fused Pallas chain in interpret mode,
so the routing/permutation logic is exercised exactly as on hardware.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from spectrogram_tpu.config import SpectrogramConfig
from spectrogram_tpu.models.spectrogram import SpectrogramPipeline

CFG = SpectrogramConfig(
    sample_rate=8000.0,
    window_period=0.032,   # W = 256, padded 512
    hop_period=0.008,      # hop = 64
    viewport_height=64,
    viewport_rows=16,
)

KW = dict(packed_output=True, stft_backend="pallas",
          colormap_backend="pallas", kernel_interpret=True)


def _layout(rng, s, n_schemes):
    kind = rng.choice(["scalar", "clustered", "alternating", "wild"])
    if kind == "scalar":
        return int(rng.integers(0, n_schemes))
    if kind == "clustered":
        return (np.arange(s) // max(s // 4, 1) % n_schemes).astype(np.int32)
    if kind == "alternating":
        return (np.arange(s) % int(rng.integers(2, 4))).astype(np.int32)
    return rng.integers(0, n_schemes, size=s).astype(np.int32)


def _as_ref_ids(ids, s):
    # the reference pipeline always uses a per-stream array so its tables
    # stay on the per-row path (a scalar would pick the uniform kernel)
    return np.full(s, ids, np.int32) if np.ndim(ids) == 0 else ids


@pytest.mark.parametrize("seed", range(10))
def test_random_feature_composition_bitwise(seed):
    rng = np.random.default_rng(7000 + seed)
    s = int(rng.choice([64, 192, 256]))
    k = int(rng.choice([1, 2, 4]))
    store_ring = bool(rng.choice([False, True]))
    blocks = rng.choice(["flat", "explicit", "auto"])
    stream_blocks = (
        0 if blocks == "flat"
        else int(rng.choice([64, 96])) if blocks == "explicit"
        else "auto"
    )
    sorted_out = bool(rng.choice([False, True])) and not store_ring
    wire = rng.choice(["f32", "planar", "int16"])

    p = SpectrogramPipeline(
        CFG, chunk_hops=k, store_ring=store_ring,
        stream_blocks=stream_blocks,
        sorted_output=sorted_out, **KW,
    )  # palette_sort + blockwise auto are the defaults under test
    p_ref = SpectrogramPipeline(
        CFG, chunk_hops=k, store_ring=store_ring,
        palette_sort=False, blockwise_palettes=False, **KW,
    )
    n_schemes = len(p.schemes)

    ids = _layout(rng, s, n_schemes)
    st = p.set_palette(p.init_state(s), ids)
    st_ref = p_ref.set_palette(p_ref.init_state(s), _as_ref_ids(ids, s))

    def one_push(st, st_ref):
        pcm16 = rng.integers(-20000, 20000,
                             size=(s, p.chunk_size, 2)).astype(np.int16)
        pcm = pcm16.astype(np.float32) / 32768.0  # exact in f32
        if wire == "planar":
            st, o = p.push_planar(st, jnp.swapaxes(jnp.asarray(pcm), 1, 2))
        elif wire == "int16":
            st, o = p.push(st, jnp.asarray(pcm16))
        else:
            st, o = p.push(st, jnp.asarray(pcm))
        st_ref, o_ref = p_ref.push(st_ref, jnp.asarray(pcm))
        o = np.asarray(o)
        op = p.output_perm(st)
        if op is not None:
            o = o[op]
        np.testing.assert_array_equal(o, np.asarray(o_ref))
        return st, st_ref

    for _ in range(2):
        st, st_ref = one_push(st, st_ref)

    # mid-stream palette transition to an unrelated random layout class
    ids2 = _layout(rng, s, n_schemes)
    st = p.set_palette(st, ids2)
    st_ref = p_ref.set_palette(st_ref, _as_ref_ids(ids2, s))
    st, st_ref = one_push(st, st_ref)

    if store_ring:
        np.testing.assert_array_equal(
            np.asarray(p.render_viewport(st)),
            np.asarray(p_ref.render_viewport(st_ref)),
        )
    else:
        # carry-sort mode may hold the carry sorted; compare externally
        np.testing.assert_array_equal(
            np.asarray(p.unsort_state(st).carry), np.asarray(st_ref.carry)
        )
