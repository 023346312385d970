"""Multi-rate stream group tests + log-scale coordinate tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from spectrogram_tpu.config import SpectrogramConfig
from spectrogram_tpu.models.multirate import StreamGroupManager
from spectrogram_tpu.ops.log_scale import LogScale, display_scale

CFG_A = SpectrogramConfig(sample_rate=8000.0, window_period=0.032, hop_period=0.008,
                          viewport_height=64, viewport_rows=16)
CFG_B = SpectrogramConfig(sample_rate=16000.0, window_period=0.016, hop_period=0.004,
                          viewport_height=64, viewport_rows=16)


def test_groups_by_geometry():
    mgr = StreamGroupManager(group_capacity=4, chunk_hops=2)
    a0 = mgr.add_stream(CFG_A)
    a1 = mgr.add_stream(CFG_A, palette_id=2)
    b0 = mgr.add_stream(CFG_B)
    assert len(list(mgr.groups())) == 2
    assert mgr.location(a0)[1] == 0 and mgr.location(a1)[1] == 1
    assert mgr.location(b0)[0] == CFG_B
    m = mgr.metrics()
    assert m["groups"] == 2 and m["streams"] == 3


def test_groups_advance_independently(rng):
    mgr = StreamGroupManager(group_capacity=2, chunk_hops=2)
    mgr.add_stream(CFG_A)
    mgr.add_stream(CFG_B)
    ga = [g for g in mgr.groups() if g.cfg == CFG_A][0]
    gb = [g for g in mgr.groups() if g.cfg == CFG_B][0]
    chunk_a = jnp.asarray(rng.standard_normal((2, ga.pipeline.chunk_size, 2)).astype(np.float32))
    rgba = mgr.push_group(CFG_A, chunk_a)
    assert rgba.shape[0] == 2
    assert int(ga.state.row_count) == 2
    assert int(gb.state.row_count) == 0  # untouched group unchanged


def test_capacity_and_detach():
    mgr = StreamGroupManager(group_capacity=2, chunk_hops=2)
    s0 = mgr.add_stream(CFG_A)
    mgr.add_stream(CFG_A)
    with pytest.raises(RuntimeError):
        mgr.add_stream(CFG_A)
    mgr.remove_stream(s0)
    with pytest.raises(KeyError):
        mgr.location(s0)


def test_per_stream_palette_update():
    mgr = StreamGroupManager(group_capacity=2, chunk_hops=2)
    s0 = mgr.add_stream(CFG_A, palette_id=1)
    mgr.set_palette(s0, 7)
    g = next(mgr.groups())
    assert int(g.state.palette_id[0]) == 7


# ---------------------------------------------------------------- log scale


def test_log_scale_roundtrip():
    sc = LogScale(32.0, 22030.0, 1024, base=2.0)
    for v in [32.0, 100.0, 440.0, 10_000.0, 22030.0]:
        assert sc.value_of(sc.position_of(v)) == pytest.approx(v, rel=1e-9)
    assert sc.position_of(32.0) == pytest.approx(0.0)
    assert sc.position_of(22030.0) == pytest.approx(1024.0)


def test_log_scale_matches_golden_edges():
    from spectrogram_tpu.models.golden import pixel_band_edges

    cfg = SpectrogramConfig(viewport_height=64)
    sc = display_scale(cfg, 64)
    edges = pixel_band_edges(cfg, 64)
    for py in range(65):
        assert sc.value_of(py) == pytest.approx(edges[py], rel=1e-12)


def test_log_scale_ticks():
    sc = LogScale(32.0, 22030.0, 1024, base=10.0)
    ticks = sc.key_points(max_points=12)
    assert 100.0 in ticks and 1000.0 in ticks and 10_000.0 in ticks
    assert all(32.0 <= t <= 22030.0 for t in ticks)
    labels = dict((lbl, pos) for pos, lbl in sc.labeled_ticks())
    assert "1k" in labels and "10k" in labels


def test_slot_reuse_after_detach():
    """Self-review finding: tombstoned slots must be reclaimed, not leaked."""
    mgr = StreamGroupManager(group_capacity=2, chunk_hops=2)
    s0 = mgr.add_stream(CFG_A)
    s1 = mgr.add_stream(CFG_A)
    mgr.remove_stream(s0)
    s2 = mgr.add_stream(CFG_A)           # must reuse s0's slot
    assert mgr.location(s2)[1] == 0
    mgr.remove_stream(s1)
    s3 = mgr.add_stream(CFG_A)           # reuses s1's slot
    assert mgr.location(s3)[1] == 1
    with pytest.raises(RuntimeError):
        mgr.add_stream(CFG_A)            # now genuinely full


def test_slot_reuse_zeroes_state(rng):
    """Advisor finding (r1): a reused slot must not inherit the dead
    stream's carry samples or viewport rows (cross-tenant leakage)."""
    mgr = StreamGroupManager(group_capacity=2, chunk_hops=2)
    s0 = mgr.add_stream(CFG_A)
    mgr.add_stream(CFG_A)
    g = next(mgr.groups())
    chunk = jnp.asarray(
        rng.standard_normal((2, g.pipeline.chunk_size, 2)).astype(np.float32)
    )
    mgr.push_group(CFG_A, chunk)
    assert float(jnp.abs(g.state.carry[0]).max()) > 0.0
    mgr.remove_stream(s0)
    s2 = mgr.add_stream(CFG_A)
    assert mgr.location(s2)[1] == 0
    assert float(jnp.abs(g.state.carry[0]).max()) == 0.0
    assert float(jnp.abs(g.state.ring[0].astype(jnp.float32)).max()) == 0.0
    # the surviving tenant's state is untouched
    assert float(jnp.abs(g.state.carry[1]).max()) > 0.0


def test_log_scale_ticks_no_duplicates():
    sc = LogScale(20.0, 20000.0, 100, base=10.0)
    ticks = sc.key_points(40)
    assert len(ticks) == len(set(ticks))
