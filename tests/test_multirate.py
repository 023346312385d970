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


def test_log_scale_tick_budget_escalation():
    """VERDICT r2 item 7: the reference skips whole decades when the budget
    is under the decade count (the multiplier/cnt loop, log_scaling.rs:78-83,
    103) — a 12-decade range at max_points=5 must step by 1000x, not emit
    every power.
    """
    sc = LogScale(1.0, 2e12, 100, base=10.0)
    ticks = sc.key_points(max_points=5)
    # bold_count=12; cnt=3 is the smallest with 12//cnt <= 5 -> multiplier 1e3
    assert ticks == pytest.approx([1.0, 1e3, 1e6, 1e9, 1e12])


def test_log_scale_tick_budget_property():
    """Escalation-regime bound across random (range, base, budget) draws:
    when max_points < bold_count the emitted count respects the budget (the
    reference's own guarantee is max_points + 1: its escalation loop exits on
    integer division, so the boundary decade can add one tick)."""
    import math
    import random

    rnd = random.Random(1234)
    for _ in range(200):
        base = rnd.choice([2.0, 10.0, math.e, 3.0])
        lo = 10.0 ** rnd.uniform(-3, 2)
        hi = lo * base ** rnd.uniform(1.5, 40.0)
        budget = rnd.randint(1, 30)
        sc = LogScale(lo, hi, 100, base=base)
        bold_count = max(int(abs(math.log(hi / lo)) / math.log(base)), 1)
        ticks = sc.key_points(budget)
        assert all(lo <= t <= hi * (1 + 1e-12) for t in ticks)
        assert ticks == sorted(ticks)
        if budget < bold_count:
            # escalation regime: light_density is 0, decades are skipped
            assert len(ticks) <= budget + 1, (lo, hi, base, budget, ticks)


def test_multirate_ingest_end_to_end(rng):
    """VERDICT r1 item 5: multirate wired to ingest — three geometries with
    different hop cadences, each group advancing at its own rate from its own
    RingBank16, with per-group drop counters."""
    import pytest
    from spectrogram_tpu.io import ring as ring_mod
    from spectrogram_tpu.models.multirate import StreamGroupManager

    if not ring_mod.native_available():
        pytest.skip("native ring library unavailable")

    mk = lambda fs, hp: SpectrogramConfig(
        sample_rate=fs, window_period=0.016, hop_period=hp,
        viewport_height=64, viewport_rows=16, max_frequency=min(fs / 2 - 100, 22030),
    )
    cfg_a = mk(48000.0, 0.004)   # chunk period 8 ms
    cfg_b = mk(44100.0, 0.006)   # chunk period 12 ms
    cfg_c = mk(96000.0, 0.002)   # chunk period 4 ms

    mgr = StreamGroupManager(group_capacity=2, chunk_hops=2, ingest=True,
                             ring_capacity=32768, feeder_depth=2)
    ids = {}
    for cfg in (cfg_a, cfg_b, cfg_c):
        ids[cfg] = [mgr.add_stream(cfg), mgr.add_stream(cfg)]

    def feed(seconds):
        for cfg in (cfg_a, cfg_b, cfg_c):
            n = int(seconds * cfg.sample_rate)
            t = np.arange(n) / cfg.sample_rate
            for j, sid in enumerate(ids[cfg]):
                x = (np.sin(2 * np.pi * 440.0 * (j + 1) * t) * 20000).astype(np.int16)
                got = mgr.push_pcm(sid, np.stack([x, x], axis=-1))
                assert got == n

    feed(0.3)  # pre-roll: plenty for every cadence
    blocks = {}
    now = 100.0
    for step in range(25):           # 25 x 4 ms = 100 ms simulated
        out = mgr.tick(now)
        for cfg, blk in out.items():
            blocks.setdefault(cfg, []).append(blk)
        now += 0.004
    for cfg, blks in mgr.flush().items():
        blocks.setdefault(cfg, []).extend(blks)

    m = mgr.metrics()
    rows = m["rows_produced"]
    key = lambda cfg: f"{cfg.sample_rate:.0f}Hz/w{cfg.window_size}"
    # 100 ms at 8/12/4 ms cadence -> 13/9/25 pushes x 2 rows (first tick fires
    # immediately; feeder depth just delays delivery, not production).
    assert rows[key(cfg_a)] == 2 * 13, rows
    assert rows[key(cfg_b)] == 2 * 9, rows
    assert rows[key(cfg_c)] == 2 * 25, rows
    assert all(v == 0 for v in m["dropped"].values()), m
    # every group delivered real row blocks with its own geometry
    for cfg in (cfg_a, cfg_b, cfg_c):
        blk = blocks[cfg][0]
        assert blk.shape[0] == 2 and blk.shape[2] == 64
        assert blk.ndim == 4 and blk.shape[3] == 4
    # rows are non-silent (tones well above the dB floor)
    assert len(np.unique(blocks[cfg_a][0])) > 4

    # overrun is counted per group: flood one 32768-frame ring
    big = np.zeros((70000, 2), np.int16)
    mgr.push_pcm(ids[cfg_a][0], big)
    assert mgr.metrics()["dropped"][key(cfg_a)] > 0


def test_multirate_slot_reuse_resets_backlog():
    import pytest
    from spectrogram_tpu.io import ring as ring_mod
    from spectrogram_tpu.models.multirate import StreamGroupManager

    if not ring_mod.native_available():
        pytest.skip("native ring library unavailable")
    mgr = StreamGroupManager(group_capacity=2, chunk_hops=2, ingest=True)
    s0 = mgr.add_stream(CFG_A)
    mgr.add_stream(CFG_A)
    pcm = np.ones((500, 2), np.int16) * 1000
    mgr.push_pcm(s0, pcm)
    g = next(mgr.groups())
    assert g.bank.size(0) == 500
    mgr.remove_stream(s0)
    s2 = mgr.add_stream(CFG_A)
    assert mgr.location(s2)[1] == 0
    assert g.bank.size(0) == 0  # dead tenant's backlog discarded


def test_gc_empty_groups():
    mgr = StreamGroupManager(group_capacity=2, chunk_hops=2)
    a = mgr.add_stream(CFG_A)
    b = mgr.add_stream(CFG_B)
    assert mgr.metrics()["groups"] == 2
    mgr.remove_stream(a)
    assert mgr.gc_empty_groups() == 1          # CFG_A group collected
    assert mgr.metrics()["groups"] == 1
    mgr.remove_stream(b)
    assert mgr.gc_empty_groups() == 1
    assert mgr.metrics()["groups"] == 0
    # a fresh add after GC rebuilds the group cleanly
    c = mgr.add_stream(CFG_A)
    assert mgr.location(c)[1] == 0


def test_multirate_int16_wire_matches_f32():
    """wire_int16=True groups must tick out byte-identical rows to the f32
    drain of the same pushed PCM."""
    import numpy as np
    from spectrogram_tpu.config import SpectrogramConfig
    from spectrogram_tpu.io import ring as ring_mod
    from spectrogram_tpu.models.multirate import StreamGroupManager

    if not ring_mod.native_available():
        import pytest
        pytest.skip("native ring library unavailable")
    cfg = SpectrogramConfig(
        sample_rate=8000.0, window_period=0.032, hop_period=0.008,
        viewport_height=64, viewport_rows=16,
    )
    def run(wire):
        rng = np.random.default_rng(3)
        mgr = StreamGroupManager(
            group_capacity=2, ingest=True, wire_int16=wire,
            chunk_hops=2, store_ring=False,
        )
        sid = mgr.add_stream(cfg)
        words = rng.integers(-32768, 32768, size=(6000, 2)).astype(np.int16)
        mgr.push_pcm(sid, words)
        outs = []
        now = 0.0
        for _ in range(4):
            now += 10.0
            outs.extend(np.asarray(r) for r in mgr.tick(now).values())
        return outs

    a = run(False)
    b = run(True)
    assert len(a) == len(b) > 0
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_multirate_on_mesh(rng):
    """Mesh mode (round 5): geometry groups live stream-sharded on a
    jax.sharding.Mesh; push_group routes through shard_map (psum metrics
    over the mesh) and matches the single-device manager bitwise.
    set_palette re-places the mutated state on the mesh.  mesh+ingest and
    non-dividing capacities are rejected."""
    import jax
    from spectrogram_tpu.parallel import mesh as pmesh

    mesh = pmesh.make_mesh(4)
    with pytest.raises(ValueError, match="mesh \\+ ingest"):
        StreamGroupManager(group_capacity=4, mesh=mesh, ingest=True)
    with pytest.raises(ValueError, match="divide"):
        StreamGroupManager(group_capacity=6, mesh=mesh)

    kw = dict(group_capacity=4, chunk_hops=2)
    mgr_m = StreamGroupManager(mesh=mesh, **kw)
    mgr_1 = StreamGroupManager(**kw)
    for mgr in (mgr_m, mgr_1):
        for _ in range(4):
            mgr.add_stream(CFG_A)
        mgr.add_stream(CFG_B, palette_id=3)
    ga = next(g for g in mgr_m.groups() if g.cfg == CFG_A)
    assert len(ga.state.carry.sharding.device_set) == 4
    chunk_a = rng.standard_normal(
        (4, ga.pipeline.chunk_size, 2)).astype(np.float32) * 0.2
    chunk_b = rng.standard_normal(
        (4, next(g for g in mgr_m.groups() if g.cfg == CFG_B)
         .pipeline.chunk_size, 2)).astype(np.float32) * 0.2
    for cfg, ch in ((CFG_A, chunk_a), (CFG_B, chunk_b)):
        r_m = mgr_m.push_group(cfg, jnp.asarray(ch))
        r_1 = mgr_1.push_group(cfg, jnp.asarray(ch))
        np.testing.assert_array_equal(np.asarray(r_m), np.asarray(r_1))
    # palette edit mid-stream: state re-placed on the mesh, parity holds
    mgr_m.set_palette(1, 5)
    mgr_1.set_palette(1, 5)
    r_m = mgr_m.push_group(CFG_A, jnp.asarray(chunk_a))
    r_1 = mgr_1.push_group(CFG_A, jnp.asarray(chunk_a))
    np.testing.assert_array_equal(np.asarray(r_m), np.asarray(r_1))
    assert len(ga.state.carry.sharding.device_set) == 4
    m = mgr_m.metrics()
    assert m["groups"] == 2 and m["streams"] == 5
