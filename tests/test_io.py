"""IO layer tests: sources, WAV roundtrip, registry, stream batch."""

import numpy as np
import pytest

from spectrogram_tpu.io import sources
from spectrogram_tpu.io.registry import InputRegistry, StreamBatch


def test_adapt_channels():
    mono = np.ones((5,), np.float32)
    out = sources.adapt_channels(mono)
    assert out.shape == (5, 2)
    np.testing.assert_array_equal(out[:, 0], out[:, 1])
    stereo = np.ones((5, 2), np.float32)
    assert sources.adapt_channels(stereo).shape == (5, 2)
    with pytest.raises(ValueError):
        sources.adapt_channels(np.ones((5, 3), np.float32))


def test_wav_roundtrip(tmp_path, rng):
    pcm = (rng.random((1000, 2)).astype(np.float32) - 0.5) * 0.8
    path = tmp_path / "t.wav"
    sources.write_wav(path, pcm, 48000)
    src = sources.WavSource(path)
    assert src.sample_rate == 48000.0
    assert src.channels == 2
    back = src.read_all()
    assert back.shape == (1000, 2)
    np.testing.assert_allclose(back, pcm, atol=2.0 / 32767)  # 1 LSB + scale skew
    # streaming blocks agree with read_all
    blocks = list(src.blocks(256))
    np.testing.assert_array_equal(np.concatenate(blocks), back)


def test_synthetic_sources_continuity():
    sine = sources.SineSource(8000.0, 400.0, 400.0)
    a = sine.next_block(100)
    b = sine.next_block(100)
    joined = np.concatenate([a, b])
    t = np.arange(200) / 8000.0
    np.testing.assert_allclose(
        joined[:, 0], 0.5 * np.sin(2 * np.pi * 400.0 * t), atol=1e-6
    )
    chirp = sources.ChirpSource(8000.0, duration=0.5)
    c = chirp.next_block(400)
    assert c.shape == (400, 2) and np.abs(c).max() <= 0.5 + 1e-6
    noise = sources.NoiseSource(seed=1)
    n1 = noise.next_block(64)
    assert n1.shape == (64, 2)


def test_capture_gated():
    # sounddevice is not installed in this image; the capability must be
    # cleanly gated, not crash.
    assert sources.CaptureSource.available() in (True, False)
    if not sources.CaptureSource.available():
        with pytest.raises(ImportError):
            import sounddevice  # noqa: F401


def test_registry_enumerates_and_selects():
    rates = []
    reg = InputRegistry(on_sample_rate=rates.append)
    assert len(reg) >= 3  # synthetic sources always present
    names = [d.name for d in reg.inputs]
    assert any("chirp" in n for n in names)
    desc = reg.select(len(reg) - 3)  # first synthetic
    assert desc.kind == "synthetic"
    assert rates == [48000.0]
    import time

    time.sleep(0.1)
    assert len(reg.ring) > 0  # pump thread feeding the ring
    reg.stop()
    # re-select same rate: no duplicate notify (property semantics)
    reg.select(len(reg) - 2)
    assert rates == [48000.0]
    reg.stop()


def test_stream_batch_lockstep():
    batch = StreamBatch(4, ring_capacity=1024)
    batch.attach_all(lambda s: sources.SineSource(8000.0, 100.0 * (s + 1), 50.0))
    batch.tick(256)
    assert batch.ready_chunks(128) == 2
    out, counts = batch.pop_chunk(128)
    assert out.shape == (4, 128, 2)
    np.testing.assert_array_equal(counts, 128)
    assert batch.dropped_total == 0
    with pytest.raises(IndexError):
        batch.attach(9, sources.NoiseSource())


def test_device_feeder_pipelines_in_order(rng):
    import jax.numpy as jnp
    from spectrogram_tpu.config import SpectrogramConfig
    from spectrogram_tpu.io.feeder import DeviceFeeder
    from spectrogram_tpu.models.spectrogram import SpectrogramPipeline

    cfg = SpectrogramConfig(
        sample_rate=8000.0, window_period=0.032, hop_period=0.008,
        viewport_height=64, viewport_rows=16,
    )
    p = SpectrogramPipeline(cfg, chunk_hops=2)
    chunks = [
        (rng.standard_normal((3, p.chunk_size, 2)) * 0.2).astype(np.float32)
        for _ in range(5)
    ]
    # reference output: sequential pushes
    s = p.init_state(3)
    expected = []
    for c in chunks:
        s, rgba = p.push(s, jnp.asarray(c))
        expected.append(np.asarray(rgba))

    feeder = DeviceFeeder(p, p.init_state(3), depth=2)
    it = iter(chunks)
    got = list(feeder.run(lambda: next(it, None)))
    assert len(got) == 5
    for g, e in zip(got, expected):
        np.testing.assert_array_equal(g, e)
    assert feeder.probe.summary()["pushes"] == 5
    with pytest.raises(ValueError):
        DeviceFeeder(p, p.init_state(1), depth=0)


def test_pop_matrix_rejects_bad_out_buffer():
    from spectrogram_tpu.io.ring import RingBank

    b = RingBank(2, 16)
    with pytest.raises(ValueError, match="C-contiguous float32"):
        b.pop_matrix(4, out=np.empty((2, 4, 2)))  # float64
    with pytest.raises(ValueError, match="C-contiguous float32"):
        b.pop_matrix(4, out=np.empty((2, 5, 2), np.float32))  # wrong shape
    with pytest.raises(ValueError, match="C-contiguous float32"):
        b.pop_matrix(4, out=np.empty((2, 4, 4), np.float32)[:, :, ::2])


def test_device_feeder_planar_matches(rng):
    import jax.numpy as jnp
    from spectrogram_tpu.config import SpectrogramConfig
    from spectrogram_tpu.io.feeder import DeviceFeeder
    from spectrogram_tpu.models.spectrogram import SpectrogramPipeline

    cfg = SpectrogramConfig(
        sample_rate=8000.0, window_period=0.032, hop_period=0.008,
        viewport_height=64, viewport_rows=16,
    )
    p = SpectrogramPipeline(cfg, chunk_hops=2)
    chunk = (rng.standard_normal((2, p.chunk_size, 2)) * 0.2).astype(np.float32)
    f1 = DeviceFeeder(p, p.init_state(2), depth=1)
    out1 = f1.push(chunk)
    f2 = DeviceFeeder(p, p.init_state(2), depth=1, planar=True)
    out2 = f2.push(chunk.transpose(0, 2, 1).copy())
    np.testing.assert_array_equal(out1, out2)


def test_ready_chunks_partial_attach():
    """Self-review finding: unattached slots must not pin readiness at 0."""
    batch = StreamBatch(4, ring_capacity=1024)
    batch.attach(1, sources.SineSource(8000.0))
    batch.tick(256)
    assert batch.ready_chunks(128) == 2  # only stream 1 counts
    assert batch.ready_chunks(512) == 0
    empty = StreamBatch(2, ring_capacity=64)
    assert empty.ready_chunks(8) == 0  # nothing attached


def test_registry_stop_joins_pump():
    """Self-review finding: stop() must join the pump so two producers never
    overlap on one SPSC ring."""
    reg = InputRegistry()
    reg.select(len(reg) - 1)
    pump = reg._active
    reg.stop()
    assert not pump.is_alive()


def test_device_feeder_probe_readback(rng):
    """probe readback: completion forced, rows stay on device, values equal
    the full-readback path."""
    from spectrogram_tpu.config import SpectrogramConfig
    from spectrogram_tpu.io.feeder import DeviceFeeder
    from spectrogram_tpu.models.spectrogram import SpectrogramPipeline
    import jax

    cfg = SpectrogramConfig(sample_rate=8000.0, window_period=0.032,
                            hop_period=0.008, viewport_height=64,
                            viewport_rows=16)
    p = SpectrogramPipeline(cfg, chunk_hops=2, store_ring=False)
    chunks = [rng.standard_normal((2, p.chunk_size, 2)).astype(np.float32) * 0.2
              for _ in range(3)]
    full = DeviceFeeder(p, p.init_state(2), depth=2)
    probe = DeviceFeeder(p, p.init_state(2), depth=2, readback="probe")
    got_full = [b for c in chunks for b in [full.push(c)] if b is not None]
    got_full += full.flush()
    got_probe = [b for c in chunks for b in [probe.push(c)] if b is not None]
    got_probe += probe.flush()
    assert len(got_full) == len(got_probe) == 3
    assert all(isinstance(b, jax.Array) for b in got_probe)  # stayed on device
    for a, b in zip(got_full, got_probe):
        np.testing.assert_array_equal(a, np.asarray(b))
    import pytest
    with pytest.raises(ValueError, match="readback"):
        DeviceFeeder(p, p.init_state(1), readback="none")


def test_chunk_pool_rotation_copy_free(rng):
    """VERDICT r2 item 8: a depth+1 rotating ChunkPool with copy_chunks=False
    must produce byte-identical output to the defensive-copy path, even
    though every buffer is overwritten in rotation (no mid-transfer
    overwrite: the feeder forces push i before buffer i is reused)."""
    import jax.numpy as jnp
    from spectrogram_tpu.config import SpectrogramConfig
    from spectrogram_tpu.io.feeder import ChunkPool, DeviceFeeder
    from spectrogram_tpu.models.spectrogram import SpectrogramPipeline

    cfg = SpectrogramConfig(
        sample_rate=8000.0, window_period=0.032, hop_period=0.008,
        viewport_height=64, viewport_rows=16,
    )
    p = SpectrogramPipeline(cfg, chunk_hops=2)
    chunks = [
        (rng.standard_normal((3, 2, p.chunk_size)) * 0.2).astype(np.float32)
        for _ in range(7)
    ]
    ref_feeder = DeviceFeeder(p, p.init_state(3), depth=2, planar=True)
    it = iter(chunks)
    expected = list(ref_feeder.run(lambda: next(it, None)))

    feeder = DeviceFeeder(
        p, p.init_state(3), depth=2, planar=True, copy_chunks=False
    )
    pool = ChunkPool.for_feeder(feeder, 3)
    assert len(pool) == feeder.depth + 1
    got = []
    for c in chunks:
        buf = pool.next()
        buf[:] = c                      # "drain" into the rotating slot
        done = feeder.push(buf)
        if done is not None:
            got.append(done)
    got.extend(feeder.flush())
    assert len(got) == 7
    for g, e in zip(got, expected):
        np.testing.assert_array_equal(g, e)

    with pytest.raises(ValueError):
        ChunkPool(1, (2, 2))


def test_feeder_int16_wire_path(rng):
    """The half-bandwidth wire format end-to-end at the feeder level: an
    int16 ChunkPool drained from a RingBank16 raw and pushed as-is must
    produce byte-identical rows to the f32 drain of the same PCM."""
    import jax.numpy as jnp
    from spectrogram_tpu.config import SpectrogramConfig
    from spectrogram_tpu.io import ring as ring_mod
    from spectrogram_tpu.io.feeder import ChunkPool, DeviceFeeder
    from spectrogram_tpu.models.spectrogram import SpectrogramPipeline

    if not ring_mod.native_available():
        pytest.skip("native ring library unavailable")
    cfg = SpectrogramConfig(
        sample_rate=8000.0, window_period=0.032, hop_period=0.008,
        viewport_height=64, viewport_rows=16,
    )
    p = SpectrogramPipeline(cfg, chunk_hops=2)
    s = 3
    words = rng.integers(
        -32768, 32768, size=(s, 4 * p.chunk_size, 2)
    ).astype(np.int16)

    def run(wire):
        bank = ring_mod.RingBank16(s, 4096)
        bank.push_matrix(words)
        feeder = DeviceFeeder(p, p.init_state(s), depth=2, planar=True,
                              copy_chunks=False)
        pool = ChunkPool.for_feeder(feeder, s, dtype=wire)
        got = []
        for _ in range(4):
            buf = pool.next()
            if wire == np.int16:
                bank.pop_matrix_i16_planar(p.chunk_size, out=buf)
            else:
                bank.pop_matrix_f32_planar(p.chunk_size, out=buf)
            done = feeder.push(buf)
            if done is not None:
                got.append(done)
        got.extend(feeder.flush())
        return got

    for g16, g32 in zip(run(np.int16), run(np.float32)):
        np.testing.assert_array_equal(g16, g32)
