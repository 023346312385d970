"""Live-capture path integration tests with an injected fake `sounddevice`.

The image has no audio service, so `CaptureSource` — the one L1 component
with no end-to-end evidence anywhere else — is driven here against an
in-process fake of the exact sounddevice surface it touches
(query_devices / default.device / InputStream with a real-time callback
and an input_overflow status).  Covers the reference capture behaviors:

- default-first device enumeration (audio_input_list_model.rs:120-124),
  output-only devices excluded,
- mono duplication / stereo passthrough at the callback edge (:66-76),
- registry `select` = pause -> reconfigure -> play, with the sample-rate
  notify firing on rate changes only (:35-83, :53-54),
- counted (never silent) capture overflows,
- and the full L1->L5 slice: callback frames -> native SPSC ring ->
  device pipeline -> a colormapped row whose bright band sits at the
  tone's log-frequency position.
"""

import math
import sys
import types

import numpy as np
import pytest

FAKE_DEVICES = [
    # index 0: mono USB mic at 16 kHz (not the default)
    {"name": "USB Mic", "max_input_channels": 1, "default_samplerate": 16000.0},
    # index 1: the default stereo input at 8 kHz
    {"name": "Built-in", "max_input_channels": 2, "default_samplerate": 8000.0},
    # index 2: output-only — must never appear as an input
    {"name": "Speakers", "max_input_channels": 0, "default_samplerate": 48000.0},
]


def _make_fake_sd(devices=FAKE_DEVICES, default_index=1):
    sd = types.ModuleType("sounddevice")
    sd.streams = []  # every InputStream ever constructed, for test access

    def query_devices(device=None, kind=None):
        if device is None:
            return [dict(d) for d in devices]
        return dict(devices[device])

    sd.query_devices = query_devices
    sd.default = types.SimpleNamespace(device=(default_index, None))

    class InputStream:
        def __init__(self, device=None, channels=2, samplerate=8000.0,
                     dtype="float32", callback=None):
            if devices[device if device is not None else default_index][
                "max_input_channels"
            ] < channels:
                raise ValueError("channel count exceeds device capability")
            self.device = device if device is not None else default_index
            self.channels = channels
            self.samplerate = float(samplerate)
            self.callback = callback
            self.running = False
            self.closed = False
            sd.streams.append(self)

        def start(self):
            assert not self.closed
            self.running = True

        def stop(self):
            self.running = False

        def close(self):
            self.running = False
            self.closed = True

        def deliver(self, frames: np.ndarray, overflow: bool = False):
            """Stand-in for the PortAudio real-time thread: one callback."""
            assert self.running, "callback fired on a stopped stream"
            status = types.SimpleNamespace(input_overflow=overflow)
            self.callback(frames, len(frames), None, status)

    sd.InputStream = InputStream
    return sd


@pytest.fixture
def fake_sd(monkeypatch):
    sd = _make_fake_sd()
    monkeypatch.setitem(sys.modules, "sounddevice", sd)
    return sd


def test_list_devices_default_first(fake_sd):
    from spectrogram_tpu.io import sources

    assert sources.CaptureSource.available()
    devs = sources.CaptureSource.list_devices()
    # output-only device excluded; default sorted to the front
    assert [d["name"] for d in devs] == ["Built-in", "USB Mic"]
    assert devs[0]["index"] == 1 and devs[0]["sample_rate"] == 8000.0


def test_capture_mono_duplicates_and_overflow_counted(fake_sd):
    from spectrogram_tpu.io import sources
    from spectrogram_tpu.io.ring import StereoRing

    ring = StereoRing(4096)
    src = sources.CaptureSource(ring, device=0)  # mono device
    assert src.sample_rate == 16000.0
    src.start()
    stream = fake_sd.streams[-1]
    assert stream.channels == 1  # min(max_input_channels, 2)

    mono = np.linspace(-0.5, 0.5, 64, dtype=np.float32)[:, None]
    stream.deliver(mono)
    stream.deliver(mono, overflow=True)
    stream.deliver(mono, overflow=True)
    assert src.overflows == 2  # upstream loss counted, never silent
    assert len(ring) == 192

    got = ring.pop(64)
    np.testing.assert_array_equal(got[:, 0], mono[:, 0])
    np.testing.assert_array_equal(got[:, 1], mono[:, 0])  # mono duplicated
    src.stop()
    src.close()
    assert stream.closed


def test_registry_select_pause_reconfigure_play(fake_sd):
    from spectrogram_tpu.io.registry import InputRegistry

    rates = []
    reg = InputRegistry(on_sample_rate=rates.append)
    # capture devices enumerate ahead of the synthetic sources, default first
    kinds = [d.kind for d in reg.inputs]
    assert kinds[:2] == ["capture", "capture"]
    assert reg.inputs[0].name == "Built-in"

    reg.select(0)  # default stereo @ 8 kHz
    assert rates == [8000.0]
    s0 = fake_sd.streams[-1]
    assert s0.running and s0.channels == 2

    stereo = np.stack([np.ones(32), -np.ones(32)], axis=-1).astype(np.float32)
    s0.deliver(stereo)
    assert len(reg.ring) == 32

    # switching inputs must stop AND close the old OS stream (pause ->
    # reconfigure -> play, audio_input_list_model.rs:35-83) and re-notify
    # only because the rate changed
    reg.select(1)  # mono @ 16 kHz
    assert s0.closed and not s0.running
    assert rates == [8000.0, 16000.0]
    s1 = fake_sd.streams[-1]
    assert s1.running and s1.device == 0

    # switching to a synthetic source closes the capture stream too
    reg.select(len(reg) - 3)
    assert s1.closed
    assert rates == [8000.0, 16000.0, 48000.0]
    reg.stop()


def test_capture_to_spectrogram_row(fake_sd):
    """Full slice: fake audio callback -> native ring -> pipeline push ->
    the tone's bright band lands at its log-frequency pixel row."""
    import jax.numpy as jnp

    from spectrogram_tpu.config import SpectrogramConfig
    from spectrogram_tpu.io import sources
    from spectrogram_tpu.io.ring import StereoRing
    from spectrogram_tpu.models.spectrogram import SpectrogramPipeline

    cfg = SpectrogramConfig(
        sample_rate=8000.0,
        window_period=0.064,  # window 512, padded 1024
        hop_period=0.016,     # hop 128
        viewport_height=128,
        viewport_rows=16,
    )
    pipeline = SpectrogramPipeline(cfg, chunk_hops=2, store_ring=False)
    state = pipeline.init_state(n_streams=1, palette_id=2)  # viridis

    ring = StereoRing(8192)
    src = sources.CaptureSource(ring, device=1)
    assert src.sample_rate == cfg.sample_rate
    src.start()
    stream = fake_sd.streams[-1]

    freq = 1000.0
    t = np.arange(4096) / cfg.sample_rate
    tone = (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)
    pcm = np.stack([tone, tone], axis=-1)
    for i in range(0, 4096, 256):  # ~32 ms callback blocks
        stream.deliver(pcm[i : i + 256])
    assert ring.dropped == 0

    rgba = None
    while len(ring) >= pipeline.chunk_size:
        chunk = ring.pop(pipeline.chunk_size)[None]  # [1, chunk, 2]
        state, rgba = pipeline.push(state, jnp.asarray(chunk))
    assert rgba is not None and rgba.shape == (1, 2, 128, 4)

    lum = np.asarray(rgba)[0, -1, :, :3].astype(int).sum(axis=-1)
    expected = (
        (math.log(freq) - math.log(cfg.min_frequency))
        / (math.log(cfg.max_frequency) - math.log(cfg.min_frequency))
        * cfg.viewport_height
    )
    assert abs(int(np.argmax(lum)) - expected) <= 2
    src.stop()
    src.close()
