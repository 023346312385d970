"""CLI app-shell tests (C1): drive the argparse surface end to end on CPU."""

import numpy as np
import pytest

from spectrogram_tpu import app
from spectrogram_tpu.io.sources import SineSource, write_wav


def test_palettes_and_inputs(capsys):
    assert app.main(["palettes"]) == 0
    out = capsys.readouterr().out
    assert "Magma" in out and "Oranges" in out and out.count("\n") == 19
    assert app.main(["inputs"]) == 0
    out = capsys.readouterr().out
    assert "chirp" in out


def test_render_from_wav(tmp_path, capsys):
    wav = tmp_path / "tone.wav"
    write_wav(wav, SineSource(8000.0, 500.0, 500.0).next_block(4000), 8000)
    out_png = tmp_path / "out.png"
    rc = app.main([
        "render", str(wav), str(out_png),
        "--window", "0.032", "--hop", "0.016", "--height", "64",
        "--palette", "Viridis",
    ])
    assert rc == 0
    assert out_png.exists() and out_png.stat().st_size > 0
    assert "wrote" in capsys.readouterr().out


def test_render_synthetic_golden(tmp_path):
    out_png = tmp_path / "g.png"
    rc = app.main([
        "render", "--source", "sine", str(out_png), "--golden",
        "--seconds", "0.2", "--sample-rate", "8000",
        "--window", "0.032", "--hop", "0.016", "--height", "48",
    ])
    assert rc == 0 and out_png.exists()


def test_render_file_requires_input():
    with pytest.raises(SystemExit):
        app.main(["render", "out.png", "--source", "file"])


def test_top_level_exports():
    import spectrogram_tpu as sg

    assert sg.SpectrogramPipeline.__name__ == "SpectrogramPipeline"
    assert sg.LiveSession.__name__ == "LiveSession"
    with pytest.raises(AttributeError):
        sg.nonexistent_symbol
