"""Palette registry and LUT tests (vs colorous/d3 reference values and the
LUT construction quirks of reference src/colorscheme.rs:73-91)."""

import numpy as np
import pytest

from spectrogram_tpu.color.colorscheme import (
    DEFAULT_COLOR_SCHEMES,
    ColorScheme,
    scheme_by_name,
    scheme_index,
    stacked_backgrounds,
    stacked_lookup_tables,
)
from spectrogram_tpu.color.gradients import GRADIENTS, eval_u8


def test_nineteen_schemes_in_reference_order():
    # colorscheme.rs:125-151
    assert len(DEFAULT_COLOR_SCHEMES) == 19
    assert DEFAULT_COLOR_SCHEMES[0].name == "Blue-Yellow-Red (Stereo)"
    assert DEFAULT_COLOR_SCHEMES[1].name == "Magma"
    assert DEFAULT_COLOR_SCHEMES[2].name == "Viridis"
    assert DEFAULT_COLOR_SCHEMES[12].name == "Turbo"
    assert DEFAULT_COLOR_SCHEMES[18].name == "Oranges"
    assert scheme_index("Magma") == 1
    stereo = [s for s in DEFAULT_COLOR_SCHEMES if s.is_stereo]
    assert len(stereo) == 6
    assert all(s.background == (0, 0, 0) for s in stereo)


def test_known_gradient_endpoints():
    v = GRADIENTS["VIRIDIS"]
    np.testing.assert_array_equal(eval_u8(v, 0.0), [68, 1, 84])
    np.testing.assert_array_equal(eval_u8(v, 1.0), [253, 231, 37])
    m = GRADIENTS["MAGMA"]
    np.testing.assert_array_equal(eval_u8(m, 0.0), [0, 0, 4])
    np.testing.assert_array_equal(eval_u8(m, 1.0), [252, 253, 191])
    # B-spline endpoints coincide with ColorBrewer endpoint control colors.
    r = eval_u8(GRADIENTS["RED_YELLOW_BLUE"], 0.0)
    assert abs(int(r[0]) - 165) <= 1 and int(r[2]) <= 40
    b = eval_u8(GRADIENTS["RED_YELLOW_BLUE"], 1.0)
    assert abs(int(b[2]) - 149) <= 1
    # d3 default cubehelix runs black -> white.
    ch = GRADIENTS["CUBEHELIX"]
    np.testing.assert_array_equal(eval_u8(ch, 0.0), [0, 0, 0])
    np.testing.assert_array_equal(eval_u8(ch, 1.0), [255, 255, 255])


def test_gradient_clamps_out_of_range():
    v = GRADIENTS["VIRIDIS"]
    np.testing.assert_array_equal(eval_u8(v, -3.0), eval_u8(v, 0.0))
    np.testing.assert_array_equal(eval_u8(v, 7.0), eval_u8(v, 1.0))


def test_lookup_table_mono():
    lut = scheme_by_name("Viridis").lookup_table(32)
    assert lut.shape == (32, 32, 4)
    # mono: alpha always 1, color varies along magnitude axis only
    np.testing.assert_array_equal(lut[:, :, 3], 1.0)
    np.testing.assert_allclose(lut[:, 0, :3], lut[:, 17, :3])
    # channels divided by 256 (colorscheme.rs:86) so never reach 1.0
    assert lut[:, :, :3].max() <= 255.0 / 256.0 + 1e-7
    # magnitude 0 -> viridis(0) = (68,1,84)/256
    np.testing.assert_allclose(lut[0, 0, :3], np.array([68, 1, 84]) / 256.0, atol=1e-6)


def test_lookup_table_stereo_reversed_pan_and_alpha():
    scheme = scheme_by_name("Blue-Yellow-Red (Stereo)")
    res = 32
    lut = scheme.lookup_table(res)
    i = np.arange(res, dtype=np.float32) / (res - 1)
    # alpha = magnitude coordinate (colorscheme.rs:87 stereo branch)
    np.testing.assert_allclose(lut[:, 0, 3], i, atol=1e-6)
    np.testing.assert_allclose(lut[:, -1, 3], i, atol=1e-6)
    # pan axis reversed: column j stores gradient(1 - j/(res-1)) (colorscheme.rs:81)
    g0 = eval_u8(scheme.gradient, 1.0).astype(np.float32) / 256.0
    np.testing.assert_allclose(lut[5, 0, :3], g0, atol=1e-6)
    gend = eval_u8(scheme.gradient, 0.0).astype(np.float32) / 256.0
    np.testing.assert_allclose(lut[5, -1, :3], gend, atol=1e-6)


def test_color_for_laws():
    mono = scheme_by_name("Viridis")
    rgb, alpha = mono.color_for(0.0, 0.0)
    assert alpha == 1.0
    # silence: 10*log10(1e-7) = -70 dB -> bounded 0 -> gradient(0)
    np.testing.assert_array_equal(rgb, [68, 1, 84])
    stereo = scheme_by_name("Blue-Yellow-Red (Stereo)")
    rgb_l, a_l = stereo.color_for(0.1, 0.0)
    rgb_r, a_r = stereo.color_for(0.0, 0.1)
    assert a_l == pytest.approx(a_r)
    assert not np.array_equal(rgb_l, rgb_r)  # pan separates channels
    # full-left -> pan 1.0, full-right -> pan 0.0
    np.testing.assert_array_equal(rgb_l, eval_u8(stereo.gradient, 1.0))
    np.testing.assert_array_equal(rgb_r, eval_u8(stereo.gradient, 0.0))


def test_background_and_foreground():
    assert scheme_by_name("Blue-Yellow-Red (Stereo)").background_color() == (0, 0, 0)
    assert scheme_by_name("Viridis").background_color() == (68, 1, 84)
    bgs = stacked_backgrounds()
    assert bgs.shape == (19, 3)


def test_stacked_luts():
    stack = stacked_lookup_tables(16)
    assert stack.shape == (19, 16, 16, 4)
    np.testing.assert_allclose(
        stack[scheme_index("Magma")], scheme_by_name("Magma").lookup_table(16)
    )
