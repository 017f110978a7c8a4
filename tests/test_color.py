"""Color pipeline tests: LUT vs closed form, quantization quirks, stereo."""

import numpy as np

from chess2rt_tpu.utils.color import (
    SRGB_COMPRESS_LUT,
    combine_stereo,
    decompress_gamma,
    decompress_gamma_srgb,
    srgb_u8,
    to_rgb32,
    too_different,
)


def _convert_to_8bit_srgb_scalar(x: float) -> int:
    """Direct transliteration of convertTo8bit_sRGB (color.d:194-207)."""
    if x <= 0:
        return 0
    if x >= 1:
        return 255
    xf = np.float32(x)
    if xf <= np.float32(0.0031308):
        xf = np.float32(xf * np.float32(12.02))
    else:
        xf = np.float32(1.055 * float(xf) ** (1 / 2.4) - 0.055)
    return int(np.floor(xf * np.float32(255.0)))


def test_lut_matches_scalar_reference():
    for i in range(0, 4097, 7):
        assert SRGB_COMPRESS_LUT[i] == _convert_to_8bit_srgb_scalar(i / np.float32(4096.0)), i
    assert SRGB_COMPRESS_LUT[0] == 0
    assert SRGB_COMPRESS_LUT[4096] == 255


def test_srgb_u8_cached_semantics():
    # cached lookup quantizes by int(x*4096) (color.d:209-214)
    xs = np.array([0.0, -0.5, 1.0, 2.0, 0.5, 0.0031, 0.25], np.float32)
    got = srgb_u8(xs)
    expect = []
    for x in xs:
        if x <= 0:
            expect.append(0)
        elif x >= 1:
            expect.append(255)
        else:
            expect.append(SRGB_COMPRESS_LUT[int(np.float32(x) * np.float32(4096.0))])
    np.testing.assert_array_equal(got, np.array(expect, np.uint8))


def test_srgb_u8_jax_matches_numpy():
    import jax.numpy as jnp

    xs = np.linspace(-0.1, 1.1, 1000).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(srgb_u8(jnp.asarray(xs))), srgb_u8(xs))


def test_linear_segment_uses_12_02():
    # preserved reference quirk: 12.02, not 12.92 (color.d:201)
    x = np.float32(0.002)
    assert srgb_u8(x) == int(np.floor(np.float32(int(x * 4096) / 4096.0) * np.float32(12.02) * np.float32(255.0)))


def test_to_rgb32_packing():
    c = np.array([1.0, 0.0, 1.0], np.float32)
    v = int(to_rgb32(c))
    assert v == (255 << 16) | (0 << 8) | 255


def test_decompress_gamma_srgb_endpoints():
    x = np.array([0.0, 1.0, 0.04045, 0.5], np.float32)
    y = decompress_gamma_srgb(x)
    assert y[0] == 0.0 and y[1] == 1.0
    assert np.isclose(y[2], 0.04045 / 12.92, rtol=1e-6)
    assert np.isclose(y[3], ((0.5 + 0.055) / 1.055) ** 2.4, rtol=1e-5)
    y2 = decompress_gamma(np.float32(0.5), 1.8)
    assert np.isclose(y2, 0.5**1.8, rtol=1e-6)


def test_combine_stereo_anaglyph():
    left = np.array([1.0, 0.0, 0.0], np.float32)
    right = np.array([0.0, 1.0, 0.0], np.float32)
    out = combine_stereo(left, right)
    # left desaturated: r = 1*.25 + (1/3)*.75 = 0.5; right same for g
    assert np.isclose(out[0], 0.5)
    assert np.isclose(out[1], 0.5)
    assert np.isclose(out[2], 1 / 3 * 0.75)


def test_too_different_threshold():
    a = np.array([0.5, 0.5, 0.5], np.float32)
    assert not too_different(a, a + 0.09)  # strictly-greater comparison
    assert too_different(a, a + 0.11)
