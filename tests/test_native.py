"""Native C++ framebuffer codec vs the numpy reference implementation."""

import numpy as np
import pytest

from chess2rt_tpu import native
from chess2rt_tpu.imageio.bmp import load_bmp, save_bmp
from chess2rt_tpu.utils.color import srgb_u8


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


@pytest.fixture()
def rgb():
    rng = np.random.default_rng(42)
    img = rng.uniform(-0.1, 1.2, size=(33, 47, 3)).astype(np.float32)  # incl. out-of-gamut
    img[0, 0] = [0.0, 1.0, 0.5]
    return img


class TestSrgbQuantize:
    def test_matches_lut_exactly(self, lib, rgb):
        a = native.srgb_quantize(rgb)
        b = srgb_u8(rgb)
        np.testing.assert_array_equal(a, b)

    def test_boundaries(self, lib):
        x = np.array([[[-1.0, 0.0, 1.0]]], dtype=np.float32)
        np.testing.assert_array_equal(native.srgb_quantize(x)[0, 0], [0, 0, 255])

    def test_nonfinite_inputs(self, lib):
        """NaN/inf must not index out of the LUT (ADVICE round-1): NaN -> 0
        like the numpy path's clipped index, +/-inf -> saturation."""
        x = np.array([[[np.nan, np.inf, -np.inf]]], dtype=np.float32)
        np.testing.assert_array_equal(native.srgb_quantize(x)[0, 0], [0, 255, 0])


class TestBmpEncode:
    @pytest.mark.parametrize("pad", [False, True])
    @pytest.mark.parametrize("size", [(33, 47), (48, 64), (1, 1)])
    def test_byte_identical_to_python(self, lib, pad, size):
        rng = np.random.default_rng(7)
        img = rng.uniform(0, 1, size=(*size, 3)).astype(np.float32)
        a = save_bmp(img, pad_rows=pad, use_native=True)
        b = save_bmp(img, pad_rows=pad, use_native=False)
        assert a == b

    def test_roundtrip_through_loader(self, lib, rgb):
        data = save_bmp(np.clip(rgb, 0, 1), pad_rows=True)
        img = load_bmp(data)
        assert img.width == rgb.shape[1] and img.height == rgb.shape[0]
        # loader returns u8-derived floats; compare against the quantized source
        expect = srgb_u8(np.clip(rgb, 0, 1)).astype(np.float32) / 255.0
        np.testing.assert_allclose(img.to_float_rgb(), expect, atol=1 / 255.0 + 1e-6)
