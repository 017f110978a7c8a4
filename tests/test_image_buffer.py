"""Image!C (image.d:18-60) and Buffer!T / UntypedBuffer (buffer.d:43-194)
container semantics, plus their live roles in the BMP codec."""

import numpy as np
import pytest

from chess2rt_tpu.imageio import Buffer, Image, image_from_2d, load_bmp, save_bmp


class TestImage:
    def test_alloc_and_index(self):
        img = Image(4, 3)
        assert (img.w, img.h) == (4, 3) and not img.empty
        img[2, 1] = 7
        assert img[2, 1] == 7
        assert img.scanline(1)[2] == 7

    def test_scanline_is_a_view(self):
        img = Image(4, 2)
        img.pixels[:] = 0
        img.scanline(0)[:] = 9
        assert img[3, 0] == 9 and img[3, 1] == 0

    def test_alloc_reuses_capacity(self):
        # image.d:33-42: shrink keeps the larger backing store
        img = Image(8, 8)
        backing = img.pixels
        img.alloc(4, 4)
        assert img.pixels is backing and (img.w, img.h) == (4, 4)
        img.alloc(16, 16)
        assert img.pixels is not backing

    def test_empty(self):
        assert Image().empty
        assert not Image(1, 1).empty

    def test_convert_to_dtype_and_callable(self):
        img = Image(2, 2)
        img.pixels[:] = [1, 2, 3, 4]
        f = img.convert_to(np.float32)  # convertTo!(float)(image)
        assert f.pixels.dtype == np.float32 and f.pixels.tolist() == [1, 2, 3, 4]
        doubled = img.convert_to(lambda a: a * 2)
        assert doubled.as_2d().tolist() == [[2, 4], [6, 8]]

    def test_from_2d_zero_copy(self):
        a = np.arange(6, dtype=np.uint32).reshape(2, 3)
        img = image_from_2d(a)
        img[0, 1] = 99
        assert a[1, 0] == 99

    def test_scanline_bounds(self):
        with pytest.raises(AssertionError):
            Image(2, 2).scanline(2)


class TestBuffer:
    def test_write_doubles_and_roundtrips(self):
        b = Buffer()
        b.write(b"ab")
        b.write_struct("<I", 0xDEADBEEF)
        b.write(b"z" * 100)  # forces doubling growth
        assert len(b) == 106
        assert b.read("<2s") == b"ab"
        assert b.read("<I") == 0xDEADBEEF
        assert b.read_array(100) == b"z" * 100
        assert len(b) == 0

    def test_wrap_read_skip_seek(self):
        b = Buffer(wrap=b"\x01\x02\x03\x04\x05")
        assert b.read("<B") == 1
        b.skip(1)
        assert b.read("<B") == 3
        b.seek(1)  # buffer.d:67-73: window restarts at position
        assert bytes(b) == b"\x02\x03\x04\x05"

    def test_consume_sink(self):
        got = []
        b = Buffer(wrap=b"abcdef")
        b.consume(4, got.append)
        assert got == [b"abcd"] and bytes(b) == b"ef"

    def test_read_past_window_asserts(self):
        b = Buffer(wrap=b"ab")
        with pytest.raises(AssertionError):
            b.read("<I")

    def test_seek_out_of_range_asserts(self):
        b = Buffer(wrap=b"ab")
        with pytest.raises(AssertionError):
            b.seek(2)


def test_codec_roundtrip_through_containers():
    # width a multiple of 4: the reference writer pads no scanlines, which
    # is only spec-loadable at such widths (bmp.py module docstring)
    rgb = np.linspace(0, 1, 8 * 4 * 3, dtype=np.float32).reshape(4, 8, 3)
    data = save_bmp(rgb, use_native=False)  # assembled via Buffer.write
    img = load_bmp(data)  # header parsed via Buffer.read
    assert (img.image.w, img.image.h) == (8, 4)
    # Image scanline view works over the decoded pixels
    assert img.image.scanline(0).shape == (8,)
    f = img.to_float_rgb()  # convert_to with the Color(uint) converter
    assert f.shape == (4, 8, 3) and f.dtype == np.float32
    # encode is byte-identical to the pre-Buffer writer output layout
    assert data[:2] == b"BM" and len(data) == 14 + 40 + 8 * 3 * 4
