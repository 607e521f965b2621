"""Decode edge cases: palette PNG, grayscale, 16-bit, RGBA→RGB forcing —
both the native engine and the PIL fallback must agree with PIL ground
truth."""

import numpy as np
import pytest
from PIL import Image

from image_processor_pipeline_tpu.io.images import decode_image, decode_padded


class TestModes:
    def test_palette_png(self, tmp_path, rng):
        arr = rng.integers(0, 256, (20, 30, 3), dtype=np.uint8)
        p = tmp_path / "pal.png"
        Image.fromarray(arr).convert("P", palette=Image.ADAPTIVE).save(p)
        ref = np.asarray(Image.open(p).convert("RGB"))
        got = decode_image(p, mode="RGB")
        np.testing.assert_array_equal(got, ref)
        buf, h, w, canvas = decode_padded(p, mode="RGB")
        np.testing.assert_array_equal(buf[:h, :w], ref)

    def test_grayscale_png_to_rgb(self, tmp_path, rng):
        arr = rng.integers(0, 256, (20, 30), dtype=np.uint8)
        p = tmp_path / "gray.png"
        Image.fromarray(arr, mode="L").save(p)
        ref = np.asarray(Image.open(p).convert("RGB"))
        got = decode_image(p, mode="RGB")
        np.testing.assert_array_equal(got, ref)

    def test_grayscale_native_bands(self, tmp_path, rng):
        arr = rng.integers(0, 256, (20, 30), dtype=np.uint8)
        p = tmp_path / "gray.png"
        Image.fromarray(arr, mode="L").save(p)
        got = decode_image(p)  # mode=None keeps native bands
        assert got.shape == (20, 30, 1)
        np.testing.assert_array_equal(got[:, :, 0], arr)

    def test_16bit_png(self, tmp_path, rng):
        arr16 = rng.integers(0, 65536, (12, 16), dtype=np.uint16)
        p = tmp_path / "deep.png"
        Image.fromarray(arr16).save(p)  # PIL infers I;16 from uint16
        got = decode_image(p, mode="RGB")
        assert got.shape == (12, 16, 3)
        assert got.dtype == np.uint8

    def test_rgba_to_rgb_drops_alpha(self, tmp_path, rng):
        arr = rng.integers(0, 256, (10, 10, 4), dtype=np.uint8)
        p = tmp_path / "a.png"
        Image.fromarray(arr).save(p)
        got = decode_image(p, mode="RGB")
        ref = np.asarray(Image.open(p).convert("RGB"))
        np.testing.assert_array_equal(got, ref)

    def test_rgb_to_rgba_opaque(self, tmp_path, rng):
        arr = rng.integers(0, 256, (10, 10, 3), dtype=np.uint8)
        p = tmp_path / "a.png"
        Image.fromarray(arr).save(p)
        buf, h, w, canvas = decode_padded(p, mode="RGBA")
        np.testing.assert_array_equal(buf[:h, :w, :3], arr)
        assert (buf[:h, :w, 3] == 255).all()
        assert (buf[h:, :, 3] == 0).all()

    def test_grayscale_jpeg(self, tmp_path, rng):
        arr = rng.integers(0, 256, (24, 24), dtype=np.uint8)
        p = tmp_path / "g.jpg"
        Image.fromarray(arr, mode="L").save(p, quality=95)
        ref = np.asarray(Image.open(p).convert("RGB"))
        got = decode_image(p, mode="RGB")
        diff = np.abs(got.astype(int) - ref.astype(int))
        assert diff.max() <= 1  # different libjpeg builds may round ±1
