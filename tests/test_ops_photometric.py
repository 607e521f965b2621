"""Photometric enhancement parity vs PIL ImageEnhance / ImageFilter."""

import numpy as np
import pytest
import jax.numpy as jnp
from PIL import Image, ImageEnhance, ImageFilter

from image_processor_pipeline_tpu.ops import photometric


@pytest.fixture
def small_rgb(rng):
    return rng.integers(0, 256, size=(48, 64, 3), dtype=np.uint8)


def _maxdiff(a, b):
    return np.abs(a.astype(np.int32) - b.astype(np.int32)).max()


class TestEnhance:
    # 0.5 and 1.5 are adversarial: every odd value lands on an exact .5,
    # where PIL's truncating blend, round-half-even, and round-half-up all
    # disagree — these factors pin the exact (UINT8)-cast semantics.
    @pytest.mark.parametrize("factor", [0.5, 0.7, 1.0, 1.3, 1.5, 2.0])
    def test_brightness(self, small_rgb, factor):
        ours = np.asarray(photometric.brightness(jnp.asarray(small_rgb), factor))
        ref = np.asarray(
            ImageEnhance.Brightness(Image.fromarray(small_rgb)).enhance(factor)
        )
        np.testing.assert_array_equal(ours, ref)

    def test_brightness_exhaustive_values(self):
        # every uint8 value × a dense factor sweep, bit-exact vs PIL
        vals = np.arange(256, dtype=np.uint8)
        im = Image.fromarray(vals.reshape(16, 16))
        for factor in np.linspace(0.05, 2.0, 40):
            factor = float(factor)
            ref = np.asarray(
                ImageEnhance.Brightness(im).enhance(factor)).ravel()
            ours = np.asarray(
                photometric.brightness(jnp.asarray(vals), factor))
            np.testing.assert_array_equal(ours, ref, err_msg=f"f={factor}")

    @pytest.mark.parametrize("factor", [0.5, 0.7, 1.3, 1.5])
    def test_contrast(self, small_rgb, factor):
        ours = np.asarray(photometric.contrast(jnp.asarray(small_rgb), factor))
        ref = np.asarray(
            ImageEnhance.Contrast(Image.fromarray(small_rgb)).enhance(factor)
        )
        np.testing.assert_array_equal(ours, ref)

    def test_contrast_mean_tie(self):
        # an image whose luma mean lands exactly on k.5 exercises the
        # int(mean + 0.5) integer tie correction
        arr = np.zeros((2, 2, 3), np.uint8)
        arr[0, 0] = arr[0, 1] = 100
        arr[1, 0] = arr[1, 1] = 101  # L = 100,100,101,101 → mean 100.5
        ours = np.asarray(photometric.contrast(jnp.asarray(arr), 0.0))
        ref = np.asarray(ImageEnhance.Contrast(Image.fromarray(arr)).enhance(0.0))
        np.testing.assert_array_equal(ours, ref)

    @pytest.mark.parametrize("factor", [0.5, 0.7, 1.3, 1.5])
    def test_color(self, small_rgb, factor):
        ours = np.asarray(photometric.color_balance(jnp.asarray(small_rgb), factor))
        ref = np.asarray(
            ImageEnhance.Color(Image.fromarray(small_rgb)).enhance(factor)
        )
        np.testing.assert_array_equal(ours, ref)

    def test_color_random_wide(self, rng):
        # larger random sweep hits the fixed-point luma's ±1 boundary triples
        arr = rng.integers(0, 256, size=(256, 256, 3), dtype=np.uint8)
        for factor in (0.31, 0.5, 0.77, 1.19, 1.5, 1.93):
            ours = np.asarray(
                photometric.color_balance(jnp.asarray(arr), factor))
            ref = np.asarray(
                ImageEnhance.Color(Image.fromarray(arr)).enhance(factor))
            np.testing.assert_array_equal(ours, ref, err_msg=f"f={factor}")

    def test_channel_gains(self, small_rgb):
        gains = (0.8, 1.0, 1.2)
        ours = np.asarray(photometric.channel_gains(jnp.asarray(small_rgb), gains))
        ref = np.clip(np.rint(small_rgb.astype(np.float32) * gains), 0, 255)
        np.testing.assert_array_equal(ours, ref.astype(np.uint8))


class TestBlur:
    @pytest.mark.parametrize(
        "sigma", [0.5, 0.8, 1.0, 2.0, 2.5, 3.0, 0.1, 4.5])
    def test_gaussian_blur_close_to_pil(self, small_rgb, sigma):
        ours = np.asarray(photometric.gaussian_blur(jnp.asarray(small_rgb), sigma))
        ref = np.asarray(
            Image.fromarray(small_rgb).filter(ImageFilter.GaussianBlur(sigma))
        )
        # Pillow's exact integer fixed-point box pipeline: bit-exact
        np.testing.assert_array_equal(ours, ref)

    def test_blur_preserves_constant(self):
        arr = np.full((32, 32, 3), 99, np.uint8)
        out = np.asarray(photometric.gaussian_blur(jnp.asarray(arr), 2.0))
        np.testing.assert_array_equal(out, arr)

    @pytest.mark.parametrize("sigma", [0.8, 2.0, 3.0])
    def test_gaussian_blur_on_padded_canvas(self, rng, sigma):
        # ADVICE r1 (high): clamp-extension must happen at the VALID boundary,
        # not the canvas boundary — zero padding must not bleed into the
        # valid region's right/bottom edges.
        h, w = 100, 150
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        canvas = np.zeros((128, 256, 3), np.uint8)
        canvas[:h, :w] = img
        ours = np.asarray(
            photometric.gaussian_blur(jnp.asarray(canvas), sigma, h=h, w=w)
        )[:h, :w]
        ref = np.asarray(
            Image.fromarray(img).filter(ImageFilter.GaussianBlur(sigma))
        )
        np.testing.assert_array_equal(ours, ref)

    def test_enhance_blur_on_padded_canvas_matches_exact_size(self, rng):
        # enhance() with apply_blur on a padded canvas == enhance on the
        # exact-size image (padding is invisible).
        h, w = 50, 70
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        canvas = np.zeros((64, 128, 3), np.uint8)
        canvas[:h, :w] = img
        kwargs = dict(
            b_factor=1.2, c_factor=0.8, col_factor=1.1, blur_sigma=2.0,
            apply_blur=True, rgb_gains=jnp.ones(3), apply_rgb=False,
        )
        padded = np.asarray(
            photometric.enhance(jnp.asarray(canvas), h, w, **kwargs)
        )
        exact = np.asarray(
            photometric.enhance(jnp.asarray(img), h, w, **kwargs)
        )
        np.testing.assert_array_equal(padded[:h, :w], exact)
        # padding stays zero (padded-canvas invariant)
        assert padded[h:].max() == 0 and padded[:, w:].max() == 0


class TestContrastLargeCanvas:
    def test_mean_exact_beyond_uint32(self):
        # 5120² * 255 overflows uint32; the hi/lo split must keep the mean
        # exact (code-review r2 finding: wrapped mean returned 91)
        img = jnp.full((5120, 5120, 3), 255, jnp.uint8)
        out = np.asarray(photometric.contrast(img, 0.0))
        assert out.min() == out.max() == 255
