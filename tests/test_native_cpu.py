"""Native CPU compute backend (native/ipp_cpu.cpp) equivalence.

The C++ kernels must be BYTE-IDENTICAL to the jit path (which is itself
pinned bit-exact against PIL / cv2 by test_ops_photometric / test_ops_color)
for every seed, size, and option combination — the engine switches between
the two paths based on the host's backend, so any divergence would make
results depend on where the pipeline ran.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from image_processor_pipeline_tpu.ops import native_cpu

pytestmark = pytest.mark.skipif(
    not native_cpu.available(), reason="native CPU compute lib unavailable"
)


def _rand_batch(rng, n=6, H=96, W=128):
    imgs = np.zeros((n, H, W, 3), np.uint8)
    sizes = np.zeros((n, 2), np.int32)
    for i in range(n):
        h = int(rng.integers(1, H + 1))
        w = int(rng.integers(1, W + 1))
        sizes[i] = (h, w)
        imgs[i, :h, :w] = rng.integers(0, 256, (h, w, 3), np.uint8)
    return imgs, sizes


class TestEnhanceNative:
    def _check(self, imgs, sizes, seeds, blur, rgb):
        from image_processor_pipeline_tpu.transforms.enhance import EnhanceImage

        t = EnhanceImage()
        batch = {
            "image": imgs, "size": sizes, "seed": seeds,
            "apply_blur": blur, "apply_rgb": rgb,
        }
        dev = t.device_fn({k: jnp.asarray(v) for k, v in batch.items()}, ())
        nat = t.native_fn(batch, (), {}, n_threads=2)
        assert nat is not None
        np.testing.assert_array_equal(np.asarray(dev["image"]), nat["image"])

    def test_random_images_many_seeds(self, rng):
        imgs, sizes = _rand_batch(rng)
        n = len(imgs)
        for base in (0, 7_654_321, 2**31):
            seeds = (base + np.arange(n)).astype(np.uint32)
            blur = rng.random(n) < 0.5
            gains = rng.random(n) < 0.5
            self._check(imgs, sizes, seeds, blur, gains)

    def test_uniform_images_hit_mean_ties(self, rng):
        # constant images make the contrast mean an exact tie candidate
        n, H, W = 8, 64, 64
        imgs = np.zeros((n, H, W, 3), np.uint8)
        sizes = np.zeros((n, 2), np.int32)
        for i in range(n):
            sizes[i] = (H, W)
            imgs[i, :, :] = rng.integers(0, 256, (3,), np.uint8)
        # half-lattice mean: two-value images split 50/50
        imgs[0, : H // 2] = 10
        imgs[0, H // 2:] = 11
        seeds = np.arange(n, dtype=np.uint32)
        self._check(imgs, sizes, seeds,
                    np.ones(n, bool), np.ones(n, bool))

    def test_tiny_and_one_pixel_sizes(self, rng):
        imgs = np.zeros((4, 32, 32, 3), np.uint8)
        sizes = np.asarray([(1, 1), (1, 32), (32, 1), (2, 3)], np.int32)
        for i, (h, w) in enumerate(sizes):
            imgs[i, :h, :w] = rng.integers(0, 256, (h, w, 3), np.uint8)
        self._check(imgs, sizes, np.arange(4, dtype=np.uint32),
                    np.ones(4, bool), np.zeros(4, bool))

    def test_against_pil_directly(self, rng):
        """Full-chain golden: native output == PIL composed by hand for a
        known factor set (bypassing jax.random)."""
        from PIL import Image, ImageEnhance, ImageFilter

        h, w = 57, 83
        img = rng.integers(0, 256, (h, w, 3), np.uint8)
        canvas = np.zeros((64, 96, 3), np.uint8)
        canvas[:h, :w] = img
        factors = np.asarray(
            [[0.8341, 1.2177, 0.7503, 2.1719, 1.0, 1.0, 1.0]], np.float32)
        flags = np.asarray([[1, 0]], np.uint8)
        out = native_cpu.enhance_batch(
            canvas[None], np.asarray([[h, w]], np.int32), factors, flags)
        im = Image.fromarray(img)
        im = ImageEnhance.Brightness(im).enhance(float(factors[0, 0]))
        im = ImageEnhance.Contrast(im).enhance(float(factors[0, 1]))
        im = ImageEnhance.Color(im).enhance(float(factors[0, 2]))
        im = im.filter(ImageFilter.GaussianBlur(float(factors[0, 3])))
        np.testing.assert_array_equal(out[0, :h, :w], np.asarray(im))
        assert not out[0, h:].any() and not out[0, :, w:].any()


class TestColorMaskNative:
    OPTS = {
        "color_ranges_to_exclude_hsv": [
            (0, 30, 30, 20, 255, 255),
            (100, 10, 10, 140, 200, 200),
            (160, 0, 0, 180, 255, 255),
        ],
        "zones": [(5, 5, 3, 3), None, (0, 10, 0, 0)],
    }

    def _check(self, imgs, sizes, opts):
        from image_processor_pipeline_tpu.transforms.filters import (
            ColorMaskTransparency,
        )

        t = ColorMaskTransparency()
        static = t.static_args(opts, None)
        dev = t.device_fn(
            {"image": jnp.asarray(imgs), "size": jnp.asarray(sizes),
             "seed": jnp.zeros(len(imgs), jnp.uint32)}, static)
        nat = t.native_fn(
            {"image": imgs, "size": sizes}, static, opts, n_threads=2)
        assert nat is not None
        np.testing.assert_array_equal(np.asarray(dev["alpha"]), nat["alpha"])

    def test_random_images(self, rng):
        imgs, sizes = _rand_batch(rng)
        self._check(imgs, sizes, self.OPTS)

    def test_gimp_scale_fractional_bounds(self, rng):
        imgs, sizes = _rand_batch(rng, n=3)
        opts = {
            "color_ranges_to_exclude_hsv": [(10, 30, 30, 50, 90, 95)],
            "use_gimp_scale": True,
        }
        self._check(imgs, sizes, opts)

    def test_all_2m_random_triples_vs_cv2(self, rng):
        """HSV conversion embedded in the mask agrees with cv2 on a large
        random sample (the jit path is exhaustively pinned; this guards the
        C++ table + sector logic independently)."""
        cv2 = pytest.importorskip("cv2")
        n = 1 << 21
        flat = rng.integers(0, 256, (n, 3), np.uint8)
        h = 1024
        img = flat.reshape(h, n // h // 1, 3)[: h, : n // h]
        hsv_ref = cv2.cvtColor(img, cv2.COLOR_RGB2HSV)
        # recover native HSV via three single-channel masks
        H, W = img.shape[:2]
        sizes = np.asarray([[H, W]], np.int32)
        for ch in range(3):
            ref_c = hsv_ref[..., ch].astype(np.int32)
            for bound in (0, 37, 91, 180 if ch == 0 else 255):
                bounds = np.zeros((1, 6), np.int32)
                bounds[0, 3:] = 255
                bounds[0, 3] = 180 if ch == 0 else 255
                bounds[0, ch] = bound        # lo[ch] = bound
                zones = np.zeros((1, 4), np.int32)
                alpha = native_cpu.colormask_batch(
                    img[None], sizes, bounds, zones)[0]
                # alpha==0 ⇔ pixel matched ⇔ ref_c >= bound
                np.testing.assert_array_equal(alpha == 0, ref_c >= bound)


class TestEngineNativeBackend:
    def test_pipeline_native_vs_jit_byte_identical(self, tmp_path, rng):
        """An engine run with native_compute=True produces byte-identical
        output files to native_compute=False (same seed)."""
        from PIL import Image
        from image_processor_pipeline_tpu.pipeline import ProcessingStep
        from image_processor_pipeline_tpu.transforms.enhance import EnhanceImage

        src = tmp_path / "src"
        src.mkdir()
        for i in range(6):
            arr = rng.integers(0, 256, (40 + i, 50, 3), np.uint8)
            Image.fromarray(arr).save(src / f"im{i}.png")
        outs = {}
        for mode in (False, True):
            out = tmp_path / f"out_{mode}"
            step = ProcessingStep(
                name=f"enh_{mode}", process_function=EnhanceImage(),
                input_dirs=[src], output_dirs=[out], seed=1234,
                options={"native_compute": mode}, save_log=False,
            )
            step.run()
            outs[mode] = {p.name: p.read_bytes() for p in sorted(out.iterdir())}
        assert outs[False].keys() == outs[True].keys()
        assert len(outs[True]) == 6
        for name in outs[True]:
            assert outs[False][name] == outs[True][name], name
