"""HSV conversion / masking parity vs OpenCV."""

import numpy as np
import pytest
import jax.numpy as jnp

from image_processor_pipeline_tpu.io.batching import canvas_for, pad_to_canvas
from image_processor_pipeline_tpu.ops import color

cv2 = pytest.importorskip("cv2")


class TestRgbToHsv:
    def test_matches_cv2(self, rgb_image):
        ours = np.asarray(color.rgb_to_hsv_u8(jnp.asarray(rgb_image)))
        theirs = cv2.cvtColor(rgb_image, cv2.COLOR_RGB2HSV)
        # bit-exact: we replicate cv2's hsv_shift=12 fixed-point math
        np.testing.assert_array_equal(ours, theirs)

    def test_matches_cv2_exhaustive(self):
        """Every 2^24 RGB triple, bit-exact vs cv2's 8U conversion.

        The old float formulation (rint(255·diff/v) etc.) disagreed with
        cv2's fixed-point tables on 562,850 triples — S off by one at
        descale boundaries and H off across the 0/180 wrap (e.g.
        rgb(12,1,0): cv2 H=3 vs float H=2).  This sweep pins the exact
        integer reimplementation for good.
        """
        idx = np.arange(1 << 24, dtype=np.uint32)
        rgb = np.stack(
            [idx & 0xFF, (idx >> 8) & 0xFF, (idx >> 16) & 0xFF], -1
        ).astype(np.uint8).reshape(4096, 4096, 3)
        theirs = cv2.cvtColor(rgb, cv2.COLOR_RGB2HSV)
        ours = np.asarray(color.rgb_to_hsv_u8(jnp.asarray(rgb)))
        bad = (ours != theirs).any(-1)
        assert not bad.any(), (
            f"{bad.sum()} mismatching triples, first: "
            f"rgb={rgb[bad][0]} cv2={theirs[bad][0]} ours={ours[bad][0]}"
        )

    def test_gray_pixels(self):
        arr = np.full((4, 4, 3), 128, np.uint8)
        out = np.asarray(color.rgb_to_hsv_u8(jnp.asarray(arr)))
        assert (out[..., 0] == 0).all() and (out[..., 1] == 0).all()
        assert (out[..., 2] == 128).all()


class TestInRange:
    def test_matches_cv2_inrange(self, rgb_image):
        hsv = cv2.cvtColor(rgb_image, cv2.COLOR_RGB2HSV)
        lo, hi = (20, 40, 40), (80, 255, 255)
        theirs = cv2.inRange(hsv, lo, hi) > 0
        ours = np.asarray(color.in_range(jnp.asarray(hsv), lo, hi))
        np.testing.assert_array_equal(ours, theirs)


class TestColorMaskAlpha:
    def test_full_stack_close_to_cv2(self, rgb_image):
        h, w = rgb_image.shape[:2]
        canvas = canvas_for(h, w)
        img = jnp.asarray(pad_to_canvas(rgb_image, canvas))
        lowers = [(20, 40, 40), (100, 30, 30)]
        uppers = [(80, 255, 255), (140, 200, 220)]
        zones = [(0, 0, 0, 0), (10, 10, 5, 5)]
        alpha = np.asarray(
            color.color_mask_alpha(img, h, w, lowers, uppers, zones)
        )[:h, :w]

        hsv = cv2.cvtColor(rgb_image, cv2.COLOR_RGB2HSV)
        acc = np.zeros((h, w), bool)
        for lo, hi, (t, b, l, r) in zip(lowers, uppers, zones):
            m = cv2.inRange(hsv, lo, hi) > 0
            z = np.zeros((h, w), bool)
            z[t : h - b, l : w - r] = True
            acc |= m & z
        expected = np.where(acc, 0, 255).astype(np.uint8)
        np.testing.assert_array_equal(alpha, expected)

    def test_zone_restricts_mask(self):
        arr = np.zeros((32, 32, 3), np.uint8)
        arr[:, :] = (0, 255, 0)  # pure green
        canvas = canvas_for(32, 32)
        img = jnp.asarray(pad_to_canvas(arr, canvas))
        hsv_g = cv2.cvtColor(arr[:1, :1], cv2.COLOR_RGB2HSV)[0, 0]
        lo = (int(hsv_g[0]) - 5, 100, 100)
        hi = (int(hsv_g[0]) + 5, 255, 255)
        alpha = np.asarray(
            color.color_mask_alpha(img, 32, 32, [lo], [hi], [(8, 8, 8, 8)])
        )[:32, :32]
        assert (alpha[8:24, 8:24] == 0).all()      # masked inside zone
        assert (alpha[:8, :] == 255).all()          # untouched outside zone


class TestGimpScale:
    def test_rescale(self):
        # reference semantics: H floor-div 2, S/V ×2.55 unrounded
        assert color.gimp_to_cv_hsv((360, 100, 100)) == pytest.approx(
            (180, 255.0, 255.0))
        assert color.gimp_to_cv_hsv((0, 0, 0)) == (0, 0, 0)
        assert color.gimp_to_cv_hsv((101, 50, 50)) == pytest.approx(
            (50, 127.5, 127.5))
        with pytest.raises(ValueError):
            color.gimp_to_cv_hsv((400, 50, 50))

    def test_rescale_filter_cv_validation(self):
        with pytest.raises(ValueError):
            color.rescale_filter((200, 0, 0, 210, 255, 255), False)
        assert color.rescale_filter(
            (100, 80, 80, 130, 100, 100), True
        ) == pytest.approx((50, 204.0, 204.0, 65, 255.0, 255.0))
