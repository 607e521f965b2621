"""bbox op unit tests (ultralytics-formula golden values, computed by hand
from the xywhn2xyxy / xyxy2xywhn definitions used at reference
crop_square.py:167,217 and overlays.py:146)."""

import numpy as np
import jax.numpy as jnp

from image_processor_pipeline_tpu.ops import bbox


class TestConversions:
    def test_xywhn2xyxy_known_values(self):
        x = jnp.asarray([[0.5, 0.5, 0.2, 0.4]])
        out = np.asarray(bbox.xywhn2xyxy(x, 100, 200))
        np.testing.assert_allclose(out, [[40.0, 60.0, 60.0, 140.0]], atol=1e-5)

    def test_roundtrip(self):
        rng = np.random.default_rng(0)
        cx = rng.uniform(0.2, 0.8, 16)
        cy = rng.uniform(0.2, 0.8, 16)
        w = rng.uniform(0.05, 0.3, 16)
        h = rng.uniform(0.05, 0.3, 16)
        xywhn = jnp.asarray(np.stack([cx, cy, w, h], -1), jnp.float32)
        xyxy = bbox.xywhn2xyxy(xywhn, 640, 480)
        back = np.asarray(bbox.xyxy2xywhn(xyxy, 640, 480))
        np.testing.assert_allclose(back, np.asarray(xywhn), atol=1e-5)

    def test_clip(self):
        x = jnp.asarray([[-5.0, -2.0, 700.0, 500.0]])
        out = np.asarray(bbox.clip_boxes(x, (480, 640)))
        np.testing.assert_allclose(out, [[0, 0, 640, 480]])


class TestCropLogic:
    def test_shift_and_valid(self):
        boxes = jnp.asarray([
            [10.0, 10.0, 50.0, 50.0],
            [150.0, 150.0, 190.0, 190.0],
        ])
        shifted = bbox.shift_boxes(boxes, 100.0, 100.0)
        clipped = bbox.clip_boxes(shifted, (100, 100))
        valid = np.asarray(bbox.valid_boxes(clipped))
        # first box fully left of the crop → degenerate; second inside
        assert valid.tolist() == [False, True]

    def test_union_with_mask(self):
        boxes = jnp.asarray([
            [10.0, 20.0, 30.0, 40.0],
            [5.0, 50.0, 15.0, 70.0],
            [999.0, 999.0, 1000.0, 1000.0],  # masked out
        ])
        mask = jnp.asarray([True, True, False])
        u = np.asarray(bbox.union_box(boxes, mask))
        np.testing.assert_allclose(u, [5.0, 20.0, 30.0, 70.0])
