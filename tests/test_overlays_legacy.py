"""Deprecated overlay-pair variant (reference overlays.py:190-354)."""

import numpy as np
import pytest
from PIL import Image

from image_processor_pipeline_tpu.transforms import process_overlay_pair
from image_processor_pipeline_tpu.io.labels import read_yolo_labels


@pytest.fixture
def pair(tmp_path, rng):
    ov = rng.integers(0, 256, (20, 30, 4), dtype=np.uint8)
    ov[..., 3] = 255
    bg = rng.integers(0, 256, (80, 120, 3), dtype=np.uint8)
    ov_p = tmp_path / "ov.png"
    bg_p = tmp_path / "bg.jpg"
    Image.fromarray(ov).save(ov_p)
    Image.fromarray(bg).save(bg_p)
    (tmp_path / "oi").mkdir()
    (tmp_path / "ol").mkdir()
    return ov_p, bg_p, tmp_path


def test_places_and_labels(pair):
    ov_p, bg_p, root = pair
    with pytest.deprecated_call():
        out = process_overlay_pair(
            ov_p, bg_p, [root / "oi", root / "ol"], yolo_class_id=3
        )
    assert out == [root / "oi" / "ov.jpg", root / "ol" / "ov.txt"]
    cls, xywhn = read_yolo_labels(out[1])
    assert cls[0] == 3
    # longer side scale within [0.1, 0.35] of min(bg dims)
    w_abs = xywhn[0, 2] * 120
    assert 0.1 * 80 - 1 <= w_abs <= 0.35 * 80 + 1
    with Image.open(out[0]) as im:
        assert im.size == (120, 80)


def test_insufficient_dirs_returns_none(pair):
    ov_p, bg_p, root = pair
    with pytest.deprecated_call():
        assert process_overlay_pair(ov_p, bg_p, [root / "oi"]) is None
