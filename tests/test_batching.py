"""Bucketizer / canvas-ladder unit tests."""

import numpy as np

from image_processor_pipeline_tpu.io.batching import (
    Bucketizer,
    bucket_dim,
    canvas_for,
    pad_to_canvas,
)


class TestLadder:
    def test_bucket_dim(self):
        assert bucket_dim(1) == 128
        assert bucket_dim(128) == 128
        assert bucket_dim(129) == 256
        assert bucket_dim(700) == 768
        assert bucket_dim(1025) == 1536
        assert bucket_dim(5000) == 5120

    def test_canvas_scale(self):
        assert canvas_for(300, 400) == (384, 512)
        # rotation-diagonal scale
        assert canvas_for(300, 400, scale=1.5) == (512, 640)

    def test_batch_ladder(self):
        assert Bucketizer.batch_ladder(1, 64) == [1]
        assert Bucketizer.batch_ladder(64, 64) == [64]
        assert Bucketizer.batch_ladder(65, 64) == [64, 1]
        assert Bucketizer.batch_ladder(200, 64) == [64, 64, 64, 8]
        assert Bucketizer.batch_ladder(5, 64) == [8]

    def test_batch_ladder_fixed_mode(self):
        # 'fixed': always pad to max_batch → one program per canvas
        assert Bucketizer.batch_ladder(5, 64, "fixed") == [64]
        assert Bucketizer.batch_ladder(65, 64, "fixed") == [64, 64]
        assert Bucketizer.batch_ladder(64, 64, "fixed") == [64]


class TestPadding:
    def test_pad_rgb(self):
        arr = np.ones((10, 20, 3), np.uint8)
        out = pad_to_canvas(arr, (32, 32))
        assert out.shape == (32, 32, 3)
        assert (out[:10, :20] == 1).all() and (out[10:] == 0).all()

    def test_promote_rgb_to_rgba(self):
        arr = np.ones((10, 20, 3), np.uint8)
        out = pad_to_canvas(arr, (32, 32), channels=4)
        assert out.shape == (32, 32, 4)
        assert (out[:10, :20, 3] == 255).all()
        assert (out[10:, :, 3] == 0).all()

    def test_gray_to_rgb(self):
        arr = np.full((8, 8, 1), 7, np.uint8)
        out = pad_to_canvas(arr, (16, 16), channels=3)
        assert (out[:8, :8] == 7).all()


class TestBucketizer:
    def test_groups_and_padding(self):
        b = Bucketizer(max_batch=4)
        for i in range(6):
            b.add(("a",), {"i": i})
        b.add(("b",), {"i": 99})
        batches = list(b.batches())
        sizes = sorted((key[0], len(chunk), n) for key, chunk, n in batches)
        assert sizes == [("a", 2, 2), ("a", 4, 4), ("b", 1, 1)]
