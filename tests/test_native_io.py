"""Native C++ IO engine vs PIL golden parity."""

import numpy as np
import pytest
from PIL import Image

from image_processor_pipeline_tpu.io import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native IO engine did not build"
)


class TestDecode:
    def test_png_roundtrip_exact(self, tmp_path, rng):
        arr = rng.integers(0, 256, (37, 53, 3), dtype=np.uint8)
        p = tmp_path / "a.png"
        Image.fromarray(arr).save(p)
        buf, h, w, c = native.decode_to_canvas(p, (64, 64), 3)
        assert (h, w, c) == (37, 53, 3)
        np.testing.assert_array_equal(buf[:37, :53], arr)
        assert (buf[37:] == 0).all()

    def test_png_rgba(self, tmp_path, rng):
        arr = rng.integers(0, 256, (20, 30, 4), dtype=np.uint8)
        p = tmp_path / "a.png"
        Image.fromarray(arr).save(p)
        buf, h, w, c = native.decode_to_canvas(p, (32, 32), 4)
        assert c == 4
        np.testing.assert_array_equal(buf[:20, :30], arr)

    def test_jpeg_matches_pil_decode(self, tmp_path, rng):
        arr = rng.integers(0, 256, (40, 60, 3), dtype=np.uint8)
        p = tmp_path / "a.jpg"
        Image.fromarray(arr).save(p, quality=90)
        buf, h, w, c = native.decode_to_canvas(p, (64, 64), 3)
        ref = np.asarray(Image.open(p).convert("RGB"))
        # both use libjpeg; same bitstream should decode close to identically
        # (different libjpeg builds may differ by ±1 in IDCT rounding)
        diff = np.abs(buf[:40, :60].astype(int) - ref.astype(int))
        assert diff.max() <= 1

    def test_batch_decode_threaded(self, tmp_path, rng):
        paths = []
        refs = []
        for i in range(6):
            arr = rng.integers(0, 256, (30 + i, 40 + i, 3), dtype=np.uint8)
            p = tmp_path / f"b{i}.png"
            Image.fromarray(arr).save(p)
            paths.append(p)
            refs.append(arr)
        batch, dims = native.decode_batch(paths, (64, 64), 3, n_threads=3)
        assert batch.shape == (6, 64, 64, 3)
        for i, ref in enumerate(refs):
            assert tuple(dims[i][:2]) == ref.shape[:2]
            np.testing.assert_array_equal(
                batch[i, : ref.shape[0], : ref.shape[1]], ref
            )

    def test_missing_file(self, tmp_path):
        assert native.decode_to_canvas(tmp_path / "nope.png", (8, 8)) is None


class TestEncode:
    def test_png_encode_exact(self, tmp_path, rng):
        arr = rng.integers(0, 256, (25, 35, 4), dtype=np.uint8)
        p = tmp_path / "o.png"
        assert native.encode_png(p, arr)
        np.testing.assert_array_equal(np.asarray(Image.open(p)), arr)

    def test_jpeg_encode_readable(self, tmp_path, rng):
        arr = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
        p = tmp_path / "o.jpg"
        assert native.encode_jpeg(p, arr, quality=95)
        back = np.asarray(Image.open(p))
        assert back.shape == (32, 32, 3)


class TestYolo:
    def test_parse_matches_numpy(self, tmp_path):
        p = tmp_path / "l.txt"
        p.write_text("0 0.5 0.5 0.25 0.3\n2 0.1 0.9 0.05 0.05\n")
        cls, xywhn = native.parse_yolo(p)
        np.testing.assert_array_equal(cls, [0, 2])
        np.testing.assert_allclose(
            xywhn, [[0.5, 0.5, 0.25, 0.3], [0.1, 0.9, 0.05, 0.05]], rtol=1e-6
        )

    def test_empty_file(self, tmp_path):
        p = tmp_path / "e.txt"
        p.write_text("")
        cls, xywhn = native.parse_yolo(p)
        assert len(cls) == 0
