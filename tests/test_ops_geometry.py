"""Golden parity tests for geometric ops vs cv2/PIL host references."""

import numpy as np
import pytest
import jax.numpy as jnp
from PIL import Image

from image_processor_pipeline_tpu.io.batching import canvas_for, pad_to_canvas
from image_processor_pipeline_tpu.ops import geometry


def _padded(arr):
    h, w = arr.shape[:2]
    canvas = canvas_for(h, w)
    return jnp.asarray(pad_to_canvas(arr, canvas)), h, w


class TestFlips:
    def test_flip_h_matches_cv2(self, rgb_image):
        cv2 = pytest.importorskip("cv2")
        img, h, w = _padded(rgb_image)
        out = np.asarray(geometry.flip_h(img, h, w))[:h, :w]
        np.testing.assert_array_equal(out, cv2.flip(rgb_image, 1))

    def test_flip_v_matches_cv2(self, rgb_image):
        cv2 = pytest.importorskip("cv2")
        img, h, w = _padded(rgb_image)
        out = np.asarray(geometry.flip_v(img, h, w))[:h, :w]
        np.testing.assert_array_equal(out, cv2.flip(rgb_image, 0))

    def test_flip_hv_matches_cv2(self, rgb_image):
        cv2 = pytest.importorskip("cv2")
        img, h, w = _padded(rgb_image)
        out = np.asarray(geometry.flip_hv(img, h, w))[:h, :w]
        np.testing.assert_array_equal(out, cv2.flip(rgb_image, -1))

    def test_padding_stays_zero(self, rgb_image):
        img, h, w = _padded(rgb_image)
        out = np.asarray(geometry.flip_h(img, h, w))
        assert (out[h:, :] == 0).all() and (out[:, w:] == 0).all()


class TestCrop:
    def test_crop_matches_slice(self, rgb_image):
        img, h, w = _padded(rgb_image)
        out = np.asarray(geometry.crop(img, 10, 20, 50, 60))
        np.testing.assert_array_equal(out[:50, :60], rgb_image[10:60, 20:80])
        assert (out[50:, :] == 0).all() and (out[:, 60:] == 0).all()

    def test_border_crop(self, rgb_image):
        img, h, w = _padded(rgb_image)
        out, ch, cw = geometry.border_crop(img, h, w, 5, 7, 3, 11)
        assert int(ch) == h - 12 and int(cw) == w - 14
        np.testing.assert_array_equal(
            np.asarray(out)[: int(ch), : int(cw)], rgb_image[5 : h - 7, 3 : w - 11]
        )


class TestContentBBox:
    def test_matches_pil_getbbox(self):
        arr = np.zeros((60, 70, 4), np.uint8)
        arr[12:40, 17:55] = [10, 20, 30, 255]
        img, h, w = _padded(arr)
        y0, x0, bh, bw = geometry.content_bbox(img, h, w)
        pil_box = Image.fromarray(arr).getbbox()  # (left, upper, right, lower)
        assert (int(x0), int(y0), int(x0 + bw), int(y0 + bh)) == pil_box

    def test_empty_image(self):
        arr = np.zeros((32, 32, 4), np.uint8)
        img, h, w = _padded(arr)
        y0, x0, bh, bw = geometry.content_bbox(img, h, w)
        assert int(bh) == 0 and int(bw) == 0

    def test_rgba_is_alpha_only(self):
        """Pillow >= 10 getbbox() defaults alpha_only=True on RGBA: a
        colored-but-transparent pixel must NOT extend the bbox."""
        arr = np.zeros((40, 50, 4), np.uint8)
        arr[10:20, 15:30] = [60, 70, 80, 255]
        arr[2, 3] = [200, 10, 10, 0]       # colored transparent
        arr[35, 45] = [0, 0, 99, 0]        # colored transparent
        img, h, w = _padded(arr)
        y0, x0, bh, bw = geometry.content_bbox(img, h, w)
        pil_box = Image.fromarray(arr).getbbox()
        assert pil_box == (15, 10, 30, 20)  # alpha bbox, not any-channel
        assert (int(x0), int(y0), int(x0 + bw), int(y0 + bh)) == pil_box

    def test_rgb_is_any_channel(self):
        """Without an alpha channel PIL getbbox considers every band."""
        arr = np.zeros((30, 30, 3), np.uint8)
        arr[5:9, 7:12, 1] = 44
        img, h, w = _padded(arr)
        y0, x0, bh, bw = geometry.content_bbox(img, h, w)
        pil_box = Image.fromarray(arr).getbbox()
        assert (int(x0), int(y0), int(x0 + bw), int(y0 + bh)) == pil_box


class TestRotateExpand:
    @pytest.mark.parametrize("angle", [17.0, 45.0, 123.4, 260.0, 359.0])
    def test_nearest_close_to_pil(self, angle):
        rng = np.random.default_rng(0)
        arr = rng.integers(0, 256, size=(50, 70, 4), dtype=np.uint8)
        arr[..., 3] = 255
        img, h, w = _padded(arr)
        out, h2, w2 = geometry.rotate_expand(img, h, w, angle, "nearest")
        out = np.asarray(out)

        pil = Image.fromarray(arr).rotate(angle, expand=True)
        ref = np.asarray(pil)
        # canvas sizes may differ by ±1 px from PIL's corner rounding
        assert abs(int(h2) - ref.shape[0]) <= 1
        assert abs(int(w2) - ref.shape[1]) <= 1
        hh = min(int(h2), ref.shape[0])
        ww = min(int(w2), ref.shape[1])
        ours = out[:hh, :ww].astype(np.int32)
        theirs = ref[:hh, :ww].astype(np.int32)
        # nearest sampling: all but a thin boundary band must match exactly
        match = (ours == theirs).all(axis=-1).mean()
        assert match > 0.97, f"pixel match {match:.4f} at angle {angle}"

    def test_rot90_shape(self):
        arr = np.zeros((40, 60, 4), np.uint8)
        arr[..., :3] = 7
        arr[..., 3] = 255
        img, h, w = _padded(arr)
        out, h2, w2 = geometry.rotate_expand(img, h, w, 90.0, "nearest")
        assert int(h2) == 60 and int(w2) == 40


class TestResize:
    @pytest.mark.parametrize("method,pil_filter", [
        ("bilinear", Image.BILINEAR),
        ("lanczos", Image.LANCZOS),
    ])
    @pytest.mark.parametrize("out_size", [(30, 45), (100, 140), (64, 64)])
    def test_matches_pil(self, method, pil_filter, out_size):
        rng = np.random.default_rng(1)
        arr = rng.integers(0, 256, size=(57, 83, 3), dtype=np.uint8)
        img, h, w = _padded(arr)
        oh, ow = out_size
        out_canvas = canvas_for(oh, ow)
        out = np.asarray(
            geometry.resize(img, h, w, oh, ow, method, out_canvas=out_canvas)
        )[:oh, :ow]
        ref = np.asarray(Image.fromarray(arr).resize((ow, oh), pil_filter))
        diff = np.abs(out.astype(np.int32) - ref.astype(np.int32))
        # PIL uses 8-bit fixed-point filter weights; allow ±2
        assert diff.max() <= 2, f"max diff {diff.max()}"


class TestRotateBilinear:
    """rotate_expand('bilinear') with a host-known angle runs the PIL-EXACT
    path (ops/geometry.py:_rotate_bilinear_exact): Pillow's float64 affine
    matrix + double-double device arithmetic + the transpose fast path at
    quarter turns.  Output equals Image.rotate(..., BILINEAR) EXACTLY at
    every pixel except the degenerate half-lattice set — pixels whose REAL
    source coordinate lies exactly on a floor/fill boundary (rotation-
    symmetry points), where Pillow's ~1e-15 double rounding error and our
    ~1e-13-accurate double-double value can land on opposite sides.  Those
    are identifiable from PIL's own matrix and bounded at ±1 in PIL's
    compute domain (premultiplied for RGBA, so ±255/alpha in RGB)."""

    @staticmethod
    def _degenerate_mask(angle, h, w, h2, w2, tol=1e-9):
        """Pixels whose PIL double source coordinate is within ``tol`` of
        the half-integer lattice (ambiguous floor/fill/truncation)."""
        m, _nw, _nh = geometry._pil_rotate_matrix(w, h, angle)
        ys, xs = np.mgrid[0:h2, 0:w2]
        xf = xs + 0.5
        yf = ys + 0.5
        xin = m[0] * xf + m[1] * yf + m[2]
        yin = m[3] * xf + m[4] * yf + m[5]

        def near_half_lattice(v):
            return np.abs(2.0 * v - np.rint(2.0 * v)) < 2.0 * tol

        return near_half_lattice(xin) | near_half_lattice(yin)

    @pytest.mark.parametrize("channels", [3, 4])
    @pytest.mark.parametrize("angle", [20.0, 155.0, 305.0, 47.3, 90.0,
                                       180.0, 270.0])
    def test_bilinear_pil_parity(self, angle, channels):
        rng = np.random.default_rng(3)
        arr = rng.integers(0, 256, size=(48, 64, channels), dtype=np.uint8)
        img, h, w = _padded(arr)
        out, h2, w2 = geometry.rotate_expand(img, h, w, angle, "bilinear")
        out = np.asarray(out)
        ref = np.asarray(
            Image.fromarray(arr).rotate(angle, expand=True,
                                        resample=Image.BILINEAR)
        )
        assert (int(h2), int(w2)) == ref.shape[:2]
        ours = out[:int(h2), :int(w2)].astype(np.int32)
        theirs = ref.astype(np.int32)
        diff = np.abs(ours - theirs).max(axis=-1)

        if angle % 90.0 == 0.0:
            # quarter turns ride the transpose fast path — fully exact
            assert diff.max() == 0
            return
        degen = self._degenerate_mask(angle, h, w, int(h2), int(w2))
        assert diff[~degen].max(initial=0) == 0, (
            f"{(diff[~degen] > 0).sum()} non-degenerate pixel(s) differ, "
            f"max {diff[~degen].max(initial=0)}")
        # degenerate set: ±1 in PIL's compute domain (premultiplied for
        # RGBA → the unpremultiply floor(c'*255/a) amplifies by 255/a)
        if degen.any():
            assert degen.mean() < 0.05
            if channels == 4:
                a_min = np.maximum(
                    np.minimum(ours[..., 3], theirs[..., 3]), 1)
                allowed = 255 // a_min + 1
                assert (np.abs(ours - theirs)[..., 3][degen] <= 1).all()
                assert (np.abs(ours[..., :3] - theirs[..., :3]).max(-1)
                        <= allowed)[degen].all()
            else:
                assert diff[degen].max() <= 1

    @pytest.mark.parametrize("trial", range(6))
    def test_bilinear_pil_parity_fuzz(self, trial):
        rng = np.random.default_rng(100 + trial)
        channels = 3 if trial % 2 == 0 else 4
        angle = float(rng.uniform(-360.0, 720.0))
        hh = int(rng.integers(5, 90))
        ww = int(rng.integers(5, 90))
        arr = rng.integers(0, 256, size=(hh, ww, channels), dtype=np.uint8)
        img, h, w = _padded(arr)
        out, h2, w2 = geometry.rotate_expand(img, h, w, angle, "bilinear")
        ref = np.asarray(
            Image.fromarray(arr).rotate(angle, expand=True,
                                        resample=Image.BILINEAR)
        )
        assert (int(h2), int(w2)) == ref.shape[:2]
        ours = np.asarray(out)[:int(h2), :int(w2)].astype(np.int32)
        diff = np.abs(ours - ref.astype(np.int32)).max(axis=-1)
        degen = self._degenerate_mask(angle, h, w, int(h2), int(w2))
        assert diff[~degen].max(initial=0) == 0
