"""Hybrid JPEG encode: device color-convert + 4:2:0 downsample + islow
FDCT + quantization, host entropy-only write — byte-identical files vs a
full native/cv2/PIL pixel encode at the same quality.

Mirrors tests/test_jpeg_device.py (the decode direction).  Reference
encoders being replicated: cv2.imwrite q95 (crop_square.py:41) and PIL
Image.save q75 (tranfo.py:53) — both baseline 4:2:0 through libjpeg.
"""

import numpy as np
import pytest
import jax.numpy as jnp
from PIL import Image

from image_processor_pipeline_tpu.io import native
from image_processor_pipeline_tpu.ops import jpeg as djpeg

cv2 = pytest.importorskip("cv2")

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native engine unavailable")


def _caps(H, W):
    return ((H + 15) // 16) * 16, ((W + 15) // 16) * 16


def _canvas(img, cap_h, cap_w):
    """Padded-canvas invariant: valid region top-left, zeros outside."""
    H, W, C = img.shape
    out = np.zeros((cap_h, cap_w, C), np.uint8)
    out[:H, :W] = img
    return out


def _device_encode(path, img, quality, cap=None):
    H, W = img.shape[:2]
    cap_h, cap_w = cap or _caps(H, W)
    qtabs = djpeg.quality_qtabs(quality)
    cy, cc = djpeg.encode_start(
        jnp.asarray(_canvas(img, cap_h, cap_w)[None]),
        jnp.asarray([H]), jnp.asarray([W]), jnp.asarray(qtabs),
        cap_h=cap_h, cap_w=cap_w)
    ok = native.write_jpeg_coefs(path, np.asarray(cy[0]), np.asarray(cc[0]),
                                 H, W, quality)
    assert ok


def _photo(rng, H, W, C=3):
    """Smooth low-frequency content — realistic (sparse) DCT densities."""
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    base = np.stack([
        127 + 90 * np.sin(xx / 17 + c) * np.cos(yy / 23 - c)
        for c in range(C)], axis=-1)
    noise = rng.normal(0, 6, (H, W, C))
    return np.clip(base + noise, 0, 255).astype(np.uint8)


class TestDeviceEncodeParity:
    @pytest.mark.parametrize("quality", [50, 75, 95, 100])
    @pytest.mark.parametrize("size", [(45, 61), (64, 64), (1, 1), (17, 16),
                                      (16, 17), (8, 160)])
    def test_noise_vs_native(self, rng, tmp_path, quality, size):
        H, W = size
        img = rng.integers(0, 256, (H, W, 3), np.uint8)
        ours = str(tmp_path / "d.jpg")
        ref = tmp_path / "n.jpg"
        _device_encode(ours, img, quality)
        assert native.encode_jpeg(ref, img, quality)
        assert open(ours, "rb").read() == ref.read_bytes()

    def test_photo_vs_native(self, rng, tmp_path):
        img = _photo(rng, 123, 201)
        ours = str(tmp_path / "d.jpg")
        ref = tmp_path / "n.jpg"
        _device_encode(ours, img, 75)
        assert native.encode_jpeg(ref, img, 75)
        assert open(ours, "rb").read() == ref.read_bytes()

    def test_vs_cv2_q95(self, rng, tmp_path):
        img = _photo(rng, 90, 140)
        ours = str(tmp_path / "d.jpg")
        ref = str(tmp_path / "c.jpg")
        _device_encode(ours, img, 95)
        cv2.imwrite(ref, img[..., ::-1], [cv2.IMWRITE_JPEG_QUALITY, 95])
        assert open(ours, "rb").read() == open(ref, "rb").read()

    def test_vs_pil_q75(self, rng, tmp_path):
        img = _photo(rng, 77, 103)
        ours = str(tmp_path / "d.jpg")
        ref = str(tmp_path / "p.jpg")
        _device_encode(ours, img, 75)
        Image.fromarray(img).save(ref, quality=75)
        assert open(ours, "rb").read() == open(ref, "rb").read()

    def test_alpha_ignored(self, rng, tmp_path):
        img = rng.integers(0, 256, (33, 47, 4), np.uint8)
        ours = str(tmp_path / "d.jpg")
        ref = tmp_path / "n.jpg"
        _device_encode(ours, img, 75)
        assert native.encode_jpeg(ref, np.ascontiguousarray(img[..., :3]), 75)
        assert open(ours, "rb").read() == ref.read_bytes()

    def test_oversized_canvas(self, rng, tmp_path):
        # bucketed canvas far larger than the valid region: the garbage
        # clamp-pad blocks must be zeroed / skipped by the writer
        img = rng.integers(0, 256, (50, 70, 3), np.uint8)
        ours = str(tmp_path / "d.jpg")
        ref = tmp_path / "n.jpg"
        _device_encode(ours, img, 90, cap=(128, 128))
        assert native.encode_jpeg(ref, img, 90)
        assert open(ours, "rb").read() == ref.read_bytes()

    def test_batch_varied_sizes(self, rng, tmp_path):
        cap_h, cap_w = 96, 96
        sizes = [(96, 96), (45, 61), (33, 96), (96, 17)]
        imgs = [rng.integers(0, 256, (h, w, 3), np.uint8) for h, w in sizes]
        batch = np.stack([_canvas(im, cap_h, cap_w) for im in imgs])
        hs = np.array([s[0] for s in sizes])
        ws = np.array([s[1] for s in sizes])
        qtabs = djpeg.quality_qtabs(95)
        cy, cc = djpeg.encode_start(
            jnp.asarray(batch), jnp.asarray(hs), jnp.asarray(ws),
            jnp.asarray(qtabs), cap_h=cap_h, cap_w=cap_w)
        for i, im in enumerate(imgs):
            ours = str(tmp_path / f"d{i}.jpg")
            ref = tmp_path / f"n{i}.jpg"
            assert native.write_jpeg_coefs(
                ours, np.asarray(cy[i]), np.asarray(cc[i]),
                sizes[i][0], sizes[i][1], 95)
            assert native.encode_jpeg(ref, im, 95)
            assert open(ours, "rb").read() == ref.read_bytes()


class TestSparseTransport:
    def test_sparse_batch_parity(self, rng, tmp_path):
        cap_h, cap_w = 128, 128
        sizes = [(128, 128), (45, 61), (128, 30)]
        imgs = [_photo(rng, h, w) for h, w in sizes]
        batch = np.stack([_canvas(im, cap_h, cap_w) for im in imgs])
        hs = np.array([s[0] for s in sizes], np.int32)
        ws = np.array([s[1] for s in sizes], np.int32)
        qtabs = djpeg.quality_qtabs(75)
        cap_nnz = 4096
        idx, val, nnz = djpeg.encode_start_sparse(
            jnp.asarray(batch), jnp.asarray(hs), jnp.asarray(ws),
            jnp.asarray(qtabs), cap_h=cap_h, cap_w=cap_w, cap_nnz=cap_nnz)
        # cross-check nnz against the dense coefficients
        cy, cc = djpeg.encode_start(
            jnp.asarray(batch), jnp.asarray(hs), jnp.asarray(ws),
            jnp.asarray(qtabs), cap_h=cap_h, cap_w=cap_w)
        dense_nnz = [int((np.asarray(cy[i]) != 0).sum()
                         + (np.asarray(cc[i]) != 0).sum())
                     for i in range(len(imgs))]
        assert list(np.asarray(nnz)) == dense_nnz
        assert max(dense_nnz) <= cap_nnz, "raise cap_nnz for this test"
        paths = [tmp_path / f"s{i}.jpg" for i in range(len(imgs))]
        rcs = native.write_jpeg_coefs_sparse_batch(
            paths, np.asarray(idx), np.asarray(val), np.asarray(nnz),
            (cap_h // 8, cap_w // 8), (cap_h // 16, cap_w // 16),
            hs, ws, 75)
        assert list(rcs) == [0] * len(imgs)
        for i, im in enumerate(imgs):
            ref = tmp_path / f"n{i}.jpg"
            assert native.encode_jpeg(ref, im, 75)
            assert paths[i].read_bytes() == ref.read_bytes()

    def test_sparse_overflow_dense_fallback(self, rng, tmp_path):
        # noise at q100 overflows a tiny cap -> rc -6 -> dense refetch
        cap_h = cap_w = 64
        img = rng.integers(0, 256, (64, 64, 3), np.uint8)
        qtabs = djpeg.quality_qtabs(100)
        hs = np.array([64], np.int32)
        ws = np.array([64], np.int32)
        idx, val, nnz = djpeg.encode_start_sparse(
            jnp.asarray(img[None]), jnp.asarray(hs), jnp.asarray(ws),
            jnp.asarray(qtabs), cap_h=cap_h, cap_w=cap_w, cap_nnz=16)
        assert int(nnz[0]) > 16
        p = tmp_path / "o.jpg"
        rcs = native.write_jpeg_coefs_sparse_batch(
            [p], np.asarray(idx), np.asarray(val), np.asarray(nnz),
            (8, 8), (4, 4), hs, ws, 100)
        assert list(rcs) == [-6]
        cy, cc = djpeg.encode_start(
            jnp.asarray(img[None]), jnp.asarray(hs), jnp.asarray(ws),
            jnp.asarray(qtabs), cap_h=cap_h, cap_w=cap_w)
        assert native.write_jpeg_coefs(p, np.asarray(cy[0]),
                                       np.asarray(cc[0]), 64, 64, 100)
        ref = tmp_path / "n.jpg"
        assert native.encode_jpeg(ref, img, 100)
        assert p.read_bytes() == ref.read_bytes()

    def test_roundtrip_through_device_decode(self, rng, tmp_path):
        # encode on device, decode the file with cv2: lossy but sane
        img = _photo(rng, 64, 64)
        p = str(tmp_path / "r.jpg")
        _device_encode(p, img, 95)
        back = cv2.imread(p)[:, :, ::-1]
        assert np.mean(np.abs(back.astype(int) - img.astype(int))) < 6


class TestCodecGates:
    """The sticky device_encode/device_decode gates: thread-safe
    cumulative counters, the static cap-viability mirror, decline
    accounting, and the bounded shrink-jit cache."""

    def test_counters_thread_safe(self):
        """note_overflows is called concurrently from saver threads; the
        cumulative counters must not lose increments (an unsynchronized
        read-modify-write would trip the gate late or never)."""
        import threading

        class T:
            pass

        t = T()
        n_threads, m = 8, 400

        def work():
            for _ in range(m):
                djpeg.note_overflows(t, 1, 3)

        threads = [threading.Thread(target=work) for _ in range(n_threads)]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        assert t._enc_overflow_n == n_threads * m
        assert t._enc_total_n == 3 * n_threads * m
        # 1/3 overflow ratio: below the majority trip line
        assert not getattr(t, "_device_encode_off", False)

    def test_declines_trip_the_gate(self, capsys):
        class T:
            pass

        t = T()
        djpeg.note_declines(t, djpeg._GATE_MIN_SAMPLE)
        assert getattr(t, "_device_encode_off", False)
        assert not djpeg.device_encode_enabled({"device_encode": True}, t)
        # the one-shot message printed exactly once
        assert capsys.readouterr().out.count("falling back") == 1
        djpeg.note_declines(t, 1)
        assert capsys.readouterr().out == ""
        # reset restores the transport
        djpeg.reset_codec_gates(t)
        assert djpeg.device_encode_enabled({"device_encode": True}, t)

    def test_transport_cap_viable(self):
        assert djpeg.transport_cap_viable(0.25)
        assert not djpeg.transport_cap_viable(0.34)
        # mirrors encode_shrink's actual decline on a large canvas
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.integers(0, 255, (1, 256, 256, 3),
                                       dtype=np.uint8))
        h = np.asarray([256], np.int32)
        ok = djpeg.encode_shrink(img, jnp.asarray(h), jnp.asarray(h),
                                 h, h, 75, cap_frac=0.25)
        bad = djpeg.encode_shrink(img, jnp.asarray(h), jnp.asarray(h),
                                  h, h, 75, cap_frac=0.34)
        assert ok is not None and bad is None

    def test_shrink_jit_cache_bounded(self, monkeypatch):
        """The shared shrink cache is LRU-bounded: heterogeneous
        workloads (many batch shapes) must not retain one compiled
        executable per combination forever."""
        monkeypatch.setattr(djpeg, "_SHRINK_JIT_MAX", 2)
        djpeg._SHRINK_JIT.clear()
        rng = np.random.default_rng(0)
        for B in (1, 2, 3):
            img = jnp.asarray(rng.integers(0, 255, (B, 64, 64, 3),
                                           dtype=np.uint8))
            h = np.full(B, 48, np.int32)
            assert djpeg.encode_shrink(img, jnp.asarray(h),
                                       jnp.asarray(h), h, h, 75) is not None
            assert len(djpeg._SHRINK_JIT) <= 2
        # the evicted shape recompiles transparently
        img = jnp.asarray(rng.integers(0, 255, (1, 64, 64, 3),
                                       dtype=np.uint8))
        h = np.full(1, 48, np.int32)
        assert djpeg.encode_shrink(img, jnp.asarray(h), jnp.asarray(h),
                                   h, h, 75) is not None
