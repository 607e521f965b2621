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


class TestProbe:
    def test_probe_jpeg_png(self, tmp_path, rng):
        pj = tmp_path / "a.jpg"
        Image.fromarray(rng.integers(0, 256, (100, 150, 3), np.uint8)).save(pj)
        pp = tmp_path / "b.png"
        Image.fromarray(rng.integers(0, 256, (60, 70, 4), np.uint8)).save(pp)
        assert native.probe(pj) == (100, 150, 3)
        assert native.probe(pp) == (60, 70, 4)

    def test_probe_rejects_non_image(self, tmp_path):
        p = tmp_path / "x.jpg"
        p.write_text("not an image")
        assert native.probe(p) is None
        assert native.probe(tmp_path / "missing.jpg") is None


class TestBatchFill:
    """fill_pending_images: the engine's one-C++-call-per-bucket decode."""

    def test_fill_matches_decode_padded(self, tmp_path, rng):
        from image_processor_pipeline_tpu.io.images import (
            decode_padded, fill_pending_images, probe_padded,
        )

        paths = []
        for i, (h, w) in enumerate([(100, 150), (90, 90), (110, 140)]):
            p = tmp_path / f"im{i}.jpg"
            Image.fromarray(
                rng.integers(0, 256, (h, w, 3), np.uint8)
            ).save(p)
            paths.append(p)
        items = []
        for p in paths:
            h, w, canvas = probe_padded(p, "RGBA")
            items.append({
                "canvas": canvas,
                "size": np.asarray([h, w], np.int32),
                "_decode": (str(p), "RGBA", False),
            })
        fill_pending_images(items)
        for p, it in zip(paths, items):
            ref, h, w, cv = decode_padded(p, mode="RGBA")
            assert "_load_error" not in it
            np.testing.assert_array_equal(it["image"], ref)

    def test_fill_marks_corrupt_item(self, tmp_path):
        from image_processor_pipeline_tpu.io.images import fill_pending_images

        bad = tmp_path / "bad.jpg"
        bad.write_bytes(b"\xff\xd8garbage")  # JPEG magic, corrupt body
        items = [{
            "canvas": (128, 128),
            "size": np.asarray([50, 50], np.int32),
            "_decode": (str(bad), "RGB", False),
        }]
        fill_pending_images(items)
        assert "_load_error" in items[0]
        assert items[0]["image"].shape == (128, 128, 3)


class TestEngineProbePath:
    """The streaming engine must produce identical outputs through the
    probe+batch-decode path and the per-item load_item path."""

    def _dataset(self, tmp_path, rng, n=5):
        imgs = tmp_path / "imgs"
        imgs.mkdir()
        for i in range(n):
            h, w = int(rng.integers(60, 120)), int(rng.integers(60, 120))
            Image.fromarray(
                rng.integers(0, 256, (h, w, 3), np.uint8)
            ).save(imgs / f"im{i}.jpg")
        return imgs

    def test_probe_path_bitexact_vs_load_path(self, tmp_path, rng):
        from image_processor_pipeline_tpu import (
            ProcessingPipeline, ProcessingStep,
        )
        from image_processor_pipeline_tpu.transforms.fused import (
            Enhance, FusedChain,
        )

        imgs = self._dataset(tmp_path, rng)

        def run(out_name, transform):
            pipe = ProcessingPipeline(root_dir=tmp_path)
            pipe.add_step(ProcessingStep(
                "fc", transform, input_dirs=[imgs.name],
                output_dirs=[out_name], pairing_method="one_input", seed=7,
            ))
            return pipe.run(progress=False)[0]

        c1 = run("out_probe", FusedChain([Enhance()]))
        no_probe = FusedChain([Enhance()])
        no_probe.probe_item = lambda inputs, options: None
        c2 = run("out_load", no_probe)
        assert c1["Success"] == c2["Success"] == 5
        for p in sorted((tmp_path / "out_probe").iterdir()):
            q = tmp_path / "out_load" / p.name
            assert p.read_bytes() == q.read_bytes(), p.name

    def test_corrupt_item_logged_as_error_run_continues(self, tmp_path, rng):
        from image_processor_pipeline_tpu import (
            ProcessingPipeline, ProcessingStep,
        )
        from image_processor_pipeline_tpu.transforms.fused import (
            Enhance, FusedChain,
        )

        imgs = self._dataset(tmp_path, rng, n=4)
        (imgs / "zz_bad.jpg").write_bytes(b"\xff\xd8garbage")
        pipe = ProcessingPipeline(root_dir=tmp_path)
        pipe.add_step(ProcessingStep(
            "fc", FusedChain([Enhance()]), input_dirs=[imgs.name],
            output_dirs=["out"], pairing_method="one_input", seed=7,
        ))
        counter = pipe.run(progress=False)[0]
        assert counter["Success"] == 4
        assert counter["Error"] == 1


class TestCv2ByteParity:
    """The reference writes images via cv2.imwrite (reference
    utils/utils.py:95).  Our native JPEG encoder must be BYTE-identical to
    cv2's (same libjpeg defaults: baseline, 4:2:0, optimize off).  PNG is
    lossless so pixel-equality is the contract; the compressed byte stream
    legitimately differs because cv2 bundles its own zlib whose
    stored-block chunking differs from the system zlib (both level 1)."""

    def test_jpeg_bytes_match_cv2(self, tmp_path, rng):
        cv2 = pytest.importorskip("cv2")
        for (h, w) in [(120, 160), (121, 161), (33, 47), (99, 100)]:
            for q in (20, 75, 95, 100):
                rgb = rng.integers(0, 256, (h, w, 3), np.uint8)
                p_cv = tmp_path / "cv.jpg"
                p_us = tmp_path / "us.jpg"
                cv2.imwrite(str(p_cv), rgb[..., ::-1],
                            [cv2.IMWRITE_JPEG_QUALITY, q])
                assert native.encode_jpeg(p_us, rgb, q)
                assert p_cv.read_bytes() == p_us.read_bytes(), (h, w, q)

    def test_png_pixels_match_cv2(self, tmp_path, rng):
        cv2 = pytest.importorskip("cv2")
        for (h, w, c) in [(60, 80, 3), (61, 81, 3), (64, 64, 4)]:
            img = rng.integers(0, 256, (h, w, c), np.uint8)
            bgr = img[..., [2, 1, 0]] if c == 3 else img[..., [2, 1, 0, 3]]
            p_cv = tmp_path / "cv.png"
            p_us = tmp_path / "us.png"
            cv2.imwrite(str(p_cv), bgr)
            assert native.encode_png(p_us, img, mode="parity")
            # byte-identical: we match cv2.imwrite's libpng configuration
            # exactly (level Z_BEST_SPEED, strategy Z_RLE, filter SUB)
            assert p_cv.read_bytes() == p_us.read_bytes(), (h, w, c)

    def test_png_fast_mode_pixel_exact(self, tmp_path, rng):
        """The libdeflate fast encoder (default mode) writes valid PNGs
        that decode to identical pixels under BOTH PIL and cv2 — only the
        compressed byte stream differs from the cv2-parity mode."""
        cv2 = pytest.importorskip("cv2")
        for (h, w, c) in [(60, 80, 3), (61, 81, 3), (64, 64, 4), (1, 1, 3),
                          (2, 1000, 4), (500, 2, 1)]:
            img = rng.integers(0, 256, (h, w, c), np.uint8)
            p = tmp_path / "fast.png"
            assert native.encode_png(p, img, mode="fast")
            pil = np.asarray(Image.open(p))
            if pil.ndim == 2:
                pil = pil[:, :, None]
            np.testing.assert_array_equal(pil, img, err_msg=str((h, w, c)))
            cvb = cv2.imread(str(p), cv2.IMREAD_UNCHANGED)
            if cvb.ndim == 2:
                cvb = cvb[:, :, None]
            if c >= 3:
                cvb = cvb[..., [2, 1, 0] + ([3] if c == 4 else [])]
            np.testing.assert_array_equal(cvb, img, err_msg=str((h, w, c)))


class TestTiledPng:
    """The pigz-style band-parallel PNG encoder (ipp_encode_png_tiled):
    per-band raw deflate stitched at Z_FULL_FLUSH boundaries with an
    adler32_combine trailer — ONE standards-valid zlib stream.  Pixels
    must be identical to the single-stream fast mode under both PIL and
    cv2 (whose zlib inflate verifies the combined adler32)."""

    def test_tiled_pixel_exact(self, tmp_path, rng, monkeypatch):
        cv2 = pytest.importorskip("cv2")
        monkeypatch.setattr(native, "PNG_THREADS", "4")
        for (h, w, c) in [(64, 64, 4), (61, 81, 3), (257, 129, 1),
                          (2, 1000, 4), (7, 5, 3)]:  # incl. threads > h
            img = rng.integers(0, 256, (h, w, c), np.uint8)
            p = tmp_path / "tiled.png"
            assert native.encode_png(p, img, mode="fast")
            pil = np.asarray(Image.open(p))
            if pil.ndim == 2:
                pil = pil[:, :, None]
            np.testing.assert_array_equal(pil, img, err_msg=str((h, w, c)))
            cvb = cv2.imread(str(p), cv2.IMREAD_UNCHANGED)
            if cvb.ndim == 2:
                cvb = cvb[:, :, None]
            if c >= 3:
                cvb = cvb[..., [2, 1, 0] + ([3] if c == 4 else [])]
            np.testing.assert_array_equal(cvb, img, err_msg=str((h, w, c)))

    def test_tiled_flip_views_zero_copy(self, tmp_path, rng, monkeypatch):
        """Negative-stride (vertical flip) and reversed-row (horizontal
        flip) views ride the same _row_strided recognition as the other
        encoders — the band filter walks the signed pitch."""
        monkeypatch.setattr(native, "PNG_THREADS", "3")
        img = rng.integers(0, 256, (90, 70, 4), np.uint8)
        for name, view in [("v", img[::-1]), ("h", img[:, ::-1]),
                           ("vh", img[::-1, ::-1])]:
            p = tmp_path / f"flip_{name}.png"
            assert native.encode_png(p, view, mode="fast")
            np.testing.assert_array_equal(
                np.asarray(Image.open(p)), view, err_msg=name)

    def test_auto_gate(self, monkeypatch):
        """auto enables threads only on >=4-core hosts with >=1MB
        payloads; explicit integers force the count; garbage falls back
        to 1 (single-stream libdeflate — this host's default)."""
        monkeypatch.setattr(native, "PNG_THREADS", "auto")
        monkeypatch.setattr(native.os, "cpu_count", lambda: 8)
        assert native._png_threads(4 << 20) == 8
        assert native._png_threads(1 << 10) == 1  # too small
        monkeypatch.setattr(native.os, "cpu_count", lambda: 2)
        assert native._png_threads(4 << 20) == 1  # zlib x2 < libdeflate
        monkeypatch.setattr(native, "PNG_THREADS", "6")
        assert native._png_threads(0) == 6
        monkeypatch.setattr(native, "PNG_THREADS", "bogus")
        assert native._png_threads(4 << 20) == 1

    def test_auto_gate_respects_saver_width(self, monkeypatch):
        """The engine declares its saver-pool width at step start
        (pipeline.py -> set_encoder_concurrency); auto tiling divides the
        cores by it — file-level parallelism owns those cores already."""
        monkeypatch.setattr(native, "PNG_THREADS", "auto")
        monkeypatch.setattr(native.os, "cpu_count", lambda: 16)
        monkeypatch.setattr(native, "_ENCODER_CONCURRENCY", 1)
        assert native._png_threads(4 << 20) == 8  # capped
        monkeypatch.setattr(native, "_ENCODER_CONCURRENCY", 4)
        assert native._png_threads(4 << 20) == 4  # 16 // 4
        monkeypatch.setattr(native, "_ENCODER_CONCURRENCY", 8)
        assert native._png_threads(4 << 20) == 1  # below break-even


class TestDecodeParity:
    """SURVEY §7 hard part #3: decode parity.  All three decoders in play
    (our native engine, cv2, PIL) must produce identical pixels for the
    formats the reference reads."""

    def test_jpeg_decode_matches_cv2_and_pil(self, tmp_path, rng):
        cv2 = pytest.importorskip("cv2")
        p = tmp_path / "t.jpg"
        Image.fromarray(
            rng.integers(0, 256, (123, 157, 3), np.uint8)
        ).save(p, quality=90)
        ours = native.decode_to_canvas(p, (123, 157), 3)
        assert ours is not None
        buf, h, w, c = ours
        ref_cv = cv2.imread(str(p))[..., ::-1]  # BGR→RGB
        ref_pil = np.asarray(Image.open(p).convert("RGB"))
        np.testing.assert_array_equal(buf[:h, :w], ref_cv)
        np.testing.assert_array_equal(buf[:h, :w], ref_pil)

    def test_png_decode_matches_cv2_and_pil(self, tmp_path, rng):
        cv2 = pytest.importorskip("cv2")
        p = tmp_path / "t.png"
        Image.fromarray(
            rng.integers(0, 256, (64, 80, 4), np.uint8)
        ).save(p)
        ours = native.decode_to_canvas(p, (64, 80), 4)
        buf, h, w, c = ours
        ref_cv = cv2.imread(str(p), cv2.IMREAD_UNCHANGED)[..., [2, 1, 0, 3]]
        ref_pil = np.asarray(Image.open(p))
        np.testing.assert_array_equal(buf[:h, :w], ref_cv)
        np.testing.assert_array_equal(buf[:h, :w], ref_pil)


class TestStridedEncode:
    """Canvas-crop views (row-strided, packed pixels) encode zero-copy and
    byte-identically to their contiguous copies (all three encoders)."""

    def test_strided_equals_contiguous(self, tmp_path, rng):
        canvas = rng.integers(0, 256, (80, 100, 3), np.uint8)
        crop = canvas[:60, :70]          # row-strided view
        cont = np.ascontiguousarray(crop)
        for tag, enc in (
            ("jpg", lambda p, a: native.encode_jpeg(p, a, 95)),
            ("png_fast", lambda p, a: native.encode_png(p, a, mode="fast")),
            ("png_par", lambda p, a: native.encode_png(p, a, mode="parity")),
        ):
            pv = tmp_path / f"v_{tag}"
            pc = tmp_path / f"c_{tag}"
            assert enc(pv, crop) and enc(pc, cont), tag
            assert pv.read_bytes() == pc.read_bytes(), tag

    def test_strided_rgba_png(self, tmp_path, rng):
        canvas = rng.integers(0, 256, (64, 64, 4), np.uint8)
        crop = canvas[:50, :40]
        pv = tmp_path / "v.png"
        assert native.encode_png(pv, crop)
        np.testing.assert_array_equal(np.asarray(Image.open(pv)), crop)

    def test_flip_views_encode_zero_copy(self, tmp_path, rng):
        """Dihedral flip views of a canvas crop encode byte-identically to
        their materialized copies on all three encoders (negative pitch
        'v', reversed-row 'h', both 'hv')."""
        for c in (3, 4):
            canvas = rng.integers(0, 256, (60, 72, c), np.uint8)
            base = canvas[3:57, 5:69]
            for name, v in (("h", base[:, ::-1]), ("v", base[::-1]),
                            ("hv", base[::-1, ::-1])):
                cont = np.ascontiguousarray(v)
                encoders = [
                    ("png", lambda p, a: native.encode_png(p, a,
                                                           mode="fast")),
                    ("png_par", lambda p, a: native.encode_png(
                        p, a, mode="parity")),
                ]
                if c == 3:
                    encoders.append(
                        ("jpg", lambda p, a: native.encode_jpeg(p, a, 95)))
                for tag, enc in encoders:
                    pv = tmp_path / f"fv_{c}{name}_{tag}"
                    pc = tmp_path / f"fc_{c}{name}_{tag}"
                    assert enc(pv, v) and enc(pc, cont), (c, name, tag)
                    assert pv.read_bytes() == pc.read_bytes(), (c, name, tag)

    def test_row_strided_fallback_never_unflips(self):
        """An h-flipped view whose pitch disqualifies zero-copy (e.g. a
        broadcast with row stride 0) must fall back to a copy of the
        ORIGINAL view, not the flip-normalized candidate (review r4)."""
        from image_processor_pipeline_tpu.io.native import _row_strided

        row = np.arange(12, dtype=np.uint8).reshape(1, 4, 3)
        arr = np.broadcast_to(row, (3, 4, 3))[:, ::-1]
        out, stride, flip = _row_strided(arr)
        assert flip == 0
        np.testing.assert_array_equal(out, np.ascontiguousarray(arr))


class TestPilEncoderParity:
    """encode_image_pil: the PIL-parity encoder for transforms whose
    reference encoder is Image.save (tranfo.py:53, overlays.py:169,
    rotations.py:81,119, recadrages.py:80) — JPEG quality 75, byte-identical
    to Pillow's default save (both sides drive the same libjpeg-turbo with
    identical settings)."""

    def test_jpeg_bytes_match_pil_default_save(self, tmp_path, rng):
        from PIL import Image
        from image_processor_pipeline_tpu.io.images import encode_image_pil

        for trial in range(5):
            h = int(rng.integers(40, 500))
            w = int(rng.integers(40, 500))
            arr = rng.integers(0, 256, (h, w, 3), np.uint8)
            p_pil = tmp_path / f"pil{trial}.jpg"
            p_our = tmp_path / f"our{trial}.jpg"
            Image.fromarray(arr).save(p_pil)
            encode_image_pil(arr, p_our)
            assert p_pil.read_bytes() == p_our.read_bytes(), trial

    def test_png_passthrough_unchanged(self, tmp_path, rng):
        from image_processor_pipeline_tpu.io.images import (
            encode_image,
            encode_image_pil,
        )

        arr = rng.integers(0, 256, (60, 70, 4), np.uint8)
        a = tmp_path / "a.png"
        b = tmp_path / "b.png"
        encode_image(arr, a)
        encode_image_pil(arr, b)
        assert a.read_bytes() == b.read_bytes()
