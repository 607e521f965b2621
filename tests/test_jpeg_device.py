"""Hybrid JPEG decode: host entropy-only + device finish, byte-exact vs a
full libjpeg decode (cv2.imdecode / the native engine's host decoder).

Covers the exact integer stages of ops/jpeg.py — islow IDCT, fancy
chroma upsampling (h2v2/h2v1/h1v2), fixed-point YCbCr→RGB — across
encoders (cv2, PIL), qualities, subsampling layouts, odd sizes,
grayscale, and progressive streams.
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


def _device_decode(path, H, W):
    cap_h, cap_w = _caps(H, W)
    # generous chroma caps cover every subsampling layout under test
    r = native.read_jpeg_coefs(path, (cap_h // 8, cap_w // 8),
                               (cap_h // 8, cap_w // 8))
    assert r is not None
    coefs_y, coefs_c, qtabs, info = r
    ncomp, hs, vs = int(info[2]), int(info[3]), int(info[4])
    out = djpeg.decode_finish(
        jnp.asarray(coefs_y[None]), jnp.asarray(coefs_c[None]),
        jnp.asarray(qtabs[None]),
        jnp.asarray([H]), jnp.asarray([W]),
        samp=(hs, vs), cap_h=cap_h, cap_w=cap_w,
        grayscale=(ncomp == 1))
    return np.asarray(out)[0, :H, :W]


_SAMPS = {
    (2, 2): cv2.IMWRITE_JPEG_SAMPLING_FACTOR_420,
    (2, 1): cv2.IMWRITE_JPEG_SAMPLING_FACTOR_422,
    (1, 2): cv2.IMWRITE_JPEG_SAMPLING_FACTOR_440,
    (1, 1): cv2.IMWRITE_JPEG_SAMPLING_FACTOR_444,
}


class TestDeviceDecodeParity:
    @pytest.mark.parametrize("samp", sorted(_SAMPS))
    @pytest.mark.parametrize("quality", [50, 90, 100])
    def test_cv2_encoded(self, rng, tmp_path, samp, quality):
        H, W = 45, 61
        img = rng.integers(0, 256, (H, W, 3), np.uint8)
        p = str(tmp_path / "t.jpg")
        cv2.imwrite(p, img[..., ::-1],
                    [cv2.IMWRITE_JPEG_QUALITY, quality,
                     cv2.IMWRITE_JPEG_SAMPLING_FACTOR, _SAMPS[samp]])
        ref = cv2.imread(p)[..., ::-1]
        np.testing.assert_array_equal(_device_decode(p, H, W), ref)

    @pytest.mark.parametrize("size", [(8, 8), (15, 9), (256, 64), (130, 258)])
    def test_sizes(self, rng, tmp_path, size):
        H, W = size
        img = rng.integers(0, 256, (H, W, 3), np.uint8)
        p = str(tmp_path / "t.jpg")
        cv2.imwrite(p, img[..., ::-1], [cv2.IMWRITE_JPEG_QUALITY, 85])
        ref = cv2.imread(p)[..., ::-1]
        np.testing.assert_array_equal(_device_decode(p, H, W), ref)

    @pytest.mark.parametrize("progressive", [False, True])
    def test_pil_encoded(self, rng, tmp_path, progressive):
        H, W = 52, 77
        img = rng.integers(0, 256, (H, W, 3), np.uint8)
        p = str(tmp_path / "t.jpg")
        Image.fromarray(img).save(p, quality=80, progressive=progressive)
        ref = cv2.imread(p)[..., ::-1]
        np.testing.assert_array_equal(_device_decode(p, H, W), ref)

    def test_grayscale(self, rng, tmp_path):
        H, W = 40, 56
        img = rng.integers(0, 256, (H, W), np.uint8)
        p = str(tmp_path / "t.jpg")
        Image.fromarray(img, "L").save(p, quality=85)
        ref = cv2.imread(p)[..., ::-1]
        np.testing.assert_array_equal(_device_decode(p, H, W), ref)

    def test_matches_native_host_decoder(self, rng, tmp_path):
        # the engine's own host decoder is the other leg of the A/B
        H, W = 70, 90
        img = rng.integers(0, 256, (H, W, 3), np.uint8)
        p = tmp_path / "t.jpg"
        cv2.imwrite(str(p), img[..., ::-1], [cv2.IMWRITE_JPEG_QUALITY, 92])
        cap_h, cap_w = _caps(H, W)
        host = native.decode_to_canvas(p, (cap_h, cap_w), channels=3)
        assert host is not None
        buf, h, w, _ = host
        np.testing.assert_array_equal(
            _device_decode(str(p), H, W), buf[:h, :w])

    def test_rgba_channels_and_padding(self, rng, tmp_path):
        H, W = 30, 41
        img = rng.integers(0, 256, (H, W, 3), np.uint8)
        p = str(tmp_path / "t.jpg")
        cv2.imwrite(p, img[..., ::-1], [cv2.IMWRITE_JPEG_QUALITY, 85])
        cap_h, cap_w = _caps(H, W)
        r = native.read_jpeg_coefs(p, (cap_h // 8, cap_w // 8))
        coefs_y, coefs_c, qtabs, info = r
        out = np.asarray(djpeg.decode_finish(
            jnp.asarray(coefs_y[None]), jnp.asarray(coefs_c[None]),
            jnp.asarray(qtabs[None]),
            jnp.asarray([H]), jnp.asarray([W]),
            samp=(int(info[3]), int(info[4])), cap_h=cap_h, cap_w=cap_w,
            channels=4))[0]
        ref = cv2.imread(p)[..., ::-1]
        np.testing.assert_array_equal(out[:H, :W, :3], ref)
        assert (out[:H, :W, 3] == 255).all()
        # padded-canvas invariant: zeros outside the valid region
        assert out[H:].max() == 0 and out[:, W:].max() == 0


class TestBatchCoefs:
    def test_batch_matches_single(self, rng, tmp_path):
        paths = []
        for i in range(5):
            img = rng.integers(0, 256, (40 + i, 60 - i, 3), np.uint8)
            p = tmp_path / f"b{i}.jpg"
            cv2.imwrite(str(p), img[..., ::-1])
            paths.append(p)
        caps = (8, 8)
        batch = native.read_jpeg_coefs_batch(paths, caps)
        assert batch is not None
        coefs_y, coefs_c, qtabs, infos = batch
        for i, p in enumerate(paths):
            single = native.read_jpeg_coefs(p, caps)
            np.testing.assert_array_equal(coefs_y[i], single[0])
            np.testing.assert_array_equal(coefs_c[i], single[1])
            np.testing.assert_array_equal(qtabs[i], single[2])
            np.testing.assert_array_equal(infos[i], single[3])

    def test_failed_item_marked(self, tmp_path):
        good = tmp_path / "g.jpg"
        cv2.imwrite(str(good), np.zeros((16, 16, 3), np.uint8))
        bad = tmp_path / "bad.jpg"
        bad.write_bytes(b"\xff\xd8 this is not a jpeg")
        batch = native.read_jpeg_coefs_batch([good, bad], (2, 2))
        _, _, _, infos = batch
        assert infos[0, 0] == 16
        assert infos[1, 0] < 0


class TestEngineHybridDecode:
    """device_decode=True must be output-byte-identical to the host path."""

    def _run(self, tmp_path, rng, device_decode, sub):
        from image_processor_pipeline_tpu import (
            ProcessingPipeline, ProcessingStep)
        from image_processor_pipeline_tpu.transforms import EnhanceImage

        src_dir = tmp_path / f"in_{sub}"
        src_dir.mkdir(exist_ok=True)
        if not list(src_dir.glob("*.jpg")):
            for i in range(7):
                img = rng.integers(0, 256, (50 + 7 * i, 90 - 3 * i, 3),
                                   np.uint8)
                cv2.imwrite(str(src_dir / f"f{i}.jpg"), img[..., ::-1],
                            [cv2.IMWRITE_JPEG_QUALITY, 88])
        out = tmp_path / f"out_{sub}_{device_decode}"
        pipe = ProcessingPipeline(root_dir=tmp_path)
        pipe.add_step(ProcessingStep(
            name="enh", process_function=EnhanceImage(),
            input_dirs=[src_dir.name], output_dirs=[out.name],
            pairing_method="one_input", seed=42,
            options={"device_decode": device_decode}))
        counters = pipe.run(progress=False)
        assert counters[0]["Success"] == 7
        return {p.name: p.read_bytes() for p in sorted(out.glob("*"))}

    def test_pipeline_outputs_identical(self, tmp_path, rng):
        host = self._run(tmp_path, rng, False, "a")
        dev = self._run(tmp_path, rng, True, "a")
        assert host.keys() == dev.keys() and len(host) == 7
        for k in host:
            assert host[k] == dev[k], f"{k} differs under device_decode"


class TestHybridGroupPaths:
    """_decode_group_device's non-fast paths: mixed sampling layouts are
    decoded per-group and scattered; unsupported/corrupt items fall back
    to the host decoder (or get _load_error)."""

    def _items(self, files):
        from image_processor_pipeline_tpu.io.batching import canvas_for
        items = []
        for p, (h, w) in files:
            items.append({
                "size": np.asarray([h, w], np.int32),
                "canvas": canvas_for(h, w),
                "_decode": (str(p), "RGB", False),
            })
        return items

    def test_mixed_sampling_and_corrupt(self, rng, tmp_path):
        from image_processor_pipeline_tpu.io.images import (
            _decode_group_device)

        H, W = 40, 60
        files = []
        for i, samp in enumerate([
            cv2.IMWRITE_JPEG_SAMPLING_FACTOR_420,
            cv2.IMWRITE_JPEG_SAMPLING_FACTOR_422,
            cv2.IMWRITE_JPEG_SAMPLING_FACTOR_420,
        ]):
            img = rng.integers(0, 256, (H, W, 3), np.uint8)
            p = tmp_path / f"m{i}.jpg"
            cv2.imwrite(str(p), img[..., ::-1],
                        [cv2.IMWRITE_JPEG_QUALITY, 85,
                         cv2.IMWRITE_JPEG_SAMPLING_FACTOR, samp])
            files.append((p, (H, W)))
        # a 444 file: chroma grid exceeds the default half caps → host
        # fallback inside the device group
        img = rng.integers(0, 256, (H, W, 3), np.uint8)
        p444 = tmp_path / "m3.jpg"
        cv2.imwrite(str(p444), img[..., ::-1],
                    [cv2.IMWRITE_JPEG_QUALITY, 85,
                     cv2.IMWRITE_JPEG_SAMPLING_FACTOR,
                     cv2.IMWRITE_JPEG_SAMPLING_FACTOR_444])
        files.append((p444, (H, W)))
        # a corrupt file → _load_error
        bad = tmp_path / "bad.jpg"
        bad.write_bytes(b"\xff\xd8 garbage")
        files.append((bad, (H, W)))

        items = self._items(files)
        canvas = items[0]["canvas"]
        assert all(tuple(it["canvas"]) == tuple(canvas) for it in items)
        batch = _decode_group_device(items, tuple(canvas), "RGB")
        assert batch is not None
        out = np.asarray(batch)
        for i, (p, _) in enumerate(files[:4]):
            ref = cv2.imread(str(p))[..., ::-1]
            np.testing.assert_array_equal(out[i, :H, :W], ref,
                                          err_msg=str(p))
        assert "_load_error" in items[4]

    def test_non_jpeg_returns_none(self, rng, tmp_path):
        from image_processor_pipeline_tpu.io.images import (
            _decode_group_device)
        from PIL import Image as PILImage

        p = tmp_path / "x.png"
        PILImage.fromarray(
            rng.integers(0, 256, (32, 32, 3), np.uint8)).save(p)
        items = self._items([(p, (32, 32))])
        assert _decode_group_device(
            items, tuple(items[0]["canvas"]), "RGB") is None


class TestHybridFuzz:
    def test_randomized_sweep(self, rng, tmp_path):
        """60 randomized (size, quality, subsampling, encoder) cases,
        every one byte-exact vs cv2's full decode.  Sizes stay inside two
        canvas buckets so the jitted finisher compiles a handful of
        variants, not one per case."""
        samps = list(_SAMPS.values())
        fails = []
        for i in range(60):
            H = int(rng.integers(49, 64))
            W = int(rng.integers(17, 32)) if i % 2 else int(
                rng.integers(49, 64))
            img = rng.integers(0, 256, (H, W, 3), np.uint8)
            p = str(tmp_path / f"f{i}.jpg")
            if i % 4 == 0:
                Image.fromarray(img).save(
                    p, quality=int(rng.integers(10, 101)),
                    progressive=bool(i % 8))
            else:
                cv2.imwrite(p, img[..., ::-1], [
                    cv2.IMWRITE_JPEG_QUALITY, int(rng.integers(10, 101)),
                    cv2.IMWRITE_JPEG_SAMPLING_FACTOR,
                    samps[int(rng.integers(len(samps)))]])
            ref = cv2.imread(p)[..., ::-1]
            got = _device_decode(p, H, W)
            if not (got == ref).all():
                fails.append((i, H, W))
        assert not fails, fails


class TestChromaCapRetry:
    def test_oversize_chroma_retries_on_device(self, rng, tmp_path,
                                               monkeypatch):
        """4:4:4 / h2v1 / h1v2 streams whose chroma grid exceeds the
        4:2:0-sized default cap retry once with full-size chroma caps and
        decode ON DEVICE (ADVICE r2: these legs silently fell back to the
        host for most real files of those samplings).  Host fallback is
        disabled here, so any fallback would fail the test."""
        from image_processor_pipeline_tpu.io import images as im
        from image_processor_pipeline_tpu.io.batching import canvas_for

        H, W = 40, 60  # canvas 64x64 → default chroma cap 4x4 blocks
        files = []
        for i, samp in enumerate([
            cv2.IMWRITE_JPEG_SAMPLING_FACTOR_444,
            cv2.IMWRITE_JPEG_SAMPLING_FACTOR_440,   # h1v2
            cv2.IMWRITE_JPEG_SAMPLING_FACTOR_422,   # h2v1
            cv2.IMWRITE_JPEG_SAMPLING_FACTOR_420,   # fits the default cap
        ]):
            img = rng.integers(0, 256, (H, W, 3), np.uint8)
            p = tmp_path / f"r{i}.jpg"
            cv2.imwrite(str(p), img[..., ::-1],
                        [cv2.IMWRITE_JPEG_QUALITY, 85,
                         cv2.IMWRITE_JPEG_SAMPLING_FACTOR, samp])
            files.append((p, (H, W)))

        items = []
        for p, (h, w) in files:
            items.append({
                "size": np.asarray([h, w], np.int32),
                "canvas": canvas_for(h, w),
                "_decode": (str(p), "RGB", False),
            })

        def boom(*a, **k):
            raise AssertionError("host fallback used — device leg is dead")

        monkeypatch.setattr(im, "decode_padded", boom)
        batch = im._decode_group_device(
            items, tuple(items[0]["canvas"]), "RGB")
        assert batch is not None
        out = np.asarray(batch)
        for i, (p, _) in enumerate(files):
            assert "_load_error" not in items[i], items[i].get("_load_error")
            ref = cv2.imread(str(p))[..., ::-1]
            np.testing.assert_array_equal(out[i, :H, :W], ref,
                                          err_msg=str(p))


class TestSparseCoefTransport:
    def test_sparse_reconstructs_dense_grids(self, rng, tmp_path):
        """COO extraction scatter-adds back to exactly the dense grids,
        and decode_finish_sparse == decode_finish byte-for-byte."""
        from image_processor_pipeline_tpu.io import native
        from image_processor_pipeline_tpu.ops import jpeg as djpeg

        H, W = 40, 60
        paths = []
        for q in (70, 85, 92):
            # smooth content: synthetic NOISE is ~50% dense in DCT space
            # and would overflow the sparse cap — real photos are ~8%
            img = cv2.GaussianBlur(
                rng.integers(0, 256, (H, W, 3), np.uint8), (9, 9), 3)
            p = tmp_path / f"s{q}.jpg"
            cv2.imwrite(str(p), img[..., ::-1],
                        [cv2.IMWRITE_JPEG_QUALITY, q])
            paths.append(p)
        cap_b = (8, 8)
        dres = native.read_jpeg_coefs_batch(paths, cap_b)
        sres = native.read_jpeg_coefs_sparse_batch(paths, cap_b)
        assert dres is not None and sres is not None
        cy, cc, qt, dinfo = dres
        idx, val, nnz, sqt, sinfo = sres
        np.testing.assert_array_equal(dinfo, sinfo)
        np.testing.assert_array_equal(qt, sqt)
        ny = cap_b[0] * cap_b[1] * 64
        nc = 4 * 4 * 64
        for i in range(len(paths)):
            dense = np.concatenate(
                [cy[i].ravel(), cc[i].ravel()]).astype(np.int16)
            recon = np.zeros(ny + 2 * nc, np.int16)
            np.add.at(recon, idx[i], val[i])
            np.testing.assert_array_equal(recon, dense, err_msg=str(i))
            # nonzero pairs really are sparse at these qualities
            assert int(nnz[i]) == int(np.count_nonzero(dense))
            assert int(nnz[i]) < (ny + 2 * nc) // 4

        hw = np.full((len(paths),), H, np.int32), np.full(
            (len(paths),), W, np.int32)
        out_d = np.asarray(djpeg.decode_finish(
            jnp.asarray(cy), jnp.asarray(cc), jnp.asarray(qt),
            jnp.asarray(hw[0]), jnp.asarray(hw[1]), samp=(2, 2),
            cap_h=64, cap_w=64))
        out_s = np.asarray(djpeg.decode_finish_sparse(
            jnp.asarray(idx), jnp.asarray(val), jnp.asarray(sqt),
            jnp.asarray(hw[0]), jnp.asarray(hw[1]), samp=(2, 2),
            cap_h=64, cap_w=64, cap_by_c=4, cap_bx_c=4))
        np.testing.assert_array_equal(out_s, out_d)

    def test_overflow_falls_back_to_dense_on_device(self, rng, tmp_path,
                                                    monkeypatch):
        """A q=100 noise image overflows the sparse capacity (-6) and must
        decode through the DENSE device fallback — host decode disabled."""
        from image_processor_pipeline_tpu.io import images as im
        from image_processor_pipeline_tpu.io import native
        from image_processor_pipeline_tpu.io.batching import canvas_for

        H, W = 40, 60
        items = []
        paths = []
        for i, q in enumerate((100, 85)):
            img = rng.integers(0, 256, (H, W, 3), np.uint8)
            if q != 100:
                img = cv2.GaussianBlur(img, (9, 9), 3)  # sparse-friendly
            p = tmp_path / f"o{i}.jpg"
            cv2.imwrite(str(p), img[..., ::-1],
                        [cv2.IMWRITE_JPEG_QUALITY, q])
            paths.append(p)
            items.append({
                "size": np.asarray([H, W], np.int32),
                "canvas": canvas_for(H, W),
                "_decode": (str(p), "RGB", False),
            })
        sres = native.read_jpeg_coefs_sparse_batch(paths, (8, 8))
        assert int(sres[4][0][0]) == -6, "q=100 noise should overflow"
        assert int(sres[4][1][0]) >= 0, "q=85 noise should fit"

        def boom(*a, **k):
            raise AssertionError("host fallback used")

        monkeypatch.setattr(im, "decode_padded", boom)
        batch = im._decode_group_device(
            items, tuple(items[0]["canvas"]), "RGB")
        assert batch is not None
        out = np.asarray(batch)
        for i, p in enumerate(paths):
            assert "_load_error" not in items[i]
            ref = cv2.imread(str(p))[..., ::-1]
            np.testing.assert_array_equal(out[i, :H, :W], ref,
                                          err_msg=str(p))


class TestHybridDecodeChaos:
    """Coefficient-READER failures injected mid-bucket (TODO r3: the prior
    chaos suite covered corrupt files; this covers the reader itself).
    Every failure mode must degrade to the host decode path with
    byte-identical outputs and all items Success."""

    def _run(self, tmp_path, rng, sub, device_decode=True):
        from image_processor_pipeline_tpu import (
            ProcessingPipeline, ProcessingStep)
        from image_processor_pipeline_tpu.transforms import EnhanceImage

        src_dir = tmp_path / "in_chaos"
        src_dir.mkdir(exist_ok=True)
        if not list(src_dir.glob("*.jpg")):
            for i in range(6):
                img = rng.integers(0, 256, (48 + 8 * i, 80 - 4 * i, 3),
                                   np.uint8)
                cv2.imwrite(str(src_dir / f"f{i}.jpg"), img[..., ::-1],
                            [cv2.IMWRITE_JPEG_QUALITY, 88])
        out = tmp_path / f"out_chaos_{sub}"
        pipe = ProcessingPipeline(root_dir=tmp_path)
        pipe.add_step(ProcessingStep(
            name="enh", process_function=EnhanceImage(),
            input_dirs=[src_dir.name], output_dirs=[out.name],
            pairing_method="one_input", seed=42,
            options={"device_decode": device_decode,
                     "native_compute": False}))
        counters = pipe.run(progress=False)
        assert counters[0]["Success"] == 6, dict(counters[0])
        return {p.name: p.read_bytes() for p in sorted(out.glob("*"))}

    def test_reader_failures_degrade_to_host(self, tmp_path, rng,
                                             monkeypatch):
        from image_processor_pipeline_tpu.io import native as ionative

        clean = self._run(tmp_path, rng, "clean")

        # 1. whole-call failure: sparse reader returns None -> the bucket
        #    takes the host decode path
        orig_sparse = ionative.read_jpeg_coefs_sparse_batch
        monkeypatch.setattr(
            ionative, "read_jpeg_coefs_sparse_batch",
            lambda *a, **k: None)
        assert self._run(tmp_path, rng, "none") == clean

        # 2. whole-call crash: sparse reader raises -> same degradation
        def boom(*a, **k):
            raise RuntimeError("injected reader crash")
        monkeypatch.setattr(
            ionative, "read_jpeg_coefs_sparse_batch", boom)
        assert self._run(tmp_path, rng, "raise") == clean

        # 3. mid-bucket per-item failure: every other item's info code is
        #    corrupted -> those items decode host-side, the rest on device
        def flaky(*a, **k):
            res = orig_sparse(*a, **k)
            if res is None:
                return None
            idx, val, nnz, qt, infos = res
            infos = np.array(infos, copy=True)
            infos[::2, 0] = -99
            return idx, val, nnz, qt, infos
        monkeypatch.setattr(
            ionative, "read_jpeg_coefs_sparse_batch", flaky)
        assert self._run(tmp_path, rng, "flaky") == clean

        # 4. sparse overflow ladder with a dead dense reader: all items
        #    report -6 and the dense retry crashes -> host fallback
        def all_overflow(*a, **k):
            res = orig_sparse(*a, **k)
            if res is None:
                return None
            idx, val, nnz, qt, infos = res
            infos = np.array(infos, copy=True)
            infos[:, 0] = -6
            return idx, val, nnz, qt, infos
        monkeypatch.setattr(
            ionative, "read_jpeg_coefs_sparse_batch", all_overflow)
        monkeypatch.setattr(ionative, "read_jpeg_coefs_batch", boom)
        assert self._run(tmp_path, rng, "overflow") == clean


class TestDeviceDecodeAutoGate:
    """device_decode defaults to AUTO (ops/jpeg.py:device_decode_enabled —
    on for accelerator backends, off on the CPU backend where the device
    half shares the host cores) with a dense-content hysteresis: a
    majority-dense batch (sparse-capacity overflows re-read through the
    dense ladder) trips a sticky per-transform disable, the decode mirror
    of the encode side's note_overflows."""

    class _T:  # stand-in transform instance for the sticky flag
        pass

    def test_gate_semantics(self):
        t = self._T()
        # the suite forces the CPU backend -> auto resolves to OFF
        assert not djpeg.device_decode_enabled({}, t)
        assert not djpeg.device_decode_enabled({"device_decode": None}, t)
        assert not djpeg.device_decode_enabled({"device_decode": "auto"}, t)
        assert not djpeg.device_decode_enabled({"device_decode": False}, t)
        assert djpeg.device_decode_enabled({"device_decode": True}, t)

    def test_majority_dense_trips_sticky_disable(self):
        t = self._T()
        djpeg.note_decode_dense(t, n_dense=12, n_total=16)
        # sticky overrides even an explicit True: the dense-content
        # penalty (sparse scan + dense re-read per item) must not be
        # re-paid on every subsequent batch of the run
        assert not djpeg.device_decode_enabled({"device_decode": True}, t)

    def test_minority_dense_keeps_running(self):
        t = self._T()
        djpeg.note_decode_dense(t, n_dense=6, n_total=16)
        assert djpeg.device_decode_enabled({"device_decode": True}, t)
        djpeg.note_decode_dense(t, n_dense=0, n_total=16)
        assert djpeg.device_decode_enabled({"device_decode": True}, t)

    def test_tiny_batch_cannot_trip(self):
        """One dense item alone in a size-1 remainder batch must NOT kill
        the transport for a long sparse run: the trip needs a minimum
        cumulative sample, and the counting is cumulative so the sparse
        majority that follows keeps the gate open."""
        t = self._T()
        djpeg.note_decode_dense(t, n_dense=1, n_total=1)  # dense remainder
        assert djpeg.device_decode_enabled({"device_decode": True}, t)
        djpeg.note_decode_dense(t, n_dense=0, n_total=15)  # sparse photos
        assert djpeg.device_decode_enabled({"device_decode": True}, t)
        # cumulative 1/16 never reaches majority even as the run grows
        djpeg.note_decode_dense(t, n_dense=0, n_total=64)
        assert djpeg.device_decode_enabled({"device_decode": True}, t)

    def test_reset_clears_sticky_and_counters(self):
        """The gates are per-RUN state: the engine calls reset_codec_gates
        at run start so a reused transform instance starts fresh."""
        t = self._T()
        djpeg.note_decode_dense(t, n_dense=16, n_total=16)
        djpeg.note_overflows(t, n_overflow=16, n_total=16)
        assert not djpeg.device_decode_enabled({"device_decode": True}, t)
        assert not djpeg.device_encode_enabled({"device_encode": True}, t)
        djpeg.reset_codec_gates(t)
        assert djpeg.device_decode_enabled({"device_decode": True}, t)
        assert djpeg.device_encode_enabled({"device_encode": True}, t)
        # counters reset too: 8/8 after reset is below the min sample
        djpeg.note_decode_dense(t, n_dense=8, n_total=8)
        assert djpeg.device_decode_enabled({"device_decode": True}, t)

    def test_fill_reports_dense_overflows(self, tmp_path, rng, monkeypatch):
        """The engine's stats hook must count the items that fell off the
        sparse transport onto the -6 dense ladder — and those items must
        still decode correctly (on device, dense transport)."""
        from image_processor_pipeline_tpu.io import images as ioimages
        from image_processor_pipeline_tpu.io import native as ionative

        paths, items = [], []
        for i, (h, w) in enumerate([(100, 120), (90, 90), (110, 100)]):
            p = tmp_path / f"dense{i}.jpg"
            Image.fromarray(
                rng.integers(0, 256, (h, w, 3), np.uint8)).save(p)
            hh, ww, canvas = ioimages.probe_padded(p, "RGB")
            assert canvas == (128, 128)  # one homogeneous device group
            paths.append(p)
            items.append({
                "canvas": canvas,
                "size": np.asarray([hh, ww], np.int32),
                "_decode": (str(p), "RGB", False),
            })

        orig = ionative.read_jpeg_coefs_sparse_batch

        def all_overflow(*a, **k):
            idx, val, nnz, qt, infos = orig(*a, **k)
            infos = np.array(infos, copy=True)
            infos[:, 0] = -6  # force every item onto the dense ladder
            return idx, val, nnz, qt, infos

        monkeypatch.setattr(
            ionative, "read_jpeg_coefs_sparse_batch", all_overflow)
        stats = {}
        ioimages.fill_pending_images(items, device_decode=True, stats=stats)
        assert stats == {"n": 3, "dense": 3}
        batch = np.asarray(items[0]["_prestacked_image"])
        for i, p in enumerate(paths):
            ref, h, w, _ = ioimages.decode_padded(p, mode="RGB")
            np.testing.assert_array_equal(batch[i], ref)

        # sparse-served batches report zero dense items — noise content
        # (above) is ~50% DCT-dense and overflows sparse capacity for
        # real, so use smooth gradients here (sparse after quantization)
        monkeypatch.setattr(
            ionative, "read_jpeg_coefs_sparse_batch", orig)
        items2 = []
        for i, (h, w) in enumerate([(100, 120), (90, 90), (110, 100)]):
            p = tmp_path / f"smooth{i}.jpg"
            yy, xx = np.mgrid[0:h, 0:w]
            img = np.stack([(yy * 2) % 256, (xx * 2) % 256,
                            ((yy + xx)) % 256], axis=-1).astype(np.uint8)
            Image.fromarray(img).save(p)
            hh, ww, canvas = ioimages.probe_padded(p, "RGB")
            assert canvas == (128, 128)
            items2.append({
                "canvas": canvas,
                "size": np.asarray([hh, ww], np.int32),
                "_decode": (str(p), "RGB", False),
            })
        stats2 = {}
        ioimages.fill_pending_images(
            items2, device_decode=True, stats=stats2)
        assert stats2["n"] == 3 and stats2["dense"] == 0

    def test_padded_chunk_still_device_decodes(self, tmp_path, rng):
        """Ladder/mesh padding repeats the tail dict; the device decode
        path must still engage (decode the unique head, zero-pad the tail
        rows like the host prestack) instead of silently falling back to
        the host pixel decode — and stats must count unique items only."""
        from image_processor_pipeline_tpu.io import images as ioimages

        paths, items = [], []
        for i, (h, w) in enumerate([(100, 120), (90, 90), (110, 100)]):
            p = tmp_path / f"pad{i}.jpg"
            Image.fromarray(
                rng.integers(0, 256, (h, w, 3), np.uint8)).save(p)
            hh, ww, canvas = ioimages.probe_padded(p, "RGB")
            paths.append(p)
            items.append({
                "canvas": canvas,
                "size": np.asarray([hh, ww], np.int32),
                "_decode": (str(p), "RGB", False),
            })
        chunk = items + [items[-1]] * 2  # engine-shaped tail padding
        stats = {}
        ioimages.fill_pending_images(chunk, device_decode=True, stats=stats)
        assert stats["n"] == 3  # unique items only
        batch = np.asarray(chunk[0]["_prestacked_image"])
        assert batch.shape[0] == 5
        for i, p in enumerate(paths):
            ref, h, w, _ = ioimages.decode_padded(p, mode="RGB")
            np.testing.assert_array_equal(batch[i], ref)
        assert not batch[3:].any()  # pad rows zero, like the host path
