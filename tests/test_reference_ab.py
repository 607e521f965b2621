"""Direct A/B parity: run the ACTUAL reference implementation (loaded from
/root/reference with dependency shims) and ours on identical inputs, and
compare outputs.  Skipped wholesale when the reference tree isn't mounted.

The reference imports `image_processor_pipeline.utils`, `ultralytics`,
`icecream`, and `deprecated`; tiny shims provide those so its modules load
unmodified.  No reference code is copied — it is imported read-only at test
time, exactly like a golden binary.
"""

import importlib.util
import random
import sys
import types
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

REF = Path("/root/reference")

pytestmark = pytest.mark.skipif(
    not REF.is_dir(), reason="reference tree not mounted"
)


@pytest.fixture(scope="module")
def ref_modules():
    """Load reference transform modules with shimmed dependencies."""
    cv2 = pytest.importorskip("cv2")

    # --- shims ---------------------------------------------------------
    from image_processor_pipeline_tpu.ops import bbox as our_bbox
    from image_processor_pipeline_tpu.utils.utils import IMG_FORMATS, VID_FORMATS

    ul = types.ModuleType("ultralytics")
    ul_utils = types.ModuleType("ultralytics.utils")
    ul_ops = types.ModuleType("ultralytics.utils.ops")
    ul_data = types.ModuleType("ultralytics.data")
    ul_data_utils = types.ModuleType("ultralytics.data.utils")

    def xywhn2xyxy(x, w=640, h=640, padw=0, padh=0):
        return np.asarray(our_bbox.xywhn2xyxy(np.asarray(x), w, h, padw, padh))

    def xyxy2xywhn(x, w=640, h=640, clip=False, eps=0.0):
        return np.asarray(our_bbox.xyxy2xywhn(np.asarray(x), w, h, clip, eps))

    ul_ops.xywhn2xyxy = xywhn2xyxy
    ul_ops.xyxy2xywhn = xyxy2xywhn
    ul_data_utils.IMG_FORMATS = IMG_FORMATS
    ul_data_utils.VID_FORMATS = VID_FORMATS
    ul.utils = ul_utils
    ul_utils.ops = ul_ops
    ul.data = ul_data
    ul_data.utils = ul_data_utils

    ic_mod = types.ModuleType("icecream")
    ic_mod.ic = lambda *a, **k: a[0] if a else None

    dep_mod = types.ModuleType("deprecated")

    def deprecated(*a, **k):
        def wrap(fn):
            return fn
        return wrap

    dep_mod.deprecated = deprecated

    shims = {
        "ultralytics": ul,
        "ultralytics.utils": ul_utils,
        "ultralytics.utils.ops": ul_ops,
        "ultralytics.data": ul_data,
        "ultralytics.data.utils": ul_data_utils,
        "icecream": ic_mod,
        "deprecated": dep_mod,
    }

    # reference-internal package: image_processor_pipeline.utils.utils
    pkg = types.ModuleType("image_processor_pipeline")
    pkg.__path__ = [str(REF)]
    utils_pkg = types.ModuleType("image_processor_pipeline.utils")
    spec = importlib.util.spec_from_file_location(
        "image_processor_pipeline.utils.utils", REF / "utils" / "utils.py"
    )
    ref_utils = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_utils)
    utils_pkg.utils = ref_utils
    pkg.utils = utils_pkg
    shims.update({
        "image_processor_pipeline": pkg,
        "image_processor_pipeline.utils": utils_pkg,
        "image_processor_pipeline.utils.utils": ref_utils,
    })

    saved = {k: sys.modules.get(k) for k in shims}
    sys.modules.update(shims)

    def load(name, rel):
        spec = importlib.util.spec_from_file_location(name, REF / rel)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    mods = {
        "labels": load("ref_labels", "transforms/labels.py"),
        "copy": load("ref_copy", "transforms/copy.py"),
        "recadrages": load("ref_recadrages", "transforms/recadrages.py"),
        "symmetry": load("ref_symmetry", "transforms/symmetry.py"),
        "pixels": load("ref_pixels", "transforms/pixels_isolés.py"),
        "filtres": load("ref_filtres", "transforms/filtres_liste.py"),
        "rotations": load("ref_rotations", "transforms/rotations.py"),
        "overlays": load("ref_overlays", "transforms/overlays.py"),
    }
    yield mods
    for k, v in saved.items():
        if v is None:
            sys.modules.pop(k, None)
        else:
            sys.modules[k] = v


class TestLabelRemapAB:
    def test_identical_output_files(self, ref_modules, tmp_path):
        from image_processor_pipeline_tpu.transforms import change_label_class

        src = tmp_path / "l.txt"
        src.write_text("0 0.5 0.5 0.1 0.1\n1 0.25 0.75 0.05 0.2\n3 0.9 0.1 0.3 0.3\n")
        (tmp_path / "a").mkdir()
        (tmp_path / "b").mkdir()
        ref_out = ref_modules["labels"].change_label_class(
            src, [tmp_path / "a"], cls_mapping={0: 9, 3: 1})
        our_out = change_label_class(src, [tmp_path / "b"],
                                     cls_mapping={0: 9, 3: 1})
        assert ref_out.read_text() == our_out.read_text()


class TestCopyAB:
    def test_identical_naming(self, ref_modules, tmp_path):
        from image_processor_pipeline_tpu.transforms import copy_files

        src = tmp_path / "raw_x.jpg"
        src.write_bytes(b"data")
        (tmp_path / "a").mkdir()
        (tmp_path / "b").mkdir()
        r = ref_modules["copy"].copy_files(src, [tmp_path / "a"], suffix="aug")
        o = copy_files(src, [tmp_path / "b"], suffix="aug")
        assert r.name == o.name
        r2 = ref_modules["copy"].copy_files(
            src, [tmp_path / "a"], replace_params=("raw_", "c_"))
        o2 = copy_files(src, [tmp_path / "b"], replace_params=("raw_", "c_"))
        assert r2.name == o2.name


class TestBorderCropAB:
    def test_identical_pixels(self, ref_modules, tmp_path, rng):
        from image_processor_pipeline_tpu import ProcessingPipeline, ProcessingStep
        from image_processor_pipeline_tpu.transforms import BorderCrop

        arr = rng.integers(0, 256, (100, 160, 3), dtype=np.uint8)
        (tmp_path / "in").mkdir()
        # PNG content in a .jpg would differ per encoder; use BMP-free route:
        # save losslessly as PNG then rename check fails the ref jpg gate, so
        # write a quality-100 jpg and compare decoded outputs of BOTH paths.
        src = tmp_path / "in" / "x.jpg"
        Image.fromarray(arr).save(src, quality=100, subsampling=0)
        (tmp_path / "a").mkdir()

        r = ref_modules["recadrages"].crop_from_border(
            src, [tmp_path / "a"], crop_margins=(0.1, 0.2, 10, 20))
        ref_px = np.asarray(Image.open(r).convert("RGB"))

        pipe = ProcessingPipeline(root_dir=tmp_path)
        pipe.add_step(ProcessingStep(
            name="bc", process_function=BorderCrop(),
            input_dirs=["in"], output_dirs=["b"],
            options={"crop_margins": (0.1, 0.2, 10, 20)}))
        pipe.run(progress=False)
        our_px = np.asarray(Image.open(tmp_path / "b" / "x.jpg").convert("RGB"))

        assert ref_px.shape == our_px.shape
        # same source decode, same slice — only the JPEG re-encode differs
        diff = np.abs(ref_px.astype(int) - our_px.astype(int))
        assert diff.mean() < 2.0


class TestSymmetryAB:
    def test_full_pool_pixel_identical(self, ref_modules, tmp_path, rng):
        from image_processor_pipeline_tpu import ProcessingPipeline, ProcessingStep
        from image_processor_pipeline_tpu.transforms import GenerateSymmetries

        arr = rng.integers(0, 256, (41, 57, 3), dtype=np.uint8)
        (tmp_path / "in").mkdir()
        src = tmp_path / "in" / "s.png"
        Image.fromarray(arr).save(src)
        (tmp_path / "a").mkdir()

        random.seed(0)
        ref_paths = ref_modules["symmetry"].generate_symmetries(
            src, [tmp_path / "a"])
        assert len(ref_paths) == 4

        pipe = ProcessingPipeline(root_dir=tmp_path)
        pipe.add_step(ProcessingStep(
            name="sym", process_function=GenerateSymmetries(),
            input_dirs=["in"], output_dirs=["b"], seed=3))
        pipe.run(progress=False)

        for sym in ("o", "h", "v", "hv"):
            ref_px = np.asarray(Image.open(tmp_path / "a" / f"s_{sym}.png"))
            # reference wrote BGR via cv2.imwrite from a cv2.imread — with a
            # PNG round trip both encode the same pixels; ours is RGB-native
            our_px = np.asarray(Image.open(tmp_path / "b" / f"s_{sym}.png"))
            np.testing.assert_array_equal(ref_px, our_px)


class TestCleanupAB:
    def test_identical_cleanup_and_crop(self, ref_modules, tmp_path):
        from image_processor_pipeline_tpu import ProcessingPipeline, ProcessingStep
        from image_processor_pipeline_tpu.transforms import KeepLargestComponent

        rgba = np.zeros((64, 64, 4), np.uint8)
        rgba[..., :3] = 120
        rgba[8:40, 8:40, 3] = 255    # main blob
        rgba[50:54, 50:54, 3] = 255  # small blob (dropped by both)
        rgba[2, 60, 3] = 255         # isolated pixel
        (tmp_path / "in").mkdir()
        src = tmp_path / "in" / "c.png"
        Image.fromarray(rgba).save(src)
        (tmp_path / "a").mkdir()

        r = ref_modules["pixels"].keep_largest_component(
            src, [tmp_path / "a"], min_component_size=10)
        ref_px = np.asarray(Image.open(r))

        pipe = ProcessingPipeline(root_dir=tmp_path)
        pipe.add_step(ProcessingStep(
            name="cl", process_function=KeepLargestComponent(),
            input_dirs=["in"], output_dirs=["b"],
            options={"min_component_size": 10}))
        pipe.run(progress=False)
        our_px = np.asarray(Image.open(tmp_path / "b" / "c.png"))

        np.testing.assert_array_equal(ref_px, our_px)


class TestRotationsAB:
    def test_fixed_angle_rotation_close_to_pil(self, ref_modules, tmp_path,
                                               rng):
        """Pin angle_min == angle_max → both sides rotate by exactly the
        same angle; compare PIL's output with the device op's."""
        from image_processor_pipeline_tpu import ProcessingPipeline, ProcessingStep
        from image_processor_pipeline_tpu.transforms import RandomRotations

        arr = rng.integers(0, 256, (40, 60, 4), dtype=np.uint8)
        arr[..., 3] = 255
        (tmp_path / "in").mkdir()
        src = tmp_path / "in" / "r.png"
        Image.fromarray(arr).save(src)
        (tmp_path / "a").mkdir()

        opts = dict(num_rotations=1, include_original=False,
                    angle_min=77.0, angle_max=77.0)
        ref_paths = ref_modules["rotations"].process_rotations(
            src, [tmp_path / "a"], **opts)
        ref_px = np.asarray(Image.open(ref_paths[0]))

        pipe = ProcessingPipeline(root_dir=tmp_path)
        pipe.add_step(ProcessingStep(
            name="rot", process_function=RandomRotations(),
            input_dirs=["in"], output_dirs=["b"], seed=1, options=opts))
        pipe.run(progress=False)
        our_px = np.asarray(Image.open(tmp_path / "b" / "r_r001.png"))

        # PIL expand-box/getbbox may differ by ±1 px at the edges
        assert abs(ref_px.shape[0] - our_px.shape[0]) <= 1
        assert abs(ref_px.shape[1] - our_px.shape[1]) <= 1
        hh = min(ref_px.shape[0], our_px.shape[0])
        ww = min(ref_px.shape[1], our_px.shape[1])
        match = (ref_px[:hh, :ww] == our_px[:hh, :ww]).all(axis=-1).mean()
        assert match > 0.95, f"pixel match {match:.4f}"


class TestOverlaysAB:
    def test_deterministic_fullsize_paste(self, ref_modules, tmp_path, rng):
        """scale pinned to 1.0 caps the overlay at the background size
        (same aspect), forcing position (0,0) on both sides — the whole
        composite becomes deterministic."""
        from image_processor_pipeline_tpu import ProcessingPipeline, ProcessingStep
        from image_processor_pipeline_tpu.transforms import (
            PasteOverlayOntoBackground,
        )

        # smooth content: a ±1px size difference (float-boundary truncation
        # in the reference, see label assertion below) must not explode the
        # pixel comparison the way resized noise would
        gy = np.linspace(0, 255, 40)[:, None]
        gx = np.linspace(0, 255, 80)[None, :]
        ov = np.zeros((40, 80, 4), np.uint8)
        ov[..., 0] = gy
        ov[..., 1] = gx
        ov[..., 2] = 128
        ov[..., 3] = (gy + gx) / 2
        bgy = np.linspace(255, 0, 60)[:, None]
        bgx = np.linspace(0, 255, 120)[None, :]
        bg = np.stack([np.broadcast_to(bgy, (60, 120)),
                       np.broadcast_to(bgx, (60, 120)),
                       np.full((60, 120), 60.0)], -1).astype(np.uint8)
        (tmp_path / "ov").mkdir()
        (tmp_path / "bg").mkdir()
        ov_p = tmp_path / "ov" / "o.png"
        bg_p = tmp_path / "bg" / "b.png"
        Image.fromarray(ov).save(ov_p)
        Image.fromarray(bg).save(bg_p)
        (tmp_path / "a1").mkdir()
        (tmp_path / "a2").mkdir()

        opts = dict(scale_min=1.0, scale_max=1.0, yolo_class_id=2)
        ref_paths = ref_modules["overlays"].paste_overlay_onto_background(
            ov_p, bg_p, [tmp_path / "a1", tmp_path / "a2"], **opts)
        ref_px = np.asarray(Image.open(ref_paths[0]).convert("RGB"))
        ref_lbl = ref_paths[1].read_text()

        pipe = ProcessingPipeline(root_dir=tmp_path)
        pipe.add_step(ProcessingStep(
            name="p", process_function=PasteOverlayOntoBackground(),
            input_dirs=["ov", "bg"], output_dirs=["b1", "b2"],
            pairing_method="modulo", seed=2, options=opts))
        pipe.run(progress=False)
        our_px = np.asarray(Image.open(tmp_path / "b1" / "o.png").convert("RGB"))
        our_lbl = (tmp_path / "b2" / "o.txt").read_text()

        # the pinned scale lands the sizing math exactly on an integer
        # boundary where the reference's float64 int() truncation can fall
        # 1px below our float32 — compare semantically, not byte-wise
        rv = [float(x) for x in ref_lbl.split()]
        ov_ = [float(x) for x in our_lbl.split()]
        assert rv[0] == ov_[0] == 2
        np.testing.assert_allclose(rv[1:], ov_[1:], atol=2 / 60)
        assert ref_px.shape == our_px.shape
        # both composites must be overlay-dominated in the shared interior
        inner = (slice(2, 56), slice(2, 116))
        diff = np.abs(ref_px[inner].astype(int) - our_px[inner].astype(int))
        assert diff.mean() < 8.0  # ±1px scale offset + LANCZOS rounding


class TestColorMaskAB:
    def test_identical_alpha_and_pixels(self, ref_modules, tmp_path, rng):
        from image_processor_pipeline_tpu import ProcessingPipeline, ProcessingStep
        from image_processor_pipeline_tpu.transforms import ColorMaskTransparency

        arr = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
        (tmp_path / "in").mkdir()
        src = tmp_path / "in" / "f.png"
        Image.fromarray(arr).save(src)
        (tmp_path / "a").mkdir()

        filters = [(35, 60, 60, 85, 255, 255), (100, 40, 40, 140, 230, 230)]
        zones = [None, (6, 6, 4, 4)]
        r = ref_modules["filtres"].process_images_with_color_masks(
            src, [tmp_path / "a"], color_ranges_to_exclude_hsv=filters,
            zones=zones, output_prefix="p")
        ref_px = np.asarray(Image.open(r))  # BGRA written by cv2 → PNG RGBA

        pipe = ProcessingPipeline(root_dir=tmp_path)
        pipe.add_step(ProcessingStep(
            name="cm", process_function=ColorMaskTransparency(),
            input_dirs=["in"], output_dirs=["b"],
            options={"color_ranges_to_exclude_hsv": filters, "zones": zones,
                     "output_prefix": "p"}))
        pipe.run(progress=False)
        our_px = np.asarray(Image.open(tmp_path / "b" / "p_f.png"))

        assert ref_px.shape == our_px.shape
        # byte-identical: rgb_to_hsv_u8 replicates cv2's fixed-point math
        np.testing.assert_array_equal(ref_px, our_px)


class TestFitCropJpegByteParity:
    def test_fit_crop_jpg_output_byte_identical(self, ref_modules, tmp_path,
                                                rng):
        """fit_crop is deterministic (no draws) and the reference saves via
        PIL (recadrages.py:80, JPEG default q75): with the PIL-parity
        encoder our .jpg OUTPUT FILE must be byte-identical to the
        reference's."""
        from image_processor_pipeline_tpu import (
            ProcessingPipeline,
            ProcessingStep,
        )
        from image_processor_pipeline_tpu.transforms import FitCrop

        (tmp_path / "in").mkdir()
        src = tmp_path / "in" / "f.jpg"
        arr = rng.integers(0, 256, (90, 120, 3), np.uint8)
        Image.fromarray(arr).save(src, quality=92)
        (tmp_path / "a").mkdir()

        ref_path = ref_modules["recadrages"].fit_crop(src, [tmp_path / "a"])
        pipe = ProcessingPipeline(root_dir=tmp_path)
        pipe.add_step(ProcessingStep(
            name="fc", process_function=FitCrop(), input_dirs=["in"],
            output_dirs=["b"], seed=0))
        pipe.run(progress=False)
        ours = tmp_path / "b" / "f.jpg"
        assert ours.read_bytes() == Path(ref_path).read_bytes()


class TestFusedPipelineVsReferenceAB:
    def test_auto_fused_pipeline_matches_reference_stages(
            self, ref_modules, tmp_path, rng):
        """The whole-pipeline claim, measured against the GOLDEN
        implementation: the reference's mask -> cleanup -> fit-crop run
        (its per-file stage loop over sorted inventories, three
        disk-materialized stages) and OUR migrated 3-step pipeline under
        ``auto_fuse=True`` (ONE FusedChain step, no intermediates)
        produce the same file names with PIXEL-identical content (the
        final .png rides our pixel-identical fast-mode encoder; JPEG
        byte parity is pinned separately in TestFitCropJpegByteParity)."""
        from image_processor_pipeline_tpu import (
            ProcessingPipeline,
            ProcessingStep,
        )
        from image_processor_pipeline_tpu.transforms import (
            ColorMaskTransparency,
            FitCrop,
            KeepLargestComponent,
        )

        (tmp_path / "in").mkdir()
        for i in range(3):
            h, w = 40 + 6 * i, 56
            arr = np.full((h, w, 3), 200, np.uint8)
            arr[5:h - 8, 5:w - 8] = (180, 40, 60)
            arr[8:14, 8:14] = (60, 200, 60)  # masked-out green
            arr[h - 12:h - 8, w - 12:w - 8] = (60, 200, 60)
            Image.fromarray(arr).save(tmp_path / "in" / f"x{i}.png")
        filters = [(35, 60, 60, 85, 255, 255)]

        # reference: three per-file stage loops over sorted inventories
        # (what its ProcessingPipeline does for one_input steps)
        for d in ("r1", "r2", "r3"):
            (tmp_path / d).mkdir()
        for src in sorted((tmp_path / "in").iterdir()):
            ref_modules["filtres"].process_images_with_color_masks(
                src, [tmp_path / "r1"],
                color_ranges_to_exclude_hsv=filters)
        for src in sorted((tmp_path / "r1").iterdir()):
            ref_modules["pixels"].keep_largest_component(
                src, [tmp_path / "r2"], min_component_size=10)
        for src in sorted((tmp_path / "r2").iterdir()):
            ref_modules["recadrages"].fit_crop(src, [tmp_path / "r3"])

        pipe = ProcessingPipeline(root_dir=tmp_path)
        pipe.add_step(ProcessingStep(
            "mask", ColorMaskTransparency(), input_dirs=["in"],
            output_dirs=["m"], pairing_method="one_input",
            options={"color_ranges_to_exclude_hsv": filters}))
        pipe.add_step(ProcessingStep(
            "clean", KeepLargestComponent(), output_dirs=["c"],
            pairing_method="one_input",
            options={"min_component_size": 10}))
        pipe.add_step(ProcessingStep(
            "fit", FitCrop(), output_dirs=["f"],
            pairing_method="one_input"))
        counters = pipe.run(progress=False, auto_fuse=True)
        assert len(counters) == 1  # really ONE fused step
        assert not (tmp_path / "m").exists()  # no intermediates written

        ref_files = sorted((tmp_path / "r3").iterdir())
        our_files = sorted((tmp_path / "f").iterdir())
        assert [p.name for p in ref_files] == [p.name for p in our_files]
        assert len(ref_files) == 3
        # PIXEL-identical: the final .png rides our engine encoder
        # (pixel-identical fast mode — byte-stream parity with PIL's
        # zlib is not claimed for PNG; the JPEG byte-parity claim is
        # pinned in TestFitCropJpegByteParity)
        for rp, op in zip(ref_files, our_files):
            a = np.asarray(Image.open(rp))
            b = np.asarray(Image.open(op))
            np.testing.assert_array_equal(a, b, err_msg=rp.name)


class TestFanoutFusionVsReferenceAB:
    """The round-5 fan-out shapes measured against the GOLDEN
    implementation: the reference's per-file stage loops with a
    symmetries stage at the end/head vs OUR migrated pipelines under
    ``auto_fuse=True`` (ONE fan-out step, no intermediates) — same file
    names, PIXEL-identical content."""

    def _mkrgba(self, d, n=3):
        d.mkdir()
        for i in range(n):
            h, w = 42 + 6 * i, 56
            arr = np.full((h, w, 4), 255, np.uint8)
            arr[..., :3] = (180, 40, 60)
            arr[:6, :, 3] = 0
            arr[8:14, 8:14, :3] = (60, 200, 60)  # masked-out green
            Image.fromarray(arr).save(d / f"x{i}.png")

    def _assert_pixel_identical(self, ref_dir, our_dir, n_expected):
        ref_files = sorted(Path(ref_dir).iterdir())
        our_files = sorted(Path(our_dir).iterdir())
        assert [p.name for p in ref_files] == [p.name for p in our_files]
        assert len(ref_files) == n_expected
        for rp, op in zip(ref_files, our_files):
            a = np.asarray(Image.open(rp))
            b = np.asarray(Image.open(op))
            np.testing.assert_array_equal(a, b, err_msg=rp.name)

    def test_chain_then_sym_matches_reference(self, ref_modules, tmp_path):
        """mask -> cleanup -> symmetries: the reference's three per-file
        stage loops vs our ONE ChainSymmetries step."""
        from image_processor_pipeline_tpu import (
            ProcessingPipeline,
            ProcessingStep,
        )
        from image_processor_pipeline_tpu.transforms import (
            ColorMaskTransparency,
            GenerateSymmetries,
            KeepLargestComponent,
        )

        self._mkrgba(tmp_path / "in")
        filters = [(35, 60, 60, 85, 255, 255)]
        for d in ("r1", "r2", "r3"):
            (tmp_path / d).mkdir()
        for src in sorted((tmp_path / "in").iterdir()):
            ref_modules["filtres"].process_images_with_color_masks(
                src, [tmp_path / "r1"],
                color_ranges_to_exclude_hsv=filters)
        for src in sorted((tmp_path / "r1").iterdir()):
            ref_modules["pixels"].keep_largest_component(
                src, [tmp_path / "r2"], min_component_size=10)
        for src in sorted((tmp_path / "r2").iterdir()):
            ref_modules["symmetry"].generate_symmetries(
                src, [tmp_path / "r3"])

        pipe = ProcessingPipeline(root_dir=tmp_path)
        pipe.add_step(ProcessingStep(
            "mask", ColorMaskTransparency(), input_dirs=["in"],
            output_dirs=["m"], pairing_method="one_input",
            options={"color_ranges_to_exclude_hsv": filters}))
        pipe.add_step(ProcessingStep(
            "clean", KeepLargestComponent(), output_dirs=["c"],
            pairing_method="one_input",
            options={"min_component_size": 10}))
        pipe.add_step(ProcessingStep(
            "sym", GenerateSymmetries(), output_dirs=["s"],
            pairing_method="one_input"))
        counters = pipe.run(progress=False, auto_fuse=True)
        assert len(counters) == 1  # really ONE fused fan-out step
        assert not (tmp_path / "m").exists()
        assert not (tmp_path / "c").exists()
        self._assert_pixel_identical(tmp_path / "r3", tmp_path / "s", 12)

    def test_sym_then_chain_matches_reference(self, ref_modules, tmp_path):
        """symmetries -> mask -> cleanup: the fan-out at the HEAD vs our
        ONE draw-free SymmetriesChain step."""
        from image_processor_pipeline_tpu import (
            ProcessingPipeline,
            ProcessingStep,
        )
        from image_processor_pipeline_tpu.transforms import (
            ColorMaskTransparency,
            GenerateSymmetries,
            KeepLargestComponent,
        )

        self._mkrgba(tmp_path / "in")
        filters = [(35, 60, 60, 85, 255, 255)]
        for d in ("r1", "r2", "r3"):
            (tmp_path / d).mkdir()
        for src in sorted((tmp_path / "in").iterdir()):
            ref_modules["symmetry"].generate_symmetries(
                src, [tmp_path / "r1"])
        for src in sorted((tmp_path / "r1").iterdir()):
            ref_modules["filtres"].process_images_with_color_masks(
                src, [tmp_path / "r2"],
                color_ranges_to_exclude_hsv=filters)
        for src in sorted((tmp_path / "r2").iterdir()):
            ref_modules["pixels"].keep_largest_component(
                src, [tmp_path / "r3"], min_component_size=10)

        pipe = ProcessingPipeline(root_dir=tmp_path)
        pipe.add_step(ProcessingStep(
            "sym", GenerateSymmetries(), input_dirs=["in"],
            output_dirs=["s"], pairing_method="one_input"))
        pipe.add_step(ProcessingStep(
            "mask", ColorMaskTransparency(), output_dirs=["m"],
            pairing_method="one_input",
            options={"color_ranges_to_exclude_hsv": filters}))
        pipe.add_step(ProcessingStep(
            "clean", KeepLargestComponent(), output_dirs=["k"],
            pairing_method="one_input",
            options={"min_component_size": 10}))
        counters = pipe.run(progress=False, auto_fuse=True)
        assert len(counters) == 1  # really ONE fused fan-out step
        assert not (tmp_path / "s").exists() or not any(
            (tmp_path / "s").iterdir())
        assert not (tmp_path / "m").exists()
        self._assert_pixel_identical(tmp_path / "r3", tmp_path / "k", 12)

    def test_sym_chain_sym_matches_reference(self, ref_modules, tmp_path):
        """symmetries -> mask -> cleanup -> symmetries: the dihedral
        fan-out at BOTH ends vs our ONE SymmetriesChainSymmetries step."""
        from image_processor_pipeline_tpu import (
            ProcessingPipeline,
            ProcessingStep,
        )
        from image_processor_pipeline_tpu.transforms import (
            ColorMaskTransparency,
            GenerateSymmetries,
            KeepLargestComponent,
        )

        self._mkrgba(tmp_path / "in")
        filters = [(35, 60, 60, 85, 255, 255)]
        for d in ("r1", "r2", "r3", "r4"):
            (tmp_path / d).mkdir()
        for src in sorted((tmp_path / "in").iterdir()):
            ref_modules["symmetry"].generate_symmetries(
                src, [tmp_path / "r1"])
        for src in sorted((tmp_path / "r1").iterdir()):
            ref_modules["filtres"].process_images_with_color_masks(
                src, [tmp_path / "r2"],
                color_ranges_to_exclude_hsv=filters)
        for src in sorted((tmp_path / "r2").iterdir()):
            ref_modules["pixels"].keep_largest_component(
                src, [tmp_path / "r3"], min_component_size=10)
        for src in sorted((tmp_path / "r3").iterdir()):
            ref_modules["symmetry"].generate_symmetries(
                src, [tmp_path / "r4"])

        pipe = ProcessingPipeline(root_dir=tmp_path)
        pipe.add_step(ProcessingStep(
            "sym", GenerateSymmetries(), input_dirs=["in"],
            output_dirs=["s"], pairing_method="one_input"))
        pipe.add_step(ProcessingStep(
            "mask", ColorMaskTransparency(), output_dirs=["m"],
            pairing_method="one_input",
            options={"color_ranges_to_exclude_hsv": filters}))
        pipe.add_step(ProcessingStep(
            "clean", KeepLargestComponent(), output_dirs=["k"],
            pairing_method="one_input",
            options={"min_component_size": 10}))
        pipe.add_step(ProcessingStep(
            "sym2", GenerateSymmetries(), output_dirs=["s2"],
            pairing_method="one_input"))
        counters = pipe.run(progress=False, auto_fuse=True)
        assert len(counters) == 1  # really ONE fused fan-out step
        for d in ("s", "m", "k"):
            assert not (tmp_path / d).exists()
        # 3 inputs x 4 head syms x 4 tail syms
        self._assert_pixel_identical(tmp_path / "r4", tmp_path / "s2", 48)
