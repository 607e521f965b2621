"""Automatic stage fusion (ProcessingPipeline.run(auto_fuse=True)):
eligible deterministic step runs collapse into one FusedChain step with
byte-identical final outputs and no intermediate materialization; every
ineligible shape is left alone."""

import numpy as np
import pytest
from PIL import Image

from image_processor_pipeline_tpu import ProcessingPipeline, ProcessingStep
from image_processor_pipeline_tpu.transforms import (
    ColorMaskTransparency,
    EnhanceImage,
    FitCrop,
    KeepLargestComponent,
)

HSV = [(35, 60, 60, 85, 255, 255)]


def _mkimgs(d, n=3, size=(50, 70), seed=0):
    rng = np.random.default_rng(seed)
    d.mkdir(parents=True, exist_ok=True)
    h, w = size
    for i in range(n):
        # content with a large opaque blob + green patches the mask cuts,
        # so cleanup has real components to keep/drop
        arr = np.full((h, w, 3), 200, np.uint8)
        arr[5:40, 5:50] = (180, 40, 60)
        for _ in range(4):
            y, x = int(rng.integers(0, h - 6)), int(rng.integers(0, w - 6))
            arr[y:y + 5, x:x + 5] = (60, 200, 60)  # masked out -> holes
        Image.fromarray(arr).save(d / f"x{i}.png")


def _mask_step(name="mask", out="m", **kw):
    return ProcessingStep(
        name, ColorMaskTransparency(), input_dirs=["in"], output_dirs=[out],
        pairing_method="one_input", seed=3,
        options={"color_ranges_to_exclude_hsv": HSV,
                 **kw.pop("options", {})}, **kw)


def _read_dir(d):
    return {p.name: p.read_bytes() for p in sorted(d.iterdir())}


class TestAutoFuse:
    def test_maskclean_byte_identical(self, tmp_path):
        _mkimgs(tmp_path / "in")
        results = {}
        for tag, fuse in (("plain", False), ("fused", True)):
            root = tmp_path / tag
            root.mkdir()
            (root / "in").symlink_to(tmp_path / "in")
            pipe = ProcessingPipeline(root_dir=root)
            pipe.add_step(_mask_step())
            pipe.add_step(ProcessingStep(
                "clean", KeepLargestComponent(), output_dirs=["c"],
                pairing_method="one_input", seed=5,
                options={"min_component_size": 20}))
            counters = pipe.run(progress=False, auto_fuse=fuse)
            results[tag] = (counters, _read_dir(root / "c"),
                            (root / "m").exists())
        plain, fused = results["plain"], results["fused"]
        assert len(plain[0]) == 2 and len(fused[0]) == 1  # really fused
        assert fused[0][0]["Success"] == 3
        assert plain[1] == fused[1]  # final bytes identical
        assert plain[2] and not fused[2]  # intermediate dir elided

    def test_three_stage_chain(self, tmp_path):
        _mkimgs(tmp_path / "in")
        results = {}
        for tag, fuse in (("plain", False), ("fused", True)):
            root = tmp_path / tag
            root.mkdir()
            (root / "in").symlink_to(tmp_path / "in")
            pipe = ProcessingPipeline(root_dir=root)
            pipe.add_step(_mask_step())
            pipe.add_step(ProcessingStep(
                "clean", KeepLargestComponent(), output_dirs=["c"],
                pairing_method="one_input",
                options={"min_component_size": 20}))
            pipe.add_step(ProcessingStep(
                "fit", FitCrop(), output_dirs=["f"],
                pairing_method="one_input"))
            counters = pipe.run(progress=False, auto_fuse=fuse)
            results[tag] = (counters, _read_dir(root / "f"))
        assert len(results["plain"][0]) == 3
        assert len(results["fused"][0]) == 1
        assert results["plain"][1] == results["fused"][1]

    def test_relative_root_dir(self, tmp_path, monkeypatch):
        """A RELATIVE pipeline root must not double-resolve the fused
        step's dirs (root/root/<dir>)."""
        monkeypatch.chdir(tmp_path)
        _mkimgs(tmp_path / "work" / "in")
        pipe = ProcessingPipeline(root_dir="work")
        pipe.add_step(_mask_step())
        pipe.add_step(ProcessingStep(
            "clean", KeepLargestComponent(), output_dirs=["c"],
            pairing_method="one_input",
            options={"min_component_size": 20}))
        counters = pipe.run(progress=False, auto_fuse=True)
        assert len(counters) == 1 and counters[0]["Success"] == 3
        assert len(list((tmp_path / "work" / "c").iterdir())) == 3
        assert pipe.last_run_steps[0].name == "mask+clean"

    def test_aliased_intermediate_reader_blocks_fusion(self, tmp_path):
        """A reader addressing the elided dir through an unnormalized
        alias (c/../m) must still block fusion."""
        _mkimgs(tmp_path / "in")
        pipe = ProcessingPipeline(root_dir=tmp_path)
        pipe.add_step(_mask_step())
        pipe.add_step(ProcessingStep(
            "clean", KeepLargestComponent(), output_dirs=["c"],
            pairing_method="one_input",
            options={"min_component_size": 20}))
        pipe.add_step(ProcessingStep(
            "fit_alias", FitCrop(), input_dirs=["c/../m"],
            output_dirs=["f"], pairing_method="one_input",
            fixed_input=True))
        counters = pipe.run(progress=False, auto_fuse=True)
        assert len(counters) == 3
        assert (tmp_path / "m").exists()

    def test_rng_step_not_fused(self, tmp_path):
        """EnhanceImage draws RNG: fusing would change the draw tree, so
        it must stay a separate step (and the mask step then has no fuse
        partner)."""
        _mkimgs(tmp_path / "in")
        pipe = ProcessingPipeline(root_dir=tmp_path)
        pipe.add_step(_mask_step())
        pipe.add_step(ProcessingStep(
            "enh", EnhanceImage(), output_dirs=["e"],
            pairing_method="one_input", seed=4))
        counters = pipe.run(progress=False, auto_fuse=True)
        assert len(counters) == 2
        assert (tmp_path / "m").exists()

    def test_intermediate_reader_blocks_fusion(self, tmp_path):
        """A third step reading the would-be-elided intermediate keeps
        the run unfused: those files must exist."""
        _mkimgs(tmp_path / "in")
        pipe = ProcessingPipeline(root_dir=tmp_path)
        pipe.add_step(_mask_step())
        pipe.add_step(ProcessingStep(
            "clean", KeepLargestComponent(), output_dirs=["c"],
            pairing_method="one_input",
            options={"min_component_size": 20}))
        pipe.add_step(ProcessingStep(
            "fit_of_mask", FitCrop(), input_dirs=["m"], output_dirs=["f"],
            pairing_method="one_input", fixed_input=True))
        counters = pipe.run(progress=False, auto_fuse=True)
        assert len(counters) == 3
        assert (tmp_path / "m").exists()

    def test_unknown_option_blocks_fusion(self, tmp_path):
        _mkimgs(tmp_path / "in")
        pipe = ProcessingPipeline(root_dir=tmp_path)
        pipe.add_step(_mask_step(options={"mystery_knob": 1}))
        pipe.add_step(ProcessingStep(
            "clean", KeepLargestComponent(), output_dirs=["c"],
            pairing_method="one_input",
            options={"min_component_size": 20}))
        counters = pipe.run(progress=False, auto_fuse=True)
        assert len(counters) == 2

    def test_prefix_blocks_fusion(self, tmp_path):
        """output_prefix changes the naming scheme the chain can't
        reproduce — stays per-step."""
        _mkimgs(tmp_path / "in")
        pipe = ProcessingPipeline(root_dir=tmp_path)
        pipe.add_step(_mask_step(options={"output_prefix": "pfx"}))
        pipe.add_step(ProcessingStep(
            "fit", FitCrop(), output_dirs=["f"],
            pairing_method="one_input"))
        counters = pipe.run(progress=False, auto_fuse=True)
        assert len(counters) == 2

    def test_sample_k_blocks_fusion(self, tmp_path):
        _mkimgs(tmp_path / "in")
        pipe = ProcessingPipeline(root_dir=tmp_path)
        pipe.add_step(_mask_step())
        pipe.add_step(ProcessingStep(
            "clean", KeepLargestComponent(), output_dirs=["c"],
            pairing_method="one_input", sample_k=2,
            options={"min_component_size": 20}))
        counters = pipe.run(progress=False, auto_fuse=True)
        assert len(counters) == 2


class TestRotSymFusion:
    """Adjacent rotations → symmetries pairs fuse into one fan-out step
    with byte-identical outputs (the rotations RNG tree rides the copied
    step seed; the symmetry selection is deterministic when choose_random
    covers the pool)."""

    def _mkimgs(self, d, n=3):
        rng = np.random.default_rng(1)
        d.mkdir(parents=True, exist_ok=True)
        for i in range(n):
            arr = rng.integers(0, 256, (38 + 5 * i, 46, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"x{i}.png")
        # RGBA with transparent border: exercises the tight-crop bbox
        arr = np.zeros((40, 52, 4), np.uint8)
        arr[8:30, 10:44] = (200, 50, 80, 255)
        Image.fromarray(arr).save(d / "t.png")

    def _steps(self, rot_options=None, sym_options=None, **sym_kw):
        from image_processor_pipeline_tpu.transforms import (
            GenerateSymmetries,
            RandomRotations,
        )

        return [
            ProcessingStep(
                "rot", RandomRotations(), input_dirs=["in"],
                output_dirs=["r"], pairing_method="one_input", seed=7,
                options={"num_rotations": 2, **(rot_options or {})}),
            ProcessingStep(
                "sym", GenerateSymmetries(), output_dirs=["s"],
                pairing_method="one_input", seed=11,
                options=sym_options, **sym_kw),
        ]

    def _run_pair(self, tmp_path, rot_options=None, sym_options=None):
        self._mkimgs(tmp_path / "in")
        results = {}
        for tag, fuse in (("plain", False), ("fused", True)):
            root = tmp_path / tag
            root.mkdir()
            (root / "in").symlink_to(tmp_path / "in")
            pipe = ProcessingPipeline(root_dir=root)
            for s in self._steps(rot_options, sym_options):
                pipe.add_step(s)
            counters = pipe.run(progress=False, auto_fuse=fuse)
            results[tag] = (counters, _read_dir(root / "s"),
                            (root / "r").exists())
        return results

    def test_byte_identical(self, tmp_path):
        res = self._run_pair(tmp_path)
        plain, fused = res["plain"], res["fused"]
        assert len(plain[0]) == 2 and len(fused[0]) == 1  # really fused
        assert fused[0][0]["Success"] == 4
        # (2 rotations + r000 original) x (o,h,v,hv) x 4 inputs
        assert len(plain[1]) == 48
        assert plain[1] == fused[1]  # names AND bytes identical
        assert plain[2] and not fused[2]  # intermediate dir elided

    def test_pool_subset_byte_identical(self, tmp_path):
        # pool without 'o': include_original appends it (symmetry parity)
        res = self._run_pair(
            tmp_path,
            rot_options={"include_original": False, "num_rotations": 1},
            sym_options={"pool": ("h", "v")})
        assert len(res["fused"][0]) == 1
        assert len(res["plain"][1]) == 12  # 1 rot x (h,v,o) x 4 inputs
        assert res["plain"][1] == res["fused"][1]

    def test_choose_random_subpool_blocks(self, tmp_path):
        # a random sub-pool selection seeds per intermediate FILE in the
        # standalone run — not reproducible fused, so no fusion
        self._mkimgs(tmp_path / "in")
        pipe = ProcessingPipeline(root_dir=tmp_path)
        for s in self._steps(sym_options={"choose_random": 2}):
            pipe.add_step(s)
        counters = pipe.run(progress=False, auto_fuse=True)
        assert len(counters) == 2
        assert (tmp_path / "r").exists()

    def test_jpeg_intermediate_blocks(self, tmp_path):
        # a lossy intermediate would be re-quantized between standalone
        # stages: fusing would change bytes
        self._mkimgs(tmp_path / "in")
        pipe = ProcessingPipeline(root_dir=tmp_path)
        for s in self._steps(rot_options={"output_format": "jpeg"}):
            pipe.add_step(s)
        counters = pipe.run(progress=False, auto_fuse=True)
        assert len(counters) == 2

    def test_composes_with_chain_fusion(self, tmp_path):
        """mask -> cleanup -> rotations -> symmetry collapses to TWO
        fused steps (one FusedChain + one RotationsSymmetries),
        byte-identical to the 4-step run."""
        from image_processor_pipeline_tpu.transforms import (
            GenerateSymmetries,
            KeepLargestComponent,
            RandomRotations,
        )

        _mkimgs(tmp_path / "in")
        results = {}
        for tag, fuse in (("plain", False), ("fused", True)):
            root = tmp_path / tag
            root.mkdir()
            (root / "in").symlink_to(tmp_path / "in")
            pipe = ProcessingPipeline(root_dir=root)
            pipe.add_step(_mask_step())
            pipe.add_step(ProcessingStep(
                "clean", KeepLargestComponent(), output_dirs=["c"],
                pairing_method="one_input",
                options={"min_component_size": 20}))
            pipe.add_step(ProcessingStep(
                "rot", RandomRotations(), output_dirs=["r"],
                pairing_method="one_input", seed=7,
                options={"num_rotations": 1,
                         "include_original": False}))
            pipe.add_step(ProcessingStep(
                "sym", GenerateSymmetries(), output_dirs=["s"],
                pairing_method="one_input"))
            counters = pipe.run(progress=False, auto_fuse=fuse)
            results[tag] = (counters, _read_dir(root / "s"),
                            [(root / d).exists() for d in ("m", "c", "r")])
        plain, fused = results["plain"], results["fused"]
        assert len(plain[0]) == 4 and len(fused[0]) == 2
        assert plain[1] == fused[1]
        # m and r elided; c is the chain's real output and must exist
        assert fused[2] == [False, True, False]

    def test_mesh_byte_identical(self, tmp_path):
        """RotationsSymmetries under in-process data parallelism
        (ProcessingStep(mesh=4), jit path) produces byte-identical files
        vs single-device."""
        from image_processor_pipeline_tpu.transforms import (
            RotationsSymmetries,
        )

        self._mkimgs(tmp_path / "in")
        results = {}
        for tag, mesh in (("one", None), ("mesh", 4)):
            root = tmp_path / tag
            root.mkdir()
            (root / "in").symlink_to(tmp_path / "in")
            pipe = ProcessingPipeline(root_dir=root)
            pipe.add_step(ProcessingStep(
                "rs", RotationsSymmetries(), input_dirs=["in"],
                output_dirs=["s"], pairing_method="one_input", seed=5,
                mesh=mesh,
                options={"num_rotations": 2,
                         "native_compute": False}))
            counters = pipe.run(progress=False)
            assert counters[0]["Success"] == 4
            results[tag] = _read_dir(root / "s")
        assert results["one"] == results["mesh"]

    def test_direct_subpool_sampling(self, tmp_path):
        """Direct (non-auto-fuse) use with choose_random < len(pool):
        per-rotation sampled subsets, deterministic per seed."""
        from image_processor_pipeline_tpu.transforms import (
            RotationsSymmetries,
        )

        self._mkimgs(tmp_path / "in", n=2)
        names = []
        for run in range(2):
            out = tmp_path / f"o{run}"
            pipe = ProcessingPipeline(root_dir=tmp_path)
            pipe.add_step(ProcessingStep(
                "rs", RotationsSymmetries(), input_dirs=["in"],
                output_dirs=[str(out)], pairing_method="one_input", seed=3,
                options={"num_rotations": 2, "rot_include_original": False,
                         "choose_random": 1,
                         "sym_include_original": False}))
            counters = pipe.run(progress=False)
            assert counters[0]["Success"] == 3
            names.append(sorted(p.name for p in out.iterdir()))
        # 2 rotations x 1 sampled sym x 3 inputs, same draws per seed
        assert len(names[0]) == 6
        assert names[0] == names[1]


class TestRotChainFusion:
    """rotations → deterministic-tail runs collapse into one fan-out
    RotationsChain step (the rotsym seed-tree argument with a FusedChain
    tail): byte-identical final files, intermediates elided."""

    def _mkimgs(self, d, n=3):
        d.mkdir(parents=True, exist_ok=True)
        for i in range(n):
            h, w = 38 + 5 * i, 46
            arr = np.full((h, w, 3), 200, np.uint8)
            arr[5:h - 8, 5:w - 8] = (180, 40, 60)
            arr[8:14, 8:14] = (60, 200, 60)  # masked green
            Image.fromarray(arr).save(d / f"x{i}.png")

    def _steps(self, rot_options=None, opts=None):
        from image_processor_pipeline_tpu.transforms import RandomRotations

        opts = opts or {}
        return [
            ProcessingStep(
                "rot", RandomRotations(), input_dirs=["in"],
                output_dirs=["r"], pairing_method="one_input", seed=7,
                options={"num_rotations": 2, **(rot_options or {}), **opts}),
            ProcessingStep(
                "mask", ColorMaskTransparency(), output_dirs=["m"],
                pairing_method="one_input",
                options={"color_ranges_to_exclude_hsv": HSV, **opts}),
            ProcessingStep(
                "clean", KeepLargestComponent(), output_dirs=["k"],
                pairing_method="one_input",
                options={"min_component_size": 10, **opts}),
            ProcessingStep(
                "fit", FitCrop(), output_dirs=["f"],
                pairing_method="one_input", options=opts),
        ]

    def _run(self, tmp_path, rot_options=None, opts=None):
        self._mkimgs(tmp_path / "in")
        res = {}
        for tag, fuse in (("plain", False), ("fused", True)):
            root = tmp_path / tag
            root.mkdir()
            (root / "in").symlink_to(tmp_path / "in")
            pipe = ProcessingPipeline(root_dir=root)
            for s in self._steps(rot_options, opts):
                pipe.add_step(s)
            counters = pipe.run(progress=False, auto_fuse=fuse)
            res[tag] = (counters, _read_dir(root / "f"),
                        (root / "r").exists() or (root / "m").exists()
                        or (root / "k").exists())
        return res

    @pytest.mark.parametrize("native", [True, False])
    def test_four_stage_byte_identical(self, tmp_path, native):
        res = self._run(tmp_path, opts={"native_compute": native})
        plain, fused = res["plain"], res["fused"]
        assert len(plain[0]) == 4 and len(fused[0]) == 1  # really fused
        assert fused[0][0]["Success"] == 3
        # (2 rotations + original) x 3 inputs survive the tail
        assert len(plain[1]) == 9
        assert plain[1] == fused[1]  # names AND bytes identical
        assert plain[2] and not fused[2]  # all 3 intermediate dirs elided

    def test_no_original_and_prefix(self, tmp_path):
        res = self._run(tmp_path, rot_options={
            "include_original": False, "num_rotations": 1,
            "output_prefix": "q"})
        assert len(res["fused"][0]) == 1
        assert len(res["plain"][1]) == 3  # 1 rotation x 3 inputs
        assert any(n.endswith("_q001.png") for n in res["plain"][1])
        assert res["plain"][1] == res["fused"][1]

    def test_jpeg_intermediate_blocks(self, tmp_path):
        """A lossy rotations intermediate would be re-quantized between
        standalone stages — but mask/cleanup also gate on suffix, so just
        pin that NOTHING fuses (cleanup errors on .jpg either way)."""
        from image_processor_pipeline_tpu.transforms import RandomRotations

        self._mkimgs(tmp_path / "in")
        pipe = ProcessingPipeline(root_dir=tmp_path)
        pipe.add_step(ProcessingStep(
            "rot", RandomRotations(), input_dirs=["in"], output_dirs=["r"],
            pairing_method="one_input", seed=7,
            options={"num_rotations": 1, "output_format": "jpeg"}))
        pipe.add_step(ProcessingStep(
            "mask", ColorMaskTransparency(), output_dirs=["m"],
            pairing_method="one_input",
            options={"color_ranges_to_exclude_hsv": HSV}))
        counters = pipe.run(progress=False, auto_fuse=True)
        assert len(counters) == 2  # NOT fused

    def test_composes_with_rotsym(self, tmp_path):
        """rot->mask->clean AND a separate rot->sym both fuse in one
        pipeline (two independent fan-out fusions)."""
        from image_processor_pipeline_tpu.transforms import (
            GenerateSymmetries,
            RandomRotations,
        )

        self._mkimgs(tmp_path / "in")
        results = {}
        for tag, fuse in (("plain", False), ("fused", True)):
            root = tmp_path / tag
            root.mkdir()
            (root / "in").symlink_to(tmp_path / "in")
            pipe = ProcessingPipeline(root_dir=root)
            for s in self._steps()[:3]:
                pipe.add_step(s)
            pipe.add_step(ProcessingStep(
                "rot2", RandomRotations(), input_dirs=["in"],
                output_dirs=["r2"], pairing_method="one_input", seed=9,
                options={"num_rotations": 1}))
            pipe.add_step(ProcessingStep(
                "sym", GenerateSymmetries(), output_dirs=["s"],
                pairing_method="one_input"))
            counters = pipe.run(progress=False, auto_fuse=fuse)
            results[tag] = (len(counters), _read_dir(root / "k"),
                            _read_dir(root / "s"))
        assert results["plain"][0] == 5 and results["fused"][0] == 2
        assert results["plain"][1] == results["fused"][1]
        assert results["plain"][2] == results["fused"][2]

    def test_metadata_head_rule(self, tmp_path):
        """VERDICT r4 #6: a head whose input dir is produced by an
        earlier step that provably writes only .png fuses WITHOUT the
        dir existing on disk.  rotations here has sample_k (not plain,
        so RotationsChain declines) but still qualifies as a png
        producer — cleanup+fit fuse into a FusedChain behind it."""
        from image_processor_pipeline_tpu.transforms import RandomRotations

        self._mkimgs(tmp_path / "in")
        results = {}
        for tag, fuse in (("plain", False), ("fused", True)):
            root = tmp_path / tag
            root.mkdir()
            (root / "in").symlink_to(tmp_path / "in")
            pipe = ProcessingPipeline(root_dir=root)
            pipe.add_step(ProcessingStep(
                "rot", RandomRotations(), input_dirs=["in"],
                output_dirs=["r"], pairing_method="one_input", seed=7,
                sample_k=2, options={"num_rotations": 1}))
            pipe.add_step(ProcessingStep(
                "clean", KeepLargestComponent(), output_dirs=["k"],
                pairing_method="one_input",
                options={"min_component_size": 10}))
            pipe.add_step(ProcessingStep(
                "fit", FitCrop(), output_dirs=["f"],
                pairing_method="one_input"))
            counters = pipe.run(progress=False, auto_fuse=fuse)
            results[tag] = (len(counters), _read_dir(root / "f"))
        assert results["plain"][0] == 3 and results["fused"][0] == 2
        assert results["plain"][1] == results["fused"][1]

    def test_metadata_head_rule_jpg_producer_blocks(self, tmp_path):
        """A producer that writes .jpg does NOT qualify the downstream
        head (fit crop would re-quantize between standalone stages)."""
        from image_processor_pipeline_tpu.transforms import RandomRotations

        self._mkimgs(tmp_path / "in")
        pipe = ProcessingPipeline(root_dir=tmp_path)
        pipe.add_step(ProcessingStep(
            "rot", RandomRotations(), input_dirs=["in"], output_dirs=["r"],
            pairing_method="one_input", seed=7, sample_k=2,
            options={"num_rotations": 1, "output_format": "jpeg",
                     "include_original": False}))
        pipe.add_step(ProcessingStep(
            "fit", FitCrop(), output_dirs=["f"],
            pairing_method="one_input"))
        pipe.add_step(ProcessingStep(
            "fit2", FitCrop(), output_dirs=["f2"],
            pairing_method="one_input"))
        counters = pipe.run(progress=False, auto_fuse=True)
        assert len(counters) == 3  # NOT fused


class TestRngTier:
    """auto_fuse='rng': RNG stages fuse too — equally-distributed, NOT
    byte-equal (documented opt-in).  Structural invariants still hold:
    identical file names, identical geometry (the rotations half stays
    byte-exact), 3-channel enhance banding, per-seed determinism."""

    def _mkimgs(self, d, n=6):
        d.mkdir(parents=True, exist_ok=True)
        for i in range(n):
            h, w = 40 + 3 * i, 52
            arr = np.full((h, w, 3), 190, np.uint8)
            arr[4:h - 6, 4:w - 6] = (170, 70, 80)
            arr[6:12, 6:12] = (60, 200, 60)
            Image.fromarray(arr).save(d / f"f{i}.jpg", quality=95)

    def _video_steps(self):
        from image_processor_pipeline_tpu.transforms import RandomRotations

        return [
            ProcessingStep(
                "rot", RandomRotations(), input_dirs=["in"],
                output_dirs=["r"], pairing_method="one_input", seed=5,
                options={"num_rotations": 1, "include_original": False}),
            ProcessingStep(
                "mask", ColorMaskTransparency(), output_dirs=["m"],
                pairing_method="one_input",
                options={"color_ranges_to_exclude_hsv": HSV}),
            ProcessingStep(
                "enh", EnhanceImage(), output_dirs=["e"],
                pairing_method="one_input", seed=7),
        ]

    def test_video_shaped_pipeline_fuses(self, tmp_path):
        """The migrated video config (rot->mask->enh) collapses to ONE
        step under the rng tier; the byte tier fuses only rot->mask."""
        self._mkimgs(tmp_path / "in")
        res = {}
        for tag, fuse in (("plain", False), ("rng", "rng"),
                          ("rng2", "rng"), ("byte", True)):
            root = tmp_path / tag
            root.mkdir()
            (root / "in").symlink_to(tmp_path / "in")
            pipe = ProcessingPipeline(root_dir=root)
            for s in self._video_steps():
                pipe.add_step(s)
            counters = pipe.run(progress=False, auto_fuse=fuse)
            res[tag] = (len(counters), _read_dir(root / "e"))
        assert res["plain"][0] == 3
        assert res["rng"][0] == 1
        assert res["byte"][0] == 2  # rot->mask fused byte-safely, enh out
        # names identical; geometry identical (rotations half byte-exact);
        # 3-channel banding like the standalone enhance
        assert set(res["plain"][1]) == set(res["rng"][1])
        for n in res["plain"][1]:
            a = np.asarray(Image.open(tmp_path / "plain" / "e" / n))
            b = np.asarray(Image.open(tmp_path / "rng" / "e" / n))
            assert a.shape == b.shape and a.shape[-1] == 3
        # per-seed determinism of the fused form
        assert res["rng"][1] == res["rng2"][1]
        # the byte tier's enh output must be byte-identical to plain
        # (identical input files, identical per-file seed tree)
        assert res["plain"][1] == res["byte"][1]

    def test_mask_enhance_chain(self, tmp_path):
        """ColorMask-headed chain with an Enhance tail fuses under rng
        (FusedChain with output_bands=3)."""
        self._mkimgs(tmp_path / "in")
        res = {}
        for tag, fuse in (("plain", False), ("rng", "rng")):
            root = tmp_path / tag
            root.mkdir()
            (root / "in").symlink_to(tmp_path / "in")
            pipe = ProcessingPipeline(root_dir=root)
            pipe.add_step(_mask_step())
            pipe.add_step(ProcessingStep(
                "enh", EnhanceImage(), output_dirs=["e"],
                pairing_method="one_input"))
            counters = pipe.run(progress=False, auto_fuse=fuse)
            res[tag] = (len(counters), _read_dir(root / "e"))
        assert res["plain"][0] == 2 and res["rng"][0] == 1
        assert set(res["plain"][1]) == set(res["rng"][1])
        for n in res["rng"][1]:
            arr = np.asarray(Image.open(tmp_path / "rng" / "e" / n))
            assert arr.shape[-1] == 3  # enhance banding replicated

    def test_enhance_terminates_run_midpipeline(self, tmp_path):
        """enh is final OF THE FUSED RUN, not of the pipeline: a
        downstream cleanup stays standalone and sees the same 3-channel
        files (which it rejects identically in both runs)."""
        self._mkimgs(tmp_path / "in", n=3)
        res = {}
        for tag, fuse in (("plain", False), ("rng", "rng")):
            root = tmp_path / tag
            root.mkdir()
            (root / "in").symlink_to(tmp_path / "in")
            pipe = ProcessingPipeline(root_dir=root)
            pipe.add_step(_mask_step())
            pipe.add_step(ProcessingStep(
                "enh", EnhanceImage(), output_dirs=["e"],
                pairing_method="one_input"))
            pipe.add_step(ProcessingStep(
                "clean", KeepLargestComponent(), output_dirs=["k"],
                pairing_method="one_input"))
            counters = pipe.run(progress=False, auto_fuse=fuse)
            res[tag] = (len(counters), dict(counters[-1]))
        assert res["plain"][0] == 3 and res["rng"][0] == 2
        # cleanup rejects the 3-channel enhance outputs in BOTH runs
        assert res["plain"][1] == res["rng"][1]
        assert res["rng"][1].get("Error") == 3

    def test_rotsym_subpool_fuses_under_rng(self, tmp_path):
        """choose_random < len(pool) blocks the byte tier but fuses
        under rng (per-(item, rotation) sampling, deterministic per
        seed, right cardinality)."""
        from image_processor_pipeline_tpu.transforms import (
            GenerateSymmetries,
            RandomRotations,
        )

        self._mkimgs(tmp_path / "in", n=3)
        counts = []
        names = []
        for run in range(2):
            root = tmp_path / f"r{run}"
            root.mkdir()
            (root / "in").symlink_to(tmp_path / "in")
            pipe = ProcessingPipeline(root_dir=root)
            pipe.add_step(ProcessingStep(
                "rot", RandomRotations(), input_dirs=["in"],
                output_dirs=["r"], pairing_method="one_input", seed=7,
                options={"num_rotations": 2, "include_original": False}))
            pipe.add_step(ProcessingStep(
                "sym", GenerateSymmetries(), output_dirs=["s"],
                pairing_method="one_input", seed=11,
                options={"pool": ("h", "v", "hv"), "choose_random": 1,
                         "include_original": False}))
            counters = pipe.run(progress=False, auto_fuse="rng")
            counts.append(len(counters))
            names.append(sorted(_read_dir(root / "s")))
        assert counts == [1, 1]
        # 3 inputs x 2 rotations x 1 sampled symmetry
        assert len(names[0]) == 6
        assert names[0] == names[1]  # deterministic per seed


class TestStaleIntermediateGuard:
    def test_earlier_writer_blocks_fusion(self, tmp_path):
        """A step scheduled BEFORE the fusable run that writes into the
        would-be-elided dir: the standalone second step inventories its
        files, so fusing would silently skip them."""
        from image_processor_pipeline_tpu.transforms import FitCrop

        _mkimgs(tmp_path / "in")
        (tmp_path / "other").mkdir()
        feeder_img = np.full((30, 30, 4), 255, np.uint8)
        feeder_img[..., :3] = (90, 90, 90)
        Image.fromarray(feeder_img).save(tmp_path / "other" / "feed.png")
        pipe = ProcessingPipeline(root_dir=tmp_path)
        pipe.add_step(ProcessingStep(
            "feeder", FitCrop(), input_dirs=["other"], output_dirs=["m"],
            pairing_method="one_input"))
        pipe.add_step(_mask_step())
        pipe.add_step(ProcessingStep(
            "clean", KeepLargestComponent(), output_dirs=["c"],
            pairing_method="one_input",
            options={"min_component_size": 20}))
        counters = pipe.run(progress=False, auto_fuse=True)
        assert len(counters) == 3
        # the feeder's file went through cleanup too
        assert (tmp_path / "c" / "feed.png").exists()


    def test_stale_chain_intermediate_blocks_fusion(self, tmp_path):
        """A pre-existing file in the would-be-elided dir would have been
        re-processed by the standalone second step: no fusion."""
        _mkimgs(tmp_path / "in")
        (tmp_path / "m").mkdir()
        stale = np.zeros((20, 20, 4), np.uint8)
        stale[5:15, 5:15] = 255
        Image.fromarray(stale).save(tmp_path / "m" / "stale.png")
        pipe = ProcessingPipeline(root_dir=tmp_path)
        pipe.add_step(_mask_step())
        pipe.add_step(ProcessingStep(
            "clean", KeepLargestComponent(), output_dirs=["c"],
            pairing_method="one_input",
            options={"min_component_size": 20}))
        counters = pipe.run(progress=False, auto_fuse=True)
        assert len(counters) == 2
        # the standalone run processed the stale file too
        assert (tmp_path / "c" / "stale.png").exists()

    def test_stale_rotsym_intermediate_blocks_fusion(self, tmp_path):
        from image_processor_pipeline_tpu.transforms import (
            GenerateSymmetries,
            RandomRotations,
        )

        _mkimgs(tmp_path / "in")
        (tmp_path / "r").mkdir()
        Image.fromarray(np.full((16, 16, 3), 90, np.uint8)).save(
            tmp_path / "r" / "stale.png")
        pipe = ProcessingPipeline(root_dir=tmp_path)
        pipe.add_step(ProcessingStep(
            "rot", RandomRotations(), input_dirs=["in"], output_dirs=["r"],
            pairing_method="one_input", seed=7,
            options={"num_rotations": 1}))
        pipe.add_step(ProcessingStep(
            "sym", GenerateSymmetries(), output_dirs=["s"],
            pairing_method="one_input"))
        counters = pipe.run(progress=False, auto_fuse=True)
        assert len(counters) == 2
        assert (tmp_path / "s" / "stale_o.png").exists()


class TestRgbaInputAlpha:
    @pytest.mark.parametrize("native", [True, False])
    def test_transparent_rgba_input_byte_identical(self, tmp_path, native):
        """The standalone mask step's cv2.imread re-decode DROPS input
        alpha (filtres_liste.py:84); the fused ColorMask stage must use
        input_alpha='replace' to match — an RGBA input with transparency
        over unmasked RGB diverged before the fix (different crop boxes
        after cleanup)."""
        d = tmp_path / "in"
        d.mkdir()
        arr = np.zeros((40, 40, 4), np.uint8)
        arr[..., :3] = (170, 60, 70)
        arr[..., 3] = 255
        arr[:10, :, 3] = 0  # transparent band, rgb NOT in the masked range
        arr[20:30, 20:30, :3] = (60, 200, 60)  # masked green
        Image.fromarray(arr).save(d / "a.png")
        res = {}
        for tag, fuse in (("plain", False), ("fused", True)):
            root = tmp_path / f"{tag}{int(native)}"
            root.mkdir()
            (root / "in").symlink_to(d)
            pipe = ProcessingPipeline(root_dir=root)
            opts = {"native_compute": native}
            pipe.add_step(_mask_step(options=opts))
            pipe.add_step(ProcessingStep(
                "clean", KeepLargestComponent(), output_dirs=["k"],
                pairing_method="one_input",
                options={"min_component_size": 5, **opts}))
            pipe.run(progress=False, auto_fuse=fuse)
            res[tag] = _read_dir(root / "k")
        assert res["plain"] == res["fused"]
        # the fused output keeps the full 40-row extent: the standalone
        # mask made the transparent band opaque again (alpha dropped)
        a = np.asarray(Image.open(
            tmp_path / f"fused{int(native)}" / "k" / "a.png"))
        assert a.shape[0] == 40


class TestElidedEqualsFinalGuard:
    def test_rotsym_same_output_dir_blocks_fusion(self, tmp_path):
        """sym writes INTO the rotations dir (r -> r): the unfused run
        leaves the rotation pngs there next to the symmetries, so eliding
        the intermediate would change the final file set."""
        from image_processor_pipeline_tpu.transforms import (
            GenerateSymmetries,
            RandomRotations,
        )

        _mkimgs(tmp_path / "in", n=2)
        pipe = ProcessingPipeline(root_dir=tmp_path)
        pipe.add_step(ProcessingStep(
            "rot", RandomRotations(), input_dirs=["in"], output_dirs=["r"],
            pairing_method="one_input", seed=7,
            options={"num_rotations": 1, "include_original": False}))
        pipe.add_step(ProcessingStep(
            "sym", GenerateSymmetries(), input_dirs=["r"],
            output_dirs=["r"], pairing_method="one_input"))
        counters = pipe.run(progress=False, auto_fuse=True)
        assert len(counters) == 2  # NOT fused
        # the rotation pngs are still present next to their symmetries
        names = {p.name for p in (tmp_path / "r").iterdir()}
        assert "x0_r001.png" in names and "x0_r001_h.png" in names

    def test_chain_same_output_dir_blocks_fusion(self, tmp_path):
        """mask in->m, clean m->m: the elided intermediate would BE the
        final dir (same-stem naming makes this benign today, but the
        guard keeps it structurally safe)."""
        _mkimgs(tmp_path / "in")
        pipe = ProcessingPipeline(root_dir=tmp_path)
        pipe.add_step(_mask_step())
        pipe.add_step(ProcessingStep(
            "clean", KeepLargestComponent(), input_dirs=["m"],
            output_dirs=["m"], pairing_method="one_input",
            options={"min_component_size": 20}))
        counters = pipe.run(progress=False, auto_fuse=True)
        assert len(counters) == 2  # NOT fused


class TestElidedDirUnreadable:
    def test_permission_error_declines(self, monkeypatch, tmp_path):
        """An unreadable elided dir may hold stale files we cannot rule
        out — decline fusion (only missing/not-a-dir count as clean)."""
        from image_processor_pipeline_tpu import fuse

        class Step:
            output_paths = [tmp_path / "blocked"]

        real_iterdir = fuse.Path.iterdir

        def deny(self):
            if self.name == "blocked":
                raise PermissionError(13, "denied", str(self))
            return real_iterdir(self)

        monkeypatch.setattr(fuse.Path, "iterdir", deny)
        assert fuse._elided_dirs_clean([Step()]) is False

        class Missing:
            output_paths = [tmp_path / "not_there"]

        assert fuse._elided_dirs_clean([Missing()]) is True


class TestRotSymOptionWarning:
    def test_include_original_warns(self, tmp_path):
        """Direct users passing the inherited 'include_original' name get
        a warning pointing at the renamed keys (it is otherwise ignored)."""
        from image_processor_pipeline_tpu.transforms import (
            RotationsSymmetries,
        )

        _mkimgs(tmp_path / "in", n=1)
        pipe = ProcessingPipeline(root_dir=tmp_path)
        pipe.add_step(ProcessingStep(
            "rs", RotationsSymmetries(), input_dirs=["in"],
            output_dirs=["o"], pairing_method="one_input", seed=3,
            options={"num_rotations": 1, "include_original": False}))
        with pytest.warns(UserWarning, match="rot_include_original"):
            counters = pipe.run(progress=False)
        assert counters[0]["Success"] == 1


class TestCLIAutoFuse:
    def test_run_auto_fuse_flag(self, tmp_path):
        """`run --auto-fuse` fuses the config's mask->cleanup pair: same
        final files, no intermediate dir."""
        import json

        from image_processor_pipeline_tpu.__main__ import main

        _mkimgs(tmp_path / "in")
        cfg = {
            "root_dir": str(tmp_path),
            "steps": [
                {"name": "mask", "transform": "color_mask",
                 "input_dirs": ["in"], "output_dirs": ["m"],
                 "pairing_method": "one_input", "seed": 3,
                 "options": {"color_ranges_to_exclude_hsv": HSV}},
                {"name": "clean", "transform": "cleanup",
                 "input_dirs": ["m"], "output_dirs": ["c"],
                 "pairing_method": "one_input",
                 "options": {"min_component_size": 20}},
            ],
        }
        cfg_path = tmp_path / "pipe.json"
        cfg_path.write_text(json.dumps(cfg))
        rc = main(["run", str(cfg_path), "--no-progress", "--strict",
                   "--auto-fuse"])
        assert rc == 0
        assert len(list((tmp_path / "c").iterdir())) == 3
        assert not (tmp_path / "m").exists()


class TestPngHeadedFusion:
    def _mkpng_masked(self, d, n=3):
        """RGBA pngs with alpha holes — valid cleanup/fitcrop inputs."""
        rng = np.random.default_rng(3)
        d.mkdir(parents=True, exist_ok=True)
        for i in range(n):
            arr = np.full((60, 80, 4), 255, np.uint8)
            arr[..., :3] = (170, 60, 90)
            arr[:8, :, 3] = 0
            for _ in range(4):
                y, x = int(rng.integers(8, 52)), int(rng.integers(0, 72))
                arr[y:y + 5, x:x + 5, 3] = 0
            Image.fromarray(arr).save(d / f"q{i}.png")

    def test_cleanup_fit_png_dir_fuses(self, tmp_path):
        """cleanup->fitcrop heading a run is byte-safe when the input
        dir provably holds only lossless pngs."""
        self._mkpng_masked(tmp_path / "in")
        results = {}
        for tag, fuse in (("plain", False), ("fused", True)):
            root = tmp_path / tag
            root.mkdir()
            (root / "in").symlink_to(tmp_path / "in")
            pipe = ProcessingPipeline(root_dir=root)
            pipe.add_step(ProcessingStep(
                "clean", KeepLargestComponent(), input_dirs=["in"],
                output_dirs=["c"], pairing_method="one_input",
                options={"min_component_size": 20}))
            pipe.add_step(ProcessingStep(
                "fit", FitCrop(), output_dirs=["f"],
                pairing_method="one_input"))
            counters = pipe.run(progress=False, auto_fuse=fuse)
            results[tag] = (counters, _read_dir(root / "f"))
        assert len(results["plain"][0]) == 2
        assert len(results["fused"][0]) == 1
        assert results["plain"][1] == results["fused"][1]

    def test_rgb_png_blocks_png_headed_fusion(self, tmp_path):
        """An RGB (no-alpha) png in the head dir must decline fusion:
        standalone cleanup ERRORS that item (no alpha channel) and
        writes nothing, while the fused chain's RGBA decode would
        synthesize opaque alpha and succeed — the fused run would write
        a file the unfused run does not (round-5 review repro)."""
        self._mkpng_masked(tmp_path / "in")
        arr = np.zeros((40, 40, 3), np.uint8)
        arr[10:30, 10:30] = (200, 50, 60)
        Image.fromarray(arr).save(tmp_path / "in" / "rgb.png")
        results = {}
        for tag, fuse in (("plain", False), ("fused", True)):
            root = tmp_path / tag
            root.mkdir()
            (root / "in").symlink_to(tmp_path / "in")
            pipe = ProcessingPipeline(root_dir=root)
            pipe.add_step(ProcessingStep(
                "clean", KeepLargestComponent(), input_dirs=["in"],
                output_dirs=["c"], pairing_method="one_input",
                options={"min_component_size": 20}))
            pipe.add_step(ProcessingStep(
                "fit", FitCrop(), output_dirs=["f"],
                pairing_method="one_input"))
            counters = pipe.run(progress=False, auto_fuse=fuse)
            results[tag] = (len(counters), _read_dir(root / "f"))
        assert results["fused"][0] == 2  # declined: identical step list
        assert results["plain"][1] == results["fused"][1]
        assert "rgb.png" not in results["plain"][1]

    def test_jpg_dir_blocks_png_headed_fusion(self, tmp_path):
        """A .jpg in the head's input dir means lossy intermediates (and
        cleanup's not-a-PNG error semantics): no fusion."""
        self._mkpng_masked(tmp_path / "in")
        arr = np.zeros((40, 40, 3), np.uint8)
        Image.fromarray(arr).save(tmp_path / "in" / "bad.jpg")
        pipe = ProcessingPipeline(root_dir=tmp_path)
        pipe.add_step(ProcessingStep(
            "clean", KeepLargestComponent(), input_dirs=["in"],
            output_dirs=["c"], pairing_method="one_input",
            options={"min_component_size": 20}))
        pipe.add_step(ProcessingStep(
            "fit", FitCrop(), output_dirs=["f"],
            pairing_method="one_input"))
        counters = pipe.run(progress=False, auto_fuse=True)
        assert len(counters) == 2  # declined

    def test_missing_dir_blocks_png_headed_fusion(self, tmp_path):
        """The head's input dir produced by an earlier step of the same
        run does not exist at fuse time: the png check declines."""
        _mkimgs(tmp_path / "in")
        pipe = ProcessingPipeline(root_dir=tmp_path)
        pipe.add_step(ProcessingStep(
            "enh", EnhanceImage(), input_dirs=["in"], output_dirs=["e"],
            pairing_method="one_input", seed=4))
        pipe.add_step(ProcessingStep(
            "fit", FitCrop(), output_dirs=["f"],
            pairing_method="one_input"))
        pipe.add_step(ProcessingStep(
            "fit2", FitCrop(), output_dirs=["f2"],
            pairing_method="one_input"))
        counters = pipe.run(progress=False, auto_fuse=True)
        assert len(counters) == 3


class TestOvlBorderFusion:
    """Overlays -> border crop (eval config 4): the explicit
    OverlaysBorderCrop composite and its rng-tier auto_fuse rewrite.
    Labels/geometry byte-identical to the unfused pair (same seed tree
    over the same pairing inventory); final IMAGES are the same composite
    without the intermediate .jpg q75 generation — close in pixels,
    never byte-equal (documented rng-tier semantics)."""

    MARGINS = (0.1, 0.1, 6, 6)

    def _mkdata(self, root, n=5):
        rng = np.random.default_rng(2)
        (root / "ovs").mkdir(parents=True)
        (root / "bgs").mkdir()
        for i in range(n):
            ov = np.zeros((40, 40, 4), np.uint8)
            ov[5:35, 5:35] = [*rng.integers(0, 256, 3), 255]
            Image.fromarray(ov).save(root / "ovs" / f"ov{i}.png")
            # smooth gradient + mild noise: photographic-like content so
            # the intermediate q75 generation's loss is small and the
            # "close but not byte-equal" assertion is meaningful (pure
            # noise loses ~10 mean-abs per q75 pass)
            h = 90 + 7 * i
            yy, xx = np.mgrid[0:h, 0:120]
            bg = np.stack([(yy * 255 // h), (xx * 255 // 120),
                           np.full((h, 120), 96)], axis=-1)
            bg = (bg + rng.integers(0, 6, bg.shape)).clip(0, 255)
            Image.fromarray(bg.astype(np.uint8)).save(
                root / "bgs" / f"bg{i}.jpg", quality=95)

    def _steps(self, margins=None):
        from image_processor_pipeline_tpu.transforms import (
            BorderCrop,
            PasteOverlayOntoBackground,
        )

        return [
            ProcessingStep(
                "ovl", PasteOverlayOntoBackground(),
                input_dirs=["ovs", "bgs"], output_dirs=["mid_i", "lbl"],
                pairing_method="modulo", seed=9),
            ProcessingStep(
                "bc", BorderCrop(), input_dirs=["mid_i"],
                output_dirs=["final"], pairing_method="one_input",
                fixed_input=True,
                options={"crop_margins": margins or self.MARGINS}),
        ]

    def _run(self, root, fuse):
        pipe = ProcessingPipeline(root_dir=root)
        for s in self._steps():
            pipe.add_step(s)
        return pipe.run(progress=False, auto_fuse=fuse)

    def test_rng_tier_fuses_pair(self, tmp_path):
        self._mkdata(tmp_path)
        for tag, fuse in (("plain", False), ("rng", "rng"),
                          ("byte", True)):
            root = tmp_path / tag
            root.mkdir()
            (root / "ovs").symlink_to(tmp_path / "ovs")
            (root / "bgs").symlink_to(tmp_path / "bgs")
            counters = self._run(root, fuse)
            if tag == "rng":
                assert len(counters) == 1  # fused
                assert not (root / "mid_i").exists()  # elided
            else:
                assert len(counters) == 2  # byte tier DECLINES (lossy mid)
        plain, rng_r = tmp_path / "plain", tmp_path / "rng"
        # labels byte-identical (the paste draws ride the copied seed)
        assert _read_dir(plain / "lbl") == _read_dir(rng_r / "lbl")
        # images: same names + dims, close pixels, NOT byte-equal
        pf = _read_dir(plain / "final")
        rf = _read_dir(rng_r / "final")
        assert set(pf) == set(rf) and len(pf) == 5
        diffs = []
        for name in pf:
            a = np.asarray(Image.open(plain / "final" / name), np.int16)
            b = np.asarray(Image.open(rng_r / "final" / name), np.int16)
            assert a.shape == b.shape
            diffs.append(np.abs(a - b).mean())
        # one fewer q75 JPEG generation: near-identical but not equal
        assert max(diffs) < 6.0, diffs
        assert pf != rf

    def test_direct_use_margin_error_leaves_label(self, tmp_path):
        """A margins-too-large item fails like the unfused run's final
        state: label written, image missing, item status Error."""
        from image_processor_pipeline_tpu.transforms import (
            OverlaysBorderCrop,
        )

        self._mkdata(tmp_path, n=2)
        step = ProcessingStep(
            "ob", OverlaysBorderCrop(),
            input_dirs=["ovs", "bgs"], output_dirs=["final", "lbl"],
            pairing_method="modulo", seed=9, root_dir=tmp_path,
            options={"crop_margins": (0.6, 0.6, 0, 0)})
        counters = step.run(progress=False)
        assert counters["Error"] == 2
        assert len(list((tmp_path / "lbl").iterdir())) == 2
        assert not any((tmp_path / "final").iterdir())

    def test_guards_decline(self, tmp_path):
        """Stale intermediate files and third-step touchers decline the
        rewrite even under the rng tier."""
        from image_processor_pipeline_tpu.transforms import copy_files

        self._mkdata(tmp_path, n=2)
        # stale file in the would-be-elided composite dir
        root = tmp_path / "stale"
        root.mkdir()
        (root / "ovs").symlink_to(tmp_path / "ovs")
        (root / "bgs").symlink_to(tmp_path / "bgs")
        (root / "mid_i").mkdir()
        (root / "mid_i" / "old.jpg").write_bytes(b"x")
        counters = self._run(root, "rng")
        assert len(counters) == 2  # declined
        # a third step reading the intermediate dir
        root2 = tmp_path / "touch"
        root2.mkdir()
        (root2 / "ovs").symlink_to(tmp_path / "ovs")
        (root2 / "bgs").symlink_to(tmp_path / "bgs")
        pipe = ProcessingPipeline(root_dir=root2)
        for s in self._steps():
            pipe.add_step(s)
        pipe.add_step(ProcessingStep(
            "cp", copy_files, input_dirs=["mid_i"], output_dirs=["cp"],
            pairing_method="one_input"))
        counters = pipe.run(progress=False, auto_fuse="rng")
        assert len(counters) == 3  # declined (mid_i has a reader)


class TestRngTierDistribution:
    """The rng tier's contract is DISTRIBUTIONAL equality, so verify it
    statistically (VERDICT r4 #2): the fused per-(item, stage) draw tree
    and the standalone per-file tree must produce the same output-law,
    checked with two-sample KS tests at alpha=1e-3 (loose enough to be
    stable in CI, tight enough to catch a band/alpha/range bug — the
    recorded RGBA-enhance hazard class shifts means by whole units)."""

    def test_enhance_draw_distributions_match(self):
        """Draw-level: the fused Enhance stage's factor draws (fold_in
        tree) vs EnhanceImage's per-item _draw_factors — same uniform
        laws for brightness/contrast/color/sigma/gains."""
        import jax
        import jax.numpy as jnp
        from scipy.stats import ks_2samp

        from image_processor_pipeline_tpu.transforms.enhance import (
            _draw_factors,
        )
        from image_processor_pipeline_tpu.transforms.fused import Enhance

        n = 4000
        seeds = jnp.arange(n, dtype=jnp.uint32)
        sb, sc, scol, ssig, sg = jax.vmap(_draw_factors)(seeds)

        st = Enhance()

        def fused_draw(seed):
            # the chain tail draws from fold_in(fold_in(key, salt), stage)
            k = jax.random.fold_in(
                jax.random.fold_in(jax.random.PRNGKey(seed), 101), 0)
            b, c, col, sigma, gains, _, _ = st.draw(k)
            return b, c, col, sigma, gains

        fb, fc, fcol, fsig, fg = jax.vmap(fused_draw)(seeds)
        for a, b, name in (
            (sb, fb, "brightness"), (sc, fc, "contrast"),
            (scol, fcol, "color"), (ssig, fsig, "sigma"),
            (sg.ravel(), fg.ravel(), "gains"),
        ):
            stat, p = ks_2samp(np.asarray(a), np.asarray(b))
            assert p > 1e-3, (name, stat, p)

    def test_video_shaped_output_statistics_match(self, tmp_path):
        """End-to-end: per-file mean pixel values of the fused
        rot->mask->enh run vs the standalone 3-step run over the same
        inputs come from the same law (the two runs use independent
        seed trees, so only the DISTRIBUTION can match)."""
        from scipy.stats import ks_2samp

        from image_processor_pipeline_tpu.transforms import (
            RandomRotations,
        )

        rng = np.random.default_rng(7)
        d = tmp_path / "in"
        d.mkdir()
        n = 48
        for i in range(n):
            arr = np.full((44, 60, 3), 185, np.uint8)
            arr[6:38, 6:52] = (165, 70, 85)
            arr += rng.integers(0, 6, arr.shape, dtype=np.uint8)
            Image.fromarray(arr).save(d / f"f{i}.jpg", quality=95)

        def steps():
            return [
                ProcessingStep(
                    "rot", RandomRotations(), input_dirs=["in"],
                    output_dirs=["r"], pairing_method="one_input",
                    seed=5, options={"num_rotations": 1,
                                     "include_original": False}),
                ProcessingStep(
                    "mask", ColorMaskTransparency(), output_dirs=["m"],
                    pairing_method="one_input",
                    options={"color_ranges_to_exclude_hsv": HSV}),
                ProcessingStep(
                    "enh", EnhanceImage(), output_dirs=["e"],
                    pairing_method="one_input", seed=9),
            ]

        means = {}
        for tag, fuse in (("plain", False), ("rng", "rng")):
            root = tmp_path / tag
            root.mkdir()
            (root / "in").symlink_to(d)
            pipe = ProcessingPipeline(root_dir=root)
            for s in steps():
                pipe.add_step(s)
            pipe.run(progress=False, auto_fuse=fuse)
            means[tag] = np.asarray([
                np.asarray(Image.open(p), np.float32).mean()
                for p in sorted((root / "e").iterdir())])
        assert len(means["plain"]) == len(means["rng"]) == n
        stat, p = ks_2samp(means["plain"], means["rng"])
        assert p > 1e-3, (stat, p)
        # and the geometry stays EXACT (the rotations half is byte-safe):
        # same output shapes per file
        for q, r in zip(sorted((tmp_path / "plain" / "e").iterdir()),
                        sorted((tmp_path / "rng" / "e").iterdir())):
            assert (np.asarray(Image.open(q)).shape
                    == np.asarray(Image.open(r)).shape), (q.name, r.name)


class TestRound5ReviewFindings:
    """Pins from the round-5 code-review pass."""

    def test_auto_fuse_typo_rejected(self, tmp_path):
        """run(auto_fuse='RNG'/'full') must raise, not silently run the
        byte tier."""
        _mkimgs(tmp_path / "in", n=1)
        pipe = ProcessingPipeline(root_dir=tmp_path)
        pipe.add_step(_mask_step())
        for bad in ("RNG", "full", "Rng"):
            with pytest.raises(ValueError, match="auto_fuse"):
                pipe.run(progress=False, auto_fuse=bad)
        # the explicit 'byte' spelling works
        counters = pipe.run(progress=False, auto_fuse="byte")
        assert counters[0]["Success"] == 1

    def test_cli_flag_before_config(self, tmp_path):
        """'run --auto-fuse cfg.json' (flag before the positional) must
        keep parsing — the optional-value form of --auto-fuse consumed
        the config path."""
        import json as _json

        from image_processor_pipeline_tpu.__main__ import main

        _mkimgs(tmp_path / "in", n=2)
        cfg = {
            "root_dir": str(tmp_path),
            "steps": [
                {"name": "mask", "transform": "color_mask",
                 "input_dirs": ["in"], "output_dirs": ["m"],
                 "pairing_method": "one_input", "seed": 3,
                 "options": {"color_ranges_to_exclude_hsv": HSV}},
            ],
        }
        cfg_path = tmp_path / "pipe.json"
        cfg_path.write_text(_json.dumps(cfg))
        rc = main(["run", "--auto-fuse", "--no-progress", str(cfg_path)])
        assert rc == 0
        assert len(list((tmp_path / "m").iterdir())) == 2

    def test_cli_fuse_tier_rng(self, tmp_path):
        """'--auto-fuse --fuse-tier rng' fuses an enhance tail."""
        import json as _json

        from image_processor_pipeline_tpu.__main__ import main

        _mkimgs(tmp_path / "in", n=2)
        cfg = {
            "root_dir": str(tmp_path),
            "steps": [
                {"name": "mask", "transform": "color_mask",
                 "input_dirs": ["in"], "output_dirs": ["m"],
                 "pairing_method": "one_input", "seed": 3,
                 "options": {"color_ranges_to_exclude_hsv": HSV}},
                {"name": "enh", "transform": "enhance",
                 "output_dirs": ["e"], "pairing_method": "one_input",
                 "seed": 4},
            ],
        }
        cfg_path = tmp_path / "pipe.json"
        cfg_path.write_text(_json.dumps(cfg))
        rc = main(["run", str(cfg_path), "--no-progress",
                   "--auto-fuse", "--fuse-tier", "rng"])
        assert rc == 0
        assert not (tmp_path / "m").exists()  # elided => really fused
        assert len(list((tmp_path / "e").iterdir())) == 2

    def test_ovlborder_shared_label_dir_blocks_fusion(self, tmp_path):
        """overlays with output_dirs=[d, d] (composites + labels share a
        dir): the composite dir is a KEPT final output, so the rng-tier
        rewrite must decline — fusing would delete the composites the
        unfused run leaves next to the labels."""
        from image_processor_pipeline_tpu.transforms import (
            BorderCrop,
            PasteOverlayOntoBackground,
        )

        rng = np.random.default_rng(2)
        (tmp_path / "ovs").mkdir()
        (tmp_path / "bgs").mkdir()
        for i in range(2):
            ov = np.zeros((30, 30, 4), np.uint8)
            ov[5:25, 5:25] = [*rng.integers(0, 256, 3), 255]
            Image.fromarray(ov).save(tmp_path / "ovs" / f"ov{i}.png")
            bg = rng.integers(0, 256, (80, 100, 3), dtype=np.uint8)
            Image.fromarray(bg).save(tmp_path / "bgs" / f"bg{i}.jpg",
                                     quality=95)
        pipe = ProcessingPipeline(root_dir=tmp_path)
        pipe.add_step(ProcessingStep(
            "ovl", PasteOverlayOntoBackground(),
            input_dirs=["ovs", "bgs"], output_dirs=["d", "d"],
            pairing_method="modulo", seed=9))
        pipe.add_step(ProcessingStep(
            "bc", BorderCrop(), input_dirs=["d"], output_dirs=["final"],
            pairing_method="one_input", fixed_input=True,
            options={"crop_margins": (2, 2, 2, 2)}))
        counters = pipe.run(progress=False, auto_fuse="rng")
        assert len(counters) == 2  # declined
        names = sorted(p.name for p in (tmp_path / "d").iterdir())
        assert any(n.endswith(".jpg") for n in names)  # composites kept


class TestRotChainEnhanceBackendEquality:
    """The rng tier changes WHICH tree draws are taken from, but the
    fused step's TAIL must still be backend-invariant: the per-(item,
    slot, stage) fold_in tree is evaluated through the same jit draw
    programs on both paths, so the ORIGINAL slot (no rotation) is
    byte-identical native-vs-jit.  Rotated slots inherit the documented
    rotations contract instead — the native twin is PIL-exact while the
    f32 jit program matches it >= 0.97 per pixel (CLAUDE.md r3), so
    those files are shape-equal and near-exact, not byte-equal."""

    def test_native_vs_jit_tail_invariance(self, tmp_path):
        from image_processor_pipeline_tpu.transforms import RotationsChain
        from image_processor_pipeline_tpu.transforms.fused import (
            ColorMask,
            Enhance,
        )

        rng = np.random.default_rng(4)
        d = tmp_path / "in"
        d.mkdir()
        for i in range(3):
            h, w = 40 + 6 * i, 54
            arr = np.full((h, w, 3), 185, np.uint8)
            arr[5:h - 7, 5:w - 7] = (160, 70, 90)
            arr[7:13, 7:13] = (60, 200, 60)
            arr += rng.integers(0, 6, arr.shape, dtype=np.uint8)
            Image.fromarray(arr).save(d / f"x{i}.png")

        res = {}
        for tag, native in (("native", True), ("jit", False)):
            root = tmp_path / tag
            root.mkdir()
            (root / "in").symlink_to(d)
            pipe = ProcessingPipeline(root_dir=root)
            pipe.add_step(ProcessingStep(
                "rc", RotationsChain([ColorMask(HSV), Enhance()]),
                input_dirs=["in"], output_dirs=["o"],
                pairing_method="one_input", seed=13,
                options={"num_rotations": 2, "output_bands": 3,
                         "native_compute": native}))
            c = pipe.run(progress=False)[0]
            assert c["Success"] == 3, c
            res[tag] = _read_dir(root / "o")
        assert len(res["native"]) == 9  # (original + 2 rotations) x 3
        assert set(res["native"]) == set(res["jit"])
        for n in res["native"]:
            a = np.asarray(Image.open(tmp_path / "native" / "o" / n))
            b = np.asarray(Image.open(tmp_path / "jit" / "o" / n))
            assert a.shape[-1] == 3
            if n.endswith("_r000.png"):
                # original slot: no rotation — tail draws + math must be
                # backend-exact, so the files are byte-identical
                assert res["native"][n] == res["jit"][n], n
            else:
                # rotated slots: the raw rotation contract is >= 0.97
                # per-pixel (PIL-exact twin vs f32 jit), but the tail
                # AMPLIFIES a single differing pixel — enhance's contrast
                # blend uses the image-wide mean, so one boundary pixel
                # can shift every pixel by +-1 — hence the looser 0.9
                # floor on the FINAL files
                assert a.shape == b.shape, n
                match = (a == b).all(axis=-1).mean()
                assert match >= 0.9, (n, match)


class TestFusionLattice:
    def test_rot_sym_mask_clean_composes(self, tmp_path):
        """rot->sym->mask->clean collapses to ONE (N+1)xS fan-out
        RotSymChain step (transforms/rotsymchain.py), final files
        byte-identical.  (Before RotSymChain landed this shape fused to
        two steps — RotationsSymmetries + FusedChain — still paying the
        (N+1)xS intermediate encodes between them.)"""
        from image_processor_pipeline_tpu.transforms import (
            GenerateSymmetries,
            RandomRotations,
        )

        _mkimgs(tmp_path / "in")
        res = {}
        for tag, fuse in (("plain", False), ("fused", True)):
            root = tmp_path / tag
            root.mkdir()
            (root / "in").symlink_to(tmp_path / "in")
            pipe = ProcessingPipeline(root_dir=root)
            pipe.add_step(ProcessingStep(
                "rot", RandomRotations(), input_dirs=["in"],
                output_dirs=["r"], pairing_method="one_input", seed=7,
                options={"num_rotations": 2}))
            pipe.add_step(ProcessingStep(
                "sym", GenerateSymmetries(), output_dirs=["s"],
                pairing_method="one_input"))
            pipe.add_step(ProcessingStep(
                "mask", ColorMaskTransparency(), output_dirs=["m"],
                pairing_method="one_input",
                options={"color_ranges_to_exclude_hsv": HSV}))
            pipe.add_step(ProcessingStep(
                "clean", KeepLargestComponent(), output_dirs=["k"],
                pairing_method="one_input",
                options={"min_component_size": 10}))
            c = pipe.run(progress=False, auto_fuse=fuse)
            res[tag] = (len(c), [s.name for s in pipe.last_run_steps],
                        _read_dir(root / "k"))
        assert res["plain"][0] == 4
        assert res["fused"][0] == 1
        assert res["fused"][1] == ["rot+sym+mask+clean"]
        assert res["plain"][2] == res["fused"][2]


class TestRotSymChainFusion:
    """rot->sym->deterministic-tail runs collapse into ONE (N+1)xS
    fan-out RotSymChain step — the rotsym and rotchain byte-safety
    arguments composed."""

    def _steps(self, sym_options=None, n_rot=2, rot_options=None):
        from image_processor_pipeline_tpu.transforms import (
            GenerateSymmetries,
            RandomRotations,
        )

        return [
            ProcessingStep(
                "rot", RandomRotations(), input_dirs=["in"],
                output_dirs=["r"], pairing_method="one_input", seed=7,
                options={"num_rotations": n_rot, **(rot_options or {})}),
            ProcessingStep(
                "sym", GenerateSymmetries(), output_dirs=["s"],
                pairing_method="one_input", options=sym_options or {}),
            ProcessingStep(
                "mask", ColorMaskTransparency(), output_dirs=["m"],
                pairing_method="one_input",
                options={"color_ranges_to_exclude_hsv": HSV}),
            ProcessingStep(
                "clean", KeepLargestComponent(), output_dirs=["k"],
                pairing_method="one_input",
                options={"min_component_size": 10}),
        ]

    def _run(self, tmp_path, native, **kw):
        _mkimgs(tmp_path / "in")
        res = {}
        for tag, fuse in (("plain", False), ("fused", True)):
            root = tmp_path / tag
            root.mkdir()
            (root / "in").symlink_to(tmp_path / "in")
            pipe = ProcessingPipeline(root_dir=root)
            for s in self._steps(**kw):
                s.options["native_compute"] = native
                pipe.add_step(s)
            counters = pipe.run(progress=False, auto_fuse=fuse)
            res[tag] = (counters, _read_dir(root / "k"),
                        [(root / d).exists() for d in ("r", "s", "m")])
        return res

    @pytest.mark.parametrize("native", [True, False])
    def test_byte_identical(self, tmp_path, native):
        res = self._run(tmp_path, native)
        plain, fused = res["plain"], res["fused"]
        assert len(plain[0]) == 4 and len(fused[0]) == 1
        assert fused[0][0]["Success"] == 3
        # (2 rotations + original) x 4 syms x 3 inputs
        assert len(plain[1]) == 36
        assert plain[1] == fused[1]
        assert fused[2] == [False, False, False]  # all elided

    def test_pool_and_no_original(self, tmp_path):
        """Sub-pool-free custom pool + rot_include_original=False: the
        deterministic selection appends 'o' per the sym step's
        include_original default."""
        res = self._run(
            tmp_path, native=True,
            sym_options={"pool": ("h", "v")},
            n_rot=1, rot_options={"include_original": False})
        plain, fused = res["plain"], res["fused"]
        assert len(fused[0]) == 1
        # 1 rotation x (h, v, +o appended) x 3 inputs
        assert len(plain[1]) == 9
        assert plain[1] == fused[1]
        assert any(n.endswith("_r001_o.png") for n in plain[1])

    def test_subpool_declines_to_partial_fusion(self, tmp_path):
        """choose_random < len(pool): the 4->1 pass and the rotsym pair
        decline (byte tier); mask+clean still fuse -> 3 steps."""
        res = self._run(tmp_path, native=True,
                        sym_options={"choose_random": 2})
        assert len(res["plain"][0]) == 4
        assert len(res["fused"][0]) == 3


class TestRotSymChainAliasGuard:
    def test_sym_into_rot_dir_declines(self, tmp_path):
        """sym writing NEXT TO the rotations (sym out == rot out): the
        standalone mask step's inventory then includes the bare rotation
        files too, so the 4->1 pass must decline (the pair pass also
        declines the same-dir shape; mask+clean still fuse)."""
        from image_processor_pipeline_tpu.transforms import (
            GenerateSymmetries,
            RandomRotations,
        )

        _mkimgs(tmp_path / "in")
        res = {}
        for tag, fuse in (("plain", False), ("fused", True)):
            root = tmp_path / tag
            root.mkdir()
            (root / "in").symlink_to(tmp_path / "in")
            pipe = ProcessingPipeline(root_dir=root)
            pipe.add_step(ProcessingStep(
                "rot", RandomRotations(), input_dirs=["in"],
                output_dirs=["r"], pairing_method="one_input", seed=7,
                options={"num_rotations": 1}))
            pipe.add_step(ProcessingStep(
                "sym", GenerateSymmetries(), input_dirs=["r"],
                output_dirs=["r"], pairing_method="one_input",
                fixed_input=False))
            pipe.add_step(ProcessingStep(
                "mask", ColorMaskTransparency(), input_dirs=["r"],
                output_dirs=["m"], pairing_method="one_input",
                fixed_input=True,
                options={"color_ranges_to_exclude_hsv": HSV}))
            pipe.add_step(ProcessingStep(
                "clean", KeepLargestComponent(), output_dirs=["k"],
                pairing_method="one_input",
                options={"min_component_size": 10}))
            counters = pipe.run(progress=False, auto_fuse=fuse)
            res[tag] = (len(counters), _read_dir(root / "k"))
        # the unfused mask sees rotations AND their symmetries in r —
        # a fused (N+1)xS fan-out would silently drop the bare-rotation
        # descendants; the rewrite must keep those steps standalone
        assert res["plain"][0] == 4
        assert res["fused"][0] >= 3  # at most mask+clean fused
        assert res["plain"][1] == res["fused"][1]


class TestChainSymFusion:
    """Deterministic chain runs ENDING in a symmetries step collapse
    into one ChainSymmetries step: the chain computes once and the save
    half encodes the selected dihedrals as zero-copy flip views —
    byte-identical final files, every intermediate (including the
    chain's own output) elided."""

    def _run(self, tmp_path, sym_options=None, opts=None, tier=True,
             include_clean=True):
        from image_processor_pipeline_tpu.transforms import (
            GenerateSymmetries,
        )

        opts = opts or {}
        _mkimgs(tmp_path / "in")
        res = {}
        for tag, fuse in (("plain", False), ("fused", tier)):
            root = tmp_path / tag
            root.mkdir()
            (root / "in").symlink_to(tmp_path / "in")
            pipe = ProcessingPipeline(root_dir=root)
            pipe.add_step(_mask_step(options=opts))
            if include_clean:
                pipe.add_step(ProcessingStep(
                    "clean", KeepLargestComponent(), output_dirs=["c"],
                    pairing_method="one_input",
                    options={"min_component_size": 20, **opts}))
            pipe.add_step(ProcessingStep(
                "sym", GenerateSymmetries(), output_dirs=["s"],
                pairing_method="one_input", seed=9,
                options={**(sym_options or {}), **opts}))
            counters = pipe.run(progress=False, auto_fuse=fuse)
            res[tag] = (counters, _read_dir(root / "s"),
                        (root / "m").exists() or (root / "c").exists())
        return res

    @pytest.mark.parametrize("native", [True, False])
    def test_three_stage_byte_identical(self, tmp_path, native):
        res = self._run(tmp_path, opts={"native_compute": native})
        plain, fused = res["plain"], res["fused"]
        assert len(plain[0]) == 3 and len(fused[0]) == 1  # really fused
        assert fused[0][0]["Success"] == 3
        assert len(plain[1]) == 12  # 3 inputs x (o,h,v,hv)
        assert plain[1] == fused[1]  # names AND bytes identical
        assert plain[2] and not fused[2]  # both intermediate dirs elided

    def test_mask_sym_pair_fuses(self, tmp_path):
        """Even a single-stage chain + symmetries fuses (2 steps -> 1);
        pool subsets and include_original=False ride through."""
        res = self._run(
            tmp_path, include_clean=False,
            sym_options={"pool": ("h", "hv"), "include_original": False})
        plain, fused = res["plain"], res["fused"]
        assert len(plain[0]) == 2 and len(fused[0]) == 1
        assert len(plain[1]) == 6  # 3 inputs x (h, hv)
        assert plain[1] == fused[1]

    def test_subpool_falls_back_to_chain_fusion(self, tmp_path):
        """choose_random < len(pool) blocks the sym tail in the byte
        tier, but the deterministic chain prefix still fuses — and the
        standalone sym step then reads the fused chain's identical
        files, so final bytes still match."""
        res = self._run(tmp_path, sym_options={"choose_random": 1})
        plain, fused = res["plain"], res["fused"]
        assert len(plain[0]) == 3 and len(fused[0]) == 2
        assert plain[1] == fused[1]  # same draws over the same inventory
        assert res["fused"][2]  # the chain's output dir must exist

    def test_sym_output_alias_falls_back(self, tmp_path):
        """A symmetries step writing INTO the chain's output dir cannot
        be fused (the unfused run keeps the chain outputs next to the
        flips); the chain prefix still fuses alone."""
        from image_processor_pipeline_tpu.transforms import (
            GenerateSymmetries,
        )

        _mkimgs(tmp_path / "in")
        res = {}
        for tag, fuse in (("plain", False), ("fused", True)):
            root = tmp_path / tag
            root.mkdir()
            (root / "in").symlink_to(tmp_path / "in")
            pipe = ProcessingPipeline(root_dir=root)
            pipe.add_step(_mask_step())
            pipe.add_step(ProcessingStep(
                "clean", KeepLargestComponent(), output_dirs=["c"],
                pairing_method="one_input",
                options={"min_component_size": 20}))
            pipe.add_step(ProcessingStep(
                "sym", GenerateSymmetries(), output_dirs=["c"],
                pairing_method="one_input"))
            counters = pipe.run(progress=False, auto_fuse=fuse)
            res[tag] = (len(counters), _read_dir(root / "c"))
        assert res["plain"][0] == 3 and res["fused"][0] == 2
        # c holds the chain outputs AND their symmetries in both runs
        assert res["plain"][1] == res["fused"][1]

    def test_subpool_fuses_under_rng(self, tmp_path):
        """choose_random < len(pool) fuses under the rng tier:
        per-item sampling, deterministic per seed, right cardinality."""
        results = []
        for rep in range(2):
            res = self._run(tmp_path / f"r{rep}", tier="rng",
                            sym_options={"choose_random": 1})
            assert len(res["fused"][0]) == 1
            # 1 sampled sym (+ 'o' unless sampled) per input
            names = sorted(res["fused"][1])
            per_item = len(names) / 3
            assert 1 <= per_item <= 2
            results.append(names)
        assert results[0] == results[1]  # per-seed determinism

    def test_enhance_then_sym_fuses_under_rng(self, tmp_path):
        """mask -> enhance -> sym collapses to ONE step under the rng
        tier: the Enhance tail's 3-channel banding commutes with the
        band-agnostic flips."""
        from image_processor_pipeline_tpu.transforms import (
            GenerateSymmetries,
        )

        _mkimgs(tmp_path / "in")
        pipe = ProcessingPipeline(root_dir=tmp_path)
        pipe.add_step(_mask_step())
        pipe.add_step(ProcessingStep(
            "enh", EnhanceImage(), output_dirs=["e"],
            pairing_method="one_input"))
        pipe.add_step(ProcessingStep(
            "sym", GenerateSymmetries(), output_dirs=["s"],
            pairing_method="one_input"))
        counters = pipe.run(progress=False, auto_fuse="rng")
        assert len(counters) == 1 and counters[0]["Success"] == 3
        files = sorted((tmp_path / "s").iterdir())
        assert len(files) == 12  # 3 inputs x (o,h,v,hv)
        for p in files:
            arr = np.asarray(Image.open(p))
            assert arr.shape[-1] == 3  # enhance banding replicated
        assert not (tmp_path / "m").exists()
        assert not (tmp_path / "e").exists()


class TestSymChainFusion:
    """Symmetry-HEADED deterministic runs collapse into one draw-free
    SymmetriesChain step: decode once, fan out the dihedrals on device,
    run the tail per variant — byte-identical, intermediates elided."""

    def _mkrgba(self, d, n=3):
        rng = np.random.default_rng(5)
        d.mkdir(parents=True, exist_ok=True)
        for i in range(n):
            h, w = 46 + 4 * i, 58
            arr = np.full((h, w, 4), 255, np.uint8)
            arr[..., :3] = (170, 60, 90)
            arr[:6, :, 3] = 0
            for _ in range(3):
                y, x = int(rng.integers(6, h - 6)), int(rng.integers(0, w - 6))
                arr[y:y + 5, x:x + 5, :3] = (60, 200, 60)  # masked green
            Image.fromarray(arr).save(d / f"p{i}.png")

    def _steps(self, sym_options=None, opts=None):
        from image_processor_pipeline_tpu.transforms import (
            GenerateSymmetries,
        )

        opts = opts or {}
        return [
            ProcessingStep(
                "sym", GenerateSymmetries(), input_dirs=["in"],
                output_dirs=["s"], pairing_method="one_input", seed=9,
                options={**(sym_options or {}), **opts}),
            ProcessingStep(
                "mask", ColorMaskTransparency(), output_dirs=["m"],
                pairing_method="one_input",
                options={"color_ranges_to_exclude_hsv": HSV, **opts}),
            ProcessingStep(
                "clean", KeepLargestComponent(), output_dirs=["k"],
                pairing_method="one_input",
                options={"min_component_size": 20, **opts}),
        ]

    def _run(self, tmp_path, sym_options=None, opts=None, mkimgs=None):
        (mkimgs or self._mkrgba)(tmp_path / "in")
        res = {}
        for tag, fuse in (("plain", False), ("fused", True)):
            root = tmp_path / tag
            root.mkdir()
            (root / "in").symlink_to(tmp_path / "in")
            pipe = ProcessingPipeline(root_dir=root)
            for s in self._steps(sym_options, opts):
                pipe.add_step(s)
            counters = pipe.run(progress=False, auto_fuse=fuse)
            res[tag] = (counters, _read_dir(root / "k"),
                        (root / "s").exists() or (root / "m").exists())
        return res

    @pytest.mark.parametrize("native", [True, False])
    def test_three_stage_byte_identical(self, tmp_path, native):
        res = self._run(tmp_path, opts={"native_compute": native})
        plain, fused = res["plain"], res["fused"]
        assert len(plain[0]) == 3 and len(fused[0]) == 1  # really fused
        assert fused[0][0]["Success"] == 3
        assert len(plain[1]) == 12  # 3 inputs x (o,h,v,hv)
        assert plain[1] == fused[1]  # names AND bytes identical
        assert plain[2] and not fused[2]  # both intermediate dirs elided

    def test_pool_subset(self, tmp_path):
        res = self._run(tmp_path, sym_options={
            "pool": ("v",), "include_original": False})
        assert len(res["fused"][0]) == 1
        assert len(res["plain"][1]) == 3  # 3 inputs x (v,)
        assert res["plain"][1] == res["fused"][1]

    def test_rgb_input_declines_head(self, tmp_path):
        """RGB pngs at the head decline the sym fan-out (the standalone
        tail would see 3-band intermediates); the mask->clean suffix
        still fuses on its own."""
        def mk(d):
            d.mkdir(parents=True, exist_ok=True)
            for i in range(2):
                arr = np.full((40, 50, 3), 190, np.uint8)
                arr[6:34, 6:44] = (170, 60, 90)
                arr[8:13, 8:13] = (60, 200, 60)
                Image.fromarray(arr).save(d / f"r{i}.png")

        res = self._run(tmp_path, mkimgs=mk)
        assert len(res["plain"][0]) == 3 and len(res["fused"][0]) == 2
        assert res["plain"][1] == res["fused"][1]

    def test_jpg_input_declines(self, tmp_path):
        def mk(d):
            d.mkdir(parents=True, exist_ok=True)
            arr = np.full((40, 50, 3), 190, np.uint8)
            arr[6:34, 6:44] = (170, 60, 90)
            Image.fromarray(arr).save(d / "j.jpg", quality=95)

        mk(tmp_path / "in")
        pipe = ProcessingPipeline(root_dir=tmp_path)
        for s in self._steps():
            pipe.add_step(s)
        counters = pipe.run(progress=False, auto_fuse=True)
        # sym stays standalone; its .jpg outputs then error in mask?
        # no — mask accepts jpg; the suffix mask->clean may fuse
        assert len(counters) >= 2
        assert (tmp_path / "s").exists()

    def test_subpool_declines_fanout(self, tmp_path):
        """choose_random < len(pool): the per-file standalone tree can't
        be replicated — sym stays standalone, suffix fuses."""
        res = self._run(tmp_path, sym_options={"choose_random": 2})
        assert len(res["fused"][0]) == 2
        assert res["plain"][1] == res["fused"][1]

    def test_rot_sym_tail_still_wins(self, tmp_path):
        """rot->sym->mask->clean keeps the 4-step RotSymChain shape (the
        sym-headed pass must not steal the sym step from it)."""
        from image_processor_pipeline_tpu.transforms import (
            GenerateSymmetries,
            RandomRotations,
        )
        from image_processor_pipeline_tpu.transforms.rotsymchain import (
            RotSymChain,
        )

        self._mkrgba(tmp_path / "in")
        pipe = ProcessingPipeline(root_dir=tmp_path)
        pipe.add_step(ProcessingStep(
            "rot", RandomRotations(), input_dirs=["in"], output_dirs=["r"],
            pairing_method="one_input", seed=7,
            options={"num_rotations": 1}))
        pipe.add_step(ProcessingStep(
            "sym", GenerateSymmetries(), output_dirs=["s"],
            pairing_method="one_input"))
        pipe.add_step(ProcessingStep(
            "mask", ColorMaskTransparency(), output_dirs=["m"],
            pairing_method="one_input",
            options={"color_ranges_to_exclude_hsv": HSV}))
        counters = pipe.run(progress=False, auto_fuse=True)
        assert len(counters) == 1
        assert isinstance(
            pipe.last_run_steps[0].process_function, RotSymChain)


class TestRotChainSymFusion:
    """rotations -> deterministic tail -> symmetries collapses into one
    (N+1)xS RotationsChainSymmetries step: flips of each slot's tail
    result — the dihedral fan-out composing at the END of the chain."""

    def _mkimgs(self, d, n=3):
        d.mkdir(parents=True, exist_ok=True)
        for i in range(n):
            h, w = 38 + 5 * i, 46
            arr = np.full((h, w, 3), 200, np.uint8)
            arr[5:h - 8, 5:w - 8] = (180, 40, 60)
            arr[8:14, 8:14] = (60, 200, 60)
            Image.fromarray(arr).save(d / f"x{i}.png")

    def _steps(self, sym_options=None, opts=None, sym_out="s"):
        from image_processor_pipeline_tpu.transforms import (
            GenerateSymmetries,
            KeepLargestComponent,
            RandomRotations,
        )

        opts = opts or {}
        return [
            ProcessingStep(
                "rot", RandomRotations(), input_dirs=["in"],
                output_dirs=["r"], pairing_method="one_input", seed=7,
                options={"num_rotations": 2, **opts}),
            ProcessingStep(
                "mask", ColorMaskTransparency(), output_dirs=["m"],
                pairing_method="one_input",
                options={"color_ranges_to_exclude_hsv": HSV, **opts}),
            ProcessingStep(
                "clean", KeepLargestComponent(), output_dirs=["k"],
                pairing_method="one_input",
                options={"min_component_size": 10, **opts}),
            ProcessingStep(
                "sym", GenerateSymmetries(), output_dirs=[sym_out],
                pairing_method="one_input", seed=11,
                options={**(sym_options or {}), **opts}),
        ]

    def _run(self, tmp_path, sym_options=None, opts=None):
        self._mkimgs(tmp_path / "in")
        res = {}
        for tag, fuse in (("plain", False), ("fused", True)):
            root = tmp_path / tag
            root.mkdir()
            (root / "in").symlink_to(tmp_path / "in")
            pipe = ProcessingPipeline(root_dir=root)
            for s in self._steps(sym_options, opts):
                pipe.add_step(s)
            counters = pipe.run(progress=False, auto_fuse=fuse)
            res[tag] = (counters, _read_dir(root / "s"),
                        any((root / d).exists() for d in ("r", "m", "k")))
        return res

    @pytest.mark.parametrize("native", [True, False])
    def test_four_stage_byte_identical(self, tmp_path, native):
        res = self._run(tmp_path, opts={"native_compute": native})
        plain, fused = res["plain"], res["fused"]
        assert len(plain[0]) == 4 and len(fused[0]) == 1  # really fused
        assert fused[0][0]["Success"] == 3
        # (2 rotations + original) x 3 inputs x (o,h,v,hv)
        assert len(plain[1]) == 36
        assert plain[1] == fused[1]  # names AND bytes identical
        assert plain[2] and not fused[2]  # all 3 intermediate dirs elided

    def test_pool_subset(self, tmp_path):
        res = self._run(tmp_path, sym_options={
            "pool": ("hv",), "include_original": False})
        assert len(res["fused"][0]) == 1
        assert len(res["plain"][1]) == 9  # 3 slots x 3 inputs x (hv,)
        assert res["plain"][1] == res["fused"][1]

    def test_subpool_falls_back_to_rotchain(self, tmp_path):
        """choose_random < len(pool) declines the sym extension; the
        rot->mask->clean prefix still fuses to a RotationsChain and the
        standalone sym reads its identical files."""
        from image_processor_pipeline_tpu.transforms.rotchain import (
            RotationsChain,
        )

        res = self._run(tmp_path, sym_options={"choose_random": 2})
        plain, fused = res["plain"], res["fused"]
        assert len(plain[0]) == 4 and len(fused[0]) == 2
        assert plain[1] == fused[1]

    def test_sym_output_alias_falls_back(self, tmp_path):
        """sym writing into an elided chain dir declines the extension;
        the bare chain still fuses."""
        self._mkimgs(tmp_path / "in")
        res = {}
        for tag, fuse in (("plain", False), ("fused", True)):
            root = tmp_path / tag
            root.mkdir()
            (root / "in").symlink_to(tmp_path / "in")
            pipe = ProcessingPipeline(root_dir=root)
            for s in self._steps(sym_out="k"):  # sym out == clean out
                pipe.add_step(s)
            counters = pipe.run(progress=False, auto_fuse=fuse)
            res[tag] = (len(counters), _read_dir(root / "k"))
        assert res["plain"][0] == 4 and res["fused"][0] == 2
        # k holds the chain outputs AND their symmetries in both runs
        assert res["plain"][1] == res["fused"][1]

    def test_rng_tier_enhance_then_sym(self, tmp_path):
        """rot -> mask -> enhance -> sym under the rng tier: ONE step,
        3-channel flips, per-seed deterministic names."""
        from image_processor_pipeline_tpu.transforms import (
            EnhanceImage,
            GenerateSymmetries,
            RandomRotations,
        )

        self._mkimgs(tmp_path / "in")
        pipe = ProcessingPipeline(root_dir=tmp_path)
        pipe.add_step(ProcessingStep(
            "rot", RandomRotations(), input_dirs=["in"], output_dirs=["r"],
            pairing_method="one_input", seed=7,
            options={"num_rotations": 1, "include_original": False}))
        pipe.add_step(ProcessingStep(
            "mask", ColorMaskTransparency(), output_dirs=["m"],
            pairing_method="one_input",
            options={"color_ranges_to_exclude_hsv": HSV}))
        pipe.add_step(ProcessingStep(
            "enh", EnhanceImage(), output_dirs=["e"],
            pairing_method="one_input"))
        pipe.add_step(ProcessingStep(
            "sym", GenerateSymmetries(), output_dirs=["s"],
            pairing_method="one_input"))
        counters = pipe.run(progress=False, auto_fuse="rng")
        assert len(counters) == 1 and counters[0]["Success"] == 3
        files = sorted((tmp_path / "s").iterdir())
        assert len(files) == 12  # 1 rotation x 3 inputs x 4 syms
        for p in files[:2]:
            assert np.asarray(Image.open(p)).shape[-1] == 3


class TestSecondReviewFindings:
    """Round-5 second-session review pass regressions."""

    def test_banded_producer_blocks_metadata_head(self, tmp_path):
        """A 3-channel png producer (FusedChain with output_bands=3)
        must NOT qualify a cleanup/fitcrop head via step metadata: the
        standalone cleanup errors on no-alpha pngs while the fused
        chain's RGBA decode would succeed — the same divergence class
        _rgba_png declines for on-disk inputs (review repro).  The
        4-band control still fuses."""
        from image_processor_pipeline_tpu.fuse import fuse_steps
        from image_processor_pipeline_tpu.transforms.fused import (
            ColorMask,
            FusedChain,
        )

        def steps(bands):
            opts = {"output_suffix": ".png"}
            if bands:
                opts["output_bands"] = bands
            return [
                ProcessingStep(
                    "mk", FusedChain([ColorMask(HSV)]),
                    input_dirs=[str(tmp_path / "in")],
                    output_dirs=[str(tmp_path / "mid")],
                    pairing_method="one_input", options=opts),
                ProcessingStep(
                    "clean", KeepLargestComponent(),
                    input_dirs=[str(tmp_path / "mid")],
                    output_dirs=[str(tmp_path / "c")],
                    pairing_method="one_input",
                    options={"min_component_size": 20}),
                ProcessingStep(
                    "fit", FitCrop(), input_dirs=[str(tmp_path / "c")],
                    output_dirs=[str(tmp_path / "f")],
                    pairing_method="one_input"),
            ]

        banded = fuse_steps(steps(3), verbose=False)
        assert [s.name for s in banded] == ["mk", "clean", "fit"]
        control = fuse_steps(steps(None), verbose=False)
        assert [s.name for s in control] == ["mk", "clean+fit"]

    def test_chainsym_direct_jpg_device_encode_ignored(self, tmp_path):
        """Direct ChainSymmetries use with output_suffix='.jpg' +
        device_encode must not trigger the JPEG coefficient transport
        (whose output protocol the fan-out save can't read) — outputs
        stay .png like the fused semantics fix."""
        from image_processor_pipeline_tpu.transforms import (
            ChainSymmetries,
        )
        from image_processor_pipeline_tpu.transforms.fused import (
            ColorMask,
        )

        _mkimgs(tmp_path / "in")
        pipe = ProcessingPipeline(root_dir=tmp_path)
        pipe.add_step(ProcessingStep(
            "cs", ChainSymmetries([ColorMask(HSV)]), input_dirs=["in"],
            output_dirs=["s"], pairing_method="one_input", seed=3,
            options={"output_suffix": ".jpg", "device_encode": True,
                     "native_compute": False}))
        counters = pipe.run(progress=False)
        assert counters[0]["Success"] == 3
        files = sorted(p.name for p in (tmp_path / "s").iterdir())
        assert len(files) == 12 and all(f.endswith(".png") for f in files)


class TestNewFanoutMesh:
    """The new fan-out fused transforms under in-process data
    parallelism (mesh=4, jit path): byte-identical files vs
    single-device — pins the mesh-quantum padding x multi-slot save
    interaction for each new shape."""

    def _mkimgs(self, d, n=5):
        rng = np.random.default_rng(2)
        d.mkdir(parents=True, exist_ok=True)
        for i in range(n):
            h, w = 40 + 6 * i, 54
            arr = np.full((h, w, 4), 255, np.uint8)
            arr[..., :3] = (170, 60, 90)
            arr[:5, :, 3] = 0
            y, x = int(rng.integers(6, h - 6)), int(rng.integers(0, w - 6))
            arr[y:y + 5, x:x + 5, :3] = (60, 200, 60)
            Image.fromarray(arr).save(d / f"p{i}.png")

    @pytest.mark.parametrize(
        "shape", ["chainsym", "symchain", "rotchainsym", "symchainsym"])
    def test_mesh_byte_identical(self, tmp_path, shape):
        from image_processor_pipeline_tpu.transforms import (
            ChainSymmetries,
            RotationsChainSymmetries,
            SymmetriesChain,
            SymmetriesChainSymmetries,
        )
        from image_processor_pipeline_tpu.transforms.fused import (
            Cleanup,
            ColorMask,
        )

        stages = [ColorMask(HSV, input_alpha="replace"),
                  Cleanup(min_component_size=20)]
        transform = {
            "chainsym": lambda: ChainSymmetries(stages),
            "symchain": lambda: SymmetriesChain(stages, ("o", "h", "v")),
            "rotchainsym": lambda: RotationsChainSymmetries(
                stages, ("o", "hv")),
            "symchainsym": lambda: SymmetriesChainSymmetries(
                stages, ("o", "h"), ("o", "v")),
        }[shape]()
        opts = {"native_compute": False}
        if shape == "rotchainsym":
            opts["num_rotations"] = 2
        self._mkimgs(tmp_path / "in")
        results = {}
        for tag, mesh in (("one", None), ("mesh", 4)):
            root = tmp_path / tag
            root.mkdir()
            (root / "in").symlink_to(tmp_path / "in")
            pipe = ProcessingPipeline(root_dir=root)
            pipe.add_step(ProcessingStep(
                "f", transform, input_dirs=["in"], output_dirs=["s"],
                pairing_method="one_input", seed=5, mesh=mesh,
                options=opts))
            counters = pipe.run(progress=False)
            assert counters[0]["Success"] == 5
            results[tag] = _read_dir(root / "s")
        assert results["one"] == results["mesh"]
        assert len(results["one"]) >= 10


class TestSymChainSymFusion:
    """sym -> deterministic tail -> sym collapses into ONE
    SymmetriesChainSymmetries step (the dihedral fan-out at BOTH ends of
    the run): byte-identical, all three intermediate dirs elided."""

    def _mkrgba(self, d, n=3):
        rng = np.random.default_rng(5)
        d.mkdir(parents=True, exist_ok=True)
        for i in range(n):
            h, w = 46 + 4 * i, 58
            arr = np.full((h, w, 4), 255, np.uint8)
            arr[..., :3] = (170, 60, 90)
            arr[:6, :, 3] = 0
            for _ in range(3):
                y, x = int(rng.integers(6, h - 6)), int(rng.integers(0, w - 6))
                arr[y:y + 5, x:x + 5, :3] = (60, 200, 60)  # masked green
            Image.fromarray(arr).save(d / f"p{i}.png")

    def _steps(self, head_options=None, tail_options=None, opts=None,
               tail_out="s2"):
        from image_processor_pipeline_tpu.transforms import (
            GenerateSymmetries,
        )

        opts = opts or {}
        return [
            ProcessingStep(
                "sym", GenerateSymmetries(), input_dirs=["in"],
                output_dirs=["s"], pairing_method="one_input", seed=9,
                options={**(head_options or {}), **opts}),
            ProcessingStep(
                "mask", ColorMaskTransparency(), output_dirs=["m"],
                pairing_method="one_input",
                options={"color_ranges_to_exclude_hsv": HSV, **opts}),
            ProcessingStep(
                "clean", KeepLargestComponent(), output_dirs=["k"],
                pairing_method="one_input",
                options={"min_component_size": 20, **opts}),
            ProcessingStep(
                "sym2", GenerateSymmetries(), output_dirs=[tail_out],
                pairing_method="one_input", seed=13,
                options={**(tail_options or {}), **opts}),
        ]

    def _run(self, tmp_path, head_options=None, tail_options=None,
             opts=None, tail_out="s2"):
        self._mkrgba(tmp_path / "in")
        res = {}
        for tag, fuse in (("plain", False), ("fused", True)):
            root = tmp_path / tag
            root.mkdir()
            (root / "in").symlink_to(tmp_path / "in")
            pipe = ProcessingPipeline(root_dir=root)
            for s in self._steps(head_options, tail_options, opts, tail_out):
                pipe.add_step(s)
            counters = pipe.run(progress=False, auto_fuse=fuse)
            res[tag] = (counters, _read_dir(root / tail_out),
                        any((root / d).exists() for d in ("s", "m", "k")))
        return res

    @pytest.mark.parametrize("native", [True, False])
    def test_four_stage_byte_identical(self, tmp_path, native):
        res = self._run(tmp_path, opts={"native_compute": native})
        plain, fused = res["plain"], res["fused"]
        assert len(plain[0]) == 4 and len(fused[0]) == 1  # really fused
        assert fused[0][0]["Success"] == 3
        # 3 inputs x 4 head syms x 4 tail syms
        assert len(plain[1]) == 48
        assert plain[1] == fused[1]  # names AND bytes identical
        assert plain[2] and not fused[2]  # all 3 intermediate dirs elided

    def test_tail_pool_subset(self, tmp_path):
        res = self._run(tmp_path, tail_options={
            "pool": ("v",), "include_original": False})
        assert len(res["fused"][0]) == 1
        assert len(res["plain"][1]) == 12  # 3 inputs x 4 head x (v,)
        assert res["plain"][1] == res["fused"][1]

    def test_tail_alias_falls_back(self, tmp_path):
        """the tail sym writing into the chain's own output dir declines
        the both-ends shape (the standalone run leaves the chain outputs
        next to their symmetries there); the head-only SymmetriesChain
        still fuses and the standalone tail reads its identical files."""
        res = self._run(tmp_path, tail_out="k")
        plain, fused = res["plain"], res["fused"]
        assert len(plain[0]) == 4 and len(fused[0]) == 2
        # k holds the chain outputs AND their symmetries in both runs
        assert plain[1] == fused[1]


    def test_tail_save_log_falls_back(self, tmp_path):
        """save_log on the trailing sym declines the both-ends shape
        (the standalone step's JSON log is user-visible surface); the
        head-only SymmetriesChain still fuses and the standalone tail
        writes its log over identical inputs."""
        import json

        self._mkrgba(tmp_path / "in")
        pipe = ProcessingPipeline(root_dir=tmp_path)
        steps = self._steps()
        steps[-1].save_log = True
        for s in steps:
            pipe.add_step(s)
        counters = pipe.run(progress=False, auto_fuse=True)
        assert len(counters) == 2  # SymmetriesChain + standalone sym2
        rep = json.loads((tmp_path / "sym2.json").read_text())
        assert isinstance(rep, list)
        assert all(e["status"] == "Success" for e in rep)
        assert len(rep) == 12  # 3 inputs x 4 head syms

    def test_head_subpool_declines_byte_tier(self, tmp_path):
        """head choose_random < len(pool) under the BYTE tier: the
        both-ends shape declines entirely (head stays standalone); the
        mask->clean->sym2 suffix still fuses as a tail fan-out
        (ChainSymmetries)."""
        res = self._run(tmp_path, head_options={"choose_random": 2})
        plain, fused = res["plain"], res["fused"]
        assert len(fused[0]) == 2  # sym + ChainSymmetries(mask,clean,sym2)
        assert plain[1] == fused[1]

    def test_head_subpool_fuses_under_rng(self, tmp_path):
        """head choose_random=2 fuses under the rng tier (ONE step) —
        and the per-item head subsets MATCH the 3-step head-only
        SymmetriesChain's for the same seeds (the shared select_syms
        tree at slot 0), so the shapes can't drift apart."""
        self._mkrgba(tmp_path / "in")
        # explicit 'o'-free pool: the drawn subset is always 2 + 'o'
        head = {"choose_random": 2, "pool": ("h", "v", "hv")}
        # 4-step: both-ends fan-out under rng
        root4 = tmp_path / "four"
        root4.mkdir()
        (root4 / "in").symlink_to(tmp_path / "in")
        pipe = ProcessingPipeline(root_dir=root4)
        for s in self._steps(head_options=head):
            pipe.add_step(s)
        counters = pipe.run(progress=False, auto_fuse="rng")
        assert len(counters) == 1 and counters[0]["Success"] == 3
        files4 = sorted(p.name for p in (root4 / "s2").iterdir())
        # per item: (2 drawn + 'o') head syms x 4 tail syms
        assert len(files4) == 3 * 3 * 4
        # 3-step: head-only fan-out under rng, same head seed
        root3 = tmp_path / "three"
        root3.mkdir()
        (root3 / "in").symlink_to(tmp_path / "in")
        pipe = ProcessingPipeline(root_dir=root3)
        for s in self._steps(head_options=head)[:3]:
            pipe.add_step(s)
        counters = pipe.run(progress=False, auto_fuse="rng")
        assert len(counters) == 1
        heads3 = {tuple(p.stem.rsplit("_", 1))
                  for p in (root3 / "k").iterdir()}
        heads4 = {tuple(p.stem.rsplit("_", 2)[:2])
                  for p in (root4 / "s2").iterdir()}
        assert heads3 == heads4  # same (stem, head_sym) selections
        # and the draw is deterministic: a rerun selects the same names
        root4b = tmp_path / "fourb"
        root4b.mkdir()
        (root4b / "in").symlink_to(tmp_path / "in")
        pipe = ProcessingPipeline(root_dir=root4b)
        for s in self._steps(head_options=head):
            pipe.add_step(s)
        pipe.run(progress=False, auto_fuse="rng")
        assert sorted(p.name for p in (root4b / "s2").iterdir()) == files4


class TestFanoutSubpoolRngTier:
    """auto_fuse="rng" relaxes the deterministic-selection requirement
    in the rot-headed fan-out composites too: sub-pool symmetry sampling
    rides the shared per-(item, slot) select_syms tree — the SAME
    subsets a fused RotationsSymmetries pair draws for the same seeds
    (distribution-equal to standalone runs, never byte-equal)."""

    def _mkimgs(self, d, n=3):
        d.mkdir(parents=True, exist_ok=True)
        for i in range(n):
            h, w = 38 + 5 * i, 46
            arr = np.full((h, w, 3), 200, np.uint8)
            arr[5:h - 8, 5:w - 8] = (180, 40, 60)
            arr[8:14, 8:14] = (60, 200, 60)
            Image.fromarray(arr).save(d / f"x{i}.png")

    def _rot(self, **kw):
        from image_processor_pipeline_tpu.transforms import RandomRotations

        return ProcessingStep(
            "rot", RandomRotations(), input_dirs=["in"], output_dirs=["r"],
            pairing_method="one_input", seed=7,
            options={"num_rotations": 2, "output_format": "png",
                     **kw.pop("options", {})}, **kw)

    def _sym(self, name="sym", out="s", **options):
        from image_processor_pipeline_tpu.transforms import (
            GenerateSymmetries,
        )

        # explicit 'o'-free pool: the drawn subset is always k + 'o'
        options.setdefault("pool", ("h", "v", "hv"))
        return ProcessingStep(
            name, GenerateSymmetries(), output_dirs=[out],
            pairing_method="one_input", options=options)

    def _mask(self, out="m"):
        return ProcessingStep(
            "mask", ColorMaskTransparency(), output_dirs=[out],
            pairing_method="one_input",
            options={"color_ranges_to_exclude_hsv": HSV})

    def test_rotsymchain_subpool_fuses_under_rng(self, tmp_path):
        """rot -> sym(choose_random=2) -> mask fuses to ONE RotSymChain
        under rng, and its per-(item, rotation) subsets match the fused
        rot->sym PAIR's (RotationsSymmetries) for the same seeds."""
        self._mkimgs(tmp_path / "in")
        names = {}
        fused_types = {}
        for tag, steps in (
            ("chain", lambda: [self._rot(), self._sym(choose_random=2),
                               self._mask()]),
            ("pair", lambda: [self._rot(), self._sym(choose_random=2)]),
        ):
            root = tmp_path / tag
            root.mkdir()
            (root / "in").symlink_to(tmp_path / "in")
            pipe = ProcessingPipeline(root_dir=root)
            for s in steps():
                pipe.add_step(s)
            counters = pipe.run(progress=False, auto_fuse="rng")
            assert len(counters) == 1 and counters[0]["Success"] == 3
            fused_types[tag] = type(
                pipe.last_run_steps[0].process_function).__name__
            out = "m" if tag == "chain" else "s"
            names[tag] = sorted(p.name for p in (root / out).iterdir())
        assert fused_types == {"chain": "RotSymChain",
                               "pair": "RotationsSymmetries"}
        # per item: 3 slots x (2 drawn + 'o') = 9
        assert len(names["chain"]) == 3 * 3 * 3
        # the two shapes draw from the same tree: identical selections
        assert names["chain"] == names["pair"]

    def test_rotchainsym_subpool_fuses_under_rng(self, tmp_path):
        """rot -> mask -> sym(choose_random=2) fuses to ONE
        RotationsChainSymmetries under rng; the draw is deterministic
        per seed (a rerun reproduces the same names)."""
        self._mkimgs(tmp_path / "in")
        runs = []
        for tag in ("a", "b"):
            root = tmp_path / tag
            root.mkdir()
            (root / "in").symlink_to(tmp_path / "in")
            pipe = ProcessingPipeline(root_dir=root)
            for s in (self._rot(), self._mask(),
                      self._sym(choose_random=2)):
                pipe.add_step(s)
            counters = pipe.run(progress=False, auto_fuse="rng")
            assert len(counters) == 1 and counters[0]["Success"] == 3
            runs.append(sorted(p.name for p in (root / "s").iterdir()))
        assert runs[0] == runs[1]  # per-seed deterministic
        assert len(runs[0]) == 3 * 3 * 3  # 3 items x 3 slots x (2+'o')
        # every name is {stem}_{rkey}_{sym}.png with sym in the superset
        for n in runs[0]:
            sym = n.rsplit("_", 1)[1].removesuffix(".png")
            assert sym in ("h", "v", "hv", "o")

    def test_subpool_still_declines_byte_tier(self, tmp_path):
        """the same shapes under auto_fuse=True (byte tier) keep the
        r4 decline: the sym step stays standalone."""
        self._mkimgs(tmp_path / "in")
        pipe = ProcessingPipeline(root_dir=tmp_path)
        for s in (self._rot(), self._mask(), self._sym(choose_random=2)):
            pipe.add_step(s)
        counters = pipe.run(progress=False, auto_fuse=True)
        assert len(counters) == 2  # RotationsChain + standalone sym

    def test_select_syms_subset_law_uniform(self):
        """Draw-level: the shared fan-out sub-pool tree (select_syms)
        must produce uniform k-subsets — the same law as the standalone
        step's per-file rng.sample — across items AND slots (a biased
        seed construction, e.g. colliding (seed, slot) nodes, would show
        up here as subset-frequency skew)."""
        from collections import Counter

        from scipy.stats import chisquare

        from image_processor_pipeline_tpu.transforms.rotsym import (
            select_syms,
        )

        pool = ("h", "v", "hv")
        counts = Counter()
        n_seeds, n_slots = 1500, 3
        for seed in range(n_seeds):
            for slot in range(n_slots):
                sel = select_syms(None, (pool, 2, False), seed, slot)
                assert len(sel) == 2 and set(sel) <= set(pool)
                counts[frozenset(sel)] += 1
        # 3 possible 2-subsets, each expected n/3
        obs = [counts[frozenset(s)] for s in
               ({"h", "v"}, {"h", "hv"}, {"v", "hv"})]
        assert sum(obs) == n_seeds * n_slots
        stat, p = chisquare(obs)
        assert p > 1e-3, (obs, stat, p)
        # and include_original appends 'o' exactly when missing
        sel = select_syms(None, (("h", "o", "v"), 1, True), 7, 0)
        assert "o" in sel and len(sel) <= 2
