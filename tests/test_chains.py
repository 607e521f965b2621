"""Flagship fused chain + fast rotation paths + mesh sharding tests."""

import json
from pathlib import Path

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from image_processor_pipeline_tpu.models.chains import AugmentChain, augment_chain
from image_processor_pipeline_tpu.ops import geometry
from image_processor_pipeline_tpu.ops.pallas.rotate import rotate_square_shear_batch


class TestShearRotation:
    @pytest.mark.parametrize("angle", [17.0, 45.0, 90.0, 133.0, 180.0, 260.0, 359.0])
    def test_close_to_gather_rotation(self, angle):
        rng = np.random.default_rng(0)
        S = 64
        img = jnp.asarray(rng.integers(0, 256, (S, S, 3), dtype=np.uint8))
        ref = np.asarray(geometry.rotate_fixed(img, S, S, angle))
        got = np.asarray(geometry.rotate_square_shear(img, angle))
        frac = (ref == got).all(axis=-1).mean()
        if angle % 90 == 0:
            assert frac == 1.0  # quarter turns are exact
        else:
            # 3-shear nearest vs direct nearest: same footprint, ±1 px jitter
            assert frac > 0.6
            nz_ref = ref.sum(-1) > 0
            nz_got = got.sum(-1) > 0
            iou = (nz_ref & nz_got).sum() / max(1, (nz_ref | nz_got).sum())
            assert iou > 0.85

    def test_pallas_kernel_matches_xla_shear(self):
        rng = np.random.default_rng(1)
        B, S = 2, 64
        imgs = jnp.asarray(rng.integers(0, 256, (B, S, S, 4), dtype=np.uint8))
        angles = jnp.asarray([23.0, 301.0], jnp.float32)
        ref = np.asarray(jax.vmap(geometry.rotate_square_shear)(imgs, angles))
        got = np.asarray(rotate_square_shear_batch(imgs, angles, interpret=True))
        np.testing.assert_array_equal(ref, got)

    def test_large_canvas_shifts_not_clipped(self):
        """Regression: BITS=9 silently clipped shear shifts at ±255,
        distorting rotations on canvases > ~720px."""
        from image_processor_pipeline_tpu.ops.geometry import shift_bits_for

        assert shift_bits_for(512) == 9
        assert shift_bits_for(768) == 10
        assert shift_bits_for(2048) == 11

        rng = np.random.default_rng(0)
        S = 768
        img = jnp.asarray(rng.integers(0, 256, (S, S, 3), dtype=np.uint8))
        ref = np.asarray(geometry.rotate_fixed(img, S, S, 44.0))
        got = np.asarray(geometry.rotate_square_shear(img, 44.0))
        nz_ref = ref.sum(-1) > 0
        nz_got = got.sum(-1) > 0
        iou = (nz_ref & nz_got).sum() / max(1, (nz_ref | nz_got).sum())
        assert iou > 0.9  # was ~0.5 with clipped shifts

    def test_content_preserving_for_small_angles(self):
        # shears are permutations: pixel multiset is preserved inside frame
        S = 64
        img = jnp.zeros((S, S, 3), jnp.uint8).at[20:40, 20:40, 0].set(200)
        out = np.asarray(geometry.rotate_square_shear(img, 10.0))
        # content pixel count preserved (no resampling loss, block well inside)
        assert abs(int((out[..., 0] == 200).sum()) - 400) <= 8


class TestFusedAugmentKernel:
    def test_interpret_matches_reference_within_1(self):
        from image_processor_pipeline_tpu.ops.pallas.augment import (
            augment_finish_reference,
            augment_fused_pallas,
        )

        rng = np.random.default_rng(0)
        B, S = 2, 64
        imgs = jnp.asarray(rng.integers(0, 256, (B, S, S, 3), dtype=np.uint8))
        angles = jnp.asarray([33.0, 287.0], jnp.float32)
        prms = jnp.asarray(rng.uniform(0.7, 1.3, (B, 8)), jnp.float32)
        lowers = ((35.0, 60, 60), (100, 40, 40))
        uppers = ((85.0, 255, 255), (140, 230, 230))
        zones = ((0, 0, 0, 0), (4, 4, 2, 2))
        ref = np.asarray(augment_finish_reference(
            imgs, angles, prms, lowers, uppers, zones))
        got = np.asarray(augment_fused_pallas(
            imgs, angles, prms, lowers, uppers, zones, interpret=True))
        diff = np.abs(ref.astype(int) - got.astype(int))
        assert diff.max() <= 1  # float rounding-order only
        assert (ref == got).mean() > 0.999

    def test_chain_fused_reference_mode(self):
        imgs = np.random.default_rng(0).integers(
            0, 256, (2, 96, 96, 3), dtype=np.uint8)
        xy = np.tile(np.asarray([0.5, 0.5, 0.2, 0.2], np.float32), (2, 1))
        seeds = np.arange(2, dtype=np.uint32)
        out = jax.jit(augment_chain, static_argnums=(3, 4))(
            imgs, xy, seeds, 64, "fused_reference")
        assert np.asarray(out).shape == (2, 64, 64, 4)


class TestAugmentChain:
    def test_shapes_and_dtype(self):
        ch = AugmentChain(input_size=640)
        imgs, xy, seeds = ch.example_inputs(4)
        out = np.asarray(ch(imgs, xy, seeds))
        assert out.shape == (4, 512, 512, 4)
        assert out.dtype == np.uint8

    def test_reproducible_and_seed_sensitive(self):
        ch = AugmentChain(input_size=640)
        imgs, xy, seeds = ch.example_inputs(2)
        a = np.asarray(ch(imgs, xy, seeds))
        b = np.asarray(ch(imgs, xy, seeds))
        np.testing.assert_array_equal(a, b)
        c = np.asarray(ch(imgs, xy, seeds + 100))
        assert not (a == c).all()

    def test_rotation_modes_agree_on_footprint(self):
        imgs = np.random.default_rng(0).integers(
            0, 256, (2, 96, 96, 3), dtype=np.uint8
        )
        xy = np.tile(np.asarray([0.5, 0.5, 0.2, 0.2], np.float32), (2, 1))
        seeds = np.arange(2, dtype=np.uint32)
        fn = jax.jit(augment_chain, static_argnums=(3, 4))
        a = np.asarray(fn(imgs, xy, seeds, 64, "shear"))
        b = np.asarray(fn(imgs, xy, seeds, 64, "gather"))
        assert a.shape == b.shape == (2, 64, 64, 4)
        # same crop + similar rotation footprint
        nz_a = a[..., :3].sum(-1) > 0
        nz_b = b[..., :3].sum(-1) > 0
        iou = (nz_a & nz_b).sum() / max(1, (nz_a | nz_b).sum())
        assert iou > 0.8


class TestGatherPrologue:
    def test_chains_gath_flag_bit_exact(self):
        """The 'gath' flag (ONE u8 gather folding crop AND user flip,
        kernel in external-flips mode) equals full_reference exactly —
        end to end through augment_chain (interpret-mode kernel)."""
        rng = np.random.default_rng(4)
        B = 4
        images = rng.integers(0, 256, (B, 96, 96, 3), np.uint8)
        xy = np.tile(np.asarray([0.5, 0.5, 0.2, 0.2], np.float32), (B, 1))
        seeds = np.arange(10, 10 + B, dtype=np.uint32)
        ref = np.asarray(augment_chain(
            images, xy, seeds, 64, "full_reference"))
        got = np.asarray(augment_chain(
            images, xy, seeds, 64, "pallas_full:gath,interp"))
        np.testing.assert_array_equal(got, ref)

    def test_gath_rejects_ikc_combination(self):
        """'gath' with 'ikc'/'i32crop' would silently drop the user flips
        (external mode, no gather applied) — must raise instead."""
        rng = np.random.default_rng(5)
        images = rng.integers(0, 256, (2, 96, 96, 3), np.uint8)
        xy = np.tile(np.asarray([0.5, 0.5, 0.2, 0.2], np.float32), (2, 1))
        seeds = np.arange(2, dtype=np.uint32)
        for bad in ("pallas_full:gath,ikc", "pallas_full:gath,i32crop"):
            with pytest.raises(ValueError):
                augment_chain(images, xy, seeds, 64, bad)


class TestMeshSharding:
    def test_sharded_step_8_devices(self):
        from image_processor_pipeline_tpu.parallel.mesh import (
            make_mesh,
            sharded_augment_step,
        )

        n = len(jax.devices())
        assert n == 8, "conftest must provide 8 virtual CPU devices"
        mesh = make_mesh(8, shape=(4, 2))
        step = sharded_augment_step(mesh, crop=64)
        rng = np.random.default_rng(0)
        images = rng.integers(0, 256, (8, 96, 96, 3), dtype=np.uint8)
        xy = np.tile(np.asarray([0.5, 0.5, 0.2, 0.2], np.float32), (8, 1))
        seeds = np.arange(8, dtype=np.uint32)
        with mesh:
            out, count = step(images, xy, seeds)
        assert out.shape == (8, 64, 64, 4)
        assert int(count) == 8

    def test_global_counter_psum(self):
        from image_processor_pipeline_tpu.parallel.distributed import (
            global_counter,
        )
        from image_processor_pipeline_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(8, shape=(8, 1))
        assert global_counter(5, mesh) == 5

    def test_sharding_matches_single_device(self):
        """Batch-sharded result must equal the unsharded computation."""
        from image_processor_pipeline_tpu.parallel.mesh import (
            make_mesh,
            sharded_augment_step,
        )

        mesh = make_mesh(8, shape=(8, 1))
        step = sharded_augment_step(mesh, crop=64)
        rng = np.random.default_rng(3)
        images = rng.integers(0, 256, (8, 96, 96, 3), dtype=np.uint8)
        xy = np.tile(np.asarray([0.5, 0.5, 0.2, 0.2], np.float32), (8, 1))
        seeds = np.arange(8, dtype=np.uint32)
        with mesh:
            out, _ = step(images, xy, seeds)
        ref = jax.jit(augment_chain, static_argnums=(3, 4))(
            images, xy, seeds, 64, "shear"
        )
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


class TestEngineMesh:
    """In-process multi-device data parallelism: ProcessingStep(mesh=...)
    fans the bucket batch axis over the local devices (the reference's
    workers=-1 all-cores ergonomics mapped to chips)."""

    def _run(self, tmp_path, mesh, out, n=11, fmt="png", **opts):
        from PIL import Image

        from image_processor_pipeline_tpu.pipeline import (
            ProcessingPipeline,
            ProcessingStep,
        )
        from image_processor_pipeline_tpu.transforms.fused import (
            Enhance,
            Flip,
            FusedChain,
            Rotate,
        )

        src = tmp_path / "src"
        if not src.exists():
            src.mkdir()
            rng = np.random.default_rng(7)
            for i in range(n):
                arr = rng.integers(0, 256, (40 + (i % 3), 52, 3), np.uint8)
                Image.fromarray(arr).save(src / f"im{i}.{fmt}")
        pipe = ProcessingPipeline(root_dir=tmp_path)
        pipe.add_step(ProcessingStep(
            name="chain", process_function=FusedChain(
                [Rotate(method="shear"), Flip(), Enhance()]),
            input_dirs=["src"], output_dirs=[out], seed=99, mesh=mesh,
            save_log=True,
            # jit path on all legs: mesh parallelism is the device path
            options={"native_compute": False, **opts},
        ))
        counters = pipe.run(progress=False)
        report = json.loads((tmp_path / "chain.json").read_text())
        files = {p.name: p.read_bytes()
                 for p in sorted((tmp_path / out).iterdir())}
        return counters[0], report, files

    def test_engine_mesh_byte_identical(self, tmp_path):
        """Files-in/files-out over 8 virtual devices: byte-identical
        outputs and an identical report vs the single-device run — n=11
        forces non-multiple batches through the mesh padding."""
        c1, r1, f1 = self._run(tmp_path, None, "out_single")
        c8, r8, f8 = self._run(tmp_path, "auto", "out_mesh")
        assert c1 == c8 and c8["Success"] == 11
        assert f1 == f8
        strip = lambda rep: [  # noqa: E731
            {**e, "outputs": [str(Path(o).name) for o in e["outputs"] or []]}
            for e in (rep if isinstance(rep, list) else rep["items"])
        ]
        assert strip(r1) == strip(r8)

    def test_engine_mesh_with_device_decode(self, tmp_path):
        """Mesh padding duplicates tail items; the hybrid device decode
        must still engage on those padded chunks (unique head decodes on
        device, zero tail rows) and stay byte-identical to the
        single-device pixel-decode run.  JPEG sources so the coefficient
        transport is actually exercised; n=11 is not a multiple of the
        4-wide data axis."""
        from image_processor_pipeline_tpu.io import native
        if not native.available():
            pytest.skip("native engine unavailable")
        c1, r1, f1 = self._run(tmp_path, None, "out_px", fmt="jpg")
        c8, r8, f8 = self._run(tmp_path, "auto", "out_dd", fmt="jpg",
                               device_decode=True)
        assert c1 == c8 and c8["Success"] == 11
        assert f1 == f8

    def test_engine_mesh_defaults(self, tmp_path):
        """Default mesh=None is single-device on the CPU backend (native
        twins are the fast path there); False forces off; 'auto' builds
        over all local devices."""
        from image_processor_pipeline_tpu.pipeline import ProcessingStep
        from image_processor_pipeline_tpu.transforms.enhance import (
            EnhanceImage,
        )

        def mk(mesh):
            return ProcessingStep(
                "m", EnhanceImage(), input_dirs=["x"], output_dirs=["y"],
                root_dir=tmp_path, mesh=mesh)

        assert mk(None)._resolve_mesh() is None   # cpu backend default
        assert mk(False)._resolve_mesh() is None
        assert mk("auto")._resolve_mesh().shape["data"] == 8

    def test_engine_mesh_int_and_validation(self, tmp_path):
        import pytest as _pytest

        from image_processor_pipeline_tpu.pipeline import ProcessingStep
        from image_processor_pipeline_tpu.transforms.enhance import (
            EnhanceImage,
        )

        step = ProcessingStep(
            "bad", EnhanceImage(), input_dirs=["x"], output_dirs=["y"],
            root_dir=tmp_path, mesh="bogus")
        with _pytest.raises(ValueError):
            step._resolve_mesh()
        step1 = ProcessingStep(
            "one", EnhanceImage(), input_dirs=["x"], output_dirs=["y"],
            root_dir=tmp_path, mesh=1)
        assert step1._resolve_mesh() is None
        step4 = ProcessingStep(
            "four", EnhanceImage(), input_dirs=["x"], output_dirs=["y"],
            root_dir=tmp_path, mesh=4)
        assert step4._resolve_mesh().shape["data"] == 4


class TestShardBatch:
    def test_shard_batch_wrapper(self):
        from image_processor_pipeline_tpu.parallel.mesh import (
            make_mesh,
            shard_batch,
        )

        mesh = make_mesh(8, shape=(8, 1))
        fn = shard_batch(lambda x: x * 2, mesh)
        x = np.arange(16, dtype=np.int32)
        with mesh:
            out = np.asarray(fn(x))
        np.testing.assert_array_equal(out, x * 2)

    def test_make_mesh_shape_validation(self):
        from image_processor_pipeline_tpu.parallel.mesh import make_mesh

        with pytest.raises(ValueError):
            make_mesh(8, shape=(3, 2))

    def test_make_mesh_rejects_over_ask(self):
        """Asking for more devices than the pool raises instead of a
        silent truncation (review r4)."""
        from image_processor_pipeline_tpu.parallel.mesh import make_mesh

        with pytest.raises(ValueError):
            make_mesh(9)  # conftest provides exactly 8
        assert make_mesh(
            4, devices=jax.local_devices()[:4]).shape["data"] == 4
