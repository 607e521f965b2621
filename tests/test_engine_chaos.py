"""Failure-injection chaos tests for the streaming batched engine
(SURVEY.md §5.3 failure tolerance; TODO r1 'failure injection hooks').

Inject faults at every engine phase — probe, batch decode, save — and
assert per-item containment: other items complete, statuses are accurate,
the engine never deadlocks, and retry budgets apply where promised.
"""

import numpy as np
import pytest
from pathlib import Path
from PIL import Image

from image_processor_pipeline_tpu import ProcessingStep
from image_processor_pipeline_tpu.transforms.fused import Enhance, FusedChain


@pytest.fixture
def imgs(tmp_path, rng):
    d = tmp_path / "imgs"
    d.mkdir()
    for i in range(8):
        h, w = int(rng.integers(50, 90)), int(rng.integers(50, 90))
        Image.fromarray(
            rng.integers(0, 256, (h, w, 3), np.uint8)
        ).save(d / f"im{i}.jpg")
    return d


def _step(transform, imgs, out, **kw):
    return ProcessingStep(
        "chaos", transform, input_dirs=[imgs], output_dirs=[out],
        pairing_method="one_input", seed=3, **kw,
    )


class TestChaos:
    def test_probe_fault_isolated(self, imgs, tmp_path):
        class Flaky(FusedChain):
            def probe_item(self, inputs, options):
                if Path(inputs[0]).stem == "im3":
                    raise RuntimeError("injected probe fault")
                return super().probe_item(inputs, options)

        c = _step(Flaky([Enhance()]), imgs, tmp_path / "o").run(progress=False)
        assert c["Success"] == 7 and c["Error"] == 1

    def test_decode_fault_isolated(self, imgs, tmp_path):
        # corrupt one file after probing would need timing control; instead
        # truncate a real JPEG so the header probes fine but decode fails
        victim = imgs / "im5.jpg"
        data = victim.read_bytes()
        victim.write_bytes(data[: len(data) // 2])
        c = _step(FusedChain([Enhance()]), imgs, tmp_path / "o").run(
            progress=False)
        # the truncated file may decode partially (libjpeg recovers) or
        # fail; either way the run completes and no other item is lost
        assert c["Success"] + c["Error"] == 8
        assert c["Success"] >= 7

    def test_save_fault_retry_budget(self, imgs, tmp_path):
        attempts = {}

        class FlakySave(FusedChain):
            def save_item(self, out, item, output_dirs, options):
                stem = Path(item["_args"][0]).stem
                attempts[stem] = attempts.get(stem, 0) + 1
                if stem == "im2" and attempts[stem] == 1:
                    raise IOError("injected transient save fault")
                return super().save_item(out, item, output_dirs, options)

        c = _step(FlakySave([Enhance()]), imgs, tmp_path / "o",
                  retries=1).run(progress=False)
        assert c["Success"] == 8
        assert attempts["im2"] == 2  # one retry, then success

    def test_save_fault_exhausted_budget(self, imgs, tmp_path):
        class BrokenSave(FusedChain):
            def save_item(self, out, item, output_dirs, options):
                if Path(item["_args"][0]).stem == "im2":
                    raise IOError("injected permanent save fault")
                return super().save_item(out, item, output_dirs, options)

        step = _step(BrokenSave([Enhance()]), imgs, tmp_path / "o", retries=2)
        c = step.run(progress=False)
        assert c["Success"] == 7 and c["Error"] == 1
        bad = [e for e in step.process_logs if e["status"] == "Error"]
        assert "injected permanent save fault" in bad[0]["error_message"]
        assert bad[0]["outputs"] is None  # reference schema: null, not []

    def test_all_items_fail_run_completes(self, imgs, tmp_path):
        class AlwaysFails(FusedChain):
            def save_item(self, out, item, output_dirs, options):
                raise RuntimeError("injected")

        c = _step(AlwaysFails([Enhance()]), imgs, tmp_path / "o").run(
            progress=False)
        assert c["Error"] == 8 and c.get("Success", 0) == 0


class TestMeshNativeDeclineInteraction:
    """VERDICT r4 weak #6: a step configured with an in-process mesh
    where the native twin declines MID-RUN must stay byte-identical.
    The engine pairs the mesh with the jit path only (use_native →
    device_mesh None); a native decline falls back to the SINGLE-DEVICE
    jit program (launch_batch_native), which accepts any batch length —
    no quantum padding needed — and produces the same bytes."""

    def test_mesh_with_midrun_native_decline(self, tmp_path, rng):
        from image_processor_pipeline_tpu import ProcessingPipeline
        from image_processor_pipeline_tpu.transforms import (
            ColorMaskTransparency,
        )

        d = tmp_path / "in"
        d.mkdir()
        for i in range(11):  # ragged vs mesh=4 on purpose
            arr = np.full((40, 56, 3), 190, np.uint8)
            arr[5:30, 5:40] = (170, 60, 70)
            arr[8:14, 8:14] = (60, 200, 60)
            arr += rng.integers(0, 5, arr.shape, dtype=np.uint8)
            Image.fromarray(arr).save(d / f"x{i}.png")
        hsv = [(35, 60, 60, 85, 255, 255)]

        calls = {"n": 0}

        class FlakyNative(ColorMaskTransparency):
            max_batch = 4  # several dispatches so the decline is mid-run

            def native_fn(self, batch, static, options, n_threads=1):
                calls["n"] += 1
                if calls["n"] % 2 == 0:
                    return None  # injected mid-run decline
                return super().native_fn(batch, static, options,
                                         n_threads)

        results = {}
        for tag, transform, mesh, native in (
            ("plain", ColorMaskTransparency(), None, False),
            ("declining", FlakyNative(), 4, True),
        ):
            root = tmp_path / tag
            root.mkdir()
            (root / "in").symlink_to(d)
            pipe = ProcessingPipeline(root_dir=root)
            pipe.add_step(ProcessingStep(
                "m", transform, input_dirs=["in"], output_dirs=["o"],
                pairing_method="one_input", seed=5, mesh=mesh,
                options={"color_ranges_to_exclude_hsv": hsv,
                         "native_compute": native}))
            c = pipe.run(progress=False)[0]
            assert c["Success"] == 11, c
            results[tag] = {p.name: p.read_bytes()
                            for p in sorted((root / "o").iterdir())}
        assert calls["n"] >= 2  # the stub really declined mid-run
        assert results["plain"] == results["declining"]

    def test_mesh_jit_path_with_decline_stays_padded(self, tmp_path, rng):
        """mesh with native_compute=False: every batch goes through the
        SHARDED jit with quantum padding even at ragged tails (11 items,
        mesh=4) — byte-identical to single-device."""
        from image_processor_pipeline_tpu import ProcessingPipeline
        from image_processor_pipeline_tpu.transforms import (
            ColorMaskTransparency,
        )

        d = tmp_path / "in"
        d.mkdir()
        for i in range(11):
            arr = np.full((40, 56, 3), 190, np.uint8)
            arr[5:30, 5:40] = (170, 60, 70)
            arr += rng.integers(0, 5, arr.shape, dtype=np.uint8)
            Image.fromarray(arr).save(d / f"x{i}.png")
        hsv = [(35, 60, 60, 85, 255, 255)]

        results = {}
        for tag, mesh in (("one", None), ("mesh", 4)):
            root = tmp_path / tag
            root.mkdir()
            (root / "in").symlink_to(d)
            pipe = ProcessingPipeline(root_dir=root)
            pipe.add_step(ProcessingStep(
                "m", ColorMaskTransparency(), input_dirs=["in"],
                output_dirs=["o"], pairing_method="one_input", seed=5,
                mesh=mesh,
                options={"color_ranges_to_exclude_hsv": hsv,
                         "native_compute": False}))
            c = pipe.run(progress=False)[0]
            assert c["Success"] == 11, c
            results[tag] = {p.name: p.read_bytes()
                            for p in sorted((root / "o").iterdir())}
        assert results["one"] == results["mesh"]
