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
