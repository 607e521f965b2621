"""Video frame extraction + streaming into the batched chain
(eval config 5: video → frames → crop/rotate/augment pipeline)."""

import numpy as np
import pytest
from pathlib import Path
from PIL import Image

from image_processor_pipeline_tpu import ProcessingPipeline, ProcessingStep
from image_processor_pipeline_tpu.transforms import frame_extraction
from image_processor_pipeline_tpu.transforms.fused import Enhance, Flip, FusedChain
from image_processor_pipeline_tpu.transforms.video import iter_frames

cv2 = pytest.importorskip("cv2")


@pytest.fixture
def video(tmp_path):
    p = tmp_path / "clip.mp4"
    w = cv2.VideoWriter(str(p), cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 48))
    frames = []
    gy = np.linspace(0, 255, 48, dtype=np.uint8)[:, None]
    gx = np.linspace(0, 255, 64, dtype=np.uint8)[None, :]
    for i in range(7):
        # smooth gradients survive mp4 compression (noise does not)
        f = np.stack(
            [np.broadcast_to(gy, (48, 64)),
             np.broadcast_to(gx, (48, 64)),
             np.full((48, 64), 30 * i, np.uint8)], axis=-1
        ).astype(np.uint8)
        frames.append(f)
        w.write(f[:, :, ::-1])  # VideoWriter expects BGR
    w.release()
    return p, frames


class TestFrameExtraction:
    def test_naming_and_structure(self, tmp_path, video):
        vid, frames = video
        out = frame_extraction(vid, [tmp_path / "out"], file_basename="cls")
        # reference contract: returns output[0]/{stem}/0-raw (video.py:48)
        assert out == tmp_path / "out" / "clip" / "0-raw"
        files = sorted(out.iterdir())
        assert [f.name for f in files] == [
            f"cls-frame_{i:04d}.jpg" for i in range(1, 8)
        ]

    def test_requires_basename_and_format(self, tmp_path, video):
        vid, _ = video
        with pytest.raises(ValueError):
            frame_extraction(vid, [tmp_path / "o"], file_basename=None)
        bad = tmp_path / "x.xyz"
        bad.write_bytes(b"no")
        with pytest.raises(ValueError):
            frame_extraction(bad, [tmp_path / "o"], file_basename="c")

    def test_iter_frames_streaming(self, video):
        vid, frames = video
        got = list(iter_frames(vid))
        assert len(got) == 7
        # mp4 is lossy; frames should still be close
        diff = np.abs(got[0].astype(int) - frames[0].astype(int)).mean()
        assert diff < 30

    def test_video_into_augment_chain(self, tmp_path, video):
        """Full eval-config-5 shape: video → frames → fused augment chain."""
        vid, _ = video
        pipe = ProcessingPipeline(root_dir=tmp_path)
        pipe.add_step(ProcessingStep(
            name="extract", process_function=frame_extraction,
            input_dirs=[vid.parent], output_dirs=["frames"],
            options={"file_basename": "clip"},
        ))
        pipe.run(progress=False)
        pipe2 = ProcessingPipeline(root_dir=tmp_path)
        pipe2.add_step(ProcessingStep(
            name="augment", process_function=FusedChain([Flip(), Enhance()]),
            input_dirs=["frames/clip/0-raw"], output_dirs=["aug"],
            seed=3,
        ))
        counters = pipe2.run(progress=False)
        assert counters[0]["Success"] == 7
        outs = list((tmp_path / "aug").iterdir())
        assert len(outs) == 7
        with Image.open(outs[0]) as im:
            assert im.size == (64, 48)
