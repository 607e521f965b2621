"""Scale soak: the north-star-sized run (BASELINE.json: a 100k-image
augmentation run) through the streaming batched engine on this host.

Validates what a benchmark row can't: bounded memory over the whole run
(the engine must hold O(window) items, never the inventory), zero output
collisions, and per-item status accounting at six figures.  The transform
is the T1 square crop (device program) over zip-paired image+label inputs
— the reference's own crop always crashes (SURVEY.md §2.7 #1/#2), so this
config has no A/B leg; wall-clock here is OUR absolute rate on one core.

Usage:  python benchmarks/soak.py [--n 100000] [--root DIR] [--keep]
Prints one JSON line: items, successes, wall_seconds, items_per_second,
peak_rss_mb, output_collisions.
"""

from __future__ import annotations

import argparse
import json
import resource
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def make_dataset(root: Path, n: int, seed: int = 0) -> None:
    import numpy as np
    from PIL import Image

    rng = np.random.default_rng(seed)
    (root / "imgs").mkdir(parents=True, exist_ok=True)
    (root / "labels").mkdir(exist_ok=True)
    t0 = time.perf_counter()
    for i in range(n):
        h = int(rng.integers(96, 200))
        w = int(rng.integers(96, 200))
        Image.fromarray(
            rng.integers(0, 256, (h, w, 3), np.uint8)
        ).save(root / "imgs" / f"im{i:06d}.jpg", quality=85)
        cx, cy = rng.uniform(0.4, 0.6, 2)
        bw, bh = rng.uniform(0.1, 0.2, 2)
        (root / "labels" / f"im{i:06d}.txt").write_text(
            f"0 {cx:.6f} {cy:.6f} {bw:.6f} {bh:.6f}\n")
    print(f"dataset: {n} items in {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--root", type=str, default=None)
    ap.add_argument("--keep", action="store_true")
    ap.add_argument(
        "--mode", choices=("crop", "fused", "fanout"), default="crop",
        help="crop: the classic T1 zip soak.  fused: a migrated 3-step "
             "mask->cleanup->fitcrop pipeline run under auto_fuse=True "
             "with ProcessingStep(mesh='auto') over 8 virtual CPU "
             "devices (jit path) — soaks the round-4/5 machinery: the "
             "fusion rewriter, the fused device program, and the "
             "mesh-quantum batch padding at six figures.  fanout: a "
             "migrated 4-step rot(2)->mask->cleanup->sym pipeline under "
             "auto_fuse=True + mesh='auto' — collapses to ONE (N+1)xS "
             "RotationsChainSymmetries step writing 12 files per input "
             "(the deepest fan-out shape at scale)")
    args = ap.parse_args()

    if args.mode in ("fused", "fanout"):
        import os

        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8")

    import jax

    jax.config.update("jax_platforms", "cpu")

    root = Path(args.root) if args.root else Path(
        tempfile.mkdtemp(prefix="ipp_soak_"))
    make_dataset(root, args.n)

    from image_processor_pipeline_tpu import (
        ProcessingPipeline,
        ProcessingStep,
    )

    pipe = ProcessingPipeline(root_dir=root)
    if args.mode == "fused":
        from image_processor_pipeline_tpu.transforms import (
            ColorMaskTransparency,
            FitCrop,
            KeepLargestComponent,
        )

        hsv = [(35, 60, 60, 85, 255, 255)]
        kw = dict(pairing_method="one_input", workers=2, seed=0,
                  mesh="auto", options={"native_compute": False})
        pipe.add_step(ProcessingStep(
            "mask", ColorMaskTransparency(), input_dirs=["imgs"],
            output_dirs=["m"],
            **{**kw, "options": {**kw["options"],
                                 "color_ranges_to_exclude_hsv": hsv}}))
        pipe.add_step(ProcessingStep(
            "clean", KeepLargestComponent(), output_dirs=["c"], **kw))
        pipe.add_step(ProcessingStep(
            "fit", FitCrop(), output_dirs=["out"], **kw))
        t0 = time.perf_counter()
        counters = pipe.run(progress=False, auto_fuse=True)
        step = pipe.last_run_steps[-1]
        assert len(pipe.last_run_steps) == 1, "auto_fuse did not collapse"
    elif args.mode == "fanout":
        from image_processor_pipeline_tpu.transforms import (
            ColorMaskTransparency,
            GenerateSymmetries,
            KeepLargestComponent,
            RandomRotations,
        )

        hsv = [(35, 60, 60, 85, 255, 255)]
        kw = dict(pairing_method="one_input", workers=2, seed=0,
                  mesh="auto", options={"native_compute": False})
        pipe.add_step(ProcessingStep(
            "rot", RandomRotations(), input_dirs=["imgs"],
            output_dirs=["r"],
            **{**kw, "options": {**kw["options"], "num_rotations": 2}}))
        pipe.add_step(ProcessingStep(
            "mask", ColorMaskTransparency(), output_dirs=["m"],
            **{**kw, "options": {**kw["options"],
                                 "color_ranges_to_exclude_hsv": hsv}}))
        pipe.add_step(ProcessingStep(
            "clean", KeepLargestComponent(), output_dirs=["c"],
            **{**kw, "options": {**kw["options"],
                                 "min_component_size": 50}}))
        pipe.add_step(ProcessingStep(
            "sym", GenerateSymmetries(), output_dirs=["out"], **kw))
        t0 = time.perf_counter()
        counters = pipe.run(progress=False, auto_fuse=True)
        step = pipe.last_run_steps[-1]
        assert len(pipe.last_run_steps) == 1, "auto_fuse did not collapse"
    else:
        from image_processor_pipeline_tpu.transforms import (
            SquareCropAroundBBox,
        )

        step = ProcessingStep(
            "crop", SquareCropAroundBBox(), input_dirs=["imgs", "labels"],
            output_dirs=["out/imgs", "out/labels"], pairing_method="zip",
            seed=0, workers=2, save_log=False)
        pipe.add_step(step)
        t0 = time.perf_counter()
        counters = pipe.run(progress=False)
    wall = time.perf_counter() - t0
    peak_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    result = {
        "mode": args.mode,
        "items": args.n,
        "output_files": sum(1 for p in (root / "out").rglob("*")
                            if p.is_file()),
        "successes": counters[-1].get("Success", 0),
        "wall_seconds": round(wall, 1),
        "items_per_second": round(args.n / wall, 1),
        "peak_rss_mb": round(peak_mb, 1),
        "output_collisions": step.metrics.output_collisions,
        "steps_run": [s.name for s in getattr(
            pipe, "last_run_steps", pipe.steps)],
        "devices": jax.device_count(),
    }
    print(json.dumps(result))
    if not args.keep and args.root is None:
        shutil.rmtree(root, ignore_errors=True)
    if result["successes"] != args.n or result["output_collisions"]:
        sys.exit(1)  # the properties this soak exists to validate


if __name__ == "__main__":
    main()
