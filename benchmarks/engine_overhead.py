"""Where does the engine's per-item time actually go on the host path?

The e2e colormask row records host_load ~57 ms/item against a ~4 ms/item
native-decode roofline.  cProfile adds ~100 ms/item to threaded ctypes
runs (CLAUDE.md round-3 note), so this harness wraps individual functions
with plain time.perf_counter accumulators instead.

Usage: python benchmarks/engine_overhead.py [n_images]
"""
import sys
import time
import shutil
import tempfile
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax

jax.config.update("jax_platforms", "cpu")

ACC = defaultdict(float)
CPU = defaultdict(float)
CNT = defaultdict(int)


def wrap(obj, name, label=None, static=False):
    label = label or name
    fn = getattr(obj, name)

    def timed(*a, **k):
        t0 = time.perf_counter()
        c0 = time.thread_time()
        try:
            return fn(*a, **k)
        finally:
            ACC[label] += time.perf_counter() - t0
            CPU[label] += time.thread_time() - c0
            CNT[label] += 1

    setattr(obj, name, staticmethod(timed) if static else timed)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    root = Path(tempfile.mkdtemp(prefix="ipp_overhead_"))
    try:
        from benchmarks.e2e_vs_reference import make_dataset, HSV_RANGES

        make_dataset(root, n)

        import image_processor_pipeline_tpu.io.images as images_mod
        import image_processor_pipeline_tpu.ops.native_cpu as ncpu
        import image_processor_pipeline_tpu.io.native as native_mod
        from image_processor_pipeline_tpu.transforms.filters import (
            ColorMaskTransparency,
        )

        t = ColorMaskTransparency()
        wrap(images_mod, "fill_pending_images")
        wrap(images_mod, "encode_image")
        wrap(type(t), "probe_item")
        wrap(type(t), "save_item")
        wrap(type(t), "launch_batch_native")
        wrap(type(t), "stack_batch")
        wrap(type(t), "native_fn")
        wrap(type(t), "materialize_batch", static=True)
        wrap(type(t), "bucket_key")
        if hasattr(ncpu, "colormask_batch"):
            wrap(ncpu, "colormask_batch")
        for sym in ("read_images_batch", "probe_bands"):
            if hasattr(native_mod, sym):
                wrap(native_mod, sym)

        from image_processor_pipeline_tpu import (
            ProcessingPipeline,
            ProcessingStep,
        )

        pipe = ProcessingPipeline(root_dir=root)
        pipe.add_step(ProcessingStep(
            "mask", t, input_dirs=["imgs"], output_dirs=["out"],
            pairing_method="one_input", workers=1, seed=0,
            options={"color_ranges_to_exclude_hsv": HSV_RANGES},
        ))
        t0 = time.perf_counter()
        counters = pipe.run(progress=False)
        wall = time.perf_counter() - t0
        print(f"\nwall {wall:.2f}s for {n} items = {1000*wall/n:.1f} ms/item "
              f"({n/wall:.1f} items/s); counters={counters}")
        print(f"{'fn':28s} {'wall_s':>8s} {'cpu_s':>8s} {'calls':>6s} "
              f"{'ms/item':>8s}")
        for k in sorted(ACC, key=lambda k: -ACC[k]):
            print(f"{k:28s} {ACC[k]:8.2f} {CPU[k]:8.2f} {CNT[k]:6d} "
                  f"{1000*ACC[k]/n:8.2f}")
        acc = sum(ACC[k] for k in
                  ("fill_pending_images", "encode_image", "probe_item",
                   "launch_batch_native", "materialize_batch")
                  if k in ACC)
        print(f"accounted {1000*acc/n:.1f} ms/item of {1000*wall/n:.1f}")
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
