"""Benchmark: the fused 512px crop+rotate+flip+filter chain on one chip.

Prints ONE JSON line:
  {"metric": "images/sec/chip (512px crop+rotate+flip+filter chain)",
   "value": N, "unit": "images/sec", "vs_baseline": M}

vs_baseline compares against the reference execution model measured on this
host: the same chain as per-file Python/PIL/cv2 calls (one image at a time),
scaled by cpu_count to model the reference's full ProcessPoolExecutor fan-out
(reference pipeline.py:85-90, 358-433).  The baseline excludes disk IO on
both sides — it is pure transform compute.
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

import numpy as np


def bench_tpu(batch: int = 32, iters: int = 20, input_size: int = 640):
    import jax
    from image_processor_pipeline_tpu.models.chains import augment_chain

    fn = jax.jit(augment_chain, static_argnums=(3,))
    rng = np.random.default_rng(0)
    images = rng.integers(
        0, 256, size=(batch, input_size, input_size, 3), dtype=np.uint8
    )
    xywhn = np.tile(np.asarray([0.5, 0.5, 0.2, 0.2], np.float32), (batch, 1))
    seeds = np.arange(batch, dtype=np.uint32)

    images_d = jax.device_put(images)
    xywhn_d = jax.device_put(xywhn)

    # warm up / compile
    fn(images_d, xywhn_d, jax.device_put(seeds), 512).block_until_ready()

    best = 0.0
    for trial in range(3):
        t0 = time.perf_counter()
        out = None
        for i in range(iters):
            step_seeds = jax.device_put(seeds + (trial * iters + i) * batch)
            out = fn(images_d, xywhn_d, step_seeds, 512)
        out.block_until_ready()
        dt = time.perf_counter() - t0
        best = max(best, batch * iters / dt)
    return best


def bench_cpu_reference_model(n_images: int = 8, input_size: int = 640):
    """Per-file PIL/cv2 chain, reference style (one Python call per image)."""
    import random

    from PIL import Image, ImageEnhance

    try:
        import cv2
    except ImportError:
        cv2 = None

    rng = np.random.default_rng(0)
    imgs = [
        rng.integers(0, 256, size=(input_size, input_size, 3), dtype=np.uint8)
        for _ in range(n_images)
    ]

    t0 = time.perf_counter()
    for arr in imgs:
        # crop 512 window
        y0 = random.randint(0, input_size - 512)
        x0 = random.randint(0, input_size - 512)
        crop = arr[y0:y0 + 512, x0:x0 + 512]
        # arbitrary-angle rotation (PIL, nearest, fixed canvas)
        im = Image.fromarray(crop).rotate(random.uniform(1, 359))
        # dihedral flip
        a = np.asarray(im)
        if cv2 is not None:
            a = cv2.flip(a, random.choice([1, 0, -1]))
            # HSV double inRange mask
            hsv = cv2.cvtColor(a, cv2.COLOR_RGB2HSV)
            m1 = cv2.inRange(hsv, (35, 60, 60), (85, 255, 255))
            m2 = cv2.inRange(hsv, (100, 40, 40), (140, 230, 230))
            _ = cv2.bitwise_not(cv2.bitwise_or(m1, m2))
        else:
            a = a[:, ::-1]
        # photometric enhance
        im = Image.fromarray(a)
        im = ImageEnhance.Brightness(im).enhance(random.uniform(0.7, 1.3))
        im = ImageEnhance.Contrast(im).enhance(random.uniform(0.7, 1.3))
        im = ImageEnhance.Color(im).enhance(random.uniform(0.7, 1.3))
        a = np.asarray(im).astype(np.float32)
        a = np.clip(a * np.random.uniform(0.75, 1.25, 3), 0, 255).astype(np.uint8)
    dt = time.perf_counter() - t0
    per_core = n_images / dt
    return per_core * (os.cpu_count() or 1)  # model the full process pool


def main():
    quick = "--quick" in sys.argv
    tpu_ips = bench_tpu(
        batch=8 if quick else 32, iters=5 if quick else 20
    )
    cpu_ips = bench_cpu_reference_model(n_images=4 if quick else 8)
    print(json.dumps({
        "metric": "images/sec/chip (512px crop+rotate+flip+filter chain)",
        "value": round(tpu_ips, 2),
        "unit": "images/sec",
        "vs_baseline": round(tpu_ips / cpu_ips, 2),
    }))


if __name__ == "__main__":
    main()
