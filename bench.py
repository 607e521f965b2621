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


def bench_tpu(batch: int = 16, iters: int = 500, input_size: int = 640):
    """Steady-state chain throughput, measured honestly.

    Per-call timing through the axon tunnel is unreliable (dispatch acks
    before completion), so the whole measurement loop runs INSIDE one jit:
    a fori_loop re-runs the chain with per-iteration seeds and a data
    dependency between steps, and only the final scalar checksum crosses
    the host boundary.  Cost per step = (T(iters) - T(2)) / (iters - 2).
    """
    import functools

    import jax
    import jax.numpy as jnp
    from image_processor_pipeline_tpu.models.chains import augment_chain

    rng = np.random.default_rng(0)
    images = rng.integers(
        0, 256, size=(batch, input_size, input_size, 3), dtype=np.uint8
    )
    xywhn = np.tile(np.asarray([0.5, 0.5, 0.2, 0.2], np.float32), (batch, 1))
    seeds = np.arange(batch, dtype=np.uint32)

    @functools.partial(jax.jit, static_argnums=(4,))
    def loop(images, xywhn, seeds, n, rotation):
        # n is a traced loop bound — ONE compiled program serves both the
        # short (overhead-calibration) and long measurement runs
        def body(i, carry):
            dep, _ = carry
            out = augment_chain(
                images, xywhn, seeds + i * batch + dep, 512, rotation,
                # B=8 x 2 images/grid-step measured fastest at steady
                # state (benchmarks/kernel_sweep.py, iters=2000, r3:
                # 35.5-36.4k vs 33.3k at B=16/G=2)
                images_per_step=2,
            )
            # cheap data dependency chaining step i+1 to step i
            return out[0, 0, 0, 0].astype(jnp.uint32), out
        dep, out = jax.lax.fori_loop(
            0, n, body, (jnp.uint32(0), jnp.zeros((batch, 512, 512, 4),
                                                  jnp.uint8))
        )
        return jnp.sum(out.astype(jnp.uint32)) + dep

    images_d = jax.device_put(images)
    xywhn_d = jax.device_put(xywhn)
    seeds_d = jax.device_put(seeds)

    def measure(rotation):
        for n in (2, iters):  # compile once, warm both trip counts
            int(loop(images_d, xywhn_d, seeds_d, n, rotation))
        best = 0.0
        for _ in range(3):  # best-of-3 against scheduler noise
            t0 = time.perf_counter()
            int(loop(images_d, xywhn_d, seeds_d, iters, rotation))
            t_long = time.perf_counter() - t0
            t0 = time.perf_counter()
            int(loop(images_d, xywhn_d, seeds_d, 2, rotation))
            t_short = time.perf_counter() - t0
            best = max(best, batch * (iters - 2) / (t_long - t_short))
        return best

    # preference order: round-2 full mega-kernel (u8-tiling crop, transpose-
    # sandwiched sublane shears, flip-conjugated epilogue — fastest measured)
    # > round-1 fused kernel > rotate-only pallas kernel > XLA shear
    for mode in ("pallas_full", "pallas_fused", "pallas", "shear"):
        try:
            return measure(mode)
        except Exception as e:  # noqa: BLE001 — fall back if Mosaic fails
            print(f"# chain mode {mode!r} unavailable "
                  f"({type(e).__name__}); falling back", file=sys.stderr)
    raise RuntimeError("no chain mode compiled")


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
    # Tuned steady-state protocol (benchmarks/kernel_sweep.py, iters=2000,
    # round 3): B=8/G=2 = 35.5-36.4k > B=16/G=2 = 33.3k.  Short fori-loops
    # through the tunnel are noise-dominated (T(long)-T(short) ~ relay RTT)
    # — iters must be large enough that the loop is compute-dominated.
    tpu_ips = bench_tpu(
        batch=8, iters=5 if quick else 500
    )
    cpu_ips = bench_cpu_reference_model(n_images=4 if quick else 8)
    print(json.dumps({
        # vs_baseline divides by a MODELED reference pool: measured
        # single-core cv2/PIL chain rate x os.cpu_count() (1 on this host)
        # — a compute-only model, NOT a measured ProcessPoolExecutor run.
        # Measured ours-vs-reference wall-clock ratios live in
        # benchmarks/e2e_results.json (interleaved medians).
        "metric": "images/sec/chip (512px crop+rotate+flip+filter chain; "
                  "vs_baseline = modeled single-core reference pool)",
        "value": round(tpu_ips, 2),
        "unit": "images/sec",
        "vs_baseline": round(tpu_ips / cpu_ips, 2),
    }))


if __name__ == "__main__":
    main()
