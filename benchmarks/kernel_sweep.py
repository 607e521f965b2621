"""Mega-kernel tuning sweep: images_per_step (G) x batch (B) on real TPU.

Same tunnel-proof measurement protocol as bench.py: the whole loop runs
inside one jit (fori_loop with a chained data dependency), only a scalar
checksum crosses the host boundary, cost = (T(iters) - T(2)) / (iters - 2).

Usage: python benchmarks/kernel_sweep.py [--mode pallas_full]
"""

import argparse
import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="pallas_full")
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--batches", default="8,16")
    ap.add_argument("--gs", default="1,2,4")
    ap.add_argument("--input", type=int, default=640,
                    help="input canvas (512 = pre-cropped, no crop stage)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from image_processor_pipeline_tpu.models.chains import augment_chain

    rng = np.random.default_rng(0)
    results = []
    for B in [int(x) for x in args.batches.split(",")]:
        images = jax.device_put(rng.integers(
            0, 256, size=(B, args.input, args.input, 3), dtype=np.uint8))
        xywhn = jax.device_put(np.tile(
            np.asarray([0.5, 0.5, 0.2, 0.2], np.float32), (B, 1)))
        seeds = jax.device_put(np.arange(B, dtype=np.uint32))

        @functools.partial(jax.jit, static_argnums=(3, 4, 5))
        def loop(images, xywhn, seeds, n, mode, g, B=B):
            def body(i, carry):
                dep, _ = carry
                out = augment_chain(images, xywhn, seeds + i * B + dep,
                                    512, mode, images_per_step=g)
                return out[0, 0, 0, 0].astype(jnp.uint32), out
            dep, out = jax.lax.fori_loop(
                0, n, body,
                (jnp.uint32(0), jnp.zeros((B, 512, 512, 4), jnp.uint8)))
            return jnp.sum(out.astype(jnp.uint32)) + dep

        for G in [int(x) for x in args.gs.split(",")]:
            if B % G:
                continue
            try:
                for n in (2, args.iters):
                    int(loop(images, xywhn, seeds, n, args.mode, G))
                best = 0.0
                for _ in range(3):
                    t0 = time.perf_counter()
                    int(loop(images, xywhn, seeds, args.iters, args.mode, G))
                    t_long = time.perf_counter() - t0
                    t0 = time.perf_counter()
                    int(loop(images, xywhn, seeds, 2, args.mode, G))
                    t_short = time.perf_counter() - t0
                    best = max(best, B * (args.iters - 2)
                               / (t_long - t_short))
                row = {"B": B, "G": G, "img_per_s": round(best, 1)}
            except Exception as e:  # noqa: BLE001 — record and continue
                row = {"B": B, "G": G, "error": f"{type(e).__name__}: {e}"}
            print(json.dumps(row), flush=True)
            results.append(row)
    good = [r for r in results if "img_per_s" in r]
    if good:
        top = max(good, key=lambda r: r["img_per_s"])
        print("BEST:", json.dumps(top))


if __name__ == "__main__":
    main()
