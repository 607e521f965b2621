"""Same-window transport A/B through the TPU tunnel (or real PCIe).

Measures ONE transform's device path with the coefficient transport ON
vs OFF over interleaved chunks of the same photographic-like dataset, so
the link's bandwidth weather hits both legs equally.  This is the
controlled companion to the e2e harness's vs-reference rows: it isolates
what the sparse D2H transport (ops/jpeg.py) buys on a real device link.

Configs:
  chain    — FusedChain .jpg output: device_encode vs pixel fetch
             (re-records the r4 chain_photo A/B: 1.69x, 237.8->26.1 MB)
  symmetry — GenerateSymmetries on .jpg: fully codec-to-codec
             (device_decode + device_encode, ONE stacked encode dispatch
             for all planes) vs the plain pixel path (host decode +
             full-canvas flip fetches)

Usage: python benchmarks/tunnel_ab.py --config symmetry --n 120
Writes/updates the row in benchmarks/e2e_results.json under
"transport_ab" and prints a summary line.
"""

from __future__ import annotations

import argparse
import json
import shutil
import time
from pathlib import Path

HERE = Path(__file__).resolve().parent


def run_leg(imgs, out, config: str, transport: bool, chunk_paths):
    """Process chunk_paths (a list of file lists) through one engine
    config; returns (wall_seconds, d2h_full, d2h_fetched, n_outputs)."""
    from image_processor_pipeline_tpu import (
        ProcessingPipeline, ProcessingStep,
    )

    if config == "symmetry":
        from image_processor_pipeline_tpu.transforms import (
            GenerateSymmetries,
        )

        tr = GenerateSymmetries()
        opts = {"device_encode": transport, "device_decode": transport,
                "native_compute": False}
    elif config == "chain":
        from image_processor_pipeline_tpu.transforms.fused import (
            ColorMask, Enhance, Flip, FusedChain, Rotate,
        )

        tr = FusedChain([Rotate(method="shear"), Flip(),
                         ColorMask([((0, 40, 40), (20, 255, 255))]),
                         Enhance()])
        opts = {"output_suffix": ".jpg", "device_encode": transport,
                "native_compute": False}
    else:
        raise ValueError(config)

    wall = 0.0
    full = fetched = nout = 0
    for chunk in chunk_paths:
        cdir = imgs.parent / "chunk"
        shutil.rmtree(cdir, ignore_errors=True)
        cdir.mkdir()
        for p in chunk:
            (cdir / p.name).symlink_to(p)
        shutil.rmtree(out, ignore_errors=True)
        pipe = ProcessingPipeline(root_dir=imgs.parent)
        step = ProcessingStep(
            "ab", tr, input_dirs=["chunk"], output_dirs=[str(out)],
            pairing_method="one_input", seed=7, options=opts)
        pipe.add_step(step)
        t0 = time.perf_counter()
        counters = pipe.run(progress=False)
        wall += time.perf_counter() - t0
        assert counters[0].get("Success", 0) == len(chunk), counters
        full += step.metrics.d2h_bytes_full
        fetched += step.metrics.d2h_bytes_fetched
        nout += sum(1 for _ in out.iterdir())
    return wall, full, fetched, nout


def _make_fixed_dataset(root: Path, n: int, px: int, seed: int = 5):
    """make_photo_dataset's content recipe at ONE fixed square size."""
    import numpy as np
    from PIL import Image

    imgs = root / "imgs"
    meta = f"fixed:{n}:{px}:{seed}"
    meta_f = root / "imgs.meta"
    if imgs.exists():
        if meta_f.exists() and meta_f.read_text() == meta:
            return imgs
        shutil.rmtree(imgs)
        meta_f.unlink(missing_ok=True)
    imgs.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    h = w = px
    gy = np.linspace(0, 255, h)[:, None]
    gx = np.linspace(0, 255, w)[None, :]
    yy, xx = np.mgrid[0:h, 0:w]
    for i in range(n):
        ph = rng.uniform(0, 2 * np.pi)
        f0 = np.stack([
            np.broadcast_to(gy, (h, w)),
            np.broadcast_to(gx, (h, w)),
            127 + 120 * np.sin(2 * np.pi * (gy + gx) / 510 + ph),
        ], axis=-1).copy()
        for _ in range(4):
            cy, cx = rng.integers(0, h), rng.integers(0, w)
            r = int(rng.integers(20, 90))
            m = ((yy - cy) ** 2 + (xx - cx) ** 2) < r * r
            f0[m] = rng.integers(0, 256, 3)
        Image.fromarray(f0.astype(np.uint8)).save(
            imgs / f"im{i:05d}.jpg", quality=92)
    meta_f.write_text(meta)
    return imgs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", choices=("chain", "symmetry"),
                    default="symmetry")
    ap.add_argument("--n", type=int, default=120)
    ap.add_argument("--chunks", type=int, default=6)
    ap.add_argument("--root", default="/tmp/ipp_tunnel_ab")
    ap.add_argument("--fixed-size", type=int, default=None, metavar="PX",
                    help="square PX images instead of the harness's "
                         "300-700px spread — ONE canvas bucket, so the "
                         "run measures steady-state transport instead of "
                         "per-shape XLA compiles through the tunnel "
                         "(each distinct (canvas, batch-len) costs a "
                         "20-60s remote compile; the mixed-size dataset "
                         "pays ~30 of them over n=120)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke runs; the image's "
                         "sitecustomize pins JAX_PLATFORMS=axon)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import sys

    sys.path.insert(0, str(HERE.parent))
    from e2e_vs_reference import make_photo_dataset  # noqa: E402

    root = Path(args.root)
    root.mkdir(parents=True, exist_ok=True)
    if args.fixed_size:
        imgs = _make_fixed_dataset(root, args.n, args.fixed_size)
    else:
        imgs = make_photo_dataset(root, args.n)
    paths = sorted(imgs.iterdir())[: args.n]
    k = max(1, len(paths) // args.chunks)
    chunks = [paths[i:i + k] for i in range(0, len(paths), k)]

    import jax

    backend = jax.default_backend()
    # warm both legs' compiles OUTSIDE the timed window with one FULL
    # chunk: the engine's batch-ladder shapes depend on chunk length, so
    # a truncated warm-up would leave the real shapes cold
    warm = [chunks[0]]
    for transport in (True, False):
        run_leg(imgs, root / "out", args.config, transport, warm)

    # interleaved: transport/control alternate chunk by chunk
    on = {"wall": 0.0, "full": 0, "fetch": 0, "out": 0}
    off = dict(on)
    pairs = []
    for c in chunks:
        w_on, f_on, g_on, n_on = run_leg(
            imgs, root / "out_on", args.config, True, [c])
        w_off, f_off, g_off, n_off = run_leg(
            imgs, root / "out_off", args.config, False, [c])
        pairs.append((w_on, w_off))
        for d, vals in ((on, (w_on, f_on, g_on, n_on)),
                        (off, (w_off, f_off, g_off, n_off))):
            d["wall"] += vals[0]
            d["full"] += vals[1]
            d["fetch"] += vals[2]
            d["out"] += vals[3]
        print(f"chunk({len(c)}): on {w_on:.1f}s / off {w_off:.1f}s "
              f"({w_off / w_on:.2f}x)", flush=True)

    import statistics

    med = statistics.median(wo / wn for wn, wo in pairs)
    name = (f"{args.config}_fixed{args.fixed_size}"
            if args.fixed_size else args.config)
    row = {
        "backend": backend,
        "n": len(paths),
        "chunks": len(chunks),
        "transport_wall_s": round(on["wall"], 1),
        "control_wall_s": round(off["wall"], 1),
        "speedup": round(off["wall"] / on["wall"], 2),
        "speedup_median_chunk": round(med, 2),
        "transport_d2h_mb": round(on["fetch"] / 1e6, 1),
        "control_d2h_mb": round(off["fetch"] / 1e6, 1),
        "outputs": on["out"],
    }
    print(json.dumps({name: row}))
    res_f = HERE / "e2e_results.json"
    res = json.loads(res_f.read_text())
    res.setdefault("transport_ab", {})[name] = row
    res_f.write_text(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
