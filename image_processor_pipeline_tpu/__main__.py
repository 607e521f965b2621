"""CLI: run a pipeline described by a JSON config.

Usage:
    python -m image_processor_pipeline_tpu run CONFIG.json [--from-step K]
        [--only-one] [--cpu]
    python -m image_processor_pipeline_tpu bench [--quick]

(The reference is notebook-driven with no CLI; this is a convenience layer
over config.build_pipeline.)
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(prog="image_processor_pipeline_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    runp = sub.add_parser("run", help="run a JSON pipeline config")
    runp.add_argument("config")
    runp.add_argument("--from-step", type=int, default=0)
    runp.add_argument("--only-one", action="store_true")
    runp.add_argument("--cpu", action="store_true",
                      help="force the JAX CPU backend")

    benchp = sub.add_parser("bench", help="run the flagship chain benchmark")
    benchp.add_argument("--quick", action="store_true")

    args = ap.parse_args(argv)

    if args.cmd == "run":
        if args.cpu:
            import jax

            jax.config.update("jax_platforms", "cpu")
        from image_processor_pipeline_tpu.config import build_pipeline

        pipe = build_pipeline(args.config)
        counters = pipe.run(
            from_step_index=args.from_step, only_one=args.only_one
        )
        failed = sum(
            c.get("Error", 0) + c.get("Submission Error", 0) for c in counters
        )
        return 1 if failed else 0

    if args.cmd == "bench":
        import subprocess
        from pathlib import Path

        bench = Path(__file__).parent.parent / "bench.py"
        cmd = [sys.executable, str(bench)] + (
            ["--quick"] if args.quick else []
        )
        return subprocess.call(cmd)
    return 0


if __name__ == "__main__":
    sys.exit(main())
