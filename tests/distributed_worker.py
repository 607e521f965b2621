"""Worker process for the multi-process distributed integration test.

Usage: python distributed_worker.py <coordinator> <nproc> <pid> <root>

Initializes jax.distributed over CPU (2 local virtual devices per process),
runs a host-sharded batched step over the shared dataset, writes the
per-host JSON report, and psums a cross-process item counter over a global
mesh (real DCN-path collective, gloo/XLA CPU backend).
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
).strip()


def main():
    coordinator, nproc, pid, root = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), Path(sys.argv[4])
    )
    import jax

    jax.config.update("jax_platforms", "cpu")

    from image_processor_pipeline_tpu.parallel.distributed import (
        global_counter,
        initialize_distributed,
    )

    initialize_distributed(
        coordinator_address=coordinator, num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc, jax.process_count()
    n_devices = len(jax.devices())
    assert n_devices == 2 * nproc, jax.devices()

    from image_processor_pipeline_tpu import ProcessingStep
    from image_processor_pipeline_tpu.transforms.crop_square import (
        SquareCropAroundBBox,
    )

    step = ProcessingStep(
        name="crop",
        process_function=SquareCropAroundBBox(),
        input_dirs=[root / "imgs", root / "labels"],
        output_dirs=[root / "out/i", root / "out/l"],
        pairing_method="zip",
        seed=11,
        save_log=True,
        host_sharded=True,
        # in-process mesh over THIS process's 2 local devices, composed
        # with the cross-process host sharding; pins the local_devices
        # mesh fix (the global jax.devices() list starts with process 0's
        # devices, which process 1 cannot dispatch to) — jit path so the
        # mesh is actually exercised
        mesh="auto",
        options={"native_compute": False},
    )
    counter = step.run(progress=False)
    local = sum(counter.values())

    # cross-process collective: psum the per-host item count over a global
    # 1-D mesh spanning both processes' devices
    from jax.sharding import Mesh
    import numpy as np

    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    total = global_counter(local, mesh)
    print(f"WORKER {pid}: local={local} global={total}", flush=True)
    assert total == 6, total

    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
