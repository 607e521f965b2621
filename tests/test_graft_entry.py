"""The driver's entry contract: __graft_entry__.dryrun_multichip(8) must pass
when invoked exactly as the driver invokes it — a fresh process with the
image's default environment (JAX_PLATFORMS pinned to the axon TPU platform),
a direct import, and a direct call. Round-1 failed precisely here
(MULTICHIP_r01.json ok=false): the function did not force the CPU backend
itself and initialized the pinned TPU platform.
"""

import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_dryrun_multichip_as_the_driver_calls_it():
    # Start from the *real* process environment minus the CPU overrides the
    # test conftest adds — i.e. the driver's world, where JAX_PLATFORMS may
    # be pinned to a TPU platform and XLA_FLAGS is unset.
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)  # sitecustomize/kernel env re-pins axon
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "import __graft_entry__ as g; g.dryrun_multichip(8)",
        ],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    assert "dryrun_multichip OK" in proc.stdout


def test_dryrun_multichip_inprocess_after_jax_import():
    # Robust to jax being already imported (the conftest imported it) — the
    # function must still find >=8 CPU devices via config update/clear.
    sys.path.insert(0, str(REPO))
    try:
        import __graft_entry__ as g

        g.dryrun_multichip(8)
    finally:
        sys.path.remove(str(REPO))
