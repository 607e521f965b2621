"""Multi-host scaling helpers (SURVEY.md §5.8 / §2.5).

The reference's parallelism ends at one host's process pool
(reference pipeline.py:358-433).  On a TPU pod slice, the equivalent is:

  - `initialize_distributed()`: jax.distributed.initialize — DCN handles
    job-level control, ICI carries any collective traffic.
  - `host_shard()`: deterministic per-host split of a file list — each host
    decodes only the items its addressable devices will consume, mirroring
    "each worker process owns its items" from the reference's pool.
  - `global_counter()`: psum a per-host count over the mesh (the distributed
    version of the reference's status Counter, pipeline.py:290).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, TypeVar

import jax

T = TypeVar("T")


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the multi-host runtime (no-op when single-process)."""
    if jax.process_count() > 1:
        return  # already initialized by the launcher
    if coordinator_address is None and num_processes is None:
        return  # single-host run
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def host_shard(items: Sequence[T],
               process_id: Optional[int] = None,
               process_count: Optional[int] = None) -> List[T]:
    """The contiguous slice of ``items`` this host is responsible for.

    Deterministic given the (sorted) item list, so every host agrees on the
    partition without communication.
    """
    pid = jax.process_index() if process_id is None else process_id
    n = jax.process_count() if process_count is None else process_count
    total = len(items)
    base = total // n
    rem = total % n
    start = pid * base + min(pid, rem)
    stop = start + base + (1 if pid < rem else 0)
    return list(items[start:stop])


def global_counter(local_count: int, mesh, axis: str = "data"):
    """psum a host-local count across the mesh (replicated result)."""
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    fn = shard_map(
        lambda x: jax.lax.psum(x, axis),
        mesh=mesh,
        in_specs=P(axis),
        out_specs=P(),
       
    )
    n = mesh.shape[axis]
    arr = jnp.zeros((n,), jnp.int32).at[0].set(local_count)
    return int(fn(arr)[0])
