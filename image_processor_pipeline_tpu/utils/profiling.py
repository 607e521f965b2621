"""Tracing / profiling / metrics (SURVEY.md §5.1, §5.5).

The reference's only observability is tqdm items/sec and print lines
(reference pipeline.py:316-321, 300-302).  Here:

  - StageMetrics: structured per-stage wall-clock, item counts, items/sec,
    device vs host time split — attached to every ProcessingStep run and
    included in the JSON run report.
  - device_trace(): context manager around jax.profiler.trace for XPlane
    traces viewable in TensorBoard/Perfetto.
  - Timer: tiny scoped wall-clock helper.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass
from typing import Dict, Optional


@dataclass
class StageMetrics:
    name: str = ""
    items: int = 0
    wall_seconds: float = 0.0
    host_load_seconds: float = 0.0
    device_seconds: float = 0.0
    host_save_seconds: float = 0.0
    batches: int = 0
    compiles: int = 0
    output_collisions: int = 0
    #: device→host bytes: full-canvas size vs actually fetched after the
    #: shrink_output hook (0/0 when the transform doesn't shrink)
    d2h_bytes_full: int = 0
    d2h_bytes_fetched: int = 0

    @property
    def items_per_second(self) -> float:
        return self.items / self.wall_seconds if self.wall_seconds > 0 else 0.0

    def as_dict(self) -> Dict:
        return {
            "name": self.name,
            "items": self.items,
            "wall_seconds": round(self.wall_seconds, 4),
            "items_per_second": round(self.items_per_second, 2),
            "host_load_seconds": round(self.host_load_seconds, 4),
            "device_seconds": round(self.device_seconds, 4),
            "host_save_seconds": round(self.host_save_seconds, 4),
            "batches": self.batches,
            "output_collisions": self.output_collisions,
            "d2h_bytes_full": self.d2h_bytes_full,
            "d2h_bytes_fetched": self.d2h_bytes_fetched,
        }


class Timer:
    """Scoped wall-clock accumulator: ``with timer.measure('load'): ...``"""

    def __init__(self):
        self.totals: Dict[str, float] = {}

    @contextlib.contextmanager
    def measure(self, key: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[key] = self.totals.get(key, 0.0) + (
                time.perf_counter() - t0
            )


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]):
    """jax.profiler trace when ``log_dir`` is set; no-op otherwise."""
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(str(log_dir)):
        yield


def enable_compilation_cache(cache_dir) -> None:
    """Persist compiled XLA programs across processes.

    Point every run at the same directory and repeat runs skip compilation
    entirely — the biggest wall-clock lever for short pipelines, especially
    where compiles are remote (tunneled TPU) or the canvas-bucket fan-out
    compiles many program variants.
    """
    import jax

    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
