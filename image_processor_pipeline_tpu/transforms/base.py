"""BatchTransform: the device-transform protocol the stage engine drives.

A BatchTransform splits the reference's per-file monolith
(load → compute → save, e.g. crop_square.py:104-224) into three phases:

  load_item   host: decode inputs → numpy arrays + metadata (per item)
  device_fn   device: one jit-compiled program over a stacked batch
  save_item   host: encode/save one item's slice of the batch output

The engine (pipeline.ProcessingStep._run_batched) buckets items by
``bucket_key`` (canvas shape and anything else that changes array shapes),
stacks each bucket, and calls ``run_batch``.  Per-item RNG seeds are
engine-provided so results don't depend on batch composition.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp


class BatchTransform:
    """Subclass and implement load_item / stack_batch / device_fn / save_item."""

    max_batch: int = 64

    #: transforms whose save_item reads ``item["image"]`` (the decoded
    #: input) must set this so the engine keeps decoding on the host —
    #: the hybrid device-decode path never materializes per-item pixels
    save_needs_image = False

    def needs_host_image(self, chunk, options) -> bool:
        """Per-bucket refinement of ``save_needs_image``: the engine asks
        this before enabling the hybrid device decode for a chunk.  A
        transform whose save path can source the input from the DEVICE
        for some buckets (e.g. symmetry's 'o' copy via the coefficient
        transport on all-.jpg buckets) overrides this to return False
        there, making the run fully codec-to-codec."""
        return self.save_needs_image

    # -- host: per-item decode -------------------------------------------
    def load_item(self, inputs: Tuple, options: Dict) -> Dict[str, Any]:
        raise NotImplementedError

    def probe_item(self, inputs: Tuple, options: Dict) -> Optional[Dict[str, Any]]:
        """Optional metadata-only load (native header probe, labels — no
        pixel decode).  A probed item must contain everything load_item
        produces EXCEPT ``image``, plus ``_decode = (path, mode, diag)``;
        the engine then decodes whole buckets with one native threaded
        batch-decode call (io/images.py:fill_pending_images) instead of
        per-item decodes through Python threads.

        Transforms with SEVERAL pixel fields per item (e.g. overlay +
        background) instead set ``_pending = {field: (path, mode, diag,
        canvas, h, w)}`` and omit those fields; each (canvas, mode) group
        decodes with one native call (io/images.py:_fill_pending_multi).

        Return None to fall back to load_item (default).
        """
        return None

    # -- bucketing --------------------------------------------------------
    def bucket_key(self, item: Dict, options: Dict) -> Tuple:
        """Hashable key; items with equal keys may share one device program."""
        return item["canvas"]

    # -- device -----------------------------------------------------------
    def stack_batch(self, chunk: List[Dict], options: Dict) -> Dict[str, np.ndarray]:
        """Stack per-item arrays into batch arrays (default: every ndarray
        field not starting with '_' is stacked).

        When the native batch decoder already produced the whole chunk in
        one stacked array (io/images.py:fill_pending_images fast path,
        exposed as ``chunk[0]['_prestacked_image']``), the image field is
        passed through without the np.stack copy.
        """
        out = {}
        pre = chunk[0].get("_prestacked_image")
        if pre is not None and len(pre) == len(chunk):
            # host fast path (numpy) or hybrid device decode (jax array —
            # already resident, jit consumes it without an H2D copy); the
            # per-item dicts may then carry no "image" field at all
            out["image"] = pre
        for k, v in chunk[0].items():
            if k.startswith("_") or k == "canvas" or k in out:
                continue
            if isinstance(v, (np.ndarray, np.generic, int, float, bool)):
                out[k] = np.stack([np.asarray(it[k]) for it in chunk], axis=0)
        out["seed"] = np.asarray([it["_seed"] for it in chunk], np.uint32)
        return out

    def device_fn(self, batch: Dict[str, jnp.ndarray], static: Tuple) -> Dict[str, jnp.ndarray]:
        raise NotImplementedError

    def native_fn(self, batch: Dict[str, np.ndarray], static: Tuple,
                  options: Dict, n_threads: int = 1
                  ) -> Optional[Dict[str, np.ndarray]]:
        """Optional native CPU twin of device_fn (bit-exact, numpy in/out).

        The engine routes batches here instead of the jit path when the
        native CPU compute backend is active (options["native_compute"]:
        True, or the default "auto" = on when the JAX backend is `cpu` —
        accelerator-less hosts run tight C++ loops instead of interpreting
        the same math through XLA-on-one-core; see ops/native_cpu.py).
        Return None to fall back to the jit path (default, and whenever
        the native library is unavailable).
        """
        return None

    def static_args(self, options: Dict, key: Tuple) -> Tuple:
        """Hashable static configuration passed to device_fn."""
        return ()

    # -- host: per-item save ----------------------------------------------
    def save_item(
        self,
        out: Dict[str, np.ndarray],
        item: Dict,
        output_dirs: Sequence,
        options: Dict,
    ) -> Optional[List]:
        raise NotImplementedError

    # -- engine glue --------------------------------------------------------
    _jit_cache: Dict = None
    _shard_jit_cache: Dict = None

    def _jitted(self):
        # keyed to the EXACT class (__dict__, not attribute lookup): a
        # subclass overriding device_fn/static_args must not inherit its
        # parent's populated cache (RotationsChain vs RandomRotations)
        cls = type(self)
        if cls.__dict__.get("_jit_cache") is None:
            cls._jit_cache = jax.jit(cls.device_fn, static_argnums=(0, 2))
        return cls._jit_cache

    def _jitted_sharded(self, mesh):
        """jit of device_fn with every batch array sharded on its leading
        axis over the mesh's ``data`` axis — in-process data parallelism:
        each local device computes its own sub-batch (the workload is
        per-image independent, so XLA partitions the vmapped program with
        zero collectives).  This is the reference's ``workers=-1``
        all-cores fan-out (reference pipeline.py:85-90) mapped to chips."""
        from jax.sharding import NamedSharding, PartitionSpec

        cls = type(self)
        if cls.__dict__.get("_shard_jit_cache") is None:
            cls._shard_jit_cache = {}
        fn = cls._shard_jit_cache.get(mesh)
        if fn is None:
            sh = NamedSharding(mesh, PartitionSpec("data"))
            fn = jax.jit(
                cls.device_fn, static_argnums=(0, 2), in_shardings=(sh,)
            )
            cls._shard_jit_cache[mesh] = fn
        return fn

    def launch_batch(self, key: Tuple, chunk: List[Dict], options: Dict,
                     mesh=None):
        """Stack + dispatch one batch to the device(s) WITHOUT blocking.

        Returns the device output pytree; materialize with
        ``materialize_batch`` (typically from a saver thread) so encode of
        batch N overlaps device compute of batch N+1.  With ``mesh``, the
        batch axis is sharded over the mesh's ``data`` axis (the engine
        pads the chunk to a multiple of the axis size).
        """
        arrays = self.stack_batch(chunk, options)
        static = self.static_args(options, key)
        fn = self._jitted() if mesh is None else self._jitted_sharded(mesh)
        return fn(self, {k: jnp.asarray(v) for k, v in arrays.items()}, static)

    def launch_batch_native(self, key: Tuple, chunk: List[Dict],
                            options: Dict, n_threads: int = 1):
        """Stack + run one batch through the native CPU backend.

        Returns a numpy output pytree (already host-resident — the engine's
        async-copy/materialize steps are no-ops on it), or falls back to
        the jit path when native_fn declines (library unavailable)."""
        arrays = self.stack_batch(chunk, options)
        static = self.static_args(options, key)
        arrays = {k: np.asarray(v) for k, v in arrays.items()}
        out = self.native_fn(arrays, static, options, n_threads)
        if out is None:
            fn = self._jitted()
            return fn(self, {k: jnp.asarray(v) for k, v in arrays.items()},
                      static)
        return out

    #: transforms that override shrink_output set this so the engine defers
    #: the async D2H kick to the saver thread (the shrink must run first)
    shrinks_output = False

    def shrink_output(self, out_dev, chunk: List[Dict], options: Dict):
        """Optional device-side output shrink before the D2H copy (runs in
        the saver thread, where blocking on this batch is free — the next
        batch's compute is already queued).  Default: pass through."""
        return out_dev

    @staticmethod
    def start_host_copy(out_dev) -> None:
        """Kick off async device→host copies for a dispatched batch, so the
        DMA overlaps the next batch's compute and materialize_batch's
        device_get finds the data already on host."""
        def _async(x):
            start = getattr(x, "copy_to_host_async", None)
            if start is not None:
                start()
        jax.tree_util.tree_map(_async, out_dev)

    @staticmethod
    def materialize_batch(out_dev, n: int) -> List[Dict]:
        out_np = jax.device_get(out_dev)
        return [{k: v[i] for k, v in out_np.items()} for i in range(n)]

    def run_batch(self, key: Tuple, chunk: List[Dict], options: Dict) -> List[Dict]:
        out = self.launch_batch(key, chunk, options)
        return self.materialize_batch(out, len(chunk))

    # helper for subclasses
    @staticmethod
    def keys_from_seeds(seeds):
        return jax.vmap(lambda s: jax.random.PRNGKey(s.astype(jnp.uint32)))(seeds)
