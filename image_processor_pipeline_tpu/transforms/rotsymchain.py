"""Fused rotations → symmetries → chain tail: (N+1)×S fan-out, ONE step.

Completes the fusion lattice: ``auto_fuse`` previously collapsed
rot→sym→mask→cleanup into TWO steps (a fan-out ``RotationsSymmetries``
pair plus a ``FusedChain`` tail), still materializing the (N+1)×S
symmetry PNGs between them.  This transform runs the whole run in one
step: decode once, rotate N times, apply every selected dihedral to each
rotation ON DEVICE, push all (N+1)×S variants through the deterministic
stage tail, and encode only the final results.

Byte-parity argument (the rotsym + rotchain arguments composed):

- the rotations half inherits RandomRotations wholesale (same seed tree
  over the same inventory — transforms/rotchain.py:12-30);
- the symmetry selection is the DETERMINISTIC byte-tier set (whole pool,
  ``include_original`` appending 'o' — reference symmetry.py:122-126;
  the byte tier declines sub-pool sampling, which ``auto_fuse="rng"``
  fuses via ``sym_sample`` instead), and the flips themselves are
  pure pixel permutations applied valid-region-aware
  (ops/geometry.py:dihedral) to the exact pixels the standalone
  symmetry step would have re-decoded from the lossless intermediate;
- the tail stages (ColorMask with ``input_alpha='replace'``, Cleanup,
  FitCrop — everything fuse._translators emits) are DETERMINISTIC and
  consume no RNG, so each fused (rotation, sym) slot computes exactly
  what the standalone tail computed from the file
  ``{stem}_{rotkey}_{sym}.png``;
- naming rides through: the final files keep that name, and the final
  encoder matches the last stage's reference anchor.

Per-slot statuses coarsen as in the other fused fan-outs: one status per
INPUT item; a (rotation, sym) slot whose tail empties (cleanup's "no
opaque pixels") is skipped with a warning — the standalone run would
have error'd that one file and written nothing.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple
import numpy as np
import jax
import jax.numpy as jnp

from image_processor_pipeline_tpu.transforms.rotations import (
    RandomRotations,
    _rotate_one,
)
from image_processor_pipeline_tpu.transforms.rotchain import (
    RotationsChain,
    _TAIL_SALT,
)
from image_processor_pipeline_tpu.transforms.fused import (
    chain_native_exec,
    native_program,
)
from image_processor_pipeline_tpu.transforms.symmetry import ALL_SYMS
from image_processor_pipeline_tpu.ops import geometry


class RotSymChain(RotationsChain):
    """RandomRotations ∘ dihedral fan-out ∘ deterministic FusedChain tail.

    ``syms`` is the STATIC selection the standalone symmetry step would
    save (whole pool in order, plus 'o' appended when the pool misses it
    and ``include_original`` was set — computed by the fuser; direct
    users pass it explicitly).  Only draw-free tails are representable:
    the device tree would need a per-(item, slot, sym, stage) convention
    that no standalone run defines, so Rotate/Flip/Enhance stages raise.

    ``sym_sample=(pool, k, include_original)`` (the ``auto_fuse="rng"``
    tier's sub-pool relaxation): the device program still computes the
    full ``syms`` SUPERSET per slot (static shapes — the unselected
    variants are wasted compute bounded by ``len(syms)/k``), and
    save_item emits only the subset the shared per-(item, rotation) tree
    draws (rotsym.select_syms — the same subsets a fused
    RotationsSymmetries pair selects for the same seeds).
    Distribution-equal, never byte-equal: the standalone symmetry step
    seeds per intermediate-file index.
    """

    max_batch = 4  # (N+1) x S output canvases per item

    def __init__(self, stages: Sequence, syms: Sequence[str],
                 sym_sample: Optional[Tuple] = None):
        RotationsChain.__init__(self, stages)
        from image_processor_pipeline_tpu.transforms.fused import (
            Enhance,
            Flip,
        )

        if any(isinstance(s, (Flip, Enhance)) for s in self.stages):
            raise ValueError(
                "RotSymChain tails must be draw-free (no Flip/Enhance)")
        self.syms = tuple(syms)
        self.sym_sample = sym_sample
        invalid = [s for s in self.syms if s not in ALL_SYMS]
        if invalid:
            raise ValueError(f"invalid symmetries: {invalid}")
        if not self.syms:
            raise ValueError("syms must be non-empty")
        if sym_sample is not None:
            pool, k, _ = sym_sample
            missing = [s for s in pool if s not in self.syms]
            if missing or not 0 <= int(k) <= len(pool):
                raise ValueError(
                    f"sym_sample pool {pool}/k={k} outside syms superset "
                    f"{self.syms}")
        self._sym_index = {s: j for j, s in enumerate(self.syms)}

    def static_args(self, options: Dict, key: Tuple) -> Tuple:
        return RotationsChain.static_args(self, options, key) + self.syms

    def device_fn(self, batch, static):
        num_rotations, angle_min, angle_max, method, interpolation = \
            static[:5]
        stages = self.stages
        syms = self.syms

        def one(img, size, seed):
            rot = _rotate_one(img, size[0], size[1], seed, num_rotations,
                              angle_min, angle_max, method, interpolation)
            imgs = jnp.concatenate([img[None], rot["images"]], axis=0)
            hs = jnp.concatenate(
                [size[0:1], rot["heights"].astype(size.dtype)])
            ws = jnp.concatenate(
                [size[1:2], rot["widths"].astype(size.dtype)])
            key = jax.random.PRNGKey(seed)

            def tail(im, h, w, slot):
                # the tail stages are draw-free (enforced in __init__),
                # but the fold_in tree matches RotationsChain's so a
                # future draw-bearing extension has a defined convention
                k = jax.random.fold_in(key, _TAIL_SALT + slot)
                outs, ohs, ows = [], [], []
                for j, sym in enumerate(syms):  # static fan-out
                    im2 = geometry.dihedral(im, h, w, sym)
                    h2, w2 = h, w
                    kj = jax.random.fold_in(k, 1000 + j)
                    for i, st in enumerate(stages):
                        im2, h2, w2 = st.apply(
                            im2, h2, w2, jax.random.fold_in(kj, i))
                    outs.append(im2)
                    ohs.append(h2)
                    ows.append(w2)
                return (jnp.stack(outs), jnp.stack(ohs), jnp.stack(ows))

            outs, oh, ow = jax.vmap(tail)(
                imgs, hs, ws, jnp.arange(num_rotations + 1))
            return {"images": outs, "heights": oh, "widths": ow,
                    "pre_heights": hs, "pre_widths": ws}

        return jax.vmap(one)(batch["image"], batch["size"], batch["seed"])

    # -- native CPU twin ----------------------------------------------------

    def native_fn(self, batch, static, options, n_threads=1):
        """PIL-exact rotations twin + numpy dihedral views + the C++
        chain executor over the stacked (slot, sym) variants.  The tail
        is draw-free, so the executor's draw arrays are empty — the
        outputs are byte-identical to the device program wherever the
        rotation pixels are (slot 0 always; rotated slots by the
        documented PIL-exact-vs-f32 rotations contract)."""
        from image_processor_pipeline_tpu.ops import native_cpu

        if not native_cpu.available() or native_program(self.stages) is None:
            return None
        rot = RandomRotations.native_fn(
            self, batch, static[:5], options, n_threads)
        if rot is None:
            return None
        imgs = np.asarray(batch["image"], np.uint8)
        B, H, W = imgs.shape[:3]
        R = rot["images"].shape[1]
        S = R + 1
        K = len(self.syms)
        base = np.concatenate(
            [imgs[:, None], rot["images"]], axis=1)  # [B, S, H, W, 4]
        sizes = np.empty((B, S, 2), np.int32)
        sizes[:, 0] = np.asarray(batch["size"], np.int32)
        sizes[:, 1:, 0] = rot["heights"]
        sizes[:, 1:, 1] = rot["widths"]

        flat = np.zeros((B * S * K, H, W, base.shape[-1]), np.uint8)
        flat_sizes = np.empty((B * S * K, 2), np.int32)
        idx = 0
        for b in range(B):
            for s in range(S):
                h, w = int(sizes[b, s, 0]), int(sizes[b, s, 1])
                valid = base[b, s, :h, :w]
                for sym in self.syms:
                    v = valid
                    if sym in ("h", "hv"):
                        v = v[:, ::-1]
                    if sym in ("v", "hv"):
                        v = v[::-1]
                    flat[idx, :h, :w] = v
                    flat_sizes[idx] = (h, w)
                    idx += 1
        empty = [np.zeros((B * S * K, 0), np.int32),
                 np.zeros((B * S * K, 0, H), np.int32),
                 np.zeros((B * S * K, 0, H), np.int32),
                 np.zeros((B * S * K, 0), np.int32),
                 np.zeros((B * S * K, 0, 7), np.float32),
                 np.zeros((B * S * K, 0, 2), np.uint8)]
        res = chain_native_exec(
            self.stages, flat, flat_sizes, empty, n_threads)
        if res is None:
            return None
        outs, osz = res
        return {
            "images": outs.reshape(B, S, K, H, W, outs.shape[-1]),
            "heights": osz[:, 0].reshape(B, S, K),
            "widths": osz[:, 1].reshape(B, S, K),
            "pre_heights": sizes[..., 0],
            "pre_widths": sizes[..., 1],
        }

    # -- save ---------------------------------------------------------------

    def save_item(
        self,
        out: Dict[str, np.ndarray],
        item: Dict,
        output_dirs: Sequence[Path],
        options: Dict,
    ) -> Optional[List[Path]]:
        if not output_dirs:
            print("[rotsymchain] no output dir provided")
            return None
        target = Path(output_dirs[0])
        stem = Path(item["_args"][0]).stem
        bands = options.get("output_bands")
        encoder = self._tail_encoder()

        saved: List[Path] = []
        # slot skip rules + naming + per-slot tolerance shared with
        # RotationsChain (_slot_keys/_emit); only the sym fan-out is new
        from image_processor_pipeline_tpu.transforms.rotsym import (
            select_syms,
        )

        for slot, rkey in self._slot_keys(out, options):
            for sym in select_syms(self.syms, self.sym_sample,
                                   item["_seed"], slot):
                j = self._sym_index[sym]
                self._emit(encoder, out["images"][slot][j],
                           int(out["heights"][slot][j]),
                           int(out["widths"][slot][j]), bands,
                           target / f"{stem}_{rkey}_{sym}.png", saved)
        if not saved:
            return None
        return saved
