"""Fused rotations → chain tail: N+1 fan-out through FusedChain stages.

The reference runs rotations and every downstream transform as separate
disk-materialized stages (rotations.py:88-119 writes each rotation;
filtres_liste.py:41-149 / pixels_isolés.py:8-81 / recadrages.py:63-82
then re-decode every file).  This transform composes them: decode the
input once, rotate N times in one batched program, push the original and
every rotation through the stage tail ON DEVICE, and encode only the
final results — the N+1 intermediate encodes *and* re-decodes per elided
stage disappear.

Byte-parity argument (what makes ``auto_fuse`` of rotations → a run of
DETERMINISTIC steps byte-safe — the generalization of
transforms/rotsym.py's fan-out argument):

- the rotations half inherits RandomRotations wholesale — same per-item
  seed tree (fold_in of the step seed the fuser copies from the rotations
  step, over the SAME input inventory), same device program, same
  PIL-exact native twin — so the rotated pixels are identical to what the
  standalone step would have encoded;
- the elided intermediates are ``output_format='png'`` (enforced by the
  fuser): lossless, so each standalone downstream step would have decoded
  exactly those pixels back;
- the tail stages translated by the fuser (ColorMask with
  ``input_alpha='replace'``, Cleanup, FitCrop) are DETERMINISTIC given
  their input pixels — no RNG tree to replicate;
- naming rides through: every standalone tail step keeps its input's
  name, so the final files are ``{stem}_{rotation_key}.png`` exactly as
  the unfused run produces, and the final encoder matches the last
  stage's reference anchor (Stage.pil_anchored).

Per-slot statuses necessarily coarsen (the chain-fusion contract): a
standalone tail step fails PER FILE (e.g. cleanup's "no opaque pixels"
RuntimeError leaves that one file missing), while the fused step logs one
status per INPUT item — a slot whose tail empties is skipped with a
warning and the item still counts Success if any slot saved.

RNG tail stages (Enhance) are reachable through ``auto_fuse="rng"`` or
direct use: each slot then draws from a per-(item, slot, stage) tree —
fold_in(fold_in(PRNGKey(item seed), _TAIL_SALT + slot), stage index) —
equally DISTRIBUTED but not byte-comparable to a standalone run, which
seeds per intermediate-file index.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple
from warnings import warn

import numpy as np
import jax
import jax.numpy as jnp

from image_processor_pipeline_tpu.transforms.rotations import (
    RandomRotations,
    _rotate_one,
)
from image_processor_pipeline_tpu.transforms.fused import (
    Rotate,
    chain_native_exec,
    native_program,
    stage_draw_lists,
)
from image_processor_pipeline_tpu.io.images import (
    encode_image,
    encode_image_pil,
)

#: disambiguates the per-slot tail keys from the direct uses of the item
#: key (_rotate_one consumes PRNGKey(seed) itself for the angle draws)
_TAIL_SALT = 101


def tail_encoder(stages):
    """The final file follows the LAST stage's reference encoder anchor
    (FusedChain.save_item's rule): PIL Image.save for enhance/fit-crop
    tails, cv2.imwrite for mask/cleanup/border.  Shared by every fan-out
    fused transform (RotationsChain/RotSymChain/SymmetriesChain)."""
    return (encode_image
            if stages and not stages[-1].pil_anchored
            else encode_image_pil)


def emit_slot(encoder, img, bh: int, bw: int, bands, p: Path,
              saved: List[Path]) -> None:
    """Write one tail output with the shared per-slot tolerance: an
    empty tail result means the standalone step error'd that ONE file
    (e.g. cleanup's 'no opaque pixels') and wrote nothing."""
    if bh <= 0 or bw <= 0:
        warn(f"chain tail produced empty content for {p.name}; "
             f"skipping")
        return
    img = img[:bh, :bw]
    if bands:
        img = img[..., :int(bands)]
    try:
        encoder(img, p)
        saved.append(p)
    except Exception as e:  # noqa: BLE001 — per-slot tolerance
        warn(f"failed to save {p.name}: {e}")


class RotationsChain(RandomRotations):
    """RandomRotations ∘ FusedChain-stage tail in one step (fan-out N+1).

    Compute: the inherited rotations program produces the N rotations;
    the original and every rotation then run the ``stages`` tail on
    device (slot 0 = original, slots 1..N = rotations), all inside one
    jitted program per batch.  The native CPU twin composes the PIL-exact
    rotations executor with the C++ chain executor over the same stacked
    slots, byte-identical per seed.

    Options are RandomRotations' names (``include_original`` saves the
    tail-processed ORIGINAL as ``{stem}_{original_key}.png`` — exactly
    the file the standalone tail produces from the rotations step's
    original copy).  Outputs are always ``.png`` (the fused semantics fix
    the intermediate format); ``output_bands=3`` strips alpha at encode
    (the EnhanceImage standalone step writes 3-channel files —
    reference tranfo.py:9-55).
    """

    # the original slot is tail-processed on DEVICE; save never touches
    # item["image"], so hybrid device decode stays available
    save_needs_image = False
    max_batch = 8

    def __init__(self, stages: Sequence):
        self.stages = list(stages)
        if any(isinstance(s, Rotate) for s in self.stages):
            # the rotation half IS this transform; a tail Rotate would
            # need its own diag re-expansion mid-chain
            raise ValueError("RotationsChain tails may not contain Rotate")
        self._tail_draw_jit: Dict[Tuple, Any] = {}

    def static_args(self, options: Dict, key: Tuple) -> Tuple:
        return RandomRotations.static_args(self, options, key) + tuple(
            (type(s).__name__, s.config()) for s in self.stages
        )

    def device_fn(self, batch, static):
        num_rotations, angle_min, angle_max, method, interpolation = \
            static[:5]
        stages = self.stages

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
                k = jax.random.fold_in(key, _TAIL_SALT + slot)
                for i, st in enumerate(stages):
                    im, h, w = st.apply(im, h, w, jax.random.fold_in(k, i))
                return im, h, w

            outs, oh, ow = jax.vmap(tail)(
                imgs, hs, ws, jnp.arange(num_rotations + 1))
            return {"images": outs, "heights": oh, "widths": ow,
                    "pre_heights": hs, "pre_widths": ws}

        return jax.vmap(one)(batch["image"], batch["size"], batch["seed"])

    def shrink_output(self, out_dev, chunk, options):
        """Outputs are always ``.png``, so the inherited ``.jpg``
        coefficient-transport shrink (whose output protocol this
        save_item doesn't speak) must never run."""
        if not isinstance(out_dev.get("images"), np.ndarray):
            self.start_host_copy(out_dev)
        return out_dev

    # -- native CPU twin ----------------------------------------------------

    def _tail_draws(self, seeds: np.ndarray, n_slots: int, H: int):
        """Every jax.random draw the device tail makes, per (item, slot,
        stage) — the exact fold_in tree device_fn's ``tail`` consumes —
        padded to a power-of-two item count to bound recompiles.
        Returns 6 arrays shaped [n_items, n_slots, ...]."""
        stages = self.stages
        key_t = (n_slots, H)
        fn = self._tail_draw_jit.get(key_t)
        if fn is None:
            def one(seed):
                key = jax.random.PRNGKey(seed)

                def slot_draws(slot):
                    return stage_draw_lists(
                        stages, jax.random.fold_in(key, _TAIL_SALT + slot),
                        H)

                return jax.vmap(slot_draws)(jnp.arange(n_slots))

            fn = jax.jit(jax.vmap(one))
            self._tail_draw_jit[key_t] = fn
        n = len(seeds)
        cap = 1 << max(2, (n - 1).bit_length())
        padded = np.zeros(cap, np.uint32)
        padded[:n] = seeds
        return [np.asarray(o)[:n] for o in fn(padded)]

    def native_fn(self, batch, static, options, n_threads=1):
        """PIL-exact rotations twin + C++ chain executor over the stacked
        (original + rotations) slots — byte-identical to the device
        program per seed (both halves' draws ride the same trees)."""
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
        flat = np.concatenate(
            [imgs[:, None], rot["images"]], axis=1).reshape(B * S, H, W, 4)
        sizes = np.empty((B, S, 2), np.int32)
        sizes[:, 0] = np.asarray(batch["size"], np.int32)
        sizes[:, 1:, 0] = rot["heights"]
        sizes[:, 1:, 1] = rot["widths"]
        draws = self._tail_draws(
            np.asarray(batch["seed"], np.uint32), S, H)
        flat_draws = [d.reshape((B * S,) + d.shape[2:]) for d in draws]
        res = chain_native_exec(
            self.stages, flat, sizes.reshape(B * S, 2), flat_draws,
            n_threads)
        if res is None:
            return None
        outs, osz = res
        return {
            "images": outs.reshape(B, S, H, W, 4),
            "heights": osz[:, 0].reshape(B, S),
            "widths": osz[:, 1].reshape(B, S),
            "pre_heights": sizes[..., 0],
            "pre_widths": sizes[..., 1],
        }

    # -- save ---------------------------------------------------------------

    def _slot_keys(self, out: Dict, options: Dict):
        """Yield (slot, rotation_key) for every slot the standalone
        rotations step would have saved — the skip rules shared by
        RotationsChain and RotSymChain (a rotation whose pre-tail bbox
        was empty was never written, so no downstream step saw it;
        ``include_original`` gates slot 0)."""
        include_original = options.get("include_original", True)
        output_prefix = options.get("output_prefix", "r")
        original_key = options.get("original_key", "r000")
        key_format = options.get("rotation_key_format",
                                 "{prefix}{index:03d}")
        for slot in range(out["heights"].shape[0]):
            if slot == 0 and not include_original:
                continue
            if (int(out["pre_heights"][slot]) <= 0
                    or int(out["pre_widths"][slot]) <= 0):
                continue
            yield slot, (original_key if slot == 0
                         else key_format.format(prefix=output_prefix,
                                                index=slot))

    def _tail_encoder(self):
        return tail_encoder(self.stages)

    def _emit(self, encoder, img, bh: int, bw: int, bands, p: Path,
              saved: List[Path]) -> None:
        emit_slot(encoder, img, bh, bw, bands, p, saved)

    def save_item(
        self,
        out: Dict[str, np.ndarray],
        item: Dict,
        output_dirs: Sequence[Path],
        options: Dict,
    ) -> Optional[List[Path]]:
        if not output_dirs:
            print("[rotchain] no output dir provided")
            return None
        target = Path(output_dirs[0])
        stem = Path(item["_args"][0]).stem
        bands = options.get("output_bands")
        encoder = self._tail_encoder()

        saved: List[Path] = []
        for slot, key in self._slot_keys(out, options):
            self._emit(encoder, out["images"][slot],
                       int(out["heights"][slot]), int(out["widths"][slot]),
                       bands, target / f"{stem}_{key}.png", saved)
        if not saved:
            return None
        return saved
