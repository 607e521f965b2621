"""Fused symmetries → chain tail: dihedral fan-out at the HEAD, one
step (fan-out 1→S through deterministic stages).

The reference runs the pair as disk-materialized stages
(symmetry.py:92-134 writes every flip; filtres_liste.py:41-149 /
pixels_isolés.py:8-81 / recadrages.py:63-82 then re-decode each one).
``auto_fuse`` previously left a symmetry-HEADED run unfused (only the
deterministic suffix after it could fuse).  This transform composes
them: decode the input ONCE, apply every selected dihedral on device,
push each variant through the deterministic stage tail, and encode only
the final results — the S intermediate encodes *and* re-decodes per
elided stage disappear.

Byte-parity argument (entirely draw-free — the strongest tier):

- the symmetry selection is the DETERMINISTIC byte-tier set (whole
  pool, ``include_original`` appending 'o' — reference
  symmetry.py:122-126; the byte tier declines sub-pool sampling, which
  ``auto_fuse="rng"`` fuses via ``sym_sample`` instead), and the
  flips are pure valid-region pixel permutations (ops/geometry.py:
  dihedral) of exactly the pixels the standalone step decoded;
- the head inputs must be lossless 8-bit RGBA ``.png`` (enforced by the
  fuser via _png_input_ok): the standalone symmetry step writes
  intermediates with the INPUT's suffix (symmetry.py:133-134), so a
  ``.jpg`` input would make the unfused intermediates re-quantized, and
  an RGB png would give the standalone tail different band semantics
  (cleanup errors, fit-crop uses the RGB bbox) than the fused RGBA
  canvas;
- the tail stages (ColorMask with ``input_alpha='replace'``, Cleanup,
  FitCrop — everything fuse._translators emits) are DETERMINISTIC and
  consume no RNG;
- naming rides through: the standalone symmetry step writes
  ``{stem}_{sym}.png`` and every tail step keeps its input's name, so
  the final files carry that name, encoded with the LAST stage's
  reference anchor (rotchain.tail_encoder).

Per-slot statuses coarsen as in the other fused fan-outs: one status
per INPUT item; a sym slot whose tail empties (cleanup's "no opaque
pixels") is skipped with a warning — the standalone run would have
error'd that one file and written nothing.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from image_processor_pipeline_tpu.transforms.fused import (
    Enhance,
    Flip,
    FusedChain,
    Rotate,
    chain_native_exec,
    native_program,
)
from image_processor_pipeline_tpu.transforms.rotchain import (
    emit_slot,
    tail_encoder,
)
from image_processor_pipeline_tpu.transforms.symmetry import ALL_SYMS
from image_processor_pipeline_tpu.ops import geometry


class SymmetriesChain(FusedChain):
    """GenerateSymmetries ∘ deterministic FusedChain tail in one step.

    ``syms`` is the STATIC selection the standalone symmetry step would
    save (whole pool in order, plus 'o' appended when the pool misses it
    and ``include_original`` was set — computed by the fuser; direct
    users pass it explicitly).  Only draw-free tails are representable:
    the device tree would need a per-(item, sym, stage) convention that
    no standalone run defines, so Rotate/Flip/Enhance stages raise.

    ``sym_sample=(pool, k, include_original)`` (the ``auto_fuse="rng"``
    tier's sub-pool relaxation): the device program still computes the
    full ``syms`` SUPERSET (static shapes), and save_item emits only the
    subset drawn from the shared per-item tree (rotsym.select_syms at
    slot 0 — ChainSymmetries' convention: the head fan-out is the item's
    only fan-out).  Distribution-equal, never byte-equal: the standalone
    symmetry step seeds per input-file index.
    """

    max_batch = 8  # S output canvases per item

    def __init__(self, stages: Sequence, syms: Sequence[str],
                 sym_sample: Optional[Tuple] = None):
        FusedChain.__init__(self, stages)
        if any(isinstance(s, (Rotate, Flip, Enhance)) for s in self.stages):
            raise ValueError(
                "SymmetriesChain tails must be draw-free "
                "(no Rotate/Flip/Enhance)")
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
        return FusedChain.static_args(self, options, key) + self.syms

    def device_fn(self, batch, static):
        stages = self.stages
        syms = self.syms

        def one(img, size, seed):
            h, w = size[0], size[1]
            key = jax.random.PRNGKey(seed)
            outs, ohs, ows = [], [], []
            for j, sym in enumerate(syms):  # static fan-out
                im2 = geometry.dihedral(img, h, w, sym)
                h2, w2 = h, w
                # the tail is draw-free (enforced in __init__), but the
                # fold_in tree mirrors RotSymChain's so a future
                # draw-bearing extension has a defined convention
                kj = jax.random.fold_in(key, 1000 + j)
                for i, st in enumerate(stages):
                    im2, h2, w2 = st.apply(
                        im2, h2, w2, jax.random.fold_in(kj, i))
                outs.append(im2)
                ohs.append(h2)
                ows.append(w2)
            return {"images": jnp.stack(outs), "heights": jnp.stack(ohs),
                    "widths": jnp.stack(ows)}

        return jax.vmap(one)(batch["image"], batch["size"], batch["seed"])

    def shrink_output(self, out_dev, chunk, options):
        """Multi-slot output ([B, S, H, W, 4]) — the inherited 1→1
        valid-region shrink and the ``.jpg`` coefficient transport don't
        apply (outputs are always ``.png``)."""
        if not isinstance(out_dev.get("images"), np.ndarray):
            self.start_host_copy(out_dev)
        return out_dev

    # -- native CPU twin ----------------------------------------------------

    def native_fn(self, batch, static, options, n_threads=1):
        """Numpy dihedral views + the C++ chain executor over the
        stacked sym variants.  Everything is draw-free and the stage
        twins are bit-exact, so the outputs are byte-identical to the
        device program."""
        from image_processor_pipeline_tpu.ops import native_cpu

        if not native_cpu.available() or native_program(self.stages) is None:
            return None
        imgs = np.asarray(batch["image"], np.uint8)
        sizes = np.asarray(batch["size"], np.int32)
        B, H, W = imgs.shape[:3]
        K = len(self.syms)
        flat = np.zeros((B * K, H, W, imgs.shape[-1]), np.uint8)
        flat_sizes = np.empty((B * K, 2), np.int32)
        idx = 0
        for b in range(B):
            h, w = int(sizes[b, 0]), int(sizes[b, 1])
            valid = imgs[b, :h, :w]
            for sym in self.syms:
                v = valid
                if sym in ("h", "hv"):
                    v = v[:, ::-1]
                if sym in ("v", "hv"):
                    v = v[::-1]
                flat[idx, :h, :w] = v
                flat_sizes[idx] = (h, w)
                idx += 1
        empty = [np.zeros((B * K, 0), np.int32),
                 np.zeros((B * K, 0, H), np.int32),
                 np.zeros((B * K, 0, H), np.int32),
                 np.zeros((B * K, 0), np.int32),
                 np.zeros((B * K, 0, 7), np.float32),
                 np.zeros((B * K, 0, 2), np.uint8)]
        res = chain_native_exec(
            self.stages, flat, flat_sizes, empty, n_threads)
        if res is None:
            return None
        outs, osz = res
        return {
            "images": outs.reshape(B, K, H, W, outs.shape[-1]),
            "heights": osz[:, 0].reshape(B, K),
            "widths": osz[:, 1].reshape(B, K),
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
            print("[symchain] no output dir provided")
            return None
        target = Path(output_dirs[0])
        stem = Path(item["_args"][0]).stem
        bands = options.get("output_bands")
        encoder = tail_encoder(self.stages)

        from image_processor_pipeline_tpu.transforms.rotsym import (
            select_syms,
        )

        saved: List[Path] = []
        for sym in select_syms(self.syms, self.sym_sample,
                               item["_seed"], 0):
            j = self._sym_index[sym]
            emit_slot(encoder, out["images"][j],
                      int(out["heights"][j]), int(out["widths"][j]),
                      bands, target / f"{stem}_{sym}.png", saved)
        if not saved:
            return None
        return saved
