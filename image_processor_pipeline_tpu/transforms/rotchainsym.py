"""Fused rotations → chain tail → symmetries: (N+1)×S fan-out with the
dihedral fan-out at the END, one step.

Completes the fusion lattice's symmetry story: the dihedral fan-out now
composes at every position — head (transforms/symchain.py), mid
(transforms/rotsymchain.py), and tail of a deterministic chain
(transforms/chainsym.py); this transform is the tail position COMBINED
with a rotations head (reference rotations.py:88-119 →
{filtres_liste.py:41-149 / pixels_isolés.py:8-81 / recadrages.py:63-82}+
→ symmetry.py:92-134, all disk-materialized standalone).

Byte-parity argument (the rotchain + chainsym arguments composed):

- the rotations half and the deterministic tail are RotationsChain
  unchanged (same seed tree over the same inventory, lossless elided
  ``.png`` intermediates — transforms/rotchain.py:12-30);
- the symmetry selection is the DETERMINISTIC byte-tier set (whole
  pool, ``include_original`` appending 'o' — reference
  symmetry.py:122-126; the fuser declines sub-pool sampling), and the
  flips are zero-copy numpy views of each slot's tail result — exactly
  the pixels the standalone symmetry step would have re-decoded from
  ``{stem}_{rotkey}.png``;
- naming and encoder ride through: the standalone symmetry step writes
  ``{stem}_{rotkey}_{sym}.png`` via cv2 (``encode_image``,
  symmetry.py:133-134) regardless of the tail's own anchor (the tail's
  encode was on the ELIDED intermediate).

Per-slot statuses coarsen as in the other fused fan-outs: one status
per INPUT item; a rotation slot whose tail empties is skipped with a
warning (the standalone tail error'd that one file, so the symmetry
step never saw it).  Under ``auto_fuse="rng"`` the tail may END with an
Enhance stage before the flips (distribution-equal; ``output_bands=3``
strips alpha before the band-agnostic flips, like
transforms/chainsym.py).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple
from warnings import warn

import numpy as np

from image_processor_pipeline_tpu.transforms.rotchain import RotationsChain
from image_processor_pipeline_tpu.transforms.rotsym import _VIEW, select_syms
from image_processor_pipeline_tpu.transforms.symmetry import ALL_SYMS
from image_processor_pipeline_tpu.io.images import encode_image


class RotationsChainSymmetries(RotationsChain):
    """RotationsChain ∘ symmetry fan-out save ((N+1)×S files).

    Compute (rotations + stage tail, device and native twin) is
    inherited from RotationsChain unchanged; only the save half changes:
    each surviving slot's tail result is written once per selected
    dihedral as a zero-copy flip view, named ``{stem}_{rotkey}_{sym}.png``.

    ``sym_sample=(pool, k, include_original)`` (the ``auto_fuse="rng"``
    tier's sub-pool relaxation) makes the per-slot selection a draw from
    the shared per-(item, rotation) tree (rotsym.select_syms — the SAME
    subsets a fused RotationsSymmetries pair selects for the same
    seeds); ``syms`` must then be the SUPERSET the draws can reach (pool
    plus 'o' when ``include_original``).  Distribution-equal, never
    byte-equal: the standalone symmetry step seeds per intermediate-file
    index.
    """

    max_batch = 8

    def __init__(self, stages: Sequence, syms: Sequence[str],
                 sym_sample: Optional[Tuple] = None):
        RotationsChain.__init__(self, stages)
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

    def static_args(self, options: Dict, key: Tuple) -> Tuple:
        return RotationsChain.static_args(self, options, key) + self.syms

    def save_item(
        self,
        out: Dict[str, np.ndarray],
        item: Dict,
        output_dirs: Sequence[Path],
        options: Dict,
    ) -> Optional[List[Path]]:
        if not output_dirs:
            print("[rotchainsym] no output dir provided")
            return None
        target = Path(output_dirs[0])
        stem = Path(item["_args"][0]).stem
        bands = options.get("output_bands")

        saved: List[Path] = []
        for slot, rkey in self._slot_keys(out, options):
            bh = int(out["heights"][slot])
            bw = int(out["widths"][slot])
            if bh <= 0 or bw <= 0:
                # the standalone tail error'd this one file (e.g.
                # cleanup's "no opaque pixels") and wrote nothing, so the
                # standalone symmetry step never saw it
                warn(f"chain tail produced empty content for "
                     f"{stem}_{rkey}; skipping")
                continue
            img = out["images"][slot][:bh, :bw]
            if bands:
                img = img[..., :int(bands)]
            for sym in select_syms(self.syms, self.sym_sample,
                                   item["_seed"], slot):
                p = target / f"{stem}_{rkey}_{sym}.png"
                try:
                    # encode_image = GenerateSymmetries' encoder (even
                    # the 'o' copy re-encodes, reference symmetry.py:133)
                    encode_image(_VIEW[sym](img), p)
                    saved.append(p)
                except Exception as e:  # noqa: BLE001 — per-sym tolerance
                    warn(f"failed to save symmetry {sym!r} for "
                         f"{p.name}: {e}")
        if not saved:
            return None
        return saved
