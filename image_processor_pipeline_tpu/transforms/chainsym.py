"""Fused chain → symmetries: deterministic stages with a dihedral
fan-out at the END, one step (fan-out 1→S).

The reference runs the tail pair as separate disk-materialized stages
(e.g. filtres_liste.py:41-149 / pixels_isolés.py:8-81 write every
intermediate; symmetry.py:92-134 then re-decodes each final file and
writes its flips).  ``auto_fuse`` previously collapsed
mask→cleanup→fitcrop runs into one ``FusedChain`` step but left a
trailing symmetries step standalone — still paying one materialization
plus S re-decodes per item.  This transform completes that shape: run
the deterministic chain ONCE per item, then encode the selected
dihedrals directly as zero-copy numpy flip VIEWS of the chain result
(io/native.py _row_strided — the flips never materialize, exactly like
GenerateSymmetries' host path and RotationsSymmetries' save half).

Byte-parity argument (what makes ``auto_fuse`` of chain→symmetries
byte-safe):

- the chain half is ``FusedChain`` unchanged: the fuser only emits
  DETERMINISTIC translated stages (ColorMask with
  ``input_alpha='replace'``, Cleanup, FitCrop), and the head rules
  guarantee lossless ``.png`` elided intermediates — so the chain
  result holds exactly the pixels the standalone symmetry step would
  have re-decoded from the chain's final ``.png``;
- the symmetry selection is DEGENERATE when ``choose_random`` is None
  or >= len(pool) (reference symmetry.py:122-126 then selects the whole
  pool; ``include_original`` appends 'o'): the saved SET is
  deterministic, so no RNG tree needs replicating.  The byte tier
  declines ``choose_random < len(pool)``;
- naming rides through: the standalone symmetry step names outputs
  ``{stem}_{sym}{input suffix}`` (symmetry.py:133-134) and the chain's
  final file is ``{stem}.png``, so the fused outputs are
  ``{stem}_{sym}.png`` — and they are encoded with ``encode_image``,
  GenerateSymmetries' own cv2-anchored encoder (even the 'o' copy is a
  re-encode in the reference, symmetry.py:133).

Per-item statuses keep the chain-fusion contract: an empty chain result
raises (the standalone chain step would have error'd that item, so the
standalone symmetry step never saw a file); a single failed symmetry
encode is tolerated per-sym with a warning, like GenerateSymmetries.

Direct (non-auto-fuse) users may set ``choose_random < len(pool)``
(also reachable via ``auto_fuse="rng"``): each item then samples its
subset from the shared select_syms tree at slot 0 — the same
per-(item, slot=0) convention as RotationsSymmetries — equally
DISTRIBUTED but not byte-comparable to a standalone run, which seeds
per intermediate-file index.  RNG chain stages (Rotate/Flip/Enhance)
are likewise reachable only through direct use or the rng tier; with a
final Enhance the fuser sets ``output_bands=3`` so every flip is
written 3-channel like the standalone EnhanceImage (tranfo.py:9-55) —
flips are band-agnostic, so the banding commutes with the fan-out.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Sequence
from warnings import warn

import numpy as np

from image_processor_pipeline_tpu.transforms.fused import FusedChain
from image_processor_pipeline_tpu.transforms.rotsym import _VIEW, select_syms
from image_processor_pipeline_tpu.transforms.symmetry import ALL_SYMS
from image_processor_pipeline_tpu.io.images import encode_image
from image_processor_pipeline_tpu.utils.utils import validate_dirs


class ChainSymmetries(FusedChain):
    """FusedChain ∘ GenerateSymmetries in one step.

    Compute (load/probe/device_fn/native_fn/shrink) is inherited from
    FusedChain unchanged; only the save half changes: instead of writing
    the chain result once, it writes each selected symmetry as a
    zero-copy flip view, named ``{stem}_{sym}.png`` — exactly the name
    the standalone symmetry step gives the chain's output file.

    options (on top of FusedChain's): ``pool`` / ``choose_random`` /
    ``include_original`` with GenerateSymmetries semantics;
    ``output_bands=3`` strips alpha before the flips (rng-tier Enhance
    tails).  ``output_suffix`` is fixed at ``.png`` by the fused
    semantics (the symmetry half keeps the lossless intermediate
    suffix) and ignored here.
    """

    def shrink_output(self, out_dev, chunk, options):
        """Outputs are always ``.png`` (the symmetry half keeps the
        lossless intermediate suffix) — run the inherited valid-region
        shrink but never the ``.jpg`` coefficient transport, whose
        output protocol this save_item doesn't speak, even if a direct
        user passes ``output_suffix='.jpg'`` + ``device_encode`` (those
        knobs are fixed by the fused semantics and ignored here)."""
        opts = dict(options)
        opts["output_suffix"] = ".png"
        return FusedChain.shrink_output(self, out_dev, chunk, opts)

    def save_item(
        self,
        out: Dict[str, np.ndarray],
        item: Dict,
        output_dirs: Sequence[Path],
        options: Dict,
    ) -> Optional[List[Path]]:
        target = validate_dirs(output_dirs, 1)
        path = Path(item["_args"][0])
        h, w = int(out["h"]), int(out["w"])
        if h <= 0 or w <= 0:
            raise RuntimeError(
                f"chain produced empty content for {path.name}")
        img = out["image"][:h, :w]
        bands = options.get("output_bands")
        if bands:
            img = img[..., :int(bands)]

        pool = list(options.get("pool") or ALL_SYMS)
        invalid = [s for s in pool if s not in ALL_SYMS]
        if invalid:
            raise ValueError(f"pool contains invalid symmetries: {invalid}")
        choose_random = options.get("choose_random")
        choose_random = len(pool) if choose_random is None else choose_random
        if choose_random > len(pool):
            warn(f"choose_random={choose_random} exceeds pool size "
                 f"{len(pool)}; clamping")
            choose_random = len(pool)
        elif choose_random < 0:
            raise ValueError(f"choose_random ({choose_random}) must be >= 0")
        include_original = bool(options.get("include_original", True))
        if choose_random >= len(pool):
            selected = list(pool)  # whole pool: deterministic (byte tier)
            if include_original and "o" not in set(selected):
                selected.append("o")
        else:
            # sub-pool sampling: per-item tree at slot 0 — select_syms IS
            # the one shared distribution-tier convention (rotsym.py);
            # changing that tree changes rng-tier fused outputs
            selected = select_syms(
                None, (pool, choose_random, include_original),
                item["_seed"], 0)

        saved: List[Path] = []
        for sym in selected:
            p = Path(target) / f"{path.stem}_{sym}.png"
            try:
                # encode_image = GenerateSymmetries' encoder (even the 'o'
                # copy is a re-encode, reference symmetry.py:133)
                encode_image(_VIEW[sym](img), p)
                saved.append(p)
            except Exception as e:  # noqa: BLE001 — per-sym tolerance
                warn(f"failed to save symmetry {sym!r} for {p.name}: {e}")
        if not saved:
            return None
        return saved
