"""Fused symmetries → chain tail → symmetries: the dihedral fan-out at
BOTH ends of one deterministic run, one step (fan-out 1→S1×S2).

The last fusion-lattice position: the reference shape is a symmetry
stage (symmetry.py:92-134), a deterministic suffix
(filtres_liste.py:41-149 / pixels_isolés.py:8-81 / recadrages.py:63-82),
then ANOTHER symmetry stage over the results — every stage
disk-materialized.  ``auto_fuse`` previously collapsed the head pair
(transforms/symchain.py) and left the trailing symmetries standalone,
still paying one materialization plus S1 re-decodes.  This transform
runs the whole run in one step: decode once, fan out the head dihedrals
on device, push each through the deterministic tail, and encode each
surviving slot once per TAIL dihedral as a zero-copy flip view.

Byte-parity argument (the symchain + chainsym arguments composed):

- the head half is SymmetriesChain unchanged (deterministic byte-tier
  selection, lossless 8-bit RGBA ``.png`` inputs enforced by the fuser
  via _png_input_ok, draw-free translated tail stages);
- the tail selection is the DETERMINISTIC byte-tier set (whole pool,
  ``include_original`` appending 'o' — reference symmetry.py:122-126),
  and the flips are pure pixel permutations of exactly the pixels the
  standalone trailing step would have re-decoded from the chain's
  ``{stem}_{s1}.png`` (lossless, enforced by the fused semantics);
- naming and encoders ride through: the standalone trailing step writes
  ``{stem}_{s1}_{s2}.png`` via cv2 (``encode_image``, symmetry.py:133 —
  even the 'o' copy is a re-encode) regardless of the chain's own
  encoder anchor (the chain's encode was on the ELIDED intermediate).

Per-slot statuses coarsen as in the other fused fan-outs: one status
per INPUT item; a head slot whose tail empties (cleanup's "no opaque
pixels") is skipped with a warning — the standalone run error'd that
one file, so the trailing symmetry step never saw it.

Sub-pool sampling (``auto_fuse="rng"``) composes at either end:
``sym_sample`` draws the HEAD subset from the shared per-item tree
(rotsym.select_syms at slot 0, SymmetriesChain's convention) and
``tail_sample`` draws each head slot's TAIL subset at slot
``_TAIL_SYM_SALT | j`` (j = the head sym's superset index) — the salt
keeps the two ends' draws on disjoint tree nodes.  Distribution-equal,
never byte-equal: the standalone steps seed per file index.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple
from warnings import warn

import numpy as np

from image_processor_pipeline_tpu.transforms.symchain import SymmetriesChain
from image_processor_pipeline_tpu.transforms.rotsym import _VIEW, select_syms
from image_processor_pipeline_tpu.transforms.symmetry import ALL_SYMS
from image_processor_pipeline_tpu.io.images import encode_image

#: disambiguates tail-selection tree slots from head/rotation slots
#: (head draws at slot 0; rotation fan-outs draw at slot 0..N).  Part of
#: the rng-tier convention: changing it changes rng-tier fused outputs.
_TAIL_SYM_SALT = 0x8000


class SymmetriesChainSymmetries(SymmetriesChain):
    """SymmetriesChain ∘ trailing symmetry fan-out save (S1×S2 files).

    Compute (head dihedral fan-out + stage tail, device and native twin)
    is inherited from SymmetriesChain unchanged; only the save half
    changes: each surviving head slot's tail result is written once per
    selected TAIL dihedral as a zero-copy flip view, named
    ``{stem}_{head_sym}_{tail_sym}.png``.
    """

    max_batch = 4  # S1 canvases per item, S1 x S2 encodes

    def __init__(self, stages: Sequence, syms: Sequence[str],
                 tail_syms: Sequence[str],
                 sym_sample: Optional[Tuple] = None,
                 tail_sample: Optional[Tuple] = None):
        SymmetriesChain.__init__(self, stages, syms, sym_sample)
        self.tail_syms = tuple(tail_syms)
        self.tail_sample = tail_sample
        invalid = [s for s in self.tail_syms if s not in ALL_SYMS]
        if invalid:
            raise ValueError(f"invalid tail symmetries: {invalid}")
        if not self.tail_syms:
            raise ValueError("tail_syms must be non-empty")
        if tail_sample is not None:
            pool, k, _ = tail_sample
            missing = [s for s in pool if s not in self.tail_syms]
            if missing or not 0 <= int(k) <= len(pool):
                raise ValueError(
                    f"tail_sample pool {pool}/k={k} outside tail_syms "
                    f"superset {self.tail_syms}")

    def static_args(self, options: Dict, key: Tuple) -> Tuple:
        return (SymmetriesChain.static_args(self, options, key)
                + self.tail_syms)

    def save_item(
        self,
        out: Dict[str, np.ndarray],
        item: Dict,
        output_dirs: Sequence[Path],
        options: Dict,
    ) -> Optional[List[Path]]:
        if not output_dirs:
            print("[symchainsym] no output dir provided")
            return None
        target = Path(output_dirs[0])
        stem = Path(item["_args"][0]).stem
        bands = options.get("output_bands")
        seed = item["_seed"]

        saved: List[Path] = []
        for s1 in select_syms(self.syms, self.sym_sample, seed, 0):
            j = self._sym_index[s1]
            bh = int(out["heights"][j])
            bw = int(out["widths"][j])
            if bh <= 0 or bw <= 0:
                # the standalone tail error'd this one file (e.g.
                # cleanup's "no opaque pixels") and wrote nothing, so the
                # standalone trailing symmetry step never saw it
                warn(f"chain tail produced empty content for "
                     f"{stem}_{s1}; skipping")
                continue
            img = out["images"][j][:bh, :bw]
            if bands:
                img = img[..., :int(bands)]
            for s2 in select_syms(self.tail_syms, self.tail_sample,
                                  seed, _TAIL_SYM_SALT | j):
                p = target / f"{stem}_{s1}_{s2}.png"
                try:
                    # encode_image = GenerateSymmetries' encoder (even
                    # the 'o' copy re-encodes, reference symmetry.py:133)
                    encode_image(_VIEW[s2](img), p)
                    saved.append(p)
                except Exception as e:  # noqa: BLE001 — per-sym tolerance
                    warn(f"failed to save symmetry {s2!r} for "
                         f"{p.name}: {e}")
        if not saved:
            return None
        return saved
