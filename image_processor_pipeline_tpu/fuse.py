"""Automatic stage fusion — ``ProcessingPipeline.run(auto_fuse=True)``.

The framework's biggest measured end-to-end advantage over the reference
is stage fusion: one device program + one materialization instead of a
disk round-trip per stage (maskclean_fused 2.23x vs 1.30x for the same
2-stage pipeline; video config 7.4x — benchmarks/e2e_results.json).  But
a pipeline migrated 1:1 from the reference (reference pipeline.py:538,
564-566 runs every transform as its own directory-to-directory stage) is
written as per-stage steps and only gets fusion if the user hand-rewrites
it around transforms.fused.FusedChain.  ``auto_fuse=True`` does that
rewrite automatically at run time.

Fusion here is deliberately CONSERVATIVE: an eligible run of steps must
be *byte-invisible* to fuse — identical final files, with only the
intermediate directories left unwritten (that is the speedup).  A run of
consecutive steps fuses iff:

- every transform translates to a DETERMINISTIC FusedChain stage:
  ColorMaskTransparency -> ColorMask, KeepLargestComponent -> Cleanup,
  FitCrop -> FitCrop.  RNG transforms (rotations, enhance, symmetries)
  never auto-fuse: FusedChain stages draw from per-stage fold_in trees
  that differ from the standalone per-step trees, so their outputs are
  equally-distributed but not byte-equal — the user opts into that by
  writing FusedChain explicitly;
- the FIRST step is ColorMaskTransparency (always writes lossless RGBA
  ``.png`` intermediates, so every downstream stage sees exactly the
  pixels the fused canvas holds — a ``.jpg`` intermediate would be
  re-quantized between standalone stages and fusing would *change*
  bytes), OR the head's input directories already exist holding ONLY
  ``.png`` files (same losslessness argument, checked on disk);
- plain ``one_input`` pairing with default engine knobs (no sample_k,
  custom pairing, fixed_input pins, save_log, resume, tracing) and
  agreeing worker/retry/overwrite/mesh settings;
- strict directory chaining: each step reads exactly its predecessor's
  single output directory, and no other step in the run list reads any
  elided intermediate directory.

Anything ineligible is simply left as-is; fusion never changes statuses
of successful items (per-item error MESSAGES can differ — e.g. the
standalone cleanup's "no opaque pixels" vs the chain's "empty content").

Reference behavior anchors: filtres_liste.py:109-138 (mask),
pixels_isolés.py:8-81 (cleanup), recadrages.py:63-82 (fit crop).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import List, Optional, Tuple


def _norm(p) -> Path:
    """Normalize for identity comparisons: pathlib keeps '..' segments,
    so `c/../m` would not compare equal to `m` without this."""
    return Path(os.path.normpath(os.path.join(os.getcwd(), str(p))))


#: engine-level option keys that may ride along on any fusable step; they
#: must agree across the run and are carried onto the fused step
_ENGINE_KEYS = frozenset({
    "native_compute", "device_decode", "device_encode",
    "device_encode_cap",
})


def _xl_colormask(options) -> Optional[Tuple[object, frozenset]]:
    from image_processor_pipeline_tpu.transforms.fused import ColorMask

    ranges = options.get("color_ranges_to_exclude_hsv")
    if not ranges:
        return None  # the per-step "no filters" error semantics stay
    if options.get("output_prefix"):
        return None  # prefixed names don't match the chain's {stem}.png
    return (
        ColorMask(ranges, zones=options.get("zones"),
                  use_gimp_scale=bool(options.get("use_gimp_scale", False))),
        frozenset({"color_ranges_to_exclude_hsv", "zones",
                   "use_gimp_scale", "output_prefix"}),
    )


def _xl_cleanup(options) -> Optional[Tuple[object, frozenset]]:
    from image_processor_pipeline_tpu.transforms.fused import Cleanup

    return (
        Cleanup(int(options.get("min_component_size", 500)),
                bool(options.get("keep_large_components", False))),
        frozenset({"min_component_size", "keep_large_components"}),
    )


def _xl_fitcrop(options) -> Optional[Tuple[object, frozenset]]:
    from image_processor_pipeline_tpu.transforms.fused import FitCrop

    return FitCrop(), frozenset()


def _translators():
    from image_processor_pipeline_tpu.transforms.cleanup import (
        KeepLargestComponent,
    )
    from image_processor_pipeline_tpu.transforms.filters import (
        ColorMaskTransparency,
    )
    from image_processor_pipeline_tpu.transforms.recadrages import FitCrop

    return {
        ColorMaskTransparency: _xl_colormask,
        KeepLargestComponent: _xl_cleanup,
        FitCrop: _xl_fitcrop,
    }


def _translate(step) -> Optional[Tuple[object, frozenset]]:
    """FusedChain stage for a step's transform, or None if ineligible."""
    fn = _translators().get(type(step.process_function))
    if fn is None:
        return None
    res = fn(step.options)
    if res is None:
        return None
    stage, known = res
    # an option key we don't model means semantics we can't prove fused
    if not set(step.options) <= (known | _ENGINE_KEYS):
        return None
    return stage, known


def _step_plain(step) -> bool:
    """Engine shape that fusion can represent (and elide) faithfully."""
    return (
        step.pairing_method == "one_input"
        and step.pairing_function is None
        and step.sample_k is None
        and not step.save_log
        and not getattr(step, "resume", False)
        and not getattr(step, "host_sharded", False)
        and getattr(step, "trace_dir", None) is None
    )


def _engine_compatible(a, b) -> bool:
    return (
        a.workers == b.workers
        and getattr(a, "retries", 0) == getattr(b, "retries", 0)
        and getattr(a, "overwrite", "allow") == getattr(b, "overwrite",
                                                        "allow")
        and getattr(a, "mesh", None) == getattr(b, "mesh", None)
        and {k: a.options.get(k) for k in _ENGINE_KEYS}
        == {k: b.options.get(k) for k in _ENGINE_KEYS}
    )


def _png_only_dir(path) -> bool:
    """True iff ``path`` exists and holds at least one file, all ``.png``.

    Heading a fused run with cleanup/fit-crop is only byte-safe when the
    head's inputs are lossless (a ``.jpg`` intermediate would be
    re-quantized between standalone stages), and cleanup's per-item
    "not a PNG" error semantics must be preserved — so anything but a
    provably all-png pre-existing directory declines.  A directory that
    an EARLIER step of the same run will produce does not exist yet at
    fuse time and correctly fails this check."""
    p = Path(path)
    try:
        files = [f for f in p.iterdir() if f.is_file()]
    except OSError:
        return False
    return bool(files) and all(f.suffix.lower() == ".png" for f in files)


def _head_eligible(step) -> bool:
    from image_processor_pipeline_tpu.transforms.filters import (
        ColorMaskTransparency,
    )

    if not (_step_plain(step) and len(step.output_paths) == 1
            and step.input_paths):
        return False
    if isinstance(step.process_function, ColorMaskTransparency):
        return True  # accepts any input, always writes lossless RGBA png
    return all(_png_only_dir(p) for p in step.input_paths)


def fuse_steps(steps: List, verbose: bool = True) -> List:
    """Return a new step list with eligible consecutive runs collapsed
    into single FusedChain steps.  The input steps are not mutated."""
    from image_processor_pipeline_tpu.pipeline import ProcessingStep
    from image_processor_pipeline_tpu.transforms.fused import FusedChain

    out: List = []
    i = 0
    while i < len(steps):
        first = steps[i]
        tr0 = _translate(first) if _head_eligible(first) else None
        run = [first]
        stages = [tr0[0]] if tr0 else []
        if tr0:
            j = i + 1
            while j < len(steps):
                nxt = steps[j]
                if (nxt.fixed_input
                        or not _step_plain(nxt)
                        or len(nxt.input_paths) != 1
                        or len(nxt.output_paths) != 1
                        or _norm(nxt.input_paths[0])
                        != _norm(run[-1].output_paths[0])
                        or not _engine_compatible(first, nxt)):
                    break
                tr = _translate(nxt)
                if tr is None:
                    break
                run.append(nxt)
                stages.append(tr[0])
                j += 1
        if len(run) < 2:
            out.append(first)
            i += 1
            continue
        # no OTHER step may read an elided intermediate directory
        elided = {_norm(p) for s in run[:-1] for p in s.output_paths}
        readers = [
            s for s in steps if s not in run
            and elided.intersection(_norm(p) for p in s.input_paths)
        ]
        if readers:
            out.append(first)
            i += 1
            continue
        fused_opts = {k: first.options[k] for k in _ENGINE_KEYS
                      if k in first.options}
        fused_opts["output_suffix"] = ".png"
        # input/output paths are ALREADY root-resolved on the source
        # steps — build the fused step rootless so they are not
        # resolved a second time (a relative root would nest: root/root/d)
        fused = ProcessingStep(
            name="+".join(s.name for s in run),
            process_function=FusedChain(stages),
            input_dirs=[str(p) for p in first.input_paths],
            output_dirs=[str(p) for p in run[-1].output_paths],
            pairing_method="one_input",
            workers=first.workers,
            options=fused_opts,
            seed=first.seed,
            overwrite=getattr(first, "overwrite", "allow"),
            retries=getattr(first, "retries", 0),
            mesh=getattr(first, "mesh", None),
        )
        if verbose:
            print(f"[auto_fuse] {' -> '.join(s.name for s in run)} "
                  f"fused into one step ({len(stages)} stages, "
                  f"{len(run) - 1} intermediate dir(s) skipped)")
        out.append(fused)
        i += len(run)
    return out
