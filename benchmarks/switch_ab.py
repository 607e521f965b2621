"""A/B: vmapped lax.switch dihedral dispatches vs decomposed flip-wheres.

VERDICT r4 #5 anchor: the round-3 perf note called the two vmapped
``lax.switch`` dispatches in the chain's XLA glue "the big glue cost (each
computes all 4 branches then selects)".  In the shipped bench path
(pallas_full) they were eliminated in round 2 by ``_dihedral_table`` +
the flip-conjugated epilogue; the pure-XLA 'shear' chain mode (and the
FusedChain stage path that shares ``rotate_square_shear``) kept them
until round 5.  This harness measures the two formulations on identical
draws, same window, fori-loop protocol, and asserts their checksums are
bit-identical:

  NEW (shipped): transpose-where + flip-wheres (3 passes for the quarter
      turn, 2 for the user flip — XLA fuses each rev into its select)
  OLD: lax.switch over 4 branches for each (computes every branch).

Usage (real TPU through the tunnel; compiles take minutes — run in a
background task):
    python benchmarks/switch_ab.py [--batch 8] [--iters 1000]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=1000)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from image_processor_pipeline_tpu.models.chains import (
        _crop_one,
        _finish_one,
        augment_chain,
    )
    from image_processor_pipeline_tpu.ops import color as color_ops
    from image_processor_pipeline_tpu.ops import geometry, photometric
    from image_processor_pipeline_tpu.models import chains as _chains

    B, S = args.batch, args.size
    CROP = 512
    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (B, S, S, 3), dtype=np.uint8)
    xywhn = np.tile(np.asarray([0.5, 0.5, 0.2, 0.2], np.float32), (B, 1))
    seeds = np.arange(B, dtype=np.uint32)

    def rotate_square_shear_old(img, angle_deg):
        """The pre-r5 formulation: lax.switch over the 4 quarter-turn
        branches (all computed, then selected), identical shear body."""
        H = img.shape[0]
        quad, sh1, sh2 = geometry.shear_params(angle_deg, H)
        img = jax.lax.switch(
            quad,
            [
                lambda x: x,
                lambda x: jnp.flip(jnp.swapaxes(x, 0, 1), axis=0),
                lambda x: jnp.flip(jnp.flip(x, axis=0), axis=1),
                lambda x: jnp.flip(jnp.swapaxes(x, 0, 1), axis=1),
            ],
            img,
        )
        img = geometry._row_shift(
            img, sh1, axis=1, bits=geometry.shear13_bits_for(H))
        img = geometry._row_shift(
            img, sh2, axis=0, bits=geometry.shift_bits_for(H))
        img = geometry._row_shift(
            img, sh1, axis=1, bits=geometry.shear13_bits_for(H))
        return img

    def finish_one_old(img, seed):
        """Pre-r5 _finish_one: lax.switch over the 4 user-flip branches;
        the mask/enhance tail is imported unchanged so the A/B isolates
        the dispatch formulation."""
        key = jax.random.PRNGKey(seed)
        _, _, _, k_flip, k_enh = jax.random.split(key, 5)
        flip_idx = jax.random.randint(k_flip, (), 0, 4)
        img = jax.lax.switch(
            flip_idx,
            [
                lambda x: x,
                lambda x: jnp.flip(x, axis=1),
                lambda x: jnp.flip(x, axis=0),
                lambda x: jnp.flip(jnp.flip(x, axis=0), axis=1),
            ],
            img,
        )
        alpha = color_ops.color_mask_alpha(
            img, CROP, CROP,
            jnp.asarray(_chains._FILTER_LOWERS, jnp.float32),
            jnp.asarray(_chains._FILTER_UPPERS, jnp.float32),
            jnp.asarray(_chains._FILTER_ZONES, jnp.int32),
        )
        kb, kc, kcol, krgb = jax.random.split(k_enh, 4)
        img = photometric.brightness(
            img, jax.random.uniform(kb, (), minval=0.7, maxval=1.3))
        img = photometric.contrast(
            img, jax.random.uniform(kc, (), minval=0.7, maxval=1.3))
        img = photometric.color_balance(
            img, jax.random.uniform(kcol, (), minval=0.7, maxval=1.3))
        img = photometric.channel_gains(
            img, jax.random.uniform(krgb, (3,), minval=0.75, maxval=1.25))
        return jnp.concatenate([img, alpha[..., None]], axis=-1)

    def chain_old(images, xywhn, seeds):
        cropped, angles = jax.vmap(
            functools.partial(_crop_one, crop=CROP))(images, xywhn, seeds)
        rotated = jax.vmap(rotate_square_shear_old)(cropped, angles)
        return jax.vmap(finish_one_old)(rotated, seeds)

    def chain_new(images, xywhn, seeds):
        return augment_chain(images, xywhn, seeds, CROP, "shear")

    @functools.partial(jax.jit, static_argnums=(3, 4))
    def loop(images, xywhn, seeds, n, which):
        fn = chain_new if which == "new" else chain_old

        def body(i, carry):
            dep, _ = carry
            out = fn(images, xywhn, seeds + i * B + dep)
            return out[0, 0, 0, 0].astype(jnp.uint32), out

        dep, out = jax.lax.fori_loop(
            0, n, body,
            (jnp.uint32(0), jnp.zeros((B, CROP, CROP, 4), jnp.uint8)))
        return jnp.sum(out.astype(jnp.uint32)) + dep

    images_d = jax.device_put(images)
    xywhn_d = jax.device_put(xywhn)
    seeds_d = jax.device_put(seeds)

    sums = {}
    for which in ("new", "old"):
        for n in (2, args.iters):
            sums[(which, n)] = int(loop(images_d, xywhn_d, seeds_d, n,
                                        which))
        print(f"[compile ok] {which}", flush=True)
    for n in (2, args.iters):
        assert sums[("new", n)] == sums[("old", n)], (
            "formulations diverge", n, sums)
    print("checksums bit-identical (both trip counts)", flush=True)

    rates = {"new": [], "old": []}
    for r in range(args.rounds):
        for which in ("new", "old"):  # interleaved: same drift window
            t0 = time.perf_counter()
            int(loop(images_d, xywhn_d, seeds_d, args.iters, which))
            t_long = time.perf_counter() - t0
            t0 = time.perf_counter()
            int(loop(images_d, xywhn_d, seeds_d, 2, which))
            t_short = time.perf_counter() - t0
            rate = B * (args.iters - 2) / (t_long - t_short)
            rates[which].append(rate)
            print(f"round {r} {which}: {rate:,.0f} img/s", flush=True)

    out = {
        "batch": B, "iters": args.iters,
        "new_where_form_img_s": max(rates["new"]),
        "old_switch_form_img_s": max(rates["old"]),
        "speedup": max(rates["new"]) / max(rates["old"]),
        "all_rounds": {k: [round(x) for x in v] for k, v in rates.items()},
        "bit_identical": True,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
