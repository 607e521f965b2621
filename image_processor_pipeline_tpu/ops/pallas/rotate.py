"""Pallas TPU kernel: Paeth 3-shear rotation, fully VMEM-resident.

The XLA formulation of the bit-decomposed shear (ops/geometry.py:_row_shift)
round-trips the image through HBM for every roll+select pass (~28 passes).
This kernel loads each image into VMEM once, runs all three shears (9 bit
passes each) on-chip, and writes the result once — HBM traffic drops from
~28x to 2x the image size.

Layout: images are processed as [S, S*C] tiles (C channels interleaved in
the lane dimension, S*C a multiple of 128), one image per grid step.
Per-row/column shift vectors are precomputed in XLA (they're O(S) ints) and
prefetched; quadrant reduction (exact 90° transposes/flips) happens in XLA
around the kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BITS = 9             # enough for S <= 720 (see geometry.shift_bits_for)
OFFSET = 1 << (BITS - 1)


def _shear_kernel(sh1_ref, sh2e_ref, img_ref, out_ref, *, S: int, C: int):
    # Mosaic's rotate only supports 32-bit lanes — widen for the shears
    img = img_ref[0].astype(jnp.int32)   # [S, S*C]
    sh1 = sh1_ref[0, 0]       # [S] int32   (x-shift per row)
    sh2e = sh2e_ref[0, 0]     # [S*C] int32 (y-shift per lane = per column*C)

    lanes = S * C
    lane_pix = jax.lax.broadcasted_iota(jnp.int32, (S, lanes), 1) // C
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (S, lanes), 0)

    def xshear(x, t):
        # t: [S] per-row horizontal pixel shift; reshape int32 BEFORE any
        # bool op (Mosaic only reshapes 32-bit vectors across minor dims)
        tcol = t.reshape(S, 1)
        u = tcol + OFFSET
        for k in range(BITS):
            rolled = pltpu.roll(x, (1 << k) * C, 1)
            mask = ((u >> k) & 1) > 0
            x = jnp.where(mask, rolled, x)
        # pltpu.roll requires non-negative shifts; -OFFSET*C mod lanes
        x = pltpu.roll(x, (lanes - OFFSET * C) % lanes, 1)
        valid = (lane_pix >= tcol) & (lane_pix < S + tcol)
        return jnp.where(valid, x, jnp.zeros((), x.dtype))

    def yshear(x, te):
        # te: [S*C] per-lane vertical shift
        trow = te.reshape(1, lanes)
        u = trow + OFFSET
        for k in range(BITS):
            rolled = pltpu.roll(x, 1 << k, 0)
            mask = ((u >> k) & 1) > 0
            x = jnp.where(mask, rolled, x)
        x = pltpu.roll(x, (S - OFFSET) % S, 0)
        valid = (row_idx >= trow) & (row_idx < S + trow)
        return jnp.where(valid, x, jnp.zeros((), x.dtype))

    out = xshear(img, sh1)
    out = yshear(out, sh2e)
    out = xshear(out, sh1)
    out_ref[0] = out.astype(out_ref.dtype)


def shear_rotate_pallas(images, sh1, sh2):
    """Apply the 3-shear rotation to a batch.

    images: [B, S, S, C] uint8; sh1: [B, S] int32 x-shifts per row;
    sh2: [B, S] int32 y-shifts per column.  Returns [B, S, S, C].
    """
    B, S, S2, C = images.shape
    assert S == S2, "square images required"
    lanes = S * C
    flat = images.reshape(B, S, lanes)
    sh1_3d = sh1.reshape(B, 1, S)
    sh2e = jnp.repeat(sh2, C, axis=-1).reshape(B, 1, lanes)

    kernel = functools.partial(_shear_kernel, S=S, C=C)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, S, lanes), images.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, S), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lanes), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, lanes), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, S, lanes), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
    )(sh1_3d, sh2e, flat)
    return out.reshape(B, S, S, C)


def _shear_kernel_packed(sh1_ref, sh2_ref, img_ref, out_ref, *, S: int,
                         G: int, bits: int = BITS):
    """Packed variant: one RGBA pixel per int32 lane ([S, S] int32), with
    ``G`` images per grid step — per-step fixed overhead (~40 µs on v5e)
    dominates single-image kernels, so amortizing it across 4 images cut
    the 32-batch rotation from 1.41 ms to 0.56 ms."""
    col_idx = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)

    offset = 1 << (bits - 1)

    def shear(v, t, idx, axis):
        u = t + offset
        for k in range(bits):
            rolled = pltpu.roll(v, (1 << k) % S, axis)
            v = jnp.where(((u >> k) & 1) > 0, rolled, v)
        v = pltpu.roll(v, (S - offset % S) % S, axis)
        valid = (idx >= t) & (idx < S + t)
        return jnp.where(valid, v, 0)

    for g in range(G):
        x = img_ref[g]            # [S, S] int32 (bitcast RGBA)
        tcol = sh1_ref[g, 0].reshape(S, 1)
        trow = sh2_ref[g, 0].reshape(1, S)
        x = shear(x, tcol, col_idx, 1)
        x = shear(x, trow, row_idx, 0)
        x = shear(x, tcol, col_idx, 1)
        out_ref[g] = x


def shear_rotate_pallas_packed(images, sh1, sh2, images_per_step: int = 4):
    """Packed-pixel shear rotation: images [B, S, S, 4] uint8."""
    B, S, S2, C4 = images.shape
    assert S == S2 and C4 == 4, "packed kernel needs square RGBA"
    packed = jax.lax.bitcast_convert_type(images, jnp.int32)  # [B, S, S]

    G = images_per_step
    while B % G != 0:
        G //= 2
    G = max(G, 1)

    from image_processor_pipeline_tpu.ops.geometry import shift_bits_for

    kernel = functools.partial(_shear_kernel_packed, S=S, G=G,
                               bits=shift_bits_for(S))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, S, S), jnp.int32),
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec((G, 1, S), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 1, S), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, S, S), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G, S, S), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(sh1.reshape(B, 1, S), sh2.reshape(B, 1, S), packed)
    return jax.lax.bitcast_convert_type(out, jnp.uint8)  # [B, S, S, 4]


def rotate_square_shear_batch(images, angles, interpret: bool = False):
    """Batched fixed-canvas CCW rotation via the Pallas shear kernel.

    Same contract as vmap(ops.geometry.rotate_square_shear): square fully-
    valid images, nearest 3-shear rotation, zeros outside the footprint.
    Quadrant reduction (exact 90° steps) runs in XLA around the kernel.
    """
    B, S, _, C = images.shape
    theta = jnp.mod(jnp.deg2rad(angles.astype(jnp.float32)), 2 * jnp.pi)
    quad = jnp.floor((theta + jnp.pi / 4) / (jnp.pi / 2)).astype(jnp.int32) % 4
    phi = theta - quad.astype(jnp.float32) * (jnp.pi / 2)

    def quad_turn(img, q):
        return jax.lax.switch(
            q,
            [
                lambda x: x,
                lambda x: jnp.flip(jnp.swapaxes(x, 0, 1), axis=0),
                lambda x: jnp.flip(jnp.flip(x, axis=0), axis=1),
                lambda x: jnp.flip(jnp.swapaxes(x, 0, 1), axis=1),
            ],
            img,
        )

    images = jax.vmap(quad_turn)(images, quad)

    a = jnp.tan(phi / 2)
    b = -jnp.sin(phi)
    c = (jnp.float32(S) - 1.0) / 2.0
    iy = jax.lax.broadcasted_iota(jnp.float32, (S, 1), 0)[:, 0] - c
    sh1 = jnp.rint(a[:, None] * iy[None, :]).astype(jnp.int32)  # [B, S]
    sh2 = jnp.rint(b[:, None] * iy[None, :]).astype(jnp.int32)

    if interpret:
        # interpreter mode for CPU tests
        B_, S_, _, C_ = images.shape
        lanes = S_ * C_
        flat = images.reshape(B_, S_, lanes)
        sh1_3d = sh1.reshape(B_, 1, S_)
        sh2e = jnp.repeat(sh2, C_, axis=-1).reshape(B_, 1, lanes)
        kernel = functools.partial(_shear_kernel, S=S_, C=C_)
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B_, S_, lanes), images.dtype),
            grid=(B_,),
            in_specs=[
                pl.BlockSpec((1, 1, S_), lambda b: (b, 0, 0)),
                pl.BlockSpec((1, 1, lanes), lambda b: (b, 0, 0)),
                pl.BlockSpec((1, S_, lanes), lambda b: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, S_, lanes), lambda b: (b, 0, 0)),
            interpret=True,
        )(sh1_3d, sh2e, flat)
        return out.reshape(B_, S_, S_, C_)
    # prefer the packed-pixel kernel (one int32 lane per RGBA pixel)
    if C == 4:
        return shear_rotate_pallas_packed(images, sh1, sh2)
    if C == 3:
        alpha = jnp.full(images.shape[:-1] + (1,), 255, images.dtype)
        rgba = jnp.concatenate([images, alpha], axis=-1)
        return shear_rotate_pallas_packed(rgba, sh1, sh2)[..., :3]
    return shear_rotate_pallas(images, sh1, sh2)
