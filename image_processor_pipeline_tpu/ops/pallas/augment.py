"""Pallas TPU mega-kernel: 3-shear rotation + HSV color-mask + photometric
enhance fused into ONE VMEM-resident pass.

The XLA chain pays an HBM round-trip per fused group (rotation ~1.4 ms,
HSV mask ~1.6 ms, enhance ~2 ms per 32x512² batch on v5e).  Here the image
is read from HBM once, all stages run in VMEM, and the enhanced RGB plus
the mask alpha are written once.

Channel layout: RGB interleaved in the lane dimension ([S, S*3]).  Per-pixel
cross-channel quantities (max/min for HSV, luminance) are computed for every
lane with lane-phase selects over rolled copies — lane 3p+k sees its pixel's
(R, G, B) regardless of k, so the alpha plane comes out replicated x3 and is
strided-sliced by XLA afterwards.

Stage order: shears (rotation) → HSV in-range mask (pre-enhance pixels,
matching models/chains.py order) → brightness/contrast/color/channel-gain
enhance (PIL ImageEnhance semantics, including the rounded luminance mean
for contrast).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from image_processor_pipeline_tpu.ops.pallas.rotate import BITS, OFFSET

C = 3


def _augment_kernel(sh1_ref, sh2e_ref, params_ref, img_ref,
                    rgb_ref, alpha_ref, *,
                    S: int, lowers, uppers, zones):
    lanes = S * C
    x = img_ref[0].astype(jnp.int32)       # [S, lanes]
    sh1 = sh1_ref[0, 0].reshape(S, 1)      # x-shift per row
    sh2e = sh2e_ref[0, 0].reshape(1, lanes)  # y-shift per lane
    prm = params_ref[0, 0]                 # [8] float32

    lane_idx = jax.lax.broadcasted_iota(jnp.int32, (S, lanes), 1)
    lane_pix = lane_idx // C
    phase = lane_idx - lane_pix * C        # lane % 3
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (S, lanes), 0)

    # ---- rotation: x-shear, y-shear, x-shear (see pallas/rotate.py) ----
    def xshear(v, tcol):
        u = tcol + OFFSET
        for k in range(BITS):
            rolled = pltpu.roll(v, (1 << k) * C, 1)
            v = jnp.where(((u >> k) & 1) > 0, rolled, v)
        v = pltpu.roll(v, (lanes - OFFSET * C) % lanes, 1)
        valid = (lane_pix >= tcol) & (lane_pix < S + tcol)
        return jnp.where(valid, v, 0)

    def yshear(v, trow):
        u = trow + OFFSET
        for k in range(BITS):
            rolled = pltpu.roll(v, 1 << k, 0)
            v = jnp.where(((u >> k) & 1) > 0, rolled, v)
        v = pltpu.roll(v, (S - OFFSET) % S, 0)
        valid = (row_idx >= trow) & (row_idx < S + trow)
        return jnp.where(valid, v, 0)

    x = xshear(x, sh1)
    x = yshear(x, sh2e)
    x = xshear(x, sh1)

    # ---- per-pixel channel views via lane-phase selects ----------------
    xm1 = pltpu.roll(x, lanes - 1, 1)   # lane i sees lane i-1 (prev channel)
    xm2 = pltpu.roll(x, lanes - 2, 1)
    xp1 = pltpu.roll(x, 1 % lanes, 1)   # lane i sees lane i+1
    xp2 = pltpu.roll(x, 2 % lanes, 1)

    # wait: roll(x, s) moves lane i to lane i+s, so lane i reads lane i-s.
    # lane i reads its neighbor i+1 via roll(x, lanes-1).
    r = jnp.where(phase == 0, x, jnp.where(phase == 1, xp1, xp2))
    g = jnp.where(phase == 0, xm1, jnp.where(phase == 1, x, xp1))
    b = jnp.where(phase == 0, xm2, jnp.where(phase == 1, xm1, x))
    rf = r.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    bf = b.astype(jnp.float32)

    # ---- HSV (cv2 8U conventions, ops/color.py math) --------------------
    v = jnp.maximum(jnp.maximum(rf, gf), bf)
    mn = jnp.minimum(jnp.minimum(rf, gf), bf)
    diff = v - mn
    s_ = jnp.where(v > 0, 255.0 * diff / jnp.where(v > 0, v, 1.0), 0.0)
    safe = jnp.where(diff > 0, diff, 1.0)
    hue = jnp.where(
        v == rf, 60.0 * (gf - bf) / safe,
        jnp.where(v == gf, 120.0 + 60.0 * (bf - rf) / safe,
                  240.0 + 60.0 * (rf - gf) / safe))
    hue = jnp.where(diff > 0, hue, 0.0)
    hue = jnp.where(hue < 0, hue + 360.0, hue)
    h8 = jnp.rint(hue / 2.0)
    h8 = jnp.where(h8 >= 180.0, 0.0, h8)
    s8 = jnp.rint(s_)
    v8 = jnp.rint(v)

    acc = jnp.zeros((S, lanes), jnp.bool_)
    for (lo, hi, zn) in zip(lowers, uppers, zones):
        m = ((h8 >= lo[0]) & (h8 <= hi[0])
             & (s8 >= lo[1]) & (s8 <= hi[1])
             & (v8 >= lo[2]) & (v8 <= hi[2]))
        t, bo, l, rr = zn
        z = ((row_idx >= t) & (row_idx < S - bo)
             & (lane_pix >= l) & (lane_pix < S - rr))
        acc = acc | (m & z)
    alpha = jnp.where(acc, 0, 255).astype(jnp.int32)

    # ---- enhance (PIL semantics; chain order from models/chains.py) -----
    fb, fc, fcol, g0, g1, g2 = prm[0], prm[1], prm[2], prm[3], prm[4], prm[5]
    xf = x.astype(jnp.float32)
    xf = jnp.clip(jnp.rint(xf * fb), 0, 255)
    # contrast: rounded luminance mean over the whole canvas (each pixel's
    # luminance is replicated on its 3 lanes, so the lane-mean equals the
    # pixel-mean); luminance of the brightness-adjusted image
    rbf = jnp.clip(jnp.rint(rf * fb), 0, 255)
    gbf = jnp.clip(jnp.rint(gf * fb), 0, 255)
    bbf = jnp.clip(jnp.rint(bf * fb), 0, 255)
    lum = jnp.rint((rbf * 299.0 + gbf * 587.0 + bbf * 114.0) / 1000.0)
    mean = jnp.floor(jnp.sum(lum) / (S * lanes) + 0.5)
    xf = jnp.clip(jnp.rint(mean + fc * (xf - mean)), 0, 255)
    # color balance: per-pixel luminance of the contrast-adjusted image
    rcf = jnp.clip(jnp.rint(mean + fc * (rbf - mean)), 0, 255)
    gcf = jnp.clip(jnp.rint(mean + fc * (gbf - mean)), 0, 255)
    bcf = jnp.clip(jnp.rint(mean + fc * (bbf - mean)), 0, 255)
    lum2 = jnp.rint((rcf * 299.0 + gcf * 587.0 + bcf * 114.0) / 1000.0)
    xf = jnp.clip(jnp.rint(lum2 + fcol * (xf - lum2)), 0, 255)
    gains = jnp.where(phase == 0, g0, jnp.where(phase == 1, g1, g2))
    xf = jnp.clip(jnp.rint(xf * gains), 0, 255)

    # Mosaic has no f32→u8 cast; go through int32
    rgb_ref[0] = xf.astype(jnp.int32).astype(rgb_ref.dtype)
    alpha_ref[0] = alpha.astype(alpha_ref.dtype)


def augment_finish_reference(images, angles, enh_params, lowers, uppers,
                             zones):
    """Pure-JAX reference for the fused kernel (same op order, same math).

    Used by parity tests (interpret-mode kernel must match this bit-exactly)
    and as the fallback path where Mosaic is unavailable.
    """
    from image_processor_pipeline_tpu.ops import color as color_ops
    from image_processor_pipeline_tpu.ops import geometry, photometric

    B, S = images.shape[0], images.shape[1]

    def one(img, angle, prm):
        img = geometry.rotate_square_shear(img, angle)
        alpha = color_ops.color_mask_alpha(
            img, S, S,
            jnp.asarray(lowers, jnp.float32),
            jnp.asarray(uppers, jnp.float32),
            jnp.asarray(zones, jnp.int32),
        )
        img = photometric.brightness(img, prm[0])
        img = photometric.contrast(img, prm[1])
        img = photometric.color_balance(img, prm[2])
        img = photometric.channel_gains(img, prm[3:6])
        return jnp.concatenate([img, alpha[..., None]], axis=-1)

    return jax.vmap(one)(images, angles, enh_params)


def augment_fused_pallas(images, angles, enh_params, lowers, uppers, zones,
                         interpret: bool = False):
    """Run the fused rotate+mask+enhance kernel on a batch.

    images: [B, S, S, 3] uint8 (post-crop, post-flip); angles: [B] degrees;
    enh_params: [B, 8] float32 (brightness, contrast, color, gain_r/g/b, 0, 0);
    lowers/uppers/zones: static tuples of per-filter bounds.
    Returns [B, S, S, 4] uint8 RGBA.
    """
    B, S, S2, c = images.shape
    assert S == S2 and c == 3
    lanes = S * C

    # quadrant + shift precompute (same as pallas/rotate.py)
    theta = jnp.mod(jnp.deg2rad(angles.astype(jnp.float32)), 2 * jnp.pi)
    quad = jnp.floor((theta + jnp.pi / 4) / (jnp.pi / 2)).astype(jnp.int32) % 4
    phi = theta - quad.astype(jnp.float32) * (jnp.pi / 2)

    def quad_turn(img, q):
        return jax.lax.switch(q, [
            lambda x: x,
            lambda x: jnp.flip(jnp.swapaxes(x, 0, 1), axis=0),
            lambda x: jnp.flip(jnp.flip(x, axis=0), axis=1),
            lambda x: jnp.flip(jnp.swapaxes(x, 0, 1), axis=1),
        ], img)

    images = jax.vmap(quad_turn)(images, quad)

    a = jnp.tan(phi / 2)
    b = -jnp.sin(phi)
    cc = (jnp.float32(S) - 1.0) / 2.0
    iy = jax.lax.broadcasted_iota(jnp.float32, (S, 1), 0)[:, 0] - cc
    sh1 = jnp.rint(a[:, None] * iy[None, :]).astype(jnp.int32).reshape(B, 1, S)
    sh2 = jnp.rint(b[:, None] * iy[None, :]).astype(jnp.int32)
    sh2e = jnp.repeat(sh2, C, axis=-1).reshape(B, 1, lanes)

    flat = images.reshape(B, S, lanes)
    prm = enh_params.astype(jnp.float32).reshape(B, 1, 8)

    kernel = functools.partial(
        _augment_kernel, S=S,
        lowers=tuple(tuple(float(x) for x in l) for l in lowers),
        uppers=tuple(tuple(float(x) for x in u) for u in uppers),
        zones=tuple(tuple(int(z) for z in zz) for zz in zones),
    )
    rgb, alpha3 = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, S, lanes), jnp.uint8),
            jax.ShapeDtypeStruct((B, S, lanes), jnp.uint8),
        ),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, S), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lanes), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, lanes), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, S, lanes), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, lanes), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        # the f32 channel/HSV temporaries overlap; default 16M scoped VMEM
        # is too small at S=512 (v5e has 128M physical VMEM)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(sh1, sh2e, prm, flat)

    rgb = rgb.reshape(B, S, S, C)
    alpha = alpha3.reshape(B, S, S, C)[..., :1]
    return jnp.concatenate([rgb, alpha], axis=-1)
